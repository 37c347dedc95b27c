"""Host-side symbolic planning for the banded KKT strategy.

The analogue of Eigen SimplicialLDLT's symbolic phase (AMD ordering +
elimination tree, /root/reference/include/eicos.hpp:221-222), redesigned
for the MXU: instead of irregular supernodes, compute a Reverse-Cuthill-
McKee ordering of the reduced KKT pattern (via the native C++ library,
with a SciPy fallback) and a block bandwidth — the numeric factorization
is then a perfectly regular block-banded LDL^T (ops/band_ldl.py).

Runs once per sparsity pattern on the host; the resulting ``BandPlan``
is hashable and lives on the ProblemStructure, so it is a static part of
the compiled program.
"""

from __future__ import annotations

import dataclasses

import numpy as np

from . import native
from .ops.band_ldl import band_blocks
from .ops.ldl import pad_to_block
from .structure import ProblemStructure


@dataclasses.dataclass(frozen=True)
class BandPlan:
    """RCM permutation (over the padded reduced dimension) + block band.

    ``keep_soc``: the plan covers [z_soc | x | y] (ms + n + p) with the
    per-cone SOC blocks KEPT in the factor, in NT-SCALED form
    (kept block -(I + delta W^-2), coupling W^-1 Gsoc — see
    kkt._soc_scaled_kept_vals) — the certificate-safe and
    endgame-accurate conic layout.  Eliminating SOC blocks squares the
    cone conditioning (every SOCP bench lane exited CLOSE_TO_OPTIMAL);
    keeping them UNSCALED hits ~1/delta elimination growth once cone
    eigenvalues drop below delta, which broke the 2^-48 double-single
    kernels at the endgame (measured growth 2.9e7 -> backsolve rel err
    0.13, refinement stuck).  The scaled form bounds growth at
    ~1/(2 sqrt(delta)) (measured 8.4e2, refinement converges in one
    round).  False: [x | y] (n + p) with every G row eliminated."""

    perm: tuple   # (Dp,) new->old index map; identity on padding rows
    bwb: int      # block bandwidth (in 128-blocks)
    block: int = 128
    keep_soc: bool = False

    @property
    def dim(self) -> int:
        return len(self.perm)


def make_band_plan(st: ProblemStructure, G, A, block: int = 128,
                   keep_soc: bool = False) -> BandPlan:
    """Compute the banded plan from the problem's sparsity pattern.

    ``keep_soc=False``: pattern of the fully-eliminated KKT —
    H = G'G (plus diag) and the A blocks over [x | y].
    ``keep_soc=True`` (requires SOCs): pattern of the partially-
    eliminated KKT over [z_soc | x | y] — per-cone diagonal blocks,
    the G_soc coupling, H_lp = G_lp'G_lp, and the A blocks.
    Returns a plan whose permutation covers the padded dimension
    (identity on padding)."""
    import scipy.sparse as sp

    n, p = st.n, st.p
    if keep_soc and st.n_sc:
        l, ms = st.l, st.cone.ms
        D = ms + n + p
        Glp = sp.csc_matrix(np.asarray(G)[:l] != 0)
        Gsc = sp.csc_matrix(np.asarray(G)[l:] != 0)
        H = (Glp.T @ Glp).astype(bool) + sp.eye(n, dtype=bool)
        Wp = sp.block_diag([np.ones((d, d), dtype=bool)
                            for d in st.q], format="csc")
        # coupling pattern is the per-cone UNION support: the factor
        # holds the NT-scaled W^-1 Gsoc (kkt._soc_coupling_vals), and
        # W^-1 mixes the rows within each cone
        Gsc = (Wp @ Gsc).astype(bool)
        blocks = [[Wp, Gsc, None],
                  [Gsc.T, H, None],
                  [None, None, None]]
        if p:
            As = sp.csc_matrix(np.asarray(A) != 0)
            blocks[1][2] = As.T
            blocks[2][1] = As
            blocks[2][2] = sp.eye(p, dtype=bool)
        else:
            blocks = [r[:2] for r in blocks[:2]]
        K = sp.bmat(blocks, format="csc")
    else:
        keep_soc = False
        D = n + p
        Gs = sp.csc_matrix(np.asarray(G) != 0)
        H = (Gs.T @ Gs).astype(bool) + sp.eye(n, dtype=bool)
        if p:
            As = sp.csc_matrix(np.asarray(A) != 0)
            K = sp.bmat([[H, As.T], [As, None]], format="csc")
        else:
            K = H.tocsc()
    K = (K + K.T + sp.eye(D, dtype=bool)).tocsc()
    perm = native.rcm_order(D, K.indptr.astype(np.int64),
                            K.indices.astype(np.int64))
    iperm = np.empty(D, dtype=np.int64)
    iperm[perm] = np.arange(D)
    bw, _ = native.band_stats(D, K.indptr.astype(np.int64),
                              K.indices.astype(np.int64), iperm)
    Dp = pad_to_block(D, block)
    full_perm = np.concatenate([perm, np.arange(D, Dp)])
    return BandPlan(perm=tuple(int(v) for v in full_perm),
                    bwb=min(band_blocks(int(bw), block), Dp // block),
                    block=block, keep_soc=keep_soc)


def banded_ratio(st: ProblemStructure, plan: BandPlan) -> float:
    """Dense-vs-banded factor-flop ratio (>1 means banded pays)."""
    Dp = plan.dim
    nb = Dp // plan.block
    dense = Dp ** 3 / 3
    banded = nb * plan.bwb ** 2 * plan.block ** 3
    return dense / banded
