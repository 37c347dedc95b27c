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
    """RCM permutation (over the padded reduced dimension) + block band."""

    perm: tuple   # (Dp,) new->old index map; identity on padding rows
    bwb: int      # block bandwidth (in 128-blocks)
    block: int = 128

    @property
    def dim(self) -> int:
        return len(self.perm)


def make_band_plan(st: ProblemStructure, G, A,
                   block: int = 128) -> BandPlan:
    """Compute the banded plan from the problem's sparsity pattern.

    Pattern of the reduced KKT: H = G'G (plus diag) and the A blocks.
    Returns a plan whose permutation covers the padded dimension
    (identity on padding)."""
    import scipy.sparse as sp

    n, p = st.n, st.p
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
                    block=block)


def banded_ratio(st: ProblemStructure, plan: BandPlan) -> float:
    """Dense-vs-banded factor-flop ratio (>1 means banded pays)."""
    Dp = plan.dim
    nb = Dp // plan.block
    dense = Dp ** 3 / 3
    banded = nb * plan.bwb ** 2 * plan.block ** 3
    return dense / banded
