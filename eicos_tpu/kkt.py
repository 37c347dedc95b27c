"""KKT system assembly and solve with iterative refinement.

The reference builds a quasidefinite sparse matrix with an SOC "u/v
expansion" so the CSC pattern is iteration-invariant, caches raw value
pointers, and runs Eigen LDL^T + refinement
(/root/reference/src/eicos.cpp:807-846, 1471-1620, 1691-2030).

Two TPU-native strategies, both pure matmul (selected by
``Settings.kkt_strategy``; both refine in float64 against their exact
operator, exactly like solveKKT's loop at :1471-1620 — up to ``nitref``
rounds, undo-on-regression, threshold / weak-progress stops):

"full"     Dense blocked LDL^T of the (n+p+m) quasidefinite matrix.
           The blocks are laid out in *elimination order* [z | x | y]:

               K = [ -W^2-dI   G    0   ]
                   [  G'       dI   A'  ]      (d = deltastat)
                   [  0        A   -dI  ]

           — the same operator the reference factors, but the block order
           matters for an unpivoted dense factorization: eliminating the
           cone block first keeps every pivot O(1) (z pivots ~ -W^2,
           then x pivots ~ d + G'W^{-2}G, then y pivots ~ -d - A(..)A').
           The reference gets the analogous effect from AMD ordering
           inside Eigen's LDLT; a natural [x y z] layout would eliminate
           the x block first with pivots = d = 7e-8, amplifying A/d to
           ~1e8 and wiping out float64 in the trailing update at scale
           (observed: NUMERICS exits on 880-dim MPC problems).

"reduced"  Eliminate exactly the rows whose cone block is DIAGONAL — the
           LP cone — and keep SOC blocks in the factored system.  The LP
           elimination is the exact Schur complement of the regularized
           system ((v_lp + d)^{-1} is scalar per row), so with
           V_lp = diag(v_lp) + dI and H_lp = G_lp' V_lp^{-1} G_lp the
           factored operator is, in [z_soc | x | y] elimination order,

               [ -(W_soc^2+dI)   G_soc        0   ] [dz_soc]   [bz_soc]
               [  G_soc'         dI + H_lp    A'  ] [dx    ] = [bx + G_lp' V_lp^{-1} bz_lp]
               [  0              A           -dI  ] [dy    ]   [by]

               dz_lp = V_lp^{-1} (G_lp dx - bz_lp)

           For LP problems this factors only (n+p) — for MPC-class
           problems (m ~ 2.7n) that is ~25x fewer factorization flops
           than "full", and forming H_lp is one large MXU matmul (or,
           with a GSplit, mostly a diagonal scatter).  SOC blocks enter
           the factor *linearly* (quasidefinite augmented form), so SOC
           conditioning is NOT squared: infeasibility certificates — where
           cone scalings blow up — are certified exactly as on the "full"
           path.  Because the elimination includes the deltastat term,
           refinement targets the same full operator as "full" and
           converges to the same directions.

"normal"   Full normal equations: eliminate the SOC blocks too, via the
           closed-form (W^2 + dI)^{-1} (Woodbury over the per-cone rank-2
           structure, cones.scale2reg_inv).  Factors only (n+p) even with
           cones — the fastest path for batches of *interior* (feasible,
           well-scaled) SOCPs — but squares the cone-scaling conditioning
           inside the factorization: near SOC infeasibility certificates
           the factor degrades before the certificate matures and lanes
           exit NUMERICS where "reduced"/"full" certify.  Not part of the
           exit-code-parity surface; use for throughput when the problem
           population is known feasible.

The refinement residual here is sign-consistent with the factored operator
on every row; the reference flips the deltastat sign on the last row of
each SOC (src/eicos.cpp:1552) as an artifact of its expansion — a O(7e-8)
discrepancy we do not reproduce.
"""

from __future__ import annotations

import functools

from typing import NamedTuple, Optional

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax

from . import cones
from .ops.ldl import (ldl_factor, ldl_prechunk, ldl_solve, pad_to_block,
                      LDLFactors)
from .structure import ProblemStructure


class KKTContext(NamedTuple):
    """Per-solve constants: equilibrated data + static base matrix.

    On TPU at float64, the s* fields hold the big operands G/A (and
    transposes) as double-single Pallas GEMV operands
    (ops/pallas_gemm_ds.BigOperand): XLA's native f64 dot emulation is
    a chunked while loop whose latency dominates the skinny residual/
    elimination matvecs of iterative refinement, and the XLA-level
    Ozaki preslicing variant (removed; git history) re-read the operand per
    slice pair; the kernel streams the (hi, lo) float32 pair from HBM
    once per product.  Built once per solve from loop-invariant data
    (XLA hoists them out of the IPM while-loop).
    """

    G: jax.Array       # (m, n)
    A: jax.Array       # (p, n)
    K0: jax.Array      # full: (Dp, Dp) with A/G blocks; reduced: (Dpr, Dpr)
    sG: object = None    # x @ G
    sGT: object = None   # x @ G.T
    sA: object = None    # x @ A
    sAT: object = None   # x @ A.T
    sGe: object = None   # x @ G[:me]   (eliminated rows)
    sGeT: object = None  # x @ G[:me].T
    # fused stacks: one kernel launch instead of two per residual
    # (refinement bodies run 4 big products each; stacking halves the
    # per-product call + operand-chunking overhead — measured in the
    # round-2 trace as a first-order cost of the IPM iteration)
    sGA: object = None   # [z | y] @ [G; A]        -> G'z + A'y terms
    sAGT: object = None  # x @ [A.T | G.T]         -> (A x | G x)


def _oz_mm(sliced, a, bmat):
    """a @ bmat, via the presliced Ozaki path when available."""
    if sliced is not None:
        return sliced.rmatmul(a)
    return a @ bmat


def _make_sliced(st, G, A, me: int):
    """Prepare G/A (+ the eliminated-row block) as big-matvec operands
    for f64-on-TPU solves.  Two forms, chosen per operand:

    * ops/spmv.SparseOperand when the structure carries the nonzero
      pattern (structure.MatvecPattern via with_gsplit(G, A)) and the
      operand's column width is narrow — an exact f64 padded-CSC
      gather (the TPU-native analogue of the reference's CSC SpMVs);
    * ops/pallas_gemm_ds.BigOperand otherwise — the double-single
      chunk GEMV kernel (one HBM read of an (hi, lo) f32 pair per
      product; an XLA-level Ozaki preslicing variant re-read the
      operand per slice pair and measured slower)."""
    from .ops.pallas_gemm_ds import BigOperand, gemv_ds_available

    if not gemv_ds_available() or G.dtype != jnp.float64:
        return {}
    m = G.shape[0]
    p = A.shape[0]
    mv = st.matvec

    def sparse(bmat, src, out_cols, km, nm):
        from .ops.spmv import SparseOperand, csc_table

        tab = csc_table(src, out_cols, km, nm)
        if tab is None:
            return None
        return SparseOperand(bmat, *tab)

    def operand(bmat, src=None, out_cols=None, km=None, nm=None,
                need_a=False):
        if mv is not None and src is not None and not (need_a
                                                       and not mv.has_a):
            sp = sparse(bmat, src, out_cols, km, nm)
            if sp is not None:
                return sp
        return BigOperand(bmat)

    gr = np.asarray(mv.g_rows, np.int64) if mv is not None else None
    gc = np.asarray(mv.g_cols, np.int64) if mv is not None else None
    ar = np.asarray(mv.a_rows, np.int64) if mv is not None else None
    ac = np.asarray(mv.a_cols, np.int64) if mv is not None else None
    n = G.shape[1]
    out = dict(
        sG=operand(G, gr, gc, m, n),
        sGT=operand(G.T, gc, gr, n, m))
    if p:
        out.update(
            sA=operand(A, ar, ac, p, n, need_a=True),
            sAT=operand(A.T, ac, ar, n, p, need_a=True),
            sGA=operand(jnp.concatenate([G, A], axis=0),
                        np.concatenate([gr, m + ar]) if mv is not None
                        else None,
                        np.concatenate([gc, ac]) if mv is not None
                        else None,
                        m + p, n, need_a=True),
            sAGT=operand(jnp.concatenate([A.T, G.T], axis=1),
                         np.concatenate([ac, gc]) if mv is not None
                         else None,
                         np.concatenate([ar, p + gr]) if mv is not None
                         else None,
                         n, p + m, need_a=True))
    else:
        out.update(sGA=out["sG"], sAGT=out["sGT"])
    if me == m:
        out.update(sGe=out["sG"], sGeT=out["sGT"])
    elif me:
        sel = (gr < me) if mv is not None else None
        out.update(
            sGe=operand(G[:me], gr[sel] if mv is not None else None,
                        gc[sel] if mv is not None else None, me, n),
            sGeT=operand(G[:me].T, gc[sel] if mv is not None else None,
                         gr[sel] if mv is not None else None, n, me))
    return out


def _keep_soc(st: ProblemStructure, settings) -> bool:
    """"reduced" keeps SOC blocks in the factor (partial elimination),
    as does "banded" when its plan was built with keep_soc=True (the
    certificate-safe, endgame-accurate conic layout); "normal" (and a
    banded plan without keep_soc) eliminate everything."""
    if st.n_sc == 0:
        return False
    if settings.kkt_strategy == "reduced":
        return True
    return (settings.kkt_strategy == "banded" and st.band is not None
            and getattr(st.band, "keep_soc", False))


def make_context(st: ProblemStructure, G, A, settings) -> KKTContext:
    n, p, m = st.n, st.p, st.m
    dtype = G.dtype
    delta = settings.deltastat
    if settings.kkt_strategy in ("reduced", "banded", "normal"):
        ms = st.m - st.l if _keep_soc(st, settings) else 0
        D = ms + n + p
        Dp = pad_to_block(D, settings.block)
        K0 = jnp.zeros((Dp, Dp), dtype)
        idx = jnp.arange(Dp)
        # z_soc diag (first ms rows, kept SOC block) and x diag are
        # overwritten each factor; -dI on y; 1 padding
        diag0 = jnp.where(idx < ms + n, 0.0,
                          jnp.where(idx < D, -delta, 1.0))
        K0 = K0 + jnp.diag(diag0)
        if ms:
            K0 = K0.at[:ms, ms:ms + n].set(G[st.l:])
            K0 = K0.at[ms:ms + n, :ms].set(G[st.l:].T)
        if p:
            K0 = K0.at[ms:ms + n, ms + n:D].set(A.T)
            K0 = K0.at[ms + n:D, ms:ms + n].set(A)
        me = st.l if _keep_soc(st, settings) else m
        return KKTContext(G=G, A=A, K0=K0, **_make_sliced(st, G, A, me))

    # full strategy, [z | x | y] elimination order (module docstring)
    D = st.dim_kkt
    Dp = pad_to_block(D, settings.block)
    K0 = jnp.zeros((Dp, Dp), dtype)
    idx = jnp.arange(Dp)
    diag0 = jnp.where(idx < m, 0.0,           # z diag overwritten per factor
                      jnp.where(idx < m + n, delta,
                                jnp.where(idx < D, -delta, 1.0)))
    K0 = K0 + jnp.diag(diag0)
    if m:
        K0 = K0.at[:m, m:m + n].set(G)
        K0 = K0.at[m:m + n, :m].set(G.T)
    if p:
        K0 = K0.at[m:m + n, m + n:D].set(A.T)
        K0 = K0.at[m + n:D, m:m + n].set(A)
    return KKTContext(G=G, A=A, K0=K0, **_make_sliced(st, G, A, 0))


def _use_subst(dtype, settings) -> bool:
    """Route the dense-path solves through the in-kernel blocked
    substitution kernels (ops/pallas_dense_ds): TPU float64 only, and
    only when the Pallas path is live.  The explicit-inverse GEMM path
    remains selectable (Settings.dense_solve="inverse") for A/B
    comparison and as the fallback everywhere else."""
    if settings.dense_solve == "inverse":
        return False
    if settings.block != 128 or dtype != jnp.float64:
        return False
    if settings.pallas_leaf == "off":
        return False
    if settings.kkt_strategy == "full" and settings.dense_solve != "subst":
        # the "full" strategy is the exit-code-parity default for the
        # small corpus problems; its knife-edge DINF certificate
        # (unboundedMaxSqrt) is decided by the exact f64 rounding path
        # of the solves, and the substitution kernels' ~2^-48 rounding
        # flips it to NUMERICS (measured on TPU, round 5).  Small
        # problems are tunnel-latency-bound, so keeping "full" on the
        # inverse path costs no headline; every subst win (LPnetlib
        # single-lane + batched, the rescue pass) lives on
        # "reduced"/"normal".
        return False
    from .ops.pallas_dense_ds import dense_ds_available

    return dense_ds_available()


def _factor_dense(K, settings):
    """Dense-path float64 factor: substitution form (prechunked
    triangle + leaf inverses, in-kernel solves) on TPU, prechunked
    explicit-inverse otherwise."""
    if _use_subst(K.dtype, settings):
        from .ops.ldl import ldl_factor_subst

        return ldl_factor_subst(K, block=settings.block,
                                use_pallas=settings.pallas_leaf)
    fac = ldl_factor(K, block=settings.block,
                     use_pallas=settings.pallas_leaf)
    if K.dtype == jnp.float64:
        # prechunk Linv once so the ~8 refined solves per iteration
        # skip the per-call operand split/transpose/chunk work
        # (no-op off-TPU)
        fac = ldl_prechunk(fac)
    return fac


def _factor_in_dtype(K, settings):
    """Factor in ``settings.factor_dtype``.  float32 factors stay float32:
    the backsolves then run on the MXU at full rate (true mixed-precision
    iterative refinement — low-precision solve, float64 residual), instead
    of emulated-f64 matmuls."""
    if settings.factor_dtype == "float32":
        return ldl_factor(K.astype(jnp.float32), block=settings.block,
                          use_pallas=settings.pallas_leaf)
    # float64 uses the double-single Pallas leaf on TPU (ops/ldl._leaf)
    return _factor_dense(K, settings)


def _solve_padded(fac, rr):
    """ldl_solve in the factor dtype, result cast back to the rhs dtype."""
    fdt = fac.Linv.dtype if isinstance(fac, LDLFactors) else fac.d.dtype
    out = ldl_solve(fac, rr.astype(fdt))
    return out.astype(rr.dtype)


def _assemble_dense(st, ctx, H, ms, scal, scal_f, fdtype, settings):
    """Write the per-iteration blocks (H, kept-SOC -(W^2+dI)) into the
    static base matrix — the dense-path analogue of the reference's
    cached-pointer value overwrites (KKT_V_ptr)."""
    n = st.n
    delta = settings.deltastat
    K = ctx.K0.astype(fdtype).at[ms:ms + n, ms:ms + n].set(H)
    if ms:
        # kept SOC block: -(W_soc^2 + dI), quasidefinite augmented
        # form — SOC conditioning enters the factor linearly
        W2s = (jnp.eye(ms, dtype=fdtype) if scal is None
               else cones.w2_soc_dense(st.cone, scal_f, fdtype))
        K = K.at[:ms, :ms].set(-(W2s + delta * jnp.eye(ms, dtype=fdtype)))
    return K


@functools.lru_cache(maxsize=32)
def _band_gather_split(n: int, p: int, Dp: int, perm: tuple,
                       bwb: int = 1, ms: int = 0):
    """Like _band_gather_idx, but split by source: a mask + index into
    the PER-LANE H.ravel(), and an index into the SHARED
    [A.ravel() | (-delta, 0, 1)] flat — so under vmap the shared part
    is gathered once, not concatenated into a per-lane buffer (at 128
    lanes the concat cost ~1 GB of HBM writes per iteration).

    Returns (diag_split, [sub_split_1 .. sub_split_bwb])."""
    idx_diag, idx_subs = _band_gather_idx(n, p, Dp, perm, bwb, ms)
    base_A = n * n

    def split(idx):
        from_h = idx < base_A
        ih = np.where(from_h, idx, 0).astype(np.int32)
        io = np.where(from_h, 0, idx - base_A).astype(np.int32)
        # numpy, NOT jnp: cached values must not be tracers
        return from_h, ih, io

    return (split(np.asarray(idx_diag, np.int64)),
            [split(np.asarray(s, np.int64)) for s in idx_subs])


@functools.lru_cache(maxsize=32)
def _band_scatter_idx(n: int, p: int, Dp: int, perm: tuple,
                      sing_cols: tuple, spr_cols: tuple, spr_width: int,
                      soc_cols: tuple = (), soc_width: int = 0,
                      keep_q: tuple = ()):
    """Static targets scattering H = G'W^{-2}G + delta*I contributions
    STRAIGHT into the (nb, B, B) band diag/sub blocks — the dense
    (n, n) H is never materialized (it cost ~18 MB per lane per
    iteration in HBM traffic; the band blocks hold every H nonzero by
    construction of the RCM plan).

    Returns int32 positions into a flat [diag | sub] buffer of size
    2*nb*B*B for the concatenated per-lane value vector
    [spr_vals (n_spr*w*w) | sing_vals (n_sing) | delta_diag (n) |
    soc part]; contributions landing above the band (the transposed sub
    block) or on a padding column go to the dump slot at flat position
    nbb — element (0, 0) of sub block 0, which every consumer ignores
    (the bwb=1 factor kernels multiply Ksub_0 by the zero-initialized
    Dinv_{-1} carry, so finite garbage there annihilates; the
    refinement residuals use the exact operator, never Kd/Ks).  An
    out-of-band +1 slot forced XLA to slice an odd-sized buffer into
    the (nb, B, B) views — three layout copies per iteration at 128
    lanes (~1.3 ms, traced).

    The soc part is either the H contributions on the SOCSplit column
    supports (eliminating layout: soc_cols/soc_width) or, with
    ``keep_q`` (the cone dims tuple of a keep_soc plan), the NT-SCALED
    kept layout: per-cone -(I + delta W^-2) blocks at the z_soc
    coordinates plus the W^-1 Gsoc coupling blocks (both orientations)
    on the SOCSplit supports (x coordinates shift by ms = sum(keep_q)).
    The scaled layout bounds the unpivoted elimination growth by
    ~1/(2 sqrt(delta)) where the raw -(W^2+dI) block hits ~1/delta when
    cone eigenvalues collapse below delta near convergence (measured:
    2.9e7 vs 8.4e2 on the bench SOCP endgame, which broke the 2^-48
    double-single factor kernels while exact f64 survived)."""
    perm_a = np.asarray(perm)
    iperm = np.empty_like(perm_a)
    iperm[perm_a] = np.arange(len(perm_a))
    nb = Dp // 128
    nbb = nb * 128 * 128
    dump = nbb
    ms = int(sum(keep_q))

    def gpos(gi, gj, bad):
        # gi, gj: GLOBAL KKT coordinates (arrays); bad marks pads
        pi = iperm[np.minimum(gi, len(perm_a) - 1)]
        pj = iperm[np.minimum(gj, len(perm_a) - 1)]
        bi, bj = pi // 128, pj // 128
        flat = (bi * 128 + pi % 128) * 128 + pj % 128
        out = np.where(bi == bj, flat,
                       np.where(bi == bj + 1, nbb + flat, dump))
        return np.where(bad, dump, out)

    def pos(i, j):
        # i, j: original H (x-block) coordinates; n marks a padding col
        return gpos(ms + np.minimum(i, n - 1), ms + np.minimum(j, n - 1),
                    (i >= n) | (j >= n))

    parts = []
    if spr_width:
        cols2 = np.asarray(spr_cols, np.int64).reshape(-1, spr_width)
        parts.append(pos(cols2[:, :, None], cols2[:, None, :]).ravel())
    sc = np.asarray(sing_cols, np.int64)
    if sc.size:
        parts.append(pos(sc, sc))
    parts.append(pos(np.arange(n), np.arange(n)))
    if ms:
        q = np.asarray(keep_q, np.int64)
        dmax = int(q.max())
        offs = np.concatenate([[0], np.cumsum(q)[:-1]])
        aidx = offs[:, None] + np.arange(dmax)[None, :]
        bad1 = np.arange(dmax)[None, :] >= q[:, None]    # (n_sc, dmax)
        zi = np.minimum(aidx, ms - 1)
        parts.append(gpos(
            zi[:, :, None], zi[:, None, :],
            bad1[:, :, None] | bad1[:, None, :]).ravel())
        # W^-1 Gsoc coupling on the per-cone supports, both orientations
        # (whichever lands in the stored diag/sub band survives; the
        # transposed-above-band copy goes to the dump slot)
        assert soc_width and len(soc_cols), (
            "keep_soc direct scatter needs structure.SOCSplit")
        colsS = np.asarray(soc_cols, np.int64).reshape(-1, soc_width)
        badc = colsS >= n
        xj = ms + np.minimum(colsS, n - 1)
        bad2 = bad1[:, :, None] | badc[:, None, :]       # (n_sc, dmax, w)
        parts.append(gpos(zi[:, :, None], xj[:, None, :], bad2).ravel())
        parts.append(gpos(xj[:, None, :], zi[:, :, None], bad2).ravel())
    elif soc_width and len(soc_cols):
        colsS = np.asarray(soc_cols, np.int64).reshape(-1, soc_width)
        parts.append(pos(colsS[:, :, None], colsS[:, None, :]).ravel())
    return np.concatenate(parts).astype(np.int32)


@functools.lru_cache(maxsize=32)
def _band_gather_idx(n: int, p: int, Dp: int, perm: tuple, bwb: int = 1,
                     ms: int = 0):
    """Static index maps: permuted block-banded blocks -> positions in
    the flat [H.ravel() | A.ravel() | (-delta, 0, 1)] source.

    ms == 0: K = [[H, A'], [A, -delta I]] over [x | y] (every G row
    eliminated).  ms > 0 (keep_soc): K = [[Z, C, 0], [C', H, A'],
    [0, A, -delta I]] over [z_soc | x | y]; the per-lane NT-scaled
    blocks Z = -(I + delta W^-2) and C = W^-1 Gsoc map to the shared
    ZERO constant — this layout is only used with the direct band
    scatter, which adds them per lane (_band_scatter_idx keep_q part).
    Padding rows get identity pivots."""
    perm = np.asarray(perm)
    D = ms + n + p
    base_A = n * n
    c_negd = base_A + p * n
    c_zero = c_negd + 1
    c_one = c_negd + 2
    x0, y0 = ms, ms + n

    def src_block(ivec, jvec):
        ii = ivec[:, None].astype(np.int64)
        jj = jvec[None, :].astype(np.int64)
        is_x_i = (ii >= x0) & (ii < y0)
        is_x_j = (jj >= x0) & (jj < y0)
        is_y_i = (ii >= y0) & (ii < D)
        is_y_j = (jj >= y0) & (jj < D)
        out = np.full((len(ivec), len(jvec)), c_zero, np.int64)
        out = np.where(is_x_i & is_x_j,
                       (ii - x0) * n + (jj - x0), out)
        out = np.where(is_x_i & is_y_j,
                       base_A + (jj - y0) * n + (ii - x0), out)
        out = np.where(is_y_i & is_x_j,
                       base_A + (ii - y0) * n + (jj - x0), out)
        m = (ii == jj)
        out = np.where(m & is_y_i, c_negd, out)
        out = np.where(m & (ii >= D), c_one, out)
        return out

    nb = Dp // 128
    idx_diag = np.empty((nb, 128, 128), np.int32)
    idx_subs = [np.full((nb, 128, 128), c_zero, np.int32)
                for _ in range(bwb)]
    for k in range(nb):
        rows = perm[k * 128:(k + 1) * 128]
        idx_diag[k] = src_block(rows, rows)
        for j in range(1, bwb + 1):
            if k >= j:
                idx_subs[j - 1][k] = src_block(
                    rows, perm[(k - j) * 128:(k - j + 1) * 128])
    # numpy, NOT jnp: the lru_cache outlives any single trace, and a
    # cached tracer would leak into the next jit trace
    return idx_diag, idx_subs


@functools.lru_cache(maxsize=32)
def _soc_pad_maps(q: tuple, ms: int):
    """Static (n_sc, dmax) pad maps for per-cone block assembly:
    ``qidx`` maps (cone, slot) -> SOC-segment offset (pad -> ms, so a
    zero-extended flat array absorbs pads) and ``valid`` marks live
    slots."""
    qa = np.asarray(q, np.int64)
    n_sc = len(qa)
    dmax = int(qa.max())
    offs = np.concatenate([[0], np.cumsum(qa)[:-1]])
    qidx = np.full((n_sc, dmax), ms, np.int64)
    for c in range(n_sc):
        qidx[c, :qa[c]] = offs[c] + np.arange(qa[c])
    valid = np.arange(dmax)[None, :] < qa[:, None]
    return qidx, valid


def _soc_scaled_kept_vals(st: ProblemStructure, scal_f, delta, fdtype):
    """Per-cone NT-SCALED kept blocks for the keep_soc band scatter:
    -(I + delta W^-2) as (n_sc, dmax, dmax) padded values.

    W^-2 = eta^-2 [a^2+w, -c q'; -c q, I + d q q'] per cone (the
    q -> -q, eta -> 1/eta flip of cones.scale2 — see scale2_inv).  The
    factor solves S K S with S = diag(W^-1, I, I): the kept pivot block
    is then O(1)-to-(delta/lam_min(W^2))-sized and solidly negative,
    bounding the unpivoted elimination growth by ~1/(2 sqrt(delta))
    instead of the raw layout's ~1/delta (kkt._band_scatter_idx doc).
    Pad rows/columns are zero; their positions go to the dump slot."""
    cone = st.cone
    qidx, valid = _soc_pad_maps(cone.q, cone.ms)
    dmax = qidx.shape[1]
    eye_v = (np.eye(dmax, dtype=bool)[None]
             & valid[:, :, None] & valid[:, None, :])
    eye_v = jnp.asarray(eye_v.astype(np.float64)).astype(fdtype)
    if scal_f is None:
        return -(1.0 + delta) * eye_v
    inv_eta2 = 1.0 / scal_f.eta2
    diag_flat = jnp.where(
        np.asarray(cone.is_head),
        cones._expand(cone, inv_eta2
                      * (scal_f.a * scal_f.a + scal_f.w)),
        cones._expand(cone, inv_eta2))
    dpad = jnp.concatenate([diag_flat, jnp.zeros((1,), fdtype)])[
        jnp.asarray(qidx)]                               # (n_sc, dmax)
    qpad = jnp.concatenate([scal_f.q_flat,
                            jnp.zeros((1,), fdtype)])[jnp.asarray(qidx)]
    e = jnp.asarray((np.arange(dmax)[None, :] == 0) & valid,
                    fdtype)                              # head indicator
    ec = (-inv_eta2 * scal_f.cc)[:, None, None]
    ed = (inv_eta2 * scal_f.dd)[:, None, None]
    W2i = (dpad[:, :, None] * jnp.asarray(
               np.eye(dmax), fdtype)[None]
           + ec * (e[:, :, None] * qpad[:, None, :]
                   + qpad[:, :, None] * e[:, None, :])
           + ed * qpad[:, :, None] * qpad[:, None, :])
    return -(eye_v + delta * W2i)


def _soc_coupling_vals(st: ProblemStructure, Gf, scal_f, fdtype):
    """Per-cone W^-1 Gsoc coupling blocks for the NT-scaled keep_soc
    band scatter: (n_sc, dmax, w) on the structure.SOCSplit column
    supports.  W^-1 = eta^-1 [a, -q'; -q, I + qq'/(1+a)] per cone:
    head row  = eta^-1 (a g0 - q'G1),
    tail rows = eta^-1 (G1 - q (g0 - q'G1/(1+a)))."""
    cone = st.cone
    scs = st.socsplit
    n, m, l = st.n, st.m, st.l
    n_sc = cone.n_sc
    w = scs.width
    colsS = np.asarray(scs.cols, np.int64).reshape(n_sc, w)
    qidx, valid = _soc_pad_maps(cone.q, cone.ms)
    dmax = qidx.shape[1]
    Gpad = jnp.zeros((m + 1, n + 1), fdtype).at[:m, :n].set(Gf)
    Gsub = Gpad[jnp.asarray(l + qidx)[:, :, None],
                jnp.asarray(colsS)[:, None, :]]          # (n_sc, dmax, w)
    if scal_f is None:
        return Gsub
    qpad = jnp.concatenate([scal_f.q_flat,
                            jnp.zeros((1,), fdtype)])[jnp.asarray(qidx)]
    with jax.default_matmul_precision("highest"):
        qG = jnp.einsum("cd,cdw->cw", qpad, Gsub)        # q'G1
    g0 = Gsub[:, 0, :]                                   # (n_sc, w)
    head = scal_f.a[:, None] * g0 - qG
    t = -(g0 - qG / (1.0 + scal_f.a)[:, None])           # (n_sc, w)
    tails = Gsub + qpad[:, :, None] * t[:, None, :]
    e = (np.arange(dmax)[None, :] == 0) & valid
    out = jnp.where(jnp.asarray(e)[:, :, None],
                    head[:, None, :], tails)
    return out * (1.0 / scal_f.eta)[:, None, None]


def _band_scatter_vals(st: ProblemStructure, split, Gf, winv_lp,
                       scal_f, delta, fdtype, keep_soc: bool = False):
    """Per-lane H contributions for the direct band scatter, ordered to
    match _band_scatter_idx: [spr | sing | delta I | soc], where the
    soc part is the eliminating closed form (_soc_band_vals) or, with
    ``keep_soc``, the NT-scaled kept blocks followed by the coupling
    blocks TWICE (once per orientation, matching the idx layout)."""
    n, m = st.n, st.m
    vals = []
    if split.n_spr:
        w = split.spr_width
        spr = np.asarray(split.spr_rows, dtype=np.int64)
        cols2 = np.asarray(split.spr_cols,
                           dtype=np.int64).reshape(-1, w)
        Gpad = jnp.concatenate(
            [Gf, jnp.zeros((m, 1), fdtype)], axis=1)
        C = Gpad[spr[:, None], cols2]                # (n_spr, w)
        P = (C[:, :, None] * C[:, None, :]
             * winv_lp[spr][:, None, None])
        vals.append(P.ravel())
    if split.n_sing:
        # explicit int dtype: empty tuples become float64 arrays,
        # which are invalid advanced indexers (hit on issue98: SOC-only
        # support with zero singleton rows)
        sing = np.asarray(split.sing_rows, dtype=np.int64)
        scol = np.asarray(split.sing_cols, dtype=np.int64)
        coef = Gf[sing, scol]
        vals.append(coef * coef * winv_lp[sing])
    vals.append(jnp.full((n,), delta, fdtype))
    if st.n_sc:
        if keep_soc:
            vals.append(_soc_scaled_kept_vals(
                st, scal_f, delta, fdtype).ravel())
            coup = _soc_coupling_vals(st, Gf, scal_f, fdtype).ravel()
            vals.append(coup)
            vals.append(coup)
        else:
            vals.append(_soc_band_vals(
                st, Gf, scal_f, delta, fdtype).ravel())
    return jnp.concatenate(vals)


def _soc_band_vals(st: ProblemStructure, Gf, scal_f, delta, fdtype):
    """Per-cone H contributions for the direct band scatter:
    Gq' (W^2 + dI)^{-1} Gq = b Gq'Gq - b^2 [v1 v2] Minv [v1 v2]'
    with v1 = Gq' e, v2 = Gq' q — the closed form of
    cones.scale2reg_inv_soc applied to G's per-cone column support
    (structure.SOCSplit).  Returns (n_sc, w, w) values matching
    _band_scatter_idx's soc part."""
    cone = st.cone
    scs = st.socsplit
    n, m, l = st.n, st.m, st.l
    n_sc, ms = cone.n_sc, cone.ms
    w = scs.width
    dmax = max(cone.q)
    colsS = np.asarray(scs.cols, np.int64).reshape(n_sc, w)
    # padded (cone, within-cone) -> SOC-part offset map (pad -> ms)
    qidx = np.full((n_sc, dmax), ms, np.int64)
    offs = cone.head_offsets
    for c in range(n_sc):
        qidx[c, :cone.q[c]] = offs[c] + np.arange(cone.q[c])
    # zero-padded G (extra row AND column absorb the pads)
    Gpad = jnp.zeros((m + 1, n + 1), fdtype).at[:m, :n].set(Gf)
    Gsub = Gpad[jnp.asarray(l + qidx)[:, :, None],
                jnp.asarray(colsS)[:, None, :]]    # (n_sc, dmax, w)
    with jax.default_matmul_precision("highest"):
        gram = jnp.einsum("cdw,cdv->cwv", Gsub, Gsub)
    if scal_f is None:
        return gram * jnp.asarray(1.0 / (1.0 + delta), fdtype)
    qflat_pad = jnp.concatenate(
        [scal_f.q_flat, jnp.zeros((1,), fdtype)])
    qpad = qflat_pad[jnp.asarray(qidx)]            # (n_sc, dmax)
    v1 = Gsub[:, 0, :]                             # head row of Gq
    with jax.default_matmul_precision("highest"):
        v2 = jnp.einsum("cd,cdw->cw", qpad, Gsub)
    b = 1.0 / (scal_f.eta2 + delta)
    # same 2x2 M as cones.scale2reg_inv_soc
    c11 = scal_f.eta2 * (2.0 * scal_f.w)
    c12 = scal_f.eta2 * scal_f.cc
    c22 = scal_f.eta2 * scal_f.dd
    detC = c11 * c22 - c12 * c12
    m11 = c22 / detC + b
    m12 = -c12 / detC
    m22 = c11 / detC + b * scal_f.w
    detM = m11 * m22 - m12 * m12
    mi11 = (m22 / detM)[:, None, None]
    mi12 = (-m12 / detM)[:, None, None]
    mi22 = (m11 / detM)[:, None, None]
    o11 = v1[:, :, None] * v1[:, None, :]
    o12 = (v1[:, :, None] * v2[:, None, :]
           + v2[:, :, None] * v1[:, None, :])
    o22 = v2[:, :, None] * v2[:, None, :]
    corr = mi11 * o11 + mi12 * o12 + mi22 * o22
    b1 = b[:, None, None]
    return b1 * gram - b1 * b1 * corr


def factor(st: ProblemStructure, ctx: KKTContext,
           scal: Optional[cones.Scaling], settings):
    """Assemble + factor for the current NT scaling (None = identity / init
    mode, the analogue of resetKKTScalings, src/eicos.cpp:807-846).

    Returns ``solve_exact(rhs_packed) -> (dx, dy, dz)``, a one-backsolve
    closure (no refinement).
    """
    n, p, m = st.n, st.p, st.m
    delta = settings.deltastat
    G = ctx.G

    if settings.kkt_strategy in ("reduced", "banded", "normal"):
        keep_soc = _keep_soc(st, settings)
        l = st.l
        ms = st.m - l if keep_soc else 0   # kept (non-eliminated) SOC rows
        me = l if keep_soc else m          # eliminated rows (G[:me])
        D = ms + n + p
        Dp = ctx.K0.shape[-1]
        # In float32 mode the H = G'W^{-2}G product — the largest matmul of
        # an iteration — runs on the MXU in f32 (W^{-2}G itself is cheap
        # elementwise work and stays f64).  The factor consumes f32 anyway;
        # refinement against the f64 operator absorbs the rounding.
        fdtype = (jnp.float32 if settings.factor_dtype == "float32"
                  else G.dtype)
        Gf = G.astype(fdtype)
        scal_f = (scal if (scal is None or fdtype == G.dtype)
                  else jax.tree_util.tree_map(
                      lambda a: a.astype(fdtype), scal))

        # inverse of the eliminated cone block (W^2 + dI over the
        # eliminated rows) — EXACT closed forms, so this strategy is the
        # exact Schur complement of the full regularized system:
        # refinement against the full operator converges to the same
        # directions as "full" (no O(delta*cond) stall near convergence).
        # LP diagonal of (W^2+dI)^{-1} (identity scalings at init):
        if scal is None:
            winv_lp = jnp.full((l,), 1.0 / (1.0 + delta), fdtype)
        else:
            winv_lp = (1.0 / (scal_f.v_lp + delta))

        if keep_soc:
            def welim_inv_rows(v):     # v: (k, l) LP rows only
                return v * winv_lp
        elif scal is None:
            winv_one = jnp.asarray(1.0 / (1.0 + delta), fdtype)

            def welim_inv_rows(v):     # v: (k, m)
                return v * winv_one
        elif st.n_sc == 0:
            def welim_inv_rows(v):     # diagonal — plain row scaling
                return v * winv_lp
        else:
            # "normal": eliminate SOC blocks too, closed form via Woodbury
            def welim_inv_rows(v):
                return jax.vmap(lambda col: cones.scale2reg_inv(
                    st.cone, scal_f, delta, col))(v)

        # hoisted kernel-path decision: the direct band scatter below
        # needs it before H assembly
        use_ds = False
        if settings.kkt_strategy == "banded" and st.band is not None:
            from .ops.pallas_band_ds import band_ds_available
            # bwb <= 6: the bw-generalized kernel's L ring buffer is
            # bw^2 (B, B) ds blocks of VMEM scratch; bw = 8 measured
            # 1.7 MB over the 16 MB scoped budget.  Wider bands fall
            # back to the XLA-scan band_ldl path.
            use_ds = (1 <= st.band.bwb <= 6 and st.band.block == 128
                      and fdtype == jnp.float64
                      and settings.pallas_leaf in ("on", "auto")
                      and band_ds_available())
        # when every eliminated row is a singleton/scatter LP row, the
        # H contributions scatter STRAIGHT into the band blocks and the
        # dense per-lane (n, n) H is never built (it dominated the
        # non-factor HBM traffic of an iteration at batch 128, and its
        # per-lane footprint was the SOCP lane's OOM at 128 lanes)
        # direct scatter needs: every ELIMINATED row covered by the
        # gsplit, narrow per-cone supports (SOCSplit — the eliminating
        # closed form and the keep_soc coupling blocks both live on
        # them), block-tridiagonal plan
        direct_band = (use_ds and st.band.bwb == 1
                       and st.gsplit is not None
                       and not st.gsplit.dense_rows
                       and (st.gsplit.n_sing or st.gsplit.n_spr)
                       and (st.n_sc == 0 or st.socsplit is not None))
        # a keep_soc plan's per-lane NT-scaled blocks only exist on the
        # scatter path: without it, fall back to the dense assembly
        if keep_soc and not direct_band:
            use_ds = False
        # NT-scaled kept layout in effect: solve S K S u = S b with
        # S = diag(W^-1, I, I) (see _soc_scaled_kept_vals)
        scaled_kept = keep_soc and direct_band
        band_vals = None
        if me:
            split = st.gsplit
            if split is not None and (split.n_sing or split.n_spr):
                # singleton LP rows (bound constraints) contribute only to
                # the diagonal of H: scatter G[r,j]^2 * winv[r] onto
                # H[j,j].  Few-nnz LP rows ("scatter rows", e.g. MPC rate
                # bounds with 2 nnz) contribute w_r*g_i*g_j on at most
                # spr_width^2 static positions: one scatter-add replaces
                # their share of the GEMM (structure.GSplit doc).  Only
                # LP rows with nnz > spr_width remain in the matmul — for
                # the MPC families that is ZERO rows, removing the
                # dominant per-iteration GEMM and the HBM spike of XLA's
                # f64-emulated matmul entirely.
                # explicit int dtype: empty tuples otherwise become
                # float64 arrays, which are invalid advanced indexers
                sing = np.asarray(split.sing_rows, dtype=np.int64)
                scol = np.asarray(split.sing_cols, dtype=np.int64)
                dense_lp = np.asarray(split.dense_rows, dtype=np.int64)
                coef = Gf[sing, scol]
                if direct_band:
                    band_vals = _band_scatter_vals(
                        st, split, Gf, winv_lp, scal_f, delta, fdtype,
                        keep_soc=keep_soc)
                    H = None
                elif split.n_spr:
                    w = split.spr_width
                    spr = np.asarray(split.spr_rows, dtype=np.int64)
                    cols2 = np.asarray(split.spr_cols,
                                       dtype=np.int64).reshape(-1, w)
                    Gpad = jnp.concatenate(
                        [Gf, jnp.zeros((m, 1), fdtype)], axis=1)
                    C = Gpad[spr[:, None], cols2]        # (n_spr, w)
                    P = (C[:, :, None] * C[:, None, :]
                         * winv_lp[spr][:, None, None])
                    flat = (cols2[:, :, None] * (n + 1)
                            + cols2[:, None, :]).ravel()  # static
                    Hs = (jnp.zeros(((n + 1) * (n + 1),), fdtype)
                          .at[flat].add(P.ravel())
                          .reshape(n + 1, n + 1)[:n, :n])
                else:
                    Hs = 0.0
                if not direct_band:
                    hdiag = jnp.zeros((n,), fdtype).at[scol].add(
                        coef * coef * winv_lp[sing])
                    Gd_lp = Gf[dense_lp]
                    WiGd_lp = Gd_lp * winv_lp[dense_lp][:, None]
                    if st.n_sc and not keep_soc:
                        G_soc = Gf[l:]
                        if scal is None:
                            WiG_soc = G_soc * jnp.asarray(
                                1.0 / (1.0 + delta), fdtype)
                        else:
                            WiG_soc = jax.vmap(
                                lambda col: cones.scale2reg_inv_soc(
                                    st.cone, scal_f, delta, col))(G_soc.T).T
                        Gd = jnp.concatenate([Gd_lp, G_soc])
                        WiGd = jnp.concatenate([WiGd_lp, WiG_soc])
                    else:
                        Gd, WiGd = Gd_lp, WiGd_lp
                    with jax.default_matmul_precision("highest"):
                        H = (Gd.T @ WiGd if Gd.shape[0]
                             else jnp.zeros((n, n), fdtype))
                        H = H + Hs + jnp.diag(hdiag + delta)
            else:
                if (st.n_sc == 0 or keep_soc) and scal is not None:
                    # diagonal eliminated block: scale rows of G directly
                    # instead of vmapping over columns (which would
                    # materialize and transpose an (me, n) intermediate
                    # twice)
                    WiG = Gf[:me] * winv_lp[:, None]
                else:
                    WiG = welim_inv_rows(Gf[:me].T).T
                with jax.default_matmul_precision("highest"):
                    H = Gf[:me].T @ WiG + delta * jnp.eye(n, dtype=fdtype)
        else:
            H = delta * jnp.eye(n, dtype=fdtype)

        if settings.kkt_strategy == "banded":
            # symbolic plan (RCM perm + block bandwidth) is static on the
            # structure; factor the permuted system block-banded
            from .ops.band_ldl import band_ldl_factor, band_ldl_solve
            from .ops.pallas_band_ds import KP, band_ds_available

            plan = st.band
            assert plan is not None, (
                "kkt_strategy='banded' needs structure.with_band_plan(...)")
            assert plan.dim == Dp and plan.block == settings.block, (
                plan.dim, Dp, plan.block, settings.block)
            perm = np.asarray(plan.perm)
            iperm = np.empty_like(perm)
            iperm[perm] = np.arange(len(perm))
            if use_ds:
                # whole factor + each solve fused into double-single
                # Pallas kernels (ops/pallas_band_ds.py) — no float64
                # matmuls (which lower to chunked while-loop emulations)
                # anywhere in the hot path.  The permuted band blocks
                # are GATHERED straight out of H/A via static index maps
                # — the dense (Dp, Dp) K is never materialized (doing so
                # cost ~4 full-matrix copies per iteration and capped
                # the batch size).
                bwb = plan.bwb
                (dmask, dih, dio), subs = _band_gather_split(
                    n, p, Dp, tuple(int(v) for v in perm), bwb,
                    ms if keep_soc else 0)
                (smask, sih, sio) = subs[0]
                other = jnp.concatenate([
                    (ctx.A.astype(fdtype).reshape(-1) if p
                     else jnp.zeros((0,), fdtype)),
                    jnp.asarray([-delta, 0.0, 1.0], fdtype)])

                if direct_band:
                    # H contributions scatter straight into the band
                    # blocks (per-lane, ~n_spr*w^2 + n_sing + n values,
                    # plus the NT-scaled kept + coupling cone blocks on
                    # a keep_soc plan); the shared [A | consts] base is
                    # gathered once (unbatched under vmap)
                    nbb = (Dp // 128) * 128 * 128
                    idx = _band_scatter_idx(
                        n, p, Dp, tuple(int(v) for v in perm),
                        st.gsplit.sing_cols, st.gsplit.spr_cols,
                        st.gsplit.spr_width,
                        (st.socsplit.cols if st.n_sc else ()),
                        (st.socsplit.width if st.n_sc else 0),
                        st.q if keep_soc else ())
                    buf = (jnp.zeros((2 * nbb,), fdtype)
                           .at[jnp.asarray(idx)].add(band_vals))
                    bufb = buf.reshape(2, -1, 128, 128)
                    Kd = (jnp.where(dmask, 0.0, other[dio]) + bufb[0])
                    Ks = (jnp.where(smask, 0.0, other[sio]) + bufb[1])
                else:
                    Hflat = H.reshape(-1)

                    def gather(mask, ih, io):
                        # per-lane part from H, shared part from
                        # [A|consts] — keeps the shared data out of
                        # per-lane buffers
                        return jnp.where(mask, Hflat[ih], other[io])

                    Kd = gather(dmask, dih, dio)
                    Ks = gather(smask, sih, sio)

                # NOTE: symmetric Jacobi pre-scaling was tried here and
                # made things much worse (56/128 NUMERICS lanes): the
                # unpivoted banded elimination's stability rests on the
                # natural magnitude ordering of the quasidefinite
                # diagonal; normalizing it trades benign scaling for
                # real elimination growth.
                if bwb == 1:
                    # factor: lane-tiled under vmap via custom_vmap
                    # (T_LANES lanes per grid program — the leaf's small
                    # vector ops are issue-bound; ~2.5x device time at
                    # 128 lanes, bit-identical output).  The factor
                    # kernel emits its bf16 chunk decomposition directly
                    # (BandFacPre) so the refinement's ~8 solves per
                    # iteration run chunk-free and the f32 factor pair
                    # never round-trips HBM; the solves are lane-tiled
                    # the same way (T_SOLVE lanes per grid program)
                    from .ops.pallas_band_ds import (band_factor_ds_pre,
                                                     band_factor_ds_pre_i8,
                                                     band_solve_ds_pre)
                    # chunk storage: int8 stores the solve streams at
                    # 8 B/element vs bf16's 14 (the solves are HBM-
                    # stream-bound); the solve kernels dispatch on the
                    # stored dtype
                    mk_fac = (band_factor_ds_pre_i8
                              if settings.chunk_store == "i8"
                              else band_factor_ds_pre)
                    dsfac = mk_fac(Kd, Ks)
                    band_solve = band_solve_ds_pre
                else:
                    from .ops.pallas_band_ds import (band_factor_ds_bw,
                                                     band_solve_ds_bw)
                    Ksubs = jnp.stack(
                        [Ks] + [gather(*subs[j]) for j in range(1, bwb)],
                        axis=1)
                    dsfac = band_factor_ds_bw(Kd, Ksubs)
                    band_solve = band_solve_ds_bw

                def padded_solve(rr):
                    k = rr.shape[1]
                    assert k <= KP, (k, KP)
                    rhs_t = (jnp.zeros((KP, Dp), rr.dtype)
                             .at[:k].set(rr[perm].T))
                    out = band_solve(dsfac, rhs_t)
                    return out[:k].T[iperm]
            else:
                K = _assemble_dense(st, ctx, H, ms, scal, scal_f, fdtype,
                                    settings)
                gdt = (jnp.float32 if settings.band_gemm == "float32"
                       else None)
                bfac = band_ldl_factor(K[perm][:, perm], plan.bwb,
                                       block=plan.block,
                                       use_pallas=settings.pallas_leaf,
                                       gemm_dtype=gdt)

                def padded_solve(rr):
                    xp = band_ldl_solve(bfac, rr[perm], plan.bwb,
                                        block=plan.block, gemm_dtype=gdt)
                    return xp[iperm]
        else:
            K = _assemble_dense(st, ctx, H, ms, scal, scal_f, fdtype,
                                settings)
            if fdtype == jnp.float64:
                # TPU: substitution form (in-kernel triangular solves,
                # lane-tiled under vmap); otherwise prechunked inverse
                fac = _factor_dense(K, settings)
            else:
                fac = ldl_factor(K, block=settings.block,
                                 use_pallas=settings.pallas_leaf)

            def padded_solve(rr):
                return ldl_solve(fac, rr)

        def solve_exact(rhs):
            # rhs: (k, n+p+m) packed rows -> (dx, dy, dz) each (k, .)
            rhs_f = rhs.astype(fdtype)
            bx, by, bz = rhs_f[:, :n], rhs_f[:, n:n + p], rhs_f[:, n + p:]
            bz_e, bz_s = bz[:, :me], bz[:, me:]  # eliminated | kept rows
            if scaled_kept and scal is not None:
                # NT-scaled kept layout: the factor holds S K S with
                # S = diag(W^-1, I, I) — transform the kept-row RHS in
                # (and the kept-row solution out, below)
                bz_s = jax.vmap(lambda v: cones.scale_winv_soc(
                    st.cone, scal_f, v))(bz_s)
            with jax.default_matmul_precision("highest"):
                oz = ctx.sGe is not None and fdtype == jnp.float64
                r1 = bx + ((_oz_mm(ctx.sGe, welim_inv_rows(bz_e), None)
                            if oz else welim_inv_rows(bz_e) @ Gf[:me])
                           if me else 0.0)
                rr = jnp.zeros((Dp, rhs.shape[0]), fdtype).at[:D].set(
                    jnp.concatenate([bz_s, r1, by], axis=1).T)
                x = padded_solve(rr)
                dzs = x[:ms].T
                if scaled_kept and scal is not None and ms:
                    dzs = jax.vmap(lambda v: cones.scale_winv_soc(
                        st.cone, scal_f, v))(dzs)
                dx = x[ms:ms + n].T
                dy = x[ms + n:D].T
                dz_e = (welim_inv_rows(
                    (_oz_mm(ctx.sGeT, dx, None) if oz
                     else dx @ Gf[:me].T) - bz_e) if me else bz_e)
                dz = jnp.concatenate([dz_e, dzs], axis=1)
            return (dx.astype(rhs.dtype), dy.astype(rhs.dtype),
                    dz.astype(rhs.dtype))

        return solve_exact

    # ---- full strategy, [z | x | y] layout
    D = st.dim_kkt
    Dp = ctx.K0.shape[-1]
    if m:
        W2 = (jnp.eye(m, dtype=G.dtype) if scal is None
              else cones.w2_dense(st.cone, scal, G.dtype))
        blk = -W2 - delta * jnp.eye(m, dtype=G.dtype)
        K = ctx.K0.at[:m, :m].set(blk)
    else:
        K = ctx.K0
    fac = _factor_in_dtype(K, settings)

    def solve_exact(rhs):
        # rhs: (k, n+p+m) packed rows -> (dx, dy, dz) each (k, .)
        bx, by, bz = rhs[:, :n], rhs[:, n:n + p], rhs[:, n + p:]
        rr = jnp.zeros((Dp, rhs.shape[0]), rhs.dtype)
        rr = (rr.at[:m].set(bz.T).at[m:m + n].set(bx.T)
              .at[m + n:D].set(by.T))
        x = _solve_padded(fac, rr)
        return x[m:m + n].T, x[m + n:D].T, x[:m].T

    return solve_exact


class KKTSolveResult(NamedTuple):
    dx: jax.Array
    dy: jax.Array
    dz: jax.Array
    nitref: jax.Array  # int32 refinement count (reference return value)


class _IRCarry(NamedTuple):
    dx: jax.Array
    dy: jax.Array
    dz: jax.Array
    ex: jax.Array   # rotated (kernel) path: residual of (dx, dy, dz),
    ey: jax.Array   # carried into the next trip's corrective solve;
    ez: jax.Array   # fallback path: the last APPLIED corrections
    #                 (undo subtracts them)
    nerr_prev: jax.Array
    k: jax.Array
    kout: jax.Array
    done: jax.Array


def solve_refined(st: ProblemStructure, ctx: KKTContext, solve_exact,
                  scal: Optional[cones.Scaling], rhs,
                  settings) -> KKTSolveResult:
    """Backsolve + iterative refinement against the exact (regularized)
    operator.  Reference: solveKKT, /root/reference/src/eicos.cpp:1471-1620.

    ``rhs`` is a stack of packed right-hand sides, shape (k, n+p+m): all k
    systems share one factorization, so the backsolves are (D, B) @ (B, k)
    matmuls and the refinement runs as ONE loop with per-column stopping —
    each column follows exactly the reference's per-solve criteria
    (threshold / undo-on-regression / weak-progress), frozen independently.
    """
    n, p, m = st.n, st.p, st.m
    delta = settings.deltastat
    # both strategies now refine against the SAME full regularized
    # operator (the reduced path eliminates (W^2 + dI) exactly)
    dz_reg = delta
    f64 = rhs.dtype
    K = rhs.shape[0]
    G, A = ctx.G, ctx.A

    bx, by, bz = rhs[:, :n], rhs[:, n:n + p], rhs[:, n + p:]

    if st.dim_kkt == 0:
        return KKTSolveResult(bx, by, bz, jnp.zeros((K,), jnp.int32))

    scale2_rows = (None if (m == 0 or scal is None)
                   else jax.vmap(lambda v: cones.scale2(st.cone, scal, v)))

    def residual(dx, dy, dz):
        # ex = bx - G'dz - A'dy - d*dx   (:1514-1521)
        # ey = by - A dx + d*dy          (:1524-1531)
        # ez = bz - G dx + W^2 dz (+ d*dz on the full operator)
        # On the kernel path the two pairs of big products run as ONE
        # fused launch each over the stacked operands [G; A] and
        # [A.T | G.T]; the CPU fallback keeps the original per-matrix
        # orientation (knife-edge certificates are decided by its f64
        # rounding path — see solver.py computeResiduals note).
        if m and p and ctx.sGA is not None:
            ex = bx - ctx.sGA.rmatmul(
                jnp.concatenate([dz, dy], axis=1)) - delta * dx
            axgx = ctx.sAGT.rmatmul(dx)
            ey = by - axgx[:, :p] + delta * dy
            Wdz = dz if scale2_rows is None else scale2_rows(dz)
            ez = bz - axgx[:, p:] + Wdz + dz_reg * dz
        else:
            ex = bx - (_oz_mm(ctx.sG, dz, G) if m else 0.0) - delta * dx
            if p:
                ex = ex - _oz_mm(ctx.sA, dy, A)
            ey = (by - _oz_mm(ctx.sAT, dx, A.T) + delta * dy) if p else by
            if m:
                Wdz = dz if scale2_rows is None else scale2_rows(dz)
                ez = bz - _oz_mm(ctx.sGT, dx, G.T) + Wdz + dz_reg * dz
            else:
                ez = bz
        nerr = (jnp.max(jnp.abs(ex), axis=1) if n
                else jnp.zeros((K,), f64))
        if m:
            nerr = jnp.maximum(nerr, jnp.max(jnp.abs(ez), axis=1))
        if p:
            nerr = jnp.maximum(nerr, jnp.max(jnp.abs(ey), axis=1))
        return ex, ey, ez, nerr

    dx0, dy0, dz0 = solve_exact(rhs)
    thresh = (1.0 + jnp.max(jnp.abs(rhs), axis=1)) * settings.linsysacc
    nitref = settings.nitref
    irerrfact = settings.irerrfact

    if ctx.sGA is not None:
        # TPU kernel path — ROTATED loop: the body is solve -> apply ->
        # residual -> decide, with the first residual evaluated before
        # the loop.  Semantically equivalent to the reference's
        # residual-first ordering (the k-th body reproduces the k-th
        # reference trip's correction count, undo target, weak-progress
        # comparison, nitref cap, and kout), but the trip on which
        # every column stops no longer performs a dead corrective
        # backsolve — one full solve + residual-GEMV set saved per
        # solve phase at the measured ~4-5 trip counts.  The reordering
        # changes last-ulp rounding via XLA refusion, which flips undo
        # comparisons at exact ties; the CPU path below keeps the
        # residual-first ordering whose rounding the knife-edge
        # certificate corpus (unboundedMaxSqrt DINF) is pinned to.
        # The kernel path's rounding already differs from CPU by
        # construction (double-single kernels), so no pin exists there.
        ex0, ey0, ez0, nerr0 = residual(dx0, dy0, dz0)
        done0 = (nerr0 < thresh) | (nitref == 0)

        def body(c: _IRCarry):
            active = ~c.done
            am = active[:, None]
            rx, ry, rz = solve_exact(
                jnp.concatenate([c.ex, c.ey, c.ez], axis=1))
            dx1 = jnp.where(am, c.dx + rx, c.dx)
            dy1 = jnp.where(am, c.dy + ry, c.dy)
            dz1 = jnp.where(am, c.dz + rz, c.dz)
            ex, ey, ez, nerr = residual(dx1, dy1, dz1)
            t = c.k + 1
            undo = active & (nerr > c.nerr_prev)
            stop = active & (undo | (t == nitref) | (nerr < thresh)
                             | (c.nerr_prev < irerrfact * nerr))
            um = undo[:, None]
            return _IRCarry(
                dx=jnp.where(um, c.dx, dx1),
                dy=jnp.where(um, c.dy, dy1),
                dz=jnp.where(um, c.dz, dz1),
                ex=ex, ey=ey, ez=ez,
                nerr_prev=jnp.where(active, nerr, c.nerr_prev),
                k=t,
                kout=jnp.where(active,
                               jnp.where(undo, t - 1, t), c.kout),
                done=c.done | stop,
            )

        init = _IRCarry(
            dx=dx0, dy=dy0, dz=dz0,
            ex=ex0, ey=ey0, ez=ez0,
            nerr_prev=nerr0,
            k=jnp.asarray(0, jnp.int32),
            kout=jnp.zeros((K,), jnp.int32),
            done=done0,
        )
        out = lax.while_loop(lambda c: ~jnp.all(c.done), body, init)
        return KKTSolveResult(dx=out.dx, dy=out.dy, dz=out.dz,
                              nitref=out.kout)

    # CPU / fallback path: residual-first ordering, bit-for-bit the
    # rounding sequence the corpus knife-edge certificates are pinned to
    def body(c: _IRCarry):
        ex, ey, ez, nerr = residual(c.dx, c.dy, c.dz)
        active = ~c.done
        undo = active & (c.k > 0) & (nerr > c.nerr_prev)
        stop = active & (undo | (c.k == nitref) | (nerr < thresh)
                         | ((c.k > 0) & (c.nerr_prev < irerrfact * nerr)))
        rx, ry, rz = solve_exact(jnp.concatenate([ex, ey, ez], axis=1))
        um = undo[:, None]
        advm = (active & ~stop)[:, None]

        def step(cur, und, nxt, corr_new, corr_old):
            new = jnp.where(um, und, jnp.where(advm, nxt, cur))
            corr = jnp.where(advm, corr_new, corr_old)
            return new, corr

        dx, rx_s = step(c.dx, c.dx - c.ex, c.dx + rx, rx, c.ex)
        dy, ry_s = step(c.dy, c.dy - c.ey, c.dy + ry, ry, c.ey)
        dz, rz_s = step(c.dz, c.dz - c.ez, c.dz + rz, rz, c.ez)
        return _IRCarry(
            dx=dx, dy=dy, dz=dz, ex=rx_s, ey=ry_s, ez=rz_s,
            nerr_prev=jnp.where(active, nerr, c.nerr_prev),
            k=c.k + 1,
            kout=jnp.where(active, jnp.where(undo, c.k - 1, c.k), c.kout),
            done=c.done | stop,
        )

    init = _IRCarry(
        dx=dx0, dy=dy0, dz=dz0,
        ex=jnp.zeros_like(dx0), ey=jnp.zeros_like(dy0),
        ez=jnp.zeros_like(dz0),
        nerr_prev=jnp.full((K,), jnp.inf, f64),
        k=jnp.asarray(0, jnp.int32),
        kout=jnp.zeros((K,), jnp.int32),
        done=jnp.zeros((K,), bool),
    )
    out = lax.while_loop(lambda c: ~jnp.all(c.done), body, init)
    return KKTSolveResult(dx=out.dx, dy=out.dy, dz=out.dz, nitref=out.kout)
