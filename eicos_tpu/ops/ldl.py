"""Blocked dense LDL^T factorization with explicit inverse, pure-matmul.

TPU-native replacement for the reference's Eigen SimplicialLDLT
(/root/reference/include/eicos.hpp:221-222).  The KKT matrix is symmetric
*quasidefinite* after static regularization, so an LDL^T with diagonal D
exists for any symmetric ordering without pivoting (Vanderbei); block
order is chosen by the caller (kkt.py) so every pivot block is O(1).

Design (v2, driven by TPU profiling):

* **Recursive half-splitting** instead of a right-looking panel sweep:
  factor the leading half, form the off-diagonal block with one GEMM,
  update the trailing half with one GEMM, recurse.  Every matmul is
  exactly sized — the panel sweep's full-height masked updates burned 3x
  the flops to keep shapes static; the recursion gets static shapes for
  free because the split points are trace-time constants.

* **The unit-lower inverse L^{-1} is materialized during factorization**
  (same recursion: L21inv = -L22inv @ L21 @ L11inv).  Triangular
  substitution on TPU is latency-bound — 2*nb sequential (D,B)@(B,k)
  steps of a few microseconds of real work each; with L^{-1} a solve is
  TWO dense GEMMs + a diagonal scale, fully parallel on the MXU.  The
  extra ~D^3/3 flops at factor time are repaid by the ~5 solves per IPM
  iteration.  Inverse-based solves are less backward-stable than
  substitution, but every consumer runs under float64 iterative
  refinement against the exact operator (kkt.solve_refined), which
  absorbs the difference.

* 128x128 diagonal leaves use a sequential rank-1 loop (VPU) and a
  Newton-Schulz doubling inverse — exact for unit-triangular in
  ceil(log2(128)) = 7 doublings of two matmuls.

* All matmuls run at ``highest`` precision: on TPU, float32 inputs
  otherwise go through single-pass bfloat16 (eps ~ 8e-3), which destroys
  the factor quality iterative refinement depends on.

No jax.lax.linalg primitives anywhere, so the same code compiles for
float32/float64 on TPU and CPU under arbitrary vmap/shard_map nestings.
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax


class LDLFactors(NamedTuple):
    Linv: jax.Array   # (D, D) inverse of the unit-lower factor
    d: jax.Array      # (D,) pivots


class LDLFactorsPre(NamedTuple):
    """LDLFactors with Linv prechunked for the double-single solve
    kernel (ops/pallas_gemm_ds.PrechunkedOperand): the solve path calls
    a @ Linv.T and t @ Linv ~2 x (1 + refinement trips) times per
    factorization, and the per-call operand split / transpose / in-kernel
    chunk decomposition dominated single-lane LPnetlib solves.  Built
    once per factor by ldl_prechunk."""
    pre_t: object    # a @ Linv.T operand (chunked along Linv axis 1)
    pre_n: object    # t @ Linv operand (chunked along Linv axis 0)
    d: jax.Array


class LDLSubstFactors(NamedTuple):
    """Substitution-form factor for the TPU float64 dense path: the
    strictly-block-lower panels of L and the 128-block leaf inverses,
    prechunked for the in-kernel blocked-substitution solve kernels
    (ops/pallas_dense_ds).  Solves stream the TRIANGLE once per pass
    instead of the dense inverse twice — ~2x less HBM per refined
    trip — and lane-tile under the solver's vmap (the round-4 verdict's
    named fix for near-serial batched LPnetlib scaling)."""
    pre: object      # pallas_dense_ds.DenseFacPre
    d: jax.Array     # (D,) pivots


def ldl_prechunk(fac: LDLFactors):
    """Prechunk a float64 factor for the TPU ds solve path; on any other
    path return it unchanged (ldl_solve accepts both)."""
    if not _use_ds_gemm(fac.Linv.dtype):
        return fac
    from .pallas_gemm_ds import PrechunkedOperand

    hi = fac.Linv.astype(jnp.float32)
    lo = (fac.Linv - hi.astype(jnp.float64)).astype(jnp.float32)
    return LDLFactorsPre(
        pre_t=PrechunkedOperand(hi, lo, transpose_b=True),
        pre_n=PrechunkedOperand(hi, lo, transpose_b=False),
        d=fac.d)


def pad_to_block(D: int, block: int = 128) -> int:
    return max(block, ((D + block - 1) // block) * block)


def _unblocked_ldl(M):
    """LDL^T of a (B, B) symmetric block. Returns (L unit-lower, d).

    Pivots are clamped away from zero: quasidefinite pivots are nonzero in
    exact arithmetic, but a float32 factorization of an ill-conditioned
    block can underflow one to 0, and the resulting inf/NaN would poison
    the whole solve (NaN exit with a restored stale iterate).  A clamped
    pivot merely yields an inaccurate direction, which iterative
    refinement's undo-on-regression absorbs and the solver's masked exits
    handle gracefully."""
    B = M.shape[-1]
    ridx = np.arange(B)
    tiny = jnp.asarray(1e-20 if M.dtype == jnp.float32 else 1e-150, M.dtype)

    def body(j, carry):
        M, L, d = carry
        dj = M[j, j]
        dj = jnp.where(jnp.abs(dj) < tiny,
                       jnp.where(dj < 0, -tiny, tiny), dj)
        l = jnp.where(ridx > j, M[:, j] / dj, 0.0)
        M = M - dj * l[:, None] * l[None, :]
        L = L.at[:, j].set(l)
        d = d.at[j].set(dj)
        return M, L, d

    L0 = jnp.zeros_like(M)
    d0 = jnp.zeros((B,), M.dtype)
    _, L, d = lax.fori_loop(0, B, body, (M, L0, d0))
    return L + jnp.eye(B, dtype=M.dtype), d


def _unit_lower_inv(L):
    """Inverse of a unit lower-triangular (B, B) block via Newton-Schulz
    doubling: with L = I - N (N strictly lower, nilpotent), X <- X(2I - LX)
    starting at X = 2I - L doubles the covered Neumann series each step, so
    ceil(log2(B)) steps give L^{-1} exactly (up to rounding)."""
    B = L.shape[-1]
    steps = max(1, int(np.ceil(np.log2(B))))
    eye2 = 2.0 * jnp.eye(B, dtype=L.dtype)

    def body(_, X):
        return X @ (eye2 - L @ X)

    return lax.fori_loop(0, steps, body, eye2 - L)


def _use_ds_gemm(dtype) -> bool:
    """Route float64 GEMMs through the double-single Pallas kernel on
    TPU: XLA's f64 dot emulation is a chunked while-loop whose
    per-chunk overhead (~65 us) dominates at the recursion's block
    sizes — measured as the bulk of single-lane LPnetlib iterations."""
    if dtype != jnp.float64:
        return False
    from .pallas_gemm_ds import gemv_ds_available

    return gemv_ds_available()


def _mm(a, b, ds: bool):
    if ds:
        from .pallas_gemm_ds import matmul_ds

        return matmul_ds(a, b)
    return a @ b


def _mm_sym(ad, bT, ds: bool, leaf: int = 256):
    """``ad @ bT.T`` for a product that is symmetric in exact
    arithmetic (the Schur term (L d) L'): computes only the lower block
    triangle recursively and MIRRORS the strict upper — ~half the
    MXU/fold work of the full product at large sizes.  The result is
    exactly symmetric (the current full product is only symmetric up
    to ~2^-48 ds rounding); the mirrored upper differs from the
    directly-computed one at the same rounding level, which the f64
    iterative refinement absorbs.  Used on the TPU ds path only so the
    CPU/f64 reference paths stay bit-for-bit."""
    if not ds:
        return _mm(ad, bT.T, ds)
    M = ad.shape[-2]
    if M <= leaf:
        return _mm(ad, bT.T, ds)
    h = ((M // 128) // 2) * 128
    P11 = _mm_sym(ad[:h], bT[:h], ds, leaf)
    P21 = _mm(ad[h:], bT[:h].T, ds)
    P22 = _mm_sym(ad[h:], bT[h:], ds, leaf)
    top = jnp.concatenate([P11, P21.T], axis=1)
    bot = jnp.concatenate([P21, P22], axis=1)
    return jnp.concatenate([top, bot], axis=0)


def _leaf(K, use_pallas: bool):
    """(block, block) leaf -> (Linv, d)."""
    if use_pallas and K.shape[-1] == 128 and K.dtype == jnp.float32:
        from .pallas_leaf import leaf_ldl_pallas

        Linv, d = leaf_ldl_pallas(K[None])
        return Linv[0], d[0]
    if use_pallas and K.shape[-1] == 128 and K.dtype == jnp.float64:
        # double-single kernel: ~2^-48 factor AND unit-lower inverse in
        # ONE launch; under the solver's lane vmap the custom_vmap
        # collapses the batch into the lane-tiled kernel (T_LEAF lanes
        # per grid program) instead of a per-lane grid replay
        from .pallas_leaf_ds import leaf_ldl_ds_one

        return leaf_ldl_ds_one(K)
    L, d = _unblocked_ldl(K)
    return _unit_lower_inv(L), d


def _ldl_rec(K, block: int, use_pallas: bool, ds: bool = False):
    """Returns (Linv, d) for symmetric K (D, D), D a multiple of block."""
    D = K.shape[-1]
    if D <= block:
        return _leaf(K, use_pallas)

    nb = D // block
    h = (nb // 2) * block  # split point (multiple of block)
    K11 = K[:h, :h]
    K21 = K[h:, :h]
    K22 = K[h:, h:]

    L11inv, d1 = _ldl_rec(K11, block, use_pallas, ds)
    # K21 = L21 D1 L11^T  =>  L21 = K21 L11^{-T} D1^{-1}
    L21 = _mm(K21, L11inv.T, ds) / d1[None, :]
    K22s = K22 - _mm(L21 * d1[None, :], L21.T, ds)
    L22inv, d2 = _ldl_rec(K22s, block, use_pallas, ds)
    # [L11 0; L21 L22]^{-1} = [L11inv 0; -L22inv L21 L11inv, L22inv]
    L21inv = -_mm(L22inv, _mm(L21, L11inv, ds), ds)
    Linv = jnp.zeros_like(K)
    Linv = Linv.at[:h, :h].set(L11inv)
    Linv = Linv.at[h:, :h].set(L21inv)
    Linv = Linv.at[h:, h:].set(L22inv)
    return Linv, jnp.concatenate([d1, d2])


def _ldl_rec_subst(K, block: int, use_pallas: bool, ds: bool = False,
                   need_inv: bool = False):
    """_ldl_rec that assembles the strictly-block-lower panels of L
    (the substitution-solve operand) and the 128-block leaf inverses,
    materializing the FULL unit-lower inverse only where the recursion
    actually consumes it.  Need-propagation: a node's Linv feeds (a)
    its parent's L21 product when the node is a LEFT child — always —
    and (b) its parent's own Linv assembly — only if the parent's Linv
    is itself needed.  The root's Linv feeds nothing (the solve kernels
    take panels + leaf inverses), so the root and the whole right spine
    skip their assembly GEMMs: ~86% of the inverse-assembly flops,
    ~40% of the factor (measured: the batched factor is GEMM-rate-bound
    at the double-single fold rate).  L21/Schur/d are untouched, so the
    FACTOR is bit-identical to ldl_factor's; the leaf-inverse diagonal
    blocks are read before any assembly writes, so Xinv is too.

    Returns (Linv | None, Xdiag (D/block, B, B), Loff, d)."""
    D = K.shape[-1]
    if D <= block:
        Linv, d = _leaf(K, use_pallas)
        return Linv, Linv[None], jnp.zeros_like(K), d

    nb = D // block
    h = (nb // 2) * block
    K11 = K[:h, :h]
    K21 = K[h:, :h]
    K22 = K[h:, h:]

    L11inv, X1, Lo1, d1 = _ldl_rec_subst(K11, block, use_pallas, ds,
                                         need_inv=True)
    L21 = _mm(K21, L11inv.T, ds) / d1[None, :]
    K22s = K22 - _mm_sym(L21 * d1[None, :], L21, ds)
    L22inv, X2, Lo2, d2 = _ldl_rec_subst(K22s, block, use_pallas, ds,
                                         need_inv=need_inv)
    Xdiag = jnp.concatenate([X1, X2])
    Loff = jnp.zeros_like(K)
    Loff = Loff.at[:h, :h].set(Lo1)
    Loff = Loff.at[h:, :h].set(L21)
    Loff = Loff.at[h:, h:].set(Lo2)
    d = jnp.concatenate([d1, d2])
    if not need_inv:
        return None, Xdiag, Loff, d
    L21inv = -_mm(L22inv, _mm(L21, L11inv, ds), ds)
    Linv = jnp.zeros_like(K)
    Linv = Linv.at[:h, :h].set(L11inv)
    Linv = Linv.at[h:, :h].set(L21inv)
    Linv = Linv.at[h:, h:].set(L22inv)
    return Linv, Xdiag, Loff, d


def ldl_factor_subst(K, block: int = 128,
                     use_pallas: str = "off") -> LDLSubstFactors:
    """Factor padded symmetric K into the prechunked SUBSTITUTION form
    (LDLSubstFactors) consumed by the in-kernel dense solves.  Same
    elimination arithmetic (bit-identical L, d) as ldl_factor; the
    unit-lower inverse is formed only for the left-spine subtrees whose
    L21 products require it (see _ldl_rec_subst), and only the leaf
    inverses ship to the solve kernels."""
    D = K.shape[-1]
    assert D % block == 0 and block == 128, (D, block)
    from .pallas_leaf import pallas_available

    ok = pallas_available() and K.dtype in (jnp.float32, jnp.float64)
    pallas = ok and use_pallas in ("on", "auto")
    ds = _use_ds_gemm(K.dtype) and use_pallas in ("on", "auto")
    with jax.default_matmul_precision("highest"):
        _, Xinv, Loff, d = _ldl_rec_subst(K, block, pallas, ds)
    from .pallas_dense_ds import prechunk_dense

    return LDLSubstFactors(pre=prechunk_dense(Loff, Xinv, d), d=d)


def ldl_factor(K, block: int = 128, use_pallas: str = "off") -> LDLFactors:
    """Factor padded symmetric K (D, D), D a multiple of ``block``.

    ``use_pallas``: "on" uses the fused Pallas leaf kernel (float32 on
    real TPU only — the sequential leaf loop is latency-bound as plain XLA
    ops, which matters for single/small-batch solves; large vmapped
    batches amortize it and run slightly faster with the XLA leaf).
    "auto" = on whenever it is available.
    """
    D = K.shape[-1]
    assert D % block == 0, (D, block)
    from .pallas_leaf import pallas_available

    ok = pallas_available() and K.dtype in (jnp.float32, jnp.float64)
    pallas = ok and use_pallas in ("on", "auto")
    ds = _use_ds_gemm(K.dtype) and use_pallas in ("on", "auto")
    with jax.default_matmul_precision("highest"):
        Linv, d = _ldl_rec(K, block, pallas, ds)
    return LDLFactors(Linv=Linv, d=d)


def ldl_solve(fac: LDLFactors, rhs):
    """Solve K x = rhs for padded RHS of shape (D,) or (D, k):
    x = L^{-T} D^{-1} L^{-1} rhs — two MXU GEMMs and a diagonal scale.

    On the TPU float64 path the two GEMMs run through the double-single
    kernel in ROW form ((x^T Linv^T) and (t^T Linv)): the rhs has k <= 2
    live columns, so the row-tiled kernel pads k to 16 rows instead of
    the 128-column panel a column-form product would pad to."""
    single = rhs.ndim == 1
    x = rhs[:, None] if single else rhs
    if isinstance(fac, LDLSubstFactors):
        from .pallas_band_ds import KP
        from .pallas_dense_ds import dense_solve_ds

        k = x.shape[1]
        Dp = x.shape[0]
        assert k <= KP, (k, KP)
        rhs_t = jnp.zeros((KP, Dp), x.dtype).at[:k].set(x.T)
        out = dense_solve_ds(fac.pre, rhs_t)[:k].T
        return out[:, 0] if single else out
    if isinstance(fac, LDLFactorsPre):
        t = fac.pre_t.rmatmul(x.T) / fac.d[None, :]
        x = fac.pre_n.rmatmul(t).T
        return x[:, 0] if single else x
    if _use_ds_gemm(x.dtype):
        from .pallas_gemm_ds import matmul_ds

        t = matmul_ds(x.T, fac.Linv.T) / fac.d[None, :]
        x = matmul_ds(t, fac.Linv).T
        return x[:, 0] if single else x
    with jax.default_matmul_precision("highest"):
        x = fac.Linv @ x
        x = x / fac.d[:, None]
        x = fac.Linv.T @ x
    return x[:, 0] if single else x
