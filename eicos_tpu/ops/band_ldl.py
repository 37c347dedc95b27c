"""Block-banded LDL^T factorization and solves, pure-matmul, scan-based.

The sparse-direct path of the framework: the reference relies on Eigen's
AMD-ordered SimplicialLDLT for fill reduction
(/root/reference/include/eicos.hpp:221-222).  Irregular supernodes map
poorly onto the MXU's 128x128 tiling, so the TPU-native equivalent is a
*banded* factorization over a Reverse-Cuthill-McKee ordering (computed
host-side by the native library, native/eicos_native.cpp): RCM
concentrates the pattern near the diagonal, and a block-banded LDL^T has
perfectly regular 128x128 block structure — every operation is an
exactly-sized matmul, and the band never fills beyond its width
(factorization preserves bandedness).

The factorization and both triangular solves are single ``lax.scan``s
over block rows with a ring buffer of the last ``bwb`` rows as carry
(v2 — the round-1 version unrolled the block-row loop at trace time,
emitting ~nb*bwb^2 distinct GEMMs; program size now is O(bwb^2)
independent of nb, which keeps XLA compile time bounded for large
problems).  Out-of-range ring slots are initialized to (L=0, Dinv=I,
d=1) so boundary rows need no masking: zero blocks propagate exactly.

Measured flop ratios vs the dense path on the reference corpus
(PARITY.md): 3-12x for the mid/large LPnetlib problems; ~1x for MPC-class
problems, which therefore stay on the dense recursive path (ops/ldl.py).

Storage: the factor's strictly-lower band as (nb, bwb, B, B) — block row
k holds L[k, k-1-s] at index s (newest-left neighbor first) — plus
per-block diagonal inverses and pivots.
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax

from .ldl import _unblocked_ldl, _unit_lower_inv, pad_to_block


class BandFactors(NamedTuple):
    Lband: jax.Array   # (nb, bwb, B, B) strictly-lower block band
    d: jax.Array       # (D,) pivots
    Dinv: jax.Array    # (nb, B, B) inverses of the unit-lower diag blocks


def band_blocks(bw: int, block: int = 128) -> int:
    """Block bandwidth covering scalar bandwidth ``bw``."""
    return int(np.ceil((bw + 1) / block))


def _band_views(K, bwb: int, B: int):
    """Extract per-block-row scan inputs from dense K: the diagonal block
    and the strictly-lower band row (zero-padded outside the matrix)."""
    D = K.shape[-1]
    nb = D // B
    Kb = K.reshape(nb, B, nb, B).transpose(0, 2, 1, 3)  # (nb, nb, B, B)
    rows = np.arange(nb)
    Kdiag = Kb[rows, rows]                              # (nb, B, B)
    # Kband[k, s] = K[k, k-1-s] or 0
    s = np.arange(bwb)
    cols = rows[:, None] - 1 - s[None, :]               # (nb, bwb)
    valid = cols >= 0
    Kband = Kb[rows[:, None], np.where(valid, cols, 0)]
    Kband = jnp.where(jnp.asarray(valid)[:, :, None, None], Kband, 0.0)
    return Kdiag, Kband


def _band_leaf(Kkk, use_pallas: str):
    """Diagonal-block leaf -> (Dinv, d).  On TPU the double-single
    Pallas kernel (float64) or the plain float32 kernel replaces the
    128-step sequential rank-1 loop (one launch per block row instead
    of ~128x8 latency-bound XLA ops)."""
    B = Kkk.shape[-1]
    if use_pallas in ("on", "auto") and B == 128:
        if Kkk.dtype == jnp.float64:
            from .pallas_leaf import pallas_available
            from .pallas_leaf_ds import leaf_ldl_pallas_ds

            if pallas_available():
                _, dd, Xinv = leaf_ldl_pallas_ds(Kkk[None])
                return Xinv[0], dd[0]
        elif Kkk.dtype == jnp.float32:
            from .pallas_leaf import leaf_ldl_pallas, pallas_available

            if pallas_available():
                Linv, dd = leaf_ldl_pallas(Kkk[None])
                return Linv[0], dd[0]
    Ld, dd = _unblocked_ldl(Kkk)
    return _unit_lower_inv(Ld), dd


def band_ldl_factor(K, bwb: int, block: int = 128,
                    use_pallas: str = "auto",
                    gemm_dtype=None) -> BandFactors:
    """Factor symmetric block-banded K (D, D), D a multiple of ``block``;
    blocks further than ``bwb`` block rows below the diagonal are assumed
    (and preserved) zero.

    ``gemm_dtype``: dtype for the off-diagonal/Schur block products.
    float64 matmuls on TPU lower to chunked while-loop emulations whose
    per-iteration overhead dwarfs the math at (128,128) sizes (measured:
    ~300us per small f64 matmul); float32 products at "highest" precision
    keep ~7e-7 relative accuracy, which float64 iterative refinement
    against the exact operator absorbs.  None = K.dtype (exact parity
    behavior)."""
    D = K.shape[-1]
    B = block
    assert D % B == 0, (D, B)
    nb = D // B
    dtype = K.dtype
    gdt = dtype if gemm_dtype is None else gemm_dtype
    Kdiag, Kband = _band_views(K, bwb, B)

    def mm(a, b):
        return (a.astype(gdt) @ b.astype(gdt)).astype(dtype)

    def step(carry, xs):
        # carry rings: slot s holds block row k-1-s (newest first)
        Lring, Dinvring, dring = carry
        Kkk, Arow = xs
        # row[s] = L[k, k-1-s]; leftmost (s = bwb-1) first: left blocks
        # feed the ones to their right
        row = [None] * bwb
        for t in range(bwb, 0, -1):          # j = k - t
            Akj = Arow[t - 1]
            # K[k,j] = sum_{i<=j} L[k,i] D_i L[j,i]^T; subtract i < j
            # (i = k - u, u in (t, bwb]); L[j,i] = Lring[t-1][u-t-1]
            for u in range(t + 1, bwb + 1):
                Akj = Akj - mm(row[u - 1] * dring[u - 1][None, :],
                               Lring[t - 1, u - t - 1].T)
            # i = j term: L[k,j] = Akj Dinv_j^T / d_j
            row[t - 1] = mm(Akj, Dinvring[t - 1].T) / dring[t - 1][None, :]
        # diagonal Schur update + leaf factorization
        for t in range(1, bwb + 1):
            Kkk = Kkk - mm(row[t - 1] * dring[t - 1][None, :],
                           row[t - 1].T)
        Dinvk, dd = _band_leaf(Kkk, use_pallas)
        rowk = jnp.stack(row)                # (bwb, B, B), index s = t-1
        new_carry = (
            jnp.concatenate([rowk[None], Lring[:-1]]),
            jnp.concatenate([Dinvk[None], Dinvring[:-1]]),
            jnp.concatenate([dd[None], dring[:-1]]),
        )
        return new_carry, (rowk, Dinvk, dd)

    eye = jnp.eye(B, dtype=dtype)
    carry0 = (
        jnp.zeros((bwb, bwb, B, B), dtype),          # L = 0 outside
        jnp.broadcast_to(eye, (bwb, B, B)),          # Dinv = I outside
        jnp.ones((bwb, B), dtype),                   # d = 1 outside
    )
    with jax.default_matmul_precision("highest"):
        _, (Lband, Dinv, dvals) = lax.scan(step, carry0, (Kdiag, Kband),
                                           unroll=_unroll(nb, bwb))
    return BandFactors(Lband=Lband, d=dvals.reshape(-1), Dinv=Dinv)


def _unroll(nb: int, bwb: int) -> int:
    """Scan unroll factor.  Each scan *iteration* costs ~65us of TPU
    runtime overhead (measured on v5e through the axon runtime) — for
    MPC-class problems (nb ~ 16, bwb = 1) that overhead dominates the
    entire factorization, so small bands unroll fully into straight-line
    code.  Large problems keep a bounded program: the O(bwb^2) body is
    replicated at most ``64 // bwb`` times."""
    if nb * bwb <= 64:
        return nb
    return max(1, min(8, 64 // max(1, bwb)))


def band_ldl_solve(fac: BandFactors, rhs, bwb: int, block: int = 128,
                   gemm_dtype=None):
    """Solve K x = rhs for (D,) or (D, k) right-hand sides."""
    B = block
    Lband, d, Dinv = fac.Lband, fac.d, fac.Dinv
    nb = Lband.shape[0]
    single = rhs.ndim == 1
    x = rhs[:, None] if single else rhs
    k_rhs = x.shape[1]
    dtype = x.dtype
    gdt = dtype if gemm_dtype is None else gemm_dtype
    xb = x.reshape(nb, B, k_rhs)

    def mm(a, b):
        return (a.astype(gdt) @ b.astype(gdt)).astype(dtype)

    with jax.default_matmul_precision("highest"):
        # forward: (L+I) y = rhs, block rows top down; carry = last bwb y
        def fwd(yring, xs):
            Lk, Dinvk, xk = xs
            acc = xk
            for t in range(1, bwb + 1):      # y_{k-t} = yring[t-1]
                acc = acc - mm(Lk[t - 1], yring[t - 1])
            yk = mm(Dinvk, acc)
            return jnp.concatenate([yk[None], yring[:-1]]), yk

        yring0 = jnp.zeros((bwb, B, k_rhs), dtype)
        _, y = lax.scan(fwd, yring0, (Lband, Dinv, xb),
                        unroll=_unroll(nb, bwb))
        y = y.reshape(-1, k_rhs) / d[:, None]

        # backward: (L+I)^T z = y, block rows bottom up; carry = ring of
        # the last bwb z blocks AND the corresponding Lband rows (row k
        # needs L[k+t][t-1]^T z_{k+t}, i.e. rows below itself)
        yb = y.reshape(nb, B, k_rhs)

        def bwd(carry, xs):
            zring, Lring = carry
            Lk, Dinvk, yk = xs
            acc = yk
            for t in range(1, bwb + 1):      # z_{k+t}, L[k+t]
                acc = acc - mm(Lring[t - 1, t - 1].T, zring[t - 1])
            zk = mm(Dinvk.T, acc)
            return ((jnp.concatenate([zk[None], zring[:-1]]),
                     jnp.concatenate([Lk[None], Lring[:-1]])), zk)

        carry0 = (jnp.zeros((bwb, B, k_rhs), dtype),
                  jnp.zeros((bwb, bwb, B, B), dtype))
        _, z = lax.scan(bwd, carry0, (Lband, Dinv, yb), reverse=True,
                        unroll=_unroll(nb, bwb))
        z = z.reshape(-1, k_rhs)
    return z[:, 0] if single else z
