"""Block-banded LDL^T factorization and solves, pure-matmul.

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

Measured flop ratios vs the dense path on the reference corpus
(PARITY.md): 3-12x for the mid/large LPnetlib problems; ~1x for MPC-class
problems, which therefore stay on the dense recursive path (ops/ldl.py).

Storage: the factor's strictly-lower band as (nb, bwb, B, B) — block row
k holds L[k, j] for j in [k-bwb, k), newest first at index 0 —
plus per-block diagonal inverses and pivots.  The factor loop is a
trace-time Python loop over block rows (the band plan is static), so XLA
sees a flat sequence of exactly-sized GEMMs.
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np

from .ldl import _unblocked_ldl, _unit_lower_inv, pad_to_block


class BandFactors(NamedTuple):
    Lband: jax.Array   # (nb, bwb, B, B) strictly-lower block band
    d: jax.Array       # (D,) pivots
    Dinv: jax.Array    # (nb, B, B) inverses of the unit-lower diag blocks


def band_blocks(bw: int, block: int = 128) -> int:
    """Block bandwidth covering scalar bandwidth ``bw``."""
    return int(np.ceil((bw + 1) / block))


def band_ldl_factor(K, bwb: int, block: int = 128) -> BandFactors:
    """Factor symmetric block-banded K (D, D), D a multiple of ``block``;
    blocks further than ``bwb`` block rows below the diagonal are assumed
    (and preserved) zero."""
    D = K.shape[-1]
    B = block
    assert D % B == 0, (D, B)
    nb = D // B

    with jax.default_matmul_precision("highest"):
        Lrows = []       # Lrows[k][s] = L[k, k-1-s] (strictly-lower band)
        Dinvs = []       # unit-lower inverse of each factored diagonal
        dvals = []       # pivots per block row

        for k in range(nb):
            lo = max(0, k - bwb)
            # off-diagonal row blocks L[k, j], left to right (left blocks
            # feed the ones to their right)
            row = {}
            for j in range(lo, k):
                Akj = K[k * B:(k + 1) * B, j * B:(j + 1) * B]
                # K[k,j] = sum_{i<=j} L[k,i] D_i L[j,i]^T; subtract i<j
                # (L[j,i] exists iff i >= j-bwb, L[k,i] iff i >= lo)
                for i in range(max(lo, j - bwb), j):
                    Lji = Lrows[j][j - 1 - i]
                    Akj = Akj - (row[i] * dvals[i][None, :]) @ Lji.T
                # i = j term: A = L[k,j] D_j L_jj^T
                # =>  L[k,j] = A L_jj^{-T} D_j^{-1}
                row[j] = (Akj @ Dinvs[j].T) / dvals[j][None, :]
            # diagonal Schur update + leaf factorization
            Kkk = K[k * B:(k + 1) * B, k * B:(k + 1) * B]
            for j in range(lo, k):
                Kkk = Kkk - (row[j] * dvals[j][None, :]) @ row[j].T
            Ld, dd = _unblocked_ldl(Kkk)
            Dinvs.append(_unit_lower_inv(Ld))
            dvals.append(dd)
            Lrows.append([row.get(k - 1 - s, jnp.zeros((B, B), K.dtype))
                          for s in range(bwb)])

        Lband = jnp.stack([jnp.stack(r) for r in Lrows])
        return BandFactors(Lband=Lband, d=jnp.concatenate(dvals),
                           Dinv=jnp.stack(Dinvs))


def band_ldl_solve(fac: BandFactors, rhs, bwb: int, block: int = 128):
    """Solve K x = rhs for (D,) or (D, k) right-hand sides."""
    B = block
    Lband, d, Dinv = fac.Lband, fac.d, fac.Dinv
    nb = Lband.shape[0]
    single = rhs.ndim == 1
    x = rhs[:, None] if single else rhs
    k_rhs = x.shape[1]

    with jax.default_matmul_precision("highest"):
        # forward: (L+I) y = rhs, block rows top down
        ys = []
        for kk in range(nb):
            acc = x[kk * B:(kk + 1) * B]
            lo = max(0, kk - bwb)
            for j in range(lo, kk):
                acc = acc - Lband[kk, kk - 1 - j] @ ys[j]
            ys.append(Dinv[kk] @ acc)
        y = jnp.concatenate(ys, axis=0)
        y = y / d[:, None]
        # backward: (L+I)^T z = y, block rows bottom up
        zs = [None] * nb
        for kk in range(nb - 1, -1, -1):
            acc = y[kk * B:(kk + 1) * B]
            hi = min(nb, kk + bwb + 1)
            for i in range(kk + 1, hi):
                acc = acc - Lband[i, i - 1 - kk].T @ zs[i]
            zs[kk] = Dinv[kk].T @ acc
        z = jnp.concatenate(zs, axis=0)
    return z[:, 0] if single else z
