"""Blocked dense LDL^T factorization and triangular solves, pure-matmul.

TPU-native replacement for the reference's Eigen SimplicialLDLT
(/root/reference/include/eicos.hpp:221-222).  The KKT matrix

    K = [ dI  A'  G' ; A  -dI  0 ; G  0  -W^2-dI ]

is symmetric *quasidefinite* after static regularization, so an LDL^T with
diagonal D exists for any symmetric ordering without pivoting (Vanderbei);
the D signs are fixed by the block structure.  That lets us run a clean
right-looking blocked factorization whose flop mass is rank-B trailing
updates — plain matmuls that XLA tiles onto the MXU and that vmap into
batched matmuls for free.  No jax.lax.linalg primitives are used anywhere,
so the same code path compiles for float32/float64 on TPU and CPU and under
arbitrary vmap/shard_map nestings.

Design notes
------------
* The matrix is padded to a multiple of the block size B (128 = MXU tile)
  with identity diagonal; padded RHS entries are zero.
* Diagonal blocks are factored by an unblocked rank-1 loop (B small steps on
  the VPU), then *inverted* via Newton-Schulz doubling (log2(B) iterations
  of two matmuls — exact for unit-triangular), so the subsequent panel
  computation and both triangular solves are matmuls with the precomputed
  inverses — no substitution loops at solve time.
* Trailing updates run over full rows with masking (static shapes); the
  wasted flops on the already-factored region multiply zeros and keep the
  schedule fully static for XLA.
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax


class LDLFactors(NamedTuple):
    L: jax.Array      # (D, D) unit lower triangular (diag implicit)
    d: jax.Array      # (D,) pivots
    Linv: jax.Array   # (nb, B, B) inverses of the unit-lower diagonal blocks

    @property
    def block(self) -> int:
        return self.Linv.shape[-1]


def pad_to_block(D: int, block: int = 128) -> int:
    return max(block, ((D + block - 1) // block) * block)


def _unblocked_ldl(M):
    """LDL^T of a (B, B) symmetric block. Returns (L unit-lower, d)."""
    B = M.shape[-1]
    ridx = np.arange(B)

    def body(j, carry):
        M, L, d = carry
        dj = M[j, j]
        l = jnp.where(ridx > j, M[:, j] / dj, 0.0)
        M = M - dj * l[:, None] * l[None, :]
        L = L.at[:, j].set(l)
        d = d.at[j].set(dj)
        return M, L, d

    M0 = M
    L0 = jnp.zeros_like(M)
    d0 = jnp.zeros((B,), M.dtype)
    _, L, d = lax.fori_loop(0, B, body, (M0, L0, d0))
    return L + jnp.eye(B, dtype=M.dtype), d


def _unit_lower_inv(L):
    """Inverse of a unit lower-triangular (B, B) block via Newton-Schulz
    doubling: with L = I - N (N strictly lower, nilpotent), the iteration
    X <- X (2I - L X) starting at X = 2I - L = I + N doubles the covered
    Neumann series each step, so after ceil(log2(B)) steps
    X = sum_{j<B} N^j = L^{-1} *exactly* (up to rounding).
    ceil(log2(B)) * 2 matmuls — tiny program, all MXU."""
    B = L.shape[-1]
    steps = max(1, int(np.ceil(np.log2(B))))
    eye2 = 2.0 * jnp.eye(B, dtype=L.dtype)

    def body(_, X):
        return X @ (eye2 - L @ X)

    return lax.fori_loop(0, steps, body, eye2 - L)


def ldl_factor(K, block: int = 128) -> LDLFactors:
    """Factor padded symmetric K (D, D), D a multiple of ``block``.

    All matmuls run at ``highest`` precision: on TPU, float32 inputs
    otherwise go through single-pass bfloat16 MXU matmuls (eps ~ 8e-3),
    which destroys the factorization quality that iterative refinement
    depends on.  ``highest`` keeps true-f32 accuracy on the MXU."""
    with jax.default_matmul_precision("highest"):
        return _ldl_factor_impl(K, block)


def _ldl_factor_impl(K, block: int) -> LDLFactors:
    D = K.shape[-1]
    B = block
    assert D % B == 0, (D, B)
    nb = D // B
    ridx = np.arange(D)
    dtype = K.dtype

    def body(k, carry):
        M, L, dvec, Linvs = carry
        off = k * B
        panel = lax.dynamic_slice(M, (0, off), (D, B))          # (D, B)
        diag = lax.dynamic_slice(panel, (off, 0), (B, B))       # (B, B)
        L11, dblk = _unblocked_ldl(diag)
        L11inv = _unit_lower_inv(L11)

        below = (ridx >= off + B)[:, None]
        A21 = jnp.where(below, panel, 0.0)
        # K21 = L21 D L11'  =>  L21 = K21 L11^-T D^-1
        L21 = (A21 @ L11inv.T) / dblk[None, :]

        Lpanel = L21 + lax.dynamic_update_slice(
            jnp.zeros((D, B), dtype), L11, (off, 0))
        # trailing update: M -= (L21 * d) L21'   (only touches below-right)
        M = M - (L21 * dblk[None, :]) @ L21.T

        L = lax.dynamic_update_slice(L, Lpanel, (0, off))
        dvec = lax.dynamic_update_slice(dvec, dblk, (off,))
        Linvs = Linvs.at[k].set(L11inv)
        return M, L, dvec, Linvs

    init = (
        K,
        jnp.zeros((D, D), dtype),
        jnp.zeros((D,), dtype),
        jnp.zeros((nb, B, B), dtype),
    )
    _, L, dvec, Linvs = lax.fori_loop(0, nb, body, init)
    return LDLFactors(L=L, d=dvec, Linv=Linvs)


def ldl_solve(fac: LDLFactors, rhs):
    """Solve K x = rhs for padded RHS of shape (D,) or (D, k).

    Multi-RHS turns both triangular sweeps into (D, B) @ (B, k) matmuls —
    one compiled program serves every solve in an IPM iteration."""
    with jax.default_matmul_precision("highest"):
        return _ldl_solve_impl(fac, rhs)


def _ldl_solve_impl(fac: LDLFactors, rhs):
    L, dvec, Linvs, B = fac.L, fac.d, fac.Linv, fac.block
    D = L.shape[-1]
    nb = D // B
    ridx = np.arange(D)
    single = rhs.ndim == 1
    x0 = rhs[:, None] if single else rhs
    k_rhs = x0.shape[1]

    def fwd(k, x):
        off = k * B
        xb = lax.dynamic_slice(x, (off, 0), (B, k_rhs))
        xb = Linvs[k] @ xb
        x = lax.dynamic_update_slice(x, xb, (off, 0))
        panel = lax.dynamic_slice(L, (0, off), (D, B))
        below = (ridx >= off + B)[:, None]
        return x - jnp.where(below, panel, 0.0) @ xb

    x = lax.fori_loop(0, nb, fwd, x0)
    x = x / dvec[:, None]

    def bwd(i, x):
        k = nb - 1 - i
        off = k * B
        panel = lax.dynamic_slice(L, (0, off), (D, B))
        below = (ridx >= off + B)[:, None]
        contrib = jnp.where(below, panel, 0.0).T @ x
        xb = lax.dynamic_slice(x, (off, 0), (B, k_rhs))
        xb = Linvs[k].T @ (xb - contrib)
        return lax.dynamic_update_slice(x, xb, (off, 0))

    x = lax.fori_loop(0, nb, bwd, x)
    return x[:, 0] if single else x
