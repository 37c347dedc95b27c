"""Pallas TPU kernel: batched LDL^T + unit-lower inverse of 128x128 blocks.

The recursive blocked factorization (ops/ldl.py) bottoms out in 128x128
diagonal leaves factored by a 128-step sequential rank-1 loop.  As plain
XLA ops under vmap that is 128 dispatches of ~microseconds of VPU work —
latency-bound.  This kernel runs the whole loop in VMEM in one launch per
(leaf, lane-tile) and finishes with the Newton-Schulz inverse on the MXU,
so the leaf cost drops from ~milliseconds to ~tens of microseconds.

float32 only (TPU Pallas has no f64); the f64 path keeps the pure-JAX
leaf.  Selection happens in ops/ldl.py at trace time.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax

try:  # Pallas is TPU-only at runtime; import is safe everywhere
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu
    _HAS_PALLAS = True
except Exception:  # pragma: no cover
    _HAS_PALLAS = False

import sys

# Mosaic's jaxpr lowering recurses per equation; the 128-step unrolled
# scalar work inside this kernel exceeds CPython's default limit.
sys.setrecursionlimit(max(sys.getrecursionlimit(), 100_000))

B = 128  # leaf block size == MXU tile


def _fori32(n, body, init):
    """fori_loop with an int32 induction variable.

    Under jax_enable_x64, lax.fori_loop/scan carry an int64 counter, and
    this Mosaic version cannot lower int64 (its dtype-convert helper
    recurses without terminating).  A while_loop with an explicit int32
    counter sidesteps 64-bit entirely."""
    def cond(c):
        return c[0] < np.int32(n)

    def wbody(c):
        j, state = c
        return j + np.int32(1), body(j, state)

    return lax.while_loop(cond, wbody, (np.int32(0), init))[1]


def _leaf_kernel_full(m_ref, linv_ref, d_ref):
    """One (B, B) symmetric block -> unit-lower inverse + pivots.

    TPU-friendly formulation: no dynamic lane gathers (column j is
    extracted by a masked reduction over lanes), everything stays 2D.
    """
    M0 = m_ref[0]
    row = jax.lax.broadcasted_iota(jnp.int32, (B, B), 0)
    col = jax.lax.broadcasted_iota(jnp.int32, (B, B), 1)
    rowv = jax.lax.broadcasted_iota(jnp.int32, (B, 1), 0)
    colv = jax.lax.broadcasted_iota(jnp.int32, (1, B), 1)
    eye = (row == col).astype(M0.dtype)

    def body(j, carry):
        M, L, d = carry
        cmask = col == j
        colj = jnp.sum(jnp.where(cmask, M, 0.0), axis=1,
                       keepdims=True)                       # (B, 1)
        dj = jnp.sum(jnp.where((row == j) & cmask, M, 0.0))  # scalar
        l = jnp.where(rowv > j, colj / dj, 0.0)              # (B, 1)
        M = M - dj * (l * l.reshape(1, B))
        L = jnp.where(cmask, l, L)
        d = jnp.where(colv == j, dj, d)
        return M, L, d

    _, Lstrict, d = _fori32(
        B, lambda j, c: body(j, c),
        (M0, jnp.zeros((B, B), M0.dtype), jnp.zeros((1, B), M0.dtype)))
    L = Lstrict + eye

    # Newton-Schulz doubling: exact unit-triangular inverse in ceil(log2 B)
    eye2 = 2.0 * eye
    X = eye2 - L

    def ns(_, X):
        LX = jnp.dot(L, X, preferred_element_type=jnp.float32)
        return jnp.dot(X, eye2 - LX, preferred_element_type=jnp.float32)

    X = _fori32(int(np.ceil(np.log2(B))), ns, X)
    linv_ref[0] = X
    d_ref[...] = d


@functools.partial(jax.jit, static_argnames=("interpret",))
def leaf_ldl_pallas(Ms, interpret: bool = False):
    """Batched leaf factorization: (nb, B, B) f32 -> (Linv, d).

    One Pallas program per leaf; inside, the full 128-step elimination and
    the MXU inverse run without leaving VMEM.  ``interpret=True`` runs the
    kernel through the Pallas interpreter (CPU testing).
    """
    nb = Ms.shape[0]
    assert Ms.shape[1:] == (B, B) and Ms.dtype == jnp.float32

    # pallas_call's grid/pipeline machinery mints int64 counters under
    # jax_enable_x64, which Mosaic cannot lower; the kernel itself is
    # 32-bit-clean, so build the call with x64 off.
    with jax.enable_x64(False):
        return _pallas_call(nb, interpret)(Ms)


def _pallas_call(nb, interpret=False):
    return pl.pallas_call(
        _leaf_kernel_full,
        grid=(nb,),
        in_specs=[pl.BlockSpec((1, B, B), lambda i: (i, 0, 0),
                               memory_space=pltpu.VMEM)],
        out_specs=(
            pl.BlockSpec((1, B, B), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, B), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
        ),
        out_shape=(
            jax.ShapeDtypeStruct((nb, B, B), jnp.float32),
            jax.ShapeDtypeStruct((nb, B), jnp.float32),
        ),
        interpret=interpret,
    )


def pallas_available() -> bool:
    if not _HAS_PALLAS:
        return False
    from .backend import tpu_kernels_on

    return tpu_kernels_on()
