"""Pallas TPU kernel: double-single (two-float) LDL^T of 128x128 leaves.

Why this exists: the recursive blocked factorization (ops/ldl.py) bottoms
out in 128-step sequential rank-1 eliminations.  At float64 those run as
plain XLA ops — ~2048 microscopic latency-bound dispatches per
factorization (measured: they dominate the whole IPM iteration, see
CLAUDE.md perf notes).  TPU Pallas has no float64, so the float32 leaf
kernel (ops/pallas_leaf.py) cannot serve the float64 path: eps32 * cond
at the interior-point endgame (mu -> 1e-8, cone scalings ~ 1/mu) kills
iterative refinement (measured: NaN at mu ~ 1e-4 on the MPC bench
family).

This kernel runs the SAME elimination loop in VMEM using double-single
arithmetic — every number carried as an (hi, lo) pair of float32 with
Dekker/Knuth error-free transformations — giving ~2^-48 relative
precision, a hair under float64's 2^-53 but far beyond the 2^-24 that
fails.  Outside the kernel, the float64 path combines hi+lo exactly and
(in ops/ldl.py) polishes the unit-lower inverse with one float64
Newton-Schulz step, after which float64 iterative refinement against the
exact KKT operator (kkt.solve_refined) behaves as if the factor were
float64.  One kernel launch replaces ~128 x ~8 XLA ops per leaf.

TwoProd uses Veltkamp splitting (split constant 2^12 + 1 for float32's
24-bit mantissa) rather than FMA — Mosaic does not expose a fused
multiply-add primitive.

Reference role: this is the numeric core of the Eigen-SimplicialLDLT
replacement (/root/reference/include/eicos.hpp:221-222) on the float64
path.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax

try:  # pragma: no cover - import is safe everywhere
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu
    _HAS_PALLAS = True
except Exception:  # pragma: no cover
    _HAS_PALLAS = False

import sys

sys.setrecursionlimit(max(sys.getrecursionlimit(), 100_000))

B = 128
_SPLIT = np.float32(4097.0)  # 2^12 + 1 (Veltkamp split for 24-bit mantissa)


# ---- double-single primitives (element-wise, shape-polymorphic) ----
def _two_sum(a, b):
    s = a + b
    bb = s - a
    err = (a - (s - bb)) + (b - bb)
    return s, err


def _split(a):
    c = _SPLIT * a
    hi = c - (c - a)
    return hi, a - hi


def _two_prod(a, b):
    p = a * b
    ah, al = _split(a)
    bh, bl = _split(b)
    err = ((ah * bh - p) + ah * bl + al * bh) + al * bl
    return p, err


def _quick_renorm(h, l):
    s = h + l
    return s, l - (s - h)


def ds_add(xh, xl, yh, yl):
    # accurate add22 (Dekker): TwoSum on both components — the sloppy
    # variant (se += xl + yl) loses bits exactly in the heavy-
    # cancellation Schur updates where the factor needs them most
    sh, se = _two_sum(xh, yh)
    tl, te = _two_sum(xl, yl)
    se = se + tl
    sh, se = _quick_renorm(sh, se)
    se = se + te
    return _quick_renorm(sh, se)


def ds_mul(xh, xl, yh, yl):
    ph, pe = _two_prod(xh, yh)
    pe = pe + (xh * yl + xl * yh)
    return _quick_renorm(ph, pe)


def ds_outer(ah, al, bh, bl):
    """Double-single product of BROADCAST factors (e.g. a (B,1) column
    times a (1,B) row): Veltkamp splits and cross terms are computed at
    the small operand shapes — only the final products and merges touch
    the broadcast shape.  ~8 fewer full-size ops than ds_mul on the
    broadcasted inputs."""
    p = ah * bh
    ahh, ahl = _split(ah)
    bhh, bhl = _split(bh)
    err = ((ahh * bhh - p) + ahh * bhl + ahl * bhh) + ahl * bhl
    err = err + (ah * bl + al * bh)
    return _quick_renorm(p, err)


def ds_div(xh, xl, yh, yl):
    q1 = xh / yh
    # r = x - q1*y, computed in double-single
    th, tl = ds_mul(q1, jnp.zeros_like(q1), yh, yl)
    rh, rl = ds_add(xh, xl, -th, -tl)
    q2 = (rh + rl) / yh
    return _quick_renorm(q1, q2)


# --------------------------------------------------------------- kernel
def _fori32(n, body, init):
    """32-bit-clean fori_loop (Mosaic cannot lower int64 counters)."""
    def cond(c):
        return c[0] < np.int32(n)

    def wbody(c):
        j, state = c
        return j + np.int32(1), body(j, state)

    return lax.while_loop(cond, wbody, (np.int32(0), init))[1]


def _leaf_kernel_ds_blocked(mh_ref, ml_ref, dh_ref, dl_ref,
                            xh_ref, xl_ref):
    """Blocked-panel variant: 16-column panels + small-K chunked MXU
    trailing updates (ops/pallas_band_ds._leaf_eliminate_blocked) —
    measured ~2.3x the plain rank-1 loop; L itself is not produced
    (no caller uses it)."""
    # deferred import: pallas_band_ds imports this module at init
    from .pallas_band_ds import _leaf_eliminate_blocked

    (dh, dl), (Xh, Xl) = _leaf_eliminate_blocked(mh_ref[0], ml_ref[0])
    dh_ref[0] = jnp.broadcast_to(dh, (8, B))
    dl_ref[0] = jnp.broadcast_to(dl, (8, B))
    xh_ref[0] = Xh
    xl_ref[0] = Xl


@functools.partial(jax.jit, static_argnames=("interpret",))
def leaf_ldl_pallas_ds(Ms, interpret: bool = False):
    """Batched double-single leaf factorization.

    ``Ms``: (nb, B, B) float64 symmetric blocks.  Returns
    ``(L, d, Linv)`` — pivots d and the unit-lower inverse L^{-1} in
    float64 (combined hi+lo); the L slot is None (the blocked-panel
    kernel does not materialize it and no caller uses it).
    """
    nb = Ms.shape[0]
    assert Ms.shape[1:] == (B, B) and Ms.dtype == jnp.float64, (
        Ms.shape, Ms.dtype)
    hi = Ms.astype(jnp.float32)
    lo = (Ms - hi.astype(jnp.float64)).astype(jnp.float32)

    with jax.enable_x64(False):
        dh, dl, Xh, Xl = _pallas_call_ds(nb, interpret)(hi, lo)
    d = dh[:, 0].astype(jnp.float64) + dl[:, 0].astype(jnp.float64)
    Linv = Xh.astype(jnp.float64) + Xl.astype(jnp.float64)
    return None, d, Linv


def _pallas_call_ds(nb, interpret=False):
    spec_bb = pl.BlockSpec((1, B, B), lambda i: (i, 0, 0),
                           memory_space=pltpu.VMEM)
    spec_1b = pl.BlockSpec((1, 8, B), lambda i: (i, 0, 0),
                           memory_space=pltpu.VMEM)
    return pl.pallas_call(
        _leaf_kernel_ds_blocked,
        grid=(nb,),
        in_specs=[spec_bb, spec_bb],
        out_specs=(spec_1b, spec_1b, spec_bb, spec_bb),
        out_shape=(
            jax.ShapeDtypeStruct((nb, 8, B), jnp.float32),
            jax.ShapeDtypeStruct((nb, 8, B), jnp.float32),
            jax.ShapeDtypeStruct((nb, B, B), jnp.float32),
            jax.ShapeDtypeStruct((nb, B, B), jnp.float32),
        ),
        interpret=interpret,
    )


# ------------------- lane-tiled leaf (the solver's vmap path) ----------
# The dense-LDL recursion calls the leaf once per 128-block; under the
# solver's lane vmap the (nb=1) kernel replays per lane with (P, B)
# panel ops that are ISSUE-bound (2 vregs each) — the same saturation
# wall the band factor hit before its lane tiling.  T_LEAF lanes per
# grid program widen every panel op to a (T, P, B) slab; arithmetic is
# identical per lane (_leaf_eliminate_blocked_b is the same code the
# single-lane kernel runs at T = 1), so outputs are bit-identical.

T_LEAF = 16


def _make_leaf_tiled(T: int):
    def kern(mh_ref, ml_ref, dh_ref, dl_ref, xh_ref, xl_ref):
        from .pallas_band_ds import _leaf_eliminate_blocked_b

        (dh, dl), (Xh, Xl) = _leaf_eliminate_blocked_b(mh_ref[...],
                                                       ml_ref[...])
        dh_ref[...] = jnp.broadcast_to(dh, (T, 8, B))
        dl_ref[...] = jnp.broadcast_to(dl, (T, 8, B))
        xh_ref[...] = Xh
        xl_ref[...] = Xl

    return kern


@functools.partial(jax.jit, static_argnames=("T", "interpret"))
def _leaf_ds_batch(Ms, T: int | None = None, interpret: bool = False):
    """(L, B, B) float64 leaves -> (Linv (L, B, B), d (L, B)) float64,
    T lanes per grid program.  T adapts to the lane count (padding a
    1-lane call to T_LEAF = 16 would run 16x the leaf work); lanes pad
    to a multiple of T with identity blocks (finite pivots)."""
    L = Ms.shape[0]
    if T is None:
        T = max(t for t in (1, 2, 4, 8, T_LEAF) if t <= L)
    assert Ms.shape[1:] == (B, B) and Ms.dtype == jnp.float64, Ms.shape
    Lp = -(-L // T) * T
    if Lp != L:
        eye = jnp.broadcast_to(jnp.eye(B, dtype=Ms.dtype),
                               (Lp - L, B, B))
        Ms = jnp.concatenate([Ms, eye], axis=0)
    hi = Ms.astype(jnp.float32)
    lo = (Ms - hi.astype(jnp.float64)).astype(jnp.float32)
    spec_bb = pl.BlockSpec((T, B, B), lambda t: (t, 0, 0),
                           memory_space=pltpu.VMEM)
    spec_d = pl.BlockSpec((T, 8, B), lambda t: (t, 0, 0),
                          memory_space=pltpu.VMEM)
    with jax.enable_x64(False):
        dh, dl, Xh, Xl = pl.pallas_call(
            _make_leaf_tiled(T),
            grid=(Lp // T,),
            in_specs=[spec_bb, spec_bb],
            out_specs=(spec_d, spec_d, spec_bb, spec_bb),
            out_shape=(
                jax.ShapeDtypeStruct((Lp, 8, B), jnp.float32),
                jax.ShapeDtypeStruct((Lp, 8, B), jnp.float32),
                jax.ShapeDtypeStruct((Lp, B, B), jnp.float32),
                jax.ShapeDtypeStruct((Lp, B, B), jnp.float32),
            ),
            compiler_params=pltpu.CompilerParams(
                # the T-wide leaf temporaries exceed the 16 MB default
                # scoped budget (the chip has 128 MB)
                vmem_limit_bytes=100 * 2 ** 20),
            interpret=interpret,
        )(hi, lo)
    d = dh[:L, 0].astype(jnp.float64) + dl[:L, 0].astype(jnp.float64)
    Linv = Xh[:L].astype(jnp.float64) + Xl[:L].astype(jnp.float64)
    return Linv, d


try:  # pragma: no cover - custom_batching present in all supported jax
    from jax import custom_batching as _cbl

    @_cbl.custom_vmap
    def leaf_ldl_ds_one(K):
        """(B, B) float64 leaf -> (Linv, d) float64 via the fused
        double-single kernel.  Under the solver's lane vmap the batch
        collapses into the lane-tiled kernel (T_LEAF lanes per grid
        program) instead of replaying per lane."""
        _, d, Linv = leaf_ldl_pallas_ds(K[None])
        return Linv[0], d[0]

    @leaf_ldl_ds_one.def_vmap
    def _leaf_one_vmap(axis_size, in_batched, Ks):
        if in_batched[0] and Ks.ndim == 3:
            out = _leaf_ds_batch(Ks)
        else:
            out = jax.vmap(
                lambda K: leaf_ldl_pallas_ds(K[None])[1:])(Ks)
            out = (out[1], out[0])
        return out, (True, True)
except Exception:  # pragma: no cover
    def leaf_ldl_ds_one(K):
        _, d, Linv = leaf_ldl_pallas_ds(K[None])
        return Linv[0], d[0]


def pallas_ds_available() -> bool:
    if not _HAS_PALLAS:
        return False
    from .backend import tpu_kernels_on

    return tpu_kernels_on()
