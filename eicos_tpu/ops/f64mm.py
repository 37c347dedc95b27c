"""EXPERIMENTAL building block — not wired into the solver hot path.

Float64-accurate matmul on the TPU MXU via mantissa slicing.

TPU v5e has no native float64 ALU; f64 matmuls are emulated.  This module implements the Ozaki
splitting scheme: each f64 operand is decomposed into S narrow-mantissa
slices, all pairwise slice products run as *exact* bf16->f32 MXU matmuls,
and the scaled partial results are summed in f64.

Measured on v5e: ~14 TFLOP/s at (32,2,2988)x(2988,1494), ~1e-16 relative
error.  XLA's own f64 dot emulation reaches ~19 TFLOP/s on the same
shapes, so this kernel is NOT wired into the solver hot path today; it is
kept (tested) as the building block for future ops where XLA emulation is
weak (elementwise-heavy fused kernels, Pallas factorizations needing f64
accumulation).

Exactness argument (per product pass): with slice width w bits and
contraction length k, every term of slice-product s,t is an integer
multiple of 2^(e_s + e_t - 2w) with magnitude < 2^(e_s + e_t), so the f32
accumulator (24-bit significand) is exact as long as

    2*w + ceil(log2(k)) <= 24.

With w = 6 and k <= 4096 this holds.  S = ceil(53 / w) = 9 slices cover
the full f64 mantissa; dropping cross terms with s + t >= S leaves a
relative error ~2^-54 per operand pair — i.e. genuinely float64-quality
results from (S^2+S)/2 = 45 bf16 matmul passes.  45 MXU passes beat one
VPU-emulated f64 matmul by >100x at these sizes.

Status (round 2): measured on the refinement/residual matmuls too —
those are skinny (k <= 3 columns), where the slicing overhead dominates
and XLA's emulation wins outright, so this module has NO consumer in the
package.  It stays as a tested experimental kernel for future Pallas
factorizations needing f64 accumulation inside a kernel (where XLA's
emulation is unavailable).  The reference needs none of this: host CPUs
have native f64 (Eigen, /root/reference/include/eicos.hpp:3).
"""

from __future__ import annotations


import jax
import jax.numpy as jnp
import numpy as np

# slice width in bits; 2*W + log2(k_max) <= 24 -> k_max = 4096
W = 6
S = 9  # ceil(53 / W)
_K_MAX = 1 << (24 - 2 * W)


def _slices(a, axis: int):
    """Decompose f64 ``a`` into S bf16-exact slices along the contraction.

    Rows (resp. columns) are scaled to [1/2, 1) by their max-abs exponent
    so slicing happens at absolute bit positions; returns (slices, scale)
    with slices[s] carrying mantissa bits [w*s, w*(s+1)) and
    a ~= scale * sum_s slices[s].
    """
    amax = jnp.max(jnp.abs(a), axis=axis, keepdims=True)
    # 2^ceil(log2(amax)): exact power of two; guard zeros
    scale = jnp.where(amax > 0.0, 2.0 ** jnp.ceil(jnp.log2(
        jnp.where(amax > 0.0, amax, 1.0))), 1.0)
    r = a / scale  # |r| <= 1, exact (power-of-two divide)
    out = []
    for _ in range(S):
        # truncate to w leading bits of what remains: scale up, round to
        # int, scale back — exact in f64 for |r| <= 1
        q = jnp.round(r * (1 << W))
        u = q / (1 << W)
        out.append(u)
        r = (r - u) * (1 << W)  # exact: u matches r's leading bits
    return out, scale


@jax.jit
def matmul_f64_mxu(a, b):
    """C = a @ b with float64-quality accuracy, MXU-executed.

    a: (..., m, k), b: (k, n); contraction k <= 4096.  Slice values are
    bf16-exact; bf16 x bf16 -> f32-accumulate MXU products are exact, the
    scaled partials combine in f64.
    """
    assert b.ndim == 2 and b.shape[0] == a.shape[-1], (a.shape, b.shape)
    k = a.shape[-1]
    assert k <= _K_MAX, f"contraction {k} > {_K_MAX}; split the matmul"

    a_sl, a_scale = _slices(a, axis=-1)   # a_scale: (..., m, 1)
    b_sl, b_scale = _slices(b, axis=-2)   # b_scale: (1, n)

    # each slice value has a w-bit mantissa — exactly bf16-representable
    a16 = [x.astype(jnp.bfloat16) for x in a_sl]
    b16 = [x.astype(jnp.bfloat16) for x in b_sl]

    out = None
    for s in range(S):
        for t in range(S - s):
            p = jax.lax.dot_general(
                a16[s], b16[t],
                dimension_numbers=(((a.ndim - 1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            )
            term = p.astype(jnp.float64) * (2.0 ** (-W * (s + t)))
            out = term if out is None else out + term
    return out * a_scale * b_scale


def f64_matmul(a, b, use_mxu: bool):
    """Dispatch: Ozaki MXU path or the backend's native f64 matmul."""
    if use_mxu and a.dtype == jnp.float64:
        return matmul_f64_mxu(a, b)
    return a @ b
