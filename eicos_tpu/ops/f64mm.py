"""Float64-accurate matmul on the TPU MXU via Ozaki mantissa slicing.

TPU v5e has no native float64 ALU.  XLA's own f64 dot emulation lowers
to a CHUNKED WHILE LOOP whose per-iteration runtime overhead (~65us,
measured) dwarfs the math for the skinny residual/elimination matvecs of
iterative refinement — profiled as the dominant per-iteration cost of
the whole IPM once the factorization moved into Pallas kernels.  This
module replaces those f64 dots with straight-line bf16 MXU passes:

each f64 operand is decomposed into S narrow-mantissa slices, all
pairwise slice products run as *exact* bf16->f32 MXU matmuls, and the
scaled partials sum in f64.

Exactness argument (per product pass): with slice width w bits and
contraction length k, every term of slice-product s,t is an integer
multiple of 2^(e_s + e_t - 2w) with magnitude < 2^(e_s + e_t), so the f32
accumulator (24-bit significand) is exact as long as

    2*w + ceil(log2(k)) <= 24.

With w = 6 and k <= 4096 this holds.  S = ceil(53 / w) = 9 slices cover
the full f64 mantissa; dropping cross terms with s + t >= S leaves a
relative error ~2^-54 per operand pair — genuinely float64-quality.

The hot-path consumer (kkt.solve_refined / solve_exact) uses the
PRE-SLICED form: the big constant operand (G, A and their transposes)
is sliced ONCE per solve — the slices are while-loop invariants that
XLA hoists — and each residual matvec becomes 45 small bf16 dots with
no while loop at all.  The in-kernel double-single analogue (8-bit
chunks, f32 pairs) lives in ops/pallas_band_ds.ds_matmul.
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


class SlicedOperand:
    """A constant right-hand matmul operand, pre-sliced for repeated
    float64-quality products ``a @ b`` (contraction over b's first axis).

    Built once per solve from loop-invariant data; each use costs only
    the slicing of the small dynamic operand plus 45 bf16 MXU dots.
    """

    def __init__(self, b):
        assert b.ndim == 2, b.shape
        self.k, self.n = b.shape
        # exactness needs contraction <= _K_MAX per pass: partition the
        # contraction axis into groups and sum the group products in f64
        self.bounds = [(s, min(s + _K_MAX, self.k))
                       for s in range(0, max(self.k, 1), _K_MAX)]
        self.groups = []
        for lo, hi in self.bounds:
            sl, scale = _slices(b[lo:hi], axis=-2)
            self.groups.append(
                ([x.astype(jnp.bfloat16) for x in sl], scale))

    def rmatmul(self, a):
        """a @ b for a: (..., m, k) float64."""
        out = None
        for (lo, hi), (b16, b_scale) in zip(self.bounds, self.groups):
            ag = a[..., lo:hi]
            a_sl, a_scale = _slices(ag, axis=-1)
            a16 = [x.astype(jnp.bfloat16) for x in a_sl]
            grp = None
            for s in range(S):
                for t in range(S - s):
                    p = jax.lax.dot_general(
                        a16[s], b16[t],
                        dimension_numbers=(((a.ndim - 1,), (0,)),
                                           ((), ())),
                        preferred_element_type=jnp.float32,
                    )
                    term = p.astype(jnp.float64) * (2.0 ** (-W * (s + t)))
                    grp = term if grp is None else grp + term
            # b_scale is (1, n); flatten so 1-D matvecs stay 1-D
            grp = grp * a_scale * b_scale.reshape(-1)
            out = grp if out is None else out + grp
        return out
