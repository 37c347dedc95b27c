"""Probe: int8-chunk double-single GEMM vs the bf16-chunk ds_matmul.

The production chunk scheme (ops/pallas_band_ds.ds_matmul) slices the
(hi, lo) f32 operands into 7 grid-aligned 8-bit bf16 chunks and runs
~17 bf16 MXU dots per product.  v5e's MXU runs int8 x int8 -> int32 at
2x the bf16 rate, int32 accumulation is exact with huge margin, and
int8 chunks store in HALF the bytes — so an int8 variant promises wins
on all three axes the solve kernels are bound by (HBM stream, MXU
issue, TwoSum folds):

  * 8 chunks x 7 bits (= 56 mantissa bits, same coverage as 7 x 8):
    with round-to-nearest each residual |r| <= 0.5 * grid, so the chunk
    integers lie in [-64, 64] — comfortably int8.
  * per LEVEL (s + t = lvl), every partial shares the grid
    2^-7(lvl+2), and int32 accumulation is exact regardless of how
    many partials concatenate: ONE dot per level (9 dots total for
    levels <= 8, dropped tail ~2^-63) replaces the bf16 scheme's ~17.
  * the int32 level sums convert to f32 exactly when below 2^24:
    bound per level = (#partials) * K * 64 * 64; at K = 128 that is
    #partials * 2^19 <= 8 * 2^19 = 2^22.  Always exact.

This probe validates accuracy (vs exact f64 via numpy) and measures
hardware time at solve-kernel shapes.  Run on TPU:
  python tools/i8_chunk_probe.py            # accuracy + timing
  python tools/i8_chunk_probe.py --interpret  # CPU accuracy only
"""

import argparse
import functools
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

import jax
import jax.numpy as jnp

jax.config.update("jax_enable_x64", True)

from jax import lax
from jax.experimental import pallas as pl

from eicos_tpu.ops.pallas_band_ds import (
    _pow2_above, _two_sum, _quick_renorm, ds_matmul)

NC8 = 8          # 8 chunks x 7 bits = 56 mantissa bits
BITS = 7
NLVL8 = 9        # levels s+t <= 8; dropped tail ~2^-7*9 = 2^-63


def chunks_i8(xh, xl, axis):
    """(hi, lo) f32 -> (chunks[NC8] int8, scale) along ``axis``.

    Same grid-snap construction as _chunks_scaled but 7-bit steps and
    integer (int8) storage: chunk k holds round(r * 2^(7(k+1))) with
    |int| <= 64 by the round-to-nearest residual bound.  The scale is
    DOUBLED vs _chunks_scaled so |r| < 0.5 and chunk 0 also obeys the
    64 bound — at s = pow2_above(m) alone, r in [0.5, 1) rounds chunk 0
    to up to 128, which WRAPS in int8 (the first probe run measured
    3e-4 rel error from exactly this)."""
    m = jnp.max(jnp.abs(xh), axis=axis, keepdims=True)
    s = 2.0 * _pow2_above(m)
    r = xh / s
    rl = xl / s
    chunks = []
    for k in range(NC8):
        if k == 4:          # fold lo in once r is ~2^-28 < 2^-24
            r = r + rl
        up = jnp.float32(2.0 ** (BITS * (k + 1)))
        ci = jnp.round(r * up)              # integer valued f32, <= 64
        chunks.append(ci.astype(jnp.int8))
        r = r - ci / up                     # exact
    return chunks, s


_LVL_I8 = tuple(
    tuple((s, lvl - s) for s in range(min(NC8, lvl + 1)) if lvl - s < NC8)
    for lvl in range(NLVL8))


def matmul_i8(ah, al, bh, bl):
    """Double-single a @ b via int8 chunk dots: ONE int32 dot per level."""
    a, sa = chunks_i8(ah, al, axis=1)       # sa: (M, 1)
    b, sb = chunks_i8(bh, bl, axis=0)       # sb: (1, N)
    sh = sl = None
    for lvl, pairs in enumerate(_LVL_I8):
        A = jnp.concatenate([a[s] for s, _ in pairs], axis=1)
        Bc = jnp.concatenate([b[t] for _, t in pairs], axis=0)
        p32 = lax.dot_general(A, Bc, (((1,), (0,)), ((), ())),
                              preferred_element_type=jnp.int32)
        p = p32.astype(jnp.float32) * jnp.float32(
            2.0 ** (-BITS * (lvl + 2)))
        if sh is None:
            sh, sl = p, jnp.zeros_like(p)
        else:
            sh, e = _two_sum(sh, p)
            sl = sl + e
    sh, sl = _quick_renorm(sh, sl)
    scale = sa * sb
    return sh * scale, sl * scale


def _split64(x):
    h = x.astype(jnp.float32)
    return h, (x - h.astype(jnp.float64)).astype(jnp.float32)


def kern_i8(ah_ref, al_ref, bh_ref, bl_ref, oh_ref, ol_ref):
    oh, ol = matmul_i8(ah_ref[...], al_ref[...], bh_ref[...], bl_ref[...])
    oh_ref[...] = oh
    ol_ref[...] = ol


def kern_bf16(ah_ref, al_ref, bh_ref, bl_ref, oh_ref, ol_ref):
    oh, ol = ds_matmul(ah_ref[...], al_ref[...], bh_ref[...], bl_ref[...])
    oh_ref[...] = oh
    ol_ref[...] = ol


def run_case(M, K, N, interpret, reps=64):
    rng = np.random.default_rng(0)
    # adversarial dynamic range similar to endgame NT scalings
    a64 = rng.standard_normal((M, K)) * 10.0 ** rng.uniform(-8, 8, (M, 1))
    b64 = rng.standard_normal((K, N)) * 10.0 ** rng.uniform(-8, 8, (1, N))
    ref = a64 @ b64
    ah, al = _split64(jnp.asarray(a64))
    bh, bl = _split64(jnp.asarray(b64))

    out = {}
    with jax.enable_x64(False):
        for name, kern in (("i8", kern_i8), ("bf16", kern_bf16)):
            f = pl.pallas_call(
                kern,
                out_shape=(jax.ShapeDtypeStruct((M, N), jnp.float32),) * 2,
                interpret=interpret)
            oh, ol = jax.jit(f)(ah, al, bh, bl)
            got = (np.asarray(oh, np.float64) + np.asarray(ol, np.float64))
            rel = np.abs(got - ref) / np.maximum(
                np.abs(a64) @ np.abs(b64), 1e-300)
            out[name] = float(rel.max())

            if not interpret:
                # amortized timing: R reps inside one jit
                def many(ah, al, bh, bl, f=f):
                    def step(c, _):
                        oh, ol = f(c[0], c[1], bh, bl)
                        # feed output back (prevents CSE) — renormalized
                        return (c[0], c[1]), (oh[0, 0], ol[0, 0])
                    _, o = lax.scan(step, (ah, al), None, length=reps)
                    return o

                g = jax.jit(many)
                r = g(ah, al, bh, bl)
                jax.block_until_ready(r)
                t0 = time.time()
                r = g(ah, al, bh, bl)
                float(jax.device_get(r[0][0]))
                dt = (time.time() - t0) / reps
                out[name + "_us"] = dt * 1e6
    return out


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--interpret", action="store_true")
    args = ap.parse_args()
    if args.interpret:
        jax.config.update("jax_platforms", "cpu")
    for (M, K, N) in ((16, 128, 128), (128, 128, 128), (256, 128, 128)):
        r = run_case(M, K, N, args.interpret)
        print(f"({M},{K},{N}):", {k: (f"{v:.3e}" if "us" not in k
                                      else f"{v:.1f}us")
                                  for k, v in r.items()})


if __name__ == "__main__":
    main()
