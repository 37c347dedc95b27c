"""Probe: 8 x 7-bit bf16 chunks, ONE MXU dot per level, vs production.

The production ds_matmul (ops/pallas_band_ds) uses 7 x 8-bit bf16
chunks; 8-bit ints reach 256, so an exact f32 accumulation can only
concatenate PAIRS of 128-term partials (2 * 128 * 2^16 <= 2^24) —
~17 dots + 16 TwoSum folds per product.  On 7-bit grids the ints stay
<= 128 (with the lo-fold bump <= 72 beyond chunk 0), so a whole LEVEL
(all s + t = lvl partials, up to 8 x 256 terms) accumulates exactly in
one f32 MXU dot: 9 dots + 8 folds.  The dots at solve shapes are
latency-bound, not MXU-volume-bound (measured: int8 at 2x MXU rate was
NOT 2x faster), so fewer/bigger dots should win.

Accuracy notes vs the 8-bit scheme:
  * lo fold at k=3 via TwoSum; the fold error (~2^-47 of scale) is
    re-folded at k=6 where the grid can still capture it -> overall
    tail ~2^-57, slightly BETTER than production's ~2^-49 fold loss.
  * exactness: worst-case level-7 integer sum at K=256 is ~2^23.4 < 2^24.

Run on TPU:  python tools/c7_probe.py
CPU check:   python tools/c7_probe.py --interpret
"""

import argparse
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

NC7 = 8
BITS7 = 7
NLVL7 = 9

_LVL7 = tuple(
    tuple((s, lvl - s) for s in range(min(NC7, lvl + 1)) if lvl - s < NC7)
    for lvl in range(NLVL7))


def chunks_c7(xh, xl, axis):
    """(hi, lo) f32 -> (chunks[8] bf16 on 7-bit grids, scale)."""
    m = jnp.max(jnp.abs(xh), axis=axis, keepdims=True)
    s = _pow2_above(m)
    r = xh / s
    rl = xl / s
    err = None
    chunks = []
    for k in range(NC7):
        if k == 3:                      # fold lo; capture the add error
            r, err = _two_sum(r, rl)
        if k == 6:                      # refold the error where grid fits
            r = r + err
        up = jnp.float32(2.0 ** (BITS7 * (k + 1)))
        c = jnp.round(r * up) / up
        r = r - c
        chunks.append(c.astype(jnp.bfloat16))
    return chunks, s


def matmul_c7(ah, al, bh, bl):
    a, sa = chunks_c7(ah, al, axis=1)
    b, sb = chunks_c7(bh, bl, axis=0)
    sh = sl = None
    for pairs in _LVL7:
        if len(pairs) == 1:
            A, Bc = a[pairs[0][0]], b[pairs[0][1]]
        else:
            A = jnp.concatenate([a[s] for s, _ in pairs], axis=1)
            Bc = jnp.concatenate([b[t] for _, t in pairs], axis=0)
        p = lax.dot_general(A, Bc, (((1,), (0,)), ((), ())),
                            precision=lax.Precision.DEFAULT,
                            preferred_element_type=jnp.float32)
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


def kern_c7(ah_ref, al_ref, bh_ref, bl_ref, oh_ref, ol_ref):
    oh, ol = matmul_c7(ah_ref[...], al_ref[...], bh_ref[...], bl_ref[...])
    oh_ref[...] = oh
    ol_ref[...] = ol


def kern_bf16(ah_ref, al_ref, bh_ref, bl_ref, oh_ref, ol_ref):
    oh, ol = ds_matmul(ah_ref[...], al_ref[...], bh_ref[...], bl_ref[...])
    oh_ref[...] = oh
    ol_ref[...] = ol


def run_case(M, K, N, interpret, reps=128):
    rng = np.random.default_rng(0)
    a64 = rng.standard_normal((M, K)) * 10.0 ** rng.uniform(-8, 8, (M, 1))
    b64 = rng.standard_normal((K, N)) * 10.0 ** rng.uniform(-8, 8, (1, N))
    ref = a64 @ b64
    ah, al = _split64(jnp.asarray(a64))
    bh, bl = _split64(jnp.asarray(b64))

    out = {}
    with jax.enable_x64(False):
        for name, kern in (("c7", kern_c7), ("bf16", kern_bf16)):
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
                def many(ah, al, bh, bl, f=f):
                    def step(c, _):
                        oh, ol = f(c[0], c[1], bh, bl)
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
    for (M, K, N) in ((16, 128, 128), (128, 128, 128), (256, 128, 128),
                      (16, 256, 128)):
        r = run_case(M, K, N, args.interpret)
        print(f"({M},{K},{N}):", {k: (f"{v:.3e}" if "us" not in k
                                      else f"{v:.1f}us")
                                  for k, v in r.items()})


if __name__ == "__main__":
    main()
