"""Isolate the (16,128,128) c7 pathology: concat vs dot shape vs layout.

tools/c7_probe.py measured the 7-bit one-dot-per-level scheme at
(M=16, K=128) running ~34x slower than production while (M=16, K=256)
and (M>=128, K=128) win.  Variants here separate the suspects:

  v_dot_wide   : one (16, 1024) x (1024, 128) bf16 dot, operands
                 pre-concatenated OUTSIDE the kernel (is the dot slow?)
  v_dot_narrow : 8 separate (16, 128) x (128, 128) dots + adds
                 (is the level-concat the problem?)
  v_concat     : in-kernel concat then one dot (the probe's form)
  v_m32        : same as v_concat but M padded to 32

Run on TPU: python tools/c7_shape_probe.py
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import jax
import jax.numpy as jnp
from jax import lax
from jax.experimental import pallas as pl

P = 8  # partials


def _time(f, args, reps=128):
    def many(*a):
        def step(c, _):
            o = f(*a)
            return c, o[0, 0]
        _, r = lax.scan(step, 0, None, length=reps)
        return r
    g = jax.jit(many)
    r = g(*args)
    jax.block_until_ready(r)
    t0 = time.time()
    r = g(*args)
    float(jax.device_get(r[0]))
    return (time.time() - t0) / reps * 1e6


def main():
    rng = np.random.default_rng(0)
    M, K, N = 16, 128, 128
    A = jnp.asarray(rng.standard_normal((P, M, K)), jnp.bfloat16)
    Bm = jnp.asarray(rng.standard_normal((P, K, N)), jnp.bfloat16)
    Aw = jnp.concatenate([A[i] for i in range(P)], axis=1)   # (M, P*K)
    Bw = jnp.concatenate([Bm[i] for i in range(P)], axis=0)  # (P*K, N)
    A32 = jnp.concatenate([A, A], axis=1)                    # (P, 32, K)

    dn = (((1,), (0,)), ((), ()))

    def dot(a, b):
        return lax.dot_general(a, b, dn,
                               precision=lax.Precision.DEFAULT,
                               preferred_element_type=jnp.float32)

    def k_wide(aw_ref, bw_ref, o_ref):
        o_ref[...] = dot(aw_ref[...], bw_ref[...])

    def k_narrow(a_ref, b_ref, o_ref):
        acc = dot(a_ref[0], b_ref[0])
        for i in range(1, P):
            acc = acc + dot(a_ref[i], b_ref[i])
        o_ref[...] = acc

    def k_concat(a_ref, b_ref, o_ref):
        aw = jnp.concatenate([a_ref[i] for i in range(P)], axis=1)
        bw = jnp.concatenate([b_ref[i] for i in range(P)], axis=0)
        o_ref[...] = dot(aw, bw)

    def k_m32(a_ref, b_ref, o_ref):
        aw = jnp.concatenate([a_ref[i] for i in range(P)], axis=1)
        bw = jnp.concatenate([b_ref[i] for i in range(P)], axis=0)
        o_ref[...] = dot(aw, bw)

    os_ = jax.ShapeDtypeStruct((M, N), jnp.float32)
    os32 = jax.ShapeDtypeStruct((32, N), jnp.float32)
    cases = [
        ("v_dot_wide", pl.pallas_call(k_wide, out_shape=os_), (Aw, Bw)),
        ("v_dot_narrow", pl.pallas_call(k_narrow, out_shape=os_), (A, Bm)),
        ("v_concat", pl.pallas_call(k_concat, out_shape=os_), (A, Bm)),
        ("v_m32", pl.pallas_call(k_m32, out_shape=os32), (A32, Bm)),
    ]
    for name, f, args in cases:
        try:
            us = _time(f, args)
            print(f"{name}: {us:.1f} us")
        except Exception as e:  # noqa: BLE001
            print(f"{name}: FAILED {type(e).__name__}: {str(e)[:120]}")


if __name__ == "__main__":
    main()
