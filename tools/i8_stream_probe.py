"""Probe: int8-stored chunk operands for the prechunked solve kernels.

The solve kernels are HBM-stream-bound (tools/tsolve_probe.py: T = 4/8/16
all ~4 ms/call).  Storing the factor chunks as 7-bit-grid int8 integers
(8 chunks x 1 B = 8 B/element) instead of 8-bit-grid bf16 (7 x 2 = 14 B)
cuts the stream 43%.  This probe checks the Mosaic pieces that plan
needs on real v5e hardware:

  1. int8 VMEM block specs with a (T, 1, B, B) tiling;
  2. exact int8 -> bf16 conversion in-kernel (ints <= 127 are exact);
  3. bf16 dots on the converted chunks, batched over a lane dim;
  4. (comparison) direct int8 x int8 -> int32 dots, same layout.

Each path's output is compared against an XLA f32 reference, and timed
with enough reps to amortize the tunnel round trip.
"""

import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    import jax
    import jax.numpy as jnp
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    T, B, KP = 8, 128, 16
    G = 16    # lane groups -> 128 lanes
    NB = 16   # inner steps per program, mimics the band sweep
    rng = np.random.default_rng(0)
    ci = rng.integers(-72, 73, size=(G, T, NB, B, B), dtype=np.int8)
    # bf16-exact values so the in-kernel bf16 cast is lossless and the
    # numpy f64 reference matches to dot-accumulation order only
    a = (rng.standard_normal((G, T, KP, B)).astype(jnp.bfloat16)
         .astype(np.float32))

    def kern_convert(ci_ref, a_ref, o_ref):
        def step(k, acc):
            c = ci_ref[:, k].astype(jnp.bfloat16)
            p = jax.lax.dot_general(
                a_ref[...].astype(jnp.bfloat16), c,
                (((2,), (1,)), ((0,), (0,))),
                precision=jax.lax.Precision.DEFAULT,
                preferred_element_type=jnp.float32)
            return acc + p
        from eicos_tpu.ops.pallas_leaf_ds import _fori32
        o_ref[...] = _fori32(NB, step, jnp.zeros(o_ref.shape, jnp.float32))

    def kern_i32(ci_ref, ai_ref, o_ref):
        def step(k, acc):
            p = jax.lax.dot_general(
                ai_ref[...], ci_ref[:, k], (((2,), (1,)), ((0,), (0,))),
                preferred_element_type=jnp.int32)
            return acc + p
        from eicos_tpu.ops.pallas_leaf_ds import _fori32
        o_ref[...] = _fori32(NB, step,
                             jnp.zeros(o_ref.shape, jnp.int32))

    spec_c = pl.BlockSpec((1, T, NB, B, B), lambda g: (g, 0, 0, 0, 0),
                          memory_space=pltpu.VMEM)
    spec_a = pl.BlockSpec((1, T, KP, B), lambda g: (g, 0, 0, 0),
                          memory_space=pltpu.VMEM)

    def run_convert(ci, a):
        return pl.pallas_call(
            lambda cr, ar, orf: kern_convert(cr.at[0], ar.at[0], orf.at[0]),
            grid=(G,),
            in_specs=[spec_c, spec_a],
            out_specs=spec_a,
            out_shape=jax.ShapeDtypeStruct((G, T, KP, B), jnp.float32),
            compiler_params=pltpu.CompilerParams(
                vmem_limit_bytes=100 * 2 ** 20),
        )(ci, a)

    def run_i32(ci, ai):
        return pl.pallas_call(
            lambda cr, ar, orf: kern_i32(cr.at[0], ar.at[0], orf.at[0]),
            grid=(G,),
            in_specs=[spec_c, spec_a],
            out_specs=spec_a,
            out_shape=jax.ShapeDtypeStruct((G, T, KP, B), jnp.int32),
            compiler_params=pltpu.CompilerParams(
                vmem_limit_bytes=100 * 2 ** 20),
        )(ci, ai)

    cj = jnp.asarray(ci)
    aj = jnp.asarray(a)
    # reference in numpy f64 (exact: ints and +-1 values)
    asign = np.sign(rng.standard_normal((G, T, KP, B))).astype(np.float32)
    aij = jnp.asarray(asign.astype(np.int8))
    ref = np.zeros((G, T, KP, B), np.float64)
    refi = np.zeros((G, T, KP, B), np.int64)
    for k in range(NB):
        ref += np.einsum("gtrb,gtbc->gtrc", a.astype(np.float64),
                         ci[:, :, k].astype(np.float64))
        refi += np.einsum("gtrb,gtbc->gtrc",
                          asign.astype(np.int64),
                          ci[:, :, k].astype(np.int64))

    for name, fn, args, want, exact_cast in (
            ("int8->bf16 convert + bf16 dot", run_convert, (cj, aj),
             ref, np.float32),
            ("int8 x int8 -> int32 dot", run_i32, (cj, aij),
             refi, np.int64),
    ):
        try:
            f = jax.jit(fn)
            out = np.asarray(jax.device_get(f(*args)), np.float64)
        except Exception as e:
            print(f"{name}: FAILED {type(e).__name__}: {str(e)[:300]}",
                  flush=True)
            continue
        w = np.asarray(want, np.float64)
        err = np.max(np.abs(out - w) / np.maximum(np.abs(w), 1.0))
        R = 64
        loop = jax.jit(lambda *xs: jax.lax.fori_loop(
            0, R, lambda i, acc: acc + fn(*xs)[0, 0, 0, 0].astype(
                jnp.float32), jnp.float32(0.0)))
        float(jax.device_get(loop(*args)))
        ts = []
        for _ in range(3):
            t0 = time.time()
            float(jax.device_get(loop(*args)))
            ts.append(time.time() - t0)
        print(f"{name}: max rel err {err:.3e}  "
              f"{min(ts) / R * 1e3:.3f} ms/call "
              f"({G * T * NB * B * B / (min(ts) / R) / 1e9:.0f} GB/s int8 "
              f"stream)", flush=True)


if __name__ == "__main__":
    main()
