"""Probe: batched f64 GEMM through XLA's emulation vs vmapped matmul_ds.

The batched-LPnetlib thesis (VERDICT r3 #4): the dense "reduced" factor
GEMMs replay per lane through the auto-batched Pallas grid, so 16 bnl1
lanes run near-serial.  XLA's f64 dot emulation is a chunked while-loop
whose fixed per-chunk overhead amortizes across a BATCHED dot — this
probe times both forms at the bnl1 recursion's block shapes to decide
which should carry vmapped dense factors.

Usage: python tools/batch_gemm_probe.py [--lanes 16]
"""

import argparse
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def bench(fn, *args, reps=10):
    import jax

    out = fn(*args)
    # force a device->host fetch: through the axon tunnel
    # block_until_ready returns before execution finishes, so the first
    # timed rep would otherwise absorb compile/warmup
    o0 = out[0] if isinstance(out, (tuple, list)) else out
    float(jax.device_get(o0.ravel()[0]))
    ts = []
    for _ in range(reps):
        t0 = time.time()
        out = fn(*args)
        o0 = out[0] if isinstance(out, (tuple, list)) else out
        float(jax.device_get(o0.ravel()[0]))
        ts.append(time.time() - t0)
    return min(ts)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--lanes", type=int, default=16)
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp
    from eicos_tpu.ops.pallas_gemm_ds import matmul_ds

    L = args.lanes
    rng = np.random.default_rng(0)

    shapes = [
        (1152, 1152, 1152),   # bnl1 recursion top-level GEMM
        (576, 576, 576),      # next level
        (128, 1152, 1152),    # L21 panel rows
        (16, 2304, 2304),     # solve rows (2-col rhs padded to 16)
    ]
    for (m, k, n) in shapes:
        a = jnp.asarray(rng.standard_normal((L, m, k)))
        b = jnp.asarray(rng.standard_normal((L, k, n)))

        @jax.jit
        def xla_batch(a, b):
            with jax.default_matmul_precision("highest"):
                return jax.lax.dot_general(
                    a, b, (((2,), (1,)), ((0,), (0,))))

        t_xla = bench(xla_batch, a, b)

        vds = jax.jit(jax.vmap(matmul_ds))
        try:
            t_ds = bench(vds, a, b)
        except Exception as e:
            t_ds = float("nan")
            print(f"matmul_ds failed at {m}x{k}x{n}: {type(e).__name__}",
                  flush=True)
        flops = 2.0 * L * m * k * n
        print(f"({L},{m},{k})@({L},{k},{n}): xla_f64 {t_xla*1e3:8.2f} ms "
              f"({flops/t_xla/1e12:6.2f} TF/s)  vmap(matmul_ds) "
              f"{t_ds*1e3:8.2f} ms ({flops/t_ds/1e12:6.2f} TF/s)",
              flush=True)


if __name__ == "__main__":
    main()
