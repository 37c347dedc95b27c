"""Decompose single-solve latency (VERDICT #8: lp_afiro 43 ms/solve).

Through the axon tunnel every host round trip carries a fixed cost;
this probe separates (a) the pure device->host scalar fetch, (b) a
trivial jit dispatch + fetch, (c) the afiro-class solve dispatch +
fetch, and (d) the solve's pure device time (rep-amortized), so the
irreducible tunnel floor is measured rather than guessed.

Usage: python tools/latency_probe.py [--problem lp_afiro] [--reps 50]
"""

import argparse
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def best(fn, reps):
    ts = []
    for _ in range(reps):
        t0 = time.time()
        fn()
        ts.append(time.time() - t0)
    ts = np.asarray(ts) * 1e3
    return ts.min(), np.median(ts)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--problem", default="lp_afiro")
    ap.add_argument("--reps", type=int, default=50)
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp
    from eicos_tpu import corpus
    from eicos_tpu.settings import Settings
    from eicos_tpu.solver import solve

    x = jax.device_put(jnp.arange(16384.0, dtype=jnp.float32))
    float(jax.device_get(x[0]))
    mn, md = best(lambda: float(jax.device_get(x[0])), args.reps)
    print(f"pure scalar fetch:        min {mn:7.2f} ms  med {md:7.2f} ms",
          flush=True)

    f = jax.jit(lambda v: v * 2.0 + 1.0)
    float(jax.device_get(f(x)[0]))
    mn, md = best(lambda: float(jax.device_get(f(x)[0])), args.reps)
    print(f"trivial jit + fetch:      min {mn:7.2f} ms  med {md:7.2f} ms",
          flush=True)

    st, prob, _ = corpus.load(args.problem)
    st = st.with_gsplit(prob.G, prob.A)
    prob = jax.device_put(prob)
    settings = Settings(kkt_strategy="reduced")

    def run():
        sol = solve(st, prob, settings)
        float(jax.device_get(sol.x[0]))
        return sol

    t0 = time.time()
    sol = run()
    print(f"compile: {time.time() - t0:.1f} s; exit {int(sol.exit_code)} "
          f"iters {int(sol.info.iter)}", flush=True)
    mn, md = best(run, max(args.reps // 2, 5))
    print(f"solve dispatch + fetch:   min {mn:7.2f} ms  med {md:7.2f} ms",
          flush=True)

    # rep-amortized device time: R solves inside one jit, fetch one
    # scalar — the per-solve figure carries ~1/R of the tunnel cost
    R = 16

    def many(p):
        def body(i, acc):
            s = solve(st, p, settings)
            return acc + s.x[0] * 1e-30
        return jax.lax.fori_loop(0, R, body, jnp.float64(0.0))

    jmany = jax.jit(many)
    float(jax.device_get(jmany(prob)))
    mn, md = best(lambda: float(jax.device_get(jmany(prob))),
                  max(args.reps // 8, 3))
    print(f"device-only per solve:    min {mn / R:7.2f} ms  "
          f"med {md / R:7.2f} ms  (R={R} in-jit reps)", flush=True)

    # fetch-size effect: full Solution pytree vs one scalar
    jsolve = jax.jit(lambda p: solve(st, p, settings))
    sol = jsolve(prob)
    jax.block_until_ready(sol)

    def full_fetch():
        s = jsolve(prob)
        jax.device_get(s)

    mn, md = best(full_fetch, max(args.reps // 2, 5))
    print(f"solve + FULL pytree get:  min {mn:7.2f} ms  med {md:7.2f} ms",
          flush=True)


if __name__ == "__main__":
    main()
