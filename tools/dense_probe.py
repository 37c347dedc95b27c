"""Component microbench for the dense substitution path (real TPU).

Times, at lane counts given by --lanes (comma list):
  factor  — vmapped ldl_factor_subst on (L, Dp, Dp) quasidefinite K
  solve   — vmapped substitution solve (KP-row rhs), per call
  bmm     — one vmapped matmul_ds at the recursion's top shape
isolating where batched LPnetlib scaling goes, independent of IPM
iteration-count coupling and rescue passes.

Usage: python tools/dense_probe.py [--dp 2304] [--lanes 1,4,16] [--reps 8]
"""

import argparse
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def timed(fn, fetch, reps):
    out = fn()
    float(np.asarray(fetch(out)).ravel()[0])
    ts = []
    for _ in range(reps):
        t0 = time.time()
        out = fn()
        float(np.asarray(fetch(out)).ravel()[0])
        ts.append(time.time() - t0)
    return min(ts)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--dp", type=int, default=2304)
    ap.add_argument("--lanes", type=str, default="1,4,16")
    ap.add_argument("--reps", type=int, default=8)
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp
    import eicos_tpu  # noqa: F401  (x64 + cache setup)
    from eicos_tpu.ops.ldl import ldl_factor_subst, ldl_solve
    from eicos_tpu.ops.pallas_band_ds import KP
    from eicos_tpu.ops.pallas_gemm_ds import matmul_ds

    Dp = args.dp
    rng = np.random.default_rng(0)
    print(f"Dp={Dp}  backend={jax.default_backend()}")
    print(f"{'lanes':>5s} {'factor_ms':>10s} {'/lane':>7s} "
          f"{'solve_ms':>9s} {'/lane':>7s} {'bmm_ms':>8s} {'/lane':>7s}")
    for L in [int(v) for v in args.lanes.split(",")]:
        A = rng.standard_normal((L, Dp, Dp)) * 0.1
        K = np.einsum("lij,lkj->lik", A, A) + Dp * np.eye(Dp)
        tail = Dp // 3
        K[:, -tail:, -tail:] *= -1.0  # quasidefinite-ish tail
        K[:, -tail:, :-tail] *= 0.1
        K[:, :-tail, -tail:] *= 0.1
        K = jax.device_put(jnp.asarray(K))
        rhs = jax.device_put(
            jnp.asarray(rng.standard_normal((L, Dp, 2))))

        vfac = jax.jit(jax.vmap(
            lambda Kl: ldl_factor_subst(Kl, use_pallas="auto")))
        t_fac = timed(lambda: vfac(K), lambda f: f.d[0, 0], args.reps)

        # decomposition: recursion alone vs the prechunk pass alone
        from eicos_tpu.ops.ldl import _ldl_rec_subst
        from eicos_tpu.ops.pallas_dense_ds import prechunk_dense

        def rec_only(Kl):
            with jax.default_matmul_precision("highest"):
                _, Xinv, Loff, d = _ldl_rec_subst(Kl, 128, True, True)
            return Loff, Xinv, d

        vrec = jax.jit(jax.vmap(rec_only))
        t_rec = timed(lambda: vrec(K), lambda o: o[2][0, 0], args.reps)
        Loff, Xinv, d = jax.block_until_ready(vrec(K))
        vpre = jax.jit(jax.vmap(prechunk_dense))
        t_pre = timed(lambda: vpre(Loff, Xinv, d),
                      lambda p: p.dh[0, 0, 0, 0], args.reps)
        print(f"      rec {t_rec*1e3:9.1f} ({t_rec/L*1e3:.2f}/lane)  "
              f"prechunk {t_pre*1e3:9.1f} ({t_pre/L*1e3:.2f}/lane)")

        fac = vfac(K)
        fac = jax.block_until_ready(fac)
        vsolve = jax.jit(jax.vmap(ldl_solve))
        t_sol = timed(lambda: vsolve(fac, rhs),
                      lambda x: x[0, 0, 0], args.reps)

        h = (Dp // 256) * 128
        a = jax.device_put(jnp.asarray(
            rng.standard_normal((L, Dp - h, h))))
        b = jax.device_put(jnp.asarray(
            rng.standard_normal((L, h, h))))
        vmm = jax.jit(jax.vmap(matmul_ds))
        t_mm = timed(lambda: vmm(a, b), lambda x: x[0, 0, 0], args.reps)

        print(f"{L:5d} {t_fac*1e3:10.1f} {t_fac/L*1e3:7.2f} "
              f"{t_sol*1e3:9.2f} {t_sol/L*1e3:7.2f} "
              f"{t_mm*1e3:8.2f} {t_mm/L*1e3:7.2f}")


if __name__ == "__main__":
    main()
