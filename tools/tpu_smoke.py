"""Hardware smoke harness: the TPU-only surfaces in one command.

The pytest suite runs on CPU (tests/conftest.py forces the CPU backend);
the double-single Pallas kernels, the direct band scatter, and the
banded certificate behavior only execute on real hardware.  This script
drives each of them and prints PASS/FAIL lines — run it on the TPU
after touching any kernel or the banded KKT path.

Usage:  python tools/tpu_smoke.py [--quick]

Covers:
  1. band_factor_ds / band_solve_ds (bwb=1) refinement contraction
  2. band_factor_ds_bw / band_solve_ds_bw at bw=3 (and bw=6 full mode)
  3. corpus spots under the banded strategy: feas (OPTIMAL),
     unboundedLP1 (DINF certificate), issue98 (SOC + zero singleton
     rows — the float64-indexer regression shape)
  4. a 16-lane LP batch and a 16-lane SOCP batch of the bench family,
     every lane OPTIMAL
"""

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

FAILURES = []


def check(name, ok, detail=""):
    line = f"[{'PASS' if ok else 'FAIL'}] {name}" + (f"  {detail}" if detail else "")
    print(line, flush=True)
    if not ok:
        FAILURES.append(name)


def synth_band(rng, nb, bw, B):
    import numpy as np
    D = nb * B
    K = np.zeros((D, D))
    for k in range(nb):
        A = rng.standard_normal((B, B)) * 0.2
        s = (np.exp(rng.uniform(-9.2, 9.2, B))
             * np.sign(rng.standard_normal(B)))
        K[k*B:(k+1)*B, k*B:(k+1)*B] = (A + A.T) / 2 + np.diag(s * 8)
        for j in range(1, bw + 1):
            if k >= j:
                Bk = rng.standard_normal((B, B)) * (0.3 / j)
                K[k*B:(k+1)*B, (k-j)*B:(k-j+1)*B] = Bk
                K[(k-j)*B:(k-j+1)*B, k*B:(k+1)*B] = Bk.T
    return K


def kernel_checks(quick):
    import jax
    import jax.numpy as jnp
    import numpy as np
    from eicos_tpu.ops.pallas_band_ds import (KP, B, band_factor_ds,
                                              band_factor_ds_bw,
                                              band_solve_ds,
                                              band_solve_ds_bw)

    rng = np.random.default_rng(1)
    cases = [(1, 6), (3, 6)] + ([] if quick else [(6, 8)])
    for bw, nb in cases:
        D = nb * B
        K = synth_band(rng, nb, bw, B)
        Kd = np.stack([K[k*B:(k+1)*B, k*B:(k+1)*B] for k in range(nb)])
        if bw == 1:
            Ks = np.zeros((nb, B, B))
            for k in range(1, nb):
                Ks[k] = K[k*B:(k+1)*B, (k-1)*B:k*B]
            fac = band_factor_ds(jnp.asarray(Kd), jnp.asarray(Ks))
            solver = band_solve_ds
        else:
            Ks = np.zeros((nb, bw, B, B))
            for k in range(nb):
                for j in range(1, bw + 1):
                    if k >= j:
                        Ks[k, j-1] = K[k*B:(k+1)*B, (k-j)*B:(k-j+1)*B]
            fac = band_factor_ds_bw(jnp.asarray(Kd), jnp.asarray(Ks))
            solver = band_solve_ds_bw
        rhs0 = np.zeros((KP, D))
        rhs0[:2] = rng.standard_normal((2, D))
        x = np.zeros((2, D))
        for _ in range(3):   # <= 3 refinement rounds must reach 1e-12
            r = rhs0[:2] - x @ K.T
            rr = np.zeros((KP, D)); rr[:2] = r
            dx = np.asarray(jax.device_get(
                solver(fac, jnp.asarray(rr))))[:2]
            x = x + dx
        relres = (np.abs(K @ x.T - rhs0[:2].T).max()
                  / (1 + np.abs(rhs0).max()))
        check(f"band kernel bw={bw} nb={nb}", relres < 1e-11,
              f"relres={relres:.2e}")


def corpus_checks(quick):
    import jax
    from eicos_tpu import corpus
    from eicos_tpu.plan import make_band_plan
    from eicos_tpu.settings import Settings
    from eicos_tpu.solver import solve

    spots = [("feas", {0}), ("unboundedLP1", {2}), ("issue98", {0})]
    for name, want in spots:
        st, prob, _ = corpus.load(name)
        st = st.with_gsplit(prob.G)
        st = st.with_band_plan(make_band_plan(st, prob.G, prob.A))
        sol = solve(st, prob, Settings(kkt_strategy="banded"))
        code = int(jax.device_get(sol.exit_code))
        check(f"banded corpus {name}", code in want, f"exit={code}")


def batch_checks(quick):
    import jax
    import numpy as np
    import bench
    from eicos_tpu.api import BatchedSolver
    from eicos_tpu.plan import make_band_plan
    from eicos_tpu.settings import Settings

    lanes = 16
    bench.BATCH = lanes
    for lane_name, builder in (("LP", bench.build_batch),
                               ("SOCP", bench.build_socp_batch)):
        out = builder()
        if lane_name == "LP":
            st, probs, batch, shared = out
            st = st.with_band_plan(make_band_plan(st, probs[0].G,
                                                  probs[0].A))
        else:
            st, batch, shared = out
        bs = BatchedSolver(st, Settings(kkt_strategy="banded"),
                           shared=shared)
        sub = bench._slice_batch(batch, shared, lanes)
        t0 = time.time()
        sols = bs.solve(sub)
        codes = np.asarray(jax.device_get(sols.exit_code))
        ok = int(np.sum(codes == 0))
        check(f"{lane_name} batch {lanes} lanes", ok == lanes,
              f"{ok}/{lanes} optimal, {time.time()-t0:.0f}s incl compile")


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--quick", action="store_true",
                    help="skip the bw=6 kernel case")
    args = ap.parse_args()
    import jax
    assert jax.default_backend() != "cpu", (
        "tpu_smoke must run on the TPU (default env, no JAX_PLATFORMS)")
    jax.config.update("jax_enable_x64", True)
    kernel_checks(args.quick)
    corpus_checks(args.quick)
    batch_checks(args.quick)
    print(f"\n{'ALL PASS' if not FAILURES else 'FAILURES: ' + ', '.join(FAILURES)}")
    sys.exit(1 if FAILURES else 0)


if __name__ == "__main__":
    main()
