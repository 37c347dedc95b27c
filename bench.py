"""Benchmark: batched MPC01-sized LP solves/sec on one TPU chip.

BASELINE.json metric: "Batched MPC01 solves/sec".  MPC01's data files are
missing blobs in the reference snapshot, so an MPC01-family problem is
regenerated at the family's scale (n=1494, p=498, m=2988 — same class as
MPC02: n=1496, m=3996, p=499, /root/reference/test/MPC/MPC02.h:4-8).

Batch layout mirrors the reference's updateData sweep
(/root/reference/src/run.cpp:43-50): one fixed G/A pattern+values, new
c/b per solve — lanes share G/A/h (unbatched under vmap, so equilibration
and the KKT base assembly happen once) and vary c, b.

Solver configuration: reduced (normal-equations) KKT strategy + float32
factorization with float64 iterative refinement — the TPU MXU path; exit
codes and residuals match the float64 full path at 1e-8 tolerances.

The CPU baseline is scipy's HiGHS (the reference EiCOS cannot be compiled
here — no Eigen in the image — and HiGHS is a *stronger* CPU LP baseline
than EiCOS's generic IPM, so vs_baseline is conservative).  Baseline is
measured once and cached in baselines/highs_baseline.json.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.
"""

import json
import os
import sys
import time

import numpy as np

# MPC01-family scale: n = HORIZON*(NX+NU) = 1494, p = HORIZON*NX = 498
HORIZON = 249
NX, NU = 2, 4
BATCH = 128         # lanes per compiled batch (HBM-bound)
ROUNDS = 3          # timed batches; total solves = BATCH * ROUNDS
BASELINE_PROBES = 6
BASELINE_CACHE = os.path.join(os.path.dirname(__file__),
                              "baselines", "highs_baseline.json")


def build_batch():
    import eicos_tpu  # noqa: F401
    from eicos_tpu import corpus
    from eicos_tpu.api import BatchedSolver

    rng = np.random.default_rng(7)
    st, base = corpus.make_mpc_like(horizon=HORIZON, nx=NX, nu=NU, seed=3)
    probs = []
    for _ in range(BATCH):
        c = np.asarray(base.c) + 0.02 * rng.standard_normal(st.n)
        b = np.asarray(base.b).copy()
        b[:NX] += 0.05 * rng.standard_normal(NX)  # perturb x0
        probs.append(base.__class__(G=base.G, A=base.A, c=c, h=base.h, b=b))
    shared = ("G", "A", "h")
    return st, probs, BatchedSolver.stack(probs, shared=shared), shared


def measure_tpu(st, batch, shared):
    import jax

    from eicos_tpu.api import BatchedSolver
    from eicos_tpu.settings import Settings

    settings = Settings(kkt_strategy="reduced", factor_dtype="float32")
    bs = BatchedSolver(st, settings, shared=shared)
    sols = bs.solve(batch)  # compile + warm
    codes = np.asarray(jax.device_get(sols.exit_code))
    n_ok = int(np.sum((codes == 0) | (codes == 10)))
    t0 = time.time()
    for _ in range(ROUNDS):
        sols = bs.solve(batch)
        # force a real device->host fetch: through the TPU tunnel,
        # block_until_ready alone does not guarantee execution completed
        float(jax.device_get(sols.x[0, 0]))
    elapsed = (time.time() - t0) / ROUNDS
    return BATCH / elapsed, n_ok, codes


def measure_highs(st, probs):
    if os.path.exists(BASELINE_CACHE):
        with open(BASELINE_CACHE) as f:
            cached = json.load(f)
        if (cached.get("horizon") == HORIZON and cached.get("nx") == NX
                and cached.get("nu") == NU):
            return cached["solves_per_sec"]
    from scipy.optimize import linprog

    t0 = time.time()
    for prob in probs[:BASELINE_PROBES]:
        res = linprog(np.asarray(prob.c), A_ub=np.asarray(prob.G),
                      b_ub=np.asarray(prob.h), A_eq=np.asarray(prob.A),
                      b_eq=np.asarray(prob.b), bounds=(None, None),
                      method="highs")
        assert res.status == 0, res.status
    rate = BASELINE_PROBES / (time.time() - t0)
    os.makedirs(os.path.dirname(BASELINE_CACHE), exist_ok=True)
    with open(BASELINE_CACHE, "w") as f:
        json.dump({"horizon": HORIZON, "nx": NX, "nu": NU,
                   "solves_per_sec": rate, "solver": "scipy-highs"}, f)
    return rate


def main():
    st, probs, batch, shared = build_batch()
    tpu_rate, n_ok, codes = measure_tpu(st, batch, shared)
    if n_ok != BATCH:
        print(f"WARNING: only {n_ok}/{BATCH} optimal; codes={codes}",
              file=sys.stderr)
    highs_rate = measure_highs(st, probs)
    print(json.dumps({
        "metric": "mpc01_lp_batch_solves_per_sec",
        "value": round(tpu_rate, 3),
        "unit": "solves/s",
        "vs_baseline": round(tpu_rate / highs_rate, 3),
    }))


if __name__ == "__main__":
    main()
