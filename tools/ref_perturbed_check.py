"""Tier parity on the MARGINAL perturbed LPnetlib instances.

The batched artifact's lp_agg2/lp_agg3 lanes mostly exit
CLOSE_TO_OPTIMAL (code 10) on 1%-c-perturbed, HiGHS-certified-optimal
instances, and the same draws exit 10 under exact f64 on CPU.  This
tool closes the loop by running the REAL reference binary (unmodified
EiCOS sources against mini_eigen, baselines/ref_build) on the exact
same instance pools via its updateData fast path, recording per-variant
exit codes — if the reference also lands in its close_to_* tier, the
artifact's code-10 lanes are tier parity, not a TPU kernel gap.

Writes baselines/ref_perturbed_tiers.json.

    python tools/ref_perturbed_check.py [--problems lp_agg2,lp_agg3]
                                        [--variants 16]
"""

import argparse
import json
import os
import subprocess
import sys

import numpy as np

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, ROOT)
BUILD = os.path.join(ROOT, "baselines", "ref_build")


def dump_problem(path, st, prob, variants):
    from scipy.sparse import csc_matrix

    G = csc_matrix(np.asarray(prob.G))
    A = csc_matrix(np.asarray(prob.A))
    with open(path, "wb") as f:
        def w32(*vals):
            np.asarray(vals, np.int32).tofile(f)

        def wf(a):
            np.asarray(a, np.float64).tofile(f)

        w32(st.n, st.m, st.p, st.l, st.n_sc)
        if st.n_sc:
            np.asarray(st.q, np.int32).tofile(f)
        w32(G.nnz)
        np.asarray(G.indptr, np.int32).tofile(f)
        np.asarray(G.indices, np.int32).tofile(f)
        wf(G.data)
        w32(A.nnz)
        np.asarray(A.indptr, np.int32).tofile(f)
        np.asarray(A.indices, np.int32).tofile(f)
        wf(A.data)
        wf(prob.c)
        wf(prob.h)
        wf(prob.b)
        w32(len(variants))
        for c in variants:
            wf(c)
            wf(prob.b)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--problems", default="lp_agg2,lp_agg3")
    ap.add_argument("--variants", type=int, default=16)
    args = ap.parse_args()

    import jax
    jax.config.update("jax_platforms", "cpu")
    from eicos_tpu import corpus
    from scipy.optimize import linprog

    subprocess.run(["make", "-C", BUILD, "-j4"], check=True,
                   capture_output=True)
    bench_ref = os.path.join(BUILD, "build", "bench_ref")

    out_rows = []
    for name in args.problems.split(","):
        st, prob, _ = corpus.load(name)
        # the batched artifact's exact pool: seed 17, HiGHS-filtered
        rng = np.random.default_rng(17)
        pool = []
        while len(pool) < args.variants:
            c = (np.asarray(prob.c)
                 * (1.0 + 0.01 * rng.standard_normal(st.n)))
            res = linprog(c, A_ub=np.asarray(prob.G),
                          b_ub=np.asarray(prob.h),
                          A_eq=np.asarray(prob.A) if st.p else None,
                          b_eq=np.asarray(prob.b) if st.p else None,
                          bounds=(None, None), method="highs")
            if res.status == 0:
                pool.append(c)
        dump = os.path.join(BUILD, "build", f"pert_{name}.bin")
        dump_problem(dump, st, prob, pool)
        res = subprocess.run([bench_ref, dump], capture_output=True,
                             text=True, check=True)
        rec = json.loads(res.stdout.strip().splitlines()[-1])
        print(name, "reference codes:", rec["codes"],
              f"(optimal-tier {rec['optimal']}/{rec['variants']})")
        out_rows.append(dict(problem=name, ref_codes=rec["codes"],
                             ref_optimal_or_close=rec["optimal"],
                             variants=rec["variants"],
                             median_solve_ms=rec["median_solve_ms"]))
    out = os.path.join(ROOT, "baselines", "ref_perturbed_tiers.json")
    with open(out, "w") as f:
        json.dump(dict(
            note=("reference binary exit codes on the batched "
                  "artifact's perturbed instance pools (seed 17, "
                  "HiGHS-filtered).  EiCOS codes: 0=optimal, "
                  "10=close_to_optimal, negatives=numerics/maxit"),
            rows=out_rows), f, indent=1)
    print("wrote", out)


if __name__ == "__main__":
    main()
