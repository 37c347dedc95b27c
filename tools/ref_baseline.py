"""Build and run the REAL reference EiCOS solver and record its baseline.

The reference (/root/reference, C++/Eigen) cannot link against the real
Eigen in this image (not installed, no egress), so baselines/ref_build
provides mini_eigen.hpp — an Eigen-compatible API subset written for this
repo — against which the UNMODIFIED reference sources compile.  This
script:

1. builds the instrumented corpus runner and the updateData-loop bench
   (``make -C baselines/ref_build``),
2. runs the full registered reference test corpus, capturing per-problem
   exit codes, objectives, ITERATION COUNTS and wall-clock,
3. dumps bench.py's exact MPC01-family problem (same seed, same variant
   perturbations) and measures the reference's updateData+solve loop on
   it (the run.cpp flow, /root/reference/src/run.cpp:43-50),
4. writes everything to baselines/eicos_reference.json.

Iteration counts are the real fidelity test (SURVEY §7 "Equilibration
fidelity"): tests/test_ref_parity.py asserts ±2-iteration parity between
this file and our solver's recorded results.

Wall-clock caveat (recorded in the JSON): mini_eigen's simplicial LDL^T
uses an RCM ordering, not Eigen's AMD, so reference times here are a
LOWER bound on a real-Eigen build's speed.  Exit codes / objectives /
iteration counts are unaffected by ordering (verified: identical under
natural/reverse/RCM orderings) — except one knife-edge SOCP certificate
(unboundedMaxSqrt), where f64 rounding at tau->0 decides the exit tier;
see "divergences" in the output.
"""

import json
import os
import re
import subprocess
import sys

import numpy as np

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
BUILD_DIR = os.path.join(ROOT, "baselines", "ref_build")
OUT = os.path.join(ROOT, "baselines", "eicos_reference.json")

# expected exit codes per registered reference test
# (/root/reference/test/ecostester.cpp:52-72 + each header's mu_assert)
EXPECTED = {
    "MPC02": (0, 10),
    "update_data": (0,),
    "issue98": (0,),
    "feas": (0,),
    "unboundedLP1": (2,),
    "infeasible1": (1,),
    "unboundedMaxSqrt": (2,),
    "emptyProblem": (0,),
    "lp_25fv47": (0,),
    "lp_adlittle": (0,),
    "lp_afiro": (0,),
    "lp_agg": (0,),
    "lp_agg2": (0,),
    "lp_agg3": (0,),
    "lp_bandm": (0,),
    "lp_beaconfd": (0,),
    "lp_blend": (0,),
    "lp_bnl1": (0,),
}


def build():
    subprocess.run(["make", "-C", BUILD_DIR, "-s"], check=True)


def run_corpus():
    out = subprocess.run([os.path.join(BUILD_DIR, "build", "runner")],
                         capture_output=True, text=True)
    rows, summary = [], {}
    for line in out.stdout.splitlines():
        line = line.strip()
        if not line.startswith("{"):
            continue
        try:
            rec = json.loads(line)
        except json.JSONDecodeError:
            continue
        if "problem" in rec:
            rows.append(rec)
        elif "tests_run" in rec:
            summary = rec
    return rows, summary


def dump_mpc_problem(path, batch=32):
    """Write bench.py's exact MPC01-family problem + variants."""
    sys.path.insert(0, ROOT)
    import bench

    rng = np.random.default_rng(7)  # same stream as bench.build_batch
    from eicos_tpu import corpus

    st, base = corpus.make_mpc_like(horizon=bench.HORIZON, nx=bench.NX,
                                    nu=bench.NU, seed=3)
    from scipy.sparse import csc_matrix

    G = csc_matrix(np.asarray(base.G))
    A = csc_matrix(np.asarray(base.A))
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
        wf(base.c)
        wf(base.h)
        wf(base.b)
        w32(batch)
        for _ in range(batch):
            c = np.asarray(base.c) + 0.02 * rng.standard_normal(st.n)
            b = np.asarray(base.b).copy()
            b[:bench.NX] += 0.05 * rng.standard_normal(bench.NX)
            wf(c)
            wf(b)
    return {"n": st.n, "m": st.m, "p": st.p, "l": st.l}


def run_mpc_bench():
    dump = os.path.join(BUILD_DIR, "build", "mpc01_like.bin")
    dims = dump_mpc_problem(dump)
    out = subprocess.run([os.path.join(BUILD_DIR, "build", "bench_ref"),
                          dump], capture_output=True, text=True, check=True)
    rec = json.loads(out.stdout.strip().splitlines()[-1])
    rec["dims"] = dims
    return rec


def main():
    build()
    rows, summary = run_corpus()
    divergences = []
    for r in rows:
        exp = EXPECTED.get(r["problem"])
        if exp and r["exit_code"] not in exp:
            divergences.append(
                {"problem": r["problem"], "expected": list(exp),
                 "got": r["exit_code"],
                 "note": "f64 rounding at the certificate knife-edge "
                         "(tau->0); identical under natural/reverse/RCM "
                         "LDL orderings, so not an ordering artifact"})
    mpc = run_mpc_bench()
    doc = {
        "source": "/root/reference/src/eicos.cpp compiled unmodified "
                  "against baselines/ref_build/Eigen/mini_eigen.hpp",
        "wallclock_caveat": "mini_eigen simplicial LDL^T uses RCM, not "
                            "Eigen's AMD; times are a lower bound on a "
                            "real-Eigen build",
        "corpus": rows,
        "corpus_summary": summary,
        "divergences": divergences,
        "mpc_updatedata_bench": mpc,
    }
    with open(OUT, "w") as f:
        json.dump(doc, f, indent=1)
    print(f"wrote {OUT}: {len(rows)} solves, "
          f"{len(divergences)} divergences, "
          f"MPC bench {mpc['solves_per_sec']:.2f} solves/s "
          f"({mpc['optimal']}/{mpc['variants']} optimal)")


if __name__ == "__main__":
    main()
