"""Demo executable: setup / solve / update / re-solve with timing.

Mirrors the reference demo (/root/reference/src/run.cpp:7-53), which loads
an MPC problem, times setup and solve, perturbs the data via updateData,
and re-solves asserting optimality.  The reference's MPC01 data file is a
missing blob in the snapshot, so an MPC01-family problem is regenerated.

Run:  python examples/run_demo.py [--horizon 40] [--batch 0]
"""

import argparse
import os
import sys
import time

import numpy as np

# runnable from anywhere: the package lives at the repo root
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--horizon", type=int, default=40)
    ap.add_argument("--batch", type=int, default=0,
                    help="also run a vmapped batch of this size")
    args = ap.parse_args()

    import eicos_tpu
    from eicos_tpu import corpus
    from eicos_tpu.api import BatchedSolver, Solver
    from eicos_tpu.exitcodes import ExitCode

    t0 = time.time()
    st, prob = corpus.make_mpc_like(horizon=args.horizon)
    solver = Solver.__new__(Solver)
    solver.structure, solver.settings = st, eicos_tpu.Settings()
    solver._data, solver._solution = prob, None
    print(f"Setup time: {1e3 * (time.time() - t0):.1f} ms "
          f"(n={st.n}, m={st.m}, p={st.p})")

    t0 = time.time()
    code = solver.solve()
    print(f"First solve time (incl. compile): "
          f"{1e3 * (time.time() - t0):.1f} ms -> {code.name}, "
          f"{int(solver.get_info().iter)} iters")
    assert code in (ExitCode.OPTIMAL, ExitCode.CLOSE_TO_OPTIMAL)

    # update data (same structure -> same compiled executable) and re-solve
    rng = np.random.default_rng(1)
    t0 = time.time()
    solver.update_data(c=np.asarray(prob.c) + 0.05 * rng.standard_normal(st.n))
    print(f"Data update time: {1e3 * (time.time() - t0):.1f} ms")

    t0 = time.time()
    code = solver.solve()
    print(f"Second solve time (cached executable): "
          f"{1e3 * (time.time() - t0):.1f} ms -> {code.name}, "
          f"{int(solver.get_info().iter)} iters")
    assert code in (ExitCode.OPTIMAL, ExitCode.CLOSE_TO_OPTIMAL)

    if args.batch:
        import jax

        probs = []
        for _ in range(args.batch):
            c = np.asarray(prob.c) + 0.05 * rng.standard_normal(st.n)
            probs.append(prob.__class__(G=prob.G, A=prob.A, c=c,
                                        h=prob.h, b=prob.b))
        batch = BatchedSolver.stack(probs)
        bs = BatchedSolver(st)
        sols = bs.solve(batch)  # compile + run
        jax.block_until_ready(sols.x)
        t0 = time.time()
        sols = bs.solve(batch)
        jax.block_until_ready(sols.x)
        dt = time.time() - t0
        codes = np.asarray(sols.exit_code)
        print(f"Batch of {args.batch}: {1e3 * dt:.1f} ms "
              f"({args.batch / dt:.1f} solves/s), "
              f"{int(np.sum(codes == 0))} optimal")


if __name__ == "__main__":
    main()
