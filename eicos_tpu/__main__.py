"""Command-line interface — the analogue of the reference's executables
(`eicos_test_problem` demo, /root/reference/src/run.cpp, and the
`eicos_run_tests` corpus runner, /root/reference/test/ecostester.cpp).

    python -m eicos_tpu solve problem.npz [--verbose] [--strategy reduced]
    python -m eicos_tpu demo [--horizon 40] [--batch 8]
    python -m eicos_tpu corpus [--problems lp_afiro,feas] [--strategy full]
"""

from __future__ import annotations

import argparse
import sys
import time


def _settings(args):
    from .settings import Settings

    kw = {}
    if getattr(args, "strategy", None):
        kw["kkt_strategy"] = args.strategy
    if getattr(args, "factor_dtype", None):
        kw["factor_dtype"] = args.factor_dtype
    return Settings(**kw)


def _attach_plan(args, st, prob):
    if getattr(args, "strategy", None) == "banded":
        from .plan import make_band_plan

        return st.with_band_plan(make_band_plan(st, prob.G, prob.A))
    return st


def cmd_solve(args) -> int:
    import jax

    from .io import load_problem
    from .solver import solve
    from .utils.printing import print_iteration_table, print_summary

    st, prob = load_problem(args.problem)
    st = _attach_plan(args, st, prob)
    t0 = time.time()
    if args.live:
        # stream the iteration table DURING the solve (segmented
        # dispatch — works through the axon TPU tunnel)
        from .solver import solve_live

        sol = jax.device_get(solve_live(st, prob, _settings(args)))
    else:
        sol = jax.device_get(solve(st, prob, _settings(args)))
    dt = time.time() - t0
    if args.verbose and not args.live:
        print_iteration_table(sol)
    print_summary(st, sol)
    print(f"wall:   {1e3 * dt:.1f} ms (incl. compile)")
    return 0 if int(sol.exit_code) in (0, 1, 2, 10, 11, 12) else 1


def cmd_demo(args) -> int:
    sys.argv = ["run_demo.py", "--horizon", str(args.horizon),
                "--batch", str(args.batch)]
    import os

    demo = os.path.join(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))), "examples", "run_demo.py")
    with open(demo) as f:
        exec(compile(f.read(), demo, "exec"), {"__name__": "__main__"})
    return 0


def cmd_corpus(args) -> int:
    """Run the reference corpus — the eicos_run_tests analogue."""
    from . import corpus
    from .solver import solve

    names = (args.problems.split(",") if args.problems
             else [e.name for e in corpus.CORPUS
                   if e.name not in ("MPC02", "lp_bnl1", "lp_25fv47")
                   or args.all])
    n_pass = 0
    t_start = time.time()
    for name in names:
        st, prob, expected = corpus.load(name)
        st = _attach_plan(args, st, prob)
        t0 = time.time()
        sol = solve(st, prob, _settings(args))
        code = int(sol.exit_code)
        ok = code in [int(e) for e in expected]
        n_pass += ok
        print(f"{'PASS' if ok else 'FAIL'}  {name:18s} exit={code:3d} "
              f"iters={int(sol.info.iter):3d}  {time.time() - t0:6.1f}s")
    print(f"\n{n_pass}/{len(names)} passed "
          f"({time.time() - t_start:.1f}s total)")
    return 0 if n_pass == len(names) else 1


def main(argv=None) -> int:
    ap = argparse.ArgumentParser(prog="eicos_tpu")
    sub = ap.add_subparsers(dest="cmd", required=True)

    p = sub.add_parser("solve", help="solve a problem saved as .npz")
    p.add_argument("problem")
    p.add_argument("--verbose", action="store_true")
    p.add_argument("--live", action="store_true",
                   help="stream the iteration table during the solve")
    p.add_argument("--strategy", choices=("full", "reduced", "banded"))
    p.add_argument("--factor-dtype", choices=("float64", "float32"))
    p.set_defaults(fn=cmd_solve)

    p = sub.add_parser("demo", help="setup/solve/update/re-solve demo")
    p.add_argument("--horizon", type=int, default=40)
    p.add_argument("--batch", type=int, default=0)
    p.set_defaults(fn=cmd_demo)

    p = sub.add_parser("corpus", help="run the reference test corpus")
    p.add_argument("--problems", default="")
    p.add_argument("--all", action="store_true",
                   help="include the largest problems")
    p.add_argument("--strategy", choices=("full", "reduced", "banded"))
    p.add_argument("--factor-dtype", choices=("float64", "float32"))
    p.set_defaults(fn=cmd_corpus)

    args = ap.parse_args(argv)
    return args.fn(args)


if __name__ == "__main__":
    sys.exit(main())
