"""Validate the "full" KKT strategy at its largest corpus scale on TPU.

MPC02's full quasidefinite system is 5991-dim — f64 factors at that size
are impractical on the CPU test runner but fine on TPU, and f32 factors
collapse near convergence (mu ~ 1e-5) at 6k dims.  This runs MPC02 (and
any problems passed via --problems) under kkt_strategy="full" with f64
factors on the default backend and records exit/iteration/wall-clock to
baselines/full_scale_results.json.

The point is the elimination-order claim (kkt.py: [z x y] keeps every
pivot O(1) without pivoting); the reference gets the analogous effect
from AMD ordering inside Eigen's LDLT.

Usage:  python tools/full_scale_check.py [--problems MPC02,lp_bandm]
"""

import argparse
import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--problems", default="MPC02")
    ap.add_argument("--cpu", action="store_true")
    args = ap.parse_args()

    import jax
    if args.cpu:
        jax.config.update("jax_platforms", "cpu")
    import eicos_tpu
    from eicos_tpu import corpus
    from eicos_tpu.settings import Settings
    from eicos_tpu.solver import solve

    settings = Settings(kkt_strategy="full")
    rows = []
    for name in args.problems.split(","):
        st, prob, expected = corpus.load(name)
        dim = st.n + st.p + st.m
        t0 = time.time()
        sol = solve(st, prob, settings)
        float(jax.device_get(sol.x[0] if st.n else sol.info.tau))
        compile_s = time.time() - t0
        t0 = time.time()
        sol = solve(st, prob, settings)
        float(jax.device_get(sol.x[0] if st.n else sol.info.tau))
        solve_s = time.time() - t0
        code = int(sol.exit_code)
        ok = code in [int(e) for e in expected]
        rows.append(dict(problem=name, dim_kkt=dim, exit=code,
                         expected=[int(e) for e in expected], ok=ok,
                         iters=int(sol.info.iter),
                         pres=float(sol.info.pres),
                         dres=float(sol.info.dres),
                         compile_s=round(compile_s, 1),
                         solve_s=round(solve_s, 2)))
        print(f"{name}: dim {dim} exit {code} "
              f"({'OK' if ok else 'MISMATCH'}) iters {int(sol.info.iter)} "
              f"solve {solve_s:.2f}s")

    out = os.path.join(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))), "baselines",
        "full_scale_results.json")
    with open(out, "w") as f:
        json.dump(dict(backend=jax.default_backend(),
                       settings="full/float64", rows=rows), f, indent=1)
    print(f"wrote {out}")
    if not all(r["ok"] for r in rows):
        sys.exit(1)


if __name__ == "__main__":
    main()
