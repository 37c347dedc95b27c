"""Reproduce the 1-in-256 banded-endgame stall on CPU (exact f64).

Round-2 root cause (CLAUDE.md): one lane of the 256-lane bench seed
stalls at gap ~4e-5 under the banded elimination ORDER even in exact
f64 (growth 2.2e7, residual 6e1 at the endgame iterate), while the
dense natural-order "reduced" path reaches OPTIMAL.  This tool re-finds
the stalled lane(s) on the CPU backend, where the band factor runs the
exact-f64 XLA scan (ops/band_ldl.py) — isolating the ORDER pathology
from the double-single kernel rounding — and prints per-lane exits
under banded vs reduced.

    python tools/stall_repro.py [--lanes 0:256] [--strategy banded]
"""

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--lanes", default="0:256")
    ap.add_argument("--strategy", default="banded")
    ap.add_argument("--chunk", type=int, default=32,
                    help="lanes per vmapped solve")
    args = ap.parse_args()
    lo, hi = (int(v) for v in args.lanes.split(":"))

    import jax
    jax.config.update("jax_platforms", "cpu")
    jax.config.update("jax_enable_x64", True)

    os.environ.setdefault("EICOS_BENCH_BATCH", str(hi))
    import bench
    from eicos_tpu.api import BatchedSolver
    from eicos_tpu.settings import Settings

    st, probs, batch, shared = bench.build_batch()
    settings = Settings(kkt_strategy=args.strategy)
    bs = BatchedSolver(st, settings, shared=shared)
    bad = {}
    for c0 in range(lo, hi, args.chunk):
        c1 = min(c0 + args.chunk, hi)
        sub = batch.__class__(**{
            f: (getattr(batch, f) if f in shared
                else getattr(batch, f)[c0:c1])
            for f in ("G", "A", "c", "h", "b")})
        sols = bs.solve(sub)
        codes = np.asarray(sols.exit_code)
        iters = np.asarray(sols.info.iter)
        gaps = np.asarray(sols.info.gap)
        for j in range(c1 - c0):
            if codes[j] != 0:
                bad[c0 + j] = (int(codes[j]), int(iters[j]),
                               float(gaps[j]))
        print(f"lanes {c0}:{c1}: "
              f"{int(np.sum(codes == 0))}/{c1 - c0} OPTIMAL", flush=True)
    print("non-optimal lanes {lane: (code, iters, gap)}:", bad)


if __name__ == "__main__":
    main()
