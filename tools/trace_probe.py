"""Capture a jax.profiler trace of one 128-lane bench LP solve and of an
iter_max-extended variant, to decompose the per-iteration cost (the
CLAUDE.md breakdown leaves ~31 ms/iter unattributed).

Usage: python tools/trace_probe.py [--lanes 128] [--trace]
"""

import argparse
import glob
import gzip
import json
import os
import sys
import time
from collections import defaultdict

import numpy as np

sys.path.insert(0, os.path.dirname(
    os.path.dirname(os.path.abspath(__file__))))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--lanes", type=int, default=128)
    ap.add_argument("--trace", action="store_true")
    ap.add_argument("--hlo", default="",
                    help="dump optimized HLO text to this path")
    ap.add_argument("--logdir", default="/tmp/jtrace")
    ap.add_argument("--nitref", type=int, default=9,
                    help="iterative-refinement trip cap (settings.nitref)")
    ap.add_argument("--socp", action="store_true",
                    help="profile the SOCP bench lane (make_mpc_soc, "
                         "keep_soc banded) instead of the LP lane")
    ap.add_argument("--i8", action="store_true",
                    help="chunk_store='i8' (int8-stored solve streams)")
    args = ap.parse_args()

    import jax
    import bench
    from eicos_tpu.api import BatchedSolver
    from eicos_tpu.settings import Settings

    if args.socp:
        st, batch, shared = bench.build_socp_batch()
    else:
        st, probs, batch, shared = bench.build_batch()
    settings = Settings(kkt_strategy="banded", nitref=args.nitref,
                        chunk_store=("i8" if args.i8 else "bf16"))
    bs = BatchedSolver(st, settings, shared=shared)
    sub = bench._slice_batch(batch, shared, args.lanes)

    if args.hlo:
        dev = jax.device_put(sub)
        txt = bs._vsolve.lower(dev).compile().as_text()
        with open(args.hlo, "w") as f:
            f.write(txt)
        print(f"wrote {len(txt)} bytes of optimized HLO to {args.hlo}",
              flush=True)
        return
    sols = bs.solve(sub)
    codes = np.asarray(jax.device_get(sols.exit_code))
    iters = np.asarray(jax.device_get(sols.info.iter))
    print(f"codes ok: {int((codes == 0).sum())}/{args.lanes}; "
          f"iters min/max/mean: {iters.min()}/{iters.max()}/"
          f"{iters.mean():.1f}", flush=True)
    hist = sols.history
    n1 = np.asarray(jax.device_get(hist.nitref1), np.float64)
    n2 = np.asarray(jax.device_get(hist.nitref2), np.float64)
    n3 = np.asarray(jax.device_get(hist.nitref3), np.float64)
    pc = np.asarray(jax.device_get(hist.pcost))
    live = ~np.isnan(pc)
    for nm, nv in (("nitref1", n1), ("nitref2", n2), ("nitref3", n3)):
        v = nv[live]
        print(f"{nm}: mean {v.mean():.2f} max {int(v.max())}", flush=True)
    ih = np.bincount(iters)
    print("iter histogram:", {i: int(c) for i, c in enumerate(ih) if c},
          flush=True)

    def timeit(reps=5):
        ts = []
        for _ in range(reps):
            t0 = time.time()
            s = bs.solve(sub)
            float(jax.device_get(s.x[0, 0]))
            ts.append(time.time() - t0)
        return min(ts)

    t_base = timeit()
    print(f"solve wall (best of 5): {t_base * 1e3:.1f} ms", flush=True)

    if args.trace:
        jax.profiler.start_trace(args.logdir)
        s = bs.solve(sub)
        float(jax.device_get(s.x[0, 0]))
        jax.profiler.stop_trace()
        print("trace captured", flush=True)
        report(args.logdir, iters.max())


def report(logdir, niter):
    files = sorted(glob.glob(
        os.path.join(logdir, "plugins/profile/*/*.trace.json.gz")),
        key=os.path.getmtime)
    if not files:
        print("no trace files found under", logdir)
        return
    with gzip.open(files[-1], "rt") as f:
        data = json.load(f)
    events = data.get("traceEvents", [])
    # find device track pids (TPU core)
    pid_names = {}
    for e in events:
        if e.get("ph") == "M" and e.get("name") == "process_name":
            pid_names[e["pid"]] = e["args"].get("name", "")
    dev_pids = {p for p, nm in pid_names.items()
                if "TPU" in nm or "/device" in nm.lower()}
    by_name = defaultdict(float)
    total = 0.0
    for e in events:
        if e.get("ph") != "X" or e.get("pid") not in dev_pids:
            continue
        nm = e.get("name", "?")
        dur = e.get("dur", 0) / 1e3  # us -> ms
        by_name[nm] += dur
        total += dur
    print(f"device tracks: {[pid_names[p] for p in dev_pids]}")
    print(f"total device-op time: {total:.1f} ms over {niter} iters")
    for nm, ms in sorted(by_name.items(), key=lambda kv: -kv[1])[:40]:
        print(f"{ms:9.2f} ms  {ms / max(niter, 1):7.2f} /it  {nm[:90]}")


if __name__ == "__main__":
    main()
