"""One-off probe: LP-lane throughput at a given batch size WITH the dense
rescue pass (bench.py's measure_tpu, LP lane only — skips the SOCP lane
and baselines to keep the tunnel session short).

    EICOS_BENCH_BATCH=256 python tools/batch256_probe.py
"""

import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import bench  # noqa: E402


def main():
    st, probs, batch, shared = bench.build_batch()
    rate, n_ok, codes, nb = bench.measure_tpu(st, batch, shared)
    import numpy as np

    bad = {int(i): int(c) for i, c in enumerate(codes) if c != 0}
    print(json.dumps({
        "batch": nb,
        "solves_per_sec": round(rate, 3),
        "lanes_optimal": f"{n_ok}/{nb}",
        "non_optimal": bad,
    }))


if __name__ == "__main__":
    main()
