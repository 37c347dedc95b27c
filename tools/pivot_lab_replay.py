"""Replay pivot-strategy experiments on a saved endgame KKT
(tools/pivot_lab.py --save ...): no solver run, pure numpy.

    python tools/pivot_lab_replay.py /tmp/lane185.npz
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

from tools.pivot_lab import band_factor, band_solve


def main():
    d = np.load(sys.argv[1])
    Kd, Ks, K = d["Kd"], d["Ks"], d["K"]
    nb, B, _ = Kd.shape
    rng = np.random.default_rng(0)
    rhs = rng.standard_normal(nb * B)
    strategies = sys.argv[2].split(",") if len(sys.argv) > 2 else (
        "none", "sort", "dynamic")
    for strat in strategies:
        Ls, Us, ds, growth = band_factor(Kd, Ks, strat)
        x = band_solve(Ls, Us, ds, rhs)
        r = rhs - K @ x
        res = [np.max(np.abs(r))]
        for _ in range(5):
            x = x + band_solve(Ls, Us, ds, r)
            r = rhs - K @ x
            res.append(np.max(np.abs(r)))
        print(f"{strat:8s}: growth {growth:.3e}  residuals "
              + " ".join(f"{v:.3e}" for v in res), flush=True)


if __name__ == "__main__":
    main()
