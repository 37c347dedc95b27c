"""Offline laboratory for the banded-endgame growth pathology.

Rebuilds the EXACT endgame KKT of a stalled bench lane from the solver's
returned final iterate (Solution.info holds the pre-backscale x/y/z/s in
the equilibrated space), slices it into the RCM band blocks the kernels
consume, and measures elimination growth + backsolve residual + f64-IR
contraction for candidate pivot strategies — all in numpy, no TPU.

Strategies (within-block symmetric permutations only: the solve kernels
consume (Dinv, d) purely through the identity D^{-1} = U' d^{-1} U with
U = L^{-1} P, so any within-leaf permutation can be folded into the
returned U without touching the kernels):

  none     the current unpivoted natural order
  sort     per-block pre-sort by initial |diag| descending
  dynamic  per-block argmax-|diag| pivoting (recomputed each step)
  xfirst   static: x rows before y rows within each block
  ysplit   like xfirst but y rows in original relative order

Usage:
  python tools/pivot_lab.py --lane 185 --batch 256

ROUND-3 CONCLUSION (measured, closes the pivoting question):
On the TPU-captured stall iterate (--tpu, lane 185: exit 10 at gap
4.3e-5, NT span 4.9e17) the linear algebra is NOT fixable by ordering:

  exact np.linalg.solve residual on a unit rhs:  2.3e-5   <- the floor
  band-RCM order     growth 2.3e7, IR floor ~5e-5
  within-leaf argmax growth 1.4e7, IR floor ~2e-6 (pre-stall iterate)
  natural x-then-y   growth 3.9e7, IR floor ~6e-5
  constrained (each y row after its last x-support col, bw 20 -> still
  bwb=1)             growth 2.9e7, IR floor ~5e-5

Every order, including the dense natural one, floors AT the exact-solve
floor: the endgame matrix itself (cond ~5e11, norm ~2e10) caps f64
solve quality, and the banded factor already achieves it.  The round-2
note "residual 6e1 in exact f64 under the band order" did not
reproduce with this lab's faithful kernel dataflow and is superseded.
The 1-in-256 stall is TRAJECTORY path-dependence — accumulated last-ulp
rounding steering the iterate sequence into (or past) a marginal
endgame corner; banded/reduced/full each stall on DIFFERENT rare lanes
(tools/stall_repro.py, __graft_entry__ SOCP lane measurements).
Production answer: the vectorized rescue pass (api.BatchedSolver
rescue=, one gathered fallback sub-batch) + the exit-time exact-f64
certificate recheck (solver.solve tail).  Panel-local argmax pivoting
in the kernel was separately tried and REJECTED on hardware
(ops/pallas_band_ds._leaf_eliminate_blocked_b docstring).
"""

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def leaf_factor(M, strategy, sign_order=None):
    """Returns (U, d) with M^{-1} = U' diag(1/d) U, plus growth."""
    B = M.shape[0]
    if strategy == "none":
        order = np.arange(B)
        dynamic = False
    elif strategy == "sort":
        order = np.argsort(-np.abs(np.diag(M)), kind="stable")
        dynamic = False
    elif strategy == "dynamic":
        order = None
        dynamic = True
    elif strategy in ("xfirst", "ysplit"):
        assert sign_order is not None
        order = sign_order
        dynamic = False
    else:
        raise ValueError(strategy)

    # explicit elimination that records pivots
    Mw = M.copy().astype(np.float64)
    eliminated = np.zeros(B, bool)
    Lfull = np.zeros((B, B))
    perm = []
    dvals = []
    growth = np.max(np.abs(Mw))
    for step in range(B):
        if dynamic:
            dmag = np.abs(np.diag(Mw)).copy()
            dmag[eliminated] = -1.0
            j = int(np.argmax(dmag))
        else:
            j = int(order[step])
        dj = Mw[j, j]
        if abs(dj) < 1e-30:
            dj = np.copysign(1e-30, 1.0 if dj == 0 else dj)
        col = Mw[:, j].copy()
        col[eliminated] = 0.0
        lcol = col / dj
        lcol[j] = 0.0
        Mw -= np.outer(lcol * dj, lcol)
        Mw[j, :] = 0.0
        Mw[:, j] = 0.0
        Lfull[:, step] = lcol
        Lfull[j, step] = 1.0
        perm.append(j)
        dvals.append(dj)
        eliminated[j] = True
        if step < B - 1:
            growth = max(growth, np.max(np.abs(Mw)))
    # M = Lfull diag(d) Lfull' (columns in elimination order) =>
    # M^{-1} = U' d^{-1} U with U = Lfull^{-1}
    U = np.linalg.inv(Lfull)
    return U, np.array(dvals), growth


def band_factor(Kd, Ks, strategy, sign_orders=None):
    """Block-tridiagonal LDL^T replicating the kernel dataflow.
    Kd: (nb, B, B); Ks: (nb, B, B) with Ks[0] ignored.
    Returns (Ls, Us, ds, growth)."""
    nb, B, _ = Kd.shape
    Us, ds, Ls = [], [], []
    growth = 0.0
    Uprev = np.zeros((B, B))
    dprev = np.ones(B)
    for k in range(nb):
        if k == 0:
            Lk = np.zeros((B, B))
            M = Kd[0]
        else:
            # L = Ks U' d^-1 ; Schur: Kd - (L d) L'
            Lk = (Ks[k] @ Uprev.T) / dprev[None, :]
            M = Kd[k] - (Lk * dprev[None, :]) @ Lk.T
        growth = max(growth, np.max(np.abs(M)))
        so = sign_orders[k] if sign_orders is not None else None
        U, d, g = leaf_factor(M, strategy, sign_order=so)
        growth = max(growth, g)
        Us.append(U)
        ds.append(d)
        Ls.append(Lk)
        Uprev, dprev = U, d
    return Ls, Us, ds, growth


def band_solve(Ls, Us, ds, rhs):
    nb = len(Us)
    B = Us[0].shape[0]
    xb = rhs.reshape(nb, B)
    ys = []
    yprev = np.zeros(B)
    for k in range(nb):
        u = xb[k] - Ls[k] @ yprev if k else xb[k]
        y = Us[k] @ u
        ys.append(y)
        yprev = y
    zs = [None] * nb
    znext = np.zeros(B)
    for k in range(nb - 1, -1, -1):
        # Lstored already carries the d^{-1} column scaling:
        # z_k = U'(y_k/d_k - Lstored_{k+1}' z_{k+1})
        w = ys[k] / ds[k]
        if k < nb - 1:
            w = w - Ls[k + 1].T @ znext
        z = Us[k].T @ w
        zs[k] = z
        znext = z
    return np.concatenate(zs)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--lane", type=int, required=True)
    ap.add_argument("--batch", type=int, default=256)
    ap.add_argument("--save", default="")
    ap.add_argument("--tpu", action="store_true",
                    help="solve on the TPU (ds kernels) to capture the "
                         "kernel trajectory's stalling iterate; strategy "
                         "experiments still run host-side in numpy")
    ap.add_argument("--skip-experiments", action="store_true")
    args = ap.parse_args()

    import jax
    if not args.tpu:
        jax.config.update("jax_platforms", "cpu")
    jax.config.update("jax_enable_x64", True)

    os.environ.setdefault("EICOS_BENCH_BATCH", str(args.batch))
    import bench
    from eicos_tpu import cones
    from eicos_tpu.equilibrate import equilibrate
    from eicos_tpu.settings import Settings
    from eicos_tpu.solver import solve

    st, probs, batch, shared = bench.build_batch()
    prob = probs[args.lane]
    settings = Settings(kkt_strategy="banded")
    sol = solve(st, prob, settings)
    w = sol.info
    print(f"lane {args.lane}: exit {int(sol.exit_code)} after "
          f"{int(w.iter)} iters, gap {float(w.gap):.3e}, "
          f"pres {float(w.pres):.3e} dres {float(w.dres):.3e}",
          flush=True)

    # rebuild the endgame KKT: equilibrated data + NT scaling at (s, z)
    eq = equilibrate(st, prob.G, prob.A, prob.c, prob.h, prob.b,
                     iters=settings.equil_iters)
    G = np.asarray(eq.G)
    A = np.asarray(eq.A)
    s = np.asarray(w.s)
    z = np.asarray(w.z)
    scal, _ = cones.update_scalings(st.cone, s, z)
    v_lp = np.asarray(scal.v_lp)
    delta = settings.deltastat
    winv = 1.0 / (v_lp + delta)
    print(f"NT scaling span: {v_lp.max():.3e} / {v_lp.min():.3e} "
          f"= {v_lp.max() / v_lp.min():.3e}", flush=True)
    n, p = st.n, st.p
    H = (G.T * winv[None, :]) @ G + delta * np.eye(n)
    D = n + p
    K = np.zeros((D, D))
    K[:n, :n] = H
    K[:n, n:] = A.T
    K[n:, :n] = A
    K[n:, n:] = -delta * np.eye(p)
    plan = st.band
    perm = np.asarray(plan.perm)
    Dp = plan.dim
    Kp = np.zeros((Dp, Dp))
    Kp[:D, :D] = K
    Kp[D:, D:] = np.eye(Dp - D)
    Kp = Kp[np.ix_(perm, perm)]
    B = plan.block
    nb = Dp // B
    Kb = Kp.reshape(nb, B, nb, B).transpose(0, 2, 1, 3)
    Kd = Kb[np.arange(nb), np.arange(nb)]
    Ks = np.zeros((nb, B, B))
    Ks[1:] = Kb[np.arange(1, nb), np.arange(nb - 1)]
    # verify bandedness
    off = 0.0
    for i in range(nb):
        for j in range(nb):
            if abs(i - j) > 1:
                off = max(off, np.max(np.abs(Kb[i, j])))
    print(f"off-band max: {off:.3e} (must be 0)", flush=True)
    if args.save:
        np.savez(args.save, Kd=Kd, Ks=Ks, K=Kp, perm=perm)

    # sign orders: x rows first within each block (static)
    is_y = perm >= n     # y rows (and padding rows, which are identity)
    is_pad = perm >= D
    sign_orders = []
    for k in range(nb):
        blk = slice(k * B, (k + 1) * B)
        yk = is_y[blk]
        loc = np.arange(B)
        sign_orders.append(np.concatenate([loc[~yk], loc[yk]]))

    if args.skip_experiments:
        return
    rng = np.random.default_rng(0)
    rhs = rng.standard_normal(Dp)
    for strat in ("none", "sort", "dynamic", "xfirst"):
        so = sign_orders if strat == "xfirst" else None
        Ls, Us, ds, growth = band_factor(Kd, Ks, strat, sign_orders=so)
        x = band_solve(Ls, Us, ds, rhs)
        r = rhs - Kp @ x
        # two IR rounds to measure contraction
        res = [np.max(np.abs(r))]
        for _ in range(3):
            x = x + band_solve(Ls, Us, ds, r)
            r = rhs - Kp @ x
            res.append(np.max(np.abs(r)))
        print(f"{strat:8s}: growth {growth:.3e}  residuals "
              + " ".join(f"{v:.3e}" for v in res), flush=True)


if __name__ == "__main__":
    main()
