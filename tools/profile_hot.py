"""Hot-kernel microbenchmarks on the real TPU at bench-family shapes.

Times the three per-iteration costs of the banded double-single path in
isolation — factor kernel, solve kernels (fwd+bwd chains), H band
scatter+gather assembly — each amortized inside one jit (the axon tunnel
adds ~30 ms fixed dispatch+fetch latency per host round trip, and
block_until_ready returns early through the tunnel: timings force a
device->host scalar fetch).

Usage: python tools/profile_hot.py [--lanes 128] [--reps 8]
"""

import argparse
import functools
import sys
import time

import numpy as np

sys.path.insert(0, __import__("os").path.dirname(
    __import__("os").path.dirname(__import__("os").path.abspath(__file__))))


def timed(fn, *args, reps=3):
    out = fn(*args)
    import jax
    jax.block_until_ready(out)
    leaf = jax.tree_util.tree_leaves(out)[0]
    float(np.asarray(jax.device_get(leaf)).ravel()[0])
    ts = []
    for _ in range(reps):
        t0 = time.time()
        out = fn(*args)
        leaf = jax.tree_util.tree_leaves(out)[0]
        float(np.asarray(jax.device_get(leaf)).ravel()[0])
        ts.append(time.time() - t0)
    return min(ts)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--lanes", type=int, default=128)
    ap.add_argument("--reps", type=int, default=6)
    ap.add_argument("--inner", type=int, default=4,
                    help="kernel calls chained inside one jit")
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp
    jax.config.update("jax_enable_x64", True)
    from eicos_tpu.ops.pallas_band_ds import (KP, band_factor_ds,
                                              band_solve_ds)

    # bench LP-lane shape: n=1494, p=498 -> Dp=2048, nb=16
    nb, B, L = 16, 128, args.lanes
    rng = np.random.default_rng(0)
    Kd = np.zeros((L, nb, B, B))
    Ks = rng.standard_normal((L, nb, B, B)) * 0.3
    for k in range(nb):
        A = rng.standard_normal((L, B, B)) * 0.2
        s = (np.exp(rng.uniform(-8, 8, (L, B)))
             * np.sign(rng.standard_normal((L, B))))
        Kd[:, k] = (A + A.transpose(0, 2, 1)) / 2
        Kd[:, k] += np.einsum("lb,bc->lbc", s * 4, np.eye(B))
    Ks[:, 0] = 0
    Kd = jnp.asarray(Kd)
    Ks = jnp.asarray(Ks)
    R = args.inner

    @jax.jit
    def run_factor(Kd, Ks):
        def body(i, acc):
            fac = jax.vmap(band_factor_ds)(Kd + acc * 1e-30, Ks)
            return acc + fac[0][0, 0, 0, 0]
        return jax.lax.fori_loop(0, R, body, jnp.float32(0.0))

    t = timed(run_factor, Kd, Ks, reps=args.reps)
    print(f"factor   : {t / R * 1e3:8.2f} ms / call "
          f"({L} lanes, nb={nb})", flush=True)

    fac = jax.jit(jax.vmap(band_factor_ds))(Kd, Ks)
    rhs = jnp.asarray(rng.standard_normal((L, KP, nb * B)))

    @jax.jit
    def run_solve(fac, rhs):
        def body(i, acc):
            out = jax.vmap(band_solve_ds)(fac, rhs + acc * 1e-30)
            return acc + out[0, 0, 0]
        return jax.lax.fori_loop(0, R, body, jnp.float64(0.0))

    t = timed(run_solve, fac, rhs, reps=args.reps)
    print(f"solve    : {t / R * 1e3:8.2f} ms / call "
          f"(fwd+bwd, KP={KP})", flush=True)

    # H scatter assembly at the real bench structure (LP lane)
    from eicos_tpu import corpus, kkt
    from eicos_tpu.plan import make_band_plan
    st, base = corpus.make_mpc_like(horizon=249, nx=2, nu=4, seed=3)
    st = st.with_gsplit(base.G)
    plan = make_band_plan(st, base.G, base.A)
    st = st.with_band_plan(plan)
    n, p = st.n, st.p
    Dp = plan.dim
    permt = tuple(int(v) for v in plan.perm)
    split = st.gsplit
    idx = kkt._band_scatter_idx(n, p, Dp, permt, split.sing_cols,
                                split.spr_cols, split.spr_width, (), 0)
    (dmask, dih, dio), subs = kkt._band_gather_split(n, p, Dp, permt, 1)
    smask, sih, sio = subs[0]
    G = jnp.asarray(np.asarray(base.G))
    A = jnp.asarray(np.asarray(base.A))
    other = jnp.concatenate([A.reshape(-1),
                             jnp.asarray([-1e-7, 0.0, 1.0])])
    winv = jnp.asarray(np.abs(rng.standard_normal((L, st.m))) + 0.1)
    nbb2 = (Dp // 128) * 128 * 128

    @jax.jit
    def run_scatter(winv):
        def one(wl):
            vals = kkt._band_scatter_vals(st, split, G, wl, None, 1e-7,
                                          jnp.float64)
            buf = (jnp.zeros((2 * nbb2 + 1,), jnp.float64)
                   .at[jnp.asarray(idx)].add(vals))
            Kd = (jnp.where(dmask, 0.0, other[dio])
                  + buf[:nbb2].reshape(-1, 128, 128))
            Ksu = (jnp.where(smask, 0.0, other[sio])
                   + buf[nbb2:2 * nbb2].reshape(-1, 128, 128))
            return Kd, Ksu

        def body(i, acc):
            Kd, Ksu = jax.vmap(one)(winv + acc * 1e-30)
            return acc + Kd[0, 0, 0, 0]
        return jax.lax.fori_loop(0, R, body, jnp.float64(0.0))

    t = timed(run_scatter, winv, reps=args.reps)
    print(f"scatter  : {t / R * 1e3:8.2f} ms / call "
          f"(H assembly, {L} lanes)", flush=True)


if __name__ == "__main__":
    main()
