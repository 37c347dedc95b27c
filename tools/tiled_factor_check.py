"""Hardware check: lane-tiled bwb=1 factor kernel vs per-lane kernel.

Compares outputs lane-by-lane (the tiled kernel runs the same arithmetic
on (T, ., .) slabs, so hi parts should agree to the last ulp) and times
both at the bench LP-lane shape.

Usage: python tools/tiled_factor_check.py [--lanes 128] [--nb 16]
"""

import argparse
import sys
import time

import numpy as np

sys.path.insert(0, __import__("os").path.dirname(
    __import__("os").path.dirname(__import__("os").path.abspath(__file__))))


def timed(fn, *args, reps=3):
    import jax
    out = fn(*args)
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
    ap.add_argument("--nb", type=int, default=16)
    ap.add_argument("--reps", type=int, default=3)
    ap.add_argument("--inner", type=int, default=2)
    ap.add_argument("--skip-single", action="store_true")
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp
    jax.config.update("jax_enable_x64", True)
    from eicos_tpu.ops.pallas_band_ds import (
        _band_factor_ds_impl, _band_factor_ds_batch)

    nb, B, L = args.nb, 128, args.lanes
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

    # correctness on a small slice
    ns = min(L, 8)
    ref = jax.jit(jax.vmap(_band_factor_ds_impl))(Kd[:ns], Ks[:ns])
    got = jax.jit(_band_factor_ds_batch)(Kd[:ns], Ks[:ns])
    names = ["Lh", "Ll", "Dinvh", "Dinvl", "dh", "dl"]
    for nm, r, g in zip(names, ref, got):
        r = np.asarray(jax.device_get(r), np.float64)
        g = np.asarray(jax.device_get(g), np.float64)
        scale = np.abs(r).max() + 1e-30
        err = np.abs(r - g).max() / scale
        print(f"{nm:6s} rel-err {err:.3e} (scale {scale:.3e})", flush=True)
        assert err < 1e-5, (nm, err)
    # reconstruct d*X accuracy per lane: combine hi+lo and compare
    d_ref = ref[4][..., 0, :].astype(np.float64) + ref[5][..., 0, :]
    d_got = got[4][..., 0, :].astype(np.float64) + got[5][..., 0, :]
    dd = np.abs(np.asarray(d_ref) - np.asarray(d_got))
    rel = dd / (np.abs(np.asarray(d_ref)) + 1e-30)
    print(f"combined d rel-err max {rel.max():.3e}", flush=True)
    print("correctness OK", flush=True)

    R = args.inner

    @jax.jit
    def run_tiled(Kd, Ks):
        def body(i, acc):
            fac = _band_factor_ds_batch(Kd + acc * 1e-30, Ks)
            return acc + fac[0][0, 0, 0, 0]
        return jax.lax.fori_loop(0, R, body, jnp.float32(0.0))

    t = timed(run_tiled, Kd, Ks, reps=args.reps)
    print(f"tiled factor : {t / R * 1e3:8.2f} ms / call "
          f"({L} lanes, nb={nb})", flush=True)

    if not args.skip_single:
        @jax.jit
        def run_single(Kd, Ks):
            def body(i, acc):
                fac = jax.vmap(_band_factor_ds_impl)(Kd + acc * 1e-30, Ks)
                return acc + fac[0][0, 0, 0, 0]
            return jax.lax.fori_loop(0, R, body, jnp.float32(0.0))

        t = timed(run_single, Kd, Ks, reps=args.reps)
        print(f"single factor: {t / R * 1e3:8.2f} ms / call", flush=True)


if __name__ == "__main__":
    main()
