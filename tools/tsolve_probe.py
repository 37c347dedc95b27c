"""Probe: lane-tile width T of the prechunked bwb=1 solve kernels.

Times _band_solve_pre_batch at several T on bench-like shapes (L lanes,
nb block rows) on the real TPU, and checks every T's output — plus a
run-to-run determinism repeat — against a KNOWN-GOOD reference: the
per-lane _band_solve_ds_pre_impl vmap path (stated exact at every lane,
and independently verified against interpret mode).  Anchoring to the
per-lane path matters: T = 4 MISCOMPILES silently on v5e (wrong values,
no exception), so "first T that runs" would make the broken kernel the
baseline and invert the verdict (round-2 advisor finding).

The factor kernel's sweep measured 44.0 / 42.7 / 40.5 ms at
T = 4 / 8 / 16 — this asks the same question for the solves
(currently T_SOLVE = 8).

Usage: python tools/tsolve_probe.py
"""

import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    import jax
    import jax.numpy as jnp
    jax.config.update("jax_enable_x64", True)
    from eicos_tpu.ops.pallas_band_ds import (
        KP, B, _band_factor_pre_batch, _band_solve_ds_pre_impl,
        _band_solve_pre_batch)

    # R = 32: at the documented ~30 ms tunnel round trip per call, R = 8
    # added ~4 ms (~10%) to each per-solve figure (rep-division bias)
    R = 32
    L, nb = 128, 16
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
    pre = jax.jit(_band_factor_pre_batch)(jnp.asarray(Kd), jnp.asarray(Ks))
    rhs = jnp.asarray(rng.standard_normal((L, KP, nb * B)))

    # known-good reference: the per-lane kernel, one lane at a time
    ref = np.asarray(jax.device_get(jax.jit(
        jax.vmap(_band_solve_ds_pre_impl))(pre, rhs)))
    print(f"reference: per-lane _band_solve_ds_pre_impl vmap "
          f"(L={L}, nb={nb})", flush=True)

    # f64 ground truth: the chunks are exact multiples of their grid, so
    # L and Dinv reconstruct exactly in f64; the band solve then runs in
    # numpy f64 (errors ~2^-52 << the kernels' ~2^-48 target, so this
    # ranks the hardware paths' accuracy)
    def recon(stacked, srow, axis):
        s = np.asarray(jax.device_get(srow))[:, :, 0, :]   # (L, nb, B)
        sn = np.asarray(jax.device_get(stacked), np.float64)
        nch = sn.shape[-2] // B
        tot = np.zeros((L, nb, B, B))
        for t in range(nch):
            tot += sn[:, :, t * B:(t + 1) * B, :]
        return tot * (s[:, :, None, :] if axis == 1 else s[:, :, :, None])

    Lm = recon(pre.lc0, pre.ls0, axis=1)     # chunked along axis -2
    Xm = recon(pre.dc0, pre.ds0, axis=1)
    dv = (np.asarray(jax.device_get(pre.dh), np.float64)[:, :, 0, :]
          + np.asarray(jax.device_get(pre.dl), np.float64)[:, :, 0, :])
    r = np.asarray(jax.device_get(rhs)).reshape(L, KP, nb, B)
    y = np.zeros((L, nb, KP, B))
    for k in range(nb):
        t = r[:, :, k] - (0 if k == 0 else
                          np.einsum("lrb,lbc->lrc", y[:, k - 1],
                                    np.swapaxes(Lm[:, k], 1, 2)))
        y[:, k] = np.einsum("lrb,lbc->lrc", t, np.swapaxes(Xm[:, k], 1, 2))
    w = y / dv[:, :, None, :]
    z = np.zeros((L, nb, KP, B))
    for k in range(nb - 1, -1, -1):
        t = w[:, k] - (0 if k == nb - 1 else
                       np.einsum("lrb,lbc->lrc", z[:, k + 1], Lm[:, k + 1]))
        z[:, k] = np.einsum("lrb,lbc->lrc", t, Xm[:, k])
    truth = z.transpose(0, 2, 1, 3).reshape(L, KP, nb * B)
    scale = np.maximum(np.abs(truth), 1e-300)
    err_ref = float(np.max(np.abs(ref - truth) / scale))
    print(f"per-lane vs f64 truth: max rel err {err_ref:.3e}", flush=True)

    for T in (4, 8, 16):
        run = jax.jit(lambda pre, rhs, T=T: jax.lax.fori_loop(
            0, R,
            lambda i, acc: acc + _band_solve_pre_batch(
                pre, rhs + acc * 1e-30, T=T)[0, 0, 0],
            jnp.float64(0.0)))
        try:
            out = run(pre, rhs)
            float(np.asarray(jax.device_get(out)))
        except Exception as e:
            print(f"T={T:2d}: FAILED {type(e).__name__}: {str(e)[:200]}",
                  flush=True)
            continue
        ts = []
        for _ in range(3):
            t0 = time.time()
            out = run(pre, rhs)
            float(np.asarray(jax.device_get(out)))
            ts.append(time.time() - t0)
        t = min(ts) / R * 1e3
        # bit-identity vs the per-lane reference (the tiling must change
        # scheduling only), and run-to-run determinism of the tiled kernel
        full = jax.jit(lambda pre, rhs, T=T: _band_solve_pre_batch(
            pre, rhs, T=T))
        fv1 = np.asarray(jax.device_get(full(pre, rhs)))
        fv2 = np.asarray(jax.device_get(full(pre, rhs)))
        same = bool(np.array_equal(ref, fv1))
        det = bool(np.array_equal(fv1, fv2))
        dref = float(np.max(np.abs(fv1 - ref) / scale))
        dtru = float(np.max(np.abs(fv1 - truth) / scale))
        print(f"T={T:2d}: {t:7.2f} ms/solve-call  bit-identical-to-ref="
              f"{same}  deterministic={det}  relerr vs ref {dref:.3e} "
              f"vs truth {dtru:.3e}", flush=True)


if __name__ == "__main__":
    main()
