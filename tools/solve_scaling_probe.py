"""Probe what the bwb=1 solve kernels actually pay for: vary lanes and
nb, time fwd-only vs fwd+bwd vs a trivial passthrough kernel with the
same grid/specs, to separate per-program overhead from compute.

Usage: python tools/solve_scaling_probe.py
"""

import functools
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
    import jax
    import jax.numpy as jnp
    jax.config.update("jax_enable_x64", True)
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu
    from eicos_tpu.ops.pallas_band_ds import (
        KP, B, _band_factor_ds_batch, band_solve_ds)

    R = 4

    def make_fac(L, nb):
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
        fac = jax.jit(_band_factor_ds_batch)(jnp.asarray(Kd),
                                             jnp.asarray(Ks))
        rhs = jnp.asarray(rng.standard_normal((L, KP, nb * B)))
        return fac, rhs

    # 1) full solve at several lane counts
    for L, nb in [(128, 16), (32, 16), (128, 4)]:
        fac, rhs = make_fac(L, nb)

        @jax.jit
        def run(fac, rhs):
            def body(i, acc):
                out = jax.vmap(band_solve_ds)(fac, rhs + acc * 1e-30)
                return acc + out[0, 0, 0]
            return jax.lax.fori_loop(0, R, body, jnp.float64(0.0))

        t = timed(run, fac, rhs)
        npr = L * nb
        print(f"solve L={L:4d} nb={nb:3d}: {t / R * 1e3:8.2f} ms "
              f"({t / R / npr * 1e6:6.2f} us/prog)", flush=True)

    # 2) passthrough kernel with identical specs (measures grid+DMA cost)
    def _pass_kernel(lbh_ref, lbl_ref, dih_ref, dil_ref, dh_ref, dl_ref,
                     xh_ref, xl_ref, wh_ref, wl_ref, c_yh, c_yl):
        k = pl.program_id(0)

        @pl.when(k == 0)
        def _init():
            c_yh[...] = jnp.zeros_like(c_yh)
            c_yl[...] = jnp.zeros_like(c_yl)

        wh_ref[...] = (xh_ref[...]
                       + dih_ref[...][:, :KP] * c_yh[...][None])
        wl_ref[...] = (xl_ref[...]
                       + dil_ref[...][:, :KP] * c_yl[...][None])
        c_yh[...] = wh_ref[...][0]
        c_yl[...] = wl_ref[...][0]

    @functools.partial(jax.jit, static_argnames=())
    def passthrough(fac, rhs_t):
        Lh, Ll, Dih, Dil, dh, dl = fac
        nb = Lh.shape[0]
        xh = rhs_t.astype(jnp.float32).reshape(KP, nb, B).transpose(1, 0, 2)
        xl = xh * 0
        spec_bb = pl.BlockSpec((1, B, B), lambda i: (i, 0, 0),
                               memory_space=pltpu.VMEM)
        spec_d = pl.BlockSpec((1, 8, B), lambda i: (i, 0, 0),
                              memory_space=pltpu.VMEM)
        spec_x = pl.BlockSpec((1, KP, B), lambda i: (i, 0, 0),
                              memory_space=pltpu.VMEM)
        out_sh = (jax.ShapeDtypeStruct((nb, KP, B), jnp.float32),) * 2
        arb = pltpu.CompilerParams(dimension_semantics=("arbitrary",))
        with jax.enable_x64(False):
            wh, wl = pl.pallas_call(
                _pass_kernel, grid=(nb,),
                in_specs=[spec_bb] * 4 + [spec_d] * 2 + [spec_x] * 2,
                out_specs=(spec_x, spec_x), out_shape=out_sh,
                scratch_shapes=[pltpu.VMEM((KP, B), jnp.float32)] * 2,
                compiler_params=arb,
            )(Lh, Ll, Dih, Dil, dh, dl, xh, xl)
        return wh.astype(jnp.float64) + wl.astype(jnp.float64)

    for L, nb in [(128, 16)]:
        fac, rhs = make_fac(L, nb)

        @jax.jit
        def runp(fac, rhs):
            def body(i, acc):
                out = jax.vmap(passthrough)(fac, rhs + acc * 1e-30)
                return acc + out[0, 0, 0]
            return jax.lax.fori_loop(0, R, body, jnp.float64(0.0))

        t = timed(runp, fac, rhs)
        npr = L * nb
        print(f"pass  L={L:4d} nb={nb:3d}: {t / R * 1e3:8.2f} ms "
              f"({t / R / npr * 1e6:6.2f} us/prog)", flush=True)


if __name__ == "__main__":
    main()
