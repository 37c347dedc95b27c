"""Per-product ds_matmul cost INSIDE one kernel: production vs 7-bit.

tools/c7_probe.py timed one product per pallas launch — the ~65 us
launch + ~65 us scan-iteration fixed costs swamp the per-product
difference.  Real kernels (_band_factor, _fwd/_bwd solve) run tens of
ds products per launch.  Here one kernel runs ``REP`` products in an
unrolled loop (output fed back through a renorm so nothing folds away),
so the marginal per-product cost is (t(REP=64) - t(REP=8)) / 56.

Run on TPU: python tools/c7_inner_probe.py
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import jax
import jax.numpy as jnp
from jax import lax
from jax.experimental import pallas as pl

from eicos_tpu.ops.pallas_band_ds import ds_matmul
from tools.c7_probe import matmul_c7


def make_kern(matmul, rep):
    def kern(ah_ref, al_ref, bh_ref, bl_ref, oh_ref, ol_ref):
        ah, al = ah_ref[...], al_ref[...]
        for _ in range(rep):
            oh, ol = matmul(ah, al, bh_ref[...], bl_ref[...])
            # feed back: keep magnitude stable, break CSE
            ah = ah + oh * 1e-30
            al = al + ol * 1e-30
        oh_ref[...] = ah
        ol_ref[...] = al
    return kern


def _time(f, args, reps=32):
    g = jax.jit(f)
    r = g(*args)
    # tunnel gotcha: block_until_ready returns early; force a fetch
    float(jax.device_get(r[0][0, 0]))
    t0 = time.time()
    for _ in range(reps):
        r = g(*args)
    float(jax.device_get(r[0][0, 0]))
    return (time.time() - t0) / reps * 1e6


def run(M, K, N):
    rng = np.random.default_rng(0)
    a = rng.standard_normal((M, K)).astype(np.float32)
    b = rng.standard_normal((K, N)).astype(np.float32)
    z = np.zeros_like(a, np.float32)
    zb = np.zeros_like(b, np.float32)
    args = tuple(map(jnp.asarray, (a, z, b, zb)))
    msg = []
    for name, mm in (("bf16", ds_matmul), ("c7", matmul_c7)):
        ts = {}
        for rep in (8, 64):
            f = pl.pallas_call(
                make_kern(mm, rep),
                out_shape=(jax.ShapeDtypeStruct((M, K), jnp.float32),) * 2)
            with jax.enable_x64(False):
                ts[rep] = _time(f, args)
        marg = (ts[64] - ts[8]) / 56.0
        msg.append(f"{name}: t8={ts[8]:.0f} t64={ts[64]:.0f} "
                   f"marg={marg:.2f}us/prod")
    print(f"({M},{K},{N}): " + "; ".join(msg))


def main():
    for shape in ((16, 128, 128), (128, 128, 128), (16, 256, 256)):
        run(*shape)


if __name__ == "__main__":
    main()
