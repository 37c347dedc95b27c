"""Pallas leaf kernel (ops/pallas_leaf.py) vs the pure-JAX leaf, run in
interpreter mode on CPU.  On real TPU hardware the compiled kernel is
exercised by the solver itself when factor_dtype=float32."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

import eicos_tpu  # noqa: F401
from eicos_tpu.ops.ldl import _unblocked_ldl, _unit_lower_inv
from eicos_tpu.ops.pallas_leaf import B, leaf_ldl_pallas


def _random_blocks(nb, rng, diag=3.0):
    out = []
    for _ in range(nb):
        M = (rng.standard_normal((B, B)) / np.sqrt(B)).astype(np.float32)
        out.append(((M + M.T) / 2 + diag * np.eye(B)).astype(np.float32))
    return jnp.asarray(np.stack(out))


def test_interpret_matches_pure_jax(rng):
    """Same factorization up to f32 summation-order noise; compared via
    reconstruction K ~= L D L' (elementwise pivot comparison amplifies
    cancellation noise on small pivots)."""
    Ms = _random_blocks(3, rng)
    Linv, d = leaf_ldl_pallas(Ms, interpret=True)
    for i in range(3):
        L = np.linalg.inv(np.asarray(Linv[i], np.float64))
        rec = (L * np.asarray(d[i], np.float64)[None, :]) @ L.T
        scale = np.max(np.abs(np.asarray(Ms[i])))
        assert np.max(np.abs(rec - np.asarray(Ms[i]))) < 5e-4 * scale
        # pure-JAX leaf agrees at the same quality
        L0, d0 = _unblocked_ldl(Ms[i])
        Linv0 = _unit_lower_inv(L0)
        np.testing.assert_allclose(np.asarray(d[i]), np.asarray(d0),
                                   rtol=5e-3, atol=1e-3)
        np.testing.assert_allclose(np.asarray(Linv[i]), np.asarray(Linv0),
                                   rtol=5e-3, atol=5e-3)


def test_interpret_quasidefinite(rng):
    """Mixed-sign pivots (the quasidefinite case the solver feeds it)."""
    M = rng.standard_normal((B, B)).astype(np.float32)
    Q = (M @ M.T) / B + np.eye(B, dtype=np.float32)
    sign = np.ones(B, dtype=np.float32)
    sign[B // 2:] = -1.0
    K = (Q * sign[None, :] + Q.T * sign[:, None]) / 2
    K = K + np.diag(sign) * 2.0
    Ms = jnp.asarray(K[None].astype(np.float32))
    Linv, d = leaf_ldl_pallas(Ms, interpret=True)
    # reconstruct: K ~= L D L' with L = inv(Linv)
    L = np.linalg.inv(np.asarray(Linv[0], np.float64))
    rec = (L * np.asarray(d[0], np.float64)[None, :]) @ L.T
    np.testing.assert_allclose(rec, K, rtol=5e-3, atol=5e-3)
