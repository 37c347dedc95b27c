"""Tests for the blocked dense LDL^T (ops/ldl.py) on quasidefinite matrices
of the KKT form [dI A'; A -dI] — the class the solver factors."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

import eicos_tpu  # noqa: F401
from eicos_tpu.ops.ldl import ldl_factor, ldl_solve, pad_to_block


def random_quasidefinite(D, n_pos, rng, delta=7e-8):
    """[E B'; B -F] with E, F SPD — strongly factorizable."""
    M = rng.standard_normal((D, D)) / np.sqrt(D)
    Epart = M[:n_pos] @ M[:n_pos].T + np.eye(n_pos)
    Fpart = M[n_pos:] @ M[n_pos:].T + np.eye(D - n_pos)
    B = rng.standard_normal((D - n_pos, n_pos))
    K = np.zeros((D, D))
    K[:n_pos, :n_pos] = Epart + delta * np.eye(n_pos)
    K[n_pos:, n_pos:] = -(Fpart + delta * np.eye(D - n_pos))
    K[n_pos:, :n_pos] = B
    K[:n_pos, n_pos:] = B.T
    return K


def pad(K, block=128):
    D = K.shape[0]
    Dp = pad_to_block(D, block)
    Kp = np.eye(Dp)
    Kp[:D, :D] = K
    return Kp


@pytest.mark.parametrize("D,npos", [(40, 17), (130, 60), (300, 120),
                                    (513, 200)])
def test_factor_reconstruction(D, npos, rng):
    K = random_quasidefinite(D, npos, rng)
    Kp = pad(K)
    fac = ldl_factor(jnp.asarray(Kp))
    Linv = np.asarray(fac.Linv)
    d = np.asarray(fac.d)
    # K = L D L' with L = Linv^{-1}
    L = np.linalg.inv(Linv)
    rec = (L * d[None, :]) @ L.T
    np.testing.assert_allclose(rec, Kp, rtol=1e-8, atol=1e-8)
    # Linv unit lower triangular
    assert np.allclose(np.triu(Linv, 1), 0.0)
    assert np.allclose(np.diag(Linv), 1.0)
    # quasidefinite sign pattern: first npos pivots +, rest - (padding +)
    assert np.all(d[:npos] > 0)
    assert np.all(d[npos:D] < 0)


@pytest.mark.parametrize("D,npos", [(40, 17), (300, 120)])
def test_solve(D, npos, rng):
    K = random_quasidefinite(D, npos, rng)
    Kp = pad(K)
    fac = ldl_factor(jnp.asarray(Kp))
    b = np.zeros(Kp.shape[0])
    b[:D] = rng.standard_normal(D)
    x = np.asarray(ldl_solve(fac, jnp.asarray(b)))
    np.testing.assert_allclose(Kp @ x, b, rtol=1e-8, atol=1e-8)
    # padding stays zero
    assert np.allclose(x[D:], 0.0)


def test_vmap_factor_solve(rng):
    D, npos, batch = 90, 40, 4
    Ks = np.stack([pad(random_quasidefinite(D, npos, rng))
                   for _ in range(batch)])
    bs = rng.standard_normal((batch, Ks.shape[-1]))
    bs[:, pad_to_block(D):] = 0

    def fs(K, b):
        return ldl_solve(ldl_factor(K), b)

    xs = np.asarray(jax.vmap(fs)(jnp.asarray(Ks), jnp.asarray(bs)))
    for i in range(batch):
        np.testing.assert_allclose(Ks[i] @ xs[i], bs[i], rtol=1e-8, atol=1e-8)


def test_float32_factor(rng):
    """float32 factorization is accurate enough to precondition IR."""
    D, npos = 120, 50
    K = pad(random_quasidefinite(D, npos, rng))
    fac = ldl_factor(jnp.asarray(K, jnp.float32))
    b = np.zeros(K.shape[0])
    b[:D] = rng.standard_normal(D)
    x = np.asarray(ldl_solve(fac, jnp.asarray(b, jnp.float32)))
    assert np.linalg.norm(K @ x - b) / np.linalg.norm(b) < 1e-4
