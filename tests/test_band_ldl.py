"""Block-banded LDL^T (ops/band_ldl.py) against dense oracles on banded
quasidefinite matrices — the RCM-permuted reduced-KKT class."""

import numpy as np
import pytest

import jax.numpy as jnp

import eicos_tpu  # noqa: F401
from eicos_tpu.ops.band_ldl import (band_blocks, band_ldl_factor,
                                    band_ldl_solve)
from eicos_tpu.ops.ldl import pad_to_block


def banded_quasidefinite(D, bw, n_pos, rng):
    """Banded [E B'; B -F]-style quasidefinite matrix (bandwidth bw)."""
    K = np.zeros((D, D))
    for i in range(D):
        lo = max(0, i - bw)
        K[i, lo:i] = 0.3 * rng.standard_normal(i - lo) / np.sqrt(bw + 1)
    K = K + K.T
    sign = np.where(np.arange(D) < n_pos, 1.0, -1.0)
    K[np.arange(D), np.arange(D)] = sign * (np.abs(
        rng.standard_normal(D)) + 2.0)
    return K


def pad_banded(K, block=128):
    D = K.shape[0]
    Dp = pad_to_block(D, block)
    Kp = np.eye(Dp)
    Kp[:D, :D] = K
    return Kp


@pytest.mark.parametrize("D,bw", [(200, 40), (520, 130), (300, 299)])
def test_band_solve_matches_dense(D, bw, rng):
    K = banded_quasidefinite(D, bw, n_pos=D // 2, rng=rng)
    Kp = pad_banded(K)
    bwb = band_blocks(bw)
    fac = band_ldl_factor(jnp.asarray(Kp), bwb)
    b = np.zeros(Kp.shape[0])
    b[:D] = rng.standard_normal(D)
    x = np.asarray(band_ldl_solve(fac, jnp.asarray(b), bwb))
    np.testing.assert_allclose(Kp @ x, b, rtol=1e-8, atol=1e-8)
    # factor matches a dense solve
    x_dense = np.linalg.solve(Kp, b)
    np.testing.assert_allclose(x, x_dense, rtol=1e-7, atol=1e-8)


def test_band_multirhs(rng):
    D, bw = 260, 70
    K = banded_quasidefinite(D, bw, n_pos=100, rng=rng)
    Kp = pad_banded(K)
    bwb = band_blocks(bw)
    fac = band_ldl_factor(jnp.asarray(Kp), bwb)
    Br = np.zeros((Kp.shape[0], 3))
    Br[:D] = rng.standard_normal((D, 3))
    X = np.asarray(band_ldl_solve(fac, jnp.asarray(Br), bwb))
    np.testing.assert_allclose(Kp @ X, Br, rtol=1e-8, atol=1e-8)


def test_band_full_width_equals_dense_path(rng):
    """bwb >= nb degenerates to a dense factorization — same answers."""
    from eicos_tpu.ops.ldl import ldl_factor, ldl_solve

    D = 250
    K = banded_quasidefinite(D, D - 1, n_pos=125, rng=rng)
    Kp = pad_banded(K)
    nb = Kp.shape[0] // 128
    fac_b = band_ldl_factor(jnp.asarray(Kp), nb)
    fac_d = ldl_factor(jnp.asarray(Kp))
    b = np.zeros(Kp.shape[0])
    b[:D] = rng.standard_normal(D)
    xb = np.asarray(band_ldl_solve(fac_b, jnp.asarray(b), nb))
    xd = np.asarray(ldl_solve(fac_d, jnp.asarray(b)))
    np.testing.assert_allclose(xb, xd, rtol=1e-9, atol=1e-10)
