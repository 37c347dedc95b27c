"""Ozaki-scheme float64 matmul on MXU-style bf16 arithmetic
(eicos_tpu/ops/f64mm.py): accuracy against native f64 across dynamic
ranges, shapes, and degenerate inputs."""

import numpy as np
import pytest

import eicos_tpu  # noqa: F401  (x64 on)
import jax.numpy as jnp

from eicos_tpu.ops.f64mm import matmul_f64_mxu


@pytest.mark.parametrize("m,k,n,scale", [
    (37, 100, 23, 1.0),
    (64, 1024, 50, 1e6),
    (10, 4096, 8, 1e-8),
    (5, 17, 4, 1.0),
])
def test_accuracy(m, k, n, scale, rng):
    A = rng.standard_normal((m, k)) * scale
    B = rng.standard_normal((k, n)) / scale
    A[0] *= 1e12   # wide per-row dynamic range
    A[1] *= 1e-12
    C = np.asarray(matmul_f64_mxu(jnp.asarray(A), jnp.asarray(B)))
    denom = np.abs(A) @ np.abs(B) + 1e-300
    rel = np.max(np.abs(C - A @ B) / denom)
    assert rel < 1e-13, rel


def test_batched_lhs(rng):
    A = rng.standard_normal((4, 2, 100))
    B = rng.standard_normal((100, 7))
    C = np.asarray(matmul_f64_mxu(jnp.asarray(A), jnp.asarray(B)))
    np.testing.assert_allclose(C, A @ B, rtol=1e-13, atol=1e-13)


def test_zeros(rng):
    A = np.zeros((3, 50))
    A[0, :] = rng.standard_normal(50)
    B = np.zeros((50, 3))
    C = np.asarray(matmul_f64_mxu(jnp.asarray(A), jnp.asarray(B)))
    assert np.all(C == 0.0)


def test_contraction_limit():
    with pytest.raises(AssertionError):
        matmul_f64_mxu(jnp.zeros((2, 5000)), jnp.zeros((5000, 2)))


def test_sliced_operand_matches_native():
    """SlicedOperand (the presliced XLA-level form; kept as the
    portable fallback to the Pallas GEMV kernel) reproduces native f64
    products, including contraction lengths beyond one slice group
    (> 4096) and 1-D matvecs."""
    import numpy as np
    import jax
    import jax.numpy as jnp

    from eicos_tpu.ops.f64mm import SlicedOperand

    rng = np.random.default_rng(3)
    k, n = 4972, 257   # k > _K_MAX: exercises the group split
    b = rng.standard_normal((k, n)) * np.exp(rng.uniform(-6, 6, (k, 1)))
    a = rng.standard_normal((3, k)) * np.exp(rng.uniform(-4, 4, (3, 1)))
    op = SlicedOperand(jnp.asarray(b))
    out = np.asarray(jax.device_get(op.rmatmul(jnp.asarray(a))))
    ref = a @ b
    assert np.abs(out - ref).max() / np.abs(ref).max() < 1e-14
    v = np.asarray(jax.device_get(op.rmatmul(jnp.asarray(a[0]))))
    assert v.shape == (n,)
    assert np.abs(v - ref[0]).max() / np.abs(ref[0]).max() < 1e-13
