"""Unit tests for the dense substitution-solve kernels
(ops/pallas_dense_ds) and the substitution factor (ops/ldl
.ldl_factor_subst) — interpret mode, CPU backend (conftest pins it).

Reference semantics: these replace the explicit-inverse GEMM solves of
the Eigen-SimplicialLDLT counterpart (/root/reference/src/eicos.cpp:1477,
1599) on the TPU float64 dense path."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from eicos_tpu.ops.ldl import (ldl_factor, ldl_factor_subst, ldl_solve,
                               LDLSubstFactors)
from eicos_tpu.ops.pallas_band_ds import KP
from eicos_tpu.ops.pallas_dense_ds import (_dense_solve_batch,
                                           _dense_solve_impl,
                                           dense_solve_ds)


def _quasidefinite(rng, D, split=None):
    """Random symmetric quasidefinite matrix: PD leading block, ND
    trailing block, mild coupling — every leading principal pivot is
    bounded away from zero in any symmetric elimination order."""
    split = split if split is not None else (2 * D) // 3
    A1 = rng.standard_normal((split, split))
    A2 = rng.standard_normal((D - split, D - split))
    C = 0.1 * rng.standard_normal((D - split, split))
    K = np.zeros((D, D))
    K[:split, :split] = A1 @ A1.T + D * np.eye(split)
    K[split:, split:] = -(A2 @ A2.T + D * np.eye(D - split))
    K[split:, :split] = C
    K[:split, split:] = C.T
    return jnp.asarray(K)


def _solve_subst(fac: LDLSubstFactors, rhs, interpret=True):
    k = rhs.shape[1]
    Dp = rhs.shape[0]
    rhs_t = jnp.zeros((KP, Dp), rhs.dtype).at[:k].set(rhs.T)
    return dense_solve_ds(fac.pre, rhs_t, interpret=interpret)[:k].T


@pytest.mark.parametrize("D", [128, 384])
def test_subst_solve_matches_numpy(D):
    rng = np.random.default_rng(0)
    K = _quasidefinite(rng, D)
    rhs = jnp.asarray(rng.standard_normal((D, 3)))
    fac = ldl_factor_subst(K)
    x = np.asarray(_solve_subst(fac, rhs))
    x_ref = np.linalg.solve(np.asarray(K), np.asarray(rhs))
    err = np.linalg.norm(x - x_ref) / np.linalg.norm(x_ref)
    assert err < 1e-9, err


def test_subst_factor_pivots_match_inverse_factor():
    # the substitution recursion reuses _ldl_rec's L21/d arithmetic —
    # pivots must be bit-identical to ldl_factor's
    rng = np.random.default_rng(1)
    K = _quasidefinite(rng, 256)
    d_inv = np.asarray(ldl_factor(K).d)
    d_sub = np.asarray(ldl_factor_subst(K).d)
    assert np.array_equal(d_inv, d_sub)


def test_subst_solve_accuracy_class_matches_inverse():
    rng = np.random.default_rng(2)
    D = 256
    K = _quasidefinite(rng, D)
    rhs = jnp.asarray(rng.standard_normal((D, 2)))
    x_ref = np.linalg.solve(np.asarray(K), np.asarray(rhs))
    x_inv = np.asarray(ldl_solve(ldl_factor(K), rhs))
    x_sub = np.asarray(_solve_subst(ldl_factor_subst(K), rhs))
    e_inv = np.linalg.norm(x_inv - x_ref) / np.linalg.norm(x_ref)
    e_sub = np.linalg.norm(x_sub - x_ref) / np.linalg.norm(x_ref)
    # the ds substitution path must not be orders worse than the exact
    # f64 inverse path (both polished by refinement in the solver)
    assert e_sub < max(1e-9, 100 * e_inv), (e_sub, e_inv)


def test_batched_solve_matches_single_bitwise():
    rng = np.random.default_rng(3)
    D, L = 256, 3
    pres, rhss = [], []
    for i in range(L):
        K = _quasidefinite(rng, D)
        fac = ldl_factor_subst(K)
        pres.append(fac.pre)
        rhss.append(jnp.zeros((KP, D)).at[:2].set(
            jnp.asarray(rng.standard_normal((2, D)))))
    pre_b = jax.tree_util.tree_map(lambda *xs: jnp.stack(xs), *pres)
    rhs_b = jnp.stack(rhss)
    # T=2 exercises lane padding (L=3 -> Lp=4)
    out_b = np.asarray(_dense_solve_batch(pre_b, rhs_b, T=2,
                                          interpret=True))
    for i in range(L):
        out_1 = np.asarray(_dense_solve_impl(pres[i], rhss[i],
                                             interpret=True))
        assert np.array_equal(out_b[i], out_1), i


def test_bmatmul_ds_matches_f64():
    from eicos_tpu.ops import pallas_gemm_ds as pg

    rng = np.random.default_rng(4)
    L, r, k, n = 3, 37, 150, 77
    a = jnp.asarray(rng.standard_normal((L, r, k)))
    b = jnp.asarray(rng.standard_normal((L, k, n)))
    pg._BMM_INTERPRET = True
    try:
        out = np.asarray(pg._bmatmul_ds(a, b))
    finally:
        pg._BMM_INTERPRET = False
    ref = np.einsum("lrk,lkn->lrn", np.asarray(a), np.asarray(b))
    err = np.abs(out - ref).max() / np.abs(ref).max()
    assert err < 1e-12, err


def test_leaf_tiled_matches_single_bitwise():
    from eicos_tpu.ops.pallas_leaf_ds import (_leaf_ds_batch,
                                              leaf_ldl_pallas_ds)

    rng = np.random.default_rng(5)
    L = 3
    Ks = []
    for _ in range(L):
        A = rng.standard_normal((128, 128))
        Ks.append(A @ A.T + 128 * np.eye(128))
    Ks = jnp.asarray(np.stack(Ks))
    Linv_b, d_b = _leaf_ds_batch(Ks, T=2, interpret=True)
    for i in range(L):
        _, d1, Linv1 = leaf_ldl_pallas_ds(Ks[i][None], interpret=True)
        assert np.array_equal(np.asarray(d_b[i]), np.asarray(d1[0])), i
        assert np.array_equal(np.asarray(Linv_b[i]),
                              np.asarray(Linv1[0])), i


def test_prechunk_kernel_matches_xla_bitwise():
    from eicos_tpu.ops import pallas_dense_ds as pd

    rng = np.random.default_rng(6)
    # 1024 exercises nb % 8 == 0 (the zero-pad-free ls0 layout that
    # once emitted a zero-size concat operand Mosaic rejects)
    for L, Dp in ((3, 384), (2, 1024)):
        _check_prechunk(rng, L, Dp)


def _check_prechunk(rng, L, Dp):
    from eicos_tpu.ops import pallas_dense_ds as pd

    nb = Dp // 128
    Loff = np.zeros((L, Dp, Dp))
    for j in range(nb):
        lo = (j + 1) * 128
        Loff[:, lo:, j * 128:(j + 1) * 128] = rng.standard_normal(
            (L, Dp - lo, 128)) * 10.0 ** rng.integers(-6, 6, size=(L, 1, 1))
    Loff = jnp.asarray(Loff)
    ref = jax.vmap(pd._prechunk_cols_xla)(Loff)
    out = pd._prechunk_cols_batch(Loff, T=2, interpret=True)
    for r, o in zip(ref, out):
        assert r.shape == o.shape, (r.shape, o.shape)
        assert np.array_equal(np.asarray(r), np.asarray(o))


def test_rescue_settings_pin_inverse_path():
    # the rescue contract is an exact-f64 dense-elimination re-solve:
    # "auto" rescues pin to the inverse path (knife-edge DINF parity,
    # measured round 5); explicit choices are honored
    from eicos_tpu.api import _rescue_settings
    from eicos_tpu.settings import Settings

    assert _rescue_settings(None) is None
    r = _rescue_settings(Settings(kkt_strategy="reduced"))
    assert r.dense_solve == "inverse" and r.kkt_strategy == "reduced"
    r = _rescue_settings(Settings(dense_solve="subst"))
    assert r.dense_solve == "subst"


def test_kkt_dense_subst_gating_off_cpu():
    # on the CPU backend the subst path must not engage ("auto" falls
    # back to the inverse path), keeping existing behavior intact
    from eicos_tpu.kkt import _use_subst
    from eicos_tpu.settings import Settings

    assert not _use_subst(jnp.float64, Settings(dense_solve="auto"))
    assert not _use_subst(jnp.float64, Settings(dense_solve="subst"))
    assert not _use_subst(jnp.float64, Settings(dense_solve="inverse"))
