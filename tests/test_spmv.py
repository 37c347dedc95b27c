"""Static-pattern sparse matvec operands (ops/spmv) — the TPU kernel
path's replacement for dense GEMVs on narrow-pattern G/A (the analogue
of the reference's CSC SpMVs, /root/reference/src/eicos.cpp:643-689).
CPU-runnable: the table builder and gather product are plain jax ops."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

import eicos_tpu  # noqa: F401
from eicos_tpu.ops.spmv import WIDTH_MAX, SparseOperand, csc_table


def _random_sparse(rng, km, nm, max_nnz):
    M = np.zeros((km, nm))
    for r in range(km):
        k = rng.integers(0, max_nnz + 1)
        cols = rng.choice(nm, size=k, replace=False)
        M[r, cols] = rng.standard_normal(k)
    return M


def test_sparse_operand_matches_dense():
    rng = np.random.default_rng(0)
    M = _random_sparse(rng, 57, 23, 3)
    tab = csc_table(*np.nonzero(M), 57, 23)
    assert tab is not None
    op = SparseOperand(jnp.asarray(M), *tab)
    a = rng.standard_normal((5, 57))
    np.testing.assert_allclose(np.asarray(op.rmatmul(jnp.asarray(a))),
                               a @ M, rtol=1e-14, atol=1e-14)
    # 1-D right-multiplication and vmap batching
    np.testing.assert_allclose(np.asarray(op.rmatmul(jnp.asarray(a[0]))),
                               a[0] @ M, rtol=1e-14, atol=1e-14)
    np.testing.assert_allclose(
        np.asarray(jax.vmap(op.rmatmul)(jnp.asarray(a))),
        a @ M, rtol=1e-14, atol=1e-14)


def test_csc_table_width_gate_and_pads():
    # dense operand (every column full) -> gate refuses
    M = np.ones((WIDTH_MAX + 1, 4))
    assert csc_table(*np.nonzero(M), WIDTH_MAX + 1, 4) is None
    # empty column -> pad-only; zero row of padded matrix keeps it exact
    M = np.zeros((6, 3))
    M[2, 0] = 3.0
    tab = csc_table(*np.nonzero(M), 6, 3)
    idx, W = tab
    assert W == 1 and idx.shape == (3, 1)
    op = SparseOperand(jnp.asarray(M), *tab)
    a = np.random.default_rng(1).standard_normal((2, 6))
    np.testing.assert_allclose(np.asarray(op.rmatmul(jnp.asarray(a))),
                               a @ M, rtol=1e-14, atol=1e-14)


def test_make_sliced_patterns_compose():
    """The operand tables kkt._make_sliced builds (stacked [G;A],
    [A'|G'], eliminated rows) reproduce the dense products."""
    from eicos_tpu import corpus, kkt
    from eicos_tpu.ops import spmv

    st, prob = corpus.make_mpc_like(horizon=8, nx=2, nu=3, seed=1)
    st = st.with_gsplit(prob.G, prob.A)
    G = np.asarray(prob.G)
    A = np.asarray(prob.A)
    m, n, p = st.m, st.n, st.p
    mv = st.matvec
    assert mv is not None and mv.has_a
    gr = np.asarray(mv.g_rows)
    gc = np.asarray(mv.g_cols)
    ar = np.asarray(mv.a_rows)
    ac = np.asarray(mv.a_cols)
    rng = np.random.default_rng(2)

    cases = [
        (np.concatenate([G, A], 0), np.concatenate([gr, m + ar]),
         np.concatenate([gc, ac])),
        (np.concatenate([A.T, G.T], 1), np.concatenate([ac, gc]),
         np.concatenate([ar, p + gr])),
        (G.T, gc, gr),
    ]
    for Bm, src, out in cases:
        tab = spmv.csc_table(src, out, Bm.shape[0], Bm.shape[1])
        assert tab is not None
        op = spmv.SparseOperand(jnp.asarray(Bm), *tab)
        a = rng.standard_normal((3, Bm.shape[0]))
        np.testing.assert_allclose(np.asarray(op.rmatmul(jnp.asarray(a))),
                                   a @ Bm, rtol=1e-13, atol=1e-13)



def test_sparse_operand_width_grouped():
    """Columns split into power-of-two nnz classes must produce the exact
    gather-sum result (modulo f64 reassociation within a column — here
    widths are tiny so sums are exact) and engage only when worthwhile."""
    rng = np.random.default_rng(3)
    km, nm = 64, 512
    M = np.zeros((km, nm))
    # 80% singletons, some width-2, a few width-7 columns
    for j in range(nm):
        w = 1 if j % 5 else (7 if j % 25 == 0 else 2)
        rows = rng.choice(km, size=w, replace=False)
        M[rows, j] = rng.standard_normal(w)
    tab = csc_table(*np.nonzero(M), km, nm)
    assert tab is not None
    op = SparseOperand(jnp.asarray(M), *tab)
    assert op.groups is not None and len(op.groups) >= 3
    a = rng.standard_normal((4, km))
    np.testing.assert_allclose(np.asarray(op.rmatmul(jnp.asarray(a))),
                               a @ M, rtol=1e-13, atol=1e-13)
    np.testing.assert_allclose(np.asarray(op.rmatmul(jnp.asarray(a[0]))),
                               a[0] @ M, rtol=1e-13, atol=1e-13)
