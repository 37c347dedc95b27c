"""Banded KKT strategy end-to-end: symbolic plan (native RCM) + block-
banded numeric factorization must reproduce the reduced strategy's
results on corpus problems."""

import numpy as np
import pytest

import eicos_tpu
from eicos_tpu import corpus
from eicos_tpu.plan import make_band_plan, banded_ratio
from eicos_tpu.settings import Settings
from eicos_tpu.solver import solve


@pytest.mark.parametrize("name", ["lp_afiro", "lp_blend"])
def test_banded_corpus_parity(name):
    st, prob, expected = corpus.load(name)
    plan = make_band_plan(st, prob.G, prob.A)
    sol_b = solve(st.with_band_plan(plan), prob,
                  Settings(kkt_strategy="banded"))
    sol_r = solve(st, prob, Settings(kkt_strategy="reduced"))
    assert int(sol_b.exit_code) in [int(e) for e in expected]
    assert int(sol_b.exit_code) == int(sol_r.exit_code)
    assert int(sol_b.info.iter) == int(sol_r.info.iter)
    np.testing.assert_allclose(float(sol_b.info.pcost),
                               float(sol_r.info.pcost), rtol=1e-9)


def test_band_plan_properties():
    st, prob, _ = corpus.load("lp_bandm")
    plan = make_band_plan(st, prob.G, prob.A)
    assert sorted(plan.perm[:st.n + st.p]) == list(range(st.n + st.p))
    assert plan.dim % plan.block == 0
    assert 1 <= plan.bwb <= plan.dim // plan.block
    assert banded_ratio(st, plan) > 1.0
    # hashable -> usable as a static jit argument
    assert hash(st.with_band_plan(plan)) == hash(st.with_band_plan(plan))


def test_solver_api_banded():
    from eicos_tpu import ExitCode, Solver

    G = np.vstack([np.eye(3), -np.eye(3)])
    h = np.array([1.0, 1.0, 1.0, 0.0, 0.0, 0.0])
    c = np.array([-1.0, -2.0, 1.0])
    s = Solver(G, None, c, h, None,
               settings=Settings(kkt_strategy="banded"))
    assert s.structure.band is not None
    assert s.solve() == ExitCode.OPTIMAL
    np.testing.assert_allclose(s.solution(), [1.0, 1.0, 0.0], atol=1e-7)


def test_gsplit_row_partition_disjoint():
    """sing/spr/dense must PARTITION the LP rows: at n = 1 the old
    nnz > wmax dense rule (wmax = 0) put singleton rows in BOTH lists,
    double-counting their H contribution — the factor solved ~2H and
    knife-thin certificates diverged (structure.GSplit.from_dense)."""
    from eicos_tpu.structure import GSplit

    for name in ("infeasible1", "feas", "unboundedLP1", "lp_afiro"):
        st, prob, _ = corpus.load(name)
        split = GSplit.from_dense(np.asarray(prob.G), st.l, st.n)
        sing = set(split.sing_rows)
        spr = set(split.spr_rows)
        dense = set(split.dense_rows)
        assert not (sing & spr), name
        assert not (sing & dense), name
        assert not (spr & dense), name
        nnz = (np.asarray(prob.G)[:st.l] != 0).sum(axis=1)
        covered = sing | spr | dense
        assert covered == set(np.flatnonzero(nnz >= 1)), name


@pytest.mark.parametrize("name,expect", [("infeasible1", (1,)),
                                         ("unboundedLP1", (2,)),
                                         ("feas", (0,))])
def test_banded_certificates_knife_thin(name, expect):
    """Banded (and reduced+gsplit) must certify the reference's tiny
    LP certificate problems with the exact reference exit codes — the
    regression for the GSplit double-count (exit 12 after 28 diverging
    iterations where "full" certified PINF in 5)."""
    st, prob, _ = corpus.load(name)
    st2 = st.with_gsplit(prob.G)
    plan = make_band_plan(st2, prob.G, prob.A)
    sol_b = solve(st2.with_band_plan(plan), prob,
                  Settings(kkt_strategy="banded"))
    sol_r = solve(st.with_gsplit(prob.G), prob,
                  Settings(kkt_strategy="reduced"))
    assert int(sol_b.exit_code) in expect, int(sol_b.exit_code)
    assert int(sol_r.exit_code) in expect, int(sol_r.exit_code)
    assert int(sol_b.info.iter) <= 10
