"""Randomized SOCP battery: solutions are verified against the KKT
conditions directly (primal/dual feasibility, cone membership,
complementarity) — no external solver needed, and far stronger than the
reference's exit-code-only assertions.

One structure, many value draws, solved as one vmapped batch: a single
compile covers the whole battery."""

import numpy as np
import pytest

import eicos_tpu
from eicos_tpu.api import BatchedSolver
from eicos_tpu.settings import Settings
from eicos_tpu.structure import ProblemStructure
from eicos_tpu.problem import make_problem


def _random_socp(st, rng):
    """Feasible-by-construction SOCP over structure ``st``."""
    n, m, p, l = st.n, st.m, st.p, st.l
    G = rng.standard_normal((m, n))
    # interior point x0 with slack s0 strictly inside K
    x0 = rng.standard_normal(n) * 0.3
    s0 = np.empty(m)
    s0[:l] = np.abs(rng.standard_normal(l)) + 0.5
    off = l
    for q in st.q:
        tail = rng.standard_normal(q - 1) * 0.3
        s0[off] = np.linalg.norm(tail) + 1.0 + abs(rng.standard_normal())
        s0[off + 1:off + q] = tail
        off += q
    h = G @ x0 + s0
    A = rng.standard_normal((p, n))
    b = A @ x0
    c = rng.standard_normal(n)
    return make_problem(st, G, A, c, h, b)


def _check_kkt(st, prob, sol, tol=1e-6):
    x, y = np.asarray(sol.x), np.asarray(sol.y)
    z, s = np.asarray(sol.z), np.asarray(sol.s)
    G, A = np.asarray(prob.G), np.asarray(prob.A)
    c, h, b = np.asarray(prob.c), np.asarray(prob.h), np.asarray(prob.b)
    # residuals are relative to data + iterate NORMS — the solver's own
    # convergence criteria (pres/dres, src/eicos.cpp:704-718) normalize by
    # resz0 + ||x|| + ||s||, so that's the certified claim
    scale = max(1.0, np.linalg.norm(h) + np.linalg.norm(x)
                + np.linalg.norm(s), np.linalg.norm(b))
    assert np.max(np.abs(G @ x + s - h)) < tol * scale
    if st.p:
        assert np.max(np.abs(A @ x - b)) < tol * scale
    assert np.max(np.abs(G.T @ z + A.T @ y + c)) < tol * max(
        1.0, np.abs(c).max())
    # cone membership of s and z
    for v in (s, z):
        assert np.all(v[:st.l] >= -tol)
        off = st.l
        for q in st.q:
            assert v[off] >= np.linalg.norm(v[off + 1:off + q]) - tol
            off += q
    assert abs(float(s @ z)) < tol * 10 * scale


@pytest.mark.parametrize("strategy", ["full", "reduced"])
def test_random_socp_battery(strategy, rng):
    st = ProblemStructure.create(n=16, p=4, m=26, l=10, q=(5, 4, 7))
    probs = [_random_socp(st, rng) for _ in range(8)]
    batch = BatchedSolver.stack(probs)
    settings = Settings(kkt_strategy=strategy)
    sols = BatchedSolver(st, settings).solve(batch)
    codes = np.asarray(sols.exit_code)
    # feasible with interior -> bounded? not necessarily (c random): allow
    # DINF certificates but require most to be optimal
    assert np.all(np.isin(codes, (0, 10, 2, 12))), codes
    n_opt = 0
    for i in range(len(probs)):
        if codes[i] in (0, 10):
            lane = jax_tree_index(sols, i)
            # code 10 (CLOSE_TO_OPTIMAL) certifies the relaxed 5e-5 tier
            # (reference *_inacc tolerances, include/eicos.hpp:32-34);
            # the reduced strategy commonly lands there on SOCPs (its
            # normal equations square the cone conditioning near the
            # solution — see kkt.py)
            _check_kkt(st, probs[i], lane,
                       tol=1e-6 if codes[i] == 0 else 1e-4)
            n_opt += 1
    assert n_opt >= 4, f"too few optimal lanes: {codes}"


def jax_tree_index(sols, i):
    import jax

    return jax.tree_util.tree_map(lambda a: a[i], sols)
