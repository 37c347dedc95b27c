"""Randomized infeasibility-certificate battery.

The reference's only certificate tests are three tiny fixed problems
(unboundedLP1, unboundedMaxSqrt, infeasible1 —
/root/reference/test/ecostester.cpp:58-66).  This battery constructs
random SOCPs with *certified* infeasibility/unboundedness built in by
Farkas-type construction, and requires the speed path ("reduced", the
benchmark configuration) to reach the same certificates as "full":

* dual-infeasible (unbounded): plant a ray d with A d = 0, -G d in K,
  c'd < 0, and make the problem primal-feasible; exit must be DINF.
* primal-infeasible: plant a dual certificate (y, z) with z in int(K),
  G'z + A'y = 0, h'z + b'y < 0; exit must be PINF.

Certificate maturation drives the cone scalings to the boundary
(cond(W^2) ~ 1e10 at certification), which is exactly the regime where
the round-1 normal-equations path lost to conditioning-squaring; the
partial elimination (kkt.py "reduced") keeps SOC blocks in the factor so
the conditioning enters linearly.  float32 factors cannot mature
certificates under ANY strategy (eps32 * cond >> 1) — f64 is the
certificate-parity configuration.
"""

import numpy as np
import pytest

import eicos_tpu  # noqa: F401
from eicos_tpu.problem import make_problem
from eicos_tpu.settings import Settings
from eicos_tpu.solver import solve
from eicos_tpu.structure import ProblemStructure

N, L, Q = 8, 6, (3, 4)   # variables, LP rows, SOC dims
P = 2                    # equality rows
M = L + sum(Q)


def _soc_interior(rng, dim):
    """A strictly interior point of SOC(dim): head > ||tail||."""
    tail = rng.standard_normal(dim - 1)
    head = np.linalg.norm(tail) * (1.5 + rng.random())
    return np.concatenate([[head], tail])


def _make_dinf(seed):
    """Unbounded SOCP: plant ray d (A d = 0, -G d in K, c'd < 0) and a
    primal-feasible point x0."""
    rng = np.random.default_rng(seed)
    d = rng.standard_normal(N)
    d /= np.linalg.norm(d)
    G = rng.standard_normal((M, N))
    # LP rows: need (-G d) >= 0  -> g_r'd <= 0: reflect offending rows
    for r in range(L):
        gd = G[r] @ d
        if gd > 0:
            G[r] = G[r] - 2.0 * gd * d
    # SOC blocks: need (-G_k d) in SOC: overwrite the head row so that
    # -g_head'd dominates the tail norm of -G_tail d
    off = L
    for dim in Q:
        tail_ray = -(G[off + 1: off + dim] @ d)
        need = np.linalg.norm(tail_ray) * (1.2 + rng.random())
        g = G[off]
        G[off] = g - (g @ d + need) * d   # now -G[off]'d = need
        off += dim
    # equalities: project rows orthogonal to d
    A = rng.standard_normal((P, N))
    A = A - np.outer(A @ d, d)
    # objective decreasing along the ray
    c = rng.standard_normal(N)
    c = c - (c @ d + 1.0) * d             # c'd = -1
    # primal feasibility at x0
    x0 = rng.standard_normal(N) * 0.1
    b = A @ x0
    slack = np.concatenate(
        [np.abs(rng.standard_normal(L)) + 0.5]
        + [_soc_interior(rng, dim) for dim in Q])
    h = G @ x0 + slack
    st = ProblemStructure.create(N, P, M, L, Q)
    return st, make_problem(st, G, A, c, h, b)


def _make_pinf(seed):
    """Infeasible SOCP: plant a Farkas dual certificate (y, z):
    z in int(K), G'z + A'y = 0, h'z + b'y < 0."""
    rng = np.random.default_rng(seed)
    z = np.concatenate(
        [np.abs(rng.standard_normal(L)) + 0.5]
        + [_soc_interior(rng, dim) for dim in Q])
    y = rng.standard_normal(P)
    y[0] = 1.0 + abs(y[0])               # ensure y[0] != 0
    G = rng.standard_normal((M, N))
    A = rng.standard_normal((P, N))
    # force G'z + A'y = 0 by solving for A's first row
    A[0] = -(G.T @ z + A[1:].T @ y[1:]) / y[0]
    h = rng.standard_normal(M)
    b = rng.standard_normal(P)
    # force h'z + b'y < 0 via b[0]
    b[0] = -(h @ z + b[1:] @ y[1:] + 1.0) / y[0]
    c = rng.standard_normal(N)
    st = ProblemStructure.create(N, P, M, L, Q)
    return st, make_problem(st, G, A, c, h, b)


STRATS = [("full", "float64"), ("reduced", "float64")]


@pytest.mark.parametrize("strategy,fdtype", STRATS)
@pytest.mark.parametrize("seed", range(6))
def test_random_dual_infeasible(seed, strategy, fdtype):
    st, prob = _make_dinf(seed)
    sol = solve(st, prob, Settings(kkt_strategy=strategy,
                                   factor_dtype=fdtype))
    assert int(sol.exit_code) in (2, 12), (
        f"seed {seed}: {strategy}/{fdtype} exit {int(sol.exit_code)} "
        f"(iters={int(sol.info.iter)})")


@pytest.mark.parametrize("strategy,fdtype", STRATS)
@pytest.mark.parametrize("seed", range(6))
def test_random_primal_infeasible(seed, strategy, fdtype):
    st, prob = _make_pinf(seed)
    sol = solve(st, prob, Settings(kkt_strategy=strategy,
                                   factor_dtype=fdtype))
    assert int(sol.exit_code) in (1, 11), (
        f"seed {seed}: {strategy}/{fdtype} exit {int(sol.exit_code)} "
        f"(iters={int(sol.info.iter)})")


@pytest.mark.parametrize("seed", range(6))
def test_certificate_strategy_agreement(seed):
    """reduced and full must agree on the certificate type."""
    for maker in (_make_dinf, _make_pinf):
        st, prob = maker(seed)
        full = solve(st, prob, Settings())
        red = solve(st, prob, Settings(kkt_strategy="reduced"))
        assert int(full.exit_code) % 10 == int(red.exit_code) % 10, (
            maker.__name__, seed, int(full.exit_code), int(red.exit_code))
