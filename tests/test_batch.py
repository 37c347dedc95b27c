"""Batched solving (vmap) and multi-device sharding (8 virtual CPU devices,
set in conftest) — the TPU-native replacement for a farm of reference
Solver instances."""

import jax
import numpy as np
import pytest

import eicos_tpu  # noqa: F401
from eicos_tpu.api import BatchedSolver
from eicos_tpu.parallel import make_mesh, solve_batch_sharded
from eicos_tpu.problem import ProblemData, make_problem
from eicos_tpu.settings import Settings
from eicos_tpu.solver import solve
from eicos_tpu.structure import ProblemStructure


def random_lp_batch(batch, n=12, m=24, p=3, seed=0):
    """Random bounded LPs sharing one structure (values vary per lane)."""
    rng = np.random.default_rng(seed)
    st = ProblemStructure.create(n, p, m, m, ())
    probs = []
    for _ in range(batch):
        # box constraints keep every instance bounded & feasible
        G = np.vstack([np.eye(n), -np.eye(n)]) + 0.01 * rng.standard_normal(
            (m, n))
        h = np.abs(rng.standard_normal(m)) + 1.0
        A = rng.standard_normal((p, n))
        x_feas = np.zeros(n)
        b = A @ x_feas
        c = rng.standard_normal(n)
        probs.append(make_problem(st, G, A, c, h, b))
    return st, BatchedSolver.stack(probs), probs


def test_vmap_matches_single():
    st, batch, probs = random_lp_batch(4)
    bs = BatchedSolver(st, Settings())
    sols = bs.solve(batch)
    codes = np.asarray(sols.exit_code)
    for i, prob in enumerate(probs):
        single = solve(st, prob, Settings())
        assert codes[i] == int(single.exit_code) == 0
        np.testing.assert_allclose(np.asarray(sols.x)[i],
                                   np.asarray(single.x),
                                   rtol=1e-6, atol=1e-8)


def test_vmap_mixed_outcomes():
    """Lanes converge independently: optimal + infeasible in one batch."""
    from eicos_tpu import corpus

    st, prob, _ = corpus.load("infeasible1")
    # feasible variant: flip h to make constraints consistent
    # infeasible1 is  -x <= -2, x <= 1 (h=[-2,1]) — set h=[2,1]: feasible
    feasible = ProblemData(G=prob.G, A=prob.A, c=prob.c,
                           h=np.array([2.0, 1.0]), b=prob.b)
    batch = BatchedSolver.stack([prob, feasible])
    sols = BatchedSolver(st, Settings()).solve(batch)
    codes = list(np.asarray(sols.exit_code))
    assert codes[0] == 1  # primal infeasible
    assert codes[1] == 0  # optimal


def test_shared_fields_batch():
    """BatchedSolver(shared=...): lanes share G/A/h (the updateData sweep
    pattern, /root/reference/src/run.cpp:43-50) and must match the fully
    batched result."""
    st, batch_full, probs = random_lp_batch(3, seed=2)
    # rebuild lanes over ONE G/A/h (vary only c, b)
    base = probs[0]
    rng = np.random.default_rng(5)
    lanes = []
    for _ in range(3):
        c = np.asarray(base.c) + 0.1 * rng.standard_normal(st.n)
        lanes.append(ProblemData(G=base.G, A=base.A, c=c, h=base.h,
                                 b=base.b))
    shared = ("G", "A", "h")
    batch = BatchedSolver.stack(lanes, shared=shared)
    assert np.asarray(batch.G).ndim == 2  # unbatched
    sols = BatchedSolver(st, Settings(), shared=shared).solve(batch)
    codes = np.asarray(sols.exit_code)
    assert np.all(codes == 0), codes
    for i, prob in enumerate(lanes):
        single = solve(st, prob, Settings())
        np.testing.assert_allclose(np.asarray(sols.x)[i],
                                   np.asarray(single.x),
                                   rtol=1e-6, atol=1e-8)


def test_sharded_batch():
    assert len(jax.devices()) == 8, "conftest must force 8 virtual devices"
    st, batch, probs = random_lp_batch(16)
    mesh = make_mesh(8)
    sols = solve_batch_sharded(st, batch, mesh, Settings())
    codes = np.asarray(sols.exit_code)
    assert np.all(codes == 0), codes
    ref = solve(st, probs[5], Settings())
    np.testing.assert_allclose(np.asarray(sols.x)[5], np.asarray(ref.x),
                               rtol=1e-6, atol=1e-8)


def test_rescue_noop_when_all_definitive():
    """rescue= set but every lane already definitive: results unchanged,
    nothing re-solved."""
    st, batch, probs = random_lp_batch(4, seed=2)
    plain = BatchedSolver(st, Settings()).solve(batch)
    bs = BatchedSolver(st, Settings(), rescue=Settings(feastol=1e-6,
                                                       abstol=1e-6,
                                                       reltol=1e-6))
    sols = bs.solve(batch)
    assert bs.last_rescued == ()
    np.testing.assert_array_equal(np.asarray(sols.exit_code),
                                  np.asarray(plain.exit_code))
    np.testing.assert_array_equal(np.asarray(sols.x), np.asarray(plain.x))


def test_rescue_merges_failed_lanes():
    """Primary configuration capped at 2 IPM iterations (every lane exits
    MAXIT); the rescue pass re-solves each lane under the fallback and
    merges — the batch comes back all-OPTIMAL with per-lane solutions
    matching direct fallback solves."""
    st, batch, probs = random_lp_batch(3, seed=4)
    primary = Settings(iter_max=2)
    bs = BatchedSolver(st, primary, rescue=Settings())
    sols = bs.solve(batch)
    assert bs.last_rescued == (0, 1, 2)
    codes = np.asarray(sols.exit_code)
    assert np.all(codes == 0), codes
    for i, prob in enumerate(probs):
        ref = solve(st, prob, Settings())
        # the rescue solve is vmapped (one batched fallback): lowering
        # differs from the scalar solve by reduction order — near-ulp,
        # not bit, parity vs the single-lane reference
        np.testing.assert_allclose(np.asarray(sols.x)[i],
                                   np.asarray(ref.x),
                                   rtol=1e-9, atol=1e-12)
    # info merged too: the rescued lanes report the fallback's iteration
    # counts, not the capped primary's (History keeps the primary's — its
    # length is iter_max + 1, which differs between the configurations)
    assert np.all(np.asarray(sols.info.iter) > 2)


def test_rescue_is_one_batched_solve():
    """The rescue pass re-solves ALL failing lanes as one gathered
    sub-batch (vectorized), not a per-lane Python loop: with roughly half
    of 16 lanes failing, exactly one fallback solve call happens and the
    batch comes back all-definitive."""
    st, batch, probs = random_lp_batch(16, seed=7)
    # pick a cap that splits the lanes: some converge within it, some not
    base = BatchedSolver(st, Settings()).solve(batch)
    iters = np.asarray(base.info.iter)
    cap = int(np.median(iters))
    capped = BatchedSolver(st, Settings(iter_max=cap)).solve(batch)
    fail = np.flatnonzero(np.asarray(capped.exit_code) != 0)
    assert 2 <= fail.size < 16, "cap should split the batch"
    bs = BatchedSolver(st, Settings(iter_max=cap), rescue=Settings())
    calls = []
    orig = bs._rescue_vsolve
    bs._rescue_vsolve = lambda d: (calls.append(1), orig(d))[1]
    sols = bs.solve(batch)
    assert len(calls) == 1, "rescue must be one batched solve"
    assert bs.last_rescued == tuple(int(v) for v in fail)
    codes = np.asarray(sols.exit_code)
    assert np.all(codes == 0), codes
    for lane in bs.last_rescued:
        ref = solve(st, probs[lane], Settings())
        np.testing.assert_allclose(np.asarray(sols.x)[lane],
                                   np.asarray(ref.x),
                                   rtol=1e-9, atol=1e-12)


def test_rescue_keeps_primary_when_fallback_no_better():
    """A fallback that also fails must not overwrite the primary result."""
    st, batch, probs = random_lp_batch(2, seed=6)
    bs = BatchedSolver(st, Settings(iter_max=2),
                       rescue=Settings(iter_max=3))
    sols = bs.solve(batch)
    assert bs.last_rescued == ()
    codes = np.asarray(sols.exit_code)
    assert np.all(codes == int(eicos_tpu.ExitCode.MAXIT)), codes
