"""Unit tests of the exit-condition logic (checkExitConditions,
/root/reference/src/eicos.cpp:526-641) — in particular the C++
``std::optional`` comparison quirks the reference relies on."""

import jax.numpy as jnp
import numpy as np

import eicos_tpu  # noqa: F401  (enables x64)
from eicos_tpu.solver import Iterate, _check_exit


def _iterate(**kw):
    f = lambda v: jnp.asarray(v, jnp.float64)  # noqa: E731
    base = dict(
        x=f(np.zeros(1)), y=f(np.zeros(0)), z=f(np.zeros(2)),
        s=f(np.zeros(2)), kap=f(0.5), tau=f(1.0),
        cx=f(0.0), by=f(0.0), hz=f(0.0),
        pcost=f(0.0), dcost=f(0.0), gap=f(0.0),
        relgap=f(np.nan), has_relgap=jnp.asarray(False),
        pres=f(0.0), dres=f(0.0),
        pinfres=f(np.nan), has_pinfres=jnp.asarray(False),
        dinfres=f(np.nan), has_dinfres=jnp.asarray(False),
        mu=f(0.0), kapovert=f(0.5), sigma=f(0.0), step=f(0.0),
        step_aff=f(0.0), iter=jnp.asarray(1, jnp.int32),
        nitref1=jnp.asarray(0, jnp.int32), nitref2=jnp.asarray(0, jnp.int32),
        nitref3=jnp.asarray(0, jnp.int32),
    )
    base.update(kw)
    return Iterate(**base)


def _check(w):
    return int(_check_exit(w, feastol=1e-8, abstol=1e-8, reltol=1e-8,
                           reduced=False))


def test_optimal_with_unset_relgap():
    """relgap is nullopt when pcost >= 0 and dcost <= 0 (:700-710); the
    reference's optimal test compares ``optional<double> relgap < reltol``
    (:551) and nullopt < x is TRUE in C++ — so pres/dres < feastol alone
    declares OPTIMAL even with gap >= abstol.  Regression for the round-1
    divergence where an unset relgap was treated as +inf."""
    w = _iterate(
        cx=jnp.asarray(0.0), by=jnp.asarray(5e-13), hz=jnp.asarray(5e-13),
        pcost=jnp.asarray(0.0), dcost=jnp.asarray(-1e-12),
        pres=jnp.asarray(1e-12), dres=jnp.asarray(1e-12),
        gap=jnp.asarray(1.0),            # gap >= abstol!
        has_relgap=jnp.asarray(False),   # pcost >= 0 and dcost <= 0
    )
    assert _check(w) == 0  # OPTIMAL


def test_not_optimal_with_set_relgap_large():
    """Same state but with relgap engaged and large: must keep iterating."""
    w = _iterate(
        cx=jnp.asarray(-1.0), pcost=jnp.asarray(-1.0),
        pres=jnp.asarray(1e-12), dres=jnp.asarray(1e-12),
        gap=jnp.asarray(1.0), relgap=jnp.asarray(1.0),
        has_relgap=jnp.asarray(True),
    )
    assert _check(w) == -87  # NOT_CONVERGED_YET


def test_optimal_via_relgap():
    """gap >= abstol but relgap < reltol: relative-gap convergence."""
    w = _iterate(
        cx=jnp.asarray(-1e9), pcost=jnp.asarray(-1e9),
        pres=jnp.asarray(1e-12), dres=jnp.asarray(1e-12),
        gap=jnp.asarray(1e-4), relgap=jnp.asarray(1e-13),
        has_relgap=jnp.asarray(True),
    )
    assert _check(w) == 0


def test_pinf_nullopt_pinfres():
    """tau/kap-small primal-infeasibility clause (:612): unset pinfres
    satisfies ``optional < feastol`` (nullopt < x is true)."""
    w = _iterate(
        tau=jnp.asarray(1e-12), kap=jnp.asarray(1e-12),
        pres=jnp.asarray(1.0), dres=jnp.asarray(1.0), gap=jnp.asarray(1.0),
        has_pinfres=jnp.asarray(False),
    )
    assert _check(w) == 1  # PRIMAL_INFEASIBLE


def test_dinf_requires_engaged_dinfres():
    w = _iterate(
        tau=jnp.asarray(0.1), kap=jnp.asarray(0.9),
        pres=jnp.asarray(1.0), dres=jnp.asarray(1.0), gap=jnp.asarray(1.0),
        dinfres=jnp.asarray(1e-12), has_dinfres=jnp.asarray(True),
    )
    assert _check(w) == 2  # DUAL_INFEASIBLE
    w2 = w._replace(has_dinfres=jnp.asarray(False))
    assert _check(w2) == -87


def test_dinf_pinned_under_banded_with_rescue():
    """unboundedMaxSqrt must certify DINF under the flagship banded
    configuration (/root/reference/test/unboundedProblems/
    unboundedMaxSqrt.h:14).  The certificate is a tau->0 knife edge
    decided by f64 last-ulp rounding: under the double-single TPU
    kernels the trajectory diverges from the exact-f64 one at iter ~2
    and exits NUMERICS (measured round 3; the reference binary built
    against mini_eigen does the same, baselines/eicos_reference.json).
    The API-level answer is the Solver ``rescue`` fallback: a failure
    re-solves once under the exact-f64 dense elimination, which
    certifies DINF on every backend."""
    from eicos_tpu import ExitCode
    from eicos_tpu.api import Solver
    from eicos_tpu.corpus import load
    from eicos_tpu.settings import Settings

    st, prob, expected = load("unboundedMaxSqrt")
    s = Solver(prob.G, None, prob.c, prob.h, None, soc_dims=st.q,
               settings=Settings(kkt_strategy="banded"),
               rescue=Settings(kkt_strategy="reduced"))
    assert s.solve() == ExitCode.DUAL_INFEASIBLE
