"""Object API parity tests: Solver ctor shapes, from_csc (traditional
interface), update_data fast path, ECOS-compat shim."""

import numpy as np
import pytest

import eicos_tpu
from eicos_tpu import ExitCode, Settings, Solver


def test_solver_eigen_style():
    # minimize -x1-x2 s.t. 0 <= x <= 1
    G = np.vstack([np.eye(2), -np.eye(2)])
    h = np.array([1.0, 1.0, 0.0, 0.0])
    c = np.array([-1.0, -1.0])
    s = Solver(G, None, c, h, None, soc_dims=())
    code = s.solve()
    assert code == ExitCode.OPTIMAL
    np.testing.assert_allclose(s.solution(), [1.0, 1.0], atol=1e-7)
    info = s.get_info()
    assert float(info.pcost) == pytest.approx(-2.0, abs=1e-7)


def test_from_csc_traditional():
    """Raw CSC ctor (reference 'traditional interface',
    /root/reference/src/eicos.cpp:91-120), using the feas problem data
    (/root/reference/test/feasibilityProblems/feas.h)."""
    s = Solver.from_csc(
        n=1, m=2, p=0, l=2, ncones=0, q=None,
        Gpr=np.array([1.0, -1.0]), Gjc=np.array([0, 2]),
        Gir=np.array([0, 1]),
        Apr=None, Ajc=None, Air=None,
        c=np.array([0.0]), h=np.array([1.0, 0.0]), b=None)
    assert s.solve() == ExitCode.OPTIMAL


def test_update_data_reuses_executable():
    """update_data = value replacement; same jitted executable re-used
    (the analogue of /root/reference/src/eicos.cpp:2032-2082)."""
    from eicos_tpu import corpus

    st, p1, p2, opt1, opt2 = corpus.load_update_data()
    s = Solver.__new__(Solver)
    s.structure, s.settings, s._data, s._solution = st, Settings(), p1, None
    assert s.solve() in (ExitCode.OPTIMAL, ExitCode.CLOSE_TO_OPTIMAL)
    assert float(s.get_info().pcost) == pytest.approx(opt1, abs=2e-5)
    s.update_data(G=np.asarray(p2.G), A=np.asarray(p2.A), c=p2.c, h=p2.h,
                  b=p2.b)
    assert s.solve() in (ExitCode.OPTIMAL, ExitCode.CLOSE_TO_OPTIMAL)
    assert float(s.get_info().pcost) == pytest.approx(opt2, abs=2e-5)


def test_verbose_prints(capsys):
    G = np.vstack([np.eye(1), -np.eye(1)])
    s = Solver(G, None, np.array([-1.0]), np.array([1.0, 0.0]), None)
    s.solve(verbose=True)
    out = capsys.readouterr().out
    assert "OPTIMAL" in out and "pcost" in out


def test_verbose_live_streams(capsys):
    """Settings(verbose_live=True) streams the iteration table DURING the
    solve via jax.debug.callback (the reference prints live,
    /root/reference/src/eicos.cpp:733-753)."""
    import jax

    G = np.vstack([np.eye(2), -np.eye(2)])
    s = Solver(G, None, np.array([-1.0, 0.5]), np.ones(4), None,
               settings=Settings(verbose_live=True))
    s.solve()
    jax.effects_barrier()
    out = capsys.readouterr().out
    assert "pcost" in out            # header
    assert out.count("\n") >= 3      # several live rows


def test_solve_live_segmented_matches_solve():
    """solve_live: segmented dispatch streams the iteration table between
    host round trips (live verbose that works through the axon TPU
    tunnel, where jax.debug.callback does not) and returns a Solution
    bit-identical to solve() — the iteration body is the same trace."""
    import io

    from eicos_tpu import corpus
    from eicos_tpu.solver import solve, solve_live

    st, prob, _ = corpus.load("lp_afiro")
    st = st.with_gsplit(prob.G, prob.A)
    settings = Settings(kkt_strategy="reduced")
    s1 = solve(st, prob, settings)
    buf = io.StringIO()
    s2 = solve_live(st, prob, settings, seg=3, file=buf)
    assert int(s1.exit_code) == int(s2.exit_code)
    assert np.array_equal(np.asarray(s1.x), np.asarray(s2.x))
    assert np.array_equal(np.asarray(s1.z), np.asarray(s2.z))
    lines = buf.getvalue().strip().splitlines()
    # header + one row per iteration 0..iter
    assert len(lines) == int(s1.info.iter) + 2
    assert lines[0].startswith("It")
    assert lines[1].startswith(" 0")


def test_solver_solve_live_method(capsys):
    G = np.vstack([np.eye(2), -np.eye(2)])
    s = Solver(G, None, np.array([-1.0, -1.0]),
               np.array([1.0, 1.0, 0.0, 0.0]), None)
    code = s.solve_live(seg=2)
    assert code == ExitCode.OPTIMAL
    out = capsys.readouterr().out
    assert "pcost" in out and "OPTIMAL" in out
    np.testing.assert_allclose(s.solution(), [1.0, 1.0], atol=1e-7)


def test_settings_are_static():
    """Different Settings recompile; equal Settings hit the jit cache."""
    assert hash(Settings()) == hash(Settings())
    assert Settings() == Settings()
    assert Settings(feastol=1e-6) != Settings()
