"""Utility subsystems: timing helpers (the tic/toc analogue,
/root/reference/include/timing.hpp), problem serialization (the working
analogue of the reference's saveProblemData dump,
/root/reference/src/eicos.cpp:2084-2164)."""

import numpy as np

import eicos_tpu
from eicos_tpu import corpus
from eicos_tpu.utils.timing import tic, toc, timed


def test_tic_toc():
    t0 = tic()
    x = sum(range(1000))
    dt = toc(t0)
    assert x == 499500 and dt >= 0.0


def test_timed_blocks_on_device():
    import jax.numpy as jnp

    out, ms = timed(lambda: jnp.arange(1000.0).sum())
    assert float(out) == 499500.0 and ms >= 0.0


def test_problem_roundtrip(tmp_path):
    st, prob, _ = corpus.load("issue98")
    path = str(tmp_path / "issue98.npz")
    eicos_tpu.save_problem(path, st, prob)
    st2, prob2 = eicos_tpu.load_problem(path)
    assert st2 == st
    for f in ("G", "A", "c", "h", "b"):
        np.testing.assert_array_equal(np.asarray(getattr(prob, f)),
                                      np.asarray(getattr(prob2, f)))
