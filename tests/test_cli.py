"""CLI (__main__) — the executable-parity surface (reference run.cpp +
ecostester.cpp analogues)."""

import numpy as np

import eicos_tpu
from eicos_tpu import corpus
from eicos_tpu.__main__ import main


def test_cli_solve(tmp_path, capsys):
    st, prob, _ = corpus.load("feas")
    path = str(tmp_path / "feas.npz")
    eicos_tpu.save_problem(path, st, prob)
    rc = main(["solve", path, "--verbose"])
    out = capsys.readouterr().out
    assert rc == 0 and "OPTIMAL" in out and "pcost" in out


def test_cli_solve_live(tmp_path, capsys):
    st, prob, _ = corpus.load("feas")
    path = str(tmp_path / "feas.npz")
    eicos_tpu.save_problem(path, st, prob)
    rc = main(["solve", path, "--live"])
    out = capsys.readouterr().out
    assert rc == 0 and "OPTIMAL" in out
    assert out.index("It ") < out.index("pcost")   # table streamed first


def test_cli_corpus(capsys):
    rc = main(["corpus", "--problems", "feas,infeasible1"])
    out = capsys.readouterr().out
    assert rc == 0 and "2/2 passed" in out
