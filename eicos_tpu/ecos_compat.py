"""ECOS-compatible API shim.

The reference ships an ECOS C-API adapter so unmodified ECOS test drivers
can run against EiCOS (/root/reference/test/ecos.h:7-44).  This is the same
adapter for Python callers: ``ecos_setup / ecos_solve / ecos_update_data /
ecos_cleanup`` with the classic exit-code macros.  Also provides
``ecos.solve``-style keyword entry (``solve_ecos``) accepting scipy.sparse
matrices and a cvxpy-style dims dict.
"""

from __future__ import annotations

import numpy as np

from .api import Solver
from .settings import Settings

# classic ECOS exit-code macros (/root/reference/test/ecos.h:36-44)
ECOS_OPTIMAL = 0
ECOS_PINF = 1
ECOS_DINF = 2
ECOS_INACC_OFFSET = 10
ECOS_MAXIT = -1
ECOS_NUMERICS = -2
ECOS_OUTCONE = -3
ECOS_SIGINT = -4
ECOS_FATAL = -7


def ecos_setup(n, m, p, l, ncones, q, nexc,
               Gpr, Gjc, Gir, Apr, Ajc, Air, c, h, b,
               settings: Settings = Settings()):
    """ECOS_setup(...). ``nexc`` (exponential cones) is accepted and ignored,
    exactly like the reference shim (/root/reference/test/ecos.h:11-17);
    EiCOS does not implement exponential cones (SURVEY.md §0)."""
    del nexc
    return Solver.from_csc(n=n, m=m, p=p, l=l, ncones=ncones, q=q,
                           Gpr=Gpr, Gjc=Gjc, Gir=Gir,
                           Apr=Apr, Ajc=Ajc, Air=Air,
                           c=c, h=h, b=b, settings=settings)


def ecos_solve(work: Solver) -> int:
    return int(work.solve())


def ecos_update_data(work: Solver, Gpr=None, Apr=None, c=None, h=None,
                     b=None):
    """ECOS_updateData: overwrite values keeping the sparsity pattern
    (/root/reference/src/eicos.cpp:2053-2082).  Raw value arrays are mapped
    back through the stored CSC pattern."""
    import scipy.sparse as sp

    st = work.structure
    kw = {}
    if Gpr is not None:
        Gd = np.asarray(work._data.G)
        pat = sp.csc_matrix(Gd)
        pat.data = np.asarray(Gpr, dtype=np.float64)
        kw["G"] = pat.toarray()
        kw["h"] = h
    if Apr is not None:
        Ad = np.asarray(work._data.A)
        pat = sp.csc_matrix(Ad)
        pat.data = np.asarray(Apr, dtype=np.float64)
        kw["A"] = pat.toarray()
        kw["b"] = b
    if c is not None:
        kw["c"] = c
    work.update_data(**kw)


def ecos_cleanup(work: Solver, flags: int = 0) -> None:
    del work, flags  # garbage collected; nothing to free explicitly


def solve_ecos(c, G=None, h=None, dims=None, A=None, b=None,
               settings: Settings = Settings()):
    """python-ecos style entry: dims = {"l": int, "q": [int, ...]}.
    Returns a dict with x, y, z, s, info, exitFlag."""
    dims = dims or {}
    q = tuple(dims.get("q", ()) or ())
    solver = Solver(G, A, c, h, b, soc_dims=q, settings=settings)
    code = solver.solve()
    sol = solver.last_solution
    return {
        "x": np.asarray(sol.x),
        "y": np.asarray(sol.y),
        "z": np.asarray(sol.z),
        "s": np.asarray(sol.s),
        "info": sol.info,
        "exitFlag": int(code),
    }


__all__ = [
    "ecos_setup", "ecos_solve", "ecos_update_data", "ecos_cleanup",
    "solve_ecos",
    "ECOS_OPTIMAL", "ECOS_PINF", "ECOS_DINF", "ECOS_INACC_OFFSET",
    "ECOS_MAXIT", "ECOS_NUMERICS", "ECOS_OUTCONE", "ECOS_SIGINT",
    "ECOS_FATAL",
]
