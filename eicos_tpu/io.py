"""Problem serialization: save/load (structure, data) as .npz.

The working analogue of the reference's commented-out ``saveProblemData``
problem dump (/root/reference/src/eicos.cpp:2084-2164), which wrote problem
data as a compilable C header.  Here: one compressed .npz per problem,
round-tripping exactly, usable for corpus caching and benchmark inputs.
"""

from __future__ import annotations

import numpy as np

from .problem import ProblemData, make_problem
from .structure import ProblemStructure


def save_problem(path: str, structure: ProblemStructure,
                 data: ProblemData) -> None:
    np.savez_compressed(
        path,
        n=structure.n, p=structure.p, m=structure.m, l=structure.l,
        q=np.asarray(structure.q, dtype=np.int64),
        G=np.asarray(data.G), A=np.asarray(data.A),
        c=np.asarray(data.c), h=np.asarray(data.h), b=np.asarray(data.b),
    )


def load_problem(path: str):
    """Returns (structure, data)."""
    with np.load(path) as z:
        st = ProblemStructure.create(
            int(z["n"]), int(z["p"]), int(z["m"]), int(z["l"]),
            tuple(int(v) for v in z["q"]))
        data = make_problem(st, z["G"], z["A"], z["c"], z["h"], z["b"])
    return st, data
