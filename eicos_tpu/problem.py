"""Problem values: the traced side of the structure/values split.

Dense G (m,n) and A (p,n) device arrays.  On TPU, dense matvecs/matmuls ride
the MXU and vmap trivially; the reference's CSC sparsity
(/root/reference/include/eicos.hpp:188-194) is a CPU-cache artifact that
does not pay below ~10k dimensions on a systolic array.  Structural zeros
are plain zeros; equilibration and all residual algebra are exact on them.
"""

from __future__ import annotations

import dataclasses
from typing import Any

import jax
import numpy as np

from .structure import ProblemStructure


@jax.tree_util.register_dataclass
@dataclasses.dataclass(frozen=True)
class ProblemData:
    """Values of one SOCP (or a batch, with a leading batch axis)."""

    G: Any  # (m, n)
    A: Any  # (p, n)
    c: Any  # (n,)
    h: Any  # (m,)
    b: Any  # (p,)


def densify(mat, shape, dtype=np.float64) -> np.ndarray:
    """Accept scipy.sparse, CSC triplets via scipy, dense, or None."""
    if mat is None:
        return np.zeros(shape, dtype=dtype)
    if hasattr(mat, "toarray"):  # scipy.sparse
        out = np.asarray(mat.toarray(), dtype=dtype)
    else:
        out = np.asarray(mat, dtype=dtype)
    if out.shape != shape:
        raise ValueError(f"expected shape {shape}, got {out.shape}")
    return out


def make_problem(structure: ProblemStructure, G, A, c, h, b,
                 dtype=np.float64) -> ProblemData:
    n, p, m = structure.n, structure.p, structure.m
    return ProblemData(
        G=densify(G, (m, n), dtype),
        A=densify(A, (p, n), dtype),
        c=np.zeros(n, dtype) if c is None else np.asarray(c, dtype).reshape(n),
        h=np.zeros(m, dtype) if h is None else np.asarray(h, dtype).reshape(m),
        b=np.zeros(p, dtype) if b is None else np.asarray(b, dtype).reshape(p),
    )


def from_csc(n, m, p, l, q, Gpr, Gjc, Gir, Apr, Ajc, Air, c, h, b,
             dtype=np.float64):
    """Build (structure, problem) from raw CSC pointers — the analogue of the
    reference's "traditional interface" ctor (/root/reference/src/eicos.cpp:91-120).
    """
    import scipy.sparse as sp

    structure = ProblemStructure.create(n, p, m, l, q)
    G = sp.csc_matrix((Gpr, Gir, Gjc), shape=(m, n)) if Gpr is not None else None
    A = sp.csc_matrix((Apr, Air, Ajc), shape=(p, n)) if Apr is not None else None
    return structure, make_problem(structure, G, A, c, h, b, dtype)
