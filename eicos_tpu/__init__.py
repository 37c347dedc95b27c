"""eicos_tpu — a TPU-native second-order cone program (SOCP) solver in JAX.

Solves
    minimize    c'x
    subject to  Ax = b
                Gx + s = h,  s in K = R^l_+ x SOC(q_1) x ... x SOC(q_N)

with a Mehrotra predictor-corrector primal-dual interior-point method on the
homogeneous self-dual embedding, matching the capabilities (API surface, exit
codes, tolerances, test corpus) of the EiCOS reference solver
(/root/reference/src/eicos.cpp) — redesigned TPU-first:

  * the whole solve is one jit-compiled ``lax.while_loop`` (zero host round
    trips per iteration),
  * cone algebra is flat segment arithmetic over the full conic vector
    (no per-cone loops at runtime),
  * the KKT system is factored by a custom blocked LDL^T built from matmuls
    (MXU-friendly, vmappable, no reliance on backend linalg primitives),
  * batching is ``vmap`` over problem *values* sharing one *structure*,
    and scaling over chips is ``shard_map`` over the batch axis.

float64 is required for the reference 1e-8 tolerances; the package enables
JAX x64 mode on import (opt out with EICOS_TPU_NO_X64=1).

Import side effects (both opt-out, both skipped if the user already set
the corresponding config/env): ``jax_enable_x64`` is turned on
(EICOS_TPU_NO_X64=1 to skip), and a persistent compilation cache is
configured at ~/.cache/eicos_tpu_jax with a 0.5 s min-compile-time
threshold (EICOS_TPU_NO_CACHE=1 to skip) — this changes caching behavior
for other JAX code in the same process.
"""

import os as _os

if not _os.environ.get("EICOS_TPU_NO_X64"):
    import jax as _jax

    _jax.config.update("jax_enable_x64", True)

# persistent compilation cache: a solver while_loop compiles in minutes
# (2-5 min through a TPU tunnel), and the reference's users expect
# setup() to be cheap on re-runs (/root/reference/test/run.cpp timing
# flow).  Respect an explicit user setting; opt out with
# EICOS_TPU_NO_CACHE=1.
if not _os.environ.get("EICOS_TPU_NO_CACHE"):
    import jax as _jax

    if (_jax.config.jax_compilation_cache_dir is None
            and not _os.environ.get("JAX_COMPILATION_CACHE_DIR")):
        _cache = _os.path.join(
            _os.path.expanduser("~"), ".cache", "eicos_tpu_jax")
        try:
            _os.makedirs(_cache, exist_ok=True)
            _jax.config.update("jax_compilation_cache_dir", _cache)
            _jax.config.update(
                "jax_persistent_cache_min_compile_time_secs", 0.5)
        except OSError:  # pragma: no cover - read-only home
            pass

from .exitcodes import ExitCode
from .settings import Settings
from .structure import ConeStructure, ProblemStructure
from .problem import ProblemData
from .solver import solve, Solution
from .api import Solver, BatchedSolver
from .io import save_problem, load_problem

__version__ = "0.1.0"

__all__ = [
    "ExitCode",
    "Settings",
    "ConeStructure",
    "ProblemStructure",
    "ProblemData",
    "solve",
    "Solution",
    "Solver",
    "BatchedSolver",
    "save_problem",
    "load_problem",
]
