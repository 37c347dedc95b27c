"""Multi-chip scaling: shard the batch axis over a device mesh.

The reference is single-process/single-threaded (SURVEY.md §2): its notion
of throughput is one solve at a time on one CPU.  The TPU-native scaling
strategy is data parallelism over *problem instances* sharing one structure:
a batch axis vmapped inside one executable and sharded across chips over
ICI.  The math has zero cross-problem coupling, so the only collectives are
the implicit all-gathers at the output boundary — XLA partitions the whole
while_loop per-shard (fully spmd, no per-iteration communication).
"""

from __future__ import annotations

from functools import partial

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..problem import ProblemData
from ..settings import Settings
from ..solver import Solution, solve
from ..structure import ProblemStructure


def make_mesh(n_devices: int | None = None, axis: str = "batch") -> Mesh:
    devs = jax.devices()
    if n_devices is not None:
        devs = devs[:n_devices]
    return Mesh(np.asarray(devs), (axis,))


def solve_batch_sharded(structure: ProblemStructure, batch: ProblemData,
                        mesh: Mesh, settings: Settings = Settings(),
                        axis: str = "batch") -> Solution:
    """Solve a batch with the leading axis sharded over ``mesh``.

    Batch size must be divisible by the mesh size.  The per-problem
    while_loops run masked-converged inside one spmd program; each shard
    finishes when its slowest problem finishes.
    """
    spec = NamedSharding(mesh, P(axis))
    batch = jax.tree_util.tree_map(
        lambda x: jax.device_put(x, spec), batch)
    fn = jax.jit(
        jax.vmap(partial(solve, structure, settings=settings)),
        in_shardings=(spec,),
    )
    return fn(batch)
