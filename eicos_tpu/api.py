"""Ergonomic object API mirroring the reference's ``EiCOS::Solver``
(/root/reference/include/eicos.hpp:116-266) plus a batched variant.

The object is a thin stateful shell over the pure jitted ``solve``: it owns
(structure, settings) — which select the compiled executable — and the
current problem values.  ``update_data`` (the reference's fixed-sparsity
fast path, /root/reference/src/eicos.cpp:2032-2082) is value replacement;
the executable is reused, which is the TPU-native version of "no symbolic
refactorization".
"""

from __future__ import annotations

from typing import Optional

import jax
import numpy as np

from .exitcodes import ExitCode
from .problem import ProblemData, make_problem
from .settings import Settings
from .solver import Solution, solve
from .structure import ProblemStructure


def _rescue_settings(rescue: Optional[Settings]) -> Optional[Settings]:
    """Normalize a rescue configuration: the documented rescue contract
    is a re-solve under the EXACT-f64 dense elimination (knife-edge
    certificates like unboundedMaxSqrt's DINF are decided by the exact
    f64 rounding path, and the substitution kernels' ~2^-48 rounding
    flips that one to NUMERICS — measured on TPU, round 5).  A rescue
    left at dense_solve="auto" therefore pins to the inverse path;
    an explicit "subst" is honored."""
    import dataclasses

    if rescue is None or rescue.dense_solve != "auto":
        return rescue
    return dataclasses.replace(rescue, dense_solve="inverse")


class Solver:
    """Single-problem solver with the reference's constructor shape:
    Solver(G, A, c, h, b, soc_dims); l is inferred as m - sum(q)
    (/root/reference/src/eicos.cpp:155).

    ``rescue``: optional fallback ``Settings`` (same contract as
    BatchedSolver): when the primary configuration's exit is not
    definitive (NUMERICS/MAXIT/... or a reduced-accuracy tier beaten by
    the fallback), the problem re-solves once under the fallback and the
    better result is kept.  Motivation: knife-edge certificates on the
    double-single TPU kernel path (unboundedMaxSqrt,
    /root/reference/test/unboundedProblems/unboundedMaxSqrt.h:14 —
    DINF decided by f64 last-ulp rounding at tau -> 0) exit NUMERICS
    under "banded"+ds where the exact-f64 dense elimination certifies
    DINF; the fallback restores the reference's exit code without
    chasing kernel rounding.

    NOTE on marginal lanes: several f64-path micro-optimizations (e.g.
    the width-grouped spmv gathers, ops/spmv.py) legally reassociate
    reduction trees at the ~1-ulp level, which can flip a knife-edge
    instance between OPTIMAL and a reduced-accuracy tier.  The exit-time
    exact-f64 certificate recheck absorbs most flips; configuring
    ``rescue=Settings(kkt_strategy="reduced")`` (or "banded" from a
    dense primary) absorbs the rest.  Plain ``rescue=None`` solves can
    land a marginal instance one tier lower than a differently-rounded
    build — that is inherent to 1e-8 targets at f64, not a bug."""

    def __init__(self, G, A, c, h, b, soc_dims=(),
                 settings: Settings = Settings(),
                 rescue: Optional[Settings] = None):
        c = np.asarray(c, dtype=np.float64).reshape(-1)
        h = np.zeros(0) if h is None else np.asarray(h, np.float64).reshape(-1)
        b = np.zeros(0) if b is None else np.asarray(b, np.float64).reshape(-1)
        q = tuple(int(d) for d in (soc_dims if soc_dims is not None else ()))
        n = c.shape[0]
        m = h.shape[0]
        p = b.shape[0]
        l = m - sum(q)
        if l < 0:
            raise ValueError("sum of SOC dims exceeds number of cone rows")
        self.structure = ProblemStructure.create(n, p, m, l, q)
        self.settings = settings
        self._data = make_problem(self.structure, G, A, c, h, b)
        if settings.kkt_strategy == "banded":
            from .plan import make_band_plan

            self.structure = self.structure.with_band_plan(
                make_band_plan(self.structure, self._data.G, self._data.A,
                               block=settings.block))
        if settings.kkt_strategy in ("reduced", "banded", "normal"):
            # static singleton-row split speeds up H formation (structure
            # .GSplit); pattern-only, so update_data keeps the executable
            self.structure = self.structure.with_gsplit(
                self._data.G, self._data.A)
        self.rescue = _rescue_settings(rescue)
        self._solution: Optional[Solution] = None
        self._dev: Optional[ProblemData] = None

    @classmethod
    def from_csc(cls, n, m, p, l, ncones, q, Gpr, Gjc, Gir,
                 Apr, Ajc, Air, c, h, b, settings: Settings = Settings()):
        """The reference's "traditional interface"
        (/root/reference/src/eicos.cpp:91-120)."""
        import scipy.sparse as sp

        G = (sp.csc_matrix((Gpr, Gir, Gjc), shape=(m, n))
             if Gpr is not None else None)
        A = (sp.csc_matrix((Apr, Air, Ajc), shape=(p, n))
             if Apr is not None else None)
        qq = tuple(int(d) for d in (q[:ncones] if q is not None else ()))
        self = cls.__new__(cls)
        c_arr = (np.asarray(c, np.float64).reshape(n) if c is not None
                 else np.zeros(n))
        h_arr = (np.asarray(h, np.float64).reshape(m) if h is not None
                 else np.zeros(m))
        b_arr = (np.asarray(b, np.float64).reshape(p) if b is not None
                 else np.zeros(p))
        self.structure = ProblemStructure.create(n, p, m, l, qq)
        self.settings = settings
        self._data = make_problem(self.structure, G, A, c_arr, h_arr, b_arr)
        if settings.kkt_strategy in ("reduced", "banded", "normal"):
            self.structure = self.structure.with_gsplit(
                self._data.G, self._data.A)
        self._solution = None
        self._dev = None
        return self

    def update_data(self, G=None, A=None, c=None, h=None, b=None):
        """Replace problem values; dimensions must match (README.md:83-88)."""
        st = self.structure
        d = self._data
        self._data = ProblemData(
            G=d.G if G is None else make_problem(st, G, None, None, None,
                                                 None).G,
            A=d.A if A is None else make_problem(st, None, A, None, None,
                                                 None).A,
            c=d.c if c is None else np.asarray(c, np.float64).reshape(st.n),
            h=d.h if h is None else np.asarray(h, np.float64).reshape(st.m),
            b=d.b if b is None else np.asarray(b, np.float64).reshape(st.p),
        )
        self._solution = None
        self._dev = None

    def solve(self, verbose: bool = False) -> ExitCode:
        # device-resident problem values, cached until update_data: a
        # re-solve must not re-upload the (possibly large) matrices —
        # through the axon tunnel the transfer once dominated the solve
        if getattr(self, "_dev", None) is None:
            self._dev = jax.device_put(self._data)
        sol = solve(self.structure, self._dev, self.settings)
        self._solution = jax.device_get(sol)
        if getattr(self, "rescue", None) is not None:
            code = int(self._solution.exit_code)
            if _code_rank(code) < 2:
                rsol = jax.device_get(
                    solve(self.structure, self._dev, self.rescue))
                if _code_rank(int(rsol.exit_code)) > _code_rank(code):
                    self._solution = rsol
            code = int(self._solution.exit_code)
            if _code_rank(code) < 2 and jax.default_backend() != "cpu":
                # final tier: exact IEEE-f64 re-solve on the host CPU
                # backend.  Knife-edge certificates (unboundedMaxSqrt's
                # DINF, /root/reference/test/unboundedProblems/
                # unboundedMaxSqrt.h:14) diverge under the TPU's
                # EMULATED float64 for every on-chip configuration —
                # measured round 5: all strategies, f32 factors, and
                # even pure-XLA f64 with Pallas off exit NUMERICS at
                # iter 4 (round-4 HEAD identically), while host IEEE
                # f64 certifies DINF.  Cost: one host solve, only on
                # the rare still-non-definitive path.
                import dataclasses

                from .ops.backend import force_cpu

                # distinct static settings force a FRESH trace (the jit
                # jaxpr cache keys on settings, and a TPU-traced graph
                # bakes in Pallas calls); force_cpu() turns off the
                # settings-independent kernel gates during that trace
                cpu_cfg = dataclasses.replace(
                    self.rescue, pallas_leaf="off", dense_solve="inverse")
                with jax.default_device(jax.devices("cpu")[0]), \
                        force_cpu():
                    csol = jax.device_get(
                        solve(self.structure, jax.device_put(self._data),
                              cpu_cfg))
                if _code_rank(int(csol.exit_code)) > _code_rank(code):
                    self._solution = csol
        if verbose:
            from .utils.printing import print_iteration_table, print_summary
            print_iteration_table(self._solution)
            print_summary(self.structure, self._solution)
        return ExitCode(int(self._solution.exit_code))

    def solve_live(self, seg: int = 1, file=None) -> ExitCode:
        """``solve`` with the iteration table streamed DURING the solve
        (the reference prints inside updateStatistics,
        /root/reference/src/eicos.cpp:733-753).  Works on every backend
        including the axon TPU tunnel where ``Settings(verbose_live)``'s
        jax.debug.callback is unsupported: the loop dispatches in
        ``seg``-iteration segments (solver.solve_live).  Result is
        bit-identical to ``solve()``."""
        from .solver import solve_live
        from .utils.printing import print_summary

        if getattr(self, "_dev", None) is None:
            self._dev = jax.device_put(self._data)
        sol = solve_live(self.structure, self._dev, self.settings,
                         seg=seg, file=file)
        self._solution = jax.device_get(sol)
        print_summary(self.structure, self._solution, file=file)
        return ExitCode(int(self._solution.exit_code))

    def solution(self) -> np.ndarray:
        """Primal solution x (reference: solution(), src/eicos.cpp:251-254)."""
        return np.asarray(self._solution.x)

    def get_info(self):
        return self._solution.info

    def get_settings(self) -> Settings:
        return self.settings

    @property
    def last_solution(self) -> Optional[Solution]:
        return self._solution


def _code_rank(code: int) -> int:
    """Quality tier of an exit code: 2 = definitive answer (optimal or a
    full-accuracy infeasibility certificate), 1 = reduced-accuracy tier,
    0 = failure (NUMERICS/MAXIT/OUTCONE/...)."""
    if code in (0, 1, 2):
        return 2
    if code in (10, 11, 12):
        return 1
    return 0


class BatchedSolver:
    """vmapped batch of problems sharing one structure — the TPU-native
    replacement for a farm of ``Solver`` instances.  All lanes run one
    compiled while_loop; converged lanes freeze until the batch finishes.

    ``shared`` names ProblemData fields that are identical across lanes
    (passed unbatched): the classic updateData sweep
    (/root/reference/src/run.cpp:43-50 — same G/A pattern and values, new
    c/h/b per solve) maps to ``shared=("G", "A", "h")`` with batched c, b.
    Lane-invariant work (equilibration of G/A, KKT base assembly) then
    stays unbatched inside vmap — computed once, not per lane — and the
    big matrices exist once in HBM instead of per lane.

    ``rescue``: optional fallback ``Settings``.  Lanes whose exit code is
    not definitive (see _code_rank) are re-solved one at a time under the
    fallback configuration and the better result is merged in.  Rationale:
    the speed path's banded elimination ORDER can hit f64 growth
    pathologies on rare endgame iterates that the dense natural-order
    elimination survives (measured: a 1-in-256 stall on the MPC family —
    see CLAUDE.md); a per-lane dense fallback restores the batch to
    all-definitive at the cost of one small solve, instead of capping the
    batch size at whatever the weakest lane tolerates.  The reference has
    no analogue (single problem, single strategy); this is the batched
    equivalent of a user retrying a failed solve with a safer method.

    ``mesh``: optional ``jax.sharding.Mesh`` — the batch axis is sharded
    over its (single) axis, shared fields are replicated, and the solve
    jits with explicit in_shardings (data parallelism over ICI, zero
    per-iteration collectives — parallel/sharding.py).  The rescue
    sub-batch is deliberately NOT sharded: it is small by construction
    (rare failing lanes), and a sub-mesh-size batch cannot shard evenly.
    """

    def __init__(self, structure: ProblemStructure,
                 settings: Settings = Settings(),
                 shared: tuple = (),
                 rescue: Optional[Settings] = None,
                 mesh=None):
        self.structure = structure
        self.settings = settings
        self.shared = tuple(shared)
        rescue = _rescue_settings(rescue)
        self.rescue = rescue
        self.mesh = mesh
        axes = ProblemData(**{f: (None if f in self.shared else 0)
                              for f in ("G", "A", "c", "h", "b")})
        jit_kw = {}
        if mesh is not None:
            from jax.sharding import NamedSharding, PartitionSpec
            batch_spec = NamedSharding(mesh, PartitionSpec(mesh.axis_names[0]))
            repl_spec = NamedSharding(mesh, PartitionSpec())
            self._specs = ProblemData(**{
                f: (repl_spec if f in self.shared else batch_spec)
                for f in ("G", "A", "c", "h", "b")})
            jit_kw["in_shardings"] = (self._specs,)
        self._vsolve = jax.jit(
            jax.vmap(lambda d: solve(structure, d, settings),
                     in_axes=(axes,)), **jit_kw)
        if rescue is not None:
            self._rescue_vsolve = jax.jit(
                jax.vmap(lambda d: solve(structure, d, rescue),
                         in_axes=(axes,)))
        self._last_in = None
        self._last_dev = None
        self.last_rescued: tuple = ()

    def _gather_lanes(self, dev: ProblemData, idx) -> ProblemData:
        return ProblemData(**{
            f: (getattr(dev, f) if f in self.shared
                else jax.numpy.take(getattr(dev, f), idx, axis=0))
            for f in ("G", "A", "c", "h", "b")})

    def _apply_rescue(self, sols: Solution) -> Solution:
        codes = np.asarray(jax.device_get(sols.exit_code))
        lanes = np.flatnonzero(
            np.array([_code_rank(int(cd)) for cd in codes]) < 2)
        if lanes.size == 0:
            self.last_rescued = ()
            return sols
        # ONE batched fallback solve over the gathered failing lanes
        # (a per-lane Python loop cost one compile + dispatch per lane);
        # the sub-batch pads to the next power of two by repeating lane 0
        # so distinct failure counts share a few compiled executables
        nsub = 1 << int(lanes.size - 1).bit_length()
        idx = np.concatenate([lanes, np.repeat(lanes[:1],
                                               nsub - lanes.size)])
        rsols = self._rescue_vsolve(self._gather_lanes(self._last_dev, idx))
        rcodes = np.asarray(jax.device_get(rsols.exit_code))[:lanes.size]
        take = np.array([j for j in range(lanes.size)
                         if (_code_rank(int(rcodes[j]))
                             > _code_rank(int(codes[lanes[j]])))],
                        dtype=np.int64)
        if take.size == 0:
            self.last_rescued = ()
            return sols
        dest = lanes[take]
        # leaves whose per-lane shape differs between the two
        # configurations (History length is iter_max + 1) keep the
        # primary's value; everything else scatters the rescue's in
        sols = jax.tree_util.tree_map(
            lambda full, sub:
                (full.at[dest].set(sub[take])
                 if full.shape[1:] == sub.shape[1:] else full),
            sols, rsols)
        self.last_rescued = tuple(int(v) for v in dest)
        return sols

    def solve(self, batch: ProblemData) -> Solution:
        # keep the batch device-resident across repeated solves of the
        # same object (the updateData-sweep pattern): re-uploading the
        # shared G through the axon tunnel once cost ~0.7 s per call —
        # 24% of the whole 128-lane batch solve
        if batch is not self._last_in:
            self._last_in = batch
            self._last_dev = (jax.device_put(batch, self._specs)
                              if self.mesh is not None
                              else jax.device_put(batch))
        sols = self._vsolve(self._last_dev)
        if self.rescue is not None:
            sols = self._apply_rescue(sols)
        return sols

    @staticmethod
    def stack(problems, shared: tuple = ()) -> ProblemData:
        """Stack per-lane problems; ``shared`` fields are taken from the
        first problem and must be identical across lanes."""
        first = problems[0]
        vals = {}
        for f in ("G", "A", "c", "h", "b"):
            if f in shared:
                vals[f] = np.asarray(getattr(first, f))
            else:
                vals[f] = np.stack([np.asarray(getattr(pr, f))
                                    for pr in problems])
        return ProblemData(**vals)
