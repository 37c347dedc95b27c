"""The interior-point driver: one jit-compiled Mehrotra predictor-corrector
loop on the homogeneous self-dual embedding.

Functional re-derivation of Solver::solve
(/root/reference/src/eicos.cpp:848-1262) plus its helpers computeResiduals
(:643-689), updateStatistics (:691-754), checkExitConditions (:526-641),
Information::isBetterThan (:23-68), RHSaffine (:1670-1689), RHScombined
(:1282-1325) and backscale (:1271-1277) — as a single ``lax.while_loop``
whose carry holds the iterate, the best-iterate snapshot, and the exit
state.  All exit paths (optimal / infeasible at full and reduced accuracy,
pres-explosion safeguard, zero-step, maxit, NaN) are masked dataflow, so
the compiled program has zero host round trips and vmaps into a batched
solver where each lane freezes independently on convergence.

Semantics preserved exactly (they matter for exit-code parity):
  * the reference *ignores* updateScalings' out-of-cone flag (:1160) — NaNs
    propagate into the NaN exit;
  * pinfres/dinfres are sticky optionals: once set they persist across
    iterations (updateStatistics only ever assigns, :720-728);
  * the NaN exit at iter 0 (or with a better-than-best iterate) returns the
    internal NOT_CONVERGED_YET code (:1110-1137);
  * C++ ``optional<double> < double`` is true for nullopt in the
    tau/kap-small primal-infeasibility clause (:612).
"""

from __future__ import annotations

from functools import partial
from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax

from . import cones, kkt
from .equilibrate import equilibrate
from .exitcodes import ExitCode
from .problem import ProblemData
from .settings import Settings
from .structure import ProblemStructure

_OPT = int(ExitCode.OPTIMAL)
_PINF = int(ExitCode.PRIMAL_INFEASIBLE)
_DINF = int(ExitCode.DUAL_INFEASIBLE)
_MAXIT = int(ExitCode.MAXIT)
_NUMERICS = int(ExitCode.NUMERICS)
_NOTCONV = int(ExitCode.NOT_CONVERGED_YET)
_INACC = 10


class Iterate(NamedTuple):
    """Work + Information of one iterate (reference Work struct,
    /root/reference/include/eicos.hpp:97-114, and Information, :49-73)."""

    x: jax.Array
    y: jax.Array
    z: jax.Array
    s: jax.Array
    kap: jax.Array
    tau: jax.Array
    # inner products cached by computeResiduals
    cx: jax.Array
    by: jax.Array
    hz: jax.Array
    # statistics
    pcost: jax.Array
    dcost: jax.Array
    gap: jax.Array
    relgap: jax.Array
    has_relgap: jax.Array
    pres: jax.Array
    dres: jax.Array
    pinfres: jax.Array
    has_pinfres: jax.Array
    dinfres: jax.Array
    has_dinfres: jax.Array
    mu: jax.Array
    kapovert: jax.Array
    sigma: jax.Array
    step: jax.Array
    step_aff: jax.Array
    iter: jax.Array
    nitref1: jax.Array
    nitref2: jax.Array
    nitref3: jax.Array


class LoopState(NamedTuple):
    it: Iterate
    best: Iterate
    rhs1: jax.Array
    pres_prev: jax.Array
    iter: jax.Array
    code: jax.Array
    done: jax.Array
    hist: History


class History(NamedTuple):
    """Per-iteration statistics, (iter_max+1,) arrays — the device-side
    analogue of the reference's verbose table (updateStatistics tail,
    /root/reference/src/eicos.cpp:733-753), returned instead of printed."""

    pcost: jax.Array
    dcost: jax.Array
    gap: jax.Array
    pres: jax.Array
    dres: jax.Array
    kapovert: jax.Array
    mu: jax.Array
    step: jax.Array
    sigma: jax.Array
    nitref1: jax.Array
    nitref2: jax.Array
    nitref3: jax.Array


class Solution(NamedTuple):
    exit_code: jax.Array  # int32, ExitCode values
    x: jax.Array
    y: jax.Array
    z: jax.Array
    s: jax.Array
    info: Iterate         # final iterate incl. statistics (pre-backscale vars)
    pinf: jax.Array
    dinf: jax.Array
    history: History


def _norm(v):
    return jnp.sqrt(jnp.sum(v * v)) if v.shape[0] else jnp.asarray(0.0, v.dtype)


def _tree_where(pred, a, b):
    return jax.tree_util.tree_map(
        lambda u, v: jnp.where(pred, u, v), a, b)


def _check_exit(w: Iterate, feastol, abstol, reltol, reduced: bool):
    """checkExitConditions (/root/reference/src/eicos.cpp:526-641) as pure
    dataflow. Returns an int32 code (NOT_CONVERGED_YET if no test fires)."""
    # C++ optional semantics: nullopt < reltol is TRUE (:551) — an unset
    # relgap (pcost >= 0 and dcost <= 0, :700-710) satisfies the relgap
    # clause, so the reference declares OPTIMAL on pres/dres alone even
    # with gap >= abstol.  Same quirk as the pinfres clause below (:612).
    relgap_eff = jnp.where(w.has_relgap, w.relgap, -jnp.inf)
    optimal = (((-w.cx > 0.0) | (-w.by - w.hz >= -abstol))
               & (w.pres < feastol) & (w.dres < feastol)
               & ((w.gap < abstol) | (relgap_eff < reltol)))
    dinf = w.has_dinfres & (w.dinfres < feastol) & (w.tau < w.kap)
    # nullopt < feastol is true in C++ optional semantics (:612)
    pinf_small = jnp.where(w.has_pinfres, w.pinfres < feastol, True)
    pinf = ((w.has_pinfres & (w.pinfres < feastol) & (w.tau < w.kap))
            | ((w.tau < feastol) & (w.kap < feastol) & pinf_small))
    off = _INACC if reduced else 0
    code = jnp.where(
        optimal, _OPT + off,
        jnp.where(dinf, _DINF + off,
                  jnp.where(pinf, _PINF + off, _NOTCONV)))
    return jnp.asarray(code, jnp.int32)


def _is_better(i: Iterate, o: Iterate):
    """Information::isBetterThan (/root/reference/src/eicos.cpp:23-68).
    Note the reference compares this->pinfres against other.PRES (:30)."""
    gap_improves = (i.gap > 0.0) & (o.gap > 0.0) & (i.gap < o.gap)
    mu_improves = (i.mu > 0.0) & (i.mu < o.mu)
    infeas_case = i.has_pinfres & (i.kapovert > 1.0)
    sub = jnp.where(
        o.has_pinfres,
        gap_improves & (i.pinfres > 0.0) & (i.pinfres < o.pres) & mu_improves,
        gap_improves & mu_improves,
    )
    regular = (gap_improves
               & (i.pres > 0.0) & (i.pres < o.pres)
               & (i.dres > 0.0) & (i.dres < o.dres)
               & (i.kapovert > 0.0) & (i.kapovert < o.kapovert)
               & mu_improves)
    return jnp.where(infeas_case, sub, regular)


def _solve_pieces(structure: ProblemStructure, data: ProblemData,
                  settings: Settings, need_init: bool = True):
    """Shared trace of the solver: returns ``(state0, body, finish)``.

    ``solve`` composes them as one while_loop; the segmented live-verbose
    driver (``solve_live``) dispatches ``body`` in bounded chunks instead,
    carrying the pytree ``LoopState`` across host round trips.  With
    ``need_init=False`` the init factorization + 2-column init solve are
    skipped (resume/finish paths take the carry as input)."""
    st = structure
    n, p, m = st.n, st.p, st.m
    cone = st.cone
    f64 = data.c.dtype
    delta = settings.deltastat

    # ---- setup: equilibration (build-time in the reference, :181)
    eq = equilibrate(st, data.G, data.A, data.c, data.h, data.b,
                     iters=settings.equil_iters)
    G, A, c, h, b = eq.G, eq.A, eq.c, eq.h, eq.b

    # residual normalizers (:888-894)
    resx0 = jnp.maximum(1.0, _norm(c))
    resy0 = jnp.maximum(1.0, _norm(b))
    resz0 = jnp.maximum(1.0, _norm(h))

    ctx = kkt.make_context(st, G, A, settings)
    zero = jnp.asarray(0.0, f64)
    nan = jnp.asarray(jnp.nan, f64)

    state0 = None
    if need_init:
        # ---- init: factor with identity scalings, solve the two init
        # systems (:855-993)
        solve0 = kkt.factor(st, ctx, None, settings)

        rhs_init = jnp.stack([
            jnp.concatenate([jnp.zeros((n,), f64), b, h]),
            jnp.concatenate([-c, jnp.zeros((p + m,), f64)]),
        ])
        r12 = kkt.solve_refined(st, ctx, solve0, None, rhs_init, settings)
        x_init = r12.dx[0]
        s_init = cones.bring_to_cone(cone, -r12.dz[0], settings.gamma)
        y_init = r12.dy[1]
        z_init = cones.bring_to_cone(cone, r12.dz[1], settings.gamma)

        rhs1 = jnp.concatenate([-c, b, h])  # (:980)

        it0 = Iterate(
            x=x_init, y=y_init, z=z_init, s=s_init,
            kap=jnp.asarray(1.0, f64), tau=jnp.asarray(1.0, f64),
            cx=zero, by=zero, hz=zero,
            pcost=nan, dcost=nan, gap=nan, relgap=nan,
            has_relgap=jnp.asarray(False),
            pres=nan, dres=nan,
            pinfres=nan, has_pinfres=jnp.asarray(False),
            dinfres=nan, has_dinfres=jnp.asarray(False),
            mu=nan, kapovert=nan, sigma=zero, step=zero, step_aff=zero,
            iter=jnp.asarray(0, jnp.int32),
            nitref1=r12.nitref[0], nitref2=r12.nitref[1],
            nitref3=jnp.asarray(0, jnp.int32),
        )

        nh = settings.iter_max + 1
        hist0 = History(
            pcost=jnp.full((nh,), jnp.nan, f64),
            dcost=jnp.full((nh,), jnp.nan, f64),
            gap=jnp.full((nh,), jnp.nan, f64),
            pres=jnp.full((nh,), jnp.nan, f64),
            dres=jnp.full((nh,), jnp.nan, f64),
            kapovert=jnp.full((nh,), jnp.nan, f64),
            mu=jnp.full((nh,), jnp.nan, f64),
            step=jnp.full((nh,), jnp.nan, f64),
            sigma=jnp.full((nh,), jnp.nan, f64),
            nitref1=jnp.zeros((nh,), jnp.int32),
            nitref2=jnp.zeros((nh,), jnp.int32),
            nitref3=jnp.zeros((nh,), jnp.int32),
        )
        state0 = LoopState(
            it=it0, best=it0, rhs1=rhs1,
            pres_prev=jnp.asarray(jnp.finfo(f64).max, f64),
            iter=jnp.asarray(0, jnp.int32),
            code=jnp.asarray(int(ExitCode.FATAL), jnp.int32),
            done=jnp.asarray(False),
            hist=hist0,
        )

    check_full = partial(_check_exit, feastol=settings.feastol,
                         abstol=settings.abstol, reltol=settings.reltol,
                         reduced=False)
    check_red = partial(_check_exit, feastol=settings.feastol_inacc,
                        abstol=settings.abstol_inacc,
                        reltol=settings.reltol_inacc, reduced=True)

    def body(stt: LoopState) -> LoopState:
        w = stt.it
        i = stt.iter

        # ============ computeResiduals (:643-689) ============
        # sparse SpMVs in the reference; here f64 matvecs — routed
        # through the presliced Ozaki path on TPU (kkt._oz_mm), where
        # XLA's chunked-while f64 dot emulation is latency-bound
        # fallbacks keep the ORIGINAL operand orientation (A @ x, not
        # x @ A.T): the reduction order changes the f64 rounding path,
        # and knife-edge certificates (unboundedMaxSqrt) are decided by
        # it — measured: the transposed form flips DINF to NUMERICS
        if p and ctx.sGA is not None:
            # fused stacks: [z | y] @ [G; A] and x @ [A.T | G.T] — two
            # kernel launches instead of four (ops/pallas_gemm_ds)
            rx_h = -ctx.sGA.rmatmul(jnp.concatenate([w.z, w.y]))
            axgx = ctx.sAGT.rmatmul(w.x)
            ry_h = axgx[:p]
            rz_h = w.s + axgx[p:]
        else:
            rx_h = (-ctx.sG.rmatmul(w.z) if ctx.sG is not None
                    else -(w.z @ G))
            if p:
                rx_h = rx_h - (ctx.sA.rmatmul(w.y) if ctx.sA is not None
                               else w.y @ A)
            if p:
                ry_h = (ctx.sAT.rmatmul(w.x) if ctx.sAT is not None
                        else A @ w.x)
            else:
                ry_h = jnp.zeros((0,), f64)
            rz_h = w.s + ((ctx.sGT.rmatmul(w.x) if ctx.sGT is not None
                           else G @ w.x) if m else jnp.zeros((0,), f64))
        hresx = _norm(rx_h)
        rx = rx_h - w.tau * c
        hresy = _norm(ry_h)
        ry = ry_h - w.tau * b
        hresz = _norm(rz_h)
        rz = rz_h - w.tau * h

        cx = jnp.dot(c, w.x) if n else zero
        by = jnp.dot(b, w.y) if p else zero
        hz = jnp.dot(h, w.z) if m else zero
        rt = w.kap + cx + by + hz

        nx, ny = _norm(w.x), _norm(w.y)
        nz, ns = _norm(w.z), _norm(w.s)

        # ============ updateStatistics (:691-728) ============
        gap = jnp.dot(w.s, w.z) if m else zero
        mu = (gap + w.kap * w.tau) / (st.degrees + 1)
        kapovert = w.kap / w.tau
        pcost = cx / w.tau
        dcost = -(hz + by) / w.tau
        has_relgap = (pcost < 0.0) | (dcost > 0.0)
        relgap = jnp.where(pcost < 0.0, gap / -pcost,
                           jnp.where(dcost > 0.0, gap / dcost, nan))
        nry = (_norm(ry) / jnp.maximum(resy0 + nx, 1.0)) if p else zero
        nrz = _norm(rz) / jnp.maximum(resz0 + nx + ns, 1.0)
        pres = jnp.maximum(nry, nrz) / w.tau
        dres = _norm(rx) / jnp.maximum(resx0 + ny + nz, 1.0) / w.tau
        # sticky infeasibility measures (:720-728)
        set_pinf = (hz + by) / jnp.maximum(ny + nz, 1.0) < -settings.reltol
        pinfres = jnp.where(set_pinf, hresx / jnp.maximum(ny + nz, 1.0),
                            w.pinfres)
        has_pinfres = w.has_pinfres | set_pinf
        set_dinf = cx / jnp.maximum(nx, 1.0) < -settings.reltol
        dinfres = jnp.where(
            set_dinf,
            jnp.maximum(hresy / jnp.maximum(nx, 1.0),
                        hresz / jnp.maximum(nx + ns, 1.0)),
            w.dinfres)
        has_dinfres = w.has_dinfres | set_dinf

        w = w._replace(
            cx=cx, by=by, hz=hz, pcost=pcost, dcost=dcost, gap=gap,
            relgap=relgap, has_relgap=has_relgap, pres=pres, dres=dres,
            pinfres=pinfres, has_pinfres=has_pinfres,
            dinfres=dinfres, has_dinfres=has_dinfres,
            mu=mu, kapovert=kapovert, iter=i,
        )

        # one-hot masked writes, NOT .at[i].set(): under vmap the lane
        # counters diverge once lanes start exiting, so an indexed set
        # lowers to a serialized TPU scatter (~25 ms each — measured 175x
        # slowdown of the whole solve); a where() over the (iter_max+1,)
        # axis is a fully vectorized select.
        sel = jnp.arange(stt.hist.pcost.shape[0]) == i

        def rec(row, val):
            return jnp.where(sel, val, row)

        hist = stt.hist._replace(
            pcost=rec(stt.hist.pcost, pcost),
            dcost=rec(stt.hist.dcost, dcost),
            gap=rec(stt.hist.gap, gap),
            pres=rec(stt.hist.pres, pres),
            dres=rec(stt.hist.dres, dres),
            kapovert=rec(stt.hist.kapovert, kapovert),
            mu=rec(stt.hist.mu, mu),
            step=rec(stt.hist.step, w.step),
            sigma=rec(stt.hist.sigma, w.sigma),
            nitref1=rec(stt.hist.nitref1, w.nitref1),
            nitref2=rec(stt.hist.nitref2, w.nitref2),
            nitref3=rec(stt.hist.nitref3, w.nitref3),
        )

        if settings.verbose_live:
            # stream the row DURING the solve (the reference prints inside
            # updateStatistics, /root/reference/src/eicos.cpp:733-753);
            # static flag — zero cost when off
            from .utils.printing import live_row_callback
            jax.debug.callback(live_row_callback, i, pcost, dcost, gap,
                               pres, dres, kapovert, mu, w.step, w.sigma,
                               w.nitref1, w.nitref2, w.nitref3,
                               ordered=False)

        # ============ exit logic ============
        # safeguard: pres explosion or negative gap (:1010-1041)
        safeguard_trip = (i > 0) & ((pres > settings.safeguard * stt.pres_prev)
                                    | (gap < 0.0))
        code_full = check_full(w)
        full_conv = code_full != _NOTCONV
        zero_step = (i > 0) & (w.step == settings.stepmin * settings.gamma)
        maxit_hit = i == settings.iter_max
        nan_hit = jnp.isnan(pcost)

        code_best_red = check_red(stt.best)
        red_or_numerics = jnp.where(code_best_red == _NOTCONV,
                                    _NUMERICS, code_best_red)
        better = _is_better(w, stt.best)
        code_cur_red = check_red(w)
        maxit_code = jnp.where(
            better,
            jnp.where(code_cur_red == _NOTCONV, _MAXIT, code_cur_red),
            jnp.where(code_best_red == _NOTCONV, _MAXIT, code_best_red))
        maxit_restore = ~better
        nan_keep = (i == 0) | better
        nan_code = jnp.where(nan_keep, _NOTCONV, red_or_numerics)
        nan_restore = ~nan_keep

        # priority: safeguard > full convergence > zero-step > maxit > NaN
        exit_now = (safeguard_trip | full_conv | zero_step | maxit_hit
                    | nan_hit)
        code = jnp.asarray(_NOTCONV, jnp.int32)
        restore = jnp.asarray(False)
        code = jnp.where(nan_hit, nan_code, code)
        restore = jnp.where(nan_hit, nan_restore, restore)
        code = jnp.where(maxit_hit, maxit_code, code)
        restore = jnp.where(maxit_hit, maxit_restore, restore)
        code = jnp.where(zero_step, red_or_numerics, code)
        restore = jnp.where(zero_step, True, restore)
        code = jnp.where(full_conv, code_full, code)
        restore = jnp.where(full_conv, False, restore)
        code = jnp.where(safeguard_trip, red_or_numerics, code)
        restore = jnp.where(safeguard_trip, True, restore)

        final_it = _tree_where(restore, stt.best, w)

        # ============ best-iterate snapshot (:1150-1158) ============
        best = _tree_where((i == 0) | better, w, stt.best)

        # ============ step computation ============
        scal, lam = cones.update_scalings(cone, w.s, w.z)
        solve_exact = kkt.factor(st, ctx, scal, settings)

        # rhs1 and the affine RHS [rx; -ry; s - rz] (:1670-1689, packed
        # form) are independent: one stacked 2-column refined solve.
        rhs_aff = jnp.concatenate([rx, -ry, w.s - rz])
        sol12 = kkt.solve_refined(
            st, ctx, solve_exact, scal, jnp.stack([stt.rhs1, rhs_aff]),
            settings)
        dx1, dy1, dz1 = sol12.dx[0], sol12.dy[0], sol12.dz[0]
        dx2, dy2, dz2 = sol12.dx[1], sol12.dy[1], sol12.dz[1]

        dtau_denom = (w.kap / w.tau - jnp.dot(c, dx1) - jnp.dot(b, dy1)
                      - jnp.dot(h, dz1))
        dtauaff = (rt - w.kap + jnp.dot(c, dx2) + jnp.dot(b, dy2)
                   + jnp.dot(h, dz2)) / dtau_denom

        dzaff = dz2 + dtauaff * dz1
        W_dzaff = cones.scale(cone, scal, dzaff)
        dsaff_by_W = -W_dzaff - lam
        dkapaff = -w.kap - w.kap / w.tau * dtauaff

        step_aff = cones.line_search(cone, lam, dsaff_by_W, W_dzaff,
                                     w.tau, dtauaff, w.kap, dkapaff,
                                     settings.stepmin, settings.stepmax)
        sigma = jnp.clip((1.0 - step_aff) ** 3,
                         settings.sigmamin, settings.sigmamax)

        # combined RHS (:1282-1325)
        ds1, _ = cones.conic_product(cone, lam, lam)
        ds2, _ = cones.conic_product(cone, dsaff_by_W, W_dzaff)
        sigmamu = sigma * mu
        e_vec = np.zeros(m)
        e_vec[:st.l] = 1.0
        if st.n_sc:
            e_vec[st.l + np.asarray(cone.head_offsets)] = 1.0
        ds = ds1 + ds2 - sigmamu * jnp.asarray(e_vec, f64)
        lam_ds = cones.conic_division(cone, lam, ds)
        W_lam_ds = cones.scale(cone, scal, lam_ds)
        oms = 1.0 - sigma
        rhs_comb = jnp.concatenate([oms * rx, -oms * ry,
                                    -oms * rz + W_lam_ds])
        sol3 = kkt.solve_refined(st, ctx, solve_exact, scal,
                                 rhs_comb[None, :], settings)
        dx2c, dy2c, dz2c = sol3.dx[0], sol3.dy[0], sol3.dz[0]

        bkap = w.kap * w.tau + dkapaff * dtauaff - sigmamu
        dtau = (oms * rt - bkap / w.tau + jnp.dot(c, dx2c)
                + jnp.dot(b, dy2c) + jnp.dot(h, dz2c)) / dtau_denom

        dx = dx2c + dtau * dx1
        dy = dy2c + dtau * dy1
        dz = dz2c + dtau * dz1

        W_dz = cones.scale(cone, scal, dz)
        ds_by_W = -(lam_ds + W_dz)
        dkap = -(bkap + w.kap * dtau) / w.tau

        step = settings.gamma * cones.line_search(
            cone, lam, ds_by_W, W_dz, w.tau, dtau, w.kap, dkap,
            settings.stepmin, settings.stepmax)
        ds_final = cones.scale(cone, scal, ds_by_W)

        stepped = w._replace(
            x=w.x + step * dx,
            y=w.y + step * dy,
            z=w.z + step * dz,
            s=w.s + step * ds_final,
            kap=w.kap + step * dkap,
            tau=w.tau + step * dtau,
            sigma=sigma, step=step, step_aff=step_aff,
            nitref1=sol12.nitref[0], nitref2=sol12.nitref[1],
            nitref3=sol3.nitref[0],
        )

        cont = LoopState(it=stepped, best=best, rhs1=stt.rhs1,
                         pres_prev=pres, iter=i + 1,
                         code=jnp.asarray(_NOTCONV, jnp.int32),
                         done=jnp.asarray(False), hist=hist)
        exit_state = LoopState(it=final_it, best=stt.best, rhs1=stt.rhs1,
                               pres_prev=pres, iter=i,
                               code=code, done=jnp.asarray(True), hist=hist)
        return _tree_where(exit_now, exit_state, cont)

    def finish(final: LoopState) -> Solution:
        return _finish_solution(st, settings, eq, final,
                                (G, A, c, h, b),
                                (resx0, resy0, resz0),
                                (check_full, check_red), zero, nan)

    return state0, body, finish


def _finish_solution(st, settings, eq, final, gacbh, res0s, checks,
                     zero, nan) -> Solution:
    """Exit-time certificate recheck + backscale (the tail of solve)."""
    G, A, c, h, b = gacbh
    resx0, resy0, resz0 = res0s
    check_full, check_red = checks
    n, p, m = st.n, st.p, st.m
    f64 = c.dtype

    # ---- exit-time certificate re-evaluation in exact f64 ----
    # Under the double-single TPU kernels the in-loop residual GEMVs and
    # the factor carry ~2^-48-level rounding; knife-edge certificates
    # (unboundedMaxSqrt DINF at tau -> 0,
    # /root/reference/test/unboundedProblems/unboundedMaxSqrt.h:14) can
    # then miss feastol by an ulp inside the loop and exit NUMERICS.
    # One exact-f64 residual set at the RETURNED iterate (outside the hot
    # loop: plain jnp matvecs at `highest` precision, the CPU fallback's
    # operand orientation) re-evaluates every exit test; the code is
    # UPGRADED when the recheck certifies a strictly better tier
    # (definitive > reduced-accuracy > failure) and never downgraded.
    # On the CPU path the in-loop residuals are already exact, so this
    # changes nothing there.
    w = final.it
    code = final.code
    if st.dim_kkt and m:
        with jax.default_matmul_precision("highest"):
            rx_h = -(w.z @ G) - (w.y @ A if p else 0.0)
            ry_h = (A @ w.x) if p else jnp.zeros((0,), f64)
            rz_h = w.s + G @ w.x
        hresx, hresy, hresz = _norm(rx_h), _norm(ry_h), _norm(rz_h)
        rx = rx_h - w.tau * c
        ry = ry_h - w.tau * b
        rz = rz_h - w.tau * h
        cx = jnp.dot(c, w.x) if n else zero
        by = jnp.dot(b, w.y) if p else zero
        hz = jnp.dot(h, w.z)
        nx, ny = _norm(w.x), _norm(w.y)
        nz, ns = _norm(w.z), _norm(w.s)
        gap = jnp.dot(w.s, w.z)
        pcost = cx / w.tau
        dcost = -(hz + by) / w.tau
        has_relgap = (pcost < 0.0) | (dcost > 0.0)
        relgap = jnp.where(pcost < 0.0, gap / -pcost,
                           jnp.where(dcost > 0.0, gap / dcost, nan))
        nry = (_norm(ry) / jnp.maximum(resy0 + nx, 1.0)) if p else zero
        nrz = _norm(rz) / jnp.maximum(resz0 + nx + ns, 1.0)
        pres = jnp.maximum(nry, nrz) / w.tau
        dres = _norm(rx) / jnp.maximum(resx0 + ny + nz, 1.0) / w.tau
        # one more (sticky) updateStatistics application, in exact f64:
        # residuals refresh where the sign tests hold at this iterate
        set_pinf = (hz + by) / jnp.maximum(ny + nz, 1.0) < -settings.reltol
        set_dinf = cx / jnp.maximum(nx, 1.0) < -settings.reltol
        w_re = w._replace(
            cx=cx, by=by, hz=hz, pcost=pcost, dcost=dcost, gap=gap,
            relgap=relgap, has_relgap=has_relgap, pres=pres, dres=dres,
            pinfres=jnp.where(set_pinf,
                              hresx / jnp.maximum(ny + nz, 1.0),
                              w.pinfres),
            has_pinfres=w.has_pinfres | set_pinf,
            dinfres=jnp.where(
                set_dinf,
                jnp.maximum(hresy / jnp.maximum(nx, 1.0),
                            hresz / jnp.maximum(nx + ns, 1.0)),
                w.dinfres),
            has_dinfres=w.has_dinfres | set_dinf,
        )
        code_re_full = check_full(w_re)
        code_re_red = check_red(w_re)
        cand = jnp.where(code_re_full != _NOTCONV, code_re_full,
                         jnp.where(code_re_red != _NOTCONV, code_re_red,
                                   code))

        def _rank(cd):
            return jnp.where(
                (cd == _OPT) | (cd == _PINF) | (cd == _DINF), 2,
                jnp.where((cd >= _OPT + _INACC) & (cd <= _DINF + _INACC),
                          1, 0))

        upgrade = _rank(cand) > _rank(code)
        code = jnp.where(upgrade, cand, code)
        w = _tree_where(upgrade, w_re, w)

    # ---- backscale (:1271-1277)
    x = w.x / (eq.x_equil * w.tau)
    y = w.y / (eq.A_equil * w.tau)
    z = w.z / (eq.G_equil * w.tau)
    s = w.s * eq.G_equil / w.tau

    pinf = (code == _PINF) | (code == _PINF + _INACC)
    dinf = (code == _DINF) | (code == _DINF + _INACC)
    return Solution(exit_code=code, x=x, y=y, z=z, s=s, info=w,
                    pinf=pinf, dinf=dinf, history=final.hist)


@partial(jax.jit, static_argnums=(0, 2))
def solve(structure: ProblemStructure, data: ProblemData,
          settings: Settings = Settings()) -> Solution:
    """Solve one SOCP. jit-compiled per (structure, settings); re-solving
    with new values (the reference's updateData fast path,
    /root/reference/src/eicos.cpp:2032-2082) reuses the compiled executable
    — equilibration and KKT assembly are inside the trace, so the "fast
    update" is automatic.  vmap over ``data`` solves a batch.
    """
    state0, body, finish = _solve_pieces(structure, data, settings)
    final = lax.while_loop(lambda s: ~s.done, body, state0)
    return finish(final)


# --------------- segmented dispatch (live verbose on any backend) -------
# jax.debug.callback is not supported through the axon TPU tunnel, so
# Settings(verbose_live=True) cannot stream rows on the deployment
# target.  These entry points run the SAME compiled iteration body in
# seg-iteration chunks, carrying LoopState across host round trips —
# the host prints the History rows that became final between
# dispatches (the reference prints inside updateStatistics,
# /root/reference/src/eicos.cpp:733-753).  Setup (equilibration, KKT
# context) is re-traced into every segment executable; its extra device
# cost per dispatch is one equilibrate + context rebuild, acceptable
# for a verbose debugging mode.

@partial(jax.jit, static_argnums=(0, 2, 3))
def _solve_seg_start(structure: ProblemStructure, data: ProblemData,
                     settings: Settings, seg: int) -> LoopState:
    state0, body, _ = _solve_pieces(structure, data, settings)
    return lax.while_loop(lambda s: (~s.done) & (s.iter < seg),
                          body, state0)


@partial(jax.jit, static_argnums=(0, 2, 4))
def _solve_seg_resume(structure: ProblemStructure, data: ProblemData,
                      settings: Settings, carry: LoopState,
                      seg: int) -> LoopState:
    _, body, _ = _solve_pieces(structure, data, settings,
                               need_init=False)
    lim = carry.iter + seg
    return lax.while_loop(lambda s: (~s.done) & (s.iter < lim),
                          body, carry)


@partial(jax.jit, static_argnums=(0, 2))
def _solve_seg_finish(structure: ProblemStructure, data: ProblemData,
                      settings: Settings, carry: LoopState) -> Solution:
    _, _, finish = _solve_pieces(structure, data, settings,
                                 need_init=False)
    return finish(carry)


def solve_live(structure: ProblemStructure, data: ProblemData,
               settings: Settings = Settings(), seg: int = 1,
               file=None) -> Solution:
    """``solve`` with the reference-style iteration table streamed DURING
    the solve, on every backend including the axon TPU tunnel: the
    while_loop is dispatched in ``seg``-iteration segments and the rows
    that became final print between dispatches.  The iteration body is
    the identical trace, so the returned Solution is bit-identical to
    ``solve``'s; the cost is one host round trip (+ setup replay) per
    segment."""
    import sys

    from .utils.printing import _HEADER, format_iteration_row

    out = file if file is not None else sys.stdout
    print(_HEADER, file=out, flush=True)
    carry = _solve_seg_start(structure, data, settings, seg)
    printed = 0
    while True:
        done = bool(jax.device_get(carry.done))
        itv = int(jax.device_get(carry.iter))
        last = itv if done else itv - 1
        if last >= printed:
            h = jax.device_get(carry.hist)
            for i in range(printed, last + 1):
                print(format_iteration_row(
                    i, float(h.pcost[i]), float(h.dcost[i]),
                    float(h.gap[i]), float(h.pres[i]), float(h.dres[i]),
                    float(h.kapovert[i]), float(h.mu[i]),
                    float(h.step[i]), float(h.sigma[i]),
                    int(h.nitref1[i]), int(h.nitref2[i]),
                    int(h.nitref3[i])), file=out, flush=True)
            printed = last + 1
        if done:
            break
        carry = _solve_seg_resume(structure, data, settings, carry, seg)
    return _solve_seg_finish(structure, data, settings, carry)
