"""KKT system assembly and solve with iterative refinement.

The reference builds a quasidefinite sparse matrix with an SOC "u/v
expansion" so the CSC pattern is iteration-invariant, caches raw value
pointers, and runs Eigen LDL^T + refinement
(/root/reference/src/eicos.cpp:807-846, 1471-1620, 1691-2030).

Two TPU-native strategies, both pure matmul (selected by
``Settings.kkt_strategy``; both refine in float64 against their exact
operator, exactly like solveKKT's loop at :1471-1620 — up to ``nitref``
rounds, undo-on-regression, threshold / weak-progress stops):

"full"     Dense blocked LDL^T of the (n+p+m) quasidefinite matrix

               K = [ dI   A'   G'       ]
               =   [ A   -dI   0        ]      (d = deltastat)
                   [ G    0   -W^2 - dI ]

           — the direct analogue of the reference's factorization, minus
           the CSC expansion (unnecessary for a dense-block layout).

"reduced"  Eliminate the cone block analytically.  W^{-2} has a closed
           form (diag + rank-2 per cone, cones.scale2_inv), so

               [ dI + G' W^{-2} G   A'  ] [dx]   [ bx + G' W^{-2} bz ]
               [ A                 -dI  ] [dy] = [ by                ]
               dz = W^{-2} (G dx - bz)

           factors only (n+p) — for MPC-class problems (m ~ 2.7n) that is
           ~25x fewer factorization flops, and forming G'W^{-2}G is one
           large MXU matmul.  The eliminated system carries no deltastat on
           the cone rows; the refinement residual is computed against that
           operator (ez without the d*dz term), keeping the scheme exact.

The refinement residual here is sign-consistent with the factored operator
on every row; the reference flips the deltastat sign on the last row of
each SOC (src/eicos.cpp:1552) as an artifact of its expansion — a O(7e-8)
discrepancy we do not reproduce.
"""

from __future__ import annotations

from typing import NamedTuple, Optional

import jax
import jax.numpy as jnp
from jax import lax

from . import cones
from .ops.ldl import ldl_factor, ldl_solve, pad_to_block, LDLFactors
from .structure import ProblemStructure


class KKTContext(NamedTuple):
    """Per-solve constants: equilibrated data + static base matrix."""

    G: jax.Array       # (m, n)
    A: jax.Array       # (p, n)
    K0: jax.Array      # full: (Dp, Dp) with A/G blocks; reduced: (Dpr, Dpr)


def make_context(st: ProblemStructure, G, A, settings) -> KKTContext:
    n, p, m = st.n, st.p, st.m
    dtype = G.dtype
    delta = settings.deltastat
    if settings.kkt_strategy == "reduced":
        D = n + p
        Dp = pad_to_block(D, settings.block)
        K0 = jnp.zeros((Dp, Dp), dtype)
        idx = jnp.arange(Dp)
        # x-block diag is overwritten by H each factor; -dI on y; 1 padding
        diag0 = jnp.where(idx < n, 0.0,
                          jnp.where(idx < D, -delta, 1.0))
        K0 = K0 + jnp.diag(diag0)
        if p:
            K0 = K0.at[:n, n:D].set(A.T)
            K0 = K0.at[n:D, :n].set(A)
        return KKTContext(G=G, A=A, K0=K0)

    D = st.dim_kkt
    Dp = pad_to_block(D, settings.block)
    K0 = jnp.zeros((Dp, Dp), dtype)
    idx = jnp.arange(Dp)
    diag0 = jnp.where(idx < n, delta,
                      jnp.where(idx < n + p, -delta,
                                jnp.where(idx < D, 0.0, 1.0)))
    K0 = K0 + jnp.diag(diag0)
    if p:
        K0 = K0.at[:n, n:n + p].set(A.T)
        K0 = K0.at[n:n + p, :n].set(A)
    if m:
        K0 = K0.at[:n, n + p:D].set(G.T)
        K0 = K0.at[n + p:D, :n].set(G)
    return KKTContext(G=G, A=A, K0=K0)


def _factor_in_dtype(K, settings) -> LDLFactors:
    if settings.factor_dtype == "float32":
        fac = ldl_factor(K.astype(jnp.float32), block=settings.block)
        return LDLFactors(L=fac.L.astype(K.dtype), d=fac.d.astype(K.dtype),
                          Linv=fac.Linv.astype(K.dtype))
    return ldl_factor(K, block=settings.block)


def factor(st: ProblemStructure, ctx: KKTContext,
           scal: Optional[cones.Scaling], settings):
    """Assemble + factor for the current NT scaling (None = identity / init
    mode, the analogue of resetKKTScalings, src/eicos.cpp:807-846).

    Returns ``solve_exact(rhs_packed) -> (dx, dy, dz)``, a one-backsolve
    closure (no refinement).
    """
    n, p, m = st.n, st.p, st.m
    delta = settings.deltastat
    G = ctx.G

    if settings.kkt_strategy == "reduced":
        D = n + p
        Dp = ctx.K0.shape[-1]

        def w2inv(v):
            return v if scal is None else cones.scale2_inv(st.cone, scal, v)

        if m:
            WiG = (G if scal is None
                   else jax.vmap(lambda col: cones.scale2_inv(
                       st.cone, scal, col), in_axes=1, out_axes=1)(G))
            H = G.T @ WiG + delta * jnp.eye(n, dtype=G.dtype)
        else:
            H = delta * jnp.eye(n, dtype=G.dtype)
        K = ctx.K0.at[:n, :n].set(H)
        fac = _factor_in_dtype(K, settings)

        def solve_exact(rhs):
            bx, by, bz = rhs[:n], rhs[n:n + p], rhs[n + p:]
            r1 = bx + (w2inv(bz) @ G if m else 0.0)
            rr = jnp.zeros((Dp,), rhs.dtype).at[:D].set(
                jnp.concatenate([r1, by]))
            x = ldl_solve(fac, rr)
            dx = x[:n]
            dy = x[n:D]
            dz = w2inv(G @ dx - bz) if m else bz
            return dx, dy, dz

        return solve_exact

    # ---- full strategy
    D = st.dim_kkt
    Dp = ctx.K0.shape[-1]
    if m:
        W2 = (jnp.eye(m, dtype=G.dtype) if scal is None
              else cones.w2_dense(st.cone, scal, G.dtype))
        blk = -W2 - delta * jnp.eye(m, dtype=G.dtype)
        K = ctx.K0.at[n + p:D, n + p:D].set(blk)
    else:
        K = ctx.K0
    fac = _factor_in_dtype(K, settings)

    def solve_exact(rhs):
        rr = jnp.zeros((Dp,), rhs.dtype).at[:D].set(rhs)
        x = ldl_solve(fac, rr)
        return x[:n], x[n:n + p], x[n + p:D]

    return solve_exact


class KKTSolveResult(NamedTuple):
    dx: jax.Array
    dy: jax.Array
    dz: jax.Array
    nitref: jax.Array  # int32 refinement count (reference return value)


class _IRCarry(NamedTuple):
    dx: jax.Array
    dy: jax.Array
    dz: jax.Array
    rx: jax.Array
    ry: jax.Array
    rz: jax.Array
    nerr_prev: jax.Array
    k: jax.Array
    kout: jax.Array
    done: jax.Array


def solve_refined(st: ProblemStructure, ctx: KKTContext, solve_exact,
                  scal: Optional[cones.Scaling], rhs,
                  settings) -> KKTSolveResult:
    """Backsolve + iterative refinement against the exact (regularized)
    operator.  Reference: solveKKT, /root/reference/src/eicos.cpp:1471-1620.
    """
    n, p, m = st.n, st.p, st.m
    delta = settings.deltastat
    # the reduced operator has no deltastat on the cone rows (module doc)
    dz_reg = 0.0 if settings.kkt_strategy == "reduced" else delta
    f64 = rhs.dtype
    G, A = ctx.G, ctx.A

    bx, by, bz = rhs[:n], rhs[n:n + p], rhs[n + p:]

    if st.dim_kkt == 0:
        return KKTSolveResult(bx, by, bz, jnp.asarray(0, jnp.int32))

    def residual(dx, dy, dz):
        # ex = bx - G'dz - A'dy - d*dx   (:1514-1521)
        ex = bx - (dz @ G if m else 0.0) - delta * dx
        if p:
            ex = ex - dy @ A
        # ey = by - A dx + d*dy          (:1524-1531)
        ey = by - A @ dx + delta * dy if p else by
        # ez = bz - G dx + W^2 dz (+ d*dz on the full operator)
        if m:
            Wdz = dz if scal is None else cones.scale2(st.cone, scal, dz)
            ez = bz - G @ dx + Wdz + dz_reg * dz
        else:
            ez = bz
        nerr = jnp.max(jnp.abs(ex)) if n else jnp.asarray(0.0, f64)
        if m:
            nerr = jnp.maximum(nerr, jnp.max(jnp.abs(ez)))
        if p:
            nerr = jnp.maximum(nerr, jnp.max(jnp.abs(ey)))
        return ex, ey, ez, nerr

    dx0, dy0, dz0 = solve_exact(rhs)
    thresh = (1.0 + jnp.max(jnp.abs(rhs))) * settings.linsysacc
    nitref = settings.nitref
    irerrfact = settings.irerrfact

    def body(c: _IRCarry):
        ex, ey, ez, nerr = residual(c.dx, c.dy, c.dz)
        undo = (c.k > 0) & (nerr > c.nerr_prev)
        stop = (undo | (c.k == nitref) | (nerr < thresh)
                | ((c.k > 0) & (c.nerr_prev < irerrfact * nerr)))
        rx, ry, rz = solve_exact(jnp.concatenate([ex, ey, ez]))
        keep = lambda cur, und, nxt: jnp.where(  # noqa: E731
            undo, und, jnp.where(stop, cur, nxt))
        out = _IRCarry(
            dx=keep(c.dx, c.dx - c.rx, c.dx + rx),
            dy=keep(c.dy, c.dy - c.ry, c.dy + ry),
            dz=keep(c.dz, c.dz - c.rz, c.dz + rz),
            rx=rx, ry=ry, rz=rz,
            nerr_prev=nerr,
            k=c.k + 1,
            kout=jnp.where(undo, c.k - 1, c.k),
            done=stop,
        )
        return out

    init = _IRCarry(
        dx=dx0, dy=dy0, dz=dz0,
        rx=jnp.zeros_like(dx0), ry=jnp.zeros_like(dy0),
        rz=jnp.zeros_like(dz0),
        nerr_prev=jnp.asarray(jnp.inf, f64),
        k=jnp.asarray(0, jnp.int32),
        kout=jnp.asarray(0, jnp.int32),
        done=jnp.asarray(False),
    )
    out = lax.while_loop(lambda c: ~c.done, body, init)
    return KKTSolveResult(dx=out.dx, dy=out.dy, dz=out.dz, nitref=out.kout)
