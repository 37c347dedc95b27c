"""KKT system assembly and solve with iterative refinement.

The reference builds the quasidefinite sparse matrix with an SOC "u/v
expansion" so the CSC pattern is iteration-invariant, caches raw value
pointers, and runs Eigen LDL^T + refinement
(/root/reference/src/eicos.cpp:807-846, 1471-1620, 1691-2030).

TPU-native redesign: K is a dense blocked matrix

    K = [ dI   A'   G'       ]
        [ A   -dI   0        ]
        [ G    0   -W^2 - dI ]      (d = deltastat)

assembled by static-slice writes (the analogue of the cached-pointer value
overwrite — XLA fuses the scatter), padded to the 128 MXU tile, factored by
the blocked LDL^T in ops/ldl.py, and refined against the *exact* regularized
operator exactly like solveKKT (:1471-1620): up to ``nitref`` rounds,
undo-on-regression, stop on threshold or weak progress.

The refinement residual here is sign-consistent with K on every row; the
reference flips the deltastat sign on the last row of each SOC in its
residual (src/eicos.cpp:1552) as an artifact of the expansion — a O(7e-8)
discrepancy we do not reproduce.
"""

from __future__ import annotations

from typing import NamedTuple, Optional

import jax
import jax.numpy as jnp
from jax import lax

from . import cones
from .ops.ldl import LDLFactors, ldl_factor, ldl_solve, pad_to_block
from .structure import ProblemStructure


def kkt_base(st: ProblemStructure, G, A, deltastat: float, block: int):
    """Static part of K: A/G blocks and +/- delta regularization; cone block
    zeroed (overwritten per iteration); padding diagonal = 1."""
    n, p, m = st.n, st.p, st.m
    D = st.dim_kkt
    Dp = pad_to_block(D, block)
    dtype = G.dtype
    K = jnp.zeros((Dp, Dp), dtype)
    idx = jnp.arange(Dp)
    diag0 = jnp.where(idx < n, deltastat,
                      jnp.where(idx < n + p, -deltastat,
                                jnp.where(idx < D, 0.0, 1.0)))
    K = K + jnp.diag(diag0)
    if p:
        K = K.at[:n, n:n + p].set(A.T)
        K = K.at[n:n + p, :n].set(A)
    if m:
        K = K.at[:n, n + p:D].set(G.T)
        K = K.at[n + p:D, :n].set(G)
    return K


def kkt_assemble(st: ProblemStructure, K0, scal: Optional[cones.Scaling],
                 deltastat: float):
    """Write the cone block: -W^2 - dI (init: W = I)."""
    n, p, m = st.n, st.p, st.m
    if m == 0:
        return K0
    if scal is None:
        W2 = jnp.eye(m, dtype=K0.dtype)
    else:
        W2 = cones.w2_dense(st.cone, scal, K0.dtype)
    block = -W2 - deltastat * jnp.eye(m, dtype=K0.dtype)
    return K0.at[n + p:n + p + m, n + p:n + p + m].set(block)


class KKTSolveResult(NamedTuple):
    dx: jax.Array
    dy: jax.Array
    dz: jax.Array
    nitref: jax.Array  # int32 refinement count (reference return value)


class _IRCarry(NamedTuple):
    x: jax.Array
    dx_ref: jax.Array
    nerr_prev: jax.Array
    k: jax.Array
    kout: jax.Array
    done: jax.Array


def solve_kkt(st: ProblemStructure, fac: LDLFactors, G, A,
              scal: Optional[cones.Scaling], rhs, settings) -> KKTSolveResult:
    """LDL^T backsolve + iterative refinement against the exact regularized
    operator. Reference: solveKKT, /root/reference/src/eicos.cpp:1471-1620.

    ``rhs`` is packed (n+p+m,); ``scal=None`` selects init mode (W = I,
    matching resetKKTScalings + the ``initialize`` branch at :1559-1562).
    """
    n, p, m = st.n, st.p, st.m
    D = st.dim_kkt
    Dp = fac.L.shape[-1]
    delta = settings.deltastat
    f64 = rhs.dtype

    bx, by, bz = rhs[:n], rhs[n:n + p], rhs[n + p:]
    rhs_pad = jnp.zeros((Dp,), f64).at[:D].set(rhs)

    def residual(xpad):
        dx = xpad[:n]
        dy = xpad[n:n + p]
        dz = xpad[n + p:D]
        # ex = bx - G'dz - A'dy - d*dx   (:1514-1521)
        ex = bx - dz @ G - delta * dx
        if p:
            ex = ex - dy @ A
        # ey = by - A dx + d*dy          (:1524-1531)
        ey = by - A @ dx + delta * dy if p else by
        # ez = bz - G dx + W^2 dz + d*dz (:1533-1566, sign-consistent form)
        Wdz = dz if scal is None else cones.scale2(st.cone, scal, dz)
        ez = bz - G @ dx + Wdz + delta * dz if m else bz
        nerr = jnp.max(jnp.abs(ex)) if n else jnp.asarray(0.0, f64)
        if m:
            nerr = jnp.maximum(nerr, jnp.max(jnp.abs(ez)))
        if p:
            nerr = jnp.maximum(nerr, jnp.max(jnp.abs(ey)))
        e = jnp.zeros((Dp,), f64).at[:D].set(jnp.concatenate([ex, ey, ez]))
        return e, nerr

    x0 = ldl_solve(fac, rhs_pad)
    if D == 0:
        return KKTSolveResult(bx, by, bz, jnp.asarray(0, jnp.int32))

    thresh = (1.0 + jnp.max(jnp.abs(rhs))) * settings.linsysacc
    nitref = settings.nitref
    irerrfact = settings.irerrfact

    def cond(c: _IRCarry):
        return ~c.done

    def body(c: _IRCarry):
        e, nerr = residual(c.x)
        undo = (c.k > 0) & (nerr > c.nerr_prev)
        stop = (undo | (c.k == nitref) | (nerr < thresh)
                | ((c.k > 0) & (c.nerr_prev < irerrfact * nerr)))
        dx_new = ldl_solve(fac, e)
        x = jnp.where(undo, c.x - c.dx_ref,
                      jnp.where(stop, c.x, c.x + dx_new))
        kout = jnp.where(undo, c.k - 1, c.k)
        return _IRCarry(x=x, dx_ref=dx_new, nerr_prev=nerr,
                        k=c.k + 1, kout=kout, done=stop)

    init = _IRCarry(
        x=x0,
        dx_ref=jnp.zeros_like(x0),
        nerr_prev=jnp.asarray(jnp.inf, f64),
        k=jnp.asarray(0, jnp.int32),
        kout=jnp.asarray(0, jnp.int32),
        done=jnp.asarray(False),
    )
    out = lax.while_loop(cond, body, init)
    x = out.x
    return KKTSolveResult(dx=x[:n], dy=x[n:n + p], dz=x[n + p:D],
                          nitref=out.kout)


def factor_kkt(st: ProblemStructure, K, settings) -> LDLFactors:
    """Factor the padded KKT matrix (optionally in reduced precision; the
    refinement loop always runs float64 residuals)."""
    if settings.factor_dtype == "float32":
        fac = ldl_factor(K.astype(jnp.float32), block=settings.block)
        return LDLFactors(L=fac.L.astype(K.dtype), d=fac.d.astype(K.dtype),
                          Linv=fac.Linv.astype(K.dtype), block=fac.block)
    return ldl_factor(K, block=settings.block)
