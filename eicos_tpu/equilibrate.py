"""Ruiz-style max-norm equilibration.

Faithful translation of setEquilibration/unsetEquilibration
(/root/reference/src/eicos.cpp:256-404): ``equil_iters`` rounds of
row/column max-abs scaling with SOC row groups collapsed to their *sum*
(:337-344) and sqrt damping guarded at 1e-6 (:347).  Iteration counts (and
hence exit-code tier on borderline problems) are sensitive to this, so the
translation is exact.  On dense arrays the sparse max/scale loops collapse
to plain jnp reductions — structural zeros never win a max and stay zero
under scaling.
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np

from .structure import ProblemStructure


class Equilibration(NamedTuple):
    G: jax.Array       # equilibrated (m, n)
    A: jax.Array       # equilibrated (p, n)
    c: jax.Array       # c / x_equil
    h: jax.Array       # h / G_equil
    b: jax.Array       # b / A_equil
    x_equil: jax.Array  # (n,)
    A_equil: jax.Array  # (p,)
    G_equil: jax.Array  # (m,)


def _sqrt_damped(v):
    """a -> 1 if |a| < 1e-6 else sqrt(a)   (:347)."""
    return jnp.where(jnp.abs(v) < 1e-6, 1.0, jnp.sqrt(v))


def equilibrate(st: ProblemStructure, G, A, c, h, b,
                iters: int = 3) -> Equilibration:
    n, p, m = st.n, st.p, st.m
    dtype = c.dtype

    x_equil = jnp.ones((n,), dtype)
    A_equil = jnp.ones((p,), dtype)
    G_equil = jnp.ones((m,), dtype)

    for _ in range(iters):  # static unroll (:318)
        absA = jnp.abs(A)
        absG = jnp.abs(G)
        # max across columns of A and G jointly (:328-329)
        x_tmp = jnp.zeros((n,), dtype)
        if p:
            x_tmp = jnp.maximum(x_tmp, jnp.max(absA, axis=0))
        if m:
            x_tmp = jnp.maximum(x_tmp, jnp.max(absG, axis=0))
        # max across rows (:331-335)
        A_tmp = jnp.max(absA, axis=1) if n else jnp.zeros((p,), dtype)
        G_tmp = jnp.max(absG, axis=1) if n else jnp.zeros((m,), dtype)

        # collapse SOC rows to the group total (:337-344)
        if st.n_sc:
            soc = G_tmp[st.l:]
            totals = jax.ops.segment_sum(soc, st.cone.seg,
                                         num_segments=st.n_sc,
                                         indices_are_sorted=True)
            G_tmp = G_tmp.at[st.l:].set(totals[st.cone.seg])

        x_tmp = _sqrt_damped(x_tmp)
        A_tmp = _sqrt_damped(A_tmp)
        G_tmp = _sqrt_damped(G_tmp)

        # equilibrate rows then columns (:353-356)
        A = A / A_tmp[:, None] / x_tmp[None, :]
        G = G / G_tmp[:, None] / x_tmp[None, :]

        x_equil = x_equil * x_tmp
        A_equil = A_equil * A_tmp
        G_equil = G_equil * G_tmp

    return Equilibration(
        G=G, A=A,
        c=c / x_equil, h=h / G_equil, b=b / A_equil,   # (:364-371)
        x_equil=x_equil, A_equil=A_equil, G_equil=G_equil,
    )
