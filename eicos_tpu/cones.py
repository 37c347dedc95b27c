"""Jordan-algebra operations over K = R^l_+ x SOC(q_1) x ... x SOC(q_N).

Functional re-derivation of the reference's cone layer
(/root/reference/src/eicos.cpp:411-507, 761-805, 1330-1469, 1629-1662) as
flat segment arithmetic: every operation is a handful of fused vector ops +
``segment_sum`` reductions over the whole conic dimension m — no Python/C++
loop over cones at runtime, so the ops vectorize on the VPU and vmap over a
batch axis for free.

Conventions
-----------
* ``u, v, s, z, lam`` are full m-vectors laid out [LP | SOC_0 | ... ].
* ``st`` is a ``ConeStructure`` (static); its NumPy index arrays become
  compiled constants.
* Nesterov-Todd scalings are the ``Scaling`` pytree below.  Unlike the
  reference we never materialize the sparse rank-2 "u/v expansion"
  (/root/reference/src/eicos.cpp:1833-1846): the expansion exists only to
  freeze a sparse CSC pattern, which a dense-block representation doesn't
  need.  We keep the *unexpanded* closed form

      W  = eta  * [ a   q' ; q  I + q q'/(1+a) ]          (per SOC)
      W^2 = eta^2 * [ a^2+w  c q' ; c q  I + d q q' ]

  with w = q'q, c = (1+a) + w/(1+a), d = 1 + 2/(1+a) + w/(1+a)^2 — the same
  scalars the reference derives at /root/reference/src/eicos.cpp:450-470.

Out-of-cone behavior: the reference computes sqrt of cone residuals and
*ignores* the boolean failure flag at the call site
(/root/reference/src/eicos.cpp:1160), so NaNs propagate into the next
iteration's NaN exit check.  We reproduce exactly that: no guards, NaNs flow.
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np

from .structure import ConeStructure


class Scaling(NamedTuple):
    """Nesterov-Todd scaling state (the analogue of LPCone + SOCone structs,
    /root/reference/include/eicos.hpp:75-95)."""

    w_lp: jax.Array    # (l,)   sqrt(s/z)
    v_lp: jax.Array    # (l,)   s/z = w_lp^2
    a: jax.Array       # (n_sc,) wbar_0
    q_flat: jax.Array  # (ms,)  wbar tail, 0 at head positions
    w: jax.Array       # (n_sc,) q'q
    eta: jax.Array     # (n_sc,) (sres/zres)^(1/4)
    eta2: jax.Array    # (n_sc,) eta^2
    cc: jax.Array      # (n_sc,) c = (1+a) + w/(1+a)
    dd: jax.Array      # (n_sc,) d = 1 + 2/(1+a) + w/(1+a)^2


# ---------------------------------------------------------------- helpers

def _seg_sum(st: ConeStructure, x):
    """Per-cone sum over the SOC part: (ms,) -> (n_sc,)."""
    return jax.ops.segment_sum(x, st.seg, num_segments=st.n_sc,
                               indices_are_sorted=True)


def _expand(st: ConeStructure, pc):
    """Broadcast per-cone scalars back to entries: (n_sc,) -> (ms,)."""
    return pc[st.seg]


def _heads(st: ConeStructure, x):
    """Gather cone heads: (ms,) -> (n_sc,)."""
    return x[st.head_offsets]


def _split(st: ConeStructure, x):
    return x[: st.l], x[st.l:]


# ------------------------------------------------------------- NT scaling

def update_scalings(st: ConeStructure, s, z) -> tuple[Scaling, jax.Array]:
    """Compute NT scalings and lam = W z.

    Reference: updateScalings, /root/reference/src/eicos.cpp:411-479.
    Returns (scaling, lambda).
    """
    s_lp, s_s = _split(st, s)
    z_lp, z_s = _split(st, z)

    v_lp = s_lp / z_lp
    w_lp = jnp.sqrt(v_lp)

    if st.n_sc:
        s0 = _heads(st, s_s)
        z0 = _heads(st, z_s)
        # sres = s0^2 - ||s1||^2 = 2*s0^2 - ||s||^2 (:424-427)
        sres = 2.0 * s0 * s0 - _seg_sum(st, s_s * s_s)
        zres = 2.0 * z0 * z0 - _seg_sum(st, z_s * z_s)
        snorm = jnp.sqrt(sres)  # NaN if out of cone — propagates (see module doc)
        znorm = jnp.sqrt(zres)

        skbar = s_s / _expand(st, snorm)
        zkbar = z_s / _expand(st, znorm)

        eta2 = snorm / znorm
        eta = jnp.sqrt(eta2)

        # Normalized NT point (:444-450)
        gamma = jnp.sqrt(0.5 * (1.0 + _seg_sum(st, skbar * zkbar)))
        half_by_gamma = 0.5 / gamma
        a = half_by_gamma * (_heads(st, skbar) + _heads(st, zkbar))
        q_flat = jnp.where(
            np.asarray(st.is_head),
            0.0,
            _expand(st, half_by_gamma) * (skbar - zkbar),
        )
        w = _seg_sum(st, q_flat * q_flat)

        one_a = 1.0 + a
        cc = one_a + w / one_a                      # (:453)
        dd = 1.0 + 2.0 / one_a + w / (one_a * one_a)  # (:454)
    else:
        zf = jnp.zeros((0,), dtype=s.dtype)
        a = w = eta = eta2 = cc = dd = zf
        q_flat = jnp.zeros((0,), dtype=s.dtype)

    scal = Scaling(w_lp=w_lp, v_lp=v_lp, a=a, q_flat=q_flat, w=w,
                   eta=eta, eta2=eta2, cc=cc, dd=dd)
    lam = scale(st, scal, z)
    return scal, lam


def scale(st: ConeStructure, scal: Scaling, z):
    """lam = W z. Reference: scale, /root/reference/src/eicos.cpp:485-507."""
    z_lp, z_s = _split(st, z)
    lam_lp = scal.w_lp * z_lp
    if st.n_sc:
        z0 = _heads(st, z_s)
        zeta = _seg_sum(st, scal.q_flat * z_s)         # q'z1 (:495)
        factor = z0 + zeta / (1.0 + scal.a)            # (:498)
        head_val = scal.eta * (scal.a * z0 + zeta)     # (:501)
        lam_s = jnp.where(
            np.asarray(st.is_head),
            _expand(st, head_val),
            _expand(st, scal.eta) * (z_s + _expand(st, factor) * scal.q_flat),
        )
    else:
        lam_s = z_s
    return jnp.concatenate([lam_lp, lam_s])


def scale_winv_soc(st: ConeStructure, scal: Scaling, x_s):
    """y = W^{-1} x on the (ms,) SOC segment only.

    By the J-symmetry of the normalized NT point (a^2 - w = 1),
    Wbar^{-1} = [a -q'; -q I + qq'/(1+a)] — ``scale``'s SOC branch with
    q -> -q and eta -> 1/eta.  Used by the banded keep_soc strategy's
    NT-scaled kept block (kkt._soc_scaled_kept_vals): the factor solves
    S K S u = S b with S = diag(W^{-1}, I, I), so the kept-row RHS and
    solution are both W^{-1}-transformed.
    """
    if not st.n_sc:
        return x_s
    x0 = _heads(st, x_s)
    zeta = _seg_sum(st, scal.q_flat * x_s)
    factor = x0 - zeta / (1.0 + scal.a)
    inv_eta = 1.0 / scal.eta
    head_val = inv_eta * (scal.a * x0 - zeta)
    return jnp.where(
        np.asarray(st.is_head),
        _expand(st, head_val),
        _expand(st, inv_eta) * (x_s - _expand(st, factor) * scal.q_flat),
    )


def scale2(st: ConeStructure, scal: Scaling, x):
    """y = W^2 x using the unexpanded closed form (module docstring).

    Functional equivalent of scale2add (/root/reference/src/eicos.cpp:1629-1662)
    without the sparse u/v expansion rows.
    """
    x_lp, x_s = _split(st, x)
    y_lp = scal.v_lp * x_lp
    if st.n_sc:
        x0 = _heads(st, x_s)
        qx = _seg_sum(st, scal.q_flat * x_s)  # q'x1 (heads contribute 0)
        head_val = scal.eta2 * ((scal.a * scal.a + scal.w) * x0 + scal.cc * qx)
        tail_coeff = scal.eta2 * (scal.cc * x0 + scal.dd * qx)
        y_s = jnp.where(
            np.asarray(st.is_head),
            _expand(st, head_val),
            _expand(st, scal.eta2) * x_s + _expand(st, tail_coeff) * scal.q_flat,
        )
    else:
        y_s = x_s
    return jnp.concatenate([y_lp, y_s])


def scale2_inv(st: ConeStructure, scal: Scaling, x):
    """y = W^{-2} x in closed form.

    W^{-2} = eta^{-2} * [ a^2+w  -c q' ; -c q  I + d q q' ] with the SAME
    scalars: since Wbar = [a q'; q I + qq'/(1+a)] satisfies
    Wbar^{-1} = [a -q'; -q I + qq'/(1+a)] (J-symmetry of the NT point,
    a^2 - w = 1), W^{-2} is W^2 with q -> -q and eta^2 -> 1/eta^2.
    Used by the reduced KKT strategy.
    """
    x_lp, x_s = _split(st, x)
    y_lp = x_lp / scal.v_lp
    if st.n_sc:
        x0 = _heads(st, x_s)
        qx = _seg_sum(st, scal.q_flat * x_s)
        inv_eta2 = 1.0 / scal.eta2
        head_val = inv_eta2 * ((scal.a * scal.a + scal.w) * x0 - scal.cc * qx)
        tail_coeff = inv_eta2 * (-scal.cc * x0 + scal.dd * qx)
        y_s = jnp.where(
            np.asarray(st.is_head),
            _expand(st, head_val),
            _expand(st, inv_eta2) * x_s + _expand(st, tail_coeff) * scal.q_flat,
        )
    else:
        y_s = x_s
    return jnp.concatenate([y_lp, y_s])


def scale2reg_inv(st: ConeStructure, scal: Scaling, delta: float, x):
    """y = (W^2 + delta*I)^{-1} x in closed form.

    Per SOC block, W^2 = eta^2*I + U C U' with U = [e, q] (q is zero at the
    head, so U'U = diag(1, w)) and C = eta^2 * [[2w, c],[c, d]] — using
    a^2 - w = 1 for the normalized NT point, the head-head excess is
    eta^2(a^2 + w - 1) = 2w*eta^2.  Woodbury then gives

        (W^2 + dI)^{-1} = b*I - b^2 U (C^{-1} + b*U'U)^{-1} U',
        b = 1/(eta^2 + d).

    With delta = 0 this reproduces scale2_inv exactly; with the solver's
    static regularization it makes the reduced KKT strategy the *exact*
    Schur complement of the full regularized system, so iterative
    refinement converges to the same directions as the full path (no
    O(delta * cond(W^2)) stall near convergence).
    """
    x_lp, x_s = _split(st, x)
    y_lp = x_lp / (scal.v_lp + delta)
    y_s = scale2reg_inv_soc(st, scal, delta, x_s) if st.n_sc else x_s
    return jnp.concatenate([y_lp, y_s])


def scale2reg_inv_soc(st: ConeStructure, scal: Scaling, delta: float, x_s):
    """The SOC part of ``scale2reg_inv``: y_s = (W_soc^2 + delta*I)^{-1} x_s
    on the (ms,) SOC segment only (used by the reduced KKT strategy's
    split H formation, where LP rows are handled separately)."""
    b = 1.0 / (scal.eta2 + delta)
    # C entries (per cone scalars)
    c11 = scal.eta2 * (2.0 * scal.w)
    c12 = scal.eta2 * scal.cc
    c22 = scal.eta2 * scal.dd
    detC = c11 * c22 - c12 * c12
    # Cinv = [[c22, -c12], [-c12, c11]] / detC;  M = Cinv + b*diag(1, w)
    m11 = c22 / detC + b
    m12 = -c12 / detC
    m22 = c11 / detC + b * scal.w
    detM = m11 * m22 - m12 * m12
    # U'x = [x_head; q'x]
    u1 = _heads(st, x_s)
    u2 = _seg_sum(st, scal.q_flat * x_s)
    # alpha = Minv @ U'x
    a1 = (m22 * u1 - m12 * u2) / detM
    a2 = (-m12 * u1 + m11 * u2) / detM
    # y = b*x - b^2 * (a1*e + a2*q)
    be = _expand(st, b)
    return be * x_s - be * be * (
        jnp.where(np.asarray(st.is_head), _expand(st, a1), 0.0)
        + _expand(st, a2) * scal.q_flat)


# --------------------------------------------------------- Jordan algebra

def conic_product(st: ConeStructure, u, v):
    """w = u o v and mu = ||w||_1-ish accumulator.

    Reference: conicProduct, /root/reference/src/eicos.cpp:1357-1378.
    Returns (w, mu) where mu = sum |w_lp| + sum_cones |w_head|.
    """
    u_lp, u_s = _split(st, u)
    v_lp, v_s = _split(st, v)
    w_lp = u_lp * v_lp
    mu = jnp.sum(jnp.abs(w_lp))
    if st.n_sc:
        u0 = _heads(st, u_s)
        v0 = _heads(st, v_s)
        w0 = _seg_sum(st, u_s * v_s)  # full-segment dot (:1371)
        mu = mu + jnp.sum(jnp.abs(w0))
        w_s = jnp.where(
            np.asarray(st.is_head),
            _expand(st, w0),
            _expand(st, u0) * v_s + _expand(st, v0) * u_s,
        )
    else:
        w_s = u_s
    return jnp.concatenate([w_lp, w_s]), mu


def conic_division(st: ConeStructure, u, w):
    """v = u \\ w (Jordan inverse product).

    Reference: conicDivision, /root/reference/src/eicos.cpp:1330-1351.
    """
    u_lp, u_s = _split(st, u)
    w_lp, w_s = _split(st, w)
    v_lp = w_lp / u_lp
    if st.n_sc:
        u0 = _heads(st, u_s)
        w0 = _heads(st, w_s)
        # rho = u0^2 - ||u1||^2; zeta = u1' w1 (tails only)
        rho = 2.0 * u0 * u0 - _seg_sum(st, u_s * u_s)
        not_head = ~np.asarray(st.is_head)
        zeta = _seg_sum(st, jnp.where(not_head, u_s * w_s, 0.0))
        factor = (zeta / u0 - w0) / rho
        head_val = (u0 * w0 - zeta) / rho
        v_s = jnp.where(
            np.asarray(st.is_head),
            _expand(st, head_val),
            _expand(st, factor) * u_s + w_s / _expand(st, u0),
        )
    else:
        v_s = w_s
    return jnp.concatenate([v_lp, v_s])


# ------------------------------------------------------------ line search

def line_search(st: ConeStructure, lam, ds, dz, tau, dtau, kap, dkap,
                stepmin: float, stepmax: float):
    """Max step to the cone boundary (scaled variables), saturated.

    Reference: lineSearch, /root/reference/src/eicos.cpp:1380-1469.
    """
    lam_lp, lam_s = _split(st, lam)
    ds_lp, ds_s = _split(st, ds)
    dz_lp, dz_s = _split(st, dz)

    big = 1.0 / 1e-13  # (:1389,1392)
    if st.l > 0:
        rhomin = jnp.min(ds_lp / lam_lp)
        sigmamin = jnp.min(dz_lp / lam_lp)
        alpha = jnp.where(
            -sigmamin > -rhomin,
            jnp.where(sigmamin < 0.0, 1.0 / (-sigmamin), big),
            jnp.where(rhomin < 0.0, 1.0 / (-rhomin), big),
        )
    else:
        alpha = jnp.asarray(10.0, dtype=lam.dtype)  # (:1401)

    # tau / kappa boundary (:1405-1414)
    mtd = -tau / dtau
    mkd = -kap / dkap
    alpha = jnp.where((mtd > 0.0) & (mtd < alpha), mtd, alpha)
    alpha = jnp.where((mkd > 0.0) & (mkd < alpha), mkd, alpha)

    if st.n_sc:
        head = np.asarray(st.is_head)
        lam0 = _heads(st, lam_s)
        lknorm2 = 2.0 * lam0 * lam0 - _seg_sum(st, lam_s * lam_s)
        in_cone = lknorm2 > 0.0  # cones with lknorm2 <= 0 are skipped (:1423)
        safe = jnp.where(in_cone, lknorm2, 1.0)
        lknorm = jnp.sqrt(safe)
        lkbar = lam_s / _expand(st, lknorm)
        lkbar0 = _heads(st, lkbar)
        lknorminv = 1.0 / lknorm

        def conic_norm(d_s):
            d0 = _heads(st, d_s)
            # lkbar' J d = lkbar0*d0 - lkbar1'd1  (:1432-1435)
            lkJd = 2.0 * lkbar0 * d0 - _seg_sum(st, lkbar * d_s)
            rho0 = lknorminv * lkJd
            factor = (lkJd + d0) / (lkbar0 + 1.0)
            tail = jnp.where(
                head, 0.0,
                _expand(st, lknorminv) * (d_s - _expand(st, factor) * lkbar),
            )
            tail_norm = jnp.sqrt(_seg_sum(st, tail * tail))
            return tail_norm - rho0  # (:1445)

        rhonorm = conic_norm(ds_s)
        sigmanorm = conic_norm(dz_s)
        conic_step = jnp.maximum(0.0, jnp.maximum(sigmanorm, rhonorm))
        conic_step = jnp.where(in_cone, conic_step, 0.0)
        # alpha = min(1/conic_step, alpha) where conic_step != 0 (:1457-1460)
        cand = jnp.where(conic_step > 0.0, 1.0 / conic_step, jnp.inf)
        alpha = jnp.minimum(alpha, jnp.min(cand)) if st.n_sc else alpha

    return jnp.clip(alpha, stepmin, stepmax)  # (:1466)


# ------------------------------------------------------------ init helper

def bring_to_cone(st: ConeStructure, r, gamma: float):
    """s = r, or r + (1+alpha)*e if r is not interior.

    Reference: bringToCone, /root/reference/src/eicos.cpp:761-805.
    """
    r_lp, r_s = _split(st, r)
    alpha = jnp.asarray(-gamma, dtype=r.dtype)
    if st.l > 0:
        cand = jnp.where(r_lp <= 0.0, -r_lp, -jnp.inf)
        alpha = jnp.maximum(alpha, jnp.max(cand))
    if st.n_sc:
        r0 = _heads(st, r_s)
        not_head = ~np.asarray(st.is_head)
        tail_norm = jnp.sqrt(_seg_sum(st, jnp.where(not_head, r_s * r_s, 0.0)))
        cres = r0 - tail_norm
        cand = jnp.where(cres <= 0.0, -cres, -jnp.inf)
        alpha = jnp.maximum(alpha, jnp.max(cand))
    alpha = alpha + 1.0
    s_lp = r_lp + alpha
    if st.n_sc:
        s_s = jnp.where(np.asarray(st.is_head), r_s + alpha, r_s)
    else:
        s_s = r_s
    return jnp.concatenate([s_lp, s_s])


# --------------------------------------------------- dense W^2 assembly

def w2_soc_dense(st: ConeStructure, scal: Scaling, dtype):
    """Materialize the SOC part of W^2 as a dense (ms, ms) block.

    diag part + per-cone rank-2 structure via (ms, n_sc) scatter matrices:
        W2 = D + E diag(eta2*c) Q' + Q diag(eta2*c) E' + Q diag(eta2*d) Q'
    where Q[:,k] = q restricted to cone k and E[:,k] = e_{head_k}.
    Used by the full KKT assembly and by the reduced strategy's kept
    (non-eliminated) SOC block.
    """
    diag_soc = jnp.where(
        np.asarray(st.is_head),
        _expand(st, scal.eta2 * (scal.a * scal.a + scal.w)),
        _expand(st, scal.eta2),
    )
    W2 = jnp.diag(diag_soc.astype(dtype))

    # scatter matrices (ms, n_sc)
    onehot = np.zeros((st.ms, st.n_sc), dtype=bool)
    onehot[np.arange(st.ms), np.asarray(st.seg)] = True
    Q = jnp.where(onehot, scal.q_flat[:, None], 0.0).astype(dtype)
    E = jnp.zeros((st.ms, st.n_sc), dtype=dtype).at[
        np.asarray(st.head_offsets), np.arange(st.n_sc)].set(1.0)
    ec = scal.eta2 * scal.cc
    ed = scal.eta2 * scal.dd
    W2 = W2 + E @ (ec[:, None] * Q.T) + Q @ (ec[:, None] * E.T)
    W2 = W2 + Q @ (ed[:, None] * Q.T)
    return W2


def w2_dense(st: ConeStructure, scal: Scaling, dtype):
    """Materialize W^2 as a dense (m, m) block for the full KKT assembly:
    diagonal LP part + the SOC block from ``w2_soc_dense``."""
    m = st.m
    diag = jnp.zeros((m,), dtype=dtype)
    diag = diag.at[: st.l].set(scal.v_lp)
    if st.n_sc == 0:
        return jnp.diag(diag)
    W2 = jnp.diag(diag)
    return W2.at[st.l:, st.l:].set(w2_soc_dense(st, scal, dtype))
