"""CPU-runnable tests for the double-single (two-float32) kernel
machinery behind the TPU hot path.

The Pallas kernels themselves are TPU-only (and the grid-carried
scratch kernels are validated on hardware — the interpreter has a
known precision quirk there, see ops/pallas_band_ds.py history), but
their numeric building blocks are plain jax ops testable anywhere:

* the ds_* double-single primitives (Dekker/Knuth error-free
  transforms) and the exact-product chunked ds_matmul;
* the static band-gather index maps that feed the banded kernels
  (checked against the dense KKT assembly they replace);
* the ds GEMV kernel in interpreter mode (no cross-step scratch).
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp


def _split64(x):
    hi = np.asarray(x, np.float64).astype(np.float32)
    lo = (np.asarray(x, np.float64) - hi.astype(np.float64)).astype(
        np.float32)
    return jnp.asarray(hi), jnp.asarray(lo)


def test_ds_primitives_accuracy():
    from eicos_tpu.ops.pallas_leaf_ds import ds_add, ds_div, ds_mul, ds_outer

    rng = np.random.default_rng(0)
    a = rng.standard_normal((64, 64)) * np.exp(rng.uniform(-9, 9, (64, 64)))
    b = rng.standard_normal((64, 64)) * np.exp(rng.uniform(-9, 9, (64, 64)))
    ah, al = _split64(a)
    bh, bl = _split64(b)
    with jax.enable_x64(False):
        mh, ml = ds_mul(ah, al, bh, bl)
        sh, sl = ds_add(ah, al, bh, bl)
        qh, ql = ds_div(ah, al, bh, bl)
        col = rng.standard_normal((64, 1)) * 1e5
        row = rng.standard_normal((1, 64)) * 1e-5
        ch, cl = _split64(col)
        rh, rl = _split64(row)
        oh, ol = ds_outer(ch, cl, rh, rl)

    def back(h, l):
        return np.asarray(h, np.float64) + np.asarray(l, np.float64)

    assert np.abs((back(mh, ml) - a * b) / (a * b)).max() < 1e-13
    rel = np.abs(back(sh, sl) - (a + b)) / np.maximum(np.abs(a + b), 1e-30)
    # additive cancellation can only be exact to the inputs' own 2^-48
    assert np.median(rel) < 1e-14
    assert np.abs((back(qh, ql) - a / b) / (a / b)).max() < 1e-12
    assert np.abs((back(oh, ol) - col * row) / (col * row)).max() < 1e-13


def test_ds_matmul_accuracy():
    from eicos_tpu.ops.pallas_band_ds import ds_matmul

    rng = np.random.default_rng(1)
    A = rng.standard_normal((128, 128)) * np.exp(
        rng.uniform(-6, 6, (128, 1)))
    Bm = rng.standard_normal((128, 128)) * np.exp(
        rng.uniform(-6, 6, (128, 1)))
    ah, al = _split64(A)
    bh, bl = _split64(Bm)
    with jax.enable_x64(False):
        ch, cl = ds_matmul(ah, al, bh, bl)
        th, tl = ds_matmul(ah, al, bh, bl, transpose_b=True)
    got = np.asarray(ch, np.float64) + np.asarray(cl, np.float64)
    ref = A @ Bm
    assert np.abs(got - ref).max() / np.abs(ref).max() < 1e-13
    gt = np.asarray(th, np.float64) + np.asarray(tl, np.float64)
    rt = A @ Bm.T
    assert np.abs(gt - rt).max() / np.abs(rt).max() < 1e-13


def test_band_gather_matches_dense_assembly():
    """The static index maps that feed the banded kernels reproduce the
    exact blocks of the dense [H A'; A -dI] assembly they replaced."""
    from eicos_tpu import corpus, kkt
    from eicos_tpu.plan import make_band_plan
    from eicos_tpu.settings import Settings

    st, prob = corpus.make_mpc_like(horizon=20, nx=2, nu=3, seed=2)
    plan = make_band_plan(st, prob.G, prob.A)
    assert plan.bwb == 1  # the MPC staircase
    n, p = st.n, st.p
    Dp = plan.dim
    settings = Settings(kkt_strategy="banded")
    delta = settings.deltastat

    rng = np.random.default_rng(3)
    H = rng.standard_normal((n, n))
    H = H + H.T + 10.0 * np.eye(n)
    A = np.asarray(prob.A, np.float64)

    # dense reference
    D = n + p
    K = np.zeros((Dp, Dp))
    K[:n, :n] = H
    K[:n, n:D] = A.T
    K[n:D, :n] = A
    K[n:D, n:D] = -delta * np.eye(p)
    K[D:, D:] = np.eye(Dp - D)
    perm = np.asarray(plan.perm)
    Kp = K[perm][:, perm]

    idx_diag, idx_subs = kkt._band_gather_idx(
        n, p, Dp, tuple(int(v) for v in perm))
    idx_sub = idx_subs[0]
    flatsrc = np.concatenate([H.ravel(), A.ravel(),
                              [-delta, 0.0, 1.0]])
    nb = Dp // 128
    for k in range(nb):
        blk = Kp[k * 128:(k + 1) * 128, k * 128:(k + 1) * 128]
        np.testing.assert_allclose(flatsrc[idx_diag[k]], blk, rtol=0)
        if k:
            sub = Kp[k * 128:(k + 1) * 128, (k - 1) * 128:k * 128]
            np.testing.assert_allclose(flatsrc[idx_sub[k]], sub, rtol=0)


def test_gemv_kernel_interpret():
    """ds GEMV kernel through the Pallas interpreter (no cross-step
    scratch, so the interpreter is numerically faithful here)."""
    from eicos_tpu.ops import pallas_gemm_ds as g

    if not g._HAS_PALLAS:
        pytest.skip("pallas not importable")
    rng = np.random.default_rng(4)
    k, n = 384, 256
    Bm = rng.standard_normal((k, n)) * np.exp(rng.uniform(-5, 5, (k, 1)))
    a = rng.standard_normal((3, k))
    # route BigOperand through an interpret-mode pallas_call
    import functools

    orig = g._gemv_call

    @functools.lru_cache(maxsize=8)
    def interp_call(R, kp, npad):
        # mirrors _gemv_call's row-tiled 2-D grid, in interpret mode
        nn = npad // g.B
        RB = min(R, g.RB_MAX)
        nr = R // RB
        import jax.experimental.pallas as pl
        from jax.experimental.pallas import tpu as pltpu
        spec_a = pl.BlockSpec((RB, kp), lambda j, r: (r, 0),
                              memory_space=pltpu.VMEM)
        spec_b = pl.BlockSpec((kp, g.B), lambda j, r: (0, j),
                              memory_space=pltpu.VMEM)
        spec_o = pl.BlockSpec((1, RB, g.B), lambda j, r: (j, r, 0),
                              memory_space=pltpu.VMEM)
        kern = functools.partial(g._gemv_kernel, RB)

        def call(ah, al, bh, bl):
            with jax.enable_x64(False):
                return pl.pallas_call(
                    kern, grid=(nn, nr),
                    in_specs=[spec_a, spec_a, spec_b, spec_b],
                    out_specs=(spec_o, spec_o),
                    out_shape=(jax.ShapeDtypeStruct(
                        (nn, nr * RB, g.B), jnp.float32),) * 2,
                    interpret=True,
                )(ah, al, bh, bl)

        return call

    g._gemv_call = interp_call
    try:
        op = g.BigOperand(jnp.asarray(Bm))
        out = np.asarray(jax.device_get(op.rmatmul(jnp.asarray(a))))
    finally:
        g._gemv_call = orig
    ref = a @ Bm
    assert np.abs(out - ref).max() / np.abs(ref).max() < 1e-12


def test_gemv_cached_kernel_bit_identical():
    """The b-panel chunk-caching GEMV kernel (_gemv_kernel_cached —
    the nr > 1 square-GEMM path) is bit-identical to the plain kernel:
    same _chunks_scaled values, and _ds_matmul_pre's per-group f32
    pair sums equal ds_matmul's concatenated 256-term dots exactly."""
    import functools

    import jax.experimental.pallas as pl
    from jax.experimental.pallas import tpu as pltpu
    from eicos_tpu.ops import pallas_gemm_ds as g

    if not g._HAS_PALLAS:
        pytest.skip("pallas not importable")
    rng = np.random.default_rng(9)
    R, kp, npad = 256, 256, 256     # nr = 2: exercises the cache reuse
    A = rng.standard_normal((R, kp)) * np.exp(rng.uniform(-6, 6, (R, 1)))
    Bm = rng.standard_normal((kp, npad)) * np.exp(
        rng.uniform(-6, 6, (kp, 1)))
    ah, al = _split64(A)
    bh, bl = _split64(Bm)

    nn = npad // g.B
    RB = min(R, g.RB_MAX)
    nr = R // RB
    spec_a = pl.BlockSpec((RB, kp), lambda j, r: (r, 0),
                          memory_space=pltpu.VMEM)
    spec_b = pl.BlockSpec((kp, g.B), lambda j, r: (0, j),
                          memory_space=pltpu.VMEM)
    spec_o = pl.BlockSpec((1, RB, g.B), lambda j, r: (j, r, 0),
                          memory_space=pltpu.VMEM)

    def run(kern, scratch):
        with jax.enable_x64(False):
            return pl.pallas_call(
                functools.partial(kern, RB), grid=(nn, nr),
                in_specs=[spec_a, spec_a, spec_b, spec_b],
                out_specs=(spec_o, spec_o),
                out_shape=(jax.ShapeDtypeStruct(
                    (nn, nr * RB, g.B), jnp.float32),) * 2,
                scratch_shapes=scratch,
                interpret=True,
            )(ah, al, bh, bl)

    oh0, ol0 = run(g._gemv_kernel, [])
    oh1, ol1 = run(g._gemv_kernel_cached,
                   [pltpu.VMEM((g._NCHUNK * kp, g.B), jnp.bfloat16),
                    pltpu.VMEM((kp // g.B, g.B), jnp.float32)])
    assert np.array_equal(np.asarray(oh0), np.asarray(oh1))
    assert np.array_equal(np.asarray(ol0), np.asarray(ol1))
    got = (np.asarray(oh1, np.float64)
           + np.asarray(ol1, np.float64)).transpose(1, 0, 2).reshape(
               R, npad)
    ref = A @ Bm
    assert np.abs(got - ref).max() / np.abs(ref).max() < 1e-12


def test_blocked_leaf_elimination():
    """The blocked-panel leaf (16-column panels + small-K chunked MXU
    trailing updates, ops/pallas_band_ds._leaf_eliminate_blocked) agrees
    with the plain rank-1 double-single loop on a wide-dynamic-range
    quasidefinite block.

    Accuracy note: the panel GEMMs' truncation is scale-relative (2^-56
    below the sqrt|d|-balanced row/col maxima), not elementwise like the
    plain loop — reconstruction lands ~1e-10 instead of ~1e-14 at
    diagonal spread e^{+-9.2}, and float64 iterative refinement against
    the exact operator absorbs the difference (measured contraction
    ~6e-9/round on hardware at spread e^{+-18})."""
    from eicos_tpu.ops.pallas_band_ds import (B, _leaf_eliminate,
                                              _leaf_eliminate_blocked)

    rng = np.random.default_rng(0)
    A = rng.standard_normal((B, B)) * 0.2
    s = np.exp(rng.uniform(-9.2, 9.2, B)) * np.sign(
        rng.standard_normal(B))
    M = (A + A.T) / 2 + np.diag(s * 8)
    hi, lo = _split64(M)
    with jax.enable_x64(False):
        (dh, dl), (Xh, Xl) = jax.jit(_leaf_eliminate_blocked)(hi, lo)
        (_, _), (dh0, dl0), (Xh0, Xl0) = jax.jit(_leaf_eliminate)(hi, lo)

    d = np.asarray(dh, np.float64)[0] + np.asarray(dl, np.float64)[0]
    X = np.asarray(Xh, np.float64) + np.asarray(Xl, np.float64)
    d0 = np.asarray(dh0, np.float64)[0] + np.asarray(dl0, np.float64)[0]
    X0 = np.asarray(Xh0, np.float64) + np.asarray(Xl0, np.float64)

    # reconstruction through the inverse: inv(X) d inv(X)^T == M
    L = np.linalg.inv(X)
    rec = L @ np.diag(d) @ L.T
    assert np.abs(rec - M).max() / np.abs(M).max() < 1e-8
    # unit-lower structure of the inverse
    assert np.allclose(np.diag(X), 1.0)
    assert np.abs(np.triu(X, 1)).max() == 0.0
    # agreement with the elementwise-accurate plain loop
    assert np.max(np.abs(d - d0) / (np.abs(d0) + 1e-300)) < 1e-2
    assert np.abs(X - X0).max() / (1 + np.abs(X0).max()) < 1e-2


def test_band_scatter_matches_dense_gather():
    """The direct band-block H scatter (kkt._band_scatter_idx — used on
    the TPU kernel path to avoid materializing the dense per-lane H)
    reproduces the dense-assembly gather exactly."""
    from eicos_tpu import corpus, kkt
    from eicos_tpu.plan import make_band_plan
    from eicos_tpu.settings import Settings

    st, base = corpus.make_mpc_like(horizon=20, nx=2, nu=3, seed=2)
    st = st.with_gsplit(base.G)
    plan = make_band_plan(st, base.G, base.A)
    split = st.gsplit
    assert not split.dense_rows
    n, p, m = st.n, st.p, st.m
    Dp = plan.dim
    delta = Settings(kkt_strategy="banded").deltastat
    G = np.asarray(base.G)
    A = np.asarray(base.A)
    rng = np.random.default_rng(5)
    winv = np.exp(rng.uniform(-3, 3, m))

    H = G.T @ (G * winv[:, None]) + delta * np.eye(n)
    perm = tuple(int(v) for v in plan.perm)
    (dmask, dih, dio), [(smask, sih, sio)] = kkt._band_gather_split(
        n, p, Dp, perm)
    other = np.concatenate([A.ravel(), [-delta, 0.0, 1.0]])
    Kd_ref = np.where(dmask, H.ravel()[dih], other[dio])
    Ks_ref = np.where(smask, H.ravel()[sih], other[sio])

    idx = kkt._band_scatter_idx(n, p, Dp, perm, split.sing_cols,
                                split.spr_cols, split.spr_width)
    vals = []
    if split.n_spr:
        w = split.spr_width
        spr = np.asarray(split.spr_rows)
        cols2 = np.asarray(split.spr_cols, np.int64).reshape(-1, w)
        Gpad = np.concatenate([G, np.zeros((m, 1))], axis=1)
        C = Gpad[spr[:, None], cols2]
        vals.append((C[:, :, None] * C[:, None, :]
                     * winv[spr][:, None, None]).ravel())
    sing = np.asarray(split.sing_rows)
    scol = np.asarray(split.sing_cols)
    if sing.size:
        coef = G[sing, scol]
        vals.append(coef * coef * winv[sing])
    vals.append(np.full(n, delta))
    vals = np.concatenate(vals)
    assert len(vals) == len(idx)
    nbb = (Dp // 128) * 128 * 128
    buf = np.zeros(2 * nbb)
    np.add.at(buf, idx, vals)
    buf[nbb] = 0.0    # dump slot: Ksub[0][0, 0], ignored by the kernels
    Kd = (np.where(dmask, 0.0, other[dio])
          + buf[:nbb].reshape(-1, 128, 128))
    Ks = (np.where(smask, 0.0, other[sio])
          + buf[nbb:2 * nbb].reshape(-1, 128, 128))
    assert np.abs(Kd - Kd_ref).max() < 1e-12
    assert np.abs(Ks - Ks_ref).max() < 1e-12


def test_soc_band_scatter_matches_dense():
    """The SOC extension of the direct band scatter (kkt._band_scatter_vals
    + structure.SOCSplit) reproduces the dense
    H = G' (W^2+dI)^{-1} G + delta I assembly exactly, with a real NT
    scaling.  Covers both the MPC-SOC family and issue98 (a cone-only
    support with ZERO singleton rows — regression for the float64
    empty-indexer crash)."""
    import pytest
    from eicos_tpu import cones, corpus, kkt
    from eicos_tpu.plan import make_band_plan
    from eicos_tpu.settings import Settings

    for case in ("mpc_soc", "issue98"):
        if case == "mpc_soc":
            st, base = corpus.make_mpc_soc(horizon=12, nx=2, nu=3, seed=4)
        else:
            st, base, _ = corpus.load("issue98")
        st = st.with_gsplit(base.G)
        plan = make_band_plan(st, base.G, base.A)
        st = st.with_band_plan(plan)
        if st.socsplit is None or st.gsplit is None:
            pytest.skip(f"{case}: no scatter support")
        n, p, m, l = st.n, st.p, st.m, st.l
        Dp = plan.dim
        delta = Settings(kkt_strategy="banded").deltastat
        G = jnp.asarray(np.asarray(base.G))
        rng = np.random.default_rng(9)

        def interior(msz):
            x = np.abs(rng.standard_normal(msz)) + 0.5
            offs = st.cone.head_offsets
            for c in range(st.cone.n_sc):
                a = l + int(offs[c])
                b = a + st.cone.q[c]
                x[a + 1:b] *= 0.3
                x[a] = np.linalg.norm(x[a + 1:b]) + 1.0
            return jnp.asarray(x)

        scal, _ = cones.update_scalings(st.cone, interior(m), interior(m))

        winv_lp = 1.0 / (np.asarray(scal.v_lp) + delta)
        Glp = np.asarray(G)[:l]
        H = Glp.T @ (Glp * winv_lp[:, None]) + delta * np.eye(n)
        G_soc = G[l:]
        WiG_soc = jax.vmap(lambda col: cones.scale2reg_inv_soc(
            st.cone, scal, delta, col))(G_soc.T).T
        H = H + np.asarray(G_soc.T @ WiG_soc)

        perm = tuple(int(v) for v in plan.perm)
        (dmask, dih, dio), [(smask, sih, sio)] = kkt._band_gather_split(
            n, p, Dp, perm)
        other = np.concatenate([np.asarray(base.A).ravel(),
                                [-delta, 0.0, 1.0]])
        Kd_ref = np.where(dmask, H.ravel()[dih], other[dio])
        Ks_ref = np.where(smask, H.ravel()[sih], other[sio])

        split = st.gsplit
        idx = kkt._band_scatter_idx(n, p, Dp, perm, split.sing_cols,
                                    split.spr_cols, split.spr_width,
                                    st.socsplit.cols, st.socsplit.width)
        vals = np.asarray(kkt._band_scatter_vals(
            st, split, G, jnp.asarray(winv_lp), scal, delta, jnp.float64))
        assert len(vals) == len(idx), case
        nbb = (Dp // 128) * 128 * 128
        buf = np.zeros(2 * nbb)
        np.add.at(buf, idx, vals)
        buf[nbb] = 0.0  # dump slot: Ksub[0][0, 0], ignored by the kernels
        Kd = (np.where(dmask, 0.0, other[dio])
              + buf[:nbb].reshape(-1, 128, 128))
        Ks = (np.where(smask, 0.0, other[sio])
              + buf[nbb:2 * nbb].reshape(-1, 128, 128))
        scale = max(1.0, np.abs(Kd_ref).max())
        assert np.abs(Kd - Kd_ref).max() < 1e-10 * scale, case
        assert np.abs(Ks - Ks_ref).max() < 1e-10, case


def _dense_winv(cone, scal):
    """Per-cone dense W^-1 from the closed-form scaling fields
    (Wbar^{-1} = [a -q'; -q I + qq'/(1+a)], W^-1 = Wbar^{-1}/eta)."""
    ms = cone.ms
    a = np.asarray(scal.a)
    qf = np.asarray(scal.q_flat)
    eta = np.asarray(scal.eta)
    offs = np.asarray(cone.head_offsets)
    Winv = np.zeros((ms, ms))
    for c in range(cone.n_sc):
        o, d = int(offs[c]), int(cone.q[c])
        q1 = qf[o + 1:o + d]
        Wb = np.zeros((d, d))
        Wb[0, 0] = a[c]
        Wb[0, 1:] = -q1
        Wb[1:, 0] = -q1
        Wb[1:, 1:] = np.eye(d - 1) + np.outer(q1, q1) / (1.0 + a[c])
        Winv[o:o + d, o:o + d] = Wb / eta[c]
    return Winv


def _interior(rng, cone, l, msz):
    x = np.abs(rng.standard_normal(msz)) + 0.5
    offs = cone.head_offsets
    for c in range(cone.n_sc):
        a = l + int(offs[c])
        b = a + cone.q[c]
        x[a + 1:b] *= 0.3
        x[a] = np.linalg.norm(x[a + 1:b]) + 1.0
    return jnp.asarray(x)


def test_scale_winv_soc_inverts_scale():
    """cones.scale_winv_soc is the exact inverse of the SOC part of
    cones.scale (W^{-1} W z == z), and matches the dense closed-form
    W^{-1}."""
    from eicos_tpu import cones, corpus

    st, base = corpus.make_mpc_soc(horizon=8, nx=2, nu=3, seed=6)
    l, m = st.l, st.m
    rng = np.random.default_rng(11)
    scal, _ = cones.update_scalings(st.cone, _interior(rng, st.cone, l, m),
                                    _interior(rng, st.cone, l, m))
    z = np.asarray(rng.standard_normal(m))
    lam_s = np.asarray(cones.scale(st.cone, scal, jnp.asarray(z)))[l:]
    back = np.asarray(cones.scale_winv_soc(st.cone, scal,
                                           jnp.asarray(lam_s)))
    assert np.abs(back - z[l:]).max() < 1e-10 * (1 + np.abs(z).max())
    Winv = _dense_winv(st.cone, scal)
    ref = Winv @ np.asarray(rng.standard_normal(st.cone.ms))
    x = jnp.asarray(np.linalg.solve(Winv, ref))
    assert np.abs(np.asarray(cones.scale_winv_soc(st.cone, scal, x))
                  - ref).max() < 1e-10 * (1 + np.abs(ref).max())


def test_keep_soc_scaled_scatter_matches_dense():
    """The NT-scaled keep_soc band scatter (kkt._soc_scaled_kept_vals +
    _soc_coupling_vals + the keep_q part of _band_scatter_idx)
    reproduces the dense S K S assembly (S = diag(W^-1, I, I)) exactly,
    and the band plan covers every nonzero."""
    from eicos_tpu import cones, corpus, kkt
    from eicos_tpu.plan import make_band_plan
    from eicos_tpu.settings import Settings

    st, base = corpus.make_mpc_soc(horizon=12, nx=2, nu=3, seed=4)
    st = st.with_gsplit(base.G)
    plan = make_band_plan(st, base.G, base.A, keep_soc=True)
    st = st.with_band_plan(plan)
    assert plan.keep_soc and st.socsplit is not None
    n, p, m, l = st.n, st.p, st.m, st.l
    ms = st.cone.ms
    D = ms + n + p
    Dp = plan.dim
    delta = Settings(kkt_strategy="banded").deltastat
    G = jnp.asarray(np.asarray(base.G))
    A = np.asarray(base.A)
    rng = np.random.default_rng(9)
    scal, _ = cones.update_scalings(st.cone, _interior(rng, st.cone, l, m),
                                    _interior(rng, st.cone, l, m))

    # dense NT-scaled reference in [z_soc | x | y]
    winv_lp = 1.0 / (np.asarray(scal.v_lp) + delta)
    Glp, Gsoc = np.asarray(G)[:l], np.asarray(G)[l:]
    H = Glp.T @ (Glp * winv_lp[:, None]) + delta * np.eye(n)
    Winv = _dense_winv(st.cone, scal)
    M = np.zeros((Dp, Dp))
    M[:ms, :ms] = -(np.eye(ms) + delta * (Winv @ Winv))
    M[:ms, ms:ms+n] = Winv @ Gsoc
    M[ms:ms+n, :ms] = M[:ms, ms:ms+n].T
    M[ms:ms+n, ms:ms+n] = H
    if p:
        M[ms:ms+n, ms+n:D] = A.T
        M[ms+n:D, ms:ms+n] = A
        M[ms+n:D, ms+n:D] = -delta * np.eye(p)
    for i in range(D, Dp):
        M[i, i] = 1.0
    perm = np.asarray(plan.perm)
    Mp = M[perm][:, perm]
    nb = Dp // 128
    Kd_ref = np.stack([Mp[k*128:(k+1)*128, k*128:(k+1)*128]
                       for k in range(nb)])
    Ks_ref = np.zeros_like(Kd_ref)
    band_cover = np.zeros_like(Mp)
    for k in range(nb):
        band_cover[k*128:(k+1)*128, k*128:(k+1)*128] = 1
        if k:
            Ks_ref[k] = Mp[k*128:(k+1)*128, (k-1)*128:k*128]
            band_cover[k*128:(k+1)*128, (k-1)*128:k*128] = 1
            band_cover[(k-1)*128:k*128, k*128:(k+1)*128] = 1
    assert np.abs(Mp * (1 - band_cover)).max() == 0.0, (
        "keep_soc plan does not cover the scaled pattern")

    # scatter-path assembly (mirrors kkt.factor's direct_band branch)
    permt = tuple(int(v) for v in plan.perm)
    (dmask, dih, dio), [(smask, sih, sio)] = kkt._band_gather_split(
        n, p, Dp, permt, 1, ms)
    other = np.concatenate([A.ravel(), [-delta, 0.0, 1.0]])
    split = st.gsplit
    idx = kkt._band_scatter_idx(n, p, Dp, permt, split.sing_cols,
                                split.spr_cols, split.spr_width,
                                st.socsplit.cols, st.socsplit.width,
                                st.q)
    vals = np.asarray(kkt._band_scatter_vals(
        st, split, G, jnp.asarray(winv_lp), scal, delta, jnp.float64,
        keep_soc=True))
    assert len(vals) == len(idx), (len(vals), len(idx))
    nbb = nb * 128 * 128
    buf = np.zeros(2 * nbb)
    np.add.at(buf, idx, vals)
    buf[nbb] = 0.0    # dump slot: Ksub[0][0, 0], ignored by the kernels
    Kd = np.where(dmask, 0.0, other[dio]) + buf[:nbb].reshape(-1, 128, 128)
    Ks = (np.where(smask, 0.0, other[sio])
          + buf[nbb:2*nbb].reshape(-1, 128, 128))
    scale = max(1.0, np.abs(Kd_ref).max())
    assert np.abs(Kd - Kd_ref).max() < 1e-10 * scale
    assert np.abs(Ks - Ks_ref).max() < 1e-10 * scale


def test_batched_leaf_matches_single():
    """_leaf_eliminate_blocked_b (the lane-tiled kernel's leaf) matches
    the per-lane blocked leaf exactly, lane by lane."""
    from eicos_tpu.ops.pallas_band_ds import (
        B, _leaf_eliminate_blocked, _leaf_eliminate_blocked_b)

    rng = np.random.default_rng(7)
    T = 4
    Ms = np.empty((T, B, B))
    for t in range(T):
        A = rng.standard_normal((B, B)) * 0.2
        s = np.exp(rng.uniform(-8, 8, B)) * np.sign(
            rng.standard_normal(B))
        Ms[t] = (A + A.T) / 2 + np.diag(s * 4)
    hi, lo = _split64(Ms)
    with jax.enable_x64(False):
        (dh, dl), (Xh, Xl) = jax.jit(_leaf_eliminate_blocked_b)(hi, lo)
        for t in range(T):
            (dh1, dl1), (Xh1, Xl1) = jax.jit(_leaf_eliminate_blocked)(
                hi[t], lo[t])
            np.testing.assert_array_equal(np.asarray(dh[t]),
                                          np.asarray(dh1))
            np.testing.assert_array_equal(np.asarray(Xh[t]),
                                          np.asarray(Xh1))
            # low parts may differ at refusion level only; require tight
            np.testing.assert_allclose(np.asarray(dl[t]),
                                       np.asarray(dl1), atol=0, rtol=0)
            np.testing.assert_allclose(np.asarray(Xl[t]),
                                       np.asarray(Xl1), atol=0, rtol=0)


def test_batched_ds_matmul_matches_single():
    from eicos_tpu.ops.pallas_band_ds import ds_matmul, _ds_matmul_b

    rng = np.random.default_rng(8)
    T = 4
    A = rng.standard_normal((T, 128, 128)) * np.exp(
        rng.uniform(-6, 6, (T, 128, 1)))
    Bm = rng.standard_normal((T, 128, 128)) * np.exp(
        rng.uniform(-6, 6, (T, 128, 1)))
    ah, al = _split64(A)
    bh, bl = _split64(Bm)
    with jax.enable_x64(False):
        ch, cl = jax.jit(lambda *a: _ds_matmul_b(*a, T=T))(ah, al, bh, bl)
        for t in range(T):
            rh, rl = jax.jit(lambda *a: ds_matmul(*a, transpose_b=True))(
                ah[t], al[t], bh[t], bl[t])
            np.testing.assert_array_equal(np.asarray(ch[t]),
                                          np.asarray(rh))
            np.testing.assert_array_equal(np.asarray(cl[t]),
                                          np.asarray(rl))


def test_prechunked_matmul_bit_identical():
    """_ds_matmul_pre against prechunk_band_fac's stored chunks is
    BIT-identical to ds_matmul on the (hi, lo) operand, both
    orientations — the refinement solves may not change by one ulp when
    the factor chunking is hoisted out of the solve kernels."""
    from eicos_tpu.ops.pallas_band_ds import (KP, _NCHUNK,
                                              _ds_matmul_pre, ds_matmul,
                                              prechunk_band_fac)

    rng = np.random.default_rng(9)
    nb = 3
    L = rng.standard_normal((nb, 128, 128)) * np.exp(
        rng.uniform(-8, 8, (nb, 128, 1)))
    Di = rng.standard_normal((nb, 128, 128)) * np.exp(
        rng.uniform(-8, 8, (nb, 1, 128)))
    d = rng.standard_normal((nb, 8, 128))
    Lh, Ll = _split64(L)
    Dih, Dil = _split64(Di)
    fac = (Lh, Ll, Dih, Dil, jnp.asarray(d, jnp.float32),
           jnp.zeros_like(jnp.asarray(d, jnp.float32)))
    a = rng.standard_normal((KP, 128))
    ah, al = _split64(a)
    with jax.enable_x64(False):
        pre = jax.jit(prechunk_band_fac)(fac)
        assert pre.lc1.shape == (nb, _NCHUNK * 128, 128)
        assert pre.lc1.dtype == jnp.bfloat16
        assert pre.ls1.shape == (nb, 8, 128)
        for k in range(nb):
            # fwd orientation: a @ L_k^T (chunks along axis -1)
            rh, rl = jax.jit(
                lambda *x: ds_matmul(*x, transpose_b=True))(
                ah, al, Lh[k], Ll[k])
            c = tuple(pre.lc1[k, t * 128:(t + 1) * 128]
                      for t in range(_NCHUNK))
            ph, plo = jax.jit(lambda av, bv, c=c, s=pre.ls1[k]:
                              _ds_matmul_pre(av, bv, lambda t: c[t],
                                             s[0:1], True))(ah, al)
            np.testing.assert_array_equal(np.asarray(ph), np.asarray(rh))
            np.testing.assert_array_equal(np.asarray(plo), np.asarray(rl))
            # bwd orientation: a @ Dinv_k (chunks along axis -2)
            rh, rl = jax.jit(ds_matmul)(ah, al, Dih[k], Dil[k])
            c = tuple(pre.dc0[k, t * 128:(t + 1) * 128]
                      for t in range(_NCHUNK))
            ph, plo = jax.jit(lambda av, bv, c=c, s=pre.ds0[k]:
                              _ds_matmul_pre(av, bv, lambda t: c[t],
                                             s[0:1], False))(ah, al)
            np.testing.assert_array_equal(np.asarray(ph), np.asarray(rh))
            np.testing.assert_array_equal(np.asarray(plo), np.asarray(rl))


def test_split_operand_pre_solve_bit_identical():
    """band_solve_ds_pre (factor chunks as separate operands — the
    stacked layout cost XLA three 59 MB copies per IPM iteration) is
    bit-identical to band_solve_ds in interpret mode.  The interpreter's
    grid-scratch precision quirk affects both kernels equally, so the
    comparison is still exact."""
    from eicos_tpu.ops.pallas_band_ds import (_HAS_PALLAS, B, KP,
                                              _band_factor_ds_impl,
                                              band_solve_ds,
                                              band_solve_ds_pre,
                                              prechunk_band_fac)

    if not _HAS_PALLAS:
        pytest.skip("pallas not importable")
    rng = np.random.default_rng(3)
    nb = 4
    D = nb * B
    Kd = np.zeros((nb, B, B))
    Ks = np.zeros((nb, B, B))
    for k in range(nb):
        M = rng.standard_normal((B, B))
        Kd[k] = M @ M.T + 50 * np.eye(B)
        if k:
            Ks[k] = 0.1 * rng.standard_normal((B, B))
    fac = _band_factor_ds_impl(jnp.asarray(Kd), jnp.asarray(Ks),
                               interpret=True)
    rhs = rng.standard_normal((KP, D))
    x0 = band_solve_ds(fac, jnp.asarray(rhs), interpret=True)
    pre = prechunk_band_fac(fac)
    x1 = band_solve_ds_pre(pre, jnp.asarray(rhs), interpret=True)
    np.testing.assert_array_equal(np.asarray(x0), np.asarray(x1))


def test_lane_tiled_pre_solve_bit_identical():
    """_band_solve_pre_batch (T_SOLVE lanes per grid program — the
    custom_vmap target under the solver's lane vmap) is bit-identical
    to a per-lane loop of band_solve_ds_pre, including the padded-lane
    case (L not a multiple of T)."""
    from eicos_tpu.ops.pallas_band_ds import (_HAS_PALLAS, B, KP,
                                              _band_factor_ds_impl,
                                              _band_solve_ds_pre_impl,
                                              _band_solve_pre_batch,
                                              prechunk_band_fac)

    if not _HAS_PALLAS:
        pytest.skip("pallas not importable")
    rng = np.random.default_rng(13)
    nb, L, T = 3, 5, 2          # L % T != 0: exercises lane padding
    D = nb * B
    facs = []
    for _ in range(L):
        Kd = np.zeros((nb, B, B))
        Ks = np.zeros((nb, B, B))
        for k in range(nb):
            M = rng.standard_normal((B, B)) * np.exp(
                rng.uniform(-3, 3, (B, 1)))
            Kd[k] = M @ M.T + 50 * np.eye(B)
            if k:
                Ks[k] = 0.1 * rng.standard_normal((B, B))
        facs.append(_band_factor_ds_impl(jnp.asarray(Kd),
                                         jnp.asarray(Ks),
                                         interpret=True))
    pres = [prechunk_band_fac(f) for f in facs]
    rhs = rng.standard_normal((L, KP, D))
    want = np.stack([
        np.asarray(_band_solve_ds_pre_impl(pres[i],
                                           jnp.asarray(rhs[i]),
                                           interpret=True))
        for i in range(L)])
    pre_b = jax.tree_util.tree_map(lambda *xs: jnp.stack(xs), *pres)
    got = np.asarray(_band_solve_pre_batch(pre_b, jnp.asarray(rhs),
                                           T=T, interpret=True))
    np.testing.assert_array_equal(got, want)


def test_pre_solve_custom_vmap_dispatch():
    """Under jax.vmap the public band_solve_ds_pre routes to the
    lane-tiled batch kernel and returns the per-lane results."""
    from eicos_tpu.ops import pallas_band_ds as pbd

    if not pbd._HAS_PALLAS:
        pytest.skip("pallas not importable")
    if not hasattr(pbd, "_band_solve_ds_pre_cv"):
        pytest.skip("custom_vmap wrapper unavailable")
    rng = np.random.default_rng(5)
    nb, L = 2, 4
    D = nb * pbd.B
    facs = []
    for _ in range(L):
        Kd = np.zeros((nb, pbd.B, pbd.B))
        Ks = np.zeros((nb, pbd.B, pbd.B))
        for k in range(nb):
            M = rng.standard_normal((pbd.B, pbd.B))
            Kd[k] = M @ M.T + 50 * np.eye(pbd.B)
            if k:
                Ks[k] = 0.1 * rng.standard_normal((pbd.B, pbd.B))
        facs.append(pbd._band_factor_ds_impl(jnp.asarray(Kd),
                                             jnp.asarray(Ks),
                                             interpret=True))
    pres = [pbd.prechunk_band_fac(f) for f in facs]
    pre_b = jax.tree_util.tree_map(lambda *xs: jnp.stack(xs), *pres)
    rhs = jnp.asarray(rng.standard_normal((L, pbd.KP, D)))

    # the batch rule must fire without error and match the per-lane
    # impl; on CPU the underlying pallas_call cannot run compiled, so
    # trace only (abstract eval) and check shapes
    out_shape = jax.eval_shape(
        lambda p, r: jax.vmap(pbd._band_solve_ds_pre_cv)(p, r),
        pre_b, rhs)
    assert out_shape.shape == (L, pbd.KP, D)
    assert out_shape.dtype == jnp.float64


def test_chunk_emitting_factor_bit_identical():
    """_band_factor_pre_batch (the chunk-emitting lane-tiled factor —
    custom_vmap target of band_factor_ds_pre) equals
    prechunk_band_fac(lane-tiled factor) leaf-for-leaf, bit-exactly,
    including the padded-lane case."""
    from eicos_tpu.ops.pallas_band_ds import (_HAS_PALLAS, B,
                                              _band_factor_ds_batch,
                                              _band_factor_pre_batch,
                                              prechunk_band_fac)

    if not _HAS_PALLAS:
        pytest.skip("pallas not importable")
    rng = np.random.default_rng(21)
    L, nb, T = 3, 3, 2          # L % T != 0: exercises lane padding
    Kd = np.zeros((L, nb, B, B))
    Ks = np.zeros((L, nb, B, B))
    for i in range(L):
        for k in range(nb):
            M = rng.standard_normal((B, B)) * np.exp(
                rng.uniform(-3, 3, (B, 1)))
            Kd[i, k] = M @ M.T + 50 * np.eye(B)
            if k:
                Ks[i, k] = 0.1 * rng.standard_normal((B, B))
    Kd = jnp.asarray(Kd)
    Ks = jnp.asarray(Ks)
    fac = _band_factor_ds_batch(Kd, Ks, T=T, interpret=True)
    with jax.enable_x64(False):
        want = jax.jit(prechunk_band_fac)(fac)
    got = _band_factor_pre_batch(Kd, Ks, T=T, interpret=True)
    for name in want._fields:
        w, g = getattr(want, name), getattr(got, name)
        if isinstance(w, tuple):
            for t, (wt, gt) in enumerate(zip(w, g)):
                np.testing.assert_array_equal(
                    np.asarray(gt), np.asarray(wt), err_msg=f"{name}[{t}]")
        else:
            np.testing.assert_array_equal(np.asarray(g), np.asarray(w),
                                          err_msg=name)


def test_prechunked_operand_bit_identical():
    """PrechunkedOperand (factor-time chunked big operand, both
    orientations) is bit-identical to matmul_ds on the same values: the
    per-B-slab _chunks_scaled arithmetic is rounding-free, so chunking
    at the XLA level equals the in-kernel decomposition, and
    _ds_matmul_pre's per-group pair sums equal ds_matmul's concatenated
    dots exactly."""
    import functools

    from eicos_tpu.ops import pallas_gemm_ds as g

    if not g._HAS_PALLAS:
        pytest.skip("pallas not importable")
    rng = np.random.default_rng(31)
    kp, npad = 384, 256
    Bm = rng.standard_normal((kp, npad)) * np.exp(
        rng.uniform(-6, 6, (kp, 1)))
    a = rng.standard_normal((3, kp)) * np.exp(rng.uniform(-4, 4, (3, 1)))
    hi, lo = _split64(Bm)
    hiT, loT = _split64(Bm.T)

    # reference: the plain ds GEMV kernel in interpret mode
    @functools.lru_cache(maxsize=8)
    def interp_call(R, kpx, npx):
        nn = npx // g.B
        RB = min(R, g.RB_MAX)
        nr = R // RB
        import jax.experimental.pallas as pl
        from jax.experimental.pallas import tpu as pltpu
        spec_a = pl.BlockSpec((RB, kpx), lambda j, r: (r, 0),
                              memory_space=pltpu.VMEM)
        spec_b = pl.BlockSpec((kpx, g.B), lambda j, r: (0, j),
                              memory_space=pltpu.VMEM)
        spec_o = pl.BlockSpec((1, RB, g.B), lambda j, r: (j, r, 0),
                              memory_space=pltpu.VMEM)
        kern = functools.partial(g._gemv_kernel, RB)

        def call(ah, al, bh, bl):
            with jax.enable_x64(False):
                return pl.pallas_call(
                    kern, grid=(nn, nr),
                    in_specs=[spec_a, spec_a, spec_b, spec_b],
                    out_specs=(spec_o, spec_o),
                    out_shape=(jax.ShapeDtypeStruct(
                        (nn, nr * RB, g.B), jnp.float32),) * 2,
                    interpret=True,
                )(ah, al, bh, bl)

        return call

    orig = g._gemv_call
    g._gemv_call = interp_call
    try:
        want = np.asarray(jax.device_get(g.matmul_ds(jnp.asarray(a),
                                                     jnp.asarray(Bm))))
    finally:
        g._gemv_call = orig

    g._PRE_INTERPRET = True
    try:
        opn = g.PrechunkedOperand(jnp.asarray(hi), jnp.asarray(lo),
                                  transpose_b=False)
        got_n = np.asarray(jax.device_get(opn.rmatmul(jnp.asarray(a))))
        opt = g.PrechunkedOperand(jnp.asarray(hiT), jnp.asarray(loT),
                                  transpose_b=True)
        got_t = np.asarray(jax.device_get(opt.rmatmul(jnp.asarray(a))))
    finally:
        g._PRE_INTERPRET = False
    # same f64 combine: outputs are (r, npad) slices of identical pairs
    np.testing.assert_array_equal(got_n, want[:, :npad])
    np.testing.assert_array_equal(got_t, want[:, :npad])
    ref = a @ Bm
    assert np.abs(got_n - ref).max() / np.abs(ref).max() < 1e-12


def test_ldl_prechunk_solve_matches():
    """ldl_solve on a prechunked factor (LDLFactorsPre) matches the
    plain-factor solve through the interpreter kernels."""
    import functools

    from eicos_tpu.ops import pallas_gemm_ds as g
    from eicos_tpu.ops import ldl as ldlmod
    from eicos_tpu.ops.ldl import (LDLFactors, LDLFactorsPre, ldl_factor,
                                   ldl_prechunk, ldl_solve)

    if not g._HAS_PALLAS:
        pytest.skip("pallas not importable")
    rng = np.random.default_rng(33)
    D = 256
    M = rng.standard_normal((D, D))
    K = M @ M.T + 10 * np.eye(D)
    fac = ldl_factor(jnp.asarray(K))
    rhs = jnp.asarray(rng.standard_normal((D, 3)))
    want = np.asarray(jax.device_get(ldl_solve(fac, rhs)))

    orig_use = ldlmod._use_ds_gemm
    ldlmod._use_ds_gemm = lambda dt: dt == jnp.float64
    g._PRE_INTERPRET = True
    try:
        pre = ldl_prechunk(fac)
        assert isinstance(pre, LDLFactorsPre)
        got = np.asarray(jax.device_get(ldl_solve(pre, rhs)))
    finally:
        g._PRE_INTERPRET = False
        ldlmod._use_ds_gemm = orig_use
    # ds solves differ from exact f64 at the 2^-48 level; consumers run
    # under refinement — here just pin the numerical class
    scale = np.abs(want).max()
    assert np.abs(got - want).max() / scale < 1e-11


# ------------------------- int8 chunk storage (Settings.chunk_store) ----

def _band_inputs_i8(L=2, nb=3, seed=7, spread=4):
    from eicos_tpu.ops.pallas_band_ds import B

    rng = np.random.default_rng(seed)
    Kd = np.zeros((L, nb, B, B))
    Ks = rng.standard_normal((L, nb, B, B)) * 0.3
    for k in range(nb):
        A = rng.standard_normal((L, B, B)) * 0.2
        s = (np.exp(rng.uniform(-spread, spread, (L, B)))
             * np.sign(rng.standard_normal((L, B))))
        Kd[:, k] = (A + A.transpose(0, 2, 1)) / 2
        Kd[:, k] += np.einsum("lb,bc->lbc", s * 4, np.eye(B))
    Ks[:, 0] = 0
    return jnp.asarray(Kd), jnp.asarray(Ks)


def test_chunks7_int8_range_and_reconstruction():
    """_chunks7 int8 storage invariants: every chunk integer fits int8
    with the documented <= 72 bound (the one-dot-exactness argument and
    the int8 range both rest on it), and the chunks reconstruct the
    (hi, lo) value to the ~2^-55-of-scale tail."""
    from eicos_tpu.ops.pallas_band_ds import _NCHUNK8, _chunks7

    rng = np.random.default_rng(3)
    x = (rng.standard_normal((128, 128))
         * np.exp(rng.uniform(-18, 18, (128, 128))))
    # adversarial values: exact powers of two and near-pow2 edges where
    # round-to-nearest could push chunk 0 to the +-128 int8 edge
    x[0, :4] = [1.0, -1.0, 2.0 ** 60, -(2.0 ** -60)]
    x[1, :3] = [np.nextafter(1.0, 2.0), np.nextafter(1.0, 0.0), 0.75]
    xh, xl = _split64(x)
    with jax.enable_x64(False):
        chunks, s = jax.jit(
            lambda a, b: _chunks7(a, b, axis=1))(xh, xl)
    assert len(chunks) == _NCHUNK8
    recon = np.zeros((128, 128))
    sv = np.asarray(s, np.float64)
    for t, c in enumerate(chunks):
        ci = np.asarray(c, np.int64)
        assert c.dtype == jnp.int8
        assert np.abs(ci).max() <= 72, (t, np.abs(ci).max())
        recon += ci.astype(np.float64) * 2.0 ** (-7 * (t + 1))
    err = np.abs(recon * sv - np.asarray(x)) / sv
    # measured tail ~2^-51 of scale (fold-capture + f64 recon rounding)
    # — at/below the bf16 scheme's single-fold ~2^-49 class
    assert err.max() < 2.0 ** -50, err.max()


def test_i8_band_solve_batched_matches_per_lane():
    """The lane-tiled solve on an int8-stored factor is bit-identical to
    the per-lane kernel in interpret mode (same dispatch rule the bf16
    path pins), and the factor+solve stays in the same accuracy class
    as the bf16 scheme on a quasidefinite band."""
    from eicos_tpu.ops.pallas_band_ds import (
        KP, B, _band_factor_pre_batch, _band_solve_ds_pre_impl,
        _band_solve_pre_batch)

    L, nb = 2, 3
    Kd, Ks = _band_inputs_i8(L, nb)
    rng = np.random.default_rng(11)
    rhs = jnp.asarray(rng.standard_normal((L, KP, nb * B)))
    pre = _band_factor_pre_batch(Kd, Ks, T=2, interpret=True, i8=True)
    assert pre.lc1.dtype == jnp.int8 and pre.lc1.shape[-2] == 8 * B
    got_b = np.asarray(_band_solve_pre_batch(pre, rhs, T=2,
                                             interpret=True))
    got_l = np.asarray(jax.vmap(
        lambda p, r: _band_solve_ds_pre_impl(p, r, interpret=True)
    )(pre, rhs))
    np.testing.assert_array_equal(got_b, got_l)

    # accuracy class vs the bf16 scheme (dense f64 oracle residuals)
    pre16 = _band_factor_pre_batch(Kd, Ks, T=2, interpret=True, i8=False)
    got16 = np.asarray(_band_solve_pre_batch(pre16, rhs, T=2,
                                             interpret=True))
    Kfull = np.zeros((L, nb * B, nb * B))
    Kdn, Ksn = np.asarray(Kd), np.asarray(Ks)
    for k in range(nb):
        Kfull[:, k * B:(k + 1) * B, k * B:(k + 1) * B] = Kdn[:, k]
        if k:
            Kfull[:, k * B:(k + 1) * B, (k - 1) * B:k * B] = Ksn[:, k]
            Kfull[:, (k - 1) * B:k * B, k * B:(k + 1) * B] = (
                Ksn[:, k].transpose(0, 2, 1))
    rn = np.asarray(rhs)
    res8 = np.abs(np.einsum("lij,lkj->lki", Kfull, got_b) - rn).max()
    res16 = np.abs(np.einsum("lij,lkj->lki", Kfull, got16) - rn).max()
    assert res8 < 10 * max(res16, 1e-12), (res8, res16)


def test_i8_batched_vs_unbatched_divergence():
    """ACCEPTED custom_vmap divergence of the i8 scheme (documented in
    _band_factor_pre_batch's docstring): the lane-tiled chunk-emitting
    factor feeds the next block row's Ksub @ X product from X's 7-bit
    int8 chunks (the scratch carry) via the 7-bit-grid product, while
    the unbatched path (prechunk_band_fac of _band_factor_ds_impl)
    factors with the 8-bit-scheme pair products and only chunks at
    storage time.  The per-product difference is ~2^-49 of operand
    scale, but elimination growth amplifies the FORWARD gap between the
    two factors on ill-conditioned blocks (measured ~3e-3 relative by
    block row 2 on the spread inputs here) — so beyond block row 0 the
    factors are NOT bit-identical and no tight forward envelope holds.
    The meaningful invariant, pinned here: both are equally good
    BACKWARD solutions — their solve residuals against the exact f64
    operator agree to a small factor (refinement absorbs either).  The
    bf16 scheme, by contrast, is bit-identical (pinned elsewhere)."""
    from eicos_tpu.ops.pallas_band_ds import (
        _band_factor_ds_impl, _band_factor_pre_batch,
        _band_solve_pre_batch, prechunk_band_fac, KP, B)

    L, nb = 2, 3
    Kd, Ks = _band_inputs_i8(L, nb)
    pre_b = _band_factor_pre_batch(Kd, Ks, T=2, interpret=True, i8=True)
    pre_u = jax.vmap(lambda a, b: prechunk_band_fac(
        _band_factor_ds_impl(a, b, interpret=True), i8=True))(Kd, Ks)

    def recon(stacked, scale):
        sn = np.asarray(stacked, np.float64)
        nch = sn.shape[-2] // 128
        v = np.zeros(sn.shape[:-2] + (128, sn.shape[-1]), np.float64)
        for t in range(nch):
            v += (sn[..., t * 128:(t + 1) * 128, :]
                  * 2.0 ** (-7 * (t + 1)))
        # scale row 0 holds the per-ROW scales (axis -1 chunking)
        s = np.asarray(scale, np.float64)[..., 0, :][..., :, None]
        return v * s

    lb = recon(pre_b.lc1, pre_b.ls1)
    lu = recon(pre_u.lc1, pre_u.ls1)
    # block row 0 has no Ksub @ X product -> bit-identical
    np.testing.assert_array_equal(lb[:, 0], lu[:, 0])
    # ... and the divergence beyond it is real (this is the documented
    # accepted behavior, not an accident a refactor silently removed)
    assert np.abs(lb[:, 1:] - lu[:, 1:]).max() > 0.0

    # backward-error equivalence: solves through both factors leave the
    # same residual class against the exact operator
    rng = np.random.default_rng(11)
    rhs = jnp.asarray(rng.standard_normal((L, KP, nb * B)))
    zb = np.asarray(_band_solve_pre_batch(pre_b, rhs, T=2,
                                          interpret=True))
    zu = np.asarray(_band_solve_pre_batch(pre_u, rhs, T=2,
                                          interpret=True))
    Kfull = np.zeros((L, nb * B, nb * B))
    Kdn, Ksn = np.asarray(Kd), np.asarray(Ks)
    for k in range(nb):
        Kfull[:, k * B:(k + 1) * B, k * B:(k + 1) * B] = Kdn[:, k]
        if k:
            Kfull[:, k * B:(k + 1) * B, (k - 1) * B:k * B] = Ksn[:, k]
            Kfull[:, (k - 1) * B:k * B, k * B:(k + 1) * B] = (
                Ksn[:, k].transpose(0, 2, 1))
    rn = np.asarray(rhs)
    rb = np.abs(np.einsum("lij,lkj->lki", Kfull, zb) - rn).max()
    ru = np.abs(np.einsum("lij,lkj->lki", Kfull, zu) - rn).max()
    assert rb < 10 * max(ru, 1e-12), (rb, ru)
