"""Property tests for the cone algebra.

The reference has no unit tests of these formulas
(/root/reference/src/eicos.cpp:411-507, 1330-1469); we test them against
their defining mathematical identities, which catches transcription errors
a same-source oracle could not.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

import eicos_tpu  # noqa: F401  (enables x64)
from eicos_tpu import cones
from eicos_tpu.structure import ConeStructure


def random_interior(st: ConeStructure, rng, margin=1.0):
    """A strictly interior point of K."""
    v = rng.standard_normal(st.m)
    lp = np.abs(v[: st.l]) + margin
    soc = v[st.l:].copy()
    off = 0
    for d in st.q:
        tail = soc[off + 1: off + d]
        soc[off] = np.linalg.norm(tail) + margin + abs(soc[off])
        off += d
    return np.concatenate([lp, soc])


def dense_W(st: ConeStructure, scal):
    """Materialize W (not W^2) densely by applying `scale` to basis vectors."""
    m = st.m
    cols = [np.asarray(cones.scale(st, scal, jnp.eye(m)[i])) for i in range(m)]
    return np.stack(cols, axis=1)


STRUCTS = [
    ConeStructure(l=5, q=()),
    ConeStructure(l=0, q=(4,)),
    ConeStructure(l=3, q=(3, 5)),
    ConeStructure(l=2, q=(1, 2, 6)),  # includes a dim-1 SOC
]


@pytest.mark.parametrize("st", STRUCTS, ids=lambda s: f"l{s.l}q{s.q}")
class TestScalings:
    def test_nt_identity(self, st, rng):
        """The NT scaling satisfies W^2 z = s and lambda = W z = W^{-1} s."""
        s = random_interior(st, rng)
        z = random_interior(st, rng)
        scal, lam = cones.update_scalings(st, s, z)
        w2z = np.asarray(cones.scale2(st, scal, z))
        np.testing.assert_allclose(w2z, s, rtol=1e-10, atol=1e-12)
        # lambda = Wz and also W^{-1}s: check lam o lam relation via products
        Wz = np.asarray(cones.scale(st, scal, z))
        np.testing.assert_allclose(np.asarray(lam), Wz, rtol=1e-12)

    def test_scale2_is_scale_squared(self, st, rng):
        s = random_interior(st, rng)
        z = random_interior(st, rng)
        scal, _ = cones.update_scalings(st, s, z)
        x = rng.standard_normal(st.m)
        one = np.asarray(cones.scale(st, scal, cones.scale(st, scal, x)))
        two = np.asarray(cones.scale2(st, scal, x))
        np.testing.assert_allclose(one, two, rtol=1e-10, atol=1e-12)

    def test_scale2_inv(self, st, rng):
        s = random_interior(st, rng)
        z = random_interior(st, rng)
        scal, _ = cones.update_scalings(st, s, z)
        x = rng.standard_normal(st.m)
        rt = np.asarray(
            cones.scale2_inv(st, scal, cones.scale2(st, scal, x)))
        np.testing.assert_allclose(rt, x, rtol=1e-9, atol=1e-11)

    def test_w_is_symmetric(self, st, rng):
        s = random_interior(st, rng)
        z = random_interior(st, rng)
        scal, _ = cones.update_scalings(st, s, z)
        W = dense_W(st, scal)
        np.testing.assert_allclose(W, W.T, rtol=1e-10, atol=1e-12)

    def test_w2_dense_matches_scale2(self, st, rng):
        s = random_interior(st, rng)
        z = random_interior(st, rng)
        scal, _ = cones.update_scalings(st, s, z)
        W2 = np.asarray(cones.w2_dense(st, scal, jnp.float64))
        x = rng.standard_normal(st.m)
        np.testing.assert_allclose(
            W2 @ x, np.asarray(cones.scale2(st, scal, x)),
            rtol=1e-10, atol=1e-12)


@pytest.mark.parametrize("st", STRUCTS, ids=lambda s: f"l{s.l}q{s.q}")
class TestJordan:
    def test_product_division_roundtrip(self, st, rng):
        u = random_interior(st, rng)
        w = rng.standard_normal(st.m)
        prod, _ = cones.conic_product(st, jnp.asarray(u),
                                      cones.conic_division(st, u, w))
        np.testing.assert_allclose(np.asarray(prod), w, rtol=1e-9, atol=1e-11)

    def test_product_identity(self, st, rng):
        """u o e = u where e = (1,..,1 | 1,0..0 per cone)."""
        u = rng.standard_normal(st.m)
        e = np.zeros(st.m)
        e[: st.l] = 1.0
        off = st.l
        for d in st.q:
            e[off] = 1.0
            off += d
        prod, _ = cones.conic_product(st, u, e)
        np.testing.assert_allclose(np.asarray(prod), u, rtol=1e-12, atol=0)

    def test_product_mu(self, st, rng):
        u = random_interior(st, rng)
        v = random_interior(st, rng)
        prod, mu = cones.conic_product(st, u, v)
        expect = np.sum(np.abs(np.asarray(prod)[: st.l]))
        off = st.l
        p = np.asarray(prod)
        for d in st.q:
            expect += abs(p[off])
            off += d
        np.testing.assert_allclose(float(mu), expect, rtol=1e-12)


def in_cone(st: ConeStructure, v, tol=0.0):
    ok = np.all(v[: st.l] >= -tol)
    off = st.l
    for d in st.q:
        ok &= v[off] + tol >= np.linalg.norm(v[off + 1: off + d])
        off += d
    return bool(ok)


@pytest.mark.parametrize("st", STRUCTS, ids=lambda s: f"l{s.l}q{s.q}")
def test_bring_to_cone(st, rng):
    r = rng.standard_normal(st.m) * 3
    s = np.asarray(cones.bring_to_cone(st, jnp.asarray(r), 0.99))
    assert in_cone(st, s)
    # interior point: alpha stays at -gamma, so heads shift by exactly
    # 1 - gamma = 0.01 (reference behavior, src/eicos.cpp:763-792 — alpha
    # is initialized to -gamma and 1 is always added)
    r2 = random_interior(st, rng)
    s2 = np.asarray(cones.bring_to_cone(st, jnp.asarray(r2), 0.99))
    e = np.zeros(st.m)
    e[: st.l] = 1.0
    off = st.l
    for d in st.q:
        e[off] = 1.0
        off += d
    np.testing.assert_allclose(s2, r2 + 0.01 * e)


@pytest.mark.parametrize("st", STRUCTS, ids=lambda s: f"l{s.l}q{s.q}")
def test_line_search_boundary(st, rng):
    """alpha from line_search keeps lam + a*ds and lam + a*dz in the cone
    for a slightly below alpha (when alpha is interior, i.e. not clamped)."""
    s = random_interior(st, rng)
    z = random_interior(st, rng)
    scal, lam = cones.update_scalings(st, s, z)
    lam = np.asarray(lam)
    ds = rng.standard_normal(st.m) * 2
    dz = rng.standard_normal(st.m) * 2
    alpha = float(cones.line_search(st, lam, ds, dz, 1.0, -0.3, 1.0, -0.4,
                                    1e-6, 0.999))
    if alpha < 0.999:  # unclamped
        a = 0.95 * alpha
        assert in_cone(st, lam + a * ds, tol=1e-9)
        assert in_cone(st, lam + a * dz, tol=1e-9)
        assert 1.0 + a * (-0.3) > 0 and 1.0 + a * (-0.4) > 0


def test_vmap_cone_ops(rng):
    """All cone ops vmap over a batch axis."""
    st = ConeStructure(l=3, q=(3, 4))
    batch = 5
    s = np.stack([random_interior(st, rng) for _ in range(batch)])
    z = np.stack([random_interior(st, rng) for _ in range(batch)])
    scal, lam = jax.vmap(lambda a, b: cones.update_scalings(st, a, b))(s, z)
    w2z = jax.vmap(lambda sc, x: cones.scale2(st, sc, x))(scal, z)
    np.testing.assert_allclose(np.asarray(w2z), s, rtol=1e-10, atol=1e-12)
