"""Pallas TPU kernels: double-single dense-LDL substitution solves.

The dense KKT strategies ("reduced"/"normal"/"full" — the Eigen
SimplicialLDLT replacement for irregular sparsity,
/root/reference/include/eicos.hpp:221-222, src/eicos.cpp:1164) factor
through the blocked recursion in ops/ldl.py, which materializes the
unit-lower inverse so XLA-level solves are two GEMMs.  On the TPU
float64 path that design streams the DENSE (Dp, Dp) prechunked inverse
from HBM twice per refined solve trip — 2x the traffic of the
triangular factor itself — and under the solver's lane vmap the
per-lane GEMM grids replay near-serially (the round-4 measured
bottleneck of batched LPnetlib: 1.11x throughput from 16x the lanes).

These kernels replace the SOLVE side with in-kernel blocked
substitution against the factor's native pieces:

    L y = b   forward,  per 128-block: y_k = Xinv_k (b_k - sum_{c<k} L[k,c] y_c)
    w = y / d
    L'z = w   backward:               z_j = Xinv_j' (w_j - sum_{r>j} L[r,j]' z_r)

with L's strictly-block-lower panel columns and the per-block leaf
inverses Xinv prechunked at factor time (DenseFacPre) in both
contraction orientations — the same exact-product bf16 chunk scheme as
ops/pallas_band_ds (same _chunks_scaled arithmetic).  A solve streams
the TRIANGLE once per pass instead of the dense inverse twice: ~2x
less HBM per refined trip, and each pass is ONE kernel launch of nb
sequential grid steps instead of a replayed GEMM grid.  Under the
solver's lane vmap the kernels lane-tile (T lanes per grid program,
custom_vmap) exactly like the banded solves — the fix the round-4
verdict named for near-serial batched LPnetlib scaling.

Numerics: blocked substitution in double-single is the textbook-stable
direction (sequential, no inverse amplification); all consumers run
under float64 iterative refinement against the exact operator
(kkt.solve_refined), same as the inverse-GEMM path it replaces.
"""

from __future__ import annotations

import functools
from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax

try:  # pragma: no cover
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu
    _HAS_PALLAS = True
except Exception:  # pragma: no cover
    _HAS_PALLAS = False

from .pallas_band_ds import (B, KP, _NCHUNK, _chunks_scaled,
                             _ds_matmul_pre_b, _wr, _bT)
from .pallas_leaf_ds import ds_add, ds_div


def _fori32_rng(lo, hi, body, init):
    """fori_loop over [lo, hi) with a TRACED int32 lower bound (the
    backward pass's live-slab trim).  Mosaic lowers the while form."""
    def cond(c):
        return c[0] < hi

    def wbody(c):
        j, state = c
        return j + np.int32(1), body(j, state)

    return lax.while_loop(cond, wbody, (lo, init))[1]


class DenseFacPre(NamedTuple):
    """Prechunked dense substitution factor (see prechunk_dense).

    Per block column j of the padded (Dp, Dp) factor, Dp = nb * B:
      lc1/ls1: panel chunks along axis -1 (chunk t at rows
               [t*Dp, (t+1)*Dp)) + per-row scale stored TRANSPOSED as
               row 0 of an (8, Dp) slab — the forward update's
               (1, Dp)-wide scale row.
      lc0/ls0: panel chunks along axis -2 per B-slab (chunk t of slab s
               at rows [t*Dp + s*B, ...+B)) + per-(slab, col) scales
               (row s of an (nb8, B) slab).
      xc1/xs1, xc0/xs0: the leaf unit-lower inverse Xinv_jj in the same
               two orientations ((nch*B, B) chunks, row-0 scale slabs).
      dh/dl:   pivot rows (8, B), row 0 live.
    Batched factors carry a leading lane axis on every leaf."""
    lc1: jax.Array
    ls1: jax.Array
    lc0: jax.Array
    ls0: jax.Array
    xc1: jax.Array
    xs1: jax.Array
    xc0: jax.Array
    xs0: jax.Array
    dh: jax.Array
    dl: jax.Array


def _split64(x):
    hi = x.astype(jnp.float32)
    return hi, (x - hi.astype(jnp.float64)).astype(jnp.float32)


def _row0(v, rows=8):
    """(..., 1, N) -> (..., rows, N) with row 0 live."""
    pad = jnp.zeros(v.shape[:-2] + (rows - 1, v.shape[-1]), v.dtype)
    return jnp.concatenate([v, pad], axis=-2)


def _prechunk_cols_xla(Loff):
    """XLA reference implementation of the L-panel chunk decomposition
    (both orientations).  Returns (lc1, ls1, lc0, ls0)."""
    Dp = Loff.shape[-1]
    nb = Dp // B
    nb8 = -(-nb // 8) * 8
    # block-column layout: (nb, Dp, B), column j = Loff[:, j*B:(j+1)*B]
    cols = Loff.reshape(Dp, nb, B).transpose(1, 0, 2)
    ch, cl = _split64(cols)
    c1, s1 = _chunks_scaled(ch, cl, axis=2)          # s1 (nb, Dp, 1)
    lc1 = jnp.concatenate(c1, axis=1)                # (nb, nch*Dp, B)
    ls1 = _row0(s1.reshape(nb, 1, Dp))               # transposed scale row
    slabs_h = ch.reshape(nb, nb, B, B)
    slabs_l = cl.reshape(nb, nb, B, B)
    c0, s0 = _chunks_scaled(slabs_h, slabs_l, axis=2)    # s0 (nb, nb, 1, B)
    lc0 = jnp.concatenate([c.reshape(nb, Dp, B) for c in c0], axis=1)
    ls0 = jnp.zeros((nb, nb8, B), jnp.float32).at[:, :nb].set(
        s0.reshape(nb, nb, B))
    return lc1, ls1, lc0, ls0


# ------------------------- in-kernel L-panel prechunk ------------------
# The XLA chunk pass re-reads/writes the factor through ~10 unfused
# elementwise stages (~2.5 ms/lane of an ~9 ms/lane bnl1 iteration);
# one grid program per (lanes, column) chunks a (T, Dp, B) panel in
# both orientations in a single VMEM pass.  Same _chunks_scaled float
# ops — bit-identical chunk values (pinned by test).

def _make_prechunk_kernel(T: int, nb: int, nch: int = _NCHUNK):
    Dp = nb * B

    def kern(lh_ref, ll_ref, lc1_ref, ls1_ref, lc0_ref, ls0_ref):
        ch = lh_ref[...].reshape(T, Dp, B)
        cl = ll_ref[...].reshape(T, Dp, B)
        c1, s1 = _chunks_scaled(ch, cl, axis=2)      # s1 (T, Dp, 1)
        _wr(lc1_ref, jnp.concatenate(c1, axis=1))
        # transpose the (T, Dp, 1) scale to a (T, 1, Dp) row via
        # per-slab masked reduces over the B x B identity
        eye = (lax.broadcasted_iota(jnp.int32, (1, B, B), 1)
               == lax.broadcasted_iota(jnp.int32, (1, B, B), 2))
        rows = []
        for s in range(nb):
            seg = s1[:, s * B:(s + 1) * B, :]        # (T, B, 1)
            rows.append(jnp.sum(
                jnp.where(eye, jnp.broadcast_to(seg, (T, B, B)), 0.0),
                axis=1, keepdims=True))              # (T, 1, B)
        srow = jnp.concatenate(rows, axis=2)         # (T, 1, Dp)
        pad = jnp.zeros((T, 7, Dp), jnp.float32)
        _wr(ls1_ref, jnp.concatenate([srow, pad], axis=1))
        chunks0 = [[] for _ in range(nch)]
        scales0 = []
        for s in range(nb):
            c0, s0 = _chunks_scaled(ch[:, s * B:(s + 1) * B, :],
                                    cl[:, s * B:(s + 1) * B, :], axis=1)
            for t in range(nch):
                chunks0[t].append(c0[t])
            scales0.append(s0)                       # (T, 1, B)
        _wr(lc0_ref, jnp.concatenate(
            [c for grp in chunks0 for c in grp], axis=1))
        nb8 = ls0_ref.shape[-2]
        if nb8 > nb:  # zero-size concat operands break Mosaic
            scales0.append(jnp.zeros((T, nb8 - nb, B), jnp.float32))
        _wr(ls0_ref, jnp.concatenate(scales0, axis=1))

    return kern


def _pick_t_pre(L: int, Dp: int) -> int:
    best = 1
    for T in (2, 4, 8):
        vmem = (2 * T * Dp * B * 8            # dbuf'd input pair
                + 2 * 2 * T * _NCHUNK * Dp * B * 2   # dbuf'd chunk outs
                + 3 * T * Dp * B * 4)         # value headroom
        if vmem >= 90 * 2 ** 20:
            break
        if L % T == 0 or L > 2 * T:
            best = T
    return best


@functools.partial(jax.jit, static_argnames=("T", "interpret"))
def _prechunk_cols_batch(Loff, T: int, interpret: bool = False):
    """(L, Dp, Dp) float64 -> batched (lc1, ls1, lc0, ls0), T lanes per
    grid program, one grid step per block column."""
    L, Dp = Loff.shape[0], Loff.shape[-1]
    nb = Dp // B
    nb8 = -(-nb // 8) * 8
    Lp = -(-L // T) * T
    if Lp != L:
        Loff = jnp.concatenate(
            [Loff, jnp.zeros((Lp - L,) + Loff.shape[1:], Loff.dtype)],
            axis=0)
    lh, ll = _split64(Loff)
    spec_in = pl.BlockSpec((T, Dp, B), lambda t, j: (t, 0, j),
                           memory_space=pltpu.VMEM)
    spec_c = pl.BlockSpec((T, 1, _NCHUNK * Dp, B),
                          lambda t, j: (t, j, 0, 0),
                          memory_space=pltpu.VMEM)
    spec_s1 = pl.BlockSpec((T, 1, 8, Dp), lambda t, j: (t, j, 0, 0),
                           memory_space=pltpu.VMEM)
    spec_s0 = pl.BlockSpec((T, 1, nb8, B), lambda t, j: (t, j, 0, 0),
                           memory_space=pltpu.VMEM)
    with jax.enable_x64(False):
        out = pl.pallas_call(
            _make_prechunk_kernel(T, nb),
            grid=(Lp // T, nb),
            in_specs=[spec_in, spec_in],
            out_specs=(spec_c, spec_s1, spec_c, spec_s0),
            out_shape=(
                jax.ShapeDtypeStruct((Lp, nb, _NCHUNK * Dp, B),
                                     jnp.bfloat16),
                jax.ShapeDtypeStruct((Lp, nb, 8, Dp), jnp.float32),
                jax.ShapeDtypeStruct((Lp, nb, _NCHUNK * Dp, B),
                                     jnp.bfloat16),
                jax.ShapeDtypeStruct((Lp, nb, nb8, B), jnp.float32),
            ),
            compiler_params=pltpu.CompilerParams(
                dimension_semantics=("arbitrary", "arbitrary"),
                vmem_limit_bytes=110 * 2 ** 20),
            interpret=interpret,
        )(lh, ll)
    if Lp != L:
        out = tuple(o[:L] for o in out)
    return out


_PRECHUNK_INTERPRET = False


try:  # pragma: no cover - custom_batching present in all supported jax
    from jax import custom_batching as _cbp

    @_cbp.custom_vmap
    def _prechunk_cols(Loff):
        if dense_ds_available() or _PRECHUNK_INTERPRET:
            out = _prechunk_cols_batch(Loff[None], T=1,
                                       interpret=_PRECHUNK_INTERPRET)
            return jax.tree_util.tree_map(lambda x: x[0], out)
        return _prechunk_cols_xla(Loff)

    @_prechunk_cols.def_vmap
    def _prechunk_cols_vmap(axis_size, in_batched, Loff):
        if in_batched[0] and Loff.ndim == 3 and (dense_ds_available()
                                                 or _PRECHUNK_INTERPRET):
            T = _pick_t_pre(Loff.shape[0], Loff.shape[-1])
            out = _prechunk_cols_batch(Loff, T=T,
                                       interpret=_PRECHUNK_INTERPRET)
        else:
            out = jax.vmap(_prechunk_cols_xla)(Loff)
            return out, (True,) * 4
        return out, (True,) * 4
except Exception:  # pragma: no cover
    _prechunk_cols = _prechunk_cols_xla


def prechunk_dense(Loff, Xinv, d) -> DenseFacPre:
    """Chunk decomposition of a substitution factor.

    ``Loff``: (Dp, Dp) float64 strictly-block-lower panels (128-block
    diagonal blocks ZERO — their interiors live in ``Xinv``);
    ``Xinv``: (nb, B, B) float64 leaf unit-lower inverses; ``d``:
    (Dp,) float64 pivots.  Same _chunks_scaled arithmetic the solve
    kernels would run in-VMEM; runs once per factorization (the ~8
    refined solves per IPM iteration then stream chunks only).  The
    heavy L-panel part runs in the one-pass Pallas kernel on TPU
    (bit-identical chunk values); the small Xinv/d parts stay XLA."""
    Dp = Loff.shape[-1]
    nb = Dp // B
    lc1, ls1, lc0, ls0 = _prechunk_cols(Loff)
    xh, xl = _split64(Xinv)
    x1, sx1 = _chunks_scaled(xh, xl, axis=2)         # sx1 (nb, B, 1)
    xc1 = jnp.concatenate(x1, axis=1)                # (nb, nch*B, B)
    xs1 = _row0(sx1.transpose(0, 2, 1))
    x0, sx0 = _chunks_scaled(xh, xl, axis=1)         # sx0 (nb, 1, B)
    xc0 = jnp.concatenate(x0, axis=1)
    xs0 = _row0(sx0)
    dhh, dll = _split64(d.reshape(nb, 1, B))
    return DenseFacPre(lc1, ls1, lc0, ls0, xc1, xs1, xc0, xs0,
                       _row0(dhh), _row0(dll))


# ------------------------------------------------ solve kernels
# rhs layout: (KP, Dp) transposed right-hand sides (k <= KP live rows),
# carried across grid steps in a slab-major scratch (nb stacked
# (T*KP, B) slabs — slab s at rows [s*T*KP, (s+1)*T*KP), lane-major
# inside a slab) so every dynamic access is a 128-aligned SUBLANE
# slice (Mosaic's safe dynamic-indexing axis; the band kernels set the
# precedent).


def _make_dense_fwd(T: int, nb: int, nch: int = _NCHUNK):
    Dp = nb * B

    def kern(lc_ref, ls_ref, xc_ref, xs_ref, dh_ref, dl_ref,
             bh_ref, bl_ref, wh_ref, wl_ref, c_rh, c_rl):
        k = pl.program_id(1)

        @pl.when(k == 0)
        def _init():
            bh = bh_ref[...].reshape(T, KP, Dp)
            bl = bl_ref[...].reshape(T, KP, Dp)
            for s in range(nb):
                c_rh[s * T * KP:(s + 1) * T * KP, :] = (
                    bh[:, :, s * B:(s + 1) * B].reshape(T * KP, B))
                c_rl[s * T * KP:(s + 1) * T * KP, :] = (
                    bl[:, :, s * B:(s + 1) * B].reshape(T * KP, B))

        th = _bT(c_rh[pl.ds(k * np.int32(T * KP), T * KP), :], T)
        tl = _bT(c_rl[pl.ds(k * np.int32(T * KP), T * KP), :], T)
        xc = xc_ref[...].reshape(T, nch * B, B)
        yh, yl = _ds_matmul_pre_b(
            th, tl, lambda t: xc[:, t * B:(t + 1) * B],
            xs_ref[...].reshape(T, 8, B)[:, 0:1, :], T, transpose_b=True)
        dh = dh_ref[...].reshape(T, 8, B)[:, 0:1, :]
        dl = dl_ref[...].reshape(T, 8, B)[:, 0:1, :]
        wh, wl = ds_div(yh, yl, jnp.broadcast_to(dh, (T, KP, B)),
                        jnp.broadcast_to(dl, (T, KP, B)))
        _wr(wh_ref, wh)
        _wr(wl_ref, wl)
        # rhs -= y_k @ Lcol_k' : the (T, KP, Dp)-wide product runs in
        # <= 8-slab output chunks — one full-width dot's level
        # intermediates (~34*KP rows x Dp f32 per lane) would blow the
        # scoped-VMEM stack at large Dp.  Panel rows <= (k+1)B are zero
        # by construction, so the subtract touches already-eliminated
        # slabs with exact zeros.
        lc = lc_ref[...].reshape(T, nch * Dp, B)
        ls = ls_ref[...].reshape(T, 8, Dp)
        for w0 in range(0, nb, 8):
            w1 = min(w0 + 8, nb)

            # skip chunks whose every slab is <= k: their panel rows
            # are exact zeros, and ds_add(x, -0) is the exact identity
            # on normalized pairs — bit-identical trim, ~half the
            # update work on average
            @pl.when(np.int32(w1 - 1) > k)
            def _update(w0=w0, w1=w1):
                uh, ul = _ds_matmul_pre_b(
                    yh, yl,
                    lambda t: lc[:, t * Dp + w0 * B:t * Dp + w1 * B],
                    ls[:, 0:1, w0 * B:w1 * B], T, transpose_b=True)
                for s in range(w0, w1):
                    rh = _bT(c_rh[s * T * KP:(s + 1) * T * KP, :], T)
                    rl = _bT(c_rl[s * T * KP:(s + 1) * T * KP, :], T)
                    o = (s - w0) * B
                    nh, nl = ds_add(rh, rl, -uh[:, :, o:o + B],
                                    -ul[:, :, o:o + B])
                    c_rh[s * T * KP:(s + 1) * T * KP, :] = (
                        nh.reshape(T * KP, B))
                    c_rl[s * T * KP:(s + 1) * T * KP, :] = (
                        nl.reshape(T * KP, B))

    return kern


def _make_dense_bwd(T: int, nb: int, nch: int = _NCHUNK):
    Dp = nb * B

    def kern(lc_ref, ls0_ref, xc_ref, xs_ref, wh_ref, wl_ref,
             zh_ref, zl_ref, c_zh, c_zl):
        i = pl.program_id(1)
        j = np.int32(nb - 1) - i

        @pl.when(i == 0)
        def _init():
            c_zh[...] = jnp.zeros_like(c_zh)
            c_zl[...] = jnp.zeros_like(c_zl)

        wh = wh_ref[...].reshape(T, KP, B)
        wl = wl_ref[...].reshape(T, KP, B)

        def body(s, acc):
            ah, al = acc
            zsh = _bT(c_zh[pl.ds(s * np.int32(T * KP), T * KP), :], T)
            zsl = _bT(c_zl[pl.ds(s * np.int32(T * KP), T * KP), :], T)
            sb = ls0_ref[:, 0, pl.ds(s, 1), :]           # (T, 1, B)
            ph, plo = _ds_matmul_pre_b(
                zsh, zsl,
                lambda t: lc_ref[:, 0,
                                 pl.ds(np.int32(t * Dp) + s * np.int32(B),
                                       B), :],
                sb, T, transpose_b=False)
            return ds_add(ah, al, -ph, -plo)

        ah, al = _fori32_rng(j + np.int32(1), np.int32(nb), body, (wh, wl))
        xc = xc_ref[...].reshape(T, nch * B, B)
        zh, zl = _ds_matmul_pre_b(
            ah, al, lambda t: xc[:, t * B:(t + 1) * B],
            xs_ref[...].reshape(T, 8, B)[:, 0:1, :], T, transpose_b=False)
        _wr(zh_ref, zh)
        _wr(zl_ref, zl)
        c_zh[pl.ds(j * np.int32(T * KP), T * KP), :] = zh.reshape(T * KP, B)
        c_zl[pl.ds(j * np.int32(T * KP), T * KP), :] = zl.reshape(T * KP, B)

    return kern


def _pick_t(L: int, Dp: int) -> int:
    """Largest lane tile whose double-buffered chunk column + scratch
    fits the (raised) scoped-VMEM budget; the chip has 128 MB.  Prefers
    tiles that divide the lane count (padded lanes run real work)."""
    best = 1
    for T in (2, 4, 8):
        vmem = (2 * T * _NCHUNK * Dp * B * 2  # dbuf'd lc column (bf16)
                + 4 * T * KP * Dp * 4         # rhs input pair (fwd)
                + 4 * T * KP * Dp * 4         # rhs/z scratch pairs
                + 34 * KP * 8 * B * T * 4     # u-chunk level dots
                + 4 * 2 ** 20 * T)            # value headroom
        if vmem >= 90 * 2 ** 20:
            break
        if L % T == 0 or L > 2 * T:
            best = T
    return best


@functools.partial(jax.jit, static_argnames=("T", "interpret"))
def _dense_solve_batch(pre: DenseFacPre, rhs_t, T: int,
                       interpret: bool = False):
    """Lane-tiled batched substitution solve: every ``pre`` leaf has a
    leading lane axis L, ``rhs_t`` is (L, KP, Dp).  Grid (L/T, nb), T
    lanes per program; forward then backward pass, one launch each."""
    L = rhs_t.shape[0]
    nb = pre.lc1.shape[1]
    Dp = nb * B
    assert rhs_t.shape == (L, KP, Dp), (rhs_t.shape, Dp)
    Lp = -(-L // T) * T
    if Lp != L:
        def pad(x, one=False):
            ext = (Lp - L,) + x.shape[1:]
            fill = (jnp.ones if one else jnp.zeros)(ext, x.dtype)
            return jnp.concatenate([x, fill], axis=0)

        pre = DenseFacPre(
            pad(pre.lc1), pad(pre.ls1, one=True),
            pad(pre.lc0), pad(pre.ls0, one=True),
            pad(pre.xc1), pad(pre.xs1, one=True),
            pad(pre.xc0), pad(pre.xs0, one=True),
            pad(pre.dh, one=True), pad(pre.dl))
        rhs_t = jnp.concatenate(
            [rhs_t, jnp.zeros((Lp - L, KP, Dp), rhs_t.dtype)], axis=0)

    bh, bl = _split64(rhs_t)
    spec_lc = pl.BlockSpec((T, 1, _NCHUNK * Dp, B),
                           lambda t, k: (t, k, 0, 0),
                           memory_space=pltpu.VMEM)
    spec_ls1 = pl.BlockSpec((T, 1, 8, Dp), lambda t, k: (t, k, 0, 0),
                            memory_space=pltpu.VMEM)
    nb8 = pre.ls0.shape[-2]
    spec_ls0r = pl.BlockSpec((T, 1, nb8, B),
                             lambda t, k: (t, nb - 1 - k, 0, 0),
                             memory_space=pltpu.VMEM)
    spec_xc = pl.BlockSpec((T, 1, _NCHUNK * B, B),
                           lambda t, k: (t, k, 0, 0),
                           memory_space=pltpu.VMEM)
    spec_d = pl.BlockSpec((T, 1, 8, B), lambda t, k: (t, k, 0, 0),
                          memory_space=pltpu.VMEM)
    spec_b = pl.BlockSpec((T, KP, Dp), lambda t, k: (t, 0, 0),
                          memory_space=pltpu.VMEM)
    spec_x = pl.BlockSpec((T, 1, KP, B), lambda t, k: (t, k, 0, 0),
                          memory_space=pltpu.VMEM)
    rspec_lc = pl.BlockSpec((T, 1, _NCHUNK * Dp, B),
                            lambda t, k: (t, nb - 1 - k, 0, 0),
                            memory_space=pltpu.VMEM)
    rspec_xc = pl.BlockSpec((T, 1, _NCHUNK * B, B),
                            lambda t, k: (t, nb - 1 - k, 0, 0),
                            memory_space=pltpu.VMEM)
    rspec_d = pl.BlockSpec((T, 1, 8, B), lambda t, k: (t, nb - 1 - k, 0, 0),
                           memory_space=pltpu.VMEM)
    rspec_x = pl.BlockSpec((T, 1, KP, B),
                           lambda t, k: (t, nb - 1 - k, 0, 0),
                           memory_space=pltpu.VMEM)
    out_sh = (jax.ShapeDtypeStruct((Lp, nb, KP, B), jnp.float32),) * 2
    # always raise the scoped budget: the wide per-step update's level
    # dots allocate ~34*KP rows x Dp of f32 intermediates per lane,
    # past the 16 MB default at modest (T, Dp)
    arb = pltpu.CompilerParams(
        dimension_semantics=("arbitrary", "arbitrary"),
        vmem_limit_bytes=110 * 2 ** 20)
    scr = [pltpu.VMEM((nb * T * KP, B), jnp.float32)] * 2
    with jax.enable_x64(False):
        wh, wl = pl.pallas_call(
            _make_dense_fwd(T, nb), grid=(Lp // T, nb),
            in_specs=[spec_lc, spec_ls1, spec_xc, spec_d,
                      spec_d, spec_d, spec_b, spec_b],
            out_specs=(spec_x, spec_x), out_shape=out_sh,
            scratch_shapes=scr, compiler_params=arb,
            interpret=interpret,
        )(pre.lc1, pre.ls1, pre.xc1, pre.xs1, pre.dh, pre.dl, bh, bl)
        zh, zl = pl.pallas_call(
            _make_dense_bwd(T, nb), grid=(Lp // T, nb),
            in_specs=[rspec_lc, spec_ls0r, rspec_xc, rspec_d,
                      rspec_x, rspec_x],
            out_specs=(rspec_x, rspec_x), out_shape=out_sh,
            scratch_shapes=scr, compiler_params=arb,
            interpret=interpret,
        )(pre.lc0, pre.ls0, pre.xc0, pre.xs0, wh, wl)
    z = zh.astype(jnp.float64) + zl.astype(jnp.float64)
    z = z.transpose(0, 2, 1, 3).reshape(Lp, KP, Dp)
    return z[:L]


def _dense_solve_impl(pre: DenseFacPre, rhs_t, interpret: bool = False):
    """Single-lane solve: the batched kernel at L = T = 1."""
    one = jax.tree_util.tree_map(lambda x: x[None], pre)
    return _dense_solve_batch(one, rhs_t[None], T=1,
                              interpret=interpret)[0]


try:  # pragma: no cover - custom_batching present in all supported jax
    from jax import custom_batching as _cb

    @_cb.custom_vmap
    def _dense_solve_cv(pre: DenseFacPre, rhs_t):
        return _dense_solve_impl(pre, rhs_t)

    @_dense_solve_cv.def_vmap
    def _dense_solve_vmap(axis_size, in_batched, pre, rhs_t):
        leaves = jax.tree_util.tree_leaves(in_batched)
        if all(leaves) and rhs_t.ndim == 3:
            T = _pick_t(rhs_t.shape[0], rhs_t.shape[-1])
            out = _dense_solve_batch(pre, rhs_t, T=T)
        else:
            axes = jax.tree_util.tree_map(lambda b: 0 if b else None,
                                          in_batched)
            out = jax.vmap(_dense_solve_impl, in_axes=tuple(axes))(pre,
                                                                   rhs_t)
        return out, True

    def dense_solve_ds(pre: DenseFacPre, rhs_t, interpret: bool = False):
        """Substitution solve against a prechunked dense factor.

        ``rhs_t``: (KP, Dp) float64 transposed right-hand sides (unused
        rows zero).  Under the solver's lane vmap the batch collapses
        into the lane-tiled kernels (T lanes per grid program)."""
        if interpret:
            return _dense_solve_impl(pre, rhs_t, interpret=True)
        return _dense_solve_cv(pre, rhs_t)
except Exception:  # pragma: no cover
    dense_solve_ds = _dense_solve_impl


def dense_ds_available() -> bool:
    if not _HAS_PALLAS:
        return False
    from .backend import tpu_kernels_on

    return tpu_kernels_on()
