"""Pallas TPU kernel: double-single (small @ BIG-constant) matmul.

The refinement residuals and the LP-row elimination of kkt.py are skinny
float64 products ``a @ B`` with a (<= KP)-row dynamic ``a`` against big
loop-invariant operands (G, A, transposes, stacks thereof).  XLA's f64
dot emulation runs them as chunked while-loops (latency-bound); an
XLA-level Ozaki preslicing variant (removed; see git history) fixed
the latency but re-read the big operand once per slice pair — a 45x
HBM amplification that measured even slower at these sizes.

This kernel gets both right: the big operand is stored ONCE as an
(hi, lo) float32 pair, each grid program owns one 128-wide output panel
and loops the contraction in VMEM, where the exact-product chunk scheme
of ops/pallas_band_ds.ds_matmul (8-bit grid-aligned bf16 chunks, exact
f32 MXU accumulation, TwoSum merges) runs without touching HBM again.
Cost per product: one read of the operand pair — the same traffic as a
native f64 matvec on a machine that had native f64.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

try:  # pragma: no cover
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu
    _HAS_PALLAS = True
except Exception:  # pragma: no cover
    _HAS_PALLAS = False

from .pallas_band_ds import (ds_matmul, B, _chunks_scaled, _ds_matmul_pre,
                             _NCHUNK)
from .pallas_leaf_ds import _fori32, ds_add

KP = 16  # rows of the small operand (bf16 sublane tile)


def _gemv_kernel(R, ah_ref, al_ref, bh_ref, bl_ref, oh_ref, ol_ref):
    """One 128-wide output panel; contraction looped in VMEM."""
    Kp = ah_ref.shape[-1]
    nk = Kp // B

    def step(k, acc):
        ach, acl = acc
        asl = (slice(None),) * (ah_ref.ndim - 1) + (pl.ds(k * B, B),)
        Ah = ah_ref[asl].reshape(R, B)
        Al = al_ref[asl].reshape(R, B)
        bsl = (slice(None),) * (bh_ref.ndim - 2) + (pl.ds(k * B, B),
                                                    slice(None))
        Bh = bh_ref[bsl].reshape(B, bh_ref.shape[-1])
        Bl = bl_ref[bsl].reshape(B, bl_ref.shape[-1])
        ph, plo = ds_matmul(Ah, Al, Bh, Bl)
        return ds_add(ach, acl, ph, plo)

    zero = jnp.zeros((R, bh_ref.shape[-1]), jnp.float32)
    oh, ol = _fori32(nk, step, (zero, zero))
    oh_ref[...] = oh.reshape(oh_ref.shape)
    ol_ref[...] = ol.reshape(ol_ref.shape)


def _gemv_kernel_cached(R, ah_ref, al_ref, bh_ref, bl_ref,
                        oh_ref, ol_ref, bc_ref, bs_ref):
    """_gemv_kernel with the b-panel's bf16 chunk decomposition cached in
    VMEM scratch across the row tiles of one column panel: grid is
    (nn, nr) with r innermost, so the (Kp, B) b panel is constant while
    r sweeps — the plain kernel re-chunked it per row tile (nr-fold
    redundant VPU work on square GEMMs, ~17% of the step; measured as
    the dense-LDL-recursion headroom on LPnetlib).  Bit-identical to
    _gemv_kernel: same _chunks_scaled values, and _ds_matmul_pre's
    per-group pair sums equal ds_matmul's concatenated dots exactly."""
    r = pl.program_id(1)
    Kp = ah_ref.shape[-1]
    nk = Kp // B
    W = bh_ref.shape[-1]

    @pl.when(r == 0)
    def _cache():
        def cstep(k, _):
            bsl = (slice(None),) * (bh_ref.ndim - 2) + (pl.ds(k * B, B),
                                                        slice(None))
            Bh = bh_ref[bsl].reshape(B, W)
            Bl = bl_ref[bsl].reshape(B, W)
            chunks, s = _chunks_scaled(Bh, Bl, axis=0)
            for t in range(_NCHUNK):
                bc_ref[pl.ds((k * _NCHUNK + t) * B, B), :] = chunks[t]
            bs_ref[pl.ds(k, 1), :] = s
            return 0

        _fori32(nk, cstep, 0)

    def step(k, acc):
        ach, acl = acc
        asl = (slice(None),) * (ah_ref.ndim - 1) + (pl.ds(k * B, B),)
        Ah = ah_ref[asl].reshape(R, B)
        Al = al_ref[asl].reshape(R, B)
        ph, plo = _ds_matmul_pre(
            Ah, Al,
            lambda t, k=k: bc_ref[pl.ds((k * _NCHUNK + t) * B, B), :],
            bs_ref[pl.ds(k, 1), :])
        return ds_add(ach, acl, ph, plo)

    zero = jnp.zeros((R, W), jnp.float32)
    oh, ol = _fori32(nk, step, (zero, zero))
    oh_ref[...] = oh.reshape(oh_ref.shape)
    ol_ref[...] = ol.reshape(ol_ref.shape)


class BigOperand:
    """A big constant matmul operand held as an (hi, lo) float32 pair,
    zero-padded to 128-multiples.  Built once per solve (loop-invariant;
    XLA hoists it out of the IPM while-loop).

    ``rmatmul`` carries a custom_vmap rule: under the solver's lane vmap
    the batch axis COLLAPSES INTO KERNEL ROWS instead of replaying the
    kernel per lane — the operand is streamed from HBM once per product
    for the whole batch (a plain vmap re-read it per lane: measured 16x
    HBM amplification dominating the IPM iteration)."""

    def __init__(self, bmat):
        assert bmat.ndim == 2, bmat.shape
        self.k, self.n = bmat.shape
        kp = -(-max(self.k, 1) // B) * B
        npad = -(-max(self.n, 1) // B) * B
        bm = jnp.zeros((kp, npad), bmat.dtype).at[:self.k, :self.n].set(bmat)
        self.hi = bm.astype(jnp.float32)
        self.lo = (bm - self.hi.astype(jnp.float64)).astype(jnp.float32)

        self._rows = _rows_fn(self.k, self.n)

    def rmatmul(self, a):
        """a @ b for float64 ``a`` of shape (r, k) or (k,)."""
        single = a.ndim == 1
        out = self._rows(a[None] if single else a, self.hi, self.lo)
        return out[0] if single else out


def _matmul_rows(a2, hi, lo, k, n):
    """(r, k) float64 rows @ padded (hi, lo) operand -> (r, n)."""
    r = a2.shape[0]
    R = -(-max(r, 1) // KP) * KP
    if R > RB_MAX:
        R = -(-R // RB_MAX) * RB_MAX    # row tiling needs R % RB == 0
    kp, npad = hi.shape
    ap = jnp.zeros((R, kp), a2.dtype).at[:r, :k].set(a2)
    ah = ap.astype(jnp.float32)
    al = (ap - ah.astype(jnp.float64)).astype(jnp.float32)
    oh, ol = _gemv_call(R, kp, npad)(ah, al, hi, lo)
    # kernel outputs are (nn, R, B) column panels -> (R, npad)
    out = oh.astype(jnp.float64) + ol.astype(jnp.float64)
    out = out.transpose(1, 0, 2).reshape(R, npad)
    return out[:r, :n]


@functools.lru_cache(maxsize=256)
def _rows_fn(k: int, n: int):
    """custom_vmap'd (rows, operand-pair) product for true dims (k, n):
    closed-over tracers are not allowed in custom_vmap, so the operand
    pair travels as explicit (unbatched) arguments."""
    from jax import custom_batching

    @custom_batching.custom_vmap
    def _rows(a2, hi, lo):
        return _matmul_rows(a2, hi, lo, k, n)

    @_rows.def_vmap
    def _rows_vmap(axis_size, in_batched, a3, hi, lo):
        a_b, hi_b, lo_b = in_batched
        if hi_b or lo_b or not a_b:
            # per-lane operand: no row-collapse possible; replay per lane
            out = jax.vmap(
                lambda aa, h, l2: _matmul_rows(aa, h, l2, k, n),
                in_axes=(0 if a_b else None, 0 if hi_b else None,
                         0 if lo_b else None))(a3, hi, lo)
            return out, True
        L, r, _ = a3.shape
        out = _matmul_rows(a3.reshape(L * r, a3.shape[-1]), hi, lo, k, n)
        return out.reshape(L, r, out.shape[-1]), True

    return _rows


RB_MAX = 128  # row tile: keeps the a-block + B panel inside the 16 MB
#               per-program VMEM budget even when custom_vmap collapses
#               hundreds of lanes into rows


@functools.lru_cache(maxsize=256)
def _gemv_call(R: int, kp: int, npad: int):
    nn = npad // B
    RB = min(R, RB_MAX)
    assert R % RB == 0, (R, RB)
    nr = R // RB
    spec_a = pl.BlockSpec((RB, kp), lambda j, r: (r, 0),
                          memory_space=pltpu.VMEM)
    spec_b = pl.BlockSpec((kp, B), lambda j, r: (0, j),
                          memory_space=pltpu.VMEM)
    spec_o = pl.BlockSpec((1, RB, B), lambda j, r: (j, r, 0),
                          memory_space=pltpu.VMEM)
    # the chunk cache pays only when row tiles revisit the same b panel
    # (nr > 1), and its scratch must fit beside the double-buffered
    # operand blocks in the 16 MB per-program VMEM budget
    vmem = (_NCHUNK * kp * B * 2 + kp * B * 4        # chunk cache + bs
            + 2 * 2 * (RB * kp + kp * B) * 4         # dbuf'd (hi, lo) in
            + 4 * RB * B * 4)
    if nr > 1 and vmem < 15 * 2 ** 20:
        kern = functools.partial(_gemv_kernel_cached, RB)
        scratch = [pltpu.VMEM((_NCHUNK * kp, B), jnp.bfloat16),
                   pltpu.VMEM((kp // B, B), jnp.float32)]
        # the cache's validity across row tiles needs the documented
        # sequential row-major grid order
        params = dict(compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary", "arbitrary")))
    else:
        kern = functools.partial(_gemv_kernel, RB)
        scratch = []
        params = {}

    def call(ah, al, bh, bl):
        with jax.enable_x64(False):
            return pl.pallas_call(
                kern,
                grid=(nn, nr),
                in_specs=[spec_a, spec_a, spec_b, spec_b],
                out_specs=(spec_o, spec_o),
                out_shape=(jax.ShapeDtypeStruct((nn, nr * RB, B),
                                                jnp.float32),) * 2,
                scratch_shapes=scratch,
                **params,
            )(ah, al, bh, bl)

    return jax.jit(call)


def _matmul_ds_impl(a, bmat):
    """General float64 ``a @ bmat`` through the double-single chunk
    kernel: both operands split to (hi, lo) f32 pairs per call, the
    kernel streams them once from HBM.  For mid-size f64 GEMMs (the
    dense LDL recursion's (D/2, D/2) blocks) this replaces XLA's
    chunked-while-loop f64 emulation — whose per-chunk loop overhead
    (~65 us on v5e) dominates below ~1k sizes — with one launch at
    bf16-MXU rate (~2^-48 accuracy; consumers run under float64
    iterative refinement)."""
    assert a.ndim == 2 and bmat.ndim == 2, (a.shape, bmat.shape)
    r, k = a.shape
    k2, n = bmat.shape
    assert k == k2, (a.shape, bmat.shape)
    if r == 0 or n == 0 or k == 0:
        return jnp.zeros((r, n), a.dtype)
    kp = -(-max(k, 1) // B) * B
    npad = -(-max(n, 1) // B) * B
    bm = jnp.zeros((kp, npad), bmat.dtype).at[:k, :n].set(bmat)
    hi = bm.astype(jnp.float32)
    lo = (bm - hi.astype(jnp.float64)).astype(jnp.float32)
    R = -(-max(r, 1) // KP) * KP
    if R > RB_MAX:
        R = -(-R // RB_MAX) * RB_MAX    # row tiling needs R % RB == 0
    ap = jnp.zeros((R, kp), a.dtype).at[:r, :k].set(a)
    ah = ap.astype(jnp.float32)
    al = (ap - ah.astype(jnp.float64)).astype(jnp.float32)
    oh, ol = _gemv_call(R, kp, npad)(ah, al, hi, lo)
    out = oh.astype(jnp.float64) + ol.astype(jnp.float64)
    out = out.transpose(1, 0, 2).reshape(R, npad)
    return out[:r, :n]


# --------------------- lane-tiled batched GEMM (both operands per-lane)
# Under the solver's lane vmap the dense-LDL recursion's GEMMs carry
# BOTH operands per lane; the auto-batched grid replays them serially
# (round-4: batched LPnetlib at 1.11x from 16x the lanes).  The batched
# kernel processes T lanes per grid program: the bf16 chunk
# decompositions and TwoSum folds widen to (T, ., .) slabs (shared
# issue slots) and the MXU dots batch over the lane axis — the same
# lane-tiling that took the band factor 101 -> 38 ms/iter.

def _make_bmm_kernel(T: int):
    from .pallas_band_ds import _ds_matmul_b

    def kern(ah_ref, al_ref, bh_ref, bl_ref, oh_ref, ol_ref):
        Kp = ah_ref.shape[-1]
        nk = Kp // B
        RB_ = ah_ref.shape[-2]

        def step(k, acc):
            ach, acl = acc
            Ah = ah_ref[:, :, pl.ds(k * B, B)]
            Al = al_ref[:, :, pl.ds(k * B, B)]
            Bh = bh_ref[:, pl.ds(k * B, B), :]
            Bl = bl_ref[:, pl.ds(k * B, B), :]
            ph, plo = _ds_matmul_b(Ah, Al, Bh, Bl, T, transpose_b=False)
            return ds_add(ach, acl, ph, plo)

        zero = jnp.zeros((T, RB_, B), jnp.float32)
        oh, ol = _fori32(nk, step, (zero, zero))
        oh_ref[...] = oh.reshape(oh_ref.shape)
        ol_ref[...] = ol.reshape(ol_ref.shape)

    return kern


def _pick_t_bmm(L: int, kp: int, RB: int) -> int:
    best = 1
    for T in (2, 4, 8):
        vmem = 2 * 2 * T * (RB * kp + kp * B) * 4 * 2 + 6 * T * RB * B * 4
        if vmem >= 80 * 2 ** 20:
            break
        if L % T == 0 or L > 2 * T:
            best = T
    return best


@functools.lru_cache(maxsize=256)
def _bmm_call(Lp: int, T: int, R: int, kp: int, npad: int,
              interpret: bool = False):
    nn = npad // B
    RB = min(R, RB_MAX)
    assert R % RB == 0 and Lp % T == 0, (R, RB, Lp, T)
    nr = R // RB
    spec_a = pl.BlockSpec((T, RB, kp), lambda t, j, r: (t, r, 0),
                          memory_space=pltpu.VMEM)
    spec_b = pl.BlockSpec((T, kp, B), lambda t, j, r: (t, 0, j),
                          memory_space=pltpu.VMEM)
    spec_o = pl.BlockSpec((T, 1, RB, B), lambda t, j, r: (t, j, r, 0),
                          memory_space=pltpu.VMEM)
    # always raise the scoped budget: the in-kernel level-dot
    # intermediates (prods: ~34*B rows of f32 per lane) blow the 16 MB
    # default even at T = 8 with (128, 128) blocks — measured as a
    # compile-time scoped-vmem OOM on lp_agg at 16 lanes
    params = dict(compiler_params=pltpu.CompilerParams(
        vmem_limit_bytes=110 * 2 ** 20))

    def call(ah, al, bh, bl):
        with jax.enable_x64(False):
            return pl.pallas_call(
                _make_bmm_kernel(T),
                grid=(Lp // T, nn, nr),
                in_specs=[spec_a, spec_a, spec_b, spec_b],
                out_specs=(spec_o, spec_o),
                out_shape=(jax.ShapeDtypeStruct((Lp, nn, nr * RB, B),
                                                jnp.float32),) * 2,
                interpret=interpret,
                **params,
            )(ah, al, bh, bl)

    return jax.jit(call)


_BMM_INTERPRET = False   # tests flip this for the interpreter


def _bmatmul_ds(a3, b3):
    """Lane-batched float64 ``a @ b``: (L, r, k) x (L, k, n) ->
    (L, r, n), T lanes per grid program.  Same per-lane chunk
    arithmetic as _matmul_ds_impl's kernel (the batched dots compute
    the per-lane products; folds are elementwise)."""
    L, r, k = a3.shape
    L2, k2, n = b3.shape
    assert L == L2 and k == k2, (a3.shape, b3.shape)
    if r == 0 or n == 0 or k == 0:
        return jnp.zeros((L, r, n), a3.dtype)
    kp = -(-max(k, 1) // B) * B
    npad = -(-max(n, 1) // B) * B
    R = -(-max(r, 1) // KP) * KP
    if R > RB_MAX:
        R = -(-R // RB_MAX) * RB_MAX
    T = _pick_t_bmm(L, kp, min(R, RB_MAX))
    Lp = -(-L // T) * T
    ap = jnp.zeros((Lp, R, kp), a3.dtype).at[:L, :r, :k].set(a3)
    bp = jnp.zeros((Lp, kp, npad), b3.dtype).at[:L, :k, :n].set(b3)
    ah = ap.astype(jnp.float32)
    al = (ap - ah.astype(jnp.float64)).astype(jnp.float32)
    bh = bp.astype(jnp.float32)
    bl = (bp - bh.astype(jnp.float64)).astype(jnp.float32)
    oh, ol = _bmm_call(Lp, T, R, kp, npad, _BMM_INTERPRET)(ah, al, bh, bl)
    out = oh.astype(jnp.float64) + ol.astype(jnp.float64)
    out = out.transpose(0, 2, 1, 3).reshape(Lp, R, npad)
    return out[:L, :r, :n]


try:  # pragma: no cover - custom_batching present in all supported jax
    from jax import custom_batching as _cbg

    @_cbg.custom_vmap
    def matmul_ds(a, bmat):
        """float64 ``a @ bmat`` via the double-single chunk kernel (see
        _matmul_ds_impl).  Under vmap: both-batched operands collapse
        into the lane-tiled batched kernel; a shared right operand
        collapses the lane axis into kernel rows (exact — each output
        row is an independent contraction)."""
        return _matmul_ds_impl(a, bmat)

    @matmul_ds.def_vmap
    def _matmul_ds_vmap(axis_size, in_batched, a3, b3):
        a_b, b_b = in_batched
        if a_b and b_b and a3.ndim == 3:
            return _bmatmul_ds(a3, b3), True
        if a_b and not b_b and a3.ndim == 3:
            L, r, k = a3.shape
            out = _matmul_ds_impl(a3.reshape(L * r, k), b3)
            return out.reshape(L, r, out.shape[-1]), True
        out = jax.vmap(_matmul_ds_impl,
                       in_axes=(0 if a_b else None,
                                0 if b_b else None))(a3, b3)
        return out, True
except Exception:  # pragma: no cover
    matmul_ds = _matmul_ds_impl


def gemv_ds_available() -> bool:
    if not _HAS_PALLAS:
        return False
    from .backend import tpu_kernels_on

    return tpu_kernels_on()


# --------------------- factor-time prechunked big operands -------------
# The dense-LDL solve path (ops/ldl.ldl_solve) runs a @ Linv.T and
# t @ Linv against the SAME factor ~2 x (1 + nitref-trips) times per IPM
# iteration; matmul_ds re-splits the (Dp, Dp) f64 operand to an (hi, lo)
# pair, materializes the .T copy, and re-runs the bf16 chunk
# decomposition IN-KERNEL on every call (the dominant VPU work of a
# solve: 7 round/mul/sub rounds over Dp^2 elements).  A PrechunkedOperand
# runs that decomposition ONCE per factorization at the XLA level —
# per-B-slab of the contraction axis, the exact `_chunks_scaled` values
# the kernel would compute (max/grid-snap arithmetic is rounding-free,
# so the chunks are bit-identical) — and the solve kernel streams only
# the bf16 chunk stacks + f32 scale rows (14 B/element vs the pair's 8:
# 1.75x the HBM read, far below the removed per-call chunk work at the
# measured trip counts).  `transpose_b` chunks along axis 1 so
# a @ Bmat.T never materializes the transpose.


class PrechunkedOperand:
    """Big constant matmul operand, bf16-chunked once per B-slab of its
    contraction axis.  ``hi, lo``: (K, N) f32 pair ( (N, K) with
    ``transpose_b``), both dims multiples of 128.  ``rmatmul(a)``
    computes a @ B (or a @ B.T) for float64 ``a`` of shape (r, K)."""

    def __init__(self, hi, lo, transpose_b: bool = False):
        assert hi.ndim == 2 and hi.shape == lo.shape, (hi.shape, lo.shape)
        self.tb = transpose_b
        if not transpose_b:
            kp, npad = hi.shape
            nk = kp // B
            ch, s = _chunks_scaled(hi.reshape(nk, B, npad),
                                   lo.reshape(nk, B, npad), axis=1)
            self.chunks = tuple(c.reshape(kp, npad) for c in ch)
            s2 = s.reshape(nk, npad)
        else:
            npad, kp = hi.shape
            nk = kp // B
            ch, s = _chunks_scaled(hi.reshape(npad, nk, B),
                                   lo.reshape(npad, nk, B), axis=2)
            self.chunks = tuple(c.reshape(npad, kp) for c in ch)
            s2 = s.reshape(npad, nk).T                    # (nk, npad)
        assert kp % B == 0 and npad % B == 0, (kp, npad)
        nk8 = -(-nk // 8) * 8
        self.scales = (jnp.zeros((nk8, npad), jnp.float32)
                       .at[:nk].set(s2))
        self.kp, self.npad = kp, npad

    def rmatmul(self, a):
        """a @ B (or a @ B.T): float64 ``a`` of shape (r, kp)."""
        assert a.ndim == 2 and a.shape[1] == self.kp, (a.shape, self.kp)
        r = a.shape[0]
        R = -(-max(r, 1) // KP) * KP
        if R > RB_MAX:
            R = -(-R // RB_MAX) * RB_MAX
        ap = jnp.zeros((R, self.kp), a.dtype).at[:r].set(a)
        ah = ap.astype(jnp.float32)
        al = (ap - ah.astype(jnp.float64)).astype(jnp.float32)
        oh, ol = _gemv_pre_call(R, self.kp, self.npad,
                                self.scales.shape[0], self.tb,
                                _PRE_INTERPRET)(
            ah, al, *self.chunks, self.scales)
        out = oh.astype(jnp.float64) + ol.astype(jnp.float64)
        out = out.transpose(1, 0, 2).reshape(R, self.npad)
        return out[:r]


def _gemv_kernel_prechunked(R, tb, *refs):
    """One 128-wide output panel against a prechunked operand:
    contraction looped in VMEM, only MXU dots + TwoSum folds (the chunk
    decomposition of the big operand happened at factor time).
    Bit-identical to _gemv_kernel on the same operand values."""
    ah_ref, al_ref = refs[0], refs[1]
    bc = refs[2:2 + _NCHUNK]
    bs_ref = refs[2 + _NCHUNK]
    oh_ref, ol_ref = refs[3 + _NCHUNK], refs[4 + _NCHUNK]
    Kp = ah_ref.shape[-1]
    nk = Kp // B

    def step(k, acc):
        ach, acl = acc
        Ah = ah_ref[:, pl.ds(k * B, B)]
        Al = al_ref[:, pl.ds(k * B, B)]
        if tb:
            get = lambda t, k=k: bc[t][:, pl.ds(k * B, B)]  # noqa: E731
        else:
            get = lambda t, k=k: bc[t][pl.ds(k * B, B), :]  # noqa: E731
        ph, plo = _ds_matmul_pre(Ah, Al, get, bs_ref[pl.ds(k, 1), :],
                                 transpose_b=tb)
        return ds_add(ach, acl, ph, plo)

    zero = jnp.zeros((R, B), jnp.float32)
    oh, ol = _fori32(nk, step, (zero, zero))
    oh_ref[...] = oh.reshape(oh_ref.shape)
    ol_ref[...] = ol.reshape(ol_ref.shape)


_PRE_INTERPRET = False   # tests flip this to route through the interpreter


@functools.lru_cache(maxsize=256)
def _gemv_pre_call(R: int, kp: int, npad: int, nk8: int, tb: bool,
                   interpret: bool = False):
    nn = npad // B
    RB = min(R, RB_MAX)
    assert R % RB == 0, (R, RB)
    nr = R // RB
    spec_a = pl.BlockSpec((RB, kp), lambda j, r: (r, 0),
                          memory_space=pltpu.VMEM)
    if tb:
        spec_c = pl.BlockSpec((B, kp), lambda j, r: (j, 0),
                              memory_space=pltpu.VMEM)
    else:
        spec_c = pl.BlockSpec((kp, B), lambda j, r: (0, j),
                              memory_space=pltpu.VMEM)
    spec_s = pl.BlockSpec((nk8, B), lambda j, r: (0, j),
                          memory_space=pltpu.VMEM)
    spec_o = pl.BlockSpec((1, RB, B), lambda j, r: (j, r, 0),
                          memory_space=pltpu.VMEM)
    # the double-buffered chunk panels alone are 7*kp*B*2*2 bytes; past
    # the 16 MB default scoped budget, raise the limit (128 MB chip)
    vmem = (2 * _NCHUNK * kp * B * 2 + 2 * 2 * RB * kp * 4
            + 2 * nk8 * B * 4 + 4 * RB * B * 4)
    params = {}
    if vmem > 15 * 2 ** 20:
        params = dict(compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 2 ** 20))
    kern = functools.partial(_gemv_kernel_prechunked, RB, tb)

    def call(ah, al, *cs):
        with jax.enable_x64(False):
            return pl.pallas_call(
                kern,
                grid=(nn, nr),
                in_specs=[spec_a, spec_a] + [spec_c] * _NCHUNK + [spec_s],
                out_specs=(spec_o, spec_o),
                out_shape=(jax.ShapeDtypeStruct((nn, nr * RB, B),
                                                jnp.float32),) * 2,
                interpret=interpret,
                **params,
            )(ah, al, *cs)

    return jax.jit(call)
