"""Pallas TPU kernels: double-single block-banded LDL^T factor + solves.

The banded strategy (ops/band_ldl.py) is the sparse-direct path for
MPC-class problems (block bandwidth 1 after RCM: the KKT staircase).
Run as XLA ops its float64 block products each lower to a chunked
while-loop whose per-iteration runtime overhead (~65us on v5e, measured)
exceeds the math by orders of magnitude at (128,128) sizes; plain f32
products (~7e-7) break the interior-point endgame (measured: 3/16 lanes
converge).  These kernels run the ENTIRE factorization (and each
triangular solve) in one Pallas launch per lane at ~2^-48 effective
precision:

* numbers are carried as double-single (hi, lo) float32 pairs;
* block products use an exact-product split scheme: each f32 splits
  into three bf16 chunks (8 mantissa bits each, exact); chunk-pair
  products have <= 16 mantissa bits, so a 128-term f32 accumulation on
  the MXU is EXACT (16 + log2(128) = 23 < 24); partials merge by
  magnitude level with error-free TwoSum — a double-single GEMM built
  from full-rate bf16 MXU passes (21 per product, i+j <= 5);
* the diagonal leaf elimination is blocked-panel (_leaf_eliminate_blocked):
  the sequential double-single rank-1 arithmetic runs on 16-row panel
  slices and the trailing-matrix / unit-lower-inverse updates are
  deferred to one sqrt|d|-balanced small-K chunked MXU product per
  panel — ~2.3x the plain elementwise loop at the same refinement
  behavior.

Block bandwidth 1 (the MPC/staircase case — RCM gives bwb=1 on the
whole bench family) uses the specialized kernels below; bandwidths 2-6
(LPnetlib-class shapes) get ring-buffer generalizations
(band_factor_ds_bw / band_solve_ds_bw); wider bands fall back to the
XLA scan in ops/band_ldl.py (the bw^2-block VMEM L ring exceeds the
16 MB scoped budget at bw = 8).

Role: this is the performance-critical half of the Eigen-SimplicialLDLT
replacement (/root/reference/include/eicos.hpp:221-222) — AMD-ordered
sparse LDL^T becomes RCM-ordered block-banded LDL^T fused into TPU
kernels, with float64 iterative refinement (kkt.solve_refined)
recovering exact-operator accuracy.
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

from .pallas_leaf_ds import (B, _fori32, _two_sum, _quick_renorm, ds_add,
                             ds_mul, ds_div, ds_outer)


# ---------------- double-single GEMM from exact bf16 partials ----------
# Ozaki-style mantissa slicing (an XLA-level variant that did
# the same from float64 in XLA): operands scale per output-row/column to
# [0, 1) by an exact power of two, then split into 8-bit GRID-ALIGNED
# chunks (integer multiples of 2^-8(k+1), magnitude <= 2^8 — exactly
# bf16).  Chunk-pair products are integers <= 2^16 on a fixed grid, so a
# 128-term f32 MXU accumulation is EXACT (16 + 7 = 23 < 24 bits).  The
# 21 partials (levels s+t <= 5) fold into a double-single accumulator
# with error-free TwoSum — ~2^-48 worst-case relative error overall.

import os as _os

_NCHUNK = 7          # 7 x 8 bits = 56 mantissa bits (> f64's 53)
_NLEVEL = int(_os.environ.get("EICOS_NLEVEL", "8"))
#                      keep s + t <= _NLEVEL-1 (dropped tail ~2^-64 at
#                      8); the extra chunk + level cut iterative-
#                      refinement rounds and buy the interior-point
#                      endgame margin on outlier lanes — measured.  The
#                      env override exists for measurement only (round
#                      5 re-tests 7 now that the exit-time f64 recheck
#                      + rescue absorb margin flips); production stays
#                      at the default.


def _pow2_above(m):
    """Exact power of two > m (f32, elementwise, bit tricks).
    int32 constants are explicit so the function also traces at the
    XLA level under enable_x64 (prechunk_band_fac)."""
    bits = jax.lax.bitcast_convert_type(m, jnp.int32)
    e = jax.lax.shift_right_logical(bits, np.int32(23)) & np.int32(255)
    s = jax.lax.shift_left(jnp.minimum(e + np.int32(1), np.int32(254)),
                           np.int32(23))
    s = jax.lax.bitcast_convert_type(s, jnp.float32)
    return jnp.where(m > 0.0, s, 1.0)


def _pow2_half(d):
    """Exact power of two ~ sqrt(|d|) (f32, elementwise, bit tricks).

    For |d| in [2^2k, 2^2k+2) returns 2^k; inputs are clamped-away-from-
    zero pivots (|d| >= 1e-30), so the result is a normal float."""
    bits = jax.lax.bitcast_convert_type(jnp.abs(d), jnp.int32)
    ex = (jax.lax.shift_right_logical(bits, np.int32(23))
          & np.int32(255))                               # biased exp
    half = (jax.lax.shift_right_arithmetic(ex - np.int32(127),
                                           np.int32(1)) + np.int32(127))
    half = jnp.clip(half, 1, 254)
    return jax.lax.bitcast_convert_type(
        jax.lax.shift_left(half, np.int32(23)), jnp.float32)


def _chunks_scaled(xh, xl, axis):
    """(hi, lo) f32 -> (chunks[6] bf16, scale) along reduction ``axis``.

    scale is per output-row/col (max over the contraction axis);
    chunks[k] holds bits [8k, 8(k+1)) of x/scale on a fixed grid.
    """
    m = jnp.max(jnp.abs(xh), axis=axis, keepdims=True)
    s = _pow2_above(m)
    r = xh / s                      # exact, |r| < 1
    rl = xl / s
    chunks = []
    for k in range(_NCHUNK):
        if k == 3:
            r = r + rl              # fold in the low part (|r| ~ 2^-24)
        up = jnp.float32(2.0 ** (8 * (k + 1)))
        c = jnp.round(r * up) / up  # snap to grid 2^-8(k+1) (exact ops)
        r = r - c                   # exact
        chunks.append(c.astype(jnp.bfloat16))
    return chunks, s


# ---------------- int8 chunk STORAGE for the prechunked solve streams --
# The prechunked solve kernels are HBM-stream-bound (tools/
# tsolve_probe.py: T = 4/8/16 within 2%), streaming 4 chunk orientations
# of L and Dinv at 7 bf16 chunks = 14 B/element.  Storing the chunks as
# 7-BIT-GRID INT8 INTEGERS (8 chunks x 1 B = 8 B/element) cuts that
# stream 43%; in-kernel the integers convert to bf16 exactly (|int| <=
# 72 < 2^8) and scale by the grid power of two, after which the dots are
# the same exact-product bf16 MXU passes as the 8-bit scheme (products
# on the level grid 2^-7(s+t+2); a whole level's f32 pair-adds stay
# exact: <= 8 pairs x 128 terms x 72^2 ~ 2^22.3 < 2^24).  The rhs side
# chunks in-kernel on the same 7-bit grids (one extra snap round on
# small slabs).  Scales double (2 * pow2_above) so chunk 0 stays <= 64
# and the k = 3 TwoSum fold bump stays <= 72 — int8-safe.  Tail after 8
# chunks ~2^-57 of scale, at or below the 8-bit scheme's single-fold
# ~2^-49.
#
# Scheme selection is per-factorization: Settings.chunk_store picks the
# emission (kkt.py), and the solve kernels dispatch on the stored chunk
# dtype — jit-cache-correct because the avals differ.

_NCHUNK8 = 8
_I8_LEVELS = tuple(
    tuple((s, lvl - s)
          for s in range(max(0, lvl - _NCHUNK8 + 1),
                         min(_NCHUNK8, lvl + 1)))
    for lvl in range(9))
_I8_GRIDS = tuple(float(2.0 ** (-7 * (t + 1))) for t in range(_NCHUNK8))


def _chunks7(xh, xl, axis, as_int8: bool = True):
    """(hi, lo) f32 -> (chunks[_NCHUNK8], scale) on 7-bit grids.

    ``as_int8``: chunks as int8 INTEGERS (c / grid — the storage form);
    else bf16 VALUES (c itself — the in-kernel rhs-side form).  The lo
    part folds at k = 3 via TwoSum (bump <= 72, int8-safe) and the
    captured fold error re-folds at k = 6 where the grid absorbs it."""
    m = jnp.max(jnp.abs(xh), axis=axis, keepdims=True)
    s = 2.0 * _pow2_above(m)
    r = xh / s
    rl = xl / s
    err = None
    chunks = []
    for k in range(_NCHUNK8):
        if k == 3:
            r, err = _two_sum(r, rl)
        if k == 6:
            r = r + err
        up = jnp.float32(2.0 ** (7 * (k + 1)))
        c = jnp.round(r * up) / up      # snap to grid 2^-7(k+1) (exact)
        r = r - c                       # exact
        chunks.append((c * up).astype(jnp.int8) if as_int8
                      else c.astype(jnp.bfloat16))
    return chunks, s


def _ds_matmul_pre_i8_b(ah, al, get_chunk, sb_row, T: int,
                        transpose_b: bool = False):
    """Lane-batched ds product against an int8-stored prechunked operand:
    ``ah, al`` (T, R, K) f32 rows, ``get_chunk(t)`` -> (T, B, B) int8
    integer chunk t, ``sb_row`` (T, 1, N) f32 (doubled) scale rows.
    Each int8 chunk converts to its bf16 VALUE once per call (exact:
    integer <= 72 times a power of two)."""
    a, sa = _chunks7(ah, al, axis=2, as_int8=False)
    if transpose_b:
        dn = (((2,), (2,)), ((0,), (0,)))
    else:
        dn = (((2,), (1,)), ((0,), (0,)))
    bval = [None] * _NCHUNK8
    sh = sl = None
    for pairs in _I8_LEVELS:
        p = None
        for s_, t in pairs:
            if bval[t] is None:
                bval[t] = (get_chunk(t).astype(jnp.bfloat16)
                           * jnp.bfloat16(_I8_GRIDS[t]))
            q = jax.lax.dot_general(
                a[s_], bval[t], dn,
                precision=jax.lax.Precision.DEFAULT,
                preferred_element_type=jnp.float32)
            p = q if p is None else p + q       # same-level: exact
        if sh is None:
            sh, sl = p, jnp.zeros_like(p)
        else:
            sh, e = _two_sum(sh, p)
            sl = sl + e
    sh, sl = _quick_renorm(sh, sl)
    scale = sa * sb_row
    return sh * scale, sl * scale


def _ds_matmul_pre_i8(ah, al, get_chunk, sb_row,
                      transpose_b: bool = False):
    """Per-lane _ds_matmul_pre_i8_b: ``ah, al`` (R, K), chunks (B, B),
    ``sb_row`` (1, N)."""
    a, sa = _chunks7(ah, al, axis=1, as_int8=False)
    if transpose_b:
        dn = (((1,), (1,)), ((), ()))
    else:
        dn = (((1,), (0,)), ((), ()))
    bval = [None] * _NCHUNK8
    sh = sl = None
    for pairs in _I8_LEVELS:
        p = None
        for s_, t in pairs:
            if bval[t] is None:
                bval[t] = (get_chunk(t).astype(jnp.bfloat16)
                           * jnp.bfloat16(_I8_GRIDS[t]))
            q = jax.lax.dot_general(
                a[s_], bval[t], dn,
                precision=jax.lax.Precision.DEFAULT,
                preferred_element_type=jnp.float32)
            p = q if p is None else p + q
        if sh is None:
            sh, sl = p, jnp.zeros_like(p)
        else:
            sh, e = _two_sum(sh, p)
            sl = sl + e
    sh, sl = _quick_renorm(sh, sl)
    scale = sa * sb_row
    return sh * scale, sl * scale


def ds_matmul(ah, al, bh, bl, transpose_b: bool = False):
    """Double-single product of (hi, lo) f32 matrices on the MXU.

    a: (M, K); b: (K, N), or (N, K) with ``transpose_b``.  Contraction
    length must be <= 256 for the exactness argument.  Returns (hi, lo).
    """
    a, sa = _chunks_scaled(ah, al, axis=1)            # sa: (M, 1)
    if transpose_b:
        b, sb = _chunks_scaled(bh, bl, axis=1)        # sb: (N, 1)
        dn = (((1,), (1,)), ((), ()))
        sb_out = sb.T
    else:
        b, sb = _chunks_scaled(bh, bl, axis=0)        # sb: (1, N)
        dn = (((1,), (0,)), ((), ()))
        sb_out = sb

    # ROW-STACKED dots (round 4, see _ds_matmul_pre): all live (s, t)
    # products against operand chunk t come from ONE MXU dot of the
    # a-chunk row stack — 7 dots instead of ~17-34 (16-row dots were
    # ~90% pipeline fill).  The same-level pair sum moves from the
    # gsz=2 concatenated-dot accumulator to an explicit f32 add of the
    # two sliced partials — exactly equal (2 * 128 * 2^16 <= 2^24 on
    # the level grid), so the TwoSum folds below are bit-identical.
    # Beyond K = 128 a pair may exceed 2^24: one fold per partial, as
    # before.  Explicit DEFAULT precision on the dots: an ambient
    # default_matmul_precision("highest") context (kkt.py wraps its
    # solves in one) would otherwise ask Mosaic for a multi-pass bf16x6
    # algorithm on ALREADY-bf16 operands, which it rejects ("Bad lhs
    # type"); the chunk products are exact in one pass by construction.
    M = ah.shape[0]
    A = jnp.concatenate(a, axis=0)                    # (nch*M, K)
    prods = [jax.lax.dot_general(
        A[:_PRE_NS[t] * M], b[t], dn,
        precision=jax.lax.Precision.DEFAULT,
        preferred_element_type=jnp.float32) for t in range(_NCHUNK)]
    gsz = 2 if ah.shape[1] <= 128 else 1
    sh = None
    sl = None
    for pairs in _LEVEL_PAIRS:
        for g in range(0, len(pairs), gsz):
            grp = pairs[g:g + gsz]
            p = None
            for s, t in grp:
                q = prods[t][s * M:(s + 1) * M]
                p = q if p is None else p + q
            if sh is None:
                sh, sl = p, jnp.zeros_like(p)
            else:
                sh, e = _two_sum(sh, p)
                sl = sl + e
    sh, sl = _quick_renorm(sh, sl)
    scale = sa * sb_out
    return sh * scale, sl * scale


# --------------------------- leaf elimination (inlined, from leaf_ds) --
def _leaf_eliminate(Mh, Ml):
    """(B, B) double-single symmetric block -> (Lstrict, d, Linv), all
    double-single.  The original elementwise rank-1 loop — superseded on
    the hot path by _leaf_eliminate_blocked, kept as the accuracy
    reference for tests/test_pallas_ds.py::test_blocked_leaf_elimination."""
    row = lax.broadcasted_iota(jnp.int32, (B, B), 0)
    col = lax.broadcasted_iota(jnp.int32, (B, B), 1)
    rowv = lax.broadcasted_iota(jnp.int32, (B, 1), 0)
    colv = lax.broadcasted_iota(jnp.int32, (1, B), 1)
    eye = (row == col).astype(jnp.float32)

    def body(j, carry):
        Mh, Ml, Lh, Ll, dh, dl, Xh, Xl = carry
        cmask = col == j
        # column j and pivot via masked reductions (exact: one term/row;
        # pivot extracted from the (B, 1) column, not the full matrix)
        cjh = jnp.sum(jnp.where(cmask, Mh, 0.0), axis=1, keepdims=True)
        cjl = jnp.sum(jnp.where(cmask, Ml, 0.0), axis=1, keepdims=True)
        djh = jnp.sum(jnp.where(rowv == j, cjh, 0.0))
        djl = jnp.sum(jnp.where(rowv == j, cjl, 0.0))
        tiny = jnp.float32(1e-30)
        djh = jnp.where(jnp.abs(djh) < tiny,
                        jnp.where(djh < 0, -tiny, tiny), djh)
        lh, ll = ds_div(cjh, cjl, jnp.broadcast_to(djh, (B, 1)),
                        jnp.broadcast_to(djl, (B, 1)))
        below = rowv > j
        lh = jnp.where(below, lh, 0.0)
        ll = jnp.where(below, ll, 0.0)
        # fold the pivot into the (B, 1) column BEFORE the outer
        # product ((d*l) l^T == l d l^T), and use the broadcast-aware
        # ds_outer so splits run at vector shapes
        ldh, ldl = ds_mul(lh, ll, jnp.broadcast_to(djh, (B, 1)),
                          jnp.broadcast_to(djl, (B, 1)))
        uph, upl = ds_outer(ldh, ldl, lh.reshape(1, B), ll.reshape(1, B))
        Mh, Ml = ds_add(Mh, Ml, -uph, -upl)
        Lh = jnp.where(cmask, lh, Lh)
        Ll = jnp.where(cmask, ll, Ll)
        dh = jnp.where(colv == j, djh, dh)
        dl = jnp.where(colv == j, djl, dl)
        rjh = jnp.sum(jnp.where(row == j, Xh, 0.0), axis=0, keepdims=True)
        rjl = jnp.sum(jnp.where(row == j, Xl, 0.0), axis=0, keepdims=True)
        sh, sl = ds_outer(lh, ll, rjh, rjl)
        Xh, Xl = ds_add(Xh, Xl, -sh, -sl)
        return Mh, Ml, Lh, Ll, dh, dl, Xh, Xl

    z_bb = jnp.zeros((B, B), jnp.float32)
    z_1b = jnp.zeros((1, B), jnp.float32)
    _, _, Lh, Ll, dh, dl, Xh, Xl = _fori32(
        B, body, (Mh, Ml, z_bb, z_bb, z_1b, z_1b, eye, z_bb))
    return (Lh, Ll), (dh, dl), (Xh, Xl)


# ----------------- blocked-panel leaf elimination (the fast variant) ---
# The plain leaf loop above costs 128 sequential steps x ~82 vector ops
# at (B, B) = 16 vregs each — measured as the saturation wall of the
# whole benchmark (VPU-bound).  The blocked variant runs the sequential
# rank-1 arithmetic on a (P, B) panel row-slice (P = 16 -> 2 vregs per
# op) and defers the trailing-matrix and inverse updates to one small-K
# chunked MXU product per panel.  For K = P = 16 the per-level
# concatenated bf16 dots are EXACT (<= 7 partials x 16 * 2^16 < 2^23),
# so each panel GEMM folds with just _NLEVEL TwoSums instead of one per
# partial.  Same elimination order and double-single arithmetic as the
# plain loop — only the schedule changes.

P_LEAF = int(_os.environ.get("EICOS_P_LEAF", "16"))
# the split phase-A schedule runs each panel as two P/2-step loops
# (steps P/2..P-1 touch only the bottom sublane tile) — odd P would
# silently leave the last panel row uneliminated.  Env override for
# measurement (P=8 was slower in round 2, BEFORE the split schedule).
assert P_LEAF % 2 == 0 and B % P_LEAF == 0, P_LEAF
_UNROLL_INNER = False


def _ds_outer_sub(Mh, Ml, ah, al, bh, bl):
    """M - a (x) b for broadcast factors (a: (P,1), b: (1,B)), with the
    low-order merge done in plain f32 (3 rounding errors at
    2^-24 * max(|lo terms|) ~ 2^-48 elementwise of the local operands —
    the same class as, and below, the panel GEMMs' scale-relative
    truncation).  ~11 fewer full-size ops than ds_outer + accurate
    ds_add per call; used ONLY inside the blocked leaf's panel loop."""
    from .pallas_leaf_ds import _split

    p = ah * bh
    ahh, ahl = _split(ah)
    bhh, bhl = _split(bh)
    perr = ((ahh * bhh - p) + ahh * bhl + ahl * bhh) + ahl * bhl
    perr = perr + (ah * bl + al * bh)
    sh, e = _two_sum(Mh, -p)
    sl = (Ml - perr) + e
    return _quick_renorm(sh, sl)


_LEVEL_PAIRS = tuple(
    tuple((s, lvl - s) for s in range(min(_NCHUNK, lvl + 1))
          if lvl - s < _NCHUNK)
    for lvl in range(_NLEVEL))


def _panel_dots(a_chunks, b_chunks, row_lo):
    """Sum_j a[j, i] * b[j, c] for the double-single chunk lists, rows
    ``i >= row_lo`` only.  Returns (hi, lo) f32 of shape (B - row_lo, B).
    Per-level concatenated dots are exact for contraction depth P<=32;
    the <= _NLEVEL level sums fold with TwoSum."""
    sh = sl = None
    dn = (((0,), (0,)), ((), ()))
    for pairs in _LEVEL_PAIRS:
        A = jnp.concatenate([a_chunks[s] for s, _ in pairs], axis=0)
        Bc = jnp.concatenate([b_chunks[t] for _, t in pairs], axis=0)
        p = jax.lax.dot_general(A, Bc, dn,
                                precision=jax.lax.Precision.DEFAULT,
                                preferred_element_type=jnp.float32)
        p = p[row_lo:]
        if sh is None:
            sh, sl = p, jnp.zeros_like(p)
        else:
            sh, e = _two_sum(sh, p)
            sl = sl + e
    return _quick_renorm(sh, sl)


def _leaf_eliminate_blocked(Mh, Ml):
    """(B, B) double-single symmetric block -> (d, Linv), double-single.

    Blocked-panel reorganization of _leaf_eliminate (identical
    elimination order and pivot clamp); L itself is not materialized
    (the band kernel never uses it).  Thin wrapper over the batched
    variant at T = 1 — tests pin the two bit-identical
    (tests/test_pallas_ds.py::test_batched_leaf_matches_single)."""
    (dh, dl), (Xh, Xl) = _leaf_eliminate_blocked_b(Mh[None], Ml[None])
    return (dh[0], dl[0]), (Xh[0], Xl[0])


# ---------------- lane-tiled (batched) variants --------------------------
# The (P, B)- and (1, B)-shaped vector ops of the leaf inner loop are 2-4
# vregs each: at 128 vmapped lanes the kernel is ISSUE-bound, not
# flop-bound (measured: the leaf is ~60% of a 118 ms factor call at 128
# lanes).  Processing T lanes per grid program turns every one of those
# ops into a (T, P, B) slab — same issue count serves T lanes.  The MXU
# dots stay per-lane (static T-loop; the operands genuinely differ), but
# their bf16 chunk decompositions batch too (row-scaled chunking is
# per-output-row, so stacking lanes along rows is exact).

T_LANES = 16    # measured on hardware: 44.0 / 42.7 / 40.5 ms per
#                 128-lane bench-shape factor at T = 4 / 8 / 16 — the
#                 leaf is no longer issue-bound past T = 8, but the wider
#                 slabs still amortize ~5%.  Bit-identical output (the
#                 tiling changes scheduling, not arithmetic).


def _bT(x, T):
    """(T*R, C) scratch view -> (T, R, C) (free: splits the sublane dim)."""
    return x.reshape(T, x.shape[0] // T, x.shape[1])


def _ds_matmul_b(ah, al, bh, bl, T: int, transpose_b: bool = True):
    """Batched double-single product over a leading lane axis:
    a @ b^T for (T, M, K) x (T, N, K) (``transpose_b``, the default) or
    a @ b for (T, M, K) x (T, K, N).  Chunk decompositions run on the
    full slabs (scales are per output row/col of each lane — exact
    across stacked lanes); the level-pair dots loop lanes statically.
    Same per-lane arithmetic as ds_matmul."""
    a, sa = _chunks_scaled(ah, al, axis=2)            # sa: (T, M, 1)
    if transpose_b:
        b, sb = _chunks_scaled(bh, bl, axis=2)        # sb: (T, N, 1)
        dn = (((2,), (2,)), ((0,), (0,)))
        sb_out = jnp.swapaxes(sb, 1, 2)
    else:
        b, sb = _chunks_scaled(bh, bl, axis=1)        # sb: (T, 1, N)
        dn = (((2,), (1,)), ((0,), (0,)))
        sb_out = sb
    # ROW-STACKED dots (round 4, see _ds_matmul_pre): all live (s, t)
    # products against operand chunk t come from ONE lane-batched MXU
    # dot of the a-chunk row stack — 7 dots instead of 17 K=256 dots
    # (each of which was two MXU passes).  The gsz=2 group pair-sum
    # moves from the MXU accumulator to an explicit f32 add of the two
    # sliced partials — exactly equal (both are integers <= 2^24 on
    # the level grid), so the folds below are bit-identical.
    R = ah.shape[1]
    A = jnp.concatenate(a, axis=1)                    # (T, nch*R, B)
    prods = [jax.lax.dot_general(
        A[:, :_PRE_NS[t] * R], b[t], dn,
        precision=jax.lax.Precision.DEFAULT,
        preferred_element_type=jnp.float32) for t in range(_NCHUNK)]
    gsz = 2 if ah.shape[2] <= 128 else 1
    sh = sl = None
    for pairs in _LEVEL_PAIRS:
        for g in range(0, len(pairs), gsz):
            grp = pairs[g:g + gsz]
            p = None
            for s, t in grp:
                q = prods[t][:, s * R:(s + 1) * R]
                p = q if p is None else p + q
            if sh is None:
                sh, sl = p, jnp.zeros_like(p)
            else:
                sh, e = _two_sum(sh, p)
                sl = sl + e
    sh, sl = _quick_renorm(sh, sl)
    scale = sa * sb_out
    return sh * scale, sl * scale


def _panel_dots_b(a_chunks, b_chunks, row_lo, T: int):
    """Batched _panel_dots: chunk lists of (T, P, B) slabs ->
    (T, B - row_lo, B) double-single, contracting the P axis per lane.
    One lane-batched MXU dot per level (see _ds_matmul_b)."""
    sh = sl = None
    dn = (((1,), (1,)), ((0,), (0,)))
    for pairs in _LEVEL_PAIRS:
        A = jnp.concatenate([a_chunks[s] for s, _ in pairs], axis=1)
        Bc = jnp.concatenate([b_chunks[t] for _, t in pairs], axis=1)
        p = jax.lax.dot_general(A, Bc, dn,
                                precision=jax.lax.Precision.DEFAULT,
                                preferred_element_type=jnp.float32)
        p = p[:, row_lo:]
        if sh is None:
            sh, sl = p, jnp.zeros_like(p)
        else:
            sh, e = _two_sum(sh, p)
            sl = sl + e
    return _quick_renorm(sh, sl)


def _leaf_eliminate_blocked_b(Mh, Ml):
    """Batched _leaf_eliminate_blocked: (T, B, B) double-single blocks ->
    ((T, 1, B) d, (T, B, B) Linv), identical per-lane arithmetic (the
    batch axis only widens the vector ops).

    Panel-local MAX-|diag| pivoting was implemented and REJECTED on
    hardware here (see git history): it repaired adversarial single
    blocks (tests) but made the 256-lane endgame edge WORSE on the
    real trajectory (253/256 vs 255/256 OPTIMAL) at +16% factor cost —
    the within-panel scope is too narrow to fix the band ORDER's f64
    growth pathology, and reordering perturbs every healthy lane.

    Deferring the in-loop W substitution to a per-panel Newton-Schulz
    inverse of the (P, P) in-panel unit-lower + one chunk GEMM was also
    tried and REJECTED (hardware: 2/128 lanes OPTIMAL, 69 NaN-exit):
    NS forms the Neumann partial sums, whose intermediate terms under
    ~1e7 elimination growth are astronomically larger than the final
    inverse — the 2^-48 double-single error is relative to those LARGE
    intermediates, so the cancellation destroys the small true entries
    that sequential substitution computes stably.

    COMPACTED RIGHT-LOOKING PANEL SCHEDULE (round 4; replaces the
    round-3 fused (T, B, 2B) slab with BIT-IDENTICAL output): two fully
    deferred variants were measured on hardware first and REJECTED —
    (a) pushing the panel's M rows through an exact small-K chunk GEMM
    (factor 38 -> 30.4 ms/iter but 4/128 bench lanes lost OPTIMAL: the
    GEMM's scale-relative ~2^-56-of-rowmax truncation is far coarser
    than the sequential loop's elementwise ~2^-48 for entries below the
    row maxima, and the error feeds later pivots), and (b) deferring
    only the X columns [0, q) (M stays sequential; still 124/128 with
    elevated refinement floors and nitref hitting the cap: X feeds the
    next band block's L = Ksub @ X^T, so its truncation also lands in
    future pivots; a sqrt|d|-equilibrated form of that GEMM overflowed
    f32 under the 1e-30 pivot clamp and was catastrophically worse,
    44/128).  What remains here keeps the round-3 ARITHMETIC op-for-op
    and compacts the LAYOUT only — every change below is a pure
    reindexing of column-independent ops, so the output is bit-identical
    to the round-3 slab (pinned by tests against the plain rank-1 loop):

    * master slab (T, B, B) instead of (T, B, 2B): a row of panel p
      stores [X columns 0..t0 | M columns t0..B] once eliminated, and
      [X columns 0..q | M columns q..B] while pending — M columns below
      q and X columns above t0 are structurally dead/zero and are
      simply not stored;
    * the panel inner loop runs on a (T, P, (B - q) + t0) =
      (T, P, B + P) slab [M q..B | X 0..t0] — same masked reductions,
      same _ds_outer_sub, same rf = [l*d | wj] row factor;
    * the multiplier-column extraction reads l's (T, 1, P) panel slice
      broadcast over (T, P, P) instead of the full-width slab (the
      selected values are identical);
    * the trailing chunk GEMM drops its structurally-zero half: the b
      operand [W e^-1 (t0 cols) | L e d e^-2 (B - t0 cols)] is exactly
      B wide (was 2B), and per-column chunk scales/dots/folds make each
      surviving column bit-identical to the wide form.

    SPLIT PHASE-A SCHEDULE (round 4, on top of the compaction): the
    panel's P = 16 sequential steps run as two H = 8 loops.  Steps
    0..7 update the full (T, P, C) slab; steps 8..15 update only the
    bottom sublane tile (T, H, C) — rows 0..7 are final by then and
    the full-slab loop only fed them zero-multiplier updates
    (lph = 0 -> the _ds_outer_sub reduces to a re-application of
    _quick_renorm on an already-normalized pair, the identity except
    on exact half-ulp ties).  Column extractions likewise read the
    H-row tile that contains the pivot row instead of masking the
    whole slab, and the Lt multiplier store carries one H-row tile
    per loop.  ~25% of the phase-A vector work at tile granularity;
    arithmetic is unchanged on every value that is still live."""
    T = Mh.shape[0]
    NP = B // P_LEAF
    P = P_LEAF
    tiny = jnp.float32(1e-30)
    colv = lax.broadcasted_iota(jnp.int32, (1, 1, B), 2)
    eyePP = (lax.broadcasted_iota(jnp.int32, (1, P, P), 1)
             == lax.broadcasted_iota(jnp.int32, (1, P, P), 2))
    # final output mask: row i of panel p keeps columns < (p+1)*P
    keepX = ((lax.broadcasted_iota(jnp.int32, (1, B, B), 2) // P)
             <= (lax.broadcasted_iota(jnp.int32, (1, B, B), 1) // P))

    C = B + P                       # live M columns + live X columns
    lrow = lax.broadcasted_iota(jnp.int32, (1, P, C), 1)
    lcol_r = lax.broadcasted_iota(jnp.int32, (1, 1, C), 2)

    Uh, Ul = Mh, Ml
    dvh = jnp.zeros((T, 1, B), jnp.float32)
    dvl = jnp.zeros((T, 1, B), jnp.float32)

    for p in range(NP):
        q = p * P
        t0 = q + P
        mw = B - q                  # live M width; X width is t0

        # ---- phase A: sequential panel elimination, (T, P, B + P) ----
        # slab layout [M q..B | X 0..q | I_P]; the strip I_P is the
        # panel's own X diagonal block
        pieces_h = [Uh[:, q:t0, q:]]
        pieces_l = [Ul[:, q:t0, q:]]
        if q:
            pieces_h.append(Uh[:, q:t0, :q])
            pieces_l.append(Ul[:, q:t0, :q])
        pieces_h.append(jnp.broadcast_to(eyePP.astype(jnp.float32),
                                         (T, P, P)))
        pieces_l.append(jnp.zeros((T, P, P), jnp.float32))
        Sh = jnp.concatenate(pieces_h, axis=2)
        Sl = jnp.concatenate(pieces_l, axis=2)
        z_row = jnp.zeros((T, 1, C), jnp.float32)

        H = P // 2
        lrowH = lax.broadcasted_iota(jnp.int32, (1, H, C), 1)
        eyeHbot = eyePP[:, H:, :]

        def mk_body(row0, nrows, eye_sel, q=q, mw=mw):
            # eliminates global panel row j = row0 + jj; the carried
            # slab holds the last ``nrows`` panel rows and its first
            # H-row tile contains the pivot rows of this loop
            def body(jj, carry):
                Sh, Sl, Lth, Ltl, dph, dpl, dvh, dvl = carry
                j = jj + row0 if row0 else jj
                rmask = lrowH == jj
                cmask = lcol_r == j
                keep = (lcol_r > j) & (lcol_r < mw)
                cwh = jnp.sum(jnp.where(rmask, Sh[:, :H], 0.0), axis=1,
                              keepdims=True)               # (T, 1, C)
                cwl = jnp.sum(jnp.where(rmask, Sl[:, :H], 0.0), axis=1,
                              keepdims=True)
                djh = jnp.sum(jnp.where(cmask, cwh, 0.0), axis=2,
                              keepdims=True)               # (T, 1, 1)
                djl = jnp.sum(jnp.where(cmask, cwl, 0.0), axis=2,
                              keepdims=True)
                djh = jnp.where(jnp.abs(djh) < tiny,
                                jnp.where(djh < 0, -tiny, tiny), djh)
                djh_b = jnp.broadcast_to(djh, (T, 1, C))
                djl_b = jnp.broadcast_to(djl, (T, 1, C))
                lh, ll = ds_div(cwh, cwl, djh_b, djl_b)
                lh = jnp.where(keep, lh, 0.0)
                ll = jnp.where(keep, ll, 0.0)
                # row r's multiplier = l at local column r (symmetry);
                # the panel slice (T, 1, P) carries every selected value
                lph = jnp.sum(jnp.where(eye_sel,
                                        jnp.broadcast_to(lh[:, :, :P],
                                                         (T, nrows, P)),
                                        0.0), axis=2, keepdims=True)
                lpl = jnp.sum(jnp.where(eye_sel,
                                        jnp.broadcast_to(ll[:, :, :P],
                                                         (T, nrows, P)),
                                        0.0), axis=2, keepdims=True)
                ldh, ldl = ds_mul(lh, ll, djh_b, djl_b)
                # fused row factor: [l*d | wj] exactly as the round-3
                # slab
                xhalf = lcol_r >= mw
                rfh = jnp.where(xhalf, cwh, ldh)
                rfl = jnp.where(xhalf, cwl, ldl)
                Sh, Sl = _ds_outer_sub(Sh, Sl, lph, lpl, rfh, rfl)
                wmask = lrowH[:, :, :mw] == jj
                Lth = jnp.where(wmask,
                                jnp.broadcast_to(lh[:, :, :mw],
                                                 (T, H, mw)), Lth)
                Ltl = jnp.where(wmask,
                                jnp.broadcast_to(ll[:, :, :mw],
                                                 (T, H, mw)), Ltl)
                dph = jnp.where(cmask, djh, dph)           # local pivots
                dpl = jnp.where(cmask, djl, dpl)
                gmask = colv == (q + j)
                dvh = jnp.where(gmask, djh, dvh)
                dvl = jnp.where(gmask, djl, dvl)
                return Sh, Sl, Lth, Ltl, dph, dpl, dvh, dvl

            return body

        z_pm = jnp.zeros((T, H, mw), jnp.float32)
        (Sh, Sl, Lt1h, Lt1l, dph, dpl, dvh, dvl) = _fori32(
            H, mk_body(0, P, eyePP),
            (Sh, Sl, z_pm, z_pm, z_row, z_row, dvh, dvl))
        (S2h, S2l, Lt2h, Lt2l, dph, dpl, dvh, dvl) = _fori32(
            H, mk_body(np.int32(H), H, eyeHbot),
            (Sh[:, H:], Sl[:, H:], z_pm, z_pm, dph, dpl, dvh, dvl))
        Sh = jnp.concatenate([Sh[:, :H], S2h], axis=1)
        Sl = jnp.concatenate([Sl[:, :H], S2l], axis=1)
        Lth = jnp.concatenate([Lt1h, Lt2h], axis=1)
        Ltl = jnp.concatenate([Lt1l, Lt2l], axis=1)

        # eliminated panel rows, output layout [X 0..t0 | M t0..B]: the
        # slab tail [M P..mw | X 0..t0] rotated right by t0 (a lane
        # rotate — Mosaic rejects sublane concats of pieces with
        # mismatched lane offsets, so offset slices can't feed the
        # axis-1 concat below directly)
        if t0 < B:
            Uph = jnp.roll(Sh[:, :, P:], t0, axis=2)
            Upl = jnp.roll(Sl[:, :, P:], t0, axis=2)
        else:
            # last panel: the tail is all-X and a width-B roll would be
            # a zero-width slice; rolling the full C-wide slab by t0
            # lands the X region at lane offset 0 (mw + t0 = C)
            Uph = jnp.roll(Sh, t0, axis=2)[:, :, :B]
            Upl = jnp.roll(Sl, t0, axis=2)[:, :, :B]

        head_h = [Uh[:, :q]] if q else []
        head_l = [Ul[:, :q]] if q else []
        if t0 >= B:
            Uh = jnp.concatenate(head_h + [Uph], axis=1)
            Ul = jnp.concatenate(head_l + [Upl], axis=1)
            break

        # ---- phase B: trailing update at live width B ----------------
        # local pivots (T, 1, C) -> per-panel-row (T, P, 1)
        dpch = jnp.sum(jnp.where(eyePP,
                                 jnp.broadcast_to(dph[:, :, :P],
                                                  (T, P, P)),
                                 0.0), axis=2, keepdims=True)
        dpcl = jnp.sum(jnp.where(eyePP,
                                 jnp.broadcast_to(dpl[:, :, :P],
                                                  (T, P, P)),
                                 0.0), axis=2, keepdims=True)
        e = _pow2_half(dpch)
        einv = 1.0 / e
        m2h = dpch * einv * einv
        m2l = dpcl * einv * einv
        Leh, Lel = Lth * e, Ltl * e                        # (T, P, mw)
        a, sa = _chunks_scaled(Leh, Lel, axis=1)           # sa (T, 1, mw)
        eye_mw = (lax.broadcasted_iota(jnp.int32, (1, mw, mw), 1)
                  == lax.broadcasted_iota(jnp.int32, (1, mw, mw), 2))
        saT = jnp.sum(jnp.where(eye_mw,
                                jnp.broadcast_to(sa, (T, mw, mw)), 0.0),
                      axis=2, keepdims=True)[:, P:]
        # fused b operand [W e^-1 (t0) | L e d e^-2 (B - t0)]: exactly
        # the live columns of the round-3 2B-wide operand
        ldh, ldl = ds_mul(Leh, Lel, jnp.broadcast_to(m2h, (T, P, mw)),
                          jnp.broadcast_to(m2l, (T, P, mw)))
        b2h = jnp.concatenate([Sh[:, :, mw:] * einv, ldh[:, :, P:]],
                              axis=2)                      # (T, P, B)
        b2l = jnp.concatenate([Sl[:, :, mw:] * einv, ldl[:, :, P:]],
                              axis=2)
        bc, sb = _chunks_scaled(b2h, b2l, axis=1)          # sb (T, 1, B)
        uh, ul = _panel_dots_b(a, bc, P, T)                # (T, B-t0, B)
        sc = saT * sb
        # below rows' columns [q, t0) flip from dead M values to live X
        # values here: the prior is structurally zero
        dead = (colv >= q) & (colv < t0)
        Ubh = jnp.where(dead, 0.0, Uh[:, t0:])
        Ubl = jnp.where(dead, 0.0, Ul[:, t0:])
        Ubh, Ubl = ds_add(Ubh, Ubl, -uh * sc, -ul * sc)
        Uh = jnp.concatenate(head_h + [Uph, Ubh], axis=1)
        Ul = jnp.concatenate(head_l + [Upl, Ubl], axis=1)

    Xh = jnp.where(keepX, Uh, 0.0)
    Xl = jnp.where(keepX, Ul, 0.0)
    return (dvh, dvl), (Xh, Xl)


# ------------------------------------------------- factor kernel (bwb=1)
# Grid = one step per block row; scratch VMEM carries Dinv_{k-1}/d_{k-1}
# across grid steps (TPU grid programs run sequentially).  Row-blocked
# specs keep per-program VMEM ~1.5 MB, so hundreds of vmapped lanes fit
# the 16 MB scoped-vmem budget (a whole-lane variant measured the same
# speed but OOM'd VMEM at batch 128).

def _rd(ref):
    """Read a whole block ref, squeezing leading unit dims."""
    return ref[...].reshape(ref.shape[-2], ref.shape[-1])


def _wr(ref, val):
    ref[...] = val.reshape(ref.shape)


def _band_factor_kernel(kdh_ref, kdl_ref, ksh_ref, ksl_ref,
                        lbh_ref, lbl_ref, dih_ref, dil_ref,
                        dh_ref, dl_ref, c_dih, c_dil, c_dh, c_dl):
    k = pl.program_id(0)

    @pl.when(k == 0)
    def _init():
        c_dih[...] = jnp.zeros_like(c_dih)
        c_dil[...] = jnp.zeros_like(c_dil)
        c_dh[...] = jnp.ones_like(c_dh)
        c_dl[...] = jnp.zeros_like(c_dl)

    Kdh, Kdl = _rd(kdh_ref), _rd(kdl_ref)
    Ksh, Ksl = _rd(ksh_ref), _rd(ksl_ref)
    dph = c_dh[...][0:1]
    dpl = c_dl[...][0:1]
    # L[k, k-1] = Ksub_k Dinv_{k-1}^T / d_{k-1} (Dinv = 0 at k = 0)
    ph, plo = ds_matmul(Ksh, Ksl, c_dih[...], c_dil[...], transpose_b=True)
    Lh, Ll = ds_div(ph, plo, jnp.broadcast_to(dph, (B, B)),
                    jnp.broadcast_to(dpl, (B, B)))
    # Schur: Kkk -= (L * d) L^T, with the operands sqrt(|d|)-balanced by
    # an exact power of two (see _leaf_eliminate_blocked: keeps the
    # chunk scheme's scale-relative truncation near the true term size)
    e = _pow2_half(dph)
    einv = 1.0 / e
    m2h = dph * einv * einv
    m2l = dpl * einv * einv
    Leh = Lh * e
    Lel = Ll * e
    sh, sl = ds_mul(Leh, Lel, jnp.broadcast_to(m2h, (B, B)),
                    jnp.broadcast_to(m2l, (B, B)))
    uh, ul = ds_matmul(sh, sl, Leh, Lel, transpose_b=True)
    Mh, Ml = ds_add(Kdh, Kdl, -uh, -ul)
    (dh, dl), (Xh, Xl) = _leaf_eliminate_blocked(Mh, Ml)
    _wr(lbh_ref, Lh)
    _wr(lbl_ref, Ll)
    _wr(dih_ref, Xh)
    _wr(dil_ref, Xl)
    _wr(dh_ref, jnp.broadcast_to(dh, (8, B)))
    _wr(dl_ref, jnp.broadcast_to(dl, (8, B)))
    c_dih[...] = Xh
    c_dil[...] = Xl
    c_dh[...] = jnp.broadcast_to(dh, c_dh.shape)
    c_dl[...] = jnp.broadcast_to(dl, c_dl.shape)



@functools.partial(jax.jit, static_argnames=("interpret",))
def _band_factor_ds_impl(Kdiag, Ksub, interpret: bool = False):
    """Double-single banded factor, bwb = 1 (single lane).

    ``Kdiag``: (nb, B, B) float64 diagonal blocks; ``Ksub``: (nb, B, B)
    float64 subdiagonal blocks (row k holds K[k, k-1]; row 0 ignored,
    pass zeros).  Returns float32 pairs
    ``(Lh, Ll, Dinvh, Dinvl, dh, dl)`` with shapes (nb, B, B) x4 and
    (nb, 8, B) x2 (d's row 0 is live).
    """
    nb = Kdiag.shape[0]
    assert Kdiag.shape == (nb, B, B) and Ksub.shape == (nb, B, B)
    assert Kdiag.dtype == jnp.float64

    def split(x):
        hi = x.astype(jnp.float32)
        return hi, (x - hi.astype(jnp.float64)).astype(jnp.float32)

    kdh, kdl = split(Kdiag)
    ksh, ksl = split(Ksub)
    spec_bb = pl.BlockSpec((1, B, B), lambda i: (i, 0, 0),
                           memory_space=pltpu.VMEM)
    spec_d = pl.BlockSpec((1, 8, B), lambda i: (i, 0, 0),
                          memory_space=pltpu.VMEM)
    with jax.enable_x64(False):
        return pl.pallas_call(
            _band_factor_kernel,
            grid=(nb,),
            in_specs=[spec_bb] * 4,
            out_specs=(spec_bb, spec_bb, spec_bb, spec_bb, spec_d, spec_d),
            out_shape=(
                jax.ShapeDtypeStruct((nb, B, B), jnp.float32),
                jax.ShapeDtypeStruct((nb, B, B), jnp.float32),
                jax.ShapeDtypeStruct((nb, B, B), jnp.float32),
                jax.ShapeDtypeStruct((nb, B, B), jnp.float32),
                jax.ShapeDtypeStruct((nb, 8, B), jnp.float32),
                jax.ShapeDtypeStruct((nb, 8, B), jnp.float32),
            ),
            scratch_shapes=[
                pltpu.VMEM((B, B), jnp.float32),
                pltpu.VMEM((B, B), jnp.float32),
                pltpu.VMEM((8, B), jnp.float32),
                pltpu.VMEM((8, B), jnp.float32),
            ],
            compiler_params=pltpu.CompilerParams(
                dimension_semantics=("arbitrary",)),
            interpret=interpret,
        )(kdh, kdl, ksh, ksl)


# --------------------------------------- lane-tiled factor kernel (bwb=1)
def _make_band_factor_tiled(T: int):
    def kern(kdh_ref, kdl_ref, ksh_ref, ksl_ref,
             lbh_ref, lbl_ref, dih_ref, dil_ref, dh_ref, dl_ref,
             c_dih, c_dil, c_dh, c_dl):
        k = pl.program_id(1)

        @pl.when(k == 0)
        def _init():
            c_dih[...] = jnp.zeros_like(c_dih)
            c_dil[...] = jnp.zeros_like(c_dil)
            c_dh[...] = jnp.ones_like(c_dh)
            c_dl[...] = jnp.zeros_like(c_dl)

        Kdh = kdh_ref[...].reshape(T, B, B)
        Kdl = kdl_ref[...].reshape(T, B, B)
        Ksh = ksh_ref[...].reshape(T, B, B)
        Ksl = ksl_ref[...].reshape(T, B, B)
        Dpih = _bT(c_dih[...], T)
        Dpil = _bT(c_dil[...], T)
        dph = _bT(c_dh[...], T)[:, 0:1, :]               # (T, 1, B)
        dpl = _bT(c_dl[...], T)[:, 0:1, :]
        # L[k, k-1] = Ksub_k Dinv_{k-1}^T / d_{k-1}
        ph, plo = _ds_matmul_b(Ksh, Ksl, Dpih, Dpil, T)
        Lh, Ll = ds_div(ph, plo, jnp.broadcast_to(dph, (T, B, B)),
                        jnp.broadcast_to(dpl, (T, B, B)))
        # Schur: Kkk -= (L * d) L^T, sqrt|d|-balanced (see bwb=1 kernel)
        e = _pow2_half(dph)
        einv = 1.0 / e
        m2h = dph * einv * einv
        m2l = dpl * einv * einv
        Leh = Lh * e
        Lel = Ll * e
        sh, sl = ds_mul(Leh, Lel, jnp.broadcast_to(m2h, (T, B, B)),
                        jnp.broadcast_to(m2l, (T, B, B)))
        uh, ul = _ds_matmul_b(sh, sl, Leh, Lel, T)
        Mh, Ml = ds_add(Kdh, Kdl, -uh, -ul)
        (dh, dl), (Xh, Xl) = _leaf_eliminate_blocked_b(Mh, Ml)
        _wr(lbh_ref, Lh)
        _wr(lbl_ref, Ll)
        _wr(dih_ref, Xh)
        _wr(dil_ref, Xl)
        dbb = jnp.broadcast_to(dh, (T, 8, B))
        dbl = jnp.broadcast_to(dl, (T, 8, B))
        _wr(dh_ref, dbb)
        _wr(dl_ref, dbl)
        c_dih[...] = Xh.reshape(T * B, B)
        c_dil[...] = Xl.reshape(T * B, B)
        c_dh[...] = dbb.reshape(T * 8, B)
        c_dl[...] = dbl.reshape(T * 8, B)

    return kern


@functools.partial(jax.jit, static_argnames=("T", "interpret"))
def _band_factor_ds_batch(Kdiag, Ksub, T: int = T_LANES,
                          interpret: bool = False):
    """Lane-tiled batched bwb=1 factor: (L, nb, B, B) inputs, grid
    (L/T, nb) with T lanes per program (see the lane-tiled note above).
    Lanes are padded to a multiple of T with identity diagonals."""
    L, nb = Kdiag.shape[0], Kdiag.shape[1]
    assert Kdiag.shape == (L, nb, B, B) and Ksub.shape == (L, nb, B, B)
    assert Kdiag.dtype == jnp.float64
    Lp = -(-L // T) * T
    if Lp != L:
        eye = jnp.broadcast_to(jnp.eye(B, dtype=Kdiag.dtype),
                               (Lp - L, nb, B, B))
        Kdiag = jnp.concatenate([Kdiag, eye], axis=0)
        Ksub = jnp.concatenate(
            [Ksub, jnp.zeros((Lp - L, nb, B, B), Ksub.dtype)], axis=0)

    def split(x):
        hi = x.astype(jnp.float32)
        return hi, (x - hi.astype(jnp.float64)).astype(jnp.float32)

    kdh, kdl = split(Kdiag)
    ksh, ksl = split(Ksub)
    spec_bb = pl.BlockSpec((T, 1, B, B), lambda t, k: (t, k, 0, 0),
                           memory_space=pltpu.VMEM)
    spec_d = pl.BlockSpec((T, 1, 8, B), lambda t, k: (t, k, 0, 0),
                          memory_space=pltpu.VMEM)
    with jax.enable_x64(False):
        out = pl.pallas_call(
            _make_band_factor_tiled(T),
            grid=(Lp // T, nb),
            in_specs=[spec_bb] * 4,
            out_specs=(spec_bb, spec_bb, spec_bb, spec_bb, spec_d, spec_d),
            out_shape=(
                jax.ShapeDtypeStruct((Lp, nb, B, B), jnp.float32),
                jax.ShapeDtypeStruct((Lp, nb, B, B), jnp.float32),
                jax.ShapeDtypeStruct((Lp, nb, B, B), jnp.float32),
                jax.ShapeDtypeStruct((Lp, nb, B, B), jnp.float32),
                jax.ShapeDtypeStruct((Lp, nb, 8, B), jnp.float32),
                jax.ShapeDtypeStruct((Lp, nb, 8, B), jnp.float32),
            ),
            scratch_shapes=[
                pltpu.VMEM((T * B, B), jnp.float32),
                pltpu.VMEM((T * B, B), jnp.float32),
                pltpu.VMEM((T * 8, B), jnp.float32),
                pltpu.VMEM((T * 8, B), jnp.float32),
            ],
            compiler_params=pltpu.CompilerParams(
                dimension_semantics=("arbitrary", "arbitrary"),
                # the leaf's temporaries exceed Mosaic's default 16 MB
                # scoped-vmem budget above T = 4; the chip has 128 MB
                vmem_limit_bytes=(None if T <= 4 else 100 * 2 ** 20)),
            interpret=interpret,
        )(kdh, kdl, ksh, ksl)
    if Lp != L:
        out = tuple(o[:L] for o in out)
    return out


try:  # pragma: no cover - custom_batching present in all supported jax
    from jax import custom_batching as _cb

    @_cb.custom_vmap
    def band_factor_ds(Kdiag, Ksub):
        """Double-single banded factor, bwb = 1 (see
        _band_factor_ds_impl).  Under vmap the batch collapses into the
        lane-tiled kernel (_band_factor_ds_batch): T lanes per grid
        program instead of a replayed per-lane grid axis."""
        return _band_factor_ds_impl(Kdiag, Ksub)

    @band_factor_ds.def_vmap
    def _band_factor_ds_vmap(axis_size, in_batched, Kd, Ks):
        kd_b, ks_b = in_batched
        if kd_b and ks_b and Kd.ndim == 4:
            out = _band_factor_ds_batch(Kd, Ks)
        else:
            out = jax.vmap(
                _band_factor_ds_impl,
                in_axes=(0 if kd_b else None, 0 if ks_b else None))(Kd, Ks)
        return out, (True,) * 6
except Exception:  # pragma: no cover
    band_factor_ds = _band_factor_ds_impl


# ------------------------------------------------- solve kernels (bwb=1)
# RHS layout: (nb, KP, B) — x^T in block-row-major, KP padded rhs rows.
# (KP = 8 was measured identical to 16 on hardware — the bf16 chunk ops
# pad to 16 sublanes either way and the solve kernels are dominated by
# chunking the (B, B) factor operands, so KP stays at the bf16 tile.)
KP = 16


def _fwd_kernel(lbh_ref, lbl_ref, dih_ref, dil_ref, dh_ref, dl_ref,
                xh_ref, xl_ref, wh_ref, wl_ref, c_yh, c_yl):
    """Forward substitution + pivot scaling: one block row per step.
    w_k = (Dinv_k (x_k - L_k y_{k-1})) / d_k ; carry y_k unscaled."""
    k = pl.program_id(0)

    @pl.when(k == 0)
    def _init():
        c_yh[...] = jnp.zeros_like(c_yh)
        c_yl[...] = jnp.zeros_like(c_yl)

    Lh, Ll = _rd(lbh_ref), _rd(lbl_ref)
    Dih, Dil = _rd(dih_ref), _rd(dil_ref)
    th, tl = ds_matmul(c_yh[...], c_yl[...], Lh, Ll, transpose_b=True)
    ah, al = ds_add(_rd(xh_ref), _rd(xl_ref), -th, -tl)
    yh, yl = ds_matmul(ah, al, Dih, Dil, transpose_b=True)
    dh = _rd(dh_ref)[0:1]
    dl = _rd(dl_ref)[0:1]
    wh, wl = ds_div(yh, yl, jnp.broadcast_to(dh, (KP, B)),
                    jnp.broadcast_to(dl, (KP, B)))
    _wr(wh_ref, wh)
    _wr(wl_ref, wl)
    c_yh[...] = yh
    c_yl[...] = yl


def _bwd_kernel(lbh_ref, lbl_ref, dih_ref, dil_ref, wh_ref, wl_ref,
                zh_ref, zl_ref, c_zh, c_zl, c_lh, c_ll):
    """Backward: z_k = Dinv_k^T (w_k - L_{k+1}^T z_{k+1}); grid reversed.
    Scratch carries z_{k+1} AND L_{k+1}."""
    i = pl.program_id(0)

    @pl.when(i == 0)
    def _init():
        c_zh[...] = jnp.zeros_like(c_zh)
        c_zl[...] = jnp.zeros_like(c_zl)
        c_lh[...] = jnp.zeros_like(c_lh)
        c_ll[...] = jnp.zeros_like(c_ll)

    Dih, Dil = _rd(dih_ref), _rd(dil_ref)
    th, tl = ds_matmul(c_zh[...], c_zl[...], c_lh[...], c_ll[...])
    ah, al = ds_add(_rd(wh_ref), _rd(wl_ref), -th, -tl)
    zh, zl = ds_matmul(ah, al, Dih, Dil)
    _wr(zh_ref, zh)
    _wr(zl_ref, zl)
    c_zh[...] = zh
    c_zl[...] = zl
    c_lh[...] = _rd(lbh_ref)
    c_ll[...] = _rd(lbl_ref)


@functools.partial(jax.jit, static_argnames=("interpret",))
def band_solve_ds(fac, rhs_t, interpret: bool = False):
    """Solve K x = rhs with the double-single banded factor (bwb = 1).

    ``fac``: output tuple of band_factor_ds.  ``rhs_t``: (KP, D) float64
    (transposed right-hand sides, unused rows zero).  Returns (KP, D)
    float64.
    """
    Lh, Ll, Dih, Dil, dh, dl = fac
    nb = Lh.shape[0]
    D = nb * B
    assert rhs_t.shape == (KP, D), rhs_t.shape

    xh = rhs_t.astype(jnp.float32)
    xl = (rhs_t - xh.astype(jnp.float64)).astype(jnp.float32)

    def tob(v):
        return v.reshape(KP, nb, B).transpose(1, 0, 2)

    xh, xl = tob(xh), tob(xl)
    spec_bb = pl.BlockSpec((1, B, B), lambda i: (i, 0, 0),
                           memory_space=pltpu.VMEM)
    spec_d = pl.BlockSpec((1, 8, B), lambda i: (i, 0, 0),
                          memory_space=pltpu.VMEM)
    spec_x = pl.BlockSpec((1, KP, B), lambda i: (i, 0, 0),
                          memory_space=pltpu.VMEM)
    rspec_bb = pl.BlockSpec((1, B, B), lambda i: (nb - 1 - i, 0, 0),
                            memory_space=pltpu.VMEM)
    rspec_x = pl.BlockSpec((1, KP, B), lambda i: (nb - 1 - i, 0, 0),
                           memory_space=pltpu.VMEM)
    out_sh = (jax.ShapeDtypeStruct((nb, KP, B), jnp.float32),) * 2
    arb = pltpu.CompilerParams(dimension_semantics=("arbitrary",))
    with jax.enable_x64(False):
        wh, wl = pl.pallas_call(
            _fwd_kernel, grid=(nb,),
            in_specs=[spec_bb] * 4 + [spec_d] * 2 + [spec_x] * 2,
            out_specs=(spec_x, spec_x), out_shape=out_sh,
            scratch_shapes=[pltpu.VMEM((KP, B), jnp.float32)] * 2,
            compiler_params=arb,
            interpret=interpret,
        )(Lh, Ll, Dih, Dil, dh, dl, xh, xl)
        zh, zl = pl.pallas_call(
            _bwd_kernel, grid=(nb,),
            in_specs=[rspec_bb] * 4 + [rspec_x] * 2,
            out_specs=(rspec_x, rspec_x), out_shape=out_sh,
            scratch_shapes=[pltpu.VMEM((KP, B), jnp.float32)] * 2
            + [pltpu.VMEM((B, B), jnp.float32)] * 2,
            compiler_params=arb,
            interpret=interpret,
        )(Lh, Ll, Dih, Dil, wh, wl)
    z = zh.astype(jnp.float64) + zl.astype(jnp.float64)
    return z.transpose(1, 0, 2).reshape(KP, D)


# ----------------------------------- prechunked solve kernels (bwb=1)
# The fwd/bwd solve kernels above re-run the bf16 chunk decomposition of
# the SAME (B, B) factor blocks on every call — and solveKKT-style
# iterative refinement calls the solve ~8x per IPM iteration (initial
# backsolve + per-trip corrections for 2-3 stacked-RHS phases).  The
# chunk values are a deterministic function of the (hi, lo) factor, so
# they can be computed ONCE per factorization at the XLA level
# (prechunk_band_fac: bulk elementwise f32, full VPU rate) and stored as
# bf16 chunk stacks; the prechunked kernels then run ONLY the MXU dots
# and TwoSum folds.  Output is BIT-IDENTICAL to band_solve_ds: the dots
# consume the same chunk values in the same exact-pair grouping (two
# 128-term partials on a shared grid sum exactly in f32, equal to the
# concatenated 256-term dot).  Trade-off: the stored chunks are 14
# bytes/element against the pair's 8, so HBM reads per solve grow 1.75x
# — measured far below the issue-slot savings at bench shapes.


class BandFacPre(NamedTuple):
    """Prechunked bwb=1 banded factor (see prechunk_band_fac).

    Each chunk field is ONE array with the nch chunks stacked along the
    sublane axis: chunk t occupies rows [t*B, (t+1)*B).  Round 4: the
    chunks used to be tuples of nch separate (nb, B, B) arrays (2*nch*T
    separate 32 KB block DMAs per solve grid step); stacking was tried
    as a DMA-coalescing win and measured NEUTRAL on hardware (1693.8 vs
    1684.6 ms bench wall — within tunnel noise), which pins the solve
    kernels as in-kernel VPU-issue-bound (rhs-side chunking + TwoSum
    folds), not DMA-count-bound.  The stacked layout is kept for the
    operand-count simplification (4 chunk operands instead of 28).  The
    factor kernel writes the stacked rows directly (no XLA-level
    stack/copy — that copy is why tuples were chosen originally; only
    the single-lane prechunk_band_fac fallback pays a concatenate)."""
    lc1: jax.Array   # L chunks along axis -1: (nb, nch*B, B) bf16/int8
    ls1: jax.Array   # matching scale rows      (nb, 8, B) f32 (row 0)
    dc1: jax.Array   # Dinv chunks along axis -1
    ds1: jax.Array
    lc0: jax.Array   # L chunks along axis -2 (the bwd orientation)
    ls0: jax.Array
    dc0: jax.Array   # Dinv chunks along axis -2
    ds0: jax.Array
    dh: jax.Array    # pivot rows, as in band_factor_ds
    dl: jax.Array


def prechunk_band_fac(fac, i8: bool = False) -> BandFacPre:
    """XLA-level chunk decomposition of a band_factor_ds factor.

    Runs the exact _chunks_scaled (or, with ``i8``, the int8-storage
    _chunks7) arithmetic (same float ops, so the stored chunks equal
    what the solve kernels would have computed in-VMEM) along both
    contraction orientations of L and Dinv.  Chunks are stacked along
    the sublane axis per orientation (BandFacPre docstring) — the
    concatenate below costs one layout copy on THIS (single-lane /
    fallback) path; the lane-tiled batched factor writes the stacked
    layout directly in-kernel and pays nothing."""
    Lh, Ll, Dih, Dil, dh, dl = fac
    chunker = (lambda xh, xl, axis: _chunks7(xh, xl, axis)) if i8 \
        else _chunks_scaled

    def mk(xh, xl, axis):
        chunks, s = chunker(xh, xl, axis=axis)
        row = jnp.squeeze(s, axis=axis)
        srow = jnp.zeros(xh.shape[:-2] + (8, xh.shape[-1]), jnp.float32)
        srow = srow.at[..., 0, :].set(row)
        return jnp.concatenate(chunks, axis=-2), srow

    lc1, ls1 = mk(Lh, Ll, -1)
    dc1, ds1 = mk(Dih, Dil, -1)
    lc0, ls0 = mk(Lh, Ll, -2)
    dc0, ds0 = mk(Dih, Dil, -2)
    return BandFacPre(lc1, ls1, dc1, ds1, lc0, ls0, dc0, ds0, dh, dl)


# rows-of-s used against operand chunk t (pairs with s + t <= max
# level): the row-stacked product trims the lhs stack to just the live
# rows per dot
_PRE_NS = tuple(
    max(s for pairs in _LEVEL_PAIRS for (s, tt) in pairs if tt == t) + 1
    for t in range(_NCHUNK))


def _ds_matmul_pre(ah, al, get_chunk, sb_row, transpose_b: bool = False):
    """ds_matmul against a prechunked big operand.

    ``get_chunk(t)`` returns the (B, B) bf16 chunk t of the operand
    (chunked along its contraction axis); ``sb_row`` is the (1, N) f32
    scale row.  Bit-identical to ds_matmul on the (hi, lo) operand:
    same chunk values, and the per-group f32 pair-sum of two 128-term
    grid-aligned partials equals the concatenated 256-term dot exactly
    (both are integers <= 2^24 on the level's grid).

    ROW-STACKED DOTS (round 4): the rhs chunk stack concatenates along
    the ROW axis, so all live (s, t) products against operand chunk t
    come out of ONE MXU dot of _PRE_NS[t]*R rows — 7 passes instead of
    34 per product (an MXU pass costs ~fill + rows cycles, so 16-row
    dots were ~90% fill; this is where negative-result 8b's pair-span
    failed: K = 256 spans cost two passes, row stacking costs one).
    Each output row of a dot is an independent K-deep f32 accumulation,
    so the sliced products are bit-identical to the per-pair dots and
    the fold order below is unchanged."""
    a, sa = _chunks_scaled(ah, al, axis=1)
    R = ah.shape[0]
    A = jnp.concatenate(a, axis=0)                    # (nch*R, B)
    if transpose_b:
        dn = (((1,), (1,)), ((), ()))
    else:
        dn = (((1,), (0,)), ((), ()))
    prods = [jax.lax.dot_general(
        A[:_PRE_NS[t] * R], get_chunk(t), dn,
        precision=jax.lax.Precision.DEFAULT,
        preferred_element_type=jnp.float32) for t in range(_NCHUNK)]
    gsz = 2 if ah.shape[1] <= 128 else 1
    sh = sl = None
    for pairs in _LEVEL_PAIRS:
        for g in range(0, len(pairs), gsz):
            grp = pairs[g:g + gsz]
            p = None
            for s, t in grp:
                q = prods[t][s * R:(s + 1) * R]
                p = q if p is None else p + q
            if sh is None:
                sh, sl = p, jnp.zeros_like(p)
            else:
                sh, e = _two_sum(sh, p)
                sl = sl + e
    sh, sl = _quick_renorm(sh, sl)
    scale = sa * sb_row
    return sh * scale, sl * scale


def _fwd_kernel_pre(nch, *a):
    """Prechunked forward substitution (see _fwd_kernel).  The factor
    chunks arrive STACKED along the sublane axis, one (1, nch*B, B) ref
    per operand (one large DMA per grid step — see BandFacPre); int8
    chunks route through the 7-bit-grid product."""
    (lc_ref, ls_ref, dc_ref, dsc_ref,
     dh_ref, dl_ref, xh_ref, xl_ref, wh_ref, wl_ref,
     c_yh, c_yl) = a
    mm = (_ds_matmul_pre_i8 if lc_ref.dtype == jnp.int8
          else _ds_matmul_pre)
    k = pl.program_id(0)

    @pl.when(k == 0)
    def _init():
        c_yh[...] = jnp.zeros_like(c_yh)
        c_yl[...] = jnp.zeros_like(c_yl)

    lc = lc_ref[...].reshape(nch * B, B)
    dc = dc_ref[...].reshape(nch * B, B)
    th, tl = mm(c_yh[...], c_yl[...],
                lambda t: lc[t * B:(t + 1) * B], ls_ref[0, 0:1, :],
                transpose_b=True)
    ah, al = ds_add(_rd(xh_ref), _rd(xl_ref), -th, -tl)
    yh, yl = mm(ah, al, lambda t: dc[t * B:(t + 1) * B],
                dsc_ref[0, 0:1, :], transpose_b=True)
    dh = _rd(dh_ref)[0:1]
    dl = _rd(dl_ref)[0:1]
    wh, wl = ds_div(yh, yl, jnp.broadcast_to(dh, (KP, B)),
                    jnp.broadcast_to(dl, (KP, B)))
    _wr(wh_ref, wh)
    _wr(wl_ref, wl)
    c_yh[...] = yh
    c_yl[...] = yl


def _bwd_kernel_pre(nch, *a):
    """Prechunked backward substitution (see _bwd_kernel); the scratch
    carries z_{k+1} and the stacked CHUNKS of L_{k+1}."""
    (lc_ref, ls_ref, dc_ref, dsc_ref,
     wh_ref, wl_ref, zh_ref, zl_ref,
     c_zh, c_zl, c_lc, c_ls) = a
    mm = (_ds_matmul_pre_i8 if lc_ref.dtype == jnp.int8
          else _ds_matmul_pre)
    i = pl.program_id(0)

    @pl.when(i == 0)
    def _init():
        c_zh[...] = jnp.zeros_like(c_zh)
        c_zl[...] = jnp.zeros_like(c_zl)
        c_lc[...] = jnp.zeros_like(c_lc)
        c_ls[...] = jnp.zeros_like(c_ls)

    clc = c_lc[...]
    dc = dc_ref[...].reshape(nch * B, B)
    th, tl = mm(c_zh[...], c_zl[...],
                lambda t: clc[t * B:(t + 1) * B],
                c_ls[0:1, :], transpose_b=False)
    ah, al = ds_add(_rd(wh_ref), _rd(wl_ref), -th, -tl)
    zh, zl = mm(ah, al, lambda t: dc[t * B:(t + 1) * B],
                dsc_ref[0, 0:1, :], transpose_b=False)
    _wr(zh_ref, zh)
    _wr(zl_ref, zl)
    c_zh[...] = zh
    c_zl[...] = zl
    c_lc[...] = lc_ref[...].reshape(nch * B, B)
    c_ls[...] = ls_ref[0]


@functools.partial(jax.jit, static_argnames=("interpret",))
def _band_solve_ds_pre_impl(pre: BandFacPre, rhs_t,
                            interpret: bool = False):
    """band_solve_ds against a prechunked factor — bit-identical output,
    no per-call chunk decomposition of the factor blocks."""
    nb = pre.lc1.shape[0]
    nch = pre.lc1.shape[-2] // B
    cdt = pre.lc1.dtype
    D = nb * B
    assert rhs_t.shape == (KP, D), rhs_t.shape

    xh = rhs_t.astype(jnp.float32)
    xl = (rhs_t - xh.astype(jnp.float64)).astype(jnp.float32)

    def tob(v):
        return v.reshape(KP, nb, B).transpose(1, 0, 2)

    xh, xl = tob(xh), tob(xl)
    spec_cb = pl.BlockSpec((1, nch * B, B), lambda i: (i, 0, 0),
                           memory_space=pltpu.VMEM)
    spec_d = pl.BlockSpec((1, 8, B), lambda i: (i, 0, 0),
                          memory_space=pltpu.VMEM)
    spec_x = pl.BlockSpec((1, KP, B), lambda i: (i, 0, 0),
                          memory_space=pltpu.VMEM)
    rspec_cb = pl.BlockSpec((1, nch * B, B), lambda i: (nb - 1 - i, 0, 0),
                            memory_space=pltpu.VMEM)
    rspec_d = pl.BlockSpec((1, 8, B), lambda i: (nb - 1 - i, 0, 0),
                           memory_space=pltpu.VMEM)
    rspec_x = pl.BlockSpec((1, KP, B), lambda i: (nb - 1 - i, 0, 0),
                           memory_space=pltpu.VMEM)
    out_sh = (jax.ShapeDtypeStruct((nb, KP, B), jnp.float32),) * 2
    arb = pltpu.CompilerParams(dimension_semantics=("arbitrary",))
    with jax.enable_x64(False):
        wh, wl = pl.pallas_call(
            functools.partial(_fwd_kernel_pre, nch), grid=(nb,),
            in_specs=[spec_cb, spec_d, spec_cb, spec_d]
            + [spec_d] * 2 + [spec_x] * 2,
            out_specs=(spec_x, spec_x), out_shape=out_sh,
            scratch_shapes=[pltpu.VMEM((KP, B), jnp.float32)] * 2,
            compiler_params=arb,
            interpret=interpret,
        )(pre.lc1, pre.ls1, pre.dc1, pre.ds1, pre.dh, pre.dl, xh, xl)
        zh, zl = pl.pallas_call(
            functools.partial(_bwd_kernel_pre, nch), grid=(nb,),
            in_specs=[rspec_cb, rspec_d, rspec_cb, rspec_d]
            + [rspec_x] * 2,
            out_specs=(rspec_x, rspec_x), out_shape=out_sh,
            scratch_shapes=[pltpu.VMEM((KP, B), jnp.float32)] * 2
            + [pltpu.VMEM((nch * B, B), cdt),
               pltpu.VMEM((8, B), jnp.float32)],
            compiler_params=arb,
            interpret=interpret,
        )(pre.lc0, pre.ls0, pre.dc0, pre.ds0, wh, wl)
    z = zh.astype(jnp.float64) + zl.astype(jnp.float64)
    return z.transpose(1, 0, 2).reshape(KP, D)


# ------------------------------- lane-tiled prechunked solves (bwb=1)
# With the factor chunking hoisted out (prechunk_band_fac), each solve
# grid step is a handful of small MXU dots + TwoSum folds on (KP, B)
# slabs — measured dominated by per-grid-step overhead, not math, at
# 128 vmapped lanes (~4-5 ms/call where the HBM-stream bound is ~1.5).
# Processing T_SOLVE lanes per grid program amortizes that overhead the
# same way the lane-tiled factor does: the vector ops widen to
# (T, KP, B) slabs and the dots batch over the lane axis (Mosaic
# supports dot_general batch dims in-kernel).  Per-lane arithmetic is
# IDENTICAL: batched dots compute the same per-lane products, and all
# elementwise ds ops are lane-independent — outputs are bit-identical
# to the per-lane kernels (pinned by test).

T_SOLVE = 8


def _ds_matmul_pre_b(ah, al, get_chunk, sb_row, T: int,
                     transpose_b: bool = False):
    """Lane-batched _ds_matmul_pre: ``ah, al`` (T, R, K) f32 rows,
    ``get_chunk(t)`` -> (T, B, B) bf16 chunk t of the per-lane operand,
    ``sb_row`` (T, 1, N) f32 scale rows.  Same per-lane arithmetic as
    _ds_matmul_pre (the batched dot computes the per-lane dots; the
    group pair-sums and TwoSum folds are elementwise), including its
    row-stacked dot scheme (7 lane-batched MXU dots per product
    instead of 34 — see the _ds_matmul_pre docstring)."""
    a, sa = _chunks_scaled(ah, al, axis=2)            # sa: (T, R, 1)
    R = ah.shape[1]
    A = jnp.concatenate(a, axis=1)                    # (T, nch*R, B)
    if transpose_b:
        dn = (((2,), (2,)), ((0,), (0,)))
    else:
        dn = (((2,), (1,)), ((0,), (0,)))
    prods = [jax.lax.dot_general(
        A[:, :_PRE_NS[t] * R], get_chunk(t), dn,
        precision=jax.lax.Precision.DEFAULT,
        preferred_element_type=jnp.float32) for t in range(_NCHUNK)]
    gsz = 2 if ah.shape[2] <= 128 else 1
    sh = sl = None
    for pairs in _LEVEL_PAIRS:
        for g in range(0, len(pairs), gsz):
            grp = pairs[g:g + gsz]
            p = None
            for s, t in grp:
                q = prods[t][:, s * R:(s + 1) * R]
                p = q if p is None else p + q
            if sh is None:
                sh, sl = p, jnp.zeros_like(p)
            else:
                sh, e = _two_sum(sh, p)
                sl = sl + e
    sh, sl = _quick_renorm(sh, sl)
    scale = sa * sb_row
    return sh * scale, sl * scale


def _make_fwd_kernel_pre_b(T: int, nch: int = _NCHUNK):
    def kern(*a):
        (lc_ref, ls_ref, dc_ref, dsc_ref,     # (T, 1, nch*B, B) chunks
         dh_ref, dl_ref, xh_ref, xl_ref, wh_ref, wl_ref,
         c_yh, c_yl) = a
        mm = (_ds_matmul_pre_i8_b if lc_ref.dtype == jnp.int8
              else _ds_matmul_pre_b)
        k = pl.program_id(1)

        @pl.when(k == 0)
        def _init():
            c_yh[...] = jnp.zeros_like(c_yh)
            c_yl[...] = jnp.zeros_like(c_yl)

        lc = lc_ref[...].reshape(T, nch * B, B)
        dc = dc_ref[...].reshape(T, nch * B, B)
        th, tl = mm(
            _bT(c_yh[...], T), _bT(c_yl[...], T),
            lambda t: lc[:, t * B:(t + 1) * B],
            ls_ref[...].reshape(T, 8, B)[:, 0:1, :], T,
            transpose_b=True)
        xh = xh_ref[...].reshape(T, KP, B)
        xl = xl_ref[...].reshape(T, KP, B)
        ah2, al2 = ds_add(xh, xl, -th, -tl)
        yh, yl = mm(
            ah2, al2, lambda t: dc[:, t * B:(t + 1) * B],
            dsc_ref[...].reshape(T, 8, B)[:, 0:1, :], T,
            transpose_b=True)
        dh = dh_ref[...].reshape(T, 8, B)[:, 0:1, :]     # (T, 1, B)
        dl = dl_ref[...].reshape(T, 8, B)[:, 0:1, :]
        wh, wl = ds_div(yh, yl, jnp.broadcast_to(dh, (T, KP, B)),
                        jnp.broadcast_to(dl, (T, KP, B)))
        _wr(wh_ref, wh)
        _wr(wl_ref, wl)
        c_yh[...] = yh.reshape(T * KP, B)
        c_yl[...] = yl.reshape(T * KP, B)

    return kern


def _make_bwd_kernel_pre_b(T: int, nch: int = _NCHUNK):
    def kern(*a):
        (lc_ref, ls_ref, dc_ref, dsc_ref,
         wh_ref, wl_ref, zh_ref, zl_ref,
         c_zh, c_zl, c_lc, c_ls) = a
        mm = (_ds_matmul_pre_i8_b if lc_ref.dtype == jnp.int8
              else _ds_matmul_pre_b)
        i = pl.program_id(1)

        @pl.when(i == 0)
        def _init():
            c_zh[...] = jnp.zeros_like(c_zh)
            c_zl[...] = jnp.zeros_like(c_zl)
            c_lc[...] = jnp.zeros_like(c_lc)
            c_ls[...] = jnp.zeros_like(c_ls)

        # lane-major scratch layout mirrors the stacked input: lane u's
        # carried L_{k+1} chunks occupy rows [u*nch*B, (u+1)*nch*B)
        clc = _bT(c_lc[...], T)                 # (T, nch*B, B)
        dc = dc_ref[...].reshape(T, nch * B, B)
        th, tl = mm(
            _bT(c_zh[...], T), _bT(c_zl[...], T),
            lambda t: clc[:, t * B:(t + 1) * B],
            _bT(c_ls[...], T)[:, 0:1, :], T, transpose_b=False)
        wh = wh_ref[...].reshape(T, KP, B)
        wl = wl_ref[...].reshape(T, KP, B)
        ah2, al2 = ds_add(wh, wl, -th, -tl)
        zh, zl = mm(
            ah2, al2, lambda t: dc[:, t * B:(t + 1) * B],
            dsc_ref[...].reshape(T, 8, B)[:, 0:1, :], T,
            transpose_b=False)
        _wr(zh_ref, zh)
        _wr(zl_ref, zl)
        c_zh[...] = zh.reshape(T * KP, B)
        c_zl[...] = zl.reshape(T * KP, B)
        c_lc[...] = lc_ref[...].reshape(T * nch * B, B)
        c_ls[...] = ls_ref[...].reshape(T * 8, B)

    return kern


@functools.partial(jax.jit, static_argnames=("T", "interpret"))
def _band_solve_pre_batch(pre: BandFacPre, rhs_t, T: int = T_SOLVE,
                          interpret: bool = False):
    """Lane-tiled band_solve_ds_pre: every ``pre`` leaf carries a
    leading lane axis L, ``rhs_t`` is (L, KP, D).  Grid (L/T, nb) with
    T lanes per program; bit-identical per-lane output.  Lanes pad to
    a multiple of T (pivots pad to 1 so the padded lanes stay finite).

    T is pinned to T_SOLVE = 8: on v5e hardware T = 8 was verified
    bit-identical to the per-lane kernel AND deterministic run-to-run,
    but T = 4 MISCOMPILES (65% of outputs wrong, rel errors up to 11;
    interpret mode is exact at every T, so the code is right and the
    Mosaic lowering at T = 4 shapes is not) and T = 16 fails to compile
    (scoped-VMEM).  Timing: T = 4 and T = 8 measure within 2% — the
    kernels are grid/HBM-bound, wider tiles buy nothing.  Do not change
    T without re-running tools/tsolve_probe.py's hardware bit-identity
    check."""
    L = rhs_t.shape[0]
    nb = pre.lc1.shape[1]
    nch = pre.lc1.shape[-2] // B
    cdt = pre.lc1.dtype
    csz = jnp.dtype(cdt).itemsize
    D = nb * B
    assert rhs_t.shape == (L, KP, D), rhs_t.shape
    Lp = -(-L // T) * T
    if Lp != L:
        def pad(x, one=False):
            ext = (Lp - L,) + x.shape[1:]
            fill = jnp.ones(ext, x.dtype) if one else jnp.zeros(ext,
                                                                x.dtype)
            return jnp.concatenate([x, fill], axis=0)

        pre = BandFacPre(
            pad(pre.lc1), pad(pre.ls1, one=True),
            pad(pre.dc1), pad(pre.ds1, one=True),
            pad(pre.lc0), pad(pre.ls0, one=True),
            pad(pre.dc0), pad(pre.ds0, one=True),
            pad(pre.dh, one=True), pad(pre.dl))
        rhs_t = jnp.concatenate(
            [rhs_t, jnp.zeros((Lp - L, KP, D), rhs_t.dtype)], axis=0)

    xh = rhs_t.astype(jnp.float32)
    xl = (rhs_t - xh.astype(jnp.float64)).astype(jnp.float32)

    def tob(v):
        return v.reshape(Lp, KP, nb, B).transpose(0, 2, 1, 3)

    xh, xl = tob(xh), tob(xl)
    spec_cb = pl.BlockSpec((T, 1, nch * B, B), lambda t, k: (t, k, 0, 0),
                           memory_space=pltpu.VMEM)
    spec_d = pl.BlockSpec((T, 1, 8, B), lambda t, k: (t, k, 0, 0),
                          memory_space=pltpu.VMEM)
    spec_x = pl.BlockSpec((T, 1, KP, B), lambda t, k: (t, k, 0, 0),
                          memory_space=pltpu.VMEM)
    rspec_cb = pl.BlockSpec((T, 1, nch * B, B),
                            lambda t, k: (t, nb - 1 - k, 0, 0),
                            memory_space=pltpu.VMEM)
    rspec_d = pl.BlockSpec((T, 1, 8, B),
                           lambda t, k: (t, nb - 1 - k, 0, 0),
                           memory_space=pltpu.VMEM)
    rspec_x = pl.BlockSpec((T, 1, KP, B),
                           lambda t, k: (t, nb - 1 - k, 0, 0),
                           memory_space=pltpu.VMEM)
    out_sh = (jax.ShapeDtypeStruct((Lp, nb, KP, B), jnp.float32),) * 2
    # double-buffered in-blocks: 2 x 2*nch chunk blocks plus the f32
    # rhs/out slabs; past the 16 MB default scoped budget (bf16 T=16
    # lands at ~16.5 MB) raise the limit — the chip has 128 MB
    vmem = (2 * (2 * nch * T * B * B * csz + 4 * T * 8 * B * 4
                 + 4 * T * KP * B * 4)
            + (2 + nch) * T * max(KP, B) * B * 4)
    params = dict(dimension_semantics=("arbitrary", "arbitrary"))
    if vmem > 15 * 2 ** 20:
        params["vmem_limit_bytes"] = 100 * 2 ** 20
    arb = pltpu.CompilerParams(**params)
    with jax.enable_x64(False):
        wh, wl = pl.pallas_call(
            _make_fwd_kernel_pre_b(T, nch), grid=(Lp // T, nb),
            in_specs=[spec_cb, spec_d, spec_cb, spec_d]
            + [spec_d] * 2 + [spec_x] * 2,
            out_specs=(spec_x, spec_x), out_shape=out_sh,
            scratch_shapes=[pltpu.VMEM((T * KP, B), jnp.float32)] * 2,
            compiler_params=arb,
            interpret=interpret,
        )(pre.lc1, pre.ls1, pre.dc1, pre.ds1, pre.dh, pre.dl, xh, xl)
        zh, zl = pl.pallas_call(
            _make_bwd_kernel_pre_b(T, nch), grid=(Lp // T, nb),
            in_specs=[rspec_cb, rspec_d, rspec_cb, rspec_d]
            + [rspec_x] * 2,
            out_specs=(rspec_x, rspec_x), out_shape=out_sh,
            scratch_shapes=[pltpu.VMEM((T * KP, B), jnp.float32)] * 2
            + [pltpu.VMEM((T * nch * B, B), cdt),
               pltpu.VMEM((T * 8, B), jnp.float32)],
            compiler_params=arb,
            interpret=interpret,
        )(pre.lc0, pre.ls0, pre.dc0, pre.ds0, wh, wl)
    z = zh.astype(jnp.float64) + zl.astype(jnp.float64)
    z = z.transpose(0, 2, 1, 3).reshape(Lp, KP, D)
    return z[:L]


try:  # pragma: no cover - custom_batching present in all supported jax
    from jax import custom_batching as _cb2

    @_cb2.custom_vmap
    def _band_solve_ds_pre_cv(pre: BandFacPre, rhs_t):
        return _band_solve_ds_pre_impl(pre, rhs_t)

    @_band_solve_ds_pre_cv.def_vmap
    def _band_solve_pre_vmap(axis_size, in_batched, pre, rhs_t):
        leaves = jax.tree_util.tree_leaves(in_batched)
        if all(leaves) and rhs_t.ndim == 3:
            out = _band_solve_pre_batch(pre, rhs_t)
        else:
            axes = jax.tree_util.tree_map(lambda b: 0 if b else None,
                                          in_batched)
            out = jax.vmap(_band_solve_ds_pre_impl,
                           in_axes=tuple(axes))(pre, rhs_t)
        return out, True

    def band_solve_ds_pre(pre: BandFacPre, rhs_t,
                          interpret: bool = False):
        """Prechunked bwb=1 band solve.  Under the solver's lane vmap
        the batch collapses into the lane-tiled kernels
        (_band_solve_pre_batch, T_SOLVE lanes per grid program)."""
        if interpret:
            return _band_solve_ds_pre_impl(pre, rhs_t, interpret=True)
        return _band_solve_ds_pre_cv(pre, rhs_t)
except Exception:  # pragma: no cover
    band_solve_ds_pre = _band_solve_ds_pre_impl


# ------------- chunk-emitting lane-tiled factor (bwb=1, batched) -------
# prechunk_band_fac as an XLA pass re-reads the factor pair from HBM and
# writes the 28 chunk arrays back (~1.6 GB of traffic per iteration at
# 128 lanes, traced as multiply_convert/convert fusions).  The
# lane-tiled factor kernel already holds L and Dinv in VMEM as it
# produces them: this variant runs the SAME _chunks_scaled arithmetic
# in-kernel and emits the BandFacPre chunk arrays directly — the f32
# factor pair never reaches HBM (the Dinv/d carry stays in scratch) and
# the XLA prechunk pass disappears.  Chunk values are bit-identical
# (same float ops on the same values; pinned by test).

def _scale_lane_row(s, T: int):
    """(T, B, 1) per-row scales -> (T, 1, B) lane-oriented: in-kernel
    transpose as a masked reduce over the identity."""
    eye_bb = (lax.broadcasted_iota(jnp.int32, (1, B, B), 1)
              == lax.broadcasted_iota(jnp.int32, (1, B, B), 2))
    return jnp.sum(jnp.where(eye_bb, jnp.broadcast_to(s, (T, B, B)), 0.0),
                   axis=1, keepdims=True)


def _make_band_factor_tiled_pre(T: int, i8: bool = False):
    nch = _NCHUNK8 if i8 else _NCHUNK
    chunker = (lambda xh, xl, axis: _chunks7(xh, xl, axis)) if i8 \
        else _chunks_scaled
    mm_pre = _ds_matmul_pre_i8_b if i8 else _ds_matmul_pre_b

    def srow(v):
        """(T, 1, B) -> (T, 8, B) with row 0 live (the stored format)."""
        row0 = lax.broadcasted_iota(jnp.int32, (1, 8, B), 1) == 0
        return jnp.where(row0, jnp.broadcast_to(v, (T, 8, B)), 0.0)

    def kern(kdh_ref, kdl_ref, ksh_ref, ksl_ref, *o):
        (lc1_ref, ls1_ref, dc1_ref, ds1_ref,
         lc0_ref, ls0_ref, dc0_ref, ds0_ref,
         dh_ref, dl_ref, c_dc, c_dsc, c_dh, c_dl) = o
        k = pl.program_id(1)

        @pl.when(k == 0)
        def _init():
            c_dc[...] = jnp.zeros_like(c_dc)
            c_dsc[...] = jnp.ones_like(c_dsc)
            c_dh[...] = jnp.ones_like(c_dh)
            c_dl[...] = jnp.zeros_like(c_dl)

        Kdh = kdh_ref[...].reshape(T, B, B)
        Kdl = kdl_ref[...].reshape(T, B, B)
        Ksh = ksh_ref[...].reshape(T, B, B)
        Ksl = ksl_ref[...].reshape(T, B, B)
        dph = _bT(c_dh[...], T)[:, 0:1, :]
        dpl = _bT(c_dl[...], T)[:, 0:1, :]
        # X_{k-1} arrives as the CHUNKS emitted for dc1 last step (carried
        # in scratch) — the axis-2 decomposition _ds_matmul_b would have
        # recomputed on the f32 pair, skipped here; _ds_matmul_pre_b's
        # per-pair dot-plus-f32-add form equals the concatenated pair
        # dots exactly (both are <= 2^24 integers on the level grid), so
        # the product is bit-identical to the pair-carry form (on the
        # i8 scheme the 7-bit grids round L differently — consistent
        # with the scheme's solve-side arithmetic)
        cdv = _bT(c_dc[...], T)                      # (T, nch*B, B)
        ph, plo = mm_pre(
            Ksh, Ksl,
            lambda t: cdv[:, t * B:(t + 1) * B],
            _bT(c_dsc[...], T)[:, 0:1, :], T, transpose_b=True)
        Lh, Ll = ds_div(ph, plo, jnp.broadcast_to(dph, (T, B, B)),
                        jnp.broadcast_to(dpl, (T, B, B)))
        e = _pow2_half(dph)
        einv = 1.0 / e
        m2h = dph * einv * einv
        m2l = dpl * einv * einv
        Leh = Lh * e
        Lel = Ll * e
        sh, sl = ds_mul(Leh, Lel, jnp.broadcast_to(m2h, (T, B, B)),
                        jnp.broadcast_to(m2l, (T, B, B)))
        uh, ul = _ds_matmul_b(sh, sl, Leh, Lel, T)
        Mh, Ml = ds_add(Kdh, Kdl, -uh, -ul)
        (dh, dl), (Xh, Xl) = _leaf_eliminate_blocked_b(Mh, Ml)
        # chunk decompositions of L and Dinv, both orientations — the
        # same arithmetic prechunk_band_fac ran at the XLA level; the
        # axis-2 X chunks double as the next step's GEMM operand (the
        # scratch carry above)
        for src_h, src_l, cref, sref, axis in (
                (Lh, Ll, lc1_ref, ls1_ref, 2), (Lh, Ll, lc0_ref,
                                                ls0_ref, 1),
                (Xh, Xl, dc0_ref, ds0_ref, 1)):
            ch, s = chunker(src_h, src_l, axis=axis)
            _wr(cref, jnp.concatenate(ch, axis=1))   # (T, nch*B, B)
            v = _scale_lane_row(s, T) if axis == 2 else s
            _wr(sref, srow(v))
        ch, s = chunker(Xh, Xl, axis=2)
        sx = srow(_scale_lane_row(s, T))
        stacked = jnp.concatenate(ch, axis=1)
        _wr(dc1_ref, stacked)
        c_dc[...] = stacked.reshape(T * nch * B, B)  # lane-major carry
        _wr(ds1_ref, sx)
        c_dsc[...] = sx.reshape(T * 8, B)
        dbb = jnp.broadcast_to(dh, (T, 8, B))
        dbl = jnp.broadcast_to(dl, (T, 8, B))
        _wr(dh_ref, dbb)
        _wr(dl_ref, dbl)
        c_dh[...] = dbb.reshape(T * 8, B)
        c_dl[...] = dbl.reshape(T * 8, B)

    return kern


@functools.partial(jax.jit, static_argnames=("T", "interpret", "i8"))
def _band_factor_pre_batch(Kdiag, Ksub, T: int = T_LANES,
                           interpret: bool = False, i8: bool = False):
    """Lane-tiled bwb=1 factor emitting the prechunked factor directly:
    (L, nb, B, B) float64 inputs -> BandFacPre with a leading lane axis.

    bf16 scheme: bit-identical to
    prechunk_band_fac(band_factor_ds(...)).  i8 scheme: NOT bit-identical
    to the unbatched prechunk path — the tiled kernel feeds the next
    step's Ksub @ X product from X's 7-bit int8 chunks (the carried
    scratch), rounding L at the 7-bit grid where the unbatched path
    multiplies the pair-exact X and only chunks at storage time.  Both
    are within the scheme's ~2^-49 envelope and the f64 refinement
    absorbs the difference; the custom_vmap consistency divergence is
    accepted and pinned by tests/test_pallas_ds.py::
    test_i8_batched_vs_unbatched_divergence."""
    L, nb = Kdiag.shape[0], Kdiag.shape[1]
    assert Kdiag.shape == (L, nb, B, B) and Ksub.shape == (L, nb, B, B)
    assert Kdiag.dtype == jnp.float64
    nch = _NCHUNK8 if i8 else _NCHUNK
    cdt = jnp.int8 if i8 else jnp.bfloat16
    Lp = -(-L // T) * T
    if Lp != L:
        eye = jnp.broadcast_to(jnp.eye(B, dtype=Kdiag.dtype),
                               (Lp - L, nb, B, B))
        Kdiag = jnp.concatenate([Kdiag, eye], axis=0)
        Ksub = jnp.concatenate(
            [Ksub, jnp.zeros((Lp - L, nb, B, B), Ksub.dtype)], axis=0)

    def split(x):
        hi = x.astype(jnp.float32)
        return hi, (x - hi.astype(jnp.float64)).astype(jnp.float32)

    kdh, kdl = split(Kdiag)
    ksh, ksl = split(Ksub)
    spec_bb = pl.BlockSpec((T, 1, B, B), lambda t, k: (t, k, 0, 0),
                           memory_space=pltpu.VMEM)
    spec_d = pl.BlockSpec((T, 1, 8, B), lambda t, k: (t, k, 0, 0),
                          memory_space=pltpu.VMEM)
    spec_cb = pl.BlockSpec((T, 1, nch * B, B), lambda t, k: (t, k, 0, 0),
                           memory_space=pltpu.VMEM)
    sh_c = jax.ShapeDtypeStruct((Lp, nb, nch * B, B), cdt)
    sh_s = jax.ShapeDtypeStruct((Lp, nb, 8, B), jnp.float32)
    group = (spec_cb, spec_d)
    gshape = (sh_c, sh_s)
    with jax.enable_x64(False):
        out = pl.pallas_call(
            _make_band_factor_tiled_pre(T, i8),
            grid=(Lp // T, nb),
            in_specs=[spec_bb] * 4,
            out_specs=group * 4 + (spec_d, spec_d),
            out_shape=gshape * 4 + (sh_s, sh_s),
            scratch_shapes=[
                # X_{k-1} carried as its dc1 chunks + scale row (bf16/
                # int8: 2.3-4.6x less scratch than the f32 pair it
                # replaced, and the next step's GEMM skips the
                # re-decomposition)
                pltpu.VMEM((T * nch * B, B), cdt),
                pltpu.VMEM((T * 8, B), jnp.float32),
                pltpu.VMEM((T * 8, B), jnp.float32),
                pltpu.VMEM((T * 8, B), jnp.float32),
            ],
            compiler_params=pltpu.CompilerParams(
                dimension_semantics=("arbitrary", "arbitrary"),
                vmem_limit_bytes=100 * 2 ** 20),
            interpret=interpret,
        )(kdh, kdl, ksh, ksl)
    if Lp != L:
        out = tuple(x[:L] for x in out)
    return BandFacPre(*out)


try:  # pragma: no cover - custom_batching present in all supported jax
    from jax import custom_batching as _cb3

    @_cb3.custom_vmap
    def band_factor_ds_pre(Kdiag, Ksub):
        """bwb=1 double-single banded factor, returned prechunked
        (BandFacPre).  Single lane: factor kernel + XLA prechunk.
        Under vmap: the chunk-emitting lane-tiled kernel
        (_band_factor_pre_batch) — no XLA prechunk pass at all."""
        return prechunk_band_fac(_band_factor_ds_impl(Kdiag, Ksub))

    @band_factor_ds_pre.def_vmap
    def _band_factor_ds_pre_vmap(axis_size, in_batched, Kd, Ks):
        kd_b, ks_b = in_batched
        if kd_b and ks_b and Kd.ndim == 4:
            out = _band_factor_pre_batch(Kd, Ks)
        else:
            out = jax.vmap(
                lambda a, b: prechunk_band_fac(_band_factor_ds_impl(a, b)),
                in_axes=(0 if kd_b else None, 0 if ks_b else None))(Kd, Ks)
        return out, jax.tree_util.tree_map(lambda _: True, out)

    @_cb3.custom_vmap
    def band_factor_ds_pre_i8(Kdiag, Ksub):
        """band_factor_ds_pre with INT8 chunk storage (7-bit grids —
        43% less solve-stream HBM; see the int8 header note).  Selected
        per-factorization by Settings.chunk_store in kkt.py."""
        return prechunk_band_fac(_band_factor_ds_impl(Kdiag, Ksub),
                                 i8=True)

    @band_factor_ds_pre_i8.def_vmap
    def _band_factor_ds_pre_i8_vmap(axis_size, in_batched, Kd, Ks):
        kd_b, ks_b = in_batched
        if kd_b and ks_b and Kd.ndim == 4:
            out = _band_factor_pre_batch(Kd, Ks, i8=True)
        else:
            out = jax.vmap(
                lambda a, b: prechunk_band_fac(
                    _band_factor_ds_impl(a, b), i8=True),
                in_axes=(0 if kd_b else None, 0 if ks_b else None))(Kd, Ks)
        return out, jax.tree_util.tree_map(lambda _: True, out)
except Exception:  # pragma: no cover
    def band_factor_ds_pre(Kdiag, Ksub):
        return prechunk_band_fac(_band_factor_ds_impl(Kdiag, Ksub))

    def band_factor_ds_pre_i8(Kdiag, Ksub):
        return prechunk_band_fac(_band_factor_ds_impl(Kdiag, Ksub),
                                 i8=True)


# --------------------------------------------- factor kernel (bwb 2..8)
# Generalization of the bwb == 1 kernel for the wider bands RCM gives on
# LPnetlib shapes (3-8 blocks).  Block row k's elimination touches the
# previous bw rows' leaf inverses AND off-diagonal L blocks, carried in
# VMEM ring buffers indexed (row mod bw); every product is the same
# sqrt|d|-balanced chunk GEMM as the bwb == 1 path.  Specialized per bw
# at trace time (static Python loops).  Single-lane VMEM at bw = 8 is
# ~11 MB — LPnetlib solves are single-lane; the vmapped MPC path stays
# on the bwb == 1 kernel.


def _bal_sub(Mh, Ml, Lah, Lal, Lbh, Lbl, dh, dl):
    """M - (La * d) Lb^T with sqrt|d|-balanced chunk operands; d (1, B)
    enters along the contraction (lane) axis of both L factors."""
    e = _pow2_half(dh)
    einv = 1.0 / e
    m2h = dh * einv * einv
    m2l = dl * einv * einv
    Laeh, Lael = Lah * e, Lal * e
    Lbeh, Lbel = Lbh * e, Lbl * e
    sh, sl = ds_mul(Laeh, Lael, jnp.broadcast_to(m2h, Laeh.shape),
                    jnp.broadcast_to(m2l, Laeh.shape))
    uh, ul = ds_matmul(sh, sl, Lbeh, Lbel, transpose_b=True)
    return ds_add(Mh, Ml, -uh, -ul)


def _make_band_factor_bw(bw: int, nb: int):
    def kern(kdh_ref, kdl_ref, ksh_ref, ksl_ref,
             lbh_ref, lbl_ref, dih_ref, dil_ref, dh_ref, dl_ref,
             c_xh, c_xl, c_dh, c_dl, c_lh, c_ll):
        k = pl.program_id(0)

        @pl.when(k == 0)
        def _init():
            c_xh[...] = jnp.zeros_like(c_xh)
            c_xl[...] = jnp.zeros_like(c_xl)
            c_dh[...] = jnp.ones_like(c_dh)
            c_dl[...] = jnp.zeros_like(c_dl)
            c_lh[...] = jnp.zeros_like(c_lh)
            c_ll[...] = jnp.zeros_like(c_ll)

        def slot(q):
            # ring slot of row k - q; rows < 0 resolve to slots still
            # holding the zero/identity init (depth bw guarantees it)
            return jnp.mod(k - q + np.int32(2 * bw * nb), np.int32(bw))

        def ring_d(q):
            s = slot(q)
            return (c_dh[pl.ds(s * 8, 8), :][0:1],
                    c_dl[pl.ds(s * 8, 8), :][0:1])

        # L blocks go straight to the output ref and are RE-READ for
        # later corrections — keeping all bw of them live as values
        # overflowed Mosaic's scoped-vmem stack at bw = 8
        for j in range(bw, 0, -1):
            Sh = ksh_ref[0, j - 1]
            Sl = ksl_ref[0, j - 1]
            for q in range(j + 1, bw + 1):
                # S -= L[k, k-q] d_{k-q} L[k-j, k-q]^T
                off = (slot(j) * np.int32(bw) + np.int32(q - j - 1)) * B
                Lrjh = c_lh[pl.ds(off, B), :]
                Lrjl = c_ll[pl.ds(off, B), :]
                dqh, dql = ring_d(q)
                Sh, Sl = _bal_sub(Sh, Sl, lbh_ref[0, q - 1],
                                  lbl_ref[0, q - 1], Lrjh, Lrjl,
                                  dqh, dql)
            sj = slot(j)
            Xjh = c_xh[pl.ds(sj * B, B), :]
            Xjl = c_xl[pl.ds(sj * B, B), :]
            djh, djl = ring_d(j)
            ph, plo = ds_matmul(Sh, Sl, Xjh, Xjl, transpose_b=True)
            Ljh, Ljl = ds_div(ph, plo, jnp.broadcast_to(djh, (B, B)),
                              jnp.broadcast_to(djl, (B, B)))
            lbh_ref[0, j - 1] = Ljh
            lbl_ref[0, j - 1] = Ljl
        Mh = kdh_ref[0]
        Ml = kdl_ref[0]
        for q in range(1, bw + 1):
            dqh, dql = ring_d(q)
            Lqh = lbh_ref[0, q - 1]
            Lql = lbl_ref[0, q - 1]
            Mh, Ml = _bal_sub(Mh, Ml, Lqh, Lql, Lqh, Lql, dqh, dql)
        (dh, dl), (Xh, Xl) = _leaf_eliminate_blocked(Mh, Ml)
        _wr(dih_ref, Xh)
        _wr(dil_ref, Xl)
        _wr(dh_ref, jnp.broadcast_to(dh, (8, B)))
        _wr(dl_ref, jnp.broadcast_to(dl, (8, B)))
        s0 = jnp.mod(k, np.int32(bw))
        c_xh[pl.ds(s0 * B, B), :] = Xh
        c_xl[pl.ds(s0 * B, B), :] = Xl
        c_dh[pl.ds(s0 * 8, 8), :] = jnp.broadcast_to(dh, (8, B))
        c_dl[pl.ds(s0 * 8, 8), :] = jnp.broadcast_to(dl, (8, B))
        for j in range(1, bw + 1):
            off = (s0 * np.int32(bw) + np.int32(j - 1)) * B
            c_lh[pl.ds(off, B), :] = lbh_ref[0, j - 1]
            c_ll[pl.ds(off, B), :] = lbl_ref[0, j - 1]

    return kern


@functools.partial(jax.jit, static_argnames=("interpret",))
def band_factor_ds_bw(Kdiag, Ksubs, interpret: bool = False):
    """Double-single banded factor for block bandwidth 2..6
    (the bw^2-block VMEM L ring exceeds the 16 MB scoped budget at 8).

    ``Kdiag``: (nb, B, B) float64 diagonal blocks; ``Ksubs``:
    (nb, bw, B, B) float64 with Ksubs[k, j-1] = K[k, k-j] (rows k < j
    ignored, pass zeros).  Returns float32 pairs
    ``(Lh, Ll, Dinvh, Dinvl, dh, dl)`` with shapes (nb, bw, B, B) x2,
    (nb, B, B) x2 and (nb, 8, B) x2."""
    nb, bw = Ksubs.shape[0], Ksubs.shape[1]
    assert Kdiag.shape == (nb, B, B) and Ksubs.shape == (nb, bw, B, B)
    assert 2 <= bw <= 6 and Kdiag.dtype == jnp.float64

    def split(x):
        hi = x.astype(jnp.float32)
        return hi, (x - hi.astype(jnp.float64)).astype(jnp.float32)

    kdh, kdl = split(Kdiag)
    ksh, ksl = split(Ksubs)
    spec_bb = pl.BlockSpec((1, B, B), lambda i: (i, 0, 0),
                           memory_space=pltpu.VMEM)
    spec_sub = pl.BlockSpec((1, bw, B, B), lambda i: (i, 0, 0, 0),
                            memory_space=pltpu.VMEM)
    spec_d = pl.BlockSpec((1, 8, B), lambda i: (i, 0, 0),
                          memory_space=pltpu.VMEM)
    with jax.enable_x64(False):
        return pl.pallas_call(
            _make_band_factor_bw(bw, nb),
            grid=(nb,),
            in_specs=[spec_bb, spec_bb, spec_sub, spec_sub],
            out_specs=(spec_sub, spec_sub, spec_bb, spec_bb,
                       spec_d, spec_d),
            out_shape=(
                jax.ShapeDtypeStruct((nb, bw, B, B), jnp.float32),
                jax.ShapeDtypeStruct((nb, bw, B, B), jnp.float32),
                jax.ShapeDtypeStruct((nb, B, B), jnp.float32),
                jax.ShapeDtypeStruct((nb, B, B), jnp.float32),
                jax.ShapeDtypeStruct((nb, 8, B), jnp.float32),
                jax.ShapeDtypeStruct((nb, 8, B), jnp.float32),
            ),
            scratch_shapes=[
                pltpu.VMEM((bw * B, B), jnp.float32),
                pltpu.VMEM((bw * B, B), jnp.float32),
                pltpu.VMEM((bw * 8, B), jnp.float32),
                pltpu.VMEM((bw * 8, B), jnp.float32),
                pltpu.VMEM((bw * bw * B, B), jnp.float32),
                pltpu.VMEM((bw * bw * B, B), jnp.float32),
            ],
            compiler_params=pltpu.CompilerParams(
                dimension_semantics=("arbitrary",)),
            interpret=interpret,
        )(kdh, kdl, ksh, ksl)


def _make_fwd_bw(bw: int, nb: int):
    def kern(lbh_ref, lbl_ref, dih_ref, dil_ref, dh_ref, dl_ref,
             xh_ref, xl_ref, wh_ref, wl_ref, c_yh, c_yl):
        k = pl.program_id(0)

        @pl.when(k == 0)
        def _init():
            c_yh[...] = jnp.zeros_like(c_yh)
            c_yl[...] = jnp.zeros_like(c_yl)

        ah, al = _rd(xh_ref), _rd(xl_ref)
        for j in range(1, bw + 1):
            s = jnp.mod(k - j + np.int32(2 * bw * nb), np.int32(bw))
            yjh = c_yh[pl.ds(s * KP, KP), :]
            yjl = c_yl[pl.ds(s * KP, KP), :]
            Ljh = lbh_ref[0, j - 1]
            Ljl = lbl_ref[0, j - 1]
            th, tl = ds_matmul(yjh, yjl, Ljh, Ljl, transpose_b=True)
            ah, al = ds_add(ah, al, -th, -tl)
        Dih, Dil = _rd(dih_ref), _rd(dil_ref)
        yh, yl = ds_matmul(ah, al, Dih, Dil, transpose_b=True)
        dh = _rd(dh_ref)[0:1]
        dl = _rd(dl_ref)[0:1]
        wh, wl = ds_div(yh, yl, jnp.broadcast_to(dh, (KP, B)),
                        jnp.broadcast_to(dl, (KP, B)))
        _wr(wh_ref, wh)
        _wr(wl_ref, wl)
        s0 = jnp.mod(k, np.int32(bw))
        c_yh[pl.ds(s0 * KP, KP), :] = yh
        c_yl[pl.ds(s0 * KP, KP), :] = yl

    return kern


def _make_bwd_bw(bw: int, nb: int):
    def kern(lbh_ref, lbl_ref, dih_ref, dil_ref, wh_ref, wl_ref,
             zh_ref, zl_ref, c_zh, c_zl, c_lh, c_ll):
        i = pl.program_id(0)
        k = np.int32(nb - 1) - i

        @pl.when(i == 0)
        def _init():
            c_zh[...] = jnp.zeros_like(c_zh)
            c_zl[...] = jnp.zeros_like(c_zl)
            c_lh[...] = jnp.zeros_like(c_lh)
            c_ll[...] = jnp.zeros_like(c_ll)

        ah, al = _rd(wh_ref), _rd(wl_ref)
        for j in range(1, bw + 1):
            # z_{k+j} and L[k+j, k] (dist j), from the rings
            s = jnp.mod(k + j, np.int32(bw))
            zjh = c_zh[pl.ds(s * KP, KP), :]
            zjl = c_zl[pl.ds(s * KP, KP), :]
            off = (s * np.int32(bw) + np.int32(j - 1)) * B
            Ljh = c_lh[pl.ds(off, B), :]
            Ljl = c_ll[pl.ds(off, B), :]
            th, tl = ds_matmul(zjh, zjl, Ljh, Ljl)
            ah, al = ds_add(ah, al, -th, -tl)
        Dih, Dil = _rd(dih_ref), _rd(dil_ref)
        zh, zl = ds_matmul(ah, al, Dih, Dil)
        _wr(zh_ref, zh)
        _wr(zl_ref, zl)
        s0 = jnp.mod(k, np.int32(bw))
        c_zh[pl.ds(s0 * KP, KP), :] = zh
        c_zl[pl.ds(s0 * KP, KP), :] = zl
        for j in range(1, bw + 1):
            off = (s0 * np.int32(bw) + np.int32(j - 1)) * B
            c_lh[pl.ds(off, B), :] = lbh_ref[0, j - 1]
            c_ll[pl.ds(off, B), :] = lbl_ref[0, j - 1]

    return kern


@functools.partial(jax.jit, static_argnames=("interpret",))
def band_solve_ds_bw(fac, rhs_t, interpret: bool = False):
    """Solve K x = rhs with the bw > 1 double-single banded factor.

    ``fac``: output tuple of band_factor_ds_bw.  ``rhs_t``: (KP, D)
    float64 transposed right-hand sides.  Returns (KP, D) float64."""
    Lh, Ll, Dih, Dil, dh, dl = fac
    nb, bw = Lh.shape[0], Lh.shape[1]
    D = nb * B
    assert rhs_t.shape == (KP, D), rhs_t.shape

    xh = rhs_t.astype(jnp.float32)
    xl = (rhs_t - xh.astype(jnp.float64)).astype(jnp.float32)

    def tob(v):
        return v.reshape(KP, nb, B).transpose(1, 0, 2)

    xh, xl = tob(xh), tob(xl)
    spec_bb = pl.BlockSpec((1, B, B), lambda i: (i, 0, 0),
                           memory_space=pltpu.VMEM)
    spec_sub = pl.BlockSpec((1, bw, B, B), lambda i: (i, 0, 0, 0),
                            memory_space=pltpu.VMEM)
    spec_d = pl.BlockSpec((1, 8, B), lambda i: (i, 0, 0),
                          memory_space=pltpu.VMEM)
    spec_x = pl.BlockSpec((1, KP, B), lambda i: (i, 0, 0),
                          memory_space=pltpu.VMEM)
    rspec_bb = pl.BlockSpec((1, B, B), lambda i: (nb - 1 - i, 0, 0),
                            memory_space=pltpu.VMEM)
    rspec_sub = pl.BlockSpec((1, bw, B, B),
                             lambda i: (nb - 1 - i, 0, 0, 0),
                             memory_space=pltpu.VMEM)
    rspec_x = pl.BlockSpec((1, KP, B), lambda i: (nb - 1 - i, 0, 0),
                           memory_space=pltpu.VMEM)
    out_sh = (jax.ShapeDtypeStruct((nb, KP, B), jnp.float32),) * 2
    arb = pltpu.CompilerParams(dimension_semantics=("arbitrary",))
    with jax.enable_x64(False):
        wh, wl = pl.pallas_call(
            _make_fwd_bw(bw, nb), grid=(nb,),
            in_specs=[spec_sub] * 2 + [spec_bb] * 2 + [spec_d] * 2
            + [spec_x] * 2,
            out_specs=(spec_x, spec_x), out_shape=out_sh,
            scratch_shapes=[pltpu.VMEM((bw * KP, B), jnp.float32)] * 2,
            compiler_params=arb,
            interpret=interpret,
        )(Lh, Ll, Dih, Dil, dh, dl, xh, xl)
        zh, zl = pl.pallas_call(
            _make_bwd_bw(bw, nb), grid=(nb,),
            in_specs=[rspec_sub] * 2 + [rspec_bb] * 2 + [rspec_x] * 2,
            out_specs=(rspec_x, rspec_x), out_shape=out_sh,
            scratch_shapes=[pltpu.VMEM((bw * KP, B), jnp.float32)] * 2
            + [pltpu.VMEM((bw * bw * B, B), jnp.float32)] * 2,
            compiler_params=arb,
            interpret=interpret,
        )(Lh, Ll, Dih, Dil, wh, wl)
    z = zh.astype(jnp.float64) + zl.astype(jnp.float64)
    return z.transpose(1, 0, 2).reshape(KP, D)


def band_ds_available() -> bool:
    if not _HAS_PALLAS:
        return False
    from .backend import tpu_kernels_on

    return tpu_kernels_on()
