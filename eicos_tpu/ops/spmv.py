"""Static-pattern sparse matvec operands for the TPU kernel path.

The IPM's big per-iteration products — the refinement residual matvecs
and the LP-row elimination transforms (kkt.solve_refined / solve_exact)
— multiply by G, A, their transposes and stacks.  The reference runs
these as Eigen CSC SpMVs (computeResiduals,
/root/reference/src/eicos.cpp:643-689).  On MPC/LP families those
matrices have a handful of nonzeros per row/column (box rows: 1, rate
rows: 2, dynamics rows: ~nx+nu), so the dense double-single GEMV kernel
(ops/pallas_gemm_ds.BigOperand) that replaced XLA's f64 emulation still
streams ~60 MB of mostly-zero operand per product — measured ~4.5 ms
per product at 128 bench lanes, ~18 products per IPM iteration.

With the pattern static (structure.MatvecPattern), each product
``x @ M`` becomes an exact float64 padded-CSC gather + weighted sum:
output column j sums W coefficient-weighted elements of x, where W is
the operand's maximum column nonzero count, padded with an appended
zero slot.  Measured ~1.9 ms per product on the bench family at 128
lanes, with BETTER accuracy than the 2^-48 chunk kernel (plain f64
gather/multiply/add).  Coefficients are gathered from the traced
(equilibrated) matrix once per solve, so update_data on the same
pattern reuses the compiled executable.

Operands whose column width exceeds WIDTH_MAX (dense LPnetlib rows)
stay on the dense-kernel path — kkt._make_sliced gates per operand.
"""

from __future__ import annotations

import jax.numpy as jnp
import numpy as np

WIDTH_MAX = 16


def csc_table(src, out, km: int, nm: int):
    """Padded per-output-column table for an ``x @ M`` product.

    ``src``/``out``: arrays over M's nonzeros — position along the
    contraction axis (row of M, in [0, km)) and output column (column
    of M, in [0, nm)).  Returns (idx (nm, W) int32 padded with km, W),
    or None when W > WIDTH_MAX (operand too dense for the gather form).
    """
    src = np.asarray(src, np.int64)
    out = np.asarray(out, np.int64)
    counts = np.zeros(nm, np.int64)
    if out.size:
        np.add.at(counts, out, 1)
    W = int(counts.max()) if nm else 0
    if W > WIDTH_MAX:
        return None
    W = max(W, 1)
    idx = np.full((nm, W), km, np.int32)
    order = np.argsort(out, kind="stable")
    pos = np.zeros(nm, np.int64)
    for t in order:
        j = out[t]
        idx[j, pos[j]] = src[t]
        pos[j] += 1
    return idx, W


class SparseOperand:
    """``x @ M`` with a static padded-CSC pattern; drop-in for
    BigOperand.rmatmul.  ``bmat`` is the traced (km, nm) operand in the
    product orientation; vmap batches the gather natively (no
    custom_vmap needed).

    WIDTH-GROUPED: output columns are split into power-of-two nnz
    classes (1, 2, 4, ..., W) so a few singleton-heavy classes don't pad
    every column to the widest row's W — on the MPC bench family ~77%
    of gather slots were pad zeros, and skipping them measured -7.5%
    wall at 128 lanes.  Per class: one gather + one sum over w slots;
    results concatenate in class order and a static inverse permutation
    restores column order.  CAUTION (round-2 finding, CLAUDE.md): the
    sum axis size changes XLA's f64 reduction tree, so results differ
    from the ungrouped form by ~1 ulp — knife-edge lanes can flip exit
    tier; the exit-time recheck + rescue protocol absorbs that.
    Grouping only engages when it removes >=25% of slots AND the column
    count is large enough that per-class overheads amortize."""

    def __init__(self, bmat, idx, W: int):
        km, nm = bmat.shape
        assert idx.shape == (nm, W), (idx.shape, nm, W)
        idx = np.asarray(idx)
        pad = jnp.concatenate(
            [bmat, jnp.zeros((1, nm), bmat.dtype)], axis=0)
        coef_full = pad[jnp.asarray(idx), np.arange(nm)[:, None]]
        self.km, self.nm, self.W = km, nm, W

        counts = np.sum(idx < km, axis=1)
        cls_w = np.minimum(W, np.maximum(1, 1 << np.ceil(
            np.log2(np.maximum(counts, 1))).astype(np.int64)))
        slots_grouped = int(cls_w.sum())
        self.groups = None
        if nm >= 256 and slots_grouped * 4 <= nm * W * 3:
            order = np.argsort(cls_w, kind="stable")
            inv = np.empty(nm, np.int64)
            inv[order] = np.arange(nm)
            self.inv = jnp.asarray(inv)
            groups = []
            start = 0
            for w in sorted(set(int(v) for v in cls_w)):
                cols = order[cls_w[order] == w]
                assert np.array_equal(cols, order[start:start + len(cols)])
                start += len(cols)
                groups.append((w, np.asarray(idx[cols, :w]).ravel(),
                               coef_full[cols, :w]))
            self.groups = groups
        else:
            self.coef = coef_full
            self.idxf = idx.ravel()

    def rmatmul(self, a):
        assert a.shape[-1] == self.km, (a.shape, self.km)
        ap = jnp.concatenate(
            [a, jnp.zeros(a.shape[:-1] + (1,), a.dtype)], axis=-1)
        if self.groups is None:
            t = jnp.take(ap, self.idxf, axis=-1)
            t = t.reshape(a.shape[:-1] + (self.nm, self.W))
            return jnp.sum(t * self.coef, axis=-1)
        parts = []
        for w, idxf, coef in self.groups:
            t = jnp.take(ap, idxf, axis=-1)
            t = t.reshape(a.shape[:-1] + (coef.shape[0], w))
            parts.append(jnp.sum(t * coef, axis=-1))
        return jnp.take(jnp.concatenate(parts, axis=-1), self.inv, axis=-1)
