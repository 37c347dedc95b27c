"""Native runtime layer (native/eicos_native.cpp via eicos_tpu.native):
CSC interop, corpus number scanning, RCM ordering + band statistics.
Each op is cross-checked against an independent NumPy/SciPy oracle."""

import numpy as np
import pytest
import scipy.sparse as sp

from eicos_tpu import corpus, native


def _random_sym(n, density, seed):
    M = sp.random(n, n, density=density, random_state=seed, format="csc")
    return (M + M.T + sp.eye(n)).tocsc()


def test_csc_roundtrip(rng):
    M = sp.random(37, 23, density=0.17, random_state=5, format="csc")
    dense = native.csc_to_dense(37, 23, M.data, M.indptr, M.indices)
    np.testing.assert_allclose(dense, M.toarray())
    vals = native.dense_to_csc_values(dense, M.indptr, M.indices)
    np.testing.assert_allclose(vals, M.data)


def test_parse_numbers_formats():
    text = b"x[] = {1.0, -2.5e3,\n 4, .5, 7e-2, -0.125E+1};"
    vals, end = native.parse_numbers(text, text.index(b"{") + 1)
    np.testing.assert_allclose(vals, [1.0, -2500.0, 4.0, 0.5, 0.07, -1.25])
    assert text[end:end + 1] == b"}"


def test_parse_header_matches_regex_fallback():
    """Native scan and the pure-regex fallback must agree on a real corpus
    header (values and ordering)."""
    import eicos_tpu.native as nat

    path = corpus.REFERENCE_TEST_DIR + "/LPnetlib/lp_afiro.h"
    d_native = corpus.parse_header(path)
    lib, nat._lib = nat._lib, None  # force fallback

    def _noload():
        return None
    orig_try = nat._try_load
    nat._try_load = _noload
    try:
        d_regex = corpus.parse_header(path)
    finally:
        nat._try_load = orig_try
        nat._lib = lib
    assert set(d_native) == set(d_regex)
    for k, v in d_regex.items():
        if isinstance(v, np.ndarray):
            np.testing.assert_allclose(d_native[k], v)
        else:
            assert d_native[k] == v


def test_rcm_reduces_bandwidth():
    M = _random_sym(80, 0.05, seed=3)
    n = M.shape[0]
    perm = native.rcm_order(n, M.indptr, M.indices)
    assert sorted(perm) == list(range(n))
    ip = np.empty(n, dtype=np.int64)
    ip[perm] = np.arange(n)
    bw0, _ = native.band_stats(n, M.indptr, M.indices, None)
    bw1, _ = native.band_stats(n, M.indptr, M.indices, ip)
    assert bw1 <= bw0


def test_band_stats_matches_numpy_oracle():
    M = _random_sym(50, 0.08, seed=9)
    n = M.shape[0]
    perm = native.rcm_order(n, M.indptr, M.indices)
    ip = np.empty(n, dtype=np.int64)
    ip[perm] = np.arange(n)
    bw_c, prof_c = native.band_stats(n, M.indptr, M.indices, ip)
    jc = np.asarray(M.indptr, np.int64)
    ir = np.asarray(M.indices, np.int64)
    cols = np.repeat(np.arange(n), np.diff(jc))
    pc, pr_ = ip[cols], ip[ir]
    lo, hi = np.minimum(pc, pr_), np.maximum(pc, pr_)
    assert bw_c == int(np.max(hi - lo, initial=0))
    minrow = np.arange(n)
    np.minimum.at(minrow, hi, lo)
    assert prof_c == int(np.sum(np.arange(n) - minrow))


def test_rcm_matches_scipy_quality():
    """Our RCM need not equal scipy's permutation, but should land in the
    same bandwidth ballpark on a banded-ish matrix."""
    from scipy.sparse.csgraph import reverse_cuthill_mckee

    M = _random_sym(120, 0.03, seed=11)
    n = M.shape[0]
    ours = native.rcm_order(n, M.indptr, M.indices)
    theirs = np.asarray(reverse_cuthill_mckee(M, symmetric_mode=True))

    def bw(perm):
        ip = np.empty(n, dtype=np.int64)
        ip[perm] = np.arange(n)
        return native.band_stats(n, M.indptr, M.indices, ip)[0]

    assert bw(ours) <= max(2 * bw(theirs), bw(theirs) + 16)
