"""Symbolic structure tests, mirroring the reference's
tests/SparseStructureTest.cpp strategy: production algorithms are checked
against naive set-based oracles on random structures."""

import numpy as np
import pytest

from baspacho_tpu import SparseStructure, inverse_permutation
from baspacho_tpu.testing import (
    columns_to_lower_csr,
    csr_to_columns,
    naive_full_elim_fill,
    naive_independent_elim_fill,
    random_cols,
    make_independent_elim_set,
)


def dense_of(ss: SparseStructure) -> np.ndarray:
    n = ss.order
    d = np.zeros((n, n), dtype=bool)
    rows = ss.expanded_rows()
    d[rows, ss.inds] = True
    return d


def test_transpose():
    ptrs = np.array([0, 2, 4, 7, 9])
    inds = np.array([0, 2, 1, 3, 0, 1, 2, 2, 3])
    ss = SparseStructure(ptrs, inds)
    t = ss.transpose()
    assert np.array_equal(dense_of(t), dense_of(ss).T)
    # round trip
    tt = t.transpose()
    assert np.array_equal(tt.ptrs, ss.sort_indices().ptrs)
    assert np.array_equal(tt.inds, ss.sort_indices().inds)


def test_clear():
    rng = np.random.RandomState(0)
    n = 20
    d = rng.rand(n, n) < 0.3
    np.fill_diagonal(d, True)
    rows, cols = np.nonzero(d)
    counts = np.bincount(rows, minlength=n)
    ss = SparseStructure(np.concatenate([[0], np.cumsum(counts)]), cols)
    lower = ss.clear(clear_lower=False)  # keeps lower half
    dl = dense_of(lower)
    assert np.array_equal(dl, np.tril(d))
    upper = ss.clear(clear_lower=True)
    assert np.array_equal(dense_of(upper), np.triu(d))


@pytest.mark.parametrize("seed", range(5))
def test_symmetric_permutation(seed):
    rng = np.random.RandomState(seed)
    n = 30
    cols = random_cols(n, 0.25, seed + 100)
    ss = columns_to_lower_csr(cols)
    perm = rng.permutation(n).astype(np.int64)  # perm[i] = new index of i
    pss = ss.symmetric_permutation(perm, lower_half=True)

    d = dense_of(ss)
    dsym = d | d.T
    dperm = np.zeros_like(d)
    idx = np.arange(n)
    dperm[np.ix_(perm, perm)] = dsym
    assert np.array_equal(dense_of(pss), np.tril(dperm))
    del idx


@pytest.mark.parametrize("seed", range(5))
def test_independent_elim_fill(seed):
    n = 40
    cols = random_cols(n, 0.2, seed + 10)
    end = make_independent_elim_set(cols, 0, 15)
    ss = columns_to_lower_csr(cols)
    filled = ss.add_independent_elimination_fill(0, end)
    oracle = naive_independent_elim_fill(cols, 0, end)
    assert csr_to_columns(filled) == oracle


@pytest.mark.parametrize("seed", range(5))
def test_independent_elim_fill_offset_range(seed):
    n = 50
    cols = random_cols(n, 0.15, seed + 20)
    start = 5
    end = make_independent_elim_set(cols, start, 12)
    ss = columns_to_lower_csr(cols)
    filled = ss.add_independent_elimination_fill(start, end)
    oracle = naive_independent_elim_fill(cols, start, end)
    assert csr_to_columns(filled) == oracle


@pytest.mark.parametrize("seed", range(5))
def test_full_elim_fill(seed):
    n = 35
    cols = random_cols(n, 0.15, seed + 30)
    ss = columns_to_lower_csr(cols)
    filled = ss.add_full_elimination_fill()
    oracle = naive_full_elim_fill(cols)
    assert csr_to_columns(filled) == oracle


def test_extract_right_bottom():
    cols = random_cols(25, 0.3, 77)
    ss = columns_to_lower_csr(cols)
    sub = ss.extract_right_bottom(10)
    d = dense_of(ss)
    assert np.array_equal(dense_of(sub), d[10:, 10:])


@pytest.mark.parametrize("seed", range(3))
def test_fill_reducing_permutation_valid_and_reduces_fill(seed):
    n = 60
    cols = random_cols(n, 0.07, seed + 40)
    ss = columns_to_lower_csr(cols)
    perm = ss.fill_reducing_permutation()
    assert sorted(perm.tolist()) == list(range(n))

    # fill with AMD ordering should not exceed natural-order fill (usually less)
    inv = inverse_permutation(perm)
    permuted = ss.symmetric_permutation(inv, lower_half=True)
    fill_amd = len(permuted.add_full_elimination_fill().inds)
    fill_nat = len(ss.add_full_elimination_fill().inds)
    assert fill_amd <= fill_nat * 1.1 + 10


def test_fill_reducing_permutation_arrow():
    # arrow matrix: first node connected to all; AMD must not pick it first
    n = 12
    cols = [set(range(n))] + [{i} for i in range(1, n)]
    ss = columns_to_lower_csr(cols)
    perm = ss.fill_reducing_permutation()
    assert perm[0] != 0  # hub node must be ordered last-ish
    inv = inverse_permutation(perm)
    permuted = ss.symmetric_permutation(inv, lower_half=True)
    fill = len(permuted.add_full_elimination_fill().inds)
    assert fill == len(ss.inds)  # no fill-in at all when hub goes last
