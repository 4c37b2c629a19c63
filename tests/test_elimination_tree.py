"""Elimination tree tests (reference tests/EliminationTreeTest.cpp):
tree construction, sparse-elim detection heuristics, merge validity,
aggregate structure consistency."""

import numpy as np
import pytest

from baspacho_tpu.elimination_tree import (EliminationTree,
                                           MAX_SPARSE_ELIM_NODE_SIZE,
                                           MIN_NUM_SPARSE_ELIM_NODES)
from baspacho_tpu.testing import (SparseMatGenerator, columns_to_lower_csr,
                                  random_cols)


def build_et(cols, psizes, detect=True):
    ss = columns_to_lower_csr(cols)
    et = EliminationTree(psizes, ss)
    et.build_tree()
    et.process_tree(detect)
    et.compute_aggregate_struct()
    return et


def test_parent_is_first_filled_offdiag():
    cols = random_cols(30, 0.15, seed=1)
    ss = columns_to_lower_csr(cols)
    et = EliminationTree(np.full(30, 2), ss)
    et.build_tree()
    filled = ss.add_full_elimination_fill().transpose()
    for j in range(30):
        rows = filled.inds[filled.ptrs[j]:filled.ptrs[j + 1]]
        rows = rows[rows > j]
        want = int(rows[0]) if len(rows) else -1
        assert int(et.parent[j]) == want


def test_merges_follow_tree_and_aggregate_consistent():
    cols = random_cols(40, 0.1, seed=2)
    et = build_et(cols, np.full(40, 3))
    num_lumps = len(et.lump_start) - 1
    assert et.lump_to_span[-1] == 40
    # permInverse is a valid permutation
    assert sorted(et.perm_inverse.tolist()) == list(range(40))
    # each aggregate column starts with its own spans (diag block)
    for a in range(num_lumps):
        s0, s1 = et.lump_to_span[a], et.lump_to_span[a + 1]
        rows = et.row_param[et.col_start[a]:et.col_start[a + 1]]
        assert np.array_equal(rows[:s1 - s0], np.arange(s0, s1))


def test_sparse_elim_range_detected_for_schur_set():
    gen = SparseMatGenerator.gen_flat(20, 0.4, seed=3)
    gen.add_schur_set(80, 0.1)
    cols = [set(c) for c in gen.columns]
    et = build_et(cols, np.full(100, 3))
    assert len(et.sparse_elim_ranges) >= 2
    assert et.sparse_elim_ranges[0] == 0
    assert et.sparse_elim_ranges[1] >= MIN_NUM_SPARSE_ELIM_NODES


def test_no_elim_range_for_dense_problem():
    cols = random_cols(60, 0.5, seed=4)  # heavily connected
    et = build_et(cols, np.full(60, 3))
    # dense problems have few leaves of equal height -> no range
    assert et.sparse_elim_ranges == [] or \
        et.sparse_elim_ranges[1] >= MIN_NUM_SPARSE_ELIM_NODES


def test_large_params_not_sparse_eliminated():
    gen = SparseMatGenerator.gen_flat(10, 0.5, seed=5)
    gen.add_schur_set(80, 0.1)
    cols = [set(c) for c in gen.columns]
    psizes = np.full(90, MAX_SPARSE_ELIM_NODE_SIZE + 1)
    et = build_et(cols, psizes)
    assert et.sparse_elim_ranges == []
