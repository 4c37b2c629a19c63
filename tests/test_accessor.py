"""Accessor tests (reference tests/AccessorTest.cpp): block/diag lookups
against densified ground truth, permuted access with transposed (flipped)
blocks, vectorized offset computation."""

import numpy as np
import pytest

from baspacho_tpu import Settings, create_solver
from baspacho_tpu.accessor import CoalescedAccessor
from baspacho_tpu.testing import SparseMatGenerator, random_spd_data


def build(seed=0, n=15):
    gen = SparseMatGenerator.gen_flat(n, 0.3, seed=seed)
    ss = gen.to_structure()
    rng = np.random.RandomState(seed)
    psizes = rng.randint(1, 4, size=n)
    solver = create_solver(Settings(), psizes, ss)
    data = random_spd_data(solver.data_size, solver.order, seed)
    return solver, np.asarray(data), psizes


def test_plain_accessor_blocks():
    solver, data, _ = build()
    sk = solver.skel
    acc = CoalescedAccessor(sk)
    dense = sk.densify(data)
    span_start = sk.span_start
    for s in range(sk.num_spans):
        blk = acc.diag_block(data, s)
        a, b = span_start[s], span_start[s + 1]
        assert np.array_equal(blk, dense[a:b, a:b])
    # every stored chain block matches the dense image
    for l in range(sk.num_lumps):
        s0 = int(sk.lump_to_span[l])
        for ci in range(int(sk.chain_col_ptr[l]),
                        int(sk.chain_col_ptr[l + 1])):
            r = int(sk.chain_row_span[ci])
            blk = acc.block(data, r, s0)
            ra, rb = span_start[r], span_start[r + 1]
            ca, cb = span_start[s0], span_start[s0 + 1]
            assert np.array_equal(blk, dense[ra:rb, ca:cb])


def test_permuted_accessor_flip():
    solver, data, psizes = build(seed=3)
    acc = solver.accessor()
    perm = solver.permutation
    dense = solver.skel.densify(data, fill_upper_half=True)
    span_start = solver.skel.span_start
    n = len(psizes)
    # user-order block (i, j) must equal the dense image at permuted spans
    rng = np.random.RandomState(0)
    pairs = set()
    ss_cols = {}
    for i in range(n):
        for j in range(n):
            pi, pj = int(perm[i]), int(perm[j])
            try:
                blk = acc.block(data, i, j)
            except AssertionError:
                continue  # block not present in pattern
            ra = span_start[pi]
            ca = span_start[pj]
            want = dense[ra:ra + psizes[i], ca:ca + psizes[j]]
            if i == j:
                # stored diagonal blocks hold garbage above the diagonal
                assert np.array_equal(np.tril(blk), np.tril(want)), (i, j)
            else:
                assert np.array_equal(blk, want), (i, j)
            pairs.add((i, j))
    assert len(pairs) > n  # found off-diagonal blocks too


def test_vectorized_block_offsets():
    solver, data, psizes = build(seed=5)
    acc = solver.accessor()
    sk = solver.skel
    # collect all present user pairs via chains
    rows, cols = [], []
    inv = np.empty(len(psizes), dtype=np.int64)
    inv[solver.permutation] = np.arange(len(psizes))
    for l in range(sk.num_lumps):
        for s in range(int(sk.lump_to_span[l]), int(sk.lump_to_span[l + 1])):
            for ci in range(int(sk.chain_col_ptr[l]),
                            int(sk.chain_col_ptr[l + 1])):
                r = int(sk.chain_row_span[ci])
                if r < s:
                    continue
                rows.append(int(inv[r]))
                cols.append(int(inv[s]))
    rows = np.array(rows)
    cols = np.array(cols)
    offs, strides, flips = acc.block_offsets(rows, cols)
    for k in range(len(rows)):
        o, st, fl = acc.block_offset(int(rows[k]), int(cols[k]))
        assert (o, st, fl) == (offs[k], strides[k], bool(flips[k]))
