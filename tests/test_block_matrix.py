"""Skeleton construction invariants, densify, damp, padded layout
(reference tests/CoalescedBlockMatrixTest.cpp + padded-storage additions)."""

import numpy as np
import pytest

from baspacho_tpu import CoalescedBlockMatrixSkel


def fixture_skel(pad_fn=None):
    # 6 spans in 3 lumps: {0,1}, {2}, {3,4,5}; handmade chains
    span_start = [0, 2, 5, 7, 10, 12, 15]
    lump_to_span = [0, 2, 3, 6]
    # col 0: diag spans 0,1 + rows at spans 2, 4
    # col 1: diag span 2 + row at span 5
    # col 2: diag spans 3,4,5
    col_ptr = [0, 4, 6, 9]
    row_ind = [0, 1, 2, 4, 2, 5, 3, 4, 5]
    return CoalescedBlockMatrixSkel(span_start, lump_to_span, col_ptr,
                                    row_ind, pad_fn=pad_fn)


def test_skeleton_indices():
    sk = fixture_skel()
    assert sk.num_spans == 6 and sk.num_lumps == 3
    assert sk.order == 15
    assert np.array_equal(sk.span_to_lump[:6], [0, 0, 1, 2, 2, 2])
    assert np.array_equal(sk.lump_start, [0, 5, 7, 15])
    assert np.array_equal(sk.span_offset_in_lump[:6], [0, 2, 0, 0, 3, 5])
    # col 0 width 5, rows: 5 diag + 2 (span 2) + 2 (span 4) = 9
    assert sk.chain_rows_till_end[3] == 9
    # unpadded: data size = sum over columns of rows*width
    assert sk.data_size == 9 * 5 + (2 + 3) * 2 + 8 * 8


def test_densify_damp_roundtrip():
    sk = fixture_skel()
    rng = np.random.RandomState(0)
    data = rng.rand(sk.data_size)
    dense = sk.densify(data, fill_upper_half=True)
    assert np.allclose(dense, dense.T)
    damped = sk.damp(data, 0.5, 2.0)
    d2 = sk.densify(np.asarray(damped))
    assert np.allclose(np.diag(d2), np.diag(dense) * 1.5 + 2.0)
    off = np.asarray(dense - np.diag(np.diag(dense)))
    off2 = np.asarray(sk.densify(np.asarray(damped), fill_upper_half=True))
    off2 = off2 - np.diag(np.diag(off2))
    assert np.allclose(off, off2)


def test_padded_layout_equivalence():
    def pad(below, width):
        return np.maximum(below + 3, 4), width + 2

    sku = fixture_skel()
    skp = fixture_skel(pad_fn=pad)
    assert skp.data_size > sku.data_size
    rng = np.random.RandomState(1)
    datau = rng.rand(sku.data_size)
    # copy block by block through chain offsets
    datap = np.zeros(skp.data_size)
    span_size = np.diff(sku.span_start)
    for c in range(len(sku.chain_row_span)):
        rs = int(span_size[sku.chain_row_span[c]])
        lump = np.searchsorted(sku.chain_col_ptr, c, side="right") - 1
        w = int(sku.lump_start[lump + 1] - sku.lump_start[lump])
        su, sp = int(sku.col_stride[lump]), int(skp.col_stride[lump])
        for r in range(rs):
            src = int(sku.chain_data[c]) + r * su
            dst = int(skp.chain_data[c]) + r * sp
            datap[dst:dst + w] = datau[src:src + w]
    assert np.allclose(skp.densify(datap), sku.densify(datau))
    # padding mask marks exactly the copied positions
    mask = skp.padding_mask()
    assert mask.sum() == sku.data_size


def test_diag_block_starts_required():
    with pytest.raises(AssertionError):
        # col 1 missing its diagonal block
        CoalescedBlockMatrixSkel([0, 2, 4], [0, 1, 2], [0, 1, 2], [0, 0])
