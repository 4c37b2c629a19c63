"""createSolver policy matrix (reference tests/CreateSolverTest.cpp):
all fill policies x elim ranges x elim-last ids, asserting can_factor_up_to
and reordering invariants."""

import numpy as np
import pytest

from baspacho_tpu import AddFillPolicy, BackendType, Settings, create_solver
from baspacho_tpu.testing import SparseMatGenerator, random_spd_data


def problem(seed=0, n=14, schur=56):
    gen = SparseMatGenerator.gen_flat(n, 0.3, seed=seed)
    gen.add_schur_set(schur, 0.12)
    ss = gen.to_structure()
    return ss, np.full(ss.order, 2), schur


@pytest.mark.parametrize("policy,expect_cfut", [
    (AddFillPolicy.COMPLETE, "all"),
    (AddFillPolicy.FOR_AUTO_ELIMS, "elim_end"),
    (AddFillPolicy.FOR_GIVEN_ELIMS, "given_end"),
    (AddFillPolicy.NONE, "zero"),
])
def test_policies(policy, expect_cfut):
    ss, psizes, schur = problem()
    solver = create_solver(Settings(add_fill_policy=policy), psizes, ss,
                           sparse_elim_ranges=[0, schur])
    n = len(psizes)
    if expect_cfut == "all":
        assert solver.can_factor_up_to == n
    elif expect_cfut == "zero":
        assert solver.can_factor_up_to == 0
    elif expect_cfut == "given_end":
        assert solver.can_factor_up_to == schur
    else:  # elim end >= given end
        assert schur <= solver.can_factor_up_to <= n
    if policy in (AddFillPolicy.NONE, AddFillPolicy.FOR_GIVEN_ELIMS):
        assert np.array_equal(solver.permutation, np.arange(n))


def test_elim_range_partial_factor_matches_dense_schur():
    """FOR_GIVEN_ELIMS: factor_up_to(schur end) against dense formula."""
    ss, psizes, schur = problem(seed=2)
    solver = create_solver(
        Settings(add_fill_policy=AddFillPolicy.FOR_GIVEN_ELIMS),
        psizes, ss, sparse_elim_ranges=[0, schur])
    data = random_spd_data(solver.data_size, solver.order, 3)
    data = np.asarray(solver.skel.damp(data, 0.0, solver.order * 1.5))
    t = schur
    o = solver.span_vector_offset(t)
    m = solver.skel.densify(data, fill_upper_half=True)
    part = solver.skel.densify(np.asarray(solver.factor_up_to(data, t)))
    l11_want = np.linalg.cholesky(m[:o, :o])
    assert np.max(np.abs(np.tril(part[:o, :o]) - l11_want)) < 1e-9
    l21_want = np.linalg.solve(l11_want, m[:o, o:]).T
    # only structurally-present entries are stored
    mask = solver.skel.densify(np.ones(solver.data_size))[o:, :o] != 0
    assert np.max(np.abs((part[o:, :o] - l21_want) * mask)) < 1e-9


def test_elim_last_ids_land_last():
    gen = SparseMatGenerator.gen_flat(20, 0.25, seed=7)
    ss = gen.to_structure()
    psizes = np.full(20, 3)
    last = {2, 9, 15, 18}
    solver = create_solver(Settings(), psizes, ss, elim_last_ids=last)
    spans = sorted(int(solver.permutation[i]) for i in last)
    assert spans == [16, 17, 18, 19]
    # partial factor up to the elim-last boundary must be legal
    boundary = 16
    sp = solver.skel.span_offset_in_lump[boundary]
    assert sp == 0  # merges must not cross the no-cross boundary
    data = random_spd_data(solver.data_size, solver.order, 1)
    data = np.asarray(solver.skel.damp(data, 0.0, solver.order * 1.5))
    solver.factor_up_to(data, boundary)


def test_no_sparse_elim_detection_flag():
    ss, psizes, schur = problem(seed=4)
    s_off = create_solver(
        Settings(find_sparse_elimination_ranges=False), psizes, ss)
    assert s_off.sparse_elim_ranges == []
    s_on = create_solver(Settings(), psizes, ss)
    assert len(s_on.sparse_elim_ranges) >= 2


def test_backends_agree():
    ss, psizes, schur = problem(seed=5, n=10, schur=30)
    data = None
    results = []
    for backend in (BackendType.REF, BackendType.PLANNED):
        solver = create_solver(Settings(backend=backend), psizes, ss,
                               sparse_elim_ranges=[0, schur])
        if data is None:
            data = random_spd_data(solver.data_size, solver.order, 9)
            # note: data sizes differ between layouts; rebuild per backend
        d = random_spd_data(solver.data_size, solver.order, 9)
        d = np.asarray(solver.skel.damp(d, 0.0, solver.order * 1.5))
        dense_in = solver.skel.densify(d, fill_upper_half=True)
        L = np.tril(solver.skel.densify(np.asarray(solver.factor(d))))
        results.append((dense_in, L))
    # same user problem produces the same dense input? layouts differ in
    # random data, so compare L L^T vs input per backend instead
    for dense_in, L in results:
        assert np.max(np.abs(L @ L.T - dense_in)) < 1e-8


def test_level_reorder_option():
    """level_reorder=True renumbers lumps level-major; factorization must
    stay correct (buckets become contiguous storage slices)."""
    ss, psizes, schur = problem(seed=8, n=12, schur=56)
    solver = create_solver(
        Settings(backend=BackendType.PLANNED, level_reorder=True),
        psizes, ss, sparse_elim_ranges=[0, schur])
    data = random_spd_data(solver.data_size, solver.order, 11)
    data = np.asarray(solver.skel.damp(data, 0.0, solver.order * 1.5))
    dense = solver.skel.densify(data, fill_upper_half=True)
    L = np.tril(solver.skel.densify(np.asarray(solver.factor(data))))
    assert np.max(np.abs(L @ L.T - dense)) < 1e-8
    # levels must be non-decreasing along the post-elim lump order
    lv = solver.plan.lump_levels[schur:]
    assert np.all(np.diff(lv) >= 0)


def test_numeric_input_validation():
    """Wrong-shaped inputs raise with clear messages (the reference guards
    every numeric op with BASPACHO_CHECK*, DebugMacros.h)."""
    import numpy as np
    import pytest
    from baspacho_tpu import Settings, create_solver
    from baspacho_tpu.testing import SparseMatGenerator, random_spd_data

    gen = SparseMatGenerator.gen_flat(10, 0.3, seed=1)
    solver = create_solver(Settings(), np.full(10, 2), gen.to_structure())
    data = random_spd_data(solver.data_size, solver.order, 1)
    data = np.asarray(solver.skel.damp(data, 0.0, solver.order * 1.5))
    with pytest.raises(ValueError, match="elements"):
        solver.factor(data[:-1])
    f = solver.factor(data)
    with pytest.raises(ValueError, match="order"):
        solver.solve(f, np.zeros(solver.order + 1))
