"""Factor tests: the universal densify-vs-dense-Cholesky oracle
(reference tests/FactorTest.cpp strategy): random block structure -> random
SPD-damped data -> factor -> compare against numpy Cholesky of the
densified input."""

import numpy as np
import pytest

from baspacho_tpu import (AddFillPolicy, BackendType, Settings, create_solver)
from baspacho_tpu.testing import (SparseMatGenerator, random_spd_data,
                                  columns_to_lower_csr,
                                  make_independent_elim_set)

BACKENDS = [BackendType.REF, BackendType.PLANNED]


def factor_oracle_check(solver, seed, tol=1e-10, dtype=np.float64):
    data = random_spd_data(solver.data_size, solver.order, seed, dtype)
    data = solver.skel.damp(data, 0.0, solver.order * 1.5)
    dense = solver.skel.densify(np.asarray(data), fill_upper_half=True)
    l_oracle = np.linalg.cholesky(dense)
    factored = np.asarray(solver.factor(data))
    l_mine = np.tril(solver.skel.densify(factored))
    err = np.max(np.abs(l_mine - l_oracle))
    assert err < tol, f"factor mismatch {err}"


@pytest.mark.parametrize("backend", BACKENDS)
@pytest.mark.parametrize("seed", range(5))
def test_factor_flat(backend, seed):
    gen = SparseMatGenerator.gen_flat(24, 0.3, seed=seed + 10)
    ss = gen.to_structure()
    rng = np.random.RandomState(seed)
    param_sizes = rng.randint(2, 5, size=ss.order)
    solver = create_solver(Settings(backend=backend), param_sizes, ss)
    factor_oracle_check(solver, seed)


@pytest.mark.parametrize("backend", BACKENDS)
@pytest.mark.parametrize("seed", range(3))
def test_factor_grid(backend, seed):
    gen = SparseMatGenerator.gen_grid(6, 6, 0.6, seed=seed + 20)
    ss = gen.to_structure()
    rng = np.random.RandomState(seed)
    param_sizes = rng.randint(1, 4, size=ss.order)
    solver = create_solver(Settings(backend=backend), param_sizes, ss)
    factor_oracle_check(solver, seed)


@pytest.mark.parametrize("backend", BACKENDS)
@pytest.mark.parametrize("seed", range(3))
def test_factor_with_given_elim_range(backend, seed):
    gen = SparseMatGenerator.gen_flat(20, 0.35, seed=seed + 30)
    gen.add_schur_set(60, 0.12)
    ss = gen.to_structure()
    rng = np.random.RandomState(seed)
    param_sizes = rng.randint(1, 4, size=ss.order)
    solver = create_solver(Settings(backend=backend), param_sizes, ss,
                           sparse_elim_ranges=[0, 60])
    assert solver.sparse_elim_ranges[:2] == [0, 60]
    factor_oracle_check(solver, seed)


@pytest.mark.parametrize("seed", range(2))
def test_factor_auto_elim_detection(seed):
    # large independent set should be auto-detected as sparse elim range
    gen = SparseMatGenerator.gen_flat(15, 0.4, seed=seed + 40)
    gen.add_schur_set(70, 0.1)
    ss = gen.to_structure()
    param_sizes = np.full(ss.order, 3)
    solver = create_solver(Settings(), param_sizes, ss)
    assert len(solver.sparse_elim_ranges) >= 2, "no elim range detected"
    assert solver.sparse_elim_ranges[1] >= 50
    factor_oracle_check(solver, seed)


@pytest.mark.parametrize("backend", BACKENDS)
@pytest.mark.parametrize("seed", range(2))
def test_factor_float32(backend, seed):
    gen = SparseMatGenerator.gen_flat(18, 0.3, seed=seed + 50)
    ss = gen.to_structure()
    param_sizes = np.full(ss.order, 2)
    solver = create_solver(Settings(backend=backend), param_sizes, ss)
    factor_oracle_check(solver, seed, tol=5e-4, dtype=np.float32)


@pytest.mark.parametrize("backend", BACKENDS)
@pytest.mark.parametrize("seed", range(2))
def test_factor_meridians(backend, seed):
    """Meridian (pole-connected tracks) topology — deep, fragmented trees,
    the planned backend's hardest assembly case (reference
    TestingMatGen.cpp:87 family)."""
    gen = SparseMatGenerator.gen_meridians(3, 40, 0.25, 6, 12, 2, 2,
                                           seed=seed + 80)
    ss = gen.to_structure()
    rng = np.random.RandomState(seed)
    param_sizes = rng.randint(1, 4, size=ss.order)
    solver = create_solver(Settings(backend=backend), param_sizes, ss)
    factor_oracle_check(solver, seed)


@pytest.mark.parametrize("seed", range(2))
def test_factor_grid_planned_medium(seed):
    """Medium grid through the planned backend: exercises multiple levels,
    exact-shape element scatter groups, and the dense/pairs cost choice."""
    gen = SparseMatGenerator.gen_grid(12, 12, 0.4, seed=seed + 90)
    ss = gen.to_structure()
    param_sizes = np.full(ss.order, 3)
    solver = create_solver(Settings(backend=BackendType.PLANNED),
                           param_sizes, ss)
    factor_oracle_check(solver, seed)


@pytest.mark.parametrize("seed", range(2))
def test_factor_level_reorder(seed):
    """level_reorder=True places (level, shape) buckets contiguously; the
    full oracle must still hold."""
    gen = SparseMatGenerator.gen_grid(8, 8, 0.5, seed=seed + 95)
    ss = gen.to_structure()
    param_sizes = np.full(ss.order, 3)
    solver = create_solver(Settings(backend=BackendType.PLANNED,
                                    level_reorder=True), param_sizes, ss)
    factor_oracle_check(solver, seed)


@pytest.mark.parametrize("backend", BACKENDS)
@pytest.mark.parametrize("seed", range(2))
def test_factor_elim_last_ids(backend, seed):
    gen = SparseMatGenerator.gen_flat(25, 0.3, seed=seed + 60)
    ss = gen.to_structure()
    param_sizes = np.full(ss.order, 2)
    elim_last = {3, 7, 11}
    solver = create_solver(Settings(backend=backend), param_sizes, ss,
                           elim_last_ids=elim_last)
    # params in elim_last must be mapped to the final spans
    spans = sorted(int(solver.permutation[i]) for i in elim_last)
    assert spans == [ss.order - 3, ss.order - 2, ss.order - 1]
    factor_oracle_check(solver, seed)


@pytest.mark.parametrize("policy", [AddFillPolicy.FOR_GIVEN_ELIMS,
                                    AddFillPolicy.NONE])
def test_fill_policies_construct(policy):
    gen = SparseMatGenerator.gen_flat(12, 0.4, seed=99)
    gen.add_schur_set(55, 0.15)
    ss = gen.to_structure()
    param_sizes = np.full(ss.order, 2)
    solver = create_solver(
        Settings(add_fill_policy=policy), param_sizes, ss,
        sparse_elim_ranges=[0, 55])
    if policy == AddFillPolicy.NONE:
        assert solver.can_factor_up_to == 0
    else:
        assert solver.can_factor_up_to == 55
    # identity reordering in these policies
    assert np.array_equal(solver.permutation, np.arange(ss.order))


@pytest.mark.parametrize("seed", range(2))
def test_factor_batched(seed):
    gen = SparseMatGenerator.gen_flat(16, 0.35, seed=seed + 70)
    ss = gen.to_structure()
    param_sizes = np.full(ss.order, 3)
    solver = create_solver(Settings(), param_sizes, ss)
    batch = 5
    datas = np.stack([
        solver.skel.damp(
            random_spd_data(solver.data_size, solver.order, seed * 10 + b),
            0.0, solver.order * 1.5)
        for b in range(batch)])
    factored = np.asarray(solver.factor(datas))
    for b in range(batch):
        dense = solver.skel.densify(datas[b], fill_upper_half=True)
        l_oracle = np.linalg.cholesky(dense)
        l_mine = np.tril(solver.skel.densify(factored[b]))
        assert np.max(np.abs(l_mine - l_oracle)) < 1e-10


def test_check_factor_detects_indefinite():
    gen = SparseMatGenerator.gen_flat(15, 0.3, seed=5)
    ss = gen.to_structure()
    solver = create_solver(Settings(), np.full(15, 2), ss)
    data = random_spd_data(solver.data_size, solver.order, 5)
    good = solver.factor(solver.skel.damp(data, 0.0, solver.order * 1.5))
    assert solver.check_factor(good)
    bad = solver.factor(solver.skel.damp(data, 0.0, -1e6))  # indefinite
    assert not solver.check_factor(bad)


@pytest.mark.parametrize("prec", ["highest", "high"])
def test_factor_matmul_precision(prec):
    """The matmul_precision setting must produce valid factorizations at
    both supported levels (on CPU the levels coincide numerically; the
    knob's routing is what's exercised)."""
    gen = SparseMatGenerator.gen_flat(16, 0.3, seed=11)
    ss = gen.to_structure()
    solver = create_solver(
        Settings(backend=BackendType.PLANNED, matmul_precision=prec),
        np.full(16, 3), ss)
    factor_oracle_check(solver, 0, tol=1e-9)
