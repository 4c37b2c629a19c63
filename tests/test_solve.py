"""Solve tests (reference tests/SolveTest.cpp strategy): factor, then check
solveL/solveLt/solve against dense triangular algebra with multiple RHS."""

import numpy as np
import pytest

from baspacho_tpu import BackendType, Settings, create_solver
from baspacho_tpu.testing import SparseMatGenerator, random_spd_data


BACKENDS = [BackendType.REF, BackendType.PLANNED]


def make_solver_and_factor(n, fill, seed, psize_range=(2, 5), schur=0,
                           elim_ranges=(), backend=BackendType.REF):
    gen = SparseMatGenerator.gen_flat(n, fill, seed=seed)
    if schur:
        gen.add_schur_set(schur, 0.12)
    ss = gen.to_structure()
    rng = np.random.RandomState(seed)
    param_sizes = rng.randint(psize_range[0], psize_range[1], size=ss.order)
    solver = create_solver(Settings(backend=backend), param_sizes, ss,
                           sparse_elim_ranges=list(elim_ranges))
    data = random_spd_data(solver.data_size, solver.order, seed + 1000)
    data = solver.skel.damp(data, 0.0, solver.order * 1.5)
    factored = solver.factor(data)
    l_dense = np.tril(solver.skel.densify(np.asarray(factored)))
    return solver, factored, l_dense


@pytest.mark.parametrize("backend", BACKENDS)
@pytest.mark.parametrize("seed", range(4))
@pytest.mark.parametrize("nrhs", [1, 5])
def test_solve_l(backend, seed, nrhs):
    solver, factored, L = make_solver_and_factor(20, 0.3, seed + 10,
                                                 backend=backend)
    rng = np.random.RandomState(seed)
    rhs = rng.rand(solver.order, nrhs)
    got = np.asarray(solver.solve_l(factored, rhs if nrhs > 1 else rhs[:, 0]))
    want = np.linalg.solve(L, rhs)
    if nrhs == 1:
        want = want[:, 0]
    assert np.max(np.abs(got - want)) < 1e-9


@pytest.mark.parametrize("backend", BACKENDS)
@pytest.mark.parametrize("seed", range(4))
@pytest.mark.parametrize("nrhs", [1, 5])
def test_solve_lt(backend, seed, nrhs):
    solver, factored, L = make_solver_and_factor(20, 0.3, seed + 20,
                                                 backend=backend)
    rng = np.random.RandomState(seed)
    rhs = rng.rand(solver.order, nrhs)
    got = np.asarray(solver.solve_lt(factored,
                                     rhs if nrhs > 1 else rhs[:, 0]))
    want = np.linalg.solve(L.T, rhs)
    if nrhs == 1:
        want = want[:, 0]
    assert np.max(np.abs(got - want)) < 1e-9


@pytest.mark.parametrize("backend", BACKENDS)
@pytest.mark.parametrize("seed", range(3))
def test_full_solve(backend, seed):
    solver, factored, L = make_solver_and_factor(22, 0.25, seed + 30,
                                                 backend=backend)
    rng = np.random.RandomState(seed)
    rhs = rng.rand(solver.order, 3)
    got = np.asarray(solver.solve(factored, rhs))
    want = np.linalg.solve(L.T, np.linalg.solve(L, rhs))
    assert np.max(np.abs(got - want)) < 1e-8


@pytest.mark.parametrize("backend", BACKENDS)
@pytest.mark.parametrize("seed", range(2))
def test_solve_with_elim_ranges(backend, seed):
    solver, factored, L = make_solver_and_factor(
        15, 0.35, seed + 40, schur=60, elim_ranges=[0, 60],
        backend=backend)
    rng = np.random.RandomState(seed)
    rhs = rng.rand(solver.order, 2)
    got = np.asarray(solver.solve(factored, rhs))
    want = np.linalg.solve(L.T, np.linalg.solve(L, rhs))
    assert np.max(np.abs(got - want)) < 1e-8


@pytest.mark.parametrize("backend", BACKENDS)
@pytest.mark.parametrize("seed", range(2))
def test_solve_batched(backend, seed):
    solver, factored, L = make_solver_and_factor(16, 0.3, seed + 50,
                                                 backend=backend)
    rng = np.random.RandomState(seed)
    batch = 4
    datas = np.stack([np.asarray(factored)] * batch)
    rhs = rng.rand(batch, solver.order, 2)
    got = np.asarray(solver.solve(datas, rhs))
    for b in range(batch):
        want = np.linalg.solve(L.T, np.linalg.solve(L, rhs[b]))
        assert np.max(np.abs(got[b] - want)) < 1e-8


@pytest.mark.parametrize("seed", range(2))
def test_iterative_refinement_recovers_f64(seed):
    """f32 factor + f64 residual refinement hits the double-precision
    accuracy contract (reference FactorTest/SolveTest epsilons)."""
    solver, factored, L = make_solver_and_factor(18, 0.3, seed + 90)
    data64 = None
    # rebuild raw matrix data (factored was computed from damped data)
    rng = np.random.RandomState(seed + 1000 + 90)
    data64 = random_spd_data(solver.data_size, solver.order, seed + 1090)
    data64 = np.asarray(solver.skel.damp(data64, 0.0, solver.order * 1.5))
    f32 = np.asarray(solver.factor(data64.astype(np.float32)))
    rhs = rng.rand(solver.order)
    x = np.asarray(solver.solve_refined(data64, f32, rhs, iterations=3))
    dense = solver.skel.densify(data64, fill_upper_half=True)
    want = np.linalg.solve(dense, rhs)
    err0 = np.max(np.abs(np.asarray(
        solver.solve(f32, rhs.astype(np.float32))).astype(np.float64)
        - want))
    err = np.max(np.abs(x - want))
    assert err < 1e-10, (err, err0)
    assert err < err0 / 10
