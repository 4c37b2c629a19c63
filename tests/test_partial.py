"""Partial factor/solve tests (reference tests/PartialFactorSolveTest.cpp):
2x2 block algebra identities with split point t (offset o):

  M = [A11 A21^T; A21 A22],  factor_up_to(t) ->
      [L11 ; L21 = A21 L11^-T ; A22 - L21 L21^T]      (Schur complement)
  factor_up_to(t) then factor_from(t) == factor()
  solve_l_up_to(t):  v -> [L11^-1 v1 ; v2 - L21 L11^-1 v1]
  solve_lt_up_to(t): v -> [L11^-T (v1 - L21^T v2) ; v2]
  solve_l_from(t):   v -> [v1 ; L22^-1 v2]
  solve_lt_from(t):  v -> [v1 ; L22^-T v2]
"""

import numpy as np
import pytest

from baspacho_tpu import BackendType, Settings, create_solver
from baspacho_tpu.testing import SparseMatGenerator, random_spd_data


def maxabs(a):
    a = np.asarray(a)
    return np.max(np.abs(a)) if a.size else 0.0


BACKENDS = [BackendType.REF, BackendType.PLANNED]


def build(seed, n=40, fill=0.06, backend=BackendType.REF):
    gen = SparseMatGenerator.gen_flat(n, fill, seed=seed)
    ss = gen.to_structure()
    rng = np.random.RandomState(seed)
    param_sizes = rng.randint(2, 4, size=ss.order)
    solver = create_solver(Settings(backend=backend), param_sizes, ss)
    assert solver.skel.num_lumps >= 2, "test problem must not fully merge"
    data = random_spd_data(solver.data_size, solver.order, seed + 500)
    data = solver.skel.damp(data, 0.0, solver.order * 1.5)
    return solver, np.asarray(data)


def mid_lump_span(solver):
    """A span index on a lump boundary, around the middle."""
    nl = solver.skel.num_lumps
    return int(solver.skel.lump_to_span[max(1, nl // 2)])


@pytest.mark.parametrize("backend", BACKENDS)
@pytest.mark.parametrize("seed", range(4))
def test_factor_up_to_schur(backend, seed):
    solver, data = build(seed, backend=backend)
    t = mid_lump_span(solver)
    o = solver.span_vector_offset(t)
    m = solver.skel.densify(data, fill_upper_half=True)
    a11, a21, a22 = m[:o, :o], m[o:, :o], m[o:, o:]

    part = solver.skel.densify(np.asarray(solver.factor_up_to(data, t)))
    l11 = np.tril(part[:o, :o])
    l21 = part[o:, :o]
    schur = np.tril(part[o:, o:])

    l11_want = np.linalg.cholesky(a11)
    assert maxabs((l11 - l11_want)) < 1e-9
    l21_want = a21 @ np.linalg.inv(l11_want).T
    assert maxabs((l21 - l21_want)) < 1e-9
    schur_want = np.tril(a22 - l21_want @ l21_want.T)
    # compare only at stored (structurally present) positions
    mask = np.tril(solver.skel.densify(np.ones(solver.data_size))[o:, o:]) != 0
    assert maxabs(((schur - schur_want) * mask)) < 1e-9


@pytest.mark.parametrize("backend", BACKENDS)
@pytest.mark.parametrize("seed", range(4))
def test_factor_up_to_plus_from_equals_full(backend, seed):
    solver, data = build(seed, backend=backend)
    t = mid_lump_span(solver)
    full = np.asarray(solver.factor(data))
    part = solver.factor_from(np.asarray(solver.factor_up_to(data, t)), t)
    assert maxabs((full - np.asarray(part))) < 1e-9


@pytest.mark.parametrize("backend", BACKENDS)
@pytest.mark.parametrize("seed", range(3))
def test_partial_solves(backend, seed):
    solver, data = build(seed, backend=backend)
    t = mid_lump_span(solver)
    o = solver.span_vector_offset(t)
    part = np.asarray(solver.factor_up_to(data, t))
    dense = solver.skel.densify(part)
    l11 = np.tril(dense[:o, :o])
    l21 = dense[o:, :o]

    rng = np.random.RandomState(seed)
    v = rng.rand(solver.order, 2)
    v1, v2 = v[:o], v[o:]

    got = np.asarray(solver.solve_l_up_to(part, t, v))
    want = np.concatenate([np.linalg.solve(l11, v1),
                           v2 - l21 @ np.linalg.solve(l11, v1)])
    assert maxabs((got - want)) < 1e-9

    got = np.asarray(solver.solve_lt_up_to(part, t, v))
    want = np.concatenate([np.linalg.solve(l11.T, v1 - l21.T @ v2), v2])
    assert maxabs((got - want)) < 1e-9

    # factor the bottom for the From solves
    fullf = np.asarray(solver.factor_from(part, t))
    densef = solver.skel.densify(fullf)
    l22 = np.tril(densef[o:, o:])

    got = np.asarray(solver.solve_l_from(fullf, t, v))
    want = np.concatenate([v1, np.linalg.solve(l22, v2)])
    assert maxabs((got - want)) < 1e-9

    got = np.asarray(solver.solve_lt_from(fullf, t, v))
    want = np.concatenate([v1, np.linalg.solve(l22.T, v2)])
    assert maxabs((got - want)) < 1e-9


@pytest.mark.parametrize("backend", BACKENDS)
@pytest.mark.parametrize("seed", range(3))
def test_add_mv_from(backend, seed):
    solver, data = build(seed, backend=backend)
    t = mid_lump_span(solver)
    o = solver.span_vector_offset(t)
    m = solver.skel.densify(data, fill_upper_half=True)
    rng = np.random.RandomState(seed)
    x = rng.rand(solver.order, 2)
    out0 = rng.rand(solver.order, 2)
    alpha = 0.7

    got = np.asarray(solver.add_mv_from(data, t, x, out0, alpha))
    want = out0.copy()
    want[o:] += alpha * (m[o:, o:] @ x[o:])
    assert maxabs((got - want)) < 1e-9

    # corner from 0 = full symmetric matvec
    got = np.asarray(solver.add_mv_from(data, 0, x, out0, alpha))
    want = out0 + alpha * (m @ x)
    assert maxabs((got - want)) < 1e-9


@pytest.mark.parametrize("backend", BACKENDS)
@pytest.mark.parametrize("seed", range(3))
def test_pseudo_factor(backend, seed):
    solver, data = build(seed, backend=backend)
    res = np.asarray(solver.pseudo_factor_from(data, 0))
    acc = solver.internal_accessor()
    sk = solver.skel
    for s in range(sk.num_spans):
        diag = acc.diag_block(data, s)
        l_want = np.linalg.cholesky(np.tril(diag) + np.tril(diag, -1).T)
        l_got = np.tril(acc.diag_block(res, s))
        assert maxabs((l_got - l_want)) < 1e-9
        # blocks below in same column: divided by L^T on the right
        lump = int(sk.span_to_lump[s])
        for ci in range(int(sk.chain_col_ptr[lump]),
                        int(sk.chain_col_ptr[lump + 1])):
            r = int(sk.chain_row_span[ci])
            if r <= s:
                continue
            b_in = acc.block(data, r, s)
            b_want = np.linalg.solve(l_want, b_in.T).T
            b_got = acc.block(res, r, s)
            assert maxabs((b_got - b_want)) < 1e-9
