"""On-device accuracy slice (run: `pytest -m tpu tests/`, NO env scrub —
the ambient platform must provide the real TPU chip).

The CPU suite asserts numerics under float64 where MXU rounding does not
exist; this slice asserts the f32 accuracy contract where the rounding
actually happens: factor + stored-inverse solve on the MXU at the
library's "highest" matmul precision (reference float epsilons:
tests/FactorTest.cpp:30-41 uses 1e-7..4e-5 for float)."""

import numpy as np
import pytest

pytestmark = pytest.mark.tpu


@pytest.fixture(scope="module")
def tpu_ready():
    import jax
    d = jax.devices()[0]
    if "tpu" not in (d.device_kind or "").lower() and \
            d.platform not in ("tpu", "axon"):
        pytest.skip(f"no TPU device (got {d})")
    return d


def _build(gen, psize, elim=()):
    from baspacho_tpu import BackendType, Settings, create_solver
    from baspacho_tpu.testing import random_spd_data

    solver = create_solver(Settings(backend=BackendType.PLANNED),
                           np.asarray(psize), gen.to_structure(),
                           sparse_elim_ranges=list(elim))
    data = np.asarray(random_spd_data(solver.data_size, solver.order, 5,
                                      np.float32))
    data = np.asarray(solver.skel.damp(data, 0.0, solver.order * 1.5),
                      np.float32)
    return solver, data


CASES = {
    "flat": lambda SG: (SG.gen_flat(40, 0.15, seed=3), np.full(40, 3), ()),
    "schur": lambda SG: (_schur(SG)),
}


def _schur(SG):
    gen = SG.gen_flat(40, 0.1, seed=11)
    gen.add_schur_set(500, 0.03)
    return gen, np.full(540, 2), (0, 500)


@pytest.mark.parametrize("case", sorted(CASES))
def test_factor_solve_oracle_on_device(tpu_ready, case):
    """factor residual + stored-inverse solve vs the float64 host dense
    oracle, computed on the real chip at f32/MXU precision."""
    from baspacho_tpu.testing import SparseMatGenerator

    gen, psize, elim = CASES[case](SparseMatGenerator)
    solver, data = _build(gen, psize, elim)
    f = np.asarray(solver.factor(data))
    assert np.all(np.isfinite(f))

    dense = solver.skel.densify(data.astype(np.float64),
                                fill_upper_half=True)
    L = np.tril(solver.skel.densify(f.astype(np.float64)))
    rel = np.abs(L @ L.T - dense).max() / np.abs(dense).max()
    assert rel < 4e-5, f"factor residual {rel:.3e}"

    rhs = np.random.RandomState(3).rand(solver.order, 2).astype(np.float32)
    x = np.asarray(solver.solve(solver.factor(data), rhs))
    want = np.linalg.solve(dense, rhs.astype(np.float64))
    rel_x = np.abs(x - want).max() / np.abs(want).max()
    assert rel_x < 4e-5, f"solve rel err {rel_x:.3e}"


def test_batched_vmap_parity_on_device(tpu_ready):
    """Batched factor matches per-matrix factor bitwise on the chip (one
    instruction stream, N data streams — the reference batched contract,
    BatchedCudaFactorTest.cpp)."""
    import jax.numpy as jnp
    from baspacho_tpu.testing import SparseMatGenerator

    gen, psize, elim = CASES["flat"](SparseMatGenerator)
    solver, data = _build(gen, psize, elim)
    datas = np.stack([data * (1.0 + 0.01 * b) for b in range(4)])
    fb = np.asarray(solver.factor(jnp.asarray(datas)))
    for b in range(4):
        dense = solver.skel.densify(datas[b].astype(np.float64),
                                    fill_upper_half=True)
        L = np.tril(solver.skel.densify(fb[b].astype(np.float64)))
        rel = np.abs(L @ L.T - dense).max() / np.abs(dense).max()
        assert rel < 4e-5, (b, rel)
