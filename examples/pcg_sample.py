#!/usr/bin/env python
"""Mixed direct/iterative solve demo (reference examples/PCG_Sample.cpp):
partially factor up to the auto-detected elimination boundary, then solve
the reduced system with PCG under a selectable preconditioner, verifying
the residual with the solver's block mat-vec."""
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax.numpy as jnp
import numpy as np

from baspacho_tpu import BackendType, Settings, create_solver
from baspacho_tpu.optimizer import (BlockGaussSeidelPrecond,
                                    BlockJacobiPrecond, pcg)
from baspacho_tpu.testing import SparseMatGenerator, random_spd_data


def main(precond_name="jacobi"):
    gen = SparseMatGenerator.gen_flat(20, 0.3, seed=42)
    gen.add_schur_set(80, 0.1)
    ss = gen.to_structure()
    solver = create_solver(Settings(), np.full(ss.order, 3), ss,
                           sparse_elim_ranges=[0, 80])
    data = random_spd_data(solver.data_size, solver.order, 7)
    data = jnp.asarray(solver.skel.damp(data, 0.0, solver.order * 1.5))
    rhs = np.random.RandomState(0).rand(solver.order)

    t = solver.sparse_elim_ranges[-1]
    o = solver.span_vector_offset(t)
    part = solver.factor_up_to(data, t)
    v = solver.solve_l_up_to(part, t, jnp.asarray(rhs))

    cls = {"jacobi": BlockJacobiPrecond,
           "gauss_seidel": BlockGaussSeidelPrecond}[precond_name]
    precond = cls(solver, t)
    precond.init(part)

    def apply_inv_m(x):
        full = jnp.zeros_like(v).at[o:].set(x)
        return precond.apply(full)[o:]

    def apply_a(x):
        full = jnp.zeros_like(v).at[o:].set(x)
        return solver.add_mv_from(part, t, full, jnp.zeros_like(full))[o:]

    x, r2, iters = pcg(apply_inv_m, apply_a, v[o:], 1e-10, 100)
    v = v.at[o:].set(x)
    sol = solver.solve_lt_up_to(part, t, v)

    # residual check against the full matrix
    mv = solver.add_mv_from(data, 0, sol, jnp.zeros_like(sol))
    resid = float(jnp.max(jnp.abs(mv - jnp.asarray(rhs))))
    print(f"PCG iters={int(iters)}  residual={resid:.3e}")


if __name__ == "__main__":
    main(sys.argv[1] if len(sys.argv) > 1 else "jacobi")
