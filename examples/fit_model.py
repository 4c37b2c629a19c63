#!/usr/bin/env python
"""Computation-model fitting demo (reference examples/OptimizeCompModel.cpp):
profiles per-op timings of the planned factor schedule on the current
device and least-squares fits the polynomial cost models used by the
supernode-merge heuristic (see also tools/fit_computation_model.py)."""
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np

from baspacho_tpu import BackendType, Settings, create_solver
from baspacho_tpu.stats import fit_computation_model, profile_factor
from baspacho_tpu.testing import SparseMatGenerator, random_spd_data


def main():
    gen = SparseMatGenerator.gen_flat(300, 0.05, seed=37)
    ss = gen.to_structure()
    solver = create_solver(Settings(backend=BackendType.PLANNED),
                           np.full(ss.order, 3), ss)
    data = random_spd_data(solver.data_size, solver.order, 0, np.float32)
    data = np.asarray(solver.skel.damp(data, 0.0, solver.order * 1.5),
                      dtype=np.float32)
    records = profile_factor(solver, data, reps=3)
    for r in records[:10]:
        print(f"{r[0]:6s} {r[1]:5d} {r[2]:7d} {r[3]:5d} {r[4]*1e3:8.3f} ms")
    cm = fit_computation_model(records)
    print("potrf:", cm.potrf_params)
    print("trsm: ", cm.trsm_params)
    print("syge: ", cm.syge_params)
    print("asmbl:", cm.asmbl_params)


if __name__ == "__main__":
    main()
