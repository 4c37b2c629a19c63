#!/usr/bin/env python
"""End-to-end calibration of the merge heuristic's cost-model scale.

The per-op polynomial ComputationModel drives supernode merging
(elimination_tree.compute_merges — the reference's cost-model loop,
EliminationTree.cpp:182-293). On this backend same-shape supernodes run
BATCHED, so the honest per-op constants understate the real marginal cost
of an extra supernode (a new shape = a new XLA op + level scheduling);
the net effect is that the best-performing model constants are an
end-to-end question, not a micro-timing one.

This tool measures factor+solve wall time across problem families for a
sweep of constant-term scales, interleaved within one device session so
tunnel-latency windows hit all configs equally. Output picks the scale
with the best geometric-mean factor ratio vs scale=1.
"""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def log(*a):
    print(*a, flush=True)


def time_op(fn, min_window=0.3, max_reps=400):
    res = fn()
    float(np.asarray(res).ravel()[0])
    n = 4
    while True:
        t0 = time.perf_counter()
        for _ in range(n):
            res = fn()
        float(np.asarray(res).ravel()[0])
        tot = time.perf_counter() - t0
        if tot >= min_window or n >= max_reps:
            return tot / n
        n = min(max_reps, max(n * 2,
                              int(np.ceil(n * min_window / max(tot, 1e-6)))))


def main():
    import jax
    from baspacho_tpu import BackendType, Settings, create_solver
    from baspacho_tpu.computation_model import (ComputationModel,
                                                model_tpu_v5e_default as M)
    from baspacho_tpu.testing import SparseMatGenerator, random_spd_data

    log(f"devices: {jax.devices()}")

    def scaled(sc):
        return ComputationModel(
            potrf_params=M.potrf_params * [sc, 1, 1, 1],
            trsm_params=M.trsm_params * [sc, 1, 1, 1, 1, 1],
            syge_params=M.syge_params * [sc, 1, 1, 1, 1, 1],
            asmbl_params=M.asmbl_params * [sc, 1, 1, 1])

    def p_flat1000():
        return (SparseMatGenerator.gen_flat(1000, 0.1, seed=37),
                np.full(1000, 3), [])

    def p_grid():
        return (SparseMatGenerator.gen_grid(100, 100, 0.25, seed=37),
                np.full(10000, 2), [])

    def p_schur():
        gen = SparseMatGenerator.gen_flat(1000, 0.1, seed=37)
        gen.add_schur_set(5000, 0.02)
        return gen, np.full(6000, 3), [0, 5000]

    def p_meri():
        gen = SparseMatGenerator.gen_meridians(7, 150, 0.2, 10, 20, 2, 2,
                                               seed=37)
        return gen, np.full(gen.size, 3), []

    problems = {"flat1000": p_flat1000, "grid100": p_grid,
                "schur5k": p_schur, "meri7": p_meri}
    scales = [float(s) for s in
              os.environ.get("CAL_SCALES", "1,4,16,64").split(",")]

    # build all solvers + inputs up front (symbolic is host-only)
    setups = {}
    for pname, make in problems.items():
        gen, psize, elim = make()
        ss = gen.to_structure()
        for sc in scales:
            t0 = time.perf_counter()
            solver = create_solver(
                Settings(backend=BackendType.PLANNED,
                         computation_model=scaled(sc)),
                psize, ss, sparse_elim_ranges=elim)
            data = random_spd_data(solver.data_size, solver.order, 1,
                                   np.float32)
            data = np.asarray(solver.skel.damp(data, 0.0,
                                               solver.order * 1.5),
                              np.float32)
            jd = jax.device_put(data)
            rhs = jax.device_put(np.random.RandomState(0).rand(
                solver.order, 1).astype(np.float32))
            setups[(pname, sc)] = (solver, jd, rhs)
            log(f"[{pname} sc={sc:g}] symbolic {time.perf_counter()-t0:.2f}s"
                f" lumps={solver.skel.num_lumps}"
                f" levels={solver.backend.num_levels}"
                f" dataSize={solver.data_size}")

    # warm every jit once (compiles through the relay are slow; do them
    # all before any timing so windows stay comparable)
    for (pname, sc), (solver, jd, rhs) in setups.items():
        t0 = time.perf_counter()
        f = solver.factor(jd)
        solver.solve(f, rhs).block_until_ready()
        log(f"[{pname} sc={sc:g}] compiled in {time.perf_counter()-t0:.1f}s")

    results = {}
    trials = int(os.environ.get("CAL_TRIALS", "3"))
    for trial in range(trials):
        for (pname, sc), (solver, jd, rhs) in setups.items():
            tf = time_op(lambda: solver.factor(jd))
            f = solver.factor(jd)
            ts = time_op(lambda: solver.solve(f, rhs))
            results.setdefault((pname, sc), []).append((tf, ts))
            log(f"t{trial} [{pname:9s} sc={sc:4g}] "
                f"factor {tf*1e3:8.2f} ms  solve {ts*1e3:7.2f} ms")

    log("\n=== best-of-trials summary (factor ms / solve ms) ===")
    for pname in problems:
        row = []
        for sc in scales:
            r = results[(pname, sc)]
            row.append(f"sc={sc:g}: {min(t for t, _ in r)*1e3:8.2f}"
                       f" /{min(s for _, s in r)*1e3:7.2f}")
        log(f"{pname:9s} " + "  ".join(row))
    log("\ngeomean factor ratio vs sc=1:")
    base = {p: min(t for t, _ in results[(p, scales[0])]) for p in problems}
    for sc in scales:
        rat = [min(t for t, _ in results[(p, sc)]) / base[p]
               for p in problems]
        log(f"  sc={sc:4g}: {float(np.exp(np.mean(np.log(rat)))):.3f}")


if __name__ == "__main__":
    main()
