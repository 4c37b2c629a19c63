#!/usr/bin/env python
"""Diagnose the flat1000 dense-vs-pairs assembly decision (round-3 task 1).

Builds the flat1000 problem three times — default costing, forced pairs,
forced dense — and times factor+solve for each in ONE process (compiles
through the tunneled platform are slow; batching them amortizes setup).
"""
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def log(*a):
    print(*a, file=sys.stderr, flush=True)


def time_op(fn, n=10, warmup=2):
    for _ in range(warmup):
        res = fn()
    float(np.asarray(res).ravel()[0])
    t0 = time.perf_counter()
    last = None
    for _ in range(n):
        last = fn()
    float(np.asarray(last).ravel()[0])
    return (time.perf_counter() - t0) / n


def main():
    import jax
    from baspacho_tpu import BackendType, Settings, create_solver
    from baspacho_tpu.testing import SparseMatGenerator, random_spd_data

    log(f"devices: {jax.devices()}")
    gen = SparseMatGenerator.gen_flat(1000, 0.1, seed=37)
    psize = np.full(1000, 3)
    ss = gen.to_structure()

    os.environ["BASPACHO_PLAN_DEBUG"] = "1"
    results = {}
    for mode in ["default", "pairs", "dense"]:
        if mode == "default":
            os.environ.pop("BASPACHO_FORCE_ASSEMBLY", None)
        else:
            os.environ["BASPACHO_FORCE_ASSEMBLY"] = mode
        log(f"=== mode={mode} ===")
        t0 = time.perf_counter()
        solver = create_solver(Settings(backend=BackendType.PLANNED),
                               psize, ss, sparse_elim_ranges=[])
        log(f"symbolic: {time.perf_counter() - t0:.2f}s "
            f"lumps={solver.skel.num_lumps} "
            f"levels={solver.backend.num_levels}")
        data = random_spd_data(solver.data_size, solver.order, 1, np.float32)
        data = np.asarray(solver.skel.damp(data, 0.0, solver.order * 1.5),
                          np.float32)
        jd = jax.device_put(data)
        rhs = jax.device_put(np.random.RandomState(0).rand(
            solver.order, 1).astype(np.float32))
        tf = time_op(lambda: solver.factor(jd), n=10)
        f = solver.factor(jd)
        ts = time_op(lambda: solver.solve(f, rhs), n=10)
        log(f"mode={mode}: factor {tf*1e3:.2f} ms  solve {ts*1e3:.2f} ms")
        results[mode] = (tf, ts)
    for mode, (tf, ts) in results.items():
        print(f"{mode}: factor {tf*1e3:.2f} ms  solve {ts*1e3:.2f} ms")


if __name__ == "__main__":
    main()
