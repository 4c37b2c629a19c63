#!/usr/bin/env python
"""Diagnose the FLAT+SCHUR factor cost split (round-4: beat the reference
CUDA 117 ms on schursize=50000).

Times, in one process (compiles are slow through the relay):
  * factor_up_to(elim boundary): the level-0 sparse elimination alone
    (50k tiny panels + their Schur update into the bottom),
  * full factor,
  * solve stages.
Prints plan decisions (BASPACHO_PLAN_DEBUG)."""
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.environ["BASPACHO_PLAN_DEBUG"] = "1"


def log(*a):
    print(*a, flush=True)


def time_op(fn, n=6, warmup=2):
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

    schur = int(sys.argv[1]) if len(sys.argv) > 1 else 50000
    log(f"devices: {jax.devices()}  schursize={schur}")
    gen = SparseMatGenerator.gen_flat(1000, 0.1, seed=37)
    gen.add_schur_set(schur, 0.02)
    ss = gen.to_structure()
    psize = np.full(1000 + schur, 3)

    t0 = time.perf_counter()
    solver = create_solver(Settings(backend=BackendType.PLANNED), psize, ss,
                           sparse_elim_ranges=[0, schur])
    log(f"symbolic: {time.perf_counter() - t0:.2f}s "
        f"lumps={solver.skel.num_lumps} levels={solver.backend.num_levels}")

    data = random_spd_data(solver.data_size, solver.order, 1, np.float32)
    data = np.asarray(solver.skel.damp(data, 0.0, solver.order * 1.5),
                      np.float32)
    jd = jax.device_put(data)
    rhs = jax.device_put(np.random.RandomState(0).rand(
        solver.order, 1).astype(np.float32))

    t_elim = time_op(lambda: solver.factor_up_to(jd, schur))
    log(f"factor_up_to(elim): {t_elim*1e3:.2f} ms")
    t_full = time_op(lambda: solver.factor(jd))
    log(f"factor full:        {t_full*1e3:.2f} ms "
        f"(bottom+update = {((t_full - t_elim)*1e3):.2f} ms)")
    f = solver.factor(jd)
    ts = time_op(lambda: solver.solve(f, rhs))
    log(f"solve(1):           {ts*1e3:.2f} ms")


if __name__ == "__main__":
    main()
