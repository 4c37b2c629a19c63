#!/usr/bin/env python
"""Round-5 experiment batch on the real chip: measures the costed
scan-fold decision and the level_reorder layout on every affected
family. Prints chained device-slope times (see diag_grid_solve)."""
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def log(*a):
    print(*a, flush=True)


def chain_time(fn, state, ks=(2, 10)):
    import jax
    import jax.numpy as jnp

    @jax.jit
    def chained(s, k):
        def body(i, s):
            return fn(s)
        return jax.lax.fori_loop(0, k, body, s)

    js = {}
    out = chained(state, jnp.asarray(ks[0], jnp.int32))
    float(jax.tree.leaves(out)[0].ravel()[0])
    for k in ks:
        t0 = time.perf_counter()
        out = chained(state, jnp.asarray(k, jnp.int32))
        float(jax.tree.leaves(out)[0].ravel()[0])
        js[k] = time.perf_counter() - t0
    return (js[ks[1]] - js[ks[0]]) / (ks[1] - ks[0])


def bench_one(tag, gen, psize, elim, reorder, do_solve=True, ks=(2, 10)):
    import jax
    import jax.numpy as jnp
    from baspacho_tpu import BackendType, Settings, create_solver
    from baspacho_tpu.testing import random_spd_data
    from baspacho_tpu.utils import with_matmul_precision

    t0 = time.perf_counter()
    solver = create_solver(
        Settings(backend=BackendType.PLANNED, level_reorder=reorder),
        np.asarray(psize), gen.to_structure(),
        sparse_elim_ranges=list(elim))
    t_sym = time.perf_counter() - t0
    be = solver.backend
    data = random_spd_data(solver.data_size, solver.order, 1, np.float32)
    data = np.asarray(solver.skel.damp(data, 0.0, solver.order * 1.5),
                      np.float32)
    jd = jax.device_put(jnp.asarray(data))

    n = solver.skel.num_lumps
    ffn, faux = be.make_factor(0, n)
    faux = tuple(jnp.asarray(a) for a in faux)

    @with_matmul_precision
    def frun(d):
        return ffn(d, faux)

    tf = chain_time(frun, jd, ks)
    line = f"[{tag} reorder={int(reorder)}] sym {t_sym:.2f}s  " \
           f"factor {tf*1e3:.2f} ms"
    ts = None
    if do_solve:
        f = jax.device_put(np.asarray(jax.jit(frun)(jd)))
        rhs = jax.device_put(np.random.RandomState(0).rand(
            solver.order, 1).astype(np.float32))
        sfn, saux = be.make_solve(0, n)
        saux = tuple(jnp.asarray(a) for a in saux)

        @with_matmul_precision
        def srun(v):
            return sfn(f, v, saux)

        ts = chain_time(srun, rhs, ks)
        line += f"  solve {ts*1e3:.2f} ms"
        # accuracy spot check
        if solver.order <= 12000:
            x = np.asarray(jax.jit(srun)(rhs))
            dense = solver.skel.densify(data.astype(np.float64),
                                        fill_upper_half=True)
            want = np.linalg.solve(dense, np.asarray(rhs, np.float64))
            rel = np.abs(x - want).max() / np.abs(want).max()
            line += f"  solve_rel={rel:.1e}"
    log(line)
    return tf, ts


def main():
    import jax
    from baspacho_tpu.testing import SparseMatGenerator as SG

    log(f"devices: {jax.devices()}")
    which = sys.argv[1] if len(sys.argv) > 1 else "all"

    if which in ("all", "grid"):
        for reorder in (False, True):
            bench_one("grid100", SG.gen_grid(100, 100, 0.25, seed=37),
                      np.full(10000, 3), [], reorder)
    if which in ("all", "flat"):
        for reorder in (False, True):
            bench_one("flat1000", SG.gen_flat(1000, 0.1, seed=37),
                      np.full(1000, 3), [], reorder)
    if which in ("all", "meri"):
        gen = SG.gen_meridians(7, 150, 0.2, 10, 20, 2, 2, seed=37)
        for reorder in (False, True):
            bench_one("meri7", gen, np.full(gen.size, 3), [], reorder)
    if which in ("all", "schur"):
        def mkschur():
            g = SG.gen_flat(1000, 0.1, seed=37)
            g.add_schur_set(50000, 0.02)
            return g
        for reorder in (True, False):
            bench_one("flat_schur50k", mkschur(), np.full(51000, 3),
                      [0, 50000], reorder, do_solve=True, ks=(2, 6))
    if which in ("all", "schur5k"):
        def mkschur5():
            g = SG.gen_flat(1000, 0.1, seed=37)
            g.add_schur_set(5000, 0.02)
            return g
        for reorder in (True, False):
            bench_one("flat_schur5k", mkschur5(), np.full(6000, 3),
                      [0, 5000], reorder)


if __name__ == "__main__":
    main()
