#!/usr/bin/env python
"""Per-variant device timing of the grid solve (round-5: 51 ms -> <=10).

Times, via chained device-slope:
  * fused make_solve as shipped,
  * fused make_solve with scan folding disabled (instance SCAN_CP_MAX=0),
  * a gather-only pass (all levels' panel reads, no scatters),
  * a scatter-only pass (the vv updates with dummy values),
so the scatter-vs-gather-vs-op-overhead split of the 51 ms is measured,
not modeled."""
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def log(*a):
    print(*a, flush=True)


def chain_time(fn, state, ks=(2, 10)):
    """Trip count is a runtime operand — ONE compile serves both chain
    lengths."""
    import jax
    import jax.numpy as jnp

    @jax.jit
    def chained(s, k):
        def body(i, s):
            return fn(s)
        return jax.lax.fori_loop(0, k, body, s)

    js = {}
    out = chained(state, jnp.asarray(ks[0], jnp.int32))
    float(jax.tree.leaves(out)[0].ravel()[0])  # compile+warm
    for k in ks:
        t0 = time.perf_counter()
        out = chained(state, jnp.asarray(k, jnp.int32))
        float(jax.tree.leaves(out)[0].ravel()[0])
        js[k] = time.perf_counter() - t0
    return (js[ks[1]] - js[ks[0]]) / (ks[1] - ks[0])


def main():
    import jax
    import jax.numpy as jnp
    from baspacho_tpu import BackendType, Settings, create_solver
    from baspacho_tpu.testing import SparseMatGenerator, random_spd_data
    from baspacho_tpu.utils import with_matmul_precision

    w = int(sys.argv[1]) if len(sys.argv) > 1 else 100
    log(f"devices: {jax.devices()}  grid {w}x{w}")
    gen = SparseMatGenerator.gen_grid(w, w, 0.25, seed=42)
    ss = gen.to_structure()
    psize = np.full(w * w, 3)
    solver = create_solver(Settings(backend=BackendType.PLANNED), psize, ss)
    be = solver.backend
    data = random_spd_data(solver.data_size, solver.order, 1, np.float32)
    data = np.asarray(solver.skel.damp(data, 0.0, solver.order * 1.5),
                      np.float32)
    f = np.asarray(solver.factor(jax.device_put(data)))
    rhs = np.random.RandomState(0).rand(solver.order, 1).astype(np.float32)

    fj = jax.device_put(jnp.asarray(f))
    vj = jax.device_put(jnp.asarray(rhs))

    def time_solve(tag):
        fn, aux = be.make_solve(0, solver.skel.num_lumps)
        aux = tuple(jnp.asarray(a) for a in aux)

        @with_matmul_precision
        def run(v):
            return fn(fj, v, aux)

        t = chain_time(run, vj)
        log(f"{tag}: {t*1e3:.2f} ms")
        return t

    time_solve("fused solve (shipped)")

    # variant: no scan folding
    be.SCAN_CP_MAX = 0
    time_solve("fused solve, scans OFF ")
    be.SCAN_CP_MAX = type(be).SCAN_CP_MAX

    # decompose: gathers only / scatters only over the unfused schedule
    sched = be._solve_schedule(0, solver.skel.num_lumps)
    aux_np = be._solve_aux(sched)
    aux = tuple(jnp.asarray(a) for a in aux_np)
    order = solver.skel.order
    ext = jnp.concatenate([fj, jnp.zeros(2, fj.dtype)])
    ext = jax.device_put(ext)

    def gathers_only(vv):
        acc = vv[0, 0]
        for buckets in sched:
            for sb in buckets:
                panels = be._read_panels(ext, sb)
                acc = acc + panels[0, 0, 0]
        return vv + acc * 1e-30

    vv0 = jnp.concatenate([vj, jnp.zeros((1, 1), vj.dtype)])
    t = chain_time(gathers_only, vv0)
    log(f"panel gathers only (1 pass): {t*1e3:.2f} ms")

    def scatters_only(vv):
        for buckets in sched:
            for sb in buckets:
                xidx = be._bucket_xidx(sb, order)
                x = vv[xidx]
                if sb.rp > 0:
                    bidx = aux[sb.aux_slot]
                    y = jnp.broadcast_to(x[:, :1] * 1e-30,
                                         (len(sb.off), sb.rp, vv.shape[1]))
                    idx = jnp.concatenate([xidx, bidx], axis=1)
                    upd = jnp.concatenate([x * 1e-30, y], axis=1)
                    vv = vv.at[idx].add(upd)
                else:
                    vv = vv.at[xidx].set(x * (1 + 1e-30))
        return vv

    t = chain_time(scatters_only, vv0)
    log(f"rhs gathers+scatters only (1 pass): {t*1e3:.2f} ms")

    # per-scan-group step cost of the shipped program
    n_rows = sum(len(lb.off) * (lb.cp + lb.rp) for bs in sched for lb in bs)
    log(f"total panel rows (1 pass): {n_rows}")


if __name__ == "__main__":
    main()
