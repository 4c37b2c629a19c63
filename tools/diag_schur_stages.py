#!/usr/bin/env python
"""Per-stage device timing of the flat_schur_full factor (round-5: find
where 327 ms - 148 ms modeled goes). Times, via chained device-slope
(two chain lengths, slope cancels dispatch + drain latency):
  * bucket factor alone (potrf/trsm of all level-0 panels),
  * the sg accumulation alone (one-hot placement + triangular syrk),
  * one chunk's y-placement einsum alone vs its us syrk alone,
  * the us syrk at each matmul precision,
  * dense-slice application, level-1 factor.
"""
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def log(*a):
    print(*a, flush=True)


def chain_time(fn, state, ks=(2, 8)):
    """Device time per call: slope between two chain lengths of
    fn-composed-with-itself inside one jit (trip count is a runtime
    operand — ONE compile serves both lengths)."""
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

    schur = int(sys.argv[1]) if len(sys.argv) > 1 else 50000
    log(f"devices: {jax.devices()}  schursize={schur}")
    gen = SparseMatGenerator.gen_flat(1000, 0.1, seed=37)
    gen.add_schur_set(schur, 0.02)
    ss = gen.to_structure()
    psize = np.full(1000 + schur, 3)
    t0 = time.perf_counter()
    solver = create_solver(Settings(backend=BackendType.PLANNED), psize, ss,
                           sparse_elim_ranges=[0, schur])
    log(f"symbolic+plan: {time.perf_counter() - t0:.1f}s")
    be = solver.backend
    sched = be._factor_schedule(0, solver.skel.num_lumps)
    aux_all = []
    max_win = 2
    for lev in sched:
        max_win = max(max_win, be._register_factor_level(lev, aux_all))
    aux_all = tuple(jnp.asarray(a) for a in aux_all)

    data = random_spd_data(solver.data_size, solver.order, 1, np.float32)
    data = np.asarray(solver.skel.damp(data, 0.0, solver.order * 1.5),
                      np.float32)
    ext0 = jnp.concatenate([jnp.asarray(data),
                            jnp.zeros(max_win, jnp.float32)])
    ext0 = jax.device_put(ext0)

    lump_buckets, pair_buckets, ptot, dense = sched[0]

    @with_matmul_precision
    def buckets_only(ext):
        for lb in lump_buckets:
            ext, _ = be._factor_bucket(ext, lb, want_below=True)
        return ext

    t = chain_time(buckets_only, ext0)
    log(f"level0 bucket potrf/trsm: {t*1e3:.2f} ms")

    # full level 0 (buckets + accumulation + slice application)
    @with_matmul_precision
    def level0(ext):
        return be._run_factor_level(ext, sched[0], aux_all)

    t_l0 = chain_time(level0, ext0)
    log(f"level0 full:             {t_l0*1e3:.2f} ms")

    # level 1 on factored data
    ext1 = jax.jit(level0)(ext0)
    ext1 = jax.device_put(np.asarray(ext1))

    @with_matmul_precision
    def level1(ext):
        return be._run_factor_level(ext, sched[1], aux_all)

    t_l1 = chain_time(level1, ext1)
    log(f"level1 (bottom factor):  {t_l1*1e3:.2f} ms")

    if dense is None or dense.get("sg") is None:
        log("no sg level; done")
        return
    sgp = dense["sg"]

    # accumulation alone (state = (ext, U)); mutate U so the chain isn't
    # CSE'd away
    R = dense["R"]
    upr, ulc, urc = dense["u_pads"]
    xs = {}
    ext_b = ext0
    for bi, lb in enumerate(lump_buckets):
        ext_b, x = be._factor_bucket(ext_b, lb, want_below=True)
        if x is not None:
            xs[bi] = x
    xs_c = jax.jit(with_matmul_precision(
        lambda e: [be._factor_bucket(e, lb, want_below=True)[1]
                   for lb in lump_buckets if lb.rp > 0]))(ext0)
    xs_c = [jax.device_put(np.asarray(x)) for x in xs_c]
    keys = [bi for bi, lb in enumerate(lump_buckets) if lb.rp > 0]

    def with_xs(fn):
        def run(args):
            xs_in = dict(zip(keys, args))
            return fn(xs_in)
        return run

    @with_matmul_precision
    def accum_only(args):
        xs_in = dict(zip(keys, args))
        U = jnp.zeros((R + upr, ulc + R + urc), jnp.float32)
        U = be._accum_sg(U, ulc, dense, lump_buckets, xs_in, aux_all)
        # feed U back into x so the loop has a data dependence
        out = []
        for bi, x in zip(keys, args):
            out.append(x + U[0, 0] * 1e-30)
        return out

    t_acc = chain_time(accum_only, xs_c)
    log(f"sg accumulation alone:   {t_acc*1e3:.2f} ms")

    # isolate: one chunk group's placement einsum vs its syrk, at each
    # precision
    (bi, nb, ssub) = max(sgp["groups"],
                         key=lambda k: k[1] * len(sgp["groups"][k]))
    lb = lump_buckets[bi]
    s3, S = sgp["s3"], sgp["S"]
    sc = np.asarray(sgp["maps"][bi])
    ns3p = sc.shape[1]
    x = np.asarray(xs_c[keys.index(bi)])
    nchunks = len(sgp["groups"][(bi, nb, ssub)])
    log(f"probe group: bi={bi} nb={nb} ssub={ssub} ns3p={ns3p} "
        f"cp={lb.cp} chunks={nchunks}")
    xc = jax.device_put(x[:nb].reshape(nb, ns3p, s3, lb.cp)
                        if x.shape[1] == ns3p * s3 else
                        np.pad(x[:nb], ((0, 0), (0, ns3p * s3 - x.shape[1]),
                                        (0, 0))).reshape(nb, ns3p, s3, lb.cp))
    scc = jax.device_put(sc[:nb])

    for prec in ("highest", "high", "default"):
        def y_place(xc):
            with jax.default_matmul_precision(prec):
                ids = jax.lax.broadcasted_iota(jnp.int32, (1, 1, ssub), 2)
                oh = (scc[:, :, None] == ids).astype(xc.dtype)
                y = jnp.einsum("bns,bnic->bsic", oh, xc,
                               preferred_element_type=xc.dtype)
                return y.reshape(nb, ssub * s3, lb.cp) * 1.0000001

        y0 = jax.jit(y_place)(xc)

        def y_loop(y):
            return y_place(xc + y[0, 0, 0] * 1e-30)
        t_y = chain_time(y_loop, y0)

        def syrk_loop(y):
            with jax.default_matmul_precision(prec):
                us = jnp.einsum("bmc,bnc->mn", y, y,
                                preferred_element_type=y.dtype)
                return y + us[0, 0] * 1e-30
        t_s = chain_time(syrk_loop, y0)
        fl = 2.0 * (ssub * s3) ** 2 * nb * lb.cp
        log(f"[{prec}] y-einsum {t_y*1e3:.2f} ms/chunk  "
            f"full-syrk {t_s*1e3:.2f} ms/chunk "
            f"({fl/t_s/1e12:.1f} Tflop/s)  x{nchunks} chunks")


if __name__ == "__main__":
    main()
