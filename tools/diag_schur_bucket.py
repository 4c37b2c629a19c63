#!/usr/bin/env python
"""Stage-by-stage device timing inside _factor_bucket for the
flat_schur_full level-0 buckets: read gather, unrolled chol, lower inv,
below-trsm einsum, embed+concat, write scatter. Finds where the 212 ms
level-0 panel factor goes (round-5 task 2)."""
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def log(*a):
    print(*a, flush=True)


def chain_time(fn, state, ks=(2, 8)):
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
    solver = create_solver(Settings(backend=BackendType.PLANNED), psize, ss,
                           sparse_elim_ranges=[0, schur])
    be = solver.backend
    sched = be._factor_schedule(0, solver.skel.num_lumps)
    lump_buckets, pair_buckets, ptot, dense = sched[0]

    data = random_spd_data(solver.data_size, solver.order, 1, np.float32)
    data = np.asarray(solver.skel.damp(data, 0.0, solver.order * 1.5),
                      np.float32)
    ext0 = jax.device_put(jnp.asarray(data))

    def feed(ext, vals):
        # tie vals back into ext so chained iterations don't CSE away
        s = 0.0
        for v in vals:
            s = s + v.ravel()[0] * 1e-30
        return ext + s

    for bi, lb in enumerate(lump_buckets):
        B = len(lb.off)
        if B < 100:
            continue
        log(f"--- bucket {bi}: B={B} cp={lb.cp} rp={lb.rp} "
            f"contig={lb.contiguous}")

        @with_matmul_precision
        def read_only(ext, lb=lb):
            p = be._read_panels(ext, lb)
            return feed(ext, [p])

        log(f"  read_panels:       {chain_time(read_only, ext0)*1e3:7.2f} ms")

        @with_matmul_precision
        def read_chol(ext, lb=lb):
            p = be._read_panels(ext, lb)
            pad_eye = be._pad_eye(lb.cols, lb.cp, ext.dtype)
            L = be._unrolled_chol(p[:, :lb.cp] + pad_eye)
            return feed(ext, [L])

        log(f"  + unrolled chol:   {chain_time(read_chol, ext0)*1e3:7.2f} ms")

        @with_matmul_precision
        def read_chol_inv(ext, lb=lb):
            p = be._read_panels(ext, lb)
            pad_eye = be._pad_eye(lb.cols, lb.cp, ext.dtype)
            L = be._unrolled_chol(p[:, :lb.cp] + pad_eye)
            Linv = be._unrolled_lower_inv(L)
            return feed(ext, [L, Linv])

        log(f"  + lower inv:       "
            f"{chain_time(read_chol_inv, ext0)*1e3:7.2f} ms")

        @with_matmul_precision
        def thru_x(ext, lb=lb):
            p = be._read_panels(ext, lb)
            pad_eye = be._pad_eye(lb.cols, lb.cp, ext.dtype)
            L = be._unrolled_chol(p[:, :lb.cp] + pad_eye)
            Linv = be._unrolled_lower_inv(L)
            x = jnp.einsum("brk,bjk->brj", p[:, lb.cp:], Linv,
                           preferred_element_type=ext.dtype)
            return feed(ext, [L, x])

        log(f"  + below x einsum:  {chain_time(thru_x, ext0)*1e3:7.2f} ms")

        @with_matmul_precision
        def full(ext, lb=lb):
            ext, x = be._factor_bucket(ext, lb, want_below=True)
            return feed(ext, [x])

        log(f"  full bucket:       {chain_time(full, ext0)*1e3:7.2f} ms")


if __name__ == "__main__":
    main()
