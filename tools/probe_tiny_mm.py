#!/usr/bin/env python
"""Micro-probe: batched tiny-contraction matmuls on the MXU.

The factor's hot small-panel ops are (B, rp, cp) @ (B, cp, cp) with
cp=4..16 at B~50k (trsm-as-matmul), and (B, rp, cp) outer products.
Measures: native batched einsum vs a block-diagonal packing that fuses
G=128/cp lumps into one (rp x 128) @ (128 x 128) matmul per group."""
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def log(*a):
    print(*a, flush=True)


def chain_time(fn, state, ks=(2, 16)):
    import jax
    import jax.numpy as jnp

    @jax.jit
    def chained(s, k):
        def body(i, s):
            return fn(s)
        return jax.lax.fori_loop(0, k, body, s)

    out = chained(state, jnp.asarray(ks[0], jnp.int32))
    float(jax.tree.leaves(out)[0].ravel()[0])
    js = {}
    for k in ks:
        t0 = time.perf_counter()
        out = chained(state, jnp.asarray(k, jnp.int32))
        float(jax.tree.leaves(out)[0].ravel()[0])
        js[k] = time.perf_counter() - t0
    return (js[ks[1]] - js[ks[0]]) / (ks[1] - ks[0])


def main():
    import jax
    import jax.numpy as jnp

    log(f"devices: {jax.devices()}")
    rng = np.random.RandomState(0)
    prec = "highest"
    which = sys.argv[1] if len(sys.argv) > 1 else "all"

    for (B, rp, cp) in ([(31673, 64, 4), (17781, 128, 4), (3531, 32, 4)]
                        if which in ("all", "mm") else []):
        below = jax.device_put(rng.rand(B, rp, cp).astype(np.float32))
        linv = jax.device_put(rng.rand(B, cp, cp).astype(np.float32))

        def native(s):
            b, L = s
            with jax.default_matmul_precision(prec):
                x = jnp.einsum("brk,bjk->brj", b, L,
                               preferred_element_type=b.dtype)
            return (x, L)

        t = chain_time(native, (below, linv))
        log(f"trsm-einsum B={B} rp={rp} cp={cp}: native {t*1e3:.2f} ms")

        G = 128 // cp

        def packed(s):
            b, L = s
            Bp = (B + G - 1) // G * G
            pad = Bp - B
            with jax.default_matmul_precision(prec):
                bp = jnp.pad(b, ((0, pad), (0, 0), (0, 0)))
                Lp = jnp.pad(L, ((0, pad), (0, 0), (0, 0)))
                ng = Bp // G
                # block-diagonal (ng, G*cp, G*cp)
                Lg = Lp.reshape(ng, G, cp, cp)
                eye = jnp.eye(G, dtype=b.dtype)
                bd = jnp.einsum("ij,giab->giajb", eye, Lg,
                                preferred_element_type=b.dtype)
                bd = bd.reshape(ng, G * cp, G * cp)
                bg = bp.reshape(ng, G, rp, cp).transpose(0, 2, 1, 3)
                bg = bg.reshape(ng, rp, G * cp)
                xg = jnp.einsum("grk,gjk->grj", bg, bd,
                                preferred_element_type=b.dtype)
                x = xg.reshape(ng, rp, G, cp).transpose(0, 2, 1, 3)
                x = x.reshape(Bp, rp, cp)[:B]
            return (x, L)

        t = chain_time(packed, (below, linv))
        log(f"trsm-einsum B={B} rp={rp} cp={cp}: packed G={G} {t*1e3:.2f} ms")

        def unrolled(s):
            # x[:, :, j] = sum_k below[:, :, k] * Linv[:, j, k] — cp^2
            # broadcast FMAs on (B, rp) vectors, no batched-dot lowering
            b, L = s
            cols = []
            for j in range(cp):
                acc = b[:, :, 0] * L[:, j, 0][:, None]
                for k in range(1, cp):
                    acc = acc + b[:, :, k] * L[:, j, k][:, None]
                cols.append(acc)
            x = jnp.stack(cols, axis=-1)
            return (x, L)

        t = chain_time(unrolled, (below, linv))
        log(f"trsm-einsum B={B} rp={rp} cp={cp}: unrolled-VPU {t*1e3:.2f} ms")

        # outer product (pair-mode syge): brk,bsk->brs
        def outer(s):
            b, L = s
            with jax.default_matmul_precision(prec):
                p = jnp.einsum("brk,bsk->brs", b, b,
                               preferred_element_type=b.dtype)
            return (b + p[:, :1, :1] * 1e-30, L)

        t = chain_time(outer, (below, linv))
        log(f"syge-outer  B={B} rp={rp} cp={cp}: native {t*1e3:.2f} ms")

    # unrolled chol+inv cost at schur scale
    for (B, cp) in ([(31673, 4), (17781, 4)]
                    if which in ("all", "mm") else []):
        A = rng.rand(B, cp, cp).astype(np.float32)
        A = A @ A.transpose(0, 2, 1) + 3 * np.eye(cp, dtype=np.float32)
        Aj = jax.device_put(A)
        from baspacho_tpu.ops.planned_backend import PlannedBackend

        def cholinv(a):
            L = PlannedBackend._unrolled_chol(None, a)
            M = PlannedBackend._unrolled_lower_inv(None, L)
            return a + (L[:, :1, :1] + M[:, :1, :1]) * 1e-30

        t = chain_time(cholinv, Aj)
        log(f"unrolled chol+inv B={B} cp={cp}: {t*1e3:.2f} ms")

    # panel IO: non-contiguous whole-panel gather+scatter (the level-0
    # bucket read/write when lumps of one shape interleave with others)
    # vs one contiguous slice (level_reorder=True layout)
    N = 32 << 20
    ext = jax.device_put(rng.rand(N).astype(np.float32))
    for (B, h, cp) in [(31673, 68, 4), (17781, 132, 4)]:
        sz = h * cp
        cand = np.arange(0, N - sz, sz * 2, dtype=np.int64)
        off = np.sort(rng.choice(cand, B, replace=False)).astype(np.int32)
        offj = jax.device_put(off)
        gnums = jax.lax.GatherDimensionNumbers(
            offset_dims=(1,), collapsed_slice_dims=(),
            start_index_map=(0,))
        dnums = jax.lax.ScatterDimensionNumbers(
            update_window_dims=(1,), inserted_window_dims=(),
            scatter_dims_to_operand_dims=(0,))

        def rw(e):
            flat = jax.lax.gather(e, offj[:, None], gnums,
                                  slice_sizes=(sz,))
            flat = flat * 1.0000001
            return jax.lax.scatter(e, offj[:, None], flat, dnums,
                                   indices_are_sorted=True,
                                   unique_indices=True)

        t = chain_time(rw, ext)
        log(f"panel gather+scatter B={B} {sz*4}B/panel: {t*1e3:.2f} ms")

        def rw_slice(e):
            flat = jax.lax.dynamic_slice_in_dim(e, 0, B * sz)
            flat = flat * 1.0000001
            return jax.lax.dynamic_update_slice_in_dim(e, flat, 0, axis=0)

        t = chain_time(rw_slice, ext)
        log(f"panel slice rw     B={B} {sz*4}B/panel: {t*1e3:.2f} ms")


if __name__ == "__main__":
    main()
