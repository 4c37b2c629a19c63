#!/usr/bin/env python
"""Micro-sweep of the flat_schur_full U-accumulation syrk variants.

Shape: U (R x R), R=3000 (S=1000 spans of s3=3); K = 50k landmarks of
cp columns each, chunked nb at a time. Sweeps: chunk width nb, matmul
precision, cp=4 (padded) vs cp=3 (compacted via transpose), triangular
block count T, and the y-placement einsum cost. Each timing is a
chained device-slope (dispatch + drain latency cancel)."""
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def log(*a):
    print(*a, flush=True)


def chain_time(fn, state, ks=(2, 6)):
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

    R, s3, S = 3000, 3, 1000
    B, ns3p, cp = 50000, 20, 4

    # x panels as produced by the bucket factor: (B, ns3p, s3, cp)
    x4 = jax.device_put(rng.rand(B, ns3p, s3, cp).astype(np.float32))
    sc = jax.device_put(
        np.sort(rng.randint(0, S, (B, ns3p)).astype(np.int32), axis=1))

    def tri_bounds(T):
        Sb = -(-S // T)
        return [(k * Sb * s3, min((k + 1) * Sb, S) * s3) for k in range(T)
                if k * Sb < S]

    for nb in (512, 1024, 2048):
        nchunks = B // nb
        for prec, T, comp in [("highest", 4, False), ("high", 4, False),
                              ("high", 4, True), ("high", 8, True),
                              ("default", 4, True), ("high", 1, True),
                              ("highest", 4, True)]:
            tri = tri_bounds(T)

            def step(carry, prec=prec, tri=tri, comp=comp, nb=nb):
                U, b0 = carry
                xc = jax.lax.dynamic_slice_in_dim(x4, b0, nb)
                scc = jax.lax.dynamic_slice_in_dim(sc, b0, nb)
                with jax.default_matmul_precision(prec):
                    ids = jax.lax.broadcasted_iota(jnp.int32, (1, 1, S), 2)
                    oh = (scc[:, :, None] == ids).astype(xc.dtype)
                    y = jnp.einsum("bns,bnic->bsic", oh, xc,
                                   preferred_element_type=xc.dtype)
                    if comp:
                        # compact K: (nb, S*s3, 3) -> (S*s3, nb*3)
                        ym = y[..., :3].reshape(nb, S * s3, 3)
                        ym = ym.transpose(1, 0, 2).reshape(S * s3, nb * 3)
                        for ai, (a0, a1) in enumerate(tri):
                            for (c0, c1) in tri[:ai + 1]:
                                us = jnp.einsum(
                                    "mk,nk->mn", ym[a0:a1], ym[c0:c1],
                                    preferred_element_type=xc.dtype)
                                U = U.at[a0:a1, c0:c1].add(us)
                    else:
                        ym = y.reshape(nb, S * s3, cp)
                        for ai, (a0, a1) in enumerate(tri):
                            for (c0, c1) in tri[:ai + 1]:
                                us = jnp.einsum(
                                    "bmc,bnc->mn", ym[:, a0:a1],
                                    ym[:, c0:c1],
                                    preferred_element_type=xc.dtype)
                                U = U.at[a0:a1, c0:c1].add(us)
                return (U, b0 + nb)

            def level(U):
                (U, _), = [jax.lax.fori_loop(
                    0, nchunks, lambda i, c: step(c), (U, 0))]
                return U

            U0 = jnp.zeros((R, R), jnp.float32)
            t = chain_time(level, U0)
            kf = 3 if comp else cp
            fl = 2.0 * R * R * B * kf * (len(tri_bounds(T)) + 1) / \
                (2.0 * len(tri_bounds(T)))
            log(f"nb={nb:5d} prec={prec:7s} T={T} comp={int(comp)}: "
                f"{t*1e3:7.2f} ms  ({fl/t/1e12:5.1f} Tflop/s eff)")
        # y-placement alone at this nb
        def yonly(carry):
            acc, b0 = carry
            xc = jax.lax.dynamic_slice_in_dim(x4, b0, nb)
            scc = jax.lax.dynamic_slice_in_dim(sc, b0, nb)
            with jax.default_matmul_precision("highest"):
                ids = jax.lax.broadcasted_iota(jnp.int32, (1, 1, S), 2)
                oh = (scc[:, :, None] == ids).astype(xc.dtype)
                y = jnp.einsum("bns,bnic->bsic", oh, xc,
                               preferred_element_type=xc.dtype)
            return (acc + y.sum(), b0 + nb)

        def ylevel(acc):
            out = jax.lax.fori_loop(0, nchunks, lambda i, c: yonly(c),
                                    (acc, 0))
            return out[0]

        t = chain_time(ylevel, jnp.zeros((), jnp.float32))
        log(f"nb={nb:5d} y-placement all chunks: {t*1e3:7.2f} ms")


if __name__ == "__main__":
    main()
