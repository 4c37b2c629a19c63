#!/usr/bin/env python
"""Measure the batched-regime cost-evaluator constants on the ambient
device (computation_model.BatchedRegimeParams).

The planned backend executes a factorization as a SEQUENTIAL chain of
batched XLA ops (one per shape bucket per level, plus per-level
update/assembly ops). In the op-overhead-bound regime its wall time is

    num_sequential_ops * C_DISPATCH + flops / rate

so the two constants that matter are (1) the per-op cost of a chained
small op INSIDE one compiled program (scheduling + HBM round-trip of a
small operand — not Python dispatch; everything is one jit) and (2) the
effective matmul rate at the panel shapes the backend emits.

Measures:
  * chain slope: jit programs of k dependent small ops (gather->update->
    scatter rounds on a large buffer, the factor's actual dependence
    pattern, fenced with optimization_barrier like the backend's level
    chain) for k in {8..256}; least-squares slope over k = C_DISPATCH.
  * per-bucket op cost: one (cholesky + triangular_solve + syrk) round
    at bucket shapes, minus flop time = ops-per-bucket estimate.
  * matmul rate: f32-highest einsum sweep at (s, r) panel shapes from
    (32, 256) to (2048, 4096).

Usage:  python tools/measure_dispatch.py
Prints a BatchedRegimeParams(...) literal to paste into
computation_model.py. Results from the 2026-08-19 v5e run are recorded
in the docstring of `batched_regime_v5e`.
"""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def log(*a):
    print(*a, flush=True)


def timed(fn, *args, min_window=0.3, max_reps=400):
    import jax
    out = fn(*args)
    jax.block_until_ready(out)
    n = 4
    while True:
        t0 = time.perf_counter()
        for _ in range(n):
            out = fn(*args)
        jax.block_until_ready(out)
        tot = time.perf_counter() - t0
        if tot >= min_window or n >= max_reps:
            return tot / n
        n = min(max_reps,
                max(n * 2, int(np.ceil(n * min_window / max(tot, 1e-6)))))


def measure_chain_slope():
    """Per-op cost of a chained small gather->compute->scatter round
    inside ONE jitted program — the factor's sequential skeleton."""
    import jax
    import jax.numpy as jnp

    rng = np.random.RandomState(0)
    N = 4_000_000
    buf = jnp.asarray(rng.rand(N).astype(np.float32))
    # each round: gather a 64x64 panel, small matmul, scatter back
    offs = rng.randint(0, N - 64 * 64, 512).astype(np.int32)
    offs_j = jnp.asarray(offs)

    def make_chain(k):
        @jax.jit
        def chain(buf):
            b = buf
            for i in range(k):
                off = offs_j[i]
                idx = off + jnp.arange(64 * 64, dtype=jnp.int32)
                p = b[idx].reshape(64, 64)
                p = p @ p * 1e-6 + p
                b = b.at[idx].set(p.reshape(-1))
                b = jax.lax.optimization_barrier(b)
            return b
        return chain

    ks, ts = [], []
    for k in (8, 32, 96, 256):
        t = timed(make_chain(k), buf)
        log(f"  chain k={k:4d}: {t*1e6:9.1f} us  ({t/k*1e6:6.2f} us/op)")
        ks.append(k)
        ts.append(t)
    slope = np.polyfit(ks, ts, 1)[0]
    log(f"  chain slope (C_DISPATCH): {slope*1e6:.2f} us/op")
    return float(slope)


def measure_matmul_rate():
    """Effective f32-highest flop rate at backend panel shapes."""
    import jax
    import jax.numpy as jnp

    rng = np.random.RandomState(1)
    rates = {}
    with jax.default_matmul_precision("highest"):
        for s, r in [(32, 512), (64, 1024), (128, 2048), (256, 2048),
                     (512, 2048), (1024, 4096), (2048, 4096)]:
            W = jnp.asarray(rng.rand(r, s).astype(np.float32))

            @jax.jit
            def syrk(W):
                return jnp.einsum("rk,sk->rs", W, W,
                                  preferred_element_type=W.dtype)

            t = timed(syrk, W)
            flops = 2.0 * r * r * s
            rates[(s, r)] = flops / t
            log(f"  syrk s={s:5d} r={r:5d}: {t*1e6:9.1f} us  "
                f"{flops/t/1e12:6.2f} Tflop/s")
    big = max(rates.values())
    log(f"  peak panel rate: {big/1e12:.2f} Tflop/s")
    # utilization vs panel width s (narrow panels waste MXU lanes):
    for (s, r), v in sorted(rates.items()):
        log(f"    util(s={s}) = {v/big:.3f}  (evaluator model: "
            f"min(1, s/256) = {min(1.0, s/256.0):.3f})")
    return float(big)


def measure_bucket_ops(c_dispatch):
    """How many C_DISPATCH units one factor bucket costs: a cholesky +
    triangular_solve + panel read/write round at small batched shapes,
    with flop time subtracted."""
    import jax
    import jax.numpy as jnp

    rng = np.random.RandomState(2)
    results = []
    for B, s, r in [(16, 32, 128), (8, 64, 256), (4, 128, 512)]:
        A = np.einsum("bij,bkj->bik",
                      rng.rand(B, s, s), rng.rand(B, s, s)) \
            + s * np.eye(s)
        Bl = rng.rand(B, r, s)
        Aj = jnp.asarray(A.astype(np.float32))
        Bj = jnp.asarray(Bl.astype(np.float32))

        @jax.jit
        def bucket(Aj, Bj):
            L = jax.lax.linalg.cholesky(Aj)
            X = jax.lax.linalg.triangular_solve(
                L, Bj, left_side=False, lower=True,
                transpose_a=True)
            U = jnp.einsum("bik,bjk->bij", X, X,
                           preferred_element_type=X.dtype)
            return L, X, U

        t = timed(bucket, Aj, Bj)
        flops = B * (s**3 / 3 + s * s * r + s * r * r) * 2.0
        t_flop = flops / 2.0e13
        ops = max(t - t_flop, 0.0) / c_dispatch
        log(f"  bucket B={B} s={s:4d} r={r:4d}: {t*1e6:8.1f} us "
            f"-> ~{ops:.1f} dispatch units")
        results.append(ops)
    return float(np.median(results))


def main():
    import jax
    log(f"devices: {jax.devices()}")
    log("== chained small-op slope ==")
    c = measure_chain_slope()
    log("== matmul panel rates ==")
    rate = measure_matmul_rate()
    log("== per-bucket op cost ==")
    bops = measure_bucket_ops(c)
    log("")
    log("paste into baspacho_tpu/computation_model.py:")
    log(f"batched_regime = BatchedRegimeParams(")
    log(f"    dispatch_overhead={c:.2e},")
    log(f"    matmul_rate={rate:.2e},")
    log(f"    bucket_ops={bops:.1f},")
    log(f"    block_step_ops={bops:.1f},")
    log(f"    level_ops=12.0,  # update(gather+matmul+scatter)+assembly")
    log(f")")


if __name__ == "__main__":
    main()
