#!/usr/bin/env python
"""Synthetic per-op shape sweep for ComputationModel fitting.

Complements tools/fit_computation_model.py (which profiles real factor
schedules): times the four fundamental ops on a controlled grid of
(batch, width, rows) shapes so the polynomial fit is not hostage to the
shape distribution of any one problem's schedule — the reference's
bench -Z sweep plays the same role (Bench.cpp:67-124 feeding
examples/OptimizeCompModel.cpp).

Each sample is timed with the amortized multi-dispatch timer (queue n
back-to-back dispatches, one readback, null-op de-biased) from
baspacho_tpu.stats — single-op timing through a tunneled platform is
meaningless without it.

Usage:
  python tools/sweep_op_model.py --csv sweep.csv      # dump records
  python tools/fit_computation_model.py --csv sweep.csv
"""
import argparse
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--csv", default=None, help="append records here")
    ap.add_argument("--reps", type=int, default=8)
    ap.add_argument("--quick", action="store_true",
                    help="reduced grid (fewer compiles)")
    ap.add_argument("--fit", action="store_true",
                    help="also fit+print model constants from the sweep")
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp
    from baspacho_tpu.stats import _make_amortized_timer

    print(f"devices: {jax.devices()}", file=sys.stderr)
    timed = _make_amortized_timer(args.reps)
    rng = np.random.RandomState(7)
    records = []

    # supernode widths after padding are powers of two (pad policy in
    # block_matrix.py); batch sizes span the bucket occupancies seen on
    # real problems (1..1000s)
    if args.quick:
        widths = [8, 32, 128]
        batches = [1, 16, 256]
        row_mults = [2, 8]
    else:
        widths = [4, 8, 16, 32, 64, 128, 256]
        batches = [1, 4, 16, 64, 256]
        row_mults = [1, 4, 16]

    def spd(B, n):
        a = rng.rand(B, n, n).astype(np.float32)
        m = a @ a.transpose(0, 2, 1) + n * np.eye(n, dtype=np.float32)
        return jnp.asarray(m)

    @jax.jit
    def chol(a):
        return jax.lax.linalg.cholesky(a, symmetrize_input=False)

    @jax.jit
    def trsm(L, x):
        return jax.lax.linalg.triangular_solve(
            L, x, left_side=False, lower=True, transpose_a=True)

    @jax.jit
    def syge(x):
        return jnp.einsum("brk,bsk->brs", x,
                          x, preferred_element_type=x.dtype)

    for cp in widths:
        for B in batches:
            if B * cp * cp > 64 * (1 << 20):
                continue
            a = spd(B, cp)
            L, t = timed(chol, a)
            records.append(("potrf", cp, B, 0, t))
            print(f"potrf cp={cp} B={B}: {t*1e6:.1f} us", file=sys.stderr)
            for rm in row_mults:
                rp = cp * rm
                if B * rp * cp > 64 * (1 << 20):
                    continue
                x = jnp.asarray(rng.rand(B, rp, cp).astype(np.float32))
                y, t = timed(trsm, L, x)
                records.append(("trsm", cp, rp * B, 0, t))
                _, t = timed(syge, y)
                records.append(("syge", rp, rp, cp * B, t))
                print(f"trsm/syge cp={cp} rp={rp} B={B}", file=sys.stderr)

    # asmbl: elementwise block scatter-add of P (r x c) blocks into a flat
    # target — the planned backend's pair-assembly primitive (exact-shape
    # element groups; planned_backend._apply_pairs)
    tgt_n = 4 << 20
    for r, c in [(4, 4), (8, 8), (16, 16), (32, 32)] if args.quick else \
            [(4, 4), (8, 4), (8, 8), (16, 8), (16, 16), (32, 32),
             (64, 32)]:
        for P in [64, 1024, 16384]:
            nel = P * r * c
            if nel > 32 * (1 << 20):
                continue
            src = jnp.asarray(rng.rand(P, r, c).astype(np.float32))
            # scattered rows: P blocks at random row starts, contiguous
            # (r*c) element windows like the exact-shape pair groups
            base = jnp.asarray(
                rng.randint(0, tgt_n - r * c, size=P).astype(np.int32))
            idx = (base[:, None, None] +
                   jnp.arange(r * c, dtype=jnp.int32).reshape(1, r, c))

            @jax.jit
            def scat(tgt, s, i):
                return tgt.at[i.reshape(-1)].add(-s.reshape(-1))

            tgt = jnp.zeros(tgt_n, jnp.float32)
            _, t = timed(scat, tgt, src, idx)
            records.append(("asmbl", P, nel, 0, t))
            print(f"asmbl {r}x{c} P={P}: {t*1e6:.1f} us", file=sys.stderr)

    if args.csv:
        new = not os.path.exists(args.csv)
        with open(args.csv, "a") as fh:
            if new:
                fh.write("op,a,b,c,seconds\n")
            for op, a, b, c, t in records:
                fh.write(f"{op},{a},{b},{c},{t:.9f}\n")
        print(f"wrote {len(records)} records to {args.csv}",
              file=sys.stderr)

    if args.fit or not args.csv:
        from baspacho_tpu.stats import fit_computation_model
        cm = fit_computation_model(records)
        print("# fitted from synthetic sweep:")
        print("model_tpu_fitted = ComputationModel(")
        print(f"    potrf_params={cm.potrf_params.tolist()},")
        print(f"    trsm_params={cm.trsm_params.tolist()},")
        print(f"    syge_params={cm.syge_params.tolist()},")
        print(f"    asmbl_params={cm.asmbl_params.tolist()},")
        print(")")


if __name__ == "__main__":
    main()
