"""Reference numeric backend: unrolled jitted JAX over static offsets.

The analog of the reference's `BackendRef` (MatOpsRef.cpp) — the simplest
correct implementation, used as the oracle backend and for small problems.
Every lump/board offset in the symbolic plan is a Python int, so the
factor/solve loops unroll at trace time into a static XLA graph: slices are
`lax.slice`, block updates are matmuls, and assembly is `.at[idx].add`
scatters with precomputed index constants (deterministic, unlike the
reference's CUDA atomics). Batched operation is `jax.vmap` over a leading
axis — one instruction stream, N data streams, exactly like the
`T = vector<double*>` batched mode of the reference (Solver.cpp:459).

All functions are dataflow-pure: they take and return the flat data vector.
"""

from __future__ import annotations

from functools import partial
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from .plan import NumericPlan


def _chol(a):
    return jax.lax.linalg.cholesky(a, symmetrize_input=False)


def _trsm_right_lt(L, B):
    """X = B @ L^{-T} with L lower-triangular."""
    return jax.lax.linalg.triangular_solve(
        L, B, left_side=False, lower=True, transpose_a=True)


def _solve_lower(L, b):
    return jax.lax.linalg.triangular_solve(L, b, left_side=True, lower=True)


def _solve_lower_t(L, b):
    return jax.lax.linalg.triangular_solve(L, b, left_side=True, lower=True,
                                           transpose_a=True)


class UnrolledBackend:
    """Builds jitted numeric functions from a NumericPlan by unrolling."""

    def __init__(self, plan: NumericPlan):
        from .plan import ensure_boards
        ensure_boards(plan)
        self.plan = plan
        self._cache = {}

    # -- helpers --------------------------------------------------------
    def _col_panel(self, data, ld):
        return jax.lax.dynamic_slice_in_dim(
            data, ld.col_offset, ld.total_rows * ld.size
        ).reshape(ld.total_rows, ld.size)

    def _factor_lump(self, data, ld):
        panel = self._col_panel(data, ld)
        diag = panel[:ld.size]
        L = _chol(diag)
        if ld.total_rows > ld.size:
            below = _trsm_right_lt(L, panel[ld.size:])
            new_panel = jnp.concatenate([L, below], axis=0)
        else:
            new_panel = L
        return jax.lax.dynamic_update_slice_in_dim(
            data, new_panel.reshape(-1), ld.col_offset, axis=0)

    def _eliminate_board(self, data, b):
        panel = jax.lax.dynamic_slice_in_dim(
            data, b.src_offset, b.full_rows * b.width
        ).reshape(b.full_rows, b.width)
        sub = panel[:b.sub_rows]
        prod = panel @ sub.T  # (full_rows, sub_rows)
        idx = jnp.asarray(b.scatter_idx)
        return data.at[idx].add(-prod)

    # -- factor ---------------------------------------------------------
    def make_factor(self, start_lump: int, end_lump: int):
        plan = self.plan
        num_lumps = plan.skel.num_lumps

        def factor(data):
            data = jnp.concatenate([data, jnp.zeros(1, data.dtype)])
            for l in range(start_lump, num_lumps):
                ld = plan.lumps[l]
                for b in ld.boards:
                    if start_lump <= b.origin_lump < end_lump:
                        data = self._eliminate_board(data, b)
                if l < end_lump:
                    data = self._factor_lump(data, ld)
            return data[:-1]

        return factor

    # -- solve in L -----------------------------------------------------
    def make_solve_l(self, start_lump: int, end_lump: int):
        plan = self.plan

        def solve_l(data, v):
            # v: (order, nrhs)
            for l in range(start_lump, end_lump):
                ld = plan.lumps[l]
                panel = self._col_panel(data, ld)
                L = panel[:ld.size]
                x = jax.lax.dynamic_slice_in_dim(v, ld.vec_offset, ld.size)
                x = _solve_lower(L, x)
                v = jax.lax.dynamic_update_slice_in_dim(
                    v, x, ld.vec_offset, axis=0)
                if ld.total_rows > ld.size:
                    y = panel[ld.size:] @ x
                    v = v.at[jnp.asarray(ld.below_row_idx)].add(-y)
            return v

        return solve_l

    # -- solve in L^T ---------------------------------------------------
    def make_solve_lt(self, start_lump: int, end_lump: int):
        plan = self.plan

        def solve_lt(data, v):
            for l in range(end_lump - 1, start_lump - 1, -1):
                ld = plan.lumps[l]
                panel = self._col_panel(data, ld)
                L = panel[:ld.size]
                x = jax.lax.dynamic_slice_in_dim(v, ld.vec_offset, ld.size)
                if ld.total_rows > ld.size:
                    tmp = v[jnp.asarray(ld.below_row_idx)]
                    x = x - panel[ld.size:].T @ tmp
                x = _solve_lower_t(L, x)
                v = jax.lax.dynamic_update_slice_in_dim(
                    v, x, ld.vec_offset, axis=0)
            return v

        return solve_lt

    # -- symmetric block mat-vec (bottom-right corner) ------------------
    def make_add_mv(self, start_lump: int):
        plan = self.plan
        num_lumps = plan.skel.num_lumps

        def add_mv(data, x, out, alpha):
            # out += alpha * M @ x over corner lumps >= start_lump
            for l in range(start_lump, num_lumps):
                ld = plan.lumps[l]
                panel = self._col_panel(data, ld)
                diag = panel[:ld.size]
                dl = jnp.tril(diag)
                sym = dl + jnp.tril(diag, -1).T
                xl = jax.lax.dynamic_slice_in_dim(x, ld.vec_offset, ld.size)
                contrib = alpha * (sym @ xl)
                if ld.total_rows > ld.size:
                    below = panel[ld.size:]
                    idx = jnp.asarray(ld.below_row_idx)
                    out = out.at[idx].add(alpha * (below @ xl))
                    contrib = contrib + alpha * (below.T @ x[idx])
                out = jax.lax.dynamic_update_slice_in_dim(
                    out,
                    jax.lax.dynamic_slice_in_dim(out, ld.vec_offset, ld.size)
                    + contrib,
                    ld.vec_offset, axis=0)
            return out

        return add_mv

    # -- pseudo factor (per-span diagonal factorization) ----------------
    def make_pseudo_factor(self, start_span: int, end_span: int):
        plan = self.plan

        def pseudo_factor(data):
            for s in range(start_span, end_span):
                sd = plan.spans[s]
                n, c = sd.size, sd.stride
                didx = sd.diag_offset + \
                    np.arange(n)[:, None] * c + np.arange(n)[None, :]
                diag = data[jnp.asarray(didx)]
                L = _chol(diag)
                data = data.at[jnp.asarray(didx)].set(L)
                if sd.below_rows > 0:
                    bidx = sd.below_offset + \
                        np.arange(sd.below_rows)[:, None] * c + \
                        np.arange(n)[None, :]
                    below = data[jnp.asarray(bidx)]
                    below = _trsm_right_lt(L, below)
                    data = data.at[jnp.asarray(bidx)].set(below)
            return data

        return pseudo_factor
