"""Reference numeric backend: unrolled jitted JAX over static offsets.

The analog of the reference's `BackendRef` (MatOpsRef.cpp) — the simplest
correct implementation, used as the oracle backend and for small problems.
Every panel offset in the symbolic plan is a Python int, so the
factor/solve loops unroll at trace time into a static XLA graph: panel
reads are `lax.dynamic_slice` + static sub-slices (stride-aware for the
padded storage layout), block updates are matmuls, and assembly is
`.at[idx].add` scatters with precomputed index constants (deterministic,
unlike the reference's CUDA atomics). Batched operation is `jax.vmap`
over a leading axis — one instruction stream, N data streams, exactly
like the `T = vector<double*>` batched mode of the reference
(Solver.cpp:459).

All functions are dataflow-pure: they take and return the flat data vector.
"""

from __future__ import annotations

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


def _read(data, offset, rows, stride, cols):
    """(rows, cols) block at flat offset with given row stride."""
    blk = jax.lax.dynamic_slice_in_dim(
        data, offset, rows * stride if rows else 0)
    return blk.reshape(max(rows, 1), stride)[:rows, :cols] \
        if rows else jnp.zeros((0, cols), data.dtype)


def _write(data, offset, rows, stride, cols, vals):
    """Write (rows, cols) into the strided region, preserving padding."""
    if rows == 0:
        return data
    region = jax.lax.dynamic_slice_in_dim(data, offset, rows * stride)
    region = region.reshape(rows, stride).at[:, :cols].set(vals)
    return jax.lax.dynamic_update_slice_in_dim(
        data, region.reshape(-1), offset, axis=0)


class UnrolledBackend:
    """Builds jitted numeric functions from a NumericPlan by unrolling."""

    def __init__(self, plan: NumericPlan):
        from .plan import ensure_boards
        ensure_boards(plan)
        self.plan = plan
        self._cache = {}

    # -- helpers --------------------------------------------------------
    def _diag(self, data, ld):
        return _read(data, ld.col_offset, ld.size, ld.stride, ld.size)

    def _below(self, data, ld):
        return _read(data, ld.below_offset, ld.below, ld.stride, ld.size)

    def _factor_lump(self, data, ld):
        L = _chol(self._diag(data, ld))
        data = _write(data, ld.col_offset, ld.size, ld.stride, ld.size, L)
        if ld.below > 0:
            x = _trsm_right_lt(L, self._below(data, ld))
            data = _write(data, ld.below_offset, ld.below, ld.stride,
                          ld.size, x)
        return data

    def _eliminate_board(self, data, b, scatter_idx):
        panel = _read(data, b.src_offset, b.full_rows, b.src_stride,
                      b.width)
        prod = panel @ panel[:b.sub_rows].T  # (full_rows, sub_rows)
        return data.at[scatter_idx].add(-prod)

    # -- factor ---------------------------------------------------------
    def make_factor(self, start_lump: int, end_lump: int):
        plan = self.plan
        num_lumps = plan.skel.num_lumps
        # aux arrays follow the exact traversal order of the factor loop,
        # consumed by a cursor at trace time (avoids stamping shared
        # descriptors, which would clash across (start, end) ranges)
        aux_np = [b.scatter_idx
                  for l in range(start_lump, num_lumps)
                  for b in plan.lumps[l].boards
                  if start_lump <= b.origin_lump < end_lump]

        def factor(data, aux):
            data = jnp.concatenate([data, jnp.zeros(1, data.dtype)])
            k = 0
            for l in range(start_lump, num_lumps):
                ld = plan.lumps[l]
                for b in ld.boards:
                    if start_lump <= b.origin_lump < end_lump:
                        data = self._eliminate_board(data, b, aux[k])
                        k += 1
                if l < end_lump:
                    data = self._factor_lump(data, ld)
            return data[:-1]

        return factor, aux_np

    # -- solve in L -----------------------------------------------------
    def make_solve_l(self, start_lump: int, end_lump: int):
        plan = self.plan

        aux_np = [plan.lumps[l].below_row_idx
                  for l in range(start_lump, end_lump)
                  if plan.lumps[l].below > 0]

        def solve_l(data, v, aux):
            # v: (order, nrhs)
            k = 0
            for l in range(start_lump, end_lump):
                ld = plan.lumps[l]
                L = self._diag(data, ld)
                x = jax.lax.dynamic_slice_in_dim(v, ld.vec_offset, ld.size)
                x = _solve_lower(L, x)
                v = jax.lax.dynamic_update_slice_in_dim(
                    v, x, ld.vec_offset, axis=0)
                if ld.below > 0:
                    y = self._below(data, ld) @ x
                    v = v.at[aux[k]].add(-y)
                    k += 1
            return v

        return solve_l, aux_np

    # -- solve in L^T ---------------------------------------------------
    def make_solve_lt(self, start_lump: int, end_lump: int):
        plan = self.plan

        aux_np = [plan.lumps[l].below_row_idx
                  for l in range(end_lump - 1, start_lump - 1, -1)
                  if plan.lumps[l].below > 0]

        def solve_lt(data, v, aux):
            k = 0
            for l in range(end_lump - 1, start_lump - 1, -1):
                ld = plan.lumps[l]
                L = self._diag(data, ld)
                x = jax.lax.dynamic_slice_in_dim(v, ld.vec_offset, ld.size)
                if ld.below > 0:
                    tmp = v[aux[k]]
                    x = x - self._below(data, ld).T @ tmp
                    k += 1
                x = _solve_lower_t(L, x)
                v = jax.lax.dynamic_update_slice_in_dim(
                    v, x, ld.vec_offset, axis=0)
            return v

        return solve_lt, aux_np

    # -- symmetric block mat-vec (bottom-right corner) ------------------
    def make_add_mv(self, start_lump: int):
        plan = self.plan
        num_lumps = plan.skel.num_lumps

        aux_np = [plan.lumps[l].below_row_idx
                  for l in range(start_lump, num_lumps)
                  if plan.lumps[l].below > 0]

        def add_mv(data, x, out, alpha, aux):
            # out += alpha * M @ x over corner lumps >= start_lump
            k = 0
            for l in range(start_lump, num_lumps):
                ld = plan.lumps[l]
                diag = self._diag(data, ld)
                dl = jnp.tril(diag)
                sym = dl + jnp.tril(diag, -1).T
                xl = jax.lax.dynamic_slice_in_dim(x, ld.vec_offset, ld.size)
                contrib = alpha * (sym @ xl)
                if ld.below > 0:
                    below = self._below(data, ld)
                    idx = aux[k]
                    k += 1
                    out = out.at[idx].add(alpha * (below @ xl))
                    contrib = contrib + alpha * (below.T @ x[idx])
                out = jax.lax.dynamic_update_slice_in_dim(
                    out,
                    jax.lax.dynamic_slice_in_dim(out, ld.vec_offset, ld.size)
                    + contrib,
                    ld.vec_offset, axis=0)
            return out

        return add_mv, aux_np

    # -- pseudo factor (per-span diagonal factorization) ----------------
    def make_pseudo_factor(self, start_span: int, end_span: int):
        plan = self.plan
        # span sub-panels are strided: their last row's strided slice can
        # overrun the panel by up to stride-1 elements; pad so the final
        # panel's overrun stays in bounds (values there are untouched)
        pad = max((sd.stride for sd in plan.spans), default=1)
        n_data = plan.skel.data_size

        def pseudo_factor(data, aux):
            data = jnp.concatenate([data, jnp.zeros(pad, data.dtype)])
            for s in range(start_span, end_span):
                sd = plan.spans[s]
                n, c = sd.size, sd.stride
                diag = _read(data, sd.diag_offset, n, c, n)
                L = _chol(diag)
                data = _write(data, sd.diag_offset, n, c, n, L)
                for off, rows in ((sd.below1_offset, sd.below1_rows),
                                  (sd.below2_offset, sd.below2_rows)):
                    if rows > 0:
                        below = _read(data, off, rows, c, n)
                        below = _trsm_right_lt(L, below)
                        data = _write(data, off, rows, c, n, below)
            return data[:n_data]

        return pseudo_factor, []
