"""Planned backend: level-scheduled, bucketed, batched numeric ops.

The TPU analog of the reference's fast backends (MatOpsFast.cpp /
MatOpsCuda.cu), redesigned for XLA instead of translated:

  * The elimination tree is level-scheduled: every lump (supernode) gets a
    level = 1 + max(level of its updating columns); all lumps in a level
    are independent. The reference exploits this only for leaf levels
    ("sparse elimination ranges", EliminationTree.cpp:136); here it is
    generalized to the whole tree, so the factorization becomes
    #levels sequential steps of fully-batched work.
  * Within a level, lumps are bucketed by power-of-two-padded panel shape;
    each bucket runs ONE batched op: gather panels -> batched cholesky ->
    batched triangular solve -> scatter back. Right-looking updates
    compute each column's outer product once as a single batched
    (B, R, R) matmul on the MXU; the per-level products are then
    assembled into later columns by a handful of per-block-shape
    gather/scatter-add passes (deterministic — replaces CUDA atomics, and
    subsumes the reference's flattened block-pair sparse-elim kernel
    MatOpsCuda.cu:309 as the level-0 case).
  * All indices are affine expressions of small per-bucket host constants
    (offset/rows/cols arrays), computed inside the jitted graph — no
    index tensors are materialized on the host and no host<->device
    traffic happens at numeric time (fixes the reference's per-lump
    prepareAssemble memcpy FIXME, MatOpsCuda.cu:474).

Data convention: ops work on the flat data vector extended by two slots:
[data..., trash, zero] — masked writes land in `trash`, masked reads come
from `zero`. Wrappers pad/strip.
"""

from __future__ import annotations

from dataclasses import dataclass, field
from typing import Dict, List, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from .plan import NumericPlan


def pad_dim(x: int, floor: int = 1) -> int:
    """Next power of two (with a floor) — coarse padding keeps bucket
    count low, which keeps the XLA graph small; the flop waste is bounded
    and in practice small since supernode sizes cluster. Floors (8 for
    panel rows, 4 for block dims) collapse the long tail of tiny shapes
    into single buckets."""
    if x <= floor:
        return floor
    return int(2 ** int(np.ceil(np.log2(x))))


PAD_ROWS = 8    # floor for below-diag panel rows
PAD_COLS = 4    # floor for lump widths / pair block dims


def _i32(a) -> np.ndarray:
    return np.asarray(a, dtype=np.int32)


def _pad_pow2(x: np.ndarray, floor: int) -> np.ndarray:
    """Vectorized pad_dim."""
    x = np.maximum(np.asarray(x, dtype=np.int64), floor)
    return np.int64(1) << np.ceil(np.log2(x)).astype(np.int64)


@dataclass
class LumpBucket:
    """Same-padded-shape supernode panels factored as one batched op.

    A panel splits into the (cols x cols) diagonal block at `off` and the
    (rows x cols) below-diagonal block at `off + cols^2` (chains of a
    column are contiguous); the two are gathered separately so padding
    never mixes diag and below rows."""
    rp: int              # padded below rows
    cp: int              # padded lump width
    off: np.ndarray      # (B,) panel flat-data offsets
    rows: np.ndarray     # (B,) actual below rows
    cols: np.ndarray     # (B,) actual lump widths
    vec_off: np.ndarray  # (B,) RHS offsets
    below_idx: np.ndarray = None  # (B, rp) RHS rows of below rows (solve)


@dataclass
class OriginBucket:
    """Columns whose below-diagonal outer product updates later columns."""
    rp: int
    cp: int
    off: np.ndarray
    rows: np.ndarray
    cols: np.ndarray
    prod_base: int = 0   # offset of this bucket's products in the level's
    #                      concatenated flat product buffer


@dataclass
class PairBucket:
    """Block pairs of one level, same padded block shape; source indices
    point into the level's concatenated product buffer."""
    rsp: int
    csp: int
    src_base: np.ndarray    # (P,) flat offset of block in product buffer
    src_stride: np.ndarray  # (P,) row stride (= rp of the origin bucket)
    rs: np.ndarray
    cs: np.ndarray
    tgt_base: np.ndarray
    tgt_stride: np.ndarray


class PlannedBackend:
    def __init__(self, plan: NumericPlan):
        self.plan = plan
        self.num_levels = int(plan.lump_levels.max()) + 1 \
            if len(plan.lump_levels) else 0
        self._sched_cache: Dict[Tuple[int, int], list] = {}
        self._solve_cache: Dict[Tuple[int, int], list] = {}
        # global chain lookup: key (lump_of_chain, row_span) is globally
        # ascending in chain storage order -> one searchsorted resolves any
        # (target lump, span) to its chain index
        sk = plan.skel
        chain_lump = np.repeat(
            np.arange(sk.num_lumps, dtype=np.int64),
            sk.chain_col_ptr[1:] - sk.chain_col_ptr[:-1])
        self._chain_keys = chain_lump * sk.num_spans + sk.chain_row_span

    # ------------------------------------------------------------------
    # schedule construction (host, cached per lump range)
    # ------------------------------------------------------------------
    def _by_level(self, start: int, end: int) -> List[list]:
        levels: Dict[int, list] = {}
        for l in range(start, end):
            levels.setdefault(int(self.plan.lump_levels[l]),
                              []).append(self.plan.lumps[l])
        return [levels[v] for v in sorted(levels.keys())]

    def _factor_schedule(self, start: int, end: int):
        key = (start, end)
        sched = self._sched_cache.get(key)
        if sched is None:
            sched = [self._build_level(lds) for lds in
                     self._by_level(start, end)]
            self._sched_cache[key] = sched
        return sched

    def _build_level(self, lds):
        lump_buckets = self._bucket_lumps(lds, with_below_idx=False)
        # origin buckets: lumps with below rows, padded below/width shape
        groups: Dict[Tuple[int, int], list] = {}
        for ld in lds:
            below = ld.total_rows - ld.size
            if below > 0:
                groups.setdefault((pad_dim(below, PAD_ROWS),
                                   pad_dim(ld.size, PAD_COLS)),
                                  []).append(ld)
        origin_buckets: List[OriginBucket] = []
        prod_total = 0
        origin_pos: Dict[int, Tuple[int, int, int]] = {}  # lump -> loc
        for (rp, cp), g in sorted(groups.items()):
            ob = OriginBucket(
                rp=rp, cp=cp,
                off=_i32([x.col_offset + x.size * x.size for x in g]),
                rows=_i32([x.total_rows - x.size for x in g]),
                cols=_i32([x.size for x in g]),
                prod_base=prod_total)
            for bi, x in enumerate(g):
                origin_pos[x.index] = (prod_total + bi * rp * rp, rp)
            prod_total += len(g) * rp * rp
            origin_buckets.append(ob)
        pair_buckets = self._build_pairs(lds, origin_pos)
        return lump_buckets, origin_buckets, pair_buckets, prod_total

    def _bucket_lumps(self, lds, with_below_idx: bool) -> List[LumpBucket]:
        order = self.plan.skel.order
        groups: Dict[Tuple[int, int], list] = {}
        for ld in lds:
            k = (pad_dim(ld.total_rows - ld.size, PAD_ROWS),
                 pad_dim(ld.size, PAD_COLS))
            groups.setdefault(k, []).append(ld)
        out = []
        for (rp, cp), g in sorted(groups.items()):
            bidx = None
            if with_below_idx:
                bidx = np.full((len(g), max(rp, 1)), order, dtype=np.int64)
                for i, x in enumerate(g):
                    bidx[i, :len(x.below_row_idx)] = x.below_row_idx
                bidx = _i32(bidx)
            out.append(LumpBucket(
                rp=rp, cp=cp,
                off=_i32([x.col_offset for x in g]),
                rows=_i32([x.total_rows - x.size for x in g]),
                cols=_i32([x.size for x in g]),
                vec_off=_i32([x.vec_offset for x in g]),
                below_idx=bidx))
        return out

    def _build_pairs(self, lds, origin_pos) -> List[PairBucket]:
        """Lower block pairs of all level columns, grouped by padded block
        shape; sources are absolute offsets into the level product buffer.
        Fully vectorized: pair enumeration via tril indices per column,
        target chain location via one searchsorted on the global
        (lump, span) chain key array."""
        sk = self.plan.skel
        span_size = sk.span_start[1:] - sk.span_start[:-1]
        lump_size = sk.lump_start[1:] - sk.lump_start[:-1]
        ck = self._chain_keys
        S = sk.num_spans

        parts = []  # (src, stride, rs, cs, tgt, tgt_c) arrays per column
        tril_cache: Dict[int, Tuple[np.ndarray, np.ndarray]] = {}
        for ld in lds:
            if ld.index not in origin_pos:
                continue
            base, rp = origin_pos[ld.index]
            o = ld.index
            cs, ce = int(sk.chain_col_ptr[o]), int(sk.chain_col_ptr[o + 1])
            nd = int(sk.lump_to_span[o + 1] - sk.lump_to_span[o])
            spans = sk.chain_row_span[cs + nd:ce]
            nb = len(spans)
            if nb == 0:
                continue
            sizes = span_size[spans]
            row_offs = np.concatenate([[0], np.cumsum(sizes)[:-1]])
            tri = tril_cache.get(nb)
            if tri is None:
                tri = np.tril_indices(nb)
                tril_cache[nb] = tri
            i_idx, j_idx = tri
            si, sj = spans[i_idx], spans[j_idx]
            tl = sk.span_to_lump[sj]
            pos = np.searchsorted(ck, tl * S + si)
            assert np.array_equal(sk.chain_row_span[pos], si), \
                "missing fill chain in target column"
            parts.append((
                base + row_offs[i_idx] * rp + row_offs[j_idx],
                np.full(len(si), rp, dtype=np.int64),
                sizes[i_idx], sizes[j_idx],
                sk.chain_data[pos] + sk.span_offset_in_lump[sj],
                lump_size[tl]))
        if not parts:
            return []
        src, stride, rs, cls, tgt, tgt_c = (
            np.concatenate([p[i] for p in parts]) for i in range(6))
        # bucket by padded block shape
        rsp = _pad_pow2(rs, PAD_COLS)
        csp = _pad_pow2(cls, PAD_COLS)
        bucket_key = rsp * 100000 + csp
        order = np.argsort(bucket_key, kind="stable")
        keys_sorted = bucket_key[order]
        bounds = np.concatenate([[0],
                                 np.nonzero(np.diff(keys_sorted))[0] + 1,
                                 [len(keys_sorted)]])
        out = []
        for bi in range(len(bounds) - 1):
            sel = order[bounds[bi]:bounds[bi + 1]]
            out.append(PairBucket(
                rsp=int(rsp[sel[0]]), csp=int(csp[sel[0]]),
                src_base=_i32(src[sel]), src_stride=_i32(stride[sel]),
                rs=_i32(rs[sel]), cs=_i32(cls[sel]),
                tgt_base=_i32(tgt[sel]), tgt_stride=_i32(tgt_c[sel])))
        return out

    def _solve_schedule(self, start: int, end: int) -> List[List[LumpBucket]]:
        key = (start, end)
        sched = self._solve_cache.get(key)
        if sched is None:
            sched = [self._bucket_lumps(lds, with_below_idx=True)
                     for lds in self._by_level(start, end)]
            self._solve_cache[key] = sched
        return sched

    # ------------------------------------------------------------------
    # jit-graph building blocks
    # ------------------------------------------------------------------
    @staticmethod
    def _panel_idx(off, rows, cols, rp, cp, oob_slot):
        off = jnp.asarray(off)
        rows = jnp.asarray(rows)
        cols = jnp.asarray(cols)
        r = jax.lax.broadcasted_iota(jnp.int32, (1, rp, cp), 1)
        c = jax.lax.broadcasted_iota(jnp.int32, (1, rp, cp), 2)
        mask = (r < rows[:, None, None]) & (c < cols[:, None, None])
        idx = off[:, None, None] + r * cols[:, None, None] + c
        return jnp.where(mask, idx, oob_slot)

    @classmethod
    def _gather_panels(cls, ext, off, rows, cols, rp, cp):
        """(B, rp, cp) panels from flat ext data; padding reads zero."""
        return ext[cls._panel_idx(off, rows, cols, rp, cp,
                                  ext.shape[0] - 1)]

    @classmethod
    def _scatter_panels(cls, ext, vals, off, rows, cols, rp, cp):
        return ext.at[cls._panel_idx(off, rows, cols, rp, cp,
                                     ext.shape[0] - 2)].set(vals)

    @staticmethod
    def _pad_eye(cols, cp, dtype):
        i_ = jax.lax.broadcasted_iota(jnp.int32, (1, cp, cp), 1)
        j_ = jax.lax.broadcasted_iota(jnp.int32, (1, cp, cp), 2)
        return ((i_ == j_) &
                (i_ >= jnp.asarray(cols)[:, None, None])).astype(dtype)

    def _factor_bucket(self, ext, lb: LumpBucket):
        """Batched potrf + trsm of one lump bucket."""
        diag = self._gather_panels(ext, lb.off, lb.cols, lb.cols,
                                   lb.cp, lb.cp)
        L = jax.lax.linalg.cholesky(
            diag + self._pad_eye(lb.cols, lb.cp, ext.dtype),
            symmetrize_input=False)
        ext = self._scatter_panels(ext, L, lb.off, lb.cols, lb.cols,
                                   lb.cp, lb.cp)
        if lb.rp > 0:
            boff = _i32(np.asarray(lb.off, np.int64) +
                        np.asarray(lb.cols, np.int64) ** 2)
            below = self._gather_panels(ext, boff, lb.rows, lb.cols,
                                        lb.rp, lb.cp)
            x = jax.lax.linalg.triangular_solve(
                L, below, left_side=False, lower=True, transpose_a=True)
            ext = self._scatter_panels(ext, x, boff, lb.rows, lb.cols,
                                       lb.rp, lb.cp)
        return ext

    def _level_update(self, ext, origin_buckets, pair_buckets, prod_total):
        """Outer products of the level's columns + block-pair assembly."""
        if not origin_buckets:
            return ext
        parts = []
        for ob in origin_buckets:
            panels = self._gather_panels(ext, ob.off, ob.rows, ob.cols,
                                         ob.rp, ob.cp)
            prod = jnp.einsum("brk,bsk->brs", panels, panels,
                              preferred_element_type=ext.dtype)
            parts.append(prod.reshape(-1))
        flat = jnp.concatenate(parts) if len(parts) > 1 else parts[0]
        trash = ext.shape[0] - 2
        for pb in pair_buckets:
            r = jax.lax.broadcasted_iota(jnp.int32, (1, pb.rsp, pb.csp), 1)
            c = jax.lax.broadcasted_iota(jnp.int32, (1, pb.rsp, pb.csp), 2)
            src = jnp.asarray(pb.src_base)[:, None, None] + \
                r * jnp.asarray(pb.src_stride)[:, None, None] + c
            vals = flat[jnp.clip(src, 0, flat.shape[0] - 1)]
            mask = (r < jnp.asarray(pb.rs)[:, None, None]) & \
                   (c < jnp.asarray(pb.cs)[:, None, None])
            tgt = jnp.asarray(pb.tgt_base)[:, None, None] + \
                r * jnp.asarray(pb.tgt_stride)[:, None, None] + c
            ext = ext.at[jnp.where(mask, tgt, trash)].add(-vals)
        return ext

    # ------------------------------------------------------------------
    # public builders (same interface as UnrolledBackend)
    # ------------------------------------------------------------------
    def make_factor(self, start_lump: int, end_lump: int):
        sched = self._factor_schedule(start_lump, end_lump)
        dsize = self.plan.skel.data_size

        def factor(data):
            ext = jnp.concatenate([data, jnp.zeros(2, data.dtype)])
            for lump_buckets, origin_buckets, pair_buckets, ptot in sched:
                for lb in lump_buckets:
                    ext = self._factor_bucket(ext, lb)
                ext = self._level_update(ext, origin_buckets, pair_buckets,
                                         ptot)
            return ext[:dsize]

        return factor

    # -- solve ----------------------------------------------------------
    def _diag_solve(self, ext, vv, sb: LumpBucket, order, transpose):
        cp = sb.cp
        diag = self._gather_panels(ext, sb.off, sb.cols, sb.cols, cp, cp)
        L = diag + self._pad_eye(sb.cols, cp, ext.dtype)
        cols = jnp.asarray(sb.cols)
        xr = jax.lax.broadcasted_iota(jnp.int32, (1, cp), 1)
        xidx = jnp.where(xr < cols[:, None],
                         jnp.asarray(sb.vec_off)[:, None] + xr, order)
        x = vv[xidx]
        if transpose and sb.rp > 0:
            below = self._gather_panels(
                ext, _i32(np.asarray(sb.off, np.int64) +
                          np.asarray(sb.cols, np.int64) ** 2),
                sb.rows, sb.cols, sb.rp, cp)
            tmp = vv[jnp.asarray(sb.below_idx)]
            x = x - jnp.einsum("brk,brn->bkn", below, tmp,
                               preferred_element_type=vv.dtype)
        x = jax.lax.linalg.triangular_solve(
            L, x, left_side=True, lower=True, transpose_a=transpose)
        vv = vv.at[xidx].set(x)
        if not transpose and sb.rp > 0:
            below = self._gather_panels(
                ext, _i32(np.asarray(sb.off, np.int64) +
                          np.asarray(sb.cols, np.int64) ** 2),
                sb.rows, sb.cols, sb.rp, cp)
            y = jnp.einsum("brk,bkn->brn", below, x,
                           preferred_element_type=vv.dtype)
            vv = vv.at[jnp.asarray(sb.below_idx)].add(-y)
        return vv

    def make_solve_l(self, start_lump: int, end_lump: int):
        sched = self._solve_schedule(start_lump, end_lump)
        order = self.plan.skel.order

        def solve_l(data, v):
            ext = jnp.concatenate([data, jnp.zeros(2, data.dtype)])
            vv = jnp.concatenate([v, jnp.zeros((1, v.shape[1]), v.dtype)])
            for buckets in sched:
                for sb in buckets:
                    vv = self._diag_solve(ext, vv, sb, order, False)
            return vv[:order]

        return solve_l

    def make_solve_lt(self, start_lump: int, end_lump: int):
        sched = self._solve_schedule(start_lump, end_lump)
        order = self.plan.skel.order

        def solve_lt(data, v):
            ext = jnp.concatenate([data, jnp.zeros(2, data.dtype)])
            vv = jnp.concatenate([v, jnp.zeros((1, v.shape[1]), v.dtype)])
            for buckets in reversed(sched):
                for sb in buckets:
                    vv = self._diag_solve(ext, vv, sb, order, True)
            return vv[:order]

        return solve_lt

    # -- symmetric block mat-vec (fully parallel, no level deps) --------
    def make_add_mv(self, start_lump: int):
        plan = self.plan
        order = plan.skel.order
        buckets = self._bucket_lumps(
            [plan.lumps[l] for l in range(start_lump, plan.skel.num_lumps)],
            with_below_idx=True)

        def add_mv(data, x, out, alpha):
            nrhs = x.shape[1]
            ext = jnp.concatenate([data, jnp.zeros(2, data.dtype)])
            xx = jnp.concatenate([x, jnp.zeros((1, nrhs), x.dtype)])
            oo = jnp.concatenate([out, jnp.zeros((1, nrhs), out.dtype)])
            for sb in buckets:
                cp = sb.cp
                diag = self._gather_panels(ext, sb.off, sb.cols, sb.cols,
                                           cp, cp)
                i_ = jax.lax.broadcasted_iota(jnp.int32, (1, cp, cp), 1)
                j_ = jax.lax.broadcasted_iota(jnp.int32, (1, cp, cp), 2)
                lower = jnp.where(i_ >= j_, diag, 0.0)
                sym = lower + jnp.where(i_ > j_, lower,
                                        0.0).transpose(0, 2, 1)
                cols = jnp.asarray(sb.cols)
                xr = jax.lax.broadcasted_iota(jnp.int32, (1, cp), 1)
                xidx = jnp.where(xr < cols[:, None],
                                 jnp.asarray(sb.vec_off)[:, None] + xr,
                                 order)
                xl = xx[xidx]
                contrib = alpha * jnp.einsum(
                    "bij,bjn->bin", sym, xl,
                    preferred_element_type=xx.dtype)
                if sb.rp > 0:
                    below = self._gather_panels(
                        ext, _i32(np.asarray(sb.off, np.int64) +
                                  np.asarray(sb.cols, np.int64) ** 2),
                        sb.rows, sb.cols, sb.rp, cp)
                    bidx = jnp.asarray(sb.below_idx)
                    oo = oo.at[bidx].add(alpha * jnp.einsum(
                        "brk,bkn->brn", below, xl,
                        preferred_element_type=xx.dtype))
                    contrib = contrib + alpha * jnp.einsum(
                        "brk,brn->bkn", below, xx[bidx],
                        preferred_element_type=xx.dtype)
                oo = oo.at[xidx].add(contrib)
            return oo[:order]

        return add_mv

    def make_pseudo_factor(self, start_span: int, end_span: int):
        # per-span strided panels; cold path (Gauss-Seidel precond setup),
        # reuse the unrolled implementation
        from .ref_backend import UnrolledBackend
        return UnrolledBackend(self.plan).make_pseudo_factor(
            start_span, end_span)
