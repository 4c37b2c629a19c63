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


def storage_pad(below_rows, widths):
    """Padded panel shape policy shared by the skeleton storage layout and
    the planned backend's buckets: power-of-two with floors; columns with
    no below rows get no row padding."""
    below_rows = np.asarray(below_rows, dtype=np.int64)
    prp = np.where(below_rows == 0, 0, _pad_pow2(below_rows, PAD_ROWS))
    return prp, _pad_pow2(np.asarray(widths, dtype=np.int64), PAD_COLS)


def _i32(a) -> np.ndarray:
    return np.asarray(a, dtype=np.int32)


def _pad_pow2(x: np.ndarray, floor: int) -> np.ndarray:
    """Vectorized pad_dim."""
    x = np.maximum(np.asarray(x, dtype=np.int64), floor)
    return np.int64(1) << np.ceil(np.log2(x)).astype(np.int64)


@dataclass
class LumpBucket:
    """Same-padded-shape supernode panels factored as one batched op.

    Each panel is [(cp x cp) padded diag | (rp x cp) padded below] at
    flat offset `off`. With the level-shape-reordered padded storage
    layout, a bucket's panels are adjacent in memory (`contiguous`) and
    the whole (B, cp+rp, cp) tensor is one reshape of a contiguous slice
    — no gather; otherwise an affine masked gather is used."""
    rp: int              # padded below rows
    cp: int              # padded lump width (= panel row stride)
    off: np.ndarray      # (B,) panel flat-data offsets
    rows: np.ndarray     # (B,) actual below rows
    cols: np.ndarray     # (B,) actual lump widths
    vec_off: np.ndarray  # (B,) RHS offsets
    below_idx: np.ndarray = None  # (B, rp) RHS rows of below rows (solve)
    contiguous: bool = False
    prod_base: int = 0   # offset of this bucket's outer products in the
    #                      level's concatenated flat product buffer
    members: list = None  # lump ids in bucket order


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

    def _build_level(self, lds, with_below_idx=False):
        """Bucket the level's lumps; assign product-buffer offsets to
        buckets with below rows; enumerate assembly block pairs."""
        lump_buckets = self._bucket_lumps(lds, with_below_idx)
        prod_total = 0
        origin_pos: Dict[int, Tuple[int, int]] = {}
        for lb in lump_buckets:
            if lb.rp == 0:
                continue
            lb.prod_base = prod_total
            for bi, l in enumerate(lb.members):
                origin_pos[l] = (prod_total + bi * lb.rp * lb.rp, lb.rp)
            prod_total += len(lb.off) * lb.rp * lb.rp
        pair_buckets = self._build_pairs(lds, origin_pos)
        return lump_buckets, pair_buckets, prod_total

    def _bucket_lumps(self, lds, with_below_idx: bool) -> List[LumpBucket]:
        order = self.plan.skel.order
        groups: Dict[Tuple[int, int], list] = {}
        for ld in lds:
            groups.setdefault((ld.prp, ld.stride), []).append(ld)
        out = []
        for (rp, cp), g in sorted(groups.items()):
            g = sorted(g, key=lambda x: x.col_offset)
            bidx = None
            if with_below_idx:
                bidx = np.full((len(g), max(rp, 1)), order, dtype=np.int64)
                for i, x in enumerate(g):
                    bidx[i, :len(x.below_row_idx)] = x.below_row_idx
                bidx = _i32(bidx)
            offs = np.array([x.col_offset for x in g], dtype=np.int64)
            panel = (rp + cp) * cp
            contiguous = bool(np.all(np.diff(offs) == panel))
            lb = LumpBucket(
                rp=rp, cp=cp, off=_i32(offs),
                rows=_i32([x.total_rows - x.size for x in g]),
                cols=_i32([x.size for x in g]),
                vec_off=_i32([x.vec_offset for x in g]),
                below_idx=bidx, contiguous=contiguous)
            lb.members = [x.index for x in g]
            out.append(lb)
        return out

    def _build_pairs(self, lds, origin_pos) -> List[PairBucket]:
        """Lower block pairs of all level columns, grouped by padded block
        shape; sources are absolute offsets into the level product buffer.
        Fully vectorized: pair enumeration via tril indices per column,
        target chain location via one searchsorted on the global
        (lump, span) chain key array."""
        sk = self.plan.skel
        span_size = sk.span_start[1:] - sk.span_start[:-1]
        tgt_stride_arr = sk.col_stride
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
                tgt_stride_arr[tl]))
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
    def _read_panels(self, ext, lb: LumpBucket):
        """(B, cp+rp, cp) panel tensor: contiguous reshape when the
        storage layout is level-ordered, affine gather otherwise."""
        B = len(lb.off)
        h = lb.cp + lb.rp
        if lb.contiguous:
            flat = jax.lax.dynamic_slice_in_dim(
                ext, int(lb.off[0]), B * h * lb.cp)
            return flat.reshape(B, h, lb.cp)
        off = jnp.asarray(lb.off)
        r = jax.lax.broadcasted_iota(jnp.int32, (1, h, lb.cp), 1)
        c = jax.lax.broadcasted_iota(jnp.int32, (1, h, lb.cp), 2)
        return ext[off[:, None, None] + r * lb.cp + c]

    def _write_panels(self, ext, lb: LumpBucket, panels):
        B = len(lb.off)
        h = lb.cp + lb.rp
        if lb.contiguous:
            return jax.lax.dynamic_update_slice_in_dim(
                ext, panels.reshape(-1), int(lb.off[0]), axis=0)
        off = jnp.asarray(lb.off)
        r = jax.lax.broadcasted_iota(jnp.int32, (1, h, lb.cp), 1)
        c = jax.lax.broadcasted_iota(jnp.int32, (1, h, lb.cp), 2)
        return ext.at[off[:, None, None] + r * lb.cp + c].set(panels)

    @staticmethod
    def _pad_eye(cols, cp, dtype):
        i_ = jax.lax.broadcasted_iota(jnp.int32, (1, cp, cp), 1)
        j_ = jax.lax.broadcasted_iota(jnp.int32, (1, cp, cp), 2)
        return ((i_ == j_) &
                (i_ >= jnp.asarray(cols)[:, None, None])).astype(dtype)

    def _factor_bucket(self, ext, lb: LumpBucket):
        """Batched potrf + trsm of one bucket; returns (ext, flat_prod)."""
        panels = self._read_panels(ext, lb)
        pad_eye = self._pad_eye(lb.cols, lb.cp, ext.dtype)
        L = jax.lax.linalg.cholesky(panels[:, :lb.cp] + pad_eye,
                                    symmetrize_input=False)
        prod = None
        if lb.rp > 0:
            x = jax.lax.linalg.triangular_solve(
                L, panels[:, lb.cp:], left_side=False, lower=True,
                transpose_a=True)
            new_panels = jnp.concatenate([L - pad_eye, x], axis=1)
            prod = jnp.einsum("brk,bsk->brs", x, x,
                              preferred_element_type=ext.dtype).reshape(-1)
        else:
            new_panels = L - pad_eye
        ext = self._write_panels(ext, lb, new_panels)
        return ext, prod

    def _apply_pairs(self, ext, flat, pair_buckets, aux):
        """Scatter-subtract all block pairs from the product buffer. The
        (P,) descriptor arrays come in through `aux` (runtime operands, not
        baked constants — large constants make lowering/compile slow on
        remote-compile platforms)."""
        trash = ext.shape[0] - 2
        for pb in pair_buckets:
            sb_, ss_, rs_, cs_, tb_, ts_ = aux[pb.aux_slot:pb.aux_slot + 6]
            r = jax.lax.broadcasted_iota(jnp.int32, (1, pb.rsp, pb.csp), 1)
            c = jax.lax.broadcasted_iota(jnp.int32, (1, pb.rsp, pb.csp), 2)
            src = sb_[:, None, None] + r * ss_[:, None, None] + c
            vals = flat[jnp.clip(src, 0, flat.shape[0] - 1)]
            mask = (r < rs_[:, None, None]) & (c < cs_[:, None, None])
            tgt = tb_[:, None, None] + r * ts_[:, None, None] + c
            ext = ext.at[jnp.where(mask, tgt, trash)].add(-vals)
        return ext

    @staticmethod
    def _register_aux(sched_or_buckets, aux):
        """Assign aux slots for pair buckets / below_idx arrays."""
        for pb in sched_or_buckets:
            pb.aux_slot = len(aux)
            aux.extend([pb.src_base, pb.src_stride, pb.rs, pb.cs,
                        pb.tgt_base, pb.tgt_stride])

    # ------------------------------------------------------------------
    # public builders (same interface as UnrolledBackend)
    # ------------------------------------------------------------------
    def make_factor(self, start_lump: int, end_lump: int):
        sched = self._factor_schedule(start_lump, end_lump)
        sk = self.plan.skel
        dsize = sk.data_size
        mask = sk.padding_mask()
        need_mask = bool(np.any(mask == 0))
        aux_np = []
        mask_slot = None
        if need_mask:
            mask_slot = len(aux_np)
            aux_np.append(mask)
        for _, pair_buckets, _ in sched:
            self._register_aux(pair_buckets, aux_np)

        def factor(data, aux):
            if need_mask:  # padding must hold zeros (see block_matrix.py)
                data = data * aux[mask_slot].astype(data.dtype)
            ext = jnp.concatenate([data, jnp.zeros(2, data.dtype)])
            for lump_buckets, pair_buckets, ptot in sched:
                prods = []
                for lb in lump_buckets:
                    ext, prod = self._factor_bucket(ext, lb)
                    if prod is not None:
                        prods.append(prod)
                if prods:
                    flat = jnp.concatenate(prods) if len(prods) > 1 \
                        else prods[0]
                    ext = self._apply_pairs(ext, flat, pair_buckets, aux)
            return ext[:dsize]

        return factor, aux_np

    # -- solve ----------------------------------------------------------
    def _diag_solve(self, ext, vv, sb: LumpBucket, order, transpose, aux):
        cp = sb.cp
        panels = self._read_panels(ext, sb)
        L = panels[:, :cp] + self._pad_eye(sb.cols, cp, ext.dtype)
        below = panels[:, cp:] if sb.rp > 0 else None
        cols = jnp.asarray(sb.cols)
        xr = jax.lax.broadcasted_iota(jnp.int32, (1, cp), 1)
        xidx = jnp.where(xr < cols[:, None],
                         jnp.asarray(sb.vec_off)[:, None] + xr, order)
        x = vv[xidx]
        bidx = aux[sb.aux_slot] if sb.rp > 0 else None
        if transpose and below is not None:
            tmp = vv[bidx]
            x = x - jnp.einsum("brk,brn->bkn", below, tmp,
                               preferred_element_type=vv.dtype)
        x = jax.lax.linalg.triangular_solve(
            L, x, left_side=True, lower=True, transpose_a=transpose)
        vv = vv.at[xidx].set(x)
        if not transpose and below is not None:
            y = jnp.einsum("brk,bkn->brn", below, x,
                           preferred_element_type=vv.dtype)
            vv = vv.at[bidx].add(-y)
        return vv

    def _solve_aux(self, sched):
        aux_np = []
        for buckets in sched:
            for sb in buckets:
                if sb.rp > 0:
                    sb.aux_slot = len(aux_np)
                    aux_np.append(sb.below_idx)
        return aux_np

    def make_solve_l(self, start_lump: int, end_lump: int):
        sched = self._solve_schedule(start_lump, end_lump)
        order = self.plan.skel.order
        aux_np = self._solve_aux(sched)

        def solve_l(data, v, aux):
            ext = jnp.concatenate([data, jnp.zeros(2, data.dtype)])
            vv = jnp.concatenate([v, jnp.zeros((1, v.shape[1]), v.dtype)])
            for buckets in sched:
                for sb in buckets:
                    vv = self._diag_solve(ext, vv, sb, order, False, aux)
            return vv[:order]

        return solve_l, aux_np

    def make_solve_lt(self, start_lump: int, end_lump: int):
        sched = self._solve_schedule(start_lump, end_lump)
        order = self.plan.skel.order
        aux_np = self._solve_aux(sched)

        def solve_lt(data, v, aux):
            ext = jnp.concatenate([data, jnp.zeros(2, data.dtype)])
            vv = jnp.concatenate([v, jnp.zeros((1, v.shape[1]), v.dtype)])
            for buckets in reversed(sched):
                for sb in buckets:
                    vv = self._diag_solve(ext, vv, sb, order, True, aux)
            return vv[:order]

        return solve_lt, aux_np

    # -- symmetric block mat-vec (fully parallel, no level deps) --------
    def make_add_mv(self, start_lump: int):
        plan = self.plan
        order = plan.skel.order
        buckets = self._bucket_lumps(
            [plan.lumps[l] for l in range(start_lump, plan.skel.num_lumps)],
            with_below_idx=True)

        aux_np = []
        for sb in buckets:
            if sb.rp > 0:
                sb.aux_slot = len(aux_np)
                aux_np.append(sb.below_idx)

        def add_mv(data, x, out, alpha, aux):
            nrhs = x.shape[1]
            ext = jnp.concatenate([data, jnp.zeros(2, data.dtype)])
            xx = jnp.concatenate([x, jnp.zeros((1, nrhs), x.dtype)])
            oo = jnp.concatenate([out, jnp.zeros((1, nrhs), out.dtype)])
            for sb in buckets:
                cp = sb.cp
                panels = self._read_panels(ext, sb)
                diag = panels[:, :cp]
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
                    below = panels[:, cp:]
                    bidx = aux[sb.aux_slot]
                    oo = oo.at[bidx].add(alpha * jnp.einsum(
                        "brk,bkn->brn", below, xl,
                        preferred_element_type=xx.dtype))
                    contrib = contrib + alpha * jnp.einsum(
                        "brk,brn->bkn", below, xx[bidx],
                        preferred_element_type=xx.dtype)
                oo = oo.at[xidx].add(contrib)
            return oo[:order]

        return add_mv, aux_np

    def make_pseudo_factor(self, start_span: int, end_span: int):
        # per-span strided panels; cold path (Gauss-Seidel precond setup),
        # reuse the unrolled implementation
        from .ref_backend import UnrolledBackend
        return UnrolledBackend(self.plan).make_pseudo_factor(
            start_span, end_span)
