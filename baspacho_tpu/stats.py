"""Per-op timing stats and profiling (the reference's OpStat subsystem).

The reference wraps every backend op in an RAII timer (MatOps.h:84-101,
Utils.h:49-121) and can dump per-op (shape, time) records that the
`opt_comp_model` tool fits into a ComputationModel — closing the
auto-tuning loop that calibrates the supernode-merge heuristic.

Under XLA everything fuses into one program, so fine-grained timing needs
a dedicated profiling mode: `profile_factor` re-runs the factor schedule
as separate jitted pieces with device sync between them, recording
(op, shape, seconds) samples. `fit_computation_model` least-squares fits
the polynomial models from such samples (tools/fit_computation_model.py
is the CLI). Coarse stats (whole factor/solve calls) are always cheap to
collect via Solver.enable_stats().
"""

from __future__ import annotations

import time
from dataclasses import dataclass, field
from typing import Dict, List, Tuple

import numpy as np

from .computation_model import ComputationModel
from .utils import OpStat


@dataclass
class SolverStats:
    factor: OpStat = field(default_factory=OpStat)
    solve_l: OpStat = field(default_factory=OpStat)
    solve_lt: OpStat = field(default_factory=OpStat)
    add_mv: OpStat = field(default_factory=OpStat)
    # per-op categories (reference MatOps.h:84-101 keeps potrf/trsm/syge/
    # asmbl OpStats on the symbolic ctx); under XLA whole calls fuse, so
    # these are populated by the profiling mode (Solver.profile_ops)
    potrf: OpStat = field(default_factory=OpStat)
    trsm: OpStat = field(default_factory=OpStat)
    syge: OpStat = field(default_factory=OpStat)
    asmbl: OpStat = field(default_factory=OpStat)

    def _all(self):
        return (self.factor, self.solve_l, self.solve_lt, self.add_mv,
                self.potrf, self.trsm, self.syge, self.asmbl)

    def enable(self, enabled: bool = True):
        for s in self._all():
            s.enabled = enabled

    def reset(self):
        for s in self._all():
            s.reset()

    def record_profile(self, records) -> None:
        """Aggregate per-op profile records (see profile_factor) into the
        per-op OpStat counters — the reference's printStats layout."""
        by = {"potrf": self.potrf, "trsm": self.trsm, "syge": self.syge,
              "asmbl": self.asmbl}
        for op, a, b, c, t in records:
            st = by.get(op)
            if st is not None:
                was = st.enabled
                st.enabled = True
                st.record(t)
                st.enabled = was

    def __str__(self):
        out = (f"Solver timings:\n  factor: {self.factor}\n"
               f"  solveL: {self.solve_l}\n  solveLt: {self.solve_lt}\n"
               f"  addMv: {self.add_mv}")
        if any(s.num_runs for s in (self.potrf, self.trsm, self.syge,
                                    self.asmbl)):
            out += (f"\nPer-op (profiled):\n  potrf: {self.potrf}\n"
                    f"  trsm: {self.trsm}\n  syge: {self.syge}\n"
                    f"  asmbl: {self.asmbl}")
        return out


def profile_factor(solver, data, reps: int = 5) -> List[Tuple]:
    """Time each bucket op of the planned factor schedule separately.

    Returns records (op, m, n, k, seconds):
      potrf: (n=width*B, 0, 0)     — batched cholesky of B n-blocks
      trsm:  (n=width, k=rows*B)   — batched triangular solve
      syge:  (m=n=rows, k=width)   — batched outer product
      asmbl: (br=blocks, bc=pairs) — block-pair scatter assembly
    The per-sample shapes feed fit_computation_model.
    """
    import jax
    import jax.numpy as jnp

    be = solver.backend
    sched = be._factor_schedule(0, solver.skel.num_lumps)
    aux_all = []
    for lev in sched:
        be._register_aux(lev[1], aux_all)
    aux_all = tuple(jnp.asarray(a) for a in aux_all)
    ext = jnp.concatenate([jnp.asarray(data),
                           jnp.zeros(2, jnp.asarray(data).dtype)])
    records = []

    def timed(fn, *args):
        out = fn(*args)  # compile
        jax.block_until_ready(out)
        t0 = time.perf_counter()
        for _ in range(reps):
            out = fn(*args)
            jax.block_until_ready(out)
            # force a scalar readback to defeat async queues on tunneled
            # platforms
            float(jnp.sum(jax.tree.leaves(out)[0].ravel()[:1]))
        return out, (time.perf_counter() - t0) / reps

    # null-op baseline: per-sample dispatch+readback overhead (large and
    # jittery on tunneled platforms) would otherwise inflate the fitted
    # models' constant terms and skew the merge heuristic
    _null = jax.jit(lambda x: x * 1.0000001)
    _, null_t = timed(_null, jnp.zeros(8, jnp.float32))
    _, null_t2 = timed(_null, jnp.zeros(8, jnp.float32))
    null_t = min(null_t, null_t2)

    def debias(t):
        return max(t - null_t, 1e-7)

    orig_timed = timed

    def timed(fn, *args):  # noqa: F811
        out, t = orig_timed(fn, *args)
        return out, debias(t)

    for lump_buckets, pair_buckets, ptot, dense in sched:
        prods = []
        for lb in lump_buckets:
            B = len(lb.off)

            def chol_op(e):
                panels = be._read_panels(e, lb)
                return jax.lax.linalg.cholesky(
                    panels[:, :lb.cp] +
                    be._pad_eye(lb.cols, lb.cp, e.dtype),
                    symmetrize_input=False)

            L, t = timed(jax.jit(chol_op), ext)
            records.append(("potrf", lb.cp, B, 0, t))
            if lb.rp > 0:
                def trsm_op(e, L):
                    panels = be._read_panels(e, lb)
                    return jax.lax.linalg.triangular_solve(
                        L, panels[:, lb.cp:], left_side=False, lower=True,
                        transpose_a=True)

                x, t = timed(jax.jit(trsm_op), ext, L)
                records.append(("trsm", lb.cp, lb.rp * B, 0, t))

                def syge_op(x):
                    return jnp.einsum("brk,bsk->brs", x, x,
                                      preferred_element_type=x.dtype)

                prod, t = timed(jax.jit(syge_op), x)
                records.append(("syge", lb.rp, lb.rp, lb.cp * B, t))
                prods.append(prod.reshape(-1))
        if prods:
            flat = jnp.concatenate(prods) if len(prods) > 1 else prods[0]
            npairs = sum(len(pb.src_base) for pb in pair_buckets)
            nel = sum(len(pb.src_base) * pb.rsp * pb.csp
                      for pb in pair_buckets)

            def asmbl_op(e, f):
                return be._apply_pairs(e, f, pair_buckets, aux_all)

            ext2, t = timed(jax.jit(asmbl_op), ext, flat)
            records.append(("asmbl", npairs, nel, 0, t))
        # run the real level so later levels profile on realistic data
        level_prods = []
        for lb in lump_buckets:
            ext, prod = be._factor_bucket(ext, lb)
            if prod is not None:
                level_prods.append(prod)
        if level_prods:
            flat = jnp.concatenate(level_prods) if len(level_prods) > 1 \
                else level_prods[0]
            ext = be._apply_pairs(ext, flat, pair_buckets, aux_all)
        ext = jax.block_until_ready(ext)
    return records


def fit_computation_model(records: List[Tuple]) -> ComputationModel:
    """Least-squares fit of the polynomial op models from profile records
    (the reference's opt_comp_model, examples/OptimizeCompModel.cpp,
    re-done as four small linear regressions with 1/sqrt(t) weighting)."""
    groups: Dict[str, List] = {"potrf": [], "trsm": [], "syge": [],
                               "asmbl": []}
    for op, a, b, c, t in records:
        groups[op].append((a, b, c, t))

    def wlsq(X, t):
        """1/sqrt(t)-weighted NON-NEGATIVE least squares: the polynomial
        op models are physically nonnegative in every coefficient, and
        unconstrained fits on few/noisy samples produce negative constants
        that break the merge heuristic (reference fits with LM +
        eigendecomposition-guarded steps, OptimizeCompModel.cpp:64-295;
        NNLS is the simpler guarantee)."""
        from scipy.optimize import nnls
        w = 1.0 / np.sqrt(np.maximum(t, 1e-9))
        sol, _ = nnls(X * w[:, None], t * w)
        return sol

    out = {}
    g = np.array(groups["potrf"] or [(8, 1, 0, 1e-5)])
    # batched ops: time per single instance ~ t / B
    out["potrf"] = wlsq(ComputationModel.d_potrf(g[:, 0]),
                        g[:, 3] / np.maximum(g[:, 1], 1))
    g = np.array(groups["trsm"] or [(8, 8, 0, 1e-5)])
    out["trsm"] = wlsq(ComputationModel.d_trsm(g[:, 0], g[:, 1]), g[:, 3])
    g = np.array(groups["syge"] or [(8, 8, 8, 1e-5)])
    out["syge"] = wlsq(ComputationModel.d_syge(g[:, 0], g[:, 1], g[:, 2]),
                       g[:, 3])
    g = np.array(groups["asmbl"] or [(1, 16, 0, 1e-5)])
    out["asmbl"] = wlsq(ComputationModel.d_asmbl(g[:, 0], g[:, 1]),
                        g[:, 3])
    return ComputationModel(potrf_params=out["potrf"],
                            trsm_params=out["trsm"],
                            syge_params=out["syge"],
                            asmbl_params=out["asmbl"])
