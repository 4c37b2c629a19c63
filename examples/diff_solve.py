#!/usr/bin/env python
"""Differentiable sparse solve: gradients through H x = b.

The reference library is the GPU solver behind Theseus, whose core idea
is differentiable optimization layers: the solution of the (block-
sparse) normal equations is differentiated with respect to the matrix
data and right-hand side via the implicit function theorem instead of
unrolling the factorization. `Solver.make_differentiable_solve` packages
exactly that as a `jax.custom_vjp`:

    x = H^{-1} b,   bar_b = H^{-1} g,   bar_H = -sym(bar_b x^T)|_blocks

Here: fit spring-chain stiffness so the equilibrium matches a target —
an outer loss optimized by gradient descent THROUGH the sparse solve.
"""

import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax
import jax.numpy as jnp
import numpy as np

from baspacho_tpu import Settings, create_solver
from baspacho_tpu.sparse_structure import SparseStructure
from baspacho_tpu.utils import cum_sum_vec


def main():
    n = 16
    # chain structure: tridiagonal blocks of size 1
    rows = [[i] if i == 0 else [i - 1, i] for i in range(n)]
    ptrs = cum_sum_vec([len(r) for r in rows])
    inds = np.concatenate(rows)
    ss = SparseStructure(ptrs, inds)
    solver = create_solver(Settings(), np.ones(n, dtype=np.int64), ss)
    fsolve = solver.make_differentiable_solve()

    acc = solver.accessor()
    diag_off = np.asarray([acc.diag_block_offset(i)[0] for i in range(n)])
    off_off = np.asarray([acc.block_offset(i, i - 1)[0]
                          for i in range(1, n)])

    b = jnp.ones(n)

    def hdata_of(log_k):
        """Assemble chain-spring Hessian data from per-spring log-stiffness."""
        k = jnp.exp(log_k)                      # (n-1,) spring stiffness
        h = jnp.zeros(solver.data_size)
        h = h.at[diag_off[0]].add(k[0] + 1.0)   # anchor spring at x_0
        h = h.at[diag_off[1:-1]].add(k[:-1] + k[1:])
        h = h.at[diag_off[-1]].add(k[-1])
        h = h.at[off_off].add(-k)
        return h

    # recover hidden spring stiffnesses from the observed equilibrium
    rng = np.random.RandomState(0)
    log_k_true = jnp.asarray(rng.randn(n - 1) * 0.5)
    target = fsolve(hdata_of(log_k_true), b)

    def loss(log_k):
        x = fsolve(hdata_of(log_k), b)
        return jnp.sum((x - target) ** 2)

    import optax
    opt = optax.adam(0.05)

    @jax.jit
    def run_chunk(log_k, state):
        def step(carry, _):
            lk, st = carry
            v, g = jax.value_and_grad(loss)(lk)
            upd, st = opt.update(g, st)
            return (optax.apply_updates(lk, upd), st), v
        (log_k, state), vs = jax.lax.scan(step, (log_k, state), None,
                                          length=400)
        return log_k, state, vs[-1]

    log_k = jnp.zeros(n - 1)
    state = opt.init(log_k)
    for chunk in range(6):
        log_k, state, v = run_chunk(log_k, state)
        print(f"iter {(chunk + 1) * 400}: loss {float(v):.6e}")
    print(f"final loss: {float(loss(log_k)):.6e}")
    x = fsolve(hdata_of(log_k), b)
    print("equilibrium vs target max err:",
          float(jnp.max(jnp.abs(x - target))))


if __name__ == "__main__":
    main()
