"""Preconditioned conjugate gradient, jit-native.

Counterpart of the reference PCG.cpp:13-101, expressed as a
`lax.while_loop` so the whole iteration runs on-device with no host
round-trips per step (the reference calls back into Eigen per iteration).
"""

from __future__ import annotations

from typing import Callable, Tuple

import jax
import jax.numpy as jnp


def pcg(apply_inv_m: Callable, apply_a: Callable, b, tol: float,
        max_iters: int) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """Solve A x = b. Returns (x, final_r_norm2, num_iters)."""
    b = jnp.asarray(b)
    x = jnp.zeros_like(b)
    r = b
    z = apply_inv_m(r)
    p = z
    rz = jnp.vdot(r, z)
    target = tol * tol * jnp.vdot(b, b)

    def cond(state):
        x, r, p, rz, it = state
        return (jnp.vdot(r, r) > target) & (it < max_iters)

    def body(state):
        x, r, p, rz, it = state
        ap = apply_a(p)
        alpha = rz / jnp.vdot(p, ap)
        x = x + alpha * p
        r = r - alpha * ap
        z = apply_inv_m(r)
        rz_new = jnp.vdot(r, z)
        beta = rz_new / rz
        p = z + beta * p
        return x, r, p, rz_new, it + 1

    x, r, p, rz, it = jax.lax.while_loop(
        cond, body, (x, r, p, rz, jnp.asarray(0)))
    return x, jnp.vdot(r, r), it
