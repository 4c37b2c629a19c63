"""Robust loss functions for the LM optimizer.

Same family as the reference SoftLoss.h (Trivial/Huber/Cauchy) but as
jnp-traceable val/derivative pairs so they vmap over factor batches and
differentiate cleanly. Convention: given squared residual s = ||r||^2,
`val(s)` is the robustified cost and `weight(s) = d val / d s` is the IRLS
weight applied to residual and Jacobian (the reference's jet propagation
achieves the same Gauss-Newton approximation).
"""

from __future__ import annotations

import jax.numpy as jnp


class TrivialLoss:
    def val(self, s):
        return s

    def weight(self, s):
        return jnp.ones_like(s)


class HuberLoss:
    def __init__(self, b: float):
        self.b = float(b)

    def val(self, s):
        sq = jnp.sqrt(jnp.maximum(s, 1e-30))
        return jnp.where(s <= self.b * self.b, s,
                         2.0 * self.b * sq - self.b * self.b)

    def weight(self, s):
        sq = jnp.sqrt(jnp.maximum(s, 1e-30))
        return jnp.where(s <= self.b * self.b, jnp.ones_like(s), self.b / sq)


class CauchyLoss:
    def __init__(self, b: float = 1.0):
        self.b2 = float(b) * float(b)

    def val(self, s):
        return self.b2 * jnp.log1p(s / self.b2)

    def weight(self, s):
        return 1.0 / (1.0 + s / self.b2)
