"""Minimal SE(3) Lie group ops (jnp, batched).

The reference's optimizer supports Sophus SE3 variables via the VarUtil
trait (Optimizer.h:80-96: DataDim=7 quaternion+translation, TangentDim=6,
tangentStep = exp(step) * value). This is the JAX equivalent: values are
(..., 7) arrays [qx, qy, qz, qw, tx, ty, tz]; all ops vmap/batch.
"""

from __future__ import annotations

import jax.numpy as jnp


def _quat_mul(a, b):
    ax, ay, az, aw = jnp.moveaxis(a, -1, 0)
    bx, by, bz, bw = jnp.moveaxis(b, -1, 0)
    return jnp.stack([
        aw * bx + ax * bw + ay * bz - az * by,
        aw * by - ax * bz + ay * bw + az * bx,
        aw * bz + ax * by - ay * bx + az * bw,
        aw * bw - ax * bx - ay * by - az * bz,
    ], axis=-1)


def _quat_rotate(q, v):
    qv = q[..., :3]
    qw = q[..., 3:4]
    t = 2.0 * jnp.cross(qv, v)
    return v + qw * t + jnp.cross(qv, t)


class SE3:
    DATA_DIM = 7
    TANGENT_DIM = 6

    @staticmethod
    def identity():
        return jnp.array([0.0, 0.0, 0.0, 1.0, 0.0, 0.0, 0.0])

    @staticmethod
    def exp(tangent):
        """tangent (..., 6) = [v (trans), w (rot)] -> SE3 (..., 7)."""
        v = tangent[..., :3]
        w = tangent[..., 3:]
        theta2 = jnp.sum(w * w, axis=-1, keepdims=True)
        theta = jnp.sqrt(jnp.maximum(theta2, 1e-30))
        small = theta2 < 1e-12
        # quaternion from rotation vector
        half = 0.5 * theta
        sinc = jnp.where(small, 0.5 - theta2 / 48.0, jnp.sin(half) / theta)
        q = jnp.concatenate([w * sinc,
                             jnp.where(small, 1.0 - theta2 / 8.0,
                                       jnp.cos(half))], axis=-1)
        # V matrix applied to v (closed form; series for small angles)
        wxv = jnp.cross(w, v)
        wxwxv = jnp.cross(w, wxv)
        a = jnp.where(small, 0.5 - theta2 / 24.0,
                      (1.0 - jnp.cos(theta)) / jnp.maximum(theta2, 1e-30))
        b = jnp.where(small, 1.0 / 6.0 - theta2 / 120.0,
                      (theta - jnp.sin(theta)) /
                      jnp.maximum(theta2 * theta, 1e-30))
        t = v + a * wxv + b * wxwxv
        return jnp.concatenate([q, t], axis=-1)

    @staticmethod
    def compose(a, b):
        qa, ta = a[..., :4], a[..., 4:]
        qb, tb = b[..., :4], b[..., 4:]
        return jnp.concatenate([
            _quat_mul(qa, qb), ta + _quat_rotate(qa, tb)], axis=-1)

    @staticmethod
    def transform(pose, point):
        """Apply SE3 (..., 7) to points (..., 3)."""
        return _quat_rotate(pose[..., :4], point) + pose[..., 4:]

    @staticmethod
    def tangent_step(value, step):
        """Left-multiplicative update: exp(step) * value (matches the
        reference's Sophus convention, Optimizer.h:93)."""
        return SE3.compose(SE3.exp(step), value)

    @staticmethod
    def normalize(value):
        q = value[..., :4]
        q = q / jnp.linalg.norm(q, axis=-1, keepdims=True)
        return jnp.concatenate([q, value[..., 4:]], axis=-1)
