"""SE(2) rigid-transform operations, batched and jit/vmap-friendly.

A pose is an array `[..., 3]` of (x, y, theta). These are the closed-form
equivalents of what the reference delegates to `g2o::SE2`
(reference src/slam.cpp:452-454 builds odometry measurements as
``prevPose.inverse()*currentPose``); here they are pure jnp so that residuals
and Jacobians of the whole factor graph can be evaluated batched on the VPU.
"""
from __future__ import annotations

import jax.numpy as jnp

__all__ = [
    "wrap_angle", "compose", "inverse", "between",
    "transform_to_world", "transform_to_body", "exp", "log",
]


def wrap_angle(theta):
    """Wrap angles to (-pi, pi]."""
    return jnp.pi - jnp.mod(jnp.pi - theta, 2.0 * jnp.pi)


def compose(a, b):
    """SE(2) composition a*b: first apply b in a's frame.

    compose(a, b).xy = R(a.theta) @ b.xy + a.xy ; theta = a.theta + b.theta.
    """
    ca, sa = jnp.cos(a[..., 2]), jnp.sin(a[..., 2])
    x = a[..., 0] + ca * b[..., 0] - sa * b[..., 1]
    y = a[..., 1] + sa * b[..., 0] + ca * b[..., 1]
    t = wrap_angle(a[..., 2] + b[..., 2])
    return jnp.stack([x, y, t], axis=-1)


def inverse(a):
    """SE(2) inverse."""
    ca, sa = jnp.cos(a[..., 2]), jnp.sin(a[..., 2])
    x = -(ca * a[..., 0] + sa * a[..., 1])
    y = -(-sa * a[..., 0] + ca * a[..., 1])
    return jnp.stack([x, y, -a[..., 2]], axis=-1)


def between(a, b):
    """Relative pose inv(a)*b — the odometry measurement between keyframes."""
    dx = b[..., 0] - a[..., 0]
    dy = b[..., 1] - a[..., 1]
    ca, sa = jnp.cos(a[..., 2]), jnp.sin(a[..., 2])
    x = ca * dx + sa * dy
    y = -sa * dx + ca * dy
    t = wrap_angle(b[..., 2] - a[..., 2])
    return jnp.stack([x, y, t], axis=-1)


def transform_to_world(pose, pts):
    """Transform body-frame points `[..., 2]` into the world frame."""
    c, s = jnp.cos(pose[..., 2]), jnp.sin(pose[..., 2])
    x = c * pts[..., 0] - s * pts[..., 1] + pose[..., 0]
    y = s * pts[..., 0] + c * pts[..., 1] + pose[..., 1]
    return jnp.stack([x, y], axis=-1)


def transform_to_body(pose, pts):
    """Transform world-frame points `[..., 2]` into the pose's body frame."""
    dx = pts[..., 0] - pose[..., 0]
    dy = pts[..., 1] - pose[..., 1]
    c, s = jnp.cos(pose[..., 2]), jnp.sin(pose[..., 2])
    x = c * dx + s * dy
    y = -s * dx + c * dy
    return jnp.stack([x, y], axis=-1)


def exp(tangent):
    """SE(2) exponential map from a tangent vector (vx, vy, omega)."""
    w = tangent[..., 2]
    small = jnp.abs(w) < 1e-6
    ws = jnp.where(small, 1.0, w)
    s, c = jnp.sin(ws), jnp.cos(ws)
    a = jnp.where(small, 1.0 - w * w / 6.0, s / ws)
    b = jnp.where(small, w / 2.0, (1.0 - c) / ws)
    x = a * tangent[..., 0] - b * tangent[..., 1]
    y = b * tangent[..., 0] + a * tangent[..., 1]
    return jnp.stack([x, y, wrap_angle(w)], axis=-1)


def log(pose):
    """SE(2) logarithm map to a tangent vector (vx, vy, omega)."""
    w = wrap_angle(pose[..., 2])
    small = jnp.abs(w) < 1e-6
    ws = jnp.where(small, 1.0, w)
    half = ws / 2.0
    cot = half / jnp.tan(half)
    a = jnp.where(small, 1.0 - w * w / 12.0, cot)
    b = jnp.where(small, w / 2.0, half)
    x = a * pose[..., 0] + b * pose[..., 1]
    y = -b * pose[..., 0] + a * pose[..., 1]
    return jnp.stack([x, y, w], axis=-1)
