"""Closed-form residuals and Jacobians for the two factor types.

Matches g2o's error conventions used by the reference:
- `EdgeSE2` (odometry): e = inv(m) * (inv(p_i) * p_j), angle wrapped
  (reference src/slam.cpp:445-458 builds m = prev^-1 * curr).
- `EdgeSE2PointXY` (landmark observation): e = R_i^T (l - t_i) - z
  (reference src/slam.cpp:537-550; z is the body-frame Cartesian observation).

Everything is batched over the leading edge axis and runs on the VPU; no
autodiff in the hot path — the Jacobians are tiny closed forms.
"""
from __future__ import annotations

import jax.numpy as jnp

from tpuslam.geometry import se2

__all__ = ["odometry_residuals", "landmark_residuals"]


def _rot_t(theta):
    """R(theta)^T as [..., 2, 2]."""
    c, s = jnp.cos(theta), jnp.sin(theta)
    return jnp.stack([jnp.stack([c, s], -1), jnp.stack([-s, c], -1)], -2)


def _drot_t(theta):
    """d(R^T)/dtheta as [..., 2, 2]."""
    c, s = jnp.cos(theta), jnp.sin(theta)
    return jnp.stack([jnp.stack([-s, c], -1), jnp.stack([-c, -s], -1)], -2)


def odometry_residuals(pose_i, pose_j, meas):
    """Residual + Jacobians for batched odometry edges.

    Args:   pose_i, pose_j, meas: [..., 3].
    Returns r [..., 3], J_i [..., 3, 3], J_j [..., 3, 3].
    """
    rel = se2.between(pose_i, pose_j)
    r = jnp.concatenate([
        (_rot_t(meas[..., 2]) @ (rel[..., :2] - meas[..., :2])[..., None])[..., 0],
        se2.wrap_angle(rel[..., 2] - meas[..., 2])[..., None],
    ], axis=-1)

    rm_t = _rot_t(meas[..., 2])
    ri_t = _rot_t(pose_i[..., 2])
    d = pose_j[..., :2] - pose_i[..., :2]
    dtheta_col = (rm_t @ (_drot_t(pose_i[..., 2]) @ d[..., None]))[..., 0]  # [..., 2]
    rm_ri = rm_t @ ri_t

    zeros2 = jnp.zeros_like(d)
    j_i_top = jnp.concatenate([-rm_ri, dtheta_col[..., None]], axis=-1)      # [..., 2, 3]
    j_i_bot = jnp.concatenate([zeros2, -jnp.ones_like(d[..., :1])], -1)[..., None, :]
    j_i = jnp.concatenate([j_i_top, j_i_bot], axis=-2)

    j_j_top = jnp.concatenate([rm_ri, jnp.zeros_like(dtheta_col)[..., None]], axis=-1)
    j_j_bot = jnp.concatenate([zeros2, jnp.ones_like(d[..., :1])], -1)[..., None, :]
    j_j = jnp.concatenate([j_j_top, j_j_bot], axis=-2)
    return r, j_i, j_j


def landmark_residuals(pose, lm_xy, meas_xy):
    """Residual + Jacobians for batched landmark-observation edges.

    Args:   pose [..., 3], lm_xy [..., 2], meas_xy [..., 2].
    Returns r [..., 2], J_pose [..., 2, 3], J_lm [..., 2, 2].
    """
    ri_t = _rot_t(pose[..., 2])
    d = lm_xy - pose[..., :2]
    r = (ri_t @ d[..., None])[..., 0] - meas_xy
    dtheta_col = (_drot_t(pose[..., 2]) @ d[..., None])[..., 0]
    j_pose = jnp.concatenate([-ri_t, dtheta_col[..., None]], axis=-1)  # [..., 2, 3]
    j_lm = ri_t
    return r, j_pose, j_lm
