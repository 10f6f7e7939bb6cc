"""Motion models: the reference's yaw-rate heading correction + a real EKF.

The reference's entire "EKF" is a dead-reckoning heading touch-up: at keyframe
time it extrapolates `heading -= yawRate * dt` for 0 < dt < 1 s, with the yaw
rate pre-scaled by 1/4 at ingest; x,y come straight from GPS
(reference src/slam.cpp:212-219, 304-318 — see SURVEY.md §2.1).
`compat_heading_correction` reproduces that exactly.

`Ekf` is the proper generalization BASELINE.json asks for: a constant
turn-rate/velocity (CTRV) EKF over (x, y, theta, v, omega) fusing GPS
position, geodetic heading, and IMU yaw rate — used by the improved pipeline
and the acceleration-config stress tests. Pure jnp; `predict` and the updates
are closed-form and scan-friendly for high-rate fusion.
"""
from __future__ import annotations

import dataclasses

import jax
import jax.numpy as jnp

from tpuslam.geometry import se2

__all__ = ["compat_heading_correction", "Ekf", "ekf_init", "ekf_predict",
           "ekf_update_position", "ekf_update_heading", "ekf_update_yaw_rate"]


def compat_heading_correction(pose, yaw_rate_scaled, dt_seconds):
    """reference src/slam.cpp:309-317: subtract scaled yaw rate over dt if
    0 < dt < 1 s. `yaw_rate_scaled` is angularVelocityZ/4 (src/slam.cpp:216)."""
    apply = (dt_seconds > 0.0) & (dt_seconds < 1.0)
    new_heading = pose[..., 2] - yaw_rate_scaled * dt_seconds
    return pose.at[..., 2].set(jnp.where(apply, new_heading, pose[..., 2]))


@jax.tree_util.register_dataclass
@dataclasses.dataclass
class Ekf:
    x: jax.Array   # [5] (x, y, theta, v, omega)
    p: jax.Array   # [5, 5] covariance


def ekf_init(pose=None, pos_std=5.0, heading_std=0.5, v_std=5.0, w_std=1.0) -> Ekf:
    x = jnp.zeros(5)
    if pose is not None:
        x = x.at[:3].set(pose)
    p = jnp.diag(jnp.array([pos_std**2, pos_std**2, heading_std**2,
                            v_std**2, w_std**2]))
    return Ekf(x=x, p=p)


def ekf_predict(ekf: Ekf, dt, q_v=1.0, q_w=0.5) -> Ekf:
    """CTRV process model with white accel/yaw-accel noise."""
    x, y, th, v, w = ekf.x
    c, s = jnp.cos(th), jnp.sin(th)
    xn = jnp.stack([x + v * c * dt, y + v * s * dt,
                    se2.wrap_angle(th + w * dt), v, w])
    f = jnp.eye(5)
    f = f.at[0, 2].set(-v * s * dt).at[0, 3].set(c * dt)
    f = f.at[1, 2].set(v * c * dt).at[1, 3].set(s * dt)
    f = f.at[2, 4].set(dt)
    g = jnp.zeros((5, 2)).at[3, 0].set(dt).at[4, 1].set(dt)
    q = g @ jnp.diag(jnp.array([q_v, q_w])) @ g.T
    return Ekf(x=xn, p=f @ ekf.p @ f.T + q)


def _joseph_update(ekf: Ekf, h, r_cov, innov) -> Ekf:
    s = h @ ekf.p @ h.T + r_cov
    k = ekf.p @ h.T @ jnp.linalg.inv(s)
    xn = ekf.x + k @ innov
    xn = xn.at[2].set(se2.wrap_angle(xn[2]))
    ikh = jnp.eye(5) - k @ h
    pn = ikh @ ekf.p @ ikh.T + k @ r_cov @ k.T
    return Ekf(x=xn, p=pn)


def ekf_update_position(ekf: Ekf, xy, std=0.5) -> Ekf:
    h = jnp.zeros((2, 5)).at[0, 0].set(1.0).at[1, 1].set(1.0)
    return _joseph_update(ekf, h, jnp.eye(2) * std**2, xy - ekf.x[:2])


def ekf_update_heading(ekf: Ekf, heading, std=0.1) -> Ekf:
    h = jnp.zeros((1, 5)).at[0, 2].set(1.0)
    innov = jnp.array([se2.wrap_angle(heading - ekf.x[2])])
    return _joseph_update(ekf, h, jnp.eye(1) * std**2, innov)


def ekf_update_yaw_rate(ekf: Ekf, omega, std=0.05) -> Ekf:
    h = jnp.zeros((1, 5)).at[0, 4].set(1.0)
    return _joseph_update(ekf, h, jnp.eye(1) * std**2, jnp.array([omega - ekf.x[4]]))
