"""Sensor-frame spherical -> Cartesian cone observation model.

The upstream cone detector emits per-cone (azimuth, zenith, distance, type)
tuples with angles in DEGREES (reference src/slam.cpp:637-654). The lidar is
mounted `lidar_to_cog` meters ahead of the vehicle's center of gravity, so the
observation must be lever-arm corrected via the law of cosines
(reference src/slam.cpp:513-523) before use.

All functions are pure jnp, shaped `[...]` batched, and run on the VPU. The
`ref_constants` flag switches to the reference's quirky DEG2RAD/PI constants
(tpuslam.compat) for bit-faithful trajectory replication.
"""
from __future__ import annotations

import math

import jax.numpy as jnp

from tpuslam import compat

__all__ = [
    "lidar_to_cog", "spherical_to_cartesian", "cone_to_global", "cones_to_global",
    "global_to_body_spherical",
]


def _constants(ref_constants: bool):
    if ref_constants:
        return compat.REF_DEG2RAD, compat.REF_PI
    return math.pi / 180.0, math.pi


def lidar_to_cog(azimuth_deg, distance, lever_arm=compat.REF_LIDAR_TO_COG,
                 ref_constants: bool = True):
    """Correct (azimuth[deg], distance) for the lidar->CoG lever arm.

    Law-of-cosines triangle: lidar sits `lever_arm` ahead of CoG on the x axis
    (reference src/slam.cpp:513-523). Returns (azimuth_deg', distance').

    Note: the reference computes sign = angle/|angle| which is NaN at exactly
    zero azimuth; we use a safe sign (+1 at 0) — observations at exactly 0.0
    degrees do not occur with real sensors.
    """
    d2r, pi = _constants(ref_constants)
    r2d = compat.REF_RAD2DEG if ref_constants else 180.0 / math.pi
    sign = jnp.where(azimuth_deg >= 0, 1.0, -1.0)
    interior = pi - jnp.abs(azimuth_deg * d2r)
    d_new = jnp.sqrt(lever_arm * lever_arm + distance * distance
                     - 2.0 * lever_arm * distance * jnp.cos(interior))
    # Guard the asin argument against fp excursions slightly above 1.
    ratio = jnp.clip(jnp.sin(interior) * distance / jnp.maximum(d_new, 1e-12), -1.0, 1.0)
    a_new = jnp.arcsin(ratio) * r2d
    return a_new * sign, d_new


def spherical_to_cartesian(azimuth_deg, zenith_deg, distance,
                           lever_arm=compat.REF_LIDAR_TO_COG,
                           ref_constants: bool = True):
    """Spherical (deg, deg, m) -> body-frame Cartesian (x, y, z) at the CoG.

    Mirrors reference src/slam.cpp:637-654: lever-arm correct the azimuth and
    range, then standard spherical->Cartesian with degree inputs.
    """
    d2r, _ = _constants(ref_constants)
    az, dist = lidar_to_cog(azimuth_deg, distance, lever_arm, ref_constants)
    cz = jnp.cos(zenith_deg * d2r)
    x = dist * cz * jnp.cos(az * d2r)
    y = dist * cz * jnp.sin(az * d2r)
    z = dist * jnp.sin(zenith_deg * d2r)
    return jnp.stack([x, y, z], axis=-1)


def cone_to_global(pose, obs_azd, obs_zend, obs_dist,
                   lever_arm=compat.REF_LIDAR_TO_COG, ref_constants: bool = True):
    """Observation spherical tuple -> global-frame (x, y).

    reference src/slam.cpp:499-510 (`coneToGlobal`): body Cartesian rotated by
    the pose heading and translated by the pose position.
    """
    xyz = spherical_to_cartesian(obs_azd, obs_zend, obs_dist, lever_arm, ref_constants)
    c, s = jnp.cos(pose[..., 2]), jnp.sin(pose[..., 2])
    gx = xyz[..., 0] * c - xyz[..., 1] * s + pose[..., 0]
    gy = xyz[..., 0] * s + xyz[..., 1] * c + pose[..., 1]
    return jnp.stack([gx, gy], axis=-1)


def cones_to_global(pose, obs, lever_arm=compat.REF_LIDAR_TO_COG,
                    ref_constants: bool = True):
    """Batched cone_to_global over an observation array `[N, 4]`.

    `obs` columns are (azimuth_deg, zenith_deg, distance, type) — the same
    layout as the reference's 4xN cone-collector matrix transposed
    (reference src/slam.cpp:83-136).
    """
    return cone_to_global(pose[..., None, :], obs[..., 0], obs[..., 1], obs[..., 2],
                          lever_arm, ref_constants)


def global_to_body_spherical(pose, cone_xy, ref_constants: bool = True):
    """Global cone (x, y) -> (azimuth_deg, distance) seen from `pose`.

    The egress projection used when publishing upcoming cones
    (reference src/cone.cpp:34-53). With ref_constants=True the azimuth keeps
    the reference's deg/rad unit mixture (heading divided by RAD2DEG instead
    of multiplied — see tpuslam.compat.outbound_azimuth_deg).
    """
    dx = cone_xy[..., 0] - pose[..., 0]
    dy = cone_xy[..., 1] - pose[..., 1]
    dist = jnp.sqrt(dx * dx + dy * dy)
    r2d = compat.REF_RAD2DEG if ref_constants else 180.0 / math.pi
    az = jnp.arctan2(dy, dx) * r2d
    if ref_constants:
        az = az - pose[..., 2] / r2d       # reference src/cone.cpp:37-39 quirk
    else:
        az = az - pose[..., 2] * r2d
    return az, dist
