"""Geometry/geodesy unit tests against independent NumPy oracles.

The oracles re-derive the reference formulas (cited per test) directly in
NumPy rather than importing the library code, so a bug cannot cancel itself.
"""
import math

import numpy as np
import pytest

from tpuslam import compat
from tpuslam.geometry import se2, spherical, wgs84

rng = np.random.default_rng(0)


# ---------------------------------------------------------------- SE(2)
def _mat(pose):
    x, y, t = pose
    return np.array([[math.cos(t), -math.sin(t), x],
                     [math.sin(t), math.cos(t), y],
                     [0, 0, 1]])


def random_pose():
    return np.array([rng.uniform(-50, 50), rng.uniform(-50, 50), rng.uniform(-np.pi, np.pi)])


@pytest.mark.parametrize("trial", range(5))
def test_se2_compose_matches_matrix_product(trial):
    a, b = random_pose(), random_pose()
    got = np.asarray(se2.compose(a, b))
    m = _mat(a) @ _mat(b)
    np.testing.assert_allclose(got[:2], m[:2, 2], atol=1e-5)
    np.testing.assert_allclose(math.cos(got[2]), m[0, 0], atol=1e-6)
    np.testing.assert_allclose(math.sin(got[2]), m[1, 0], atol=1e-6)


@pytest.mark.parametrize("trial", range(5))
def test_se2_between_inverse_roundtrip(trial):
    a, b = random_pose(), random_pose()
    rel = se2.between(a, b)  # inv(a)*b, reference src/slam.cpp:454
    back = np.asarray(se2.compose(a, rel))
    np.testing.assert_allclose(back[:2], b[:2], atol=1e-4)
    assert abs(se2.wrap_angle(back[2] - b[2])) < 1e-5
    ident = np.asarray(se2.compose(a, se2.inverse(a)))
    np.testing.assert_allclose(ident, [0, 0, 0], atol=1e-4)


def test_se2_transform_roundtrip():
    pose = random_pose()
    pts = rng.uniform(-20, 20, (7, 2))
    world = np.asarray(se2.transform_to_world(pose, pts))
    body = np.asarray(se2.transform_to_body(pose, world))
    np.testing.assert_allclose(body, pts, atol=1e-4)


def test_se2_exp_log_roundtrip():
    tau = np.array([1.5, -0.3, 0.8])
    np.testing.assert_allclose(np.asarray(se2.log(se2.exp(tau))), tau, atol=1e-5)
    zero = np.asarray(se2.exp(np.zeros(3)))
    np.testing.assert_allclose(zero, np.zeros(3), atol=1e-7)


def test_wrap_angle():
    np.testing.assert_allclose(float(se2.wrap_angle(np.pi + 0.1)), -np.pi + 0.1, atol=1e-6)
    np.testing.assert_allclose(float(se2.wrap_angle(-np.pi - 0.1)), np.pi - 0.1, atol=1e-6)
    np.testing.assert_allclose(float(se2.wrap_angle(np.pi)), np.pi, atol=1e-6)


# ---------------------------------------------------- spherical / lever arm
def _oracle_cog(angle, distance):
    """reference src/slam.cpp:513-523 transcribed literally (numpy, f64)."""
    lidar = 1.5
    sign = angle / abs(angle)
    a = compat.REF_PI - abs(angle * compat.REF_DEG2RAD)
    d_new = math.sqrt(lidar**2 + distance**2 - 2 * lidar * distance * math.cos(a))
    a_new = math.asin(math.sin(a) * distance / d_new) * compat.REF_RAD2DEG
    return a_new * sign, d_new


@pytest.mark.parametrize("angle,dist", [(30.0, 10.0), (-75.0, 4.2), (5.0, 40.0), (-1.0, 2.0)])
def test_lever_arm_matches_reference_formula(angle, dist):
    a_new, d_new = spherical.lidar_to_cog(np.float64(angle), np.float64(dist))
    oa, od = _oracle_cog(angle, dist)
    assert abs(float(a_new) - oa) < 1e-3
    assert abs(float(d_new) - od) < 1e-4


def _oracle_s2c(az, zen, dist):
    """reference src/slam.cpp:637-654 transcribed literally."""
    a, d = _oracle_cog(az, dist)
    d2r = compat.REF_DEG2RAD
    return (d * math.cos(zen * d2r) * math.cos(a * d2r),
            d * math.cos(zen * d2r) * math.sin(a * d2r),
            d * math.sin(zen * d2r))


@pytest.mark.parametrize("az,zen,dist", [(12.0, -3.0, 8.0), (-60.0, 2.0, 15.0), (89.0, 0.0, 3.0)])
def test_spherical_to_cartesian_oracle(az, zen, dist):
    got = np.asarray(spherical.spherical_to_cartesian(
        np.float64(az), np.float64(zen), np.float64(dist)))
    want = _oracle_s2c(az, zen, dist)
    np.testing.assert_allclose(got, want, atol=1e-3)


def test_cone_to_global_oracle():
    pose = np.array([3.0, -2.0, 0.7])
    az, zen, dist = 25.0, 0.0, 12.0
    x, y, _ = _oracle_s2c(az, zen, dist)
    want = (x * math.cos(0.7) - y * math.sin(0.7) + 3.0,
            x * math.sin(0.7) + y * math.cos(0.7) - 2.0)
    got = np.asarray(spherical.cone_to_global(
        pose, np.float64(az), np.float64(zen), np.float64(dist)))
    np.testing.assert_allclose(got, want, atol=1e-3)


def test_cones_to_global_batch_matches_single():
    pose = np.array([1.0, 2.0, -0.4])
    obs = np.array([[10.0, 0.0, 5.0, 1], [-20.0, 1.0, 9.0, 2], [45.0, -2.0, 3.0, 1]])
    batch = np.asarray(spherical.cones_to_global(pose, obs))
    for i in range(3):
        single = np.asarray(spherical.cone_to_global(pose, obs[i, 0], obs[i, 1], obs[i, 2]))
        np.testing.assert_allclose(batch[i], single, atol=1e-5)


def test_outbound_azimuth_reference_quirk():
    """reference src/cone.cpp:34-44: azimuth_deg - heading/RAD2DEG."""
    pose = np.array([0.0, 0.0, 0.5])
    cone = np.array([10.0, 10.0])
    az, dist = spherical.global_to_body_spherical(pose, cone)
    want_az = math.degrees(math.atan2(10, 10)) - 0.5 / compat.REF_RAD2DEG
    assert abs(float(az) - want_az) < 1e-3
    assert abs(float(dist) - math.sqrt(200)) < 1e-3


# ------------------------------------------------------------------ WGS84
REF = np.array([57.714787, 11.948313])  # Gothenburg-ish (CFSD home turf)


def test_wgs84_forward_zero_at_reference():
    np.testing.assert_allclose(wgs84.to_cartesian(REF, REF), [0.0, 0.0], atol=1e-9)


def test_wgs84_forward_scale_sanity():
    # 1e-4 deg of latitude ~ 11.1 m; of longitude ~ 11.1*cos(lat) m.
    d = wgs84.to_cartesian(REF, REF + np.array([1e-4, 0.0]))
    assert abs(d[1] - 11.1) < 0.1 and abs(d[0]) < 0.01
    d = wgs84.to_cartesian(REF, REF + np.array([0.0, 1e-4]))
    assert abs(d[0] - 11.13 * math.cos(math.radians(REF[0]))) < 0.1


def test_wgs84_inverse_roundtrip_fast():
    for offset in ([120.0, -45.0], [-3.0, 300.0], [0.5, 0.5]):
        pos = wgs84.from_cartesian(REF, np.array(offset))
        back = wgs84.to_cartesian(REF, pos)
        np.testing.assert_allclose(back, offset, atol=1e-6)


def test_wgs84_inverse_compat_matches_reference_tolerance():
    target = np.array([55.0, -32.0])
    pos = wgs84.from_cartesian_compat(REF, target)
    back = wgs84.to_cartesian(REF, pos)
    # The reference's fixed 1e-5-deg step is ~1.11 m of ground distance, and its
    # loop keeps the one overshooting step (src/WGS84toCartesian.hpp:129-134),
    # so the reference's own inverse error is up to ~1.7 m per axis.
    np.testing.assert_allclose(back, target, atol=1.7)
    # ... while our fast inverse is exact:
    pos_fast = wgs84.from_cartesian(REF, target)
    np.testing.assert_allclose(wgs84.to_cartesian(REF, pos_fast), target, atol=1e-6)


def test_wgs84_jnp_forward_matches_numpy():
    pos = REF + np.array([2e-4, -3e-4])
    a = wgs84.to_cartesian(REF, pos)
    b = np.asarray(wgs84.to_cartesian_jnp(REF, pos))
    # jax x64 is disabled, so this direct form runs in f32 and suffers the
    # documented ~1 m meridional-arc cancellation; local_projector is the
    # accurate device path (tested below).
    np.testing.assert_allclose(a, b, atol=1.0)


def test_wgs84_projector_f32_centimeter_accurate():
    """local_projector keeps f32 error at cm where naive f32 loses ~1 m."""
    project = wgs84.local_projector(REF)
    for off in ([2e-3, -3e-3], [1e-4, 1e-4], [-5e-3, 2e-3]):  # up to ~500 m
        want = wgs84.to_cartesian(REF, REF + np.array(off))
        got = np.asarray(project(np.float32(off[0]), np.float32(off[1])))
        np.testing.assert_allclose(got, want, atol=0.03)


def test_heading_remap_quirk():
    """reference src/slam.cpp:179-181."""
    h = compat.remap_north_heading(np.array([0.0]))
    np.testing.assert_allclose(h, [-compat.REF_PI], atol=1e-7)
    h = compat.remap_north_heading(np.array([3 * compat.REF_PI / 2]))
    np.testing.assert_allclose(h, [compat.REF_PI / 2], atol=1e-6)
