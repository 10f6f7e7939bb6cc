"""Motion-model tests: compat yaw correction + CTRV EKF fusion, and the
acceleration-config stress (high-rate GPS/IMU fusion feeding keyframes)."""
import numpy as np
import jax.numpy as jnp

from tpuslam.frontend import motion
from tpuslam.sim import SimConfig, acceleration, simulate
from tpuslam.sim.simulator import ate


def test_compat_heading_correction():
    pose = jnp.array([1.0, 2.0, 0.5])
    out = motion.compat_heading_correction(pose, 0.2, 0.5)
    np.testing.assert_allclose(np.asarray(out), [1.0, 2.0, 0.5 - 0.1], atol=1e-6)
    # outside (0, 1) s window: unchanged (reference src/slam.cpp:315)
    out = motion.compat_heading_correction(pose, 0.2, 1.5)
    np.testing.assert_allclose(np.asarray(out), np.asarray(pose), atol=1e-6)
    out = motion.compat_heading_correction(pose, 0.2, 0.0)
    np.testing.assert_allclose(np.asarray(out), np.asarray(pose), atol=1e-6)


def test_ekf_converges_on_circular_motion():
    """CTRV EKF tracks a constant-turn trajectory from noisy GPS + yaw rate."""
    rng = np.random.default_rng(0)
    dt, v, w = 0.05, 8.0, 0.4
    ekf = motion.ekf_init(jnp.array([0.0, 0.0, np.pi / 2]))
    errs = []
    th = np.pi / 2
    x = np.array([0.0, 0.0])
    for k in range(200):
        x = x + v * dt * np.array([np.cos(th), np.sin(th)])
        th += w * dt
        ekf = motion.ekf_predict(ekf, dt)
        if k % 2 == 0:
            ekf = motion.ekf_update_position(
                ekf, jnp.asarray(x + rng.normal(0, 0.15, 2)), std=0.15)
        ekf = motion.ekf_update_yaw_rate(ekf, w + rng.normal(0, 0.02), std=0.02)
        if k % 10 == 0:
            ekf = motion.ekf_update_heading(ekf, th + rng.normal(0, 0.05), std=0.05)
        errs.append(np.linalg.norm(np.asarray(ekf.x[:2]) - x))
    late = np.mean(errs[100:])
    assert late < 0.15, late                 # beats raw GPS sigma
    assert abs(float(ekf.x[3]) - v) < 1.0    # velocity estimated
    assert abs(float(ekf.x[4]) - w) < 0.05   # turn rate estimated


def test_ekf_covariance_stays_spd():
    ekf = motion.ekf_init()
    for _ in range(50):
        ekf = motion.ekf_predict(ekf, 0.1)
        ekf = motion.ekf_update_position(ekf, jnp.array([1.0, 2.0]))
    p = np.asarray(ekf.p)
    np.testing.assert_allclose(p, p.T, atol=1e-4)
    assert np.all(np.linalg.eigvalsh(p) > 0)


def test_acceleration_config_ekf_fusion_stress():
    """BASELINE config 2: the acceleration straight with high-rate fusion.
    EKF-fused odometry at 20 Hz must denoise GPS for the keyframe engine."""
    track = acceleration()
    scen = simulate(track, SimConfig(laps=0.95, keyframe_dt=0.05, speed=10.0,
                                     gps_noise=0.25, seed=44))
    t = len(scen.times)
    rng = np.random.default_rng(1)
    ekf = motion.ekf_init(jnp.asarray(scen.gt_poses[0]), pos_std=1.0)
    fused = []
    for k in range(t):
        ekf = motion.ekf_predict(ekf, 0.05)
        ekf = motion.ekf_update_position(ekf, jnp.asarray(scen.odom_poses[k, :2]),
                                         std=0.25)
        ekf = motion.ekf_update_heading(ekf, float(scen.odom_poses[k, 2]), std=0.02)
        ekf = motion.ekf_update_yaw_rate(ekf, float(scen.yaw_rates[k]), std=0.02)
        fused.append(np.asarray(ekf.x[:3]))
    fused = np.stack(fused)
    ate_gps = ate(scen.odom_poses[:, :2], scen.gt_poses[:, :2])
    ate_ekf = ate(fused[20:, :2], scen.gt_poses[20:, :2])
    assert ate_ekf < 0.75 * ate_gps, (ate_ekf, ate_gps)


def test_orchestrator_ekf_fusion_end_to_end():
    """Slam with use_ekf_fusion processes a skidpad lap and still closes."""
    from tpuslam.backend.graph import GraphCapacity
    from tpuslam.core.slam import Slam
    from tpuslam.runtime.config import SlamConfig
    from tpuslam.sim import skidpad
    track = skidpad()
    # 10 Hz frames: a CTRV filter needs sensor-rate updates; at the 2 Hz
    # keyframe-only rate its predictions lag the 0.9 rad/s skidpad turn
    scen = simulate(track, SimConfig(laps=1.3, seed=51, keyframe_dt=0.1))
    cap = GraphCapacity(max_poses=128, max_landmarks=64, max_obs=2048)
    slam = Slam(SlamConfig(capacity=cap, use_ekf_fusion=True))
    slam.run_scenario(scen)
    assert slam.loop_closure_complete
    lm, _ = slam.draw_cones()
    d = np.linalg.norm(lm[:, None, :] - track.cones_xy[None], axis=-1).min(axis=1)
    assert np.median(d) < 0.5
