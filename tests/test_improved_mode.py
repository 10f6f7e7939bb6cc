"""The improved pipeline must BEAT the reference's accuracy, not just match.

Reference-observable accuracy = raw GPS-odometry ATE (its published poses are
odometry; see bench.py). Improved mode (GPS priors + calibrated weights +
refinement) must deliver lower trajectory ATE and a far tighter map.
"""
import numpy as np
import jax.numpy as jnp

from tpuslam.backend import gauss_newton as gn
from tpuslam.backend.graph import GraphCapacity
from tpuslam.frontend.keyframe import _gn_config
from tpuslam.frontend.pipeline import run_sequence
from tpuslam.frontend.state import initial_state
from tpuslam.runtime.config import SlamConfig
from tpuslam.sim import SimConfig, simulate, trackdrive
from tpuslam.sim.simulator import ate


def test_improved_beats_reference_accuracy():
    track = trackdrive(seed=6)
    scen = simulate(track, SimConfig(laps=1.25, seed=8, max_range=20.0))
    t = len(scen.times)
    cap = GraphCapacity(max_poses=128, max_landmarks=160, max_obs=4096)
    cfg = SlamConfig.improved(capacity=cap)

    st = initial_state(cap)
    st, outs = run_sequence(st, jnp.asarray(scen.obs, jnp.float32),
                            jnp.asarray(scen.obs_valid),
                            jnp.asarray(scen.odom_poses, jnp.float32), cfg)
    g = gn.optimize(st.graph, _gn_config(cfg))

    ate_odom = ate(scen.odom_poses[:t, :2], scen.gt_poses[:t, :2])
    ate_final = ate(np.asarray(g.poses)[:t, :2], scen.gt_poses[:t, :2])
    assert ate_final < 0.85 * ate_odom, (ate_final, ate_odom)

    lm = np.asarray(g.lm_xy)[:int(g.n_landmarks)]
    d = np.linalg.norm(lm[:, None, :] - track.cones_xy[None], axis=-1).min(axis=1)
    assert np.median(d) < 0.1, np.median(d)

    # heading also improves
    herr_odom = np.abs(np.arctan2(
        np.sin(scen.odom_poses[:t, 2] - scen.gt_poses[:t, 2]),
        np.cos(scen.odom_poses[:t, 2] - scen.gt_poses[:t, 2])))
    est_h = np.asarray(g.poses)[:t, 2]
    herr_est = np.abs(np.arctan2(np.sin(est_h - scen.gt_poses[:t, 2]),
                                 np.cos(est_h - scen.gt_poses[:t, 2])))
    assert np.sqrt(np.mean(herr_est ** 2)) <= np.sqrt(np.mean(herr_odom ** 2)) * 1.05


def test_prior_factors_anchor_without_gauge():
    """With priors and no gauge clamping, GN still converges and the first
    poses are free to move (unlike the reference's hard clamp)."""
    track = trackdrive(seed=6)
    scen = simulate(track, SimConfig(laps=0.5, seed=9, max_range=20.0))
    cap = GraphCapacity(max_poses=64, max_landmarks=128, max_obs=2048)
    cfg = SlamConfig.improved(capacity=cap, periodic_gn_every=0)
    st = initial_state(cap)
    st, _ = run_sequence(st, jnp.asarray(scen.obs, jnp.float32),
                         jnp.asarray(scen.obs_valid),
                         jnp.asarray(scen.odom_poses, jnp.float32), cfg)
    before = np.asarray(st.graph.poses).copy()
    g = gn.optimize(st.graph, _gn_config(cfg))
    after = np.asarray(g.poses)
    assert np.all(np.isfinite(after))
    # pose 0 moved (not clamped) but stayed near its prior
    assert not np.allclose(after[0], before[0])
    assert np.linalg.norm(after[0, :2] - before[0, :2]) < 1.0


def test_mahalanobis_pipeline_end_to_end():
    """cfg.association='mahalanobis' runs a true Mahalanobis gate in the
    pipeline: per-landmark information accumulates with every observation
    and the trajectory stays at least as good as the Euclidean gate."""
    import jax.numpy as jnp
    import numpy as np

    from tpuslam.backend.graph import GraphCapacity
    from tpuslam.frontend.pipeline import run_sequence
    from tpuslam.frontend.state import initial_state
    from tpuslam.runtime.config import SlamConfig
    from tpuslam.sim import SimConfig, simulate, skidpad
    from tpuslam.sim.simulator import ate

    scen = simulate(skidpad(), SimConfig(laps=1.3, seed=1))
    cap = GraphCapacity(max_poses=128, max_landmarks=128, max_obs=4096)
    obs = jnp.asarray(scen.obs, jnp.float32)
    valid = jnp.asarray(scen.obs_valid)
    poses = jnp.asarray(scen.odom_poses, jnp.float32)

    results = {}
    for assoc in ("nearest", "mahalanobis"):
        cfg = SlamConfig(capacity=cap, association=assoc)
        st, outs = run_sequence(initial_state(cap), obs, valid, poses, cfg)
        results[assoc] = (st, ate(np.asarray(outs.pose)[:, :2],
                                  scen.gt_poses[:len(scen.times), :2]))

    st_m, ate_m = results["mahalanobis"]
    _, ate_n = results["nearest"]
    assert bool(st_m.loop_closure_complete)
    n_lm = int(st_m.graph.n_landmarks)
    assert n_lm > 10
    info = np.asarray(st_m.lm_info_xy)[:n_lm]
    # every live landmark carries positive-definite accumulated information
    assert (info[:, 0] > 0).all() and (info[:, 2] > 0).all()
    dets = info[:, 0] * info[:, 2] - info[:, 1] ** 2
    assert (dets > 0).all()
    # re-observed landmarks have strictly more information than one shot
    one_shot = 1.0 / 0.3 ** 2
    assert info[:, 0].max() > 2 * one_shot
    assert ate_m <= ate_n * 1.2  # no regression vs the Euclidean gate


def test_obs_information_geometry():
    """R^-1 eigenstructure: strong along the range ray (1/sigma_r^2), weak
    tangentially (1/(d*sigma_az)^2)."""
    import jax.numpy as jnp
    import numpy as np

    from tpuslam.frontend.keyframe import _obs_information
    from tpuslam.runtime.config import SlamConfig

    cfg = SlamConfig()
    pose = jnp.asarray([0.0, 0.0, 0.0])
    glob = jnp.asarray([10.0, 0.0])      # straight ahead, range 10
    a, b, c = np.asarray(_obs_information(glob, pose, 10.0, cfg))
    ir = 1.0 / cfg.obs_noise_std ** 2
    it = 1.0 / (10.0 * np.radians(cfg.obs_noise_az_deg)) ** 2
    np.testing.assert_allclose(a, ir, rtol=1e-5)   # radial = x here
    np.testing.assert_allclose(c, it, rtol=1e-5)   # tangential = y
    np.testing.assert_allclose(b, 0.0, atol=1e-6)
    # rotate 90 degrees: the roles swap
    a2, b2, c2 = np.asarray(_obs_information(jnp.asarray([0.0, 10.0]),
                                             pose, 10.0, cfg))
    np.testing.assert_allclose(a2, it, rtol=1e-5)
    np.testing.assert_allclose(c2, ir, rtol=1e-5)
