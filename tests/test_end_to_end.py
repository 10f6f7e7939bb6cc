"""End-to-end integration: simulated tracks through the full engine.

The minimum end-to-end slice of SURVEY.md §7 (steps 1-5): synthetic skidpad,
mapping -> loop closure -> full GN -> localization, ATE-checked against
ground truth.
"""
import numpy as np
import pytest

from tpuslam.backend.graph import GraphCapacity
from tpuslam.core.slam import Slam
from tpuslam.io import messages as M
from tpuslam.runtime.config import SlamConfig
from tpuslam.sim import SimConfig, simulate, skidpad, trackdrive
from tpuslam.sim.simulator import ate

CAP = GraphCapacity(max_poses=128, max_landmarks=64, max_obs=2048)


def _cfg(**kw):
    return SlamConfig(capacity=CAP, **kw)


@pytest.fixture(scope="module")
def skidpad_run():
    track = skidpad()
    scen = simulate(track, SimConfig(laps=1.3, seed=1))
    slam = Slam(_cfg())
    est = slam.run_scenario(scen)
    return track, scen, slam, est


def test_skidpad_loop_closes(skidpad_run):
    track, scen, slam, est = skidpad_run
    assert slam.loop_closure_complete, "loop closure should trigger on lap 2"
    n_lm = int(slam.state.graph.n_landmarks)
    # map should have roughly the real cone count (some may be out of FOV)
    assert abs(n_lm - len(track.cones_xy)) <= len(track.cones_xy) * 0.35, \
        (n_lm, len(track.cones_xy))


def test_skidpad_map_matches_ground_truth(skidpad_run):
    track, scen, slam, est = skidpad_run
    lm_xy, lm_type = slam.draw_cones()
    d = np.linalg.norm(lm_xy[:, None, :] - track.cones_xy[None, :, :], axis=-1)
    nearest = d.min(axis=1)
    # every mapped landmark should sit near a real cone
    assert np.median(nearest) < 0.35, np.median(nearest)
    assert nearest.max() < 1.2, nearest.max()


def test_skidpad_trajectory_ate(skidpad_run):
    track, scen, slam, est = skidpad_run
    poses = slam.draw_poses()
    gt = scen.gt_poses[: len(poses)]
    err = ate(poses[:, :2], gt[:, :2])
    # odometry GPS noise is 0.15 m 1-sigma; the optimized chain must not be
    # worse than raw odometry ATE (the reference bound) + margin
    odo_ate = ate(scen.odom_poses[: len(poses), :2], gt[:, :2])
    assert err < max(2.5 * odo_ate, 0.5), (err, odo_ate)


def test_localization_publishes_cone_packet(skidpad_run):
    track, scen, slam, est = skidpad_run
    out = slam.last_outputs
    assert out is not None
    az = np.asarray(out.cone_azimuth)
    dist = np.asarray(out.cone_distance)
    ctype = np.asarray(out.cone_type)
    assert az.shape == (slam.cfg.cones_per_packet,)
    assert np.all(dist >= 0)
    assert set(np.unique(ctype)).issubset({1, 2, 3, 4})


def test_collector_ingest_equals_direct_frames():
    """Message-level ingest (Direction/Distance/Type interleaved) must build
    the same frame the direct path processes."""
    track = skidpad()
    scen = simulate(track, SimConfig(laps=0.25, seed=2))
    cfg = _cfg()

    direct = Slam(cfg)
    msgy = Slam(cfg)
    for t in range(len(scen.times)):
        us = int(scen.times[t] * 1e6)
        from tpuslam.core.slam import _geo_from_local
        geo = _geo_from_local(np.array(cfg.gps_reference), scen.odom_poses[t])
        direct.next_pose(geo, us)
        msgy.next_pose(geo, us)
        direct.process_frame(scen.obs[t], scen.obs_valid[t], us)

        n = int(scen.obs_valid[t].sum())
        for i in range(n):
            az, zen, dist, ct = scen.obs[t, i]
            msgy.next_cone(M.ObjectDirection(objectId=i, azimuthAngle=az, zenithAngle=zen), us)
            msgy.next_cone(M.ObjectDistance(objectId=i, distance=dist), us)
            msgy.next_cone(M.ObjectType(objectId=i, type=int(ct)), us)
        msgy.flush()
        msgy._keyframe_us = None  # match the forced-keyframe direct path

    assert int(msgy.state.graph.n_landmarks) == int(direct.state.graph.n_landmarks)
    np.testing.assert_allclose(np.asarray(msgy.state.graph.lm_xy),
                               np.asarray(direct.state.graph.lm_xy), atol=1e-4)


def test_gps_outlier_guard():
    """|x| or |y| > 200 m keyframes are rejected (reference src/slam.cpp:300-303)."""
    cfg = _cfg()
    slam = Slam(cfg)
    slam._odometry[:] = (500.0, 0.0, 0.0)
    obs = np.array([[10.0, 0.0, 5.0, 1.0]])
    slam.process_frame(obs, np.ones(1, dtype=bool), 1000)
    assert int(slam.state.graph.n_poses) == 0


def test_trackdrive_multilap_improved_mode():
    """Improved (non-compat) pipeline on a trackdrive loop: nearest-neighbor
    association + localizer refinement stays consistent."""
    track = trackdrive(seed=4)
    scen = simulate(track, SimConfig(laps=1.15, seed=5, max_range=20.0))
    cap = GraphCapacity(max_poses=256, max_landmarks=160, max_obs=4096)
    cfg = SlamConfig(capacity=cap, association="nearest", localizer_refine=True,
                     localizer_type_bug=False)
    slam = Slam(cfg)
    slam.run_scenario(scen)
    assert slam.loop_closure_complete
    lm_xy, _ = slam.draw_cones()
    d = np.linalg.norm(lm_xy[:, None, :] - track.cones_xy[None, :, :], axis=-1)
    # GPS noise is 0.15 m 1-sigma and the map is built from odometry poses;
    # 0.6 m median is the realistic pre-closure mapping accuracy here.
    assert np.median(d.min(axis=1)) < 0.6
    assert d.min(axis=1).max() < 1.5


def test_fault_injection_drop_dup_reorder():
    """Input faults (SURVEY.md §5.3): dropped, duplicated, and reordered
    frames must not crash the pipeline nor wreck the trajectory — the
    keyframe gate and sample-time frame assembly absorb them."""
    import numpy as np

    from tpuslam.core.slam import Slam
    from tpuslam.runtime.config import SlamConfig
    from tpuslam.sim import SimConfig, simulate, skidpad
    from tpuslam.sim.simulator import ate

    cfg = SlamConfig()
    scen = simulate(skidpad(), SimConfig(
        laps=1.3, seed=5, drop_frame_prob=0.1, dup_frame_prob=0.1,
        reorder_frame_prob=0.1))
    assert scen.meta["n_frames"] > 10
    # reordering actually happened (times are non-monotonic somewhere)
    assert np.any(np.diff(scen.times) < 0)

    slam = Slam(cfg)
    est = slam.run_scenario(scen)
    err = ate(est[:, :2], scen.gt_poses[:, :2])
    assert np.isfinite(err) and err < 1.0, err
    assert int(slam.state.graph.n_landmarks) > 10
