"""Runtime tests: .rec replay through the service shell, checkpoint/resume,
metrics registry."""
import io as pyio

import numpy as np

from tpuslam.backend.graph import GraphCapacity
from tpuslam.core.slam import Slam
from tpuslam.runtime.checkpoint import load_checkpoint, save_checkpoint
from tpuslam.runtime.config import SlamConfig
from tpuslam.runtime.metrics import MetricsRegistry
from tpuslam.runtime.service import SlamService, scenario_to_rec
from tpuslam.sim import SimConfig, simulate, skidpad

CAP = GraphCapacity(max_poses=128, max_landmarks=64, max_obs=2048)


def _cfg():
    return SlamConfig(capacity=CAP)


def test_rec_replay_matches_direct(tmp_path):
    """Scenario -> .rec -> service replay must equal the direct drive path."""
    scen = simulate(skidpad(), SimConfig(laps=1.3, seed=31))
    # frames are 500 ms apart and the replay path honors the keyframe gate
    # (strictly-greater compare, reference src/slam.cpp:290), so lower it to
    # make every simulated frame a keyframe on both paths
    cfg = _cfg().with_(time_between_keyframes_ms=100.0)

    direct = Slam(cfg)
    direct.run_scenario(scen)

    rec = str(tmp_path / "lap.rec")
    scenario_to_rec(scen, rec, cfg)
    svc = SlamService(cfg)
    svc.run_replay(rec)

    assert svc.slam.loop_closure_complete == direct.loop_closure_complete
    n_direct = int(direct.state.graph.n_landmarks)
    n_replay = int(svc.slam.state.graph.n_landmarks)
    assert n_replay == n_direct
    lm_d, _ = direct.draw_cones()
    lm_r, _ = svc.slam.draw_cones()
    # the .rec path quantizes observations to float32 and round-trips GPS
    # through WGS84; positions agree to centimeter level
    np.testing.assert_allclose(lm_r, lm_d, atol=0.05)
    assert svc.metrics.counters["cone_messages"] > 0
    assert svc.metrics.counters["pose_messages"] > 0


def test_sender_stamp_filtering(tmp_path):
    """Messages from foreign senderStamps must be ignored (reference main
    :71-101)."""
    scen = simulate(skidpad(), SimConfig(laps=0.3, seed=32))
    cfg = _cfg()
    rec = str(tmp_path / "lap.rec")
    # write with WRONG stamps
    scenario_to_rec(scen, rec, cfg.with_(detect_cone_id=999, estimation_id=998))
    svc = SlamService(cfg)
    svc.run_replay(rec)
    assert svc.slam.keyframes_processed == 0
    assert int(svc.slam.state.graph.n_poses) == 0


def test_checkpoint_roundtrip(tmp_path):
    scen = simulate(skidpad(), SimConfig(laps=1.3, seed=33))
    cfg = _cfg()
    slam = Slam(cfg)
    slam.run_scenario(scen)
    path = str(tmp_path / "ckpt.npz")
    save_checkpoint(path, slam.state, cfg, extra={"note": "test"})
    state2, meta = load_checkpoint(path, cfg)
    assert meta["note"] == "test"
    np.testing.assert_array_equal(np.asarray(state2.graph.lm_xy),
                                  np.asarray(slam.state.graph.lm_xy))
    assert int(state2.keyframe_count) == int(slam.state.keyframe_count)
    assert bool(state2.loop_closure_complete) == slam.loop_closure_complete

    # resumed engine continues processing
    slam2 = Slam(cfg)
    slam2.state = state2
    slam2._odometry[:] = scen.odom_poses[-1]
    out = slam2.process_frame(scen.obs[-1], scen.obs_valid[-1],
                              int(scen.times[-1] * 1e6) + 500000)
    assert int(slam2.state.graph.n_poses) == int(slam.state.graph.n_poses) + 1


def test_checkpoint_capacity_mismatch(tmp_path):
    cfg = _cfg()
    slam = Slam(cfg)
    path = str(tmp_path / "c.npz")
    save_checkpoint(path, slam.state, cfg)
    import pytest
    with pytest.raises(ValueError):
        load_checkpoint(path, cfg.with_(capacity=GraphCapacity(8, 8, 8)))


def test_metrics_registry():
    m = MetricsRegistry()
    m.inc("frames")
    m.inc("frames", 4)
    m.set("ate", 0.21)
    with m.timer("step"):
        pass
    m.event("closure", frame=17)
    snap = m.snapshot()
    assert snap["counters"]["frames"] == 5
    assert snap["gauges"]["ate"] == 0.21
    assert snap["timers"]["step"]["count"] == 1
    out = pyio.StringIO()
    m.dump_csv(out)
    assert "frames;counter;5" in out.getvalue()
    out2 = pyio.StringIO()
    m.dump_events_jsonl(out2)
    assert '"kind": "closure"' in out2.getvalue()


def test_checkpoint_resume_mid_run_exact():
    """Elastic recovery (SURVEY.md §5.3-5.4): kill the engine mid-lap,
    restore from the checkpoint in a fresh instance, continue — the final
    map, graph, and trajectory tail are identical to an uninterrupted run.
    The reference's only substitute is replaying the whole .rec from t=0."""
    import numpy as np

    from tpuslam.core.slam import Slam
    from tpuslam.core.slam import _geo_from_local
    from tpuslam.io import messages as M
    from tpuslam.runtime.checkpoint import load_checkpoint, save_checkpoint
    from tpuslam.runtime.config import SlamConfig
    from tpuslam.sim import SimConfig, simulate, skidpad

    cfg = SlamConfig()
    scen = simulate(skidpad(), SimConfig(laps=1.3, seed=3))
    T = len(scen.times)
    k = T // 2

    def feed(slam, t):
        us = int(scen.times[t] * 1e6)
        slam.next_pose(_geo_from_local(slam._gps_ref, scen.odom_poses[t]), us)
        slam.next_yaw_rate(M.AngularVelocityReading(
            angularVelocityZ=float(scen.yaw_rates[t])), us)
        return slam.process_frame(scen.obs[t], scen.obs_valid[t], us)

    # uninterrupted run
    gold = Slam(cfg)
    gold_tail = [np.asarray(feed(gold, t).pose) for t in range(T)][k:]

    # interrupted run: checkpoint at frame k, restore into a fresh engine
    a = Slam(cfg)
    for t in range(k):
        feed(a, t)
    import tempfile, os
    path = os.path.join(tempfile.mkdtemp(), "mid.npz")
    save_checkpoint(path, a.state, cfg, extra={"host": a.snapshot_host()})

    b = Slam(cfg)
    state, meta = load_checkpoint(path, cfg)
    b.state = state
    b.restore_host(meta["host"])
    resumed_tail = [np.asarray(feed(b, t).pose) for t in range(k, T)]

    np.testing.assert_array_equal(np.stack(resumed_tail), np.stack(gold_tail))
    np.testing.assert_array_equal(np.asarray(b.state.graph.lm_xy),
                                  np.asarray(gold.state.graph.lm_xy))
    np.testing.assert_array_equal(np.asarray(b.state.graph.poses),
                                  np.asarray(gold.state.graph.poses))
    assert int(b.state.graph.n_obs) == int(gold.state.graph.n_obs)
    assert bool(b.state.loop_closure_complete) == \
        bool(gold.state.loop_closure_complete)


def test_checkpoint_resume_with_ekf_and_open_frame():
    """Resume must also carry the EKF filter state and a mid-window cone
    collector (code-review finding: the live ingest path has host state
    beyond odometry)."""
    import numpy as np

    from tpuslam.core.slam import Slam, _geo_from_local
    from tpuslam.io import messages as M
    from tpuslam.runtime.config import SlamConfig
    from tpuslam.sim import SimConfig, simulate, skidpad

    cfg = SlamConfig(use_ekf_fusion=True)
    scen = simulate(skidpad(), SimConfig(laps=1.2, seed=7))
    T = len(scen.times)
    k = T // 2

    def feed(slam, t):
        us = int(scen.times[t] * 1e6)
        slam.next_pose(_geo_from_local(slam._gps_ref, scen.odom_poses[t]), us)
        slam.next_yaw_rate(M.AngularVelocityReading(
            angularVelocityZ=float(scen.yaw_rates[t])), us)
        return slam.process_frame(scen.obs[t], scen.obs_valid[t], us)

    gold = Slam(cfg)
    gold_tail = [np.asarray(feed(gold, t).pose) for t in range(T)][k:]

    a = Slam(cfg)
    for t in range(k):
        feed(a, t)
    # open a partial cone frame mid-gathering-window before snapshotting
    us = int(scen.times[k] * 1e6)
    a.next_cone(M.ObjectDirection(objectId=0, azimuthAngle=5.0), us)
    snap = a.snapshot_host()
    assert snap["frame_open"] and "ekf" in snap

    b = Slam(cfg)
    b.state = a.state
    b.restore_host(snap)
    assert b._frame_open and b._ekf is not None
    np.testing.assert_array_equal(np.asarray(b._ekf.x), np.asarray(a._ekf.x))
    b._frame_open = False  # drop the partial frame on both sides equally
    resumed_tail = [np.asarray(feed(b, t).pose) for t in range(k, T)]
    np.testing.assert_allclose(np.stack(resumed_tail), np.stack(gold_tail),
                               atol=1e-5)
