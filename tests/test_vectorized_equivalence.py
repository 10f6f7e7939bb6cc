"""The vectorized mapping step must reproduce the sequential (scan) step and
hence the reference semantics, frame for frame."""
import numpy as np

from tpuslam.backend.graph import GraphCapacity
from tpuslam.core.slam import Slam
from tpuslam.runtime.config import SlamConfig
from tpuslam.sim import SimConfig, simulate, skidpad, trackdrive

CAP = GraphCapacity(max_poses=128, max_landmarks=96, max_obs=2048)


def _run(cfg, scen):
    slam = Slam(cfg)
    for t in range(len(scen.times)):
        slam._odometry[:] = scen.odom_poses[t]
        slam.process_frame(scen.obs[t], scen.obs_valid[t], int(scen.times[t] * 1e6))
    return slam


def _assert_same(a, b):
    ga, gb = a.state.graph, b.state.graph
    assert int(ga.n_landmarks) == int(gb.n_landmarks)
    assert int(ga.n_poses) == int(gb.n_poses)
    assert int(ga.n_obs) == int(gb.n_obs)
    n_lm, n_obs = int(ga.n_landmarks), int(ga.n_obs)
    np.testing.assert_allclose(np.asarray(ga.lm_xy)[:n_lm],
                               np.asarray(gb.lm_xy)[:n_lm], atol=1e-4)
    np.testing.assert_array_equal(np.asarray(ga.lm_type)[:n_lm],
                                  np.asarray(gb.lm_type)[:n_lm])
    np.testing.assert_array_equal(np.asarray(ga.obs_pose)[:n_obs],
                                  np.asarray(gb.obs_pose)[:n_obs])
    np.testing.assert_array_equal(np.asarray(ga.obs_lm)[:n_obs],
                                  np.asarray(gb.obs_lm)[:n_obs])
    np.testing.assert_allclose(np.asarray(ga.obs_xy)[:n_obs],
                               np.asarray(gb.obs_xy)[:n_obs], atol=1e-5)
    assert int(a.state.current_cone_index) == int(b.state.current_cone_index)
    assert bool(a.state.loop_closure_complete) == bool(b.state.loop_closure_complete)


def test_skidpad_vectorized_equals_sequential():
    scen = simulate(skidpad(), SimConfig(laps=1.3, seed=21))
    a = _run(SlamConfig(capacity=CAP, vectorized_mapping=True), scen)
    b = _run(SlamConfig(capacity=CAP, vectorized_mapping=False), scen)
    assert a.loop_closure_complete
    _assert_same(a, b)


def test_trackdrive_vectorized_equals_sequential():
    scen = simulate(trackdrive(seed=3), SimConfig(laps=1.2, seed=22, max_range=20.0))
    cap = GraphCapacity(max_poses=128, max_landmarks=160, max_obs=4096)
    a = _run(SlamConfig(capacity=cap, vectorized_mapping=True), scen)
    b = _run(SlamConfig(capacity=cap, vectorized_mapping=False), scen)
    _assert_same(a, b)


def test_duplicate_observations_merge_in_frame():
    """Two detections of one physical cone in a single frame must create one
    landmark with two edges — in both implementations."""
    scen = simulate(skidpad(), SimConfig(laps=0.2, seed=23))
    # duplicate every observation in frame 0 with small jitter
    obs = scen.obs.copy()
    valid = scen.obs_valid.copy()
    n = int(valid[0].sum())
    rng = np.random.default_rng(0)
    for i in range(min(n, obs.shape[1] - n)):
        obs[0, n + i] = obs[0, i] + rng.normal(0, [0.2, 0.0, 0.02, 0.0])
        valid[0, n + i] = True
    scen.obs, scen.obs_valid = obs, valid
    a = _run(SlamConfig(capacity=CAP, vectorized_mapping=True), scen)
    b = _run(SlamConfig(capacity=CAP, vectorized_mapping=False), scen)
    _assert_same(a, b)
    # edges exceed landmarks (duplicates attached to existing landmarks)
    assert int(a.state.graph.n_obs) > int(a.state.graph.n_landmarks)
