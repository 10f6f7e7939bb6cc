#!/usr/bin/env python
"""Benchmark: SLAM keyframe updates/sec/chip on the trackdrive config.

Prints ONE JSON line:
  {"metric": ..., "value": N, "unit": ..., "vs_baseline": N, ...extras}

Baseline: the reference publishes no numbers (BASELINE.md), so the baseline is
*measured* here from the faithful CPU reference re-implementation
(tpuslam.sim.golden_frontend.GoldenSlam — same control flow as
reference src/slam.cpp). Note the real reference service is additionally
wall-clock limited to <=1000/gatheringTimeMs ~ 100 frames/s by its
frame-gathering busy-wait (reference src/slam.cpp:227-233); we report the
measured compute-bound baseline and that design bound separately.
"""
import json
import time

import numpy as np

import jax
import jax.numpy as jnp

from tpuslam.backend.graph import GraphCapacity
from tpuslam.frontend.pipeline import run_sequence
from tpuslam.frontend.state import initial_state
from tpuslam.runtime.config import SlamConfig
from tpuslam.sim import SimConfig, simulate, trackdrive
from tpuslam.sim.golden_frontend import GoldenSlam
from tpuslam.sim.simulator import ate


def build_scenario():
    track = trackdrive(seed=11)
    scen = simulate(track, SimConfig(laps=1.4, keyframe_dt=0.1, speed=8.0,
                                     max_range=20.0, seed=12))
    return track, scen


def main():
    track, scen = build_scenario()
    t_frames = len(scen.times)
    cap = GraphCapacity(max_poses=1 << (t_frames - 1).bit_length(),
                        max_landmarks=256, max_obs=8192)
    cfg = SlamConfig(capacity=cap)

    obs = jnp.asarray(scen.obs, jnp.float32)
    valid = jnp.asarray(scen.obs_valid)
    poses = jnp.asarray(scen.odom_poses, jnp.float32)

    # warm-up + correctness. ATE is measured on the *published* trajectory —
    # the reference's observable output is its odometry-driven pose stream
    # (drawPoses returns m_poses, and the localization-mode publish is the
    # last vertex's odometry estimate since its optimize is disabled,
    # reference src/slam.cpp:403-421) — so parity compares like with like.
    state = initial_state(cap)
    state, outs = run_sequence(state, obs, valid, poses, cfg)
    jax.block_until_ready(state.graph.poses)
    closed = bool(state.loop_closure_complete)
    est = np.asarray(outs.pose)
    ate_m = ate(est[:, :2], scen.gt_poses[:t_frames, :2])

    # improved (non-compat) pipeline: GPS/heading priors + calibrated weights
    # + refinement — the "beats the reference" configuration
    from tpuslam.backend import gauss_newton as gn
    from tpuslam.frontend.keyframe import _gn_config
    cfg_improved = SlamConfig.improved(capacity=cap)
    st2 = initial_state(cap)
    st2, outs2 = run_sequence(st2, obs, valid, poses, cfg_improved)
    jax.block_until_ready(st2.graph.poses)
    ate_improved = ate(np.asarray(outs2.pose)[:, :2], scen.gt_poses[:t_frames, :2])
    g2 = gn.optimize(st2.graph, _gn_config(cfg_improved))
    ate_improved_final = ate(np.asarray(g2.poses)[:t_frames, :2],
                             scen.gt_poses[:t_frames, :2])
    lm2 = np.asarray(g2.lm_xy)[:int(g2.n_landmarks)]
    map_err_improved = float(np.median(np.linalg.norm(
        lm2[:, None, :] - track.cones_xy[None], axis=-1).min(axis=1)))

    # timed passes: each pass is ONE dispatch (state built inside the jit),
    # all passes submitted back-to-back, then synced — the tunnel round trip
    # is paid once, not per pass. Sync via real host transfers per pass — on
    # the axon backend block_until_ready alone does not reliably force remote
    # execution, and pulling every pass's scalar proves every pass ran.
    from tpuslam.frontend.pipeline import run_pass
    st, _ = run_pass(obs, valid, poses, cfg)  # warm/compile
    _ = int(st.graph.n_poses)
    n_pass = 5
    t0 = time.perf_counter()
    results = [run_pass(obs, valid, poses, cfg) for _ in range(n_pass)]
    for st_i, _ in results:
        _ = int(st_i.graph.n_poses)  # hard sync, pipelined
    dt = time.perf_counter() - t0
    fps_tpu = n_pass * t_frames / dt

    # batched multi-session throughput on the same chip: vmap over S
    # independent sessions amortizes the per-op dispatch of this tiny-state
    # workload — the single-chip half of "multi-session pod-scale mapping"
    from tpuslam.parallel.batch import run_passes_batched
    n_sess = 16  # measured knee: per-session cost flattens past 16 (the
                 # per-closure GNs start to dominate)
    scens_b = [simulate(trackdrive(seed=11), SimConfig(
        laps=1.4, keyframe_dt=0.1, speed=8.0, max_range=20.0, seed=20 + s))
        for s in range(n_sess)]
    t_b = min(t_frames, *(len(sc.times) for sc in scens_b))
    obs_b = jnp.stack([jnp.asarray(sc.obs[:t_b], jnp.float32) for sc in scens_b])
    valid_b = jnp.stack([jnp.asarray(sc.obs_valid[:t_b]) for sc in scens_b])
    poses_b = jnp.stack([jnp.asarray(sc.odom_poses[:t_b], jnp.float32)
                         for sc in scens_b])
    sts, _ = run_passes_batched(obs_b, valid_b, poses_b, cfg)  # warm/compile
    _ = int(sts.graph.n_poses[0])
    n_pass_b = 3
    t0 = time.perf_counter()
    results_b = [run_passes_batched(obs_b, valid_b, poses_b, cfg)
                 for _ in range(n_pass_b)]
    for sts_i, _ in results_b:
        _ = int(sts_i.graph.n_poses[0])  # hard sync, pipelined
    fps_batched = n_pass_b * n_sess * t_b / (time.perf_counter() - t0)

    # ATE parity on the other BASELINE configs (skidpad / acceleration):
    # published trajectory must match the reference-semantics CPU golden
    extra_ate = {}
    from tpuslam.sim import acceleration, skidpad
    # distinct seeds/cadence per config: odometry noise is additive and
    # track-independent in the simulator, so identical seeds would make the
    # two configs report bit-identical ATE (uninformative)
    for name, tk, laps, seed in (("skidpad", skidpad(), 1.3, 5),
                                 ("acceleration", acceleration(), 1.0, 6)):
        sc = simulate(tk, SimConfig(laps=laps, keyframe_dt=0.25, seed=seed))
        tt = len(sc.times)
        cap2 = GraphCapacity(max_poses=max(64, 1 << (tt - 1).bit_length()),
                             max_landmarks=128, max_obs=4096)
        st2b, outs2b = run_sequence(
            initial_state(cap2), jnp.asarray(sc.obs, jnp.float32),
            jnp.asarray(sc.obs_valid), jnp.asarray(sc.odom_poses, jnp.float32),
            SlamConfig(capacity=cap2))
        gold2 = GoldenSlam()
        gold2.run_scenario(sc)
        extra_ate[f"ate_{name}_m"] = round(float(ate(
            np.asarray(outs2b.pose)[:, :2], sc.gt_poses[:tt, :2])), 4)
        extra_ate[f"baseline_ate_{name}_m"] = round(float(ate(
            np.stack(gold2.trajectory)[:, :2], sc.gt_poses[:tt, :2])), 4) \
            if gold2.trajectory else float("nan")

    # measured CPU baseline (reference-semantics golden frontend)
    gold = GoldenSlam()
    t0 = time.perf_counter()
    gold.run_scenario(scen)
    dt_gold = time.perf_counter() - t0
    fps_gold = t_frames / dt_gold
    gold_ate = ate(np.stack(gold.trajectory)[:, :2], scen.gt_poses[:t_frames, :2]) \
        if gold.trajectory else float("nan")

    # the reference service's own design bound: gatheringTimeMs busy-wait
    reference_design_bound_fps = 1000.0 / cfg.gathering_time_ms

    print(json.dumps({
        "metric": "slam_keyframe_updates_per_sec_per_chip",
        "value": round(fps_tpu, 2),
        "unit": "frames/s",
        "vs_baseline": round(fps_tpu / fps_gold, 2),
        "baseline_fps_cpu_golden": round(fps_gold, 2),
        "reference_design_bound_fps": reference_design_bound_fps,
        "batched_sessions": n_sess,
        "batched_frames_per_sec_per_chip": round(fps_batched, 2),
        "ate_m": round(float(ate_m), 4),
        "ate_improved_online_m": round(float(ate_improved), 4),
        "ate_improved_final_m": round(float(ate_improved_final), 4),
        "map_error_improved_m": round(map_err_improved, 4),
        "baseline_ate_m": round(float(gold_ate), 4),
        "loop_closed": closed,
        "frames": t_frames,
        "device": str(jax.devices()[0]),
        **extra_ate,
    }))


if __name__ == "__main__":
    main()
