"""Does a larger fixed-lag window close the every=16 ATE gap (0.1632 vs
0.1572) at acceptable cost?"""
import time

import numpy as np
import jax
import jax.numpy as jnp

from tpuslam.backend.graph import GraphCapacity
from tpuslam.frontend import blocked as BL
from tpuslam.frontend.blocked import run_sequence_blocked
from tpuslam.frontend.state import initial_state
from tpuslam.runtime.config import SlamConfig
from tpuslam.sim import SimConfig, simulate, trackdrive
from tpuslam.sim.simulator import ate


def timed_slope(make_fn, k1, k2, reps=3):
    f1, f2 = make_fn(k1), make_fn(k2)
    _ = int(f1()[0]); _ = int(f2()[0])
    t1 = t2 = 1e9
    for _ in range(reps):
        t0 = time.perf_counter(); _ = int(f1()[0])
        t1 = min(t1, time.perf_counter() - t0)
        t0 = time.perf_counter(); _ = int(f2()[0])
        t2 = min(t2, time.perf_counter() - t0)
    return (t2 - t1) / (k2 - k1)


def main():
    track = trackdrive(seed=11)
    scen = simulate(track, SimConfig(laps=1.4, keyframe_dt=0.1, speed=8.0,
                                     max_range=20.0, seed=12))
    t_frames = len(scen.times)
    cap = GraphCapacity(max_poses=1 << (t_frames - 1).bit_length(),
                        max_landmarks=256, max_obs=8192)
    obs = jnp.asarray(scen.obs, jnp.float32)
    valid = jnp.asarray(scen.obs_valid)
    poses = jnp.asarray(scen.odom_poses, jnp.float32)

    for w, ew in ((64, 2048), (128, 4096), (192, 6144)):
        cfg = SlamConfig.improved(capacity=cap, periodic_gn_every=16,
                                  periodic_gn_window=w,
                                  periodic_gn_edge_window=ew)
        st, outs = run_sequence_blocked(initial_state(cap), obs, valid,
                                        poses, cfg, block=16)
        jax.block_until_ready(st.graph.poses)
        a = ate(np.asarray(outs.pose)[:, :2], scen.gt_poses[:t_frames, :2])
        obs_p, valid_p, pose_p, _ = BL._pad_inputs(obs, valid, poses, cfg,
                                                   16)

        def multi(k, cfg=cfg):
            @jax.jit
            def run():
                def one(_, __):
                    s = initial_state(cap)
                    s, _o, done = BL.blocked_core.__wrapped__(
                        s, obs_p, valid_p, pose_p, cfg, 16)
                    return (), s.graph.n_poses + done
                _, ys = jax.lax.scan(one, (), None, length=k)
                return ys
            return run

        sec = timed_slope(multi, 2, 8)
        print(f"w={w:3d} ew={ew}: {t_frames / sec:9.1f} f/s  "
              f"ate={float(a):.4f}", flush=True)


if __name__ == "__main__":
    main()
