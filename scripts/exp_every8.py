"""Every-8 refinement cadence after the r4 structural fixes.

VERDICT r3 next #2 bar: improved_frames_per_sec_per_chip_every8 >= 45k at
ATE <= 0.158 m. The r3 coupling (every-8 forces block=8, 15.6k f/s) was
attacked three ways: scan unroll (no effect — exp_unroll_cadence.py),
edges-as-ys (periodic configs still use in-place appends), and data-driven
compaction (nc=16 quarters the B=8 pair terms). This measures what's left.
"""
import time

import jax
import jax.numpy as jnp

from tpuslam.backend.graph import GraphCapacity
from tpuslam.frontend import blocked as BL
from tpuslam.frontend.state import initial_state
from tpuslam.runtime.config import SlamConfig
from tpuslam.sim import SimConfig, simulate, trackdrive


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
    scen = simulate(trackdrive(seed=11), SimConfig(
        laps=1.4, keyframe_dt=0.1, speed=8.0, max_range=20.0, seed=12))
    t_frames = len(scen.times)
    obs = jnp.asarray(scen.obs, jnp.float32)
    valid = jnp.asarray(scen.obs_valid)
    poses = jnp.asarray(scen.odom_poses, jnp.float32)
    cap = GraphCapacity(max_poses=1 << (t_frames - 1).bit_length(),
                        max_landmarks=256, max_obs=8192)
    nc = BL._pick_compact(valid)
    for every, blk in ((8, 8), (16, 16), (16, 8), (0, 8), (0, 16)):
        cfg = SlamConfig.improved(capacity=cap, periodic_gn_every=every)
        if not BL.blocked_supported(cfg, blk):
            continue
        obs_p, valid_p, pose_p, _ = BL._pad_inputs(obs, valid, poses, cfg,
                                                   blk)

        def multi(k, cfg=cfg, blk=blk, obs_p=obs_p, valid_p=valid_p,
                  pose_p=pose_p):
            @jax.jit
            def run():
                def one(_, __):
                    st = initial_state(cap)
                    st, _o, done = BL.blocked_core.__wrapped__(
                        st, obs_p, valid_p, pose_p, cfg, blk,
                        compact_obs=nc)
                    return (), st.graph.n_poses + done
                _, ys = jax.lax.scan(one, (), None, length=k)
                return ys
            return run

        sec = timed_slope(multi, 2, 16)
        print(f"improved every={every:2d} B={blk:2d} nc={nc}: "
              f"{t_frames/sec/1e3:8.1f}k f/s ({sec*1e3:6.2f} ms/lap)",
              flush=True)


if __name__ == "__main__":
    main()
