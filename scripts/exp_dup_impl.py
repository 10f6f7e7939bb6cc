"""A/B: packed vs naive in-block duplicate machinery, at the real bench
configs (single-session block=32 and batched S=16), compact_obs=16.

The packed form cuts the fixpoint's working set 32x but pays for packing
(uint32 multiplies) and first-bit extraction (per-row gathers); whether it
wins depends on BN. This script decides DUP_PACKED's default.
"""
import time

import jax
import jax.numpy as jnp

from tpuslam.backend.graph import GraphCapacity
from tpuslam.frontend import blocked as BL
from tpuslam.frontend.state import initial_state
from tpuslam.parallel.batch import initial_states
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
    cfg = SlamConfig(capacity=cap)
    obs_p, valid_p, pose_p, _ = BL._pad_inputs(obs, valid, poses, cfg, 32)

    cap_b = GraphCapacity(max_poses=max(384, t_frames), max_landmarks=256,
                          max_obs=4096)
    t_b = t_frames - t_frames % 32
    ob = jnp.tile(obs[None, :t_b], (16, 1, 1, 1))
    vb = jnp.tile(valid[None, :t_b], (16, 1, 1))
    pb = jnp.tile(poses[None, :t_b], (16, 1, 1))

    for packed in (True, False):
        BL.DUP_PACKED = packed
        for nc in (16, 32):
            def single(k, nc=nc):
                @jax.jit
                def run():
                    def one(_, __):
                        st = initial_state(cap)
                        st, _o, done = BL.blocked_core.__wrapped__(
                            st, obs_p, valid_p, pose_p, cfg, 32,
                            compact_obs=nc)
                        return (), st.graph.n_poses + done
                    _, ys = jax.lax.scan(one, (), None, length=k)
                    return ys
                return run

            sec = timed_slope(single, 4, 32)
            print(f"packed={packed} nc={nc:2d} single: "
                  f"{t_frames/sec/1e3:8.1f}k f/s", flush=True)

            def batched(k, nc=nc):
                @jax.jit
                def run():
                    def one(_, __):
                        sts = initial_states(cap_b, 16)
                        sts, _o, done = jax.vmap(
                            lambda st, o, v, p: BL.blocked_core.__wrapped__(
                                st, o, v, p, cfg, 32, vmap_safe_gn=True,
                                compact_obs=nc))(sts, ob, vb, pb)
                        return (), sts.graph.n_poses[0] + jnp.min(done)
                    _, ys = jax.lax.scan(one, (), None, length=k)
                    return ys
                return run

            sec = timed_slope(batched, 1, 3)
            print(f"packed={packed} nc={nc:2d} S=16:   "
                  f"{16*t_b/sec/1e3:8.1f}k f/s", flush=True)


if __name__ == "__main__":
    main()
