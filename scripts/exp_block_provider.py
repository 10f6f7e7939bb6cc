"""Block-size sweep + association-provider composition measurements.

1. Primary blocked throughput vs block size (8/16/32) — does a bigger block
   amortize more per-scan-step overhead?
2. Pallas-provider blocked pass vs dense blocked pass at the bench map size
   (L=256) and at a pod-scale map (L=4096) — where does the kernel win?
"""
import time

import numpy as np
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


def run_one(name, cfg, cap, obs, valid, poses, block, t_frames):
    obs_p, valid_p, pose_p, _ = BL._pad_inputs(obs, valid, poses, cfg, block)

    def multi(k):
        @jax.jit
        def run():
            def one(_, __):
                st = initial_state(cap)
                st, _o, done = BL.blocked_core.__wrapped__(
                    st, obs_p, valid_p, pose_p, cfg, block)
                return (), st.graph.n_poses + done
            _, ys = jax.lax.scan(one, (), None, length=k)
            return ys
        return run

    sec = timed_slope(multi, 2, 8)
    print(f"{name}: {t_frames / sec:10.1f} f/s  ({sec*1e3:.2f} ms/lap)",
          flush=True)


def main():
    track = trackdrive(seed=11)
    scen = simulate(track, SimConfig(laps=1.4, keyframe_dt=0.1, speed=8.0,
                                     max_range=20.0, seed=12))
    t_frames = len(scen.times)
    obs = jnp.asarray(scen.obs, jnp.float32)
    valid = jnp.asarray(scen.obs_valid)
    poses = jnp.asarray(scen.odom_poses, jnp.float32)

    cap = GraphCapacity(max_poses=1 << (t_frames - 1).bit_length(),
                        max_landmarks=256, max_obs=8192)
    for blk in (8, 16, 32):
        run_one(f"compat dense  B={blk:2d} L=256 ", SlamConfig(capacity=cap),
                cap, obs, valid, poses, blk, t_frames)
    cfgn = SlamConfig(capacity=cap, association="nearest")
    run_one("nearest dense  B=16 L=256 ", cfgn, cap, obs, valid, poses, 16,
            t_frames)
    run_one("nearest pallas B=16 L=256 ",
            cfgn.with_(use_pallas_association=True), cap, obs, valid, poses,
            16, t_frames)

    # batched: does a smaller block (quadratically smaller [S, BN, BN]
    # working set) win at large S where the sweep declined?
    from tpuslam.parallel.batch import initial_states
    cap_b = GraphCapacity(max_poses=384, max_landmarks=256, max_obs=4096)
    cfg_b = SlamConfig(capacity=cap_b)
    t_b = t_frames - (t_frames % 16)
    for s_n, blk in ((64, 16), (64, 8), (256, 16), (256, 8)):
        o = jnp.tile(obs[None, :t_b], (s_n, 1, 1, 1))
        v = jnp.tile(valid[None, :t_b], (s_n, 1, 1))
        p = jnp.tile(poses[None, :t_b], (s_n, 1, 1))

        def multi(k, o=o, v=v, p=p, s_n=s_n, blk=blk):
            @jax.jit
            def run():
                def one(_, __):
                    sts = initial_states(cap_b, s_n)
                    sts, _o2, done = BL.blocked_core_batched.__wrapped__(
                        sts, o, v, p, cfg_b, blk)
                    return (), sts.graph.n_poses[0] + jnp.min(done)
                _, ys = jax.lax.scan(one, (), None, length=k)
                return ys
            return run

        sec = timed_slope(multi, 1, 3, reps=2)
        print(f"batched S={s_n:3d} B={blk:2d}: {s_n * t_b / sec:10.1f} f/s"
              f"  ({sec*1e3:.1f} ms/pass)", flush=True)

    # pod-scale map: landmark capacity 4096 (the dense [BN, L] matrix is
    # 512 x 4096 per block here)
    cap_big = GraphCapacity(max_poses=1 << (t_frames - 1).bit_length(),
                            max_landmarks=4096, max_obs=8192)
    cfgb = SlamConfig(capacity=cap_big, association="nearest")
    run_one("nearest dense  B=16 L=4096", cfgb, cap_big, obs, valid, poses,
            16, t_frames)
    run_one("nearest pallas B=16 L=4096",
            cfgb.with_(use_pallas_association=True), cap_big, obs, valid,
            poses, 16, t_frames)


if __name__ == "__main__":
    main()
