"""Experiment: improved-full blocked throughput under periodic-GN variants.

V0: current in-scan GN (bucketed -> lax.switch inside the scan body).
V1: in-scan GN with bucketing disabled (straight-line GN in the scan).

Slope-timed like bench.py (tunnel constant cancels).
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
    cfg0 = SlamConfig.improved(capacity=cap)
    obs_p, valid_p, pose_p, _ = BL._pad_inputs(obs, valid, poses, cfg0, 8)

    def run_variant(name, cfg, vmap_safe):
        def multi(k):
            @jax.jit
            def run():
                def one(_, __):
                    st = initial_state(cap)
                    st, _o, done = BL.blocked_core.__wrapped__(
                        st, obs_p, valid_p, pose_p, cfg, 8,
                        vmap_safe_gn=vmap_safe)
                    return (), st.graph.n_poses + done
                _, ys = jax.lax.scan(one, (), None, length=k)
                return ys
            return run
        t0 = time.perf_counter()
        sec = timed_slope(multi, 2, 8)
        print(f"{name}: {t_frames / sec:10.1f} f/s   "
              f"({sec*1e3:.2f} ms/lap, setup {time.perf_counter()-t0:.1f}s)",
              flush=True)

    # V0 (in-scan GN bucketed) = 4,388 f/s per BENCH_r02 — not re-run here.
    run_variant("REF no periodic GN      ",
                SlamConfig.improved(capacity=cap, periodic_gn_every=0), False)
    run_variant("V1 in-scan GN switchfree", cfg0, True)


if __name__ == "__main__":
    main()
