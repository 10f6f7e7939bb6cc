"""Decouple periodic-GN cadence from block size via scan unrolling.

VERDICT r3 weak #2: every-8 refinement forces block=8 (firing boundaries
must land on block ends), and block=8 runs 4.3x slower than block=16 —
mostly XLA while-loop per-iteration tax, not compute. lax.scan(unroll=u)
runs the SAME op sequence (bit-exact) with u x fewer loop iterations, so
it should recover the large-block amortization at any cadence.

Measures (trackdrive, real chip): improved-full every-8 at block=8 over
unroll 1/2/4/8; every-16 at block=16 over unroll 1/2; plain compat at
block=8 with unroll 4 vs block=32 unroll 1 (is unroll the whole story?).

Results (v5e, 2026-08-21 — run this script to refresh):
  every= 8 B= 8 unroll=1:    15.1k f/s   (the r3 number)
  every= 8 B= 8 unroll=4:    see table printed by this script
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


def run_one(name, cfg, cap, obs, valid, poses, block, unroll, t_frames,
            k=(2, 16)):
    obs_p, valid_p, pose_p, _ = BL._pad_inputs(obs, valid, poses, cfg, block)

    def multi(kk):
        @jax.jit
        def run():
            def one(_, __):
                st = initial_state(cap)
                st, _o, done = BL.blocked_core.__wrapped__(
                    st, obs_p, valid_p, pose_p, cfg, block, unroll=unroll)
                return (), st.graph.n_poses + done
            _, ys = jax.lax.scan(one, (), None, length=kk)
            return ys
        return run

    sec = timed_slope(multi, *k)
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

    for every, blk, unroll in ((8, 8, 1), (8, 8, 2), (8, 8, 4), (8, 8, 8),
                               (16, 16, 1), (16, 16, 2)):
        cfg = SlamConfig.improved(capacity=cap, periodic_gn_every=every)
        run_one(f"improved every={every:2d} B={blk:2d} unroll={unroll}",
                cfg, cap, obs, valid, poses, blk, unroll, t_frames)

    for blk, unroll in ((8, 1), (8, 4), (16, 1), (16, 2), (32, 1)):
        cfg = SlamConfig(capacity=cap)
        run_one(f"compat          B={blk:2d} unroll={unroll}",
                cfg, cap, obs, valid, poses, blk, unroll, t_frames,
                k=(4, 32))


if __name__ == "__main__":
    main()
