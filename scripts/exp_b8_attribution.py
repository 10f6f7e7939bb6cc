"""Where does the small-block (B=8) pass spend its time?

exp_unroll_cadence.py shows scan unrolling does NOT recover block=32's
throughput at block=8 (26k f/s at any unroll vs 161k at B=32) — so the
cost is in the body's ops themselves (per-op dispatch/latency floors on
tiny tensors), not XLA while-loop bookkeeping. This script ablates one
subsystem at a time (frontend/blocked.py `ablate` hooks) at B=8/16/32 and
prints the time each one is responsible for.
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
    track = trackdrive(seed=11)
    scen = simulate(track, SimConfig(laps=1.4, keyframe_dt=0.1, speed=8.0,
                                     max_range=20.0, seed=12))
    t_frames = len(scen.times)
    obs = jnp.asarray(scen.obs, jnp.float32)
    valid = jnp.asarray(scen.obs_valid)
    poses = jnp.asarray(scen.odom_poses, jnp.float32)
    cap = GraphCapacity(max_poses=1 << (t_frames - 1).bit_length(),
                        max_landmarks=256, max_obs=8192)
    cfg = SlamConfig(capacity=cap)

    cases = [("baseline", frozenset()),
             ("no-dup", frozenset({"dup"})),
             ("no-assoc", frozenset({"assoc"})),
             ("no-packet", frozenset({"packet"})),
             ("no-edges", frozenset({"edges"})),
             ("no-gn", frozenset({"gn"})),
             ("no-everything", frozenset({"dup", "assoc", "packet", "edges",
                                          "gn"}))]
    for blk in (8, 16, 32):
        obs_p, valid_p, pose_p, _ = BL._pad_inputs(obs, valid, poses, cfg,
                                                   blk)
        base_ms = None
        for name, ab in cases:
            def multi(k, ab=ab, blk=blk, obs_p=obs_p, valid_p=valid_p,
                      pose_p=pose_p):
                @jax.jit
                def run():
                    def one(_, __):
                        st = initial_state(cap)
                        st, _o, done = BL.blocked_core.__wrapped__(
                            st, obs_p, valid_p, pose_p, cfg, blk, ablate=ab)
                        return (), st.graph.n_poses + done
                    _, ys = jax.lax.scan(one, (), None, length=k)
                    return ys
                return run

            sec = timed_slope(multi, 4, 32)
            ms = sec * 1e3
            extra = "" if base_ms is None else \
                f"  saves {base_ms - ms:+6.2f} ms ({(base_ms-ms)/base_ms*100:+5.1f}%)"
            print(f"B={blk:2d} {name:14s} {t_frames/sec:10.1f} f/s "
                  f"({ms:6.2f} ms/lap){extra}", flush=True)
            if base_ms is None:
                base_ms = ms


if __name__ == "__main__":
    main()
