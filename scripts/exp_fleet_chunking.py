#!/usr/bin/env python
"""Measured alternative for the S>64 batched falloff: chunk the fleet axis.

Question: at S=256 the flat vmapped pass falls to ~425k f/s while the
S=16-64 plateau holds ~590-650k (BENCH_local_r04 batched_sweep) because
XLA's modeled bytes/session grow with S. Would scanning over S/64 chunks
of 64 inside ONE program recover plateau throughput?

Answer (TPU v5e, 2026-08-21): NO — ~6x worse, not better.

    flat   S=256        : 424,752 f/s
    chunked 256 = 4 x 64:  69,515 f/s
    chunked 256 = 8 x 32:  74,558 f/s

Why: the chunk-scan body then CONTAINS the batched closure GN and the
full stacked inputs — ARCHITECTURE.md §8 pathology 2 (a loop body that
merely contains the GN temporaries runs ~3x slower, and executing it
per chunk costs more) plus per-iteration buffer copies of the stacked
chunk inputs. Conclusion recorded in ARCHITECTURE.md §9: serve big
fleets as independent plateau-sized dispatches, not one mega-program.

Run on a chip to reproduce (takes ~5 min):
    python scripts/exp_fleet_chunking.py
"""
import time

import jax
import jax.numpy as jnp

from tpuslam.backend.graph import GraphCapacity
from tpuslam.runtime.config import SlamConfig
from tpuslam.sim import SimConfig, simulate, trackdrive
import tpuslam.frontend.blocked as BL
from tpuslam.parallel.batch import initial_states


def main(S=256, n_sess=16):
    scens = [simulate(trackdrive(seed=11),
                      SimConfig(laps=1.4, keyframe_dt=0.1, speed=8.0,
                                max_range=20.0, seed=20 + s))
             for s in range(n_sess)]
    t_b = min(len(sc.times) for sc in scens)
    cap_b = GraphCapacity(max_poses=max(384, t_b), max_landmarks=256,
                          max_obs=4096)
    cfg_b = SlamConfig(capacity=cap_b)
    obs_b = jnp.stack([jnp.asarray(sc.obs[:t_b], jnp.float32)
                       for sc in scens])
    valid_b = jnp.stack([jnp.asarray(sc.obs_valid[:t_b]) for sc in scens])
    poses_b = jnp.stack([jnp.asarray(sc.odom_poses[:t_b], jnp.float32)
                         for sc in scens])
    pad = (-t_b) % 32
    if pad:
        far = jnp.full((n_sess, pad, 3), 2.0 * cfg_b.gps_outlier_bound + 1.0,
                       jnp.float32)
        obs_b = jnp.concatenate(
            [obs_b, jnp.zeros((n_sess, pad) + obs_b.shape[2:],
                              obs_b.dtype)], 1)
        valid_b = jnp.concatenate(
            [valid_b, jnp.zeros((n_sess, pad) + valid_b.shape[2:], bool)], 1)
        poses_b = jnp.concatenate([poses_b, far], 1)
    compact = BL._pick_compact(valid_b)
    reps = S // n_sess
    o = jnp.tile(obs_b, (reps, 1, 1, 1))
    v = jnp.tile(valid_b, (reps, 1, 1))
    p = jnp.tile(poses_b, (reps, 1, 1))

    def flat_runner(k):
        @jax.jit
        def run():
            def one(_, __):
                sts = initial_states(cap_b, S)
                sts, _o2, done = BL.blocked_core_batched.__wrapped__(
                    sts, o, v, p, cfg_b, 32, compact_obs=compact)
                return (), sts.graph.n_poses[0] + jnp.min(done)
            _, ys = jax.lax.scan(one, (), None, length=k)
            return ys
        return run

    def chunked_runner(chunk):
        nch = S // chunk
        oc = o.reshape(nch, chunk, *o.shape[1:])
        vc = v.reshape(nch, chunk, *v.shape[1:])
        pc = p.reshape(nch, chunk, *p.shape[1:])

        def mk(k):
            @jax.jit
            def run():
                def one(_, __):
                    def ch(_, inp):
                        oo, vv, pp = inp
                        sts = initial_states(cap_b, chunk)
                        sts, _o2, done = BL.blocked_core_batched.__wrapped__(
                            sts, oo, vv, pp, cfg_b, 32, compact_obs=compact)
                        return (), sts.graph.n_poses[0] + jnp.min(done)
                    _, ys = jax.lax.scan(ch, (), (oc, vc, pc))
                    return (), jnp.sum(ys)
                _, ys = jax.lax.scan(one, (), None, length=k)
                return ys
            return run
        return mk

    def slope(mk, k1, k2, r=3):
        f1, f2 = mk(k1), mk(k2)
        _ = int(jnp.sum(f1())); _ = int(jnp.sum(f2()))
        t1 = t2 = 1e9
        for _i in range(r):
            t0 = time.perf_counter(); _ = int(jnp.sum(f1()))
            t1 = min(t1, time.perf_counter() - t0)
            t0 = time.perf_counter(); _ = int(jnp.sum(f2()))
            t2 = min(t2, time.perf_counter() - t0)
        return (t2 - t1) / (k2 - k1)

    sec = slope(flat_runner, 1, 3)
    print(f"flat S={S}: {S * t_b / sec:,.1f} f/s", flush=True)
    for chunk in (64, 32):
        sec = slope(chunked_runner(chunk), 1, 3)
        print(f"chunked {S} = {S // chunk} x {chunk}: "
              f"{S * t_b / sec:,.1f} f/s", flush=True)


if __name__ == "__main__":
    main()
