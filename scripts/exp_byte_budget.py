"""Per-subsystem HBM byte attribution of the batched blocked pass.

VERDICT r3 weak #1: the pass moves ~0.5 GB/session (~1 MB/keyframe) and
nobody attributed those bytes to arrays. This script compiles the S-session
batched pass with one subsystem ablated at a time (frontend/blocked.py
`ablate` hooks — measurement-only) and diffs XLA cost-analysis bytes/FLOPs,
then cross-checks with measured device time for the biggest terms.

The candidate hog (static arithmetic): the in-block duplicate machinery is
O((B*Nc)^2) — at block=32, compact_obs=32 the [1024, 1024] f32 pair matrix
is 4 MB and the dup fixpoint re-reads the [BN, BN] bool mask ~8x, i.e.
tens of MB per block x 11 blocks x S sessions.
"""
import time

import jax
import jax.numpy as jnp

from tpuslam.backend.graph import GraphCapacity
from tpuslam.frontend import blocked as BL
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


def main(s_n=16, block=32, compact=32, run_timed=True):
    scens = [simulate(trackdrive(seed=11), SimConfig(
        laps=1.4, keyframe_dt=0.1, speed=8.0, max_range=20.0, seed=20 + s))
        for s in range(min(s_n, 16))]
    t_b = min(len(sc.times) for sc in scens)
    t_b -= t_b % block
    cap = GraphCapacity(max_poses=max(384, t_b), max_landmarks=256,
                        max_obs=4096)
    cfg = SlamConfig(capacity=cap)
    obs = jnp.stack([jnp.asarray(sc.obs[:t_b], jnp.float32) for sc in scens])
    valid = jnp.stack([jnp.asarray(sc.obs_valid[:t_b]) for sc in scens])
    poses = jnp.stack([jnp.asarray(sc.odom_poses[:t_b], jnp.float32)
                       for sc in scens])
    if s_n > len(scens):
        reps = s_n // len(scens)
        obs = jnp.tile(obs, (reps, 1, 1, 1))
        valid = jnp.tile(valid, (reps, 1, 1))
        poses = jnp.tile(poses, (reps, 1, 1))

    def _batched(sts, ablate, compact_obs):
        return jax.vmap(
            lambda st, o, v, p: BL.blocked_core.__wrapped__(
                st, o, v, p, cfg, block, vmap_safe_gn=True,
                compact_obs=compact_obs, ablate=ablate))(
            sts, obs, valid, poses)

    def runner(ablate, compact_obs=compact):
        def multi(k):
            @jax.jit
            def run():
                def one(_, __):
                    sts = initial_states(cap, s_n)
                    sts, _o, done = _batched(sts, ablate, compact_obs)
                    return (), sts.graph.n_poses[0] + jnp.min(done)
                _, ys = jax.lax.scan(one, (), None, length=k)
                return ys
            return run
        return multi

    def min_done(ablate, compact_obs=compact):
        sts = initial_states(cap, s_n)
        _s, _o, done = _batched(sts, ablate, compact_obs)
        return int(jnp.min(done))

    cases = [
        ("baseline", frozenset(), compact),
        ("no-dup", frozenset({"dup"}), compact),
        ("no-assoc", frozenset({"assoc"}), compact),
        ("no-packet", frozenset({"packet"}), compact),
        ("no-edges", frozenset({"edges"}), compact),
        ("no-gn", frozenset({"gn"}), compact),
        ("no-dup-assoc-packet", frozenset({"dup", "assoc", "packet"}),
         compact),
        ("compact16", frozenset(), 16),
    ]
    base_bytes = base_flops = base_sec = None
    print(f"S={s_n} block={block} t={t_b} frames; "
          f"bytes/flops from XLA cost analysis of the compiled pass",
          flush=True)
    for name, ab, co in cases:
        r = runner(ab, co)
        one_pass = r(1)
        ca = one_pass.lower().compile().cost_analysis()
        if isinstance(ca, (list, tuple)):
            ca = ca[0]
        byts = float(ca.get("bytes accessed", 0.0))
        flops = float(ca.get("flops", 0.0))
        msg = (f"{name:22s} bytes={byts/1e9:7.3f} GB "
               f"({byts/s_n/1e6:6.1f} MB/sess) flops={flops/1e9:6.2f} G")
        if base_bytes is not None:
            msg += (f"  d_bytes={-(byts-base_bytes)/1e9:+7.3f} GB"
                    f" ({-(byts-base_bytes)/base_bytes*100:+5.1f}%)")
        if run_timed and jax.default_backend() == "tpu":
            sec = timed_slope(r, 1, 3, reps=3)
            fps = s_n * t_b / sec
            msg += f"  sec/pass={sec:7.4f} fps={fps/1e3:7.1f}k"
            msg += f" done={min_done(ab, co)}/{t_b}"
            if base_sec is None:
                base_sec = sec
        print(msg, flush=True)
        if base_bytes is None:
            base_bytes, base_flops = byts, flops


if __name__ == "__main__":
    import sys
    s = int(sys.argv[1]) if len(sys.argv) > 1 else 16
    main(s_n=s)
