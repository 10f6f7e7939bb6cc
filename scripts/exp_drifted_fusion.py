"""Reproduce + attack the drifted-fusion error (VERDICT r4 next #4).

Mirrors bench.py's fusion_section drifted variant on the CPU backend so
registration-quality changes can be iterated without the TPU tunnel.
Run: python scripts/exp_drifted_fusion.py
"""
import os
os.environ.setdefault("XLA_FLAGS", "--xla_force_host_platform_device_count=8")
import sys
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import jax
jax.config.update("jax_platforms", "cpu")
import dataclasses as _dc
import jax.numpy as jnp
import numpy as np

from tpuslam.backend import gauss_newton as gnb
from tpuslam.backend.graph import GraphCapacity
from tpuslam.frontend import blocked as BL
from tpuslam.parallel import fusion
from tpuslam.parallel.batch import initial_states
from tpuslam.runtime.config import SlamConfig
from tpuslam.sim import SimConfig, simulate, trackdrive


def main():
    s_f = 8
    track = trackdrive(seed=11)
    scens_f = [simulate(track, SimConfig(
        laps=1.4, keyframe_dt=0.1, speed=8.0, max_range=20.0, seed=60 + s))
        for s in range(s_f)]
    t_f = min(len(sc.times) for sc in scens_f)
    t_f -= t_f % 16
    cap_f = GraphCapacity(max_poses=max(384, t_f), max_landmarks=256,
                          max_obs=4096)
    cfg_f = SlamConfig.improved(capacity=cap_f, association="mahalanobis",
                                periodic_gn_every=16)
    obs_f = jnp.stack([jnp.asarray(sc.obs[:t_f], jnp.float32)
                       for sc in scens_f])
    valid_f = jnp.stack([jnp.asarray(sc.obs_valid[:t_f])
                         for sc in scens_f])
    poses_f = jnp.stack([jnp.asarray(sc.odom_poses[:t_f], jnp.float32)
                         for sc in scens_f])
    fcfg = gnb.GNConfig(odo_info=cfg_f.odo_info, lm_info=cfg_f.lm_info,
                        iterations=10, fix_first_poses=0,
                        fix_first_landmarks=0, solve_bucket_step=0,
                        edge_bucket_step=0, early_exit_tol=1e-4)
    gate_f = cfg_f.same_cone_threshold

    rngd = np.random.default_rng(7)
    offs = rngd.uniform([-0.6, -0.6, -0.04], [0.6, 0.6, 0.04], (s_f, 3))
    offs[0] = 0.0
    c, si = np.cos(offs[:, 2]), np.sin(offs[:, 2])
    p_np = np.asarray(poses_f)
    xy = np.einsum("sij,stj->sti",
                   np.stack([np.stack([c, si], -1),
                             np.stack([-si, c], -1)], 1), p_np[:, :, :2])
    poses_d = np.stack([xy[..., 0] + offs[:, None, 0],
                        xy[..., 1] + offs[:, None, 1],
                        p_np[:, :, 2] + offs[:, None, 2]], -1)
    sts_d, _od = BL.run_sequences_blocked_batched(
        initial_states(cap_f, s_f), obs_f, valid_f,
        jnp.asarray(poses_d, jnp.float32), cfg_f, 16)
    st_drift = sts_d.graph
    gate_d = 2.0 * gate_f

    def err_of(fused):
        lmd = np.asarray(fused.lm_xy)[:int(fused.n_landmarks)]
        return float(np.median(np.linalg.norm(
            lmd[:, None, :] - track.cones_xy[None], axis=-1).min(axis=1)))

    # anchored reference (same sessions, no drift)
    sts_a, _ = BL.run_sequences_blocked_batched(
        initial_states(cap_f, s_f), obs_f, valid_f, poses_f, cfg_f, 16)
    fused_a, _ = fusion.fuse_sessions(sts_a.graph, cfg=fcfg, gate=gate_f,
                                      lm_info=sts_a.lm_info_xy, align=False)
    print(f"anchored      : {err_of(fused_a):.4f} "
          f"(nlm {int(fused_a.n_landmarks)})")

    for kw in ({}, dict(align_iters=16), dict(robust=True),
               dict(robust=True, align_iters=16),
               dict(robust=True, consensus_rounds=2),
               dict(robust=True, align_iters=16, consensus_rounds=2)):
        try:
            fused_d, rep_d = fusion.fuse_sessions(
                st_drift, cfg=fcfg, gate=gate_d,
                lm_info=sts_d.lm_info_xy, align=True, **kw)
            print(f"drifted {str(kw):48s}: {err_of(fused_d):.4f} "
                  f"(nlm {int(fused_d.n_landmarks)})")
        except TypeError as e:
            print(f"drifted {str(kw):48s}: not supported ({e})")


if __name__ == "__main__":
    main()
