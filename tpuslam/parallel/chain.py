"""Pose-chain (sequence) parallelism: contiguous keyframe blocks per device.

The SLAM analogue of context/sequence parallelism (SURVEY.md §2.4, §5.7): the
ever-growing keyframe chain is partitioned into contiguous blocks across the
'chain' mesh axis. Each device holds its pose block plus the landmark edges
whose observing pose it owns, and assembles its *rows* of the normal
equations locally. Communication:

- `ppermute` halo exchange of each block's last pose to its right neighbor
  (the odometry edge crossing a block boundary needs the predecessor pose);
- `psum` of the landmark-diagonal blocks Hll and gradient gl (landmarks are
  global, observed from many blocks);
- `all_gather` of the per-block Hpp rows / W rows / gp into the reduced pose
  system, which every device then solves identically (at Formula-Student
  scale the reduced solve is tiny next to assembly; on larger chains this is
  where a distributed block-tridiagonal factorization slots in).

Numerically identical to the single-device gn_step; verified in
tests/test_parallel.py.
"""
from __future__ import annotations

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
from jax import shard_map
from jax.sharding import PartitionSpec as P

from tpuslam.backend import gauss_newton as gn
from tpuslam.backend.graph import FactorGraph
from tpuslam.backend.residuals import odometry_residuals
from tpuslam.geometry import se2

__all__ = ["partition_edges_by_pose_block", "chain_gn_step", "chain_optimize"]


def partition_edges_by_pose_block(g: FactorGraph, n_shards: int) -> FactorGraph:
    """Reorder the edge list so each pose-block's edges are contiguous and
    equally sized (host-side, once per solve). Edges of block d occupy slice
    [d*Eb, d*Eb + count_d); invalid padding has zero weight via n_obs-style
    masking replaced by an explicit validity convention: padded entries point
    at pose 0 / landmark 0 and are filtered by the per-edge valid flag we
    rebuild inside the solver from the counts array stored in n_obs slots.

    Returns a graph whose obs_* arrays are reordered+padded, with
    `n_obs` replaced by the TOTAL count (unchanged semantics for other
    consumers is NOT preserved — use the result only with chain_gn_step).
    """
    cap = g.capacity
    d = n_shards
    e_cap = cap.max_obs
    eb = e_cap // d
    n_obs = int(g.n_obs)
    block = cap.max_poses // d
    op = np.asarray(g.obs_pose)[:n_obs]
    ol = np.asarray(g.obs_lm)[:n_obs]
    oxy = np.asarray(g.obs_xy)[:n_obs]
    owner = op // block
    new_op = np.zeros(e_cap, np.int32)
    new_ol = np.zeros(e_cap, np.int32)
    new_oxy = np.zeros((e_cap, 2), np.float32)
    counts = np.zeros(d, np.int64)
    for dev in range(d):
        sel = np.flatnonzero(owner == dev)
        if len(sel) > eb:
            raise ValueError(f"block {dev} has {len(sel)} edges > per-block "
                             f"capacity {eb}; raise max_obs")
        base = dev * eb
        counts[dev] = len(sel)
        new_op[base:base + len(sel)] = op[sel]
        new_ol[base:base + len(sel)] = ol[sel]
        new_oxy[base:base + len(sel)] = oxy[sel]
    g2 = dataclasses.replace(
        g, obs_pose=jnp.asarray(new_op), obs_lm=jnp.asarray(new_ol),
        obs_xy=jnp.asarray(new_oxy), n_obs=g.n_obs)
    return g2, jnp.asarray(counts, jnp.int32)


def chain_gn_step(g: FactorGraph, edge_counts, cfg: gn.GNConfig, mesh) -> FactorGraph:
    """One GN iteration with poses AND their edges sharded along 'chain'."""
    cap = g.capacity
    n_dev = mesh.devices.size
    block = cap.max_poses // n_dev
    dtype = g.poses.dtype

    pose_spec = P("chain")
    rep = P()

    def per_shard(poses_l, odo_l, odo_w_sh, prior_pose_l, prior_info_l,
                  obs_pose_l, obs_lm_l, obs_xy_l, counts_l,
                  lm_xy, n_poses, n_landmarks):
        dev = jax.lax.axis_index("chain")
        base = dev * block

        # --- halo: previous block's last pose from the left neighbor
        perm = [(i, (i + 1) % n_dev) for i in range(n_dev)]
        halo = jax.lax.ppermute(poses_l[-1:], "chain", perm)[0]

        k_local = jnp.arange(block)
        k_global = base + k_local
        p_prev = jnp.concatenate([halo[None, :], poses_l[:-1]], axis=0)
        odo_valid = (k_global >= 1) & (k_global < n_poses)
        r_o, j_oi, j_oj = odometry_residuals(p_prev, poses_l, odo_l)
        w_o = jnp.asarray(cfg.odo_info, dtype) * odo_valid.astype(dtype) \
            * odo_w_sh
        w3 = w_o[:, None, None]
        jti = jnp.swapaxes(j_oi, -1, -2)
        jtj = jnp.swapaxes(j_oj, -1, -2)
        a_ii = w3 * (jti @ j_oi)          # contribution to (k-1, k-1)
        a_jj = w3 * (jtj @ j_oj)          # to (k, k)
        h_off_l = w3 * (jti @ j_oj)       # to (k-1, k)
        g_i = w_o[:, None] * (jti @ r_o[..., None])[..., 0]
        g_j = w_o[:, None] * (jtj @ r_o[..., None])[..., 0]

        # a_ii/g_i of the block's FIRST edge belongs to the left neighbor's
        # last pose: send it back with the reverse permutation
        back = [((i + 1) % n_dev, i) for i in range(n_dev)]
        a_ii_halo = jax.lax.ppermute(a_ii[:1], "chain", back)[0]
        g_i_halo = jax.lax.ppermute(g_i[:1], "chain", back)[0]
        h_diag_l = a_jj.at[:-1].add(a_ii[1:]).at[-1].add(a_ii_halo)
        gp_l = g_j.at[:-1].add(g_i[1:]).at[-1].add(g_i_halo)

        # --- absolute priors (local)
        pose_valid = (k_global < n_poses).astype(dtype)
        ixy = prior_info_l[:, 0] * pose_valid
        ith = prior_info_l[:, 1] * pose_valid
        eye_xy = jnp.zeros((3, 3), dtype).at[0, 0].set(1.0).at[1, 1].set(1.0)
        eye_th = jnp.zeros((3, 3), dtype).at[2, 2].set(1.0)
        h_diag_l = h_diag_l + ixy[:, None, None] * eye_xy + ith[:, None, None] * eye_th
        r_pr = poses_l - prior_pose_l
        r_pr = r_pr.at[:, 2].set(se2.wrap_angle(r_pr[:, 2]))
        gp_l = gp_l + r_pr * jnp.stack([ixy, ixy, ith], axis=-1)

        # --- landmark edges owned by this block (pose indices localized)
        eb = obs_pose_l.shape[0]
        w_l = jnp.asarray(cfg.lm_info, dtype) * \
            (jnp.arange(eb) < counts_l[0]).astype(dtype)
        local_idx = jnp.clip(obs_pose_l - base, 0, block - 1)  # pad-safe
        h_diag_lm, w_rows, hll_part, gp_lm, gl_part = gn.landmark_edge_blocks(
            poses_l, lm_xy, local_idx, obs_lm_l, obs_xy_l, w_l,
            cap.max_landmarks)
        h_diag_l = h_diag_l + h_diag_lm
        gp_l = gp_l + gp_lm

        # --- the distributed reductions
        hll, gl = jax.lax.psum((hll_part, gl_part), "chain")
        h_diag = jax.lax.all_gather(h_diag_l, "chain").reshape(-1, 3, 3)
        h_off = jax.lax.all_gather(h_off_l, "chain").reshape(-1, 3, 3)
        gp = jax.lax.all_gather(gp_l, "chain").reshape(-1, 3)
        w_mat = jax.lax.all_gather(w_rows.reshape(block, 3, -1), "chain") \
            .reshape(cap.max_poses * 3, -1)
        poses_full = jax.lax.all_gather(poses_l, "chain").reshape(-1, 3)

        # --- replicated reduced solve (identical on every device)
        hpp = gn.densify_hpp(h_diag, h_off)
        g_tmp = FactorGraph(  # shape/count carrier for _apply_gauge only
            poses=poses_full, n_poses=n_poses, odo_meas=poses_full,
            odo_w=jnp.ones(poses_full.shape[0], dtype),
            lm_xy=lm_xy, lm_type=jnp.zeros(lm_xy.shape[0], jnp.int32),
            n_landmarks=n_landmarks,
            obs_pose=jnp.zeros((1,), jnp.int32),
            obs_lm=jnp.zeros((1,), jnp.int32),
            obs_xy=jnp.zeros((1, 2), dtype), n_obs=jnp.int32(0),
            prior_pose=jnp.zeros_like(poses_full),
            prior_info=jnp.zeros((poses_full.shape[0], 2), dtype))
        blocks = gn._apply_gauge(g_tmp, cfg, hpp, w_mat, hll,
                                 gp.reshape(-1), gl)
        dp, dl = gn.schur_solve(*blocks)
        new_poses_full = poses_full + dp.reshape(-1, 3)
        new_poses_full = new_poses_full.at[:, 2].set(
            se2.wrap_angle(new_poses_full[:, 2]))
        new_lm = lm_xy + dl
        # back to this device's pose block
        new_local = jax.lax.dynamic_slice(new_poses_full, (base, 0), (block, 3))
        return new_local, new_lm

    fn = shard_map(
        per_shard, mesh=mesh,
        in_specs=(pose_spec, pose_spec, pose_spec, pose_spec, pose_spec,
                  pose_spec, pose_spec, pose_spec, pose_spec,
                  rep, rep, rep),
        out_specs=(pose_spec, rep),
        check_vma=False)  # lm output replication is by construction (post-psum)
    with jax.default_matmul_precision("highest"):
        new_poses, new_lm = fn(
            g.poses, g.odo_meas, g.odo_w, g.prior_pose, g.prior_info,
            g.obs_pose, g.obs_lm, g.obs_xy, edge_counts,
            g.lm_xy, g.n_poses, g.n_landmarks)
    return dataclasses.replace(g, poses=new_poses, lm_xy=new_lm)


def chain_optimize(g: FactorGraph, cfg: gn.GNConfig, mesh,
                   edge_counts=None) -> FactorGraph:
    """Full chain-parallel GN: partition edges once, iterate under jit."""
    if edge_counts is None:
        g, edge_counts = partition_edges_by_pose_block(g, mesh.devices.size)

    @jax.jit
    def run(g, counts):
        def body(_, gg):
            return chain_gn_step(gg, counts, cfg, mesh)
        return jax.lax.fori_loop(0, cfg.iterations, body, g)

    return run(g, edge_counts)
