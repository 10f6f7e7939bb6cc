"""Multi-session pod-scale mapping: sessions x edge-shards over one mesh.

BASELINE.json's fifth config: "many laps / map blocks sharded across N>=2
hosts with distributed Schur reduction". A *session* is an independent
mapping problem (its own pose chain + landmark block); sessions are data
parallel over the 'sessions' mesh axis while each session's observation edges
are sharded over the 'edges' axis, whose psum carries the Schur reduction.

The stacked-graph representation is just a FactorGraph whose leaves carry a
leading sessions axis — vmap over the local sessions chunk composes with the
edge-axis shard_map.
"""
from __future__ import annotations

from functools import lru_cache

import jax
import jax.numpy as jnp
from jax.sharding import PartitionSpec as P
from jax import shard_map

from tpuslam.backend import gauss_newton as gn
from tpuslam.backend.graph import FactorGraph, GraphCapacity
from tpuslam.geometry import se2

__all__ = ["stack_graphs", "multisession_optimize"]


def stack_graphs(graphs: list[FactorGraph]) -> FactorGraph:
    """Stack per-session graphs into one pytree with a leading sessions axis."""
    return jax.tree.map(lambda *xs: jnp.stack(xs), *graphs)


def multisession_optimize(stacked: FactorGraph, cfg: gn.GNConfig, mesh,
                          iterations: int | None = None) -> FactorGraph:
    """Run GN on S stacked sessions over a ('sessions','edges') mesh.

    Each device holds S/n_sessions sessions' replicated states and 1/n_edges
    of every session's edge list; assembly psums over 'edges', the reduced
    solves run vmapped per local session. The compiled program is cached per
    (cfg, mesh, iterations, capacity); repeat calls don't re-trace.
    """
    iters = cfg.iterations if iterations is None else iterations
    cap = GraphCapacity(stacked.poses.shape[1], stacked.lm_xy.shape[1],
                        stacked.obs_pose.shape[1])
    return _build_run(cfg, mesh, iters, cap)(stacked)


@lru_cache(maxsize=None)
def _build_run(cfg: gn.GNConfig, mesh, iters: int, cap: GraphCapacity):
    sess_spec = P("sessions")
    sess_edge_spec = P("sessions", "edges")

    in_specs = FactorGraph(
        poses=sess_spec, n_poses=sess_spec, odo_meas=sess_spec,
        odo_w=sess_spec,
        lm_xy=sess_spec, lm_type=sess_spec, n_landmarks=sess_spec,
        obs_pose=sess_edge_spec, obs_lm=sess_edge_spec, obs_xy=sess_edge_spec,
        n_obs=sess_spec, prior_pose=sess_spec, prior_info=sess_spec)

    # global edge offset of this shard, for validity masking
    def one_iteration(st: FactorGraph) -> FactorGraph:
        def per_shard(st_local: FactorGraph) -> FactorGraph:
            shard = jax.lax.axis_index("edges")
            e_local = st_local.obs_pose.shape[1]
            base = shard * e_local

            def per_session(poses, odo_meas, odo_w, n_poses, lm_xy,
                            n_landmarks, obs_pose, obs_lm, obs_xy, n_obs,
                            prior_pose, prior_info):
                dtype = poses.dtype
                e_idx = base + jnp.arange(e_local)
                w_l = jnp.asarray(cfg.lm_info, dtype) * (e_idx < n_obs).astype(dtype)
                parts = gn.landmark_edge_blocks(poses, lm_xy, obs_pose, obs_lm,
                                                obs_xy, w_l, cap.max_landmarks)
                g_tmp = FactorGraph(poses=poses, n_poses=n_poses,
                                    odo_meas=odo_meas, odo_w=odo_w,
                                    lm_xy=lm_xy,
                                    lm_type=jnp.zeros_like(lm_xy[:, 0], jnp.int32),
                                    n_landmarks=n_landmarks,
                                    obs_pose=obs_pose, obs_lm=obs_lm,
                                    obs_xy=obs_xy, n_obs=n_obs,
                                    prior_pose=prior_pose, prior_info=prior_info)
                h_diag_o, h_off, gp_o = gn.assemble_odometry(g_tmp, cfg)
                n_eshards = jax.lax.axis_size("edges")
                scale = 1.0 / n_eshards  # odometry computed on every shard
                return parts, (h_diag_o * scale, h_off * scale, gp_o * scale)

            parts, odo = jax.vmap(per_session)(
                st_local.poses, st_local.odo_meas, st_local.odo_w,
                st_local.n_poses,
                st_local.lm_xy, st_local.n_landmarks, st_local.obs_pose,
                st_local.obs_lm, st_local.obs_xy, st_local.n_obs,
                st_local.prior_pose, st_local.prior_info)
            # THE distributed Schur reduction: sum partial blocks over ICI
            parts, odo = jax.lax.psum((parts, odo), "edges")
            (h_diag_lm, w_mat, hll, gp_lm, gl) = parts
            (h_diag_o, h_off, gp_o) = odo

            def solve(h_diag_lm, w_mat, hll, gp_lm, gl, h_diag_o, h_off, gp_o,
                      poses, lm_xy, n_poses, n_landmarks):
                hpp = gn.densify_hpp(h_diag_o + h_diag_lm, h_off)
                gp = (gp_o + gp_lm).reshape(-1)
                g_tmp = FactorGraph(
                    poses=poses, n_poses=n_poses, odo_meas=poses,
                    odo_w=jnp.ones(poses.shape[0], poses.dtype),
                    lm_xy=lm_xy, lm_type=jnp.zeros_like(lm_xy[:, 0], jnp.int32),
                    n_landmarks=n_landmarks,
                    obs_pose=jnp.zeros((1,), jnp.int32),
                    obs_lm=jnp.zeros((1,), jnp.int32),
                    obs_xy=jnp.zeros((1, 2), poses.dtype),
                    n_obs=jnp.int32(0),
                    prior_pose=jnp.zeros_like(poses),
                    prior_info=jnp.zeros((poses.shape[0], 2), poses.dtype))
                blocks = gn._apply_gauge(g_tmp, cfg, hpp, w_mat, hll, gp, gl)
                dp, dl = gn.schur_solve(*blocks)
                new_poses = poses + dp.reshape(-1, 3)
                new_poses = new_poses.at[:, 2].set(se2.wrap_angle(new_poses[:, 2]))
                return new_poses, lm_xy + dl

            new_poses, new_lm = jax.vmap(solve)(
                h_diag_lm, w_mat, hll, gp_lm, gl, h_diag_o, h_off, gp_o,
                st_local.poses, st_local.lm_xy, st_local.n_poses,
                st_local.n_landmarks)
            import dataclasses as _dc
            return _dc.replace(st_local, poses=new_poses, lm_xy=new_lm)

        return shard_map(per_shard, mesh=mesh, in_specs=(in_specs,),
                         out_specs=in_specs)(st)

    @jax.jit
    def run(st):
        with jax.default_matmul_precision("highest"):
            def body(_, s):
                return one_iteration(s)
            return jax.lax.fori_loop(0, iters, body, st)

    return run
