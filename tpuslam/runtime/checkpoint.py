"""Checkpoint / resume for the SLAM state.

The reference has none — its map lives and dies in RAM; "resume" meant
replaying the whole `.rec` from t=0 (SURVEY.md §5.4). Here the full engine
state (graph arrays, counters, mode flags, config fingerprint) serializes to
a single .npz; a host restart restores device state and rejoins mid-run.
Checkpoints are intended periodically and at loop closure.
"""
from __future__ import annotations

import dataclasses
import json

import numpy as np
import jax.numpy as jnp

from tpuslam.backend.graph import FactorGraph, GraphCapacity
from tpuslam.frontend.state import SlamState
from tpuslam.runtime.config import SlamConfig

FORMAT_VERSION = 1

__all__ = ["save_checkpoint", "load_checkpoint"]


def _config_fingerprint(cfg: SlamConfig) -> str:
    return json.dumps({k: v for k, v in dataclasses.asdict(cfg).items()
                       if not isinstance(v, dict)}, sort_keys=True, default=str)


def save_checkpoint(path: str, state: SlamState, cfg: SlamConfig,
                    extra: dict | None = None):
    g = state.graph
    arrays = {
        "poses": np.asarray(g.poses), "n_poses": np.asarray(g.n_poses),
        "odo_meas": np.asarray(g.odo_meas),
        "odo_w": np.asarray(g.odo_w),
        "lm_xy": np.asarray(g.lm_xy), "lm_type": np.asarray(g.lm_type),
        "n_landmarks": np.asarray(g.n_landmarks),
        "obs_pose": np.asarray(g.obs_pose), "obs_lm": np.asarray(g.obs_lm),
        "obs_xy": np.asarray(g.obs_xy), "n_obs": np.asarray(g.n_obs),
        "prior_pose": np.asarray(g.prior_pose),
        "prior_info": np.asarray(g.prior_info),
        "current_cone_index": np.asarray(state.current_cone_index),
        "loop_closing": np.asarray(state.loop_closing),
        "loop_closure_complete": np.asarray(state.loop_closure_complete),
        "keyframe_count": np.asarray(state.keyframe_count),
        "send_cone_data": np.asarray(state.send_cone_data),
        "lm_info_xy": np.asarray(state.lm_info_xy),
        "format_version": np.asarray(FORMAT_VERSION),
    }
    meta = {"config": _config_fingerprint(cfg)}
    if extra:
        meta.update(extra)
    arrays["meta_json"] = np.frombuffer(
        json.dumps(meta).encode(), dtype=np.uint8)
    np.savez_compressed(path, **arrays)


def load_checkpoint(path: str, cfg: SlamConfig | None = None):
    """Returns (SlamState, meta dict). Raises on capacity mismatch with cfg."""
    z = np.load(path)
    if int(z["format_version"]) != FORMAT_VERSION:
        raise ValueError(f"unsupported checkpoint version {z['format_version']}")
    meta = json.loads(bytes(z["meta_json"]).decode())
    g = FactorGraph(
        poses=jnp.asarray(z["poses"]), n_poses=jnp.asarray(z["n_poses"]),
        odo_meas=jnp.asarray(z["odo_meas"]),
        # absent in format-1 checkpoints from before fusion: uniform chain
        odo_w=(jnp.asarray(z["odo_w"]) if "odo_w" in z.files
               else jnp.ones((z["poses"].shape[0],), jnp.float32)),
        lm_xy=jnp.asarray(z["lm_xy"]), lm_type=jnp.asarray(z["lm_type"]),
        n_landmarks=jnp.asarray(z["n_landmarks"]),
        obs_pose=jnp.asarray(z["obs_pose"]), obs_lm=jnp.asarray(z["obs_lm"]),
        obs_xy=jnp.asarray(z["obs_xy"]), n_obs=jnp.asarray(z["n_obs"]),
        prior_pose=jnp.asarray(z["prior_pose"]),
        prior_info=jnp.asarray(z["prior_info"]),
    )
    if cfg is not None:
        cap = cfg.capacity
        want = GraphCapacity(g.poses.shape[0], g.lm_xy.shape[0],
                             g.obs_pose.shape[0])
        if (cap.max_poses, cap.max_landmarks, cap.max_obs) != \
                (want.max_poses, want.max_landmarks, want.max_obs):
            raise ValueError(f"checkpoint capacity {want} != config {cap}")
    state = SlamState(
        graph=g,
        current_cone_index=jnp.asarray(z["current_cone_index"]),
        loop_closing=jnp.asarray(z["loop_closing"]),
        loop_closure_complete=jnp.asarray(z["loop_closure_complete"]),
        keyframe_count=jnp.asarray(z["keyframe_count"]),
        send_cone_data=jnp.asarray(z["send_cone_data"]),
        lm_info_xy=(jnp.asarray(z["lm_info_xy"]) if "lm_info_xy" in z.files
                    else jnp.zeros((g.lm_xy.shape[0], 3), jnp.float32)),
    )
    return state, meta
