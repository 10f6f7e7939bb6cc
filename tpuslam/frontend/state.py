"""Top-level SLAM engine state (a single pytree, device-resident).

Replaces the reference's 15 mutex-guarded member groups
(reference src/slam.hpp:96-130) with one immutable pytree: the ingest task is
the single owner, every update is a functional transform, and the race
conditions catalogued in SURVEY.md §5.2 cannot exist by construction.
"""
from __future__ import annotations

import dataclasses

import jax
import jax.numpy as jnp

from tpuslam.backend.graph import FactorGraph, GraphCapacity, empty_graph


@jax.tree_util.register_dataclass
@dataclasses.dataclass
class SlamState:
    graph: FactorGraph
    current_cone_index: jax.Array   # i32 — where on the track we are (src/slam.cpp:598-601)
    loop_closing: jax.Array         # bool — closure detected this session (src/slam.cpp:593-596)
    loop_closure_complete: jax.Array  # bool — map frozen, localization mode (src/slam.cpp:631)
    keyframe_count: jax.Array       # i32
    send_cone_data: jax.Array       # bool — currentConeIndex changed (src/slam.cpp:385)
    lm_info_xy: jax.Array           # [L,3] packed per-landmark 2x2 information
    # (a, b, c) of [[a, b], [b, c]] — the accumulated measurement information
    # driving Mahalanobis gating (cfg.association='mahalanobis'); zero rows
    # for unused slots. The reference has no landmark covariances at all
    # (Euclidean gate, src/slam.cpp:584).


def initial_state(cap: GraphCapacity) -> SlamState:
    return SlamState(
        graph=empty_graph(cap),
        current_cone_index=jnp.int32(0),
        loop_closing=jnp.asarray(False),
        loop_closure_complete=jnp.asarray(False),
        keyframe_count=jnp.int32(0),
        send_cone_data=jnp.asarray(False),
        lm_info_xy=jnp.zeros((cap.max_landmarks, 3), jnp.float32),
    )
