"""Fleet-scale session parallelism: the blocked pipeline over a device mesh.

The third tier of the parallelism stack (SURVEY.md §2.4 "multi-session
pod-scale mapping"):

- within a chip, `blocked_core_batched` vmaps the frame-blocked pipeline
  over S sessions (tpuslam/frontend/blocked.py);
- across chips, THIS module shard_maps that batched core over the
  'sessions' mesh axis — every device runs its local session chunk of the
  identical program. Sessions are independent mapping problems, so the
  pipeline itself needs no collectives; cross-session products (a fused
  fleet map, the distributed Schur reduction) ride
  `tpuslam/parallel/multisession.py`'s ('sessions','edges') mesh afterwards.

Per-device results match the unsharded batched core: every decision
(association, closure, counts, indices) is exact; float leaves carry ~1e-5
noise because a local batch of S/n matmul/Cholesky calls tiles differently
than a batch of S (tests/test_parallel.py::test_fleet_blocked_matches_unsharded).
"""
from __future__ import annotations

from functools import lru_cache, partial

import jax
from jax import shard_map
from jax.sharding import PartitionSpec as P

from tpuslam.frontend.blocked import blocked_core_batched
from tpuslam.frontend.state import SlamState
from tpuslam.runtime.config import SlamConfig

__all__ = ["run_fleet_blocked"]


@lru_cache(maxsize=None)
def _build_run(mesh, cfg: SlamConfig, block: int, axis: str):
    spec = P(axis)

    @jax.jit
    @partial(shard_map, mesh=mesh, in_specs=(spec, spec, spec, spec),
             out_specs=spec, check_vma=False)
    def run(st, o, v, p):
        return blocked_core_batched.__wrapped__(st, o, v, p, cfg, block)

    return run


def run_fleet_blocked(states: SlamState, obs_seq, valid_seq, pose_seq,
                      cfg: SlamConfig, mesh, block: int = 8,
                      axis: str = "sessions"):
    """Run S sessions' whole-lap blocked passes sharded over `mesh[axis]`.

    states: stacked SlamState [S]; obs_seq [S,Tp,N,4], valid_seq [S,Tp,N],
    pose_seq [S,Tp,3], Tp pre-padded to a multiple of `block`; S must be a
    multiple of the axis size. Returns (states, outputs [S,Tp], done_upto
    [S]) exactly like `blocked_core_batched`, with leaves sharded over the
    sessions axis. The compiled program is cached per (mesh, cfg, block,
    axis) — repeat calls don't re-trace.
    """
    return _build_run(mesh, cfg, block, axis)(
        states, obs_seq, valid_seq, pose_seq)
