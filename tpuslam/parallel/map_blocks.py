"""Map-block model parallelism: association against a mesh-sharded map.

SURVEY.md §2.4's fourth mandated parallel component: when the landmark map
outgrows one chip (pod-scale multi-session mapping fuses many laps' maps),
shard the landmark blocks over a mesh axis and run association shard-local.
Nearest-neighbour association needs no halo exchange — each shard computes
its local best per observation and one `pmin` lattice reduction over ICI
picks the global winner (min cost, ties broken toward the smallest global
landmark index, exactly `jnp.argmin`'s first-minimum semantics).

Replaces nothing sequential in the reference — its map is a single
std::vector scanned on one core (reference src/slam.cpp:570-607); this is
the scale-out design the reference never had.

Exactness vs `tpuslam.ops.association.associate` on the gathered map, for
every mode ('first' / 'nearest' / 'mahalanobis') and the localizer's
signed-type-compare quirk: match indices and matched masks are EXACT; the
returned cost can differ by 1 ulp (an [N, M/n] block fuses differently
than [N, M]) — tests/test_parallel.py::test_map_sharded_association_matches_single.
"""
from __future__ import annotations

from functools import lru_cache, partial

import jax
import jax.numpy as jnp
from jax import shard_map
from jax.sharding import PartitionSpec as P

from tpuslam.ops.association import associate

__all__ = ["associate_sharded"]

_BIG = 1e30
_IMAX = jnp.iinfo(jnp.int32).max


@lru_cache(maxsize=None)
def _build(mesh, axis: str, mode: str, type_signed_bug: bool,
           has_cov: bool):
    lm_spec = P(axis)
    rep = P()
    cov_spec = lm_spec if has_cov else rep

    @jax.jit
    @partial(shard_map, mesh=mesh,
             in_specs=(rep, rep, rep, lm_spec, lm_spec, lm_spec, rep,
                       cov_spec),
             out_specs=(rep, rep, rep), check_vma=False)
    def run(obs_xy, obs_type, obs_valid, lm_xy, lm_type, lm_valid, gate,
            lm_cov_inv):
        base = jax.lax.axis_index(axis) * lm_xy.shape[0]
        idx_l, matched_l, cost_l = associate(
            obs_xy, obs_type, obs_valid, lm_xy, lm_type, lm_valid, gate[0],
            mode=mode, lm_cov_inv=lm_cov_inv if has_cov else None,
            type_signed_bug=type_signed_bug)
        gidx = base + idx_l
        if mode == "first":
            # global FIRST hit = smallest global landmark index with a hit
            key = jnp.where(matched_l, gidx, _IMAX)
            sel = jax.lax.pmin(key, axis)
            matched = sel < _IMAX
            # the chosen landmark's cost lives on exactly one shard
            cost = jax.lax.pmin(
                jnp.where(matched_l & (gidx == sel), cost_l, _BIG), axis)
        else:
            gmin = jax.lax.pmin(jnp.where(matched_l, cost_l, _BIG), axis)
            cand = jnp.where(matched_l & (cost_l == gmin), gidx, _IMAX)
            sel = jax.lax.pmin(cand, axis)
            matched = sel < _IMAX
            cost = gmin
        idx = jnp.where(matched, sel, 0).astype(jnp.int32)
        return idx, matched, jnp.where(matched, cost, _BIG)

    return run


def associate_sharded(obs_xy, obs_type, obs_valid, lm_xy, lm_type, lm_valid,
                      gate, mesh, axis: str = "edges", mode: str = "first",
                      lm_cov_inv=None, type_signed_bug: bool = False):
    """`ops.association.associate` with the map sharded over `mesh[axis]`.

    lm_xy/lm_type/lm_valid (and lm_cov_inv if given) carry the full map; M
    must be a multiple of the axis size (pad with lm_valid=False slots).
    Observations are replicated. Returns (match_idx [N] int32 into the
    GLOBAL map, matched [N] bool, cost [N] f32) — identical to the
    single-device `associate` on the same inputs. Compiled programs are
    cached per (mesh, axis, mode, quirk, cov-presence).
    """
    run = _build(mesh, axis, mode, bool(type_signed_bug),
                 lm_cov_inv is not None)
    gate_arr = jnp.asarray([gate], jnp.float32)
    if lm_cov_inv is None:
        lm_cov_inv = jnp.zeros((lm_xy.shape[0], 2, 2), lm_xy.dtype)
    return run(obs_xy, obs_type, obs_valid, lm_xy, lm_type, lm_valid,
               gate_arr, lm_cov_inv)
