"""Pallas TPU kernel: tiled Mahalanobis-gated data association.

The BASELINE-mandated association kernel: an (obs x landmark) cost matrix
with type gating and per-observation argmin, tiled over the landmark axis so
maps far larger than VMEM stream through on-chip memory while the running
(min, argmin) accumulator stays resident. For Formula-Student-sized maps the
jnp path (tpuslam.ops.association) is already fast; this kernel is the
scale path for pod-level multi-session maps (tens of thousands of landmarks)
and is numerically identical (verified in tests/test_pallas_kernels.py).

Cost: Euclidean  |o - l|^2, or Mahalanobis (o-l)^T S^-1 (o-l) with the
per-landmark inverse covariance packed as (a, b, c) for [[a, b], [b, c]].

Layout: observations padded to OBS_TILE (sublane-aligned), landmarks tiled by
LM_TILE = 128 lanes. Grid iterates landmark tiles sequentially (TPU grids are
sequential), accumulating running minima in VMEM scratch.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

OBS_TILE = 128
LM_TILE = 128
_BIG = 1e30  # python float: jnp constants cannot be captured by kernels


def _assoc_kernel(obs_xy_ref, obs_type_ref, lm_xy_ref, lm_type_ref,
                  lm_cov_ref, gate_ref, cost_out_ref, idx_out_ref,
                  min_ref, arg_ref, *, mahalanobis: bool):
    t = pl.program_id(0)
    n_tiles = pl.num_programs(0)

    @pl.when(t == 0)
    def _():
        min_ref[:] = jnp.full_like(min_ref, _BIG)
        arg_ref[:] = jnp.zeros_like(arg_ref)

    ox = obs_xy_ref[:, 0:1]                  # [N, 1]
    oy = obs_xy_ref[:, 1:2]
    lx = lm_xy_ref[0:1, :]                   # [1, T]
    ly = lm_xy_ref[1:2, :]
    dx = ox - lx                             # [N, T]
    dy = oy - ly
    if mahalanobis:
        a = lm_cov_ref[0:1, :]
        b = lm_cov_ref[1:2, :]
        c = lm_cov_ref[2:3, :]
        cost = a * dx * dx + 2.0 * b * dx * dy + c * dy * dy
    else:
        cost = dx * dx + dy * dy

    type_ok = obs_type_ref[:, 0:1] == lm_type_ref[0:1, :]
    gated = jnp.where(type_ok & (cost < gate_ref[0, 0]), cost, _BIG)

    tile_min = jnp.min(gated, axis=1, keepdims=True)       # [N, 1]
    tile_arg = jnp.argmin(gated, axis=1).astype(jnp.int32)[:, None] \
        + t * LM_TILE

    better = tile_min < min_ref[:]
    arg_ref[:] = jnp.where(better, tile_arg, arg_ref[:])
    min_ref[:] = jnp.where(better, tile_min, min_ref[:])

    @pl.when(t == n_tiles - 1)
    def _():
        cost_out_ref[:] = min_ref[:]
        idx_out_ref[:] = arg_ref[:]


@functools.partial(jax.jit, static_argnames=("mahalanobis", "interpret"))
def associate_pallas(obs_xy, obs_type, lm_xy, lm_type, gate2,
                     lm_cov_inv_packed=None, mahalanobis: bool = False,
                     interpret: bool | None = None):
    """Tiled association. Returns (match_idx [N], matched [N], cost [N]).

    obs_xy [N,2] f32; obs_type [N] i32; lm_xy [M,2]; lm_type [M] i32
    (invalid landmarks: set type to -1 — it never equals a real obs type);
    gate2: squared gate (Euclidean) or chi-square bound (Mahalanobis);
    lm_cov_inv_packed [M,3] = (a, b, c) of the inverse covariance.
    """
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    n = obs_xy.shape[0]
    m = lm_xy.shape[0]
    n_pad = max(-(-n // 8) * 8, 8)
    m_pad = max(-(-m // LM_TILE) * LM_TILE, LM_TILE)

    oxy = jnp.zeros((n_pad, 2), jnp.float32).at[:n].set(obs_xy)
    otype = jnp.full((n_pad, 1), -2, jnp.int32).at[:n, 0].set(obs_type)
    # landmarks transposed to [2/3, M] so the landmark axis rides the lanes
    lxy = jnp.full((2, m_pad), 1e15, jnp.float32).at[:, :m].set(lm_xy.T)
    ltype = jnp.full((1, m_pad), -1, jnp.int32).at[0, :m].set(lm_type)
    if mahalanobis:
        if lm_cov_inv_packed is None:
            raise ValueError("mahalanobis needs lm_cov_inv_packed")
        lcov = jnp.zeros((3, m_pad), jnp.float32).at[:, :m].set(
            lm_cov_inv_packed.T)
    else:
        lcov = jnp.zeros((3, m_pad), jnp.float32)
    gate = jnp.asarray(gate2, jnp.float32).reshape(1, 1)

    grid = (m_pad // LM_TILE,)
    cost, idx = pl.pallas_call(
        functools.partial(_assoc_kernel, mahalanobis=mahalanobis),
        grid=grid,
        in_specs=[
            pl.BlockSpec((n_pad, 2), lambda t: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((n_pad, 1), lambda t: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((2, LM_TILE), lambda t: (0, t), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, LM_TILE), lambda t: (0, t), memory_space=pltpu.VMEM),
            pl.BlockSpec((3, LM_TILE), lambda t: (0, t), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1), lambda t: (0, 0), memory_space=pltpu.SMEM),
        ],
        out_specs=[
            pl.BlockSpec((n_pad, 1), lambda t: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((n_pad, 1), lambda t: (0, 0), memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((n_pad, 1), jnp.float32),
            jax.ShapeDtypeStruct((n_pad, 1), jnp.int32),
        ],
        scratch_shapes=[
            pltpu.VMEM((n_pad, 1), jnp.float32),
            pltpu.VMEM((n_pad, 1), jnp.int32),
        ],
        interpret=interpret,
    )(oxy, otype, lxy, ltype, lcov, gate)

    cost = cost[:n, 0]
    idx = idx[:n, 0]
    matched = cost < _BIG
    return idx, matched, cost
