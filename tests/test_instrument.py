"""Instrumented collective payloads vs the analytic comm model.

VERDICT r3 next #7: the comm model's `tier_bytes_per_iteration` figures
were derived by reading the shard_map programs; here the jaxpr walker
(`parallel/instrument.py`) counts what the traced programs actually move,
and the two must agree within ~10% per tier.
"""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from tpuslam.backend import gauss_newton as gn
from tpuslam.backend import graph as G
from tpuslam.geometry import se2
from tpuslam.parallel import make_chain_mesh
from tpuslam.parallel.chain import (chain_gn_step, chain_gn_step_dd,
                                    partition_chain,
                                    partition_edges_by_pose_block)
from tpuslam.parallel.comm_model import tier_bytes_per_iteration
from tpuslam.parallel.instrument import collective_payload_bytes

CAP = G.GraphCapacity(max_poses=64, max_landmarks=64, max_obs=256)


def _chain_world(seed=0):
    rng = np.random.default_rng(seed)
    g = G.empty_graph(CAP)
    prev = None
    for k in range(CAP.max_poses):
        p = np.array([1.0 * k, 0.05 * k, 0.0]) + rng.normal(0, 0.02, 3)
        meas = np.zeros(3) if prev is None else np.asarray(
            se2.between(prev, p))
        g = G.add_pose(g, jnp.asarray(p, jnp.float32),
                       jnp.asarray(meas, jnp.float32))
        prev = p
    for j in range(32):
        l = np.array([2.0 * j, 2.0])
        g = G.add_landmark(g, jnp.asarray(l, jnp.float32), jnp.int32(1))
        for i in (2 * j, 2 * j + 1):
            if i < CAP.max_poses:
                body = np.array([l[0] - 1.0 * i, 2.0 - 0.05 * i])
                g = G.add_observation(g, jnp.int32(i), jnp.int32(j),
                                      jnp.asarray(body, jnp.float32))
    return g


def test_counts_simple_psum():
    mesh = jax.make_mesh((8,), ("x",))
    from jax import shard_map
    from jax.sharding import PartitionSpec as P

    @jax.jit
    def f(x):
        return shard_map(lambda v: jax.lax.psum(v, "x"), mesh=mesh,
                         in_specs=P("x"), out_specs=P())(x)

    out = collective_payload_bytes(f, jnp.zeros((8, 16), jnp.float32))
    assert out["psum"]["count"] == 1
    assert out["psum"]["bytes"] == 16 * 4      # per-device [16] f32


def test_cond_branch_bytes_add_to_outer():
    """ADVICE r4 medium: a primitive appearing both BEFORE a lax.cond and
    inside its branches must accumulate outer + max-over-branches — the old
    compare/replace either dropped the branch bytes or clobbered the outer
    accumulation."""
    mesh = jax.make_mesh((8,), ("x",))
    from jax import shard_map
    from jax.sharding import PartitionSpec as P

    def inner(v):
        a = jax.lax.psum(v, "x")                       # outer: 64 B
        big = jax.lax.cond(
            a.sum() > 0,
            lambda: jax.lax.psum(v * 2.0, "x").sum(),  # branch: 64 B
            lambda: jax.lax.psum(jnp.zeros((4,), jnp.float32),
                                 "x").sum())           # branch: 16 B
        return a + big

    @jax.jit
    def f(x):
        return shard_map(inner, mesh=mesh, in_specs=P("x"),
                         out_specs=P())(x)

    out = collective_payload_bytes(f, jnp.zeros((8, 16), jnp.float32))
    # outer 16*4 + max-branch 16*4 (the 4*4 branch is the smaller one)
    assert out["psum"]["count"] == 2, out
    assert out["psum"]["bytes"] == 2 * 16 * 4, out


def test_nested_while_mult_applies_once():
    """ADVICE r4 low: while_mult must not compound as wm**depth for nested
    while_loops — the inner loop's body is counted once."""
    mesh = jax.make_mesh((8,), ("x",))
    from jax import shard_map
    from jax.sharding import PartitionSpec as P

    def inner(v):
        def outer_body(c):
            i, acc = c

            def inner_body(c2):
                j, a2 = c2
                return j + 1, a2 + jax.lax.psum(v, "x")  # 64 B / visit
            _, acc2 = jax.lax.while_loop(lambda c2: c2[0] < 2,
                                         inner_body, (0, acc))
            return i + 1, acc2
        return jax.lax.while_loop(lambda c: c[0] < 3, outer_body,
                                  (0, jnp.zeros_like(v)))[1]

    @jax.jit
    def f(x):
        return shard_map(inner, mesh=mesh, in_specs=P("x"),
                         out_specs=P(), check_vma=False)(x)

    out = collective_payload_bytes(f, jnp.zeros((8, 16), jnp.float32),
                                   while_mult=5)
    # outer while counted x5, inner while once: 5 * 1 * 64 B, not 5*5*64
    assert out["psum"]["bytes"] == 5 * 16 * 4, out


def test_chain_dd_instrumented_matches_model():
    g = _chain_world()
    mesh = make_chain_mesh(8)
    plan = partition_chain(g, 8)
    cfg = gn.GNConfig(iterations=1)
    meas = collective_payload_bytes(
        lambda gg: chain_gn_step_dd(gg, plan, cfg, mesh), g)
    model = tier_bytes_per_iteration(
        "chain_dd", P=CAP.max_poses, L=CAP.max_landmarks, D=8,
        shared_cap=plan.shared_cap)
    inst_psum = sum(meas.get(p, {"bytes": 0})["bytes"]
                    for p in ("psum", "pmin", "pmax"))
    assert abs(inst_psum - model["payload_psum"]) \
        <= 0.1 * model["payload_psum"], (inst_psum, model)


def test_chain_replicated_instrumented_matches_model():
    g = _chain_world()
    mesh = make_chain_mesh(8)
    g2, counts = partition_edges_by_pose_block(g, 8)
    cfg = gn.GNConfig(iterations=1)
    meas = collective_payload_bytes(
        lambda gg: chain_gn_step(gg, counts, cfg, mesh), g2)
    model = tier_bytes_per_iteration(
        "chain_replicated", P=CAP.max_poses, L=CAP.max_landmarks, D=8)
    # model convention: payload_gather = gathered TOTAL (= per-device x D)
    inst_gather = meas.get("all_gather", {"bytes": 0})["bytes"] * 8
    assert abs(inst_gather - model["payload_gather"]) \
        <= 0.1 * model["payload_gather"], (inst_gather, model)
    inst_psum = meas.get("psum", {"bytes": 0})["bytes"]
    assert abs(inst_psum - model["payload_psum"]) \
        <= 0.1 * model["payload_psum"], (inst_psum, model)


def test_resident_instrumented_matches_model():
    from tpuslam.parallel.resident import (chain_gn_step_dd_resident,
                                           partition_chain_resident)
    g = _chain_world()
    mesh = make_chain_mesh(8)
    plan = partition_chain_resident(g, 8)
    cfg = gn.GNConfig(iterations=1)
    L = CAP.max_landmarks
    gid = plan.lm_local_gid
    lm_loc = g.lm_xy[jnp.clip(gid, 0, L - 1)].reshape(-1, 2)
    sh = plan.shared_idx
    lm_shared = g.lm_xy[jnp.clip(sh, 0, L - 1)]
    g2 = plan.graph
    meas = collective_payload_bytes(
        lambda p_, ll, ls: chain_gn_step_dd_resident(
            p_, g2.odo_meas, g2.odo_w, g2.prior_pose, g2.prior_info,
            ll, gid.reshape(-1), ls, sh, plan, cfg, mesh,
            g.n_poses, g.n_landmarks),
        g2.poses, lm_loc, lm_shared)
    model = tier_bytes_per_iteration(
        "chain_dd_resident", P=CAP.max_poses, L=L, D=8,
        shared_cap=plan.shared_cap)
    inst_psum = sum(meas.get(p, {"bytes": 0})["bytes"]
                    for p in ("psum", "pmin", "pmax"))
    # nothing O(L): the instrumented payload must be small AND match
    assert inst_psum < 0.2 * (L * 8) * 4 + model["payload_psum"]
    assert abs(inst_psum - model["payload_psum"]) \
        <= 0.15 * model["payload_psum"], (inst_psum, model)


def test_resident_online_payload_d_invariant():
    """The ONLINE resident-map pass (parallel/resident_online.py) has no
    analytic byte formula in the comm model — its tier is MEASURED
    (comm_model.online_comm_time takes instrumented bytes). The contract
    that makes that sound: the per-device collective payload must be
    exactly invariant in D (association is shard-local [BN, L/D]; winners
    are [BN]-sized pmins; solves psum capacity-sized reduced systems) and
    carry no O(L_glob) gathers."""
    from tpuslam.frontend.blocked import _pad_inputs, _pick_compact
    from tpuslam.frontend.state import initial_state
    from tpuslam.parallel import resident_online as RO
    from tpuslam.runtime.config import SlamConfig
    from tpuslam.sim import SimConfig, simulate, trackdrive

    scen = simulate(trackdrive(seed=11),
                    SimConfig(laps=1.2, keyframe_dt=0.2, speed=8.0,
                              max_range=20.0, seed=60))
    T = len(scen.times) - len(scen.times) % 16
    cap = G.GraphCapacity(max_poses=max(64, T), max_landmarks=128,
                          max_obs=2048)
    cfg = SlamConfig(capacity=cap)
    obs = jnp.asarray(scen.obs[:T], jnp.float32)
    valid = jnp.asarray(scen.obs_valid[:T])
    poses = jnp.asarray(scen.odom_poses[:T], jnp.float32)
    o_p, v_p, p_p, _ = _pad_inputs(obs, valid, poses, cfg, 16)
    cmp_o = _pick_compact(v_p)

    per_d = {}
    for d in (2, 4, 8):
        mesh = jax.make_mesh((d,), ("map",))
        shards = RO.initial_shards(cap.max_landmarks)
        me = collective_payload_bytes(
            lambda s_, lx, lt, li: RO.resident_online_core(
                s_, lx, lt, li, o_p, v_p, p_p, cfg, mesh, 16, "map",
                cmp_o),
            initial_state(cap), *shards)
        per_d[d] = {
            "psum_like": sum(me.get(p, {"bytes": 0})["bytes"]
                             for p in ("psum", "pmin", "pmax")),
            "gather": me.get("all_gather", {"bytes": 0})["bytes"],
            "counts": sum(me[p]["count"]
                          for p in ("psum", "pmin", "pmax", "all_gather")
                          if p in me),
        }
    assert per_d[2] == per_d[4] == per_d[8], per_d
    # nothing O(L_glob) on the wire: gathers must be tiny next to one
    # full landmark array
    assert per_d[2]["gather"] < cap.max_landmarks * 8
    assert per_d[2]["psum_like"] > 0 and per_d[2]["counts"] > 0

    # the while-loop bound knob: GN bodies counted at the iteration cap
    # must grow the payload (the closure GN psums live in a while_loop)
    mesh2 = jax.make_mesh((2,), ("map",))
    shards = RO.initial_shards(cap.max_landmarks)
    up = collective_payload_bytes(
        lambda s_, lx, lt, li: RO.resident_online_core(
            s_, lx, lt, li, o_p, v_p, p_p, cfg, mesh2, 16, "map", cmp_o),
        initial_state(cap), *shards, while_mult=10)
    up_psum = sum(up.get(p, {"bytes": 0})["bytes"]
                  for p in ("psum", "pmin", "pmax"))
    assert up_psum > per_d[2]["psum_like"], (up_psum, per_d[2])
    assert up.get("while_loops_counted_x") == 10
