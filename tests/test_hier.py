"""Hierarchical (two-level) resident DD solve vs flat DD vs single device.

VERDICT r3 next #4: measured-equal results on the 8-device virtual mesh,
with the level-1 exchange confined to within-tray psum groups and only the
O(T)-sized boundary system crossing trays.
"""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from tpuslam.backend import gauss_newton as gn
from tpuslam.backend import graph as G
from tpuslam.geometry import se2
from tpuslam.parallel import make_chain_mesh
from tpuslam.parallel.hier import (chain_optimize_hier,
                                   hier_comm_bytes_per_iteration,
                                   partition_chain_hier)
from tpuslam.parallel.resident import (chain_optimize_resident,
                                       partition_chain_resident,
                                       resident_comm_bytes_per_iteration)

CAP = G.GraphCapacity(max_poses=64, max_landmarks=64, max_obs=512)


def _chain_world(seed=0, n_lm=64):
    """A long chain with landmarks observed by nearby pose pairs — some
    straddle block boundaries (shared), a few straddle tray boundaries
    (cross-tray shared)."""
    rng = np.random.default_rng(seed)
    g = G.empty_graph(CAP)
    prev = None
    poses = []
    for k in range(CAP.max_poses):
        p = np.array([1.0 * k, 0.4 * np.sin(0.2 * k), 0.05 * np.sin(0.1 * k)])
        p = p + rng.normal(0, 0.03, 3)
        meas = np.zeros(3) if prev is None else np.asarray(
            se2.between(prev, p))
        g = G.add_pose(g, jnp.asarray(p, jnp.float32),
                       jnp.asarray(meas, jnp.float32))
        poses.append(p)
        prev = p
    for j in range(n_lm):
        anchor = int(j * CAP.max_poses / n_lm)
        l = np.array([1.0 * anchor + 0.5, 2.0]) + rng.normal(0, 0.05, 2)
        g = G.add_landmark(g, jnp.asarray(l, jnp.float32), jnp.int32(1))
        for i in (anchor, min(anchor + 1, CAP.max_poses - 1)):
            body = np.asarray(se2.transform_to_body(poses[i], l)) \
                + rng.normal(0, 0.02, 2)
            g = G.add_observation(g, jnp.int32(i), jnp.int32(j),
                                  jnp.asarray(body, jnp.float32))
    return g


@pytest.mark.parametrize("tray", [2, 4])
def test_hier_matches_flat_and_single(tray):
    g = _chain_world()
    mesh = make_chain_mesh(8)
    cfg = gn.GNConfig(iterations=3)
    hplan = partition_chain_hier(g, 8, tray)
    # the scenario must actually exercise both landmark classes
    lt = np.asarray(hplan.lm_tray)
    assert (lt == hplan.n_tray).sum() >= 1, "no cross-tray shared landmarks"
    assert ((lt >= 0) & (lt < hplan.n_tray)).sum() >= 1, \
        "no tray-local shared landmarks"

    single = gn.optimize(g, cfg)
    flat = chain_optimize_resident(g, cfg, mesh)
    hier = chain_optimize_hier(g, cfg, mesh, tray, plan=hplan)
    n_p, n_l = int(g.n_poses), int(g.n_landmarks)
    np.testing.assert_allclose(np.asarray(hier.poses)[:n_p],
                               np.asarray(single.poses)[:n_p], atol=5e-3)
    np.testing.assert_allclose(np.asarray(hier.lm_xy)[:n_l],
                               np.asarray(single.lm_xy)[:n_l], atol=5e-3)
    # and tightly equal to the flat DD (same elimination family)
    np.testing.assert_allclose(np.asarray(hier.poses)[:n_p],
                               np.asarray(flat.poses)[:n_p], atol=2e-3)
    np.testing.assert_allclose(np.asarray(hier.lm_xy)[:n_l],
                               np.asarray(flat.lm_xy)[:n_l], atol=2e-3)


def test_hier_level2_smaller_than_flat_interface():
    """The payload structure that makes the hierarchy worth it: the
    cross-tray system is much smaller than the flat interface psum."""
    g = _chain_world()
    hplan = partition_chain_hier(g, 8, 4)
    flat = resident_comm_bytes_per_iteration(hplan.rplan)
    hier = hier_comm_bytes_per_iteration(hplan)
    assert hier["level2_cross_psum"] < 0.5 * flat["interface_psum"]
    # instrumented: the global (cross-tray) psums of the hier step must be
    # far below the flat interface payload
    from tpuslam.parallel.instrument import collective_payload_bytes
    from tpuslam.parallel.hier import chain_gn_step_dd_hier
    mesh = make_chain_mesh(8)
    cfg = gn.GNConfig(iterations=1)
    rp = hplan.rplan
    L = CAP.max_landmarks
    gid = rp.lm_local_gid
    lm_loc = g.lm_xy[jnp.clip(gid, 0, L - 1)].reshape(-1, 2)
    sh = rp.shared_idx
    lm_shared = g.lm_xy[jnp.clip(sh, 0, L - 1)]
    g2 = rp.graph
    meas = collective_payload_bytes(
        lambda p_, ll, ls: chain_gn_step_dd_hier(
            p_, g2.odo_meas, g2.odo_w, g2.prior_pose, g2.prior_info,
            ll, gid.reshape(-1), ls, sh, hplan, cfg, mesh,
            g.n_poses, g.n_landmarks),
        g2.poses, lm_loc, lm_shared)
    assert meas["psum"]["bytes"] > 0
    # absolute cross-check (VERDICT r3 next #7 for this tier too): the
    # analytic per-iteration psum payload must match what the traced
    # program actually moves, within tolerance for the few bookkeeping
    # scalars the analytic figure rounds away
    analytic_psum = (hier["level1_ici_psum"] + hier["level2_cross_psum"]
                     + hier["shared_hll_gl_psum"] + hier["dl_shared_psum"])
    inst_psum = meas["psum"]["bytes"]
    assert abs(inst_psum - analytic_psum) <= 0.15 * analytic_psum, \
        (inst_psum, analytic_psum, hier)
    if "ppermute" in meas:
        assert abs(meas["ppermute"]["bytes"]
                   - hier["pose_halo_ppermute"]) \
            <= 0.5 * hier["pose_halo_ppermute"] + 64, \
            (meas["ppermute"]["bytes"], hier["pose_halo_ppermute"])


def test_hier3_matches_flat_and_single():
    """Three-level nested dissection (parallel/hier3.py, VERDICT r4 next
    #7): tray=2, pod=4 over the 8-device mesh gives 4 trays, 2 pods — all
    three landmark classes (tray-local, pod-local, cross-pod) and both
    boundary classes (pod-interior tray boundary, pod boundary) exercised.
    Results equal the flat DD and the single-device oracle."""
    from tpuslam.parallel.hier3 import (chain_optimize_hier3,
                                        partition_chain_hier3)
    g = _chain_world()
    mesh = make_chain_mesh(8)
    cfg = gn.GNConfig(iterations=3)
    hplan = partition_chain_hier3(g, 8, tray=2, pod=4)
    lt = np.asarray(hplan.lm_tray)
    lp = np.asarray(hplan.lm_pod)
    assert ((lt >= 0) & (lt < hplan.n_tray)).sum() >= 1, "no tray-local lms"
    assert ((lt == hplan.n_tray) & (lp < hplan.n_pod)
            & (lp >= 0)).sum() >= 1, "no pod-local lms"
    # cross-pod lms may or may not occur at this size; exercise if present
    single = gn.optimize(g, cfg)
    flat = chain_optimize_resident(g, cfg, mesh)
    h3 = chain_optimize_hier3(g, cfg, mesh, tray=2, pod=4, plan=hplan)
    n_p, n_l = int(g.n_poses), int(g.n_landmarks)
    np.testing.assert_allclose(np.asarray(h3.poses)[:n_p],
                               np.asarray(single.poses)[:n_p], atol=5e-3)
    np.testing.assert_allclose(np.asarray(h3.lm_xy)[:n_l],
                               np.asarray(single.lm_xy)[:n_l], atol=5e-3)
    np.testing.assert_allclose(np.asarray(h3.poses)[:n_p],
                               np.asarray(flat.poses)[:n_p], atol=2e-3)
    np.testing.assert_allclose(np.asarray(h3.lm_xy)[:n_l],
                               np.asarray(flat.lm_xy)[:n_l], atol=2e-3)


def test_hier3_level3_smaller_than_level2():
    """The structural point of the third level, at the scale it is FOR
    (D=1024, tray=16, pod=256): the cross-pod (DCN) payload is a small
    fraction of the within-pod (ICI) exchange, and the predicted weak
    efficiency clears the >=0.70 bar the two-level scheme loses past one
    pod. (At the 8-device toy size the padded caps dominate the widths, so
    the asymptotic claim is asserted on the model, the correctness claim
    on the code above.)"""
    from tpuslam.parallel.comm_model import (CommModel,
                                             hier3_bytes_per_iteration,
                                             predict_efficiency_weak)
    v = hier3_bytes_per_iteration(1024, 16, 256, shared_per_boundary=5.0)
    # the SYSTEM payloads shrink level over level (the l3 total also
    # carries the O(lsh) shared-landmark update vectors, which are tiny in
    # seconds but dominate its byte count — compare the matrix systems)
    assert v["mk3"] < 0.3 * v["ms2"] < 0.3 * v["ms1"]
    assert v["payload_psum_l2_ici"] < v["payload_psum_l1_ici"]
    # weak efficiency at D=1024 with the SCALING assumptions: three-level
    # >= 0.70 where two-level sits at ~0.45
    mdl = CommModel()
    e3 = predict_efficiency_weak("chain_dd_hier3", 0.0238 / 8, 1024,
                                 tray=16, shared_per_boundary=5.0,
                                 iterations=4, model=mdl)
    e2 = predict_efficiency_weak("chain_dd_hier", 0.0238 / 8, 1024,
                                 tray=16, shared_per_boundary=5.0,
                                 iterations=4, model=mdl)
    assert e3 >= 0.70 > e2, (e3, e2)


def test_hier3_payload_instrumented():
    """Absolute analytic-vs-instrumented cross-check for the three-level
    tier (same contract as the two-level check above)."""
    from tpuslam.parallel.hier3 import (chain_gn_step_dd_hier3,
                                        hier3_comm_bytes_per_iteration,
                                        partition_chain_hier3)
    from tpuslam.parallel.instrument import collective_payload_bytes
    g = _chain_world()
    mesh = make_chain_mesh(8)
    cfg = gn.GNConfig(iterations=1)
    hplan = partition_chain_hier3(g, 8, tray=2, pod=4)
    rp = hplan.rplan
    L = CAP.max_landmarks
    gid = rp.lm_local_gid
    lm_loc = g.lm_xy[jnp.clip(gid, 0, L - 1)].reshape(-1, 2)
    sh = rp.shared_idx
    lm_shared = g.lm_xy[jnp.clip(sh, 0, L - 1)]
    g2 = rp.graph
    meas = collective_payload_bytes(
        lambda p_, ll, ls: chain_gn_step_dd_hier3(
            p_, g2.odo_meas, g2.odo_w, g2.prior_pose, g2.prior_info,
            ll, gid.reshape(-1), ls, sh, hplan, cfg, mesh,
            g.n_poses, g.n_landmarks),
        g2.poses, lm_loc, lm_shared)
    ana = hier3_comm_bytes_per_iteration(hplan)
    analytic_psum = (ana["level1_ici_psum"] + ana["level2_pod_psum"]
                     + ana["level3_cross_psum"] + ana["shared_hll_gl_psum"]
                     + ana["dl_shared_psum"])
    inst_psum = meas["psum"]["bytes"]
    assert abs(inst_psum - analytic_psum) <= 0.15 * analytic_psum, \
        (inst_psum, analytic_psum, ana)
    if "ppermute" in meas:
        assert abs(meas["ppermute"]["bytes"]
                   - ana["pose_halo_ppermute"]) \
            <= 0.5 * ana["pose_halo_ppermute"] + 64
