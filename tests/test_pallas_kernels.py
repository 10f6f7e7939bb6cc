"""Pallas kernel tests (interpret mode on CPU; compiled on real TPU)."""
import numpy as np
import jax
import jax.numpy as jnp
import pytest

from tpuslam.ops.association import associate, cost_matrix
from tpuslam.ops.cholesky import cholesky_pallas
from tpuslam.ops.pallas_assoc import associate_pallas


def _world(n=37, m=300, seed=0):
    rng = np.random.default_rng(seed)
    lm_xy = rng.uniform(-50, 50, (m, 2)).astype(np.float32)
    lm_type = rng.integers(1, 5, m).astype(np.int32)
    # half the observations = perturbed landmarks, half random
    pick = rng.integers(0, m, n // 2)
    obs_a = lm_xy[pick] + rng.normal(0, 0.3, (n // 2, 2))
    obs_b = rng.uniform(-60, 60, (n - n // 2, 2))
    obs_xy = np.vstack([obs_a, obs_b]).astype(np.float32)
    obs_type = np.concatenate([lm_type[pick],
                               rng.integers(1, 5, n - n // 2)]).astype(np.int32)
    return obs_xy, obs_type, lm_xy, lm_type


def test_pallas_assoc_matches_jnp_euclidean():
    obs_xy, obs_type, lm_xy, lm_type = _world()
    gate = 1.2
    idx_p, match_p, cost_p = associate_pallas(
        jnp.asarray(obs_xy), jnp.asarray(obs_type), jnp.asarray(lm_xy),
        jnp.asarray(lm_type), gate * gate)
    idx_j, match_j, cost_j = associate(
        jnp.asarray(obs_xy), jnp.asarray(obs_type),
        jnp.ones(len(obs_xy), bool), jnp.asarray(lm_xy), jnp.asarray(lm_type),
        jnp.ones(len(lm_xy), bool), gate, mode="nearest")
    np.testing.assert_array_equal(np.asarray(match_p), np.asarray(match_j))
    m = np.asarray(match_j)
    np.testing.assert_array_equal(np.asarray(idx_p)[m], np.asarray(idx_j)[m])
    np.testing.assert_allclose(np.asarray(cost_p)[m], np.asarray(cost_j)[m],
                               rtol=1e-5)


def test_pallas_assoc_mahalanobis():
    obs_xy, obs_type, lm_xy, lm_type = _world(seed=2)
    rng = np.random.default_rng(3)
    # random SPD inverse covariances, packed (a, b, c)
    sig = rng.uniform(0.2, 0.6, (len(lm_xy),))
    rho = rng.uniform(-0.3, 0.3, (len(lm_xy),))
    a = 1.0 / sig ** 2
    cov_inv = np.stack([a, rho * a, a * (1 + rho ** 2)], axis=1).astype(np.float32)
    cov_full = np.zeros((len(lm_xy), 2, 2), dtype=np.float32)
    cov_full[:, 0, 0] = cov_inv[:, 0]
    cov_full[:, 0, 1] = cov_full[:, 1, 0] = cov_inv[:, 1]
    cov_full[:, 1, 1] = cov_inv[:, 2]

    gate2 = 9.21
    idx_p, match_p, cost_p = associate_pallas(
        jnp.asarray(obs_xy), jnp.asarray(obs_type), jnp.asarray(lm_xy),
        jnp.asarray(lm_type), gate2, lm_cov_inv_packed=jnp.asarray(cov_inv),
        mahalanobis=True)
    idx_j, match_j, cost_j = associate(
        jnp.asarray(obs_xy), jnp.asarray(obs_type),
        jnp.ones(len(obs_xy), bool), jnp.asarray(lm_xy), jnp.asarray(lm_type),
        jnp.ones(len(lm_xy), bool), gate2, mode="mahalanobis",
        lm_cov_inv=jnp.asarray(cov_full))
    np.testing.assert_array_equal(np.asarray(match_p), np.asarray(match_j))
    m = np.asarray(match_j)
    np.testing.assert_array_equal(np.asarray(idx_p)[m], np.asarray(idx_j)[m])


def test_pallas_assoc_large_map_multi_tile():
    obs_xy, obs_type, lm_xy, lm_type = _world(n=61, m=2000, seed=5)
    idx_p, match_p, cost_p = associate_pallas(
        jnp.asarray(obs_xy), jnp.asarray(obs_type), jnp.asarray(lm_xy),
        jnp.asarray(lm_type), 1.44)
    c = np.asarray(cost_matrix(jnp.asarray(obs_xy), jnp.asarray(lm_xy)))
    ok = (lm_type[None, :] == obs_type[:, None]) & (c < 1.44)
    want_match = ok.any(axis=1)
    np.testing.assert_array_equal(np.asarray(match_p), want_match)
    for i in np.flatnonzero(want_match):
        j = int(np.asarray(idx_p)[i])
        assert ok[i, j]
        assert np.isclose(c[i, j], np.where(ok[i], c[i], 1e30).min(), rtol=1e-5)


@pytest.mark.parametrize("n", [64, 128, 200, 384, 1024])
def test_cholesky_pallas_matches_xla(n):
    rng = np.random.default_rng(n)
    m = rng.normal(0, 1, (n, n)).astype(np.float32)
    spd = m @ m.T / n + np.eye(n, dtype=np.float32) * 2.0
    got = np.asarray(cholesky_pallas(jnp.asarray(spd)))
    want = np.asarray(jnp.linalg.cholesky(jnp.asarray(spd)))
    np.testing.assert_allclose(got, want, atol=5e-4, rtol=1e-3)
    # reconstruction check
    np.testing.assert_allclose(got @ got.T, spd, atol=5e-3, rtol=1e-3)


def test_gn_with_pallas_cholesky_matches_default():
    """End-to-end: GN solve routed through the Pallas Cholesky."""
    import dataclasses
    from tests.test_parallel import _world as graph_world, CFG
    from tpuslam.backend import gauss_newton as gn
    g = graph_world(seed=9)
    base = gn.optimize(g, CFG)
    kern = gn.optimize(g, dataclasses.replace(CFG, use_cholesky_kernel=True))
    np.testing.assert_allclose(np.asarray(kern.poses), np.asarray(base.poses),
                               atol=1e-3)
    np.testing.assert_allclose(np.asarray(kern.lm_xy), np.asarray(base.lm_xy),
                               atol=1e-3)


def test_pipeline_with_pallas_association_matches_dense():
    """cfg.use_pallas_association routes the live mapping/localization
    association through the tiled kernel; trajectories and maps must match
    the dense (N x M) path for both gating policies."""
    import jax.numpy as jnp
    import numpy as np

    from tpuslam.backend.graph import GraphCapacity
    from tpuslam.frontend.pipeline import run_sequence
    from tpuslam.frontend.state import initial_state
    from tpuslam.runtime.config import SlamConfig
    from tpuslam.sim import SimConfig, simulate, skidpad

    scen = simulate(skidpad(), SimConfig(laps=1.3, seed=2))
    cap = GraphCapacity(max_poses=128, max_landmarks=128, max_obs=4096)
    obs = jnp.asarray(scen.obs, jnp.float32)
    valid = jnp.asarray(scen.obs_valid)
    poses = jnp.asarray(scen.odom_poses, jnp.float32)

    for assoc in ("nearest", "mahalanobis"):
        dense_cfg = SlamConfig(capacity=cap, association=assoc)
        kern_cfg = dense_cfg.with_(use_pallas_association=True)
        st_d, out_d = run_sequence(initial_state(cap), obs, valid, poses,
                                   dense_cfg)
        st_k, out_k = run_sequence(initial_state(cap), obs, valid, poses,
                                   kern_cfg)
        np.testing.assert_array_equal(np.asarray(st_d.graph.n_landmarks),
                                      np.asarray(st_k.graph.n_landmarks))
        np.testing.assert_allclose(np.asarray(out_d.pose),
                                   np.asarray(out_k.pose), atol=1e-5,
                                   err_msg=assoc)
        np.testing.assert_allclose(np.asarray(st_d.graph.lm_xy),
                                   np.asarray(st_k.graph.lm_xy), atol=1e-5,
                                   err_msg=assoc)
        assert bool(st_k.loop_closure_complete) == \
            bool(st_d.loop_closure_complete)
