"""Backend GN tests: JAX Schur-eliminated solver vs the independent NumPy golden."""
import dataclasses

import numpy as np
import jax.numpy as jnp
import pytest

from tpuslam.backend import graph as G
from tpuslam.backend import gauss_newton as gn
from tpuslam.backend import golden
from tpuslam.geometry import se2

CAP = G.GraphCapacity(max_poses=64, max_landmarks=32, max_obs=256)
CFG = gn.GNConfig(iterations=10)


def _build_world(n_poses=12, n_lm=8, noise=0.15, seed=3):
    """Simulate a noisy loop: ground-truth circle + landmark ring."""
    rng = np.random.default_rng(seed)
    radius = 10.0
    t = np.linspace(0, 2 * np.pi, n_poses, endpoint=False)
    gt_poses = np.stack([radius * np.cos(t), radius * np.sin(t),
                         se2.wrap_angle(t + np.pi / 2)], axis=1)
    ang = np.linspace(0, 2 * np.pi, n_lm, endpoint=False) + 0.2
    gt_lms = np.stack([13.0 * np.cos(ang), 13.0 * np.sin(ang)], axis=1)

    noisy_poses = gt_poses + rng.normal(0, noise, gt_poses.shape)
    noisy_lms = gt_lms + rng.normal(0, noise, gt_lms.shape)
    obs = []  # (pose_idx, lm_idx, body_xy from ground truth + noise)
    for i, p in enumerate(gt_poses):
        for j, l in enumerate(gt_lms):
            d = l - p[:2]
            if np.linalg.norm(d) < 8.0:
                c, s = np.cos(p[2]), np.sin(p[2])
                body = np.array([c * d[0] + s * d[1], -s * d[0] + c * d[1]])
                obs.append((i, j, body + rng.normal(0, 0.05, 2)))
    assert obs, "world must produce observations"
    return noisy_poses, noisy_lms, obs


def _as_factor_graph(poses, lms, obs):
    g = G.empty_graph(CAP)
    prev = None
    for p in poses:
        meas = np.zeros(3) if prev is None else np.asarray(se2.between(prev, p))
        g = G.add_pose(g, jnp.asarray(p, jnp.float32), jnp.asarray(meas, jnp.float32))
        prev = p
    for l, row in enumerate(lms):
        g = G.add_landmark(g, jnp.asarray(row, jnp.float32), jnp.int32(1))
    for i, j, z in obs:
        g = G.add_observation(g, jnp.int32(i), jnp.int32(j), jnp.asarray(z, jnp.float32))
    return g


def _as_golden(poses, lms, obs):
    gg = golden.GoldenGraph()
    for p in poses:
        gg.add_pose(p)
    for row in lms:
        gg.add_landmark(row)
    for i, j, z in obs:
        gg.add_observation(i, j, z)
    return gg


def test_residual_jacobians_match_numeric():
    """Closed-form Jacobians vs central differences."""
    from tpuslam.backend.residuals import landmark_residuals, odometry_residuals
    rng = np.random.default_rng(1)
    pi = rng.normal(0, 1, 3)
    pj = rng.normal(0, 1, 3)
    m = rng.normal(0, 0.5, 3)
    r, j_i, j_j = odometry_residuals(jnp.asarray(pi), jnp.asarray(pj), jnp.asarray(m))
    eps = 1e-4

    def num_jac(f, x):
        out = []
        for k in range(x.size):
            dx = np.zeros_like(x)
            dx[k] = eps
            out.append((np.asarray(f(x + dx)) - np.asarray(f(x - dx))) / (2 * eps))
        return np.stack(out, axis=-1)

    np.testing.assert_allclose(
        np.asarray(j_i),
        num_jac(lambda x: odometry_residuals(jnp.asarray(x), jnp.asarray(pj), jnp.asarray(m))[0], pi),
        atol=1e-2)
    np.testing.assert_allclose(
        np.asarray(j_j),
        num_jac(lambda x: odometry_residuals(jnp.asarray(pi), jnp.asarray(x), jnp.asarray(m))[0], pj),
        atol=1e-2)

    l = rng.normal(0, 5, 2)
    z = rng.normal(0, 1, 2)
    r2, j_p, j_l = landmark_residuals(jnp.asarray(pi), jnp.asarray(l), jnp.asarray(z))
    np.testing.assert_allclose(
        np.asarray(j_p),
        num_jac(lambda x: landmark_residuals(jnp.asarray(x), jnp.asarray(l), jnp.asarray(z))[0], pi),
        atol=1e-2)
    np.testing.assert_allclose(
        np.asarray(j_l),
        num_jac(lambda x: landmark_residuals(jnp.asarray(pi), jnp.asarray(x), jnp.asarray(z))[0], l),
        atol=1e-2)


def test_gn_matches_golden():
    poses, lms, obs = _build_world()
    fg = _as_factor_graph(poses, lms, obs)
    gg = _as_golden(poses, lms, obs)

    chi_before = float(gn.chi2(fg, CFG))
    fg_opt = gn.optimize(fg, CFG)
    chi_after = float(gn.chi2(fg_opt, CFG))
    golden.golden_optimize(gg, iterations=10)

    assert chi_after < chi_before * 0.5, (chi_before, chi_after)
    got_poses = np.asarray(fg_opt.poses)[:len(poses)]
    want_poses = np.stack(gg.poses)
    np.testing.assert_allclose(got_poses[:, :2], want_poses[:, :2], atol=2e-3)
    ang_err = np.abs(np.asarray(se2.wrap_angle(got_poses[:, 2] - want_poses[:, 2])))
    assert ang_err.max() < 2e-3
    got_lms = np.asarray(fg_opt.lm_xy)[:len(lms)]
    np.testing.assert_allclose(got_lms, np.stack(gg.landmarks), atol=2e-3)


def test_gauge_vertices_stay_fixed():
    poses, lms, obs = _build_world()
    fg = _as_factor_graph(poses, lms, obs)
    fg_opt = gn.optimize(fg, CFG)
    np.testing.assert_allclose(np.asarray(fg_opt.poses)[:2], poses[:2], atol=1e-6)
    np.testing.assert_allclose(np.asarray(fg_opt.lm_xy)[:2], lms[:2], atol=1e-6)
    # padding untouched
    np.testing.assert_allclose(np.asarray(fg_opt.poses)[len(poses):], 0.0, atol=1e-6)


def test_chi2_decreases_monotonically_early():
    poses, lms, obs = _build_world(noise=0.3)
    fg = _as_factor_graph(poses, lms, obs)
    chis = []
    for _ in range(4):
        chis.append(float(gn.chi2(fg, CFG)))
        fg = gn.gn_step(fg, CFG)
    chis.append(float(gn.chi2(fg, CFG)))
    assert chis[-1] < chis[0]
    assert chis[1] < chis[0]


def test_masked_growth_no_recompile_shape():
    """Graph ops keep static shapes regardless of counts."""
    g = G.empty_graph(CAP)
    g = G.add_pose(g, jnp.zeros(3), jnp.zeros(3))
    assert g.poses.shape == (CAP.max_poses, 3)
    g2 = G.add_landmark(g, jnp.ones(2), jnp.int32(2), enable=False)
    assert int(g2.n_landmarks) == 0  # masked no-op
    g3 = G.add_landmark(g, jnp.ones(2), jnp.int32(2), enable=True)
    assert int(g3.n_landmarks) == 1


def test_bucketed_solve_bit_identical_to_full():
    """The bucketed reduced solve must match the full-capacity solve exactly:
    the gauged padding region is exact identity/zero, so slicing to any
    covering bucket changes no arithmetic on the active block."""
    poses, lms, obs = _build_world(n_poses=12, n_lm=8)
    g = _as_factor_graph(poses, lms, obs)  # n_poses=12 << CAP.max_poses=64
    full = gn.optimize(g, dataclasses.replace(CFG, solve_bucket_step=0))
    for step in (16, 64):
        bucketed = gn.optimize(g, dataclasses.replace(CFG, solve_bucket_step=step))
        np.testing.assert_array_equal(np.asarray(full.poses),
                                      np.asarray(bucketed.poses))
        np.testing.assert_array_equal(np.asarray(full.lm_xy),
                                      np.asarray(bucketed.lm_xy))


def test_edge_bucketed_assembly_equivalent():
    """Edge-bucketed assembly == full assembly up to f32 reduction-order
    rounding: the sliced-away tail is exactly zero-weight padding, but the
    shorter segment_sum reduces in a different tree order."""
    poses, lms, obs = _build_world(n_poses=12, n_lm=8)
    g = _as_factor_graph(poses, lms, obs)  # n_obs << CAP.max_obs=256
    full = gn.optimize(g, dataclasses.replace(CFG, edge_bucket_step=0))
    for step in (32, 256):
        bucketed = gn.optimize(g, dataclasses.replace(CFG, edge_bucket_step=step))
        np.testing.assert_allclose(np.asarray(full.poses),
                                   np.asarray(bucketed.poses), atol=1e-5)
        np.testing.assert_allclose(np.asarray(full.lm_xy),
                                   np.asarray(bucketed.lm_xy), atol=1e-5)


def _window_oracle_step(g, cfg, window, edge_window):
    """NumPy re-derivation of one fixed-lag iteration (window_gn_step):
    trailing `window` poses free, everything else (incl. all landmarks)
    constant; trailing `edge_window` landmark edges considered."""
    from tpuslam.backend.residuals import landmark_residuals, odometry_residuals
    W = window
    n = int(g.n_poses)
    w0 = max(n - W, 0)
    poses = np.asarray(g.poses, np.float64)
    H = np.zeros((3 * W, 3 * W))
    b = np.zeros(3 * W)
    # odometry edges touching the window
    for k in range(max(w0, 1), n):
        r, ji, jj = (np.asarray(x, np.float64)[0] for x in odometry_residuals(
            jnp.asarray(poses[k - 1])[None], jnp.asarray(poses[k])[None],
            jnp.asarray(np.asarray(g.odo_meas, np.float64)[k])[None]))
        w = cfg.odo_info * float(np.asarray(g.odo_w)[k])
        rj = 3 * (k - w0)
        H[rj:rj + 3, rj:rj + 3] += w * jj.T @ jj
        b[rj:rj + 3] += w * jj.T @ r
        if k - 1 >= w0:   # i-side free too
            ri = 3 * (k - 1 - w0)
            H[ri:ri + 3, ri:ri + 3] += w * ji.T @ ji
            H[ri:ri + 3, rj:rj + 3] += w * ji.T @ jj
            H[rj:rj + 3, ri:ri + 3] += w * jj.T @ ji
            b[ri:ri + 3] += w * ji.T @ r
    # GPS priors
    pi = np.asarray(g.prior_info, np.float64)
    pp = np.asarray(g.prior_pose, np.float64)
    for k in range(w0, n):
        rj = 3 * (k - w0)
        H[rj, rj] += pi[k, 0]
        H[rj + 1, rj + 1] += pi[k, 0]
        H[rj + 2, rj + 2] += pi[k, 1]
        r = poses[k] - pp[k]
        r[2] = float(se2.wrap_angle(r[2]))
        b[rj:rj + 3] += r * np.array([pi[k, 0], pi[k, 0], pi[k, 1]])
    # trailing landmark edges with an in-window pose (map fixed)
    n_obs = int(g.n_obs)
    e0 = max(n_obs - edge_window, 0)
    op = np.asarray(g.obs_pose)
    ol = np.asarray(g.obs_lm)
    oxy = np.asarray(g.obs_xy, np.float64)
    for e in range(e0, n_obs):
        p = int(op[e])
        if p < w0:
            continue
        r, jp, _ = (np.asarray(x, np.float64)[0] for x in landmark_residuals(
            jnp.asarray(poses[p])[None],
            jnp.asarray(np.asarray(g.lm_xy, np.float64)[int(ol[e])])[None],
            jnp.asarray(oxy[e])[None]))
        rj = 3 * (p - w0)
        H[rj:rj + 3, rj:rj + 3] += cfg.lm_info * jp.T @ jp
        b[rj:rj + 3] += cfg.lm_info * jp.T @ r
    # gauge: clamp global fix_first rows + invalid rows
    for rloc in range(W):
        k = w0 + rloc
        if k < cfg.fix_first_poses or k >= n:
            rj = 3 * rloc
            H[rj:rj + 3, :] = 0.0
            H[:, rj:rj + 3] = 0.0
            H[rj:rj + 3, rj:rj + 3] = np.eye(3)
            b[rj:rj + 3] = 0.0
    dp = np.linalg.solve(H, -b).reshape(W, 3)
    out = poses.copy()
    for rloc in range(W):
        k = w0 + rloc
        if cfg.fix_first_poses <= k < n:
            out[k] = poses[k] + dp[rloc]
            out[k, 2] = float(se2.wrap_angle(out[k, 2]))
    return out


@pytest.mark.parametrize("window,n_poses", [(8, 12), (16, 12), (4, 12)])
def test_window_gn_matches_numpy_oracle(window, n_poses):
    """One window_gn_step iteration == the independent f64 NumPy assembly of
    the same fixed-lag problem (boundary edge handling, prior terms,
    landmark pose-blocks, gauge clamping)."""
    poses, lms, obs = _build_world(n_poses=n_poses)
    g = _as_factor_graph(poses, lms, obs)
    cfg = dataclasses.replace(CFG, iterations=1, early_exit_tol=0.0)
    got = np.asarray(gn.window_gn_step(g, cfg, window, 128,
                                       landmarks=False).poses)
    want = _window_oracle_step(g, cfg, window, 128)
    np.testing.assert_allclose(got[:n_poses], want[:n_poses],
                               rtol=1e-4, atol=1e-4)


def test_window_gn_invariants():
    """Fixed-lag refinement never touches pre-window poses or padding;
    pose-only mode never touches landmarks; enable=False is an exact
    identity; chi2 decreases."""
    poses, lms, obs = _build_world(n_poses=12, noise=0.3)
    g = _as_factor_graph(poses, lms, obs)
    cfg = dataclasses.replace(CFG, iterations=3)
    W = 6
    out = gn.optimize_window(g, cfg, W, 128, landmarks=False)
    w0 = 12 - W
    np.testing.assert_array_equal(np.asarray(out.lm_xy), np.asarray(g.lm_xy))
    np.testing.assert_array_equal(np.asarray(out.poses)[:w0],
                                  np.asarray(g.poses)[:w0])
    np.testing.assert_array_equal(np.asarray(out.poses)[12:],
                                  np.asarray(g.poses)[12:])
    assert float(gn.chi2(out, cfg)) < float(gn.chi2(g, cfg))
    ident = gn.optimize_window(g, cfg, W, 128, enable=jnp.asarray(False))
    np.testing.assert_array_equal(np.asarray(ident.poses),
                                  np.asarray(g.poses))
    np.testing.assert_array_equal(np.asarray(ident.lm_xy),
                                  np.asarray(g.lm_xy))


def test_window_gn_free_map_mode():
    """landmarks=True: the map refines (chi2 drops at least as much as
    pose-only), gauge-clamped landmarks stay put bit-exactly, and padding
    landmark rows receive an exact-zero update."""
    poses, lms, obs = _build_world(n_poses=12, noise=0.3)
    g = _as_factor_graph(poses, lms, obs)
    cfg = dataclasses.replace(CFG, iterations=3)
    W = 6
    out_p = gn.optimize_window(g, cfg, W, 128, landmarks=False)
    out_f = gn.optimize_window(g, cfg, W, 128, landmarks=True)
    c0 = float(gn.chi2(g, cfg))
    cp = float(gn.chi2(out_p, cfg))
    cf = float(gn.chi2(out_f, cfg))
    assert cf < c0 and cf <= cp + 1e-6, (c0, cp, cf)
    # gauge-fixed landmarks and padding rows untouched
    np.testing.assert_array_equal(np.asarray(out_f.lm_xy)[:2],
                                  np.asarray(g.lm_xy)[:2])
    np.testing.assert_array_equal(np.asarray(out_f.lm_xy)[len(lms):],
                                  np.asarray(g.lm_xy)[len(lms):])
    # some in-window-observed landmark actually moved
    assert np.abs(np.asarray(out_f.lm_xy)[2:len(lms)]
                  - np.asarray(g.lm_xy)[2:len(lms)]).max() > 1e-6


def test_window_gn_marginal_prior_restores():
    """Free-map fixed-lag analytic oracle (ADVICE r3 medium): with every
    pose clamped, the landmark system is decoupled and the converged
    estimate must be the information-weighted mean of the marginalized
    prior (n_out obs anchored at the entry estimate A) and the in-window
    measurements (n_in obs implying position B):

        x* = (n_out * A + n_in * B) / (n_out + n_in)

    The pre-fix behavior (prior re-centered at the current estimate each
    iteration, zero gradient) converges to B instead — the marginalized
    information leaks entirely after a few iterations."""
    n_poses, n_out, n_in = 12, 6, 3
    A = np.array([3.0, -1.0], np.float32)         # entry estimate = prior mean
    B = np.array([4.0, 0.5], np.float32)          # in-window implied position
    rng = np.random.default_rng(7)
    poses = rng.normal(0, 2.0, (n_poses, 3)).astype(np.float32)
    g = G.empty_graph(CAP)
    prev = None
    for p in poses:
        meas = np.zeros(3) if prev is None else np.asarray(se2.between(prev, p))
        g = G.add_pose(g, jnp.asarray(p), jnp.asarray(meas, jnp.float32))
        prev = p
    g = G.add_landmark(g, jnp.asarray(A), jnp.int32(1))

    def body_of(p, target):
        c, s = np.cos(p[2]), np.sin(p[2])
        d = target - p[:2]
        return np.array([c * d[0] + s * d[1], -s * d[0] + c * d[1]],
                        np.float32)

    # n_out edges from early poses (any measurement — they scroll out of the
    # edge window and only their COUNT feeds the marginal prior)
    for e in range(n_out):
        g = G.add_observation(g, jnp.int32(e % 4), jnp.int32(0),
                              jnp.asarray(body_of(poses[e % 4], A)))
    # n_in edges from in-window poses, each implying the landmark sits at B
    W = 4
    for e in range(n_in):
        p_idx = n_poses - 1 - (e % W)
        g = G.add_observation(g, jnp.int32(p_idx), jnp.int32(0),
                              jnp.asarray(body_of(poses[p_idx], B)))
    cfg = dataclasses.replace(CFG, iterations=10, fix_first_poses=n_poses,
                              fix_first_landmarks=0)
    out = gn.optimize_window(g, cfg, W, n_in)     # edge window = in-window obs
    want = (n_out * A + n_in * B) / (n_out + n_in)
    got = np.asarray(out.lm_xy)[0]
    np.testing.assert_allclose(got, want, atol=1e-4)
    # discriminates against the leak: the old fixpoint is B
    assert np.linalg.norm(got - B) > 0.3


def test_window_gn_gps_prior_anchoring():
    """With GPS priors and the window covering the whole (unclamped) chain,
    fixed-lag refinement pulls poses toward the priors."""
    poses, lms, obs = _build_world(n_poses=10, noise=0.4, seed=9)
    g = _as_factor_graph(poses, lms, obs)
    # priors at the noisy poses themselves, strongly weighted
    g = dataclasses.replace(
        g, prior_pose=g.poses,
        prior_info=g.prior_info.at[:10].set(jnp.asarray([50.0, 20.0])))
    cfg = dataclasses.replace(CFG, iterations=5, fix_first_poses=0)
    # perturb the estimates away from the priors
    g2 = dataclasses.replace(g, poses=g.poses.at[:10, :2].add(0.3))
    out = gn.optimize_window(g2, cfg, 16, 256)
    d_before = np.linalg.norm(np.asarray(g2.poses - g.prior_pose)[:10, :2],
                              axis=1)
    d_after = np.linalg.norm(np.asarray(out.poses - g.prior_pose)[:10, :2],
                             axis=1)
    assert d_after.max() < d_before.max() * 0.5
