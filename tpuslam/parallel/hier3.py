"""Three-level nested dissection for the resident DD solve (multi-pod).

VERDICT r4 next #7: the two-level solve (`parallel/hier.py`) holds >= 0.70
predicted weak efficiency to one v5e pod (D = 256, tray = 16) but falls to
0.45 by D = 1024 — its level-2 exchange prices EVERY cross-tray byte at DCN
cost, which is wrong inside a pod (a v5e pod is one all-ICI domain). The
fix is one more dissection level that matches the machine's actual comm
hierarchy:

    level 1 (ICI, within tray):  eliminate tray-interior separators +
                                 tray-local shared landmarks
    level 2 (ICI, within pod):   sum tray Schur complements across the
                                 pod's trays; eliminate the pod-interior
                                 tray boundaries + pod-local shared lms
    level 3 (DCN, across pods):  sum pod Schur complements; solve the
                                 O(n_pods) pod-boundary system

Modeled weak efficiency (comm_model.hier3_comm_time, SCALING r5
assumptions): 0.77 at D = 1024 and 0.65 at D = 4096 with tray = 16,
pod = 256 — vs the two-level 0.45 / 0.09.

Correctness is the nested-dissection argument applied twice: a
tray-interior separator's complete row lives in the within-tray sum; a
tray-BOUNDARY separator that is not a pod boundary is completed by the
within-pod sum (the adjacent tray is in the same pod exactly when the
boundary is pod-interior); a pod-boundary separator completes at level 3.
Shared landmarks classify by their observing span: tray-local -> level-1
block, pod-local (cross-tray, one pod) -> level-2 block, cross-pod ->
level-3 block. Results equal the flat DD, the two-level solve, and the
single-device oracle to f32 reduction order (tests/test_hier.py::
test_hier3_matches_flat_and_single).

Reference anchor: generalizes the same single-core optimize placement as
the flat and two-level solvers (reference src/slam.cpp:461-484, 552-635);
no reference equivalent exists — this is the multi-pod layer SURVEY.md
§5.7-5.8 mandates beyond one pod.
"""
from __future__ import annotations

import dataclasses
import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax import shard_map
from jax.sharding import PartitionSpec as P

from tpuslam.backend import gauss_newton as gn
from tpuslam.backend.graph import FactorGraph
from tpuslam.geometry import se2
from tpuslam.parallel.chain import assemble_pose_rows
from tpuslam.parallel.resident import (ResidentChainPlan,
                                       partition_chain_resident)

__all__ = ["Hier3ChainPlan", "partition_chain_hier3",
           "chain_gn_step_dd_hier3", "chain_optimize_hier3",
           "hier3_comm_bytes_per_iteration"]


@dataclasses.dataclass(frozen=True)
class Hier3ChainPlan:
    """Resident plan + the three-level interface permutation (host-side).

    Layout of `hier_src` (flat-interface index per hier slot; m = padding):
    [tray 0 W | ... | tray T-1 W | pod 0 K2 | ... | pod Np-1 K2 | K3],
    W = the tray's G-1 interior separators + its tray-local shared lms,
    K2 = the pod's Tp-1 interior tray boundaries + its pod-local shared
    lms, K3 = the Np pod boundaries + dummy + cross-pod shared lms."""
    rplan: ResidentChainPlan
    tray: int                  # G: devices per tray
    pod: int                   # Pd: devices per pod (an all-ICI domain)
    n_tray: int                # T = D / G (total trays)
    n_pod: int                 # Np = D / Pd
    wt: int                    # per-tray W width
    wk2: int                   # per-pod K2 width
    mk3: int                   # K3 width
    hier_src: jax.Array        # [T*wt + Np*wk2 + mk3]
    lm_hier_x: jax.Array       # [lsh] hier slot of shared lm's x
    lm_tray: jax.Array         # [lsh] owning tray (-1 pad, T = not tray-lcl)
    lm_pod: jax.Array          # [lsh] owning pod  (-1 pad, Np = cross-pod)

    def __hash__(self):
        return id(self)

    def __eq__(self, other):
        return self is other


def partition_chain_hier3(g: FactorGraph, n_shards: int, tray: int,
                          pod: int, lb=None,
                          shared_cap=None) -> Hier3ChainPlan:
    """Resident plan + span classification of every shared landmark
    (tray-local / pod-local / cross-pod) + the three-level permutation."""
    if pod % tray or n_shards % pod:
        raise ValueError(f"need tray {tray} | pod {pod} | devices "
                         f"{n_shards} as a divisibility chain")
    rp = partition_chain_resident(g, n_shards, lb=lb, shared_cap=shared_cap)
    d, G, Pd = n_shards, tray, pod
    T = d // G                      # total trays
    Tp = Pd // G                    # trays per pod
    Np = d // Pd                    # pods
    cap = g.capacity
    block = cap.max_poses // d
    lsh = rp.shared_cap
    L = cap.max_landmarks

    # observing span per shared landmark (from the ORIGINAL edges)
    n_obs = int(g.n_obs)
    op = np.asarray(g.obs_pose)[:n_obs]
    ol = np.asarray(g.obs_lm)[:n_obs]
    tray_of_edge = (op // block) // G
    pod_of_edge = (op // block) // Pd
    min_t = np.full(L, T, np.int64)
    max_t = np.full(L, -1, np.int64)
    min_p = np.full(L, Np, np.int64)
    max_p = np.full(L, -1, np.int64)
    np.minimum.at(min_t, ol, tray_of_edge)
    np.maximum.at(max_t, ol, tray_of_edge)
    np.minimum.at(min_p, ol, pod_of_edge)
    np.maximum.at(max_p, ol, pod_of_edge)

    sh_ids = np.asarray(rp.shared_idx)               # [lsh] global ids
    lm_tray = np.full(lsh, -1, np.int64)
    lm_pod = np.full(lsh, -1, np.int64)
    real = sh_ids < L
    ids = sh_ids[real]
    tray_local = min_t[ids] == max_t[ids]
    pod_local = (~tray_local) & (min_p[ids] == max_p[ids])
    lm_tray[real] = np.where(tray_local, min_t[ids], T)
    lm_pod[real] = np.where(tray_local, min_p[ids],
                            np.where(pod_local, min_p[ids], Np))

    per_tray = [np.flatnonzero(lm_tray == t) for t in range(T)]
    per_pod = [np.flatnonzero((lm_tray == T) & (lm_pod == p))
               for p in range(Np)]
    cross_list = np.flatnonzero(lm_pod == Np)
    lsh_t_cap = max(8, -(-max((len(x) for x in per_tray), default=1) // 8) * 8)
    lsh_p_cap = max(8, -(-max((len(x) for x in per_pod), default=1) // 8) * 8)
    lsh_x_cap = max(8, -(-max(len(cross_list), 1) // 8) * 8)

    m = 3 * d + 3 + 2 * lsh                          # flat interface size
    wt = 3 * (G - 1) + 2 * lsh_t_cap
    wk2 = 3 * (Tp - 1) + 2 * lsh_p_cap
    mk3 = 3 * Np + 3 + 2 * lsh_x_cap
    mh = T * wt + Np * wk2 + mk3
    hier_src = np.full(mh, m, np.int64)              # m = padding sentinel
    lm_hier_x = np.full(lsh, mh, np.int64)

    def flat_sep(dev):
        return 3 * dev

    def flat_lm(s):
        return 3 * d + 3 + 2 * s

    for t in range(T):
        base = t * wt
        for i in range(G - 1):                        # tray interiors
            dev = t * G + i
            hier_src[base + 3 * i: base + 3 * i + 3] = \
                np.arange(flat_sep(dev), flat_sep(dev) + 3)
        for r, s in enumerate(per_tray[t]):           # tray-local lms
            pos = base + 3 * (G - 1) + 2 * r
            hier_src[pos] = flat_lm(s)
            hier_src[pos + 1] = flat_lm(s) + 1
            lm_hier_x[s] = pos
    k2base = T * wt
    for p in range(Np):
        base = k2base + p * wk2
        for i in range(Tp - 1):                       # pod-interior tray
            dev = p * Pd + (i + 1) * G - 1            # boundaries
            hier_src[base + 3 * i: base + 3 * i + 3] = \
                np.arange(flat_sep(dev), flat_sep(dev) + 3)
        for r, s in enumerate(per_pod[p]):            # pod-local lms
            pos = base + 3 * (Tp - 1) + 2 * r
            hier_src[pos] = flat_lm(s)
            hier_src[pos + 1] = flat_lm(s) + 1
            lm_hier_x[s] = pos
    k3base = T * wt + Np * wk2
    for p in range(Np):                               # pod boundaries
        dev = (p + 1) * Pd - 1
        hier_src[k3base + 3 * p: k3base + 3 * p + 3] = \
            np.arange(flat_sep(dev), flat_sep(dev) + 3)
    hier_src[k3base + 3 * Np: k3base + 3 * Np + 3] = \
        np.arange(3 * d, 3 * d + 3)                   # dummy column
    for r, s in enumerate(cross_list):
        pos = k3base + 3 * Np + 3 + 2 * r
        hier_src[pos] = flat_lm(s)
        hier_src[pos + 1] = flat_lm(s) + 1
        lm_hier_x[s] = pos

    return Hier3ChainPlan(
        rplan=rp, tray=G, pod=Pd, n_tray=T, n_pod=Np,
        wt=wt, wk2=wk2, mk3=mk3,
        hier_src=jnp.asarray(hier_src, jnp.int32),
        lm_hier_x=jnp.asarray(lm_hier_x, jnp.int32),
        lm_tray=jnp.asarray(lm_tray, jnp.int32),
        lm_pod=jnp.asarray(lm_pod, jnp.int32))


def chain_gn_step_dd_hier3(poses, odo_meas, odo_w, prior_pose, prior_info,
                           lm_loc, lm_gid_flat, lm_shared, sh_ids,
                           hplan: Hier3ChainPlan, cfg: gn.GNConfig, mesh,
                           n_poses, n_landmarks):
    """One three-level resident GN iteration: identical math to
    `hier.chain_gn_step_dd_hier` up to the interface solve, which runs in
    three levels (within-tray psum, within-pod psum of tray complements,
    cross-pod psum of pod complements)."""
    plan = hplan.rplan
    g = plan.graph
    cap = g.capacity
    n_dev = plan.n_dev
    G = hplan.tray
    Pd = hplan.pod
    T = hplan.n_tray
    Tp = Pd // G
    Np = hplan.n_pod
    wt, wk2, mk3 = hplan.wt, hplan.wk2, hplan.mk3
    mh = T * wt + Np * wk2 + mk3
    b = cap.max_poses // n_dev
    ni = b - 1
    lb = plan.lb
    lsh = plan.shared_cap
    ldev = lb + lsh
    m = 3 * n_dev + 3 + 2 * lsh
    dtype = poses.dtype
    plan_L = cap.max_landmarks
    tray_groups = [[t * G + i for i in range(G)] for t in range(T)]
    pod_groups = [[p * Pd + i for i in range(Pd)] for p in range(Np)]

    pose_spec = P("chain")
    rep = P()

    def per_shard(poses_l, odo_l, odo_w_sh, prior_pose_l, prior_info_l,
                  obs_pose_l, obs_lm_l, obs_xy_l, counts_l,
                  lm_loc_l, lm_gid_l, lm_sh, sh_idx, hier_src, lm_hier_x,
                  lm_tray, lm_pod):
        dev = jax.lax.axis_index("chain")
        my_tray = dev // G
        my_pod = dev // Pd
        base = dev * b
        perm = [(i, (i + 1) % n_dev) for i in range(n_dev)]
        k_global = base + jnp.arange(b)

        h_diag_l, h_off_l, gp_l = assemble_pose_rows(
            poses_l, odo_l, odo_w_sh, prior_pose_l, prior_info_l, cfg,
            n_poses, n_dev, base, "chain")

        lm_dev = jnp.concatenate([lm_loc_l, lm_sh], axis=0)
        eb = obs_pose_l.shape[0]
        w_l = jnp.asarray(cfg.lm_info, dtype) * \
            (jnp.arange(eb) < counts_l[0]).astype(dtype)
        local_idx = jnp.clip(obs_pose_l - base, 0, b - 1)
        h_diag_lm, w0, w1, hll, gp_lm, gl = \
            gn._landmark_edge_blocks_split(
                poses_l, lm_dev, local_idx, obs_lm_l, obs_xy_l, w_l, ldev)
        h_diag_l = h_diag_l + h_diag_lm
        gp_l = gp_l + gp_lm
        hll_sh, gl_sh = jax.lax.psum((hll[lb:], gl[lb:]), "chain")
        hll = hll.at[lb:].set(hll_sh)
        gl = gl.at[lb:].set(gl_sh)

        # ---- gauge (identical to the flat resident solve) ----
        free_pose = (k_global >= cfg.fix_first_poses) & (k_global < n_poses)
        fpb = free_pose.astype(dtype)[:, None, None]
        eye3 = jnp.eye(3, dtype=dtype)
        h_diag_l = h_diag_l * fpb + eye3 * (1.0 - fpb)
        prev_free = jnp.concatenate(
            [jax.lax.ppermute(free_pose[-1:], "chain", perm),
             free_pose[:-1]])
        pair = (free_pose & prev_free & (k_global >= 1)).astype(dtype)
        h_off_l = h_off_l * pair[:, None, None]
        gid_dev = jnp.concatenate([lm_gid_l, sh_idx])
        free_lm = (gid_dev >= cfg.fix_first_landmarks) & \
            (gid_dev < n_landmarks)
        flm = free_lm.astype(dtype)
        w0 = w0 * free_pose.astype(dtype).repeat(3)[:, None] * flm[None, :]
        w1 = w1 * free_pose.astype(dtype).repeat(3)[:, None] * flm[None, :]
        eye2 = jnp.eye(2, dtype=dtype)
        flb = flm[:, None, None]
        hll = hll * flb + eye2 * (1.0 - flb)
        gp_l = gp_l * free_pose.astype(dtype)[:, None]
        gl = gl * flm[:, None]
        if cfg.damping:
            h_diag_l = h_diag_l + eye3 * jnp.asarray(cfg.damping, dtype) * fpb
            hll = hll + eye2 * jnp.asarray(cfg.damping, dtype) * flb

        # ---- eliminate RESIDENT landmarks ----
        hll_inv = gn._inv2x2(hll)
        ia, ib_, ic = hll_inv[:, 0, 0], hll_inv[:, 0, 1], hll_inv[:, 1, 1]
        locf = (jnp.arange(ldev) < lb).astype(dtype) * flm
        w0_loc = w0 * locf[None, :]
        w1_loc = w1 * locf[None, :]
        wa0 = w0_loc * ia[None, :] + w1_loc * ib_[None, :]
        wa1 = w0_loc * ib_[None, :] + w1_loc * ic[None, :]
        s_block = gn.densify_hpp(h_diag_l, h_off_l) \
            - (wa0 @ w0_loc.T + wa1 @ w1_loc.T)
        gl0, gl1 = gl[:, 0], gl[:, 1]
        g_eff = gp_l.reshape(-1) - (wa0 @ gl0 + wa1 @ gl1)

        a_mat = s_block[:3 * ni, :3 * ni]
        b_own = s_block[:3 * ni, 3 * ni:]
        c_sep = s_block[3 * ni:, 3 * ni:]
        g_int = g_eff[:3 * ni]
        g_sep = g_eff[3 * ni:]

        sh_ok = (sh_idx < plan_L).astype(dtype)
        w_sh = jnp.stack([w0[:, lb:], w1[:, lb:]], axis=-1) \
            .reshape(3 * b, 2 * lsh)

        b_full = jnp.zeros((3 * ni, m), dtype)
        b_full = jax.lax.dynamic_update_slice(b_full, b_own, (0, 3 * dev))
        prev_col = jnp.where(dev > 0, 3 * (dev - 1), 3 * n_dev)
        b_full = jax.lax.dynamic_update_slice(b_full, h_off_l[0].T,
                                              (0, prev_col))
        b_full = b_full.at[:, 3 * n_dev + 3:].set(w_sh[:3 * ni])

        c_full = jnp.zeros((m, m), dtype)
        c_full = jax.lax.dynamic_update_slice(c_full, c_sep,
                                              (3 * dev, 3 * dev))
        w_sep_sh = w_sh[3 * ni:]
        c_full = jax.lax.dynamic_update_slice(c_full, w_sep_sh,
                                              (3 * dev, 3 * n_dev + 3))
        c_full = jax.lax.dynamic_update_slice(c_full, w_sep_sh.T,
                                              (3 * n_dev + 3, 3 * dev))
        # shared-landmark Hll/gl: added once per owning TRAY (tray-local),
        # once per owning POD by the pod's first device (pod-local — flows
        # through that tray's level-1 sum into the pod's level-2 sum), once
        # globally by device 0 (cross-pod)
        hll_sh2 = hll[lb:]
        own_add = jnp.where(
            lm_tray == my_tray, (dev % G == 0).astype(dtype),
            jnp.where((lm_tray == T) & (lm_pod == my_pod),
                      (dev % Pd == 0).astype(dtype),
                      jnp.where(lm_pod == Np, (dev == 0).astype(dtype),
                                0.0)))
        r2 = jnp.arange(2 * lsh)
        blk2 = r2 // 2
        same2 = (blk2[:, None] == blk2[None, :]).astype(dtype)
        add2 = own_add.repeat(2)
        hll_dense = same2 * jnp.broadcast_to(
            hll_sh2.reshape(2 * lsh, 1, 2), (2 * lsh, lsh, 2)
        ).reshape(2 * lsh, 2 * lsh) * add2[:, None]
        c_full = c_full.at[3 * n_dev + 3:, 3 * n_dev + 3:].add(hll_dense)
        g_if = jnp.zeros((m,), dtype)
        g_if = jax.lax.dynamic_update_slice(g_if, g_sep, (3 * dev,))
        g_if = g_if.at[3 * n_dev + 3:].add(
            add2 * gl[lb:].reshape(2 * lsh))

        chol_a = jnp.linalg.cholesky(a_mat)
        x_b = jax.scipy.linalg.cho_solve((chol_a, True), b_full)
        y_g = jax.scipy.linalg.cho_solve((chol_a, True), g_int)
        s_if_part = c_full - b_full.T @ x_b
        g_if_part = g_if - b_full.T @ y_g

        # ---- project flat -> [own tray W | own pod K2 | K3] (local) ----
        w0h = my_tray * wt
        k2h = T * wt + my_pod * wk2
        src_w = jax.lax.dynamic_slice(hier_src, (w0h,), (wt,))
        src_k2 = jax.lax.dynamic_slice(hier_src, (k2h,), (wk2,))
        src_sub = jnp.concatenate([src_w, src_k2,
                                   hier_src[T * wt + Np * wk2:]])
        ms = wt + wk2 + mk3
        s_pad = jnp.zeros((m + 1, m + 1), dtype).at[:m, :m].set(s_if_part)
        g_pad = jnp.concatenate([g_if_part, jnp.zeros((1,), dtype)])
        S_h = s_pad[src_sub][:, src_sub]
        g_h = g_pad[src_sub]

        # ---- level 1: within-tray psum (ICI) ----
        S_t, g_t = jax.lax.psum((S_h, g_h), "chain",
                                axis_index_groups=tray_groups)

        # validity mask (flat act gathered into sub layout)
        sep_valid = jax.lax.all_gather(
            ((base + b - 1) < n_poses).astype(dtype)[None], "chain"
        ).reshape(-1).repeat(3)
        act_flat = jnp.concatenate([sep_valid, jnp.zeros((3,), dtype),
                                    sh_ok.repeat(2), jnp.zeros((1,), dtype)])
        act_h = act_flat[src_sub]
        S_t = S_t * act_h[:, None] * act_h[None, :] + jnp.diag(1.0 - act_h)
        g_t = g_t * act_h

        # ---- tray Schur: eliminate my tray's W block ----
        A_ww = S_t[:wt, :wt]
        B_wk = S_t[:wt, wt:]
        g_w = g_t[:wt]
        K_kk = S_t[wt:, wt:]
        g_k = g_t[wt:]
        chol_w = jnp.linalg.cholesky(A_ww)
        ainv_b = jax.scipy.linalg.cho_solve((chol_w, True), B_wk)
        ainv_g = jax.scipy.linalg.cho_solve((chol_w, True), g_w)
        first_t = (dev % G == 0).astype(dtype)
        S2_part = (K_kk - B_wk.T @ ainv_b) * first_t      # [wk2+mk3]^2
        g2_part = (g_k - B_wk.T @ ainv_g) * first_t

        # ---- level 2: within-pod psum of tray complements (ICI) ----
        S2, g2 = jax.lax.psum((S2_part, g2_part), "chain",
                              axis_index_groups=pod_groups)

        # ---- pod Schur: eliminate my pod's K2 block ----
        A_22 = S2[:wk2, :wk2]
        B_23 = S2[:wk2, wk2:]
        g_2 = g2[:wk2]
        K_33 = S2[wk2:, wk2:]
        g_3 = g2[wk2:]
        chol_2 = jnp.linalg.cholesky(A_22)
        ainv_b2 = jax.scipy.linalg.cho_solve((chol_2, True), B_23)
        ainv_g2 = jax.scipy.linalg.cho_solve((chol_2, True), g_2)
        first_p = (dev % Pd == 0).astype(dtype)
        S3_part = (K_33 - B_23.T @ ainv_b2) * first_p     # [mk3, mk3]
        g3_part = (g_3 - B_23.T @ ainv_g2) * first_p

        # ---- level 3: cross-pod psum (DCN at multi-pod scale) ----
        S3, g3 = jax.lax.psum((S3_part, g3_part), "chain")
        chol3 = jnp.linalg.cholesky(S3)
        x3 = jax.scipy.linalg.cho_solve((chol3, True), -g3)

        # back-substitute my pod's K2, then my tray's W
        x2 = -ainv_g2 - ainv_b2 @ x3
        xk = jnp.concatenate([x2, x3])                    # [wk2 + mk3]
        x_w = -ainv_g - ainv_b @ xk

        # flat dx: own tray's W + own pod's K2 + K3 (other trays'/pods'
        # columns are zero in this device's b_full by construction)
        dx_sub = jnp.concatenate([x_w, xk])
        dx_flat = jnp.zeros((m + 1,), dtype).at[src_sub].set(
            dx_sub, mode="drop")[:m]

        # shared-landmark updates, replicated via one [2*lsh] psum:
        # tray-local from the tray's first device, pod-local from the
        # pod's first device, cross-pod from device 0
        sub_pos = jnp.where(
            lm_tray == my_tray, lm_hier_x - w0h,
            jnp.where((lm_tray == T) & (lm_pod == my_pod),
                      wt + (lm_hier_x - k2h),
                      jnp.where(lm_pod == Np,
                                wt + wk2 + (lm_hier_x
                                            - (T * wt + Np * wk2)),
                                jnp.int32(ms))))
        dxp = jnp.concatenate([dx_sub, jnp.zeros((2,), dtype)])
        lmx = jnp.clip(sub_pos, 0, ms)
        vx = dxp[lmx]
        vy = dxp[jnp.clip(lmx + 1, 0, ms + 1)]
        contrib = jnp.where(
            lm_tray == my_tray, first_t,
            jnp.where((lm_tray == T) & (lm_pod == my_pod), first_p,
                      jnp.where(lm_pod == Np, (dev == 0).astype(dtype),
                                0.0)))
        dl_sh = jax.lax.psum(
            jnp.stack([vx, vy], -1) * contrib[:, None], "chain")
        dl_sh = dl_sh * sh_ok[:, None]

        dp_int = jax.scipy.linalg.cho_solve(
            (chol_a, True), -g_int - b_full @ dx_flat)
        dp_sep = jax.lax.dynamic_slice(dx_flat, (3 * dev,), (3,))
        dp_blk = jnp.concatenate([dp_int, dp_sep]).reshape(b, 3)

        dp_flat = dp_blk.reshape(-1)
        r0 = gl0 + w0_loc.T @ dp_flat
        r1 = gl1 + w1_loc.T @ dp_flat
        dl_dev = -jnp.stack([ia * r0 + ib_ * r1, ib_ * r0 + ic * r1],
                            axis=-1) * locf[:, None]
        new_loc = lm_loc_l + dl_dev[:lb]
        new_sh = lm_sh + dl_sh

        new_local = poses_l + dp_blk
        new_local = new_local.at[:, 2].set(
            se2.wrap_angle(new_local[:, 2]))
        return new_local, new_loc, new_sh

    fn = shard_map(
        per_shard, mesh=mesh,
        in_specs=(pose_spec, pose_spec, pose_spec, pose_spec, pose_spec,
                  pose_spec, pose_spec, pose_spec, pose_spec,
                  pose_spec, pose_spec, rep, rep, rep, rep, rep, rep),
        out_specs=(pose_spec, pose_spec, rep),
        check_vma=False)
    with jax.default_matmul_precision("highest"):
        return fn(poses, odo_meas, odo_w, prior_pose, prior_info,
                  g.obs_pose, g.obs_lm, g.obs_xy, plan.edge_counts,
                  lm_loc, lm_gid_flat, lm_shared, sh_ids,
                  hplan.hier_src, hplan.lm_hier_x, hplan.lm_tray,
                  hplan.lm_pod)


@functools.lru_cache(maxsize=32)
def _hier3_runner(hplan: Hier3ChainPlan, cfg: gn.GNConfig, mesh):
    @jax.jit
    def run(poses, odo_meas, odo_w, prior_pose, prior_info,
            lm_loc, lm_gid, lm_shared, sh_ids, n_poses, n_landmarks):
        def body(_, carry):
            p, ll, ls = carry
            return chain_gn_step_dd_hier3(
                p, odo_meas, odo_w, prior_pose, prior_info,
                ll, lm_gid, ls, sh_ids, hplan, cfg, mesh,
                n_poses, n_landmarks)
        return jax.lax.fori_loop(0, cfg.iterations, body,
                                 (poses, lm_loc, lm_shared))

    return run


def chain_optimize_hier3(g: FactorGraph, cfg: gn.GNConfig, mesh,
                         tray: int, pod: int,
                         plan: Hier3ChainPlan | None = None) -> FactorGraph:
    """Full three-level resident DD GN (same wrapper contract as
    `hier.chain_optimize_hier`)."""
    if plan is None:
        plan = partition_chain_hier3(g, mesh.devices.size, tray, pod)
    rp = plan.rplan
    L = g.capacity.max_landmarks
    gid = rp.lm_local_gid
    lm_loc = g.lm_xy[jnp.clip(gid, 0, L - 1)].reshape(-1, 2) \
        * (gid < L).reshape(-1, 1)
    sh = rp.shared_idx
    lm_shared = g.lm_xy[jnp.clip(sh, 0, L - 1)] * (sh < L)[:, None]
    g2 = rp.graph
    new_poses, new_loc, new_sh = _hier3_runner(plan, cfg, mesh)(
        g2.poses, g2.odo_meas, g2.odo_w, g2.prior_pose, g2.prior_info,
        lm_loc, gid.reshape(-1), lm_shared, sh, g.n_poses, g.n_landmarks)
    gid_f = gid.reshape(-1)
    lm = g.lm_xy.at[jnp.where(gid_f < L, gid_f, L)].set(new_loc, mode="drop")
    lm = lm.at[jnp.where(sh < L, sh, L)].set(new_sh, mode="drop")
    return dataclasses.replace(g, poses=new_poses, lm_xy=lm)


def hier3_comm_bytes_per_iteration(hplan: Hier3ChainPlan) -> dict:
    """Analytic per-iteration comm volume by level, for the instrumented
    cross-check (tests/test_hier.py::test_hier3_payload_instrumented):
    level 1 rides the tray's ICI group, level 2 the pod's ICI group,
    level 3 (and the O(lsh) shared-landmark vectors) cross pods."""
    ms = hplan.wt + hplan.wk2 + hplan.mk3     # level-1 sub-interface
    mw = hplan.wk2 + hplan.mk3                # level-2 sub-interface
    mk3 = hplan.mk3
    lsh = hplan.rplan.shared_cap
    return {
        "level1_ici_psum": (ms * ms + ms) * 4,
        "level2_pod_psum": (mw * mw + mw) * 4,
        "level3_cross_psum": (mk3 * mk3 + mk3) * 4,
        "shared_hll_gl_psum": lsh * 6 * 4,
        "dl_shared_psum": lsh * 2 * 4,
        "pose_halo_ppermute": 2 * (3 + 9 + 3) * 4,
        "note": ("level-1 payload ~ flat m/T within a tray (ICI); level 2 "
                 "sums tray complements within the pod (ICI); only the "
                 "[mk3, mk3] system and the O(lsh) shared-update vectors "
                 "cross pods"),
    }
