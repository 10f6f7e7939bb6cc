"""Golden NumPy GraphSLAM — independent float64 oracle + measured CPU baseline.

This module deliberately re-implements the whole Gauss-Newton problem with
explicit Python loops and dense NumPy in float64, mirroring how g2o solves the
reference's graph (sequential edge accumulation, full sparse-as-dense normal
equations, no Schur trick). It shares NO code with the JAX backend so that a
bug cannot cancel itself between implementation and test.

It also serves as the *measured baseline* required by BASELINE.md: the
reference publishes no numbers, so bench.py times this faithful CPU
re-implementation as the reference stand-in.
"""
from __future__ import annotations

import math

import numpy as np

__all__ = ["GoldenGraph", "golden_optimize"]


def _wrap(t):
    while t > math.pi:
        t -= 2 * math.pi
    while t <= -math.pi:
        t += 2 * math.pi
    return t


class GoldenGraph:
    """Edge-list graph in plain Python structures."""

    def __init__(self):
        self.poses: list[np.ndarray] = []          # [3] each
        self.odo: list[tuple[int, int, np.ndarray]] = []   # (i, j, meas[3])
        self.landmarks: list[np.ndarray] = []      # [2] each
        self.obs: list[tuple[int, int, np.ndarray]] = []   # (pose i, lm j, z[2])

    def add_pose(self, pose):
        pose = np.asarray(pose, dtype=np.float64)
        if self.poses:
            i = len(self.poses) - 1
            prev = self.poses[i]
            c, s = math.cos(prev[2]), math.sin(prev[2])
            d = pose[:2] - prev[:2]
            meas = np.array([c * d[0] + s * d[1], -s * d[0] + c * d[1],
                             _wrap(pose[2] - prev[2])])
            self.odo.append((i, i + 1, meas))
        self.poses.append(pose.copy())

    def add_landmark(self, xy):
        self.landmarks.append(np.asarray(xy, dtype=np.float64).copy())
        return len(self.landmarks) - 1

    def add_observation(self, pose_idx, lm_idx, z_xy):
        self.obs.append((pose_idx, lm_idx, np.asarray(z_xy, dtype=np.float64).copy()))


def _odo_terms(pi, pj, m):
    ci, si = math.cos(pi[2]), math.sin(pi[2])
    cm, sm = math.cos(m[2]), math.sin(m[2])
    ri_t = np.array([[ci, si], [-si, ci]])
    rm_t = np.array([[cm, sm], [-sm, cm]])
    d = pj[:2] - pi[:2]
    rel_t = ri_t @ d
    r = np.empty(3)
    r[:2] = rm_t @ (rel_t - m[:2])
    r[2] = _wrap(pj[2] - pi[2] - m[2])
    dri_t = np.array([[-si, ci], [-ci, -si]])
    j_i = np.zeros((3, 3))
    j_i[:2, :2] = -rm_t @ ri_t
    j_i[:2, 2] = rm_t @ (dri_t @ d)
    j_i[2, 2] = -1.0
    j_j = np.zeros((3, 3))
    j_j[:2, :2] = rm_t @ ri_t
    j_j[2, 2] = 1.0
    return r, j_i, j_j


def _lm_terms(p, l, z):
    c, s = math.cos(p[2]), math.sin(p[2])
    ri_t = np.array([[c, s], [-s, c]])
    d = l - p[:2]
    r = ri_t @ d - z
    dri_t = np.array([[-s, c], [-c, -s]])
    j_p = np.zeros((2, 3))
    j_p[:, :2] = -ri_t
    j_p[:, 2] = dri_t @ d
    return r, j_p, ri_t


def golden_optimize(g: GoldenGraph, odo_info=5.0, lm_info=0.01, iterations=10,
                    fix_poses=2, fix_landmarks=2):
    """Full-dense float64 Gauss-Newton; mutates g in place, returns chi2 history."""
    chi2s = []
    n_p, n_l = len(g.poses), len(g.landmarks)
    dim = 3 * n_p + 2 * n_l
    for _ in range(iterations):
        h = np.zeros((dim, dim))
        grad = np.zeros(dim)
        chi2 = 0.0
        for i, j, m in g.odo:
            r, j_i, j_j = _odo_terms(g.poses[i], g.poses[j], m)
            chi2 += odo_info * float(r @ r)
            bi, bj = 3 * i, 3 * j
            h[bi:bi + 3, bi:bi + 3] += odo_info * j_i.T @ j_i
            h[bi:bi + 3, bj:bj + 3] += odo_info * j_i.T @ j_j
            h[bj:bj + 3, bi:bi + 3] += odo_info * j_j.T @ j_i
            h[bj:bj + 3, bj:bj + 3] += odo_info * j_j.T @ j_j
            grad[bi:bi + 3] += odo_info * j_i.T @ r
            grad[bj:bj + 3] += odo_info * j_j.T @ r
        for i, j, z in g.obs:
            r, j_p, j_l = _lm_terms(g.poses[i], g.landmarks[j], z)
            chi2 += lm_info * float(r @ r)
            bi, bj = 3 * i, 3 * n_p + 2 * j
            h[bi:bi + 3, bi:bi + 3] += lm_info * j_p.T @ j_p
            h[bi:bi + 3, bj:bj + 2] += lm_info * j_p.T @ j_l
            h[bj:bj + 2, bi:bi + 3] += lm_info * j_l.T @ j_p
            h[bj:bj + 2, bj:bj + 2] += lm_info * j_l.T @ j_l
            grad[bi:bi + 3] += lm_info * j_p.T @ r
            grad[bj:bj + 2] += lm_info * j_l.T @ r
        chi2s.append(chi2)

        fixed = []
        for k in range(min(fix_poses, n_p)):
            fixed.extend(range(3 * k, 3 * k + 3))
        for k in range(min(fix_landmarks, n_l)):
            fixed.extend(range(3 * n_p + 2 * k, 3 * n_p + 2 * k + 2))
        for f in fixed:
            h[f, :] = 0.0
            h[:, f] = 0.0
            h[f, f] = 1.0
            grad[f] = 0.0

        delta = np.linalg.solve(h, -grad)
        for k in range(n_p):
            g.poses[k] = g.poses[k] + delta[3 * k:3 * k + 3]
            g.poses[k][2] = _wrap(g.poses[k][2])
        for k in range(n_l):
            g.landmarks[k] = g.landmarks[k] + delta[3 * n_p + 2 * k:3 * n_p + 2 * k + 2]
    return chi2s
