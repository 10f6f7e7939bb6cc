"""Attribute the VLP-16 full-sweep detect_cones time among its stages.

Slope-timed stage programs on the real chip (tunnel constant cancels):
RANSAC ground plane, grid clustering (adjacency build vs label loop),
segment statistics, selection. Also sweeps label_iterations and
cell_capacity — the two knobs VERDICT r2 weak #7 names.
"""
import time

import numpy as np
import jax
import jax.numpy as jnp

from tpuslam.perception import AttentionConfig, detect_cones
from tpuslam.perception.attention import (_connected_components_grid,
                                          _ransac_ground)
from tpuslam.perception.vlp16 import decode_point_cloud_reading
from tpuslam.sim.vlp16_sim import Vlp16SceneConfig, scene_to_point_cloud_reading


def timed_slope(make_fn, k1, k2, reps=3):
    f1, f2 = make_fn(k1), make_fn(k2)
    _ = float(np.asarray(f1()).ravel()[0]); _ = float(np.asarray(f2()).ravel()[0])
    t1 = t2 = 1e9
    for _ in range(reps):
        t0 = time.perf_counter(); _ = float(np.asarray(f1()).ravel()[0])
        t1 = min(t1, time.perf_counter() - t0)
        t0 = time.perf_counter(); _ = float(np.asarray(f2()).ravel()[0])
        t2 = min(t2, time.perf_counter() - t0)
    return (t2 - t1) / (k2 - k1)


def scan_runner(body):
    def make(k):
        @jax.jit
        def run():
            def one(c, _):
                out = body(c)
                return out, out
            _, ys = jax.lax.scan(one, jnp.float32(0), None, length=k)
            return ys[-1]
        return run
    return make


def main():
    rngv = np.random.default_rng(3)
    cones_roi = rngv.uniform([1.0, -3.5], [11.0, 3.5], (12, 2))
    msg = scene_to_point_cloud_reading(
        cones_roi, Vlp16SceneConfig(seed=4, surround_range=30.0))
    cloud, _ = decode_point_cloud_reading(msg)
    fcap = 32768
    fpts = np.zeros((fcap, 3), np.float32)
    nf = min(len(cloud), fcap)
    fpts[:nf] = cloud[:nf]
    pts = jnp.asarray(fpts)
    vmask = jnp.asarray(np.arange(fcap) < nf)
    print(f"points: {nf}")

    base = AttentionConfig(sensor_height=0.9, ground_layer_z=-0.9,
                           inlier_found_threshold=1000, min_points=3)

    # full pipeline baselines at knob settings
    for li, cc in ((16, 64), (8, 64), (6, 64), (16, 32), (8, 32), (6, 24)):
        cfg = AttentionConfig(sensor_height=0.9, ground_layer_z=-0.9,
                              inlier_found_threshold=1000, min_points=3,
                              label_iterations=li, cell_capacity=cc)

        def full(c, cfg=cfg):
            _c, ok, n = detect_cones(pts, vmask, cfg, seed=0)
            return c + n.astype(jnp.float32)

        ms = timed_slope(scan_runner(full), 4, 16) * 1e3
        # correctness: same detections as the base config
        c0, ok0, n0 = detect_cones(pts, vmask, base, seed=0)
        c1, ok1, n1 = detect_cones(pts, vmask, cfg, seed=0)
        same = int(n0) == int(n1) and bool(
            jnp.all(jnp.where(ok0[:, None] & ok1[:, None],
                              jnp.abs(c0 - c1) < 1e-5, True)))
        print(f"li={li:3d} K={cc:3d}: {ms:8.2f} ms/sweep "
              f"({1e3 / ms:7.1f}/s)  n={int(n1)} same_as_base={same}",
              flush=True)

    # stage: RANSAC only
    roi = (vmask & (jnp.abs(pts[:, 1]) <= base.x_boundary)
           & (pts[:, 0] > 0.1) & (pts[:, 0] <= base.y_boundary))

    def ransac(c):
        h = _ransac_ground(pts, roi, base, jax.random.PRNGKey(0))
        return c + h[0]

    print(f"stage ransac: {timed_slope(scan_runner(ransac), 4, 16)*1e3:.2f} ms")

    height = _ransac_ground(pts, roi, base, jax.random.PRNGKey(0))
    obstacle = roi & (height > base.inlier_range_threshold) & \
        (height < base.cone_height + 0.3)
    obstacle = jax.device_put(obstacle)

    def cluster(c):
        lab = _connected_components_grid(pts[:, :2], obstacle, base)
        return c + lab[0].astype(jnp.float32)

    print(f"stage grid-cluster(li=16,K=64): "
          f"{timed_slope(scan_runner(cluster), 4, 16)*1e3:.2f} ms")

    labels = _connected_components_grid(pts[:, :2], obstacle, base)
    labels = jax.device_put(labels)
    w = obstacle.astype(jnp.float32)

    def segstats(c):
        counts = jax.ops.segment_sum(w, labels, num_segments=fcap + 1)[:fcap]
        sums = jax.ops.segment_sum(pts * w[:, None], labels,
                                   num_segments=fcap + 1)[:fcap]
        return c + counts[0] + sums[0, 0]

    print(f"stage segment-stats: "
          f"{timed_slope(scan_runner(segstats), 4, 16)*1e3:.2f} ms")


if __name__ == "__main__":
    main()
