"""VLP-16 decode + attention cone-detection tests (BASELINE config 4)."""
import numpy as np
import jax.numpy as jnp
import pytest

from tpuslam.perception import (
    AttentionConfig, VLP16_ELEVATIONS_DEG, decode_packet, detect_cones,
)
from tpuslam.perception.vlp16 import (
    encode_packet, packet_to_points, spherical_to_xyz,
)
from tpuslam.sim.vlp16_sim import Vlp16SceneConfig, render_scene, scene_to_packets

N_CAP = 2048


def _pad(points, intensity=None):
    n = len(points)
    pts = np.zeros((N_CAP, 3), dtype=np.float32)
    pts[:n] = points[:N_CAP]
    valid = np.zeros(N_CAP, dtype=bool)
    valid[:min(n, N_CAP)] = True
    out = [jnp.asarray(pts), jnp.asarray(valid)]
    if intensity is not None:
        it = np.zeros(N_CAP, dtype=np.float32)
        it[:n] = intensity[:N_CAP]
        out.append(jnp.asarray(it))
    return out


def test_packet_roundtrip():
    rng = np.random.default_rng(0)
    az = np.repeat((np.arange(24) * 0.2)[:, None], 16, axis=1)
    dist = rng.uniform(1, 50, (24, 16))
    pkt = encode_packet(az, dist)
    az2, elev, dist2, inten = decode_packet(pkt)
    np.testing.assert_allclose(elev, VLP16_ELEVATIONS_DEG)
    np.testing.assert_allclose(dist2, dist, atol=0.002)  # 2 mm quantization
    np.testing.assert_allclose(az2[::2, 0], az[::2, 0], atol=0.01)


def test_spherical_to_xyz_axes():
    p = spherical_to_xyz(0.0, 0.0, 10.0)
    np.testing.assert_allclose(p, [10, 0, 0], atol=1e-9)     # dead ahead -> +x
    p = spherical_to_xyz(90.0, 0.0, 5.0)
    np.testing.assert_allclose(p, [0, -5, 0], atol=1e-6)     # cw azimuth -> -y
    p = spherical_to_xyz(0.0, 15.0, 4.0)
    assert p[2] > 0


def test_attention_detects_scene_cones():
    cones = np.array([[4.0, 1.0], [6.0, -2.0], [9.0, 0.5], [3.0, -3.0]])
    types = np.array([1, 2, 1, 2])
    scfg = Vlp16SceneConfig(seed=3)
    pts, inten = render_scene(cones, types, scfg)
    pcap, vcap, icap = _pad(pts, inten)
    acfg = AttentionConfig(sensor_height=scfg.sensor_height,
                           ground_layer_z=-scfg.sensor_height,
                           inlier_found_threshold=300)
    out, ok, n = detect_cones(pcap, vcap, acfg, intensity=icap)
    out = np.asarray(out)[np.asarray(ok)]
    assert int(n) == len(cones), (int(n), out)
    # every true cone recovered within 15 cm, with its type
    got_xy = np.stack([out[:, 2] * np.cos(np.radians(out[:, 0])),
                       out[:, 2] * np.sin(np.radians(out[:, 0]))], axis=1)
    for (cx, cy), ct in zip(cones, types):
        d = np.linalg.norm(got_xy - (cx, cy), axis=1)
        i = d.argmin()
        assert d[i] < 0.15, (cx, cy, got_xy)
        assert int(out[i, 3]) == ct


def test_attention_rejects_wall_and_dust():
    """A long wall (too many points / radius) and isolated specks (too few)
    must not be reported as cones."""
    rng = np.random.default_rng(1)
    wall_y = np.linspace(-3, 3, 300)
    wall = np.stack([np.full_like(wall_y, 8.0), wall_y,
                     rng.uniform(0, 0.4, 300)], axis=1)
    speck = np.array([[5.0, 0.0, 0.2]])
    ground = np.stack([rng.uniform(0.5, 11, 800), rng.uniform(-3.5, 3.5, 800),
                       rng.normal(0, 0.01, 800)], axis=1)
    pts = np.vstack([ground, wall, speck])
    pts[:, 2] -= 0.9
    pcap, vcap = _pad(pts)
    acfg = AttentionConfig(sensor_height=0.9, ground_layer_z=-0.9,
                           inlier_found_threshold=300, min_points=3)
    out, ok, n = detect_cones(pcap, vcap, acfg)
    assert int(n) == 0, np.asarray(out)[np.asarray(ok)]


def test_full_loop_packets_to_cones():
    """Scene -> packets -> decode -> attention recovers the cones."""
    cones = np.array([[5.0, 1.5], [8.0, -1.0]])
    types = np.array([1, 2])
    scfg = Vlp16SceneConfig(seed=5, points_per_cone=60)
    pts, _ = render_scene(cones, types, scfg)
    packets = scene_to_packets(pts, scfg)
    clouds = [packet_to_points(p) for p in packets]
    all_pts = np.vstack([c[0] for c in clouds if len(c[0])])
    pcap, vcap = _pad(all_pts)
    acfg = AttentionConfig(sensor_height=scfg.sensor_height,
                           ground_layer_z=-scfg.sensor_height,
                           inlier_found_threshold=200)
    out, ok, n = detect_cones(pcap, vcap, acfg)
    out = np.asarray(out)[np.asarray(ok)]
    got_xy = np.stack([out[:, 2] * np.cos(np.radians(out[:, 0])),
                       out[:, 2] * np.sin(np.radians(out[:, 0]))], axis=1)
    for cx, cy in cones:
        d = np.linalg.norm(got_xy - (cx, cy), axis=1)
        assert d.min() < 0.3, (cx, cy, got_xy)
