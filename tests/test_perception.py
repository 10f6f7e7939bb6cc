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


def test_attention_cell_overflow_visible_and_benign():
    """ADVICE r3: the tuned cell_capacity=32 silently truncates cells with
    more points — make that visible (grid_cell_overflow counter) and show
    detections on a denser-than-tuning scene are unchanged vs K=64."""
    from tpuslam.perception.attention import grid_cell_overflow
    rng = np.random.default_rng(5)
    cones = np.array([[4.0, 1.0], [6.0, -2.0], [8.5, 2.5]])
    types = np.array([1, 2, 1])
    # dense scene: ~5x the points-per-cone of the tuning scene
    scfg = Vlp16SceneConfig(seed=5, points_per_cone=300)
    pts, inten = render_scene(cones, types, scfg)
    pcap, vcap, icap = _pad(pts, inten)
    base = dict(sensor_height=scfg.sensor_height,
                ground_layer_z=-scfg.sensor_height,
                inlier_found_threshold=300, clustering="grid",
                max_points=2000)
    a32 = AttentionConfig(**base, cell_capacity=32)
    a64 = AttentionConfig(**base, cell_capacity=64)
    # the counter sees the overflow on the ground-masked cloud
    above = pts[:, 2] > (-scfg.sensor_height + 0.05)
    xy = jnp.asarray(pts[above, :2], jnp.float32)
    ov32 = int(grid_cell_overflow(xy, jnp.ones(len(xy), bool), a32))
    assert ov32 > 0, "dense scene should overflow K=32 cells"
    assert int(grid_cell_overflow(xy, jnp.ones(len(xy), bool), a64)) < ov32
    # and the truncation is benign here: identical detections at K=64
    out32, ok32, n32 = detect_cones(pcap, vcap, a32, intensity=icap)
    out64, ok64, n64 = detect_cones(pcap, vcap, a64, intensity=icap)
    # capacity-equivalence is the claim under test (scene artifacts like
    # point-bridged merges affect both K equally)
    assert int(n32) == int(n64) >= 2, (int(n32), int(n64))
    np.testing.assert_allclose(np.asarray(out32)[np.asarray(ok32)][:, :3],
                               np.asarray(out64)[np.asarray(ok64)][:, :3],
                               atol=0.05)


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


def test_point_cloud_reading_roundtrip():
    """Raycast scene -> PointCloudReading -> decode: returns lie on the
    analytic geometry (ground plane + cone cylinders)."""
    from tpuslam.perception.vlp16 import decode_point_cloud_reading
    from tpuslam.sim.vlp16_sim import scene_to_point_cloud_reading
    cones = np.array([[5.0, 1.0], [7.0, -2.0]])
    scfg = Vlp16SceneConfig(seed=9, noise=0.0)
    msg = scene_to_point_cloud_reading(cones, scfg)
    cloud, _ = decode_point_cloud_reading(msg)
    assert len(cloud) > 1000
    h = scfg.sensor_height
    on_ground = np.abs(cloud[:, 2] + h) < 0.05
    d_cone = np.linalg.norm(cloud[:, None, :2] - cones[None], axis=-1).min(axis=1)
    on_cone = d_cone < 0.25
    frac = np.mean(on_ground | on_cone)
    assert frac > 0.98, frac
    assert on_cone.sum() >= 8  # both cones produce multiple returns


def test_service_integrated_lidar_frontend():
    """BASELINE config 4 end to end THROUGH THE SERVICE: PointCloudReading
    envelopes -> attention -> SLAM map."""
    import jax.numpy as jnp
    from tpuslam.backend.graph import GraphCapacity
    from tpuslam.geometry import wgs84
    from tpuslam.io import envelope as E
    from tpuslam.io import messages as M
    from tpuslam.perception import AttentionConfig
    from tpuslam.runtime.config import SlamConfig
    from tpuslam.runtime.service import SlamService
    from tpuslam.sim.vlp16_sim import scene_to_point_cloud_reading

    scfg = Vlp16SceneConfig(seed=11, points_per_cone=50)
    cones_global = np.array([[8.0, 1.5], [11.0, -1.5], [14.0, 1.5],
                             [17.0, -1.5], [20.0, 1.5]])
    cfg = SlamConfig(capacity=GraphCapacity(max_poses=32, max_landmarks=32,
                                            max_obs=512),
                     time_between_keyframes_ms=50.0)
    acfg = AttentionConfig(sensor_height=scfg.sensor_height,
                           ground_layer_z=-scfg.sensor_height,
                           inlier_found_threshold=300)
    svc = SlamService(cfg, attention_cfg=acfg, lidar_sender_id=42)
    ref = np.array(cfg.gps_reference)

    for t in range(5):
        us = int(t * 0.5e6) + 1000
        pose = np.array([2.0 * t, 0.0, 0.0])
        latlon = wgs84.from_cartesian(ref, pose[:2])
        svc.dispatch_envelope(E.pack_message(
            M.Geolocation(latitude=float(latlon[0]), longitude=float(latlon[1]),
                          heading=0.0),
            sample_us=us, sender_stamp=cfg.estimation_id))
        # raycast the scene from the LIDAR (1.5 m ahead of the CoG)
        lidar = pose[:2] + np.array([1.5, 0.0])
        local = cones_global - lidar
        vis = local[:, 0] > 1.0
        svc.dispatch_envelope(E.pack_message(
            scene_to_point_cloud_reading(local[vis], scfg),
            sample_us=us, sender_stamp=42))

    assert svc.metrics.counters["point_cloud_messages"] == 5
    n_lm = int(svc.slam.state.graph.n_landmarks)
    assert 3 <= n_lm <= len(cones_global) + 1, n_lm
    lm, _ = svc.slam.draw_cones()
    d = np.linalg.norm(lm[:, None, :] - cones_global[None], axis=-1).min(axis=1)
    assert np.median(d) < 0.4, (lm, d)


def test_grid_clustering_matches_dense():
    """The grid-hashed connected-components provider (full-sweep scale) must
    reproduce the dense NxN provider's detections exactly."""
    rng = np.random.default_rng(7)
    cones = rng.uniform([1.0, -3.5], [11.0, 3.5], (12, 2))
    types = rng.integers(1, 4, 12)
    scfg = Vlp16SceneConfig(seed=7, points_per_cone=35)
    pts, inten = render_scene(cones, types, scfg)
    pcap, vcap, icap = _pad(pts, inten)
    base = dict(sensor_height=scfg.sensor_height,
                ground_layer_z=-scfg.sensor_height,
                inlier_found_threshold=300)
    out_d, ok_d, n_d = detect_cones(pcap, vcap,
                                    AttentionConfig(clustering="dense", **base),
                                    intensity=icap)
    out_g, ok_g, n_g = detect_cones(pcap, vcap,
                                    AttentionConfig(clustering="grid", **base),
                                    intensity=icap)
    assert int(n_d) == int(n_g) > 0
    np.testing.assert_array_equal(np.asarray(ok_d), np.asarray(ok_g))
    np.testing.assert_allclose(np.asarray(out_d)[np.asarray(ok_d)],
                               np.asarray(out_g)[np.asarray(ok_g)],
                               rtol=0, atol=1e-5)


def test_full_sweep_grid_clustering():
    """A full 360-degree raycast VLP-16 sweep (true sensor point count, far
    beyond the dense provider's 3.4 GB adjacency wall) through the grid
    path: every ROI cone recovered. VERDICT round-1 missing #3."""
    from tpuslam.perception.vlp16 import decode_point_cloud_reading
    from tpuslam.sim.vlp16_sim import scene_to_point_cloud_reading

    cones = np.array([[3.0, 1.8], [5.0, -1.8], [7.0, 1.8], [9.0, -1.8],
                      [11.0, 1.8], [4.0, -3.0],
                      # distractors outside the ROI (behind / far lateral)
                      [-5.0, 0.0], [3.0, 7.0]])
    # surrounding wall at 30 m: every beam returns, like a real outdoor
    # venue — the rev carries its full 1800 x 16 = 28.8k returns
    scfg = Vlp16SceneConfig(seed=13, noise=0.005, surround_range=30.0)
    msg = scene_to_point_cloud_reading(cones, scfg)
    cloud, _ = decode_point_cloud_reading(msg)
    assert len(cloud) >= 28000, len(cloud)   # true sweep scale
    cap = 32768
    pts = np.zeros((cap, 3), np.float32)
    n = min(len(cloud), cap)
    pts[:n] = cloud[:n]
    valid = np.arange(cap) < n
    acfg = AttentionConfig(sensor_height=scfg.sensor_height,
                           ground_layer_z=-scfg.sensor_height,
                           inlier_found_threshold=1000, min_points=3)
    out, ok, n_cones = detect_cones(jnp.asarray(pts), jnp.asarray(valid), acfg)
    out = np.asarray(out)[np.asarray(ok)]
    got_xy = np.stack([out[:, 2] * np.cos(np.radians(out[:, 0])),
                       out[:, 2] * np.sin(np.radians(out[:, 0]))], axis=1)
    in_roi = cones[(np.abs(cones[:, 1]) <= 4.0) & (cones[:, 0] > 0.1)
                   & (cones[:, 0] <= 12.0)]
    assert len(got_xy) >= len(in_roi), (got_xy, in_roi)
    for cx, cy in in_roi:
        d = np.linalg.norm(got_xy - (cx, cy), axis=1)
        assert d.min() < 0.3, (cx, cy, got_xy)


def test_service_full_sweep_no_prefilter():
    """Service ingest of FULL sweeps (host_prefilter=False): the whole
    ~14k-return cloud goes to device; grid clustering + in-jit ROI masking
    produce the same SLAM-ready detections."""
    from tpuslam.backend.graph import GraphCapacity
    from tpuslam.geometry import wgs84
    from tpuslam.io import envelope as E
    from tpuslam.io import messages as M
    from tpuslam.runtime.config import SlamConfig
    from tpuslam.runtime.service import SlamService
    from tpuslam.sim.vlp16_sim import scene_to_point_cloud_reading

    scfg = Vlp16SceneConfig(seed=17, noise=0.005)
    cones_global = np.array([[8.0, 1.5], [11.0, -1.5], [14.0, 1.5],
                             [17.0, -1.5], [20.0, 1.5]])
    cfg = SlamConfig(capacity=GraphCapacity(max_poses=32, max_landmarks=32,
                                            max_obs=512),
                     time_between_keyframes_ms=50.0)
    acfg = AttentionConfig(sensor_height=scfg.sensor_height,
                           ground_layer_z=-scfg.sensor_height,
                           inlier_found_threshold=1000, min_points=3,
                           host_prefilter=False, point_capacity=32768)
    svc = SlamService(cfg, attention_cfg=acfg, lidar_sender_id=42)
    ref = np.array(cfg.gps_reference)

    for t in range(4):
        us = int(t * 0.5e6) + 1000
        pose = np.array([2.0 * t, 0.0, 0.0])
        latlon = wgs84.from_cartesian(ref, pose[:2])
        svc.dispatch_envelope(E.pack_message(
            M.Geolocation(latitude=float(latlon[0]), longitude=float(latlon[1]),
                          heading=0.0),
            sample_us=us, sender_stamp=cfg.estimation_id))
        lidar = pose[:2] + np.array([1.5, 0.0])
        svc.dispatch_envelope(E.pack_message(
            scene_to_point_cloud_reading(cones_global - lidar, scfg),
            sample_us=us, sender_stamp=42))

    assert svc.metrics.counters["point_cloud_messages"] == 4
    n_lm = int(svc.slam.state.graph.n_landmarks)
    assert 3 <= n_lm <= len(cones_global) + 1, n_lm
    lm, _ = svc.slam.draw_cones()
    d = np.linalg.norm(lm[:, None, :] - cones_global[None], axis=-1).min(axis=1)
    assert np.median(d) < 0.4, (lm, d)


def test_rec_replay_full_sweeps_into_slam(tmp_path):
    """BASELINE config 4, the full ops path: a .rec of raw PointCloudReading
    envelopes (TRUE sweep point counts) + Geolocation replayed through the
    service -> attention -> SLAM map. The reference needed three processes
    for this (cluon-replay -> attention microservice -> slam,
    reference usecase/docker-compose.yml); here it is one replay call."""
    from tpuslam.backend.graph import GraphCapacity
    from tpuslam.geometry import wgs84
    from tpuslam.io import messages as M
    from tpuslam.io.rec import RecWriter
    from tpuslam.runtime.config import SlamConfig
    from tpuslam.runtime.service import SlamService
    from tpuslam.sim.vlp16_sim import scene_to_point_cloud_reading

    scfg = Vlp16SceneConfig(seed=21, noise=0.005)
    cones_global = np.array([[8.0, 1.5], [11.0, -1.5], [14.0, 1.5],
                             [17.0, -1.5], [20.0, 1.5]])
    cfg = SlamConfig(capacity=GraphCapacity(max_poses=32, max_landmarks=32,
                                            max_obs=512),
                     time_between_keyframes_ms=50.0)
    ref = np.array(cfg.gps_reference)
    rec = tmp_path / "sweeps.rec"
    with RecWriter(str(rec)) as w:
        for t in range(4):
            us = int(t * 0.5e6) + 1000
            pose = np.array([2.0 * t, 0.0, 0.0])
            latlon = wgs84.from_cartesian(ref, pose[:2])
            w.write_message(M.Geolocation(latitude=float(latlon[0]),
                                          longitude=float(latlon[1]),
                                          heading=0.0),
                            sample_us=us, sender_stamp=cfg.estimation_id)
            lidar = pose[:2] + np.array([1.5, 0.0])
            w.write_message(scene_to_point_cloud_reading(cones_global - lidar,
                                                         scfg),
                            sample_us=us, sender_stamp=42)

    acfg = AttentionConfig(sensor_height=scfg.sensor_height,
                           ground_layer_z=-scfg.sensor_height,
                           inlier_found_threshold=1000, min_points=3,
                           host_prefilter=False, point_capacity=32768)
    svc = SlamService(cfg, attention_cfg=acfg, lidar_sender_id=42)
    svc.run_replay(str(rec))
    assert svc.metrics.counters["point_cloud_messages"] == 4
    lm, _ = svc.slam.draw_cones()
    assert 3 <= len(lm) <= len(cones_global) + 1, lm
    d = np.linalg.norm(lm[:, None, :] - cones_global[None], axis=-1).min(axis=1)
    assert np.median(d) < 0.4, (lm, d)


def test_calibration_xml_parses_vendored_file():
    """Parse the vendored boost-serialized VLP-16 calibration
    (tpuslam/perception/data/VLP-16.xml, regenerated from datasheet
    constants) and cross-check against the transcribed constants."""
    import numpy as np

    from tpuslam.perception.calib import (default_calibration_path,
                                          load_calibration)
    from tpuslam.perception.vlp16 import (DISTANCE_RESOLUTION_M,
                                          VLP16_ELEVATIONS_DEG)

    calib = load_calibration(default_calibration_path())
    assert abs(calib.dist_lsb_m - DISTANCE_RESOLUTION_M) < 1e-12  # 0.2 cm
    assert calib.n_lasers == 64          # boost DB carries 64 px records
    np.testing.assert_array_equal(calib.position_xyz, 0.0)
    # the first 16 lasers are the VLP-16 firing set -15..+15 in 2-deg steps
    v16 = calib.vert_correction_deg[:16]
    assert sorted(v16.tolist()) == list(range(-15, 16, 2))
    np.testing.assert_array_equal(calib.rot_correction_deg[:16], 0.0)
    np.testing.assert_array_equal(calib.dist_correction_m[:16], 0.0)
    elevs = calib.elevations_for_channels(16)
    np.testing.assert_array_equal(elevs, VLP16_ELEVATIONS_DEG[
        np.argsort(np.arange(16))])  # firing order == laser-id order here


def test_vendored_calibration_matches_reference_copy():
    """Field-for-field parity between the regenerated vendored calibration
    and the reference's shipped usecase/VLP-16.xml (when present)."""
    import os

    import numpy as np

    from tpuslam.perception.calib import (default_calibration_path,
                                          load_calibration,
                                          nominal_vlp16_db_xml)

    ref_path = "/root/reference/usecase/VLP-16.xml"
    if not os.path.exists(ref_path):
        pytest.skip("reference checkout not present")
    # the shipped file must be exactly what the emitter produces
    assert open(default_calibration_path()).read() == nominal_vlp16_db_xml()
    c = load_calibration(default_calibration_path())
    r = load_calibration(ref_path)
    assert c.dist_lsb_m == r.dist_lsb_m
    for f in ("position_xyz", "orientation_rpy", "laser_id",
              "rot_correction_deg", "vert_correction_deg",
              "dist_correction_m", "vert_offset_m", "horiz_offset_m",
              "min_intensity", "max_intensity"):
        np.testing.assert_array_equal(getattr(c, f), getattr(r, f),
                                      err_msg=f)


def test_decode_point_cloud_reading_with_calibration():
    """Decoding with the real calibration equals the constant path when the
    calibration matches the transcribed defaults."""
    import numpy as np

    from tpuslam.io import messages as M
    from tpuslam.perception.calib import (default_calibration_path,
                                          load_calibration)
    from tpuslam.perception.vlp16 import decode_point_cloud_reading

    calib = load_calibration(default_calibration_path())
    counts = (np.arange(32, dtype=">u2") * 100 + 500)
    msg = M.PointCloudReading(startAzimuth=0.0, endAzimuth=10.0,
                              entriesPerAzimuth=16,
                              distances=counts.tobytes())
    pts_const, _ = decode_point_cloud_reading(msg)
    pts_calib, _ = decode_point_cloud_reading(msg, calib=calib)
    # same vertical angle set; rows may permute if firing order differed,
    # but this calibration lists lasers in firing order -> identical
    np.testing.assert_allclose(pts_const, pts_calib, atol=1e-9)


@pytest.mark.parametrize("provider", ["dense", "grid"])
def test_long_wall_rejected_at_default_label_iterations(provider):
    """A long barrier (chain diameter ~30 cells) must stay ONE oversized
    component — the label-iteration default must converge on worst-case
    chains, not just cone-sized blobs (regression for the r3 iteration-count
    reduction; pointer jumping carries the reach in both providers)."""
    rng = np.random.default_rng(1)
    wall_x = rng.uniform(0.5, 11.5, 900)
    wall = np.stack([wall_x,
                     np.full_like(wall_x, 2.0) + rng.normal(0, 0.03, 900),
                     rng.uniform(0, 0.4, 900)], axis=1)
    ground = np.stack([rng.uniform(0.5, 11, 1500),
                       rng.uniform(-3.5, 3.5, 1500),
                       rng.normal(0, 0.01, 1500)], axis=1)
    pts = np.vstack([ground, wall])
    pts[:, 2] -= 0.9
    cap = 8192
    p = np.zeros((cap, 3), np.float32)
    p[:len(pts)] = pts
    v = np.arange(cap) < len(pts)
    acfg = AttentionConfig(sensor_height=0.9, ground_layer_z=-0.9,
                           inlier_found_threshold=300, min_points=3,
                           clustering=provider)
    _out, _ok, n = detect_cones(jnp.asarray(p), jnp.asarray(v), acfg)
    assert int(n) == 0
