"""CLI + viz smoke tests (subprocess-free: call main() directly)."""
import json
import os

import numpy as np
import pytest

from tpuslam.cli.main import main


def test_cli_sim_and_viz(tmp_path, capsys):
    png = str(tmp_path / "map.png")
    rec = str(tmp_path / "lap.rec")
    rc = main(["sim", "skidpad", "--laps", "1.3", "--png", png,
               "--rec-out", rec])
    assert rc == 0
    out = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert out["loop_closed"] is True
    assert out["frames"] > 10
    assert os.path.getsize(png) > 10_000
    assert os.path.getsize(rec) > 1_000

    # replay the rec produced above, with checkpoint + png
    ck = str(tmp_path / "s.npz")
    rc = main(["replay", rec, "--timeBetweenKeyframes", "100",
               "--checkpoint", ck, "--png", str(tmp_path / "replay.png")])
    assert rc == 0
    snap = json.loads(capsys.readouterr().out)
    assert snap["gauges"]["landmarks"] > 20
    assert snap["gauges"]["loop_closed"] is True

    # viz from checkpoint
    rc = main(["viz", ck, "--out", str(tmp_path / "ck.png")])
    assert rc == 0
    assert os.path.getsize(str(tmp_path / "ck.png")) > 10_000


def test_cli_export(tmp_path, capsys):
    rec = str(tmp_path / "e.rec")
    main(["sim", "skidpad", "--laps", "0.2", "--rec-out", rec])
    capsys.readouterr()
    out = str(tmp_path / "o.jsonl")
    rc = main(["export", rec, "--format", "jsonl", "--type", "1134",
               "--out", out])
    assert rc == 0
    lines = open(out).read().strip().splitlines()
    assert lines and all(json.loads(l)["message"] == "ObjectDistance"
                         for l in lines)
    out2 = str(tmp_path / "o.csv")
    rc = main(["export", rec, "--format", "csv", "--type", "1116",
               "--out", out2])
    assert rc == 0
    body = open(out2).read().splitlines()
    assert body[0].startswith("sampleTimeStamp_us;senderStamp;latitude")
    assert len(body) > 2


def test_cli_sim_improved_mode(capsys):
    """--improved (SlamConfig.improved from the CLI) runs and beats the raw
    odometry trajectory."""
    rc = main(["sim", "trackdrive", "--laps", "1.3", "--improved"])
    assert rc == 0
    out = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert out["loop_closed"] is True
    assert out["ate_published_m"] < out["ate_odometry_m"]


def test_cli_record_roundtrips_bus(tmp_path):
    """slamctl record (the reference session's logger service): envelopes
    published on the bus land in a Player-compatible .rec file."""
    import asyncio
    import threading
    import time

    from tpuslam.io import envelope as E
    from tpuslam.io import messages as M
    from tpuslam.io.od4 import OD4Session
    from tpuslam.io.rec import read_rec

    out = str(tmp_path / "bus.rec")
    t = threading.Thread(
        target=main, args=(["record", out, "--cid", "198",
                            "--duration", "2.5"],), daemon=True)
    t.start()

    async def publish():
        tx = OD4Session(cid=198)
        try:
            await tx.start()
        except OSError:
            return False
        for i in range(12):
            tx.send(M.ObjectType(objectId=i, type=2), sample_us=1000 + i,
                    sender_stamp=118)
            await asyncio.sleep(0.1)
        await tx.stop()
        return True

    time.sleep(0.6)  # let the recorder join the group first
    sent = asyncio.run(publish())
    t.join(timeout=10)
    assert not t.is_alive()
    if not sent:
        pytest.skip("multicast sockets unavailable in sandbox")
    envs = [e for e in read_rec(out) if e.dataType == M.ObjectType.ID]
    if not envs:
        pytest.skip("multicast loopback not routed in this sandbox")
    ids = sorted(E.unpack_message(e).objectId for e in envs)
    assert ids == sorted(set(ids))  # no duplicates
    assert all(E.unpack_message(e).type == 2 for e in envs)


def test_live_viewer_renders_and_follows(tmp_path):
    """LiveViewer — the reference viewer-thread equivalent
    (viewerbuild/src/viewer.cpp:15-60): renders the current state to a PNG
    repeatedly as the state evolves."""
    import os
    import time

    from tpuslam.core.slam import Slam
    from tpuslam.runtime.config import SlamConfig
    from tpuslam.sim import SimConfig, simulate, skidpad
    from tpuslam.viz import LiveViewer

    scen = simulate(skidpad(), SimConfig(laps=1.2, seed=0))
    slam = Slam(SlamConfig())
    png = str(tmp_path / "live.png")

    viewer = LiveViewer(lambda: slam.state, png_path=png, interval_s=0.05)
    # direct render before any frames (valid empty state)
    assert viewer.render_once()
    assert os.path.exists(png)
    first_size = os.path.getsize(png)

    with viewer:
        slam.run_scenario(scen)
        deadline = time.time() + 20
        while viewer.frames_rendered < 3 and time.time() < deadline:
            time.sleep(0.05)
    assert viewer.frames_rendered >= 3
    assert os.path.getsize(png) != first_size  # map got drawn


def test_cli_replay_with_live_viewer(tmp_path):
    """slamctl replay --viz-png drives the render thread end to end."""
    import os

    from tpuslam.cli.main import main as cli_main
    from tpuslam.runtime.config import SlamConfig
    from tpuslam.runtime.service import scenario_to_rec
    from tpuslam.sim import SimConfig, simulate, skidpad

    rec = str(tmp_path / "in.rec")
    png = str(tmp_path / "live.png")
    scen = simulate(skidpad(), SimConfig(laps=1.2, seed=0))
    scenario_to_rec(scen, rec, SlamConfig())
    rc = cli_main(["replay", rec, "--viz-png", png, "--viz-interval", "0.05"])
    assert rc == 0
    assert os.path.exists(png)


def test_cli_sim_blocked_pipeline_matches_live(tmp_path, capsys):
    """`slamctl sim --pipeline blocked` must report the same trajectory
    metrics as the live per-frame engine."""
    import json
    from tpuslam.cli.main import main as cli_main

    outs = {}
    for pipeline in ("live", "blocked"):
        rc = cli_main(["--platform", "cpu", "sim", "skidpad",
                       "--pipeline", pipeline])
        assert rc == 0
        outs[pipeline] = json.loads(
            capsys.readouterr().out.strip().splitlines()[-1])
    a, b = outs["live"], outs["blocked"]
    assert a["ate_published_m"] == b["ate_published_m"]
    assert a["loop_closed"] == b["loop_closed"]
    assert a["landmarks"] == b["landmarks"]


def test_cli_replay_attention_od_config(tmp_path, capsys):
    """slamctl replay --attention --od-config: raw VLP-16 point clouds from a
    .rec run through the integrated cone detector configured by the
    reference's OpenDaVINCI configuration format."""
    import numpy as np

    from tpuslam.geometry import wgs84
    from tpuslam.io import messages as M
    from tpuslam.io.rec import RecWriter
    from tpuslam.runtime.config import SlamConfig
    from tpuslam.sim.vlp16_sim import Vlp16SceneConfig, scene_to_point_cloud_reading

    scfg = Vlp16SceneConfig(seed=11, points_per_cone=50)
    cones_global = np.array([[8.0, 1.5], [11.0, -1.5], [14.0, 1.5],
                             [17.0, -1.5], [20.0, 1.5]])
    base = SlamConfig()
    ref = np.array(base.gps_reference)
    rec = str(tmp_path / "vlp.rec")
    with RecWriter(rec) as w:
        for t in range(5):
            us = int(t * 0.5e6) + 1000
            pose = np.array([2.0 * t, 0.0, 0.0])
            latlon = wgs84.from_cartesian(ref, pose[:2])
            w.write_message(
                M.Geolocation(latitude=float(latlon[0]),
                              longitude=float(latlon[1]), heading=0.0),
                sample_us=us, sender_stamp=base.estimation_id)
            lidar = pose[:2] + np.array([1.5, 0.0])
            local = cones_global - lidar
            w.write_message(scene_to_point_cloud_reading(
                local[local[:, 0] > 1.0], scfg), sample_us=us,
                sender_stamp=116)

    # attention params via the OpenDaVINCI configuration layer; the shipped
    # inlierFoundTreshold=80 works against this synthetic density, and
    # senderStamp=116 matches the reference usecase
    odconf = tmp_path / "configuration"
    odconf.write_text(
        "logic-cfsd18-sensation-attention.inlierFoundTreshold = 300\n"
        "logic-cfsd18-sensation-attention.numberOfIterations = 10\n"
        "logic-cfsd18-sensation-attention.senderStamp = 116 # lidar\n")

    rc = main(["replay", rec, "--attention", "--od-config", str(odconf),
               "--timeBetweenKeyframes", "50"])
    assert rc == 0
    out = json.loads(capsys.readouterr().out)
    assert out["counters"]["point_cloud_messages"] == 5
    assert 3 <= out["gauges"]["landmarks"] <= len(cones_global) + 1


def test_live_viewer_runtime_toggles(tmp_path):
    """The four layer toggles are evaluated per rendered frame (reference
    viewer.cpp:43-56): flipping them at runtime changes the next render,
    and the window-mode key handler flips them too."""
    import os

    from tpuslam.core.slam import Slam
    from tpuslam.runtime.config import SlamConfig
    from tpuslam.sim import SimConfig, simulate, skidpad
    from tpuslam.viz.live import LiveViewer

    scen = simulate(skidpad(), SimConfig(laps=1.1, seed=2))
    slam = Slam(SlamConfig())
    slam.run_scenario(scen)
    png = str(tmp_path / "t.png")
    viewer = LiveViewer(lambda: slam.state, png_path=png,
                        interval_s=10.0)
    assert viewer.render_once()
    full = os.path.getsize(png)
    viewer.set_toggles(show_cones=False, show_poses=False,
                       show_current_pose=False, show_graph=False)
    assert viewer.render_once()
    empty = os.path.getsize(png)
    assert empty != full  # layers actually dropped out of the render

    class _Ev:
        key = "c"
    viewer._on_key(_Ev())
    assert viewer.show_cones is True   # toggled back on
    _Ev.key = "g"
    viewer._on_key(_Ev())
    assert viewer.show_graph is True   # toggled back on
    viewer.stop()


def test_live_viewer_stop_renders_final_frame(tmp_path):
    """stop() flushes a final frame so short runs still leave the last
    state on disk (the flake fixed here: replay finishing inside one render
    interval left no PNG)."""
    import os

    from tpuslam.core.slam import Slam
    from tpuslam.runtime.config import SlamConfig
    from tpuslam.sim import SimConfig, simulate, skidpad
    from tpuslam.viz.live import LiveViewer

    scen = simulate(skidpad(), SimConfig(laps=1.1, seed=2))
    slam = Slam(SlamConfig())
    slam.run_scenario(scen)
    png = str(tmp_path / "final.png")
    viewer = LiveViewer(lambda: slam.state, png_path=png,
                        interval_s=3600.0)   # never fires on its own
    viewer.start()
    viewer.stop()
    assert os.path.exists(png)


def test_cli_fuse_with_info_weights(tmp_path):
    """`slamctl fuse` end to end: mahalanobis sessions fuse with the
    information-weighted merge (lm_info wired through the CLI), --no-align
    for same-frame sessions, checkpoint out."""
    import json

    from tpuslam.cli.main import main as cli_main

    out = str(tmp_path / "fused.npz")
    import contextlib
    import io
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        rc = cli_main(["--platform", "cpu", "fuse", "--sessions", "2",
                       "--laps", "1.1", "--improved", "--association",
                       "mahalanobis", "--no-align", "--out", out])
    assert rc in (0, None)
    res = json.loads(buf.getvalue().strip().splitlines()[-1])
    assert res["sessions"] == 2
    assert res["cross_session_merges"] > 0
    # fused map collapses toward one session's landmark count and sits
    # within centimeters of the track
    assert res["fused_landmarks"] < sum(res["landmarks_per_session"]) * 0.6
    assert res["map_error_m"] < 0.1
    import os
    assert os.path.exists(out)
