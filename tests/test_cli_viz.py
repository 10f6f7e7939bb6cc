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
