"""Wire-level interop against REAL libcluon.

Compiles a tiny C++ peer against the reference's vendored single-header
libcluon (read-only use of /root/reference, like the ODVD parser tests) and
exchanges envelopes with our OD4Session over UDP multicast — proving the
proto codec, envelope framing, and bus semantics are byte-compatible with
the actual OpenDLV middleware, not just with our own re-implementation.

Skipped when g++, the reference header, or multicast sockets are missing.
"""
import asyncio
import os
import shutil
import subprocess
import sys

import pytest

from tpuslam.io import messages as M
from tpuslam.io import proto

CLUON_HPP = "/root/reference/src/cluon-complete-build.hpp"
BUILD_DIR = "/tmp/tpuslam_cluon_interop"

PEER_SRC = r"""
#include <linux/sockios.h>
#include "cluon-complete-build.hpp"
#include <cstdlib>
#include <iostream>
int main(int argc, char **argv) {
    auto args = cluon::getCommandlineArguments(argc, argv);
    uint16_t cid = static_cast<uint16_t>(std::stoi(args["cid"]));
    std::string mode = args["mode"]; // "send" | "echo"
    cluon::OD4Session od4{cid};
    if (mode == "send") {
        for (int i = 0; i < 40; i++) {
            cluon::data::PlayerCommand pc;
            pc.command(3).seekTo(0.25f);
            od4.send(pc, cluon::time::now(), 42);
            std::this_thread::sleep_for(std::chrono::milliseconds(50));
        }
    } else { // echo: reply to PlayerCommand with PlayerStatus
        od4.dataTrigger(cluon::data::PlayerCommand::ID(),
                        [&od4](cluon::data::Envelope &&env) {
            auto pc = cluon::extractMessage<cluon::data::PlayerCommand>(
                std::move(env));
            cluon::data::PlayerStatus ps;
            ps.state(2)
              .numberOfEntries(static_cast<uint32_t>(pc.seekTo() * 100))
              .currentEntryForPlayback(7);
            od4.send(ps, cluon::time::now(), 99);
        });
        std::this_thread::sleep_for(std::chrono::seconds(15));
    }
    return 0;
}
"""


@pytest.fixture(scope="module")
def peer_bin():
    if not os.path.exists(CLUON_HPP):
        pytest.skip("reference libcluon header not available")
    if shutil.which("g++") is None:
        pytest.skip("g++ not available")
    os.makedirs(BUILD_DIR, exist_ok=True)
    src = os.path.join(BUILD_DIR, "peer.cpp")
    out = os.path.join(BUILD_DIR, "peer")
    stale = (not os.path.exists(out) or not os.path.exists(src)
             or open(src).read() != PEER_SRC)
    if stale:
        with open(src, "w") as f:
            f.write(PEER_SRC)
        r = subprocess.run(
            ["g++", "-std=c++14", "-I", os.path.dirname(CLUON_HPP), "-O0",
             "-o", out, src, "-lpthread"],
            capture_output=True, text=True, timeout=300)
        if r.returncode != 0:
            pytest.skip(f"libcluon peer failed to compile: {r.stderr[:500]}")
    return out


def test_python_to_real_cluon_and_back(peer_bin):
    """Our PlayerCommand is decoded by real cluon; its PlayerStatus reply is
    decoded by us (both directions across the real UDP multicast bus)."""
    from tpuslam.io.od4 import OD4Session

    proc = subprocess.Popen([peer_bin, "--cid=204", "--mode=echo"],
                            stdout=subprocess.DEVNULL,
                            stderr=subprocess.DEVNULL)
    try:
        async def run():
            s = OD4Session(cid=204)
            got = []
            s.data_trigger(M.PlayerStatus.ID, lambda env: got.append(env))
            try:
                await s.start()
            except OSError:
                pytest.skip("multicast sockets unavailable in sandbox")
            for _ in range(60):
                s.send(M.PlayerCommand(command=3, seekTo=0.5))
                await asyncio.sleep(0.1)
                if got:
                    break
            await s.stop()
            return got

        got = asyncio.run(run())
    finally:
        proc.kill()
        proc.wait()
    if not got:
        pytest.skip("multicast loopback not routed in this sandbox")
    env = got[0]
    assert env.senderStamp == 99
    ps = proto.decode(M.PlayerStatus, env.serializedData)
    # numberOfEntries = seekTo * 100: proves cluon decoded OUR float field
    assert ps == M.PlayerStatus(state=2, numberOfEntries=50,
                                currentEntryForPlayback=7)


def test_real_cluon_to_python(peer_bin):
    """Envelopes sent by real cluon's OD4Session::send are received and
    decoded by our session (sent/sample timestamps, senderStamp, payload)."""
    from tpuslam.io.od4 import OD4Session

    proc = subprocess.Popen([peer_bin, "--cid=205", "--mode=send"],
                            stdout=subprocess.DEVNULL,
                            stderr=subprocess.DEVNULL)
    try:
        async def run():
            s = OD4Session(cid=205)
            got = []
            s.data_trigger(M.PlayerCommand.ID, lambda env: got.append(env))
            try:
                await s.start()
            except OSError:
                pytest.skip("multicast sockets unavailable in sandbox")
            for _ in range(60):
                await asyncio.sleep(0.1)
                if len(got) >= 3:
                    break
            await s.stop()
            return got

        got = asyncio.run(run())
    finally:
        proc.kill()
        proc.wait()
    if not got:
        pytest.skip("multicast loopback not routed in this sandbox")
    env = got[0]
    assert env.senderStamp == 42
    assert env.sent.micros > 0 and env.sampleTimeStamp.micros > 0
    pc = proto.decode(M.PlayerCommand, env.serializedData)
    assert pc.command == 3 and abs(pc.seekTo - 0.25) < 1e-6


DRIVER_SRC = r"""
#include <linux/sockios.h>
#include "cluon-complete-build.hpp"
#include <fstream>
#include <iostream>
#include <sstream>
int main(int argc, char **argv) {
    auto args = cluon::getCommandlineArguments(argc, argv);
    uint16_t cid = static_cast<uint16_t>(std::stoi(args["cid"]));
    uint32_t outStamp = static_cast<uint32_t>(std::stoi(args["outstamp"]));
    std::ifstream specFile(args["odvd"]);
    std::string spec((std::istreambuf_iterator<char>(specFile)),
                     std::istreambuf_iterator<char>());
    uint32_t minOut = static_cast<uint32_t>(std::stoul(args["minout"]));
    int32_t tailSecs = std::stoi(args["tailsecs"]);
    cluon::EnvelopeConverter conv;
    if (conv.setMessageSpecification(spec) <= 0) { return 2; }
    // catch-all tap: service outputs (senderStamp==outStamp) -> JSON lines
    std::atomic<uint32_t> nOut{0};
    std::mutex outMutex;
    cluon::OD4Session od4{cid,
                          [&conv, &nOut, &outMutex, outStamp](cluon::data::Envelope &&env){
        if (env.senderStamp() == outStamp) {
            std::lock_guard<std::mutex> lck(outMutex);
            std::cout << conv.getJSONFromEnvelope(env) << std::endl;
            ++nOut;
        }
    }};
    // feed: lines "dataType|senderStamp|sampleUs|payloadJSON"
    std::ifstream in(args["in"]);
    std::string line;
    while (std::getline(in, line)) {
        auto p1 = line.find('|');
        auto p2 = line.find('|', p1 + 1);
        auto p3 = line.find('|', p2 + 1);
        int32_t dt = std::stoi(line.substr(0, p1));
        uint32_t stamp = static_cast<uint32_t>(
            std::stoul(line.substr(p1 + 1, p2 - p1 - 1)));
        int64_t us = std::stoll(line.substr(p2 + 1, p3 - p2 - 1));
        std::string payload = line.substr(p3 + 1);
        std::string framed =
            conv.getProtoEncodedEnvelopeFromJSONWithoutTimeStamps(
                payload, dt, stamp);
        if (framed.empty()) { return 3; }
        std::stringstream ss(framed);
        auto r = cluon::extractEnvelope(ss);
        if (!r.first) { return 4; }
        cluon::data::TimeStamp ts;
        ts.seconds(static_cast<int32_t>(us / 1000000))
          .microseconds(static_cast<int32_t>(us % 1000000));
        r.second.sampleTimeStamp(ts);
        r.second.sent(cluon::time::now());
        cluon::data::Envelope e = r.second;
        od4.send(std::move(e));
        std::this_thread::sleep_for(std::chrono::microseconds(300));
    }
    // stay on the bus until the service (slow first jit) has published
    // enough outputs, or the tail timeout expires
    for (int i = 0; i < tailSecs * 10; i++) {
        if (nOut >= minOut) {
            std::this_thread::sleep_for(std::chrono::seconds(1));
            break;
        }
        std::this_thread::sleep_for(std::chrono::milliseconds(100));
    }
    return 0;
}
"""


@pytest.fixture(scope="module")
def driver_bin():
    if not os.path.exists(CLUON_HPP):
        pytest.skip("reference libcluon header not available")
    if shutil.which("g++") is None:
        pytest.skip("g++ not available")
    os.makedirs(BUILD_DIR, exist_ok=True)
    src = os.path.join(BUILD_DIR, "driver.cpp")
    out = os.path.join(BUILD_DIR, "driver")
    stale = (not os.path.exists(out) or not os.path.exists(src)
             or open(src).read() != DRIVER_SRC)
    if stale:
        with open(src, "w") as f:
            f.write(DRIVER_SRC)
        r = subprocess.run(
            ["g++", "-std=c++14", "-I", os.path.dirname(CLUON_HPP), "-O0",
             "-o", out, src, "-lpthread"],
            capture_output=True, text=True, timeout=300)
        if r.returncode != 0:
            pytest.skip(f"libcluon driver failed to compile: {r.stderr[:500]}")
    return out


def test_full_system_through_real_cluon(driver_bin, tmp_path):
    """End-to-end: a REAL libcluon process feeds the whole skidpad lap
    (Geolocation + yaw + per-cone Direction/Distance/Type triples built by
    cluon's own EnvelopeConverter from the reference .odvd), our live
    SlamService consumes it off the real multicast bus, closes the loop, and
    its published pose/cone messages are decoded back to JSON by cluon."""
    import json

    import numpy as np

    from tpuslam.geometry import wgs84
    from tpuslam.io.od4 import OD4Session
    from tpuslam.runtime.config import SlamConfig
    from tpuslam.runtime.service import SlamService
    from tpuslam.sim import SimConfig, simulate, skidpad

    # gate at 400 ms: the sim's exactly-500-ms frame spacing would otherwise
    # tie against the reference's strict ">" keyframe compare and drop every
    # other frame (src/slam.cpp:290 never ties on real wall-clock)
    cfg = SlamConfig(cid=206, time_between_keyframes_ms=400.0)
    scen = simulate(skidpad(), SimConfig(laps=1.3, seed=0))
    ref = np.array(cfg.gps_reference)

    lines = []
    for t in range(len(scen.times)):
        us = int(scen.times[t] * 1e6)
        lat, lon = wgs84.from_cartesian(ref, scen.odom_poses[t][:2])
        lines.append(f"{1116}|{cfg.estimation_id}|{us}|" + json.dumps(
            {"latitude": float(lat), "longitude": float(lon),
             "altitude": 0.0, "heading": float(scen.odom_poses[t][2])}))
        lines.append(f"{1031}|{cfg.estimation_id}|{us}|" + json.dumps(
            {"angularVelocityX": 0.0, "angularVelocityY": 0.0,
             "angularVelocityZ": float(scen.yaw_rates[t])}))
        for i in range(int(scen.obs_valid[t].sum())):
            az, zen, dist, ct = (float(x) for x in scen.obs[t, i])
            lines.append(f"{1133}|{cfg.detect_cone_id}|{us}|" + json.dumps(
                {"objectId": i, "azimuthAngle": az, "zenithAngle": zen}))
            lines.append(f"{1134}|{cfg.detect_cone_id}|{us}|" + json.dumps(
                {"objectId": i, "distance": dist}))
            lines.append(f"{1131}|{cfg.detect_cone_id}|{us}|" + json.dumps(
                {"objectId": i, "type": int(ct)}))
    feed = tmp_path / "feed.txt"
    feed.write_text("\n".join(lines) + "\n")

    async def run():
        od4 = OD4Session(cid=cfg.cid)
        svc = SlamService(cfg, od4=od4)
        task = asyncio.create_task(svc.run_live())
        await asyncio.sleep(0.3)
        proc = await asyncio.create_subprocess_exec(
            driver_bin, f"--cid={cfg.cid}", f"--outstamp={cfg.sender_id}",
            "--odvd=/root/reference/src/opendlv-standard-message-set-v0.9.5.odvd",
            f"--in={feed}", "--minout=30", "--tailsecs=170",
            stdout=asyncio.subprocess.PIPE, stderr=asyncio.subprocess.DEVNULL)
        out, _ = await asyncio.wait_for(proc.communicate(), timeout=180)
        # the first keyframe jit-compiles (20-40 s on the TPU tunnel): the
        # feed lands long before the engine drains the ingest queue
        prev = -1
        for _ in range(240):
            now = svc.slam.keyframes_processed
            if now == prev and od4._queue.empty():
                break
            prev = now
            await asyncio.sleep(0.5)
        svc.slam.flush()
        task.cancel()
        try:
            await task
        except asyncio.CancelledError:
            pass
        return svc, proc.returncode, out.decode()

    try:
        svc, rc, out = asyncio.run(run())
    except OSError:
        pytest.skip("multicast sockets unavailable in sandbox")
    assert rc == 0, f"cluon driver exited {rc}"
    if not out.strip() and not svc.slam.keyframes_processed:
        pytest.skip("multicast loopback not routed in this sandbox")

    # the service consumed the lap off the real bus and closed the loop
    assert svc.slam.keyframes_processed > 10
    assert svc.slam.loop_closure_complete

    # cluon decoded our published outputs: optimized pose + upcoming cones
    # (getJSONFromEnvelope emits a newline inside each object, so decode by
    # brace matching rather than by line)
    objs, dec, pos = [], json.JSONDecoder(), 0
    blob = out.strip()
    while pos < len(blob):
        obj, end = dec.raw_decode(blob, pos)
        objs.append(obj)
        pos = end
        while pos < len(blob) and blob[pos] in " \r\n\t":
            pos += 1
    geo = [o for o in objs if "opendlv_logic_sensation_Geolocation" in o]
    dirs = [o for o in objs if "opendlv_logic_perception_ObjectDirection" in o]
    types = [o for o in objs if "opendlv_logic_perception_ObjectType" in o]
    assert geo, "no Geolocation decoded by real cluon"
    g = geo[-1]["opendlv_logic_sensation_Geolocation"]
    # published pose maps back near the reference origin (on-track scale)
    xy = wgs84.to_cartesian(ref, np.array([g["latitude"], g["longitude"]]))
    assert np.hypot(*xy) < 100.0
    assert dirs and types, "no cone packet decoded by real cluon"
