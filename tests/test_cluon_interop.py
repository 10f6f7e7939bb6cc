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
