"""MsgPack/LCM codecs, ODVD emitter, TCP transport, shared memory —
the remaining libcluon stack components from SURVEY.md §2.2."""
import asyncio
import struct
import subprocess
import sys
import textwrap

import numpy as np
import pytest

from tpuslam.io import codecs
from tpuslam.io import messages as M
from tpuslam.io.odvd import message_to_odvd, parse_odvd
from tpuslam.io.shm import SharedMemoryArea
from tpuslam.io.tcp import TCPConnection, TCPServer

# ---------------------------------------------------------------------------
# MsgPack
# ---------------------------------------------------------------------------


def test_msgpack_roundtrip_all_messages():
    msgs = [
        M.Geolocation(latitude=57.70716, longitude=11.93782, altitude=12.5,
                      heading=1.25),
        M.ObjectDirection(objectId=7, azimuthAngle=-32.5, zenithAngle=1.5),
        M.ObjectDistance(objectId=300, distance=12.25),
        M.ObjectType(objectId=70000, type=2),
        M.AngularVelocityReading(angularVelocityZ=-0.42),
        M.GeodeticWgs84Reading(latitude=-33.5, longitude=151.2),
        M.TimeStamp(seconds=-5, microseconds=123456),
    ]
    for m in msgs:
        back = codecs.from_msgpack(type(m), codecs.to_msgpack(m))
        for _fid, kind, name, _ in m.FIELDS:
            a, b = getattr(m, name), getattr(back, name)
            if kind == M.FLOAT:
                assert abs(a - np.float32(b)) < 1e-5, (name, a, b)
            elif kind == M.DOUBLE:
                assert a == b
            else:
                assert a == b, (name, a, b)


def test_msgpack_wire_bytes_match_reference_encoder():
    """Byte-level check against the cluon ToMsgPackVisitor layout
    (reference src/cluon-complete-build.hpp:12505-12700): fixmap header,
    fixstr keys, smallest-width values, float32 as 0xca big-endian."""
    m = M.ObjectDistance(objectId=3, distance=12.25)
    buf = codecs.to_msgpack(m)
    expect = bytearray()
    expect.append(0x80 | 2)                      # fixmap, 2 pairs
    expect.append(0xA0 | 8)
    expect += b"objectId"
    expect.append(3)                             # positive fixint
    expect.append(0xA0 | 8)
    expect += b"distance"
    expect.append(0xCA)                          # float32
    expect += struct.pack(">f", 12.25)
    assert buf == bytes(expect)


def test_msgpack_width_promotion():
    """uint crosses 0x7f/0xff/0xffff/0xffffffff exactly like encodeUint
    (reference :12549-12578); ints like encodeInt (:12579-12608)."""
    for v, tag in [(0x7F, None), (0x80, 0xCC), (0x100, 0xCD),
                   (0x10000, 0xCE), (0x100000000, 0xCF)]:
        m = M.ObjectType(objectId=v, type=0)
        buf = codecs.to_msgpack(m)
        body = buf[1 + 1 + len("objectId"):]
        if tag is None:
            assert body[0] == v
        else:
            assert body[0] == tag
        assert codecs.from_msgpack(M.ObjectType, buf).objectId == v
    for v in (-1, -31, -32, -129, -(1 << 16), -(1 << 40)):
        m = M.TimeStamp(seconds=v)
        assert codecs.from_msgpack(M.TimeStamp, codecs.to_msgpack(m)).seconds == v


def test_msgpack_generic_dict_and_nested():
    env = M.Envelope(dataType=1116, serializedData=b"\x01\x02",
                     sent=M.TimeStamp(seconds=1, microseconds=2),
                     senderStamp=114)
    d = codecs.msgpack_to_dict(codecs.to_msgpack(env))
    assert d["dataType"] == 1116
    assert d["sent"] == {"seconds": 1, "microseconds": 2}
    back = codecs.from_msgpack(M.Envelope, codecs.to_msgpack(env))
    assert back.sent.seconds == 1 and back.senderStamp == 114
    assert back.serializedData == b"\x01\x02"


# ---------------------------------------------------------------------------
# LCM
# ---------------------------------------------------------------------------


def test_lcm_roundtrip_with_hash():
    msgs = [
        M.Geolocation(latitude=57.70716, longitude=11.93782, altitude=12.5,
                      heading=1.25),
        M.ObjectDirection(objectId=7, azimuthAngle=-32.5, zenithAngle=1.5),
        M.TimeStamp(seconds=123, microseconds=-456),
    ]
    for m in msgs:
        buf = codecs.to_lcm(m)
        assert len(buf) >= 8
        back = codecs.from_lcm(type(m), buf)
        for _fid, kind, name, _ in m.FIELDS:
            a, b = getattr(m, name), getattr(back, name)
            if kind == M.FLOAT:
                assert abs(a - np.float32(b)) < 1e-5
            else:
                assert a == b, (name, a, b)


def test_lcm_wire_layout():
    """Big-endian declaration-order fields after the 8-byte hash — the
    ToLCMVisitor layout (reference :12195-12327)."""
    m = M.ObjectType(objectId=5, type=2)   # two uint32 -> two BE int32
    buf = codecs.to_lcm(m)
    assert buf[8:] == struct.pack(">II", 5, 2)
    nohash = codecs.to_lcm(m, with_hash=False)
    assert nohash == buf[8:]


def test_lcm_hash_detects_wrong_type():
    buf = codecs.to_lcm(M.ObjectType(objectId=5, type=2))
    with pytest.raises(ValueError, match="hash mismatch"):
        codecs.from_lcm(M.ObjectDistance, buf)


def test_lcm_hash_reference_recurrence():
    """lcm_hash implements h' = ((h<<8) ^ (h>>55)) + c with int64 wrap
    (reference :12341-12343) and the zigzag fold (:12331-12339); check a
    hand-stepped value for a 1-field message."""
    h = 0x12345678

    def step(h, c):
        h = ((h << 8) ^ (h >> 55)) + c
        h &= (1 << 64) - 1
        return h - (1 << 64) if h >= (1 << 63) else h

    # field: name "northHeading", type "float", dimension terminator 0
    for s in ("northHeading", "float"):
        h = step(h, min(len(s), 255))
        for ch in s:
            h = step(h, ord(ch))
    h = step(h, 0)
    want = (h << 1) + ((h >> 63) & 1)
    want &= (1 << 64) - 1
    want = want - (1 << 64) if want >= (1 << 63) else want
    assert codecs.lcm_hash(M.GeodeticHeadingReading) == want


def test_lcm_string_nul_terminated():
    env = M.Envelope(dataType=1, serializedData=b"ab")
    buf = codecs.to_lcm(env, with_hash=False)
    # dataType int32 BE, then int32 length+1, payload, NUL
    assert buf[:4] == struct.pack(">i", 1)
    assert buf[4:8] == struct.pack(">i", 3)
    assert buf[8:11] == b"ab\0"
    back = codecs.from_lcm(M.Envelope, buf, with_hash=False)
    assert back.serializedData == b"ab"
    assert back.sent.seconds == 0


# ---------------------------------------------------------------------------
# ODVD emitter
# ---------------------------------------------------------------------------


def test_odvd_emitter_roundtrips_through_parser():
    for cls in (M.Geolocation, M.ObjectDirection, M.ObjectDistance,
                M.ObjectType, M.GeodeticWgs84Reading,
                M.AngularVelocityReading, M.GeodeticHeadingReading):
        text = message_to_odvd(cls)
        specs = parse_odvd(text)
        assert len(specs) == 1
        s = specs[0]
        assert s.ident == cls.ID
        assert s.name == cls.LONG_NAME
        assert [(fid, kind, name) for fid, kind, name, _ in s.fields] == \
               [(fid, kind, name) for fid, kind, name, _ in cls.FIELDS]


def test_odvd_emitter_declared_types_and_nested():
    text = message_to_odvd(M.Geolocation)
    assert "double latitude [ default = 0.0, id = 1 ];" in text
    assert "float heading [ default = 0.0, id = 4 ];" in text
    assert text.startswith("message opendlv.logic.sensation.Geolocation [ id = 1116 ] {")
    # nested: Envelope embeds TimeStamp as forward declaration first
    env_text = message_to_odvd(M.Envelope)
    assert env_text.index("message cluon.data.TimeStamp") < \
        env_text.index("message cluon.data.Envelope")
    assert "cluon.data.TimeStamp sent [ id = 3 ];" in env_text


# ---------------------------------------------------------------------------
# TCP
# ---------------------------------------------------------------------------


def test_tcp_loopback_and_connection_lost():
    async def run():
        got_server = []
        got_client = []
        lost = asyncio.Event()
        conns = []

        def on_conn(peer, conn):
            conn.on_data = lambda b, ts: got_server.append(b)
            conns.append(conn)

        server = TCPServer(on_conn)
        await server.start()
        client = TCPConnection(
            on_data=lambda b, ts: got_client.append(b),
            on_connection_lost=lost.set)
        await client.connect("127.0.0.1", server.port)
        assert client.send(b"hello") == 5
        await client.drain()
        for _ in range(100):
            if got_server:
                break
            await asyncio.sleep(0.01)
        assert b"".join(got_server) == b"hello"
        # server -> client direction
        conns[0].send(b"world")
        await conns[0].drain()
        for _ in range(100):
            if got_client:
                break
            await asyncio.sleep(0.01)
        assert b"".join(got_client) == b"world"
        # dropping the server side fires the client's connection-lost delegate
        await server.stop()
        await asyncio.wait_for(lost.wait(), 5)
        assert client.send(b"x") == -1 or not client.is_running
        await client.stop()

    asyncio.run(run())


# ---------------------------------------------------------------------------
# SharedMemory
# ---------------------------------------------------------------------------


def test_shared_memory_same_process():
    with SharedMemoryArea("/tpuslam-test-a", size=64) as shm:
        assert shm.valid() and shm.size == 64
        assert shm.name == "/tpuslam-test-a"
        shm.lock()
        shm.data[:5] = b"hello"
        shm.unlock()
        with SharedMemoryArea("/tpuslam-test-a") as reader:  # attach
            assert reader.valid() and reader.size == 64
            assert bytes(reader.data[:5]) == b"hello"
        assert not shm.wait(timeout=0.05)  # no notifier -> times out


def test_shared_memory_cross_process_notify():
    """Producer subprocess writes then notifies; we wait and read — the
    point-cloud handoff pattern of the sibling services
    (reference usecase/configuration:103-110)."""
    with SharedMemoryArea("/tpuslam-test-b", size=32) as shm:
        code = textwrap.dedent("""
            import time
            from tpuslam.io.shm import SharedMemoryArea
            shm = SharedMemoryArea("/tpuslam-test-b")   # attach
            assert shm.valid()
            shm.lock(); shm.data[:4] = b"PING"; shm.unlock()
            shm.notify_all()
            shm.close()
        """)
        proc = subprocess.Popen([sys.executable, "-c", code])
        try:
            assert shm.wait(timeout=20.0), "notify never arrived"
            assert bytes(shm.data[:4]) == b"PING"
        finally:
            assert proc.wait(timeout=20) == 0


# ---------------------------------------------------------------------------
# JSON codec (To/FromJSONVisitor + EnvelopeConverter both directions)
# ---------------------------------------------------------------------------


def test_json_message_roundtrip():
    from tpuslam.io.exporters import message_from_json, message_to_json
    m = M.Geolocation(latitude=57.7, longitude=11.9, altitude=3.0, heading=0.5)
    back = message_from_json(M.Geolocation, message_to_json(m))
    assert back == m
    env = M.Envelope(dataType=1116, serializedData=b"\x01\x02",
                     sent=M.TimeStamp(seconds=4, microseconds=5))
    back_env = message_from_json(M.Envelope, message_to_json(env))
    assert back_env.serializedData == b"\x01\x02"
    assert back_env.sent.seconds == 4
    # unknown keys ignored, missing keep defaults
    partial = message_from_json(M.ObjectType, '{"type": 2, "bogus": 1}')
    assert partial.type == 2 and partial.objectId == 0


def test_envelope_converter_roundtrip():
    from tpuslam.io import envelope as E
    from tpuslam.io.exporters import envelope_from_dict, envelope_to_dict
    env = E.pack_message(M.ObjectDistance(objectId=4, distance=9.5),
                         sample_us=123456, sender_stamp=118)
    back = envelope_from_dict(envelope_to_dict(env))
    assert back.dataType == env.dataType
    assert back.senderStamp == 118
    assert back.sampleTimeStamp.micros == 123456
    m = E.unpack_message(back)
    assert m.objectId == 4 and abs(m.distance - 9.5) < 1e-6


def test_lcm_to_generic_via_runtime_spec():
    """LCMToGenericMessage equivalent: decode LCM bytes against a spec
    the vendored standard message set — hash verified, values
    land in a dict-backed GenericMessage."""
    from tpuslam.io.codecs import lcm_to_generic, to_lcm
    from tpuslam.io.odvd import parse_odvd

    from tpuslam.io import standard_message_set as SMS
    specs = {s.name: s for s in SMS.to_specs()}
    spec = specs["opendlv.logic.sensation.Geolocation"]
    assert spec.odvd_types["latitude"] == "double"

    buf = to_lcm(M.Geolocation(latitude=57.7, longitude=11.9,
                               altitude=2.0, heading=0.25))
    g = lcm_to_generic(spec, buf)
    assert g.dataType == 1116
    assert abs(g.values["latitude"] - 57.7) < 1e-12
    assert abs(g.values["heading"] - np.float32(0.25)) < 1e-6


def test_tcp_delegate_time_send():
    """A server delegate must be able to send on the brand-new connection
    (cluon hands over a fully usable connection; code-review finding)."""
    async def run():
        got = []

        def on_conn(peer, conn):
            assert conn.is_running
            assert conn.send(b"greet") == 5

        server = TCPServer(on_conn)
        await server.start()
        client = TCPConnection(on_data=lambda b, ts: got.append(b))
        await client.connect("127.0.0.1", server.port)
        for _ in range(100):
            if got:
                break
            await asyncio.sleep(0.01)
        await server.stop()
        await client.stop()
        return got

    assert b"".join(asyncio.run(run())) == b"greet"


def test_shm_notify_all_under_lock_keeps_lock():
    """notify_all inside a lock()ed section must not release the caller's
    exclusive hold (flock is per-fd; code-review finding)."""
    with SharedMemoryArea("/tpuslam-test-c", size=16) as shm:
        shm.lock()
        shm.notify_all()          # nested lock/unlock inside
        assert shm._lock_depth == 1   # outer hold survives
        shm.data[:2] = b"ok"
        shm.unlock()
        assert shm._lock_depth == 0
