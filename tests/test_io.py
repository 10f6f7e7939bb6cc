"""IO stack tests: proto codec, envelope framing, .rec replay, ODVD parser,
native C++ codec equivalence, and OD4 multicast loopback."""
import asyncio
import io as pyio
import os
import struct

import numpy as np
import pytest

from tpuslam.io import envelope as E
from tpuslam.io import messages as M
from tpuslam.io import proto
from tpuslam.io.odvd import load_standard_message_set, parse_odvd
from tpuslam.io.rec import Player, RecWriter, read_rec

# the vendored spec (shipped in the package) is the suite's schema source;
# the reference checkout is only needed for the cross-check parity test
from tpuslam.io import standard_message_set as SMS  # noqa: E402

ODVD = os.path.join(os.path.dirname(SMS.__file__),
                    "opendlv_standard_message_set.odvd")
REF_ODVD = "/root/reference/src/opendlv-standard-message-set-v0.9.5.odvd"


def test_vendored_standard_set():
    """The shipped table covers the full v0.9.5 set, builds codable classes,
    and its emitted .odvd round-trips through the parser."""
    assert len(SMS.STANDARD_MESSAGES) == 62
    classes = SMS.build_classes(register=False)
    assert len(classes) == 62
    # every hand-written opendlv.* spec is field-identical to the table
    table = {n: (i, f) for n, i, f in SMS.STANDARD_MESSAGES}
    checked = 0
    for cls in M.MESSAGE_REGISTRY.values():
        ln = getattr(cls, "LONG_NAME", "")
        if ln in table:
            ident, fields = table[ln]
            assert ident == cls.ID
            assert [(f[2], f[0]) for f in cls.FIELDS] == \
                [(fn, fi) for fn, fi, ft in fields], ln
            checked += 1
    assert checked >= 8
    # shipped .odvd artifact parses to the same specs as the emitter text
    text = SMS.standard_odvd_text()
    specs = parse_odvd(text)
    file_specs = parse_odvd(open(ODVD).read())
    key = lambda ss: [(s.name, s.ident, s.fields) for s in ss]  # noqa: E731
    assert key(specs) == key(file_specs)
    # register_all semantics: hand classes keep their registry slots
    before = dict(M.MESSAGE_REGISTRY)
    SMS.build_classes(register=True)
    assert M.MESSAGE_REGISTRY[M.ObjectDirection.ID] is M.ObjectDirection
    assert 1116 in M.MESSAGE_REGISTRY  # Geolocation present
    # new ids (e.g. opendlv.system.SignalStatusMessage [1002]) now resolve
    assert 1002 in M.MESSAGE_REGISTRY
    M.MESSAGE_REGISTRY.clear()
    M.MESSAGE_REGISTRY.update(before)


@pytest.mark.skipif(not os.path.exists(REF_ODVD),
                    reason="reference checkout not present")
def test_vendored_set_matches_reference_odvd():
    """Byte-for-byte schema parity with the upstream v0.9.5 spec."""
    ref = {s.name: s for s in parse_odvd(open(REF_ODVD).read())}
    ours = {s.name: s for s in SMS.to_specs()}
    assert set(ref) == set(ours)
    for n, s in ref.items():
        assert ours[n].ident == s.ident, n
        assert ours[n].fields == s.fields, n
        assert ours[n].odvd_types == s.odvd_types, n


def test_varint_zigzag_vectors():
    # protobuf reference vectors
    assert proto.zigzag_encode(0) == 0
    assert proto.zigzag_encode(-1) == 1
    assert proto.zigzag_encode(1) == 2
    assert proto.zigzag_encode(-2) == 3
    for v in (0, 1, -1, 127, 128, -300, 2 ** 31 - 1, -(2 ** 31)):
        assert proto.zigzag_decode(proto.zigzag_encode(v)) == v
    out = bytearray()
    proto.write_varint(out, 300)
    assert bytes(out) == b"\xac\x02"  # protobuf doc example
    val, pos = proto.read_varint(bytes(out), 0)
    assert val == 300 and pos == 2


def test_message_roundtrip_all_types():
    msgs = [
        M.Geolocation(latitude=57.70716, longitude=11.93782, altitude=12.5,
                      heading=1.25),
        M.ObjectDirection(objectId=7, azimuthAngle=-32.5, zenithAngle=1.5),
        M.ObjectDistance(objectId=7, distance=12.25),
        M.ObjectType(objectId=7, type=2),
        M.AngularVelocityReading(angularVelocityZ=0.42),
        M.GeodeticWgs84Reading(latitude=-33.5, longitude=151.2),
        M.GeodeticHeadingReading(northHeading=3.1),
    ]
    for m in msgs:
        back = proto.decode(type(m), proto.encode(m))
        for fid, kind, name, _ in m.FIELDS:
            a, b = getattr(m, name), getattr(back, name)
            if kind == M.FLOAT:
                assert abs(a - np.float32(b)) < 1e-5, (name, a, b)
            elif kind == M.DOUBLE:
                assert abs(a - b) < 1e-12
            else:
                assert a == b, (name, a, b)


def test_wire_format_bytes():
    """Byte-exact check against hand-computed cluon wire format."""
    m = M.ObjectType(objectId=3, type=2)
    # field1 key=(1<<3)|0=0x08 val=3 ; field2 key=0x10 val=2
    assert proto.encode(m) == b"\x08\x03\x10\x02"
    m2 = M.ObjectDistance(objectId=1, distance=2.0)
    want = b"\x08\x01\x15" + struct.pack("<f", 2.0)
    assert proto.encode(m2) == want


def test_envelope_frame_roundtrip():
    env = E.pack_message(M.ObjectType(objectId=1, type=4), sample_us=1234567,
                         sender_stamp=118)
    data = E.serialize_envelope(env)
    assert data[0] == 0x0D and data[1] == 0xA4
    out, pos = E.extract_envelope(b"garbage" + data + b"tail")
    assert out is not None and out.senderStamp == 118
    assert out.sampleTimeStamp.micros == 1234567
    msg = E.unpack_message(out)
    assert isinstance(msg, M.ObjectType) and msg.type == 4


def test_rec_write_read_player(tmp_path):
    path = str(tmp_path / "test.rec")
    with RecWriter(path) as w:
        for t in range(10):
            w.write_message(M.ObjectDistance(objectId=t, distance=float(t)),
                            sample_us=(10 - t) * 1000, sender_stamp=118)
    envs = list(read_rec(path))
    assert len(envs) == 10
    p = Player(path)
    # chronological replay despite reversed write order
    times = []
    p.replay(lambda e: times.append(e.sampleTimeStamp.micros))
    assert times == sorted(times) and len(times) == 10
    p2 = Player(path)
    p2.seek(0.5)
    rest = []
    p2.replay(lambda e: rest.append(e))
    assert len(rest) == 5


def test_odvd_parser_matches_hand_specs():
    specs = {s.name: s for s in parse_odvd(open(ODVD).read())}
    assert len(specs) > 50  # the standard set has 60+ messages
    for cls in (M.ObjectDirection, M.ObjectDistance, M.ObjectType,
                M.Geolocation, M.GeodeticWgs84Reading,
                M.AngularVelocityReading, M.GeodeticHeadingReading):
        name = [n for n in specs if specs[n].ident == cls.ID]
        assert name, f"{cls} missing from parsed odvd"
        parsed = specs[name[0]]
        want = [(fid, kind, fname) for fid, kind, fname, _ in cls.FIELDS]
        got = [(fid, kind, fname) for fid, kind, fname, _ in parsed.fields]
        assert got == want, (cls, got, want)


def test_msc_codegen_wire_identical(tmp_path):
    """slamctl msc output (cluon-msc equivalent): the generated module's
    classes must be byte-identical on the wire to the hand-written ones."""
    import importlib.util

    from tpuslam.io.msc import generate_python_module

    out = tmp_path / "gen_messages.py"
    n = generate_python_module(ODVD, str(out))
    assert n > 50
    spec = importlib.util.spec_from_file_location("gen_messages", out)
    gen = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(gen)

    cases = [
        (M.ObjectDirection(objectId=7, azimuthAngle=12.5, zenithAngle=-3.25),
         gen.BY_ID[M.ObjectDirection.ID](objectId=7, azimuthAngle=12.5,
                                         zenithAngle=-3.25)),
        (M.Geolocation(latitude=57.71, longitude=11.94, heading=1.25),
         gen.BY_ID[M.Geolocation.ID](latitude=57.71, longitude=11.94,
                                     heading=1.25)),
        (M.GeodeticWgs84Reading(latitude=57.0, longitude=-11.0),
         gen.BY_ID[M.GeodeticWgs84Reading.ID](latitude=57.0, longitude=-11.0)),
        (M.AngularVelocityReading(angularVelocityZ=0.5),
         gen.BY_ID[M.AngularVelocityReading.ID](angularVelocityZ=0.5)),
    ]
    for hand, g in cases:
        assert proto.encode(g) == proto.encode(hand), type(hand)
        back = proto.decode(type(g), proto.encode(hand))
        assert back == g

    # namespace tree access + registry install (non-destructive)
    assert gen.opendlv.proxy.GeodeticWgs84Reading.ID == 19
    reg = gen.register_all(registry={})
    assert reg[M.ObjectDirection.ID].LONG_NAME == M.ObjectDirection.LONG_NAME
    live = gen.register_all()
    assert live[M.ObjectDirection.ID] is M.ObjectDirection  # hand class wins


def test_msc_cli(tmp_path, capsys):
    from tpuslam.cli.main import main as cli_main

    out = tmp_path / "gen.py"
    assert cli_main(["msc", ODVD, "--out", str(out)]) == 0
    assert "message classes" in capsys.readouterr().out
    assert out.read_text().startswith('"""Generated by slamctl msc')
    # stdout mode emits the module source directly
    assert cli_main(["msc", ODVD]) == 0
    assert "class ObjectDirection:" in capsys.readouterr().out


def test_odvd_generated_classes_roundtrip():
    classes = load_standard_message_set(ODVD, register=False)
    kin = classes["opendlv.logic.sensation.Equilibrioception"]
    m = kin(vx=1.5)
    back = proto.decode(kin, proto.encode(m))
    assert abs(back.vx - 1.5) < 1e-6


def test_native_codec_equivalence(tmp_path):
    from tpuslam.native import codec
    if not codec.available():
        pytest.skip("native codec not built (no compiler?)")
    path = str(tmp_path / "n.rec")
    with RecWriter(path) as w:
        for t in range(50):
            w.write_message(M.ObjectDirection(objectId=t % 7,
                                              azimuthAngle=t * 0.5,
                                              zenithAngle=-1.0),
                            sample_us=t * 100, sender_stamp=118)
    buf = open(path, "rb").read()
    # inject garbage mid-stream: scanner must resynchronize
    cut = len(buf) // 2
    frame_end = buf.find(b"\x0d\xa4", cut)
    buf2 = buf[:frame_end] + b"\xde\xad\xbe\xef" + buf[frame_end:]

    hdr = codec.decode_headers(buf2)
    assert len(hdr["data_type"]) == 50
    assert set(hdr["data_type"].tolist()) == {1133}
    assert hdr["sender_stamp"].tolist() == [118] * 50
    assert hdr["sample_us"].tolist() == [t * 100 for t in range(50)]

    ids, vals = codec.decode_cones(buf2, hdr["payload_off"],
                                   hdr["payload_len"], 1133)
    assert ids.tolist() == [t % 7 for t in range(50)]
    np.testing.assert_allclose(vals[:, 0], [t * 0.5 for t in range(50)],
                               atol=1e-5)
    np.testing.assert_allclose(vals[:, 1], -1.0, atol=1e-6)

    # python fallback sees the same envelopes
    py_envs = list(E.iterate_envelopes(buf2))
    assert len(py_envs) == 50


def test_od4_session_loopback():
    """Two OD4 sessions on the same CID exchange an envelope via multicast."""
    from tpuslam.io.od4 import OD4Session

    async def run():
        rx = OD4Session(cid=199)
        tx = OD4Session(cid=199)
        got = []
        rx.data_trigger(M.ObjectType.ID, lambda env: got.append(env))
        try:
            await rx.start()
            await tx.start()
        except OSError:
            pytest.skip("multicast sockets unavailable in sandbox")
        for _ in range(20):
            tx.send(M.ObjectType(objectId=5, type=3), sample_us=42,
                    sender_stamp=9)
            await asyncio.sleep(0.05)
            if got:
                break
        await rx.stop()
        await tx.stop()
        return got

    got = asyncio.run(run())
    if not got:
        pytest.skip("multicast loopback not routed in this sandbox")
    env = got[0]
    assert env.senderStamp == 9
    msg = E.unpack_message(env)
    assert msg.objectId == 5 and msg.type == 3


def test_od4_session_stop_idempotent_and_send_after_stop():
    """Clean-shutdown semantics (the reference's TerminateHandler analogue,
    cluon-complete-build.hpp:5012): stop() cancels the pipeline and closes the
    transport; a second stop() and a send() after stop must not raise."""
    import asyncio

    from tpuslam.io.messages import GeodeticHeadingReading
    from tpuslam.io.od4 import OD4Session

    async def scenario():
        s = OD4Session(cid=199)
        await s.start()
        assert s.running
        await s.stop()
        assert not s.running
        await s.stop()          # idempotent
        s.send(GeodeticHeadingReading(northHeading=0.5))  # no transport -> no-op/queued
        return True

    assert asyncio.run(scenario())


def test_od4_session_native_and_interop():
    """Native C++ endpoint loopback + interop with the pure-Python endpoint
    in both directions (same wire format, same bus)."""
    from tpuslam.io.od4 import OD4Session
    from tpuslam.native import receiver as nat

    if not nat.available():
        pytest.skip("native receiver library unavailable")

    async def run():
        rx_native = OD4Session(cid=198, native=True)
        tx_python = OD4Session(cid=198, native=False)
        rx_python = OD4Session(cid=198, native=False)
        tx_native = OD4Session(cid=198, native=True)
        got_native, got_python = [], []
        rx_native.data_trigger(M.ObjectDistance.ID,
                               lambda env: got_native.append(env))
        rx_python.data_trigger(M.ObjectDirection.ID,
                               lambda env: got_python.append(env))
        try:
            for s in (rx_native, tx_python, rx_python, tx_native):
                await s.start()
        except OSError:
            pytest.skip("multicast sockets unavailable in sandbox")
        assert rx_native._native_ep is not None  # really on the native path
        for _ in range(40):
            tx_python.send(M.ObjectDistance(objectId=1, distance=7.5),
                           sender_stamp=3)
            tx_native.send(M.ObjectDirection(objectId=2, azimuthAngle=-10.0),
                           sender_stamp=4)
            await asyncio.sleep(0.05)
            if got_native and got_python:
                break
        for s in (rx_native, tx_python, rx_python, tx_native):
            await s.stop()
        return got_native, got_python

    got_native, got_python = asyncio.run(run())
    if not (got_native and got_python):
        pytest.skip("multicast loopback not routed in this sandbox")
    env = got_native[0]
    assert env.senderStamp == 3
    assert env.received.micros > 0  # kernel RX timestamp propagated
    m1 = E.unpack_message(env)
    assert m1.objectId == 1 and abs(m1.distance - 7.5) < 1e-6
    m2 = E.unpack_message(got_python[0])
    assert m2.objectId == 2


def test_od4_native_self_send_filter():
    """A native session must not receive its own datagrams
    (reference cluon :9507-9513)."""
    from tpuslam.io.od4 import OD4Session
    from tpuslam.native import receiver as nat

    if not nat.available():
        pytest.skip("native receiver library unavailable")

    async def run():
        s = OD4Session(cid=197, native=True)
        got = []
        s.catch_all(lambda env: got.append(env))
        try:
            await s.start()
        except OSError:
            pytest.skip("multicast sockets unavailable in sandbox")
        for _ in range(10):
            s.send(M.ObjectType(objectId=1, type=1))
            await asyncio.sleep(0.02)
        await s.stop()
        return got

    assert asyncio.run(run()) == []


def test_player_command_status_wire_format():
    """PlayerCommand [9] / PlayerStatus [10] encode exactly like cluon's
    ToProtoVisitor (uint8/uint32 -> plain varint, float -> LE32; reference
    src/cluon-complete-build.hpp:9902-9925, 4130-4162, 4295-4335)."""
    pc = M.PlayerCommand(command=3, seekTo=0.5)
    data = proto.encode(pc)
    # field 1 (varint): key 0x08, value 3; field 2 (32-bit): key 0x15, 0.5f LE
    assert data == bytes([0x08, 0x03, 0x15]) + struct.pack("<f", 0.5)
    assert proto.decode(M.PlayerCommand, data) == pc

    ps = M.PlayerStatus(state=2, numberOfEntries=300, currentEntryForPlayback=7)
    data = proto.encode(ps)
    # 0x08 state=2 | 0x10 varint(300)=0xAC 0x02 | 0x18 7
    assert data == bytes([0x08, 0x02, 0x10, 0xAC, 0x02, 0x18, 0x07])
    assert proto.decode(M.PlayerStatus, data) == ps
    assert M.MESSAGE_REGISTRY[9] is M.PlayerCommand
    assert M.MESSAGE_REGISTRY[10] is M.PlayerStatus


def test_replay_to_bus_remote_control(tmp_path):
    """cluon-replay parity: bus replay obeys PlayerCommand pause/play/seek
    and reports PlayerStatus progress (cluon :15863-16054)."""
    from tpuslam.io.od4 import OD4Session
    from tpuslam.io.rec import replay_to_bus

    path = str(tmp_path / "ctrl.rec")
    with RecWriter(path) as w:
        for t in range(40):
            w.write_message(M.ObjectType(objectId=t, type=1),
                            sample_us=t * 20_000, sender_stamp=118)

    async def run():
        player_s = OD4Session(cid=198)
        ctrl = OD4Session(cid=198)
        got, statuses = [], []
        ctrl.data_trigger(M.ObjectType.ID, lambda env: got.append(env))
        ctrl.data_trigger(M.PlayerStatus.ID, lambda env: statuses.append(
            proto.decode(M.PlayerStatus, env.serializedData)))
        try:
            await player_s.start()
            await ctrl.start()
        except OSError:
            pytest.skip("multicast sockets unavailable in sandbox")

        from tpuslam.io.rec import Player
        task = asyncio.create_task(
            replay_to_bus(Player(path), player_s, paced=True))
        # pause immediately, confirm the stream stalls
        await asyncio.sleep(0.15)
        ctrl.send(M.PlayerCommand(command=2))
        await asyncio.sleep(0.3)
        n_at_pause = len(got)
        await asyncio.sleep(0.4)
        stalled = len(got) - n_at_pause <= 1  # at most one in-flight envelope
        # seek near the end, then resume
        ctrl.send(M.PlayerCommand(command=3, seekTo=0.9))
        await asyncio.sleep(0.1)
        ctrl.send(M.PlayerCommand(command=1))
        await asyncio.wait_for(task, timeout=20)
        await asyncio.sleep(0.2)
        await player_s.stop()
        await ctrl.stop()
        return got, statuses, stalled

    got, statuses, stalled = asyncio.run(run())
    if not got and not statuses:
        pytest.skip("multicast loopback not routed in this sandbox")
    assert stalled, "pause must stop the replay stream"
    # envelopes re-published verbatim: original sender stamp + sample time
    assert all(e.senderStamp == 118 for e in got)
    # status reports: loading -> playback with the index size
    assert statuses[0].state == 1
    assert any(s.state == 2 and s.numberOfEntries == 40 for s in statuses)
    # the final status carries the total replayed count
    assert statuses[-1].currentEntryForPlayback == len(got)


def test_replay_to_stdout_stream(tmp_path):
    """cluon-replay's playBackToStdout: framed envelopes (data + PlayerStatus)
    serialized to a byte stream, no bus needed (cluon :15877, 16013-16017)."""
    from tpuslam.io.rec import replay_to_bus

    path = str(tmp_path / "sout.rec")
    with RecWriter(path) as w:
        for t in range(25):
            w.write_message(M.ObjectDistance(objectId=t, distance=1.0 * t),
                            sample_us=t * 1000, sender_stamp=7)

    out = pyio.BytesIO()
    n = asyncio.run(replay_to_bus(Player(path), od4=None, paced=False,
                                  stdout_stream=out))
    assert n == 25
    envs = list(E.iterate_envelopes(out.getvalue()))
    data = [e for e in envs if e.dataType == M.ObjectDistance.ID]
    stat = [proto.decode(M.PlayerStatus, e.serializedData) for e in envs
            if e.dataType == M.PlayerStatus.ID]
    assert len(data) == 25 and data[0].senderStamp == 7
    # loading -> playback -> 2 progress reports (every 10) -> final
    assert [s.state for s in stat] == [1, 2, 2, 2, 2]
    assert stat[-1].currentEntryForPlayback == 25
    assert all(s.numberOfEntries == 25 for s in stat)
