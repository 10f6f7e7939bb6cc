"""Alternative message codecs: MsgPack and LCM wire formats.

Covers the remaining libcluon format-converter visitors from SURVEY.md §2.2:
`ToMsgPackVisitor`/`FromMsgPackVisitor` (reference
src/cluon-complete-build.hpp:6763, 6005; impl :12505-12700, :10626+) and
`ToLCMVisitor`/`FromLCMVisitor` (:6557, 5843; impl :12174-12351).
These are ops/bridge codecs, not the hot path — the OD4 bus and `.rec` logs
use the proto codec in tpuslam.io.proto.

MsgPack: a message encodes as a msgpack map {fieldName: value} using the
smallest representation (fixmap/map16, fixstr/str8/16/32, fixint/uint8..64/
int8..64, float32/float64), exactly like the reference encoder. One
documented deviation: the reference's bool visit counts the field but never
writes it (reference src/cluon-complete-build.hpp:12620-12622 increments
m_numberOfFields without encoding — an upstream bug that would corrupt the
map); we encode bools properly (0xc2/0xc3). No message in the standard set
has a bool field, so the formats agree on all real messages.

LCM: big-endian fields in declaration order, preceded by the 8-byte
big-endian type hash (reference hash recurrence `(h<<8 ^ h>>55) + c` seeded
0x12345678 over (name, typeName, 0-dimension) per field, zigzag-folded —
:12331-12350). Strings are int32-length-prefixed and NUL-terminated
(:12318-2327). Nested messages hash name-only and fold the nested hash in
(:6595-6611).
"""
from __future__ import annotations

import struct

from tpuslam.io import messages as M

__all__ = ["to_msgpack", "from_msgpack", "msgpack_to_dict",
           "to_lcm", "from_lcm", "lcm_hash"]

# ---------------------------------------------------------------------------
# MsgPack
# ---------------------------------------------------------------------------

_I64_MIN, _I8_MIN, _I16_MIN, _I32_MIN = -(1 << 63), -128, -(1 << 15), -(1 << 31)


def _mp_str(out: bytearray, s: bytes):
    n = len(s)
    if n < 32:
        out.append(0xA0 | n)
    elif n <= 0xFF:
        out += bytes((0xD9, n))
    elif n <= 0xFFFF:
        out.append(0xDA)
        out += struct.pack(">H", n)
    else:
        out.append(0xDB)
        out += struct.pack(">I", n)
    out += s


def _mp_uint(out: bytearray, v: int):
    if v <= 0x7F:
        out.append(v)
    elif v <= 0xFF:
        out += bytes((0xCC, v))
    elif v <= 0xFFFF:
        out.append(0xCD)
        out += struct.pack(">H", v)
    elif v <= 0xFFFFFFFF:
        out.append(0xCE)
        out += struct.pack(">I", v)
    else:
        out.append(0xCF)
        out += struct.pack(">Q", v)


def _mp_int(out: bytearray, v: int):
    if v >= 0:
        _mp_uint(out, v)
    elif v >= -31:
        # negative fixint. NOTE: msgpack's fixint range is -32..-1, but the
        # reference's encodeInt branches on `-31 <= v` (cluon :12579) so -32
        # gets int8 — matched here for byte-for-byte parity with cluon.
        out.append(v & 0xFF)
    elif v >= _I8_MIN:
        out.append(0xD0)
        out += struct.pack(">b", v)
    elif v >= _I16_MIN:
        out.append(0xD1)
        out += struct.pack(">h", v)
    elif v >= _I32_MIN:
        out.append(0xD2)
        out += struct.pack(">i", v)
    else:
        out.append(0xD3)
        out += struct.pack(">q", max(v, _I64_MIN))


def to_msgpack(msg) -> bytes:
    """Encode a FIELDS-spec message as a msgpack {name: value} map."""
    fields = msg.FIELDS
    out = bytearray()
    n = len(fields)
    if n <= 0xF:
        out.append(0x80 | n)          # fixmap
    else:
        out.append(0xDE)              # map16
        out += struct.pack(">H", n)
    for _fid, kind, name, _nested in fields:
        _mp_str(out, name.encode())
        v = getattr(msg, name)
        if kind == M.VARINT_SIGNED:
            _mp_int(out, int(v))
        elif kind == M.VARINT_UNSIGNED:
            _mp_uint(out, int(v))
        elif kind == M.FLOAT:
            out.append(0xCA)
            out += struct.pack(">f", float(v))
        elif kind == M.DOUBLE:
            out.append(0xCB)
            out += struct.pack(">d", float(v))
        elif kind == M.STRING:
            data = v.encode() if isinstance(v, str) else bytes(v)
            _mp_str(out, data)
        elif kind == M.MESSAGE:
            out += to_msgpack(v)      # nested map
    return bytes(out)


def _mp_read(buf: bytes, pos: int):
    """Decode one msgpack value -> (value, new_pos). Subset: the formats the
    encoder above emits plus nil/bool/bin."""
    t = buf[pos]
    pos += 1
    if t <= 0x7F:
        return t, pos
    if t >= 0xE0:
        return t - 0x100, pos                       # negative fixint
    if 0x80 <= t <= 0x8F:                           # fixmap
        return _mp_read_map(buf, pos, t & 0xF)
    if 0xA0 <= t <= 0xBF:                           # fixstr
        n = t & 0x1F
        return buf[pos:pos + n].decode("latin-1"), pos + n
    if t == 0xC0:
        return None, pos
    if t == 0xC2:
        return False, pos
    if t == 0xC3:
        return True, pos
    if t in (0xC4, 0xD9):                           # bin8 / str8
        n = buf[pos]
        pos += 1
        raw = buf[pos:pos + n]
        return (bytes(raw) if t == 0xC4 else raw.decode("latin-1")), pos + n
    if t in (0xC5, 0xDA):
        n = struct.unpack_from(">H", buf, pos)[0]
        pos += 2
        raw = buf[pos:pos + n]
        return (bytes(raw) if t == 0xC5 else raw.decode("latin-1")), pos + n
    if t in (0xC6, 0xDB):
        n = struct.unpack_from(">I", buf, pos)[0]
        pos += 4
        raw = buf[pos:pos + n]
        return (bytes(raw) if t == 0xC6 else raw.decode("latin-1")), pos + n
    if t == 0xCA:
        return struct.unpack_from(">f", buf, pos)[0], pos + 4
    if t == 0xCB:
        return struct.unpack_from(">d", buf, pos)[0], pos + 8
    if t == 0xCC:
        return buf[pos], pos + 1
    if t == 0xCD:
        return struct.unpack_from(">H", buf, pos)[0], pos + 2
    if t == 0xCE:
        return struct.unpack_from(">I", buf, pos)[0], pos + 4
    if t == 0xCF:
        return struct.unpack_from(">Q", buf, pos)[0], pos + 8
    if t == 0xD0:
        return struct.unpack_from(">b", buf, pos)[0], pos + 1
    if t == 0xD1:
        return struct.unpack_from(">h", buf, pos)[0], pos + 2
    if t == 0xD2:
        return struct.unpack_from(">i", buf, pos)[0], pos + 4
    if t == 0xD3:
        return struct.unpack_from(">q", buf, pos)[0], pos + 8
    if t == 0xDE:
        n = struct.unpack_from(">H", buf, pos)[0]
        return _mp_read_map(buf, pos + 2, n)
    if t == 0xDF:
        n = struct.unpack_from(">I", buf, pos)[0]
        return _mp_read_map(buf, pos + 4, n)
    raise ValueError(f"unsupported msgpack format byte 0x{t:02x}")


def _mp_read_map(buf: bytes, pos: int, n: int):
    d = {}
    for _ in range(n):
        k, pos = _mp_read(buf, pos)
        v, pos = _mp_read(buf, pos)
        d[k] = v
    return d, pos


def msgpack_to_dict(buf: bytes) -> dict:
    v, _ = _mp_read(buf, 0)
    if not isinstance(v, dict):
        raise ValueError("top-level msgpack value is not a map")
    return v


def from_msgpack(cls, buf: bytes):
    """Decode msgpack bytes into a message dataclass (by field name)."""
    d = msgpack_to_dict(buf)
    msg = cls()
    for _fid, kind, name, nested in cls.FIELDS:
        if name not in d:
            continue
        v = d[name]
        if kind == M.MESSAGE and isinstance(v, dict):
            sub = nested()
            for _f, _k, n2, _n in nested.FIELDS:
                if n2 in v:
                    setattr(sub, n2, v[n2])
            v = sub
        elif kind == M.STRING and isinstance(v, str):
            v = v.encode("latin-1")
        setattr(msg, name, v)
    return msg


# ---------------------------------------------------------------------------
# LCM
# ---------------------------------------------------------------------------

_MASK64 = (1 << 64) - 1


def _s64(v: int) -> int:
    v &= _MASK64
    return v - (1 << 64) if v >= (1 << 63) else v


# ODVD type -> (LCM hash type name, struct format or None for string)
_LCM_TYPE = {
    "bool": ("boolean", "?"), "char": ("int8_t", "b"),
    "int8": ("int8_t", "b"), "uint8": ("int8_t", "B"),
    "int16": ("int16_t", ">h"), "uint16": ("int16_t", ">H"),
    "int32": ("int32_t", ">i"), "uint32": ("int32_t", ">I"),
    "int64": ("int64_t", ">q"), "uint64": ("int64_t", ">Q"),
    "float": ("float", ">f"), "double": ("double", ">d"),
    "string": ("string", None), "bytes": ("string", None),
}

# fallback when a message class carries no ODVD_TYPES entry for a field
_KIND_DEFAULT = M.WIRE_KIND_TO_ODVD


def _odvd_type(cls, kind, name) -> str:
    return getattr(cls, "ODVD_TYPES", {}).get(name, _KIND_DEFAULT.get(kind, "int32"))


def _hash_char(h: int, c: int) -> int:
    # reference src/cluon-complete-build.hpp:12341-12343 (int64 arithmetic)
    h = _s64(h)
    return _s64(((h << 8) ^ (h >> 55)) + _s64(c if c < 128 else c - 256))


def _hash_str(h: int, s: str) -> int:
    # length byte capped at 255, then ALL chars (reference quirk, :12345-12350)
    h = _hash_char(h, min(len(s), 255))
    for c in s:
        h = _hash_char(h, ord(c))
    return h


def _lcm_encode(msg, cls):
    """-> (body bytes, raw pre-zigzag hash, nested hashes)."""
    out = bytearray()
    h = 0x12345678
    nested_hashes = []
    for _fid, kind, name, nested in cls.FIELDS:
        v = getattr(msg, name)
        if kind == M.MESSAGE:
            h = _hash_str(h, name)
            h = _hash_char(h, 0)
            body, sub_raw, sub_nested = _lcm_encode(v, nested)
            out += body
            sub = _s64(sub_raw + sum(sub_nested))
            nested_hashes.append(_s64((sub << 1) + ((sub >> 63) & 1)))
            continue
        t, fmt = _LCM_TYPE[_odvd_type(cls, kind, name)]
        h = _hash_str(h, name)
        h = _hash_str(h, t)
        h = _hash_char(h, 0)
        if fmt is None:   # string: int32 length incl. NUL, bytes, NUL
            data = v.encode() if isinstance(v, str) else bytes(v)
            out += struct.pack(">i", len(data) + 1) + data + b"\0"
        else:
            out += struct.pack(fmt, v if fmt == "?" else
                               (float(v) if fmt[-1] in "fd" else int(v)))
    return bytes(out), h, nested_hashes


_HASH_CACHE: dict[type, int] = {}


def lcm_hash(cls) -> int:
    """The 64-bit LCM type hash the reference would compute for `cls`.
    A pure function of FIELDS/ODVD_TYPES, so cached per class — decode
    paths verify it on every message."""
    h = _HASH_CACHE.get(cls)
    if h is None:
        _, raw, nested = _lcm_encode(cls(), cls)
        tmp = _s64(raw + sum(nested))
        h = _HASH_CACHE[cls] = _s64((tmp << 1) + ((tmp >> 63) & 1))
    return h


def to_lcm(msg, with_hash: bool = True) -> bytes:
    body, raw, nested = _lcm_encode(msg, type(msg))
    if not with_hash:
        return body
    tmp = _s64(raw + sum(nested))
    hv = _s64((tmp << 1) + ((tmp >> 63) & 1))
    return struct.pack(">q", hv) + body


def _lcm_decode(cls, buf: bytes, pos: int):
    msg = cls()
    for _fid, kind, name, nested in cls.FIELDS:
        if kind == M.MESSAGE:
            sub, pos = _lcm_decode(nested, buf, pos)
            setattr(msg, name, sub)
            continue
        _t, fmt = _LCM_TYPE[_odvd_type(cls, kind, name)]
        if fmt is None:
            n = struct.unpack_from(">i", buf, pos)[0]
            pos += 4
            setattr(msg, name, bytes(buf[pos:pos + n - 1]))
            pos += n
        else:
            setattr(msg, name, struct.unpack_from(fmt, buf, pos)[0])
            pos += struct.calcsize(fmt)
    return msg, pos


def from_lcm(cls, buf: bytes, with_hash: bool = True):
    """Decode LCM bytes; verifies the leading type hash when present."""
    pos = 0
    if with_hash:
        got = struct.unpack_from(">q", buf, 0)[0]
        want = lcm_hash(cls)
        if got != want:
            raise ValueError(f"LCM hash mismatch: got {got:#x}, want {want:#x}")
        pos = 8
    msg, _ = _lcm_decode(cls, buf, pos)
    return msg


def lcm_to_generic(spec, buf: bytes, with_hash: bool = True) -> "M.GenericMessage":
    """LCMToGenericMessage equivalent (reference
    src/cluon-complete-build.hpp:7635): decode LCM bytes against a runtime
    ODVD `MessageSpec` (tpuslam.io.odvd) into a dict-backed GenericMessage —
    no compiled class needed."""
    from tpuslam.io.odvd import build_message_classes
    cls = build_message_classes([spec])[spec.name]
    msg = from_lcm(cls, buf, with_hash=with_hash)
    return M.GenericMessage(
        dataType=spec.ident,
        values={name: getattr(msg, name) for _f, _k, name, _n in spec.fields})
