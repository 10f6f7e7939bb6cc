"""Offline analysis exporters: .rec -> CSV / JSON-lines.

Equivalents of the embedded cluon tools `cluon-rec2csv`
(reference src/cluon-complete-build.hpp:16272-16464) and the JSON side of
`EnvelopeConverter` (:7011). Exposed via `slamctl export`.
"""
from __future__ import annotations

import dataclasses
import json
from typing import Iterable, Optional, TextIO

from tpuslam.io import messages as M
from tpuslam.io import envelope as E

__all__ = ["envelope_to_dict", "rec_to_jsonl", "rec_to_csv"]


def envelope_to_dict(env: M.Envelope) -> dict:
    msg = E.unpack_message(env)
    if isinstance(msg, M.GenericMessage):
        payload = {"raw_bytes": len(msg.values.get("raw", b""))}
        name = f"unknown_{env.dataType}"
    else:
        payload = dataclasses.asdict(msg)
        payload = {k: (v.decode("latin-1") if isinstance(v, bytes) else v)
                   for k, v in payload.items()}
        name = type(msg).__name__
    return {
        "dataType": env.dataType,
        "message": name,
        "senderStamp": env.senderStamp,
        "sampleTimeStamp_us": env.sampleTimeStamp.micros,
        "sent_us": env.sent.micros,
        "payload": payload,
    }


def rec_to_jsonl(envelopes: Iterable[M.Envelope], out: TextIO,
                 data_type: Optional[int] = None) -> int:
    n = 0
    for env in envelopes:
        if data_type is not None and env.dataType != data_type:
            continue
        out.write(json.dumps(envelope_to_dict(env)) + "\n")
        n += 1
    return n


def rec_to_csv(envelopes: Iterable[M.Envelope], out: TextIO,
               data_type: int) -> int:
    """One CSV per message type (matches cluon-rec2csv's per-type split)."""
    n = 0
    header_written = False
    for env in envelopes:
        if env.dataType != data_type:
            continue
        d = envelope_to_dict(env)
        cols = ["sampleTimeStamp_us", "senderStamp"] + list(d["payload"].keys())
        if not header_written:
            out.write(";".join(cols) + "\n")
            header_written = True
        vals = [str(d["sampleTimeStamp_us"]), str(d["senderStamp"])] + \
            [str(v) for v in d["payload"].values()]
        out.write(";".join(vals) + "\n")
        n += 1
    return n
