"""Minimal XSpace/XPlane protobuf reader (no tensorflow dependency).

The chrome-trace json that jax.profiler exports caps at 1e6 events; through
the axon relay the host planes alone can exhaust that cap, silently dropping
the TPU device plane (observed round 3).  The on-disk `*.xplane.pb` always
holds every plane, so we parse it directly with a hand-rolled walker over the
stable xplane.proto schema (tensorflow/core/profiler/protobuf/xplane.proto).

Public API: load_xspace(path) -> list of planes, each
  {"name": str, "lines": [{"name": str, "events": [(name, offset_ps,
   duration_ps)]}]}
"""
from __future__ import annotations

import struct


def _read_varint(buf: bytes, i: int) -> tuple[int, int]:
    out = 0
    shift = 0
    while True:
        b = buf[i]
        i += 1
        out |= (b & 0x7F) << shift
        if not b & 0x80:
            return out, i
        shift += 7


def _fields(buf: bytes):
    """Yield (field_no, wire_type, value) over a message buffer.
    value: int for varint/fixed, bytes for length-delimited."""
    i, n = 0, len(buf)
    while i < n:
        key, i = _read_varint(buf, i)
        fno, wt = key >> 3, key & 7
        if wt == 0:
            v, i = _read_varint(buf, i)
        elif wt == 1:
            v = struct.unpack_from("<q", buf, i)[0]
            i += 8
        elif wt == 2:
            ln, i = _read_varint(buf, i)
            v = buf[i : i + ln]
            i += ln
        elif wt == 5:
            v = struct.unpack_from("<i", buf, i)[0]
            i += 4
        else:  # group markers unused by xplane
            raise ValueError(f"unsupported wire type {wt}")
        yield fno, wt, v


def _zigzag_ok(v: int) -> int:
    # xplane uses plain int64 (no zigzag); normalise two's complement
    return v - (1 << 64) if v >= 1 << 63 else v


def _parse_event(buf: bytes):
    meta_id = offset_ps = dur_ps = 0
    for fno, _wt, v in _fields(buf):
        if fno == 1:
            meta_id = v
        elif fno == 2:
            offset_ps = _zigzag_ok(v)
        elif fno == 3:
            dur_ps = _zigzag_ok(v)
    return meta_id, offset_ps, dur_ps


def _parse_line(buf: bytes):
    name = ""
    events = []
    for fno, _wt, v in _fields(buf):
        if fno == 2:
            name = v.decode("utf-8", "replace")
        elif fno == 4:
            events.append(_parse_event(v))
    return {"name": name, "events": events}


def _parse_map_entry(buf: bytes):
    k = 0
    val = b""
    for fno, _wt, v in _fields(buf):
        if fno == 1:
            k = v
        elif fno == 2:
            val = v
    return k, val


def _parse_event_metadata(buf: bytes):
    name = ""
    for fno, _wt, v in _fields(buf):
        if fno == 2:
            name = v.decode("utf-8", "replace")
    return name


def _parse_plane(buf: bytes):
    name = ""
    lines = []
    emeta: dict[int, str] = {}
    for fno, _wt, v in _fields(buf):
        if fno == 2:
            name = v.decode("utf-8", "replace")
        elif fno == 3:
            lines.append(_parse_line(v))
        elif fno == 4:
            k, mv = _parse_map_entry(v)
            emeta[k] = _parse_event_metadata(mv)
    for ln in lines:
        ln["events"] = [
            (emeta.get(mid, str(mid)), off, dur) for mid, off, dur in ln["events"]
        ]
    return {"name": name, "lines": lines}


def load_xspace(path: str):
    buf = open(path, "rb").read()
    planes = []
    for fno, _wt, v in _fields(buf):
        if fno == 1:
            planes.append(_parse_plane(v))
    return planes


if __name__ == "__main__":
    import sys

    for p in load_xspace(sys.argv[1]):
        n = sum(len(ln["events"]) for ln in p["lines"])
        print(f"{p['name']}: {len(p['lines'])} lines, {n} events")
