"""tools/xplane.py — hand-rolled XSpace protobuf reader.

Builds a tiny XSpace message byte-by-byte (varint/length-delimited wire
format) and checks the parser recovers planes, lines, event names resolved
through event_metadata, and ps offsets/durations.
"""
import struct
import sys
import os

sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", "tools"))

from xplane import load_xspace  # noqa: E402


def _varint(v: int) -> bytes:
    out = b""
    while True:
        b = v & 0x7F
        v >>= 7
        if v:
            out += bytes([b | 0x80])
        else:
            return out + bytes([b])


def _field(fno: int, wt: int, payload) -> bytes:
    key = _varint((fno << 3) | wt)
    if wt == 0:
        return key + _varint(payload)
    if wt == 2:
        return key + _varint(len(payload)) + payload
    raise ValueError(wt)


def _event(meta_id: int, offset_ps: int, dur_ps: int) -> bytes:
    return (
        _field(1, 0, meta_id) + _field(2, 0, offset_ps) + _field(3, 0, dur_ps)
    )


def _line(name: str, events) -> bytes:
    out = _field(2, 2, name.encode())
    for e in events:
        out += _field(4, 2, e)
    return out


def _emeta_entry(mid: int, name: str) -> bytes:
    meta = _field(2, 2, name.encode())
    return _field(1, 0, mid) + _field(2, 2, meta)


def _plane(name: str, lines, emeta) -> bytes:
    out = _field(2, 2, name.encode())
    for ln in lines:
        out += _field(3, 2, ln)
    for mid, nm in emeta:
        out += _field(4, 2, _emeta_entry(mid, nm))
    return out


def test_parse_roundtrip(tmp_path):
    plane = _plane(
        "/device:TPU:0 (fake)",
        [
            _line("ops", [_event(1, 1000, 2_000_000), _event(2, 5000, 500)]),
            _line("steps", [_event(1, 0, 7)]),
        ],
        [(1, "fusion.33"), (2, "copy.1")],
    )
    host = _plane("/host:CPU", [_line("py", [_event(9, 0, 1)])], [])
    space = _field(1, 2, plane) + _field(1, 2, host)
    p = tmp_path / "t.xplane.pb"
    p.write_bytes(space)

    planes = load_xspace(str(p))
    assert [pl["name"] for pl in planes] == ["/device:TPU:0 (fake)", "/host:CPU"]
    tpu = planes[0]
    assert [ln["name"] for ln in tpu["lines"]] == ["ops", "steps"]
    assert tpu["lines"][0]["events"] == [
        ("fusion.33", 1000, 2_000_000),
        ("copy.1", 5000, 500),
    ]
    # unknown metadata id falls back to the numeric id
    assert planes[1]["lines"][0]["events"] == [("9", 0, 1)]


def test_fixed64_and_fixed32_skipped(tmp_path):
    # unknown fixed-width fields inside a line must be skipped, not crash
    ln = _line("l", [_event(1, 1, 2)])
    ln += _varint((15 << 3) | 1) + struct.pack("<q", -1)
    ln += _varint((14 << 3) | 5) + struct.pack("<i", 7)
    plane = _plane("/device:TPU", [ln], [(1, "x")])
    p = tmp_path / "t2.xplane.pb"
    p.write_bytes(_field(1, 2, plane))
    planes = load_xspace(str(p))
    assert planes[0]["lines"][0]["events"] == [("x", 1, 2)]
