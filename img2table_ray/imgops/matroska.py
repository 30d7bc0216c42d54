"""Matroska/WebM (EBML) metadata walk — container stats, no decoding.

Implemented from the public EBML (RFC 8794) and Matroska element
registries: Segment -> Info (TimecodeScale, Duration) and Tracks ->
TrackEntry (TrackType, CodecID, DefaultDuration, Video PixelWidth/
PixelHeight).  VP8/VP9/AV1 payload decode genuinely needs a codec
library, but duration / fps / resolution / codec distributions live in
the headers; this feeds ``pipelines/multimodal.py:
VideoFrameSampleStage`` as a ``metadata_only`` path alongside the
ISO-BMFF walk (``imgops/isobmff.py``).  ``synth_webm`` builds a
minimal valid fixture.

Scale shape: the walk descends only Segment/Info/Tracks — Clusters
(the bulk of a real file) are skipped by their declared size, so cost
is O(header elements), never O(media bytes).
"""

from __future__ import annotations

import struct


def _read_vint(data: bytes, pos: int, keep_marker: bool) -> tuple[int, int]:
    """EBML variable-width int at pos -> (value, next_pos)."""
    if pos >= len(data):
        raise ValueError("EBML truncated")
    b0 = data[pos]
    if b0 == 0:
        raise ValueError("invalid EBML vint")
    length = 8 - b0.bit_length() + 1
    if pos + length > len(data):
        raise ValueError("EBML truncated")
    v = b0 if keep_marker else b0 & ((1 << (8 - length)) - 1)
    for i in range(1, length):
        v = (v << 8) | data[pos + i]
    return v, pos + length


def _elements(data: bytes, pos: int, end: int):
    """Yield (element_id, body_start, body_end) within [pos, end)."""
    while pos < end:
        eid, pos = _read_vint(data, pos, keep_marker=True)
        size, pos = _read_vint(data, pos, keep_marker=False)
        body_end = min(pos + size, end)
        yield eid, pos, body_end
        pos = body_end


def _uint(data: bytes, start: int, end: int) -> int:
    v = 0
    for i in range(start, end):
        v = (v << 8) | data[i]
    return v


def _float(data: bytes, start: int, end: int) -> float:
    n = end - start
    if n == 4:
        return struct.unpack(">f", data[start:end])[0]
    if n == 8:
        return struct.unpack(">d", data[start:end])[0]
    raise ValueError(f"bad EBML float width {n}")


def parse_webm(data: bytes) -> dict:
    """-> {duration_s, fps, n_frames, width, height, codec} for the
    first video track (fps/n_frames from DefaultDuration when present)."""
    if data[:4] != b"\x1a\x45\xdf\xa3":
        raise ValueError("not an EBML/Matroska stream")
    segment = None
    for eid, b, e in _elements(data, 0, len(data)):
        if eid == 0x18538067:  # Segment
            segment = (b, e)
            break
    if segment is None:
        raise ValueError("no Matroska Segment")
    scale = 1_000_000  # ns per tick (TimecodeScale default)
    dur_ticks = None
    out = {"duration_s": None, "fps": None, "n_frames": None,
           "width": None, "height": None, "codec": None}
    for eid, b, e in _elements(data, segment[0], segment[1]):
        if eid == 0x1549A966:  # Info
            for i2, b2, e2 in _elements(data, b, e):
                if i2 == 0x2AD7B1:
                    scale = _uint(data, b2, e2)
                elif i2 == 0x4489:
                    dur_ticks = _float(data, b2, e2)
        elif eid == 0x1654AE6B:  # Tracks
            for i2, b2, e2 in _elements(data, b, e):
                if i2 != 0xAE:  # TrackEntry
                    continue
                ttype = None
                codec = None
                defdur = None
                width = height = None
                for i3, b3, e3 in _elements(data, b2, e2):
                    if i3 == 0x83:
                        ttype = _uint(data, b3, e3)
                    elif i3 == 0x86:
                        codec = data[b3:e3].decode("ascii", "replace")
                    elif i3 == 0x23E383:
                        defdur = _uint(data, b3, e3)  # ns per frame
                    elif i3 == 0xE0:  # Video
                        for i4, b4, e4 in _elements(data, b3, e3):
                            if i4 == 0xB0:
                                width = _uint(data, b4, e4)
                            elif i4 == 0xBA:
                                height = _uint(data, b4, e4)
                if ttype == 1 and out["codec"] is None:
                    out["codec"] = codec
                    out["width"] = width
                    out["height"] = height
                    if defdur:
                        out["fps"] = round(1e9 / defdur, 3)
    if out["codec"] is None:
        raise ValueError("no video track in Matroska stream")
    if dur_ticks is not None:
        out["duration_s"] = round(dur_ticks * scale / 1e9, 3)
        if out["fps"]:
            out["n_frames"] = int(round(out["duration_s"] * out["fps"]))
    return out


def synth_webm(seed: int) -> bytes:
    """Minimal valid WebM METADATA fixture: EBML header + Segment with
    Info (TimecodeScale, Duration) and one VP9 video TrackEntry with
    DefaultDuration and pixel dimensions (no Clusters — metadata_only)."""

    def vint_size(v: int) -> bytes:
        # encode a size in the fewest marker-prefixed bytes
        for length in range(1, 9):
            if v < (1 << (7 * length)) - 1:
                b = v | (1 << (7 * length))
                return b.to_bytes(length, "big")
        raise ValueError("size too large")

    def elem(eid: int, body: bytes) -> bytes:
        nid = (eid.bit_length() + 7) // 8
        return eid.to_bytes(nid, "big") + vint_size(len(body)) + body

    def u(v: int) -> bytes:
        n = max(1, (v.bit_length() + 7) // 8)
        return v.to_bytes(n, "big")

    fps = 24 + seed % 6
    n_frames = 48 + (seed % 10) * fps
    dur_ms = n_frames * 1000.0 / fps
    w, h = 640 + 16 * (seed % 8), 360 + 16 * (seed % 5)

    ebml = elem(0x1A45DFA3,
                elem(0x4286, u(1)) + elem(0x42F7, u(1)) + elem(0x42F2, u(4))
                + elem(0x42F3, u(8)) + elem(0x4282, b"webm")
                + elem(0x4287, u(4)) + elem(0x4285, u(2)))
    info = elem(0x1549A966,
                elem(0x2AD7B1, u(1_000_000))
                + elem(0x4489, struct.pack(">d", dur_ms)))
    video = elem(0xE0, elem(0xB0, u(w)) + elem(0xBA, u(h)))
    track = elem(0xAE,
                 elem(0xD7, u(1)) + elem(0x73C5, u(1)) + elem(0x83, u(1))
                 + elem(0x86, b"V_VP9")
                 + elem(0x23E383, u(round(1e9 / fps))) + video)
    tracks = elem(0x1654AE6B, track)
    segment = elem(0x18538067, info + tracks)
    return ebml + segment
