"""ISO Base Media File Format (MP4/MOV) metadata demux — no decoding.

Implemented from the public ISO/IEC 14496-12 box grammar: walks
``moov`` -> ``mvhd`` (movie timescale/duration) and each video
``trak`` -> ``mdia`` -> ``mdhd``/``hdlr``/``stbl`` (``stts`` sample
timing, ``stsz`` sample count, ``stsd`` codec fourcc + dimensions).

Inter-frame MP4 codecs (H.264/H.265/VP9/AV1) genuinely require a
decoder library this container doesn't have — but a 100 TB web-video
pipeline still wants duration / fps / frame-count / resolution
distributions, which live entirely in the container.  This feeds
``pipelines/multimodal.py:VideoFrameSampleStage`` as the
``metadata_only`` path: real numbers from the real container, pixel
sampling explicitly absent.  ``synth_mp4`` builds a minimal valid
fixture (ftyp+mdat+moov with one video track).

Scale shape: the walk touches only box headers and the small ``stbl``
tables — O(boxes), never O(bytes); a multi-GB clip costs the same as
a tiny one provided ``moov`` is available (for corpus rows it is).
"""

from __future__ import annotations

import struct


def _boxes(data: bytes, pos: int, end: int):
    """Yield (type, body_start, body_end) for the boxes in [pos, end)."""
    while pos + 8 <= end:
        size = int.from_bytes(data[pos : pos + 4], "big")
        btype = data[pos + 4 : pos + 8]
        body = pos + 8
        if size == 1:  # 64-bit largesize
            size = int.from_bytes(data[pos + 8 : pos + 16], "big")
            body = pos + 16
        elif size == 0:  # to end of file
            size = end - pos
        if size < 8 or pos + size > end:
            break
        yield btype, body, pos + size
        pos += size


def _find(data: bytes, pos: int, end: int, btype: bytes):
    for t, b, e in _boxes(data, pos, end):
        if t == btype:
            return b, e
    return None


def parse_mp4(data: bytes) -> dict:
    """-> {duration_s, fps, n_frames, width, height, codec} for the
    first video track (raises ValueError when no moov/video track)."""
    if len(data) < 12 or data[4:8] != b"ftyp":
        raise ValueError("not an ISO-BMFF stream")
    moov = _find(data, 0, len(data), b"moov")
    if moov is None:
        raise ValueError("no moov box")
    out = {"duration_s": None, "fps": None, "n_frames": None,
           "width": None, "height": None, "codec": None}
    mvhd = _find(data, moov[0], moov[1], b"mvhd")
    if mvhd is not None:
        b = mvhd[0]
        ver = data[b]
        if ver == 1:
            ts = int.from_bytes(data[b + 20 : b + 24], "big")
            dur = int.from_bytes(data[b + 24 : b + 32], "big")
        else:
            ts = int.from_bytes(data[b + 12 : b + 16], "big")
            dur = int.from_bytes(data[b + 16 : b + 20], "big")
        if ts:
            out["duration_s"] = round(dur / ts, 3)
    for t, b, e in _boxes(data, moov[0], moov[1]):
        if t != b"trak":
            continue
        mdia = _find(data, b, e, b"mdia")
        if mdia is None:
            continue
        hdlr = _find(data, mdia[0], mdia[1], b"hdlr")
        if hdlr is None or data[hdlr[0] + 8 : hdlr[0] + 12] != b"vide":
            continue
        mdhd = _find(data, mdia[0], mdia[1], b"mdhd")
        minf = _find(data, mdia[0], mdia[1], b"minf")
        if mdhd is None or minf is None:
            continue
        hb = mdhd[0]
        if data[hb] == 1:
            mts = int.from_bytes(data[hb + 20 : hb + 24], "big")
            mdur = int.from_bytes(data[hb + 24 : hb + 32], "big")
        else:
            mts = int.from_bytes(data[hb + 12 : hb + 16], "big")
            mdur = int.from_bytes(data[hb + 16 : hb + 20], "big")
        stbl = _find(data, minf[0], minf[1], b"stbl")
        if stbl is None:
            continue
        stsz = _find(data, stbl[0], stbl[1], b"stsz")
        if stsz is not None:
            sb = stsz[0]
            out["n_frames"] = int.from_bytes(data[sb + 8 : sb + 12], "big")
        stts = _find(data, stbl[0], stbl[1], b"stts")
        if stts is not None and mts:
            sb = stts[0]
            n_ent = int.from_bytes(data[sb + 4 : sb + 8], "big")
            total_n = total_t = 0
            for i in range(n_ent):
                cnt = int.from_bytes(
                    data[sb + 8 + 8 * i : sb + 12 + 8 * i], "big")
                delta = int.from_bytes(
                    data[sb + 12 + 8 * i : sb + 16 + 8 * i], "big")
                total_n += cnt
                total_t += cnt * delta
            if total_t:
                out["fps"] = round(total_n * mts / total_t, 3)
        stsd = _find(data, stbl[0], stbl[1], b"stsd")
        if stsd is not None:
            sb = stsd[0]
            if int.from_bytes(data[sb + 4 : sb + 8], "big") >= 1:
                entry = sb + 8
                out["codec"] = data[entry + 4 : entry + 8].decode(
                    "ascii", "replace")
                out["width"] = int.from_bytes(
                    data[entry + 32 : entry + 34], "big")
                out["height"] = int.from_bytes(
                    data[entry + 34 : entry + 36], "big")
        if out["duration_s"] is None and mts:
            out["duration_s"] = round(mdur / mts, 3)
        break
    if out["n_frames"] is None:
        raise ValueError("no video track in moov")
    return out


def synth_mp4(seed: int) -> bytes:
    """Minimal valid ISO-BMFF fixture: ftyp + empty mdat + moov with one
    avc1 video track (headers only — sample data stays in the empty
    mdat; this is a METADATA fixture for the metadata_only path)."""

    def box(btype: bytes, body: bytes) -> bytes:
        return struct.pack(">I", len(body) + 8) + btype + body

    def full(btype: bytes, body: bytes, ver: int = 0) -> bytes:
        return box(btype, bytes([ver, 0, 0, 0]) + body)

    fps = 24 + seed % 6
    n_frames = 48 + (seed % 10) * fps
    ts = fps * 1000
    dur = n_frames * 1000
    w, h = 320 + 16 * (seed % 8), 240 + 16 * (seed % 5)

    ftyp = box(b"ftyp", b"isom" + struct.pack(">I", 512) + b"isomiso2")
    mvhd = full(b"mvhd", struct.pack(">II", 0, 0)
                + struct.pack(">II", ts, dur) + struct.pack(">i", 0x00010000)
                + struct.pack(">h", 0x0100) + b"\x00" * 10
                + struct.pack(">9i", 0x00010000, 0, 0, 0, 0x00010000, 0, 0,
                              0, 0x40000000)
                + b"\x00" * 24 + struct.pack(">I", 2))
    tkhd = full(b"tkhd", struct.pack(">IIIII", 0, 0, 1, 0, dur)
                + b"\x00" * 16
                + struct.pack(">9i", 0x00010000, 0, 0, 0, 0x00010000, 0, 0,
                              0, 0x40000000)
                + struct.pack(">II", w << 16, h << 16), ver=0)
    mdhd = full(b"mdhd", struct.pack(">IIII", 0, 0, ts, dur)
                + struct.pack(">HH", 0x55C4, 0))
    hdlr = full(b"hdlr", struct.pack(">I", 0) + b"vide" + b"\x00" * 12
                + b"VideoHandler\x00")
    avc1 = box(b"avc1", b"\x00" * 6 + struct.pack(">H", 1) + b"\x00" * 16
               + struct.pack(">HH", w, h)
               + struct.pack(">II", 0x00480000, 0x00480000)
               + struct.pack(">I", 0) + struct.pack(">H", 1) + b"\x00" * 32
               + struct.pack(">Hh", 0x18, -1))
    stsd = full(b"stsd", struct.pack(">I", 1) + avc1)
    stts = full(b"stts", struct.pack(">III", 1, n_frames, 1000))
    stsc = full(b"stsc", struct.pack(">I", 0))
    stsz = full(b"stsz", struct.pack(">II", 0, n_frames))
    stco = full(b"stco", struct.pack(">I", 0))
    stbl = box(b"stbl", stsd + stts + stsc + stsz + stco)
    vmhd = full(b"vmhd", struct.pack(">HHHH", 0, 0, 0, 0), ver=0)
    dinf = box(b"dinf", full(b"dref", struct.pack(">I", 1)
                             + box(b"url ", bytes([0, 0, 0, 1]))))
    minf = box(b"minf", vmhd + dinf + stbl)
    mdia = box(b"mdia", mdhd + hdlr + minf)
    trak = box(b"trak", tkhd + mdia)
    moov = box(b"moov", mvhd + trak)
    mdat = box(b"mdat", b"")
    return ftyp + mdat + moov
