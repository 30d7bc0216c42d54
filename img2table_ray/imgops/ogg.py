"""Ogg (Vorbis/Opus) metadata walk — container stats, no decoding.

Implemented from the public Ogg framing spec (RFC 3533) and the
Vorbis I / Opus (RFC 7845) identification headers: the first page of
the stream carries channels + sample rate; the last page's granule
position is the total PCM sample count (Opus granules run at a fixed
48 kHz and subtract the ID header's pre-skip).  Audio payload decode
(MDCT/CELT) genuinely needs a codec, but duration / rate / channel
distributions live in the framing; this feeds
``pipelines/multimodal.py:AudioFeatureStage`` as a ``metadata_only``
path alongside the MP3 header walk (``imgops/mpegaudio.py``).
``synth_ogg`` builds minimal valid fixtures (correct page CRCs).

Scale shape: the walk hops page headers using the segment table —
O(pages), payload bytes are never read.
"""

from __future__ import annotations

import struct

import numpy as np


def _crc_table() -> np.ndarray:
    # Ogg CRC-32: poly 0x04C11DB7, init 0, no reflection, xorout 0
    tab = np.zeros(256, np.uint32)
    for i in range(256):
        c = i << 24
        for _ in range(8):
            c = ((c << 1) ^ 0x04C11DB7) if c & 0x80000000 else (c << 1)
        tab[i] = c & 0xFFFFFFFF
    return tab


_CRC_TAB = _crc_table()


def ogg_crc(data: bytes) -> int:
    c = 0
    for b in data:
        c = (int(_CRC_TAB[((c >> 24) ^ b) & 0xFF]) ^ (c << 8)) & 0xFFFFFFFF
    return c


def _pages(data: bytes):
    """Yield (granule, serial, payload_start, payload_end) per page."""
    pos = 0
    n = len(data)
    while pos + 27 <= n:
        if data[pos : pos + 4] != b"OggS":
            # resync to the next capture pattern
            nxt = data.find(b"OggS", pos + 1)
            if nxt < 0:
                return
            pos = nxt
            continue
        granule = struct.unpack("<q", data[pos + 6 : pos + 14])[0]
        serial = struct.unpack("<I", data[pos + 14 : pos + 18])[0]
        nseg = data[pos + 26]
        seg_table = data[pos + 27 : pos + 27 + nseg]
        body = pos + 27 + nseg
        size = sum(seg_table)
        yield granule, serial, body, min(body + size, n)
        pos = body + size


def parse_ogg(data: bytes) -> dict:
    """-> {duration_s, sample_rate, channels, codec} from the framing
    + ID header of the FIRST logical stream."""
    if data[:4] != b"OggS":
        raise ValueError("not an Ogg stream")
    codec = rate = channels = None
    preskip = 0
    serial0 = None
    last_granule = None
    for granule, serial, b, e in _pages(data):
        if serial0 is None:
            serial0 = serial
            head = data[b:e]
            if head[:7] == b"\x01vorbis" and len(head) >= 16:
                codec = "vorbis"
                channels = head[11]
                rate = struct.unpack("<I", head[12:16])[0]
            elif head[:8] == b"OpusHead" and len(head) >= 19:
                codec = "opus"
                channels = head[9]
                preskip = struct.unpack("<H", head[10:12])[0]
                rate = struct.unpack("<I", head[12:16])[0]
            else:
                raise ValueError("unknown Ogg codec ID header")
        if serial == serial0 and granule >= 0:
            last_granule = granule
    if codec is None or not rate:
        raise ValueError("no usable Ogg ID header")
    if last_granule is None:
        duration = 0.0
    elif codec == "opus":
        # Opus granules are 48 kHz regardless of the input rate
        duration = max(0, last_granule - preskip) / 48000.0
    else:
        duration = last_granule / rate
    return {
        "duration_s": round(duration, 3),
        "sample_rate": rate,
        "channels": channels,
        "codec": codec,
    }


def synth_ogg(seed: int, codec: str = "vorbis") -> bytes:
    """Minimal valid Ogg METADATA fixture: BOS page with the codec ID
    header, one dummy audio page, and an EOS page whose granule encodes
    the duration.  Page CRCs are correct per RFC 3533."""
    rate = int(8000 * (1 + seed % 3))
    channels = 1 + seed % 2
    n_samples = rate // 2 + (seed % 5) * 1000

    def page(htype: int, granule: int, seq: int, payload: bytes) -> bytes:
        segs = []
        rest = len(payload)
        while rest >= 255:
            segs.append(255)
            rest -= 255
        segs.append(rest)
        hdr = (b"OggS\x00" + bytes([htype])
               + struct.pack("<qIIi", granule, 0x1234 + seed, seq, 0)
               + bytes([len(segs)]) + bytes(segs))
        crc = ogg_crc(hdr + payload)
        hdr = hdr[:22] + struct.pack("<I", crc) + hdr[26:]
        return hdr + payload

    if codec == "vorbis":
        ident = (b"\x01vorbis" + struct.pack("<IB", 0, channels)
                 + struct.pack("<IiiI", rate, 0, 0, 0)
                 + bytes([(8 << 4) | 8, 1]))
        granule_end = n_samples
    else:  # opus
        ident = (b"OpusHead\x01" + bytes([channels])
                 + struct.pack("<HIhB", 312, rate, 0, 0))
        granule_end = 312 + n_samples * 48000 // rate
    return (page(0x02, 0, 0, ident)              # BOS: ID header
            + page(0x00, granule_end // 2, 1, b"\x00" * 32)
            + page(0x04, granule_end, 2, b"\x00" * 16))  # EOS
