"""Ogg container: Vorbis/Opus metadata walk + REAL Ogg-FLAC decode.

Implemented from the public Ogg framing spec (RFC 3533), the Vorbis I /
Opus (RFC 7845) identification headers, and the Xiph FLAC-to-Ogg
mapping: the first page of the stream carries channels + sample rate;
the last page's granule position is the total PCM sample count (Opus
granules run at a fixed 48 kHz and subtract the ID header's pre-skip).
Vorbis/Opus payload decode (MDCT/CELT) genuinely needs a codec, so
those stay ``metadata_only``; Ogg-FLAC however reassembles into a
native FLAC stream (``ogg_flac_to_native``) that the in-repo
``imgops/flac.py`` decodes losslessly.  Feeds
``pipelines/multimodal.py:AudioFeatureStage``.  ``synth_ogg`` /
``synth_ogg_flac`` build minimal valid fixtures (correct page CRCs).

Scale shape: the metadata walk hops page headers using the segment
table — O(pages); Ogg-FLAC reassembly is one concatenation pass.
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
            elif head[:5] == b"\x7fFLAC" and len(head) >= 51 \
                    and head[9:13] == b"fLaC":
                # FLAC-to-Ogg mapping: STREAMINFO follows the 9-byte
                # prefix; rate/channels live at fixed bit offsets
                codec = "flac"
                si = head[17:51]
                rate = (si[10] << 12) | (si[11] << 4) | (si[12] >> 4)
                channels = ((si[12] >> 1) & 7) + 1
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


# --- FLAC-to-Ogg mapping (round 5) ----------------------------------------
#
# Per the public Xiph mapping: the BOS packet is 0x7F 'FLAC' major minor
# + a 16-bit big-endian count of following header packets + a literal
# native FLAC signature ('fLaC' + STREAMINFO); later header packets are
# metadata blocks; every audio packet is raw FLAC frame bytes.  Since
# the in-repo decoder (imgops/flac.py) consumes native streams, Ogg-FLAC
# decodes by REASSEMBLING the native stream: strip the prefix, force the
# STREAMINFO last-metadata flag, concatenate the audio packets.


def _packets(data: bytes):
    """Yield reassembled packets of the FIRST logical stream, honoring
    255-lacing continuation across pages (RFC 3533 framing)."""
    serial0 = None
    cur = bytearray()
    pos = 0
    n = len(data)
    while pos + 27 <= n:
        if data[pos : pos + 4] != b"OggS":
            nxt = data.find(b"OggS", pos + 1)
            if nxt < 0:
                break
            pos = nxt
            continue
        serial = struct.unpack("<I", data[pos + 14 : pos + 18])[0]
        nseg = data[pos + 26]
        segs = data[pos + 27 : pos + 27 + nseg]
        body = pos + 27 + nseg
        if serial0 is None:
            serial0 = serial
        if serial == serial0:
            off = body
            for lace in segs:
                cur += data[off : off + lace]
                off += lace
                if lace < 255:  # a lacing < 255 terminates the packet
                    yield bytes(cur)
                    cur.clear()
        pos = body + sum(segs)
    # an unterminated trailing packet is dropped, per the framing spec


def ogg_flac_to_native(data: bytes) -> bytes:
    """Ogg-FLAC bytes -> native FLAC stream bytes for decode_flac.

    Raises ValueError when the stream is not Ogg-FLAC (callers fall back
    to the Vorbis/Opus metadata walk)."""
    if data[:4] != b"OggS":
        raise ValueError("not an Ogg stream")
    pkts = _packets(data)
    first = next(pkts, None)
    if first is None or first[:5] != b"\x7fFLAC" or first[9:13] != b"fLaC":
        raise ValueError("not an Ogg-FLAC stream")
    n_headers = struct.unpack(">H", first[7:9])[0]
    native = bytearray(first[9:])
    if len(native) < 42:
        raise ValueError("truncated Ogg-FLAC BOS packet")
    # the reassembled stream carries only STREAMINFO: force its
    # last-metadata-block flag (later header packets are skipped below)
    native[4] |= 0x80
    skipped = 0
    for pkt in pkts:
        if skipped < n_headers:
            skipped += 1
            continue
        if n_headers == 0 and pkt and (pkt[0] & 0x7F) != 0x7F and \
                pkt[0] != 0xFF:
            continue  # unknown header count: skip metadata-block packets
        native += pkt
    return bytes(native)


def synth_ogg_flac(samples: "np.ndarray", rate: int, seed: int) -> bytes:
    """Wrap encode_flac output into Ogg-FLAC fixture pages: BOS packet
    with the mapping prefix, one vorbis-comment header packet, and the
    frame bytes as one audio packet SPLIT ACROSS PAGES with 255-lacing
    continuation (exercising the reassembly path).  The single audio
    packet spans all frames — a shortcut from the one-frame-per-packet
    mapping that reassembles identically."""
    from img2table_ray.imgops.flac import encode_flac

    native = encode_flac(samples, rate, blocksize=1024)
    hdr, frames = native[:42], native[42:]
    serial = 0x5F1A + seed

    def page(htype: int, granule: int, seq: int, chunk: bytes,
             open_end: bool) -> bytes:
        segs = []
        rest = len(chunk)
        while rest >= 255:
            segs.append(255)
            rest -= 255
        if not open_end:
            segs.append(rest)  # terminal lacing < 255 (possibly 0)
        elif rest:
            raise ValueError("continued page payload must be 255-laced")
        h = (b"OggS\x00" + bytes([htype])
             + struct.pack("<qIIi", granule, serial, seq, 0)
             + bytes([len(segs)]) + bytes(segs))
        crc = ogg_crc(h + chunk)
        return h[:22] + struct.pack("<I", crc) + h[26:] + chunk

    bos_pkt = b"\x7fFLAC\x01\x00" + struct.pack(">H", 1) + bytearray(hdr)
    comment = b"\x84" + (12).to_bytes(3, "big") + struct.pack("<I", 4) \
        + b"img2" + struct.pack("<I", 0)
    out = page(0x02, 0, 0, bos_pkt, False)
    out += page(0x00, 0, 1, comment, False)
    # audio packet: first pages carry exact 255-multiples (continued),
    # the EOS page carries the remainder with the final granule
    n_granule = len(samples) if samples.ndim == 1 else samples.shape[0]
    cut = (len(frames) // 2) // 255 * 255
    seq = 2
    if cut:
        # granule -1: no packet ends on this page (continued packet)
        out += page(0x00, -1, seq, frames[:cut], True)
        seq += 1
        out += page(0x04 | 0x01, n_granule, seq, frames[cut:], False)
    else:
        out += page(0x04, n_granule, seq, frames, False)
    return out
