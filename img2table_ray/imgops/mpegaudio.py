"""MPEG audio (MP3) frame-header walk — container metadata, no decode.

Implemented from the public MPEG-1/2 audio frame header layout
(ISO/IEC 11172-3 / 13818-3): 11-bit sync, version, layer, bitrate and
sample-rate table indices, padding bit; frame lengths derived from the
published tables.  Skips a leading ID3v2 tag (syncsafe size) and a
trailing ID3v1 block.

Actually decoding Layer III audio needs the full Huffman/IMDCT/
polyphase stack — out of scope without a reference decoder to pin
against — but a 100 TB web-audio pipeline still wants duration /
bitrate / sample-rate distributions, and those live entirely in the
frame headers.  This feeds ``pipelines/multimodal.py:
AudioFeatureStage`` as the ``metadata_only`` path: real numbers from
the real container, PCM stats explicitly absent.  ``synth_mp3``
builds deterministic fixtures (valid headers, zeroed payloads).

Scale shape: the walk reads 4 header bytes then SKIPS each payload —
O(frames), never O(bytes decoded).
"""

from __future__ import annotations

import struct

# bitrate kbps tables [version][layer] per the spec; 0 = free, None = bad
_BITRATES_V1 = {
    1: [0, 32, 64, 96, 128, 160, 192, 224, 256, 288, 320, 352, 384, 416, 448],
    2: [0, 32, 48, 56, 64, 80, 96, 112, 128, 160, 192, 224, 256, 320, 384],
    3: [0, 32, 40, 48, 56, 64, 80, 96, 112, 128, 160, 192, 224, 256, 320],
}
_BITRATES_V2 = {
    1: [0, 32, 48, 56, 64, 80, 96, 112, 128, 144, 160, 176, 192, 224, 256],
    2: [0, 8, 16, 24, 32, 40, 48, 56, 64, 80, 96, 112, 128, 144, 160],
    3: [0, 8, 16, 24, 32, 40, 48, 56, 64, 80, 96, 112, 128, 144, 160],
}
_RATES = {3: [44100, 48000, 32000],   # MPEG1
          2: [22050, 24000, 16000],   # MPEG2
          0: [11025, 12000, 8000]}    # MPEG2.5


def _frame_at(data: bytes, pos: int):
    """Parse a frame header at pos -> (frame_bytes, samples, rate,
    bitrate_kbps, channels) or None if not a valid header."""
    if pos + 4 > len(data):
        return None
    h = struct.unpack(">I", data[pos : pos + 4])[0]
    if (h >> 21) & 0x7FF != 0x7FF:
        return None
    ver = (h >> 19) & 3          # 0=2.5, 1=reserved, 2=MPEG2, 3=MPEG1
    layer_code = (h >> 17) & 3   # 1=III, 2=II, 3=I
    br_idx = (h >> 12) & 0xF
    sr_idx = (h >> 10) & 3
    pad = (h >> 9) & 1
    mode = (h >> 6) & 3
    if ver == 1 or layer_code == 0 or br_idx in (0, 15) or sr_idx == 3:
        return None
    layer = 4 - layer_code       # 1=Layer I, 2=II, 3=III
    table = _BITRATES_V1 if ver == 3 else _BITRATES_V2
    kbps = table[layer][br_idx]
    rate = _RATES[ver][sr_idx]
    if layer == 1:
        nbytes = (12000 * kbps // rate + pad) * 4
        samples = 384
    else:
        samples = 1152 if (layer == 2 or ver == 3) else 576
        nbytes = samples // 8 * 1000 * kbps // rate + pad
    channels = 1 if mode == 3 else 2
    return nbytes, samples, rate, kbps, channels


def parse_mp3(data: bytes) -> dict:
    """Walk every frame -> {duration_s, sample_rate, bitrate_kbps
    (mean), n_frames, channels}.  Raises ValueError when no coherent
    frame sequence exists (>= 2 consecutive valid frames required)."""
    pos = 0
    if data[:3] == b"ID3" and len(data) >= 10:  # ID3v2: syncsafe size
        sz = ((data[6] & 0x7F) << 21) | ((data[7] & 0x7F) << 14) \
            | ((data[8] & 0x7F) << 7) | (data[9] & 0x7F)
        pos = 10 + sz
    end = len(data)
    if end >= 128 and data[end - 128 : end - 125] == b"TAG":  # ID3v1
        end -= 128
    # resync: find the first position where two consecutive frames parse
    start = None
    scan = pos
    while scan + 4 <= end:
        f = _frame_at(data, scan)
        if f and (scan + f[0] >= end or _frame_at(data, scan + f[0])):
            start = scan
            break
        scan += 1
    if start is None:
        raise ValueError("no MPEG audio frames found")
    n_frames = 0
    total_samples = 0
    kbps_sum = 0
    rate = channels = None
    pos = start
    while pos + 4 <= end:
        f = _frame_at(data, pos)
        if f is None:
            break
        nbytes, samples, r, kbps, ch = f
        if rate is None:
            rate, channels = r, ch
        n_frames += 1
        total_samples += samples
        kbps_sum += kbps
        pos += max(nbytes, 4)
    if n_frames == 0 or not rate:
        raise ValueError("no MPEG audio frames found")
    return {
        "duration_s": round(total_samples / rate, 3),
        "sample_rate": rate,
        "bitrate_kbps": round(kbps_sum / n_frames, 1),
        "n_frames": n_frames,
        "channels": channels,
    }


def synth_mp3(seed: int) -> bytes:
    """Deterministic MP3 METADATA fixture: a run of valid MPEG-1
    Layer III frame headers with zeroed payloads (not decodable audio,
    exactly the metadata_only contract), optional ID3v2/ID3v1 tags."""
    br_idx = 9 + seed % 5          # 128..192 kbps region
    sr_idx = seed % 3
    rate = _RATES[3][sr_idx]
    kbps = _BITRATES_V1[3][br_idx]
    n_frames = 20 + (seed % 7) * 10
    out = bytearray()
    if seed % 2:  # ID3v2 tag with 32 bytes of padding
        out += b"ID3\x04\x00\x00" + bytes([0, 0, 0, 32]) + b"\x00" * 32
    for i in range(n_frames):
        pad = (seed + i) % 2
        h = (0x7FF << 21) | (3 << 19) | (1 << 17) | (1 << 16) \
            | (br_idx << 12) | (sr_idx << 10) | (pad << 9) | (1 << 6)
        nbytes = 144000 * kbps // rate + pad
        out += struct.pack(">I", h) + b"\x00" * (nbytes - 4)
    if seed % 3 == 0:
        out += b"TAG" + b"\x00" * 125  # ID3v1
    return bytes(out)
