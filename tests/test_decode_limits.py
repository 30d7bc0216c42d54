"""A corrupt header declaring absurd dimensions must raise (an error-row
path) BEFORE any dimension-derived allocation — an OOM-killed worker
fails its whole task and Ray's retry turns one poison document into a
stalled partition, which an error row never does (imgops/limits.py)."""

from __future__ import annotations

import struct
import zlib

import numpy as np
import pytest

from img2table_ray.imgops.limits import MAX_PIXELS, DecodeLimitError, check_dims
from img2table_ray.imgops.png import decode_image


def _chunk(ctype: bytes, payload: bytes) -> bytes:
    return (struct.pack(">I", len(payload)) + ctype + payload
            + struct.pack(">I", zlib.crc32(ctype + payload)))


def test_check_dims_bounds():
    check_dims(16383, 16383)  # full VP8/VP8L coordinate space stays legal
    with pytest.raises(DecodeLimitError):
        check_dims(0, 100)
    with pytest.raises(DecodeLimitError):
        check_dims(100, -1)
    with pytest.raises(DecodeLimitError):
        check_dims(1 << 14, 1 << 14 + 1)


def test_png_huge_ihdr_rejected():
    ihdr = struct.pack(">IIBBBBB", 1 << 20, 1 << 20, 8, 2, 0, 0, 0)
    data = b"\x89PNG\r\n\x1a\n" + _chunk(b"IHDR", ihdr) + _chunk(b"IEND", b"")
    with pytest.raises(DecodeLimitError):
        decode_image(data)


def test_bmp_huge_dims_rejected():
    hdr = bytearray(54)
    hdr[0:2] = b"BM"
    hdr[10:14] = struct.pack("<I", 54)
    hdr[14:18] = struct.pack("<I", 40)
    hdr[18:26] = struct.pack("<ii", 100_000, 100_000)
    hdr[26:28] = struct.pack("<H", 1)
    hdr[28:30] = struct.pack("<H", 24)
    with pytest.raises(DecodeLimitError):
        decode_image(bytes(hdr))


def test_jpeg_huge_sof_rejected():
    sof = struct.pack(">BHHB", 8, 65535, 65535, 1) + bytes([1, 0x11, 0])
    data = (b"\xff\xd8\xff\xc0" + struct.pack(">H", 2 + len(sof)) + sof
            + b"\xff\xd9")
    with pytest.raises(DecodeLimitError):
        decode_image(data)


def test_gif_huge_screen_rejected():
    data = b"GIF89a" + struct.pack("<HHBBB", 65535, 65535, 0, 0, 0) + b"\x3b"
    with pytest.raises(DecodeLimitError):
        decode_image(data)


def test_tiff_huge_dims_rejected():
    # minimal little-endian TIFF: IFD with ImageWidth/ImageLength = 2^20
    def entry(tag, typ, val):
        return struct.pack("<HHI", tag, typ, 1) + struct.pack("<I", val)

    ifd = struct.pack("<H", 4)
    ifd += entry(256, 4, 1 << 20)   # ImageWidth
    ifd += entry(257, 4, 1 << 20)   # ImageLength
    ifd += entry(262, 3, 1)         # Photometric
    ifd += entry(277, 3, 1)         # SamplesPerPixel
    ifd += struct.pack("<I", 0)
    data = b"II*\x00" + struct.pack("<I", 8) + ifd
    with pytest.raises(DecodeLimitError):
        decode_image(data)


def test_limit_is_an_error_row_not_a_task_failure():
    # the stages' error-row contract catches DecodeLimitError like any
    # other corrupt-payload error: the batch still succeeds with a
    # width=-1 row instead of killing the worker
    import pyarrow as pa

    from img2table_ray.pipelines.multimodal import ImageFeatureStage

    bad = b"GIF89a" + struct.pack("<HHBBB", 65535, 65535, 0, 0, 0) + b"\x3b"
    out = ImageFeatureStage()(
        pa.table({"url": ["https://x/poison.gif"], "html": [bad]})
    )
    assert out.num_rows == 1
    assert out["width"].to_pylist() == [-1]


def test_bounded_decompress_truncates_at_expected():
    from img2table_ray.imgops.limits import bounded_decompress

    payload = zlib.compress(b"x" * 1_000_000)
    out = bounded_decompress(payload, expected=1024)
    assert out == b"x" * 1024  # bomb tail never materializes


def test_bounded_decompress_caps_unsized_streams():
    import zlib as z

    from img2table_ray.imgops.limits import (MAX_STREAM_BYTES,
                                             bounded_decompress)

    ok = z.compress(b"y" * 4096)
    assert bounded_decompress(ok) == b"y" * 4096

    co = z.compressobj()
    chunks = [co.compress(b"\x00" * (1 << 20)) for _ in range((MAX_STREAM_BYTES >> 20) + 2)]
    chunks.append(co.flush())
    bomb = b"".join(chunks)
    with pytest.raises(DecodeLimitError):
        bounded_decompress(bomb)


def test_png_deflate_bomb_is_bounded():
    # tiny PNG dims but IDAT that inflates to 100 MB: decode must not
    # materialize the bomb; it fails the normal way or succeeds on the
    # expected prefix, never allocating the tail
    ihdr = struct.pack(">IIBBBBB", 4, 4, 8, 2, 0, 0, 0)
    bomb = zlib.compress(b"\x00" * (100 << 20))
    data = (b"\x89PNG\r\n\x1a\n" + _chunk(b"IHDR", ihdr)
            + _chunk(b"IDAT", bomb) + _chunk(b"IEND", b""))
    img = decode_image(data)  # first 4x(4*3+1) bytes are valid zero scanlines
    assert img.shape == (4, 4, 3)
    assert not img.any()
