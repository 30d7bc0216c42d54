"""WebP VP8L (lossless) codec tests.

No imaging libraries exist in this container, so correctness rests on
(a) spec-structure invariants (the regenerated 120-entry distance map,
container framing) and (b) encoder/decoder round-trips where the two
sides share only the spec: the encoder emits real canonical-Huffman
streams (incl. the code-length code), run-LZ77, color cache, and all
four transform headers; the decoder is an independent table-driven
reader.  The reference consumes WebP via cv2.imdecode
(/root/reference/src/img2table/document/image.py:25-32).
"""

import numpy as np
import pytest

from img2table_ray.imgops.webp import (
    _DIST_MAP,
    WebpError,
    decode_webp,
    encode_webp_lossless,
)


def test_distance_map_spec_invariants():
    # the spec's explicit table: 120 entries; starts (0,1),(1,0),(1,1),
    # (-1,1),(0,2),(2,0); dist-1 (pixel to the left) is entry index 1
    assert len(_DIST_MAP) == 120
    assert _DIST_MAP[:6] == [(0, 1), (1, 0), (1, 1), (-1, 1), (0, 2), (2, 0)]
    assert _DIST_MAP[1] == (1, 0)
    assert _DIST_MAP[-1] == (8, 7)
    assert len(set(_DIST_MAP)) == 120


def test_plain_literals_roundtrip():
    rng = np.random.default_rng(5)
    for shape in [(9, 13, 3), (1, 1, 3), (2, 300, 3)]:
        a = rng.integers(0, 256, shape, dtype=np.uint8)
        assert np.array_equal(decode_webp(encode_webp_lossless(
            a, run_lz77=False)), a)


def test_lz77_and_color_cache():
    rng = np.random.default_rng(6)
    b = np.zeros((24, 31, 3), np.uint8)
    b[5:12, 4:20] = 200
    b[:, 2] = 7
    assert np.array_equal(decode_webp(encode_webp_lossless(b, run_lz77=True)),
                          b)
    c = rng.integers(0, 4, (16, 17, 3), dtype=np.uint8) * 60
    for bits in (1, 4, 8):
        assert np.array_equal(
            decode_webp(encode_webp_lossless(c, cache_bits=bits,
                                             run_lz77=True)), c), bits


@pytest.mark.parametrize("mode", list(range(14)))
def test_predictor_modes(mode):
    rng = np.random.default_rng(7)
    d = rng.integers(0, 256, (11, 15, 3), dtype=np.uint8)
    assert np.array_equal(
        decode_webp(encode_webp_lossless(d, predictor_mode=mode,
                                         run_lz77=False)), d)


def test_subtract_green_and_color_transform():
    rng = np.random.default_rng(8)
    d = rng.integers(0, 256, (11, 15, 3), dtype=np.uint8)
    assert np.array_equal(
        decode_webp(encode_webp_lossless(d, subtract_green=True,
                                         run_lz77=False)), d)
    for ct in [(0, 0, 0), (13, 250, 7), (128, 99, 200)]:
        assert np.array_equal(
            decode_webp(encode_webp_lossless(d, color_transform=ct,
                                             run_lz77=False)), d), ct


def test_palette_all_packing_widths():
    rng = np.random.default_rng(9)
    for ncol, shape in [(37, (13, 19)), (11, (9, 22)), (3, (8, 21)),
                        (2, (5, 33))]:
        vals = rng.integers(0, 256, (ncol, 3), dtype=np.uint8)
        e = vals[rng.integers(0, ncol, shape)]
        assert np.array_equal(
            decode_webp(encode_webp_lossless(e, palette=True,
                                             run_lz77=False)), e), ncol


def test_combined_transforms_gray():
    rng = np.random.default_rng(10)
    g = rng.integers(0, 256, (14, 10), dtype=np.uint8)
    got = decode_webp(encode_webp_lossless(
        g, subtract_green=True, predictor_mode=11, run_lz77=True))
    assert np.array_equal(got, np.repeat(g[:, :, None], 3, axis=2))


def test_synth_page_through_decode_image():
    from img2table_ray.imgops.png import decode_image
    from img2table_ray.sources.pages import synth_table_image

    sp, _ = synth_table_image(4, 2, 3)
    enc = encode_webp_lossless(sp, subtract_green=True, run_lz77=True)
    assert np.array_equal(decode_image(enc),
                          np.repeat(sp[:, :, None], 3, axis=2))


def test_lossy_and_corrupt_raise():
    # foreign lossy VP8 decodes for real since round 4 (libwebp-pinned,
    # test_vp8_interop.py); GARBAGE payloads still fail loud
    with pytest.raises(WebpError, match="lossy"):
        decode_webp(b"RIFF\x10\x00\x00\x00WEBPVP8 \x04\x00\x00\x00\x00\x00\x00\x00")
    with pytest.raises(WebpError):
        decode_webp(b"RIFF\x04\x00\x00\x00WEBP")  # no image chunk
    with pytest.raises(WebpError):
        decode_webp(b"NOPE")
    # truncated VP8L payload
    good = encode_webp_lossless(np.full((8, 8), 77, np.uint8))
    with pytest.raises(WebpError):
        decode_webp(good[:24] + b"\x00")
