"""Foreign (libwebp-encoded) lossy WebP interop tests.

The reference decodes lossy WebP via cv2 -> libwebp
(/root/reference/src/img2table/document/image.py:25-32).  Round 4
transcribed the RFC 6386 tables (imgops/vp8_tables.py) and aligned the
decoder's border prediction, loop-filter order and YUV->RGB pipeline to
libwebp; these tests pin that parity:

1. Hermetic: fixtures under tests/data/vp8_interop/ were encoded AND
   decoded by real libwebp (tests/tools/webp_oracle.py) — our decoder
   must reproduce libwebp's RGB output bit-exactly.
2. Live (skipped when libwebp.so is absent): fresh random images through
   libwebp's encoder in both directions, YUV planes and RGB.
"""

from __future__ import annotations

import os
import sys

import numpy as np
import pytest

from img2table_ray.imgops.vp8 import decode_vp8, encode_vp8
from img2table_ray.imgops.webp import decode_webp

DATA = os.path.join(os.path.dirname(__file__), "data", "vp8_interop")
TOOLS = os.path.join(os.path.dirname(__file__), "tools")

FIXTURES = [
    ("a48x64_q75", (48, 64)),
    ("b33x49_q90", (33, 49)),   # odd dims: partial edge MBs
    ("c120x104_q50", (120, 104)),
]


def _vp8_payload(data: bytes) -> bytes:
    i = 12
    while i < len(data):
        tag = data[i : i + 4]
        n = int.from_bytes(data[i + 4 : i + 8], "little")
        if tag == b"VP8 ":
            return data[i + 8 : i + 8 + n]
        i += 8 + n + (n & 1)
    raise ValueError("no VP8 chunk")


@pytest.mark.parametrize("name,shape", FIXTURES)
def test_foreign_decode_matches_libwebp_golden(name, shape):
    data = open(os.path.join(DATA, name + ".webp"), "rb").read()
    h, w = shape
    golden = np.frombuffer(
        open(os.path.join(DATA, name + ".rgb"), "rb").read(),
        np.uint8).reshape(h, w, 3)
    # through the container API (the gate is gone) and the raw payload
    assert np.array_equal(decode_webp(data), golden)
    assert np.array_equal(decode_vp8(_vp8_payload(data)), golden)


def _oracle():
    if not os.path.exists("/usr/lib/x86_64-linux-gnu/libwebp.so.7"):
        pytest.skip("no libwebp: hermetic fixtures cover this")
    sys.path.insert(0, TOOLS)
    import webp_oracle

    return webp_oracle


def test_live_foreign_decode_yuv_and_rgb():
    wo = _oracle()
    rng = np.random.RandomState(123)
    # (120, 200, 60) pinned a loop-filter ordering bug a column-batched
    # variant introduced — keep it in the matrix
    for h, w, q in [(48, 64, 75), (33, 49, 20), (96, 80, 95), (16, 16, 50),
                    (120, 200, 60)]:
        img = rng.randint(0, 256, (h, w, 3)).astype(np.uint8)
        img[h // 3 : 2 * h // 3, : w // 2] = (30, 200, 120)
        data = wo.enc(img, float(q))
        ly, lu, lv = wo.dec_yuv(data)
        my, mu, mv = decode_vp8(_vp8_payload(data), yuv=True)
        assert np.array_equal(my, ly), (h, w, q, "Y")
        assert np.array_equal(mu, lu), (h, w, q, "U")
        assert np.array_equal(mv, lv), (h, w, q, "V")
        assert np.array_equal(decode_vp8(_vp8_payload(data)),
                              wo.dec_rgb(data)), (h, w, q, "RGB")


def test_live_libwebp_decodes_our_encoder():
    """Reverse direction: libwebp must reconstruct our encoder's streams
    exactly as our own decoder does (loop filter on, both mode kinds)."""
    wo = _oracle()
    rng = np.random.RandomState(321)
    img = rng.randint(0, 256, (48, 64, 3)).astype(np.uint8)
    img[10:38, 8:56] = (200, 60, 90)
    for q, bpred, fl in [(40, False, 20), (40, True, 40), (70, False, 0)]:
        stream, _ = encode_vp8(img, qindex=q, use_bpred=bpred,
                               filter_level=fl)
        ly, lu, lv = wo.dec_yuv(wo.wrap_vp8(stream))
        my, mu, mv = decode_vp8(stream, yuv=True)
        assert np.array_equal(my, ly) and np.array_equal(mu, lu) \
            and np.array_equal(mv, lv), (q, bpred, fl)
