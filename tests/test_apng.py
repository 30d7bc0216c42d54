"""APNG decode/compositing goldens (round 5).

The compositor is verified against an independent per-pixel reference
implementation of the spec's blend/dispose rules, plus hand-built chunk
streams for the default-image and sequence-error cases.
"""

from __future__ import annotations

import struct
import zlib

import numpy as np
import pytest

from img2table_ray.imgops.apng import (BLEND_OVER, BLEND_SOURCE,
                                       DISPOSE_BACKGROUND, DISPOSE_NONE,
                                       DISPOSE_PREVIOUS, apng_frames,
                                       encode_apng, is_apng)
from img2table_ray.imgops.png import PngError, encode_png


def rgba(r, g, b, a, h=8, w=8):
    img = np.zeros((h, w, 4), np.uint8)
    img[:] = (r, g, b, a)
    return img


def ref_composite(canvas_size, frames):
    """Independent scalar reference: spec blend/dispose per pixel."""
    cw, ch = canvas_size
    canvas = np.zeros((ch, cw, 4), np.float64)  # non-premultiplied, 0-255
    out = []
    for i, f in enumerate(frames):
        img = f["img"].astype(np.float64)
        x, y = f.get("x", 0), f.get("y", 0)
        h, w, _ = img.shape
        saved = canvas[y : y + h, x : x + w].copy()
        for yy in range(h):
            for xx in range(w):
                src = img[yy, xx]
                dst = canvas[y + yy, x + xx]
                if f.get("blend", BLEND_SOURCE) == BLEND_OVER:
                    sa, da = src[3] / 255.0, dst[3] / 255.0
                    oa = sa + da * (1 - sa)
                    if oa > 0:
                        rgbv = (src[:3] * sa + dst[:3] * da * (1 - sa)) / oa
                    else:
                        rgbv = np.zeros(3)
                    canvas[y + yy, x + xx, :3] = np.floor(rgbv + 0.5)
                    canvas[y + yy, x + xx, 3] = np.floor(oa * 255 + 0.5)
                else:
                    canvas[y + yy, x + xx] = src
        shown = canvas.astype(np.uint16)
        a = shown[:, :, 3:4]
        out.append((shown[:, :, :3] * a // 255).astype(np.uint8))
        dop = f.get("dispose", DISPOSE_NONE)
        if dop == DISPOSE_BACKGROUND or (dop == DISPOSE_PREVIOUS and i == 0):
            canvas[y : y + h, x : x + w] = 0
        elif dop == DISPOSE_PREVIOUS:
            canvas[y : y + h, x : x + w] = saved
    return out


def test_full_frame_source_roundtrip():
    f0 = rgba(200, 10, 30, 255)
    f1 = rgba(5, 120, 60, 255)
    data = encode_apng((8, 8), [{"img": f0}, {"img": f1, "delay": (1, 4)}])
    assert is_apng(data)
    frames, delays = apng_frames(data)
    assert len(frames) == 2
    np.testing.assert_array_equal(frames[0], f0[:, :, :3])
    np.testing.assert_array_equal(frames[1], f1[:, :, :3])
    assert delays == [0.1, 0.25]


def test_subregion_offsets_accumulate():
    f0 = rgba(100, 100, 100, 255, 8, 8)
    patch = rgba(255, 0, 0, 255, 2, 3)
    data = encode_apng((8, 8), [
        {"img": f0},
        {"img": patch, "x": 5, "y": 6, "dispose": DISPOSE_NONE},
    ])
    frames, _ = apng_frames(data)
    expect = f0[:, :, :3].copy()
    expect[6:8, 5:8] = (255, 0, 0)
    np.testing.assert_array_equal(frames[1], expect)


def test_dispose_background_and_previous():
    base = rgba(10, 20, 30, 255, 8, 8)
    red = rgba(255, 0, 0, 255, 4, 4)
    green = rgba(0, 255, 0, 255, 8, 8)
    specs = [
        {"img": base},
        {"img": red, "x": 2, "y": 2, "dispose": DISPOSE_BACKGROUND},
        {"img": red, "x": 0, "y": 0, "dispose": DISPOSE_PREVIOUS},
        {"img": green},
    ]
    frames, _ = apng_frames(encode_apng((8, 8), specs))
    want = ref_composite((8, 8), specs)
    for got, expect in zip(frames, want):
        np.testing.assert_array_equal(got, expect)
    # frame 2's canvas must show the BACKGROUND-cleared hole from frame 1
    assert (frames[2][6, 6] == (10, 20, 30)).all()  # untouched base
    assert (frames[2][5, 5] == (0, 0, 0)).all()     # cleared, uncovered
    assert (frames[2][1, 1] == (255, 0, 0)).all()   # frame 2's patch


def test_blend_over_matches_reference():
    rng = np.random.RandomState(7)
    base = rng.randint(0, 256, (8, 8, 4)).astype(np.uint8)
    base[:, :, 3] = 255
    overlay = rng.randint(0, 256, (5, 6, 4)).astype(np.uint8)  # random alpha
    specs = [
        {"img": base},
        {"img": overlay, "x": 1, "y": 2, "blend": BLEND_OVER},
    ]
    frames, _ = apng_frames(encode_apng((8, 8), specs))
    want = ref_composite((8, 8), specs)
    np.testing.assert_array_equal(frames[0], want[0])
    np.testing.assert_array_equal(frames[1], want[1])


def _chunk(ctype: bytes, payload: bytes) -> bytes:
    return (struct.pack(">I", len(payload)) + ctype + payload
            + struct.pack(">I", zlib.crc32(ctype + payload) & 0xFFFFFFFF))


def _filtered_rgba(img: np.ndarray) -> bytes:
    h, w, c = img.shape
    raw = np.concatenate([np.zeros((h, 1), np.uint8),
                          img.reshape(h, w * c)], axis=1)
    return zlib.compress(raw.tobytes())


def test_default_image_not_in_animation():
    # IDAT with NO preceding fcTL = still default image; the single
    # animation frame comes from fdAT.
    sig = b"\x89PNG\r\n\x1a\n"
    still = rgba(9, 9, 9, 255, 4, 4)
    frame = rgba(200, 50, 25, 255, 4, 4)
    data = (
        sig
        + _chunk(b"IHDR", struct.pack(">IIBBBBB", 4, 4, 8, 6, 0, 0, 0))
        + _chunk(b"acTL", struct.pack(">II", 1, 0))
        + _chunk(b"IDAT", _filtered_rgba(still))
        + _chunk(b"fcTL", struct.pack(">IIIIIHHBB", 0, 4, 4, 0, 0,
                                      1, 10, 0, 0))
        + _chunk(b"fdAT", struct.pack(">I", 1) + _filtered_rgba(frame))
        + _chunk(b"IEND", b"")
    )
    assert is_apng(data)
    frames, delays = apng_frames(data)
    assert len(frames) == 1
    np.testing.assert_array_equal(frames[0], frame[:, :, :3])


def test_sequence_gap_raises():
    good = encode_apng((4, 4), [{"img": rgba(1, 2, 3, 255, 4, 4)},
                                {"img": rgba(4, 5, 6, 255, 4, 4)}])
    # corrupt the fdAT sequence number (locate the fdAT tag, bump seq)
    i = good.find(b"fdAT")
    bad = bytearray(good)
    bad[i + 7] ^= 0x05
    with pytest.raises(PngError):
        apng_frames(bytes(bad))


def test_max_frames_caps_instead_of_raising():
    specs = [{"img": rgba(i, i, i, 255, 4, 4)} for i in range(6)]
    frames, delays = apng_frames(encode_apng((4, 4), specs), max_frames=3)
    assert len(frames) == 3 and len(delays) == 3
    np.testing.assert_array_equal(frames[2], rgba(2, 2, 2, 255, 4, 4)[:, :, :3])


def test_plain_png_is_not_apng():
    still = encode_png(np.zeros((4, 4, 3), np.uint8))
    assert not is_apng(still)
    with pytest.raises(PngError):
        apng_frames(still)


def test_video_stage_samples_apng():
    from img2table_ray.imgops.apng import apng_frames as dec
    from img2table_ray.pipelines.multimodal import (VideoFrameSampleStage,
                                                    synth_apng)

    seed = 9
    blob = synth_apng(seed)
    frames, delays = dec(blob)
    assert len(frames) == 6 + seed % 5
    st = VideoFrameSampleStage(n_samples=3)
    d, f, nf, lumas = st._decode(blob)
    assert nf == len(frames)
    assert d == round(sum(delays), 3)
    assert len(lumas) == 3
    img0 = frames[0].astype(np.float64)
    y0 = (0.299 * img0[..., 0] + 0.587 * img0[..., 1]
          + 0.114 * img0[..., 2]) / 255.0
    assert lumas[0] == round(float(y0.mean()), 6)
    # a still PNG payload is not a video: counted unsupported, not error
    with pytest.raises(NotImplementedError):
        st._decode(encode_png(np.zeros((4, 4, 3), np.uint8)))
