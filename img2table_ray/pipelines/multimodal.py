"""Multimodal binary-column stages (charter item): treat image/audio/video
as opaque ``binary`` columns with typed metadata; decode / feature-extract
/ resize run as actor-pool ``map_batches`` stages.

Image stages (features + resize/thumbnail) are REAL — the pure-numpy
codecs decode PNG/BMP/JPEG (baseline and progressive).  Audio/video
decoding has no library in this container, so those stages are
clearly-marked STUBS: the actor signature, batch schema and output layout
are real and tested; ``decode`` raises ``NotImplementedError`` unless the
deterministic-fake mode is enabled (hash-derived features, useful for
exercising the plumbing end-to-end).
"""

from __future__ import annotations

import hashlib

import numpy as np
import pyarrow as pa
import ray.data

from img2table_ray.stages.util import actor_concurrency


class ImageFeatureStage:
    """Actor-pool stage: decode image bytes -> typed metadata + cheap
    features (REAL path).  binary -> (width, height, mean_luma, edge_density)."""

    def __init__(self) -> None:
        self._cache: dict = {}

    def __call__(self, batch: pa.Table) -> pa.Table:
        from img2table_ray.extract.pdf import sniff_kind
        from img2table_ray.imgops.kernels import laplacian3_abs, rgb2gray
        from img2table_ray.imgops.png import decode_image

        urls, kinds, widths, heights, lumas, edges = [], [], [], [], [], []
        for url, data in zip(batch["url"].to_pylist(), batch["html"].to_pylist()):
            kind = sniff_kind(data[:8])
            key = hashlib.md5(data).digest()
            feat = self._cache.get(key)
            if feat is None:
                try:
                    img = decode_image(data)
                    gray = rgb2gray(img)
                    edge = laplacian3_abs(gray)
                    feat = (kind, img.shape[1], img.shape[0],
                            round(float(gray.mean()), 4),
                            round(float((edge > 64).mean()), 6))
                except Exception:
                    feat = (kind, -1, -1, None, None)
                if len(self._cache) < 256:
                    self._cache[key] = feat
            urls.append(url)
            kinds.append(feat[0])
            widths.append(feat[1])
            heights.append(feat[2])
            lumas.append(feat[3])
            edges.append(feat[4])
        return pa.table({
            "url": pa.array(urls, pa.string()),
            "kind": pa.array(kinds, pa.string()),
            "width": pa.array(widths, pa.int32()),
            "height": pa.array(heights, pa.int32()),
            "mean_luma": pa.array(lumas, pa.float64()),
            "edge_density": pa.array(edges, pa.float64()),
        })


class AudioFeatureStage:
    """STUB actor-pool stage for audio binary columns.

    Real contract: ``__init__`` loads the codec/model once per actor;
    ``__call__`` decodes each ``binary`` payload and emits
    (duration_s, sample_rate, rms) per row.  No audio library ships in this
    container, so decode raises ``NotImplementedError`` unless
    ``deterministic_fake=True`` (features derived from md5 of the payload —
    stable across runs, exercises schema/batching/actor plumbing)."""

    def __init__(self, deterministic_fake: bool = False) -> None:
        self._fake = deterministic_fake

    def _decode(self, data: bytes) -> tuple[float, int, float]:
        if not self._fake:
            raise NotImplementedError(
                "no audio codec in this environment; construct the stage "
                "with deterministic_fake=True or install a decoder on workers"
            )
        h = hashlib.md5(data).digest()
        duration = round(1 + h[0] / 16, 3)
        sample_rate = 8000 * (1 + h[1] % 5)
        rms = round(h[2] / 255, 6)
        return duration, sample_rate, rms

    def __call__(self, batch: pa.Table) -> pa.Table:
        urls, durs, srs, rmss, status = [], [], [], [], []
        payload_col = "audio" if "audio" in batch.schema.names else "html"
        for url, data in zip(batch["url"].to_pylist(), batch[payload_col].to_pylist()):
            try:
                d, sr, r = self._decode(data)
                durs.append(d)
                srs.append(sr)
                rmss.append(r)
                status.append("ok")
            except NotImplementedError:
                durs.append(None)
                srs.append(None)
                rmss.append(None)
                status.append("unsupported")
            urls.append(url)
        return pa.table({
            "url": pa.array(urls, pa.string()),
            "duration_s": pa.array(durs, pa.float64()),
            "sample_rate": pa.array(srs, pa.int32()),
            "rms": pa.array(rmss, pa.float64()),
            "status": pa.array(status, pa.string()),
        })


def resize_bilinear(img: np.ndarray, out_w: int, out_h: int) -> np.ndarray:
    """Deterministic bilinear resize (REAL path, pure numpy): pixel-center
    sampling (src = (dst + 0.5) * scale - 0.5, clamped), float32 blend,
    round-half-even to uint8.  Documented semantics of its own — the
    reference never resizes, so no cv2 parity is claimed."""
    h, w = img.shape[:2]
    ys = np.clip((np.arange(out_h) + 0.5) * (h / out_h) - 0.5, 0, h - 1)
    xs = np.clip((np.arange(out_w) + 0.5) * (w / out_w) - 0.5, 0, w - 1)
    y0 = np.floor(ys).astype(np.int64)
    x0 = np.floor(xs).astype(np.int64)
    y1 = np.minimum(y0 + 1, h - 1)
    x1 = np.minimum(x0 + 1, w - 1)
    fy = (ys - y0).astype(np.float32)[:, None]
    fx = (xs - x0).astype(np.float32)[None, :]
    if img.ndim == 3:
        fy = fy[:, :, None]
        fx = fx[:, :, None]
    a = img[np.ix_(y0, x0)].astype(np.float32)
    b = img[np.ix_(y0, x1)].astype(np.float32)
    c = img[np.ix_(y1, x0)].astype(np.float32)
    d = img[np.ix_(y1, x1)].astype(np.float32)
    top = a + (b - a) * fx
    bot = c + (d - c) * fx
    return np.clip(np.rint(top + (bot - top) * fy), 0, 255).astype(np.uint8)


class ImageResizeStage:
    """Actor-pool stage (REAL path): decode image bytes -> fixed-size
    thumbnail re-encoded as PNG (the resize/normalize step of a multimodal
    training pipeline).  Output rows carry the thumbnail binary + original
    dims; undecodable payloads become error rows, never task failures."""

    def __init__(self, out_w: int = 64, out_h: int = 64) -> None:
        self._w = out_w
        self._h = out_h
        self._cache: dict = {}

    def __call__(self, batch: pa.Table) -> pa.Table:
        from img2table_ray.imgops.png import decode_image, encode_png

        urls, thumbs, ows, ohs, status = [], [], [], [], []
        for url, data in zip(batch["url"].to_pylist(), batch["html"].to_pylist()):
            key = hashlib.md5(data).digest()
            res = self._cache.get(key)
            if res is None:
                try:
                    img = decode_image(data)
                    thumb = resize_bilinear(img, self._w, self._h)
                    res = (encode_png(thumb), img.shape[1], img.shape[0], "ok")
                except Exception:
                    res = (None, -1, -1, "error")
                if len(self._cache) < 128:
                    self._cache[key] = res
            urls.append(url)
            thumbs.append(res[0])
            ows.append(res[1])
            ohs.append(res[2])
            status.append(res[3])
        return pa.table({
            "url": pa.array(urls, pa.string()),
            "thumbnail_png": pa.array(thumbs, pa.binary()),
            "orig_width": pa.array(ows, pa.int32()),
            "orig_height": pa.array(ohs, pa.int32()),
            "status": pa.array(status, pa.string()),
        })


class VideoFrameSampleStage:
    """STUB actor-pool stage for video binary columns: frame sampling.

    Real contract: ``__init__`` opens the demuxer/codec once per actor;
    ``__call__`` demuxes each ``binary`` payload, samples ``n_samples``
    frames at evenly spaced timestamps, and emits per-row typed metadata
    (duration, fps, n_frames) plus the sampled frames' mean lumas (the
    downstream embedding/quality stages consume those).  No video library
    ships in this container, so decode raises ``NotImplementedError``
    unless ``deterministic_fake=True`` (md5-derived values — stable,
    exercises schema/batching/actor plumbing end-to-end).  Batch size must
    stay SMALL for real video payloads (one clip can be tens of MB)."""

    def __init__(self, n_samples: int = 4, deterministic_fake: bool = False) -> None:
        self._n = n_samples
        self._fake = deterministic_fake

    def _decode(self, data: bytes):
        if not self._fake:
            raise NotImplementedError(
                "no video demuxer/codec in this environment; construct the "
                "stage with deterministic_fake=True or install one on workers"
            )
        h = hashlib.md5(data).digest()
        fps = float(24 + h[0] % 8)
        n_frames = 24 * (10 + h[1])
        duration = round(n_frames / fps, 3)
        lumas = [round(h[2 + i % 12] / 255, 6) for i in range(self._n)]
        return duration, fps, n_frames, lumas

    def __call__(self, batch: pa.Table) -> pa.Table:
        payload_col = "video" if "video" in batch.schema.names else "html"
        urls, durs, fpss, nfs, lumas, status = [], [], [], [], [], []
        for url, data in zip(batch["url"].to_pylist(),
                             batch[payload_col].to_pylist()):
            try:
                d, f, n, ls = self._decode(data)
                durs.append(d)
                fpss.append(f)
                nfs.append(n)
                lumas.append(ls)
                status.append("ok")
            except NotImplementedError:
                durs.append(None)
                fpss.append(None)
                nfs.append(None)
                lumas.append(None)
                status.append("unsupported")
            urls.append(url)
        return pa.table({
            "url": pa.array(urls, pa.string()),
            "duration_s": pa.array(durs, pa.float64()),
            "fps": pa.array(fpss, pa.float64()),
            "n_frames": pa.array(nfs, pa.int64()),
            "frame_lumas": pa.array(lumas, pa.list_(pa.float64())),
            "status": pa.array(status, pa.string()),
        })


def image_features(sf_dir: str) -> ray.data.Dataset:
    """Per-url image metadata/features over the pages corpus (real decode);
    rows-only driver check.  Large binary payloads -> small batch_size so a
    batch x concurrency fits worker heaps."""
    from img2table_ray.pipelines.corpus import corpus_for

    corpus = corpus_for(sf_dir)
    return ray.data.read_parquet(f"{corpus}/pages", columns=["url", "html"]).map_batches(
        ImageFeatureStage, batch_format="pyarrow", batch_size=16,
        concurrency=actor_concurrency(), num_cpus=1,
    )


def image_thumbnails(sf_dir: str) -> ray.data.Dataset:
    """Per-url 64x64 PNG thumbnails over the pages corpus (real decode +
    bilinear resize + re-encode); rows-only driver check.  Small batches:
    batch x concurrency of binary payloads must fit worker heaps."""
    from img2table_ray.pipelines.corpus import corpus_for

    corpus = corpus_for(sf_dir)
    return ray.data.read_parquet(f"{corpus}/pages", columns=["url", "html"]).map_batches(
        ImageResizeStage, batch_format="pyarrow", batch_size=16,
        concurrency=actor_concurrency(), num_cpus=1,
    )
