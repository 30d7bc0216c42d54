"""Multi-page document rendering (ref: src/img2table/document/pdf.py).

The reference renders PDFs with pypdfium2 at 200 DPI (scale = 200/72,
pdf.py:57) and reads the native text layer per character
(src/img2table/ocr/pdf.py:119-152).  pypdfium2 is not available in this
container, so:

* ``PdfiumRenderer`` is a clearly-marked STUB with the real actor
  signature — drop-in once the library exists on workers.
* ``MPNG`` is a deterministic multi-page container (magic + length-prefixed
  PNG pages) standing in for rendered PDFs, so the Ray-side plumbing —
  1 document row -> N page rows, per-page words, heavy-document skew
  routing, (url, page) output keys — is real and tested.
"""

from __future__ import annotations

import struct

import numpy as np

MPNG_MAGIC = b"MPNG"


def encode_mpng(pages_png: list[bytes]) -> bytes:
    """Pack PNG page byte-strings into an MPNG container."""
    out = [MPNG_MAGIC, struct.pack("<I", len(pages_png))]
    for p in pages_png:
        out.append(struct.pack("<I", len(p)))
        out.append(p)
    return b"".join(out)


def split_mpng(data: bytes) -> list[bytes]:
    """MPNG container -> per-page PNG byte-strings (pure slicing, no
    re-encode — the explode stage ships page slices, not decoded pixels)."""
    if data[:4] != MPNG_MAGIC:
        raise ValueError("not an MPNG container")
    (count,) = struct.unpack("<I", data[4:8])
    pos = 8
    pages = []
    for _ in range(count):
        (n,) = struct.unpack("<I", data[pos : pos + 4])
        pos += 4
        pages.append(data[pos : pos + n])
        pos += n
    return pages


def sniff_kind(data: bytes) -> str:
    if data[:8] == b"\x89PNG\r\n\x1a\n":
        return "png"
    if data[:4] == MPNG_MAGIC:
        return "mpng"
    if data[:4] == b"%PDF":
        return "pdf"
    if data[:2] == b"BM":
        return "bmp"
    if data[:3] == b"\xff\xd8\xff":
        return "jpeg"
    if data[:4] in (b"II*\x00", b"MM\x00*"):
        return "tiff"
    if data[:6] in (b"GIF87a", b"GIF89a"):
        return "gif"
    if data[:4] == b"RIFF" and data[8:12] == b"WEBP":
        return "webp"
    return "unknown"


class PdfiumRenderer:
    """STUB — real-PDF page renderer (ref document/pdf.py:46-67).

    Actor contract (identical to what a pypdfium2-backed implementation
    uses): constructed once per actor (the pdfium library handle is warm
    state), ``render(data, pages=None) -> list[np.ndarray]`` returns RGB
    arrays rendered at 200 DPI (scale 200/72), one per selected page.
    """

    DPI = 200
    SCALE = 200 / 72

    def __init__(self) -> None:
        # once-per-actor: import pypdfium2, hold the library handle
        pass

    def render(self, data: bytes, pages: list[int] | None = None) -> list[np.ndarray]:
        raise NotImplementedError(
            "pypdfium2 is not available in this environment; real PDF pages "
            "cannot be rendered.  Use the MPNG container for multi-page "
            "documents, or install pypdfium2 on the workers."
        )
