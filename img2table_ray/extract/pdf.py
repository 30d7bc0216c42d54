"""Multi-page document rendering (ref: src/img2table/document/pdf.py).

The reference renders PDFs with pypdfium2 at 200 DPI (scale = 200/72,
pdf.py:57) and reads the native text layer per character
(src/img2table/ocr/pdf.py:119-152).  pypdfium2 is not available in this
container, so:

* ``PdfiumRenderer`` keeps the pypdfium2 actor contract but is backed by
  the pure-Python vector rasterizer (``extract/pdfraster.py``) — real
  PDF rows flow end-to-end (pinned against the reference's own fixture
  asserts in tests/test_pdfraster.py).
* ``MPNG`` is a deterministic multi-page container (magic + length-prefixed
  PNG pages) for pre-rendered page corpora, so the Ray-side plumbing —
  1 document row -> N page rows, per-page words, heavy-document skew
  routing, (url, page) output keys — is exercised without PDF parse cost.
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
    """Real-PDF page renderer (ref document/pdf.py:46-67).

    Actor contract (identical to what a pypdfium2-backed implementation
    uses): constructed once per actor, ``render(data, pages=None) ->
    list[np.ndarray]`` returns RGB arrays rendered at 200 DPI
    (scale 200/72), one per selected page.

    pypdfium2 is absent from this container, so rendering is backed by
    the pure-Python VECTOR rasterizer (``extract/pdfraster.py``): path
    fills/strokes, rect clips, image XObjects, and text ink approximated
    by native-text-layer character boxes.  Table rules — what the
    downstream line detection consumes — are geometrically exact; glyph
    pixels are not (see the pdfraster module docstring).  Swapping in a
    pypdfium2 backend is a one-method change once the library exists on
    workers.
    """

    DPI = 200
    SCALE = 200 / 72

    def __init__(self) -> None:
        # once-per-actor: warm import of the rasterizer (and, through it,
        # the text-layer parser the text-ink pass uses)
        from img2table_ray.extract import pdfraster

        self._render_pdf = pdfraster.render_pdf

    def render(self, data: bytes, pages: list[int] | None = None) -> list[np.ndarray]:
        return self._render_pdf(data, pages=pages, dpi=self.DPI)
