"""Vendored test-document fixtures used by the deterministic corpus
generator (sources/pages.py) and the borderless demo corpus.

The PNGs are pixel-identical re-encodings (through our own codec) of the
reference library's public test documents
(/root/reference/tests/document/image/test_data/*.png and
tests/tables/processing/borderless_tables/borderless_tables/test_data/test.png);
``tesseract_hocr.html`` is the reference's mock-OCR fixture
(tests/_mock_data/tesseract_hocr.html).  Vendoring them keeps ``entry()`` /
``queries()`` runnable in environments without the reference checkout.
"""

from __future__ import annotations

import os

_DIR = os.path.dirname(os.path.abspath(__file__))


def fixture_path(name: str) -> str:
    """Absolute path of a vendored fixture file (raises if absent)."""
    p = os.path.join(_DIR, name)
    if not os.path.exists(p):
        raise FileNotFoundError(f"vendored fixture missing: {p}")
    return p


def fixture_bytes(name: str) -> bytes:
    with open(fixture_path(name), "rb") as f:
        return f.read()
