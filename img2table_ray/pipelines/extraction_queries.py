"""queries() entries for the extraction engine (rows-only driver checks —
image extraction is not SQL-expressible).

Each callable takes a testdata sf_dir, derives the deterministic pages
corpus for that scale, and returns a lazy Ray Dataset.
"""

from __future__ import annotations

import hashlib

import numpy as np
import pandas as pd
import pyarrow as pa
import ray.data

from img2table_ray.pipelines.corpus import corpus_for
from img2table_ray.pipelines.extraction import extract_pages
from img2table_ray.stages.util import actor_concurrency


def extract_tables(sf_dir: str) -> ray.data.Dataset:
    """Full extraction pipeline output (one row per extracted table)."""
    corpus = corpus_for(sf_dir)
    return extract_pages(corpus, words_dir=f"{corpus}/words")


def extract_tables_joined(sf_dir: str) -> ray.data.Dataset:
    """Extraction with the PARTITIONED WORDS SERVICE (``join_words=True``)
    — the 100 TB design for a words side too big to broadcast: only the
    words shuffle (into K shard actors); pages, whose rows carry the full
    document bytes, never move (state/words_service.py).  Same rows as
    extract_tables (equivalence with broadcast AND with the literal
    Dataset.join pinned in
    tests/test_pipeline.py::test_words_paths_all_match_broadcast); timed
    separately in bench.py.  Measured sf0.1 @32: shuffle-join path 42-54 s
    vs service 21.8 s vs broadcast 17.9-24.5 s (window noise)."""
    corpus = corpus_for(sf_dir)
    return extract_pages(corpus, words_dir=f"{corpus}/words", join_words=True)


def extract_tables_en(sf_dir: str) -> ray.data.Dataset:
    """Same with a lang pushdown filter (projection + predicate demo)."""
    corpus = corpus_for(sf_dir)
    return extract_pages(corpus, words_dir=f"{corpus}/words", lang_filter="en")


def _decode_pages(data: bytes) -> "list[np.ndarray]":
    """Decode EVERY page of any corpus document to RGB arrays
    (VERDICT r4 §next-7 — the metrics/lines summaries previously read
    page 0 only): PDFs render all pages at 200 DPI, MPNG multi-page
    containers decode each stored page, single-image containers yield one
    page.  ``extract_metrics`` / ``extract_lines`` therefore emit one row
    per (url, page) — at sf0.01 that is 228 rows from 192 documents (12
    three-page MPNG docs and 12 two-page PDFs)."""
    if data[:4] == b"%PDF":
        from img2table_ray.extract.pdf import PdfiumRenderer

        return PdfiumRenderer().render(data)
    from img2table_ray.imgops.png import decode_image

    if data[:4] == b"MPNG":
        from img2table_ray.extract.pdf import split_mpng

        return [decode_image(p) for p in split_mpng(data)]
    return [decode_image(data)]


class _MetricsStage:
    """Actor-pool stage: per-page image metrics only (A-phase ops); one
    output row per (url, page) — multi-page PDFs/MPNGs contribute every
    page (VERDICT r4 §next-7)."""

    def __init__(self) -> None:
        self._cache: dict = {}

    def __call__(self, batch: pa.Table) -> pa.Table:
        from img2table_ray.extract.metrics import compute_img_metrics
        from img2table_ray.extract.threshold import threshold_dark_areas

        urls, pgs, cls, seps, ncs = [], [], [], [], []
        for url, data in zip(batch["url"].to_pylist(), batch["html"].to_pylist()):
            key = hashlib.md5(data).digest()
            if key in self._cache:
                per_page = self._cache[key]
            else:
                try:
                    per_page = []
                    for img in _decode_pages(data):
                        thresh = threshold_dark_areas(img=img, char_length=11)
                        cl, sep, contours = compute_img_metrics(thresh.copy())
                        nc = len(contours) if contours is not None else -1
                        per_page.append((cl, sep, nc))
                except Exception:
                    per_page = [(None, None, -2)]
                if len(self._cache) < 256:
                    self._cache[key] = per_page
            for page, (cl, sep, nc) in enumerate(per_page):
                urls.append(url)
                pgs.append(page)
                cls.append(cl)
                seps.append(sep)
                ncs.append(nc)
        return pa.table(
            {
                "url": pa.array(urls, pa.string()),
                "page": pa.array(pgs, pa.int64()),
                "char_length": pa.array(cls, pa.float64()),
                "median_line_sep": pa.array(seps, pa.float64()),
                "n_contours": pa.array(ncs, pa.int64()),
            }
        )


def extract_metrics(sf_dir: str) -> ray.data.Dataset:
    """Per-(url, page) image metrics (char_length, median_line_sep,
    contours) over every page of every document."""
    corpus = corpus_for(sf_dir)
    return ray.data.read_parquet(f"{corpus}/pages", columns=["url", "html"]).map_batches(
        _MetricsStage, batch_format="pyarrow", batch_size=16,
        concurrency=actor_concurrency(), num_cpus=1,
    )


class _LinesStage:
    """Actor-pool stage: ruling-line detection summary per (url, page) —
    every page of multi-page documents (VERDICT r4 §next-7)."""

    def __init__(self) -> None:
        self._cache: dict = {}

    def __call__(self, batch: pa.Table) -> pa.Table:
        from img2table_ray.extract.document import TableImage

        urls, pgs, nh, nv = [], [], [], []
        for url, data in zip(batch["url"].to_pylist(), batch["html"].to_pylist()):
            key = hashlib.md5(data).digest()
            if key in self._cache:
                per_page = self._cache[key]
            else:
                try:
                    per_page = []
                    for img in _decode_pages(data):
                        ti = TableImage(img=img)
                        if ti.char_length is None:
                            per_page.append((0, 0))
                            continue
                        from img2table_ray.extract.lines import detect_lines

                        mll = (int(min(1.5 * ti.median_line_sep, 4 * ti.char_length))
                               if ti.median_line_sep else 20)
                        h_lines, v_lines = detect_lines(
                            img=ti.img, contours=ti.contours,
                            char_length=ti.char_length, min_line_length=mll)
                        per_page.append((len(h_lines), len(v_lines)))
                except Exception:
                    per_page = [(-1, -1)]
                if len(self._cache) < 256:
                    self._cache[key] = per_page
            for page, (h, v) in enumerate(per_page):
                urls.append(url)
                pgs.append(page)
                nh.append(h)
                nv.append(v)
        return pa.table(
            {
                "url": pa.array(urls, pa.string()),
                "page": pa.array(pgs, pa.int64()),
                "n_h_lines": pa.array(nh, pa.int64()),
                "n_v_lines": pa.array(nv, pa.int64()),
            }
        )


def extract_lines(sf_dir: str) -> ray.data.Dataset:
    """Per-(url, page) detected ruling-line counts (B-phase ops)."""
    corpus = corpus_for(sf_dir)
    return ray.data.read_parquet(f"{corpus}/pages", columns=["url", "html"]).map_batches(
        _LinesStage, batch_format="pyarrow", batch_size=16,
        concurrency=actor_concurrency(), num_cpus=1,
    )


def _borderless_corpus(sf_dir: str) -> str:
    """Small dedicated corpus including the reference's borderless fixture
    (kept separate from the main corpus: borderless docs cost ~3.5 s each)."""
    import os

    import pyarrow as pa
    import pyarrow.parquet as pq

    from img2table_ray.fixtures import fixture_bytes
    from img2table_ray.imgops.png import encode_png
    from img2table_ray.pipelines.corpus import CORPUS_ROOT
    from img2table_ray.sources.pages import _EPOCH, _SYNTH_SHAPES, synth_table_image

    sf_name = os.path.basename(os.path.normpath(sf_dir))
    out = os.path.join(CORPUS_ROOT, f"borderless-{sf_name}")
    marker = os.path.join(out, ".complete-v2")
    if os.path.exists(marker):
        return out
    os.makedirs(f"{out}/pages", exist_ok=True)
    fixture = fixture_bytes("borderless.png")
    urls, html = [], []
    for i in range(8):
        if i % 2 == 0:
            urls.append(f"https://example.org/borderless/{i:08d}")
            html.append(fixture)
        else:
            shape = _SYNTH_SHAPES[i % len(_SYNTH_SHAPES)]
            g, _ = synth_table_image(shape[0], shape[1], i)
            urls.append(f"https://example.org/synth/{i:08d}")
            html.append(encode_png(g))
    tbl = pa.table({
        "url": pa.array(urls, pa.string()),
        "warc_ts": pa.array([_EPOCH] * len(urls), pa.timestamp("us")),
        "html": pa.array(html, pa.binary()),
        "text": pa.array([""] * len(urls), pa.string()),
        "lang": pa.array(["en"] * len(urls), pa.string()),
    })
    pq.write_table(tbl, f"{out}/pages/part-00000.parquet")
    with open(marker, "w") as f:
        f.write("ok")
    return out


def extract_tables_borderless(sf_dir: str) -> ray.data.Dataset:
    """Extraction with the borderless chain enabled (C1-C13 through the Ray
    pipeline; rows-only check — detects the reference's borderless fixture
    as a 16-row table without ruling lines)."""
    corpus = _borderless_corpus(sf_dir)
    return extract_pages(corpus, words_dir=None, borderless=True,
                         implicit_rows=False)


class _PdfWordsStage:
    """Actor-pool stage: native PDF text-layer words per document
    (ref ocr/pdf.py:157-235 via extract/pdftext.py).

    The PDF bytes ride the batch (``pdf`` binary column); parsing state
    (nothing heavy today, but the slot where a pdfium handle would live)
    is per-actor.  Output: one row per word — the OCRDataframe schema
    plus ``doc_id``."""

    def __call__(self, batch: pa.Table) -> pa.Table:
        from img2table_ray.extract.pdftext import PdfTextError, pdf_words_content

        rows = {k: [] for k in ("doc_id", "page", "word_id", "parent",
                                "value", "confidence",
                                "x1", "y1", "x2", "y2", "status")}
        for doc_id, data in zip(batch["doc_id"].to_pylist(),
                                batch["pdf"].to_pylist()):
            try:
                content = pdf_words_content(data)
                for page_words in content:
                    for w in page_words:
                        if w["class"] != "ocrx_word":
                            continue
                        rows["doc_id"].append(doc_id)
                        rows["page"].append(w["page"])
                        rows["word_id"].append(w["id"])
                        rows["parent"].append(w["parent"])
                        rows["value"].append(w["value"])
                        rows["confidence"].append(w["confidence"])
                        for k in ("x1", "y1", "x2", "y2"):
                            rows[k].append(w[k])
                        rows["status"].append("ok")
            except PdfTextError as err:
                rows["doc_id"].append(doc_id)
                rows["page"].append(-1)
                rows["word_id"].append(None)
                rows["parent"].append(None)
                rows["value"].append(None)
                rows["confidence"].append(None)
                for k in ("x1", "y1", "x2", "y2"):
                    rows[k].append(-1)
                rows["status"].append(f"error: {err}")
        return pa.table(
            {
                "doc_id": pa.array(rows["doc_id"], pa.int64()),
                "page": pa.array(rows["page"], pa.int64()),
                "word_id": pa.array(rows["word_id"], pa.string()),
                "parent": pa.array(rows["parent"], pa.string()),
                "value": pa.array(rows["value"], pa.string()),
                "confidence": pa.array(rows["confidence"], pa.int64()),
                "x1": pa.array(rows["x1"], pa.int64()),
                "y1": pa.array(rows["y1"], pa.int64()),
                "x2": pa.array(rows["x2"], pa.int64()),
                "y2": pa.array(rows["y2"], pa.int64()),
                "status": pa.array(rows["status"], pa.string()),
            }
        )


def _pdf_corpus(sf_dir: str) -> str:
    """Deterministic PDF corpus: the vendored 2-page fixture replicated
    with doc ids (no external data; FIXTURES.md §5)."""
    import os

    import pyarrow.parquet as pq

    from img2table_ray.fixtures import fixture_bytes
    from img2table_ray.pipelines.corpus import CORPUS_ROOT, SF_ROWS

    sf_name = os.path.basename(os.path.normpath(sf_dir))
    n_rows = max(8, SF_ROWS.get(sf_name, 64) // 8)
    out = os.path.join(CORPUS_ROOT, f"pdf-{sf_name}")
    marker = os.path.join(out, ".complete-v1")
    if os.path.exists(marker):
        return out
    os.makedirs(f"{out}/pdfs", exist_ok=True)
    pdf = fixture_bytes("test.pdf")
    tbl = pa.table({
        "doc_id": pa.array(range(n_rows), pa.int64()),
        "pdf": pa.array([pdf] * n_rows, pa.binary()),
    })
    pq.write_table(tbl, f"{out}/pdfs/part-00000.parquet")
    with open(marker, "w") as f:
        f.write("ok")
    return out


def pdf_words(sf_dir: str) -> ray.data.Dataset:
    """Native PDF text-layer words through the Ray pipeline (rows-only:
    PDF parsing is not SQL-expressible)."""
    corpus = _pdf_corpus(sf_dir)
    return ray.data.read_parquet(
        f"{corpus}/pdfs", columns=["doc_id", "pdf"],
    ).map_batches(
        _PdfWordsStage, batch_format="pyarrow", batch_size=8,
        concurrency=actor_concurrency(), num_cpus=1,
    )
