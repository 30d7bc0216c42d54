"""Ray Data stages for the extraction pipeline.

``PageExtractor`` is the fused actor-pool stage (SURVEY.md §3): decode ->
threshold -> metrics -> lines -> cells -> tables -> content -> titles per
document, emitting one output row per extracted table (plus a no-table /
error marker row per document so lineage is complete).  Actor state: decode
memo-cache (corpora replicate documents heavily; a real deployment would use
a C PNG decoder), warm numpy buffers, and the broadcast word lookup.
"""

from __future__ import annotations

import hashlib
import json
import traceback
from typing import Optional

import numpy as np
import pyarrow as pa
import ray

OUTPUT_SCHEMA = pa.schema(
    [
        ("url", pa.string()),
        ("part", pa.int32()),
        ("page", pa.int32()),
        ("table_idx", pa.int32()),
        ("x1", pa.int32()),
        ("y1", pa.int32()),
        ("x2", pa.int32()),
        ("y2", pa.int32()),
        ("title", pa.string()),
        ("nb_rows", pa.int32()),
        ("nb_columns", pa.int32()),
        ("cells", pa.string()),  # JSON [[{x1,y1,x2,y2,value}...]...] row-major
        ("extracted_text", pa.string()),  # canonical serialization (byte-stable)
        ("status", pa.string()),  # ok | no_tables | error
        ("error", pa.string()),
    ]
)


def probe_batch(batch: pa.Table) -> pa.Table:
    """SizeProbe: stateless, cheap.  Adds content size + container kind
    (PNG/MPNG/PDF magic sniff) used for the page explode and size-aware
    routing — heavy documents go to a dedicated pool (skew mitigation)."""
    import pyarrow.compute as pc

    from img2table_ray.extract.pdf import sniff_kind

    html = batch["html"]
    sizes = pc.binary_length(html)
    kinds = [sniff_kind(v.as_py()[:16] if v.is_valid else b"") for v in html]
    return batch.append_column("doc_bytes", sizes).append_column(
        "doc_kind", pa.array(kinds, pa.string())
    )


def explode_pages(batch: pa.Table) -> pa.Table:
    """1 multi-page document row -> N per-page rows (SURVEY.md §4: explode
    BEFORE the heavy per-page work so a many-page document cannot stall one
    actor slot).  MPNG page bytes are container slices — no decode here.
    PDF pages cannot be sliced (objects are shared across pages), so each
    exploded PDF row repeats the full document bytes with a ``page`` index;
    the render stage selects the page.  The duplication trades object-store
    bytes for slot-level parallelism — the right trade for the multi-table
    report PDFs that otherwise pin one actor for the whole document.

    Arrow-native: only the multi-page rows' ``html`` payloads are
    materialized into Python; every other column is duplicated with
    ``Table.take`` so big binary columns of single-page rows never round-trip
    through Python lists."""
    import pyarrow.compute as pc

    from img2table_ray.extract.pdf import split_mpng

    mask_mpng = pc.equal(batch["doc_kind"], "mpng")
    mask_pdf = pc.equal(batch["doc_kind"], "pdf")
    mask_multi = pc.or_(mask_mpng, mask_pdf)
    if not pc.any(mask_multi).as_py():
        return batch.append_column(
            "page", pa.array([0] * len(batch), pa.int32()))

    plain = batch.filter(pc.invert(mask_multi))
    plain = plain.append_column("page", pa.array([0] * len(plain), pa.int32()))
    parts = [plain]

    if pc.any(mask_mpng).as_py():
        sub = batch.filter(mask_mpng)
        page_lists: list[list[bytes]] = []
        for b in sub["html"].to_pylist():
            try:
                page_lists.append(split_mpng(b))
            except ValueError:
                page_lists.append([b])
        counts = [len(p) for p in page_lists]
        rep = np.repeat(np.arange(len(sub), dtype=np.int64), counts)
        rows = sub.take(pa.array(rep))
        flat = [pb for lst in page_lists for pb in lst]
        names = rows.schema.names
        rows = rows.set_column(names.index("html"), "html",
                               pa.array(flat, pa.binary()))
        rows = rows.set_column(
            names.index("doc_bytes"), "doc_bytes",
            pa.array([len(pb) for pb in flat],
                     batch.schema.field("doc_bytes").type))
        rows = rows.set_column(
            names.index("doc_kind"), "doc_kind",
            pa.array(["png"] * len(flat), pa.string()))
        page_ids = np.concatenate([np.arange(c, dtype=np.int32)
                                   for c in counts])
        rows = rows.append_column("page", pa.array(page_ids, pa.int32()))
        parts.append(rows)

    if pc.any(mask_pdf).as_py():
        from img2table_ray.extract.pdftext import pdf_page_count

        sub = batch.filter(mask_pdf)
        counts = []
        for b in sub["html"].to_pylist():
            try:
                counts.append(max(1, pdf_page_count(b)))
            except Exception:
                counts.append(1)  # undecodable: one error row downstream
        rep = np.repeat(np.arange(len(sub), dtype=np.int64), counts)
        rows = sub.take(pa.array(rep))
        page_ids = np.concatenate([np.arange(c, dtype=np.int32)
                                   for c in counts])
        rows = rows.append_column("page", pa.array(page_ids, pa.int32()))
        parts.append(rows)

    return pa.concat_tables(parts)


class PageExtractor:
    """Actor-pool UDF: pyarrow batch of pages rows -> pyarrow batch of
    extracted-table rows (OUTPUT_SCHEMA)."""

    def __init__(self, words_ref=None, words_service=None,
                 implicit_rows: bool = True,
                 borderless: bool = False, min_confidence: int = 50,
                 cache_handle=None, stats_handle=None) -> None:
        # Once-per-actor setup: broadcast word lookup + decode memo cache +
        # optional shared cross-actor memo cache (state/cache.py).
        #
        # malloc tuning: keep freed arenas (no trim, no mmap for big arrays)
        # so numpy temporaries reuse warm pages.  This sandbox faults fresh
        # memory at ~7.5 MB/s (hypervisor lazy paging), so page reuse is the
        # difference between 100 ms and 10 s per page batch.
        try:
            import ctypes

            libc = ctypes.CDLL("libc.so.6")
            libc.mallopt(-3, 1 << 30)  # M_MMAP_THRESHOLD
            libc.mallopt(-1, 1 << 30)  # M_TRIM_THRESHOLD
        except Exception:
            pass
        self._words: dict = ray.get(words_ref) if words_ref is not None else {}
        self._words_service = words_service
        self._decode_cache: dict = {}
        self._extract_cache: dict = {}
        self._cache = cache_handle
        self._stats = stats_handle
        self._implicit_rows = implicit_rows
        self._borderless = borderless
        self._min_confidence = min_confidence

    def _decode(self, data: bytes, page: int = 0):
        from img2table_ray.extract.pdf import sniff_kind
        from img2table_ray.imgops.png import decode_image

        key = (hashlib.md5(data).digest(), page)
        img = self._decode_cache.get(key)
        if img is None:
            if sniff_kind(data[:8]) == "pdf":
                from img2table_ray.extract.pdf import PdfiumRenderer

                # vector rasterizer @200 DPI (extract/pdfraster.py); the
                # exploded PDF row carries the selected page index
                img = PdfiumRenderer().render(data, pages=[page])[0]
            else:
                img = decode_image(data)
            if len(self._decode_cache) < 64:
                self._decode_cache[key] = img
        return key, img

    def _extract(self, data: bytes, hocr: Optional[str], page: int = 0):
        """Extraction result for (document bytes, hocr, page) — memoized,
        since synthetic corpora replicate documents heavily.  Returns the
        list of per-table dict rows (without url/part)."""
        from img2table_ray.extract.content import OCRWords, parse_hocr
        from img2table_ray.extract.document import extract_tables_from_image

        ckey = self._cache_key(data, hocr, page)
        cached = self._extract_cache.get(ckey)
        if cached is not None:
            return cached

        _, img = self._decode(data, page)
        if hocr is not None:
            words = OCRWords.from_records(parse_hocr(hocr, page=0))
        elif data[:4] == b"%PDF":
            # no hOCR sidecar: PDFs carry their own text layer
            from img2table_ray.extract.pdftext import (PdfTextError,
                                                       pdf_words_content)

            try:
                recs = pdf_words_content(data, pages=[page])[0]
                for r in recs:
                    r["page"] = 0  # single-page extraction context
                words = OCRWords.from_records(recs)
            except PdfTextError:
                words = None
        else:
            words = None
        res = extract_tables_from_image(
            img, words=words, implicit_rows=self._implicit_rows,
            borderless_tables=self._borderless, min_confidence=self._min_confidence)

        rows = []
        for t_idx, tb in enumerate(res.tables):
            cells_json = json.dumps(
                [
                    [
                        {"x1": c.bbox.x1, "y1": c.bbox.y1, "x2": c.bbox.x2,
                         "y2": c.bbox.y2, "value": c.value}
                        for c in row
                    ]
                    for row in tb.content.values()
                ],
                ensure_ascii=False,
            )
            rows.append(
                {
                    "page": 0,
                    "table_idx": t_idx,
                    "x1": tb.bbox.x1, "y1": tb.bbox.y1,
                    "x2": tb.bbox.x2, "y2": tb.bbox.y2,
                    "title": tb.title,
                    "nb_rows": tb.nb_rows, "nb_columns": tb.nb_columns,
                    "cells": cells_json,
                    "extracted_text": tb.canonical_text(),
                    "status": "ok", "error": None,
                }
            )
        if not rows:
            rows.append(
                {
                    "page": 0, "table_idx": -1,
                    "x1": -1, "y1": -1, "x2": -1, "y2": -1,
                    "title": None, "nb_rows": 0, "nb_columns": 0,
                    "cells": None, "extracted_text": None,
                    "status": "no_tables", "error": None,
                }
            )
        if len(self._extract_cache) < 256:
            self._extract_cache[ckey] = rows
        return rows

    def _cache_key(self, data: bytes, hocr, page: int = 0) -> tuple:
        return (hashlib.md5(data).digest(),
                hashlib.md5((hocr or "").encode()).digest(), page)

    def __call__(self, batch: pa.Table) -> pa.Table:
        urls = batch["url"].to_pylist()
        htmls = batch["html"].to_pylist()
        pages = (batch["page"].to_pylist() if "page" in batch.schema.names
                 else [0] * len(batch))
        parts = (batch["part"].to_pylist() if "part" in batch.schema.names
                 else [0] * len(batch))
        # words arrive one of three ways: a joined column (shuffle-join
        # path), a bulk fetch from the partitioned lookup service (the
        # 100 TB path — one get_many RPC per touched shard per batch), or
        # the broadcast lookup (small-side path)
        if "hocr" in batch.schema.names:
            hocr_list = batch["hocr"].to_pylist()
        elif self._words_service is not None:
            try:
                hocr_list = self._words_service.fetch(
                    [(u, int(p)) for u, p in zip(urls, pages)])
            except Exception:
                # fetch() already degrades per-shard; this guard keeps
                # ANY lookup failure from failing the block — rows come
                # out word-less rather than the task dying (ADVICE r3)
                hocr_list = [None] * len(urls)
        else:
            hocr_list = [self._words.get((u, p)) for u, p in zip(urls, pages)]
        out: dict[str, list] = {name: [] for name in OUTPUT_SCHEMA.names}

        # shared-cache prefetch with single-flight claims: ONE RPC for the
        # batch's local-miss keys; "wait" keys poll briefly (another actor
        # is computing) before falling back to local compute
        if self._cache is not None:
            miss_keys = []
            seen = set()
            for data, hocr, page in zip(htmls, hocr_list, pages):
                k = self._cache_key(data, hocr, page)
                if k not in self._extract_cache and k not in seen:
                    seen.add(k)
                    miss_keys.append(k)
            if miss_keys:
                states = self._cache.claim_many(miss_keys)
                wait_keys = []
                for k, (state, v) in zip(miss_keys, states):
                    if state == "hit":
                        self._extract_cache[k] = v
                    elif state == "wait":
                        wait_keys.append(k)
                if wait_keys:
                    # another worker is computing these: ONE immediate
                    # re-check, then fall through to local compute.  A
                    # sleep-poll loop here measurably stalled a 32-CPU
                    # pool (every worker herds on the replicated hot
                    # documents at startup, and a sleeping task still
                    # holds its CPU slot); duplicating at most one
                    # in-flight extraction per hot key is cheaper than
                    # quantized waiting.  (A waiter that does compute
                    # publishes too — put_many is idempotent.)
                    vals = self._cache.get_many(wait_keys)
                    for k, v in zip(wait_keys, vals):
                        if v is not None:
                            self._extract_cache[k] = v

        for url, page, part, data, hocr in zip(urls, pages, parts, htmls,
                                               hocr_list):
            try:
                k = self._cache_key(data, hocr, page)
                fresh = k not in self._extract_cache
                rows = self._extract(data, hocr, page)
                if fresh and self._cache is not None:
                    # publish IMMEDIATELY (fire-and-forget) so single-flight
                    # waiters on this hot key unblock mid-batch
                    self._cache.put_many([(k, rows)])
            except Exception as exc:  # error records, never fail the block
                rows = [
                    {
                        "page": 0, "table_idx": -1,
                        "x1": -1, "y1": -1, "x2": -1, "y2": -1,
                        "title": None, "nb_rows": 0, "nb_columns": 0,
                        "cells": None, "extracted_text": None,
                        "status": "error",
                        "error": f"{type(exc).__name__}: {exc}\n"
                                 + traceback.format_exc(limit=3),
                    }
                ]
            for r in rows:
                out["url"].append(url)
                out["part"].append(part)
                for col, v in r.items():
                    out[col].append(page if col == "page" else v)

        # distributed manifest accounting: per-batch (part -> counts) partials
        # go to the part-hashed stats shards (state/stats.py:StatsShards) —
        # the driver never re-reads output parquet.  The send is
        # fire-and-forget (no RPC round-trip in the hot path); the driver
        # drains with StatsShards.flush() before each manifest publish.
        if self._stats is not None:
            # row-identity keys -> idempotent under retries AND re-chunked
            # batch boundaries (ADVICE r2): one entry per output row.
            # Error rows carry the sniffed container kind so unsupported
            # formats are countable per partition (manifest errors_by_format).
            kinds = (batch["doc_kind"].to_pylist()
                     if "doc_kind" in batch.schema.names
                     else ["unknown"] * len(batch))
            kind_of = {(u, p): k for u, p, k in zip(urls, pages, kinds)}
            stat_rows = []
            for url, part, page, ti, st in zip(out["url"], out["part"],
                                               out["page"], out["table_idx"],
                                               out["status"]):
                rk = hashlib.md5(f"{url}\x1f{page}\x1f{ti}".encode()).digest()
                stat_rows.append((
                    rk, int(part),
                    1 if (page == 0 and ti <= 0) else 0,  # one per document
                    1 if st == "ok" else 0,
                    1 if st == "error" else 0,
                    kind_of.get((url, page), "unknown"),
                ))
            self._stats.add_rows(stat_rows)

        return pa.Table.from_pydict(out, schema=OUTPUT_SCHEMA)


# ---- task-mode execution -------------------------------------------------
#
# The extractor's per-process state (malloc tuning, broadcast word lookup,
# decode/extract memo caches) does not need an ACTOR — a module-level
# instance in an ordinary task worker gives the same once-per-process setup
# with two advantages on short jobs:
#
#   * worker processes are REUSED across datasets in a session, so the
#     lazy-paging warm-up of this sandbox's hypervisor (first touch of a
#     fresh heap page ~7.5 MB/s) is paid once per session instead of once
#     per fresh actor pool — on a 40 s run with 24 actors that warm-up was
#     ~35% of total wall time (measured: actor cpu/wall = 0.63);
#   * task pools are elastic — no fixed pool to size against the session
#     CPU count, no eager-creation deadlock risk on small sessions.
#
# One live configuration per worker: a new pipeline invocation (new token)
# replaces the instance, so memo caches never leak across datasets and the
# timed pass of a warm/timed benchmark pair still does its own decodes.

_TASK_INSTANCE: dict = {}


def page_extractor_task(batch: pa.Table, *, token: str, ctor: dict) -> pa.Table:
    inst = _TASK_INSTANCE.get(token)
    if inst is None:
        _TASK_INSTANCE.clear()
        inst = PageExtractor(**ctor)
        _TASK_INSTANCE[token] = inst
    return inst(batch)
