"""The flagship Ray-Data extraction pipeline (north_rule): streaming
extraction over a Common-Crawl-style pages table.

    read_parquet(pages, columns=[url, html])        # prune at the read
      -> map_batches(probe)                         # size + container sniff
      -> split heavy / light by doc_bytes           # skew mitigation
      -> map_batches(PageExtractor, actor pools)    # fused per-doc algorithm
      -> write_parquet(out/data, partition_cols)    # resumable layout
      -> manifests per partition                    # checkpoint + lineage

Words sidecar (stand-in for the external OCR service) is broadcast via
``ray.put`` when small; at 100 TB it becomes ``pages.join(words,
num_partitions=N, on=("url",))`` — the hash-join path is implemented and
selectable with ``join_words=True``.
"""

from __future__ import annotations

import os
import shutil
import time

import pyarrow as pa
import pyarrow.compute as pc
import pyarrow.parquet as pq
import ray
import ray.data

from img2table_ray.stages.extractor import (
    OUTPUT_SCHEMA,
    PageExtractor,
    explode_pages,
    partition_of,
    probe_batch,
)
from img2table_ray.stages.util import actor_concurrency
from img2table_ray.state import manifest as mf

HEAVY_BYTES = 512 * 1024  # documents above this route to the heavy pool


def _add_part(batch: pa.Table, num_parts: int) -> pa.Table:
    parts = pa.array(
        [partition_of(u, num_parts) for u in batch["url"].to_pylist()], pa.int32()
    )
    return batch.append_column("part", parts)


def load_words_lookup(words_dir: str) -> dict:
    """Driver-side load of the words sidecar -> {(url, page): hocr}.  Small
    side of the broadcast join; at 100 TB this becomes a hash join on
    (url, page)."""
    if not os.path.isdir(words_dir):
        return {}
    tbl = pq.read_table(words_dir)
    if "page" in tbl.schema.names:
        return {(u, p): h for u, p, h in zip(tbl["url"].to_pylist(),
                                             tbl["page"].to_pylist(),
                                             tbl["hocr"].to_pylist())}
    return {(u, 0): h for u, h in zip(tbl["url"].to_pylist(), tbl["hocr"].to_pylist())}


def extract_pages(pages_dir: str, words_dir: str | None = None, num_parts: int = 64,
                  skip_parts: set[int] | None = None,
                  keep_parts: set[int] | None = None, implicit_rows: bool = True,
                  borderless: bool = False, lang_filter: str | None = None,
                  join_words: bool = False) -> ray.data.Dataset:
    """Build the lazy extraction Dataset (no sink).

    ``join_words=False`` broadcasts the words sidecar via ``ray.put`` (the
    small-side fast path).  ``join_words=True`` uses a hash-partitioned
    ``Dataset.join`` on (url, page) — the 100 TB path where the OCR-words
    table is as large as the pages table and cannot be broadcast."""
    columns = ["url", "html"] if lang_filter is None else ["url", "html", "lang"]
    ds = ray.data.read_parquet(f"{pages_dir}/pages", columns=columns)
    if lang_filter is not None:
        ds = ds.map_batches(
            lambda t, lf=lang_filter: t.filter(pc.equal(t["lang"], lf)).drop_columns(["lang"]),
            batch_format="pyarrow",
        )

    ds = ds.map_batches(lambda t: _add_part(t, num_parts), batch_format="pyarrow")
    if skip_parts:
        skip = pa.array(sorted(skip_parts), pa.int32())
        ds = ds.map_batches(
            lambda t, s=skip: t.filter(pc.invert(pc.is_in(t["part"], value_set=s))),
            batch_format="pyarrow",
        )
    if keep_parts is not None:
        keep = pa.array(sorted(keep_parts), pa.int32())
        ds = ds.map_batches(
            lambda t, s=keep: t.filter(pc.is_in(t["part"], value_set=s)),
            batch_format="pyarrow",
        )

    ds = ds.map_batches(probe_batch, batch_format="pyarrow")
    # 1 multi-page doc -> N page rows BEFORE the heavy per-page work
    ds = ds.map_batches(explode_pages, batch_format="pyarrow")

    words_ref = None
    if words_dir is not None and join_words:
        words_ds = ray.data.read_parquet(words_dir)
        # modest partition count + fractional-CPU aggregators so the join
        # coexists with the fixed extraction pools on small sessions
        n_join_parts = max(2, actor_concurrency() // 2)
        ds = ds.join(words_ds, join_type="left_outer",
                     num_partitions=n_join_parts, on=("url", "page"),
                     aggregator_ray_remote_args={"num_cpus": 0.25})
    elif words_dir is not None:
        lookup = load_words_lookup(words_dir)
        if lookup:
            words_ref = ray.put(lookup)

    # shared cross-actor memo cache (replicated web documents extract once
    # per cluster, not once per actor) — see state/cache.py
    from img2table_ray.state.cache import ExtractionCache

    cache_handle = ExtractionCache.remote()

    def extractor_stage(sub: ray.data.Dataset, batch_size: int,
                        pool: int) -> ray.data.Dataset:
        return sub.map_batches(
            PageExtractor,
            fn_constructor_kwargs={
                "words_ref": words_ref,
                "num_parts": num_parts,
                "implicit_rows": implicit_rows,
                "borderless": borderless,
                "cache_handle": cache_handle,
            },
            batch_format="pyarrow",
            batch_size=batch_size,
            concurrency=pool,
            num_cpus=1,
        )

    # Skew mitigation: heavy documents (big multi-table pages / future PDFs)
    # get a dedicated SMALL pool with tiny batches so one giant row cannot
    # stall a batch of light rows; light documents get the main pool.  The
    # two fixed pools together must fit the cluster (fixed pools are created
    # eagerly — oversubscribing deadlocks the union).
    main_pool = actor_concurrency(reserve=2)
    heavy_pool = max(1, min(2, main_pool // 4))
    heavy = ds.map_batches(
        lambda t: t.filter(pc.greater(t["doc_bytes"], HEAVY_BYTES)), batch_format="pyarrow"
    )
    light = ds.map_batches(
        lambda t: t.filter(pc.less_equal(t["doc_bytes"], HEAVY_BYTES)), batch_format="pyarrow"
    )
    return extractor_stage(light, batch_size=16, pool=max(1, main_pool - heavy_pool)).union(
        extractor_stage(heavy, batch_size=2, pool=heavy_pool)
    )


def run_extraction_job(pages_dir: str, out_dir: str, words_dir: str | None = None,
                       num_parts: int = 16, implicit_rows: bool = True,
                       borderless: bool = False, waves: int = 4) -> dict:
    """Resumable job: partitions with complete manifests are skipped; the
    remaining partitions run in ``waves`` checkpoint rounds, each wave
    writing its data directories and then publishing manifests — so a kill
    at ANY point loses at most one wave of work.  Partial data of
    unfinished partitions is cleared before rewriting (idempotent)."""
    t0 = time.time()
    done = mf.completed_partitions(out_dir)
    ddir = mf.data_dir(out_dir)

    # clear partial output of unfinished partitions (idempotent rewrite)
    if os.path.isdir(ddir):
        for name in os.listdir(ddir):
            if name.startswith("part="):
                part = int(name.split("=")[1])
                if part not in done:
                    shutil.rmtree(os.path.join(ddir, name), ignore_errors=True)

    todo = sorted(set(range(num_parts)) - done)
    wave_size = max(1, -(-len(todo) // max(1, waves)))
    stats = {}
    for w in range(0, len(todo), wave_size):
        wave_parts = set(todo[w : w + wave_size])
        ds = extract_pages(pages_dir, words_dir=words_dir, num_parts=num_parts,
                           keep_parts=wave_parts, implicit_rows=implicit_rows,
                           borderless=borderless)
        ds.write_parquet(ddir, partition_cols=["part"])

        # publish manifests for this wave (data is durable at this point)
        for part in sorted(wave_parts):
            part_dir = os.path.join(ddir, f"part={part}")
            if not os.path.isdir(part_dir):
                # partition had no input rows; publish an empty manifest
                mf.write_manifest(out_dir, part, n_docs=0, n_tables=0,
                                  n_errors=0, wall_s=time.time() - t0)
                stats[part] = {"n_docs": 0, "n_tables": 0, "n_errors": 0}
                continue
            tbl = pq.read_table(part_dir, columns=["url", "status"])
            n_docs = len(set(tbl["url"].to_pylist()))
            statuses = tbl["status"].to_pylist()
            n_tables = sum(1 for s in statuses if s == "ok")
            n_errors = sum(1 for s in statuses if s == "error")
            mf.write_manifest(out_dir, part, n_docs=n_docs, n_tables=n_tables,
                              n_errors=n_errors, wall_s=time.time() - t0)
            stats[part] = {"n_docs": n_docs, "n_tables": n_tables,
                           "n_errors": n_errors}

    return {
        "out_dir": out_dir,
        "resumed_parts": sorted(done),
        "new_parts": sorted(stats),
        "wall_s": round(time.time() - t0, 3),
    }


def read_extraction_output(out_dir: str) -> ray.data.Dataset:
    return ray.data.read_parquet(mf.data_dir(out_dir))
