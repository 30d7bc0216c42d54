"""Partitioned words-lookup service unit tests (state/words_service.py).

The e2e equivalence with the broadcast and shuffle-join paths lives in
tests/test_pipeline.py::test_words_paths_all_match_broadcast; these
cover the service's own contract: stable bucketing, order-preserving
bulk fetch, misses as None, and the streaming load pass.
"""

import os

import pyarrow as pa
import pyarrow.parquet as pq

from img2table_ray.state.words_service import (
    WordsService,
    _bucket,
    build_words_service,
)


def test_bucket_stable_and_in_range():
    ks = [("https://a/%d" % i, i % 3) for i in range(200)]
    for k in (2, 5, 16):
        buckets = [_bucket(u, p, k) for u, p in ks]
        assert all(0 <= b < k for b in buckets)
        # deterministic: same inputs, same placement
        assert buckets == [_bucket(u, p, k) for u, p in ks]
    # spread: 200 keys over 5 shards should touch every shard
    assert len(set(_bucket(u, p, 5) for u, p in ks)) == 5


def test_build_fetch_roundtrip(ray_session, tmp_path):
    d = str(tmp_path / "words")
    os.makedirs(d)
    n = 57
    pq.write_table(pa.table({
        "url": [f"https://doc/{i}" for i in range(n)],
        "page": pa.array([i % 4 for i in range(n)], pa.int32()),
        "hocr": [f"<hocr {i}>" for i in range(n)],
    }), f"{d}/w.parquet")
    svc = build_words_service(d, num_shards=3)
    keys = [(f"https://doc/{i}", i % 4) for i in range(n)]
    got = svc.fetch(keys)
    assert got == [f"<hocr {i}>" for i in range(n)]
    # misses come back as None, order preserved
    mixed = [("https://doc/3", 3), ("https://missing/x", 0),
             ("https://doc/10", 2)]
    assert svc.fetch(mixed) == ["<hocr 3>", None, "<hocr 10>"]
    assert isinstance(svc, WordsService) and len(svc.shards) == 3


def test_dead_shard_degrades_to_none(ray_session, tmp_path):
    """A killed shard actor must yield None for its keys (degraded,
    word-less rows) instead of raising into the extraction task
    (ADVICE r3: node loss on the at-scale path)."""
    import ray

    d = str(tmp_path / "words")
    os.makedirs(d)
    n = 40
    pq.write_table(pa.table({
        "url": [f"https://doc/{i}" for i in range(n)],
        "page": pa.array([0] * n, pa.int32()),
        "hocr": [f"<hocr {i}>" for i in range(n)],
    }), f"{d}/w.parquet")
    svc = build_words_service(d, num_shards=2)
    keys = [(f"https://doc/{i}", 0) for i in range(n)]
    dead = 0
    ray.kill(svc.shards[dead])
    got = svc.fetch(keys)
    for (u, p), v in zip(keys, got):
        if _bucket(u, p, 2) == dead:
            assert v is None
        else:
            assert v == f"<hocr {int(u.rsplit('/', 1)[1])}>"
    # both buckets were actually exercised
    assert any(v is None for v in got) and any(v is not None for v in got)


def test_null_hocr_rows_are_skipped(ray_session, tmp_path):
    d = str(tmp_path / "words")
    os.makedirs(d)
    pq.write_table(pa.table({
        "url": ["https://doc/0", "https://doc/1"],
        "page": pa.array([0, 0], pa.int32()),
        "hocr": ["<h>", None],
    }), f"{d}/w.parquet")
    svc = build_words_service(d, num_shards=2)
    assert svc.fetch([("https://doc/0", 0), ("https://doc/1", 0)]) == [
        "<h>", None]
