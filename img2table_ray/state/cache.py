"""Shared extraction memo-cache with single-flight claims — the one place
the engine drops to a raw Ray actor (a shared mutable index; the Dataset
API cannot express cross-task memoization).

Web corpora replicate documents heavily (boilerplate pages, mirrored
assets).  Without sharing, every actor in the pool re-extracts every popular
document; without single-flight, all actors race on the same hot documents
at startup (a measured 20x duplicated-work herd).  ``claim_many`` returns,
per key: ("hit", rows) | ("mine", None) — caller computes and publishes |
("wait", None) — another actor is computing; caller polls ``get_many``
briefly and falls back to computing on timeout (so a dead claimant cannot
wedge the pipeline).

Partitioning: the cache is SHARDED by key hash across ``num_shards``
actors (``CacheClient`` routes; one RPC per shard per batch) so a single
actor's RPC serialization cannot throttle a large extraction pool.  At
100 TB an exact-dedup pre-pass (extract one representative per content
hash) replaces the cache entirely.
"""

from __future__ import annotations

import time

import ray


@ray.remote(num_cpus=0)
class ExtractionCache:
    def __init__(self, max_entries: int = 4096, claim_ttl_s: float = 60.0) -> None:
        self._store: dict = {}
        self._claims: dict = {}  # key -> claim timestamp
        self._max = max_entries
        self._ttl = claim_ttl_s

    def get_many(self, keys: list) -> list:
        return [self._store.get(k) for k in keys]

    def claim_many(self, keys: list) -> list:
        now = time.time()
        out = []
        for k in keys:
            if k in self._store:
                out.append(("hit", self._store[k]))
            elif k in self._claims and now - self._claims[k] < self._ttl:
                out.append(("wait", None))
            else:
                self._claims[k] = now
                out.append(("mine", None))
        return out

    def put_many(self, items: list) -> int:
        for k, v in items:
            self._claims.pop(k, None)
            if len(self._store) >= self._max:
                continue
            self._store[k] = v
        return len(self._store)


class CacheClient:
    """Driver-constructed, serializable router over N cache-shard actors.
    Keys are (md5, md5) tuples; shard = first byte of the first digest."""

    def __init__(self, num_shards: int = 4) -> None:
        self._shards = [ExtractionCache.remote() for _ in range(num_shards)]
        self._n = num_shards

    def _route(self, keys: list) -> dict:
        by: dict[int, list] = {}
        for i, k in enumerate(keys):
            by.setdefault(k[0][0] % self._n, []).append((i, k))
        return by

    def claim_many(self, keys: list) -> list:
        by = self._route(keys)
        refs = [self._shards[s].claim_many.remote([k for _, k in items])
                for s, items in by.items()]
        out: list = [None] * len(keys)
        for (s, items), res in zip(by.items(), ray.get(refs)):
            for (i, _), r in zip(items, res):
                out[i] = r
        return out

    def get_many(self, keys: list) -> list:
        by = self._route(keys)
        refs = [self._shards[s].get_many.remote([k for _, k in items])
                for s, items in by.items()]
        out: list = [None] * len(keys)
        for (s, items), res in zip(by.items(), ray.get(refs)):
            for (i, _), r in zip(items, res):
                out[i] = r
        return out

    def put_many(self, items: list) -> None:
        by: dict[int, list] = {}
        for k, v in items:
            by.setdefault(k[0][0] % self._n, []).append((k, v))
        for s, its in by.items():
            self._shards[s].put_many.remote(its)  # fire-and-forget publish
