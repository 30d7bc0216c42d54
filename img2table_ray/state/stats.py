"""Distributed job-stats collector.

Extraction actors push per-batch ``{part: (n_docs, n_tables, n_errors)}``
partials here; the driver reads the totals once after ``write_parquet``
returns and writes them into the checkpoint manifests — no driver-side
re-read of output parquet (VERDICT r1 §wrong-3).

The payload is a handful of ints per batch, so a single collector is fine
up to thousands of actors; shard by ``part % n_collectors`` if it ever
shows up in a profile.
"""

from __future__ import annotations

import ray


@ray.remote(num_cpus=0)
class StatsCollector:
    def __init__(self) -> None:
        self._parts: dict[int, list[int]] = {}

    def add(self, updates: dict[int, list[int]]) -> None:
        for part, (d, t, e) in updates.items():
            c = self._parts.setdefault(int(part), [0, 0, 0])
            c[0] += d
            c[1] += t
            c[2] += e

    def totals(self) -> dict[int, list[int]]:
        return self._parts
