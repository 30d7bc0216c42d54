"""Stage-sizing helpers shared by all Ray Data pipelines."""

from __future__ import annotations

import ray


def actor_concurrency(reserve: int = 2, cap: int = 24) -> int:
    """Fixed actor-pool size that never starves the rest of the pipeline.

    Leaves ``reserve`` CPUs for the read / shuffle / write stages.  A pool
    sized to every CPU deadlocks a small local session (the downstream
    reduce tasks cannot schedule), and on a real cluster it serializes the
    pipeline.  Fixed (not autoscaling ``(1, n)``): Ray's autoscaling pool
    ramps up far too slowly for short jobs — measured ~2 effective actors
    against 32 queued blocks.
    """
    try:
        total = int(ray.cluster_resources().get("CPU", 4))
    except Exception:
        total = 4
    return max(1, min(cap, total - reserve))
