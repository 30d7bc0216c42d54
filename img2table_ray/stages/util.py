"""Stage-sizing helpers shared by all Ray Data pipelines."""

from __future__ import annotations

import ray


def actor_concurrency(reserve: int = 2, cap: int = 16) -> tuple[int, int]:
    """Autoscaling actor-pool size that never starves the rest of the pipeline.

    Returns ``(1, n)`` where n leaves ``reserve`` CPUs for the read / shuffle /
    write stages.  A pool sized to every CPU deadlocks a small local session
    (the downstream reduce tasks cannot schedule), and on a real cluster it
    serializes the pipeline — always leave headroom.
    """
    try:
        total = int(ray.cluster_resources().get("CPU", 4))
    except Exception:
        total = 4
    return (1, max(1, min(cap, total - reserve)))
