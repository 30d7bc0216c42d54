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


def shuffle_width(min_width: int = 8, cpus_per_block: int = 4) -> int:
    """Coalesce width for a ``repartition`` placed before a small groupby.

    Ray's sort-shuffle fixed cost scales with input block count (measured
    3-4x on tiny combiner outputs), so coalescing first is load-bearing —
    but a hardcoded width silently turns into TB-sized blocks on a real
    cluster.  Derive it from cluster CPUs instead: one block per
    ``cpus_per_block`` CPUs, floored at ``min_width``.  On the 32-CPU test
    box this is 8 (the measured sweet spot); on a 256-node x 64-CPU
    cluster it is 4096 blocks, keeping per-block bytes bounded while still
    collapsing the 100k-task exploded sets that make the shuffle slow.
    """
    try:
        total = int(ray.cluster_resources().get("CPU", 4))
    except Exception:
        total = 4
    return max(min_width, total // cpus_per_block)
