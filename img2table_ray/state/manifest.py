"""Per-partition checkpoint manifests + lineage/metrics records.

Output layout (resumable, per BASELINE.md):

    out_dir/
      data/part=<id>/*.parquet        # extracted-table rows for partition id
      manifest/<id>.json              # written AFTER the partition's data is
                                      # durable: counts, wall time, attempt

A killed run resumes by listing manifest/ and excluding completed partitions
from the scan before extraction (partition-granular dedup; SURVEY.md §4).
"""

from __future__ import annotations

import json
import os
import time


def manifest_dir(out_dir: str) -> str:
    return os.path.join(out_dir, "manifest")


def data_dir(out_dir: str) -> str:
    return os.path.join(out_dir, "data")


def completed_partitions(out_dir: str) -> set[int]:
    mdir = manifest_dir(out_dir)
    if not os.path.isdir(mdir):
        return set()
    done = set()
    for name in os.listdir(mdir):
        if name.endswith(".json"):
            try:
                with open(os.path.join(mdir, name)) as f:
                    m = json.load(f)
                if m.get("status") == "complete":
                    done.add(int(m["part"]))
            except (ValueError, KeyError, json.JSONDecodeError):
                continue
    return done


def write_manifest(out_dir: str, part: int, n_docs: int, n_tables: int,
                   n_errors: int, wall_s: float, attempt: int = 1,
                   errors_by_format: dict | None = None) -> None:
    mdir = manifest_dir(out_dir)
    os.makedirs(mdir, exist_ok=True)
    payload = {
        "part": part,
        "status": "complete",
        "n_docs": n_docs,
        "n_tables": n_tables,
        "n_errors": n_errors,
        # unsupported/corrupt containers must be COUNTABLE, not silent:
        # per-format error tallies (e.g. {"webp": 3, "unknown": 1})
        "errors_by_format": errors_by_format or {},
        "wall_s": round(wall_s, 3),
        "attempt": attempt,
        "written_at": time.time(),
    }
    tmp = os.path.join(mdir, f".{part}.json.tmp")
    with open(tmp, "w") as f:
        json.dump(payload, f)
    os.replace(tmp, os.path.join(mdir, f"{part}.json"))  # atomic publish
