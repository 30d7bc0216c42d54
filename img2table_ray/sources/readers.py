"""Shared Parquet-read helper.

The driver's testdata files were written through pandas, so their Arrow
schemas carry ``b"pandas"`` metadata whose hash raises ``unhashable type:
'dict'`` inside Ray Data's schema-dedup fast path (a warning per block
concat).  Passing an explicit metadata-free schema to ``read_parquet``
makes every downstream block schema hashable and silences the noise —
and doubles as the single place where column pruning is enforced.
"""

from __future__ import annotations

import pyarrow as pa
import pyarrow.parquet as pq
import ray.data


def read_parquet_clean(path: str, columns: list[str] | None = None,
                       **kwargs) -> ray.data.Dataset:
    """``ray.data.read_parquet`` with schema metadata stripped (and pruned
    to ``columns`` when given)."""
    try:
        full = pq.read_schema(path)
        schema = (
            pa.schema([full.field(c) for c in columns]) if columns
            else full.remove_metadata()
        )
    except (OSError, KeyError):
        schema = None  # directory input or unexpected layout: let Ray infer
    return ray.data.read_parquet(path, columns=columns, schema=schema, **kwargs)
