"""Custom join / window operators Ray Data lacks natively.

The brief's operator list names as-of join, range join and windowed
aggregate as the canonical "operators the engine must compose from
map_batches + groupby().map_groups" — Ray Data has no built-in for any
of them.  Each is expressed Ray-Data-first and documents the
partitioning assumption it relies on:

* ``asof_join`` — hash-bucket both sides on the ``by`` key, co-locate
  with one ``groupby(bucket).map_groups``, sorted backward-search inside
  the group (pandas ``merge_asof``).  Assumes per-key history fits a
  bucket's memory (buckets scale with the cluster, keys never split).
* ``range_join`` — the small interval side is broadcast (``ray.put``
  once, read per task), probe side streams through ``map_batches`` with
  a vectorized interval test + per-batch partial aggregation.  No
  shuffle touches the big side.
* ``sliding_window`` — each event is assigned to its ``window/hop``
  overlapping windows by a vectorized repeat inside ``map_batches``
  (duplication factor = window/hop, bounded), partials combine per
  batch, and only (key x window) partial rows reach the global groupby.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import ray
import ray.data
from ray.data.aggregate import Sum

from img2table_ray.sources.readers import read_parquet_clean
from img2table_ray.stages.util import shuffle_width

US_PER_SEC = 1_000_000


# ---------------------------------------------------------------------------
# as-of join
# ---------------------------------------------------------------------------

def _asof_bucket(g: pd.DataFrame) -> pd.DataFrame:
    """As-of join ONE hash bucket: for every left row, the same user's
    most recent right row at-or-before its ts (inner; ties on ts break to
    the larger event_id, which ``merge_asof`` picks because the right side
    is sorted (ts, event_id) and backward search takes the last match)."""
    left = g[g["side"] == 0]
    right = g[g["side"] == 1]
    if left.empty or right.empty:
        return _ASOF_EMPTY.copy()
    left = left.sort_values("ts", kind="stable")
    right = right.sort_values(["ts", "event_id"], kind="stable")
    right = right.rename(columns={"event_id": "click_event_id"})
    right = right.assign(click_ts=right["ts"])
    j = pd.merge_asof(
        left[["event_id", "user_id", "ts"]],
        right[["user_id", "ts", "click_event_id", "click_ts"]],
        on="ts", by="user_id", direction="backward",
        allow_exact_matches=True,
    )
    j = j[j["click_event_id"].notna()]
    if j.empty:
        return _ASOF_EMPTY.copy()
    j = j.assign(
        click_event_id=j["click_event_id"].astype("int64"),
        gap_us=((j["ts"] - j["click_ts"]) // pd.Timedelta(microseconds=1)
                ).astype("int64"),
    )
    return j[["event_id", "user_id", "ts", "click_event_id", "click_ts",
              "gap_us"]]


_ASOF_EMPTY = pd.DataFrame(
    {
        "event_id": pd.Series(dtype="int64"),
        "user_id": pd.Series(dtype="int64"),
        "ts": pd.Series(dtype="datetime64[us]"),
        "click_event_id": pd.Series(dtype="int64"),
        "click_ts": pd.Series(dtype="datetime64[us]"),
        "gap_us": pd.Series(dtype="int64"),
    }
)


def asof_join(sf_dir: str, left_type: str = "purchase",
              right_type: str = "click") -> "ray.data.Dataset":
    """For each ``left_type`` event, the same user's most recent
    ``right_type`` event at-or-before its timestamp (inner as-of join).

    Scale shape: both sides are hash-bucketed on ``user_id % K`` (K from
    the cluster size) in ONE tagged dataset, so a single
    ``groupby(bucket)`` shuffle co-locates each key's full history;
    inside a bucket the join is a sorted backward search, O(n log n) in
    the bucket.  A key never spans buckets, and bucket count scales with
    the cluster — the pattern holds at 100 TB as long as one key's
    history fits one task (same bound as any per-key window).

    Columns: event_id, user_id, ts, click_event_id, click_ts,
    gap_us (int64 microseconds, exact).
    """
    nbuckets = shuffle_width(min_width=16)

    def tag(batch: pa.Table) -> pd.DataFrame:
        df = batch.select(["event_id", "user_id", "ts", "event_type"]
                          ).to_pandas()
        df = df[df["event_type"].isin([left_type, right_type])]
        return pd.DataFrame(
            {
                "event_id": df["event_id"],
                "user_id": df["user_id"],
                "ts": df["ts"],
                "side": np.where(df["event_type"] == left_type, 0, 1
                                 ).astype("int64"),
                "bucket": (df["user_id"] % nbuckets).astype("int64"),
            }
        )

    # output is one row per left event — the same order of magnitude as
    # the input, so it stays a streaming Dataset (consume with
    # write_parquet / iter_batches); no driver-side materialization
    return (
        read_parquet_clean(
            f"{sf_dir}/events.parquet",
            columns=["event_id", "user_id", "ts", "event_type"],
        )
        .map_batches(tag, batch_format="pyarrow", batch_size=65536)
        .groupby("bucket")
        .map_groups(lambda g: _asof_bucket(g.drop(columns=["bucket"])),
                    batch_format="pandas")
    )


# ---------------------------------------------------------------------------
# range (interval) join
# ---------------------------------------------------------------------------

# Deterministic overlapping price bands (band_id, lo, hi): a genuine
# interval join (rows fall in 0..n bands), not a binning — bands 1/2/3
# overlap their neighbors and band 4 nests inside band 0.
PRICE_BANDS: list[tuple[int, float, float]] = [
    (0, 500.0, 20000.0),
    (1, 15000.0, 40000.0),
    (2, 35000.0, 70000.0),
    (3, 60000.0, 105000.0),
    (4, 900.0, 5000.0),
]


def range_join(sf_dir: str) -> pd.DataFrame:
    """Broadcast interval join: lineitem x overlapping price bands
    (``lo <= l_extendedprice < hi``), aggregated per band.

    Scale shape: the interval side is small by construction (range joins
    at scale are banding/calendar/geo-fence tables) — ``ray.put`` it ONCE
    and probe inside ``map_batches`` with a vectorized mask per band; the
    probe side never shuffles, and each batch emits at most one partial
    row per band.  Columns: band_id, lo, hi, n_items, sum_price (r2).
    """
    bands = np.asarray(PRICE_BANDS, dtype="float64")  # (n, 3)
    bands_ref = ray.put(bands)

    def probe(batch: pa.Table) -> pd.DataFrame:
        b = ray.get(bands_ref)
        price = batch["l_extendedprice"].to_numpy(zero_copy_only=False)
        # vectorized interval test: (n_bands, batch) mask, then per-band
        # partial count/sum — no per-row loop
        m = (price[None, :] >= b[:, 1:2]) & (price[None, :] < b[:, 2:3])
        n = m.sum(axis=1)
        keep = n > 0
        return pd.DataFrame(
            {
                "band_id": b[keep, 0].astype("int64"),
                "p_n": n[keep].astype("int64"),
                "p_sum": np.where(m[keep], price[None, :], 0.0).sum(axis=1),
            }
        )

    ds = (
        read_parquet_clean(f"{sf_dir}/lineitem.parquet",
                           columns=["l_extendedprice"])
        .map_batches(probe, batch_format="pyarrow", batch_size=65536)
        .repartition(1)
        .groupby("band_id")
        .aggregate(Sum("p_n", alias_name="n_items"),
                   Sum("p_sum", alias_name="sum_price"))
    )
    df = ds.to_pandas()
    lohi = {int(i): (lo, hi) for i, lo, hi in PRICE_BANDS}
    df["lo"] = df["band_id"].map(lambda i: lohi[i][0])
    df["hi"] = df["band_id"].map(lambda i: lohi[i][1])
    df["n_items"] = df["n_items"].astype("int64")
    df["sum_price"] = np.round(df["sum_price"], 2)
    df = df.sort_values("band_id", kind="stable").reset_index(drop=True)
    return df[["band_id", "lo", "hi", "n_items", "sum_price"]]


# ---------------------------------------------------------------------------
# sliding-window aggregate
# ---------------------------------------------------------------------------

WINDOW_US = 3_600 * US_PER_SEC  # 1-hour windows ...
HOP_US = 900 * US_PER_SEC       # ... sliding every 15 minutes


def sliding_window(sf_dir: str) -> "ray.data.Dataset":
    """Sliding-window aggregate over the events stream: 1-hour windows
    hopping every 15 minutes, per (window_start, event_type): n_events,
    sum_value (r4).  An event at ``ts`` belongs to the ``window/hop`` = 4
    windows starting at ``floor(ts/hop)*hop - k*hop`` for k in 0..3.

    Scale shape: window assignment is a vectorized 4x repeat inside
    ``map_batches`` (bounded duplication, never a join against a window
    table), partials combine per (window, type) per batch, and only the
    combined partials — O(windows x types x batches) rows — reach the
    final combine.  That combine groups by a COARSE bucket of the window
    key (``shuffle_width()`` buckets) and merges each bucket with one
    vectorized pandas groupby: Ray's named-column aggregate pays ~ms of
    per-group overhead, which at one group per (window, type) made this
    37 s on 13.5k groups; the coarse-bucket form is the same shuffle with
    O(width) groups and runs in well under a second.
    """
    nhops = WINDOW_US // HOP_US
    width = shuffle_width(min_width=16)

    def partial(batch: pa.Table) -> pd.DataFrame:
        ts = batch["ts"].cast(pa.int64()).to_numpy(zero_copy_only=False)
        val = batch["value"].to_numpy(zero_copy_only=False)
        et = np.asarray(batch["event_type"].to_pandas())
        base = ts // HOP_US * HOP_US
        k = np.arange(nhops, dtype="int64")
        ws = (base[None, :] - (k * HOP_US)[:, None]).ravel()
        df = pd.DataFrame(
            {
                "window_start": ws,
                "event_type": np.tile(et, nhops),
                "value": np.tile(val, nhops),
            }
        )
        out = df.groupby(["window_start", "event_type"], as_index=False
                         ).agg(p_n=("value", "size"), p_sum=("value", "sum"))
        out["bucket"] = (out["window_start"] // HOP_US) % width
        return out

    def combine(g: pd.DataFrame) -> pd.DataFrame:
        out = g.groupby(["window_start", "event_type"], as_index=False
                        ).agg(n_events=("p_n", "sum"), sum_value=("p_sum", "sum"))
        out["window_start"] = pd.to_datetime(out["window_start"], unit="us"
                                             ).astype("datetime64[us]")
        out["n_events"] = out["n_events"].astype("int64")
        out["sum_value"] = np.round(out["sum_value"], 4)
        return out[["window_start", "event_type", "n_events", "sum_value"]]

    # output is one row per (window, type) — it grows with the stream's
    # time span, so it too stays a streaming Dataset
    return (
        read_parquet_clean(f"{sf_dir}/events.parquet",
                           columns=["ts", "event_type", "value"])
        .map_batches(partial, batch_format="pyarrow", batch_size=65536)
        .groupby("bucket")
        .map_groups(lambda g: combine(g.drop(columns=["bucket"])),
                    batch_format="pandas")
    )
