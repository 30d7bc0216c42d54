"""Edge-case pins for the exact quantile / exact distinct operators.

The driver-contract test compares both against DuckDB on the corpus;
these pin the parts the corpus may never exercise: the discrete-rank
boundary (q*n exactly integral, where float epsilon could flip the
ceil) and the cross-batch global dedupe."""

from __future__ import annotations

import duckdb
import numpy as np
import pandas as pd

from img2table_ray.pipelines import relational


def _quantiles_vs_duckdb(prices):
    df = pd.DataFrame(
        {"l_returnflag": ["A"] * len(prices), "l_extendedprice": prices}
    )
    want = duckdb.connect().execute(
        "SELECT quantile_disc(l_extendedprice, 0.25) AS p25,"
        " quantile_disc(l_extendedprice, 0.5) AS p50,"
        " quantile_disc(l_extendedprice, 0.75) AS p75,"
        " quantile_disc(l_extendedprice, 0.95) AS p95 FROM df"
    ).fetchdf()
    return want


def test_quantile_rank_boundaries(tmp_path, ray_session):
    # n = 20: q*n is exactly integral for every q in the set — the case
    # where a naive rank formula off by one float epsilon diverges.
    # Repeated values exercise the value-count merge (cum counts jump >1).
    prices = [float(v) for v in
              [10, 10, 10, 20, 30, 30, 40, 50, 50, 50,
               60, 70, 70, 80, 90, 90, 90, 100, 110, 120]]
    df = pd.DataFrame({
        "l_returnflag": ["A"] * len(prices),
        "l_linestatus": ["O"] * len(prices),
        "l_extendedprice": prices,
    })
    df.to_parquet(tmp_path / "lineitem.parquet", index=False)
    got = relational.group_quantiles(str(tmp_path))
    want = _quantiles_vs_duckdb(prices)
    assert int(got["n_rows"].iloc[0]) == 20
    for c in ("p25", "p50", "p75", "p95"):
        assert got[c].iloc[0] == want[c].iloc[0], c


def test_distinct_users_dedupes_across_batches(tmp_path, ray_session):
    # The same (day, user) pair arriving in MANY batches must count once:
    # enough rows to span several 65536-row... too slow; instead force
    # multiple input blocks with repeated pairs via parquet row groups.
    n = 8192
    df = pd.DataFrame(
        {
            "event_id": np.arange(n, dtype="int64"),
            "ts": pd.Timestamp("2026-03-01 12:00:00")
            + pd.to_timedelta(np.arange(n) % 48, unit="h"),
            "user_id": (np.arange(n, dtype="int64") % 7),
            "event_type": "view",
            "value": 1.0,
            "props": "",
        }
    )
    df["ts"] = df["ts"].astype("datetime64[us]")
    df.to_parquet(tmp_path / "events.parquet", index=False, row_group_size=512)
    got = relational.distinct_users_daily(str(tmp_path))
    # 48 hourly offsets starting at noon span 3 calendar days; the user
    # cycle hits every user on every day, so each day counts exactly 7
    assert len(got) == 3
    assert list(got["n_users"]) == [7, 7, 7]


def test_topk_ties_across_batches(tmp_path, ray_session):
    # 6 orders in ONE nation all tied at the same price, spread across
    # multiple input blocks: the global top-3 must be the 3 smallest
    # orderkeys (the declared tie-break), regardless of which batch each
    # row arrived in.
    n = pd.DataFrame({"n_nationkey": [0], "n_name": ["ALGERIA"]})
    c = pd.DataFrame({"c_custkey": [1], "c_nationkey": [0]})
    o = pd.DataFrame(
        {
            "o_orderkey": [60, 50, 40, 30, 20, 10],
            "o_custkey": [1] * 6,
            "o_totalprice": [500.0] * 6,
        }
    )
    n.to_parquet(tmp_path / "nation.parquet", index=False)
    c.to_parquet(tmp_path / "customer.parquet", index=False)
    o.to_parquet(tmp_path / "orders.parquet", index=False, row_group_size=2)
    got = relational.top_orders_per_nation(str(tmp_path))
    assert list(got["o_orderkey"]) == [10, 20, 30]
    assert list(got["rank"]) == [1, 2, 3]
