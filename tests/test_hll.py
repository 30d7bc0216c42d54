"""HyperLogLog sketch: estimator accuracy, merge idempotence, and the
pipeline's error bound vs the exact DuckDB count."""

from __future__ import annotations

import duckdb
import numpy as np
import pytest

from img2table_ray.functions.hll import (HLL_M, batch_registers, estimate)


def _dense(reg, rank):
    regs = np.zeros(HLL_M, dtype=np.int64)
    np.maximum.at(regs, reg, rank)
    return regs


@pytest.mark.parametrize("n", [50, 1000, 20000, 300000])
def test_estimate_within_three_sigma(n):
    keys = [f"user-{i}" for i in range(n)]
    regs = _dense(*batch_registers(keys))
    est = estimate(regs)
    # standard error 1.04/sqrt(m) ~ 1.63%; allow 3 sigma
    assert abs(est - n) / n < 3 * 1.04 / np.sqrt(HLL_M)


def test_merge_is_idempotent_and_order_free():
    a = [f"a{i}" for i in range(5000)]
    b = [f"b{i}" for i in range(3000)]
    ra = _dense(*batch_registers(a))
    rb = _dense(*batch_registers(b))
    rall = _dense(*batch_registers(a + b))
    merged = np.maximum(ra, rb)
    np.testing.assert_array_equal(merged, rall)
    # re-merging a duplicated batch changes nothing (retry safety)
    np.testing.assert_array_equal(np.maximum(merged, ra), rall)


def test_batch_registers_dedups_to_register_max():
    reg, rank = batch_registers([f"k{i}" for i in range(100000)])
    assert len(reg) <= HLL_M
    assert len(np.unique(reg)) == len(reg)


def test_pipeline_matches_exact_within_bound(ray_session):
    from img2table_ray.pipelines.relational import approx_distinct_users

    sf = "/root/testdata/sf0.01"
    got = approx_distinct_users(sf).set_index("event_type")["approx_users"]
    con = duckdb.connect()
    con.execute(f"CREATE VIEW events AS SELECT * FROM '{sf}/events.parquet'")
    exact = con.execute(
        "SELECT event_type, count(DISTINCT user_id) n FROM events "
        "GROUP BY event_type").fetchdf().set_index("event_type")["n"]
    assert sorted(got.index) == sorted(exact.index)
    for etype in exact.index:
        err = abs(got[etype] - exact[etype]) / exact[etype]
        assert err < 0.05, (etype, got[etype], exact[etype])
