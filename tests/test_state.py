"""Keyed-last state semantics (reference state.py:165-225 test model:
tests/server/gateway/csp/test_state.py)."""

import pyspark.sql.functions as F
import pytest

from csp_gateway_spark.operators.state import computed_index, keyed_last, last_tick, upsert_table


def test_keyed_last_picks_latest(spark):
    df = spark.createDataFrame(
        [("a", 1, 10.0), ("a", 2, 20.0), ("b", 1, 30.0)],
        "key string, seq int, px double",
    )
    out = keyed_last(df, ["key"], order_by=["seq"]).collect()
    assert [(r.key, r.px) for r in out] == [("a", 20.0), ("b", 30.0)]


def test_keyed_last_null_keys_first(spark):
    df = spark.createDataFrame(
        [(None, 1, 1.0), ("a", 1, 2.0)], "key string, seq int, px double"
    )
    out = keyed_last(df, ["key"], order_by=["seq"]).collect()
    assert out[0].key is None  # NULLS FIRST (reference state.py:193)


def test_keyed_last_multi_key(spark):
    df = spark.createDataFrame(
        [("a", "x", 1, 1.0), ("a", "x", 2, 2.0), ("a", "y", 1, 3.0)],
        "k1 string, k2 string, seq int, px double",
    )
    out = keyed_last(df, ["k1", "k2"], order_by=["seq"]).collect()
    assert [(r.k1, r.k2, r.px) for r in out] == [("a", "x", 2.0), ("a", "y", 3.0)]


def test_last_tick(spark):
    df = spark.createDataFrame([(1, "p"), (3, "q"), (2, "r")], "seq int, v string")
    assert last_tick(df, order_by=["seq"]).collect()[0].v == "q"


def test_upsert_limit(spark):
    rows = [(f"k{i % 3}", i, float(i)) for i in range(10)]
    df = spark.createDataFrame(rows, "key string, seq int, px double")
    out = upsert_table(df, ["key"], order_by=["seq"], limit=2).collect()
    assert len(out) == 2
    assert sorted(r.seq for r in out) == [8, 9]


def test_computed_index(spark):
    df = spark.createDataFrame([("a", 1)], "x string, y int")
    out = computed_index(df, ["x", "y"]).collect()[0]
    assert out["index"] == "a-1"  # "-".join semantics (perspective.py:468-475)


def test_state_query_matches_duckdb(spark, events, sf_dir):
    import duckdb

    out = (
        keyed_last(events, ["user_id"], order_by=["ts", "event_id"])
        .select("user_id", "event_id")
        .collect()
    )
    con = duckdb.connect()
    exp = con.execute(
        f"""SELECT user_id, event_id FROM (
              SELECT *, row_number() OVER (PARTITION BY user_id ORDER BY ts DESC, event_id DESC) rn
              FROM read_parquet('{sf_dir}/events.parquet')) WHERE rn=1 ORDER BY user_id"""
    ).fetchall()
    assert [(r.user_id, r.event_id) for r in out] == exp


def test_scd2_versions(spark):
    from csp_gateway_spark.operators.state import scd2

    rows = [
        (1, "a", 10), (1, "a", 20), (1, "b", 30), (1, "b", 40), (1, "a", 50),
        (2, "x", 5),
    ]
    df = spark.createDataFrame(rows, "k long, attr string, ts long")
    out = scd2(df, keys=["k"], ts_col="ts", attr_cols=["attr"]).collect()
    k1 = sorted([r for r in out if r.k == 1], key=lambda r: r.valid_from)
    # runs collapse: a[10,30) b[30,50) a[50,∞)
    assert [(r.attr, r.valid_from, r.valid_to) for r in k1] == [
        ("a", 10, 30), ("b", 30, 50), ("a", 50, None)
    ]
    assert [r.is_current for r in k1] == [False, False, True]
    (k2,) = [r for r in out if r.k == 2]
    assert k2.attr == "x" and k2.is_current


def test_agg_state_merge_equals_full(spark):
    from csp_gateway_spark.operators.state import agg_state, merge_agg_state

    rows = [("a", 1.0), ("a", 2.0), ("b", 5.0), ("a", 3.0), ("b", 1.0)]
    df = spark.createDataFrame(rows, "k string, v double")
    full = {r.k: r for r in agg_state(df, ["k"], "v").collect()}
    base = agg_state(df.limit(2), ["k"], "v")
    delta = agg_state(df.subtract(df.limit(2)), ["k"], "v")
    merged = {r.k: r for r in merge_agg_state(base, delta, ["k"]).collect()}
    for k in full:
        assert merged[k].n == full[k].n
        assert merged[k].sum_v == full[k].sum_v
        assert merged[k].min_v == full[k].min_v
        assert merged[k].max_v == full[k].max_v


def test_scd2_keeps_first_version_with_all_null_attrs(spark):
    """A key whose FIRST row has NULL attrs must still open a version
    (ADVICE r4: lag's no-previous-row NULL collides with a genuine
    NULL attribute under eqNullSafe)."""
    from csp_gateway_spark.operators.state import scd2

    df = spark.createDataFrame(
        [(1, 100, None), (1, 200, "a"), (2, 100, None), (2, 200, None)],
        "k long, ts long, attr string",
    )
    out = scd2(df, keys=["k"], ts_col="ts", attr_cols=["attr"]).collect()
    by_key = {}
    for r in out:
        by_key.setdefault(r.k, []).append((r.valid_from, r.attr))
    assert sorted(by_key[1]) == [(100, None), (200, "a")]
    # key 2 never changes: one opening NULL version, still current
    assert by_key[2] == [(100, None)]
