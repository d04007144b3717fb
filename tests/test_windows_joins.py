"""Window + join operators."""

import pyspark.sql.functions as F
import pytest

from csp_gateway_spark.operators.joins import asof_join, interval_join, merge
from csp_gateway_spark.operators.windows import sessionize, sliding, tumbling


def test_tumbling_buckets(spark):
    df = spark.createDataFrame(
        [(0,), (999_999_999,), (1_000_000_000,), (3_500_000_000,)], "ts long"
    )
    out = {r.bucket_start: r.n for r in tumbling(df, "ts", 1).collect()}
    assert out == {0: 2, 1: 1, 3: 1}


def test_sliding_membership(spark):
    df = spark.createDataFrame([(5_000_000_000,)], "ts long")
    out = sorted(r.bucket_start for r in sliding(df, "ts", 4, 2).collect())
    assert out == [2, 4]  # [2,6) and [4,8) contain t=5


def test_sessionize(spark):
    rows = [("u", 0), ("u", 10), ("u", 100), ("v", 0)]
    df = spark.createDataFrame(rows, "user string, t long")
    out = sessionize(df, "t", 50, keys=["user"]).collect()
    by_user = {}
    for r in out:
        by_user.setdefault(r.user, []).append((r.session_start, r.n))
    assert sorted(by_user["u"]) == [(0, 2), (100, 1)]
    assert by_user["v"] == [(0, 1)]


def test_asof_basic(spark):
    left = spark.createDataFrame([("k", 10, "L1"), ("k", 20, "L2")], "k string, t long, lv string")
    right = spark.createDataFrame(
        [("k", 5, "R1"), ("k", 10, "R2"), ("k", 15, "R3")], "k string, t long, rv string"
    )
    out = {r.lv: r.rv for r in asof_join(left, right, ["k"], "t", "t", right_cols=["rv"]).collect()}
    assert out == {"L1": "R2", "L2": "R3"}  # inclusive on equal ts


def test_asof_no_match_is_null(spark):
    left = spark.createDataFrame([("k", 1, "L")], "k string, t long, lv string")
    right = spark.createDataFrame([("k", 5, "R")], "k string, t long, rv string")
    out = asof_join(left, right, ["k"], "t", "t", right_cols=["rv"]).collect()
    assert out[0].rv is None


def test_asof_tolerance(spark):
    left = spark.createDataFrame([("k", 100, "L")], "k string, t long, lv string")
    right = spark.createDataFrame([("k", 10, "R")], "k string, t long, rv string")
    out = asof_join(left, right, ["k"], "t", "t", right_cols=["rv"], tolerance=10).collect()
    assert out[0].rv is None  # 90 > tolerance


def test_interval_join(spark):
    left = spark.createDataFrame([("k", 10, 1)], "k string, t long, lid int")
    right = spark.createDataFrame(
        [("k", 12, 2), ("k", 30, 3)], "k string, t long, rid int"
    )
    out = interval_join(left, right, ["k"], "t", "t", lower=0, upper=5).collect()
    assert len(out) == 1 and out[0].rid == 2


def test_merge_allow_missing(spark):
    a = spark.createDataFrame([(1, "x")], "id int, a string")
    b = spark.createDataFrame([(2, "y")], "id int, b string")
    out = merge(a, b).collect()
    assert len(out) == 2
    assert {r.id for r in out} == {1, 2}
