"""Hypertable rollup cascade (operators/rollup.py).

Reference analogue: interval-buffered UI push batches
(csp_gateway/server/modules/web/perspective.py:491-515) generalized to
TimescaleDB-style continuous aggregates for the batch/100 TB case.
"""

import pytest
from pyspark.sql import functions as F

from csp_gateway_spark.operators.rollup import (
    bucket_start_sec,
    hypertable_rollup,
    rollup_union,
)

NS = 1_000_000_000


@pytest.fixture(scope="module")
def events(spark):
    rows = [
        # (ts_ns, event_type, value) — spans 3 one-minute buckets
        (1_700_000_000 * NS + 5 * NS, "a", 1.0),
        (1_700_000_000 * NS + 30 * NS, "a", 2.5),
        (1_700_000_060 * NS + 1 * NS, "a", 4.0),
        (1_700_000_060 * NS + 2 * NS, "b", 8.0),
        (1_700_003_600 * NS, "a", 16.0),
    ]
    return spark.createDataFrame(rows, "ts long, event_type string, value double")


def test_bucket_edges_are_exact_integers(spark):
    # epoch-ns values exceed 2^53: double math would corrupt edges.
    # 2200-01-01 ≈ 7.26e18 ns — far outside double's exact-integer range.
    big = 7_258_248_000 * NS + 59 * NS
    df = spark.createDataFrame([(big,), (-5 * NS,)], "ts long")
    out = df.select(bucket_start_sec(F.col("ts"), 60).alias("b")).collect()
    assert out[0]["b"] == 7_258_248_000 - 7_258_248_000 % 60
    # pre-1970: floor semantics (−5 s lands in the [−60, 0) bucket)
    assert out[1]["b"] == -60


def test_rollup_nesting_validated(events):
    with pytest.raises(ValueError, match="must nest"):
        hypertable_rollup(events, widths_sec=(60, 90))


def test_coarse_level_equals_raw_scan(events):
    levels = hypertable_rollup(events, widths_sec=(60, 3600))
    via_cascade = {
        (r["bucket_start"], r["event_type"]): (r["n"], float(r["sum_value"]))
        for r in levels[3600].collect()
    }
    raw = (
        events.groupBy(
            bucket_start_sec(F.col("ts"), 3600).alias("bucket_start"), "event_type"
        )
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum(F.col("value").cast("decimal(18,2)")).alias("sum_value"),
        )
        .collect()
    )
    via_raw = {
        (r["bucket_start"], r["event_type"]): (r["n"], float(r["sum_value"]))
        for r in raw
    }
    assert via_cascade == via_raw


def test_sum_keeps_widened_precision(events):
    levels = hypertable_rollup(events, widths_sec=(60,))
    field = dict(levels[60].dtypes)["sum_value"]
    # natural result type of SUM(decimal(18,2)) — never narrowed back
    assert field == "decimal(28,2)"


def test_rollup_union_stacks_levels(events):
    levels = hypertable_rollup(events, widths_sec=(60, 3600))
    u = rollup_union(levels, keys=("event_type",))
    res = {r["res_sec"] for r in u.select("res_sec").distinct().collect()}
    assert res == {60, 3600}


def test_streaming_finest_feeds_the_cascade(spark, tmp_path):
    """The continuous-aggregate ingestion path: a streaming finest level
    (append mode, watermark-finalized buckets) re-aggregates through
    coarsen_level to exactly what the batch cascade computes."""
    import json as _json

    from csp_gateway_spark.operators.rollup import (
        coarsen_level,
        hypertable_rollup,
        streaming_finest,
    )

    src = tmp_path / "src"
    src.mkdir()
    rows = [
        {"ts": "2026-01-01T10:00:05", "event_type": "a", "value": 1.0},
        {"ts": "2026-01-01T10:00:30", "event_type": "a", "value": 2.5},
        {"ts": "2026-01-01T10:01:02", "event_type": "b", "value": 8.0},
        {"ts": "2026-01-01T10:59:59", "event_type": "a", "value": 4.0},
    ]
    with open(src / "b1.json", "w") as fh:
        for r in rows:
            fh.write(_json.dumps(r) + "\n")
    stream = spark.readStream.schema("ts timestamp, event_type string, value double").json(
        str(src)
    )
    q = (
        streaming_finest(stream, width_sec=60)
        .writeStream.outputMode("append")
        .format("memory")
        .queryName("finest60")
        .option("checkpointLocation", str(tmp_path / "ck"))
        .start()
    )
    try:
        q.processAllAvailable()
        # sentinel far ahead advances the watermark -> finalize everything real
        with open(src / "b2.json", "w") as fh:
            fh.write(_json.dumps({"ts": "2026-01-01T13:00:00", "event_type": "x", "value": 0.0}) + "\n")
        q.processAllAvailable()
    finally:
        q.stop()

    finest = spark.table("finest60").filter(F.col("event_type") != "x")
    via_stream = {
        (r["bucket_start"], r["event_type"]): (r["n"], float(r["sum_value"]))
        for r in coarsen_level(finest, ["event_type"], 3600).collect()
    }

    # batch cascade over the same data (ts as epoch nanos)
    import datetime

    NS = 1_000_000_000
    batch = spark.createDataFrame(
        [
            (
                int(
                    datetime.datetime.fromisoformat(r["ts"])
                    .replace(tzinfo=datetime.timezone.utc)
                    .timestamp()
                )
                * NS,
                r["event_type"],
                r["value"],
            )
            for r in rows
        ],
        "ts long, event_type string, value double",
    )
    levels = hypertable_rollup(batch, widths_sec=(60, 3600))
    via_batch = {
        (r["bucket_start"], r["event_type"]): (r["n"], float(r["sum_value"]))
        for r in levels[3600].collect()
    }
    assert via_stream == via_batch
