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


# ---------------------------------------------------------------------------
# streaming HLL: windowed registers finalized per batch
# ---------------------------------------------------------------------------

def test_streaming_hll_matches_batch(spark, tmp_path):
    """Drive the windowed register aggregation through a real streaming
    query; finalized estimates must equal the batch sketch computed
    over the same (window, group) slices — register merging is exact."""
    import json

    from csp_gateway_spark.streaming.sketches import finalize_batch, hll_register_stream

    src = tmp_path / "ev"
    src.mkdir()
    out = []

    def on_batch(batch_df, _bid):
        out.extend(finalize_batch(batch_df, ["k"]).collect())

    stream = spark.readStream.schema("ts timestamp, k string, v long").json(str(src))
    regs = hll_register_stream(stream, ["k"], "v", window="1 minute", watermark="5 seconds")
    q = (
        regs.writeStream.outputMode("append")
        .foreachBatch(on_batch)
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .start()
    )
    try:
        rows = [
            {"ts": f"2026-01-01T10:00:{s:02d}", "k": "a", "v": s % 7} for s in range(50)
        ] + [
            {"ts": f"2026-01-01T10:00:{s:02d}", "k": "b", "v": s} for s in range(50)
        ]
        with open(src / "b1.json", "w") as f:
            for r in rows:
                f.write(json.dumps(r) + "\n")
        q.processAllAvailable()
        # advance the watermark past 10:01 to finalize the window
        with open(src / "b2.json", "w") as f:
            f.write(json.dumps({"ts": "2026-01-01T10:05:00", "k": "a", "v": 1}) + "\n")
        q.processAllAvailable()
    finally:
        q.stop()

    got = {r["k"]: (r["approx_distinct"], r["n"]) for r in out}
    # batch reference over the same window slice
    from csp_gateway_spark.operators.sketches import hll_distinct

    batch = spark.createDataFrame(
        [(r["k"], r["v"]) for r in rows], "k string, v long"
    )
    want = {
        r["k"]: (r["approx_distinct"], r["n"])
        for r in hll_distinct(batch, ["k"], "v").collect()
    }
    assert got == want
    # sanity: the estimates are near the true distinct counts (7 and 50)
    assert abs(got["a"][0] - 7) <= 2
    assert abs(got["b"][0] - 50) <= 10


# ---------------------------------------------------------------------------
# Count-Min sketch
# ---------------------------------------------------------------------------


def test_cms_never_underestimates(events):
    """CMS point estimates are >= the exact count, always."""
    from csp_gateway_spark.operators.sketches import cms_cells, cms_estimate

    rows = events.select(F.col("user_id").cast("string").alias("v"))
    cells = cms_cells(rows, "v")
    est = {
        r["v"]: r["cms_count"]
        for r in cms_estimate(cells, rows.distinct(), "v").collect()
    }
    exact = {
        r["v"]: r["n"]
        for r in rows.groupBy("v").agg(F.count(F.lit(1)).alias("n")).collect()
    }
    assert set(est) == set(exact)
    n_total = sum(exact.values())
    for v, e in exact.items():
        assert est[v] >= e, (v, est[v], e)
        # Markov bound envelope: overestimate ≤ 2n/width with prob
        # 1-e^-4 per value; allow a generous 8n/width before failing.
        assert est[v] - e <= max(8.0 * n_total / 1024, 4), (v, est[v], e)


def test_cms_partitioning_invariant(events):
    from csp_gateway_spark.operators.sketches import cms_topk

    rows = events.select(F.col("event_type").alias("v"))
    one = [tuple(r) for r in cms_topk(rows.coalesce(1), "v", k=5).collect()]
    many = [tuple(r) for r in cms_topk(rows.repartition(16), "v", k=5).collect()]
    assert one == many


def test_cms_cells_merge_as_sum(events):
    """Sharded sketches union+re-aggregate to the whole-corpus sketch —
    the mergeability a streaming/multi-shard build relies on."""
    from csp_gateway_spark.operators.sketches import cms_cells

    rows = events.select(F.col("user_id").cast("string").alias("v"))
    a, b = rows.randomSplit([0.5, 0.5], seed=7)
    whole = {(r["_row"], r["_col"]): r["cnt"] for r in cms_cells(rows, "v").collect()}
    merged = {
        (r["_row"], r["_col"]): r["cnt"]
        for r in cms_cells(a, "v")
        .unionByName(cms_cells(b, "v"))
        .groupBy("_row", "_col")
        .agg(F.sum("cnt").alias("cnt"))
        .collect()
    }
    assert whole == merged


def test_cms_matches_duckdb_oracle(documents):
    """Bit-identical estimates vs the DuckDB mirror on corpus tokens."""
    import duckdb

    from csp_gateway_spark.operators.corpus import token_rows
    from csp_gateway_spark.operators.sketches import cms_oracle_sql, cms_topk

    rows = token_rows(documents).select("token")
    got = [(r["token"], r["cms_count"]) for r in cms_topk(rows, "token", k=10).collect()]
    pdf = token_rows(documents).select("token").toPandas()
    con = duckdb.connect()
    con.register("tokrows", pdf)
    want = con.execute(
        cms_oracle_sql("SELECT token FROM tokrows", "token", k=10)
    ).fetchall()
    assert got == [(t, int(c)) for t, c in want]


def test_streaming_cms_matches_batch(spark, tmp_path):
    """Windowed CMS cells through a real streaming query equal the
    batch sketch over the same window slice — SUM-merge is exact."""
    import json

    from csp_gateway_spark.operators.sketches import cms_cells
    from csp_gateway_spark.streaming.sketches import cms_cell_stream

    src = tmp_path / "cms"
    src.mkdir()
    got = []

    def on_batch(batch_df, _bid):
        got.extend(batch_df.collect())

    stream = spark.readStream.schema("ts timestamp, v string").json(str(src))
    cells = cms_cell_stream(stream, "v", window="1 minute", watermark="5 seconds")
    q = (
        cells.writeStream.outputMode("append")
        .foreachBatch(on_batch)
        .option("checkpointLocation", str(tmp_path / "ckpt_cms"))
        .start()
    )
    try:
        rows = [
            {"ts": f"2026-01-01T10:00:{s:02d}", "v": f"u{s % 9}"} for s in range(50)
        ]
        with open(src / "b1.json", "w") as f:
            for r in rows:
                f.write(json.dumps(r) + "\n")
        q.processAllAvailable()
        with open(src / "b2.json", "w") as f:
            f.write(json.dumps({"ts": "2026-01-01T10:05:00", "v": "late"}) + "\n")
        q.processAllAvailable()
    finally:
        q.stop()
    window_cells = {
        (r["_row"], r["_col"]): r["cnt"]
        for r in got
        if r["win_start"].minute == 0
    }
    batch_df = spark.createDataFrame([(f"u{s % 9}",) for s in range(50)], "v string")
    expect = {(r["_row"], r["_col"]): r["cnt"] for r in cms_cells(batch_df, "v").collect()}
    assert window_cells == expect


# ---------------------------------------------------------------------------
# HDR histogram quantile sketch (sketches.py::hdr_cells/hdr_quantiles)
# ---------------------------------------------------------------------------


def test_hdr_error_bound(spark):
    """Every estimate is within 2^-p relative error of the exact
    nearest-rank percentile (the sketch's accuracy contract)."""
    import random

    from csp_gateway_spark.operators.sketches import HDR_P, hdr_cells, hdr_quantiles

    rnd = random.Random(7)
    vals = [int(rnd.lognormvariate(5, 1.5)) + 1 for _ in range(5000)]
    df = spark.createDataFrame([(v,) for v in vals], "v long")
    out = {r["q"]: r["est"] for r in hdr_quantiles(hdr_cells(df, "v"), (0.5, 0.9, 0.99)).collect()}
    svals = sorted(vals)
    import math

    for q, est in out.items():
        exact = svals[math.ceil(q * len(svals)) - 1]
        assert abs(est - exact) <= exact * 2 ** (1 - HDR_P) + 1, (q, est, exact)


def test_hdr_cells_bounded_and_mergeable(spark):
    from csp_gateway_spark.operators.sketches import hdr_cells, hdr_merge

    df = spark.createDataFrame([(i % 1000 + 1, "g") for i in range(20000)], "v long, g string")
    cells = hdr_cells(df, "v", ["g"])
    n_cells = cells.count()
    assert n_cells <= (64 + 1) * 64  # bounded regardless of 20k rows
    # sketch(A ∪ B) == merge(sketch(A), sketch(B)) — exactly
    a = hdr_cells(df.filter(F.col("v") <= 500), "v", ["g"])
    b = hdr_cells(df.filter(F.col("v") > 500), "v", ["g"])
    merged = {
        (r["bucket"]): r["cnt"] for r in hdr_merge(a.unionByName(b), ["g"]).collect()
    }
    whole = {(r["bucket"]): r["cnt"] for r in cells.collect()}
    assert merged == whole


def test_hdr_handles_zero_and_negative(spark):
    from csp_gateway_spark.operators.sketches import hdr_cells, hdr_quantiles

    df = spark.createDataFrame([(-5,), (0,), (0,), (1,)], "v long")
    cells = hdr_cells(df, "v")
    est = {r["q"]: r["est"] for r in hdr_quantiles(cells, (0.5,)).collect()}
    assert est[0.5] == 0  # negatives clamp to 0; median of {0,0,0,1} is 0


def test_streaming_hdr_matches_batch(spark, tmp_path):
    """Windowed HDR cells through a real streaming query equal the
    batch sketch over the same window slice."""
    import json

    from csp_gateway_spark.operators.sketches import hdr_cells
    from csp_gateway_spark.streaming.sketches import hdr_cell_stream

    src = tmp_path / "hdr"
    src.mkdir()
    got = []

    def on_batch(batch_df, _bid):
        got.extend(batch_df.collect())

    stream = spark.readStream.schema("ts timestamp, v long").json(str(src))
    cells = hdr_cell_stream(stream, "v", window="1 minute", watermark="5 seconds")
    q = (
        cells.writeStream.outputMode("append")
        .foreachBatch(on_batch)
        .option("checkpointLocation", str(tmp_path / "ckpt_hdr"))
        .start()
    )
    try:
        rows = [{"ts": f"2026-01-01T10:00:{s:02d}", "v": (s * 37) % 500} for s in range(50)]
        with open(src / "b1.json", "w") as f:
            for r in rows:
                f.write(json.dumps(r) + "\n")
        q.processAllAvailable()
        with open(src / "b2.json", "w") as f:
            f.write(json.dumps({"ts": "2026-01-01T10:05:00", "v": 1}) + "\n")
        q.processAllAvailable()
    finally:
        q.stop()
    window_cells = {
        r["bucket"]: r["cnt"] for r in got if r["win_start"].minute == 0
    }
    batch_df = spark.createDataFrame([((s * 37) % 500,) for s in range(50)], "v long")
    expect = {r["bucket"]: r["cnt"] for r in hdr_cells(batch_df, "v").collect()}
    assert window_cells == expect
