"""Phase-level timing probe for the join_window_stream_replay gate:
setup (bounds + bucket writes + sentinels) vs streaming execution vs
post (parquet land + read-back).  Per-batch durations come from the
query's recentProgress.  Measurement-only tool (guide §1)."""

from __future__ import annotations

import json
import os
import sys
import time

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, ROOT)


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"

    import __spark_entry__ as entry
    from pyspark.sql import functions as F
    from csp_gateway_spark.session import get_spark, load_tables

    spark = get_spark("probe-jw")
    spark.sparkContext.setLogLevel("ERROR")
    load_tables(spark, sf_dir)

    # replicate q_join_window_stream_replay with phase timestamps
    import shutil

    for _rep in range(int(os.environ.get("REPS", "1"))):
        _run(spark, entry, F, sf_dir)


def _run(spark, entry, F, sf_dir):
    import shutil

    t0 = time.time()
    ev = entry._t(spark, sf_dir, "events").select(
        "event_id", "user_id", "event_type", "value", "ts"
    ).filter(F.col("event_type").isin("click", "purchase"))
    ev = ev.localCheckpoint(eager=True)
    t_ckpt = time.time()
    root = entry._gate_tmpdir(prefix="probe_jw_")
    src_dir = os.path.join(root, "src")
    bounds = ev.agg(F.min("ts").alias("_mn"), F.max("ts").alias("_mx")).collect()[0]
    t_bounds = time.time()
    span = max(1, int(bounds._mx) - int(bounds._mn) + 1)
    bucketed = ev.withColumn(
        "_b", ((F.col("ts") - F.lit(int(bounds._mn))) * 3 / F.lit(span)).cast("int")
    )
    for k in range(3):
        bucketed.filter(F.col("_b") == k).drop("_b").coalesce(1).write.mode(
            "append"
        ).parquet(src_dir)
    t_buckets = time.time()
    for days in (3, 6, 9):
        sentinel_ts = int(bounds._mx) + days * 24 * 3600 * 1_000_000_000
        spark.createDataFrame(
            [(-1, -1, "click", 0.0, sentinel_ts), (-1, -1, "purchase", 0.0, sentinel_ts)],
            ev.schema,
        ).coalesce(1).write.mode("append").parquet(src_dir)
    t_sent = time.time()
    schema = ev.schema

    def side(ty, ts_name):
        return (
            spark.readStream.schema(schema)
            .option("maxFilesPerTrigger", "1")
            .parquet(src_dir)
            .filter(F.col("event_type") == ty)
            .withColumn(ts_name, F.expr("timestamp_micros(ts div 1000)"))
            .withWatermark(ts_name, "2 hours")
        )

    clicks = side("click", "_cts").select(
        F.col("event_id").alias("click_id"), F.col("user_id").alias("_cu"), "_cts"
    )
    purchases = side("purchase", "_pts").select(
        F.col("event_id").alias("purchase_id"),
        F.col("user_id").alias("_pu"),
        F.col("value").alias("_pv"),
        "_pts",
    )
    joined = clicks.join(
        purchases,
        (F.col("_cu") == F.col("_pu"))
        & (F.col("_pts") >= F.col("_cts"))
        & (F.col("_pts") <= F.col("_cts") + F.expr("INTERVAL 1 HOUR")),
        "inner",
    )
    agg = joined.groupBy(
        F.window("_cts", "1 day").alias("_w"), F.col("_cu").alias("user_id")
    ).agg(F.count(F.lit(1)).cast("long").alias("n_pairs"), F.sum("_pv").alias("_sv"))
    table = f"probe_jw_tbl_{int(time.time()*1000)}"
    prev_multi = spark.conf.get(
        "spark.sql.streaming.statefulOperator.allowMultipleStatefulOperators", "false"
    )
    spark.conf.set(
        "spark.sql.streaming.statefulOperator.allowMultipleStatefulOperators", "true"
    )
    try:
        with entry._replay_shuffle(spark, n=2):
            q = (
                agg.writeStream.outputMode("append")
                .format("memory")
                .queryName(table)
                .option("checkpointLocation", os.path.join(root, "ckpt"))
                .trigger(availableNow=True)
                .start()
            )
            q.awaitTermination()
            prog = [json.loads(p.json) for p in q.recentProgress]
    finally:
        spark.conf.set(
            "spark.sql.streaming.statefulOperator.allowMultipleStatefulOperators",
            prev_multi,
        )
    t_stream = time.time()
    out = spark.table(table).filter(F.col("user_id") >= 0).select(
        F.col("_w.start").cast("long").alias("window_start"),
        "user_id",
        "n_pairs",
        (F.round("_sv", 6) + F.lit(0.0)).alias("purchase_sum"),
    )
    state_out = os.path.join(root, "state_out")
    out.write.mode("overwrite").parquet(state_out)
    n = spark.read.parquet(state_out).count()
    t_post = time.time()
    shutil.rmtree(root, ignore_errors=True)

    print(f"rows={n}")
    print(f"localCheckpoint : {t_ckpt - t0:7.3f}")
    print(f"bounds collect  : {t_bounds - t_ckpt:7.3f}")
    print(f"bucket writes   : {t_buckets - t_bounds:7.3f}")
    print(f"sentinel writes : {t_sent - t_buckets:7.3f}")
    print(f"stream replay   : {t_stream - t_sent:7.3f}")
    print(f"post land+read  : {t_post - t_stream:7.3f}")
    print(f"TOTAL           : {t_post - t0:7.3f}")
    for p in prog:
        dms = p.get("durationMs", {})
        print(
            f"  batch {p.get('batchId')}: total={p.get('batchDuration')}ms "
            f"addBatch={dms.get('addBatch')} getBatch={dms.get('getBatch')} "
            f"latestOffset={dms.get('latestOffset')} queryPlanning={dms.get('queryPlanning')} "
            f"commitOffsets={dms.get('commitOffsets')} walCommit={dms.get('walCommit')} "
            f"rows={p.get('numInputRows')}"
        )


if __name__ == "__main__":
    main()
