"""Warm A/B probe for the join_window replay's streaming section: same
bucketed source dir, different harness confs, min-of-2 timings.
Measurement-only tool (guide §1)."""

from __future__ import annotations

import json
import os
import sys
import time

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, ROOT)


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"

    import shutil

    import __spark_entry__ as entry
    from pyspark.sql import functions as F
    from csp_gateway_spark.session import get_spark, load_tables

    spark = get_spark("probe-jw-var")
    spark.sparkContext.setLogLevel("ERROR")
    load_tables(spark, sf_dir)

    ev = entry._t(spark, sf_dir, "events").select(
        "event_id", "user_id", "event_type", "value", "ts"
    ).filter(F.col("event_type").isin("click", "purchase"))
    ev = ev.localCheckpoint(eager=True)
    root = entry._gate_tmpdir(prefix="probe_jwv_")
    src_dir = os.path.join(root, "src")
    bounds = ev.agg(F.min("ts").alias("_mn"), F.max("ts").alias("_mx")).collect()[0]
    span = max(1, int(bounds._mx) - int(bounds._mn) + 1)
    bucketed = ev.withColumn(
        "_b", ((F.col("ts") - F.lit(int(bounds._mn))) * 3 / F.lit(span)).cast("int")
    )
    for k in range(3):
        bucketed.filter(F.col("_b") == k).drop("_b").coalesce(1).write.mode(
            "append"
        ).parquet(src_dir)
    for days in (3, 6, 9):
        sentinel_ts = int(bounds._mx) + days * 24 * 3600 * 1_000_000_000
        spark.createDataFrame(
            [(-1, -1, "click", 0.0, sentinel_ts), (-1, -1, "purchase", 0.0, sentinel_ts)],
            ev.schema,
        ).coalesce(1).write.mode("append").parquet(src_dir)
    schema = ev.schema

    def build():
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
        return joined.groupBy(
            F.window("_cts", "1 day").alias("_w"), F.col("_cu").alias("user_id")
        ).agg(F.count(F.lit(1)).cast("long").alias("n_pairs"), F.sum("_pv").alias("_sv"))

    prev_multi = spark.conf.get(
        "spark.sql.streaming.statefulOperator.allowMultipleStatefulOperators", "false"
    )
    spark.conf.set(
        "spark.sql.streaming.statefulOperator.allowMultipleStatefulOperators", "true"
    )

    run_no = [0]

    def run_once(n_part, confs):
        run_no[0] += 1
        table = f"probe_jwv_{run_no[0]}"
        ckpt = os.path.join(root, f"ckpt_{run_no[0]}")
        prev = {}
        for k, v in confs.items():
            prev[k] = spark.conf.get(k, None)
            spark.conf.set(k, v)
        try:
            with entry._replay_shuffle(spark, n=n_part):
                t0 = time.time()
                q = (
                    build().writeStream.outputMode("append")
                    .format("memory")
                    .queryName(table)
                    .option("checkpointLocation", ckpt)
                    .trigger(availableNow=True)
                    .start()
                )
                q.awaitTermination()
                took = time.time() - t0
                nrow = spark.table(table).filter(F.col("user_id") >= 0).count()
                prog = [json.loads(p.json) for p in q.recentProgress]
        finally:
            for k, v in prev.items():
                if v is None:
                    try:
                        spark.conf.unset(k)
                    except Exception:
                        pass
                else:
                    spark.conf.set(k, v)
            spark.catalog.dropTempView(table)
            shutil.rmtree(ckpt, ignore_errors=True)
        return took, nrow, prog

    variants = [
        ("baseline n=2", 2, {}),
        ("n=2 codegen off", 2, {"spark.sql.codegen.wholeStage": "false"}),
        ("n=1 codegen off", 1, {"spark.sql.codegen.wholeStage": "false"}),
        ("n=2 again", 2, {}),
        ("n=2 codegen off again", 2, {"spark.sql.codegen.wholeStage": "false"}),
        ("n=2 factory off", 2, {"spark.sql.codegen.factoryMode": "NO_CODEGEN", "spark.sql.codegen.wholeStage": "false"}),
    ]
    # warm once
    run_once(2, {})
    for name, n_part, confs in variants:
        try:
            took, nrow, prog = run_once(n_part, confs)
            batches = " ".join(
                f"{p.get('batchId')}:{p.get('batchDuration')}ms" for p in prog
            )
            print(f"{name:24s} rows={nrow} took={took:6.3f}  [{batches}]")
        except Exception as e:  # noqa: BLE001
            print(f"{name:24s} ERROR {type(e).__name__}: {str(e)[:200]}")
    shutil.rmtree(root, ignore_errors=True)


if __name__ == "__main__":
    main()
