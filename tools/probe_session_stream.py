"""Root-cause probe for session_stream_replay's gen10x ratio
(VERDICT r12 #3): run the gate's exact session-window replay at
sf0.1 and gen10x, capturing per-trigger durations and state-store
row counts from StreamingQuery progress, plus the output session
count — the decomposition that says whether the growth is volume
(linear), state (merge amplification), or trigger floor.

Usage: python tools/probe_session_stream.py [sf_dir ...]
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def probe(spark, sf_dir: str) -> dict:
    import shutil
    import tempfile

    from pyspark.sql import functions as F

    import __spark_entry__ as e

    ev = e._t(spark, sf_dir, "events").select("event_id", "user_id", "ts", "value")
    root = tempfile.mkdtemp(prefix="probe_sstream_", dir="/dev/shm")
    src_dir = os.path.join(root, "src")
    ev.withColumn("_b", F.pmod(F.hash("event_id"), F.lit(6))).repartition(
        6, "_b"
    ).drop("_b").write.mode("overwrite").parquet(src_dir)
    stream = (
        spark.readStream.schema(ev.schema)
        .option("maxFilesPerTrigger", "1")
        .parquet(src_dir)
    )
    agg = (
        stream.withColumn("_ets", F.expr("timestamp_micros(ts div 1000)"))
        .groupBy(F.session_window("_ets", "30 minutes"), "user_id")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum(F.col("value").cast("decimal(18,2)")).alias("sum_value"),
        )
    )
    table = f"probe_sstream_{os.getpid()}"
    t0 = time.time()
    with e._replay_shuffle(spark):
        q = (
            agg.writeStream.outputMode("complete")
            .format("memory")
            .queryName(table)
            .option("checkpointLocation", os.path.join(root, "ckpt"))
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()
    wall = round(time.time() - t0, 2)
    triggers = []
    for p in q.recentProgress:
        so = (p.get("stateOperators") or [{}])[0]
        triggers.append(
            {
                "batch": p.get("batchId"),
                "input_rows": p.get("numInputRows"),
                "batch_ms": (p.get("durationMs") or {}).get("triggerExecution"),
                "state_rows": so.get("numRowsTotal"),
                "state_updated": so.get("numRowsUpdated"),
                "output_rows": (p.get("sink") or {}).get("numOutputRows"),
            }
        )
    n_sessions = spark.table(table).count()
    n_users = spark.table(table).select("user_id").distinct().count()
    shutil.rmtree(root, ignore_errors=True)
    return {
        "sf_dir": sf_dir,
        "wall_sec": wall,
        "events": ev.count(),
        "sessions": n_sessions,
        "users": n_users,
        "triggers": triggers,
    }


def main() -> None:
    from csp_gateway_spark.session import get_spark

    dirs = sys.argv[1:] or ["/root/testdata/sf0.1", "/dev/shm/spark_graft_gen10x"]
    spark = get_spark("probe-sstream")
    spark.sparkContext.setLogLevel("ERROR")
    for d in dirs:
        # warm then measured (matches the scaling harness)
        probe(spark, d)
        out = probe(spark, d)
        print(json.dumps(out))


if __name__ == "__main__":
    main()
