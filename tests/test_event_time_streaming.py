"""Watermark semantics driven through a real streaming query: on-time
rows aggregate, watermark advance finalizes windows (append emission),
and a too-late row is dropped by the engine."""

import json

from csp_gateway_spark.streaming.event_time import windowed_counts


def _drop(src, name, rows):
    with open(src / name, "w") as f:
        for r in rows:
            f.write(json.dumps(r) + "\n")


def test_watermark_finalizes_and_drops_late(spark, tmp_path):
    src = tmp_path / "ev"
    src.mkdir()
    stream = spark.readStream.schema("ts timestamp, user string").json(str(src))
    agg = windowed_counts(stream, "ts", window="1 minute", watermark="10 seconds")
    q = (
        agg.writeStream.outputMode("append")
        .format("memory")
        .queryName("win_counts")
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .start()
    )
    try:
        # two rows in the 10:00 window
        _drop(src, "b1.json", [
            {"ts": "2026-01-01T10:00:05", "user": "a"},
            {"ts": "2026-01-01T10:00:20", "user": "b"},
        ])
        q.processAllAvailable()
        # append mode: window not finalized yet (watermark hasn't passed)
        assert spark.table("win_counts").count() == 0

        # event at 10:05 advances the watermark past 10:01 -> finalize
        _drop(src, "b2.json", [{"ts": "2026-01-01T10:05:00", "user": "c"}])
        q.processAllAvailable()
        rows = {str(r.win_start): r.n for r in spark.table("win_counts").collect()}
        assert rows.get("2026-01-01 10:00:00") == 2

        # a LATE row for the already-finalized 10:00 window: dropped
        _drop(src, "b3.json", [{"ts": "2026-01-01T10:00:30", "user": "late"}])
        # plus a fresh row far ahead to force another finalization round
        _drop(src, "b4.json", [{"ts": "2026-01-01T10:20:00", "user": "d"}])
        q.processAllAvailable()
        rows = {str(r.win_start): r.n for r in spark.table("win_counts").collect()}
        assert rows["2026-01-01 10:00:00"] == 2  # late row did NOT bump the count
        assert rows.get("2026-01-01 10:05:00") == 1
    finally:
        q.stop()
