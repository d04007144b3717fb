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


def test_streaming_session_windows(spark, tmp_path):
    """Sessions merge events within the gap and split across it;
    watermark advance finalizes closed sessions."""
    from csp_gateway_spark.streaming.event_time import session_counts

    src = tmp_path / "sess"
    src.mkdir()
    stream = spark.readStream.schema("ts timestamp, user string").json(str(src))
    agg = session_counts(stream, "ts", ["user"], gap="30 seconds", watermark="10 seconds")
    q = (
        agg.writeStream.outputMode("append")
        .format("memory")
        .queryName("sess")
        .option("checkpointLocation", str(tmp_path / "ck"))
        .start()
    )
    try:
        _drop(src, "b1.json", [
            {"ts": "2026-01-01T10:00:00", "user": "a"},
            {"ts": "2026-01-01T10:00:20", "user": "a"},   # same session (20s gap)
            {"ts": "2026-01-01T10:02:00", "user": "a"},   # new session (>30s)
        ])
        _drop(src, "b2.json", [{"ts": "2026-01-01T10:10:00", "user": "z"}])  # advance watermark
        q.processAllAvailable()
        rows = {(str(r.sess_start), r.user): r.n for r in spark.table("sess").collect()}
        assert rows[("2026-01-01 10:00:00", "a")] == 2  # merged session
        assert rows[("2026-01-01 10:02:00", "a")] == 1  # split session
    finally:
        q.stop()
