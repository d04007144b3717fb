"""Streaming per-key custom state across micro-batches (W10): the
GroupState counter accumulates over batches; the TWS variant is
import-gated on protobuf (absent in this container)."""

import json

import pytest

from csp_gateway_spark.streaming.stateful import running_counts, running_counts_gs


def _drop(src, name, rows):
    with open(src / name, "w") as f:
        for r in rows:
            f.write(json.dumps(r) + "\n")


def test_group_state_counter_across_microbatches(spark, tmp_path):
    src = tmp_path / "in"
    src.mkdir()
    stream = spark.readStream.schema("user string, v long").json(str(src))
    q = (
        running_counts_gs(stream, "user")
        .writeStream.outputMode("append")
        .format("memory")
        .queryName("rc_gs")
        .option("checkpointLocation", str(tmp_path / "ck"))
        .start()
    )
    try:
        _drop(src, "b1.json", [{"user": "a", "v": 1}, {"user": "a", "v": 2}, {"user": "b", "v": 3}])
        q.processAllAvailable()
        assert {(r.key, r.n) for r in spark.table("rc_gs").collect()} == {("a", 2), ("b", 1)}
        _drop(src, "b2.json", [{"user": "a", "v": 4}])
        q.processAllAvailable()
        # state persisted across micro-batches: a's count continues 2 -> 3
        assert ("a", 3) in {(r.key, r.n) for r in spark.table("rc_gs").collect()}
    finally:
        q.stop()


def test_tws_counter_or_documented_gate(spark, tmp_path):
    """With protobuf installed the TWS path must work; without it the
    operator raises the documented ImportError immediately (not a
    mid-query executor crash)."""
    try:
        from google.protobuf import descriptor  # noqa: F401

        has_protobuf = True
    except ImportError:
        has_protobuf = False

    src = tmp_path / "in"
    src.mkdir()
    stream = spark.readStream.schema("user string, v long").json(str(src))
    if not has_protobuf:
        with pytest.raises(ImportError, match="protobuf"):
            running_counts(stream, "user")
        return
    _drop(src, "b1.json", [{"user": "a", "v": 1}, {"user": "a", "v": 2}])
    q = (
        running_counts(stream, "user")
        .writeStream.outputMode("update")
        .format("memory")
        .queryName("rc_tws")
        .option("checkpointLocation", str(tmp_path / "ck"))
        .start()
    )
    try:
        q.processAllAvailable()
        assert ("a", 2) in {(r.key, r.n) for r in spark.table("rc_tws").collect()}
    finally:
        q.stop()


def test_transitions_stream_bridges_microbatches(spark, tmp_path):
    """Pairs must span micro-batch boundaries via the carried state,
    and the aggregated stream output must equal the batch operator."""
    from csp_gateway_spark.streaming.stateful import transitions_stream

    src = tmp_path / "tin"
    src.mkdir()
    stream = spark.readStream.schema(
        "user_id long, event_type string, ts long"
    ).json(str(src))
    q = (
        transitions_stream(stream)
        .writeStream.outputMode("append")
        .format("memory")
        .queryName("trans_s")
        .option("checkpointLocation", str(tmp_path / "tck"))
        .start()
    )
    b1 = [
        {"user_id": 1, "event_type": "v", "ts": 1},
        {"user_id": 1, "event_type": "c", "ts": 2},
        {"user_id": 2, "event_type": "v", "ts": 1},
    ]
    b2 = [
        {"user_id": 1, "event_type": "p", "ts": 3},
        {"user_id": 2, "event_type": "c", "ts": 5},
    ]
    try:
        _drop(src, "b1.json", b1)
        q.processAllAvailable()
        got1 = {(r.user_id, r.cur, r.nxt) for r in spark.table("trans_s").collect()}
        assert got1 == {(1, "v", "c")}
        _drop(src, "b2.json", b2)
        q.processAllAvailable()
        got = {(r.user_id, r.cur, r.nxt) for r in spark.table("trans_s").collect()}
        # (1, c->p) and (2, v->c) bridge the batch boundary
        assert got == {(1, "v", "c"), (1, "c", "p"), (2, "v", "c")}
    finally:
        q.stop()

    # parity: aggregated pairs == batch event_transitions on all rows
    from csp_gateway_spark.operators.windows import event_transitions

    batch = spark.createDataFrame(
        [(r["user_id"], r["event_type"], r["ts"]) for r in b1 + b2],
        "user_id long, event_type string, ts long",
    )
    want = {
        (r.cur, r.nxt): r.n
        for r in event_transitions(batch, "user_id", "event_type", ["ts"]).collect()
    }
    got_counts = {}
    for u, c, n in got:
        got_counts[(c, n)] = got_counts.get((c, n), 0) + 1
    assert got_counts == want


def test_cusum_stream_bridges_microbatches(spark, tmp_path):
    """Per-key streaming CUSUM must carry (cum, n) across micro-batch
    boundaries and reproduce the sequential fold exactly."""
    from csp_gateway_spark.streaming.stateful import cusum_stream

    src = tmp_path / "cusum_in"
    src.mkdir()
    stream = spark.readStream.schema(
        "event_type string, value double, ts long"
    ).json(str(src))
    mu, sigma = 2.0, 0.5
    q = (
        cusum_stream(stream, mu, sigma)
        .writeStream.outputMode("append")
        .format("memory")
        .queryName("cusum_s")
        .option("checkpointLocation", str(tmp_path / "cck"))
        .start()
    )
    b1 = [
        {"event_type": "a", "value": 3.0, "ts": 1},
        {"event_type": "a", "value": 1.0, "ts": 2},
        {"event_type": "b", "value": 2.5, "ts": 1},
    ]
    b2 = [
        {"event_type": "a", "value": 4.0, "ts": 3},
        {"event_type": "b", "value": 2.0, "ts": 2},
    ]
    try:
        _drop(src, "b1.json", b1)
        q.processAllAvailable()
        _drop(src, "b2.json", b2)
        q.processAllAvailable()
        got = {
            (r.event_type, r.t): r.cusum for r in spark.table("cusum_s").collect()
        }
    finally:
        q.stop()
    # sequential python fold per key
    series = {"a": [3.0, 1.0, 4.0], "b": [2.5, 2.0]}
    for k, vals in series.items():
        cum = 0.0
        for i, v in enumerate(vals, start=1):
            cum += (v - mu) / sigma
            assert got[(k, i)] == cum
