"""Kafka engine-replay round trip (S6) without a broker.

Contract under test (reference `modules/kafka/kafka.py:360-450`):
engine cycles serialize to `EncodedEngineCycle` JSON messages
({"encoding", "csp_timestamp"} with UINT64-millis timestamps), all
cycles for a replay stream share one key (total order within the
topic-partition), and the consumer recovers engine time from the
MESSAGE, not the broker.  A file-backed stub broker carries the
(partition, offset, key, value) log so the serialization contract is
exercised end-to-end.
"""

import datetime

import pytest
from pyspark.sql import functions as F
from pyspark.sql import types as T

from csp_gateway_spark.sources.kafka import (
    FileStubBroker,
    decode_engine_cycles,
    encode_engine_cycles,
)
from csp_gateway_spark.sources.replay import encode_changelog, replay_channel

QUOTE = T.StructType(
    [
        T.StructField("sym", T.StringType()),
        T.StructField("px", T.DoubleType()),
        T.StructField("timestamp", T.TimestampType()),
    ]
)
TRADE = T.StructType(
    [
        T.StructField("sym", T.StringType()),
        T.StructField("qty", T.LongType()),
        T.StructField("timestamp", T.TimestampType()),
    ]
)


def _ts(sec: int) -> datetime.datetime:
    # millisecond precision on purpose: the wire format is UINT64_MILLIS
    return datetime.datetime(2024, 3, 1, 9, 30, 0) + datetime.timedelta(seconds=sec)


@pytest.fixture(scope="module")
def channels(spark):
    quotes = spark.createDataFrame(
        [("AA", 10.0, _ts(0)), ("BB", 20.0, _ts(0)), ("AA", 10.5, _ts(1))], QUOTE
    )
    trades = spark.createDataFrame([("AA", 100, _ts(1)), ("BB", 250, _ts(2))], TRADE)
    return {"quotes": quotes, "trades": trades}


def test_kafka_replay_round_trip_hash_equal(spark, channels, tmp_path_factory):
    root = str(tmp_path_factory.mktemp("stub-broker"))
    broker = FileStubBroker(root, num_partitions=4)

    changelog = encode_changelog(channels)
    broker.publish(encode_engine_cycles(changelog, key="replay-1"), "engine.replay")

    messages = broker.subscribe(spark, "engine.replay")
    decoded = decode_engine_cycles(messages)

    for name, df in channels.items():
        back = replay_channel(decoded, name, df.schema).select(df.columns)
        # exact multiset equality both directions == hash equality
        assert back.exceptAll(df).count() == 0
        assert df.exceptAll(back).count() == 0

    # ... and literal hash equality of the canonicalized payload multiset
    def corpus_hash(df):
        return (
            df.select(F.md5(F.to_json(F.struct(*sorted(df.columns)))).alias("h"))
            .agg(F.md5(F.concat_ws("", F.sort_array(F.collect_list("h")))).alias("H"))
            .collect()[0]["H"]
        )

    for name, df in channels.items():
        back = replay_channel(decoded, name, df.schema).select(df.columns)
        assert corpus_hash(back) == corpus_hash(df)


def test_one_message_per_engine_cycle(spark, channels):
    changelog = encode_changelog(channels)
    wire = encode_engine_cycles(changelog, key="replay-1")
    # 3 distinct engine timestamps -> 3 messages
    assert wire.count() == 3
    # same key everywhere -> same partition -> total order preserved
    assert wire.select("key").distinct().count() == 1


def test_same_key_lands_in_one_partition_in_order(spark, channels, tmp_path_factory):
    root = str(tmp_path_factory.mktemp("stub-broker2"))
    broker = FileStubBroker(root, num_partitions=8)
    wire = encode_engine_cycles(encode_changelog(channels), key="replay-1")
    broker.publish(wire, "t")
    log = broker.subscribe(spark, "t")
    parts = log.select("partition").distinct().collect()
    assert len(parts) == 1
    # offsets strictly increasing in engine-time order
    rows = log.select("offset", "value").collect()
    ts = [
        __import__("json").loads(r["value"])["csp_timestamp"]
        for r in sorted(rows, key=lambda r: r["offset"])
    ]
    assert ts == sorted(ts)


def test_second_publish_continues_offsets(spark, channels, tmp_path_factory):
    """Appending a second batch must offset past the existing
    per-partition max — reusing 1..N would interleave batches in
    subscribe's (partition, offset) order and break the per-key
    ordering contract across publishes."""
    root = str(tmp_path_factory.mktemp("stub-broker4"))
    broker = FileStubBroker(root, num_partitions=4)
    wire = encode_engine_cycles(encode_changelog(channels), key="replay-1")
    broker.publish(wire, "t")
    broker.publish(wire, "t")
    log = broker.subscribe(spark, "t").collect()
    offsets = sorted(r["offset"] for r in log)
    # 3 cycles per publish, one partition (single key): 1..6, no repeats
    assert offsets == list(range(1, 7))
    # consumption order = publish order: first batch's timestamps, then
    # the second batch's
    ordered = sorted(log, key=lambda r: (r["partition"], r["offset"]))
    ts = [__import__("json").loads(r["value"])["csp_timestamp"] for r in ordered]
    assert ts == sorted(ts[:3]) + sorted(ts[3:])


def test_engine_time_comes_from_message_not_broker(spark, channels, tmp_path_factory):
    root = str(tmp_path_factory.mktemp("stub-broker3"))
    broker = FileStubBroker(root)
    broker.publish(encode_engine_cycles(encode_changelog(channels), "k"), "t")
    decoded = decode_engine_cycles(broker.subscribe(spark, "t"))
    got = {r["csp_engine_timestamp"] for r in decoded.select("csp_engine_timestamp").collect()}
    assert got == {_ts(0), _ts(1), _ts(2)}
