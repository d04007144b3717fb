"""EngineReplay ``start_writing`` read→write handoff (W3 closure).

Reference `shared/engine_replay.py:107-118`: replay the recorded
cycles while engine time < start_writing, then switch to encoding and
publishing NEW cycles to the same changelog.  The round-trip contract:
run A writes history, run B replays it up to the cutover and appends
its own ticks from the cutover on — the combined changelog must decode
hash-equal to one continuous run, with no duplicated and no dropped
cycle.
"""

import datetime

import pytest
from pyspark.sql import functions as F
from pyspark.sql import types as T

from csp_gateway_spark.catalog import ChannelCatalog
from csp_gateway_spark.sources.engine_replay import EngineReplay, ReadWriteMode
from csp_gateway_spark.sources.replay import read_changelog, replay_channel

SCHEMA = T.StructType(
    [
        T.StructField("id", T.StringType()),
        T.StructField("timestamp", T.TimestampType()),
        T.StructField("symbol", T.StringType()),
        T.StructField("price", T.DoubleType()),
        T.StructField("live", T.BooleanType()),
    ]
)

T0 = datetime.datetime(2024, 3, 1, 9, 0, 0)


def _row(i, minutes, live=False):
    return {
        "id": f"r{i}",
        "timestamp": T0 + datetime.timedelta(minutes=minutes),
        "symbol": "ES" if i % 2 else "NQ",
        "price": 100.0 + i,
        "live": live,
    }


def _send(catalog, rows):
    catalog.declare("trades", SCHEMA)
    df = catalog.spark.createDataFrame(
        [tuple(r[f.name] for f in SCHEMA.fields) for r in rows], SCHEMA
    )
    catalog.set_channel("trades", df)


def test_handoff_round_trip(spark, tmp_path):
    path = str(tmp_path / "log")
    cutover = T0 + datetime.timedelta(minutes=10)

    # run A: WRITE mode from the epoch — every tick lands in the log
    mod_a = EngineReplay(
        path=path, schemas={"trades": SCHEMA},
        read_write_mode=ReadWriteMode.WRITE,
        start_writing=T0 - datetime.timedelta(days=1),
    )
    cat_a = ChannelCatalog(spark)
    mod_a.connect(cat_a)
    _send(cat_a, [_row(1, 1), _row(2, 5)])
    assert mod_a.flush() == 2

    # run B: READ_AND_WRITE handoff at the cutover — replays r1/r2,
    # produces r3 (pre-cutover duplicate-in-waiting) and r4/r5 (new)
    mod_b = EngineReplay(
        path=path, schemas={"trades": SCHEMA}, start_writing=cutover
    )
    cat_b = ChannelCatalog(spark)
    mod_b.connect(cat_b)
    replayed = cat_b.get_channel("trades")
    assert {r.id for r in replayed.collect()} == {"r1", "r2"}

    _send(cat_b, [_row(4, 11, live=True), _row(5, 15, live=True)])
    # the handoff writes ONLY ticks at/after the cutover: the replayed
    # history below it must not be re-appended
    assert mod_b.flush() == 2
    mod_b._flushed = False
    mod_b.shutdown()  # second flush appends the same 2 again...
    combined = replay_channel(
        read_changelog(spark, path), "trades", SCHEMA
    )
    # ...proving flush is append-only; dedupe by id for the content check
    ids = [r.id for r in combined.collect()]
    assert sorted(set(ids)) == ["r1", "r2", "r4", "r5"]

    # the combined changelog decodes to the continuous run A∪B content
    uniq = combined.dropDuplicates(["id"]).orderBy("id")
    got = [(r.id, r.timestamp, r.symbol, r.price, r.live) for r in uniq.collect()]
    want = [
        ("r1", T0 + datetime.timedelta(minutes=1), "ES", 101.0, False),
        ("r2", T0 + datetime.timedelta(minutes=5), "NQ", 102.0, False),
        ("r4", T0 + datetime.timedelta(minutes=11), "NQ", 104.0, True),
        ("r5", T0 + datetime.timedelta(minutes=15), "ES", 105.0, True),
    ]
    assert got == want


def test_handoff_drops_pre_cutover_producer_ticks_from_write(spark, tmp_path):
    """A producer tick BELOW the cutover in run B (e.g. replay noise)
    is not appended — the write half is gated exactly like the
    reference's alarm_ticked encode gate."""
    path = str(tmp_path / "log")
    cutover = T0 + datetime.timedelta(minutes=10)
    mod = EngineReplay(
        path=path, schemas={"trades": SCHEMA}, start_writing=cutover
    )
    cat = ChannelCatalog(spark)
    mod.connect(cat)
    _send(cat, [_row(1, 2), _row(2, 12)])
    assert mod.flush() == 1
    back = replay_channel(read_changelog(spark, path), "trades", SCHEMA)
    assert [r.id for r in back.collect()] == ["r2"]


def test_timedelta_cutover_resolves_from_engine_start(spark, tmp_path):
    """A timedelta start_writing is relative to the earliest recorded
    engine timestamp — `set_alarm_and_fetch_alarm_time`'s
    engine-start-relative alarm in batch form."""
    path = str(tmp_path / "log")
    writer = EngineReplay(
        path=path, schemas={"trades": SCHEMA},
        read_write_mode=ReadWriteMode.WRITE,
        start_writing=T0 - datetime.timedelta(days=1),
    )
    cat = ChannelCatalog(spark)
    writer.connect(cat)
    _send(cat, [_row(1, 0), _row(2, 5), _row(3, 20)])
    assert writer.flush() == 3

    mod = EngineReplay(
        path=path, schemas={"trades": SCHEMA},
        start_writing=datetime.timedelta(minutes=10),
    )
    cutover = mod.resolve_cutover(spark)
    assert cutover == T0 + datetime.timedelta(minutes=10)
    cat2 = ChannelCatalog(spark)
    mod.connect(cat2)
    assert {r.id for r in cat2.get_channel("trades").collect()} == {"r1", "r2"}


def test_decode_rewrite_options(spark, tmp_path):
    """flag_updates + regenerated identity on replay
    (`engine_replay.py:51-70`)."""
    path = str(tmp_path / "log")
    writer = EngineReplay(
        path=path, schemas={"trades": SCHEMA},
        read_write_mode=ReadWriteMode.WRITE,
        start_writing=T0 - datetime.timedelta(days=1),
    )
    cat = ChannelCatalog(spark)
    writer.connect(cat)
    _send(cat, [_row(1, 1), _row(2, 2)])
    writer.flush()

    mod = EngineReplay(
        path=path, schemas={"trades": SCHEMA},
        read_write_mode=ReadWriteMode.READ,
        start_writing=T0 + datetime.timedelta(hours=1),
        flag_updates={"trades": {"live": True}},
        subscribe_with_struct_id=False,
    )
    cat2 = ChannelCatalog(spark)
    mod.connect(cat2)
    rows = cat2.get_channel("trades").collect()
    assert len(rows) == 2
    assert all(r.live for r in rows)
    assert all(r.id not in ("r1", "r2") for r in rows)
    # READ mode never writes
    assert mod.flush() == 0


def test_kafka_wire_handoff_round_trip(spark, tmp_path):
    """KafkaEngineReplay: the same start_writing handoff over the
    EncodedEngineCycle wire (one message per cycle, engine time from
    the message's csp_timestamp — reference ReplayEngineKafka,
    `kafka.py:360-450`) against the FileStubBroker topic log."""
    from csp_gateway_spark.sources.engine_replay import KafkaEngineReplay

    root = str(tmp_path / "broker")
    cutover = T0 + datetime.timedelta(minutes=10)
    run_a = KafkaEngineReplay(
        broker_root=root, topic="cycles", schemas={"trades": SCHEMA},
        read_write_mode=ReadWriteMode.WRITE,
        start_writing=T0 - datetime.timedelta(days=1),
    )
    cat_a = ChannelCatalog(spark)
    run_a.connect(cat_a)
    _send(cat_a, [_row(1, 1), _row(2, 5)])
    assert run_a.flush() == 2  # two distinct engine-ms -> two cycles

    run_b = KafkaEngineReplay(
        broker_root=root, topic="cycles", schemas={"trades": SCHEMA},
        start_writing=cutover,
    )
    cat_b = ChannelCatalog(spark)
    run_b.connect(cat_b)
    assert {r.id for r in cat_b.get_channel("trades").collect()} == {"r1", "r2"}
    _send(cat_b, [_row(4, 11, live=True), _row(5, 15, live=True)])
    assert run_b.flush() == 2

    # combined topic decodes as ONE continuous run through the shared codec
    combined = run_b._read_log(spark)
    got = replay_channel(combined, "trades", SCHEMA).orderBy("id")
    rows = [(r.id, r.timestamp, r.price, r.live) for r in got.collect()]
    assert rows == [
        ("r1", T0 + datetime.timedelta(minutes=1), 101.0, False),
        ("r2", T0 + datetime.timedelta(minutes=5), 102.0, False),
        ("r4", T0 + datetime.timedelta(minutes=11), 104.0, True),
        ("r5", T0 + datetime.timedelta(minutes=15), 105.0, True),
    ]


def test_fresh_changelog_timedelta_starts_writing_immediately(spark, tmp_path):
    """Default ``timedelta()`` + empty changelog must write EVERYTHING,
    even channels carrying historical tick timestamps: the cutover
    anchors on the encode channels' earliest tick (then epoch), never
    wall-clock "now" — which would silently fail ``ts >= cutover`` for
    every historical row and append 0 rows."""
    path = str(tmp_path / "log")
    mod = EngineReplay(path=path, schemas={"trades": SCHEMA})
    # no changelog, no channels to anchor on -> epoch (writes everything)
    assert mod.resolve_cutover(spark) == datetime.datetime(1970, 1, 1)
    cat = ChannelCatalog(spark)
    mod.connect(cat)
    with pytest.raises(Exception):
        cat.get_channel("trades") and None  # no provider yet, no replay
    # historical ticks (far in the past) are still written on flush
    _send(cat, [_row(1, 0), _row(2, 5)])
    assert mod.flush() == 2
    back = replay_channel(read_changelog(spark, path), "trades", SCHEMA)
    assert {r.id for r in back.collect()} == {"r1", "r2"}


def test_flush_without_connect_write_mode(spark, tmp_path):
    """WRITE-mode flush(channels=...) without a prior connect() uses the
    declared selection instead of dereferencing connect()-only state."""
    path = str(tmp_path / "log")
    mod = EngineReplay(
        path=path, schemas={"trades": SCHEMA},
        read_write_mode=ReadWriteMode.WRITE,
        start_writing=T0 - datetime.timedelta(days=1),
    )
    cat = ChannelCatalog(spark)
    cat.declare("trades", SCHEMA)
    _send(cat, [_row(1, 1), _row(2, 2)])
    assert mod.flush(channels=cat) == 2


def test_flush_raises_on_replayed_channel_without_timestamp(spark, tmp_path):
    """READ_AND_WRITE flush over a replayed channel with no 'timestamp'
    column raises — an unfiltered append would duplicate every replayed
    cycle in the changelog."""
    import pyspark.sql.types as T

    bare = T.StructType([T.StructField("id", T.StringType())])
    path = str(tmp_path / "log")
    writer = EngineReplay(
        path=path, schemas={"bare": bare},
        read_write_mode=ReadWriteMode.WRITE,
    )
    cat = ChannelCatalog(spark)
    writer.connect(cat)
    with pytest.warns(UserWarning, match="no 'timestamp' column"):
        cat.set_channel("bare", spark.createDataFrame([("a",), ("b",)], bare))
        assert writer.flush() == 2

    mod = EngineReplay(
        path=path, schemas={"bare": bare},
        start_writing=datetime.datetime(2100, 1, 1),
    )
    cat2 = ChannelCatalog(spark)
    mod.connect(cat2)  # replays history into the catalog
    assert {r.id for r in cat2.get_channel("bare").collect()} == {"a", "b"}
    with pytest.raises(ValueError, match="no 'timestamp' column"):
        mod.flush()
