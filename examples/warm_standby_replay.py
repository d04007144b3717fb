"""Warm-standby replay — the EngineReplay ``start_writing`` handoff
(reference `csp_gateway/server/shared/engine_replay.py:19-125`) as a
runnable two-process story:

  RUN A (primary)  : a gateway in WRITE mode records every tick of its
                     channels to a JSON changelog as it produces them.
  RUN B (standby)  : started later with ``start_writing = <cutover>``,
                     it REPLAYS the changelog below the cutover into
                     its own channels (state catches up to the
                     primary), then appends its OWN new cycles from
                     the cutover on — to the SAME changelog, which
                     afterwards decodes as one continuous run.

Run: python examples/warm_standby_replay.py
"""

from __future__ import annotations

import datetime
import shutil
import sys
import tempfile

sys.path.insert(0, __file__.rsplit("/", 2)[0])

from pyspark.sql import functions as F  # noqa: E402
from pyspark.sql import types as T  # noqa: E402

from csp_gateway_spark.catalog import ChannelCatalog  # noqa: E402
from csp_gateway_spark.session import get_spark  # noqa: E402
from csp_gateway_spark.sources.engine_replay import (  # noqa: E402
    EngineReplay,
    ReadWriteMode,
)
from csp_gateway_spark.sources.replay import read_changelog, replay_channel  # noqa: E402

TRADE = T.StructType(
    [
        T.StructField("id", T.StringType()),
        T.StructField("timestamp", T.TimestampType()),
        T.StructField("symbol", T.StringType()),
        T.StructField("qty", T.LongType()),
    ]
)

T0 = datetime.datetime(2024, 6, 3, 9, 30)


def tick(cat: ChannelCatalog, i: int, minutes: int) -> None:
    row = (f"t{i}", T0 + datetime.timedelta(minutes=minutes), "ES" if i % 2 else "NQ", 10 + i)
    cat.set_channel("trades", cat.spark.createDataFrame([row], TRADE))


def main() -> None:
    spark = get_spark("warm-standby-demo", cpus="4")
    spark.sparkContext.setLogLevel("ERROR")
    log_dir = tempfile.mkdtemp(prefix="warm_standby_")

    # ---- RUN A: primary records everything ---------------------------
    primary = EngineReplay(
        path=log_dir, schemas={"trades": TRADE},
        read_write_mode=ReadWriteMode.WRITE,
        start_writing=T0 - datetime.timedelta(days=1),
    )
    cat_a = ChannelCatalog(spark)
    primary.connect(cat_a)
    for i, m in ((1, 0), (2, 3), (3, 7)):
        tick(cat_a, i, m)
    wrote = primary.flush()
    print(f"primary recorded {wrote} ticks to {log_dir}")

    # ---- RUN B: standby takes over at the cutover --------------------
    cutover = T0 + datetime.timedelta(minutes=10)
    standby = EngineReplay(
        path=log_dir, schemas={"trades": TRADE}, start_writing=cutover
    )
    cat_b = ChannelCatalog(spark)
    standby.connect(cat_b)
    cat_b.declare_state("trades", "symbol")
    warm = cat_b.state("trades").orderBy("symbol")
    print("standby state after replay (caught up to the primary):")
    for r in warm.collect():
        print("   ", r.symbol, r.qty, r.id)

    for i, m in ((4, 11), (5, 14)):
        tick(cat_b, i, m)
    appended = standby.flush()
    print(f"standby appended {appended} new ticks from the cutover on")

    # ---- the combined changelog is one continuous run -----------------
    combined = replay_channel(read_changelog(spark, log_dir), "trades", TRADE)
    rows = combined.orderBy("timestamp").collect()
    print("combined changelog decodes as one continuous run:")
    for r in rows:
        print("   ", r.id, r.timestamp.time(), r.symbol, r.qty)
    assert [r.id for r in rows] == ["t1", "t2", "t3", "t4", "t5"]
    shutil.rmtree(log_dir, ignore_errors=True)
    print("OK")


if __name__ == "__main__":
    main()
