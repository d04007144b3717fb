"""Kafka source/sink wrappers (config-compatible with the reference).

Reference: `modules/kafka/kafka.py` — subscribe topics/keys, JSON
(de)serialization, start-offset selection (earliest/latest/datetime),
engine-timestamp extraction from the payload, drop/adjust out-of-order
messages before engine start; publish path serializes ticks to JSON
(`kafka.py:259-353`); channel processors hook per-tick transforms
(`modules/kafka/utils.py:14-46`).

Spark: `readStream.format("kafka")` / `writeStream.format("kafka")`.
This container has no broker and no kafka connector jar, so connect()
raises a clear error unless a broker is configured; the (de)serialize
expression builders below are pure and unit-tested.
"""

from __future__ import annotations

import datetime
from typing import Dict, List, Optional

from pydantic import BaseModel, ConfigDict
from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

from csp_gateway_spark.structs import reassign_identity


class KafkaConfiguration(BaseModel):
    """Mirrors the reference KafkaConfiguration (`kafka.py:40-117`)."""

    broker: str = ""
    group_id: str = ""
    start_offset: str = "latest"  # earliest | latest | ISO datetime
    max_queue_size: int = 1_000_000
    poll_timeout_seconds: float = 1.0


def starting_offsets(start_offset: str) -> str:
    """Map the reference's start-offset vocabulary onto Spark's
    ``startingOffsets`` / ``startingTimestamp`` options."""
    if start_offset in ("earliest", "latest"):
        return start_offset
    # datetime start → Spark's startingTimestamp (ms)
    dt = datetime.datetime.fromisoformat(start_offset)
    return str(int(dt.timestamp() * 1000))


def deserialize(value: Column, schema: T.StructType, engine_ts_field: Optional[str] = None) -> Column:
    """JSON bytes → typed struct; optionally lift an engine-timestamp
    field out of the wrapper (`kafka.py:220-251`, meta_field_map)."""
    parsed = F.from_json(value.cast("string"), schema)
    return parsed


def serialize(df: DataFrame, key_col: Optional[str] = None, wrap_timestamp: bool = False) -> DataFrame:
    """Channel rows → (key, value) JSON for the kafka sink
    (`kafka.py:259-319`)."""
    payload = F.to_json(F.struct(*[F.col(c) for c in df.columns]))
    if wrap_timestamp:
        payload = F.to_json(
            F.struct(
                F.current_timestamp().alias("csp_engine_timestamp"),
                F.struct(*[F.col(c) for c in df.columns]).alias("payload"),
            )
        )
    cols = [payload.alias("value")]
    if key_col is not None:
        cols.insert(0, F.col(key_col).cast("string").alias("key"))
    return df.select(*cols)


def adjust_out_of_order(df: DataFrame, ts_col: str, start_time) -> DataFrame:
    """Clamp pre-start timestamps to start (adjust_out_of_order_time,
    `kafka.py:188-191`): ``greatest(ts, start)``."""
    return df.withColumn(ts_col, F.greatest(F.col(ts_col), F.lit(start_time).cast("timestamp")))


def read_kafka(
    spark: SparkSession,
    config: KafkaConfiguration,
    topic: str,
    schema: T.StructType,
    force_new_id: bool = True,
) -> DataFrame:
    """Subscribe path (`kafka.py:321-353`).  Requires a reachable broker
    and the spark-sql-kafka connector on the classpath."""
    if not config.broker:
        raise RuntimeError("KafkaConfiguration.broker is empty — no broker in this environment")
    raw = (
        spark.readStream.format("kafka")
        .option("kafka.bootstrap.servers", config.broker)
        .option("subscribe", topic)
        .option("startingOffsets", starting_offsets(config.start_offset))
        .option("maxOffsetsPerTrigger", config.max_queue_size)
        .load()
    )
    out = raw.select(deserialize(F.col("value"), schema).alias("r")).select("r.*")
    if force_new_id:
        out = reassign_identity(out)
    return out


def write_kafka(df: DataFrame, config: KafkaConfiguration, topic: str, key_col: Optional[str] = None):
    """Publish path (`kafka.py:259-319`)."""
    if not config.broker:
        raise RuntimeError("KafkaConfiguration.broker is empty — no broker in this environment")
    return (
        serialize(df, key_col=key_col)
        .writeStream.format("kafka")
        .option("kafka.bootstrap.servers", config.broker)
        .option("topic", topic)
    )


# ---------------------------------------------------------------------------
# Engine replay over Kafka (S6): wire codec + file-backed stub broker
# ---------------------------------------------------------------------------

def encode_engine_cycles(changelog: DataFrame, key: str) -> DataFrame:
    """Changelog rows → `EncodedEngineCycle` wire messages
    (reference `kafka.py:360-450`): ONE (key, value) message per engine
    cycle, value = JSON ``{"encoding": <cycle ticks>, "csp_timestamp":
    uint64-millis}`` — the same JSONTextMessageMapper/UINT64_MILLIS
    shape the reference publishes.  All messages share the caller's
    ``key`` so one replay stream stays totally ordered within its
    topic-partition (the reference's ordering guarantee).

    One shuffle (groupBy engine ts); encoding keeps (channel, payload)
    pairs sorted for determinism.
    """
    enc = (
        changelog.groupBy("csp_engine_timestamp")
        .agg(
            F.to_json(
                F.sort_array(
                    F.collect_list(F.struct(F.col("channel"), F.col("payload")))
                )
            ).alias("encoding")
        )
        .select(
            F.lit(key).alias("key"),
            F.to_json(
                F.struct(
                    F.col("encoding"),
                    (F.unix_millis(F.col("csp_engine_timestamp"))).cast("long").alias("csp_timestamp"),
                )
            ).alias("value"),
            F.col("csp_engine_timestamp").alias("_ts"),
        )
    )
    return enc


_CYCLE_SCHEMA = T.StructType(
    [
        T.StructField("encoding", T.StringType()),
        T.StructField("csp_timestamp", T.LongType()),
    ]
)
_TICKS_SCHEMA = T.ArrayType(
    T.StructType(
        [T.StructField("channel", T.StringType()), T.StructField("payload", T.StringType())]
    )
)


def decode_engine_cycles(messages: DataFrame) -> DataFrame:
    """Wire messages → changelog rows (csp_engine_timestamp, channel,
    payload).  The engine timestamp comes from the MESSAGE
    (`meta_field_map={"timestamp": "csp_timestamp"}` in the reference —
    never the broker's receive time)."""
    cyc = messages.select(F.from_json(F.col("value"), _CYCLE_SCHEMA).alias("c")).select("c.*")
    return (
        cyc.select(
            F.timestamp_millis(F.col("csp_timestamp")).alias("csp_engine_timestamp"),
            F.explode(F.from_json(F.col("encoding"), _TICKS_SCHEMA)).alias("t"),
        )
        .select("csp_engine_timestamp", "t.channel", "t.payload")
    )


class FileStubBroker:
    """File-backed topic log standing in for a Kafka broker (no broker
    in this sandbox): one parquet dir per topic holding
    ``(partition, offset, key, value)``.  Contract bits it preserves:
    same key → same partition; per-partition offsets are assigned in
    publish order so a subscriber reading ``ORDER BY partition, offset``
    sees exactly the published order per key — which is all Kafka
    guarantees (`kafka.py:360-367`)."""

    def __init__(self, root: str, num_partitions: int = 4):
        self.root = root
        self.num_partitions = num_partitions

    def _topic_path(self, topic: str) -> str:
        import os

        return os.path.join(self.root, topic)

    def publish(self, df: DataFrame, topic: str, order_col: str = "_ts") -> None:
        """Append (key, value) messages; partition by key hash, offset
        by publish order within the partition.  Offsets continue past
        the per-partition max already in the log, so a second publish
        to the same topic appends (N+1..) instead of reusing 1..M and
        breaking the subscribe-order contract."""
        import os

        from pyspark.sql.window import Window

        path = self._topic_path(topic)
        part = F.pmod(F.crc32(F.col("key").cast("string")), F.lit(self.num_partitions)).cast("int")
        w = Window.partitionBy(part).orderBy(F.col(order_col))
        out = df.select(
            part.alias("partition"),
            F.row_number().over(w).cast("long").alias("offset"),
            "key",
            "value",
        )
        if os.path.exists(path):
            base = (
                df.sparkSession.read.parquet(path)
                .groupBy("partition")
                .agg(F.max("offset").alias("_base"))
            )
            out = (
                out.join(F.broadcast(base), "partition", "left")
                .withColumn("offset", F.col("offset") + F.coalesce(F.col("_base"), F.lit(0)))
                .select("partition", "offset", "key", "value")
            )
        out.write.mode("append").parquet(path)

    def subscribe(self, spark: SparkSession, topic: str) -> DataFrame:
        """Messages in consumption order (partition, offset) — mirrors
        read_kafka's output columns."""
        return spark.read.parquet(self._topic_path(topic)).orderBy("partition", "offset")


class KafkaChannelProcessor(BaseModel):
    """Per-tick map+filter hook around publish/subscribe
    (`modules/kafka/utils.py:14-46`): apply ``process``; None drops."""

    model_config = ConfigDict(arbitrary_types_allowed=True)

    def apply_process(self, df: DataFrame, expr: Column, keep: Column) -> DataFrame:
        """Native form: transformed column + keep predicate (prefer
        expressions over the reference's arbitrary-Python hook)."""
        return df.withColumn("value", expr).filter(keep)
