"""Engine-cycle changelog: JSON snapshot write + deterministic replay.

Reference: every tick of selected channels is encoded into one
newline-delimited JSON snapshot per engine cycle with a
``csp_engine_timestamp`` (`modules/io/json.py:35-62`,
`shared/json_converter.py:275-350`); replay re-injects records at their
recorded engine time, skipping pre-start rows
(`modules/io/json_pull_adapter.py:15-58`, `json_converter.py:112-175`).
Decode options force-regenerate id/timestamp and set per-channel flags
(`engine_replay.py:51-70`, `json_converter.py:245-273`).

Spark design: the changelog is a directory of JSON lines
``{csp_engine_timestamp, channel, payload}``; writing is
``to_json(struct(*))`` per channel + unionByName (no shuffle); replay
is a schema'd JSON scan ordered by engine time (batch) or a file-source
readStream with event-time watermark (streaming).  Batch and streaming
share the encode/decode expressions.
"""

from __future__ import annotations

import os
from typing import Dict, List, Optional

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

from csp_gateway_spark.structs import reassign_identity

ENGINE_TS = "csp_engine_timestamp"


def encode_changelog(channels: Dict[str, DataFrame], ts_col: str = "timestamp") -> DataFrame:
    """Union the given channels into one changelog DataFrame
    ``(csp_engine_timestamp, channel, payload-json)``."""
    parts = []
    for name, df in channels.items():
        ts = F.col(ts_col) if ts_col in df.columns else F.current_timestamp()
        parts.append(
            df.select(
                ts.alias(ENGINE_TS),
                F.lit(name).alias("channel"),
                F.to_json(F.struct(*[F.col(c) for c in df.columns])).alias("payload"),
            )
        )
    out = parts[0]
    for p in parts[1:]:
        out = out.unionByName(p)
    return out


def write_changelog(channels: Dict[str, DataFrame], path: str, mode: str = "append") -> None:
    """Batch form of the background JSON writer (`io/json.py:18-33`)."""
    encode_changelog(channels).write.mode(mode).json(path)


def write_cycle_snapshot(
    channels: Dict[str, DataFrame], path: str, ts_col: str = "timestamp", mode: str = "append"
) -> None:
    """Per-CYCLE snapshot file: one JSON row per engine cycle carrying
    every channel that ticked in it — the reference's exact changelog
    granularity (`shared/json_converter.py:275-350`), for consumers
    that need cycle simultaneity explicit rather than recovered by
    timestamp grouping.  Reuses the Kafka wire codec
    (`sources/kafka.py::encode_engine_cycles`), whose round-trip is
    hash-checked, so file and Kafka replay share one cycle format."""
    from csp_gateway_spark.sources.kafka import encode_engine_cycles

    enc = encode_engine_cycles(encode_changelog(channels, ts_col), key="file")
    enc.select("value").write.mode(mode).text(path)


def read_cycle_snapshot(spark: SparkSession, path: str, start: Optional[str] = None) -> DataFrame:
    """Per-cycle snapshot file → the standard changelog shape
    ``(csp_engine_timestamp, channel, payload)`` — feed straight into
    ``replay_channel``."""
    from csp_gateway_spark.sources.kafka import decode_engine_cycles

    msgs = spark.read.text(path).select(F.col("value"))
    out = decode_engine_cycles(msgs)
    if start is not None:
        out = out.filter(F.col(ENGINE_TS) >= F.lit(start).cast("timestamp"))
    return out


def read_changelog(
    spark: SparkSession,
    path: str,
    start: Optional[str] = None,
    streaming: bool = False,
) -> DataFrame:
    """Read the raw changelog; rows before ``start`` are skipped
    (replay drop-before-start, `json_pull_adapter.py:40-50`)."""
    schema = T.StructType(
        [
            T.StructField(ENGINE_TS, T.TimestampType()),
            T.StructField("channel", T.StringType()),
            T.StructField("payload", T.StringType()),
        ]
    )
    if streaming:
        df = spark.readStream.schema(schema).json(path)
        df = df.withWatermark(ENGINE_TS, "10 seconds")
    else:
        df = spark.read.schema(schema).json(path)
    if start is not None:
        df = df.filter(F.col(ENGINE_TS) >= F.lit(start).cast("timestamp"))
    return df


def replay_channel(
    changelog: DataFrame,
    channel: str,
    schema: T.StructType,
    force_new_id: bool = False,
    force_new_timestamp: bool = False,
    flag_updates: Optional[Dict[str, bool]] = None,
    exclude_fields: Optional[List[str]] = None,
) -> DataFrame:
    """Decode one channel out of the changelog back to typed rows,
    applying the reference's replay rewrite options
    (`json_converter.py:245-273`)."""
    out = (
        changelog.filter(F.col("channel") == channel)
        .select(ENGINE_TS, F.from_json(F.col("payload"), schema).alias("r"))
        .select(ENGINE_TS, "r.*")
    )
    for field in exclude_fields or []:
        out = out.drop(field)
    for flag, value in (flag_updates or {}).items():
        out = out.withColumn(flag, F.lit(value))
    if force_new_id or force_new_timestamp:
        out = reassign_identity(out, force_new_id, force_new_timestamp)
    return out


def replay_round_trip_check(channels: Dict[str, DataFrame], spark: SparkSession, path: str) -> bool:
    """Encode → decode idempotence (test helper)."""
    write_changelog(channels, path, mode="overwrite")
    log = read_changelog(spark, path)
    for name, df in channels.items():
        back = replay_channel(log, name, df.schema)
        if back.select(df.columns).exceptAll(df).count() != 0:
            return False
        if df.exceptAll(back.select(df.columns)).count() != 0:
            return False
    return True
