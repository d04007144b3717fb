"""Event-time streaming aggregation with watermark late-data handling
(SURVEY §2.5 W4: the reference clamps/drops late records at the adapter
edge — `json_converter.py:112-165`, `kafka.py:188-191` — Spark's
watermark is the same contract, enforced by the engine).

At 100 TB the watermark bounds streaming-aggregation STATE: windows
older than (max event time − delay) are finalized, emitted (append
mode) and evicted from the state store — without it, state grows
unboundedly.  These helpers keep the aggregation fully JVM-side.
"""

from __future__ import annotations

from typing import Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def windowed_counts(
    stream: DataFrame,
    ts_col: str,
    window: str = "1 minute",
    watermark: str = "10 seconds",
    keys: Sequence[str] = (),
) -> DataFrame:
    """Tumbling event-time counts; rows later than the watermark are
    DROPPED by the engine (append-mode emission = finalized windows
    only)."""
    return (
        stream.withWatermark(ts_col, watermark)
        .groupBy(F.window(F.col(ts_col), window), *keys)
        .agg(F.count(F.lit(1)).alias("n"))
        .select(
            F.col("window.start").alias("win_start"),
            F.col("window.end").alias("win_end"),
            *keys,
            "n",
        )
    )


def session_counts(
    stream: DataFrame,
    ts_col: str,
    keys: Sequence[str],
    gap: str = "30 seconds",
    watermark: str = "10 seconds",
) -> DataFrame:
    """Streaming session windows (`session_window`): per-key activity
    sessions close after ``gap`` of silence; the watermark finalizes
    and evicts closed sessions (same state-bounding contract as
    :func:`windowed_counts`)."""
    return (
        stream.withWatermark(ts_col, watermark)
        .groupBy(F.session_window(F.col(ts_col), gap), *keys)
        .agg(F.count(F.lit(1)).alias("n"))
        .select(
            F.col("session_window.start").alias("sess_start"),
            F.col("session_window.end").alias("sess_end"),
            *keys,
            "n",
        )
    )


def clamp_late(df: DataFrame, ts_col: str, start_time) -> DataFrame:
    """The reference's Kafka alternative to dropping: clamp pre-start
    timestamps up to the engine start (`adjust_out_of_order_time`)."""
    return df.withColumn(ts_col, F.greatest(F.col(ts_col), F.lit(start_time)))
