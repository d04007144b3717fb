"""Time-window aggregations (tumbling / sliding / session).

The reference's only window is the processing-time interval buffer that
batches UI pushes (`perspective.py:491-515`, default 2 s) — in Spark
that is just ``trigger(processingTime=...)``.  Event-time windows are
part of the additive surface (SURVEY §7.8): tumbling/sliding via
``window()``, sessions via ``session_window()``; in batch mode the same
expressions work without watermarks.

``events.ts`` arrives as int64 *nanoseconds* (see session.py), so
helpers here bucket on integer arithmetic — exact, engine-agnostic,
and cheap (no casts in the hot path, pure codegen).

Scale: tumbling-window aggregation is one shuffle on (bucket, keys);
partial aggregation applies map-side.  Session windows shuffle by key
then sort within partitions — Spark's session_window does exactly
this; skewed keys are handled by AQE.
"""

from __future__ import annotations

from typing import Optional, Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

NS_PER_SEC = 1_000_000_000


def tumbling(
    df: DataFrame,
    ts_col: str,
    width_seconds: int,
    keys: Sequence[str] = (),
    aggs: Optional[Sequence[Column]] = None,
    ts_is_nanos: bool = True,
) -> DataFrame:
    """Tumbling event-time window.  Emits ``bucket_start`` (epoch
    seconds, int) + keys + aggregates."""
    width_ns = width_seconds * NS_PER_SEC
    if ts_is_nanos:
        # integer division: exact on int64 nanos (double division would
        # lose precision above 2^53)
        bucket = (F.expr(f"`{ts_col}` div {width_ns}") * width_seconds).alias("bucket_start")
    else:
        bucket = (
            F.expr(f"unix_timestamp(`{ts_col}`) div {width_seconds}") * width_seconds
        ).alias("bucket_start")
    aggs = list(aggs or [F.count(F.lit(1)).alias("n")])
    return df.groupBy(bucket, *[F.col(k) for k in keys]).agg(*aggs)


def sliding(
    df: DataFrame,
    ts_col: str,
    width_seconds: int,
    slide_seconds: int,
    keys: Sequence[str] = (),
    aggs: Optional[Sequence[Column]] = None,
    ts_is_nanos: bool = True,
) -> DataFrame:
    """Sliding window: each row lands in width/slide buckets.  Built by
    exploding the bucket starts a row belongs to — identical semantics
    to Spark's ``window(ts, width, slide)`` but on int64 nanos."""
    n_buckets = width_seconds // slide_seconds
    ts_sec = (
        F.expr(f"`{ts_col}` div {NS_PER_SEC}") if ts_is_nanos else F.unix_timestamp(F.col(ts_col))
    )
    last_start = (ts_sec - ts_sec % slide_seconds).cast("long")
    first_start = last_start - (n_buckets - 1) * slide_seconds
    starts = F.sequence(first_start, last_start, F.lit(slide_seconds).cast("long"))
    exploded = df.withColumn("bucket_start", F.explode(starts)).filter(
        (ts_sec >= F.col("bucket_start")) & (ts_sec < F.col("bucket_start") + width_seconds)
    )
    aggs = list(aggs or [F.count(F.lit(1)).alias("n")])
    return exploded.groupBy("bucket_start", *[F.col(k) for k in keys]).agg(*aggs)


def sessionize(
    df: DataFrame,
    ts_col: str,
    gap: int,
    keys: Sequence[str],
    aggs: Optional[Sequence[Column]] = None,
) -> DataFrame:
    """Session windows: rows within ``gap`` (same unit as ``ts_col``,
    which must be numeric event time) of the previous row per key share
    a session.  Gaps-and-islands with one shuffle on keys — the same
    physical plan ``session_window()`` produces, but expressed portably
    for batch and exact for integer time.

    Emits keys + ``session_start`` + aggregates.
    """
    from pyspark.sql import Window

    ts = F.col(ts_col)
    w = Window.partitionBy(*[F.col(k) for k in keys]).orderBy(ts)
    new_session = (ts - F.lag(ts).over(w) > gap) | F.lag(ts).over(w).isNull()
    sessioned = df.withColumn("_new", new_session.cast("int")).withColumn(
        "_session", F.sum("_new").over(w)
    )
    aggs = list(aggs or [F.count(F.lit(1)).alias("n")])
    return (
        sessioned.groupBy(*[F.col(k) for k in keys], F.col("_session"))
        .agg(F.min(ts).alias("session_start"), *aggs)
        .drop("_session")
    )
