"""Hypertable-style multi-resolution time rollups (continuous
aggregates).

The reference buffers ticks on an interval for its UI push
(``perspective.py:491-515``, 2 s batches) — the batch analogue at
100 TB is the TimescaleDB/Druid "continuous aggregate": keep the raw
hypertable plus materialized rollups at coarser resolutions, where
each coarser level is computed FROM THE NEXT FINER LEVEL, never from
raw data.

Scale math: a 1-day rollup over 100 TB of raw events re-aggregates the
1-hour rollup (~1/3600 of the rows a raw scan would touch).  This only
works for *mergeable* aggregates — count re-aggregates as sum,
sum/min/max as themselves.  AVG must be carried as (sum, count) and
divided at query time; exact percentiles are NOT mergeable (use a
sketch level instead).

Timestamps are int64 epoch-nanos (the driver's parquet is
TIMESTAMP(NANOS), read via ``nanosAsLong`` — see ``session.py``).
Bucketing uses integer `div`, never float division: epoch-ns values
(~1.7e18) exceed a double's 2^53 integer range, so `/` would corrupt
bucket edges.
"""

from __future__ import annotations

from typing import Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

NS_PER_SEC = 1_000_000_000


def bucket_start_sec(ts_ns: Column, width_sec: int) -> Column:
    """Tumbling-bucket start (epoch seconds) from an epoch-nanos column.

    All-integer path: the mod-subtraction stays in longs, and the final
    /1e9 runs in decimal(38,0) — the quotient is integral by
    construction, so the narrowing cast is exact.  No double ever holds
    an epoch-ns value (~1.7e18 > 2^53), which would corrupt bucket
    edges for far-future/pre-1970 timestamps."""
    width_ns = width_sec * NS_PER_SEC
    t = ts_ns.cast("long")
    # pmod, not %: Spark's % keeps the dividend's sign, which would
    # truncate pre-1970 timestamps toward zero instead of flooring
    m = t - F.pmod(t, F.lit(width_ns))
    return (m.cast("decimal(38,0)") / F.lit(NS_PER_SEC)).cast("long")


def _finest(
    df: DataFrame,
    ts_ns_col: str,
    value_col: str,
    keys: Sequence[str],
    width_sec: int,
) -> DataFrame:
    b = bucket_start_sec(F.col(ts_ns_col), width_sec).alias("bucket_start")
    v = F.col(value_col).cast("decimal(18,2)")
    # sums keep their widened result type (decimal(28,2)): narrowing an
    # aggregate below its natural precision silently NULLs on overflow
    # at the 100 TB design point (non-ANSI default)
    return df.groupBy(b, *keys).agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(v).alias("sum_value"),
        F.min(value_col).alias("min_value"),
        F.max(value_col).alias("max_value"),
    )


def _coarsen(finer: DataFrame, keys: Sequence[str], width_sec: int) -> DataFrame:
    """Re-aggregate a finer rollup level to ``width_sec`` buckets —
    mergeable aggregates only, reads the rollup, not raw data."""
    b = (
        (F.col("bucket_start") - F.pmod(F.col("bucket_start"), F.lit(width_sec)))
        .cast("long")
        .alias("bucket_start")
    )
    return finer.groupBy(b, *keys).agg(
        F.sum("n").alias("n"),
        F.sum("sum_value").alias("sum_value"),
        F.min("min_value").alias("min_value"),
        F.max("max_value").alias("max_value"),
    )


def hypertable_rollup(
    df: DataFrame,
    ts_ns_col: str = "ts",
    value_col: str = "value",
    keys: Sequence[str] = ("event_type",),
    widths_sec: Sequence[int] = (60, 3600, 86400),
) -> dict[int, DataFrame]:
    """Cascade of tumbling rollups at increasing widths.  Each level
    derives from the previous (widths must be ascending and each a
    multiple of the last); only the finest level scans the input.

    One shuffle per level, and every shuffle after the first moves
    already-reduced rows (|buckets| × |keys|, not |events|).  For a
    streaming hypertable, feed the finest level from
    ``streaming/event_time.py::windowed_counts`` and re-aggregate the
    append-mode output the same way.
    """
    widths = list(widths_sec)
    for a, b in zip(widths, widths[1:]):
        if b % a:
            raise ValueError(f"rollup widths must nest: {b} % {a} != 0")
    levels: dict[int, DataFrame] = {widths[0]: _finest(df, ts_ns_col, value_col, keys, widths[0])}
    prev_df = levels[widths[0]]
    for w in widths[1:]:
        prev_df = _coarsen(prev_df, keys, w)
        levels[w] = prev_df
    return levels


def streaming_finest(
    stream: DataFrame,
    ts_col: str = "ts",
    value_col: str = "value",
    keys: Sequence[str] = ("event_type",),
    width_sec: int = 60,
    watermark: str = "10 seconds",
) -> DataFrame:
    """Streaming form of the finest rollup level: tumbling event-time
    window + watermark, append mode emits only FINALIZED buckets.  The
    output schema matches ``_finest`` exactly, so ``_coarsen`` /
    ``rollup_union`` re-aggregate it unchanged — this is the
    continuous-aggregate ingestion path (stream keeps the finest level
    fresh; coarser levels derive from it in batch)."""
    v = F.col(value_col).cast("decimal(18,2)")
    return (
        stream.withWatermark(ts_col, watermark)
        .groupBy(F.window(F.col(ts_col), f"{width_sec} seconds"), *keys)
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum(v).alias("sum_value"),
            F.min(value_col).alias("min_value"),
            F.max(value_col).alias("max_value"),
        )
        .select(
            F.col("window.start").cast("long").alias("bucket_start"),
            *keys,
            "n",
            "sum_value",
            "min_value",
            "max_value",
        )
    )


def coarsen_level(finer: DataFrame, keys: Sequence[str], width_sec: int) -> DataFrame:
    """Public re-aggregation step (used to derive coarser levels from a
    materialized finest level — batch or collected streaming output)."""
    return _coarsen(finer, keys, width_sec)


def rollup_union(levels: dict[int, DataFrame], keys: Sequence[str]) -> DataFrame:
    """All levels stacked with a ``res_sec`` discriminator — the shape
    a query router would hit (pick the coarsest level covering the
    requested granularity)."""
    out = None
    for w, df in levels.items():
        tagged = df.select(
            F.lit(w).cast("long").alias("res_sec"),
            "bucket_start",
            *keys,
            "n",
            "sum_value",
            "min_value",
            "max_value",
        )
        out = tagged if out is None else out.unionByName(tagged)
    return out
