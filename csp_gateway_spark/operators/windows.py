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


def rolling_stats(
    df: DataFrame,
    value_col: str,
    keys: Sequence[str],
    order_cols: Sequence[str],
    n: int = 20,
) -> DataFrame:
    """Trailing-N moving aggregates per key: rolling decimal sum,
    count, min and max over the last ``n`` rows ordered by
    ``order_cols`` — the moving-average / band primitive behind every
    monitoring chart the gateway's UI draws from its tick stream.

    One shuffle (hash by ``keys``), then a sorted rows-frame window —
    bounded frame, so per-row state is O(n) and the task never
    materializes the whole partition's history.  The rolling SUM is
    computed on decimal(18,2): windowed summation trees (DuckDB uses
    segment trees, Spark a running frame) add in different orders, so
    a double sum would differ in ULPs across engines; decimal is
    associative-exact.  ``order_cols`` must be a total order (add a
    unique id as tiebreaker) or frame contents are nondeterministic.
    """
    from pyspark.sql import Window

    w = (
        Window.partitionBy(*[F.col(k) for k in keys])
        .orderBy(*[F.col(c) for c in order_cols])
        .rowsBetween(-(n - 1), 0)
    )
    v = F.col(value_col)
    return df.select(
        *keys,
        *order_cols,
        v.alias(value_col),
        F.sum(v.cast("decimal(18,2)")).over(w).alias("roll_sum"),
        F.count(v).over(w).alias("roll_n"),
        F.min(v).over(w).alias("roll_min"),
        F.max(v).over(w).alias("roll_max"),
    )


def gap_fill_locf(
    df: DataFrame,
    ts_ns_col: str,
    value_col: str,
    keys: Sequence[str],
    step_sec: int = 3600,
) -> DataFrame:
    """Regular-grid resample with last-observation-carried-forward:
    per key, emit one row per ``step_sec`` bucket from the key's first
    to last event, carrying the latest observed value across empty
    buckets — how a tick stream becomes the evenly-spaced series that
    joins, charts, and models expect.

    Plan: (1) one groupBy(keys ⊕ bucket) reduces raw events to the
    last value per occupied bucket (``max_by`` over (ts, tiebreak) —
    map-side combinable); (2) per-key min/max bounds generate the
    dense grid with ``sequence()`` + ``explode`` — grid size is
    (span/step) rows per key, created distributed, never on the
    driver; (3) a co-partitioned left join plus a ``last(ignorenulls)``
    window fills the gaps.  Shuffles are all keyed on ``keys`` —
    AQE coalesces the tiny grid side.  Values are carried, not
    computed, so output is engine-exact."""
    from pyspark.sql import Window

    step_ns = step_sec * NS_PER_SEC
    # integer `div`, never `/`: ns epochs exceed 2^53, so a double
    # intermediate would round the numerator before dividing.
    bucket = F.expr(f"({ts_ns_col} div {step_ns}L) * {step_sec}L")
    ks = [F.col(k) for k in keys]

    per_bucket = (
        df.withColumn("_bucket", bucket.cast("long"))
        .groupBy(*ks, F.col("_bucket"))
        .agg(
            F.expr(
                f"max_by({value_col}, struct({ts_ns_col}, {value_col}))"
            ).alias("_v")
        )
    )
    bounds = per_bucket.groupBy(*ks).agg(
        F.min("_bucket").alias("_lo"), F.max("_bucket").alias("_hi")
    )
    grid = bounds.select(
        *ks,
        F.explode(
            F.sequence(F.col("_lo"), F.col("_hi"), F.lit(int(step_sec)))
        ).alias("bucket_start"),
    )
    w = (
        Window.partitionBy(*ks)
        .orderBy("bucket_start")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    joined = grid.join(
        per_bucket.withColumnRenamed("_bucket", "bucket_start"),
        [*keys, "bucket_start"],
        "left",
    )
    return joined.select(
        *keys,
        "bucket_start",
        F.last("_v", ignorenulls=True).over(w).alias("value"),
        F.col("_v").isNotNull().alias("observed"),
    )


def windowed_topk(
    df: DataFrame,
    ts_ns_col: str,
    key_col: str,
    width_sec: int = 86400,
    k: int = 3,
) -> DataFrame:
    """Per-window heavy hitters: the top-``k`` keys by count inside
    every tumbling ``width_sec`` bucket — "what dominated each hour",
    the drill-down view behind the global `cms_topk` sketch.

    One (bucket, key) count shuffle with map-side combine, then a
    rank window PARTITIONED BY BUCKET — bounded by the bucket's
    distinct keys, never corpus-global.  Integer bucket math (`div`,
    not `/`: ns epochs exceed 2^53)."""
    from pyspark.sql import Window

    step_ns = width_sec * NS_PER_SEC
    bucket = F.expr(f"({ts_ns_col} div {step_ns}L) * {width_sec}L")
    counts = (
        df.withColumn("bucket_start", bucket)
        .groupBy("bucket_start", key_col)
        .agg(F.count(F.lit(1)).alias("n"))
    )
    w = Window.partitionBy("bucket_start").orderBy(
        F.desc("n"), F.asc(key_col)
    )
    return (
        counts.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
    )


def event_transitions(
    df: DataFrame,
    key_col: str,
    type_col: str,
    order_cols,
) -> DataFrame:
    """First-order Markov transition matrix of a per-key event
    sequence: counts and P(next | current) over consecutive event
    pairs — the "what do users do after X" behavioral summary.

    One shuffle on ``key_col`` for the lead window, one small
    (cur, nxt) groupBy, and the per-``cur`` totals joined back as a
    broadcast (state-space sized).  The probability is a single
    division of exact integer counts.  ``order_cols`` must totally
    order events within a key."""
    from pyspark.sql import Window

    w = Window.partitionBy(key_col).orderBy(*[F.col(c) for c in order_cols])
    pairs = (
        df.withColumn("_nxt", F.lead(F.col(type_col)).over(w))
        .filter(F.col("_nxt").isNotNull())
        .select(F.col(type_col).alias("cur"), F.col("_nxt").alias("nxt"))
    )
    counts = pairs.groupBy("cur", "nxt").agg(F.count(F.lit(1)).alias("n"))
    totals = counts.groupBy("cur").agg(F.sum("n").alias("_tot"))
    return counts.join(F.broadcast(totals), "cur").select(
        "cur",
        "nxt",
        "n",
        (F.col("n").cast("double") / F.col("_tot").cast("double")).alias("p"),
    )


def interarrival_stats(
    df: DataFrame,
    key_col: str,
    ts_ns_col: str,
    order_tiebreak: str,
) -> DataFrame:
    """Per-key inter-arrival-time distribution (median / p90 / max of
    consecutive-event gaps, in ns) — the cadence profile that sizes
    watermarks, session gaps and staleness alerts.

    One shuffle on ``key_col`` for the lag window; gaps are exact
    integer ns so the percentiles land on binary-exact x.0/x.5
    doubles.  Exact ``percentile`` holds one key's gaps per task —
    swap for ``approx_percentile`` at 100 TB key cardinalities."""
    from pyspark.sql import Window

    w = Window.partitionBy(key_col).orderBy(
        F.col(ts_ns_col), F.col(order_tiebreak)
    )
    gaps = (
        df.withColumn("_gap", F.col(ts_ns_col) - F.lag(F.col(ts_ns_col)).over(w))
        .filter(F.col("_gap").isNotNull())
    )
    return gaps.groupBy(key_col).agg(
        F.count(F.lit(1)).alias("n_gaps"),
        F.expr("percentile(_gap, 0.5)").alias("p50_ns"),
        F.expr("percentile(_gap, 0.9)").alias("p90_ns"),
        F.max("_gap").alias("max_ns"),
    )


def sessionize_rows(
    df: DataFrame,
    ts_col: str,
    gap: int,
    keys: Sequence[str],
) -> DataFrame:
    """Row-preserving sessionization: every input row plus its
    ``session_start`` (the session's first event time) — the
    gaps-and-islands prefix `sessionize` aggregates away, exposed for
    operators that need within-session structure (session funnels,
    dwell analysis).  One shuffle on keys; both windows share the
    partition sort."""
    from pyspark.sql import Window

    ts = F.col(ts_col)
    w = Window.partitionBy(*[F.col(k) for k in keys]).orderBy(ts)
    new_session = (ts - F.lag(ts).over(w) > gap) | F.lag(ts).over(w).isNull()
    wrun = (
        Window.partitionBy(*[F.col(k) for k in keys])
        .orderBy(ts)
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    sessioned = df.withColumn("_new", new_session.cast("int")).withColumn(
        "_session", F.sum("_new").over(wrun)
    )
    ws = Window.partitionBy(*[F.col(k) for k in keys], F.col("_session"))
    return sessioned.withColumn("session_start", F.min(ts).over(ws)).drop("_new")


def session_funnel(
    df: DataFrame,
    stages: Sequence[str],
    user_col: str,
    type_col: str,
    ts_col: str,
    gap: int,
) -> DataFrame:
    """Funnel evaluated WITHIN sessions (`funnel` evaluates lifetime
    first-touch): a session reaches stage k when the first occurrence
    of every stage 1..k inside that session is in non-decreasing time
    order.  Output: (stage_idx, stage, sessions, conv).

    Plan: row-preserving sessionization (one key shuffle), one
    groupBy(user, session) of conditional mins, a 1-row global count
    — same two-aggregate tree as `funnel` with the session key
    inserted."""
    stages = list(stages)
    rows = sessionize_rows(df, ts_col, gap, [user_col])
    ts = F.col(ts_col)
    firsts = rows.groupBy(F.col(user_col), F.col("_session")).agg(
        *[
            F.min(F.when(F.col(type_col) == s, ts)).alias(f"_t{i}")
            for i, s in enumerate(stages)
        ]
    )
    reach = []
    cond = F.col("_t0").isNotNull()
    reach.append(cond)
    for i in range(1, len(stages)):
        cond = cond & F.col(f"_t{i}").isNotNull() & (
            F.col(f"_t{i}") >= F.col(f"_t{i-1}")
        )
        reach.append(cond)
    counts = firsts.agg(
        F.count(F.lit(1)).alias("_sessions"),
        *[F.sum(r.cast("long")).alias(f"_n{i}") for i, r in enumerate(reach)],
    )
    return counts.selectExpr(
        f"stack({len(stages)}, "
        + ", ".join(f"{i + 1}, '{s}', _n{i}" for i, s in enumerate(stages))
        + ") AS (stage_idx, stage, sessions)",
        "_n0 AS _first",
    ).selectExpr(
        "stage_idx",
        "stage",
        "CAST(sessions AS BIGINT) AS sessions",
        "CAST(sessions AS DOUBLE) / CAST(_first AS DOUBLE) AS conv",
    )
