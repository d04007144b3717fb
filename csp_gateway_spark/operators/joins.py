"""Stream combination + time-series joins.

Reference surface: union-of-setters (`channels.py:439-472`,
``csp.merge`` in `omnibus.py:252-257`) and keyed point lookups
(`auth_filter.py:161-219`, `web/routes/lookup.py:29-85`).  Relational
joins are absent there; as-of / interval joins are part of our additive
surface (SURVEY §2.4) because event-driven pipelines need them.

Scale design:
- ``asof_join`` uses the union+window formulation: ONE shuffle on the
  key, no range-explosion, no per-key collect.  Sort happens within
  key partitions only.  This is the canonical large-scale as-of plan
  (a sort-merge join would need an inequality condition Spark turns
  into a broadcast-nested-loop without an equi-prefix).
- ``interval_join`` is an equi-join on key plus a range predicate —
  Spark executes sort-merge on the key and filters the range, which
  scales linearly; AQE handles skew.
- ``merge`` is unionByName — a metadata op, zero shuffle.
"""

from __future__ import annotations

from typing import Optional, Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window


def merge(*dfs: DataFrame) -> DataFrame:
    """csp.merge / multi-setter multiplex (`channels.py:439-472`)."""
    out = dfs[0]
    for df in dfs[1:]:
        out = out.unionByName(df, allowMissingColumns=True)
    return out


def asof_join(
    left: DataFrame,
    right: DataFrame,
    on: Sequence[str],
    left_time: str,
    right_time: str,
    right_cols: Optional[Sequence[str]] = None,
    tolerance: Optional[int] = None,
    suffix: str = "_right",
    direction: str = "backward",
) -> DataFrame:
    """As-of join (pandas ``merge_asof`` directions):

    - ``backward`` (default): latest right row with
      ``right_time <= left_time`` per key;
    - ``forward``: earliest right row with ``right_time >= left_time``;
    - ``nearest``: whichever of the two is closer in time (tie →
      backward, pandas semantics).

    Equal timestamps match (inclusive), like DuckDB's ASOF JOIN.
    All directions keep the union+window formulation — ONE shuffle on
    the key, both carries read the same partition sort (same window
    ordering, mirrored frames).

    ``tolerance``: optional max lookback/lookahead in the time
    column's own units (applies per side for ``nearest``).
    Result: all left rows + right payload columns (suffixed), null
    when no match.
    """
    if direction not in ("backward", "forward", "nearest"):
        raise ValueError(f"unknown as-of direction: {direction!r}")
    on = list(on)
    right_cols = [c for c in (right_cols or right.columns) if c not in on and c != right_time]

    lpay = [c for c in left.columns if c not in on]
    l = left.select(
        *on,
        F.col(left_time).alias("_t"),
        F.lit(1).alias("_side"),
        F.struct(*[F.col(c) for c in lpay]).alias("_l"),
        F.lit(None).cast(
            right.select(F.struct(*[F.col(c) for c in right_cols + [right_time]]).alias("s")).schema["s"].dataType.simpleString()
        ).alias("_r"),
    )
    r = right.select(
        *on,
        F.col(right_time).alias("_t"),
        F.lit(0).alias("_side"),
        F.lit(None).cast(
            left.select(F.struct(*[F.col(c) for c in lpay]).alias("s")).schema["s"].dataType.simpleString()
        ).alias("_l"),
        F.struct(*[F.col(c) for c in right_cols + [right_time]]).alias("_r"),
    )
    unioned = l.unionByName(r)
    part = Window.partitionBy(*[F.col(k) for k in on])
    # backward sorts rights before lefts at equal t (inclusive match
    # under a trailing frame); forward mirrors with rights AFTER lefts
    # so the leading frame is inclusive too.  A second direction costs
    # one extra in-partition sort, never a shuffle.
    w_back = part.orderBy(F.col("_t"), F.col("_side")).rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    w_fwd = part.orderBy(F.col("_t"), F.col("_side").desc()).rowsBetween(
        Window.currentRow, Window.unboundedFollowing
    )
    carried = unioned
    if direction in ("backward", "nearest"):
        carried = carried.withColumn(
            "_mb", F.last(F.col("_r"), ignorenulls=True).over(w_back)
        )
    if direction in ("forward", "nearest"):
        carried = carried.withColumn(
            "_mf", F.first(F.col("_r"), ignorenulls=True).over(w_fwd)
        )
    probe = carried.filter(F.col("_side") == 1)
    if tolerance is not None:
        if direction in ("backward", "nearest"):
            probe = probe.withColumn(
                "_mb",
                F.when(
                    F.col("_t") - F.col(f"_mb.{right_time}") <= F.lit(tolerance),
                    F.col("_mb"),
                ),
            )
        if direction in ("forward", "nearest"):
            probe = probe.withColumn(
                "_mf",
                F.when(
                    F.col(f"_mf.{right_time}") - F.col("_t") <= F.lit(tolerance),
                    F.col("_mf"),
                ),
            )
    if direction == "backward":
        probe = probe.withColumn("_match", F.col("_mb"))
    elif direction == "forward":
        probe = probe.withColumn("_match", F.col("_mf"))
    else:
        back_dist = F.col("_t") - F.col(f"_mb.{right_time}")
        fwd_dist = F.col(f"_mf.{right_time}") - F.col("_t")
        probe = probe.withColumn(
            "_match",
            F.when(F.col("_mb").isNull(), F.col("_mf"))
            .when(F.col("_mf").isNull(), F.col("_mb"))
            .when(fwd_dist < back_dist, F.col("_mf"))
            .otherwise(F.col("_mb")),
        )
    out = probe.select(
        *on,
        F.col("_t").alias(left_time),
        "_l.*",
        *[F.col(f"_match.{c}").alias(f"{c}{suffix}" if c in set(lpay) | set(on) else c) for c in right_cols],
    )
    return out


def interval_join(
    left: DataFrame,
    right: DataFrame,
    on: Sequence[str],
    left_time: str,
    right_time: str,
    lower: int,
    upper: int,
    suffix: str = "_right",
) -> DataFrame:
    """Inner join where ``left_time + lower <= right_time <= left_time +
    upper`` per key (stream-stream time-interval join semantics, batch
    form).  Times in the column's own units (ns for events.ts)."""
    on = list(on)
    lt, rt = F.col(f"l.{left_time}"), F.col(f"r.{right_time}")
    cond = F.lit(True)
    for k in on:
        cond = cond & (F.col(f"l.{k}") == F.col(f"r.{k}"))
    cond = cond & (rt >= lt + lower) & (rt <= lt + upper)
    joined = left.alias("l").join(right.alias("r"), cond, "inner")
    lcols = [F.col(f"l.{c}").alias(c) for c in left.columns]
    rcols = [
        F.col(f"r.{c}").alias(f"{c}{suffix}" if c in left.columns else c)
        for c in right.columns
        if c not in on
    ]
    return joined.select(*lcols, *rcols)


def lookup_join(state: DataFrame, key_col: str, key_value) -> DataFrame:
    """Per-identity last cache / point lookup (`auth_filter.py:161-219`)."""
    return state.filter(F.col(key_col) == F.lit(key_value))
