"""Keyed last-value state — the reference's core query primitive.

Reference: ``State[T]`` accumulates the last record per ``keyby`` group
and serves it sorted by key ASC NULLS FIRST with optional filters
(`server/gateway/csp/state.py:165-225` default impl, `:228-490` DuckDB
impl: ``SELECT last(duck_id) ... GROUP BY keys ORDER BY keys``).

Spark design (scale-first):
- ``keyed_last`` uses ``groupBy(keys).agg(max_by(struct(*), order))``
  rather than a window + row_number: max_by gets **map-side partial
  aggregation** (each task reduces to one candidate row per key before
  the shuffle), so shuffle volume is O(distinct keys), not O(rows).
  At 100 TB with a bounded key space this is the difference between a
  full-data shuffle and a metadata-sized one.
- Ties are broken by an explicit deterministic tiebreak column list so
  batch replay is reproducible (csp has no ties: one tick per cycle).
- The streaming equivalent lives in streaming/state_stream.py.
"""

from __future__ import annotations

from typing import Optional, Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def keyed_last(
    df: DataFrame,
    keys: Sequence[str],
    order_by: Sequence[str] = ("timestamp",),
    sort_output: bool = True,
) -> DataFrame:
    """Last record per key group.

    ``order_by``: columns defining recency (engine time first, then a
    unique tiebreak like ``id`` / ``event_id`` for determinism).
    Output ordered by keys ASC NULLS FIRST (reference `state.py:193`).
    """
    keys = list(keys)
    order_cols = [c for c in order_by if c in df.columns]
    payload = [c for c in df.columns if c not in keys]
    agg = F.max_by(
        F.struct(*[F.col(c) for c in payload]),
        F.struct(*[F.col(c) for c in order_cols]),
    ).alias("_last")
    out = df.groupBy(*keys).agg(agg)
    out = out.select(*keys, "_last.*")
    if sort_output:
        out = out.orderBy(*[F.asc_nulls_first(k) for k in keys])
    return out


def last_tick(df: DataFrame, order_by: Sequence[str] = ("timestamp",)) -> DataFrame:
    """The single most recent record of a channel (`/last`,
    `channels.py:747-787`).  Global max_by — one partial-agg pass, no
    full sort."""
    order_cols = [c for c in order_by if c in df.columns]
    agg = F.max_by(
        F.struct(*[F.col(c) for c in df.columns]),
        F.struct(*[F.col(c) for c in order_cols]),
    ).alias("_last")
    return df.groupBy().agg(agg).select("_last.*")


def upsert_table(
    df: DataFrame,
    index: Sequence[str],
    order_by: Sequence[str] = ("timestamp",),
    limit: Optional[int] = None,
) -> DataFrame:
    """Perspective table ``index``/``limit`` semantics
    (`modules/web/perspective.py:468-475`):

    - ``index``: upsert key, last write wins (≙ keyed_last on index);
    - ``limit``: keep only the N most recent rows (ring buffer).
    """
    out = keyed_last(df, list(index), order_by=order_by, sort_output=False)
    if limit is not None:
        order_cols = [c for c in order_by if c in out.columns]
        # Ring-buffer semantics only need the global top-N by recency:
        # orderBy+limit compiles to TakeOrderedAndProject (per-partition
        # partial top-k, then a k-row merge on the driver) — no
        # single-task global sort, unlike a row_number window with no
        # PARTITION BY, which funnels the whole table through one task.
        out = out.orderBy(*[F.desc(c) for c in order_cols]).limit(limit)
    return out


def computed_index(df: DataFrame, fields: Sequence[str], out_col: str = "index") -> DataFrame:
    """Multi-field index → ``"-".join(fields)`` computed key column
    (`perspective.py:468-475`)."""
    return df.withColumn(out_col, F.concat_ws("-", *[F.col(f).cast("string") for f in fields]))


def scd2(
    df: DataFrame,
    keys: Sequence[str],
    ts_col: str,
    attr_cols: Sequence[str],
) -> DataFrame:
    """Type-2 slowly-changing-dimension build from a change stream:
    per key, order ticks by ``ts_col``, collapse runs of identical
    ``attr_cols`` into one version, and emit
    (keys, attrs, valid_from, valid_to, is_current) — the warehouse
    dimension-history table the gateway's changelog feeds.

    One shuffle on ``keys``; the change-detect lag and the valid_to
    lead use the SAME window spec, so Catalyst plans a single sort and
    both passes share it.  Runs collapse BEFORE the lead, so valid_to
    spans the whole run.  ``ts_col`` must be unique per key (tick
    streams with an id tiebreaker: pass a composite via a computed
    column) — otherwise run boundaries are nondeterministic.
    """
    from pyspark.sql.window import Window

    w = Window.partitionBy(*keys).orderBy(ts_col)
    attrs = [F.col(a) for a in attr_cols]
    # the first row per key is ALWAYS a version: anchor on lag(ts)
    # being NULL — without it, a first row whose attrs are all NULL
    # collides with lag's no-previous-row NULL (eqNullSafe(NULL,NULL)
    # is true) and the opening version vanishes
    changed = F.lag(F.col(ts_col)).over(w).isNull()
    for a in attr_cols:
        prev = F.lag(F.col(a)).over(w)
        changed = changed | (~F.col(a).eqNullSafe(prev))
    versions = df.withColumn("_chg", changed).filter(F.col("_chg"))
    w2 = Window.partitionBy(*keys).orderBy(ts_col)
    return (
        versions.withColumn("valid_to", F.lead(F.col(ts_col)).over(w2))
        .select(
            *keys,
            *attr_cols,
            F.col(ts_col).alias("valid_from"),
            "valid_to",
            F.col("valid_to").isNull().alias("is_current"),
        )
    )


def agg_state(
    df: DataFrame,
    keys: Sequence[str],
    value_col: str,
) -> DataFrame:
    """Mergeable per-key aggregate state: (n, sum — exact decimal,
    min, max).  The saved form of an incremental materialized view:
    every component is associative, so states merge with
    ``merge_agg_state`` without rescanning the base data."""
    return df.groupBy(*[F.col(k) for k in keys]).agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(F.col(value_col).cast("decimal(18,2)")).alias("sum_v"),
        F.min(F.col(value_col)).alias("min_v"),
        F.max(F.col(value_col)).alias("max_v"),
    )


def merge_agg_state(
    base: DataFrame,
    delta: DataFrame,
    keys: Sequence[str],
) -> DataFrame:
    """Incremental view maintenance: merge a saved ``agg_state`` table
    with a new batch's state — union + ONE re-aggregate over the
    (already collapsed) states, so maintaining the view costs
    O(|delta| + |state|), never a base rescan.  Exactly equals the
    from-scratch aggregate (decimal sums are associative; min/max/count
    trivially so) — the gate query proves merge(pre, post) ≡ full."""
    u = base.unionByName(delta)
    return u.groupBy(*[F.col(k) for k in keys]).agg(
        F.sum("n").alias("n"),
        F.sum("sum_v").alias("sum_v"),
        F.min("min_v").alias("min_v"),
        F.max("max_v").alias("max_v"),
    )
