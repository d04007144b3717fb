"""Physical-plan utilities for the 100 TB design point.

The reference runs in one process and has no planner (SURVEY §4); on
Spark the *engine* work is making sure every operator keeps a plan
that survives 1000 executors:

- joins: broadcast small dims explicitly; salt skewed keys when AQE's
  skew-join can't help (e.g. stream-stream);
- state: partition by state key so streaming aggregation state is
  local; bucket write for co-located re-joins;
- scans: check pushdown reached parquet (``assert_pushdown``).
"""

from __future__ import annotations

from typing import List, Optional, Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

#: adaptive rank-bucket sizing: per-bucket task size is bounded by a
#: CONSTANT number of rows, not data/64 — at 100 TB a fixed bucket
#: count makes each per-bucket sort grow linearly with the data.
TARGET_ROWS_PER_BUCKET = 2_000_000
MIN_RANK_BUCKETS = 64
MAX_RANK_BUCKETS = 4096


def adaptive_bucket_count(
    n_rows,
    target_rows_per_bucket: int = TARGET_ROWS_PER_BUCKET,
    lo: int = MIN_RANK_BUCKETS,
    hi: int = MAX_RANK_BUCKETS,
) -> Column:
    """``clamp(ceil(n / target), lo, hi)`` as a Column expression over
    the broadcast row-count aggregate — the bucket count the rank
    family uses GROWS with input rows so per-bucket task size stays
    bounded.  Derived from an exact count, so it is deterministic even
    if Spark recomputes the subtree per branch (same property the
    min/max cutoffs rely on)."""
    n = n_rows if isinstance(n_rows, Column) else F.lit(n_rows)
    raw = F.ceil(n.cast("double") / F.lit(float(target_rows_per_bucket)))
    return F.least(F.lit(hi), F.greatest(F.lit(lo), raw.cast("int")))


#: key attributes of the SF-scaling tables: any frame whose analyzed
#: plan still reads one of these RAW (no aggregation between the scan
#: and the hint) grows with the data — customer at the 100 TB design
#: point is ~10 B rows, supplier ~0.7 B — and a FORCED broadcast OOMs
#: the build side where a plain join (AQE decides from runtime stats)
#: is correct.
_FACT_KEY_ATTRS = (
    "c_custkey",
    "s_suppkey",
    "p_partkey",
    "o_orderkey",
    "l_orderkey",
    "ps_partkey",
    "event_id",
    "doc_id",
    "vec_id",
)


def broadcast_dim(df: DataFrame) -> DataFrame:
    """Mark a dimension table for broadcast join (metadata-sized
    tables: region/nation/date dims and bounded derived aggregates).

    The hint is CONDITIONAL on the input actually being
    dimension-sized: if the analyzed plan reads a fact-table column
    (``_FACT_KEY_ATTRS``) with no Aggregate anywhere in the subtree,
    the frame scales with the data and the hint is DECLINED — the
    join is left plain and AQE's runtime broadcast conversion (or the
    static autoBroadcastJoinThreshold estimate) picks the strategy
    from real sizes.  Aggregate-derived frames (a global max, a
    per-group threshold) keep the hint: their cardinality is bounded
    by the group domain, which the call site vouches for.  Join
    results stay identical either way — only the physical strategy
    moves.

    The check WALKS the analyzed plan (node class names + every
    node's output attribute names) instead of substring-matching
    ``toString()`` — the rendered form truncates attribute lists at
    ``spark.sql.debug.maxToStringFields`` (default 25), which could
    elide a key attribute on a wide fact frame and silently keep the
    forced broadcast, and a string literal containing a key name
    could spuriously decline the hint (ADVICE r13).  Outputs are
    collected from ALL nodes, not only leaf scans, so a fact key
    surfaced by a Project alias still declines; string literals never
    appear in output attribute names, so they can't spuriously
    match."""
    try:
        classes: List[str] = []
        attrs: List[str] = []

        def _walk(node) -> None:
            classes.append(node.getClass().getSimpleName())
            out = node.output()
            for i in range(out.size()):
                attrs.append(out.apply(i).name())
            ch = node.children()
            for i in range(ch.size()):
                _walk(ch.apply(i))

        _walk(df._jdf.queryExecution().analyzed())
    except Exception:  # noqa: BLE001 — connect-mode/shim: keep the hint
        return F.broadcast(df)
    if "Aggregate" not in classes and any(a in _FACT_KEY_ATTRS for a in attrs):
        return df
    return F.broadcast(df)


def salt_keys(df: DataFrame, key: str, buckets: int = 16, out_col: str = "_salted_key") -> DataFrame:
    """Skew mitigation for heavy hitters: append a deterministic
    per-row salt (hash of the whole row mod buckets), spreading one hot
    key over ``buckets`` partitions.  Join the salted probe side
    against an exploded (key × salt) build side from explode_salts."""
    salt = F.pmod(F.hash(*[F.col(c) for c in df.columns]), F.lit(buckets))
    return df.withColumn(
        out_col, F.concat_ws("#", F.col(key).cast("string"), salt.cast("string"))
    )


def explode_salts(dim: DataFrame, key: str, buckets: int = 16, out_col: str = "_salted_key") -> DataFrame:
    """Build side of a salted join: replicate each dim row once per
    salt value.  The original key column is dropped (the salted key
    replaces it) so the join result has no ambiguous columns."""
    salts = F.explode(F.sequence(F.lit(0), F.lit(buckets - 1)))
    return (
        dim.withColumn("_salt", salts)
        .withColumn(out_col, F.concat_ws("#", F.col(key).cast("string"), F.col("_salt").cast("string")))
        .drop("_salt", key)
    )


def partition_for_state(df: DataFrame, keys: Sequence[str], partitions: Optional[int] = None) -> DataFrame:
    """Co-locate rows by state key ahead of repeated keyed operations
    (state builds, as-of joins on the same key)."""
    cols = [F.col(k) for k in keys]
    return df.repartition(partitions, *cols) if partitions else df.repartition(*cols)


def write_bucketed(df: DataFrame, path_table: str, keys: Sequence[str], buckets: int = 64, sort_by: Optional[Sequence[str]] = None) -> None:
    """Persist a table bucketed by join/state key: later joins between
    tables bucketed the same way skip the shuffle entirely."""
    writer = df.write.mode("overwrite").bucketBy(buckets, *keys)
    if sort_by:
        writer = writer.sortBy(*sort_by)
    writer.saveAsTable(path_table)


def explain_str(df: DataFrame, mode: str = "formatted") -> str:
    return df._sc._jvm.PythonSQLUtils.explainString(df._jdf.queryExecution(), mode)  # type: ignore[attr-defined]


def assert_pushdown(df: DataFrame, expect_filters: bool = True, expect_columns: Optional[List[str]] = None) -> str:
    """Inspect the formatted plan: verify PushedFilters is non-empty
    and the parquet ReadSchema only contains the expected columns.
    Returns the plan text (for logging); raises AssertionError."""
    import re

    plan = explain_str(df)
    if expect_filters:
        pushed = re.findall(r"PushedFilters: \[([^\]]*)\]", plan)
        if not any(p.strip() for p in pushed):
            raise AssertionError(f"no filters pushed to scan:\n{plan}")
    if expect_columns is not None:
        m = re.search(r"ReadSchema: struct<([^>]*)>", plan)
        if m:
            read_cols = {c.split(":")[0] for c in m.group(1).split(",") if c}
            extra = read_cols - set(expect_columns)
            if extra:
                raise AssertionError(f"scan reads unexpected columns {extra}:\n{plan}")
    return plan


def with_zvalue(
    df: DataFrame,
    cols: Sequence[str],
    bits: int = 12,
    out_col: str = "_zvalue",
) -> DataFrame:
    """Append a Z-order (Morton) curve value over 2+ NUMERIC columns:
    each column is linearly scaled to a ``bits``-bit integer grid via
    a broadcast 1-row min/max aggregate, then the bits are interleaved
    (all-native shift/mask expressions — no UDF).

    Sorting a write by ``_zvalue`` clusters rows so every parquet
    file's min/max envelope is TIGHT on *all* the columns at once —
    multi-dimensional data skipping (the Delta/Iceberg OPTIMIZE ZORDER
    trick) for point/range predicates on any participating column,
    where a single-column sort only helps its leading column.
    ``bits * len(cols)`` must be ≤ 63.
    """
    if bits * len(cols) > 63:
        raise ValueError("bits * len(cols) must fit in a long")
    stats = df.agg(
        *[F.min(F.col(c).cast("double")).alias(f"_zmin_{c}") for c in cols],
        *[F.max(F.col(c).cast("double")).alias(f"_zmax_{c}") for c in cols],
    )
    out = df.crossJoin(F.broadcast(stats))
    grid = (1 << bits) - 1
    cells = []
    for c in cols:
        lo, hi = F.col(f"_zmin_{c}"), F.col(f"_zmax_{c}")
        span = F.when(hi > lo, hi - lo).otherwise(F.lit(1.0))
        frac = (F.col(c).cast("double") - lo) / span
        cells.append(
            F.least(F.floor(frac * F.lit(float(grid + 1))).cast("long"), F.lit(grid))
        )
    z = F.lit(0).cast("long")
    for b in range(bits):
        for i, cell in enumerate(cells):
            z = z + F.shiftleft(
                F.shiftright(cell, b).bitwiseAND(F.lit(1)), b * len(cells) + i
            )
    return out.withColumn(out_col, z).drop(
        *[f"_zmin_{c}" for c in cols], *[f"_zmax_{c}" for c in cols]
    )


def zorder_write(
    df: DataFrame,
    path: str,
    cols: Sequence[str],
    bits: int = 12,
    partitions: int = 8,
) -> None:
    """Write parquet clustered on the Z-curve: range-partition by
    ``_zvalue`` (sampling-based boundaries — no full global sort) and
    sort within partitions, so each output file covers one compact
    curve segment.  Readers then skip files/row-groups whose min/max
    envelope misses the predicate box on ANY indexed column."""
    zdf = with_zvalue(df, cols, bits)
    (
        zdf.repartitionByRange(partitions, "_zvalue")
        .sortWithinPartitions("_zvalue")
        .drop("_zvalue")
        .write.mode("overwrite")
        .parquet(path)
    )


def file_stats(spark, path: str, cols: Sequence[str]) -> DataFrame:
    """Data-skipping audit: per-file min/max/count for the given
    columns (the same envelope parquet footers expose to the scan
    planner).  One scan + one aggregation keyed on the file name."""
    df = spark.read.parquet(path).select(
        F.input_file_name().alias("file"), *[F.col(c) for c in cols]
    )
    aggs = []
    for c in cols:
        aggs += [F.min(c).alias(f"min_{c}"), F.max(c).alias(f"max_{c}")]
    return df.groupBy("file").agg(*aggs, F.count(F.lit(1)).alias("n_rows"))


def _small_global_row_number(
    df: DataFrame,
    metric,
    tiebreaks: Sequence,
    rn_col: str,
    ascending: bool,
    keep_cols: Optional[Sequence[str]],
    cum_pairs: Sequence,
    n_total: int,
) -> DataFrame:
    """Single-bucket fast path of :func:`global_row_number` for a
    frame PROVEN small (caller counted the checkpoint against
    ``small_threshold``): one partitioned window over a constant
    bucket — same columns, same types, same values as the bucketed
    plan, minus the count/offset machinery.  The window still carries
    a partition spec, so the frame never hits an unpartitioned
    WindowExec (the partition just happens to be singular, which the
    threshold makes safe)."""
    from pyspark.sql import Window
    from pyspark.sql.types import DecimalType

    metric = F.col(metric) if isinstance(metric, str) else metric
    tiebreaks = [F.col(t) if isinstance(t, str) else t for t in tiebreaks]
    # the caller just counted the checkpointed frame — bake the exact
    # count as a literal instead of re-deriving it via a broadcast
    # aggregate join (one fewer exchange in the shaved plan)
    counted = df.withColumn(
        "_n_total", F.lit(int(n_total)).cast("long")
    ).withColumn("_gr_bkt", F.lit(0))
    order = [metric.asc() if ascending else metric.desc()] + [
        t.asc() for t in tiebreaks
    ]
    w = Window.partitionBy("_gr_bkt").orderBy(*order)
    out = counted.withColumn(
        rn_col, F.row_number().over(w).cast("long")
    )
    for in_col, out_col in cum_pairs:
        cum = F.sum(F.col(in_col)).over(
            w.rowsBetween(Window.unboundedPreceding, 0)
        )
        # match the bucketed path's cum type exactly: its offsets fold
        # with a decimal(38,s) init, so decimals widen to (38,s)
        in_dt = df.schema[in_col].dataType
        if isinstance(in_dt, DecimalType):
            cum = cum.cast(DecimalType(38, in_dt.scale))
        out = out.withColumn(out_col, cum)
    out = out.drop("_gr_bkt")
    if keep_cols is not None:
        keep = [*keep_cols, "_n_total", rn_col]
        keep.extend(out_col for _in, out_col in cum_pairs)
        out = out.select(*keep)
    return out


def global_row_number(
    df: DataFrame,
    metric,
    tiebreaks: Sequence,
    rn_col: str = "_rn",
    ascending: bool = True,
    buckets: Optional[int] = None,
    target_rows_per_bucket: int = TARGET_ROWS_PER_BUCKET,
    keep_cols: Optional[Sequence[str]] = None,
    stats_df: Optional[DataFrame] = None,
    cum_value: Optional[str] = None,
    cum_col: str = "_cum",
    checkpoint: bool = False,
    small_threshold: Optional[int] = None,
    known_count: Optional[int] = None,
    cum_values: Optional[Sequence] = None,
) -> DataFrame:
    """Distributed global ``row_number`` over ``(metric, *tiebreaks)``
    without a single-task unpartitioned window.

    Two-phase plan (the range-partitioned rank the 100 TB design
    needs — an unpartitioned ``Window.orderBy`` funnels the whole
    frame through ONE task):

    1. assign each row an ORDER-RESPECTING bucket from a linear
       ``(metric - min) / span`` split — the ``(min, max)`` cutoffs
       come from a 1-row broadcast aggregate, and because min/max/count
       are exact order-independent aggregates the bucket expression is
       deterministic even if Spark recomputes the subtree per branch
       (no reliance on exchange reuse, no driver collect);
    2. per-bucket ``row_number`` (a PARTITIONED window) plus broadcast
       cumulative bucket offsets.  The per-bucket counts come from one
       hash aggregate, pack into a single broadcast map row, and the
       prefix offsets are an expression scan over the constant-length
       bucket array — no triangular join, no offset shuffle, no
       WindowExec in the plan lacking a partition spec.

    Rank is exact for ANY order-respecting bucketing, so value skew
    only affects balance, never correctness.  ``metric`` must be
    non-null and ``(metric, *tiebreaks)`` a strict total order.
    The result also carries ``_n_total`` (the broadcast global count)
    so callers can derive ntile/percent_rank without another scan.

    ``stats_df``: optional precomputed 1-row frame with columns
    ``(_gr_mn, _gr_mx, _n_total)`` — pass it when ranking several
    metrics of one frame so all cutoffs come from ONE aggregate pass
    (see ``rfm_segments``).

    ``cum_value``: optional EXACT-typed (decimal/integer) column to
    running-total alongside the rank — ``cum_col`` gets the inclusive
    cumulative sum in global order via the same two-phase plan
    (per-bucket window cumsum + broadcast bucket-total offsets).
    Exactness of the type is what makes the two-phase grouping equal
    the flat running sum (decimal/int addition is associative; double
    would drift).

    ``checkpoint``: lazily ``localCheckpoint`` the input before
    fanning out — the plan consumes ``df`` three times (stats,
    bucket counts, ranked join), so when the input is itself an
    aggregate (a collapsed dimension) this trades one bounded
    materialization for two subtree recomputes.  Leave False when the
    input is a bare pushdown scan (recompute is cheaper than
    materializing fact-width rows).

    ``small_threshold``: opt-in short-circuit for callers whose input
    is a COLLAPSED frame (distinct values of a bounded domain) that is
    usually far below one bucket-target.  The input is eagerly
    ``localCheckpoint``ed and counted (the count is free on the
    materialized blocks); at or below the threshold the rank comes
    from ONE single-bucket partitioned window over the checkpoint —
    identical output, ~3 fewer stages (no per-bucket count aggregate,
    no offset packing, no broadcast offset join).  Above the threshold
    the full bucketed machinery re-engages unchanged, so the plan
    still never funnels a large frame through one task.

    ``known_count``: exact row count of ``df`` the CALLER already paid
    a job for (e.g. an upstream moments aggregate over the same
    checkpointed frame).  With ``small_threshold``, skips this
    function's own checkpoint+count pair — the caller vouches both
    that the count is exact and that ``df`` is already materialized
    (or cheap to evaluate per consumer).

    ``cum_values``: sequence of ``(in_col, out_col)`` pairs for
    SEVERAL exact running totals in one pass — the k-column form of
    ``cum_value``/``cum_col`` (mutually exclusive with them).  Added
    round 14: callers that packed k counts into one decimal(38) to
    ride the single-``cum_value`` API paid ~10 BigDecimal pmod/divide
    ops per row to unpack (measured 1.3 s of jonckheere's 2.6 s final
    aggregate at sf0.1); k plain long cumulatives stay in codegen and
    remove any pack-capacity ceiling.  Per-bucket offset state grows
    from 1 to k values per bucket — broadcast-sized either way.
    """
    from pyspark.sql import Window

    if cum_values is not None:
        if cum_value is not None:
            raise ValueError("pass cum_value or cum_values, not both")
        cum_pairs = [tuple(p) for p in cum_values]
    else:
        cum_pairs = [(cum_value, cum_col)] if cum_value is not None else []
    if small_threshold is not None:
        if known_count is not None:
            n_small = int(known_count)
        else:
            df = df.localCheckpoint(eager=True)
            n_small = df.count()
        if n_small <= int(small_threshold):
            return _small_global_row_number(
                df, metric, tiebreaks, rn_col, ascending,
                keep_cols, cum_pairs, n_small,
            )
    elif checkpoint:
        df = df.localCheckpoint(eager=False)
    metric = F.col(metric) if isinstance(metric, str) else metric
    tiebreaks = [F.col(t) if isinstance(t, str) else t for t in tiebreaks]
    stats = stats_df if stats_df is not None else df.agg(
        F.min(metric).alias("_gr_mn"),
        F.max(metric).alias("_gr_mx"),
        F.count(F.lit(1)).alias("_n_total"),
    )
    b = df.crossJoin(F.broadcast(stats))
    # bucket count: explicit when given, else adaptive from the exact
    # broadcast count so per-bucket task size is bounded by
    # ``target_rows_per_bucket`` rows, not data/constant
    nb = (
        F.lit(buckets)
        if buckets is not None
        else adaptive_bucket_count(F.col("_n_total"), target_rows_per_bucket)
    )
    pos = metric.cast("double") - F.col("_gr_mn").cast("double")
    span = F.col("_gr_mx").cast("double") - F.col("_gr_mn").cast("double")
    raw = F.floor(pos / span * nb.cast("double")).cast("int")
    bkt = F.when(span <= F.lit(0.0), F.lit(0)).otherwise(
        F.least(nb - F.lit(1), F.greatest(F.lit(0), raw))
    )
    if not ascending:
        bkt = nb - F.lit(1) - bkt
    bucketed = b.withColumn("_gr_bkt", bkt).drop("_gr_mn", "_gr_mx")
    # per-bucket counts from ONE cheap hash aggregate (one add per
    # data row — a wide conditional-sum array would cost O(buckets)
    # aggregate buffers PER ROW); the ≤``buckets``-row result packs
    # into a single broadcast map row whose prefix offsets are an
    # expression scan — no triangular join, no offset shuffle
    count_aggs = [F.count(F.lit(1)).alias("_gr_cnt")]
    for j, (in_col, _out) in enumerate(cum_pairs):
        count_aggs.append(F.sum(F.col(in_col)).alias(f"_gr_vsum{j}"))
    counts = bucketed.groupBy("_gr_bkt").agg(*count_aggs)
    pack_aggs = [
        F.map_from_entries(
            F.collect_list(F.struct("_gr_bkt", "_gr_cnt"))
        ).alias("_cm")
    ]
    for j in range(len(cum_pairs)):
        pack_aggs.append(
            F.map_from_entries(
                F.collect_list(F.struct("_gr_bkt", f"_gr_vsum{j}"))
            ).alias(f"_vm{j}")
        )
    packed = counts.agg(*pack_aggs)
    # offset-array length from the max OBSERVED bucket id (≤ nb − 1):
    # empty trailing buckets need no offsets, and the count map itself
    # carries the bound, so the expression stays correct for any nb
    seq = F.sequence(
        F.lit(0),
        F.greatest(
            F.lit(0), F.coalesce(F.array_max(F.map_keys(F.col("_cm"))), F.lit(0))
        ),
    )
    zl = F.lit(0).cast("long")
    cnt_arr = F.transform(
        seq, lambda i: F.coalesce(F.element_at(F.col("_cm"), i), zl)
    )
    off_cols = [
        F.transform(
            seq,
            lambda i: F.aggregate(F.slice(cnt_arr, 1, i), zl, lambda a, x: a + x),
        ).alias("_gr_offs")
    ]
    for j in range(len(cum_pairs)):
        from pyspark.sql.types import DecimalType

        sum_dt = packed.schema[f"_vm{j}"].dataType.valueType
        vzero = F.lit(0).cast(sum_dt)
        vinit = (
            F.lit(0).cast(DecimalType(38, sum_dt.scale))
            if isinstance(sum_dt, DecimalType)
            else F.lit(0).cast(sum_dt)
        )

        def _mk_v_at(_j, _vz):
            return lambda i: F.coalesce(F.element_at(F.col(f"_vm{_j}"), i), _vz)

        v_arr = F.transform(seq, _mk_v_at(j, vzero))

        def _mk_off(_v, _init):
            return lambda i: F.aggregate(
                F.slice(_v, 1, i), _init, lambda a, x: a + x
            )

        off_cols.append(
            F.transform(seq, _mk_off(v_arr, vinit)).alias(f"_gr_voffs{j}")
        )
    offs = packed.select(*off_cols)
    idx1 = F.col("_gr_bkt") + F.lit(1)
    order = [metric.asc() if ascending else metric.desc()] + [t.asc() for t in tiebreaks]
    w = Window.partitionBy("_gr_bkt").orderBy(*order)
    out = bucketed.crossJoin(F.broadcast(offs)).withColumn(
        rn_col,
        (F.element_at(F.col("_gr_offs"), idx1) + F.row_number().over(w)).cast("long"),
    )
    for j, (in_col, out_col) in enumerate(cum_pairs):
        local_cum = F.sum(F.col(in_col)).over(
            w.rowsBetween(Window.unboundedPreceding, 0)
        )
        out = out.withColumn(
            out_col, F.element_at(F.col(f"_gr_voffs{j}"), idx1) + local_cum
        ).drop(f"_gr_voffs{j}")
    out = out.drop("_gr_bkt", "_gr_offs")
    if keep_cols is not None:
        keep = [*keep_cols, "_n_total", rn_col]
        keep.extend(out_col for _in, out_col in cum_pairs)
        out = out.select(*keep)
    return out


def grouped_row_number(
    df: DataFrame,
    group_cols: Sequence[str],
    metric,
    tiebreaks: Sequence,
    rn_col: str = "_rn",
    ascending: bool = True,
    buckets: Optional[int] = None,
    target_rows_per_bucket: int = TARGET_ROWS_PER_BUCKET,
    keep_cols: Optional[Sequence[str]] = None,
    cum_value: Optional[str] = None,
    cum_col: str = "_cum",
) -> DataFrame:
    """Per-group distributed ``row_number`` over ``(metric,
    *tiebreaks)`` — the grouped twin of :func:`global_row_number`.

    A plain ``Window.partitionBy(group)`` funnels EACH GROUP through
    one task, which is a cliff whenever the group column has low
    cardinality (3 return flags over a 100 TB fact table = a third of
    the data in one sort).  Here each group is range-split into
    ``buckets`` order-respecting sub-buckets exactly like
    ``global_row_number``:

    1. per-group ``(min, max, count)`` from ONE grouped aggregate,
       broadcast-joined back (the stats frame is group-cardinality);
    2. per-(group, bucket) PARTITIONED ``row_number`` plus broadcast
       cumulative bucket offsets: the (group, bucket) counts come from
       one hash aggregate, pack into a map per group row, and each
       group's prefix offsets are an expression scan over its
       constant-length bucket array — no triangular join, no offset
       shuffle.

    Rank is exact for any order-respecting bucketing; skew only
    affects balance.  ``metric`` must be non-null and ``(metric,
    *tiebreaks)`` a strict total order within each group.  The result
    carries ``_n_group`` (the broadcast per-group count).

    ``cum_value``: optional EXACT-typed (decimal/integer) column to
    running-total per group in global (group-local) order — same
    two-phase plan, exactness makes the grouped two-phase sum equal
    the flat per-group running sum bit-for-bit.

    Contract: the broadcast frames are ``|groups|`` and ``|groups| ×
    buckets`` rows — designed for low/moderate group cardinality (the
    case where the plain grouped window is a funnel).  At high group
    cardinality the plain ``Window.partitionBy(group)`` is already
    parallel and should be used instead.
    """
    from pyspark.sql import Window

    metric = F.col(metric) if isinstance(metric, str) else metric
    tiebreaks = [F.col(t) if isinstance(t, str) else t for t in tiebreaks]
    gcols = list(group_cols)
    stats = df.groupBy(*gcols).agg(
        F.min(metric).alias("_gr_mn"),
        F.max(metric).alias("_gr_mx"),
        F.count(F.lit(1)).alias("_n_group"),
    )
    b = df.join(F.broadcast(stats), gcols)
    # per-GROUP adaptive bucket count from the exact per-group count —
    # a 100 TB group still splits into bounded-size sub-buckets while
    # a 100-row group keeps the minimum fan-out
    nb = (
        F.lit(buckets)
        if buckets is not None
        else adaptive_bucket_count(F.col("_n_group"), target_rows_per_bucket)
    )
    pos = metric.cast("double") - F.col("_gr_mn").cast("double")
    span = F.col("_gr_mx").cast("double") - F.col("_gr_mn").cast("double")
    raw = F.floor(pos / span * nb.cast("double")).cast("int")
    bkt = F.when(span <= F.lit(0.0), F.lit(0)).otherwise(
        F.least(nb - F.lit(1), F.greatest(F.lit(0), raw))
    )
    if not ascending:
        bkt = nb - F.lit(1) - bkt
    bucketed = b.withColumn("_gr_bkt", bkt).drop("_gr_mn", "_gr_mx")
    # per-(group, bucket) counts from ONE cheap hash aggregate (one
    # add per data row), packed into a map per GROUP row; prefix
    # offsets are an expression scan over the group's constant-length
    # bucket array — no triangular join, no offset shuffle
    count_aggs = [F.count(F.lit(1)).alias("_gr_cnt")]
    if cum_value is not None:
        count_aggs.append(F.sum(F.col(cum_value)).alias("_gr_vsum"))
    counts = bucketed.groupBy(*gcols, "_gr_bkt").agg(*count_aggs)
    pack_aggs = [
        F.map_from_entries(
            F.collect_list(F.struct("_gr_bkt", "_gr_cnt"))
        ).alias("_cm")
    ]
    if cum_value is not None:
        pack_aggs.append(
            F.map_from_entries(
                F.collect_list(F.struct("_gr_bkt", "_gr_vsum"))
            ).alias("_vm")
        )
    packed = counts.groupBy(*gcols).agg(*pack_aggs)
    # per-group offset-array length from that group's max observed
    # bucket id — variable-length per group row, bounded by nb
    seq = F.sequence(
        F.lit(0),
        F.greatest(
            F.lit(0), F.coalesce(F.array_max(F.map_keys(F.col("_cm"))), F.lit(0))
        ),
    )
    zl = F.lit(0).cast("long")
    cnt_arr = F.transform(
        seq, lambda i: F.coalesce(F.element_at(F.col("_cm"), i), zl)
    )
    off_cols = [
        *gcols,
        F.transform(
            seq,
            lambda i: F.aggregate(F.slice(cnt_arr, 1, i), zl, lambda a, x: a + x),
        ).alias("_gr_offs"),
    ]
    if cum_value is not None:
        from pyspark.sql.types import DecimalType

        sum_dt = packed.schema["_vm"].dataType.valueType
        vzero = F.lit(0).cast(sum_dt)
        vinit = (
            F.lit(0).cast(DecimalType(38, sum_dt.scale))
            if isinstance(sum_dt, DecimalType)
            else F.lit(0).cast(sum_dt)
        )
        v_arr = F.transform(
            seq, lambda i: F.coalesce(F.element_at(F.col("_vm"), i), vzero)
        )
        off_cols.append(
            F.transform(
                seq,
                lambda i: F.aggregate(
                    F.slice(v_arr, 1, i), vinit, lambda a, x: a + x
                ),
            ).alias("_gr_voffs")
        )
    offs = packed.select(*off_cols)
    idx1 = F.col("_gr_bkt") + F.lit(1)
    order = [metric.asc() if ascending else metric.desc()] + [t.asc() for t in tiebreaks]
    w = Window.partitionBy(*gcols, "_gr_bkt").orderBy(*order)
    out = bucketed.join(F.broadcast(offs), gcols).withColumn(
        rn_col,
        (F.element_at(F.col("_gr_offs"), idx1) + F.row_number().over(w)).cast("long"),
    )
    if cum_value is not None:
        local_cum = F.sum(F.col(cum_value)).over(
            w.rowsBetween(Window.unboundedPreceding, 0)
        )
        out = out.withColumn(
            cum_col, F.element_at(F.col("_gr_voffs"), idx1) + local_cum
        ).drop("_gr_voffs")
    out = out.drop("_gr_bkt", "_gr_offs")
    if keep_cols is not None:
        keep = [*gcols, *keep_cols, "_n_group", rn_col]
        if cum_value is not None:
            keep.append(cum_col)
        out = out.select(*keep)
    return out


def ntile_from_rank(rn, n, buckets: int):
    """Exact SQL ``ntile(buckets)`` tile from a 1-based global rank and
    total count — the ANSI remainder rule (first ``n % buckets`` tiles
    get the extra row), so a distributed ``global_row_number`` plus
    this expression reproduces ``ntile`` bit-for-bit without the
    unpartitioned window ntile needs."""
    rn = F.col(rn) if isinstance(rn, str) else rn
    n = F.col(n) if isinstance(n, str) else n
    # exact integer division via subtract-mod (`/` on longs promotes to
    # double; exact here because (x - x%d) is divisible, but keep the
    # arithmetic integer-shaped so it never depends on FP rounding)
    def idiv(x, d):
        return ((x - (x % d)) / d).cast("long")

    q = idiv(n, F.lit(buckets))
    r = (n % F.lit(buckets)).cast("long")
    big = F.lit(1) + idiv(rn - 1, q + 1)
    small = r + F.lit(1) + idiv(rn - r * (q + 1) - 1, q)
    return F.when(rn <= r * (q + 1), big).otherwise(small).cast("int")
