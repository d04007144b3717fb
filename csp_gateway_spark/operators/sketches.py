"""Frequency and distinct-count sketches (HyperLogLog, Count-Min).

Two implementations of approximate COUNT(DISTINCT):

- ``approx_distinct_native`` — Spark's built-in HLL++
  (``approx_count_distinct``).  Fastest path (JVM, mergeable partial
  aggregation), but the estimate depends on Spark's internal hash and
  sketch layout, so no external engine can reproduce it bit-for-bit.

- ``hll_distinct`` — a portable HLL whose registers derive from
  ``md5`` and integer arithmetic only, so ANY engine (DuckDB included)
  computes the *identical* estimate.  This is the oracle-checkable
  form: same hash → same registers → same deterministic estimate.

Reference parity note: the reference has no sketches at all (SURVEY
§2.3 — "no distinct-count sketches"); this is part of the additive
§7.8 analytics surface, and the 100 TB justification is the usual one:
a 512-register sketch replaces a count-distinct shuffle of raw values
with a mergeable 4 KB state per group.

Scale shape: two shuffles, both map-side combined — (group, bucket)
max-rho (cardinality ≤ |groups|·m rows after combine), then a |groups|
row final rollup.  No row-Python anywhere.

Determinism note: every arithmetic step is exact-integer or a single
correctly-rounded IEEE-754 op (division, multiply by a power of two),
EXCEPT the small-range linear-counting branch which uses ``ln`` —
libm implementations agree to well under the 0.5-ulp needed to move a
rounded integer estimate, but it is the one documented wobble point.
"""

from __future__ import annotations

from typing import Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

__all__ = [
    "approx_distinct_native",
    "hll_distinct",
    "hll_registers",
    "hll_finalize",
    "hll_hash",
    "hll_bucket_rho",
    "HLL_P",
    "hll_alpha_scale",
    "cms_cells",
    "cms_estimate",
    "cms_topk",
    "CMS_DEPTH",
    "CMS_WIDTH",
]

HLL_P = 9  # 2^9 = 512 registers, rsd ≈ 1.04/sqrt(512) ≈ 4.6%
_HASH_BITS = 60  # md5 15-hex-digit prefix
_M = 1 << HLL_P
_W = _HASH_BITS - HLL_P  # 51 payload bits
_RMAX = _W + 1  # rho when the payload is all zeros
_LC_CUTOFF = 2.5 * _M


def hll_alpha_scale(m: int = _M, scale_bits: int = _RMAX) -> float:
    """``alpha_m * m^2 * 2^scale_bits`` as one double literal — the
    only constant the estimate needs (bias factor from the HLL paper,
    Flajolet et al. 2007, for m ≥ 128)."""
    alpha = 0.7213 / (1.0 + 1.079 / m)
    return alpha * m * m * float(1 << scale_bits)


def approx_distinct_native(
    df: DataFrame, group_cols: Sequence[str], value_col: str, rsd: float = 0.02
) -> DataFrame:
    """Spark-native HLL++ (engine-specific estimates; JVM fast path)."""
    return df.groupBy(*group_cols).agg(
        F.approx_count_distinct(value_col, rsd=rsd).alias("approx_distinct"),
        F.count(F.lit(1)).alias("n"),
    )


def hll_distinct(
    df: DataFrame, group_cols: Sequence[str], value_col: str
) -> DataFrame:
    """Portable deterministic HLL estimate per group.

    Register construction (identical in any SQL engine):
      h      = int(md5(value)[:15 hex])            — 60-bit uniform hash
      bucket = h mod 512
      w      = h div 512                           — 51 payload bits
      rho    = 52 - bit_length(w)   (w=0 → 52)     — leading-zeros + 1
      r[b]   = max rho per bucket

    Estimate: alpha·m²/Σ2^-r with linear counting below 2.5m.  The
    Σ2^-r term is kept as an exact integer (Σ 2^(52-r), empty buckets
    contributing 2^52), so the only floating-point steps are one
    division and the final round.

    Output: ``group_cols + (approx_distinct, n)``; ``n`` is the exact
    row count (not distinct), carried for calibration.
    """
    gcols = list(group_cols)
    return hll_finalize(hll_registers(df, gcols, value_col), gcols)


def hll_hash(value_col: str):
    """60-bit md5-prefix hash column for a value column."""
    return F.conv(
        F.substring(F.md5(F.col(value_col).cast("string")), 1, 15), 16, 10
    ).cast("long")


def hll_bucket_rho() -> tuple:
    """(bucket, rho) expressions over a materialized ``_hll_h`` column.
    All-integer bucket/payload split: `div` stays in longs (h is up to
    2^60, past double's 2^53 exact range, so no `/` anywhere)."""
    w = F.expr(f"_hll_h div {_M}")
    rho = F.when(w == F.lit(0), F.lit(_RMAX)).otherwise(
        F.lit(_RMAX) - F.length(F.bin(w))
    )
    return (
        F.pmod(F.col("_hll_h"), F.lit(_M)).alias("_hll_bucket"),
        rho.alias("_hll_rho"),
    )


def hll_registers(df: DataFrame, group_cols: Sequence[str], value_col: str) -> DataFrame:
    """Register stage: ``group_cols + (_hll_bucket, _r, _cnt)`` — the
    mergeable sketch state (max-rho per bucket merges as MAX, counts as
    SUM).  This is the stage a STREAMING query keeps as its aggregation
    state; ``hll_finalize`` turns any register snapshot into estimates.
    """
    gcols = list(group_cols)
    hashed = df.select(*gcols, hll_hash(value_col).alias("_hll_h"))
    bucket, rho = hll_bucket_rho()
    return (
        hashed.select(*gcols, bucket, rho)
        .groupBy(*gcols, "_hll_bucket")
        .agg(F.max("_hll_rho").alias("_r"), F.count(F.lit(1)).alias("_cnt"))
    )


def hll_finalize(registers: DataFrame, group_cols: Sequence[str]) -> DataFrame:
    """Registers → per-group estimate (the exact-integer HLL estimate
    arithmetic; see ``hll_distinct``)."""
    gcols = list(group_cols)
    g = registers.groupBy(*gcols).agg(
        F.sum(F.expr(f"shiftleft(cast(1 as bigint), {_RMAX} - _r)")).alias("_s_present"),
        F.count(F.lit(1)).alias("_npresent"),
        F.sum("_cnt").alias("n"),
    )
    s_total = (
        F.col("_s_present")
        + (F.lit(_M) - F.col("_npresent")) * F.lit(1 << _RMAX).cast("long")
    ).cast("double")
    v = (F.lit(_M) - F.col("_npresent")).cast("double")
    e_raw = F.lit(hll_alpha_scale()) / s_total
    estimate = F.when(
        (v > 0) & (e_raw <= F.lit(_LC_CUTOFF)),
        F.round(F.lit(float(_M)) * F.log(F.lit(float(_M)) / v)),
    ).otherwise(F.round(e_raw))
    return g.select(
        *gcols, estimate.cast("long").alias("approx_distinct"), F.col("n")
    )


def hll_distinct_oracle_sql(
    table: str, group_col: str, value_col: str
) -> str:
    """DuckDB SQL computing the bit-identical estimate (the oracle
    counterpart of ``hll_distinct`` — same hash, same registers, same
    arithmetic)."""
    m, rmax, cutoff = _M, _RMAX, _LC_CUTOFF
    c = repr(hll_alpha_scale())
    return f"""
WITH h AS (
  SELECT {group_col},
         ('0x' || substr(md5(CAST({value_col} AS VARCHAR)), 1, 15))::BIGINT AS hv
  FROM {table}
), b AS (
  SELECT {group_col}, hv % {m} AS bucket,
         MAX(CASE WHEN hv // {m} = 0 THEN {rmax}
                  ELSE {rmax} - length(bin(hv // {m})) END) AS r,
         COUNT(*) AS cnt
  FROM h GROUP BY 1, 2
), g AS (
  SELECT {group_col},
         SUM(1::BIGINT << ({rmax} - r)) AS s_present,
         COUNT(*) AS npresent,
         SUM(cnt) AS n
  FROM b GROUP BY 1
)
SELECT {group_col},
  CAST(CASE WHEN ({m} - npresent) > 0
         AND {c} / CAST(s_present + ({m} - npresent) * (1::BIGINT << {rmax}) AS DOUBLE) <= {cutoff}
       THEN round({float(m)!r} * ln({float(m)!r} / CAST({m} - npresent AS DOUBLE)))
       ELSE round({c} / CAST(s_present + ({m} - npresent) * (1::BIGINT << {rmax}) AS DOUBLE))
       END AS BIGINT) AS approx_distinct,
  CAST(n AS BIGINT) AS n
FROM g ORDER BY {group_col}
"""


# ---------------------------------------------------------------------------
# Count-Min sketch (Cormode & Muthukrishnan 2005) — portable form
# ---------------------------------------------------------------------------

CMS_DEPTH = 4  # hash rows; err prob ~ e^-depth
CMS_WIDTH = 1024  # counters per row; overestimate ~ 2n/width


def _cms_col(value, row: int, width: int):
    """Column index for one CMS hash row: 60-bit md5 of
    ``value || ':cms' || row`` mod width.  Engine-portable (DuckDB:
    ``('0x'||substr(md5(v||':cms'||r),1,15))::BIGINT % width``)."""
    h = F.conv(
        F.substring(F.md5(F.concat(value.cast("string"), F.lit(f":cms{row}"))), 1, 15),
        16,
        10,
    ).cast("long")
    return F.pmod(h, F.lit(width))


def cms_cells(
    df: DataFrame, value_col: str, depth: int = CMS_DEPTH, width: int = CMS_WIDTH
) -> DataFrame:
    """Build the sketch: ``(_row, _col, cnt)`` cell counts.

    The sketch state is ``depth × width`` counters regardless of input
    size — at 100 TB the full-corpus token-frequency sketch is a few
    KB.  Cells merge by SUM, so the same frame is the streaming
    aggregation state and partial sketches from different shards
    union+re-aggregate losslessly.

    Plan: one projection exploding each input row into ``depth``
    (row, col) pairs, then one map-side-combined groupBy — post-combine
    traffic is bounded by depth·width per task, not by the data.
    """
    pairs = F.array(
        *[
            F.struct(F.lit(r).alias("_row"), _cms_col(F.col(value_col), r, width).alias("_col"))
            for r in range(depth)
        ]
    )
    return (
        df.select(F.explode(pairs).alias("_p"))
        .select("_p._row", "_p._col")
        .groupBy("_row", "_col")
        .agg(F.count(F.lit(1)).alias("cnt"))
    )


def cms_estimate(
    cells: DataFrame,
    queries: DataFrame,
    value_col: str,
    depth: int = CMS_DEPTH,
    width: int = CMS_WIDTH,
) -> DataFrame:
    """Point-estimate counts for each row of ``queries``: the minimum
    over hash rows of the addressed cell — never an underestimate,
    overestimate bounded by collisions (~2·n/width w.p. 1-e^-depth).

    The cell table (≤ depth·width rows) broadcasts; the probe is a
    broadcast join + one groupBy(value) MIN — no shuffle of the sketch.
    """
    probes = queries.select(
        F.col(value_col),
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(r).alias("_row"),
                        _cms_col(F.col(value_col), r, width).alias("_col"),
                    )
                    for r in range(depth)
                ]
            )
        ).alias("_p"),
    ).select(value_col, "_p._row", "_p._col")
    joined = probes.join(F.broadcast(cells), ["_row", "_col"], "left")
    return (
        joined.groupBy(value_col)
        .agg(F.min(F.coalesce(F.col("cnt"), F.lit(0))).alias("cms_count"))
    )


def cms_topk(
    df: DataFrame,
    value_col: str,
    k: int = 25,
    depth: int = CMS_DEPTH,
    width: int = CMS_WIDTH,
) -> DataFrame:
    """Heavy hitters by CMS estimate: sketch the corpus, probe every
    distinct observed value, keep the top-k by (estimate desc, value
    asc).  ``orderBy().limit()`` compiles to TakeOrderedAndProject —
    per-partition partial top-k, no global sort.

    At scale the candidate set is the pre-aggregated distinct values
    (one map-side-combined shuffle); the sketch itself stays KB-sized.
    """
    cells = cms_cells(df, value_col, depth, width)
    candidates = df.select(value_col).distinct()
    est = cms_estimate(cells, candidates, value_col, depth, width)
    return est.orderBy(F.desc("cms_count"), F.asc(value_col)).limit(k)


def cms_oracle_sql(
    rows_cte: str,
    value_col: str,
    k: int = 25,
    depth: int = CMS_DEPTH,
    width: int = CMS_WIDTH,
) -> str:
    """DuckDB SQL computing the bit-identical ``cms_topk`` result over
    a CTE body ``rows_cte`` that yields one row per occurrence with
    column ``value_col``."""
    return f"""
WITH rows_in AS ({rows_cte}),
cells AS (
  SELECT r._r AS _row,
         ('0x' || substr(md5(CAST({value_col} AS VARCHAR) || ':cms' || r._r), 1, 15))::BIGINT % {width} AS _col,
         COUNT(*) AS cnt
  FROM rows_in, (SELECT unnest(range({depth})) AS _r) r
  GROUP BY 1, 2
),
cand AS (SELECT DISTINCT {value_col} FROM rows_in),
probe AS (
  SELECT c.{value_col}, r._r AS _row,
         ('0x' || substr(md5(CAST(c.{value_col} AS VARCHAR) || ':cms' || r._r), 1, 15))::BIGINT % {width} AS _col
  FROM cand c, (SELECT unnest(range({depth})) AS _r) r
)
SELECT p.{value_col},
       CAST(MIN(COALESCE(cells.cnt, 0)) AS BIGINT) AS cms_count
FROM probe p LEFT JOIN cells USING (_row, _col)
GROUP BY 1
ORDER BY cms_count DESC, {value_col} ASC
LIMIT {k}
"""


# ---------------------------------------------------------------------------
# HDR-style histogram quantile sketch — mergeable approximate
# percentiles over non-negative integers (HdrHistogram design: Gil
# Tene; same family as DDSketch, Masson et al. 2019, but with pure
# integer bucket math so every engine reproduces it bit-for-bit).
# ---------------------------------------------------------------------------

HDR_P = 6  # sub-bucket precision bits → relative error ≤ 2^-6 ≈ 1.6 %


def _hdr_parts(v, p: int):
    """(bucket, lo, hi) for value column ``v`` (long, ≥ 0, < 2^52).

    e = digits of bin(v) (= floor(log2 v)+1; bin(0)='0' → e=1 on both
    engines), scale s = max(e-p, 0), sub = floor(v / 2^s).  The double
    division is EXACT for v < 2^52 (binary scaling by a power of two),
    so the sketch is deterministic and engine-portable with no md5 in
    the hot path.  bucket = e·2^p + sub is unique and monotone in v.
    """
    e = F.length(F.bin(v))
    s = F.greatest(e - F.lit(p), F.lit(0)).cast("double")
    pw = F.pow(F.lit(2.0), s)
    sub = F.floor(v.cast("double") / pw)
    lo = (sub * pw).cast("long")
    hi = (lo + pw.cast("long")) - F.lit(1)
    bucket = (e.cast("long") * F.lit(1 << p) + sub.cast("long")).alias("bucket")
    return bucket, lo.alias("lo"), hi.alias("hi")


def hdr_cells(
    df: DataFrame,
    value_col: str,
    group_cols: Sequence[str] = (),
    p: int = HDR_P,
) -> DataFrame:
    """(groups…, bucket, lo, hi, cnt): the sketch state — one
    map-side-combined groupBy; ≤ (64−p)·2^p ≈ 4k cells per group
    regardless of row count.  Cells merge by SUM(cnt) (``hdr_merge``),
    which is what makes the sketch distributable and streamable.
    Values clamp below at 0; exact for v < 2^52."""
    gcols = [F.col(c) for c in group_cols]
    v = F.greatest(F.col(value_col).cast("long"), F.lit(0))
    bucket, lo, hi = _hdr_parts(v, p)
    return (
        df.select(*gcols, bucket, lo, hi)
        .groupBy(*[c for c in group_cols], "bucket", "lo", "hi")
        .agg(F.count(F.lit(1)).alias("cnt"))
    )


def hdr_merge(cells: DataFrame, group_cols: Sequence[str] = ()) -> DataFrame:
    """Merge sketch tables (e.g. per-shard or per-window cells) by
    summing counts — the mergeability property under test."""
    return cells.groupBy(*[c for c in group_cols], "bucket", "lo", "hi").agg(
        F.sum("cnt").alias("cnt")
    )


def hdr_quantiles(
    cells: DataFrame,
    qs: Sequence[float] = (0.5, 0.9, 0.99),
    group_cols: Sequence[str] = (),
) -> DataFrame:
    """Nearest-rank quantile estimates from a cell table: per group,
    the INTEGER midpoint of the first bucket whose cumulative count
    reaches ceil(q·n).  The cumulative window runs over the cell
    table — bounded at ≤ 4k rows per group by construction, so the
    per-group sort is never a data-scale sort.  All arithmetic is
    integer except q·n (IEEE double, identical on any engine).
    Returns (groups…, q, est, n)."""
    from pyspark.sql.window import Window

    gcols = list(group_cols)
    spark = cells.sparkSession
    qdf = spark.createDataFrame([(float(q),) for q in qs], "q double")
    w = (
        Window.partitionBy(*gcols)
        .orderBy("bucket")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    wn = Window.partitionBy(*gcols)
    cum = cells.select(
        *gcols,
        "bucket",
        # floor, not cast: double→long CASTS truncate on Spark but
        # round on DuckDB — floor agrees everywhere (house rule)
        F.floor((F.col("lo") + F.col("hi")) / F.lit(2)).cast("long").alias("_mid"),
        F.sum("cnt").over(w).alias("_cum"),
        F.sum("cnt").over(wn).alias("n"),
    )
    hit = cum.crossJoin(F.broadcast(qdf)).filter(
        F.col("_cum") >= F.ceil(F.col("q") * F.col("n").cast("double"))
    )
    return hit.groupBy(*gcols, "q").agg(
        F.min_by("_mid", "bucket").alias("est"), F.first("n").alias("n")
    )


def hdr_oracle_sql(
    source_cte: str,
    qs: Sequence[float] = (0.5, 0.9, 0.99),
    group_col: str = "source",
    p: int = HDR_P,
) -> str:
    """DuckDB mirror of hdr_cells→hdr_quantiles over ``source_cte``
    (must yield (group_col, v)).  q literals are CAST to DOUBLE —
    DuckDB parses bare decimals as DECIMAL and ceil(0.99·n) would
    round differently from the IEEE product Spark computes."""
    qvals = ", ".join(f"(CAST({q} AS DOUBLE))" for q in qs)
    return f"""
WITH src AS ({source_cte}),
parts AS (
  SELECT {group_col}, length(bin(v)) AS e, CAST(v AS DOUBLE) AS vd FROM src
), b AS (
  SELECT {group_col},
         power(2.0, greatest(e - {p}, 0)) AS pw,
         e, floor(vd / power(2.0, greatest(e - {p}, 0))) AS sub
  FROM parts
), cells AS (
  SELECT {group_col},
         CAST(e AS BIGINT) * {1 << p} + CAST(sub AS BIGINT) AS bucket,
         CAST(sub * pw AS BIGINT) AS lo,
         CAST(sub * pw AS BIGINT) + CAST(pw AS BIGINT) - 1 AS hi,
         CAST(COUNT(*) AS BIGINT) AS cnt
  FROM b GROUP BY 1, 2, 3, 4
), cum AS (
  SELECT {group_col}, bucket, CAST(floor((lo + hi) / 2) AS BIGINT) AS mid,
         SUM(cnt) OVER (PARTITION BY {group_col} ORDER BY bucket
                        ROWS UNBOUNDED PRECEDING) AS cum,
         SUM(cnt) OVER (PARTITION BY {group_col}) AS n
  FROM cells
), qs(q) AS (VALUES {qvals}),
hit AS (
  SELECT {group_col}, q, bucket, mid, n FROM cum, qs
  WHERE cum >= ceil(q * CAST(n AS DOUBLE))
)
SELECT {group_col}, q, CAST(min_by(mid, bucket) AS BIGINT) AS est,
       CAST(first(n ORDER BY bucket) AS BIGINT) AS n
FROM hit GROUP BY 1, 2
"""
