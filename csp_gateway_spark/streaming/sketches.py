"""Streaming approximate-distinct (HyperLogLog over event-time
windows).

The batch sketch (``operators/sketches.py``) splits into a REGISTER
stage (max-rho per bucket — mergeable: MAX merges with MAX, counts
with SUM) and a FINALIZE stage (registers → estimate).  Streaming
keeps exactly the register stage as its aggregation state:

    stream → withWatermark → groupBy(window, groups, bucket)
           → agg(max rho, count)          # the one stateful operator

and finalizes per sink batch (``foreachBatch`` + ``hll_finalize``) —
Structured Streaming allows the single stateful aggregation; the
finalize rollup is per-batch stateless work over |groups|·m rows.

Scale: state per (window, group) is ≤ m=512 register rows regardless
of stream volume — the whole point of the sketch; an exact
count-distinct would hold every distinct value in the state store.
The watermark bounds how many windows stay open.

Reference parity note: the reference has no sketches (SURVEY §2.3);
this is the streaming face of the additive §7.8 sketch surface.
"""

from __future__ import annotations

from typing import Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from csp_gateway_spark.operators.sketches import (
    hll_bucket_rho,
    hll_finalize,
    hll_hash,
)

__all__ = ["hll_register_stream", "finalize_batch"]


def hll_register_stream(
    stream: DataFrame,
    group_cols: Sequence[str],
    value_col: str,
    ts_col: str = "ts",
    window: str = "1 minute",
    watermark: str = "10 seconds",
) -> DataFrame:
    """Windowed register aggregation (append mode emits each window's
    registers once its watermark passes — i.e. FINAL registers).

    The grouping key keeps the WINDOW STRUCT itself (not flattened
    start/end columns): append-mode finalization requires the
    event-time window as a grouping expression — projecting it to
    plain timestamps first severs the watermark link and Spark rejects
    the query.  The struct is flattened after the aggregation."""
    gcols = list(group_cols)
    hashed = stream.withWatermark(ts_col, watermark).select(
        F.window(F.col(ts_col), window).alias("_w"),
        *gcols,
        hll_hash(value_col).alias("_hll_h"),
    )
    bucket, rho = hll_bucket_rho()
    regs = (
        hashed.select("_w", *gcols, bucket, rho)
        .groupBy("_w", *gcols, "_hll_bucket")
        .agg(F.max("_hll_rho").alias("_r"), F.count(F.lit(1)).alias("_cnt"))
    )
    return regs.select(
        F.col("_w.start").alias("win_start"),
        F.col("_w.end").alias("win_end"),
        *gcols,
        "_hll_bucket",
        "_r",
        "_cnt",
    )


def finalize_batch(registers: DataFrame, group_cols: Sequence[str]) -> DataFrame:
    """Finalize a micro-batch of (finalized-window) registers into
    per-(window, group) estimates — call inside ``foreachBatch``."""
    return hll_finalize(registers, ["win_start", "win_end", *list(group_cols)])


# ---------------------------------------------------------------------------
# Streaming Count-Min (frequency sketch over event-time windows)
# ---------------------------------------------------------------------------


def cms_cell_stream(
    stream: DataFrame,
    value_col: str,
    ts_col: str = "ts",
    window: str = "1 minute",
    watermark: str = "10 seconds",
    depth: int = None,
    width: int = None,
) -> DataFrame:
    """Windowed Count-Min cell aggregation — the streaming face of
    ``operators.sketches.cms_cells`` (cells merge by SUM, so the
    windowed groupBy IS the sketch merge).  State per window is
    ≤ depth·width counter rows regardless of stream volume; append
    mode emits each window's FINAL cells when its watermark passes.

    Probe the emitted cells with ``operators.sketches.cms_estimate``
    per batch (stateless) for windowed heavy-hitter feeds."""
    from csp_gateway_spark.operators.sketches import CMS_DEPTH, CMS_WIDTH, _cms_col

    d = CMS_DEPTH if depth is None else depth
    w = CMS_WIDTH if width is None else width
    pairs = F.array(
        *[
            F.struct(
                F.lit(r).alias("_row"),
                _cms_col(F.col(value_col), r, w).alias("_col"),
            )
            for r in range(d)
        ]
    )
    hashed = stream.withWatermark(ts_col, watermark).select(
        F.window(F.col(ts_col), window).alias("_w"), F.explode(pairs).alias("_p")
    )
    cells = (
        hashed.select("_w", "_p._row", "_p._col")
        .groupBy("_w", "_row", "_col")
        .agg(F.count(F.lit(1)).alias("cnt"))
    )
    return cells.select(
        F.col("_w.start").alias("win_start"),
        F.col("_w.end").alias("win_end"),
        "_row",
        "_col",
        "cnt",
    )


# ---------------------------------------------------------------------------
# Streaming HDR histogram (quantile sketch over event-time windows)
# ---------------------------------------------------------------------------


def hdr_cell_stream(
    stream: DataFrame,
    value_col: str,
    group_cols: Sequence[str] = (),
    ts_col: str = "ts",
    window: str = "1 minute",
    watermark: str = "10 seconds",
    p: int = None,
) -> DataFrame:
    """Windowed HDR histogram cells — the streaming face of
    ``operators.sketches.hdr_cells`` (cells merge by SUM, so the
    windowed groupBy IS the sketch merge).  State per (window, group)
    is ≤ (64−p)·2^p ≈ 4k cells regardless of stream volume; append
    mode emits each window's FINAL cells when its watermark passes.
    Feed the emitted cells to ``hdr_quantiles`` per batch (stateless)
    for windowed latency/length percentile feeds."""
    from csp_gateway_spark.operators.sketches import HDR_P, _hdr_parts

    pp = HDR_P if p is None else p
    gcols = list(group_cols)
    v = F.greatest(F.col(value_col).cast("long"), F.lit(0))
    bucket, lo, hi = _hdr_parts(v, pp)
    windowed = stream.withWatermark(ts_col, watermark).select(
        F.window(F.col(ts_col), window).alias("_w"), *gcols, bucket, lo, hi
    )
    cells = windowed.groupBy("_w", *gcols, "bucket", "lo", "hi").agg(
        F.count(F.lit(1)).alias("cnt")
    )
    return cells.select(
        F.col("_w.start").alias("win_start"),
        F.col("_w.end").alias("win_end"),
        *gcols,
        "bucket",
        "lo",
        "hi",
        "cnt",
    )
