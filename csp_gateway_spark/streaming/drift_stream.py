"""Streaming distribution-drift monitor — the live face of
``operators/corpus.py::source_drift``.

Batch builds the REFERENCE distribution once (corpus top-V vocabulary
+ OOV bucket); the stream then keeps one bounded windowed aggregation
— token counts per (window, group, vocab-token-or-OOV) — and each
sink batch finalizes KL(window-group ‖ reference) statelessly.  This
is the alerting shape: "source src7's live distribution just diverged
from the corpus it was approved against".

State per (window, group) is ≤ V+1 rows BY DESIGN (the vocab mapping
collapses the tail into the OOV bucket *before* the stateful
aggregation), so stream volume never grows the state store — the same
bounded-state argument as the HLL/CMS/HDR streaming twins in
``streaming/sketches.py``.

Parity: finalized KL equals the batch ``source_drift`` bit-for-bit on
a replayed stream (token-ordered fold both sides) — asserted in
``tests/test_event_time_streaming.py``.
"""

from __future__ import annotations

from typing import Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from csp_gateway_spark.operators.text import norm_tokens, normalize_text, tokens

__all__ = ["OOV_TOKEN", "drift_reference", "drift_token_stream", "finalize_drift"]

OOV_TOKEN = "~~oov~~"


def drift_reference(
    df: DataFrame,
    text_col: str = "text",
    top_v: int = 512,
) -> tuple[list[tuple[str, int]], int]:
    """Offline reference build (one batch job): returns
    ``(cells, n_c)`` where ``cells`` is the top-``top_v`` vocabulary
    with corpus counts plus the OOV bucket row, and ``n_c`` the corpus
    token total.  The collect is bounded at ``top_v + 1`` rows."""
    toks = norm_tokens(F.col(text_col))
    rows = df.select(F.explode(toks).alias("token"))
    cc = rows.groupBy("token").agg(F.count(F.lit(1)).alias("c_corp"))
    vocab = cc.orderBy(F.desc("c_corp"), F.asc("token")).limit(top_v).collect()
    n_c = rows.count()
    cells = [(r["token"], r["c_corp"]) for r in vocab]
    cells.append((OOV_TOKEN, n_c - sum(c for _, c in cells)))
    return cells, n_c


def drift_token_stream(
    stream: DataFrame,
    vocab_tokens: Sequence[str],
    group_col: str = "source",
    text_col: str = "text",
    ts_col: str = "ts",
    window: str = "1 minute",
    watermark: str = "10 seconds",
) -> DataFrame:
    """The ONE stateful operator: windowed (group, token) counts with
    the out-of-vocabulary collapse applied BEFORE aggregation, so
    state is bounded at V+1 rows per (window, group).  Append mode
    emits final counts once the watermark passes."""
    toks = norm_tokens(F.col(text_col))
    exploded = (
        stream.withWatermark(ts_col, watermark)
        .select(
            F.window(F.col(ts_col), window).alias("_w"),
            F.col(group_col),
            F.explode(toks).alias("_tok"),
        )
        .select(
            "_w",
            group_col,
            F.when(F.col("_tok").isin(list(vocab_tokens)), F.col("_tok"))
            .otherwise(F.lit(OOV_TOKEN))
            .alias("token"),
        )
    )
    counts = exploded.groupBy("_w", group_col, "token").agg(
        F.count(F.lit(1)).alias("n")
    )
    return counts.select(
        F.col("_w.start").alias("window_start"),
        F.col("_w.end").alias("window_end"),
        group_col,
        "token",
        "n",
    )


def finalize_drift(
    counts: DataFrame,
    reference_cells: Sequence[tuple[str, int]],
    n_c: int,
    group_col: str = "source",
    k: float = 0.5,
) -> DataFrame:
    """Per-batch stateless finalize: dense-grid the window counts over
    the reference cells (zeros filled), add-k smooth, fold KL terms in
    token order.  Output: (window_start, window_end, group, n_tokens,
    oov_rate, kl)."""
    spark = counts.sparkSession
    ref = spark.createDataFrame(
        [(t, int(c)) for t, c in reference_cells], "token string, c_corp long"
    )
    v = len(reference_cells) - 1  # vocab size (OOV bucket excluded)
    keys = ["window_start", "window_end", group_col]
    totals = counts.groupBy(*keys).agg(F.sum("n").alias("n_s"))
    grid = (
        totals.crossJoin(F.broadcast(ref))
        .join(counts, [*keys, "token"], "left")
        .fillna(0, subset=["n"])
    )
    denom_s = F.col("n_s").cast("double") + F.lit(k) * F.lit(v + 1)
    denom_c = F.lit(float(n_c)) + F.lit(k) * F.lit(v + 1)
    p_s = (F.col("n").cast("double") + F.lit(k)) / denom_s
    p_c = (F.col("c_corp").cast("double") + F.lit(k)) / denom_c
    term = p_s * F.log(p_s / p_c)
    oov_n = F.sum(F.when(F.col("token") == OOV_TOKEN, F.col("n")).otherwise(0))
    folded = (
        grid.select(*keys, F.col("n_s"), F.col("token"), F.col("n"), term.alias("_t"))
        .groupBy(*keys, "n_s")
        .agg(
            F.array_sort(F.collect_list(F.struct("token", "_t"))).alias("_terms"),
            oov_n.alias("_oov"),
        )
    )
    total = F.aggregate(F.col("_terms"), F.lit(0.0), lambda acc, x: acc + x["_t"])
    return folded.select(
        *keys,
        F.col("n_s").alias("n_tokens"),
        (F.col("_oov").cast("double") / F.col("n_s").cast("double")).alias("oov_rate"),
        total.alias("kl"),
    )
