"""Corpus curation operators: decontamination, deterministic sampling,
cross-document line dedup.

Training-data pipeline additions (SURVEY §7.8 additive surface, same
family as operators/dedup.py):

- ``decontaminate``: flag/remove training documents that share any
  k-token shingle with a held-out evaluation set (the standard
  n-gram-overlap decontamination used for LLM training corpora).
  Plan: shingle both sides once, hash shingles to longs, LEFT SEMI
  join corpus shingles against the (much smaller) eval shingle set —
  Spark broadcasts the eval side when it fits, else it is a shuffle
  semi-join on the shingle hash.  No O(corpus × eval) stage.

- ``stratified_sample``: deterministic per-stratum sampling with a
  seeded md5 threshold — reproducible on any engine (no RNG state),
  stable under re-runs and retries, exactly the property a 100 TB
  pipeline needs for resumable sampling.  Keep iff
  ``hash60(id:seed) < rate · 2^60`` per stratum.

- ``dedup_lines``: cross-document line-level dedup (C4-style
  boilerplate removal): every distinct normalized line is kept only at
  its first occurrence — (min doc_id, min line_idx) wins — and
  documents are reassembled in original line order.  Two shuffles
  (line groupBy + doc reassembly), both map-side combined.
"""

from __future__ import annotations

from typing import Dict, Optional

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from csp_gateway_spark.operators.dedup import _md5_base15, shingle_rows

HASH60_SPACE = float(1 << 60)


def decontaminate(
    corpus: DataFrame,
    eval_set: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    k: int = 5,
    mode: str = "flag",
) -> DataFrame:
    """Mark (``mode="flag"``) or drop (``mode="remove"``) corpus docs
    sharing any k-token shingle with ``eval_set``.

    Shingles hash to 60-bit longs before the join so the exchanged
    keys are fixed-width (no long strings through the shuffle).
    """
    if mode not in ("flag", "remove"):
        raise ValueError("mode must be 'flag' or 'remove'")
    c_sh = shingle_rows(corpus, text_col, id_col, k).select(
        F.col(id_col), _md5_base15(F.col("_s")).alias("_h")
    )
    e_sh = (
        shingle_rows(eval_set, text_col, id_col, k)
        .select(_md5_base15(F.col("_s")).alias("_h"))
        .distinct()
    )
    contaminated = c_sh.join(e_sh, "_h", "left_semi").select(id_col).distinct()
    flagged = corpus.join(
        contaminated.withColumn("_contaminated", F.lit(True)), id_col, "left"
    ).withColumn("contaminated", F.coalesce(F.col("_contaminated"), F.lit(False))).drop(
        "_contaminated"
    )
    if mode == "remove":
        return flagged.filter(~F.col("contaminated")).drop("contaminated")
    return flagged


def sample_hash(id_col: Column, seed: int = 17) -> Column:
    """Deterministic 60-bit sample hash of an id (engine-portable:
    DuckDB ``('0x'||substr(md5(id||':'||seed),1,15))::BIGINT``)."""
    return _md5_base15(F.concat(id_col.cast("string"), F.lit(f":{seed}")))


def stratified_sample(
    df: DataFrame,
    fractions: Dict[str, float],
    strata_col: str,
    id_col: str = "doc_id",
    seed: int = 17,
    default_fraction: float = 0.0,
) -> DataFrame:
    """Keep each row iff its seeded hash falls under its stratum's
    fraction — deterministic, single scan, no shuffle, no RNG state.
    Strata absent from ``fractions`` use ``default_fraction``."""
    for name, frac in fractions.items():
        if not 0.0 <= frac <= 1.0:
            raise ValueError(f"fraction for {name!r} must be in [0, 1], got {frac}")
    h = sample_hash(F.col(id_col), seed)
    threshold: Column = F.lit(default_fraction)
    for name, frac in sorted(fractions.items()):
        threshold = F.when(F.col(strata_col) == name, F.lit(frac)).otherwise(threshold)
    # floor + long compare: double→long CASTS round differently across
    # engines (Spark truncates, DuckDB rounds) — floor agrees everywhere
    return df.filter(h < F.floor(threshold * F.lit(HASH60_SPACE)).cast("long"))


def line_rows(df: DataFrame, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """(id, line_idx, line) — split on newlines, drop blank lines."""
    lines = F.split(F.col(text_col), "\n")
    return (
        df.select(F.col(id_col), F.posexplode(lines).alias("line_idx", "line"))
        .withColumn("line", F.trim(F.col("line")))
        .filter(F.col("line") != "")
    )


def dedup_lines(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    min_line_chars: int = 0,
) -> DataFrame:
    """Cross-document line dedup: a line survives only at its first
    occurrence ((min doc_id, min line_idx) wins, short lines under
    ``min_line_chars`` always survive); docs come back reassembled in
    original line order as ``(id, text)``."""
    rows = line_rows(df, text_col, id_col)
    keep_always = F.length(F.col("line")) < min_line_chars if min_line_chars else F.lit(False)
    first = rows.groupBy("line").agg(
        F.min(F.struct(F.col(id_col).alias("d"), F.col("line_idx").alias("i"))).alias("_first")
    )
    kept = (
        rows.join(first, "line")
        .filter(
            keep_always
            | ((F.col(id_col) == F.col("_first.d")) & (F.col("line_idx") == F.col("_first.i")))
        )
        .select(id_col, "line_idx", "line")
    )
    return (
        kept.groupBy(id_col)
        .agg(
            F.concat_ws(
                "\n", F.transform(F.array_sort(F.collect_list(F.struct("line_idx", "line"))), lambda s: s["line"])
            ).alias(text_col)
        )
    )
