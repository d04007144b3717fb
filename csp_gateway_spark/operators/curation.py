"""Corpus curation operators: decontamination, deterministic sampling,
cross-document line dedup, train/val/test splitting, sequence packing,
repetition-based quality stats.

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

- ``train_split``: deterministic hash assignment of every row into
  named splits (train/val/test) by cumulative weight over the 60-bit
  hash space.  No RNG, no shuffle, stable under retries and across
  engines — a document keeps its split forever, which is what keeps
  eval sets uncontaminated as the corpus grows.

- ``pack_sequences``: assign documents to fixed token-budget bins
  (training-sequence packing).  Docs shard by id hash; within a shard
  a running token total (window cumsum ordered by id) floors into a
  bin index.  One window sort per shard — shards bound the sort size,
  so at 100 TB this is thousands of independent partition sorts, never
  a global order-by.

- ``repetition_stats``: Gopher-style intra-document repetition
  signals — duplicate-line fraction and most-frequent-word-bigram
  fraction — computed natively (explode + two map-side-combined
  group-bys), feeding ``repetition_filter``.

- ``weighted_sample``: per-row weighted inclusion for source mixing
  (weight as a data column instead of per-stratum config) — the same
  deterministic hash-threshold family as ``stratified_sample``.
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
    c_sh: "Optional[DataFrame]" = None,
    e_sh: "Optional[DataFrame]" = None,
) -> DataFrame:
    """Mark (``mode="flag"``) or drop (``mode="remove"``) corpus docs
    sharing any k-token shingle with ``eval_set``.

    Shingles hash to 60-bit longs before the join so the exchanged
    keys are fixed-width (no long strings through the shuffle).

    ``c_sh`` / ``e_sh`` optionally inject prebuilt (id, ``_h``)
    shingle-hash tables for the corpus / eval side (same k/text_col/
    id_col — distinct-ness per (id, hash) is immaterial: the corpus
    side feeds a semi-join + per-id distinct, the eval side is
    re-distincted on the hash; r14, shared with
    :func:`contamination_report` / :func:`bloom_decontaminate`)."""
    if mode not in ("flag", "remove"):
        raise ValueError("mode must be 'flag' or 'remove'")
    if c_sh is None:
        c_sh = shingle_rows(corpus, text_col, id_col, k).select(
            F.col(id_col), _md5_base15(F.col("_s")).alias("_h")
        )
    e_sh = (
        (
            shingle_rows(eval_set, text_col, id_col, k)
            .select(_md5_base15(F.col("_s")).alias("_h"))
            if e_sh is None
            else e_sh.select("_h")
        )
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


def train_split(
    df: DataFrame,
    weights: Optional[Dict[str, float]] = None,
    id_col: str = "doc_id",
    seed: int = 23,
    split_col: str = "split",
) -> DataFrame:
    """Deterministic named-split assignment (train/val/test).

    Buckets the seeded 60-bit id hash by cumulative weight: a row lands
    in split s iff hash < floor(cum_weight(s) · 2^60) and no earlier
    split claimed it.  Pure projection — no shuffle, no RNG state — and
    the same id always lands in the same split, on any engine
    (DuckDB mirror: the same CASE over ('0x'||substr(md5(...),1,15))).
    """
    weights = weights or {"train": 0.98, "val": 0.01, "test": 0.01}
    total = sum(weights.values())
    if abs(total - 1.0) > 1e-9:
        raise ValueError(f"split weights must sum to 1, got {total}")
    h = sample_hash(F.col(id_col), seed)
    names = sorted(weights)  # deterministic order: alphabetical
    cum = 0.0
    expr = None
    for name in names[:-1]:
        cum += weights[name]
        threshold = F.floor(F.lit(cum) * F.lit(HASH60_SPACE)).cast("long")
        cond = h < threshold
        expr = F.when(cond, F.lit(name)) if expr is None else expr.when(cond, F.lit(name))
    last = F.lit(names[-1])
    expr = last if expr is None else expr.otherwise(last)
    return df.withColumn(split_col, expr)


def pack_sequences(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    budget_tokens: int = 2048,
    shards: int = 64,
    seed: int = 29,
) -> DataFrame:
    """Assign each document to a (shard, bin) training sequence slot.

    tokens = whitespace token count; shard = id-hash mod ``shards``;
    within a shard, documents are laid end-to-end in id order and a
    document's bin is ``floor(start_offset / budget_tokens)`` — the
    standard streaming-concat packing (a doc may straddle a boundary;
    the trainer's loader splits it, as with GPT-style token streams).

    Scale shape: one hash-partitioned window sort PER SHARD (never a
    global sort).  Choose ``shards`` ≈ cluster cores × small k so each
    sort fits in memory; the assignment is deterministic for any shard
    count.  Output: (id, shard, n_tokens, bin).
    """
    toks = F.filter(F.split(F.col(text_col), r"\s+"), lambda x: x != "")
    n_tokens = F.size(toks).cast("long")
    sharded = df.select(
        F.col(id_col),
        n_tokens.alias("n_tokens"),
        F.pmod(sample_hash(F.col(id_col), seed), F.lit(shards)).alias("shard"),
    )
    from pyspark.sql.window import Window

    w = Window.partitionBy("shard").orderBy(id_col)
    start = (F.sum("n_tokens").over(w) - F.col("n_tokens")).alias("_start")
    return (
        sharded.select(id_col, "shard", "n_tokens", start)
        .withColumn("bin", F.floor(F.col("_start") / F.lit(budget_tokens)).cast("long"))
        .drop("_start")
    )


def pack_stats(packed: DataFrame) -> DataFrame:
    """Per-(shard, bin) packing summary: docs and total tokens — the
    sanity view a pipeline monitors (bins should sit near the budget
    except each shard's tail bin)."""
    return packed.groupBy("shard", "bin").agg(
        F.count(F.lit(1)).alias("docs"),
        F.sum("n_tokens").alias("tokens"),
    )


def repetition_stats(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Gopher-style repetition signals per document:

    - ``dup_line_frac``: 1 − distinct/total over non-blank trimmed
      lines (0 when the doc has no lines);
    - ``top_bigram_frac``: occurrences of the most frequent word
      bigram / total bigrams (0 when fewer than 2 tokens).

    Both native: line explode + per-doc count-distinct, bigram explode
    + two group-bys (doc×gram, then doc), all map-side combined.
    """
    lines = line_rows(df, text_col, id_col)
    line_frac = lines.groupBy(id_col).agg(
        (
            F.lit(1.0)
            - F.countDistinct("line").cast("double") / F.count(F.lit(1)).cast("double")
        ).alias("dup_line_frac")
    )
    # materialize the token array once per row, THEN build bigrams with
    # zip_with over two slices — referencing the raw split expression
    # inside a transform lambda would re-evaluate the whole split per
    # element (O(tokens²) work, measured 100× slower)
    toks = F.filter(F.split(F.lower(F.col(text_col)), r"\s+"), lambda x: x != "")
    tok_df = df.select(F.col(id_col), toks.alias("_toks"))
    n = F.size(F.col("_toks"))
    grams = F.zip_with(
        F.slice(F.col("_toks"), 1, F.greatest(n - 1, F.lit(0))),
        F.slice(F.col("_toks"), 2, F.greatest(n - 1, F.lit(0))),
        lambda a, b: F.concat_ws(" ", a, b),
    )
    gram_rows = tok_df.select(F.col(id_col), F.explode(grams).alias("_g"))
    per_gram = gram_rows.groupBy(id_col, "_g").agg(F.count(F.lit(1)).alias("_c"))
    gram_frac = per_gram.groupBy(id_col).agg(
        (F.max("_c").cast("double") / F.sum("_c").cast("double")).alias("top_bigram_frac")
    )
    base = df.select(id_col)
    return (
        base.join(line_frac, id_col, "left")
        .join(gram_frac, id_col, "left")
        .select(
            id_col,
            F.coalesce("dup_line_frac", F.lit(0.0)).alias("dup_line_frac"),
            F.coalesce("top_bigram_frac", F.lit(0.0)).alias("top_bigram_frac"),
        )
    )


def repetition_filter(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    max_dup_line_frac: float = 0.3,
    max_top_bigram_frac: float = 0.2,
) -> DataFrame:
    """Drop documents whose repetition signals exceed the (Gopher-rule
    shaped) thresholds; the stats join is id-keyed, one shuffle."""
    stats = repetition_stats(df, text_col, id_col)
    keep = stats.filter(
        (F.col("dup_line_frac") <= max_dup_line_frac)
        & (F.col("top_bigram_frac") <= max_top_bigram_frac)
    ).select(id_col)
    return df.join(keep, id_col, "left_semi")


def weighted_sample(
    df: DataFrame,
    weight_col: str,
    base_fraction: float = 1.0,
    id_col: str = "doc_id",
    seed: int = 31,
    max_weight: float = 1.0,
) -> DataFrame:
    """Per-row weighted inclusion (source-mixing): keep each row iff
    ``hash60(id:seed) < floor(base_fraction · weight · 2^60)``.

    The standard way to hit target mixture ratios in a training corpus
    (e.g. weight wiki 1.0, CommonCrawl 0.3) — a per-row generalization
    of ``stratified_sample`` where the weight is data (a column joined
    from a source-quality table) instead of config.  Deterministic and
    resumable like the other hash samplers: no RNG, no shuffle, same
    id → same decision on any engine.  ``base_fraction·weight`` must
    stay ≤ 1 (``max_weight`` guards the product).
    """
    if not 0.0 <= base_fraction <= 1.0:
        raise ValueError(f"base_fraction must be in [0, 1], got {base_fraction}")
    h = sample_hash(F.col(id_col), seed)
    w = F.least(F.col(weight_col).cast("double"), F.lit(float(max_weight)))
    threshold = F.floor(F.lit(base_fraction) * w * F.lit(HASH60_SPACE)).cast("long")
    return df.filter(h < threshold)


def mix_fractions(
    df: DataFrame,
    source_col: str = "lang",
    alpha: float = 0.5,
    budget: Optional[int] = None,
) -> DataFrame:
    """Temperature-scaled per-source sampling fractions —
    ``(source, n, frac)`` with ``frac = min(1, p_i·B/n_i)`` where
    ``p_i ∝ n_i^alpha`` (multilingual-pretraining mixture smoothing:
    alpha=1 keeps natural proportions, alpha→0 approaches uniform;
    e.g. the α=0.3 exponent of the multilingual LM literature).
    ``budget`` is the target total row count (default: corpus size —
    pure redistribution toward the tail sources, head capped at 1).

    One |sources|-row aggregate plus a 1-row total cross-joined — the
    whole fraction table is metadata-sized and broadcast downstream.
    """
    counts = df.groupBy(source_col).agg(F.count(F.lit(1)).alias("n"))
    tot = counts.agg(
        F.sum(F.pow(F.col("n").cast("double"), F.lit(float(alpha)))).alias("_z"),
        F.sum("n").alias("_N"),
    )
    b = F.lit(float(budget)) if budget is not None else F.col("_N").cast("double")
    frac = F.least(
        F.lit(1.0),
        F.pow(F.col("n").cast("double"), F.lit(float(alpha))) / F.col("_z") * b / F.col("n"),
    )
    return counts.crossJoin(F.broadcast(tot)).select(source_col, "n", frac.alias("frac"))


def temperature_mix(
    df: DataFrame,
    source_col: str = "lang",
    alpha: float = 0.5,
    budget: Optional[int] = None,
    id_col: str = "doc_id",
    seed: int = 23,
    fractions: Optional[DataFrame] = None,
) -> DataFrame:
    """Sample the corpus to a temperature-smoothed source mixture:
    join the (broadcast) ``mix_fractions`` table and keep each row iff
    ``hash60(id:seed) < frac·2^60`` — the same deterministic
    hash-threshold family as ``stratified_sample``/``weighted_sample``
    (no RNG state, resumable, engine-portable).  Pass a precomputed
    ``fractions`` frame to pin or round the fractions (the oracle
    query rounds to 12 decimals so a last-ulp ``pow`` difference can
    never flip a keep decision across engines)."""
    fr = fractions if fractions is not None else mix_fractions(df, source_col, alpha, budget)
    h = sample_hash(F.col(id_col), seed)
    out = df.join(F.broadcast(fr.select(source_col, "frac")), source_col)
    # integer threshold (floor→long) like weighted_sample: the compare
    # never promotes the 60-bit hash to double, so there is no
    # precision edge for an engine to disagree on
    threshold = F.floor(F.col("frac") * F.lit(HASH60_SPACE)).cast("long")
    return out.filter(h < threshold).drop("frac")


# ---------------------------------------------------------------------------
# Bloom-filter decontamination — the broadcast-membership scale path
# ---------------------------------------------------------------------------


def _bloom_bit(h_col: Column, i: int, m_bits: int) -> Column:
    """Bit position ``i`` for a 60-bit shingle hash: md5 of
    ``<h60>:bf<i>`` mod m.  Engine-portable (DuckDB:
    ``('0x'||substr(md5(CAST(h AS VARCHAR)||':bf<i>'),1,15))::BIGINT % m``)."""
    h = F.conv(
        F.substring(F.md5(F.concat(h_col.cast("string"), F.lit(f":bf{i}"))), 1, 15),
        16,
        10,
    ).cast("long")
    return F.pmod(h, F.lit(m_bits))


def bloom_bits(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    k_shingle: int = 5,
    m_bits: int = 1 << 16,
    k_hashes: int = 4,
    sh: "Optional[DataFrame]" = None,
) -> DataFrame:
    """The Bloom filter of an eval set's shingles, as a DataFrame of
    distinct set-bit positions (``bit``) — ≤ min(m, k·|shingles|) rows,
    broadcastable at any corpus scale.  ``sh`` optionally injects a
    prebuilt (id, ``_h``) shingle-hash table (r14)."""
    sh = (
        shingle_rows(df, text_col, id_col, k_shingle).select(
            _md5_base15(F.col("_s")).alias("_h")
        )
        if sh is None
        else sh.select("_h")
    )
    return (
        sh.select(
            F.explode(
                F.array(*[_bloom_bit(F.col("_h"), i, m_bits) for i in range(k_hashes)])
            ).alias("bit")
        )
        .distinct()
    )


def bloom_decontaminate(
    corpus: DataFrame,
    eval_set: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    k: int = 5,
    m_bits: int = 1 << 16,
    k_hashes: int = 4,
    mode: str = "flag",
    c_sh: "Optional[DataFrame]" = None,
    e_sh: "Optional[DataFrame]" = None,
) -> DataFrame:
    """``decontaminate`` via a Bloom filter instead of a semi-join:
    a corpus shingle "hits" iff all ``k_hashes`` of its bit positions
    are set in the eval set's filter.

    Why this exists next to the exact semi-join: at 100 TB the
    semi-join shuffles every corpus shingle hash; here the filter is a
    LITERAL BITMAP — the ≤ m set bits (m=2^16 → 8 KiB) collected once
    from the eval side and inlined as an array<long> constant — so the
    corpus-side plan is scan → projection → FILTER: each shingle tests
    its ``k_hashes`` bit positions with codegen'd shift/mask
    expressions, no join, no probe explode, no count-of-set-bits
    aggregate, and (r14) no per-doc shingle distinct either — a
    repeated shingle just re-passes the same filter and the final
    per-doc ``distinct`` absorbs it.  The filter size is INDEPENDENT
    of the eval-set size.  The price is deterministic false positives
    at rate ≈ fill_ratio^k_hashes, acceptable for decontamination
    (flagging an extra clean doc is safe; missing a contaminated one
    never happens — Bloom filters have no false negatives).

    Every hash is portable md5, so the flags — false positives
    included — reproduce bit-identically in the DuckDB oracle.

    ``c_sh`` / ``e_sh``: see :func:`decontaminate` — prebuilt
    (id, ``_h``) shingle-hash injection (r14).
    """
    if mode not in ("flag", "remove"):
        raise ValueError("mode must be 'flag' or 'remove'")
    # bounded driver collect: ≤ min(m_bits, k·|eval shingles|) ints
    bit_rows = bloom_bits(
        eval_set, text_col, id_col, k, m_bits, k_hashes, sh=e_sh
    ).collect()
    n_words = (m_bits + 63) // 64
    words = [0] * n_words
    for r in bit_rows:
        b = int(r["bit"])
        words[b >> 6] |= 1 << (b & 63)
    _signed = lambda w: w - (1 << 64) if w >= (1 << 63) else w  # noqa: E731
    bitmap = F.array(*[F.lit(_signed(w)) for w in words])
    mask_arr = F.array(*[F.lit(_signed(1 << i)) for i in range(64)])
    pred = None
    for i in range(k_hashes):
        idx = _bloom_bit(F.col("_h"), i, m_bits)
        word = F.element_at(bitmap, F.shiftright(idx, 6).cast("int") + F.lit(1))
        mask = F.element_at(
            mask_arr, idx.bitwiseAND(F.lit(63)).cast("int") + F.lit(1)
        )
        t = word.bitwiseAND(mask) != F.lit(0)
        pred = t if pred is None else (pred & t)
    hits = (
        (
            shingle_rows(corpus, text_col, id_col, k).select(
                F.col(id_col), _md5_base15(F.col("_s")).alias("_h")
            )
            if c_sh is None
            else c_sh
        )
        .filter(pred)
        .select(id_col)
        .distinct()
    )
    flagged = corpus.join(
        hits.withColumn("_contaminated", F.lit(True)), id_col, "left"
    ).withColumn(
        "contaminated", F.coalesce(F.col("_contaminated"), F.lit(False))
    ).drop("_contaminated")
    if mode == "remove":
        return flagged.filter(~F.col("contaminated")).drop("contaminated")
    return flagged


def hashed_ngram_counts(
    df: DataFrame,
    dim: int = 1024,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """(id, bucket, n): hashed unigram+bigram counts — the DSIR
    feature representation (Xie et al. 2023, arXiv:2302.03169 §3.2).

    Unigrams and bigrams share one md5-addressed bucket space of
    ``dim`` cells, so the distribution tables downstream are bounded
    by ``dim`` regardless of vocabulary size.  Plan: two scan-local
    explodes unioned, then ONE map-side-combined groupBy — shuffle
    rows ≤ n_docs · min(dim, doc_len).

    DuckDB mirror of the bucket: ``('0x' || substr(md5(g), 1, 7))
    ::BIGINT % dim`` with ``g`` the token or ``w1 || ' ' || w2``.
    """
    from csp_gateway_spark.operators.corpus import bigram_rows, token_rows
    from csp_gateway_spark.operators.dedup import _md5_base

    uni = token_rows(df, text_col, id_col).select(
        F.col(id_col), (_md5_base(F.col("token")) % F.lit(dim)).alias("bucket")
    )
    big = bigram_rows(df, text_col, id_col).select(
        F.col(id_col),
        (_md5_base(F.concat_ws(" ", "w1", "w2")) % F.lit(dim)).alias("bucket"),
    )
    return (
        uni.unionByName(big)
        .groupBy(F.col(id_col), F.col("bucket"))
        .agg(F.count(F.lit(1)).alias("n"))
    )


def dsir_weights(
    corpus: DataFrame,
    target: DataFrame,
    dim: int = 1024,
    smoothing: float = 0.5,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """DSIR importance weights (Data Selection via Importance
    Resampling, Xie et al. 2023): score every corpus document by how
    much its hashed-n-gram profile looks like ``target`` rather than
    the raw corpus —

        log w(d) = Σ_b n_db · (ln p̂_b − ln q̂_b)

    with p̂ the add-``smoothing`` bucket distribution of the target
    set and q̂ of the raw corpus.  High ``logw`` ⇒ target-like
    (wiki/books-style), low ⇒ raw-web-like.

    Plan shape at 100 TB: corpus features are ONE map-side-combined
    shuffle; both distributions reduce to ≤ ``dim`` rows; the
    log-ratio table broadcasts to a per-bucket join; the per-doc score
    is one groupBy(id).  No driver actions, no global sorts.  The
    target set (an eval/quality sample) is orders smaller than the
    corpus and aggregates the same way.

    Determinism: the per-doc Σ is a bucket-ordered fold over a
    collected array (never a double SUM aggregate), so scores are
    partitioning-invariant and engine-reproducible — DuckDB mirror
    ``list_sum(list(n * lr ORDER BY bucket))``.  Docs with no
    features score 0.
    """
    # the feature frame feeds BOTH the raw distribution and the
    # per-doc scoring join; without a materialization each branch
    # re-runs the tokenize+hash shuffle.  r15 re-measure under honest
    # build accounting: the checkpoint WINS (2.9 → 2.35 s at sf0.1,
    # min-of-3 interleaved — the r14 note claiming the opposite
    # measured against a warm shared-memo that hid the second
    # scan).  Values are provably checkpoint-invariant: every
    # downstream aggregate is an integer sum and the per-doc Σ is a
    # bucket-ordered array fold.  At 100 TB, persist the features
    # once (`feats.write.parquet`) and feed both branches from the
    # stored table instead — same play, durable medium.
    feats = hashed_ngram_counts(corpus, dim, text_col, id_col).localCheckpoint(
        eager=True
    )
    raw = feats.groupBy("bucket").agg(F.sum("n").alias("_rc"))
    tgt = (
        hashed_ngram_counts(target, dim, text_col, id_col)
        .groupBy("bucket")
        .agg(F.sum("n").alias("_tc"))
    )
    # totals as 1-row aggregates cross-joined into the ratio table —
    # a driver-side .count() would be a second action per distribution
    rtot = raw.agg(F.sum("_rc").cast("double").alias("_R"))
    ttot = tgt.agg(F.sum("_tc").cast("double").alias("_T"))
    s = float(smoothing)
    dist = (
        raw.join(tgt, "bucket", "left")
        .crossJoin(F.broadcast(rtot))
        .crossJoin(F.broadcast(ttot))
        .withColumn("_tc", F.coalesce(F.col("_tc"), F.lit(0)))
    )
    lr = dist.select(
        "bucket",
        (
            F.log((F.col("_tc").cast("double") + F.lit(s)) / (F.col("_T") + F.lit(s * dim)))
            - F.log((F.col("_rc").cast("double") + F.lit(s)) / (F.col("_R") + F.lit(s * dim)))
        ).alias("_lr"),
    )
    scored = (
        feats.join(F.broadcast(lr), "bucket")
        .groupBy(id_col)
        .agg(
            F.array_sort(
                F.collect_list(F.struct(F.col("bucket"), (F.col("n") * F.col("_lr")).alias("_v")))
            ).alias("_vs")
        )
        .select(
            F.col(id_col),
            F.aggregate(F.col("_vs"), F.lit(0.0), lambda acc, x: acc + x["_v"]).alias("logw"),
        )
    )
    return corpus.join(scored, id_col, "left").withColumn(
        "logw", F.coalesce(F.col("logw"), F.lit(0.0))
    )


def dsir_sample(
    corpus: DataFrame,
    target: DataFrame,
    n_keep: int,
    dim: int = 1024,
    smoothing: float = 0.5,
    seed: int = 17,
    gumbel: bool = True,
    text_col: str = "text",
    id_col: str = "doc_id",
    weights: "Optional[DataFrame]" = None,
) -> DataFrame:
    """Select ``n_keep`` corpus documents by DSIR importance
    resampling: top-k of ``logw + Gumbel noise`` (the Gumbel-top-k
    trick samples WITHOUT replacement ∝ softmax(logw), which is
    exactly the paper's resampling step).  The noise is seeded-hash
    Gumbel — ``g = −ln(−ln((h+0.5)/2^60))`` — so the sample is
    deterministic, resumable, and engine-reproducible; ``gumbel=False``
    degrades to plain top-k by weight.

    The top-k compiles to TakeOrdered (per-partition partial top-k +
    driver merge of k rows) — never a global sort/window.

    ``weights``: optional precomputed :func:`dsir_weights` frame —
    pass a checkpointed one when the weights are also served on their
    own (a pipeline computes them ONCE and both resamples and reports
    from the same table).
    """
    w = (
        weights
        if weights is not None
        else dsir_weights(corpus, target, dim, smoothing, text_col, id_col)
    )
    score = F.col("logw")
    if gumbel:
        u = (sample_hash(F.col(id_col), seed) + F.lit(0.5)) / F.lit(HASH60_SPACE)
        score = score + (-F.log(-F.log(u)))
    return (
        w.withColumn("score", score)
        .orderBy(F.desc("score"), F.asc(id_col))
        .limit(int(n_keep))
    )


def epoch_upsample(
    df: DataFrame,
    epochs: Dict[str, float],
    source_col: str = "source",
    id_col: str = "doc_id",
    seed: int = 23,
    default_epochs: float = 1.0,
) -> DataFrame:
    """Fractional-epoch upsampling: repeat every row of source ``s``
    ``floor(epochs[s])`` times plus one more copy with probability
    ``frac(epochs[s])`` — how a pretraining mixture realizes "2.4
    epochs of books, 0.7 of web" as a materialized dataset (the
    deterministic half of the mixture story; ``temperature_mix``
    derives the target rates, this op applies them).

    The fractional copy keeps a row iff its seeded 60-bit hash falls
    under ``floor(frac·2^60)`` — deterministic, resumable, engine-
    portable (the ``stratified_sample`` family).  Output adds an
    ``epoch`` index (1..copies) so downstream shuffles can spread the
    replicas.  Plan: broadcast rate lookup (a WHEN chain — no join) +
    ``explode(sequence(...))`` — a pure scan-local projection, no
    shuffle; output size is the only cost, exactly as at 100 TB.
    """
    for name, e in epochs.items():
        if e < 0:
            raise ValueError(f"epochs for {name!r} must be >= 0, got {e}")
    e_col: Column = F.lit(float(default_epochs))
    for name, e in sorted(epochs.items()):
        e_col = F.when(F.col(source_col) == name, F.lit(float(e))).otherwise(e_col)
    h = sample_hash(F.col(id_col), seed)
    frac_thresh = F.floor((e_col - F.floor(e_col)) * F.lit(HASH60_SPACE)).cast("long")
    copies = F.floor(e_col).cast("long") + F.when(h < frac_thresh, 1).otherwise(0)
    return (
        df.withColumn("_copies", copies)
        .filter(F.col("_copies") > 0)
        .withColumn("epoch", F.explode(F.sequence(F.lit(1), F.col("_copies"))))
        .drop("_copies")
    )


def contamination_report(
    corpus: DataFrame,
    eval_set: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    k: int = 5,
    c_sh: "Optional[DataFrame]" = None,
    e_sh: "Optional[DataFrame]" = None,
) -> DataFrame:
    """Per-EVAL-document contamination audit — the report a
    decontamination run ships with: for every eval doc, how many of
    its k-gram shingles appear anywhere in the training corpus, and
    in how many distinct training documents.

    Returns (eval_id, n_shingles, n_hit, hit_frac, n_corpus_docs):
    ``hit_frac`` near 1 means the eval doc is effectively memorizable
    from training data; ``n_corpus_docs`` distinguishes one leaked
    copy from boilerplate shared by thousands.

    Plan: corpus shingles reduce to a (hash → distinct-doc-count)
    table FIRST (one map-side-combined groupBy — vocabulary-sized,
    orders smaller than the corpus), then the small eval shingle set
    joins against it on the 60-bit hash.  Cost is one corpus shingle
    pass regardless of eval size; no O(corpus × eval) stage.

    ``c_sh`` / ``e_sh``: see :func:`decontaminate` — prebuilt
    (id, ``_h``) shingle-hash injection (r14).
    """
    c_tab = (
        (
            shingle_rows(corpus, text_col, id_col, k).select(
                F.col(id_col), _md5_base15(F.col("_s")).alias("_h")
            )
            if c_sh is None
            else c_sh
        )
        .distinct()
        .groupBy("_h")
        .agg(F.count(F.lit(1)).alias("_ndocs"))
    )
    e_sh = (
        (
            shingle_rows(eval_set, text_col, id_col, k).select(
                F.col(id_col), _md5_base15(F.col("_s")).alias("_h")
            )
            if e_sh is None
            else e_sh
        )
        .select(F.col(id_col).alias("eval_id"), "_h")
        .distinct()
    )
    joined = e_sh.join(c_tab, "_h", "left")
    return joined.groupBy("eval_id").agg(
        F.count(F.lit(1)).alias("n_shingles"),
        F.sum(F.when(F.col("_ndocs").isNotNull(), 1).otherwise(0)).alias("n_hit"),
        (
            F.sum(F.when(F.col("_ndocs").isNotNull(), 1).otherwise(0)).cast("double")
            / F.count(F.lit(1)).cast("double")
        ).alias("hit_frac"),
        F.max(F.coalesce(F.col("_ndocs"), F.lit(0))).alias("n_corpus_docs"),
    )


def blocklist_filter(
    df: DataFrame,
    terms: "list[str]",
    text_col: str = "text",
    mode: str = "flag",
    whole_word: bool = True,
) -> DataFrame:
    """Blocklist screening (the LDNOOBW-style NSFW/spam gate): flag or
    drop documents containing any listed term.  ``whole_word``
    matches on token boundaries over the normalized text (so "class"
    never trips an "ass" entry); otherwise plain substring.

    Plan: the term set compiles into ONE literal array +
    ``arrays_overlap`` (token mode) or one alternation regex
    (substring mode) — a single scan-local predicate, no join, no
    shuffle; at 100 TB the blocklist rides in the task binary exactly
    like a broadcast, with zero exchange.  Terms are lowercased; the
    match runs on the same normalization as the tokenizer.
    """
    if mode not in ("flag", "remove"):
        raise ValueError("mode must be 'flag' or 'remove'")
    if not terms:
        raise ValueError("blocklist_filter: empty term list")
    from csp_gateway_spark.operators.text import norm_tokens, normalize_text, tokens

    lowered = sorted({t.lower() for t in terms})
    if whole_word:
        toks = norm_tokens(F.col(text_col))
        hit = F.arrays_overlap(toks, F.lit(lowered).cast("array<string>"))
    else:
        import re as _re

        pat = "|".join(_re.escape(t) for t in lowered)
        hit = F.lower(F.col(text_col)).rlike(pat)
    flagged = df.withColumn("blocked", F.coalesce(hit, F.lit(False)))
    if mode == "remove":
        return flagged.filter(~F.col("blocked")).drop("blocked")
    return flagged


def deterministic_shuffle(
    df: DataFrame,
    n_shards: int = 16,
    id_col: str = "doc_id",
    seed: int = 31,
) -> DataFrame:
    """Reproducible global training order: every row gets a (shard,
    pos) address from its seeded 60-bit hash — the "shuffled" order a
    training run reads, identical on every rerun/engine (data order
    affects the model; an order you cannot reproduce is a result you
    cannot reproduce).

    shard = hash mod n_shards; pos = rank of hash within the shard.
    The per-shard rank is a window sort, but each shard holds ~1/n of
    the rows — at 100 TB pick n_shards so a shard fits an executor
    (thousands of independent sorts, never a global order-by; same
    sharding contract as ``pack_sequences``).  Readers stream shards
    in index order for the full deterministic sequence.
    """
    from pyspark.sql.window import Window

    h = sample_hash(F.col(id_col), seed)
    out = df.withColumn("_h", h).withColumn(
        "shard", (F.col("_h") % n_shards).cast("int")
    )
    w = Window.partitionBy("shard").orderBy(F.col("_h"), F.col(id_col))
    return (
        out.withColumn("pos", F.row_number().over(w) - F.lit(1))
        .drop("_h")
    )


def budget_mix_plan(
    df: DataFrame,
    weights: Dict[str, float],
    budget_tokens: int,
    source_col: str = "source",
    text_col: str = "text",
) -> DataFrame:
    """Token-budget mixture PLANNER: given target mixture ``weights``
    (relative, any positive scale) and a total token ``budget``, emit
    the per-source sampling plan —

        target_s = budget · w_s / Σw
        rate_s   = target_s / tokens_s     (may exceed 1 → epochs)

    Output: (source, n_docs, tokens, weight, target_tokens, rate,
    epochs, frac) where ``epochs = floor(rate)`` and ``frac`` is the
    fractional-epoch remainder — exactly the inputs
    ``epoch_upsample`` (rate > 1) / ``weighted_sample`` (rate ≤ 1)
    apply.  This is the "2 T tokens total, 30 % code, 5 % books"
    planning step of assembling a training mix.

    Plan: ONE map-side-combined aggregation over the corpus (per-source
    doc + token counts); weights enter as a WHEN chain (no join).
    Sources absent from ``weights`` get weight 0 (rate 0 — dropped).
    Determinism: rate = (budget·w_s/Σw)/tokens_s is one double
    expression over exact integers and literal doubles — engine-exact.
    """
    from csp_gateway_spark.operators.text import norm_tokens

    if budget_tokens <= 0:
        raise ValueError("budget_tokens must be positive")
    total_w = float(sum(weights.values()))
    if total_w <= 0:
        raise ValueError("weights must sum to a positive value")
    w_col: Column = F.lit(0.0)
    for name, w in sorted(weights.items()):
        if w < 0:
            raise ValueError(f"weight for {name!r} must be >= 0, got {w}")
        w_col = F.when(F.col(source_col) == name, F.lit(float(w))).otherwise(w_col)
    per_src = (
        df.select(F.col(source_col), F.size(norm_tokens(F.col(text_col))).alias("_nt"))
        .groupBy(source_col)
        .agg(F.count(F.lit(1)).alias("n_docs"), F.sum("_nt").alias("tokens"))
        .withColumn("weight", w_col)
    )
    target = F.lit(float(budget_tokens)) * F.col("weight") / F.lit(total_w)
    rate = F.when(
        F.col("tokens") > 0, target / F.col("tokens").cast("double")
    ).otherwise(F.lit(0.0))
    out = per_src.select(
        F.col(source_col),
        "n_docs",
        "tokens",
        "weight",
        target.alias("target_tokens"),
        rate.alias("rate"),
    )
    return out.select(
        "*",
        F.floor(F.col("rate")).cast("long").alias("epochs"),
        (F.col("rate") - F.floor(F.col("rate"))).alias("frac"),
    )


def apply_budget_mix(
    df: DataFrame,
    plan: DataFrame,
    source_col: str = "source",
    id_col: str = "doc_id",
    seed: int = 23,
) -> DataFrame:
    """Materialize a ``budget_mix_plan``: per-source rate applied as
    floor(rate) full epochs plus one seeded-hash fractional copy —
    ``epoch_upsample`` semantics driven by a PLAN TABLE (broadcast
    join) instead of a literal dict, so the planner output feeds the
    executor without driver round-trips.  Deterministic and resumable;
    output carries the ``epoch`` index."""
    j = df.join(
        F.broadcast(plan.select(source_col, "rate")), source_col, "inner"
    )
    h = sample_hash(F.col(id_col), seed)
    frac_thresh = F.floor(
        (F.col("rate") - F.floor(F.col("rate"))) * F.lit(HASH60_SPACE)
    ).cast("long")
    copies = F.floor(F.col("rate")).cast("long") + F.when(h < frac_thresh, 1).otherwise(0)
    return (
        j.withColumn("_copies", copies)
        .filter(F.col("_copies") > 0)
        .withColumn("epoch", F.explode(F.sequence(F.lit(1), F.col("_copies"))))
        .drop("_copies", "rate")
    )


def pow2_bucket(length_col: Column) -> Column:
    """Smallest power of two ≥ length, via integer bit tricks only
    (``1 << bit_length(n-1)``) — float ``log2`` would disagree across
    engines exactly at the power-of-two boundaries.  Built with the
    SQL ``shiftleft`` (whose bit count may be a column; the Python
    ``F.shiftleft`` wrapper only takes a literal int)."""
    bits = F.length(F.bin(length_col - F.lit(1)))
    return F.when(length_col <= 1, F.lit(1).cast("long")).otherwise(
        F.call_function("shiftleft", F.lit(1), bits).cast("long")
    )


def pack_batches(
    df: DataFrame,
    batch_size: int = 32,
    n_shards: int = 8,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Length-bucketed inference/training batching: group documents
    into power-of-two token-length buckets, then pack fixed-size
    batches inside each (bucket, shard) — the standard trick that
    minimizes padding waste, since a batch only pads up to ITS OWN
    longest member rather than the corpus maximum.

    Shards are deterministic md5 buckets of the id, so the packing
    windows are per-(bucket, shard) — bounded partitions at any corpus
    size (the ``sequence_pack`` scale pattern; a global window would
    funnel everything through one task).  Batch assignment is fully
    deterministic: within a shard, docs order by (token length desc,
    id) and chunk into ``batch_size`` groups.

    Output: one row per document with (bucket, shard, batch_id,
    n_tokens) — feed to a writer partitioned by (bucket, shard) to
    materialize batch files.
    """
    from pyspark.sql.window import Window

    from csp_gateway_spark.operators.text import norm_tokens

    n = F.size(norm_tokens(F.col(text_col)))
    base = df.select(
        F.col(id_col),
        n.alias("n_tokens"),
        pow2_bucket(n).alias("bucket"),
        (sample_hash(F.col(id_col), 7) % F.lit(int(n_shards))).alias("shard"),
    )
    w = Window.partitionBy("bucket", "shard").orderBy(
        F.desc("n_tokens"), F.asc(id_col)
    )
    return base.withColumn(
        "batch_id",
        F.floor((F.row_number().over(w) - F.lit(1)) / F.lit(int(batch_size))).cast(
            "long"
        ),
    )


def padding_stats(batches: DataFrame) -> DataFrame:
    """Padding-efficiency report over ``pack_batches`` output: per
    (bucket, shard, batch) the doc count, max length (what the batch
    pads to), real token mass, and wasted pad tokens — the number a
    serving team watches when choosing bucket widths and batch sizes.
    One map-side-combined aggregation."""
    return batches.groupBy("bucket", "shard", "batch_id").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.max("n_tokens").alias("max_len"),
        F.sum("n_tokens").alias("sum_tokens"),
        (F.count(F.lit(1)) * F.max("n_tokens") - F.sum("n_tokens")).alias("pad_waste"),
    )


def exemplars(
    df: DataFrame,
    group_col: str = "source",
    n: int = 3,
    id_col: str = "doc_id",
    seed: int = 11,
) -> DataFrame:
    """Deterministic per-group exemplar sample: the ``n`` rows of each
    group with the smallest seeded id-hash — "show me 3 docs from
    every source", the inspection query every curation dashboard runs,
    made reproducible (same seed ⇒ same exemplars forever, so review
    threads can reference them).

    Window is partitioned BY GROUP — each partition holds one group's
    rows, so the sort is bounded by group size, never corpus-global;
    for pathological single-group corpora fall back to
    ``stratified_sample`` + limit.  Output adds ``rank`` (1..n)."""
    from pyspark.sql.window import Window

    h = sample_hash(F.col(id_col), seed)
    w = Window.partitionBy(group_col).orderBy(h.asc(), F.col(id_col).asc())
    return (
        df.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= n)
    )


def boilerplate_ngrams(
    df: DataFrame,
    k: int = 2,
    threshold: float = 0.15,
    min_docs: int = 2,
    source_col: str = "source",
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Per-source boilerplate n-gram detector: token ``k``-grams
    present in at least ``threshold`` share of a source's documents —
    headers, footers, navigation chrome and template noise that should
    be stripped before training (the line-level classic, generalized
    to n-grams for corpora without line structure).

    Per-doc DISTINCT shingles come from the incremental
    ``shingle_rows`` path; source labels join back on the doc key
    (co-partitioned); one (source, ngram) count against a broadcast
    per-source doc count.  ``min_docs`` floors the absolute document
    count so degenerate tiny sources (1 doc ⇒ every n-gram has share
    1.0) don't flood the report.  Output: (source, ngram, n_docs,
    share)."""
    from csp_gateway_spark.operators.dedup import shingle_rows

    sh = (
        shingle_rows(df, text_col, id_col, k)
        .join(df.select(F.col(id_col), F.col(source_col).alias("_src")), id_col)
        .select("_src", F.col(id_col), F.col("_s"))
        .distinct()
    )
    nd = df.groupBy(F.col(source_col).alias("_src")).agg(
        F.count(F.lit(1)).alias("_nd")
    )
    counts = sh.groupBy("_src", "_s").agg(F.count(F.lit(1)).alias("n_docs"))
    share = F.col("n_docs").cast("double") / F.col("_nd").cast("double")
    return (
        counts.join(F.broadcast(nd), "_src")
        .filter(
            (share >= F.lit(float(threshold)))
            & (F.col("n_docs") >= F.lit(int(min_docs)))
        )
        .select(
            F.col("_src").alias(source_col),
            F.col("_s").alias("ngram"),
            "n_docs",
            share.alias("share"),
        )
    )


def doremi_weights(
    docs,
    source_col: str = "source",
    text_col: str = "text",
    eta: float = 0.5,
    rounds: int = 2,
):
    """Group-DRO mixture reweighting (DoReMi-style, Xie et al. 2023
    §3 simplified): per-source excess loss under the CORPUS unigram
    LM drives ``rounds`` exponentiated-gradient updates
    w ← normalize(w·exp(η·loss)), starting uniform — sources the
    reference model explains worst get upweighted, the
    domain-mixture counterpart of the per-example ``dsir_weights``.

    The loss is the per-source token-level cross-entropy
    −Σ c_s(w)·ln p(w) / Σ c_s(w) with p(w) the corpus unigram MLE —
    everything reduces to one (source, token) count table joined to
    the corpus token marginal (both exact integers), the per-source
    log terms fold token-sorted per source, and the k-bounded EG
    recursion runs on ONE packed source-sorted row with pinned FP
    order.  Output per source: (source, n_tokens, loss, weight)."""
    from pyspark.sql import functions as F

    from csp_gateway_spark.operators.analytics import _capped_packed
    from csp_gateway_spark.operators.text import norm_tokens

    e = float(eta)
    toks = docs.select(
        F.col(source_col).alias("_s"),
        F.explode(norm_tokens(F.col(text_col))).alias("_w"),
    )
    cells = toks.groupBy("_s", "_w").agg(F.count(F.lit(1)).alias("_c"))
    marg = cells.groupBy("_w").agg(F.sum("_c").alias("_cw"))
    tot = cells.agg(F.sum("_c").alias("_n"))
    terms = (
        cells.join(marg, "_w")
        .crossJoin(F.broadcast(tot))
        .select(
            "_s",
            "_w",
            "_c",
            (
                -F.col("_c").cast("double")
                * F.log(
                    F.col("_cw").cast("double") / F.col("_n").cast("double")
                )
            ).alias("_h"),
        )
    )
    per_src = terms.groupBy("_s").agg(
        _capped_packed(
            F.array_sort(F.collect_list(F.struct("_w", "_h"))),
            "doremi_weights",
        ).alias("_z"),
        F.sum("_c").alias("_nt"),
    )
    hsum = F.aggregate(
        F.transform(F.col("_z"), lambda s: s["_h"]),
        F.lit(0.0),
        lambda a, v: a + v,
    )
    losses = per_src.select(
        "_s",
        F.col("_nt").cast("long").alias("_nt"),
        (hsum / F.col("_nt").cast("double")).alias("_loss"),
    )
    packed = losses.agg(
        _capped_packed(
            F.array_sort(F.collect_list(F.struct("_s", "_nt", "_loss"))),
            "doremi_weights",
        ).alias("_g")
    )
    # EG recursion on the k-bounded source list: each round multiplies
    # by exp(eta*loss) then renormalizes by the source-ordered sum —
    # identical fold shape in the DuckDB oracle
    w = F.transform(F.col("_g"), lambda s: F.lit(1.0))
    for _ in range(int(rounds)):
        raw = F.zip_with(
            w,
            F.col("_g"),
            lambda wi, s: wi * F.exp(F.lit(e) * s["_loss"]),
        )
        z = F.aggregate(raw, F.lit(0.0), lambda a, v: a + v)
        w = F.transform(raw, lambda wi: wi / z)
    rows = packed.select(
        F.explode(F.arrays_zip(F.col("_g"), w.alias("_w"))).alias("_r")
    )
    return rows.select(
        F.col("_r._g._s").alias("source"),
        F.col("_r._g._nt").alias("n_tokens"),
        F.col("_r._g._loss").alias("loss"),
        F.col("_r._w").alias("weight"),
    )
