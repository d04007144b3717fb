"""Text analysis for large-scale training-data pipelines.

Additive surface (not in the reference, which has no scalar-function
library — SURVEY §2.6): language-ID, quality scoring, token counting,
document fingerprinting.  All hot-path logic is native
``pyspark.sql.functions`` (JVM codegen, no Python UDFs), so these run
at full scan speed over 100 TB: one pass, no shuffle, fully
column-pruned.
"""

from __future__ import annotations

from typing import Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

TOKEN_SPLIT = r"\s+"

# small marker-word lists per language for the n-gram/stopword heuristic
LANG_MARKERS = {
    "en": ["the", "and", "of", "to", "a", "in", "is", "that", "it", "for"],
    "fr": ["le", "la", "les", "et", "de", "un", "une", "est", "que", "pour"],
    "de": ["der", "die", "das", "und", "ist", "nicht", "ein", "eine", "zu", "mit"],
    "es": ["el", "la", "los", "las", "y", "de", "que", "es", "un", "una"],
}

EN_STOPWORDS = LANG_MARKERS["en"] + ["on", "with", "as", "at", "by", "an", "be", "this"]


def tokens(col: Column) -> Column:
    """Whitespace tokenization. ``split`` drops nothing: empty string →
    [''], so count via filtered size to get 0 for empty docs."""
    return F.split(F.trim(col), TOKEN_SPLIT)


def norm_tokens(col: Column) -> Column:
    """Normalized token array: the single-regex fast path for
    ``filter(tokens(normalize_text(col)), != '')`` — lowercase, split
    on non-alphanumeric runs, drop empties.  Produces the IDENTICAL
    token stream (pinned by ``tests/test_properties.py``) with one
    regex pass instead of three (~40 % faster per tokenize at sf0.1);
    oracle SQL mirrors keep the composed definition since only the
    output tokens matter."""
    return F.filter(
        F.split(F.lower(F.coalesce(col, F.lit(""))), "[^a-z0-9]+"),
        lambda t: t != F.lit(""),
    )


def token_count(col: Column) -> Column:
    return F.size(F.filter(tokens(col), lambda t: t != F.lit("")))


def bpe_ish_token_count(col: Column) -> Column:
    """Sub-word-ish count: split on whitespace AND transitions between
    letters/digits/punctuation (a cheap BPE proxy for budget checks)."""
    pieces = F.regexp_extract_all(col, F.lit(r"[A-Za-z]+|[0-9]+|[^A-Za-z0-9\s]"), 0)
    return F.size(pieces)


def punct_ratio(col: Column) -> Column:
    n = F.length(col)
    p = F.length(F.regexp_replace(col, r"[^.,;:!?'\"()\[\]{}-]", ""))
    return F.when(n > 0, p / n).otherwise(F.lit(0.0))


def stopword_ratio(col: Column, stopwords: list[str] | None = None) -> Column:
    sw = F.array(*[F.lit(w) for w in (stopwords or EN_STOPWORDS)])
    toks = F.filter(tokens(F.lower(col)), lambda t: t != F.lit(""))
    hits = F.size(F.filter(toks, lambda t: F.array_contains(sw, t)))
    n = F.size(toks)
    return F.when(n > 0, hits / n).otherwise(F.lit(0.0))


def quality_score(col: Column) -> Column:
    """Composite [0,1] quality heuristic: length band + punctuation
    sanity + stopword presence (Gopher/C4-style rules, simplified)."""
    n_tok = token_count(col)
    len_ok = F.when((n_tok >= 10) & (n_tok <= 100000), F.lit(1.0)).otherwise(F.lit(0.0))
    punct_ok = F.when(punct_ratio(col) <= 0.3, F.lit(1.0)).otherwise(F.lit(0.0))
    sw_ok = F.when(stopword_ratio(col) >= 0.01, F.lit(1.0)).otherwise(F.lit(0.0))
    return F.when(n_tok == 0, F.lit(0.0)).otherwise((len_ok + punct_ok + sw_ok) / 3.0)


def lang_scores(col: Column) -> dict[str, Column]:
    """Marker-word hit count per language over lowercased tokens."""
    toks = F.filter(tokens(F.lower(col)), lambda t: t != F.lit(""))
    out = {}
    for lang, words in LANG_MARKERS.items():
        arr = F.array(*[F.lit(w) for w in words])
        out[lang] = F.size(F.filter(toks, lambda t: F.array_contains(arr, t)))
    return out


def lang_id(col: Column) -> Column:
    """Heuristic language ID: CJK codepoints → zh, else argmax marker
    score with deterministic tie-break (en > fr > de > es), 'und' if all
    zero."""
    s = lang_scores(col)
    has_cjk = F.length(F.regexp_replace(col, r"[^一-鿿]", "")) > 0
    return (
        F.when(has_cjk, F.lit("zh"))
        .when((s["en"] >= s["fr"]) & (s["en"] >= s["de"]) & (s["en"] >= s["es"]) & (s["en"] > 0), F.lit("en"))
        .when((s["fr"] >= s["de"]) & (s["fr"] >= s["es"]) & (s["fr"] > 0), F.lit("fr"))
        .when((s["de"] >= s["es"]) & (s["de"] > 0), F.lit("de"))
        .when(s["es"] > 0, F.lit("es"))
        .otherwise(F.lit("und"))
    )


def normalize_text(col: Column) -> Column:
    """Canonical form for fingerprinting/dedup: lowercase, strip
    non-alphanumerics, collapse whitespace.  NULL text ≡ empty."""
    c = F.lower(F.coalesce(col, F.lit("")))
    c = F.regexp_replace(c, r"[^a-z0-9\s]", " ")
    c = F.trim(F.regexp_replace(c, r"\s+", " "))
    return c


def fingerprint(col: Column) -> Column:
    """Deterministic document fingerprint: md5 of normalized text.
    (A content-defined rolling-hash variant is in dedup.shingles.)"""
    return F.md5(normalize_text(col))


def strip_html(col: Column) -> Column:
    """Remove tags + unescape the common entities (C4-style cleanup)."""
    c = F.regexp_replace(col, r"<[^>]+>", " ")
    for ent, rep in [("&amp;", "&"), ("&lt;", "<"), ("&gt;", ">"), ("&quot;", '"'), ("&#39;", "'"), ("&nbsp;", " ")]:
        c = F.replace(c, F.lit(ent), F.lit(rep))
    return c


def remove_urls(col: Column, replacement: str = " ") -> Column:
    return F.regexp_replace(col, r"https?://\S+|www\.\S+", replacement)


def mask_pii(col: Column) -> Column:
    """Mask emails and phone-number-ish digit runs (training-data
    hygiene; deterministic placeholder tokens)."""
    c = F.regexp_replace(col, r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}", "<EMAIL>")
    c = F.regexp_replace(c, r"\+?\d[\d ()-]{7,}\d", "<PHONE>")
    return c


def clean_text(col: Column) -> Column:
    """strip_html → remove_urls → mask_pii → collapse whitespace."""
    c = mask_pii(remove_urls(strip_html(col)))
    return F.trim(F.regexp_replace(c, r"\s+", " "))


def quality_filter(
    df: DataFrame,
    text_col: str = "text",
    min_tokens: int = 10,
    max_tokens: int = 100000,
    max_punct: float = 0.3,
    min_stopword: float = 0.01,
) -> DataFrame:
    """Gopher/C4-style rule filter for training-data curation: adds
    ``keep`` (all rules pass) and ``reason`` (FIRST failing rule, in
    fixed order: too_short → too_long → too_much_punct → low_stopword;
    NULL when kept).  Pure column expressions — filters push into the
    scan, no shuffle."""
    c = F.coalesce(F.col(text_col), F.lit(""))
    n_tok = token_count(c)
    reason = (
        F.when(n_tok < min_tokens, F.lit("too_short"))
        .when(n_tok > max_tokens, F.lit("too_long"))
        .when(punct_ratio(c) > max_punct, F.lit("too_much_punct"))
        .when(stopword_ratio(c) < min_stopword, F.lit("low_stopword"))
        .otherwise(F.lit(None).cast("string"))
    )
    return df.withColumn("reason", reason).withColumn("keep", F.col("reason").isNull())


def text_stats(df: DataFrame, text_col: str = "text") -> DataFrame:
    """One-pass per-document stat sheet.  NULL text ≡ empty string.

    STAGED tokenize (round 14): the naive form re-derived the token
    array inside seven independent expression trees (token_count,
    stopword_ratio, quality_score's three sub-ratios, lang_id's four
    marker filters) — higher-order-function lambdas run on the
    interpreted path where common-subexpression elimination does not
    reach (the mattr_diversity lesson, d1a88ee), so each tree paid
    its own split+filter pass.  The raw and lowercased token arrays
    are materialized ONCE in a prior projection and every stat reads
    the shared arrays; the derived ratios (quality's len/punct/
    stopword gates, lang argmax) are plain arithmetic over the same
    intermediate columns, so every output value is bit-identical."""
    c = F.coalesce(F.col(text_col), F.lit(""))
    keep = [x for x in df.columns if x != text_col]
    staged = df.select(
        *keep,
        c.alias("_c"),
        F.filter(tokens(c), lambda t: t != F.lit("")).alias("_rt"),
        F.filter(tokens(F.lower(c)), lambda t: t != F.lit("")).alias("_lt"),
    )
    n_tok = F.size("_rt")
    n_lt = F.size("_lt")
    # punct_ratio(c) inlined on the staged text column
    p_len = F.length(F.regexp_replace(F.col("_c"), r"[^.,;:!?'\"()\[\]{}-]", ""))
    n_chars = F.length(F.col("_c"))
    punct = F.when(n_chars > 0, p_len / n_chars).otherwise(F.lit(0.0))
    # stopword_ratio over the shared lowercase tokens
    sw = F.array(*[F.lit(w) for w in EN_STOPWORDS])
    sw_hits = F.size(F.filter(F.col("_lt"), lambda t: F.array_contains(sw, t)))
    swr = F.when(n_lt > 0, sw_hits / n_lt).otherwise(F.lit(0.0))
    # quality_score from the already-computed pieces (same gates)
    len_ok = F.when((n_tok >= 10) & (n_tok <= 100000), F.lit(1.0)).otherwise(F.lit(0.0))
    punct_ok = F.when(punct <= 0.3, F.lit(1.0)).otherwise(F.lit(0.0))
    sw_ok = F.when(swr >= 0.01, F.lit(1.0)).otherwise(F.lit(0.0))
    quality = F.when(n_tok == 0, F.lit(0.0)).otherwise(
        (len_ok + punct_ok + sw_ok) / 3.0
    )
    # lang_id over the shared lowercase tokens (same marker lists,
    # same tie-break chain)
    def _marker_hits(words):
        arr = F.array(*[F.lit(w) for w in words])
        return F.size(F.filter(F.col("_lt"), lambda t: F.array_contains(arr, t)))

    scores = {lang: _marker_hits(words) for lang, words in LANG_MARKERS.items()}
    has_cjk = F.length(F.regexp_replace(F.col("_c"), r"[^一-鿿]", "")) > 0
    lang_pred = (
        F.when(has_cjk, F.lit("zh"))
        .when(
            (scores["en"] >= scores["fr"])
            & (scores["en"] >= scores["de"])
            & (scores["en"] >= scores["es"])
            & (scores["en"] > 0),
            F.lit("en"),
        )
        .when((scores["fr"] >= scores["de"]) & (scores["fr"] >= scores["es"]) & (scores["fr"] > 0), F.lit("fr"))
        .when((scores["de"] >= scores["es"]) & (scores["de"] > 0), F.lit("de"))
        .when(scores["es"] > 0, F.lit("es"))
        .otherwise(F.lit("und"))
    )
    return staged.select(
        *keep,
        n_chars.alias("n_chars_calc"),
        n_tok.alias("n_tokens"),
        bpe_ish_token_count(F.col("_c")).alias("n_subtokens"),
        punct.alias("punct_ratio"),
        swr.alias("stopword_ratio"),
        quality.alias("quality"),
        lang_pred.alias("lang_pred"),
        fingerprint(F.col("_c")).alias("fingerprint"),
    )


def char_entropy(df: DataFrame, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """Shannon entropy (bits/char) of each document's character
    distribution — a cheap perplexity proxy for quality filters (low
    entropy ⇒ repetitive/boilerplate, abnormally high ⇒ noise/binary).

    H = log2(n) − (Σ c·log2 c)/n over per-character counts.  The sum
    is evaluated as a SORTED sequential fold (array_sort + aggregate),
    never a double SUM aggregate, so the float accumulation order — and
    therefore the result — is independent of partitioning and
    reproducible on any engine (DuckDB mirror: list ordered by char,
    list_transform + list_sum).  Two shuffles, both map-side combined;
    the fold runs over ≤ |alphabet| elements per doc.
    """
    chars = df.select(
        F.col(id_col), F.explode(F.split(F.col(text_col), "")).alias("_ch")
    ).filter(F.col("_ch") != "")
    counts = chars.groupBy(id_col, "_ch").agg(F.count(F.lit(1)).alias("_c"))
    per_doc = counts.groupBy(id_col).agg(
        F.sum("_c").alias("_n"),
        F.array_sort(F.collect_list(F.struct(F.col("_ch"), F.col("_c")))).alias("_cs"),
    )
    s = F.aggregate(
        F.col("_cs"),
        F.lit(0.0),
        lambda acc, x: acc + x["_c"].cast("double") * F.log2(x["_c"].cast("double")),
    )
    ent = F.log2(F.col("_n").cast("double")) - s / F.col("_n").cast("double")
    return (
        df.select(id_col)
        .join(per_doc.select(id_col, ent.alias("_e")), id_col, "left")
        .select(F.col(id_col), F.coalesce("_e", F.lit(0.0)).alias("char_entropy"))
    )


def length_quantiles(
    df: DataFrame,
    probs: Sequence[float] = (0.5, 0.9, 0.99),
    group_col: str = "source",
    text_col: str = "text",
) -> DataFrame:
    """EXACT token-length quantiles per group — the sequence-length
    budget statistic a packing/truncation pipeline is tuned against
    (p50/p90/p99 of document token counts by source).

    Exactness is affordable at any corpus scale here: Spark's
    ``percentile`` aggregates a value→count map per group, and the
    domain is DISTINCT TOKEN COUNTS (≤ max document length — thousands
    of entries), not documents; the map merges map-side.  Spark and
    DuckDB (``quantile_cont``) share the (n-1)·q linear-interpolation
    convention, so results hash-match exactly.

    Output: ``group_col, n_docs, q<prob>...`` (q50, q90, q99 for
    the defaults).
    """
    toks = norm_tokens(F.col(text_col))
    lens = df.select(F.col(group_col), F.size(toks).alias("_len"))
    agg = lens.groupBy(group_col).agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.percentile("_len", F.array(*[F.lit(float(p)) for p in probs])).alias("_q"),
    )
    cols = [F.col(group_col), F.col("n_docs")]
    for i, p in enumerate(probs):
        name = f"q{round(p * 100)}"
        cols.append(F.round(F.element_at("_q", i + 1), 6).alias(name))
    return agg.select(*cols)


# common UTF-8-decoded-as-Latin-1 artifact sequences (ftfy's core
# signal): an '\u00c3'/'\u00c2'/'\u00e2'/'\u00f0' lead byte followed by a
# Latin-1 continuation char, plus the replacement char U+FFFD
_MOJIBAKE_RE = (
    "(\u00c3[\u0080-\u00bf]|\u00c2[\u00a0-\u00bf]|"
    "\u00e2[\u0080-\u00bf][\u0080-\u00bf]|"
    "\u00f0[\u0080-\u00bf]|\ufffd)"
)


def encoding_quality(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Mojibake / broken-encoding score per document — the cheap
    native-expression version of ftfy's detector: count UTF-8-decoded-
    as-Latin-1 artifact sequences (\u00c3\u00a9 for \u00e9, \u00e2\u0080\u0099 for
    a curly quote, U+FFFD, ...) and normalize per kilochar.
    Web-scraped corpora carry double-encoded text that poisons
    tokenizers; ``mojibake_per_kchar > 1`` is a standard curation
    gate.

    100 % JVM expressions (regexp_count) — single scan, no shuffle,
    engine-portable (DuckDB ``len(regexp_extract_all(...))``).
    Returns (id, n_chars, n_mojibake, mojibake_per_kchar,
    has_replacement)."""
    t = F.col(text_col)
    n_chars = F.length(t)
    n_moji = F.regexp_count(t, F.lit(_MOJIBAKE_RE))
    return df.select(
        F.col(id_col),
        n_chars.alias("n_chars"),
        n_moji.alias("n_mojibake"),
        F.when(
            n_chars > 0,
            n_moji.cast("double") * F.lit(1000.0) / n_chars.cast("double"),
        )
        .otherwise(F.lit(0.0))
        .alias("mojibake_per_kchar"),
        t.contains("\ufffd").alias("has_replacement"),
    )


def unicode_normalize(
    df: DataFrame,
    form: str = "NFC",
    text_col: str = "text",
    out_col: str = None,
) -> DataFrame:
    """Unicode normalization (NFC/NFD/NFKC/NFKD) of a text column —
    the canonicalization step a tokenizer pipeline runs FIRST, so that
    'café' composed and decomposed tokenize identically and dedup
    hashes agree across crawls.

    Spark has no native normalizer, so this is an Arrow-batched
    ``mapInPandas`` over stdlib ``unicodedata`` — the accepted slow
    path, vectorized per batch, no shuffle, schema preserved.  NFC
    output hash-matches DuckDB's ``nfc_normalize`` (the gate oracle);
    NFKC/NFKD additionally fold compatibility forms (ligatures,
    full-width chars) and are the usual pretraining choice.
    """
    import unicodedata

    if form not in ("NFC", "NFD", "NFKC", "NFKD"):
        raise ValueError(f"unknown normalization form {form!r}")
    target = out_col or text_col
    fields = [
        f"`{f.name}` {f.dataType.simpleString()}" for f in df.schema.fields
    ]
    if target not in df.columns:
        fields.append(f"`{target}` string")
    schema = ", ".join(fields)

    def norm(batches):
        for pdf in batches:
            pdf = pdf.copy()
            pdf[target] = [
                None if t is None else unicodedata.normalize(form, t)
                for t in pdf[text_col]
            ]
            yield pdf

    return df.mapInPandas(norm, schema=schema)


GOPHER_STOPWORDS = ("the", "be", "to", "of", "and", "that", "have", "with")


def gopher_stats(df: DataFrame, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """Per-document Gopher quality-rule statistics (Rae et al. 2021,
    arXiv:2112.11446 §A1.1 MassiveWeb filters) and the combined keep
    decision:

    - 50 ≤ word count ≤ 100 000
    - 3 ≤ mean word length ≤ 10
    - symbol-to-word ratio ('#' chars + '...' / '…' runs) ≤ 0.1
    - ≤ 90 % of lines start with a bullet
    - ≤ 30 % of lines end with an ellipsis
    - ≥ 80 % of words contain an alphabetic character
    - ≥ 2 distinct Gopher stopwords present

    Everything is a scan-local native-expression projection — no
    shuffle, no UDF; string-count tricks (length deltas) for the
    symbol counts keep it whole-stage-codegen.  The repetition rules
    of the same appendix live in ``curation.repetition_stats``.

    STAGED (round 14): the word/line/lowered-word arrays and every
    raw statistic are materialized ONCE in prior projections —
    higher-order-function lambdas run interpreted where CSE does not
    reach, and the combined ``keep`` predicate re-inlined every
    statistic's whole tree (words split ~12×/row in the flat form).
    Same expressions over the same arrays ⇒ bit-identical output."""
    t = F.coalesce(F.col(text_col), F.lit(""))
    words = F.filter(F.split(F.trim(t), TOKEN_SPLIT), lambda w: w != F.lit(""))
    lines = F.filter(F.split(t, "\n"), lambda l: F.trim(l) != F.lit(""))
    staged = df.select(
        F.col(id_col),
        t.alias("_t"),
        words.alias("_w"),
        lines.alias("_l"),
        F.transform(words, lambda w: F.lower(w)).alias("_lw"),
    )
    tt = F.col("_t")
    n_words = F.size("_w")
    sum_len = F.aggregate(
        F.transform(F.col("_w"), lambda w: F.length(w)), F.lit(0), lambda a, x: a + x
    )
    mean_len = F.when(n_words > 0, sum_len.cast("double") / n_words).otherwise(F.lit(0.0))
    n_hash = F.length(tt) - F.length(F.regexp_replace(tt, "#", ""))
    n_ell = (
        F.length(tt) - F.length(F.regexp_replace(tt, r"\.\.\.", ""))
    ) / F.lit(3) + (F.length(tt) - F.length(F.regexp_replace(tt, "…", "")))
    symbol_ratio = F.when(
        n_words > 0, (n_hash + n_ell).cast("double") / n_words
    ).otherwise(F.lit(0.0))
    n_lines = F.size("_l")
    bullet_frac = F.when(
        n_lines > 0,
        F.size(F.filter(F.col("_l"), lambda l: F.ltrim(l).rlike("^[-*•‣]"))).cast(
            "double"
        )
        / n_lines,
    ).otherwise(F.lit(0.0))
    ell_frac = F.when(
        n_lines > 0,
        F.size(
            F.filter(F.col("_l"), lambda l: F.rtrim(l).rlike("(\\.\\.\\.|…)$"))
        ).cast("double")
        / n_lines,
    ).otherwise(F.lit(0.0))
    alpha_frac = F.when(
        n_words > 0,
        F.size(F.filter(F.col("_w"), lambda w: w.rlike("[A-Za-z]"))).cast("double")
        / n_words,
    ).otherwise(F.lit(0.0))
    stop_hits = sum(
        [F.array_contains(F.col("_lw"), s).cast("int") for s in GOPHER_STOPWORDS],
        F.lit(0),
    )
    stats = staged.select(
        F.col(id_col),
        n_words.cast("long").alias("_nw"),
        mean_len.alias("_ml"),
        symbol_ratio.alias("_sr"),
        bullet_frac.alias("_bf"),
        ell_frac.alias("_ef"),
        alpha_frac.alias("_af"),
        stop_hits.cast("long").alias("_sh"),
    )
    keep = (
        (F.col("_nw") >= 50)
        & (F.col("_nw") <= 100000)
        & (F.col("_ml") >= 3.0)
        & (F.col("_ml") <= 10.0)
        & (F.col("_sr") <= 0.1)
        & (F.col("_bf") <= 0.9)
        & (F.col("_ef") <= 0.3)
        & (F.col("_af") >= 0.8)
        & (F.col("_sh") >= 2)
    )
    return stats.select(
        F.col(id_col),
        F.col("_nw").alias("n_words"),
        F.round("_ml", 6).alias("mean_word_len"),
        F.round("_sr", 6).alias("symbol_ratio"),
        F.round("_bf", 6).alias("bullet_line_frac"),
        F.round("_ef", 6).alias("ellipsis_line_frac"),
        F.round("_af", 6).alias("alpha_word_frac"),
        F.col("_sh").alias("stopword_hits"),
        keep.cast("int").alias("gopher_keep"),
    )


def c4_stats(df: DataFrame, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """Per-document C4 cleaning statistics (Raffel et al. 2020,
    arXiv:1910.10683 §2.2): terminal-punctuation line fraction,
    sentence count, code/boilerplate flags, javascript-line fraction,
    and the combined doc-level keep (≥3 sentences, no '{', no 'lorem
    ipsum').  Line-level removals (non-terminal lines, javascript
    lines) are reported as fractions so the caller can apply them with
    one transform; the cross-document line dedup of the same paper is
    ``curation.line_dedup``.  Scan-local native expressions only;
    the line array is materialized once (round 14 — the three
    line-filter HOFs run interpreted, so each inlined its own
    split+trim pass in the flat form)."""
    t = F.coalesce(F.col(text_col), F.lit(""))
    lines = F.filter(F.split(t, "\n"), lambda l: F.trim(l) != F.lit(""))
    staged = df.select(F.col(id_col), t.alias("_t"), lines.alias("_l"))
    tt = F.col("_t")
    n_lines = F.size("_l")
    term_frac = F.when(
        n_lines > 0,
        F.size(
            F.filter(F.col("_l"), lambda l: F.rtrim(l).rlike("[.!?\"”]$"))
        ).cast("double")
        / n_lines,
    ).otherwise(F.lit(0.0))
    low = F.lower(tt)
    n_sent = F.length(F.regexp_replace(tt, "[^.!?]", ""))
    has_lorem = low.contains("lorem ipsum").cast("int")
    has_brace = tt.contains("{").cast("int")
    js_frac = F.when(
        n_lines > 0,
        F.size(
            F.filter(F.col("_l"), lambda l: F.lower(l).contains("javascript"))
        ).cast("double")
        / n_lines,
    ).otherwise(F.lit(0.0))
    keep = (n_sent >= 3) & (has_lorem == 0) & (has_brace == 0)
    return staged.select(
        F.col(id_col),
        n_lines.cast("long").alias("n_lines"),
        F.round(term_frac, 6).alias("terminal_line_frac"),
        n_sent.cast("long").alias("n_sentences"),
        has_lorem.alias("has_lorem"),
        has_brace.alias("has_brace"),
        F.round(js_frac, 6).alias("js_line_frac"),
        keep.cast("int").alias("c4_keep"),
    )


PII_PATTERNS = {
    "emails": r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}",
    "phones": r"\+?\d[\d ()-]{7,}\d",
    "ipv4s": r"\b\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}\b",
    "card_like": r"\b\d{16}\b",
}


def pii_report(
    df: DataFrame, group_col: str = "source", text_col: str = "text"
) -> DataFrame:
    """Per-group PII exposure report: occurrence counts per PII class
    (emails, phone-like digit runs, IPv4s, 16-digit card-like runs)
    plus the count of documents containing ANY — the compliance
    dashboard a curation run publishes before release, and the
    regression gate for ``mask_pii``.  One scan, one map-side-combined
    aggregation; counting is ``regexp_count`` (JVM, codegen)."""
    counts = [
        F.regexp_count(F.col(text_col), F.lit(pat)).alias(f"_{name}")
        for name, pat in PII_PATTERNS.items()
    ]
    base = df.select(F.col(group_col), *counts)
    any_pii = sum(
        [F.col(f"_{name}") for name in PII_PATTERNS], F.lit(0)
    )
    aggs = [F.sum(f"_{name}").alias(name) for name in PII_PATTERNS]
    return base.groupBy(group_col).agg(
        F.count(F.lit(1)).alias("n_docs"),
        *aggs,
        F.sum(F.when(any_pii > 0, 1).otherwise(0)).alias("docs_with_pii"),
    )


def lang_confusion(
    df: DataFrame,
    lang_col: str = "lang",
    text_col: str = "text",
) -> DataFrame:
    """Confusion matrix of the heuristic language detector against the
    corpus's labeled language — the accuracy report to run before
    trusting ``lang_id`` as a curation filter.  Pure scan-local
    projection + one small groupBy; engine-exact integer counts."""
    return (
        df.select(
            F.col(lang_col).alias("lang"),
            lang_id(F.col(text_col)).alias("lang_pred"),
        )
        .groupBy("lang", "lang_pred")
        .agg(F.count(F.lit(1)).alias("n"))
    )


def tokenizer_fertility(
    df: DataFrame,
    lang_col: str = "lang",
    text_col: str = "text",
) -> DataFrame:
    """Tokenizer fertility report per language: characters (normalized
    text), whitespace words, BPE-ish sub-word pieces, and the
    chars-per-word / pieces-per-word ratios tokenizer evaluations
    track (high fertility = the vocab under-serves that language).
    One grouped aggregate; ratios are single double expressions over
    exact integer sums."""
    norm = normalize_text(F.col(text_col))
    out = df.groupBy(F.col(lang_col).alias("lang")).agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum(F.length(norm)).alias("chars"),
        F.sum(F.size(norm_tokens(F.col(text_col)))).alias("words"),
        F.sum(bpe_ish_token_count(F.col(text_col))).alias("pieces"),
    )
    return out.select(
        "lang",
        "n_docs",
        "chars",
        "words",
        "pieces",
        (F.col("chars").cast("double") / F.col("words").cast("double")).alias(
            "chars_per_word"
        ),
        (F.col("pieces").cast("double") / F.col("words").cast("double")).alias(
            "pieces_per_word"
        ),
    )


def readability(df: DataFrame, text_col: str = "text", by: str = "source") -> DataFrame:
    """Per-group readability profile with a Flesch-style score —
    macro-averaged from EXACT integer totals (Σwords, Σvowel-group
    'syllables', Σletters), so the doubles are ratio-of-sums and
    engine-identical: score = 206.835 − 1.015·(Σw/n) − 84.6·(Σsyl/Σw)
    (the corpus has no sentence punctuation, so each doc counts as
    one sentence).  One scan, one grouped aggregate — native
    expressions only.  Output per group: (by, n_docs, avg_words,
    syl_per_word, letters_per_word, flesch)."""
    t = F.col(text_col)
    words = F.size(F.filter(tokens(t), lambda x: x != F.lit("")))
    syls = F.size(F.regexp_extract_all(F.lower(t), F.lit("[aeiouy]+"), 0))
    letters = F.length(F.regexp_replace(t, "[^A-Za-z]", ""))
    g = df.groupBy(F.col(by)).agg(
        F.count(F.lit(1)).cast("long").alias("n_docs"),
        F.sum(words).cast("long").alias("_w"),
        F.sum(syls).cast("long").alias("_s"),
        F.sum(letters).cast("long").alias("_l"),
    )
    n = F.col("n_docs").cast("double")
    w = F.col("_w").cast("double")
    s = F.col("_s").cast("double")
    l = F.col("_l").cast("double")
    return g.select(
        by,
        "n_docs",
        (w / n).alias("avg_words"),
        (s / w).alias("syl_per_word"),
        (l / w).alias("letters_per_word"),
        (
            F.lit(206.835) - F.lit(1.015) * (w / n) - F.lit(84.6) * (s / w)
        ).alias("flesch"),
    )


def code_switch(df: DataFrame, text_col: str = "text", by: str = "source") -> DataFrame:
    """Code-switching screen: per group, how many documents match
    marker stopwords of 2+ languages (≥2 DISTINCT markers each) — the
    mixed-language contamination check before per-language training
    splits.  One scan, native array intersections against the
    broadcast marker lists; per-group exact counts.  Output:
    (by, n_docs, n_multilang, share)."""
    toks = F.array_distinct(norm_tokens(F.col(text_col)))
    lang_hits = [
        (F.size(F.array_intersect(toks, F.array(*[F.lit(w) for w in words]))) >= 2)
        .cast("int")
        .alias(f"_h_{lang}")
        for lang, words in sorted(LANG_MARKERS.items())
    ]
    base = df.select(F.col(by).alias("_g"), *lang_hits)
    n_langs = sum(F.col(f"_h_{lang}") for lang in sorted(LANG_MARKERS))
    flagged = base.select("_g", (n_langs >= 2).cast("long").alias("_multi"))
    out = flagged.groupBy("_g").agg(
        F.count(F.lit(1)).cast("long").alias("n_docs"),
        F.sum("_multi").cast("long").alias("n_multilang"),
    )
    return out.select(
        F.col("_g").alias(by),
        "n_docs",
        "n_multilang",
        (F.col("n_multilang").cast("double") / F.col("n_docs").cast("double")).alias(
            "share"
        ),
    )
