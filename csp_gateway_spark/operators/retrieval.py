"""Full-text retrieval: Okapi BM25 scoring + a persisted inverted
index for 100 TB-scale keyword search.

Training-data pipelines use BM25 retrieval for (a) finding documents
relevant to an eval prompt (targeted decontamination), (b) sourcing
topic-focused pretraining subsets, and (c) hard-negative mining for
retrieval models.  Reference analogue: the gateway's keyed state
lookup + filter query surface (csp_gateway/server/web/routes,
state filters) — here generalised to ranked text search.

Scale design:
- The corpus is only ever shuffled for the postings of the QUERY
  terms: tokenisation is scan-local, and the token→term filter runs
  before the (doc, term) aggregation, so shuffle volume is
  proportional to matching postings, not corpus size.
- ``N`` / ``avgdl`` enter the plan as a 1-row broadcast aggregate
  (no driver-side ``.count()`` actions, single job).
- ``persist_search_index`` writes postings parquet partitioned by a
  deterministic token bucket; probes prune at file-listing level
  (PartitionFilters), same layout trick as ``persist_ivf_index``
  (operators/similarity.py).  A term's postings live entirely inside
  its bucket, so document frequency is exact from the pruned read.
- Top-k compiles to TakeOrderedAndProject (per-partition partial
  top-k) — never a global sort.

Determinism (oracle-reproducible): per-document scores are summed as
a term-ordered fold over a collected array, never a double SUM
aggregate — the same partitioning-invariance pattern as
``corpus.lm_score`` / ``text.char_entropy``.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from csp_gateway_spark.operators.corpus import token_rows
from csp_gateway_spark.operators.text import norm_tokens, normalize_text, tokens

__all__ = [
    "doc_lengths",
    "postings",
    "bm25_scores",
    "bm25_topk",
    "persist_search_index",
    "bm25_topk_from_index",
]


def doc_lengths(df: DataFrame, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """(doc_id, dl): token count per document — scan-local projection."""
    toks = norm_tokens(F.col(text_col))
    return df.select(F.col(id_col), F.size(toks).alias("dl"))


def postings(df: DataFrame, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """(token, doc_id, tf) posting rows — ONE map-side-combined shuffle."""
    return (
        token_rows(df, text_col, id_col)
        .groupBy("token", id_col)
        .agg(F.count(F.lit(1)).alias("tf"))
    )


def _corpus_stats(lengths: DataFrame) -> DataFrame:
    """1-row (n_docs, avgdl) aggregate for broadcast into the scoring
    plan.  avgdl = exact integer token total / exact integer doc count,
    one double division — bit-reproducible across engines."""
    return lengths.agg(
        F.count(F.lit(1)).alias("n_docs"),
        (F.sum("dl").cast("double") / F.count(F.lit(1))).alias("avgdl"),
    )


def _bm25_from_postings(
    post: DataFrame,
    lengths: DataFrame,
    stats: DataFrame,
    terms: list[str],
    id_col: str,
    k1: float,
    b: float,
) -> DataFrame:
    """Shared scoring tail: filter postings to the query terms, exact
    per-term df, per-(doc, term) BM25 partial, term-ordered fold."""
    matched = post.filter(F.col("token").isin(list(terms)))
    dfreq = matched.groupBy("token").agg(F.count(F.lit(1)).alias("df"))
    scored = (
        matched.join(F.broadcast(dfreq), "token")
        .join(lengths, id_col)
        .crossJoin(F.broadcast(stats))
    )
    idf = F.log(
        F.lit(1.0)
        + (F.col("n_docs") - F.col("df") + F.lit(0.5)) / (F.col("df") + F.lit(0.5))
    )
    tf = F.col("tf").cast("double")
    part = idf * (
        tf
        * F.lit(k1 + 1.0)
        / (tf + F.lit(k1) * (F.lit(1.0 - b) + F.lit(b) * F.col("dl") / F.col("avgdl")))
    )
    per_term = scored.select(F.col(id_col), F.col("token"), part.alias("_s"))
    folded = per_term.groupBy(id_col).agg(
        F.array_sort(F.collect_list(F.struct("token", "_s"))).alias("_parts")
    )
    score = F.aggregate(F.col("_parts"), F.lit(0.0), lambda acc, x: acc + x["_s"])
    return folded.select(
        F.col(id_col),
        F.size("_parts").alias("n_terms"),
        score.alias("score"),
    )


def bm25_scores(
    df: DataFrame,
    terms: list[str],
    text_col: str = "text",
    id_col: str = "doc_id",
    k1: float = 1.5,
    b: float = 0.75,
    post: DataFrame | None = None,
    lengths: DataFrame | None = None,
) -> DataFrame:
    """Okapi BM25 score of every document matching ≥1 query term.

    idf(t)       = ln(1 + (N - df + 0.5) / (df + 0.5))
    score(d, t)  = idf · tf·(k1+1) / (tf + k1·(1 − b + b·dl/avgdl))
    score(d)     = Σ_t score(d, t)   (term-ordered fold)

    Output: (id_col, n_terms, score).  Only postings of the query
    terms are shuffled; dl/avgdl/N come from scan-local projections
    and a broadcast 1-row aggregate.
    """
    if lengths is None:
        lengths = doc_lengths(df, text_col, id_col)
    if post is None:
        post = postings(df, text_col, id_col)
    return _bm25_from_postings(
        post,
        lengths,
        _corpus_stats(lengths),
        terms,
        id_col,
        k1,
        b,
    )


def bm25_topk(
    df: DataFrame,
    terms: list[str],
    k: int = 10,
    text_col: str = "text",
    id_col: str = "doc_id",
    k1: float = 1.5,
    b: float = 0.75,
    post: DataFrame | None = None,
    lengths: DataFrame | None = None,
) -> DataFrame:
    """Top-k by (score desc, id asc) — compiles to
    TakeOrderedAndProject, per-partition partial top-k."""
    return (
        bm25_scores(df, terms, text_col, id_col, k1, b, post=post, lengths=lengths)
        .orderBy(F.desc("score"), F.asc(id_col))
        .limit(k)
    )


def token_bucket(col, n_buckets: int = 64):
    """Deterministic engine-portable token bucket: first 8 hex chars of
    md5 → int → mod buckets (same construction as the LSH band keys)."""
    return (
        F.conv(F.substring(F.md5(col), 1, 8), 16, 10).cast("long") % n_buckets
    ).alias("bucket")


def persist_search_index(
    df: DataFrame,
    path: str,
    text_col: str = "text",
    id_col: str = "doc_id",
    n_buckets: int = 64,
) -> None:
    """Write a persistent inverted index:

    - ``<path>/postings/`` — (token, doc_id, tf) parquet,
      ``partitionBy(bucket)`` with a deterministic md5 token bucket:
      a query touches only its terms' buckets (file-listing pruning),
      and a term's df is exact from the pruned read.
    - ``<path>/docs/``     — (doc_id, dl) document lengths.
    - ``<path>/stats/``    — 1-row (n_docs, avgdl).

    At 100 TB the postings write is one tokenize+aggregate pass;
    probes afterwards never rescan the corpus (same pattern as
    ``persist_ivf_index`` / ``persist_dedup_index``).
    """
    post = postings(df, text_col, id_col).withColumn(
        "bucket", token_bucket(F.col("token"), n_buckets)
    )
    post.write.mode("overwrite").partitionBy("bucket").parquet(f"{path}/postings")
    lengths = doc_lengths(df, text_col, id_col)
    lengths.write.mode("overwrite").parquet(f"{path}/docs")
    _corpus_stats(lengths).write.mode("overwrite").parquet(f"{path}/stats")


def bm25_topk_from_index(
    spark: SparkSession,
    path: str,
    terms: list[str],
    k: int = 10,
    id_col: str = "doc_id",
    k1: float = 1.5,
    b: float = 0.75,
    n_buckets: int = 64,
) -> DataFrame:
    """Probe a persisted index without rescanning the corpus.  The
    bucket predicate prunes partitions at file-listing time, so the
    scan is proportional to the query terms' posting lists."""
    # term buckets computed driver-side with the same md5 construction
    # the writer used — no Spark job needed to plan the pruned read
    import hashlib

    term_buckets = sorted(
        {int(hashlib.md5(t.encode("utf-8")).hexdigest()[:8], 16) % n_buckets for t in terms}
    )
    post = (
        spark.read.parquet(f"{path}/postings")
        .filter(F.col("bucket").isin(term_buckets))
        .select("token", id_col, "tf")
    )
    lengths = spark.read.parquet(f"{path}/docs")
    stats = spark.read.parquet(f"{path}/stats")
    return (
        _bm25_from_postings(post, lengths, stats, terms, id_col, k1, b)
        .orderBy(F.desc("score"), F.asc(id_col))
        .limit(k)
    )


def rrf_fuse(
    rankings,
    id_col: str = "doc_id",
    score_col: str = "score",
    k: int = 10,
    c: int = 60,
) -> DataFrame:
    """Reciprocal-rank fusion of N candidate lists — the standard
    hybrid-search combiner (lexical BM25 ⊕ embedding cosine):
    rrf(d) = Σ_i 1/(c + rank_i(d)), missing-from-list terms 0.

    Each input MUST already be depth-limited (``bm25_topk`` /
    ``cosine_topk`` — both TakeOrdered, per-partition partial top-k);
    ranks are then assigned with a row_number window over the tiny
    k-row candidate list — the ONLY window in the plan, bounded by
    list depth, never corpus-global.  The outer join fans out over at
    most Σ depths rows, so the whole fusion is broadcast-sized no
    matter the corpus.  Ranks are exact ints and each 1/(c+r) folds
    in fixed list order, so scores are engine-exact doubles.
    """
    from pyspark.sql import Window

    fused = None
    rank_cols = []
    for i, r in enumerate(rankings):
        w = Window.orderBy(F.desc(score_col), F.asc(id_col))
        ranked = r.select(
            F.col(id_col),
            F.row_number().over(w).alias(f"rank_{i}"),
        )
        rank_cols.append(f"rank_{i}")
        fused = ranked if fused is None else fused.join(ranked, id_col, "full_outer")
    score = None
    for rc in rank_cols:
        term = F.coalesce(
            F.lit(1.0) / (F.lit(float(c)) + F.col(rc).cast("double")), F.lit(0.0)
        )
        score = term if score is None else score + term
    return (
        fused.withColumn("rrf", score)
        .orderBy(F.desc("rrf"), F.asc(id_col))
        .limit(k)
    )


def retrieval_eval(
    df: DataFrame,
    terms: list[str],
    k: int = 10,
    rel_tf: int = 3,
    text_col: str = "text",
    id_col: str = "doc_id",
    k1: float = 1.5,
    b: float = 0.75,
    post: DataFrame | None = None,
    lengths: DataFrame | None = None,
) -> DataFrame:
    """Ranking-quality evaluation of single-term BM25 retrieval:
    NDCG@k, MRR@k and recall@k per query term, with binary relevance
    rel = (tf ≥ ``rel_tf``) — the offline eval harness a retrieval
    pipeline runs against labeled judgments.

    Same shuffle discipline as :func:`bm25_scores` (only the query
    terms' postings move; N/avgdl broadcast); the per-term top-k is a
    window PARTITIONED by term over the term's candidate set, and
    every metric folds the rank-sorted ≤k list (DCG) or an arithmetic
    series (ideal DCG) with pinned order — doubles are
    engine-identical.  Output per term: (term, n_cand, total_rel,
    rel_at_k, ndcg, mrr, recall)."""
    from pyspark.sql import Window

    if lengths is None:
        lengths = doc_lengths(df, text_col, id_col)
    stats = _corpus_stats(lengths)
    if post is None:
        post = postings(df, text_col, id_col)
    matched = post.filter(F.col("token").isin(list(terms)))
    dfreq = matched.groupBy("token").agg(F.count(F.lit(1)).alias("df"))
    scored = (
        matched.join(F.broadcast(dfreq), "token")
        .join(lengths, id_col)
        .crossJoin(F.broadcast(stats))
    )
    idf = F.log(
        F.lit(1.0)
        + (F.col("n_docs") - F.col("df") + F.lit(0.5)) / (F.col("df") + F.lit(0.5))
    )
    tf = F.col("tf").cast("double")
    part = idf * (
        tf
        * F.lit(k1 + 1.0)
        / (tf + F.lit(k1) * (F.lit(1.0 - b) + F.lit(b) * F.col("dl") / F.col("avgdl")))
    )
    cand = scored.select(
        "token",
        F.col(id_col),
        part.alias("_s"),
        (F.col("tf") >= rel_tf).cast("int").alias("_rel"),
    )
    totals = cand.groupBy("token").agg(
        F.count(F.lit(1)).cast("long").alias("n_cand"),
        F.sum("_rel").cast("long").alias("total_rel"),
    )
    w = Window.partitionBy("token").orderBy(F.desc("_s"), F.asc(id_col))
    top = cand.withColumn("_rk", F.row_number().over(w)).filter(
        F.col("_rk") <= k
    )
    folded = top.groupBy("token").agg(
        F.array_sort(F.collect_list(F.struct("_rk", "_rel"))).alias("_z")
    )
    dcg = F.aggregate(
        F.col("_z"),
        F.lit(0.0),
        lambda acc, x: acc
        + x["_rel"].cast("double") / F.log2(x["_rk"].cast("double") + F.lit(1.0)),
    )
    first_rel = F.array_min(
        F.filter(F.col("_z"), lambda x: x["_rel"] == 1)
    )["_rk"]
    rel_at_k = F.aggregate(
        F.col("_z"), F.lit(0).cast("long"), lambda acc, x: acc + x["_rel"]
    )
    j = folded.join(totals, "token")
    ideal_n = F.least(F.lit(k).cast("long"), F.col("total_rel"))
    idcg = F.when(
        ideal_n > 0,
        F.aggregate(
            F.sequence(F.lit(1).cast("long"), ideal_n),
            F.lit(0.0),
            lambda acc, i: acc
            + F.lit(1.0) / F.log2(i.cast("double") + F.lit(1.0)),
        ),
    )
    return j.select(
        F.col("token").alias("term"),
        "n_cand",
        "total_rel",
        rel_at_k.alias("rel_at_k"),
        F.when(idcg > 0, dcg / idcg).otherwise(F.lit(0.0)).alias("ndcg"),
        F.when(
            first_rel.isNotNull(), F.lit(1.0) / first_rel.cast("double")
        )
        .otherwise(F.lit(0.0))
        .alias("mrr"),
        F.when(
            F.col("total_rel") > 0,
            rel_at_k.cast("double") / F.col("total_rel").cast("double"),
        )
        .otherwise(F.lit(0.0))
        .alias("recall"),
    )


def mmr_rerank(
    df: DataFrame,
    terms: list[str],
    k: int = 5,
    pool: int = 12,
    lam: float = 0.7,
    text_col: str = "text",
    id_col: str = "doc_id",
    k1: float = 1.5,
    b: float = 0.75,
    post: DataFrame | None = None,
    lengths: DataFrame | None = None,
) -> DataFrame:
    """Maximal-marginal-relevance re-ranking of the per-term BM25
    candidate pool: greedily select ``k`` of the top-``pool``
    candidates maximizing λ·score − (1−λ)·max_{s∈S} jaccard(cand, s)
    (token-set similarity) — the diversification step a RAG retriever
    applies before context packing.

    The greedy loop is inherently sequential but BOUNDED (k steps
    over ``pool`` candidates), so the whole per-query rerank runs as
    an array fold on ONE packed row per term — candidates keep their
    distinct-token sets in-row; each step's argmax is an array_min
    over (−mmr, doc_id, idx) structs (lexicographic, so ties break on
    doc id identically on both engines).  Everything upstream is the
    postings-only BM25 shuffle.  Output: (term, rank, doc_id, mmr)."""
    from pyspark.sql import Window

    if lengths is None:
        lengths = doc_lengths(df, text_col, id_col)
    stats = _corpus_stats(lengths)
    if post is None:
        post = postings(df, text_col, id_col)
    matched = post.filter(F.col("token").isin(list(terms)))
    dfreq = matched.groupBy("token").agg(F.count(F.lit(1)).alias("df"))
    scored = (
        matched.join(F.broadcast(dfreq), "token")
        .join(lengths, id_col)
        .crossJoin(F.broadcast(stats))
    )
    idf = F.log(
        F.lit(1.0)
        + (F.col("n_docs") - F.col("df") + F.lit(0.5)) / (F.col("df") + F.lit(0.5))
    )
    tf = F.col("tf").cast("double")
    part = idf * (
        tf
        * F.lit(k1 + 1.0)
        / (tf + F.lit(k1) * (F.lit(1.0 - b) + F.lit(b) * F.col("dl") / F.col("avgdl")))
    )
    cand = scored.select("token", F.col(id_col), part.alias("_s"))
    w = Window.partitionBy("token").orderBy(F.desc("_s"), F.asc(id_col))
    top = cand.withColumn("_rk", F.row_number().over(w)).filter(
        F.col("_rk") <= pool
    )
    toksets = df.select(
        F.col(id_col), F.array_distinct(norm_tokens(F.col(text_col))).alias("_tk")
    )
    topt = top.join(toksets, id_col)
    packed = topt.groupBy("token").agg(
        F.array_sort(
            F.collect_list(F.struct("_rk", F.col(id_col).alias("_id"), "_s", "_tk"))
        ).alias("_z")
    )
    z = F.col("_z")
    n = F.size(z)

    def jac(i, j):
        a = F.element_at(z, i)["_tk"]
        bb = F.element_at(z, j)["_tk"]
        inter = F.size(F.array_intersect(a, bb))
        return inter / (F.size(a) + F.size(bb) - inter)

    def mmr_of(i, sel):
        pen = F.when(
            F.size(sel) == 0, F.lit(0.0)
        ).otherwise(F.array_max(F.transform(sel, lambda j: jac(i, j))))
        return (
            F.lit(lam) * F.element_at(z, i)["_s"] - F.lit(1.0 - lam) * pen
        )

    out_t = "array<struct<rank:int,doc_id:bigint,mmr:double>>"
    init = F.struct(
        F.array().cast("array<int>").alias("sel"),
        F.array().cast(out_t).alias("out"),
    )

    def step(acc, s):
        remaining = F.filter(
            F.sequence(F.lit(1), n),
            lambda i: ~F.array_contains(acc["sel"], i),
        )
        best = F.array_min(
            F.transform(
                remaining,
                lambda i: F.struct(
                    (-mmr_of(i, acc["sel"])).alias("negmmr"),
                    F.element_at(z, i)["_id"].alias("did"),
                    i.alias("idx"),
                ),
            )
        )
        return F.struct(
            F.concat(acc["sel"], F.array(best["idx"])).alias("sel"),
            F.concat(
                acc["out"],
                F.array(
                    F.struct(
                        s.cast("int").alias("rank"),
                        best["did"].alias("doc_id"),
                        (-best["negmmr"]).alias("mmr"),
                    )
                ),
            ).alias("out"),
        )

    kk = F.least(F.lit(int(k)), n)
    folded = packed.select(
        "token",
        F.when(
            kk > 0,
            F.aggregate(F.sequence(F.lit(1), kk), init, step)["out"],
        ).alias("_out"),
    )
    ex = folded.select("token", F.explode("_out").alias("_e"))
    return ex.select(
        F.col("token").alias("term"),
        F.col("_e.rank").alias("rank"),
        F.col("_e.doc_id").alias("doc_id"),
        F.col("_e.mmr").alias("mmr"),
    )
