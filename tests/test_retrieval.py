"""BM25 retrieval: scoring semantics, top-k plan shape, and the
persisted inverted-index probe (partition pruning + parity with the
in-memory path)."""

import math

import pyspark.sql.functions as F

from csp_gateway_spark.operators.retrieval import (
    bm25_scores,
    bm25_topk,
    bm25_topk_from_index,
    doc_lengths,
    persist_search_index,
    postings,
)
from csp_gateway_spark.plans.scale import explain_str

TERMS = ["spark", "query", "window"]


def test_bm25_matches_reference_formula(spark, documents):
    """Recompute one doc's score driver-side from raw postings."""
    scores = {r.doc_id: r.score for r in bm25_scores(documents, TERMS).collect()}
    post = (
        postings(documents)
        .filter(F.col("token").isin(TERMS))
        .collect()
    )
    lengths = {r.doc_id: r.dl for r in doc_lengths(documents).collect()}
    n_docs = len(lengths)
    avgdl = sum(lengths.values()) / n_docs
    df = {}
    for r in post:
        df[r.token] = df.get(r.token, 0) + 1
    # pick the highest-scoring doc and verify against the formula
    target = max(scores, key=scores.get)
    expect = 0.0
    for r in sorted((p for p in post if p.doc_id == target), key=lambda p: p.token):
        idf = math.log(1.0 + (n_docs - df[r.token] + 0.5) / (df[r.token] + 0.5))
        tf = float(r.tf)
        expect += idf * (
            tf * 2.5 / (tf + 1.5 * (0.25 + 0.75 * lengths[target] / avgdl))
        )
    assert abs(scores[target] - expect) < 1e-9


def test_bm25_only_matching_docs_scored(spark, documents):
    out = bm25_scores(documents, ["nonexistent_token_zzz"])
    assert out.count() == 0


def test_bm25_topk_is_take_ordered(spark, documents):
    plan = explain_str(bm25_topk(documents, TERMS, k=5))
    assert "TakeOrderedAndProject" in plan


def test_index_probe_prunes_and_matches_inline(spark, documents, tmp_path_factory):
    path = str(tmp_path_factory.mktemp("bm25") / "index")
    persist_search_index(documents, path, n_buckets=16)
    out = bm25_topk_from_index(spark, path, TERMS, k=10, n_buckets=16)
    plan = explain_str(out)
    assert "PartitionFilters" in plan
    assert "bucket" in plan.split("PartitionFilters", 1)[1][:200]
    from_idx = [(r.doc_id, round(r.score, 9)) for r in out.collect()]
    inline = [
        (r.doc_id, round(r.score, 9)) for r in bm25_topk(documents, TERMS, k=10).collect()
    ]
    assert from_idx == inline


def test_index_probe_single_term_df_exact(spark, documents, tmp_path_factory):
    """A term's postings live entirely in its bucket, so df from the
    pruned read equals df from the full corpus."""
    path = str(tmp_path_factory.mktemp("bm25s") / "index")
    persist_search_index(documents, path, n_buckets=16)
    one = bm25_topk_from_index(spark, path, ["spark"], k=3, n_buckets=16).collect()
    mem = bm25_topk(documents, ["spark"], k=3).collect()
    assert [(r.doc_id, round(r.score, 9)) for r in one] == [
        (r.doc_id, round(r.score, 9)) for r in mem
    ]


def test_rrf_fuse_ranks_and_missing(spark):
    from csp_gateway_spark.operators.retrieval import rrf_fuse

    lex = spark.createDataFrame(
        [(1, 9.0), (2, 5.0), (3, 1.0)], "doc_id long, score double"
    )
    sem = spark.createDataFrame(
        [(2, 0.9), (4, 0.8)], "doc_id long, score double"
    )
    out = {r.doc_id: r for r in rrf_fuse([lex, sem], k=10, c=60).collect()}
    # doc 2: rank 2 lexically, rank 1 semantically
    assert out[2].rank_0 == 2 and out[2].rank_1 == 1
    assert abs(out[2].rrf - (1 / 62 + 1 / 61)) < 1e-12
    # doc 4 only in the semantic list
    assert out[4].rank_0 is None
    assert abs(out[4].rrf - 1 / 62) < 1e-12
    # fused order: doc 2 first (two strong ranks)
    ordered = rrf_fuse([lex, sem], k=10).collect()
    assert ordered[0].doc_id == 2
