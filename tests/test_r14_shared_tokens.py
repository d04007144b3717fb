"""r14 optimization: shared token/gram count tables must be drop-in
replacements for the internal builds of source_drift, pmi_collocations,
vocab_topk, token_coverage and distinct_ngrams."""

import pytest
from pyspark.sql import functions as F


@pytest.fixture(scope="module")
def docs(spark, sf_dir):
    return spark.read.parquet(f"{sf_dir}/documents.parquet").filter(
        F.col("doc_id") < 150
    )


@pytest.fixture(scope="module")
def src_tok(docs):
    from csp_gateway_spark.operators.text import norm_tokens

    return (
        docs.select("source", F.explode(norm_tokens(F.col("text"))).alias("token"))
        .groupBy("source", "token")
        .agg(F.count(F.lit(1)).alias("_c"))
        .localCheckpoint(eager=True)
    )


@pytest.fixture(scope="module")
def tok_counts(src_tok):
    return src_tok.groupBy("token").agg(F.sum("_c").alias("_c")).localCheckpoint(
        eager=True
    )


def _rows(df, *cols):
    return [tuple(r) for r in (df.orderBy(*cols) if cols else df).collect()]


def test_source_drift_injected_identical(docs, src_tok):
    from csp_gateway_spark.operators.corpus import source_drift

    a = _rows(source_drift(docs, top_v=64), "source")
    b = _rows(source_drift(docs, top_v=64, counts=src_tok), "source")
    assert a == b


def test_pmi_injected_identical(docs, tok_counts):
    from csp_gateway_spark.operators.corpus import bigram_rows, pmi_collocations

    c12 = bigram_rows(docs).groupBy("w1", "w2").agg(F.count(F.lit(1)).alias("c12"))
    c1 = tok_counts.select("token", F.col("_c").alias("c"))
    a = _rows(pmi_collocations(docs, min_count=3, topk=25))
    b = _rows(pmi_collocations(docs, min_count=3, topk=25, c12=c12, c1=c1))
    assert a == b


def test_vocab_topk_injected_identical(docs, tok_counts):
    from csp_gateway_spark.operators.corpus import vocab_topk

    counts = tok_counts.select("token", F.col("_c").alias("n"))
    assert _rows(vocab_topk(docs, k=20)) == _rows(vocab_topk(docs, k=20, counts=counts))


def test_token_coverage_injected_identical(docs):
    from csp_gateway_spark.operators.corpus import token_coverage
    from csp_gateway_spark.operators.dedup import shingle_rows

    counts = (
        shingle_rows(docs, "text", "doc_id", 3)
        .groupBy("_s")
        .agg(F.count(F.lit(1)).alias("_c"))
    )
    a = _rows(token_coverage(docs, k=3), "coverage")
    b = _rows(token_coverage(docs, k=3, counts=counts), "coverage")
    assert a == b


def test_distinct_ngrams_injected_identical(docs, tok_counts):
    from csp_gateway_spark.operators.corpus import bigram_rows, distinct_ngrams
    from csp_gateway_spark.operators.dedup import shingle_rows

    # the corpus has no <2-token docs (probed in the entry docstring),
    # so the bigram/unigram derivations match shingle_rows exactly
    g1 = tok_counts.select(F.col("token").alias("_s"), "_c")
    g2 = (
        bigram_rows(docs)
        .groupBy("w1", "w2")
        .agg(F.count(F.lit(1)).alias("_c"))
        .select(F.concat_ws(" ", "w1", "w2").alias("_s"), "_c")
    )
    g3 = (
        shingle_rows(docs, "text", "doc_id", 3)
        .groupBy("_s")
        .agg(F.count(F.lit(1)).alias("_c"))
    )
    a = _rows(distinct_ngrams(docs), "n")
    b = _rows(distinct_ngrams(docs, gram_counts={1: g1, 2: g2, 3: g3}), "n")
    assert a == b
