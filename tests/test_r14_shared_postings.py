"""r14 optimization: the shared postings/doc-length tables must be
drop-in replacements inside the BM25/TF-IDF retrieval family."""

import pytest
from pyspark.sql import functions as F

TERMS = ["the", "data", "model"]


@pytest.fixture(scope="module")
def docs(spark, sf_dir):
    return spark.read.parquet(f"{sf_dir}/documents.parquet").filter(
        F.col("doc_id") < 150
    )


@pytest.fixture(scope="module")
def post(docs):
    from csp_gateway_spark.operators.retrieval import postings

    return postings(docs).localCheckpoint(eager=True)


@pytest.fixture(scope="module")
def lengths(docs):
    from csp_gateway_spark.operators.retrieval import doc_lengths

    return doc_lengths(docs).localCheckpoint(eager=True)


def _rows(df, *cols):
    return [tuple(r) for r in (df.orderBy(*cols) if cols else df).collect()]


def test_bm25_topk_injected_identical(docs, post, lengths):
    from csp_gateway_spark.operators.retrieval import bm25_topk

    a = _rows(bm25_topk(docs, TERMS, k=15))
    b = _rows(bm25_topk(docs, TERMS, k=15, post=post, lengths=lengths))
    assert a == b


def test_retrieval_eval_injected_identical(docs, post, lengths):
    from csp_gateway_spark.operators.retrieval import retrieval_eval

    a = _rows(retrieval_eval(docs, TERMS, k=5, rel_tf=2), "term")
    b = _rows(
        retrieval_eval(docs, TERMS, k=5, rel_tf=2, post=post, lengths=lengths),
        "term",
    )
    assert a == b


def test_mmr_rerank_injected_identical(docs, post, lengths):
    from csp_gateway_spark.operators.retrieval import mmr_rerank

    a = _rows(mmr_rerank(docs, TERMS, k=3, pool=8), "term", "rank")
    b = _rows(
        mmr_rerank(docs, TERMS, k=3, pool=8, post=post, lengths=lengths),
        "term",
        "rank",
    )
    assert a == b


def test_tf_idf_injected_identical(docs, post):
    from csp_gateway_spark.operators.corpus import tf_idf

    tf = post.select("doc_id", "token", "tf")
    a = _rows(tf_idf(docs), "doc_id", "token")
    b = _rows(tf_idf(docs, tf=tf), "doc_id", "token")
    assert a == b
