"""r14 optimization: the shared positioned 8-gram table (`_sh8`) must
be a drop-in replacement for the gram builds inside `ngram_novelty`,
`repeated_ngram_spans` and `source_overlap`."""

import pytest
from pyspark.sql import functions as F


@pytest.fixture(scope="module")
def docs(spark, sf_dir):
    # small slice keeps the uninjected (window-lead) paths fast
    return spark.read.parquet(f"{sf_dir}/documents.parquet").filter(
        F.col("doc_id") < 120
    )


@pytest.fixture(scope="module")
def sh8(spark, docs):
    import __spark_entry__ as entry
    from csp_gateway_spark.operators.dedup import _md5_base15
    from csp_gateway_spark.operators.text import norm_tokens

    # mirror entry._sh8 over the test slice (entry version is memoized
    # over the full sf_dir corpus; the builder logic is what's under test)
    k = 8
    grams = F.when(
        F.size("_tk") >= k,
        F.transform(
            F.sequence(F.lit(1), F.size("_tk") - F.lit(k - 1)),
            lambda i: F.struct(
                (i - F.lit(1)).alias("_p"),
                _md5_base15(F.concat_ws(" ", F.slice("_tk", i, k))).alias("_h"),
            ),
        ),
    ).otherwise(
        F.array(
            F.struct(
                F.lit(-1).alias("_p"),
                _md5_base15(F.concat_ws(" ", F.col("_tk"))).alias("_h"),
            )
        )
    )
    return (
        docs.select("doc_id", "source", norm_tokens(F.col("text")).alias("_tk"))
        .select("doc_id", "source", F.explode(grams).alias("_g"))
        .select(
            "doc_id", "source", F.col("_g._p").alias("_p"), F.col("_g._h").alias("_h")
        )
        .localCheckpoint(eager=True)
    )


def _sorted_rows(df, *cols):
    return [tuple(r) for r in df.orderBy(*cols).collect()]


def test_ngram_novelty_injected_identical(docs, sh8):
    from csp_gateway_spark.operators.dedup import ngram_novelty

    sh = sh8.select("doc_id", F.col("_h").alias("_s"))
    a = _sorted_rows(ngram_novelty(docs, k=8), "doc_id")
    b = _sorted_rows(ngram_novelty(docs, k=8, sh=sh), "doc_id")
    assert a == b


def test_substring_spans_injected_identical(docs, sh8):
    from csp_gateway_spark.operators.dedup import repeated_ngram_spans

    grams = sh8.filter(F.col("_p") >= 0).select("doc_id", "_p", "_h")
    a = _sorted_rows(repeated_ngram_spans(docs, k=8), "doc_id", "span_start")
    b = _sorted_rows(
        repeated_ngram_spans(docs, k=8, grams=grams), "doc_id", "span_start"
    )
    assert a == b


def test_source_overlap_injected_identical(docs, sh8):
    from csp_gateway_spark.operators.dedup import source_overlap

    sh = sh8.select(F.col("source").alias("_src"), "_h")
    a = _sorted_rows(source_overlap(docs, k=8), "src_a", "src_b")
    b = _sorted_rows(source_overlap(docs, k=8, sh=sh), "src_a", "src_b")
    assert a == b
