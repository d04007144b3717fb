"""Schema-contract enforcement: widenings, drift detection, column
normalization — plus idempotence/monotonicity properties for the URL
and BM25 operators added this round."""

import pyspark.sql.functions as F

from csp_gateway_spark.sources.contract import (
    ColumnSpec,
    SchemaContract,
    enforce_contract,
)

CONTRACT = SchemaContract(
    columns=[
        ColumnSpec("doc_id", "bigint"),
        ColumnSpec("score", "double"),
        ColumnSpec("tag", "string", required=False),
    ],
    name="docs_v1",
)


def test_contract_clean_pass(spark):
    df = spark.createDataFrame([(1, 0.5, "x")], "doc_id bigint, score double, tag string")
    out, v = enforce_contract(df, CONTRACT)
    assert v == [] and out.columns == ["doc_id", "score", "tag"]


def test_contract_safe_widening_coerces(spark):
    df = spark.createDataFrame([(1, 2)], "doc_id int, score int")
    out, v = enforce_contract(df, CONTRACT)
    # int->bigint and int->double are silent widenings; tag missing but
    # optional+nullable -> injected as NULL
    assert [x.kind for x in v] == []
    got = dict(zip(out.columns, [f.dataType.simpleString() for f in out.schema.fields]))
    assert got == {"doc_id": "bigint", "score": "double", "tag": "string"}
    assert out.first().tag is None


def test_contract_flags_drift(spark):
    df = spark.createDataFrame([("a", "b")], "doc_id string, extra string")
    c = SchemaContract(columns=CONTRACT.columns, allow_extra=False)
    out, v = enforce_contract(df, c)
    kinds = {(x.column, x.kind) for x in v}
    assert ("doc_id", "type") in kinds        # string is not a safe widening
    assert ("score", "missing") in kinds
    assert ("extra", "extra") in kinds


def test_contract_column_order_normalized(spark):
    df = spark.createDataFrame([(0.5, 7, "t")], "score double, doc_id bigint, tag string")
    out, v = enforce_contract(df, CONTRACT)
    assert v == [] and out.columns == ["doc_id", "score", "tag"]


def test_canonical_url_idempotent(spark):
    from csp_gateway_spark.operators.web import canonical_url

    urls = [
        "HTTP://WWW.Example.COM:80/A/B/?utm_source=x&b=2&a=1#frag",
        "https://example.com",
        "http://sub.example.co.uk:8080/x/?z=1&y=2",
    ]
    df = spark.createDataFrame([(i, u) for i, u in enumerate(urls)], "i long, url string")
    once = df.select("i", canonical_url(F.col("url")).alias("c"))
    twice = once.select("i", canonical_url(F.col("c")).alias("c"))
    assert [r.c for r in once.orderBy("i").collect()] == [
        r.c for r in twice.orderBy("i").collect()
    ]


def test_bm25_more_matches_scores_higher(spark):
    from csp_gateway_spark.operators.retrieval import bm25_scores

    docs = [
        (0, "spark query window extra words here padd pad pad pad"),
        (1, "spark query other words here padd pad pad pad pad"),
        (2, "spark alone words here padd pad pad pad pad pad"),
    ]
    df = spark.createDataFrame(docs, "doc_id long, text string")
    out = {r.doc_id: r.score for r in bm25_scores(df, ["spark", "query", "window"]).collect()}
    # equal doc lengths: strictly more matched terms => strictly higher score
    assert out[0] > out[1] > out[2] > 0
