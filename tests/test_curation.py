"""Corpus curation operators (operators/curation.py): decontamination,
deterministic stratified sampling, cross-doc line dedup."""

import pytest
from pyspark.sql import functions as F

from csp_gateway_spark.operators.curation import (
    decontaminate,
    dedup_lines,
    sample_hash,
    stratified_sample,
)


@pytest.fixture(scope="module")
def corpus(spark):
    rows = [
        (1, "the quick brown fox jumps over the lazy dog tonight"),
        (2, "completely unrelated text about spark shuffles and joins"),
        (3, "the quick brown fox jumps over the lazy dog again today"),
    ]
    return spark.createDataFrame(rows, "doc_id long, text string")


@pytest.fixture(scope="module")
def eval_set(spark):
    return spark.createDataFrame(
        [(100, "we test the quick brown fox jumps over everything")],
        "doc_id long, text string",
    )


def test_decontaminate_flags_overlap(corpus, eval_set):
    out = {r["doc_id"]: r["contaminated"] for r in decontaminate(corpus, eval_set, k=5).collect()}
    # docs 1 and 3 share the 5-gram "the quick brown fox jumps"
    assert out == {1: True, 2: False, 3: True}


def test_decontaminate_remove_mode(corpus, eval_set):
    out = decontaminate(corpus, eval_set, k=5, mode="remove")
    assert [r["doc_id"] for r in out.collect()] == [2]
    assert "contaminated" not in out.columns
    with pytest.raises(ValueError, match="mode"):
        decontaminate(corpus, eval_set, mode="bogus")


def test_stratified_sample_deterministic_and_bounded(spark):
    df = spark.createDataFrame(
        [(i, "a" if i % 2 == 0 else "b") for i in range(2000)], "doc_id long, src string"
    )
    out1 = stratified_sample(df, {"a": 1.0, "b": 0.2}, strata_col="src", id_col="doc_id")
    out2 = stratified_sample(df, {"a": 1.0, "b": 0.2}, strata_col="src", id_col="doc_id")
    ids1 = sorted(r["doc_id"] for r in out1.collect())
    assert ids1 == sorted(r["doc_id"] for r in out2.collect())  # deterministic
    a = sum(1 for i in ids1 if i % 2 == 0)
    b = len(ids1) - a
    assert a == 1000  # fraction 1.0 keeps every row
    assert 120 <= b <= 280  # ~0.2 of 1000, hash-uniform

    with pytest.raises(ValueError, match="fraction"):
        stratified_sample(df, {"a": 1.5}, strata_col="src")


def test_sample_hash_seed_sensitivity(spark):
    df = spark.createDataFrame([(i,) for i in range(500)], "doc_id long")
    h1 = df.select(sample_hash(F.col("doc_id"), 1).alias("h")).collect()
    h2 = df.select(sample_hash(F.col("doc_id"), 2).alias("h")).collect()
    assert [r["h"] for r in h1] != [r["h"] for r in h2]


def test_dedup_lines_keeps_first_occurrence(spark):
    docs = spark.createDataFrame(
        [
            (1, "alpha\nshared boilerplate line\nbeta"),
            (2, "shared boilerplate line\ngamma"),
            (3, "delta\nshared boilerplate line"),
        ],
        "doc_id long, text string",
    )
    out = {r["doc_id"]: r["text"] for r in dedup_lines(docs).collect()}
    assert out[1] == "alpha\nshared boilerplate line\nbeta"  # first occurrence survives
    assert out[2] == "gamma"
    assert out[3] == "delta"


def test_dedup_lines_drops_fully_duplicated_doc(spark):
    docs = spark.createDataFrame(
        [(1, "only line"), (2, "only line")], "doc_id long, text string"
    )
    out = {r["doc_id"]: r["text"] for r in dedup_lines(docs).collect()}
    assert out == {1: "only line"}  # doc 2 reassembles to nothing -> dropped
