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


# ---------------------------------------------------------------------------
# train_split / pack_sequences / repetition_stats
# ---------------------------------------------------------------------------

def test_train_split_deterministic_partition(spark):
    from csp_gateway_spark.operators.curation import train_split

    docs = spark.createDataFrame([(i, f"d{i}") for i in range(1000)], "doc_id long, text string")
    out = train_split(docs, {"train": 0.8, "val": 0.1, "test": 0.1})
    counts = {r["split"]: r["n"] for r in out.groupBy("split").count().withColumnRenamed("count", "n").collect()}
    # every row assigned, proportions near the weights
    assert sum(counts.values()) == 1000
    assert set(counts) == {"train", "val", "test"}
    assert 700 <= counts["train"] <= 900
    # same id -> same split on a rerun (pure hash, no RNG)
    again = {r["doc_id"]: r["split"] for r in train_split(docs, {"train": 0.8, "val": 0.1, "test": 0.1}).collect()}
    first = {r["doc_id"]: r["split"] for r in out.collect()}
    assert again == first


def test_train_split_weights_validate(spark):
    from csp_gateway_spark.operators.curation import train_split

    docs = spark.createDataFrame([(1, "x")], "doc_id long, text string")
    with pytest.raises(ValueError, match="sum to 1"):
        train_split(docs, {"a": 0.5, "b": 0.6})


def test_pack_sequences_bins_respect_budget(spark):
    from csp_gateway_spark.operators.curation import pack_sequences, pack_stats

    docs = spark.createDataFrame(
        [(i, " ".join(["tok"] * 100)) for i in range(50)], "doc_id long, text string"
    )
    packed = pack_sequences(docs, budget_tokens=500, shards=4)
    rows = packed.collect()
    assert all(r["n_tokens"] == 100 for r in rows)
    # start-offset binning: each bin's token total stays within
    # budget + one max doc length
    for r in pack_stats(packed).collect():
        assert r["tokens"] <= 500 + 100
    # deterministic: same assignment on recompute
    a = sorted((r["doc_id"], r["shard"], r["bin"]) for r in rows)
    b = sorted((r["doc_id"], r["shard"], r["bin"]) for r in pack_sequences(docs, budget_tokens=500, shards=4).collect())
    assert a == b


def test_repetition_stats_flags_repetitive_doc(spark):
    from csp_gateway_spark.operators.curation import repetition_filter, repetition_stats

    docs = spark.createDataFrame(
        [
            (1, "spam spam spam spam spam spam"),          # one bigram dominates
            (2, "one two three four five six\nseven eight nine ten"),  # clean
            (3, "dup line\ndup line\ndup line\nother"),     # duplicate lines
        ],
        "doc_id long, text string",
    )
    stats = {r["doc_id"]: r for r in repetition_stats(docs).collect()}
    assert stats[1]["top_bigram_frac"] == 1.0
    assert stats[2]["dup_line_frac"] == 0.0
    # all-distinct bigrams: max/total = 1/(n-1), small but nonzero
    assert stats[2]["top_bigram_frac"] == pytest.approx(1 / 9)
    assert stats[3]["dup_line_frac"] == pytest.approx(0.5)
    kept = {r["doc_id"] for r in repetition_filter(docs).select("doc_id").collect()}
    assert kept == {2}


def test_repetition_stats_empty_and_single_token(spark):
    from csp_gateway_spark.operators.curation import repetition_stats

    docs = spark.createDataFrame(
        [(1, ""), (2, "solo")], "doc_id long, text string"
    )
    stats = {r["doc_id"]: r for r in repetition_stats(docs).collect()}
    assert stats[1]["dup_line_frac"] == 0.0 and stats[1]["top_bigram_frac"] == 0.0
    assert stats[2]["top_bigram_frac"] == 0.0


def test_vocab_encode_roundtrip(spark):
    from csp_gateway_spark.operators.corpus import build_vocab, encode_documents

    docs = spark.createDataFrame(
        [
            (1, "the cat sat on the mat"),
            (2, "the dog sat"),
            (3, "zyxxy unknownword the"),
        ],
        "doc_id long, text string",
    )
    vocab = build_vocab(docs, size=5)
    v = {r["token"]: r["token_id"] for r in vocab.collect()}
    # most frequent token gets the first non-reserved id
    assert v["the"] == 1
    assert 0 not in v.values()  # id 0 reserved for UNK
    enc = {r["doc_id"]: r for r in encode_documents(docs, vocab).collect()}
    # order preserved: doc 1 starts and re-uses 'the'
    ids1 = enc[1]["ids"]
    assert ids1[0] == v["the"] and ids1[4] == v["the"]
    assert enc[1]["n_tokens"] == 6
    # OOV maps to UNK id 0 and is counted
    assert 0 in enc[3]["ids"]
    assert enc[3]["n_unk"] >= 1


def test_weighted_sample_mixing_ratios(spark):
    from csp_gateway_spark.operators.curation import weighted_sample

    df = spark.createDataFrame(
        [(i, 1.0 if i % 2 == 0 else 0.25) for i in range(4000)],
        "doc_id long, w double",
    )
    out = weighted_sample(df, "w")
    kept = [r["doc_id"] for r in out.collect()]
    full = sum(1 for i in kept if i % 2 == 0)
    quarter = len(kept) - full
    assert full == 2000             # weight 1.0 keeps everything
    assert 380 <= quarter <= 620    # ~0.25 of 2000, hash-uniform
    # deterministic on rerun
    again = [r["doc_id"] for r in weighted_sample(df, "w").collect()]
    assert sorted(kept) == sorted(again)
    # base_fraction scales the product; invalid values rejected
    half = weighted_sample(df, "w", base_fraction=0.5).count()
    assert half < len(kept)
    with pytest.raises(ValueError, match="base_fraction"):
        weighted_sample(df, "w", base_fraction=1.5)


def test_lm_score_separates_typical_from_noise(spark):
    from csp_gateway_spark.operators.corpus import lm_score

    rows = [(i, "the cat sat on the mat and the dog sat on the rug") for i in range(8)]
    rows.append((100, "zq xv qqj kpw zzt vxq jqk wpz"))  # token soup
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    got = {r["doc_id"]: r for r in lm_score(docs).collect()}
    typical = got[0]["ppl"]
    noise = got[100]["ppl"]
    # the repeated phrasing is far more probable under the corpus LM
    assert typical < noise
    # ppl = exp(-avg_logp) consistency
    import math

    assert got[0]["ppl"] == pytest.approx(math.exp(-got[0]["avg_logp"]))


def test_lm_score_partitioning_invariant_and_null_for_tiny(spark):
    from csp_gateway_spark.operators.corpus import lm_score

    docs = spark.createDataFrame(
        [(1, "a b c d e f g h i j k l"), (2, "solo"), (3, "x y x y x y")],
        "doc_id long, text string",
    )
    one = {r["doc_id"]: r["avg_logp"] for r in lm_score(docs.coalesce(1)).collect()}
    many = {r["doc_id"]: r["avg_logp"] for r in lm_score(docs.repartition(8)).collect()}
    assert one == many  # sorted fold: order-invariant
    assert one[2] is None  # <2 tokens: no bigrams -> NULL score


def test_temperature_mix_smooths_toward_tail(spark, sf_dir):
    """α<1 mixing keeps a larger fraction of tail sources than of the
    head; α=1 keeps natural proportions (frac≈budget/N for all)."""
    from csp_gateway_spark.operators.curation import mix_fractions, temperature_mix

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    fr = {r.lang: r.frac for r in mix_fractions(docs, "lang", alpha=0.5).collect()}
    counts = {r.lang: r.n for r in docs.groupBy("lang").count().withColumnRenamed("count", "n").collect()}
    head = max(counts, key=counts.get)
    tail = min(counts, key=counts.get)
    assert fr[tail] > fr[head]  # tail upweighted relative to head
    assert fr[head] < 1.0 <= fr[tail] + 1e-12 or fr[tail] == 1.0

    out = temperature_mix(docs, "lang", alpha=0.5)
    kept = {r.lang: r.n for r in out.groupBy("lang").count().withColumnRenamed("count", "n").collect()}
    # realized rates follow the fractions (hash sampler is uniform-ish)
    assert kept[head] < counts[head]
    # deterministic: same seed -> identical result set
    again = temperature_mix(docs, "lang", alpha=0.5)
    assert sorted(r.doc_id for r in out.collect()) == sorted(r.doc_id for r in again.collect())


def test_temperature_mix_alpha_one_is_neutral(spark, sf_dir):
    from csp_gateway_spark.operators.curation import mix_fractions

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    fr = [r.frac for r in mix_fractions(docs, "lang", alpha=1.0).collect()]
    assert all(abs(f - 1.0) < 1e-12 for f in fr)  # budget=N, natural mix


def test_tf_hash_features_deterministic_and_normalized(spark):
    from csp_gateway_spark.operators.corpus import tf_hash_features

    docs = spark.createDataFrame(
        [(1, "the cat the cat dog"), (2, "")], "doc_id long, text string"
    )
    rows = tf_hash_features(docs, dim=16).collect()
    got = {(r.doc_id, r.bucket): r.tf for r in rows}
    assert sum(v for (d, _), v in got.items() if d == 1) == 5  # 5 tokens total
    assert all(0 <= b < 16 for (_, b) in got)
    assert not any(d == 2 for (d, _) in got)  # empty doc -> no rows
    # same token always lands in the same bucket (the hashing trick)
    again = {(r.doc_id, r.bucket): r.tf for r in tf_hash_features(docs, dim=16).collect()}
    assert again == got
    # l2 variant: per-doc norm of tf_norm is 1
    import math
    nrm = tf_hash_features(docs, dim=16, l2_normalize=True).collect()
    s = sum(r.tf_norm ** 2 for r in nrm if r.doc_id == 1)
    assert math.isclose(s, 1.0, rel_tol=1e-9)


def test_temperature_mix_is_streaming_safe(spark, tmp_path, sf_dir):
    """temperature_mix is pure projection+filter (broadcast fractions,
    deterministic hash threshold), so the SAME operator code runs
    unchanged on a streaming DataFrame — batch/streaming results are
    identical row sets."""
    import json

    from csp_gateway_spark.operators.curation import mix_fractions, temperature_mix

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet").select("doc_id", "lang")
    fr = mix_fractions(docs, "lang", alpha=0.5).withColumn("frac", F.round("frac", 12))
    batch_ids = sorted(r.doc_id for r in temperature_mix(docs, "lang", fractions=fr).collect())

    src = tmp_path / "mix"
    src.mkdir()
    with open(src / "b1.json", "w") as f:
        for r in docs.collect():
            f.write(json.dumps({"doc_id": r.doc_id, "lang": r.lang}) + "\n")
    stream = spark.readStream.schema("doc_id long, lang string").json(str(src))
    out = temperature_mix(stream, "lang", fractions=fr)
    q = (
        out.writeStream.outputMode("append").format("memory").queryName("mix_stream")
        .option("checkpointLocation", str(tmp_path / "ck_mix")).start()
    )
    try:
        q.processAllAvailable()
        stream_ids = sorted(r.doc_id for r in spark.table("mix_stream").collect())
        assert stream_ids == batch_ids
    finally:
        q.stop()


def test_chunk_documents_overlap_and_coverage(spark):
    from csp_gateway_spark.operators.corpus import chunk_documents

    text = " ".join(f"w{i}" for i in range(10))
    docs = spark.createDataFrame([(1, text), (2, "short doc"), (3, "")], "doc_id long, text string")
    rows = {(r.doc_id, r.chunk_id): r for r in chunk_documents(docs, chunk_tokens=4, overlap=2).collect()}
    # doc 1: stride 2, chunks while k*2 < 10 -> k=0..4
    assert sorted(k for (d, k) in rows if d == 1) == [0, 1, 2, 3, 4]
    assert rows[(1, 0)].chunk_text == "w0 w1 w2 w3"
    assert rows[(1, 1)].chunk_text == "w2 w3 w4 w5"      # 2-token overlap
    assert rows[(1, 4)].chunk_text == "w8 w9"            # tail chunk, partial
    assert rows[(1, 4)].n_tokens == 2
    # every token covered at least once
    covered = set()
    for (d, _), r in rows.items():
        if d == 1:
            covered.update(r.chunk_text.split())
    assert covered == {f"w{i}" for i in range(10)}
    # short doc -> one chunk; empty doc -> no chunks
    assert rows[(2, 0)].chunk_text == "short doc"
    assert not any(d == 3 for (d, _) in rows)
    with pytest.raises(ValueError):
        chunk_documents(docs, chunk_tokens=4, overlap=4)


# ---------------------------------------------------------------------------
# Bloom-filter decontamination
# ---------------------------------------------------------------------------


def test_bloom_no_false_negatives(spark, sf_dir):
    """Every doc the exact semi-join flags, the Bloom path flags too
    (Bloom filters cannot produce false negatives)."""
    from csp_gateway_spark.operators.curation import bloom_decontaminate

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    ev = docs.filter(F.col("doc_id") % 20 == 0)
    corp = docs.filter(F.col("doc_id") % 20 != 0)
    exact = {
        r["doc_id"]
        for r in decontaminate(corp, ev, k=5).filter("contaminated").collect()
    }
    bloom = {
        r["doc_id"]
        for r in bloom_decontaminate(corp, ev, k=5).filter("contaminated").collect()
    }
    assert exact <= bloom
    # False positives stay a small fraction of the corpus at 2^16 bits.
    n = corp.count()
    assert len(bloom - exact) <= max(0.05 * n, 5), (len(bloom - exact), n)


def test_bloom_small_example_and_remove_mode(corpus, eval_set):
    from csp_gateway_spark.operators.curation import bloom_decontaminate

    out = {
        r["doc_id"]: r["contaminated"]
        for r in bloom_decontaminate(corpus, eval_set, k=5).collect()
    }
    assert out[1] and out[3] and not out[2]
    removed = bloom_decontaminate(corpus, eval_set, k=5, mode="remove")
    assert 2 in {r["doc_id"] for r in removed.collect()}
    with pytest.raises(ValueError, match="mode"):
        bloom_decontaminate(corpus, eval_set, mode="bogus")


def test_bloom_bits_bounded_and_literal_filter(corpus, eval_set):
    """The filter is ≤ min(m, k_hashes·shingles) rows, and the corpus
    probe is a pure codegen FILTER against the inlined bitmap — no
    join of any kind on the corpus-shingle side (r14: the broadcast
    probe join was replaced by a literal array<long> bitmap test)."""
    from csp_gateway_spark.operators.curation import bloom_bits, bloom_decontaminate

    bits = bloom_bits(eval_set, k_shingle=5, m_bits=1 << 10, k_hashes=3)
    assert bits.count() <= 1 << 10
    plan = bloom_decontaminate(
        corpus, eval_set, k=5
    )._jdf.queryExecution().executedPlan().toString()
    # the only join left is the final flag join back onto the corpus
    # doc table (doc-keyed); the shingle probe itself must be joinless
    import re

    assert len(re.findall(r"\w*Join", plan)) == 1


def test_bloom_duplicate_shingle_doc(spark, eval_set):
    """A doc repeating the contaminated shingle still flags exactly
    once (the probe dedups (doc, shingle) pairs)."""
    from csp_gateway_spark.operators.curation import bloom_decontaminate

    rep = spark.createDataFrame(
        [(7, "the quick brown fox jumps xx the quick brown fox jumps")],
        "doc_id long, text string",
    )
    out = bloom_decontaminate(rep, eval_set, k=5).collect()
    assert len(out) == 1 and out[0]["contaminated"]


# ---------------------------------------------------------------------------
# BPE merge training
# ---------------------------------------------------------------------------


def test_bpe_textbook_merges(spark):
    """The classic low/lower/lowest corpus learns l+o then lo+w first."""
    from csp_gateway_spark.operators.corpus import bpe_train

    df = spark.createDataFrame(
        [(1, "low lower lowest low low"), (2, "newer newest new low")],
        "doc_id long, text string",
    )
    got = [(r["left"], r["right"], r["n"]) for r in bpe_train(df, 4).orderBy("merge_rank").collect()]
    assert got[0] == ("l", "o", 6)
    assert got[1] == ("lo", "w", 6)
    assert got[2] == ("e", "w", 3)
    assert got[3] == ("n", "ew", 3)


def test_bpe_greedy_run_semantics(spark):
    """A run of the same symbol merges at even offsets only:
    'xxxx' with pair (x,x) -> [xx, xx]; 'xxx' -> [xx, x]."""
    from csp_gateway_spark.operators.corpus import bpe_encode

    df = spark.createDataFrame([(1, "xxxx xxx")], "doc_id long, text string")
    out = bpe_encode(df, [("x", "x")]).collect()[0]
    assert out["pieces"] == ["xx", "xx", "xx", "x"]


def test_bpe_encode_reconstructs_text(documents):
    """Concatenated pieces reproduce each token stream, and more merges
    never increase the piece count."""
    from csp_gateway_spark.operators.corpus import bpe_encode, bpe_train
    from csp_gateway_spark.operators.text import normalize_text, tokens

    sample = documents.limit(50)
    merges = [
        (r["left"], r["right"])
        for r in bpe_train(sample, 6).orderBy("merge_rank").collect()
    ]
    enc = {r["doc_id"]: r for r in bpe_encode(sample, merges).collect()}
    plain = {
        r["doc_id"]: "".join(
            t for t in r["tk"]
        )
        for r in sample.select(
            "doc_id",
            F.filter(tokens(normalize_text(F.col("text"))), lambda t: t != F.lit("")).alias("tk"),
        ).collect()
    }
    enc0 = {r["doc_id"]: r["n_pieces"] for r in bpe_encode(sample, []).collect()}
    for did, row in enc.items():
        assert "".join(row["pieces"]) == plain[did]
        assert row["n_pieces"] <= enc0[did]


def test_bpe_partitioning_invariant(documents):
    from csp_gateway_spark.operators.corpus import bpe_train

    sample = documents.limit(40)
    one = [tuple(r) for r in bpe_train(sample.coalesce(1), 5).orderBy("merge_rank").collect()]
    many = [tuple(r) for r in bpe_train(sample.repartition(16), 5).orderBy("merge_rank").collect()]
    assert one == many


# ---------------------------------------------------------------------------
# DSIR importance resampling (curation.py::dsir_weights/dsir_sample)
# ---------------------------------------------------------------------------


@pytest.fixture(scope="module")
def dsir_corpus(spark):
    target_like = [
        (i, "alpha beta gamma delta epsilon zeta eta theta", "tgt")
        for i in range(10)
    ]
    web_like = [
        (100 + i, "click here buy now free offer subscribe today", "web")
        for i in range(30)
    ]
    return spark.createDataFrame(
        target_like + web_like, "doc_id long, text string, source string"
    )


def test_dsir_weights_separate_target_from_raw(dsir_corpus):
    from csp_gateway_spark.operators.curation import dsir_weights

    target = dsir_corpus.filter(F.col("source") == "tgt")
    out = dsir_weights(dsir_corpus, target, dim=256)
    rows = {r["doc_id"]: r["logw"] for r in out.collect()}
    tgt_scores = [rows[i] for i in range(10)]
    web_scores = [rows[100 + i] for i in range(30)]
    # every target-like doc must outscore every web-like doc
    assert min(tgt_scores) > max(web_scores)
    # weights preserve every corpus row and are deterministic
    assert len(rows) == 40
    again = {r["doc_id"]: r["logw"] for r in dsir_weights(dsir_corpus, target, dim=256).collect()}
    assert rows == again


def test_dsir_weights_empty_doc_scores_zero(spark):
    from csp_gateway_spark.operators.curation import dsir_weights

    df = spark.createDataFrame(
        [(1, "real words here", "a"), (2, "", "a"), (3, "...", "a")],
        "doc_id long, text string, source string",
    )
    out = {r["doc_id"]: r["logw"] for r in dsir_weights(df, df.limit(1)).collect()}
    assert out[2] == 0.0 and out[3] == 0.0


def test_dsir_sample_prefers_target_like(dsir_corpus):
    from csp_gateway_spark.operators.curation import dsir_sample

    target = dsir_corpus.filter(F.col("source") == "tgt")
    # without noise the top-10 must be exactly the target-like docs
    kept = dsir_sample(dsir_corpus, target, n_keep=10, dim=256, gumbel=False)
    assert sorted(r["doc_id"] for r in kept.collect()) == list(range(10))
    # Gumbel resampling is deterministic for a fixed seed and keeps
    # mostly target-like docs (weights dominate the noise here)
    g1 = sorted(r["doc_id"] for r in dsir_sample(dsir_corpus, target, 10, dim=256, seed=7).collect())
    g2 = sorted(r["doc_id"] for r in dsir_sample(dsir_corpus, target, 10, dim=256, seed=7).collect())
    assert g1 == g2


def test_dsir_sample_plan_is_take_ordered(dsir_corpus):
    from csp_gateway_spark.operators.curation import dsir_sample

    target = dsir_corpus.filter(F.col("source") == "tgt")
    plan = dsir_sample(dsir_corpus, target, 5)._jdf.queryExecution().executedPlan().toString()
    assert "TakeOrderedAndProject" in plan


def test_epoch_upsample_counts_and_determinism(spark):
    from csp_gateway_spark.operators.curation import epoch_upsample

    df = spark.createDataFrame(
        [(i, "books" if i < 1000 else "web") for i in range(3000)],
        "doc_id long, source string",
    )
    out = epoch_upsample(df, {"books": 2.4, "web": 0.5}, seed=23)
    rows = out.groupBy("source").count().collect()
    by_src = {r["source"]: r["count"] for r in rows}
    # books: 1000 docs × 2.4 epochs ≈ 2400; web: 2000 × 0.5 ≈ 1000
    assert 2250 <= by_src["books"] <= 2550
    assert 880 <= by_src["web"] <= 1120
    again = epoch_upsample(df, {"books": 2.4, "web": 0.5}, seed=23)
    assert sorted(map(tuple, out.collect())) == sorted(map(tuple, again.collect()))
    # epoch indices are dense 1..copies per doc
    per_doc = out.filter(F.col("doc_id") == 0).select("epoch").collect()
    assert sorted(r["epoch"] for r in per_doc) == list(range(1, len(per_doc) + 1))


def test_epoch_upsample_default_and_zero(spark):
    from csp_gateway_spark.operators.curation import epoch_upsample

    df = spark.createDataFrame(
        [(1, "a"), (2, "b"), (3, "drop")], "doc_id long, source string"
    )
    out = epoch_upsample(df, {"drop": 0.0}, seed=5).collect()
    ids = sorted(r["doc_id"] for r in out)
    assert ids == [1, 2]  # default 1.0 keeps one copy; 0.0 drops
    with pytest.raises(ValueError, match=">= 0"):
        epoch_upsample(df, {"a": -1.0})


def test_pmi_collocations_finds_fixed_phrase(spark):
    from csp_gateway_spark.operators.corpus import pmi_collocations

    # "kuala lumpur" always adjacent; filler bigrams are all unique so
    # they fall under min_count and only the true collocation survives
    rows = [
        (i, f"flr{i} kuala lumpur flr{(i + 3) % 10} flr{(i + 7) % 10}")
        for i in range(10)
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    out = pmi_collocations(df, min_count=5, topk=5).collect()
    assert [(r["w1"], r["w2"]) for r in out] == [("kuala", "lumpur")]


def test_contamination_report_full_and_none(corpus, eval_set, spark):
    from csp_gateway_spark.operators.curation import contamination_report

    rep = {r["eval_id"]: r for r in contamination_report(corpus, eval_set, k=5).collect()}
    # eval doc 100 shares "the quick brown fox jumps" with docs 1 and 3
    assert rep[100]["n_hit"] >= 1
    assert rep[100]["n_corpus_docs"] == 2  # hit shingle appears in 2 train docs
    assert 0 < rep[100]["hit_frac"] <= 1
    clean = spark.createDataFrame(
        [(200, "entirely novel sentence with zero training overlap whatsoever")],
        "doc_id long, text string",
    )
    rep2 = contamination_report(corpus, clean, k=5).collect()[0]
    assert rep2["n_hit"] == 0 and rep2["hit_frac"] == 0.0 and rep2["n_corpus_docs"] == 0



def test_blocklist_filter_whole_word_vs_substring(spark):
    from csp_gateway_spark.operators.curation import blocklist_filter

    docs = spark.createDataFrame(
        [
            (1, "a perfectly classy sentence"),
            (2, "contains the banned term here"),
            (3, "BANNED in caps with punctuation!"),
        ],
        "doc_id long, text string",
    )
    out = {r["doc_id"]: r["blocked"] for r in blocklist_filter(docs, ["banned"]).collect()}
    assert out == {1: False, 2: True, 3: True}  # case/punct insensitive
    # whole-word: "class" does not trip a "lass" entry
    ww = {r["doc_id"]: r["blocked"] for r in blocklist_filter(docs, ["lass"]).collect()}
    assert ww[1] is False
    sub = {r["doc_id"]: r["blocked"] for r in blocklist_filter(docs, ["lass"], whole_word=False).collect()}
    assert sub[1] is True
    removed = blocklist_filter(docs, ["banned"], mode="remove")
    assert sorted(r["doc_id"] for r in removed.collect()) == [1]
    import pytest as _pt
    with _pt.raises(ValueError, match="empty"):
        blocklist_filter(docs, [])


def test_deterministic_shuffle_addresses(spark):
    from csp_gateway_spark.operators.curation import deterministic_shuffle

    df = spark.createDataFrame([(i,) for i in range(1000)], "doc_id long")
    out = deterministic_shuffle(df, n_shards=8, seed=31)
    rows = [(r["doc_id"], r["shard"], r["pos"]) for r in out.collect()]
    again = [(r["doc_id"], r["shard"], r["pos"]) for r in deterministic_shuffle(df.repartition(16), n_shards=8, seed=31).collect()]
    assert sorted(rows) == sorted(again)  # partitioning-invariant addresses
    by_shard = {}
    for _d, s, p in rows:
        by_shard.setdefault(s, []).append(p)
    for s, ps in by_shard.items():
        assert sorted(ps) == list(range(len(ps)))  # dense 0..n-1 per shard
    assert len(by_shard) == 8
    # a different seed produces a different order
    other = [(r["doc_id"], r["shard"], r["pos"]) for r in deterministic_shuffle(df, n_shards=8, seed=99).collect()]
    assert sorted(rows) != sorted(other)


def test_unicode_normalize_composes(spark):
    from csp_gateway_spark.operators.text import unicode_normalize

    docs = spark.createDataFrame(
        [(1, "cafe\u0301 and \ufb01ne"), (2, None)], "doc_id long, text string"
    )
    nfc = {r["doc_id"]: r["text"] for r in unicode_normalize(docs, "NFC").collect()}
    assert nfc[1] == "caf\u00e9 and \ufb01ne"  # combining acute composed; ligature kept
    assert nfc[2] is None
    nfkc = {r["doc_id"]: r["text"] for r in unicode_normalize(docs, "NFKC").collect()}
    assert nfkc[1] == "caf\u00e9 and fine"  # compatibility fold expands the ligature
    import pytest as _pt
    with _pt.raises(ValueError, match="form"):
        unicode_normalize(docs, "NFX")


def test_vocab_coverage_oov_rates(spark):
    from csp_gateway_spark.operators.corpus import build_vocab, vocab_coverage

    docs = spark.createDataFrame(
        [
            (1, "alpha beta alpha beta", "known"),
            (2, "alpha qqq zzz www", "mixed"),
        ],
        "doc_id long, text string, source string",
    )
    vocab = build_vocab(docs, size=2)  # alpha + beta make the cut
    out = {r["source"]: r for r in vocab_coverage(docs, vocab).collect()}
    assert out["known"]["oov_tokens"] == 0 and out["known"]["oov_rate"] == 0.0
    assert out["mixed"]["oov_tokens"] == 3
    assert out["mixed"]["oov_rate"] == 0.75


def test_budget_mix_plan_and_apply(spark):
    """The plan hits the token budget in expectation and apply()
    realizes it: sampled token mass per source tracks target within
    hash-sampling noise; zero-weight sources drop entirely."""
    import pyspark.sql.functions as F

    from csp_gateway_spark.operators.curation import apply_budget_mix, budget_mix_plan

    rows = []
    for s, n in [("a", 200), ("b", 100), ("c", 50)]:
        for i in range(n):
            rows.append((len(rows), "tok " * 20, s))
    df = spark.createDataFrame(rows, "doc_id long, text string, source string")
    # a: 200 docs x 20 tokens = 4000; b: 2000; c: 1000
    plan = budget_mix_plan(df, {"a": 1.0, "b": 1.0}, budget_tokens=5000)
    p = {r.source: r for r in plan.collect()}
    assert p["a"].tokens == 4000 and p["b"].tokens == 2000
    assert abs(p["a"].rate - 2500 / 4000) < 1e-12
    assert abs(p["b"].rate - 2500 / 2000) < 1e-12   # > 1 -> 1 epoch + frac
    assert p["b"].epochs == 1 and abs(p["b"].frac - 0.25) < 1e-12
    assert p["c"].rate == 0.0

    out = apply_budget_mix(df, plan)
    got = {r["source"]: r["cnt"] for r in out.groupBy("source").agg(F.count(F.lit(1)).alias("cnt")).collect()}
    assert "c" not in got
    # a: expect 200*0.625 = 125 docs +- sampling noise
    assert 100 <= got["a"] <= 150
    # b: every doc once + ~25% twice -> 100..150
    assert 110 <= got["b"] <= 140
    # determinism: re-apply gives the identical multiset
    again = {r["source"]: r["cnt"] for r in apply_budget_mix(df, plan).groupBy("source").agg(F.count(F.lit(1)).alias("cnt")).collect()}
    assert again == got


def test_pack_batches_padding(spark):
    import pyspark.sql.functions as F

    from csp_gateway_spark.operators.curation import pack_batches, padding_stats

    rows = [(i, "t " * (10 + (i % 3))) for i in range(40)]  # lens 10..12 -> bucket 16
    rows += [(100 + i, "t " * 100) for i in range(5)]       # len 100 -> bucket 128
    df = spark.createDataFrame(rows, "doc_id long, text string")
    out = pack_batches(df, batch_size=8, n_shards=2)
    assert {r.bucket for r in out.collect()} == {16, 128}
    # deterministic: same assignment on re-run
    a = sorted((r.doc_id, r.bucket, r.shard, r.batch_id) for r in out.collect())
    b = sorted((r.doc_id, r.bucket, r.shard, r.batch_id) for r in pack_batches(df, batch_size=8, n_shards=2).collect())
    assert a == b
    st = padding_stats(out)
    # every batch's waste = n*max - sum and is non-negative, < n*max
    for r in st.collect():
        assert r.pad_waste == r.n_docs * r.max_len - r.sum_tokens >= 0
    # length-sorted packing: waste inside a full batch is tiny relative
    # to padding to the bucket edge
    total_waste = st.agg(F.sum("pad_waste")).first()[0]
    total_tokens = st.agg(F.sum("sum_tokens")).first()[0]
    assert total_waste < 0.2 * total_tokens


def test_boilerplate_ngrams_detects_template(spark):
    from csp_gateway_spark.operators.curation import boilerplate_ngrams

    docs = spark.createDataFrame(
        [
            (1, "subscribe now unique words one", "s1"),
            (2, "subscribe now different body here", "s1"),
            (3, "subscribe now third doc text", "s1"),
            (4, "no template in this one", "s1"),
            (5, "other source entirely", "s2"),
        ],
        "doc_id long, text string, source string",
    )
    rows = boilerplate_ngrams(docs, k=2, threshold=0.6).collect()
    got = {(r.source, r.ngram): (r.n_docs, round(r.share, 6)) for r in rows}
    assert got == {("s1", "subscribe now"): (3, 0.75)}
