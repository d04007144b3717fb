"""Wave-39 operators: RAKE keywords and TextRank-lite — validated
against in-test pure-python brute-force references over the SAME
normalization/stopword contract."""

import re

import pytest

from csp_gateway_spark.operators.corpus import rake_keywords, textrank_keywords
from csp_gateway_spark.operators.text import EN_STOPWORDS

DOCS = [
    (0, "Deep learning models need large training corpora. The training data "
        "quality drives model quality."),
    (1, "Training data deduplication improves deep learning generalization; "
        "the deduplication pipeline scans training corpora."),
    (2, "Model quality is limited by data quality and by training data "
        "coverage of the target domain."),
    (3, "A scalable deduplication pipeline for large corpora: minhash "
        "signatures, band buckets, and graph clustering."),
]


def _norm_runs(text):
    toks = [t for t in re.split(r"[^a-z0-9]+", text.lower()) if t]
    runs, cur = [], []
    for t in toks:
        if t in EN_STOPWORDS:
            if cur:
                runs.append(cur)
            cur = []
        else:
            cur.append(t)
    if cur:
        runs.append(cur)
    return runs


def _rake_brute(docs, max_len=4):
    phrases = []
    for _, text in docs:
        for run in _norm_runs(text):
            if len(run) <= max_len:
                phrases.append(run)
    freq, deg = {}, {}
    for p in phrases:
        for w in p:
            freq[w] = freq.get(w, 0) + 1
            deg[w] = deg.get(w, 0) + len(p)
    out = {}
    for p in phrases:
        key = " ".join(p)
        score = sum(deg[w] / freq[w] for w in p)
        n, _ = out.get(key, (0, 0.0))
        out[key] = (n + 1, score)
    return out


def test_rake_brute_force(spark):
    df = spark.createDataFrame(DOCS, "doc_id int, text string")
    rows = rake_keywords(df, topk=100).collect()
    ref = _rake_brute(DOCS)
    assert len(rows) == len(ref)
    for r in rows:
        n, score = ref[r["phrase"]]
        assert r["n"] == n
        assert r["score"] == pytest.approx(score, rel=1e-9)
    # ranking: top phrase has the max score
    top = max(ref.items(), key=lambda kv: (kv[1][1], kv[1][0], ))
    assert rows[0]["score"] == pytest.approx(
        max(v[1] for v in ref.values()), rel=1e-9
    )


def test_rake_max_phrase_len(spark):
    df = spark.createDataFrame(
        [(0, "alpha beta gamma delta epsilon zeta")], "doc_id int, text string"
    )
    rows = rake_keywords(df, topk=10, max_phrase_len=4).collect()
    assert rows == []  # single 6-word run exceeds the cap


def test_textrank_brute_force(spark):
    df = spark.createDataFrame(DOCS, "doc_id int, text string")
    rows = textrank_keywords(df, topk=100, iters=2).collect()
    # brute force: undirected weighted graph of adjacent pairs
    edges = {}
    for _, text in DOCS:
        for run in _norm_runs(text):
            for a, b in zip(run, run[1:]):
                if a == b:
                    continue
                edges[(a, b)] = edges.get((a, b), 0) + 1
                edges[(b, a)] = edges.get((b, a), 0) + 1
    nodes = sorted({a for a, _ in edges})
    out = {w: sum(v for (a, _), v in edges.items() if a == w) for w in nodes}
    n = len(nodes)
    r = {w: 1.0 / n for w in nodes}
    for _ in range(2):
        nr = {}
        for w in nodes:
            inc = sum(
                r[a] / out[a] * v for (a, b), v in edges.items() if b == w
            )
            nr[w] = 0.15 / n + 0.85 * inc
        r = nr
    got = {row["w"]: row["rank"] for row in rows}
    assert set(got) == set(nodes)
    for w in nodes:
        assert got[w] == pytest.approx(r[w], rel=1e-9), w
    # hub words (training/data/quality) should outrank leaf words
    assert got["training"] > got["minhash"]


def test_textrank_invalid_iters(spark):
    df = spark.createDataFrame([(0, "a b")], "doc_id int, text string")
    with pytest.raises(ValueError):
        textrank_keywords(df, iters=0)
