"""URL canonicalization / dedup / domain-stats edge cases."""

import pyspark.sql.functions as F

from csp_gateway_spark.operators.web import (
    canonical_url,
    domain_stats,
    registered_domain,
    url_dedup,
    url_host,
)


def _canon(spark, urls):
    df = spark.createDataFrame([(i, u) for i, u in enumerate(urls)], "doc_id long, url string")
    return [r.c for r in df.orderBy("doc_id").select(canonical_url(F.col("url")).alias("c")).collect()]


def test_canonicalization_rules(spark):
    got = _canon(
        spark,
        [
            "HTTP://WWW.Example.COM:80/A/B/?utm_source=x&b=2&a=1#frag",
            "https://example.com/A/B?a=1&b=2",
            "https://example.com",
            "http://example.com:8080/x/",  # non-default port kept
            "https://example.com/CaseSensitive/Path",
            "https://example.com/?fbclid=zzz&gclid=yyy&ref=tw",
        ],
    )
    assert got[0] == "http://example.com/A/B?a=1&b=2"
    assert got[1] == got[0].replace("http://", "https://")
    assert got[2] == "https://example.com/"
    assert got[3] == "http://example.com:8080/x"
    assert got[4] == "https://example.com/CaseSensitive/Path"  # path case preserved
    assert got[5] == "https://example.com/"


def test_registered_domain_second_level(spark):
    df = spark.createDataFrame(
        [
            (0, "https://a.b.Sample.CO.UK/x"),
            (1, "https://www.news.example.com/y"),
            (2, "https://example.org/"),
        ],
        "doc_id long, url string",
    )
    rows = df.orderBy("doc_id").select(
        url_host(F.col("url")).alias("h"), registered_domain(F.col("url")).alias("d")
    ).collect()
    assert [(r.h, r.d) for r in rows] == [
        ("a.b.sample.co.uk", "sample.co.uk"),
        ("news.example.com", "example.com"),
        ("example.org", "example.org"),
    ]


def test_url_dedup_first_wins(spark):
    df = spark.createDataFrame(
        [
            (5, "https://www.example.com/p?utm_source=a"),
            (2, "HTTPS://EXAMPLE.COM/p/"),
            (9, "https://example.com/p#x"),
            (7, "https://example.com/other"),
        ],
        "doc_id long, url string",
    )
    rows = {r.canon_url: (r.keep_id, r.n_dups) for r in url_dedup(df).collect()}
    assert rows["https://example.com/p"] == (2, 3)
    assert rows["https://example.com/other"] == (7, 1)


def test_domain_stats(spark):
    df = spark.createDataFrame(
        [
            (0, "https://a.example.com/1"),
            (1, "https://b.example.com/1"),
            (2, "https://b.example.com/1/"),  # same canon as row 1
            (3, "https://x.sample.co.uk/z"),
        ],
        "doc_id long, url string",
    )
    rows = {r.domain: (r.n_docs, r.n_urls) for r in domain_stats(df).collect()}
    assert rows["example.com"] == (3, 2)
    assert rows["sample.co.uk"] == (1, 1)


def test_source_drift_detects_skew(spark):
    from csp_gateway_spark.operators.corpus import source_drift

    base = "alpha beta gamma delta " * 10
    rows = [(i, base, "same") for i in range(20)]
    rows += [(100 + i, "zzz yyy xxx www " * 10, "skewed") for i in range(5)]
    rows += [(200 + i, base, "same2") for i in range(20)]
    df = spark.createDataFrame(rows, "doc_id long, text string, source string")
    out = {r.source: r for r in source_drift(df, top_v=8).collect()}
    assert set(out) == {"same", "skewed", "same2"}
    for r in out.values():
        assert r.kl >= 0.0
    # sources matching the corpus distribution sit near zero; the
    # skewed source is far away
    assert out["skewed"].kl > 10 * max(out["same"].kl, out["same2"].kl)
    assert out["same"].n_tokens == 20 * 40
    # top_v=8 covers the 8 distinct tokens -> no OOV anywhere
    assert all(r.oov_rate == 0.0 for r in out.values())


def test_gopher_rules_adversarial(spark):
    from csp_gateway_spark.operators.text import gopher_stats

    good = ("the quick brown fox and that dog have fun with everything " * 6).strip()
    docs = [
        (0, good),                                   # passes all rules
        (1, "short doc"),                            # too few words
        (2, "#" * 40 + " " + good),                  # symbol ratio blown
        (3, "\n".join("- bullet line %d" % i for i in range(10))),  # all bullets
        (4, ("zz " * 60).strip()),                   # no stopwords
        (5, None),                                   # null text
    ]
    df = spark.createDataFrame(docs, "doc_id long, text string")
    out = {r.doc_id: r for r in gopher_stats(df).collect()}
    assert out[0].gopher_keep == 1
    assert out[1].gopher_keep == 0 and out[1].n_words == 2
    assert out[2].gopher_keep == 0 and out[2].symbol_ratio > 0.1
    assert out[3].gopher_keep == 0 and out[3].bullet_line_frac == 1.0
    assert out[4].gopher_keep == 0 and out[4].stopword_hits == 0
    assert out[5].gopher_keep == 0 and out[5].n_words == 0


def test_c4_rules_adversarial(spark):
    from csp_gateway_spark.operators.text import c4_stats

    docs = [
        (0, "First sentence. Second one! Third one? All terminal."),
        (1, "function() { return 1; }"),             # brace -> drop
        (2, "Lorem Ipsum dolor sit amet. Yes. Ok."), # lorem -> drop
        (3, "Enable JavaScript to view\nA real line."),
        (4, "no terminal punctuation at all"),
    ]
    df = spark.createDataFrame(docs, "doc_id long, text string")
    out = {r.doc_id: r for r in c4_stats(df).collect()}
    assert out[0].c4_keep == 1 and out[0].n_sentences == 4
    assert out[1].c4_keep == 0 and out[1].has_brace == 1
    assert out[2].c4_keep == 0 and out[2].has_lorem == 1
    assert out[3].js_line_frac == 0.5
    assert out[4].c4_keep == 0 and out[4].terminal_line_frac == 0.0


def test_lm_backoff_levels(spark):
    """Each backoff level must engage: exact trigram, bigram backoff,
    unigram backoff, OOV floor — and ppl must rank train-like text
    ahead of unseen text."""
    import math

    from csp_gateway_spark.operators.corpus import lm_score_backoff

    train = spark.createDataFrame(
        [(100, "a b c d"), (101, "a b c e")], "doc_id long, text string"
    )
    score = spark.createDataFrame(
        [
            (0, "a b c"),    # trigram seen: S = c(abc)/c(ab) = 1/2
            (1, "d a b"),    # trigram unseen, bigram (a b) seen: 0.5*c(ab)/c(a)=0.5*2/2... third word is b: S(b|d a)-> bigram (a,b): 0.5 * c(ab)/c(a)
            (2, "x y a"),    # only unigram a seen: 0.25*c(a)/N
            (3, "x y z"),    # OOV floor: 0.25*0.5/N
        ],
        "doc_id long, text string",
    )
    out = {r.doc_id: r for r in lm_score_backoff(score, train).collect()}
    N = 8.0  # train tokens
    # exact values per the formula:
    assert abs(out[0].avg_logs - math.log(2 / 2)) < 1e-9        # c(abc)=2, c(ab)=2
    assert abs(out[1].avg_logs - math.log(0.5 * 2 / 2)) < 1e-9  # c(ab)=2, c(a)=2
    assert abs(out[2].avg_logs - math.log(0.25 * 2 / N)) < 1e-9 # c(a)=2
    assert abs(out[3].avg_logs - math.log(0.25 * 0.5 / N)) < 1e-9
    # ranking: seen text has lower perplexity than OOV text
    assert out[0].ppl < out[2].ppl < out[3].ppl


def test_pii_report_and_mask_roundtrip(spark):
    """pii_report counts each class; after mask_pii the email/phone
    classes drop to zero (the regression gate use-case)."""
    from csp_gateway_spark.operators.text import mask_pii, pii_report

    docs = [
        (0, "mail me at a.b+c@test.org or x@y.io", "s"),
        (1, "call +44 (0)20 7946 0958 today", "s"),
        (2, "server at 10.0.0.1 and card 4111111111111111", "s"),
        (3, "nothing sensitive here", "s"),
    ]
    df = spark.createDataFrame(docs, "doc_id long, text string, source string")
    r = pii_report(df).collect()[0]
    # the 16-digit card run also matches the phone digit-run pattern
    # (classes overlap by design; each reports its own occurrences)
    assert (r.emails, r.phones, r.ipv4s, r.card_like) == (2, 2, 1, 1)
    assert r.docs_with_pii == 3
    masked = df.select("doc_id", mask_pii(__import__("pyspark.sql.functions", fromlist=["col"]).col("text")).alias("text"), "source")
    r2 = pii_report(masked).collect()[0]
    assert r2.emails == 0 and r2.phones == 0
