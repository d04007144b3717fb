"""Web-crawl curation pipeline — the round-4 operator wave composed
end-to-end the way a crawl-to-corpus run chains them (additive
surface, SURVEY §7.8; every stage is an oracle-checked operator):

    crawl records (url, text, source)
      → URL dedup             (canonicalize → first-occurrence keep)
      → Gopher rule filter    (word/line statistics gates)
      → C4 rule filter        (boilerplate flags, sentence count)
      → bag dedup             (sorted-token-multiset fingerprint —
                               catches sentence-reordered copies)
      → novelty floor         (drop docs whose k-grams are ~all
                               duplicated elsewhere)
      → PII report            (release compliance numbers)
      → drift report          (per-source KL vs the accepted corpus)
      → budget mix            (token budget → per-source rates)
      → batch packing         (pow-2 length buckets, padding stats)

Deterministic end to end (seeded hashes, no RNG), so any suffix is
resumable and re-runs are byte-identical.

Run: python examples/web_curation.py [sf_dir]
"""

from __future__ import annotations

import sys

sys.path.insert(0, __file__.rsplit("/", 2)[0])

from pyspark.sql import functions as F  # noqa: E402


def run_pipeline(spark, sf_dir: str):
    """Returns {stage: DataFrame}, lazily defined."""
    from csp_gateway_spark.operators.curation import (
        apply_budget_mix,
        budget_mix_plan,
        pack_batches,
        padding_stats,
    )
    from csp_gateway_spark.operators.corpus import source_drift
    from csp_gateway_spark.operators.dedup import bag_dedup, ngram_novelty
    from csp_gateway_spark.operators.text import c4_stats, gopher_stats, pii_report
    from csp_gateway_spark.operators.web import url_dedup

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    # synthesize crawl URLs for the demo corpus (deterministic)
    crawl = docs.withColumn(
        "url",
        F.concat(
            F.lit("https://"),
            F.col("source"),
            F.lit(".example.com/doc/"),
            (F.col("doc_id") % 200).cast("string"),
        ),
    )

    url_keep = url_dedup(crawl).select(F.col("keep_id").alias("doc_id"))
    after_url = crawl.join(F.broadcast(url_keep), "doc_id")

    gop = gopher_stats(after_url).filter(F.col("n_words") >= 20)  # demo-length corpus
    c4 = c4_stats(after_url)
    rule_keep = gop.select("doc_id").join(
        c4.filter(F.col("has_lorem") == 0).select("doc_id"), "doc_id"
    )
    after_rules = after_url.join(F.broadcast(rule_keep), "doc_id")

    bag_keep = bag_dedup(after_rules).select(F.col("keep_id").alias("doc_id"))
    after_bag = after_rules.join(F.broadcast(bag_keep), "doc_id")

    novelty = ngram_novelty(after_bag, k=8)
    after_novel = after_bag.join(
        novelty.filter(F.col("novelty") > 0.05).select("doc_id"), "doc_id"
    )

    pii = pii_report(after_novel)
    drift = source_drift(after_novel, top_v=256)

    plan = budget_mix_plan(
        after_novel,
        {s: 1.0 for s in [r["source"] for r in after_novel.select("source").distinct().collect()]},
        budget_tokens=50_000,
    )
    mixed = apply_budget_mix(after_novel, plan)

    batches = pack_batches(mixed.withColumn("doc_id", F.monotonically_increasing_id()), batch_size=16)
    padding = padding_stats(batches)

    return {
        "crawl": crawl,
        "after_url": after_url,
        "after_rules": after_rules,
        "after_bag": after_bag,
        "after_novel": after_novel,
        "pii": pii,
        "drift": drift,
        "plan": plan,
        "mixed": mixed,
        "padding": padding,
    }


def main() -> None:
    from csp_gateway_spark.session import get_spark

    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
    spark = get_spark("web-curation")
    spark.sparkContext.setLogLevel("ERROR")
    stages = run_pipeline(spark, sf_dir)
    n0 = stages["crawl"].count()
    for name in ["after_url", "after_rules", "after_bag", "after_novel", "mixed"]:
        print(f"{name:>12}: {stages[name].count()} docs (from {n0})")
    print("pii:", [r.asDict() for r in stages["pii"].limit(3).collect()])
    print("padding waste:", stages["padding"].agg(F.sum("pad_waste")).first()[0])


if __name__ == "__main__":
    main()
