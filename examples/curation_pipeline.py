"""End-to-end LLM training-data curation pipeline — every stage is one
of this repo's oracle-checked operators, composed the way a 100 TB
pretraining run would chain them.  (Additive surface, SURVEY §7.8: the
reference gateway has no data-curation layer; this is the
training-pipeline face of the engine.)

    raw documents
      → quality filter        (length / punctuation / stopword gates)
      → exact dedup           (normalized-hash groupBy)
      → substring dedup       (repeated-k-gram span masking)
      → MinHash near-dedup    (LSH bands → verified pairs → components,
                               keep lowest-id representative)
      → decontamination       (Bloom-filter broadcast probe vs eval set)
      → temperature mixing    (n^alpha source smoothing)
      → train/val/test split  (hash-bucket projection)
      → sequence packing      (per-shard greedy token packing)
      → BPE tokenizer train   (distributed merge rounds on the result)

Every stage is deterministic (seeded hashes, no RNG state), so the
whole pipeline is resumable and reproducible: re-running any suffix on
the same inputs yields byte-identical outputs — the property that
makes a 100 TB run restartable after a partial failure.

Run: python examples/curation_pipeline.py [sf_dir]
"""

from __future__ import annotations

import sys

sys.path.insert(0, __file__.rsplit("/", 2)[0])

from pyspark.sql import functions as F  # noqa: E402


def run_pipeline(spark, sf_dir: str, verbose: bool = True):
    """Returns {stage_name: DataFrame} of every intermediate stage —
    lazily defined; nothing executes until an action is taken."""
    from csp_gateway_spark.operators.corpus import connected_components
    from csp_gateway_spark.operators.curation import (
        decontaminate,
        mix_fractions,
        pack_sequences,
        temperature_mix,
        train_split,
    )
    from csp_gateway_spark.operators.curation import bloom_decontaminate
    from csp_gateway_spark.operators.dedup import (
        drop_repeated_spans,
        exact_dedup,
        minhash_lsh_pairs,
    )
    from csp_gateway_spark.operators.text import length_quantiles, quality_filter
    from csp_gateway_spark.session import load_tables

    docs = load_tables(spark, sf_dir)["documents"]
    stages = {"raw": docs}

    # 1. quality gates — native expressions, scan-speed
    quality = quality_filter(docs).filter(F.col("keep")).drop("keep", "reason")
    stages["quality"] = quality

    # 2. exact dedup — keep the lowest doc_id per normalized hash
    survivors = exact_dedup(quality).select("doc_id")
    exact = quality.join(F.broadcast(survivors), "doc_id", "left_semi")
    stages["exact_dedup"] = exact

    # 2b. exact substring dedup: mask corpus-repeated 8-gram spans
    #     (Lee et al. 2022) before the fuzzy pass — repeated boilerplate
    #     would otherwise glue unrelated docs into one LSH component
    masked = (
        drop_repeated_spans(exact, k=8)
        .withColumnRenamed("text", "masked_text")
        .join(exact.drop("text"), "doc_id")
        .withColumnRenamed("masked_text", "text")
        .filter(F.length("text") > 0)
    )
    stages["substring_dedup"] = masked

    # 3. MinHash LSH near-dedup: verified pairs → dup components →
    #    drop everything that is not its component's representative
    pairs = minhash_lsh_pairs(masked, jaccard_threshold=0.5).select("id_a", "id_b")
    comps = connected_components(pairs)
    losers = comps.filter(F.col("node") != F.col("component")).select(
        F.col("node").alias("doc_id")
    )
    near = masked.join(F.broadcast(losers), "doc_id", "left_anti")
    stages["near_dedup"] = near

    # 4. decontaminate vs a held-out eval sample (here: a deterministic
    #    slice standing in for the real eval set)
    eval_set = docs.filter(F.col("doc_id") % 97 == 0).select("doc_id", "text")
    clean = bloom_decontaminate(near, eval_set, mode="remove")
    stages["decontaminated"] = clean

    # 5. temperature-smooth the language mixture (α=0.5)
    fr = mix_fractions(clean, "lang", alpha=0.5).withColumn("frac", F.round("frac", 12))
    mixed = temperature_mix(clean, "lang", fractions=fr)
    stages["mixed"] = mixed

    # 6. deterministic train/val/test split
    split = train_split(mixed, weights={"train": 0.9, "val": 0.05, "test": 0.05})
    stages["split"] = split

    # 7. pack the train split into fixed-token sequence slots
    train = split.filter(F.col("split") == "train")
    packed = pack_sequences(train, budget_tokens=512)
    stages["packed"] = packed

    # 8. tokenizer bootstrap on the final corpus: length budget check +
    #    the first BPE merge rules (both deterministic, both reusable
    #    as-is on the full-scale run)
    stages["length_budget"] = length_quantiles(train, group_col="lang")
    from csp_gateway_spark.operators.corpus import bpe_train

    stages["bpe_merges"] = bpe_train(train, n_merges=8)

    if verbose:
        for name, df in stages.items():
            print(f"{name:>14}: {df.count():>6} rows")
    return stages


if __name__ == "__main__":
    from csp_gateway_spark.session import get_spark

    sf = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    spark = get_spark("curation-pipeline")
    spark.sparkContext.setLogLevel("ERROR")
    run_pipeline(spark, sf)
