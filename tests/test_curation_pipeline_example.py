"""The end-to-end curation pipeline example: every stage an
oracle-checked operator, deterministic and monotone."""

import sys

sys.path.insert(0, __file__.rsplit("/", 2)[0])


def _counts(spark, sf_dir):
    from examples.curation_pipeline import run_pipeline

    return {k: df.count() for k, df in run_pipeline(spark, sf_dir, verbose=False).items()}


def test_pipeline_monotone_and_deterministic(spark, sf_dir):
    c = _counts(spark, sf_dir)
    order = ["raw", "quality", "exact_dedup", "near_dedup", "decontaminated", "mixed"]
    for a, b in zip(order, order[1:]):
        assert c[b] <= c[a], (a, b, c)
    assert c["split"] == c["mixed"]  # split only labels, never drops
    assert c["packed"] <= c["split"]
    assert c["mixed"] > 0
    # deterministic: second run is identical (hash samplers, no RNG)
    assert _counts(spark, sf_dir) == c
