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


def test_web_curation_pipeline_runs_and_filters(spark):
    import sys

    sys.path.insert(0, "examples")
    from examples.web_curation import run_pipeline

    stages = run_pipeline(spark, "/root/testdata/sf0.001")
    n0 = stages["crawl"].count()
    n_url = stages["after_url"].count()
    n_final = stages["after_novel"].count()
    assert 0 < n_final <= n_url <= n0
    # reports materialize
    assert stages["pii"].count() > 0
    assert stages["drift"].count() > 0
    assert stages["plan"].count() > 0
    # determinism: a re-run keeps the identical survivor set
    again = run_pipeline(spark, "/root/testdata/sf0.001")
    a = sorted(r.doc_id for r in stages["after_novel"].select("doc_id").collect())
    b = sorted(r.doc_id for r in again["after_novel"].select("doc_id").collect())
    assert a == b


def test_product_analytics_dashboard(spark, sf_dir):
    """Every panel materializes with rows and a second run is
    identical (determinism — no RNG, tie-broken windows)."""
    from examples.product_analytics import run_dashboard

    panels = run_dashboard(spark, sf_dir)
    assert set(panels) >= {
        "funnel", "transitions", "retention", "pareto", "vwap", "benford",
    }
    counts = {k: df.count() for k, df in panels.items()}
    assert all(n > 0 for n in counts.values()), counts
    # determinism spot-check on two order-sensitive panels
    for name in ("basket", "daily_top_users"):
        a = [tuple(r) for r in panels[name].collect()]
        b = [tuple(r) for r in run_dashboard(spark, sf_dir)[name].collect()]
        assert a == b
    # the clean TPC-H relation audits zero orphans
    (fk,) = panels["fk_audit"].collect()
    assert fk.n_orphans == 0
