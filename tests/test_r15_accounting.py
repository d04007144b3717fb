"""r15 bench accounting (VERDICT r14 #1): `reset_shared` must drop
every materialized shared intermediate (so the first consumer after a
reset rebuilds it from the parquet inputs, paying the build inside the
bench's timed region), keep the plan-only spread entries, log each
outermost build's wall time exactly once, and rebuild bit-identical
values."""

import pytest


def _rows(df):
    return [tuple(r) for r in df.collect()]


def test_reset_drops_materialized_keeps_spread_plans(spark, sf_dir):
    import __spark_entry__ as entry

    entry.reset_shared(keep_plans=False)
    entry._ts(spark, sf_dir, "lineitem")  # spread plan entry
    entry._survival_steps(spark, sf_dir)  # materialized entry
    app = spark.sparkContext.applicationId
    assert (app, sf_dir, "spread:lineitem") in entry._SHARED_MEMO
    assert (app, sf_dir, "survival_steps") in entry._SHARED_MEMO

    entry.reset_shared()
    assert (app, sf_dir, "spread:lineitem") in entry._SHARED_MEMO
    assert (app, sf_dir, "survival_steps") not in entry._SHARED_MEMO
    assert entry.shared_build_sec() == 0.0


def test_build_log_times_outermost_build_once(spark, sf_dir):
    import __spark_entry__ as entry

    entry.reset_shared()
    # _cox_fit nests _cox_cells: only the OUTERMOST build may be
    # logged, so the log total never double-counts nested builds.
    entry._cox_fit(spark, sf_dir)
    names = [n for n, _ in entry._SHARED_BUILD_LOG]
    assert names == ["cox_fit"]
    assert entry.shared_build_sec() > 0.0
    # second consumer is a memo hit: nothing new logged
    entry._cox_cells(spark, sf_dir)
    assert len(entry._SHARED_BUILD_LOG) == 1


def test_rebuild_after_reset_is_bit_identical(spark, sf_dir):
    import __spark_entry__ as entry

    entry.reset_shared()
    before = _rows(entry._survival_steps(spark, sf_dir).orderBy("_t"))
    entry.reset_shared()
    after = _rows(entry._survival_steps(spark, sf_dir).orderBy("_t"))
    assert before == after
    assert [n for n, _ in entry._SHARED_BUILD_LOG] == ["survival_steps"]
