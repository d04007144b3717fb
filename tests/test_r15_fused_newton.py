"""r15: `_cox_newton(fused=True)` chains the Newton steps lazily into
two actions (β checkpoint + eval checkpoint) instead of two eager
checkpoints per step.  The arithmetic per stage is identical, so the
fused and eager paths must agree BIT-EXACTLY on both the β frame and
the per-event-time evaluation frame."""

from pyspark.sql import functions as F


def _cohort(spark, sf_dir):
    import __spark_entry__ as entry

    return entry._cox_cohort(spark, sf_dir)


def test_fused_newton_bit_identical_to_eager(spark, sf_dir):
    from csp_gateway_spark.operators.analytics import _cox_newton

    df = _cohort(spark, sf_dir)
    f_eager, b_eager = _cox_newton(df, "dur", "event", "x", 3, fused=False)
    f_fused, b_fused = _cox_newton(df, "dur", "event", "x", 3, fused=True)
    assert b_fused.collect() == b_eager.collect()
    key = [r for r in f_eager.columns]
    ea = sorted(tuple(r) for r in f_eager.select(*key).collect())
    fu = sorted(tuple(r) for r in f_fused.select(*key).collect())
    assert fu == ea


def test_fused_newton_empty_input_keeps_one_row_beta(spark):
    from csp_gateway_spark.operators.analytics import _cox_newton

    empty = spark.createDataFrame([], "dur long, event int, x double")
    final, beta = _cox_newton(empty, "dur", "event", "x", 2, fused=True)
    rows = beta.collect()
    assert len(rows) == 1 and rows[0]["_beta"] == 0.0
    assert final.count() == 0
