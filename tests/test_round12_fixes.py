"""Round-12 hardening: AQE-off bounded jobs on a dedicated session
clone (no shared-conf mutation race), directed assortativity degree
tables, spearman NULL consistency, conformal honest coverage, and
hits() input validation."""

import hashlib
import math
import threading

import pytest
from pyspark.sql import functions as F


# --- bounded session (session.py) -------------------------------------------


def test_bounded_session_memoized_and_idempotent(spark):
    from csp_gateway_spark.session import bounded_session

    bs1 = bounded_session(spark)
    bs2 = bounded_session(spark)
    assert bs1 is bs2
    assert bounded_session(bs1) is bs1
    assert bs1 is not spark
    assert bs1.conf.get("spark.sql.adaptive.enabled") == "false"
    # the parent's conf is untouched
    assert spark.conf.get("spark.sql.adaptive.enabled") == "true"
    # planning-relevant runtime confs are carried over AT CREATION
    # (a later runtime change on the parent — e.g. the streaming
    # gates' replay-scoped shuffle-partition tuning — deliberately
    # does not retro-propagate, so only assert the stable ones)
    assert bs1.conf.get("spark.sql.shuffle.partitions") is not None
    assert bs1.conf.get("spark.sql.session.timeZone") == "UTC"


def test_run_bounded_rebinds_to_caller_session(spark):
    from csp_gateway_spark.session import run_bounded

    out = (
        spark.range(1000)
        .groupBy((F.col("id") % 3).alias("k"))
        .agg(F.sum("id").alias("s"))
    )
    got = run_bounded(out)
    assert got.sparkSession is spark
    assert sorted((r["k"], r["s"]) for r in got.collect()) == sorted(
        (r["k"], r["s"]) for r in out.collect()
    )
    # joinable with frames of the caller's session (materialized rows)
    assert got.join(spark.range(3).withColumnRenamed("id", "k"), "k").count() == 3


def test_bounded_finalize_never_flips_main_session_aqe(spark):
    """The round-11 race: _finalize_bounded/spearman/bootstrap used to
    toggle spark.sql.adaptive.enabled on the SHARED session.  A poller
    thread must never observe the main session with AQE off while the
    bounded operators run."""
    from csp_gateway_spark.operators.analytics import (
        bootstrap_mean_ci,
        spearman_corr,
    )

    df = spark.range(20000).select(
        F.col("id"),
        (F.col("id") % 97).cast("double").alias("y"),
        (F.pmod(F.col("id") * 7, F.lit(131))).cast("double").alias("z"),
    )
    flips = []
    stop = threading.Event()

    def poll():
        while not stop.is_set():
            v = spark.conf.get("spark.sql.adaptive.enabled")
            if v != "true":
                flips.append(v)

    t = threading.Thread(target=poll)
    t.start()
    try:
        bootstrap_mean_ci(df, "id", "y", reps=8).collect()
        spearman_corr(df, "y", "z").collect()
    finally:
        stop.set()
        t.join()
    assert flips == []
    assert spark.conf.get("spark.sql.adaptive.enabled") == "true"


# --- spearman NULL consistency (ADVICE r11) ----------------------------------


def test_spearman_nulls_use_pairwise_complete_rows(spark):
    from csp_gateway_spark.operators.analytics import spearman_corr

    complete = [(1.0, 2.0), (2.0, 1.0), (3.0, 4.0), (4.0, 8.0), (5.0, 3.0)]
    with_nulls = complete + [(None, 5.0), (7.0, None), (None, None)]
    d_c = spark.createDataFrame(complete, "a double, b double")
    d_n = spark.createDataFrame(with_nulls, "a double, b double")
    r_c = spearman_corr(d_c, "a", "b").collect()[0]
    r_n = spearman_corr(d_n, "a", "b").collect()[0]
    assert r_n.n == r_c.n == 5
    assert r_n.rho == pytest.approx(r_c.rho, abs=1e-12)


def test_spearman_empty_and_all_null_one_row(spark):
    from csp_gateway_spark.operators.analytics import spearman_corr

    empty = spark.createDataFrame([], "a double, b double")
    rows = spearman_corr(empty, "a", "b").collect()
    assert len(rows) == 1 and rows[0].n == 0 and rows[0].rho is None
    allnull = spark.createDataFrame([(None, 1.0), (2.0, None)], "a double, b double")
    rows = spearman_corr(allnull, "a", "b").collect()
    assert len(rows) == 1 and rows[0].n == 0 and rows[0].rho is None


# --- directed assortativity (ADVICE r11, medium) ------------------------------


def test_assortativity_directed_in_degree_and_no_dropped_edges(spark):
    from csp_gateway_spark.operators.corpus import degree_assortativity

    # a->b, b->c, a->c: out-deg a=2, b=1; in-deg b=1, c=2.
    # pairs (out(src), in(dst)) = (2,1), (1,2), (2,2) -> r = -0.5
    edges = spark.createDataFrame(
        [("a", "b"), ("b", "c"), ("a", "c")], "id_a string, id_b string"
    )
    r = degree_assortativity(edges, directed=True).collect()[0]
    assert r.n_edges == 3
    assert r.r == pytest.approx(-0.5, abs=1e-12)


def test_assortativity_directed_sink_destination_kept(spark):
    from csp_gateway_spark.operators.corpus import degree_assortativity

    # the ADVICE repro: a->b, c->b (b is a pure sink).  The old
    # out-degree-only join dropped BOTH edges (n_edges=0); the fix
    # keeps them: pairs (1,2),(1,2) -> zero variance -> r NULL.
    edges = spark.createDataFrame(
        [("a", "b"), ("c", "b")], "id_a string, id_b string"
    )
    r = degree_assortativity(edges, directed=True).collect()[0]
    assert r.n_edges == 2
    assert r.r is None


def test_assortativity_undirected_unchanged(spark):
    from csp_gateway_spark.operators.corpus import degree_assortativity

    # star K_{1,3} symmetrized: r = -1
    edges = spark.createDataFrame(
        [("h", "a"), ("h", "b"), ("h", "c")], "id_a string, id_b string"
    )
    r = degree_assortativity(edges, directed=False).collect()[0]
    assert r.n_edges == 6
    assert r.r == pytest.approx(-1.0, abs=1e-12)


# --- conformal honest coverage (ADVICE r11) -----------------------------------


def _half(i: int) -> int:
    # mirror analytics._hash28(id, seed=0) % 2
    return int(hashlib.md5(f"0:{i}".encode()).hexdigest()[:7], 16) % 2


def test_conformal_counts_unpredictable_test_rows(spark):
    from csp_gateway_spark.operators.analytics import conformal_interval

    # group "solo" exists ONLY in the test half (ids picked by hash):
    # its rows have no calibration median -> NULL residual -> kept in
    # the denominator as uncovered, counted in n_test_dropped.
    solo_ids = [i for i in range(100000, 200000) if _half(i) == 1][:25]
    rows = [(i, "g", float(i % 100)) for i in range(2000)]
    rows += [(i, "solo", 42.0) for i in solo_ids]
    df = spark.createDataFrame(rows, "id long, g string, y double")
    r = conformal_interval(df, "id", "g", "y", alpha=0.10).collect()[0]
    assert r.n_test_dropped == len(solo_ids)
    # denominator includes the dropped rows
    n_test_g = sum(1 for i in range(2000) if _half(i) == 1)
    assert r.n_test == n_test_g + len(solo_ids)
    # coverage is depressed accordingly but computed, not NULL
    assert r.coverage is not None and r.coverage < 1.0


def test_conformal_empty_calibration_yields_one_null_row(spark):
    from csp_gateway_spark.operators.analytics import conformal_interval

    # every row in the test half -> calibration empty -> ONE row with
    # NULL q_hat, never zero rows
    ids = [i for i in range(100000, 200000) if _half(i) == 1][:40]
    df = spark.createDataFrame(
        [(i, "g", 1.0) for i in ids], "id long, g string, y double"
    )
    out = conformal_interval(df, "id", "g", "y", alpha=0.10).collect()
    assert len(out) == 1
    r = out[0]
    assert r.q_hat is None and r.n_test == len(ids)
    assert r.n_test_dropped == len(ids)


def test_conformal_no_unseen_groups_drops_zero(spark):
    from csp_gateway_spark.operators.analytics import conformal_interval

    rows = [(i, "g", float(i % 100)) for i in range(4000)]
    df = spark.createDataFrame(rows, "id long, g string, y double")
    r = conformal_interval(df, "id", "g", "y", alpha=0.10).collect()[0]
    assert r.n_test_dropped == 0
    assert 0.85 <= r.coverage <= 0.95


# --- hits validation (ADVICE r11) ---------------------------------------------


def test_hits_rejects_bad_iters(spark):
    from csp_gateway_spark.operators.corpus import hits

    edges = spark.createDataFrame([("a", "b")], "id_a string, id_b string")
    with pytest.raises(ValueError, match="iters"):
        hits(edges, iters=0)
    with pytest.raises(ValueError, match="iters"):
        hits(edges, iters=-3)
    with pytest.raises(ValueError, match="decimal"):
        hits(edges, iters=19)


# --- bounded-contract errors surface as structured 4xx ------------------------


def test_contract_guard_maps_to_422(spark):
    """A raise_error contract guard firing mid-collect must surface as
    a 422 with the operator's quantize-first message, never a 500/404."""
    from pyspark.sql import types as T

    from csp_gateway_spark.catalog import ChannelCatalog
    from csp_gateway_spark.serving.app import ApiError, GatewayApi

    cat = ChannelCatalog(spark)
    cat.declare("t", T.StructType([T.StructField("v", T.LongType())]))
    api = GatewayApi(cat)
    msg = (
        "hodges_lehmann: pair-cell space 4000000 exceeds max_cells"
        "=2000000 - quantize the values first"
    )
    guarded = spark.range(5).select(
        F.when(F.col("id") > 2, F.raise_error(F.lit(msg)))
        .otherwise(F.col("id").cast("string"))
        .alias("v")
    )
    with pytest.raises(ApiError) as ei:
        api._collect_or_404("t", lambda: guarded)
    assert ei.value.status == 422
    assert "contract bound" in ei.value.detail and "quantize" in ei.value.detail
    # a plain failure still maps to the no-ticks 404
    broken = spark.createDataFrame([(1,)], "v long").select(
        (F.col("v") / F.lit(0)).alias("x")
    )

    def boom():
        raise RuntimeError("plain failure")

    with pytest.raises(ApiError) as ei:
        api._collect_or_404("t", boom)
    assert ei.value.status == 404


def test_run_bounded_parallel_callers(spark):
    """Eight threads drive bounded finalizes simultaneously: distinct
    transient view names, one shared AQE-off clone, no conf mutation —
    every result must be correct and the main session untouched."""
    import concurrent.futures

    from csp_gateway_spark.session import run_bounded

    def job(i):
        out = (
            spark.range(5000)
            .groupBy((F.col("id") % (i + 2)).alias("k"))
            .agg(F.sum("id").alias("s"))
        )
        rows = run_bounded(out).collect()
        return sum(r["s"] for r in rows)

    with concurrent.futures.ThreadPoolExecutor(max_workers=8) as ex:
        got = list(ex.map(job, range(8)))
    assert got == [sum(range(5000))] * 8
    assert spark.conf.get("spark.sql.adaptive.enabled") == "true"
