"""Wave 30: Mood's median test, Brunner-Munzel, Theil-Sen slope,
seasonal-naive MASE backtest, embedding-centroid drift."""

import math
from collections import Counter

import pytest
from pyspark.sql import functions as F


def test_mood_median_hand_computed(spark):
    from csp_gateway_spark.operators.analytics import mood_median

    rows = [("g1", 1.0), ("g1", 2.0), ("g1", 3.0), ("g2", 4.0), ("g2", 5.0), ("g2", 6.0)]
    df = spark.createDataFrame(rows, "g string, v double")
    r = mood_median(df, "g", "v").collect()[0]
    # lower median = value at rank ceil(6/2)=3 -> 3.0; above: g1=0, g2=3
    assert r.n == 6 and r.k == 2 and r.median == 3.0 and r.df == 1
    # chi2 = 2 * ((0-1.5)^2/1.5 + (3-1.5)^2/1.5) = 6
    assert r.chi2 == pytest.approx(6.0, abs=1e-12)


def test_mood_median_degenerate_null_chi2(spark):
    from csp_gateway_spark.operators.analytics import mood_median

    # all values identical -> nothing above the median -> chi2 NULL
    rows = [("a", 5.0)] * 4 + [("b", 5.0)] * 4
    df = spark.createDataFrame(rows, "g string, v double")
    r = mood_median(df, "g", "v").collect()[0]
    assert r.chi2 is None and r.median == 5.0


def _midranks(vals):
    cnt = Counter(vals)
    mr, less = {}, 0
    for v in sorted(cnt):
        mr[v] = less + (cnt[v] + 1) / 2
        less += cnt[v]
    return mr


def _bm_ref(x, y):
    pooled = list(x) + list(y)
    mrp, mrx, mry = _midranks(pooled), _midranks(x), _midranks(y)
    nx, ny = len(x), len(y)
    rx = [mrp[v] for v in x]
    ry = [mrp[v] for v in y]
    rxm, rym = sum(rx) / nx, sum(ry) / ny
    sx = sum((mrp[v] - mrx[v] - rxm + (nx + 1) / 2) ** 2 for v in x) / (nx - 1)
    sy = sum((mrp[v] - mry[v] - rym + (ny + 1) / 2) ** 2 for v in y) / (ny - 1)
    pooled_v = nx * sx + ny * sy
    w = nx * ny * (rym - rxm) / (nx + ny) / math.sqrt(pooled_v)
    p = (rym - (ny + 1) / 2) / nx
    df = pooled_v**2 / ((nx * sx) ** 2 / (nx - 1) + (ny * sy) ** 2 / (ny - 1))
    return p, w, df


def test_brunner_munzel_vs_reference(spark):
    from csp_gateway_spark.operators.analytics import brunner_munzel

    # scipy docs example (Karch 2021): unequal-variance samples w/ ties
    x = [1.0, 2.0, 1.0, 1.0, 1.0, 1.0, 1.0, 1.0, 1.0, 1.0, 2.0, 4.0, 1.0, 1.0]
    y = [3.0, 3.0, 4.0, 3.0, 1.0, 2.0, 3.0, 1.0, 1.0, 5.0, 4.0]
    rows = [("a", v) for v in x] + [("b", v) for v in y]
    df = spark.createDataFrame(rows, "g string, v double")
    r = brunner_munzel(df, "g", "v", "a", "b").collect()[0]
    p_ref, w_ref, df_ref = _bm_ref(x, y)
    assert r.n_a == len(x) and r.n_b == len(y)
    assert r.p_hat == pytest.approx(p_ref, abs=1e-12)
    assert r.w == pytest.approx(w_ref, abs=1e-10)
    assert r.df == pytest.approx(df_ref, abs=1e-8)


def test_brunner_munzel_symmetric_zero(spark):
    from csp_gateway_spark.operators.analytics import brunner_munzel

    rows = [("a", float(i)) for i in range(10)] + [("b", float(i)) for i in range(10)]
    df = spark.createDataFrame(rows, "g string, v double")
    r = brunner_munzel(df, "g", "v", "a", "b").collect()[0]
    assert r.p_hat == pytest.approx(0.5, abs=1e-12)
    assert r.w == pytest.approx(0.0, abs=1e-12)


def test_theil_sen_hand_computed(spark):
    from csp_gateway_spark.operators.analytics import theil_sen_slope

    pts = [(0, 0.0), (1, 1.0), (2, 2.0), (3, 10.0)]
    df = spark.createDataFrame(pts, "x long, y double")
    r = theil_sen_slope(df, "x", "y").collect()[0]
    # slopes sorted: [1, 1, 1, 10/3, 4.5, 8] -> median = (1 + 10/3)/2
    assert r.n_points == 4 and r.n_pairs == 6
    assert r.slope == pytest.approx((1.0 + 10.0 / 3.0) / 2.0, abs=1e-12)


def test_theil_sen_outlier_immune(spark):
    from csp_gateway_spark.operators.analytics import theil_sen_slope

    pts = [(i, 2.0 * i) for i in range(30)]
    pts[15] = (15, 1000.0)  # one wrecked day
    df = spark.createDataFrame(pts, "x long, y double")
    r = theil_sen_slope(df, "x", "y").collect()[0]
    assert r.slope == pytest.approx(2.0, abs=1e-9)


def test_theil_sen_pair_contract(spark):
    from csp_gateway_spark.operators.analytics import theil_sen_slope

    df = spark.createDataFrame([(i, 1.0) for i in range(100)], "x long, y double")
    with pytest.raises(ValueError, match="max_pairs"):
        theil_sen_slope(df, "x", "y", max_pairs=10)


def test_theil_sen_rejects_duplicate_keys_and_drops_nulls(spark):
    """ADVICE r12: duplicate x keys used to surface as an opaque probe
    assertion (n_pairs counted from raw rows but the x2 > x join skips
    equal keys); NULL keys/values must be excluded up front."""
    from csp_gateway_spark.operators.analytics import theil_sen_slope

    dup = spark.createDataFrame(
        [(1, 1.0), (1, 2.0), (2, 3.0)], "x long, y double"
    )
    with pytest.raises(ValueError, match="duplicate x keys"):
        theil_sen_slope(dup, "x", "y")

    with_nulls = spark.createDataFrame(
        [(1, 1.0), (2, 2.0), (3, 3.0), (None, 9.0), (4, None)],
        "x long, y double",
    )
    r = theil_sen_slope(with_nulls, "x", "y").collect()[0]
    assert r.n_points == 3 and r.n_pairs == 3
    assert r.slope == pytest.approx(1.0, abs=1e-12)


def test_mase_short_series_null_not_error(spark):
    """ADVICE r12: n <= horizon + season used to evaluate the smape
    fold with index 0 (ANSI error) or negative indices (silent wrong
    elements from the array END) — short series must emit NULL mase
    AND NULL smape, not a wrong number."""
    from csp_gateway_spark.operators.analytics import mase_backtest

    # n = 20 <= horizon(14) + season(7): train_n = 6 < m = 7
    rows = [(t, float(t)) for t in range(1, 21)]
    df = spark.createDataFrame(rows, "k long, y double")
    r = mase_backtest(df, "k", "y", season=7, horizon=14).collect()[0]
    assert r.n == 20 and r.train_n == 6
    assert r.mase is None and r.smape is None

    # boundary: train_n == m is still too short (scale denominator 0)
    rows = [(t, float(t)) for t in range(1, 22)]
    r = mase_backtest(
        spark.createDataFrame(rows, "k long, y double"), "k", "y",
        season=7, horizon=14,
    ).collect()[0]
    assert r.train_n == 7 and r.mase is None and r.smape is None

    # one past the boundary: defined again
    rows = [(t, float(t)) for t in range(1, 23)]
    r = mase_backtest(
        spark.createDataFrame(rows, "k long, y double"), "k", "y",
        season=7, horizon=14,
    ).collect()[0]
    assert r.train_n == 8 and r.mase is not None and r.smape is not None


def test_mase_linear_trend_is_one(spark):
    from csp_gateway_spark.operators.analytics import mase_backtest

    # y_t = t: every seasonal diff is m, every holdout error is m ->
    # MASE exactly 1 (the canonical seasonal-naive fixed point)
    rows = [(t, float(t)) for t in range(1, 31)]
    df = spark.createDataFrame(rows, "k long, y double")
    r = mase_backtest(df, "k", "y", season=7, horizon=7).collect()[0]
    assert r.n == 30 and r.train_n == 23 and r.horizon == 7
    assert r.mase == pytest.approx(1.0, abs=1e-12)
    sm_ref = sum(2.0 * 7 / ((23 + j) + (16 + j)) for j in range(1, 8)) / 7
    assert r.smape == pytest.approx(sm_ref, abs=1e-12)


def test_mase_constant_series_null(spark):
    from csp_gateway_spark.operators.analytics import mase_backtest

    rows = [(t, 5.0) for t in range(1, 31)]
    df = spark.createDataFrame(rows, "k long, y double")
    r = mase_backtest(df, "k", "y", season=7, horizon=7).collect()[0]
    assert r.mase is None  # zero scale -> undefined, never a div-by-zero
    assert r.smape == 0.0
    with pytest.raises(ValueError, match="season"):
        mase_backtest(df, "k", "y", season=0)


def test_embedding_drift_identical_groups(spark):
    from csp_gateway_spark.operators.similarity import embedding_drift

    emb = spark.createDataFrame(
        [(i, [1.0, 0.0]) for i in range(8)], "vec_id long, embedding array<double>"
    )
    labels = spark.createDataFrame(
        [(i, "s1" if i % 2 == 0 else "s2") for i in range(8)],
        "doc_id long, source string",
    )
    rows = {r.source: r for r in embedding_drift(emb, labels).collect()}
    assert set(rows) == {"s1", "s2"}
    for r in rows.values():
        assert r.n_vecs == 4
        assert r.cos_to_global == pytest.approx(1.0, abs=1e-12)
        assert r.centroid_norm == pytest.approx(1.0, abs=1e-6)


def test_embedding_drift_orthogonal_group(spark):
    from csp_gateway_spark.operators.similarity import embedding_drift

    # s1 along x, s2 along y -> each centroid at 45 deg to the global
    emb_rows = [(i, [1.0, 0.0]) for i in range(4)] + [
        (i, [0.0, 1.0]) for i in range(4, 8)
    ]
    emb = spark.createDataFrame(emb_rows, "vec_id long, embedding array<double>")
    labels = spark.createDataFrame(
        [(i, "s1" if i < 4 else "s2") for i in range(8)],
        "doc_id long, source string",
    )
    rows = {r.source: r for r in embedding_drift(emb, labels).collect()}
    for r in rows.values():
        assert r.cos_to_global == pytest.approx(math.cos(math.pi / 4), abs=1e-9)


def test_quantiles_probe_exact_ranks(spark):
    from csp_gateway_spark.operators.analytics import quantiles_probe

    df = spark.range(1, 1001).select(F.col("id").cast("double").alias("v"))
    got = {r.prob: (r.rank, r.value) for r in quantiles_probe(df, "v").collect()}
    assert got == {
        0.01: (10, 10.0),
        0.25: (250, 250.0),
        0.5: (500, 500.0),
        0.75: (750, 750.0),
        0.99: (990, 990.0),
    }


def test_quantiles_probe_heavy_tail_and_ties(spark):
    from csp_gateway_spark.operators.analytics import quantiles_probe

    # one extreme outlier squeezes ~all mass into one probe bucket —
    # the refinement must still find the exact order statistics; a
    # massive tie group can never split, and must still resolve
    rows = [(1.0,)] * 500 + [(float(i),) for i in range(2, 500)] + [(1e12,)]
    df = spark.createDataFrame(rows, "v double")
    n = len(rows)
    got = {r.prob: r.value for r in quantiles_probe(df, "v").collect()}
    vals = sorted(v for (v,) in rows)
    import math

    for p in (0.01, 0.25, 0.5, 0.75, 0.99):
        k = max(1, math.ceil(p * n))
        assert got[p] == vals[k - 1], (p, k)


def test_iqr_outliers_report(spark):
    from csp_gateway_spark.operators.analytics import iqr_outliers

    df = spark.range(1, 1001).select(F.col("id").cast("double").alias("v"))
    df = df.union(spark.createDataFrame([(1e9,), (-1e9,)], "v double"))
    r = iqr_outliers(df, "v").collect()[0]
    assert r.n == 1002 and r.n_low == 1 and r.n_high == 1
    assert r.q1 < r.q3 and r.lo_fence < r.q1 and r.hi_fence > r.q3
    assert r.outlier_share == 2 / 1002


def _ab_ref(x, y):
    """Ansari-Bradley A + conditional-moment z (tie-exact)."""
    pooled = sorted(x + y)
    n = len(pooled)
    mr = _midranks(pooled)
    score = {v: min(mr[v], n + 1 - mr[v]) for v in mr}
    a = sum(score[v] for v in x)
    scores_all = [score[v] for v in pooled]
    sbar = sum(scores_all) / n
    ssq = sum(s * s for s in scores_all)
    na, nb = len(x), len(y)
    e_a = na * sbar
    var_a = na * nb * (n * ssq - sum(scores_all) ** 2) / (n * n * (n - 1))
    return a, (a - e_a) / math.sqrt(var_a)


def test_ansari_bradley_vs_reference(spark):
    from csp_gateway_spark.operators.analytics import ansari_bradley

    x = [1.0, 5.0, 5.0, 9.0, 2.0, 8.0, 2.5]
    y = [4.0, 4.5, 5.5, 5.0, 6.0, 5.2]
    rows = [("a", v) for v in x] + [("b", v) for v in y]
    df = spark.createDataFrame(rows, "g string, v double")
    r = ansari_bradley(df, "g", "v", "a", "b").collect()[0]
    a_ref, z_ref = _ab_ref(x, y)
    assert r.n_a == len(x) and r.n_b == len(y)
    assert r.ab_stat == pytest.approx(a_ref, abs=1e-12)
    assert r.z == pytest.approx(z_ref, abs=1e-10)


def test_ansari_bradley_identical_scale_z_small(spark):
    from csp_gateway_spark.operators.analytics import ansari_bradley

    # interleaved identical-spread samples: A ~ E[A], z near 0
    rows = [("a", float(i)) for i in range(0, 40, 2)] + [
        ("b", float(i)) for i in range(1, 41, 2)
    ]
    df = spark.createDataFrame(rows, "g string, v double")
    r = ansari_bradley(df, "g", "v", "a", "b").collect()[0]
    assert abs(r.z) < 1.0
