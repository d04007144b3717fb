"""Wave-41 operators: Yuen trimmed-mean t and Huber IRLS regression —
validated against in-test numpy brute-force references replicating
the SAME fixed-step / pseudo-scale contracts."""

import numpy as np
import pytest

from csp_gateway_spark.operators.analytics import huber_irls, yuen_trimmed_t


def _df2(spark, xa, xb):
    rows = [("a", float(v)) for v in xa] + [("b", float(v)) for v in xb]
    return spark.createDataFrame(rows, "g string, v double")


def _yuen_brute(xa, xb, trim=0.2):
    def parts(x):
        n = len(x)
        g = int(np.floor(trim * n))
        s = np.sort(x)
        mid = s[g:n - g]
        h = n - 2 * g
        mt = mid.mean()
        wins = np.concatenate([[s[g]] * g, mid, [s[n - g - 1]] * g])
        ssd = ((wins - wins.mean()) ** 2).sum()
        return h, mt, ssd
    h1, m1, ssd1 = parts(xa)
    h2, m2, ssd2 = parts(xb)
    d1 = ssd1 / (h1 * (h1 - 1))
    d2 = ssd2 / (h2 * (h2 - 1))
    return h1, h2, m1, m2, (m1 - m2) / np.sqrt(d1 + d2)


def test_yuen_brute_force(spark):
    rng = np.random.RandomState(41)
    xa = np.round(np.concatenate([rng.randn(180) + 5, [80.0, -70.0]]), 2)
    xb = np.round(np.concatenate([rng.randn(150) + 6, [120.0]]), 2)
    r = yuen_trimmed_t(_df2(spark, xa, xb), "g", "v", "a", "b").collect()[0]
    h1, h2, m1, m2, t = _yuen_brute(xa, xb)
    assert (r["h_a"], r["h_b"]) == (h1, h2)
    assert r["mean_trim_a"] == pytest.approx(m1, rel=1e-9)
    assert r["mean_trim_b"] == pytest.approx(m2, rel=1e-9)
    assert r["t_stat"] == pytest.approx(t, rel=1e-9)
    # outliers trimmed away: the test sees the ~1-unit location gap
    assert r["t_stat"] < -3


def test_yuen_with_heavy_ties(spark):
    xa = np.array([1.0] * 10 + [2.0] * 10 + [3.0] * 10)
    xb = np.array([2.0] * 15 + [4.0] * 15)
    r = yuen_trimmed_t(_df2(spark, xa, xb), "g", "v", "a", "b").collect()[0]
    h1, h2, m1, m2, t = _yuen_brute(xa, xb)
    assert (r["h_a"], r["h_b"]) == (h1, h2)
    assert r["mean_trim_a"] == pytest.approx(m1, rel=1e-12)
    assert r["t_stat"] == pytest.approx(t, rel=1e-9)


def test_yuen_invalid_trim(spark):
    df = _df2(spark, [1.0], [2.0])
    with pytest.raises(ValueError):
        yuen_trimmed_t(df, "g", "v", "a", "b", trim=0.5)


def _huber_brute(x, y, k=1.345, steps=2):
    n = len(x)

    def ols(w):
        sw = w.sum()
        b = ((w * x * y).sum() - (w * x).sum() * (w * y).sum() / sw) / (
            (w * x * x).sum() - (w * x).sum() ** 2 / sw
        )
        a = ((w * y).sum() - b * (w * x).sum()) / sw
        return a, b

    a, b = ols(np.ones(n))
    # replicate the operator: s is the CURRENT fit's RMSE
    e = y - a - b * x
    s = np.sqrt((e**2).sum() / n)
    nd = 0
    for _ in range(steps):
        e = np.abs(y - a - b * x)
        w = np.where((e > 0) & (s > 0), np.minimum(1.0, k * s / np.where(e > 0, e, 1.0)), 1.0)
        nd = int((w < 1.0).sum())
        resid = y - a - b * x
        see = (resid**2).sum()
        a, b = ols(w)
        s = np.sqrt(see / n)
    return a, b, nd


def test_huber_brute_force(spark):
    rng = np.random.RandomState(7)
    x = np.round(rng.rand(300) * 10, 2)
    y = np.round(2.0 + 1.5 * x + rng.randn(300) * 0.3, 2)
    y[:6] += 50  # gross outliers
    df = spark.createDataFrame(
        [(float(a), float(b)) for a, b in zip(x, y)], "x double, y double"
    )
    r = huber_irls(df, "y", "x").collect()[0]
    a, b, nd = _huber_brute(x, y)
    assert r["n"] == 300
    assert r["beta"] == pytest.approx(b, rel=1e-9)
    assert r["alpha"] == pytest.approx(a, rel=1e-9)
    assert r["n_downweighted"] == nd
    # robust fit shakes off the +50 outliers: slope near the true 1.5
    assert abs(r["beta"] - 1.5) < 0.1


def test_huber_clean_data_matches_ols(spark):
    rng = np.random.RandomState(3)
    # x on a dyadic grid so 1 + 2x is EXACT in float arithmetic —
    # residuals are exactly zero and every weight stays 1
    x = rng.randint(0, 20, 200) * 0.25
    y = 1.0 + 2.0 * x
    df = spark.createDataFrame(
        [(float(a), float(b)) for a, b in zip(x, y)], "x double, y double"
    )
    r = huber_irls(df, "y", "x").collect()[0]
    assert r["beta"] == pytest.approx(2.0, abs=1e-6)
    assert r["n_downweighted"] == 0


def test_huber_invalid_args(spark):
    df = spark.createDataFrame([(1.0, 1.0)], "x double, y double")
    with pytest.raises(ValueError):
        huber_irls(df, "y", "x", steps=0)
    with pytest.raises(ValueError):
        huber_irls(df, "y", "x", k=0)
