"""Wave-35 operators: Breusch-Pagan heteroskedasticity LM, Chow
structural-break F, Engle ARCH LM, KPSS stationarity — each validated
against an in-test numpy brute-force reference."""

import numpy as np
import pytest

from csp_gateway_spark.operators.analytics import (
    arch_lm,
    breusch_pagan,
    chow_test,
    kpss_test,
)


def _series_df(spark, y, x=None):
    if x is None:
        rows = [(i, float(v)) for i, v in enumerate(y)]
        return spark.createDataFrame(rows, "k int, v double")
    rows = [(i, float(a), float(b)) for i, (a, b) in enumerate(zip(y, x))]
    return spark.createDataFrame(rows, "k int, y double, x double")


def _ols(y, x):
    n = len(y)
    b = ((x * y).sum() - x.sum() * y.sum() / n) / (
        (x * x).sum() - x.sum() ** 2 / n
    )
    a = (y.sum() - b * x.sum()) / n
    return a, b


def test_breusch_pagan_brute_force(spark):
    rng = np.random.RandomState(35)
    x = np.round(rng.rand(300) * 50 + 10, 2)
    # heteroskedastic: noise scale grows with x
    y = np.round(3.0 + 2.0 * x + rng.randn(300) * x * 0.4, 2)
    r = breusch_pagan(_series_df(spark, y, x), "k", "y", "x").collect()[0]
    a, b = _ols(y, x)
    u = (y - a - b * x) ** 2
    cxx = (x * x).sum() - x.sum() ** 2 / len(x)
    cuu = (u * u).sum() - u.sum() ** 2 / len(u)
    cxu = (x * u).sum() - x.sum() * u.sum() / len(x)
    r2 = cxu**2 / (cxx * cuu)
    assert r["n"] == 300
    assert r["aux_r2"] == pytest.approx(r2, rel=1e-9)
    assert r["lm_stat"] == pytest.approx(300 * r2, rel=1e-9)
    # heteroskedastic by construction: LM should be large
    assert r["lm_stat"] > 10


def test_breusch_pagan_homoskedastic_small(spark):
    rng = np.random.RandomState(7)
    x = np.round(rng.rand(400) * 50, 2)
    y = np.round(1.0 + 0.5 * x + rng.randn(400), 2)
    r = breusch_pagan(_series_df(spark, y, x), "k", "y", "x").collect()[0]
    assert r["lm_stat"] < 6.0  # χ²(1) 97.5th pct ≈ 5.02


def test_chow_brute_force(spark):
    rng = np.random.RandomState(11)
    x = np.round(rng.rand(200) * 20, 2)
    y1 = np.round(1.0 + 2.0 * x[:100] + rng.randn(100) * 0.5, 2)
    y2 = np.round(8.0 - 1.0 * x[100:] + rng.randn(100) * 0.5, 2)
    y = np.concatenate([y1, y2])
    r = chow_test(_series_df(spark, y, x), "k", "y", "x", break_key=100).collect()[0]

    def rss(yy, xx):
        a, b = _ols(yy, xx)
        return ((yy - a - b * xx) ** 2).sum()

    r1, r2_, rp = rss(y[:100], x[:100]), rss(y[100:], x[100:]), rss(y, x)
    f = ((rp - r1 - r2_) / 2) / ((r1 + r2_) / (200 - 4))
    assert (r["n1"], r["n2"]) == (100, 100)
    assert r["f_stat"] == pytest.approx(f, rel=1e-7)
    assert r["f_stat"] > 50  # break by construction


def test_chow_segment_too_small_null(spark):
    y = np.array([1.0, 2.0, 3.0, 4.0, 5.0])
    x = np.array([1.0, 2.0, 3.0, 4.0, 5.0])
    r = chow_test(_series_df(spark, y, x), "k", "y", "x", break_key=2).collect()[0]
    assert r["n1"] == 2 and r["f_stat"] is None


def test_arch_lm_brute_force(spark):
    rng = np.random.RandomState(21)
    # ARCH(1): volatility clustering
    e = np.zeros(500)
    sig2 = np.ones(500)
    for t in range(1, 500):
        sig2[t] = 0.3 + 0.7 * e[t - 1] ** 2
        e[t] = np.sqrt(sig2[t]) * rng.randn()
    v = np.round(e * 10 + 100, 2)
    r = arch_lm(_series_df(spark, v), "k", "v").collect()[0]
    u = (v - v.mean()) ** 2
    a, yv = u[:-1], u[1:]
    n = len(yv)
    caa = (a * a).sum() - a.sum() ** 2 / n
    cyy = (yv * yv).sum() - yv.sum() ** 2 / n
    cay = (a * yv).sum() - a.sum() * yv.sum() / n
    r2 = cay**2 / (caa * cyy)
    assert r["n_pairs"] == n
    assert r["aux_r2"] == pytest.approx(r2, rel=1e-9)
    assert r["lm_stat"] == pytest.approx(n * r2, rel=1e-9)
    assert r["lm_stat"] > 10  # ARCH by construction


def test_arch_lm_constant_series_null(spark):
    v = np.full(50, 7.0)
    r = arch_lm(_series_df(spark, v), "k", "v").collect()[0]
    assert r["n_pairs"] == 49 and r["lm_stat"] is None


def test_kpss_brute_force(spark):
    rng = np.random.RandomState(5)
    y = np.round(np.cumsum(rng.randn(300)) + 50, 2)  # random walk
    lags = 4
    r = kpss_test(_series_df(spark, y), "k", "v", lags=lags).collect()[0]
    e = y - y.mean()
    s = np.cumsum(e)
    n = len(y)
    g0 = (e**2).sum()
    lrv = g0
    for j in range(1, lags + 1):
        gj = (e[j:] * e[:-j]).sum()
        lrv += 2.0 * (1.0 - j / (lags + 1)) * gj
    lrv /= n
    eta = (s**2).sum() / (n**2 * lrv)
    assert r["n"] == n
    assert r["lrv_ratio"] == pytest.approx(lrv * n / g0, rel=1e-9)
    assert r["eta"] == pytest.approx(eta, rel=1e-9)
    assert r["eta"] > 0.463  # random walk rejects level-stationarity at 5%


def test_kpss_stationary_small(spark):
    rng = np.random.RandomState(17)
    y = np.round(rng.randn(400) * 2 + 10, 2)  # white noise around a level
    r = kpss_test(_series_df(spark, y), "k", "v", lags=4).collect()[0]
    assert r["eta"] < 0.463


def test_kpss_lags_zero(spark):
    rng = np.random.RandomState(3)
    y = np.round(rng.randn(100) + 5, 2)
    r = kpss_test(_series_df(spark, y), "k", "v", lags=0).collect()[0]
    e = y - y.mean()
    s = np.cumsum(e)
    lrv = (e**2).sum() / 100
    assert r["lrv_ratio"] == pytest.approx(1.0, rel=1e-12)
    assert r["eta"] == pytest.approx((s**2).sum() / (100**2 * lrv), rel=1e-9)


def test_kpss_negative_lags_raises(spark):
    with pytest.raises(ValueError):
        kpss_test(_series_df(spark, np.ones(5)), "k", "v", lags=-1)
