"""Wave-33 operators: Quade blocked rank test, Lo-MacKinlay variance
ratio, Granger lag-1 F, Engle-Granger cointegration — each validated
against an in-test numpy brute-force reference."""

import math

import numpy as np
import pytest
from pyspark.sql import functions as F

from csp_gateway_spark.operators.analytics import (
    engle_granger,
    granger_lag1,
    quade_test,
    variance_ratio,
)


def _midranks(v):
    order = np.argsort(v, kind="stable")
    sv = np.sort(v)
    rr = np.empty(len(v))
    i = 0
    while i < len(v):
        j = i
        while j + 1 < len(v) and sv[j + 1] == sv[i]:
            j += 1
        rr[i:j + 1] = (i + j) / 2 + 1
        i = j + 1
    out = np.empty(len(v))
    out[order] = rr
    return out


def test_quade_brute_force(spark):
    rng = np.random.RandomState(9)
    nb, k = 30, 4
    vals = np.round(rng.rand(nb, k) * 100 + np.arange(k) * 5, 2)
    rows = [
        (f"b{i}", f"t{j}", float(vals[i, j]))
        for i in range(nb)
        for j in range(k)
    ]
    df = spark.createDataFrame(rows, "b string, t string, v double")
    r = quade_test(df, "b", "t", "v").collect()[0]
    rij = np.vstack([_midranks(vals[i]) for i in range(nb)])
    Q = _midranks(vals.max(axis=1) - vals.min(axis=1))
    S = Q[:, None] * (rij - (k + 1) / 2)
    A = (S**2).sum()
    B = (S.sum(axis=0) ** 2).sum() / nb
    assert (r["n_blocks"], r["k"]) == (nb, k)
    assert r["f_stat"] == pytest.approx((nb - 1) * B / (A - B), abs=1e-9)


def test_quade_drops_incomplete_blocks(spark):
    rows = [
        ("b1", "t1", 1.0), ("b1", "t2", 2.0),
        ("b2", "t1", 5.0), ("b2", "t2", 1.0),
        ("b3", "t1", 9.0),  # incomplete: missing t2
    ]
    df = spark.createDataFrame(rows, "b string, t string, v double")
    r = quade_test(df, "b", "t", "v").collect()[0]
    assert r["n_blocks"] == 2 and r["k"] == 2


def test_variance_ratio_brute_force(spark):
    rng = np.random.RandomState(13)
    y = np.round(np.cumsum(rng.randn(400)) + 100, 2)
    df = spark.createDataFrame(
        [(i, float(v)) for i, v in enumerate(y)], "k int, v double"
    )
    q = 5
    r = variance_ratio(df, "k", "v", q=q).collect()[0]
    d1 = np.diff(y)
    dq = y[q:] - y[:-q]
    mu = d1.mean()
    var1 = ((d1 - mu) ** 2).sum() / len(d1)
    varq = ((dq - q * mu) ** 2).sum() / (q * len(dq))
    VR = varq / var1
    Z = (VR - 1) / math.sqrt(2 * (2 * q - 1) * (q - 1) / (3 * q * len(d1)))
    assert (r["n1"], r["nq"]) == (len(d1), len(dq))
    assert r["vr"] == pytest.approx(VR, abs=1e-9)
    assert r["z"] == pytest.approx(Z, abs=1e-9)
    with pytest.raises(ValueError, match="q must be"):
        variance_ratio(df, "k", "v", q=1)
    # white noise mean-reverts: VR well below 1, z strongly negative
    yn = np.round(rng.randn(400), 2)
    dfn = spark.createDataFrame(
        [(i, float(v)) for i, v in enumerate(yn)], "k int, v double"
    )
    rn = variance_ratio(dfn, "k", "v", q=q).collect()[0]
    assert rn["vr"] < r["vr"] and rn["z"] < -5


def test_granger_lag1_vs_numpy(spark):
    rng = np.random.RandomState(17)
    xs = np.round(np.cumsum(rng.randn(300)) + 50, 2)
    ys = np.round(
        np.concatenate([[0], xs[:-1] * 0.3])
        + np.cumsum(rng.randn(300)) * 0.5
        + 20,
        2,
    )
    df = spark.createDataFrame(
        [(i, float(ys[i]), float(xs[i])) for i in range(300)],
        "k int, y double, x double",
    )
    r = granger_lag1(df, "k", "y", "x").collect()[0]
    yt, y1, x1 = ys[1:], ys[:-1], xs[:-1]
    Xu = np.column_stack([np.ones_like(y1), y1, x1])
    Xr = np.column_stack([np.ones_like(y1), y1])
    bu, *_ = np.linalg.lstsq(Xu, yt, rcond=None)
    br, *_ = np.linalg.lstsq(Xr, yt, rcond=None)
    rss_u = ((yt - Xu @ bu) ** 2).sum()
    rss_r = ((yt - Xr @ br) ** 2).sum()
    assert r["n"] == len(yt)
    assert r["beta_x"] == pytest.approx(bu[2], abs=1e-8)
    assert r["f_stat"] == pytest.approx(
        (rss_r - rss_u) / (rss_u / (len(yt) - 3)), abs=1e-5
    )
    # x must NOT be found to cause pure noise: F small for iid y
    dfn = spark.createDataFrame(
        [(i, float(v), float(xs[i])) for i, v in enumerate(np.round(rng.randn(300), 2))],
        "k int, y double, x double",
    )
    rn = granger_lag1(dfn, "k", "y", "x").collect()[0]
    assert rn["f_stat"] < r["f_stat"]


def test_engle_granger_vs_numpy(spark):
    rng = np.random.RandomState(21)
    xc = np.round(np.cumsum(rng.randn(300)) + 100, 2)
    yc = np.round(2 * xc + rng.randn(300), 2)
    df = spark.createDataFrame(
        [(i, float(yc[i]), float(xc[i])) for i in range(300)],
        "k int, y double, x double",
    )
    r = engle_granger(df, "k", "y", "x").collect()[0]
    b = np.cov(xc, yc, bias=True)[0, 1] / np.var(xc)
    a = yc.mean() - b * xc.mean()
    e = yc - a - b * xc
    ep, de = e[:-1], np.diff(e)
    beta = (ep * de).sum() / (ep * ep).sum()
    rss = ((de - beta * ep) ** 2).sum()
    t = beta / math.sqrt(rss / (len(de) - 1) / (ep * ep).sum())
    assert r["n_pairs"] == len(de)
    assert r["alpha"] == pytest.approx(a, abs=1e-6)
    assert r["beta"] == pytest.approx(b, abs=1e-9)
    assert r["adf_t"] == pytest.approx(t, abs=1e-7)
    # cointegrated pair rejects far harder than two INDEPENDENT walks
    y2 = np.round(np.cumsum(rng.randn(300)) + 100, 2)
    df2 = spark.createDataFrame(
        [(i, float(y2[i]), float(xc[i])) for i in range(300)],
        "k int, y double, x double",
    )
    r2 = engle_granger(df2, "k", "y", "x").collect()[0]
    assert r["adf_t"] < r2["adf_t"]
