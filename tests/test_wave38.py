"""Wave-38 operators: Diebold-Mariano, Pesaran-Timmermann, Theil's
U2 — validated against in-test numpy brute-force references."""

import numpy as np
import pytest

from csp_gateway_spark.operators.analytics import (
    diebold_mariano,
    pesaran_timmermann,
    theil_u2,
)


def test_diebold_mariano_brute_force(spark):
    rng = np.random.RandomState(38)
    n = 300
    l1 = np.round(rng.rand(n) * 4 + 1, 2)
    l2 = np.round(l1 * 0.8 + rng.rand(n), 2)  # forecast 2 usually better? mixed
    df = spark.createDataFrame(
        [(i, float(a), float(b)) for i, (a, b) in enumerate(zip(l1, l2))],
        "k int, l1 double, l2 double",
    )
    lags = 3
    r = diebold_mariano(df, "k", "l1", "l2", lags=lags).collect()[0]
    d = l1 - l2
    e = d - d.mean()
    g0 = (e**2).sum()
    lrv = g0
    for j in range(1, lags + 1):
        lrv += 2.0 * (1.0 - j / (lags + 1)) * (e[j:] * e[:-j]).sum()
    lrv /= n
    dm = d.mean() / np.sqrt(lrv / n)
    assert r["n"] == n
    assert r["loss_ratio"] == pytest.approx(l1.sum() / l2.sum(), rel=1e-9)
    assert r["dm_stat"] == pytest.approx(dm, rel=1e-9)


def test_diebold_mariano_lags_zero(spark):
    rng = np.random.RandomState(2)
    l1 = np.round(rng.rand(100) + 1, 2)
    l2 = np.round(rng.rand(100) + 1, 2)
    df = spark.createDataFrame(
        [(i, float(a), float(b)) for i, (a, b) in enumerate(zip(l1, l2))],
        "k int, l1 double, l2 double",
    )
    r = diebold_mariano(df, "k", "l1", "l2", lags=0).collect()[0]
    d = l1 - l2
    lrv = ((d - d.mean()) ** 2).sum() / 100
    assert r["dm_stat"] == pytest.approx(d.mean() / np.sqrt(lrv / 100), rel=1e-9)


def test_diebold_mariano_negative_lags_raises(spark):
    df = spark.createDataFrame([(0, 1.0, 1.0)], "k int, l1 double, l2 double")
    with pytest.raises(ValueError):
        diebold_mariano(df, "k", "l1", "l2", lags=-1)


def test_pesaran_timmermann_brute_force(spark):
    rng = np.random.RandomState(9)
    n = 500
    dy = rng.randn(n)
    dx = np.where(rng.rand(n) < 0.7, np.sign(dy), -np.sign(dy)) * np.abs(rng.randn(n))
    df = spark.createDataFrame(
        [(float(a), float(b)) for a, b in zip(dy, dx)], "dy double, dx double"
    )
    r = pesaran_timmermann(df, "dy", "dx").collect()[0]
    uy, ux = (dy > 0).astype(int), (dx > 0).astype(int)
    py, px = uy.mean(), ux.mean()
    s = (uy == ux).mean()
    pstar = py * px + (1 - py) * (1 - px)
    vs = pstar * (1 - pstar) / n
    vp = (
        (2 * py - 1) ** 2 * px * (1 - px) / n
        + (2 * px - 1) ** 2 * py * (1 - py) / n
        + 4 * py * px * (1 - py) * (1 - px) / n**2
    )
    pt = (s - pstar) / np.sqrt(vs - vp)
    assert r["n"] == n
    assert r["accuracy"] == pytest.approx(s, rel=1e-12)
    assert r["pt_stat"] == pytest.approx(pt, rel=1e-9)
    assert r["pt_stat"] > 3  # 70% directional skill by construction


def test_pesaran_timmermann_degenerate_null(spark):
    # all changes positive on both sides: vs - vp == 0 -> NULL stat
    df = spark.createDataFrame(
        [(1.0, 2.0), (3.0, 0.5), (2.0, 2.0)], "dy double, dx double"
    )
    r = pesaran_timmermann(df, "dy", "dx").collect()[0]
    assert r["accuracy"] == pytest.approx(1.0)
    assert r["pt_stat"] is None


def test_theil_u2_brute_force(spark):
    rng = np.random.RandomState(4)
    y = np.round(rng.rand(200) * 10 + 5, 2)
    f = np.round(y + rng.randn(200) * 0.5, 2)
    nv = np.round(y + rng.randn(200) * 2.0, 2)
    df = spark.createDataFrame(
        [(float(a), float(b), float(c)) for a, b, c in zip(y, f, nv)],
        "y double, f double, nv double",
    )
    r = theil_u2(df, "y", "f", "nv").collect()[0]
    u2 = np.sqrt(((f - y) ** 2).sum() / ((nv - y) ** 2).sum())
    assert r["n"] == 200
    assert r["u2"] == pytest.approx(u2, rel=1e-9)
    assert r["u2"] < 1  # forecast beats the noisier benchmark


def test_theil_u2_perfect_naive_null(spark):
    df = spark.createDataFrame(
        [(1.0, 2.0, 1.0), (3.0, 2.5, 3.0)], "y double, f double, nv double"
    )
    r = theil_u2(df, "y", "f", "nv").collect()[0]
    assert r["u2"] is None  # denominator zero
