"""Wave-32 operators: ordinal association (γ / Somers' D),
Dickey-Fuller unit root, Hurst rescaled-range, k-sample
Anderson-Darling — each validated against an in-test brute-force
reference (no scipy in the sandbox)."""

import math

import numpy as np
import pytest
from pyspark.sql import functions as F

from csp_gateway_spark.operators.analytics import (
    anderson_ksamp,
    dickey_fuller,
    hurst_exponent,
    ordinal_association,
)


def test_ordinal_association_brute_force(spark):
    rng = np.random.RandomState(7)
    a = rng.randint(0, 5, 300)
    b = np.clip(a + rng.randint(-2, 3, 300), 0, 6)
    C = D = 0
    for i in range(300):
        s = (a[i] - a[i + 1:]) * (b[i] - b[i + 1:])
        C += int((s > 0).sum())
        D += int((s < 0).sum())
    n = 300
    n0 = n * (n - 1) // 2
    t_a = sum(int(c) * (int(c) - 1) // 2 for c in np.bincount(a))
    t_b = sum(int(c) * (int(c) - 1) // 2 for c in np.bincount(b))
    df = spark.createDataFrame(
        [(int(x), int(y)) for x, y in zip(a, b)], "a int, b int"
    )
    r = ordinal_association(df, "a", "b").collect()[0]
    assert (r["concordant"], r["discordant"]) == (C, D)
    assert r["gamma"] == pytest.approx((C - D) / (C + D), abs=1e-12)
    assert r["somers_ba"] == pytest.approx((C - D) / (n0 - t_a), abs=1e-12)
    assert r["somers_ab"] == pytest.approx((C - D) / (n0 - t_b), abs=1e-12)


def test_ordinal_association_max_cells_guard(spark):
    df = spark.range(100).select(
        F.col("id").alias("a"), (F.col("id") * 7 % 100).alias("b")
    )
    with pytest.raises(Exception, match="max_cells"):
        ordinal_association(df, "a", "b", max_cells=10).collect()


def test_dickey_fuller_vs_numpy_ols(spark):
    rng = np.random.RandomState(11)
    y = np.round(np.cumsum(rng.randn(200)) + 50, 2)
    df = spark.createDataFrame(
        [(i, float(v)) for i, v in enumerate(y)], "k int, v double"
    )
    r = dickey_fuller(df, "k", "v").collect()[0]
    x, d = y[:-1], np.diff(y)
    X = np.column_stack([np.ones_like(x), x])
    coef, *_ = np.linalg.lstsq(X, d, rcond=None)
    rss = float(((d - X @ coef) ** 2).sum())
    se = math.sqrt(rss / (len(d) - 2) / ((x - x.mean()) ** 2).sum())
    assert r["n_pairs"] == 199
    assert r["beta"] == pytest.approx(coef[1], abs=1e-9)
    assert r["t_stat"] == pytest.approx(coef[1] / se, abs=1e-9)
    # mean-reverting series must reject the unit root far harder than
    # the random walk does
    y2 = np.round(rng.randn(200), 2)
    df2 = spark.createDataFrame(
        [(i, float(v)) for i, v in enumerate(y2)], "k int, v double"
    )
    r2 = dickey_fuller(df2, "k", "v").collect()[0]
    assert r2["t_stat"] < -8 < r["t_stat"]


def test_dickey_fuller_degenerate(spark):
    df = spark.createDataFrame([(0, 1.0), (1, 2.0)], "k int, v double")
    r = dickey_fuller(df, "k", "v").collect()[0]
    assert r["n_pairs"] == 1 and r["t_stat"] is None


def test_hurst_exponent_brute_force(spark):
    rng = np.random.RandomState(3)
    y = np.round(np.cumsum(rng.randn(600)) + 100, 2)
    df = spark.createDataFrame(
        [(i, float(v)) for i, v in enumerate(y)], "k int, v double"
    )
    rows = hurst_exponent(df, "k", "v", window_sizes=(8, 16, 32)).collect()
    got = {r["w"]: r for r in rows}
    pts = []
    for w in (8, 16, 32):
        nb = len(y) // w
        rs = []
        for bkt in range(nb):
            seg = y[bkt * w:(bkt + 1) * w]
            dev = np.cumsum(seg - seg.mean())
            if seg.std() > 0:
                rs.append((dev.max() - dev.min()) / seg.std())
        assert got[w]["n_blocks"] == nb
        assert got[w]["rs_mean"] == pytest.approx(np.mean(rs), abs=1e-6)
        pts.append((math.log(w), math.log(np.mean(rs))))
    xs = np.array([p[0] for p in pts])
    ys = np.array([p[1] for p in pts])
    slope = (len(xs) * (xs * ys).sum() - xs.sum() * ys.sum()) / (
        len(xs) * (xs * xs).sum() - xs.sum() ** 2
    )
    assert rows[0]["hurst"] == pytest.approx(slope, abs=1e-9)
    # a random walk's H is near 1 on the raw level series; white noise
    # (the DIFFERENCED walk) must come out much lower
    dfw = spark.createDataFrame(
        [(i, float(v)) for i, v in enumerate(np.round(rng.randn(600), 2))],
        "k int, v double",
    )
    h_noise = hurst_exponent(dfw, "k", "v", window_sizes=(8, 16, 32)).collect()[0]["hurst"]
    assert h_noise < rows[0]["hurst"]


def test_hurst_exponent_contract(spark):
    df = spark.createDataFrame([(0, 1.0)], "k int, v double")
    with pytest.raises(ValueError, match="window sizes"):
        hurst_exponent(df, "k", "v", window_sizes=(8,))
    with pytest.raises(ValueError, match="window sizes"):
        hurst_exponent(df, "k", "v", window_sizes=(2, 8))
    with pytest.raises(ValueError, match="bounded-partition"):
        hurst_exponent(df, "k", "v", window_sizes=(16, 200_000))


def _ad_ksamp_reference(samples):
    """Direct port of the Scholz-Stephens midrank formulas (the
    scipy.stats.anderson_ksamp statistic + normalization)."""
    Z = np.sort(np.concatenate(samples))
    N = len(Z)
    Zstar = np.unique(Z)
    n = np.array([len(s) for s in samples])
    k = len(samples)
    lj = np.array([(Z == z).sum() for z in Zstar])
    Bj = lj.cumsum() - lj / 2.0
    A2 = 0.0
    for i in range(k):
        fij = np.array([(samples[i] == z).sum() for z in Zstar])
        Mij = fij.cumsum() - fij / 2.0
        inner = (
            lj / float(N) * (N * Mij - Bj * n[i]) ** 2
            / (Bj * (N - Bj) - N * lj / 4.0)
        )
        A2 += inner.sum() / n[i]
    A2 *= (N - 1.0) / N
    H = (1.0 / n).sum()
    hs_cs = (1.0 / np.arange(N - 1, 1, -1)).cumsum()
    h = hs_cs[-1] + 1
    g = (hs_cs / np.arange(2, N)).sum()
    a = (4 * g - 6) * (k - 1) + (10 - 6 * g) * H
    b = (2 * g - 4) * k**2 + 8 * h * k + (2 * g - 14 * h - 4) * H - 8 * h + 4 * g - 6
    c = (6 * h + 2 * g - 2) * k**2 + (4 * h - 6 * g + 2) * k + (2 * h - 6) * H + 4 * h
    d = (2 * h + 6) * k**2 - 4 * h * k
    sigmasq = (a * N**3 + b * N**2 + c * N + d) / ((N - 1.0) * (N - 2.0) * (N - 3.0))
    return A2, (A2 - (k - 1)) / math.sqrt(sigmasq)


def test_anderson_ksamp_vs_reference(spark):
    rng = np.random.RandomState(5)
    s1 = np.round(rng.randn(80), 1)
    s2 = np.round(rng.randn(120) + 0.3, 1)
    s3 = np.round(rng.randn(60), 1)
    rows = (
        [("a", float(v)) for v in s1]
        + [("b", float(v)) for v in s2]
        + [("c", float(v)) for v in s3]
    )
    df = spark.createDataFrame(rows, "g string, v double")
    r = anderson_ksamp(df, "g", "v", ["a", "b", "c"]).collect()[0]
    exp_a2, exp_z = _ad_ksamp_reference([s1, s2, s3])
    assert (r["n"], r["k"]) == (260, 3)
    assert r["a2"] == pytest.approx(exp_a2, abs=1e-7)
    assert r["z"] == pytest.approx(exp_z, abs=1e-6)
    # shifted samples must score a LARGER A2 than iid ones
    s4 = np.round(rng.randn(120), 1)
    df_iid = spark.createDataFrame(
        [("a", float(v)) for v in s1] + [("b", float(v)) for v in s4],
        "g string, v double",
    )
    r_iid = anderson_ksamp(df_iid, "g", "v", ["a", "b"]).collect()[0]
    df_shift = spark.createDataFrame(
        [("a", float(v)) for v in s1] + [("b", float(v + 2.0)) for v in s4],
        "g string, v double",
    )
    r_shift = anderson_ksamp(df_shift, "g", "v", ["a", "b"]).collect()[0]
    assert r_shift["a2"] > r_iid["a2"]


def test_anderson_ksamp_contracts(spark):
    df = spark.createDataFrame([("a", 1.0), ("b", 2.0)], "g string, v double")
    with pytest.raises(ValueError, match="groups"):
        anderson_ksamp(df, "g", "v", ["a"])
    # empty after filter -> degenerate row, not a crash
    r = anderson_ksamp(
        df.filter(F.col("g") == "zz"), "g", "v", ["a", "b"]
    ).collect()[0]
    assert (r["n"], r["k"], r["a2"], r["z"]) == (0, 2, None, None)
    # a group with zero observations is a contract error
    with pytest.raises(ValueError, match="at least one"):
        anderson_ksamp(df, "g", "v", ["a", "nope"])
