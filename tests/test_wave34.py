"""Wave-34 operators: Deming regression, Bland-Altman agreement,
Youden optimal cutoff, decile lift table — validated against in-test
numpy brute-force references."""

import math

import numpy as np
import pytest
from pyspark.sql import functions as F

from csp_gateway_spark.operators.analytics import (
    bland_altman,
    deming_regression,
    lift_table,
    optimal_cutoff,
)


def test_deming_vs_closed_form(spark):
    rng = np.random.RandomState(23)
    xt = np.round(rng.rand(300) * 100, 2)
    x = np.round(xt + rng.randn(300), 2)
    y = np.round(3 * xt + 5 + rng.randn(300), 2)
    df = spark.createDataFrame(
        [(float(a), float(b)) for a, b in zip(x, y)], "x double, y double"
    )
    r = deming_regression(df, "x", "y").collect()[0]
    cxx = ((x - x.mean()) ** 2).sum()
    cyy = ((y - y.mean()) ** 2).sum()
    cxy = ((x - x.mean()) * (y - y.mean())).sum()
    beta = (cyy - cxx + math.sqrt((cyy - cxx) ** 2 + 4 * cxy**2)) / (2 * cxy)
    assert r["n"] == 300
    assert r["slope"] == pytest.approx(beta, abs=1e-9)
    assert r["intercept"] == pytest.approx(y.mean() - beta * x.mean(), abs=1e-6)
    # errors-in-variables: Deming slope must exceed the attenuated OLS slope
    assert beta > cxy / cxx
    with pytest.raises(ValueError, match="delta"):
        deming_regression(df, "x", "y", delta=0)


def test_bland_altman_vs_numpy(spark):
    rng = np.random.RandomState(29)
    x = np.round(rng.rand(400) * 50, 2)
    y = np.round(x + rng.randn(400) * 0.7 + 0.2, 2)
    df = spark.createDataFrame(
        [(float(a), float(b)) for a, b in zip(x, y)], "x double, y double"
    )
    r = bland_altman(df, "x", "y").collect()[0]
    d = x - y
    md, sd = d.mean(), d.std(ddof=1)
    lo, hi = md - 1.96 * sd, md + 1.96 * sd
    assert r["n"] == 400
    assert r["mean_diff"] == pytest.approx(md, abs=1e-9)
    assert r["sd_diff"] == pytest.approx(sd, abs=1e-9)
    assert r["loa_low"] == pytest.approx(lo, abs=1e-9)
    assert r["loa_high"] == pytest.approx(hi, abs=1e-9)
    assert r["n_outside"] == int(((d < lo) | (d > hi)).sum())


def test_optimal_cutoff_brute_force(spark):
    rng = np.random.RandomState(31)
    score = rng.randint(0, 50, 500)
    label = (rng.rand(500) < (score / 60)).astype(int)
    df = spark.createDataFrame(
        [(int(s), int(l)) for s, l in zip(score, label)], "s int, l int"
    )
    r = optimal_cutoff(df, "s", "l").collect()[0]
    P = int(label.sum())
    N = len(label) - P
    best = None
    for t in sorted(set(score.tolist())):
        tp = int(((score >= t) & (label == 1)).sum())
        fp = int(((score >= t) & (label == 0)).sum())
        jn = tp * N - fp * P
        if best is None or jn > best[0] or (jn == best[0] and t < best[1]):
            best = (jn, t, tp, fp)
    jn, t, tp, fp = best
    assert (r["n_pos"], r["n_neg"], r["threshold"]) == (P, N, t)
    assert r["j_stat"] == pytest.approx(jn / (P * N), abs=1e-12)
    assert r["sensitivity"] == pytest.approx(tp / P, abs=1e-12)
    assert r["specificity"] == pytest.approx((N - fp) / N, abs=1e-12)


def test_lift_table_brute_force(spark):
    rng = np.random.RandomState(37)
    n, K = 500, 10
    score = rng.randint(0, 50, n)
    label = (rng.rand(n) < (score / 60)).astype(int)
    df = spark.createDataFrame(
        [(int(s), int(l), i) for i, (s, l) in enumerate(zip(score, label))],
        "s int, l int, id int",
    )
    rows = lift_table(df, "s", "l", "id", k=K).collect()
    order = np.lexsort((np.arange(n), -score.astype(float)))
    sl = label[order]
    tiles = (np.arange(n) * K) // n + 1
    got = {r["tile"]: (r["n"], r["positives"]) for r in rows}
    exp = {
        t: (int((tiles == t).sum()), int(sl[tiles == t].sum()))
        for t in range(1, K + 1)
    }
    assert got == exp
    base = label.sum() / n
    cum = 0
    for r in sorted(rows, key=lambda r: r["tile"]):
        cum += r["positives"]
        assert r["cum_gain"] == pytest.approx(cum / label.sum(), abs=1e-12)
        assert r["lift"] == pytest.approx((r["positives"] / r["n"]) / base, abs=1e-12)
    # top decile of a positively-predictive score must out-lift the bottom
    assert rows[0]["lift"] > sorted(rows, key=lambda r: r["tile"])[-1]["lift"]
    with pytest.raises(ValueError, match="k must be"):
        lift_table(df, "s", "l", "id", k=1)
