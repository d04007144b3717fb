"""Wave-37 operators: fixed-effects within estimator, between
estimator, cluster-robust (CR0) SE — validated against in-test numpy
brute-force references."""

import numpy as np
import pytest

from csp_gateway_spark.operators.analytics import (
    between_reg,
    cluster_se,
    fe_within,
)


def _panel(seed=37, n_groups=40, per=12):
    rng = np.random.RandomState(seed)
    g = np.repeat(np.arange(n_groups), per)
    alpha = rng.randn(n_groups) * 10  # entity effects
    x = np.round(rng.rand(len(g)) * 20 + alpha[g] * 0.5, 2)  # x correlated with effect
    y = np.round(2.0 * x + alpha[g] + rng.randn(len(g)), 2)
    return g, x, y


def _df(spark, g, x, y):
    rows = [(int(a), float(b), float(c)) for a, b, c in zip(g, x, y)]
    return spark.createDataFrame(rows, "g int, x double, y double")


def test_fe_within_brute_force(spark):
    g, x, y = _panel()
    r = fe_within(_df(spark, g, x, y), "g", "y", "x").collect()[0]
    cxx = cxy = cyy = 0.0
    for gi in np.unique(g):
        m = g == gi
        xd, yd = x[m] - x[m].mean(), y[m] - y[m].mean()
        cxx += (xd * xd).sum()
        cxy += (xd * yd).sum()
        cyy += (yd * yd).sum()
    assert r["n"] == len(g) and r["n_groups"] == 40
    assert r["beta"] == pytest.approx(cxy / cxx, rel=1e-9)
    assert r["r2_within"] == pytest.approx(cxy**2 / (cxx * cyy), rel=1e-9)
    # within estimator recovers the true slope 2.0 despite entity confounding
    assert r["beta"] == pytest.approx(2.0, abs=0.1)


def test_between_vs_within_divergence(spark):
    g, x, y = _panel(seed=5)
    rb = between_reg(_df(spark, g, x, y), "g", "y", "x").collect()[0]
    mx = np.array([x[g == gi].mean() for gi in np.unique(g)])
    my = np.array([y[g == gi].mean() for gi in np.unique(g)])
    cxx = ((mx - mx.mean()) ** 2).sum()
    cxy = ((mx - mx.mean()) * (my - my.mean())).sum()
    cyy = ((my - my.mean()) ** 2).sum()
    assert rb["n_groups"] == 40
    assert rb["beta"] == pytest.approx(cxy / cxx, rel=1e-9)
    assert rb["r2"] == pytest.approx(cxy**2 / (cxx * cyy), rel=1e-9)
    # entity effects load on group means: between slope is biased UP
    assert rb["beta"] > 2.3


def test_cluster_se_brute_force(spark):
    rng = np.random.RandomState(11)
    n_groups, per = 30, 20
    g = np.repeat(np.arange(n_groups), per)
    # x must be cluster-correlated too: the CR0 design effect is
    # ≈ 1 + (m−1)·ρ_x·ρ_e, so iid x would leave se_cluster ≈ se_ols
    xg = rng.rand(n_groups) * 8
    x = np.round(xg[g] + rng.rand(len(g)) * 2, 2)
    shock = rng.randn(n_groups) * 3  # within-cluster correlated errors
    y = np.round(1.0 + 0.5 * x + shock[g] + rng.randn(len(g)) * 0.3, 2)
    r = cluster_se(_df(spark, g, x, y), "g", "y", "x").collect()[0]
    n = len(g)
    b = ((x * y).sum() - x.sum() * y.sum() / n) / ((x * x).sum() - x.sum() ** 2 / n)
    a = (y.sum() - b * x.sum()) / n
    e = y - a - b * x
    xt = x - x.mean()
    cxx = (xt * xt).sum()
    hh = sum(((xt[g == gi] * e[g == gi]).sum()) ** 2 for gi in np.unique(g))
    se_cl = np.sqrt(hh) / cxx
    rss = (e * e).sum()
    se_ols = np.sqrt((rss / (n - 2)) / cxx)
    assert (r["n"], r["n_groups"]) == (n, n_groups)
    assert r["beta"] == pytest.approx(b, rel=1e-9)
    assert r["se_ols"] == pytest.approx(se_ols, rel=1e-7)
    assert r["se_cluster"] == pytest.approx(se_cl, rel=1e-7)
    # clustered shocks make the robust SE strictly larger
    assert r["se_cluster"] > 1.5 * r["se_ols"]


def test_fe_within_single_group_degenerate(spark):
    g = np.zeros(5, dtype=int)
    x = np.array([1.0, 2.0, 3.0, 4.0, 5.0])
    y = 2 * x
    r = fe_within(_df(spark, g, x, y), "g", "y", "x").collect()[0]
    assert r["n_groups"] == 1
    assert r["beta"] == pytest.approx(2.0, rel=1e-9)
    # perfect fit: cyy == cxy^2/cxx, r2 == 1
    assert r["r2_within"] == pytest.approx(1.0, rel=1e-9)


def test_between_constant_means_null(spark):
    # all group means identical -> cxx == 0 -> NULL beta
    g = np.array([0, 0, 1, 1])
    x = np.array([1.0, 3.0, 0.0, 4.0])  # both means = 2
    y = np.array([1.0, 2.0, 3.0, 4.0])
    r = between_reg(_df(spark, g, x, y), "g", "y", "x").collect()[0]
    assert r["beta"] is None
