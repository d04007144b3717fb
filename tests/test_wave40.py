"""Wave-40 operators: 1-D energy distance and Conover squared-ranks
variance test — validated against in-test numpy brute-force
references (O(n²) pair sums on small samples)."""

import numpy as np
import pytest

from csp_gateway_spark.operators.analytics import (
    conover_squared_ranks,
    energy_distance,
)


def _df(spark, xa, xb):
    rows = [("a", float(v)) for v in xa] + [("b", float(v)) for v in xb]
    return spark.createDataFrame(rows, "g string, v double")


def test_energy_distance_brute_force(spark):
    rng = np.random.RandomState(40)
    xa = np.round(rng.randn(120) * 2 + 10, 2)
    xb = np.round(rng.randn(150) * 3 + 12, 2)
    r = energy_distance(_df(spark, xa, xb), "g", "v", "a", "b").collect()[0]
    cross = np.abs(xa[:, None] - xb[None, :]).mean()
    waa = np.abs(xa[:, None] - xa[None, :]).mean()
    wbb = np.abs(xb[:, None] - xb[None, :]).mean()
    d2 = 2 * cross - waa - wbb
    n, m = len(xa), len(xb)
    assert (r["n_a"], r["n_b"]) == (n, m)
    assert r["d2"] == pytest.approx(d2, rel=1e-9)
    assert r["e_stat"] == pytest.approx(n * m / (n + m) * d2, rel=1e-9)
    assert r["d2"] > 0  # different location+scale by construction


def test_energy_distance_identical_zero(spark):
    xa = np.array([1.0, 2.0, 3.0, 4.0])
    r = energy_distance(_df(spark, xa, xa), "g", "v", "a", "b").collect()[0]
    assert r["d2"] == pytest.approx(0.0, abs=1e-12)


def test_energy_distance_with_ties(spark):
    xa = np.array([1.0, 1.0, 2.0, 2.0, 5.0])
    xb = np.array([1.0, 2.0, 2.0, 7.0])
    r = energy_distance(_df(spark, xa, xb), "g", "v", "a", "b").collect()[0]
    cross = np.abs(xa[:, None] - xb[None, :]).mean()
    waa = np.abs(xa[:, None] - xa[None, :]).mean()
    wbb = np.abs(xb[:, None] - xb[None, :]).mean()
    assert r["d2"] == pytest.approx(2 * cross - waa - wbb, rel=1e-12)


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


def test_conover_brute_force(spark):
    rng = np.random.RandomState(17)
    xa = np.round(rng.randn(100) * 1.0 + 5, 2)   # tight
    xb = np.round(rng.randn(130) * 3.0 + 5, 2)   # wide: variances differ
    r = conover_squared_ranks(_df(spark, xa, xb), "g", "v", "a", "b").collect()[0]
    ua = np.abs(xa - xa.mean())
    ub = np.abs(xb - xb.mean())
    pooled = np.concatenate([ua, ub])
    ranks = _midranks(pooled)
    q = ranks**2
    n, m = len(xa), len(xb)
    N = n + m
    T = q[:n].sum()
    meanq = q.mean()
    varpop = (q**2).mean() - meanq**2
    z = (T - n * meanq) / np.sqrt(n * m / (N - 1) * varpop)
    assert (r["n_a"], r["n_b"]) == (n, m)
    assert r["t_stat"] == pytest.approx(T, rel=1e-9)
    assert r["z"] == pytest.approx(z, rel=1e-9)
    # cohort A is tighter: its deviation ranks are LOW -> z strongly negative
    assert r["z"] < -3


def test_conover_equal_scale_small_z(spark):
    rng = np.random.RandomState(3)
    xa = np.round(rng.randn(200) + 5, 2)
    xb = np.round(rng.randn(200) + 9, 2)  # location shift only
    r = conover_squared_ranks(_df(spark, xa, xb), "g", "v", "a", "b").collect()[0]
    assert abs(r["z"]) < 2.5  # scale test ignores the location shift
