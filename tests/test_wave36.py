"""Wave-36 operators: Cox proportional hazards (Breslow, fixed Newton
steps), Schoenfeld PH-trend, Harrell's C — validated against in-test
numpy brute-force references that replicate the SAME fixed-step
contract."""

import numpy as np
import pytest

from csp_gateway_spark.operators.analytics import (
    cox_ph,
    harrell_c,
    schoenfeld_trend,
)


def _cohort(seed=36, n=400):
    rng = np.random.RandomState(seed)
    x = rng.randint(1, 8, size=n).astype(float)  # quantized score
    # exponential survival with hazard increasing in x
    u = rng.rand(n)
    t_true = np.ceil(-np.log(u) / (0.05 * np.exp(0.3 * (x - 4))) )
    c_time = np.ceil(rng.rand(n) * 40) + 1
    t_obs = np.minimum(t_true, c_time).astype(int)
    event = (t_true <= c_time).astype(int)
    return t_obs, event, x


def _df(spark, t, e, x):
    rows = [(int(a), int(b), float(c)) for a, b, c in zip(t, e, x)]
    return spark.createDataFrame(rows, "t int, e int, x double")


def _cox_brute(t, e, x, steps=3):
    beta = 0.0
    times = np.unique(t)
    for _ in range(steps + 1):  # last loop only evaluates
        U = 0.0
        I = 0.0
        for tt in times:
            at = t == tt
            d = e[at].sum()
            if d == 0:
                continue
            risk = t >= tt
            w = np.exp(beta * x[risk])
            s0 = w.sum()
            s1 = (w * x[risk]).sum()
            s2 = (w * x[risk] ** 2).sum()
            U += x[at][e[at] == 1].sum() - d * s1 / s0
            I += d * (s2 / s0 - (s1 / s0) ** 2)
        if _ < steps:
            beta = beta + U / I
    return beta, 1.0 / np.sqrt(I)


def test_cox_brute_force(spark):
    t, e, x = _cohort()
    r = cox_ph(_df(spark, t, e, x), "t", "e", "x").collect()[0]
    beta, se = _cox_brute(t, e, x, steps=3)
    assert r["n_events"] == int(e.sum())
    assert r["beta"] == pytest.approx(beta, rel=1e-9)
    assert r["se"] == pytest.approx(se, rel=1e-9)
    assert r["hr"] == pytest.approx(np.exp(beta), rel=1e-9)
    # hazard increases in x by construction
    assert r["beta"] > 0.1


def test_cox_no_events_keeps_beta_zero(spark):
    t = np.array([5, 6, 7, 8])
    e = np.zeros(4, dtype=int)
    x = np.array([1.0, 2.0, 3.0, 4.0])
    r = cox_ph(_df(spark, t, e, x), "t", "e", "x").collect()[0]
    assert r["n_events"] in (0, None) or r["n_events"] == 0
    assert r["beta"] == 0.0 and r["se"] is None


def test_schoenfeld_brute_force(spark):
    t, e, x = _cohort(seed=99)
    r = schoenfeld_trend(_df(spark, t, e, x), "t", "e", "x").collect()[0]
    beta, _ = _cox_brute(t, e, x, steps=3)
    rs, ts_ = [], []
    for tt in np.unique(t):
        at = (t == tt) & (e == 1)
        d = at.sum()
        if d == 0:
            continue
        risk = t >= tt
        w = np.exp(beta * x[risk])
        E = (w * x[risk]).sum() / w.sum()
        for xv in x[at]:
            rs.append(xv - E)
            ts_.append(tt)
    rs, ts_ = np.array(rs), np.array(ts_, dtype=float)
    corr = np.corrcoef(rs, ts_)[0, 1]
    n = len(rs)
    assert r["n_events"] == n
    assert r["corr"] == pytest.approx(corr, rel=1e-7)
    assert r["t_stat"] == pytest.approx(
        corr * np.sqrt((n - 2) / (1 - corr**2)), rel=1e-7
    )


def test_harrell_c_brute_force(spark):
    t, e, x = _cohort(seed=7, n=250)
    r = harrell_c(_df(spark, t, e, x), "t", "e", "x").collect()[0]
    comp = conc = tie = 0
    n = len(t)
    for i in range(n):
        if e[i] != 1:
            continue
        for j in range(n):
            if t[j] > t[i]:
                comp += 1
                if x[i] > x[j]:
                    conc += 1
                elif x[i] == x[j]:
                    tie += 1
    assert (r["n_comparable"], r["n_concordant"], r["n_tied"]) == (comp, conc, tie)
    assert r["c_index"] == pytest.approx((2 * conc + tie) / (2 * comp), rel=1e-12)
    # higher score → earlier event by construction, so C > 0.5
    assert r["c_index"] > 0.55


def test_harrell_c_no_comparable_pairs(spark):
    # all identical observed times: nothing is strictly later
    t = np.array([5, 5, 5])
    e = np.array([1, 1, 0])
    x = np.array([1.0, 2.0, 3.0])
    r = harrell_c(_df(spark, t, e, x), "t", "e", "x").collect()[0]
    assert r["n_comparable"] == 0 and r["c_index"] is None


def test_cox_invalid_steps_raises(spark):
    with pytest.raises(ValueError):
        cox_ph(_df(spark, np.array([1]), np.array([1]), np.array([1.0])),
               "t", "e", "x", steps=0)
