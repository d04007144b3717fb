"""Hand-computed unit tests for the wave-29 (round 11) operators:
Tukey-Kramer HSD pairs and Aalen-Johansen cumulative incidence."""

from __future__ import annotations

import math

import pytest


def test_tukey_hsd_hand_computed(spark):
    from csp_gateway_spark.operators.analytics import tukey_hsd

    data = {"g1": [1.0, 2.0, 3.0], "g2": [4.0, 5.0, 6.0, 7.0], "g3": [10.0, 12.0]}
    rows = [(g, v) for g, vs in data.items() for v in vs]
    df = spark.createDataFrame(rows, "g string, y double")
    n = sum(len(v) for v in data.values())
    k = len(data)
    ssw = sum(
        sum((x - sum(vs) / len(vs)) ** 2 for x in vs) for vs in data.values()
    )
    msw = ssw / (n - k)
    out = {(r.g_a, r.g_b): r for r in tukey_hsd(df, "g", "y").collect()}
    assert set(out) == {("g1", "g2"), ("g1", "g3"), ("g2", "g3")}
    for (ga, gb), r in out.items():
        ma = sum(data[ga]) / len(data[ga])
        mb = sum(data[gb]) / len(data[gb])
        se = math.sqrt(msw / 2 * (1 / len(data[ga]) + 1 / len(data[gb])))
        assert abs(r.diff - (ma - mb)) < 1e-9
        assert abs(r.q - abs(ma - mb) / se) < 1e-9
        assert (r.n_a, r.n_b) == (len(data[ga]), len(data[gb]))


def test_cumulative_incidence_hand_computed(spark):
    from csp_gateway_spark.operators.analytics import cumulative_incidence

    # durations with two competing event types and censoring:
    # t=1: 1x type A (of 6 at risk); t=2: 1x type B, 1x censored (of 5)
    # t=3: 1x type A (of 3); t=4: 2x censored
    rows = [
        (1, "A"), (2, "B"), (2, "C"), (3, "A"), (4, "C"), (4, "C"),
    ]
    df = spark.createDataFrame(rows, "dur int, flag string")
    out = {r.t: r for r in cumulative_incidence(df, "dur", "flag", "A", "B").collect()}
    # manual Aalen-Johansen
    surv, cif_a, cif_b = 1.0, 0.0, 0.0
    expected = {}
    at_risk = 6
    steps = {1: (1, 0, 1), 2: (0, 1, 2), 3: (1, 0, 1), 4: (0, 0, 2)}
    for t in sorted(steps):
        d1, d2, ntot = steps[t]
        cif_a += surv * d1 / at_risk
        cif_b += surv * d2 / at_risk
        surv *= 1 - (d1 + d2) / at_risk
        if d1 + d2 > 0:
            expected[t] = (at_risk, d1, d2, cif_a, cif_b)
        at_risk -= ntot
    assert set(out) == set(expected)
    for t, (nr, d1, d2, ca, cb) in expected.items():
        r = out[t]
        assert (r.n_risk, r.d1, r.d2) == (nr, d1, d2)
        assert abs(r.cif1 - ca) < 1e-12
        assert abs(r.cif2 - cb) < 1e-12


def test_cumulative_incidence_sums_bounded(spark):
    from csp_gateway_spark.operators.analytics import cumulative_incidence

    # no censoring: CIF_A(inf) + CIF_B(inf) == 1
    rows = [(i, "A" if i % 2 == 0 else "B") for i in range(20)]
    df = spark.createDataFrame(rows, "dur int, flag string")
    out = cumulative_incidence(df, "dur", "flag", "A", "B").collect()
    last = max(out, key=lambda r: r.t)
    assert abs(last.cif1 + last.cif2 - 1.0) < 1e-12
    # monotone non-decreasing CIFs
    ordered = sorted(out, key=lambda r: r.t)
    for a, b in zip(ordered, ordered[1:]):
        assert b.cif1 >= a.cif1 - 1e-15 and b.cif2 >= a.cif2 - 1e-15
