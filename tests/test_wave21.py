"""Hand-computed unit tests for the wave-21 (round 9) operators:
evaluation/agreement/privacy/sequential (batch A), daily market
indicators (batch B), attribution/feature-selection/calibration
(batch C), and text/retrieval metrics (batch D)."""

from __future__ import annotations

import math

import pytest


def test_roc_auc_separable_and_ties(spark):
    from csp_gateway_spark.operators.analytics import roc_auc

    df = spark.createDataFrame(
        [(1.0, 0), (2.0, 0), (3.0, 1), (4.0, 1)], "score double, label int"
    )
    r = roc_auc(df, "score", "label").collect()[0]
    assert (r.n_pos, r.n_neg) == (2, 2)
    assert abs(r.auc - 1.0) < 1e-12
    # tie at 2.0: pairs (2>1)=1, (2=2)=0.5, (3>1)=1, (3>2)=1 -> 3.5/4
    df2 = spark.createDataFrame(
        [(1.0, 0), (2.0, 1), (2.0, 0), (3.0, 1)], "score double, label int"
    )
    r2 = roc_auc(df2, "score", "label").collect()[0]
    assert abs(r2.auc - 0.875) < 1e-12


def test_cohen_kappa_hand_computed(spark):
    from csp_gateway_spark.operators.analytics import cohen_kappa

    a = ["x", "x", "x", "x", "y", "y", "y", "y"]
    b = ["x", "x", "x", "y", "y", "y", "y", "x"]
    df = spark.createDataFrame(list(zip(a, b)), "ra string, rb string")
    r = cohen_kappa(df, "ra", "rb").collect()[0]
    assert r.n == 8
    assert abs(r.po - 0.75) < 1e-12
    assert abs(r.pe - 0.5) < 1e-12
    assert abs(r.kappa - 0.5) < 1e-12


def test_fleiss_kappa_hand_computed_and_guard(spark):
    from csp_gateway_spark.operators.analytics import fleiss_kappa

    # 2 items x 2 raters: item1 (a,a), item2 (a,b)
    rows = [(1, "a"), (1, "a"), (2, "a"), (2, "b")]
    df = spark.createDataFrame(rows, "item int, rating string")
    r = fleiss_kappa(df, "item", "rating").collect()[0]
    assert (r.n_items, r.n_raters) == (2, 2)
    assert abs(r.p_bar - 0.5) < 1e-12
    assert abs(r.p_e - 0.625) < 1e-12
    assert abs(r.kappa - (-1.0 / 3.0)) < 1e-12
    # unequal rater counts must raise in-plan
    bad = spark.createDataFrame(
        [(1, "a"), (1, "a"), (2, "a")], "item int, rating string"
    )
    with pytest.raises(Exception, match="unequal rater counts"):
        fleiss_kappa(bad, "item", "rating").collect()


def test_l_diversity_flags(spark):
    from csp_gateway_spark.operators.analytics import l_diversity

    rows = [
        ("g1", "s1"), ("g1", "s2"), ("g1", "s3"),
        ("g2", "s1"), ("g2", "s1"), ("g2", "s2"),
    ]
    df = spark.createDataFrame(rows, "qi string, sens string")
    out = {
        r.qi: r for r in l_diversity(df, ["qi"], "sens", l=3).collect()
    }
    assert out["g1"].k_count == 3 and out["g1"].l_distinct == 3
    assert not out["g1"].at_risk
    assert out["g2"].l_distinct == 2 and out["g2"].at_risk


def test_sprt_monitor_cumulative_llr(spark):
    from csp_gateway_spark.operators.analytics import sprt_monitor

    rows = [(1, 1), (1, 1), (1, 0), (2, 0), (2, 0)]
    df = spark.createDataFrame(rows, "day int, success int")
    out = {
        r.day: r
        for r in sprt_monitor(df, "day", "success", p0=0.3, p1=0.4).collect()
    }
    assert (out[1].t, out[1].k) == (3, 2)
    assert (out[2].t, out[2].k) == (5, 2)
    c1, c0 = math.log(0.4 / 0.3), math.log(0.6 / 0.7)
    assert abs(out[2].llr - (2 * c1 + 3 * c0)) < 1e-12
    assert out[2].decision == "continue"


def test_bollinger_bands_hand_computed(spark):
    import datetime

    from csp_gateway_spark.operators.analytics import bollinger_bands

    d = datetime.date
    rows = [
        (d(2024, 1, 1), 1.0),
        (d(2024, 1, 2), 2.0),
        (d(2024, 1, 3), 3.0),
        (d(2024, 1, 4), 100.0),
    ]
    df = spark.createDataFrame(rows, "day date, v double")
    out = {
        r.day.isoformat(): r
        for r in bollinger_bands(df, "day", "v", n=3, k=0.5).collect()
    }
    # first two days lack a complete 3-day window
    assert set(out) == {"2024-01-03", "2024-01-04"}
    r3 = out["2024-01-03"]
    assert abs(r3.mid - 2.0) < 1e-12 and abs(r3.std - 1.0) < 1e-12
    assert r3.breach == "up"  # k=0.5: upper = 2.5 < 3
    r4 = out["2024-01-04"]  # window (2,3,100): mean 35, value 100 > upper
    assert abs(r4.mid - 35.0) < 1e-9
    assert r4.breach == "up"
    # a calendar gap drops the window
    rows_gap = rows[:2] + [(d(2024, 1, 4), 3.0)]
    got = bollinger_bands(
        spark.createDataFrame(rows_gap, "day date, v double"), "day", "v", n=3
    ).collect()
    assert got == []


def test_rsi_hand_computed(spark):
    import datetime

    from csp_gateway_spark.operators.analytics import rsi

    d = datetime.date
    rows = [
        (d(2024, 1, 1), 1.0),
        (d(2024, 1, 2), 2.0),
        (d(2024, 1, 3), 3.0),
        (d(2024, 1, 4), 2.0),
    ]
    df = spark.createDataFrame(rows, "day date, v double")
    out = {
        r.day.isoformat(): r for r in rsi(df, "day", "v", n=2).collect()
    }
    assert abs(out["2024-01-03"].rsi - 100.0) < 1e-12  # gains only
    assert abs(out["2024-01-04"].rsi - 50.0) < 1e-12  # +1 / -1
    assert out["2024-01-03"].signal == "overbought"
    assert out["2024-01-04"].signal is None


def test_realized_volatility_hand_computed(spark):
    import datetime

    from csp_gateway_spark.operators.analytics import realized_volatility

    d = datetime.date
    rows = [(d(2024, 1, 1), 1.0), (d(2024, 1, 2), 2.0), (d(2024, 1, 3), 4.0)]
    df = spark.createDataFrame(rows, "day date, v double")
    r = realized_volatility(df, "day", "v").collect()[0]
    assert r.n_ret == 2
    assert abs(r.vol - math.log(2.0) * math.sqrt(2.0)) < 1e-12


def test_attribution_hand_computed(spark):
    from csp_gateway_spark.operators.analytics import attribution

    rows = [
        (1, 100, 1, "click"),
        (1, 200, 2, "view"),
        (1, 300, 3, "purchase"),
    ]
    df = spark.createDataFrame(rows, "user long, ts long, id long, typ string")
    out = {
        r.event_type: r
        for r in attribution(
            df, "user", "ts", "id", "typ", "purchase", window_ns=1000
        ).collect()
    }
    assert out["click"].first_credit == 1 and out["click"].last_credit == 0
    assert out["view"].last_credit == 1 and out["view"].first_credit == 0
    assert abs(out["click"].linear_credit - 0.5) < 1e-12
    assert abs(out["view"].linear_credit - 0.5) < 1e-12


def test_attribution_touch_cap_bounds_fanout(spark):
    """max_touches_per_conversion is an enforced operator bound: a
    conversion with more in-window touches than the cap credits only
    the most RECENT cap touches (first/linear over the capped set),
    and the cap validates."""
    import pytest

    from csp_gateway_spark.operators.analytics import attribution

    # one user, 6 touches (ts 1..6, alternating types), conversion at 10
    rows = [(1, t, t, "click" if t % 2 else "view") for t in range(1, 7)]
    rows.append((1, 10, 99, "purchase"))
    df = spark.createDataFrame(rows, "user long, ts long, id long, typ string")
    out = {
        r.event_type: r
        for r in attribution(
            df, "user", "ts", "id", "typ", "purchase", window_ns=100,
            max_touches_per_conversion=3,
        ).collect()
    }
    # capped set = most recent 3 touches: ts 6 (view), 5 (click), 4 (view)
    assert out["view"].touches == 2 and out["click"].touches == 1
    assert out["view"].last_credit == 1  # ts 6
    # first of the CAPPED set is ts 4 (a view); click ts 1/3 fell out
    assert out["view"].first_credit == 1 and out["click"].first_credit == 0
    assert abs(out["view"].linear_credit - 2.0 / 3.0) < 1e-12
    assert abs(out["click"].linear_credit - 1.0 / 3.0) < 1e-12
    # uncapped default reproduces the full 6-touch split
    full = {
        r.event_type: r
        for r in attribution(
            df, "user", "ts", "id", "typ", "purchase", window_ns=100
        ).collect()
    }
    assert full["click"].touches == 3 and full["view"].touches == 3
    with pytest.raises(ValueError, match="max_touches_per_conversion"):
        attribution(
            df, "user", "ts", "id", "typ", "purchase", window_ns=100,
            max_touches_per_conversion=0,
        )


def test_info_gain_perfect_and_uninformative(spark):
    from csp_gateway_spark.operators.analytics import info_gain

    rows = [
        ("x", "p", 1), ("x", "q", 1), ("z", "p", 0), ("z", "q", 0),
    ]
    df = spark.createDataFrame(rows, "fa string, fb string, y int")
    out = {r.feature: r for r in info_gain(df, ["fa", "fb"], "y").collect()}
    assert abs(out["fa"].h_label - math.log(2.0)) < 1e-12
    assert abs(out["fa"].ig - math.log(2.0)) < 1e-12  # perfect split
    assert abs(out["fb"].ig - 0.0) < 1e-12  # uninformative


def test_isotonic_calibration_pools_violation(spark):
    from csp_gateway_spark.operators.analytics import isotonic_calibration

    rows = [(0.15, 1)] * 3 + [(0.15, 0)] * 2 + [(0.35, 1)] * 1 + [(0.35, 0)] * 4
    df = spark.createDataFrame(rows, "score double, label int")
    out = {r.bin: r for r in isotonic_calibration(df, "score", "label", bins=10).collect()}
    assert abs(out[1].rate - 0.6) < 1e-12 and abs(out[3].rate - 0.2) < 1e-12
    # monotone violation -> both bins pool to 4/10
    assert abs(out[1].iso_rate - 0.4) < 1e-12
    assert abs(out[3].iso_rate - 0.4) < 1e-12


def test_readability_hand_computed(spark):
    from csp_gateway_spark.operators.text import readability

    df = spark.createDataFrame([("aa bb", "s1")], "text string, source string")
    r = readability(df, "text", "source").collect()[0]
    assert r.n_docs == 1
    assert abs(r.avg_words - 2.0) < 1e-12
    assert abs(r.syl_per_word - 0.5) < 1e-12  # one vowel group in 'aa'
    assert abs(r.letters_per_word - 2.0) < 1e-12
    assert abs(r.flesch - (206.835 - 1.015 * 2.0 - 84.6 * 0.5)) < 1e-12


def test_rouge_overlap_hand_computed(spark):
    from csp_gateway_spark.operators.corpus import rouge_overlap

    rows = [(0, "a b c", "s1"), (1, "b c d", "s1")]
    df = spark.createDataFrame(rows, "doc_id long, text string, source string")
    out = {
        r.metric: r for r in rouge_overlap(df, pair_offset=1).collect()
    }
    r1 = out["rouge1"]
    assert (r1.n_pairs, r1.overlap, r1.cand_total, r1.ref_total) == (1, 2, 3, 3)
    assert abs(r1.f1 - 2.0 / 3.0) < 1e-12
    r2 = out["rouge2"]
    assert (r2.overlap, r2.cand_total) == (1, 2)  # 'b c' shared
    assert abs(r2.precision - 0.5) < 1e-12


def test_retrieval_eval_hand_computed(spark):
    from csp_gateway_spark.operators.retrieval import retrieval_eval

    rows = [
        (0, "x x x y y"),  # tf=3 -> relevant
        (1, "x x y y y"),  # tf=2
        (2, "x y y y y"),  # tf=1
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    r = retrieval_eval(df, ["x"], k=2, rel_tf=3).collect()[0]
    assert (r.term, r.n_cand, r.total_rel, r.rel_at_k) == ("x", 3, 1, 1)
    # the tf=3 doc ranks first (same dl) -> perfect metrics
    assert abs(r.ndcg - 1.0) < 1e-12
    assert abs(r.mrr - 1.0) < 1e-12
    assert abs(r.recall - 1.0) < 1e-12


def test_quantile_normalize_aligns_groups(spark):
    from csp_gateway_spark.operators.analytics import quantile_normalize

    rows = [("a", 1), ("a", 2), ("b", 11), ("b", 12)]
    df = spark.createDataFrame(rows, "g string, v long")
    out = {
        (r.g, r.value): r.norm_value
        for r in quantile_normalize(df, "v", "g", grid=1000).collect()
    }
    # both groups map onto the SAME global reference values
    assert out[("a", 1)] == out[("b", 11)] == 2
    assert out[("a", 2)] == out[("b", 12)] == 12


def test_stl_decompose_hand_computed(spark):
    import datetime

    from csp_gateway_spark.operators.analytics import stl_decompose

    d = datetime.date
    # 14 consecutive days, strict weekly pattern + linear trend absent:
    # value = 10 + weekday bump on Sundays
    rows = [
        (d(2024, 1, 1 + i), 10.0 + (3.0 if (d(2024, 1, 1 + i).weekday() == 6) else 0.0))
        for i in range(14)
    ]
    df = spark.createDataFrame(rows, "day date, v double")
    out = {r.day.isoformat(): r for r in stl_decompose(df, "day", "v").collect()}
    # complete centered 7-day windows exist for days 4..11
    assert len(out) == 8
    # every trend is the weekly mean (one Sunday in each window)
    for r in out.values():
        assert abs(r.trend - (10.0 + 3.0 / 7.0)) < 1e-9
    # Sunday seasonal is positive, others negative, and they re-center
    sun = [r for r in out.values() if r.weekday == 0]
    assert sun and all(r.seasonal > 1.5 for r in sun)
    assert all(abs(r.residual) < 1e-9 for r in out.values())


def test_seasonal_anomaly_flags_break(spark):
    import datetime

    from csp_gateway_spark.operators.analytics import seasonal_anomaly

    d = datetime.date
    rows = []
    for i in range(28):
        day = d(2024, 1, 1 + i)
        v = 10.0 + (3.0 if day.weekday() == 6 else 0.0)
        if i == 14:
            v += 50.0  # the genuine anomaly
        rows.append((day, v))
    df = spark.createDataFrame(rows, "day date, v double")
    got = seasonal_anomaly(df, "day", "v", threshold=2.5).collect()
    assert any(r.day == d(2024, 1, 15) for r in got)


def test_pacf_matches_statsmodels_formula(spark):
    import datetime

    from csp_gateway_spark.operators.analytics import pacf

    d = datetime.date
    vals = [10.0, 12.0, 9.0, 14.0, 11.0, 13.0, 8.0, 15.0, 10.5, 12.5]
    rows = [(d(2024, 1, 1 + i), v) for i, v in enumerate(vals)]
    df = spark.createDataFrame(rows, "day date, v double")
    got = {r.lag: r for r in pacf(df, "day", "v", max_lag=3).collect()}

    # reference Durbin-Levinson in plain python over the same ACF
    n = len(vals)
    yb = sum(vals) / n
    den = sum((v - yb) ** 2 for v in vals)
    r = [
        sum((vals[t] - yb) * (vals[t + k] - yb) for t in range(n - k)) / den
        for k in range(1, 4)
    ]
    phi = [r[0]]
    expect = [r[0]]
    for k in range(2, 4):
        num = r[k - 1] - sum(phi[j] * r[k - 2 - j] for j in range(k - 1))
        dd = 1.0 - sum(phi[j] * r[j] for j in range(k - 1))
        a = num / dd
        phi = [phi[j] - a * phi[k - 2 - j] for j in range(k - 1)] + [a]
        expect.append(a)
    for k in range(1, 4):
        assert abs(got[k].acf - r[k - 1]) < 1e-9
        assert abs(got[k].pacf - expect[k - 1]) < 1e-9


def test_hill_tail_pareto_exact(spark):
    # exact Pareto(alpha=2) order stats: x_i = (n/i)^(1/2)
    n, k = 400, 50
    rows = [(float((n / i) ** 0.5),) for i in range(1, n + 1)]
    df = spark.createDataFrame(rows, "v double")
    r = __import__(
        "csp_gateway_spark.operators.analytics", fromlist=["hill_tail"]
    ).hill_tail(df, "v", k=k).collect()[0]
    assert r.k == k
    # Hill estimate on exact Pareto order stats ~ alpha = 2
    assert abs(r.hill_alpha - 2.0) < 0.15


def test_hill_tail_short_input_raises(spark):
    # fewer than k+1 positive values must fail loudly, not return a
    # NULL x_kplus1/hill_alpha via non-ANSI element_at
    import pytest

    from csp_gateway_spark.operators.analytics import hill_tail

    df = spark.createDataFrame([(float(i),) for i in range(1, 6)], "v double")
    with pytest.raises(Exception, match="hill_tail"):
        hill_tail(df, "v", k=10).collect()


def test_stl_decompose_rejects_non_weekly_period(spark):
    import datetime

    import pytest

    from csp_gateway_spark.operators.analytics import (
        seasonal_anomaly, stl_decompose,
    )

    rows = [
        (datetime.date(2024, 1, 1) + datetime.timedelta(days=i), 1.0)
        for i in range(30)
    ]
    df = spark.createDataFrame(rows, "day date, v double")
    with pytest.raises(ValueError, match="period"):
        stl_decompose(df, "day", "v", period=12)
    with pytest.raises(ValueError, match="period"):
        seasonal_anomaly(df, "day", "v", period=30)


def test_expectations_report_counts(spark):
    from pyspark.sql import functions as F

    from csp_gateway_spark.operators.analytics import expectations_report

    df = spark.createDataFrame(
        [(1, 5.0), (2, -1.0), (3, None)], "id int, v double"
    )
    out = {
        r.rule: r
        for r in expectations_report(
            df, {"positive_v": F.col("v") > 0, "has_v": F.col("v").isNotNull()}
        ).collect()
    }
    assert out["positive_v"].checked == 3
    assert out["positive_v"].violations == 2  # -1 and NULL both fail
    assert out["has_v"].violations == 1


def test_fdr_bh_hand_computed(spark):
    from csp_gateway_spark.operators.analytics import fdr_bh

    # classic BH at q=0.25 over m=4: p=(0.01,0.04,0.2,0.9)
    # thresholds i*q/m = 0.0625, 0.125, 0.1875, 0.25 -> imax=2
    rows = [("a", 0.01), ("b", 0.04), ("c", 0.2), ("d", 0.9)]
    df = spark.createDataFrame(rows, "k string, p double")
    out = {r.k: r for r in fdr_bh(df, "k", "p", q=0.25).collect()}
    assert out["a"].rejected and out["b"].rejected
    assert not out["c"].rejected and not out["d"].rejected
    assert out["c"].rank == 3


def test_code_switch_flags_mixed_doc(spark):
    from csp_gateway_spark.operators.text import code_switch

    rows = [
        (0, "the cat and the dog", "s1"),       # en only
        (1, "the dog et la vie de paris", "s1"),  # en + fr markers
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string, source string")
    r = code_switch(df).collect()[0]
    assert r.n_docs == 2 and r.n_multilang == 1


def test_burrows_delta_symmetry_and_zero(spark):
    from csp_gateway_spark.operators.corpus import burrows_delta

    rows = [
        (0, "a a b c", "s1"), (1, "a a b c", "s2"), (2, "b b b a", "s3"),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string, source string")
    out = {(r.source_a, r.source_b): r.delta for r in burrows_delta(df, top_v=3).collect()}
    # identical frequency profiles -> delta 0; s3 differs
    assert abs(out[("s1", "s2")]) < 1e-12
    assert out[("s1", "s3")] > 0.1


def test_packed_array_cap_guards_round9(spark):
    import pytest as _pytest

    import csp_gateway_spark.operators.analytics as A_mod
    from csp_gateway_spark.operators.analytics import (
        attribution, info_gain, seasonal_anomaly, stl_decompose,
    )

    old = A_mod.PACKED_ARRAY_CAP
    try:
        A_mod.PACKED_ARRAY_CAP = 2  # module default read at call time
        import datetime

        d = datetime.date
        days = [(d(2024, 1, 1 + i), float(10 + i % 3)) for i in range(21)]
        daily = spark.createDataFrame(days, "day date, v double")
        with _pytest.raises(Exception, match="PACKED_ARRAY_CAP"):
            stl_decompose(daily, "day", "v").collect()
        with _pytest.raises(Exception, match="PACKED_ARRAY_CAP"):
            seasonal_anomaly(daily, "day", "v", threshold=0.0).collect()
        ev = spark.createDataFrame(
            [(1, 100 + i, i, "t" if i % 3 else "purchase") for i in range(30)],
            "u long, ts long, id long, typ string",
        )
        with _pytest.raises(Exception, match="PACKED_ARRAY_CAP"):
            attribution(ev, "u", "ts", "id", "typ", "purchase", 1000).collect()
        doc = spark.createDataFrame(
            [(str(i), str(i % 5), i % 2) for i in range(20)],
            "fa string, fb string, y int",
        )
        with _pytest.raises(Exception, match="PACKED_ARRAY_CAP"):
            info_gain(doc, ["fa"], "y").collect()
    finally:
        A_mod.PACKED_ARRAY_CAP = old


def test_ar_forecast_matches_python_reference(spark):
    import datetime

    from csp_gateway_spark.operators.analytics import ar_forecast

    d = datetime.date
    vals = [10.0, 12.0, 9.0, 14.0, 11.0, 13.0, 8.0, 15.0, 10.5, 12.5, 11.0, 9.5]
    rows = [(d(2024, 1, 1 + i), v) for i, v in enumerate(vals)]
    df = spark.createDataFrame(rows, "day date, v double")
    got = {r.h: r.forecast for r in ar_forecast(df, "day", "v", p=2, horizon=3).collect()}

    n = len(vals)
    yb = sum(vals) / n
    den = sum((v - yb) ** 2 for v in vals)
    r = [
        sum((vals[t] - yb) * (vals[t + k] - yb) for t in range(n - k)) / den
        for k in (1, 2)
    ]
    # Durbin-Levinson to order 2
    phi = [r[0]]
    a = (r[1] - phi[0] * r[0]) / (1.0 - phi[0] * r[0])
    phi = [phi[0] - a * phi[0], a]
    st = [vals[-1] - yb, vals[-2] - yb]
    expect = []
    for _ in range(3):
        pred = phi[0] * st[0] + phi[1] * st[1]
        st = [pred, st[0]]
        expect.append(pred + yb)
    for h in (1, 2, 3):
        assert abs(got[h] - expect[h - 1]) < 1e-9


def test_mmr_rerank_diversifies(spark):
    from csp_gateway_spark.operators.retrieval import mmr_rerank

    # three docs contain 'x'; doc 0 and 1 are near-identical token
    # sets, doc 2 is different.  Pure relevance would rank (0, 1, 2);
    # MMR must demote the near-duplicate and pick doc 2 second.
    rows = [
        (0, "x x x a b c d"),
        (1, "x x a b c d e"),
        (2, "x p q r s t u"),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    got = [
        (r.rank, r.doc_id)
        for r in mmr_rerank(df, ["x"], k=3, pool=3, lam=0.5)
        .orderBy("rank")
        .collect()
    ]
    assert got[0][1] == 0  # highest BM25 first
    assert got[1][1] == 2  # diversity beats the near-dup
    assert got[2][1] == 1


def test_t_closeness_hand_computed(spark):
    from csp_gateway_spark.operators.analytics import t_closeness

    # group g1 has sensitive dist (2 a, 0 b); global is (3 a, 1 b).
    rows = [("g1", "a"), ("g1", "a"), ("g2", "a"), ("g2", "b")]
    df = spark.createDataFrame(rows, "qi string, s string")
    out = {r.qi: r for r in t_closeness(df, ["qi"], "s", t=0.2).collect()}
    # m=2 categories: EMD(g1) = |1.0 - 0.75| = 0.25 (cum diff at 'a')
    assert abs(out["g1"].emd - 0.25) < 1e-12
    assert out["g1"].violates_t
    assert abs(out["g2"].emd - 0.25) < 1e-12


def test_brier_decomposition_identities(spark):
    from csp_gateway_spark.operators.analytics import brier_decomposition

    rows = [(0.025, 0)] * 9 + [(0.025, 1)] + [(0.975, 1)] * 8 + [(0.975, 0)] * 2
    df = spark.createDataFrame(rows, "score double, label int")
    r = brier_decomposition(df, "score", "label", bins=20).collect()[0]
    assert r.n == 20
    # plain-python Murphy reference: bins (center, w, s)
    cells = [(0.025, 10, 1), (0.975, 10, 8)]
    n = 20
    yb = 9 / 20
    rel = sum(w * (s / w - c) ** 2 for c, w, s in cells) / n
    res = sum(w * (s / w - yb) ** 2 for c, w, s in cells) / n
    unc = yb * (1 - yb)
    assert abs(r.reliability - rel) < 1e-12
    assert abs(r.resolution - res) < 1e-12
    assert abs(r.uncertainty - unc) < 1e-12
    assert abs(r.brier_binned - (rel - res + unc)) < 1e-12
