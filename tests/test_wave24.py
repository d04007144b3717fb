"""Hand-computed unit tests for the wave-24 (round 11) operators:
time-series diagnostics (Durbin-Watson, Ljung-Box), paired tests
(McNemar, Page trend), Bartlett variance homogeneity, Hodges-Lehmann
shift, degree assortativity, and source diversity."""

from __future__ import annotations

import math

import pytest


def test_durbin_watson_hand_computed(spark):
    from csp_gateway_spark.operators.analytics import durbin_watson

    ys = [3.0, 5.0, 4.0, 8.0, 6.0]
    df = spark.createDataFrame(
        [(i, y) for i, y in enumerate(ys)], "k long, y double"
    )
    n = len(ys)
    mean = sum(ys) / n
    num = sum((ys[t] - ys[t - 1]) ** 2 for t in range(1, n))
    den = sum((y - mean) ** 2 for y in ys)
    r = durbin_watson(df, "k", "y").collect()[0]
    assert r.n == n
    assert abs(r.dw - num / den) < 1e-9


def test_durbin_watson_gap_skips_pair(spark):
    from csp_gateway_spark.operators.analytics import durbin_watson

    # keys 0,1,5: only (0,1) is adjacent -> one difference
    df = spark.createDataFrame(
        [(0, 1.0), (1, 4.0), (5, 10.0)], "k long, y double"
    )
    r = durbin_watson(df, "k", "y").collect()[0]
    ys = [1.0, 4.0, 10.0]
    mean = sum(ys) / 3
    den = sum((y - mean) ** 2 for y in ys)
    assert abs(r.dw - 9.0 / den) < 1e-9


def test_ljung_box_matches_python(spark):
    from csp_gateway_spark.operators.analytics import ljung_box

    ys = [2.0, 4.0, 3.0, 5.0, 6.0, 4.0, 7.0, 5.0]
    df = spark.createDataFrame(
        [(i, y) for i, y in enumerate(ys)], "k long, y double"
    )
    n = len(ys)
    mean = sum(ys) / n
    den = sum((y - mean) ** 2 for y in ys)
    q = 0.0
    m = 3
    for k in range(1, m + 1):
        num = sum(
            (ys[t] - mean) * (ys[t + k] - mean) for t in range(n - k)
        )
        q += (num / den) ** 2 / (n - k)
    q *= n * (n + 2)
    r = ljung_box(df, "k", "y", max_lag=m).collect()[0]
    assert (r.n, r.m) == (n, m)
    assert abs(r.q_stat - q) < 1e-9


def test_mcnemar_textbook(spark):
    from csp_gateway_spark.operators.analytics import mcnemar_test

    # subjects: 3 yes->no, 1 no->yes, 2 yes->yes
    rows = []
    for i in range(3):
        rows.append((f"s{i}", "a", 1))
    rows.append(("s3", "b", 1))
    for i in (4, 5):
        rows.append((f"s{i}", "a", 1))
        rows.append((f"s{i}", "b", 1))
    df = spark.createDataFrame(rows, "s string, cond string, x int")
    r = mcnemar_test(df, "s", "cond", "x", "a", "b").collect()[0]
    assert (r.n_subjects, r.b, r.c) == (6, 3, 1)
    assert abs(r.chi2 - (abs(3 - 1) - 1) ** 2 / 4) < 1e-12


def test_page_trend_perfect_monotone(spark):
    from csp_gateway_spark.operators.analytics import page_trend_test

    # 3 blocks, 4 treatments t1<t2<t3<t4, values strictly increasing
    rows = [
        (b, f"t{j}", float(j)) for b in ("b1", "b2", "b3") for j in range(1, 5)
    ]
    df = spark.createDataFrame(rows, "b string, t string, y double")
    r = page_trend_test(df, "b", "t", "y").collect()[0]
    n, k = 3, 4
    # perfect agreement: R_j = n*j, L = sum j * n * j
    l_exp = sum(j * n * j for j in range(1, k + 1))
    e_l = n * k * (k + 1) ** 2 / 4
    var_l = n * k**2 * (k + 1) * (k**2 - 1) / 144
    assert (r.n_blocks, r.k) == (n, k)
    assert abs(r.l_stat - l_exp) < 1e-9
    assert abs(r.z - (l_exp - e_l) / math.sqrt(var_l)) < 1e-9


def test_bartlett_hand_computed(spark):
    from csp_gateway_spark.operators.analytics import bartlett_test

    data = {"g1": [1.0, 2.0, 3.0, 4.0], "g2": [2.0, 4.0, 6.0, 8.0, 10.0]}
    rows = [(g, v) for g, vs in data.items() for v in vs]
    df = spark.createDataFrame(rows, "g string, y double")
    n = sum(len(vs) for vs in data.values())
    k = len(data)

    def ssq(vs):
        m = sum(vs) / len(vs)
        return sum((v - m) ** 2 for v in vs)

    pooled = sum(ssq(vs) for vs in data.values()) / (n - k)
    num = (n - k) * math.log(pooled) - sum(
        (len(vs) - 1) * math.log(ssq(vs) / (len(vs) - 1)) for vs in data.values()
    )
    c = 1 + (sum(1 / (len(vs) - 1) for vs in data.values()) - 1 / (n - k)) / (
        3 * (k - 1)
    )
    r = bartlett_test(df, "g", "y").collect()[0]
    assert (r.n, r.k) == (n, k)
    assert abs(r.b_stat - num / c) < 1e-9


def test_bartlett_degenerate_group_nulls(spark):
    from csp_gateway_spark.operators.analytics import bartlett_test

    df = spark.createDataFrame(
        [("g1", 1.0), ("g1", 2.0), ("g2", 5.0)], "g string, y double"
    )
    r = bartlett_test(df, "g", "y").collect()[0]
    assert r.b_stat is None


def test_hodges_lehmann_hand_computed(spark):
    from csp_gateway_spark.operators.analytics import hodges_lehmann

    a = [1.0, 5.0, 7.0]
    b = [2.0, 3.0]
    rows = [("a", v) for v in a] + [("b", v) for v in b]
    df = spark.createDataFrame(rows, "g string, v double")
    diffs = sorted(x - y for x in a for y in b)
    t = len(diffs)  # 6 -> median = avg of 3rd and 4th
    expected = (diffs[t // 2 - 1] + diffs[t // 2]) / 2
    r = hodges_lehmann(df, "g", "v", "a", "b").collect()[0]
    assert (r.n_a, r.n_b, r.n_pairs) == (3, 2, 6)
    assert abs(r.hl_shift - expected) < 1e-12


def test_hodges_lehmann_odd_pairs(spark):
    from csp_gateway_spark.operators.analytics import hodges_lehmann

    a = [10.0, 20.0, 30.0]
    b = [5.0]
    rows = [("a", v) for v in a] + [("b", v) for v in b]
    df = spark.createDataFrame(rows, "g string, v double")
    r = hodges_lehmann(df, "g", "v", "a", "b").collect()[0]
    assert r.n_pairs == 3
    assert abs(r.hl_shift - 15.0) < 1e-12


def test_assortativity_star_is_minus_one(spark):
    from csp_gateway_spark.operators.corpus import degree_assortativity

    edges = spark.createDataFrame(
        [(0, i) for i in range(1, 5)], "id_a long, id_b long"
    )
    r = degree_assortativity(edges).collect()[0]
    # star: every symmetrized edge pairs degree 4 with degree 1
    assert r.n_edges == 8
    assert abs(r.r - (-1.0)) < 1e-9


def test_assortativity_regular_graph_null(spark):
    from csp_gateway_spark.operators.corpus import degree_assortativity

    # 4-cycle: every node degree 2 -> zero variance -> NULL r
    edges = spark.createDataFrame(
        [(0, 1), (1, 2), (2, 3), (3, 0)], "id_a long, id_b long"
    )
    r = degree_assortativity(edges).collect()[0]
    assert r.n_edges == 8 and r.r is None


def test_source_diversity_uniform_two_groups(spark):
    from csp_gateway_spark.operators.corpus import source_diversity

    docs = spark.createDataFrame(
        [(i, "s1" if i < 5 else "s2") for i in range(10)],
        "doc_id long, source string",
    )
    r = source_diversity(docs, "source").collect()[0]
    assert (r.n_docs, r.k_groups) == (10, 2)
    assert abs(r.shannon - math.log(2)) < 1e-12
    assert abs(r.simpson - 0.5) < 1e-12
    assert abs(r.eff_shannon - 2.0) < 1e-12
    assert abs(r.eff_simpson - 2.0) < 1e-12


def test_source_diversity_single_group(spark):
    from csp_gateway_spark.operators.corpus import source_diversity

    docs = spark.createDataFrame(
        [(i, "only") for i in range(4)], "doc_id long, source string"
    )
    r = source_diversity(docs, "source").collect()[0]
    assert r.shannon == 0.0 and abs(r.simpson - 1.0) < 1e-12
