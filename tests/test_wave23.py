"""Hand-computed unit tests for the wave-23 (round 11) operators:
agreement (Cronbach α, ICC), blocked rank tests (Friedman, Cochran Q),
concordance (Kendall τ-b), distribution shape (Cramér–von Mises),
momentum (MACD), graph centrality (HITS), and corpus n-gram
diversity."""

from __future__ import annotations

import math

import pytest


def _var(xs):
    n = len(xs)
    m = sum(xs) / n
    return sum((x - m) ** 2 for x in xs) / (n - 1)


def test_cronbach_alpha_hand_computed(spark):
    from csp_gateway_spark.operators.analytics import cronbach_alpha

    rows = [
        (2.0, 3.0, 3.0),
        (4.0, 4.0, 5.0),
        (3.0, 5.0, 4.0),
        (5.0, 4.0, 5.0),
        (1.0, 2.0, 2.0),
    ]
    df = spark.createDataFrame(rows, "a double, b double, c double")
    r = cronbach_alpha(df, ["a", "b", "c"]).collect()[0]
    item_var = sum(_var([row[i] for row in rows]) for i in range(3))
    tot_var = _var([sum(row) for row in rows])
    expected = 3.0 / 2.0 * (1.0 - item_var / tot_var)
    assert (r.n, r.k) == (5, 3)
    assert abs(r.item_var_sum - item_var) < 1e-9
    assert abs(r.total_var - tot_var) < 1e-9
    assert abs(r.alpha - expected) < 1e-9


def test_cronbach_alpha_requires_two_items(spark):
    from csp_gateway_spark.operators.analytics import cronbach_alpha

    df = spark.createDataFrame([(1.0,)], "a double")
    with pytest.raises(ValueError):
        cronbach_alpha(df, ["a"])


def test_icc_oneway_matches_manual_anova(spark):
    from csp_gateway_spark.operators.analytics import icc_oneway

    data = {"g1": [9.0, 10.0, 11.0], "g2": [1.0, 2.0, 3.0], "g3": [5.0, 6.0]}
    rows = [(g, v) for g, vs in data.items() for v in vs]
    df = spark.createDataFrame(rows, "g string, y double")
    r = icc_oneway(df, "g", "y").collect()[0]
    all_vals = [v for vs in data.values() for v in vs]
    n, k = len(all_vals), len(data)
    grand = sum(all_vals)
    ssb = sum(sum(vs) ** 2 / len(vs) for vs in data.values()) - grand**2 / n
    ssw = sum(v**2 for v in all_vals) - sum(
        sum(vs) ** 2 / len(vs) for vs in data.values()
    )
    msb, msw = ssb / (k - 1), ssw / (n - k)
    n0 = (n - sum(len(vs) ** 2 for vs in data.values()) / n) / (k - 1)
    icc = (msb - msw) / (msb + (n0 - 1) * msw)
    assert (r.n, r.k) == (n, k)
    assert abs(r.msb - msb) < 1e-9
    assert abs(r.msw - msw) < 1e-9
    assert abs(r.n0 - n0) < 1e-9
    assert abs(r.icc - icc) < 1e-9


def test_friedman_textbook_no_ties(spark):
    """Classic 3-treatment x 4-block example with distinct values per
    block: chi2 = 12/(n k (k+1)) * sum Rj^2 - 3 n (k+1)."""
    from csp_gateway_spark.operators.analytics import friedman_test

    # blocks rank treatments identically -> maximal chi2 = n*(k-1)...
    # use a mixed example instead; ranks per block computed by hand:
    # b1: a=1, b=2, c=3 ; b2: a=1, b=3, c=2 ; b3: a=2, b=1, c=3 ;
    # b4: a=1, b=2, c=3  -> Ra=5, Rb=8, Rc=11
    rows = [
        ("b1", "a", 1.0), ("b1", "b", 2.0), ("b1", "c", 3.0),
        ("b2", "a", 1.0), ("b2", "b", 5.0), ("b2", "c", 4.0),
        ("b3", "a", 2.0), ("b3", "b", 1.0), ("b3", "c", 3.0),
        ("b4", "a", 1.0), ("b4", "b", 2.0), ("b4", "c", 3.0),
    ]
    df = spark.createDataFrame(rows, "b string, t string, y double")
    r = friedman_test(df, "b", "t", "y").collect()[0]
    n, k = 4, 3
    rsums = {"a": 5, "b": 8, "c": 11}
    chi2 = 12.0 / (n * k * (k + 1)) * sum(v**2 for v in rsums.values()) - 3 * n * (
        k + 1
    )
    assert (r.n_blocks, r.k) == (n, k)
    assert abs(r.chi2 - chi2) < 1e-9
    assert abs(r.w - chi2 / (n * (k - 1))) < 1e-9


def test_friedman_drops_incomplete_blocks_and_handles_ties(spark):
    from csp_gateway_spark.operators.analytics import friedman_test

    rows = [
        # complete block with a tie between b and c: ranks a=1, b=2.5, c=2.5
        ("b1", "a", 1.0), ("b1", "b", 2.0), ("b1", "c", 2.0),
        ("b2", "a", 3.0), ("b2", "b", 1.0), ("b2", "c", 2.0),
        ("b3", "a", 9.0),  # incomplete -> dropped
    ]
    df = spark.createDataFrame(rows, "b string, t string, y double")
    r = friedman_test(df, "b", "t", "y").collect()[0]
    assert r.n_blocks == 2 and r.k == 3
    # doubled midranks: b1: a=2, b=5, c=5; b2: a=6, b=2, c=4
    # Rd: a=8, b=7, c=9 ; c0 = n(k+1) = 8
    num = (8 - 8) ** 2 + (7 - 8) ** 2 + (9 - 8) ** 2
    den = (4 + 25 + 25 + 36 + 4 + 16) - 2 * 3 * 16
    assert abs(r.chi2 - (3 - 1) * num / den) < 1e-9


def test_cochran_q_textbook(spark):
    from csp_gateway_spark.operators.analytics import cochran_q

    # 4 blocks x 3 treatments, binary outcomes
    x = {
        ("b1", "t1"): 1, ("b1", "t2"): 1, ("b1", "t3"): 0,
        ("b2", "t1"): 1, ("b2", "t2"): 0, ("b2", "t3"): 0,
        ("b3", "t1"): 1, ("b3", "t2"): 1, ("b3", "t3"): 1,
        ("b4", "t1"): 0, ("b4", "t2"): 1, ("b4", "t3"): 0,
    }
    rows = [(b, t, v) for (b, t), v in x.items()]
    df = spark.createDataFrame(rows, "b string, t string, x int")
    r = cochran_q(df, "b", "t", "x").collect()[0]
    k = 3
    cj = [3, 3, 1]
    ri = [2, 1, 3, 1]
    t_tot = sum(cj)
    q = (k - 1) * (k * sum(c**2 for c in cj) - t_tot**2) / (
        k * t_tot - sum(v**2 for v in ri)
    )
    assert (r.n_blocks, r.k, r.df) == (4, 3, 2)
    assert abs(r.q_stat - q) < 1e-9


def test_kendall_tau_hand_computed_with_ties(spark):
    from csp_gateway_spark.operators.analytics import kendall_tau

    pts = [(1, 1), (2, 2), (3, 3), (3, 1), (4, 2)]
    df = spark.createDataFrame(pts, "a int, b int")
    conc = disc = 0
    for i in range(len(pts)):
        for j in range(i + 1, len(pts)):
            da = (pts[i][0] - pts[j][0])
            db = (pts[i][1] - pts[j][1])
            if da * db > 0:
                conc += 1
            elif da * db < 0:
                disc += 1
    n = len(pts)
    n0 = n * (n - 1) / 2
    from collections import Counter

    n1 = sum(t * (t - 1) / 2 for t in Counter(p[0] for p in pts).values())
    n2 = sum(t * (t - 1) / 2 for t in Counter(p[1] for p in pts).values())
    expected = (conc - disc) / math.sqrt((n0 - n1) * (n0 - n2))
    r = kendall_tau(df, "a", "b").collect()[0]
    assert (r.n, r.concordant, r.discordant) == (n, conc, disc)
    assert abs(r.tau_b - expected) < 1e-12


def test_kendall_tau_cell_cap_raises(spark):
    from csp_gateway_spark.operators.analytics import kendall_tau

    df = spark.createDataFrame([(i, i) for i in range(10)], "a int, b int")
    with pytest.raises(Exception, match="max_cells"):
        kendall_tau(df, "a", "b", max_cells=3).collect()


def test_cvm_test_hand_computed(spark):
    from csp_gateway_spark.operators.analytics import cvm_test

    a = [1.0, 2.0, 3.0]
    b = [2.0, 4.0]
    rows = [("a", v) for v in a] + [("b", v) for v in b]
    df = spark.createDataFrame(rows, "g string, v double")
    na, nb = len(a), len(b)
    nn = na + nb
    pooled = sorted(a + b)
    t = 0.0
    for z in sorted(set(pooled)):
        h = pooled.count(z)
        f1 = sum(1 for v in a if v <= z) / na
        f2 = sum(1 for v in b if v <= z) / nb
        t += h * (f1 - f2) ** 2
    expected = na * nb / nn**2 * t
    r = cvm_test(df, "g", "v", "a", "b").collect()[0]
    assert (r.n_a, r.n_b) == (na, nb)
    assert abs(r.t_stat - expected) < 1e-12


def test_cvm_identical_samples_zero(spark):
    from csp_gateway_spark.operators.analytics import cvm_test

    rows = [("a", float(i % 5)) for i in range(20)] + [
        ("b", float(i % 5)) for i in range(20)
    ]
    df = spark.createDataFrame(rows, "g string, v double")
    r = cvm_test(df, "g", "v", "a", "b").collect()[0]
    assert abs(r.t_stat) < 1e-15


def test_macd_matches_python_recursion(spark):
    from csp_gateway_spark.operators.analytics import macd

    ys = [10.0, 12.0, 11.0, 15.0, 14.0, 18.0, 17.0, 20.0]
    df = spark.createDataFrame(
        [(i, y) for i, y in enumerate(ys)], "k long, y double"
    )
    out = {r.k: r for r in macd(df, "k", "y", fast=3, slow=5, signal=2).collect()}
    af, asl, ag = 2 / 4, 2 / 6, 2 / 3
    ef = es = ys[0]
    sig = 0.0
    assert out[0].macd == 0.0 and out[0].signal == 0.0
    for i, y in enumerate(ys[1:], start=1):
        ef = af * y + (1 - af) * ef
        es = asl * y + (1 - asl) * es
        m = ef - es
        sig = ag * m + (1 - ag) * sig
        assert abs(out[i].macd - m) < 1e-12
        assert abs(out[i].signal - sig) < 1e-12
        assert abs(out[i].histogram - (m - sig)) < 1e-12


def test_macd_duplicate_keys_sum(spark):
    from csp_gateway_spark.operators.analytics import macd

    df = spark.createDataFrame(
        [(0, 5.0), (0, 5.0), (1, 20.0)], "k long, y double"
    )
    rows = {r.k: r for r in macd(df, "k", "y", fast=3, slow=5, signal=2).collect()}
    # k=0 collapses to 10.0; one step to k=1
    ef = 0.5 * 20 + 0.5 * 10
    es = (1 / 3) * 20 + (2 / 3) * 10
    assert abs(rows[1].macd - (ef - es)) < 1e-12


def test_hits_star_graph(spark):
    from csp_gateway_spark.operators.corpus import hits

    # undirected star: center 0 -- leaves 1..4
    edges = spark.createDataFrame(
        [(0, i) for i in range(1, 5)], "id_a long, id_b long"
    )
    out = {r.node: r for r in hits(edges, iters=2).collect()}
    # integer recursion: h0=1 everywhere; a1(center)=4, a1(leaf)=1;
    # h1(center)=4, h1(leaf)=4; a2(center)=16, a2(leaf)=4;
    # h2(center)=16, h2(leaf)=16
    assert abs(out[0].auth - 16 / 32) < 1e-12
    for i in range(1, 5):
        assert abs(out[i].auth - 4 / 32) < 1e-12
    assert abs(sum(v.hub for v in out.values()) - 1.0) < 1e-12
    assert abs(out[0].hub - out[1].hub) < 1e-12  # h2 equal everywhere


def test_hits_directed_chain(spark):
    from csp_gateway_spark.operators.corpus import hits

    # directed a->b, c->b : b is the sole authority; a, c are hubs
    edges = spark.createDataFrame(
        [(1, 2), (3, 2)], "id_a long, id_b long"
    )
    out = {r.node: r for r in hits(edges, iters=1, directed=True).collect()}
    assert out[2].auth == 1.0
    assert out[1].hub == 0.5 and out[3].hub == 0.5
    assert out[2].hub == 0.0 and out[1].auth == 0.0


def test_distinct_ngrams_hand_counted(spark):
    from csp_gateway_spark.operators.corpus import distinct_ngrams

    docs = spark.createDataFrame(
        [(1, "the cat sat"), (2, "the cat ran"), (3, "hi")],
        "doc_id long, text string",
    )
    out = {r.n: r for r in distinct_ngrams(docs).collect()}
    # unigrams: the cat sat / the cat ran / hi -> 7 total,
    # distinct {the, cat, sat, ran, hi} = 5
    assert (out[1].total_ngrams, out[1].distinct_ngrams) == (7, 5)
    # bigrams: "the cat","cat sat","the cat","cat ran" + short doc "hi"
    assert (out[2].total_ngrams, out[2].distinct_ngrams) == (5, 4)
    # trigrams: one per long doc + whole-text "hi"
    assert (out[3].total_ngrams, out[3].distinct_ngrams) == (3, 3)
    assert abs(out[1].distinct_ratio - 5 / 7) < 1e-12
