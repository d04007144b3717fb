"""Hand-computed unit tests for the wave-26 (round 11) operators:
1-Wasserstein distance, partial correlation, clustering coefficients,
Markov transition entropy, and the DFT periodogram."""

from __future__ import annotations

import math

import pytest


def test_wasserstein_hand_computed(spark):
    from csp_gateway_spark.operators.analytics import wasserstein_distance

    a = [1.0, 2.0, 3.0]
    b = [2.0, 3.0, 4.0]
    rows = [("a", v) for v in a] + [("b", v) for v in b]
    df = spark.createDataFrame(rows, "g string, v double")
    # W1 between these equal-size samples is the mean |sorted diff| = 1.0
    r = wasserstein_distance(df, "g", "v", "a", "b").collect()[0]
    assert (r.n_a, r.n_b) == (3, 3)
    assert abs(r.w1 - 1.0) < 1e-12


def test_wasserstein_identical_zero(spark):
    from csp_gateway_spark.operators.analytics import wasserstein_distance

    rows = [("a", float(i % 4)) for i in range(20)] + [
        ("b", float(i % 4)) for i in range(20)
    ]
    df = spark.createDataFrame(rows, "g string, v double")
    r = wasserstein_distance(df, "g", "v", "a", "b").collect()[0]
    assert r.w1 == 0.0


def test_wasserstein_unbalanced_sizes(spark):
    from csp_gateway_spark.operators.analytics import wasserstein_distance

    # ECDF integral computed by hand: F1 steps at 0 (all mass),
    # F2 half at 0, half at 10 -> |F1-F2| = 0.5 on [0, 10) -> W1 = 5
    rows = [("a", 0.0), ("a", 0.0), ("b", 0.0), ("b", 10.0)]
    df = spark.createDataFrame(rows, "g string, v double")
    r = wasserstein_distance(df, "g", "v", "a", "b").collect()[0]
    assert abs(r.w1 - 5.0) < 1e-12


def test_partial_corr_removes_confounder(spark):
    from csp_gateway_spark.operators.analytics import partial_corr

    # x and y both driven by z plus tiny independent parts
    rows = []
    for i in range(40):
        z = float(i % 10)
        x = z + (0.01 if i % 2 == 0 else -0.01)
        y = z + (0.01 if i % 3 == 0 else -0.01)
        rows.append((x, y, z))
    df = spark.createDataFrame(rows, "x double, y double, z double")
    r = partial_corr(df, "x", "y", "z").collect()[0]
    assert r.r_xy > 0.99  # raw correlation is almost 1 via z
    assert abs(r.partial_r) < 0.6  # controlling z strips most of it


def test_partial_corr_matches_manual(spark):
    from csp_gateway_spark.operators.analytics import partial_corr

    pts = [(1.0, 2.0, 1.0), (2.0, 3.0, 2.0), (3.0, 5.0, 2.0), (4.0, 4.0, 3.0), (5.0, 7.0, 4.0)]
    df = spark.createDataFrame(pts, "x double, y double, z double")

    def corr(u, v):
        n = len(u)
        mu, mv = sum(u) / n, sum(v) / n
        cov = sum((a - mu) * (b - mv) for a, b in zip(u, v))
        vu = sum((a - mu) ** 2 for a in u)
        vv = sum((b - mv) ** 2 for b in v)
        return cov / math.sqrt(vu * vv)

    xs, ys, zs = [p[0] for p in pts], [p[1] for p in pts], [p[2] for p in pts]
    rxy, rxz, ryz = corr(xs, ys), corr(xs, zs), corr(ys, zs)
    expected = (rxy - rxz * ryz) / math.sqrt((1 - rxz**2) * (1 - ryz**2))
    r = partial_corr(df, "x", "y", "z").collect()[0]
    assert abs(r.r_xy - rxy) < 1e-9
    assert abs(r.partial_r - expected) < 1e-9


def test_clustering_triangle_with_pendant(spark):
    from csp_gateway_spark.operators.corpus import clustering_coefficient

    # triangle 1-2-3 plus pendant 4 attached to 1
    edges = spark.createDataFrame(
        [(1, 2), (2, 3), (1, 3), (1, 4)], "id_a long, id_b long"
    )
    r = clustering_coefficient(edges).collect()[0]
    assert (r.n_nodes, r.n_triangles) == (4, 1)
    # local cc: node1 deg3 -> 2*1/(3*2)=1/3; nodes 2,3 deg2 -> 1;
    # node4 deg1 -> excluded.  avg over 3 nodes = (1/3 + 1 + 1)/3
    assert abs(r.avg_local_cc - (1 / 3 + 1 + 1) / 3) < 1e-12
    # global: 3*1 / wedges; deg(deg-1) sums: 6 + 2 + 2 = 10 -> 3/5... (2*wedges=10)
    assert abs(r.global_cc - 3.0 / 5.0) < 1e-12


def test_clustering_no_triangles(spark):
    from csp_gateway_spark.operators.corpus import clustering_coefficient

    edges = spark.createDataFrame(
        [(1, 2), (2, 3), (3, 4)], "id_a long, id_b long"
    )
    r = clustering_coefficient(edges).collect()[0]
    assert r.n_triangles == 0
    assert r.global_cc == 0.0 and r.avg_local_cc == 0.0


def test_transition_entropy_deterministic_chain(spark):
    from csp_gateway_spark.operators.corpus import transition_entropy

    # a->b always, b->a always: H(next|cur) = 0, branching 1
    trans = spark.createDataFrame(
        [("a", "b", 10), ("b", "a", 10)], "cur string, nxt string, n long"
    )
    r = transition_entropy(trans).collect()[0]
    assert (r.n_transitions, r.k_states) == (20, 2)
    assert r.cond_entropy == 0.0 and r.eff_branching == 1.0


def test_transition_entropy_uniform_two_way(spark):
    from csp_gateway_spark.operators.corpus import transition_entropy

    # from either state, next is 50/50 -> H = ln 2
    trans = spark.createDataFrame(
        [("a", "a", 5), ("a", "b", 5), ("b", "a", 5), ("b", "b", 5)],
        "cur string, nxt string, n long",
    )
    r = transition_entropy(trans).collect()[0]
    assert abs(r.cond_entropy - math.log(2)) < 1e-12
    assert abs(r.eff_branching - 2.0) < 1e-12


def test_periodogram_finds_planted_period(spark):
    from csp_gateway_spark.operators.analytics import periodogram

    n = 48
    rows = [
        (t, 1000.0 + 100.0 * math.cos(2 * math.pi * t / 6.0)) for t in range(n)
    ]
    df = spark.createDataFrame(rows, "k long, y double")
    out = {r.period: r.power for r in periodogram(df, "k", "y", 2, 12).collect()}
    best = max(out, key=out.get)
    assert best == 6
    assert out[6] > 10 * max(v for p, v in out.items() if p not in (5, 6, 7))


# --- wave 27: KN bigram LM + conformal intervals ----------------------------


def test_kn_bigram_entropy_hand_computed(spark):
    from csp_gateway_spark.operators.corpus import kn_bigram_entropy

    docs = spark.createDataFrame(
        [(1, "a b a b"), (2, "a c")], "doc_id long, text string"
    )
    # bigrams: (a,b)x2, (b,a)x1, (a,c)x1
    r = kn_bigram_entropy(docs).collect()[0]
    assert (r.n_bigrams, r.n_cells) == (4, 3)
    d = 0.75
    cells = {("a", "b"): 2, ("b", "a"): 1, ("a", "c"): 1}
    cv = {"a": 3, "b": 1}
    n1v = {"a": 2, "b": 1}
    n1w = {"b": 1, "a": 1, "c": 1}
    ncells = 3
    import math as m

    h = 0.0
    for (v, w), c in cells.items():
        p = max(c - d, 0.0) / cv[v] + d * n1v[v] / cv[v] * (n1w[w] / ncells)
        h += -c * m.log(p)
    h /= 4
    assert abs(r.cross_entropy - h) < 1e-9
    assert abs(r.perplexity - m.exp(h)) < 1e-9


def test_kn_probabilities_sum_to_one_per_context(spark):
    """Sanity: interpolated KN must be a proper distribution over the
    OBSERVED vocabulary for each context with all continuations
    counted (holds when every word type appears as a continuation)."""
    import math as m

    docs_text = "a b b a c a b c b a"
    toks = docs_text.split()
    cells = {}
    for v, w in zip(toks, toks[1:]):
        cells[(v, w)] = cells.get((v, w), 0) + 1
    cv = {}
    n1v = {}
    n1w = {}
    for (v, w), c in cells.items():
        cv[v] = cv.get(v, 0) + c
        n1v[v] = n1v.get(v, 0) + 1
        n1w[w] = n1w.get(w, 0) + 1
    ncells = len(cells)
    d = 0.75
    vocab = set(w for _, w in cells)
    for v in cv:
        tot = 0.0
        for w in vocab:
            c = cells.get((v, w), 0)
            tot += max(c - d, 0) / cv[v] + d * n1v[v] / cv[v] * (
                n1w[w] / ncells
            )
        assert abs(tot - 1.0) < 1e-12


def test_conformal_interval_coverage(spark):
    from csp_gateway_spark.operators.analytics import conformal_interval

    # one group, values uniform over 0..99 -> q_hat near the 90th pct
    rows = [(i, "g", float(i % 100)) for i in range(4000)]
    df = spark.createDataFrame(rows, "id long, g string, y double")
    r = conformal_interval(df, "id", "g", "y", alpha=0.10).collect()[0]
    assert r.n_calib + r.n_test == 4000
    # hash split is roughly even
    assert abs(r.n_calib - 2000) < 300
    # coverage should be near 0.9 for iid halves
    assert 0.85 <= r.coverage <= 0.95
    assert r.q_hat > 0


def test_conformal_quantile_rank_exact(spark):
    from csp_gateway_spark.operators.analytics import conformal_interval

    # all values identical -> every residual 0 -> q_hat 0, coverage 1
    rows = [(i, "g", 5.0) for i in range(200)]
    df = spark.createDataFrame(rows, "id long, g string, y double")
    r = conformal_interval(df, "id", "g", "y", alpha=0.10).collect()[0]
    assert r.q_hat == 0.0 and r.coverage == 1.0
