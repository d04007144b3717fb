"""Wave 31: Jonckheere-Terpstra ordered trend, Cochran-Armitage
proportion trend, MATTR lexical diversity."""

import math
import random

import pytest
from pyspark.sql import functions as F


def _jt_brute(samples):
    """samples: list of (group_index, value). Returns (2J, z)."""
    two_j = 0
    k = max(g for g, _ in samples) + 1
    for i in range(k):
        for j in range(i + 1, k):
            for _, a in [s for s in samples if s[0] == i]:
                for _, b in [s for s in samples if s[0] == j]:
                    if a < b:
                        two_j += 2
                    elif a == b:
                        two_j += 1
    n_j = [sum(1 for g, _ in samples if g == i) for i in range(k)]
    big_n = len(samples)
    from collections import Counter

    ties = Counter(v for _, v in samples)
    two_e = sum(n_j[i] * n_j[j] for i in range(k) for j in range(i + 1, k))
    a_term = (
        big_n * (big_n - 1) * (2 * big_n + 5)
        - sum(nj * (nj - 1) * (2 * nj + 5) for nj in n_j)
        - sum(t * (t - 1) * (2 * t + 5) for t in ties.values())
    )
    b_term = sum(nj * (nj - 1) * (nj - 2) for nj in n_j) * sum(
        t * (t - 1) * (t - 2) for t in ties.values()
    )
    c_term = sum(nj * (nj - 1) for nj in n_j) * sum(
        t * (t - 1) for t in ties.values()
    )
    var = (
        a_term / 72.0
        + b_term / (36.0 * big_n * (big_n - 1) * (big_n - 2))
        + c_term / (8.0 * big_n * (big_n - 1))
    )
    z = (two_j - two_e) / (2.0 * math.sqrt(var)) if var > 0 else None
    return two_j, z


def test_jonckheere_brute_force_with_ties(spark):
    from csp_gateway_spark.operators.analytics import jonckheere_terpstra

    rng = random.Random(7)
    samples = [
        (g, float(rng.randint(0, 12) + 2 * g)) for g in range(3) for _ in range(25)
    ]
    ref2j, refz = _jt_brute(samples)
    df = spark.createDataFrame(
        [(f"g{g}", v) for g, v in samples], "grp string, v double"
    )
    r = jonckheere_terpstra(df, "grp", "v", ["g0", "g1", "g2"]).collect()[0]
    assert r.n == 75 and r.k == 3
    assert r.jt2 == ref2j
    assert r.z == pytest.approx(refz, abs=1e-12)


def test_jonckheere_monotone_and_contract(spark):
    from csp_gateway_spark.operators.analytics import jonckheere_terpstra

    # perfectly increasing groups: every cross-group pair concordant
    rows = [("a", 1.0), ("a", 2.0), ("b", 3.0), ("b", 4.0), ("c", 5.0), ("c", 6.0)]
    df = spark.createDataFrame(rows, "grp string, v double")
    r = jonckheere_terpstra(df, "grp", "v", ["a", "b", "c"]).collect()[0]
    assert r.jt2 == 2 * (4 + 4 + 4)  # 12 cross pairs, all a<b
    assert r.z > 2.0
    # reversing the claimed order flips the sign, same magnitude
    rr = jonckheere_terpstra(df, "grp", "v", ["c", "b", "a"]).collect()[0]
    assert rr.jt2 == 0 and rr.z == pytest.approx(-r.z, abs=1e-12)
    with pytest.raises(ValueError, match="ordered groups"):
        jonckheere_terpstra(df, "grp", "v", ["a"])


def test_cochran_armitage_hand_computed(spark):
    from csp_gateway_spark.operators.analytics import cochran_armitage

    # dose 1: 1/10 success, dose 2: 5/10, dose 3: 9/10 — strong + trend
    rows = (
        [(1.0, 1)] * 1 + [(1.0, 0)] * 9
        + [(2.0, 1)] * 5 + [(2.0, 0)] * 5
        + [(3.0, 1)] * 9 + [(3.0, 0)] * 1
    )
    df = spark.createDataFrame(rows, "dose double, y int")
    r = cochran_armitage(df, "dose", "y").collect()[0]
    n, rr = 30, 15
    sw = 10 * (1 + 2 + 3)
    sw2 = 10 * (1 + 4 + 9)
    t = 1 * 1 + 5 * 2 + 9 * 3
    num = n * t - rr * sw
    den = rr * (n - rr) * (n * sw2 - sw * sw)
    assert r.n == n and r.successes == rr
    assert r.chi2 == pytest.approx(n * num * num / den, abs=1e-12)
    assert r.z == pytest.approx(math.sqrt(n * num * num / den), abs=1e-12)
    # flat rates -> no trend
    flat = spark.createDataFrame(
        [(d, y) for d in (1.0, 2.0, 3.0) for y in (0, 1)], "dose double, y int"
    )
    rf = cochran_armitage(flat, "dose", "y").collect()[0]
    assert rf.chi2 == pytest.approx(0.0, abs=1e-12)


def _mattr_brute(docs, w):
    """docs: {group: [token lists]} -> {group: (dist_sum, len_sum)}."""
    out = {}
    for g, toklists in docs.items():
        dist = ln = 0
        for toks in toklists:
            n = len(toks)
            if n == 0:
                continue
            if n >= w:
                for i in range(n - w + 1):
                    dist += len(set(toks[i : i + w]))
                    ln += w
            else:
                dist += len(set(toks))
                ln += n
        out[g] = (dist, ln)
    return out


def test_mattr_brute_force(spark):
    from csp_gateway_spark.operators.corpus import mattr_diversity

    rng = random.Random(3)
    vocab = ["tok%d" % i for i in range(12)]
    docs = {
        "s1": [[rng.choice(vocab) for _ in range(rng.randint(2, 40))] for _ in range(6)],
        "s2": [[rng.choice(vocab[:4]) for _ in range(rng.randint(8, 30))] for _ in range(4)],
    }
    rows = []
    i = 0
    for g, toklists in docs.items():
        for toks in toklists:
            rows.append((i, g, " ".join(toks)))
            i += 1
    df = spark.createDataFrame(rows, "doc_id long, source string, text string")
    w = 10
    got = {r.source: r for r in mattr_diversity(df, window=w).collect()}
    ref = _mattr_brute(docs, w)
    for g, (dist, ln) in ref.items():
        assert got[g].mattr == pytest.approx(dist / ln, abs=1e-12), g
        assert got[g].n_docs == len(docs[g])
    # repetitive corpus scores strictly lower diversity
    assert got["s2"].mattr < got["s1"].mattr
    with pytest.raises(ValueError, match="window"):
        mattr_diversity(df, window=0)


def test_jonckheere_empty_input_degenerate_row(spark):
    """ADVICE r13: empty after filtering must return (n=0, k, jt2=0,
    z=NULL), not crash with int(None)."""
    from csp_gateway_spark.operators.analytics import jonckheere_terpstra

    df = spark.createDataFrame([("zz", 1.0)], "grp string, v double")
    r = jonckheere_terpstra(
        df.filter(F.col("grp") == "nope"), "grp", "v", ["a", "b"]
    ).collect()[0]
    assert (r["n"], r["k"], r["jt2"], r["z"]) == (0, 2, 0, None)
    # all values NULL is the same degenerate case
    df2 = spark.createDataFrame([("a", None), ("b", None)], "grp string, v double")
    r2 = jonckheere_terpstra(df2, "grp", "v", ["a", "b"]).collect()[0]
    assert (r2["n"], r2["jt2"], r2["z"]) == (0, 0, None)


def test_cochran_armitage_column_args_and_score_scale(spark):
    """ADVICE r13: outcome_col/score_col accept Columns (jonckheere's
    group_col pattern), and score_scale widens the quantization
    contract past the decimal(18,2) default."""
    from csp_gateway_spark.operators.analytics import cochran_armitage

    rows = [(0.001 * i, 1 if i > 50 else 0) for i in range(100)]
    df = spark.createDataFrame(rows, "dose double, hit int")
    # Column-typed args must behave exactly like names
    by_name = cochran_armitage(df, "dose", "hit", score_scale=3).collect()[0]
    by_col = cochran_armitage(
        df, F.col("dose"), F.col("hit") > 0, score_scale=3
    ).collect()[0]
    assert by_name["n"] == by_col["n"] == 100
    assert by_name["z"] == pytest.approx(by_col["z"], rel=1e-12)
    # at the default 2-dp contract the 0.001-grained doses quantize:
    # scale=3 must differ from scale=2 (documents the contract is real)
    coarse = cochran_armitage(df, "dose", "hit").collect()[0]
    assert coarse["z"] != pytest.approx(by_name["z"], rel=1e-9)
    with pytest.raises(ValueError, match="score_scale"):
        cochran_armitage(df, "dose", "hit", score_scale=17)


def test_broadcast_dim_decline_survives_tostring_truncation(spark):
    """ADVICE r13: the fact-sized decline must use a structured plan
    walk, not analyzed().toString() — the string form truncates
    attribute lists at spark.sql.debug.maxToStringFields (default 25),
    which can elide the key attribute on a wide frame, and a string
    LITERAL containing a key name must not spuriously decline."""
    from csp_gateway_spark.plans.scale import broadcast_dim

    def hinted(frame):
        return "UnresolvedHint" in frame._jdf.queryExecution().logical().toString() or \
            "ResolvedHint" in frame._jdf.queryExecution().analyzed().toString()

    # wide fact frame: >25 columns with the key attr LAST in the scan
    # output, so the truncated toString would elide it
    wide = spark.range(10).select(
        *[F.lit(i).alias(f"pad_{i:02d}") for i in range(30)],
        F.col("id").alias("c_custkey"),
    )
    assert not hinted(broadcast_dim(wide))
    # a dim-sized frame whose only mention of a key name is a STRING
    # LITERAL must keep the hint
    lit_frame = spark.range(3).select(
        F.col("id").alias("n_nationkey"),
        F.lit("join on c_custkey later").alias("note"),
    )
    assert hinted(broadcast_dim(lit_frame))
