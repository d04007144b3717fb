"""Window + join operators."""

import pyspark.sql.functions as F
import pytest

from csp_gateway_spark.operators.joins import asof_join, interval_join, merge
from csp_gateway_spark.operators.windows import sessionize, sliding, tumbling


def test_tumbling_buckets(spark):
    df = spark.createDataFrame(
        [(0,), (999_999_999,), (1_000_000_000,), (3_500_000_000,)], "ts long"
    )
    out = {r.bucket_start: r.n for r in tumbling(df, "ts", 1).collect()}
    assert out == {0: 2, 1: 1, 3: 1}


def test_sliding_membership(spark):
    df = spark.createDataFrame([(5_000_000_000,)], "ts long")
    out = sorted(r.bucket_start for r in sliding(df, "ts", 4, 2).collect())
    assert out == [2, 4]  # [2,6) and [4,8) contain t=5


def test_sessionize(spark):
    rows = [("u", 0), ("u", 10), ("u", 100), ("v", 0)]
    df = spark.createDataFrame(rows, "user string, t long")
    out = sessionize(df, "t", 50, keys=["user"]).collect()
    by_user = {}
    for r in out:
        by_user.setdefault(r.user, []).append((r.session_start, r.n))
    assert sorted(by_user["u"]) == [(0, 2), (100, 1)]
    assert by_user["v"] == [(0, 1)]


def test_asof_basic(spark):
    left = spark.createDataFrame([("k", 10, "L1"), ("k", 20, "L2")], "k string, t long, lv string")
    right = spark.createDataFrame(
        [("k", 5, "R1"), ("k", 10, "R2"), ("k", 15, "R3")], "k string, t long, rv string"
    )
    out = {r.lv: r.rv for r in asof_join(left, right, ["k"], "t", "t", right_cols=["rv"]).collect()}
    assert out == {"L1": "R2", "L2": "R3"}  # inclusive on equal ts


def test_asof_no_match_is_null(spark):
    left = spark.createDataFrame([("k", 1, "L")], "k string, t long, lv string")
    right = spark.createDataFrame([("k", 5, "R")], "k string, t long, rv string")
    out = asof_join(left, right, ["k"], "t", "t", right_cols=["rv"]).collect()
    assert out[0].rv is None


def test_asof_tolerance(spark):
    left = spark.createDataFrame([("k", 100, "L")], "k string, t long, lv string")
    right = spark.createDataFrame([("k", 10, "R")], "k string, t long, rv string")
    out = asof_join(left, right, ["k"], "t", "t", right_cols=["rv"], tolerance=10).collect()
    assert out[0].rv is None  # 90 > tolerance


def test_interval_join(spark):
    left = spark.createDataFrame([("k", 10, 1)], "k string, t long, lid int")
    right = spark.createDataFrame(
        [("k", 12, 2), ("k", 30, 3)], "k string, t long, rid int"
    )
    out = interval_join(left, right, ["k"], "t", "t", lower=0, upper=5).collect()
    assert len(out) == 1 and out[0].rid == 2


def test_merge_allow_missing(spark):
    a = spark.createDataFrame([(1, "x")], "id int, a string")
    b = spark.createDataFrame([(2, "y")], "id int, b string")
    out = merge(a, b).collect()
    assert len(out) == 2
    assert {r.id for r in out} == {1, 2}


def test_rolling_stats_frame(spark):
    from csp_gateway_spark.operators.windows import rolling_stats

    rows = [("a", i, float(i)) for i in range(1, 6)] + [("b", 1, 100.0)]
    df = spark.createDataFrame(rows, "k string, ts long, value double")
    out = {
        (r.k, r.ts): r
        for r in rolling_stats(df, "value", ["k"], ["ts"], n=3).collect()
    }
    # trailing-3 frame: at ts=4 the frame is {2,3,4}
    r = out[("a", 4)]
    assert float(r.roll_sum) == 9.0 and r.roll_n == 3
    assert r.roll_min == 2.0 and r.roll_max == 4.0
    # ramp-up: first row's frame is itself
    r1 = out[("a", 1)]
    assert float(r1.roll_sum) == 1.0 and r1.roll_n == 1
    # other key unaffected
    assert float(out[("b", 1)].roll_sum) == 100.0


def test_gap_fill_locf_grid_and_carry(spark):
    from csp_gateway_spark.operators.windows import gap_fill_locf

    ns = 1_000_000_000
    rows = [
        (1, 0 * ns, 1.0),
        (1, 30 * ns, 2.0),       # same bucket (step=60): last wins
        (1, 250 * ns, 9.0),      # bucket 240; buckets 60/120/180 are gaps
        (2, 120 * ns, 7.0),
    ]
    df = spark.createDataFrame(rows, "user_id long, ts long, value double")
    out = gap_fill_locf(df, "ts", "value", keys=["user_id"], step_sec=60)
    got = {(r.user_id, r.bucket_start): r for r in out.collect()}
    # user 1: dense grid 0..240
    assert sorted(b for (u, b) in got if u == 1) == [0, 60, 120, 180, 240]
    assert got[(1, 0)].value == 2.0 and got[(1, 0)].observed
    for b in (60, 120, 180):                  # carried, marked unobserved
        assert got[(1, b)].value == 2.0 and not got[(1, b)].observed
    assert got[(1, 240)].value == 9.0 and got[(1, 240)].observed
    # user 2: single-bucket grid
    assert sorted(b for (u, b) in got if u == 2) == [120]
    assert got[(2, 120)].value == 7.0


def test_windowed_topk_per_bucket(spark):
    from csp_gateway_spark.operators.windows import windowed_topk

    ns = 1_000_000_000
    rows = (
        [(10 * ns, "a")] * 3 + [(11 * ns, "b")] * 2 + [(12 * ns, "c")]
        + [(70 * ns, "c")] * 5 + [(71 * ns, "a")]
    )
    df = spark.createDataFrame(rows, "ts long, k string")
    out = windowed_topk(df, "ts", "k", width_sec=60, k=2).collect()
    got = {(r.bucket_start, r.rank): (r.k, r.n) for r in out}
    assert got[(0, 1)] == ("a", 3) and got[(0, 2)] == ("b", 2)
    assert got[(60, 1)] == ("c", 5) and got[(60, 2)] == ("a", 1)
    assert len(out) == 4


def test_event_transitions_probabilities(spark):
    from csp_gateway_spark.operators.windows import event_transitions

    rows = [
        (1, "v", 1), (1, "c", 2), (1, "v", 3),
        (2, "v", 1), (2, "c", 2),
    ]
    df = spark.createDataFrame(rows, "u long, t string, ts long")
    out = {(r.cur, r.nxt): r for r in event_transitions(df, "u", "t", ["ts"]).collect()}
    assert out[("v", "c")].n == 2
    assert out[("c", "v")].n == 1
    assert out[("v", "c")].p == 1.0    # both v-transitions go to c
    assert out[("c", "v")].p == 1.0


def test_interarrival_stats_gaps(spark):
    from csp_gateway_spark.operators.windows import interarrival_stats

    rows = [("a", 0, 1), ("a", 10, 2), ("a", 30, 3), ("a", 60, 4), ("b", 5, 5)]
    df = spark.createDataFrame(rows, "k string, ts long, id long")
    out = {r.k: r for r in interarrival_stats(df, "k", "ts", "id").collect()}
    # gaps for a: 10, 20, 30
    assert out["a"].n_gaps == 3 and out["a"].p50_ns == 20.0 and out["a"].max_ns == 30
    assert "b" not in out          # single event -> no gaps


def test_asof_join_directions(spark):
    from csp_gateway_spark.operators.joins import asof_join

    left = spark.createDataFrame(
        [(1, 10, "L1"), (1, 25, "L2"), (2, 5, "L3")], "k long, t long, lp string"
    )
    right = spark.createDataFrame(
        [(1, 10, "A"), (1, 20, "B"), (1, 30, "C"), (2, 50, "D")],
        "k long, t long, v string",
    )

    def run(direction, **kw):
        out = asof_join(
            left, right, on=["k"], left_time="t", right_time="t",
            right_cols=["v"], direction=direction, **kw,
        )
        return {(r.k, r.t): r.v for r in out.collect()}

    assert run("backward") == {(1, 10): "A", (1, 25): "B", (2, 5): None}
    # forward: equal timestamps match; (2,5) now reaches D
    assert run("forward") == {(1, 10): "A", (1, 25): "C", (2, 5): "D"}
    # nearest: (1,25) ties at distance 5 -> backward wins (pandas)
    assert run("nearest") == {(1, 10): "A", (1, 25): "B", (2, 5): "D"}
    # tolerance applies per direction
    assert run("forward", tolerance=10) == {(1, 10): "A", (1, 25): "C", (2, 5): None}
    import pytest as _pytest

    with _pytest.raises(ValueError):
        asof_join(left, right, on=["k"], left_time="t", right_time="t",
                  direction="sideways")


def test_session_funnel_vs_lifetime(spark):
    from csp_gateway_spark.operators.windows import session_funnel

    # one user: session 1 = view,click ; session 2 (after gap) = purchase.
    # lifetime funnel would credit the purchase; the session funnel must not.
    rows = [
        (1, "view", 100), (1, "click", 200),
        (1, "purchase", 100_000),
        (2, "view", 50), (2, "click", 60), (2, "purchase", 70),
    ]
    df = spark.createDataFrame(rows, "user_id long, event_type string, ts long")
    out = {r.stage: r for r in session_funnel(
        df, ["view", "click", "purchase"], "user_id", "event_type", "ts", gap=1000
    ).collect()}
    assert out["view"].sessions == 2          # u1-s1 and u2-s1
    assert out["click"].sessions == 2
    assert out["purchase"].sessions == 1      # only u2's session completes
