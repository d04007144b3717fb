"""Tests for the wave-28 (round 11) additions: DoReMi-style mixture
weights and the custom-state streaming top-k hook."""

from __future__ import annotations

import math

import pytest


def test_doremi_upweights_surprising_source(spark):
    from csp_gateway_spark.operators.curation import doremi_weights

    # src_a is pure filler; src_b carries rare tokens -> higher
    # unigram loss -> larger mixture weight
    rows = [(i, "src_a", "the the the the") for i in range(8)] + [
        (100 + i, "src_b", f"rare{i} token{i} odd{i} x{i}") for i in range(8)
    ]
    docs = spark.createDataFrame(rows, "doc_id long, source string, text string")
    out = {r.source: r for r in doremi_weights(docs).collect()}
    assert set(out) == {"src_a", "src_b"}
    assert out["src_b"].loss > out["src_a"].loss
    assert out["src_b"].weight > out["src_a"].weight
    assert abs(out["src_a"].weight + out["src_b"].weight - 1.0) < 1e-12


def test_doremi_matches_manual_eg(spark):
    from csp_gateway_spark.operators.curation import doremi_weights

    docs = spark.createDataFrame(
        [(1, "s1", "a a b"), (2, "s2", "b c")],
        "doc_id long, source string, text string",
    )
    out = {r.source: r for r in doremi_weights(docs, eta=0.5, rounds=2).collect()}
    # corpus unigram: a:2, b:2, c:1, n=5
    p = {"a": 2 / 5, "b": 2 / 5, "c": 1 / 5}
    loss1 = -(2 * math.log(p["a"]) + 1 * math.log(p["b"])) / 3
    loss2 = -(1 * math.log(p["b"]) + 1 * math.log(p["c"])) / 2
    w = [1.0, 1.0]
    for _ in range(2):
        raw = [w[0] * math.exp(0.5 * loss1), w[1] * math.exp(0.5 * loss2)]
        z = raw[0] + raw[1]
        w = [raw[0] / z, raw[1] / z]
    assert abs(out["s1"].loss - loss1) < 1e-12
    assert abs(out["s2"].loss - loss2) < 1e-12
    assert abs(out["s1"].weight - w[0]) < 1e-12
    assert abs(out["s2"].weight - w[1]) < 1e-12


def test_topk_hook_merges_across_batches():
    from csp_gateway_spark.streaming.stateful import make_topk_hook

    import pandas as pd

    class FakeState:
        def __init__(self):
            self.exists = False
            self._v = None

        @property
        def get(self):
            return self._v

        def update(self, v):
            self._v = v
            self.exists = True

    hook = make_topk_hook(k=3)
    st = FakeState()
    b1 = pd.DataFrame({"value": [5.0, 1.0], "event_id": [10, 11]})
    out1 = list(hook(("t",), iter([b1]), st))[0]
    assert list(out1["value"]) == [5.0, 1.0]
    b2 = pd.DataFrame({"value": [9.0, 5.0], "event_id": [12, 13]})
    out2 = list(hook(("t",), iter([b2]), st))[0]
    # merged leaderboard: 9.0/12, 5.0/13 (higher id wins tie), 5.0/10
    assert list(out2["value"]) == [9.0, 5.0, 5.0]
    assert list(out2["id"]) == [12, 13, 10]
    assert list(out2["seen"]) == [4, 4, 4]
    assert list(out2["rank"]) == [1, 2, 3]


def test_topk_hook_order_invariance():
    from csp_gateway_spark.streaming.stateful import make_topk_hook

    import pandas as pd

    class FakeState:
        def __init__(self):
            self.exists = False
            self._v = None

        @property
        def get(self):
            return self._v

        def update(self, v):
            self._v = v
            self.exists = True

    vals = [(float(v), i) for i, v in enumerate([3, 9, 9, 1, 7, 2, 8])]

    def run(batches):
        hook = make_topk_hook(k=3)
        st = FakeState()
        out = None
        for b in batches:
            pdf = pd.DataFrame(
                {"value": [v for v, _ in b], "event_id": [i for _, i in b]}
            )
            out = list(hook(("t",), iter([pdf]), st))[0]
        return list(zip(out["value"], out["id"]))

    a = run([vals[:3], vals[3:]])
    b = run([vals[:5], vals[5:]])
    c = run([vals])
    assert a == b == c
