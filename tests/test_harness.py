"""GatewayTestHarness (reference testing/harness.py model): inject
timed rows, assert tick counts / attrs / state snapshots."""

import pytest

from csp_gateway_spark.catalog import ChannelCatalog, Gateway, GatewayModule
from csp_gateway_spark.testing import GatewayTestHarness


class Doubler(GatewayModule):
    """Example downstream module: mirrors example into doubled."""

    def connect(self, channels: ChannelCatalog) -> None:
        channels.declare("example")
        channels.declare_state("example", "x")


def test_harness_inject_and_assert(spark):
    h = GatewayTestHarness(channels=["example"])
    gw = Gateway(modules=[h, Doubler()])
    cat = gw.build(spark)

    echoed = h.send(cat, "example", [{"x": 1, "y": "a"}, {"x": 2, "y": "b"}])
    assert all(r["id"] for r in echoed)
    h.assert_ticked(cat, "example", count=2)
    h.assert_attr_equal(cat, "example", "x", 2)

    h.send(cat, "example", [{"x": 2, "y": "b2"}])  # upserts key 2
    assert h.cycles("example") == 2
    h.assert_ticked(cat, "example", count=3)
    h.assert_state(cat, "example", [{"x": 1, "y": "a"}, {"x": 2, "y": "b2"}])


def test_harness_assertion_failures_are_loud(spark):
    h = GatewayTestHarness(channels=["c"])
    cat = Gateway(modules=[h]).build(spark)
    h.send(cat, "c", [{"x": 1}])
    with pytest.raises(AssertionError, match="expected 5 ticks"):
        h.assert_ticked(cat, "c", count=5)
    with pytest.raises(AssertionError, match="expected 99"):
        h.assert_attr_equal(cat, "c", "x", 99)


def test_ctfidf_distinguishing_terms(spark):
    from csp_gateway_spark.operators.corpus import ctfidf_terms

    df = spark.createDataFrame(
        [
            ("a", 1, "apple apple apple shared"),
            ("a", 2, "apple shared"),
            ("b", 3, "banana banana shared"),
            ("b", 4, "banana shared shared"),
        ],
        "source string, doc_id long, text string",
    )
    out = ctfidf_terms(df, topk=2).collect()
    by_src = {}
    for r in sorted(out, key=lambda r: (r.source, r.rank)):
        by_src.setdefault(r.source, []).append(r.token)
    # the group-exclusive term outranks the shared one
    assert by_src["a"][0] == "apple"
    assert by_src["b"][0] == "banana"
    # gdf: 'shared' appears in both groups
    shared = [r for r in out if r.token == "shared"]
    assert all(r.gdf == 2 for r in shared)


def test_triangle_count_census(spark):
    from csp_gateway_spark.operators.corpus import triangle_count

    # triangle 1-2-3 plus a pendant edge 3-4 and a second triangle 2-3-4
    edges = spark.createDataFrame(
        [(1, 2), (2, 3), (1, 3), (3, 4), (2, 4)], "id_a long, id_b long"
    )
    out = triangle_count(edges, topk=10).collect()
    assert all(r.n_triangles == 2 for r in out)
    per = {r.node: r.n_tri for r in out}
    assert per[2] == 2 and per[3] == 2       # in both triangles
    assert per[1] == 1 and per[4] == 1


def test_kcore_peels_pendants(spark):
    from csp_gateway_spark.operators.corpus import kcore

    # triangle 1-2-3 (2-core) with pendant chain 3-4-5
    edges = spark.createDataFrame(
        [(1, 2), (2, 3), (1, 3), (3, 4), (4, 5)], "id_a long, id_b long"
    )
    out = {r.node: r.degree for r in kcore(edges, k=2, rounds=3).collect()}
    assert set(out) == {1, 2, 3}
    assert all(d == 2 for d in out.values())
