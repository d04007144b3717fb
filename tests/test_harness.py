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
