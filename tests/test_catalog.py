"""ChannelCatalog / Gateway lifecycle (reference model: tests/server/gateway)."""

import pytest
from pyspark.sql import functions as F
from pyspark.sql import types as T

from csp_gateway_spark.catalog import ChannelCatalog, Gateway, GatewayModule, NoProviderException


QUOTE = T.StructType(
    [T.StructField("sym", T.StringType()), T.StructField("px", T.DoubleType())]
)


def test_send_state_last_lookup(spark):
    cat = ChannelCatalog(spark)
    cat.declare("quotes", QUOTE)
    cat.declare_state("quotes", "sym")
    cat.send("quotes", [{"sym": "A", "px": 1.0}, {"sym": "B", "px": 2.0}])
    cat.send("quotes", [{"sym": "A", "px": 3.0}])
    st = cat.state("quotes").collect()
    assert [(r.sym, r.px) for r in st] == [("A", 3.0), ("B", 2.0)]
    assert cat.last("quotes").collect()[0].px == 3.0
    rid = st[0].id
    assert cat.lookup("quotes", rid).count() == 1


def test_ids_unique_across_sends(spark):
    cat = ChannelCatalog(spark)
    cat.declare("c", QUOTE)
    cat.send("c", [{"sym": "A", "px": 1.0}])
    cat.send("c", [{"sym": "B", "px": 2.0}])
    ids = [r.id for r in cat.get_channel("c").select("id").collect()]
    assert len(ids) == len(set(ids)) == 2


def test_union_of_setters(spark):
    cat = ChannelCatalog(spark)
    df1 = spark.createDataFrame([("A", 1.0)], QUOTE)
    df2 = spark.createDataFrame([("B", 2.0)], QUOTE)
    cat.set_channel("q", df1)
    cat.set_channel("q", df2)
    assert cat.get_channel("q").count() == 2


def test_required_channel_raises(spark):
    cat = ChannelCatalog(spark)
    cat.declare("must", required=True)
    with pytest.raises(NoProviderException):
        cat.finalize()


def test_optional_channel_null_bound(spark):
    cat = ChannelCatalog(spark)
    cat.declare("opt", QUOTE)
    cat.finalize()
    assert cat.get_channel("opt").count() == 0


def test_gateway_module_wiring(spark):
    class Producer(GatewayModule):
        def connect(self, channels):
            channels.declare("data", QUOTE)
            channels.set_channel("data", spark.createDataFrame([("A", 1.0)], QUOTE))

    class Disabled(GatewayModule):
        disable: bool = True

        def connect(self, channels):  # pragma: no cover
            raise AssertionError("disabled module must not connect")

    gw = Gateway(modules=[Producer(), Disabled()])
    cat = gw.build(spark)
    assert cat.get_channel("data").count() == 1


def test_block_until_gates_producers(spark):
    import datetime

    cat = ChannelCatalog(spark)
    schema = T.StructType(
        list(QUOTE.fields) + [T.StructField("timestamp", T.TimestampType())]
    )
    old = datetime.datetime(2020, 1, 1)
    new = datetime.datetime(2030, 1, 1)
    cat.block_set_channels_until("g", datetime.datetime(2025, 1, 1))
    cat.set_channel("g", spark.createDataFrame([("A", 1.0, old), ("B", 2.0, new)], schema))
    assert cat.get_channel("g").count() == 1


def test_key_view_dict_basket(spark):
    cat = ChannelCatalog(spark)
    df = spark.createDataFrame([("A", 1.0), ("B", 2.0)], QUOTE)
    cat.set_channel("basket", df)
    assert cat.key_view("basket", "sym", "A").count() == 1


def test_send_validator_rejects_and_normalizes(spark):
    """U4 validators (reference omnibus x>=0 validator, base.py:97-114):
    reject invalid rows (REST surfaces 422), normalize valid ones."""
    import pytest
    from pyspark.sql import types as T

    from csp_gateway_spark.catalog import ChannelCatalog

    def validate(row):
        if row.get("x", 0) < 0:
            raise ValueError("x must be non-negative")
        row["y"] = (row.get("y") or "").lower()
        return row

    cat = ChannelCatalog(spark)
    cat.declare(
        "ex",
        T.StructType([T.StructField("x", T.LongType()), T.StructField("y", T.StringType())]),
        validator=validate,
    )
    echoed = cat.send("ex", [{"x": 1, "y": "ABC"}])
    assert echoed.collect()[0]["y"] == "abc"
    with pytest.raises(ValueError, match="non-negative"):
        cat.send("ex", [{"x": -1, "y": "bad"}])
