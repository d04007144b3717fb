"""Feedback channels (one-cycle delay) + FIXTURES F1 rich-struct
round-trip through the REST surface (nested struct / array / map)."""

import json
import urllib.request

import pytest
from pyspark.sql import types as T

from csp_gateway_spark.catalog import ChannelCatalog, FeedbackChannel
from csp_gateway_spark.operators.flatten import flatten_structs
from csp_gateway_spark.serving.app import GatewayApi, GatewayHttpServer

FB = T.StructType([T.StructField("req", T.StringType()), T.StructField("n", T.LongType())])

EXAMPLE_DATA = T.StructType(
    [
        T.StructField("x", T.LongType()),
        T.StructField("y", T.StringType()),
        T.StructField("internal_csp_struct", T.StructType([T.StructField("z", T.LongType())])),
        T.StructField("data", T.ArrayType(T.DoubleType())),
        T.StructField("mapping", T.MapType(T.StringType(), T.LongType())),
    ]
)


def test_feedback_one_cycle_delay_batch(spark, tmp_path):
    fb = FeedbackChannel(spark, str(tmp_path / "fb"), FB)
    # cycle 0: nothing fed back yet
    assert fb.reader().count() == 0
    # cycle 1 produces into the feedback edge
    fb.writer(spark.createDataFrame([("r1", 1)], FB))
    # cycle 2 sees cycle 1's output — csp's one-cycle delay
    assert [r.req for r in fb.reader().collect()] == ["r1"]


def test_feedback_streaming_next_microbatch(spark, tmp_path):
    fb = FeedbackChannel(spark, str(tmp_path / "fbs"), FB)
    fb.writer(spark.createDataFrame([("seed", 0)], FB))  # source dir must exist
    q = (
        fb.reader(streaming=True)
        .writeStream.format("memory")
        .queryName("fb_loop")
        .option("checkpointLocation", str(tmp_path / "ck"))
        .start()
    )
    try:
        q.processAllAvailable()
        assert spark.table("fb_loop").count() == 1
        fb.writer(spark.createDataFrame([("r2", 2)], FB))  # produced this cycle...
        q.processAllAvailable()  # ...consumed on the NEXT micro-batch
        assert {r.req for r in spark.table("fb_loop").collect()} == {"seed", "r2"}
    finally:
        q.stop()


@pytest.fixture(scope="module")
def rich_server(spark):
    cat = ChannelCatalog(spark)
    cat.declare("example", EXAMPLE_DATA)
    cat.declare_state("example", "x")
    srv = GatewayHttpServer(GatewayApi(cat)).start()
    yield srv
    srv.stop()


def test_rich_struct_rest_round_trip(rich_server):
    payload = {
        "x": 7,
        "y": "hello",
        "internal_csp_struct": {"z": 12},
        "data": [1.5, 2.5],
        "mapping": {"k1": 10},
    }
    req = urllib.request.Request(
        f"http://127.0.0.1:{rich_server.port}/api/v1/send/example",
        data=json.dumps(payload).encode(),
        headers={"Content-Type": "application/json"},
        method="POST",
    )
    echoed = json.loads(urllib.request.urlopen(req).read())[0]
    assert echoed["internal_csp_struct"] == {"z": 12}
    assert echoed["data"] == [1.5, 2.5] and echoed["mapping"] == {"k1": 10}
    assert echoed["id"] and echoed["timestamp"]
    state = json.loads(
        urllib.request.urlopen(f"http://127.0.0.1:{rich_server.port}/api/v1/state/example").read()
    )
    assert state[0]["internal_csp_struct"]["z"] == 12
    # dotted-path query on the nested field (P1/F5 semantics)
    q = json.dumps({"filters": [{"attr": "internal_csp_struct.z", "op": "==", "value": 12}]})
    rows = json.loads(
        urllib.request.urlopen(
            f"http://127.0.0.1:{rich_server.port}/api/v1/state/example?query={urllib.request.quote(q)}"
        ).read()
    )
    assert len(rows) == 1


def test_rich_struct_flatten(spark):
    df = spark.createDataFrame(
        [(7, "h", {"z": 12}, [1.5], {"k": 1})],
        EXAMPLE_DATA,
    )
    flat = flatten_structs(df)
    assert "internal_csp_struct.z" in flat.columns
    assert flat.collect()[0]["internal_csp_struct.z"] == 12
