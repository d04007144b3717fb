"""Async client + stream adapters (reference `client/client.py:334-381`
async variant, `client/csp_stream.py:35-100` WS→graph adapter)."""

import asyncio
import threading
import time
import urllib.error

import pytest
from pyspark.sql import types as T

from csp_gateway_spark.catalog import ChannelCatalog
from csp_gateway_spark.client import AsyncGatewayClient, GatewayClient, pipe_stream_to_catalog
from csp_gateway_spark.serving.app import GatewayApi, GatewayHttpServer

QUOTE = T.StructType(
    [T.StructField("sym", T.StringType()), T.StructField("px", T.DoubleType())]
)


@pytest.fixture(scope="module")
def served(spark):
    cat = ChannelCatalog(spark)
    cat.declare("quotes", QUOTE)
    cat.declare_state("quotes", "sym")
    cat.send("quotes", [{"sym": "A", "px": 1.0}, {"sym": "B", "px": 2.0}])
    srv = GatewayHttpServer(GatewayApi(cat)).start()
    yield srv, cat
    srv.stop()


def test_async_surface_matches_sync(served):
    srv, _ = served
    base = f"http://127.0.0.1:{srv.port}"

    async def run():
        async with AsyncGatewayClient(base) as cli:
            chans = await cli.channels()
            assert chans == ["quotes"]
            hb = await cli.heartbeat()
            assert hb["status"] == "ok"
            state = await cli.state("quotes")
            assert {r["sym"] for r in state} == {"A", "B"}
            filtered = await cli.state("quotes", sym="A")
            assert [r["px"] for r in filtered] == [1.0]
            sent = await cli.send("quotes", {"sym": "C", "px": 3.0})
            assert sent[0]["sym"] == "C"
            last = await cli.last("quotes")
            assert last
            looked = await cli.lookup("quotes", str(sent[0]["id"]))
            assert looked[0]["sym"] == "C"

    asyncio.run(run())


def test_async_requests_run_concurrently(served):
    srv, _ = served
    base = f"http://127.0.0.1:{srv.port}"

    async def run():
        async with AsyncGatewayClient(base) as cli:
            t0 = time.monotonic()
            # /next blocks server-side; fire a concurrent send to release it
            async def poke():
                await asyncio.sleep(0.2)
                await cli.send("quotes", {"sym": "Z", "px": 9.0})

            rows, _ = await asyncio.gather(cli.next("quotes", timeout=5.0), poke())
            assert rows[0]["sym"] == "Z"
            assert time.monotonic() - t0 < 5.0

    asyncio.run(run())


def test_async_pandas_return_type(served):
    srv, _ = served
    base = f"http://127.0.0.1:{srv.port}"

    async def run():
        async with AsyncGatewayClient(base, return_type="pandas") as cli:
            pdf = await cli.state("quotes")
            assert "px" in pdf.columns and len(pdf) >= 2

    asyncio.run(run())


def test_polars_return_type_gated():
    try:
        import polars  # noqa: F401

        has_polars = True
    except ImportError:
        has_polars = False
    if has_polars:  # pragma: no cover — not in this container
        GatewayClient("http://x", return_type="polars")
    else:
        cli = GatewayClient("http://x", return_type="polars")
        with pytest.raises(ImportError, match="polars"):
            cli._wrap([{"a": 1}])


def test_collect_stream_dataframe(served):
    srv, _ = served
    base = f"http://127.0.0.1:{srv.port}"
    cli = GatewayClient(base, return_type="pandas")

    def feeder():
        time.sleep(0.3)
        GatewayClient(base).send("quotes", [{"sym": "S1", "px": 10.0}, {"sym": "S2", "px": 11.0}])

    t = threading.Thread(target=feeder)
    t.start()
    pdf = cli.collect_stream(["quotes"], n=2, timeout=5.0)
    t.join()
    assert list(pdf["channel"].unique()) == ["quotes"]
    assert {r for r in pdf["sym"]} == {"S1", "S2"}


def test_pipe_stream_to_catalog(served, spark):
    srv, _ = served
    base = f"http://127.0.0.1:{srv.port}"
    local = ChannelCatalog(spark)
    local.declare("mirror", QUOTE)
    ws = GatewayClient(base).stream(["quotes"])
    time.sleep(0.2)

    def feeder():
        time.sleep(0.2)
        GatewayClient(base).send("quotes", {"sym": "P", "px": 42.0})

    t = threading.Thread(target=feeder)
    t.start()
    n = pipe_stream_to_catalog(ws, local, channel_map={"quotes": "mirror"}, n=1)
    t.join()
    ws.close()
    assert n == 1
    rows = [r.asDict() for r in local.last("mirror").collect()]
    assert rows and rows[0]["sym"] == "P" and rows[0]["px"] == 42.0


def test_client_auth_headers(spark):
    cat = ChannelCatalog(spark)
    cat.declare("quotes", QUOTE)
    srv = GatewayHttpServer(GatewayApi(cat, api_keys=["sesame"])).start()
    base = f"http://127.0.0.1:{srv.port}"
    try:
        with pytest.raises(urllib.error.HTTPError):
            GatewayClient(base).channels()
        assert GatewayClient(base, api_key="sesame").channels() == ["quotes"]

        async def run():
            async with AsyncGatewayClient(base, api_key="sesame") as cli:
                assert await cli.channels() == ["quotes"]

        asyncio.run(run())
    finally:
        srv.stop()
