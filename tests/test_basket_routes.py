"""Dict-basket per-key routes: /last|state|send|next/<ch>/<key>.

Model: reference `web/routes/last.py:18-157` (key suffix), `send.py`
per-key POST, `auth_filter.py:355-441` key-filtered /next loop.
"""

import threading
import time
import urllib.error

import pytest
from pyspark.sql import types as T

from csp_gateway_spark.catalog import ChannelCatalog
from csp_gateway_spark.client import GatewayClient
from csp_gateway_spark.serving.app import GatewayApi, GatewayHttpServer

QUOTE = T.StructType(
    [T.StructField("sym", T.StringType()), T.StructField("px", T.DoubleType())]
)


@pytest.fixture(scope="module")
def served(spark):
    cat = ChannelCatalog(spark)
    cat.declare("quotes", QUOTE)
    cat.declare_state("quotes", "sym")
    cat.declare("flat", QUOTE)  # no state key declared
    cat.send("quotes", [{"sym": "A", "px": 1.0}, {"sym": "B", "px": 2.0}])
    cat.send("flat", [{"sym": "A", "px": 1.0}])
    srv = GatewayHttpServer(GatewayApi(cat)).start()
    yield srv
    srv.stop()


def test_state_and_last_by_key(served):
    cli = GatewayClient(f"http://127.0.0.1:{served.port}")
    rows = cli.state("quotes", key="B")
    assert [r["sym"] for r in rows] == ["B"]
    with pytest.raises(urllib.error.HTTPError) as ei:
        cli.state("quotes", key="ZZ")
    assert ei.value.code == 404


def test_send_by_key_sets_key_field(served):
    cli = GatewayClient(f"http://127.0.0.1:{served.port}")
    echoed = cli.send("quotes", {"px": 9.0}, key="C")
    assert echoed[0]["sym"] == "C" and echoed[0]["px"] == 9.0
    assert cli.last("quotes", key="C")[0]["sym"] == "C"


def test_next_by_key_skips_other_keys(served):
    cli = GatewayClient(f"http://127.0.0.1:{served.port}")
    got = {}
    t = threading.Thread(target=lambda: got.update(rows=cli.next("quotes", timeout=10, key="T1")))
    t.start()
    time.sleep(0.3)
    cli.send("quotes", {"sym": "T0", "px": 1.0})  # non-matching tick: waiter keeps waiting
    time.sleep(0.3)
    assert t.is_alive()
    cli.send("quotes", {"sym": "T1", "px": 2.0})
    t.join(10)
    assert [r["sym"] for r in got["rows"]] == ["T1"]


def test_next_by_key_timeout_408(served):
    cli = GatewayClient(f"http://127.0.0.1:{served.port}")
    with pytest.raises(urllib.error.HTTPError) as ei:
        cli.next("quotes", timeout=0.3, key="NEVER")
    assert ei.value.code == 408


def test_key_routes_on_unkeyed_channel_404(served):
    cli = GatewayClient(f"http://127.0.0.1:{served.port}")
    with pytest.raises(urllib.error.HTTPError) as ei:
        cli.last("flat", key="A")
    assert ei.value.code == 404
