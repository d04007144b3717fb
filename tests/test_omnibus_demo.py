"""The demo app works end-to-end (reference pattern: webserver tests
exercise the demo internally, and those tests prove the demo runs)."""

import json
import sys
import time
import urllib.error
import urllib.request

import pytest

sys.path.insert(0, "examples")

from omnibus import build_catalog, serve, tick_quotes  # noqa: E402

from csp_gateway_spark.client import GatewayClient  # noqa: E402


@pytest.fixture(scope="module")
def demo(spark):
    cat = build_catalog(spark)
    tick_quotes(cat, rounds=2)
    srv = serve(cat, api_key="k")
    yield f"http://127.0.0.1:{srv.port}"
    srv.stop()


def test_demo_state_and_derived_channel(demo):
    cli = GatewayClient(demo, api_key="k")
    assert cli.channels() == ["quotes", "spreads"]
    state = cli.state("quotes", symbol="AAA")
    assert len(state) == 1 and state[0]["bid"] == 101.0  # last round wins
    spreads = {r["symbol"]: round(r["spread"], 6) for r in cli.state("spreads")}
    assert spreads == {"AAA": 0.2, "BBB": 0.2, "CCC": 0.2}


def test_demo_validator_rejects_crossed_quote(demo):
    cli = GatewayClient(demo, api_key="k")
    with pytest.raises(urllib.error.HTTPError) as ei:
        cli.send("quotes", {"symbol": "AAA", "bid": 10.0, "ask": 9.0})
    assert ei.value.code == 422


def test_demo_auth_and_layout(demo):
    with pytest.raises(urllib.error.HTTPError) as ei:
        GatewayClient(demo).channels()
    assert ei.value.code == 401
    req = urllib.request.Request(
        f"{demo}/api/v1/perspective/layouts", headers={"X-API-Key": "k"}
    )
    got = json.loads(urllib.request.urlopen(req).read())
    assert got["default_layout"] == "main"


def test_demo_ws_round_trip(demo):
    cli = GatewayClient(demo, api_key="k")
    ws = cli.stream(["quotes"])
    time.sleep(0.2)
    cli.send("quotes", {"symbol": "BBB", "bid": 1.0, "ask": 2.0})
    msg = ws.recv_json()
    ws.close()
    assert msg["channel"] == "quotes" and msg["data"]["symbol"] == "BBB"
