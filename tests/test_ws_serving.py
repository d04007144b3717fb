"""WebSocket /stream protocol, API-key auth, discovery routes, mirror.

Models: reference tests/modules/web/test_websocket.py (subscribe/send
round-trips, readonly), middleware tests (api key), perspective route
tests, modules/mirror.py semantics.
"""

import json
import threading
import time
import urllib.error
import urllib.request

import pytest
from pyspark.sql import types as T

from csp_gateway_spark.catalog import ChannelCatalog
from csp_gateway_spark.client import GatewayClient
from csp_gateway_spark.mirror import MirrorChannels
from csp_gateway_spark.serving.app import GatewayApi, GatewayHttpServer
from csp_gateway_spark.serving.ws import WebSocketClient

QUOTE = T.StructType(
    [T.StructField("sym", T.StringType()), T.StructField("px", T.DoubleType())]
)


@pytest.fixture(scope="module")
def served(spark):
    cat = ChannelCatalog(spark)
    cat.declare("quotes", QUOTE)
    cat.declare_state("quotes", "sym")
    cat.send("quotes", [{"sym": "A", "px": 1.0}])
    api = GatewayApi(cat, heartbeat_interval=0.1)
    api.fields["venue"] = {"name": "SIM", "tz": "UTC"}
    srv = GatewayHttpServer(api).start()
    yield srv
    srv.stop()


def test_ws_subscribe_receives_rest_send(served):
    ws = GatewayClient(f"http://127.0.0.1:{served.port}").stream(["quotes"])
    time.sleep(0.2)  # let subscribe register before the tick
    GatewayClient(f"http://127.0.0.1:{served.port}").send("quotes", {"sym": "W", "px": 7.0})
    msg = ws.recv_json()
    assert msg["channel"] == "quotes" and msg["data"]["sym"] == "W"
    ws.close()


def test_ws_send_action_ticks_subscribers_and_next(served):
    api_url = f"http://127.0.0.1:{served.port}"
    ws = GatewayClient(api_url).stream(["quotes"])
    time.sleep(0.2)
    got = {}
    t = threading.Thread(
        target=lambda: got.update(rows=GatewayClient(api_url).next("quotes", timeout=10))
    )
    t.start()
    time.sleep(0.2)
    ws.send_json({"action": "send", "channel": "quotes", "data": {"sym": "X", "px": 8.0}})
    msg = ws.recv_json()  # own subscription echoes the tick
    assert msg["data"]["sym"] == "X"
    t.join(10)
    assert got["rows"][0]["sym"] == "X"  # /next released by WS send
    ws.close()


def test_ws_key_filtered_subscription(served):
    ws = WebSocketClient(f"ws://127.0.0.1:{served.port}/api/v1/stream")
    ws.send_json({"action": "subscribe", "channel": "quotes", "key": "K1"})
    time.sleep(0.2)
    GatewayClient(f"http://127.0.0.1:{served.port}").send(
        "quotes", [{"sym": "K0", "px": 1.0}, {"sym": "K1", "px": 2.0}]
    )
    msg = ws.recv_json()
    assert msg["data"]["sym"] == "K1"  # K0 filtered out by key subscription
    ws.close()


def test_ws_heartbeat_and_unknown_channel(served):
    ws = WebSocketClient(f"ws://127.0.0.1:{served.port}/api/v1/stream")
    ws.send_json({"action": "subscribe", "channel": "nope"})
    assert "unknown channel" in ws.recv_json()["error"]
    ws.send_json({"action": "subscribe", "channel": "heartbeat"})
    beat = ws.recv_json()
    assert beat["channel"] == "heartbeat" and "time" in beat["data"]
    ws.close()


def test_ws_readonly_rejects_send(spark):
    cat = ChannelCatalog(spark)
    cat.declare("quotes", QUOTE)
    cat.send("quotes", [{"sym": "A", "px": 1.0}])
    srv = GatewayHttpServer(GatewayApi(cat, readonly=True)).start()
    try:
        ws = WebSocketClient(f"ws://127.0.0.1:{srv.port}/api/v1/stream")
        ws.send_json({"action": "send", "channel": "quotes", "data": {"sym": "B", "px": 2.0}})
        assert "readonly" in ws.recv_json()["error"]
        ws.close()
    finally:
        srv.stop()


def test_stream_get_lists_channels(served):
    with urllib.request.urlopen(f"http://127.0.0.1:{served.port}/api/v1/stream") as r:
        assert "quotes" in json.loads(r.read())


def test_api_key_auth(spark):
    cat = ChannelCatalog(spark)
    cat.declare("quotes", QUOTE)
    cat.send("quotes", [{"sym": "A", "px": 1.0}])
    srv = GatewayHttpServer(GatewayApi(cat, api_keys=["s3cret"])).start()
    try:
        url = f"http://127.0.0.1:{srv.port}/api/v1/channels"
        with pytest.raises(urllib.error.HTTPError) as ei:
            urllib.request.urlopen(url)
        assert ei.value.code == 401
        # header, query param, and cookie all accepted
        req = urllib.request.Request(url, headers={"X-API-Key": "s3cret"})
        assert json.loads(urllib.request.urlopen(req).read()) == ["quotes"]
        assert json.loads(urllib.request.urlopen(url + "?token=s3cret").read()) == ["quotes"]
        req = urllib.request.Request(url, headers={"Cookie": "token=s3cret"})
        assert json.loads(urllib.request.urlopen(req).read()) == ["quotes"]
    finally:
        srv.stop()


def test_discovery_routes(served):
    base = f"http://127.0.0.1:{served.port}"
    tables = json.loads(urllib.request.urlopen(f"{base}/api/v1/perspective/tables").read())
    assert tables["quotes"]["px"] == "double"
    meta = json.loads(urllib.request.urlopen(f"{base}/api/v1/perspective/meta").read())
    assert meta["quotes"]["index"] == ["sym"]


def test_perspective_layouts_crud(served):
    base = f"http://127.0.0.1:{served.port}"
    layout = {"sizes": [1], "detail": {"main": {"type": "tab-area"}}}
    req = urllib.request.Request(
        f"{base}/api/v1/perspective/layouts/main",
        data=json.dumps(layout).encode(),
        method="POST",
    )
    assert json.loads(urllib.request.urlopen(req).read())["status"] == "ok"
    got = json.loads(urllib.request.urlopen(f"{base}/api/v1/perspective/layouts").read())
    assert got["default_layout"] == "main"
    assert json.loads(got["layouts"]["main"]) == layout
    req = urllib.request.Request(f"{base}/api/v1/perspective/layouts/main", method="DELETE")
    urllib.request.urlopen(req)
    got = json.loads(urllib.request.urlopen(f"{base}/api/v1/perspective/layouts").read())
    assert got["layouts"] == {} and got["default_layout"] is None
    # deleting again -> 404
    req = urllib.request.Request(f"{base}/api/v1/perspective/layouts/main", method="DELETE")
    with pytest.raises(urllib.error.HTTPError) as ei:
        urllib.request.urlopen(req)
    assert ei.value.code == 404


def test_perspective_arrow_stream(served):
    import io

    import pyarrow as pa

    base = f"http://127.0.0.1:{served.port}"
    resp = urllib.request.urlopen(f"{base}/api/v1/perspective/arrow/quotes")
    assert resp.headers["Content-Type"] == "application/vnd.apache.arrow.stream"
    table = pa.ipc.open_stream(io.BytesIO(resp.read())).read_all()
    assert "sym" in table.column_names and "px" in table.column_names
    assert table.num_rows >= 1
    field = json.loads(urllib.request.urlopen(f"{base}/api/v1/field/venue").read())
    assert field["name"] == "SIM"
    spec = json.loads(urllib.request.urlopen(f"{base}/openapi.json").read())
    assert spec["paths"]["/api/v1/state/quotes"]["get"]["type_"].endswith("quotes")
    assert "quotes" in spec["components"]["schemas"]


def test_perspective_view_compute_and_ui(served):
    """POST /perspective/view/<table>: server-side Spark pivot of the
    table state (ViewConfig group_by/split_by/aggregates); GET
    /perspective/ui serves the dependency-free pivot page."""
    base = f"http://127.0.0.1:{served.port}"
    GatewayClient(base).send("quotes", {"sym": "B", "px": 3.0})
    cfg = {"group_by": ["sym"], "aggregates": {"px": "sum"}, "sort": [["sym", "asc"]]}
    req = urllib.request.Request(
        f"{base}/api/v1/perspective/view/quotes",
        data=json.dumps(cfg).encode(),
        headers={"Content-Type": "application/json"},
        method="POST",
    )
    rows = json.loads(urllib.request.urlopen(req).read())
    got = {r["sym"]: r["sum_px"] for r in rows}
    assert got.get("A") == 1.0 and got.get("B") == 3.0
    # bad config -> 422
    bad = urllib.request.Request(
        f"{base}/api/v1/perspective/view/quotes",
        data=json.dumps({"aggregates": {"px": "nope"}}).encode(),
        method="POST",
    )
    with pytest.raises(urllib.error.HTTPError) as ei:
        urllib.request.urlopen(bad)
    assert ei.value.code == 422
    # unknown table -> 404
    missing = urllib.request.Request(
        f"{base}/api/v1/perspective/view/nope", data=b"{}", method="POST"
    )
    with pytest.raises(urllib.error.HTTPError) as ei:
        urllib.request.urlopen(missing)
    assert ei.value.code == 404
    html = urllib.request.urlopen(f"{base}/api/v1/perspective/ui").read().decode()
    assert "pivot viewer" in html and "/api/v1/perspective/view/" in html
    # the UI passes split_by / sort direction / expressions through and
    # HTML-escapes every rendered cell (row data is untrusted)
    assert "split_by" in html and "id='sd'" in html and "id='ex'" in html
    assert "function esc(" in html and "esc(row[c])" in html
    # the exact config shape the UI posts: split_by + desc sort + expression
    ui_cfg = {
        "group_by": ["sym"],
        "split_by": ["sym"],
        "aggregates": {"px": "sum"},
        "sort": [["sym", "desc"]],
        "expressions": {"px2": "px * 2"},
    }
    req2 = urllib.request.Request(
        f"{base}/api/v1/perspective/view/quotes",
        data=json.dumps(ui_cfg).encode(),
        headers={"Content-Type": "application/json"},
        method="POST",
    )
    rows2 = json.loads(urllib.request.urlopen(req2).read())
    syms = [r["sym"] for r in rows2]
    assert syms == sorted(syms, reverse=True) and {"A", "B"} <= set(syms)  # desc sort
    assert any(k.startswith("B_") or k == "B" for r in rows2 for k in r)  # split_by pivoted


def test_shutdown_route(spark):
    cat = ChannelCatalog(spark)
    cat.declare("quotes", QUOTE)
    cat.send("quotes", [{"sym": "A", "px": 1.0}])
    srv = GatewayHttpServer(GatewayApi(cat)).start()
    req = urllib.request.Request(
        f"http://127.0.0.1:{srv.port}/api/v1/controls/shutdown", data=b"", method="POST"
    )
    assert json.loads(urllib.request.urlopen(req).read())["status"] == "shutting down"
    time.sleep(0.5)
    with pytest.raises((urllib.error.URLError, ConnectionError)):
        urllib.request.urlopen(f"http://127.0.0.1:{srv.port}/api/v1/channels", timeout=2)


def test_mirror_live_link(spark):
    cat = ChannelCatalog(spark)
    cat.declare("src", QUOTE)
    cat.declare_state("src", "sym")
    cat.send("src", [{"sym": "A", "px": 1.0}])
    MirrorChannels(mapping={"src": "dst"}).connect(cat)
    assert {r["sym"] for r in cat.get_channel("dst").collect()} == {"A"}
    cat.send("src", [{"sym": "B", "px": 2.0}])  # after the mirror was wired
    assert {r["sym"] for r in cat.get_channel("dst").collect()} == {"A", "B"}
    # state wiring copied: keyed-last works on the mirror target
    assert [r["sym"] for r in cat.state("dst").collect()] == ["A", "B"]


def test_two_ws_subscribers_both_receive(served):
    cli = GatewayClient(f"http://127.0.0.1:{served.port}")
    ws1, ws2 = cli.stream(["quotes"]), cli.stream(["quotes"])
    time.sleep(0.2)
    cli.send("quotes", {"sym": "DUAL", "px": 1.0})
    assert ws1.recv_json()["data"]["sym"] == "DUAL"
    assert ws2.recv_json()["data"]["sym"] == "DUAL"
    ws1.close()
    ws2.close()


def test_ws_identity_filter_on_fanout(spark):
    cat = ChannelCatalog(spark)
    user_schema = T.StructType(
        [T.StructField("sym", T.StringType()), T.StructField("user", T.StringType())]
    )
    cat.declare("prv", user_schema)
    cat.declare_state("prv", "sym")
    cat.send("prv", [{"sym": "A", "user": "u1"}])
    srv = GatewayHttpServer(GatewayApi(cat, identity_filter={"user": "u1"})).start()
    try:
        ws = GatewayClient(f"http://127.0.0.1:{srv.port}").stream(["prv"])
        time.sleep(0.2)
        # other-user tick is filtered from the push; own-user tick arrives
        import urllib.request as _u

        def post(p):
            req = _u.Request(
                f"http://127.0.0.1:{srv.port}/api/v1/send/prv",
                data=json.dumps(p).encode(),
                headers={"Content-Type": "application/json"},
                method="POST",
            )
            try:
                _u.urlopen(req)
            except Exception:
                pass  # 403 for wrong identity — push-path test only

        post({"sym": "B", "user": "u1"})
        msg = ws.recv_json()
        assert msg["data"]["user"] == "u1" and msg["data"]["sym"] == "B"
        ws.close()
    finally:
        srv.stop()


def test_stream_lists_basket_keys(spark):
    cat = ChannelCatalog(spark)
    cat.declare("basket", QUOTE)
    cat.add_dynamic_keys("basket", ["A", "B"])
    cat.send("basket", [{"sym": "A", "px": 1.0}])
    srv = GatewayHttpServer(GatewayApi(cat)).start()
    try:
        with urllib.request.urlopen(f"http://127.0.0.1:{srv.port}/api/v1/stream") as r:
            listing = json.loads(r.read())
        assert listing == ["basket", "basket/A", "basket/B"]
    finally:
        srv.stop()


def test_channels_graph_route(served):
    """Reference MountChannelsGraph shape: {channel: {getters, setters}}."""
    base = f"http://127.0.0.1:{served.port}"
    graph = json.loads(urllib.request.urlopen(f"{base}/api/v1/channels_graph").read())
    assert "quotes" in graph
    assert any(g.startswith("state(keyby=sym") for g in graph["quotes"]["getters"])
    assert any(s.startswith("producer[") for s in graph["quotes"]["setters"])


def test_outputs_folder_browser(spark, tmp_path):
    """Reference MountOutputsFolder: directory listing, file streaming,
    and a path-traversal guard."""
    cat = ChannelCatalog(spark)
    cat.declare("quotes", QUOTE)
    root = tmp_path / "outputs"
    (root / "sub").mkdir(parents=True)
    (root / "run.log").write_text("hello logs")
    (root / "sub" / "cfg.yaml").write_text("a: 1")
    api = GatewayApi(cat)
    api.outputs_dir = str(root)
    srv = GatewayHttpServer(api).start()
    base = f"http://127.0.0.1:{srv.port}"
    try:
        listing = json.loads(urllib.request.urlopen(f"{base}/api/v1/outputs").read())
        assert {e["name"]: e["dir"] for e in listing["entries"]} == {"run.log": False, "sub": True}
        body = urllib.request.urlopen(f"{base}/api/v1/outputs/run.log").read()
        assert body == b"hello logs"
        nested = urllib.request.urlopen(f"{base}/api/v1/outputs/sub/cfg.yaml").read()
        assert nested == b"a: 1"
        with pytest.raises(urllib.error.HTTPError) as ei:
            urllib.request.urlopen(f"{base}/api/v1/outputs/../../etc/passwd")
        assert ei.value.code == 404
        with pytest.raises(urllib.error.HTTPError) as ei:
            urllib.request.urlopen(f"{base}/api/v1/outputs/%2e%2e/%2e%2e/etc/passwd")
        assert ei.value.code == 404
        # a symlink inside the root pointing outside must not be served
        # (realpath containment, not just abspath)
        (root / "escape").symlink_to("/etc/passwd")
        with pytest.raises(urllib.error.HTTPError) as ei:
            urllib.request.urlopen(f"{base}/api/v1/outputs/escape")
        assert ei.value.code == 404
    finally:
        srv.stop()


def test_perspective_view_expression_validation(served):
    """Round-12: schema-aware pivot-config validation — a bad SQL
    expression or an unknown column comes back as a clear 422 naming
    the available columns, not an escaped analyzer stack."""
    base = f"http://127.0.0.1:{served.port}"
    bad_expr = {
        "group_by": ["sym"],
        "aggregates": {"px": "sum"},
        "expressions": {"oops": "no_such_col * 2"},
    }
    req = urllib.request.Request(
        f"{base}/api/v1/perspective/view/quotes",
        data=json.dumps(bad_expr).encode(),
        headers={"Content-Type": "application/json"},
        method="POST",
    )
    with pytest.raises(urllib.error.HTTPError) as ei:
        urllib.request.urlopen(req)
    assert ei.value.code == 422
    detail = json.loads(ei.value.read())["detail"]
    assert "bad expression" in detail and "available columns" in detail
    assert "sym" in detail  # the column list is actionable
    bad_col = {"group_by": ["symbol_typo"], "aggregates": {"px": "sum"}}
    req2 = urllib.request.Request(
        f"{base}/api/v1/perspective/view/quotes",
        data=json.dumps(bad_col).encode(),
        headers={"Content-Type": "application/json"},
        method="POST",
    )
    with pytest.raises(urllib.error.HTTPError) as ei:
        urllib.request.urlopen(req2)
    assert ei.value.code == 422
    detail = json.loads(ei.value.read())["detail"]
    assert "unknown column" in detail and "symbol_typo" in detail
    # ADVICE r12: case-insensitive resolution (Spark's default) must
    # pass the pre-check too — 'SYM' resolves to column 'sym'
    upper = {"group_by": ["SYM"], "aggregates": {"px": "sum"}}
    req3 = urllib.request.Request(
        f"{base}/api/v1/perspective/view/quotes",
        data=json.dumps(upper).encode(),
        headers={"Content-Type": "application/json"},
        method="POST",
    )
    rows = json.loads(urllib.request.urlopen(req3).read())
    assert rows and all("SYM" in r or "sym" in r for r in rows)
