"""REST serving surface (SURVEY §2.8).

Routes reproduced from the reference (`web/routes/*`):
  GET  /api/v1/last/<channel>            last tick, list-wrapped
  GET  /api/v1/state/<channel>?query=…   keyed-state snapshot + Query filter
  GET  /api/v1/lookup/<channel>/<id>     record by id
  POST /api/v1/send/<channel>            validate + inject, echo with id/ts
  GET  /api/v1/controls/heartbeat        liveness
  GET  /api/v1/controls/stats            engine stats
  GET  /api/v1/channels                  discovery (≙ GET /stream list)

Two transports, one handler core (`GatewayApi`):
- FastAPI router when fastapi is installed (production path);
- a stdlib ThreadingHTTPServer fallback (this container has no
  fastapi/uvicorn) — same URLs, same JSON shapes, fully testable.

Row-level auth filtering (reference `auth_filter.py:533-571`) is a
serving-layer predicate: pass ``identity_filter={"field": value}`` and
every response is filtered to matching rows; sends whose identity
field mismatches are rejected 403 (`auth_filter.py:280-354`).
"""

from __future__ import annotations

import datetime
import json
import threading
from typing import Any, Dict, List, Optional

from pyspark.sql import Row

from csp_gateway_spark.catalog import ChannelCatalog
from csp_gateway_spark.query import Filter, Query


def _jsonable(value: Any) -> Any:
    if isinstance(value, Row):
        return {k: _jsonable(v) for k, v in value.asDict().items()}
    if isinstance(value, dict):
        return {k: _jsonable(v) for k, v in value.items()}
    if isinstance(value, (list, tuple)):
        return [_jsonable(v) for v in value]
    if isinstance(value, (datetime.datetime, datetime.date)):
        return value.isoformat()
    if isinstance(value, bytes):
        return value.hex()
    try:
        import decimal

        if isinstance(value, decimal.Decimal):
            return float(value)
    except ImportError:  # pragma: no cover
        pass
    return value


def parse_query(query_json: Optional[str]) -> Optional[Query]:
    """`query_json` REST param → Query (reference `utils/fastapi.py:10-32`)."""
    if not query_json:
        return None
    data = json.loads(query_json)
    if isinstance(data, dict) and "filters" in data:
        return Query.model_validate(data)
    if isinstance(data, list):
        return Query(filters=[Filter.model_validate(f) for f in data])
    return Query(filters=[Filter.model_validate(data)])


class ApiError(Exception):
    def __init__(self, status: int, detail: str):
        super().__init__(detail)
        self.status = status
        self.detail = detail


class NextTickBroker:
    """`/next` blocking-read semantics (reference `futures/adapter.py:
    69-134` + filtered variant `auth_filter.py:355-441`): a request
    parks until the channel's next tick arrives, then all waiters are
    released with that tick; timeout → 408.  One Condition per channel;
    ``publish`` is called by send() and by streaming foreachBatch."""

    def __init__(self):
        self._conditions: Dict[str, threading.Condition] = {}
        self._ticks: Dict[str, tuple] = {}  # channel -> (serial, rows)
        self._lock = threading.Lock()

    def _cond(self, channel: str) -> threading.Condition:
        with self._lock:
            return self._conditions.setdefault(channel, threading.Condition())

    def publish(self, channel: str, rows: List[Any]) -> None:
        cond = self._cond(channel)
        with cond:
            serial, _ = self._ticks.get(channel, (0, None))
            self._ticks[channel] = (serial + 1, rows)
            cond.notify_all()

    def wait_next(self, channel: str, timeout: Optional[float] = None) -> List[Any]:
        cond = self._cond(channel)
        with cond:
            start_serial, _ = self._ticks.get(channel, (0, None))
            ok = cond.wait_for(
                lambda: self._ticks.get(channel, (0, None))[0] > start_serial,
                timeout=timeout,
            )
            if not ok:
                raise ApiError(408, f"no tick on {channel!r} within {timeout}s")
            return self._ticks[channel][1]


class GatewayApi:
    """Transport-agnostic handler core over a ChannelCatalog."""

    def __init__(self, catalog: ChannelCatalog, identity_filter: Optional[Dict[str, Any]] = None):
        self.catalog = catalog
        self.identity_filter = identity_filter or {}
        self.broker = NextTickBroker()

    # --- helpers -----------------------------------------------------
    def _auth_rows(self, rows: List[Row]) -> List[dict]:
        out = []
        for row in rows:
            d = row.asDict() if isinstance(row, Row) else dict(row)
            if all(d.get(k) == v for k, v in self.identity_filter.items() if k in d):
                out.append(_jsonable(d))
        return out

    def _channel_or_404(self, channel: str):
        try:
            return self.catalog.get_channel(channel)
        except Exception as e:  # noqa: BLE001
            raise ApiError(404, f"unknown channel {channel!r}: {e}") from e

    # --- routes ------------------------------------------------------
    def last(self, channel: str) -> List[dict]:
        self._channel_or_404(channel)
        return self._auth_rows(self.catalog.last(channel).collect())

    def state(self, channel: str, query_json: Optional[str] = None) -> List[dict]:
        self._channel_or_404(channel)
        try:
            query = parse_query(query_json)
        except Exception as e:  # noqa: BLE001
            raise ApiError(422, f"bad query param: {e}") from e
        try:
            rows = self.catalog.query(channel, query).collect()
        except KeyError as e:
            raise ApiError(404, str(e)) from e
        return self._auth_rows(rows)

    def lookup(self, channel: str, record_id: str) -> List[dict]:
        self._channel_or_404(channel)
        rows = self._auth_rows(self.catalog.lookup(channel, record_id).collect())
        if not rows:
            raise ApiError(404, f"id {record_id!r} not found in {channel!r}")
        return rows

    def send(self, channel: str, payload: Any) -> List[dict]:
        rows = payload if isinstance(payload, list) else [payload]
        for row in rows:
            for field, value in self.identity_filter.items():
                if field in row and row[field] != value:
                    raise ApiError(403, f"identity field {field!r} mismatch")
        try:
            echoed = self.catalog.send(channel, rows)
        except Exception as e:  # noqa: BLE001
            raise ApiError(422, f"send failed: {e}") from e
        out = [_jsonable(r) for r in echoed.collect()]
        self.broker.publish(channel, out)
        return out

    def next(self, channel: str, timeout: Optional[float] = None) -> List[dict]:
        """Block until the channel's next tick (W6 `/next` semantics)."""
        self._channel_or_404(channel)
        rows = self.broker.wait_next(channel, timeout=timeout)
        return self._auth_rows(rows) if rows else []

    def heartbeat(self) -> dict:
        return {"status": "ok", "time": datetime.datetime.utcnow().isoformat()}

    def stats(self) -> dict:
        sc = self.catalog.spark.sparkContext
        return {
            "channels": sorted(self.catalog._producers.keys()),
            "spark": {"appName": sc.appName, "parallelism": sc.defaultParallelism},
        }

    def channels(self) -> List[str]:
        return sorted(self.catalog._producers.keys())


# ---------------------------------------------------------------------------
# FastAPI transport (preferred when installed)
# ---------------------------------------------------------------------------

def build_fastapi_app(api: GatewayApi):
    """Return a FastAPI app mounting the routes, or raise ImportError."""
    from fastapi import FastAPI, HTTPException, Request

    app = FastAPI(title="csp-gateway-spark")

    def guard(fn, *args, **kwargs):
        try:
            return fn(*args, **kwargs)
        except ApiError as e:
            raise HTTPException(status_code=e.status, detail=e.detail) from e

    @app.get("/api/v1/last/{channel}")
    def last(channel: str):
        return guard(api.last, channel)

    @app.get("/api/v1/state/{channel}")
    def state(channel: str, query: Optional[str] = None):
        return guard(api.state, channel, query)

    @app.get("/api/v1/lookup/{channel}/{record_id}")
    def lookup(channel: str, record_id: str):
        return guard(api.lookup, channel, record_id)

    @app.get("/api/v1/next/{channel}")
    def next_tick(channel: str, timeout: float = 30.0):
        return guard(api.next, channel, timeout)

    @app.post("/api/v1/send/{channel}")
    async def send(channel: str, request: Request):
        payload = await request.json()
        return guard(api.send, channel, payload)

    @app.get("/api/v1/controls/heartbeat")
    def heartbeat():
        return api.heartbeat()

    @app.get("/api/v1/controls/stats")
    def stats():
        return api.stats()

    @app.get("/api/v1/channels")
    def channels():
        return api.channels()

    return app


# ---------------------------------------------------------------------------
# stdlib transport (fallback; used by tests in this container)
# ---------------------------------------------------------------------------

class GatewayHttpServer:
    """Minimal threaded HTTP server exposing GatewayApi."""

    def __init__(self, api: GatewayApi, host: str = "127.0.0.1", port: int = 0):
        from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer

        outer = self

        class Handler(BaseHTTPRequestHandler):
            def log_message(self, *args):  # quiet
                pass

            def _reply(self, status: int, body: Any) -> None:
                data = json.dumps(body).encode()
                self.send_response(status)
                self.send_header("Content-Type", "application/json")
                self.send_header("Content-Length", str(len(data)))
                self.end_headers()
                self.wfile.write(data)

            def _route(self, method: str):
                from urllib.parse import parse_qs, urlparse

                parsed = urlparse(self.path)
                parts = [p for p in parsed.path.split("/") if p]
                qs = parse_qs(parsed.query)
                try:
                    if parts[:2] != ["api", "v1"]:
                        raise ApiError(404, "not found")
                    rest = parts[2:]
                    if method == "GET" and rest[0] == "last" and len(rest) == 2:
                        return self._reply(200, outer.api.last(rest[1]))
                    if method == "GET" and rest[0] == "state" and len(rest) == 2:
                        q = qs.get("query", [None])[0]
                        return self._reply(200, outer.api.state(rest[1], q))
                    if method == "GET" and rest[0] == "lookup" and len(rest) == 3:
                        return self._reply(200, outer.api.lookup(rest[1], rest[2]))
                    if method == "GET" and rest[0] == "next" and len(rest) == 2:
                        t = qs.get("timeout", [None])[0]
                        try:
                            timeout = float(t) if t else 30.0
                        except ValueError:
                            raise ApiError(422, f"timeout must be a number, got {t!r}")
                        return self._reply(200, outer.api.next(rest[1], timeout))
                    if method == "POST" and rest[0] == "send" and len(rest) == 2:
                        length = int(self.headers.get("Content-Length", 0))
                        try:
                            payload = json.loads(self.rfile.read(length) or b"null")
                        except json.JSONDecodeError as e:
                            raise ApiError(422, f"malformed JSON body: {e}") from e
                        return self._reply(200, outer.api.send(rest[1], payload))
                    if method == "GET" and rest == ["controls", "heartbeat"]:
                        return self._reply(200, outer.api.heartbeat())
                    if method == "GET" and rest == ["controls", "stats"]:
                        return self._reply(200, outer.api.stats())
                    if method == "GET" and rest == ["channels"]:
                        return self._reply(200, outer.api.channels())
                    raise ApiError(404, "not found")
                except ApiError as e:
                    return self._reply(e.status, {"detail": e.detail})
                except Exception as e:  # noqa: BLE001
                    return self._reply(500, {"detail": str(e)})

            def do_GET(self):
                self._route("GET")

            def do_POST(self):
                self._route("POST")

        self.api = api
        self._server = ThreadingHTTPServer((host, port), Handler)
        self._thread: Optional[threading.Thread] = None

    @property
    def port(self) -> int:
        return self._server.server_address[1]

    def start(self) -> "GatewayHttpServer":
        self._thread = threading.Thread(target=self._server.serve_forever, daemon=True)
        self._thread.start()
        return self

    def stop(self) -> None:
        self._server.shutdown()
        self._server.server_close()
