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


def _user_raised_detail(e: Exception):
    """The message of a Spark ``raise_error`` user exception (the
    bounded-contract guards raise these mid-collect), or None if ``e``
    is anything else.  Works from the typed error class when PySpark
    surfaces one and falls back to the wire format
    ``[USER_RAISED_EXCEPTION] <msg> SQLSTATE: ...``."""
    try:
        from pyspark.errors.exceptions.base import PySparkException

        if isinstance(e, PySparkException):
            cls = None
            try:
                cls = e.getErrorClass()
            except Exception:  # noqa: BLE001
                pass
            if cls == "USER_RAISED_EXCEPTION":
                params = {}
                try:
                    params = e.getMessageParameters() or {}
                except Exception:  # noqa: BLE001
                    pass
                return params.get("errorMessage") or str(e)[:500]
    except Exception:  # noqa: BLE001 — never let detection itself fail
        pass
    s = str(e)
    if "USER_RAISED_EXCEPTION" in s:
        tail = s.split("USER_RAISED_EXCEPTION]", 1)[-1]
        return tail.split("SQLSTATE", 1)[0].strip()[:500]
    return None


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
                t = f"{timeout:.3f}".rstrip("0").rstrip(".") if timeout is not None else "?"
                raise ApiError(408, f"no tick on {channel!r} within {t}s")
            return self._ticks[channel][1]


class GatewayApi:
    """Transport-agnostic handler core over a ChannelCatalog.

    - ``identity_filter``: row-level auth (reference `auth_filter.py:533-571`).
    - ``api_keys``: request auth — accept via `X-API-Key` header, `token`
      query param, or cookie (reference `middleware/api_key.py:22`,
      multi-key).  Empty list/None ⇒ auth disabled.
    - ``readonly``: reject WS "send" actions (reference websocket
      readonly mode, `websocket.py:250-344`).
    """

    def __init__(
        self,
        catalog: ChannelCatalog,
        identity_filter: Optional[Dict[str, Any]] = None,
        api_keys: Optional[List[str]] = None,
        readonly: bool = False,
        heartbeat_interval: float = 1.0,
        auth: Optional[Any] = None,
    ):
        self.catalog = catalog
        self.identity_filter = identity_filter or {}
        self.api_keys = list(api_keys or [])
        self.readonly = readonly
        self.heartbeat_interval = heartbeat_interval
        self.broker = NextTickBroker()
        from csp_gateway_spark.selection import SubscriptionManager

        self.subs = SubscriptionManager()
        self.fields: Dict[str, Any] = {}  # GET /field/<name> statics
        self.layouts: Dict[str, str] = {}  # perspective workspace layouts
        self.default_layout: Optional[str] = None
        self.outputs_dir: Optional[str] = None  # /outputs file browser root
        # auth middleware (serving/auth.py): explicit instance wins; a bare
        # api_keys list keeps working as an implicit ApiKeyAuth
        if auth is None and self.api_keys:
            from csp_gateway_spark.serving.auth import ApiKeyAuth

            auth = ApiKeyAuth(self.api_keys)
        self.auth = auth

    def check_api_key(self, supplied: Optional[str]) -> None:
        import hmac

        # compare UTF-8 bytes: compare_digest on str raises TypeError
        # for non-ASCII input, turning a clean 401 into a 500
        if self.api_keys and not (
            supplied
            and any(
                hmac.compare_digest(supplied.encode("utf-8"), k.encode("utf-8"))
                for k in self.api_keys
            )
        ):
            raise ApiError(401, "invalid or missing API key")

    def check_request(
        self,
        headers: Optional[Dict[str, str]] = None,
        cookies: Optional[Dict[str, str]] = None,
        query_params: Optional[Dict[str, str]] = None,
    ) -> Optional[Dict[str, Any]]:
        """Resolve the request's identity through the configured auth
        middleware; 401 when auth is on and no credential validates.
        Returns the identity dict (None when auth is disabled)."""
        if self.auth is None:
            return None
        identity = self.auth.identity_from_request(
            headers=headers, cookies=cookies, query_params=query_params
        )
        if identity is None:
            raise ApiError(401, "unauthorized")
        return identity

    def key_field(self, channel: str) -> Optional[str]:
        keys = self.catalog._state_keys.get(channel)
        return keys[0] if keys and len(keys) == 1 else None

    # --- helpers -----------------------------------------------------
    def _auth_rows(self, rows: List[Row]) -> List[dict]:
        """Identity filter over already-materialized rows — only for
        broker-delivered tick payloads (/next, WS), which are in-memory
        dicts bounded by one tick.  DataFrame-backed routes must use
        ``_plan_filters`` instead so the predicate runs engine-side."""
        out = []
        for row in rows:
            d = row.asDict() if isinstance(row, Row) else dict(row)
            if all(d.get(k) == v for k, v in self.identity_filter.items() if k in d):
                out.append(_jsonable(d))
        return out

    def _plan_filters(self, channel: str, df, key: Optional[str] = None, limit: Optional[int] = None):
        """Push per-request predicates INTO the DataFrame plan before
        collect (reference `auth_filter.py:533-571` filters each
        response's rows; SURVEY §2.2 P4 maps that to ``df.filter``):

        - row-level identity filter (only on columns the channel has —
          rows without the field pass, matching the dict-side rule);
        - dict-basket key selection (reference `last.py:18-157`);
        - optional ``limit`` so `/state` never materializes more rows
          than the client asked for.

        At 100× state size this is the difference between collecting
        the full table to drop most of it in Python and a filtered
        (often partition-pruned) scan returning only matching rows."""
        from pyspark.sql import functions as F

        for field, value in self.identity_filter.items():
            if field in df.columns:
                df = df.filter(F.col(field) == F.lit(value))
        if key is not None:
            field = self.key_field(channel)
            if field is None:
                raise ApiError(404, f"channel {channel!r} is not keyed")
            df = df.filter(F.col(field).cast("string") == F.lit(key))
        if limit is not None:
            df = df.limit(limit)
        return df

    def _channel_or_404(self, channel: str) -> None:
        """Declared channels are valid even before their first tick
        (a /next waiter may park on a stream that hasn't produced yet)."""
        if channel not in self.catalog._producers:
            raise ApiError(404, f"unknown channel {channel!r}")

    def _collect_or_404(self, channel: str, df_fn) -> List[Row]:
        try:
            return df_fn().collect()
        except ApiError:
            raise
        except Exception as e:  # noqa: BLE001 — unwired: no ticks yet
            detail = _user_raised_detail(e)
            if detail is not None:
                # an operator's in-plan contract guard fired
                # (max_cells / max_fp_frequency raise_error): the
                # caller hit a documented bound, not a server fault —
                # surface the quantize-first message as a structured
                # 422, never a 500/404
                raise ApiError(
                    422, f"operator contract bound hit: {detail}"
                ) from e
            raise ApiError(404, f"no ticks yet on {channel!r}: {e}") from e

    # --- routes ------------------------------------------------------
    def last(self, channel: str, key: Optional[str] = None) -> List[dict]:
        self._channel_or_404(channel)
        rows = self._collect_or_404(
            channel, lambda: self._plan_filters(channel, self.catalog.last(channel), key=key)
        )
        if key is not None and not rows:
            raise ApiError(404, f"key {key!r} not found in {channel!r}")
        return [_jsonable(r) for r in rows]

    def state(
        self,
        channel: str,
        query_json: Optional[str] = None,
        key: Optional[str] = None,
        limit: Optional[int] = None,
    ) -> List[dict]:
        self._channel_or_404(channel)
        try:
            query = parse_query(query_json)
        except Exception as e:  # noqa: BLE001
            raise ApiError(422, f"bad query param: {e}") from e
        if limit is not None and limit < 0:
            raise ApiError(422, f"limit must be >= 0, got {limit}")
        rows = self._collect_or_404(
            channel,
            lambda: self._plan_filters(channel, self.catalog.query(channel, query), key=key, limit=limit),
        )
        if key is not None and not rows:
            raise ApiError(404, f"key {key!r} not found in {channel!r}")
        return [_jsonable(r) for r in rows]

    def lookup(self, channel: str, record_id: str) -> List[dict]:
        self._channel_or_404(channel)
        rows = self._collect_or_404(
            channel, lambda: self._plan_filters(channel, self.catalog.lookup(channel, record_id))
        )
        if not rows:
            raise ApiError(404, f"id {record_id!r} not found in {channel!r}")
        return [_jsonable(r) for r in rows]

    def index_html(self) -> str:
        """`GET /` — a minimal dependency-free live view: channel list
        + auto-refreshing state tables over the JSON routes.  NOT the
        reference's Perspective pivot UI (SURVEY §7.4 descopes the
        Perspective wire protocol; see README); it gives a browser a
        usable face over the same data the Perspective routes expose."""
        chans = json.dumps(sorted(self.catalog._producers))
        return (
            "<!doctype html><html><head><meta charset='utf-8'>"
            "<title>csp-gateway-spark</title><style>"
            "body{font-family:monospace;margin:2em}table{border-collapse:collapse;margin:1em 0}"
            "td,th{border:1px solid #999;padding:2px 8px}h2{margin:1em 0 0}"
            "</style></head><body><h1>csp-gateway-spark</h1>"
            "<p>channels (state auto-refreshes every 2s; API under /api/v1, "
            "<a href='/openapi.json'>openapi.json</a>)</p><div id='root'></div>"
            "<script>const CH=" + chans + ";"
            "async function tick(){const root=document.getElementById('root');"
            "for(const ch of CH){let el=document.getElementById('ch-'+ch);"
            "if(!el){el=document.createElement('div');el.id='ch-'+ch;root.appendChild(el);}"
            "try{const r=await fetch('/api/v1/state/'+ch+'?limit=50');"
            "if(!r.ok){el.innerHTML='<h2>'+ch+'</h2><p>'+r.status+'</p>';continue;}"
            "const rows=await r.json();if(!rows.length){el.innerHTML='<h2>'+ch+'</h2><p>no ticks</p>';continue;}"
            "const cols=Object.keys(rows[0]);let h='<h2>'+ch+'</h2><table><tr>';"
            "for(const c of cols)h+='<th>'+c+'</th>';h+='</tr>';"
            "for(const row of rows){h+='<tr>';for(const c of cols)h+='<td>'+String(row[c])+'</td>';h+='</tr>';}"
            "el.innerHTML=h+'</table>';}catch(e){el.innerHTML='<h2>'+ch+'</h2><p>'+e+'</p>';}}}"
            "tick();setInterval(tick,2000);</script></body></html>"
        )

    def lookup_channels(self) -> List[str]:
        """`GET /lookup` — the channels addressable under the lookup
        route (reference `web/routes/lookup.py:57-69`
        ``add_lookup_available_channels``)."""
        return sorted(self.catalog._producers)

    def lookup_id(self, record_id: str) -> List[dict]:
        """`GET /lookup/id/<id>` — global id lookup across every
        channel (reference `web/routes/lookup.py:70-85`:
        ``global_lookup`` on an in-memory registry of every struct ever
        created).  Spark design: no unbounded registry — ids are
        globally unique (day-epoch counter, `structs.py`), so the
        id-filtered probes of every channel — schemas unified as
        ``(channel, to_json(struct(*)))`` — union into ONE job: a
        single collect answers the route (and the 404 path) no matter
        how many channels exist, each branch the same pushed-down
        point predicate as `/lookup/<ch>/<id>`."""
        import json as _json

        from pyspark.sql import functions as F

        probes = []
        for name in sorted(self.catalog._producers):
            try:
                df = self._plan_filters(name, self.catalog.lookup(name, record_id))
            except Exception:  # noqa: BLE001 — unbound/tickless channel
                continue
            probes.append(
                df.select(
                    F.lit(name).alias("_channel"),
                    F.to_json(F.struct(*df.columns)).alias("_record"),
                )
            )
        if probes:
            unioned = probes[0]
            for p in probes[1:]:
                unioned = unioned.unionByName(p)
            rows = [_json.loads(r["_record"]) for r in unioned.collect()]
            if rows:
                return [_jsonable(r) for r in rows]
        raise ApiError(404, f"No record found with id: {record_id}")

    def send(self, channel: str, payload: Any, key: Optional[str] = None) -> List[dict]:
        rows = payload if isinstance(payload, list) else [payload]
        if key is not None:
            field = self.key_field(channel)
            if field is None:
                raise ApiError(404, f"channel {channel!r} is not keyed")
            rows = [{**row, field: key} for row in rows]
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
        self.subs.publish(channel, out, key_field=self.key_field(channel))
        return out

    def next(self, channel: str, timeout: Optional[float] = None, key: Optional[str] = None) -> List[dict]:
        """Block until the channel's next tick (W6 `/next` semantics).
        With ``key``: loop over ticks until one contains a matching
        record or the deadline passes (reference `auth_filter.py:
        355-441` filtered variant)."""
        self._channel_or_404(channel)
        if key is None:
            rows = self.broker.wait_next(channel, timeout=timeout)
            return self._auth_rows(rows) if rows else []
        field = self.key_field(channel)
        if field is None:
            raise ApiError(404, f"channel {channel!r} is not keyed")
        import time as _time

        deadline = None if timeout is None else _time.monotonic() + timeout
        while True:
            remaining = None if deadline is None else max(0.0, deadline - _time.monotonic())
            rows = self.broker.wait_next(channel, timeout=remaining)
            matched = [r for r in self._auth_rows(rows) if str(r.get(field)) == key]
            if matched:
                return matched

    def heartbeat(self) -> dict:
        return {"status": "ok", "time": datetime.datetime.utcnow().isoformat()}

    def stats(self) -> dict:
        """Engine + host stats (reference `controls/controls.py:40-90`:
        hostname/user/pid/cpu/memory, psutil-gated with a stdlib
        resource/os fallback)."""
        import getpass
        import os
        import socket

        sc = self.catalog.spark.sparkContext
        out = {
            "channels": sorted(self.catalog._producers.keys()),
            "spark": {"appName": sc.appName, "parallelism": sc.defaultParallelism},
            "hostname": socket.gethostname(),
            "user": getpass.getuser(),
            "pid": os.getpid(),
            "now": datetime.datetime.now(datetime.timezone.utc).isoformat(),
        }
        try:
            import psutil  # type: ignore[import-not-found]

            out["cpu"] = psutil.cpu_percent()
            out["memory"] = psutil.virtual_memory().percent
        except ImportError:
            try:
                import resource

                out["maxrss_kb"] = resource.getrusage(resource.RUSAGE_SELF).ru_maxrss
            except Exception:  # noqa: BLE001 — stats stay best-effort
                pass
        return out

    def channels(self) -> List[str]:
        return sorted(self.catalog._producers.keys())

    def stream_channels(self) -> List[str]:
        """`GET /stream` listing (reference `websocket.py:381-444`):
        channel names plus per-key basket entries as ``channel/key``."""
        out = []
        for name in self.channels():
            out.append(name)
            out.extend(f"{name}/{k}" for k in self.catalog._dynamic_keys.get(name, []))
        return out

    def field(self, name: str) -> Any:
        """Static channel fields (reference `mount_fields.py:10-83`)."""
        if name not in self.fields:
            raise ApiError(404, f"unknown field {name!r}")
        return _jsonable(self.fields[name])

    def perspective_tables(self) -> Dict[str, Any]:
        """Table discovery (reference `perspective.py:541-627`): one
        entry per channel with its column:type map."""
        out = {}
        for name in self.channels():
            try:
                schema = self.catalog.get_channel(name).schema
            except Exception:  # noqa: BLE001 — declared but unwired
                continue
            out[name] = {f.name: f.dataType.simpleString() for f in schema.fields}
        return out

    def perspective_meta(self) -> Dict[str, Any]:
        """Index/limit metadata per table (reference `perspective.py:606-627`);
        index = the state keyby columns (upsert key)."""
        return {
            name: {"index": list(self.catalog._state_keys.get(name, [])) or None}
            for name in self.channels()
        }

    def outputs_entry(self, rel_path: str = "") -> tuple:
        """Outputs-folder browser (reference MountOutputsFolder,
        `web/outputs.py:21-80`): list directories as JSON, stream file
        bytes; paths outside the configured root 404 (traversal guard).
        Returns ("dir", listing) or ("file", bytes)."""
        import os

        if not self.outputs_dir:
            raise ApiError(404, "no outputs dir configured")
        # realpath (not abspath): a symlink under the root pointing outside
        # would pass an abspath prefix check but must not be served
        root = os.path.realpath(self.outputs_dir)
        target = os.path.realpath(os.path.join(root, rel_path)) if rel_path else root
        if not (target == root or target.startswith(root + os.sep)) or not os.path.exists(target):
            raise ApiError(404, f"not found: {rel_path!r}")
        if os.path.isdir(target):
            entries = sorted(os.listdir(target))
            return "dir", {
                "path": rel_path,
                "entries": [
                    {"name": e, "dir": os.path.isdir(os.path.join(target, e))} for e in entries
                ],
            }
        with open(target, "rb") as fh:
            return "file", fh.read()

    def channels_graph(self) -> Dict[str, Any]:
        """Channel wiring introspection (reference MountChannelsGraph,
        `web/channels_graph.py:13-50`): {channel: {getters, setters}}
        built from catalog metadata — producers, mirrors, keyed state,
        dict baskets."""
        cat = self.catalog
        mirror_to: Dict[str, List[str]] = {}
        for dst, srcs in cat._mirrors.items():
            for src in srcs:
                mirror_to.setdefault(src, []).append(dst)
        out: Dict[str, Any] = {}
        for name in self.channels():
            setters = [f"producer[{i}]" for i in range(len(cat._producers.get(name, [])))]
            setters += [f"mirror:{src}" for src in cat._mirrors.get(name, [])]
            getters = []
            if name in cat._state_keys:
                getters.append(f"state(keyby={','.join(cat._state_keys[name])})")
            getters += [f"mirror->{dst}" for dst in mirror_to.get(name, [])]
            if cat._dynamic_keys.get(name):
                getters.append(f"basket[{len(cat._dynamic_keys[name])}]")
            out[name] = {"getters": getters, "setters": setters}
        return out

    # --- perspective layouts (reference perspective.py:578-592: saved
    # workspace layouts served to every client; name -> layout JSON str) ---
    def perspective_layouts(self) -> Dict[str, Any]:
        return {"layouts": dict(self.layouts), "default_layout": self.default_layout}

    def perspective_layout_save(self, name: str, layout: Any) -> Dict[str, Any]:
        if not isinstance(layout, str):
            layout = json.dumps(layout)
        self.layouts[name] = layout
        if self.default_layout is None:
            self.default_layout = name
        return {"status": "ok", "name": name}

    def perspective_layout_delete(self, name: str) -> Dict[str, Any]:
        if name not in self.layouts:
            raise ApiError(404, f"unknown layout {name!r}")
        del self.layouts[name]
        if self.default_layout == name:
            self.default_layout = next(iter(self.layouts), None)
        return {"status": "ok", "name": name}

    def perspective_arrow(self, channel: str, limit: Optional[int] = None) -> bytes:
        """State snapshot as an Arrow IPC stream (reference wire format:
        `perspective.py:71-100` builds pyarrow Tables and ships record
        batches to the Perspective client).  Row-level auth applies the
        same as the JSON routes."""
        import io

        import pyarrow as pa

        self._channel_or_404(channel)
        lim = None if limit is None else int(limit)
        rows = self._collect_or_404(
            channel,
            lambda: self._plan_filters(channel, self.catalog.query(channel, None), limit=lim),
        )
        table = pa.Table.from_pylist([_jsonable(r) for r in rows])
        sink = io.BytesIO()
        with pa.ipc.new_stream(sink, table.schema) as writer:
            writer.write_table(table)
        return sink.getvalue()

    def perspective_view_compute(
        self, channel: str, config: Optional[Dict[str, Any]] = None,
        limit: Optional[int] = None,
    ) -> List[Dict[str, Any]]:
        """Server-side ViewConfig materialization over the table's
        state (reference `perspective.py:133-142` view configs run in
        the embedded Perspective engine; here SPARK is the pivot
        engine — group_by/split_by/aggregates/sort/filter/expressions
        compile to one distributed plan and only the pivoted grid is
        collected).  Row-level auth filters apply BEFORE aggregation,
        same as the JSON routes."""
        from csp_gateway_spark.operators.pivot import _AGGS, ViewConfig, perspective_view

        self._channel_or_404(channel)
        try:
            cfg = ViewConfig(**(config or {}))
        except Exception as e:  # noqa: BLE001 — pydantic validation
            raise ApiError(422, f"bad view config: {e}") from e
        for agg_name in cfg.aggregates.values():
            if agg_name.lower() not in _AGGS:
                raise ApiError(
                    422,
                    f"unsupported aggregate {agg_name!r}; one of {sorted(_AGGS)}",
                )
        # schema-aware pre-validation: resolve the channel's plan once
        # and check every expression / referenced column against it so
        # a typo'd pivot config comes back as a clear 422 naming the
        # available columns, not an escaped analyzer stack.  Plan
        # resolution failures (no ticks yet) fall through to the
        # normal 404 path below.
        plan_df = None
        try:
            plan_df = self._plan_filters(channel, self.catalog.query(channel, None))
        except Exception:  # noqa: BLE001 — unwired channel: defer to collect
            pass
        if plan_df is not None:
            avail = sorted(plan_df.columns)
            for name, expr in cfg.expressions.items():
                try:
                    plan_df.selectExpr(f"{expr} AS `{name}`")
                except Exception as e:  # noqa: BLE001 — analyzer reject
                    first = str(e).strip().splitlines()[0][:200]
                    raise ApiError(
                        422,
                        f"bad expression {name!r} = {expr!r}: {first}; "
                        f"available columns: {avail}",
                    ) from e
            # sort/columns resolve against the AGGREGATED output
            # (agg aliases like sum_px), so only pre-agg references
            # are validated here
            known = set(avail) | set(cfg.expressions)
            # Spark's analyzer resolves columns case-insensitively
            # unless spark.sql.caseSensitive is on — the pre-check
            # must match, or configs the analyzer accepts (e.g. 'SYM'
            # for column 'sym') get a spurious 422 here
            case_sensitive = (
                plan_df.sparkSession.conf.get(
                    "spark.sql.caseSensitive", "false"
                )
                or "false"
            ).lower() == "true"
            known_cmp = known if case_sensitive else {c.lower() for c in known}
            referenced = (
                list(cfg.group_by) + list(cfg.split_by) + list(cfg.aggregates)
                + [c for c, _, _ in cfg.filter]
            )
            for c in referenced:
                if (c if case_sensitive else c.lower()) not in known_cmp:
                    raise ApiError(
                        422,
                        f"unknown column {c!r}; available columns: "
                        f"{sorted(known)}",
                    )
        lim = 1000 if limit is None else int(limit)
        rows = self._collect_or_404(
            channel,
            lambda: perspective_view(
                self._plan_filters(channel, self.catalog.query(channel, None)), cfg
            ).limit(lim),
        )
        return [_jsonable(r) for r in rows]

    def perspective_ui_html(self) -> str:
        """`GET /perspective/ui` — a dependency-free pivot grid over
        the view-compute route: pick a table, group-by / split-by
        columns and an aggregate, and the server-side Spark pivot
        renders as an HTML table.  A basic UI over the same data
        surface the reference's bundled Perspective workspace serves
        (`perspective.py:541-627`); the Perspective websocket wire
        protocol itself remains descoped per SURVEY §7.4."""
        return (
            "<!doctype html><html><head><meta charset='utf-8'>"
            "<title>pivot — csp-gateway-spark</title><style>"
            "body{font-family:monospace;margin:2em}table{border-collapse:collapse;margin:1em 0}"
            "td,th{border:1px solid #999;padding:2px 8px}select,button{margin-right:8px}"
            "</style></head><body><h1>pivot viewer</h1>"
            "<div>table <select id='tbl'></select>"
            " group_by <select id='gb'></select>"
            " split_by <select id='sb'><option value=''>(none)</option></select>"
            " agg <select id='agg'><option>count</option><option>sum</option>"
            "<option>avg</option><option>min</option><option>max</option>"
            "<option>median</option><option>unique</option></select>"
            " of <select id='col'></select>"
            " sort <select id='sd'><option>asc</option><option>desc</option></select>"
            " expr <input id='ex' size='24' placeholder='name=SQL expr (optional)'>"
            " <button onclick='go()'>pivot</button></div>"
            "<div id='grid'></div><script>"
            "let SCHEMAS={};"
            "function esc(s){return String(s).replace(/&/g,'&amp;')"
            ".replace(/</g,'&lt;').replace(/>/g,'&gt;').replace(/\"/g,'&quot;');}"
            "async function init(){SCHEMAS=await (await fetch('/api/v1/perspective/tables')).json();"
            "const t=document.getElementById('tbl');"
            "for(const name of Object.keys(SCHEMAS)){const o=document.createElement('option');o.text=name;t.add(o);}"
            "t.onchange=fill;fill();}"
            "function fill(){const name=document.getElementById('tbl').value;"
            "if(!name)return;const cols=Object.keys(SCHEMAS[name]||{});"
            "for(const id of ['gb','sb','col']){const s=document.getElementById(id);"
            "s.innerHTML=id==='sb'?'<option value=\\'\\'>(none)</option>':'';"
            "for(const c of cols){const o=document.createElement('option');o.text=c;s.add(o);}}}"
            "async function go(){const name=document.getElementById('tbl').value;"
            "const gb=document.getElementById('gb').value,sb=document.getElementById('sb').value;"
            "const agg=document.getElementById('agg').value,col=document.getElementById('col').value;"
            "const sd=document.getElementById('sd').value,ex=document.getElementById('ex').value;"
            "const cfg={group_by:[gb],aggregates:{[col]:agg},sort:[[gb,sd]]};"
            "if(sb&&sb!==gb)cfg.split_by=[sb];"
            "const eq=ex.indexOf('=');"
            "if(eq>0)cfg.expressions={[ex.slice(0,eq).trim()]:ex.slice(eq+1).trim()};"
            "const r=await fetch('/api/v1/perspective/view/'+name,"
            "{method:'POST',headers:{'Content-Type':'application/json'},body:JSON.stringify(cfg)});"
            "const grid=document.getElementById('grid');"
            "if(!r.ok){grid.innerHTML='<p>'+esc(r.status)+' '+esc(await r.text())+'</p>';return;}"
            "const rows=await r.json();if(!rows.length){grid.innerHTML='<p>no rows</p>';return;}"
            "const cols=Object.keys(rows[0]);let h='<table><tr>';"
            "for(const c of cols)h+='<th>'+esc(c)+'</th>';h+='</tr>';"
            "for(const row of rows){h+='<tr>';for(const c of cols)h+='<td>'+esc(row[c])+'</td>';h+='</tr>';}"
            "grid.innerHTML=h+'</table>';}"
            "init();</script></body></html>"
        )

    def openapi(self) -> Dict[str, Any]:
        """Minimal OpenAPI document with the reference's `type_` extra
        (fully-qualified type name per route → client `as_struct`,
        reference `routes/shared.py:15-37`)."""
        paths: Dict[str, Any] = {}
        schemas: Dict[str, Any] = {}
        for name in self.channels():
            try:
                schema = self.catalog.get_channel(name).schema
            except Exception:  # noqa: BLE001
                continue
            schemas[name] = json.loads(schema.json())
            for verb, route in (
                ("get", f"/api/v1/last/{name}"),
                ("get", f"/api/v1/state/{name}"),
                ("get", f"/api/v1/next/{name}"),
                ("post", f"/api/v1/send/{name}"),
            ):
                paths.setdefault(route, {})[verb] = {
                    "responses": {"200": {"description": "rows"}},
                    "type_": f"csp_gateway_spark.channels.{name}",
                }
        return {
            "openapi": "3.1.0",
            "info": {"title": "csp-gateway-spark", "version": "1.0"},
            "paths": paths,
            "components": {"schemas": schemas},
        }

    def shutdown(self) -> dict:
        """POST /controls/shutdown (reference `controls.py(routes):27-110`)."""
        server = getattr(self, "_http_server", None)
        if server is not None:
            threading.Thread(target=server.stop, daemon=True).start()
        return {"status": "shutting down"}

    # --- auth routes (shared by both transports; reference simple.py
    # /login, oauth.py /login /callback /logout /userinfo) --------------
    def auth_login_simple(self, username: str, password: str) -> tuple:
        """Form login → (body, Set-Cookie value); 404 when the configured
        middleware is not SimpleAuth."""
        from csp_gateway_spark.serving.auth import SimpleAuth

        if not isinstance(self.auth, SimpleAuth):
            raise ApiError(404, "not found")
        sid = self.auth.login(username, password)
        if sid is None:
            raise ApiError(401, "unauthorized")
        return (
            {"status": "ok", "session": sid},
            # Path=/ — RFC 6265 defaults the path to /api/v1/auth,
            # which would hide the cookie from the protected /api/v1/*
            f"{self.auth.cookie_name}={sid}; Path=/; HttpOnly; SameSite=Lax",
        )

    def auth_login_redirect(self, host: str) -> dict:
        from csp_gateway_spark.serving.auth import OAuth2Auth

        if not isinstance(self.auth, OAuth2Auth):
            raise ApiError(404, "not found")
        redirect_uri = f"http://{host}/api/v1/auth/callback"
        return {"redirect": self.auth.authorize_redirect(redirect_uri)}

    def auth_callback(self, code: Optional[str], error: Optional[str], host: str) -> tuple:
        from csp_gateway_spark.serving.auth import OAuth2Auth

        if not isinstance(self.auth, OAuth2Auth):
            raise ApiError(404, "not found")
        if error:
            raise ApiError(400, error)
        if not code:
            raise ApiError(400, "No authorization code provided")
        sid = self.auth.handle_callback(code, f"http://{host}/api/v1/auth/callback")
        return (
            {"status": "ok", "session": sid},
            # Path=/ — RFC 6265 defaults the path to /api/v1/auth,
            # which would hide the cookie from the protected /api/v1/*
            f"{self.auth.cookie_name}={sid}; Path=/; HttpOnly; SameSite=Lax",
        )

    def auth_logout(self, cookies: Optional[Dict[str, str]]) -> dict:
        if self.auth is not None:
            self.auth.drop_session((cookies or {}).get(self.auth.cookie_name))
        return {"status": "ok"}


def stream_into_gateway(
    api: GatewayApi,
    channel: str,
    stream,
    trigger_seconds: float = 0.5,
    checkpoint: Optional[str] = None,
):
    """Bridge a streaming DataFrame into the live serving loop
    (reference §3.3: tick → `/last` → WS fan-out): every micro-batch's
    rows become channel ticks — id/timestamp stamped by the catalog,
    `/next` waiters released, WS subscribers fanned out — one
    micro-batch ≙ one engine cycle.

    Scale note: only the micro-batch's OWN rows are collected (the
    serving edge is row-scale by definition — the same place the
    reference crosses from csp into asyncio); the heavy aggregation
    stays distributed (`streaming/state_stream.py`)."""

    def on_batch(batch_df, batch_id: int) -> None:
        # PERMISSIVE-mode sources emit all-null rows for corrupt
        # records — drop them before they become ticks
        rows = [r.asDict() for r in batch_df.na.drop("all").collect()]
        if rows:
            api.send(channel, rows)

    writer = (
        stream.writeStream.foreachBatch(on_batch)
        .outputMode("append")
        .trigger(processingTime=f"{trigger_seconds} seconds")
    )
    if checkpoint:
        writer = writer.option("checkpointLocation", checkpoint)
    return writer.start()


# ---------------------------------------------------------------------------
# WebSocket session (shared protocol core; stdlib transport drives it)
# ---------------------------------------------------------------------------

class WsSession:
    """One `/stream` connection (reference `modules/web/websocket.py:
    250-344`): JSON actions subscribe/unsubscribe/send; one drainer
    thread per subscription pushes `{"channel": c, "data": row}`
    frames; `heartbeat` is a synthetic per-connection channel ticking
    every ``api.heartbeat_interval`` (reference `websocket.py:161-181`);
    readonly mode rejects sends."""

    def __init__(self, api: GatewayApi, rfile, wfile):
        from csp_gateway_spark.serving import ws as _ws

        self.api = api
        self.ws = _ws
        self.rfile = rfile
        self.wfile = wfile
        self._write_lock = threading.Lock()
        self._subs: Dict[tuple, Any] = {}  # (channel, key) -> Subscription
        self._alive = True

    def _send_json(self, obj: Any) -> None:
        with self._write_lock:
            self.ws.write_frame(self.wfile, json.dumps(obj).encode())

    def _drain(self, channel: str, sub) -> None:
        ident = self.api.identity_filter
        while self._alive:
            row = sub.queue.get()
            if row is None:  # poison pill from unsubscribe/close
                return
            # row-level auth on the push path too (reference applies the
            # identity filter to websocket frames, auth_filter.py:654+)
            if ident and isinstance(row, dict) and not all(
                row.get(k) == v for k, v in ident.items() if k in row
            ):
                continue
            try:
                self._send_json({"channel": channel, "data": row})
            except OSError:
                return

    def _heartbeat(self) -> None:
        import time

        while self._alive and ("heartbeat", "*") in self._subs:
            self._send_json(
                {"channel": "heartbeat", "data": {"time": datetime.datetime.utcnow().isoformat()}}
            )
            time.sleep(self.api.heartbeat_interval)

    def _handle(self, msg: dict) -> None:
        action = msg.get("action")
        channel = msg.get("channel", "")
        key = msg.get("key", "*")
        if action == "subscribe":
            if channel != "heartbeat" and channel not in self.api.channels():
                self._send_json({"error": f"unknown channel {channel!r}"})
                return
            sub = self.api.subs.subscribe(channel, key=key)
            self._subs[(channel, key)] = sub
            if channel == "heartbeat":
                threading.Thread(target=self._heartbeat, daemon=True).start()
            else:
                threading.Thread(target=self._drain, args=(channel, sub), daemon=True).start()
        elif action == "unsubscribe":
            sub = self._subs.pop((channel, key), None)
            if sub is not None:
                self.api.subs.unsubscribe(sub)
                sub.queue.put(None)
        elif action == "send":
            if self.api.readonly:
                self._send_json({"error": "gateway is readonly"})
                return
            try:
                self.api.send(channel, msg.get("data"))
            except ApiError as e:
                self._send_json({"error": e.detail})
        else:
            self._send_json({"error": f"unknown action {action!r}"})

    def run(self) -> None:
        try:
            while True:
                opcode, payload = self.ws.read_frame(self.rfile)
                if opcode == self.ws.OP_CLOSE:
                    break
                if opcode == self.ws.OP_PING:
                    with self._write_lock:
                        self.ws.write_frame(self.wfile, payload, self.ws.OP_PONG)
                    continue
                if opcode != self.ws.OP_TEXT:
                    continue
                try:
                    self._handle(json.loads(payload))
                except json.JSONDecodeError:
                    self._send_json({"error": "malformed JSON message"})
        except (ConnectionError, OSError):
            pass
        finally:
            self._alive = False
            for sub in self._subs.values():
                self.api.subs.unsubscribe(sub)
                sub.queue.put(None)


# ---------------------------------------------------------------------------
# FastAPI transport (preferred when installed)
# ---------------------------------------------------------------------------

def fastapi_auth_dependency(api: GatewayApi):
    """The per-request auth check every protected FastAPI route depends
    on — the FastAPI analogue of the stdlib transport's ``_check``
    (reference mounts auth dependencies on every route; without this a
    fastapi deployment would silently skip configured auth).  Returns
    an async callable suitable for ``Depends``; raises ApiError (mapped
    to HTTP status by the app's exception handler) on missing/invalid
    credentials.  Kept fastapi-import-free so it is unit-testable in
    containers without fastapi."""

    async def dep(request) -> Optional[Dict[str, Any]]:
        return api.check_request(
            headers=dict(request.headers),
            cookies=dict(request.cookies),
            query_params=dict(request.query_params),
        )

    return dep


def build_fastapi_app(api: GatewayApi):
    """Return a FastAPI app mounting the routes, or raise ImportError.

    Every /api/v1 route carries the auth dependency (identity resolved
    via ``api.check_request``); the /api/v1/auth login/callback/logout
    routes are public, mirroring the stdlib transport."""
    from fastapi import APIRouter, Depends, FastAPI, Request, Response
    from fastapi.responses import JSONResponse

    app = FastAPI(title="csp-gateway-spark")

    @app.exception_handler(ApiError)
    async def api_error_handler(request, exc: ApiError):
        return JSONResponse(status_code=exc.status, content={"detail": exc.detail})

    auth_dep = fastapi_auth_dependency(api)
    protected = APIRouter(prefix="/api/v1", dependencies=[Depends(auth_dep)])
    public = APIRouter(prefix="/api/v1")

    # --- public auth endpoints (login/callback/logout) ---------------
    @public.post("/auth/login")
    async def auth_login(request: Request):
        payload = await request.json()
        body, cookie = api.auth_login_simple(
            payload.get("username", ""), payload.get("password", "")
        )
        resp = JSONResponse(content=body)
        resp.headers["Set-Cookie"] = cookie
        return resp

    @public.get("/auth/login")
    def auth_login_redirect(request: Request):
        return api.auth_login_redirect(request.headers.get("host", "localhost"))

    @public.get("/auth/callback")
    def auth_callback(request: Request, code: Optional[str] = None, error: Optional[str] = None):
        body, cookie = api.auth_callback(code, error, request.headers.get("host", "localhost"))
        resp = JSONResponse(content=body)
        resp.headers["Set-Cookie"] = cookie
        return resp

    @public.get("/auth/logout")
    def auth_logout(request: Request):
        return api.auth_logout(dict(request.cookies))

    @protected.get("/auth/userinfo")
    def auth_userinfo(identity: Optional[Dict[str, Any]] = Depends(auth_dep)):
        return _jsonable(identity or {})

    # --- protected routes --------------------------------------------
    @protected.get("/last/{channel}")
    def last(channel: str):
        return api.last(channel)

    @protected.get("/last/{channel}/{key}")
    def last_key(channel: str, key: str):
        return api.last(channel, key)

    @protected.get("/state/{channel}")
    def state(channel: str, query: Optional[str] = None, limit: Optional[int] = None):
        return api.state(channel, query, limit=limit)

    @protected.get("/state/{channel}/{key}")
    def state_key(channel: str, key: str, query: Optional[str] = None, limit: Optional[int] = None):
        return api.state(channel, query, key, limit=limit)

    @protected.get("/next/{channel}/{key}")
    def next_key(channel: str, key: str, timeout: float = 30.0):
        return api.next(channel, timeout, key)

    @protected.post("/send/{channel}/{key}")
    async def send_key(channel: str, key: str, request: Request):
        payload = await request.json()
        return api.send(channel, payload, key)

    @protected.get("/lookup")
    def lookup_channels():
        return api.lookup_channels()

    @protected.get("/lookup/id/{record_id}")
    def lookup_id(record_id: str):
        return api.lookup_id(record_id)

    @protected.get("/lookup/{channel}/{record_id}")
    def lookup(channel: str, record_id: str):
        return api.lookup(channel, record_id)

    @protected.get("/next/{channel}")
    def next_tick(channel: str, timeout: float = 30.0):
        return api.next(channel, timeout)

    @protected.post("/send/{channel}")
    async def send(channel: str, request: Request):
        payload = await request.json()
        return api.send(channel, payload)

    @protected.get("/controls/heartbeat")
    def heartbeat():
        return api.heartbeat()

    @protected.get("/controls/stats")
    def stats():
        return api.stats()

    @protected.get("/channels")
    def channels():
        return api.channels()

    @protected.get("/field/{name}")
    def field(name: str):
        return api.field(name)

    @protected.get("/perspective/tables")
    def perspective_tables():
        return api.perspective_tables()

    @protected.get("/perspective/meta")
    def perspective_meta():
        return api.perspective_meta()

    @protected.get("/channels_graph")
    def channels_graph():
        return api.channels_graph()

    @protected.get("/outputs/{full_path:path}")
    def outputs(full_path: str = ""):
        kind, payload = api.outputs_entry(full_path)
        if kind == "dir":
            return payload
        return Response(content=payload, media_type="application/octet-stream")

    @protected.get("/perspective/layouts")
    def perspective_layouts():
        return api.perspective_layouts()

    @protected.post("/perspective/layouts/{name}")
    def perspective_layout_save(name: str, layout: Any):
        return api.perspective_layout_save(name, layout)

    @protected.delete("/perspective/layouts/{name}")
    def perspective_layout_delete(name: str):
        return api.perspective_layout_delete(name)

    @protected.get("/perspective/arrow/{name}")
    def perspective_arrow(name: str, limit: Optional[int] = None):
        return Response(
            content=api.perspective_arrow(name, limit),
            media_type="application/vnd.apache.arrow.stream",
        )

    @protected.post("/perspective/view/{name}")
    async def perspective_view(name: str, request: Request, limit: Optional[int] = None):
        # FastAPI treats an `Any`-annotated param as a scalar query param,
        # so the JSON view config must be read from the request body
        # explicitly (same pattern as the send routes above).
        try:
            config = await request.json()
        except Exception:
            config = None
        return api.perspective_view_compute(name, config, limit)

    @protected.get("/perspective/ui")
    def perspective_ui():
        from fastapi.responses import HTMLResponse

        return HTMLResponse(content=api.perspective_ui_html())

    @protected.post("/controls/shutdown")
    def shutdown():
        return api.shutdown()

    @app.get("/")
    def index():
        from fastapi.responses import HTMLResponse

        return HTMLResponse(content=api.index_html())

    app.include_router(public)
    app.include_router(protected)
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

            def _reply(self, status: int, body: Any, extra_headers: Optional[Dict[str, str]] = None) -> None:
                data = json.dumps(body).encode()
                self.send_response(status)
                self.send_header("Content-Type", "application/json")
                self.send_header("Content-Length", str(len(data)))
                for k, v in (extra_headers or {}).items():
                    self.send_header(k, v)
                self.end_headers()
                self.wfile.write(data)

            def _reply_html(self, html: str) -> None:
                data = html.encode()
                self.send_response(200)
                self.send_header("Content-Type", "text/html; charset=utf-8")
                self.send_header("Content-Length", str(len(data)))
                self.end_headers()
                self.wfile.write(data)

            def _api_key(self, qs) -> Optional[str]:
                supplied = self.headers.get("X-API-Key") or qs.get("token", [None])[0]
                if not supplied:
                    cookie = self.headers.get("Cookie", "")
                    for part in cookie.split(";"):
                        if part.strip().startswith("token="):
                            supplied = part.strip()[len("token="):]
                return supplied

            def _req_ctx(self, qs):
                from csp_gateway_spark.serving.auth import _cookie_dict

                headers = {k: v for k, v in self.headers.items()}
                cookies = _cookie_dict(self.headers.get("Cookie", ""))
                query = {k: v[0] for k, v in qs.items()}
                return headers, cookies, query

            def _check(self, qs):
                headers, cookies, query = self._req_ctx(qs)
                return outer.api.check_request(
                    headers=headers, cookies=cookies, query_params=query
                )

            def _auth_route(self, method: str, rest, qs):
                """Public auth endpoints (login/callback/logout) + userinfo.
                Mirrors the reference's auth routers (simple.py /login,
                oauth.py /login /callback /logout /userinfo)."""
                headers, cookies, query = self._req_ctx(qs)
                host = self.headers.get("Host", "localhost")
                if method == "POST" and rest == ["login"]:
                    length = int(self.headers.get("Content-Length", 0))
                    try:
                        payload = json.loads(self.rfile.read(length) or b"{}")
                    except json.JSONDecodeError as e:
                        raise ApiError(422, f"malformed JSON body: {e}") from e
                    body, cookie = outer.api.auth_login_simple(
                        payload.get("username", ""), payload.get("password", "")
                    )
                    return self._reply(200, body, {"Set-Cookie": cookie})
                if method == "GET" and rest == ["login"]:
                    return self._reply(200, outer.api.auth_login_redirect(host))
                if method == "GET" and rest == ["callback"]:
                    body, cookie = outer.api.auth_callback(
                        query.get("code"), query.get("error"), host
                    )
                    return self._reply(200, body, {"Set-Cookie": cookie})
                if method == "GET" and rest == ["logout"] and outer.api.auth is not None:
                    return self._reply(200, outer.api.auth_logout(cookies))
                if method == "GET" and rest == ["userinfo"]:
                    identity = self._check(qs)
                    return self._reply(200, _jsonable(identity or {}))
                raise ApiError(404, "not found")

            def _maybe_websocket(self) -> bool:
                if self.headers.get("Upgrade", "").lower() != "websocket":
                    return False
                from csp_gateway_spark.serving.ws import accept_key

                self.send_response(101, "Switching Protocols")
                self.send_header("Upgrade", "websocket")
                self.send_header("Connection", "Upgrade")
                self.send_header(
                    "Sec-WebSocket-Accept", accept_key(self.headers["Sec-WebSocket-Key"])
                )
                self.end_headers()
                WsSession(outer.api, self.rfile, self.wfile).run()
                return True

            def _route(self, method: str):
                from urllib.parse import parse_qs, urlparse

                parsed = urlparse(self.path)
                parts = [p for p in parsed.path.split("/") if p]
                qs = parse_qs(parsed.query)
                try:
                    if parsed.path == "/" and method == "GET":
                        return self._reply_html(outer.api.index_html())
                    if parsed.path == "/openapi.json" and method == "GET":
                        self._check(qs)
                        return self._reply(200, outer.api.openapi())
                    if parts[:2] != ["api", "v1"]:
                        raise ApiError(404, "not found")
                    rest = parts[2:]
                    if rest[:1] == ["auth"]:
                        return self._auth_route(method, rest[1:], qs)
                    self._check(qs)
                    if method == "GET" and rest == ["stream"]:
                        if self._maybe_websocket():
                            return None
                        return self._reply(200, outer.api.stream_channels())
                    if method == "GET" and rest[0] == "last" and len(rest) in (2, 3):
                        return self._reply(200, outer.api.last(rest[1], *rest[2:]))
                    if method == "GET" and rest[0] == "state" and len(rest) in (2, 3):
                        q = qs.get("query", [None])[0]
                        lim_s = qs.get("limit", [None])[0]
                        try:
                            lim = int(lim_s) if lim_s is not None else None
                        except ValueError:
                            raise ApiError(422, f"limit must be an integer, got {lim_s!r}")
                        return self._reply(200, outer.api.state(rest[1], q, *rest[2:], limit=lim))
                    if method == "GET" and rest == ["lookup"]:
                        return self._reply(200, outer.api.lookup_channels())
                    if method == "GET" and rest[:2] == ["lookup", "id"] and len(rest) == 3:
                        return self._reply(200, outer.api.lookup_id(rest[2]))
                    if method == "GET" and rest[0] == "lookup" and len(rest) == 3:
                        return self._reply(200, outer.api.lookup(rest[1], rest[2]))
                    if method == "GET" and rest[0] == "next" and len(rest) in (2, 3):
                        t = qs.get("timeout", [None])[0]
                        try:
                            timeout = float(t) if t else 30.0
                        except ValueError:
                            raise ApiError(422, f"timeout must be a number, got {t!r}")
                        return self._reply(200, outer.api.next(rest[1], timeout, *rest[2:]))
                    if method == "POST" and rest[0] == "send" and len(rest) in (2, 3):
                        length = int(self.headers.get("Content-Length", 0))
                        try:
                            payload = json.loads(self.rfile.read(length) or b"null")
                        except json.JSONDecodeError as e:
                            raise ApiError(422, f"malformed JSON body: {e}") from e
                        return self._reply(200, outer.api.send(rest[1], payload, *rest[2:]))
                    if method == "GET" and rest == ["controls", "heartbeat"]:
                        return self._reply(200, outer.api.heartbeat())
                    if method == "GET" and rest == ["controls", "stats"]:
                        return self._reply(200, outer.api.stats())
                    if method == "POST" and rest == ["controls", "shutdown"]:
                        return self._reply(200, outer.api.shutdown())
                    if method == "GET" and rest == ["channels"]:
                        return self._reply(200, outer.api.channels())
                    if method == "GET" and rest[0] == "field" and len(rest) == 2:
                        return self._reply(200, outer.api.field(rest[1]))
                    if method == "GET" and rest == ["perspective", "tables"]:
                        return self._reply(200, outer.api.perspective_tables())
                    if method == "GET" and rest == ["perspective", "meta"]:
                        return self._reply(200, outer.api.perspective_meta())
                    if method == "GET" and rest == ["channels_graph"]:
                        return self._reply(200, outer.api.channels_graph())
                    if method == "GET" and rest[:1] == ["outputs"]:
                        kind, payload = outer.api.outputs_entry("/".join(rest[1:]))
                        if kind == "dir":
                            return self._reply(200, payload)
                        self.send_response(200)
                        self.send_header("Content-Type", "application/octet-stream")
                        self.send_header("Content-Length", str(len(payload)))
                        self.end_headers()
                        self.wfile.write(payload)
                        return None
                    if method == "GET" and rest == ["perspective", "layouts"]:
                        return self._reply(200, outer.api.perspective_layouts())
                    if method == "POST" and rest[:2] == ["perspective", "layouts"] and len(rest) == 3:
                        length = int(self.headers.get("Content-Length", 0))
                        try:
                            payload = json.loads(self.rfile.read(length) or b"null")
                        except json.JSONDecodeError as e:
                            raise ApiError(422, f"malformed JSON body: {e}") from e
                        return self._reply(200, outer.api.perspective_layout_save(rest[2], payload))
                    if method == "DELETE" and rest[:2] == ["perspective", "layouts"] and len(rest) == 3:
                        return self._reply(200, outer.api.perspective_layout_delete(rest[2]))
                    if method == "GET" and rest[:2] == ["perspective", "arrow"] and len(rest) == 3:
                        lim = qs.get("limit", [None])[0]
                        data = outer.api.perspective_arrow(rest[2], int(lim) if lim else None)
                        self.send_response(200)
                        self.send_header("Content-Type", "application/vnd.apache.arrow.stream")
                        self.send_header("Content-Length", str(len(data)))
                        self.end_headers()
                        self.wfile.write(data)
                        return None
                    if method == "POST" and rest[:2] == ["perspective", "view"] and len(rest) == 3:
                        length = int(self.headers.get("Content-Length", 0))
                        try:
                            payload = json.loads(self.rfile.read(length) or b"null")
                        except json.JSONDecodeError as e:
                            raise ApiError(422, f"malformed JSON body: {e}") from e
                        lim = qs.get("limit", [None])[0]
                        return self._reply(
                            200,
                            outer.api.perspective_view_compute(
                                rest[2], payload, int(lim) if lim else None
                            ),
                        )
                    if method == "GET" and rest == ["perspective", "ui"]:
                        return self._reply_html(outer.api.perspective_ui_html())
                    raise ApiError(404, "not found")
                except ApiError as e:
                    return self._reply(e.status, {"detail": e.detail})
                except Exception as e:  # noqa: BLE001
                    return self._reply(500, {"detail": str(e)})

            def do_GET(self):
                self._route("GET")

            def do_POST(self):
                self._route("POST")

            def do_DELETE(self):
                self._route("DELETE")

        self.api = api
        self._server = ThreadingHTTPServer((host, port), Handler)
        self._thread: Optional[threading.Thread] = None

    @property
    def port(self) -> int:
        return self._server.server_address[1]

    def start(self) -> "GatewayHttpServer":
        self.api._http_server = self  # enables POST /controls/shutdown
        self._thread = threading.Thread(target=self._server.serve_forever, daemon=True)
        self._thread.start()
        return self

    def stop(self) -> None:
        self._server.shutdown()
        self._server.server_close()
