"""Python client for the REST surface (reference `client/client.py`:
sync+async clients generated from OpenAPI with raw/pandas/polars/struct
return types, `client.py:397-1150`).

This client is dependency-light (stdlib urllib; httpx used when
present) and returns raw dicts, pandas DataFrames, or Spark DataFrames.
"""

from __future__ import annotations

import json
import urllib.parse
import urllib.request
from typing import Any, Dict, List, Optional

from csp_gateway_spark.query import Filter, Query


class GatewayClient:
    """Sync client: ``last/state/send/lookup/next/heartbeat/stats``."""

    def __init__(self, base_url: str, timeout: float = 30.0, return_type: str = "raw"):
        self.base_url = base_url.rstrip("/")
        self.timeout = timeout
        if return_type not in ("raw", "pandas", "spark"):
            raise ValueError("return_type must be raw|pandas|spark")
        self.return_type = return_type

    # --- transport ---------------------------------------------------
    def _get(self, path: str, params: Optional[Dict[str, str]] = None) -> Any:
        url = f"{self.base_url}{path}"
        if params:
            url += "?" + urllib.parse.urlencode(params)
        with urllib.request.urlopen(url, timeout=self.timeout) as r:
            return json.loads(r.read())

    def _post(self, path: str, payload: Any) -> Any:
        req = urllib.request.Request(
            f"{self.base_url}{path}",
            data=json.dumps(payload).encode(),
            headers={"Content-Type": "application/json"},
            method="POST",
        )
        with urllib.request.urlopen(req, timeout=self.timeout) as r:
            return json.loads(r.read())

    def _wrap(self, rows: List[dict]) -> Any:
        if self.return_type == "pandas":
            import pandas as pd

            return pd.DataFrame(rows)
        if self.return_type == "spark":
            from csp_gateway_spark.session import get_spark

            return get_spark().createDataFrame(rows) if rows else None
        return rows

    @staticmethod
    def _k(path: str, key: Optional[str]) -> str:
        return f"{path}/{key}" if key is not None else path

    # --- api ---------------------------------------------------------
    def last(self, channel: str, key: Optional[str] = None) -> Any:
        return self._wrap(self._get(self._k(f"/api/v1/last/{channel}", key)))

    def state(
        self, channel: str, query: Optional[Query] = None, key: Optional[str] = None, **filter_kwargs
    ) -> Any:
        params = None
        if query is None and filter_kwargs:
            query = Query(
                filters=[Filter(attr=k, op="==", value=v) for k, v in filter_kwargs.items()]
            )
        if query is not None:
            params = {"query": query.model_dump_json(exclude_none=True)}
        return self._wrap(self._get(self._k(f"/api/v1/state/{channel}", key), params))

    def send(self, channel: str, payload: Any, key: Optional[str] = None) -> Any:
        return self._wrap(self._post(self._k(f"/api/v1/send/{channel}", key), payload))

    def lookup(self, channel: str, record_id: str) -> Any:
        return self._wrap(self._get(f"/api/v1/lookup/{channel}/{record_id}"))

    def next(self, channel: str, timeout: Optional[float] = None, key: Optional[str] = None) -> Any:
        params = {"timeout": str(timeout)} if timeout is not None else None
        return self._wrap(self._get(self._k(f"/api/v1/next/{channel}", key), params))

    def heartbeat(self) -> dict:
        return self._get("/api/v1/controls/heartbeat")

    def stats(self) -> dict:
        return self._get("/api/v1/controls/stats")

    def channels(self) -> List[str]:
        return self._get("/api/v1/channels")

    def stream(self, channels: List[str], key: Optional[str] = None):
        """Open `WS /api/v1/stream` subscribed to ``channels``; returns
        the WebSocketClient — iterate ``.messages()`` for
        ``{"channel": c, "data": row}`` ticks (reference
        `client.py:subscribe` + `client/csp_stream.py:35-100`)."""
        from csp_gateway_spark.serving.ws import WebSocketClient

        ws = WebSocketClient(
            self.base_url.replace("http://", "ws://") + "/api/v1/stream",
            timeout=self.timeout,
        )
        for channel in channels:
            msg = {"action": "subscribe", "channel": channel}
            if key is not None:
                msg["key"] = key
            ws.send_json(msg)
        return ws
