"""Vendor observability publishers (SURVEY §2.1 S11).

Reference mapping:
- Datadog  — `server/modules/logging/datadog.py:89-200` (events +
  metrics channels, dd_tags merge, latency warning threshold)
- OpsGenie — `server/modules/logging/opsgenie.py:43-200` (min alert
  level, alias built from tags, category tag, heartbeat pings)
- Symphony — `server/modules/logging/symphony.py:20-100` (channel ticks
  → chat-room messages)
- Logfire  — `server/modules/logging/logfire.py:368` (span/log
  instrumentation)

None of the vendor SDKs ship in this container, so every publisher
takes an injected transport callable (the SDK call boundary) and
falls back to the stdlib logger when the SDK import fails — same
import-gating contract as the reference's ``check_import`` validators.
Rows flow in through ``foreach_batch()`` (streaming) or
``publish_df()`` (batch); both share the row→event extraction.
"""

from __future__ import annotations

import logging
import time
from typing import Any, Callable, Dict, List, Optional

from pydantic import BaseModel, Field
from pyspark.sql import DataFrame

from csp_gateway_spark.sinks import MonitoringEvent

log = logging.getLogger(__name__)

OPSGENIE_LEVELS = ("P1", "P2", "P3", "P4", "P5")  # P1 most severe


class MonitoringMetric(BaseModel):
    """Reference MonitoringMetric shape (`logging/util.py:167-302`)."""

    metric: str = ""
    value: float = 0.0
    tags: List[str] = Field(default_factory=list)
    timestamp: Optional[float] = None


def _rows_to_events(df: DataFrame) -> List[MonitoringEvent]:
    """Column-name extraction: alert_type/title/text/tags with
    positional fallback (matches monitoring_foreach_batch)."""
    cols = set(df.columns)
    out = []
    for r in df.collect():
        d = r.asDict()
        if {"title", "text"} & cols:
            out.append(
                MonitoringEvent(
                    alert_type=str(d.get("alert_type", "EVENT")),
                    title=str(d.get("title", "")),
                    text=str(d.get("text", "")),
                    tags=[str(t) for t in (d.get("tags") or [])],
                )
            )
        else:
            vals = list(d.values())
            out.append(
                MonitoringEvent(
                    alert_type=str(vals[0]) if vals else "EVENT",
                    title=str(vals[1]) if len(vals) > 1 else "",
                    text=str(vals[2]) if len(vals) > 2 else "",
                )
            )
    return out


def _rows_to_metrics(df: DataFrame) -> List[MonitoringMetric]:
    out = []
    for r in df.collect():
        d = r.asDict()
        out.append(
            MonitoringMetric(
                metric=str(d.get("metric", d.get("name", ""))),
                value=float(d.get("value", 0.0)),
                tags=[str(t) for t in (d.get("tags") or [])],
                timestamp=d.get("timestamp") if isinstance(d.get("timestamp"), (int, float)) else None,
            )
        )
    return out


class _BasePublisher:
    def publish_events(self, events: List[MonitoringEvent]) -> None:  # pragma: no cover
        raise NotImplementedError

    def publish_df(self, df: DataFrame) -> None:
        self.publish_events(_rows_to_events(df))

    def foreach_batch(self) -> Callable:
        def _sink(batch_df: DataFrame, batch_id: int) -> None:
            try:
                self.publish_df(batch_df)
            except Exception as e:  # noqa: BLE001 — sink errors never kill the stream
                log.error("observability publish failed: %s", e, exc_info=True)

        return _sink


class DatadogPublisher(_BasePublisher):
    """Events + metrics to Datadog (`datadog.py:89-200`).

    ``event_api``/``metric_api`` default to the datadog SDK
    (``api.Event.create`` / ``api.Metric.send``) when importable, else
    a logging fallback.  ``dd_tags`` merge into every submission;
    submissions slower than ``latency_log_threshold_seconds`` log a
    warning (same telemetry-about-telemetry as the reference).
    """

    def __init__(
        self,
        event_api: Optional[Callable[..., Any]] = None,
        metric_api: Optional[Callable[..., Any]] = None,
        dd_tags: Optional[Dict[str, str]] = None,
        latency_log_threshold_seconds: float = 30.0,
    ):
        if event_api is None or metric_api is None:
            try:
                from datadog import api  # type: ignore[import-not-found]

                event_api = event_api or api.Event.create
                metric_api = metric_api or api.Metric.send
            except ImportError:
                event_api = event_api or (lambda **kw: log.info("datadog event: %s", kw))
                metric_api = metric_api or (lambda **kw: log.info("datadog metric: %s", kw))
        self.event_api = event_api
        self.metric_api = metric_api
        self.dd_tags = [f"{k}:{v}" for k, v in (dd_tags or {}).items()]
        self.latency_log_threshold_seconds = latency_log_threshold_seconds

    def _timed(self, fn: Callable[..., Any], **body: Any) -> Any:
        start = time.monotonic()
        try:
            return fn(**body)
        finally:
            elapsed = time.monotonic() - start
            if elapsed > self.latency_log_threshold_seconds:
                log.warning(
                    "Sending data to datadog took %.1f seconds, longer than expected (%.1f)",
                    elapsed,
                    self.latency_log_threshold_seconds,
                )

    def publish_events(self, events: List[MonitoringEvent]) -> None:
        for ev in events:
            self._timed(
                self.event_api,
                alert_type=ev.alert_type.lower(),
                title=ev.title,
                text=ev.text,
                tags=sorted(set(ev.tags) | set(self.dd_tags)),
            )

    def publish_metrics(self, metrics: List[MonitoringMetric]) -> None:
        for m in metrics:
            self._timed(
                self.metric_api,
                metric=m.metric,
                points=[(m.timestamp or time.time(), m.value)],
                tags=sorted(set(m.tags) | set(self.dd_tags)),
            )

    def metrics_foreach_batch(self) -> Callable:
        def _sink(batch_df: DataFrame, batch_id: int) -> None:
            try:
                self.publish_metrics(_rows_to_metrics(batch_df))
            except Exception as e:  # noqa: BLE001
                log.error("datadog metric publish failed: %s", e, exc_info=True)

        return _sink


class OpsGeniePublisher(_BasePublisher):
    """Alerts + heartbeats to OpsGenie (`opsgenie.py:43-200`).

    Events below ``min_level`` are dropped; the alert alias is built
    from ``alias_tags[category]`` joined with ``alias_separator`` so
    OpsGenie aggregates recurrences of the same logical alert; the
    category comes from the ``category_tag``-prefixed tag.
    """

    def __init__(
        self,
        alert_api: Optional[Callable[..., Any]] = None,
        heartbeat_api: Optional[Callable[..., Any]] = None,
        min_level: str = "P3",
        tags: Optional[Dict[str, str]] = None,
        alias_tags: Optional[Dict[str, List[str]]] = None,
        alias_separator: str = ":",
        category_tag: str = "event_group",
        heartbeat_name: str = "gateway",
    ):
        if min_level not in OPSGENIE_LEVELS:
            raise ValueError(f"min_level must be one of {OPSGENIE_LEVELS}")
        self.alert_api = alert_api or (lambda **kw: log.info("opsgenie alert: %s", kw))
        self.heartbeat_api = heartbeat_api or (lambda name: log.info("opsgenie heartbeat: %s", name))
        self.min_level = min_level
        self.extra_tags = tags or {}
        self.alias_tags = alias_tags or {}
        self.alias_separator = alias_separator
        self.category_tag = category_tag
        self.heartbeat_name = heartbeat_name

    @staticmethod
    def _level(ev: MonitoringEvent) -> str:
        for tag in ev.tags:
            if tag.startswith("priority:") and tag[9:] in OPSGENIE_LEVELS:
                return tag[9:]
        return "P5"

    def _category(self, ev: MonitoringEvent) -> Optional[str]:
        prefix = f"{self.category_tag}:"
        for tag in ev.tags:
            if tag.startswith(prefix):
                return tag[len(prefix):]
        return None

    def _alias(self, ev: MonitoringEvent) -> str:
        category = self._category(ev) or ev.title
        fields = self.alias_tags.get(category, [])
        tag_map = dict(t.split(":", 1) for t in ev.tags if ":" in t)
        parts = [category] + [tag_map.get(f, "") for f in fields]
        return self.alias_separator.join(parts)

    def publish_events(self, events: List[MonitoringEvent]) -> None:
        floor = OPSGENIE_LEVELS.index(self.min_level)
        for ev in events:
            level = self._level(ev)
            if OPSGENIE_LEVELS.index(level) > floor:
                continue  # less severe than the floor → dropped
            self.alert_api(
                message=ev.title,
                description=ev.text,
                priority=level,
                alias=self._alias(ev),
                tags=sorted(set(ev.tags) | {f"{k}:{v}" for k, v in self.extra_tags.items()}),
            )

    def send_heartbeat(self) -> None:
        self.heartbeat_api(self.heartbeat_name)


class SymphonyPublisher(_BasePublisher):
    """Channel ticks → chat-room messages (`symphony.py:20-100`).
    ``send`` is the adapter boundary (room, message-text); rows render
    as a fenced table, ``max_rows`` per message."""

    def __init__(
        self,
        send: Optional[Callable[[str, str], Any]] = None,
        room_name: str = "alerts",
        max_rows: int = 20,
    ):
        self.send = send or (lambda room, msg: log.info("symphony[%s]: %s", room, msg))
        self.room_name = room_name
        self.max_rows = max_rows

    def publish_events(self, events: List[MonitoringEvent]) -> None:
        for chunk_start in range(0, len(events), self.max_rows):
            chunk = events[chunk_start : chunk_start + self.max_rows]
            lines = [f"[{ev.alert_type}] {ev.title}: {ev.text}" for ev in chunk]
            self.send(self.room_name, "\n".join(lines))


class LogfirePublisher(_BasePublisher):
    """Structured log/span emission (`logfire.py:368`): uses the
    logfire SDK when importable, stdlib logging otherwise — the levels
    map EVENT→info, WARNING→warn, ERROR/ALERT→error."""

    _LEVELS = {"EVENT": "info", "WARNING": "warn", "ERROR": "error", "ALERT": "error"}

    def __init__(self, sink: Optional[Callable[[str, str, Dict[str, Any]], Any]] = None):
        if sink is None:
            try:
                import logfire  # type: ignore[import-not-found]

                def sink(level: str, msg: str, attrs: Dict[str, Any]) -> None:
                    getattr(logfire, level, logfire.info)(msg, **attrs)

            except ImportError:

                def sink(level: str, msg: str, attrs: Dict[str, Any]) -> None:
                    getattr(log, "warning" if level == "warn" else level, log.info)(
                        "%s %s", msg, attrs
                    )

        self.sink = sink

    def publish_events(self, events: List[MonitoringEvent]) -> None:
        for ev in events:
            level = self._LEVELS.get(ev.alert_type.upper(), "info")
            self.sink(level, ev.title, {"text": ev.text, "tags": ev.tags})
