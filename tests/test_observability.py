"""Vendor observability publishers (observability.py) with stub
transports — mirrors reference `modules/logging/{datadog,opsgenie,
symphony,logfire}.py` behavior without the SDKs."""

import pytest
from pyspark.sql import types as T

from csp_gateway_spark.observability import (
    DatadogPublisher,
    LogfirePublisher,
    MonitoringMetric,
    OpsGeniePublisher,
    SymphonyPublisher,
)
from csp_gateway_spark.sinks import MonitoringEvent

EVENTS_SCHEMA = T.StructType(
    [
        T.StructField("alert_type", T.StringType()),
        T.StructField("title", T.StringType()),
        T.StructField("text", T.StringType()),
        T.StructField("tags", T.ArrayType(T.StringType())),
    ]
)


@pytest.fixture()
def events_df(spark):
    rows = [
        ("ERROR", "disk full", "/var 98%", ["priority:P1", "event_group:infra", "host:a1"]),
        ("EVENT", "rebalance", "ok", ["priority:P4", "event_group:ops", "host:b2"]),
    ]
    return spark.createDataFrame(rows, EVENTS_SCHEMA)


def test_datadog_events_merge_tags(events_df):
    sent = []
    pub = DatadogPublisher(
        event_api=lambda **kw: sent.append(kw),
        metric_api=lambda **kw: None,
        dd_tags={"env": "prod"},
    )
    pub.publish_df(events_df)
    assert len(sent) == 2
    assert sent[0]["alert_type"] == "error"
    assert "env:prod" in sent[0]["tags"] and "host:a1" in sent[0]["tags"]


def test_datadog_metrics(spark):
    sent = []
    pub = DatadogPublisher(event_api=lambda **kw: None, metric_api=lambda **kw: sent.append(kw))
    df = spark.createDataFrame(
        [("latency_ms", 12.5, ["svc:gw"], 1700000000.0)],
        "metric string, value double, tags array<string>, timestamp double",
    )
    pub.metrics_foreach_batch()(df, 0)
    assert sent[0]["metric"] == "latency_ms"
    assert sent[0]["points"] == [(1700000000.0, 12.5)]


def test_datadog_latency_warning(caplog):
    import time as _time

    pub = DatadogPublisher(
        event_api=lambda **kw: _time.sleep(0.02),
        metric_api=lambda **kw: None,
        latency_log_threshold_seconds=0.001,
    )
    with caplog.at_level("WARNING"):
        pub.publish_events([MonitoringEvent(title="x")])
    assert any("longer than expected" in r.message for r in caplog.records)


def test_opsgenie_level_floor_and_alias(events_df):
    sent = []
    pub = OpsGeniePublisher(
        alert_api=lambda **kw: sent.append(kw),
        min_level="P3",
        alias_tags={"infra": ["host"]},
    )
    pub.publish_df(events_df)
    # P4 event is below the floor -> only the P1 alert goes out
    assert len(sent) == 1
    assert sent[0]["priority"] == "P1"
    assert sent[0]["alias"] == "infra:a1"


def test_opsgenie_heartbeat_and_validation():
    beats = []
    pub = OpsGeniePublisher(heartbeat_api=beats.append, heartbeat_name="gw-1")
    pub.send_heartbeat()
    assert beats == ["gw-1"]
    with pytest.raises(ValueError, match="min_level"):
        OpsGeniePublisher(min_level="P9")


def test_symphony_chunked_messages():
    sent = []
    pub = SymphonyPublisher(send=lambda room, msg: sent.append((room, msg)), room_name="r", max_rows=2)
    pub.publish_events([MonitoringEvent(alert_type="EVENT", title=f"t{i}", text="x") for i in range(5)])
    assert len(sent) == 3  # 2 + 2 + 1
    assert sent[0][0] == "r" and "[EVENT] t0: x" in sent[0][1]


def test_logfire_level_mapping():
    sent = []
    pub = LogfirePublisher(sink=lambda level, msg, attrs: sent.append((level, msg, attrs)))
    pub.publish_events(
        [
            MonitoringEvent(alert_type="EVENT", title="a"),
            MonitoringEvent(alert_type="ALERT", title="b", text="boom"),
        ]
    )
    assert sent[0][0] == "info" and sent[1][0] == "error"
    assert sent[1][2]["text"] == "boom"


def test_foreach_batch_never_raises(events_df):
    def explode(**kw):
        raise RuntimeError("api down")

    pub = DatadogPublisher(event_api=explode, metric_api=explode)
    pub.foreach_batch()(events_df, 0)  # must swallow, not raise


def test_metric_model_defaults():
    m = MonitoringMetric(metric="x", value=1.0)
    assert m.tags == [] and m.timestamp is None
