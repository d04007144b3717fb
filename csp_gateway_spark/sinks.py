"""Sinks: SQL/JDBC, console/log, graph-output capture, monitoring.

Reference mapping (SURVEY §2.1):
- S8  PublishSQLA (`modules/sql.py:61-185`): per-tick INSERT with field
  selection/renames/constant augmentation → here a projection +
  ``foreachBatch`` JDBC write (bulk, not per-row — the reference
  itself warns row-by-row is slow).
- S9  AddChannelsToGraphOutput (`modules/io/graph_output.py:14-27`).
- S11 Print/LogChannels (`modules/logging/stdlib.py:366`,
  `printing.py:9-21`) + monitoring publishers — foreachBatch hooks.
"""

from __future__ import annotations

import logging
from typing import Callable, Dict, List, Optional

from pydantic import BaseModel, ConfigDict
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

log = logging.getLogger(__name__)


def project_for_sink(
    df: DataFrame,
    fields: Optional[List[str]] = None,
    renames: Optional[Dict[str, str]] = None,
    constants: Optional[Dict[str, object]] = None,
) -> DataFrame:
    """Field selection, renames, constant augmentation
    (`modules/sql.py:141-164`)."""
    out = df.select(*fields) if fields else df
    for old, new in (renames or {}).items():
        out = out.withColumnRenamed(old, new)
    for name, value in (constants or {}).items():
        out = out.withColumn(name, F.lit(value))
    return out


def write_jdbc(
    df: DataFrame,
    url: str,
    table: str,
    mode: str = "append",
    properties: Optional[Dict[str, str]] = None,
    **project_kwargs,
) -> None:
    """Batch JDBC write (streaming path wraps this in foreachBatch).
    Requires the target driver jar on the classpath."""
    project_for_sink(df, **project_kwargs).write.jdbc(
        url, table, mode=mode, properties=properties or {}
    )


def jdbc_foreach_batch(url: str, table: str, properties: Optional[Dict[str, str]] = None, **project_kwargs) -> Callable:
    """foreachBatch hook for writeStream (retry left to Spark's
    micro-batch replay semantics — at-least-once like the reference's
    retry loop, `sql.py:165-185`)."""

    def _write(batch_df: DataFrame, batch_id: int) -> None:
        write_jdbc(batch_df, url, table, properties=properties, **project_kwargs)

    return _write


def graph_output(channels: Dict[str, DataFrame], selection: Optional[List[str]] = None) -> Dict[str, list]:
    """Copy selected channels into the run's return value
    (`graph_output.py:14-27`) — batch collect per channel."""
    names = selection or list(channels)
    return {name: channels[name].collect() for name in names}


def print_channels(channels: Dict[str, DataFrame], n: int = 20) -> None:
    """PrintChannels (`printing.py:9-21`) — console sink."""
    for name, df in channels.items():
        print(f"== {name}")
        df.show(n, truncate=False)


def log_channels(channels: Dict[str, DataFrame], logger: Optional[logging.Logger] = None, n: int = 100) -> None:
    """LogChannels (`stdlib.py:366`)."""
    logger = logger or log
    for name, df in channels.items():
        for row in df.limit(n).collect():
            logger.info("%s: %s", name, row.asDict())


class MonitoringEvent(BaseModel):
    """Shape of the reference's MonitoringEvent struct
    (`modules/logging/util.py:167-302`)."""

    alert_type: str = "EVENT"
    title: str = ""
    text: str = ""
    tags: List[str] = []


def monitoring_foreach_batch(publish: Callable[[List[MonitoringEvent]], None]) -> Callable:
    """Adapter for Datadog/OpsGenie/Symphony-style publishers (S11):
    the HTTP client is injected; rows become MonitoringEvents.  No
    network dependency here — external publishers plug in."""

    def _publish(batch_df: DataFrame, batch_id: int) -> None:
        events = [
            MonitoringEvent(
                alert_type=str(r[0]) if len(r) > 0 else "EVENT",
                title=str(r[1]) if len(r) > 1 else "",
                text=str(r[2]) if len(r) > 2 else "",
            )
            for r in batch_df.collect()
        ]
        publish(events)

    return _publish
