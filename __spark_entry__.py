"""Driver contract for the spark-graft builder (PySpark target).

``queries()`` maps operator names (SURVEY.md §2) to callables
``(spark, sf_dir) -> DataFrame``; ``oracle_sql()`` gives the DuckDB
oracle for each.  Column names are aliased identically on both sides.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from csp_gateway_spark.session import load_tables
from csp_gateway_spark.operators.state import keyed_last
from csp_gateway_spark.query import Filter, Query, apply_query


def _t(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    import os

    return spark.read.parquet(os.path.join(sf_dir, f"{name}.parquet"))


# ---------------------------------------------------------------------------
# A1/A2/A3 — keyed last-value state (state.py:165-225, 228-490)
# ---------------------------------------------------------------------------

def q_state_keyed_last(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = _t(spark, sf_dir, "events")
    out = keyed_last(ev, ["user_id"], order_by=["ts", "event_id"])
    return out.select(
        "user_id",
        "event_id",
        "event_type",
        F.col("value").cast("decimal(18,2)").alias("value"),
    )


ORACLE_STATE_KEYED_LAST = """
SELECT user_id, event_id, event_type, CAST(value AS DECIMAL(18,2)) AS value
FROM (
  SELECT *, row_number() OVER (PARTITION BY user_id ORDER BY ts DESC, event_id DESC) AS rn
  FROM events
) WHERE rn = 1
ORDER BY user_id ASC NULLS FIRST
"""


# ---------------------------------------------------------------------------
# P1-P3 — Filter/Query compilation on state (filter.py:16-66, state.py:339-376)
# ---------------------------------------------------------------------------

def q_state_filter_query(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = _t(spark, sf_dir, "events")
    state = keyed_last(ev, ["user_id"], order_by=["ts", "event_id"])
    q = Query(
        filters=[
            Filter(attr="value", op=">=", value=30.0),
            Filter(attr="value", op="<", value=150.0),
            Filter(attr="event_type", op="!=", value="error"),
        ]
    )
    out = apply_query(state, q)
    return out.select(
        "user_id",
        "event_id",
        "event_type",
        F.col("value").cast("decimal(18,2)").alias("value"),
    )


ORACLE_STATE_FILTER_QUERY = """
SELECT user_id, event_id, event_type, CAST(value AS DECIMAL(18,2)) AS value
FROM (
  SELECT *, row_number() OVER (PARTITION BY user_id ORDER BY ts DESC, event_id DESC) AS rn
  FROM events
) WHERE rn = 1 AND value >= 30.0 AND value < 150.0 AND event_type != 'error'
ORDER BY user_id ASC NULLS FIRST
"""


# ---------------------------------------------------------------------------
# driver hooks
# ---------------------------------------------------------------------------

def entry(spark: SparkSession) -> DataFrame:
    """Flagship: keyed-last state + filter query on sf0.001."""
    return q_state_filter_query(spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return {
        "state_keyed_last": q_state_keyed_last,
        "state_filter_query": q_state_filter_query,
    }


def oracle_sql() -> dict[str, str]:
    return {
        "state_keyed_last": ORACLE_STATE_KEYED_LAST,
        "state_filter_query": ORACLE_STATE_FILTER_QUERY,
    }
