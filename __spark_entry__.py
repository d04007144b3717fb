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
# A5 — Perspective server view: group_by + aggregates + sort + filter
# (perspective.py:133-142, 384-387)
# ---------------------------------------------------------------------------

def q_perspective_view(spark: SparkSession, sf_dir: str) -> DataFrame:
    from csp_gateway_spark.operators.pivot import ViewConfig, perspective_view

    li = _t(spark, sf_dir, "lineitem")
    cfg = ViewConfig(
        group_by=["l_returnflag", "l_linestatus"],
        aggregates={
            "qty_dec": "sum",
            "price_dec": "sum",
            "l_orderkey": "count",
            "l_quantity": "median",
        },
        expressions={
            "qty_dec": "CAST(l_quantity AS DECIMAL(18,2))",
            "price_dec": "CAST(l_extendedprice AS DECIMAL(18,2))",
        },
        filter=[("l_quantity", "<=", 45.0)],
        sort=[("l_returnflag", "asc"), ("l_linestatus", "asc")],
    )
    out = perspective_view(li, cfg)
    return out.select(
        "l_returnflag",
        "l_linestatus",
        F.col("sum_qty_dec").alias("sum_qty"),
        F.col("sum_price_dec").alias("sum_price"),
        F.col("count_l_orderkey").alias("n"),
        F.col("median_l_quantity").cast("double").alias("median_qty"),
    )


ORACLE_PERSPECTIVE_VIEW = """
SELECT l_returnflag, l_linestatus,
       SUM(CAST(l_quantity AS DECIMAL(18,2))) AS sum_qty,
       SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS sum_price,
       COUNT(l_orderkey) AS n,
       CAST(median(l_quantity) AS DOUBLE) AS median_qty
FROM lineitem
WHERE l_quantity <= 45.0
GROUP BY l_returnflag, l_linestatus
ORDER BY l_returnflag, l_linestatus
"""


# ---------------------------------------------------------------------------
# A5 — pivot (split_by): groupBy().pivot().agg() (perspective.py:133-142)
# ---------------------------------------------------------------------------

def q_perspective_pivot(spark: SparkSession, sf_dir: str) -> DataFrame:
    from csp_gateway_spark.operators.pivot import ViewConfig, perspective_view

    li = _t(spark, sf_dir, "lineitem")
    cfg = ViewConfig(
        group_by=["l_returnflag"],
        split_by=["l_linestatus"],
        aggregates={"qty_dec": "sum"},
        expressions={"qty_dec": "CAST(l_quantity AS DECIMAL(18,2))"},
    )
    out = perspective_view(li, cfg, split_values=["F", "O"])
    return out.select(
        "l_returnflag",
        F.col("F").alias("qty_F"),
        F.col("O").alias("qty_O"),
    ).orderBy("l_returnflag")


ORACLE_PERSPECTIVE_PIVOT = """
SELECT l_returnflag,
       SUM(CAST(l_quantity AS DECIMAL(18,2))) FILTER (WHERE l_linestatus = 'F') AS qty_F,
       SUM(CAST(l_quantity AS DECIMAL(18,2))) FILTER (WHERE l_linestatus = 'O') AS qty_O
FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag
"""


# ---------------------------------------------------------------------------
# A6 — Perspective table index/limit (upsert + ring buffer)
# (perspective.py:468-475)
# ---------------------------------------------------------------------------

def q_table_index_limit(spark: SparkSession, sf_dir: str) -> DataFrame:
    from csp_gateway_spark.operators.state import upsert_table

    orders = _t(spark, sf_dir, "orders")
    out = upsert_table(
        orders, index=["o_custkey"], order_by=["o_orderdate", "o_orderkey"], limit=100
    )
    return out.select("o_custkey", "o_orderkey", "o_orderstatus")


ORACLE_TABLE_INDEX_LIMIT = """
WITH last_per_key AS (
  SELECT * FROM (
    SELECT *, row_number() OVER (PARTITION BY o_custkey ORDER BY o_orderdate DESC, o_orderkey DESC) AS rn
    FROM orders
  ) WHERE rn = 1
)
SELECT o_custkey, o_orderkey, o_orderstatus FROM (
  SELECT *, row_number() OVER (ORDER BY o_orderdate DESC, o_orderkey DESC) AS rk
  FROM last_per_key
) WHERE rk <= 100
"""


# ---------------------------------------------------------------------------
# W — tumbling event-time window (windows.py; additive per SURVEY §7.8)
# ---------------------------------------------------------------------------

def q_window_tumbling(spark: SparkSession, sf_dir: str) -> DataFrame:
    from csp_gateway_spark.operators.windows import tumbling

    ev = _t(spark, sf_dir, "events")
    return tumbling(
        ev,
        "ts",
        3600,
        keys=["event_type"],
        aggs=[
            F.count(F.lit(1)).alias("n"),
            F.sum(F.col("value").cast("decimal(18,2)")).alias("sum_value"),
        ],
    ).orderBy("bucket_start", "event_type")


ORACLE_WINDOW_TUMBLING = """
SELECT (epoch_ns(ts) // 3600000000000) * 3600 AS bucket_start, event_type,
       COUNT(*) AS n, SUM(CAST(value AS DECIMAL(18,2))) AS sum_value
FROM events GROUP BY 1, 2 ORDER BY 1, 2
"""


# ---------------------------------------------------------------------------
# W — session window (gaps-and-islands; windows.py::sessionize)
# ---------------------------------------------------------------------------

def q_window_session(spark: SparkSession, sf_dir: str) -> DataFrame:
    from csp_gateway_spark.operators.windows import sessionize

    # DuckDB reads ns-parquet as microsecond TIMESTAMP, so sessions are
    # computed on µs time in both engines.
    ev = _t(spark, sf_dir, "events").withColumn("ts_us", F.expr("ts div 1000"))
    out = sessionize(ev, "ts_us", 1800 * 1_000_000, keys=["user_id"])
    return out.select("user_id", "session_start", "n").orderBy("user_id", "session_start")


ORACLE_WINDOW_SESSION = """
WITH t AS (
  SELECT user_id, epoch_us(ts) AS tns,
         CASE WHEN lag(epoch_us(ts)) OVER (PARTITION BY user_id ORDER BY epoch_us(ts)) IS NULL
                OR epoch_us(ts) - lag(epoch_us(ts)) OVER (PARTITION BY user_id ORDER BY epoch_us(ts)) > 1800000000
              THEN 1 ELSE 0 END AS new_s
  FROM events
), s AS (
  SELECT user_id, tns,
         SUM(new_s) OVER (PARTITION BY user_id ORDER BY tns ROWS UNBOUNDED PRECEDING) AS sid
  FROM t
)
SELECT user_id, MIN(tns) AS session_start, COUNT(*) AS n
FROM s GROUP BY user_id, sid ORDER BY user_id, session_start
"""


# ---------------------------------------------------------------------------
# J — as-of join (union+window single-shuffle plan; joins.py::asof_join)
# ---------------------------------------------------------------------------

def q_asof_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    from csp_gateway_spark.operators.joins import asof_join

    ev = _t(spark, sf_dir, "events")
    purchases = ev.filter(F.col("event_type") == "purchase")
    views = ev.filter(F.col("event_type") == "view")
    out = asof_join(
        purchases,
        views,
        on=["user_id"],
        left_time="ts",
        right_time="ts",
        right_cols=["event_id"],
    )
    return out.select(
        "user_id",
        "event_id",
        F.col("event_id_right").alias("view_event_id"),
    ).orderBy("event_id")


ORACLE_ASOF_JOIN = """
SELECT p.user_id, p.event_id, v.event_id AS view_event_id
FROM (SELECT * FROM events WHERE event_type = 'purchase') p
ASOF LEFT JOIN (SELECT * FROM events WHERE event_type = 'view') v
  ON p.user_id = v.user_id AND v.ts <= p.ts
ORDER BY p.event_id
"""


# ---------------------------------------------------------------------------
# J — interval join (click -> purchase within 10 min; joins.py)
# ---------------------------------------------------------------------------

def q_interval_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    from csp_gateway_spark.operators.joins import interval_join

    ev = _t(spark, sf_dir, "events")
    clicks = ev.filter(F.col("event_type") == "click").select("user_id", "event_id", "ts")
    purchases = ev.filter(F.col("event_type") == "purchase").select("user_id", "event_id", "ts")
    out = interval_join(
        clicks, purchases, on=["user_id"], left_time="ts", right_time="ts",
        lower=0, upper=600 * 1_000_000_000,
    )
    return out.select(
        "user_id",
        F.col("event_id").alias("click_id"),
        F.col("event_id_right").alias("purchase_id"),
    )


ORACLE_INTERVAL_JOIN = """
SELECT c.user_id, c.event_id AS click_id, p.event_id AS purchase_id
FROM (SELECT * FROM events WHERE event_type = 'click') c
JOIN (SELECT * FROM events WHERE event_type = 'purchase') p
  ON c.user_id = p.user_id
 AND epoch_ns(p.ts) >= epoch_ns(c.ts)
 AND epoch_ns(p.ts) <= epoch_ns(c.ts) + 600000000000
"""


# ---------------------------------------------------------------------------
# J1/P6 — union-of-setters / merge (channels.py:439-472)
# ---------------------------------------------------------------------------

def q_union_merge(spark: SparkSession, sf_dir: str) -> DataFrame:
    from csp_gateway_spark.operators.joins import merge

    ev = _t(spark, sf_dir, "events")
    a = ev.filter(F.col("event_type") == "purchase").select("event_id", "event_type", "user_id")
    b = ev.filter(F.col("event_type") == "error").select("event_id", "event_type", "user_id")
    return merge(a, b)


ORACLE_UNION_MERGE = """
SELECT event_id, event_type, user_id FROM events WHERE event_type = 'purchase'
UNION ALL
SELECT event_id, event_type, user_id FROM events WHERE event_type = 'error'
"""


# ---------------------------------------------------------------------------
# J4 — id point lookup (web/routes/lookup.py:29-85)
# ---------------------------------------------------------------------------

def q_lookup_by_id(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = _t(spark, sf_dir, "events")
    return ev.filter(F.col("event_id") == 1234).select(
        "event_id",
        F.expr("ts div 1000").alias("ts_us"),
        "user_id",
        "event_type",
        F.col("value").cast("decimal(18,2)").alias("value"),
        "props",
    )


ORACLE_LOOKUP_BY_ID = """
SELECT event_id, epoch_us(ts) AS ts_us, user_id, event_type,
       CAST(value AS DECIMAL(18,2)) AS value, props
FROM events WHERE event_id = 1234
"""


# ---------------------------------------------------------------------------
# P10 — flatten/explode with ordinality (psp.py:33-112)
# ---------------------------------------------------------------------------

def q_explode_embeddings(spark: SparkSession, sf_dir: str) -> DataFrame:
    from csp_gateway_spark.operators.flatten import explode_lists

    emb = _t(spark, sf_dir, "embeddings").select("vec_id", "embedding")
    out = explode_lists(emb, with_position=True)
    return out.select(
        "vec_id",
        (F.col("embedding_pos") + 1).alias("pos"),
        F.col("embedding").cast("double").alias("emb"),
    ).filter(F.col("vec_id") < 10)


ORACLE_EXPLODE_EMBEDDINGS = """
SELECT vec_id, generate_subscripts(embedding, 1) AS pos,
       CAST(unnest(embedding) AS DOUBLE) AS emb
FROM embeddings WHERE vec_id < 10
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
        "perspective_view": q_perspective_view,
        "perspective_pivot": q_perspective_pivot,
        "table_index_limit": q_table_index_limit,
        "window_tumbling": q_window_tumbling,
        "window_session": q_window_session,
        "asof_join": q_asof_join,
        "interval_join": q_interval_join,
        "union_merge": q_union_merge,
        "lookup_by_id": q_lookup_by_id,
        "explode_embeddings": q_explode_embeddings,
    }


def oracle_sql() -> dict[str, str]:
    return {
        "state_keyed_last": ORACLE_STATE_KEYED_LAST,
        "state_filter_query": ORACLE_STATE_FILTER_QUERY,
        "perspective_view": ORACLE_PERSPECTIVE_VIEW,
        "perspective_pivot": ORACLE_PERSPECTIVE_PIVOT,
        "table_index_limit": ORACLE_TABLE_INDEX_LIMIT,
        "window_tumbling": ORACLE_WINDOW_TUMBLING,
        "window_session": ORACLE_WINDOW_SESSION,
        "asof_join": ORACLE_ASOF_JOIN,
        "interval_join": ORACLE_INTERVAL_JOIN,
        "union_merge": ORACLE_UNION_MERGE,
        "lookup_by_id": ORACLE_LOOKUP_BY_ID,
        "explode_embeddings": ORACLE_EXPLODE_EMBEDDINGS,
    }
