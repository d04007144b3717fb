"""Perspective-style server views: the reference's only aggregation language.

Reference: a view over a table is configured with ``group_by, split_by,
aggregates, columns, sort, filter, expressions``
(`modules/web/perspective.py:133-142` ViewConfig, validation `:290-299`,
creation `:384-387`; demo `server/demo/omnibus.py:314-319`).

Spark mapping is 1:1: ``groupBy(group_by).pivot(split_by).agg(...)``
with ``selectExpr`` for expressions and ``orderBy`` for sort.  The agg
vocabulary covers Perspective's aggregate names (sum/avg/count/median/
min/max/…) via native functions — median maps to ``percentile`` (exact)
with ``percentile_approx`` available for the 100 TB path.

Scale: groupBy+pivot is a single shuffle on group_by; pivot values are
resolved either from config (no extra job) or by a distinct scan.
Always pass ``split_values`` in production so Spark skips the distinct
pass and the pivot width is bounded.
"""

from __future__ import annotations

from typing import Dict, List, Optional, Sequence, Tuple, Union

from pydantic import BaseModel
from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

# Perspective aggregate name -> Column builder
_AGGS = {
    "sum": F.sum,
    "avg": F.avg,
    "mean": F.avg,
    "count": F.count,
    "distinct count": F.count_distinct,
    "min": F.min,
    "max": F.max,
    "median": lambda c: F.percentile(c, F.lit(0.5)),
    "stddev": F.stddev,
    "var": F.variance,
    "first": F.first,
    "last": F.last,
    "any": F.first,
    "unique": F.count_distinct,
    "sum abs": lambda c: F.sum(F.abs(c)),
    "abs sum": lambda c: F.sum(F.abs(c)),
    "high": F.max,
    "low": F.min,
}


class ViewConfig(BaseModel):
    """Mirrors the reference ViewConfig (`perspective.py:133-142`)."""

    group_by: List[str] = []
    split_by: List[str] = []
    aggregates: Dict[str, str] = {}  # column -> aggregate name
    columns: Optional[List[str]] = None
    sort: List[Tuple[str, str]] = []  # (column, "asc"|"desc")
    filter: List[Tuple[str, str, object]] = []  # (column, op, value)
    expressions: Dict[str, str] = {}  # new column -> SQL expression


def _agg_columns(aggregates: Dict[str, str]) -> List[Column]:
    cols = []
    for column, name in aggregates.items():
        fn = _AGGS.get(name.lower())
        if fn is None:
            raise ValueError(f"unsupported aggregate {name!r}; one of {sorted(_AGGS)}")
        cols.append(fn(F.col(column)).alias(f"{name.lower().replace(' ', '_')}_{column}"))
    return cols


def perspective_view(
    df: DataFrame,
    config: ViewConfig,
    split_values: Optional[Sequence[str]] = None,
) -> DataFrame:
    """Materialize a ViewConfig over a DataFrame."""
    out = df
    # expressions first (Perspective computes expression columns pre-agg)
    for name, expr in config.expressions.items():
        out = out.withColumn(name, F.expr(expr))
    # filter
    from csp_gateway_spark.query import Filter, Query, apply_query

    if config.filter:
        q = Query(filters=[Filter(attr=a, op=op, value=v) for a, op, v in config.filter])
        out = apply_query(out, q)
    # aggregate
    if config.group_by or config.aggregates:
        grouped = out.groupBy(*[F.col(g) for g in config.group_by])
        if config.split_by:
            pivot_col = (
                config.split_by[0]
                if len(config.split_by) == 1
                else "_split_key"
            )
            if pivot_col == "_split_key":
                out = out.withColumn(
                    "_split_key", F.concat_ws("/", *[F.col(s).cast("string") for s in config.split_by])
                )
                grouped = out.groupBy(*[F.col(g) for g in config.group_by])
            grouped = (
                grouped.pivot(pivot_col, list(split_values))
                if split_values is not None
                else grouped.pivot(pivot_col)
            )
        out = grouped.agg(*_agg_columns(config.aggregates))
    # column projection
    if config.columns:
        out = out.select(*config.columns)
    # sort
    if config.sort:
        order = [F.asc(c) if d.lower() == "asc" else F.desc(c) for c, d in config.sort]
        out = out.orderBy(*order)
    return out
