"""Physical-plan utilities for the 100 TB design point.

The reference runs in one process and has no planner (SURVEY §4); on
Spark the *engine* work is making sure every operator keeps a plan
that survives 1000 executors:

- joins: broadcast small dims explicitly; salt skewed keys when AQE's
  skew-join can't help (e.g. stream-stream);
- state: partition by state key so streaming aggregation state is
  local; bucket write for co-located re-joins;
- scans: check pushdown reached parquet (``assert_pushdown``).
"""

from __future__ import annotations

from typing import List, Optional, Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def broadcast_dim(df: DataFrame) -> DataFrame:
    """Mark a dimension table for broadcast join (metadata-sized
    tables: region/nation/date dims...)."""
    return F.broadcast(df)


def salt_keys(df: DataFrame, key: str, buckets: int = 16, out_col: str = "_salted_key") -> DataFrame:
    """Skew mitigation for heavy hitters: append a deterministic
    per-row salt (hash of the whole row mod buckets), spreading one hot
    key over ``buckets`` partitions.  Join the salted probe side
    against an exploded (key × salt) build side from explode_salts."""
    salt = F.pmod(F.hash(*[F.col(c) for c in df.columns]), F.lit(buckets))
    return df.withColumn(
        out_col, F.concat_ws("#", F.col(key).cast("string"), salt.cast("string"))
    )


def explode_salts(dim: DataFrame, key: str, buckets: int = 16, out_col: str = "_salted_key") -> DataFrame:
    """Build side of a salted join: replicate each dim row once per
    salt value.  The original key column is dropped (the salted key
    replaces it) so the join result has no ambiguous columns."""
    salts = F.explode(F.sequence(F.lit(0), F.lit(buckets - 1)))
    return (
        dim.withColumn("_salt", salts)
        .withColumn(out_col, F.concat_ws("#", F.col(key).cast("string"), F.col("_salt").cast("string")))
        .drop("_salt", key)
    )


def partition_for_state(df: DataFrame, keys: Sequence[str], partitions: Optional[int] = None) -> DataFrame:
    """Co-locate rows by state key ahead of repeated keyed operations
    (state builds, as-of joins on the same key)."""
    cols = [F.col(k) for k in keys]
    return df.repartition(partitions, *cols) if partitions else df.repartition(*cols)


def write_bucketed(df: DataFrame, path_table: str, keys: Sequence[str], buckets: int = 64, sort_by: Optional[Sequence[str]] = None) -> None:
    """Persist a table bucketed by join/state key: later joins between
    tables bucketed the same way skip the shuffle entirely."""
    writer = df.write.mode("overwrite").bucketBy(buckets, *keys)
    if sort_by:
        writer = writer.sortBy(*sort_by)
    writer.saveAsTable(path_table)


def explain_str(df: DataFrame, mode: str = "formatted") -> str:
    return df._sc._jvm.PythonSQLUtils.explainString(df._jdf.queryExecution(), mode)  # type: ignore[attr-defined]


def assert_pushdown(df: DataFrame, expect_filters: bool = True, expect_columns: Optional[List[str]] = None) -> str:
    """Inspect the formatted plan: verify PushedFilters is non-empty
    and the parquet ReadSchema only contains the expected columns.
    Returns the plan text (for logging); raises AssertionError."""
    import re

    plan = explain_str(df)
    if expect_filters:
        pushed = re.findall(r"PushedFilters: \[([^\]]*)\]", plan)
        if not any(p.strip() for p in pushed):
            raise AssertionError(f"no filters pushed to scan:\n{plan}")
    if expect_columns is not None:
        m = re.search(r"ReadSchema: struct<([^>]*)>", plan)
        if m:
            read_cols = {c.split(":")[0] for c in m.group(1).split(",") if c}
            extra = read_cols - set(expect_columns)
            if extra:
                raise AssertionError(f"scan reads unexpected columns {extra}:\n{plan}")
    return plan
