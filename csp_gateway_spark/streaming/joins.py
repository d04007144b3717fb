"""Stream-stream joins and streaming dedup (SURVEY §2.4 J2 / §2.5 W4).

The reference's channel merges are unions, but its docs call out joins
as the user-composable next step ("One could also do joins or any
other custom combination", ``omnibus.py:252-257``); its Kafka replay
path also re-delivers records, relying on id equality to collapse
duplicates (``json_converter.py:245-273`` regenerates or preserves ids
via ``force_new_id``).  Spark expresses both natively:

- **Stream-stream inner join** needs watermarks on BOTH sides plus an
  event-time range condition — that pair of constraints is what lets
  the engine evict join state: a left row older than
  (right watermark − upper bound) can never match again and is dropped
  from the state store.  Without the range condition the state is
  unbounded and the query is rejected — the constraint *is* the
  100 TB design.
- **Streaming dedup** is ``dropDuplicatesWithinWatermark``: keeps one
  row per id while only retaining ids newer than the watermark, so
  dedup state is bounded by (event-rate × watermark delay) instead of
  the full stream history.

Both stay entirely JVM-side (no Python in the hot path).
"""

from __future__ import annotations

from typing import Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def interval_join_stream(
    left: DataFrame,
    right: DataFrame,
    key: str,
    left_ts: str,
    right_ts: str,
    lower: str = "0 seconds",
    upper: str = "10 minutes",
    left_watermark: str = "30 seconds",
    right_watermark: str = "30 seconds",
) -> DataFrame:
    """Watermarked stream-stream inner join: pair each *left* row with
    *right* rows of the same ``key`` whose timestamp falls in
    ``[left_ts + lower, left_ts + upper]``.

    Classic attribution shape — purchase (left) matched to the views
    (right) that preceded it within the window.  One shuffle per side
    on ``key``; join state is evicted as the watermarks advance.
    """
    lw = left.withWatermark(left_ts, left_watermark).alias("l")
    rw = right.withWatermark(right_ts, right_watermark).alias("r")
    cond = (
        (F.col(f"l.{key}") == F.col(f"r.{key}"))
        & (F.col(f"r.{right_ts}") >= F.col(f"l.{left_ts}") + F.expr(f"INTERVAL {lower}"))
        & (F.col(f"r.{right_ts}") <= F.col(f"l.{left_ts}") + F.expr(f"INTERVAL {upper}"))
    )
    return lw.join(rw, cond, "inner").drop(F.col(f"r.{key}"))


def dedup_stream(
    stream: DataFrame,
    ids: Sequence[str],
    ts_col: str,
    watermark: str = "30 seconds",
) -> DataFrame:
    """Keep the first row per ``ids`` tuple, with dedup state bounded
    by the watermark: a duplicate arriving within ``watermark`` of the
    original is dropped; id-tracking state older than the watermark is
    evicted (the at-least-once→exactly-once collapse the reference
    gets from id equality on replay)."""
    return stream.withWatermark(ts_col, watermark).dropDuplicatesWithinWatermark(list(ids))
