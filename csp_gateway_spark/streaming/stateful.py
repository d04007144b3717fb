"""Custom stateful per-key nodes — the `@csp.node`-with-state analogue
(reference U2/W10: `omnibus.py:144-169`, docs/wiki/Overview.md:89-99).

Spark: ``applyInPandasWithState`` gives arbitrary per-key state with
watermark-driven timeouts; the batch twin (``applyInPandas`` over a
key group) shares the same user function shape, so operators can be
unit-tested in batch and deployed streaming.
"""

from __future__ import annotations

from typing import Callable, Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def stateful_counter_batch(df: DataFrame, keys: Sequence[str], ts_col: str = "timestamp") -> DataFrame:
    """Batch twin of the demo's per-key tick counter node
    (`omnibus.py:144-160`): running count per key in time order."""
    from pyspark.sql.window import Window

    w = Window.partitionBy(*keys).orderBy(ts_col).rowsBetween(Window.unboundedPreceding, 0)
    return df.withColumn("tick_count", F.count(F.lit(1)).over(w))


def apply_stateful(
    stream: DataFrame,
    keys: Sequence[str],
    func: Callable,
    state_schema: str,
    output_schema: str,
    timeout: str = "NoTimeout",
) -> DataFrame:
    """Wrap ``applyInPandasWithState`` for streaming custom nodes.

    ``func(key, pdf_iter, state)`` is the user hook — receives the
    grouped micro-batch rows and a GroupState; yields pandas frames.
    """
    grouped = stream.groupBy(*[F.col(k) for k in keys])
    return grouped.applyInPandasWithState(
        func,
        outputStructType=output_schema,
        stateStructType=state_schema,
        outputMode="append",
        timeoutConf=timeout,
    )


def ewma_batch(
    df: DataFrame,
    keys: Sequence[str],
    value_col: str,
    ts_col: str,
    alpha: float = 0.1,
) -> DataFrame:
    """Per-key exponentially-weighted moving average — a canonical
    stateful transform, computed in batch via applyInPandas (numpy
    recurrence per key group; one shuffle on keys)."""
    import pandas as pd

    keys = list(keys)

    out_cols = keys + [ts_col, value_col, "ewma"]

    def compute(pdf: "pd.DataFrame") -> "pd.DataFrame":
        pdf = pdf.sort_values(ts_col)
        pdf["ewma"] = pdf[value_col].ewm(alpha=alpha, adjust=False).mean()
        return pdf[out_cols]

    schema_parts = []
    for field in df.schema.fields:
        if field.name in out_cols:
            schema_parts.append(f"{field.name} {field.dataType.simpleString()}")
    schema = ", ".join(schema_parts + ["ewma double"])
    return df.groupBy(*keys).applyInPandas(compute, schema=schema)
