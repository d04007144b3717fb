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


def running_counts(stream: DataFrame, key: str, out_schema: str = "key string, n bigint") -> DataFrame:
    """Per-key running tick counter on `transformWithStateInPandas`
    (Spark 4's stateful-processor API — the modern engine-managed-state
    path for custom nodes; reference W10 `@csp.node` with `csp.state`).

    State lives in the RocksDB state store (configured in session.py):
    per-key ValueState survives micro-batches, scales with keys not
    history, and checkpoints incrementally — the 100 TB-safe layout for
    unbounded custom state.

    NOTE: Spark's TWS Python runner requires the ``protobuf`` package
    at query start; environments without it should use
    ``apply_stateful`` (applyInPandasWithState), which has identical
    semantics for this operator."""
    try:  # TWS driver worker imports google.protobuf at query start
        from google.protobuf import descriptor  # noqa: F401
    except ImportError as e:  # pragma: no cover - env-dependent
        raise ImportError(
            "transformWithStateInPandas needs the 'protobuf' package; "
            "use apply_stateful (applyInPandasWithState) instead"
        ) from e
    import pandas as pd
    from pyspark.sql.streaming.stateful_processor import StatefulProcessor

    class _Counter(StatefulProcessor):
        def init(self, handle) -> None:
            self._n = handle.getValueState("n", "n bigint")

        def handleInputRows(self, key, rows, timerValues):
            n = self._n.get()[0] if self._n.exists() else 0
            for pdf in rows:
                n += len(pdf)
            self._n.update((n,))
            yield pd.DataFrame({"key": [key[0]], "n": [n]})

        def close(self) -> None:
            pass

    return stream.withColumnRenamed(key, "key").groupBy("key").transformWithStateInPandas(
        statefulProcessor=_Counter(),
        outputStructType=out_schema,
        outputMode="Update",
        timeMode="None",
    )


def running_counts_gs(stream: DataFrame, key: str) -> DataFrame:
    """Per-key running tick counter on ``applyInPandasWithState`` —
    the GroupState variant of :func:`running_counts` with identical
    semantics and no extra dependencies (the TWS runner needs
    protobuf; this path uses the plain Arrow worker)."""
    import pandas as pd

    def fn(key_tuple, pdf_iter, state):
        n = state.get[0] if state.exists else 0
        for pdf in pdf_iter:
            n += len(pdf)
        state.update((n,))
        yield pd.DataFrame({"key": [key_tuple[0]], "n": [n]})

    return apply_stateful(
        stream.withColumnRenamed(key, "key"),
        ["key"],
        fn,
        state_schema="n bigint",
        output_schema="key string, n bigint",
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


def transitions_stream(
    stream: DataFrame,
    key_col: str = "user_id",
    type_col: str = "event_type",
    ord_col: str = "ts",
) -> DataFrame:
    """Streaming twin of ``operators/windows.py::event_transitions``:
    emits one (cur, nxt) row per consecutive event pair per key, with
    the LAST event type carried in GroupState so pairs bridge
    micro-batch boundaries (the batch operator's lead() window has no
    boundary to bridge).  Aggregating the emitted pairs downstream
    reproduces the batch transition matrix exactly — parity pinned by
    ``test_stateful_streaming.py``.

    State is one string per key (bounded by key cardinality, not
    history) — the 100 TB-safe layout.  Rows within a micro-batch are
    ordered by ``ord_col``; cross-batch order relies on the source's
    per-key arrival order (front with a watermark + event-time sort
    upstream for out-of-order feeds)."""
    import pandas as pd

    def fn(key, pdf_iter, state):
        rows = pd.concat(list(pdf_iter))
        rows = rows.sort_values([ord_col], kind="mergesort")
        seq = rows[type_col].tolist()
        prev = state.get[0] if state.exists else None
        cur_out, nxt_out = [], []
        for t in seq:
            if prev is not None:
                cur_out.append(prev)
                nxt_out.append(t)
            prev = t
        if prev is not None:
            state.update((prev,))
        yield pd.DataFrame(
            {
                key_col: [key[0]] * len(cur_out),
                "cur": cur_out,
                "nxt": nxt_out,
            }
        )

    # derive the key field's type from the input schema so non-bigint
    # keys (string user ids, composite hashes) round-trip unchanged
    key_type = stream.schema[key_col].dataType.simpleString()
    return apply_stateful(
        stream,
        [key_col],
        fn,
        state_schema="last string",
        output_schema=f"{key_col} {key_type}, cur string, nxt string",
    )


def cusum_stream(
    stream: DataFrame,
    mu: float,
    sigma: float,
    key_col: str = "event_type",
    value_col: str = "value",
    ord_col: str = "ts",
) -> DataFrame:
    """Streaming twin of ``operators.analytics.cusum_scores``: per-key
    standardized CUSUM C_t = Σ(x_i − μ)/σ maintained across
    micro-batches — the live mean-shift monitor.

    μ/σ come from an OFFLINE reference build (same split as
    ``drift_stream``'s vocabulary: heavy global stats batch-computed,
    streaming state per key is two scalars).  State per key: (cum, n)
    — bounded by key cardinality, never history.  Rows inside a
    micro-batch fold in ``ord_col`` order; cross-batch order relies on
    per-key arrival order (front with a watermark + event-time sort
    for out-of-order feeds)."""
    import pandas as pd

    m, s = float(mu), float(sigma)
    key_type = stream.schema[key_col].dataType.simpleString()

    def fn(key, pdf_iter, state):
        rows = pd.concat(list(pdf_iter))
        rows = rows.sort_values([ord_col], kind="mergesort")
        cum, n = state.get if state.exists else (0.0, 0)
        out_c, out_n = [], []
        for v in rows[value_col].tolist():
            cum += (float(v) - m) / s
            n += 1
            out_c.append(cum)
            out_n.append(n)
        state.update((cum, n))
        yield pd.DataFrame(
            {
                key_col: [key[0]] * len(out_c),
                "t": out_n,
                "cusum": out_c,
            }
        )

    return apply_stateful(
        stream,
        [key_col],
        fn,
        state_schema="cum double, n bigint",
        output_schema=f"{key_col} {key_type}, t bigint, cusum double",
    )


def make_topk_hook(k: int = 3):
    """Per-key streaming TOP-K custom node for ``apply_stateful``
    (reference W10 `@csp.node` with `csp.state`: a bounded leaderboard
    that survives micro-batches): state is the current top-``k``
    (value, id) pairs (flattened to fixed columns — k·2 scalars per
    key, the bounded-state contract) plus the processed-row count;
    each trigger merges the batch rows and emits the refreshed
    leaderboard tagged with ``seen`` so a replay can select the final
    emission per key (the one where seen == the key's total).

    The merge is deterministic in (value, id) descending order, so
    the final state is independent of how triggers slice the input —
    the property the streaming gate hash-checks against the batch
    row_number oracle.

    State schema: ``seen bigint, vs array<double>, ids array<bigint>``
    Output schema: ``key string, rank int, value double, id bigint,
    seen bigint``
    """

    def hook(key, pdf_iter, state):
        import pandas as pd

        if state.exists:
            seen, vs, ids = state.get
            top = list(zip(list(vs), list(ids)))
        else:
            seen, top = 0, []
        for pdf in pdf_iter:
            seen += len(pdf)
            for v, i in zip(pdf["value"], pdf["event_id"]):
                top.append((float(v), int(i)))
            top.sort(key=lambda t: (-t[0], -t[1]))
            top = top[:k]
        state.update((seen, [t[0] for t in top], [t[1] for t in top]))
        yield pd.DataFrame(
            {
                "key": [key[0]] * len(top),
                "rank": list(range(1, len(top) + 1)),
                "value": [t[0] for t in top],
                "id": [t[1] for t in top],
                "seen": [seen] * len(top),
            }
        )

    return hook
