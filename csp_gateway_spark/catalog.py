"""ChannelCatalog + Gateway lifecycle — the "data bus".

Reference semantics reproduced (file:line cites into /root/reference):
- named typed channels, multiple setters multiplexed
  (`csp.flatten`, `channels.py:439-472`) → ``unionByName``;
- provider resolution: unmet required channel → NoProviderException,
  unused optional channel → null (empty) stream
  (`channels.py:393-430`);
- state channels ``s_<name>`` = keyed-last materialization
  (`channels.py:191-194, 696-739`);
- ``block_set_channels_until`` time gate on producers
  (`channels.py:461-470`);
- module protocol `GatewayModule.connect(channels)` with
  ``requires`` / ``disable`` (`gateway/csp/module.py:17-73`);
- cyclic wiring (feedback) — Spark DAGs are acyclic, so a feedback
  channel is modelled as a *separate* input channel the producer's sink
  appends to (one-micro-batch delay ≙ csp's one-cycle-delay feedback,
  `channels.py:474-545`); see FeedbackChannel.

Scale: a channel is just a DataFrame; unioning producers is a metadata
operation (no shuffle).  State materialization is the only shuffle and
it is keyed on the state key — see operators/state.py.
"""

from __future__ import annotations

import datetime
from typing import Callable, Dict, List, Optional, Sequence

from pydantic import BaseModel, ConfigDict
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

from csp_gateway_spark.query import Query, apply_query
from csp_gateway_spark.structs import TIMESTAMP_FIELD


class NoProviderException(Exception):
    """Raised at finalize when a required channel has no producer
    (reference `channels.py:393-430`)."""


class ChannelCatalog:
    """name → declared schema + producer DataFrames + state config."""

    def __init__(self, spark: SparkSession):
        self.spark = spark
        self._schemas: Dict[str, T.StructType] = {}
        self._producers: Dict[str, List[DataFrame]] = {}
        self._required: set = set()
        self._state_keys: Dict[str, Sequence[str]] = {}
        self._block_until: Dict[str, datetime.datetime] = {}
        self._finalized: Dict[str, DataFrame] = {}
        self._dynamic_keys: Dict[str, List[str]] = {}
        self._mirrors: Dict[str, List[str]] = {}  # target -> source channels
        self._validators: Dict[str, Callable] = {}

    # --- declaration -------------------------------------------------
    def declare(
        self,
        name: str,
        schema: Optional[T.StructType] = None,
        required: bool = False,
        validator=None,
    ) -> None:
        """``validator``: optional row-level hook (reference pydantic
        validators, `base.py:97-114` / `omnibus.py:67-85`): called with
        each sent row dict; raise ValueError to reject (REST: 422), or
        return a (possibly modified) row."""
        self._schemas.setdefault(name, schema)
        self._producers.setdefault(name, [])
        if required:
            self._required.add(name)
        if validator is not None:
            self._validators[name] = validator

    def declare_state(self, name: str, keyby: Sequence[str] | str) -> None:
        """Register ``s_<name>`` keyed-last state for a channel
        (reference naming convention `channels.py:191-194`)."""
        keys = [keyby] if isinstance(keyby, str) else list(keyby)
        self._state_keys[name] = keys

    def add_dynamic_keys(self, name: str, keys: List[str]) -> None:
        """Dict-basket key registration (`factory.py:46-55`)."""
        self._dynamic_keys.setdefault(name, []).extend(keys)

    def block_set_channels_until(self, name: str, when: datetime.datetime) -> None:
        self._block_until[name] = when

    # --- wiring ------------------------------------------------------
    def set_channel(self, name: str, df: DataFrame) -> None:
        self.declare(name)
        if name in self._block_until and TIMESTAMP_FIELD in df.columns:
            df = df.filter(F.col(TIMESTAMP_FIELD) >= F.lit(self._block_until[name]))
        self._producers[name].append(df)

    def mirror(self, src: str, dst: str) -> None:
        """Live link: ``dst`` resolves to its own producers ∪ ``src``'s
        current stream — later sends to ``src`` appear on ``dst``
        (reference `modules/mirror.py:10-52`)."""
        self.declare(dst, self._schemas.get(src))
        self._mirrors.setdefault(dst, []).append(src)
        if src in self._state_keys and dst not in self._state_keys:
            self.declare_state(dst, list(self._state_keys[src]))

    def get_channel(self, name: str) -> DataFrame:
        """Resolved view of a channel: union of producers (or the
        finalized empty stream)."""
        if name in self._mirrors:
            streams = [self.get_channel(src) for src in self._mirrors[name]]
            streams += [self._union(p)] if (p := self._producers.get(name)) else []
            return self._union(streams)
        if name in self._finalized:
            return self._finalized[name]
        producers = self._producers.get(name, [])
        if not producers:
            raise NoProviderException(f"channel {name!r} has no provider (finalize() binds null streams)")
        return self._union(producers)

    def key_view(self, name: str, key_col: str, key: str) -> DataFrame:
        """Dict-basket per-key view (`channels.py:566-598`)."""
        return self.get_channel(name).filter(F.col(key_col) == F.lit(key))

    # --- finalize ----------------------------------------------------
    def finalize(self) -> None:
        """Bind every channel: union producers, null-bind unused
        optional channels, raise for unmet required ones
        (`channels.py:331-437`)."""
        for name in list(self._producers):
            producers = self._producers[name]
            if producers:
                self._finalized[name] = self._union(producers)
            elif name in self._required:
                raise NoProviderException(f"required channel {name!r} has no provider")
            elif self._schemas.get(name) is not None:
                self._finalized[name] = self.spark.createDataFrame([], self._schemas[name])
            # else: untyped unused optional channel stays unbound

    @staticmethod
    def _union(producers: List[DataFrame]) -> DataFrame:
        df = producers[0]
        for other in producers[1:]:
            df = df.unionByName(other, allowMissingColumns=True)
        return df

    # --- state / query path ------------------------------------------
    def state(self, name: str) -> DataFrame:
        """``s_<name>``: last record per key group, ordered by key ASC
        NULLS FIRST (`state.py:165-225`)."""
        from csp_gateway_spark.operators.state import keyed_last

        keys = self._state_keys.get(name)
        if keys is None:
            raise KeyError(f"channel {name!r} has no state declared")
        return keyed_last(self.get_channel(name), keys)

    def query(self, name: str, query: Optional[Query] = None) -> DataFrame:
        """`GET /state/<ch>?query=` semantics (`state.py:614-621`)."""
        return apply_query(self.state(name), query)

    def last(self, name: str) -> DataFrame:
        """`GET /last/<ch>`: the most recent tick (`channels.py:747-787`)."""
        from csp_gateway_spark.operators.state import last_tick

        return last_tick(self.get_channel(name))

    def lookup(self, name: str, record_id: str) -> DataFrame:
        """`/lookup/<ch>/<id>` — id point query on the stream, instead of
        the reference's unbounded in-memory registry (`base.py:26-46`)."""
        return self.get_channel(name).filter(F.col("id") == F.lit(record_id))

    def send(self, name: str, rows: List[dict], schema: Optional[T.StructType] = None) -> DataFrame:
        """Inject records (REST POST path, `channels.py:950-962`):
        validate → assign id/timestamp → append as a producer.

        Ids come from a catalog-level atomic counter seeded at
        day-epoch*1e9 — the reference's id semantics
        (`utils/id_generator.py:8-25`).  Driver-side rows are few (REST
        payloads), so enumerating them here is not a scale concern.
        """
        import datetime as _dt

        schema = schema or self._schemas.get(name)
        validator = self._validators.get(name)
        stamped = []
        now = _dt.datetime.now(_dt.timezone.utc).replace(tzinfo=None)
        for row in rows:
            row = dict(row)
            if validator is not None:
                row = validator(row) or row  # ValueError propagates (REST: 422)
            row.setdefault("id", str(self._next_id()))
            row.setdefault("timestamp", now)
            stamped.append(row)
        if schema is not None and "id" not in schema.fieldNames():
            schema = T.StructType(
                list(schema.fields)
                + [
                    T.StructField("id", T.StringType(), True),
                    T.StructField("timestamp", T.TimestampType(), True),
                ]
            )
        df = self.spark.createDataFrame(stamped, schema=schema)
        self.set_channel(name, df)
        self._finalized.pop(name, None)
        return df

    def _next_id(self) -> int:
        from csp_gateway_spark.structs import day_epoch_seed

        if not hasattr(self, "_id_counter"):
            self._id_counter = day_epoch_seed()
        self._id_counter += 1
        return self._id_counter


class GatewayModule(BaseModel):
    """Extension unit (reference `gateway/csp/module.py:17-73`):
    pydantic-configured, contributes wiring in ``connect``."""

    model_config = ConfigDict(arbitrary_types_allowed=True, extra="allow")

    disable: bool = False
    requires: List[str] = []

    def connect(self, channels: ChannelCatalog) -> None:  # pragma: no cover - interface
        raise NotImplementedError

    def rest(self, app) -> None:  # optional serving hook
        return None

    def shutdown(self) -> None:
        return None


class Gateway(BaseModel):
    """Application assembly (`gateway/gateway.py:88-146, 202-323`)."""

    model_config = ConfigDict(arbitrary_types_allowed=True)

    modules: List[GatewayModule] = []

    def build(self, spark: SparkSession) -> ChannelCatalog:
        catalog = ChannelCatalog(spark)
        for module in self.modules:
            if module.disable:
                continue
            for req in module.requires:
                catalog.declare(req, required=True)
            module.connect(catalog)
        catalog.finalize()
        return catalog

    def shutdown(self) -> None:
        for module in self.modules:
            module.shutdown()


class FeedbackChannel:
    """Cycle-breaking feedback (`channels.py:474-545`).

    Spark plans are acyclic; csp breaks cycles with a one-cycle-delay
    feedback edge.  Here the feedback is a directory-backed stream: the
    producer's ``foreachBatch`` appends to ``path``; the consumer reads
    the same path as a (streaming) source — delivery on the *next*
    micro-batch, which is exactly csp's one-cycle delay.
    """

    def __init__(self, spark: SparkSession, path: str, schema: T.StructType):
        self.spark = spark
        self.path = path
        self.schema = schema

    def reader(self, streaming: bool = False) -> DataFrame:
        if streaming:
            return self.spark.readStream.schema(self.schema).parquet(self.path)
        import os

        if not os.path.isdir(self.path):  # nothing fed back yet
            return self.spark.createDataFrame([], self.schema)
        return self.spark.read.schema(self.schema).parquet(self.path)

    def writer(self, batch_df: DataFrame) -> None:
        batch_df.write.mode("append").parquet(self.path)
