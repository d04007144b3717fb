"""EngineReplay: read→write live handoff over ONE changelog.

Reference `server/shared/engine_replay.py:19-125`: the module
subscribes to the recorded engine cycles and decodes them into the
gateway's channels while engine time is BEFORE ``start_writing``
(`csp.times(fat_pipe) < alarm_time` filter, `engine_replay.py:107-111`),
then — in WRITE / READ_AND_WRITE mode — starts encoding and publishing
NEW cycles from the alarm tick on (`engine_replay.py:113-118`,
``set_alarm_and_fetch_alarm_time`` for datetime/timedelta
``start_writing``, `engine_replay.py:42-50`).  That timed handoff is
what makes warm-standby mirroring work: a restarted gateway replays
history up to the cutover and seamlessly continues appending to the
same changelog, which afterwards decodes as one continuous run.

Spark design: the changelog is the batch JSON changelog of
``sources/replay.py`` (``(csp_engine_timestamp, channel, payload)``
rows).  The READ half is a schema'd scan filtered to
``engine_ts < cutover`` feeding ``replay_channel`` (drop-before-start +
the reference's decode rewrite options: regenerate id/timestamp, flag
updates); the WRITE half encodes ticks with ``timestamp >= cutover``
and APPENDS to the same directory — the two predicates partition the
timeline exactly, so replay + handoff never duplicates or drops a
cycle.  ``timedelta`` cutovers resolve against the earliest recorded
engine timestamp (the batch analogue of "engine start"), matching the
reference's relative alarm.
"""

from __future__ import annotations

import datetime
import os
import warnings
from enum import Enum
from typing import Dict, List, Optional, Union

from pydantic import ConfigDict, Field
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

from csp_gateway_spark.catalog import ChannelCatalog, GatewayModule
from csp_gateway_spark.sources.replay import (
    ENGINE_TS,
    encode_changelog,
    read_changelog,
    replay_channel,
)

__all__ = ("EngineReplay", "KafkaEngineReplay", "ReadWriteMode")


class ReadWriteMode(str, Enum):
    """`utils/ReadWriteMode` (reference `engine_replay.py:39`)."""

    READ = "READ"
    WRITE = "WRITE"
    READ_AND_WRITE = "READ_AND_WRITE"


class EngineReplay(GatewayModule):
    """Changelog replay with the ``start_writing`` read→write handoff
    (reference `shared/engine_replay.py:19-125`).

    - ``connect`` (READ half): decode recorded cycles with
      ``engine_ts < start_writing`` into the catalog's channels.
    - ``flush`` (WRITE half; also runs on ``shutdown``): encode ticks
      with ``timestamp >= start_writing`` of the selected channels and
      append them to the same changelog.

    ``selection`` defaults to every channel in ``schemas``;
    ``decode_selection`` / ``encode_selection`` override it per half
    (reference `engine_replay.py:31-38, 85-92`).
    ``subscribe_with_struct_id/timestamp=False`` regenerate identity on
    decode (`engine_replay.py:63-70`); ``flag_updates`` sets boolean
    fields per replayed channel (`engine_replay.py:51-58`).
    """

    model_config = ConfigDict(arbitrary_types_allowed=True)

    path: str
    schemas: Dict[str, T.StructType]
    start_writing: Union[datetime.datetime, datetime.timedelta] = Field(
        default_factory=datetime.timedelta
    )
    read_write_mode: ReadWriteMode = ReadWriteMode.READ_AND_WRITE
    selection: Optional[List[str]] = None
    decode_selection: Optional[List[str]] = None
    encode_selection: Optional[List[str]] = None
    flag_updates: Dict[str, Dict[str, bool]] = {}
    subscribe_with_struct_id: bool = True
    subscribe_with_struct_timestamp: bool = True

    # -- cutover ------------------------------------------------------
    def resolve_cutover(
        self, spark: SparkSession, catalog: Optional[ChannelCatalog] = None
    ) -> datetime.datetime:
        """Absolute handoff time.  A ``datetime`` is used as-is; a
        ``timedelta`` is relative to the earliest recorded engine
        timestamp (batch analogue of `set_alarm_and_fetch_alarm_time`'s
        engine-start-relative alarm).  For a fresh/empty changelog the
        anchor falls back to the earliest tick of the encode channels
        (then epoch) — NOT wall-clock "now", which would silently fail
        ``timestamp >= cutover`` for every historical tick and write
        nothing; with the default ``timedelta()`` this makes the module
        start writing immediately, like the reference's default."""
        if isinstance(self.start_writing, datetime.datetime):
            return self.start_writing
        start: Optional[datetime.datetime] = None
        if self._changelog_exists():
            row = (
                self._read_log(spark)
                .agg(F.min(ENGINE_TS).alias("_mn"))
                .collect()[0]
            )
            start = row["_mn"]
        if start is None and catalog is not None:
            mins = []
            for name in self._encode_names():
                try:
                    df = catalog.get_channel(name)
                except Exception:
                    continue
                if "timestamp" in df.columns:
                    row = df.agg(F.min("timestamp").alias("_mn")).collect()[0]
                    if row["_mn"] is not None:
                        mins.append(row["_mn"])
            if mins:
                start = min(mins)
        if start is None:
            start = datetime.datetime(1970, 1, 1)
        return start + self.start_writing

    def _changelog_exists(self) -> bool:
        if not os.path.isdir(self.path):
            return os.path.isfile(self.path)
        return any(
            name.endswith((".json", ".txt")) or name.startswith("part-")
            for name in os.listdir(self.path)
        )

    def _encode_names(self) -> List[str]:
        # flush() may run WRITE-mode without a prior connect(); fall back
        # to the declared selection so self._encode is never required.
        return (
            getattr(self, "_encode", None)
            or self.encode_selection
            or self.selection
            or list(self.schemas)
        )

    # -- transport (overridden by KafkaEngineReplay) --------------------
    def _read_log(self, spark: SparkSession) -> DataFrame:
        return read_changelog(spark, self.path)

    def _append(self, changelog: DataFrame) -> int:
        enc = changelog.localCheckpoint(eager=True)
        n = enc.count()
        if n:
            enc.write.mode("append").json(self.path)
        return int(n)

    # -- READ half ------------------------------------------------------
    def connect(self, channels: ChannelCatalog) -> None:
        self._catalog = channels
        has_log = self._changelog_exists()
        decode = self.decode_selection or self.selection or list(self.schemas)
        self._encode = self.encode_selection or self.selection or list(self.schemas)
        self._decoded: set = set()
        for name in self._encode:
            channels.declare(name, self.schemas.get(name))
        if isinstance(self.start_writing, datetime.timedelta) and not has_log:
            # Fresh changelog: defer the relative cutover until flush(),
            # when the encode channels carry ticks to anchor it on.
            self._cutover = None
        else:
            self._cutover = self.resolve_cutover(channels.spark)
        if self.read_write_mode is ReadWriteMode.WRITE:
            return
        if not has_log:
            return
        log = self._read_log(channels.spark).filter(
            F.col(ENGINE_TS) < F.lit(self._cutover)
        )
        for name in decode:
            if name not in self.schemas:
                continue
            replayed = replay_channel(
                log,
                name,
                self.schemas[name],
                force_new_id=not self.subscribe_with_struct_id,
                force_new_timestamp=not self.subscribe_with_struct_timestamp,
                flag_updates=self.flag_updates.get(name),
            ).drop(ENGINE_TS)
            channels.declare(name, self.schemas[name])
            channels.set_channel(name, replayed)
            self._decoded.add(name)

    # -- WRITE half -----------------------------------------------------
    def flush(self, channels: Optional[ChannelCatalog] = None) -> int:
        """Encode NEW cycles (ticks at/after the cutover) of the encode
        selection and append them to the changelog.  Returns the number
        of appended ticks.  Idempotence is the caller's contract (the
        reference publishes each cycle once as it happens; the batch
        form appends once per flush)."""
        if self.read_write_mode is ReadWriteMode.READ:
            return 0
        catalog = channels or getattr(self, "_catalog", None)
        if catalog is None:
            raise RuntimeError("EngineReplay.flush: connect() first or pass the catalog")
        cutover = getattr(self, "_cutover", None)
        if cutover is None:
            cutover = self.resolve_cutover(catalog.spark, catalog)
            self._cutover = cutover
        new_cycles: Dict[str, DataFrame] = {}
        for name in self._encode_names():
            try:
                df = catalog.get_channel(name)
            except Exception:
                continue
            if "timestamp" in df.columns:
                df = df.filter(F.col("timestamp") >= F.lit(cutover))
            elif name in getattr(self, "_decoded", set()):
                # connect() replayed this channel's history into the
                # catalog; without a timestamp column the cutover filter
                # cannot partition the timeline, so an unfiltered append
                # would duplicate every replayed cycle in the changelog.
                raise ValueError(
                    f"EngineReplay.flush: channel {name!r} has no 'timestamp' "
                    "column, so replayed history cannot be separated from new "
                    "ticks; add a timestamp field or exclude it from "
                    "encode_selection"
                )
            else:
                warnings.warn(
                    f"EngineReplay.flush: channel {name!r} has no 'timestamp' "
                    "column; appending ALL rows (the start_writing cutover "
                    "cannot be applied)",
                    stacklevel=2,
                )
            new_cycles[name] = df
        if not new_cycles:
            return 0
        return self._append(encode_changelog(new_cycles))

    def shutdown(self) -> None:
        if getattr(self, "_catalog", None) is not None and not getattr(
            self, "_flushed", False
        ):
            self.flush()
            self._flushed = True


class KafkaEngineReplay(EngineReplay):
    """The Kafka-wire twin (reference `ReplayEngineKafka`,
    `modules/kafka/kafka.py:360-450`): same ``start_writing`` handoff,
    but cycles travel as `EncodedEngineCycle` wire messages — ONE
    (key, value) message per engine cycle whose JSON value carries the
    cycle's (channel, payload) ticks plus the uint64-millis engine
    timestamp — via the hash-checked codec shared with S6
    (`sources/kafka.py::encode_engine_cycles/decode_engine_cycles`).
    All messages share ``replay_key`` so one replay stream stays
    totally ordered within its topic-partition (the reference's
    ordering guarantee).  Transport is the ``FileStubBroker`` topic
    log (no broker in this sandbox); a real deployment swaps the
    broker object for `read_kafka`/`write_kafka` with the same codec.

    NOTE the wire granularity: the Kafka form appends one message per
    CYCLE (ticks grouped by engine timestamp), so engine-time
    resolution is the reference's UINT64 MILLIS — producers ticking
    sub-millisecond collapse into one cycle, exactly as on the
    reference's wire."""

    path: str = ""  # unused: the topic log lives in the broker
    topic: str = "engine-replay"
    replay_key: str = "engine"
    broker_root: str = ""
    num_partitions: int = 4

    def _broker(self):
        from csp_gateway_spark.sources.kafka import FileStubBroker

        if not self.broker_root:
            raise RuntimeError("KafkaEngineReplay: broker_root is required")
        return FileStubBroker(self.broker_root, num_partitions=self.num_partitions)

    def _changelog_exists(self) -> bool:
        return os.path.isdir(os.path.join(self.broker_root, self.topic))

    def _read_log(self, spark: SparkSession) -> DataFrame:
        from csp_gateway_spark.sources.kafka import decode_engine_cycles

        return decode_engine_cycles(self._broker().subscribe(spark, self.topic))

    def _append(self, changelog: DataFrame) -> int:
        from csp_gateway_spark.sources.kafka import encode_engine_cycles

        enc = encode_engine_cycles(changelog, key=self.replay_key).localCheckpoint(
            eager=True
        )
        n = enc.count()
        if n:
            self._broker().publish(enc, self.topic)
        return int(n)
