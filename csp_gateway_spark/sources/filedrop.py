"""File-drop source: watch a directory, tick new files into a channel.

Reference: watchdog-based directory observer loading parquet/json/csv/
custom files, validating rows to the channel struct type
(`modules/filedrop/filedrop.py:75-145`, `modules/filedrop/adapter.py`).

Spark: Structured Streaming's file source IS a directory watcher —
``readStream.format(fmt).schema(s).load(dir)`` picks up new files per
micro-batch, exactly-once, at cluster scale (listing is incremental;
use ``maxFilesPerTrigger`` for backpressure).  Batch mode reads the
directory once (for tests and replay).
"""

from __future__ import annotations

from typing import Callable, Optional

from pydantic import BaseModel, ConfigDict
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import types as T

from csp_gateway_spark.catalog import ChannelCatalog, GatewayModule
from csp_gateway_spark.structs import with_identity

_READERS = {"parquet", "json", "csv"}


class FileDropConfiguration(BaseModel):
    """Mirrors ReadFileDropConfiguration (`filedrop.py:40-43`)."""

    model_config = ConfigDict(arbitrary_types_allowed=True)

    directory: str
    format: str = "json"
    channel: str
    schema_struct: Optional[T.StructType] = None
    options: dict = {}
    transform: Optional[Callable[[DataFrame], DataFrame]] = None  # custom loader hook


def read_filedrop(
    spark: SparkSession,
    config: FileDropConfiguration,
    streaming: bool = False,
) -> DataFrame:
    if config.format not in _READERS:
        raise ValueError(f"unsupported filedrop format {config.format!r}; one of {sorted(_READERS)}")
    reader = spark.readStream if streaming else spark.read
    if config.schema_struct is not None:
        reader = reader.schema(config.schema_struct)
    for k, v in config.options.items():
        reader = reader.option(k, v)
    df = reader.format(config.format).load(config.directory)
    if config.transform is not None:
        df = config.transform(df)
    return with_identity(df)


class ReadFileDrop(GatewayModule):
    """GatewayModule wrapper: wires the file-drop source into a channel
    (`filedrop.py:75-145`)."""

    model_config = ConfigDict(arbitrary_types_allowed=True)

    config: FileDropConfiguration
    streaming: bool = False

    def connect(self, channels: ChannelCatalog) -> None:
        df = read_filedrop(channels.spark, self.config, streaming=self.streaming)
        channels.declare(self.config.channel, self.config.schema_struct)
        channels.set_channel(self.config.channel, df)
