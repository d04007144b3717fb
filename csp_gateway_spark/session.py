"""SparkSession factory tuned for both local testing and cluster scale.

Scale notes (100 TB design point):
- AQE on: runtime coalescing of shuffle partitions, skew-join splitting,
  and dynamic broadcast conversion replace hand-tuned partition counts.
- ``spark.sql.shuffle.partitions`` is only the *initial* number; AQE
  coalesces.  On a real cluster set it to ~2-3x total cores.
- Arrow enabled for every pandas-UDF / toPandas boundary.
- For streaming state at scale, switch the state store to RocksDB
  (spark.sql.streaming.stateStore.providerClass) — configured here but
  harmless in batch.
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession

DEFAULT_CPUS = os.environ.get("SPARK_GRAFT_CPUS", "32")


def get_spark(app_name: str = "csp-gateway-spark", cpus: str | None = None) -> SparkSession:
    """Build (or fetch) the SparkSession with scale-appropriate defaults."""
    cpus = cpus or DEFAULT_CPUS
    builder = (
        SparkSession.builder.appName(app_name)
        .master(f"local[{cpus}]")
        # --- optimizer / execution ---
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        # Size post-shuffle partitions by the advisory byte target
        # rather than max parallelism: tiny shuffles coalesce to 1-2
        # tasks; at 100 TB the same target yields thousands of
        # right-sized partitions.  (Measured neutral at sf0.1 — local
        # latency there is codegen/JIT warm-up, not task count.)
        .config("spark.sql.adaptive.coalescePartitions.parallelismFirst", "false")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.autoBroadcastJoinThreshold", str(64 * 1024 * 1024))
        .config("spark.sql.shuffle.partitions", cpus)
        # --- Arrow / pandas UDF boundary ---
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.sql.execution.arrow.maxRecordsPerBatch", "10000")
        # --- parquet scan behavior ---
        .config("spark.sql.parquet.filterPushdown", "true")
        .config("spark.sql.files.maxPartitionBytes", str(128 * 1024 * 1024))
        # 80+ distinct query shapes overflow the default 100-entry
        # generated-class cache; eviction forces Janino recompiles (~10 s
        # for the widest aggregates) at random on repeated runs
        .config("spark.sql.codegen.cache.maxEntries", "2000")
        # events.ts is parquet TIMESTAMP(NANOS): read as int64 nanos (Spark
        # has no ns timestamp type); compare with DuckDB epoch_ns(ts).
        .config("spark.sql.legacy.parquet.nanosAsLong", "true")
        .config("spark.sql.session.timeZone", "UTC")
        # --- streaming state at scale ---
        .config(
            "spark.sql.streaming.stateStore.providerClass",
            "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider",
        )
        .config("spark.sql.streaming.stateStore.rocksdb.changelogCheckpointing.enabled", "true")
        .config("spark.driver.memory", os.environ.get("SPARK_GRAFT_DRIVER_MEM", "8g"))
        .config("spark.ui.enabled", "false")
    )
    # shuffle/blockmgr/localCheckpoint scratch on tmpfs when available:
    # this sandbox's block device throttles to single-digit MB/s
    # sustained writes (measured 5 MB/s vs 740 MB/s on /dev/shm), which
    # turns every spill/checkpoint into an I/O stall.  On a real
    # cluster spark.local.dir is the executor's local SSD/NVMe — tmpfs
    # here models that, it does not change any result.
    shm = os.environ.get("SPARK_GRAFT_LOCAL_DIR")
    if shm is None and os.path.isdir("/dev/shm") and os.access("/dev/shm", os.W_OK):
        shm = "/dev/shm/csp_gw_spark_local"
    if shm:
        os.makedirs(shm, exist_ok=True)
        builder = builder.config("spark.local.dir", shm)
    return builder.getOrCreate()


def normalize_event_ts(df, col: str = "ts"):
    """Pin the engine contract `events.ts == epoch-nanoseconds long`
    regardless of how the parquet encodes it.

    The driver's testdata has shipped both TIMESTAMP(NANOS) (read as
    long via ``nanosAsLong``; already the contract form) and
    TIMESTAMP(MICROS) (arrives as timestamp/timestamp_ntz; converted
    here).  NTZ values are naive UTC — same convention DuckDB's
    ``epoch_ns(ts)`` applies on the oracle side — so the session
    timezone must be UTC when casting (get_spark and the entry-point
    loader both pin it)."""
    from pyspark.sql import functions as F
    from pyspark.sql import types as T

    if col not in df.columns:
        return df
    dt = df.schema[col].dataType
    if isinstance(dt, (T.TimestampType, T.TimestampNTZType)):
        df = df.withColumn(
            col, (F.unix_micros(F.col(col).cast("timestamp")) * F.lit(1000)).cast("long")
        )
    return df


def load_tables(spark: SparkSession, sf_dir: str, tables: tuple[str, ...] | None = None):
    """Load the driver's parquet tables and register them as temp views.

    Returns ``dict[name, DataFrame]``.  Column pruning + predicate
    pushdown reach the scan because these are plain parquet reads.
    """
    # the caller may hand us a session built elsewhere (the driver's
    # harness does): if events.parquet is TIMESTAMP(NANOS) the conf
    # must be on THIS session, not just get_spark()'s; the timezone
    # pin keeps the MICROS→nanos conversion UTC-stable
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    spark.conf.set("spark.sql.session.timeZone", "UTC")
    names = tables or (
        "region",
        "nation",
        "customer",
        "supplier",
        "part",
        "orders",
        "lineitem",
        "events",
        "documents",
        "embeddings",
    )
    out = {}
    for name in names:
        path = os.path.join(sf_dir, f"{name}.parquet")
        if os.path.exists(path):
            df = spark.read.parquet(path)
            if name == "events":
                df = normalize_event_ts(df)
            df.createOrReplaceTempView(name)
            out[name] = df
    return out
