"""Versioned parquet tables: time-travel reads, small-file compaction
and write-audit-publish — a minimal table format over plain parquet
directories, for pipelines that need "what did this table look like
when round N trained" without a lakehouse dependency.

Layout::

    <root>/v=<N>/part-*.parquet     one immutable directory per version
    <root>/_manifest.json           {"current": N, "versions": {...}}

Design (100 TB):
- Versions are IMMUTABLE — a new version is a new directory, readers
  of version N never see partial writes (publish is a directory
  rename + manifest swap, both atomic on the filesystem; on object
  stores use the same staged-prefix + manifest-pointer pattern).
- The manifest stores row/file counts per version, so audits and the
  `table_diff` reconciliation query know what to expect without
  listing data files.
- `compact` rewrites the CURRENT version into fewer, larger files as
  a NEW version — readers pinned to old versions are unaffected, and
  the operation is pure Spark (`repartition` + write), no driver
  data movement.
- `wap_publish` is the Write-Audit-Publish gate: the batch lands in a
  staging prefix, the audits (schema contract + optional row checks)
  run against the STAGED files, and only a clean audit renames the
  prefix into the table — a failed audit leaves the current version
  untouched.

Reference parity: the reference persists engine-cycle changelogs and
replays them (`csp_gateway/shared/json_converter.py`,
`server/demo/omnibus.py` snapshot flags); versioned batch tables are
the SURVEY §7.8 additive analogue for the training-data side.
"""

from __future__ import annotations

import json
import os
import shutil
from dataclasses import dataclass
from typing import Callable, Optional, Sequence

from pyspark.sql import DataFrame, SparkSession

MANIFEST = "_manifest.json"


@dataclass(frozen=True)
class VersionInfo:
    version: int
    rows: int
    files: int


def _manifest_path(root: str) -> str:
    return os.path.join(root, MANIFEST)


def _read_manifest(root: str) -> dict:
    p = _manifest_path(root)
    if not os.path.exists(p):
        return {"current": None, "versions": {}}
    with open(p) as f:
        return json.load(f)


def _write_manifest(root: str, manifest: dict) -> None:
    tmp = _manifest_path(root) + ".tmp"
    with open(tmp, "w") as f:
        json.dump(manifest, f, indent=1, sort_keys=True)
    os.replace(tmp, _manifest_path(root))  # atomic pointer swap


def _version_dir(root: str, version: int) -> str:
    return os.path.join(root, f"v={version}")


def list_versions(root: str) -> list[VersionInfo]:
    m = _read_manifest(root)
    return [
        VersionInfo(int(v), info["rows"], info["files"])
        for v, info in sorted(m["versions"].items(), key=lambda kv: int(kv[0]))
    ]


def current_version(root: str) -> Optional[int]:
    return _read_manifest(root)["current"]


def _count_files(path: str) -> int:
    return sum(
        1
        for n in os.listdir(path)
        if n.endswith(".parquet") or (n.startswith("part-") and not n.endswith(".crc"))
    )


def write_version(df: DataFrame, root: str) -> int:
    """Write ``df`` as the next version and point `current` at it.
    The data lands under a staging name first; the version becomes
    visible only via the directory rename + manifest swap."""
    os.makedirs(root, exist_ok=True)
    m = _read_manifest(root)
    nxt = (m["current"] or 0) + 1 if m["current"] is not None else 1
    staged = os.path.join(root, f"_staged_v={nxt}")
    df.write.mode("overwrite").parquet(staged)
    rows = df.sparkSession.read.parquet(staged).count()
    os.rename(staged, _version_dir(root, nxt))
    m["versions"][str(nxt)] = {"rows": rows, "files": _count_files(_version_dir(root, nxt))}
    m["current"] = nxt
    _write_manifest(root, m)
    return nxt


def read_version(
    spark: SparkSession, root: str, version: Optional[int] = None
) -> DataFrame:
    """Time-travel read: the pinned ``version``, or current."""
    m = _read_manifest(root)
    v = version if version is not None else m["current"]
    if v is None or str(v) not in m["versions"]:
        raise FileNotFoundError(f"no version {version!r} at {root}")
    return spark.read.parquet(_version_dir(root, int(v)))


def compact(spark: SparkSession, root: str, target_files: int = 1) -> int:
    """Rewrite the current version into ``target_files`` files as a
    NEW version (readers pinned to old versions are unaffected).
    `repartition` (not coalesce) so the rewrite redistributes evenly
    instead of concatenating input partitions."""
    cur = read_version(spark, root)
    return write_version(cur.repartition(target_files), root)


def wap_publish(
    df: DataFrame,
    root: str,
    contract=None,
    audits: Sequence[Callable[[DataFrame], Optional[str]]] = (),
) -> tuple[Optional[int], list[str]]:
    """Write-Audit-Publish: stage ``df``, audit the STAGED files, and
    publish only on a clean audit.

    - ``contract``: optional `sources.contract.SchemaContract`; any
      violation fails the audit.
    - ``audits``: callables receiving the staged DataFrame and
      returning an error string (fail) or None (pass) — row counts,
      null floors, freshness checks.

    Returns ``(version, problems)`` — ``(None, [...])`` when the audit
    failed (staging removed, current version untouched)."""
    os.makedirs(root, exist_ok=True)
    m = _read_manifest(root)
    nxt = (m["current"] or 0) + 1 if m["current"] is not None else 1
    staged = os.path.join(root, f"_staged_v={nxt}")
    df.write.mode("overwrite").parquet(staged)
    spark = df.sparkSession
    staged_df = spark.read.parquet(staged)

    problems: list[str] = []
    if contract is not None:
        from csp_gateway_spark.sources.contract import enforce_contract

        _, violations = enforce_contract(staged_df, contract)
        problems += [f"{v.column}: {v.kind} ({v.detail})" for v in violations]
    for audit in audits:
        err = audit(staged_df)
        if err:
            problems.append(err)

    if problems:
        shutil.rmtree(staged, ignore_errors=True)
        return None, problems

    rows = staged_df.count()
    os.rename(staged, _version_dir(root, nxt))
    m["versions"][str(nxt)] = {
        "rows": rows,
        "files": _count_files(_version_dir(root, nxt)),
    }
    m["current"] = nxt
    _write_manifest(root, m)
    return nxt, []


def apply_cdc(
    spark: SparkSession,
    root: str,
    changes: DataFrame,
    key_cols: Sequence[str],
    op_col: str = "op",
    ts_col: Optional[str] = None,
) -> int:
    """MERGE INTO for the versioned table: apply a change batch with
    an ``op`` column (``I``/``U`` upsert, ``D`` delete) keyed on
    ``key_cols`` and publish the result as a new version — the
    lakehouse upsert, expressed as snapshot + delta → snapshot so the
    write path stays immutable and time-travel keeps working.

    Plan: when ``ts_col`` is given, the change batch first collapses
    to its LAST change per key (max_by over the ts — map-side
    combinable); the merge is then one full-outer join of current
    snapshot vs collapsed changes on the key — co-partitioned, no
    row-to-row fan-out.  Deletes drop the key; upserts replace the
    payload; untouched keys carry forward."""
    from pyspark.sql import functions as F

    merged = merge_snapshot(read_version(spark, root), changes, key_cols, op_col, ts_col)
    return write_version(merged, root)


def merge_snapshot(
    cur: DataFrame,
    changes: DataFrame,
    key_cols: Sequence[str],
    op_col: str = "op",
    ts_col: Optional[str] = None,
) -> DataFrame:
    """The pure merge behind `apply_cdc` (snapshot ⊕ I/U/D changes →
    snapshot), exposed for oracle checking and for callers managing
    their own storage.  See `apply_cdc` for plan shape."""
    from pyspark.sql import functions as F

    payload_cols = [c for c in changes.columns if c not in (op_col, ts_col)]
    data_cols = [c for c in payload_cols if c not in key_cols]
    ch = changes
    if ts_col is not None:
        ch = (
            ch.groupBy(*[F.col(k) for k in key_cols])
            .agg(
                F.expr(
                    f"max_by(struct({op_col}, {', '.join(data_cols)}), {ts_col})"
                ).alias("_last")
            )
            .select(*key_cols, "_last.*")
        )
    else:
        # without a ts to collapse on, a duplicate key in the change
        # batch would fan out the full-outer join and silently publish
        # a duplicate-key snapshot — refuse instead of corrupting.
        # One bounded scan of the DELTA (never the snapshot).
        dup = (
            ch.groupBy(*[F.col(k) for k in key_cols])
            .agg(F.count(F.lit(1)).alias("_n"))
            .filter(F.col("_n") > 1)
            .limit(1)
            .take(1)
        )
        if dup:
            raise ValueError(
                "merge_snapshot: change batch has multiple rows for key "
                f"{tuple(dup[0][k] for k in key_cols)!r} and no ts_col to "
                "collapse on — pass ts_col or pre-collapse the batch to one "
                "row per key"
            )
    c = cur.alias("c")
    d = ch.alias("d")
    cond = None
    for k in key_cols:
        eq = F.col(f"c.{k}") == F.col(f"d.{k}")
        cond = eq if cond is None else cond & eq
    j = c.join(d, cond, "full_outer")
    has_change = F.col(f"d.{op_col}").isNotNull()
    keep = (~has_change) | (F.col(f"d.{op_col}") != "D")
    out_cols = []
    for k in key_cols:
        out_cols.append(F.coalesce(F.col(f"d.{k}"), F.col(f"c.{k}")).alias(k))
    for col in data_cols:
        out_cols.append(
            F.when(has_change, F.col(f"d.{col}")).otherwise(F.col(f"c.{col}")).alias(col)
        )
    return j.filter(keep).select(*out_cols)


def versioned_foreach_batch(
    root: str,
    contract=None,
    audits: Sequence[Callable[[DataFrame], Optional[str]]] = (),
    on_reject: Optional[Callable[[int, list], None]] = None,
):
    """Streaming sink: publish every non-empty micro-batch through the
    Write-Audit-Publish gate — each version is one audited micro-batch
    (exactly the engine-cycle granularity the reference's changelog
    writer uses).  Rejected batches invoke ``on_reject(batch_id,
    problems)`` and leave the table untouched."""

    def _sink(batch_df: DataFrame, batch_id: int) -> None:
        if not batch_df.take(1):
            return
        v, problems = wap_publish(batch_df, root, contract=contract, audits=audits)
        if v is None and on_reject is not None:
            on_reject(batch_id, problems)

    return _sink


def diff_to_changes(
    cur: DataFrame,
    nxt: DataFrame,
    key_cols: Sequence[str],
) -> DataFrame:
    """Inverse of `merge_snapshot`: derive the I/U/D change batch that
    transforms snapshot ``cur`` into snapshot ``nxt`` — what a CDC
    producer emits after a backfill, and the round-trip check for the
    versioned-table layer (``merge_snapshot(cur, diff_to_changes(cur,
    nxt), keys)`` ≡ ``nxt``).

    ONE co-partitioned full-outer join on the key; row classification
    is scan-local null-safe comparison over the payload columns.
    Unchanged keys emit nothing, so the batch is delta-sized."""
    from pyspark.sql import functions as F

    data_cols = [c for c in nxt.columns if c not in key_cols]
    c = cur.alias("c")
    d = nxt.alias("d")
    cond = None
    for k in key_cols:
        eq = F.col(f"c.{k}") == F.col(f"d.{k}")
        cond = eq if cond is None else cond & eq
    j = c.join(d, cond, "full_outer")
    in_cur = F.col(f"c.{key_cols[0]}").isNotNull()
    in_nxt = F.col(f"d.{key_cols[0]}").isNotNull()
    changed = F.lit(False)
    for col in data_cols:
        changed = changed | ~F.col(f"c.{col}").eqNullSafe(F.col(f"d.{col}"))
    op = (
        F.when(~in_nxt, F.lit("D"))
        .when(~in_cur, F.lit("I"))
        .when(changed, F.lit("U"))
    )
    out_cols = [
        F.coalesce(F.col(f"d.{k}"), F.col(f"c.{k}")).alias(k) for k in key_cols
    ] + [F.col(f"d.{col}").alias(col) for col in data_cols]
    return j.withColumn("op", op).filter(F.col("op").isNotNull()).select(
        *out_cols, "op"
    )
