"""Table-level schema contracts for batch ingestion.

The gateway validates ROWS per channel (catalog validators, SURVEY
§2.7 U4 — reference: csp_gateway pydantic struct validation); at
100 TB the first failure mode is upstream TABLES drifting instead: a
partner feed widens an int, renames a column, or starts shipping
nulls.  ``enforce_contract`` checks an incoming DataFrame against a
declared contract and either coerces (safe widenings), passes
through, or reports violations — BEFORE the data enters a pipeline
whose operators would fail 40 stages later.

Everything is driver-side schema metadata work plus (optionally) one
scan-local projection — no shuffle, no action.
"""

from __future__ import annotations

from dataclasses import dataclass, field
from typing import Optional, Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

__all__ = ["ColumnSpec", "SchemaContract", "enforce_contract", "ContractViolation"]

# widenings that never lose information — applied silently when
# coerce=True (the direction parquet/Arrow schema evolution allows)
_SAFE_WIDENINGS = {
    ("tinyint", "smallint"), ("tinyint", "int"), ("tinyint", "bigint"),
    ("smallint", "int"), ("smallint", "bigint"),
    ("int", "bigint"),
    ("float", "double"),
    ("int", "double"), ("smallint", "double"), ("tinyint", "double"),
    ("date", "timestamp"),
}


@dataclass(frozen=True)
class ColumnSpec:
    name: str
    dtype: str                      # Spark simpleString, e.g. "bigint"
    nullable: bool = True
    required: bool = True


@dataclass
class SchemaContract:
    columns: Sequence[ColumnSpec]
    allow_extra: bool = True        # tolerate (and drop) unknown columns
    name: str = "contract"

    def spec(self, col: str) -> Optional[ColumnSpec]:
        for c in self.columns:
            if c.name == col:
                return c
        return None


@dataclass(frozen=True)
class ContractViolation:
    column: str
    kind: str                       # missing | type | nullability | extra
    detail: str


def _simple(dt: T.DataType) -> str:
    return dt.simpleString()


def enforce_contract(
    df: DataFrame,
    contract: SchemaContract,
    coerce: bool = True,
) -> tuple[DataFrame, list[ContractViolation]]:
    """Validate ``df`` against ``contract``.

    Returns ``(out_df, violations)``:
    - missing required column → violation (and a NULL column of the
      declared type is injected so downstream plans still compile when
      the column was declared nullable);
    - type mismatch → coerced via ``cast`` when it is a safe widening
      and ``coerce`` is set, else a violation;
    - nullable data feeding a non-nullable spec → violation (metadata
      check only — cheap; use a catalog row validator to reject rows);
    - extra columns → dropped when ``allow_extra`` else violations.

    Column ORDER is normalized to the contract's order, so unioning
    batches from drifting upstreams stays position-safe.
    """
    violations: list[ContractViolation] = []
    have = {f.name: f for f in df.schema.fields}
    out_cols = []
    for spec in contract.columns:
        f = have.get(spec.name)
        if f is None:
            if spec.required:
                violations.append(
                    ContractViolation(spec.name, "missing", "required column absent")
                )
            if spec.nullable:
                out_cols.append(
                    F.lit(None).cast(spec.dtype).alias(spec.name)
                )
            continue
        actual = _simple(f.dataType)
        if actual != spec.dtype:
            if coerce and (actual, spec.dtype) in _SAFE_WIDENINGS:
                out_cols.append(F.col(spec.name).cast(spec.dtype).alias(spec.name))
            else:
                violations.append(
                    ContractViolation(
                        spec.name, "type", f"have {actual}, want {spec.dtype}"
                    )
                )
                out_cols.append(F.col(spec.name))
        else:
            out_cols.append(F.col(spec.name))
        if f.nullable and not spec.nullable:
            violations.append(
                ContractViolation(
                    spec.name, "nullability", "nullable data for non-null spec"
                )
            )
    extra = [n for n in have if contract.spec(n) is None]
    if extra and not contract.allow_extra:
        violations.extend(
            ContractViolation(n, "extra", "unknown column") for n in extra
        )
    return df.select(*out_cols), violations
