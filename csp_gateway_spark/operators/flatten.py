"""psp_flatten equivalent: nested-struct flattening + list explosion.

Reference: records are flattened for Perspective — nested structs to
dotted column names ``a.b``, list fields exploded into cartesian rows,
enums/sets stringified (`utils/struct/psp.py:33-112, 142-260`);
recursive excluded-columns spec (`psp.py:115-140`).

Spark: struct flattening is a projection (zero-cost, codegen); list
explosion is ``explode_outer`` (cartesian of multiple list columns =
chained explodes, matching psp_flatten's product semantics).
"""

from __future__ import annotations

from typing import Iterable, Optional

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T


def flatten_structs(df: DataFrame, sep: str = ".", exclude: Optional[Iterable[str]] = None) -> DataFrame:
    """Flatten nested struct columns to dotted top-level columns
    (`psp.py:245-246`). ``exclude``: dotted names to drop
    (`psp.py:115-140`)."""
    exclude = set(exclude or ())
    cols = []
    for field in df.schema.fields:
        if isinstance(field.dataType, T.StructType):
            for sub in field.dataType.fields:
                name = f"{field.name}{sep}{sub.name}"
                if name not in exclude:
                    cols.append(F.col(f"{field.name}.{sub.name}").alias(name))
        else:
            if field.name not in exclude:
                cols.append(F.col(field.name))
    return df.select(*cols)


def explode_lists(df: DataFrame, columns: Optional[Iterable[str]] = None, outer: bool = True, with_position: bool = False) -> DataFrame:
    """Explode list columns into rows; multiple list columns chain into
    a cartesian product (psp_flatten semantics, `psp.py:33-112`).

    ``with_position`` adds ``<col>_pos`` ordinality (posexplode).
    """
    list_cols = [
        f.name
        for f in df.schema.fields
        if isinstance(f.dataType, T.ArrayType) and (columns is None or f.name in columns)
    ]
    out = df
    for c in list_cols:
        others = [x for x in out.columns if x != c]
        if with_position:
            fn = F.posexplode_outer if outer else F.posexplode
            out = out.select(*others, fn(F.col(c)).alias(f"{c}_pos", c))
        else:
            fn = F.explode_outer if outer else F.explode
            out = out.select(*others, fn(F.col(c)).alias(c))
    return out
