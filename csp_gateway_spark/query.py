"""Filter/Query model → Catalyst ``Column`` compiler.

Reference semantics (csp-gateway):
- ``Filter.calculate`` evaluates ``attr <op> (value | when | other attr)``
  with ops ``== != < <= > >=`` (`utils/web/filter.py:16-66`).
- ``Query.calculate`` is the conjunction (AND) of filters
  (`utils/web/query.py:11-17`).
- The DuckDB path compiles the same model to SQL text with casts and
  dotted-path nested access (`server/gateway/csp/state.py:339-376`);
  unknown attributes warn and drop the clause (`state.py:318-332`).

Here the model compiles to Catalyst expressions instead of SQL text, so
predicate pushdown / codegen apply automatically.  Dotted paths map to
nested field access (``col("a.b")``), which Catalyst resolves natively.
"""

from __future__ import annotations

import datetime
import logging
from functools import reduce
from typing import Any, List, Optional, Union

from pydantic import BaseModel, model_validator
from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

log = logging.getLogger(__name__)

_OPS = {
    "==": lambda c, v: c == v,
    "!=": lambda c, v: c != v,
    "<": lambda c, v: c < v,
    "<=": lambda c, v: c <= v,
    ">": lambda c, v: c > v,
    ">=": lambda c, v: c >= v,
}


class FilterWhereLambda(BaseModel):
    """Compare against another attribute of the same record
    (reference: ``FilterWhereLambda``, `utils/web/filter.py`)."""

    attr: str


class FilterWhen(BaseModel):
    """Compare against a timestamp (reference ``FilterWhen``)."""

    when: datetime.datetime


class Filter(BaseModel):
    """One predicate: ``attr <op> value`` / ``attr <op> when`` /
    ``attr <op> other.attr``."""

    attr: str
    by: Union[FilterWhen, FilterWhereLambda, None] = None
    value: Optional[Any] = None
    where: Optional[str] = None  # convenience: attr name, same as FilterWhereLambda
    op: str = "=="

    @model_validator(mode="after")
    def _check(self):
        if self.op not in _OPS:
            raise ValueError(f"unsupported op {self.op!r}; one of {sorted(_OPS)}")
        return self

    def column(self) -> Column:
        lhs = F.col(self.attr)
        if isinstance(self.by, FilterWhereLambda) or self.where:
            attr = self.by.attr if isinstance(self.by, FilterWhereLambda) else self.where
            rhs: Any = F.col(attr)
        elif isinstance(self.by, FilterWhen):
            rhs = F.lit(self.by.when).cast("timestamp")
        elif isinstance(self.value, datetime.datetime):
            rhs = F.lit(self.value).cast("timestamp")
        else:
            rhs = F.lit(self.value)
        return _OPS[self.op](lhs, rhs)


class Query(BaseModel):
    """Conjunction of filters (reference `utils/web/query.py:11-17`)."""

    filters: List[Filter] = []

    def column(self) -> Optional[Column]:
        if not self.filters:
            return None
        return reduce(lambda a, b: a & b, (f.column() for f in self.filters))


def _known_attrs(df: DataFrame) -> set:
    """Top-level and one-level-dotted attribute names of a DataFrame."""
    out = set()
    for field in df.schema.fields:
        out.add(field.name)
        dt = field.dataType
        if dt.typeName() == "struct":
            for sub in dt.fields:  # type: ignore[attr-defined]
                out.add(f"{field.name}.{sub.name}")
    return out


def compile_filter(flt: Filter, df: Optional[DataFrame] = None) -> Optional[Column]:
    """Compile one Filter; unknown attrs warn and drop the clause,
    matching reference `state.py:318-332`."""
    if df is not None:
        known = _known_attrs(df)
        for attr in filter(None, [flt.attr, flt.where, getattr(flt.by, "attr", None)]):
            if attr not in known:
                log.warning("Filter attribute %r not in schema; dropping clause", attr)
                return None
    return flt.column()


def compile_query(query: Query, df: Optional[DataFrame] = None) -> Optional[Column]:
    cols = [c for f in query.filters if (c := compile_filter(f, df)) is not None]
    if not cols:
        return None
    return reduce(lambda a, b: a & b, cols)


def apply_query(df: DataFrame, query: Optional[Query]) -> DataFrame:
    if query is None:
        return df
    cond = compile_query(query, df)
    return df.filter(cond) if cond is not None else df
