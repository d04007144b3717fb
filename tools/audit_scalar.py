"""Audit gate queries for non-scalar output columns.

The driver's correctness harness canonicalizes results through pandas
and crashes on array/map/struct cells (``TypeError: unhashable type:
'list'`` — see CORRECTNESS_r03 ``vocab_encode``).  Every ``queries()``
entry must therefore emit only scalar columns.  This builds each
query's plan at sf0.001 (schema only, no execution) and reports any
complex-typed column.

Usage: python tools/audit_scalar.py [sf_dir]
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import types as T  # noqa: E402


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
    import __spark_entry__ as entry
    from csp_gateway_spark.session import get_spark

    spark = get_spark()
    bad = []
    for name, fn in entry.queries().items():
        try:
            df = fn(spark, sf_dir)
        except Exception as exc:  # plan build itself failed
            print(f"[{name}] PLAN ERROR: {exc}")
            bad.append(name)
            continue
        complex_cols = [
            f.name
            for f in df.schema.fields
            if isinstance(f.dataType, (T.ArrayType, T.MapType, T.StructType))
        ]
        if complex_cols:
            print(f"[{name}] complex columns: {complex_cols}")
            bad.append(name)
    if bad:
        print(f"FAIL: {len(bad)} queries with non-scalar output: {bad}")
        return 1
    print(f"OK: all {len(entry.queries())} queries emit scalar columns only")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
