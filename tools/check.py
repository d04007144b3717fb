"""Local replica of the driver's correctness gate.

Runs each ``__spark_entry__.queries()`` entry on Spark and its
``oracle_sql()`` on DuckDB over the same parquet dir, then compares
row count, column-name set, and order-insensitive values (columns
sorted by name, rows sorted).  Exact match required — floats are
compared exactly first and with tolerance reported on mismatch so we
can see whether a failure is semantic or numeric.

Usage: python tools/check.py [sf_dir] [query_name ...]
"""

from __future__ import annotations

import os
import sys
import time

import duckdb
import pandas as pd

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

TABLES = (
    "region nation customer supplier part orders lineitem events documents embeddings"
).split()


def duck_connect(sf_dir: str):
    con = duckdb.connect()
    # pin the memory budget and give blocking operators a spill path:
    # DuckDB's autodetected limit varies inside sandboxes (observed
    # std::bad_alloc at ~7 GB RSS with >100 GB free), and an in-memory
    # instance cannot spill without an explicit temp_directory
    import tempfile

    con.execute("SET memory_limit='24GB'")
    con.execute(
        f"SET temp_directory='{tempfile.gettempdir()}/duckdb_oracle_spill'"
    )
    for t in TABLES:
        path = os.path.join(sf_dir, f"{t}.parquet")
        if os.path.exists(path):
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{path}')")
    return con


def normalize(df: pd.DataFrame) -> pd.DataFrame:
    df = df[sorted(df.columns)].copy()
    for c in df.columns:
        if str(df[c].dtype).startswith("datetime64"):
            df[c] = df[c].astype("datetime64[us]")
        if df[c].dtype == object:
            df[c] = df[c].apply(lambda v: tuple(v) if isinstance(v, (list, tuple)) or hasattr(v, "tolist") and not isinstance(v, (str, bytes)) else v)
    return df.sort_values(by=list(df.columns), ignore_index=True)


def compare(name: str, spark_pdf: pd.DataFrame, duck_pdf: pd.DataFrame) -> bool:
    ok = True
    if len(spark_pdf) != len(duck_pdf):
        print(f"  [{name}] ROWCOUNT mismatch: spark={len(spark_pdf)} duck={len(duck_pdf)}")
        ok = False
    sc, dc = sorted(spark_pdf.columns), sorted(duck_pdf.columns)
    if sc != dc:
        print(f"  [{name}] SCHEMA mismatch: spark={sc} duck={dc}")
        return False
    if not ok:
        return False
    s, d = normalize(spark_pdf), normalize(duck_pdf)
    for c in s.columns:
        sv, dv = s[c], d[c]
        try:
            if pd.api.types.is_float_dtype(sv) or pd.api.types.is_float_dtype(dv):
                sv = pd.to_numeric(sv, errors="coerce").astype(float)
                dv = pd.to_numeric(dv, errors="coerce").astype(float)
                if not ((sv.isna() == dv.isna()).all() and (abs(sv.fillna(0) - dv.fillna(0)) <= 0).all()):
                    import numpy as np

                    diff = float(abs(sv.fillna(0) - dv.fillna(0)).max())
                    print(f"  [{name}] VALUE mismatch col={c} max_abs_diff={diff}")
                    ok = False
            else:
                seq = sv.astype(str).values
                deq = dv.astype(str).values
                if not (seq == deq).all():
                    bad = [(a, b) for a, b in zip(seq, deq) if a != b][:3]
                    print(f"  [{name}] VALUE mismatch col={c} e.g. {bad}")
                    ok = False
        except Exception as e:  # noqa: BLE001
            print(f"  [{name}] compare error col={c}: {e}")
            ok = False
    # Driver-hash proxy: the driver stringifies values before hashing, so
    # representation drift (Decimal('1.20') vs float 1.2) fails its gate even
    # when values are numerically exact.  Require exact stringified equality.
    if ok:
        for c in s.columns:
            seq = s[c].astype(str).values
            deq = d[c].astype(str).values
            if not (seq == deq).all():
                bad = [(a, b) for a, b in zip(seq, deq) if a != b][:3]
                print(f"  [{name}] STR-RENDER mismatch col={c} e.g. {bad}")
                ok = False
    return ok


def main():
    sf_dir = sys.argv[1] if len(sys.argv) > 1 and os.path.isdir(sys.argv[1]) else "/root/testdata/sf0.01"
    only = set(a for a in sys.argv[1:] if not os.path.isdir(a))

    import __spark_entry__ as entry_mod
    from csp_gateway_spark.session import get_spark, load_tables

    spark = get_spark("check")
    load_tables(spark, sf_dir)
    con = duck_connect(sf_dir)

    queries = entry_mod.queries()
    oracles = entry_mod.oracle_sql()
    passed = failed = skipped = 0
    for name, fn in queries.items():
        if only and name not in only:
            continue
        t0 = time.time()
        try:
            sdf = fn(spark, sf_dir).toPandas()
        except Exception as e:  # noqa: BLE001
            print(f"  [{name}] SPARK ERROR: {e}")
            failed += 1
            continue
        sql = oracles.get(name)
        if sql is None:
            print(f"~ {name}: no oracle (rows-only) rows={len(sdf)} [{time.time()-t0:.1f}s]")
            skipped += 1
            continue
        try:
            ddf = con.execute(sql).fetchdf()
        except Exception as e:  # noqa: BLE001
            print(f"  [{name}] DUCKDB ERROR: {e}")
            failed += 1
            continue
        if compare(name, sdf, ddf):
            print(f"✓ {name}: rows={len(sdf)} [{time.time()-t0:.1f}s]")
            passed += 1
        else:
            failed += 1
    print(f"\npassed={passed} failed={failed} rows_only={skipped}")
    return 1 if failed else 0


if __name__ == "__main__":
    sys.exit(main())
