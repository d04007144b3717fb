"""Capture .explain("formatted") output for named queries into
plans/<round>/<query>_<tag>.txt (round from $SPARK_GRAFT_PLANS_ROUND, default r15) — the before/after evidence files the
optimization round commits alongside code changes.

Usage: python tools/capture_plans.py <tag> <query> [query ...]
       python tools/capture_plans.py before wasserstein jonckheere
"""

from __future__ import annotations

import os
import sys

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, ROOT)


def main() -> None:
    tag = sys.argv[1]
    names = sys.argv[2:]
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")

    import __spark_entry__ as entry
    from csp_gateway_spark.session import get_spark, load_tables

    spark = get_spark("capture-plans")
    spark.sparkContext.setLogLevel("ERROR")
    load_tables(spark, sf_dir)
    qs = entry.queries()
    out_dir = os.path.join(
        ROOT, "plans", os.environ.get("SPARK_GRAFT_PLANS_ROUND", "r15")
    )
    os.makedirs(out_dir, exist_ok=True)
    for name in names:
        fn = qs.get(name)
        if fn is None:
            print(f"skip {name}: not in queries()", file=sys.stderr)
            continue
        try:
            df = fn(spark, sf_dir)
            txt = df._sc._jvm.PythonSQLUtils.explainString(
                df._jdf.queryExecution(), "formatted"
            )
        except Exception as e:  # noqa: BLE001
            txt = f"ERROR building plan: {e}"
        path = os.path.join(out_dir, f"{name}_{tag}.txt")
        with open(path, "w") as f:
            f.write(txt)
        print(f"wrote {path} ({len(txt)} chars)")


if __name__ == "__main__":
    main()
