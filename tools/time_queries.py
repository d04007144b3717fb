"""Time named queries with the bench methodology (noop sink, warm
pass then min-of-N timed runs) — the per-change measurement loop of
the optimization round without paying a full 359-query bench.

Usage: [N_RUNS=3] python tools/time_queries.py <sf_dir> <query> [query ...]
Prints one line per query: name, runs, min/median.
"""

from __future__ import annotations

import os
import sys
import time

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, ROOT)


def main() -> None:
    sf_dir = sys.argv[1]
    names = sys.argv[2:]
    n_runs = int(os.environ.get("N_RUNS", "3"))

    import gc

    import __spark_entry__ as entry
    from csp_gateway_spark.session import get_spark, load_tables

    spark = get_spark("time-queries")
    spark.sparkContext.setLogLevel("ERROR")
    for df in load_tables(spark, sf_dir).values():
        df.limit(1).count()
    qs = entry.queries()

    def cleanup():
        gc.collect()
        try:
            spark.sparkContext._jvm.System.gc()
        except Exception:  # noqa: BLE001
            pass

    for name in names:
        fn = qs.get(name)
        if fn is None:
            print(f"{name}: NOT FOUND")
            continue
        spark.sparkContext.setJobDescription(f"time:{name}")
        # warm (codegen/JIT)
        try:
            fn(spark, sf_dir).write.format("noop").mode("overwrite").save()
        except Exception as e:  # noqa: BLE001
            print(f"{name}: ERROR {e}")
            continue
        runs = []
        for _ in range(n_runs):
            cleanup()
            t0 = time.time()
            fn(spark, sf_dir).write.format("noop").mode("overwrite").save()
            runs.append(round(time.time() - t0, 3))
        runs_s = sorted(runs)
        print(
            f"{name}: min={runs_s[0]:.3f} med={runs_s[len(runs_s)//2]:.3f} "
            f"runs={runs}"
        )


if __name__ == "__main__":
    main()
