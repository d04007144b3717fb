"""8-vs-32-core scaling probe at a SF where parallelism is visible
(VERDICT r14 #6): at sf0.1 every query is scheduler-floor-bound
(median c8/c32 ratio 1.01), so the driver's low-core run cannot
distinguish serial plans from parallel ones.  This tool times a heavy
subset against the 16x-replicated dir (built by tools/scaling.py) at
the CURRENT session core count; run it twice —

    SPARK_GRAFT_CPUS=32 python tools/core_ratio.py
    SPARK_GRAFT_CPUS=8  python tools/core_ratio.py

— and compare: scan/shuffle-heavy plans should approach the 4× core
ratio; ≈1× rows are either fixed-floor (trigger/action-bound) or a
serialization defect to root-cause.  Prints one JSON line per query
and a summary line; warm pass first (steady state, like bench.py).

Usage: [N=<count>] python tools/core_ratio.py [scaled_dir]
"""

from __future__ import annotations

import json
import os
import sys
import time

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, ROOT)

#: heavy, scan/shuffle-bound picks from SCALING.md's 16x column —
#: tokenize/shingle/minhash, rank cumulatives, joins, vector math
HEAVY20 = [
    "bloom_decontaminate",
    "embedding_neardup_lsh",
    "substring_spans",
    "decontaminate",
    "dedup_minhash_pairs",
    "adamic_adar",
    "minhash_signature",
    "sole_returned_supplier",
    "char_entropy",
    "text_stats",
    "vocab_encode",
    "window_session",
    "spearman_corr",
    "kruskal_wallis",
    "lm_perplexity",
    "repetition_stats",
    "tfidf",
    "line_dedup",
    "parts_supplier_counts",
    "pricing_summary",
]


def main() -> None:
    import gc

    import __spark_entry__ as entry
    from csp_gateway_spark.session import get_spark, load_tables

    d = sys.argv[1] if len(sys.argv) > 1 else os.path.join(
        os.environ.get("TMPDIR", "/tmp"), "spark_graft_scale_16x"
    )
    if not os.path.exists(os.path.join(d, "documents.parquet")):
        print(f"scaled dir missing: {d} — build it with tools/scaling.py 16", file=sys.stderr)
        sys.exit(1)
    spark = get_spark("core-ratio")
    spark.sparkContext.setLogLevel("ERROR")
    cpus = spark.sparkContext.defaultParallelism
    for df in load_tables(spark, d).values():
        df.limit(1).count()
    qs = entry.queries()
    names = HEAVY20[: int(os.environ.get("N", len(HEAVY20)))]

    def cleanup():
        gc.collect()
        try:
            spark.sparkContext._jvm.System.gc()
        except Exception:  # noqa: BLE001
            pass

    out: dict[str, float] = {}
    for timed in (False, True):
        entry.reset_shared()
        for qi, name in enumerate(names):
            if qi % 10 == 0:
                cleanup()
            t0 = time.time()
            try:
                qs[name](spark, d).write.format("noop").mode("overwrite").save()
                if timed:
                    out[name] = round(time.time() - t0, 2)
            except Exception as e:  # noqa: BLE001
                print(f"error {name}: {e}", file=sys.stderr)
                if timed:
                    out[name] = -1.0
    print(json.dumps({"cpus": cpus, "dir": d, "queries": out}))


if __name__ == "__main__":
    main()
