"""Time individual `_shared` builds in isolation (min-of-N after one
warm discard of the table cache): the r15 honest accounting makes the
builds part of the timed bench region, so the builds themselves are
now first-class optimization targets.

Usage: [N_RUNS=3] python tools/probe_builds.py <sf_dir> <build> [...]
where <build> is the `_shared` key name (e.g. cox_fit, dsir_weights).
"""

from __future__ import annotations

import os
import sys
import time

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, ROOT)

#: build key -> callable(entry, spark, sf_dir) that triggers it
BUILDERS = {
    "cox_fit": lambda e, s, d: e._cox_fit(s, d),
    "cox_cells": lambda e, s, d: e._cox_cells(s, d),
    "dsir_weights": lambda e, s, d: e._dsir_weight_table(s, d),
    "snp_edges": lambda e, s, d: e._snp_edges(s, d),
    "sh12": lambda e, s, d: e._sh12(s, d),
    "sh5": lambda e, s, d: e._sh5(s, d),
    "sh8_positioned": lambda e, s, d: e._sh8(s, d),
    "lrq_weights": lambda e, s, d: e._lrq_weights(s, d, *e._lrq_parts(s, d)[1:]),
    "li_moments4": lambda e, s, d: e._li_moments(s, d),
    "ra_price_cells15": lambda e, s, d: e._ra_price_cells(s, d),
    "mh_candidates": lambda e, s, d: e._mh_candidates(s, d),
    "mh_signatures16": lambda e, s, d: e._mh_signatures(s, d),
    "gram_counts3": lambda e, s, d: e._gram_counts3(s, d),
    "postings": lambda e, s, d: e._postings(s, d),
    "order_value_pair": lambda e, s, d: e._order_value_pair(s, d),
    "panel_cells": lambda e, s, d: e._panel_cells(s, d),
    "bigram_cells": lambda e, s, d: e._bigram_cells(s, d),
    "tok_counts": lambda e, s, d: e._tok_counts(s, d),
    "src_tok_counts": lambda e, s, d: e._src_tok_counts(s, d),
    "survival_steps": lambda e, s, d: e._survival_steps(s, d),
}


def main() -> None:
    sf_dir = sys.argv[1]
    names = sys.argv[2:]
    n_runs = int(os.environ.get("N_RUNS", "3"))

    import gc

    import __spark_entry__ as entry
    from csp_gateway_spark.session import get_spark, load_tables

    spark = get_spark("probe-builds")
    spark.sparkContext.setLogLevel("ERROR")
    for df in load_tables(spark, sf_dir).values():
        df.limit(1).count()

    def cleanup():
        gc.collect()
        try:
            spark.sparkContext._jvm.System.gc()
        except Exception:  # noqa: BLE001
            pass

    # canary: fixed-cost phase reference (see r14 playbook)
    qs = entry.queries()
    t0 = time.time()
    qs["cohen_kappa"](spark, sf_dir).write.format("noop").mode("overwrite").save()
    print(f"canary cohen_kappa: {time.time() - t0:.3f}s")

    for name in names:
        fn = BUILDERS.get(name)
        if fn is None:
            print(f"{name}: NOT IN BUILDERS")
            continue
        runs = []
        for _ in range(n_runs):
            entry.reset_shared()
            cleanup()
            spark.sparkContext.setJobDescription(f"build:{name}")
            t0 = time.time()
            fn(entry, spark, sf_dir)
            runs.append(time.time() - t0)
        runs.sort()
        print(
            f"{name}: min={runs[0]:.3f} med={runs[len(runs) // 2]:.3f} "
            f"(n={n_runs})"
        )


if __name__ == "__main__":
    main()
