"""Scaling experiment: replicate the sf0.1 tables Nx (with id offsets)
into a temp dir shaped like a driver sf dir, run the heavy queries at
each scale, and report seconds + sec/row — linearity is the evidence
that the plans hold as data grows (the local[32] proxy for the
1000-executor question).

Usage: python tools/scaling.py [factor ...]   (default: 1 2 4)
Writes SCALING.md with the measured table when --write is passed.
"""

from __future__ import annotations

import os
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

HEAVY = [
    "kruskal_wallis",
    "logrank_test",
    "spearman_corr",
    "adamic_adar",
    "runs_test",
    "state_keyed_last",
    "window_session",
    "minhash_signature",
    "dedup_minhash_pairs",
    "text_stats",
    "doc_fingerprints",
    "tfidf",
    "pricing_summary",
    "local_supplier_volume",
    "sole_returned_supplier",
    "embedding_neardup_lsh",
    "decontaminate",
    "line_dedup",
    "hypertable_rollup",
    "approx_distinct",
    "repetition_stats",
    "sequence_pack",
    "min_cost_supplier",
    "parts_supplier_counts",
    "char_entropy",
    "vocab_encode",
    "kmeans_refine",
    "lm_perplexity",
    "semantic_dedup",
    "table_index_limit",
    "cms_topk",
    "bloom_decontaminate",
    "embedding_pca",
    "bpe_train",
    "substring_spans",
    "length_quantiles",
    "bm25_topk",
    "source_drift",
    "gopher_quality",
    "url_dedup",
    "market_basket",
    "triangle_count",
    "hybrid_search",
    "gap_fill",
    "rolling_value",
    "scd2",
    "retention",
    "pareto_revenue",
    "winsorize_prices",
    "profile_table",
    # round-6: graph/pair family + the re-planned grouped quantile
    "label_propagation",
    "source_overlap",
    "dup_cluster_stats",
    "lsh_eval",
    "grouped_weighted_median",
    "weighted_median",
    "exact_quantiles",
    "rfm_segments",
    # round-7/8: pair/curation/survival family
    "containment_pairs",
    "boilerplate_ngrams",
    "ntile_histogram",
    "active_orders",
    "kaplan_meier",
    # round-9 wave-21 family
    "roc_auc",
    "attribution",
    "rouge_overlap",
    "quantile_normalize",
    "retrieval_metrics",
    # round-9 waves 22-25
    "stl_decompose",
    "pacf",
    "identity_stitch",
    "mmr_rerank",
    "t_closeness",
    # round-10: handoff gate + re-planned rank/fingerprint family
    "replay_handoff",
    "fingerprint_pairs",
    "mann_whitney",
    "nelson_aalen",
    "rmst",
    "kcenter_sample",
    # round-11: new operators + the re-planned fingerprint/rank family
    "mann_kendall",
    "token_coverage",
    "semantic_decontaminate",
    "pettitt_test",
    "levene_test",
    "dedup_threshold_sweep",
    # round-11 waves 23-26: concordance/shape/resampling/graph/diversity
    "kendall_tau",
    "cvm_test",
    "hits_scores",
    "distinct_ngrams",
    "hodges_lehmann",
    "bootstrap_mean_ci",
    "signflip_test",
    "wasserstein",
    "clustering_coeff",
    "assortativity",
    "durbin_watson",
    "friedman_test",
    # round-14 wave 31
    "jonckheere",
    "cochran_armitage",
    "mattr_diversity",
    # round-14 wave 32
    "ordinal_assoc",
    "dickey_fuller",
    "hurst_rs",
    "anderson_darling",
    # round-14 wave 33
    "quade_test",
    "variance_ratio",
    "granger_lag1",
    "engle_granger",
    # round-14 wave 34
    "deming_fit",
    "bland_altman",
    "optimal_cutoff",
    "lift_table",
]

TABLES = [
    "region", "nation", "customer", "supplier", "part", "orders",
    "lineitem", "events", "documents", "embeddings",
]

ID_COLS = {"documents": "doc_id", "events": "event_id", "embeddings": "vec_id"}

#: true metadata dims: NOT replicated (a 16x-replicated nation would
#: fan every customer⋈nation row out 16x — a many-to-many join blowup
#: manufactured by the harness, not the plan; VERDICT r12 #2)
DIM_TABLES = {"region", "nation"}


def _tpch_offsets(spark, base_dir: str) -> dict:
    """Per-table {col: per-replica offset} for the TPC-H join keys.
    Offsetting BOTH sides of every fact-fact key (custkey, suppkey,
    partkey, orderkey) by the same per-replica stride keeps each join
    1:1 across replicas — replica i's orders only ever match replica
    i's customers.  Dim foreign keys (nationkey/regionkey) stay in the
    original domain, matching the un-replicated dims."""
    from pyspark.sql import functions as F

    mx = {}
    for t, col in (
        ("customer", "c_custkey"),
        ("supplier", "s_suppkey"),
        ("part", "p_partkey"),
        ("orders", "o_orderkey"),
    ):
        mx[col] = int(
            spark.read.parquet(f"{base_dir}/{t}.parquet").agg(F.max(col)).collect()[0][0]
        )
    return {
        "customer": {"c_custkey": mx["c_custkey"]},
        "supplier": {"s_suppkey": mx["s_suppkey"]},
        "part": {"p_partkey": mx["p_partkey"]},
        "orders": {
            "o_orderkey": mx["o_orderkey"],
            "o_custkey": mx["c_custkey"],
        },
        "lineitem": {
            "l_orderkey": mx["o_orderkey"],
            "l_suppkey": mx["s_suppkey"],
            "l_partkey": mx["p_partkey"],
        },
    }


def build_scaled(spark, base_dir: str, out_dir: str, factor: int) -> None:
    from pyspark.sql import functions as F

    os.makedirs(out_dir, exist_ok=True)
    offsets = _tpch_offsets(spark, base_dir) if factor > 1 else {}
    for t in TABLES:
        src = f"{base_dir}/{t}.parquet"
        df = spark.read.parquet(src)
        idc = ID_COLS.get(t)
        if factor == 1 or t in DIM_TABLES:
            # metadata dims keep ONE copy: per-dim-key row counts grow
            # with the facts, join fan-out stays 1:1
            out = df
        elif t in offsets:
            # TPC-H facts: replicate with ALL join keys offset per
            # replica so fact-fact joins stay 1:1 (previously only
            # id-carrying tables were offset — orders⋈customer on
            # un-offset o_custkey became a factor×factor many-to-many
            # fan-out, ≈256x rows at 16x, by construction)
            out = df
            for i in range(1, factor):
                rep = df
                for col, stride in offsets[t].items():
                    rep = rep.withColumn(col, F.col(col) + F.lit(i * stride))
                out = out.unionByName(rep)
        else:
            n = df.count()
            out = df
            for i in range(1, factor):
                rep = df.withColumn(idc, F.col(idc) + F.lit(i * n))
                if t == "documents":
                    # mutate replica text (full-alphabet Caesar shift,
                    # DISTINCT per replica): verbatim copies would make
                    # every doc a true duplicate, and dedup cost would
                    # legitimately scale with dup count, not corpus
                    # size.  The earlier 5-vowel rotation CYCLED at
                    # replica 5, so 8x/16x runs re-created verbatim
                    # replica classes and candidate pairs grew ~N²/5 by
                    # data construction (measured 27x at 16x); a shift
                    # of i over 26 letters never repeats below 26
                    # replicas, keeping the corpus dup-sparse at every
                    # measured factor.
                    alpha = "abcdefghijklmnopqrstuvwxyz"
                    s = i % 25 + 1
                    rep = rep.withColumn(
                        "text",
                        F.translate(F.col("text"), alpha, alpha[s:] + alpha[:s]),
                    )
                out = out.unionByName(rep)
        out.write.mode("overwrite").parquet(f"{out_dir}/{t}.parquet")


def _cleanup(spark) -> None:
    """Periodic block-manager GC between queries — the bench.py fix
    (commit ae6fae6): eagerly localCheckpointed blocks accumulate
    faster than the weak-ref ContextCleaner reclaims them across
    hundreds of executions in one session, degrading LATE queries
    (measured 4.3 → 10.5 s over 18 back-to-back runs without it).
    The scaling harness runs ~660 executions per chain, so without
    this the 16x pass (always last) reads inflated — a harness
    artifact masquerading as a scale defect."""
    import gc

    gc.collect()
    try:
        spark.sparkContext._jvm.System.gc()
    except Exception:  # noqa: BLE001 — connect-mode or shim: skip
        pass


def _run_query(spark, qs, name: str, d: str, factor: int) -> None:
    """Run one heavy query against the scaled dir.  ``semantic_dedup``
    is operated as its docstring prescribes — n_clusters ∝ √n — because
    the gate query's FIXED 16 cells would make the within-cell pairwise
    stage grow quadratically by construction (cells hold factor× more
    vectors, pairs factor²×); scaling the cell count with the corpus is
    the operator's documented 100 TB operating point, and is what this
    harness is meant to measure."""
    if name == "semantic_dedup":
        import math

        from csp_gateway_spark.operators.similarity import semantic_dedup

        emb = spark.read.parquet(f"{d}/embeddings.parquet")
        k = max(16, int(16 * math.sqrt(factor)))
        semantic_dedup(emb, n_clusters=k, threshold=0.4, oracle_safe=True).write.format(
            "noop"
        ).mode("overwrite").save()
        return
    qs[name](spark, d).write.format("noop").mode("overwrite").save()


def hub_bench(spark, spokes=(100_000, 400_000), iters: int = 2) -> None:
    """Hub-skew micro-bench for label_propagation: a star graph (one
    hub, N spokes) concentrates the per-(dst,label) count on the hub
    node.  The plan's two-phase argmax keeps the hub's cost inside a
    map-side-combined GROUP (never a collected row), so time should
    grow ~linearly with N — a super-linear ratio would flag a
    skew-funnel."""
    from pyspark.sql import functions as F

    from csp_gateway_spark.operators.corpus import label_propagation

    out = []
    for n in spokes:
        edges = spark.range(1, n + 1).select(
            F.lit(0).alias("id_a"), F.col("id").alias("id_b")
        )
        seeds = spark.range(0, n + 1).select(
            F.col("id").alias("node"),
            (F.col("id") % 5).cast("string").alias("label"),
        )
        label_propagation(edges, seeds, iters=iters).write.format("noop").mode(
            "overwrite"
        ).save()  # warm
        t0 = time.time()
        label_propagation(edges, seeds, iters=iters).write.format("noop").mode(
            "overwrite"
        ).save()
        out.append((n, round(time.time() - t0, 2)))
    ratio = out[-1][1] / out[0][1] if out[0][1] > 0 else float("nan")
    scale = out[-1][0] / out[0][0]
    print(
        "hub_label_propagation: "
        + " ".join(f"{n}spokes={s:.2f}s" for n, s in out)
        + f" ratio={ratio:.1f}x over {scale:.0f}x spokes"
    )


def main() -> None:
    factors = [int(a) for a in sys.argv[1:] if a.isdigit()] or [1, 2, 4]
    only = None
    for a in sys.argv[1:]:
        if a.startswith("--only="):
            only = a.split("=", 1)[1].split(",")
    heavy = [n for n in HEAVY if only is None or n in only]
    import __spark_entry__ as entry

    from csp_gateway_spark.session import get_spark

    spark = get_spark("scaling")
    spark.sparkContext.setLogLevel("ERROR")
    if "--hub" in sys.argv:
        hub_bench(spark)
        if only is None and not factors:
            return
    base = "/root/testdata/sf0.1"
    qs = entry.queries()
    results: dict[int, dict[str, float]] = {}
    for factor in factors:
        d = os.path.join(tempfile.gettempdir(), f"spark_graft_scale_{factor}x")
        if not os.path.exists(os.path.join(d, "documents.parquet")):
            build_scaled(spark, base, d, factor)
        # warm pass then timed pass (steady-state, like bench.py)
        for timed in (False, True):
            row: dict[str, float] = {}
            for qi, name in enumerate(heavy):
                if qi % 20 == 0:
                    _cleanup(spark)
                t0 = time.time()
                _run_query(spark, qs, name, d, factor)
                row[name] = round(time.time() - t0, 2)
            if timed:
                results[factor] = row
        print(f"{factor}x: " + " ".join(f"{k}={v:.2f}s" for k, v in results[factor].items()))

    if "--write" in sys.argv:
        with open(os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "SCALING.md"), "w") as f:
            f.write(
                "# SCALING — measured sf0.1 × N replication (auto-generated by tools/scaling.py)\n\n"
                "Steady-state seconds per heavy query as the sf0.1 tables are\n"
                "replicated Nx.  EVERY join key is offset per replica (doc/event/\n"
                "vec ids AND the TPC-H custkey/suppkey/partkey/orderkey domains),\n"
                "so fact-fact joins stay 1:1 as data grows; region/nation keep\n"
                "ONE copy (replicating a dim would fan customer⋈nation out Nx by\n"
                "construction).  Keyspaces that repeat per replica (events\n"
                "user_id, documents source/lang) measure per-key VOLUME growth —\n"
                "the fresh-keyspace axis is the gen_scale section below.\n"
                "Near-linear growth = the plan's shuffle/agg structure holds as\n"
                "data scales; super-linear growth would flag a quadratic stage.\n\n"
                "| query | " + " | ".join(f"{n}x" for n in factors) + " | ratio {}/{}x |\n".format(factors[-1], factors[0])
            )
            f.write("|---|" + "---|" * (len(factors) + 1) + "\n")
            for name in heavy:
                vals = [results[n][name] for n in factors]
                ratio = vals[-1] / vals[0] if vals[0] > 0 else float("nan")
                f.write(f"| {name} | " + " | ".join(f"{v:.2f}" for v in vals) + f" | {ratio:.1f}× |\n")
            f.write(
                "\nNotes: `embedding_neardup_lsh` is measured at FIXED bucket\n"
                "bits (the gate's oracle inlines the hyperplanes), so per-bucket\n"
                "candidate pairs grow ~n²/2^bits — super-linear here by\n"
                "construction.  In production the caller scales `bits` with\n"
                "log2(n/target_bucket_rows), holding bucket size (and the per-\n"
                "bucket quadratic term) constant; the shuffle itself is linear.\n"
                "\n`dedup_minhash_pairs` (and `decontaminate`) inherit a second\n"
                "replication artifact: Nx replication copies each document\n"
                "verbatim (ids offset), so every replica pair IS a true\n"
                "near-duplicate — the candidate/verify set grows ~N² by data\n"
                "construction, not by plan defect.  On organically grown data\n"
                "candidates scale with the real near-dup rate; the signature\n"
                "and banding stages themselves are one linear shuffle each.\n"
                "\n`semantic_dedup` is measured at its documented operating\n"
                "point — n_clusters scaled ∝ √n (the gate query's fixed 16\n"
                "cells would grow the within-cell pairwise stage ~factor²).\n"
                "Replication still counts every replica pair as a true\n"
                "semantic dup (cos=1.0), the same artifact as the minhash row.\n"
            )
        print("wrote SCALING.md")




# --------------------------------------------------------------------------
# Extended replication (VERDICT r4 #4): push the heaviest distributed
# family to 8x/16x so the 100 TB claims rest on more than 4x evidence.
# Run AFTER the main table: python tools/scaling.py --extended 1 2 4 8 16
# --------------------------------------------------------------------------

EXTENDED = [
    "dedup_minhash_pairs",
    "dedup_incremental",
    "pagerank_docs",
    "market_basket",
    "profile_table",
    "semantic_dedup",
]

#: wave-31 family (VERDICT r13 #5): mattr's (doc,token) lag shuffle
#: and jonckheere's long-cumulative rank plan are exactly the shapes
#: the replication table certifies; cochran_armitage is a five-sum
#: single agg included for completeness.
WAVE31 = [
    "jonckheere",
    "cochran_armitage",
    "mattr_diversity",
]

#: wave-32 family (round 14): anderson's cells+harmonic cumulatives
#: and hurst's block windows are the new shapes; ordinal_assoc's cell
#: self-join and dickey_fuller's 1:1 lag join round out the table.
WAVE32 = [
    "ordinal_assoc",
    "dickey_fuller",
    "hurst_rs",
    "anderson_darling",
]

#: wave-33 family (round 14): quade's across-block range rank is the
#: data-growing axis; the other three are daily-collapse closed forms.
WAVE33 = [
    "quade_test",
    "variance_ratio",
    "granger_lag1",
    "engle_granger",
]

#: wave-34 family (round 14): deming/bland pay a real orders⋈lineitem
#: join per pass; cutoff/lift are rank-family shapes over documents.
WAVE34 = [
    "deming_fit",
    "bland_altman",
    "optimal_cutoff",
    "lift_table",
]

#: wave-35 family (round 14): breusch_pagan/chow/arch are
#: daily-collapse closed forms (the collapse scan is the growing
#: axis); kpss adds the global_row_number exact cumulative + ℓ
#: shifted-copy joins over the bounded day domain.
WAVE35 = [
    "breusch_pagan",
    "chow_test",
    "arch_lm",
    "kpss_test",
]

#: wave-37 family (round 14): the panel set — one per-group exact-sum
#: pass each; the group count (customers) grows with data, the
#: post-collapse aggregates are group-bounded.
WAVE37 = [
    "fe_within",
    "between_reg",
    "cluster_se",
]

#: wave-38 family (round 14): daily-collapse lag-join closed forms;
#: diebold_mariano adds the shifted-copy LRV joins over the bounded
#: day domain.
WAVE38 = [
    "diebold_mariano",
    "pesaran_timmermann",
    "theil_u2",
]

#: wave-39 family (round 14): keyword extraction — phrase explode +
#: word-stats shuffles (rake) and a bounded-vocabulary 2-iteration
#: power method (textrank); corpus scan is the growing axis.
WAVE39 = [
    "rake_keywords",
    "textrank_keywords",
]

#: wave-40 family (round 14): the exact-decimal rank-distance pair —
#: distinct-value collapse + four-column cumulative (energy) and the
#: squared-midrank moments (conover); collapse cardinality grows with
#: distinct prices.
WAVE40 = [
    "energy_distance",
    "conover_squared_ranks",
]

#: wave-41 family (round 14): robust estimation — yuen's collapse +
#: two-pass cut-value machinery and huber's three fact scans.
WAVE41 = [
    "yuen_trimmed_t",
    "huber_irls",
]

#: wave-36 family (round 14): the survival-regression set — the
#: orders⋈lineitem cohort scan grows with data, everything after the
#: (time,score) cell collapse is bounded by the quantized domains
#: (days × quantity), so the Newton iterations and the dense C-index
#: grid should be ~flat.
WAVE36 = [
    "cox_ph",
    "schoenfeld_trend",
    "harrell_c",
]


def extended_main(
    factors: list[int],
    names: list[str] | None = None,
    title: str = "Extended replication — heavy family at 8x/16x (auto-generated)",
    marker: str = "\n## Extended replication",
) -> None:
    import __spark_entry__ as entry

    from csp_gateway_spark.session import get_spark

    spark = get_spark("scaling")
    spark.sparkContext.setLogLevel("ERROR")
    base = "/root/testdata/sf0.1"
    qs = entry.queries()
    names = EXTENDED if names is None else names
    results: dict[int, dict[str, float]] = {}
    for factor in factors:
        d = os.path.join(tempfile.gettempdir(), f"spark_graft_scale_{factor}x")
        if not os.path.exists(os.path.join(d, "documents.parquet")):
            build_scaled(spark, base, d, factor)
        for timed in (False, True):
            if timed:
                # queries that share a memoized fit (`_shared`, e.g.
                # the cox_ph/schoenfeld pair) must PAY the fit inside
                # the timed pass — the warm pass exists for JIT/
                # codegen, not to hide the data-dependent stage the
                # replication table is measuring.  Within the timed
                # pass the second query still reuses the first's fit,
                # mirroring the gate's documented sharing.
                entry._SHARED_MEMO.clear()
            row: dict[str, float] = {}
            for qi, name in enumerate(names):
                if qi % 20 == 0:
                    _cleanup(spark)
                t0 = time.time()
                _run_query(spark, qs, name, d, factor)
                row[name] = round(time.time() - t0, 2)
            if timed:
                results[factor] = row
        print(f"{factor}x: " + " ".join(f"{k}={v:.2f}s" for k, v in results[factor].items()))

    path = os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "SCALING.md"
    )
    with open(path) as f:
        cur = f.read()
    # replace any existing copy of THIS section (idempotent re-runs);
    # sections live after the main auto-generated table, ordered by
    # first write, each delimited by its own "## <title>" marker
    if marker in cur:
        head, _, rest = cur.partition(marker)
        nxt = rest.find("\n## ", 1)
        cur = head.rstrip() + "\n" + (rest[nxt:] if nxt != -1 else "")
    cur = cur.rstrip() + "\n"
    lines = [
        "",
        f"## {title}",
        "",
        "| query | " + " | ".join(f"{n}x" for n in factors) + f" | ratio {factors[-1]}/{factors[0]}x |",
        "|---|" + "---|" * (len(factors) + 1),
    ]
    for name in names:
        vals = [results[n][name] for n in factors]
        ratio = vals[-1] / vals[0] if vals[0] > 0 else float("nan")
        lines.append(
            f"| {name} | " + " | ".join(f"{v:.2f}" for v in vals) + f" | {ratio:.1f}x |"
        )
    lines.append("")
    with open(path, "w") as f:
        f.write(cur + "\n".join(lines) + "\n")
    print(f"appended '{title.split(' —')[0]}' table to SCALING.md")


if __name__ == "__main__":
    if "--wave31" in sys.argv:
        extended_main(
            [int(a) for a in sys.argv[1:] if a.isdigit()] or [1, 4, 16],
            names=WAVE31,
            title="Wave-31 replication — jonckheere / cochran_armitage / mattr (auto-generated)",
            marker="\n## Wave-31 replication",
        )
    elif "--wave32" in sys.argv:
        extended_main(
            [int(a) for a in sys.argv[1:] if a.isdigit()] or [1, 8, 16],
            names=WAVE32,
            title="Wave-32 replication — ordinal_assoc / dickey_fuller / hurst / anderson (auto-generated)",
            marker="\n## Wave-32 replication",
        )
    elif "--wave33" in sys.argv:
        extended_main(
            [int(a) for a in sys.argv[1:] if a.isdigit()] or [1, 8, 16],
            names=WAVE33,
            title="Wave-33 replication — quade / variance_ratio / granger / engle_granger (auto-generated)",
            marker="\n## Wave-33 replication",
        )
    elif "--wave34" in sys.argv:
        extended_main(
            [int(a) for a in sys.argv[1:] if a.isdigit()] or [1, 8, 16],
            names=WAVE34,
            title="Wave-34 replication — deming / bland_altman / cutoff / lift (auto-generated)",
            marker="\n## Wave-34 replication",
        )
    elif "--wave35" in sys.argv:
        extended_main(
            [int(a) for a in sys.argv[1:] if a.isdigit()] or [1, 8, 16],
            names=WAVE35,
            title="Wave-35 replication — breusch_pagan / chow / arch_lm / kpss (auto-generated)",
            marker="\n## Wave-35 replication",
        )
    elif "--wave37" in sys.argv:
        extended_main(
            [int(a) for a in sys.argv[1:] if a.isdigit()] or [1, 8, 16],
            names=WAVE37,
            title="Wave-37 replication — fe_within / between_reg / cluster_se (auto-generated)",
            marker="\n## Wave-37 replication",
        )
    elif "--wave38" in sys.argv:
        extended_main(
            [int(a) for a in sys.argv[1:] if a.isdigit()] or [1, 8, 16],
            names=WAVE38,
            title="Wave-38 replication — diebold_mariano / pesaran_timmermann / theil_u2 (auto-generated)",
            marker="\n## Wave-38 replication",
        )
    elif "--wave39" in sys.argv:
        extended_main(
            [int(a) for a in sys.argv[1:] if a.isdigit()] or [1, 8, 16],
            names=WAVE39,
            title="Wave-39 replication — rake_keywords / textrank_keywords (auto-generated)",
            marker="\n## Wave-39 replication",
        )
    elif "--wave40" in sys.argv:
        extended_main(
            [int(a) for a in sys.argv[1:] if a.isdigit()] or [1, 8, 16],
            names=WAVE40,
            title="Wave-40 replication — energy_distance / conover_squared_ranks (auto-generated)",
            marker="\n## Wave-40 replication",
        )
    elif "--wave41" in sys.argv:
        extended_main(
            [int(a) for a in sys.argv[1:] if a.isdigit()] or [1, 8, 16],
            names=WAVE41,
            title="Wave-41 replication — yuen_trimmed_t / huber_irls (auto-generated)",
            marker="\n## Wave-41 replication",
        )
    elif "--wave36" in sys.argv:
        extended_main(
            [int(a) for a in sys.argv[1:] if a.isdigit()] or [1, 8, 16],
            names=WAVE36,
            title="Wave-36 replication — cox_ph / schoenfeld / harrell_c (auto-generated)",
            marker="\n## Wave-36 replication",
        )
    elif "--extended" in sys.argv:
        extended_main([int(a) for a in sys.argv[1:] if a.isdigit()] or [1, 2, 4, 8, 16])
    else:
        main()
