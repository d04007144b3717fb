"""Generated (NOT replicated) scale point: build a fresh 10x corpus and
measure the heavy family against it.

tools/scaling.py replicates sf0.1 rows with id offsets and per-replica
text mutation.  That methodology *densifies keys*: replicated documents
share their clones' fingerprints/shingles, which flatters self-join
queries (a 16x-flat `fingerprint_pairs` row can coexist with a
quadratic-in-bucket risk on real boilerplate).  This tool closes that
caveat: `documents`, `orders` and `lineitem` are GENERATED at 10x sf0.1
volume with genuinely fresh keyspaces — every doc is a new random token
sequence over the same vocabulary (so k-gram/shingle/fingerprint keys
GROW with the corpus instead of repeating), every order/line gets fresh
keys, prices and dates from seeded hash expressions.  The remaining
tables are copied from sf0.1 (the measured family does not read them).

Everything is hash-driven and Spark-side (xxhash64 of (id, field, SEED)
— deterministic, no RNG, no driver loops), so the same command always
builds the same corpus.

Usage:
    python tools/gen_scale.py            # build (if absent) + measure
    python tools/gen_scale.py --rebuild  # force rebuild
    python tools/gen_scale.py --write    # append results to SCALING.md
"""

from __future__ import annotations

import os
import shutil
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SEED = 42
BASE = "/root/testdata/sf0.1"
OUT = os.environ.get("SPARK_GRAFT_GEN_DIR", "/dev/shm/spark_graft_gen10x")
FACTOR = 10

# the family SCALING.md's replication caveat is about: self-join /
# pair-key queries (fingerprints, minhash, shingle blocking) plus the
# rank/survival family the round-10 review called out
HEAVY_GEN = [
    "doc_fingerprints",
    "fingerprint_pairs",
    "dedup_minhash_pairs",
    "ngram_novelty",
    "dup_cluster_stats",
    "containment_pairs",
    "spearman_corr",
    "mann_whitney",
    "ks_test",
    "ntile_histogram",
    "kaplan_meier",
    "nelson_aalen",
    "rmst",
]

COPY_TABLES = [
    "region", "nation", "customer", "supplier", "part", "events",
    "embeddings",
]


def _h(*cols):
    from pyspark.sql import functions as F

    return F.abs(F.xxhash64(*cols, F.lit(SEED)))


def build(spark) -> None:
    from pyspark.sql import functions as F

    os.makedirs(OUT, exist_ok=True)
    for t in COPY_TABLES:
        src, dst = f"{BASE}/{t}.parquet", f"{OUT}/{t}.parquet"
        if os.path.isdir(src):
            shutil.copytree(src, dst, dirs_exist_ok=True)
        else:
            shutil.copy2(src, dst)

    # ---- documents: fresh token sequences over the sf0.1 vocabulary --
    base_docs = spark.read.parquet(f"{BASE}/documents.parquet")
    n_docs = base_docs.count() * FACTOR
    vocab = sorted(
        r[0]
        for r in base_docs.select(
            F.explode(F.split(F.lower("text"), r"\s+")).alias("t")
        ).distinct().collect()
    )
    langs = [r[0] for r in base_docs.select("lang").distinct().orderBy("lang").collect()]
    n_src = base_docs.select("source").distinct().count()
    v_arr = F.array(*[F.lit(w) for w in vocab])
    docs = spark.range(n_docs).select(F.col("id").alias("doc_id"))
    n_toks = (_h(F.col("doc_id"), F.lit("len")) % 91 + 10).cast("int")  # 10..100
    text = F.concat_ws(
        " ",
        F.transform(
            F.sequence(F.lit(1), n_toks),
            lambda j: F.element_at(
                v_arr, (_h(F.col("doc_id"), j) % len(vocab) + 1).cast("int")
            ),
        ),
    )
    docs = docs.select(
        "doc_id",
        text.alias("text"),
        F.element_at(
            F.array(*[F.lit(l) for l in langs]),
            (_h(F.col("doc_id"), F.lit("lang")) % len(langs) + 1).cast("int"),
        ).alias("lang"),
        F.concat(F.lit("src"), (_h(F.col("doc_id"), F.lit("src")) % n_src)).alias(
            "source"
        ),
    ).withColumn("n_chars", F.length("text"))
    docs.repartition(32).write.mode("overwrite").parquet(f"{OUT}/documents.parquet")

    # ---- orders / lineitem: fresh keys, prices, dates ----------------
    n_orders = spark.read.parquet(f"{BASE}/orders.parquet").count() * FACTOR
    n_lines = spark.read.parquet(f"{BASE}/lineitem.parquet").count() * FACTOR
    okey = F.col("id") + 1
    # o_orderdate deterministic from the key so lineitem derives it
    # WITHOUT a join: date 1992-01-01 + h(okey) % 2400 days
    odate_days = (_h(okey, F.lit("odate")) % 2400).cast("int")
    orders = spark.range(n_orders).select(
        okey.alias("o_orderkey"), odate_days.alias("_od")
    ).select(
        "o_orderkey",
        (_h(F.col("o_orderkey"), F.lit("cust")) % (n_orders // 10) + 1).alias("o_custkey"),
        F.element_at(
            F.array(F.lit("O"), F.lit("F"), F.lit("P")),
            (_h(F.col("o_orderkey"), F.lit("ostat")) % 3 + 1).cast("int"),
        ).alias("o_orderstatus"),
        F.round(
            (_h(F.col("o_orderkey"), F.lit("tot")) % 50_000_000).cast("double") / 100.0
            + 900.0,
            2,
        ).alias("o_totalprice"),
        F.expr("CAST(date_add(DATE'1992-01-01', _od) AS TIMESTAMP_NTZ)").alias(
            "o_orderdate"
        ),
        F.element_at(
            F.array(*[F.lit(p) for p in ("1-URGENT", "2-HIGH", "3-MEDIUM", "4-NOT SPECIFIED", "5-LOW")]),
            (_h(F.col("o_orderkey"), F.lit("pri")) % 5 + 1).cast("int"),
        ).alias("o_orderpriority"),
    )
    orders.repartition(32).write.mode("overwrite").parquet(f"{OUT}/orders.parquet")

    lkey = (_h(F.col("id"), F.lit("lok")) % n_orders + 1).alias("l_orderkey")
    li = spark.range(n_lines).select(
        lkey,
        (_h(F.col("id"), F.lit("part")) % 20_000 + 1).alias("l_partkey"),
        (_h(F.col("id"), F.lit("supp")) % 1_000 + 1).alias("l_suppkey"),
        (F.col("id") % 7 + 1).cast("int").alias("l_linenumber"),
        (_h(F.col("id"), F.lit("qty")) % 50 + 1).cast("double").alias("l_quantity"),
        F.round(
            (_h(F.col("id"), F.lit("px")) % 10_409_923).cast("double") / 100.0 + 900.0,
            2,
        ).alias("l_extendedprice"),
        F.round((_h(F.col("id"), F.lit("disc")) % 11).cast("double") / 100.0, 2).alias(
            "l_discount"
        ),
        F.round((_h(F.col("id"), F.lit("tax")) % 9).cast("double") / 100.0, 2).alias(
            "l_tax"
        ),
        F.element_at(
            F.array(F.lit("R"), F.lit("A"), F.lit("N")),
            (_h(F.col("id"), F.lit("rf")) % 3 + 1).cast("int"),
        ).alias("l_returnflag"),
        F.element_at(
            F.array(F.lit("O"), F.lit("F")),
            (_h(F.col("id"), F.lit("ls")) % 2 + 1).cast("int"),
        ).alias("l_linestatus"),
        # shipdate = the order's deterministic date + 1..120 days
        (
            (_h(lkey, F.lit("odate")) % 2400).cast("int")
            + (_h(F.col("id"), F.lit("ship")) % 120 + 1).cast("int")
        ).alias("_sd"),
    ).select(
        "l_orderkey", "l_partkey", "l_suppkey", "l_linenumber", "l_quantity",
        "l_extendedprice", "l_discount", "l_tax", "l_returnflag", "l_linestatus",
        F.expr("CAST(date_add(DATE'1992-01-01', _sd) AS TIMESTAMP_NTZ)").alias(
            "l_shipdate"
        ),
    )
    li.repartition(32).write.mode("overwrite").parquet(f"{OUT}/lineitem.parquet")


def measure(spark) -> dict:
    import __spark_entry__ as entry

    qs = entry.queries()
    out: dict[str, dict[str, float]] = {}
    for label, d in (("sf0.1", BASE), (f"gen{FACTOR}x", OUT)):
        row: dict[str, float] = {}
        for timed in (False, True):
            for name in HEAVY_GEN:
                t0 = time.time()
                qs[name](spark, d).write.format("noop").mode("overwrite").save()
                if timed:
                    row[name] = round(time.time() - t0, 2)
        out[label] = row
        print(label + ": " + " ".join(f"{k}={v:.2f}s" for k, v in row.items()))
    return out


def main() -> int:
    from csp_gateway_spark.session import get_spark

    spark = get_spark("gen_scale")
    spark.sparkContext.setLogLevel("ERROR")
    if "--rebuild" in sys.argv and os.path.isdir(OUT):
        shutil.rmtree(OUT)
    if not os.path.exists(os.path.join(OUT, "lineitem.parquet")):
        print(f"building generated {FACTOR}x corpus at {OUT} ...")
        t0 = time.time()
        build(spark)
        print(f"built in {time.time() - t0:.1f}s")
    res = measure(spark)
    base, gen = res["sf0.1"], res[f"gen{FACTOR}x"]
    lines = [
        "",
        f"## Generated {FACTOR}× (fresh keyspace — tools/gen_scale.py)",
        "",
        "Unlike the replication harness above, this corpus is GENERATED:",
        f"{FACTOR}× documents are new random token sequences over the same",
        f"vocabulary (fingerprint/shingle keyspaces grow), {FACTOR}× orders/",
        "lineitem carry fresh keys/prices/dates. Ratios ≈ linear (≤ "
        f"{FACTOR}×) confirm the self-join family holds without the",
        "replication caveat.",
        "",
        "| query | sf0.1 s | gen10x s | ratio |",
        "|---|---|---|---|",
    ]
    for name in HEAVY_GEN:
        r = gen[name] / base[name] if base[name] > 0 else float("nan")
        lines.append(f"| {name} | {base[name]:.2f} | {gen[name]:.2f} | {r:.1f}× |")
    lines += [
        "",
        "The survival trio can run FASTER at 10×: its cost is",
        "step-table-bound (the 6M-row collapse is the memoized shared",
        "checkpoint), and the generated duration domain is ≤121 distinct",
        "values (shipdate = orderdate + 1..120 days by construction).",
        "`doc_fingerprints` is flat by design (bounded doc_id<100 probe).",
    ]
    report = "\n".join(lines) + "\n"
    print(report)
    if "--write" in sys.argv:
        path = os.path.join(
            os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "SCALING.md"
        )
        cur = open(path).read()
        marker = "## Generated "
        if marker in cur:
            cur = cur[: cur.index(marker)].rstrip() + "\n"
        open(path, "w").write(cur + report)
        print("appended to SCALING.md")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
