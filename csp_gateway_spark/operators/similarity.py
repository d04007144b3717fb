"""Approximate-nearest-neighbor search over embedding columns.

Baseline: brute-force cosine top-k — a single scan + partial top-k per
partition (TakeOrdered), no shuffle of the full table.  Scale paths:
- ``lsh_bucket``: random-hyperplane signs → integer bucket; probe only
  matching buckets (candidate fraction ~ 2^-bits per probe).
- ``ivf_assign`` / ``ivf_search``: k-means-style inverted file — a
  small broadcast centroid table assigns each vector to a cell; search
  probes ``nprobe`` nearest cells.  Centroids are sampled
  deterministically (seeded) rather than trained, which is the
  standard bootstrap for IVF at ingest time.

All vector math is native (zip_with/aggregate → codegen).  For very
high dims a pandas-UDF (numpy dot over Arrow batches) drop-in exists:
``cosine_topk(..., use_pandas=True)``.
"""

from __future__ import annotations

import math
from typing import Optional, Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from csp_gateway_spark.operators.dedup import cosine


def _as_double(col: Column) -> Column:
    return col.cast("array<double>")


def cosine_topk(
    df: DataFrame,
    query_vec: Sequence[float],
    k: int = 10,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    use_pandas: bool = False,
) -> DataFrame:
    """Brute-force top-k by cosine similarity against one query vector.

    The literal query vector is inlined into the plan (broadcast by
    value); ordering is (cos DESC, id ASC) for determinism under ties.
    """
    q = F.array(*[F.lit(float(x)) for x in query_vec])
    if use_pandas:
        # Arrow-batched vectorized scoring (numpy matmul per batch) via
        # mapInPandas — the high-dim fast path.
        qn = [float(x) for x in query_vec]

        def score(batches):
            import numpy as np
            import pandas as pd

            qv = np.asarray(qn)
            qnorm = np.linalg.norm(qv)
            for pdf in batches:
                mat = np.stack(pdf["_v"].to_numpy())
                dots = mat @ qv
                cos = dots / (np.linalg.norm(mat, axis=1) * qnorm)
                yield pd.DataFrame({id_col: pdf[id_col], "cos": cos})

        scored = df.select(F.col(id_col), _as_double(F.col(vec_col)).alias("_v")).mapInPandas(
            score, schema=f"{id_col} long, cos double"
        )
    else:
        scored = df.select(F.col(id_col), cosine(_as_double(F.col(vec_col)), q).alias("cos"))
    return scored.orderBy(F.desc("cos"), F.asc(id_col)).limit(k)


def knn_join(
    left: DataFrame,
    right: DataFrame,
    k: int = 5,
    vec_col: str = "embedding",
    left_id: str = "vec_id",
    right_id: str = "vec_id",
    bucket_col: Optional[str] = None,
) -> DataFrame:
    """k nearest right-rows for every left-row (optionally blocked by
    ``bucket_col``).  Without blocking this is O(|L|·|R|) — use only
    after lsh_bucket/ivf_assign at scale."""
    from pyspark.sql.window import Window

    cond = F.lit(True) if bucket_col is None else (F.col(f"a.{bucket_col}") == F.col(f"b.{bucket_col}"))
    joined = (
        left.alias("a")
        .join(right.alias("b"), cond)
        .select(
            F.col(f"a.{left_id}").alias("qid"),
            F.col(f"b.{right_id}").alias("nid"),
            cosine(_as_double(F.col(f"a.{vec_col}")), _as_double(F.col(f"b.{vec_col}"))).alias("cos"),
        )
    )
    w = Window.partitionBy("qid").orderBy(F.desc("cos"), F.asc("nid"))
    return joined.withColumn("rank", F.row_number().over(w)).filter(F.col("rank") <= k)


# --------------------------------------------------------------------------
# LSH (random hyperplanes)
# --------------------------------------------------------------------------

def _hyperplanes(dim: int, bits: int, seed: int = 7) -> list[list[float]]:
    """Deterministic pseudo-random unit hyperplanes (LCG, no numpy
    dependency at plan-build time)."""
    out = []
    state = seed
    for _ in range(bits):
        row = []
        for _ in range(dim):
            state = (state * 6364136223846793005 + 1442695040888963407) % (1 << 64)
            row.append(((state >> 11) / float(1 << 53)) * 2.0 - 1.0)
        norm = math.sqrt(sum(x * x for x in row)) or 1.0
        out.append([x / norm for x in row])
    return out


def lsh_bucket(
    df: DataFrame,
    dim: int,
    bits: int = 8,
    vec_col: str = "embedding",
    out_col: str = "bucket",
    seed: int = 7,
) -> DataFrame:
    """Sign-of-projection LSH bucket id (0..2^bits-1), computed natively
    per row: ``bits`` dot products against literal hyperplanes.

    Sizing at scale: downstream per-bucket joins cost ~n²/2^bits pairs,
    so pick ``bits ≈ log2(n / target_bucket_rows)`` — growing the
    corpus without growing ``bits`` re-introduces a quadratic term."""
    planes = _hyperplanes(dim, bits, seed)
    v = _as_double(F.col(vec_col))
    bucket = F.lit(0).cast("long")
    for i, plane in enumerate(planes):
        p = F.array(*[F.lit(x) for x in plane])
        dot = F.aggregate(F.zip_with(v, p, lambda a, b: a * b), F.lit(0.0), lambda acc, x: acc + x)
        bucket = bucket + F.when(dot >= 0, F.lit(1 << i).cast("long")).otherwise(F.lit(0).cast("long"))
    return df.withColumn(out_col, bucket)


def lsh_topk(
    df: DataFrame,
    query_vec: Sequence[float],
    dim: int,
    k: int = 10,
    bits: int = 8,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    nprobe_hamming: int = 1,
    seed: int = 7,
) -> DataFrame:
    """ANN top-k: probe the query's bucket plus all buckets within
    Hamming distance ``nprobe_hamming`` (multi-probe), then exact
    cosine within candidates.  Candidate fraction ≈ (1+bits)/2^bits
    for hamming 1."""
    planes = _hyperplanes(dim, bits, seed)
    qb = 0
    for i, plane in enumerate(planes):
        if sum(a * b for a, b in zip(query_vec, plane)) >= 0:
            qb |= 1 << i
    probes = {qb}
    if nprobe_hamming >= 1:
        for i in range(bits):
            probes.add(qb ^ (1 << i))
    bucketed = lsh_bucket(df, dim, bits, vec_col=vec_col, seed=seed)
    cand = bucketed.filter(F.col("bucket").isin(list(probes)))
    return cosine_topk(cand, query_vec, k, vec_col=vec_col, id_col=id_col)


# --------------------------------------------------------------------------
# IVF (inverted file)
# --------------------------------------------------------------------------

def ivf_assign(
    df: DataFrame,
    centroids: DataFrame,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    cent_id: str = "cent_id",
    cent_vec: str = "centroid",
    out_col: str = "cell",
) -> DataFrame:
    """Assign each vector to its nearest centroid.

    Broadcast the centroid table (small by construction), score every
    (vector, centroid) pair map-side, then ONE max_by aggregation keyed
    on the vector id picks the best cell — a single shuffle on id, no
    window sort over every column.  Ties break to the lowest cell id
    (deterministic)."""
    joined = df.alias("v").join(F.broadcast(centroids.alias("c")))
    scored = joined.withColumn(
        "_sim", cosine(_as_double(F.col(f"v.{vec_col}")), _as_double(F.col(f"c.{cent_vec}")))
    )
    best = F.max_by(
        F.struct(
            *[F.col(f"v.{c}").alias(c) for c in df.columns],
            F.col(f"c.{cent_id}").alias(out_col),
        ),
        F.struct(F.col("_sim").alias("s"), (-F.col(f"c.{cent_id}")).alias("tb")),
    )
    return scored.groupBy(F.col(f"v.{id_col}")).agg(best.alias("_b")).select("_b.*")


def ivf_topk(
    df: DataFrame,
    centroids: DataFrame,
    query_vec,
    k: int = 10,
    nprobe: int = 4,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
) -> DataFrame:
    """IVF approximate top-k: rank cells by centroid↔query cosine, scan
    only the best ``nprobe`` cells, brute-force cosine within them.

    The scale path for ANN over 100 TB of embeddings: the expensive
    assignment is done ONCE offline (``ivf_assign``, persisted +
    partitioned by cell → partition pruning makes each probe read
    nprobe/n_cells of the data); per-query work is a driver-side
    centroid ranking (tiny) + a pruned scan."""
    assigned = ivf_assign(df, centroids, vec_col, id_col)
    ranked = (
        centroids.withColumn("_qs", cosine(_as_double(F.col("centroid")), F.lit(query_vec).cast("array<double>")))
        .orderBy(F.desc("_qs"), F.asc("cent_id"))
        .limit(nprobe)
        .select("cent_id")
    )
    probed = assigned.join(
        F.broadcast(ranked), assigned["cell"] == ranked["cent_id"], "left_semi"
    )
    return (
        probed.withColumn(
            "cos", cosine(_as_double(F.col(vec_col)), F.lit(query_vec).cast("array<double>"))
        )
        .orderBy(F.desc("cos"), F.asc(id_col))
        .limit(k)
        .select(id_col, "cos")
    )


def persist_ivf_index(
    df: DataFrame,
    centroids: DataFrame,
    path: str,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
) -> None:
    """Offline IVF index build: assign every vector to its cell and
    write parquet PARTITIONED BY cell.  This is the 100 TB layout: a
    probe reads nprobe/n_cells of the data via partition pruning — the
    other cells are never opened (directory-level skip, not row
    filtering)."""
    assigned = ivf_assign(df, centroids, vec_col, id_col)
    assigned.write.mode("overwrite").partitionBy("cell").parquet(path)


def ivf_append(
    df: DataFrame,
    centroids: DataFrame,
    path: str,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
) -> None:
    """Incremental index maintenance: assign ONLY the new batch against
    the frozen centroids and APPEND its files into the same
    cell-partition layout — no rebuild, no read of the existing index.
    At 100 TB this is the difference between an O(batch) nightly
    ingest and an O(corpus) rewrite; probes see old + new rows through
    the same partition pruning.  Re-train centroids (and rebuild) only
    when drift degrades recall — ``source_drift`` over the assignment
    distribution is the cheap trigger for that."""
    assigned = ivf_assign(df, centroids, vec_col, id_col)
    assigned.write.mode("append").partitionBy("cell").parquet(path)


def ivf_topk_from_index(
    spark,
    path: str,
    centroids: DataFrame,
    query_vec,
    k: int = 10,
    nprobe: int = 4,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
) -> DataFrame:
    """Query the persisted IVF index: rank cells by centroid cosine
    (tiny, driver-side), scan ONLY those partitions (pruned at the
    file-listing level — check `.explain` PartitionFilters), brute
    force within."""
    cells = [
        r["cent_id"]
        for r in centroids.withColumn(
            "_qs", cosine(_as_double(F.col("centroid")), F.lit(query_vec).cast("array<double>"))
        )
        .orderBy(F.desc("_qs"), F.asc("cent_id"))
        .limit(nprobe)
        .collect()
    ]
    idx = spark.read.parquet(path).filter(F.col("cell").isin(cells))
    return (
        idx.withColumn(
            "cos", cosine(_as_double(F.col(vec_col)), F.lit(query_vec).cast("array<double>"))
        )
        .orderBy(F.desc("cos"), F.asc(id_col))
        .limit(k)
        .select(id_col, "cos")
    )


def quantize_embeddings(
    df: DataFrame,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    out_vec: str = "qvec",
    out_scale: str = "scale",
) -> DataFrame:
    """Symmetric per-vector int8 quantization: scale = max|v|/127,
    q_i = floor(v_i/scale + 0.5) ∈ [-127, 127].

    The 100 TB storage path for similarity search — 4× smaller than
    float32 (8× vs float64), scanned and dequantized natively
    (``dequantize``: q_i·scale) with ~1e-2 cosine error at 64 dims.
    ``floor(x+0.5)`` rather than round(): engines disagree on
    round-half (Spark HALF_UP, DuckDB HALF_EVEN); floor+0.5 is
    identical everywhere.  Zero vectors keep scale 0 and quantize to
    zeros (try_divide → NULL → coalesce)."""
    v = _as_double(F.col(vec_col))
    scale = F.aggregate(v, F.lit(0.0), lambda acc, x: F.greatest(acc, F.abs(x))) / F.lit(127.0)
    return df.select(
        F.col(id_col),
        scale.alias(out_scale),
        F.transform(
            v,
            lambda x: F.coalesce(
                F.floor(F.try_divide(x, scale) + F.lit(0.5)), F.lit(0)
            ).cast("int"),
        ).alias(out_vec),
    )


def dequantize(qvec: Column, scale: Column) -> Column:
    """int8 quantized vector → array<double> (q_i · scale)."""
    return F.transform(qvec, lambda q: q.cast("double") * scale)


def sample_centroids(
    df: DataFrame,
    n: int,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    seed: int = 42,
    oracle_safe: bool = False,
) -> DataFrame:
    """Deterministic centroid bootstrap: the n vectors with smallest
    seeded hash of their id — a uniform sample without RNG state.
    ``oracle_safe`` uses the md5-based hash any engine can replicate
    (`('0x'||substr(md5(id||':'||seed),1,15))::BIGINT` in DuckDB);
    default is xxhash64 (faster)."""
    if oracle_safe:
        h = F.conv(
            F.substring(F.md5(F.concat(F.col(id_col).cast("string"), F.lit(f":{seed}"))), 1, 15),
            16,
            10,
        ).cast("long")
    else:
        h = F.xxhash64(F.col(id_col).cast("string"), F.lit(seed))
    return (
        df.select(F.col(id_col), F.col(vec_col))
        .orderBy(h, F.asc(id_col))
        .limit(n)
        .select(F.col(id_col).alias("cent_id"), F.col(vec_col).alias("centroid"))
    )


def kmeans_refine(
    df: DataFrame,
    centroids: DataFrame,
    iters: int = 2,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    dim: Optional[int] = None,
    scale: int = 10**9,
) -> DataFrame:
    """Lloyd k-means refinement of an initial centroid table
    (``sample_centroids`` bootstrap): assign → mean → repeat.

    The per-cell mean uses EXACT fixed-point arithmetic —
    ``SUM(floor(x·1e9))`` in longs, divided once in IEEE double — so
    the result is independent of partitioning/summation order and
    bit-reproducible on any engine (a double SUM would drift with the
    shuffle).  Valid while ``n_members · 1e9·|x|  <  2^63`` (~9e8 rows
    per cell at |x|≤10; shrink ``scale`` for more).

    Iteration structure per round: one broadcast-assign (``ivf_assign``,
    single shuffle on id) + one groupBy(cell) with ``dim`` integer sums
    (map-side combined).  The k-row centroid table is collected to the
    driver between rounds — k·dim scalars, the legitimate driver-side
    footprint — which also cuts the lineage so the plan does not grow
    with the iteration count.  Empty cells drop out (standard Lloyd).

    Returns the final centroid table ``(cent_id, centroid, n)`` where
    ``n`` is the final member count.
    """
    spark = df.sparkSession
    if dim is None:
        dim = len(centroids.select("centroid").first()[0])
    fscale = float(scale)
    out = None
    for _ in range(iters):
        assigned = ivf_assign(df, centroids, vec_col, id_col)
        # posexplode + one generic (cell, pos) aggregate: a 64-column
        # sum list was 8 s/iteration of Janino codegen COMPILE time;
        # this shape compiles once and combines map-side to k·dim rows
        flat = assigned.select("cell", F.posexplode(F.col(vec_col)).alias("pos", "_v"))
        sums = flat.groupBy("cell", "pos").agg(
            F.sum(F.floor(F.col("_v").cast("double") * F.lit(fscale)).cast("long")).alias("_s"),
            F.count(F.lit(1)).alias("_n"),
        )
        # k·dim scalars to the driver: assemble next centroids in Python
        # (identical arithmetic to the SQL mirror: s / (n·scale) in double)
        by_cell: dict = {}
        for r in sums.collect():
            by_cell.setdefault(r["cell"], {})[r["pos"]] = (r["_s"], r["_n"])
        data = []
        for cell in sorted(by_cell):
            d = by_cell[cell]
            n = d[0][1]
            vec = [d[p][0] / (float(n) * fscale) for p in range(dim)]
            data.append((cell, vec, n))
        out = spark.createDataFrame(
            data, "cent_id bigint, centroid array<double>, n bigint"
        )
        centroids = out.select("cent_id", "centroid")
    return out


def kcenter_sample(
    df: DataFrame,
    k: int,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    scale: int = 10**6,
) -> DataFrame:
    """Greedy k-center (farthest-point traversal, Gonzalez 1985 —
    the classic 2-approximation) DIVERSITY sampling over an embedding
    column: seed with the minimum-id vector, then repeatedly pick the
    point FARTHEST from its nearest already-chosen center.  The
    curation use: select a maximally diverse coreset (eval probes,
    annotation batches, dedup exemplars) instead of a random sample
    that oversamples dense regions.

    Determinism / engine parity: every distance is an EXACT integer —
    coordinates quantize to ``floor(x·scale)`` longs, the squared-L2
    fold sums integer squares — so the greedy argmax chain (the
    brittle part: one FP-different pick cascades into a different
    sample) is bit-identical on any engine and any partitioning; ties
    break on ascending id.  Valid while dim·(2·scale·|x|)² < 2⁶³
    (dim 64, |x| ≤ 20 at the default scale).

    Plan per round: one broadcast-literal distance update (the newest
    center folds into a RUNNING per-point min — each round is O(n·dim)
    work, not O(n·k·dim)) + one TakeOrdered(1).  Driver state is the
    chosen ids/vectors only (k·dim scalars, the ``kmeans_refine``
    contract); the quantized base is checkpointed once and the
    running-min lineage stays k expressions deep (k is small by
    contract).  Output: (sel_round, id, d2_scaled) — d2_scaled is the
    EXACT scaled squared distance to the nearest earlier center at
    selection time (0 for the seed), i.e. the coverage-radius sequence.
    """
    if k < 1:
        raise ValueError("kcenter_sample: k must be >= 1")
    spark = df.sparkSession
    quant = df.select(
        F.col(id_col).alias("_id"),
        F.transform(
            F.col(vec_col),
            lambda x: F.floor(x.cast("double") * F.lit(float(scale))).cast("long"),
        ).alias("_q"),
    ).localCheckpoint(eager=False)
    seed = quant.orderBy(F.asc("_id")).first()
    if seed is None:
        raise ValueError("kcenter_sample: empty input")
    chosen = [(seed["_id"], list(seed["_q"]), 0)]

    def dist_to(center_q):
        lit_c = F.array(*[F.lit(int(v)).cast("long") for v in center_q])
        return F.aggregate(
            F.zip_with(F.col("_q"), lit_c, lambda a, b: (a - b) * (a - b)),
            F.lit(0).cast("long"),
            lambda acc, x: acc + x,
        )

    mins = quant.select("_id", "_q", dist_to(seed["_q"]).alias("_d"))
    for _ in range(1, int(k)):
        mins = mins.filter(F.col("_id") != F.lit(chosen[-1][0]))
        if len(chosen) > 1:
            mins = mins.withColumn(
                "_d", F.least(F.col("_d"), dist_to(chosen[-1][1]))
            )
        nxt = mins.orderBy(F.desc("_d"), F.asc("_id")).first()
        if nxt is None:
            break  # fewer than k points
        chosen.append((nxt["_id"], list(nxt["_q"]), int(nxt["_d"])))
    return spark.createDataFrame(
        [(i + 1, cid, d) for i, (cid, _, d) in enumerate(chosen)],
        "sel_round int, vec_id long, d2_scaled long",
    )


def kmeans_inertia(
    df: DataFrame,
    centroids: DataFrame,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
) -> float:
    """Mean cosine similarity of each vector to its assigned centroid —
    the (maximization-form) objective, for convergence tests."""
    assigned = ivf_assign(df, centroids, vec_col, id_col)
    joined = assigned.join(
        F.broadcast(centroids), assigned["cell"] == centroids["cent_id"]
    )
    row = joined.agg(
        F.avg(cosine(_as_double(F.col(vec_col)), _as_double(F.col("centroid"))))
    ).collect()[0]
    return float(row[0])


def semantic_dedup(
    df: DataFrame,
    n_clusters: int = 16,
    threshold: float = 0.9,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    oracle_safe: bool = False,
) -> DataFrame:
    """SemDeDup (Abbas et al. 2023, arXiv:2303.09540): drop documents
    whose EMBEDDINGS are near-identical to another document in the same
    embedding cluster — catches paraphrase-level duplicates that
    MinHash/SimHash (lexical) miss.

    Plan: deterministic centroid bootstrap (``sample_centroids``) →
    broadcast nearest-centroid assignment (``ivf_assign``, one shuffle
    on id) → WITHIN-CELL pairwise cosine via a self-join keyed on the
    cell id → greedy keep-lowest-id: ``x`` is dropped iff some
    same-cell ``y`` with ``y.id < x.id`` has ``round(cos, 6) >=
    threshold`` (rounding makes the comparison engine-portable at the
    boundary).  Dropped ids are bounded by the duplicate count, so the
    anti-join side broadcasts and the corpus scan never shuffles.

    Scale: the pairwise stage is the SemDeDup cost model — O(Σ|cell|²)
    with |cell| ≈ n/k, sharded by the cell-key shuffle; pick
    ``n_clusters`` ∝ √n (paper uses 50k cells for LAION-440M).  A hot
    cell is a skew key: raise n_clusters or salt with
    ``plans.scale.salt_keys``.  No all-pairs stage exists in the plan.

    Cell assignment: the plan references the assigned frame THREE
    times (both pair-join sides + the anti-join base), so for small
    ``n_clusters`` (≤256) the centroids are collected (k·dim scalars)
    and inlined via ``nearest_cell_expr`` — assignment becomes a pure
    per-row projection: no broadcast-nested-loop, no max_by shuffle,
    and each reference re-derives it at scan speed.  For larger k use
    ``ivf_assign`` and PERSIST the assigned table once
    (``persist_ivf_index``-style) instead of recomputing it per
    reference — at 100 TB the write pays for itself immediately.

    Returns the surviving rows with their ``cell`` assignment.
    """
    cents = sample_centroids(df, n_clusters, vec_col, id_col, oracle_safe=oracle_safe)
    if n_clusters <= 256:
        # Arrow batch path: numpy matmul assignment + per-cell gram
        # matrix (semantics identical to the expression faces used by
        # the streaming twin; see assign_cells_arrow docstring)
        assigned = assign_cells_arrow(df, cents.collect(), vec_col, id_col)
    else:
        assigned = ivf_assign(df, cents, vec_col, id_col)
    dropped = (
        semantic_dup_pairs_arrow(assigned, threshold, vec_col, id_col)
        .select(F.col("id_b").alias(id_col))
        .distinct()
    )
    return assigned.join(F.broadcast(dropped), id_col, "left_anti")


def semantic_decontaminate(
    corpus: DataFrame,
    eval_set: DataFrame,
    dim: int,
    threshold: float = 0.95,
    bits: int = 8,
    nprobe_hamming: int = 1,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    seed: int = 7,
) -> DataFrame:
    """Semantic (embedding-space) decontamination: corpus rows whose
    embedding reaches ≥ ``threshold`` cosine against ANY eval-set
    embedding — the leakage k-gram decontamination
    (``curation.decontaminate``) misses when eval text is paraphrased
    but the meaning survives into the embedding.

    Blocking discipline: both sides bucket on the deterministic
    hyperplane LSH; the EVAL side multi-probes its bucket plus every
    hamming-``nprobe_hamming`` neighbor (the ``lsh_topk`` probe
    pattern) so near-boundary pairs are still compared, and exact
    cosine verifies within buckets only.  The eval side is small by
    nature (a benchmark suite), so the exploded probe table BROADCASTS
    and the corpus scan never shuffles.  A corpus row meets each eval
    row through at most one probe (a bucket and its 1-bit flips are
    distinct), so no pair is scored twice.  Output: one row per
    contaminated corpus id with its best eval hit ``(id, eval_id,
    cos)`` — ties on cos resolve to the smallest eval id."""
    from csp_gateway_spark.operators.dedup import cosine

    cb = lsh_bucket(corpus, dim, bits, vec_col=vec_col, out_col="_b", seed=seed)
    ev = lsh_bucket(eval_set, dim, bits, vec_col=vec_col, out_col="_b", seed=seed)
    probe_cols = [F.col("_b")]
    if nprobe_hamming >= 1:
        probe_cols += [
            F.col("_b").bitwiseXOR(F.lit(1 << i).cast("long")) for i in range(bits)
        ]
    probes = ev.select(
        F.col(id_col).alias("_eid"),
        _as_double(F.col(vec_col)).alias("_evec"),
        F.explode(F.array(*probe_cols)).alias("_b"),
    )
    hits = (
        cb.join(F.broadcast(probes), "_b")
        .select(
            F.col(id_col),
            F.col("_eid"),
            cosine(_as_double(F.col(vec_col)), F.col("_evec")).alias("_cos"),
        )
        .filter(F.col("_cos") >= F.lit(float(threshold)))
    )
    best = hits.groupBy(id_col).agg(
        F.max(
            F.struct(F.col("_cos").alias("c"), (-F.col("_eid")).alias("nid"))
        ).alias("_m")
    )
    return best.select(
        F.col(id_col),
        (-F.col("_m.nid")).cast("long").alias("eval_id"),
        F.col("_m.c").alias("cos"),
    )


def semantic_dup_pairs(
    assigned: DataFrame,
    threshold: float = 0.9,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
) -> DataFrame:
    """Same-cell near-identical pairs ``(cell, id_a, id_b, cos)`` with
    ``id_a < id_b`` and ``round(cos, 6) >= threshold`` — the pairwise
    core of ``semantic_dedup``, shared by the streaming twin
    (streaming/dedup_stream.py::semantic_pair_stream) so both faces
    agree by construction.  Input must already carry a ``cell``
    column (``ivf_assign`` / ``nearest_cell_expr``)."""
    a = assigned.select(
        F.col("cell"), F.col(id_col).alias("id_a"), F.col(vec_col).alias("_va")
    )
    b = assigned.select(
        F.col("cell"), F.col(id_col).alias("id_b"), F.col(vec_col).alias("_vb")
    )
    cos = F.round(cosine(_as_double(F.col("_va")), _as_double(F.col("_vb"))), 6)
    return (
        a.join(b, "cell")
        .filter(F.col("id_a") < F.col("id_b"))
        .withColumn("cos", cos)
        .filter(F.col("cos") >= F.lit(threshold))
        .select("cell", "id_a", "id_b", "cos")
    )


def nearest_cell_expr(centroid_rows, vec_col: str = "embedding") -> Column:
    """Per-ROW nearest-centroid cell id as a pure column expression —
    the stateless (streaming-safe) face of ``ivf_assign``: the
    collected centroid rows (k·dim scalars, bounded by construction)
    are inlined as literals, and ``array_max`` over
    ``struct(similarity, -cent_id, cent_id)`` picks the best cell with
    the identical tie-break (highest cosine, then lowest cent_id).
    Use for streams, where ivf_assign's groupBy/max_by would be a
    stateful aggregation that blocks downstream stream-stream joins."""
    scored = F.array(
        *[
            F.struct(
                cosine(
                    _as_double(F.col(vec_col)),
                    F.lit([float(x) for x in r["centroid"]]).cast("array<double>"),
                ).alias("s"),
                F.lit(-int(r["cent_id"])).alias("t"),
                F.lit(int(r["cent_id"])).alias("cid"),
            )
            for r in centroid_rows
        ]
    )
    return F.array_max(scored)["cid"]


def assign_cells_arrow(
    df: DataFrame,
    centroid_rows,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
) -> DataFrame:
    """Batch fast path of ``nearest_cell_expr``: one Arrow-batched
    ``mapInPandas`` pass scoring every row against all centroids with
    a single numpy matmul — same argmax tie-break (highest cosine,
    then lowest cent_id: centroid columns are pre-sorted by cent_id
    and ``np.argmax`` keeps the first maximum).

    Why it exists: inlining k·dim literals via ``nearest_cell_expr``
    is the right shape for STREAMS (stateless expression), but its
    Catalyst tree costs seconds of analysis/codegen per query — the
    dominant cost at small scale and pure waste at large scale.  Here
    the centroid matrix rides the Arrow closure instead.

    Deviation: zero-norm vectors get similarity 0 (assigned, lowest
    cent_id wins) rather than the expression face's NULL-cos
    propagation — zero vectors are degenerate either way."""
    import numpy as np
    import pandas as pd  # noqa: F401  (mapInPandas contract)

    rows = sorted(centroid_rows, key=lambda r: int(r["cent_id"]))
    cents = np.array([[float(x) for x in r["centroid"]] for r in rows], dtype=np.float64)
    cent_ids = np.array([int(r["cent_id"]) for r in rows], dtype=np.int64)
    cnorm = np.linalg.norm(cents, axis=1)
    cnorm[cnorm == 0.0] = 1.0
    cn = cents / cnorm[:, None]
    # fresh StructType — StructType.add would MUTATE the DataFrame's
    # cached schema and desync it from the underlying plan
    from pyspark.sql.types import LongType, StructField, StructType

    schema = StructType(list(df.schema.fields) + [StructField("cell", LongType())])

    def assign(batches):
        for pdf in batches:
            if len(pdf) == 0:
                continue
            x = np.array(pdf[vec_col].tolist(), dtype=np.float64)
            xnorm = np.linalg.norm(x, axis=1)
            xnorm[xnorm == 0.0] = 1.0
            sims = (x / xnorm[:, None]) @ cn.T
            pdf = pdf.copy()
            pdf["cell"] = cent_ids[np.argmax(sims, axis=1)]
            yield pdf

    return df.mapInPandas(assign, schema=schema)


def semantic_dup_pairs_arrow(
    assigned: DataFrame,
    threshold: float = 0.9,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
) -> DataFrame:
    """Batch fast path of ``semantic_dup_pairs``: within-cell pairwise
    cosine as ONE numpy gram matrix per cell (``applyInPandas`` keyed
    on the cell — the shuffle is the same cell-key shuffle the
    expression face pays, the O(|cell|²) arithmetic moves from
    interpreted HOF lambdas to BLAS).  Emits (cell, id_a, id_b, cos)
    with id_a < id_b and round(cos, 6) >= threshold, identical to the
    expression face.  Memory per task is |cell|·dim + |cell|² doubles
    — bounded by the n_clusters ∝ √n design point; for hot cells use
    a larger k or the blocked tiler (``embedding_neardup_blocked``)."""
    import numpy as np
    import pandas as pd

    thr = float(threshold)

    def per_cell(key, pdf):
        n = len(pdf)
        if n < 2:
            return pd.DataFrame({"cell": [], "id_a": [], "id_b": [], "cos": []}).astype(
                {"cell": "int64", "id_a": "int64", "id_b": "int64", "cos": "float64"}
            )
        pdf = pdf.sort_values(id_col, kind="mergesort")
        ids = pdf[id_col].to_numpy(dtype=np.int64)
        x = np.array(pdf[vec_col].tolist(), dtype=np.float64)
        norm = np.linalg.norm(x, axis=1)
        norm[norm == 0.0] = 1.0
        sims = np.round((x / norm[:, None]) @ (x / norm[:, None]).T, 6)
        ia, ib = np.triu_indices(n, k=1)
        keep = sims[ia, ib] >= thr
        ia, ib = ia[keep], ib[keep]
        return pd.DataFrame(
            {
                "cell": np.full(len(ia), key[0], dtype=np.int64),
                "id_a": ids[ia],
                "id_b": ids[ib],
                "cos": sims[ia, ib][: len(ia)],
            }
        )

    return assigned.groupBy("cell").applyInPandas(
        per_cell, schema="cell long, id_a long, id_b long, cos double"
    )


def pool_embeddings(
    df: DataFrame,
    group_col: str = "label",
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    mode: str = "mean",
    l2_normalize: bool = False,
    deterministic: bool = False,
) -> DataFrame:
    """Pool many embeddings into one per group — the chunk→document
    (or document→cluster-centroid) aggregation step of an embedding
    pipeline.

    Plan: posexplode to ``(group, idx, val)`` rows (scan-local, no
    shuffle) → ONE groupBy(group, idx) aggregate (map-side combined;
    shuffle volume is |groups|·dim rows regardless of corpus size) →
    per-group reassembly sorted by idx.  Never collects vectors into a
    driver loop and never relies on a fixed compile-time dimension.

    ``mode``: ``mean`` or ``max``.  ``l2_normalize`` rescales the
    pooled vector to unit norm (cosine-ready).  ``deterministic``
    makes the float mean a position-ordered fold over an id-sorted
    list (the char_entropy/lm_score pattern) — partitioning-invariant
    and engine-reproducible, at the cost of materializing each
    (group, idx) value list; use it when groups are chunk-sized, not
    corpus-sized.  ``max`` is order-independent and always exact.
    """
    if mode not in ("mean", "max"):
        raise ValueError(f"mode must be 'mean' or 'max', got {mode!r}")
    rows = df.select(
        F.col(group_col),
        F.col(id_col),
        F.posexplode(_as_double(F.col(vec_col))).alias("_i", "_v"),
    )
    if deterministic and mode == "mean":
        pooled = rows.groupBy(group_col, "_i").agg(
            F.array_sort(F.collect_list(F.struct(id_col, "_v"))).alias("_vs")
        )
        total = F.aggregate("_vs", F.lit(0.0), lambda a, x: a + x["_v"])
        pooled = pooled.select(
            group_col,
            "_i",
            (total / F.size("_vs")).alias("_p"),
            F.size("_vs").alias("_n"),
        )
    else:
        agg = F.avg if mode == "mean" else F.max
        pooled = rows.groupBy(group_col, "_i").agg(
            agg("_v").alias("_p"), F.count(F.lit(1)).alias("_n")
        )
    out = pooled.groupBy(group_col).agg(
        F.transform(
            F.array_sort(F.collect_list(F.struct("_i", "_p"))), lambda s: s["_p"]
        ).alias("pooled"),
        (F.max("_n")).alias("n_vectors"),
    )
    if l2_normalize:
        norm = F.sqrt(F.aggregate("pooled", F.lit(0.0), lambda a, x: a + x * x))
        out = out.withColumn(
            "pooled",
            F.when(norm > 0, F.transform("pooled", lambda x: x / norm)).otherwise(
                F.col("pooled")
            ),
        )
    return out


# ---------------------------------------------------------------------------
# PCA (top principal component) via exact-moment power iteration
# ---------------------------------------------------------------------------


def pca_moment_sums(
    df: DataFrame,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    dim: Optional[int] = None,
    scale: int = 1 << 20,
) -> DataFrame:
    """EXACT fixed-point first/second moments of the embedding matrix:
    rows ``(i, j, s)`` where ``(i, j≥0)`` carries ``Σ q_i·q_j``,
    ``(i, -1)`` carries ``Σ q_i``, and ``(-1, -1)`` the row count,
    with ``q = floor(x·scale)`` in int64.

    Integer sums are partitioning-invariant, so the downstream
    covariance (and the PCA built on it) is bit-reproducible on any
    engine — a double SUM would drift with the shuffle.

    Scale shape: one ``mapInPandas`` pass emitting ``d²+d+1`` partial
    rows PER PARTITION (numpy int64 matmul — exact), then one
    map-side-combined groupBy down to ``d²+d+1`` total rows.  The
    corpus never shuffles; driver traffic is d² scalars.

    Overflow bound: ``n·scale²·|x|² < 2^63`` — at |x|≤1 and
    scale=2^20, fine to ~8e3 rows per... nope: 2^63/2^40 ≈ 8.4e6 rows;
    shrink ``scale`` beyond that (the oracle mirrors whatever is
    passed).
    """
    if dim is None:
        dim = len(df.select(vec_col).first()[0])
    d = int(dim)
    fscale = float(scale)

    def partials(batches):
        import numpy as np
        import pandas as pd

        s2 = np.zeros((d, d), dtype=np.int64)
        s1 = np.zeros(d, dtype=np.int64)
        cnt = 0
        for pdf in batches:
            if not len(pdf):
                continue
            mat = np.stack(pdf["_v"].to_numpy()).astype(np.float64)
            q = np.floor(mat * fscale).astype(np.int64)
            s2 += q.T @ q
            s1 += q.sum(axis=0)
            cnt += len(q)
        ii, jj = np.meshgrid(np.arange(d), np.arange(d), indexing="ij")
        yield pd.DataFrame(
            {
                "i": np.concatenate([ii.ravel(), np.arange(d), [-1]]),
                "j": np.concatenate([jj.ravel(), np.full(d, -1), [-1]]),
                "s": np.concatenate([s2.ravel(), s1, [cnt]]),
            }
        )

    flat = df.select(_as_double(F.col(vec_col)).alias("_v")).mapInPandas(
        partials, "i int, j int, s long"
    )
    return flat.groupBy("i", "j").agg(F.sum("s").alias("s"))


def embedding_pca(
    df: DataFrame,
    iters: int = 2,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    dim: Optional[int] = None,
    scale: int = 1 << 20,
) -> DataFrame:
    """Top principal component of the (centered) embedding cloud by
    power iteration — the building block for embedding whitening,
    quality-axis discovery, and debiasing passes over a corpus's
    vector column.

    Determinism contract (the whole point of the construction): the
    distributed stage produces EXACT integers (``pca_moment_sums``);
    covariance assembly and the power iteration run on the driver as
    ORDERED left folds over ≤ d² scalars, each step one correctly-
    rounded IEEE op — so any engine replaying the same folds (DuckDB:
    ``list_sum(list(... ORDER BY ...))``) lands on the same doubles.
    Start vector: uniform ``1/sqrt(d)``.

    Returns ``(idx, component)`` — the unit eigenvector estimate after
    ``iters`` rounds (sign follows the start vector's projection; no
    sign normalization is applied).
    """
    import math

    sums = pca_moment_sums(df, vec_col, id_col, dim, scale)
    rows = sums.collect()
    d = max(r["i"] for r in rows) + 1
    n = None
    s1 = [0] * d
    s2 = [[0] * d for _ in range(d)]
    for r in rows:
        i, j, s = r["i"], r["j"], r["s"]
        if i == -1:
            n = s
        elif j == -1:
            s1[i] = s
        else:
            s2[i][j] = s
    if not n:
        raise ValueError("embedding_pca: empty input")
    # covariance (unnormalized — eigenvectors are scale-invariant);
    # expression order matters for the cross-engine mirror
    cov = [
        [float(s2[i][j]) - float(s1[i]) * float(s1[j]) / float(n) for j in range(d)]
        for i in range(d)
    ]
    v = [1.0 / math.sqrt(float(d))] * d
    for _ in range(iters):
        u = []
        for i in range(d):
            acc = 0.0
            for j in range(d):
                acc += cov[i][j] * v[j]
            u.append(acc)
        acc = 0.0
        for i in range(d):
            acc += u[i] * u[i]
        nrm = math.sqrt(acc)
        if nrm == 0.0:
            raise ValueError("embedding_pca: zero covariance (degenerate input)")
        v = [x / nrm for x in u]
    spark = df.sparkSession
    return spark.createDataFrame(
        [(i, v[i]) for i in range(d)], "idx int, component double"
    )


# ---------------------------------------------------------------------------
# Product quantization (Jégou et al. 2011, "Product Quantization for
# Nearest Neighbor Search") — the memory-bounded ANN path: 100 TB of
# float vectors compress to n·m one-byte codes, and search touches
# only the code table plus an m·k lookup table per query.
# ---------------------------------------------------------------------------


def _sq_dist(a: Column, b: Column) -> Column:
    """Squared L2 distance as an array-ordered sequential fold —
    partitioning-invariant and engine-reproducible (DuckDB mirror:
    ``list_sum(list_transform(range(...), i -> (a[i]-b[i])^2))``)."""
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: (x - y) * (x - y)),
        F.lit(0.0),
        lambda acc, v: acc + v,
    )


def _portable_hash60_py(value: str) -> int:
    """Python twin of dedup._md5_base15 / curation.sample_hash —
    int(md5(s)[:15], 16)."""
    import hashlib

    return int(hashlib.md5(value.encode("utf-8")).hexdigest()[:15], 16)


def pq_train(
    df: DataFrame,
    m: int = 8,
    k: int = 16,
    iters: int = 0,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    seed: int = 42,
    scale: int = 10**9,
) -> list:
    """Train subspace codebooks: ``codebook[j][c]`` is the ``c``-th
    centroid of subspace ``j`` (dim/m doubles each).

    Initialization is the deterministic ``sample_centroids`` bootstrap
    (k vectors with smallest seeded md5 hash, sliced into m
    subvectors; codes numbered 0..k-1 in hash order, ties by id —
    DuckDB mirror: ``row_number() OVER (ORDER BY hash60(id||':'||seed),
    id) - 1``).  ``iters`` rounds of per-subspace Lloyd refinement
    follow: ONE pass per round computes every (subspace, code)
    assignment as a per-row projection (codebook inlined as literals —
    no join), then one map-side-combined groupBy((j, code, pos)) of
    EXACT fixed-point integer sums, k·dim scalars to the driver
    (identical arithmetic to ``kmeans_refine``).  Codes that lose all
    members keep their previous centroid so the code space stays
    dense — a LUT must address all k codes.

    The returned codebook is a bounded driver artifact (k·dim doubles
    ≈ KBs) — the same legitimate footprint as kmeans centroids.
    """
    rows = sample_centroids(df, k, vec_col, id_col, seed, oracle_safe=True).collect()
    ranked = sorted(
        rows, key=lambda r: (_portable_hash60_py(f"{r['cent_id']}:{seed}"), r["cent_id"])
    )
    dim = len(ranked[0]["centroid"])
    if dim % m:
        raise ValueError(f"dim {dim} not divisible by m={m}")
    dsub = dim // m
    codebook = [
        [[float(x) for x in r["centroid"][j * dsub : (j + 1) * dsub]] for r in ranked]
        for j in range(m)
    ]
    fscale = float(scale)
    for _ in range(iters):
        enc = pq_encode(df, codebook, vec_col, id_col)
        sub = F.slice(_as_double(F.col(vec_col)), F.col("j") * dsub + 1, dsub)
        flat = (
            df.join(enc, id_col)
            .select(F.col(id_col), F.posexplode("codes").alias("j", "code"), F.col(vec_col))
            .select("j", "code", F.posexplode(sub).alias("pos", "_v"))
        )
        sums = flat.groupBy("j", "code", "pos").agg(
            F.sum(F.floor(F.col("_v") * F.lit(fscale)).cast("long")).alias("_s"),
            F.count(F.lit(1)).alias("_n"),
        )
        by_jc: dict = {}
        for r in sums.collect():
            by_jc.setdefault((r["j"], r["code"]), {})[r["pos"]] = (r["_s"], r["_n"])
        for (j, c), d in by_jc.items():
            n = d[0][1]
            codebook[j][c] = [d[p][0] / (float(n) * fscale) for p in range(dsub)]
    return codebook


def pq_encode(
    df: DataFrame,
    codebook: list,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
) -> DataFrame:
    """(id, codes): the PQ code array — per subspace, the index of the
    nearest codebook centroid (squared L2; ties to the lowest code —
    numpy ``argmin`` takes the first minimum).

    Arrow-batched map stage (no join, no shuffle): the codebook rides
    in the task closure (k·dim doubles) and each batch computes all
    m·k distances as one numpy broadcast per subspace — the same
    BLAS-tile pattern as ``embedding_neardup_blocked``.  A pure
    column-expression variant (m·k ``aggregate`` folds) was 60×
    slower: Catalyst runs higher-order-function lambdas interpreted,
    outside whole-stage codegen.  Determinism: the per-subvector sum
    runs over the trailing axis in index order (numpy sequential
    reduction below the pairwise threshold), bit-identical to the
    oracle's ordered ``list_sum``.  At 100 TB this is the map stage
    that shrinks the dataset ~dim·4/m bytes per vector."""
    import numpy as np

    m = len(codebook)
    dsub = len(codebook[0][0])
    cb = [np.asarray(codebook[j], dtype="float64") for j in range(m)]
    id_type = df.schema[id_col].dataType.simpleString()
    schema = f"`{id_col}` {id_type}, codes array<int>"

    def enc(batches):
        import pandas as pd

        for pdf in batches:
            if not len(pdf):
                continue
            X = np.asarray([np.asarray(v, dtype="float64") for v in pdf[vec_col]])
            codes = np.empty((len(X), m), dtype="int32")
            for j in range(m):
                sub = X[:, j * dsub : (j + 1) * dsub]
                diff = sub[:, None, :] - cb[j][None, :, :]
                d = (diff * diff).sum(axis=2)
                codes[:, j] = np.argmin(d, axis=1)
            yield pd.DataFrame(
                {id_col: pdf[id_col], "codes": [c.tolist() for c in codes]}
            )

    return df.select(id_col, vec_col).mapInPandas(enc, schema=schema)


def pq_search(
    codes: DataFrame,
    codebook: list,
    query: Sequence[float],
    topk: int = 10,
    id_col: str = "vec_id",
) -> DataFrame:
    """Asymmetric-distance top-k over a PQ code table: the query is
    quantized against NOTHING — its exact subvectors are compared to
    each codebook centroid once (an m·k lookup table computed
    driver-side in IEEE doubles, ascending-index folds — the DuckDB
    mirror reproduces it bit-identically), then every row's
    approximate distance is ``Σ_j lut[j][code_j]``, a pure projection
    over the code array.

    Plan: scan codes → per-row LUT projection → TakeOrdered(topk).
    No shuffle, no join, no vector data touched — this is why PQ is
    the 100 TB search path: the scan reads m bytes per row instead of
    dim·4."""
    m = len(codebook)
    k = len(codebook[0])
    dsub = len(codebook[0][0])
    q = [float(x) for x in query]
    if len(q) != m * dsub:
        raise ValueError(f"query dim {len(q)} != m·dsub {m * dsub}")
    lut = []
    for j in range(m):
        row = []
        for c in range(k):
            acc = 0.0
            for i in range(dsub):
                dlt = q[j * dsub + i] - codebook[j][c][i]
                acc += dlt * dlt
            row.append(acc)
        lut.append(row)
    adist = None
    for j in range(m):
        term = F.element_at(F.lit(lut[j]).cast("array<double>"), F.col("codes")[j] + 1)
        adist = term if adist is None else adist + term
    return (
        codes.select(F.col(id_col), adist.alias("adist"))
        .orderBy(F.asc("adist"), F.asc(id_col))
        .limit(int(topk))
    )


def embedding_standardize(
    df: DataFrame,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    dim: Optional[int] = None,
    scale: int = 1 << 20,
    eps: float = 1e-9,
) -> DataFrame:
    """Per-dimension standardization (whitening-lite) of an embedding
    column: ``x' = (x − μ_j)/σ_j`` — the preprocessing that makes
    L2/cosine distances comparable across dimensions before
    ANN/k-means (a dominant dimension otherwise swamps the metric).

    Moments are EXACT fixed-point integer sums per dimension (the
    ``pca_moment_sums`` contract: posexplode → ONE map-side-combined
    groupBy(pos) of ``Σ floor(x·scale)`` and ``Σ floor(x·scale)²`` —
    partitioning-invariant, engine-reproducible), collected as 2·dim
    scalars and inlined as literals, so the standardization itself is
    a pure scan-local projection.  μ = s1/(n·scale);
    σ² = s2/(n·scale²) − μ²; σ = sqrt(σ² + eps).
    """
    if dim is None:
        dim = len(df.select(vec_col).first()[0])
    d = int(dim)
    fscale = float(scale)
    flat = df.select(F.posexplode(_as_double(F.col(vec_col))).alias("pos", "_v"))
    q = F.floor(F.col("_v") * F.lit(fscale)).cast("long")
    mom = flat.groupBy("pos").agg(
        F.sum(q).alias("_s1"),
        F.sum(q * q).alias("_s2"),
        F.count(F.lit(1)).alias("_n"),
    )
    rows = {r["pos"]: (r["_s1"], r["_s2"], r["_n"]) for r in mom.collect()}
    if len(rows) != d:
        raise ValueError(f"expected {d} dimensions, saw {len(rows)}")
    means, sds = [], []
    for j in range(d):
        s1, s2, n = rows[j]
        mean = s1 / (float(n) * fscale)
        var = s2 / (float(n) * fscale * fscale) - mean * mean
        means.append(mean)
        sds.append(math.sqrt(var + eps))
    m_arr = F.lit(means).cast("array<double>")
    s_arr = F.lit(sds).cast("array<double>")
    vec = _as_double(F.col(vec_col))
    # zip_with pairs the row vector with the literal stat arrays
    # elementwise — NEVER element_at(literal_array, i) inside a
    # transform lambda, which rebuilds the 64-literal array per
    # element (O(dim²) interpreted evaluation per row; measured ~10×
    # on the sf0.1 gate)
    centered = F.zip_with(vec, m_arr, lambda x, m: x - m)
    out = F.zip_with(centered, s_arr, lambda y, s: y / s)
    return df.withColumn(vec_col, out)


def hard_negatives(
    df: DataFrame,
    query_vec,
    query_label,
    k: int = 10,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    label_col: str = "label",
) -> DataFrame:
    """Hard-negative mining for retrieval training: the k vectors MOST
    similar to the query that carry a DIFFERENT label — the negatives
    that actually teach a contrastive model (random negatives are too
    easy).  Plan: one label filter pushed to the scan + the
    ``cosine_topk`` TakeOrdered — no shuffle."""
    pool = df.filter(F.col(label_col) != F.lit(query_label))
    return cosine_topk(pool, query_vec, k=k, vec_col=vec_col, id_col=id_col)


def cluster_quality(
    df: DataFrame,
    centroids: DataFrame,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    cent_id: str = "cent_id",
    cent_vec: str = "centroid",
) -> DataFrame:
    """Per-cluster quality report after an IVF/k-means assignment:
    member count, mean cosine to the own centroid (cohesion) and the
    highest cosine from the own centroid to any OTHER centroid
    (separation — a high value means two cells encode the same
    concept and should merge).  The clustering-health dashboard for
    the ANN/SemDeDup index family.

    Plan: one broadcast-scored assignment (``ivf_assign``), one
    groupBy(cell); centroid↔centroid similarity is a k×k broadcast
    self-join (k² scalars).  Per-member cosines round to 6dp and sum
    in DECIMAL so the group mean is accumulation-order-free —
    engine-exact.  Output: (cell, n, cohesion, separation)."""
    assigned = ivf_assign(df, centroids, vec_col, id_col, cent_id, cent_vec)
    with_cos = assigned.join(
        F.broadcast(centroids), assigned["cell"] == centroids[cent_id]
    ).withColumn(
        "_cos",
        F.round(
            cosine(_as_double(F.col(vec_col)), _as_double(F.col(cent_vec))), 6
        ).cast("decimal(18,6)"),
    )
    per_cell = with_cos.groupBy("cell").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum("_cos").alias("_sc"),
    )
    a = centroids.select(
        F.col(cent_id).alias("_ca"), F.col(cent_vec).alias("_va")
    )
    b = centroids.select(
        F.col(cent_id).alias("_cb"), F.col(cent_vec).alias("_vb")
    )
    sep = (
        a.join(F.broadcast(b), F.col("_ca") != F.col("_cb"))
        .withColumn(
            "_cc",
            F.round(cosine(_as_double(F.col("_va")), _as_double(F.col("_vb"))), 6),
        )
        .groupBy(F.col("_ca").alias("cell"))
        .agg(F.max("_cc").alias("separation"))
    )
    return per_cell.join(F.broadcast(sep), "cell").select(
        "cell",
        "n",
        (F.col("_sc").cast("double") / F.col("n").cast("double")).alias("cohesion"),
        "separation",
    )


def embedding_drift(
    emb: DataFrame,
    labels: DataFrame,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    label_id_col: str = "doc_id",
    group_col: str = "source",
    scale: int = 1 << 20,
) -> DataFrame:
    """Per-group embedding-centroid drift: each group's centroid, its
    cosine to the GLOBAL centroid, and the centroid L2 norm — the
    "did one crawl's embedding distribution wander off" gate a
    mixture pipeline runs before trusting per-source similarity
    thresholds (a drifted source makes one global threshold wrong).

    Exactness at scale (the ``embedding_standardize`` /
    ``pca_moment_sums`` contract): per-dimension sums accumulate as
    fixed-point integers Σ⌊x·2²⁰⌋ via ONE posexplode →
    map-side-combined groupBy(group, pos) — partitioning-invariant
    and engine-reproducible; the global sums are the per-group sums
    re-aggregated (exact integer addition), never a second scan.  The
    cosine/norm fold runs over the pos-sorted packed array per group
    (bounded: groups × dim cells), so every double accumulates in one
    pinned order.  Output per group: (group, n_vecs, cos_to_global,
    centroid_norm)."""
    flat = (
        emb.select(F.col(id_col).alias("_id"), _as_double(F.col(vec_col)).alias("_v"))
        .join(
            labels.select(
                F.col(label_id_col).alias("_id"), F.col(group_col).alias("_g")
            ),
            "_id",
        )
        .select("_g", F.posexplode("_v").alias("_pos", "_x"))
    )
    q = F.floor(F.col("_x") * F.lit(float(scale))).cast("long")
    per = flat.groupBy("_g", "_pos").agg(
        F.sum(q).cast("decimal(38,0)").alias("_s"),
        F.count(F.lit(1)).alias("_n"),
    )
    # global per-dimension sums: exact re-aggregation of the group sums
    glob = per.groupBy("_pos").agg(
        F.sum("_s").alias("_gs"), F.sum("_n").alias("_gn")
    )
    joined = per.join(glob, "_pos").select(
        "_g", "_pos", "_s", "_n", "_gs", "_gn"
    )
    packed = joined.groupBy("_g").agg(
        F.array_sort(
            F.collect_list(F.struct("_pos", "_s", "_gs"))
        ).alias("_z"),
        F.max(F.col("_n")).cast("long").alias("n_vecs"),
        F.max(F.col("_gn")).cast("long").alias("_ngl"),
    )
    # centroid_g[j] = s_j/(n·scale); global centroid likewise.  The
    # scale and 1/n factors cancel inside the cosine, so the fold works
    # on the raw integer sums normalized only at the end.
    acc0 = F.struct(
        F.lit(0.0).alias("dot"), F.lit(0.0).alias("aa"), F.lit(0.0).alias("bb")
    )
    folded = F.aggregate(
        F.col("_z"),
        acc0,
        lambda acc, s: F.struct(
            (acc["dot"] + s["_s"].cast("double") * s["_gs"].cast("double")).alias("dot"),
            (acc["aa"] + s["_s"].cast("double") * s["_s"].cast("double")).alias("aa"),
            (acc["bb"] + s["_gs"].cast("double") * s["_gs"].cast("double")).alias("bb"),
        ),
    )
    return packed.select(
        F.col("_g").alias(group_col),
        "n_vecs",
        F.when(
            (folded["aa"] > 0) & (folded["bb"] > 0),
            folded["dot"] / (F.sqrt(folded["aa"]) * F.sqrt(folded["bb"])),
        ).alias("cos_to_global"),
        (
            F.sqrt(folded["aa"])
            / (F.col("n_vecs").cast("double") * F.lit(float(scale)))
        ).alias("centroid_norm"),
    )
