"""ANN / similarity search operators."""

import pyspark.sql.functions as F
import pytest

from csp_gateway_spark.operators.similarity import (
    cosine_topk,
    ivf_assign,
    knn_join,
    lsh_bucket,
    lsh_topk,
    sample_centroids,
)


@pytest.fixture(scope="module")
def query_vec(embeddings):
    return embeddings.filter(F.col("vec_id") == 0).select("embedding").collect()[0][0]


def test_bruteforce_topk(embeddings, query_vec):
    out = cosine_topk(embeddings, query_vec, k=5).collect()
    assert out[0].vec_id == 0 and abs(out[0].cos - 1.0) < 1e-9
    sims = [r.cos for r in out]
    assert sims == sorted(sims, reverse=True)


def test_pandas_udf_topk_matches_native(embeddings, query_vec):
    native = [(r.vec_id, round(r.cos, 9)) for r in cosine_topk(embeddings, query_vec, k=5).collect()]
    arrow = [(r.vec_id, round(r.cos, 9)) for r in cosine_topk(embeddings, query_vec, k=5, use_pandas=True).collect()]
    assert native == arrow


def test_lsh_recall(embeddings, query_vec):
    """Multi-probe LSH top-k should overlap heavily with brute force."""
    exact = {r.vec_id for r in cosine_topk(embeddings, query_vec, k=10).collect()}
    approx = {r.vec_id for r in lsh_topk(embeddings, query_vec, dim=64, k=10, bits=4).collect()}
    # near-random vectors are LSH's worst case; multi-probe at 4 bits
    # scans ~5/16 of buckets — expect partial but nonzero recall
    assert len(exact & approx) >= 2


def test_lsh_bucket_range(embeddings):
    out = lsh_bucket(embeddings, dim=64, bits=4)
    rows = out.select("bucket").distinct().collect()
    assert all(0 <= r.bucket < 16 for r in rows)


def test_knn_join_blocked(embeddings):
    small = embeddings.filter(F.col("vec_id") < 20)
    out = knn_join(small, small, k=3)
    counts = out.groupBy("qid").count().collect()
    assert all(r["count"] == 3 for r in counts)
    # rank-1 neighbor of each vector is itself
    self_match = out.filter((F.col("rank") == 1)).collect()
    assert all(r.qid == r.nid for r in self_match)


def test_ivf(embeddings):
    cents = sample_centroids(embeddings, 8)
    assert cents.count() == 8
    assigned = ivf_assign(embeddings.filter(F.col("vec_id") < 50), cents)
    assert assigned.count() == 50
    assert assigned.select("cell").distinct().count() > 1
    # assignment keeps every original column
    assert set(assigned.columns) == set(embeddings.columns) | {"cell"}


def test_ivf_topk_recall_and_full_probe_exactness(embeddings, query_vec):
    from csp_gateway_spark.operators.similarity import ivf_topk

    cents = sample_centroids(embeddings, 8)
    exact = [(r.vec_id, round(r.cos, 9)) for r in cosine_topk(embeddings, query_vec, k=10).collect()]
    # probing ALL cells must reproduce brute force exactly
    full = [
        (r.vec_id, round(r.cos, 9))
        for r in ivf_topk(embeddings, cents, query_vec, k=10, nprobe=8).collect()
    ]
    assert full == exact
    # nprobe=3 of 8 cells: partial but substantial recall
    approx = {r.vec_id for r in ivf_topk(embeddings, cents, query_vec, k=10, nprobe=3).collect()}
    assert len({v for v, _ in exact} & approx) >= 3


def test_quantize_dequantize_error_bound(spark):
    import numpy as np
    from pyspark.sql import functions as F

    from csp_gateway_spark.operators.similarity import dequantize, quantize_embeddings

    rng = np.random.default_rng(3)
    rows = [(i, rng.standard_normal(64).tolist()) for i in range(50)]
    rows.append((99, [0.0] * 64))  # zero vector: scale 0, all-zero qvec
    df = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    q = quantize_embeddings(df)
    back = q.select("vec_id", dequantize(F.col("qvec"), F.col("scale")).alias("d"))
    joined = {r["vec_id"]: r for r in df.join(back, "vec_id").collect()}
    for i, vec in rows:
        d = np.asarray(joined[i]["d"])
        v = np.asarray(vec)
        if i == 99:
            assert np.all(d == 0.0)
            continue
        # per-component error bounded by scale/2 (round-to-nearest)
        scale = np.abs(v).max() / 127.0
        assert np.abs(d - v).max() <= scale / 2 + 1e-12
        # cosine preserved to ~1e-3 at 64 dims
        cos = d @ v / (np.linalg.norm(d) * np.linalg.norm(v))
        assert cos > 0.999


def test_quantized_values_fit_int8(spark):
    import numpy as np
    from pyspark.sql import functions as F

    from csp_gateway_spark.operators.similarity import quantize_embeddings

    rng = np.random.default_rng(4)
    df = spark.createDataFrame(
        [(i, rng.standard_normal(16).tolist()) for i in range(20)],
        "vec_id long, embedding array<double>",
    )
    mm = (
        quantize_embeddings(df)
        .select(F.explode("qvec").alias("q"))
        .agg(F.min("q").alias("lo"), F.max("q").alias("hi"))
        .collect()[0]
    )
    assert -127 <= mm["lo"] and mm["hi"] <= 127


# ---------------------------------------------------------------------------
# kmeans_refine
# ---------------------------------------------------------------------------

def test_kmeans_refine_improves_objective(spark, embeddings):
    from csp_gateway_spark.operators.similarity import (
        kmeans_inertia,
        kmeans_refine,
        sample_centroids,
    )

    init = sample_centroids(embeddings, 4, oracle_safe=True)
    before = kmeans_inertia(embeddings, init)
    refined = kmeans_refine(embeddings, init, iters=2)
    after = kmeans_inertia(embeddings, refined.select("cent_id", "centroid"))
    # Lloyd iterations cannot worsen the (mean-cosine) objective beyond
    # noise from the fixed-point rounding
    assert after >= before - 1e-6
    # every vector accounted for across final clusters
    assert refined.agg({"n": "sum"}).collect()[0][0] == embeddings.count()


def test_kmeans_refine_deterministic(spark, embeddings):
    from csp_gateway_spark.operators.similarity import kmeans_refine, sample_centroids

    init = sample_centroids(embeddings, 4, oracle_safe=True)
    a = kmeans_refine(embeddings, init, iters=1).collect()
    b = kmeans_refine(embeddings.repartition(16), init, iters=1).collect()
    ka = {r["cent_id"]: (r["n"], tuple(r["centroid"])) for r in a}
    kb = {r["cent_id"]: (r["n"], tuple(r["centroid"])) for r in b}
    assert ka == kb  # exact fixed-point means: partitioning-invariant


def test_semantic_dedup_drops_near_identical(spark):
    """Two near-identical embeddings in the same cell: the higher id is
    dropped; orthogonal vectors all survive.  Plan has no cartesian
    product — the pairwise stage is keyed on the cell id."""
    from csp_gateway_spark.operators.similarity import semantic_dedup

    rows = [
        (1, [1.0, 0.0, 0.0, 0.0]),
        (2, [0.999, 0.01, 0.0, 0.0]),   # near-dup of 1 -> dropped
        (3, [0.0, 1.0, 0.0, 0.0]),
        (4, [0.0, 0.0, 1.0, 0.0]),
    ]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    out = semantic_dedup(df, n_clusters=2, threshold=0.95)
    kept = sorted(r.vec_id for r in out.collect())
    assert kept == [1, 3, 4]
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "CartesianProduct" not in plan


def test_semantic_dedup_keeps_all_when_distinct(spark, embeddings):
    from csp_gateway_spark.operators.similarity import semantic_dedup

    n = embeddings.count()
    out = semantic_dedup(embeddings, n_clusters=8, threshold=0.999)
    assert out.count() == n  # nothing near-identical at this threshold
    assert "cell" in out.columns


def test_pool_embeddings_mean_and_max(spark):
    from csp_gateway_spark.operators.similarity import pool_embeddings

    rows = [
        (1, 10, [1.0, 2.0]),
        (1, 11, [3.0, 6.0]),
        (2, 12, [5.0, 0.0]),
    ]
    df = spark.createDataFrame(rows, "label int, vec_id long, embedding array<double>")
    mean = {r.label: r for r in pool_embeddings(df, "label").collect()}
    assert mean[1].pooled == [2.0, 4.0] and mean[1].n_vectors == 2
    assert mean[2].pooled == [5.0, 0.0]
    mx = {r.label: r.pooled for r in pool_embeddings(df, "label", mode="max").collect()}
    assert mx[1] == [3.0, 6.0]
    det = {r.label: r.pooled for r in pool_embeddings(df, "label", deterministic=True).collect()}
    assert det[1] == [2.0, 4.0]
    unit = pool_embeddings(df, "label", l2_normalize=True).collect()
    import math
    for r in unit:
        assert math.isclose(sum(x * x for x in r.pooled), 1.0, rel_tol=1e-9)


def test_tf_hash_feeds_cosine_search(spark):
    """Integration: hashing-trick TF vectors densified via pooling-style
    reassembly feed cosine_topk — near-identical documents rank first
    without any learned embeddings."""
    from csp_gateway_spark.operators.corpus import tf_hash_features

    docs = [
        (1, "spark catalyst optimizer pushes filters into parquet scans"),
        (2, "spark catalyst optimizer pushes filters into parquet scan"),
        (3, "ducks swim on the quiet pond at dawn"),
    ]
    df = spark.createDataFrame(docs, "doc_id long, text string")
    dim = 32
    sparse = tf_hash_features(df, dim=dim, l2_normalize=True)
    dense = (
        sparse.groupBy("doc_id")
        .agg(F.map_from_entries(F.collect_list(F.struct("bucket", "tf_norm"))).alias("m"))
        .select(
            "doc_id",
            F.array(*[F.coalesce(F.col("m").getItem(i), F.lit(0.0)) for i in range(dim)]).alias("embedding"),
        )
    )
    qv = dense.filter(F.col("doc_id") == 1).collect()[0]["embedding"]
    ranked = [r.vec_id for r in cosine_topk(dense.withColumnRenamed("doc_id", "vec_id"), qv, k=3).collect()]
    assert ranked[0] == 1 and ranked[1] == 2  # self, then the near-dup


# ---------------------------------------------------------------------------
# embedding_pca
# ---------------------------------------------------------------------------


def test_pca_rayleigh_near_top_eigenvalue(embeddings):
    """Convergence check against numpy's exact spectrum: the Rayleigh
    quotient of the returned direction approaches the top eigenvalue.
    (The synthetic embeddings have a near-degenerate top cluster —
    λ2/λ1 ≈ 0.99 — so asserting alignment with THE top eigenvector
    would need thousands of rounds; the quotient is the honest
    convergence measure.)"""
    import numpy as np

    from csp_gateway_spark.operators.similarity import embedding_pca

    got = np.array(
        [r["component"] for r in embedding_pca(embeddings, iters=30).orderBy("idx").collect()]
    )
    mat = np.stack(
        [np.asarray(r["embedding"], dtype=np.float64) for r in embeddings.collect()]
    )
    c = np.cov(mat, rowvar=False, bias=True)
    w = np.linalg.eigvalsh(c)
    rayleigh = float(got @ c @ got)
    assert rayleigh >= 0.97 * float(w[-1]), (rayleigh, float(w[-1]))
    assert abs(float(np.linalg.norm(got)) - 1.0) < 1e-9


def test_pca_partitioning_invariant(embeddings):
    """Bit-identical components from 1 and 16 partitions — the moment
    sums are exact integers, the iteration a driver-side ordered fold."""
    from csp_gateway_spark.operators.similarity import embedding_pca

    one = [tuple(r) for r in embedding_pca(embeddings.coalesce(1), iters=3).orderBy("idx").collect()]
    many = [tuple(r) for r in embedding_pca(embeddings.repartition(16), iters=3).orderBy("idx").collect()]
    assert one == many


def test_pca_moment_sums_exact(spark):
    """Moment rows agree with a hand-computed tiny case."""
    from csp_gateway_spark.operators.similarity import pca_moment_sums

    df = spark.createDataFrame(
        [(1, [1.0, 2.0]), (2, [3.0, 4.0])], "vec_id long, embedding array<double>"
    )
    rows = {(r["i"], r["j"]): r["s"] for r in pca_moment_sums(df, scale=1).collect()}
    assert rows[(-1, -1)] == 2
    assert rows[(0, -1)] == 4 and rows[(1, -1)] == 6
    assert rows[(0, 0)] == 10 and rows[(0, 1)] == 14 and rows[(1, 1)] == 20


def test_pca_empty_raises(spark):
    from csp_gateway_spark.operators.similarity import embedding_pca

    df = spark.createDataFrame([(1, [1.0, 2.0])], "vec_id long, embedding array<double>")
    with pytest.raises(Exception):
        embedding_pca(df.filter("vec_id < 0"), dim=2)


# ---------------------------------------------------------------------------
# Product quantization (similarity.py::pq_train/pq_encode/pq_search)
# ---------------------------------------------------------------------------


def _pq_exact_l2_topk(embeddings, query_vec, topk, exclude_id=0):
    from csp_gateway_spark.operators.similarity import _as_double, _sq_dist

    q = F.lit([float(x) for x in query_vec]).cast("array<double>")
    return [
        r["vec_id"]
        for r in (
            embeddings.filter(F.col("vec_id") != exclude_id)
            .select("vec_id", _sq_dist(_as_double(F.col("embedding")), q).alias("d"))
            .orderBy("d", "vec_id")
            .limit(topk)
            .collect()
        )
    ]


def test_pq_encode_shape_and_determinism(embeddings):
    from csp_gateway_spark.operators.similarity import pq_encode, pq_train

    cb = pq_train(embeddings, m=8, k=16, iters=0)
    assert len(cb) == 8 and len(cb[0]) == 16 and len(cb[0][0]) == 8
    codes = {r["vec_id"]: list(r["codes"]) for r in pq_encode(embeddings, cb).collect()}
    again = {r["vec_id"]: list(r["codes"]) for r in pq_encode(embeddings, cb).collect()}
    assert codes == again
    assert all(len(c) == 8 and all(0 <= x < 16 for x in c) for c in codes.values())


def test_pq_train_refinement_reduces_quantization_error(embeddings):
    from csp_gateway_spark.operators.similarity import (
        _as_double,
        _sq_dist,
        pq_encode,
        pq_train,
    )

    def qerr(cb):
        m, dsub = len(cb), len(cb[0][0])
        codes = pq_encode(embeddings, cb)
        joined = embeddings.join(codes, "vec_id")
        err = None
        for j in range(m):
            sub = F.slice(_as_double(F.col("embedding")), j * dsub + 1, dsub)
            # reconstruct subspace j from its code and accumulate sq error
            cent = F.element_at(
                F.lit(cb[j]).cast("array<array<double>>"), F.col("codes")[j] + 1
            )
            e = _sq_dist(sub, cent)
            err = e if err is None else err + e
        return joined.select(F.avg(err).alias("e")).collect()[0]["e"]

    e0 = qerr(pq_train(embeddings, m=8, k=16, iters=0))
    e2 = qerr(pq_train(embeddings, m=8, k=16, iters=2))
    assert e2 < e0  # Lloyd rounds strictly improve on this data


def test_pq_train_partitioning_invariant(embeddings):
    from csp_gateway_spark.operators.similarity import pq_train

    one = pq_train(embeddings.coalesce(1), m=4, k=8, iters=1)
    many = pq_train(embeddings.repartition(16), m=4, k=8, iters=1)
    assert one == many  # exact fixed-point sums: bit-identical centroids


def test_pq_search_recall_against_exact(embeddings, query_vec):
    from csp_gateway_spark.operators.similarity import pq_encode, pq_search, pq_train

    cb = pq_train(embeddings, m=8, k=16, iters=2)
    codes = pq_encode(embeddings.filter(F.col("vec_id") != 0), cb)
    got = [r["vec_id"] for r in pq_search(codes, cb, query_vec, topk=20).collect()]
    exact = _pq_exact_l2_topk(embeddings, query_vec, 20)
    # quantized recall@20 on near-uniform data: require meaningful overlap
    assert len(set(got) & set(exact)) >= 4
    assert len(got) == 20


def test_pq_search_plan_shape(embeddings, query_vec):
    from csp_gateway_spark.operators.similarity import pq_encode, pq_search, pq_train

    cb = pq_train(embeddings, m=8, k=16, iters=0)
    codes = pq_encode(embeddings, cb)
    plan = pq_search(codes, cb, query_vec, topk=5)._jdf.queryExecution().executedPlan().toString()
    assert "TakeOrderedAndProject" in plan
    enc_plan = codes._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in enc_plan  # encode is a pure projection


def test_pq_rejects_bad_dims(embeddings, query_vec):
    from csp_gateway_spark.operators.similarity import pq_search, pq_train

    with pytest.raises(ValueError, match="divisible"):
        pq_train(embeddings, m=7, k=4)
    cb = pq_train(embeddings, m=8, k=4)
    with pytest.raises(ValueError, match="query dim"):
        pq_search(embeddings, cb, [1.0, 2.0], topk=3)


def test_embedding_standardize_moments(spark):
    from csp_gateway_spark.operators.similarity import embedding_standardize

    import numpy as np

    rng = np.random.RandomState(5)
    vecs = rng.uniform(-1, 1, size=(400, 8)) * np.array([10.0, 1, 1, 1, 1, 1, 1, 0.1])
    df = spark.createDataFrame(
        [(i, [float(x) for x in vecs[i]]) for i in range(400)],
        "vec_id long, embedding array<double>",
    )
    out = embedding_standardize(df)
    mat = np.array([r["embedding"] for r in out.orderBy("vec_id").collect()])
    # every dimension ~zero-mean, ~unit-variance after standardization
    assert np.abs(mat.mean(axis=0)).max() < 0.01
    assert np.abs(mat.std(axis=0) - 1.0).max() < 0.01
    # partitioning invariance: exact fixed-point moments
    again = np.array(
        [r["embedding"] for r in embedding_standardize(df.repartition(16)).orderBy("vec_id").collect()]
    )
    assert (mat == again).all()


def test_hard_negatives_excludes_query_label(embeddings, query_vec):
    from csp_gateway_spark.operators.similarity import hard_negatives

    qlabel = embeddings.filter(F.col("vec_id") == 0).collect()[0]["label"]
    out = hard_negatives(embeddings, query_vec, qlabel, k=10)
    rows = out.collect()
    assert len(rows) == 10
    got_labels = {
        r["label"]
        for r in embeddings.filter(
            F.col("vec_id").isin([x["vec_id"] for x in rows])
        ).collect()
    }
    assert qlabel not in got_labels


def test_kcenter_sample_hand_computed(spark):
    """Greedy farthest-point on a 1-D line: seed = min id (x=0), then
    always the point maximizing the min distance to the chosen set."""
    import pytest

    from csp_gateway_spark.operators.similarity import kcenter_sample

    # ids 0..4 at positions 0, 1, 10, 11, 5
    pts = [(0, [0.0]), (1, [1.0]), (2, [10.0]), (3, [11.0]), (4, [5.0])]
    df = spark.createDataFrame(pts, "vec_id long, embedding array<float>")
    got = [
        (r.sel_round, r.vec_id, r.d2_scaled)
        for r in kcenter_sample(df, k=4, scale=1).collect()
    ]
    # round 2: farthest from 0 is x=11 (id 3, d²=121); round 3: farthest
    # from {0,11} is x=5 (id 4, d²=25); round 4: {0,11,5} -> x=1? d²=1,
    # x=10? min(100,1,25)=1 -> tie on d²=1 -> lower id wins (id 1)
    assert got == [(1, 0, 0), (2, 3, 121), (3, 4, 25), (4, 1, 1)]
    # k beyond the point count stops early; k<1 rejects
    assert kcenter_sample(df, k=9, scale=1).count() == 5
    with pytest.raises(ValueError, match="k must be"):
        kcenter_sample(df, k=0)


def test_semantic_decontaminate_flags_planted_leak(spark):
    """A corpus vector equal to an eval vector is flagged with cos=1
    and the smallest eval id on ties; unrelated vectors stay clean."""
    import pyspark.sql.functions as F

    from csp_gateway_spark.operators.similarity import semantic_decontaminate

    dim = 8
    leak = [1.0, 0.0] * 4
    ortho = [0.0, 1.0] * 4
    corpus = spark.createDataFrame(
        [(1, leak), (2, ortho)], "vec_id long, embedding array<float>"
    )
    evals = spark.createDataFrame(
        [(100, leak), (101, leak), (102, [0.5] + [0.0] * 7)],
        "vec_id long, embedding array<float>",
    )
    got = semantic_decontaminate(
        corpus, evals, dim=dim, threshold=0.95, bits=4
    ).collect()
    assert len(got) == 1
    r = got[0]
    assert r.vec_id == 1 and r.eval_id == 100 and abs(r.cos - 1.0) < 1e-12
