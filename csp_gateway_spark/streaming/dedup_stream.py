"""Streaming near-duplicate detection — the streaming twin of the
batch MinHash-LSH family (``operators/dedup.py``).

The reference has no streaming dedup (SURVEY §2.3); this is the
streaming face of the additive §7.8 dedup surface, completing the
batch/streaming pairing that state, HLL sketches, and joins already
have.

Design (every stage chosen for bounded state):

- **Signatures are stateless.**  Batch computes signatures with
  explode→groupBy-min (one shuffle) because a corpus scan amortizes
  it; a stream sees each document as ONE row, so the column-expression
  signature (``minhash_signature``) computes the full minhash array
  per row with zero shuffle and zero state.
- **Banding is a stateless explode** using the SAME ``band_key``
  expression as the batch join — candidate sets agree by construction.
- **The band-bucket self-join is the one real stateful operator**: a
  stream-stream inner join keyed on ``(band, bh)`` with a symmetric
  event-time range bound.  State per side ∝ documents inside the
  watermark horizon × bands — the time bound is what makes 100 TB/day
  streams feasible; widen ``join_window`` and you pay linearly in
  state store size (RocksDB-backed, see session.py).
- **Pair emission is exactly-once** via
  ``dropDuplicatesWithinWatermark`` on ``(id_a, id_b)``: a colliding
  pair fires once per matching band (up to ``bands`` times); the
  watermark-scoped drop keeps the first.

Exact-Jaccard verification joins back to document text, which a pure
stream no longer holds — run ``ngram_jaccard_pairs`` per sink batch
(``foreachBatch``) against the document store, exactly like the HLL
finalize stage (streaming/sketches.py).
"""

from __future__ import annotations

from typing import Optional

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from csp_gateway_spark.operators.dedup import band_key, minhash_signature

__all__ = ["banded_doc_stream", "exact_dedup_stream", "lsh_pair_stream", "semantic_pair_stream"]


def banded_doc_stream(
    stream: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    ts_col: str = "ts",
    num_hashes: int = 32,
    bands: int = 8,
    k: int = 3,
    watermark: str = "1 minute",
    oracle_safe: bool = False,
) -> DataFrame:
    """Document stream → ``(id, ts, band, bh)`` band-bucket rows.

    Stateless: per-row signature + band explode; the watermark is
    attached here so every downstream stateful operator inherits it.
    """
    rows = num_hashes // bands
    sig = minhash_signature(F.col(text_col), num_hashes=num_hashes, k=k, oracle_safe=oracle_safe)
    with_sig = stream.withWatermark(ts_col, watermark).select(
        F.col(id_col), F.col(ts_col), sig.alias("_sig")
    )
    return with_sig.select(
        id_col,
        ts_col,
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(b).alias("band"),
                        band_key(F.col("_sig"), b, rows, oracle_safe).alias("bh"),
                    )
                    for b in range(bands)
                ]
            )
        ).alias("bk"),
    ).select(id_col, ts_col, "bk.band", "bk.bh")


def lsh_pair_stream(
    left: DataFrame,
    right: Optional[DataFrame] = None,
    text_col: str = "text",
    id_col: str = "doc_id",
    ts_col: str = "ts",
    num_hashes: int = 32,
    bands: int = 8,
    k: int = 3,
    watermark: str = "1 minute",
    join_window: str = "5 minutes",
    oracle_safe: bool = False,
) -> DataFrame:
    """Online candidate near-dup pairs ``(id_a, id_b, ts_a)``.

    ``right`` defaults to a self-join of ``left`` (near-dups within one
    stream); pass a second readStream of the same source if the engine
    version rejects the shared-source self-join.  ``id_a < id_b`` plus
    the symmetric time bound covers both arrival orders, so each
    unordered pair within ``join_window`` of each other is emitted
    exactly once (the watermark-scoped drop collapses per-band
    re-fires).
    """
    a = banded_doc_stream(
        left, text_col, id_col, ts_col, num_hashes, bands, k, watermark, oracle_safe
    ).alias("a")
    b = banded_doc_stream(
        right if right is not None else left,
        text_col, id_col, ts_col, num_hashes, bands, k, watermark, oracle_safe,
    ).alias("b")
    iv = F.expr(f"INTERVAL {join_window}")
    pairs = a.join(
        b,
        (F.col("a.band") == F.col("b.band"))
        & (F.col("a.bh") == F.col("b.bh"))
        & (F.col(f"a.{id_col}") < F.col(f"b.{id_col}"))
        & (F.col(f"b.{ts_col}") >= F.col(f"a.{ts_col}") - iv)
        & (F.col(f"b.{ts_col}") <= F.col(f"a.{ts_col}") + iv),
    ).select(
        F.col(f"a.{id_col}").alias("id_a"),
        F.col(f"b.{id_col}").alias("id_b"),
        F.col(f"a.{ts_col}").alias("ts_a"),
    )
    # one fire per colliding band → exactly one per pair.  ts_a alone
    # carries watermark lineage into the drop (keeping both joined
    # timestamps is rejected — "More than one event time columns", and
    # re-declaring via withWatermark is "Redefining watermark"), so the
    # drop's state eviction keys directly off the joined stream's
    # delayed watermark.
    return pairs.dropDuplicatesWithinWatermark(["id_a", "id_b"])


def semantic_pair_stream(
    left: DataFrame,
    centroid_rows,
    right: Optional[DataFrame] = None,
    threshold: float = 0.9,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    ts_col: str = "ts",
    watermark: str = "1 minute",
    join_window: str = "5 minutes",
) -> DataFrame:
    """Online semantic (embedding-space) near-dup pairs — the streaming
    twin of ``semantic_dedup``'s pairwise core (SemDeDup).

    ``centroid_rows``: collected centroid rows (k·dim scalars, e.g.
    ``sample_centroids(batch_df, k).collect()``) — centroids are
    bootstrapped OFFLINE and inlined as literals, so per-row cell
    assignment (``nearest_cell_expr``) is completely stateless; the
    single stateful operator is the within-cell stream-stream
    self-join.  Unlike the LSH twin, each document lives in exactly
    ONE cell, so a pair can only match once and no dedup stage is
    needed — the join IS the answer.

    Emits ``(cell, id_a, id_b, cos, ts_a)`` with ``id_a < id_b`` and
    ``round(cos, 6) >= threshold``, for pairs arriving within
    ``join_window`` of each other.
    """
    from csp_gateway_spark.operators.dedup import cosine
    from csp_gateway_spark.operators.similarity import nearest_cell_expr

    def _assigned(stream: DataFrame) -> DataFrame:
        return stream.withWatermark(ts_col, watermark).select(
            F.col(id_col),
            F.col(ts_col),
            F.col(vec_col).cast("array<double>").alias("_v"),
            nearest_cell_expr(centroid_rows, vec_col).alias("cell"),
        )

    a = _assigned(left).alias("a")
    b = _assigned(right if right is not None else left).alias("b")
    iv = F.expr(f"INTERVAL {join_window}")
    cos = F.round(cosine(F.col("a._v"), F.col("b._v")), 6)
    return a.join(
        b,
        (F.col("a.cell") == F.col("b.cell"))
        & (F.col(f"a.{id_col}") < F.col(f"b.{id_col}"))
        & (F.col(f"b.{ts_col}") >= F.col(f"a.{ts_col}") - iv)
        & (F.col(f"b.{ts_col}") <= F.col(f"a.{ts_col}") + iv)
        & (cos >= F.lit(threshold)),
    ).select(
        F.col("a.cell").alias("cell"),
        F.col(f"a.{id_col}").alias("id_a"),
        F.col(f"b.{id_col}").alias("id_b"),
        cos.alias("cos"),
        F.col(f"a.{ts_col}").alias("ts_a"),
    )


def exact_dedup_stream(
    stream: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    ts_col: str = "ts",
    watermark: str = "1 minute",
    normalized: bool = True,
) -> DataFrame:
    """Streaming exact dedup — first arrival per (normalized) content
    hash survives; replays/duplicates inside the watermark horizon are
    dropped (state evicts beyond it, so state size ∝ distinct hashes
    per horizon, not stream length).  The batch face
    (``operators/dedup.py::exact_dedup``) keeps the MIN id per hash;
    the stream keeps the FIRST arrival — identical when arrival order
    follows id order (true for replayed changelogs)."""
    from csp_gateway_spark.operators.text import normalize_text

    content = normalize_text(F.col(text_col)) if normalized else F.col(text_col)
    hashed = stream.withWatermark(ts_col, watermark).withColumn(
        "content_hash", F.md5(content)
    )
    return hashed.dropDuplicatesWithinWatermark(["content_hash"])


def bloom_decontaminate_stream(
    stream: DataFrame,
    eval_set: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    k: int = 5,
    m_bits: int = 1 << 16,
    k_hashes: int = 4,
) -> DataFrame:
    """Streaming decontamination: flag documents on a live stream whose
    shingles hit the (static) eval set's Bloom filter — the streaming
    face of ``curation.bloom_decontaminate``.

    Fully STATELESS: the eval filter is a static broadcast table of
    set-bit positions; each micro-batch row explodes to its shingle
    probes, joins the broadcast bits, and reduces back to one flag per
    document — a stream-static broadcast join, no state store, no
    watermark requirement.  This is the shape that holds at any stream
    rate: per-row cost is k_hashes·shingles probes against an in-memory
    KB-scale table.

    Note the reduction (all k bits present per shingle, any shingle per
    doc) runs WITHIN the row's own projection — shingle/bit arrays are
    folded with higher-order functions instead of a groupBy, so the
    plan stays shuffle-free end to end.
    """
    from csp_gateway_spark.operators.curation import bloom_bits
    from csp_gateway_spark.operators.dedup import _md5_base15, shingles

    bits = sorted(
        r["bit"]
        for r in bloom_bits(eval_set, text_col, id_col, k, m_bits, k_hashes).collect()
    )
    bits_arr = F.array(*[F.lit(int(b)) for b in bits])

    def bit_of(h, i):
        hh = F.conv(
            F.substring(F.md5(F.concat(h.cast("string"), F.lit(f":bf{i}"))), 1, 15),
            16,
            10,
        ).cast("long")
        return F.pmod(hh, F.lit(m_bits))

    from functools import reduce

    sh = F.array_distinct(shingles(F.col(text_col), k))
    sh_hits = F.filter(
        F.transform(sh, lambda s: _md5_base15(s)),
        # k_hashes is a Python constant: expand the conjunction at plan
        # build time (a Column loop var here would stringify wrongly
        # into the :bf<i> hash suffix)
        lambda h: reduce(
            lambda a, b: a & b,
            [F.array_contains(bits_arr, bit_of(h, i)) for i in range(k_hashes)],
        ),
    )
    return stream.withColumn("contaminated", F.size(sh_hits) > 0)


def keyed_dedup_stream(
    stream: DataFrame,
    key_expr,
    ts_col: str = "ts",
    watermark: str = "1 minute",
    key_name: str = "dedup_key",
) -> DataFrame:
    """Streaming first-arrival dedup on ANY stateless key expression —
    the generalization behind ``exact_dedup_stream``: pass
    ``web.canonical_url(col)`` for URL-keyed dedup of a crawl stream,
    or ``dedup.bag_fingerprint(col)`` for order-insensitive content
    dedup.  State ∝ distinct keys inside the watermark horizon."""
    keyed = stream.withWatermark(ts_col, watermark).withColumn(key_name, key_expr)
    return keyed.dropDuplicatesWithinWatermark([key_name])
