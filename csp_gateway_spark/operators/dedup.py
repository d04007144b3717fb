"""Deduplication operators for training-data pipelines at 100 TB scale.

Five families (SURVEY §7.8 additive surface):
- exact:      hash-groupBy on normalized content — one shuffle on the
              content hash, map-side partial agg.
- minhash:    shingle → minhash signature → LSH bands → bucket join.
              Candidate generation is the banded bucket join (shuffle on
              band hash, bucket sizes bounded), never an all-pairs join.
- simhash:    64-bit token-hash sign aggregate; near-dup = small
              Hamming distance; candidates via 16-bit chunk banding
              (pigeonhole: dist<=3 ⇒ some chunk equal).
- ngram jaccard: exact verification of candidate pairs.
- embedding:  cosine near-dup; see similarity.py for the ANN path.

All expressions are native Spark SQL functions — JVM codegen, no
Python in the hot path.  Hashing defaults to xxhash64 (fast); the
md5-prefix variant exists for engine-agnostic oracle checks.
"""

from __future__ import annotations

from typing import Optional, Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from csp_gateway_spark.operators.text import norm_tokens, normalize_text, tokens


def _validated_df_cap(cap: Optional[int], op: str) -> Optional[int]:
    """Validate a document-frequency fan-out cap (the
    ``max_fp_frequency`` / ``max_ngram_frequency`` contract shared by
    the pair generators).  A cap below 2 can never emit a pair — a
    config mistake the serving layer surfaces as a structured 422
    (ValueError → contract-guard mapping)."""
    if cap is None:
        return None
    cap = int(cap)
    if cap < 2:
        raise ValueError(
            f"{op}: max_ngram_frequency must be >= 2 (a shingle must "
            f"appear in at least two documents to form a pair); got {cap}"
        )
    return cap


# --------------------------------------------------------------------------
# exact dedup
# --------------------------------------------------------------------------

def exact_dedup(df: DataFrame, text_col: str = "text", id_col: str = "doc_id", normalized: bool = True) -> DataFrame:
    """Keep the lowest-id representative per distinct (normalized)
    content hash.  groupBy(md5) + min(id) → shuffle keyed on the hash,
    combiner reduces map-side."""
    content = normalize_text(F.col(text_col)) if normalized else F.col(text_col)
    h = F.md5(content).alias("content_hash")
    return df.groupBy(h).agg(F.min(F.col(id_col)).alias(id_col), F.count(F.lit(1)).alias("n_dups"))


# --------------------------------------------------------------------------
# shingling + hashing
# --------------------------------------------------------------------------

def shingles(col: Column, k: int = 3) -> Column:
    """Distinct word k-shingles of normalized text (column form).

    The token array is bound as a HOF LAMBDA VARIABLE
    (``transform(array(toks), t -> ...)[0]``) so the per-index
    ``slice`` reads a bound value: higher-order functions run
    interpreted (no codegen subexpression elimination), and slicing an
    inlined tokenizer expression would re-run the whole regex chain
    once per shingle position — quadratic in document length (the
    winnow_fingerprints lesson, measured 9× there)."""
    toks_expr = norm_tokens(col)

    def _build(toks):
        n = F.size(toks)
        idx = F.sequence(F.lit(1), F.greatest(n - (k - 1), F.lit(0)))
        sh = F.transform(idx, lambda i: F.concat_ws(" ", F.slice(toks, i, k)))
        return F.array_distinct(
            F.when(n >= k, sh).otherwise(F.array(F.concat_ws(" ", toks)))
        )

    return F.transform(F.array(toks_expr), _build)[0]


def shingle_rows(df: DataFrame, text_col: str = "text", id_col: str = "doc_id", k: int = 3) -> DataFrame:
    """(id, shingle) rows for a whole corpus, built incrementally:
    posexplode tokens → window lead(k-1) per doc → concat.  One narrow
    shuffle on id; each token is materialized exactly once.  Documents
    shorter than k tokens contribute their whole text as one shingle
    (matching ``shingles``).  May emit duplicate shingles per doc —
    harmless for MIN-based signatures.

    A scan-local bound-lambda form (explode the per-doc shingle array)
    was tried and REVERTED: interpreted HOF slices copy k strings per
    position, which at blocking k=12 measured 2.5× slower warm (and
    ~10× cold) than this codegen'd window-lead plan — the narrow
    shuffle is cheaper than leaving whole-stage codegen."""
    from pyspark.sql.window import Window

    toks = norm_tokens(F.col(text_col))
    tok_rows = df.select(F.col(id_col), F.size(toks).alias("_n"), F.posexplode(toks).alias("_p", "_t"))
    w = Window.partitionBy(id_col).orderBy("_p")
    leads = [F.col("_t")] + [F.lead("_t", i).over(w) for i in range(1, k)]
    long_docs = (
        tok_rows.filter(F.col("_n") >= k)
        .select(F.col(id_col), F.concat_ws(" ", *leads).alias("_s"), F.lead("_t", k - 1).over(w).alias("_ok"))
        .filter(F.col("_ok").isNotNull())
        .select(id_col, "_s")
    )
    short_docs = (
        df.select(F.col(id_col), toks.alias("_tk"))
        .filter(F.size("_tk") < k)
        .select(F.col(id_col), F.concat_ws(" ", F.col("_tk")).alias("_s"))
    )
    return long_docs.unionByName(short_docs)


def _hash64(col: Column, seed: int) -> Column:
    return F.xxhash64(col, F.lit(seed))


def _hash_md5_hex(col: Column, seed: int) -> Column:
    """Engine-agnostic hash: first 15 hex chars of md5(seed||':'||s).
    Fixed length ⇒ lexicographic order == numeric order, so an
    engine-portable minhash needs no hex→int conversion.  DuckDB
    mirror: substr(md5(seed||':'||s), 1, 15)."""
    return F.substring(F.md5(F.concat(F.lit(f"{seed}:"), col)), 1, 15)


# Portable fast minhash family: ONE md5 per shingle (the expensive part),
# then per-seed 2-universal affine rehash h_i = (a_i·x + c_i) mod 2³¹−1
# over the 28-bit base x = int(md5[:7], 16).  This is the standard
# datasketch-style permutation family — independent random multipliers,
# NOT Kirsch-Mitzenmacher h1+i·h2 (which collapses band diversity for
# min-over-set hashing; see the note in ``minhash_signatures``).
# DuckDB mirror: (a_i * ('0x'||substr(md5(s),1,7))::BIGINT + c_i) % p.
_AFFINE_P = (1 << 31) - 1


def _affine_coeffs(num: int, seed: int = 11) -> list[tuple[int, int]]:
    """Deterministic (a_i, c_i) pairs from a seeded LCG — reproducible on
    any engine because they are inlined as literals."""
    state = seed
    out = []
    for _ in range(num):
        state = (state * 6364136223846793005 + 1442695040888963407) % (1 << 64)
        a = (state >> 33) % (_AFFINE_P - 1) + 1
        state = (state * 6364136223846793005 + 1442695040888963407) % (1 << 64)
        c = (state >> 33) % _AFFINE_P
        out.append((a, c))
    return out


def _md5_base(col: Column) -> Column:
    """28-bit integer base hash: int(md5(s)[:7], 16) — one md5 per value."""
    return F.conv(F.substring(F.md5(col), 1, 7), 16, 10).cast("long")


def _md5_base15(col: Column) -> Column:
    """60-bit integer hash: int(md5(s)[:15], 16) — portable wide variant
    (SimHash needs one bit per output position)."""
    return F.conv(F.substring(F.md5(col), 1, 15), 16, 10).cast("long")


def minhash_signature(col: Column, num_hashes: int = 32, k: int = 3, oracle_safe: bool = False) -> Column:
    """Array of ``num_hashes`` min-hash values over word k-shingles.

    The shingle array is bound ONCE as a HOF lambda variable; writing
    it as a plain sub-expression would inline the whole shingle
    pipeline into every hash (num_hashes× re-evaluation under the
    interpreted HOF path).  Row-wise min-hash remains a column
    expression; the explode-based scale path is
    ``minhash_signatures`` (explode → hash → groupBy-min).
    ``oracle_safe`` uses md5-hex hashing (portable); default xxhash64.
    """
    sh_expr = shingles(col, k)
    hf = _hash_md5_hex if oracle_safe else _hash64

    def _with_seed(seed: int):
        # single-arg lambda: F.transform passes (element, index) to
        # two-arg callables, which would clobber a default-arg seed
        return lambda s: hf(s, seed)

    return F.transform(
        F.array(sh_expr),
        lambda sh: F.array(
            *[F.array_min(F.transform(sh, _with_seed(i))) for i in range(num_hashes)]
        ),
    )[0]


def minhash_signatures(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    num_hashes: int = 32,
    k: int = 3,
    oracle_safe: bool = False,
) -> DataFrame:
    """(id, sig: array) per document, computed the scalable way:

    1. shingle once per doc (single evaluation of the regexp pipeline),
    2. explode to (id, shingle) rows — scan-local, no shuffle,
    3. num_hashes cheap scalar hashes per row (codegen),
    4. groupBy(id).agg(min ...) — ONE shuffle, map-side combine.

    90× faster than the column-expression form at 32 hashes.
    """
    # NOTE: per-seed independent hashes are REQUIRED — Kirsch-
    # Mitzenmacher double hashing (h1 + i*h2) was tried and reverted:
    # min-over-shingles of correlated h_i collapses band diversity
    # (every band collides), exploding candidates 4× slower AND
    # breaking recall.  KM is safe for Bloom filters, not MinHash.
    # (Affine a_i·x + c_i with per-seed random multipliers does NOT
    # have that failure: the argmin permutes with each multiplier.)
    sh_rows = shingle_rows(df, text_col, id_col, k)
    if oracle_safe:
        coeffs = _affine_coeffs(num_hashes)
        based = sh_rows.select(id_col, _md5_base(F.col("_s")).alias("_x"))
        hashed = based.select(
            id_col,
            *[
                ((F.lit(a) * F.col("_x") + F.lit(c)) % F.lit(_AFFINE_P)).alias(f"_h{i}")
                for i, (a, c) in enumerate(coeffs)
            ],
        )
    else:
        hashed = sh_rows.select(
            id_col, *[_hash64(F.col("_s"), i).alias(f"_h{i}") for i in range(num_hashes)]
        )
    agg = hashed.groupBy(id_col).agg(
        *[F.min(f"_h{i}").alias(f"_m{i}") for i in range(num_hashes)]
    )
    return agg.select(
        id_col, F.array(*[F.col(f"_m{i}") for i in range(num_hashes)]).alias("sig")
    )


# --------------------------------------------------------------------------
# MinHash + LSH candidate pairs
# --------------------------------------------------------------------------

def band_key(sig: Column, band: int, rows: int, oracle_safe: bool = False) -> Column:
    """Bucket key for one LSH band of a minhash signature — the single
    source of truth shared by the batch pair join and the streaming
    twin (streaming/dedup_stream.py), so their candidate sets agree by
    construction."""
    sl = F.slice(sig, band * rows + 1, rows)
    if oracle_safe:
        # portable key: delimited concat of the band's minhash values —
        # collision-free and engine-reproducible (DuckDB array_to_string)
        return F.concat_ws("|", F.transform(sl, lambda x: x.cast("string")))
    return F.xxhash64(sl)


def minhash_candidate_pairs(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    num_hashes: int = 32,
    bands: int = 8,
    k: int = 3,
    oracle_safe: bool = False,
    signatures: Optional[DataFrame] = None,
) -> DataFrame:
    """RAW banded-LSH candidate pairs (id_a, id_b) — the un-verified
    candidate set of :func:`minhash_lsh_pairs`, factored out (r14) so
    callers that need the same candidates twice (pair verification +
    recall evaluation) build them once.  Returns the pairs already
    ``localCheckpoint``ed (they are bounded by real near-dups and
    every caller consumes them multiple times).

    ``signatures``: optionally inject a prebuilt
    ``minhash_signatures`` frame (see :func:`dedup_index`; r14)."""
    rows = num_hashes // bands
    # no manual materialization before the join: both self-join sides
    # share an identical shuffle, so Spark's ReusedExchange computes
    # signatures once (verified: a localCheckpoint was ~1.7× slower)
    sig = (
        signatures
        if signatures is not None
        else minhash_signatures(df, text_col, id_col, num_hashes, k, oracle_safe=oracle_safe)
    )

    banded = sig.select(
        id_col,
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(b).alias("band"),
                        band_key(F.col("sig"), b, rows, oracle_safe).alias("bh"),
                    )
                    for b in range(bands)
                ]
            )
        ).alias("bk"),
    ).select(id_col, "bk.band", "bk.bh")
    pairs = (
        banded.alias("a")
        .join(
            banded.alias("b"),
            (F.col("a.band") == F.col("b.band"))
            & (F.col("a.bh") == F.col("b.bh"))
            & (F.col(f"a.{id_col}") < F.col(f"b.{id_col}")),
        )
        .select(
            F.col(f"a.{id_col}").alias("id_a"),
            F.col(f"b.{id_col}").alias("id_b"),
        )
        .dropDuplicates(["id_a", "id_b"])
    )
    # The verify stage references the pairs THREE times (id set for the
    # semi-join + both sides of the pair join); without a cut the whole
    # signature+banding pipeline re-executes per reference.  Pairs are
    # tiny (bounded by real near-dups), so materializing them is free.
    return pairs.localCheckpoint()


def minhash_lsh_pairs(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    num_hashes: int = 32,
    bands: int = 8,
    k: int = 3,
    jaccard_threshold: Optional[float] = None,
    oracle_safe: bool = False,
    candidates: Optional[DataFrame] = None,
) -> DataFrame:
    """Candidate near-dup pairs via banded MinHash LSH, optionally
    verified with exact shingle Jaccard.

    Plan shape: signature scan (no shuffle) → explode bands (xB) →
    self-join on (band, band_hash) = shuffle keyed on band hash →
    distinct pairs → optional verify join back to shingle sets.
    No O(n²) stage; bucket join size is bounded by collision groups.

    ``candidates`` optionally injects a prebuilt
    :func:`minhash_candidate_pairs` frame (same num_hashes/bands/k/
    oracle_safe — the caller vouches) so the signature+banding
    pipeline is skipped (r14).

    ``oracle_safe`` switches both the signature hash and the band key
    to engine-portable forms (md5-hex minhashes, concat band key) so an
    external engine can replicate the candidate set exactly; default is
    xxhash64 (faster, engine-specific).
    """
    if candidates is None:
        candidates = minhash_candidate_pairs(
            df, text_col, id_col, num_hashes, bands, k, oracle_safe
        )
    out = ngram_jaccard_pairs(df, candidates, text_col=text_col, id_col=id_col, k=k)
    if jaccard_threshold is not None:
        out = out.filter(F.col("jaccard") >= jaccard_threshold)
    return out


def ngram_jaccard_pairs(
    df: DataFrame,
    candidate_pairs: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    k: int = 3,
) -> DataFrame:
    """Exact n-gram Jaccard for given (id_a, id_b) candidate pairs —
    the verify stage after any candidate generator.  Shingles are
    computed only for documents appearing in a candidate pair (semi
    join first): verification cost scales with candidates, not corpus."""
    cand_ids = (
        candidate_pairs.select(F.col("id_a").alias("_cid"))
        .union(candidate_pairs.select(F.col("id_b").alias("_cid")))
        .distinct()
    )
    docs = df.join(cand_ids, df[id_col] == cand_ids["_cid"], "left_semi")
    sh = docs.select(F.col(id_col), shingles(F.col(text_col), k).alias("sh"))
    return (
        candidate_pairs.join(sh.withColumnRenamed(id_col, "id_a").withColumnRenamed("sh", "sh_a"), "id_a")
        .join(sh.withColumnRenamed(id_col, "id_b").withColumnRenamed("sh", "sh_b"), "id_b")
        .withColumn(
            "jaccard",
            F.size(F.array_intersect("sh_a", "sh_b")) / F.size(F.array_union("sh_a", "sh_b")),
        )
        .drop("sh_a", "sh_b")
    )


# --------------------------------------------------------------------------
# SimHash
# --------------------------------------------------------------------------

def simhash(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    bits: int = 64,
    oracle_safe: bool = False,
) -> DataFrame:
    """SimHash per document (64-bit default).

    For each token t: h = hash64(t); bit i of the simhash is 1 iff
    sum over tokens of sign(bit_i(h)) > 0.  Computed fully native:
    explode tokens → ``bits`` conditional sums → reassemble.  One
    shuffle on id; token explosion is scan-local.

    ``oracle_safe`` swaps xxhash64 for the engine-portable 60-bit
    ``int(md5(tok)[:15], 16)`` (DuckDB:
    ``('0x'||substr(md5(tok),1,15))::BIGINT``) — callers should then
    use ``bits<=60``.

    The per-bit counts aggregate PACKED, 3 bits per long accumulator
    in 20-bit lanes (lane value = count of tokens with that hash bit
    set; a lane saturates only past 2^20 distinct tokens per doc —
    far above any real document): ``bits/3`` sum states per group
    instead of ``bits``.  Bit i of the simhash is then 1 iff
    2·cnt1_i > n, identical to the ±1-sum definition the oracle uses.

    PLAN-BUILD COST (round-14 root-cause, superseding the r13
    "regex tokenize" theory): the 2.4× oracle ratio was almost all
    *driver-side Column construction* — building the 60 packed lane
    terms + the 60-term reconstruction through the Python Column API
    issues ~800 py4j round-trips (~1.5 s measured at sf0.1) while the
    actual execution of the whole job is ~0.3 s.  The bit-twiddling
    expressions are therefore rendered as SQL strings and bound with
    ONE ``F.expr`` call per output column (~80 round-trips total);
    generated code and executed plan are identical.
    """
    h = _md5_base15(F.col("tok")) if oracle_safe else F.xxhash64("tok")
    toks = df.select(
        F.col(id_col),
        F.explode(F.array_distinct(norm_tokens(F.col(text_col)))).alias("tok"),
    ).withColumn("h", h)
    lanes_per_long, lane_bits = 3, 20
    n_acc = (bits + lanes_per_long - 1) // lanes_per_long
    packs = []
    for a in range(n_acc):
        lane_terms = []
        for lane in range(lanes_per_long):
            i = a * lanes_per_long + lane
            if i >= bits:
                break
            lane_terms.append(
                f"shiftleft(cast(shiftright(h, {i}) & 1 as long), {lane_bits * lane})"
            )
        packs.append(F.expr(" + ".join(lane_terms)).alias(f"p{a}"))
    sums = toks.select(F.col(id_col), *packs).groupBy(id_col).agg(
        F.count(F.lit(1)).alias("_n"),
        *[F.sum(f"p{a}").alias(f"s{a}") for a in range(n_acc)],
    )
    lane_mask = (1 << lane_bits) - 1

    def _cnt1(i: int) -> str:
        a, lane = divmod(i, lanes_per_long)
        return f"(shiftright(s{a}, {lane_bits * lane}) & {lane_mask})"

    # shiftleft(1L, i) instead of a literal: bit 63 ({1<<63}) exceeds
    # the bigint literal range but is representable as a shift (wraps
    # to Long.MIN_VALUE, the two's-complement sign bit) — constant-
    # folded at analysis either way.
    recon = " + ".join(
        f"(CASE WHEN {_cnt1(i)} * 2 > _n THEN shiftleft(1L, {i}) ELSE 0L END)"
        for i in range(bits)
    )
    sh = sums.select(F.col(id_col), F.expr(recon).alias("simhash"))
    return sh


def simhash_pairs(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    max_hamming: int = 3,
) -> DataFrame:
    """Near-dup pairs by SimHash: candidates via 16-bit chunk equality
    (pigeonhole guarantees recall for dist <= 3), verified by exact
    Hamming distance ≤ ``max_hamming``."""
    sh = simhash(df, text_col, id_col)
    chunks = sh.select(
        id_col,
        "simhash",
        F.explode(
            F.array(
                *[
                    F.struct(F.lit(c).alias("chunk"), F.shiftrightunsigned(F.col("simhash"), 16 * c).bitwiseAND(F.lit(0xFFFF)).alias("cv"))
                    for c in range(4)
                ]
            )
        ).alias("ck"),
    ).select(id_col, "simhash", "ck.chunk", "ck.cv")
    pairs = (
        chunks.alias("a")
        .join(
            chunks.alias("b"),
            (F.col("a.chunk") == F.col("b.chunk"))
            & (F.col("a.cv") == F.col("b.cv"))
            & (F.col(f"a.{id_col}") < F.col(f"b.{id_col}")),
        )
        .select(
            F.col(f"a.{id_col}").alias("id_a"),
            F.col(f"b.{id_col}").alias("id_b"),
            F.col("a.simhash").alias("sh_a"),
            F.col("b.simhash").alias("sh_b"),
        )
        .dropDuplicates(["id_a", "id_b"])
    )
    return (
        pairs.withColumn("hamming", F.bit_count(F.col("sh_a").bitwiseXOR(F.col("sh_b"))))
        .filter(F.col("hamming") <= max_hamming)
        .drop("sh_a", "sh_b")
    )


# --------------------------------------------------------------------------
# embedding cosine near-dup
# --------------------------------------------------------------------------

def cosine(a: Column, b: Column) -> Column:
    """Cosine similarity of two float array columns, JVM-side.
    Zero-norm vectors yield NULL (try_divide), not an ANSI error."""
    dot = F.aggregate(F.zip_with(a, b, lambda x, y: x * y), F.lit(0.0), lambda acc, v: acc + v)
    na = F.sqrt(F.aggregate(a, F.lit(0.0), lambda acc, v: acc + v * v))
    nb = F.sqrt(F.aggregate(b, F.lit(0.0), lambda acc, v: acc + v * v))
    return F.try_divide(dot, na * nb)


def embedding_neardup_pairs(
    df: DataFrame,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    threshold: float = 0.95,
    bucket_col: Optional[str] = None,
) -> DataFrame:
    """Pairs with cosine ≥ threshold (exact, expression-based).  With
    ``bucket_col`` (an LSH bucket from similarity.lsh_bucket or any
    blocking key) the join is per-bucket; without it, all-pairs.
    Row-at-a-time dot products — prefer ``embedding_neardup_blocked``
    (numpy matmul over block pairs, ~30× faster) for unblocked runs."""
    v = df.select(F.col(id_col), F.col(vec_col).cast("array<double>").alias("v"), *( [F.col(bucket_col)] if bucket_col else []))
    cond = F.col(f"a.{id_col}") < F.col(f"b.{id_col}")
    if bucket_col:
        cond = cond & (F.col(f"a.{bucket_col}") == F.col(f"b.{bucket_col}"))
    return (
        v.alias("a")
        .join(v.alias("b"), cond)
        .select(
            F.col(f"a.{id_col}").alias("id_a"),
            F.col(f"b.{id_col}").alias("id_b"),
            cosine(F.col("a.v"), F.col("b.v")).alias("cos"),
        )
        .filter(F.col("cos") >= threshold)
    )


def _estimated_rows(df: DataFrame) -> Optional[int]:
    """Metadata-only row estimate from Catalyst statistics — no job runs.

    Uses the optimized plan's ``rowCount`` when CBO stats exist, else
    ``sizeInBytes / schema.defaultSize()``.  For parquet sources
    sizeInBytes is the file size while defaultSize undercounts variable
    width columns, so the estimate errs toward MORE rows — which for
    block sizing means smaller tiles (memory-safe), never larger ones.
    """
    try:
        stats = df._jdf.queryExecution().optimizedPlan().stats()
        rc = stats.rowCount()
        if rc.isDefined():
            return max(1, int(str(rc.get())))
        width = max(8, int(df._jdf.schema().defaultSize()))
        return max(1, int(str(stats.sizeInBytes())) // width)
    except Exception:  # noqa: BLE001 — py4j surface varies across versions
        return None


def embedding_neardup_blocked(
    df: DataFrame,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    threshold: float = 0.95,
    block_rows: int = 4096,
    n_rows: Optional[int] = None,
) -> DataFrame:
    """Exact all-pairs cosine ≥ threshold via blocked matrix multiply.

    Plan: pack vectors into row-blocks (groupBy block id → one row per
    block holding an id list + matrix), cross-join block pairs
    (B·(B+1)/2 combos), numpy matmul per pair inside mapInPandas.
    This is the canonical distributed all-pairs-similarity layout: work
    is O(n²·d) flops but executed as dense BLAS on (block × block)
    tiles, each tile a task — embarrassingly parallel, bounded memory
    (2 · block_rows · d · 8 bytes per task).  Blocks are hash-assigned
    so skew is impossible.

    This is the exact VERIFIER: O(n²) flops is inherent to an exact
    all-pairs similarity join, so at corpus scale run it only within
    LSH buckets (``similarity.lsh_bucket`` + ``embedding_neardup_pairs``)
    or on candidate subsets.  Block count comes from ``n_rows`` (pass it
    when known) or a metadata-only Catalyst estimate — plan construction
    runs no Spark job.
    """
    import pandas as pd  # noqa: F401 — needed on executors

    n = n_rows if n_rows is not None else (_estimated_rows(df) or 0)
    if n <= 0:
        # no statistics at all: size blocks off the scan's parallelism
        n = block_rows * max(1, df.rdd.getNumPartitions())
    n_blocks = max(1, -(-n // block_rows))
    v = df.select(
        F.col(id_col).alias("_id"),
        F.col(vec_col).cast("array<double>").alias("_v"),
        (F.crc32(F.col(id_col).cast("string")) % n_blocks).cast("int").alias("_blk"),
    )
    packed = v.groupBy("_blk").agg(
        F.collect_list("_id").alias("ids"), F.collect_list("_v").alias("vecs")
    ).localCheckpoint()  # B rows; cut so the block cross-join reads it once
    combos = (
        packed.alias("a")
        .join(packed.alias("b"), F.col("a._blk") <= F.col("b._blk"))
        .select(
            F.col("a._blk").alias("blk_a"),
            F.col("a.ids").alias("ids_a"),
            F.col("a.vecs").alias("vecs_a"),
            F.col("b._blk").alias("blk_b"),
            F.col("b.ids").alias("ids_b"),
            F.col("b.vecs").alias("vecs_b"),
        )
        .repartition(max(n_blocks * (n_blocks + 1) // 2, 1))
    )

    thr = float(threshold)

    def tile(batches):
        import numpy as np
        import pandas as pd

        for pdf in batches:
            out_a, out_b, out_c = [], [], []
            for _, row in pdf.iterrows():
                ids_a = np.asarray(row["ids_a"])
                ids_b = np.asarray(row["ids_b"])
                ma = np.stack([np.asarray(x) for x in row["vecs_a"]])
                mb = np.stack([np.asarray(x) for x in row["vecs_b"]])
                na = np.linalg.norm(ma, axis=1)
                nb = np.linalg.norm(mb, axis=1)
                sims = (ma @ mb.T) / np.outer(na, nb)
                ia, ib = np.nonzero(sims >= thr)
                if len(ia):
                    va, vb = ids_a[ia], ids_b[ib]
                    if row["blk_a"] == row["blk_b"]:
                        # diagonal tile: each {x,y} appears at (i,j) AND
                        # (j,i) — keep one orientation, drop self-pairs
                        keep = va < vb
                        lo, hi = va[keep], vb[keep]
                    else:
                        # off-diagonal tile: ids are disjoint across
                        # blocks and each pair appears once — keep all,
                        # canonicalize orientation
                        keep = np.ones(len(va), dtype=bool)
                        lo = np.minimum(va, vb)
                        hi = np.maximum(va, vb)
                    out_a.append(lo)
                    out_b.append(hi)
                    out_c.append(sims[ia, ib][keep])
            if out_a:
                yield pd.DataFrame(
                    {
                        "id_a": np.concatenate(out_a),
                        "id_b": np.concatenate(out_b),
                        "cos": np.concatenate(out_c),
                    }
                )
            else:
                yield pd.DataFrame({"id_a": pd.Series([], dtype="int64"), "id_b": pd.Series([], dtype="int64"), "cos": pd.Series([], dtype="float64")})

    return combos.mapInPandas(tile, schema="id_a long, id_b long, cos double")


def fingerprint_overlap_pairs(
    df: DataFrame,
    min_shared: int = 2,
    k: int = 4,
    window: int = 4,
    text_col: str = "text",
    id_col: str = "doc_id",
    max_fp_frequency: Optional[int] = 256,
) -> DataFrame:
    """Candidate containment/plagiarism pairs via shared winnowing
    fingerprints (the MOSS detection step over
    ``corpus.winnow_fingerprints``): documents sharing ≥ ``min_shared``
    fingerprints share long verbatim token runs — the overlap signal
    set-Jaccard MinHash underweights when one document CONTAINS
    another much larger one.

    Plan shape mirrors the LSH pair join: fingerprint rows self-join
    keyed on the fingerprint hash, one count aggregate per pair — no
    all-pairs stage.  Output: ``(id_a, id_b, shared)``.

    ``max_fp_frequency`` bounds the self-join fan-out BY CONTRACT (the
    ``max_touches_per_conversion`` pattern, analytics.py attribution):
    a fingerprint appearing in more than that many documents is
    boilerplate — a license header, a template — whose bucket would
    join quadratically (a df-10⁶ fingerprint alone yields ~10¹² pairs
    at corpus scale) while carrying no plagiarism signal; those
    fingerprints are dropped before the join.  The document-frequency
    count rides one hash shuffle on ``fp`` — the same key the
    self-join shuffles on.  ``None`` disables the cap.
    """
    from pyspark.sql.window import Window

    from csp_gateway_spark.operators.corpus import winnow_fingerprints

    fps = winnow_fingerprints(
        df, k=k, window=window, text_col=text_col, id_col=id_col
    )
    if max_fp_frequency is not None:
        fps = (
            fps.withColumn(
                "_df", F.count(F.lit(1)).over(Window.partitionBy("fp"))
            )
            .filter(F.col("_df") <= int(max_fp_frequency))
            .drop("_df")
        )
    # the fingerprint table feeds BOTH sides of the self-join — one
    # bounded materialization (≈ tokens/window rows per doc) instead
    # of running the tokenize+window-min winnowing pipeline twice
    fps = fps.localCheckpoint(eager=False)
    a = fps.select(F.col(id_col).alias("id_a"), "fp")
    b = fps.select(F.col(id_col).alias("id_b"), "fp")
    return (
        a.join(b, "fp")
        .filter(F.col("id_a") < F.col("id_b"))
        .groupBy("id_a", "id_b")
        .agg(F.count(F.lit(1)).alias("shared"))
        .filter(F.col("shared") >= min_shared)
    )


# ---------------------------------------------------------------------------
# Exact substring dedup (Lee et al. 2022, "Deduplicating Training Data
# Makes Language Models Better") — repeated-span detection
# ---------------------------------------------------------------------------


def repeated_ngram_spans(
    df: DataFrame,
    k: int = 8,
    min_count: int = 2,
    text_col: str = "text",
    id_col: str = "doc_id",
    grams: Optional[DataFrame] = None,
) -> DataFrame:
    """Token spans covered by k-grams that occur ≥ ``min_count`` times
    across the whole corpus — the exact-substring dedup signal: any
    substring of ≥ k tokens repeated anywhere (cross-doc or within-doc)
    is covered by at least one repeated k-gram, so masking the returned
    spans removes every repeat of length ≥ 2k-1 and truncates shorter
    ones.

    Plan: positioned k-gram hash rows (posexplode + lead window, one
    narrow shuffle on doc id) → global hash-count (map-side combined) →
    semi-join grams against repeated hashes (shuffle keyed on the
    60-bit hash — fixed-width keys; a suffix array this is not, and
    does not need to be: the hash-count shuffle IS the scalable
    replacement) → per-doc interval merge of overlapping [pos, pos+k)
    windows (gaps-and-islands, doc-partitioned window functions).

    Span positions are TOKEN indexes (0-based, end exclusive) into the
    normalized token stream.  Output: ``(id, span_start, span_end,
    n_grams)`` sorted within doc.
    """
    from pyspark.sql.window import Window

    if grams is None:
        toks = norm_tokens(F.col(text_col))
        tok_rows = df.select(F.col(id_col), F.posexplode(toks).alias("_p", "_t"))
        w = Window.partitionBy(id_col).orderBy("_p")
        leads = [F.col("_t")] + [F.lead("_t", i).over(w) for i in range(1, k)]
        grams = (
            tok_rows.select(
                F.col(id_col),
                F.col("_p"),
                _md5_base15(F.concat_ws(" ", *leads)).alias("_h"),
                F.lead("_t", k - 1).over(w).alias("_ok"),
            )
            .filter(F.col("_ok").isNotNull())
            .select(id_col, "_p", "_h")
        )
        # the positioned-gram table feeds BOTH the global hash count and
        # the semi-join probe; without a checkpoint the posexplode + lead
        # window + per-position md5 runs twice
        grams = grams.localCheckpoint(eager=False)
    # else: caller supplies a (id, _p, _h) positioned-gram table with
    # identical positions (0-based) and hashes for len>=k docs only.
    repeated = (
        grams.groupBy("_h")
        .agg(F.count(F.lit(1)).alias("_n"))
        .filter(F.col("_n") >= min_count)
        .select("_h")
    )
    hits = grams.join(repeated, "_h", "left_semi")
    wp = Window.partitionBy(id_col).orderBy("_p")
    prev_end = F.max(F.col("_p") + F.lit(k)).over(
        wp.rowsBetween(Window.unboundedPreceding, -1)
    )
    islands = hits.select(
        F.col(id_col),
        "_p",
        F.when(F.col("_p") > F.coalesce(prev_end, F.lit(-1)), 1)
        .otherwise(0)
        .alias("_new"),
    ).select(
        id_col,
        "_p",
        F.sum("_new").over(wp.rowsBetween(Window.unboundedPreceding, 0)).alias("_island"),
    )
    return (
        islands.groupBy(id_col, "_island")
        .agg(
            F.min("_p").alias("span_start"),
            (F.max("_p") + F.lit(k)).alias("span_end"),
            F.count(F.lit(1)).alias("n_grams"),
        )
        .select(id_col, "span_start", "span_end", "n_grams")
    )


def drop_repeated_spans(
    df: DataFrame,
    k: int = 8,
    min_count: int = 2,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Apply ``repeated_ngram_spans`` as a transform: remove every
    token inside a repeated span and reassemble the surviving tokens —
    the "dedup by masking" form of exact substring dedup.  Returns
    ``(id, text, n_dropped)`` with the cleaned (normalized) text.

    The span table is joined back equi-keyed on the doc id (the range
    condition is a residual filter, not a join explosion) and the
    reassembly is one position-ordered aggregation."""
    spans = repeated_ngram_spans(df, k, min_count, text_col, id_col)
    toks = norm_tokens(F.col(text_col))
    tok_rows = df.select(F.col(id_col), F.posexplode(toks).alias("_p", "_t"))
    joined = tok_rows.join(
        spans.select(id_col, "span_start", "span_end"),
        on=[
            tok_rows[id_col] == spans[id_col],
            F.col("_p") >= F.col("span_start"),
            F.col("_p") < F.col("span_end"),
        ],
        how="left_anti",
    )
    kept = joined.groupBy(id_col).agg(
        F.concat_ws(
            " ",
            F.transform(
                F.array_sort(F.collect_list(F.struct("_p", "_t"))), lambda s: s["_t"]
            ),
        ).alias("text"),
    )
    totals = df.select(F.col(id_col), F.size(toks).alias("_n_toks"))
    return (
        totals.join(kept, id_col, "left")
        .select(
            id_col,
            F.coalesce(F.col("text"), F.lit("")).alias("text"),
            (
                F.col("_n_toks")
                - F.size(F.filter(F.split(F.coalesce(F.col("text"), F.lit("")), " "), lambda t: t != F.lit("")))
            ).cast("long").alias("n_dropped"),
        )
    )


def shared_ngram_pairs(
    df: DataFrame,
    k: int = 12,
    text_col: str = "text",
    id_col: str = "doc_id",
    max_ngram_frequency: Optional[int] = 256,
    sh: Optional[DataFrame] = None,
) -> DataFrame:
    """Candidate pairs (id_a < id_b) of documents sharing at least one
    token k-gram — the cheapest exact blocking generator (tight k ⇒
    few collisions).

    ``sh`` optionally injects the prebuilt distinct (id, shingle-hash)
    table (same k/text_col/id_col — shared with
    :func:`containment_pairs`; r14) so the shingle scan runs once.  Plan: per-doc DISTINCT shingle hashes (one
    map-side-combined projection) self-joined ON the 60-bit hash —
    shuffle keyed on the shingle hash, candidate cost ∝ collisions,
    never O(n²).  Feed the pairs to a verifier (``edit_verify``,
    ``ngram_jaccard_pairs``) or a graph step (``pagerank``,
    ``connected_components``).

    ``max_ngram_frequency`` bounds the in-bucket pair expansion BY
    CONTRACT (the ``fingerprint_overlap_pairs`` / ``max_fp_frequency``
    pattern): a shingle appearing in more than that many documents is
    boilerplate — a license header, a template — whose bucket would
    expand to df²/2 pairs inside ONE task row while carrying no
    duplication signal (every one of those pairs is also reachable
    through some rarer shared shingle if the docs genuinely overlap).
    Buckets above the cap are dropped BEFORE the expansion; the
    document-frequency check is free (``size(_ids)`` on the already-
    grouped bucket).  ``None`` disables the cap (exact candidate
    semantics on a corpus known boilerplate-free)."""
    cap = _validated_df_cap(max_ngram_frequency, "shared_ngram_pairs")
    if sh is None:
        sh = (
            shingle_rows(df, text_col, id_col, k)
            .select(F.col(id_col), _md5_base15(F.col("_s")).alias("_h"))
            .distinct()
        )
    # bucket-group instead of self-join: one shuffle on the shingle
    # hash, then in-bucket pair expansion over the (collision-bounded)
    # id array — the self-join form cost two extra exchanges because
    # AQE's broadcast conversion defeated exchange reuse.  `_ids` is
    # the DISTINCT doc set per hash, so size(_ids) IS the shingle's
    # document frequency — the boilerplate cap rides the same filter.
    buckets = (
        sh.groupBy("_h")
        .agg(F.sort_array(F.collect_list(F.col(id_col))).alias("_ids"))
        .filter(
            (F.size("_ids") > 1)
            if cap is None
            else F.size("_ids").between(2, cap)
        )
    )
    combos = F.flatten(
        F.transform(
            F.col("_ids"),
            lambda x, i: F.transform(
                F.slice(F.col("_ids"), i + F.lit(2), F.size(F.col("_ids"))),
                lambda y: F.struct(x.alias("id_a"), y.alias("id_b")),
            ),
        )
    )
    return (
        buckets.select(F.explode(combos).alias("_p"))
        .select(F.col("_p.id_a"), F.col("_p.id_b"))
        .distinct()
    )


def edit_verify(
    pairs: DataFrame,
    docs: DataFrame,
    threshold: float = 0.4,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Edit-distance verification of candidate pairs: normalized
    Levenshtein ``lev(a, b) / max(len(a), len(b))`` ≤ ``threshold``.
    The O(len²) distance runs ONLY on candidate pairs (bounded by the
    blocking stage, never the corpus square) and entirely JVM-side
    (``F.levenshtein`` — no Python).  Integer distance + one double
    division ⇒ engine-exact (DuckDB ``levenshtein`` is the same unit-
    cost metric).  Returns (id_a, id_b, dist, sim) with
    ``sim = 1 − normalized distance``."""
    t = docs.select(F.col(id_col), F.col(text_col))
    a = t.select(F.col(id_col).alias("id_a"), F.col(text_col).alias("_ta"))
    b = t.select(F.col(id_col).alias("id_b"), F.col(text_col).alias("_tb"))
    joined = pairs.join(a, "id_a").join(b, "id_b")
    dist = F.levenshtein("_ta", "_tb")
    denom = F.greatest(F.length("_ta"), F.length("_tb"))
    norm = dist.cast("double") / denom.cast("double")
    return (
        joined.select(
            "id_a",
            "id_b",
            dist.alias("dist"),
            (F.lit(1.0) - norm).alias("sim"),
        )
        .filter(F.lit(1.0) - F.col("sim") <= F.lit(float(threshold)))
    )


def dedup_index(
    df: DataFrame,
    num_hashes: int = 32,
    bands: int = 8,
    k: int = 3,
    text_col: str = "text",
    id_col: str = "doc_id",
    oracle_safe: bool = False,
    signatures: Optional[DataFrame] = None,
) -> DataFrame:
    """(id, band, bh): the LSH band-bucket index of a corpus — the
    PERSISTENT half of incremental near-dedup.  Build it once over the
    existing corpus, write it with ``persist_dedup_index``
    (partitioned by band), and every new ingest batch probes it with
    ``dedup_probe`` — no rescan of the old corpus, which is the only
    workable shape when the corpus is 100 TB and the daily delta is
    1 TB.  Same ``band_key`` as ``minhash_lsh_pairs``/streaming, so
    all three faces agree on candidates by construction.

    ``signatures`` optionally injects a prebuilt
    ``minhash_signatures(df, ...)`` frame (same num_hashes/k/
    oracle_safe — signatures are per-doc deterministic, so a shared
    table filtered to ``df``'s ids is identical; r14)."""
    rows = num_hashes // bands
    sig = (
        signatures
        if signatures is not None
        else minhash_signatures(df, text_col, id_col, num_hashes, k, oracle_safe=oracle_safe)
    )
    return sig.select(
        F.col(id_col),
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(b).alias("band"),
                        band_key(F.col("sig"), b, rows, oracle_safe).alias("bh"),
                    )
                    for b in range(bands)
                ]
            )
        ).alias("bk"),
    ).select(id_col, "bk.band", "bk.bh")


def persist_dedup_index(index: DataFrame, path: str, mode: str = "overwrite") -> None:
    """Write the band index partitioned by band: a probe that explodes
    a batch into per-band keys joins band-partition-to-band-partition,
    and single-band maintenance (rebuilds, compaction) prunes at the
    file-listing level."""
    index.write.mode(mode).partitionBy("band").parquet(path)


def dedup_probe(
    new_docs: DataFrame,
    index: DataFrame,
    num_hashes: int = 32,
    bands: int = 8,
    k: int = 3,
    text_col: str = "text",
    id_col: str = "doc_id",
    oracle_safe: bool = False,
    signatures: Optional[DataFrame] = None,
) -> DataFrame:
    """Probe a new batch against an existing corpus index: distinct
    (new_id, matched_id) candidate pairs where any LSH band collides.
    Cost ∝ batch size + collisions — the old corpus is touched only
    through its (much smaller) band index.  Feed survivors to
    ``ngram_jaccard_pairs``/``edit_verify`` for verification, or
    left-anti the hit ids to admit only novel documents.

    ``signatures``: see :func:`dedup_index` (r14)."""
    probe = dedup_index(
        new_docs, num_hashes, bands, k, text_col, id_col, oracle_safe,
        signatures=signatures,
    ).select(F.col(id_col).alias("new_id"), "band", "bh")
    hits = probe.join(
        index.select(F.col(id_col).alias("matched_id"), "band", "bh"), ["band", "bh"]
    )
    return hits.select("new_id", "matched_id").distinct()


def cdc_chunks(
    df: DataFrame,
    window: int = 16,
    divisor: int = 64,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Content-defined chunking (the LBFS/rsync family —
    Muthitacharoen et al. 2001): cut a document wherever the hash of
    the trailing ``window`` chars ≡ 0 (mod ``divisor``), yielding
    chunks of expected length ``divisor`` whose BOUNDARIES MOVE WITH
    THE CONTENT — an insertion reshapes only the chunk it lands in,
    so chunk-hash dedup keeps matching everything downstream (fixed
    chunking would shift every subsequent boundary and match nothing).

    This is the pure content-defined variant WITHOUT FastCDC's
    min/max-size clamps — deliberately: the clamps make each boundary
    depend on the previous one (sequential per doc), while the pure
    predicate is per-position, so boundary detection parallelizes
    freely (one narrow shuffle of (id, position) boundary rows to
    reassemble per-doc cut lists).  Expected chunk length is still
    ``divisor``; pathological long chunks are possible and harmless
    for dedup.

    Returns (id, chunk_idx, start, length, chash) — ``chash`` is the
    md5 hex of the chunk text; group by it for cross-corpus chunk
    dedup (storage-level dedup, boilerplate extraction).  Engine-
    portable: every hash is md5 (DuckDB mirror in the gate oracle).

    Hot-path note: the per-position window hash runs as an EXPLODED
    row projection, not inside a ``transform`` lambda — Spark executes
    higher-order-function lambdas on the interpreted path, which made
    the md5-per-position 25× slower than the same expression under
    whole-stage codegen (measured 37 s → 1.5 s at sf0.1).  The explode
    shuffles only (id, int) boundary rows (≈ len/divisor per doc).
    """
    t = F.col(text_col)
    n = F.length(t)
    # boundary positions via explode + codegen'd md5 projection
    pos = df.filter(n >= window).select(
        F.col(id_col),
        F.explode(F.sequence(F.lit(window), n)).alias("_i"),
        t.alias("_t"),
    )
    sub = F.col("_t").substr(F.col("_i") - F.lit(window - 1), F.lit(window))
    if 256 % divisor == 0:
        # residue shortcut (round 14): _md5_base is conv(md5[:7]) —
        # 28 bits = (20-bit prefix)·256 + low byte, and 256 ≡ 0
        # (mod divisor) whenever divisor | 256, so the residue is
        # the LOW BYTE's alone: conv over hex chars 6-7 instead of
        # 1-7 (the 7-char base-16 parse measured 0.37 s of the
        # per-position loop at sf0.1).  Value-identical predicate.
        boundary = (
            F.conv(F.substring(F.md5(sub), 6, 2), 16, 10).cast("long")
            % F.lit(divisor)
            == 0
        )
    else:
        boundary = _md5_base(sub) % F.lit(divisor) == 0
    bnd = (
        pos.filter(boundary)
        .groupBy(id_col)
        .agg(F.sort_array(F.collect_list("_i")).alias("_ends"))
    )
    ends = F.coalesce(F.col("_ends"), F.array().cast("array<int>"))
    cuts = F.concat(F.array(F.lit(0)), ends, F.array(n))
    df = df.join(bnd, id_col, "left")
    spans = F.filter(
        F.zip_with(
            F.slice(cuts, 1, F.size(cuts) - 1),
            F.slice(cuts, 2, F.size(cuts) - 1),
            lambda a, b: F.struct(a.alias("s"), (b - a).alias("l")),
        ),
        lambda sp: sp["l"] > 0,
    )
    return (
        df.filter(n > 0)
        .select(F.col(id_col), t.alias("_t"), F.posexplode(spans).alias("chunk_idx", "_sp"))
        .select(
            id_col,
            "chunk_idx",
            F.col("_sp.s").alias("start"),
            F.col("_sp.l").alias("length"),
            F.md5(F.col("_t").substr(F.col("_sp.s") + 1, F.col("_sp.l"))).alias("chash"),
        )
    )


def cdc_dedup_stats(chunks: DataFrame) -> DataFrame:
    """One-row summary of chunk-level redundancy: total vs distinct
    chunks/bytes — the dedup-ratio a CDC store would achieve.  Two
    map-side-combined aggregates over the chunk table."""
    per_hash = chunks.groupBy("chash").agg(
        F.count(F.lit(1)).alias("_n"), F.first("length").alias("_l")
    )
    return per_hash.agg(
        F.sum("_n").cast("long").alias("total_chunks"),
        F.count(F.lit(1)).cast("long").alias("distinct_chunks"),
        F.sum(F.col("_n") * F.col("_l")).cast("long").alias("total_bytes"),
        F.sum("_l").cast("long").alias("distinct_bytes"),
    )


def bag_fingerprint(col: Column) -> Column:
    """Order-insensitive document fingerprint: md5 of the SORTED
    normalized token multiset.  Catches duplicates that reorder
    sentences/paragraphs (listing pages, shuffled boilerplate), which
    the exact hash misses and MinHash only catches probabilistically —
    at zero candidate-generation cost.  Scan-local expression."""
    return F.md5(F.concat_ws(" ", F.array_sort(norm_tokens(col))))


def bag_dedup(
    df: DataFrame, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """One row per token-multiset fingerprint: kept (minimum) id and
    duplicate count — one map-side-combined aggregation, the
    ``url_dedup``/``exact_dedup`` shape on the order-insensitive key."""
    return (
        df.select(F.col(id_col), bag_fingerprint(F.col(text_col)).alias("bag_fp"))
        .groupBy("bag_fp")
        .agg(F.min(id_col).alias("keep_id"), F.count(F.lit(1)).alias("n_dups"))
    )


def ngram_novelty(
    df: DataFrame,
    k: int = 8,
    text_col: str = "text",
    id_col: str = "doc_id",
    sh: Optional[DataFrame] = None,
) -> DataFrame:
    """Per-document novelty profile: the fraction of the doc's DISTINCT
    k-gram shingles that occur in no other document — low novelty ⇒
    boilerplate/template/near-copy, high ⇒ unique content.  The
    complement of dedup: instead of dropping duplicates it SCORES how
    duplicated each doc's content is (useful as a mixing weight and as
    a memorization-risk signal).

    Plan: shingles collapse to their 60-bit ``_md5_base15`` hash
    INSIDE the scan — a ``transform`` over the per-doc token array
    hashes each k-slice and the explode emits (doc, long) rows, so
    there is NO pre-shingle exchange and no window at all (the
    window-lead ``shingle_rows`` plan pays a full token shuffle; for
    this consumer, which only ever needs the hash, the scan-local
    array form measured 0.5 s faster at sf0.1 and moves 8-byte longs
    into every downstream shuffle instead of ~60-byte strings).  The
    engine-portable hash means the DuckDB oracle sees the identical —
    astronomically rare — collision set, so counts stay engine-exact.
    TWO aggregates over the one checkpointed hash table — per-doc
    ``count_distinct`` gram counts (map-side partial dedup, no
    separate distinct stage), and a per-hash document-frequency pass
    keeping ONLY df==1 rows (a novel shingle belongs to exactly one
    document, so ``min(doc)`` IS its owner and the novel counts come
    from a second tiny groupBy) — then broadcast joins of the bounded
    doc-keyed frames.  No shingle-table self-join.  Cost ∝ corpus
    shingle count, same as the MinHash signature pass.
    """
    if sh is None:
        toks = norm_tokens(F.col(text_col))
        grams = F.when(
            F.size("_tk") >= k,
            F.transform(
                F.sequence(F.lit(1), F.size("_tk") - F.lit(k - 1)),
                lambda i: _md5_base15(F.concat_ws(" ", F.slice("_tk", i, k))),
            ),
        ).otherwise(F.array(_md5_base15(F.concat_ws(" ", F.col("_tk")))))
        sh = (
            df.select(F.col(id_col), toks.alias("_tk"))
            .select(F.col(id_col), F.explode(grams).alias("_s"))
            .localCheckpoint(eager=False)
        )
    # else: caller supplies (id, _s) gram-hash rows with identical
    # semantics (all k-slices for len>=k docs, whole-doc hash below k;
    # per-doc duplicates tolerated — both aggregates below dedup).
    counts = sh.groupBy(id_col).agg(F.count_distinct("_s").alias("n_grams"))
    novel = (
        sh.groupBy("_s")
        .agg(
            F.count_distinct(F.col(id_col)).alias("_df"),
            F.min(F.col(id_col)).alias("_owner"),
        )
        .filter(F.col("_df") == 1)
        .groupBy(F.col("_owner").alias(id_col))
        .agg(F.count(F.lit(1)).alias("novel_grams"))
    )
    per_doc = counts.join(F.broadcast(novel), id_col, "left").select(
        F.col(id_col),
        F.col("n_grams"),
        F.coalesce(F.col("novel_grams"), F.lit(0)).alias("novel_grams"),
    )
    return df.select(id_col).join(F.broadcast(per_doc), id_col, "left").select(
        F.col(id_col),
        F.coalesce(F.col("n_grams"), F.lit(0)).alias("n_grams"),
        F.coalesce(F.col("novel_grams"), F.lit(0)).alias("novel_grams"),
        F.when(
            F.col("n_grams").isNotNull() & (F.col("n_grams") > 0),
            F.col("novel_grams").cast("double") / F.col("n_grams").cast("double"),
        )
        .otherwise(F.lit(0.0))
        .alias("novelty"),
    )


def source_overlap(
    df: DataFrame,
    k: int = 8,
    source_col: str = "source",
    text_col: str = "text",
    sh: Optional[DataFrame] = None,
) -> DataFrame:
    """Cross-source n-gram overlap matrix: for every pair of sources,
    how many distinct token ``k``-grams they share and the Jaccard of
    their shingle sets — the data-mixing diagnostic that catches two
    "different" sources scraping the same sites before they both go
    into a training mix.

    Shingles come from the incremental ``shingle_rows`` path (posexplode
    + lead — each token materialized once) with the source label carried
    through the per-doc window inside a struct id (no join back).  ONE
    shuffle keyed on the shingle hash collapses each hash to its sorted
    distinct source set (``collect_set`` — map-side partial aggregation,
    and the (source, hash) dedup for free); source pairs then expand
    SCAN-LOCALLY over that ≤|sources| array (the r14 rewrite dropped
    the distinct + two-sided hash self-join: 3 full-shingle-set
    exchanges → 1).  Per-source set sizes come off the same grouped
    frame and broadcast back for the Jaccard.
    Output: (src_a, src_b, shared, jaccard)."""
    id_col = "doc_id"
    if sh is None:
        tagged = df.select(
            F.struct(F.col(id_col), F.col(source_col).alias("_src")).alias("_ds"),
            F.col(text_col),
        )
        sh = shingle_rows(tagged, text_col, "_ds", k).select(
            F.col("_ds._src").alias("_src"),
            _md5_base15(F.col("_s")).alias("_h"),
        )
    # else: caller supplies (_src, _h) gram-hash rows with identical
    # semantics (duplicates tolerated — collect_set dedups).
    grouped = sh.groupBy("_h").agg(F.sort_array(F.collect_set("_src")).alias("_ss"))
    # one materialization feeds both consumers (sizes + pair counts)
    grouped = grouped.localCheckpoint(eager=False)
    sizes = (
        grouped.select(F.explode("_ss").alias("_src"))
        .groupBy("_src")
        .agg(F.count(F.lit(1)).alias("_sz"))
    )
    shared = (
        grouped.select(
            F.explode(
                F.expr(
                    "flatten(transform(_ss, (x, i) -> "
                    "transform(slice(_ss, i + 2, size(_ss)), "
                    "y -> struct(x AS src_a, y AS src_b))))"
                )
            ).alias("_p")
        )
        .select("_p.src_a", "_p.src_b")
        .groupBy("src_a", "src_b")
        .agg(F.count(F.lit(1)).alias("shared"))
    )
    sa = sizes.select(F.col("_src").alias("src_a"), F.col("_sz").alias("_sa"))
    sb = sizes.select(F.col("_src").alias("src_b"), F.col("_sz").alias("_sb"))
    return (
        shared.join(F.broadcast(sa), "src_a")
        .join(F.broadcast(sb), "src_b")
        .select(
            "src_a",
            "src_b",
            "shared",
            (
                F.col("shared").cast("double")
                / (F.col("_sa") + F.col("_sb") - F.col("shared")).cast("double")
            ).alias("jaccard"),
        )
    )


def containment_pairs(
    df: DataFrame,
    k: int = 12,
    text_col: str = "text",
    id_col: str = "doc_id",
    threshold: float = 0.5,
    max_ngram_frequency: Optional[int] = 256,
    sh: Optional[DataFrame] = None,
) -> DataFrame:
    """Asymmetric n-gram CONTAINMENT pairs: C(A→B) = |A∩B| / |A| over
    distinct token ``k``-gram sets — the quote/subset detector
    symmetric Jaccard misses (a short doc fully embedded in a long one
    scores containment 1.0 but Jaccard ≈ |A|/|B|).  The standard
    dedup screen for boilerplate wrappers and partial scrapes.

    Plan (same blocking discipline as ``shared_ngram_pairs``): per-doc
    DISTINCT shingle hashes (one map-side-combined projection), ONE
    shuffle keyed on the 60-bit shingle hash, in-bucket pair expansion
    over the collision-bounded id array, then a (pair → shared-count)
    aggregate; per-doc set sizes join back on the doc key
    (co-partitioned equi-joins, never a corpus-sized broadcast).
    Emits pairs where max(C(A→B), C(B→A)) ≥ ``threshold``.
    Output: (id_a, id_b, shared, c_ab, c_ba).

    ``max_ngram_frequency`` caps the in-bucket expansion by document
    frequency exactly as in :func:`shared_ngram_pairs` — a boilerplate
    shingle shared by m documents would otherwise expand to m²/2 pairs
    in one bucket row (one task).  Dropped buckets also leave the
    shared-count numerator, so a capped run scores containment over
    the sub-boilerplate shingle sets on BOTH sides of the ratio —
    consistent, and the per-doc denominators keep their full size so
    capped scores are conservative (never inflated).  ``None``
    disables the cap.

    ``sh``: see :func:`shared_ngram_pairs` — the shared distinct
    (id, shingle-hash) table injection (r14)."""
    cap = _validated_df_cap(max_ngram_frequency, "containment_pairs")
    if sh is None:
        sh = (
            shingle_rows(df, text_col, id_col, k)
            .select(F.col(id_col), _md5_base15(F.col("_s")).alias("_h"))
            .distinct()
        )
    sizes = sh.groupBy(id_col).agg(F.count(F.lit(1)).alias("_sz"))
    buckets = (
        sh.groupBy("_h")
        .agg(F.sort_array(F.collect_list(F.col(id_col))).alias("_ids"))
        .filter(
            (F.size("_ids") > 1)
            if cap is None
            else F.size("_ids").between(2, cap)
        )
    )
    combos = F.flatten(
        F.transform(
            F.col("_ids"),
            lambda x, i: F.transform(
                F.slice(F.col("_ids"), i + F.lit(2), F.size(F.col("_ids"))),
                lambda y: F.struct(x.alias("id_a"), y.alias("id_b")),
            ),
        )
    )
    shared = (
        buckets.select(F.explode(combos).alias("_p"))
        .groupBy(F.col("_p.id_a").alias("id_a"), F.col("_p.id_b").alias("id_b"))
        .agg(F.count(F.lit(1)).alias("shared"))
    )
    sa = sizes.select(F.col(id_col).alias("id_a"), F.col("_sz").alias("_sza"))
    sb = sizes.select(F.col(id_col).alias("id_b"), F.col("_sz").alias("_szb"))
    j = shared.join(sa, "id_a").join(sb, "id_b")
    c_ab = F.col("shared").cast("double") / F.col("_sza").cast("double")
    c_ba = F.col("shared").cast("double") / F.col("_szb").cast("double")
    return (
        j.select(
            "id_a",
            "id_b",
            "shared",
            c_ab.alias("c_ab"),
            c_ba.alias("c_ba"),
        )
        .filter(F.greatest(F.col("c_ab"), F.col("c_ba")) >= F.lit(float(threshold)))
    )


def lsh_recall_eval(
    df: DataFrame,
    truth_threshold: float = 0.5,
    num_hashes: int = 16,
    bands: int = 4,
    k: int = 3,
    block_k: int = 12,
    text_col: str = "text",
    id_col: str = "doc_id",
    oracle_safe: bool = False,
    blocking_pairs: Optional[DataFrame] = None,
    candidates: Optional[DataFrame] = None,
    scored_pairs: Optional[DataFrame] = None,
) -> DataFrame:
    """Candidate-generator quality evaluation: precision/recall of the
    banded MinHash-LSH candidate set against an exact-Jaccard ground
    truth — the tuning report that tells you whether (num_hashes,
    bands) is catching the near-dups before you commit a corpus-scale
    run.

    ``candidates`` optionally injects the prebuilt
    :func:`minhash_candidate_pairs` frame — the raw candidate set IS
    the evaluated set (the former path verified every candidate's
    Jaccard only to drop the column, an entire semi-join + two-sided
    shingle join the plan never needed; r14).  ``scored_pairs``
    optionally injects the (id_a, id_b, jaccard)-scored blocking
    pairs (shared with :func:`dedup_threshold_sweep`) so the truth
    side skips its verify pass too.

    Ground truth = pairs sharing a ``block_k``-gram (exact blocking,
    collision-bounded) whose ``k``-shingle Jaccard ≥
    ``truth_threshold`` — i.e. recall is measured against the
    exact-blocking family, which is itself a superset heuristic; both
    generators are corpus-linear, so the eval costs two candidate
    passes plus a pair-keyed join, never n².  Pass ``blocking_pairs``
    (a precomputed ``shared_ngram_pairs(df, k=block_k)`` table, e.g. a
    shared checkpoint) to skip re-running the blocking scan.  Output:
    one row (n_truth, n_candidates, n_tp, precision, recall)."""
    if scored_pairs is None:
        if blocking_pairs is None:
            blocking_pairs = shared_ngram_pairs(
                df, k=block_k, text_col=text_col, id_col=id_col
            )
        scored_pairs = ngram_jaccard_pairs(
            df, blocking_pairs,
            text_col=text_col, id_col=id_col, k=k,
        )
    truth = (
        scored_pairs
        .filter(F.col("jaccard") >= truth_threshold)
        .select("id_a", "id_b")
        .localCheckpoint(eager=False)
    )
    if candidates is None:
        candidates = minhash_candidate_pairs(
            df,
            text_col=text_col,
            id_col=id_col,
            num_hashes=num_hashes,
            bands=bands,
            k=k,
            oracle_safe=oracle_safe,
        )
    cand = candidates.select("id_a", "id_b")
    tp = cand.join(truth, ["id_a", "id_b"])
    nt = truth.agg(F.count(F.lit(1)).alias("n_truth"))
    nc = cand.agg(F.count(F.lit(1)).alias("n_candidates"))
    ntp = tp.agg(F.count(F.lit(1)).alias("n_tp"))
    return (
        nc.crossJoin(F.broadcast(nt))
        .crossJoin(F.broadcast(ntp))
        .select(
            "n_truth",
            "n_candidates",
            "n_tp",
            (
                F.col("n_tp").cast("double") / F.col("n_candidates").cast("double")
            ).alias("precision"),
            (F.col("n_tp").cast("double") / F.col("n_truth").cast("double")).alias(
                "recall"
            ),
        )
    )


def dedup_threshold_sweep(
    df: DataFrame,
    thresholds: Sequence[float] = (0.5, 0.7, 0.8, 0.9),
    k: int = 3,
    block_k: int = 12,
    text_col: str = "text",
    id_col: str = "doc_id",
    blocking_pairs: Optional[DataFrame] = None,
    scored_pairs: Optional[DataFrame] = None,
) -> DataFrame:
    """Dedup-threshold tuning report: for each candidate Jaccard
    cutoff, how many blocked candidate pairs verify at-or-above it and
    how many distinct documents are implicated — the sweep to run
    BEFORE committing a corpus-scale dedup threshold (too low eats
    real data, too high leaves near-dups in).

    One blocking pass (``shared_ngram_pairs``, or a precomputed/shared
    ``blocking_pairs`` table) + one Jaccard verify produce a scored
    pair table bounded by real near-dups; the sweep itself is a tiny
    broadcast cross of that table with the threshold list — adding
    thresholds costs nothing.  Output per threshold: (threshold,
    n_pairs, n_docs), zero-filled, ordered by threshold.

    ``scored_pairs`` optionally injects the (id_a, id_b, jaccard)
    verify output (shared with :func:`lsh_recall_eval`'s truth side;
    r14) so the verify join runs once per process."""
    if scored_pairs is None:
        if blocking_pairs is None:
            blocking_pairs = shared_ngram_pairs(
                df, k=block_k, text_col=text_col, id_col=id_col
            )
        scored_pairs = ngram_jaccard_pairs(
            df, blocking_pairs, text_col=text_col, id_col=id_col, k=k
        )
    scored = scored_pairs.select(
        "id_a", "id_b", "jaccard"
    ).localCheckpoint(eager=False)
    tf = df.sparkSession.createDataFrame(
        [(float(t),) for t in thresholds], "threshold double"
    )
    pairs = (
        scored.crossJoin(F.broadcast(tf))
        .filter(F.col("jaccard") >= F.col("threshold"))
        .groupBy("threshold")
        .agg(F.count(F.lit(1)).alias("_np"))
    )
    docs = (
        scored.select(
            "jaccard", F.explode(F.array(F.col("id_a"), F.col("id_b"))).alias("_doc")
        )
        .crossJoin(F.broadcast(tf))
        .filter(F.col("jaccard") >= F.col("threshold"))
        .groupBy("threshold")
        .agg(F.count_distinct(F.col("_doc")).alias("_nd"))
    )
    return (
        tf.join(pairs, "threshold", "left")
        .join(docs, "threshold", "left")
        .select(
            "threshold",
            F.coalesce(F.col("_np"), F.lit(0)).cast("long").alias("n_pairs"),
            F.coalesce(F.col("_nd"), F.lit(0)).cast("long").alias("n_docs"),
        )
        .orderBy("threshold")
    )


def prefix_dup_groups(
    df: DataFrame,
    k: int = 8,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Duplicate groups by identical first-``k``-token prefix — the
    cheap truncation-duplicate screen (same article cut at different
    lengths shares its opening even when exact dedup misses it).

    One projection computes each doc's normalized k-token prefix, one
    hash aggregate groups on it; output only groups with > 1 doc.
    Output: (prefix, n_docs, min_doc)."""
    from csp_gateway_spark.operators.text import norm_tokens

    pre = df.select(
        F.col(id_col),
        F.array_join(F.slice(norm_tokens(F.col(text_col)), 1, k), " ").alias(
            "prefix"
        ),
    )
    return (
        pre.groupBy("prefix")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.min(F.col(id_col)).alias("min_doc"),
        )
        .filter(F.col("n_docs") > 1)
    )
