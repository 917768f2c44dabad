"""Document-level deduplication family for training-data pipelines.

The same engine pieces (keys, shingles, MinHash/SimHash kernels, LSH,
verification) applied to a plain documents table
(doc_id, text, ...) — exact hash dedup, MinHash+LSH near-dup,
SimHash near-dup, blocked n-gram Jaccard, embedding-cosine near-dup.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from deduper_spark.config import FuzzyConfig
from deduper_spark.functions.keys import md5_key_expr
from deduper_spark.functions.minhash import minhash_buckets_expr, minhash_expr
from deduper_spark.functions.simhash import simhash_expr
from deduper_spark.functions.text import (
    normalize_expr,
    shingle_hashes_expr,
    shingles_expr,
    token_hashes_expr,
    tokens_expr,
)
from deduper_spark.operators.exact import ExactDedupResult, exact_dedup
from deduper_spark.operators.lsh import (
    array_band_buckets,
    candidate_pairs,
    hamming_candidate_pairs,
    int64_band_buckets,
)
from deduper_spark.operators.verify import verify_jaccard


def exact_doc_dedup(df: DataFrame, id_col: str = "doc_id",
                    text_col: str = "text") -> ExactDedupResult:
    """Exact dedup on md5(text), keep lowest id."""
    return exact_dedup(df, (text_col,), order_col=id_col)


def doc_features(df: DataFrame, id_col: str = "doc_id",
                 text_col: str = "text",
                 cfg: FuzzyConfig | None = None,
                 with_minhash: bool = True,
                 with_simhash: bool = True) -> DataFrame:
    cfg = cfg or FuzzyConfig()
    out = df.select(
        F.col(id_col).alias("id"),
        normalize_expr(F.coalesce(F.col(text_col), F.lit(""))).alias("norm_text"),
    ).withColumn("tokens", tokens_expr("norm_text"))
    out = out.withColumn(
        "shingle_hashes",
        shingle_hashes_expr(shingles_expr("tokens", cfg.shingle_k)),
    )
    if with_minhash:
        out = out.withColumn(
            "minhash_sig",
            minhash_expr("shingle_hashes", cfg.num_perm, cfg.minhash_seed),
        )
    if with_simhash:
        out = out.withColumn("simhash", simhash_expr(token_hashes_expr("tokens")))
    return out.drop("tokens")


def minhash_lsh_doc_pairs(df: DataFrame, id_col: str = "doc_id",
                          text_col: str = "text",
                          cfg: FuzzyConfig | None = None) -> DataFrame:
    """(id_l, id_r, jaccard) — verified near-dup doc pairs.

    feats is pinned with localCheckpoint: it feeds BOTH the banding
    side and the exact-Jaccard verification join, and without the pin
    the doc_features projection (normalize + shingle + minhash Arrow
    work) executes twice end-to-end — the exact double-execution the
    flagship pipeline pins at pipeline.py fuzzy_ok (measured as the
    BENCH_r02 doc_minhash_lsh 2x regression)."""
    cfg = cfg or FuzzyConfig()
    # r6 (guide §4.1/§2.3): banding is FUSED inside the minhash UDF
    # (minhash_buckets_expr, the flagship pipeline's path) so the Arrow
    # return payload is cfg.bands longs, not the num_perm-element
    # signature (8x at 128/16), and the checkpointed feature row drops
    # norm_text (dead downstream — banding reads the buckets, verify
    # reads the shingle sets). Identical verified output: banding only
    # gates CANDIDATES, and the exact-Jaccard verification is the
    # output contract (same S-curve, bands x rows unchanged).
    # tokens stays a bound column (NOT inlined into shingles_expr):
    # the shingle transform lambda references its token array several
    # times, and an inlined split/regex expression would re-evaluate
    # per window position — O(tokens^2) normalize work per doc
    # (measured 3x regression when inlined).
    feats = (
        df.select(
            F.col(id_col).alias("id"),
            tokens_expr(F.coalesce(F.col(text_col), F.lit(""))).alias("tokens"),
        )
        .withColumn(
            "shingle_hashes",
            shingle_hashes_expr(shingles_expr("tokens", cfg.shingle_k)),
        )
        .withColumn(
            "minhash_buckets",
            minhash_buckets_expr("shingle_hashes", cfg.num_perm,
                                 cfg.bands, cfg.minhash_seed),
        )
        .select("id", "shingle_hashes", "minhash_buckets")
        .localCheckpoint()
    )
    bb = array_band_buckets(feats, "id", "minhash_buckets", "minhash")
    pairs, _ = candidate_pairs(bb, cfg.max_bucket_size)
    return verify_jaccard(pairs, feats, "shingle_hashes",
                          cfg.jaccard_threshold).drop("families")


def simhash_doc_pairs(df: DataFrame, id_col: str = "doc_id",
                      text_col: str = "text",
                      cfg: FuzzyConfig | None = None) -> DataFrame:
    """(id_l, id_r, hamming) — SimHash near-dup doc pairs.

    The fingerprint RIDES the bucket row and `bit_count(xor) <= t`
    evaluates inside the self-join's codegen stage
    (lsh.hamming_candidate_pairs), so the 16-bit band flood (a 65,536-
    value bucket space at corpus scale — measured 26.7M junk candidate
    pairs at n=400k) dies before the pair-dedup shuffle. No features
    join at all: feats feeds only the banding projection."""
    cfg = cfg or FuzzyConfig()
    feats = doc_features(df, id_col, text_col, cfg, with_minhash=False)
    bb = int64_band_buckets(feats, "id", "simhash", cfg.phash_band_bits,
                            "simhash", cfg.simhash_hamming_threshold)
    pairs, _ = hamming_candidate_pairs(bb, cfg.max_bucket_size,
                                       with_distance=True)
    return pairs.select("id_l", "id_r", F.col("dist").alias("hamming"))


def ngram_jaccard_pairs(df: DataFrame, id_col: str = "doc_id",
                        text_col: str = "text", k: int = 3,
                        prefix_tokens: int = 5,
                        threshold: float = 0.5,
                        max_block_size: int = 2000,
                        max_task_rows: int = 512,
                        return_dropped: bool = False):
    """Blocked exact n-gram Jaccard (SQL-expressible — the DuckDB
    oracle recomputes it): block on the first ``prefix_tokens`` tokens,
    then exact token-k-gram Jaccard within each block.

    Hot-block cap: a block of size s is s(s-1)/2 pairs in one task, and
    templated corpora (boilerplate openings) concentrate the corpus
    into a few blocks. Blocks larger than ``max_block_size`` are
    DROPPED from pairing — not salted, because the prefix block is the
    only chance a pair gets (no other band catches it), so salting
    would silently split true pairs; an over-cap prefix is a stop-
    pattern, not a duplicate signal. Dropped blocks are returned
    (``return_dropped=True`` -> (pairs, dropped(block, block_size))) so
    the caller can meter skipped work, matching candidate_pairs.

    Task-size control: an admitted block of size s is s(s-1)/2 exact
    gram-set comparisons, and before round 5 they all landed in ONE
    task (worst case max_block_size²/2 ≈ 2M at the default 2000).
    Blocks larger than ``max_task_rows`` are now spread by the SAME
    triangle-block decomposition as hamming_candidate_pairs
    (lsh.py:187-229): each member gets a sub-block index
    u = pmod(xxhash64(id), n_sub) with n_sub = ceil(s/max_task_rows)
    and replicates into the blocks {(min(u,k), max(u,k)) : k < n_sub},
    so EVERY intra-block pair lands in exactly one (bu, bv) cell —
    the all-pairs semantics the DuckDB oracle checks are preserved
    bit-for-bit while per-cell work is bounded by ~max_task_rows².
    Cold blocks (s <= max_task_rows) take the same path with n_sub=1
    — a single (0,0) cell, no row multiplication."""
    # pinned (r6): feats feeds the sizing agg and both join sides — the
    # normalize+shingle expression tree otherwise executes three times.
    # Lazy checkpoint, materialized by the sizing aggregation.
    feats = (
        df.select(F.col(id_col).alias("id"), normalize_expr(text_col).alias("t"))
        .withColumn("toks", F.split("t", " "))
        .withColumn("block", F.array_join(F.slice("toks", 1, prefix_tokens), " "))
        .withColumn("grams", F.array_distinct(shingles_expr("toks", k)))
        .select("id", "block", "grams")
        .localCheckpoint(eager=False)
    )
    sizes = feats.groupBy("block").agg(F.count("*").alias("block_size"))
    admitted = sizes.where(
        (F.col("block_size") > 1) & (F.col("block_size") <= max_block_size)
    )
    dropped = sizes.where(F.col("block_size") > max_block_size)
    n_sub = F.ceil(F.col("block_size") / F.lit(max_task_rows)).cast("int")
    b = (
        feats.join(admitted, "block")
        .withColumn("n_sub", n_sub)
        .withColumn("u", F.pmod(F.xxhash64("id"), F.col("n_sub")).cast("int"))
        .drop("block_size")
    )
    blocks = F.transform(
        F.sequence(F.lit(0), F.col("n_sub") - 1),
        lambda j: F.struct(
            F.least(F.col("u"), j).alias("bu"),
            F.greatest(F.col("u"), j).alias("bv"),
        ),
    )
    b = (b.select("id", "block", "grams", "u", F.explode(blocks).alias("blk"))
         .select("id", "block", "grams", "u",
                 F.col("blk.bu").alias("bu"), F.col("blk.bv").alias("bv")))
    jkey = ["block", "bu", "bv"]
    left = (b.where(F.col("u") == F.col("bu"))
            .select(*jkey, F.col("id").alias("id_l"),
                    F.col("grams").alias("g_l")))
    right = (b.where(F.col("u") == F.col("bv"))
             .select(*jkey, F.col("id").alias("id_r"),
                     F.col("grams").alias("g_r")))
    inter = F.size(F.array_intersect("g_l", "g_r"))
    union = F.size(F.array_union("g_l", "g_r"))
    # diagonal cells pair a sub-block with itself: dedup by id order.
    # Cross cells meet each pair exactly once by construction, but a
    # legit pair may arrive as id_l > id_r — canonicalize after the
    # jaccard (which is symmetric) so the output contract (id_l < id_r)
    # holds either way.
    pair_filter = (F.col("bu") != F.col("bv")) | (F.col("id_l") < F.col("id_r"))
    pairs = (
        left.join(right, jkey)
        .where(pair_filter)
        .withColumn("jaccard", F.round(inter / F.greatest(union, F.lit(1)), 6))
        .where(F.col("jaccard") >= threshold)
        .select(F.least("id_l", "id_r").alias("id_l"),
                F.greatest("id_l", "id_r").alias("id_r"),
                "jaccard")
    )
    dropped = dropped.select("block", "block_size")
    return (pairs, dropped) if return_dropped else pairs


def minhash_doc_clusters(df: DataFrame, id_col: str = "doc_id",
                         text_col: str = "text",
                         cfg: FuzzyConfig | None = None) -> DataFrame:
    """(doc_id, cluster_id) — near-dup cluster assignment for EVERY doc.

    Transitive closure over the verified MinHash-LSH pair stream
    (minhash_lsh_doc_pairs) via the O(log d) alternating-star
    connected-components operator (cc.py:85); singletons label
    themselves. cluster_id = min doc id of the component — the same
    min-id survivor contract as the flagship pipeline, now exposed at
    document level (the image side ships it as image_dedup_clusters).

    The DuckDB oracle recomputes the closure with a recursive CTE over
    the exact-Jaccard pair set, so this is the first driver query that
    checks the CC operator against an independent transitive-closure
    implementation rather than planted truth.
    """
    from deduper_spark.operators.cc import connected_components

    pairs = minhash_lsh_doc_pairs(df, id_col, text_col, cfg)
    comp = connected_components(
        pairs.select("id_l", "id_r"),
        nodes=df.select(F.col(id_col).alias("id")),
        id_type=dict(df.dtypes)[id_col],
        # verified pairs end in a groupBy(id_l, id_r) — already distinct
        edges_distinct=True,
    )
    return comp.select(F.col("id").alias(id_col),
                       F.col("cluster_id").alias("cluster_id"))


def lsh_tables_for_recall(threshold: float, n_planes: int,
                          probe_radius: int,
                          target_miss: float = 0.01,
                          max_tables: int = 16) -> int:
    """How many independent hyperplane tables a pair at EXACTLY
    ``threshold`` cosine needs to be blocked together with miss
    probability <= ``target_miss``.

    Each plane splits a boundary pair with p = acos(threshold)/pi;
    one table catches it iff <= probe_radius of its n_planes bits
    differ (the multiprobe masks), q = P(Binom(n_planes, p) <=
    probe_radius); L tables miss with (1-q)^L. E.g. threshold 0.99 ->
    p~0.045, q~0.84, L=3; threshold 0.95 -> p~0.101, q~0.51, L=7.
    Pairs ABOVE the threshold do strictly better. Capped at
    ``max_tables`` — beyond that the threshold is too loose for
    hyperplane LSH and the cap is reported by the docstring contract,
    not silently exceeded."""
    import math

    p = math.acos(max(min(threshold, 1.0), -1.0)) / math.pi
    q = sum(
        math.comb(n_planes, j) * p**j * (1 - p) ** (n_planes - j)
        for j in range(min(probe_radius, n_planes) + 1)
    )
    if q >= 1.0 - 1e-12:
        return 1
    return max(1, min(math.ceil(math.log(target_miss) / math.log(1.0 - q)),
                      max_tables))


def embedding_cosine_pairs(df: DataFrame, id_col: str = "vec_id",
                           vec_col: str = "embedding",
                           block_col: str | None = None,
                           threshold: float = 0.95,
                           n_planes: int = 16,
                           probe_radius: int = 1,
                           n_tables: int | None = None,
                           target_miss: float = 0.01,
                           seed: int = 42) -> DataFrame:
    """Embedding-cosine near-dup pairs.

    Default blocker: ``n_tables`` independent hyperplane-LSH tables
    (sign random projection, operators/ann.py), each probed within
    Hamming <= probe_radius (multiprobe). One table alone is NOT
    near-exhaustive away from threshold ~1.0 — at threshold 0.95 a
    boundary pair splits each of 16 planes with p~0.10, so a single
    radius-1 table misses ~49% of boundary pairs. OR-amplification
    fixes that: with ``n_tables=None`` the table count is derived from
    the threshold (lsh_tables_for_recall) so a pair AT the threshold is
    missed with probability <= ``target_miss`` (1% default); pairs
    above the threshold do strictly better. ``block_col`` substitutes a
    semantic blocker (test harness / pre-computed IVF cell).

    Bucket size stays bounded (2^-n_planes of the corpus per table in
    expectation); candidate generation is ids-only (the explode factor
    n_tables*(1+n_planes) rides 16 B rows, never vectors); dot products
    via zip_with+aggregate — JVM-side, no Python in the pair join.
    """
    base = df.select(
        F.col(id_col).alias("id"),
        F.col(vec_col).cast("array<double>").alias("v"),
        *([F.col(block_col).alias("block")] if block_col else []),
    ).withColumn(
        "norm",
        F.sqrt(F.aggregate(F.transform("v", lambda x: x * x), F.lit(0.0),
                           lambda acc, x: acc + x)),
    )
    dot = F.aggregate(
        F.zip_with("v_l", "v_r", lambda a, b: a * b), F.lit(0.0),
        lambda acc, x: acc + x,
    )
    if not block_col:
        from deduper_spark.operators.ann import (
            hyperplane_signatures_udf,
            probe_masks,
        )

        if n_tables is None:
            n_tables = lsh_tables_for_recall(threshold, n_planes,
                                             probe_radius, target_miss)
        # dim inferred lazily inside the UDF (ann.py, r6): the former
        # limit(1).collect() dim probe was a blocking driver job per
        # call, and the empty-input special case it served is covered
        # by the normal (empty) pair flow
        sigs = hyperplane_signatures_udf(None, n_planes, n_tables, seed)
        # candidate generation on IDS ONLY (16 B/row through the bucket
        # join + pair dedupe); the 8 B x dim vectors join back by id
        # AFTER dedupe — never shuffled per-probe or per-duplicate-pair
        ids = base.withColumn("sigs", sigs("v")).select("id", "sigs")
        masks = F.array(*[F.lit(m) for m in probe_masks(n_planes, probe_radius)])
        left = (
            ids.select(
                F.col("id").alias("id_l"),
                F.posexplode("sigs").alias("table", "sig"),
            )
            .select(
                "id_l", "table",
                F.explode(
                    F.transform(masks, lambda m: F.col("sig").bitwiseXOR(m))
                ).alias("block"),
            )
        )
        right = ids.select(
            F.col("id").alias("id_r"),
            F.posexplode("sigs").alias("table", "block"),
        )
        cand = (
            left.join(right, ["table", "block"])
            .where(F.col("id_l") < F.col("id_r"))
            .select("id_l", "id_r")
            .dropDuplicates(["id_l", "id_r"])
        )
        pairs = cand.join(
            base.select(F.col("id").alias("id_l"), F.col("v").alias("v_l"),
                        F.col("norm").alias("n_l")), "id_l"
        ).join(
            base.select(F.col("id").alias("id_r"), F.col("v").alias("v_r"),
                        F.col("norm").alias("n_r")), "id_r"
        )
    else:
        left = base.select(F.col("id").alias("id_l"), F.col("v").alias("v_l"),
                           F.col("norm").alias("n_l"), "block")
        right = base.select(F.col("id").alias("id_r"), F.col("v").alias("v_r"),
                            F.col("norm").alias("n_r"), "block")
        pairs = left.join(right, "block").where(F.col("id_l") < F.col("id_r"))
    return (
        pairs
        .withColumn("cosine", F.round(dot / (F.col("n_l") * F.col("n_r")), 6))
        .where(F.col("cosine") >= threshold)
        .select("id_l", "id_r", "cosine")
    )
