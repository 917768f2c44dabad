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
from deduper_spark.functions.minhash import minhash_expr
from deduper_spark.functions.simhash import simhash_expr
from deduper_spark.functions.text import (
    normalize_expr,
    shingle_hashes_expr,
    shingles_expr,
    token_hashes_expr,
    tokens_expr,
)
from deduper_spark.operators.exact import ExactDedupResult, exact_dedup
from deduper_spark.operators.lsh import band_buckets, candidate_pairs, int64_band_buckets
from deduper_spark.operators.verify import verify_hamming, verify_jaccard


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
    """(id_l, id_r, jaccard) — verified near-dup doc pairs."""
    cfg = cfg or FuzzyConfig()
    feats = doc_features(df, id_col, text_col, cfg, with_simhash=False)
    bb = band_buckets(feats, "id", "minhash_sig", cfg.bands,
                      cfg.rows_per_band, "minhash")
    pairs, _ = candidate_pairs(bb, cfg.max_bucket_size)
    return verify_jaccard(pairs, feats, "shingle_hashes",
                          cfg.jaccard_threshold).drop("families")


def simhash_doc_pairs(df: DataFrame, id_col: str = "doc_id",
                      text_col: str = "text",
                      cfg: FuzzyConfig | None = None) -> DataFrame:
    """(id_l, id_r, hamming) — SimHash near-dup doc pairs."""
    cfg = cfg or FuzzyConfig()
    feats = doc_features(df, id_col, text_col, cfg, with_minhash=False)
    bb = int64_band_buckets(feats, "id", "simhash", cfg.phash_band_bits, "simhash")
    pairs, _ = candidate_pairs(bb, cfg.max_bucket_size)
    return verify_hamming(pairs, feats, "simhash",
                          cfg.simhash_hamming_threshold).drop("families")


def ngram_jaccard_pairs(df: DataFrame, id_col: str = "doc_id",
                        text_col: str = "text", k: int = 3,
                        prefix_tokens: int = 5,
                        threshold: float = 0.5) -> DataFrame:
    """Blocked exact n-gram Jaccard (SQL-expressible — the DuckDB
    oracle recomputes it): block on the first ``prefix_tokens`` tokens,
    then exact token-k-gram Jaccard within each block."""
    feats = (
        df.select(F.col(id_col).alias("id"), normalize_expr(text_col).alias("t"))
        .withColumn("toks", F.split("t", " "))
        .withColumn("block", F.array_join(F.slice("toks", 1, prefix_tokens), " "))
        .withColumn("grams", F.array_distinct(shingles_expr("toks", k)))
        .select("id", "block", "grams")
    )
    left = feats.select(F.col("id").alias("id_l"), "block",
                        F.col("grams").alias("g_l"))
    right = feats.select(F.col("id").alias("id_r"), "block",
                         F.col("grams").alias("g_r"))
    inter = F.size(F.array_intersect("g_l", "g_r"))
    union = F.size(F.array_union("g_l", "g_r"))
    return (
        left.join(right, "block")
        .where(F.col("id_l") < F.col("id_r"))
        .withColumn("jaccard", F.round(inter / F.greatest(union, F.lit(1)), 6))
        .where(F.col("jaccard") >= threshold)
        .select("id_l", "id_r", "jaccard")
    )


def embedding_cosine_pairs(df: DataFrame, id_col: str = "vec_id",
                           vec_col: str = "embedding",
                           block_col: str | None = None,
                           threshold: float = 0.95,
                           n_planes: int = 16,
                           probe_radius: int = 1,
                           seed: int = 42) -> DataFrame:
    """Embedding-cosine near-dup pairs.

    Default blocker: hyperplane-LSH buckets with Hamming-<=probe_radius
    multiprobe (sign random projection, operators/ann.py). A pair at
    cosine >= threshold subtends an angle <= acos(threshold); each
    hyperplane splits it with probability angle/pi (e.g. ~2.6% at
    0.99), so a miss needs > probe_radius of n_planes splits — the
    blocker is near-exhaustive for near-dup thresholds WITHOUT any
    all-pairs join. ``block_col`` substitutes a semantic blocker
    (test harness / pre-computed IVF cell).

    Bucket size is bounded by construction for near-dup workloads
    (bucket = 2^-n_planes of the corpus in expectation); dot products
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
            hyperplane_signature_udf,
            probe_masks,
        )

        dim = base.select(F.size("v").alias("d")).limit(1).collect()[0]["d"]
        sig = hyperplane_signature_udf(dim, n_planes, seed)
        # candidate generation on IDS ONLY (16 B/row through the bucket
        # join + pair dedupe); the 8 B x dim vectors join back by id
        # AFTER dedupe — never shuffled per-probe or per-duplicate-pair
        ids = base.withColumn("sig", sig("v")).select("id", "sig")
        masks = F.array(*[F.lit(m) for m in probe_masks(n_planes, probe_radius)])
        left = ids.select(
            F.col("id").alias("id_l"),
            F.explode(
                F.transform(masks, lambda m: F.col("sig").bitwiseXOR(m))
            ).alias("block"),
        )
        right = ids.select(F.col("id").alias("id_r"), F.col("sig").alias("block"))
        cand = (
            left.join(right, "block")
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
