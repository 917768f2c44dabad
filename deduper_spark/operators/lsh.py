"""LSH banding + candidate-pair generation with explicit skew control.

Generalizes the blocking role of the reference's exact hash-bucket
lookup (seenHashes keyed membership, Deduper.kt:207) to locality-
sensitive buckets: rows sharing any (band, bucket) become candidate
pairs; verification (verify.py) then confirms or rejects.

Scale design (the part that has to survive 100 TB):
  * banding is a single projection + posexplode — no shuffle;
  * the candidate self-join shuffles both sides hash-partitioned on
    (band, bucket): one co-located shuffle, AQE skew-split on;
  * HOT BUCKETS (stop-shingle bands, constant captions) are the skew
    killer: a bucket of size s yields s(s-1)/2 pairs. Buckets larger
    than max_bucket_size are dropped from pairing (standard practice —
    their members are near-universal patterns, not duplicates) and
    reported in the stage metrics rather than silently eaten.
  * pair de-dup across bands/families is a groupBy on (id_l, id_r) —
    again hash-partitioned, no global structure.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def band_buckets(
    df: DataFrame,
    id_col: str,
    sig_col: str,
    bands: int,
    rows_per_band: int,
    family: str,
) -> DataFrame:
    """(id, band, bucket) — one row per band per input row.

    bucket = xxhash64 over the band's signature slice; band id is mixed
    in so buckets from different bands never collide into one join key.
    """
    band_structs = F.transform(
        F.sequence(F.lit(0), F.lit(bands - 1)),
        lambda b: F.struct(
            b.cast("int").alias("band"),
            F.xxhash64(
                b, F.slice(F.col(sig_col), b * rows_per_band + F.lit(1),
                           F.lit(rows_per_band))
            ).alias("bucket"),
        ),
    )
    return (
        df.select(F.col(id_col).alias("id"), F.explode(band_structs).alias("bb"))
        .select("id", F.col("bb.band").alias("band"), F.col("bb.bucket").alias("bucket"))
        .withColumn("family", F.lit(family))
    )


def int64_band_buckets(
    df: DataFrame, id_col: str, bits_col: str, band_bits: int, family: str
) -> DataFrame:
    """Band a 64-bit fingerprint (phash / simhash) into 64/band_bits
    equal bit-slices. Pigeonhole: pairs within Hamming distance
    (64/band_bits - 1) are GUARANTEED to share a band; beyond that the
    catch is probabilistic (documented trade-off: finer bands raise
    recall but shrink bucket selectivity)."""
    n_bands = 64 // band_bits
    mask = (1 << band_bits) - 1
    # static band count → unrolled expressions (stays in codegen; the
    # shift amount must be a literal for shiftrightunsigned)
    band_structs = F.array(
        *[
            F.struct(
                F.lit(b).cast("int").alias("band"),
                F.shiftrightunsigned(F.col(bits_col), b * band_bits)
                .bitwiseAND(F.lit(mask))
                .alias("bucket"),
            )
            for b in range(n_bands)
        ]
    )
    return (
        df.select(F.col(id_col).alias("id"), F.explode(band_structs).alias("bb"))
        .select("id", F.col("bb.band").alias("band"), F.col("bb.bucket").alias("bucket"))
        .withColumn("family", F.lit(family))
    )


def candidate_pairs(
    buckets: DataFrame,
    max_bucket_size: int = 200,
) -> tuple[DataFrame, DataFrame]:
    """Self-join each (family, band, bucket) group → (id_l < id_r) pairs.

    Returns (pairs, dropped_buckets_metrics). Buckets above
    max_bucket_size are excluded from pairing and reported — at corpus
    scale these are stop-patterns whose quadratic blowup would dominate
    the whole job (SURVEY.md §7 hard part (d)).
    """
    key = ["family", "band", "bucket"]
    sizes = buckets.groupBy(*key).agg(F.count("*").alias("bucket_size"))
    admitted = sizes.where(
        (F.col("bucket_size") > 1) & (F.col("bucket_size") <= max_bucket_size)
    )
    dropped = sizes.where(F.col("bucket_size") > max_bucket_size)

    b = buckets.join(admitted.select(*key), key, "left_semi")
    left = b.select(*key, F.col("id").alias("id_l"))
    right = b.select(*key, F.col("id").alias("id_r"))
    pairs = (
        left.join(right, key, "inner")
        .where(F.col("id_l") < F.col("id_r"))
        .groupBy("id_l", "id_r")
        .agg(F.collect_set("family").alias("families"))
    )
    return pairs, dropped


def union_pairs(*pair_dfs: DataFrame) -> DataFrame:
    """Union candidate pairs across signature families, de-duplicated."""
    out = None
    for p in pair_dfs:
        p2 = p.select("id_l", "id_r", "families")
        out = p2 if out is None else out.unionByName(p2)
    assert out is not None
    return (
        out.select("id_l", "id_r", F.explode("families").alias("family"))
        .groupBy("id_l", "id_r")
        .agg(F.collect_set("family").alias("families"))
    )
