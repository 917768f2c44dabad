"""Operator tests: LSH banding, candidate pairs, skew caps, connected
components, substring containment."""

from __future__ import annotations

from pyspark.sql import functions as F

from deduper_spark.operators.cc import connected_components
from deduper_spark.operators.lsh import (
    band_buckets,
    candidate_pairs,
    int64_band_buckets,
    union_pairs,
)
from deduper_spark.operators.suffix import containment_pairs


def test_band_buckets_shape(spark):
    df = spark.createDataFrame(
        [("a", list(range(16))), ("b", list(range(16)))], ["id", "sig"]
    )
    bb = band_buckets(df, "id", "sig", bands=4, rows_per_band=4, family="mh")
    rows = bb.collect()
    assert len(rows) == 8  # 2 rows x 4 bands
    # identical signatures → identical buckets per band
    per_band = {(r["band"]): set() for r in rows}
    for r in rows:
        per_band[r["band"]].add(r["bucket"])
    assert all(len(v) == 1 for v in per_band.values())


def test_candidate_pairs_and_hot_bucket_cap(spark):
    # 3 ids share a bucket; 5 ids share a hot bucket (cap=4 → dropped)
    rows = [("a", 0, 1, "f"), ("b", 0, 1, "f"), ("c", 0, 1, "f")]
    rows += [(f"h{i}", 1, 2, "f") for i in range(5)]
    bb = spark.createDataFrame(rows, ["id", "band", "bucket", "family"])
    pairs, dropped = candidate_pairs(bb, max_bucket_size=4,
                                     hot_bucket_policy="drop")
    got = {(r["id_l"], r["id_r"]) for r in pairs.collect()}
    assert got == {("a", "b"), ("a", "c"), ("b", "c")}
    d = dropped.collect()
    assert len(d) == 1 and d[0]["bucket_size"] == 5


def test_int64_band_buckets_pigeonhole(spark):
    # hamming distance 3 with 4 bands of 16 bits → at least 1 shared band
    a = 0x0123456789ABCDEF
    b = a ^ (1 << 0) ^ (1 << 17) ^ (1 << 34)  # 3 bits in 3 different bands
    df = spark.createDataFrame([("a", a), ("b", b)], ["id", "ph"])
    bb = int64_band_buckets(df, "id", "ph", band_bits=16, family="ph")
    pairs, _ = candidate_pairs(bb, max_bucket_size=10)
    assert {(r["id_l"], r["id_r"]) for r in pairs.collect()} == {("a", "b")}


def test_union_pairs_merges_families(spark):
    p1 = spark.createDataFrame([("a", "b", ["mh"])], ["id_l", "id_r", "families"])
    p2 = spark.createDataFrame([("a", "b", ["ph"])], ["id_l", "id_r", "families"])
    u = union_pairs(p1, p2).collect()
    assert len(u) == 1
    assert set(u[0]["families"]) == {"mh", "ph"}


def test_connected_components_chain_and_singleton(spark):
    edges = spark.createDataFrame(
        [("a", "b"), ("b", "c"), ("x", "y")], ["id_l", "id_r"]
    )
    nodes = spark.createDataFrame([("a",), ("b",), ("c",), ("x",), ("y",), ("z",)], ["id"])
    cc = {r["id"]: r["cluster_id"]
          for r in connected_components(edges, nodes).collect()}
    assert cc == {"a": "a", "b": "a", "c": "a", "x": "x", "y": "x", "z": "z"}


def test_connected_components_long_chain(spark):
    n = 12
    edges = spark.createDataFrame(
        [(f"n{i:02d}", f"n{i+1:02d}") for i in range(n)], ["id_l", "id_r"]
    )
    cc = connected_components(edges).collect()
    assert {r["cluster_id"] for r in cc} == {"n00"}
    assert len(cc) == n + 1


def test_containment_pairs(spark):
    feats = spark.createDataFrame(
        [
            ("a", "quick brown fox jumps high"),
            ("b", "the very quick brown fox jumps high over fences"),
            ("c", "unrelated caption entirely different"),
        ],
        ["id", "norm_caption"],
    )
    from deduper_spark.functions.text import shingle_hashes_expr, shingles_expr
    feats = feats.withColumn(
        "shingle_hashes",
        shingle_hashes_expr(shingles_expr(F.split("norm_caption", " "), 3)),
    )
    got = containment_pairs(feats).collect()
    assert len(got) == 1
    assert (got[0]["id_l"], got[0]["id_r"]) == ("a", "b")
    assert got[0]["families"] == ["substring"]


def test_int64_band_buckets_fullwidth_at_hamming_zero(spark):
    """max_hamming=0 (r6): one full-width band — bucket IS the
    fingerprint — and hamming_candidate_pairs emits exactly the
    equal-fingerprint pairs the 16-bit banding found (identical pair
    set, no 2^band_bits flood)."""
    from deduper_spark.operators.lsh import hamming_candidate_pairs

    vals = [0x0123456789ABCDEF, 0x0123456789ABCDEF,   # dup pair
            0x0123456789ABCDEE,                       # hamming 1 — out
            0x7777777777777777, 0x7777777777777777,   # dup pair
            0x0000000000000000]
    df = spark.createDataFrame(
        [(f"r{i}", v) for i, v in enumerate(vals)], ["id", "fp"])

    bb0 = int64_band_buckets(df, "id", "fp", band_bits=16, family="f",
                             max_hamming=0)
    # one bucket row per input row; bucket == the fingerprint value
    rows = bb0.collect()
    assert len(rows) == len(vals)
    assert all(r["bucket"] == r["val"] for r in rows)
    p0, _ = hamming_candidate_pairs(bb0)
    got0 = {(r["id_l"], r["id_r"]) for r in p0.collect()}

    # reference: the sliced banding at threshold 0 (pre-r6 shape) —
    # emulated by banding at 16 bits with max_hamming forced to 0
    bb16 = int64_band_buckets(df, "id", "fp", band_bits=16, family="f",
                              max_hamming=1).withColumn(
        "max_ham", F.lit(0))
    p16, _ = hamming_candidate_pairs(bb16)
    got16 = {(r["id_l"], r["id_r"]) for r in p16.collect()}

    assert got0 == got16 == {("r0", "r1"), ("r3", "r4")}
