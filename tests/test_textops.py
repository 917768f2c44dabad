"""Tests for training-data text ops, ANN, and multimodal plumbing."""

from __future__ import annotations

from pyspark.sql import functions as F

from deduper_spark.functions.textstats import (
    fingerprint_expr,
    lang_id_expr,
    quality_score_expr,
    token_count_expr,
)
from deduper_spark.operators.ann import brute_force_topk, lsh_topk
from deduper_spark.operators.dedup_text import (
    embedding_cosine_pairs,
    exact_doc_dedup,
    minhash_lsh_doc_pairs,
    ngram_jaccard_pairs,
    simhash_doc_pairs,
)
from deduper_spark.operators.multimodal import (
    extract_image_features,
    resize_images,
    sample_video_frames,
)

SF = "/root/testdata/sf0.001"


def test_token_count_edge_cases(spark):
    df = spark.createDataFrame(
        [(1, "one two three"), (2, ""), (3, "   "), (4, "single")],
        ["doc_id", "text"],
    )
    got = {r["doc_id"]: r["n"] for r in
           df.select("doc_id", token_count_expr("text").alias("n")).collect()}
    assert got == {1: 3, 2: 0, 3: 0, 4: 1}


def test_lang_id_votes(spark):
    df = spark.createDataFrame(
        [
            (1, "the cat and the dog is on a mat"),
            (2, "der hund und die katze ist von den"),
            (3, "le chat et la maison est pour les"),
            (4, "xyzzy qwerty plugh"),
        ],
        ["doc_id", "text"],
    )
    got = {r["doc_id"]: r["l"] for r in
           df.select("doc_id", lang_id_expr("text").alias("l")).collect()}
    assert got == {1: "en", 2: "de", 3: "fr", 4: "und"}


def test_quality_score_range(spark):
    df = spark.read.parquet(f"{SF}/documents.parquet")
    stats = df.select(quality_score_expr("text").alias("q")).agg(
        F.min("q").alias("lo"), F.max("q").alias("hi")
    ).collect()[0]
    assert 0.0 <= stats["lo"] <= stats["hi"] <= 1.0


def test_fingerprint_stability(spark):
    df = spark.createDataFrame(
        [(1, "a b c d e f g"), (2, "a b c d e f g"), (3, "h i j k l m n")],
        ["doc_id", "text"],
    )
    rows = df.select("doc_id", fingerprint_expr("text").alias("fp")).collect()
    got = {r["doc_id"]: r["fp"] for r in rows}
    assert got[1] == got[2] != got[3]
    assert len(got[1]) == 32  # md5 hex


def test_doc_dedup_family(spark):
    docs = spark.read.parquet(f"{SF}/documents.parquet").select("doc_id", "text")
    dup = docs.where(F.col("doc_id") % 5 == 0).select(
        (F.col("doc_id") + 100000).alias("doc_id"), "text"
    )
    aug = docs.unionByName(dup)
    n_dups = dup.count()

    res = exact_doc_dedup(aug)
    assert res.survivors.count() == docs.count()

    near = docs.where(F.col("doc_id") % 7 == 0).select(
        (F.col("doc_id") + 200000).alias("doc_id"),
        F.concat("text", F.lit(" tail token added")).alias("text"),
    )
    aug2 = docs.unionByName(near)
    mh = minhash_lsh_doc_pairs(aug2).collect()
    planted = {(r["id_l"], r["id_r"]) for r in mh
               if r["id_r"] - r["id_l"] == 200000}
    # most planted near-pairs found (long docs have high jaccard)
    assert len(planted) >= near.count() * 0.7

    sh = simhash_doc_pairs(aug2).collect()
    planted_sh = {(r["id_l"], r["id_r"]) for r in sh
                  if r["id_r"] - r["id_l"] == 200000}
    assert len(planted_sh) >= near.count() * 0.5

    nj = ngram_jaccard_pairs(aug2, threshold=0.3).collect()
    planted_nj = {(r["id_l"], r["id_r"]) for r in nj
                  if r["id_r"] - r["id_l"] == 200000}
    assert len(planted_nj) >= near.count() * 0.7
    assert n_dups > 0


def test_embedding_cosine_and_ann(spark):
    emb = spark.read.parquet(f"{SF}/embeddings.parquet")
    copy = emb.where(F.col("vec_id") % 10 == 0).select(
        (F.col("vec_id") + 10000).alias("vec_id"), "embedding", "label"
    )
    aug = emb.unionByName(copy)
    pairs = embedding_cosine_pairs(aug, threshold=0.99).collect()
    got = {(r["id_l"], r["id_r"]) for r in pairs}
    want = {(int(r["vec_id"]), int(r["vec_id"]) + 10000)
            for r in copy.select(F.col("vec_id") - 10000).withColumnRenamed(
                "(vec_id - 10000)", "vec_id").collect()}
    assert want <= got  # every planted identical pair found

    q = emb.where(F.col("vec_id") < 5)
    bf = brute_force_topk(emb, q, k=3).collect()
    assert len(bf) == 15
    assert all(r["neighbor_id"] != r["query_id"] for r in bf)

    # LSH ANN: same-bucket neighbors are a subset; rank-1 hit overlap
    # with brute force should be nonzero on identical-copy pairs
    lsh = lsh_topk(aug, copy.limit(5), dim=64, k=1, n_planes=8).collect()
    for r in lsh:
        if r["rank"] == 1 and r["query_id"] >= 10000:
            # the identical original shares every hyperplane bucket
            assert r["neighbor_id"] == r["query_id"] - 10000
            assert abs(r["cosine"] - 1.0) < 1e-6


def test_multimodal_plumbing(spark):
    from deduper_spark.synth import make_pdf

    pdf = make_pdf(42, 20)
    df = spark.createDataFrame(pdf)
    feats = extract_image_features(df, "image_id", "bytes").collect()
    assert len(feats) == 20
    assert all(r["decode_ok"] for r in feats)
    fmap = {r["id"]: r for r in feats}
    src = {r["image_id"]: r for r in df.select("image_id", "phash").collect()}
    assert all(fmap[k]["phash"] == src[k]["phash"] for k in fmap)

    resized = resize_images(df, "image_id", "bytes", 16, 16).collect()
    assert all(r["resized_ok"] for r in resized)
    from deduper_spark.functions.phash import decode_image
    blob = bytes(resized[0]["bytes"])
    assert blob[:4] == b"\x89PNG"          # interchange-grade output
    px = decode_image(blob)
    assert px.shape == (16, 16, 3)
    jpg = resize_images(df.limit(2), "image_id", "bytes", 16, 16,
                        out_fmt="jpeg").collect()
    assert bytes(jpg[0]["bytes"])[:2] == b"\xff\xd8"
    assert decode_image(bytes(jpg[0]["bytes"])).shape == (16, 16, 3)

    frames = sample_video_frames(df.limit(3), "image_id", "bytes").collect()
    assert len(frames) == 3 and all(r["decode_ok"] for r in frames)

    # poisoned blob isolation: undecodable rows flagged, job survives
    bad = spark.createDataFrame([("bad1", bytearray(b"\x89PNGxxxx" * 4))],
                                ["image_id", "bytes"])
    out = extract_image_features(bad, "image_id", "bytes").collect()
    assert len(out) == 1 and out[0]["decode_ok"] is False
