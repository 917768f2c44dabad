"""Suffix-array substring pass: kernel + Spark operator."""

from __future__ import annotations

import numpy as np
from pyspark.sql import functions as F

from deduper_spark.functions.suffix_array import (
    build_suffix_array,
    kasai_lcp,
    shared_substring_pairs,
)
from deduper_spark.operators.suffix import substring_overlap_pairs


def test_sa_lcp_textbook():
    s = np.frombuffer("banana".encode("utf-32-le"), dtype=np.uint32).astype(np.int64)
    sa = build_suffix_array(s)
    assert sa.tolist() == [5, 3, 1, 0, 4, 2]
    assert kasai_lcp(s, sa).tolist() == [0, 1, 3, 0, 0, 2]


def test_shared_substring_kernel():
    texts = [
        "alpha beta gamma delta epsilon zeta eta theta",
        "prefix junk alpha beta gamma delta epsilon suffix junk",
        "no overlap at all in this one honestly",
    ]
    got = shared_substring_pairs(texts, ["x", "y", "z"], min_len=25)
    assert got == {("x", "y")}
    # threshold above the shared run → empty
    assert shared_substring_pairs(texts, ["x", "y", "z"], min_len=45) == set()


def test_substring_overlap_operator(spark):
    from deduper_spark.synth import make_pdf

    pdf = make_pdf(42, 60)
    df = spark.createDataFrame(pdf).select(
        F.col("image_id").alias("id"),
        F.lower(F.col("caption")).alias("norm_caption"),
    ).coalesce(1)  # single shard: detection is shard-local by design
    got = {
        (r["id_l"], r["id_r"])
        for r in substring_overlap_pairs(df, min_len=60).collect()
    }
    # planted substring class: role 9 embeds role 3's full caption
    for b in range(6):
        pair = (f"img{b*10+3:09d}", f"img{b*10+9:09d}")
        assert pair in got, f"SA pass missed planted substring {pair}"
    # exact-caption dups (role 0/6) also share their whole caption
    assert (f"img{0:09d}", f"img{6:09d}") in got
