"""Round-5 regressions.

1. DedupConfig.hash_keys drives the flagship pipeline (was a silent
   no-op — the documented knob, config.py:72, reference hashKeys
   contract Config.kt:19-24, was ignored by DedupPipeline.features()).
2. ngram_jaccard_pairs spreads large admitted blocks with the
   triangle-block decomposition (exactly-once pair semantics
   preserved; per-cell comparison count bounded).
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from deduper_spark.config import DedupConfig
from deduper_spark.pipeline import DedupPipeline


@pytest.fixture(scope="module")
def tiny(spark):
    # two rows sharing a caption but NOT a phash, plus a singleton
    rows = [
        ("img-000", "a red bicycle on a bridge", 111),
        ("img-001", "a red bicycle on a bridge", 222),
        ("img-002", "an entirely different caption", 333),
    ]
    return spark.createDataFrame(
        rows, "image_id string, caption string, phash long"
    ).cache()


def _run(spark, df, **cfg_kw):
    pipe = DedupPipeline(DedupConfig(**cfg_kw), families=("exact",),
                         collect_metrics=False)
    return pipe.run(spark, df)


def test_default_keys_keep_caption_phash(spark, tiny):
    res = _run(spark, tiny)
    assert res.report.hash_columns == ["caption", "phash"]
    # different phash => different exact key => no dupes
    assert res.report.dupe_count == 0
    assert res.survivors.count() == 3


def test_hash_keys_honored_by_pipeline(spark, tiny):
    res = _run(spark, tiny, hash_keys=("caption",))
    assert res.report.hash_columns == ["caption"]
    # caption-only key: img-000/img-001 collapse, keep-first wins
    assert res.report.dupe_count == 1
    assert res.report.hash_count == 2
    surv = {r["image_id"] for r in res.survivors.collect()}
    assert surv == {"img-000", "img-002"}


def test_hash_keys_honored_by_explain_key(spark, tiny):
    pipe_def = DedupPipeline(DedupConfig())
    pipe_cap = DedupPipeline(DedupConfig(hash_keys=("caption",)))
    s_def, h_def = pipe_def.explain_key(tiny)
    s_cap, h_cap = pipe_cap.explain_key(tiny)
    assert s_def == "a red bicycle on a bridge, 111"
    assert s_cap == "a red bicycle on a bridge"
    assert h_def != h_cap


def test_hash_keys_validated(spark, tiny):
    with pytest.raises(ValueError, match="nope"):
        _run(spark, tiny, hash_keys=("caption", "nope"))


def test_hash_keys_incremental_preload(spark, tiny, tmp_path):
    """Seen-hash preload joins on the SAME configured key: a ledger of
    caption-only hashes marks both caption-sharers as seen."""
    from deduper_spark.functions.keys import md5_key_expr

    seen_dir = str(tmp_path / "seen")
    (tiny.where(F.col("image_id") == "img-000")
     .select(md5_key_expr(["caption"]).alias("hash"))
     .write.parquet(seen_dir))
    res = _run(spark, tiny, hash_keys=("caption",),
               seen_hashes_path=seen_dir)
    # both rows of the seen caption drop; only the singleton survives
    assert {r["image_id"] for r in res.survivors.collect()} == {"img-002"}
    assert res.report.dupe_count == 2
    assert res.report.record_count == 3


# ---------------------------------------------------------------- ngram


def _ngram_corpus(spark, n=40):
    # one shared 5-token prefix => a single block of n rows; suffixes
    # vary so jaccards differ
    rows = [
        (f"doc_{i:03d}",
         "alpha beta gamma delta epsilon " + " ".join(
             f"w{(i * 7 + j) % 13}" for j in range(6)))
        for i in range(n)
    ]
    return spark.createDataFrame(rows, "doc_id string, text string")


def test_ngram_triangle_blocks_exact_parity(spark):
    """Decomposed (max_task_rows=10 over a 40-row block => n_sub=4)
    emits exactly the same pair set as the single-cell run — every
    intra-block pair exactly once."""
    from deduper_spark.operators.dedup_text import ngram_jaccard_pairs

    df = _ngram_corpus(spark, 40)
    split = ngram_jaccard_pairs(df, threshold=0.0, max_task_rows=10)
    whole = ngram_jaccard_pairs(df, threshold=0.0, max_task_rows=10**9)
    got = {(r["id_l"], r["id_r"], r["jaccard"]) for r in split.collect()}
    want = {(r["id_l"], r["id_r"], r["jaccard"]) for r in whole.collect()}
    assert got == want
    assert len(got) == 40 * 39 // 2          # all pairs, each once
    assert all(a < b for a, b, _ in got)     # canonical order held


def test_ngram_triangle_blocks_bound_per_cell(spark):
    """No (bu, bv) cell carries more than ~max_task_rows rows per side:
    replicate the decomposition's u-assignment and check the cell
    comparison counts against the one-task quadratic."""
    from pyspark.sql import functions as F

    n, max_task_rows = 40, 10
    df = _ngram_corpus(spark, n).select(F.col("doc_id").alias("id"))
    n_sub = -(-n // max_task_rows)  # 4
    u = {r["id"]: r["u"] for r in df.select(
        "id", F.pmod(F.xxhash64("id"), F.lit(n_sub)).cast("int").alias("u")
    ).collect()}
    from collections import Counter
    side = Counter(u.values())
    cells = Counter()
    for a in range(n_sub):
        for b in range(a, n_sub):
            cells[(a, b)] = (side[a] * (side[a] - 1) // 2 if a == b
                             else side[a] * side[b])
    assert sum(cells.values()) == n * (n - 1) // 2  # exact cover
    # spread: the max cell is far below the single-task quadratic; with
    # a hash-balanced split each side is ~max_task_rows so the bound is
    # ~max_task_rows^2 with slack for hash imbalance
    assert max(cells.values()) <= 4 * max_task_rows * max_task_rows
    assert max(cells.values()) < n * (n - 1) // 2 / 2


# ------------------------------------------------------------- jpeg SOS


def test_jpeg_scan_missing_component_named_error(spark):
    """A structurally valid JPEG whose SOS references a component id
    absent from the SOF must raise the NAMED validation error before
    entropy decode, not a wrapped KeyError (ADVICE r4: validate the
    scan/frame linkage up front)."""
    import numpy as np
    import pytest as _pytest

    from deduper_spark.functions import jpeg

    img = np.random.default_rng(0).integers(
        0, 255, (16, 16, 3)).astype(np.uint8)
    data = bytearray(jpeg.encode_jpeg(img))
    j = data.find(b"\xff\xda")
    data[j + 5] = 9                       # first scan component id -> 9
    with _pytest.raises(ValueError, match="missing frame component"):
        jpeg.decode_jpeg(bytes(data))
