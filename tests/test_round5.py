"""Round-5 regressions.

1. DedupConfig.hash_keys drives the flagship pipeline (was a silent
   no-op — the documented knob, config.py:72, reference hashKeys
   contract Config.kt:19-24, was ignored by DedupPipeline.features()).
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
