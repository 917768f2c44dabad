"""Benchmark harness — headline queries at $SPARK_GRAFT_SF_DIR on
local[$SPARK_GRAFT_CPUS]; prints ONE JSON line:
  {"metric": ..., "value": N, "unit": "sec", "queries": {...}, "sf": ...}

Each query is forced end-to-end with the noop sink (full materialization,
no driver collect); the image pipeline is timed through its own actions
and reported with an images/sec figure as well.

Scaling-efficiency evidence (local[8] vs local[32]) lives in
tools/bench_scaling.py → BENCH/BASELINE.md.
"""

from __future__ import annotations

import json
import os
import re
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))


def _sf_from_dir(sf_dir: str) -> float:
    m = re.search(r"sf([0-9.]+)", sf_dir)
    return float(m.group(1)) if m else 0.1


def _force(df) -> None:
    df.write.format("noop").mode("overwrite").save()


def _stage_count(spark, group: str) -> int:
    """Distinct stages executed under a job group — the regression pin:
    wall time swings 2-3x with tenant noise, stage-count creep does not."""
    tracker = spark.sparkContext.statusTracker()
    stages: set[int] = set()
    for j in tracker.getJobIdsForGroup(group):
        info = tracker.getJobInfo(j)
        if info:
            stages.update(info.stageIds)
    return len(stages)


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    sf = _sf_from_dir(sf_dir)
    no_aqe = "--no-aqe" in sys.argv

    from deduper_spark.session import get_spark

    extra = {"spark.sql.adaptive.enabled": "false"} if no_aqe else None
    spark = get_spark("bench", master=f"local[{cpus}]",
                      shuffle_partitions=cpus, extra_conf=extra)
    spark.sparkContext.setLogLevel("ERROR")

    import __spark_entry__ as entry

    qfns = entry.queries()
    timings: dict[str, float] = {}

    # JVM warmup before the timed loop: the session's first job pays
    # one-time codegen JIT + scan-path init (steady-state exclusion,
    # same rationale as tools/bench_scaling.py)
    _force(qfns["agg_pricing"](spark, sf_dir))

    # ---- relational / text / vector headline queries -------------------
    headline = [
        "exact_dedup_survivors",
        "dupe_groups",
        "incremental_anti",
        "agg_pricing",
        "join_agg",
        "window_topk",
        "doc_minhash_lsh",
        "doc_ngram_jaccard",
        "doc_substring_sa",
        "emb_cosine_dups",
        "ann_topk",
        "event_sessions",
    ]
    stage_counts: dict[str, int] = {}
    for name in headline:
        spark.sparkContext.setJobGroup(name, name)
        t0 = time.time()
        _force(qfns[name](spark, sf_dir))
        timings[name] = round(time.time() - t0, 3)
        stage_counts[name] = _stage_count(spark, name)

    # ---- flagship: image near-dup pipeline at sf-scaled corpus ---------
    from deduper_spark.config import DedupConfig, FuzzyConfig
    from deduper_spark.pipeline import DedupPipeline
    from deduper_spark.synth import make_df

    n_images = max(2_000, int(sf * 200_000))
    df = make_df(spark, seed=42, n=n_images)
    df = df.persist()
    df.count()  # materialize synth outside the timed window
    # steady-state warmup: one tiny end-to-end run first — the first
    # execution of the pipeline DAG pays one-time JVM costs (codegen
    # JIT, Arrow init) a long-lived cluster pays at startup, not per
    # job (same exclusion as tools/bench_scaling.py)
    _w = make_df(spark, seed=43, n=1000).persist()
    _w.count()
    DedupPipeline(
        DedupConfig(fuzzy=FuzzyConfig(psnr_mode="audit"),
            # no JSON-ledger export in the benchmark: carrying raw
            # captions through the bandwidth-bound features stage
            # is the export path, not the dedup path
            include_json=False),
        collect_metrics=False,
    ).run(spark, _w)
    _w.unpersist()
    spark.sparkContext.setJobGroup("image_dedup_pipeline",
                                   "image_dedup_pipeline")
    t0 = time.time()
    # audit PSNR = the production path (capped fidelity sample);
    # exhaustive pixel verification is exercised by the test suite
    res = DedupPipeline(
        DedupConfig(fuzzy=FuzzyConfig(psnr_mode="audit"),
            # no JSON-ledger export in the benchmark: carrying raw
            # captions through the bandwidth-bound features stage
            # is the export path, not the dedup path
            include_json=False),
        collect_metrics=False,
    ).run(spark, df)
    _force(res.clusters)
    image_sec = round(time.time() - t0, 3)
    timings["image_dedup_pipeline"] = image_sec
    stage_counts["image_dedup_pipeline"] = _stage_count(
        spark, "image_dedup_pipeline")
    df.unpersist()

    # ---- audio near-dup over real WAV blobs (gain-invariant
    # fingerprint through the same inline-Hamming LSH path) -------------
    from deduper_spark.operators.multimodal import audio_dedup_pairs
    from deduper_spark.synth import make_audio_df

    n_audio = max(500, int(sf * 20_000))
    adf = make_audio_df(spark, seed=42, n=n_audio).persist()
    adf.count()  # synth outside the timed window (decode IS timed)
    spark.sparkContext.setJobGroup("audio_dedup", "audio_dedup")
    t0 = time.time()
    _force(audio_dedup_pairs(adf))
    audio_sec = round(time.time() - t0, 3)
    timings["audio_dedup"] = audio_sec
    stage_counts["audio_dedup"] = _stage_count(spark, "audio_dedup")
    adf.unpersist()

    # ---- video near-dup over real MJPEG-AVI blobs (zero-transcode
    # frame sampling + batched-LUT JPEG decode of sampled frames) ------
    from deduper_spark.operators.multimodal import video_dedup_pairs
    from deduper_spark.synth import make_video_df

    n_video = max(200, int(sf * 10_000))
    vdf = make_video_df(spark, seed=42, n=n_video).persist()
    vdf.count()  # synth outside the timed window (decode IS timed)
    spark.sparkContext.setJobGroup("video_dedup", "video_dedup")
    t0 = time.time()
    _force(video_dedup_pairs(vdf, every_n=2))
    video_sec = round(time.time() - t0, 3)
    timings["video_dedup"] = video_sec
    stage_counts["video_dedup"] = _stage_count(spark, "video_dedup")
    vdf.unpersist()

    total = round(sum(timings.values()), 3)
    out = {
        "metric": "headline_queries_total",
        "value": total,
        "unit": "sec",
        "queries": timings,
        "sf": sf,
        "images": n_images,
        "images_per_sec": round(n_images / image_sec, 1),
        "audio_clips": n_audio,
        "audio_clips_per_sec": round(n_audio / audio_sec, 1),
        "video_clips": n_video,
        "video_clips_per_sec": round(n_video / video_sec, 1),
        "cpus": cpus,
        "aqe": not no_aqe,
        "stages": stage_counts,
    }
    spark.stop()
    print(json.dumps(out))


if __name__ == "__main__":
    main()
