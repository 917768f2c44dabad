"""Decompose the image_dedup_pipeline bench: real-PNG corpus vs raw
dspk corpus (round-3 verdict item 1).

BENCH_r03's image_dedup_pipeline regression (9.9 s r2 -> 22.2 s r3)
conflated (a) tenant bursts and (b) the corpus switching from raw dspk
blobs to real PNG (zlib) blobs in commit 8826a8a. synth.make_df now
takes container="png"|"dspk" producing byte-identical captions/phashes/
pixels either way, so the SAME pipeline on the two corpora isolates the
codec decode cost exactly.

Method (memory: host has 2-3x tenant noise): one session, steady-state
warmup first, then ALTERNATE png/dspk reps and report medians + stage
counts. The script checks /proc/loadavg at launch itself and WARNS
(does not abort) when the 1-min load is >= 3; both launch and
completion loadavg land in the JSON so a dirty run is self-labeling.

Usage: python tools/bench_corpus_decomp.py [n_images] [reps]
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 20_000
    reps = int(sys.argv[2]) if len(sys.argv) > 2 else 3

    load_at_launch = open("/proc/loadavg").read().split()[:3]
    if float(load_at_launch[0]) >= 3:
        print(f"WARNING: 1-min load {load_at_launch[0]} >= 3 at launch; "
              "medians will carry tenant noise (alternation still makes "
              "the png-vs-dspk comparison internally valid)",
              file=sys.stderr)

    from deduper_spark.config import DedupConfig, FuzzyConfig
    from deduper_spark.pipeline import DedupPipeline
    from deduper_spark.session import get_spark
    from deduper_spark.synth import make_df

    spark = get_spark("corpus_decomp", master="local[32]",
                      shuffle_partitions=32)
    spark.sparkContext.setLogLevel("ERROR")

    cfg = DedupConfig(fuzzy=FuzzyConfig(psnr_mode="audit"),
                      include_json=False)

    dfs = {}
    for container in ("png", "dspk"):
        d = make_df(spark, seed=42, n=n, container=container).persist()
        d.count()
        dfs[container] = d

    # steady-state warmup (JIT/Arrow init — same exclusion as bench.py)
    w = make_df(spark, seed=43, n=1000).persist()
    w.count()
    DedupPipeline(cfg, collect_metrics=False).run(spark, w)
    w.unpersist()

    from bench import _stage_count

    def stage_count(group: str) -> int:
        return _stage_count(spark, group)

    results: dict[str, list[float]] = {"png": [], "dspk": []}
    stages: dict[str, list[int]] = {"png": [], "dspk": []}
    dupes: dict[str, set] = {}
    for rep in range(reps):
        for container in ("png", "dspk"):
            group = f"{container}-{rep}"
            spark.sparkContext.setJobGroup(group, group)
            t0 = time.time()
            res = DedupPipeline(cfg, collect_metrics=False).run(
                spark, dfs[container])
            res.clusters.write.format("noop").mode("overwrite").save()
            dt = round(time.time() - t0, 2)
            results[container].append(dt)
            stages[container].append(stage_count(group))
            dupes.setdefault(container, set()).add(res.report.dupe_count)
            print(f"rep {rep} {container}: {dt}s "
                  f"(stages {stages[container][-1]})", flush=True)

    def med(xs: list[float]) -> float:
        s = sorted(xs)
        mid = len(s) // 2
        return s[mid] if len(s) % 2 else round((s[mid - 1] + s[mid]) / 2, 2)
    png_m, dspk_m = med(results["png"]), med(results["dspk"])
    out = {
        "n_images": n,
        "reps": reps,
        "png_secs": results["png"],
        "dspk_secs": results["dspk"],
        "png_median": png_m,
        "dspk_median": dspk_m,
        "decode_cost_sec": round(png_m - dspk_m, 2),
        "decode_cost_pct": round(100 * (png_m - dspk_m) / png_m, 1),
        "stage_counts": stages,
        "dupe_counts_identical": all(len(v) == 1 for v in dupes.values())
        and dupes["png"] == dupes["dspk"],
        "load_at_launch": load_at_launch,
        "load_at_end": open("/proc/loadavg").read().split()[:3],
    }
    print(json.dumps(out))
    spark.stop()


if __name__ == "__main__":
    main()
