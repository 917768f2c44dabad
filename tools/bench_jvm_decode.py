"""A/B: JVM vs Python MJPEG frame decode in the video hot path
(round-5 directive 3: give the in-column MJPEG path a JVM decode
route and A/B it against the LUT decoder).

Measures ``video_dedup_pairs`` end-to-end — sampling + decode + phash
+ LSH + verify, identical plan except the decode backend — over MJPEG
AVI corpora at several FRAME SIZES, because the decode share is
size-dependent: at the synthetic corpus's 64x64 frames the Python LUT
decoder is not the bottleneck (expect ~1x), while at realistic frame
sizes (320+) ImageIO's native Huffman dominates it by an order of
magnitude (decode-stage probes: 3.5x @128, 15-20x @320, 9-22x @640).

Protocol (memory: host noise — never back-to-back blocks): alternating
python/jvm reps within one process so both backends sample the same
host window; per-rep busy-cores label; planted-pair assertion inline —
a speedup only counts if the answers match. Two warm passes per
backend (the JVM leg needs C2 JIT on the ImageIO reader).

Usage:  python tools/bench_jvm_decode.py [n_videos] [reps_per_backend]
                                         [--sizes=64,320]
"""

from __future__ import annotations

import json
import os
import sys
import time


def _cpu_jiffies() -> tuple[int, int]:
    parts = open("/proc/stat").readline().split()[1:]
    vals = [int(x) for x in parts]
    return sum(vals), vals[3] + vals[4]


def make_clip_df(spark, n: int, size: int, n_frames: int = 6):
    """Distributed MJPEG-AVI corpus at the given frame size; every
    block of 10 plants one exact copy (i%10==6 copies i-6)."""
    import numpy as np
    import pandas as pd

    def gen(batches):
        from deduper_spark.functions.avi import encode_avi_mjpeg

        for pdf in batches:
            rows = []
            for i in pdf["id"]:
                i = int(i)
                base = i - 6 if i % 10 == 6 else i
                rng = np.random.default_rng(1000 + base)
                px = np.clip(
                    np.linspace(0, 255, size)[None, :, None]
                    + rng.normal(0, 25, (size, size, 3)), 0, 255
                ).astype(np.uint8)
                frames = [np.roll(px, 4 * k, axis=1)
                          for k in range(n_frames)]
                rows.append((f"vid{i:09d}",
                             encode_avi_mjpeg(frames, fps=10)))
            yield pd.DataFrame(rows, columns=["video_id", "bytes"])

    return spark.range(n).mapInPandas(
        gen, "video_id string, bytes binary")


def main() -> None:
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    sys.path.insert(0, repo)
    n = int(sys.argv[1]) if len(sys.argv) > 1 \
        and not sys.argv[1].startswith("--") else 2_000
    reps = int(sys.argv[2]) if len(sys.argv) > 2 \
        and not sys.argv[2].startswith("--") else 3
    sizes = [64, 320]
    for a in sys.argv[1:]:
        if a.startswith("--sizes="):
            sizes = [int(x) for x in a.split("=", 1)[1].split(",")]

    from deduper_spark.operators.multimodal import video_dedup_pairs
    from deduper_spark.session import get_spark
    from deduper_spark.sources.jvm_udf import register_jvm_decode_udfs

    spark = get_spark("jvm-decode-ab", master="local[32]",
                      shuffle_partitions=32)
    spark.sparkContext.setLogLevel("ERROR")
    if not register_jvm_decode_udfs(spark):
        print("SUMMARY " + json.dumps(
            {"error": "JVM decode seam unavailable on this host"}))
        return

    summaries = []
    for size in sizes:
        # big frames decode slower: shrink n to keep the wall bounded,
        # report the actual n used
        n_sz = n if size <= 64 else max(200, n // (size // 64) ** 2)
        df = make_clip_df(spark, n_sz, size).persist()
        df.count()
        expected = {(f"vid{i - 6:09d}", f"vid{i:09d}")
                    for i in range(n_sz) if i % 10 == 6}

        for _ in range(2):                     # JIT + codegen warm
            for be in ("python", "jvm"):
                video_dedup_pairs(df.limit(128),
                                  decode_backend=be).count()

        results: list[dict] = []
        for rep in range(reps):
            for be in ("python", "jvm"):       # alternating
                tot0, idle0 = _cpu_jiffies()
                t0 = time.time()
                pairs = video_dedup_pairs(df, decode_backend=be) \
                    .select("id_l", "id_r").collect()
                dt = time.time() - t0
                tot1, idle1 = _cpu_jiffies()
                busy = ((tot1 - tot0) - (idle1 - idle0)) \
                    / max(tot1 - tot0, 1) * (os.cpu_count() or 1)
                got = {(min(r.id_l, r.id_r), max(r.id_l, r.id_r))
                       for r in pairs}
                assert got == expected, (
                    f"[{be} sz={size}] pair mismatch: "
                    f"missing={len(expected - got)} "
                    f"extra={len(got - expected)}")
                r = {"size": size, "rep": rep, "backend": be, "n": n_sz,
                     "sec": round(dt, 3),
                     "videos_per_sec": round(n_sz / dt, 1),
                     "busy_cores": round(busy, 1),
                     "load1": open("/proc/loadavg").read().split()[0]}
                results.append(r)
                print("REP " + json.dumps(r), flush=True)
        df.unpersist()

        def best(be):
            return min(r["sec"] for r in results if r["backend"] == be)

        s = {"size": size, "n": n_sz, "reps_per_backend": reps,
             "python_best_sec": best("python"),
             "jvm_best_sec": best("jvm"),
             "python_videos_per_sec": round(n_sz / best("python"), 1),
             "jvm_videos_per_sec": round(n_sz / best("jvm"), 1),
             "jvm_speedup": round(best("python") / best("jvm"), 2),
             "pairs": len(expected)}
        summaries.append(s)
        print("SIZE_SUMMARY " + json.dumps(s), flush=True)

    print("SUMMARY " + json.dumps({"sizes": summaries}))
    spark.stop()


if __name__ == "__main__":
    main()
