"""Video near-dup scale check (verdict item 2 done-criterion).

Reproduces the round-3 measurement — ``video_dedup_pairs`` over n
synthetic MJPEG-AVI clips (6-10 frames each, every 2nd frame decoded)
at local[32] — so the LUT-based JPEG entropy decoder (round 4,
functions/jpeg.py) can be compared against the round-3 per-symbol
bit-reader number (3.57 s / 560 videos/s at n=2,000 under load 14-18).

Correctness is asserted inline: exactly the planted dup pairs (role
6 == byte-identical copy of role 0 per block of 10) and zero false
positives, same as the round-3 check.

Usage:  python tools/bench_video_scale.py [n_videos] [reps]
Prints one JSON line per rep plus a summary with host busy-cores per
timed window (tenant-noise label, same method as bench_scaling.py).
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


def main() -> None:
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    sys.path.insert(0, repo)
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 2_000
    reps = int(sys.argv[2]) if len(sys.argv) > 2 else 3

    from deduper_spark.session import get_spark
    from deduper_spark.synth import make_video_df, _video_base_index
    from deduper_spark.operators.multimodal import video_dedup_pairs

    spark = get_spark("video-scale", master="local[32]",
                      shuffle_partitions=32)
    spark.sparkContext.setLogLevel("ERROR")

    df = make_video_df(spark, 7, n).persist()
    df.count()

    expected = set()
    for i in range(n):
        base_i, klass = _video_base_index(i)
        if klass != "base" and base_i < n:
            expected.add((f"vid{base_i:09d}", f"vid{i:09d}"))

    results = []
    for rep in range(reps):
        tot0, idle0 = _cpu_jiffies()
        t0 = time.time()
        pairs = video_dedup_pairs(df).select("id_l", "id_r").collect()
        dt = time.time() - t0
        tot1, idle1 = _cpu_jiffies()
        busy = ((tot1 - tot0) - (idle1 - idle0)) / max(tot1 - tot0, 1) \
            * (os.cpu_count() or 1)
        got = {(min(r.id_l, r.id_r), max(r.id_l, r.id_r)) for r in pairs}
        assert got == expected, (
            f"pair mismatch: missing={len(expected - got)} "
            f"extra={len(got - expected)}")
        r = {"rep": rep, "n": n, "sec": round(dt, 3),
             "videos_per_sec": round(n / dt, 1),
             "busy_cores": round(busy, 1),
             "pairs": len(got), "load1": open("/proc/loadavg").read().split()[0]}
        results.append(r)
        print("REP " + json.dumps(r), flush=True)

    best = min(results, key=lambda r: r["sec"])
    print("SUMMARY " + json.dumps({
        "n": n, "reps": reps, "best_sec": best["sec"],
        "best_videos_per_sec": best["videos_per_sec"],
        "r3_videos_per_sec": 560.0,
        "speedup_vs_r3": round(best["videos_per_sec"] / 560.0, 2),
        "pairs": best["pairs"], "expected_pairs": len(expected),
    }))
    spark.stop()


if __name__ == "__main__":
    main()
