"""Isolate single declared queries with the noop sink (guide §1.4).

Usage:  python tools/bench_isolate.py q1 q2 ... [--reps N] [--explain]

Times each named query from __spark_entry__.queries() end-to-end with
df.write.format("noop") on the same session config as bench.py, prints
per-rep seconds + stage counts, and with --explain writes
plans/r06/<name>_current.txt (.explain("formatted")).
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    args = sys.argv[1:]
    reps = 3
    if "--reps" in args:
        i = args.index("--reps")
        reps = int(args[i + 1])
        del args[i : i + 2]
    explain = "--explain" in args
    names = [a for a in args if not a.startswith("--")]
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))

    from deduper_spark.session import get_spark

    spark = get_spark("bench_isolate", master=f"local[{cpus}]",
                      shuffle_partitions=cpus)
    spark.sparkContext.setLogLevel("ERROR")

    import __spark_entry__ as entry

    qfns = entry.queries()
    # warmup: same as bench.py
    qfns["agg_pricing"](spark, sf_dir).write.format("noop").mode(
        "overwrite").save()

    out: dict[str, list[float]] = {}
    for name in names:
        if explain:
            df = qfns[name](spark, sf_dir)
            txt = df._jdf.queryExecution().explainString(
                spark._jvm.org.apache.spark.sql.execution.ExplainMode
                .fromString("formatted"))
            os.makedirs("plans/r06", exist_ok=True)
            with open(f"plans/r06/{name}_current.txt", "w") as f:
                f.write(txt)
        times = []
        stages = []
        for r in range(reps):
            grp = f"{name}#{r}"
            spark.sparkContext.setJobGroup(grp, grp)
            t0 = time.time()
            qfns[name](spark, sf_dir).write.format("noop").mode(
                "overwrite").save()
            times.append(round(time.time() - t0, 3))
            tracker = spark.sparkContext.statusTracker()
            sids: set[int] = set()
            for j in tracker.getJobIdsForGroup(grp):
                info = tracker.getJobInfo(j)
                if info:
                    sids.update(info.stageIds)
            stages.append(len(sids))
        out[name] = times
        print(json.dumps({"query": name, "secs": times,
                          "stages": stages}), flush=True)
    spark.stop()


if __name__ == "__main__":
    main()
