"""Plan-metric scaling evidence (r5 VERDICT next-round #4).

Wall-clock scaling quotients on a shared-tenant single box are
host-noise-bound (r5 sessions S/U/V/W: 0.15-0.80 spread, one
inversion, all at bit-identical outputs). The scale-DESIGN claim the
north rule is actually about is plan-side and host-noise-immune:

  * stage count invariant in data size (no plan-shape drift), and
  * shuffle read/write BYTES growing ~linearly in input size
    (no quadratic candidate/pair blowup hiding behind AQE).

This tool runs declared queries at two data dirs (e.g. sf0.1 and a
10x-scaled copy) on the SAME session config as bench.py, reads
per-query stage metrics from the Spark REST API (UI enabled on a
private port for THIS tool only — bench.py stays untouched), and
prints one JSON line per query with secs / stages / shuffle+input
bytes at both sizes plus the byte-growth ratios.

Usage:
  python tools/bench_shuffle_scaling.py DIR_SMALL DIR_BIG [query ...]

The 10x dir used for the committed evidence was built by unioning the
sf0.1 tables 10x with id offsets, documents perturbed with a
copy-specific token every 4 words so no >=45-char window (and no
artificial 10-way dup family) crosses copies — dup RATE preserved, so
pair-output growth stays linear like a real corpus's.
"""

from __future__ import annotations

import json
import os
import sys
import time
import urllib.request

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

DEFAULT_QUERIES = [
    "exact_dedup_survivors", "dupe_groups", "incremental_anti",
    "doc_minhash_lsh", "doc_cluster_assign", "doc_ngram_jaccard",
    "doc_substring_sa", "doc_chunk_dedup", "clean_corpus",
    "emb_cosine_dups", "semantic_prune", "event_sessions",
]
UI_PORT = 4049


def _stage_metrics(app_id: str, stage_ids: set[int]) -> dict:
    url = f"http://localhost:{UI_PORT}/api/v1/applications/{app_id}/stages"
    stages = json.load(urllib.request.urlopen(url))
    out = {"shuffle_write": 0, "shuffle_read": 0, "input_bytes": 0}
    for s in stages:
        if s["stageId"] in stage_ids and s["status"] != "SKIPPED":
            out["shuffle_write"] += s["shuffleWriteBytes"]
            out["shuffle_read"] += s["shuffleReadBytes"]
            out["input_bytes"] += s["inputBytes"]
    return out


def _run(sf_dir: str, names: list[str]) -> dict[str, dict]:
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    from deduper_spark.session import get_spark

    spark = get_spark("shuffle_scaling", master=f"local[{cpus}]",
                      shuffle_partitions=cpus,
                      extra_conf={"spark.ui.enabled": "true",
                                  "spark.ui.port": str(UI_PORT),
                                  # keep every stage row queryable
                                  "spark.ui.retainedStages": "5000"})
    spark.sparkContext.setLogLevel("ERROR")
    import __spark_entry__ as entry

    qfns = entry.queries()
    qfns["agg_pricing"](spark, sf_dir).write.format("noop").mode(
        "overwrite").save()
    app_id = spark.sparkContext.applicationId
    tracker = spark.sparkContext.statusTracker()
    res: dict[str, dict] = {}
    for name in names:
        spark.sparkContext.setJobGroup(name, name)
        t0 = time.time()
        qfns[name](spark, sf_dir).write.format("noop").mode(
            "overwrite").save()
        secs = round(time.time() - t0, 3)
        sids: set[int] = set()
        for j in tracker.getJobIdsForGroup(name):
            info = tracker.getJobInfo(j)
            if info:
                sids.update(info.stageIds)
        m = _stage_metrics(app_id, sids)
        res[name] = {"secs": secs, "stages": len(sids), **m}
    spark.stop()
    return res


def main() -> None:
    small_dir, big_dir = sys.argv[1], sys.argv[2]
    names = sys.argv[3:] or DEFAULT_QUERIES
    small = _run(small_dir, names)
    big = _run(big_dir, names)
    for name in names:
        s, b = small[name], big[name]
        row = {
            "query": name,
            "small": s,
            "big": b,
            "input_ratio": round(b["input_bytes"] / max(s["input_bytes"], 1), 2),
            "shuffle_w_ratio": round(
                b["shuffle_write"] / max(s["shuffle_write"], 1), 2),
            "shuffle_r_ratio": round(
                b["shuffle_read"] / max(s["shuffle_read"], 1), 2),
            "stages_invariant": s["stages"] == b["stages"],
        }
        print(json.dumps(row), flush=True)


if __name__ == "__main__":
    main()
