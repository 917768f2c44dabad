"""Measured recall/cost curve for embedding_cosine_pairs vs table count.

Round-3 verdict: the auto-derived L=7 tables at threshold 0.95 doubled
the bench query wall time, and the trade was justified analytically
(lsh_tables_for_recall's binomial model) but never MEASURED. This tool
plants boundary pairs at exactly-controlled cosines and measures, per
table count L:

  * boundary recall  — planted pairs at cosine = threshold + 0.005
    (the worst pairs the operator promises to find),
  * typical recall   — planted pairs at cosine ~ 0.985 (realistic
    near-dup embeddings sit well above the threshold),
  * wall seconds for the full operator at that L.

Corpus: ``n_background`` random unit vectors (dim matches the testdata
embeddings table) + ``n_planted`` pairs per cosine level, built with a
fixed seed. A planted pair is (u, cos*u + sin*w) with w ⊥ u, so its
cosine is exact by construction.

Usage: python tools/emb_recall_curve.py [--n=20000] [--dim=64]
Prints one JSON line per L plus a final summary JSON; paste the table
into BENCH/BASELINE.md.
"""

from __future__ import annotations

import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def planted_corpus(n_background: int, n_planted: int, dim: int,
                   levels: dict[str, float], seed: int = 7):
    """Returns (rows, pair_sets) — rows = [(vec_id, [float,...])],
    pair_sets = {level_name: set((id_l, id_r))}."""
    rng = np.random.default_rng(seed)
    rows = []
    pair_sets: dict[str, set] = {k: set() for k in levels}
    nid = 0

    def unit(v):
        return v / np.linalg.norm(v)

    for _ in range(n_background):
        rows.append((nid, unit(rng.standard_normal(dim)).tolist()))
        nid += 1
    for name, cos in levels.items():
        s = float(np.sqrt(1.0 - cos * cos))
        for _ in range(n_planted):
            u = unit(rng.standard_normal(dim))
            w = rng.standard_normal(dim)
            w = unit(w - np.dot(w, u) * u)          # orthogonalize
            v = cos * u + s * w
            a, b = nid, nid + 1
            rows.append((a, u.tolist()))
            rows.append((b, v.tolist()))
            pair_sets[name].add((a, b))
            nid += 2
    return rows, pair_sets


def main() -> None:
    n_background = 20_000
    dim = 64
    threshold = 0.95
    for a in sys.argv[1:]:
        if a.startswith("--n="):
            n_background = int(a.split("=")[1])
        if a.startswith("--dim="):
            dim = int(a.split("=")[1])

    from deduper_spark.operators.dedup_text import (
        embedding_cosine_pairs,
        lsh_tables_for_recall,
    )
    from deduper_spark.session import get_spark

    spark = get_spark("emb_recall", master="local[32]",
                      shuffle_partitions=32)
    spark.sparkContext.setLogLevel("ERROR")

    levels = {"boundary_0.955": 0.955, "typical_0.985": 0.985}
    rows, pair_sets = planted_corpus(n_background, 200, dim, levels)
    df = spark.createDataFrame(
        [(int(i), [float(x) for x in v]) for i, v in rows],
        "vec_id long, embedding array<float>").persist()
    df.count()

    auto_l = lsh_tables_for_recall(threshold, n_planes=16, probe_radius=1)
    results = []
    for n_tables in (1, 2, 3, 4, 5, 6, 7, 8):
        t0 = time.time()
        got = {
            (r["id_l"], r["id_r"])
            for r in embedding_cosine_pairs(
                df, threshold=threshold, n_tables=n_tables,
            ).collect()
        }
        dt = round(time.time() - t0, 2)
        rec = {
            name: round(
                sum(1 for p in ps if p in got or (p[1], p[0]) in got)
                / len(ps), 4)
            for name, ps in pair_sets.items()
        }
        row = {"n_tables": n_tables, "sec": dt, **rec,
               "pairs_found": len(got)}
        results.append(row)
        print(json.dumps(row), flush=True)

    print(json.dumps({
        "corpus": {"background": n_background, "planted_per_level": 200,
                   "dim": dim, "threshold": threshold},
        "auto_derived_tables": auto_l,
        "curve": results,
    }))
    spark.stop()


if __name__ == "__main__":
    main()
