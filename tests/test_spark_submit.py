"""EXECUTED spark-submit --py-files deployment path (north rule: 'run
via spark-submit --py-files on a multi-executor cluster').

The test packages deduper_spark into a zip exactly as a cluster deploy
would, then launches a real `spark-submit --master local[2]
--py-files deduper_spark.zip tools/submit_dedup.py` SUBPROCESS with
cwd OUTSIDE the repo — so the package import genuinely resolves from
the shipped zip, not the working directory — and checks the pipeline's
planted-truth cluster counts from the emitted JSON line. This is the
same launch command BENCH/BASELINE.md's two-parallelism scaling
sessions use; here it runs small (n=120) to stay in unit-test budget.
"""

from __future__ import annotations

import json
import os
import subprocess
import sys
import zipfile

import pyspark

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _build_zip(path: str) -> None:
    pkg = os.path.join(REPO, "deduper_spark")
    with zipfile.ZipFile(path, "w", zipfile.ZIP_DEFLATED) as zf:
        for root, _dirs, files in os.walk(pkg):
            for f in files:
                if f.endswith(".py"):
                    full = os.path.join(root, f)
                    zf.write(full, os.path.relpath(full, REPO))


def test_spark_submit_py_files_end_to_end(tmp_path):
    zip_path = str(tmp_path / "deduper_spark.zip")
    _build_zip(zip_path)
    submit = os.path.join(os.path.dirname(pyspark.__file__),
                          "bin", "spark-submit")
    env = {k: v for k, v in os.environ.items() if k != "PYTHONPATH"}
    env["PYSPARK_PYTHON"] = sys.executable
    env["PYSPARK_DRIVER_PYTHON"] = sys.executable
    proc = subprocess.run(
        [submit, "--master", "local[2]",
         "--conf", "spark.sql.shuffle.partitions=4",
         "--conf", "spark.driver.memory=4g",
         "--py-files", zip_path,
         os.path.join(REPO, "tools", "submit_dedup.py"),
         "--synth", "120", "--run-id", "submit_smoke"],
        cwd=str(tmp_path),                 # NOT the repo — zip must serve
        env=env, capture_output=True, text=True, timeout=600,
    )
    assert proc.returncode == 0, proc.stderr[-4000:]
    line = [ln for ln in proc.stdout.splitlines()
            if ln.startswith("{") and '"report"' in ln][-1]
    out = json.loads(line)
    rep = out["report"]
    assert rep["success"] is True
    assert rep["record_count"] == 120
    # planted truth: 4 dup roles per block of 10 → 48 non-survivors
    from deduper_spark.synth import expected_clusters

    exp = expected_clusters(42, 120)
    assert rep["dupe_count"] == 120 - exp["cluster_id"].nunique()
    assert out["stages"], "per-stage metrics must be emitted"


def test_spark_submit_image_dir_mode(tmp_path):
    """The deployment entry point's foreign-corpus mode: spark-submit
    --py-files with --image-dir clusters a directory of images through
    the JVM seam (imports from the shipped zip, cwd outside the repo)
    and reports planted-truth counts."""
    import numpy as np

    from deduper_spark.functions.png import encode_png

    rng = np.random.default_rng(17)
    corpus = tmp_path / "imgs"
    corpus.mkdir()
    for i in range(4):
        px = np.kron(rng.integers(0, 256, (8, 8, 3)).astype(np.uint8),
                     np.ones((8, 8, 1), dtype=np.uint8))
        (corpus / f"img{i}.png").write_bytes(encode_png(px))
        if i == 2:
            (corpus / "img2copy.png").write_bytes(encode_png(px))

    zip_path = str(tmp_path / "deduper_spark.zip")
    _build_zip(zip_path)
    submit = os.path.join(os.path.dirname(pyspark.__file__),
                          "bin", "spark-submit")
    env = {k: v for k, v in os.environ.items() if k != "PYTHONPATH"}
    env["PYSPARK_PYTHON"] = sys.executable
    env["PYSPARK_DRIVER_PYTHON"] = sys.executable
    proc = subprocess.run(
        [submit, "--master", "local[2]",
         "--conf", "spark.sql.shuffle.partitions=4",
         "--conf", "spark.driver.memory=4g",
         "--py-files", zip_path,
         os.path.join(REPO, "tools", "submit_dedup.py"),
         "--image-dir", str(corpus)],
        cwd=str(tmp_path), env=env, capture_output=True, text=True,
        timeout=600,
    )
    assert proc.returncode == 0, proc.stderr[-4000:]
    line = [ln for ln in proc.stdout.splitlines()
            if ln.startswith("{") and '"image_dir"' in ln][-1]
    out = json.loads(line)
    assert out["files_clustered"] == 5
    assert out["clusters"] == 4
    assert out["dupes"] == 1


def test_spark_submit_docs_mode(tmp_path, spark):
    """The deployment entry point's text-corpus mode: spark-submit
    --py-files with --docs runs span-level chunk dedup + MinHash
    cluster assignment over a (doc_id, text) parquet and reports
    planted-truth counters."""
    a = "a b c d e f g h i j"
    b = "k l m n o p q r s t"
    base = ("spark table row scan filter join agg window batch line "
            "key value part hash merge sort group limit order data")
    rows = [
        (0, f"{a} {b}"),        # owns both chunks
        (1, a),                 # fully span-duplicated -> drops
        (2, base),              # near-dup cluster seed
        (3, base + " tiny"),    # near-dup of 2 (cluster {2,3})
    ]
    src = tmp_path / "docs"
    spark.createDataFrame(rows, "doc_id long, text string").write.parquet(
        str(src))

    zip_path = str(tmp_path / "deduper_spark.zip")
    _build_zip(zip_path)
    submit = os.path.join(os.path.dirname(pyspark.__file__),
                          "bin", "spark-submit")
    env = {k: v for k, v in os.environ.items() if k != "PYTHONPATH"}
    env["PYSPARK_PYTHON"] = sys.executable
    env["PYSPARK_DRIVER_PYTHON"] = sys.executable
    proc = subprocess.run(
        [submit, "--master", "local[2]",
         "--conf", "spark.sql.shuffle.partitions=4",
         "--conf", "spark.driver.memory=4g",
         "--py-files", zip_path,
         os.path.join(REPO, "tools", "submit_dedup.py"),
         "--docs", str(src)],
        cwd=str(tmp_path), env=env, capture_output=True, text=True,
        timeout=600,
    )
    assert proc.returncode == 0, proc.stderr[-4000:]
    line = [ln for ln in proc.stdout.splitlines()
            if ln.startswith("{") and '"docs"' in ln][-1]
    out = json.loads(line)
    assert out["docs_in"] == 4
    assert out["docs_with_novel_spans"] == 3      # doc 1 vanished
    assert out["chunks_kept"] == 5   # doc0:2, doc1:0, doc2:2, doc3:1 (novel tail)
    assert out["near_dup_clusters"] == 3          # {0},{1},{2,3}
    assert out["near_dup_members"] == 1
