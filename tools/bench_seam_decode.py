"""Quantify the foreign-decode claim: JVM-seam features
(read_image_source -> image_features_from_source, decode inside
javax.imageio) vs the in-column Python-codec path
(extract_image_features over PNG bytes) on the SAME images.

Writes n PNGs (plain filter-0 and Paeth-filtered — libpng's default is
Paeth-heavy, the worst case for any Python unfilter) to a tmp dir,
then times both paths end-to-end to a noop sink in one Spark session
(warmed). Prints one JSON line per (filter, path) cell.

Usage: python tools/bench_seam_decode.py [n] [--size=64] [--cpus=8]
"""

from __future__ import annotations

import json
import os
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
from benchlib import flag_args, flag_value, positional_n


def main() -> None:
    n = positional_n(sys.argv, 2000)
    size = 64
    cpus = 8
    for a in flag_args(sys.argv):
        if a.startswith("--size="):
            size = int(flag_value(a))
        if a.startswith("--cpus="):
            cpus = int(flag_value(a))

    import numpy as np
    import pandas as pd
    from pyspark.sql import functions as F

    from deduper_spark.functions.png import encode_png
    from deduper_spark.operators.multimodal import (
        extract_image_features,
        image_features_from_source,
    )
    from deduper_spark.session import get_spark
    from deduper_spark.sources.readers import read_image_source

    spark = get_spark("seam_bench", master=f"local[{cpus}]",
                      shuffle_partitions=cpus)
    spark.sparkContext.setLogLevel("ERROR")

    rng = np.random.default_rng(23)
    blobs: dict[str, list[bytes]] = {"plain": [], "paeth": []}
    k = size // 8
    for i in range(n):
        px = np.kron(rng.integers(0, 256, (8, 8, 3)).astype(np.uint8),
                     np.ones((k, k, 1), dtype=np.uint8))
        blobs["plain"].append(encode_png(px, filter_type=0))
        blobs["paeth"].append(encode_png(px, filter_type=4))

    def force(df) -> None:
        df.write.format("noop").mode("overwrite").save()

    results = []
    for filt in ("plain", "paeth"):
        with tempfile.TemporaryDirectory() as d:
            for i, b in enumerate(blobs[filt]):
                with open(os.path.join(d, f"{filt}{i:05d}.png"), "wb") as f:
                    f.write(b)
            col_df = spark.createDataFrame(pd.DataFrame({
                "id": [f"{filt}{i:05d}" for i in range(n)],
                "bytes": [bytearray(b) for b in blobs[filt]],
            })).repartition(cpus).persist()
            col_df.count()

            # warm both paths once (codegen/Arrow/worker fork)
            force(image_features_from_source(
                read_image_source(spark, d)).select("phash"))
            force(extract_image_features(
                col_df, "id", "bytes").select("phash"))

            t0 = time.time()
            force(image_features_from_source(
                read_image_source(spark, d)).select("phash"))
            jvm_s = time.time() - t0

            t0 = time.time()
            force(extract_image_features(
                col_df, "id", "bytes").select("phash"))
            py_s = time.time() - t0
            col_df.unpersist()
            results.append({
                "filter": filt, "n": n, "size": size, "cpus": cpus,
                "jvm_seam_sec": round(jvm_s, 3),
                "python_codec_sec": round(py_s, 3),
                "jvm_speedup": round(py_s / jvm_s, 2),
            })
            print(json.dumps(results[-1]), flush=True)
    spark.stop()


if __name__ == "__main__":
    main()
