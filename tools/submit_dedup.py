"""spark-submit entry point for the image near-dup pipeline.

Cluster usage (north rule: spark-submit --py-files on N and 4N executors):

    cd /root/repo && zip -r /tmp/deduper_spark.zip deduper_spark
    spark-submit --py-files /tmp/deduper_spark.zip \
        tools/submit_dedup.py --input <table-or-parquet> \
        --checkpoint-dir <dir> --run-id r1 [--synth N]

Local sandbox evidence run:

    spark-submit --master 'local[8]' --py-files /tmp/deduper_spark.zip \
        tools/submit_dedup.py --synth 20000

Prints one JSON line with the report + stage metrics.
"""

from __future__ import annotations

import argparse
import json
import sys
import time


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--input", help="input table ident or parquet path")
    ap.add_argument("--synth", type=int, default=0,
                    help="generate a deterministic synthetic corpus of N rows")
    ap.add_argument("--seed", type=int, default=42)
    ap.add_argument("--checkpoint-dir", default=None)
    ap.add_argument("--run-id", default="run0")
    ap.add_argument("--output", default=None,
                    help="write clusters table/path (optional)")
    args = ap.parse_args()

    from pyspark.sql import SparkSession

    # spark-submit owns master/conf; only fill app-level defaults here
    spark = (
        SparkSession.builder.appName("deduper_spark_submit")
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("WARN")

    from deduper_spark.config import DedupConfig
    from deduper_spark.pipeline import DedupPipeline

    if args.synth:
        from deduper_spark.synth import make_df

        df = make_df(spark, args.seed, args.synth).persist()
        df.count()
    elif args.input:
        from deduper_spark.sources.readers import read_table

        df = read_table(spark, args.input)
    else:
        print("need --input or --synth", file=sys.stderr)
        sys.exit(2)

    cfg = DedupConfig(checkpoint_dir=args.checkpoint_dir, run_id=args.run_id)
    t0 = time.time()
    res = DedupPipeline(cfg).run(spark, df)
    if args.output:
        from deduper_spark.sinks.writers import write_table

        write_table(res.clusters, args.output)
    dt = time.time() - t0
    out = {
        "sec": round(dt, 3),
        "report": json.loads(res.report.to_json()),
        "stages": res.metrics,
    }
    print(json.dumps(out))
    spark.stop()


if __name__ == "__main__":
    main()
