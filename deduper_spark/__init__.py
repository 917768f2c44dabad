"""deduper_spark — a from-scratch PySpark-native near-duplicate detection
and clustering engine.

Carries the semantics of the reference engine (bmiller1009/deduper —
exact-key dedup, keep-first survivor selection, dupe-group ledger,
incremental seen-hash mode, multi-sink outputs, audit report; see
/root/reference/src/main/kotlin/org/bradfordmiller/deduper/Deduper.kt)
re-expressed Spark-first: DataFrame/Catalyst plans, vectorized Arrow
pandas UDFs for signature kernels, LSH banding with salted repartition
for skew, and iterative DataFrame connected components for clustering.

Nothing here is a port: the reference is a single-JVM row-cursor
pipeline; this engine is a distributed columnar plan designed for
1000-executor clusters over ~100 TB image+caption corpora.
"""

from deduper_spark.config import DedupConfig, FuzzyConfig
from deduper_spark.report import DedupeReport

__version__ = "0.1.0"

__all__ = ["DedupConfig", "FuzzyConfig", "DedupeReport"]
