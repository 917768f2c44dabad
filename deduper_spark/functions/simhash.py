"""SimHash over caption tokens — vectorized Arrow pandas UDF.

Second signature family (complementary to MinHash): near-identical
token multisets land within a small Hamming ball of each other in
64-bit space; near-dup iff bit_count(a ^ b) <= t (JVM-side
F.bit_count on the verify join).

Kernel in functions/kernels.py (pyspark-free worker import graph):
token hashes arrive from the JVM (xxhash64, WITH multiplicity —
SimHash weights by term frequency), bits unpacked via unpackbits,
segment-summed, thresholded at the majority.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F
from pyspark.sql.types import LongType

from deduper_spark.functions.kernels import simhash_kernel  # noqa: F401


def simhash_udf():
    from deduper_spark.functions import kernels

    def _simhash(hashes):
        return kernels.simhash_kernel(hashes)

    return F.pandas_udf(_simhash, LongType())


def simhash_expr(token_hashes: str | Column) -> Column:
    c = F.col(token_hashes) if isinstance(token_hashes, str) else token_hashes
    return simhash_udf()(c)
