"""SimHash over caption tokens — vectorized Arrow pandas UDF.

Second signature family (complementary to MinHash): near-identical
token multisets land within a small Hamming ball of each other in
64-bit space; near-dup iff bit_count(a ^ b) <= t (JVM-side
F.bit_count on the verify join).

Kernel: token hashes arrive from the JVM (xxhash64, WITH multiplicity
— SimHash weights by term frequency). The batch is flattened once,
bits unpacked into a (total, 64) ±1 matrix, segment-summed with
np.add.reduceat, sign-thresholded, and packed back to int64.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import Column
from pyspark.sql import functions as F
from pyspark.sql.types import LongType

_BITS = np.arange(64, dtype=np.uint64)


def simhash_kernel(hash_lists: pd.Series) -> pd.Series:
    n = len(hash_lists)
    if n == 0:
        return pd.Series([], dtype="int64")
    safe = [
        np.asarray(v, dtype=np.int64) if len(v) else np.zeros(1, dtype=np.int64)
        for v in hash_lists
    ]
    lens = np.array([len(v) for v in safe])
    flat = np.concatenate(safe).astype(np.uint64)
    votes = (((flat[:, None] >> _BITS[None, :]) & np.uint64(1)).astype(np.int64)
             * 2 - 1)  # (total, 64) in {-1, +1}
    offsets = np.zeros(n, dtype=np.int64)
    np.cumsum(lens[:-1], out=offsets[1:])
    sums = np.add.reduceat(votes, offsets, axis=0)          # (n, 64)
    bits = (sums > 0).astype(np.uint64)
    packed = (bits << _BITS[None, :]).sum(axis=1, dtype=np.uint64)
    return pd.Series(packed.astype(np.int64))


def simhash_udf():
    @F.pandas_udf(LongType())
    def _simhash(hashes: pd.Series) -> pd.Series:
        return simhash_kernel(hashes)

    return _simhash


def simhash_expr(token_hashes: str | Column) -> Column:
    c = F.col(token_hashes) if isinstance(token_hashes, str) else token_hashes
    return simhash_udf()(c)
