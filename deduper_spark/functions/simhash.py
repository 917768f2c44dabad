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
    """Bit-vote SimHash. Memory-lean: 0/1 bit matrix via unpackbits
    (uint8, 64 B/token), int32 segment sums, threshold 2*ones > m —
    equivalent to the classic ±1 vote with sign(>0)."""
    n = len(hash_lists)
    if n == 0:
        return pd.Series([], dtype="int64")
    safe = [
        np.asarray(v, dtype=np.int64) if v is not None and len(v)
        else np.zeros(1, dtype=np.int64)
        for v in hash_lists
    ]
    lens = np.array([len(v) for v in safe], dtype=np.int64)
    flat = np.concatenate(safe).astype("<u8")
    # (total, 64) 0/1 matrix, little-endian bit k of word -> column k
    ones = np.unpackbits(flat.view(np.uint8).reshape(-1, 8),
                         axis=1, bitorder="little")
    offsets = np.zeros(n, dtype=np.int64)
    np.cumsum(lens[:-1], out=offsets[1:])
    sums = np.add.reduceat(ones.astype(np.int32), offsets, axis=0)  # (n, 64)
    bits = ((2 * sums) > lens[:, None]).astype(np.uint64)
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
