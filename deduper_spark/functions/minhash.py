"""Batched MinHash signatures — vectorized Arrow pandas UDF.

Sketch generalization of the reference's exact MD5 key
(Deduper.kt:201): instead of one hash over the whole key string, m
permutation-minima over the shingle-hash SET, so Pr[sig_i(A)==sig_i(B)]
= Jaccard(A, B).

Kernel design (NumPy, no per-row Python beyond ragged-array offsets):
  * inputs are 64-bit shingle hashes computed JVM-side (xxhash64);
  * each "permutation" is XOR with a seeded 64-bit salt followed by
    the splitmix64 finalizer — a full-width mixing BIJECTION of the
    uint64 space, so minima behave min-wise-independently. (A plain
    affine (a*h+b) mod p over 32-bit inputs wraps only a few times,
    stays piecewise-monotonic, and biases the Jaccard estimate high —
    measured +0.13 at J=0.79 — so it is deliberately NOT used.)
  * the whole Arrow batch is flattened once, the (num_perm, total)
    matrix is reduced with np.minimum.reduceat per row segment —
    one vectorized pass per batch, not per row.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import Column
from pyspark.sql import functions as F
from pyspark.sql.types import ArrayType, LongType


def _salts(num_perm: int, seed: int) -> np.ndarray:
    rng = np.random.default_rng(seed)
    return rng.integers(0, 1 << 64, size=num_perm, dtype=np.uint64)


def _splitmix64(x: np.ndarray) -> np.ndarray:
    # public-domain splitmix64 finalizer; uint64 wraparound is intended
    x = (x + np.uint64(0x9E3779B97F4A7C15))
    x = (x ^ (x >> np.uint64(30))) * np.uint64(0xBF58476D1CE4E5B9)
    x = (x ^ (x >> np.uint64(27))) * np.uint64(0x94D049BB133111EB)
    return x ^ (x >> np.uint64(31))


def minhash_kernel(hash_lists: pd.Series, num_perm: int, seed: int) -> pd.Series:
    salts = _salts(num_perm, seed)
    n = len(hash_lists)
    if n == 0:
        return pd.Series([], dtype=object)
    # empty shingle sets get one sentinel element so the signature exists
    safe = [
        np.asarray(v, dtype=np.int64) if len(v) else np.zeros(1, dtype=np.int64)
        for v in hash_lists
    ]
    lens = np.array([len(v) for v in safe])
    flat = np.concatenate(safe).astype(np.uint64)
    with np.errstate(over="ignore"):
        m = _splitmix64(flat[None, :] ^ salts[:, None])  # (num_perm, total)
    offsets = np.zeros(n, dtype=np.int64)
    np.cumsum(lens[:-1], out=offsets[1:])
    sig = np.minimum.reduceat(m, offsets, axis=1)  # (num_perm, n)
    sig_i64 = sig.astype(np.int64).T
    return pd.Series(list(sig_i64))


def minhash_udf(num_perm: int = 128, seed: int = 42):
    @F.pandas_udf(ArrayType(LongType()))
    def _minhash(hashes: pd.Series) -> pd.Series:
        return minhash_kernel(hashes, num_perm, seed)

    return _minhash


def minhash_expr(shingle_hashes: str | Column, num_perm: int = 128,
                 seed: int = 42) -> Column:
    c = F.col(shingle_hashes) if isinstance(shingle_hashes, str) else shingle_hashes
    return minhash_udf(num_perm, seed)(c)


def jaccard_estimate(sig_a: np.ndarray, sig_b: np.ndarray) -> float:
    return float(np.mean(np.asarray(sig_a) == np.asarray(sig_b)))
