"""Batched MinHash signatures — vectorized Arrow pandas UDF.

Sketch generalization of the reference's exact MD5 key
(Deduper.kt:201): instead of one hash over the whole key string, m
permutation-minima over the shingle-hash SET, so Pr[sig_i(A)==sig_i(B)]
= Jaccard(A, B).

Kernel design (NumPy, no per-row Python beyond ragged-array offsets):

  * inputs are 64-bit shingle hashes computed JVM-side (xxhash64),
    re-mixed with a seeded splitmix64 (full-width mixing bijection —
    a plain affine (a*h+b) mod p over narrow inputs stays piecewise-
    monotonic and biases the Jaccard estimate high, measured +0.13 at
    J=0.79, so it is deliberately NOT used);

  * the signature is ONE-PERMUTATION HASHING with densification
    (Li/Owen/Zhang OPH + Shrivastava-style directional densification,
    both public algorithms): each element is hashed once, routed to
    bucket = top log2(k) bits, min-reduced within its bucket, and
    empty buckets borrow cyclically (log-doubling passes). Cost is
    O(m + k) per row instead of the k-independent-permutations
    O(m*k) — the naive matrix kernel moved ~220 KB/row of memory
    traffic and collapsed to 23% efficiency under 32 concurrent
    workers (measured); OPH moves ~10 KB/row.

  * identical sets -> identical signatures (pure function of the set);
    Pr[sig_i(A)==sig_i(B)] ~= Jaccard(A,B) — the empirical gate is the
    pipeline recall/precision >= 0.99 test.
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


def _splitmix64_inplace(x: np.ndarray) -> np.ndarray:
    """public-domain splitmix64 finalizer, in place (one scratch buffer)."""
    tmp = np.empty_like(x)
    x += np.uint64(0x9E3779B97F4A7C15)
    np.right_shift(x, np.uint64(30), out=tmp)
    x ^= tmp
    x *= np.uint64(0xBF58476D1CE4E5B9)
    np.right_shift(x, np.uint64(27), out=tmp)
    x ^= tmp
    x *= np.uint64(0x94D049BB133111EB)
    np.right_shift(x, np.uint64(31), out=tmp)
    x ^= tmp
    return x

_EMPTY = np.uint64(0xFFFFFFFFFFFFFFFF)


def minhash_kernel(hash_lists: pd.Series, num_perm: int, seed: int) -> pd.Series:
    if num_perm & (num_perm - 1):
        raise ValueError("num_perm must be a power of two (OPH bucketing)")
    shift = np.uint64(64 - int(num_perm).bit_length() + 1)
    n = len(hash_lists)
    if n == 0:
        return pd.Series([], dtype=object)
    salt = _salts(1, seed)[0]
    # null/empty shingle sets get one sentinel element so the signature
    # exists (null captions are tolerated, reference DeduperTest.kt:353-392)
    safe = [
        np.asarray(v, dtype=np.int64) if v is not None and len(v)
        else np.zeros(1, dtype=np.int64)
        for v in hash_lists
    ]
    lens = np.array([len(v) for v in safe], dtype=np.int64)
    flat = np.concatenate(safe).astype(np.uint64)
    with np.errstate(over="ignore"):
        flat ^= salt
        _splitmix64_inplace(flat)
        bucket = (flat >> shift).astype(np.int64)          # [0, num_perm)
        row = np.repeat(np.arange(n, dtype=np.int64), lens)
        key = row * num_perm + bucket
        order = np.lexsort((flat, key))                    # by key, then value
        k_sorted = key[order]
        first = np.ones(len(k_sorted), dtype=bool)
        first[1:] = k_sorted[1:] != k_sorted[:-1]
        sig = np.full(n * num_perm, _EMPTY, dtype=np.uint64)
        sig[k_sorted[first]] = flat[order][first]
        sig = sig.reshape(n, num_perm)
        # densification: empty buckets borrow cyclically (log-doubling
        # passes) — deterministic function of the set, so identical
        # sets keep identical signatures
        s = 1
        while s < num_perm and (sig == _EMPTY).any():
            empty = sig == _EMPTY
            donor = np.roll(sig, s, axis=1)
            sig[empty] = donor[empty]
            s <<= 1
        sig[sig == _EMPTY] = np.uint64(0)  # fully-empty rows (can't happen
        #                                   with the sentinel element above)
    return pd.Series(list(sig.astype(np.int64)))


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
