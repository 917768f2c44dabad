"""Winnowing fingerprint kernel — DELIBERATELY pyspark-free.

Winnowing (Schleimer/Wilkerson/Aiken, "Winnowing: Local Algorithms for
Document Fingerprinting", SIGMOD 2003 — the MOSS algorithm) gives the
GUARANTEE this engine's exact-substring pass is built on:

    with character k-grams and a selection window of
    W = min_len - k + 1 consecutive k-gram hashes, any two texts
    sharing a substring of length >= min_len share at least one
    selected fingerprint VALUE.

Proof sketch: a shared substring of length min_len contains W
consecutive k-grams, identical in both texts; winnowing selects the
minimum hash of EVERY window of W consecutive k-grams, in particular
of that shared window — and the minimum of identical windows is the
same value on both sides.

So fingerprint-bucket candidate generation has recall 1.0 by
construction (unlike MinHash banding, whose recall is probabilistic):
the distributed pass over fingerprints is exact, shard-free, and emits
~2/(W+1) of positions per doc (density bound from the paper).

Everything here is numpy over uint64 with wraparound arithmetic,
vectorized per text (no per-character Python loops).
"""

from __future__ import annotations

import numpy as np

from deduper_spark.functions.kernels import splitmix64_inplace

_B = np.uint64(0x100000001B3)  # FNV-ish odd multiplier for the rolling poly


def _codes(text: str) -> np.ndarray:
    return np.frombuffer(text.encode("utf-32-le"), dtype=np.uint32).astype(
        np.uint64
    )


def gram_hashes(codes: np.ndarray, k: int, chunk: int = 1 << 18) -> np.ndarray:
    """Polynomial hash of every k-gram (splitmix-finalized), vectorized.

    h[p] = mix(sum_j codes[p+j] * B^(k-1-j) mod 2^64). Computed with a
    sliding-window view multiplied by the power vector in bounded
    chunks, so peak scratch memory stays ~chunk*k regardless of text
    length (the prefix-poly recurrence would be O(n) sequential Python).
    """
    n = len(codes)
    if n < k:
        return np.empty(0, dtype=np.uint64)
    powers = np.empty(k, dtype=np.uint64)
    powers[-1] = np.uint64(1)
    with np.errstate(over="ignore"):
        for j in range(k - 2, -1, -1):
            powers[j] = powers[j + 1] * _B
        windows = np.lib.stride_tricks.sliding_window_view(codes, k)
        out = np.empty(n - k + 1, dtype=np.uint64)
        for lo in range(0, n - k + 1, chunk):
            hi = min(lo + chunk, n - k + 1)
            out[lo:hi] = (windows[lo:hi] * powers[None, :]).sum(
                axis=1, dtype=np.uint64
            )
        splitmix64_inplace(out)
    return out


def winnow_fingerprints(text: str, min_len: int, k: int = 32) -> np.ndarray:
    """Distinct winnowed fingerprint values of ``text`` (int64 view).

    Selection: minimum hash VALUE in every window of W = min_len-k+1
    consecutive k-gram hashes (value selection is all the guarantee
    needs — positions are irrelevant to a bucket join). Texts shorter
    than min_len fingerprint to nothing: they cannot share a
    >= min_len substring with anything.

    k trades density against candidate precision: candidates must share
    a full k-char gram, so k close to min_len (default 32 for
    min_len=45) keeps stock phrases from flooding buckets — k=16 made
    every shared 16-char phrase a candidate bucket (measured 10x
    verification blowup on templated corpora) — at the price of
    density 2/(W+1) rising from ~6% to ~13% of positions.
    """
    w = min_len - k + 1
    if w < 1:
        raise ValueError(f"k ({k}) must be <= min_len ({min_len})")
    codes = _codes(text)
    if len(codes) < min_len:
        return np.empty(0, dtype=np.int64)
    gh = gram_hashes(codes, k)
    mins = np.lib.stride_tricks.sliding_window_view(gh, w).min(axis=1)
    return np.unique(mins).view(np.int64)


def batch_shares_substring(
    pairs_a: "list[str]", pairs_b: "list[str]", min_len: int
) -> "list[bool]":
    """Exact predicate for a BATCH of pairs: does each (a, b) share any
    substring of length >= min_len?

    Window-hash set intersection (vectorized), then every hash hit is
    CONFIRMED against the literal character windows, so a 64-bit
    collision can never produce a false positive. Per-text hash arrays
    are cached across the batch — candidate generation pairs hot texts
    many times, and re-hashing the same text per pair dominated the
    verification stage before this cache.
    """
    cache: dict[str, tuple[np.ndarray, np.ndarray]] = {}

    def arrays(t: str) -> tuple[np.ndarray, np.ndarray]:
        got = cache.get(t)
        if got is None:
            raw = (gram_hashes(_codes(t), min_len) if len(t) >= min_len
                   else np.empty(0, dtype=np.uint64))
            got = cache[t] = (raw, np.unique(raw))
        return got

    out = []
    for a, b in zip(pairs_a, pairs_b):
        ra, ua = arrays(a)
        rb, ub = arrays(b)
        common = np.intersect1d(ua, ub, assume_unique=True)
        if len(common) == 0:
            out.append(False)
            continue
        # confirm literally at the (few) hash-hit positions
        wa = {a[i: i + min_len] for i in np.flatnonzero(np.isin(ra, common))}
        wb = {b[i: i + min_len] for i in np.flatnonzero(np.isin(rb, common))}
        out.append(bool(wa & wb))
    return out


def shares_substring(a: str, b: str, min_len: int) -> bool:
    """Exact: do a and b share any substring of length >= min_len?"""
    return batch_shares_substring([a], [b], min_len)[0]
