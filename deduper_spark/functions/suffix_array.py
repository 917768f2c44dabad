"""Suffix-array kernel (NumPy, pyspark-free — worker-importable).

Classic prefix-doubling suffix array + Kasai LCP, both public
textbook algorithms, vectorized with numpy over a concatenated
document corpus. Used by operators/suffix.py to find pairs of
documents sharing ANY substring of length >= min_len (the
exact-substring dedup of web-scale training corpora — catches
overlaps MinHash misses at low Jaccard), generalizing the
full-caption containment join.
"""

from __future__ import annotations

import numpy as np


def build_suffix_array(s: np.ndarray) -> np.ndarray:
    """Prefix-doubling SA over an int array (any alphabet). O(n log^2 n)."""
    n = len(s)
    if n == 0:
        return np.empty(0, dtype=np.int64)
    order = np.argsort(s, kind="stable")
    rank = np.empty(n, dtype=np.int64)
    rank[order] = np.concatenate(([0], np.cumsum(np.diff(s[order]) != 0)))
    k = 1
    while k < n:
        # sort by (rank[i], rank[i+k]) using stable counting via argsort
        second = np.full(n, -1, dtype=np.int64)
        second[: n - k] = rank[k:]
        key = rank * (n + 1) + (second + 1)
        order = np.argsort(key, kind="stable")
        key_sorted = key[order]
        new_rank = np.empty(n, dtype=np.int64)
        new_rank[order] = np.concatenate(
            ([0], np.cumsum(np.diff(key_sorted) != 0))
        )
        rank = new_rank
        if rank[order[-1]] == n - 1:
            break
        k <<= 1
    return order


def kasai_lcp(s: np.ndarray, sa: np.ndarray) -> np.ndarray:
    """LCP[i] = lcp(suffix sa[i-1], suffix sa[i]); LCP[0] = 0. O(n)."""
    n = len(s)
    lcp = np.zeros(n, dtype=np.int64)
    rank = np.empty(n, dtype=np.int64)
    rank[sa] = np.arange(n)
    h = 0
    for i in range(n):
        r = rank[i]
        if r > 0:
            j = sa[r - 1]
            while i + h < n and j + h < n and s[i + h] == s[j + h]:
                h += 1
            lcp[r] = h
            if h:
                h -= 1
        else:
            h = 0
    return lcp


def shared_substring_pairs(
    texts: list[str], ids: list[str], min_len: int
) -> set[tuple[str, str]]:
    """All id pairs whose texts share a substring of length >= min_len.

    Concatenate with unique sentinels (code points outside the text
    alphabet), build SA+LCP once, then scan maximal runs of suffixes
    with LCP >= min_len: every pair of DISTINCT docs inside a run
    shares such a substring. Runs are reduced to their distinct doc
    sets (bounded per run) so output stays near-linear in practice.
    """
    if not texts:
        return set()
    codes = []
    owners = []
    for d, t in enumerate(texts):
        arr = np.frombuffer(t.encode("utf-32-le"), dtype=np.uint32).astype(
            np.int64
        )
        codes.append(arr)
        codes.append(np.array([0x110000 + d], dtype=np.int64))  # sentinel
        owners.append(np.full(len(arr) + 1, d, dtype=np.int64))
    s = np.concatenate(codes)
    owner = np.concatenate(owners)
    sa = build_suffix_array(s)
    lcp = kasai_lcp(s, sa)
    own_sa = owner[sa]

    pairs: set[tuple[str, str]] = set()
    i = 1
    n = len(s)
    while i < n:
        if lcp[i] >= min_len:
            j = i
            docs = {int(own_sa[i - 1])}
            while j < n and lcp[j] >= min_len:
                docs.add(int(own_sa[j]))
                j += 1
            dl = sorted(docs)
            for a in range(len(dl)):
                for b in range(a + 1, len(dl)):
                    pa, pb = ids[dl[a]], ids[dl[b]]
                    pairs.add((pa, pb) if pa < pb else (pb, pa))
            i = j
        else:
            i += 1
    return pairs
