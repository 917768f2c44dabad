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
    alphabet), build the SA once, then find maximal runs of SA-adjacent
    suffixes whose min_len-prefixes agree: every pair of DISTINCT docs
    inside a run shares such a substring.

    The LCP >= min_len test is VECTORIZED: lcp(sa[i-1], sa[i]) >=
    min_len iff the two suffixes' min_len-char window hashes agree
    (gram_hashes — one vectorized pass over the corpus), replacing the
    per-character Python Kasai loop on this path (kasai_lcp stays for
    full-LCP analytics). A hash collision can only ADD a candidate
    pair, never drop one; every emitted pair is confirmed literally
    (shares_substring), so output is exact.
    """
    if not texts:
        return set()
    from deduper_spark.functions.winnow import gram_hashes, shares_substring

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
    n = len(s)
    if n < min_len:
        return set()
    sa = build_suffix_array(s)
    own_sa = owner[sa]

    # window hash of the min_len-prefix of every suffix (0 where the
    # suffix is shorter than min_len — those positions are 'invalid')
    gh = gram_hashes(s.astype(np.uint64), min_len)
    pref = np.zeros(n, dtype=np.uint64)
    pref[: len(gh)] = gh
    valid = sa <= n - min_len
    adj = valid[1:] & valid[:-1] & (pref[sa[1:]] == pref[sa[:-1]])
    eq = np.concatenate(([False], adj))  # eq[i]: lcp(i-1, i) >= min_len
    run_start = np.flatnonzero(eq & ~np.concatenate(([False], eq[:-1])))
    run_end = np.flatnonzero(eq & ~np.concatenate((eq[1:], [False])))

    cand: set[tuple[str, str]] = set()
    for st, en in zip(run_start, run_end):
        docs = np.unique(own_sa[st - 1 : en + 1])
        for a in range(len(docs)):
            for b in range(a + 1, len(docs)):
                pa, pb = ids[int(docs[a])], ids[int(docs[b])]
                cand.add((pa, pb) if pa < pb else (pb, pa))
    if not cand:
        return cand
    by_id = dict(zip(ids, texts))
    return {
        (a, b) for a, b in cand if shares_substring(by_id[a], by_id[b], min_len)
    }
