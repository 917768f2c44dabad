"""Caption normalization, tokenization and k-shingling — all JVM-side.

Generalizes the reference's row stringification (Deduper.kt:195, the
", "-joined key string) to fuzzy keys. Everything here is built-in
Catalyst expressions (lower/regexp_replace/split + higher-order
functions) so it stays inside whole-stage codegen — no Python in the
normalize/shingle hot path. Only the MinHash/SimHash sketch kernels
(minhash.py / simhash.py) leave the JVM, via Arrow.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def normalize_expr(col: str | Column) -> Column:
    """lowercase, strip non-alphanumerics, collapse whitespace."""
    c = F.col(col) if isinstance(col, str) else col
    c = F.lower(c)
    c = F.regexp_replace(c, r"[^a-z0-9]+", " ")
    return F.trim(c)


def tokens_expr(col: str | Column) -> Column:
    return F.split(normalize_expr(col), r"\s+")


def shingles_expr(tokens: str | Column, k: int) -> Column:
    """Token k-grams as strings: array_join of each sliding window.

    Short texts (< k tokens) degrade to one whole-text shingle, so every
    row gets at least one signature element.
    """
    t = F.col(tokens) if isinstance(tokens, str) else tokens
    joined = F.array_join(t, " ")
    windows = F.transform(
        F.sequence(F.lit(0), F.size(t) - F.lit(k)),
        lambda i: F.array_join(F.slice(t, i + F.lit(1), F.lit(k)), " "),
    )
    return F.when(F.size(t) < F.lit(k), F.array(joined)).otherwise(windows)


def shingle_hashes_expr(shingles: str | Column) -> Column:
    """xxhash64 each shingle (JVM-side), dedup within the row.

    array_distinct makes the downstream MinHash a true SET signature.
    """
    s = F.col(shingles) if isinstance(shingles, str) else shingles
    return F.array_distinct(F.transform(s, lambda x: F.xxhash64(x)))


def token_hashes_expr(tokens: str | Column) -> Column:
    """xxhash64 per token WITH multiplicity (SimHash weights by count)."""
    t = F.col(tokens) if isinstance(tokens, str) else tokens
    return F.transform(t, lambda x: F.xxhash64(x))
