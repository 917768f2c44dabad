"""Dedup-key column expressions.

Byte-parity with the reference's key definition (Deduper.kt:195-201):
stringify the selected columns in USER key order, join with ", ",
MD5, uppercase hex. Golden: "3526 HIGH ST, SACRAMENTO, CA, 95838, 59222"
→ B23CF69F6FC378E0A9C1AF14F2D2083C (DeduperTest.kt:427-428).

Engine-internal 64-bit keys use xxhash64 — the intent behind the
reference's vestigial Hasher.hashString (hashing/Hasher.kt:10-13).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

KEY_SEPARATOR = ", "


def stringify_expr(hash_keys: list[str] | tuple[str, ...]) -> Column:
    """concat_ws(', ', cols...) over string-cast key columns.

    NOTE concat_ws skips NULLs (so a NULL key col collapses like the
    reference's stringification of absent values) — nulls are tolerated
    in sources (reference null test: DeduperTest.kt:353-392).
    """
    return F.concat_ws(KEY_SEPARATOR, *[F.col(c).cast("string") for c in hash_keys])


def md5_key_expr(hash_keys: list[str] | tuple[str, ...]) -> Column:
    return F.upper(F.md5(stringify_expr(hash_keys)))


def xxhash_key_expr(hash_keys: list[str] | tuple[str, ...]) -> Column:
    return F.xxhash64(*[F.col(c).cast("string") for c in hash_keys])


def resolve_hash_keys(df: DataFrame, hash_keys: tuple[str, ...]) -> list[str]:
    """Empty hash_keys ⇒ all columns (Deduper.kt:181-186); validate
    user keys ⊆ df.columns (Deduper.kt:177-179)."""
    if not hash_keys:
        return list(df.columns)
    missing = [c for c in hash_keys if c not in df.columns]
    if missing:
        raise ValueError(
            f"hash columns {missing} not found in source columns {df.columns}"
        )
    return list(hash_keys)
