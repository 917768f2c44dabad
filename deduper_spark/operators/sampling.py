"""Deterministic, engine-independent corpus sampling and splits.

A training-data pipeline needs reproducible row selection: train/val/
test splits that never move a document between splits across reruns,
clusters, or engines, and down-sampling that is a pure function of the
row id. Random() is wrong for this (nondeterministic across retries
and partitionings); the standard practice is hash-bucket assignment.

The bucket here is the first 4 hex chars of md5(seed || ':' || id) —
65,536 uniform buckets — COMPARED AS STRINGS against fixed-width hex
thresholds. Both Spark and any ANSI engine produce identical lowercase
md5 hex, and fixed-width lowercase-hex string order == numeric order,
so the assignment is bit-reproducible everywhere with no integer-
parsing functions needed (DuckDB has no conv(); this formulation is
the common subset — the oracle recomputes it verbatim).

Weights quantize to 1/65536 resolution (documented; a weight of 0.8
means floor(0.8 * 65536) buckets — at most 15 ppm off the request).

Generalizes the reference's deterministic-key contract (the md5 row
key, Deduper.kt:201) from identity to selection: same id + same seed
=> same split, forever.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

_BUCKETS = 1 << 16  # 4 hex chars


def _bucket_expr(id_col: str, seed: str) -> Column:
    return F.substring(
        F.md5(F.concat(F.lit(seed), F.lit(":"),
                       F.col(id_col).cast("string"))), 1, 4)


def split_thresholds(weights: dict[str, float]) -> list[tuple[str, str]]:
    """[(label, upper_hex)] cumulative upper bounds (exclusive), in
    the given label order; the LAST label absorbs the quantization
    remainder so every bucket maps to exactly one label.

    A cumulative bound that reaches 1.0 early (e.g. a trailing
    zero-weight label) saturates to the catch-all sentinel 'g' — every
    4-hex-char bucket sorts below it — rather than the 5-char string
    '10000', which no bucket in ['cccc','ffff'] sorts below (that bug
    silently routed such a label's share to the catch-all)."""
    if any(w < 0 for w in weights.values()):
        raise ValueError(f"split weights must be non-negative: {weights}")
    total = sum(weights.values())
    if total <= 0:
        raise ValueError("split weights must sum to a positive value")
    out, cum = [], 0.0
    labels = list(weights)
    for lbl in labels[:-1]:
        cum += weights[lbl] / total
        b = int(cum * _BUCKETS)
        out.append((lbl, "g" if b >= _BUCKETS else format(b, "04x")))
    out.append((labels[-1], "g"))  # > 'ffff' in string order: catch-all
    return out


def deterministic_split(
    df: DataFrame,
    id_col: str = "doc_id",
    weights: dict[str, float] | None = None,
    seed: str = "split-v1",
    out_col: str = "split",
) -> DataFrame:
    """Assign every row a reproducible split label.

    Pure projection — no shuffle, no state, no RNG: the label is a
    function of (seed, id) alone, so reruns, retries, engine swaps,
    and incremental arrivals all agree. Changing ``seed`` re-deals the
    assignment wholesale (version your splits by seed).
    """
    weights = weights or {"train": 0.8, "val": 0.1, "test": 0.1}
    b = _bucket_expr(id_col, seed)
    th = split_thresholds(weights)
    # forward when-chain: first matching threshold wins (CASE semantics,
    # same shape the oracle SQL spells out)
    expr = None
    for lbl, hi in th[:-1]:
        cond = b < F.lit(hi)
        expr = (F.when(cond, F.lit(lbl)) if expr is None
                else expr.when(cond, F.lit(lbl)))
    expr = F.lit(th[-1][0]) if expr is None else expr.otherwise(F.lit(th[-1][0]))
    return df.withColumn(out_col, expr)


def sample_corpus(
    df: DataFrame,
    id_col: str = "doc_id",
    rate: float = 0.1,
    seed: str = "sample-v1",
) -> DataFrame:
    """Deterministic Bernoulli-style down-sampling: keep a row iff its
    hash bucket falls below floor(rate * 65536). Same reproducibility
    contract as deterministic_split; rate quantizes to 1/65536."""
    if not 0.0 <= rate <= 1.0:
        raise ValueError(f"rate must be in [0, 1], got {rate}")
    if rate >= 1.0:
        return df
    hi = format(int(rate * _BUCKETS), "04x")
    return df.where(_bucket_expr(id_col, seed) < F.lit(hi))
