"""Incremental (seen-hash) dedup mode.

Reference semantics (Deduper.kt:135-158 preload; golden
DeduperTest.kt:393-413): hashes preloaded from a ledger count as
already-seen, so EVERY source row matching a preloaded hash is a
duplicate — including its first occurrence this run.

Spark design: the in-memory preload becomes a join against the
persisted ledger — left_anti for genuinely-new rows, left_semi for
rows dropped as already-seen. The ledger side is broadcast when small;
at 100 TB it is a shuffled hash join on `hash` (both sides hash
partitioned on the same key — a single co-located shuffle).
"""

from __future__ import annotations

from dataclasses import dataclass

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from deduper_spark.operators.exact import ExactDedupResult, exact_dedup


@dataclass
class IncrementalResult:
    new_rows: DataFrame        # rows whose hash is NOT in the ledger
    already_seen: DataFrame    # rows dropped because ledger contains hash
    inner: ExactDedupResult    # exact dedup applied to the new rows only
    updated_ledger: DataFrame  # old ledger ∪ new hashes


def incremental_dedup(
    df: DataFrame,
    ledger: DataFrame,
    hash_keys: tuple[str, ...] = (),
    order_col: str | None = None,
    include_json: bool = True,
) -> IncrementalResult:
    inner_all = exact_dedup(df, hash_keys, order_col=order_col,
                            include_json=include_json)
    keyed = inner_all.keyed
    ledger_hashes = ledger.select("hash")

    new_rows = keyed.join(ledger_hashes, "hash", "left_anti")
    already_seen = keyed.join(ledger_hashes, "hash", "left_semi")

    inner = exact_dedup(
        new_rows.drop("hash"), hash_keys, order_col=order_col,
        include_json=include_json,
    )
    updated_ledger = ledger.select("hash").unionByName(
        inner.hash_ledger.select("hash")
    ).distinct()
    return IncrementalResult(
        new_rows=new_rows,
        already_seen=already_seen,
        inner=inner,
        updated_ledger=updated_ledger,
    )
