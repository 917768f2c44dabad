"""DedupeReport — the audit report returned by every pipeline run.

Mirrors the reference's report fields exactly
(reference: Deduper.kt:42-60): recordCount, hashColumns, columnsFound,
dupeCount, distinctDupeCount, hashCount, dupes, success.
"""

from __future__ import annotations

import json
from dataclasses import dataclass, field, asdict


@dataclass
class DedupeReport:
    record_count: int = 0
    hash_columns: list[str] = field(default_factory=list)
    columns_found: list[str] = field(default_factory=list)
    dupe_count: int = 0            # total non-surviving rows
    distinct_dupe_count: int = 0   # number of dupe groups
    hash_count: int = 0            # distinct hashes seen incl. preloaded (Deduper.kt:272)
    dupes: dict[str, dict] = field(default_factory=dict)  # hash -> group detail
    success: bool = True

    def to_json(self) -> str:
        return json.dumps(asdict(self), default=str)

    @property
    def surviving_count(self) -> int:
        # reconciliation identity the reference checks per sink
        # (consumers/DeduperDataConsumer.kt:55-57)
        return self.record_count - self.dupe_count
