"""Shared error-narrowing helpers.

The pipeline's seen-hash preload and the streaming-fuzzy ledger /
compaction reads all treat "state genuinely absent" as a first run
while re-raising anything else (corrupt parquet, permissions): silently
treating a read failure as first-run would disable incremental dedup
and re-emit previously-seen rows (reference contract:
Deduper.kt:135-158). The condition probe lives here once so a newly
accepted condition cannot drift between call sites.
"""

from __future__ import annotations


def absent_state(exc: Exception, conditions: tuple[str, ...]) -> bool:
    """True iff ``exc``'s Spark error condition matches one of
    ``conditions`` (substring test, e.g. "PATH_NOT_FOUND").

    Uses ``getCondition`` (Spark 4) with ``getErrorClass`` as the
    deprecated fallback; an exception without either never matches —
    unknown failures must propagate, not masquerade as first runs.
    """
    probe = getattr(exc, "getCondition",
                    getattr(exc, "getErrorClass", lambda: ""))
    cond = str(probe() or "")
    return any(c in cond for c in conditions)


# a parquet/table path that has never been written
MISSING_PATH = ("PATH_NOT_FOUND", "TABLE_OR_VIEW_NOT_FOUND")
# ... or was created but holds no data files (a crashed / zero-row
# first write leaves a directory with only _SUCCESS, which parquet
# reads reject with UNABLE_TO_INFER_SCHEMA)
MISSING_OR_EMPTY_PATH = MISSING_PATH + ("UNABLE_TO_INFER_SCHEMA",)
