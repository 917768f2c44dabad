"""Temporal / event-stream operators — the time-series family a
training-data pipeline needs next to dedup (event logs, crawl
snapshots, interaction data).

All three are pure Catalyst (no UDFs) and SQL-oracle-able:

  * time_rollup      — bucketed aggregation (the hypertable-rollup
                       pattern): one hash-partitioned groupBy with
                       map-side partial aggregation; bucket count is
                       bounded by the time range, so the shuffle
                       carries ~|buckets| x |keys| rows at any corpus
                       size.
  * sessionize       — gap-based sessionization: per-entity window
                       (lag + running sum of new-session flags). The
                       window partitions by the entity key, so the
                       shuffle is hash-partitioned on user — no global
                       sort. Skew caveat: a single entity's events
                       land in one partition (sessions are inherently
                       sequential per entity); a bot user with 10^8
                       events needs upstream per-entity capping, not
                       salting (salting would split its sessions).
  * debounce         — near-time dedup: drop an event if the previous
                       event with the same key is closer than
                       ``min_gap`` seconds (lag-based, same window
                       shape as sessionize).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def _epoch_us(name: str) -> Column:
    """Exact integer epoch microseconds for TIMESTAMP or TIMESTAMP_NTZ
    columns (``unix_micros`` rejects NTZ, so NTZ goes through a cast —
    interpreted in the Spark session time zone; set it to UTC for
    engine-portable absolute epochs)."""
    return F.unix_micros(F.col(name).cast("timestamp"))


def time_rollup(
    df: DataFrame,
    ts_col: str = "ts",
    bucket: str = "hour",
    keys: tuple[str, ...] = ("event_type",),
    aggs: list[Column] | None = None,
) -> DataFrame:
    """(bucket_ts, *keys, n_events, ...aggs) — date_trunc rollup."""
    aggs = aggs if aggs is not None else [
        F.count("*").cast("long").alias("n_events"),
    ]
    return (
        df.groupBy(
            F.date_trunc(bucket, F.col(ts_col)).alias("bucket_ts"),
            *[F.col(k) for k in keys],
        )
        .agg(*aggs)
    )


def sessionize(
    df: DataFrame,
    entity_col: str = "user_id",
    ts_col: str = "ts",
    gap_minutes: float = 30.0,
    id_col: str = "event_id",
) -> DataFrame:
    """Input rows + (session_idx, session_id): a new session starts
    when the gap to the entity's previous event exceeds
    ``gap_minutes``. session_idx is 1-based per entity; session_id =
    '<entity>:<idx>'. Ties on ts are ordered by ``id_col`` for
    determinism.

    Gap math is exact integer microseconds (``unix_micros`` — a pure
    epoch conversion, independent of the session time zone), so the
    boundary predicate is reproducible bit-for-bit across engines."""
    w = Window.partitionBy(entity_col).orderBy(ts_col, id_col)
    gap_us = int(round(gap_minutes * 60 * 1_000_000))
    ts_us = _epoch_us(ts_col)
    prev_us = F.lag(ts_us).over(w)
    new_sess = (
        prev_us.isNull() | ((ts_us - prev_us) > F.lit(gap_us))
    ).cast("long")
    return (
        df.withColumn("__new", new_sess)
        .withColumn(
            "session_idx",
            F.sum("__new").over(
                w.rowsBetween(Window.unboundedPreceding, 0)
            ),
        )
        .drop("__new")
        .withColumn(
            "session_id",
            F.concat_ws(":", F.col(entity_col).cast("string"),
                        F.col("session_idx").cast("string")),
        )
    )


def session_stats(
    df: DataFrame,
    entity_col: str = "user_id",
    ts_col: str = "ts",
    gap_minutes: float = 30.0,
    id_col: str = "event_id",
) -> DataFrame:
    """One row per session: entity, session_idx, n_events, start/end
    epoch seconds and duration."""
    s = sessionize(df, entity_col, ts_col, gap_minutes, id_col)
    ts_s = F.floor(_epoch_us(ts_col) / F.lit(1_000_000))
    return (
        s.groupBy(entity_col, "session_idx")
        .agg(
            F.count("*").cast("long").alias("n_events"),
            F.min(ts_s).cast("long").alias("start_s"),
            F.max(ts_s).cast("long").alias("end_s"),
        )
        .withColumn("duration_s", F.col("end_s") - F.col("start_s"))
    )


def debounce(
    df: DataFrame,
    keys: tuple[str, ...] = ("user_id", "event_type"),
    ts_col: str = "ts",
    min_gap_seconds: float = 10.0,
    id_col: str = "event_id",
) -> DataFrame:
    """Keep an event iff the PREVIOUS event with the same key is at
    least ``min_gap_seconds`` older (or absent) — near-time duplicate
    suppression relative to the prior event (lag semantics: each kept
    row is judged against its immediate predecessor, which makes the
    predicate a pure window expression — no iterative state)."""
    w = Window.partitionBy(*keys).orderBy(ts_col, id_col)
    gap_us = int(round(min_gap_seconds * 1_000_000))
    ts_us = _epoch_us(ts_col)
    prev_us = F.lag(ts_us).over(w)
    keep = prev_us.isNull() | ((ts_us - prev_us) >= F.lit(gap_us))
    return df.withColumn("__keep", keep).where(F.col("__keep")).drop("__keep")
