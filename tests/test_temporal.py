"""Temporal / event-stream operators (operators/temporal.py):
time_rollup, sessionize, session_stats, debounce — hand-computed
goldens on a small crafted event log, plus tie/boundary cases."""

from __future__ import annotations

import datetime as dt

from pyspark.sql import functions as F

from deduper_spark.operators.temporal import (
    debounce,
    session_stats,
    sessionize,
    time_rollup,
)

T0 = dt.datetime(2024, 1, 1, 0, 0, 0)


def _ev(spark, rows):
    """rows: (event_id, offset_seconds, user_id, event_type, value)"""
    data = [
        (eid, T0 + dt.timedelta(seconds=off), uid, et, val)
        for (eid, off, uid, et, val) in rows
    ]
    return spark.createDataFrame(
        data, "event_id long, ts timestamp, user_id long, "
              "event_type string, value double")


def test_time_rollup_hourly(spark):
    df = _ev(spark, [
        (0, 10, 1, "click", 1.0),
        (1, 3599, 1, "click", 2.0),   # same hour bucket
        (2, 3600, 1, "click", 4.0),   # next hour exactly on boundary
        (3, 100, 2, "view", 8.0),
    ])
    out = {
        (r["bucket_ts"], r["event_type"]): r["n_events"]
        for r in time_rollup(df).collect()
    }
    h0, h1 = T0, T0 + dt.timedelta(hours=1)
    assert out == {(h0, "click"): 2, (h1, "click"): 1, (h0, "view"): 1}


def test_session_stats(spark):
    # gap strictly > 30 min starts a new session; exactly 30 min does not
    df = _ev(spark, [
        # user 1: events at 0s, 1800s (exactly 30 min -> same session),
        # 3601+1800s (> 30 min after prev -> new session)
        (0, 0, 1, "a", 0.0),
        (1, 1800, 1, "a", 0.0),
        (2, 1800 + 1801, 1, "a", 0.0),
        # user 2: single event
        (3, 42, 2, "a", 0.0),
    ])
    out = {
        (r["user_id"], r["session_idx"]): (r["n_events"], r["start_s"],
                                           r["end_s"], r["duration_s"])
        for r in session_stats(df, gap_minutes=30.0).collect()
    }
    e0 = int(T0.timestamp())
    assert out == {
        (1, 1): (2, e0, e0 + 1800, 1800),
        (1, 2): (1, e0 + 3601, e0 + 3601, 0),
        (2, 1): (1, e0 + 42, e0 + 42, 0),
    }


def test_sessionize_tie_ordered_by_id(spark):
    # two events at the identical timestamp: ordering falls back to
    # event_id, and the session segmentation is permutation-invariant
    # within the tie (gap 0 never opens a session)
    df = _ev(spark, [
        (5, 100, 1, "a", 0.0),
        (3, 100, 1, "a", 0.0),
        (9, 100 + 7200, 1, "a", 0.0),
    ])
    s = sessionize(df, gap_minutes=30.0)
    idx = {r["event_id"]: r["session_idx"] for r in s.collect()}
    assert idx == {3: 1, 5: 1, 9: 2}
    ids = {r["event_id"]: r["session_id"] for r in s.collect()}
    assert ids[9] == "1:2"


def test_debounce_lag_semantics(spark):
    # min_gap 10 s, per (user, event_type); gap == 10 s is KEPT (>=).
    # Lag semantics: each row judged vs its immediate predecessor,
    # kept or not — so 0s,5s,12s keeps 0s and 12s (12-5 >= 10 is
    # false... 12-5=7 < 10 -> dropped): kept = {0s} ∪ {t: t-prev>=10}.
    df = _ev(spark, [
        (0, 0, 1, "a", 0.0),
        (1, 5, 1, "a", 0.0),    # 5s after prev -> dropped
        (2, 12, 1, "a", 0.0),   # 7s after prev(=5s row) -> dropped
        (3, 22, 1, "a", 0.0),   # exactly 10s after prev -> kept
        (4, 3, 1, "b", 0.0),    # different key -> kept
        (5, 4, 2, "a", 0.0),    # different user -> kept
    ])
    kept = sorted(r["event_id"] for r in debounce(
        df, keys=("user_id", "event_type"), min_gap_seconds=10.0).collect())
    assert kept == [0, 3, 4, 5]


def test_rollup_custom_aggs_and_day_bucket(spark):
    df = _ev(spark, [
        (0, 10, 1, "a", 1.5),
        (1, 86399, 1, "a", 2.25),
        (2, 86400, 1, "a", 4.0),
    ])
    out = time_rollup(
        df, bucket="day", keys=("event_type",),
        aggs=[F.count("*").cast("long").alias("n_events"),
              F.round(F.sum("value") * 100).cast("long").alias("cents")],
    ).orderBy("bucket_ts").collect()
    assert [(r["n_events"], r["cents"]) for r in out] == [(2, 375), (1, 400)]
