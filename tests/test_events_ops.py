"""Unit tests for event-stream operators (W3-W6, X5) on tiny injected
timelines — scenario-style coverage the reference lacks (SURVEY.md §5.2)."""

from __future__ import annotations

import datetime as dt

from pyspark.sql import functions as F

from emr_trino_autoscale_spark.operators import events as ev

T0 = dt.datetime(2024, 1, 1, 0, 0, 0)


def make_events(spark, rows):
    """rows: (event_id, user, minutes_offset, event_type, value)"""
    data = [
        (eid, u, T0 + dt.timedelta(minutes=m), t, float(v))
        for eid, u, m, t, v in rows
    ]
    return spark.createDataFrame(
        data, "event_id long, user_id long, ts timestamp, event_type string, value double"
    )


def test_cooldown_gate_suppresses_within_gap(spark):
    df = make_events(
        spark,
        [
            (1, 1, 0, "breach", 1),
            (2, 1, 1, "breach", 1),    # 1 min later -> suppressed
            (3, 1, 3, "breach", 1),    # 3 min after #1... but 2 after #2 -> suppressed (lag vs previous candidate)
            (4, 1, 10, "breach", 1),   # 7 min after #3 -> emitted
            (5, 2, 0, "breach", 1),    # other key unaffected
        ],
    )
    got = sorted(r["event_id"] for r in ev.cooldown_gate(df, "2 MINUTES").collect())
    assert got == [1, 4, 5]


def test_suspension_carry_forward_uses_previous_row(spark):
    df = make_events(
        spark,
        [
            (1, 1, 0, "error", 1),     # suspension event; no PREVIOUS -> not excluded
            (2, 1, 5, "ok", 1),        # within 10 min of #1 -> excluded
            (3, 1, 30, "ok", 1),       # beyond window -> not excluded
            (4, 2, 0, "ok", 1),        # never suspended -> not excluded
        ],
    )
    out = {r["event_id"]: r["is_excluded"] for r in ev.suspension_carry_forward(df, "10 MINUTES").collect()}
    assert out == {1: False, 2: True, 3: False, 4: False}


def test_sessionize_islands(spark):
    df = make_events(
        spark,
        [
            (1, 1, 0, "a", 1),
            (2, 1, 4, "a", 1),     # same session (gap 4 < 5)
            (3, 1, 20, "a", 1),    # new session
            (4, 2, 0, "a", 1),     # separate key
        ],
    )
    out = ev.sessionize(df, "5 MINUTES")
    got = {(r["user_id"], r["event_id"]): r["session_idx"] for r in out.collect()}
    assert got == {(1, 1): 1, (1, 2): 1, (1, 3): 2, (2, 4): 1}


def test_tumbling_counts_and_idle(spark):
    df = make_events(
        spark,
        [
            (1, 1, 0, "purchase", 1),
            (2, 1, 30, "view", 1),
            (3, 1, 70, "view", 1),   # second window: only views -> idle
        ],
    )
    counts = ev.tumbling_counts(df, "1 hour", types=("purchase", "view"))
    out = counts.withColumn(
        "is_idle", ev.idle_flag([F.col("n_purchase")])
    ).orderBy("win_start").collect()
    assert [r["n_total"] for r in out] == [2, 1]
    assert [r["is_idle"] for r in out] == [False, True]
