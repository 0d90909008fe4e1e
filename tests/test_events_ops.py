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


def test_sequence_funnel_enforces_stage_order(spark):
    from datetime import datetime

    from emr_trino_autoscale_spark.operators import events as ev_ops

    def t(m):
        return datetime(2026, 1, 1, 0, m)

    rows = [
        # user 1: full ordered journey
        (1, "signup", t(0)), (1, "view", t(1)), (1, "click", t(2)), (1, "purchase", t(3)),
        # user 2: view BEFORE signup (must not count), then stops at view
        (2, "view", t(0)), (2, "signup", t(1)), (2, "view", t(2)),
        # user 3: purchase before click -> purchase stage not reached
        (3, "signup", t(0)), (3, "view", t(1)), (3, "purchase", t(2)), (3, "click", t(3)),
        # user 4: never signs up
        (4, "view", t(0)), (4, "click", t(1)),
    ]
    d = spark.createDataFrame(rows, "user_id long, event_type string, ts timestamp")
    f = {r["stage"]: r for r in ev_ops.sequence_funnel(
        d, ("signup", "view", "click", "purchase")).collect()}
    assert f["signup"]["n_users"] == 3        # users 1, 2, 3
    assert f["view"]["n_users"] == 3          # u2's post-signup view counts
    assert f["click"]["n_users"] == 2         # users 1, 3
    assert f["purchase"]["n_users"] == 1      # only user 1 in order
    assert abs(f["purchase"]["conversion"] - 1 / 3) < 1e-12


def test_cohort_retention_offsets_and_rates(spark):
    from datetime import datetime

    from emr_trino_autoscale_spark.operators import events as ev_ops

    # week of 2026-01-05 (Mon). u1 active weeks 0 and 1; u2 week 0 only.
    rows = [
        (1, datetime(2026, 1, 6)), (1, datetime(2026, 1, 13)),
        (2, datetime(2026, 1, 7)),
    ]
    d = spark.createDataFrame(rows, "user_id long, ts timestamp")
    out = {(str(r["cohort_w"]), r["week_offset"]): r
           for r in ev_ops.cohort_retention(d).collect()}
    assert len(out) == 2
    (k0,), (k1,) = [[k for k in out if k[1] == i] for i in (0, 1)]
    assert out[k0]["n_active"] == 2 and out[k0]["cohort_size"] == 2
    assert out[k0]["retention"] == 1.0
    assert out[k1]["n_active"] == 1 and abs(out[k1]["retention"] - 0.5) < 1e-12


def test_cohort_retention_dst_transition_weeks(spark):
    """ADVICE r6: week_offset is calendar datediff/7, not epoch/604800 —
    weeks that cross a DST transition are 604800±3600 s and the old
    truncating epoch division mis-bucketed them under a non-UTC session
    timezone. Pin the fix by running under America/New_York across the
    2026-03-08 spring-forward."""
    from datetime import datetime

    from emr_trino_autoscale_spark.operators import events as ev_ops

    prev = spark.conf.get("spark.sql.session.timeZone")
    spark.conf.set("spark.sql.session.timeZone", "America/New_York")
    try:
        # Mon 2026-03-02 cohort week; the next week (Mon 03-09) follows
        # the 03-08 spring-forward, so it is 604800-3600 s later — the
        # epoch form truncates (603600/604800)=0 and mis-buckets it.
        rows = [
            (1, datetime(2026, 3, 3)), (1, datetime(2026, 3, 11)),
            (2, datetime(2026, 3, 4)),
        ]
        d = spark.createDataFrame(rows, "user_id long, ts timestamp")
        out = {r["week_offset"]: r for r in ev_ops.cohort_retention(d).collect()}
        assert set(out) == {0, 1}
        assert out[1]["n_active"] == 1 and abs(out[1]["retention"] - 0.5) < 1e-12
    finally:
        spark.conf.set("spark.sql.session.timeZone", prev)


def test_binned_interval_join_matches_nonequi(spark):
    """X89: the bin-decomposed equi join equals the plain non-equi
    join exactly, including events on interval boundaries (start
    inclusive, end exclusive), intervals shorter than / spanning
    multiple bins, and non-matching equi keys."""
    from datetime import datetime

    from emr_trino_autoscale_spark.operators import events as ev

    facts = spark.createDataFrame(
        [
            (1, "a", datetime(2024, 1, 2, 0, 0, 0)),    # == start: in
            (2, "a", datetime(2024, 1, 4, 0, 0, 0)),    # == end: out
            (3, "a", datetime(2024, 1, 3, 12, 30, 0)),  # inside
            (4, "b", datetime(2024, 1, 3, 0, 0, 0)),    # wrong key
            (5, "a", datetime(2024, 1, 10, 5, 0, 0)),   # inside short iv
            (6, "a", datetime(2024, 1, 20, 0, 0, 1)),   # no interval
        ],
        "event_id long, event_type string, ts timestamp",
    )
    ivs = spark.createDataFrame(
        [
            (0, "a", datetime(2024, 1, 2), datetime(2024, 1, 4)),     # 2 bins
            (1, "a", datetime(2024, 1, 10, 4), datetime(2024, 1, 10, 6)),  # sub-bin
            (2, "b", datetime(2024, 1, 1), datetime(2024, 1, 8)),     # 7 bins
        ],
        "interval_id long, event_type string, w_start timestamp, w_end timestamp",
    )
    got = {
        (r["event_id"], r["interval_id"])
        for r in ev.binned_interval_join(
            facts, ivs, equi_cols=("event_type",)
        ).collect()
    }
    want = {
        (r["event_id"], r["interval_id"])
        for r in facts.alias("f")
        .join(
            ivs.alias("i"),
            (F.col("f.event_type") == F.col("i.event_type"))
            & (F.col("f.ts") >= F.col("i.w_start"))
            & (F.col("f.ts") < F.col("i.w_end")),
        )
        .collect()
    }
    assert got == want == {(1, 0), (3, 0), (4, 2), (5, 1)}


def test_binned_interval_join_windowed_facts(spark):
    """X89 fact_end variant: range x range overlap through the bin
    join equals the plain non-equi overlap join — pairs agreeing in
    several bins collapse to one row (the dropDuplicates contract),
    and the half-open convention holds on both boundaries."""
    from datetime import datetime

    from emr_trino_autoscale_spark.operators import events as ev

    facts = spark.createDataFrame(
        [
            (1, datetime(2024, 1, 1), datetime(2024, 1, 10)),  # spans 3 ivs
            (2, datetime(2024, 1, 5), datetime(2024, 1, 6)),   # inside iv1
            (3, datetime(2024, 1, 8), datetime(2024, 1, 8, 0, 0, 1)),
            (4, datetime(2024, 2, 1), datetime(2024, 2, 2)),   # no overlap
        ],
        "fact_id long, f_s timestamp, f_e timestamp",
    )
    ivs = spark.createDataFrame(
        [
            (0, datetime(2023, 12, 30), datetime(2024, 1, 2)),
            (1, datetime(2024, 1, 4), datetime(2024, 1, 7)),
            (2, datetime(2024, 1, 8), datetime(2024, 1, 9)),
            (3, datetime(2024, 1, 10), datetime(2024, 1, 12)),  # f1 ends AT start: out
        ],
        "interval_id long, w_start timestamp, w_end timestamp",
    )
    out = ev.binned_interval_join(
        facts, ivs, fact_ts="f_s", fact_end="f_e", bin_seconds=86400
    ).collect()
    got = sorted((r["fact_id"], r["interval_id"]) for r in out)
    want_df = facts.alias("f").join(
        ivs.alias("i"),
        (F.col("f.f_s") < F.col("i.w_end")) & (F.col("f.f_e") > F.col("i.w_start")),
    )
    want = sorted((r["fact_id"], r["interval_id"]) for r in want_df.collect())
    assert got == want == [(1, 0), (1, 1), (1, 2), (2, 1), (3, 2)]
    assert len(got) == len(set(got))  # dedup held
