"""Event-stream / time-series operators (SURVEY.md §2.5, W3-W6; §2.10 X5).

Batch forms built on event-time windows so the identical logical plan
runs under Structured Streaming (``F.window`` / watermark twins live in
``streaming/``). All are single-shuffle plans: one exchange on the
grouping key, partial aggregation map-side.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def tumbling_counts(
    df: DataFrame,
    duration: str,
    ts_col: str = "ts",
    type_col: str = "event_type",
    types: tuple[str, ...] = (),
) -> DataFrame:
    """W3 — tumbling windowed per-type counts.

    The reference consumes Trino's pre-decayed 1-min/5-min counters
    (models/ClusterQueriesMetrics.scala:3-15); our engine computes true
    windowed counts from the raw event stream. Conditional aggregation
    (one column per type) instead of pivot keeps the schema static for
    streaming. ``F.window`` is used (not date_trunc) so the same plan
    compiles under a streaming source.
    """
    aggs = [F.count("*").cast("bigint").alias("n_total")]
    for t in types:
        aggs.append(
            F.sum(F.when(F.col(type_col) == t, 1).otherwise(0))
            .cast("bigint")
            .alias(f"n_{t}")
        )
    return (
        df.groupBy(F.window(ts_col, duration).alias("win"))
        .agg(*aggs)
        .select(F.col("win.start").alias("win_start"), *[F.col(a) for a in
                ["n_total"] + [f"n_{t}" for t in types]])
    )


def idle_flag(counter_cols: list[Column]) -> Column:
    """W4 — idle iff every activity counter < 1 (ScalingManager.scala:110-115)."""
    cond = F.lit(True)
    for c in counter_cols:
        cond = cond & (c < 1)
    return cond


def cooldown_gate(
    df: DataFrame,
    gap: str,
    key_col: str = "user_id",
    ts_col: str = "ts",
    order_cols: tuple[str, ...] = ("ts", "event_id"),
) -> DataFrame:
    """W5 (batch form) — cooldown suppression via gaps-and-islands.

    The reference suppresses evaluation within 2 min of the last scaling
    op (ScalingManager.scala:21,38-45). Batch twin per SURVEY §2.11 Q17:
    keep a candidate action only when the previous candidate in the same
    key is more than ``gap`` older (lag-based). The streaming twin with
    the exact reset-on-observed-resize clock lives in streaming/stateful.
    """
    w = Window.partitionBy(key_col).orderBy(*[F.col(c) for c in order_cols])
    prev = F.lag(ts_col).over(w)
    return df.withColumn("__prev_ts", prev).filter(
        F.col("__prev_ts").isNull()
        | (F.col(ts_col) > F.col("__prev_ts") + F.expr(f"INTERVAL {gap}"))
    ).drop("__prev_ts")


def suspension_carry_forward(
    df: DataFrame,
    window: str,
    key_col: str = "user_id",
    ts_col: str = "ts",
    suspend_cond: Column | None = None,
    order_cols: tuple[str, ...] = ("ts", "event_id"),
) -> DataFrame:
    """W6/J6 — carry forward the last suspension timestamp per key and
    flag exclusion while within ``window`` of it.

    Mirrors Workers.scala:256-262: ``isExcluded`` is computed against the
    *previous* refresh's suspension time (``prevSuspendedTime``), not the
    current row's state — hence the window ends at 1 PRECEDING. A key
    never suspended (prev = null ≙ 0L) is not excluded.
    """
    if suspend_cond is None:
        suspend_cond = F.col("event_type") == "error"
    w = (
        Window.partitionBy(key_col)
        .orderBy(*[F.col(c) for c in order_cols])
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    last_susp = F.max(F.when(suspend_cond, F.col(ts_col))).over(w)
    return df.withColumn("last_suspended_ts", last_susp).withColumn(
        "is_excluded",
        F.col("last_suspended_ts").isNotNull()
        & (F.col(ts_col) <= F.col("last_suspended_ts") + F.expr(f"INTERVAL {window}")),
    )


def sessionize(
    df: DataFrame,
    gap: str,
    key_col: str = "user_id",
    ts_col: str = "ts",
    order_cols: tuple[str, ...] = ("ts", "event_id"),
) -> DataFrame:
    """X5 — gaps-and-islands sessionization (batch form).

    New session when the gap to the previous event exceeds ``gap``.
    Exactly one shuffle on the key; both window functions reuse the same
    sort. The streaming-native twin uses ``F.session_window`` (see
    streaming/pipeline.py) — kept separate because its boundary rule is
    strict-< where this one merges on <=, and the oracle contract is
    this lag-based form.
    """
    w = Window.partitionBy(key_col).orderBy(*[F.col(c) for c in order_cols])
    new_session = F.when(
        F.lag(ts_col).over(w).isNull()
        | (F.col(ts_col) > F.lag(ts_col).over(w) + F.expr(f"INTERVAL {gap}")),
        1,
    ).otherwise(0)
    run = Window.partitionBy(key_col).orderBy(*[F.col(c) for c in order_cols]).rowsBetween(
        Window.unboundedPreceding, 0
    )
    return df.withColumn("__new", new_session).withColumn(
        "session_idx", F.sum("__new").over(run).cast("bigint")
    ).drop("__new")


def sequence_funnel(
    events: DataFrame,
    stages: tuple[str, ...],
    user_col: str = "user_id",
    type_col: str = "event_type",
    ts_col: str = "ts",
) -> DataFrame:
    """X63 — ordered-sequence funnel: per user, the earliest time each
    stage completes AFTER the previous stage's completion (a 'view'
    before the signup does not count), rolled up to per-stage user
    counts and conversion vs stage 1. The product-analytics twin of the
    q67 curation funnel — ORDER matters here, which plain per-type mins
    get wrong.

    Scale: one narrow (user, type, ts) projection, then one user-keyed
    min-agg + join per stage — len(stages) passes over user-keyed
    frames (each strictly shrinking), no windows, no per-user sort. At
    100 TB each pass is a hash agg + equi join on the user key; AQE
    broadcasts the shrinking stage frames automatically.
    """
    ev = events.select(
        F.col(user_col).alias("u"), F.col(type_col).alias("t"), F.col(ts_col).alias("ts")
    )
    reached = None  # (u, stage_ts) of users who completed the prefix
    counts = []
    for i, stage in enumerate(stages):
        e = ev.filter(F.col("t") == stage)
        if reached is None:
            reached = e.groupBy("u").agg(F.min("ts").alias("__sts"))
        else:
            reached = (
                e.join(reached, "u")
                .filter(F.col("ts") >= F.col("__sts"))
                .groupBy("u")
                .agg(F.min("ts").alias("__sts"))
            )
        counts.append(
            reached.agg(F.count("*").cast("bigint").alias("n_users")).select(
                F.lit(i + 1).alias("stage_idx"),
                F.lit(stage).alias("stage"),
                "n_users",
            )
        )
    out = counts[0]
    for c in counts[1:]:
        out = out.unionAll(c)
    base = counts[0].select(F.col("n_users").alias("__base"))
    return (
        out.join(base)
        .select(
            "stage_idx",
            "stage",
            "n_users",
            (F.col("n_users").cast("double") / F.col("__base")).alias("conversion"),
        )
    )


def cohort_retention(
    events: DataFrame,
    user_col: str = "user_id",
    ts_col: str = "ts",
    max_offset: int = 4,
) -> DataFrame:
    """X64 — weekly cohort retention: users grouped by first-seen week,
    each later week's activity expressed as a fraction of the cohort.
    The standard growth/engagement matrix; for a data pipeline it doubles
    as an ingest-source liveness report (which crawl cohorts still emit).

    Scale: two hash aggs (first-seen per user — user-keyed; the
    (cohort, offset) distinct-user count) + a user-keyed join; week
    arithmetic is row-local date_trunc math identical in both engines
    (ISO Monday truncation). The offset is CALENDAR arithmetic
    (``datediff/7``), not epoch-seconds division: both columns are
    week-truncated Mondays so datediff is an exact multiple of 7 in any
    timezone, whereas an epoch difference across a DST transition is
    604800±3600 s and a truncating cast mis-buckets the week (ADVICE
    r6). The declared-query oracle replays epoch division, which only
    agrees because load_table pins spark.sql.session.timeZone=UTC —
    this operator no longer depends on that.
    """
    ev = events.select(
        F.col(user_col).alias("u"), F.date_trunc("week", F.col(ts_col)).alias("w")
    )
    first = ev.groupBy("u").agg(F.min("w").alias("cohort_w"))
    act = (
        ev.join(first, "u")
        .withColumn(
            "week_offset",
            (F.datediff(F.col("w"), F.col("cohort_w")) / 7).cast("int"),
        )
        .filter(F.col("week_offset") <= max_offset)
        .groupBy("cohort_w", "week_offset")
        .agg(F.countDistinct("u").cast("bigint").alias("n_active"))
    )
    size = first.groupBy("cohort_w").agg(
        F.count("*").cast("bigint").alias("cohort_size")
    )
    return act.join(size, "cohort_w").select(
        "cohort_w",
        "week_offset",
        "n_active",
        "cohort_size",
        (F.col("n_active").cast("double") / F.col("cohort_size")).alias("retention"),
    )
