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
