"""Scaling decision operators (SURVEY.md §2.9, D1-D5).

The reference's decision cascade is imperative Scala; here each stage is
a pure Column expression over decision-input rows, so Catalyst can fold
the whole cascade into one whole-stage-codegen projection. All clocks
are injected columns (no wall-clock reads — SURVEY.md §7).

Reference citations: /root/reference/src/main/scala/com/amazonaws/emr.
"""

from __future__ import annotations

from dataclasses import dataclass

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

from ..functions import distribute_alloc, step_expand, step_shrink

EXPAND, SHRINK, NONE = "EXPAND", "SHRINK", "NONE"  # scaling/ResizeType.scala:3-9


@dataclass(frozen=True)
class StepPolicy:
    """Step-scaling parameters (application.conf:22-25,33-36).

    IG (NODES): step +5/-3, bounds [0, 20];
    IF (UNITS): step +40/-24, bounds [8, 160].
    The IG/IF dispatch (D7, Workers.scala:63-79) is this config object —
    one plan, two parameterizations, no dual code paths.
    """

    step_expand: int = 5
    step_shrink: int = 3
    min_capacity: int = 0
    max_capacity: int = 20


IG_POLICY = StepPolicy(5, 3, 0, 20)
IF_POLICY = StepPolicy(40, 24, 8, 160)


def cpu_load_classify(
    is_cold: Column,
    hi_quorum: Column,
    mid_quorum: Column,
) -> Column:
    """D1 — CpuLoadEvaluator.evaluate (scaling/algo/CpuLoadEvaluator.scala:18-32).

    cold -> NONE; quorum(avg >= expandThreshold) -> EXPAND;
    quorum(shrinkThreshold < avg < expandThreshold) -> NONE; else SHRINK.
    Code constants (0.8/0.7/0.5) override the docs' 80%/40%
    (docs/scaling-logic.md:16-18) — the code wins.
    """
    return (
        F.when(is_cold, F.lit(NONE))
        .when(hi_quorum, F.lit(EXPAND))
        .when(mid_quorum, F.lit(NONE))
        .otherwise(F.lit(SHRINK))
    )


def plan_action(
    verdict: Column,
    running: Column,
    required: Column,
    policy: StepPolicy,
) -> tuple[Column, Column]:
    """D2 — ScalingAlgorithm.evaluate (scaling/algo/ScalingAlgorithm.scala:12-21).

    Returns (action, target_capacity). Preserves the NONE-branch quirk
    verbatim: when the classifier says NONE but ``0 < required < running``
    the reference still EXPANDs by a full step
    (ScalingAlgorithm.scala:18 — counter-intuitive but observed).
    """
    expand_target = step_expand(running, required, policy.step_expand, policy.max_capacity)
    shrink_target = step_shrink(running, policy.step_shrink, policy.min_capacity)
    quirk = (required > 0) & (required < running)
    action = (
        F.when(verdict == EXPAND, F.lit(EXPAND))
        .when(verdict == SHRINK, F.lit(SHRINK))
        .when(quirk, F.lit(EXPAND))
        .otherwise(F.lit(NONE))
    )
    target = (
        F.when(verdict == EXPAND, expand_target)
        .when(verdict == SHRINK, shrink_target)
        .when(quirk, expand_target)
        .otherwise(running)
    )
    return action, target


def guard_rails(
    action: Column,
    target: Column,
    running: Column,
    requested: Column,
    policy: StepPolicy,
) -> tuple[Column, Column]:
    """D4 — ScalingManager.evaluateAndPerform (scaling/ScalingManager.scala:67-101).

    EXPAND: no-op at max capacity; if running is *above* max (manual
    resize safety) issue a shrink-to-max; else resize to target.
    SHRINK: no-op at min capacity or when the same capacity was already
    requested; else resize to target. Returns (final_action, final_target)
    where final_action is RESIZE or NONE (whether an API call fires).
    """
    max_c, min_c = F.lit(policy.max_capacity), F.lit(policy.min_capacity)
    final_action = (
        F.when(
            action == EXPAND,
            # reference has separate >max and <max branches that both
            # resize (Workers.scala guard rails); they collapse here
            F.when(running == max_c, F.lit(NONE)).otherwise(F.lit("RESIZE")),
        )
        .when(
            action == SHRINK,
            F.when(running == min_c, F.lit(NONE))
            .when(requested == target, F.lit(NONE))
            .otherwise(F.lit("RESIZE")),
        )
        .otherwise(F.lit(NONE))
    )
    final_target = (
        F.when(
            action == EXPAND,
            F.when(running == max_c, running)
            .when(running > max_c, max_c)
            .otherwise(target),
        )
        .when(
            action == SHRINK,
            F.when((running == min_c) | (requested == target), running).otherwise(target),
        )
        .otherwise(running)
    )
    return final_action, final_target


def is_idle(
    queued: Column,
    running_q: Column,
    five_min_counters: list[Column],
) -> Column:
    """W4 — ScalingManager.isIdle (scaling/ScalingManager.scala:110-115).

    Idle iff no queued/running queries AND all five 5-minute activity
    counters are ``< 1`` (Trino decayed counters never reach exactly 0,
    hence the ``< 1`` threshold — preserved).
    """
    cond = (queued == 0) & (running_q == 0)
    for c in five_min_counters:
        cond = cond & (c < 1)
    return cond


def allocate(groups: DataFrame, total: DataFrame, order_col: str = "created_ts") -> DataFrame:
    """D5 — concurrent-resize allocator (cluster/Workers.scala:215-238).

    Spreads ``total`` (one-row DataFrame, column ``total``) uniformly
    over ``groups`` in creation order: position i gets total/g + 1 when
    i < total % g (F6), paired back positionally (J4). Both sides are
    dimension-sized -> broadcast; the window over a constant partition is
    fine because groups <= 48 (Config.scala:93-94 service limit).
    """
    w = Window.orderBy(F.col(order_col))
    indexed = groups.withColumn("__idx", F.row_number().over(w) - 1)
    g = groups.agg(F.count("*").cast("bigint").alias("__g"))
    return (
        indexed.crossJoin(F.broadcast(total))
        .crossJoin(F.broadcast(g))
        .withColumn(
            "alloc",
            distribute_alloc(F.col("__idx"), F.col("total").cast("bigint"), F.col("__g")),
        )
        .drop("__g", "total")
        .withColumnRenamed("__idx", "group_idx")
    )
