"""Unit tests for the decision operators (SURVEY.md §2.9 D1-D5)
against hand-computed expectations from the reference code paths."""

from __future__ import annotations

from pyspark.sql import functions as F

from emr_trino_autoscale_spark.functions import sign_dispatch, step_expand, step_shrink
from emr_trino_autoscale_spark.operators.scaling import (
    IG_POLICY,
    allocate,
    cpu_load_classify,
    guard_rails,
    is_idle,
    plan_action,
)


def one(spark, expr_map, rows="SELECT 1"):
    df = spark.range(1)
    return df.select(*[v.alias(k) for k, v in expr_map.items()]).collect()[0]


# D1 — CpuLoadEvaluator.evaluate (CpuLoadEvaluator.scala:18-32).
def test_classifier_truth_table(spark):
    cases = [
        (True, False, False, "NONE"),   # cold
        (True, True, False, "NONE"),    # cold wins over quorum
        (False, True, False, "EXPAND"),
        (False, False, True, "NONE"),
        (False, False, False, "SHRINK"),
    ]
    for cold, hi, mid, want in cases:
        got = one(
            spark,
            {"v": cpu_load_classify(F.lit(cold), F.lit(hi), F.lit(mid))},
        )["v"]
        assert got == want, (cold, hi, mid)


# F4 — StepScalingAlgorithm clamps (StepScalingAlgorithm.scala:21-26).
def test_step_clamps(spark):
    r = one(
        spark,
        {
            "e1": step_expand(F.lit(10), F.lit(0), 5, 20),   # 10+5=15
            "e2": step_expand(F.lit(18), F.lit(0), 5, 20),   # clamp 20
            "e3": step_expand(F.lit(3), F.lit(12), 5, 20),   # required wins
            "s1": step_shrink(F.lit(10), 3, 0),              # 7
            "s2": step_shrink(F.lit(2), 3, 0),               # clamp 0
        },
    )
    assert (r["e1"], r["e2"], r["e3"], r["s1"], r["s2"]) == (15, 20, 12, 7, 0)


# D2 — the NONE-branch quirk (ScalingAlgorithm.scala:18): NONE with
# 0 < required < capacity still EXPANDs by a full step.
def test_plan_action_none_quirk(spark):
    action, target = plan_action(F.lit("NONE"), F.lit(10), F.lit(4), IG_POLICY)
    r = one(spark, {"a": action, "t": target})
    assert (r["a"], r["t"]) == ("EXPAND", 15)
    # required == 0 -> true NONE
    action, target = plan_action(F.lit("NONE"), F.lit(10), F.lit(0), IG_POLICY)
    r = one(spark, {"a": action, "t": target})
    assert (r["a"], r["t"]) == ("NONE", 10)
    # required >= capacity -> true NONE
    action, target = plan_action(F.lit("NONE"), F.lit(10), F.lit(10), IG_POLICY)
    r = one(spark, {"a": action, "t": target})
    assert (r["a"], r["t"]) == ("NONE", 10)


# D4 — guard rails (ScalingManager.scala:67-101).
def test_guard_rails(spark):
    cases = [
        # action, target, running, requested -> final_action, final_target
        ("EXPAND", 20, 20, 20, "NONE", 20),    # at max
        ("EXPAND", 20, 23, 23, "RESIZE", 20),  # above max -> shrink to max
        ("EXPAND", 15, 10, 10, "RESIZE", 15),
        ("SHRINK", 0, 0, 0, "NONE", 0),        # at min
        ("SHRINK", 7, 10, 7, "NONE", 10),      # same capacity already requested
        ("SHRINK", 7, 10, 10, "RESIZE", 7),
        ("NONE", 10, 10, 10, "NONE", 10),
    ]
    for action, target, running, requested, want_a, want_t in cases:
        fa, ft = guard_rails(
            F.lit(action), F.lit(target), F.lit(running), F.lit(requested), IG_POLICY
        )
        r = one(spark, {"a": fa, "t": ft})
        assert (r["a"], r["t"]) == (want_a, want_t), cases


# W4 — idle definition (ScalingManager.scala:110-115): decayed counters
# use the < 1 threshold, not == 0.
def test_is_idle(spark):
    counters = [F.lit(0.4), F.lit(0.9), F.lit(0.0), F.lit(0.2), F.lit(0.99)]
    r = one(spark, {"i": is_idle(F.lit(0), F.lit(0), counters)})
    assert r["i"] is True
    r = one(spark, {"i": is_idle(F.lit(0), F.lit(0), counters + [F.lit(1.0)])})
    assert r["i"] is False
    r = one(spark, {"i": is_idle(F.lit(1), F.lit(0), counters)})
    assert r["i"] is False


# D5/F6 — distribute 5 over 3 groups -> (2,2,1) (Workers.scala:231-238).
def test_allocate(spark):
    groups = spark.createDataFrame(
        [("g1", 1), ("g2", 2), ("g3", 3)], "id string, created_ts int"
    )
    total = spark.createDataFrame([(5,)], "total long")
    rows = allocate(groups, total).orderBy("group_idx").collect()
    assert [r["alloc"] for r in rows] == [2, 2, 1]
    assert [r["id"] for r in rows] == ["g1", "g2", "g3"]
    total0 = spark.createDataFrame([(0,)], "total long")
    rows = allocate(groups, total0).collect()
    assert [r["alloc"] for r in rows] == [0, 0, 0]


# F5 — sign dispatch (Workers.scala:170-190).
def test_sign_dispatch(spark):
    r = one(
        spark,
        {
            "shrink": sign_dispatch(F.lit(10), F.lit(5)),
            "expand": sign_dispatch(F.lit(5), F.lit(10)),
            "none": sign_dispatch(F.lit(5), F.lit(5)),
        },
    )
    assert (r["shrink"], r["expand"], r["none"]) == ("SHRINK", "EXPAND", "NONE")
