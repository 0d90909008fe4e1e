"""Pytest port of the reference's only test suite
(src/test/scala/com/amazonaws/emr/metrics/MetricStoreTest.scala:19-71)
onto the windowed-store DataFrame operators, plus zero-fill and
population-mismatch cases (SURVEY.md §4.3 risk items).

Fixtures mirror the ScalaTest inputs: nodes d1/d2 with values
1.2 / 0.2-0.8 / 0.5-0.6 over ticks at 15 s spacing.
"""

from __future__ import annotations

import datetime as dt

from pyspark.sql import functions as F

from emr_trino_autoscale_spark.operators import metric_store as ms

T0 = dt.datetime(2024, 1, 1, 0, 0, 0)


def make_store(spark, snapshots):
    """snapshots: list of dict node->value, one per 15 s tick (the
    FixedList append order — utils/FixedList.scala:12-15)."""
    rows = []
    for i, snap in enumerate(snapshots):
        for node, value in snap.items():
            rows.append((T0 + dt.timedelta(seconds=15 * i), node, float(value)))
    return spark.createDataFrame(rows, "tick timestamp, node string, value double")


def one_min_avg_map(spark, snapshots):
    df = ms.zero_fill(ms.last_n_ticks(make_store(spark, snapshots)))
    avg = ms.one_minute_avg(df)
    return {r["node"]: r["avg_value"] for r in avg.collect()}


# MetricStoreTest "append" + "last" (:19-28)
def test_append_and_last(spark):
    df = make_store(spark, [{"d1": 1.2}, {"d2": 1.3}])
    last = ms.last_value_per_node(df).collect()
    got = {r["node"]: r["value"] for r in last}
    assert got == {"d1": 1.2, "d2": 1.3}
    # last snapshot population is only the newest tick's nodes
    nodes = [r["node"] for r in ms.last_snapshot_nodes(df).collect()]
    assert nodes == ["d2"]


# MetricStoreTest "isCold" (:30-37): cold until 4 data points exist.
def test_is_cold(spark):
    cold = one_min_avg_map(spark, [{"d1": 1.2}])
    assert cold == {}
    warm = one_min_avg_map(spark, [{"d1": 1.2}] * 4)
    assert warm == {"d1": 1.2}


# MetricStoreTest "average" (:39-43)
def test_average(spark):
    avgs = one_min_avg_map(spark, [{"d1": 2.0}, {"d1": 4.0}, {"d1": 6.0}, {"d1": 8.0}])
    assert avgs == {"d1": 5.0}


# MetricStoreTest "oneMinute" (:45-53): empty below min support, then
# the average of the last 4 points.
def test_one_minute_window(spark):
    assert one_min_avg_map(spark, [{"d1": 1.2}] * 2) == {}
    assert one_min_avg_map(spark, [{"d1": 1.2}] * 4) == {"d1": 1.2}
    # 6 points, last 4 averaged: series 9,9,1.2,1.2,1.2,1.2 -> 1.2
    snaps = [{"d1": 9.0}] * 2 + [{"d1": 1.2}] * 4
    assert one_min_avg_map(spark, snaps) == {"d1": 1.2}


# MetricStoreTest "isAvgOneMinGreater" (:55-60)
def test_quorum_greater(spark):
    snaps = [{"d1": 0.2, "d2": 0.8}] * 4
    df = ms.zero_fill(ms.last_n_ticks(make_store(spark, snaps)))
    avg = ms.one_minute_avg(df)
    den = ms.last_snapshot_nodes(df)
    r = ms.quorum(avg, den, fraction=1.0, threshold=0.2).collect()[0]
    assert r["quorum"] is True and r["is_avg_lower"] is False
    r = ms.quorum(avg, den, fraction=0.5, threshold=0.8).collect()[0]
    assert r["quorum"] is True


# MetricStoreTest "isAvgOneMinBetween" (:62-71)
def test_quorum_between(spark):
    snaps = [{"d1": 0.5, "d2": 0.6}] * 4
    df = ms.zero_fill(ms.last_n_ticks(make_store(spark, snaps)))
    avg = ms.one_minute_avg(df)
    den = ms.last_snapshot_nodes(df)

    def between(fraction, lo, hi):
        return ms.quorum(avg, den, fraction, 0.0, between=(lo, hi)).collect()[0]["quorum"]

    assert between(1.0, 0.45, 0.65) is True
    assert between(0.5, 0.45, 0.65) is True
    assert between(0.5, 0.45, 0.55) is True
    assert between(0.5, 0.25, 0.35) is False


# Zero-fill contract (MetricStore.scala:21): a node missing from a
# snapshot contributes 0.0 — its average is pulled down, not skipped.
def test_zero_fill_semantics(spark):
    snaps = [{"d1": 1.0, "d2": 1.0}, {"d1": 1.0}, {"d1": 1.0, "d2": 1.0}, {"d1": 1.0, "d2": 1.0}]
    avgs = one_min_avg_map(spark, snaps)
    assert avgs["d1"] == 1.0
    assert abs(avgs["d2"] - 0.75) < 1e-12


# Ring-buffer eviction (FixedList.scala:12-15): only the newest
# MAX_POINTS ticks survive.
def test_ring_buffer_eviction(spark):
    snaps = [{"d1": 100.0}] * 5 + [{"d1": 1.0}] * ms.MAX_POINTS
    df = ms.last_n_ticks(make_store(spark, snaps))
    assert df.count() == ms.MAX_POINTS
    assert df.agg(F.max("value")).collect()[0][0] == 1.0


# Population mismatch (MetricStore.scala:49-53 vs :29-33): denominator
# uses the last snapshot's node list even when averages cover more nodes.
def test_quorum_population_mismatch(spark):
    snaps = [{"d1": 0.9, "d2": 0.9}] * 4 + [{"d1": 0.9}]
    store = ms.last_n_ticks(make_store(spark, snaps))
    avg = ms.one_minute_avg(ms.zero_fill(store))
    den = ms.last_snapshot_nodes(store)
    r = ms.quorum(avg, den, fraction=0.8, threshold=0.7).collect()[0]
    # d2's zero-filled last tick drags its avg to 0.675 < 0.7; only d1
    # breaches, and the denominator is only the last snapshot (d1).
    assert r["total_nodes"] == 1
    assert r["breached"] == 1
    assert r["quorum"] is True


# Filled-average identity (round-3 q10 restructure): the scaffold-free
# filled_last_n_avg must equal one_minute_avg(zero_fill(...)) on every
# shape — full series, gaps, short buffer, stale nodes.
def test_filled_last_n_avg_matches_compositional(spark):
    cases = [
        [{"d1": 1.2, "d2": 0.4}] * 4,                             # full
        [{"d1": 1.0, "d2": 1.0}, {"d1": 1.0},                     # gap
         {"d1": 1.0, "d2": 1.0}, {"d1": 1.0, "d2": 1.0}],
        [{"d1": 0.9, "d2": 0.9}] * 4 + [{"d1": 0.9}],             # stale d2
        [{"d1": 0.5}] * 3,                                        # cold start
        [{"d1": 2.0}] * 7,                                        # longer than n
    ]
    for snaps in cases:
        store = make_store(spark, snaps)
        want = {
            (r["node"], round(r["avg_value"], 12), r["n_points"])
            for r in ms.one_minute_avg(ms.zero_fill(store)).collect()
        }
        got = {
            (r["node"], round(r["avg_value"], 12), r["n_points"])
            for r in ms.filled_last_n_avg(store).collect()
        }
        assert got == want, snaps


def test_q10_fused_matches_compositional(spark, sf_dir):
    """The round-3 single-pass q10 must produce the exact row the
    five-branch compositional form (zero_fill -> one_minute_avg,
    last_snapshot_nodes, semi-join numerator) produces on real data."""
    from emr_trino_autoscale_spark.queries import QUERIES, _q09_daily, release_caches

    daily = _q09_daily(spark, sf_dir)
    avg4 = ms.one_minute_avg(ms.zero_fill(daily))
    last_nodes = ms.last_snapshot_nodes(daily)
    den = last_nodes.count()
    num = avg4.join(last_nodes, "node", "left_semi").agg(
        F.sum(F.when(F.col("avg_value") >= 100.0, 1).otherwise(0)).alias("breached"),
        F.sum(
            F.when((F.col("avg_value") > 50.0) & (F.col("avg_value") < 100.0), 1).otherwise(0)
        ).alias("mid_count"),
    ).collect()[0]
    fused = QUERIES["q10_quorum_predicates"](spark, sf_dir).collect()[0]
    release_caches()
    assert fused["breached"] == num["breached"]
    assert fused["mid_count"] == num["mid_count"]
    assert fused["total_nodes"] == den
    assert fused["is_expand_quorum"] == (num["breached"] >= den * 0.8)
    assert fused["is_avg_lower"] == (not (num["breached"] >= den * 0.8))
