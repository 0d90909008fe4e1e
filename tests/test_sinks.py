"""Effect-sink tests (K1/K2/K5): fan-out shape, idempotence under
micro-batch retry, liveness gating."""

from __future__ import annotations

import os

from emr_trino_autoscale_spark.streaming import sinks


def test_metric_scalar_sink_idempotent(spark, tmp_path):
    out = str(tmp_path)
    sink = sinks.metric_scalar_sink(out)
    batch = spark.createDataFrame(
        [(1000, "cpu.avg", 0.5), (1000, "mem.used", 123.0)],
        "ts long, metric string, value double",
    )
    sink(batch, 7)
    sink(batch, 7)  # retried micro-batch must not duplicate
    got = spark.read.parquet(os.path.join(out, "metrics_out"))
    assert got.count() == 2
    sink(batch, 8)  # a NEW epoch is a new publication (reference
    assert spark.read.parquet(os.path.join(out, "metrics_out")).count() == 4


def test_metric_map_fanout_sink(spark, tmp_path):
    out = str(tmp_path)
    sink = sinks.metric_map_fanout_sink(out, prefix="NodesCPU")
    batch = spark.createDataFrame(
        [(1000, {"n1": 0.4, "n2": 0.9})], "ts long, entries map<string,double>"
    )
    sink(batch, 1)
    got = {
        r["metric"]: r["value"]
        for r in spark.read.parquet(os.path.join(out, "metrics_out")).collect()
    }
    # one datum per map entry, named prefix.node (CloudWatch.scala:38-58)
    assert got == {"NodesCPU.n1": 0.4, "NodesCPU.n2": 0.9}


def test_liveness_touch_only_when_busy(spark, tmp_path):
    out = str(tmp_path / "live")
    sink = sinks.liveness_touch_sink(out)
    idle = spark.createDataFrame([(True,)], "is_idle boolean")
    busy = spark.createDataFrame([(False,)], "is_idle boolean")
    sink(idle, 1)
    assert not os.path.exists(os.path.join(out, "isbusy"))
    sink(busy, 2)
    assert os.path.exists(os.path.join(out, "isbusy"))


# ---------------------------------------------------------------------------
# K4 — create-if-absent capacity sink (Workers.scala:107-146, 318-347;
# 48-group service limit Config.scala:93-94)

_IG_SPEC = {
    "name": "trino-task",
    "instances": [{"name": "m5.xlarge", "weight": 1, "market": "SPOT"}],
}

_LISTING_SCHEMA = "id string, name string, instance_type string, market string"


def _listing(spark, rows):
    return spark.createDataFrame(rows, _LISTING_SCHEMA)


def test_capacity_create_when_absent(spark, tmp_path):
    out = str(tmp_path)
    sink = sinks.capacity_create_sink(out, _IG_SPEC)
    sink(_listing(spark, [("ig-1", "other", "m5.xlarge", "SPOT")]), 0)
    got = spark.read.parquet(os.path.join(out, "groups_out")).collect()
    assert len(got) == 1
    r = got[0]
    assert r["action"] == "CREATE" and r["instance_count"] == 0
    assert r["instance_type"] == "m5.xlarge" and r["market"] == "SPOT"
    # idempotence: retrying the same setup appends nothing
    sink(_listing(spark, [("ig-1", "other", "m5.xlarge", "SPOT")]), 1)
    assert spark.read.parquet(os.path.join(out, "groups_out")).count() == 1


def test_capacity_reuse_matching_group(spark, tmp_path):
    out = str(tmp_path)
    sink = sinks.capacity_create_sink(out, _IG_SPEC)
    # match requires name AND head instance type AND market, all CI
    sink(_listing(spark, [("ig-9", "TRINO-TASK", "M5.XLARGE", "spot")]), 0)
    got = spark.read.parquet(os.path.join(out, "groups_out")).collect()
    assert len(got) == 1
    assert got[0]["action"] == "REUSE" and got[0]["group_id"] == "ig-9"


def test_capacity_reuse_deterministic_on_multi_match(spark, tmp_path):
    # several groups match the spec: the recorded id must be the same
    # across replays (smallest id), not whichever partition won the race
    out = str(tmp_path)
    sink = sinks.capacity_create_sink(out, _IG_SPEC)
    listing = _listing(
        spark,
        [
            ("ig-7", "trino-task", "m5.xlarge", "SPOT"),
            ("ig-2", "trino-task", "m5.xlarge", "SPOT"),
            ("ig-5", "trino-task", "m5.xlarge", "SPOT"),
        ],
    )
    sink(listing.repartition(3), 0)
    got = spark.read.parquet(os.path.join(out, "groups_out")).collect()
    assert len(got) == 1
    assert got[0]["action"] == "REUSE" and got[0]["group_id"] == "ig-2"


def test_capacity_group_limit_enforced(spark, tmp_path):
    import pytest

    out = str(tmp_path)
    sink = sinks.capacity_create_sink(out, _IG_SPEC, max_groups=3)
    listing = _listing(
        spark, [(f"ig-{i}", f"g{i}", "c5.xlarge", "SPOT") for i in range(3)]
    )
    with pytest.raises(RuntimeError, match="maximum number of 3"):
        sink(listing, 0)


def test_capacity_fleet_strict_mismatch(spark, tmp_path):
    import pytest

    out = str(tmp_path)
    spec = {
        "name": "trino-task",
        "instances": [
            {"name": "m5.xlarge", "weight": 4, "market": "SPOT"},
            {"name": "r5.xlarge", "weight": 8, "market": "SPOT"},
        ],
    }
    sink = sinks.capacity_create_sink(out, spec, flavor="if")
    # fleet reuse requires EVERY spec type present in the fleet
    ok = _listing(
        spark,
        [
            ("if-1", "trino-task", "m5.xlarge", "SPOT"),
            ("if-1", "trino-task", "r5.xlarge", "SPOT"),
        ],
    )
    sink(ok, 0)
    got = spark.read.parquet(os.path.join(out, "groups_out")).collect()
    assert len(got) == 1 and got[0]["action"] == "REUSE"
    # a non-empty listing that doesn't match raises (Workers.scala:327-329)
    bad = _listing(spark, [("if-2", "trino-task", "m5.xlarge", "SPOT")])
    sink2 = sinks.capacity_create_sink(str(tmp_path / "b"), spec, flavor="if")
    with pytest.raises(RuntimeError, match="doesn't match"):
        sink2(bad, 0)


def test_capacity_fleet_create_carries_min_units(spark, tmp_path):
    out = str(tmp_path)
    spec = {
        "name": "trino-task",
        "min_units": 12,
        "instances": [{"name": "m5.xlarge", "weight": 4, "market": "SPOT"}],
    }
    sink = sinks.capacity_create_sink(out, spec, flavor="if")
    sink(_listing(spark, []), 0)  # empty listing -> create
    got = spark.read.parquet(os.path.join(out, "groups_out")).collect()
    assert len(got) == 1 and got[0]["action"] == "CREATE"
    # fleets are created AT the spec's target capacity, not empty
    assert got[0]["instance_count"] == 12


def test_capacity_fleet_duplicate_spec_types_match(spark, tmp_path):
    out = str(tmp_path)
    spec = {
        "name": "trino-task",
        "instances": [
            {"name": "m5.xlarge", "weight": 4, "market": "SPOT"},
            {"name": "M5.XLARGE", "weight": 8, "market": "SPOT"},  # dup, case-variant
        ],
    }
    sink = sinks.capacity_create_sink(out, spec, flavor="if")
    listing = _listing(spark, [("if-1", "trino-task", "m5.xlarge", "SPOT")])
    sink(listing, 0)  # must REUSE, not raise strict-mismatch
    got = spark.read.parquet(os.path.join(out, "groups_out")).collect()
    assert len(got) == 1 and got[0]["action"] == "REUSE"
