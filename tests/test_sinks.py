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
