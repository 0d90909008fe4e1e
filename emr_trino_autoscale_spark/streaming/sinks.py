"""Effect sinks K1-K5 (SURVEY.md §2.1) as idempotent foreachBatch writers.

The reference publishes CloudWatch metrics (utils/CloudWatch.scala:17-58),
issues EMR resize calls (cluster/Workers.scala:200-207,366-377) and
touches a liveness file (scaling/ScalingManager.scala:50-60). In-repo,
every effect is modeled as an append to a parquet "effect table" keyed
for idempotence, so micro-batch retries can't double-fire (SURVEY.md
§4.3 item 4). The AWS-facing executor would replace ``_append`` only.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def _append(df: DataFrame, path: str) -> None:
    df.write.mode("append").parquet(path)


def _dedup_against(df: DataFrame, path: str, keys: list[str]) -> DataFrame:
    """Idempotence: drop rows whose key already landed in the sink
    (micro-batch retry protection)."""
    spark = df.sparkSession
    if os.path.isdir(path):
        existing = spark.read.parquet(path).select(*keys).distinct()
        return df.join(F.broadcast(existing), keys, "left_anti")
    return df


def metric_scalar_sink(out_dir: str):
    """K1 — one named datum per batch (CloudWatch.putMetricData,
    utils/CloudWatch.scala:17-36). Input rows: (ts, metric, value)."""

    def write(df: DataFrame, epoch_id: int) -> None:
        path = os.path.join(out_dir, "metrics_out")
        batch = df.withColumn("epoch_id", F.lit(epoch_id))
        _append(_dedup_against(batch, path, ["ts", "metric", "epoch_id"]), path)

    return write


def metric_map_fanout_sink(out_dir: str, prefix: str):
    """K2 — one datum per map entry, metric name ``prefix.node``
    (utils/CloudWatch.scala:38-58). Input rows: (ts, entries MAP<STRING,DOUBLE>)."""

    def write(df: DataFrame, epoch_id: int) -> None:
        path = os.path.join(out_dir, "metrics_out")
        exploded = (
            df.select("ts", F.explode("entries").alias("node", "value"))
            .select(
                "ts",
                F.concat_ws(".", F.lit(prefix), F.col("node")).alias("metric"),
                "value",
            )
            .withColumn("epoch_id", F.lit(epoch_id))
        )
        _append(_dedup_against(exploded, path, ["ts", "metric", "epoch_id"]), path)

    return write


def resize_action_sink(out_dir: str):
    """K3 — resize-action executor (ModifyInstanceGroups/Fleet,
    cluster/Workers.scala:200-207,366-377). Dedup on (cluster_id, ts_ms):
    the reference's own guard against re-requesting the same capacity
    (ScalingManager.scala:88) is the batch analog."""

    def write(df: DataFrame, epoch_id: int) -> None:
        path = os.path.join(out_dir, "actions_out")
        fired = df.filter(F.col("action") != "NONE")
        _append(_dedup_against(fired, path, ["cluster_id", "ts_ms"]), path)

    return write


def liveness_touch_sink(out_dir: str, busy_file: str = "isbusy"):
    """K5 — touch the auto-termination liveness file when NOT idle
    (scaling/ScalingManager.scala:50-60; path Config.scala:43)."""

    def write(df: DataFrame, epoch_id: int) -> None:
        not_idle = df.filter(~F.col("is_idle")).limit(1).count() > 0
        if not_idle:
            os.makedirs(out_dir, exist_ok=True)
            with open(os.path.join(out_dir, busy_file), "a"):
                os.utime(os.path.join(out_dir, busy_file))

    return write
