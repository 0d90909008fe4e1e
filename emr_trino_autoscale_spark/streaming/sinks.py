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


# K4 — capacity-create setup effect. Config.scala:93-94: an EMR cluster
# allows at most 48 TASK instance groups.
MAX_INSTANCE_GROUPS_LIMIT = 48


def capacity_create_sink(
    out_dir: str,
    spec: dict,
    flavor: str = "ig",
    max_groups: int = MAX_INSTANCE_GROUPS_LIMIT,
):
    """K4 — create-if-absent capacity provisioning
    (cluster/Workers.scala:107-146 instance groups, :318-347 fleets).

    Input batch: the current TASK listing, one row per (id, name,
    instance_type, market) — the ``parse_instance_groups`` /
    ``parse_instance_fleets`` shape. ``spec`` mirrors TaskSpec:
    ``{"name": ..., "instances": [{"name": ..., "weight": ...,
    "market": ...}]}``.

    Per batch (idempotent — re-running against a listing that already
    contains the group appends nothing new):

    * a listed group matching the spec (IG: name, head instance type
      and market all CI-equal; IF: name CI-equal and every spec type
      present in the fleet) is REUSED — recorded, never re-created;
    * no match -> a CREATE effect row per spec instance type; the
      ``instance_count`` column carries the initial capacity — 0 for
      groups (created empty, Workers.scala:136), the spec's
      ``min_units`` for fleets (AddInstanceFleet sets the target
      capacity at creation, Workers.scala:331-339) — unless creating
      would breach the ``max_groups`` service limit
      (Workers.scala:121-128), which raises;
    * IF only: a non-empty listing with no match raises — fleets can't
      coexist with a mismatched spec (Workers.scala:327-329).

    The listing is a bounded dimension (<= 48 rows by the same service
    limit), so the driver-side verdict reads are O(1), exactly like the
    reference's one-shot initialize().
    """
    head = spec["instances"][0]

    def write(df: DataFrame, epoch_id: int) -> None:
        path = os.path.join(out_dir, "groups_out")
        name_eq = F.lower(F.col("name")) == str(spec["name"]).lower()
        if flavor == "ig":
            match = df.filter(
                name_eq
                & (F.lower(F.col("instance_type")) == str(head["name"]).lower())
                & (F.lower(F.col("market")) == str(head["market"]).lower())
            )
        else:
            # deduplicated CI set: a spec listing the same type twice
            # (or in different case) must still match a fleet containing
            # it once — containment is a SET property
            wanted = sorted({str(i["name"]).lower() for i in spec["instances"]})
            by_group = (
                df.filter(name_eq)
                .groupBy("id")
                .agg(F.collect_set(F.lower("instance_type")).alias("types"))
            )
            match = by_group.filter(
                F.size(F.array_intersect(F.col("types"), F.array(*[F.lit(w) for w in wanted])))
                == len(wanted)
            )
        # orderBy before limit(1): several listed groups can match the
        # spec, and an unordered limit picks a nondeterministic one —
        # replays must agree on which group was "reused"
        existing = match.select("id").orderBy("id").limit(1).collect()
        if existing:
            effect = df.sparkSession.createDataFrame(
                [(str(spec["name"]), existing[0]["id"], "REUSE", epoch_id)],
                "name string, group_id string, action string, epoch_id long",
            )
            _append(_dedup_against(effect, path, ["name", "action"]), path)
            return
        n_listed = df.select("id").distinct().count()
        if flavor == "if" and n_listed > 0:
            raise RuntimeError(
                "Existing TASK fleet doesn't match scaling specifications"
            )
        if n_listed + 1 > max_groups:
            raise RuntimeError(
                f"You can have a maximum number of {max_groups} TASK groups; "
                f"existing: {n_listed}"
            )
        init_capacity = 0 if flavor == "ig" else int(spec.get("min_units", 0))
        effect = df.sparkSession.createDataFrame(
            [
                (
                    str(spec["name"]),
                    None,
                    "CREATE",
                    str(i["name"]),
                    int(i.get("weight", 1)),
                    str(i["market"]),
                    init_capacity,
                    epoch_id,
                )
                for i in spec["instances"]
            ],
            "name string, group_id string, action string, instance_type string,"
            " weight int, market string, instance_count int, epoch_id long",
        )
        _append(
            _dedup_against(effect, path, ["name", "action", "instance_type"]), path
        )

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
