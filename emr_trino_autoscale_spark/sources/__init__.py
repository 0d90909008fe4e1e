"""Logical sources (SURVEY.md §2.1 S1-S10).

The reference's transports (JMX REST/RMI fetches, EMR SDK list calls)
are collector-side plumbing; the *logical* source each one feeds is a
schema-on-read JSON payload. This package owns those schemas and the
permissive parse + default-fill semantics (TrinoJmxRest.scala:31-60,
122-131: missing attribute -> 0, failed fetch -> empty/dropped row).

Any transport (a Python poller writing JSON lines, Kafka, a directory
of snapshots) lands raw strings in a ``(ts, node, payload)`` frame;
``parse_*`` below turns them into the canonical tables of SURVEY §1.3.
Works identically on batch and streaming DataFrames.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import (
    ArrayType,
    DoubleType,
    IntegerType,
    LongType,
    StringType,
    StructField,
    StructType,
)

# S1/S4 — mbean payload: {"attributes": [{"name": ..., "value": ...}]}
MBEAN_SCHEMA = StructType(
    [
        StructField(
            "attributes",
            ArrayType(
                StructType(
                    [
                        StructField("name", StringType()),
                        StructField("value", StringType()),  # dynamic: cast per consumer
                    ]
                )
            ),
        )
    ]
)

# S3 — node registry payloads (EmrNodeStatus.scala:3-10)
NODE_REGISTRY_SCHEMA = StructType(
    [
        StructField("id", StringType()),
        StructField("nodeVersion", StringType()),
        StructField("uri", StringType()),
        StructField("nodeRole", StringType()),
        StructField("nodeState", StringType()),
    ]
)

NODE_CPU_FIELDS = {
    # mbean attribute -> (column, type); java.lang:type=OperatingSystem
    # (metrics/TrinoJmxEmr.scala:39-72)
    "AvailableProcessors": ("available_processors", "int"),
    "CpuLoad": ("cpu_load", "double"),
    "ProcessCpuLoad": ("process_cpu_load", "double"),
    "SystemCpuLoad": ("system_cpu_load", "double"),
    "SystemLoadAverage": ("system_load_average", "double"),
}


def attributes_to_map(payload: Column) -> Column:
    """S4 — attribute list -> map keyed by name (TrinoJmxRest.scala:127-129).
    A malformed payload yields NULL -> empty map (failure tolerance,
    TrinoJmxRest.scala:130)."""
    parsed = F.from_json(payload, MBEAN_SCHEMA)
    return F.coalesce(
        F.map_from_entries(
            F.transform(parsed["attributes"], lambda a: F.struct(a["name"], a["value"]))
        ),
        F.from_json(F.lit("{}"), "map<string,string>"),
    )


def parse_node_cpu(raw: DataFrame, ts_col: str = "ts", node_col: str = "node", payload_col: str = "payload") -> DataFrame:
    """S1+P1 — per-node CPU snapshot parse with getOrElse-style defaults
    (missing attribute -> 0, TrinoJmxRest.scala:34-58)."""
    m = attributes_to_map(F.col(payload_col))
    cols = [F.col(ts_col).alias("ts"), F.col(node_col).alias("node")]
    for attr, (name, typ) in NODE_CPU_FIELDS.items():
        cols.append(
            F.coalesce(m.getItem(attr).cast(typ), F.lit(0).cast(typ)).alias(name)
        )
    return raw.select(*cols)


# ---------------------------------------------------------------------------
# S5-S8 — the EMR control-plane dimension scans, typed like S1/S3. The
# SDK list/describe calls are collector-side transport; their logical
# sources are JSON payloads with these schemas. Field names mirror the
# SDK response shapes the reference consumes.

# S6 — ListInstanceGroups entry (cluster/Workers.scala:151-157 list();
# :246-266 refresh() reads status/counts).
INSTANCE_GROUP_SCHEMA = StructType(
    [
        StructField("id", StringType()),
        StructField("name", StringType()),
        StructField("instanceGroupType", StringType()),
        StructField("instanceType", StringType()),
        StructField("market", StringType()),
        StructField("runningInstanceCount", IntegerType()),
        StructField("requestedInstanceCount", IntegerType()),
        StructField(
            "status",
            StructType(
                [
                    StructField("state", StringType()),
                    StructField(
                        "stateChangeReason",
                        StructType([StructField("message", StringType())]),
                    ),
                ]
            ),
        ),
    ]
)

# S7 — ListInstanceFleets entry (cluster/Workers.scala:351-363: fleet ->
# TaskRunning(id, name, instances with weighted capacities)).
INSTANCE_FLEET_SCHEMA = StructType(
    [
        StructField("id", StringType()),
        StructField("name", StringType()),
        StructField("instanceFleetType", StringType()),
        StructField("targetOnDemandCapacity", IntegerType()),
        StructField("targetSpotCapacity", IntegerType()),
        StructField("provisionedOnDemandCapacity", IntegerType()),
        StructField("provisionedSpotCapacity", IntegerType()),
        StructField(
            "status",
            StructType(
                [
                    StructField("state", StringType()),
                    StructField(
                        "stateChangeReason",
                        StructType([StructField("message", StringType())]),
                    ),
                ]
            ),
        ),
        StructField(
            "instanceTypeSpecifications",
            ArrayType(
                StructType(
                    [
                        StructField("instanceType", StringType()),
                        StructField("weightedCapacity", IntegerType()),
                    ]
                )
            ),
        ),
    ]
)

# S5 — ListInstances entry (the RUNNING-instance/private-IP dimension
# the semi-join P5/J1 consumes; TrinoJmxEmr.scala:86-108).
CLUSTER_INSTANCE_SCHEMA = StructType(
    [
        StructField("id", StringType()),
        StructField("ec2InstanceId", StringType()),
        StructField("privateIpAddress", StringType()),
        StructField("publicIpAddress", StringType()),
        StructField("instanceGroupId", StringType()),
        StructField("instanceFleetId", StringType()),
        StructField("market", StringType()),
        StructField("instanceType", StringType()),
        StructField("status", StructType([StructField("state", StringType())])),
    ]
)

# S8 — DescribeCluster (instanceCollectionType drives the IG/IF
# strategy dispatch D7; TrinoAutoscaler.scala startup).
DESCRIBE_CLUSTER_SCHEMA = StructType(
    [
        StructField(
            "cluster",
            StructType(
                [
                    StructField("id", StringType()),
                    StructField("name", StringType()),
                    StructField("instanceCollectionType", StringType()),
                    StructField(
                        "status", StructType([StructField("state", StringType())])
                    ),
                ]
            ),
        )
    ]
)


def parse_instance_groups(raw: DataFrame, payload_col: str = "payload") -> DataFrame:
    """S6 — typed TASK instance-group listing: the reference's
    ``list()`` keeps TASK groups and models each as
    ``TaskRunning(id, name, [Instance(instanceType, 1, market)])``
    (cluster/Workers.scala:151-157); ``refresh()`` additionally reads
    the resize/suspend status fields (:246-266). Weight is literal 1 —
    instance groups scale in whole instances."""
    g = raw.select(F.from_json(payload_col, INSTANCE_GROUP_SCHEMA).alias("g")).select(
        "g.*"
    )
    return g.filter(F.lower("instanceGroupType") == "task").select(
        F.col("id"),
        F.col("name"),
        F.col("instanceType").alias("instance_type"),
        F.lit(1).alias("weight"),
        F.col("market"),
        F.col("runningInstanceCount").alias("running"),
        F.col("requestedInstanceCount").alias("requested"),
        F.col("status.state").alias("state"),
        (F.lower("status.state") == "resizing").alias("is_resizing"),
        (F.lower("status.state") == "suspended").alias("is_suspended"),
        F.col("status.stateChangeReason.message").alias("message"),
    )


def parse_instance_fleets(
    raw: DataFrame, payload_col: str = "payload", use_spot: bool | None = None
) -> DataFrame:
    """S7 — typed TASK instance-fleet listing, one row per instance-type
    specification with its weighted capacity
    (cluster/Workers.scala:351-363).

    ``use_spot`` mirrors ``Config.IfShouldUseSpot``: the fleet refresh
    reads the capacity pair of the market it purchases
    (cluster/Workers.scala:393-397) — ``True`` ->
    (provisionedSpotCapacity, targetSpotCapacity), ``False`` -> the
    on-demand pair. ``None`` keeps the market-agnostic total (spot +
    on-demand), the view used by capacity reporting where market is
    irrelevant; the D6 refresh path must pass the configured market.
    """
    f = raw.select(F.from_json(payload_col, INSTANCE_FLEET_SCHEMA).alias("f")).select(
        "f.*"
    )
    if use_spot is None:
        running = F.col("provisionedOnDemandCapacity") + F.col("provisionedSpotCapacity")
        requested = F.col("targetOnDemandCapacity") + F.col("targetSpotCapacity")
    elif use_spot:
        running = F.col("provisionedSpotCapacity")
        requested = F.col("targetSpotCapacity")
    else:
        running = F.col("provisionedOnDemandCapacity")
        requested = F.col("targetOnDemandCapacity")
    return f.filter(F.lower("instanceFleetType") == "task").select(
        "id",
        "name",
        F.explode("instanceTypeSpecifications").alias("spec"),
        running.alias("running"),
        requested.alias("requested"),
    ).select(
        "id",
        "name",
        F.col("spec.instanceType").alias("instance_type"),
        F.col("spec.weightedCapacity").alias("weight"),
        "running",
        "requested",
    )


def parse_fleet_refresh(
    raw: DataFrame,
    ts_col: str = "ts",
    payload_col: str = "payload",
    use_spot: bool = True,
) -> DataFrame:
    """D6 input adapter for instance fleets
    (cluster/Workers.scala:380-400): one refresh row per fleet listing,
    shaped for ``streaming.pipeline.task_state_stream`` —
    (task_id, ts_ms, status, running, requested).

    The market decides which capacity pair the refresh reads
    (Workers.scala:393-397): ``use_spot=True``
    (``Config.IfShouldUseSpot``) -> (provisionedSpotCapacity,
    targetSpotCapacity); ``False`` -> the on-demand pair. A SPOT fleet's
    on-demand numbers (usually 0) must never leak into the scaling
    loop's running/requested counts.
    """
    f = raw.select(
        F.col(ts_col).alias("__ts"),
        F.from_json(payload_col, INSTANCE_FLEET_SCHEMA).alias("f"),
    ).select("__ts", "f.*")
    if use_spot:
        running, requested = F.col("provisionedSpotCapacity"), F.col("targetSpotCapacity")
    else:
        running = F.col("provisionedOnDemandCapacity")
        requested = F.col("targetOnDemandCapacity")
    return f.filter(F.lower("instanceFleetType") == "task").select(
        F.col("id").alias("task_id"),
        (F.unix_timestamp("__ts") * 1000).cast("long").alias("ts_ms"),
        F.col("status.state").alias("status"),
        running.alias("running"),
        requested.alias("requested"),
    )


def parse_cluster_instances(raw: DataFrame, payload_col: str = "payload") -> DataFrame:
    """S5 — typed cluster-instance listing: the private-IP dimension the
    worker semi-join consumes (TrinoJmxEmr.scala:86-108 keeps RUNNING
    instances and joins registry hosts on private IP)."""
    i = raw.select(F.from_json(payload_col, CLUSTER_INSTANCE_SCHEMA).alias("i")).select(
        "i.*"
    )
    return i.select(
        F.col("id"),
        F.col("ec2InstanceId").alias("ec2_instance_id"),
        F.col("privateIpAddress").alias("private_ip"),
        F.col("instanceGroupId").alias("group_id"),
        F.col("instanceFleetId").alias("fleet_id"),
        F.col("market"),
        F.col("instanceType").alias("instance_type"),
        F.col("status.state").alias("state"),
    )


def parse_describe_cluster(raw: DataFrame, payload_col: str = "payload") -> DataFrame:
    """S8 — typed DescribeCluster projection; ``collection_type``
    (INSTANCE_GROUP / INSTANCE_FLEET) is the D7 strategy-dispatch key."""
    c = raw.select(F.from_json(payload_col, DESCRIBE_CLUSTER_SCHEMA).alias("d")).select(
        "d.cluster.*"
    )
    return c.select(
        F.col("id").alias("cluster_id"),
        F.col("name"),
        F.col("instanceCollectionType").alias("collection_type"),
        F.col("status.state").alias("state"),
    )


# S10 — properties/HOCON config scan (Config.scala:20-21 parses
# /etc/trino/conf/config.properties; :59-61 derives the https flag and
# port with a Try(...).getOrElse(false) fallback).

def parse_properties(raw: DataFrame, text_col: str = "payload") -> DataFrame:
    """S10 — java-properties text -> ``props`` map<string,string>.

    Pure column expressions: split lines, drop blanks/comments, split
    each line at the first '=' (values may contain '='), collect to a
    map. Runs as a narrow projection — the config file is a 1-row
    dimension, but the parse is schema-on-read like every other source.

    Repeated keys follow ``java.util.Properties`` last-wins semantics:
    a fold dedupes entries before ``map_from_entries`` so a payload that
    repeats a key parses instead of throwing DUPLICATED_MAP_KEY under
    Spark's default ``spark.sql.mapKeyDedupPolicy=EXCEPTION``.
    """
    lines = F.filter(
        F.transform(F.split(F.col(text_col), "\n"), lambda l: F.trim(l)),
        lambda l: (F.length(l) > 0)
        & ~l.startswith("#")
        & ~l.startswith("!")
        & l.contains("="),
    )
    def entry(l):
        key = F.substring_index(l, "=", 1)
        # value = everything after the FIRST '=' (values may contain '=')
        value = l.substr(F.length(key) + F.lit(2), F.length(l))
        return F.struct(F.trim(key).alias("key"), F.trim(value).alias("value"))

    entries = F.transform(lines, entry)
    # last-wins dedupe: keep entry i only if no later entry shares its
    # key (properties files legally repeat keys; the last one wins)
    deduped = F.filter(
        entries,
        lambda e, i: ~F.exists(
            F.slice(entries, i + F.lit(2), F.size(entries)),
            lambda later: later["key"] == e["key"],
        ),
    )
    return raw.withColumn("props", F.map_from_entries(deduped))


def https_schema_and_port(props_col) -> tuple:
    """S10 — the reference's https dispatch (Config.scala:59-61):
    ``http-server.https.enabled`` true -> ('https', https port), else
    ('http', http port); a missing/garbage flag falls back to http
    (``Try(...).getOrElse(false)``)."""
    flag = F.lower(F.coalesce(props_col.getItem("http-server.https.enabled"), F.lit("false")))
    is_https = flag == "true"
    schema = F.when(is_https, F.lit("https")).otherwise(F.lit("http"))
    port = F.when(is_https, props_col.getItem("http-server.https.port")).otherwise(
        props_col.getItem("http-server.http.port")
    )
    return schema, port


def parse_node_registry(raw: DataFrame, ts_col: str = "ts", payload_col: str = "payload") -> DataFrame:
    """S3+P3/P4 — registry scan: parse, keep active workers, extract the
    hostname from the URI, drop rows whose URI doesn't match
    (TrinoJmxEmr.scala:76-85)."""
    parsed = raw.select(
        F.col(ts_col).alias("ts"), F.from_json(payload_col, NODE_REGISTRY_SCHEMA).alias("n")
    ).select("ts", "n.*")
    return (
        parsed.filter(
            (F.lower("nodeRole") == "worker") & (F.lower("nodeState") == "active")
        )
        .withColumn("host", F.regexp_extract("uri", ".*//(.*):.*", 1))
        .filter(F.length("host") > 0)
    )
