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
