"""SparkSession factory.

Local test/bench sessions run ``local[$SPARK_GRAFT_CPUS]``; the same
builder settings are what we would ship on a 1000-executor cluster:
AQE on (runtime shuffle-partition coalescing + skew-join splitting),
UTC session time zone (determinism — all oracle comparisons format
timestamps as UTC strings), Arrow enabled for the pandas-UDF extension
operators, and a broadcast threshold sized so every dimension table in
the data model (SURVEY.md §1.3 — registries, specs, task state) is
broadcast rather than shuffled.
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession


def get_spark(
    app_name: str = "emr-trino-autoscale-spark",
    cpus: int | str | None = None,
    shuffle_partitions: int | None = None,
) -> SparkSession:
    cpus = int(cpus or os.environ.get("SPARK_GRAFT_CPUS", "32"))
    # One shuffle partition per core locally; on a real cluster AQE
    # coalesces from a deliberately high initial number, so we set the
    # *initial* count high and let adaptive execution shrink it.
    shuffle_partitions = int(shuffle_partitions or max(cpus, 32))
    builder = (
        SparkSession.builder.master(f"local[{cpus}]")
        .appName(app_name)
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.sql.shuffle.partitions", str(shuffle_partitions))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.sql.autoBroadcastJoinThreshold", str(64 * 1024 * 1024))
        .config("spark.driver.maxResultSize", "2g")
        .config("spark.ui.enabled", "false")
        .config("spark.sql.files.maxPartitionBytes", str(128 * 1024 * 1024))
        # The driver synthetics store events.ts as TIMESTAMP(NANOS),
        # which the Spark parquet reader rejects; read as long and
        # convert in io.load_table (truncating to micros, matching how
        # DuckDB reads the same file).
        .config("spark.sql.legacy.parquet.nanosAsLong", "true")
    )
    return builder.getOrCreate()
