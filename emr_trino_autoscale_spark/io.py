"""Readers for the driver synthetic tables (TESTDATA.md).

All inputs are Parquet; reads go through ``spark.read.parquet`` so
Catalyst gets vectorized scans, predicate pushdown and column pruning
for free. No schema inference beyond Parquet footers (the reference
never infers schemas either — SURVEY.md §1.2).
"""

from __future__ import annotations

from functools import lru_cache

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

TABLES = (
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
)

# Dimension-sized tables (always safely broadcastable at any SF the
# engine targets; registries/specs in the reference data model are at
# most a few thousand rows — SURVEY.md §2.3).
DIM_TABLES = frozenset({"region", "nation", "supplier"})


@lru_cache(maxsize=None)
def _nano_ts_columns(path: str) -> tuple[str, ...]:
    """Columns stored as TIMESTAMP(NANOS) in the parquet footer. Spark
    reads them as long (``spark.sql.legacy.parquet.nanosAsLong``); we
    convert to a microsecond timestamp, truncating exactly like DuckDB
    does when it reads the same file."""
    import pyarrow.parquet as pq
    import pyarrow.types as pt

    schema = pq.read_schema(path)
    return tuple(
        f.name for f in schema if pt.is_timestamp(f.type) and f.type.unit == "ns"
    )


def ensure_runtime_confs(spark: SparkSession) -> None:
    """Set the SQL confs the engine depends on even when the caller
    (e.g. the verify driver) built its own SparkSession: nanos parquet
    reads and deterministic UTC timestamp formatting. Both are runtime
    SQL confs, safe to set after session start; failures are ignored so
    a locked-down session still works if it already has sane values."""
    for k, v in (
        ("spark.sql.legacy.parquet.nanosAsLong", "true"),
        ("spark.sql.session.timeZone", "UTC"),
        # Read unannotated (NTZ) parquet timestamps as session-LTZ AT THE
        # SCAN, not via a post-scan cast: a cast projection would sit
        # between the scan and every timestamp filter, blocking parquet
        # predicate pushdown / row-group skipping on l_shipdate,
        # o_orderdate, events.ts (~1.4x on the scan-bound queries at
        # sf0.1). Value-identical under the UTC session zone.
        ("spark.sql.parquet.inferTimestampNTZ.enabled", "false"),
    ):
        try:
            spark.conf.set(k, v)
        except Exception:  # noqa: BLE001 — read-only conf: keep going
            pass


def load_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    if name not in TABLES:
        raise ValueError(f"unknown table {name!r}; expected one of {TABLES}")
    ensure_runtime_confs(spark)
    path = f"{sf_dir}/{name}.parquet"
    df = spark.read.parquet(path)
    for c in _nano_ts_columns(path):
        df = df.withColumn(c, F.timestamp_micros(F.expr(f"`{c}` div 1000")))
    # FALLBACK normalization for TIMESTAMP_NTZ columns. The primary path
    # is the inferTimestampNTZ conf above (scan-level LTZ read, keeps
    # parquet predicate pushdown); this cast only fires when the conf
    # could not be applied (locked-down session) and an NTZ column
    # leaked through. Value-preserving under the UTC session zone.
    from pyspark.sql.types import TimestampNTZType

    for field in df.schema.fields:
        if isinstance(field.dataType, TimestampNTZType):
            df = df.withColumn(field.name, F.col(field.name).cast("timestamp"))
    return df


def register_views(spark: SparkSession, sf_dir: str) -> None:
    """Register every synthetic table as a temp view (for spark.sql use)."""
    for name in TABLES:
        load_table(spark, sf_dir, name).createOrReplaceTempView(name)
