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


def write_compacted(
    df: DataFrame,
    path: str,
    target_file_mb: int = 256,
    sample_rows: int = 2_000,
    mode: str = "overwrite",
    partition_by: tuple[str, ...] = (),
) -> int:
    """Size-aware parquet writer: choose the output file count so files
    land near ``target_file_mb`` instead of inheriting the shuffle
    partition count. The small-files problem is THE operational failure
    mode of a 100 TB pipeline — a 32k-partition shuffle writing a 1 GB
    result produces 32k ~32 KB files, and every downstream scan then
    pays per-file open/footer costs that dwarf the data.

    Sizing: a bounded ``limit(sample_rows)`` sample is written through
    the in-memory parquet writer (pyarrow) to measure ENCODED bytes/row
    (schema-aware: compression + dictionary effects included — a
    driver-side schema guess would be off by the compression ratio).
    The row count comes from ``df.count()`` — one extra action, map-side
    only. Output count = ceil(est_bytes / target); the repartition is a
    round-robin exchange so files are even-sized.

    When ``partition_by`` is set, rows are first CO-LOCATED by
    (partition tuple, bounded salt) before the partitioned write.
    Without that exchange, every upstream task containing a partition
    value writes its own file into that directory — 1000 tasks x 50
    partition values = 50k shards, the exact small-files failure this
    writer exists to prevent (round-11 fix; the release-gate write leg
    pins landed file counts against the layout audit's estimates). The
    salt bound is the per-partition planned file count
    ceil(rows_p / rows_per_file) — a map-side-combinable count agg
    broadcast back onto the rows (null-safe join: NULL partition
    values land in their own directory) — so hot partitions fan out
    across that many writer tasks instead of serializing on one
    straggler, and `maxRecordsPerFile` stays as the cap when salt
    buckets collide on a task. The broadcast is #distinct-partition-
    tuples rows — bounded by definition of a sane partitioned layout.

    Returns the file count it asked for (global estimate, or the sum
    of per-partition planned counts when ``partition_by`` is set —
    callers log it against what landed). Citation: reference writes no
    data files (control loop only) — this is engine-side operational
    surface.
    """
    import io as _io
    import math

    import pyarrow as pa
    import pyarrow.parquet as papq

    n_rows = df.count()
    if n_rows == 0:
        df.limit(0).write.mode(mode).parquet(path)
        return 0
    sample = df.limit(min(sample_rows, n_rows)).toArrow()
    buf = _io.BytesIO()
    papq.write_table(pa.table(sample), buf, compression="snappy")
    bytes_per_row = max(buf.getbuffer().nbytes / max(sample.num_rows, 1), 1.0)
    est_bytes = bytes_per_row * n_rows
    n_files = max(1, math.ceil(est_bytes / (target_file_mb * (1 << 20))))
    rows_per_file = max(1, math.ceil(n_rows / n_files))
    if partition_by:
        # ONE aggregation scan: collect the bounded per-partition plan
        # (#distinct partition tuples rows) and rebuild it as a
        # driver-local frame for the broadcast — re-joining the live
        # aggregate would re-scan the input a second time under the
        # write (round-11 review finding).
        plan_rows = (
            df.groupBy(*partition_by)
            .agg(F.count("*").alias("__n_rows_p"))
            .select(
                *partition_by,
                F.greatest(
                    F.ceil(F.col("__n_rows_p") / float(rows_per_file)),
                    F.lit(1),
                )
                .cast("int")
                .alias("__n_files_p"),
            )
            .collect()
        )
        planned = sum(r["__n_files_p"] for r in plan_rows)
        spark = df.sparkSession
        per_files = spark.createDataFrame(
            plan_rows,
            df.select(*partition_by).schema.add("__n_files_p", "integer"),
        )
        d, p = df.alias("__d"), F.broadcast(per_files).alias("__p")
        salted = d.join(
            p,
            [
                F.col(f"__d.{c}").eqNullSafe(F.col(f"__p.{c}"))
                for c in partition_by
            ],
        ).select("__d.*", F.col("__p.__n_files_p").alias("__n_files_p"))
        # Salt = content hash + the upstream partition id. Content
        # alone would send byte-identical duplicate rows (a pre-dedup
        # web corpus's hottest case) to ONE bucket and re-serialize
        # the straggler; the partition-id term spreads duplicates
        # across upstream splits while staying deterministic under
        # task retry (same split -> same id -> same routing, unlike a
        # rand() salt, which breaks the fetch-retry consistency that
        # plain repartition(n) gets via its round-robin sort).
        salt = F.pmod(
            F.xxhash64(
                *[F.col(c) for c in df.columns], F.spark_partition_id()
            ),
            F.col("__n_files_p"),
        ).cast("int")
        (
            salted.withColumn("__salt", salt)
            .repartition(*[F.col(c) for c in partition_by], F.col("__salt"))
            .drop("__n_files_p", "__salt")
            .write.mode(mode)
            .option("maxRecordsPerFile", rows_per_file)
            .partitionBy(*partition_by)
            .parquet(path)
        )
        return int(planned)
    df.repartition(n_files).write.mode(mode).option(
        "maxRecordsPerFile", rows_per_file
    ).parquet(path)
    return n_files


def load_evolving(
    spark: SparkSession,
    paths,
    target_schema,
    defaults: dict | None = None,
) -> DataFrame:
    """Schema-evolution-tolerant parquet reader: read each snapshot
    (file group) with ITS OWN footer schema, project every one onto
    ``target_schema``, and union — columns missing from older snapshots
    surface as NULL (or a caller default), drifted numeric types cast to
    the target, unknown columns drop. The ingest reality of a
    long-lived corpus: five years of crawl snapshots never share one
    schema, and the engine must read them as one table without a
    rewrite. Per-snapshot projection is deliberate — Spark's
    ``mergeSchema`` refuses type widening (INT32 vs INT64 footers
    fail), while a per-group cast handles it and keeps each group's
    scan pushdown-capable on its untouched columns.

    ``paths``: list of snapshot directories, or one parent directory
    whose immediate subdirectories are the snapshots (falls back to
    reading the directory itself when it has no subdirectories).
    ``target_schema``: StructType or DDL string ("id long, text string").

    Casts are projections ABOVE each scan: a filter on a drifted column
    loses row-group skipping for exactly the snapshots that drifted
    (unavoidable without rewriting them — and the point of this reader
    is not rewriting).
    """
    import os

    from functools import reduce

    from pyspark.sql.types import StructType

    ensure_runtime_confs(spark)
    if isinstance(target_schema, str):
        target_schema = StructType.fromDDL(target_schema)
    defaults = defaults or {}
    if isinstance(paths, str):
        subs = sorted(
            os.path.join(paths, d)
            for d in os.listdir(paths)
            if os.path.isdir(os.path.join(paths, d))
        )
        paths = subs if subs else [paths]

    def project(df: DataFrame) -> DataFrame:
        have = {f.name: f for f in df.schema.fields}
        cols = []
        for f in target_schema.fields:
            if f.name in have:
                src = F.col(f.name)
                if have[f.name].dataType != f.dataType:
                    src = src.cast(f.dataType)
                cols.append(src.alias(f.name))
            elif f.name in defaults:
                cols.append(F.lit(defaults[f.name]).cast(f.dataType).alias(f.name))
            else:
                cols.append(F.lit(None).cast(f.dataType).alias(f.name))
        return df.select(*cols)

    parts = [project(spark.read.parquet(p)) for p in paths]
    return reduce(lambda a, b: a.unionByName(b), parts)


# ---------------------------------------------------------------------------
# Raw-corpus ingest (round 10): a real 100 TB pipeline does not start
# from parquet — it starts from JSONL/CSV shards (usually .gz). These
# readers are the ingest edge of the engine; write_compacted is the
# landing step that turns them into the parquet the query tier reads.

DOCUMENTS_SCHEMA = (
    "doc_id long, text string, lang string, source string, n_chars long"
)


def read_documents_jsonl(
    spark: SparkSession,
    path: str,
    schema: str = DOCUMENTS_SCHEMA,
    mode: str = "PERMISSIVE",
) -> DataFrame:
    """Newline-delimited JSON corpus shards -> the documents schema.

    Scale contract:
    - EXPLICIT schema, never inference — `spark.read.json` without a
      schema scans the whole input once just to infer, doubling the
      read at 100 TB (and inferring differently per shard batch).
    - ``mode="PERMISSIVE"`` + ``_corrupt_record``: a malformed line
      lands as a row with all data columns NULL and the raw line
      captured, so one bad shard can't abort the job and the quarantine
      split is a plain filter (:func:`split_corrupt`). DROPMALFORMED /
      FAILFAST pass through for callers that want them.
    - Compression is by file extension (.gz/.zst/...) via Spark's
      codec machinery; gzip shards are NOT splittable — at 100 TB keep
      shards ~256 MB so per-file parallelism is the file count.
    """
    reader = (
        spark.read.schema(schema + ", _corrupt_record string")
        .option("mode", mode)
        .option("columnNameOfCorruptRecord", "_corrupt_record")
    )
    return reader.json(path)


def read_documents_csv(
    spark: SparkSession,
    path: str,
    schema: str = DOCUMENTS_SCHEMA,
    mode: str = "PERMISSIVE",
    header: bool = True,
) -> DataFrame:
    """CSV corpus shards -> the documents schema. Same explicit-schema
    + corrupt-record contract as :func:`read_documents_jsonl`;
    multiline quoted fields enabled because document text contains
    newlines (multiline CSV parses per-file, another reason shards
    must stay ~256 MB)."""
    return (
        spark.read.schema(schema + ", _corrupt_record string")
        .option("mode", mode)
        .option("columnNameOfCorruptRecord", "_corrupt_record")
        .option("header", str(header).lower())
        .option("multiLine", "true")
        .option("escape", '"')
        .csv(path)
    )


def split_corrupt(df: DataFrame) -> tuple[DataFrame, DataFrame]:
    """(clean, quarantine) split of a PERMISSIVE read: clean rows drop
    the capture column; quarantine keeps the FULL row (all-NULL data
    columns + the raw line) for the re-ingest/debug path. One filter
    each — no extra scan beyond what the caller materializes.

    The quarantine frame deliberately keeps the data columns: Spark
    refuses plans over raw JSON/CSV whose required schema is ONLY the
    internal corrupt-record column (UNSUPPORTED_FEATURE.QUERY_ONLY_
    CORRUPT_RECORD_COLUMN) — project it down only after a persist or a
    parquet landing."""
    clean = df.filter(F.col("_corrupt_record").isNull()).drop("_corrupt_record")
    bad = df.filter(F.col("_corrupt_record").isNotNull())
    return clean, bad


def ingest_documents(
    spark: SparkSession,
    src_path: str,
    dest_path: str,
    fmt: str = "jsonl",
    target_file_mb: int = 256,
) -> dict:
    """The JSONL/CSV -> parquet landing stage: explicit-schema read,
    corrupt-line quarantine, canonicalization (n_chars recomputed from
    the text so upstream lies don't propagate; md5 digest added for
    the dedup tier), and a size-aware compacted parquet write. The
    quarantine LANDS too (``dest_path + "_quarantine"``, the FULL
    permissive row: all-NULL data columns plus the raw line in
    ``_corrupt_record`` — see :func:`split_corrupt` for why the data
    columns stay) — both because an ingest job keeps its rejects for re-ingest
    and because counting corrupt rows straight off the raw scan is the
    exact plan Spark's QUERY_ONLY_CORRUPT_RECORD_COLUMN restriction
    forbids; counts come from the landed files. Returns {"n_clean",
    "n_corrupt", "n_files"} — the numbers an ingest job logs."""
    from pyspark import StorageLevel

    raw = (
        read_documents_jsonl(spark, src_path)
        if fmt == "jsonl"
        else read_documents_csv(spark, src_path)
    )
    # Persist the PARSED frame (Spark's own prescription for the
    # corrupt-record restriction: pruned plans like the sizing count
    # otherwise reference only _corrupt_record and are refused). It is
    # also the right call at scale: gzip shards are not splittable, so
    # without the persist the quarantine write, sizing count, and
    # landing write would each re-decompress every shard. DISK-backed
    # so a 100 TB ingest spills instead of evicting.
    raw = raw.persist(StorageLevel.MEMORY_AND_DISK)
    clean, bad = split_corrupt(raw)
    canon = clean.withColumn(
        "n_chars", F.length(F.coalesce(F.col("text"), F.lit(""))).cast("long")
    ).withColumn("digest", F.md5(F.coalesce(F.col("text"), F.lit("\x00"))))
    bad.write.mode("overwrite").parquet(dest_path + "_quarantine")
    n_corrupt = (
        spark.read.parquet(dest_path + "_quarantine")
        .select("_corrupt_record")
        .count()
    )
    n_files = write_compacted(canon, dest_path, target_file_mb=target_file_mb)
    raw.unpersist(blocking=False)
    n_clean = spark.read.parquet(dest_path).count()
    return {"n_clean": n_clean, "n_corrupt": n_corrupt, "n_files": n_files}
