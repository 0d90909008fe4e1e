"""Bucketed-table helpers: pre-shuffled storage for co-located joins.

At the 100 TB design point the dominant cost of a fact-fact join is the
shuffle of both sides. Writing the tables bucketed on the join key (same
bucket count, same key) lets Spark plan a SortMergeJoin with NO Exchange
on either side — the shuffle is paid once at write time and amortized
over every subsequent join/aggregation on that key.

Bucket-count guidance: ~(table size / 128 MB) rounded to a power of two
shared across the tables that join; too few buckets bounds parallelism,
too many makes small files.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession


def write_bucketed(
    df: DataFrame,
    table: str,
    bucket_col: str,
    n_buckets: int,
    sort_col: str | None = None,
) -> None:
    """Persist as a bucketed (and optionally sort-within-bucket) managed
    table. Sorting by the join key at write time additionally removes
    the Sort from later SortMergeJoins."""
    w = df.write.mode("overwrite").bucketBy(n_buckets, bucket_col)
    if sort_col is not None:
        w = w.sortBy(sort_col)
    w.saveAsTable(table)


def bucketed_join(
    spark: SparkSession, left_table: str, right_table: str, on: str, how: str = "inner"
) -> DataFrame:
    """Join two same-bucketed tables on their bucket key. With matching
    bucket specs Catalyst elides both Exchanges (verify with
    ``.explain`` — tests assert it)."""
    return spark.table(left_table).join(spark.table(right_table), on, how)


def zorder_value(x, y, bits: int = 16):
    """X59 — Morton/Z-order interleaving of two ``bits``-bit integer
    keys into one locality-preserving sort key (public lakehouse layout
    technique — Delta/Iceberg OPTIMIZE ZORDER): sorting or
    range-partitioning by the Z value clusters rows that are close in
    BOTH dimensions into the same files, so min/max file statistics
    prune scans filtered on EITHER column — a single-column sort only
    ever prunes its own column.

    Pure codegen bit arithmetic (2*bits shift/and/multiply terms, no
    UDF); replayable in any engine with integer shifts, which is what
    lets the oracle verify the exact layout assignment.
    """
    from pyspark.sql import functions as F

    xc = x.cast("long")
    yc = y.cast("long")
    z = F.lit(0).cast("long")
    for i in range(bits):
        z = (
            z
            + F.shiftright(xc, i).bitwiseAND(F.lit(1)) * F.lit(1 << (2 * i))
            + F.shiftright(yc, i).bitwiseAND(F.lit(1)) * F.lit(1 << (2 * i + 1))
        )
    return z


def zorder_layout_audit(
    df: DataFrame,
    x,
    y,
    bits: int = 16,
    n_cells: int = 16,
) -> DataFrame:
    """X59 — layout audit for a Z-ordered write: assign each row to its
    coarse Z cell (top log2(n_cells) bits — the file a range-partitioned
    writer would put it in) and report per-cell row counts plus the
    min/max of BOTH source dimensions. The per-cell dimension bounds ARE
    the point: they are exactly the parquet footer min/max stats a
    reader's filter would prune on, so the audit shows (and the oracle
    verifies) that every cell bounds x AND y simultaneously.

    Scale: one narrow Z projection + one hash agg on the cell id.
    """
    from pyspark.sql import functions as F

    shift = 2 * bits - max(n_cells - 1, 1).bit_length()
    z = zorder_value(x, y, bits)
    return (
        df.withColumn("__z", z)
        .withColumn("cell", F.shiftright(F.col("__z"), shift).cast("int"))
        .groupBy("cell")
        .agg(
            F.count("*").cast("bigint").alias("n_rows"),
            F.min("__z").alias("z_min"),
            F.max("__z").alias("z_max"),
            F.min(x.cast("long")).alias("x_min"),
            F.max(x.cast("long")).alias("x_max"),
            F.min(y.cast("long")).alias("y_min"),
            F.max(y.cast("long")).alias("y_max"),
        )
    )


def partition_layout_audit(
    df: DataFrame,
    partition_cols,
    size_expr,
    target_file_bytes: int = 128 * 1024 * 1024,
) -> DataFrame:
    """X153 — small-file / partition-skew audit for a planned
    partitioned write: per partition tuple, the row count, estimated
    bytes (caller-supplied row-size expression — e.g. text lengths +
    fixed column overhead), the file count a ``target_file_bytes``
    writer would produce, and the two failure flags every 100 TB lake
    job reviews before committing a layout: ``is_small`` (the whole
    partition is under half a target file — the small-file problem)
    and ``is_skewed`` (over 8x the mean partition size — the straggler
    problem). ONE hash agg; the mean enters as a 1-row frame.

    This is the planning-side complement to the Z-order cell audit
    (X59): that one checks pruning quality, this one checks file
    geometry.
    """
    from pyspark.sql import functions as F

    per = df.groupBy(*partition_cols).agg(
        F.count("*").cast("bigint").alias("n_rows"),
        F.sum(size_expr).cast("bigint").alias("est_bytes"),
    )
    tot = per.agg(F.avg("est_bytes").alias("__mean"))
    return (
        per.crossJoin(F.broadcast(tot))
        .select(
            *partition_cols,
            "n_rows",
            "est_bytes",
            F.greatest(
                F.ceil(F.col("est_bytes") / F.lit(float(target_file_bytes))),
                F.lit(1),
            ).cast("bigint").alias("n_files"),
            (F.col("est_bytes") < target_file_bytes / 2).alias("is_small"),
            (F.col("est_bytes") > 8.0 * F.col("__mean")).alias("is_skewed"),
        )
    )
