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
