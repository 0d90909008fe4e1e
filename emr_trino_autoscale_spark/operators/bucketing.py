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
