"""Skew-handling utilities for hot-key aggregations and joins.

AQE (``spark.sql.adaptive.skewJoin``) is the first line of defense and
is on by default in `session.get_spark`; these helpers cover the cases
AQE cannot fix at the 100 TB design point:

* a grouped aggregation whose single hottest key exceeds one task's
  memory (AQE splits skewed *join* partitions, not agg groups);
* a shuffle join against a dimension too big to broadcast whole, where
  a handful of fact-side keys dominate.

Both are pure plan rewrites — no sampling services, no state. Salting
factor is explicit: callers size it from known key skew (e.g. the
boilerplate-shingle document frequency in dedup, or a celebrity user in
events).
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def salted_agg(
    df: DataFrame,
    keys: Sequence[str],
    aggs: dict[str, tuple[str, str]],
    salt_buckets: int = 32,
    salt_on: Column | None = None,
) -> DataFrame:
    """Two-phase grouped aggregation: partial-aggregate on
    (keys + salt), then merge per key. Turns one giant reduce group into
    ``salt_buckets`` parallel partials — the classic fix when a single
    key carries an unbounded share of rows.

    ``aggs`` maps output column -> (function, input column) where
    function is one of sum/count/min/max (the mergeable family; avg is
    sum+count composed by the caller).

    Spark already performs map-side partial aggregation for these
    functions, which handles *moderate* skew; explicit salting matters
    when a hot key's partials still concentrate on one reducer (high
    cardinality of distinct values under the hot key, or
    ``spark.sql.shuffle.partitions`` collisions).
    """
    merge_fn = {"sum": F.sum, "count": F.sum, "min": F.min, "max": F.max}
    part_fn = {"sum": F.sum, "count": F.count, "min": F.min, "max": F.max}
    for out, (fn, _col) in aggs.items():
        if fn not in part_fn:
            raise ValueError(f"{out}: unmergeable agg {fn!r}")

    # pmod, not %: Spark's % keeps the dividend's sign, so a hashed
    # salt_on (e.g. xxhash64) would spread over 2*salt_buckets-1 uneven
    # partials instead of the documented salt_buckets.
    salt = F.pmod(
        salt_on if salt_on is not None else F.spark_partition_id(), F.lit(salt_buckets)
    )
    partial = (
        df.withColumn("__salt", salt)
        .groupBy(*keys, "__salt")
        .agg(
            *[
                part_fn[fn](c).alias(f"__p_{out}")
                for out, (fn, c) in aggs.items()
            ]
        )
    )
    return partial.groupBy(*keys).agg(
        *[
            merge_fn[fn](f"__p_{out}").alias(out)
            for out, (fn, _c) in aggs.items()
        ]
    )


def salted_join(
    fact: DataFrame,
    dim: DataFrame,
    on: str,
    salt_buckets: int = 8,
    how: str = "inner",
) -> DataFrame:
    """Skew-resilient equi join: salt the fact side with a random-ish
    bucket derived from its row content, replicate the dimension side
    ``salt_buckets`` times, join on (key, salt). The hot fact key now
    spreads over ``salt_buckets`` reducers at the cost of a
    ``salt_buckets``x dimension replication (choose it so the replicated
    dim still shuffles cheaply).

    The salt must be deterministic per fact row (replay/retry safety) —
    derived from a hash of all fact columns, not rand().
    """
    fact_cols = fact.columns
    f_salt = F.pmod(F.xxhash64(*[F.col(c) for c in fact_cols]), F.lit(salt_buckets))
    salted_fact = fact.withColumn("__salt", f_salt.cast("int"))
    replicated_dim = dim.withColumn(
        "__salt", F.explode(F.sequence(F.lit(0), F.lit(salt_buckets - 1)))
    )
    out = salted_fact.join(replicated_dim, on=[on, "__salt"], how=how)
    return out.drop("__salt")
