"""Skew utilities: salted aggregation / join equivalence with the
unsalted plans (same results, redistributed work)."""

from __future__ import annotations

from pyspark.sql import functions as F

from emr_trino_autoscale_spark.operators import skew


def test_salted_agg_matches_plain(spark):
    # one hot key (90% of rows) + a tail
    df = spark.range(10_000).select(
        F.when(F.col("id") % 10 < 9, F.lit("hot")).otherwise(F.lit("cold")).alias("k"),
        F.col("id").alias("v"),
    )
    plain = {
        r["k"]: (r["n"], r["s"], r["mx"])
        for r in df.groupBy("k")
        .agg(F.count("v").alias("n"), F.sum("v").alias("s"), F.max("v").alias("mx"))
        .collect()
    }
    salted = {
        r["k"]: (r["n"], r["s"], r["mx"])
        for r in skew.salted_agg(
            df,
            ["k"],
            {"n": ("count", "v"), "s": ("sum", "v"), "mx": ("max", "v")},
            salt_buckets=8,
        ).collect()
    }
    assert plain == salted


def test_salted_join_matches_plain(spark):
    fact = spark.range(5_000).select(
        (F.col("id") % 5).alias("k"), F.col("id").alias("v")
    )
    dim = spark.createDataFrame(
        [(i, f"name{i}") for i in range(5)], "k long, name string"
    )
    plain = sorted(
        (r["k"], r["v"], r["name"]) for r in fact.join(dim, "k").collect()
    )
    salted = sorted(
        (r["k"], r["v"], r["name"])
        for r in skew.salted_join(fact, dim, "k", salt_buckets=4).collect()
    )
    assert plain == salted and len(plain) == 5_000


def test_salted_agg_rejects_unmergeable(spark):
    df = spark.range(10).select(F.lit("k").alias("k"), F.col("id").alias("v"))
    try:
        skew.salted_agg(df, ["k"], {"a": ("avg", "v")})
        raise AssertionError("expected ValueError")
    except ValueError:
        pass
