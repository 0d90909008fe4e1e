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


def test_two_phase_topk_matches_single_window(spark):
    from pyspark.sql import Window

    # 3 low-cardinality groups x 2000 rows, with score ties to exercise
    # the deterministic tie-break across bucket boundaries
    df = spark.range(6_000).select(
        (F.col("id") % 3).cast("string").alias("g"),
        F.col("id").alias("rid"),
        (F.col("id") % 50).alias("score"),
    )
    order = [F.col("score").desc(), F.col("rid").asc()]
    w = Window.partitionBy("g").orderBy(*order)
    single = sorted(
        (r["g"], r["rnk"], r["rid"])
        for r in df.withColumn("rnk", F.row_number().over(w).cast("int"))
        .filter(F.col("rnk") <= 7)
        .collect()
    )
    two = sorted(
        (r["g"], r["rnk"], r["rid"])
        for r in skew.two_phase_topk(
            df, ["g"], order, k=7, bucket_on=F.col("rid"), n_buckets=16
        ).collect()
    )
    assert single == two and len(two) == 21


def test_bucketed_prefix_sum_matches_window_cumsum(spark):
    from pyspark.sql import Window

    df = spark.range(5_000).select(
        (F.col("id") % 4).cast("string").alias("g"),
        F.col("id").alias("oid"),
        (F.col("id") % 17 + 1).alias("v"),
    )
    w = Window.partitionBy("g").orderBy("oid")
    single = sorted(
        (r["g"], r["oid"], r["cum"])
        for r in df.withColumn("cum", F.sum("v").over(w)).collect()
    )
    bucketed = sorted(
        (r["g"], r["oid"], r["cum"])
        for r in skew.bucketed_prefix_sum(
            df, ["g"], "oid", "v", bucket_width=128
        ).collect()
    )
    assert single == bucketed and len(bucketed) == 5_000


def test_two_phase_topk_property(spark):
    """Property check across adversarial shapes: tiny groups (< k rows),
    all-tied scores, k larger than any bucket, n_buckets=1 degenerate."""
    from pyspark.sql import Window
    import itertools

    shapes = [
        # (rows per group, n_groups, k, n_buckets, score_mod)
        (3, 2, 7, 16, 2),     # groups smaller than k
        (40, 1, 5, 64, 1),    # single group, ALL scores tied
        (25, 4, 5, 1, 5),     # degenerate single bucket
        (100, 3, 10, 8, 3),
    ]
    for rows, groups, k, buckets, mod in shapes:
        df = spark.range(rows * groups).select(
            (F.col("id") % groups).cast("string").alias("g"),
            F.col("id").alias("rid"),
            (F.col("id") % mod).alias("score"),
        )
        order = [F.col("score").desc(), F.col("rid").asc()]
        w = Window.partitionBy("g").orderBy(*order)
        single = sorted(
            (r["g"], r["rnk"], r["rid"])
            for r in df.withColumn("rnk", F.row_number().over(w).cast("int"))
            .filter(F.col("rnk") <= k)
            .collect()
        )
        two = sorted(
            (r["g"], r["rnk"], r["rid"])
            for r in skew.two_phase_topk(
                df, ["g"], order, k=k, bucket_on=F.col("rid"), n_buckets=buckets
            ).collect()
        )
        assert single == two, (rows, groups, k, buckets, mod)


def test_bucketed_prefix_sum_property(spark):
    """Sparse, negative-value, and bucket-boundary-straddling ids all
    reproduce the window cumsum exactly."""
    from pyspark.sql import Window

    cases = [
        # (id expr multiplier, value expr) — sparse ids straddle buckets
        (997, "id % 13 - 6"),     # negative values
        (1, "id % 7 + 1"),
        (1024, "id % 3"),          # ids exactly on bucket boundaries
    ]
    for mult, vexpr in cases:
        df = spark.range(2_000).select(
            (F.col("id") % 3).cast("string").alias("g"),
            (F.col("id") * mult).alias("oid"),
            F.expr(vexpr).alias("v"),
        )
        w = Window.partitionBy("g").orderBy("oid")
        single = sorted(
            (r["g"], r["oid"], r["cum"])
            for r in df.withColumn("cum", F.sum("v").over(w)).collect()
        )
        bucketed = sorted(
            (r["g"], r["oid"], r["cum"])
            for r in skew.bucketed_prefix_sum(
                df, ["g"], "oid", "v", bucket_width=512
            ).collect()
        )
        assert single == bucketed, (mult, vexpr)


def test_salted_agg_rejects_unmergeable(spark):
    df = spark.range(10).select(F.lit("k").alias("k"), F.col("id").alias("v"))
    try:
        skew.salted_agg(df, ["k"], {"a": ("avg", "v")})
        raise AssertionError("expected ValueError")
    except ValueError:
        pass


def test_scalable_ntile_matches_builtin(spark):
    """X88: the two-phase decomposed NTILE equals F.ntile row for row —
    including the n < k regime (every tile gets one row until rows run
    out), ties broken by the tiebreak column, and values straddling
    bucket boundaries."""
    import random

    from pyspark.sql import Window

    from emr_trino_autoscale_spark.operators import skew as sk

    rng = random.Random(88)
    rows = [
        (i, "g%d" % (i % 3), float(rng.randint(0, 300)))
        for i in range(500)
    ] + [(1000 + j, "tiny", float(j)) for j in range(4)]  # n=4 < k=10
    df = spark.createDataFrame(rows, "event_id long, event_type string, value double")
    got = {
        r["event_id"]: r["tile"]
        for r in sk.scalable_ntile(
            df, ["event_type"], "value", "event_id", n_tiles=10, bucket_width=25.0
        ).collect()
    }
    w = Window.partitionBy("event_type").orderBy(
        F.col("value").asc(), F.col("event_id").asc()
    )
    want = {
        r["event_id"]: r["t"]
        for r in df.withColumn("t", F.ntile(10).over(w).cast("int")).collect()
    }
    assert got == want
