"""Bucketing: the join over two same-bucketed tables must plan with no
Exchange (the whole point — shuffle paid at write time, not per join)."""

from __future__ import annotations

import io
from contextlib import redirect_stdout

from pyspark.sql import functions as F

from emr_trino_autoscale_spark.operators import bucketing


def plan_of(df) -> str:
    buf = io.StringIO()
    with redirect_stdout(buf):
        df.explain()
    return buf.getvalue()


def test_bucketed_join_has_no_exchange(spark, tmp_path):
    # (warehouse dir is a static conf — managed tables land in the
    # session default ./spark-warehouse, dropped in the finally)
    # disable auto-broadcast so the test exercises the shuffle path the
    # bucketing is supposed to eliminate
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        left = spark.range(10_000).select(
            F.col("id").alias("k"), (F.col("id") * 2).alias("a")
        )
        right = spark.range(10_000).select(
            F.col("id").alias("k"), (F.col("id") * 3).alias("b")
        )
        bucketing.write_bucketed(left, "t_left", "k", 8, sort_col="k")
        bucketing.write_bucketed(right, "t_right", "k", 8, sort_col="k")

        joined = bucketing.bucketed_join(spark, "t_left", "t_right", "k")
        plan = plan_of(joined)
        assert "Exchange" not in plan, plan
        assert "SortMergeJoin" in plan, plan
        assert joined.count() == 10_000

        # control: the same join over unbucketed frames DOES shuffle
        control = plan_of(left.join(right, "k"))
        assert "Exchange" in control
    finally:
        spark.conf.set(
            "spark.sql.autoBroadcastJoinThreshold", str(64 * 1024 * 1024)
        )
        spark.sql("DROP TABLE IF EXISTS t_left")
        spark.sql("DROP TABLE IF EXISTS t_right")
