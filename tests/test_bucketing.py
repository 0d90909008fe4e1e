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


def test_zorder_cells_bound_both_dimensions(spark):
    """X59: within each coarse Z cell, BOTH dimensions must be bounded
    to their quadrant (the file-skipping property a 1-D sort lacks) —
    cell 0 of a 2-bit split is exactly the (x < 2^15, y < 2^15)
    quadrant; and the Z map must be a bijection on a small grid."""
    from pyspark.sql import functions as F

    from emr_trino_autoscale_spark.operators import bucketing

    grid = spark.range(64 * 64).select(
        (F.col("id") % 64 * 1024).alias("x"),
        (F.floor(F.col("id") / 64) * 1024).alias("y"),
    )
    audit = {
        r["cell"]: r
        for r in bucketing.zorder_layout_audit(
            grid, F.col("x"), F.col("y"), bits=16, n_cells=4
        ).collect()
    }
    assert set(audit) == {0, 1, 2, 3}
    half = 1 << 15
    assert audit[0]["x_max"] < half and audit[0]["y_max"] < half
    assert audit[1]["x_min"] >= half and audit[1]["y_max"] < half   # y-bit is the higher interleave
    assert audit[2]["x_max"] < half and audit[2]["y_min"] >= half
    assert audit[3]["x_min"] >= half and audit[3]["y_min"] >= half
    # bijectivity on the grid: distinct z per distinct (x, y)
    z = grid.select(
        bucketing.zorder_value(F.col("x"), F.col("y")).alias("z")
    )
    assert z.distinct().count() == 64 * 64
