"""Windowed metric store — the reference's only tested component.

Re-expresses ``metrics/MetricStore.scala`` + ``utils/FixedList.scala``
as declarative window/aggregate plans over a long-form metric table
``(tick, node, value)``:

* ring buffer of the last ``max_points`` snapshots (FixedList.scala:12-15,
  capacity Config.scala:96-98)              -> keep last-N distinct ticks
* zero-fill: a node absent from a stored snapshot contributes 0.0 to its
  series (MetricStore.scala:21, ``getOrElse(node, 0)``)  -> tick x node
  scaffold LEFT JOIN values, COALESCE 0
* min-support: series shorter than ``one_min_points`` are dropped
  (MetricStore.scala:20-23); with zero-fill every node's series length
  equals the buffer depth, so this degenerates to the cold-start gate —
  semantics preserved exactly
* 1-minute average: mean of the last ``one_min_points`` points per node
  (MetricStore.scala:36-39)
* quorum predicates keyed by ``getNodesList``: the averages map is keyed
  by the *last snapshot's* node list (MetricStore.scala:49-53), so both
  the breach numerator and the denominator draw from that list — a node
  seen earlier in the buffer but absent from the newest snapshot neither
  breaches nor counts (MetricStore.scala:62-66; 29-33). The remaining
  population mismatch, preserved verbatim: the numerator additionally
  applies min-support filtering, the denominator does not.

Scale notes: the scaffold cross join is |ticks| x |nodes| (bounded:
ticks <= buffer depth); node dimension is broadcast. The per-node
window aggregation shuffles once on ``node`` and AQE handles skew.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

MAX_POINTS = 20  # Config.scala:96-98 — 5 min @ 15 s
ONE_MIN_POINTS = 4  # Config.scala:99


def last_n_ticks(df: DataFrame, tick_col: str = "tick", n: int = MAX_POINTS) -> DataFrame:
    """Ring-buffer eviction (W1): keep rows of the newest ``n`` distinct ticks."""
    ticks = (
        df.select(tick_col).distinct()
        .withColumn("__rn", F.row_number().over(Window.orderBy(F.col(tick_col).desc())))
        .filter(F.col("__rn") <= n)
        .drop("__rn")
    )
    return df.join(F.broadcast(ticks), tick_col, "inner")


def zero_fill(
    df: DataFrame,
    tick_col: str = "tick",
    node_col: str = "node",
    value_col: str = "value",
) -> DataFrame:
    """P10: scaffold every (tick, node) pair; missing observations -> 0.0.

    Mirrors ``RawMetricStore.map(d => d.getOrElse(node, 0))``
    (MetricStore.scala:21): every stored snapshot contributes a point
    for every node, zero when the node was absent. Input must be unique
    per (tick, node) — one observation per node per snapshot, exactly
    like the reference's ``Map[String, Double]`` per tick.
    """
    ticks = df.select(tick_col).distinct()
    nodes = df.select(node_col).distinct()
    scaffold = ticks.crossJoin(F.broadcast(nodes))
    return scaffold.join(df, [tick_col, node_col], "left").select(
        tick_col, node_col, F.coalesce(F.col(value_col), F.lit(0.0)).alias(value_col)
    )


def last_n_per_node(
    df: DataFrame,
    n: int = ONE_MIN_POINTS,
    tick_col: str = "tick",
    node_col: str = "node",
) -> DataFrame:
    """W2/L2: ``takeRight(n)`` of each node's series (MetricStore.scala:39)."""
    w = Window.partitionBy(node_col).orderBy(F.col(tick_col).desc())
    return (
        df.withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") <= n)
        .drop("__rn")
    )


def one_minute_avg(
    df: DataFrame,
    tick_col: str = "tick",
    node_col: str = "node",
    value_col: str = "value",
    min_points: int = ONE_MIN_POINTS,
    n: int = ONE_MIN_POINTS,
) -> DataFrame:
    """A1-A3: per-node mean of the last ``n`` points, requiring at least
    ``min_points`` points in the series (MetricStore.scala:20-26,36-39).
    """
    return (
        last_n_per_node(df, n=n, tick_col=tick_col, node_col=node_col)
        .groupBy(node_col)
        .agg(F.avg(value_col).alias("avg_value"), F.count("*").alias("n_points"))
        .filter(F.col("n_points") >= min_points)
    )


def filled_last_n_avg(
    df: DataFrame,
    tick_col: str = "tick",
    node_col: str = "node",
    value_col: str = "value",
    n: int = ONE_MIN_POINTS,
    min_points: int = ONE_MIN_POINTS,
) -> DataFrame:
    """A1-A3 over the zero-filled series WITHOUT materializing the
    scaffold — algebraically identical to
    ``one_minute_avg(zero_fill(df))``:

    with zero-fill every node has exactly one point per buffered tick,
    so the per-node last-``n`` mean is ``sum(values present in the last
    n ticks) / n`` (adding 0.0 terms is exact in IEEE 754), and the
    min-support gate degenerates to the global ``#ticks >= min_points``
    cold-start gate (MetricStore.scala:20-26,36-39 — same contract as
    :func:`one_minute_avg`, same reference lines).

    Scale: one semi join against the <= ``n``-row tick dimension + one
    per-node partial-aggregated sum — no |ticks| x |nodes| scaffold, no
    per-node ranking window, and ~3x fewer scans of ``df`` than the
    compositional form. The sparse frame is scanned twice (last-n sums
    + the node dimension); cache it when it isn't already.
    """
    last_ticks = (
        df.select(tick_col).distinct()
        .withColumn("__rn", F.row_number().over(Window.orderBy(F.col(tick_col).desc())))
        .filter(F.col("__rn") <= n)
        .drop("__rn")
    )
    gate = last_ticks.agg(F.count("*").alias("__n_ticks"))
    sums = (
        df.join(F.broadcast(last_ticks), tick_col, "left_semi")
        .groupBy(node_col)
        .agg(F.sum(value_col).alias("__s"))
    )
    nodes = df.select(node_col).distinct()
    return (
        nodes.join(sums, node_col, "left")
        .crossJoin(F.broadcast(gate))
        .filter(F.col("__n_ticks") >= min_points)
        .select(
            node_col,
            # the filled series has one point per tick, so takeRight(n)
            # holds __n_ticks (= min(#ticks, n)) points — that is the
            # divisor AND the reported point count
            (F.coalesce(F.col("__s"), F.lit(0.0)) / F.col("__n_ticks")).alias(
                "avg_value"
            ),
            F.col("__n_ticks").cast("bigint").alias("n_points"),
        )
    )


def last_snapshot_nodes(
    df: DataFrame, tick_col: str = "tick", node_col: str = "node"
) -> DataFrame:
    """Denominator population: nodes present in the newest snapshot
    (``getNodesList`` — MetricStore.scala:29-33)."""
    last_tick = df.agg(F.max(tick_col).alias(tick_col))
    return df.join(F.broadcast(last_tick), tick_col, "left_semi").select(node_col).distinct()


def quorum(
    avg_df: DataFrame,
    denominator_df: DataFrame,
    fraction: float,
    threshold: float,
    between: tuple[float, float] | None = None,
    avg_col: str = "avg_value",
    node_col: str = "node",
) -> DataFrame:
    """A4-A6: one-row quorum verdict.

    ``breached`` counts nodes whose average ``>= threshold`` (or strictly
    between ``between``), restricted to nodes present in
    ``denominator_df`` — the reference keys the averages map by
    ``getNodesList`` (the last snapshot's node list), so a node absent
    from the newest snapshot cannot breach even if it still has buffered
    points (MetricStore.scala:49-53). Quorum holds when
    ``breached >= fraction * total`` with ``total`` = |denominator_df|.
    ``is_avg_lower`` is literally the negation of the greater-quorum
    (MetricStore.scala:75), not a symmetric lower-quorum.
    """
    if between is not None:
        lo, hi = between
        cond = (F.col(avg_col) > lo) & (F.col(avg_col) < hi)
    else:
        cond = F.col(avg_col) >= threshold
    num = avg_df.join(
        F.broadcast(denominator_df.select(node_col)), node_col, "left_semi"
    ).agg(F.sum(F.when(cond, 1).otherwise(0)).cast("bigint").alias("breached"))
    den = denominator_df.agg(F.count("*").cast("bigint").alias("total_nodes"))
    return (
        num.crossJoin(den)
        .withColumn("quorum", F.col("breached") >= F.col("total_nodes") * F.lit(fraction))
        .withColumn("is_avg_lower", ~F.col("quorum"))
    )


def last_value_per_node(
    df: DataFrame,
    tick_col: str = "tick",
    node_col: str = "node",
    value_col: str = "value",
) -> DataFrame:
    """A10: latest observation per node (``last`` — MetricStore.scala:14)."""
    return df.groupBy(node_col).agg(
        F.max(tick_col).alias(tick_col),
        F.max_by(value_col, tick_col).alias(value_col),
    )
