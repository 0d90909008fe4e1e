"""Graph propagation operators.

X7's connected components (operators/dedup.py) covers the dedup-graph
use; this module holds the rank-propagation family a training-data
pipeline uses for source/entity authority weighting (e.g. weighting a
crawl frontier or entity table by link authority before sampling).
Public algorithms only: PageRank (Brin/Page 1998), power iteration
with damping and uniform dangling-mass redistribution.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def pagerank(
    edges: DataFrame,
    src_col: str = "src",
    dst_col: str = "dst",
    iterations: int = 3,
    damping: float = 0.85,
    persist_fn=None,
) -> DataFrame:
    """X114 — fixed-iteration PageRank by power iteration: rank flows
    along DISTINCT directed edges, each node splitting its rank evenly
    over its out-edges; dangling nodes (no out-edges) redistribute
    their whole mass uniformly; every node gets the ``(1 - damping)/N``
    teleport floor. ``iterations`` is FIXED (not convergence-tested) so
    the result is a deterministic, oracle-checkable function of the
    edge set — the driver contract; production tuning raises the count.

    Returns (node, rank) over all edge endpoints, sum(rank) == 1.

    Scale: the per-iteration work is one equi-join of the edge frame
    with the node-cardinality rank frame (shuffle on src) and one
    groupBy(dst) hash agg — the canonical Pregel-as-relational-ops
    shape; the dangling and teleport terms are 1-row broadcasts. Each
    iteration ends in a NON-EAGER ``localCheckpoint`` (the X7
    connected-components precedent, operators/dedup.py) so iteration
    k+1's two reads of rank_k (contribution join + dangling sum) replay
    the lineage once, not 2^k times, and the plan never outgrows the
    optimizer. Skew axis: a celebrity dst key concentrates the agg —
    partial aggregation (map-side combine) absorbs it since the
    combine is a plain SUM; no salting needed.
    """
    e = edges.select(
        F.col(src_col).alias("src"), F.col(dst_col).alias("dst")
    ).distinct()
    # e feeds nodes (twice), outdeg and every iteration's contribution
    # join — persist once (caller-owned persist_fn convention).
    if persist_fn is None:
        from pyspark import StorageLevel

        e = e.persist(StorageLevel.MEMORY_AND_DISK)
    else:
        e = persist_fn(e)
    nodes = (
        e.select(F.col("src").alias("node"))
        .unionByName(e.select(F.col("dst").alias("node")))
        .distinct()
    )
    outdeg = e.groupBy(F.col("src").alias("node")).agg(
        F.count("*").alias("__deg")
    )
    base = nodes.join(outdeg, "node", "left")
    # 1-row N broadcast (sanctioned bounded nested loop)
    n_row = nodes.agg(F.count("*").cast("double").alias("__n"))
    ranks = base.crossJoin(F.broadcast(n_row)).select(
        "node", "__deg", "__n", (F.lit(1.0) / F.col("__n")).alias("rank")
    )
    for _ in range(iterations):
        ranks = ranks.localCheckpoint(eager=False)
        contrib = (
            e.join(ranks.select(F.col("node").alias("src"), "__deg", "rank"), "src")
            .groupBy(F.col("dst").alias("node"))
            .agg(F.sum(F.col("rank") / F.col("__deg")).alias("__in"))
        )
        dangling = ranks.filter(F.col("__deg").isNull()).agg(
            F.coalesce(F.sum("rank"), F.lit(0.0)).alias("__dm")
        )
        ranks = (
            ranks.select("node", "__deg", "__n")
            .join(contrib, "node", "left")
            .crossJoin(F.broadcast(dangling))
            .select(
                "node",
                "__deg",
                "__n",
                (
                    (F.lit(1.0) - F.lit(damping)) / F.col("__n")
                    + F.lit(damping)
                    * (
                        F.coalesce(F.col("__in"), F.lit(0.0))
                        + F.col("__dm") / F.col("__n")
                    )
                ).alias("rank"),
            )
        )
    return ranks.select("node", "rank")
