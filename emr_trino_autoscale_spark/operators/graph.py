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

from ._iterate import iterate_with_checkpoint
from ._persist import default_persist


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
    with the node-cardinality rank frame — contracted to (src, share)
    doubles before the join, §2.3 — and one groupBy(dst) hash agg: the
    canonical Pregel-as-relational-ops shape; the dangling and teleport
    terms are 1-row broadcasts. The planner picks the join side by
    size (locally the cached edge frame broadcasts; at scale both
    sides shuffle on src — if the edge frame outgrows every broadcast
    AND iterations are many, pre-partitioning e by src once would let
    every iteration reuse that exchange, a deliberate non-change here
    because the bench-scale plan broadcasts e and never shuffles it).
    Setup derives the node universe and out-degrees in ONE union +
    hash-agg pass over e (round 15 — previously nodes-distinct +
    outdeg-groupBy + left join: three exchanges and two extra edge
    passes for the same frame). Each iteration ends in a NON-EAGER
    ``localCheckpoint`` (the X7 connected-components precedent,
    operators/dedup.py) so iteration k+1's two reads of rank_k
    (contribution join + dangling sum) replay the lineage once, not
    2^k times, and the plan never outgrows the optimizer. Skew axis: a
    celebrity dst key concentrates the agg — partial aggregation
    (map-side combine) absorbs it since the combine is a plain SUM; no
    salting needed.
    """
    e = edges.select(
        F.col(src_col).alias("src"), F.col(dst_col).alias("dst")
    ).distinct()
    # e feeds the node/degree derivation and every iteration's
    # contribution join — persist once (caller-owned persist_fn
    # convention).
    if persist_fn is None:
        persist_fn = default_persist  # registered; released via release_default_persists
    e = persist_fn(e)
    # ONE edge pass derives the node universe AND the out-degrees
    # together (round 15, §2.1/§2.4): src occurrences count toward the
    # degree, dst occurrences only assert membership, so the old
    # [nodes union+distinct] + [outdeg groupBy] + [left join] — three
    # exchanges / two extra passes over e for the same frame — collapse
    # into one union+hash-agg. Values are identical: sum of the 1-tags
    # over a node's src rows == the old count(*) per src, and a
    # dst-only (dangling) node's 0 maps back to the NULL the left join
    # produced. base is node-sized (the rank state size) and feeds both
    # the N count and the rank init — persist through default_persist
    # (NOT the caller's scoped persist_fn, which would evict e).
    base = default_persist(
        e.select(F.col("src").alias("node"), F.lit(1).alias("__o"))
        .unionByName(e.select(F.col("dst").alias("node"), F.lit(0).alias("__o")))
        .groupBy("node")
        .agg(F.sum("__o").alias("__so"))
        .select(
            "node",
            F.when(F.col("__so") > 0, F.col("__so")).alias("__deg"),
        )
    )
    # 1-row N broadcast (sanctioned bounded nested loop)
    n_row = base.agg(F.count("*").cast("double").alias("__n"))
    ranks = base.crossJoin(F.broadcast(n_row)).select(
        "node", "__deg", "__n", (F.lit(1.0) / F.col("__n")).alias("rank")
    )
    def _step(ranks, _i):
        # Contract the rank frame to (src, share) BEFORE the
        # contribution join (round 15, §2.3 shuffle/broadcast fewer
        # bytes): the join only needs each source's rank/out-degree
        # quotient, so ship one double per node instead of
        # (__deg, rank), and compute the division once per node
        # instead of once per edge row. The addend multiset per dst is
        # unchanged (same rank/__deg double per src, replicated per
        # edge by the same inner join), so the per-dst float sums the
        # oracle replays see identical summands. Dangling rows
        # (__deg NULL) never matched the inner join on src — filtering
        # them out here drops no contribution.
        shares = ranks.filter(F.col("__deg").isNotNull()).select(
            F.col("node").alias("src"),
            (F.col("rank") / F.col("__deg")).alias("__share"),
        )
        contrib = (
            e.join(shares, "src")
            .groupBy(F.col("dst").alias("node"))
            .agg(F.sum("__share").alias("__in"))
        )
        dangling = ranks.filter(F.col("__deg").isNull()).agg(
            F.coalesce(F.sum("rank"), F.lit(0.0)).alias("__dm")
        )
        return (
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

    ranks = iterate_with_checkpoint(ranks, _step, iterations, checkpoint="before")
    return ranks.select("node", "rank")


def triangle_stats(
    edges: DataFrame,
    src_col: str = "src",
    dst_col: str = "dst",
    persist_fn=None,
    assume_canonical: bool = False,
) -> DataFrame:
    """X122 — exact triangle counting by DEGREE-ORDERED orientation
    (Schank/Wagner 2005; the MapReduce form is Suri/Vassilvitskii WWW
    2011 — public): orient each undirected edge from the lower
    (degree, id) endpoint to the higher; every triangle is then counted
    EXACTLY ONCE as a wedge at its lowest-ordered vertex closed by an
    oriented edge. Returns one row: n_nodes, n_edges, n_triangles,
    n_wedges (sum C(deg,2) — the open+closed wedge total) and the
    global clustering coefficient 3T / wedges.

    Why orientation is THE scale trick: the naive wedge count is
    sum C(deg, 2), quadratic in the hottest degree (a celebrity node
    with deg 1M contributes 5*10^11 wedges). Orientation bounds
    out-degree by O(sqrt(|E|)) on ANY graph — the oriented wedge total
    is at most |E|^{3/2} regardless of skew, turning the worst case
    from degree-quadratic to edge-3/2. The joins are plain equi-joins
    (wedge on the pivot, closure on the (v, w) pair); no windows.
    """
    ce = edges.select(
        F.least(F.col(src_col), F.col(dst_col)).alias("a"),
        F.greatest(F.col(src_col), F.col(dst_col)).alias("b"),
    ).filter(F.col("a") != F.col("b"))
    # ``assume_canonical``: the caller asserts the input already holds
    # each undirected edge exactly once with src < dst (and no self
    # loops), so the canonicalizing ``distinct`` — a full shuffle of
    # the edge frame, §2.4 "a distinct on data that is already
    # unique" — is skipped (round 14; parity pinned by
    # tests/test_extensions.py::test_triangle_stats_canonical_parity).
    if not assume_canonical:
        ce = ce.distinct()
    # ce feeds the degree agg and (via orientation) three join sides —
    # persist once (caller-owned persist_fn convention).
    if persist_fn is None:
        persist_fn = default_persist  # registered; released via release_default_persists
    ce = persist_fn(ce)
    # deg feeds BOTH orientation join sides AND the closing stats agg —
    # without its own persist the union+hash-agg subtree executes three
    # times (round-14 plan read; the q73 signature-frame class).
    deg = default_persist(
        ce.select(F.col("a").alias("node"))
        .unionByName(ce.select(F.col("b").alias("node")))
        .groupBy("node")
        .agg(F.count("*").alias("__d"))
    )
    da = deg.select(F.col("node").alias("a"), F.col("__d").alias("__da"))
    db = deg.select(F.col("node").alias("b"), F.col("__d").alias("__db"))
    ed = ce.join(da, "a").join(db, "b")
    fwd = (F.col("__da") < F.col("__db")) | (
        (F.col("__da") == F.col("__db")) & (F.col("a") < F.col("b"))
    )
    # o feeds THREE subtrees (both wedge sides + the closing-edge
    # probe); without its own persist each one replays the ce->deg
    # double join (r14 plan read: the orientation subtree appeared
    # three times in the executed plan). default_persist, NOT the
    # caller's persist_fn: _cache_scoped releases prior caches on
    # entry and would evict ce (the r13 q73 lesson).
    o = default_persist(
        ed.select(
            F.when(fwd, F.col("a")).otherwise(F.col("b")).alias("u"),
            F.when(fwd, F.col("b")).otherwise(F.col("a")).alias("v"),
            F.when(fwd, F.col("__db")).otherwise(F.col("__da")).alias("__dv"),
        )
    )
    o1 = o.select(F.col("u"), F.col("v").alias("v1"), F.col("__dv").alias("__d1"))
    o2 = o.select(F.col("u"), F.col("v").alias("v2"), F.col("__dv").alias("__d2"))
    wedges = o1.join(o2, "u").filter(
        (F.col("__d1") < F.col("__d2"))
        | ((F.col("__d1") == F.col("__d2")) & (F.col("v1") < F.col("v2")))
    )
    closing = o.select(F.col("u").alias("v1"), F.col("v").alias("v2"))
    tri = wedges.join(closing, ["v1", "v2"]).agg(
        F.count("*").cast("bigint").alias("n_triangles")
    )
    stats = deg.agg(
        F.count("*").cast("bigint").alias("n_nodes"),
        (F.sum("__d") / F.lit(2)).cast("bigint").alias("n_edges"),
        F.sum(F.col("__d") * (F.col("__d") - 1) / 2).cast("bigint").alias("n_wedges"),
    )
    return stats.crossJoin(F.broadcast(tri)).select(
        "n_nodes",
        "n_edges",
        "n_wedges",
        "n_triangles",
        F.round(
            F.lit(3.0) * F.col("n_triangles") / F.col("n_wedges"), 4
        ).alias("global_clustering"),
    )


def kcore_peel(
    edges: DataFrame,
    src_col: str = "src",
    dst_col: str = "dst",
    k: int = 16,
    rounds: int = 3,
) -> DataFrame:
    """X130 — k-core extraction by FIXED-ROUND peeling (Seidman 1983;
    the standard iterative "remove nodes with degree < k" fixed
    point): ``rounds`` synchronous peels, each recomputing degrees
    over the surviving edge set and dropping sub-k nodes — the
    density-core screen (spam rings, boilerplate hubs, co-citation
    cores all live in high cores). Returns the surviving nodes with
    their post-round degree plus a ``converged`` flag (TRUE when a
    further round would remove nothing — the fixed point reached
    within the declared budget). Fixed rounds make the result an
    oracle-checkable function of the edge set (the X114 lesson);
    production raises ``rounds`` until converged.

    Scale: each round is one degree hash-agg + one semi-join edge
    restriction — the Pregel-as-relational-ops shape; non-eager
    localCheckpoint truncates lineage per round (the X7 rule).
    """
    e = (
        edges.select(
            F.least(F.col(src_col), F.col(dst_col)).alias("a"),
            F.greatest(F.col(src_col), F.col(dst_col)).alias("b"),
        )
        .filter(F.col("a") != F.col("b"))
        .distinct()
    )
    def _peel(e, _i):
        deg = (
            e.select(F.col("a").alias("node"))
            .unionByName(e.select(F.col("b").alias("node")))
            .groupBy("node")
            .agg(F.count("*").alias("__d"))
        )
        alive = deg.filter(F.col("__d") >= k).select("node")
        return e.join(
            alive.withColumnRenamed("node", "a"), "a", "left_semi"
        ).join(alive.withColumnRenamed("node", "b"), "b", "left_semi")

    e = iterate_with_checkpoint(e, _peel, rounds, checkpoint="before")
    e = e.localCheckpoint(eager=False)
    deg = (
        e.select(F.col("a").alias("node"))
        .unionByName(e.select(F.col("b").alias("node")))
        .groupBy("node")
        .agg(F.count("*").cast("bigint").alias("degree"))
    )
    conv = deg.agg(
        F.coalesce(F.min(F.col("degree") >= k), F.lit(True)).alias("converged")
    )
    # conv: 1-row fixed-point flag
    return deg.crossJoin(F.broadcast(conv)).select("node", "degree", "converged")
