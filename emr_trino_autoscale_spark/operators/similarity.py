"""Vector similarity search over embedding columns (X3/X6).

Embeddings are first-class ``array<float>`` columns. Dot products are
computed JVM-side with higher-order functions (``zip_with`` +
``aggregate`` fold — sequential, so bit-identical to the oracle's
list_inner_product); no Python in the hot path.

Scale design:
* brute-force top-k: broadcast the (small) query set, stream the corpus
  once, rank per query — one scan, zero shuffle of the corpus, a final
  exchange only of |queries| x k candidate rows via per-partition
  pre-ranking.
* LSH-bucketed variant: sign-random-projection buckets (deterministic
  hyperplanes derived from xxhash64) shrink the candidate set; the join
  is bucket-equi, so it shuffles candidates only.
* IVF-style variant: assign each vector to its nearest of C centroid
  buckets (centroids = deterministic sample), probe nearest buckets.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def as_double(vec: Column) -> Column:
    return F.transform(vec, lambda x: x.cast("double"))


def dot(a: Column, b: Column) -> Column:
    """Sequential fold — same accumulation order as a scalar loop."""
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x * y), F.lit(0.0), lambda acc, x: acc + x
    )


def l2_norm(a: Column) -> Column:
    return F.sqrt(dot(a, a))


def cosine(a: Column, b: Column, norm_a: Column, norm_b: Column) -> Column:
    return dot(a, b) / (norm_a * norm_b)


def with_norm(df: DataFrame, vec_col: str = "embedding") -> DataFrame:
    """Precompute the double-cast vector + its norm once per row (norms
    are reused across every pair the row participates in)."""
    return df.withColumn("__v", as_double(F.col(vec_col))).withColumn(
        "__norm", l2_norm(F.col("__v"))
    )


def brute_force_topk(
    corpus: DataFrame,
    queries: DataFrame,
    k: int = 5,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    query_id_col: str = "q_id",
) -> DataFrame:
    """X3 baseline — exact top-k cosine neighbors per query vector.

    ``queries`` is broadcast (a query set is human-sized); the corpus is
    scanned once. Ranking uses the 4-decimal-rounded score with id
    tie-break so results are reproducible across engines and runs.
    """
    c = with_norm(corpus, vec_col).select(
        F.col(id_col).alias("neighbor_id"),
        F.col("__v").alias("cv"),
        F.col("__norm").alias("cn"),
    )
    q = with_norm(queries, vec_col).select(
        F.col(query_id_col), F.col("__v").alias("qv"), F.col("__norm").alias("qn")
    )
    scored = (
        c.join(F.broadcast(q), F.col("neighbor_id") != F.col(query_id_col))
        .withColumn(
            "cosine",
            F.round(
                cosine(F.col("qv"), F.col("cv"), F.col("qn"), F.col("cn")), 4
            ).cast("decimal(38,4)"),
        )
        .select(query_id_col, "neighbor_id", "cosine")
    )
    w = Window.partitionBy(query_id_col).orderBy(
        F.col("cosine").desc(), F.col("neighbor_id").asc()
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
    )


def md5_sign_planes(n_planes: int = 8, dim: int = 64) -> list[list[float]]:
    """Deterministic ±1 hyperplanes derived from md5 — computed once at
    plan-build time and embedded as literals (the moral equivalent of a
    broadcast model table). Reproducible anywhere md5 exists, so the
    DuckDB oracle replays the exact same buckets."""
    import hashlib

    return [
        [
            1.0 if hashlib.md5(f"{p}-{j}".encode()).hexdigest()[0] >= "8" else -1.0
            for j in range(dim)
        ]
        for p in range(n_planes)
    ]


def srp_bucket_literal(vec: Column, planes: list[list[float]]) -> Column:
    """SRP bucket id from literal hyperplanes. The projection is rounded
    to 6 decimals before the sign test so engine-specific fp summation
    order can't flip a boundary bit."""
    bucket = F.lit(0)
    for p, plane in enumerate(planes):
        comps = F.array(*[F.lit(x) for x in plane])
        s = F.aggregate(
            F.zip_with(vec, comps, lambda x, c: x.cast("double") * c),
            F.lit(0.0),
            lambda acc, x: acc + x,
        )
        bucket = bucket + F.when(F.round(s, 6) > 0, F.lit(1 << p)).otherwise(0)
    return bucket.cast("int")


def lsh_topk_literal(
    corpus: DataFrame,
    queries: DataFrame,
    planes: list[list[float]],
    k: int = 5,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    query_id_col: str = "q_id",
) -> DataFrame:
    """X3 scale path, oracle-replayable form — approximate top-k where
    only candidates sharing the query's SRP bucket are scored. At 100 TB
    the corpus shuffles once on the (tiny, int) bucket id; queries
    broadcast; the quadratic scan becomes a bucket-equi join."""
    c = with_norm(corpus, vec_col).select(
        F.col(id_col).alias("neighbor_id"),
        F.col("__v").alias("cv"),
        F.col("__norm").alias("cn"),
        srp_bucket_literal(F.col("__v"), planes).alias("bucket"),
    )
    q = with_norm(queries, vec_col).select(
        F.col(query_id_col),
        F.col("__v").alias("qv"),
        F.col("__norm").alias("qn"),
        srp_bucket_literal(F.col("__v"), planes).alias("bucket"),
    )
    scored = (
        c.join(F.broadcast(q), on="bucket")
        .filter(F.col("neighbor_id") != F.col(query_id_col))
        .withColumn(
            "cosine",
            F.round(
                cosine(F.col("qv"), F.col("cv"), F.col("qn"), F.col("cn")), 4
            ).cast("decimal(38,4)"),
        )
        .select(query_id_col, "neighbor_id", "cosine")
    )
    w = Window.partitionBy(query_id_col).orderBy(
        F.col("cosine").desc(), F.col("neighbor_id").asc()
    )
    return scored.withColumn("rank", F.row_number().over(w)).filter(F.col("rank") <= k)


def ivf_topk(
    corpus: DataFrame,
    centroids: DataFrame,
    queries: DataFrame,
    k: int = 5,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    query_id_col: str = "q_id",
    centroid_id_col: str = "c_id",
) -> DataFrame:
    """IVF-style ANN: coarse-quantize every corpus vector to its nearest
    centroid (broadcast the centroid table — it is small by
    construction), then a query probes only its own centroid's inverted
    list. One corpus shuffle on the centroid id; scoring is bucket-local.
    Assignment ties break on centroid id, scores round to 4 decimals
    with neighbor-id tie-break (reproducible across engines)."""
    cents = with_norm(centroids, vec_col).select(
        F.col(centroid_id_col), F.col("__v").alias("ce"), F.col("__norm").alias("cen")
    )

    def assign(df: DataFrame, keep: list[str]) -> DataFrame:
        scored = df.join(F.broadcast(cents)).withColumn(
            "__sim", F.round(cosine(F.col("__v"), F.col("ce"), F.col("__norm"), F.col("cen")), 6)
        )
        w = Window.partitionBy(*keep).orderBy(
            F.col("__sim").desc(), F.col(centroid_id_col).asc()
        )
        return (
            scored.withColumn("__rn", F.row_number().over(w))
            .filter(F.col("__rn") == 1)
            .select(*keep, "__v", "__norm", F.col(centroid_id_col).alias("assigned"))
        )

    c = assign(
        with_norm(corpus, vec_col).select(F.col(id_col).alias("neighbor_id"), "__v", "__norm"),
        ["neighbor_id"],
    ).select("neighbor_id", F.col("__v").alias("cv"), F.col("__norm").alias("cn"), "assigned")
    q = assign(
        with_norm(queries, vec_col).select(F.col(query_id_col), "__v", "__norm"),
        [query_id_col],
    ).select(query_id_col, F.col("__v").alias("qv"), F.col("__norm").alias("qn"), "assigned")
    scored = (
        c.join(F.broadcast(q), on="assigned")
        .filter(F.col("neighbor_id") != F.col(query_id_col))
        .withColumn(
            "cosine",
            F.round(
                cosine(F.col("qv"), F.col("cv"), F.col("qn"), F.col("cn")), 4
            ).cast("decimal(38,4)"),
        )
        .select(query_id_col, "neighbor_id", "cosine")
    )
    w = Window.partitionBy(query_id_col).orderBy(
        F.col("cosine").desc(), F.col("neighbor_id").asc()
    )
    return scored.withColumn("rank", F.row_number().over(w)).filter(F.col("rank") <= k)


def near_dup_pairs(
    df: DataFrame,
    threshold: float = 0.4,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Exact embedding-cosine near-dup pairs (the correctness baseline;
    the LSH/IVF buckets above are the 100 TB path — same scoring, the
    candidate set shrinks from n² to bucket-local)."""
    n = with_norm(df, vec_col).select(
        F.col(id_col).alias("id"), F.col("__v").alias("v"), F.col("__norm").alias("nrm")
    )
    a, b = n.alias("a"), n.alias("b")
    return (
        a.join(b, F.col("a.id") < F.col("b.id"))
        .withColumn(
            "cosine",
            F.round(
                cosine(F.col("a.v"), F.col("b.v"), F.col("a.nrm"), F.col("b.nrm")), 4
            ).cast("decimal(38,4)"),
        )
        .filter(F.col("cosine") >= threshold)
        .select(F.col("a.id").alias("id_a"), F.col("b.id").alias("id_b"), "cosine")
    )


def blocks_for(rows: int, dim: int, tile_mem_bytes: int, parallelism: int = 1) -> int:
    """Block count for :func:`near_dup_pairs_blocked`.

    Memory term: a tile holds two ``r x dim`` operand blocks plus the
    ``r x r`` float64 score matrix, so ``8*(r^2 + 2*r*dim) <=
    tile_mem_bytes`` gives the max block row-count ``r = -dim +
    sqrt(dim^2 + tile_mem_bytes/8)`` and ``n_blocks = ceil(rows/r)``.
    Parallelism floor: ``n_blocks*(n_blocks+1)/2`` tiles should cover
    the cluster's cores even when memory alone would allow one giant
    tile. The max of the two terms wins; memory dominates at scale.
    """
    import math

    if rows <= 1:
        return 1
    r = -dim + math.sqrt(dim * dim + tile_mem_bytes / 8.0)
    mem_blocks = max(1, math.ceil(rows / max(1.0, r)))
    par_blocks = math.ceil((math.sqrt(8.0 * parallelism + 1.0) - 1.0) / 2.0)
    return max(mem_blocks, par_blocks, 1)


def near_dup_pairs_blocked(
    df: DataFrame,
    threshold: float = 0.4,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    n_blocks: int | None = None,
    tile_mem_bytes: int = 256 << 20,
) -> DataFrame:
    """Exact all-pairs cosine via blocked GEMM — the scalable form of
    :func:`near_dup_pairs`.

    Rows are hashed into ``n_blocks`` blocks and replicated once per
    partner block, so every block pair (i <= j) materializes on exactly
    one task, where a single NumPy matmul scores the whole tile
    (Arrow-batched ``applyInPandas``; BLAS beats per-pair higher-order
    functions by ~2 orders of magnitude). Exactness is preserved — only
    the candidate *routing* changes, every pair is still scored, so the
    result is independent of ``n_blocks``.

    Scale: shuffle volume is n_rows x n_blocks (the standard sqrt(P)
    replication of distributed all-pairs). ``n_blocks=None`` (default)
    sizes the blocks from the corpus via :func:`blocks_for` — one cheap
    count/dim aggregation — so a tile can never outgrow
    ``tile_mem_bytes`` however large the corpus; pass an explicit
    ``n_blocks`` only when the caller already knows the geometry. The
    UDF pre-filters at threshold - 1e-6; the exact >= threshold cut
    happens after Spark-side 4-decimal rounding, identical to the
    baseline op.
    """
    import pandas as pd

    if n_blocks is None:
        stats = df.agg(
            F.count("*").alias("n"), F.max(F.size(vec_col)).alias("dim")
        ).first()
        n_blocks = blocks_for(
            stats["n"] or 0,
            stats["dim"] or 1,
            tile_mem_bytes,
            df.sparkSession.sparkContext.defaultParallelism,
        )

    base = df.select(
        F.col(id_col).alias("id"),
        as_double(F.col(vec_col)).alias("v"),
        F.pmod(F.xxhash64(F.col(id_col)), F.lit(n_blocks)).cast("int").alias("blk"),
    )
    repl = base.select(
        "id",
        "v",
        "blk",
        F.explode(F.sequence(F.lit(0), F.lit(n_blocks - 1))).alias("p"),
    ).select(
        "id",
        "v",
        "blk",
        F.least("blk", "p").alias("ba"),
        F.greatest("blk", "p").alias("bb"),
    )

    pre_cut = threshold - 1e-6

    def score(key: tuple, pdf: pd.DataFrame) -> pd.DataFrame:
        import numpy as np

        ba, bb = int(key[0]), int(key[1])
        order = np.argsort(pdf["id"].to_numpy(), kind="stable")
        ids = pdf["id"].to_numpy()[order]
        blks = pdf["blk"].to_numpy()[order]
        m = np.asarray([list(x) for x in pdf["v"].to_numpy()[order]], dtype=np.float64)
        norms = np.linalg.norm(m, axis=1)
        norms[norms == 0.0] = 1.0
        m = m / norms[:, None]
        if ba == bb:
            sims = m @ m.T
            ia, ib = np.triu_indices(len(ids), k=1)
        else:
            la, lb = blks == ba, blks == bb
            sims = m[la] @ m[lb].T
            ia, ib = np.nonzero(sims >= pre_cut)
            a_ids, b_ids = ids[la][ia], ids[lb][ib]
            lo, hi = np.minimum(a_ids, b_ids), np.maximum(a_ids, b_ids)
            return pd.DataFrame(
                {"id_a": lo, "id_b": hi, "cosine": sims[ia, ib]}
            )
        keep = sims[ia, ib] >= pre_cut
        return pd.DataFrame(
            {"id_a": ids[ia[keep]], "id_b": ids[ib[keep]], "cosine": sims[ia, ib][keep]}
        )

    pairs = repl.groupBy("ba", "bb").applyInPandas(
        score, schema="id_a long, id_b long, cosine double"
    )
    return (
        pairs.withColumn("cosine", F.round("cosine", 4).cast("decimal(38,4)"))
        .filter(F.col("cosine") >= threshold)
        .select("id_a", "id_b", "cosine")
    )


def srp_bucket(vec: Column, n_planes: int = 8, dim: int = 64) -> Column:
    """Sign-random-projection LSH bucket id (deterministic).

    Hyperplane p's component j is a pseudo-random ±1 derived from
    xxhash64(p, j) — reproducible with no stored model. Bucket id packs
    the sign bits of the n_planes projections.
    """
    def proj_bit(p: int) -> Column:
        comps = F.transform(
            F.sequence(F.lit(0), F.lit(dim - 1)),
            lambda j: F.when(
                F.xxhash64(F.lit(p), j) % 2 == 0, F.lit(1.0)
            ).otherwise(F.lit(-1.0)),
        )
        s = F.aggregate(
            F.zip_with(vec, comps, lambda x, c: x.cast("double") * c),
            F.lit(0.0),
            lambda acc, x: acc + x,
        )
        return F.when(s > 0, F.lit(1 << p)).otherwise(F.lit(0))

    bucket = F.lit(0)
    for p in range(n_planes):
        bucket = bucket + proj_bit(p)
    return bucket.cast("int")


def lsh_topk(
    corpus: DataFrame,
    queries: DataFrame,
    k: int = 5,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    query_id_col: str = "q_id",
    n_planes: int = 8,
    dim: int = 64,
) -> DataFrame:
    """X3 scale path — approximate top-k: only candidates in the same
    SRP bucket as the query are scored. At 100 TB this replaces the
    corpus-wide scan-per-query with a bucket-equi join: the corpus
    shuffles once on the bucket id, queries broadcast."""
    c = with_norm(corpus, vec_col).select(
        F.col(id_col).alias("neighbor_id"),
        F.col("__v").alias("cv"),
        F.col("__norm").alias("cn"),
        srp_bucket(F.col(vec_col), n_planes, dim).alias("bucket"),
    )
    q = with_norm(queries, vec_col).select(
        F.col(query_id_col),
        F.col("__v").alias("qv"),
        F.col("__norm").alias("qn"),
        srp_bucket(F.col(vec_col), n_planes, dim).alias("bucket"),
    )
    scored = (
        c.join(F.broadcast(q), on="bucket")
        .filter(F.col("neighbor_id") != F.col(query_id_col))
        .withColumn(
            "cosine",
            F.round(
                cosine(F.col("qv"), F.col("cv"), F.col("qn"), F.col("cn")), 4
            ).cast("decimal(38,4)"),
        )
        .select(query_id_col, "neighbor_id", "cosine")
    )
    w = Window.partitionBy(query_id_col).orderBy(
        F.col("cosine").desc(), F.col("neighbor_id").asc()
    )
    return scored.withColumn("rank", F.row_number().over(w)).filter(F.col("rank") <= k)
