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

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def two_phase_topk(
    df: DataFrame,
    part_cols: Sequence[str],
    order_cols: Sequence[Column],
    k: int,
    bucket_on: Column,
    n_buckets: int = 64,
    rank_col: str = "rnk",
) -> DataFrame:
    """Per-group top-k that survives low-cardinality group keys.

    ``Window.partitionBy(lang)`` funnels every row of each language
    through ONE task's sort — parallelism collapses to #groups, and at
    100x one task sorts all-of-English. Phase 1 here ranks within
    (group, bucket) — ``n_buckets`` parallel bounded sorts per group —
    and keeps only k rows each; phase 2 re-ranks the surviving
    ``k * n_buckets`` rows per group (bounded, corpus-size-independent).
    The result is identical to the single-window form because every
    global top-k row is also top-k within its own bucket, and the
    phase-2 ranking applies the same deterministic total order.

    ``order_cols`` must define a total order (include a tie-break);
    ``bucket_on`` must be deterministic per row (replay safety) — an id
    column, never rand().
    """
    bucket = F.pmod(F.xxhash64(bucket_on), F.lit(n_buckets)).cast("int")
    w1 = Window.partitionBy(*part_cols, "__bkt").orderBy(*order_cols)
    w2 = Window.partitionBy(*part_cols).orderBy(*order_cols)
    return (
        df.withColumn("__bkt", bucket)
        .withColumn("__lr", F.row_number().over(w1))
        .filter(F.col("__lr") <= k)
        .withColumn(rank_col, F.row_number().over(w2).cast("int"))
        .filter(F.col(rank_col) <= k)
        .drop("__bkt", "__lr")
    )


def bucketed_prefix_sum(
    df: DataFrame,
    part_cols: Sequence[str],
    order_col: str,
    value_col: str,
    out_col: str = "cum",
    bucket_width: int = 1024,
) -> DataFrame:
    """Distributed running total over (part_cols, order_col) without a
    single-task per-group sort.

    ``bucket = floor(order_col / bucket_width)`` is monotone in the
    order column, so the prefix sum decomposes exactly:
    ``cum = sum(all earlier buckets' totals) + intra-bucket running
    sum``. The intra-bucket window sorts at most the rows sharing one
    bucket; the bucket-totals prefix runs over rows/bucket_width rows —
    1000x fewer, and the decomposition can be applied again if even
    that outgrows a task. The offset join is an equi join on
    (part_cols, bucket), the same key the intra window just partitioned
    by, so the exchange is reused.

    ``order_col`` must be numeric and unique within each group (an id),
    which also makes the running total deterministic.
    """
    base = df.withColumn(
        "__bkt", F.floor(F.col(order_col) / F.lit(bucket_width)).cast("long")
    )
    w_in = Window.partitionBy(*part_cols, "__bkt").orderBy(order_col)
    intra = base.withColumn("__icum", F.sum(value_col).over(w_in))
    w_b = Window.partitionBy(*part_cols).orderBy("__bkt")
    offsets = (
        base.groupBy(*part_cols, "__bkt")
        .agg(F.sum(value_col).alias("__bsum"))
        .withColumn("__off", F.sum("__bsum").over(w_b) - F.col("__bsum"))
        .select(*part_cols, "__bkt", "__off")
    )
    return (
        intra.join(offsets, [*part_cols, "__bkt"])
        .withColumn(out_col, F.col("__icum") + F.col("__off"))
        .drop("__bkt", "__icum", "__off")
    )


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


def hash_split(
    key_col: str = "source",
    val_digit: str = "c",
    test_digit: str = "e",
) -> Column:
    """X36 — leakage-safe train/val/test assignment: the split is a
    pure function of the GROUPING key's md5 (first hex digit: 0-b ->
    train 12/16, c-d -> val 2/16, e-f -> test 2/16 by default), so
    every document sharing the key — a domain, a source crawl, a
    dedup-cluster representative — lands in the SAME split by
    construction. Near-duplicate leakage across splits is the classic
    eval contamination; keying the hash on the entity (not the doc id)
    removes it without any join or state.

    Returns a Column (the assignment is row-local and shuffle-free —
    use it in a select/groupBy); being md5-derived it replays
    identically in any engine with md5, which is what makes the split
    auditable long after the pipeline that wrote it is gone.
    """
    b = F.substring(F.md5(F.col(key_col)), 1, 1)
    return (
        F.when(b < F.lit(val_digit), F.lit("train"))
        .when(b < F.lit(test_digit), F.lit("val"))
        .otherwise(F.lit("test"))
    )


def scalable_ntile(
    df: DataFrame,
    part_cols: Sequence[str],
    order_col: str,
    tiebreak_col: str,
    n_tiles: int,
    bucket_width: float = 64.0,
    out_col: str = "tile",
) -> DataFrame:
    """X88 — exact NTILE over low-cardinality partitions without the
    single-task per-group sort (the q36/bucketed_prefix_sum argument
    applied to ranking): ``bucket = floor(order_col / bucket_width)``
    is monotone in the order column, so the global rank decomposes as
    (rows in earlier buckets) + (intra-bucket row_number). The intra
    window sorts only one bucket's rows; the bucket-offset window runs
    over #buckets rows; group totals broadcast. The tile is then pure
    arithmetic on (rank, n): with n rows and k tiles the first n mod k
    tiles hold ceil(n/k) rows — exactly Spark's and DuckDB's NTILE
    contract, equivalence pytest-pinned against F.ntile.

    ``order_col`` must be numeric; (order_col, tiebreak_col) must be a
    total order within each partition (the determinism convention every
    ranking query here follows).
    """
    base = df.withColumn(
        "__bkt", F.floor(F.col(order_col) / F.lit(bucket_width)).cast("long")
    )
    w_in = Window.partitionBy(*part_cols, "__bkt").orderBy(
        F.col(order_col).asc(), F.col(tiebreak_col).asc()
    )
    intra = base.withColumn("__irnk", F.row_number().over(w_in))
    # one bucket-count agg carries BOTH the running offset and the
    # group total (a second window over the same #buckets-row frame) —
    # the corpus is scanned exactly twice (intra ranks + this agg),
    # never a third time for totals
    w_b = Window.partitionBy(*part_cols).orderBy("__bkt")
    w_tot = Window.partitionBy(*part_cols)
    offsets = (
        base.groupBy(*part_cols, "__bkt")
        .agg(F.count("*").alias("__bn"))
        .withColumn("__off", F.sum("__bn").over(w_b) - F.col("__bn"))
        .withColumn("__n", F.sum("__bn").over(w_tot))
        .select(*part_cols, "__bkt", "__off", "__n")
    )
    rank = F.col("__off") + F.col("__irnk")
    k = F.lit(n_tiles)
    base_sz = F.floor(F.col("__n") / k)
    rem = F.col("__n") % k
    boundary = rem * (base_sz + 1)
    tile = F.when(
        rank <= boundary, F.floor((rank - 1) / (base_sz + 1)) + 1
    ).otherwise(
        # greatest(.., 1): base_sz = 0 only when n < k, where every rank
        # falls in the first branch — guard the dead division anyway
        rem + F.floor((rank - 1 - boundary) / F.greatest(base_sz, F.lit(1))) + 1
    )
    return (
        intra.join(offsets, [*part_cols, "__bkt"])
        .withColumn(out_col, tile.cast("int"))
        .drop("__bkt", "__irnk", "__off", "__n")
    )


def scalable_rank(
    df: DataFrame,
    part_cols: Sequence[str],
    order_col: str,
    tiebreak_col: str,
    bucket_width: float = 64.0,
    out_col: str = "rnk",
) -> DataFrame:
    """X88 machinery, factored for reuse — exact global ROW_NUMBER over
    (part_cols) ordered by (order_col, tiebreak_col) without the
    single-task per-group sort: the scalable_ntile decomposition
    (bucket monotone in the order column; global rank = earlier-bucket
    counts + intra-bucket row_number) minus the tile arithmetic.
    ``order_col`` must be numeric; (order_col, tiebreak_col) must be a
    total order within each partition. Rank DESCENDING by negating the
    order column first.
    """
    base = df.withColumn(
        "__bkt", F.floor(F.col(order_col) / F.lit(bucket_width)).cast("long")
    )
    w_in = Window.partitionBy(*part_cols, "__bkt").orderBy(
        F.col(order_col).asc(), F.col(tiebreak_col).asc()
    )
    intra = base.withColumn("__irnk", F.row_number().over(w_in))
    w_b = Window.partitionBy(*part_cols).orderBy("__bkt")
    offsets = (
        base.groupBy(*part_cols, "__bkt")
        .agg(F.count("*").alias("__bn"))
        .withColumn("__off", F.sum("__bn").over(w_b) - F.col("__bn"))
        .select(*part_cols, "__bkt", "__off")
    )
    return (
        intra.join(offsets, [*part_cols, "__bkt"])
        .withColumn(out_col, (F.col("__off") + F.col("__irnk")).cast("bigint"))
        .drop("__bkt", "__irnk", "__off")
    )


def bloom_bits(
    keys: DataFrame,
    key_col: str,
    n_bits: int = 1 << 17,
    n_hashes: int = 5,
) -> DataFrame:
    """X115 (build side) — the dimension's Bloom bit set: for each key,
    ``n_hashes`` md5-derived bit positions (hash i of key k is
    ``md5(k || '#' || i)``'s leading 60 bits mod ``n_bits`` — the
    md5-rooted convention every oracle can replay), contracted to the
    DISTINCT bit frame. Bounded by construction: <= ``n_bits`` rows no
    matter the corpus — the broadcastable runtime-filter model state,
    which is the entire point of a Bloom filter at 100 TB.
    """
    hashes = F.array(
        *[
            F.pmod(
                F.conv(
                    F.substring(
                        F.md5(
                            F.concat_ws(
                                "#", F.col(key_col).cast("string"), F.lit(str(i))
                            )
                        ),
                        1,
                        15,
                    ),
                    16,
                    10,
                ).cast("long"),
                F.lit(n_bits),
            )
            for i in range(n_hashes)
        ]
    )
    return (
        keys.select(F.explode(hashes).alias("bitpos")).distinct()
    )


def bloom_semi_flags(
    fact_keys: DataFrame,
    dim_keys: DataFrame,
    key_col: str,
    dim_key_col: str | None = None,
    n_bits: int = 1 << 17,
    n_hashes: int = 5,
) -> DataFrame:
    """X115 — explicit Bloom-filter semi-join (the runtime-filter /
    sideways-information-passing pattern Spark applies internally as
    InjectRuntimeFilter, made a first-class operator so a pipeline can
    pre-prune a 100 TB fact scan against a dimension that is too big to
    broadcast as keys but tiny as BITS): the dim side contracts to a
    <= ``n_bits``-row bit frame (:func:`bloom_bits`), the fact side
    contracts to DISTINCT keys, and each of the ``n_hashes`` probes is
    a BROADCAST left-semi membership test — zero fact shuffles, no
    explode of the fact frame. Returns (key, bloom_pass) per distinct
    fact key; Bloom guarantees NO false negatives (every true match
    passes), false positives at the standard (1 - e^{-kn/m})^k rate
    are the caller's verify contract — compose with the exact join for
    exactness, keep the prefilter for the scan-prune win.

    Scale: the bit frame is corpus-size INDEPENDENT (min(#dim * k,
    n_bits) rows, 2^17 default = at most ~1 MB broadcast); the fact
    side is touched once for the distinct-key contraction and the
    flags join back by key. Tune n_bits/n_hashes from the dim
    cardinality (k = m/n * ln2 optimal).
    """
    dkc = dim_key_col or key_col
    bits = bloom_bits(
        dim_keys.select(F.col(dkc).alias(key_col)),
        key_col,
        n_bits=n_bits,
        n_hashes=n_hashes,
    )
    marked = bits.withColumn("__in", F.lit(1))
    out = fact_keys.select(F.col(key_col).alias("key")).distinct()
    hit_cols = []
    for i in range(n_hashes):
        probe = F.pmod(
            F.conv(
                F.substring(
                    F.md5(
                        F.concat_ws(
                            "#", F.col("key").cast("string"), F.lit(str(i))
                        )
                    ),
                    1,
                    15,
                ),
                16,
                10,
            ).cast("long"),
            F.lit(n_bits),
        )
        # marked: <= n_bits rows by construction (bounded broadcast)
        out = (
            out.withColumn("__p", probe)
            .join(
                F.broadcast(marked.withColumnRenamed("bitpos", "__p")),
                "__p",
                "left",
            )
            .withColumn(f"__hit{i}", F.col("__in").isNotNull())
            .drop("__p", "__in")
        )
        hit_cols.append(f"__hit{i}")
    pass_expr = F.lit(True)
    for c in hit_cols:
        pass_expr = pass_expr & F.col(c)
    return out.select("key", pass_expr.alias("bloom_pass"))
