"""Managed-registry operators (E3 + the W1 buffer's generic twin).

The reference keeps its managed TASK-group state in a ``FixedList``
(utils/FixedList.scala): ``append`` evicts the oldest entry at capacity
(:12-15), ``replaceAll`` clears and refills from a fresh listing
(:17-20) — the refresh tick does exactly that with the latest SDK
listing (cluster/Workers.scala:274,411). These are the declarative
snapshot/merge analogs; all narrow or single-shuffle on bounded
registry frames (<= 48 rows by the service limit — Config.scala:93-94).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F
from pyspark.sql import types as T


def _is_orderable(dt: T.DataType) -> bool:
    """Spark can sort every type except maps (AnalysisException at plan
    time) — including maps nested inside arrays/structs."""
    if isinstance(dt, T.MapType):
        return False
    if isinstance(dt, T.ArrayType):
        return _is_orderable(dt.elementType)
    if isinstance(dt, T.StructType):
        return all(_is_orderable(f.dataType) for f in dt.fields)
    return True


def replace_all(current: DataFrame, incoming: DataFrame) -> DataFrame:
    """E3 — ``FixedList.replaceAll`` (utils/FixedList.scala:17-20):
    the registry is atomically replaced by the fresh listing; previous
    state contributes nothing. The Spark analog is snapshot semantics —
    the incoming frame IS the registry — plus the schema check the
    imperative clear+appendAll gets for free from the type system."""
    # names AND types (nullability excluded — it varies by construction
    # path): same-typed frames with different column meanings must not
    # silently become the registry
    cur_sig = [(f.name.lower(), f.dataType) for f in current.schema]
    inc_sig = [(f.name.lower(), f.dataType) for f in incoming.schema]
    if cur_sig != inc_sig:
        raise ValueError(
            f"replace_all: incompatible schemas {current.schema} vs {incoming.schema}"
        )
    return incoming


def union_latest(
    current: DataFrame, incoming: DataFrame, key: str, order_col: str | None = None
) -> DataFrame:
    """E3 union flavor — merge registries keeping one row per ``key``
    with the incoming row winning (appendAll-onto-existing with key
    dedup). One anti-join on the bounded registry key; at scale both
    sides broadcast.

    ``incoming`` itself must be key-unique — the anti-join only removes
    current-side rows, so intra-incoming duplicates would all survive.
    Pass ``order_col`` to enforce it deterministically: the incoming row
    with the greatest ``order_col`` per key wins (ties broken by the
    remaining *orderable* columns so replays agree — unorderable columns
    such as the map produced by ``parse_properties`` are excluded from
    the tie-break rather than raising at plan time; rows identical on
    every orderable column but differing in a map are true ties)."""
    if order_col is not None:
        orderable = {
            f.name for f in incoming.schema if _is_orderable(f.dataType)
        }
        w = Window.partitionBy(key).orderBy(
            F.col(order_col).desc(),
            *[
                F.col(c).desc()
                for c in incoming.columns
                if c not in (key, order_col) and c in orderable
            ],
        )
        incoming = (
            incoming.withColumn("__rn", F.row_number().over(w))
            .filter(F.col("__rn") == 1)
            .drop("__rn")
        )
    return incoming.unionByName(current.join(incoming, key, "left_anti"))


def append_bounded(
    df: DataFrame, order_col: str, capacity: int
) -> DataFrame:
    """W1 generic — ``FixedList.append`` eviction (utils/FixedList.scala:12-15):
    keep only the newest ``capacity`` entries by ``order_col``. The
    metric-store ring buffer (metric_store.last_n_ticks) is the
    tick-keyed specialization; this is the row-keyed form."""
    w = Window.orderBy(F.col(order_col).desc())
    return (
        df.withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") <= capacity)
        .drop("__rn")
    )


def snapshot_diff(
    old: DataFrame,
    new: DataFrame,
    key_cols: tuple[str, ...],
    compare_cols: tuple[str, ...],
    include_unchanged: bool = False,
) -> DataFrame:
    """X71 — CDC-style snapshot diff: given two versions of a keyed
    table, classify every key as ``added`` / ``removed`` / ``changed``
    (/ ``unchanged`` when requested). The audit that belongs between
    any two compaction runs of a 100 TB table: what did this rebuild
    actually touch?

    Scale: each side contracts to (key, digest) BEFORE the join — the
    payload never rides the shuffle, the full-outer join carries one
    fixed-width md5 per row. The digest is md5 over the compare columns
    with a NULL sentinel and a 0x1f field separator (unambiguous,
    engine-portable; callers choose compare columns whose STRING forms
    are engine-stable — integers/strings always, doubles only if the
    producer pins formatting). ``include_unchanged=False`` (default)
    keeps the output delta-sized, not table-sized.
    """
    def digest(df: DataFrame, alias: str) -> DataFrame:
        return df.select(
            *key_cols,
            F.md5(
                F.concat_ws(
                    "\x1f",
                    *[
                        F.coalesce(F.col(c).cast("string"), F.lit("\x00"))
                        for c in compare_cols
                    ],
                )
            ).alias(alias),
        )

    j = digest(old, "__h_old").join(
        digest(new, "__h_new"), list(key_cols), "full_outer"
    )
    status = (
        F.when(F.col("__h_old").isNull(), F.lit("added"))
        .when(F.col("__h_new").isNull(), F.lit("removed"))
        .when(F.col("__h_old") != F.col("__h_new"), F.lit("changed"))
        .otherwise(F.lit("unchanged"))
    )
    out = j.withColumn("status", status).select(*key_cols, "status")
    if not include_unchanged:
        out = out.filter(F.col("status") != "unchanged")
    return out


def merge_agg_state(
    state: DataFrame,
    batch: DataFrame,
    key_cols: list[str],
) -> DataFrame:
    """X138 — incremental aggregate-view maintenance: merge a new
    batch's partial (n, sum, min, max) aggregate into a materialized
    state frame WITHOUT re-touching historical raw data — the
    self-maintainable-aggregate subset of classic IVM (Gupta/Mumick,
    public; count/sum/min/max under inserts are merge-closed, exactly
    why they — and not exact medians — are what incremental datacubes
    materialize). Both inputs carry (key_cols..., n, sum, min, max);
    output is the merged state with the same schema, suitable to
    write back as the next state.

    Scale: ONE full-outer join on the key (the state frame is
    group-cardinality, the batch partial likewise); every merge rule
    is row-local arithmetic — the raw corpus is touched only by the
    batch's own partial agg, once, at ingest. The declared query's
    hash check IS the IVM correctness proof: merged state ==
    full recompute, value-identical.
    """
    s = state.select(
        *[F.col(c) for c in key_cols],
        F.col("n").alias("__n_s"), F.col("sum").alias("__s_s"),
        F.col("min").alias("__mn_s"), F.col("max").alias("__mx_s"),
    )
    b = batch.select(
        *[F.col(c) for c in key_cols],
        F.col("n").alias("__n_b"), F.col("sum").alias("__s_b"),
        F.col("min").alias("__mn_b"), F.col("max").alias("__mx_b"),
    )
    j = s.join(b, key_cols, "full_outer")
    return j.select(
        *[F.col(c) for c in key_cols],
        (F.coalesce("__n_s", F.lit(0)) + F.coalesce("__n_b", F.lit(0)))
        .cast("bigint")
        .alias("n"),
        (F.coalesce("__s_s", F.lit(0.0)) + F.coalesce("__s_b", F.lit(0.0))).alias("sum"),
        F.least(
            F.coalesce("__mn_s", "__mn_b"), F.coalesce("__mn_b", "__mn_s")
        ).alias("min"),
        F.greatest(
            F.coalesce("__mx_s", "__mx_b"), F.coalesce("__mx_b", "__mx_s")
        ).alias("max"),
    )


def partial_agg(
    df: DataFrame, key_cols: list[str], value_col: str
) -> DataFrame:
    """X138 — the ingest-side partial aggregate feeding
    :func:`merge_agg_state`: one hash agg of a batch to the
    (key, n, sum, min, max) state schema."""
    return df.groupBy(*[F.col(c) for c in key_cols]).agg(
        F.count("*").cast("bigint").alias("n"),
        F.sum(value_col).alias("sum"),
        F.min(value_col).alias("min"),
        F.max(value_col).alias("max"),
    )
