"""Statistical survey/monitoring operators (X52-X54).

Corpus work at 100 TB is sampled, trended and monitored far more often
than it is fully scanned; these are the three shapes that recur:
optimal stratified sampling (what to label/inspect), grouped trend
fits (is a source drifting), and rolling anomaly flags (did ingest
break last night). All are built-in expression work — one or two
hash aggregations plus bounded broadcast frames, no Python.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

from ._persist import default_persist

from ..functions import md5_long60


def neyman_allocation(
    df: DataFrame,
    stratum_col: str = "source",
    value_col: str = "n_chars",
    total_sample: int = 100,
    id_col: str = "doc_id",
) -> DataFrame:
    """X52 — Neyman-optimal stratified sampling (Neyman 1934 — public):
    allocate a fixed labeling/inspection budget across strata
    proportionally to N_h * sigma_h, which minimizes the variance of the
    stratified mean estimator — high-variance strata get inspected more
    per document than homogeneous ones. Selection inside each stratum
    uses a deterministic md5 coin at rate alloc/N_h (expected-count
    selection — row-local, replayable, no per-stratum sort).

    Scale: one grouped agg for (N_h, sigma_h), a #strata-row broadcast
    with the 1-row budget total, then a narrow coin projection and one
    audit agg. No windows, no global sort; the coin keeps the plan
    identical whether a stratum holds 10 docs or 10 billion.
    """
    st = df.groupBy(stratum_col).agg(
        F.count("*").cast("double").alias("__N"),
        F.coalesce(F.stddev_samp(F.col(value_col).cast("double")), F.lit(0.0)).alias(
            "__sd"
        ),
    )
    tot = st.agg(
        F.sum(F.col("__N") * F.col("__sd")).alias("__T"),
        F.sum("__N").alias("__NT"),
    )
    frac = F.when(
        F.col("__T") > 0, F.col("__N") * F.col("__sd") / F.col("__T")
    ).otherwise(F.col("__N") / F.col("__NT"))  # all-constant strata: proportional
    alloc = (
        st.join(F.broadcast(tot))
        .withColumn("__alloc", frac * F.lit(float(total_sample)))
        .select(stratum_col, "__N", "__sd", "__alloc")
    )
    coin = (
        md5_long60(F.col(id_col).cast("string"))
        .cast("double")
        / F.lit(float(1 << 60))
    )
    return (
        df.join(F.broadcast(alloc), stratum_col)
        .withColumn("__keep", coin < F.col("__alloc") / F.col("__N"))
        .groupBy(stratum_col)
        .agg(
            F.min("__N").cast("bigint").alias("n_docs"),
            F.min("__sd").alias("sd"),
            F.min("__alloc").alias("alloc"),
            F.sum(F.col("__keep").cast("int")).cast("bigint").alias("n_sampled"),
        )
    )


def grouped_ols(
    df: DataFrame,
    group_col: str,
    x: Column,
    y: Column,
) -> DataFrame:
    """X53 — per-group ordinary-least-squares trend fit, computed in the
    centered (covariance) form: slope = S_xy / S_xx with
    S_xy = sum((x - mean_x) * (y - mean_y)). The centered two-pass is
    deliberate — the raw-moment identity n*sum(xy) - sum(x)*sum(y)
    catastrophically cancels when x is epoch seconds (~1e9, so sum(x^2)
    carries ~1e22 and the subtraction loses every significant digit);
    centering keeps all terms at data scale, and makes the oracle SQL
    agree at 4 decimals.

    Scale: two grouped hash aggs (means, then centered moments) joined
    on the group key — the second agg reuses the first's broadcast.
    Emits slope, intercept, r2 and n per group.
    """
    d = df.select(F.col(group_col).alias("g"), x.cast("double").alias("__x"), y.cast("double").alias("__y"))
    means = d.groupBy("g").agg(
        F.avg("__x").alias("__mx"), F.avg("__y").alias("__my")
    )
    mom = (
        d.join(F.broadcast(means), "g")
        .groupBy("g")
        .agg(
            F.count("*").cast("bigint").alias("n"),
            F.sum((F.col("__x") - F.col("__mx")) * (F.col("__y") - F.col("__my"))).alias("__sxy"),
            F.sum(F.pow(F.col("__x") - F.col("__mx"), 2)).alias("__sxx"),
            F.sum(F.pow(F.col("__y") - F.col("__my"), 2)).alias("__syy"),
            F.min("__mx").alias("__mx"),
            F.min("__my").alias("__my"),
        )
    )
    slope = F.when(F.col("__sxx") > 0, F.col("__sxy") / F.col("__sxx")).otherwise(
        F.lit(0.0)
    )
    r2 = F.when(
        (F.col("__sxx") > 0) & (F.col("__syy") > 0),
        F.pow(F.col("__sxy"), 2) / (F.col("__sxx") * F.col("__syy")),
    ).otherwise(F.lit(0.0))
    return mom.select(
        F.col("g").alias(group_col),
        "n",
        slope.alias("slope"),
        (F.col("__my") - slope * F.col("__mx")).alias("intercept"),
        r2.alias("r2"),
    )


def rolling_zscore(
    df: DataFrame,
    key_col: str = "user_id",
    ts_col: str = "ts",
    value_col: str = "value",
    lookback: int = 5,
    threshold: float = 2.0,
    tiebreak_col: str = "event_id",
) -> DataFrame:
    """X54 — rolling z-score anomaly flags: each event scored against
    the mean/stddev of its own key's previous ``lookback`` events
    (frame ends at the PRECEDING row — the current value never
    contaminates its own baseline). The ingest-monitoring shape: a
    source whose new events suddenly sit 2 sigma off their trailing
    baseline broke upstream, and the flag must fire per event, not per
    day.

    Scale: one window partitioned by the KEY (corpus-cardinality —
    parallelism grows with data), each in-window sort bounded by one
    key's history. The frame is rows-based with an explicit total
    order ((ts, tiebreak)) so replays and engines agree on which rows
    the baseline saw.
    """
    w = (
        Window.partitionBy(key_col)
        .orderBy(F.col(ts_col).asc(), F.col(tiebreak_col).asc())
        .rowsBetween(-lookback, -1)
    )
    v = F.col(value_col).cast("double")
    base_mean = F.avg(v).over(w)
    base_sd = F.stddev_samp(v).over(w)
    base_n = F.count(v).over(w)
    z = F.when(
        (base_n >= lookback) & (base_sd > 0), (v - base_mean) / base_sd
    )
    return (
        df.withColumn("baseline_mean", base_mean)
        .withColumn("baseline_sd", base_sd)
        .withColumn("baseline_n", base_n.cast("bigint"))
        .withColumn("zscore", z)
        .withColumn(
            "is_anomaly",
            F.coalesce(F.abs(z) > F.lit(threshold), F.lit(False)),
        )
    )


def ranking_metrics(
    ranking: DataFrame,
    truth: DataFrame,
    k: int = 5,
    query_col: str = "q_id",
    item_col: str = "neighbor_id",
    rank_col: str = "rank",
) -> DataFrame:
    """X61 — retrieval evaluation metrics (recall@k, MRR, nDCG@k with
    binary relevance): score a predicted ranking against a relevant
    set, per query. The eval harness the ANN family (LSH/IVF/PQ/JL)
    needs as a first-class operator — recall numbers quoted in docs
    should come from the engine, re-runnable, not from a notebook.

    Scale: one (query, item)-keyed join of two already-small frames
    (rankings are per-query top-k by construction) + one agg per query.
    The ideal-DCG term folds over ``sequence(1, min(|truth|, k))`` —
    row-local HOF on a #queries-row frame. The log2 discount is
    computed as ln(r+1)/ln(2) on BOTH engines so the oracle agrees to
    the last ulp before rounding.

    Output covers EVERY query present in ``truth`` (ADVICE r6): a
    query with zero prediction rows scores recall/mrr/ndcg = 0 instead
    of silently disappearing and inflating averaged metrics — per_q is
    left-joined from the truth-derived frame with hits/dcg coalesced
    to 0. Queries present only in ``ranking`` (no truth) stay excluded:
    with an empty relevant set every metric is undefined (0/0).
    """
    ln2 = F.log(F.lit(2.0))
    t = truth.select(
        F.col(query_col).alias("q"), F.col(item_col).alias("i")
    ).withColumn("__rel", F.lit(1))
    nt = t.groupBy("q").agg(F.count("*").cast("bigint").alias("n_truth"))
    j = (
        ranking.filter(F.col(rank_col) <= k)
        .select(
            F.col(query_col).alias("q"),
            F.col(item_col).alias("i"),
            F.col(rank_col).alias("r"),
        )
        .join(t, ["q", "i"], "left")
    )
    per_q = j.groupBy("q").agg(
        F.sum(F.coalesce(F.col("__rel"), F.lit(0))).cast("bigint").alias("hits"),
        F.min(F.when(F.col("__rel").isNotNull(), F.col("r"))).alias("__first"),
        F.sum(
            F.when(
                F.col("__rel").isNotNull(),
                F.lit(1.0) / (F.log(F.col("r") + 1.0) / ln2),
            ).otherwise(0.0)
        ).alias("__dcg"),
    )
    idcg = F.aggregate(
        F.sequence(F.lit(1), F.least(F.col("n_truth"), F.lit(k)).cast("int")),
        F.lit(0.0),
        lambda acc, i: acc + F.lit(1.0) / (F.log(i.cast("double") + 1.0) / ln2),
    )
    return (
        nt.join(per_q, "q", "left")
        .select(
            F.col("q").alias(query_col),
            "n_truth",
            F.coalesce(F.col("hits"), F.lit(0).cast("bigint")).alias("hits"),
            (
                F.coalesce(F.col("hits"), F.lit(0)).cast("double")
                / F.col("n_truth")
            ).alias("recall"),
            F.coalesce(F.lit(1.0) / F.col("__first"), F.lit(0.0)).alias("mrr"),
            (F.coalesce(F.col("__dcg"), F.lit(0.0)) / idcg).alias("ndcg"),
        )
    )


def dp_histogram(
    df: DataFrame,
    group_col: str = "source",
    epsilon: float = 1.0,
) -> DataFrame:
    """X62 — Laplace-mechanism histogram (Dwork et al. TCC 2006 —
    public): per-group counts with Laplace(1/epsilon) noise, the
    release shape for sharing corpus composition stats without exposing
    individual membership (unit sensitivity: one document changes one
    count by one).

    DETERMINISM CAVEAT (deliberate, documented): the Laplace draw here
    is the inverse CDF applied to an md5-derived uniform of the GROUP
    KEY — replayable across engines/retries, which is what makes the
    mechanism's plumbing oracle-checkable and idempotent on re-release.
    Replayable noise is NOT private: a real deployment swaps the coin
    for a cryptographic RNG (one line) and releases ONLY the noisy
    column. The engine contract — per-group noise addition, post-
    processing on noisy values only, sensitivity-1 counting query — is
    what this operator pins.

    Scale: one hash agg + a narrow noise projection.
    """
    b = 1.0 / epsilon
    counts = df.groupBy(group_col).agg(F.count("*").cast("bigint").alias("true_count"))
    u = (
        md5_long60(F.col(group_col).cast("string"))
        .cast("double")
        / F.lit(float(1 << 60))
    )
    centered = u - F.lit(0.5)
    noise = (
        F.lit(-b)
        * F.signum(centered)
        * F.log(F.lit(1.0) - F.lit(2.0) * F.abs(centered))
    )
    return counts.select(
        group_col,
        "true_count",
        noise.alias("noise"),
        (F.col("true_count") + noise).alias("noisy_count"),
    )


def weighted_sample(
    df: DataFrame,
    weight_col: str,
    k: int = 10,
    strata_cols: tuple[str, ...] = (),
    id_col: str = "doc_id",
) -> DataFrame:
    """X67 — weighted sampling WITHOUT replacement, the
    Efraimidis-Spirakis A-ES scheme (IPL 2006, public): each row draws
    a deterministic uniform coin u in (0,1) and is ranked by
    ``ln(u) / w`` descending (equivalent to u^(1/w) — larger weight =>
    stochastically larger key), the top-k per stratum forming an exact
    weighted sample. Rows with weight <= 0 are excluded (zero mass).

    Determinism/oracle: the coin is the shared 60-bit md5 digest of the
    id (``functions.md5_long60``), shifted to (0,1) as (h+1)/(2^60+1),
    so DuckDB replays the identical keys; only ids/ranks are emitted
    (the float key stays internal — ordering agrees across engines for
    any non-pathological coin gap).

    Scale: one narrow projection computes the key row-locally; the
    per-stratum top-k runs through :func:`..skew.two_phase_topk`-style
    partial ranking when strata are low-cardinality — here a plain
    window per stratum key, documented as the X16 primitive's job.
    """
    from ..functions import md5_long60

    w = F.col(weight_col).cast("double")
    coin = (
        (md5_long60(F.col(id_col).cast("string")).cast("double") + F.lit(1.0))
        / F.lit(float((1 << 60) + 1))
    )
    keyed = (
        df.filter(w > 0)
        .withColumn("__key", F.log(coin) / w)
        .select(*strata_cols, id_col, F.col(weight_col), "__key")
    )
    win = Window.partitionBy(*[F.col(c) for c in strata_cols]).orderBy(
        F.col("__key").desc(), F.col(id_col).asc()
    )
    return (
        keyed.withColumn("rank", F.row_number().over(win).cast("int"))
        .filter(F.col("rank") <= k)
        .drop("__key")
    )


def profile_columns(
    df: DataFrame, cols: tuple[str, ...], approx: bool = False
) -> DataFrame:
    """X68 — per-column data profile (the audit every ingest should
    publish): row count, null count, distinct count, and
    lexicographic min/max of the STRING form, one output row per
    column. String-form min/max is deliberate: it gives one stable,
    type-agnostic ordering both engines agree on (a typed per-column
    profile is a trivial per-column variant).

    Scale: ONE pass — each row explodes to len(cols) narrow
    (column, value) structs, then a single hash agg per column key;
    no per-column re-scan of the table, no expand-based multi-distinct
    plan (the q43 gotcha). Distinct counting is exact by default and
    shuffles only (col, value) pairs.

    ``approx=True`` (round 8, VERDICT r7 task 8 — the switch a 100 TB
    user actually flips): swaps the exact ``countDistinct`` for
    ``approx_count_distinct`` (HyperLogLog++, default rsd 0.05) in the
    SAME single-agg shape — the agg state per column collapses from
    the full distinct-value set to one fixed ~1.5 KB sketch, so the
    shuffle carries O(#cols) state instead of O(distinct values).
    Every other statistic (n_rows, n_null, min/max) stays exact; only
    n_distinct carries the HLL error bound
    (tests/test_extensions.py::test_profile_columns_approx pins the
    row set and bounded ndv error against the exact mode). The
    declared q107 stays on the exact mode (it is the DuckDB oracle).
    """
    ndv = (
        F.approx_count_distinct("val")
        if approx
        else F.countDistinct("val")
    )
    pairs = df.select(
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(c).alias("column"),
                        F.col(c).cast("string").alias("val"),
                    )
                    for c in cols
                ]
            )
        ).alias("p")
    ).select("p.column", "p.val")
    return pairs.groupBy("column").agg(
        F.count("*").cast("bigint").alias("n_rows"),
        F.sum(F.when(F.col("val").isNull(), 1).otherwise(0))
        .cast("bigint")
        .alias("n_null"),
        ndv.cast("bigint").alias("n_distinct"),
        F.min("val").alias("min_val"),
        F.max("val").alias("max_val"),
    )


def concentration_curve(
    df: DataFrame,
    group_col: str = "source",
    value_col: str = "n_chars",
) -> DataFrame:
    """X69 — Lorenz/concentration curve over group mass: groups ranked
    by total ``value_col`` descending, each with its share of the
    corpus and the cumulative share — the mixture-monitoring view that
    tells a pipeline when one crawl/source starts dominating the token
    budget. Shares rounded to 4 decimals (oracle convention).

    Scale: one hash agg contracts the corpus to #groups rows; the
    ranking window then runs on that tiny frame (single partition of
    group cardinality, NOT corpus cardinality — same argument as the
    q56 mixing-weights rollup)."""
    totals = df.groupBy(group_col).agg(
        F.sum(F.col(value_col).cast("double")).alias("__mass")
    )
    grand = totals.agg(F.sum("__mass").alias("__grand"))
    win = Window.orderBy(F.col("__mass").desc(), F.col(group_col).asc())
    return (
        totals.join(F.broadcast(grand))
        .withColumn("rank", F.row_number().over(win).cast("int"))
        .withColumn(
            "share", F.round(F.col("__mass") / F.col("__grand"), 4)
        )
        .withColumn(
            "cum_share",
            F.round(
                F.sum(F.col("__mass")).over(
                    win.rowsBetween(Window.unboundedPreceding, 0)
                )
                / F.col("__grand"),
                4,
            ),
        )
        .select(
            "rank",
            F.col(group_col),
            F.col("__mass").cast("bigint").alias("total_mass"),
            "share",
            "cum_share",
        )
    )


def psi_drift(
    df: DataFrame,
    period_b: Column,
    group_col: str = "event_type",
    value_col: str = "value",
    bucket_width: float = 50.0,
    n_buckets: int = 10,
    epsilon: float = 0.5,
    persist_fn=None,
) -> DataFrame:
    """X72 — population stability index between two periods, per group:
    PSI = sum_buckets (p_b - p_a) * ln(p_b / p_a) over fixed-width
    value buckets, with additive (epsilon) smoothing so empty buckets
    contribute finitely. The standard model-monitoring drift score
    (PSI > 0.25 = major shift, > 0.1 = drifting — the usual industry
    reading); here it answers "did this source's value distribution
    move between ingest windows".

    ``period_b`` is a boolean Column splitting rows into baseline
    (false) and comparison (true). Smoothed shares:
    p = (n + eps) / (N + eps * n_buckets). Buckets empty in BOTH
    periods contribute exactly zero (p_a = p_b after smoothing), so
    they are never enumerated.

    Scale: ONE corpus-touching hash agg contracts to
    (group, bucket, n_baseline, n_comparison) — conditional sums, no
    per-period branch, no full-outer bucket join — then a #groups-row
    broadcast of the period totals and one row-local fold. The
    contracted frame is persisted (it feeds the totals agg and the
    final fold; persist_fn follows the ppjoin/tfidf caller-owned
    convention). ln is engine-portable at the 4-decimal rounding the
    output carries (the q84 JS-divergence precedent). Groups present in
    only ONE period are excluded (no baseline to compare against —
    surface those through the X71 snapshot diff / a presence audit
    instead, where "new group appeared" is a first-class status rather
    than an infinite PSI).
    """
    b = F.least(
        F.floor(F.col(value_col).cast("double") / F.lit(bucket_width)),
        F.lit(n_buckets - 1),
    ).cast("int")
    wide = (
        df.select(
            F.col(group_col).alias("g"),
            period_b.cast("boolean").alias("__b"),
            b.alias("__bkt"),
        )
        .groupBy("g", "__bkt")
        .agg(
            F.sum(F.when(~F.col("__b"), 1.0).otherwise(0.0)).alias("__n_a"),
            F.sum(F.when(F.col("__b"), 1.0).otherwise(0.0)).alias("__n_b"),
        )
    )
    if persist_fn is None:
        persist_fn = default_persist  # registered; released via release_default_persists
    wide = persist_fn(wide)
    tot = wide.groupBy("g").agg(
        F.sum("__n_a").alias("__na"), F.sum("__n_b").alias("__nb")
    )
    eps = F.lit(float(epsilon))
    nb = F.lit(float(n_buckets))
    j = (
        wide.join(F.broadcast(tot), "g")
        .filter((F.col("__na") > 0) & (F.col("__nb") > 0))
        .withColumn("__pa", (F.col("__n_a") + eps) / (F.col("__na") + eps * nb))
        .withColumn("__pb", (F.col("__n_b") + eps) / (F.col("__nb") + eps * nb))
    )
    return (
        j.groupBy("g")
        .agg(
            F.round(
                F.sum(
                    (F.col("__pb") - F.col("__pa"))
                    * F.log(F.col("__pb") / F.col("__pa"))
                ),
                4,
            ).alias("psi"),
            F.max("__na").cast("bigint").alias("n_baseline"),
            F.max("__nb").cast("bigint").alias("n_comparison"),
        )
        .select(F.col("g").alias(group_col), "psi", "n_baseline", "n_comparison")
    )


def distinct_rollup(
    df: DataFrame,
    group_col: str,
    value_col: str,
    shard_col: Column | str | None = None,
    lg_config_k: int = 12,
    persist_fn=None,
) -> DataFrame:
    """X84 — mergeable distinct-count rollup via DataSketches HLL
    (Spark 3.5+ ``hll_sketch_agg``/``hll_union_agg``): per-shard
    sketches roll up to per-group AND global distinct estimates
    WITHOUT re-touching the raw data — the canonical 100 TB datacube
    pattern, where daily/partition sketches are materialized once and
    every coarser rollup is a cheap sketch union (impossible with
    plain ``approx_count_distinct``, whose result is a scalar that
    cannot merge).

    Plan: stage 1 = one hash agg to (group, shard, sketch) — at scale
    this is the frame a pipeline persists incrementally per ingest
    batch; stage 2 = per-group sketch union + estimate; stage 3 = one
    more union over the #groups-row frame for the global row. Raw
    data is scanned ONCE; every exchange above stage 1 carries
    fixed-size (~2^lg_config_k bytes) sketch blobs.

    Output: ('group', key, estimate) rows plus one ('total', NULL,
    estimate) row. Estimates carry HLL error (~1.04/sqrt(2^lgK));
    the declared query (q121) emits bound-validation booleans against
    exact distinct counts, the q43 oracle convention.
    """
    shard = (
        (F.col(shard_col) if isinstance(shard_col, str) else shard_col)
        if shard_col is not None
        else F.spark_partition_id()
    )
    shards = df.select(
        F.col(group_col).alias("key"), shard.alias("__shard"),
        F.col(value_col).alias("__v"),
    ).groupBy("key", "__shard").agg(
        F.hll_sketch_agg("__v", F.lit(lg_config_k)).alias("__sk")
    )
    # the per-shard sketch frame is the natural materialization point
    # (it feeds the per-group AND the global union; unpersisted, the
    # raw scan + sketch agg replay once per reference) — persist it
    # (ppjoin convention, caller-scoped); groups x shards rows of
    # fixed-size blobs, model-bounded
    if persist_fn is None:
        persist_fn = default_persist  # registered; released via release_default_persists
    shards = persist_fn(shards)
    per_group = shards.groupBy("key").agg(
        F.hll_union_agg("__sk", F.lit(False)).alias("__sk")
    )
    groups = per_group.select(
        F.lit("group").alias("level"),
        F.col("key").cast("string").alias("key"),
        F.hll_sketch_estimate("__sk").cast("bigint").alias("estimate"),
    )
    total = shards.agg(
        F.hll_sketch_estimate(
            F.hll_union_agg("__sk", F.lit(False))
        ).cast("bigint").alias("estimate")
    ).select(
        F.lit("total").alias("level"),
        F.lit(None).cast("string").alias("key"),
        "estimate",
    )
    return groups.unionByName(total)


def purged_time_split(
    df: DataFrame,
    ts_col: str = "ts",
    test_start: str = "2024-01-22",
    embargo_hours: int = 24,
) -> DataFrame:
    """X90 — purged/embargoed temporal split (the de Prado
    time-series CV discipline, "Advances in Financial Machine
    Learning" 2018 — public): rows strictly before
    ``test_start - embargo`` are TRAIN, rows at/after ``test_start``
    are TEST, and the embargo band in between is DROPPED from both —
    the gap that stops look-ahead leakage when features aggregate a
    trailing window (a train row whose feature window reaches into
    test time is memorizing the future). Random/hash splits (X36)
    cannot give this guarantee for temporal features; this operator
    completes the leakage family (q48 hash split, q76 group-safe
    split, q87 cross-split audit).

    Pure row-local projection — one scan, zero shuffle; the split
    column composes with any downstream stratified sampling.
    Returns the frame with a ``split`` column
    ('train' | 'embargo' | 'test').
    """
    boundary = F.to_timestamp(F.lit(test_start))
    purge_start = boundary - F.expr(
        f"make_interval(0, 0, 0, 0, {int(embargo_hours)})"
    )
    split = (
        F.when(F.col(ts_col) < purge_start, F.lit("train"))
        .when(F.col(ts_col) >= boundary, F.lit("test"))
        .otherwise(F.lit("embargo"))
    )
    return df.withColumn("split", split)


def k_anonymity_audit(
    df: DataFrame,
    qi_cols: list[str],
    sensitive_col: str,
    k: int = 5,
) -> DataFrame:
    """X92 — k-anonymity / l-diversity audit over a quasi-identifier
    tuple (Sweeney's k-anonymity, IJUFKS 2002; Machanavajjhala's
    l-diversity, TKDD 2007 — both public): every release of
    user-adjacent training data needs the "smallest crowd you can
    hide in" number before it ships. A row is k-anonymous iff at
    least ``k`` rows share its QI tuple; its l-diversity is the
    number of distinct sensitive values inside that crowd (a crowd of
    50 that all share one diagnosis still leaks).

    Shape: ONE hash agg on the QI tuple — group size +
    distinct-sensitive count per equivalence class — which is also
    the model frame a suppression pass would join back on. At 100 TB
    this is a plain combinable groupBy; no windows, no self-joins.
    Returns one row per equivalence class:
    (*qi_cols, class_size, l_distinct, violates_k).
    """
    return df.groupBy(*qi_cols).agg(
        F.count("*").cast("bigint").alias("class_size"),
        F.count_distinct(F.col(sensitive_col)).cast("bigint").alias(
            "l_distinct"
        ),
    ).withColumn("violates_k", F.col("class_size") < F.lit(int(k)))


def ks_two_sample(
    df: DataFrame,
    group_col: str,
    value_col: str,
    group_a: str,
    group_b: str,
    bucket_width: float = 16.0,
    persist_fn=None,
) -> DataFrame:
    """X93 — exact two-sample Kolmogorov-Smirnov statistic between two
    groups' value distributions: D = sup_x |F_a(x) - F_b(x)|. The
    nonparametric complement of PSI (X72): PSI needs a binning
    choice and goes blind inside a bin; KS is binning-free and exact,
    the standard drift/shift test when the value is continuous.

    Scale shape: the corpus contracts FIRST to one row per distinct
    value carrying (cnt_a, cnt_b) — a plain combinable hash agg — and
    that distinct-value frame is the ONLY thing every later stage
    reads (``persist_fn`` scopes its cache; the totals/max/argmax
    stages would otherwise replay the corpus scan). Both CDF running
    totals ride ONE bucket-decomposed pass (the X16
    bucketed_prefix_sum argument, fused for the two count columns:
    intra-bucket window + #buckets-row offset frame), so no single
    task ever sorts the whole domain (the naive global
    ``Window.orderBy(value)`` is the low-cardinality window trap).
    The final sup-reduction is an ordinary max agg; the argmax value
    is tie-broken to the smallest x attaining D. Totals join as a
    1-row broadcast.

    Returns ONE row: (n_a, n_b, d_stat, d_at_value). Both engines
    compute the same integer cumsums and the same float64 divisions
    in the same order, so d_stat agrees bit-for-bit before rounding.
    """
    per_val = _two_group_per_value(
        df, group_col, value_col, group_a, group_b
    )
    if persist_fn is not None:
        per_val = persist_fn(per_val)
    return ks_from_per_value(per_val, [], bucket_width)


def _two_group_per_value(
    df: DataFrame,
    group_col: str,
    value_col: str,
    group_a: str,
    group_b: str,
) -> DataFrame:
    """Contract a two-group sample to one row per distinct value
    carrying both counts — the shared frame under KS (X93) and the
    rank-sum test (X96)."""
    two = df.filter(F.col(group_col).isin([group_a, group_b])).select(
        F.col(group_col).alias("__g"),
        F.col(value_col).cast("double").alias("__v"),
    )
    return two.groupBy("__v").agg(
        F.sum(F.when(F.col("__g") == group_a, 1).otherwise(0))
        .cast("bigint")
        .alias("__ca"),
        F.sum(F.when(F.col("__g") == group_b, 1).otherwise(0))
        .cast("bigint")
        .alias("__cb"),
    )


def _cdf_cumsums(
    per_val: DataFrame, part_cols: list[str], bucket_width: float
) -> DataFrame:
    """Both running totals in ONE bucket-decomposed pass (the X16
    argument): __v is the (distinct, hence unique) numeric order key
    within each partition; no single task sorts a whole domain."""
    base = per_val.withColumn(
        "__bkt", F.floor(F.col("__v") / F.lit(bucket_width)).cast("long")
    )
    w_in = Window.partitionBy(*part_cols, "__bkt").orderBy("__v")
    intra = base.withColumn("__ia", F.sum("__ca").over(w_in)).withColumn(
        "__ib", F.sum("__cb").over(w_in)
    )
    w_b = Window.partitionBy(*part_cols).orderBy("__bkt")
    offsets = (
        base.groupBy(*part_cols, "__bkt")
        .agg(F.sum("__ca").alias("__ba"), F.sum("__cb").alias("__bb"))
        .withColumn("__offa", F.sum("__ba").over(w_b) - F.col("__ba"))
        .withColumn("__offb", F.sum("__bb").over(w_b) - F.col("__bb"))
        .select(*part_cols, "__bkt", "__offa", "__offb")
    )
    return (
        intra.join(offsets, [*part_cols, "__bkt"])
        .withColumn("__cuma", F.col("__ia") + F.col("__offa"))
        .withColumn("__cumb", F.col("__ib") + F.col("__offb"))
    )


def ks_from_per_value(
    per_val: DataFrame,
    part_cols: list[str],
    bucket_width: float = 16.0,
) -> DataFrame:
    """KS core over an already-contracted per-distinct-value frame
    (*part_cols, __v, __ca, __cb) — one result row per partition.
    Shared by :func:`ks_two_sample` (no partitions) and the streaming
    drift twin (one partition per monitored group)."""
    cum = _cdf_cumsums(per_val, part_cols, bucket_width)
    totals = per_val.groupBy(*part_cols).agg(
        F.sum("__ca").cast("bigint").alias("n_a"),
        F.sum("__cb").cast("bigint").alias("n_b"),
    )
    joined = (
        cum.join(F.broadcast(totals), part_cols)
        if part_cols
        else cum.crossJoin(F.broadcast(totals))
    )
    diffs = joined.select(
        *part_cols,
        "n_a",
        "n_b",
        "__v",
        F.abs(
            F.col("__cuma") / F.col("n_a") - F.col("__cumb") / F.col("n_b")
        ).alias("__diff"),
    )
    keys = [*part_cols, "n_a", "n_b"]
    dmax = diffs.groupBy(*keys).agg(F.max("__diff").alias("__d"))
    return (
        diffs.join(F.broadcast(dmax), keys)
        .filter(F.col("__diff") == F.col("__d"))
        .groupBy(*keys, "__d")
        .agg(F.min("__v").alias("__dv"))
    ).select(
        *keys,
        (F.round(F.col("__d"), 4) + F.lit(0.0)).alias("d_stat"),
        (F.round(F.col("__dv"), 4) + F.lit(0.0)).alias("d_at_value"),
    )


def rank_sum_test(
    df: DataFrame,
    group_col: str,
    value_col: str,
    group_a: str,
    group_b: str,
    bucket_width: float = 16.0,
    persist_fn=None,
) -> DataFrame:
    """X96 — Mann-Whitney U / Wilcoxon rank-sum test (Mann & Whitney
    1947, public; the standard nonparametric location-shift test):
    completes the drift family — PSI (X72) is binned, KS (X93) is
    sensitive to any CDF gap, the rank-sum z pins a *location* shift
    and is the one with a usable normal approximation at scale.

    Midranks come FREE from the X93 contraction: with one row per
    distinct value carrying (cnt_a, cnt_b), the midrank of a tied
    value block is (rows before it) + (block + 1) / 2 — no per-row
    ranking pass at all, just the same fused bucket-decomposed
    cumsums. R_a = sum(cnt_a * midrank); U_a = R_a - n_a(n_a+1)/2;
    z uses the tie-corrected variance
    sigma^2 = (n_a n_b / 12) ((N+1) - sum(t^3 - t) / (N(N-1))).

    Returns ONE row: (n_a, n_b, u_a, z). ``persist_fn`` scopes the
    distinct-value frame (read by the cumsum, totals and moment
    stages).
    """
    per_val = _two_group_per_value(
        df, group_col, value_col, group_a, group_b
    )
    if persist_fn is not None:
        per_val = persist_fn(per_val)
    cum = _cdf_cumsums(per_val, [], bucket_width)
    totals = per_val.agg(
        F.sum("__ca").cast("bigint").alias("n_a"),
        F.sum("__cb").cast("bigint").alias("n_b"),
    )
    t = (F.col("__ca") + F.col("__cb")).cast("double")
    before = (
        (F.col("__cuma") + F.col("__cumb")).cast("double") - t
    )
    midrank = before + (t + F.lit(1.0)) / F.lit(2.0)
    moments = (
        cum.crossJoin(F.broadcast(totals))
        .groupBy("n_a", "n_b")
        .agg(
            F.sum(F.col("__ca").cast("double") * midrank).alias("__ra"),
            F.sum(t * t * t - t).alias("__ties"),
        )
    )
    na = F.col("n_a").cast("double")
    nb = F.col("n_b").cast("double")
    nn = na + nb
    u_a = F.col("__ra") - na * (na + F.lit(1.0)) / F.lit(2.0)
    mu = na * nb / F.lit(2.0)
    sigma2 = (
        na
        * nb
        / F.lit(12.0)
        * ((nn + F.lit(1.0)) - F.col("__ties") / (nn * (nn - F.lit(1.0))))
    )
    z = F.when(
        sigma2 > 0, (u_a - mu) / F.sqrt(sigma2)
    ).otherwise(F.lit(0.0))
    return moments.select(
        "n_a",
        "n_b",
        (F.round(u_a, 4) + F.lit(0.0)).alias("u_a"),
        (F.round(z, 4) + F.lit(0.0)).alias("z"),
    )


def chi2_independence(
    df: DataFrame,
    col_a: str,
    col_b: str,
    persist_fn=None,
) -> DataFrame:
    """X97 — chi-squared test of independence between two categorical
    columns + Cramér's V effect size (Pearson 1900 / Cramér 1946,
    public): the categorical complement of the numeric drift tests —
    "is lang independent of source" is the first question about any
    stratified corpus, and V is the [0, 1] association strength that
    survives row-count changes (chi2 alone grows linearly with n).

    Scale shape: the corpus contracts to the observed contingency
    cells (one combinable hash agg, |A| x |B| rows max); margins are
    two aggs OVER THE CELL FRAME (the corpus is scanned once); the
    full expected grid is margin x margin — model-sized crossJoin of
    two broadcast frames — left-joined against observed cells so
    zero-observed cells contribute their full expected mass, exactly
    the textbook statistic. ``persist_fn`` scopes the cell frame —
    margins, totals and the grid join all read it, and without the
    cache each replays the corpus scan. Returns ONE row:
    (n, dof, chi2, cramers_v).

    NULL categories are excluded up front (ADVICE r8): a NULL cell
    would survive the groupBy (margins and __n see its mass) but never
    match the (__a, __b) equi-join from the expected grid, so its
    observed count silently dropped while its expected mass stayed —
    inflating chi2 — and count_distinct's NULL exclusion made dof
    disagree with the margin frame. The test contract is pairwise
    complete observations: every frame (observed, margins, __n, __ra/
    __rb) sees the same NULL-free population.
    """
    cells = (
        df.filter(F.col(col_a).isNotNull() & F.col(col_b).isNotNull())
        .select(F.col(col_a).alias("__a"), F.col(col_b).alias("__b"))
        .groupBy("__a", "__b")
        .agg(F.count("*").cast("double").alias("__o"))
    )
    if persist_fn is not None:
        cells = persist_fn(cells)
    ma = cells.groupBy("__a").agg(F.sum("__o").alias("__na"))
    mb = cells.groupBy("__b").agg(F.sum("__o").alias("__nb"))
    tot = cells.agg(
        F.sum("__o").alias("__n"),
        F.count_distinct("__a").cast("double").alias("__ra"),
        F.count_distinct("__b").cast("double").alias("__rb"),
    )
    grid = (
        ma.crossJoin(F.broadcast(mb))
        .join(cells, ["__a", "__b"], "left")
        .crossJoin(F.broadcast(tot))
        .withColumn("__e", F.col("__na") * F.col("__nb") / F.col("__n"))
        .withColumn("__o0", F.coalesce(F.col("__o"), F.lit(0.0)))
    )
    agg = grid.groupBy("__n", "__ra", "__rb").agg(
        F.sum(
            (F.col("__o0") - F.col("__e"))
            * (F.col("__o0") - F.col("__e"))
            / F.col("__e")
        ).alias("__chi2")
    )
    dof = (F.col("__ra") - 1) * (F.col("__rb") - 1)
    v = F.when(
        (F.col("__n") > 0) & (F.least("__ra", "__rb") > 1),
        F.sqrt(
            F.col("__chi2")
            / (F.col("__n") * (F.least("__ra", "__rb") - 1))
        ),
    ).otherwise(F.lit(0.0))
    return agg.select(
        F.col("__n").cast("bigint").alias("n"),
        dof.cast("bigint").alias("dof"),
        (F.round(F.col("__chi2"), 4) + F.lit(0.0)).alias("chi2"),
        (F.round(v, 4) + F.lit(0.0)).alias("cramers_v"),
    )


def shrunk_group_means(
    df: DataFrame,
    group_cols: list[str],
    value_col: str,
    m: float = 100.0,
    persist_fn=None,
) -> DataFrame:
    """X98 — empirical-Bayes shrunk group means ("Bayesian average",
    the IMDb/Evan Miller ranking formula — public): raw per-group
    means rank a 3-row group above a 30,000-row one on noise; the
    shrunk mean (n * mean + m * prior) / (n + m) pulls small groups
    toward the global prior with strength ``m`` (the pseudo-count),
    which is how per-domain/per-source quality leaderboards are
    actually sorted before sampling decisions.

    Scale shape: ONE combinable hash agg to (group, n, sum); the
    global prior is a second agg over THAT contracted frame (1-row
    broadcast) — the corpus is scanned once when ``persist_fn`` scopes
    the contracted frame (prior + projection both read it). Emits
    (*group_cols, n, raw_mean, shrunk_mean).
    """
    per = df.groupBy(*group_cols).agg(
        F.count("*").cast("bigint").alias("n"),
        F.sum(F.col(value_col).cast("double")).alias("__s"),
    )
    if persist_fn is not None:
        per = persist_fn(per)
    prior = per.agg(
        (F.sum("__s") / F.sum("n")).alias("__gmean")
    )
    mm = F.lit(float(m))
    return (
        per.crossJoin(F.broadcast(prior))
        .withColumn("raw_mean", F.col("__s") / F.col("n"))
        .withColumn(
            "shrunk_mean",
            (F.col("__s") + mm * F.col("__gmean")) / (F.col("n") + mm),
        )
        .select(*group_cols, "n", "raw_mean", "shrunk_mean")
    )


def weighted_quantile(
    df: DataFrame,
    part_cols: list[str],
    value_col: str,
    weight_col: str,
    quantiles: list[tuple[int, int]] = ((1, 4), (2, 4), (3, 4)),
    bucket_width: float = 16.0,
    persist_fn=None,
) -> DataFrame:
    """X100 — exact weighted quantiles per group without a single-task
    sort: the smallest value v where cumweight(v) >= q * totalweight
    (the lower weighted-quantile convention). Weighted thresholds are
    how quality gates and winsorization run when rows carry sampling
    or importance weights — the unweighted percentile family
    (X35/X81) silently miscounts there.

    Scale + determinism shape: contract to one row per (group,
    distinct value) carrying the weight sum; running weight rides the
    X16 bucket decomposition partitioned by group. Quantiles are
    RATIONAL (num, den) pairs and every comparison is
    ``den * cumw >= num * totw`` in EXACT decimal arithmetic — a
    float cumsum regrouped by the bucket decomposition could flip a
    borderline >= at the last ulp, so no float ever reaches the
    boundary test (weights enter as DECIMAL(28,6); decimal * integer
    is exact in Spark and DuckDB alike). One conditional-min agg per
    quantile emits the picked values; ``persist_fn`` scopes the
    contracted frame.
    """
    w = F.col(weight_col).cast("decimal(28,6)")
    per_val = (
        df.select(
            *[F.col(c) for c in part_cols],
            F.col(value_col).cast("double").alias("__v"),
            w.alias("__w"),
        )
        .groupBy(*part_cols, "__v")
        .agg(F.sum("__w").alias("__wv"))
    )
    if persist_fn is not None:
        per_val = persist_fn(per_val)
    base = per_val.withColumn(
        "__bkt", F.floor(F.col("__v") / F.lit(bucket_width)).cast("long")
    )
    w_in = Window.partitionBy(*part_cols, "__bkt").orderBy("__v")
    intra = base.withColumn("__iw", F.sum("__wv").over(w_in))
    w_b = Window.partitionBy(*part_cols).orderBy("__bkt")
    offsets = (
        base.groupBy(*part_cols, "__bkt")
        .agg(F.sum("__wv").alias("__bw"))
        .withColumn("__off", F.sum("__bw").over(w_b) - F.col("__bw"))
        .select(*part_cols, "__bkt", "__off")
    )
    cum = (
        intra.join(offsets, [*part_cols, "__bkt"])
        .withColumn(
            "__cumw", F.col("__iw") + F.coalesce(F.col("__off"), F.lit(0))
        )
    )
    totals = per_val.groupBy(*part_cols).agg(
        F.sum("__wv").alias("__totw")
    )
    joined = (
        cum.join(F.broadcast(totals), part_cols)
        if part_cols
        else cum.crossJoin(F.broadcast(totals))
    )
    aggs = [
        F.min(
            F.when(
                F.col("__cumw") * F.lit(den) >= F.col("__totw") * F.lit(num),
                F.col("__v"),
            )
        ).alias(f"wq_{num}_{den}")
        for num, den in quantiles
    ]
    return joined.groupBy(*part_cols).agg(*aggs)


def benford_audit(
    df: DataFrame,
    value_col: str,
    scale: int = 100,
) -> DataFrame:
    """X101 — Benford's-law first-digit audit (Benford 1938 / Newcomb
    1881, public): naturally occurring multi-scale magnitudes put
    digit d first with probability log10(1 + 1/d); synthetic,
    capped, or tampered value columns break the curve — the classic
    one-pass data-forensics screen for an ingested numeric feed.

    Determinism shape: the first digit is extracted from the INTEGER
    string of round(value * scale) (``scale`` = 100 for 2-decimal
    feeds) — never from floor(log10(x)), where two engines' libm can
    disagree at exact powers of ten and shift a digit bucket. One
    hash agg on the digit; the expected curve is a 9-value literal
    projection. Emits one row per digit 1-9: (digit, n, obs_share,
    exp_share, dev) with dev = obs - exp.

    Values in (0, 0.5/scale) round to zero cents and would emit a
    digit-0 row with NULL exp_share/dev (digit 0 has no Benford mass);
    the population is filtered on the DERIVED digit (ADVICE r8), so
    such sub-resolution values are excluded from n, the shares, and
    the output alike — the audit covers values the feed's declared
    resolution can represent.
    """
    cents = F.round(F.col(value_col).cast("double") * F.lit(float(scale)), 0)
    digit = F.substring(cents.cast("bigint").cast("string"), 1, 1).cast(
        "int"
    )
    counts = (
        df.filter(F.col(value_col).cast("double") > 0)
        .select(digit.alias("digit"))
        .filter(F.col("digit").between(1, 9))
        .groupBy("digit")
        .agg(F.count("*").cast("bigint").alias("n"))
    )
    tot = counts.agg(F.sum("n").cast("double").alias("__tot"))
    import math as _math

    exp_map = F.create_map(
        *[
            x
            for d in range(1, 10)
            for x in (F.lit(d), F.lit(_math.log10(1.0 + 1.0 / d)))
        ]
    )
    return (
        counts.crossJoin(F.broadcast(tot))
        .withColumn("obs_share", F.col("n") / F.col("__tot"))
        .withColumn("exp_share", exp_map[F.col("digit")])
        .select(
            "digit",
            "n",
            (F.round(F.col("obs_share"), 4) + F.lit(0.0)).alias("obs_share"),
            (F.round(F.col("exp_share"), 4) + F.lit(0.0)).alias("exp_share"),
            (
                F.round(F.col("obs_share") - F.col("exp_share"), 4)
                + F.lit(0.0)
            ).alias("dev"),
        )
    )


def welch_t_test(
    df: DataFrame,
    group_col: str,
    value_col: str,
    group_a: str,
    group_b: str,
) -> DataFrame:
    """X102 — Welch's unequal-variance t-test (Welch 1947, public):
    the parametric member of the drift family (X72 PSI binned / X93
    KS any-gap / X96 rank-sum location / this one: mean shift with a
    proper df under unequal variances — the default two-sample t
    recommendation since Ruxton 2006).

    ONE hash agg: per-group (n, avg, var_samp) — var_samp is Spark's
    stable CentralMomentAgg (the X76 lesson: never hand-build the
    raw-moment form). t = (m_a - m_b) / sqrt(v_a/n_a + v_b/n_b);
    df by Welch-Satterthwaite. Returns ONE row:
    (n_a, n_b, mean_a, mean_b, t_stat, df).
    """
    g = F.col(group_col)
    v = F.col(value_col).cast("double")
    agged = df.filter(g.isin([group_a, group_b])).agg(
        F.sum(F.when(g == group_a, 1).otherwise(0)).cast("bigint").alias("n_a"),
        F.sum(F.when(g == group_b, 1).otherwise(0)).cast("bigint").alias("n_b"),
        F.avg(F.when(g == group_a, v)).alias("__ma"),
        F.avg(F.when(g == group_b, v)).alias("__mb"),
        F.var_samp(F.when(g == group_a, v)).alias("__va"),
        F.var_samp(F.when(g == group_b, v)).alias("__vb"),
    )
    sa = F.col("__va") / F.col("n_a")
    sb = F.col("__vb") / F.col("n_b")
    se2 = sa + sb
    # degenerate samples guard (found by the round-9 brute-force
    # property test under ANSI mode): two zero-variance samples make
    # se2 and the W-S denominator 0, and the bare divisions raise
    # DIVIDE_BY_ZERO instead of returning a row. The test is simply
    # undefined there — emit NULL t/df (mean_a/mean_b still carry the
    # comparison) rather than crashing the job.
    dof_den = sa * sa / (F.col("n_a") - 1) + sb * sb / (F.col("n_b") - 1)
    t = F.when(se2 > 0, (F.col("__ma") - F.col("__mb")) / F.sqrt(se2))
    dof = F.when(dof_den > 0, (se2 * se2) / dof_den)
    return agged.select(
        "n_a",
        "n_b",
        (F.round(F.col("__ma"), 4) + F.lit(0.0)).alias("mean_a"),
        (F.round(F.col("__mb"), 4) + F.lit(0.0)).alias("mean_b"),
        (F.round(t, 4) + F.lit(0.0)).alias("t_stat"),
        (F.round(dof, 4) + F.lit(0.0)).alias("df"),
    )


def diversity_audit(
    df: DataFrame,
    group_col: str,
    cat_col: str,
) -> DataFrame:
    """X104 — categorical diversity audit per group: Shannon entropy
    H = -sum p ln p, normalized entropy H / ln(k), effective category
    count exp(H) (Hill number of order 1), and Gini-Simpson
    1 - sum p^2 — the standard mix diagnostics (Shannon 1948 /
    Simpson 1949 / Hill 1973, all public) a corpus curator reads per
    source before setting mixing weights: a source whose language
    entropy collapsed got monolingual upstream, and "effective
    languages" is the number that goes in the report.

    Scale shape: one combinable hash agg to the (group, category)
    count frame (bounded by #groups x alphabet), a second agg over
    THAT frame computes every statistic — the corpus is scanned once,
    and no probability ever leaves the contracted frame. Emits
    (group, n, k, entropy, norm_entropy, eff_cats, gini).
    """
    counts = (
        df.select(
            F.col(group_col).alias("__g"), F.col(cat_col).alias("__c")
        )
        .groupBy("__g", "__c")
        .agg(F.count("*").cast("double").alias("__n"))
    )
    w_g = Window.partitionBy("__g")
    p = F.col("__n") / F.sum("__n").over(w_g)
    per = counts.withColumn("__p", p)
    agged = per.groupBy("__g").agg(
        F.sum("__n").cast("bigint").alias("n"),
        F.count("*").cast("bigint").alias("k"),
        (-F.sum(F.col("__p") * F.log("__p"))).alias("__h"),
        (F.lit(1.0) - F.sum(F.col("__p") * F.col("__p"))).alias("__gini"),
    )
    norm = F.when(
        F.col("k") > 1, F.col("__h") / F.log(F.col("k").cast("double"))
    ).otherwise(F.lit(0.0))
    return agged.select(
        F.col("__g").alias(group_col),
        "n",
        "k",
        (F.round(F.col("__h"), 4) + F.lit(0.0)).alias("entropy"),
        (F.round(norm, 4) + F.lit(0.0)).alias("norm_entropy"),
        (F.round(F.exp(F.col("__h")), 4) + F.lit(0.0)).alias("eff_cats"),
        (F.round(F.col("__gini"), 4) + F.lit(0.0)).alias("gini"),
    )


def grouped_mad(
    df: DataFrame,
    group_col: str,
    value_col: str,
    scale: float = 1.0,
    persist_fn=None,
) -> DataFrame:
    """X106 — per-group median absolute deviation (Hampel 1974,
    public; ``scale=1.4826`` makes it a consistent sigma estimate for
    normal data): THE robust dispersion number — one corrupt ingest
    batch can drag a stddev arbitrarily far, but moving the MAD
    requires corrupting half the group. Completes the robust family
    (X81 gives median/IQR per embedding dimension; this is the scalar
    per-group form quality gates actually threshold on).

    Exact two-pass: per-group median (Spark's exact ``percentile`` —
    linear interpolation, the X81 engine-shared convention), broadcast
    back as a #groups-row frame, then the median of absolute
    deviations in a second agg. Exact medians genuinely need the
    values — this is also the DuckDB-checkable oracle form; at 100 TB
    swap ``percentile`` for ``percentile_approx`` in the same shape
    (the X68/X81 convention). ``persist_fn`` scopes the projected
    (group, value) frame read by both passes. Emits
    (group, n, median, mad).
    """
    d = df.select(
        F.col(group_col).alias("__g"),
        F.col(value_col).cast("double").alias("__v"),
    )
    if persist_fn is not None:
        d = persist_fn(d)
    med = d.groupBy("__g").agg(
        F.count("*").cast("bigint").alias("n"),
        F.percentile("__v", F.lit(0.5)).alias("__med"),
    )
    out = (
        d.join(F.broadcast(med), "__g")
        .groupBy("__g", "n", "__med")
        .agg(
            F.percentile(
                F.abs(F.col("__v") - F.col("__med")), F.lit(0.5)
            ).alias("__mad")
        )
    )
    return out.select(
        F.col("__g").alias(group_col),
        "n",
        (F.round(F.col("__med"), 4) + F.lit(0.0)).alias("median"),
        (F.round(F.col("__mad") * F.lit(float(scale)), 4) + F.lit(0.0)).alias(
            "mad"
        ),
    )


def sliding_distinct(
    df: DataFrame,
    ts_col: str = "ts",
    entity_col: str = "user_id",
    window_days: int = 7,
    lg_config_k: int = 14,
    persist_fn=None,
) -> DataFrame:
    """X112 — trailing-window distinct entities per day via MERGEABLE
    sketch unions: the "7-day active users" family, and the workload
    that justifies X84's HLL choice — a trailing window needs every
    day's distinct set merged into every overlapping window, which an
    unmergeable ``approx_count_distinct`` scalar cannot do and an
    exact recount pays the raw scan once PER DAY of overlap (7x at
    week windows, 30x at month).

    Plan: raw data contracts ONCE to per-day sketches (one hash agg,
    #days rows of fixed-size blobs, persist_fn-scoped — this is the
    frame a pipeline materializes incrementally); each day's trailing
    window is a #days x #days range self-join ON THE SKETCH FRAME
    (model-sized — never the corpus) + one union-agg per day. Emits
    (day, n_days_covered, estimate). Estimates carry HLL error
    (~1.04/sqrt(2^lgK) ~ 0.8% at lgK 14); the declared query emits
    bound-validation booleans against the exact recount, the q43/q121
    oracle convention.
    """
    day = F.date_trunc("day", F.col(ts_col))
    daily = (
        df.select(day.alias("__d"), F.col(entity_col).alias("__e"))
        .groupBy("__d")
        .agg(F.hll_sketch_agg("__e", F.lit(lg_config_k)).alias("__sk"))
    )
    if persist_fn is not None:
        daily = persist_fn(daily)
    a = daily.select(F.col("__d").alias("day"))
    span = F.expr(f"INTERVAL {int(window_days) - 1} DAYS")
    joined = a.join(
        daily,
        (F.col("__d") <= F.col("day"))
        & (F.col("__d") >= F.col("day") - span),
    )
    return (
        joined.groupBy("day")
        .agg(
            F.count("*").cast("bigint").alias("n_days_covered"),
            F.hll_sketch_estimate(
                F.hll_union_agg("__sk", F.lit(False))
            ).cast("bigint").alias("estimate"),
        )
    )


def pareto_frontier(
    df: DataFrame,
    minimize_col: str,
    maximize_col: str,
) -> DataFrame:
    """X116 — 2-D Pareto skyline (Borzsony/Kossmann/Stocker ICDE 2001
    "The Skyline Operator" — public): the points not dominated by any
    other (dominator is <= on the minimized dim, >= on the maximized
    dim, strict on at least one). The multi-objective curation cut —
    e.g. the cost/quality frontier when picking sources or dedup
    thresholds. Returns one row per frontier x: (x, y, n_points) where
    n_points counts the tied rows sitting exactly on that vertex
    (mutually non-dominating by definition).

    Scale: the corpus contracts FIRST to one row per distinct
    (x, y) cell (hash agg), then to one row per distinct x (the per-x
    max y dominates every other y at that x); only then does the
    running-max window run — over the |distinct x| frame, NOT the
    corpus. For a continuous minimize_col, bucketize it before calling
    (the X16 rule: no corpus-sized single-task windows); for the
    bounded-dictionary dims this is declared for (sizes, grades,
    integer costs) the window frame is dictionary-sized by
    construction.
    """
    xy = (
        df.groupBy(
            F.col(minimize_col).alias("x"), F.col(maximize_col).alias("y")
        ).agg(F.count("*").alias("__c"))
    )
    m = xy.groupBy("x").agg(
        F.max("y").alias("y"), F.max_by("__c", "y").alias("n_points")
    )
    w = Window.orderBy(F.col("x").asc()).rowsBetween(
        Window.unboundedPreceding, -1
    )
    return (
        m.withColumn("__pm", F.max("y").over(w))
        .filter(F.col("__pm").isNull() | (F.col("y") > F.col("__pm")))
        .select("x", "y", F.col("n_points").cast("bigint").alias("n_points"))
    )


def association_rules(
    baskets: DataFrame,
    basket_col: str,
    item_col: str,
    min_pair_support: int = 2,
    persist_fn=None,
) -> DataFrame:
    """X117 — pairwise association rules (Agrawal/Srikant VLDB 1994
    Apriori, restricted to the 2-itemset level that dominates practical
    basket analysis): support / directional confidence / lift for every
    co-occurring item pair above ``min_pair_support`` baskets.

    Scale: the corpus contracts to DISTINCT (basket, item) first; the
    pair generation is a basket-keyed self-join whose per-basket work
    is C(|basket|, 2) — bounded by the basket width, never corpus-
    quadratic (the market-basket invariant; a degenerate giant basket
    is the skew axis and should be width-capped upstream). Item counts
    and the basket total are item-dictionary-sized / 1-row broadcasts.
    All counts stay integers; ratios are computed once at the end.

    NULL baskets/items are excluded up front (the X97 contract): a
    NULL item can never pair (the < comparison is NULL) yet its basket
    still inflated the support denominator; a NULL basket id joins
    nothing. Both are upstream data bugs — the operator sees neither.
    """
    # ONE basket-keyed shuffle does both the (basket, item) dedup and
    # the basket materialization: collect_set dedups items within the
    # basket, so the old [distinct shuffle + two-sided basket self-join
    # + pair agg] (three corpus-sized exchanges over the cached cell
    # frame) collapses to [groupBy(b) + row-local pair expansion + pair
    # agg] (one corpus-sized exchange + one pair-sized one). The sorted
    # array makes pair order deterministic and (x < y) positional, so
    # pair counts are identical to the join form; per-basket work is
    # C(|basket|, 2) exactly as before — the degenerate-giant-basket
    # skew axis moves from join fan-out to a row-local lambda, same
    # width-cap-upstream caveat.
    bk = (
        baskets.filter(
            F.col(basket_col).isNotNull() & F.col(item_col).isNotNull()
        )
        .select(F.col(basket_col).alias("b"), F.col(item_col).alias("i"))
        .groupBy("b")
        .agg(F.sort_array(F.collect_set("i")).alias("__items"))
    )
    # bk feeds the basket total, the item counts and the pair explode —
    # persist once (caller-owned persist_fn convention).
    if persist_fn is None:
        persist_fn = default_persist  # registered; released via release_default_persists
    bk = persist_fn(bk)
    n_row = bk.agg(F.count("*").cast("double").alias("__n"))
    icnt = bk.select(F.explode("__items").alias("i")).groupBy(F.col("i")).agg(
        F.count("*").alias("__ic")
    )
    pairs = (
        bk.select(
            F.explode(
                F.expr(
                    "flatten(transform(__items, (x, k) ->"
                    " transform(slice(__items, k + 2, size(__items)),"
                    " y -> struct(x, y))))"
                )
            ).alias("__pr")
        )
        .select(
            F.col("__pr.x").alias("item_a"), F.col("__pr.y").alias("item_b")
        )
        .groupBy("item_a", "item_b")
        .agg(F.count("*").alias("pair_n"))
        .filter(F.col("pair_n") >= min_pair_support)
    )
    # icnt: item-dictionary-sized (bounded broadcast)
    ia = icnt.select(F.col("i").alias("item_a"), F.col("__ic").alias("__ca"))
    ib = icnt.select(F.col("i").alias("item_b"), F.col("__ic").alias("__cb"))
    return (
        pairs.join(F.broadcast(ia), "item_a")
        .join(F.broadcast(ib), "item_b")
        .crossJoin(F.broadcast(n_row))
        .select(
            "item_a",
            "item_b",
            F.col("pair_n").cast("bigint").alias("pair_n"),
            (F.col("pair_n") / F.col("__n")).alias("support"),
            (F.col("pair_n") / F.col("__ca")).alias("conf_a_to_b"),
            (F.col("pair_n") / F.col("__cb")).alias("conf_b_to_a"),
            (
                F.col("pair_n") * F.col("__n")
                / (F.col("__ca") * F.col("__cb"))
            ).alias("lift"),
        )
    )


def cuped_adjust(
    events: DataFrame,
    user_col: str = "user_id",
    value_col: str = "value",
    ts_col: str = "ts",
    split_ts: str = "2024-01-15 00:00:00",
    n_variants: int = 2,
) -> DataFrame:
    """X118 — CUPED variance reduction (Deng/Xu/Kohavi/Walker WSDM
    2013 — public): per-user pre-period metric as the control
    covariate, theta = cov(pre, post) / var(pre) pooled across ALL
    users (theta is assignment-independent, the CUPED requirement),
    adjusted metric = post - theta * (pre - mean(pre)). Variant
    assignment is the deterministic ``user_id % n_variants``. Returns
    one row per variant with the post/adjusted means and variances and
    the achieved variance-reduction fraction — the experiment-
    sensitivity win the method exists for.

    Scale: ONE corpus pass contracts events to per-user (pre, post)
    sums (hash agg on user); theta and the pre-mean are a 1-row
    stable-moment agg (avg/var_samp/covar_samp CentralMomentAgg — the
    X76 lesson: never raw moments) broadcast back; the final agg is
    per-variant. Users with no pre-period activity contribute pre=0
    (the standard zero-impute; theta absorbs the offset).
    """
    per_user = (
        events.groupBy(F.col(user_col).alias("u"))
        .agg(
            F.coalesce(
                F.sum(
                    F.when(
                        F.col(ts_col) < F.lit(split_ts).cast("timestamp"),
                        F.col(value_col),
                    )
                ),
                F.lit(0.0),
            ).alias("pre"),
            F.coalesce(
                F.sum(
                    F.when(
                        F.col(ts_col) >= F.lit(split_ts).cast("timestamp"),
                        F.col(value_col),
                    )
                ),
                F.lit(0.0),
            ).alias("post"),
        )
        .withColumn("variant", F.pmod(F.col("u"), F.lit(n_variants)).cast("int"))
    )
    model = per_user.agg(
        (F.covar_samp("pre", "post") / F.var_samp("pre")).alias("__theta"),
        F.avg("pre").alias("__mpre"),
    )
    # model: 1-row theta/mean broadcast
    return (
        per_user.crossJoin(F.broadcast(model))
        .withColumn(
            "adj",
            F.col("post")
            - F.col("__theta") * (F.col("pre") - F.col("__mpre")),
        )
        .groupBy("variant")
        .agg(
            F.count("*").cast("bigint").alias("n_users"),
            F.avg("post").alias("mean_post"),
            F.avg("adj").alias("mean_adjusted"),
            F.var_samp("post").alias("var_post"),
            F.var_samp("adj").alias("var_adjusted"),
            (F.lit(1.0) - F.var_samp("adj") / F.var_samp("post")).alias(
                "var_reduction"
            ),
        )
    )


def binned_quantile_sketch(
    df: DataFrame,
    part_cols: list[str],
    value_col: str,
    bin_width: float = 25.0,
    quantiles: list[tuple[int, int]] = ((1, 2), (19, 20)),
) -> DataFrame:
    """X121 — MERGEABLE quantile sketch via fixed-width bins: the
    quantile member of the sketch trio (distinct = X84 HLL, frequency
    = X50 CMS, quantile = this). Bin counts are plain integers, so
    sketches MERGE by addition — shardable, windowable, unionable,
    everything an exact sort-based quantile is not — and the estimate
    (the lower edge of the first bin whose cumulative count reaches
    the rank) is within ONE bin width of the exact lower quantile
    (X100's convention: smallest v with cum >= q*n), provably: that
    ranked value lives inside the picked bin.

    Quantiles are RATIONAL (num, den) pairs and the boundary test is
    ``den * cum >= num * n`` in exact integer arithmetic (the X100
    rule — no float ever reaches a >=). Returns one row per group
    with ``bq_{num}_{den}`` estimate columns (bin lower edge).

    Scale: one corpus hash agg to (group, bin) counts; the cumulative
    window runs over the BIN frame — value-range/bin_width rows per
    group, corpus-size independent (the entire point). The per-group
    total is a broadcast; one conditional-min agg per quantile.
    """
    bins = (
        df.select(
            *[F.col(c) for c in part_cols],
            F.floor(F.col(value_col) / F.lit(bin_width)).cast("long").alias("__b"),
        )
        .groupBy(*part_cols, "__b")
        .agg(F.count("*").alias("__c"))
    )
    w_b = Window.partitionBy(*part_cols).orderBy("__b")
    cum = bins.withColumn("__cum", F.sum("__c").over(w_b))
    totals = bins.groupBy(*part_cols).agg(F.sum("__c").alias("__n"))
    joined = (
        cum.join(F.broadcast(totals), part_cols)
        if part_cols
        else cum.crossJoin(F.broadcast(totals))
    )
    aggs = [
        F.min(
            F.when(
                F.col("__cum") * F.lit(den) >= F.col("__n") * F.lit(num),
                F.col("__b"),
            )
        ).alias(f"__bin_{num}_{den}")
        for num, den in quantiles
    ]
    out = joined.groupBy(*part_cols).agg(*aggs)
    return out.select(
        *part_cols,
        *[
            (F.col(f"__bin_{num}_{den}") * F.lit(bin_width)).alias(
                f"bq_{num}_{den}"
            )
            for num, den in quantiles
        ],
    )


def mutual_information(
    df: DataFrame,
    x_col: str,
    y_col: str,
    persist_fn=None,
) -> DataFrame:
    """X124 — exact mutual information (bits) between two categorical
    columns, plus both marginal entropies: the feature-redundancy /
    leakage screen (a near-deterministic mapping between a feature and
    the label shows up as MI ~ min(H) long before a model overfits to
    it). MI = sum_xy p(x,y) log2( p(x,y) / (p(x) p(y)) ).

    Scale: ONE corpus hash agg to the (x, y) cell frame; the margins
    are dictionary-sized re-aggs of the CELL frame (never a second
    corpus pass); N is a 1-row broadcast. Counts stay integers; each
    log2 argument is a ratio of exact integer products, so both
    engines see identical doubles (the q153 rule).

    NULL categories are excluded up front (the X97 contract, same bug
    class as the chi2 ADVICE-r8 fix): a NULL cell survives the groupBy
    and feeds __n, but the margin equi-joins drop it — its probability
    mass silently vanishes from the MI sum while inflating N, so
    p(x,y) no longer sums to 1. Pairwise complete observations only.
    """
    cells = (
        df.filter(F.col(x_col).isNotNull() & F.col(y_col).isNotNull())
        .select(F.col(x_col).alias("x"), F.col(y_col).alias("y"))
        .groupBy("x", "y")
        .agg(F.count("*").alias("__c"))
    )
    # cells feeds both margins, the total, and the MI join — persist
    # the dictionary-sized cell frame once (caller-owned persist_fn).
    if persist_fn is None:
        persist_fn = default_persist  # registered; released via release_default_persists
    cells = persist_fn(cells)
    mx = cells.groupBy("x").agg(F.sum("__c").alias("__cx"))
    my = cells.groupBy("y").agg(F.sum("__c").alias("__cy"))
    n_row = cells.agg(F.sum("__c").cast("double").alias("__n"))
    # mx/my: dictionary-sized margins; n_row: 1-row total
    j = (
        cells.join(F.broadcast(mx), "x")
        .join(F.broadcast(my), "y")
        .crossJoin(F.broadcast(n_row))
    )
    mi = j.agg(
        F.max("__n").cast("bigint").alias("n"),
        F.sum(
            (F.col("__c") / F.col("__n"))
            * F.log2(
                F.col("__c") * F.col("__n")
                / (F.col("__cx") * F.col("__cy"))
            )
        ).alias("mi_bits"),
    )
    hx = mx.crossJoin(F.broadcast(n_row)).agg(
        (-F.sum((F.col("__cx") / F.col("__n")) * F.log2(F.col("__cx") / F.col("__n"))))
        .alias("h_x")
    )
    hy = my.crossJoin(F.broadcast(n_row)).agg(
        (-F.sum((F.col("__cy") / F.col("__n")) * F.log2(F.col("__cy") / F.col("__n"))))
        .alias("h_y")
    )
    return mi.crossJoin(F.broadcast(hx)).crossJoin(F.broadcast(hy))


def calibration_bins(
    df: DataFrame,
    score_col: str,
    label_col: str,
    n_bins: int = 10,
) -> DataFrame:
    """X125 — calibration curve (reliability diagram) bins: scores in
    [0, 1] bucketed into ``n_bins`` equal-width bins; per bin the mean
    predicted score vs the observed positive fraction — the standard
    screen for whether a quality/filter classifier's scores can be
    thresholded as probabilities. Returns (bin, n, sum_score,
    frac_positive) — the score aggregate is the SUM, not the mean
    (the documented dec4 gotcha: an AVG of arbitrary-count doubles
    can land on a 4-decimal half-way boundary; the mean is
    sum_score / n downstream).

    Scale: one hash agg; bin index is row-local arithmetic (top edge
    clamps into the last bin). frac_positive is an exact int/int
    division.
    """
    b = F.least(
        F.floor(F.col(score_col) * n_bins).cast("long"), F.lit(n_bins - 1)
    )
    return (
        df.select(
            b.alias("bin"),
            F.col(score_col).alias("__s"),
            F.col(label_col).cast("int").alias("__l"),
        )
        .groupBy("bin")
        .agg(
            F.count("*").cast("bigint").alias("n"),
            F.sum("__s").alias("sum_score"),
            (F.sum("__l") / F.count("*")).alias("frac_positive"),
        )
    )


def grouped_auc(
    df: DataFrame,
    part_cols: list[str],
    score_col: str,
    label_col: str,
    bucket_width: float = 16.0,
) -> DataFrame:
    """X126 — exact ROC AUC per group via the Mann-Whitney U statistic
    with midrank tie handling, computed in EXACT integer arithmetic
    until the single final division: AUC = (sum over positive rows of
    the midrank) - n_pos(n_pos+1)/2, over n_pos * n_neg. Doubled
    midranks keep the halves integral: 2*midrank(v) = 2*cum_below(v)
    + c(v) + 1, so U2 = sum_v pos(v) * R2(v) - n_pos*(n_pos+1) and
    AUC = U2 / (2 * n_pos * n_neg) — no float ever accumulates (the
    X100 rule).

    Scale: contract to one row per (group, distinct score) carrying
    (count, positive count); the running count rides the X16 bucket
    decomposition partitioned by group — no corpus-sized single-task
    sort, no corpus window. The per-group totals are a broadcast.
    """
    per_val = (
        df.select(
            *[F.col(c) for c in part_cols],
            F.col(score_col).cast("double").alias("__v"),
            F.col(label_col).cast("long").alias("__l"),
        )
        .groupBy(*part_cols, "__v")
        .agg(F.count("*").alias("__c"), F.sum("__l").alias("__p"))
    )
    base = per_val.withColumn(
        "__bkt", F.floor(F.col("__v") / F.lit(bucket_width)).cast("long")
    )
    w_in = Window.partitionBy(*part_cols, "__bkt").orderBy("__v")
    intra = base.withColumn("__ic", F.sum("__c").over(w_in))
    w_b = Window.partitionBy(*part_cols).orderBy("__bkt")
    offsets = (
        base.groupBy(*part_cols, "__bkt")
        .agg(F.sum("__c").alias("__bc"))
        .withColumn("__off", F.sum("__bc").over(w_b) - F.col("__bc"))
        .select(*part_cols, "__bkt", "__off")
    )
    cum = intra.join(offsets, [*part_cols, "__bkt"]).withColumn(
        "__below",
        F.col("__ic") + F.coalesce(F.col("__off"), F.lit(0)) - F.col("__c"),
    )
    # R2 = doubled midrank; U2 accumulates in exact integers
    r2 = cum.withColumn(
        "__r2", 2 * F.col("__below") + F.col("__c") + F.lit(1)
    )
    totals = per_val.groupBy(*part_cols).agg(
        F.sum("__c").alias("__n"), F.sum("__p").alias("__np")
    )
    j = (
        r2.join(F.broadcast(totals), part_cols)
        if part_cols
        else r2.crossJoin(F.broadcast(totals))
    )
    # single-class guard (round-9 degenerate-input sweep): a group with
    # zero positives or zero negatives has no ranking to score — the
    # Mann-Whitney denominator is 0 and the bare division raises under
    # ANSI mode. AUC is NULL there by contract, never a crashed job.
    denom = (
        F.lit(2.0) * F.max("__np") * (F.max("__n") - F.max("__np"))
    )
    return (
        j.groupBy(*part_cols)
        .agg(
            F.max("__n").cast("bigint").alias("n"),
            F.max("__np").cast("bigint").alias("n_pos"),
            F.when(
                denom > 0,
                (
                    F.sum(F.col("__p") * F.col("__r2"))
                    - F.max("__np") * (F.max("__np") + 1)
                )
                / denom,
            ).alias("auc"),
        )
    )


def sketch_intersection(
    df: DataFrame,
    group_col: str,
    value_col: str,
    lg_config_k: int = 14,
    persist_fn=None,
) -> DataFrame:
    """X137 — distinct-set INTERSECTION estimates between every group
    pair from mergeable HLL sketches by inclusion-exclusion:
    |A ∩ B| ~ est(A) + est(B) - est(A ∪ B), where the union is a
    sketch merge — completing the X84/X112 set-algebra story (union =
    native merge, intersection = this; sketches never see the raw
    data twice). The audience/cohort-overlap estimator at 100 TB,
    where the exact pairwise-intersection join
    (events.audience_overlap) re-scans the corpus per pair.

    Error compounds over three estimates (~3 * 1.04/sqrt(2^lgK) of
    the UNION size — the well-known inclusion-exclusion caveat, so
    small intersections of large sets are noisy); the declared query
    emits bound booleans against the exact overlap (q43 convention).

    Scale: one hash agg to the #groups sketch frame; the pair join is
    #groups^2 rows of fixed-size blobs — model-sized, corpus-free.
    """
    sk = (
        df.select(F.col(group_col).alias("g"), F.col(value_col).alias("__v"))
        .groupBy("g")
        .agg(F.hll_sketch_agg("__v", F.lit(lg_config_k)).alias("__sk"))
    )
    if persist_fn is not None:
        sk = persist_fn(sk)
    a = sk.select(F.col("g").alias("g_a"), F.col("__sk").alias("__ska"))
    b = sk.select(F.col("g").alias("g_b"), F.col("__sk").alias("__skb"))
    pairs = a.join(b, F.col("g_a") < F.col("g_b"))
    return pairs.select(
        "g_a",
        "g_b",
        F.hll_sketch_estimate("__ska").alias("est_a"),
        F.hll_sketch_estimate("__skb").alias("est_b"),
        F.hll_sketch_estimate(
            F.hll_union("__ska", "__skb")
        ).alias("est_union"),
        (
            F.hll_sketch_estimate("__ska")
            + F.hll_sketch_estimate("__skb")
            - F.hll_sketch_estimate(
                F.hll_union("__ska", "__skb")
            )
        ).alias("est_intersection"),
    )


def bh_fdr(
    df: DataFrame,
    test_col: str,
    p_col: str,
    fdr_q: float = 0.1,
    bucket_width: float = 1.0 / 64.0,
) -> DataFrame:
    """X140 — Benjamini-Hochberg step-up FDR control (B-H JRSS-B 1995
    — public): the multiple-testing closure for the drift family
    (X72/X93/X96/X102 emit one statistic per slice; run hundreds of
    slices and ~q of the "significant" ones are false — BH caps the
    expected false-discovery RATE at ``fdr_q``). Tests rank by
    (p, test) ascending; k* = max k with p_(k) <= (k/m) * q; all
    ranks <= k* reject (the step-up rule — a test can reject on the
    strength of tests below it).

    Scale: the rank rides the X16/X88 scalable_rank decomposition
    (no single-task sort even for corpus-sized test families); k* is
    one conditional-max agg joined back as a 1-row frame. Comparisons
    are double arithmetic identical in both engines (p and k/m*q are
    the same binary doubles). Returns (test, p, rank, rejected).
    """
    from .skew import scalable_rank

    base = df.select(
        F.col(test_col).alias("test"), F.col(p_col).cast("double").alias("p")
    )
    ranked = scalable_rank(
        base, [], "p", "test", bucket_width=bucket_width, out_col="rank"
    )
    # ranked feeds m, k* and the output — non-eager checkpoint
    # truncates the rank machinery out of the replays (X7 rule).
    ranked = ranked.localCheckpoint(eager=False)
    m = ranked.agg(F.count("*").cast("double").alias("__m"))
    withm = ranked.crossJoin(m)
    kmax = withm.agg(
        F.coalesce(
            F.max(
                F.when(
                    F.col("p") <= F.col("rank") / F.col("__m") * F.lit(fdr_q),
                    F.col("rank"),
                )
            ),
            F.lit(0),
        ).alias("__k")
    )
    return (
        withm.crossJoin(kmax)
        .select(
            "test",
            "p",
            F.col("rank").cast("bigint").alias("rank"),
            (F.col("rank") <= F.col("__k")).alias("rejected"),
        )
    )


def _cms_key_sketch(df: DataFrame, key_col: str, d: int, w: int) -> DataFrame:
    """X143 helper — count-min sketch of a KEY column (the X50 text
    form generalized to any join key): d md5 rows x w counters, one
    row-local posexplode + one combinable hash agg."""
    buckets = F.array(
        *[
            F.pmod(
                F.conv(
                    F.substring(
                        F.md5(
                            F.concat(
                                F.lit(f"{j}:"), F.col(key_col).cast("string")
                            )
                        ),
                        1,
                        15,
                    ),
                    16,
                    10,
                ).cast("long"),
                F.lit(w),
            )
            for j in range(d)
        ]
    )
    return (
        df.select(F.posexplode(buckets).alias("j", "bucket"))
        .groupBy("j", "bucket")
        .agg(F.count("*").cast("bigint").alias("c"))
    )


def cms_join_size(
    left: DataFrame,
    right: DataFrame,
    left_key: str,
    right_key: str,
    d: int = 4,
    w: int = 65536,
) -> DataFrame:
    """X143 — join-cardinality estimation from count-min sketches by
    inner product (Alon-Matias-Szegedy via Cormode-Muthukrishnan 2005
    — public): |L JOIN R| = sum_k nL(k) * nR(k), estimated as
    min_j sum_b cL[j][b] * cR[j][b]. The cost-based-optimizer
    primitive at 100 TB: BOTH sides contract to d*w-counter sketches
    at ingest (mergeable, X50 contract), and every join-size question
    — "can I afford this join / which order" — is answered from
    constant-size state without touching either corpus.

    Guarantees: never an underestimate (collisions only ADD); each
    hash row's excess is E[...] = (N_L * N_R - J) / w, and the min
    over d independent rows concentrates hard below a few multiples
    of that — the declared query pins both sides (q43 convention).
    All arithmetic is exact integers.

    Scale: two one-pass sketch builds + a (j, bucket)-keyed equi-join
    of two d*w frames + a d-row agg. Corpus never re-read.
    """
    skl = _cms_key_sketch(left, left_key, d, w)
    skr = _cms_key_sketch(right, right_key, d, w)
    per_row = (
        skl.withColumnRenamed("c", "__cl")
        .join(skr.withColumnRenamed("c", "__cr"), ["j", "bucket"])
        .groupBy("j")
        .agg(F.sum(F.col("__cl") * F.col("__cr")).alias("__est"))
    )
    return per_row.agg(
        F.min("__est").cast("bigint").alias("est_join_size")
    )


def robust_outlier_days(
    df: DataFrame,
    group_col: str = "event_type",
    ts_col: str = "ts",
    value_col: str = "value",
    threshold: float = 3.5,
    persist_fn=None,
) -> DataFrame:
    """X145 — robust daily-anomaly labeling by the MODIFIED z-score
    (Iglewicz-Hoaglin 1993 — public; the 3.5 cutoff is theirs):
    M = 0.6745 * (x - median) / MAD over the per-(group, day) mean
    series. The operational twin of X129's CUSUM: CUSUM finds the
    single level SHIFT, this labels individual outlier days — and
    unlike the plain z-score (X52), one corrupted day cannot drag the
    baseline it is judged against (the X106 breakdown argument).

    Composes X106 verbatim: grouped_mad's (median, mad) output —
    INCLUDING its dec4 rounding, which the oracle replays — joins back
    as a #groups-row frame. Zero-MAD groups (constant series) emit
    NULL scores rather than infinities. Returns one row per
    (group, day): (group, day, day_mean, m_score, is_outlier).

    Scale: one per-day contraction (the X127 rule), X106's exact
    two-pass on the #days-per-group frame, one broadcast join back.
    """
    day = (
        df.select(
            F.col(group_col).alias("g"),
            F.date_trunc("day", F.col(ts_col)).alias("day"),
            F.col(value_col).alias("__v"),
        )
        .groupBy("g", "day")
        # the mean drives the score; the SUM is what gets EMITTED
        # (dec4 of an arbitrary-count AVG can land on a half-way
        # boundary — hit at sf0.001 on this exact query, 38.37875)
        .agg(F.avg("__v").alias("m"), F.sum("__v").alias("day_sum"))
    )
    if persist_fn is not None:
        day = persist_fn(day)
    mm = grouped_mad(day, "g", "m", scale=1.0)
    score = F.when(
        F.col("mad") > 0,
        F.lit(0.6745) * (F.col("m") - F.col("median")) / F.col("mad"),
    )
    # mm: #groups-row median/MAD frame
    return (
        day.join(F.broadcast(mm), "g")
        .select(
            F.col("g").alias(group_col),
            "day",
            "day_sum",
            score.alias("m_score"),
            (F.abs(score) > F.lit(float(threshold))).alias("is_outlier"),
        )
    )


def quantile_normalize(
    df: DataFrame,
    group_col: str,
    value_col: str,
    n_bins: int = 256,
    persist_fn=None,
) -> DataFrame:
    """X150 — quantile normalization across groups (the
    batch-effect/scanner-effect correction standard in bioinformatics,
    Bolstad et al. 2003 — public; for training data: align per-source
    score/length distributions before a global threshold): each value
    maps to the POOLED distribution's value at its within-group
    quantile position, so every group's marginal distribution becomes
    the pooled one. Returns one row per (group, value) cell:
    (group, value, n, normalized).

    Exactness shape: the within-group position is the rational
    r / n_g (inclusive rank of the value cell); pooled segments are
    half-open rational intervals ((cum-c)/N, cum/N] that PARTITION
    (0, 1], so each cell matches exactly one segment and every
    boundary test is the cross-multiplied INTEGER comparison
    (cum-c)*n_g < r*N <= cum*n_g — no float ever reaches a boundary
    (the X100 rule). Floats appear only as the BINNING key (floor of
    the fraction x n_bins), where an ulp error merely routes the
    exact predicate through a neighbor bin's candidate list — the
    segment explode covers every bin the interval touches.

    Scale: per-(group, value) and per-value contractions; running
    counts ride the X16 bucket decomposition per group and globally;
    the mapping join is BINNED (segments explode over the fraction
    bins they span — a row-local sequence), never a cross join; all
    frames after contraction are value-dictionary-sized.
    """
    cells = (
        df.select(
            F.col(group_col).alias("g"),
            F.col(value_col).cast("double").alias("v"),
        )
        .groupBy("g", "v")
        .agg(F.count("*").alias("c"))
    )
    if persist_fn is None:
        persist_fn = default_persist  # registered; released via release_default_persists
    cells = persist_fn(cells)
    def _cum(frame: DataFrame, parts: list, cnt: str, out: str) -> DataFrame:
        # X16 bucket decomposition (the weighted_quantile shape): no
        # corpus-sized single-task value sort, per-group or global.
        b = frame.withColumn(
            "__vb", F.floor(F.col("v") / F.lit(64.0)).cast("long")
        )
        w_in = Window.partitionBy(*parts, "__vb").orderBy("v")
        intra = b.withColumn("__ic", F.sum(cnt).over(w_in))
        w_b = Window.partitionBy(*parts).orderBy("__vb")
        offs = (
            b.groupBy(*parts, "__vb")
            .agg(F.sum(cnt).alias("__bc"))
            .withColumn("__off", F.sum("__bc").over(w_b) - F.col("__bc"))
            .select(*parts, "__vb", "__off")
        )
        return (
            intra.join(offs, [*parts, "__vb"])
            .withColumn(out, F.col("__ic") + F.coalesce(F.col("__off"), F.lit(0)))
            .drop("__vb", "__ic", "__off")
        )

    gcum = _cum(cells, ["g"], "c", "r")
    gtot = cells.groupBy("g").agg(F.sum("c").alias("ng"))
    pooled = cells.groupBy("v").agg(F.sum("c").alias("pc"))
    pcum = _cum(pooled, [], "pc", "pcm")
    ntot = pooled.agg(F.sum("pc").alias("N"))
    # gtot: group-dictionary totals; ntot: 1-row pooled total
    rows = gcum.join(F.broadcast(gtot), "g").crossJoin(F.broadcast(ntot)).select(
        "g", "v", "c", "r", "ng", "N",
        F.floor(F.col("r") / F.col("ng") * n_bins).cast("long").alias("__b"),
    )
    segs = (
        pcum.crossJoin(F.broadcast(ntot))
        .select(
            F.col("v").alias("nv"),
            (F.col("pcm") - F.col("pc")).alias("lo"),
            F.col("pcm").alias("hi"),
            "N",
        )
        .select(
            "nv", "lo", "hi",
            # padded by one bin on each side (ADVICE r8): the row-side
            # bin key floor(r/ng*n_bins) and the segment-side
            # floor(lo/N*n_bins) are DIFFERENT float ratios of the same
            # rational — at an exact bin edge (r*N == hi*ng) an ulp can
            # round them to opposite sides, landing the row's bin just
            # outside the segment's exploded list so the exact integer
            # predicate never runs and the cell silently drops. The
            # exact cross-multiplied filter below rejects every false
            # candidate, so padding only costs ~2 extra candidate rows
            # per segment.
            F.explode(
                F.sequence(
                    F.greatest(
                        F.floor(F.col("lo") / F.col("N") * n_bins).cast("long")
                        - F.lit(1),
                        F.lit(0).cast("long"),
                    ),
                    F.least(
                        F.floor(F.col("hi") / F.col("N") * n_bins).cast("long")
                        + F.lit(1),
                        F.lit(n_bins).cast("long"),
                    ),
                )
            ).alias("__b"),
        )
    )
    return (
        rows.join(segs, "__b")
        .filter(
            (F.col("lo") * F.col("ng") < F.col("r") * F.col("N"))
            & (F.col("r") * F.col("N") <= F.col("hi") * F.col("ng"))
        )
        .select(
            F.col("g").alias(group_col),
            F.col("v").alias(value_col),
            F.col("c").cast("bigint").alias("n"),
            F.col("nv").alias("normalized"),
        )
    )


def spearman_corr(
    df: DataFrame,
    group_col: str,
    x_col: str,
    y_col: str,
) -> DataFrame:
    """X154 — grouped Spearman rank correlation (Spearman 1904 —
    public): Pearson on MIDRANKS, the tie-correct textbook form. The
    monotone-association member of the association family (X53 OLS is
    linear, X124 MI is categorical, this one asks "does y go up when
    x goes up" without assuming the shape) — outlier-resistant for
    the same reason as X106/X145: a wild value moves its rank by at
    most its displacement.

    Exactness shape: midranks are exact rationals computed from
    integer cumulative counts (2*midrank = 2*below + c + 1 — the X126
    doubled-midrank identity) on the per-(group, value) contraction
    and joined back by value; the final correlation is ONE stable
    F.corr agg (CentralMomentAgg — the X76 rule), matching DuckDB's
    corr at the dec4 contract.

    Scale: two dictionary contractions + two value joins + one hash
    agg; no per-group sort (ranks come from cumulative counts, not
    row_number). Returns (group, n, rho).
    """
    base = df.select(
        F.col(group_col).alias("g"),
        F.col(x_col).cast("double").alias("x"),
        F.col(y_col).cast("double").alias("y"),
    )

    def _midranks(col: str) -> DataFrame:
        per = base.groupBy("g", col).agg(F.count("*").alias("__c"))
        w = Window.partitionBy("g").orderBy(col).rowsBetween(
            Window.unboundedPreceding, 0
        )
        return (
            per.withColumn("__cum", F.sum("__c").over(w))
            .select(
                "g",
                col,
                (
                    (2 * (F.col("__cum") - F.col("__c")) + F.col("__c") + 1)
                    / 2.0
                ).alias(f"__r{col}"),
            )
        )

    rx = _midranks("x")
    ry = _midranks("y")
    ranked = base.join(rx, ["g", "x"]).join(ry, ["g", "y"])
    # Pearson from the SAME stable CentralMomentAgg family F.corr uses,
    # but with the zero-variance division guarded: a constant rank
    # column (all-tied x or y) makes Spark's own corr aggregate raise
    # DIVIDE_BY_ZERO under ANSI mode at evaluate time — a when() around
    # F.corr cannot mask it, so the division must be ours. rho is NULL
    # on the undefined domain (degenerate group), identical floats
    # otherwise up to the dec4 contract both engines round through.
    agged = ranked.groupBy("g").agg(
        F.count("*").cast("bigint").alias("n"),
        F.covar_samp("__rx", "__ry").alias("__cov"),
        F.stddev_samp("__rx").alias("__sx"),
        F.stddev_samp("__ry").alias("__sy"),
    )
    rho = F.when(
        (F.col("__sx") > 0) & (F.col("__sy") > 0),
        F.col("__cov") / (F.col("__sx") * F.col("__sy")),
    )
    return agged.select(
        F.col("g").alias(group_col), "n", rho.alias("rho")
    )
