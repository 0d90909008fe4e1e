"""Event-stream / time-series operators (SURVEY.md §2.5, W3-W6; §2.10 X5).

Batch forms built on event-time windows so the identical logical plan
runs under Structured Streaming (``F.window`` / watermark twins live in
``streaming/``). All are single-shuffle plans: one exchange on the
grouping key, partial aggregation map-side.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def tumbling_counts(
    df: DataFrame,
    duration: str,
    ts_col: str = "ts",
    type_col: str = "event_type",
    types: tuple[str, ...] = (),
) -> DataFrame:
    """W3 — tumbling windowed per-type counts.

    The reference consumes Trino's pre-decayed 1-min/5-min counters
    (models/ClusterQueriesMetrics.scala:3-15); our engine computes true
    windowed counts from the raw event stream. Conditional aggregation
    (one column per type) instead of pivot keeps the schema static for
    streaming. ``F.window`` is used (not date_trunc) so the same plan
    compiles under a streaming source.
    """
    aggs = [F.count("*").cast("bigint").alias("n_total")]
    for t in types:
        aggs.append(
            F.sum(F.when(F.col(type_col) == t, 1).otherwise(0))
            .cast("bigint")
            .alias(f"n_{t}")
        )
    return (
        df.groupBy(F.window(ts_col, duration).alias("win"))
        .agg(*aggs)
        .select(F.col("win.start").alias("win_start"), *[F.col(a) for a in
                ["n_total"] + [f"n_{t}" for t in types]])
    )


def idle_flag(counter_cols: list[Column]) -> Column:
    """W4 — idle iff every activity counter < 1 (ScalingManager.scala:110-115)."""
    cond = F.lit(True)
    for c in counter_cols:
        cond = cond & (c < 1)
    return cond


def cooldown_gate(
    df: DataFrame,
    gap: str,
    key_col: str = "user_id",
    ts_col: str = "ts",
    order_cols: tuple[str, ...] = ("ts", "event_id"),
) -> DataFrame:
    """W5 (batch form) — cooldown suppression via gaps-and-islands.

    The reference suppresses evaluation within 2 min of the last scaling
    op (ScalingManager.scala:21,38-45). Batch twin per SURVEY §2.11 Q17:
    keep a candidate action only when the previous candidate in the same
    key is more than ``gap`` older (lag-based). The streaming twin with
    the exact reset-on-observed-resize clock lives in streaming/stateful.
    """
    w = Window.partitionBy(key_col).orderBy(*[F.col(c) for c in order_cols])
    prev = F.lag(ts_col).over(w)
    return df.withColumn("__prev_ts", prev).filter(
        F.col("__prev_ts").isNull()
        | (F.col(ts_col) > F.col("__prev_ts") + F.expr(f"INTERVAL {gap}"))
    ).drop("__prev_ts")


def suspension_carry_forward(
    df: DataFrame,
    window: str,
    key_col: str = "user_id",
    ts_col: str = "ts",
    suspend_cond: Column | None = None,
    order_cols: tuple[str, ...] = ("ts", "event_id"),
) -> DataFrame:
    """W6/J6 — carry forward the last suspension timestamp per key and
    flag exclusion while within ``window`` of it.

    Mirrors Workers.scala:256-262: ``isExcluded`` is computed against the
    *previous* refresh's suspension time (``prevSuspendedTime``), not the
    current row's state — hence the window ends at 1 PRECEDING. A key
    never suspended (prev = null ≙ 0L) is not excluded.
    """
    if suspend_cond is None:
        suspend_cond = F.col("event_type") == "error"
    w = (
        Window.partitionBy(key_col)
        .orderBy(*[F.col(c) for c in order_cols])
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    last_susp = F.max(F.when(suspend_cond, F.col(ts_col))).over(w)
    return df.withColumn("last_suspended_ts", last_susp).withColumn(
        "is_excluded",
        F.col("last_suspended_ts").isNotNull()
        & (F.col(ts_col) <= F.col("last_suspended_ts") + F.expr(f"INTERVAL {window}")),
    )


def sessionize(
    df: DataFrame,
    gap: str,
    key_col: str = "user_id",
    ts_col: str = "ts",
    order_cols: tuple[str, ...] = ("ts", "event_id"),
) -> DataFrame:
    """X5 — gaps-and-islands sessionization (batch form).

    New session when the gap to the previous event exceeds ``gap``.
    Exactly one shuffle on the key; both window functions reuse the same
    sort. The streaming-native twin uses ``F.session_window`` (see
    streaming/pipeline.py) — kept separate because its boundary rule is
    strict-< where this one merges on <=, and the oracle contract is
    this lag-based form.
    """
    w = Window.partitionBy(key_col).orderBy(*[F.col(c) for c in order_cols])
    new_session = F.when(
        F.lag(ts_col).over(w).isNull()
        | (F.col(ts_col) > F.lag(ts_col).over(w) + F.expr(f"INTERVAL {gap}")),
        1,
    ).otherwise(0)
    run = Window.partitionBy(key_col).orderBy(*[F.col(c) for c in order_cols]).rowsBetween(
        Window.unboundedPreceding, 0
    )
    return df.withColumn("__new", new_session).withColumn(
        "session_idx", F.sum("__new").over(run).cast("bigint")
    ).drop("__new")


def sequence_funnel(
    events: DataFrame,
    stages: tuple[str, ...],
    user_col: str = "user_id",
    type_col: str = "event_type",
    ts_col: str = "ts",
) -> DataFrame:
    """X63 — ordered-sequence funnel: per user, the earliest time each
    stage completes AFTER the previous stage's completion (a 'view'
    before the signup does not count), rolled up to per-stage user
    counts and conversion vs stage 1. The product-analytics twin of the
    q67 curation funnel — ORDER matters here, which plain per-type mins
    get wrong.

    Scale: ONE user-keyed hash agg builds a per-stage timestamp array
    per user (unsorted — every consumer is an array_min fold), then the sequential dependency runs as a row-local
    column cascade — ``t_i = array_min(filter(a_i, x >= t_{i-1}))`` —
    and one tiny rollup emits the per-stage counts. Exchange count is
    therefore CONSTANT in len(stages) (pinned by
    test_plan_guard.py::test_sequence_funnel_exchange_count_linear_in_stages);
    the round-6 formulation (one min-agg + join pass per stage) re-shuffled
    the user key len(stages) times and its unioned branch plans re-embedded
    every stage prefix, growing the static plan quadratically. Per-user
    state is that user's event timestamps for the funnel's stages only —
    the same per-user bound as sessionization; each ``t_i`` is
    materialized as a named column so the HOF lambda binds a column
    reference, not a re-evaluated expression (no CSE in lambda bodies).
    """
    ev = events.select(
        F.col(user_col).alias("u"), F.col(type_col).alias("t"), F.col(ts_col).alias("ts")
    ).filter(F.col("t").isin(*stages))
    per_user = ev.groupBy("u").agg(
        *[
            F.collect_list(F.when(F.col("t") == s, F.col("ts"))).alias(
                f"__a{i}"
            )
            for i, s in enumerate(stages)
        ]
    )
    # array_min is NULL-safe for users with no stage-1 events
    # (element_at(.., 1) would throw under ANSI on the empty array)
    per_user = per_user.withColumn("__t0", F.array_min(F.col("__a0")))
    for i in range(1, len(stages)):
        prev = F.col(f"__t{i - 1}")
        per_user = per_user.withColumn(
            f"__t{i}",
            F.array_min(F.filter(F.col(f"__a{i}"), lambda x: x >= prev)),
        )
    totals = per_user.agg(
        *[
            F.count(F.col(f"__t{i}")).cast("bigint").alias(f"__n{i}")
            for i in range(len(stages))
        ]
    )
    stage_rows = totals.select(
        F.posexplode(
            F.array(*[F.col(f"__n{i}") for i in range(len(stages))])
        ).alias("__pos", "n_users")
    )
    names = F.array(*[F.lit(s) for s in stages])
    base = totals.select(F.col("__n0").alias("__base"))
    return (
        stage_rows.join(F.broadcast(base))
        .select(
            (F.col("__pos") + 1).cast("int").alias("stage_idx"),
            F.element_at(names, F.col("__pos") + 1).alias("stage"),
            "n_users",
            (F.col("n_users").cast("double") / F.col("__base")).alias("conversion"),
        )
    )


def cohort_retention(
    events: DataFrame,
    user_col: str = "user_id",
    ts_col: str = "ts",
    max_offset: int = 4,
) -> DataFrame:
    """X64 — weekly cohort retention: users grouped by first-seen week,
    each later week's activity expressed as a fraction of the cohort.
    The standard growth/engagement matrix; for a data pipeline it doubles
    as an ingest-source liveness report (which crawl cohorts still emit).

    Scale: two hash aggs (first-seen per user — user-keyed; the
    (cohort, offset) distinct-user count) + a user-keyed join; week
    arithmetic is row-local date_trunc math identical in both engines
    (ISO Monday truncation). The offset is CALENDAR arithmetic
    (``datediff/7``), not epoch-seconds division: both columns are
    week-truncated Mondays so datediff is an exact multiple of 7 in any
    timezone, whereas an epoch difference across a DST transition is
    604800±3600 s and a truncating cast mis-buckets the week (ADVICE
    r6). The declared-query oracle replays epoch division, which only
    agrees because load_table pins spark.sql.session.timeZone=UTC —
    this operator no longer depends on that.
    """
    ev = events.select(
        F.col(user_col).alias("u"), F.date_trunc("week", F.col(ts_col)).alias("w")
    )
    first = ev.groupBy("u").agg(F.min("w").alias("cohort_w"))
    act = (
        ev.join(first, "u")
        .withColumn(
            "week_offset",
            (F.datediff(F.col("w"), F.col("cohort_w")) / 7).cast("int"),
        )
        .filter(F.col("week_offset") <= max_offset)
        .groupBy("cohort_w", "week_offset")
        .agg(F.countDistinct("u").cast("bigint").alias("n_active"))
    )
    size = first.groupBy("cohort_w").agg(
        F.count("*").cast("bigint").alias("cohort_size")
    )
    return act.join(size, "cohort_w").select(
        "cohort_w",
        "week_offset",
        "n_active",
        "cohort_size",
        (F.col("n_active").cast("double") / F.col("cohort_size")).alias("retention"),
    )


def binned_interval_join(
    facts: DataFrame,
    intervals: DataFrame,
    fact_ts: str = "ts",
    int_start: str = "w_start",
    int_end: str = "w_end",
    equi_cols: tuple[str, ...] = (),
    bin_seconds: int = 86400,
    fact_end: str | None = None,
) -> DataFrame:
    """X89 — point-in-interval join for LARGE fact x LARGE interval
    tables: the scale form of q39's broadcast non-equi join, which
    plans a BroadcastNestedLoopJoin and dies the moment the interval
    side outgrows the broadcast threshold (promo windows, maintenance
    windows, per-entity validity ranges — all corpus-scale in
    practice).

    Decomposition: both sides key into fixed ``bin_seconds`` time bins
    — a point belongs to exactly ONE bin, an interval explodes into
    the bins it covers (row-local ``sequence``) — so the candidate
    join is a plain EQUI join on (equi_cols..., bin) that shuffles and
    AQE-balances like any other; the exact ``start <= ts < end``
    predicate filters candidates after the join. Because the point
    lands in one bin and an interval covers each bin once, no
    dedup is needed (windowed-fact variants dedup on id pairs).
    Candidate volume per fact = intervals overlapping its bin; pick
    ``bin_seconds`` near the typical interval length so each interval
    explodes into O(1) bins. Semantics: half-open [start, end),
    matching the engine's window convention; the q126 oracle replays
    it as a plain non-equi join.

    ``fact_end`` switches to the WINDOWED-fact overlap join (ranges on
    BOTH sides — q39's semantic at any scale): the fact side explodes
    into ITS covered bins too, overlap is
    ``fact_ts < int_end AND fact_end > int_start``, and the one new
    cost is a full-row ``dropDuplicates`` (a range pair can agree in
    several bins); candidates stay bin-local. The q127 oracle replays
    this variant as the plain non-equi overlap join.
    """
    if fact_end is not None:
        fb = facts.withColumn(
            "__bins",
            F.sequence(
                F.floor(
                    F.unix_timestamp(F.col(fact_ts)) / F.lit(bin_seconds)
                ).cast("long"),
                F.floor(
                    (F.unix_timestamp(F.col(fact_end)) - 1) / F.lit(bin_seconds)
                ).cast("long"),
            ),
        ).withColumn("__bin", F.explode("__bins")).drop("__bins")
    else:
        fb = facts.withColumn(
            "__bin",
            F.floor(F.unix_timestamp(F.col(fact_ts)) / F.lit(bin_seconds)).cast(
                "long"
            ),
        )
    ib = intervals.withColumn(
        "__bins",
        F.sequence(
            F.floor(
                F.unix_timestamp(F.col(int_start)) / F.lit(bin_seconds)
            ).cast("long"),
            F.floor(
                (F.unix_timestamp(F.col(int_end)) - 1) / F.lit(bin_seconds)
            ).cast("long"),
        ),
    ).withColumn("__bin", F.explode("__bins")).drop("__bins")
    if fact_end is not None:
        overlap = (F.col(fact_ts) < F.col(int_end)) & (
            F.col(fact_end) > F.col(int_start)
        )
        return (
            fb.join(ib, [*equi_cols, "__bin"])
            .filter(overlap)
            .drop("__bin")
            .dropDuplicates()
        )
    return (
        fb.join(ib, [*equi_cols, "__bin"])
        .filter(
            (F.col(fact_ts) >= F.col(int_start))
            & (F.col(fact_ts) < F.col(int_end))
        )
        .drop("__bin")
    )


def audience_overlap(
    df: DataFrame,
    entity_col: str = "user_id",
    cat_col: str = "event_type",
) -> DataFrame:
    """X95 — audience-overlap (co-occurrence) matrix between category
    pairs: for every pair of categories, how many entities touch BOTH,
    and the Jaccard of their entity sets — the source/segment-overlap
    report a corpus mix is planned from (how much of source A's user
    base is also in B decides whether their token budgets double-count).

    Scale shape: the CLASSIC trap is the distinct (entity, cat)
    self-join on entity — at 100 TB that shuffles the corpus against
    itself. Here the corpus contracts FIRST to one row per entity
    carrying its sorted distinct-category set (a combinable
    collect_set agg; the set is bounded by the category alphabet, not
    the event count), pairs are generated ROW-LOCALLY from that array
    (<= |alphabet| choose 2 per entity), and one hash agg counts each
    pair. Per-category entity totals reuse the SAME contracted frame
    (explode + count), so raw events are scanned exactly once; the
    totals join is a broadcast of #categories rows. Only co-occurring
    pairs emit rows (n_co >= 1), matching the inner-join oracle form.
    """
    sets = df.groupBy(entity_col).agg(
        F.array_sort(F.collect_set(F.col(cat_col))).alias("__cats")
    )
    arr = F.col("__cats")
    pair_arr = F.flatten(
        F.transform(
            arr,
            lambda x, i: F.transform(
                F.slice(arr, i + F.lit(2), F.size(arr)),
                lambda y: F.struct(x.alias("a"), y.alias("b")),
            ),
        )
    )
    co = (
        sets.select(F.explode(pair_arr).alias("__p"))
        .groupBy(
            F.col("__p.a").alias("type_a"), F.col("__p.b").alias("type_b")
        )
        .agg(F.count("*").cast("bigint").alias("n_co"))
    )
    tot = (
        sets.select(F.explode(arr).alias("__t"))
        .groupBy("__t")
        .agg(F.count("*").cast("bigint").alias("__n"))
    )
    return (
        co.join(
            F.broadcast(tot.select(F.col("__t"), F.col("__n").alias("n_a"))),
            co["type_a"] == F.col("__t"),
        )
        .drop("__t")
        .join(
            F.broadcast(tot.select(F.col("__t"), F.col("__n").alias("n_b"))),
            co["type_b"] == F.col("__t"),
        )
        .drop("__t")
        .withColumn(
            "jaccard",
            F.col("n_co")
            / (F.col("n_a") + F.col("n_b") - F.col("n_co")).cast("double"),
        )
    )


def time_weighted_avg(
    df: DataFrame,
    key_col: str = "user_id",
    group_col: str = "event_type",
    ts_col: str = "ts",
    value_col: str = "value",
    tiebreak_col: str = "event_id",
) -> DataFrame:
    """X107 — time-weighted average per group: each observation holds
    until the key's NEXT observation, so its weight is that holding
    duration in seconds (last observation per key carries no interval
    and is excluded — the standard step-function/LOCF convention a
    metering or utilization pipeline uses; the reference's plain
    1-minute CPU averages, `InstanceMetricsManager.scala`, weight
    every poll equally, which under-counts values that persisted
    longer between irregular polls — this is the irregular-sampling
    correction).

    Scale shape: ONE lead window partitioned by the KEY
    (corpus-cardinality — parallelism grows with data, never the
    low-card group trap), then a plain combinable (group) agg of
    (value x micros, micros). Durations are INTEGER microseconds
    (``unix_micros`` diff — exact in both engines), so the per-group
    second totals are exact integer sums divided once; only the
    final value-weighted ratio is float. (ts, tiebreak) is the total
    order, so engines agree on which observation is "next" even under
    equal timestamps. Emits (group, n_intervals, total_seconds, twa)
    with twa = sum(value * dur_us) / sum(dur_us).
    """
    w = Window.partitionBy(key_col).orderBy(
        F.col(ts_col).asc(), F.col(tiebreak_col).asc()
    )
    dur_us = F.lead(F.unix_micros(F.col(ts_col))).over(w) - F.unix_micros(
        F.col(ts_col)
    )
    base = df.select(
        F.col(group_col).alias("__grp"),
        F.col(value_col).cast("double").alias("__val"),
        dur_us.alias("__dur"),
    ).filter(F.col("__dur").isNotNull())
    return (
        base.groupBy("__grp")
        .agg(
            F.count("*").cast("bigint").alias("n_intervals"),
            (F.sum("__dur").cast("double") / F.lit(1e6)).alias("__tot"),
            (
                F.round(
                    F.sum(F.col("__val") * F.col("__dur").cast("double"))
                    / F.sum("__dur").cast("double"),
                    4,
                )
                + F.lit(0.0)
            ).alias("twa"),
        )
        .select(
            F.col("__grp").alias(group_col),
            "n_intervals",
            (F.round(F.col("__tot"), 4) + F.lit(0.0)).alias("total_seconds"),
            "twa",
        )
    )


def debounce_events(
    df: DataFrame,
    key_col: str = "user_id",
    type_col: str = "event_type",
    ts_col: str = "ts",
    value_col: str = "value",
    window_seconds: float = 60.0,
    tiebreak_col: str = "event_id",
) -> DataFrame:
    """X109 — telemetry debounce: drop an event that repeats its key's
    IMMEDIATELY PREVIOUS event (same type, same value) within
    ``window_seconds`` — the double-fire/retry-echo cleanup every
    event pipeline runs before counting anything (a client retry storm
    otherwise inflates every downstream metric). Only consecutive
    repeats are dropped — A,B,A within the window keeps all three
    (that is real alternation, not an echo), which is what
    distinguishes debounce from q21-style content dedup.

    Scale shape: ONE lag window partitioned by the corpus-cardinality
    KEY with the (ts, tiebreak) total order; the repeat test compares
    exact integer microseconds (unix_micros — engine-identical) and
    exact value equality, all row-local. Returns the frame with an
    ``is_echo`` flag; filter on it to drop.
    """
    w = Window.partitionBy(key_col).orderBy(
        F.col(ts_col).asc(), F.col(tiebreak_col).asc()
    )
    us = F.unix_micros(F.col(ts_col))
    prev_us = F.lag(us).over(w)
    prev_type = F.lag(F.col(type_col)).over(w)
    prev_val = F.lag(F.col(value_col)).over(w)
    echo = (
        prev_us.isNotNull()
        & (F.col(type_col) == prev_type)
        & (F.col(value_col) == prev_val)
        & ((us - prev_us) <= F.lit(int(window_seconds * 1_000_000)))
    )
    return df.withColumn("is_echo", F.coalesce(echo, F.lit(False)))


def resample_locf(
    df: DataFrame,
    key_col: str = "user_id",
    ts_col: str = "ts",
    value_col: str = "value",
    step_seconds: int = 3600,
    tiebreak_col: str = "event_id",
) -> DataFrame:
    """X111 — regular-grid resampling with last-observation-carried-
    forward: every key gets a row at every grid tick carrying its most
    recent observation at-or-before that tick — the step that turns an
    irregular event stream into the aligned matrix every joint
    time-series computation (correlation, forecasting features,
    cross-key aggregation at instant t) actually consumes. Ticks
    before a key's first observation are dropped (no fabrication);
    X107 integrates the step function, this one SAMPLES it.

    Scale shape: the global [min, max) bounds are a 1-row broadcast;
    the grid is #keys x #ticks rows built by a row-local
    ``sequence`` explode (never a cross join against the corpus); the
    LOCF itself is the classic union-and-carry — grid markers union
    the observations, ONE window per corpus-cardinality key ordered
    by (ts_us, is_obs desc, tiebreak) carries ``last(value,
    ignorenulls=True)`` forward, so an observation exactly ON a tick
    is carried into it. One shuffle on the key; grid density is the
    caller's knob. Emits (key, tick_us, value, ts_us of the carried
    observation).
    """
    us = F.unix_micros(F.col(ts_col))
    step_us = int(step_seconds) * 1_000_000
    bounds = df.agg(
        F.min(us).alias("__lo"), F.max(us).alias("__hi")
    )
    # grid ticks: ceil(lo/step)*step .. floor(hi/step)*step inclusive
    lo_tick = F.ceil(F.col("__lo") / F.lit(step_us)).cast("long") * F.lit(
        step_us
    )
    hi_tick = F.floor(F.col("__hi") / F.lit(step_us)).cast("long") * F.lit(
        step_us
    )
    keys = df.select(F.col(key_col).alias("__k")).distinct()
    grid = (
        keys.crossJoin(F.broadcast(bounds))
        .select(
            "__k",
            F.explode(
                F.sequence(lo_tick, hi_tick, F.lit(step_us))
            ).alias("__t"),
        )
        .withColumn("__obs", F.lit(0))
        .withColumn("__val", F.lit(None).cast("double"))
        .withColumn("__ots", F.lit(None).cast("long"))
        .withColumn("__tb", F.lit(None).cast("long"))
    )
    obs = df.select(
        F.col(key_col).alias("__k"),
        us.alias("__t"),
        F.lit(1).alias("__obs"),
        F.col(value_col).cast("double").alias("__val"),
        us.alias("__ots"),
        F.col(tiebreak_col).cast("long").alias("__tb"),
    )
    unioned = obs.unionByName(grid)
    w = (
        Window.partitionBy("__k")
        .orderBy(
            F.col("__t").asc(), F.col("__obs").desc(), F.col("__tb").asc()
        )
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    carried = (
        unioned.withColumn("__cv", F.last("__val", ignorenulls=True).over(w))
        .withColumn("__cts", F.last("__ots", ignorenulls=True).over(w))
        .filter((F.col("__obs") == 0) & F.col("__cv").isNotNull())
    )
    return carried.select(
        F.col("__k").alias(key_col),
        F.col("__t").alias("tick_us"),
        F.col("__cv").alias("value"),
        F.col("__cts").alias("obs_ts_us"),
    )


def attribute_conversions(
    df: DataFrame,
    touch_types: list[str],
    conversion_type: str = "purchase",
    window_seconds: int = 3 * 86400,
    user_col: str = "user_id",
    type_col: str = "event_type",
    ts_col: str = "ts",
    id_col: str = "event_id",
) -> DataFrame:
    """X119 — last-touch conversion attribution: each conversion event
    is credited to the user's LATEST touch event at-or-before it (ties
    broken touch-first, then by event id) within ``window_seconds``;
    conversions with no in-window touch credit the 'unattributed'
    bucket. Returns (touch_type, n_conversions).

    This is the union-and-carry shape (the X111 LOCF lesson): touches
    and conversions interleave in ONE per-user window ordered by
    (ts, is_touch DESC, id) and the last non-null touch carries
    forward — never an asof join per conversion, never a range
    self-join. One corpus-cardinality window partitioned by user
    (uniform key), one grouped count after.

    Scale: the window state is one (type, ts) pair per row; a
    celebrity user is the skew axis (same contract as sessionize);
    the window filter is evaluated row-local after the carry, in
    integer microseconds (the q146 convention — no float epoch).
    """
    touches = F.col(type_col).isin(touch_types)
    conv = F.col(type_col) == conversion_type
    base = df.filter(touches | conv).select(
        F.col(user_col).alias("u"),
        F.col(ts_col).alias("t"),
        F.col(id_col).alias("eid"),
        F.when(touches, F.col(type_col)).alias("__touch_t"),
        F.when(touches, F.col(ts_col)).alias("__touch_ts"),
        conv.alias("__is_conv"),
    )
    w = (
        Window.partitionBy("u")
        .orderBy(
            F.col("t").asc(),
            F.col("__is_conv").asc(),  # touch sorts before conversion at equal ts
            F.col("eid").asc(),
        )
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    carried = base.select(
        "u",
        "t",
        "__is_conv",
        F.last("__touch_t", ignorenulls=True).over(w).alias("lt"),
        F.last("__touch_ts", ignorenulls=True).over(w).alias("lts"),
    )
    return (
        carried.filter(F.col("__is_conv"))
        .select(
            F.when(
                F.col("lt").isNotNull()
                & (
                    F.unix_micros("t") - F.unix_micros("lts")
                    <= F.lit(int(window_seconds) * 1_000_000)
                ),
                F.col("lt"),
            )
            .otherwise(F.lit("unattributed"))
            .alias("touch_type")
        )
        .groupBy("touch_type")
        .agg(F.count("*").cast("bigint").alias("n_conversions"))
    )


def seasonal_decompose_daily(
    df: DataFrame,
    ts_col: str = "ts",
    value_col: str = "value",
    trend_window_days: int = 7,
) -> DataFrame:
    """X127 — additive seasonal decomposition of the daily metric
    series (classical moving-average form, Kendall/Stuart; the
    deterministic core of STL without loess): per-day totals ->
    centered ``trend_window_days`` moving-average trend -> day-of-week
    seasonal means of the detrended series (normalized to sum zero) ->
    residual = value - trend - seasonal. The anomaly-screen input for
    ingestion telemetry: a residual spike is a real change, not a
    weekday rhythm.

    Returns one row per day: (day, total, trend, seasonal, residual)
    with trend/seasonal/residual NULL on the edge days the centered
    window cannot cover — surfacing partial-window bias instead of
    averaging it in (the X107 edge-honesty convention). Days whose
    ROW window spans more than ``trend_window_days`` CALENDAR days
    (gaps in the daily series — an outage, a cold source) take the
    same NULL path (ADVICE r8): a "weekly" average silently computed
    over 9 calendar days is partial-window bias wearing a full-window
    row count, so the gate checks the window's calendar span, not just
    its row count.

    Scale: the corpus contracts to ONE row per day immediately (hash
    agg); every window after that runs on the day frame — #days rows,
    corpus-size independent. The day-of-week means are a 7-row agg
    joined back broadcast.
    """
    day = (
        df.select(
            F.date_trunc("day", F.col(ts_col)).alias("day"),
            F.col(value_col).alias("__v"),
        )
        .groupBy("day")
        .agg(F.sum("__v").alias("total"))
    )
    half = trend_window_days // 2
    w = Window.orderBy("day").rowsBetween(-half, half)
    trended = day.withColumn(
        "trend",
        F.when(
            (F.count("*").over(w) == trend_window_days)
            & (
                F.datediff(F.max("day").over(w), F.min("day").over(w))
                == trend_window_days - 1
            ),
            F.avg("total").over(w),
        ),
    ).withColumn("dow", F.dayofweek("day"))
    smeans = (
        trended.filter(F.col("trend").isNotNull())
        .groupBy("dow")
        .agg(F.avg(F.col("total") - F.col("trend")).alias("__sm"))
    )
    scenter = smeans.agg(F.avg("__sm").alias("__sc"))
    # smeans: 7-row day-of-week frame; scenter: 1-row centering term
    out = (
        trended.join(F.broadcast(smeans), "dow", "left")
        .crossJoin(F.broadcast(scenter))
        .select(
            "day",
            "total",
            "trend",
            F.when(
                F.col("trend").isNotNull(),
                F.col("__sm") - F.col("__sc"),
            ).alias("seasonal"),
            F.when(
                F.col("trend").isNotNull(),
                F.col("total") - F.col("trend") - (F.col("__sm") - F.col("__sc")),
            ).alias("residual"),
        )
    )
    return out


def transition_matrix(
    df: DataFrame,
    user_col: str = "user_id",
    type_col: str = "event_type",
    ts_col: str = "ts",
    id_col: str = "event_id",
) -> DataFrame:
    """X128 — first-order Markov transition counts/probabilities over
    each user's event sequence: P(next = b | current = a) with exact
    integer counts and one exact division (the q153 rule). The
    sequence-structure screen (a near-deterministic transition row is
    a bot/retry signature; see also X109's debounce).

    Scale: ONE per-user lag window over the corpus (uniform user
    key, (ts, id) total order — the X109 shape), then a hash agg to
    the (a, b) transition dictionary and a broadcast margin join.
    """
    w = Window.partitionBy(user_col).orderBy(F.col(ts_col), F.col(id_col))
    pairs = (
        df.select(
            F.col(type_col).alias("b"),
            F.lag(type_col).over(w).alias("a"),
        )
        .filter(F.col("a").isNotNull())
        .groupBy("a", "b")
        .agg(F.count("*").alias("n_ab"))
    )
    marg = pairs.groupBy("a").agg(F.sum("n_ab").alias("__na"))
    # marg: type-dictionary-sized margin
    return pairs.join(F.broadcast(marg), "a").select(
        "a",
        "b",
        F.col("n_ab").cast("bigint").alias("n_ab"),
        (F.col("n_ab") / F.col("__na")).alias("p_next"),
    )


def cusum_changepoints(
    df: DataFrame,
    ts_col: str = "ts",
    value_col: str = "value",
    threshold_sigmas: float = 4.0,
) -> DataFrame:
    """X129 — CUSUM level-shift detection on the daily mean series
    (Page 1954 — the classical sequential changepoint statistic, in
    its retrospective form): S_t = running sum of (x_t - global mean);
    the maximizer of |S_t| locates the most likely single level shift,
    flagged when the normalized excursion |S_t| / (sigma * sqrt(n))
    exceeds ``threshold_sigmas`` / 2 (the standard Brownian-bridge
    scaling). Returns one row per day with the cusum statistic and an
    is_peak flag on the argmax day.

    Scale: per-day contraction first (the X127 rule); the running sum
    and the argmax run on the #days frame. Global mean/sigma are a
    1-row stable-agg broadcast (stddev_samp is CentralMomentAgg — the
    X76 lesson).
    """
    day = (
        df.select(
            F.date_trunc("day", F.col(ts_col)).alias("day"),
            F.col(value_col).alias("__v"),
        )
        .groupBy("day")
        .agg(F.avg("__v").alias("m"))
    )
    gstats = day.agg(
        F.avg("m").alias("__gm"),
        F.stddev_samp("m").alias("__gs"),
        F.count("*").cast("double").alias("__gn"),
    )
    w = Window.orderBy("day").rowsBetween(Window.unboundedPreceding, 0)
    # gstats: 1-row mean/sigma/n broadcast
    cs = (
        day.crossJoin(F.broadcast(gstats))
        .withColumn("cusum", F.sum(F.col("m") - F.col("__gm")).over(w))
        .withColumn(
            "zscore",
            F.abs(F.col("cusum"))
            / (F.col("__gs") * F.sqrt(F.col("__gn"))),
        )
    )
    peak = cs.agg(F.max(F.abs("cusum")).alias("__pk"))
    return (
        cs.crossJoin(F.broadcast(peak))
        .select(
            "day",
            "m",
            "cusum",
            (
                (F.abs(F.col("cusum")) == F.col("__pk"))
                & (F.col("zscore") >= threshold_sigmas / 2.0)
            ).alias("is_peak"),
        )
    )


def theil_sen_trend(
    df: DataFrame,
    ts_col: str = "ts",
    value_col: str = "value",
) -> DataFrame:
    """X132 — Theil-Sen robust trend of the daily total series (Theil
    1950 / Sen 1968 — the median-of-pairwise-slopes estimator, 29.3%
    breakdown point): slope = lower median over all day pairs of
    (y_j - y_i) / (x_j - x_i), intercept = lower median of
    (y_i - slope * x_i). The OLS alternative (X53) is moment-based and
    one corrupted day drags it; this is the robust twin.

    Determinism: "lower median" is the X100 convention (smallest v
    with 2*cum >= n, exact integer boundary test) — both engines pick
    the same element, no interpolation FP. Each pairwise slope is one
    division of identical doubles.

    Scale: the corpus contracts to the #days frame FIRST; the pairwise
    join is C(#days, 2) on the CONTRACTED frame — it grows with the
    observation span, not the corpus (435 pairs for a month, 66 k for
    a year; beyond that, repeated-median or sampling variants are the
    documented path). Returns one row: (n_days, slope, intercept).
    """
    day = (
        df.select(
            F.date_trunc("day", F.col(ts_col)).alias("__d"),
            F.col(value_col).alias("__v"),
        )
        .groupBy("__d")
        .agg(F.sum("__v").alias("y"))
    )
    base = day.crossJoin(
        F.broadcast(day.agg(F.min("__d").alias("__d0")))
    ).select(F.datediff(F.col("__d"), F.col("__d0")).alias("x"), "y")
    # base/slopes are #days / C(#days,2) frames consumed by several
    # median passes — non-eager localCheckpoints truncate the corpus
    # subtree out of every replay (the X7 rule; frames are span-sized,
    # not corpus-sized, so checkpoint cost is constant).
    base = base.localCheckpoint(eager=False)
    a = base.select(F.col("x").alias("xi"), F.col("y").alias("yi"))
    b = base.select(F.col("x").alias("xj"), F.col("y").alias("yj"))
    slopes = (
        a.join(b, F.col("xi") < F.col("xj"))
        .select(((F.col("yj") - F.col("yi")) / (F.col("xj") - F.col("xi"))).alias("s"))
    ).localCheckpoint(eager=False)

    def _lower_median(frame: DataFrame, col: str) -> DataFrame:
        per = frame.groupBy(col).agg(F.count("*").alias("__c"))
        w = Window.orderBy(col).rowsBetween(Window.unboundedPreceding, 0)
        cum = per.withColumn("__cum", F.sum("__c").over(w))
        tot = per.agg(F.sum("__c").alias("__n"))
        return (
            cum.crossJoin(F.broadcast(tot))
            .agg(
                F.min(
                    F.when(2 * F.col("__cum") >= F.col("__n"), F.col(col))
                ).alias("med")
            )
        )
    slope = _lower_median(slopes, "s").select(F.col("med").alias("slope"))
    resid = base.crossJoin(F.broadcast(slope)).select(
        (F.col("y") - F.col("slope") * F.col("x")).alias("r"), "slope"
    )
    intercept = _lower_median(resid.select("r"), "r").select(
        F.col("med").alias("intercept")
    )
    n = day.agg(F.count("*").cast("bigint").alias("n_days"))
    return (
        n.crossJoin(F.broadcast(slope))
        .crossJoin(F.broadcast(intercept))
        .select("n_days", "slope", "intercept")
    )


def resample_linear(
    df: DataFrame,
    key_col: str = "user_id",
    ts_col: str = "ts",
    value_col: str = "value",
    step_seconds: int = 3600,
    tiebreak_col: str = "event_id",
) -> DataFrame:
    """X133 — regular-grid resampling with LINEAR interpolation: the
    companion to X111's LOCF — each grid tick gets the straight-line
    value between its key's latest at-or-before observation and
    earliest after observation; ticks outside [first, last] are
    dropped (interpolation never extrapolates; a tick exactly ON an
    observation returns that observation). Emits (key, tick_us,
    value, prev_ts_us, next_ts_us).

    Scale: the X111 shape run twice — grid markers union the
    observations, ONE forward carry window per key for the previous
    observation and ONE backward carry window (same key exchange,
    reversed order) for the next; interpolation is row-local exact
    arithmetic on integer microseconds.
    """
    us = F.unix_micros(F.col(ts_col))
    step_us = int(step_seconds) * 1_000_000
    bounds = df.agg(
        F.min(us).alias("__lo"), F.max(us).alias("__hi")
    )
    keys = df.select(F.col(key_col).alias("k")).distinct()
    # bounds: 1-row global grid broadcast
    grid = (
        keys.crossJoin(F.broadcast(bounds))
        .select(
            "k",
            F.explode(
                F.sequence(
                    (F.ceil(F.col("__lo") / step_us) * step_us).cast("long"),
                    (F.floor(F.col("__hi") / step_us) * step_us).cast("long"),
                    F.lit(step_us),
                )
            ).alias("t"),
        )
        .select("k", "t", F.lit(None).cast("double").alias("__v"),
                F.lit(False).alias("__obs"),
                F.lit(None).cast("long").alias("__tb"))
    )
    obs = df.select(
        F.col(key_col).alias("k"),
        us.alias("t"),
        F.col(value_col).cast("double").alias("__v"),
        F.lit(True).alias("__obs"),
        F.col(tiebreak_col).cast("long").alias("__tb"),
    )
    u = grid.unionByName(obs)
    fwd = (
        Window.partitionBy("k")
        .orderBy(F.col("t").asc(), F.col("__obs").desc(), F.col("__tb").asc())
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    bwd = (
        Window.partitionBy("k")
        .orderBy(F.col("t").desc(), F.col("__obs").desc(), F.col("__tb").desc())
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    carried = (
        u.withColumn("__pv", F.last(F.when(F.col("__obs"), F.col("__v")), ignorenulls=True).over(fwd))
        .withColumn("__pt", F.last(F.when(F.col("__obs"), F.col("t")), ignorenulls=True).over(fwd))
        .withColumn("__nv", F.last(F.when(F.col("__obs"), F.col("__v")), ignorenulls=True).over(bwd))
        .withColumn("__nt", F.last(F.when(F.col("__obs"), F.col("t")), ignorenulls=True).over(bwd))
    )
    return (
        carried.filter(~F.col("__obs"))
        .filter(F.col("__pt").isNotNull() & F.col("__nt").isNotNull())
        .select(
            F.col("k").alias(key_col),
            F.col("t").alias("tick_us"),
            F.when(F.col("__nt") == F.col("__pt"), F.col("__pv"))
            .otherwise(
                F.col("__pv")
                + (F.col("__nv") - F.col("__pv"))
                * (F.col("t") - F.col("__pt"))
                / (F.col("__nt") - F.col("__pt"))
            )
            .alias("value"),
            F.col("__pt").alias("prev_ts_us"),
            F.col("__nt").alias("next_ts_us"),
        )
    )


def transition_latency_quantiles(
    df: DataFrame,
    user_col: str = "user_id",
    type_col: str = "event_type",
    ts_col: str = "ts",
    id_col: str = "event_id",
    quantiles: list[tuple[int, int]] = ((1, 2), (9, 10)),
    persist_fn=None,
) -> DataFrame:
    """X141 — per-transition latency quantiles: for every (prev type,
    next type) edge of the X128 transition matrix, the exact lower
    quantiles of the inter-event latency in integer microseconds —
    "how long does view -> purchase take" is the funnel-timing number
    product teams actually ask for, and the tail quantile (not the
    mean) is the SLO-shaped answer.

    Scale: ONE per-user lag window (the X128 shape) produces
    (a, b, latency_us); the quantiles ride X100's exact
    weighted-quantile machinery with weight 1 — per-(a,b) value
    contraction + bucket-decomposed running counts, no per-group sort.
    Latencies are integers end-to-end (the q146 microsecond rule), so
    the quantile VALUES are exact integers both engines agree on.
    """
    from .stats import weighted_quantile

    w = Window.partitionBy(user_col).orderBy(F.col(ts_col), F.col(id_col))
    lat = (
        df.select(
            F.col(type_col).alias("b"),
            F.lag(type_col).over(w).alias("a"),
            (
                F.unix_micros(F.col(ts_col))
                - F.lag(F.unix_micros(F.col(ts_col))).over(w)
            ).alias("lat_us"),
        )
        .filter(F.col("a").isNotNull())
        .withColumn("pair", F.concat_ws("->", "a", "b"))
        .withColumn("__one", F.lit(1.0))
    )
    q = weighted_quantile(
        lat, ["pair"], "lat_us", "__one",
        quantiles=quantiles, bucket_width=float(1 << 26),
        persist_fn=persist_fn,
    )
    n = lat.groupBy("pair").agg(F.count("*").alias("n_transitions"))
    return n.join(q, "pair").select(
        "pair",
        F.col("n_transitions").cast("bigint").alias("n_transitions"),
        *[
            F.col(f"wq_{num}_{den}").cast("long").alias(f"lat_us_p{num}_{den}")
            for num, den in quantiles
        ],
    )


def top_session_paths(
    df: DataFrame,
    gap: str = "30 MINUTES",
    path_len: int = 3,
    top_k: int = 15,
    user_col: str = "user_id",
    type_col: str = "event_type",
) -> DataFrame:
    """X144 — most common length-``path_len`` event-type paths WITHIN
    sessions: X5's sessionizer feeds a per-(user, session) lag chain;
    a path exists only when all ``path_len`` events share the session.
    The "what do users actually do" mining query; the top-k cut is on
    exact integer counts with the path string as tiebreak (engine-
    deterministic, no float anywhere).

    Scale: sessionize is one key shuffle (X5); the lag chain reuses
    the same (user) exchange with a (session-aware) guard column per
    step; the path agg is a hash agg on the path-dictionary.
    """
    s = sessionize(df, gap, key_col=user_col)
    w = Window.partitionBy(user_col, "session_idx").orderBy(
        F.col("ts"), F.col("event_id")
    )
    cur = s.select(
        F.col(type_col).alias("__t0"),
        *[
            F.lag(type_col, i).over(w).alias(f"__t{i}")
            for i in range(1, path_len)
        ],
    )
    parts = [F.col(f"__t{i}") for i in range(path_len - 1, -1, -1)]
    return (
        cur.filter(F.col(f"__t{path_len - 1}").isNotNull())
        .select(F.concat_ws(">", *parts).alias("path"))
        .groupBy("path")
        .agg(F.count("*").cast("bigint").alias("n"))
        .orderBy(F.col("n").desc(), F.col("path"))
        .limit(top_k)
    )
