"""The declared t2 contract (SURVEY.md §2.11): queries Q01-Q25.

Each query has a Spark builder ``(spark, sf_dir) -> DataFrame`` and an
equivalent DuckDB oracle SQL string over the same parquet views. Column
names/aliases are identical on both sides (the driver sorts columns by
name before hashing). Determinism conventions (FIXTURES.md §4): total
ORDER BY over the select list, DOUBLE aggregates rounded via
DECIMAL(38,4) and emitted as its scale-padded STRING on BOTH sides
(the driver's hasher stringifies Spark decimals "1.2340" but DuckDB
decimals "1.234" — strings sidestep that), timestamps as UTC-formatted
strings.

Fixture-mapping rule (SURVEY.md §2.11): ``events`` plays the metric
stream (user_id ↔ node, value ↔ cpu load, event_type ↔ metric family,
ts ↔ poll tick); supplier/customer play registries; orders/lineitem play
workload records; documents/embeddings back the extension operators.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from .functions import ci_eq, dec4, fmt_ts, host_from_uri, md5_long60, sign_dispatch
from .io import ingest_documents, load_table
from .operators import dedup, events as ev_ops, graph, metric_store as ms, registry, similarity, skew, stats, text
from .queries_common import (
    _PACK_BUDGET,
    _PLANES,
    _PLANES24,
    _PLANES_JL,
    _Q103_SIGS_PATH,
    _Q122_SIGS_PATH,
    _Q123_SIGS_PATH,
    _Q169_PROF_PATH,
    _Q184_SIGS_PATH,
    _Q194_DEST,
    _Q194_SRC,
)
from .queries_sql import SQL as _ORACLE_SQL
from .operators.scaling import IG_POLICY, cpu_load_classify, guard_rails, plan_action, allocate

# ---------------------------------------------------------------------------
# Scoped caches. A few declared queries persist a reused intermediate;
# the driver runs every declared query in one session, so an unreleased cache
# would squat executor memory suite-wide. Each _cache_scoped call first
# releases the previous query's caches (the driver collects one query's
# result before building the next), so at most one query's caches are
# live at any time; bench.py / tools call release_caches() at suite end.

_LIVE_CACHES: list[DataFrame] = []


def _cache_scoped(df: DataFrame) -> DataFrame:
    from pyspark import StorageLevel

    release_caches()
    df = df.persist(StorageLevel.MEMORY_AND_DISK)
    _LIVE_CACHES.append(df)
    return df


def release_caches() -> None:
    from .operators._persist import release_default_persists

    while _LIVE_CACHES:
        _LIVE_CACHES.pop().unpersist(blocking=False)
    # operators called without a persist_fn self-register their
    # intermediates (ADVICE r8 leak fix); drain those on the same
    # next-query / suite-end cadence as the scoped caches
    release_default_persists()


# ---------------------------------------------------------------------------
# Q01 — S1/S4/P1/F9: JSON attribute parse -> typed fields with defaults.
# Mirrors the mbean attribute extraction with getOrElse defaults
# (metrics/TrinoJmxRest.scala:31-60,122-131).

def q01(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    # one from_json parse per row, not one get_json_object parse per
    # extracted field (measured ~same plan otherwise; parse dominates)
    parsed = ev.withColumn("__j", F.from_json("props", "k bigint, missing double"))
    return parsed.select(
        "event_id",
        F.coalesce(F.col("__j.k"), F.lit(0).cast("bigint")).alias("k_val"),
        F.coalesce(F.col("__j.missing"), F.lit(0.0)).alias("missing_val"),
        "event_type",
        dec4("value").alias("value_dec"),
    ).orderBy("event_id")


# Q02 — S3/P4/F2: registry filter on case-insensitive string predicates
# (metrics/TrinoJmxEmr.scala:76-78 role/state filter).

def q02(spark: SparkSession, sf_dir: str) -> DataFrame:
    s = load_table(spark, sf_dir, "supplier")
    n = load_table(spark, sf_dir, "nation")
    return (
        s.join(F.broadcast(n), s.s_nationkey == n.n_nationkey)
        .filter(F.lower(F.col("s_name")).like("supplier#%"))
        .filter(~F.lower(F.col("n_name")).isin("france", "germany"))
        .select(
            F.col("s_suppkey").alias("supp_key"),
            F.col("s_name").alias("supp_name"),
            F.col("n_name").alias("nation_name"),
        )
        .orderBy("supp_key")
    )


# Q03 — S9/F7: JSON-path extraction + group count (Config.scala:105-108).

def q03(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    return (
        ev.groupBy(F.get_json_object("props", "$.k").cast("bigint").alias("k"))
        .agg(F.count("*").cast("bigint").alias("n"))
        .orderBy("k")
    )


# Q04 — P2/K2: long-form projection + rebuilt-map explode fan-out
# (metrics/TrinoMetricStore.scala:48; utils/CloudWatch.scala:38-58).

def q04(spark: SparkSession, sf_dir: str) -> DataFrame:
    # SUM (not AVG): sums of 2-decimal inputs stay mathematically
    # 2-decimal, so the 4-decimal rounding convention has no half-way
    # boundary to disagree on between engines (SURVEY.md §7 risk:
    # float determinism).
    ev = load_table(spark, sf_dir, "events")
    per = ev.groupBy("user_id", "event_type").agg(F.sum("value").alias("v"))
    m = per.groupBy("user_id").agg(
        F.map_from_entries(F.collect_list(F.struct("event_type", "v"))).alias("m")
    )
    return (
        m.select("user_id", F.explode("m").alias("metric", "sum_raw"))
        .select("user_id", "metric", dec4("sum_raw").alias("sum_value"))
        .orderBy("user_id", "metric")
    )


# Q05 — P3/P9/F1: regex host extraction, dropping non-matches
# (metrics/TrinoJmxRest.scala:65-70).

def q05(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = load_table(spark, sf_dir, "customer")
    uri = F.when(
        F.col("c_custkey") % 7 != 0,
        F.concat(F.lit("http://node-"), F.col("c_custkey").cast("string"), F.lit(":8080")),
    ).otherwise(F.col("c_name"))
    host = host_from_uri(uri)
    return (
        c.select(F.col("c_custkey").alias("cust_key"), host.alias("host"))
        .filter(F.length("host") > 0)
        .orderBy("cust_key")
    )


# Q06 — J1/P5/E2: left-semi join registry ⋉ workload with state filter
# (metrics/TrinoJmxRest.scala:73-84 — Trino hosts ⋉ RUNNING instances).

def q06(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = load_table(spark, sf_dir, "customer")
    o = load_table(spark, sf_dir, "orders")
    running = o.filter(F.upper("o_orderstatus") == "O").select("o_custkey")
    return (
        c.join(running, c.c_custkey == running.o_custkey, "left_semi")
        .select(F.col("c_custkey").alias("cust_key"), F.col("c_name").alias("cust_name"))
        .orderBy("cust_key")
    )


# Q07 — P8/E1: anti join (managed minus excluded — cluster/Workers.scala:182-183).

def q07(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = load_table(spark, sf_dir, "customer")
    o = load_table(spark, sf_dir, "orders")
    excluded = o.filter(F.col("o_orderstatus") == "F").select("o_custkey")
    return (
        c.join(excluded, c.c_custkey == excluded.o_custkey, "left_anti")
        .select(F.col("c_custkey").alias("cust_key"), F.col("c_mktsegment").alias("segment"))
        .orderBy("cust_key")
    )


# Q08 — J2/J3/F2: multi-key case-insensitive equi join + array containment
# (cluster/Workers.scala:106-116 spec match; :318-328 fleet type ⊇ spec).

def q08(spark: SparkSession, sf_dir: str) -> DataFrame:
    p = load_table(spark, sf_dir, "part")
    l = load_table(spark, sf_dir, "lineitem")
    spec = (
        p.filter(F.col("p_size") > 25)
        .select(F.upper("p_brand").alias("spec_brand"))
        .distinct()
    )
    j = p.join(F.broadcast(spec), ci_eq("p_brand", "spec_brand")).join(
        l, p.p_partkey == l.l_partkey
    )
    g = j.groupBy("p_brand").agg(
        F.count("*").cast("bigint").alias("n_lines"),
        F.sum("l_quantity").alias("qty_raw"),
        F.collect_set("l_returnflag").alias("flags"),
    )
    return (
        g.filter(
            F.size(F.array_except(F.array(F.lit("A"), F.lit("N"), F.lit("R")), F.col("flags"))) == 0
        )
        .select(
            F.col("p_brand").alias("brand"),
            "n_lines",
            dec4("qty_raw").alias("sum_qty"),
        )
        .orderBy("brand")
    )


# Q09 — W1/W2/A1-A3/A11/P10: windowed store — per-node mean of the last
# 4 ticks over a zero-filled tick x node scaffold, min-support >= 4
# (metrics/MetricStore.scala:20-39; ticks = days, nodes = users).

def _q09_daily(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events").select(
        F.to_date("ts").alias("tick"), F.col("user_id").alias("node"), "value"
    )
    return ev.groupBy("tick", "node").agg(F.sum("value").alias("value"))


def _q09_filled(spark: SparkSession, sf_dir: str) -> DataFrame:
    return ms.zero_fill(_q09_daily(spark, sf_dir))


def q09(spark: SparkSession, sf_dir: str) -> DataFrame:
    avg4 = ms.one_minute_avg(_q09_filled(spark, sf_dir))
    return avg4.select(
        F.col("node").alias("user_id"),
        dec4("avg_value").alias("avg_last4"),
        F.col("n_points").cast("bigint").alias("n_points"),
    ).orderBy("user_id")


# Q10 — A4-A6: quorum predicates keyed by getNodesList: both the breach
# numerator and the denominator are restricted to the *raw* last
# snapshot's node list (the zero-filled scaffold would put every
# buffered node in the last tick, so the restriction must come from the
# pre-fill frame — metrics/MetricStore.scala:49-53,62-66,29-33).

def q10(spark: SparkSession, sf_dir: str) -> DataFrame:
    # Persist the bounded (tick x node) daily frame so the event stream
    # is scanned once — at 100 TB the repeated raw scans are the cost.
    # Scoped: released on the next declared query (see _cache_scoped).
    #
    # Round-3 restructure (VERDICT r2 #6) — one conditional aggregation
    # instead of five branches, via two algebraic identities over the
    # zero-filled series (tests/test_metric_store.py asserts equivalence
    # with the compositional ms-operator form):
    #
    # 1. filled-average identity (MetricStore.scala:20-26,36-39): with
    #    zero-fill every node holds one point per buffered tick, so
    #    mean(last n) == sum(present values in last n ticks)/n_ticks and
    #    the min-support gate is the global n_ticks >= 4 cold-start
    #    gate (0.0 addends are exact in IEEE 754).
    # 2. population identity (MetricStore.scala:29-33,49-53,62-66): the
    #    last snapshot's tick is one of the last n, so every
    #    getNodesList node appears in the last-n slice — membership is
    #    max(tick == max_tick) computed in the same pass as the sums.
    #
    # Everything after the (bounded, cached) daily frame is one
    # broadcast-pruned scan + one per-node aggregate + one 1-row
    # verdict; daily is referenced twice (tick dim + slice), down from
    # five subtree repetitions.
    daily = _cache_scoped(_q09_daily(spark, sf_dir))
    last_ticks = (
        daily.select("tick").distinct()
        .withColumn("__rn", F.row_number().over(Window.orderBy(F.col("tick").desc())))
        .filter(F.col("__rn") <= ms.ONE_MIN_POINTS)
        .drop("__rn")
    )
    gate = last_ticks.agg(
        F.count("*").alias("n_ticks"), F.max("tick").alias("max_tick")
    )
    per_node = (
        daily.join(F.broadcast(last_ticks), "tick")
        .crossJoin(F.broadcast(gate))
        .groupBy("node")
        .agg(
            (F.sum("value") / F.first("n_ticks")).alias("avg_value"),
            F.max((F.col("tick") == F.col("max_tick")).cast("int")).alias("in_last"),
            F.first("n_ticks").alias("n_ticks"),
        )
    )
    # cold-start gate (A11 twin): with < 4 buffered ticks the averages
    # frame is EMPTY in the compositional form, so the counts are NULL
    # (sum over zero rows), not 0 — preserved via the when() wrapper
    n_ok = F.first("n_ticks") >= ms.ONE_MIN_POINTS
    return (
        per_node.filter(F.col("in_last") == 1)
        .agg(
            F.when(n_ok, F.sum(F.when(F.col("avg_value") >= 100.0, 1).otherwise(0)))
            .cast("bigint")
            .alias("breached"),
            F.when(
                n_ok,
                F.sum(
                    F.when(
                        (F.col("avg_value") > 50.0) & (F.col("avg_value") < 100.0), 1
                    ).otherwise(0)
                ),
            )
            .cast("bigint")
            .alias("mid_count"),
            F.count("*").cast("bigint").alias("total_nodes"),
        )
        .select(
            "breached",
            "mid_count",
            "total_nodes",
            (F.col("breached") >= F.col("total_nodes") * 0.8).alias("is_expand_quorum"),
            (F.col("mid_count") >= F.col("total_nodes") * 0.8).alias("is_hold_quorum"),
            (~(F.col("breached") >= F.col("total_nodes") * 0.8)).alias("is_avg_lower"),
        )
    )


# Q11 — A7-A9: capacity sums + existential aggregate
# (cluster/Workers.scala:55-59).

def q11(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load_table(spark, sf_dir, "orders")
    return (
        o.groupBy(F.col("o_orderpriority").alias("priority"))
        .agg(
            F.sum(F.when(F.col("o_orderstatus") == "O", 1).otherwise(0))
            .cast("bigint")
            .alias("running_cnt"),
            F.count("*").cast("bigint").alias("requested_cnt"),
            F.sum("o_totalprice").alias("tp_raw"),
            F.bool_or(F.col("o_orderstatus") == "P").alias("is_resizing"),
        )
        .select(
            "priority",
            "running_cnt",
            "requested_cnt",
            dec4("tp_raw").alias("total_price"),
            "is_resizing",
        )
        .orderBy("priority")
    )


# Q12 — A10/W1: last snapshot per node within a 20-row sliding window
# (metrics/MetricStore.scala:14; utils/FixedList.scala:12-15).

def q12(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window

    ev = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy(F.col("ts").desc(), F.col("event_id").desc())
    r = ev.withColumn("rn", F.row_number().over(w))
    return (
        r.groupBy("user_id")
        .agg(
            F.max(F.when(F.col("rn") == 1, fmt_ts("ts"))).alias("last_ts"),
            F.max(F.when(F.col("rn") == 1, F.col("event_type"))).alias("last_event_type"),
            F.max(F.when(F.col("rn") == 1, F.col("value"))).alias("lv_raw"),
            F.avg(F.when(F.col("rn") <= 20, F.col("value"))).alias("a20_raw"),
        )
        .select(
            "user_id",
            "last_ts",
            "last_event_type",
            dec4("lv_raw").alias("last_value"),
            dec4("a20_raw").alias("avg_last20"),
        )
        .orderBy("user_id")
    )


# Q13 — A12/L1/F3: distinct + deterministic first-by-creation-order +
# concat naming (Config.scala:73; Workers.scala:99,176-177).

def q13(spark: SparkSession, sf_dir: str) -> DataFrame:
    p = load_table(spark, sf_dir, "part")
    return (
        p.groupBy(F.col("p_brand").alias("brand"))
        .agg(
            F.min_by("p_type", "p_partkey").alias("first_type"),
            F.count_distinct("p_type").cast("bigint").alias("n_types"),
        )
        .select(
            "brand",
            "first_type",
            F.concat_ws(
                "-", F.lit("AutoScaling"), F.lit("TASK"), F.lower("brand"), F.col("first_type")
            ).alias("task_name"),
            "n_types",
        )
        .orderBy("brand")
    )


# Q14 — D5/F5/F6/J4: uniform distribution over groups, positional pairing,
# sign dispatch (cluster/Workers.scala:167-238).

def q14(spark: SparkSession, sf_dir: str) -> DataFrame:
    r = load_table(spark, sf_dir, "region")
    n = load_table(spark, sf_dir, "nation")
    s = load_table(spark, sf_dir, "supplier")
    total = (
        load_table(spark, sf_dir, "orders")
        .filter(F.col("o_orderstatus") == "O")
        .agg(F.count("*").cast("bigint").alias("total"))
    )
    alloc = allocate(r, total, order_col="r_regionkey")
    running = (
        s.join(F.broadcast(n), s.s_nationkey == n.n_nationkey)
        .groupBy(F.col("n_regionkey"))
        .agg(F.count("*").cast("bigint").alias("running"))
    )
    return (
        alloc.join(running, alloc.r_regionkey == running.n_regionkey, "left")
        .withColumn("running", F.coalesce(F.col("running"), F.lit(0).cast("bigint")))
        .select(
            F.col("r_name").alias("group_name"),
            F.col("alloc"),
            F.col("running"),
            sign_dispatch(F.col("running"), F.col("alloc")).alias("action"),
        )
        .orderBy("group_name")
    )


# Q15 — D6/J6/W6: per-key carry-forward of the last suspension timestamp
# + exclusion window, computed against the PREVIOUS refresh's value
# (cluster/Workers.scala:256-262 — prevSuspendedTime, hence 1 PRECEDING).

def q15(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    out = ev_ops.suspension_carry_forward(ev, "36 HOURS")
    return out.select(
        "event_id",
        "user_id",
        fmt_ts("ts").alias("ts_fmt"),
        F.coalesce(fmt_ts("last_suspended_ts"), F.lit("never")).alias("last_suspended"),
        "is_excluded",
    ).orderBy("event_id")


# Q16 — W3/W4/F10: tumbling windowed per-type counts + idle flag
# (models/ClusterQueriesMetrics.scala:3-15; ScalingManager.scala:110-115).

_EVENT_TYPES = ("click", "error", "purchase", "signup", "view")


def q16(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    counts = ev_ops.tumbling_counts(ev, "1 hour", types=_EVENT_TYPES)
    idle = ev_ops.idle_flag([F.col("n_purchase"), F.col("n_error"), F.col("n_signup")])
    return counts.select(
        fmt_ts("win_start").alias("win_start"),
        "n_total",
        *[f"n_{t}" for t in _EVENT_TYPES],
        idle.alias("is_idle"),
    ).orderBy("win_start")


# Q17 — D3/W5: cooldown gating via lag (batch form of the 2-minute
# cooldown clock — scaling/ScalingManager.scala:21,38-45).

def q17(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events").filter(F.col("value") >= 150.0)
    gated = ev_ops.cooldown_gate(ev, "48 HOURS")
    return gated.select(
        "event_id", "user_id", fmt_ts("ts").alias("action_ts")
    ).orderBy("event_id")


# Q18 — D2/F4/F11: step-scaling plan incl. the NONE-branch quirk
# (scaling/algo/ScalingAlgorithm.scala:12-21; StepScalingAlgorithm.scala:21-26).

def q18(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load_table(spark, sf_dir, "orders")
    base = o.select(
        F.col("o_orderkey").alias("order_key"),
        (F.col("o_orderkey") % 21).alias("running"),
        (F.col("o_custkey") % 30).alias("required"),
        F.when(F.col("o_orderstatus") == "O", F.lit("EXPAND"))
        .when(F.col("o_orderstatus") == "F", F.lit("SHRINK"))
        .otherwise(F.lit("NONE"))
        .alias("verdict"),
    )
    action, target = plan_action(
        F.col("verdict"), F.col("running"), F.col("required"), IG_POLICY
    )
    return base.select(
        "order_key",
        "running",
        "required",
        "verdict",
        action.alias("action"),
        target.cast("bigint").alias("target"),
    ).orderBy("order_key")


# Q19 — F8: epoch-millis <-> timestamp round trip + UTC formatting
# (scaling/ScalingManager.scala:42-44).

def q19(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    return ev.select(
        "event_id",
        F.unix_millis("ts").alias("ts_ms"),
        fmt_ts(F.timestamp_millis(F.unix_millis("ts"))).alias("ts_rt"),
    ).orderBy("event_id")


# Q20 — D1/D4/F10 (flagship): full classifier pipeline — per-tick quorum
# verdicts + step plan + guard rails (CpuLoadEvaluator.scala:18-32;
# ScalingManager.scala:67-101). Ticks = days, nodes = users.

def q20(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    node_day = ev.groupBy(
        F.to_date("ts").alias("d"), "user_id"
    ).agg(F.avg("value").alias("avg_v"))
    agg = node_day.groupBy("d").agg(
        F.sum(F.when(F.col("avg_v") >= 150.0, 1).otherwise(0)).cast("bigint").alias("hi"),
        F.sum(F.when((F.col("avg_v") > 80.0) & (F.col("avg_v") < 150.0), 1).otherwise(0))
        .cast("bigint")
        .alias("mid"),
        F.count("*").cast("bigint").alias("total"),
    )
    verdict = cpu_load_classify(
        is_cold=F.col("total") < 4,
        hi_quorum=F.col("hi") >= F.col("total") * 0.8,
        mid_quorum=F.col("mid") >= F.col("total") * 0.8,
    )
    staged = agg.withColumn("verdict", verdict).select(
        "*",
        (F.dayofmonth("d") % 25).cast("int").alias("running"),
        (F.dayofmonth("d") % 8).cast("int").alias("required"),
        ((F.dayofmonth("d") * 3) % 23).cast("int").alias("requested"),
    )
    action, target = plan_action(
        F.col("verdict"), F.col("running"), F.col("required"), IG_POLICY
    )
    staged = staged.withColumn("planned_action", action).withColumn(
        "planned_target", target.cast("int")
    )
    final_action, final_target = guard_rails(
        F.col("planned_action"),
        F.col("planned_target"),
        F.col("running"),
        F.col("requested"),
        IG_POLICY,
    )
    return staged.select(
        F.date_format("d", "yyyy-MM-dd").alias("d"),
        "total",
        "hi",
        "mid",
        "verdict",
        "running",
        "required",
        "requested",
        "planned_action",
        "planned_target",
        final_action.alias("final_action"),
        final_target.cast("int").alias("final_target"),
    ).orderBy("d")


# Q21 — X1: exact dedup on content hash, keep min doc_id.

def q21(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load_table(spark, sf_dir, "documents")
    return dedup.exact_dedup(d).orderBy("text_hash")


# Q22 — X2: deterministic shingle-minhash near-dup clusters.

def q22(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load_table(spark, sf_dir, "documents")
    return dedup.near_dup_clusters(d, k=3).orderBy("sig")


# Q23 — X3/X6: brute-force top-5 cosine neighbors per query vector.

def q23(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = load_table(spark, sf_dir, "embeddings")
    queries = e.filter(F.col("vec_id") < 10).select(
        F.col("vec_id").alias("q_id"), "embedding"
    )
    return (
        similarity.brute_force_topk(e, queries, k=5)
        .withColumn("cosine", F.col("cosine").cast("string"))
        .orderBy("q_id", "rank")
    )


# Q24 — X4: grouped token/length statistics.

def q24(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load_table(spark, sf_dir, "documents")
    stats = text.doc_stats(d)
    return stats.select(
        "lang",
        "source",
        "n_docs",
        "total_tokens",
        dec4("avg_tokens").alias("avg_tokens"),
        dec4("avg_chars").alias("avg_chars"),
        "min_chars",
        "max_chars",
    ).orderBy("lang", "source")


# Q25 — X5: sessionization (gaps-and-islands batch form of the
# stateful session logic; streaming twin uses session_window).

def q25(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    s = ev_ops.sessionize(ev, "12 HOURS")
    return (
        s.groupBy("user_id", "session_idx")
        .agg(
            F.count("*").cast("bigint").alias("n_events"),
            F.min("ts").alias("start_raw"),
            F.max("ts").alias("end_raw"),
            F.sum("value").alias("sv_raw"),
        )
        .select(
            "user_id",
            "session_idx",
            "n_events",
            fmt_ts("start_raw").alias("session_start"),
            fmt_ts("end_raw").alias("session_end"),
            (F.unix_timestamp("end_raw") - F.unix_timestamp("start_raw")).alias("duration_sec"),
            dec4("sv_raw").alias("sum_value"),
        )
        .orderBy("user_id", "session_idx")
    )


# ---------------------------------------------------------------------------
# Q26-Q37 — second extension wave: the training-data-pipeline surface
# (BASELINE.json north_star) beyond the Q21-Q25 minimum. Same contract:
# every query has a DuckDB oracle; md5 replaces xxhash64 wherever the
# oracle must replay a hash (xxhash64 variants stay in operators/ as the
# scale path and are pytest-covered).


# Q26 — SimHash near-dup clusters (md5-nibble votes, 16-bit).

def q26(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load_table(spark, sf_dir, "documents")
    return dedup.simhash_clusters(d).orderBy("sig")


# Q27 — n-gram Jaccard near-dup pairs via inverted shingle index
# (no quadratic cross join: docs only meet through a shared shingle).

def q27(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load_table(spark, sf_dir, "documents")
    pairs = dedup.ngram_jaccard_pairs_prefix(
        d, k=3, threshold=0.5, persist_fn=_cache_scoped
    )
    return pairs.select(
        "id_a", "id_b", "n_common", "sz_a", "sz_b", dec4("jaccard").alias("jaccard")
    ).orderBy("id_a", "id_b")


# Q28 — exact embedding-cosine near-dup pairs (the correctness baseline
# for X2's embedding variant; Q29/Q30 are the bucketed scale paths).

def q28(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = load_table(spark, sf_dir, "embeddings")
    return (
        similarity.near_dup_pairs_blocked(e, threshold=0.4)
        .withColumn("cosine", F.col("cosine").cast("string"))
        .orderBy("id_a", "id_b")
    )


# Q29 — LSH-bucketed approximate top-k (SRP hyperplanes embedded as
# literals on BOTH sides so the oracle replays the exact buckets).


def q29(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = load_table(spark, sf_dir, "embeddings")
    queries = e.filter(F.col("vec_id") < 10).select(
        F.col("vec_id").alias("q_id"), "embedding"
    )
    return (
        similarity.lsh_topk_literal(e, queries, _PLANES, k=5)
        .withColumn("cosine", F.col("cosine").cast("string"))
        .orderBy("q_id", "rank")
    )


# Q30 — IVF-style ANN: coarse-quantize to the nearest of 8 centroids
# (centroids = a fixed id set, the deterministic stand-in for k-means),
# probe only the query's inverted list.

def q30(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = load_table(spark, sf_dir, "embeddings")
    cents = e.filter(F.col("vec_id") < 8).select(
        F.col("vec_id").alias("c_id"), "embedding"
    )
    queries = e.filter((F.col("vec_id") % 50 == 0) & (F.col("vec_id") >= 8)).select(
        F.col("vec_id").alias("q_id"), "embedding"
    )
    return (
        similarity.ivf_topk(e, cents, queries, k=5)
        .withColumn("cosine", F.col("cosine").cast("string"))
        .orderBy("q_id", "rank")
    )


# Q31 — language-ID heuristic + quality scoring, aggregated by guess.

def q31(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load_table(spark, sf_dir, "documents")
    scored = d.select(
        "lang",
        text.language_id("text").alias("guessed"),
        text.quality_score("text").alias("q"),
    )
    return (
        scored.groupBy("guessed")
        .agg(
            F.count("*").cast("bigint").alias("n_docs"),
            F.sum((F.col("lang") == F.col("guessed")).cast("bigint")).alias("n_label_match"),
            dec4(F.sum("q")).alias("sum_quality"),
        )
        .orderBy("guessed")
    )


# Q32 — per-document fingerprint + BPE-ish token count.

def q32(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load_table(spark, sf_dir, "documents").withColumn(
        "__toks", F.split(F.col("text"), " ")
    )
    return d.select(
        "doc_id",
        text.bpe_ish_token_count("text").alias("bpe_tokens"),
        F.size("__toks").cast("bigint").alias("ws_tokens"),
        # Arrow twin: identical XOR-of-md5-gram values, no interpreted
        # HOF fold (tests pin parity with the expression form)
        text.fingerprint60_md5_arrow("text", window=8).alias("fingerprint"),
    ).orderBy("doc_id")


# Q33 — rollup (grouping sets) over documents: per (lang, source),
# per lang, and grand total, with grouping flags.

def q33(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load_table(spark, sf_dir, "documents")
    return (
        d.rollup("lang", "source")
        .agg(
            F.grouping("lang").cast("int").alias("g_lang"),
            F.grouping("source").cast("int").alias("g_source"),
            F.count("*").cast("bigint").alias("n_docs"),
            F.sum("n_chars").cast("bigint").alias("total_chars"),
        )
        .select(
            F.coalesce("lang", F.lit("ALL")).alias("lang"),
            F.coalesce("source", F.lit("ALL")).alias("source"),
            "g_lang",
            "g_source",
            "n_docs",
            "total_chars",
        )
        .orderBy("lang", "source", "g_lang", "g_source")
    )


# Q34 — as-of join: each click event picks up the latest prior-or-equal
# purchase (per user). Implemented as the union-and-carry-forward window
# (one shuffle on user_id, no range explosion — the scalable as-of form;
# purchases sort before clicks at equal ts, ties among purchases resolve
# to the highest event_id).

def q34(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window

    ev = load_table(spark, sf_dir, "events").filter(
        F.col("event_type").isin("click", "purchase")
    )
    tagged = ev.select(
        "event_id",
        "user_id",
        "ts",
        "value",
        (F.col("event_type") == "click").cast("int").alias("is_click"),
        F.when(F.col("event_type") == "purchase", F.col("value")).alias("pv"),
        F.when(F.col("event_type") == "purchase", F.col("ts")).alias("pts"),
    )
    w = (
        Window.partitionBy("user_id")
        .orderBy("ts", "is_click", "event_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    joined = tagged.withColumn(
        "last_pv", F.last("pv", ignorenulls=True).over(w)
    ).withColumn("last_pts", F.last("pts", ignorenulls=True).over(w))
    return (
        joined.filter(F.col("is_click") == 1)
        .select(
            F.col("event_id").alias("click_id"),
            "user_id",
            fmt_ts("ts").alias("click_ts"),
            dec4("last_pv").alias("last_purchase_value"),
            (F.unix_timestamp("ts") - F.unix_timestamp("last_pts"))
            .cast("bigint")
            .alias("lag_sec"),
        )
        .orderBy("click_id")
    )


# Q35 — exact interpolated percentiles per event_type.

def q35(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    return (
        ev.groupBy("event_type")
        .agg(
            F.count("*").cast("bigint").alias("n"),
            F.percentile("value", 0.5).alias("p50_raw"),
            F.percentile("value", 0.9).alias("p90_raw"),
        )
        .select(
            "event_type",
            "n",
            dec4("p50_raw").alias("p50"),
            dec4("p90_raw").alias("p90"),
        )
        .orderBy("event_type")
    )


# Q36 — top-3 orders per market segment (broadcast dim join + two-phase
# ranking; row_number with a total tie-break for determinism). The
# single `Window.partitionBy(c_mktsegment)` form collapses to 5 tasks at
# any scale — skew.two_phase_topk buckets phase 1 on the order key so
# each of the 64 per-segment sorts is bounded (docs/SCALE.md).

def q36(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load_table(spark, sf_dir, "orders")
    c = load_table(spark, sf_dir, "customer").select("c_custkey", "c_mktsegment")
    return (
        skew.two_phase_topk(
            o.join(F.broadcast(c), o.o_custkey == c.c_custkey),
            ["c_mktsegment"],
            [F.col("o_totalprice").desc(), F.col("o_orderkey").asc()],
            k=3,
            bucket_on=F.col("o_orderkey"),
        )
        .select(
            F.col("c_mktsegment").alias("segment"),
            "rnk",
            F.col("o_orderkey").alias("order_key"),
            dec4("o_totalprice").alias("total_price"),
        )
        .orderBy("segment", "rnk")
    )


# Q37 — multimodal plumbing: opaque binary column -> typed metadata via
# Arrow-batched mapInPandas (X6; decode itself is stubbed, the Spark
# plumbing — schema, batching, column pruning — is the product).

def q37(spark: SparkSession, sf_dir: str) -> DataFrame:
    from .operators import multimodal

    d = load_table(spark, sf_dir, "documents").select(
        "doc_id", F.encode("text", "UTF-8").alias("payload")
    )
    return multimodal.binary_meta(d, payload_col="payload", id_col="doc_id").orderBy(
        "doc_id"
    )


# ---------------------------------------------------------------------------
# Q38-Q42 — join/aggregation/window/UDF families the reference lacks and
# SURVEY §2.3/§2.4/§2.10 declares as engine-provided: full outer join,
# interval (range) join, distinct aggregation, range-frame windows, and
# the Arrow scalar-UDF surface.


# Q38 — full outer join: daily order counts vs daily event counts on a
# shared calendar key (nulls where either side has no activity).

def q38(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = (
        load_table(spark, sf_dir, "orders")
        .groupBy(F.to_date("o_orderdate").alias("d"))
        .agg(F.count("*").cast("bigint").alias("n_orders"))
    )
    e = (
        load_table(spark, sf_dir, "events")
        .groupBy(F.to_date("ts").alias("d"))
        .agg(F.count("*").cast("bigint").alias("n_events"))
    )
    return (
        o.join(e, "d", "full_outer")
        .select(
            F.date_format(F.col("d"), "yyyy-MM-dd").alias("day"),
            "n_orders",
            "n_events",
        )
        .orderBy("day")
    )


# Q39 — interval/range join: order activity windows
# [o_orderdate, o_orderdate + 30 days] overlapped against a quarter
# grid. The grid is tiny -> broadcast non-equi join (the Spark plan for
# range joins against a small interval table).

def q39(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load_table(spark, sf_dir, "orders")
    grid = (
        o.select(F.date_trunc("quarter", "o_orderdate").alias("q_start"))
        .distinct()
        .withColumn("q_end", F.expr("q_start + INTERVAL 3 MONTH"))
    )
    return (
        o.withColumn("w_end", F.expr("o_orderdate + INTERVAL 30 DAY"))
        .join(
            F.broadcast(grid),
            (F.col("o_orderdate") < F.col("q_end")) & (F.col("w_end") >= F.col("q_start")),
        )
        .groupBy(F.date_format("q_start", "yyyy-MM-dd").alias("quarter"))
        .agg(F.count("*").cast("bigint").alias("n_active_orders"))
        .orderBy("quarter")
    )


# Q40 — distinct aggregation (Expand-based plan): per order priority,
# distinct customers and distinct order days alongside plain counts.

def q40(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load_table(spark, sf_dir, "orders")
    return (
        o.groupBy(F.col("o_orderpriority").alias("priority"))
        .agg(
            F.count("*").cast("bigint").alias("n_orders"),
            F.countDistinct("o_custkey").cast("bigint").alias("n_customers"),
            F.countDistinct(F.to_date("o_orderdate")).cast("bigint").alias("n_days"),
            dec4(F.sum("o_totalprice")).alias("sum_price"),
        )
        .orderBy("priority")
    )


# Q41 — range-frame window (event-time range, not row count): per event,
# the sum of the user's values in the trailing hour. RANGE frames bound
# by a time delta are the streaming-compatible form of the ring buffer.

def q41(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window

    ev = load_table(spark, sf_dir, "events").withColumn(
        "ts_sec", F.unix_timestamp("ts")
    )
    w = (
        Window.partitionBy("user_id")
        .orderBy("ts_sec")
        .rangeBetween(-3600, Window.currentRow)
    )
    return (
        ev.select(
            "event_id",
            "user_id",
            fmt_ts("ts").alias("ts_str"),
            dec4(F.sum("value").over(w)).alias("trailing_hour_sum"),
            F.count("*").over(w).cast("bigint").alias("trailing_hour_n"),
        )
        .orderBy("event_id")
    )


# NOTE the oracle's frame key: Spark's side orders by unix_timestamp
# (integer SECONDS — sub-second truncated), so the oracle must use the
# identically truncated key. `ORDER BY ts RANGE INTERVAL 1 HOUR` kept
# full microsecond precision and disagreed on events ~exactly one hour
# apart (first seen at sf0.1 — sf0.01 is too sparse to hit the
# boundary). floor(), not a bare BIGINT cast: DuckDB casts round.


# Q42 — Arrow scalar pandas UDF surface: vectorized per-string metric
# computed in Python (the sanctioned slow path — Series in, Series out,
# one Arrow batch at a time; compare mapInPandas in Q37).

def q42(spark: SparkSession, sf_dir: str) -> DataFrame:
    from .functions.arrow_udfs import vowel_count

    d = load_table(spark, sf_dir, "documents")
    return (
        d.groupBy("lang")
        .agg(
            F.sum(vowel_count("text")).cast("bigint").alias("total_vowels"),
            F.count("*").cast("bigint").alias("n_docs"),
        )
        .orderBy("lang")
    )


# Q43 — approximate sketches (HyperLogLog++ ndv, quantile sketch),
# emitted as VALIDATED outputs so the oracle can hash-check them: the
# sketch values themselves are engine-specific, but "the sketch landed
# inside its documented error bound" is a deterministic boolean for a
# fixed dataset. The oracle computes the exact twins (ndv, counts) and
# asserts TRUE for the bound checks — if a sketch ever drifts outside
# its bound, the hash flips red. Raw-sketch exact twins: Q40 (ndv),
# Q35 (percentiles); pytest additionally bounds the error.

def q43(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load_table(spark, sf_dir, "orders")
    # TWO homogeneous aggregations joined on the 5-row group key, never
    # one mixed agg: Spark plans a distinct aggregate (countDistinct)
    # mixed with a TypedImperativeAggregate (percentile_approx) as an
    # expand + sort-based aggregate that re-serializes the sketch buffer
    # per row — measured 39s vs 2.4s for the split at sf0.1.
    sketches = o.groupBy(F.col("o_orderpriority").alias("priority")).agg(
        F.approx_count_distinct("o_custkey", rsd=0.02).alias("__andv"),
        F.percentile_approx("o_totalprice", F.lit(0.5), F.lit(10_000)).alias("__ap50"),
        F.count("*").cast("bigint").alias("n_orders"),
    )
    exact = o.groupBy(F.col("o_orderpriority").alias("priority")).agg(
        F.countDistinct("o_custkey").cast("bigint").alias("exact_customers"),
        F.expr("percentile(o_totalprice, 0.4)").alias("__p40"),
        F.expr("percentile(o_totalprice, 0.6)").alias("__p60"),
    )
    # 10% = 5x the rsd target, far outside HLL++'s realistic error; the
    # exact p40..p60 band is ~1000x percentile_approx's rank error at
    # accuracy 10k. Robustly-true bounds, not knife-edge ones.
    return (
        sketches.join(F.broadcast(exact), "priority")
        .select(
            "priority",
            "exact_customers",
            "n_orders",
            (
                F.abs(F.col("__andv") - F.col("exact_customers"))
                <= 0.10 * F.col("exact_customers")
            ).alias("ndv_within_10pct"),
            (
                (F.col("__ap50") >= F.col("__p40")) & (F.col("__ap50") <= F.col("__p60"))
            ).alias("p50_within_band"),
        )
        .orderBy("priority")
    )


# Q44 — pivot (long -> wide): per-user event-type counts as columns.
# Explicit pivot value list (deterministic schema; never inferred).

_PIVOT_EVENT_TYPES = ["click", "view", "purchase", "signup", "error"]


def q44(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    return (
        ev.groupBy("user_id")
        .pivot("event_type", _PIVOT_EVENT_TYPES)
        .agg(F.count(F.lit(1)))
        .na.fill(0, _PIVOT_EVENT_TYPES)
        .select(
            "user_id",
            *[F.col(t).cast("bigint").alias(f"n_{t}") for t in _PIVOT_EVENT_TYPES],
        )
        .orderBy("user_id")
    )


# Q45 — map-typed columns in-plan: per-user map of event_type -> summed
# value, filtered with map_filter, re-exploded to rows (S4's pivot family
# plus Spark's map function surface; the map is plan-internal, the
# output is deterministic rows).

def q45(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    per_type = ev.groupBy("user_id", "event_type").agg(
        F.sum("value").alias("sv")
    )
    as_map = per_type.groupBy("user_id").agg(
        F.map_from_entries(
            F.array_sort(F.collect_list(F.struct("event_type", "sv")))
        ).alias("m")
    )
    big = as_map.select(
        "user_id",
        F.explode(
            F.map_filter("m", lambda _k, v: v > 100.0)
        ).alias("event_type", "sv_raw"),
    )
    return big.select(
        "user_id", "event_type", dec4("sv_raw").alias("sum_value")
    ).orderBy("user_id", "event_type")


# Q46 — classic fact-fact-dim aggregation join: lineitem x orders
# (shuffle join on the fact keys) x customer (broadcast), revenue per
# market segment per order year.

def q46(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    o = load_table(spark, sf_dir, "orders")
    c = load_table(spark, sf_dir, "customer").select("c_custkey", "c_mktsegment")
    return (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .join(F.broadcast(c), o.o_custkey == c.c_custkey)
        .groupBy(
            F.col("c_mktsegment").alias("segment"),
            F.year("o_orderdate").cast("int").alias("order_year"),
        )
        .agg(
            F.count("*").cast("bigint").alias("n_items"),
            dec4(
                F.sum(F.col("l_extendedprice") * (F.lit(1.0) - F.col("l_discount")))
            ).alias("revenue"),
        )
        .orderBy("segment", "order_year")
    )


# Q47 — SimHash Hamming-radius pairs via band-join (the radius>0
# extension of Q26; band-equi candidates + exact bit_count verify).

def q47(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load_table(spark, sf_dir, "documents")
    return dedup.simhash_hamming_pairs(d, max_hamming=2, n_bands=4).orderBy(
        "id_a", "id_b"
    )


# Q48 — deterministic train/val/test split: md5-derived bucket per doc
# (stable across runs, engines, and cluster sizes — the reproducible
# alternative to rand()-based sampling for training-data pipelines),
# stratification audited per lang.

def q48(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load_table(spark, sf_dir, "documents")
    bucket = (
        md5_long60(F.col("doc_id").cast("string"))
        % 100
    )
    split = (
        F.when(bucket < 80, "train").when(bucket < 90, "val").otherwise("test")
    )
    return (
        d.withColumn("split", split)
        .groupBy("lang", "split")
        .agg(
            F.count("*").cast("bigint").alias("n_docs"),
            F.sum("n_chars").cast("bigint").alias("total_chars"),
        )
        .orderBy("lang", "split")
    )


# ---------------------------------------------------------------------------

# Q49 — X2 completion: transitive closure of the near-dup pairs.
# Pairwise dedup alone under-deletes (A~B, B~C but A!~C keeps two of
# three); canonical keep-one-per-set needs connected components. Spark
# side: min-label propagation (operators/dedup.connected_components);
# oracle side: recursive CTE computing min reachable id. Components are
# summarized (min id, size, max member) so the output is stable.

def q49(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load_table(spark, sf_dir, "documents")
    # Cache the narrow (id, sig) SIGNATURE frame, not the pairs: both
    # the band join (candidate pairs) and the doc->sig re-labeling at
    # the end derive from it, so the expensive explode+32-vote
    # aggregation runs once and the old union-distinct reconstruction
    # of doc->sig from the pairs disappears entirely. Membership is
    # unchanged: a doc's sig reaches the closure iff it has >= 1
    # Hamming<=2 partner, exactly when the old pairs-derived map kept it.
    sigs = _cache_scoped(dedup.simhash_signatures(d))
    pairs = dedup.simhash_hamming_pairs_from_sigs(sigs, max_hamming=2, n_bands=4)
    # Contract exact-signature cliques BEFORE the closure: duplicate
    # clusters are near-cliques, so the doc-level graph has O(cluster^2)
    # edges while the signature-level graph has one node per distinct
    # signature — iterate on that (orders of magnitude smaller), then
    # map docs back through their signature. Membership is identical:
    # same-sig docs are Hamming-0 connected by construction.
    # no .distinct() here: connected_components dedups inside its own
    # bidirected-edges job anyway — a pre-distinct is a wasted shuffle
    sig_pairs = pairs.select("sig_a", "sig_b")
    sig_comps = dedup.connected_components(sig_pairs, id_a="sig_a", id_b="sig_b")
    labeled = sigs.join(
        F.broadcast(sig_comps.withColumnRenamed("id", "sig")), "sig"
    )
    # component key = min member doc id (stable, sig-independent)
    keyed = labeled.groupBy("comp").agg(
        F.min("id").alias("component"),
        F.count("*").cast("bigint").alias("n_members"),
        F.max("id").cast("bigint").alias("max_member"),
    )
    return keyed.select("component", "n_members", "max_member").orderBy("component")


# Q50 — X4 extension: TF-IDF top-3 characteristic terms per document.
# The idf ratio stays un-logged (monotone, and a quotient of exact ints
# is bit-identical across engines where libm ln is not).

def q50(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load_table(spark, sf_dir, "documents").filter(F.col("doc_id") < 100)
    out = text.tfidf_top_terms(d, k=3)
    return out.select(
        "doc_id", "term", "rank", dec4("score").alias("score")
    ).orderBy("doc_id", "rank")


# Q51 — fixed-width binned histogram per metric family (the width_bucket
# shape: floor(value/width); empty buckets absent by construction).

def q51(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    return (
        ev.groupBy(
            "event_type",
            F.floor(F.col("value") / 50).cast("bigint").alias("bucket"),
        )
        .agg(F.count("*").cast("bigint").alias("n"))
        .orderBy("event_type", "bucket")
    )


# Q52 — PII scrub (X10): count + redact emails/phone numbers. The
# fixture text carries no PII, so both sides compose identical
# deterministic PII-bearing text from the doc id first (the operator
# under test is the scrub, the synthesis is fixture mapping).

def q52(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load_table(spark, sf_dir, "documents")
    composed = d.select(
        "doc_id",
        F.concat(
            F.col("text"),
            F.lit(" contact user"),
            F.col("doc_id").cast("string"),
            F.lit("@mail.example or call 555-"),
            F.lpad((F.col("doc_id") % 1000).cast("string"), 3, "0"),
            F.lit("-"),
            F.lpad((F.col("doc_id") % 10000).cast("string"), 4, "0"),
        ).alias("t"),
    )
    return (
        text.pii_scrub(composed, text_col="t")
        .select(
            "doc_id",
            "n_emails",
            "n_phones",
            F.md5("redacted").alias("redacted_hash"),
        )
        .orderBy("doc_id")
    )


# Q53 — stratified quality selection (X11): top-5 docs per language by
# the deterministic quality score (ties by doc_id). The per-lang window
# is the quota-sampling shape of corpus curation. Two-phase: a
# lang-partitioned window would sort all-of-English on one task at
# 100x, so phase 1 ranks within (lang, doc_id-hash bucket) and phase 2
# re-ranks the <= 5*64 survivors per language (docs/SCALE.md).

def q53(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load_table(spark, sf_dir, "documents")
    return (
        skew.two_phase_topk(
            d.withColumn("__q", text.quality_score()),
            ["lang"],
            [F.col("__q").desc(), F.col("doc_id").asc()],
            k=5,
            bucket_on=F.col("doc_id"),
        )
        .select("lang", "rnk", "doc_id", dec4("__q").alias("quality"))
        .orderBy("lang", "rnk")
    )


# Q54 — token-budget packing (X12): greedy assignment of documents to
# fixed-token-budget training packs per language — pack id is the
# starting cumulative-token offset divided by the budget (window
# cumsum; deterministic doc_id order).


def q54(spark: SparkSession, sf_dir: str) -> DataFrame:
    # The running token total is a skew.bucketed_prefix_sum, not a
    # lang-partitioned window cumsum: the single-window form funnels the
    # whole corpus per language through one task's sort at 100x, while
    # the bucketed decomposition's windows are bounded by bucket width
    # and by #buckets respectively (docs/SCALE.md).
    d = load_table(spark, sf_dir, "documents")
    packed = skew.bucketed_prefix_sum(
        d.withColumn("__n_tok", text.token_count()),
        ["lang"],
        "doc_id",
        "__n_tok",
        out_col="__cum",
    ).withColumn(
        "pack_id",
        F.floor((F.col("__cum") - F.col("__n_tok")) / _PACK_BUDGET).cast("bigint"),
    )
    return (
        packed.groupBy("lang", "pack_id")
        .agg(
            F.count("*").cast("bigint").alias("n_docs"),
            F.sum("__n_tok").cast("bigint").alias("sum_tokens"),
        )
        .orderBy("lang", "pack_id")
    )


# Q55 — repetition quality filter (X13): the published Gopher-rule
# shape — flag documents dominated by one token or by repeated bigrams.
# All signals are exact-integer quotients (cross-engine bit-identical).

def q55(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load_table(spark, sf_dir, "documents")
    stats = text.repetition_stats(d)
    return (
        stats.select(
            "doc_id",
            "n_tok",
            dec4("top_word_frac").alias("top_word_frac"),
            dec4("dup_bigram_frac").alias("dup_bigram_frac"),
            (
                (F.col("top_word_frac") > 0.2) | (F.col("dup_bigram_frac") > 0.5)
            ).alias("is_repetitive"),
        )
        .orderBy("doc_id")
    )


# Q56 — domain-mixing weights (X14): per-source sampling weight to hit
# a uniform target mix — weight = n_total / (n_sources * n_docs_src),
# the exact-integer-ratio form of target_frac / actual_frac.

def q56(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load_table(spark, sf_dir, "documents")
    per_src = d.groupBy("source").agg(F.count("*").cast("bigint").alias("n_docs"))
    totals = per_src.agg(
        F.sum("n_docs").cast("bigint").alias("n_total"),
        F.count("*").cast("bigint").alias("n_sources"),
    )
    return (
        per_src.crossJoin(F.broadcast(totals))
        .select(
            "source",
            "n_docs",
            dec4(
                F.col("n_total") / (F.col("n_sources") * F.col("n_docs"))
            ).alias("mix_weight"),
        )
        .orderBy("source")
    )


# Q57 — multi-probe LSH top-k (X3 recall knob): same literal SRP planes
# as Q29, but each query also probes the buckets reached by flipping its
# two least-confident sign bits (smallest |projection|, plane-index
# tie-break). Probe sets nest as n_probes grows, so recall vs the exact
# Q23 baseline is monotone non-decreasing (tests/test_extensions.py).

def q57(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = load_table(spark, sf_dir, "embeddings")
    queries = e.filter(F.col("vec_id") < 10).select(
        F.col("vec_id").alias("q_id"), "embedding"
    )
    return (
        similarity.lsh_topk_literal(e, queries, _PLANES, k=5, n_probes=3)
        .withColumn("cosine", F.col("cosine").cast("string"))
        .orderBy("q_id", "rank")
    )


# Q58 — multi-probe IVF ANN: the query probes its TWO nearest centroids'
# inverted lists (nprobe=2); corpus assignment unchanged. The nested
# probe-set property makes recall monotone in nprobe — the standard IVF
# answer to per-list recall loss as the corpus grows 100x.

def q58(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = load_table(spark, sf_dir, "embeddings")
    cents = e.filter(F.col("vec_id") < 8).select(
        F.col("vec_id").alias("c_id"), "embedding"
    )
    queries = e.filter((F.col("vec_id") % 50 == 0) & (F.col("vec_id") >= 8)).select(
        F.col("vec_id").alias("q_id"), "embedding"
    )
    return (
        similarity.ivf_topk(e, cents, queries, k=5, n_probes=2)
        .withColumn("cosine", F.col("cosine").cast("string"))
        .orderBy("q_id", "rank")
    )


# Q59 — decontamination (X17): fraction of each candidate doc's
# distinct 4-grams found anywhere in the benchmark subset (sources
# src0/src1 stand in for the eval suite; k=4 is the 13-gram check
# scaled to the ~55-token synthetic docs). int/int double ratio is
# cross-engine exact; dec4 only formats it.

_BENCH_SOURCES = ("src0", "src1")


def q59(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load_table(spark, sf_dir, "documents")
    bench = d.filter(F.col("source").isin(*_BENCH_SOURCES))
    cand = d.filter(~F.col("source").isin(*_BENCH_SOURCES))
    return (
        dedup.contamination_fractions(cand, bench, k=4)
        .select(
            F.col("id").alias("doc_id"),
            "n_grams",
            "n_contaminated",
            dec4("contamination").alias("contamination"),
        )
        .orderBy("doc_id")
    )


# Q60 — n-gram novelty (X18): per doc, the fraction of its distinct
# 3-grams first introduced (min doc id) by this document.

def q60(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load_table(spark, sf_dir, "documents")
    return (
        dedup.novelty_fractions(d, k=3)
        .select(
            F.col("id").alias("doc_id"),
            "n_grams",
            "n_novel",
            dec4("novelty").alias("novelty"),
        )
        .orderBy("doc_id")
    )


# Q61 — X19: incremental-ingestion dedup. The q48-style deterministic
# md5 bucket splits documents into an "already ingested" corpus
# (bucket < 70) and today's batch; every batch doc is classified
# kept / dup_corpus / dup_batch and the report aggregates per
# (source, status) — the shape a crawl-snapshot pipeline re-runs daily.

def q61(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load_table(spark, sf_dir, "documents")
    bucket = (
        md5_long60(F.col("doc_id").cast("string"))
        % 100
    )
    corpus = d.filter(bucket < 70)
    batch = d.filter(bucket >= 70)
    return (
        dedup.incremental_dedup_report(corpus, batch)
        .groupBy("source", "status")
        .agg(F.count("*").cast("bigint").alias("n_docs"))
        .orderBy("source", "status")
    )


# Q62 — X20: corpus-df boilerplate token removal; per-doc cleaned
# stream verified by md5 (order-preserving strip).

def q62(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load_table(spark, sf_dir, "documents")
    return (
        text.boilerplate_strip(d, max_df_frac=0.3)
        .select(F.col("id").alias("doc_id"), "n_tokens", "n_kept", "kept_hash")
        .orderBy("doc_id")
    )


# Q63 — X21: memorization-risk audit — per-doc globally-unique-3-gram
# fraction, banded and reported per (lang, band).

def q63(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load_table(spark, sf_dir, "documents")
    stats = dedup.singleton_gram_stats(d, k=3)
    band = (
        F.when(F.col("risk") >= 0.5, "high")
        .when(F.col("risk") >= 0.2, "medium")
        .otherwise("low")
    )
    return (
        stats.join(d.select(F.col("doc_id").alias("id"), "lang"), "id")
        .withColumn("band", band)
        .groupBy("lang", "band")
        .agg(
            F.count("*").cast("bigint").alias("n_docs"),
            F.sum("n_grams").cast("bigint").alias("n_grams"),
            F.sum("n_singleton").cast("bigint").alias("n_singleton"),
        )
        .orderBy("lang", "band")
    )


# Q64 — cluster-profile report: IVF coarse assignment (same
# deterministic centroid stand-in as Q30) joined to document metadata
# — the per-cluster composition view cluster-balanced sampling and
# data-mixing decisions read.

def q64(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = load_table(spark, sf_dir, "embeddings")
    d = load_table(spark, sf_dir, "documents")
    cents = e.filter(F.col("vec_id") < 8).select(
        F.col("vec_id").alias("c_id"), "embedding"
    )
    asg = similarity.coarse_assign(e, cents)
    return (
        asg.join(d, asg["vec_id"] == d["doc_id"])
        .groupBy("assigned", "lang")
        .agg(
            F.count("*").cast("bigint").alias("n_docs"),
            F.sum("n_chars").cast("bigint").alias("total_chars"),
        )
        .orderBy("assigned", "lang")
    )


# Q65 — cluster-balanced sampling (X25): top-3 documents per embedding
# cluster by quality score — the diversity-aware selection step that
# follows cluster profiling (Q64). The per-cell ranking goes through
# skew.two_phase_topk because `assigned` has 8 values: a plain
# Window.partitionBy(assigned) would funnel the corpus through 8 tasks.

def q65(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = load_table(spark, sf_dir, "embeddings")
    d = load_table(spark, sf_dir, "documents")
    cents = e.filter(F.col("vec_id") < 8).select(
        F.col("vec_id").alias("c_id"), "embedding"
    )
    asg = similarity.coarse_assign(e, cents)
    scored = d.withColumn("__q", text.quality_score()).join(
        asg, d["doc_id"] == asg["vec_id"]
    )
    return (
        skew.two_phase_topk(
            scored,
            ["assigned"],
            [F.col("__q").desc(), F.col("doc_id").asc()],
            k=3,
            bucket_on=F.col("doc_id"),
        )
        .select("assigned", "rnk", "doc_id", dec4("__q").alias("quality"))
        .orderBy("assigned", "rnk")
    )


# Q66 — top duplicated passages (X26): the 20 most widely shared
# 5-gram passages with their document frequency and first carrier —
# the report that locates template/boilerplate passages before a
# span-level cleanup. Document frequency is aggregated on the md5
# digest (narrow shuffle key); one representative gram string rides
# along as min() so the report stays human-readable without grouping
# on raw 5-gram text. The global top-20 is a TakeOrderedAndProject
# (k-bounded), never a full sort.

def q66(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load_table(spark, sf_dir, "documents")
    # token array materialized as a column before the shingle lambda
    # (no CSE inside HOF lambda bodies — the 7x pitfall)
    grams = d.withColumn("__toks", F.split(F.col("text"), " ")).select(
        F.col("doc_id"),
        F.explode(
            F.array_distinct(dedup.shingles_of(F.col("__toks"), 5))
        ).alias("gram"),
    )
    top = (
        # 60-bit integer digest as the group key (same md5 root as the
        # oracle's GROUP BY md5(gram) — counts identical, 8-byte key)
        grams.groupBy(
            md5_long60(F.col("gram")).alias("gram_hash")
        )
        .agg(
            F.min("gram").alias("gram"),
            F.count("*").cast("bigint").alias("df"),
            F.min("doc_id").alias("first_doc"),
        )
        .orderBy(F.col("df").desc(), F.col("gram").asc())
        .limit(20)
    )
    return top.select("gram", "df", "first_doc")


# Q67 — curation funnel (X27): the whole pre-training cleanup pipeline
# — raw -> exact dedup -> near dedup -> quality gate — as ONE
# single-pass plan: per-doc keep flags via two high-cardinality-key
# windows (digest, minhash sig), then one aggregation of conditional
# sums, unpivoted with stack(). The q10-fusion shape: four stage
# reports without four scans. Short (<3-token) docs fall back to their
# exact digest as the near-dup key — the funnel must never DROP a doc
# merely for being short (matches near_dedup_stream's contract, and
# deliberately diverges from Q22, which merely excludes them from
# cluster REPORTING).

def q67(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load_table(spark, sf_dir, "documents")
    # shared with the composed release-gate pipeline
    # (tests/test_release_gate.py) — one copy of the funnel filter
    flags = text.curation_keep_flags(d)
    one = flags.agg(
        F.count("*").cast("bigint").alias("n1"),
        F.sum("n_tok").cast("bigint").alias("t1"),
        F.sum(F.col("keep_exact").cast("int")).cast("bigint").alias("n2"),
        F.sum(F.when(F.col("keep_exact"), F.col("n_tok")).otherwise(0))
        .cast("bigint")
        .alias("t2"),
        F.sum(F.col("keep_nd").cast("int")).cast("bigint").alias("n3"),
        F.sum(F.when(F.col("keep_nd"), F.col("n_tok")).otherwise(0))
        .cast("bigint")
        .alias("t3"),
        F.sum(F.col("keep_q").cast("int")).cast("bigint").alias("n4"),
        F.sum(F.when(F.col("keep_q"), F.col("n_tok")).otherwise(0))
        .cast("bigint")
        .alias("t4"),
    )
    return one.select(
        F.expr(
            "stack(4, 1, 'raw', n1, t1, 2, 'exact_dedup', n2, t2,"
            " 3, 'near_dedup', n3, t3, 4, 'quality', n4, t4)"
            " as (stage_order, stage, n_docs, n_tokens)"
        )
    ).orderBy("stage_order")


# Q68 — X23: the spherical k-means trainer as a declared query: fit a
# k=8 coarse quantizer on the embeddings table (deterministic k-means||
# seeding + 3 Lloyd rounds), assign every vector, and report per-cluster
# sizes. Iterative (multi-job Lloyd loop + driver-side model state), so
# deliberately NOT SQL-expressible — no oracle entry; the driver records
# the weaker rows-only check and pytest covers recovery semantics
# (tests/test_extensions.py blob test).

def q68(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = load_table(spark, sf_dir, "embeddings")
    # 2 Lloyd rounds + the Arrow-GEMM assignment path: the k-means||
    # seeding already lands near the blob structure, so the marginal
    # round buys nothing at this k while adding a full scheduled job;
    # vectorized=True scores each Arrow batch in one BLAS call instead
    # of a broadcast-join + max_by aggregation per iteration.
    cents = similarity.kmeans_fit(e, k=8, n_iter=2, vectorized=True)
    # centroids are k x d model state: collect once (bounded) and score
    # the final assignment with the same Arrow GEMM quantizer the
    # training loop used (tie-break parity with coarse_assign is pinned
    # in tests/test_extensions.py)
    from emr_trino_autoscale_spark.functions.arrow_udfs import (
        nearest_centroid_vectorized,
    )

    crows = sorted(
        (r["c_id"], [float(x) for x in r["embedding"]]) for r in cents.collect()
    )
    quantize = nearest_centroid_vectorized(
        [cid for cid, _ in crows], [v for _, v in crows], ret_type="int"
    )
    return (
        e.select(quantize(F.col("embedding")).alias("c_id"))
        .groupBy("c_id")
        .agg(F.count("*").cast("bigint").alias("n_vectors"))
        .orderBy("c_id")
    )


# Q69 — X29: out-of-vocabulary audit. Corpus top-1000 vocabulary
# (frequency desc, token asc), per-document OOV fraction, rolled up per
# (source, lang) — the pre-tokenizer sanity check a training pipeline
# runs before committing to a tokenizer build.

def q69(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load_table(spark, sf_dir, "documents")
    cov = text.vocab_coverage(d, vocab_size=1000)
    return (
        d.select(F.col("doc_id").alias("id"), "source", "lang")
        .join(cov, "id")
        .groupBy("source", "lang")
        .agg(
            F.count("*").cast("bigint").alias("n_docs"),
            F.sum("n_oov").cast("bigint").alias("n_oov"),
            F.sum("n_tokens").cast("bigint").alias("n_tokens"),
            F.round(F.avg("oov_rate"), 4).alias("avg_oov_rate"),
        )
        .orderBy("source", "lang")
    )


# Q70 — X30: product-quantization ANN. Codebooks trained distributed
# (all m subspaces in one Lloyd loop), corpus scored through its m-byte
# codes via per-query ADC lookup tables, local top-k per partition then
# a bounded global merge. Iterative training + driver-side model state
# -> rows-only check like q68; recall vs the exact q23 baseline is
# pinned in tests/test_extensions.py.

def q70(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = load_table(spark, sf_dir, "embeddings")
    queries = e.filter(F.col("vec_id") < 10).select(
        F.col("vec_id").alias("q_id"), "embedding"
    )
    cb = similarity.pq_train(e, m=8, ksub=16, n_iter=2)
    return similarity.pq_topk(e, queries, cb, k=5, exclude_self=True).orderBy(
        "q_id", "rank"
    )


# Q71 — X30 oracle twin: PQ encode + ADC with LITERAL md5-derived
# codebooks (similarity.md5_codebooks — the pq analog of the literal
# LSH hyperplanes). DuckDB recomputes the identical codebooks from the
# identical md5 strings, so the whole encode/lookup/rank pipeline is
# hash-verified cross-engine; q70 remains the trained production path.

def q71(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = load_table(spark, sf_dir, "embeddings")
    queries = e.filter(F.col("vec_id") < 10).select(
        F.col("vec_id").alias("q_id"), "embedding"
    )
    cb = similarity.md5_codebooks(m=4, ksub=4, dsub=16)
    return similarity.pq_topk(e, queries, cb, k=5, exclude_self=True).orderBy(
        "q_id", "rank"
    )


# Q72 — X30: semantic dedup via quantized codes (the SemDeDup shape at
# scale): vectors sharing an identical PQ code tuple live in the same
# tiny cell of the quantized space — group on the m-byte code, keep the
# min id per cell. O(n) one-hash-aggregation semantic bucketing, no
# pairwise similarity at all; the literal md5 codebooks make the whole
# thing hash-verifiable like q71.

def q72(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = load_table(spark, sf_dir, "embeddings")
    cb = similarity.md5_codebooks(m=4, ksub=4, dsub=16)
    enc = similarity.pq_encode(e, cb)
    return (
        enc.select(
            "id",
            *[F.col("codes").getItem(s).alias(f"c{s}") for s in range(4)],
        )
        .groupBy("c0", "c1", "c2", "c3")
        .agg(
            F.min("id").alias("keep_id"),
            F.count("*").cast("bigint").alias("n_members"),
        )
        .orderBy("keep_id")
    )


# Q73 — embedding-cosine near-dup PAIRS via banded SRP LSH (X32): the
# sub-quadratic candidate path of the q28 exact baseline. 24 md5-sign
# planes split into 8 bands of 3 bits (measured ~0.9 recall at tau=0.4
# on every SF; r=4 bands measured 0.39-0.56 — too selective for this
# threshold's 66-degree angle); agree-on-a-band => candidate;
# exact-cosine verify at the shared 4-decimal rounding so the output is
# a strict subset of q28's pairs (recall asserted vs exact in pytest).


def q73(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = load_table(spark, sf_dir, "embeddings")
    # r14: the vectorized path verifies in-bucket — single-consumer plan,
    # nothing to persist (the r13 signature cache fed the self-join the
    # in-bucket form no longer has)
    return (
        similarity.near_dup_pairs_lsh(
            e, _PLANES24, n_bands=8, threshold=0.4, vectorized=True,
        )
        .withColumn("cosine", F.col("cosine").cast("string"))
        .orderBy("id_a", "id_b")
    )


# Q74 — X34: token-window chunking (64-token chunks, 16-token overlap,
# stride 48). Row-local sequence/explode — no shuffle; the final chunk
# runs short rather than dropping tail tokens.

def q74(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load_table(spark, sf_dir, "documents")
    return text.chunk_tokens(d, chunk=64, overlap=16).orderBy("doc_id", "chunk_idx")


# Q75 — X35: unigram-LM quality score (CCNet shape): per-doc avg
# negative log-likelihood under the corpus top-1000 unigram
# distribution, OOV floored at 1/total.

def q75(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load_table(spark, sf_dir, "documents")
    s = text.unigram_logloss(d, vocab_size=1000)
    return (
        d.select("doc_id", "lang")
        .join(s, "doc_id")
        .select(
            "doc_id",
            "lang",
            "n_tokens",
            "n_oov",
            dec4(F.col("logloss")).alias("logloss"),
        )
        .orderBy("doc_id")
    )


# Q76 — X36: leakage-safe split audit. The split is a pure md5 function
# of the SOURCE key, so a domain can never straddle splits; the audit
# reports per-split volume. countDistinct + plain aggs only (the
# distinct+percentile expand pitfall doesn't apply).

def q76(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load_table(spark, sf_dir, "documents")
    return (
        d.withColumn("split", skew.hash_split("source"))
        .groupBy("split")
        .agg(
            F.count("*").cast("bigint").alias("n_docs"),
            F.countDistinct("source").cast("bigint").alias("n_domains"),
            F.sum(F.size(F.split(F.col("text"), " ")))
            .cast("bigint")
            .alias("total_tokens"),
        )
        .orderBy("split")
    )


# Q77 — X37: DSIR-shaped importance weight — per-doc sum of
# ln(p_target / p_corpus) over 1024 md5-hashed unigram buckets
# (add-one smoothed); target distribution = the lang='en' slice.

def q77(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load_table(spark, sf_dir, "documents")
    s = text.dsir_logratio(d, target_filter=F.col("lang") == "en", n_buckets=1024)
    return (
        d.select("doc_id", "lang")
        .join(s, "doc_id")
        .select(
            "doc_id",
            "lang",
            "n_tokens",
            dec4(F.col("log_ratio")).alias("log_ratio"),
        )
        .orderBy("doc_id")
    )


# Q78 — X38: bigram LM statistics / BPE merge candidates — top-25
# adjacent token pairs by corpus count with conditional prob P(b|a).
# Pair extraction is row-local (slice+arrays_zip); one hash agg.

def q78(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load_table(spark, sf_dir, "documents")
    b = text.bigram_stats(d)
    top = skew.two_phase_topk(
        b,
        part_cols=[],
        order_cols=[
            F.col("pair_count").desc(),
            F.col("tok_a").asc(),
            F.col("tok_b").asc(),
        ],
        k=25,
        bucket_on=F.concat_ws(" ", "tok_a", "tok_b"),
    )
    return top.select(
        "tok_a",
        "tok_b",
        "pair_count",
        "left_count",
        dec4(F.col("cond_prob")).alias("cond_prob"),
    ).orderBy(F.col("pair_count").desc(), "tok_a", "tok_b")


# Q79 — X39: linear quality classifier audit — per-(source, verdict)
# doc counts and mean sigmoid score under literal logistic weights.
# Narrow codegen projection + one agg; the 100 TB-cheap first filter.

def q79(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load_table(spark, sf_dir, "documents")
    return (
        text.quality_classifier(d)
        .groupBy("source", "verdict")
        .agg(
            F.count("*").cast("bigint").alias("n_docs"),
            dec4(F.avg("q_score")).alias("avg_score"),
        )
        .orderBy("source", "verdict")
    )


# Q80 — X40: perplexity-gated subsampling audit — fixed logloss
# thresholds bucket docs low/mid/high; a deterministic md5 coin keeps a
# per-bucket fraction (1.0/0.5/0.1). Reports per-bucket volumes.
# Thresholds 3.40/3.41 sit inside the synthetic corpus's tight logloss
# band (~3.39-3.71 at every SF, measured) so all three buckets populate;
# a real crawl would use the operator's wider defaults.

def q80(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load_table(spark, sf_dir, "documents")
    g = text.perplexity_gate(d, mid_loss=3.40, high_loss=3.41)
    return (
        g.groupBy("bucket")
        .agg(
            F.count("*").cast("bigint").alias("n_docs"),
            F.sum(F.col("keep").cast("int")).cast("bigint").alias("n_kept"),
            dec4(F.avg(F.col("keep").cast("double"))).alias("kept_rate"),
            F.sum(F.when(F.col("keep"), F.col("n_tokens")).otherwise(0))
            .cast("bigint")
            .alias("kept_tokens"),
        )
        .orderBy("bucket")
    )


# Q81 — X41: winsorized per-source length statistics — exact p05/p95
# per source, values clamped, robust mean vs raw mean + clipped count.

def q81(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load_table(spark, sf_dir, "documents")
    w = text.winsorized_stats(d, group_col="source", value_col="n_chars")
    return w.select(
        "source",
        "n",
        dec4(F.col("raw_mean")).alias("raw_mean"),
        dec4(F.col("win_mean")).alias("win_mean"),
        dec4(F.col("p_lo")).alias("p_lo"),
        dec4(F.col("p_hi")).alias("p_hi"),
        "n_clipped",
    ).orderBy("source")


# Q82 — X42: duplicated-span detection — maximal runs of corpus-
# duplicated 5-gram positions merged into token spans per doc
# (gaps-and-islands over the positional gram hits).

def q82(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load_table(spark, sf_dir, "documents")
    return dedup.duplicated_spans(d, k=5).orderBy("doc_id", "span_start")


# Q83 — X43: BM25 retrieval — top-15 documents for a literal 3-term
# query (k1=1.2, b=0.75, Lucene idf form).

_BM25_TERMS = ("vector", "hash", "merge")


def q83(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load_table(spark, sf_dir, "documents")
    s = text.bm25_scores(d, _BM25_TERMS)
    return (
        s.select("doc_id", "n_matched", dec4(F.col("score")).alias("score"))
        .orderBy(F.col("score").cast("double").desc(), "doc_id")
        .limit(15)
    )


# Q84 — X44: per-source Jensen-Shannon divergence from the corpus token
# distribution (top-1000 vocab + lumped OOV bucket, nats).

def q84(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load_table(spark, sf_dir, "documents")
    j = text.js_divergence(
        d, group_col="source", vocab_size=1000, persist_fn=_cache_scoped
    )
    return j.select(
        "source", "n_tokens", dec4(F.col("jsd")).alias("jsd")
    ).orderBy("source")


# Q85 — X45: BPE vocabulary induction — top-8 learned merges. Rows-only
# check (iterative trainer, the q68/q70 convention); the counting core
# is hash-verified by Q86 and the merge semantics are pytest-pinned.

def q85(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load_table(spark, sf_dir, "documents")
    return text.bpe_learn(d, n_merges=8).orderBy("rank")


# Q86 — X45 (counting core): adjacent character-pair frequencies over
# the word histogram — the exact statistic each BPE round maximizes,
# surfaced non-iteratively so the oracle can hash-verify it.

def q86(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load_table(spark, sf_dir, "documents")
    s = text.bpe_pair_stats(d)
    return (
        skew.two_phase_topk(
            s,
            part_cols=[],
            order_cols=[
                F.col("pair_count").desc(),
                F.col("left").asc(),
                F.col("right").asc(),
            ],
            k=20,
            bucket_on=F.concat_ws("", "left", "right"),
        )
        .select("left", "right", "pair_count")
        .orderBy(F.col("pair_count").desc(), "left", "right")
    )


# Q87 — X46: cross-split leakage audit — distinct 13-grams shared
# between each pair of the X36 md5-keyed splits.

def q87(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load_table(spark, sf_dir, "documents")
    return dedup.split_gram_overlap(
        d, split_col=skew.hash_split("source"), k=13
    ).orderBy("split_a", "split_b")


# Q88 — X48: hard-negative mining — per anchor, top-5 most-similar
# corpus vectors with a DIFFERENT label (contrastive batch shape).

def q88(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = load_table(spark, sf_dir, "embeddings")
    anchors = e.filter(F.col("vec_id") % 125 == 0).select(
        F.col("vec_id").alias("q_id"), "label", "embedding"
    )
    return (
        similarity.hard_negatives(e, anchors, k=5)
        .withColumn("cosine", F.col("cosine").cast("string"))
        .orderBy("q_id", "rank")
    )


# Q89 — X50: count-min-sketch heavy hitters — exact top-20 tokens vs
# their CMS estimates (d=4 md5 rows x w=1024), with the CMS guarantees
# emitted as booleans (never_under is unconditional; within_eps uses
# the e/w bound — all deterministic here because the hashes are md5).

def q89(spark: SparkSession, sf_dir: str) -> DataFrame:
    import math

    d_rows, w = 4, 1024
    docs = load_table(spark, sf_dir, "documents")
    toks = docs.select(F.explode(F.split(F.col("text"), " ")).alias("tok"))
    exact = toks.groupBy("tok").agg(F.count("*").cast("bigint").alias("exact_count"))
    top = skew.two_phase_topk(
        exact,
        part_cols=[],
        order_cols=[F.col("exact_count").desc(), F.col("tok").asc()],
        k=20,
        bucket_on=F.col("tok"),
    ).select("tok", "exact_count")
    sketch = text.cms_sketch(docs, d=d_rows, w=w)
    est = text.cms_estimate(top, sketch, d=d_rows, w=w)
    total = toks.agg(F.count("*").cast("double").alias("__N"))
    eps = math.e / w
    return (
        top.join(est, "tok")
        .join(F.broadcast(total))
        .select(
            "tok",
            "exact_count",
            "cms_est",
            (F.col("cms_est") >= F.col("exact_count")).alias("never_under"),
            (
                F.col("cms_est").cast("double")
                <= F.col("exact_count").cast("double") + F.lit(eps) * F.col("__N")
            ).alias("within_eps"),
        )
        .orderBy(F.col("exact_count").desc(), "tok")
    )


# Q90 — X51: JL random projection — exact top-5 cosine neighbors in
# the 16-dim projected space (md5 sign planes, 1/sqrt(16)=0.25 exact
# scale) for the q23 query set; recall vs the 64-dim exact ranking is
# pytest-asserted, the projected-space ranking itself is hash-verified.


def q90(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = load_table(spark, sf_dir, "embeddings")
    p = similarity.random_projection(e, _PLANES_JL)
    queries = p.filter(F.col("vec_id") < 10).select(
        F.col("vec_id").alias("q_id"), "proj"
    )
    return (
        similarity.brute_force_topk(p, queries, k=5, vec_col="proj")
        .withColumn("cosine", F.col("cosine").cast("string"))
        .orderBy("q_id", "rank")
    )


# Q91 — X52: Neyman-optimal stratified sampling audit — per-source
# budget allocation proportional to N_h*sigma_h with md5-coin selection.

def q91(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load_table(spark, sf_dir, "documents")
    a = stats.neyman_allocation(d, "source", "n_chars", total_sample=100)
    return a.select(
        "source",
        "n_docs",
        dec4(F.col("sd")).alias("sd"),
        dec4(F.col("alloc")).alias("alloc"),
        "n_sampled",
    ).orderBy("source")


# Q92 — X53: per-event-type OLS trend of value over time (centered
# covariance form — see stats.grouped_ols for the cancellation note).

def q92(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    fit = stats.grouped_ols(
        ev,
        "event_type",
        x=F.unix_timestamp(F.col("ts")),
        y=F.col("value"),
    )
    return fit.select(
        "event_type",
        "n",
        dec4(F.col("slope") * 3600.0).alias("slope_per_hour"),
        dec4(F.col("intercept")).alias("intercept"),
        dec4(F.col("r2")).alias("r2"),
    ).orderBy("event_type")


# Q93 — X54: rolling z-score anomalies — events >2 sigma off their own
# user's trailing-5 baseline (frame ends at the PRECEDING row).

def q93(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    z = stats.rolling_zscore(ev, lookback=5, threshold=2.0)
    return (
        z.filter(F.col("is_anomaly"))
        .select(
            "event_id",
            "user_id",
            fmt_ts(F.col("ts")).alias("ts"),
            dec4(F.col("value")).alias("value"),
            dec4(F.col("baseline_mean")).alias("baseline_mean"),
            dec4(F.col("zscore")).alias("zscore"),
        )
        .orderBy("user_id", "event_id")
    )


# Q94 — X55: data-quality constraint audit — declarative expectations
# (range, ordering, FK, PK-uniqueness) evaluated as conditional sums /
# anti-join counts, one row per rule. The single lineitem pass carries
# all three row-local rules; the FK rule is a broadcast-dim anti join;
# the PK rule one grouped agg. Rules are deliberately tighter than the
# data (quantity<=45, discount<=0.08) so the audit exercises nonzero
# violation paths alongside clean ones.

def q94(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    o = load_table(spark, sf_dir, "orders")
    row_rules = li.agg(
        F.count("*").cast("bigint").alias("__n"),
        F.sum(
            ((F.col("l_quantity") < 1) | (F.col("l_quantity") > 45)).cast("int")
        ).cast("bigint").alias("__v_qty"),
        F.sum((F.col("l_discount") > 0.08).cast("int")).cast("bigint").alias("__v_disc"),
        F.sum((F.col("l_extendedprice") <= 0).cast("int"))
        .cast("bigint")
        .alias("__v_price"),
    )
    fk_viol = (
        li.join(o.select("o_orderkey"), li["l_orderkey"] == o["o_orderkey"], "left_anti")
        .agg(F.count("*").cast("bigint").alias("__v"))
    )
    n_orders = o.agg(F.count("*").cast("bigint").alias("__n"))
    pk_viol = (
        o.groupBy("o_orderkey")
        .agg(F.count("*").alias("__c"))
        .filter(F.col("__c") > 1)
        .agg(F.coalesce(F.sum("__c"), F.lit(0)).cast("bigint").alias("__v"))
    )
    rules = (
        row_rules.select(
            F.lit("l_quantity_in_1_45").alias("rule"),
            F.col("__n").alias("n_checked"),
            F.col("__v_qty").alias("n_violations"),
        )
        .unionAll(
            row_rules.select(
                F.lit("l_discount_le_008").alias("rule"),
                F.col("__n").alias("n_checked"),
                F.col("__v_disc").alias("n_violations"),
            )
        )
        .unionAll(
            row_rules.select(
                F.lit("extendedprice_positive").alias("rule"),
                F.col("__n").alias("n_checked"),
                F.col("__v_price").alias("n_violations"),
            )
        )
        .unionAll(
            row_rules.select(F.lit("orderkey_fk").alias("rule"), F.col("__n").alias("n_checked"))
            .join(fk_viol)
            .select("rule", "n_checked", F.col("__v").alias("n_violations"))
        )
        .unionAll(
            n_orders.select(F.lit("orderkey_pk_unique").alias("rule"), F.col("__n").alias("n_checked"))
            .join(pk_viol)
            .select("rule", "n_checked", F.col("__v").alias("n_violations"))
        )
    )
    return rules.select(
        "rule",
        "n_checked",
        "n_violations",
        dec4(F.col("n_violations").cast("double") / F.col("n_checked")).alias(
            "violation_rate"
        ),
    ).orderBy("rule")


# Q95 — X56: SCD2 history build — each user's event_type timeline as
# effective-dated rows (effective_to = next change, NULL while current).
# One lead() window partitioned by the corpus-cardinality user key.

def q95(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy(
        F.col("ts").asc(), F.col("event_id").asc()
    )
    return (
        ev.withColumn("__next", F.lead("ts").over(w))
        .select(
            "user_id",
            "event_id",
            F.col("event_type").alias("state"),
            fmt_ts(F.col("ts")).alias("effective_from"),
            fmt_ts(F.col("__next")).alias("effective_to"),
            F.col("__next").isNull().alias("is_current"),
        )
        .orderBy("user_id", "effective_from", "event_id")
    )


# Q96 — X58: TF-IDF weighted cosine near-dup join at tau=0.9. The
# oracle is the BRUTE-FORCE relational form — equality proves the
# prefix filter lossless, not merely high-recall.

def q96(spark: SparkSession, sf_dir: str) -> DataFrame:
    # bounded 500-doc slice: the synthetic corpus's ~50-token vocabulary
    # defeats prefix pruning (every doc shares every frequent token), so
    # the all-pairs verify cost governs — see docs/SCALE.md q96 note.
    # IDF/norms are computed WITHIN the slice (self-contained semantics).
    d = load_table(spark, sf_dir, "documents").filter(F.col("doc_id") < 500)
    p = dedup.tfidf_cosine_pairs(d, threshold=0.9, persist_fn=_cache_scoped)
    return p.select(
        "id_a", "id_b", F.col("cosine").cast("decimal(38,4)").cast("string").alias("cosine")
    ).orderBy("id_a", "id_b")


# Q97 — X59: Z-order layout audit — events interleaved on
# (user_id mod 2^16, quantized value), 16 coarse cells; per-cell
# min/max of BOTH dimensions verify the two-dimensional clustering.

def q97(spark: SparkSession, sf_dir: str) -> DataFrame:
    from .operators import bucketing

    ev = load_table(spark, sf_dir, "events")
    x = F.pmod(F.col("user_id"), F.lit(65536))
    y = F.least(
        F.floor(F.col("value") * 655.35).cast("long"), F.lit(65535)
    )
    return (
        bucketing.zorder_layout_audit(ev, x, y, bits=16, n_cells=16)
        .orderBy("cell")
    )


# Q98 — X60: PQ symmetric distance (SDC) top-3 — both sides quantized
# to md5-literal codebooks, distance from the precomputed ksub x ksub
# centroid tables. Hash-verified end to end like q71.

def q98(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = load_table(spark, sf_dir, "embeddings")
    cb = similarity.md5_codebooks(m=4, ksub=4, dsub=16)
    q = e.filter(F.col("vec_id") < 10).select(
        F.col("vec_id").alias("q_id"), "embedding"
    )
    return (
        similarity.pq_sdc_topk(e, q, cb, k=3)
        .orderBy("q_id", "rank")
    )


# Q99 — X61: retrieval eval metrics — the JL-projected ranking (q90)
# scored against the exact 64-dim top-5 (q23 semantics): per-query
# recall@5 / MRR / nDCG@5, hash-verified. This is the honest number
# behind the SCALE.md JL rank-damage note, produced by the engine.

def q99(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = load_table(spark, sf_dir, "embeddings")
    q64 = e.filter(F.col("vec_id") < 10).select(
        F.col("vec_id").alias("q_id"), "embedding"
    )
    truth = similarity.brute_force_topk(e, q64, k=5)
    p = similarity.random_projection(e, _PLANES_JL)
    q16 = p.filter(F.col("vec_id") < 10).select(F.col("vec_id").alias("q_id"), "proj")
    pred = similarity.brute_force_topk(p, q16, k=5, vec_col="proj")
    m = stats.ranking_metrics(pred, truth, k=5)
    return m.select(
        "q_id",
        "n_truth",
        "hits",
        dec4(F.col("recall")).alias("recall"),
        dec4(F.col("mrr")).alias("mrr"),
        dec4(F.col("ndcg")).alias("ndcg"),
    ).orderBy("q_id")


# Q100 — X62: Laplace-mechanism histogram — per-source doc counts with
# deterministic md5-CDF noise at epsilon=1 (mechanism audit; see the
# operator's determinism caveat).

def q100(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load_table(spark, sf_dir, "documents")
    h = stats.dp_histogram(d, "source", epsilon=1.0)
    return h.select(
        "source",
        "true_count",
        dec4(F.col("noise")).alias("noise"),
        dec4(F.col("noisy_count")).alias("noisy_count"),
    ).orderBy("source")


# Q101 — X63: ordered-sequence funnel signup -> view -> click ->
# purchase: per-stage user counts where each stage completes AFTER the
# previous one.

def q101(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    f = ev_ops.sequence_funnel(ev, ("signup", "view", "click", "purchase"))
    return f.select(
        "stage_idx", "stage", "n_users", dec4(F.col("conversion")).alias("conversion")
    ).orderBy("stage_idx")


# Q102 — X64: weekly cohort retention matrix (offsets 0-4) — users by
# first-seen ISO week, later-week active fractions.

def q102(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    r = ev_ops.cohort_retention(ev, max_offset=4)
    return r.select(
        fmt_ts(F.col("cohort_w")).alias("cohort_week"),
        "week_offset",
        "n_active",
        "cohort_size",
        dec4(F.col("retention")).alias("retention"),
    ).orderBy("cohort_week", "week_offset")


# Q104 — X65 semantic dedup (SemDeDup, Abbas et al. 2023): coarse
# cluster assignment against LITERAL md5-derived centroids (the q71
# codebook trick — DuckDB recomputes identical centroid values), then
# within-cluster cosine pairs mark smaller-id near-neighbors as dup_of.

_SEM_CENTROIDS = similarity.md5_centroids(k=8, dim=64)


def q104(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = load_table(spark, sf_dir, "embeddings")
    cents = spark.createDataFrame(
        [(c, v) for c, v in enumerate(_SEM_CENTROIDS)],
        "c_id int, embedding array<double>",
    )
    return similarity.semantic_dedup(
        e, cents, threshold=0.4, persist_fn=_cache_scoped
    ).orderBy("vec_id")


# Q105 — X66 blocking-key entity resolution over the customer dimension:
# 16-char name-prefix blocks, exact Levenshtein <= 1 verify (levenshtein
# exists in both engines).

def q105(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = load_table(spark, sf_dir, "customer").filter(
        F.col("c_mktsegment") == "BUILDING"
    )
    return dedup.blocked_levenshtein_pairs(
        c, id_col="c_custkey", name_col="c_name", block_prefix_len=16, max_dist=1
    ).orderBy("id_a", "id_b")


# Q106 — X67 Efraimidis-Spirakis weighted sampling without replacement:
# deterministic md5 coins (the shared md5_long60 digest shifted into
# (0,1)), key = ln(u)/w, per-language top-10.

def q106(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load_table(spark, sf_dir, "documents")
    return (
        stats.weighted_sample(d, "n_chars", k=10, strata_cols=("lang",))
        .select("lang", "doc_id", "n_chars", "rank")
        .orderBy("lang", "rank")
    )


# Q107 — X68 one-pass per-column data profile over the orders fact
# (string-typed columns only: double/timestamp string forms are
# engine-specific — the profile contract is the STRING form, see
# operator docstring).

def q107(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load_table(spark, sf_dir, "orders")
    return stats.profile_columns(
        o, ("o_orderkey", "o_custkey", "o_orderstatus", "o_orderpriority")
    ).orderBy("column")


# Q108 — X69 source concentration (Lorenz) curve: which sources hold
# the corpus mass, cumulatively.

def q108(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load_table(spark, sf_dir, "documents")
    return stats.concentration_curve(d, group_col="source", value_col="n_chars").orderBy(
        "rank"
    )


# Q103 — X57 image perceptual near-dup with oracle-grade evidence
# (VERDICT r6 task 6): a deterministic synthetic PPM corpus
# (multimodal.synthetic_image_corpus — payloads are pure functions of
# media_id) is decoded to 64-bit aHash signatures, the signatures are
# WRITTEN TO PARQUET first (spark-warehouse/q103_media_sigs) so DuckDB
# verifies from the same input, and the oracle replays the brute-force
# bit_count(xor()) pair join. With the round-7 auto-banding
# (max_hamming=6 -> 8x8-bit bands) the banded candidate join is
# provably exhaustive, so banded == brute force exactly; the decode
# itself (payload -> ahash) is pinned by the X57 unit tests.


def q103(spark: SparkSession, sf_dir: str) -> DataFrame:
    from .operators import multimodal

    media = multimodal.synthetic_image_corpus(spark, n=96)
    multimodal.image_ahash(media).write.mode("overwrite").parquet(_Q103_SIGS_PATH)
    s = spark.read.parquet(_Q103_SIGS_PATH)
    return multimodal.ahash_near_dup_pairs(s, max_hamming=6).orderBy("id_a", "id_b")


# Q109 — X71 CDC-style snapshot diff: two deterministic versions of
# orders (v_old drops orderkey%11==0; v_new drops %7==0 and
# reclassifies %13==0), classified added/removed/changed on a
# digest-contracted full-outer join.

def q109(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load_table(spark, sf_dir, "orders")
    old = o.filter(F.col("o_orderkey") % 11 != 0)
    new = o.filter(F.col("o_orderkey") % 7 != 0).withColumn(
        "o_orderpriority",
        F.when(F.col("o_orderkey") % 13 == 0, F.lit("RECLASSIFIED")).otherwise(
            F.col("o_orderpriority")
        ),
    )
    return registry.snapshot_diff(
        old, new, ("o_orderkey",), ("o_custkey", "o_orderstatus", "o_orderpriority")
    ).orderBy("o_orderkey")


# Q110 — X72 PSI drift between the first and second half of the month,
# per event type, over fixed 50-wide value buckets.

def q110(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = load_table(spark, sf_dir, "events")
    return stats.psi_drift(
        e, period_b=F.dayofmonth("ts") > 15, persist_fn=_cache_scoped
    ).orderBy("event_type")


# Q111 — X74 full banded MinHash+LSH (8 bands x 2 rows, md5-derived
# permutations so DuckDB replays the identical signature matrix),
# exact set-Jaccard verify on candidates.

def q111(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load_table(spark, sf_dir, "documents")
    return dedup.minhash_lsh_pairs(
        d, threshold=0.5, persist_fn=_cache_scoped
    ).orderBy("id_a", "id_b")


# Q112 — X66 multi-pass entity resolution: prefix-16 AND suffix-6
# blocking keys union'd, min exact distance per pair.

def q112(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = load_table(spark, sf_dir, "customer").filter(
        F.col("c_mktsegment") == "BUILDING"
    )
    passes = [
        F.substring(F.col("c_name"), 1, 16),
        F.expr("right(c_name, 6)"),
    ]
    return dedup.multi_pass_entity_pairs(c, passes).orderBy("id_a", "id_b")


# Q113 — X75 normalization-aware exact dedup: lower + ASCII-scrub +
# whitespace-collapse (byte-identical in Java regex and RE2), then the
# X1 digest-group shape.

def q113(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load_table(spark, sf_dir, "documents")
    return text.normalized_exact_dedup(d).orderBy("norm_hash")


# Q114 — X76 per-dimension embedding statistics per label (the
# feature-normalization stats pass), raw-moment std written identically
# in both engines.

def q114(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = load_table(spark, sf_dir, "embeddings")
    return similarity.dimension_stats(e, group_col="label").orderBy(
        "label", "dim"
    )


# Q115 — trigram inverted-index substring search (X77): find every
# (query, doc) where the query string occurs verbatim, via posting-list
# candidates + contains verify — never a per-query corpus scan.

_SEARCH_QUERIES = ["scan merge", "window window", "batch stream", "dup"]


def q115(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load_table(spark, sf_dir, "documents")
    return text.substring_search(
        d, _SEARCH_QUERIES, persist_fn=_cache_scoped
    ).orderBy("query", "doc_id")


# Q116 — token-sequence blocklist filter (X78): one anchored pass for
# all phrases instead of N regex scans.

_BLOCK_PHRASES = ["batch batch batch", "scan merge", "spark window window"]


def q116(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load_table(spark, sf_dir, "documents")
    return text.blocklist_matches(d, _BLOCK_PHRASES).orderBy("doc_id", "phrase")


# Q117 — windowed PMI co-occurrence (X79), window 2, min pair count 5.

def q117(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load_table(spark, sf_dir, "documents")
    return (
        text.pmi_cooccurrence(d, window=2, min_count=5, persist_fn=_cache_scoped)
        .select("tok_a", "tok_b", "pair_count", dec4("pmi").alias("pmi"))
        .orderBy("tok_a", "tok_b")
    )


# Q118 — exact shingle containment pairs (X80): asymmetric near-subset
# detection, prefix-filtered candidate generation, tau = 0.6.

def q118(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load_table(spark, sf_dir, "documents")
    pairs = dedup.containment_pairs(d, threshold=0.6, persist_fn=_cache_scoped)
    return pairs.select(
        "id_a", "id_b", dec4("containment").alias("containment")
    ).orderBy("id_a", "id_b")


# Q119 — per-label per-dimension robust stats (X81): median/q25/q75/IQR,
# exact linear-interpolation quantiles (the oracle form; approx=True is
# the sketch-backed 100 TB path, pytest-pinned).

def q119(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = load_table(spark, sf_dir, "embeddings")
    return similarity.robust_dimension_stats(e, group_col="label").orderBy(
        "label", "dim"
    )


# Q120 — MMR diverse top-k selection (X82): iterative greedy trainer
# (the q68/q85 class — no SQL oracle; the pick sequence is golden-pinned
# in tests/test_extensions.py::test_mmr_select_golden_sequence).

_MMR_QUERY_VEC = similarity.md5_centroids(k=1, dim=64)[0]


def q120(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = load_table(spark, sf_dir, "embeddings")
    return similarity.mmr_select(e, _MMR_QUERY_VEC, k=10, lam=0.7).orderBy("step")


# Q121 — mergeable HLL distinct rollup (X84): per-(event_type, day)
# sketches union upward to per-type and global distinct-user estimates;
# raw data scanned once. Emits bound-validation booleans against exact
# distinct counts (the q43 oracle convention; lgK=12 -> ~1.6% rel err,
# the 6% bound is 4x that — robustly true, not knife-edge).

def q121(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = load_table(spark, sf_dir, "events")
    roll = stats.distinct_rollup(
        e,
        "event_type",
        "user_id",
        shard_col=F.to_date("ts").cast("string"),
        persist_fn=_cache_scoped,
    )
    # exact side in ONE pass: rollup() emits per-type rows plus the
    # grand-total row (NULL key) from a single scan
    exact = e.rollup("event_type").agg(
        F.countDistinct("user_id").cast("bigint").alias("exact_ndv")
    ).select(F.col("event_type").cast("string").alias("key"), "exact_ndv")
    return (
        roll.join(exact, roll["key"].eqNullSafe(exact["key"]))
        .select(
            "level",
            roll["key"].alias("key"),
            "exact_ndv",
            (
                F.abs(F.col("estimate") - F.col("exact_ndv"))
                <= 0.06 * F.col("exact_ndv")
            ).alias("ndv_within_bound"),
        )
        .orderBy("level", "key")
    )


# Q122 — DCT perceptual-hash (pHash) image near-dup pairs (X85): the
# q103 evidence pattern — Spark writes the signature parquet, DuckDB
# brute-forces bit_count(xor) over the same file, so the banded
# candidate generation is oracle-checked as exactly the brute-force
# pair set (exhaustive regime: max_hamming < n_bands).


def q122(spark: SparkSession, sf_dir: str) -> DataFrame:
    from .operators import multimodal

    media = multimodal.synthetic_image_corpus(spark, n=96)
    multimodal.image_phash(media).write.mode("overwrite").parquet(_Q122_SIGS_PATH)
    s = spark.read.parquet(_Q122_SIGS_PATH)
    return multimodal.ahash_near_dup_pairs(
        s, max_hamming=6, sig_col="phash"
    ).orderBy("id_a", "id_b")


# Q123 — audio-fingerprint near-dup pairs (X86): the q103/q122 evidence
# pattern over the deterministic WAV corpus — Spark writes the
# fingerprint parquet, DuckDB brute-forces bit_count(xor) on the same
# file (exhaustive banding regime: max_hamming 4 < 8 bands).


def q123(spark: SparkSession, sf_dir: str) -> DataFrame:
    from .operators import multimodal

    media = multimodal.synthetic_audio_corpus(spark, n=96)
    multimodal.audio_fingerprint(media).write.mode("overwrite").parquet(
        _Q123_SIGS_PATH
    )
    s = spark.read.parquet(_Q123_SIGS_PATH)
    return multimodal.ahash_near_dup_pairs(
        s, max_hamming=4, sig_col="afp"
    ).orderBy("id_a", "id_b")


# Q124 — CUBE with grouping indicators (the one multi-dimensional
# grouping shape q33's ROLLUP left uncovered): per-(source, lang) doc
# stats at all four grouping levels, with explicit grouping() flags so
# engines agree on which NULLs are subtotal markers.

def q124(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load_table(spark, sf_dir, "documents")
    return (
        d.cube("source", "lang")
        .agg(
            F.grouping("source").cast("int").alias("g_source"),
            F.grouping("lang").cast("int").alias("g_lang"),
            F.count("*").cast("bigint").alias("n_docs"),
            F.sum("n_chars").cast("bigint").alias("total_chars"),
        )
        .select(
            "source", "lang", "g_source", "g_lang", "n_docs", "total_chars"
        )
        .orderBy("g_source", "g_lang", "source", "lang")
    )


# Q125 — decile banding (NTILE) with per-band stats: equal-frequency
# bucketing of event values within each type, the feature-binning
# shape quantile histograms don't give (exact equal counts, not equal
# widths). Total order pinned by (value, event_id) so both engines
# assign identical tiles. Implementation is the X88 two-phase rank
# (skew.scalable_ntile) — event_type has ~5 values, so a plain NTILE
# window is the low-cardinality single-task-sort anti-pattern at
# 100 TB; the decomposed form sorts one value-bucket per task and is
# pytest-pinned equal to F.ntile. The oracle stays the plain NTILE.

def q125(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = load_table(spark, sf_dir, "events")
    return (
        skew.scalable_ntile(
            e,
            ["event_type"],
            "value",
            "event_id",
            n_tiles=10,
            bucket_width=25.0,
            out_col="decile",
        )
        .groupBy("event_type", "decile")
        .agg(
            F.count("*").cast("bigint").alias("n"),
            dec4(F.min("value")).alias("lo"),
            dec4(F.max("value")).alias("hi"),
        )
        .orderBy("event_type", "decile")
    )


# Q126 — binned interval join (X89): events against 30 per-type promo
# windows through the bin-decomposed EQUI join — the large x large
# range-join shape q39's broadcast non-equi form cannot survive. The
# oracle replays it as a plain non-equi join, so the decomposition is
# hash-proven lossless.

_IIJ_TYPES = ["click", "error", "purchase", "signup", "view"]


def q126(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = load_table(spark, sf_dir, "events")
    iv = (
        spark.range(30)
        .select(
            F.col("id").cast("bigint").alias("interval_id"),
            F.element_at(
                F.array(*[F.lit(t) for t in _IIJ_TYPES]),
                F.floor(F.col("id") / 6).cast("int") + 1,
            ).alias("event_type"),
            (
                (F.col("id") % 6) * 4 + F.floor(F.col("id") / 6)
            ).cast("int").alias("__d"),
        )
        .withColumn(
            "w_start",
            F.to_timestamp(F.lit("2024-01-01")) + F.expr("make_interval(0,0,0,__d)"),
        )
        .withColumn(
            "w_end",
            F.to_timestamp(F.lit("2024-01-01"))
            + F.expr("make_interval(0,0,0,__d + 2)"),
        )
        .drop("__d")
    )
    return (
        ev_ops.binned_interval_join(
            e, iv, equi_cols=("event_type",), bin_seconds=86400
        )
        .groupBy("interval_id", "event_type")
        .agg(
            F.count("*").cast("bigint").alias("n_events"),
            dec4(F.sum("value")).alias("sum_value"),
        )
        .orderBy("interval_id")
    )


# Q127 — windowed-fact binned overlap join (X89 fact_end variant):
# q39's order-window x quarter-grid semantic rebuilt through the
# bin-decomposed equi join — no broadcast, no nested loop, the form
# that survives an interval side too big to broadcast. Overlap is the
# operator's half-open convention (w_s < q_end AND w_e > q_start);
# the oracle replays the plain non-equi overlap join.

def q127(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load_table(spark, sf_dir, "orders")
    facts = o.select(
        "o_orderkey",
        F.to_timestamp("o_orderdate").alias("w_s"),
        (F.to_timestamp("o_orderdate") + F.expr("INTERVAL 30 DAY")).alias("w_e"),
    )
    grid = (
        o.select(F.date_trunc("quarter", "o_orderdate").alias("q_start"))
        .distinct()
        .withColumn("q_end", F.expr("q_start + INTERVAL 3 MONTH"))
    )
    return (
        ev_ops.binned_interval_join(
            facts,
            grid,
            fact_ts="w_s",
            int_start="q_start",
            int_end="q_end",
            bin_seconds=86400 * 30,
            fact_end="w_e",
        )
        .groupBy(F.date_format("q_start", "yyyy-MM-dd").alias("quarter"))
        .agg(F.count("*").cast("bigint").alias("n_active_orders"))
        .orderBy("quarter")
    )


# Q128 — purged temporal split audit (X90): per-(split, event_type)
# counts + time bounds, proving the embargo band separates train from
# test by the full gap.

def q128(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = load_table(spark, sf_dir, "events")
    return (
        stats.purged_time_split(e, test_start="2024-01-22", embargo_hours=24)
        .groupBy("split", "event_type")
        .agg(
            F.count("*").cast("bigint").alias("n"),
            F.date_format(F.min("ts"), "yyyy-MM-dd HH:mm:ss").alias("first_ts"),
            F.date_format(F.max("ts"), "yyyy-MM-dd HH:mm:ss").alias("last_ts"),
        )
        .orderBy("split", "event_type")
    )


# Q129 — Zipf rank-frequency fit per source (X91): OLS of ln(freq) on
# ln(rank) over the token frequency table — the corpus-health slope a
# curation pass reads per source. Rank rides the X88 decomposition
# (scalable_rank on negated count); the fit is the X53 centered form;
# the oracle mirrors both with a plain window rank + centered SQL.

def q129(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load_table(spark, sf_dir, "documents")
    fit = text.zipf_fit(d, "text", "source", persist_fn=_cache_scoped)
    return fit.select(
        "source",
        "n",
        dec4(F.col("slope")).alias("slope"),
        dec4(F.col("intercept")).alias("intercept"),
        dec4(F.col("r2")).alias("r2"),
    ).orderBy("source")


# Q130 — k-anonymity / l-diversity audit (X92): per-market-segment
# privacy report over the (segment, nation) quasi-identifier with the
# account-balance thousand-band as the sensitive attribute.

def q130(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = load_table(spark, sf_dir, "customer").withColumn(
        "bal_band", F.floor(F.col("c_acctbal") / 1000).cast("bigint")
    )
    aud = stats.k_anonymity_audit(
        c, ["c_mktsegment", "c_nationkey"], "bal_band", k=5
    )
    viol_rows = F.sum(
        F.when(F.col("violates_k"), F.col("class_size")).otherwise(F.lit(0))
    )
    return (
        aud.groupBy("c_mktsegment")
        .agg(
            F.count("*").cast("bigint").alias("n_classes"),
            F.sum(F.when(F.col("violates_k"), 1).otherwise(0))
            .cast("bigint")
            .alias("viol_classes"),
            viol_rows.cast("bigint").alias("viol_rows"),
            F.min("class_size").cast("bigint").alias("min_class_size"),
            F.min(F.when(~F.col("violates_k"), F.col("l_distinct")))
            .cast("bigint")
            .alias("min_l_compliant"),
            dec4(viol_rows / F.sum("class_size")).alias("suppression_rate"),
        )
        .orderBy("c_mktsegment")
    )


# Q131 — exact two-sample Kolmogorov-Smirnov (X93): click vs purchase
# value distributions. The oracle computes the same distinct-value
# cumsums with a plain window; the operator's bucketed prefix sums are
# thereby hash-proven equal to the textbook form.

def q131(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = load_table(spark, sf_dir, "events")
    return stats.ks_two_sample(
        e, "event_type", "value", "click", "purchase", persist_fn=_cache_scoped
    ).select("n_a", "n_b", "d_stat", "d_at_value")


# Q132 — diagonal Mahalanobis outlier gate (X94): top-20 embedding
# outliers by summed squared z-score against the q114 stats contract
# (4-decimal rounded means/stds on BOTH sides — what makes the scores
# bit-comparable).

def q132(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = load_table(spark, sf_dir, "embeddings")
    s = similarity.mahalanobis_scores(emb)
    return (
        s.select(
            "vec_id",
            "label",
            (F.round(F.col("maha_sq"), 4) + F.lit(0.0)).alias("maha_sq"),
        )
        .orderBy(F.col("maha_sq").desc(), F.col("vec_id").asc())
        .limit(20)
    )


# Q133 — audience-overlap matrix (X95): pairwise user-set overlap and
# Jaccard between event types. The oracle is the naive distinct
# (user, type) self-join — exactly the shape the operator's row-local
# pair generation avoids at scale — so the contraction is hash-proven
# lossless.

def q133(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = load_table(spark, sf_dir, "events")
    ov = ev_ops.audience_overlap(e, "user_id", "event_type")
    return ov.select(
        "type_a",
        "type_b",
        "n_a",
        "n_b",
        "n_co",
        dec4(F.col("jaccard")).alias("jaccard"),
    ).orderBy("type_a", "type_b")


# Q134 — Mann-Whitney rank-sum test (X96): click vs purchase location
# shift. Midranks fall out of the q131 distinct-value contraction (no
# per-row ranking pass); the oracle mirrors the identical arithmetic
# over plain window cumsums, so the bucket-decomposed form is
# hash-proven equal to the textbook midrank computation.

def q134(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = load_table(spark, sf_dir, "events")
    return stats.rank_sum_test(
        e, "event_type", "value", "click", "purchase", persist_fn=_cache_scoped
    ).select("n_a", "n_b", "u_a", "z")


# Q135 — chi-squared independence + Cramér's V (X97): is lang
# independent of source in the document corpus? Zero-observed cells
# contribute their full expected mass (margin-grid left join), the
# textbook statistic.

def q135(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load_table(spark, sf_dir, "documents")
    return stats.chi2_independence(
        d, "source", "lang", persist_fn=_cache_scoped
    ).select(
        "n", "dof", "chi2", "cramers_v"
    )


# Q136 — empirical-Bayes shrunk group means (X98): per-(source, lang)
# mean document length pulled toward the global prior with pseudo-count
# 200 — the ranking a curation leaderboard actually sorts by.

def q136(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load_table(spark, sf_dir, "documents")
    return (
        stats.shrunk_group_means(
            d, ["source", "lang"], "n_chars", m=200.0, persist_fn=_cache_scoped
        )
        .select(
            "source",
            "lang",
            "n",
            dec4(F.col("raw_mean")).alias("raw_mean"),
            dec4(F.col("shrunk_mean")).alias("shrunk_mean"),
        )
        .orderBy("source", "lang")
    )


# Q137 — exact weighted quartiles (X100): l_quantity weighted by
# extended price per return flag. Rational-boundary decimal
# comparisons on BOTH sides — no float cumsum ever reaches the >= test
# — so the bucket-decomposed form is hash-proven equal to the plain
# window cumsum oracle.

def q137(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    return (
        stats.weighted_quantile(
            li,
            ["l_returnflag"],
            "l_quantity",
            "l_extendedprice",
            quantiles=((1, 4), (2, 4), (3, 4)),
            bucket_width=16.0,
            persist_fn=_cache_scoped,
        )
        .orderBy("l_returnflag")
    )


# Q138 — Benford first-digit audit (X101) over event values. The digit
# comes from the integer string of round(value * 100), never from
# floor(log10(x)) (libm disagreement at exact powers of ten); the
# Benford expectations are embedded as IDENTICAL literals on both
# sides.


def q138(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = load_table(spark, sf_dir, "events")
    return stats.benford_audit(e, "value", scale=100).orderBy("digit")


# Q139 — Welch's unequal-variance t-test (X102): click vs purchase
# mean shift with the Welch-Satterthwaite df. One stable hash agg.

def q139(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = load_table(spark, sf_dir, "events")
    return stats.welch_t_test(e, "event_type", "value", "click", "purchase")


# Q140 — embedding correlation matrix (X103): upper-triangle pairwise
# Pearson correlation over the 16 dims — one stable hash agg whose
# state is 120 fixed-size co-moment accumulators, zero corpus explode.
# The oracle is the naive unnest self-join.

def q140(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = load_table(spark, sf_dir, "embeddings")
    return similarity.dimension_corr_matrix(emb).orderBy("dim_a", "dim_b")


# Q141 — categorical diversity audit (X104): per-source language mix
# diagnostics — Shannon entropy, normalized entropy, effective
# language count (Hill number), Gini-Simpson.

def q141(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load_table(spark, sf_dir, "documents")
    return stats.diversity_audit(d, "source", "lang").orderBy("source")


# Q142 — label-centroid separability matrix (X105): pairwise cosine
# between per-label embedding centroids, built on the q114
# rounded-stats contract so both engines fold identical numbers.

def q142(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = load_table(spark, sf_dir, "embeddings")
    return similarity.centroid_similarity(emb, "label").orderBy(
        "group_a", "group_b"
    )


# Q143 — grouped exact MAD (X106): robust dispersion per event type
# with the 1.4826 normal-consistency scale; exact two-pass medians
# (quantile_cont parity, the X81 convention).

def q143(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = load_table(spark, sf_dir, "events")
    return stats.grouped_mad(
        e, "event_type", "value", scale=1.4826, persist_fn=_cache_scoped
    ).orderBy("event_type")


# Q144 — time-weighted average (X107): per-type value average weighted
# by how long each observation held (until the user's next event) —
# the irregular-sampling correction the reference's equally-weighted
# poll averages lack. Integer-microsecond durations on both sides.

def q144(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = load_table(spark, sf_dir, "events")
    return ev_ops.time_weighted_avg(e).orderBy("event_type")


# Q145 — centroid-margin label-noise audit queue (X108): the 20
# worst-margin vectors (own-label centroid beaten hardest by another
# label's), the list a labeling team re-reviews first.

def q145(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = load_table(spark, sf_dir, "embeddings")
    s = similarity.label_noise_scores(emb, "label")
    return (
        s.select("vec_id", "label", "best_other_label", "margin")
        .orderBy(F.col("margin").asc(), F.col("vec_id").asc())
        .limit(20)
    )


# Q146 — telemetry debounce audit (X109): per-type counts of echo
# (consecutive same-type same-value repeats within 60 s per user)
# vs kept events — the retry-storm cleanup report.

def q146(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = load_table(spark, sf_dir, "events")
    return (
        ev_ops.debounce_events(e, window_seconds=60.0)
        .groupBy("event_type")
        .agg(
            F.count("*").cast("bigint").alias("n_total"),
            F.sum(F.when(F.col("is_echo"), 1).otherwise(0))
            .cast("bigint")
            .alias("n_echo"),
            F.sum(F.when(~F.col("is_echo"), 1).otherwise(0))
            .cast("bigint")
            .alias("n_kept"),
        )
        .orderBy("event_type")
    )


# Q147 — LOCF grid resampling (X111): every user sampled on the 6-hour
# grid carrying their latest observation, rolled up per day. The
# oracle replays it as DuckDB's native ASOF LEFT JOIN, so the
# union-and-carry window form is hash-proven equal to the textbook
# as-of semantics.

def q147(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = load_table(spark, sf_dir, "events")
    r = ev_ops.resample_locf(e, step_seconds=21600)
    return (
        r.groupBy(
            F.date_format(
                F.timestamp_micros(F.col("tick_us")), "yyyy-MM-dd"
            ).alias("day")
        )
        .agg(
            F.count("*").cast("bigint").alias("n_points"),
            F.count_distinct("user_id").cast("bigint").alias("n_users"),
            # SUM, not AVG: carried values are 2-decimal, so the sum
            # sits far from 4-decimal half-way boundaries; an AVG here
            # landed exactly on .xxxx5 at sf0.01 and the engines round
            # half-up vs binary (the documented dec4 gotcha)
            dec4(F.sum("value")).alias("sum_value"),
        )
        .orderBy("day")
    )


# Q148 — trailing 7-day active users via mergeable HLL unions (X112):
# per-day estimate from unioning the 7 daily sketches, validated
# against the exact recount (q43/q121 boolean convention — the oracle
# computes the exact side and literal TRUE).

def q148(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = load_table(spark, sf_dir, "events")
    est = stats.sliding_distinct(
        e, "ts", "user_id", window_days=7, persist_fn=_cache_scoped
    )
    ud = e.select(
        F.date_trunc("day", "ts").alias("__d"), "user_id"
    ).distinct()
    days = ud.select(F.col("__d").alias("day")).distinct()
    exact = (
        days.join(
            ud,
            (F.col("__d") <= F.col("day"))
            & (F.col("__d") >= F.col("day") - F.expr("INTERVAL 6 DAYS")),
        )
        .groupBy("day")
        .agg(F.count_distinct("user_id").cast("bigint").alias("exact_active"))
    )
    return (
        est.join(exact, "day")
        .select(
            F.date_format("day", "yyyy-MM-dd").alias("day"),
            "n_days_covered",
            "exact_active",
            (
                F.abs(F.col("estimate") - F.col("exact_active"))
                <= 0.05 * F.col("exact_active")
            ).alias("ndv_within_bound"),
        )
        .orderBy("day")
    )


# Q149 — X113: recall-COMPLETE edit-distance join (q-gram count filter
# + prefix filter, Ed-Join family) on customer names, the exactness
# upgrade over q105/q112's blocking passes. The oracle is the
# EXHAUSTIVE pair scan — feasible at sf0.01 (1500^2 levenshtein evals)
# precisely because it is the thing the operator avoids at scale; a
# hash match therefore proves 100% recall on this corpus, not just
# precision.

def q149(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = load_table(spark, sf_dir, "customer")
    return dedup.qgram_edit_join(
        c, id_col="c_custkey", str_col="c_name", q=3, max_dist=1,
        persist_fn=_cache_scoped,
    ).orderBy("id_a", "id_b")


# Q150 — X114: fixed-iteration PageRank over the customer->supplier
# order graph. The oracle UNROLLS the three power iterations as chained
# CTEs — possible precisely because the iteration count is a declared
# constant, which is what makes an iterative algorithm oracle-checkable
# at all (the q68/q70 trainers aren't, by design). Teleport factor is
# written (1.0 - 0.85) on BOTH sides so the engines round the same
# binary double.

def q150(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load_table(spark, sf_dir, "orders")
    l = load_table(spark, sf_dir, "lineitem")
    edges = o.join(l, o.o_orderkey == l.l_orderkey).select(
        F.concat(F.lit("c:"), F.col("o_custkey")).alias("src"),
        F.concat(F.lit("s:"), F.col("l_suppkey")).alias("dst"),
    )
    pr = graph.pagerank(
        edges, "src", "dst", iterations=3, damping=0.85,
        persist_fn=_cache_scoped,
    )
    return pr.select(
        "node", dec4(F.col("rank") * 1000).alias("rank_x1000")
    ).orderBy("node")


# Q151 — X115: explicit Bloom-filter semi-join audit. n_bits is set
# LOW (2048) on purpose: at sf0.01 the filter produces a visible
# false-positive count, so the hash check pins the exact fp arithmetic
# (md5-replayable bit positions) rather than a vacuous all-true column;
# no_false_negatives must be TRUE — the Bloom guarantee itself.

def q151(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load_table(spark, sf_dir, "orders")
    c = load_table(spark, sf_dir, "customer")
    dim = c.filter(F.col("c_mktsegment") == "BUILDING").select("c_custkey")
    flags = skew.bloom_semi_flags(
        o.select("o_custkey"), dim, "o_custkey",
        dim_key_col="c_custkey", n_bits=2048, n_hashes=3,
    )
    exact = dim.select(F.col("c_custkey").alias("key"), F.lit(1).alias("__ex"))
    per_key = flags.join(exact, "key", "left").select(
        "key", "bloom_pass", F.col("__ex").isNotNull().alias("exact_in")
    )
    return (
        o.join(per_key, o.o_custkey == per_key.key)
        .groupBy("o_orderpriority")
        .agg(
            F.count("*").cast("bigint").alias("n_orders"),
            F.sum(F.when(F.col("bloom_pass"), 1).otherwise(0))
            .cast("bigint")
            .alias("bloom_pass_orders"),
            F.sum(F.when(F.col("exact_in"), 1).otherwise(0))
            .cast("bigint")
            .alias("exact_orders"),
            F.sum(
                F.when(F.col("bloom_pass") & ~F.col("exact_in"), 1).otherwise(0)
            )
            .cast("bigint")
            .alias("false_positive_orders"),
            (
                F.sum(
                    F.when(F.col("exact_in") & ~F.col("bloom_pass"), 1).otherwise(0)
                )
                == 0
            ).alias("no_false_negatives"),
        )
        .orderBy("o_orderpriority")
    )


# Q152 — X116: 2-D Pareto skyline on part (minimize size, maximize
# retail price). Oracle = the textbook NOT EXISTS dominance scan —
# quadratic in |distinct sizes|, which is exactly what the operator's
# contraction+running-max avoids.

def q152(spark: SparkSession, sf_dir: str) -> DataFrame:
    p = load_table(spark, sf_dir, "part")
    return (
        stats.pareto_frontier(p, "p_size", "p_retailprice")
        .select(
            F.col("x").alias("p_size"),
            dec4("y").alias("best_price"),
            "n_points",
        )
        .orderBy("p_size")
    )


# Q153 — X117: pairwise association rules over per-order brand baskets.
# Counts stay integers end-to-end; every ratio is one exact-int
# division (correctly rounded identically in both engines), so dec4 is
# deterministic with no FP-accumulation caveat.

def q153(spark: SparkSession, sf_dir: str) -> DataFrame:
    l = load_table(spark, sf_dir, "lineitem")
    p = load_table(spark, sf_dir, "part")
    bi = l.join(p, l.l_partkey == p.p_partkey).select(
        F.col("l_orderkey").alias("okey"), F.col("p_brand").alias("brand")
    )
    r = stats.association_rules(
        bi, "okey", "brand", min_pair_support=5, persist_fn=_cache_scoped
    )
    return r.select(
        "item_a",
        "item_b",
        "pair_n",
        dec4("support").alias("support"),
        dec4("conf_a_to_b").alias("conf_a_to_b"),
        dec4("conf_b_to_a").alias("conf_b_to_a"),
        dec4("lift").alias("lift"),
    ).orderBy("item_a", "item_b")


# Q154 — X118: CUPED variance reduction on the events stream, variant
# = user_id % 2, pre-period before Jan 15. theta / means / variances
# use the stable CentralMomentAgg forms on BOTH sides (the X76 lesson).

def q154(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = load_table(spark, sf_dir, "events")
    r = stats.cuped_adjust(
        e, split_ts="2024-01-15 00:00:00", n_variants=2
    )
    return r.select(
        "variant",
        "n_users",
        dec4("mean_post").alias("mean_post"),
        dec4("mean_adjusted").alias("mean_adjusted"),
        dec4("var_post").alias("var_post"),
        dec4("var_adjusted").alias("var_adjusted"),
        dec4("var_reduction").alias("var_reduction"),
    ).orderBy("variant")


# Q155 — X119: last-touch conversion attribution (touches = view/
# click, conversion = purchase, 3-day window). Both engines run the
# SAME union-and-carry window — the oracle's LAST_VALUE IGNORE NULLS
# over (ts, is_conv, id) is the textbook form the operator mirrors;
# the window test is integer microseconds (q146 convention).

def q155(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = load_table(spark, sf_dir, "events")
    return ev_ops.attribute_conversions(
        e,
        touch_types=["view", "click"],
        conversion_type="purchase",
        window_seconds=3 * 86400,
    ).orderBy("touch_type")


# Q156 — X120: Fellegi-Sunter match weights over (segment, nation)
# blocks; fields = acctbal-thousands bucket + name 2-char suffix
# (right(), the substr-negative-start gotcha). u-probabilities are
# data-estimated sum((n_v/N)^2); teleports written (1.0 - 0.9) on both
# sides so the engines share the binary double. Result = the weight
# distribution per agreement count (min/max pin both one-field
# patterns).

def q156(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = load_table(spark, sf_dir, "customer")
    scored = dedup.fs_match_weights(
        c,
        "c_custkey",
        block_exprs=[F.col("c_mktsegment"), F.col("c_nationkey")],
        field_exprs=[
            ("bal", F.floor(F.col("c_acctbal") / 1000).cast("long")),
            ("sfx", F.expr("right(c_name, 2)")),
        ],
        m_probs=[0.9, 0.9],
    )
    return (
        scored.groupBy("n_agree")
        .agg(
            F.count("*").cast("bigint").alias("n_pairs"),
            dec4(F.min("weight")).alias("min_weight"),
            dec4(F.max("weight")).alias("max_weight"),
        )
        .orderBy("n_agree")
    )


# Q157 — X121: mergeable binned-quantile sketch vs the X100 exact
# lower quantile (weight 1). The within-bin booleans are provable-TRUE
# (the ranked value lives inside the picked bin) — the q148 bound-
# validation convention, with the oracle computing BOTH sides in
# exact integer arithmetic.

def q157(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = load_table(spark, sf_dir, "events").withColumn("__one", F.lit(1.0))
    sk = stats.binned_quantile_sketch(
        e, ["event_type"], "value", bin_width=25.0,
        quantiles=((1, 2), (19, 20)),
    )
    ex = stats.weighted_quantile(
        e, ["event_type"], "value", "__one",
        quantiles=((1, 2), (19, 20)), persist_fn=_cache_scoped,
    )
    j = sk.join(ex, "event_type")
    return j.select(
        "event_type",
        dec4("bq_1_2").alias("est_p50"),
        dec4("wq_1_2").alias("exact_p50"),
        (
            (F.col("wq_1_2") >= F.col("bq_1_2"))
            & (F.col("wq_1_2") < F.col("bq_1_2") + 25.0)
        ).alias("p50_within_bin"),
        dec4("bq_19_20").alias("est_p95"),
        dec4("wq_19_20").alias("exact_p95"),
        (
            (F.col("wq_19_20") >= F.col("bq_19_20"))
            & (F.col("wq_19_20") < F.col("bq_19_20") + 25.0)
        ).alias("p95_within_bin"),
    ).orderBy("event_type")


# Q158 — X122: exact triangle census on a deterministic band-limited
# md5 graph over customer keys (b in a+1..a+30, kept when the
# md5-replayable pair hash % 4 == 0 — density is SF-independent so the
# census is non-degenerate at every scale). Oracle = the canonical
# a<b<c three-way self-join the orientation trick avoids.

def q158(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = load_table(spark, sf_dir, "customer")
    a = c.select(F.col("c_custkey").alias("a"))
    cand = a.select(
        "a", F.explode(F.sequence(F.col("a") + 1, F.col("a") + 30)).alias("b")
    )
    nodes = c.select(F.col("c_custkey").alias("b"))
    edges = (
        cand.join(nodes, "b")
        .filter(
            F.pmod(
                md5_long60(
                    F.concat_ws(
                        "#", F.col("a").cast("string"), F.col("b").cast("string")
                    )
                ),
                F.lit(4),
            )
            == 0
        )
        .select(F.col("a").alias("src"), F.col("b").alias("dst"))
    )
    # assume_canonical: each (a, b) pair is generated exactly once
    # (customer keys are unique, b ranges over a+1..a+30, the kept-pair
    # hash is a function of (a, b)) with src < dst by construction, so
    # the operator's canonicalizing distinct would shuffle an
    # already-unique frame (round 14, guide §2.4).
    return graph.triangle_stats(
        edges, "src", "dst", persist_fn=_cache_scoped, assume_canonical=True
    )


# Q159 — X124: mutual information between event type and the value
# centile-bucket. Every log2 argument is a ratio of exact integer
# products (the q153 rule), so both engines see identical doubles.

def q159(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = load_table(spark, sf_dir, "events").withColumn(
        "__y", F.floor(F.col("value") / 100).cast("long")
    )
    r = stats.mutual_information(e, "event_type", "__y", persist_fn=_cache_scoped)
    return r.select(
        "n",
        dec4("mi_bits").alias("mi_bits"),
        dec4("h_x").alias("h_x"),
        dec4("h_y").alias("h_y"),
    )


# Q160 — X125: calibration (reliability) bins for score = value/500
# vs the purchase label. sum_score, not mean (the dec4 AVG gotcha);
# frac_positive is an exact int/int division.

def q160(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = load_table(spark, sf_dir, "events").select(
        (F.col("value") / 500.0).alias("score"),
        (F.col("event_type") == "purchase").alias("label"),
    )
    return (
        stats.calibration_bins(e, "score", "label", n_bins=10)
        .select(
            "bin",
            "n",
            dec4("sum_score").alias("sum_score"),
            dec4("frac_positive").alias("frac_positive"),
        )
        .orderBy("bin")
    )


# Q161 — X126: exact per-cohort ROC AUC (does value separate
# purchases?) via Mann-Whitney with doubled midranks — integer
# arithmetic until the single final division.

def q161(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = load_table(spark, sf_dir, "events").select(
        F.pmod(F.col("user_id"), F.lit(3)).cast("int").alias("cohort"),
        "value",
        (F.col("event_type") == "purchase").alias("label"),
    )
    return (
        stats.grouped_auc(e, ["cohort"], "value", "label")
        .select("cohort", "n", "n_pos", dec4("auc").alias("auc"))
        .orderBy("cohort")
    )


# Q162 — X127: additive seasonal decomposition of the daily value
# series. Edge days where the centered 7-day window is partial emit
# NULL trend/seasonal/residual (the X107 edge-honesty convention —
# dec4(NULL) is NULL in both engines). day-of-week codes differ
# between engines (Spark 1-7, DuckDB 0-6) but are join-internal only.

def q162(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = load_table(spark, sf_dir, "events")
    r = ev_ops.seasonal_decompose_daily(e, "ts", "value", trend_window_days=7)
    return r.select(
        F.date_format("day", "yyyy-MM-dd").alias("day"),
        dec4("total").alias("total"),
        dec4("trend").alias("trend"),
        dec4("seasonal").alias("seasonal"),
        dec4("residual").alias("residual"),
    ).orderBy("day")


# Q163 — X128: first-order Markov transition matrix over per-user
# event sequences ((ts, id) total order); p_next is one exact-int
# division.

def q163(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = load_table(spark, sf_dir, "events")
    r = ev_ops.transition_matrix(e)
    return r.select(
        "a", "b", "n_ab", dec4("p_next").alias("p_next")
    ).orderBy("a", "b")


# Q164 — X129: retrospective CUSUM level-shift scan on the daily mean
# series; the peak flag combines the per-engine argmax (internal
# comparison, FP-safe) with the Brownian-bridge threshold.

def q164(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = load_table(spark, sf_dir, "events")
    r = ev_ops.cusum_changepoints(e, "ts", "value", threshold_sigmas=4.0)
    return r.select(
        F.date_format("day", "yyyy-MM-dd").alias("day"),
        dec4("m").alias("day_mean"),
        dec4("cusum").alias("cusum"),
        "is_peak",
    ).orderBy("day")


# Q165 — X130: k-core peeling (k=13, 3 rounds) on the q158 band-md5
# graph — non-degenerate at every SF (survivors 2/182/2087 at
# sf0.001/0.01/0.1). Oracle = the three peels unrolled (the X114
# fixed-iteration lesson).

def q165(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = load_table(spark, sf_dir, "customer")
    a = c.select(F.col("c_custkey").alias("a"))
    cand = a.select(
        "a", F.explode(F.sequence(F.col("a") + 1, F.col("a") + 30)).alias("b")
    )
    nodes = c.select(F.col("c_custkey").alias("b"))
    edges = (
        cand.join(nodes, "b")
        .filter(
            F.pmod(
                md5_long60(
                    F.concat_ws(
                        "#", F.col("a").cast("string"), F.col("b").cast("string")
                    )
                ),
                F.lit(4),
            )
            == 0
        )
        .select(F.col("a").alias("src"), F.col("b").alias("dst"))
    )
    return graph.kcore_peel(edges, "src", "dst", k=13, rounds=3).orderBy("node")


# Q166 — GROUPING SETS with explicit GROUPING() flags (completing the
# multi-dimensional agg surface next to q124's CUBE; X-less API
# coverage, the q124 precedent). Keys coalesce to '(all)' so neither
# engine's NULL sort order matters.

def q166(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load_table(spark, sf_dir, "orders")
    o.createOrReplaceTempView("q166_orders")
    return spark.sql(
        """
        SELECT COALESCE(o_orderpriority, '(all)') AS priority,
               COALESCE(o_orderstatus, '(all)') AS status,
               CAST(GROUPING(o_orderpriority) AS INT) AS g_priority,
               CAST(GROUPING(o_orderstatus) AS INT) AS g_status,
               CAST(COUNT(*) AS BIGINT) AS n,
               CAST(CAST(ROUND(SUM(o_totalprice), 4) AS DECIMAL(38,4)) AS STRING)
                 AS sum_price
        FROM q166_orders
        GROUP BY GROUPING SETS ((o_orderpriority), (o_orderstatus), ())
        ORDER BY g_priority, g_status, priority, status
        """
    )


# Q167 — X132: Theil-Sen robust trend of the daily total series.
# Lower-median selection (X100 convention) on both sides — no
# interpolation FP; every slope is one division of identical doubles.

def q167(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = load_table(spark, sf_dir, "events")
    r = ev_ops.theil_sen_trend(e)
    return r.select(
        "n_days", dec4("slope").alias("slope"), dec4("intercept").alias("intercept")
    )


# Q168 — X133: linear-interpolation grid resampling (6-hour ticks)
# rolled up per day — the q147 LOCF companion; same union-and-carry
# machinery run forward AND backward, mirrored literally in the
# oracle's two windows.

def q168(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = load_table(spark, sf_dir, "events")
    r = ev_ops.resample_linear(e, step_seconds=21600)
    return (
        r.select(
            F.date_format(F.timestamp_micros(F.col("tick_us")), "yyyy-MM-dd")
            .alias("day"),
            "value",
        )
        .groupBy("day")
        .agg(
            F.count("*").cast("bigint").alias("n_points"),
            dec4(F.sum("value")).alias("sum_value"),
        )
        .orderBy("day")
    )


# Q169 — X134: audio loudness/silence profile over the silence-padded
# synthetic WAV corpus; profiles are WRITTEN TO PARQUET first (the
# q103/q122/q123 signature-evidence convention) so DuckDB aggregates
# the same decoded stats; the decode itself is pinned by the X134
# pytest (hand-built WAV with known 100 ms pads).


def q169(spark: SparkSession, sf_dir: str) -> DataFrame:
    from .operators import multimodal

    media = multimodal.synthetic_padded_audio_corpus(spark, n=64)
    multimodal.audio_profile(media).write.mode("overwrite").parquet(
        _Q169_PROF_PATH
    )
    p = spark.read.parquet(_Q169_PROF_PATH)
    return (
        p.groupBy(F.pmod(F.col("media_id"), F.lit(5)).cast("int").alias("lead_group"))
        .agg(
            F.count("*").cast("bigint").alias("n"),
            F.sum("lead_silence_ms").cast("bigint").alias("sum_lead_ms"),
            F.sum("trail_silence_ms").cast("bigint").alias("sum_trail_ms"),
            dec4(F.sum("silence_fraction")).alias("sum_silence_frac"),
            dec4(F.sum("rms_db")).alias("sum_rms_db"),
        )
        .orderBy("lead_group")
    )


# Q170 — X135: TextRank keywords = the X114 PageRank run verbatim over
# the word co-occurrence graph (the cross-module composition). Top-20
# cut on the ROUNDED scaled rank with a word tiebreak so the cut is
# engine-deterministic; oracle = the q150 unrolled CTEs over the same
# edge set.

def q170(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load_table(spark, sf_dir, "documents")
    r = text.textrank_keywords(d, "text", iterations=3, damping=0.85)
    return (
        r.select("word", F.round(F.col("rank") * 1000, 4).alias("__rr"))
        .orderBy(F.col("__rr").desc(), F.col("word"))
        .limit(20)
        .select("word", dec4(F.col("__rr")).alias("rank_x1000"))
    )


# Q171 — X136: exact-quota stratified split by language — per-stratum
# EXACT ceil-quota counts (vs q48's binomial hash buckets), md5 rank
# order replayed by the oracle's ROW_NUMBER.

def q171(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load_table(spark, sf_dir, "documents")
    s = text.stratified_quota_split(d, "lang", "doc_id", 0.8, 0.1)
    return (
        s.groupBy("stratum", "split")
        .agg(F.count("*").cast("bigint").alias("n_docs"))
        .orderBy("stratum", "split")
    )


# Q172 — X137: pairwise distinct-user intersection between event
# types from HLL sketches (inclusion-exclusion) validated against the
# exact overlap join — the q148 convention (sketches are exact far
# below 2^14 capacity at these SFs, so the booleans pin the full
# arithmetic, not a loose bound).

def q172(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = load_table(spark, sf_dir, "events")
    est = stats.sketch_intersection(
        e, "event_type", "user_id", lg_config_k=14, persist_fn=_cache_scoped
    )
    ua = e.select(F.col("event_type").alias("t"), "user_id").distinct()
    ea = ua.select(F.col("t").alias("g_a"), "user_id")
    eb = ua.select(F.col("t").alias("g_b"), "user_id")
    exact = (
        ea.join(eb, "user_id")
        .filter(F.col("g_a") < F.col("g_b"))
        .groupBy("g_a", "g_b")
        .agg(F.count("*").cast("bigint").alias("exact_overlap"))
    )
    return (
        est.join(exact, ["g_a", "g_b"])
        .select(
            "g_a",
            "g_b",
            "exact_overlap",
            (
                F.abs(F.col("est_intersection") - F.col("exact_overlap"))
                <= F.greatest(0.05 * F.col("est_union"), F.lit(2.0))
            ).alias("within_bound"),
        )
        .orderBy("g_a", "g_b")
    )


# Q173 — X138: incremental aggregate maintenance — the pre-Jan-15
# materialized (n, sum, min, max) state merged with the post-Jan-15
# batch partial must be VALUE-IDENTICAL to the oracle's full
# recompute; the hash match IS the IVM correctness proof.

def q173(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = load_table(spark, sf_dir, "events")
    split = F.lit("2024-01-15 00:00:00").cast("timestamp")
    hist = registry.partial_agg(
        e.filter(F.col("ts") < split), ["event_type"], "value"
    )
    newb = registry.partial_agg(
        e.filter(F.col("ts") >= split), ["event_type"], "value"
    )
    merged = registry.merge_agg_state(hist, newb, ["event_type"])
    return merged.select(
        "event_type",
        "n",
        dec4("sum").alias("sum_value"),
        dec4("min").alias("min_value"),
        dec4("max").alias("max_value"),
    ).orderBy("event_type")


# Q174 — X140: Benjamini-Hochberg step-up over a deterministic
# md5-uniform p-value family with planted signal (every 50th test's p
# divided by 1e6) — the md5-fixture precedent (q158/q165); the
# step-up's "reject on the strength of tests below you" behavior is
# exactly what the fixture exercises (uniform tests just above the
# planted block also reject).

def q174(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = load_table(spark, sf_dir, "customer")
    base_p = md5_long60(F.col("c_custkey").cast("string")) / F.lit(
        float(1 << 60)
    )
    tests = c.select(
        F.col("c_custkey").alias("test_id"),
        F.when(
            F.pmod(F.col("c_custkey"), F.lit(50)) == 0, base_p / 1e6
        )
        .otherwise(base_p)
        .alias("p"),
    )
    r = stats.bh_fdr(tests, "test_id", "p", fdr_q=0.1)
    return (
        r.filter(F.col("rejected"))
        .select(
            F.col("test").alias("test_id"),
            "rank",
            dec4(F.col("p") * 1000).alias("p_x1000"),
        )
        .orderBy("rank")
    )


# Q175 — X141: funnel-timing quantiles per transition edge — exact
# integer-microsecond p50/p90 latency per (prev, next) event-type
# pair; quantile values are exact integers both engines agree on (the
# X100 lower-quantile convention over the q146 microsecond rule).

def q175(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = load_table(spark, sf_dir, "events")
    return (
        ev_ops.transition_latency_quantiles(
            e, quantiles=((1, 2), (9, 10)), persist_fn=_cache_scoped
        )
        .select(
            "pair",
            "n_transitions",
            F.col("lat_us_p1_2").alias("p50_lat_us"),
            F.col("lat_us_p9_10").alias("p90_lat_us"),
        )
        .orderBy("pair")
    )


# Q176 — UNPIVOT/melt surface coverage (the q166 precedent: API
# surface, X-less): the per-priority order-status counts pivoted wide
# then melted back long — DataFrame.unpivot on the Spark side, UNPIVOT
# on the DuckDB side.

def q176(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load_table(spark, sf_dir, "orders")
    wide = (
        o.groupBy("o_orderpriority")
        .pivot("o_orderstatus", ["F", "O", "P"])
        .count()
        .na.fill(0)
    )
    return (
        wide.unpivot(
            "o_orderpriority",
            ["F", "O", "P"],
            "status",
            "n_orders",
        )
        .select(
            "o_orderpriority",
            "status",
            F.col("n_orders").cast("bigint").alias("n_orders"),
        )
        .orderBy("o_orderpriority", "status")
    )


# Q177 — X143: join-cardinality estimate for customer x orders on
# custkey from count-min sketches (AMS inner product) vs the exact
# join count; no-underestimate is structural, the upper bound uses
# 3x the textbook N_L*N_R/w expected excess (measured: 1.000x exact
# at sf0.001, 1.017x at sf0.01, 1.23x at sf0.1 vs bound 1.46x).

def q177(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = load_table(spark, sf_dir, "customer").select(
        F.col("c_custkey").alias("k")
    )
    o = load_table(spark, sf_dir, "orders").select(
        F.col("o_custkey").alias("k")
    )
    est = stats.cms_join_size(c, o, "k", "k", d=4, w=65536)
    exact = c.join(o, "k").agg(F.count("*").cast("bigint").alias("exact"))
    nl = c.agg(F.count("*").alias("__nl"))
    nr = o.agg(F.count("*").alias("__nr"))
    return (
        est.crossJoin(exact)
        .crossJoin(nl)
        .crossJoin(nr)
        .select(
            "est_join_size",
            F.col("exact").alias("exact_join_size"),
            (F.col("est_join_size") >= F.col("exact")).alias("no_underestimate"),
            (
                F.col("est_join_size")
                <= F.col("exact")
                + 3.0 * F.col("__nl") * F.col("__nr") / 65536.0
            ).alias("within_bound"),
        )
    )


# Q178 — X144: top-15 in-session 3-step event-type paths (30-minute
# sessions); exact integer counts, path-string tiebreak on the cut.

def q178(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = load_table(spark, sf_dir, "events")
    return ev_ops.top_session_paths(
        e, gap="30 MINUTES", path_len=3, top_k=15
    )


# Q179 — X145: modified-z-score outlier labeling of daily means per
# event type (Iglewicz-Hoaglin 3.5 cutoff) — composes X106's
# dec4-rounded (median, MAD), which the oracle replays literally.

def q179(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = load_table(spark, sf_dir, "events")
    r = stats.robust_outlier_days(
        e, "event_type", "ts", "value", threshold=3.5,
        persist_fn=_cache_scoped,
    )
    return r.select(
        "event_type",
        F.date_format("day", "yyyy-MM-dd").alias("day"),
        dec4("day_sum").alias("day_sum"),
        dec4("m_score").alias("m_score"),
        "is_outlier",
    ).orderBy("event_type", "day")


# Q180 — X146: c-TF-IDF characteristic terms per source (top-5); the
# cut is on the ROUNDED x10k score with a term tiebreak (q170 rule).

def q180(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load_table(spark, sf_dir, "documents")
    r = text.ctfidf_class_terms(
        d, "source", "text", top_k=5, persist_fn=_cache_scoped
    )
    return r.select(
        "source",
        "term",
        "rank",
        dec4("score_x10k").alias("score_x10k"),
    ).orderBy("source", "rank")


# Q181 — X148: reciprocal-rank fusion of two deterministic per-brand
# part rankings (price-desc and size-asc); fused top-3 per brand, cut
# on the rounded score with an item tiebreak (q170 rule).

def q181(spark: SparkSession, sf_dir: str) -> DataFrame:
    p = load_table(spark, sf_dir, "part")
    w1 = Window.partitionBy("p_brand").orderBy(
        F.col("p_retailprice").desc(), F.col("p_partkey")
    )
    w2 = Window.partitionBy("p_brand").orderBy(
        F.col("p_size").asc(), F.col("p_partkey")
    )
    r1 = p.select(
        F.col("p_brand").alias("group"),
        F.col("p_partkey").alias("item"),
        F.row_number().over(w1).alias("rnk"),
    ).filter(F.col("rnk") <= 10)
    r2 = p.select(
        F.col("p_brand").alias("group"),
        F.col("p_partkey").alias("item"),
        F.row_number().over(w2).alias("rnk"),
    ).filter(F.col("rnk") <= 10)
    fused = similarity.rrf_fuse([r1, r2], k=60, group_col="group", item_col="item")
    w3 = Window.partitionBy("group").orderBy(
        F.round(F.col("rrf_score") * 10000, 4).desc(), F.col("item")
    )
    return (
        fused.withColumn("rank", F.row_number().over(w3))
        .filter(F.col("rank") <= 3)
        .select(
            F.col("group").alias("brand"),
            F.col("item").alias("partkey"),
            "rank",
            dec4(F.col("rrf_score") * 10000).alias("rrf_x10k"),
            "n_systems",
        )
        .orderBy("brand", "rank")
    )


# Q182 — X149: dominant eigenpair of the embedding correlation matrix
# by ten unrolled power-method steps on BOTH sides — the matrix
# entries are X103's dec4-ROUNDED correlations, which snaps the two
# engines onto the same matrix before iteration starts (the q140
# rounding made load-bearing).

def q182(spark: SparkSession, sf_dir: str) -> DataFrame:
    em = load_table(spark, sf_dir, "embeddings")
    r = similarity.corr_top_eigen(em, "embedding", iterations=10)
    return r.select(
        "dim_index",
        dec4(F.col("loading") * 1000).alias("loading_x1000"),
        dec4("eigenvalue").alias("eigenvalue"),
    ).orderBy("dim_index")


# Q183 — X150: quantile normalization of value across event types;
# the per-type sums of the normalized column pin the full mapping
# (every boundary is the cross-multiplied integer test on both sides).

def q183(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = load_table(spark, sf_dir, "events")
    r = stats.quantile_normalize(
        e, "event_type", "value", persist_fn=_cache_scoped
    )
    return (
        r.groupBy("event_type")
        .agg(
            F.sum("n").cast("bigint").alias("n_rows"),
            dec4(F.sum(F.col("normalized") * F.col("n"))).alias("sum_normalized"),
        )
        .orderBy("event_type")
    )


# Q184 — X151: dHash (gradient-hash) image near-dup pairs — the third
# member of the perceptual trio; signatures written to parquet first
# (the q103/q122 evidence convention), DuckDB replays the brute-force
# bit_count(xor) verify.


def q184(spark: SparkSession, sf_dir: str) -> DataFrame:
    from .operators import multimodal

    media = multimodal.synthetic_image_corpus(spark, n=96)
    multimodal.image_dhash(media).write.mode("overwrite").parquet(
        _Q184_SIGS_PATH
    )
    s = spark.read.parquet(_Q184_SIGS_PATH)
    return multimodal.ahash_near_dup_pairs(
        s, max_hamming=6, sig_col="dhash"
    ).orderBy("id_a", "id_b")


# Q185 — language-ID confusion MATRIX (declared lang x detected lang),
# the off-diagonal detail q31's per-guess rollup collapses. X4
# composition (q166 X-less precedent); same md-free heuristic replay.

def q185(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load_table(spark, sf_dir, "documents")
    return (
        d.select("lang", text.language_id("text").alias("detected"))
        .groupBy("lang", "detected")
        .agg(F.count("*").cast("bigint").alias("n_docs"))
        .orderBy("lang", "detected")
    )


# Q186 — dataset card: the one-row corpus summary a dataset release
# ships with (docs, exact-dup rate, token total, language/source
# cardinalities, length quantiles) — pure composition of declared
# machinery (q166 X-less precedent), all counts exact integers, the
# quantiles X100's lower convention.

def q186(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load_table(spark, sf_dir, "documents")
    # shared with the composed release-gate pipeline
    # (tests/test_release_gate.py) — one copy of the card summary
    return text.dataset_card(d)


# Q187 — X153: partition-layout audit of a documents-by-language
# write plan (size = n_chars + 64B row overhead, 16 KB target files —
# sized so the small/skew flags are non-trivial at the test SFs).

def q187(spark: SparkSession, sf_dir: str) -> DataFrame:
    from .operators import bucketing

    d = load_table(spark, sf_dir, "documents")
    return (
        bucketing.partition_layout_audit(
            d,
            ["lang"],
            F.col("n_chars") + F.lit(64),
            target_file_bytes=16 * 1024,
        )
        .orderBy("lang")
    )


# Q188 — X154: Spearman rank correlation between document length in
# chars and in tokens, per language — tie-correct midranks from
# integer cumulative counts, one stable corr agg per side.

def q188(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load_table(spark, sf_dir, "documents").select(
        "lang",
        F.col("n_chars").cast("double").alias("nc"),
        F.size(F.split("text", " ")).cast("double").alias("nt"),
    )
    return (
        stats.spearman_corr(d, "lang", "nc", "nt")
        .select("lang", "n", dec4("rho").alias("rho"))
        .orderBy("lang")
    )


# Q189-Q193 — X155-X159: the round-9 streaming maintainers in a
# driver-oracle-able form (staged round 10 in queries_staging.py with
# per-run oracle tests, declared round 11 per VERDICT r10 task 2). Each
# folds its maintainer over a deterministic two-epoch split of a
# synthetic table — the epochs partition the table, so the maintained
# state must equal the batch operator over the whole table, which has
# plain-SQL semantics DuckDB can replay. The split key is an
# integer-modulus on the row key, so the driver's plain session
# reproduces it bit-for-bit. Sketch-valued outputs (q192/q193 NDV)
# follow the q121/X84 evidence pattern: exact distinct count + a
# boolean pinning the estimate inside its published error bound.

def q189(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X155 — the q174 BH-FDR test family delivered in two epochs
    (c_custkey parity); verdicts over the maintained state must equal
    batch bh_fdr over the full family (q174's oracle verbatim)."""
    from .streaming.pipeline import make_bh_fdr_maintainer

    c = load_table(spark, sf_dir, "customer")
    base_p = md5_long60(F.col("c_custkey").cast("string")) / F.lit(
        float(1 << 60)
    )
    tests = c.select(
        F.col("c_custkey").alias("test_id"),
        F.when(F.pmod(F.col("c_custkey"), F.lit(50)) == 0, base_p / 1e6)
        .otherwise(base_p)
        .alias("p"),
    )
    maintain, verdicts = make_bh_fdr_maintainer("test_id", "p", fdr_q=0.1)
    state = None
    for epoch in (0, 1):
        batch = tests.filter(F.pmod(F.col("test_id"), 2) == epoch)
        state = maintain(state, batch, epoch_id=epoch)
    return (
        verdicts(state)
        .filter(F.col("rejected"))
        .select(
            F.col("test").alias("test_id"),
            "rank",
            dec4(F.col("p") * 1000).alias("p_x1000"),
        )
        .orderBy("rank")
    )


def q190(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X156 — the q106 weighted sample maintained over two document
    epochs (doc_id parity); the A-ES key determinism makes the folded
    reservoir equal the batch sample over the union exactly."""
    from .streaming.pipeline import make_weighted_reservoir_maintainer

    d = load_table(spark, sf_dir, "documents")
    maintain, sample = make_weighted_reservoir_maintainer(
        "n_chars", k=10, strata_cols=("lang",), id_col="doc_id"
    )
    state = None
    for epoch in (0, 1):
        state = maintain(state, d.filter(F.pmod(F.col("doc_id"), 2) == epoch))
    return (
        sample(state)
        .select("lang", "doc_id", "n_chars", "rank")
        .orderBy("lang", "rank")
    )


def q191(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X157 — q94's three ADDITIVE row-local rules (the cross-row
    PK/FK rules are out of the streaming contract by the operator's
    fence) maintained over two lineitem epochs (l_orderkey parity);
    counters merge by addition, so totals equal the batch scan."""
    from .streaming.pipeline import make_rule_audit_maintainer

    li = load_table(spark, sf_dir, "lineitem")
    maintain = make_rule_audit_maintainer(
        {
            "l_quantity_in_1_45": (F.col("l_quantity") < 1)
            | (F.col("l_quantity") > 45),
            "l_discount_le_008": F.col("l_discount") > 0.08,
            "extendedprice_positive": F.col("l_extendedprice") <= 0,
        }
    )
    state = None
    for epoch in (0, 1):
        state = maintain(
            state, li.filter(F.pmod(F.col("l_orderkey"), 2) == epoch)
        )
    return state.select(
        "rule",
        "n_checked",
        "n_violations",
        dec4(F.col("n_violations").cast("double") / F.col("n_checked")).alias(
            "violation_rate"
        ),
    ).orderBy("rule")


def q192(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X158 — per-event-type distinct users maintained over two event
    epochs (user_id parity); HLL registers merge by MAX so the merged
    sketch equals the sketch of the union. Evidence follows q121:
    exact NDV + in-bound boolean (HLL lgK=12 standard error ~1.6%,
    bound at 6%)."""
    from .streaming.pipeline import make_hll_distinct_maintainer

    e = load_table(spark, sf_dir, "events")
    maintain, estimates = make_hll_distinct_maintainer("event_type", "user_id")
    state = None
    for epoch in (0, 1):
        state = maintain(state, e.filter(F.pmod(F.col("user_id"), 2) == epoch))
    exact = e.groupBy(F.col("event_type").alias("key")).agg(
        F.countDistinct("user_id").cast("bigint").alias("exact_ndv")
    )
    return (
        estimates(state)
        .join(exact, "key")
        .select(
            "key",
            "exact_ndv",
            (
                F.abs(F.col("estimate") - F.col("exact_ndv"))
                <= 0.06 * F.col("exact_ndv")
            ).alias("ndv_within_bound"),
        )
        .orderBy("key")
    )


def q193(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X159 — the q107 column profile maintained over two orders
    epochs (o_orderkey parity). n_rows/n_null/min/max are exactly
    mergeable and oracle-compared directly; n_distinct is HLL-valued,
    so it rides the q121 evidence pattern (exact + bound boolean)."""
    from .streaming.pipeline import make_profile_maintainer

    o = load_table(spark, sf_dir, "orders")
    cols = ["o_orderkey", "o_custkey", "o_orderstatus", "o_orderpriority"]
    maintain, profile = make_profile_maintainer(cols)
    state = None
    for epoch in (0, 1):
        state = maintain(
            state, o.filter(F.pmod(F.col("o_orderkey"), 2) == epoch)
        )
    pairs = o.select(
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
    exact = pairs.groupBy("column").agg(
        F.countDistinct("val").cast("bigint").alias("exact_ndv")
    )
    return (
        profile(state)
        .join(exact, "column")
        .select(
            "column",
            "n_rows",
            "n_null",
            "exact_ndv",
            (
                F.abs(F.col("n_distinct") - F.col("exact_ndv"))
                <= 0.06 * F.col("exact_ndv")
            ).alias("ndv_within_bound"),
            "min_val",
            "max_val",
        )
        .orderBy("column")
    )


# Q194 — X160: the raw-corpus ingest edge, oracle-checkable end to end
# (declared round 12 from queries_staging). The builder round-trips the
# documents table through the REAL ingest path: JSON-encode each row to
# newline-delimited text shards with a deterministically corrupted
# subset (doc_id % 37 == 0: closing brace truncated, malformed JSON),
# then run io.ingest_documents (explicit-schema PERMISSIVE read,
# corrupt-line quarantine, digest/n_chars canonicalization, compacted
# parquet landing) and report, per landing status, the row count plus
# content fingerprints read back OFF THE LANDED PARQUET (bit_xor of the
# 60-bit digest prefix — order-insensitive, overflow-free — plus the
# recomputed n_chars sum). The oracle replays from the ORIGINAL
# documents view, so the hash match proves the full round trip is
# lossless on clean rows and quarantines exactly the corrupted ones.
def q194(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X160 — the ingest edge: every step is the production path (text
    shards the shape a real corpus delivery has, the explicit-schema
    PERMISSIVE reader, the compacted landing writer)."""
    d = load_table(spark, sf_dir, "documents").select(
        "doc_id", "text", "lang", "source", "n_chars"
    )
    line = F.to_json(F.struct("doc_id", "text", "lang", "source", "n_chars"))
    shards = d.withColumn("__line", line).select(
        F.when(
            F.pmod("doc_id", F.lit(37)) == 0,
            F.expr("substring(__line, 1, length(__line) - 1)"),
        )
        .otherwise(F.col("__line"))
        .alias("value")
    )
    shards.write.mode("overwrite").text(_Q194_SRC)
    ingest_documents(spark, _Q194_SRC, _Q194_DEST, fmt="jsonl")

    landed = spark.read.parquet(_Q194_DEST)
    clean_row = landed.agg(
        F.count("*").cast("bigint").alias("n_rows"),
        F.expr(
            "bit_xor(cast(conv(substring(digest, 1, 15), 16, 10) as bigint))"
        )
        .cast("bigint")
        .alias("digest_xor"),
        F.sum("n_chars").cast("bigint").alias("n_chars_sum"),
    ).select(
        F.lit("landed").alias("status"), "n_rows", "digest_xor", "n_chars_sum"
    )
    quar_row = (
        spark.read.parquet(_Q194_DEST + "_quarantine")
        .agg(F.count("*").cast("bigint").alias("n_rows"))
        .select(
            F.lit("quarantined").alias("status"),
            "n_rows",
            F.lit(None).cast("bigint").alias("digest_xor"),
            F.lit(None).cast("bigint").alias("n_chars_sum"),
        )
    )
    return clean_row.unionByName(quar_row).orderBy("status")


# Q195 — X162/X163: URL canonicalization + per-domain curation rollup
# (declared round 12 from queries_staging) over a deterministic
# messy-URL synthesis (documents has no URL column, so the query builds
# one per doc from doc_id/source with every normalization hazard:
# mixed case, userinfo, default and non-default ports, empty paths,
# tracking params in shuffled positions, fragments, a malformed class).
# The oracle derives the EXPECTED canonical form from the same
# components from first principles — it never reimplements the parser.
def q195(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X162/X163 — canonicalize/rollup; hash match proves the
    canonicalizer strips/sorts/defaults exactly right, including the
    variant collisions n_canonical counts."""
    did = F.col("doc_id")
    s = did.cast("string")
    scheme = F.when(did % 3 == 1, F.lit("HTTP")).otherwise(F.lit("https"))
    host = F.concat(
        F.when(did % 2 == 0, F.lit("WWW.")).otherwise(F.lit("")),
        F.col("source"),
        F.lit(".Ex"),
        (did % 4).cast("string"),
        F.lit(".COM"),
    )
    userinfo = F.when(did % 9 == 0, F.lit("u:pw@")).otherwise(F.lit(""))
    port = (
        F.when(did % 5 == 0, F.lit(":443"))
        .when(did % 5 == 1, F.lit(":80"))
        .when(did % 5 == 2, F.lit(":8080"))
        .otherwise(F.lit(""))
    )
    path = F.when(did % 7 == 0, F.lit("")).otherwise(
        F.concat(F.lit("/p/"), (did % 11).cast("string"))
    )
    q = (
        F.when(
            did % 6 == 0,
            F.concat(F.lit("?utm_source=news&b="), (did % 13).cast("string"),
                     F.lit("&a=1")),
        )
        .when(did % 6 == 1,
              F.concat(F.lit("?a=1&b="), (did % 13).cast("string")))
        .when(did % 6 == 2, F.concat(F.lit("?gclid="), s))
        .when(did % 6 == 4,
              F.concat(F.lit("?z="), (did % 3).cast("string"),
                       F.lit("&utm_medium=email")))
        .when(did % 6 == 5, F.lit("?ref=home"))
        .otherwise(F.lit(""))
    )
    frag = F.when(did % 8 == 0, F.lit("#frag")).otherwise(F.lit(""))
    url = F.when(did % 17 == 0, F.concat(F.lit("junk "), s)).otherwise(
        F.concat(scheme, F.lit("://"), userinfo, host, port, path, q, frag)
    )
    urls = load_table(spark, sf_dir, "documents").select(url.alias("url"))
    return text.domain_curation_stats(
        urls, "url", quota=100, with_sample=True
    ).orderBy("domain")


# Q196 — X164: HTML->text extraction, oracle-checkable (declared round
# 12 from queries_staging): documents has no markup column, so the
# query wraps each doc's text in a deterministic markup synthesis
# exercising every stripper stage (script/style blocks with nested fake
# tags, comments, attribute tags, all six entities incl. the &amp;-last
# double-decode hazard), extracts with the X164 chain, and reports
# per-bucket counts, raw/extracted length sums, and an
# order-insensitive content fingerprint (bit_xor of the md5-prefix of
# each EXTRACTED text — the q194 convention), so the hash match proves
# per-document equality of the extraction, not just aggregate lengths.
# The oracle replays each regexp literally — the X164 patterns are
# RE2-compatible by design (no backreferences/lookaround), which is
# exactly the property this query turns into driver-grade evidence.
def q196(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X164 — HTML extraction fingerprints per synthesis bucket."""
    d = load_table(spark, sf_dir, "documents")
    did = F.col("doc_id")
    t = F.col("text")
    html = (
        F.when(did % 5 == 0, F.concat(
            F.lit("<script>var x = '<p>not text</p>';</script><P class='a'>"),
            t, F.lit("</p>")))
        .when(did % 5 == 1, F.concat(
            F.lit("<!-- note <b> -->"), t,
            F.lit("<br/><a href='/x?a=1&b=2'>more</a>")))
        .when(did % 5 == 2, F.concat(
            F.lit("<div><H2>T</h2> "), t, F.lit(" &amp;lt; tail &lt;ok&gt;")))
        .when(did % 5 == 3, F.concat(
            F.lit("<STYLE type='c'>.x{color:red}</style>"), t,
            F.lit("&nbsp;&quot;q&quot; &#39;s&#39;")))
        .otherwise(t)
    )
    return (
        d.select(
            (did % 5).cast("bigint").alias("bucket"),
            html.alias("__h"),
            text.html_to_text(html).alias("__x"),
        )
        .groupBy("bucket")
        .agg(
            F.count("*").cast("bigint").alias("n_docs"),
            F.sum(F.length("__h")).cast("bigint").alias("raw_len_sum"),
            F.sum(F.length("__x")).cast("bigint").alias("text_len_sum"),
            F.expr(
                "bit_xor(cast(conv(substring(md5(__x), 1, 15), 16, 10)"
                " as bigint))"
            ).cast("bigint").alias("text_digest_xor"),
        )
        .orderBy("bucket")
    )


# Q197 — X176: code-quality signals rolled up per source (declared
# round 13 from queries_staging): the full signal projection (line
# geometry, alphanumeric fraction, comment density, autogenerated
# marker, base64 blob, keep verdict) over the documents table, rolled
# up per source so the result is bounded — the oracle replays every
# signal with DuckDB list lambdas and the same regexps (all
# RE2-compatible by design). Counters are bigint char/line sums, so
# no float-rounding hazards ride the hash.
def q197(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X176 — code-quality signals rolled up per source."""
    d = load_table(spark, sf_dir, "documents").select("source", "text")
    s = text.code_quality_signals(d)
    return (
        s.groupBy("source")
        .agg(
            F.count("*").cast("bigint").alias("n_docs"),
            F.sum(F.col("code_keep").cast("bigint"))
            .cast("bigint")
            .alias("n_keep"),
            F.sum(F.col("has_autogen_marker").cast("bigint"))
            .cast("bigint")
            .alias("n_autogen"),
            F.sum(F.col("has_base64_blob").cast("bigint"))
            .cast("bigint")
            .alias("n_blob"),
            F.sum("n_lines").cast("bigint").alias("total_lines"),
            F.sum("max_line_len").cast("bigint").alias("sum_max_line"),
            F.sum(
                (F.col("comment_line_frac") > 0.5).cast("bigint")
            ).cast("bigint").alias("n_comment_heavy"),
        )
        .orderBy("source")
    )


# Q198 — X177: Unicode script profile (declared round 13 from
# queries_staging): per-(lang, dominant_script) document counts plus
# per-group script-letter char mass — the dominant-script argmax is
# replayed in SQL through the same struct-compare semantics (list_max
# over (n, script) pairs, ties to the lexicographically-last script
# name on equal mass, which both engines share).
def q198(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X177 — per-(lang, dominant_script) counts + script-letter mass."""
    d = load_table(spark, sf_dir, "documents").select("lang", "text")
    s = text.script_profile(d)
    return (
        s.groupBy("lang", "dominant_script")
        .agg(
            F.count("*").cast("bigint").alias("n_docs"),
            F.sum("script_letters").cast("bigint").alias("script_letters"),
        )
        .orderBy("lang", "dominant_script")
    )


# Declaration order is load-bearing: the driver's correctness snapshot hashes
# the FIRST 50 entries of this dict (CORRECTNESS_r{N}.json caps at 50).
#
# Round-13 rotation (VERDICT r12 task 1, per the forced schedule at README
# 'Verification coverage map'): q122-q164 (43, last driver-hashed r9 — the
# staleness guard's literal red list) + q194-q196 (3, declared r12 — their
# FIRST driver hash) + q165-q168 (4, oldest r10-hashed).  Every entry
# outside the window carries a driver hash from r10-r12 or is a round-13
# declaration (q197/q198, first window slot r14); the in-repo mirror
# (tests/test_queries_oracle.py) still runs ALL declared queries against
# the same DuckDB oracle every pytest run.
# History: r04-r05 window was q51-q67 + q01-q33; r06 was q34-q50 + q68-q72
# + q01-q28; r07 was q73-q102 + q29-q33 + q51-q65; r08 was q103-q114 +
# q66-q67 + q01-q28 + q34-q41; r09 was q122-q164 + others; r10 was
# q165-q188 + q42-q57/q68-q72/q29-q33; r11 was q58-q65 + q73-q114; r12 was
# q66-q67 + q01-q28 + q34-q41 + q189-q193 + q115-q121.  The window is
# pinned by tests/test_queries_oracle.py::test_driver_window_pinned and
# documented in README section "Verification coverage map".
QUERIES: dict[str, Callable[[SparkSession, str], DataFrame]] = {
    # --- round-15 driver window (positions 1-50): the round-11-hashed
    # block remainder (48, stale at r15, in its r11 window order) +
    # q66/q67 (oldest r12-hashed) — the VERDICT r14 task 6 rotation.
    "q60_ngram_novelty": q60,
    "q61_incremental_dedup": q61,
    "q62_boilerplate_strip": q62,
    "q63_memorization_risk": q63,
    "q64_cluster_profile": q64,
    "q65_cluster_balanced_sample": q65,
    "q73_cosine_neardup_lsh": q73,
    "q74_token_chunking": q74,
    "q75_unigram_logloss": q75,
    "q76_leakage_safe_split": q76,
    "q77_dsir_importance": q77,
    "q78_bigram_stats": q78,
    "q79_quality_classifier": q79,
    "q80_perplexity_gate": q80,
    "q81_winsorized_stats": q81,
    "q82_duplicated_spans": q82,
    "q83_bm25_topk": q83,
    "q84_source_js_divergence": q84,
    "q85_bpe_learn": q85,
    "q86_bpe_pair_stats": q86,
    "q87_split_leakage": q87,
    "q88_hard_negatives": q88,
    "q89_cms_heavy_hitters": q89,
    "q90_jl_projection_topk": q90,
    "q91_neyman_sampling": q91,
    "q92_ols_trend": q92,
    "q93_rolling_zscore": q93,
    "q94_constraint_audit": q94,
    "q95_scd2_history": q95,
    "q96_tfidf_cosine_join": q96,
    "q97_zorder_layout": q97,
    "q98_pq_sdc_topk": q98,
    "q99_ranking_metrics": q99,
    "q100_dp_histogram": q100,
    "q101_sequence_funnel": q101,
    "q102_cohort_retention": q102,
    "q103_image_ahash_pairs": q103,
    "q104_semantic_dedup": q104,
    "q105_entity_resolution": q105,
    "q106_weighted_sample": q106,
    "q107_column_profile": q107,
    "q108_source_concentration": q108,
    "q109_snapshot_diff": q109,
    "q110_psi_drift": q110,
    "q111_minhash_lsh": q111,
    "q112_entity_multi_pass": q112,
    "q113_normalized_dedup": q113,
    "q114_embedding_dim_stats": q114,
    # q66/q67 (r12-hashed) complete the 50-slot r15 window:
    "q66_top_duplicated_passages": q66,
    "q67_curation_funnel": q67,
    # --- tail positions 51+: ordered by the forced rotation schedule.
    # r16 window candidates first — the rest of the round-12 window
    # block (driver-hashed r12, stale at r16), in its r12 window order:
    "q01_json_projection": q01,
    "q02_registry_filter": q02,
    "q03_json_path_groupcount": q03,
    "q04_map_explode_fanout": q04,
    "q05_regex_host_extract": q05,
    "q06_semi_join_running": q06,
    "q07_anti_join_excluded": q07,
    "q08_ci_join_containment": q08,
    "q09_window_avg_zero_fill": q09,
    "q10_quorum_predicates": q10,
    "q11_capacity_sums": q11,
    "q12_last_snapshot": q12,
    "q13_distinct_first_name": q13,
    "q14_distribute_allocator": q14,
    "q15_suspension_carry_forward": q15,
    "q16_tumbling_idle": q16,
    "q17_cooldown_gate": q17,
    "q18_step_clamp": q18,
    "q19_epoch_roundtrip": q19,
    "q20_full_classifier": q20,
    "q21_exact_dedup": q21,
    "q22_minhash_near_dup": q22,
    "q23_cosine_topk": q23,
    "q24_token_stats": q24,
    "q25_sessionize": q25,
    "q26_simhash_clusters": q26,
    "q27_ngram_jaccard_pairs": q27,
    "q28_embedding_near_dup": q28,
    "q34_asof_join": q34,
    "q35_percentiles": q35,
    "q36_topk_per_segment": q36,
    "q37_multimodal_meta": q37,
    "q38_full_outer_calendar": q38,
    "q39_interval_join": q39,
    "q40_distinct_aggs": q40,
    "q41_range_window": q41,
    "q189_stream_bh_fdr": q189,
    "q190_stream_reservoir": q190,
    "q191_stream_rule_audit": q191,
    "q192_stream_hll_distinct": q192,
    "q193_stream_profile": q193,
    "q115_substring_search": q115,
    "q116_blocklist_filter": q116,
    "q117_pmi_cooccurrence": q117,
    "q118_containment_pairs": q118,
    "q119_robust_dim_stats": q119,
    "q120_mmr_select": q120,
    "q121_distinct_rollup": q121,
    # the round-13 window block (driver-hashed r13, stale at r17), in
    # its r13 window order:
    "q122_image_phash_pairs": q122,
    "q123_audio_fp_pairs": q123,
    "q124_cube_grouping": q124,
    "q125_decile_bands": q125,
    "q126_interval_join_binned": q126,
    "q127_overlap_join_binned": q127,
    "q128_purged_time_split": q128,
    "q129_zipf_fit": q129,
    "q130_k_anonymity": q130,
    "q131_ks_two_sample": q131,
    "q132_mahalanobis_outliers": q132,
    "q133_audience_overlap": q133,
    "q134_rank_sum_test": q134,
    "q135_chi2_independence": q135,
    "q136_shrunk_means": q136,
    "q137_weighted_quantile": q137,
    "q138_benford_audit": q138,
    "q139_welch_t_test": q139,
    "q140_dim_corr_matrix": q140,
    "q141_diversity_audit": q141,
    "q142_centroid_similarity": q142,
    "q143_grouped_mad": q143,
    "q144_time_weighted_avg": q144,
    "q145_label_noise_queue": q145,
    "q146_debounce_audit": q146,
    "q147_locf_resample": q147,
    "q148_sliding_active_users": q148,
    "q149_edit_distance_join": q149,
    "q150_pagerank": q150,
    "q151_bloom_semi_join": q151,
    "q152_pareto_frontier": q152,
    "q153_association_rules": q153,
    "q154_cuped": q154,
    "q155_attribution": q155,
    "q156_fs_match_weights": q156,
    "q157_quantile_sketch": q157,
    "q158_triangle_census": q158,
    "q159_mutual_information": q159,
    "q160_calibration_bins": q160,
    "q161_grouped_auc": q161,
    "q162_seasonal_decompose": q162,
    "q163_transition_matrix": q163,
    "q164_cusum_changepoint": q164,
    "q194_raw_ingest": q194,
    "q195_domain_curation": q195,
    "q196_html_extract": q196,
    "q165_kcore": q165,
    "q166_grouping_sets": q166,
    "q167_theil_sen": q167,
    "q168_linear_resample": q168,
    # freshest last — the round-14 window block (driver-hashed r14,
    # stale at r18), in its r14 window order:
    "q169_audio_profile": q169,
    "q170_textrank_keywords": q170,
    "q171_stratified_split": q171,
    "q172_sketch_intersection": q172,
    "q173_ivm_merge": q173,
    "q174_bh_fdr": q174,
    "q175_transition_latency": q175,
    "q176_unpivot_melt": q176,
    "q177_cms_join_size": q177,
    "q178_session_paths": q178,
    "q179_outlier_days": q179,
    "q180_ctfidf_terms": q180,
    "q181_rrf_fusion": q181,
    "q182_corr_top_eigen": q182,
    "q183_quantile_normalize": q183,
    "q184_image_dhash_pairs": q184,
    "q185_langid_confusion": q185,
    "q186_dataset_card": q186,
    "q187_partition_layout": q187,
    "q188_spearman_corr": q188,
    "q42_pandas_udf_vowels": q42,
    "q43_approx_sketches": q43,
    "q44_pivot_counts": q44,
    "q45_map_roundtrip": q45,
    "q46_revenue_join": q46,
    "q47_simhash_hamming": q47,
    "q48_train_test_split": q48,
    "q49_dedup_components": q49,
    "q50_tfidf_top_terms": q50,
    "q68_kmeans_quantizer": q68,
    "q69_vocab_coverage": q69,
    "q70_pq_topk": q70,
    "q71_pq_literal": q71,
    "q72_pq_code_dedup": q72,
    "q29_lsh_topk": q29,
    "q30_ivf_topk": q30,
    "q31_langid_quality": q31,
    "q32_fingerprint_tokens": q32,
    "q33_rollup_stats": q33,
    "q51_value_histogram": q51,
    "q52_pii_scrub": q52,
    "q53_quality_topk_per_lang": q53,
    "q54_token_packing": q54,
    "q55_repetition_filter": q55,
    "q56_mixing_weights": q56,
    "q57_lsh_multiprobe": q57,
    "q197_code_signals": q197,
    "q198_script_mix": q198,
    "q58_ivf_multiprobe": q58,
    "q59_contamination": q59,
}



# Keep the oracle iteration order identical to QUERIES (driver window order).
# SQL content lives in queries_sql.py (round-9 split, VERDICT r8 task 8);
# this module owns ordering. Queries genuinely outside SQL (q68's iterative
# k-means) are allowed to be oracle-less — the driver/mirror records a
# rows-only check for those.
_NO_ORACLE = {
    "q68_kmeans_quantizer",
    "q70_pq_topk",
    "q85_bpe_learn",
    "q120_mmr_select",  # iterative greedy selection (golden-pinned in-repo)
}
ORACLE = {name: _ORACLE_SQL[name] for name in QUERIES if name not in _NO_ORACLE}
assert set(ORACLE) == set(QUERIES) - _NO_ORACLE, "every query needs an oracle twin"
