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
from .io import load_table
from .operators import dedup, events as ev_ops, graph, metric_store as ms, registry, similarity, skew, stats, text
from .operators.scaling import IG_POLICY, cpu_load_classify, guard_rails, plan_action, allocate

# ---------------------------------------------------------------------------
# SQL fragments (oracle side)

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


def _dec4(x: str) -> str:
    # STRING on both sides: Spark stringifies decimals scale-padded
    # ("1.2340") but the driver's hasher renders DuckDB decimals
    # float-style ("1.234") — casting the decimal to VARCHAR in the
    # oracle produces the identical scale-padded bytes.
    return f"CAST(CAST(ROUND({x}, 4) AS DECIMAL(38,4)) AS VARCHAR)"


def _fmt(x: str) -> str:
    return f"strftime({x}, '%Y-%m-%d %H:%M:%S')"


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


Q01_SQL = f"""
SELECT event_id,
       COALESCE(CAST(json_extract_string(props, '$.k') AS BIGINT), 0) AS k_val,
       COALESCE(CAST(json_extract_string(props, '$.missing') AS DOUBLE), 0.0) AS missing_val,
       event_type,
       {_dec4('value')} AS value_dec
FROM events ORDER BY event_id
"""


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


Q02_SQL = """
SELECT s_suppkey AS supp_key, s_name AS supp_name, n_name AS nation_name
FROM supplier JOIN nation ON s_nationkey = n_nationkey
WHERE lower(s_name) LIKE 'supplier#%'
  AND lower(n_name) NOT IN ('france', 'germany')
ORDER BY supp_key
"""


# Q03 — S9/F7: JSON-path extraction + group count (Config.scala:105-108).

def q03(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    return (
        ev.groupBy(F.get_json_object("props", "$.k").cast("bigint").alias("k"))
        .agg(F.count("*").cast("bigint").alias("n"))
        .orderBy("k")
    )


Q03_SQL = """
SELECT CAST(json_extract_string(props, '$.k') AS BIGINT) AS k,
       CAST(COUNT(*) AS BIGINT) AS n
FROM events GROUP BY 1 ORDER BY k
"""


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


Q04_SQL = f"""
SELECT user_id, event_type AS metric, {_dec4('SUM(value)')} AS sum_value
FROM events GROUP BY user_id, event_type ORDER BY user_id, metric
"""


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


Q05_SQL = """
WITH u AS (
  SELECT c_custkey,
         CASE WHEN c_custkey % 7 <> 0
              THEN 'http://node-' || CAST(c_custkey AS VARCHAR) || ':8080'
              ELSE c_name END AS uri
  FROM customer)
SELECT c_custkey AS cust_key, regexp_extract(uri, '.*//(.*):.*', 1) AS host
FROM u
WHERE length(regexp_extract(uri, '.*//(.*):.*', 1)) > 0
ORDER BY cust_key
"""


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


Q06_SQL = """
SELECT c_custkey AS cust_key, c_name AS cust_name
FROM customer
WHERE c_custkey IN (SELECT o_custkey FROM orders WHERE upper(o_orderstatus) = 'O')
ORDER BY cust_key
"""


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


Q07_SQL = """
SELECT c_custkey AS cust_key, c_mktsegment AS segment
FROM customer
WHERE c_custkey NOT IN (SELECT o_custkey FROM orders WHERE o_orderstatus = 'F')
ORDER BY cust_key
"""


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


Q08_SQL = f"""
WITH spec AS (SELECT DISTINCT upper(p_brand) AS spec_brand FROM part WHERE p_size > 25)
SELECT p_brand AS brand,
       CAST(COUNT(*) AS BIGINT) AS n_lines,
       {_dec4('SUM(l_quantity)')} AS sum_qty
FROM part
JOIN spec ON lower(p_brand) = lower(spec_brand)
JOIN lineitem ON p_partkey = l_partkey
GROUP BY p_brand
HAVING SUM(CASE WHEN l_returnflag = 'A' THEN 1 ELSE 0 END) > 0
   AND SUM(CASE WHEN l_returnflag = 'N' THEN 1 ELSE 0 END) > 0
   AND SUM(CASE WHEN l_returnflag = 'R' THEN 1 ELSE 0 END) > 0
ORDER BY brand
"""


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


_Q09_FILLED_SQL = """
  days AS (SELECT DISTINCT CAST(ts AS DATE) AS tick FROM events),
  usrs AS (SELECT DISTINCT user_id AS node FROM events),
  daily AS (SELECT CAST(ts AS DATE) AS tick, user_id AS node, SUM(value) AS value
            FROM events GROUP BY 1, 2),
  filled AS (SELECT s.tick, s.node, COALESCE(d.value, 0.0) AS value
             FROM (SELECT tick, node FROM days CROSS JOIN usrs) s
             LEFT JOIN daily d ON s.tick = d.tick AND s.node = d.node),
  last4 AS (SELECT node, value,
                   ROW_NUMBER() OVER (PARTITION BY node ORDER BY tick DESC) AS rn
            FROM filled)
"""

Q09_SQL = f"""
WITH {_Q09_FILLED_SQL}
SELECT node AS user_id, {_dec4('AVG(value)')} AS avg_last4,
       CAST(COUNT(*) AS BIGINT) AS n_points
FROM last4 WHERE rn <= 4
GROUP BY node HAVING COUNT(*) >= 4
ORDER BY user_id
"""


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


Q10_SQL = f"""
WITH {_Q09_FILLED_SQL},
  avg4 AS (SELECT node, AVG(value) AS avg_value FROM last4 WHERE rn <= 4
           GROUP BY node HAVING COUNT(*) >= 4),
  lastnodes AS (SELECT DISTINCT node FROM daily
                WHERE tick = (SELECT MAX(tick) FROM daily)),
  den AS (SELECT CAST(COUNT(*) AS BIGINT) AS total_nodes FROM lastnodes),
  num AS (SELECT
            CAST(SUM(CASE WHEN avg_value >= 100.0 THEN 1 ELSE 0 END) AS BIGINT) AS breached,
            CAST(SUM(CASE WHEN avg_value > 50.0 AND avg_value < 100.0 THEN 1 ELSE 0 END) AS BIGINT) AS mid_count
          FROM avg4 JOIN lastnodes USING (node))
SELECT breached, mid_count, total_nodes,
       breached >= total_nodes * 0.8 AS is_expand_quorum,
       mid_count >= total_nodes * 0.8 AS is_hold_quorum,
       NOT (breached >= total_nodes * 0.8) AS is_avg_lower
FROM num, den
"""


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


Q11_SQL = f"""
SELECT o_orderpriority AS priority,
       CAST(SUM(CASE WHEN o_orderstatus = 'O' THEN 1 ELSE 0 END) AS BIGINT) AS running_cnt,
       CAST(COUNT(*) AS BIGINT) AS requested_cnt,
       {_dec4('SUM(o_totalprice)')} AS total_price,
       BOOL_OR(o_orderstatus = 'P') AS is_resizing
FROM orders GROUP BY 1 ORDER BY priority
"""


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


Q12_SQL = f"""
WITH r AS (
  SELECT user_id, ts, event_type, value,
         ROW_NUMBER() OVER (PARTITION BY user_id ORDER BY ts DESC, event_id DESC) AS rn
  FROM events)
SELECT user_id,
       MAX(CASE WHEN rn = 1 THEN {_fmt('ts')} END) AS last_ts,
       MAX(CASE WHEN rn = 1 THEN event_type END) AS last_event_type,
       {_dec4('MAX(CASE WHEN rn = 1 THEN value END)')} AS last_value,
       {_dec4('AVG(CASE WHEN rn <= 20 THEN value END)')} AS avg_last20
FROM r GROUP BY user_id ORDER BY user_id
"""


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


Q13_SQL = """
SELECT p_brand AS brand,
       arg_min(p_type, p_partkey) AS first_type,
       concat_ws('-', 'AutoScaling', 'TASK', lower(p_brand), arg_min(p_type, p_partkey)) AS task_name,
       CAST(COUNT(DISTINCT p_type) AS BIGINT) AS n_types
FROM part GROUP BY p_brand ORDER BY brand
"""


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


Q14_SQL = """
WITH n AS (SELECT CAST(COUNT(*) AS BIGINT) AS total FROM orders WHERE o_orderstatus = 'O'),
g AS (SELECT CAST(COUNT(*) AS BIGINT) AS n_groups FROM region),
idx AS (SELECT r_regionkey, r_name,
               ROW_NUMBER() OVER (ORDER BY r_regionkey) - 1 AS i
        FROM region),
run AS (SELECT n_regionkey AS rk, CAST(COUNT(*) AS BIGINT) AS running
        FROM supplier JOIN nation ON s_nationkey = n_nationkey GROUP BY 1),
alloc AS (SELECT r_name, r_regionkey,
                 CAST(total // n_groups + CASE WHEN i < total % n_groups THEN 1 ELSE 0 END AS BIGINT) AS alloc
          FROM idx CROSS JOIN n CROSS JOIN g)
SELECT r_name AS group_name, alloc,
       CAST(COALESCE(running, 0) AS BIGINT) AS running,
       CASE WHEN COALESCE(running, 0) - alloc > 0 THEN 'SHRINK'
            WHEN COALESCE(running, 0) - alloc < 0 THEN 'EXPAND'
            ELSE 'NONE' END AS action
FROM alloc LEFT JOIN run ON r_regionkey = rk
ORDER BY group_name
"""


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


Q15_SQL = f"""
WITH m AS (
  SELECT event_id, user_id, ts,
         MAX(CASE WHEN event_type = 'error' THEN ts END) OVER (
           PARTITION BY user_id ORDER BY ts, event_id
           ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS last_err
  FROM events)
SELECT event_id, user_id, {_fmt('ts')} AS ts_fmt,
       COALESCE({_fmt('last_err')}, 'never') AS last_suspended,
       (last_err IS NOT NULL AND ts <= last_err + INTERVAL 36 HOUR) AS is_excluded
FROM m ORDER BY event_id
"""


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


Q16_SQL = f"""
SELECT {_fmt("date_trunc('hour', ts)")} AS win_start,
       CAST(COUNT(*) AS BIGINT) AS n_total,
       CAST(SUM(CASE WHEN event_type = 'click' THEN 1 ELSE 0 END) AS BIGINT) AS n_click,
       CAST(SUM(CASE WHEN event_type = 'error' THEN 1 ELSE 0 END) AS BIGINT) AS n_error,
       CAST(SUM(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END) AS BIGINT) AS n_purchase,
       CAST(SUM(CASE WHEN event_type = 'signup' THEN 1 ELSE 0 END) AS BIGINT) AS n_signup,
       CAST(SUM(CASE WHEN event_type = 'view' THEN 1 ELSE 0 END) AS BIGINT) AS n_view,
       (SUM(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END) < 1
        AND SUM(CASE WHEN event_type = 'error' THEN 1 ELSE 0 END) < 1
        AND SUM(CASE WHEN event_type = 'signup' THEN 1 ELSE 0 END) < 1) AS is_idle
FROM events GROUP BY date_trunc('hour', ts) ORDER BY win_start
"""


# Q17 — D3/W5: cooldown gating via lag (batch form of the 2-minute
# cooldown clock — scaling/ScalingManager.scala:21,38-45).

def q17(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events").filter(F.col("value") >= 150.0)
    gated = ev_ops.cooldown_gate(ev, "48 HOURS")
    return gated.select(
        "event_id", "user_id", fmt_ts("ts").alias("action_ts")
    ).orderBy("event_id")


Q17_SQL = f"""
WITH br AS (SELECT event_id, user_id, ts FROM events WHERE value >= 150.0),
g AS (SELECT *, LAG(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS prev_ts FROM br)
SELECT event_id, user_id, {_fmt('ts')} AS action_ts
FROM g WHERE prev_ts IS NULL OR ts > prev_ts + INTERVAL 48 HOUR
ORDER BY event_id
"""


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


Q18_SQL = """
WITH base AS (
  SELECT o_orderkey AS order_key,
         o_orderkey % 21 AS running,
         o_custkey % 30 AS required,
         CASE WHEN o_orderstatus = 'O' THEN 'EXPAND'
              WHEN o_orderstatus = 'F' THEN 'SHRINK'
              ELSE 'NONE' END AS verdict
  FROM orders)
SELECT order_key, running, required, verdict,
       CASE WHEN verdict = 'EXPAND' THEN 'EXPAND'
            WHEN verdict = 'SHRINK' THEN 'SHRINK'
            WHEN required > 0 AND required < running THEN 'EXPAND'
            ELSE 'NONE' END AS action,
       CAST(CASE WHEN verdict = 'EXPAND' THEN LEAST(GREATEST(running + 5, required), 20)
            WHEN verdict = 'SHRINK' THEN GREATEST(running - 3, 0)
            WHEN required > 0 AND required < running THEN LEAST(GREATEST(running + 5, required), 20)
            ELSE running END AS BIGINT) AS target
FROM base ORDER BY order_key
"""


# Q19 — F8: epoch-millis <-> timestamp round trip + UTC formatting
# (scaling/ScalingManager.scala:42-44).

def q19(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    return ev.select(
        "event_id",
        F.unix_millis("ts").alias("ts_ms"),
        fmt_ts(F.timestamp_millis(F.unix_millis("ts"))).alias("ts_rt"),
    ).orderBy("event_id")


Q19_SQL = f"""
SELECT event_id,
       epoch_ms(ts) AS ts_ms,
       {_fmt('make_timestamp(epoch_ms(ts) * 1000)')} AS ts_rt
FROM events ORDER BY event_id
"""


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


Q20_SQL = """
WITH node_day AS (
  SELECT CAST(ts AS DATE) AS d, user_id, AVG(value) AS avg_v
  FROM events GROUP BY 1, 2),
agg AS (
  SELECT d,
         CAST(SUM(CASE WHEN avg_v >= 150.0 THEN 1 ELSE 0 END) AS BIGINT) AS hi,
         CAST(SUM(CASE WHEN avg_v > 80.0 AND avg_v < 150.0 THEN 1 ELSE 0 END) AS BIGINT) AS mid,
         CAST(COUNT(*) AS BIGINT) AS total
  FROM node_day GROUP BY d),
verdicts AS (
  SELECT *,
         CASE WHEN total < 4 THEN 'NONE'
              WHEN hi >= total * 0.8 THEN 'EXPAND'
              WHEN mid >= total * 0.8 THEN 'NONE'
              ELSE 'SHRINK' END AS verdict,
         CAST(day(d) % 25 AS INTEGER) AS running,
         CAST(day(d) % 8 AS INTEGER) AS required,
         CAST((day(d) * 3) % 23 AS INTEGER) AS requested
  FROM agg),
planned AS (
  SELECT *,
         CASE WHEN verdict = 'EXPAND' THEN 'EXPAND'
              WHEN verdict = 'SHRINK' THEN 'SHRINK'
              WHEN required > 0 AND required < running THEN 'EXPAND'
              ELSE 'NONE' END AS planned_action,
         CAST(CASE WHEN verdict = 'EXPAND' THEN LEAST(GREATEST(running + 5, required), 20)
              WHEN verdict = 'SHRINK' THEN GREATEST(running - 3, 0)
              WHEN required > 0 AND required < running THEN LEAST(GREATEST(running + 5, required), 20)
              ELSE running END AS INTEGER) AS planned_target
  FROM verdicts)
SELECT strftime(d, '%Y-%m-%d') AS d,
       total, hi, mid, verdict, running, required, requested,
       planned_action, planned_target,
       CASE WHEN planned_action = 'EXPAND' THEN
              CASE WHEN running = 20 THEN 'NONE' ELSE 'RESIZE' END
            WHEN planned_action = 'SHRINK' THEN
              CASE WHEN running = 0 THEN 'NONE'
                   WHEN requested = planned_target THEN 'NONE'
                   ELSE 'RESIZE' END
            ELSE 'NONE' END AS final_action,
       CAST(CASE WHEN planned_action = 'EXPAND' THEN
              CASE WHEN running = 20 THEN running
                   WHEN running > 20 THEN 20
                   ELSE planned_target END
            WHEN planned_action = 'SHRINK' THEN
              CASE WHEN running = 0 OR requested = planned_target THEN running
                   ELSE planned_target END
            ELSE running END AS INTEGER) AS final_target
FROM planned ORDER BY d
"""


# Q21 — X1: exact dedup on content hash, keep min doc_id.

def q21(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load_table(spark, sf_dir, "documents")
    return dedup.exact_dedup(d).orderBy("text_hash")


Q21_SQL = """
SELECT md5(text) AS text_hash, MIN(doc_id) AS keep_id,
       CAST(COUNT(*) AS BIGINT) AS n_dups
FROM documents GROUP BY 1 ORDER BY text_hash
"""


# Q22 — X2: deterministic shingle-minhash near-dup clusters.

def q22(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load_table(spark, sf_dir, "documents")
    return dedup.near_dup_clusters(d, k=3).orderBy("sig")


Q22_SQL = """
WITH t AS (SELECT doc_id, string_split(text, ' ') AS toks FROM documents),
s AS (SELECT doc_id,
             list_min(list_transform(range(1, len(toks) - 1),
                      i -> md5(toks[i] || ' ' || toks[i+1] || ' ' || toks[i+2]))) AS sig
      FROM t WHERE len(toks) >= 3)
SELECT sig, MIN(doc_id) AS keep_id, CAST(COUNT(*) AS BIGINT) AS cluster_size
FROM s GROUP BY sig ORDER BY sig
"""


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


Q23_SQL = """
WITH e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
n AS (SELECT vec_id, v, sqrt(list_inner_product(v, v)) AS nrm FROM e),
q AS (SELECT vec_id AS q_id, v AS qv, nrm AS qn FROM n WHERE vec_id < 10),
p AS (SELECT q_id, vec_id AS neighbor_id,
             CAST(ROUND(list_inner_product(qv, v) / (qn * nrm), 4) AS DECIMAL(38,4)) AS cosine
      FROM q, n WHERE vec_id <> q_id),
r AS (SELECT *, CAST(ROW_NUMBER() OVER (PARTITION BY q_id ORDER BY cosine DESC, neighbor_id) AS INTEGER) AS rank
      FROM p)
SELECT q_id, neighbor_id, CAST(cosine AS VARCHAR) AS cosine, rank FROM r WHERE rank <= 5
ORDER BY q_id, rank
"""


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


Q24_SQL = f"""
SELECT lang, source,
       CAST(COUNT(*) AS BIGINT) AS n_docs,
       CAST(SUM(len(string_split(text, ' '))) AS BIGINT) AS total_tokens,
       {_dec4("AVG(CAST(len(string_split(text, ' ')) AS DOUBLE))")} AS avg_tokens,
       {_dec4('AVG(CAST(n_chars AS DOUBLE))')} AS avg_chars,
       CAST(MIN(n_chars) AS BIGINT) AS min_chars,
       CAST(MAX(n_chars) AS BIGINT) AS max_chars
FROM documents GROUP BY lang, source ORDER BY lang, source
"""


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


Q25_SQL = f"""
WITH g AS (
  SELECT event_id, user_id, ts, value,
         CASE WHEN LAG(ts) OVER w IS NULL
                OR ts > LAG(ts) OVER w + INTERVAL 12 HOUR THEN 1 ELSE 0 END AS is_new
  FROM events WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)),
s AS (SELECT *, SUM(is_new) OVER (PARTITION BY user_id ORDER BY ts, event_id
                                  ROWS UNBOUNDED PRECEDING) AS session_idx
      FROM g)
SELECT user_id, CAST(session_idx AS BIGINT) AS session_idx,
       CAST(COUNT(*) AS BIGINT) AS n_events,
       {_fmt('MIN(ts)')} AS session_start,
       {_fmt('MAX(ts)')} AS session_end,
       CAST(date_diff('second', MIN(ts), MAX(ts)) AS BIGINT) AS duration_sec,
       {_dec4('SUM(value)')} AS sum_value
FROM s GROUP BY user_id, session_idx ORDER BY user_id, session_idx
"""


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


Q26_SQL = """
WITH h AS (
  SELECT doc_id,
         list_transform(string_split(text, ' '), t -> md5(t)) AS hs
  FROM documents),
s AS (
  SELECT doc_id,
         CAST(list_sum(list_transform(range(16), b ->
           CASE WHEN len(list_filter(hs, h -> substr(h, b + 1, 1) >= '8')) * 2
                     - len(hs) > 0
                THEN 1 << b ELSE 0 END)) AS INTEGER) AS sig
  FROM h)
SELECT sig, MIN(doc_id) AS keep_id, CAST(COUNT(*) AS BIGINT) AS cluster_size
FROM s GROUP BY sig ORDER BY sig
"""


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


Q27_SQL = f"""
WITH t AS (SELECT doc_id, string_split(text, ' ') AS toks FROM documents),
f AS (SELECT doc_id, toks FROM t WHERE len(toks) >= 3),
s AS (SELECT doc_id AS id,
             unnest(list_distinct(list_transform(range(1, len(toks) - 1),
               i -> md5(toks[i] || ' ' || toks[i+1] || ' ' || toks[i+2])))) AS sh
      FROM f),
sz AS (SELECT id, COUNT(*) AS sz FROM s GROUP BY id),
i AS (SELECT a.id AS id_a, b.id AS id_b, CAST(COUNT(*) AS BIGINT) AS n_common
      FROM s a JOIN s b ON a.sh = b.sh AND a.id < b.id GROUP BY 1, 2)
SELECT id_a, id_b, n_common, x.sz AS sz_a, y.sz AS sz_b,
       {_dec4('n_common / (x.sz + y.sz - n_common)')} AS jaccard
FROM i JOIN sz x ON id_a = x.id JOIN sz y ON id_b = y.id
WHERE n_common / (x.sz + y.sz - n_common) >= 0.5
ORDER BY id_a, id_b
"""


# Q28 — exact embedding-cosine near-dup pairs (the correctness baseline
# for X2's embedding variant; Q29/Q30 are the bucketed scale paths).

def q28(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = load_table(spark, sf_dir, "embeddings")
    return (
        similarity.near_dup_pairs_blocked(e, threshold=0.4)
        .withColumn("cosine", F.col("cosine").cast("string"))
        .orderBy("id_a", "id_b")
    )


Q28_SQL = """
WITH e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
n AS (SELECT vec_id, v, sqrt(list_inner_product(v, v)) AS nrm FROM e),
p AS (SELECT a.vec_id AS id_a, b.vec_id AS id_b,
             CAST(ROUND(list_inner_product(a.v, b.v) / (a.nrm * b.nrm), 4)
                  AS DECIMAL(38,4)) AS cosine
      FROM n a, n b WHERE a.vec_id < b.vec_id)
SELECT id_a, id_b, CAST(cosine AS VARCHAR) AS cosine FROM p
WHERE cosine >= 0.4 ORDER BY id_a, id_b
"""


# Q29 — LSH-bucketed approximate top-k (SRP hyperplanes embedded as
# literals on BOTH sides so the oracle replays the exact buckets).

_PLANES = similarity.md5_sign_planes(n_planes=8, dim=64)


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


def _planes_sql_literal(planes: list[list[float]] | None = None) -> str:
    rows = ", ".join(
        "[" + ", ".join(f"{x:.1f}" for x in plane) + "]"
        for plane in (_PLANES if planes is None else planes)
    )
    return f"[{rows}]"


Q29_SQL = f"""
WITH pl AS (SELECT {_planes_sql_literal()} AS planes),
e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
n AS (SELECT vec_id, v, sqrt(list_inner_product(v, v)) AS nrm,
             CAST(list_sum(list_transform(range(8), p ->
               CASE WHEN ROUND(list_inner_product(v, planes[p + 1]), 6) > 0
                    THEN 1 << p ELSE 0 END)) AS INTEGER) AS bucket
      FROM e, pl),
q AS (SELECT vec_id AS q_id, v AS qv, nrm AS qn, bucket FROM n WHERE vec_id < 10),
p AS (SELECT q_id, n.vec_id AS neighbor_id,
             CAST(ROUND(list_inner_product(qv, n.v) / (qn * n.nrm), 4)
                  AS DECIMAL(38,4)) AS cosine
      FROM q JOIN n USING (bucket) WHERE n.vec_id <> q_id),
r AS (SELECT *, CAST(ROW_NUMBER() OVER (PARTITION BY q_id
                     ORDER BY cosine DESC, neighbor_id) AS INTEGER) AS rank
      FROM p)
SELECT q_id, neighbor_id, CAST(cosine AS VARCHAR) AS cosine, rank FROM r WHERE rank <= 5
ORDER BY q_id, rank
"""


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


Q30_SQL = """
WITH e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
n AS (SELECT vec_id, v, sqrt(list_inner_product(v, v)) AS nrm FROM e),
c AS (SELECT vec_id AS c_id, v AS ce, nrm AS cen FROM n WHERE vec_id < 8),
asg AS (
  SELECT vec_id, v, nrm, c_id AS assigned,
         ROW_NUMBER() OVER (PARTITION BY vec_id
           ORDER BY ROUND(list_inner_product(v, ce) / (nrm * cen), 6) DESC, c_id) AS rn
  FROM n, c),
a AS (SELECT vec_id, v, nrm, assigned FROM asg WHERE rn = 1),
q AS (SELECT vec_id AS q_id, v AS qv, nrm AS qn, assigned FROM a
      WHERE vec_id % 50 = 0 AND vec_id >= 8),
p AS (SELECT q_id, a.vec_id AS neighbor_id,
             CAST(ROUND(list_inner_product(qv, a.v) / (qn * a.nrm), 4)
                  AS DECIMAL(38,4)) AS cosine
      FROM q JOIN a USING (assigned) WHERE a.vec_id <> q_id),
r AS (SELECT *, CAST(ROW_NUMBER() OVER (PARTITION BY q_id
                     ORDER BY cosine DESC, neighbor_id) AS INTEGER) AS rank
      FROM p)
SELECT q_id, neighbor_id, CAST(cosine AS VARCHAR) AS cosine, rank FROM r WHERE rank <= 5
ORDER BY q_id, rank
"""


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


Q31_SQL = f"""
WITH s AS (
  SELECT lang,
         string_split(lower(text), ' ') AS lt,
         string_split(text, ' ') AS toks,
         text
  FROM documents),
g AS (
  SELECT lang,
         len(list_filter(lt, t -> t IN ('the','and','of','is'))) AS en,
         len(list_filter(lt, t -> t IN ('der','die','und','ist'))) AS de,
         len(list_filter(lt, t -> t IN ('le','la','et','est'))) AS fr,
         len(list_filter(lt, t -> t IN ('el','los','y','es'))) AS es,
         len(toks) AS n_tok,
         len(list_filter(lt, t -> t IN
           ('the','a','of','and','to','in','is','it','that','for'))) AS n_stop,
         length(regexp_replace(text, '[^\\.,;:!\\?]', '', 'g')) AS n_punct,
         length(text) AS n_char
  FROM s),
v AS (
  SELECT lang,
         CASE WHEN greatest(en, de, fr, es) = 0 THEN 'und'
              WHEN en = greatest(en, de, fr, es) THEN 'en'
              WHEN de = greatest(en, de, fr, es) THEN 'de'
              WHEN fr = greatest(en, de, fr, es) THEN 'fr'
              ELSE 'es' END AS guessed,
         (least(n_tok / 100.0, 1.0)
          + least(n_stop / greatest(n_tok, 1) * 5.0, 1.0)
          + greatest(1.0 - n_punct / greatest(n_char, 1) * 5.0, 0.0)) / 3.0 AS q
  FROM g)
SELECT guessed, CAST(COUNT(*) AS BIGINT) AS n_docs,
       CAST(SUM(CASE WHEN lang = guessed THEN 1 ELSE 0 END) AS BIGINT) AS n_label_match,
       {_dec4('SUM(q)')} AS sum_quality
FROM v GROUP BY guessed ORDER BY guessed
"""


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


Q32_SQL = r"""
WITH t AS (SELECT doc_id, text, string_split(text, ' ') AS toks FROM documents)
SELECT doc_id,
       CAST(len(regexp_extract_all(text, '[A-Za-z]+|[0-9]+|[^A-Za-z0-9\s]')) AS BIGINT)
         AS bpe_tokens,
       CAST(len(toks) AS BIGINT) AS ws_tokens,
       list_reduce(
         list_prepend(CAST(0 AS BIGINT),
           list_transform(range(1, greatest(len(toks) - 7, 1) + 1),
             i -> CAST('0x' || substr(md5(array_to_string(toks[i:i+7], ' ')), 1, 15)
                       AS BIGINT))),
         (a, b) -> xor(a, b)) AS fingerprint
FROM t ORDER BY doc_id
"""


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


Q33_SQL = """
SELECT COALESCE(lang, 'ALL') AS lang, COALESCE(source, 'ALL') AS source,
       CAST(GROUPING(lang) AS INTEGER) AS g_lang,
       CAST(GROUPING(source) AS INTEGER) AS g_source,
       CAST(COUNT(*) AS BIGINT) AS n_docs,
       CAST(SUM(n_chars) AS BIGINT) AS total_chars
FROM documents GROUP BY ROLLUP(lang, source)
ORDER BY lang, source, g_lang, g_source
"""


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


Q34_SQL = f"""
WITH base AS (
  SELECT event_id, user_id, ts, value,
         CASE WHEN event_type = 'click' THEN 1 ELSE 0 END AS is_click,
         CASE WHEN event_type = 'purchase' THEN value END AS pv,
         CASE WHEN event_type = 'purchase' THEN ts END AS pts
  FROM events WHERE event_type IN ('click', 'purchase')),
w AS (
  SELECT *, LAST_VALUE(pv IGNORE NULLS) OVER win AS last_pv,
            LAST_VALUE(pts IGNORE NULLS) OVER win AS last_pts
  FROM base
  WINDOW win AS (PARTITION BY user_id ORDER BY ts, is_click, event_id
                 ROWS UNBOUNDED PRECEDING))
SELECT event_id AS click_id, user_id, {_fmt('ts')} AS click_ts,
       {_dec4('last_pv')} AS last_purchase_value,
       CAST(date_diff('second', last_pts, ts) AS BIGINT) AS lag_sec
FROM w WHERE is_click = 1 ORDER BY click_id
"""


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


Q35_SQL = f"""
SELECT event_type, CAST(COUNT(*) AS BIGINT) AS n,
       {_dec4('quantile_cont(value, 0.5)')} AS p50,
       {_dec4('quantile_cont(value, 0.9)')} AS p90
FROM events GROUP BY event_type ORDER BY event_type
"""


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


Q36_SQL = f"""
WITH r AS (
  SELECT c_mktsegment AS segment, o_orderkey, o_totalprice,
         CAST(ROW_NUMBER() OVER (PARTITION BY c_mktsegment
              ORDER BY o_totalprice DESC, o_orderkey) AS INTEGER) AS rnk
  FROM orders JOIN customer ON o_custkey = c_custkey)
SELECT segment, rnk, o_orderkey AS order_key,
       {_dec4('o_totalprice')} AS total_price
FROM r WHERE rnk <= 3 ORDER BY segment, rnk
"""


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


Q37_SQL = """
SELECT doc_id, CAST(strlen(text) AS BIGINT) AS n_bytes,
       CAST(CASE WHEN strlen(text) > 0 THEN ascii(text) END AS INTEGER) AS first_byte
FROM documents ORDER BY doc_id
"""


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


Q38_SQL = """
WITH o AS (SELECT CAST(o_orderdate AS DATE) AS d, CAST(COUNT(*) AS BIGINT) AS n_orders
           FROM orders GROUP BY 1),
e AS (SELECT CAST(ts AS DATE) AS d, CAST(COUNT(*) AS BIGINT) AS n_events
      FROM events GROUP BY 1)
SELECT strftime(COALESCE(o.d, e.d), '%Y-%m-%d') AS day, n_orders, n_events
FROM o FULL OUTER JOIN e USING (d) ORDER BY day
"""


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


Q39_SQL = """
WITH grid AS (
  SELECT DISTINCT date_trunc('quarter', o_orderdate) AS q_start,
         date_trunc('quarter', o_orderdate) + INTERVAL 3 MONTH AS q_end
  FROM orders)
SELECT strftime(q_start, '%Y-%m-%d') AS quarter,
       CAST(COUNT(*) AS BIGINT) AS n_active_orders
FROM orders JOIN grid
  ON o_orderdate < q_end AND o_orderdate + INTERVAL 30 DAY >= q_start
GROUP BY 1 ORDER BY quarter
"""


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


Q40_SQL = f"""
SELECT o_orderpriority AS priority,
       CAST(COUNT(*) AS BIGINT) AS n_orders,
       CAST(COUNT(DISTINCT o_custkey) AS BIGINT) AS n_customers,
       CAST(COUNT(DISTINCT CAST(o_orderdate AS DATE)) AS BIGINT) AS n_days,
       {_dec4('SUM(o_totalprice)')} AS sum_price
FROM orders GROUP BY 1 ORDER BY priority
"""


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
Q41_SQL = f"""
WITH e AS (SELECT *, CAST(floor(epoch(ts)) AS BIGINT) AS ts_sec FROM events)
SELECT event_id, user_id, {_fmt('ts')} AS ts_str,
       {_dec4('SUM(value) OVER w')} AS trailing_hour_sum,
       CAST(COUNT(*) OVER w AS BIGINT) AS trailing_hour_n
FROM e
WINDOW w AS (PARTITION BY user_id ORDER BY ts_sec
             RANGE BETWEEN 3600 PRECEDING AND CURRENT ROW)
ORDER BY event_id
"""


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


Q42_SQL = """
SELECT lang,
       CAST(SUM(length(regexp_replace(lower(text), '[^aeiou]', '', 'g'))) AS BIGINT)
         AS total_vowels,
       CAST(COUNT(*) AS BIGINT) AS n_docs
FROM documents GROUP BY lang ORDER BY lang
"""


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


Q43_SQL = """
SELECT o_orderpriority AS priority,
       CAST(COUNT(DISTINCT o_custkey) AS BIGINT) AS exact_customers,
       CAST(COUNT(*) AS BIGINT) AS n_orders,
       TRUE AS ndv_within_10pct,
       TRUE AS p50_within_band
FROM orders GROUP BY 1 ORDER BY priority
"""


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


Q44_SQL = """
SELECT user_id,
       CAST(COUNT(*) FILTER (event_type = 'click') AS BIGINT) AS n_click,
       CAST(COUNT(*) FILTER (event_type = 'view') AS BIGINT) AS n_view,
       CAST(COUNT(*) FILTER (event_type = 'purchase') AS BIGINT) AS n_purchase,
       CAST(COUNT(*) FILTER (event_type = 'signup') AS BIGINT) AS n_signup,
       CAST(COUNT(*) FILTER (event_type = 'error') AS BIGINT) AS n_error
FROM events GROUP BY user_id ORDER BY user_id
"""


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


Q45_SQL = f"""
SELECT user_id, event_type, {_dec4('SUM(value)')} AS sum_value
FROM events GROUP BY user_id, event_type
HAVING SUM(value) > 100.0
ORDER BY user_id, event_type
"""


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


Q46_SQL = f"""
SELECT c_mktsegment AS segment,
       CAST(EXTRACT(year FROM o_orderdate) AS INTEGER) AS order_year,
       CAST(COUNT(*) AS BIGINT) AS n_items,
       {_dec4('SUM(l_extendedprice * (1.0 - l_discount))')} AS revenue
FROM lineitem JOIN orders ON l_orderkey = o_orderkey
              JOIN customer ON o_custkey = c_custkey
GROUP BY 1, 2 ORDER BY segment, order_year
"""


# Q47 — SimHash Hamming-radius pairs via band-join (the radius>0
# extension of Q26; band-equi candidates + exact bit_count verify).

def q47(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load_table(spark, sf_dir, "documents")
    return dedup.simhash_hamming_pairs(d, max_hamming=2, n_bands=4).orderBy(
        "id_a", "id_b"
    )


# shared by Q47 (the pairs themselves) and Q49 (their transitive closure)
_Q47_PAIR_CTES = """h AS (
  SELECT doc_id,
         list_transform(string_split(text, ' '),
           t -> CAST('0x' || substr(md5(t), 1, 15) AS BIGINT)) AS hs
  FROM documents),
s AS (
  SELECT doc_id AS id,
         CAST(list_sum(list_transform(range(32), b ->
           CASE WHEN len(list_filter(hs, h -> ((h >> b) & 1) = 1)) * 2
                     - len(hs) > 0
                THEN CAST(1 AS BIGINT) << b ELSE 0 END)) AS BIGINT) AS sig
  FROM h),
banded AS (
  SELECT id, sig, band, (sig >> (band * 8)) & 255 AS key
  FROM s, (SELECT unnest(range(4)) AS band)),
cand AS (
  SELECT DISTINCT a.id AS id_a, b.id AS id_b, a.sig AS sig_a, b.sig AS sig_b
  FROM banded a JOIN banded b
    ON a.band = b.band AND a.key = b.key AND a.id < b.id),
pairs AS (
  SELECT id_a, id_b, sig_a, sig_b,
         CAST(bit_count(xor(sig_a, sig_b)) AS INTEGER) AS hamming
  FROM cand WHERE bit_count(xor(sig_a, sig_b)) <= 2)"""

Q47_SQL = f"""
WITH {_Q47_PAIR_CTES}
SELECT id_a, id_b, sig_a, sig_b, hamming FROM pairs
ORDER BY id_a, id_b
"""


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


Q48_SQL = """
WITH b AS (
  SELECT lang, n_chars,
         CAST('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 15) AS BIGINT) % 100
           AS bucket
  FROM documents)
SELECT lang,
       CASE WHEN bucket < 80 THEN 'train'
            WHEN bucket < 90 THEN 'val'
            ELSE 'test' END AS split,
       CAST(COUNT(*) AS BIGINT) AS n_docs,
       CAST(SUM(n_chars) AS BIGINT) AS total_chars
FROM b GROUP BY 1, 2 ORDER BY lang, split
"""


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


Q49_SQL = f"""
WITH RECURSIVE {_Q47_PAIR_CTES},
edges AS (
  SELECT id_a AS src, id_b AS dst FROM pairs
  UNION
  SELECT id_b, id_a FROM pairs),
nodes AS (SELECT DISTINCT src AS id FROM edges),
reach(id, r) AS (
  SELECT id, id FROM nodes
  UNION
  SELECT re.id, e.dst FROM reach re JOIN edges e ON e.src = re.r),
comp AS (SELECT id, MIN(r) AS component FROM reach GROUP BY id)
SELECT component, CAST(COUNT(*) AS BIGINT) AS n_members,
       CAST(MAX(id) AS BIGINT) AS max_member
FROM comp GROUP BY component ORDER BY component
"""


# Q50 — X4 extension: TF-IDF top-3 characteristic terms per document.
# The idf ratio stays un-logged (monotone, and a quotient of exact ints
# is bit-identical across engines where libm ln is not).

def q50(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load_table(spark, sf_dir, "documents").filter(F.col("doc_id") < 100)
    out = text.tfidf_top_terms(d, k=3)
    return out.select(
        "doc_id", "term", "rank", dec4("score").alias("score")
    ).orderBy("doc_id", "rank")


Q50_SQL = f"""
WITH d AS (SELECT doc_id, text FROM documents WHERE doc_id < 100),
tf AS (SELECT doc_id, unnest(string_split(text, ' ')) AS term FROM d),
tfc AS (SELECT doc_id, term, COUNT(*) AS tf FROM tf GROUP BY 1, 2),
dfreq AS (SELECT term, COUNT(*) AS df FROM tfc GROUP BY 1),
n AS (SELECT COUNT(DISTINCT doc_id) AS n_docs FROM d),
scored AS (
  SELECT doc_id, term, tf * (n_docs + 1) / (df + 1) AS score
  FROM tfc JOIN dfreq USING (term) CROSS JOIN n),
r AS (SELECT *, CAST(ROW_NUMBER() OVER (PARTITION BY doc_id
                     ORDER BY score DESC, term) AS INTEGER) AS rank
      FROM scored)
SELECT doc_id, term, rank, {_dec4('score')} AS score
FROM r WHERE rank <= 3 ORDER BY doc_id, rank
"""


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


Q51_SQL = """
SELECT event_type, CAST(FLOOR(value / 50) AS BIGINT) AS bucket,
       CAST(COUNT(*) AS BIGINT) AS n
FROM events GROUP BY 1, 2 ORDER BY event_type, bucket
"""


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


Q52_SQL = r"""
WITH p AS (
  SELECT doc_id,
         text || ' contact user' || CAST(doc_id AS VARCHAR)
              || '@mail.example or call 555-'
              || lpad(CAST(doc_id % 1000 AS VARCHAR), 3, '0') || '-'
              || lpad(CAST(doc_id % 10000 AS VARCHAR), 4, '0') AS t
  FROM documents),
r AS (
  SELECT doc_id, t,
         regexp_replace(t, '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}',
                        '<EMAIL>', 'g') AS t_email_red
  FROM p)
SELECT doc_id,
       CAST(len(regexp_extract_all(t,
         '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}')) AS BIGINT) AS n_emails,
       -- phones counted after email redaction (mirrors pii_scrub: a
       -- phone-shaped email local part is one <EMAIL>, not a phone)
       CAST(len(regexp_extract_all(t_email_red,
         '[0-9]{3}-[0-9]{3}-[0-9]{4}')) AS BIGINT) AS n_phones,
       md5(regexp_replace(t_email_red,
         '[0-9]{3}-[0-9]{3}-[0-9]{4}', '<PHONE>', 'g')) AS redacted_hash
FROM r ORDER BY doc_id
"""


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


Q53_SQL = f"""
WITH s AS (
  SELECT doc_id, lang, string_split(lower(text), ' ') AS lt,
         string_split(text, ' ') AS toks, text
  FROM documents),
g AS (
  SELECT doc_id, lang, len(toks) AS n_tok,
         len(list_filter(lt, t -> t IN
           ('the','a','of','and','to','in','is','it','that','for'))) AS n_stop,
         length(regexp_replace(text, '[^\\.,;:!\\?]', '', 'g')) AS n_punct,
         length(text) AS n_char
  FROM s),
v AS (
  SELECT doc_id, lang,
         (least(n_tok / 100.0, 1.0)
          + least(n_stop / greatest(n_tok, 1) * 5.0, 1.0)
          + greatest(1.0 - n_punct / greatest(n_char, 1) * 5.0, 0.0)) / 3.0 AS q
  FROM g),
r AS (SELECT *, CAST(ROW_NUMBER() OVER (PARTITION BY lang
                     ORDER BY q DESC, doc_id) AS INTEGER) AS rnk
      FROM v)
SELECT lang, rnk, doc_id, {_dec4('q')} AS quality
FROM r WHERE rnk <= 5 ORDER BY lang, rnk
"""


# Q54 — token-budget packing (X12): greedy assignment of documents to
# fixed-token-budget training packs per language — pack id is the
# starting cumulative-token offset divided by the budget (window
# cumsum; deterministic doc_id order).

_PACK_BUDGET = 2000


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


Q54_SQL = f"""
WITH t AS (
  SELECT lang, doc_id, len(string_split(text, ' ')) AS n_tok
  FROM documents),
c AS (
  SELECT lang, doc_id, n_tok,
         SUM(n_tok) OVER (PARTITION BY lang ORDER BY doc_id) AS cum
  FROM t),
p AS (SELECT lang, CAST(FLOOR((cum - n_tok) / {_PACK_BUDGET}) AS BIGINT) AS pack_id,
             n_tok
      FROM c)
SELECT lang, pack_id, CAST(COUNT(*) AS BIGINT) AS n_docs,
       CAST(SUM(n_tok) AS BIGINT) AS sum_tokens
FROM p GROUP BY 1, 2 ORDER BY lang, pack_id
"""


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


Q55_SQL = f"""
WITH t AS (SELECT doc_id, string_split(text, ' ') AS toks FROM documents),
tf AS (SELECT doc_id, unnest(toks) AS term FROM t),
tfc AS (SELECT doc_id, term, COUNT(*) AS tf FROM tf GROUP BY 1, 2),
tops AS (SELECT doc_id, MAX(tf) AS top, SUM(tf) AS total FROM tfc GROUP BY 1),
bi AS (
  SELECT doc_id,
         list_transform(range(1, len(toks)),
                        i -> toks[i] || ' ' || toks[i+1]) AS bigrams
  FROM t),
bg AS (SELECT doc_id, len(bigrams) AS nbi,
              len(list_distinct(bigrams)) AS dbi
       FROM bi),
v AS (
  SELECT doc_id, total AS n_tok,
         top / total AS twf,
         CASE WHEN nbi > 0 THEN 1.0 - dbi / CAST(nbi AS DOUBLE) ELSE 0.0 END AS dbf
  FROM tops JOIN bg USING (doc_id))
SELECT doc_id, CAST(n_tok AS BIGINT) AS n_tok,
       {_dec4('twf')} AS top_word_frac,
       {_dec4('dbf')} AS dup_bigram_frac,
       (twf > 0.2 OR dbf > 0.5) AS is_repetitive
FROM v ORDER BY doc_id
"""


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


Q56_SQL = f"""
WITH per_src AS (SELECT source, CAST(COUNT(*) AS BIGINT) AS n_docs
                 FROM documents GROUP BY 1),
tot AS (SELECT SUM(n_docs) AS n_total, COUNT(*) AS n_sources FROM per_src)
SELECT source, n_docs,
       {_dec4('n_total / (n_sources * n_docs)')} AS mix_weight
FROM per_src CROSS JOIN tot ORDER BY source
"""


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


Q57_SQL = f"""
WITH pl AS (SELECT {_planes_sql_literal()} AS planes),
e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
pj AS (SELECT vec_id, v, sqrt(list_inner_product(v, v)) AS nrm,
              list_transform(range(8), p ->
                ROUND(list_inner_product(v, planes[p + 1]), 6)) AS projs
       FROM e, pl),
n AS (SELECT vec_id, v, nrm,
             CAST(list_sum(list_transform(range(8), p ->
               CASE WHEN projs[p + 1] > 0 THEN 1 << p ELSE 0 END)) AS INTEGER) AS bucket,
             projs
      FROM pj),
q AS (SELECT vec_id AS q_id, v AS qv, nrm AS qn, bucket, projs FROM n WHERE vec_id < 10),
fl AS (SELECT q_id, bucket, p, s,
              ROW_NUMBER() OVER (PARTITION BY q_id ORDER BY abs(s), p) AS rn
       FROM (SELECT q_id, bucket, unnest(range(8)) AS p, unnest(projs) AS s FROM q)),
pr AS (SELECT q_id, bucket AS probe FROM q
       UNION ALL
       SELECT q_id, CAST(xor(bucket, 1 << p) AS INTEGER) AS probe FROM fl WHERE rn <= 2),
p AS (SELECT q.q_id, n.vec_id AS neighbor_id,
             CAST(ROUND(list_inner_product(qv, n.v) / (qn * n.nrm), 4)
                  AS DECIMAL(38,4)) AS cosine
      FROM q JOIN pr USING (q_id) JOIN n ON n.bucket = pr.probe
      WHERE n.vec_id <> q.q_id),
r AS (SELECT *, CAST(ROW_NUMBER() OVER (PARTITION BY q_id
                     ORDER BY cosine DESC, neighbor_id) AS INTEGER) AS rank
      FROM p)
SELECT q_id, neighbor_id, CAST(cosine AS VARCHAR) AS cosine, rank FROM r WHERE rank <= 5
ORDER BY q_id, rank
"""


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


Q58_SQL = """
WITH e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
n AS (SELECT vec_id, v, sqrt(list_inner_product(v, v)) AS nrm FROM e),
c AS (SELECT vec_id AS c_id, v AS ce, nrm AS cen FROM n WHERE vec_id < 8),
asg AS (
  SELECT vec_id, v, nrm, c_id,
         ROW_NUMBER() OVER (PARTITION BY vec_id
           ORDER BY ROUND(list_inner_product(v, ce) / (nrm * cen), 6) DESC, c_id) AS rn
  FROM n, c),
a AS (SELECT vec_id, v, nrm, c_id AS assigned FROM asg WHERE rn = 1),
q AS (SELECT vec_id AS q_id, v AS qv, nrm AS qn, c_id AS assigned FROM asg
      WHERE vec_id % 50 = 0 AND vec_id >= 8 AND rn <= 2),
p AS (SELECT q_id, a.vec_id AS neighbor_id,
             CAST(ROUND(list_inner_product(qv, a.v) / (qn * a.nrm), 4)
                  AS DECIMAL(38,4)) AS cosine
      FROM q JOIN a USING (assigned) WHERE a.vec_id <> q_id),
r AS (SELECT *, CAST(ROW_NUMBER() OVER (PARTITION BY q_id
                     ORDER BY cosine DESC, neighbor_id) AS INTEGER) AS rank
      FROM p)
SELECT q_id, neighbor_id, CAST(cosine AS VARCHAR) AS cosine, rank FROM r WHERE rank <= 5
ORDER BY q_id, rank
"""


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


Q59_SQL = f"""
WITH t AS (SELECT doc_id, source, string_split(text, ' ') AS toks FROM documents),
g AS (SELECT doc_id, source,
             unnest(list_distinct(list_transform(range(1, len(toks) - 2),
               i -> md5(toks[i] || ' ' || toks[i+1] || ' ' || toks[i+2] || ' ' || toks[i+3])))) AS gram
      FROM t WHERE len(toks) >= 4),
bench AS (SELECT DISTINCT gram FROM g WHERE source IN ('src0', 'src1')),
cand AS (SELECT doc_id, gram FROM g WHERE source NOT IN ('src0', 'src1')),
per AS (SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS n_grams,
               CAST(SUM(CASE WHEN b.gram IS NOT NULL THEN 1 ELSE 0 END) AS BIGINT)
                 AS n_contaminated
        FROM cand c LEFT JOIN bench b USING (gram) GROUP BY 1)
SELECT doc_id, n_grams, n_contaminated,
       {_dec4('n_contaminated / n_grams')} AS contamination
FROM per ORDER BY doc_id
"""


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


Q60_SQL = f"""
WITH t AS (SELECT doc_id, string_split(text, ' ') AS toks FROM documents),
g AS (SELECT doc_id,
             unnest(list_distinct(list_transform(range(1, len(toks) - 1),
               i -> md5(toks[i] || ' ' || toks[i+1] || ' ' || toks[i+2])))) AS gram
      FROM t WHERE len(toks) >= 3),
f AS (SELECT gram, MIN(doc_id) AS first_id FROM g GROUP BY 1),
per AS (SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS n_grams,
               CAST(SUM(CASE WHEN doc_id = first_id THEN 1 ELSE 0 END) AS BIGINT)
                 AS n_novel
        FROM g JOIN f USING (gram) GROUP BY 1)
SELECT doc_id, n_grams, n_novel, {_dec4('n_novel / n_grams')} AS novelty
FROM per ORDER BY doc_id
"""


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


Q61_SQL = """
WITH b AS (
  SELECT doc_id, text, source,
         CAST('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 15) AS BIGINT) % 100
           AS bucket
  FROM documents),
-- NULL-text sentinel mirrors the Spark side (operators/dedup.py): md5(NULL)
-- is NULL and NULL join keys never match, so without the sentinel NULL-text
-- batch rows would be silently dropped by the inner join on fst below.
corpus AS (SELECT DISTINCT COALESCE(md5(text), 'null:' || chr(0)) AS digest
           FROM b WHERE bucket < 70),
batch AS (SELECT doc_id, source, COALESCE(md5(text), 'null:' || chr(0)) AS digest
          FROM b WHERE bucket >= 70),
fst AS (SELECT digest, MIN(doc_id) AS keep_id FROM batch GROUP BY 1),
cls AS (
  SELECT source,
         CASE WHEN c.digest IS NOT NULL THEN 'dup_corpus'
              WHEN bt.doc_id <> f.keep_id THEN 'dup_batch'
              ELSE 'kept' END AS status
  FROM batch bt
  LEFT JOIN corpus c USING (digest)
  JOIN fst f USING (digest))
SELECT source, status, CAST(COUNT(*) AS BIGINT) AS n_docs
FROM cls GROUP BY 1, 2 ORDER BY source, status
"""


# Q62 — X20: corpus-df boilerplate token removal; per-doc cleaned
# stream verified by md5 (order-preserving strip).

def q62(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load_table(spark, sf_dir, "documents")
    return (
        text.boilerplate_strip(d, max_df_frac=0.3)
        .select(F.col("id").alias("doc_id"), "n_tokens", "n_kept", "kept_hash")
        .orderBy("doc_id")
    )


Q62_SQL = """
WITH t AS (SELECT doc_id, string_split(text, ' ') AS toks FROM documents),
nn AS (SELECT CAST(COUNT(*) AS DOUBLE) AS n FROM documents),
tok AS (SELECT doc_id, unnest(toks) AS tok FROM t),
dfq AS (SELECT tok, CAST(COUNT(DISTINCT doc_id) AS DOUBLE) AS dfc FROM tok GROUP BY 1),
bl AS (SELECT COALESCE(list(tok), []) AS boiler FROM dfq, nn WHERE dfc > 0.3 * n),
k AS (SELECT doc_id, toks,
             list_filter(toks, x -> NOT list_contains(boiler, x)) AS kept
      FROM t, bl)
SELECT doc_id,
       CAST(len(toks) AS BIGINT) AS n_tokens,
       CAST(len(kept) AS BIGINT) AS n_kept,
       md5(COALESCE(array_to_string(kept, ' '), '')) AS kept_hash
FROM k ORDER BY doc_id
"""


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


Q63_SQL = """
WITH t AS (SELECT doc_id, lang, string_split(text, ' ') AS toks FROM documents),
g AS (SELECT doc_id, lang,
             unnest(list_distinct(list_transform(range(1, len(toks) - 1),
               i -> md5(toks[i] || ' ' || toks[i+1] || ' ' || toks[i+2])))) AS gram
      FROM t WHERE len(toks) >= 3),
dfq AS (SELECT gram, COUNT(*) AS dfc FROM g GROUP BY 1),
per AS (SELECT doc_id, lang,
               CAST(COUNT(*) AS BIGINT) AS n_grams,
               CAST(SUM(CASE WHEN dfc = 1 THEN 1 ELSE 0 END) AS BIGINT) AS n_singleton
        FROM g JOIN dfq USING (gram) GROUP BY 1, 2),
banded AS (
  SELECT lang, n_grams, n_singleton,
         CASE WHEN n_singleton / CAST(n_grams AS DOUBLE) >= 0.5 THEN 'high'
              WHEN n_singleton / CAST(n_grams AS DOUBLE) >= 0.2 THEN 'medium'
              ELSE 'low' END AS band
  FROM per)
SELECT lang, band,
       CAST(COUNT(*) AS BIGINT) AS n_docs,
       CAST(SUM(n_grams) AS BIGINT) AS n_grams,
       CAST(SUM(n_singleton) AS BIGINT) AS n_singleton
FROM banded GROUP BY 1, 2 ORDER BY lang, band
"""


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


Q64_SQL = """
WITH e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
n AS (SELECT vec_id, v, sqrt(list_inner_product(v, v)) AS nrm FROM e),
c AS (SELECT vec_id AS c_id, v AS ce, nrm AS cen FROM n WHERE vec_id < 8),
asg AS (SELECT vec_id, c_id,
               ROW_NUMBER() OVER (PARTITION BY vec_id
                 ORDER BY ROUND(list_inner_product(v, ce) / (nrm * cen), 6) DESC,
                          c_id) AS rn
        FROM n, c),
a AS (SELECT vec_id, c_id AS assigned FROM asg WHERE rn = 1)
SELECT assigned, lang,
       CAST(COUNT(*) AS BIGINT) AS n_docs,
       CAST(SUM(n_chars) AS BIGINT) AS total_chars
FROM a JOIN documents d ON a.vec_id = d.doc_id
GROUP BY 1, 2 ORDER BY assigned, lang
"""


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


Q65_SQL = f"""
WITH e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
n AS (SELECT vec_id, v, sqrt(list_inner_product(v, v)) AS nrm FROM e),
c AS (SELECT vec_id AS c_id, v AS ce, nrm AS cen FROM n WHERE vec_id < 8),
asg AS (SELECT vec_id, c_id,
               ROW_NUMBER() OVER (PARTITION BY vec_id
                 ORDER BY ROUND(list_inner_product(v, ce) / (nrm * cen), 6) DESC,
                          c_id) AS rn
        FROM n, c),
a AS (SELECT vec_id, c_id AS assigned FROM asg WHERE rn = 1),
s AS (
  SELECT doc_id, string_split(lower(text), ' ') AS lt,
         string_split(text, ' ') AS toks, text
  FROM documents),
g AS (
  SELECT doc_id, len(toks) AS n_tok,
         len(list_filter(lt, t -> t IN
           ('the','a','of','and','to','in','is','it','that','for'))) AS n_stop,
         length(regexp_replace(text, '[^\\.,;:!\\?]', '', 'g')) AS n_punct,
         length(text) AS n_char
  FROM s),
v AS (
  SELECT doc_id,
         (least(n_tok / 100.0, 1.0)
          + least(n_stop / greatest(n_tok, 1) * 5.0, 1.0)
          + greatest(1.0 - n_punct / greatest(n_char, 1) * 5.0, 0.0)) / 3.0 AS q
  FROM g),
r AS (SELECT assigned, doc_id, q,
             CAST(ROW_NUMBER() OVER (PARTITION BY assigned
                   ORDER BY q DESC, doc_id) AS INTEGER) AS rnk
      FROM v JOIN a ON v.doc_id = a.vec_id)
SELECT assigned, rnk, doc_id, {_dec4('q')} AS quality
FROM r WHERE rnk <= 3 ORDER BY assigned, rnk
"""


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


Q66_SQL = """
WITH t AS (SELECT doc_id, string_split(text, ' ') AS toks FROM documents),
g AS (SELECT doc_id,
             unnest(list_distinct(list_transform(range(1, len(toks) - 3),
               i -> toks[i] || ' ' || toks[i+1] || ' ' || toks[i+2] || ' '
                    || toks[i+3] || ' ' || toks[i+4]))) AS gram
      FROM t WHERE len(toks) >= 5)
SELECT MIN(gram) AS gram,
       CAST(COUNT(*) AS BIGINT) AS df,
       MIN(doc_id) AS first_doc
FROM g GROUP BY md5(gram)
ORDER BY df DESC, gram ASC LIMIT 20
"""


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
    raw = (
        d.withColumn("__toks", F.split(F.col("text"), " "))
        .withColumn("n_tok", F.size("__toks"))
        .withColumn("digest", F.md5("text"))
        .withColumn(
            "sig",
            F.coalesce(
                F.array_min(
                    F.transform(dedup.shingles_of(F.col("__toks"), 3), F.md5)
                ),
                F.col("digest"),
            ),
        )
        .withColumn("__q", text.quality_score())
    )
    w_digest = Window.partitionBy("digest")
    w_sig = Window.partitionBy("sig")
    flags = (
        raw.withColumn(
            "keep_exact", F.col("doc_id") == F.min("doc_id").over(w_digest)
        )
        .withColumn(
            "keep_nd",
            F.col("keep_exact")
            & (
                F.col("doc_id")
                == F.min(F.when(F.col("keep_exact"), F.col("doc_id"))).over(w_sig)
            ),
        )
        .withColumn("keep_q", F.col("keep_nd") & (F.col("__q") >= 0.5))
    )
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


Q67_SQL = """
WITH raw AS (
  SELECT doc_id, text, string_split(text, ' ') AS toks,
         string_split(lower(text), ' ') AS lt,
         len(string_split(text, ' ')) AS n_tok,
         md5(text) AS digest
  FROM documents),
sg AS (
  SELECT *,
         COALESCE(list_min(list_transform(range(1, len(toks) - 1),
           i -> md5(toks[i] || ' ' || toks[i+1] || ' ' || toks[i+2]))),
           digest) AS sig,
         (least(n_tok / 100.0, 1.0)
          + least(len(list_filter(lt, t -> t IN
              ('the','a','of','and','to','in','is','it','that','for')))
            / greatest(n_tok, 1) * 5.0, 1.0)
          + greatest(1.0 - length(regexp_replace(text, '[^\\.,;:!\\?]', '', 'g'))
            / greatest(length(text), 1) * 5.0, 0.0)) / 3.0 AS q
  FROM raw),
e AS (
  SELECT *, doc_id = MIN(doc_id) OVER (PARTITION BY digest) AS keep_exact
  FROM sg),
nd AS (
  SELECT *,
         keep_exact AND doc_id = MIN(CASE WHEN keep_exact THEN doc_id END)
           OVER (PARTITION BY sig) AS keep_nd
  FROM e),
fl AS (SELECT *, keep_nd AND q >= 0.5 AS keep_q FROM nd),
agg AS (
  SELECT CAST(COUNT(*) AS BIGINT) AS n1, CAST(SUM(n_tok) AS BIGINT) AS t1,
         CAST(SUM(CASE WHEN keep_exact THEN 1 ELSE 0 END) AS BIGINT) AS n2,
         CAST(SUM(CASE WHEN keep_exact THEN n_tok ELSE 0 END) AS BIGINT) AS t2,
         CAST(SUM(CASE WHEN keep_nd THEN 1 ELSE 0 END) AS BIGINT) AS n3,
         CAST(SUM(CASE WHEN keep_nd THEN n_tok ELSE 0 END) AS BIGINT) AS t3,
         CAST(SUM(CASE WHEN keep_q THEN 1 ELSE 0 END) AS BIGINT) AS n4,
         CAST(SUM(CASE WHEN keep_q THEN n_tok ELSE 0 END) AS BIGINT) AS t4
  FROM fl)
SELECT 1 AS stage_order, 'raw' AS stage, n1 AS n_docs, t1 AS n_tokens FROM agg
UNION ALL SELECT 2, 'exact_dedup', n2, t2 FROM agg
UNION ALL SELECT 3, 'near_dedup', n3, t3 FROM agg
UNION ALL SELECT 4, 'quality', n4, t4 FROM agg
ORDER BY stage_order
"""


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


Q69_SQL = """
WITH toks AS (
  SELECT doc_id, unnest(string_split(text, ' ')) AS tok
  FROM documents),
vocab AS (
  SELECT tok FROM (
    SELECT tok, count(*) AS freq FROM toks GROUP BY tok
  ) ORDER BY freq DESC, tok ASC LIMIT 1000),
cov AS (
  SELECT t.doc_id,
         CAST(count(*) AS BIGINT) AS n_tokens,
         CAST(sum(CASE WHEN v.tok IS NULL THEN 1 ELSE 0 END) AS BIGINT)
           AS n_oov
  FROM toks t LEFT JOIN vocab v USING (tok)
  GROUP BY t.doc_id)
SELECT d.source, d.lang,
       CAST(count(*) AS BIGINT) AS n_docs,
       CAST(sum(c.n_oov) AS BIGINT) AS n_oov,
       CAST(sum(c.n_tokens) AS BIGINT) AS n_tokens,
       round(avg(c.n_oov * 1.0 / c.n_tokens), 4) AS avg_oov_rate
FROM documents d JOIN cov c ON d.doc_id = c.doc_id
GROUP BY d.source, d.lang
ORDER BY d.source, d.lang
"""


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


Q71_SQL = """
WITH e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
n AS (
  SELECT vec_id,
         list_transform(v, x -> x / (CASE WHEN sqrt(list_inner_product(v, v)) = 0
                                          THEN 1 ELSE sqrt(list_inner_product(v, v)) END)) AS u
  FROM e),
cb AS (
  SELECT s.s, c.c,
         list_transform(range(1, 17),
           j -> CAST(('0x' || substr(md5(s.s || '-' || c.c || '-' || (j - 1)), 1, 4)) AS BIGINT)
                / 65535.0 * 2 - 1) AS cv
  FROM range(4) s(s), range(4) c(c)),
sub AS (
  SELECT vec_id, s.s, list_slice(u, s.s * 16 + 1, s.s * 16 + 16) AS sv
  FROM n, range(4) s(s)),
enc AS (
  SELECT vec_id, s, c,
         ROW_NUMBER() OVER (PARTITION BY vec_id, s
           ORDER BY round(list_inner_product(sv, sv)
                          - 2 * list_inner_product(sv, cv)
                          + list_inner_product(cv, cv), 9) ASC, c ASC) AS rn
  FROM sub JOIN cb USING (s)),
codes AS (SELECT vec_id, s, c FROM enc WHERE rn = 1),
q AS (SELECT vec_id AS q_id, u AS qu FROM n WHERE vec_id < 10),
qsub AS (
  SELECT q_id, s.s, list_slice(qu, s.s * 16 + 1, s.s * 16 + 16) AS qv
  FROM q, range(4) s(s)),
dtab AS (
  SELECT q_id, s, c,
         list_inner_product(qv, qv) - 2 * list_inner_product(qv, cv)
           + list_inner_product(cv, cv) AS pd
  FROM qsub JOIN cb USING (s)),
adc AS (
  SELECT d.q_id, codes.vec_id AS neighbor_id, round(SUM(d.pd), 6) AS adc_dist
  FROM codes JOIN dtab d ON codes.s = d.s AND codes.c = d.c
  WHERE codes.vec_id <> d.q_id
  GROUP BY d.q_id, codes.vec_id),
r AS (
  SELECT q_id, neighbor_id, adc_dist,
         CAST(ROW_NUMBER() OVER (PARTITION BY q_id
           ORDER BY adc_dist ASC, neighbor_id ASC) AS INTEGER) AS rank
  FROM adc)
SELECT q_id, neighbor_id, adc_dist, rank FROM r WHERE rank <= 5
ORDER BY q_id, rank
"""


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


Q72_SQL = """
WITH e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
n AS (
  SELECT vec_id,
         list_transform(v, x -> x / (CASE WHEN sqrt(list_inner_product(v, v)) = 0
                                          THEN 1 ELSE sqrt(list_inner_product(v, v)) END)) AS u
  FROM e),
cb AS (
  SELECT s.s, c.c,
         list_transform(range(1, 17),
           j -> CAST(('0x' || substr(md5(s.s || '-' || c.c || '-' || (j - 1)), 1, 4)) AS BIGINT)
                / 65535.0 * 2 - 1) AS cv
  FROM range(4) s(s), range(4) c(c)),
sub AS (
  SELECT vec_id, s.s, list_slice(u, s.s * 16 + 1, s.s * 16 + 16) AS sv
  FROM n, range(4) s(s)),
enc AS (
  SELECT vec_id, s, c,
         ROW_NUMBER() OVER (PARTITION BY vec_id, s
           ORDER BY round(list_inner_product(sv, sv)
                          - 2 * list_inner_product(sv, cv)
                          + list_inner_product(cv, cv), 9) ASC, c ASC) AS rn
  FROM sub JOIN cb USING (s)),
piv AS (
  SELECT vec_id,
         CAST(MAX(CASE WHEN s = 0 THEN c END) AS INTEGER) AS c0,
         CAST(MAX(CASE WHEN s = 1 THEN c END) AS INTEGER) AS c1,
         CAST(MAX(CASE WHEN s = 2 THEN c END) AS INTEGER) AS c2,
         CAST(MAX(CASE WHEN s = 3 THEN c END) AS INTEGER) AS c3
  FROM enc WHERE rn = 1 GROUP BY vec_id)
SELECT c0, c1, c2, c3, MIN(vec_id) AS keep_id,
       CAST(COUNT(*) AS BIGINT) AS n_members
FROM piv GROUP BY c0, c1, c2, c3
ORDER BY keep_id
"""


# Q73 — embedding-cosine near-dup PAIRS via banded SRP LSH (X32): the
# sub-quadratic candidate path of the q28 exact baseline. 24 md5-sign
# planes split into 8 bands of 3 bits (measured ~0.9 recall at tau=0.4
# on every SF; r=4 bands measured 0.39-0.56 — too selective for this
# threshold's 66-degree angle); agree-on-a-band => candidate;
# exact-cosine verify at the shared 4-decimal rounding so the output is
# a strict subset of q28's pairs (recall asserted vs exact in pytest).

_PLANES24 = similarity.md5_sign_planes(n_planes=24, dim=64)


def q73(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = load_table(spark, sf_dir, "embeddings")
    return (
        similarity.near_dup_pairs_lsh(
            e, _PLANES24, n_bands=8, threshold=0.4, vectorized=True
        )
        .withColumn("cosine", F.col("cosine").cast("string"))
        .orderBy("id_a", "id_b")
    )


Q73_SQL = f"""
WITH pl AS (SELECT {_planes_sql_literal(_PLANES24)} AS planes),
e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
n AS (SELECT vec_id, v, sqrt(list_inner_product(v, v)) AS nrm FROM e),
sig AS (
  SELECT vec_id, b.band,
         CAST(list_sum(list_transform(range(3), p ->
           CASE WHEN ROUND(list_inner_product(v, planes[b.band * 3 + p + 1]), 6) > 0
                THEN 1 << p ELSE 0 END)) AS INTEGER) AS bucket
  FROM e, pl, range(8) b(band)),
cand AS (
  SELECT DISTINCT a.vec_id AS id_a, b.vec_id AS id_b
  FROM sig a JOIN sig b
    ON a.band = b.band AND a.bucket = b.bucket AND a.vec_id < b.vec_id),
v AS (
  SELECT id_a, id_b,
         CAST(ROUND(list_inner_product(na.v, nb.v) / (na.nrm * nb.nrm), 4)
              AS DECIMAL(38,4)) AS cosine
  FROM cand JOIN n na ON na.vec_id = id_a JOIN n nb ON nb.vec_id = id_b)
SELECT id_a, id_b, CAST(cosine AS VARCHAR) AS cosine
FROM v WHERE cosine >= 0.4
ORDER BY id_a, id_b
"""


# Q74 — X34: token-window chunking (64-token chunks, 16-token overlap,
# stride 48). Row-local sequence/explode — no shuffle; the final chunk
# runs short rather than dropping tail tokens.

def q74(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load_table(spark, sf_dir, "documents")
    return text.chunk_tokens(d, chunk=64, overlap=16).orderBy("doc_id", "chunk_idx")


Q74_SQL = """
WITH t AS (
  SELECT doc_id, string_split(text, ' ') AS toks,
         len(string_split(text, ' ')) AS n
  FROM documents),
s AS (
  SELECT doc_id, toks, n,
         CAST(unnest(range(0, GREATEST(n - 16, 1), 48)) AS INTEGER) AS start
  FROM t WHERE n > 0)
SELECT doc_id,
       CAST(start // 48 AS INTEGER) AS chunk_idx,
       CAST(LEAST(64, n - start) AS BIGINT) AS n_tokens,
       array_to_string(list_slice(toks, start + 1, start + 64), ' ') AS chunk_text
FROM s ORDER BY doc_id, chunk_idx
"""


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


Q75_SQL = f"""
WITH toks AS (
  SELECT doc_id, unnest(string_split(text, ' ')) AS tok FROM documents),
freq AS (SELECT tok, count(*) AS freq FROM toks GROUP BY tok),
tot AS (SELECT CAST(sum(freq) AS DOUBLE) AS total FROM freq),
vocab AS (SELECT tok, freq FROM freq ORDER BY freq DESC, tok ASC LIMIT 1000),
sc AS (
  SELECT t.doc_id,
         CAST(count(*) AS BIGINT) AS n_tokens,
         CAST(sum(CASE WHEN v.tok IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_oov,
         avg(-ln(COALESCE(CAST(v.freq AS DOUBLE), 1.0) / tot.total)) AS logloss
  FROM toks t LEFT JOIN vocab v USING (tok), tot
  GROUP BY t.doc_id)
SELECT d.doc_id, d.lang, sc.n_tokens, sc.n_oov,
       {_dec4('sc.logloss')} AS logloss
FROM documents d JOIN sc USING (doc_id) ORDER BY d.doc_id
"""


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


Q76_SQL = """
SELECT CASE WHEN substr(md5(source), 1, 1) < 'c' THEN 'train'
            WHEN substr(md5(source), 1, 1) < 'e' THEN 'val'
            ELSE 'test' END AS split,
       CAST(count(*) AS BIGINT) AS n_docs,
       CAST(count(DISTINCT source) AS BIGINT) AS n_domains,
       CAST(sum(len(string_split(text, ' '))) AS BIGINT) AS total_tokens
FROM documents GROUP BY 1 ORDER BY split
"""


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


Q77_SQL = f"""
WITH toks AS (
  SELECT doc_id, CAST(lang = 'en' AS INTEGER) AS is_t,
         CAST(('0x' || substr(md5(unnest(string_split(text, ' '))), 1, 15))
              AS BIGINT) % 1024 AS b
  FROM documents),
counts AS (
  SELECT b, count(*) AS c_all, sum(is_t) AS c_t FROM toks GROUP BY b),
tot AS (
  SELECT CAST(sum(c_all) AS DOUBLE) AS t_all,
         CAST(sum(c_t) AS DOUBLE) AS t_t FROM counts),
sc AS (
  SELECT t.doc_id,
         CAST(count(*) AS BIGINT) AS n_tokens,
         sum(ln((c.c_t + 1.0) / (tot.t_t + 1024))
             - ln((c.c_all + 1.0) / (tot.t_all + 1024))) AS log_ratio
  FROM toks t JOIN counts c USING (b), tot
  GROUP BY t.doc_id)
SELECT d.doc_id, d.lang, sc.n_tokens, {_dec4('sc.log_ratio')} AS log_ratio
FROM documents d JOIN sc USING (doc_id) ORDER BY d.doc_id
"""


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


Q78_SQL = f"""
WITH t AS (
  SELECT string_split(text, ' ') AS toks FROM documents
  WHERE len(string_split(text, ' ')) >= 2),
p AS (
  SELECT unnest(list_zip(toks[1:len(toks)-1], toks[2:len(toks)])) AS z FROM t),
c AS (
  SELECT z[1] AS tok_a, z[2] AS tok_b, CAST(count(*) AS BIGINT) AS pair_count
  FROM p GROUP BY 1, 2),
w AS (
  SELECT tok_a, tok_b, pair_count,
         CAST(sum(pair_count) OVER (PARTITION BY tok_a) AS BIGINT) AS left_count
  FROM c)
SELECT tok_a, tok_b, pair_count, left_count,
       {_dec4('CAST(pair_count AS DOUBLE) / CAST(left_count AS DOUBLE)')} AS cond_prob
FROM w ORDER BY pair_count DESC, tok_a, tok_b LIMIT 25
"""


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


_QC_FEATS = """
  SELECT source,
         len(string_split(text, ' ')) AS n_tok,
         CAST(list_sum(list_transform(string_split(lower(text), ' '),
              t -> CASE WHEN t IN ('the','a','of','and','to','in','is','it',
                                   'that','for') THEN 1 ELSE 0 END)) AS DOUBLE)
           / GREATEST(len(string_split(lower(text), ' ')), 1) AS stop_ratio,
         CAST(length(regexp_replace(text, '[^\\.,;:!\\?]', '', 'g')) AS DOUBLE)
           / GREATEST(length(text), 1) AS punct_ratio,
         CAST(length(regexp_replace(text, '[^0-9]', '', 'g')) AS DOUBLE)
           / GREATEST(length(text), 1) AS digit_ratio,
         CAST(length(text) - (len(string_split(text, ' ')) - 1) AS DOUBLE)
           / len(string_split(text, ' ')) AS mean_tok_len
  FROM documents"""

Q79_SQL = f"""
WITH f AS ({_QC_FEATS}),
s AS (
  SELECT source,
         1.0 / (1.0 + exp(-(-2.0 + 0.6 * ln(CAST(n_tok AS DOUBLE) + 1.0)
                            + 4.0 * stop_ratio - 6.0 * punct_ratio
                            - 3.0 * digit_ratio - 0.1 * mean_tok_len))) AS score
  FROM f),
v AS (
  SELECT source, score,
         CASE WHEN score < 0.4 THEN 'drop'
              WHEN score <= 0.6 THEN 'review'
              ELSE 'keep' END AS verdict
  FROM s)
SELECT source, verdict, CAST(count(*) AS BIGINT) AS n_docs,
       {_dec4('avg(score)')} AS avg_score
FROM v GROUP BY source, verdict ORDER BY source, verdict
"""


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


Q80_SQL = f"""
WITH toks AS (
  SELECT doc_id, unnest(string_split(text, ' ')) AS tok FROM documents),
freq AS (SELECT tok, count(*) AS freq FROM toks GROUP BY tok),
tot AS (SELECT CAST(sum(freq) AS DOUBLE) AS total FROM freq),
vocab AS (SELECT tok, freq FROM freq ORDER BY freq DESC, tok ASC LIMIT 1000),
sc AS (
  SELECT t.doc_id,
         CAST(count(*) AS BIGINT) AS n_tokens,
         avg(-ln(COALESCE(CAST(v.freq AS DOUBLE), 1.0) / tot.total)) AS logloss
  FROM toks t LEFT JOIN vocab v USING (tok), tot
  GROUP BY t.doc_id),
g AS (
  SELECT doc_id, n_tokens, logloss,
         CASE WHEN logloss < 3.40 THEN 'low'
              WHEN logloss < 3.41 THEN 'mid'
              ELSE 'high' END AS bucket
  FROM sc),
k AS (
  SELECT bucket, n_tokens,
         (CAST(('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 15)) AS BIGINT)
            / 1152921504606846976.0)
           < (CASE bucket WHEN 'low' THEN 1.0 WHEN 'mid' THEN 0.5
                          ELSE 0.1 END) AS keep
  FROM g)
SELECT bucket, CAST(count(*) AS BIGINT) AS n_docs,
       CAST(sum(CASE WHEN keep THEN 1 ELSE 0 END) AS BIGINT) AS n_kept,
       {_dec4('avg(CASE WHEN keep THEN 1.0 ELSE 0.0 END)')} AS kept_rate,
       CAST(sum(CASE WHEN keep THEN n_tokens ELSE 0 END) AS BIGINT) AS kept_tokens
FROM k GROUP BY bucket ORDER BY bucket
"""


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


Q81_SQL = f"""
WITH q AS (
  SELECT source,
         quantile_cont(CAST(n_chars AS DOUBLE), 0.05) AS p_lo,
         quantile_cont(CAST(n_chars AS DOUBLE), 0.95) AS p_hi
  FROM documents GROUP BY source)
SELECT d.source,
       CAST(count(*) AS BIGINT) AS n,
       {_dec4('avg(CAST(n_chars AS DOUBLE))')} AS raw_mean,
       {_dec4('avg(LEAST(GREATEST(CAST(n_chars AS DOUBLE), p_lo), p_hi))')} AS win_mean,
       {_dec4('min(p_lo)')} AS p_lo,
       {_dec4('min(p_hi)')} AS p_hi,
       CAST(sum(CASE WHEN CAST(n_chars AS DOUBLE) < p_lo
                       OR CAST(n_chars AS DOUBLE) > p_hi THEN 1 ELSE 0 END)
            AS BIGINT) AS n_clipped
FROM documents d JOIN q USING (source)
GROUP BY d.source ORDER BY d.source
"""


# Q82 — X42: duplicated-span detection — maximal runs of corpus-
# duplicated 5-gram positions merged into token spans per doc
# (gaps-and-islands over the positional gram hits).

def q82(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load_table(spark, sf_dir, "documents")
    return dedup.duplicated_spans(d, k=5).orderBy("doc_id", "span_start")


Q82_SQL = """
WITH t AS (SELECT doc_id, string_split(text, ' ') AS toks FROM documents),
g AS (
  SELECT doc_id, CAST(i - 1 AS INTEGER) AS pos,
         CAST(('0x' || substr(md5(toks[i] || ' ' || toks[i+1] || ' ' ||
               toks[i+2] || ' ' || toks[i+3] || ' ' || toks[i+4]), 1, 15))
              AS BIGINT) AS gram
  FROM t, unnest(range(1, len(toks) - 3)) AS u(i)
  WHERE len(toks) >= 5),
f AS (SELECT gram FROM g GROUP BY gram HAVING count(*) >= 2),
d AS (SELECT g.doc_id, g.pos FROM g JOIN f USING (gram)),
i AS (
  SELECT doc_id, pos,
         CASE WHEN lag(pos) OVER (PARTITION BY doc_id ORDER BY pos) IS NULL
                OR pos - lag(pos) OVER (PARTITION BY doc_id ORDER BY pos) > 4
              THEN 1 ELSE 0 END AS new_isl
  FROM d),
s AS (
  SELECT doc_id, pos,
         sum(new_isl) OVER (PARTITION BY doc_id ORDER BY pos) AS isl
  FROM i)
SELECT doc_id,
       CAST(min(pos) AS BIGINT) AS span_start,
       CAST(max(pos) + 4 AS BIGINT) AS span_end,
       CAST(max(pos) + 4 - min(pos) + 1 AS BIGINT) AS n_tokens,
       CAST(count(*) AS BIGINT) AS n_grams
FROM s GROUP BY doc_id, isl ORDER BY doc_id, span_start
"""


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


Q83_SQL = f"""
WITH dl AS (
  SELECT doc_id, CAST(len(string_split(text, ' ')) AS DOUBLE) AS dl
  FROM documents),
stats AS (
  SELECT CAST(count(*) AS DOUBLE) AS n, avg(dl) AS avgdl FROM dl),
tf AS (
  SELECT doc_id, tok, CAST(count(*) AS DOUBLE) AS tf
  FROM (SELECT doc_id, unnest(string_split(text, ' ')) AS tok FROM documents)
  WHERE tok IN ('vector', 'hash', 'merge')
  GROUP BY doc_id, tok),
df AS (SELECT tok, CAST(count(*) AS DOUBLE) AS df FROM tf GROUP BY tok),
sc AS (
  SELECT tf.doc_id,
         CAST(count(*) AS BIGINT) AS n_matched,
         sum(ln(1.0 + (stats.n - df.df + 0.5) / (df.df + 0.5))
             * tf.tf * 2.2
             / (tf.tf + 1.2 * (0.25 + 0.75 * dl.dl / stats.avgdl))) AS score
  FROM tf JOIN df USING (tok) JOIN dl USING (doc_id), stats
  GROUP BY tf.doc_id)
SELECT doc_id, n_matched, {_dec4('score')} AS score
FROM sc ORDER BY score DESC, doc_id LIMIT 15
"""


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


Q84_SQL = f"""
WITH toks AS (
  SELECT source, unnest(string_split(text, ' ')) AS tok FROM documents),
freq AS (SELECT tok, count(*) AS cf FROM toks GROUP BY tok),
vocab AS (SELECT tok FROM freq ORDER BY cf DESC, tok ASC LIMIT 1000),
b AS (
  SELECT source,
         CASE WHEN v.tok IS NULL THEN '__oov__' ELSE t.tok END AS tok
  FROM toks t LEFT JOIN vocab v USING (tok)),
corpus AS (SELECT tok, count(*) AS cq FROM b GROUP BY tok),
ctot AS (SELECT CAST(sum(cq) AS DOUBLE) AS tq FROM corpus),
gc AS (SELECT source, tok, count(*) AS cp FROM b GROUP BY source, tok),
gtot AS (SELECT source, CAST(sum(cp) AS DOUBLE) AS tp FROM gc GROUP BY source),
agg AS (
  SELECT gc.source,
         CAST(sum(gc.cp) AS BIGINT) AS n_tokens,
         sum(0.5 * (gc.cp / gtot.tp)
               * ln((gc.cp / gtot.tp)
                    / ((gc.cp / gtot.tp + corpus.cq / ctot.tq) / 2))
             + 0.5 * (corpus.cq / ctot.tq)
               * ln((corpus.cq / ctot.tq)
                    / ((gc.cp / gtot.tp + corpus.cq / ctot.tq) / 2))) AS jsd_p,
         sum(corpus.cq / ctot.tq) AS q_present
  FROM gc JOIN corpus USING (tok) JOIN gtot USING (source), ctot
  GROUP BY gc.source)
SELECT source, n_tokens,
       {_dec4('jsd_p + (1.0 - q_present) * 0.5 * ln(2.0)')} AS jsd
FROM agg ORDER BY source
"""


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


Q86_SQL = """
WITH w AS (
  SELECT w, count(*) AS wc
  FROM (SELECT unnest(string_split(text, ' ')) AS w FROM documents)
  WHERE length(w) >= 2 GROUP BY w),
s AS (
  SELECT wc, list_transform(range(1, length(w) + 1),
                            i -> substr(w, CAST(i AS INTEGER), 1)) AS sym
  FROM w),
p AS (
  SELECT wc, unnest(list_zip(sym[1:len(sym)-1], sym[2:len(sym)])) AS z
  FROM s),
c AS (
  SELECT z[1] AS "left", z[2] AS "right", CAST(sum(wc) AS BIGINT) AS pair_count
  FROM p GROUP BY 1, 2)
SELECT "left", "right", pair_count
FROM c ORDER BY pair_count DESC, "left", "right" LIMIT 20
"""


# Q87 — X46: cross-split leakage audit — distinct 13-grams shared
# between each pair of the X36 md5-keyed splits.

def q87(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load_table(spark, sf_dir, "documents")
    return dedup.split_gram_overlap(
        d, split_col=skew.hash_split("source"), k=13
    ).orderBy("split_a", "split_b")


_G13 = " || ' ' || ".join(f"toks[i+{j}]" for j in range(13))

Q87_SQL = f"""
WITH t AS (SELECT source, string_split(text, ' ') AS toks FROM documents),
g AS (
  SELECT DISTINCT
         CASE WHEN substr(md5(source), 1, 1) < 'c' THEN 'train'
              WHEN substr(md5(source), 1, 1) < 'e' THEN 'val'
              ELSE 'test' END AS split,
         CAST(('0x' || substr(md5({_G13}), 1, 15)) AS BIGINT) AS gram
  FROM t, unnest(range(1, len(toks) - 11)) AS u(i)
  WHERE len(toks) >= 13)
SELECT a.split AS split_a, b.split AS split_b,
       CAST(count(*) AS BIGINT) AS n_shared_grams
FROM g a JOIN g b USING (gram)
WHERE a.split < b.split
GROUP BY a.split, b.split
ORDER BY split_a, split_b
"""


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


Q88_SQL = """
WITH e AS (SELECT vec_id, label, CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
n AS (SELECT vec_id, label, v, sqrt(list_inner_product(v, v)) AS nrm FROM e),
q AS (SELECT vec_id AS q_id, label AS q_label, v AS qv, nrm AS qn
      FROM n WHERE vec_id % 125 = 0),
p AS (SELECT q_id, q_label, vec_id AS neighbor_id, label AS n_label,
             CAST(ROUND(list_inner_product(qv, v) / (qn * nrm), 4)
                  AS DECIMAL(38,4)) AS cosine
      FROM q, n WHERE vec_id <> q_id AND label <> q_label),
r AS (SELECT *, CAST(ROW_NUMBER() OVER (PARTITION BY q_id
             ORDER BY cosine DESC, neighbor_id) AS INTEGER) AS rank
      FROM p)
SELECT q_id, q_label, neighbor_id, n_label,
       CAST(cosine AS VARCHAR) AS cosine, rank
FROM r WHERE rank <= 5 ORDER BY q_id, rank
"""


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


_CMS_BUCKET = (
    "CAST(('0x' || substr(md5(CAST({j} AS VARCHAR) || ':' || tok), 1, 15)) "
    "AS BIGINT) % 1024"
)

Q89_SQL = f"""
WITH toks AS (
  SELECT unnest(string_split(text, ' ')) AS tok FROM documents),
exact AS (
  SELECT tok, CAST(count(*) AS BIGINT) AS exact_count FROM toks GROUP BY tok),
top AS (
  SELECT tok, exact_count FROM exact
  ORDER BY exact_count DESC, tok ASC LIMIT 20),
pairs AS (
  SELECT tok, j, CASE j
      WHEN 0 THEN {_CMS_BUCKET.format(j=0)}
      WHEN 1 THEN {_CMS_BUCKET.format(j=1)}
      WHEN 2 THEN {_CMS_BUCKET.format(j=2)}
      ELSE {_CMS_BUCKET.format(j=3)} END AS bucket
  FROM toks, range(4) r(j)),
sketch AS (
  SELECT j, bucket, CAST(count(*) AS BIGINT) AS c
  FROM pairs GROUP BY j, bucket),
cand AS (
  SELECT tok, j, CASE j
      WHEN 0 THEN {_CMS_BUCKET.format(j=0)}
      WHEN 1 THEN {_CMS_BUCKET.format(j=1)}
      WHEN 2 THEN {_CMS_BUCKET.format(j=2)}
      ELSE {_CMS_BUCKET.format(j=3)} END AS bucket
  FROM top, range(4) r(j)),
est AS (
  SELECT cand.tok, CAST(min(sketch.c) AS BIGINT) AS cms_est
  FROM cand JOIN sketch USING (j, bucket) GROUP BY cand.tok),
n AS (SELECT CAST(count(*) AS DOUBLE) AS total FROM toks)
SELECT top.tok, top.exact_count, est.cms_est,
       est.cms_est >= top.exact_count AS never_under,
       CAST(est.cms_est AS DOUBLE)
         <= CAST(top.exact_count AS DOUBLE) + 0.0026545720981045362 * n.total
         AS within_eps
FROM top JOIN est USING (tok), n
ORDER BY top.exact_count DESC, top.tok
"""


# Q90 — X51: JL random projection — exact top-5 cosine neighbors in
# the 16-dim projected space (md5 sign planes, 1/sqrt(16)=0.25 exact
# scale) for the q23 query set; recall vs the 64-dim exact ranking is
# pytest-asserted, the projected-space ranking itself is hash-verified.

_PLANES_JL = similarity.md5_sign_planes(n_planes=16, dim=64)


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


Q90_SQL = f"""
WITH pl AS (SELECT {_planes_sql_literal(_PLANES_JL)} AS planes),
e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
p AS (
  SELECT vec_id,
         list_transform(range(16), k ->
           ROUND(list_inner_product(v, planes[k + 1]), 6) * 0.25) AS pv
  FROM e, pl),
n AS (SELECT vec_id, pv, sqrt(list_inner_product(pv, pv)) AS nrm FROM p),
q AS (SELECT vec_id AS q_id, pv AS qv, nrm AS qn FROM n WHERE vec_id < 10),
s AS (SELECT q_id, vec_id AS neighbor_id,
             CAST(ROUND(list_inner_product(qv, pv) / (qn * nrm), 4)
                  AS DECIMAL(38,4)) AS cosine
      FROM q, n WHERE vec_id <> q_id),
r AS (SELECT *, CAST(ROW_NUMBER() OVER (PARTITION BY q_id
             ORDER BY cosine DESC, neighbor_id) AS INTEGER) AS rank
      FROM s)
SELECT q_id, neighbor_id, CAST(cosine AS VARCHAR) AS cosine, rank
FROM r WHERE rank <= 5 ORDER BY q_id, rank
"""


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


Q91_SQL = f"""
WITH st AS (
  SELECT source, CAST(count(*) AS DOUBLE) AS n,
         COALESCE(stddev_samp(CAST(n_chars AS DOUBLE)), 0.0) AS sd
  FROM documents GROUP BY source),
tot AS (SELECT sum(n * sd) AS t, sum(n) AS nt FROM st),
alloc AS (
  SELECT source, n, sd,
         (CASE WHEN tot.t > 0 THEN n * sd / tot.t ELSE n / tot.nt END)
           * 100.0 AS alloc
  FROM st, tot),
sel AS (
  SELECT d.source,
         CASE WHEN (CAST(('0x' || substr(md5(CAST(d.doc_id AS VARCHAR)), 1, 15))
                         AS BIGINT) / 1152921504606846976.0)
                   < a.alloc / a.n
              THEN 1 ELSE 0 END AS keep
  FROM documents d JOIN alloc a USING (source))
SELECT a.source,
       CAST(a.n AS BIGINT) AS n_docs,
       {_dec4('a.sd')} AS sd,
       {_dec4('a.alloc')} AS alloc,
       CAST((SELECT sum(keep) FROM sel WHERE sel.source = a.source) AS BIGINT)
         AS n_sampled
FROM alloc a ORDER BY a.source
"""


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


Q92_SQL = f"""
WITH d AS (
  SELECT event_type AS g,
         CAST(floor(epoch(ts)) AS DOUBLE) AS x,
         CAST(value AS DOUBLE) AS y
  FROM events),
m AS (SELECT g, avg(x) AS mx, avg(y) AS my FROM d GROUP BY g),
mom AS (
  SELECT d.g, CAST(count(*) AS BIGINT) AS n,
         sum((x - mx) * (y - my)) AS sxy,
         sum(pow(x - mx, 2)) AS sxx,
         sum(pow(y - my, 2)) AS syy,
         min(mx) AS mx, min(my) AS my
  FROM d JOIN m USING (g) GROUP BY d.g),
fit AS (
  SELECT g, n,
         CASE WHEN sxx > 0 THEN sxy / sxx ELSE 0.0 END AS slope,
         my - (CASE WHEN sxx > 0 THEN sxy / sxx ELSE 0.0 END) * mx AS intercept,
         CASE WHEN sxx > 0 AND syy > 0 THEN pow(sxy, 2) / (sxx * syy)
              ELSE 0.0 END AS r2
  FROM mom)
SELECT g AS event_type, n,
       {_dec4('slope * 3600.0')} AS slope_per_hour,
       {_dec4('intercept')} AS intercept,
       {_dec4('r2')} AS r2
FROM fit ORDER BY event_type
"""


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


Q93_SQL = f"""
WITH w AS (
  SELECT event_id, user_id, ts, value,
         avg(value) OVER win AS bmean,
         stddev_samp(value) OVER win AS bsd,
         count(value) OVER win AS bn
  FROM events
  WINDOW win AS (PARTITION BY user_id ORDER BY ts, event_id
                 ROWS BETWEEN 5 PRECEDING AND 1 PRECEDING)),
z AS (
  SELECT *, (value - bmean) / bsd AS zscore
  FROM w WHERE bn >= 5 AND bsd > 0)
SELECT event_id, user_id, {_fmt('ts')} AS ts,
       {_dec4('value')} AS value,
       {_dec4('bmean')} AS baseline_mean,
       {_dec4('zscore')} AS zscore
FROM z WHERE abs(zscore) > 2.0
ORDER BY user_id, event_id
"""


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


Q94_SQL = f"""
WITH row_rules AS (
  SELECT CAST(count(*) AS BIGINT) AS n,
         CAST(sum(CASE WHEN l_quantity < 1 OR l_quantity > 45 THEN 1 ELSE 0 END)
              AS BIGINT) AS v_qty,
         CAST(sum(CASE WHEN l_discount > 0.08 THEN 1 ELSE 0 END)
              AS BIGINT) AS v_disc,
         CAST(sum(CASE WHEN l_extendedprice <= 0 THEN 1 ELSE 0 END)
              AS BIGINT) AS v_price
  FROM lineitem),
fk AS (
  SELECT CAST(count(*) AS BIGINT) AS v
  FROM lineitem l LEFT JOIN orders o ON l.l_orderkey = o.o_orderkey
  WHERE o.o_orderkey IS NULL),
no AS (SELECT CAST(count(*) AS BIGINT) AS n FROM orders),
pk AS (
  SELECT CAST(COALESCE(sum(c), 0) AS BIGINT) AS v
  FROM (SELECT count(*) AS c FROM orders GROUP BY o_orderkey HAVING count(*) > 1)),
u AS (
  SELECT 'l_quantity_in_1_45' AS rule, n AS n_checked, v_qty AS n_violations
  FROM row_rules
  UNION ALL
  SELECT 'l_discount_le_008', n, v_disc FROM row_rules
  UNION ALL
  SELECT 'extendedprice_positive', n, v_price FROM row_rules
  UNION ALL
  SELECT 'orderkey_fk', row_rules.n, fk.v FROM row_rules, fk
  UNION ALL
  SELECT 'orderkey_pk_unique', no.n, pk.v FROM no, pk)
SELECT rule, n_checked, n_violations,
       {_dec4('CAST(n_violations AS DOUBLE) / n_checked')} AS violation_rate
FROM u ORDER BY rule
"""


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


Q95_SQL = f"""
WITH h AS (
  SELECT user_id, event_id, event_type AS state, ts,
         lead(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS next_ts
  FROM events)
SELECT user_id, event_id, state,
       {_fmt('ts')} AS effective_from,
       {_fmt('next_ts')} AS effective_to,
       next_ts IS NULL AS is_current
FROM h ORDER BY user_id, effective_from, event_id
"""


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


Q96_SQL = """
WITH docs AS (SELECT * FROM documents WHERE doc_id < 500),
toks AS (
  SELECT doc_id, unnest(string_split(text, ' ')) AS tok FROM docs),
tf AS (SELECT doc_id, tok, count(*) AS tf FROM toks GROUP BY 1, 2),
df AS (SELECT tok, count(*) AS df FROM tf GROUP BY tok),
n AS (SELECT CAST(count(*) AS DOUBLE) AS n FROM docs),
w AS (
  SELECT doc_id, tok,
         CAST(tf AS DOUBLE) * ln(1.0 + n.n / CAST(df.df AS DOUBLE)) AS w
  FROM tf JOIN df USING (tok), n),
nrm AS (SELECT doc_id, sqrt(sum(w * w)) AS nrm FROM w GROUP BY doc_id),
u AS (SELECT w.doc_id, tok, w / nrm AS w FROM w JOIN nrm USING (doc_id)),
d AS (
  SELECT a.doc_id AS id_a, b.doc_id AS id_b,
         ROUND(sum(a.w * b.w), 4) AS c
  FROM u a JOIN u b USING (tok)
  WHERE a.doc_id < b.doc_id
  GROUP BY 1, 2)
SELECT id_a, id_b, CAST(CAST(c AS DECIMAL(38,4)) AS VARCHAR) AS cosine
FROM d WHERE c >= 0.9 ORDER BY id_a, id_b
"""


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


Q97_SQL = f"""
WITH d AS (
  SELECT user_id % 65536 AS x,
         LEAST(CAST(floor(value * 655.35) AS BIGINT), 65535) AS y
  FROM events),
z AS (
  SELECT x, y,
         {' + '.join(f"((x >> {i}) & 1) * {1 << (2 * i)} + ((y >> {i}) & 1) * {1 << (2 * i + 1)}" for i in range(16))}
           AS zv
  FROM d)
SELECT CAST(zv >> 28 AS INTEGER) AS cell,
       CAST(count(*) AS BIGINT) AS n_rows,
       min(zv) AS z_min, max(zv) AS z_max,
       min(x) AS x_min, max(x) AS x_max,
       min(y) AS y_min, max(y) AS y_max
FROM z GROUP BY 1 ORDER BY cell
"""


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


Q98_SQL = """
WITH e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
n AS (
  SELECT vec_id,
         list_transform(v, x -> x / (CASE WHEN sqrt(list_inner_product(v, v)) = 0
                                          THEN 1 ELSE sqrt(list_inner_product(v, v)) END)) AS u
  FROM e),
cb AS (
  SELECT s.s, c.c,
         list_transform(range(1, 17),
           j -> CAST(('0x' || substr(md5(s.s || '-' || c.c || '-' || (j - 1)), 1, 4)) AS BIGINT)
                / 65535.0 * 2 - 1) AS cv
  FROM range(4) s(s), range(4) c(c)),
sub AS (
  SELECT vec_id, s.s, list_slice(u, s.s * 16 + 1, s.s * 16 + 16) AS sv
  FROM n, range(4) s(s)),
enc AS (
  SELECT vec_id, s, c,
         ROW_NUMBER() OVER (PARTITION BY vec_id, s
           ORDER BY round(list_inner_product(sv, sv)
                          - 2 * list_inner_product(sv, cv)
                          + list_inner_product(cv, cv), 9) ASC, c ASC) AS rn
  FROM sub JOIN cb USING (s)),
codes AS (SELECT vec_id, s, c FROM enc WHERE rn = 1),
cc AS (
  SELECT a.s, a.c AS ca, b.c AS cb_c,
         list_inner_product(a.cv, a.cv) - 2 * list_inner_product(a.cv, b.cv)
           + list_inner_product(b.cv, b.cv) AS d
  FROM cb a JOIN cb b ON a.s = b.s),
qc AS (SELECT vec_id AS q_id, s, c FROM codes WHERE vec_id < 10),
sdc AS (
  SELECT qc.q_id, c2.vec_id AS neighbor_id, round(sum(cc.d), 6) AS sdc_dist
  FROM qc
  JOIN codes c2 ON qc.s = c2.s AND c2.vec_id <> qc.q_id
  JOIN cc ON cc.s = qc.s AND cc.ca = qc.c AND cc.cb_c = c2.c
  GROUP BY qc.q_id, c2.vec_id),
r AS (
  SELECT q_id, neighbor_id, sdc_dist,
         CAST(ROW_NUMBER() OVER (PARTITION BY q_id
           ORDER BY sdc_dist ASC, neighbor_id ASC) AS INTEGER) AS rank
  FROM sdc)
SELECT q_id, neighbor_id, sdc_dist, rank FROM r WHERE rank <= 3
ORDER BY q_id, rank
"""


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


Q99_SQL = f"""
WITH pl AS (SELECT {_planes_sql_literal(_PLANES_JL)} AS planes),
e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
n AS (SELECT vec_id, v, sqrt(list_inner_product(v, v)) AS nrm FROM e),
tq AS (SELECT vec_id AS q_id, v AS qv, nrm AS qn FROM n WHERE vec_id < 10),
tp AS (SELECT q_id, vec_id AS i,
              CAST(ROUND(list_inner_product(qv, v) / (qn * nrm), 4)
                   AS DECIMAL(38,4)) AS c
       FROM tq, n WHERE vec_id <> q_id),
truth AS (
  SELECT q_id, i FROM (
    SELECT q_id, i, ROW_NUMBER() OVER (PARTITION BY q_id
             ORDER BY c DESC, i) AS rnk FROM tp) WHERE rnk <= 5),
p AS (
  SELECT vec_id,
         list_transform(range(16), k ->
           ROUND(list_inner_product(v, planes[k + 1]), 6) * 0.25) AS pv
  FROM e, pl),
pn AS (SELECT vec_id, pv, sqrt(list_inner_product(pv, pv)) AS nrm FROM p),
pq AS (SELECT vec_id AS q_id, pv AS qv, nrm AS qn FROM pn WHERE vec_id < 10),
pp AS (SELECT q_id, vec_id AS i,
              CAST(ROUND(list_inner_product(qv, pv) / (qn * nrm), 4)
                   AS DECIMAL(38,4)) AS c
       FROM pq, pn WHERE vec_id <> q_id),
pred AS (
  SELECT q_id, i, rnk AS r FROM (
    SELECT q_id, i, ROW_NUMBER() OVER (PARTITION BY q_id
             ORDER BY c DESC, i) AS rnk FROM pp) WHERE rnk <= 5),
nt AS (SELECT q_id, CAST(count(*) AS BIGINT) AS n_truth FROM truth GROUP BY q_id),
j AS (
  SELECT pred.q_id, pred.r,
         CASE WHEN truth.i IS NOT NULL THEN 1 ELSE 0 END AS rel
  FROM pred LEFT JOIN truth ON pred.q_id = truth.q_id AND pred.i = truth.i),
per_q AS (
  SELECT q_id,
         CAST(sum(rel) AS BIGINT) AS hits,
         min(CASE WHEN rel = 1 THEN r END) AS first_rel,
         sum(CASE WHEN rel = 1 THEN 1.0 / (ln(r + 1.0) / ln(2.0))
                  ELSE 0.0 END) AS dcg
  FROM j GROUP BY q_id),
m AS (
  SELECT per_q.q_id, nt.n_truth, per_q.hits,
         CAST(per_q.hits AS DOUBLE) / nt.n_truth AS recall,
         COALESCE(1.0 / first_rel, 0.0) AS mrr,
         dcg / list_sum(list_transform(range(1, LEAST(nt.n_truth, 5) + 1),
                        i -> 1.0 / (ln(i + 1.0) / ln(2.0)))) AS ndcg
  FROM per_q JOIN nt USING (q_id))
SELECT q_id, n_truth, hits, {_dec4('recall')} AS recall,
       {_dec4('mrr')} AS mrr, {_dec4('ndcg')} AS ndcg
FROM m ORDER BY q_id
"""


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


Q100_SQL = f"""
WITH c AS (
  SELECT source, CAST(count(*) AS BIGINT) AS true_count
  FROM documents GROUP BY source),
u AS (
  SELECT source, true_count,
         (CAST(('0x' || substr(md5(source), 1, 15)) AS BIGINT)
            / 1152921504606846976.0) - 0.5 AS cu
  FROM c),
z AS (
  SELECT source, true_count,
         -1.0 * sign(cu) * ln(1.0 - 2.0 * abs(cu)) AS noise
  FROM u)
SELECT source, true_count, {_dec4('noise')} AS noise,
       {_dec4('true_count + noise')} AS noisy_count
FROM z ORDER BY source
"""


# Q101 — X63: ordered-sequence funnel signup -> view -> click ->
# purchase: per-stage user counts where each stage completes AFTER the
# previous one.

def q101(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    f = ev_ops.sequence_funnel(ev, ("signup", "view", "click", "purchase"))
    return f.select(
        "stage_idx", "stage", "n_users", dec4(F.col("conversion")).alias("conversion")
    ).orderBy("stage_idx")


Q101_SQL = f"""
WITH e AS (SELECT user_id AS u, event_type AS t, ts FROM events),
s1 AS (SELECT u, min(ts) AS sts FROM e WHERE t = 'signup' GROUP BY u),
s2 AS (SELECT e.u, min(e.ts) AS sts FROM e JOIN s1 USING (u)
       WHERE e.t = 'view' AND e.ts >= s1.sts GROUP BY e.u),
s3 AS (SELECT e.u, min(e.ts) AS sts FROM e JOIN s2 USING (u)
       WHERE e.t = 'click' AND e.ts >= s2.sts GROUP BY e.u),
s4 AS (SELECT e.u, min(e.ts) AS sts FROM e JOIN s3 USING (u)
       WHERE e.t = 'purchase' AND e.ts >= s3.sts GROUP BY e.u),
c AS (
  SELECT 1 AS stage_idx, 'signup' AS stage,
         CAST((SELECT count(*) FROM s1) AS BIGINT) AS n_users
  UNION ALL SELECT 2, 'view', CAST((SELECT count(*) FROM s2) AS BIGINT)
  UNION ALL SELECT 3, 'click', CAST((SELECT count(*) FROM s3) AS BIGINT)
  UNION ALL SELECT 4, 'purchase', CAST((SELECT count(*) FROM s4) AS BIGINT)),
b AS (SELECT CAST(count(*) AS DOUBLE) AS base FROM s1)
SELECT stage_idx, stage, n_users,
       {_dec4('CAST(n_users AS DOUBLE) / b.base')} AS conversion
FROM c, b ORDER BY stage_idx
"""


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


Q102_SQL = f"""
WITH e AS (
  SELECT user_id AS u, date_trunc('week', ts) AS w FROM events),
first AS (SELECT u, min(w) AS cw FROM e GROUP BY u),
act AS (
  SELECT cw, CAST((epoch(w) - epoch(cw)) / 604800 AS INTEGER) AS week_offset,
         CAST(count(DISTINCT u) AS BIGINT) AS n_active
  FROM e JOIN first USING (u)
  WHERE (epoch(w) - epoch(cw)) / 604800 <= 4
  GROUP BY cw, 2),
sz AS (SELECT cw, CAST(count(*) AS BIGINT) AS cohort_size FROM first GROUP BY cw)
SELECT {_fmt('act.cw')} AS cohort_week, act.week_offset, act.n_active,
       sz.cohort_size,
       {_dec4('CAST(act.n_active AS DOUBLE) / sz.cohort_size')} AS retention
FROM act JOIN sz USING (cw)
ORDER BY cohort_week, week_offset
"""



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


Q104_SQL = """
WITH c AS (
  SELECT CAST(cc.c AS INT) AS c_id,
         list_transform(range(1, 65),
           j -> CAST(('0x' || substr(md5('sem-' || cc.c || '-' || (j - 1)), 1, 4)) AS BIGINT)
                / 65535.0 * 2 - 1) AS cv
  FROM range(8) cc(c)),
cn AS (SELECT c_id, cv,
              CASE WHEN sqrt(list_inner_product(cv, cv)) = 0 THEN 1
                   ELSE sqrt(list_inner_product(cv, cv)) END AS cnrm
       FROM c),
e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
n AS (SELECT vec_id, v,
             CASE WHEN sqrt(list_inner_product(v, v)) = 0 THEN 1
                  ELSE sqrt(list_inner_product(v, v)) END AS nrm
      FROM e),
sim AS (SELECT vec_id, c_id,
               ROUND(list_inner_product(v, cv) / (nrm * cnrm), 6) AS s
        FROM n, cn),
asg AS (SELECT vec_id, c_id FROM (
          SELECT vec_id, c_id,
                 row_number() OVER (PARTITION BY vec_id ORDER BY s DESC, c_id ASC) AS rn
          FROM sim) WHERE rn = 1),
na AS (SELECT n.vec_id, n.v, n.nrm, asg.c_id FROM n JOIN asg USING (vec_id)),
p AS (SELECT a.vec_id AS ia, b.vec_id AS ib
      FROM na a JOIN na b ON a.c_id = b.c_id AND a.vec_id < b.vec_id
      WHERE ROUND(list_inner_product(a.v, b.v) / (a.nrm * b.nrm), 4) >= 0.4),
dup AS (SELECT ib AS vec_id, MIN(ia) AS dup_of FROM p GROUP BY ib)
SELECT asg.vec_id, asg.c_id AS cluster_id, dup.dup_of,
       dup.dup_of IS NOT NULL AS is_dup
FROM asg LEFT JOIN dup USING (vec_id)
ORDER BY asg.vec_id
"""


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


Q105_SQL = """
WITH b AS (SELECT c_custkey AS id, c_name AS nm, substr(c_name, 1, 16) AS blk
           FROM customer WHERE c_mktsegment = 'BUILDING')
SELECT a.id AS id_a, c.id AS id_b, CAST(levenshtein(a.nm, c.nm) AS INT) AS dist
FROM b a JOIN b c ON a.blk = c.blk AND a.id < c.id
WHERE levenshtein(a.nm, c.nm) <= 1
ORDER BY id_a, id_b
"""


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


Q106_SQL = """
WITH k AS (
  SELECT lang, doc_id, n_chars,
         ln((CAST(('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 15)) AS BIGINT) + 1)
            / 1152921504606846977.0) / CAST(n_chars AS DOUBLE) AS key
  FROM documents WHERE n_chars > 0),
r AS (SELECT lang, doc_id, n_chars,
             row_number() OVER (PARTITION BY lang ORDER BY key DESC, doc_id ASC) AS rnk
      FROM k)
SELECT lang, doc_id, n_chars, CAST(rnk AS INT) AS rank
FROM r WHERE rnk <= 10 ORDER BY lang, rank
"""


# Q107 — X68 one-pass per-column data profile over the orders fact
# (string-typed columns only: double/timestamp string forms are
# engine-specific — the profile contract is the STRING form, see
# operator docstring).

def q107(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load_table(spark, sf_dir, "orders")
    return stats.profile_columns(
        o, ("o_orderkey", "o_custkey", "o_orderstatus", "o_orderpriority")
    ).orderBy("column")


Q107_SQL = """
WITH p AS (
  SELECT 'o_orderkey' AS "column", CAST(o_orderkey AS VARCHAR) AS val FROM orders
  UNION ALL SELECT 'o_custkey', CAST(o_custkey AS VARCHAR) FROM orders
  UNION ALL SELECT 'o_orderstatus', o_orderstatus FROM orders
  UNION ALL SELECT 'o_orderpriority', o_orderpriority FROM orders)
SELECT "column",
       CAST(COUNT(*) AS BIGINT) AS n_rows,
       CAST(SUM(CASE WHEN val IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_null,
       CAST(COUNT(DISTINCT val) AS BIGINT) AS n_distinct,
       MIN(val) AS min_val, MAX(val) AS max_val
FROM p GROUP BY "column" ORDER BY "column"
"""


# Q108 — X69 source concentration (Lorenz) curve: which sources hold
# the corpus mass, cumulatively.

def q108(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load_table(spark, sf_dir, "documents")
    return stats.concentration_curve(d, group_col="source", value_col="n_chars").orderBy(
        "rank"
    )


Q108_SQL = """
WITH t AS (SELECT source, SUM(CAST(n_chars AS DOUBLE)) AS mass
           FROM documents GROUP BY source),
g AS (SELECT SUM(mass) AS grand FROM t),
r AS (SELECT source, mass,
             row_number() OVER (ORDER BY mass DESC, source ASC) AS rnk,
             SUM(mass) OVER (ORDER BY mass DESC, source ASC
                             ROWS UNBOUNDED PRECEDING) AS cum
      FROM t)
SELECT CAST(rnk AS INT) AS rank, source, CAST(mass AS BIGINT) AS total_mass,
       ROUND(mass / grand, 4) AS share, ROUND(cum / grand, 4) AS cum_share
FROM r, g ORDER BY rank
"""


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

import os as _os

_Q103_SIGS_PATH = _os.path.join(
    _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))),
    "spark-warehouse",
    "q103_media_sigs",
)


def q103(spark: SparkSession, sf_dir: str) -> DataFrame:
    from .operators import multimodal

    media = multimodal.synthetic_image_corpus(spark, n=96)
    multimodal.image_ahash(media).write.mode("overwrite").parquet(_Q103_SIGS_PATH)
    s = spark.read.parquet(_Q103_SIGS_PATH)
    return multimodal.ahash_near_dup_pairs(s, max_hamming=6).orderBy("id_a", "id_b")


Q103_SQL = f"""
WITH s AS (
  SELECT media_id, ahash
  FROM read_parquet('{_Q103_SIGS_PATH}/*.parquet')
  WHERE ahash IS NOT NULL)
SELECT a.media_id AS id_a, b.media_id AS id_b,
       CAST(bit_count(xor(a.ahash, b.ahash)) AS INT) AS hamming
FROM s a JOIN s b ON a.media_id < b.media_id
WHERE bit_count(xor(a.ahash, b.ahash)) <= 6
ORDER BY id_a, id_b
"""


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


Q109_SQL = """
WITH v_old AS (SELECT * FROM orders WHERE o_orderkey % 11 <> 0),
v_new AS (SELECT o_orderkey, o_custkey, o_orderstatus,
                 CASE WHEN o_orderkey % 13 = 0 THEN 'RECLASSIFIED'
                      ELSE o_orderpriority END AS o_orderpriority
          FROM orders WHERE o_orderkey % 7 <> 0),
oh AS (SELECT o_orderkey,
              md5(concat_ws(chr(31),
                            coalesce(CAST(o_custkey AS VARCHAR), chr(0)),
                            coalesce(o_orderstatus, chr(0)),
                            coalesce(o_orderpriority, chr(0)))) AS h
       FROM v_old),
nh AS (SELECT o_orderkey,
              md5(concat_ws(chr(31),
                            coalesce(CAST(o_custkey AS VARCHAR), chr(0)),
                            coalesce(o_orderstatus, chr(0)),
                            coalesce(o_orderpriority, chr(0)))) AS h
       FROM v_new),
j AS (SELECT coalesce(oh.o_orderkey, nh.o_orderkey) AS o_orderkey,
             oh.h AS ho, nh.h AS hn
      FROM oh FULL OUTER JOIN nh ON oh.o_orderkey = nh.o_orderkey)
SELECT o_orderkey,
       CASE WHEN ho IS NULL THEN 'added'
            WHEN hn IS NULL THEN 'removed'
            WHEN ho <> hn THEN 'changed'
            ELSE 'unchanged' END AS status
FROM j
WHERE (CASE WHEN ho IS NULL THEN 'added'
            WHEN hn IS NULL THEN 'removed'
            WHEN ho <> hn THEN 'changed'
            ELSE 'unchanged' END) <> 'unchanged'
ORDER BY o_orderkey
"""


# Q110 — X72 PSI drift between the first and second half of the month,
# per event type, over fixed 50-wide value buckets.

def q110(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = load_table(spark, sf_dir, "events")
    return stats.psi_drift(
        e, period_b=F.dayofmonth("ts") > 15, persist_fn=_cache_scoped
    ).orderBy("event_type")


Q110_SQL = """
WITH d AS (SELECT event_type AS g, (extract(day FROM ts) > 15) AS b,
                  CAST(least(floor(value / 50.0), 9) AS INT) AS bkt
           FROM events),
c AS (SELECT g, b, bkt, CAST(count(*) AS DOUBLE) AS n FROM d GROUP BY 1, 2, 3),
t AS (SELECT g, b, sum(n) AS nt FROM c GROUP BY 1, 2),
s AS (SELECT c.g, c.b, c.bkt, (c.n + 0.5) / (t.nt + 0.5 * 10) AS p
      FROM c JOIN t USING (g, b)),
pa AS (SELECT g, bkt, p FROM s WHERE NOT b),
pb AS (SELECT g, bkt, p FROM s WHERE b),
ta AS (SELECT g, nt FROM t WHERE NOT b),
tb AS (SELECT g, nt FROM t WHERE b),
j AS (SELECT coalesce(pa.g, pb.g) AS g, coalesce(pa.bkt, pb.bkt) AS bkt,
             pa.p AS p_a, pb.p AS p_b
      FROM pa FULL OUTER JOIN pb ON pa.g = pb.g AND pa.bkt = pb.bkt),
f AS (SELECT j.g, ta.nt AS na, tb.nt AS nb,
             coalesce(j.p_a, 0.5 / (ta.nt + 5)) AS pa2,
             coalesce(j.p_b, 0.5 / (tb.nt + 5)) AS pb2
      FROM j JOIN ta ON j.g = ta.g JOIN tb ON j.g = tb.g)
SELECT g AS event_type, ROUND(SUM((pb2 - pa2) * ln(pb2 / pa2)), 4) AS psi,
       CAST(MAX(na) AS BIGINT) AS n_baseline,
       CAST(MAX(nb) AS BIGINT) AS n_comparison
FROM f GROUP BY g ORDER BY event_type
"""


# Q111 — X74 full banded MinHash+LSH (8 bands x 2 rows, md5-derived
# permutations so DuckDB replays the identical signature matrix),
# exact set-Jaccard verify on candidates.

def q111(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load_table(spark, sf_dir, "documents")
    return dedup.minhash_lsh_pairs(
        d, threshold=0.5, persist_fn=_cache_scoped
    ).orderBy("id_a", "id_b")


Q111_SQL = """
WITH t AS (SELECT doc_id, string_split(text, ' ') AS toks FROM documents),
f AS (SELECT doc_id, toks FROM t WHERE len(toks) >= 3),
g AS (SELECT doc_id AS id,
             list_distinct(list_transform(range(1, len(toks) - 1),
               i -> md5(toks[i] || ' ' || toks[i+1] || ' ' || toks[i+2]))) AS ds
      FROM f),
sig AS (SELECT id, ds,
       list_min(list_transform(ds, d -> (CAST(('0x' || substr(d, 1, 7)) AS BIGINT) + 0 * CAST(('0x' || substr(d, 17, 7)) AS BIGINT)) % 1073741789)) AS m0,
       list_min(list_transform(ds, d -> (CAST(('0x' || substr(d, 1, 7)) AS BIGINT) + 1 * CAST(('0x' || substr(d, 17, 7)) AS BIGINT)) % 1073741789)) AS m1,
       list_min(list_transform(ds, d -> (CAST(('0x' || substr(d, 1, 7)) AS BIGINT) + 2 * CAST(('0x' || substr(d, 17, 7)) AS BIGINT)) % 1073741789)) AS m2,
       list_min(list_transform(ds, d -> (CAST(('0x' || substr(d, 1, 7)) AS BIGINT) + 3 * CAST(('0x' || substr(d, 17, 7)) AS BIGINT)) % 1073741789)) AS m3,
       list_min(list_transform(ds, d -> (CAST(('0x' || substr(d, 1, 7)) AS BIGINT) + 4 * CAST(('0x' || substr(d, 17, 7)) AS BIGINT)) % 1073741789)) AS m4,
       list_min(list_transform(ds, d -> (CAST(('0x' || substr(d, 1, 7)) AS BIGINT) + 5 * CAST(('0x' || substr(d, 17, 7)) AS BIGINT)) % 1073741789)) AS m5,
       list_min(list_transform(ds, d -> (CAST(('0x' || substr(d, 1, 7)) AS BIGINT) + 6 * CAST(('0x' || substr(d, 17, 7)) AS BIGINT)) % 1073741789)) AS m6,
       list_min(list_transform(ds, d -> (CAST(('0x' || substr(d, 1, 7)) AS BIGINT) + 7 * CAST(('0x' || substr(d, 17, 7)) AS BIGINT)) % 1073741789)) AS m7,
       list_min(list_transform(ds, d -> (CAST(('0x' || substr(d, 1, 7)) AS BIGINT) + 8 * CAST(('0x' || substr(d, 17, 7)) AS BIGINT)) % 1073741789)) AS m8,
       list_min(list_transform(ds, d -> (CAST(('0x' || substr(d, 1, 7)) AS BIGINT) + 9 * CAST(('0x' || substr(d, 17, 7)) AS BIGINT)) % 1073741789)) AS m9,
       list_min(list_transform(ds, d -> (CAST(('0x' || substr(d, 1, 7)) AS BIGINT) + 10 * CAST(('0x' || substr(d, 17, 7)) AS BIGINT)) % 1073741789)) AS m10,
       list_min(list_transform(ds, d -> (CAST(('0x' || substr(d, 1, 7)) AS BIGINT) + 11 * CAST(('0x' || substr(d, 17, 7)) AS BIGINT)) % 1073741789)) AS m11,
       list_min(list_transform(ds, d -> (CAST(('0x' || substr(d, 1, 7)) AS BIGINT) + 12 * CAST(('0x' || substr(d, 17, 7)) AS BIGINT)) % 1073741789)) AS m12,
       list_min(list_transform(ds, d -> (CAST(('0x' || substr(d, 1, 7)) AS BIGINT) + 13 * CAST(('0x' || substr(d, 17, 7)) AS BIGINT)) % 1073741789)) AS m13,
       list_min(list_transform(ds, d -> (CAST(('0x' || substr(d, 1, 7)) AS BIGINT) + 14 * CAST(('0x' || substr(d, 17, 7)) AS BIGINT)) % 1073741789)) AS m14,
       list_min(list_transform(ds, d -> (CAST(('0x' || substr(d, 1, 7)) AS BIGINT) + 15 * CAST(('0x' || substr(d, 17, 7)) AS BIGINT)) % 1073741789)) AS m15
        FROM g),
bands AS (
  SELECT id, 0 AS band, md5(CAST(m0 AS VARCHAR) || '-' || CAST(m1 AS VARCHAR)) AS key FROM sig
  UNION ALL SELECT id, 1 AS band, md5(CAST(m2 AS VARCHAR) || '-' || CAST(m3 AS VARCHAR)) AS key FROM sig
  UNION ALL SELECT id, 2 AS band, md5(CAST(m4 AS VARCHAR) || '-' || CAST(m5 AS VARCHAR)) AS key FROM sig
  UNION ALL SELECT id, 3 AS band, md5(CAST(m6 AS VARCHAR) || '-' || CAST(m7 AS VARCHAR)) AS key FROM sig
  UNION ALL SELECT id, 4 AS band, md5(CAST(m8 AS VARCHAR) || '-' || CAST(m9 AS VARCHAR)) AS key FROM sig
  UNION ALL SELECT id, 5 AS band, md5(CAST(m10 AS VARCHAR) || '-' || CAST(m11 AS VARCHAR)) AS key FROM sig
  UNION ALL SELECT id, 6 AS band, md5(CAST(m12 AS VARCHAR) || '-' || CAST(m13 AS VARCHAR)) AS key FROM sig
  UNION ALL SELECT id, 7 AS band, md5(CAST(m14 AS VARCHAR) || '-' || CAST(m15 AS VARCHAR)) AS key FROM sig),
cand AS (SELECT DISTINCT a.id AS id_a, b.id AS id_b
         FROM bands a JOIN bands b ON a.band = b.band AND a.key = b.key
         WHERE a.id < b.id),
v AS (SELECT c.id_a, c.id_b,
             CAST(len(list_intersect(x.ds, y.ds)) AS BIGINT) AS n_common,
             ROUND(CAST(len(list_intersect(x.ds, y.ds)) AS DOUBLE)
                   / len(list_distinct(list_concat(x.ds, y.ds))), 4) AS jaccard
      FROM cand c JOIN g x ON c.id_a = x.id JOIN g y ON c.id_b = y.id)
SELECT id_a, id_b, n_common, jaccard FROM v
WHERE jaccard >= 0.5 ORDER BY id_a, id_b
"""


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


Q112_SQL = """
WITH b AS (SELECT c_custkey AS id, c_name AS nm,
                  substr(c_name, 1, 16) AS blk_p, right(c_name, 6) AS blk_s
           FROM customer WHERE c_mktsegment = 'BUILDING'),
p1 AS (SELECT a.id AS id_a, c.id AS id_b, levenshtein(a.nm, c.nm) AS dist
       FROM b a JOIN b c ON a.blk_p = c.blk_p AND a.id < c.id
       WHERE levenshtein(a.nm, c.nm) <= 1),
p2 AS (SELECT a.id AS id_a, c.id AS id_b, levenshtein(a.nm, c.nm) AS dist
       FROM b a JOIN b c ON a.blk_s = c.blk_s AND a.id < c.id
       WHERE levenshtein(a.nm, c.nm) <= 1),
u AS (SELECT * FROM p1 UNION ALL SELECT * FROM p2)
SELECT id_a, id_b, CAST(MIN(dist) AS INT) AS dist
FROM u GROUP BY id_a, id_b ORDER BY id_a, id_b
"""


# Q113 — X75 normalization-aware exact dedup: lower + ASCII-scrub +
# whitespace-collapse (byte-identical in Java regex and RE2), then the
# X1 digest-group shape.

def q113(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load_table(spark, sf_dir, "documents")
    return text.normalized_exact_dedup(d).orderBy("norm_hash")


Q113_SQL = """
WITH n AS (SELECT doc_id,
                  regexp_replace(trim(regexp_replace(lower(text), '[^ -~]', ' ', 'g')),
                                 ' +', ' ', 'g') AS norm
           FROM documents)
SELECT md5(norm) AS norm_hash,
       MIN(doc_id) AS keep_id,
       CAST(COUNT(*) AS BIGINT) AS n_dups,
       CAST(MIN(strlen(norm)) AS BIGINT) AS n_chars_norm
FROM n GROUP BY md5(norm) ORDER BY norm_hash
"""


# Q114 — X76 per-dimension embedding statistics per label (the
# feature-normalization stats pass), raw-moment std written identically
# in both engines.

def q114(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = load_table(spark, sf_dir, "embeddings")
    return similarity.dimension_stats(e, group_col="label").orderBy(
        "label", "dim"
    )


Q114_SQL = """
WITH e AS (SELECT label, CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
x AS (SELECT label, v, unnest(range(1, len(v) + 1)) AS dim FROM e),
p AS (SELECT label, CAST(dim AS INT) AS dim, v[dim] AS val FROM x)
SELECT label, dim,
       ROUND(AVG(val), 4) + 0.0 AS mean,
       ROUND(STDDEV_SAMP(val), 4) AS std
FROM p GROUP BY label, dim ORDER BY label, dim
"""


# Q115 — trigram inverted-index substring search (X77): find every
# (query, doc) where the query string occurs verbatim, via posting-list
# candidates + contains verify — never a per-query corpus scan.

_SEARCH_QUERIES = ["scan merge", "window window", "batch stream", "dup"]


def q115(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load_table(spark, sf_dir, "documents")
    return text.substring_search(
        d, _SEARCH_QUERIES, persist_fn=_cache_scoped
    ).orderBy("query", "doc_id")


Q115_SQL = """
WITH q(query) AS (
  SELECT unnest(['scan merge', 'window window', 'batch stream', 'dup']))
SELECT q.query, d.doc_id
FROM documents d, q
WHERE contains(d.text, q.query)
ORDER BY query, doc_id
"""


# Q116 — token-sequence blocklist filter (X78): one anchored pass for
# all phrases instead of N regex scans.

_BLOCK_PHRASES = ["batch batch batch", "scan merge", "spark window window"]


def q116(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load_table(spark, sf_dir, "documents")
    return text.blocklist_matches(d, _BLOCK_PHRASES).orderBy("doc_id", "phrase")


Q116_SQL = """
WITH p(phrase) AS (
  SELECT unnest(['batch batch batch', 'scan merge', 'spark window window']))
SELECT d.doc_id, p.phrase
FROM documents d, p
WHERE contains(' ' || d.text || ' ', ' ' || p.phrase || ' ')
ORDER BY doc_id, phrase
"""


# Q117 — windowed PMI co-occurrence (X79), window 2, min pair count 5.

def q117(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load_table(spark, sf_dir, "documents")
    return (
        text.pmi_cooccurrence(d, window=2, min_count=5, persist_fn=_cache_scoped)
        .select("tok_a", "tok_b", "pair_count", dec4("pmi").alias("pmi"))
        .orderBy("tok_a", "tok_b")
    )


Q117_SQL = f"""
WITH t AS (SELECT string_split(text, ' ') AS toks FROM documents),
pairs AS (
  SELECT least(toks[i], toks[i+1]) AS a, greatest(toks[i], toks[i+1]) AS b
  FROM t, unnest(range(1, len(toks))) AS u(i)
  UNION ALL
  SELECT least(toks[i], toks[i+2]) AS a, greatest(toks[i], toks[i+2]) AS b
  FROM t, unnest(range(1, len(toks) - 1)) AS u(i)),
pc AS (SELECT a, b, COUNT(*) AS n FROM pairs GROUP BY a, b),
uc AS (SELECT unnest(toks) AS tok FROM t),
un AS (SELECT tok, COUNT(*) AS n FROM uc GROUP BY tok),
tot AS (SELECT (SELECT SUM(n) FROM pc) * 1.0 AS p_tot,
               (SELECT SUM(n) FROM un) * 1.0 AS t_tot)
SELECT pc.a AS tok_a, pc.b AS tok_b, CAST(pc.n AS BIGINT) AS pair_count,
       {_dec4('ROUND(ln((pc.n / p_tot) / ((ua.n / t_tot) * (ub.n / t_tot))), 4)')} AS pmi
FROM pc
JOIN un ua ON pc.a = ua.tok
JOIN un ub ON pc.b = ub.tok
CROSS JOIN tot
WHERE pc.n >= 5
ORDER BY tok_a, tok_b
"""


# Q118 — exact shingle containment pairs (X80): asymmetric near-subset
# detection, prefix-filtered candidate generation, tau = 0.6.

def q118(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load_table(spark, sf_dir, "documents")
    pairs = dedup.containment_pairs(d, threshold=0.6, persist_fn=_cache_scoped)
    return pairs.select(
        "id_a", "id_b", dec4("containment").alias("containment")
    ).orderBy("id_a", "id_b")


Q118_SQL = f"""
WITH t AS (SELECT doc_id, string_split(text, ' ') AS toks FROM documents),
f AS (SELECT doc_id, toks FROM t WHERE len(toks) >= 3),
g AS (SELECT doc_id AS id,
             list_distinct(list_transform(range(1, len(toks) - 1),
               i -> md5(toks[i] || ' ' || toks[i+1] || ' ' || toks[i+2]))) AS sh
      FROM f),
s AS (SELECT id, unnest(sh) AS x FROM g),
i AS (SELECT a.id AS id_a, b.id AS id_b, COUNT(*) AS n
      FROM s a JOIN s b ON a.x = b.x AND a.id <> b.id GROUP BY 1, 2),
z AS (SELECT id, len(sh) AS sz FROM g)
SELECT id_a, id_b, {_dec4('i.n / z.sz')} AS containment
FROM i JOIN z ON id_a = z.id
WHERE ROUND(i.n / z.sz, 4) >= 0.6
ORDER BY id_a, id_b
"""


# Q119 — per-label per-dimension robust stats (X81): median/q25/q75/IQR,
# exact linear-interpolation quantiles (the oracle form; approx=True is
# the sketch-backed 100 TB path, pytest-pinned).

def q119(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = load_table(spark, sf_dir, "embeddings")
    return similarity.robust_dimension_stats(e, group_col="label").orderBy(
        "label", "dim"
    )


Q119_SQL = """
WITH e AS (SELECT label, CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
x AS (SELECT label, v, unnest(range(1, len(v) + 1)) AS dim FROM e),
p AS (SELECT label, CAST(dim AS INT) AS dim, v[dim] AS val FROM x)
SELECT label, dim,
       ROUND(quantile_cont(val, 0.5), 4) + 0.0 AS median,
       ROUND(quantile_cont(val, 0.25), 4) + 0.0 AS q25,
       ROUND(quantile_cont(val, 0.75), 4) + 0.0 AS q75,
       ROUND(quantile_cont(val, 0.75) - quantile_cont(val, 0.25), 4) + 0.0 AS iqr
FROM p GROUP BY label, dim ORDER BY label, dim
"""


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


Q121_SQL = """
SELECT 'group' AS level, event_type AS key,
       CAST(COUNT(DISTINCT user_id) AS BIGINT) AS exact_ndv,
       TRUE AS ndv_within_bound
FROM events GROUP BY event_type
UNION ALL
SELECT 'total', NULL, CAST(COUNT(DISTINCT user_id) AS BIGINT), TRUE
FROM events
ORDER BY level, key
"""


# Q122 — DCT perceptual-hash (pHash) image near-dup pairs (X85): the
# q103 evidence pattern — Spark writes the signature parquet, DuckDB
# brute-forces bit_count(xor) over the same file, so the banded
# candidate generation is oracle-checked as exactly the brute-force
# pair set (exhaustive regime: max_hamming < n_bands).

_Q122_SIGS_PATH = _os.path.join(
    _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))),
    "spark-warehouse",
    "q122_media_phash_sigs",
)


def q122(spark: SparkSession, sf_dir: str) -> DataFrame:
    from .operators import multimodal

    media = multimodal.synthetic_image_corpus(spark, n=96)
    multimodal.image_phash(media).write.mode("overwrite").parquet(_Q122_SIGS_PATH)
    s = spark.read.parquet(_Q122_SIGS_PATH)
    return multimodal.ahash_near_dup_pairs(
        s, max_hamming=6, sig_col="phash"
    ).orderBy("id_a", "id_b")


Q122_SQL = f"""
WITH s AS (
  SELECT media_id, phash
  FROM read_parquet('{_Q122_SIGS_PATH}/*.parquet')
  WHERE phash IS NOT NULL)
SELECT a.media_id AS id_a, b.media_id AS id_b,
       CAST(bit_count(xor(a.phash, b.phash)) AS INT) AS hamming
FROM s a JOIN s b ON a.media_id < b.media_id
WHERE bit_count(xor(a.phash, b.phash)) <= 6
ORDER BY id_a, id_b
"""


# Q123 — audio-fingerprint near-dup pairs (X86): the q103/q122 evidence
# pattern over the deterministic WAV corpus — Spark writes the
# fingerprint parquet, DuckDB brute-forces bit_count(xor) on the same
# file (exhaustive banding regime: max_hamming 4 < 8 bands).

_Q123_SIGS_PATH = _os.path.join(
    _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))),
    "spark-warehouse",
    "q123_media_afp_sigs",
)


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


Q123_SQL = f"""
WITH s AS (
  SELECT media_id, afp
  FROM read_parquet('{_Q123_SIGS_PATH}/*.parquet')
  WHERE afp IS NOT NULL)
SELECT a.media_id AS id_a, b.media_id AS id_b,
       CAST(bit_count(xor(a.afp, b.afp)) AS INT) AS hamming
FROM s a JOIN s b ON a.media_id < b.media_id
WHERE bit_count(xor(a.afp, b.afp)) <= 4
ORDER BY id_a, id_b
"""


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


Q124_SQL = """
SELECT source, lang,
       CAST(GROUPING(source) AS INT) AS g_source,
       CAST(GROUPING(lang) AS INT) AS g_lang,
       CAST(COUNT(*) AS BIGINT) AS n_docs,
       CAST(SUM(n_chars) AS BIGINT) AS total_chars
FROM documents
GROUP BY CUBE (source, lang)
ORDER BY g_source, g_lang, source, lang
"""


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


Q125_SQL = f"""
WITH t AS (
  SELECT event_type, value,
         NTILE(10) OVER (PARTITION BY event_type
                         ORDER BY value ASC, event_id ASC) AS decile
  FROM events)
SELECT event_type, CAST(decile AS INT) AS decile,
       CAST(COUNT(*) AS BIGINT) AS n,
       {_dec4('MIN(value)')} AS lo,
       {_dec4('MAX(value)')} AS hi
FROM t GROUP BY event_type, decile ORDER BY event_type, decile
"""


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


Q126_SQL = f"""
WITH iv AS (
  SELECT CAST(i AS BIGINT) AS interval_id,
         ['click', 'error', 'purchase', 'signup', 'view'][CAST(i // 6 AS INT) + 1]
           AS event_type,
         TIMESTAMP '2024-01-01' + INTERVAL ((i % 6) * 4 + i // 6) DAY AS w_start,
         TIMESTAMP '2024-01-01' + INTERVAL ((i % 6) * 4 + i // 6 + 2) DAY AS w_end
  FROM range(30) t(i))
SELECT iv.interval_id, iv.event_type,
       CAST(COUNT(*) AS BIGINT) AS n_events,
       {_dec4('SUM(e.value)')} AS sum_value
FROM events e
JOIN iv ON e.event_type = iv.event_type
       AND e.ts >= iv.w_start AND e.ts < iv.w_end
GROUP BY 1, 2 ORDER BY interval_id
"""


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


Q127_SQL = """
WITH f AS (
  SELECT o_orderkey, CAST(o_orderdate AS TIMESTAMP) AS w_s,
         CAST(o_orderdate AS TIMESTAMP) + INTERVAL 30 DAY AS w_e
  FROM orders),
grid AS (
  SELECT DISTINCT date_trunc('quarter', o_orderdate) AS q_start,
         date_trunc('quarter', o_orderdate) + INTERVAL 3 MONTH AS q_end
  FROM orders)
SELECT strftime(q_start, '%Y-%m-%d') AS quarter,
       CAST(COUNT(*) AS BIGINT) AS n_active_orders
FROM f JOIN grid ON f.w_s < grid.q_end AND f.w_e > grid.q_start
GROUP BY 1 ORDER BY quarter
"""


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


Q128_SQL = """
WITH t AS (
  SELECT event_type, ts,
         CASE WHEN ts < TIMESTAMP '2024-01-22' - INTERVAL 24 HOUR THEN 'train'
              WHEN ts >= TIMESTAMP '2024-01-22' THEN 'test'
              ELSE 'embargo' END AS split
  FROM events)
SELECT split, event_type, CAST(COUNT(*) AS BIGINT) AS n,
       strftime(MIN(ts), '%Y-%m-%d %H:%M:%S') AS first_ts,
       strftime(MAX(ts), '%Y-%m-%d %H:%M:%S') AS last_ts
FROM t GROUP BY split, event_type ORDER BY split, event_type
"""


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


Q129_SQL = f"""
WITH tok AS (
  SELECT source, unnest(string_split(lower(text), ' ')) AS tok
  FROM documents),
freq AS (
  SELECT source, tok, CAST(COUNT(*) AS BIGINT) AS c FROM tok GROUP BY 1, 2),
d AS (
  SELECT source AS g,
         ln(CAST(ROW_NUMBER() OVER (PARTITION BY source
                                    ORDER BY c DESC, tok ASC) AS DOUBLE)) AS x,
         ln(CAST(c AS DOUBLE)) AS y
  FROM freq),
m AS (SELECT g, avg(x) AS mx, avg(y) AS my FROM d GROUP BY g),
mom AS (
  SELECT d.g, CAST(count(*) AS BIGINT) AS n,
         sum((x - mx) * (y - my)) AS sxy,
         sum(pow(x - mx, 2)) AS sxx,
         sum(pow(y - my, 2)) AS syy,
         min(mx) AS mx, min(my) AS my
  FROM d JOIN m USING (g) GROUP BY d.g),
fit AS (
  SELECT g, n,
         CASE WHEN sxx > 0 THEN sxy / sxx ELSE 0.0 END AS slope,
         my - (CASE WHEN sxx > 0 THEN sxy / sxx ELSE 0.0 END) * mx AS intercept,
         CASE WHEN sxx > 0 AND syy > 0 THEN pow(sxy, 2) / (sxx * syy)
              ELSE 0.0 END AS r2
  FROM mom)
SELECT g AS source, n,
       {_dec4('slope')} AS slope,
       {_dec4('intercept')} AS intercept,
       {_dec4('r2')} AS r2
FROM fit ORDER BY source
"""


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


Q130_SQL = f"""
WITH cls AS (
  SELECT c_mktsegment, c_nationkey,
         CAST(COUNT(*) AS BIGINT) AS class_size,
         CAST(COUNT(DISTINCT CAST(floor(c_acctbal / 1000) AS BIGINT))
              AS BIGINT) AS l_distinct
  FROM customer GROUP BY 1, 2)
SELECT c_mktsegment,
       CAST(COUNT(*) AS BIGINT) AS n_classes,
       CAST(SUM(CASE WHEN class_size < 5 THEN 1 ELSE 0 END) AS BIGINT)
         AS viol_classes,
       CAST(SUM(CASE WHEN class_size < 5 THEN class_size ELSE 0 END)
            AS BIGINT) AS viol_rows,
       CAST(MIN(class_size) AS BIGINT) AS min_class_size,
       CAST(MIN(CASE WHEN class_size >= 5 THEN l_distinct END) AS BIGINT)
         AS min_l_compliant,
       {_dec4('SUM(CASE WHEN class_size < 5 THEN class_size ELSE 0 END)'
              ' * 1.0 / SUM(class_size)')} AS suppression_rate
FROM cls GROUP BY c_mktsegment ORDER BY c_mktsegment
"""


# Q131 — exact two-sample Kolmogorov-Smirnov (X93): click vs purchase
# value distributions. The oracle computes the same distinct-value
# cumsums with a plain window; the operator's bucketed prefix sums are
# thereby hash-proven equal to the textbook form.

def q131(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = load_table(spark, sf_dir, "events")
    return stats.ks_two_sample(
        e, "event_type", "value", "click", "purchase", persist_fn=_cache_scoped
    ).select("n_a", "n_b", "d_stat", "d_at_value")


Q131_SQL = """
WITH two AS (
  SELECT event_type AS g, CAST(value AS DOUBLE) AS v FROM events
  WHERE event_type IN ('click', 'purchase')),
per_val AS (
  SELECT v,
         CAST(SUM(CASE WHEN g = 'click' THEN 1 ELSE 0 END) AS BIGINT) AS ca,
         CAST(SUM(CASE WHEN g = 'purchase' THEN 1 ELSE 0 END) AS BIGINT) AS cb
  FROM two GROUP BY v),
cum AS (
  SELECT v,
         SUM(ca) OVER (ORDER BY v) AS cuma,
         SUM(cb) OVER (ORDER BY v) AS cumb,
         SUM(ca) OVER () AS na, SUM(cb) OVER () AS nb
  FROM per_val),
diffs AS (
  SELECT CAST(na AS BIGINT) AS n_a, CAST(nb AS BIGINT) AS n_b, v,
         abs(cuma * 1.0 / na - cumb * 1.0 / nb) AS diff
  FROM cum),
dmax AS (SELECT MAX(diff) AS d FROM diffs)
SELECT n_a, n_b,
       ROUND(d, 4) + 0.0 AS d_stat,
       ROUND(MIN(v), 4) + 0.0 AS d_at_value
FROM diffs, dmax WHERE diff = d
GROUP BY n_a, n_b, d
"""


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


Q132_SQL = """
WITH e AS (
  SELECT vec_id, label, CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
x AS (SELECT vec_id, label, v, unnest(range(1, len(v) + 1)) AS dim FROM e),
dims AS (
  SELECT vec_id, label, CAST(dim AS INT) AS dim, v[dim] AS x FROM x),
st AS (
  SELECT dim,
         ROUND(AVG(x), 4) + 0.0 AS m,
         ROUND(STDDEV_SAMP(x), 4) AS s
  FROM dims GROUP BY dim),
z AS (
  SELECT d.vec_id, d.label,
         CASE WHEN st.s > 0 THEN (d.x - st.m) / st.s ELSE d.x - st.m END AS zv
  FROM dims d JOIN st USING (dim))
SELECT vec_id, label, ROUND(SUM(zv * zv), 4) + 0.0 AS maha_sq
FROM z GROUP BY vec_id, label
ORDER BY maha_sq DESC, vec_id ASC LIMIT 20
"""


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


Q133_SQL = f"""
WITH ut AS (SELECT DISTINCT user_id, event_type FROM events),
co AS (
  SELECT a.event_type AS type_a, b.event_type AS type_b,
         CAST(COUNT(*) AS BIGINT) AS n_co
  FROM ut a JOIN ut b ON a.user_id = b.user_id
  WHERE a.event_type < b.event_type
  GROUP BY 1, 2),
tot AS (
  SELECT event_type, CAST(COUNT(*) AS BIGINT) AS n FROM ut GROUP BY 1)
SELECT co.type_a, co.type_b, ta.n AS n_a, tb.n AS n_b, co.n_co,
       {_dec4('co.n_co * 1.0 / (ta.n + tb.n - co.n_co)')} AS jaccard
FROM co
JOIN tot ta ON co.type_a = ta.event_type
JOIN tot tb ON co.type_b = tb.event_type
ORDER BY type_a, type_b
"""


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


Q134_SQL = """
WITH two AS (
  SELECT event_type AS g, CAST(value AS DOUBLE) AS v FROM events
  WHERE event_type IN ('click', 'purchase')),
per_val AS (
  SELECT v,
         CAST(SUM(CASE WHEN g = 'click' THEN 1 ELSE 0 END) AS BIGINT) AS ca,
         CAST(SUM(CASE WHEN g = 'purchase' THEN 1 ELSE 0 END) AS BIGINT) AS cb
  FROM two GROUP BY v),
cum AS (
  SELECT v, ca, cb,
         SUM(ca) OVER (ORDER BY v) AS cuma,
         SUM(cb) OVER (ORDER BY v) AS cumb,
         SUM(ca) OVER () AS na, SUM(cb) OVER () AS nb
  FROM per_val),
mid AS (
  SELECT na, nb, ca,
         CAST(ca + cb AS DOUBLE) AS t,
         (CAST(cuma + cumb AS DOUBLE) - CAST(ca + cb AS DOUBLE))
           + (CAST(ca + cb AS DOUBLE) + 1.0) / 2.0 AS midrank
  FROM cum),
agg AS (
  SELECT CAST(na AS BIGINT) AS n_a, CAST(nb AS BIGINT) AS n_b,
         SUM(CAST(ca AS DOUBLE) * midrank) AS ra,
         SUM(t * t * t - t) AS ties
  FROM mid GROUP BY na, nb),
fin AS (
  SELECT n_a, n_b,
         ra - CAST(n_a AS DOUBLE) * (CAST(n_a AS DOUBLE) + 1.0) / 2.0 AS u_a,
         CAST(n_a AS DOUBLE) AS nad, CAST(n_b AS DOUBLE) AS nbd,
         CAST(n_a AS DOUBLE) + CAST(n_b AS DOUBLE) AS nn, ties
  FROM agg)
SELECT n_a, n_b,
       ROUND(u_a, 4) + 0.0 AS u_a,
       ROUND(CASE WHEN nad * nbd / 12.0 * ((nn + 1.0)
                       - ties / (nn * (nn - 1.0))) > 0
                  THEN (u_a - nad * nbd / 2.0)
                       / sqrt(nad * nbd / 12.0 * ((nn + 1.0)
                              - ties / (nn * (nn - 1.0))))
                  ELSE 0.0 END, 4) + 0.0 AS z
FROM fin
"""


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


Q135_SQL = """
WITH cells AS (
  SELECT source AS a, lang AS b, CAST(COUNT(*) AS DOUBLE) AS o
  FROM documents
  WHERE source IS NOT NULL AND lang IS NOT NULL
  GROUP BY 1, 2),
ma AS (SELECT a, SUM(o) AS na FROM cells GROUP BY a),
mb AS (SELECT b, SUM(o) AS nb FROM cells GROUP BY b),
tot AS (
  SELECT SUM(o) AS n,
         CAST(COUNT(DISTINCT a) AS DOUBLE) AS ra,
         CAST(COUNT(DISTINCT b) AS DOUBLE) AS rb
  FROM cells),
grid AS (
  SELECT ma.na, mb.nb, COALESCE(cells.o, 0.0) AS o,
         ma.na * mb.nb / tot.n AS e, tot.n, tot.ra, tot.rb
  FROM ma CROSS JOIN mb
  LEFT JOIN cells ON cells.a = ma.a AND cells.b = mb.b
  CROSS JOIN tot),
s AS (
  SELECT n, ra, rb, SUM((o - e) * (o - e) / e) AS chi2
  FROM grid GROUP BY n, ra, rb)
SELECT CAST(n AS BIGINT) AS n,
       CAST((ra - 1) * (rb - 1) AS BIGINT) AS dof,
       ROUND(chi2, 4) + 0.0 AS chi2,
       ROUND(CASE WHEN n > 0 AND LEAST(ra, rb) > 1
                  THEN sqrt(chi2 / (n * (LEAST(ra, rb) - 1)))
                  ELSE 0.0 END, 4) + 0.0 AS cramers_v
FROM s
"""


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


Q136_SQL = f"""
WITH per AS (
  SELECT source, lang, CAST(COUNT(*) AS BIGINT) AS n,
         SUM(CAST(n_chars AS DOUBLE)) AS s
  FROM documents GROUP BY 1, 2),
prior AS (SELECT SUM(s) / SUM(n) AS g FROM per)
SELECT source, lang, n,
       {_dec4('s / n')} AS raw_mean,
       {_dec4('(s + 200.0 * g) / (n + 200.0)')} AS shrunk_mean
FROM per, prior ORDER BY source, lang
"""


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


Q137_SQL = """
WITH pv AS (
  SELECT l_returnflag, CAST(l_quantity AS DOUBLE) AS v,
         SUM(CAST(l_extendedprice AS DECIMAL(28,6))) AS wv
  FROM lineitem GROUP BY 1, 2),
cum AS (
  SELECT l_returnflag, v,
         SUM(wv) OVER (PARTITION BY l_returnflag ORDER BY v) AS cumw,
         SUM(wv) OVER (PARTITION BY l_returnflag) AS totw
  FROM pv)
SELECT l_returnflag,
       MIN(CASE WHEN cumw * 4 >= totw * 1 THEN v END) AS wq_1_4,
       MIN(CASE WHEN cumw * 4 >= totw * 2 THEN v END) AS wq_2_4,
       MIN(CASE WHEN cumw * 4 >= totw * 3 THEN v END) AS wq_3_4
FROM cum GROUP BY l_returnflag ORDER BY l_returnflag
"""


# Q138 — Benford first-digit audit (X101) over event values. The digit
# comes from the integer string of round(value * 100), never from
# floor(log10(x)) (libm disagreement at exact powers of ten); the
# Benford expectations are embedded as IDENTICAL literals on both
# sides.

_BENFORD = {d: __import__("math").log10(1.0 + 1.0 / d) for d in range(1, 10)}


def q138(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = load_table(spark, sf_dir, "events")
    return stats.benford_audit(e, "value", scale=100).orderBy("digit")


_BENFORD_VALUES = ", ".join(
    f"({d}, {_BENFORD[d]!r})" for d in range(1, 10)
)

Q138_SQL = f"""
WITH pos AS (
  SELECT CAST(value AS DOUBLE) AS v FROM events
  WHERE CAST(value AS DOUBLE) > 0),
d AS (
  SELECT CAST(substr(CAST(CAST(ROUND(v * 100, 0) AS BIGINT) AS VARCHAR),
                     1, 1) AS INT) AS digit
  FROM pos),
counts AS (SELECT digit, CAST(COUNT(*) AS BIGINT) AS n FROM d
           WHERE digit BETWEEN 1 AND 9 GROUP BY 1),
tot AS (SELECT CAST(SUM(n) AS DOUBLE) AS t FROM counts),
exp AS (SELECT digit, CAST(ex AS DOUBLE) AS ex
        FROM (VALUES {_BENFORD_VALUES}) AS e(digit, ex))
SELECT c.digit, c.n,
       ROUND(c.n / t.t, 4) + 0.0 AS obs_share,
       ROUND(e.ex, 4) + 0.0 AS exp_share,
       ROUND(c.n / t.t - e.ex, 4) + 0.0 AS dev
FROM counts c JOIN exp e ON c.digit = e.digit CROSS JOIN tot t
ORDER BY c.digit
"""


# Q139 — Welch's unequal-variance t-test (X102): click vs purchase
# mean shift with the Welch-Satterthwaite df. One stable hash agg.

def q139(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = load_table(spark, sf_dir, "events")
    return stats.welch_t_test(e, "event_type", "value", "click", "purchase")


Q139_SQL = """
WITH two AS (
  SELECT event_type AS g, CAST(value AS DOUBLE) AS v FROM events
  WHERE event_type IN ('click', 'purchase')),
a AS (
  SELECT
    CAST(SUM(CASE WHEN g = 'click' THEN 1 ELSE 0 END) AS BIGINT) AS n_a,
    CAST(SUM(CASE WHEN g = 'purchase' THEN 1 ELSE 0 END) AS BIGINT) AS n_b,
    AVG(CASE WHEN g = 'click' THEN v END) AS ma,
    AVG(CASE WHEN g = 'purchase' THEN v END) AS mb,
    VAR_SAMP(CASE WHEN g = 'click' THEN v END) AS va,
    VAR_SAMP(CASE WHEN g = 'purchase' THEN v END) AS vb
  FROM two)
SELECT n_a, n_b,
       ROUND(ma, 4) + 0.0 AS mean_a,
       ROUND(mb, 4) + 0.0 AS mean_b,
       ROUND((ma - mb) / sqrt(va / n_a + vb / n_b), 4) + 0.0 AS t_stat,
       ROUND((va / n_a + vb / n_b) * (va / n_a + vb / n_b)
             / ((va / n_a) * (va / n_a) / (n_a - 1)
                + (vb / n_b) * (vb / n_b) / (n_b - 1)), 4) + 0.0 AS df
FROM a
"""


# Q140 — embedding correlation matrix (X103): upper-triangle pairwise
# Pearson correlation over the 16 dims — one stable hash agg whose
# state is 120 fixed-size co-moment accumulators, zero corpus explode.
# The oracle is the naive unnest self-join.

def q140(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = load_table(spark, sf_dir, "embeddings")
    return similarity.dimension_corr_matrix(emb).orderBy("dim_a", "dim_b")


Q140_SQL = """
WITH e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
x AS (SELECT vec_id, v, unnest(range(1, len(v) + 1)) AS dim FROM e),
p AS (SELECT vec_id, CAST(dim AS INT) AS dim, v[dim] AS val FROM x)
SELECT a.dim AS dim_a, b.dim AS dim_b,
       ROUND(corr(a.val, b.val), 4) + 0.0 AS corr
FROM p a JOIN p b ON a.vec_id = b.vec_id AND a.dim < b.dim
GROUP BY 1, 2 ORDER BY dim_a, dim_b
"""


# Q141 — categorical diversity audit (X104): per-source language mix
# diagnostics — Shannon entropy, normalized entropy, effective
# language count (Hill number), Gini-Simpson.

def q141(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load_table(spark, sf_dir, "documents")
    return stats.diversity_audit(d, "source", "lang").orderBy("source")


Q141_SQL = """
WITH counts AS (
  SELECT source AS g, lang AS c, CAST(COUNT(*) AS DOUBLE) AS n
  FROM documents GROUP BY 1, 2),
per AS (
  SELECT g, n, n / SUM(n) OVER (PARTITION BY g) AS p FROM counts),
agged AS (
  SELECT g, CAST(SUM(n) AS BIGINT) AS n, CAST(COUNT(*) AS BIGINT) AS k,
         -SUM(p * ln(p)) AS h,
         1.0 - SUM(p * p) AS gini
  FROM per GROUP BY g)
SELECT g AS source, n, k,
       ROUND(h, 4) + 0.0 AS entropy,
       ROUND(CASE WHEN k > 1 THEN h / ln(CAST(k AS DOUBLE))
                  ELSE 0.0 END, 4) + 0.0 AS norm_entropy,
       ROUND(exp(h), 4) + 0.0 AS eff_cats,
       ROUND(gini, 4) + 0.0 AS gini
FROM agged ORDER BY source
"""


# Q142 — label-centroid separability matrix (X105): pairwise cosine
# between per-label embedding centroids, built on the q114
# rounded-stats contract so both engines fold identical numbers.

def q142(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = load_table(spark, sf_dir, "embeddings")
    return similarity.centroid_similarity(emb, "label").orderBy(
        "group_a", "group_b"
    )


Q142_SQL = """
WITH e AS (SELECT label, CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
x AS (SELECT label, v, unnest(range(1, len(v) + 1)) AS dim FROM e),
p AS (SELECT label, CAST(dim AS INT) AS dim, v[dim] AS val FROM x),
st AS (
  SELECT label, dim, ROUND(AVG(val), 4) + 0.0 AS m
  FROM p GROUP BY label, dim),
pr AS (
  SELECT a.label AS group_a, b.label AS group_b,
         SUM(a.m * b.m) AS d,
         sqrt(SUM(a.m * a.m)) AS na, sqrt(SUM(b.m * b.m)) AS nb
  FROM st a JOIN st b ON a.dim = b.dim AND a.label < b.label
  GROUP BY 1, 2)
SELECT group_a, group_b,
       ROUND(CASE WHEN na > 0 AND nb > 0 THEN d / (na * nb) END, 4) + 0.0
         AS cosine
FROM pr ORDER BY group_a, group_b
"""


# Q143 — grouped exact MAD (X106): robust dispersion per event type
# with the 1.4826 normal-consistency scale; exact two-pass medians
# (quantile_cont parity, the X81 convention).

def q143(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = load_table(spark, sf_dir, "events")
    return stats.grouped_mad(
        e, "event_type", "value", scale=1.4826, persist_fn=_cache_scoped
    ).orderBy("event_type")


Q143_SQL = """
WITH d AS (SELECT event_type AS g, CAST(value AS DOUBLE) AS v FROM events),
med AS (
  SELECT g, CAST(COUNT(*) AS BIGINT) AS n, quantile_cont(v, 0.5) AS m
  FROM d GROUP BY g),
mad AS (
  SELECT d.g, n, m, quantile_cont(abs(v - m), 0.5) AS md
  FROM d JOIN med ON d.g = med.g GROUP BY d.g, n, m)
SELECT g AS event_type, n,
       ROUND(m, 4) + 0.0 AS median,
       ROUND(md * 1.4826, 4) + 0.0 AS mad
FROM mad ORDER BY event_type
"""


# Q144 — time-weighted average (X107): per-type value average weighted
# by how long each observation held (until the user's next event) —
# the irregular-sampling correction the reference's equally-weighted
# poll averages lack. Integer-microsecond durations on both sides.

def q144(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = load_table(spark, sf_dir, "events")
    return ev_ops.time_weighted_avg(e).orderBy("event_type")


Q144_SQL = """
WITH s AS (
  SELECT event_type, CAST(value AS DOUBLE) AS v,
         epoch_us(ts) AS t,
         lead(epoch_us(ts)) OVER (PARTITION BY user_id
                                  ORDER BY ts, event_id) AS nt
  FROM events),
b AS (SELECT event_type, v, nt - t AS dur FROM s WHERE nt IS NOT NULL)
SELECT event_type,
       CAST(COUNT(*) AS BIGINT) AS n_intervals,
       ROUND(CAST(SUM(dur) AS DOUBLE) / 1000000.0, 4) + 0.0 AS total_seconds,
       ROUND(SUM(v * CAST(dur AS DOUBLE)) / CAST(SUM(dur) AS DOUBLE), 4) + 0.0
         AS twa
FROM b GROUP BY 1 ORDER BY event_type
"""


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


Q145_SQL = """
WITH e AS (SELECT vec_id, label, CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
x AS (SELECT vec_id, label, v, unnest(range(1, len(v) + 1)) AS dim FROM e),
dims AS (SELECT vec_id, label, CAST(dim AS INT) AS dim, v[dim] AS val FROM x),
cents AS (
  SELECT label, dim, ROUND(AVG(val), 4) + 0.0 AS m
  FROM dims GROUP BY label, dim),
sims AS (
  SELECT d.vec_id, d.label AS own_label, c.label AS cand_label,
         CASE WHEN SUM(c.m * c.m) > 0
              THEN SUM(d.val * c.m)
                   / (sqrt(SUM(d.val * d.val)) * sqrt(SUM(c.m * c.m)))
         END AS cos
  FROM dims d JOIN cents c ON d.dim = c.dim
  GROUP BY 1, 2, 3),
own AS (
  SELECT vec_id, own_label, cos AS own_cos FROM sims
  WHERE own_label = cand_label),
-- DISTINCT ON, not a cos = MAX(cos) self-equality join: DuckDB
-- re-executes a CTE per reference and parallel float SUM order is
-- nondeterministic, so an equality join between two evaluations of
-- sims intermittently drops rows at the last ulp.
oth AS (
  SELECT DISTINCT ON (vec_id) vec_id, cos AS best,
         cand_label AS best_other_label
  FROM sims WHERE own_label <> cand_label
  ORDER BY vec_id, cos DESC, cand_label ASC)
SELECT own.vec_id, own.own_label AS label, oth.best_other_label,
       ROUND(own.own_cos - oth.best, 4) + 0.0 AS margin
FROM own JOIN oth ON own.vec_id = oth.vec_id
ORDER BY margin ASC, own.vec_id ASC LIMIT 20
"""


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


Q146_SQL = """
WITH s AS (
  SELECT event_type, value,
         epoch_us(ts) AS t,
         lag(event_type) OVER w AS pt,
         lag(value) OVER w AS pv,
         lag(epoch_us(ts)) OVER w AS pu
  FROM events
  WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)),
f AS (
  SELECT event_type,
         COALESCE(event_type = pt AND value = pv
                  AND t - pu <= 60000000, FALSE) AS is_echo
  FROM s)
SELECT event_type,
       CAST(COUNT(*) AS BIGINT) AS n_total,
       CAST(SUM(CASE WHEN is_echo THEN 1 ELSE 0 END) AS BIGINT) AS n_echo,
       CAST(SUM(CASE WHEN NOT is_echo THEN 1 ELSE 0 END) AS BIGINT) AS n_kept
FROM f GROUP BY event_type ORDER BY event_type
"""


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


Q147_SQL = f"""
WITH b AS (
  SELECT min(epoch_us(ts)) AS lo, max(epoch_us(ts)) AS hi FROM events),
ticks AS (
  SELECT unnest(range(
    CAST(ceil(lo / 21600000000.0) AS BIGINT) * 21600000000,
    CAST(floor(hi / 21600000000.0) AS BIGINT) * 21600000000 + 1,
    21600000000)) AS t
  FROM b),
grid AS (
  SELECT u.user_id, ticks.t
  FROM (SELECT DISTINCT user_id FROM events) u CROSS JOIN ticks),
ev AS (
  SELECT user_id, epoch_us(ts) AS et, CAST(value AS DOUBLE) AS v
  FROM events),
loc AS (
  SELECT g.user_id, g.t, e.v
  FROM grid g ASOF LEFT JOIN ev e
    ON g.user_id = e.user_id AND g.t >= e.et)
SELECT strftime(make_timestamp(t), '%Y-%m-%d') AS day,
       CAST(COUNT(*) AS BIGINT) AS n_points,
       CAST(COUNT(DISTINCT user_id) AS BIGINT) AS n_users,
       {_dec4('SUM(v)')} AS sum_value
FROM loc WHERE v IS NOT NULL
GROUP BY 1 ORDER BY day
"""


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


Q148_SQL = """
WITH ud AS (
  SELECT DISTINCT date_trunc('day', ts) AS d, user_id FROM events),
days AS (SELECT DISTINCT d AS day FROM ud)
SELECT strftime(days.day, '%Y-%m-%d') AS day,
       CAST(COUNT(DISTINCT ud.d) AS BIGINT) AS n_days_covered,
       CAST(COUNT(DISTINCT ud.user_id) AS BIGINT) AS exact_active,
       TRUE AS ndv_within_bound
FROM days JOIN ud
  ON ud.d <= days.day AND ud.d >= days.day - INTERVAL 6 DAY
GROUP BY days.day ORDER BY day
"""


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


Q149_SQL = """
SELECT a.c_custkey AS id_a, b.c_custkey AS id_b,
       CAST(levenshtein(a.c_name, b.c_name) AS INT) AS dist
FROM customer a JOIN customer b ON a.c_custkey < b.c_custkey
WHERE levenshtein(a.c_name, b.c_name) <= 1
ORDER BY id_a, id_b
"""


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


_PR_DEC4 = _dec4("rank * 1000")
Q150_SQL = f"""
WITH e AS (
  SELECT DISTINCT 'c:' || o_custkey AS src, 's:' || l_suppkey AS dst
  FROM orders JOIN lineitem ON o_orderkey = l_orderkey),
nodes AS (SELECT src AS node FROM e UNION SELECT dst FROM e),
deg AS (SELECT src AS node, COUNT(*) AS deg FROM e GROUP BY src),
nd AS (SELECT nodes.node, deg.deg FROM nodes LEFT JOIN deg USING(node)),
p AS (SELECT CAST(COUNT(*) AS DOUBLE) AS n FROM nodes),
r0 AS (SELECT node, deg, 1.0 / (SELECT n FROM p) AS rank FROM nd),
r1 AS (
  SELECT nd.node, nd.deg,
         (1.0 - 0.85) / (SELECT n FROM p)
         + 0.85 * (COALESCE(c.inr, 0.0)
             + (SELECT COALESCE(SUM(rank), 0.0) FROM r0 WHERE deg IS NULL)
               / (SELECT n FROM p)) AS rank
  FROM nd LEFT JOIN (
    SELECT e.dst AS node, SUM(r.rank / r.deg) AS inr
    FROM e JOIN r0 r ON e.src = r.node GROUP BY e.dst) c USING(node)),
r2 AS (
  SELECT nd.node, nd.deg,
         (1.0 - 0.85) / (SELECT n FROM p)
         + 0.85 * (COALESCE(c.inr, 0.0)
             + (SELECT COALESCE(SUM(rank), 0.0) FROM r1 WHERE deg IS NULL)
               / (SELECT n FROM p)) AS rank
  FROM nd LEFT JOIN (
    SELECT e.dst AS node, SUM(r.rank / r.deg) AS inr
    FROM e JOIN r1 r ON e.src = r.node GROUP BY e.dst) c USING(node)),
r3 AS (
  SELECT nd.node, nd.deg,
         (1.0 - 0.85) / (SELECT n FROM p)
         + 0.85 * (COALESCE(c.inr, 0.0)
             + (SELECT COALESCE(SUM(rank), 0.0) FROM r2 WHERE deg IS NULL)
               / (SELECT n FROM p)) AS rank
  FROM nd LEFT JOIN (
    SELECT e.dst AS node, SUM(r.rank / r.deg) AS inr
    FROM e JOIN r2 r ON e.src = r.node GROUP BY e.dst) c USING(node))
SELECT node, {_PR_DEC4} AS rank_x1000 FROM r3 ORDER BY node
"""


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


Q151_SQL = """
WITH dim AS (
  SELECT c_custkey AS key FROM customer WHERE c_mktsegment = 'BUILDING'),
hs AS (SELECT UNNEST(['0', '1', '2']) AS i),
bits AS (
  SELECT DISTINCT
    CAST('0x' || substr(md5(CAST(key AS VARCHAR) || '#' || i), 1, 15) AS BIGINT)
      % 2048 AS bitpos
  FROM dim, hs),
fk AS (SELECT DISTINCT o_custkey AS key FROM orders),
probes AS (
  SELECT fk.key,
    CAST('0x' || substr(md5(CAST(fk.key AS VARCHAR) || '#' || i), 1, 15) AS BIGINT)
      % 2048 AS p
  FROM fk, hs),
flags AS (
  SELECT probes.key, BOOL_AND(bits.bitpos IS NOT NULL) AS bloom_pass
  FROM probes LEFT JOIN bits ON bits.bitpos = probes.p
  GROUP BY probes.key),
per_key AS (
  SELECT flags.key, flags.bloom_pass, dim.key IS NOT NULL AS exact_in
  FROM flags LEFT JOIN dim ON dim.key = flags.key)
SELECT o_orderpriority,
       CAST(COUNT(*) AS BIGINT) AS n_orders,
       CAST(SUM(CASE WHEN bloom_pass THEN 1 ELSE 0 END) AS BIGINT) AS bloom_pass_orders,
       CAST(SUM(CASE WHEN exact_in THEN 1 ELSE 0 END) AS BIGINT) AS exact_orders,
       CAST(SUM(CASE WHEN bloom_pass AND NOT exact_in THEN 1 ELSE 0 END) AS BIGINT)
         AS false_positive_orders,
       SUM(CASE WHEN exact_in AND NOT bloom_pass THEN 1 ELSE 0 END) = 0
         AS no_false_negatives
FROM orders JOIN per_key ON o_custkey = per_key.key
GROUP BY o_orderpriority ORDER BY o_orderpriority
"""


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


Q152_SQL = f"""
WITH m AS (
  SELECT p_size AS x, MAX(p_retailprice) AS y FROM part GROUP BY p_size),
f AS (
  SELECT x, y FROM m
  WHERE NOT EXISTS (SELECT 1 FROM m m2 WHERE m2.x < m.x AND m2.y >= m.y)),
c AS (
  SELECT p_size, p_retailprice, COUNT(*) AS n
  FROM part GROUP BY p_size, p_retailprice)
SELECT f.x AS p_size, {_dec4('f.y')} AS best_price,
       CAST(c.n AS BIGINT) AS n_points
FROM f JOIN c ON c.p_size = f.x AND c.p_retailprice = f.y
ORDER BY p_size
"""


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


Q153_SQL = f"""
WITH bi AS (
  SELECT DISTINCT l_orderkey AS b, p_brand AS i
  FROM lineitem JOIN part ON l_partkey = p_partkey),
n AS (SELECT CAST(COUNT(DISTINCT b) AS DOUBLE) AS n FROM bi),
ic AS (SELECT i, COUNT(*) AS ic FROM bi GROUP BY i),
pairs AS (
  SELECT a.i AS item_a, b.i AS item_b, COUNT(*) AS pair_n
  FROM bi a JOIN bi b ON a.b = b.b AND a.i < b.i
  GROUP BY a.i, b.i HAVING COUNT(*) >= 5)
SELECT item_a, item_b, CAST(pair_n AS BIGINT) AS pair_n,
       {_dec4('pair_n / n.n')} AS support,
       {_dec4('pair_n / ia.ic')} AS conf_a_to_b,
       {_dec4('pair_n / ib.ic')} AS conf_b_to_a,
       {_dec4('pair_n * n.n / (ia.ic * ib.ic)')} AS lift
FROM pairs, n
JOIN ic ia ON ia.i = pairs.item_a
JOIN ic ib ON ib.i = pairs.item_b
ORDER BY item_a, item_b
"""


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


Q154_SQL = f"""
WITH pu AS (
  SELECT user_id AS u,
         COALESCE(SUM(CASE WHEN ts < TIMESTAMP '2024-01-15 00:00:00'
                           THEN value END), 0.0) AS pre,
         COALESCE(SUM(CASE WHEN ts >= TIMESTAMP '2024-01-15 00:00:00'
                           THEN value END), 0.0) AS post,
         CAST(user_id % 2 AS INT) AS variant
  FROM events GROUP BY user_id),
m AS (SELECT COVAR_SAMP(pre, post) / VAR_SAMP(pre) AS theta,
             AVG(pre) AS mpre FROM pu),
adj AS (
  SELECT variant, post, post - m.theta * (pre - m.mpre) AS adj
  FROM pu, m)
SELECT variant, CAST(COUNT(*) AS BIGINT) AS n_users,
       {_dec4('AVG(post)')} AS mean_post,
       {_dec4('AVG(adj)')} AS mean_adjusted,
       {_dec4('VAR_SAMP(post)')} AS var_post,
       {_dec4('VAR_SAMP(adj)')} AS var_adjusted,
       {_dec4('1.0 - VAR_SAMP(adj) / VAR_SAMP(post)')} AS var_reduction
FROM adj GROUP BY variant ORDER BY variant
"""


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


Q155_SQL = """
WITH base AS (
  SELECT user_id AS u, ts AS t, event_id AS eid,
         CASE WHEN event_type IN ('view', 'click') THEN event_type END AS tt,
         CASE WHEN event_type IN ('view', 'click') THEN ts END AS tts,
         event_type = 'purchase' AS is_conv
  FROM events WHERE event_type IN ('view', 'click', 'purchase')),
carried AS (
  SELECT u, t, is_conv,
         LAST_VALUE(tt IGNORE NULLS) OVER w AS lt,
         LAST_VALUE(tts IGNORE NULLS) OVER w AS lts
  FROM base
  WINDOW w AS (PARTITION BY u ORDER BY t, is_conv, eid
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW))
SELECT CASE WHEN lt IS NOT NULL
             AND epoch_us(t) - epoch_us(lts) <= 259200000000
            THEN lt ELSE 'unattributed' END AS touch_type,
       CAST(COUNT(*) AS BIGINT) AS n_conversions
FROM carried WHERE is_conv GROUP BY 1 ORDER BY touch_type
"""


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


Q156_SQL = f"""
WITH base AS (
  SELECT c_custkey AS id,
         c_mktsegment || chr(31) || CAST(c_nationkey AS VARCHAR) AS blk,
         CAST(FLOOR(c_acctbal / 1000) AS BIGINT) AS f_bal,
         right(c_name, 2) AS f_sfx
  FROM customer),
nn AS (SELECT CAST(COUNT(*) AS DOUBLE) AS n FROM base),
ub AS (SELECT CAST(SUM(c * c) AS DOUBLE) / (SELECT n * n FROM nn) AS u
       FROM (SELECT COUNT(*) AS c FROM base GROUP BY f_bal)),
us AS (SELECT CAST(SUM(c * c) AS DOUBLE) / (SELECT n * n FROM nn) AS u
       FROM (SELECT COUNT(*) AS c FROM base GROUP BY f_sfx)),
pairs AS (
  SELECT (a.f_bal = b.f_bal) AS ab, (a.f_sfx = b.f_sfx) AS asx
  FROM base a JOIN base b ON a.blk = b.blk AND a.id < b.id),
w AS (
  SELECT CAST(ab AS INT) + CAST(asx AS INT) AS n_agree,
         (CASE WHEN ab THEN log2(0.9 / (SELECT u FROM ub))
               ELSE log2((1.0 - 0.9) / (1.0 - (SELECT u FROM ub))) END
          + CASE WHEN asx THEN log2(0.9 / (SELECT u FROM us))
                 ELSE log2((1.0 - 0.9) / (1.0 - (SELECT u FROM us))) END
         ) AS weight
  FROM pairs)
SELECT n_agree, CAST(COUNT(*) AS BIGINT) AS n_pairs,
       {_dec4('MIN(weight)')} AS min_weight,
       {_dec4('MAX(weight)')} AS max_weight
FROM w GROUP BY n_agree ORDER BY n_agree
"""


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


Q157_SQL = f"""
WITH pv AS (
  SELECT event_type AS g, value AS v, COUNT(*) AS c FROM events GROUP BY 1, 2),
cum AS (SELECT g, v, SUM(c) OVER (PARTITION BY g ORDER BY v) AS cw FROM pv),
tot AS (SELECT g, SUM(c) AS n FROM pv GROUP BY g),
ex AS (
  SELECT cum.g, MIN(CASE WHEN 2 * cw >= n THEN v END) AS q50,
         MIN(CASE WHEN 20 * cw >= 19 * n THEN v END) AS q95
  FROM cum JOIN tot ON tot.g = cum.g GROUP BY cum.g),
bins AS (
  SELECT event_type AS g, CAST(FLOOR(value / 25.0) AS BIGINT) AS b,
         COUNT(*) AS c
  FROM events GROUP BY 1, 2),
bcum AS (SELECT g, b, SUM(c) OVER (PARTITION BY g ORDER BY b) AS cw FROM bins),
btot AS (SELECT g, SUM(c) AS n FROM bins GROUP BY g),
sk AS (
  SELECT bcum.g, MIN(CASE WHEN 2 * cw >= n THEN b END) * 25.0 AS e50,
         MIN(CASE WHEN 20 * cw >= 19 * n THEN b END) * 25.0 AS e95
  FROM bcum JOIN btot ON btot.g = bcum.g GROUP BY bcum.g)
SELECT sk.g AS event_type,
       {_dec4('e50')} AS est_p50, {_dec4('q50')} AS exact_p50,
       (q50 >= e50 AND q50 < e50 + 25.0) AS p50_within_bin,
       {_dec4('e95')} AS est_p95, {_dec4('q95')} AS exact_p95,
       (q95 >= e95 AND q95 < e95 + 25.0) AS p95_within_bin
FROM sk JOIN ex ON ex.g = sk.g ORDER BY event_type
"""


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
    return graph.triangle_stats(edges, "src", "dst", persist_fn=_cache_scoped)


Q158_SQL = """
WITH cand AS (
  SELECT c.c_custkey AS a, c.c_custkey + i AS b
  FROM customer c, (SELECT UNNEST(generate_series(1, 30)) AS i)),
edges AS (
  SELECT a, b FROM cand
  WHERE EXISTS (SELECT 1 FROM customer x WHERE x.c_custkey = cand.b)
    AND CAST('0x' || substr(md5(CAST(a AS VARCHAR) || '#' || CAST(b AS VARCHAR)), 1, 15)
             AS BIGINT) % 4 = 0),
deg AS (
  SELECT node, COUNT(*) AS d
  FROM (SELECT a AS node FROM edges UNION ALL SELECT b FROM edges)
  GROUP BY node),
tri AS (
  SELECT COUNT(*) AS t
  FROM edges e1
  JOIN edges e2 ON e2.a = e1.a AND e2.b > e1.b
  JOIN edges e3 ON e3.a = e1.b AND e3.b = e2.b)
SELECT (SELECT CAST(COUNT(*) AS BIGINT) FROM deg) AS n_nodes,
       (SELECT CAST(COUNT(*) AS BIGINT) FROM edges) AS n_edges,
       (SELECT CAST(SUM(d * (d - 1) / 2) AS BIGINT) FROM deg) AS n_wedges,
       (SELECT CAST(t AS BIGINT) FROM tri) AS n_triangles,
       ROUND(3.0 * (SELECT t FROM tri)
             / (SELECT SUM(d * (d - 1) / 2) FROM deg), 4) + 0.0
         AS global_clustering
"""


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


Q159_SQL = f"""
WITH cells AS (
  SELECT event_type AS x, CAST(FLOOR(value / 100) AS BIGINT) AS y,
         COUNT(*) AS c
  FROM events GROUP BY 1, 2),
mx AS (SELECT x, SUM(c) AS cx FROM cells GROUP BY x),
my AS (SELECT y, SUM(c) AS cy FROM cells GROUP BY y),
nn AS (SELECT CAST(SUM(c) AS DOUBLE) AS n FROM cells)
SELECT (SELECT CAST(n AS BIGINT) FROM nn) AS n,
       {_dec4('(SELECT SUM((c / nn.n) * log2(c * nn.n / (cx * cy))) FROM cells JOIN mx USING(x) JOIN my USING(y), nn)')} AS mi_bits,
       {_dec4('(SELECT -SUM((cx / nn.n) * log2(cx / nn.n)) FROM mx, nn)')} AS h_x,
       {_dec4('(SELECT -SUM((cy / nn.n) * log2(cy / nn.n)) FROM my, nn)')} AS h_y
"""


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


Q160_SQL = f"""
SELECT CAST(LEAST(FLOOR((value / 500.0) * 10), 9) AS BIGINT) AS bin,
       CAST(COUNT(*) AS BIGINT) AS n,
       {_dec4('SUM(value / 500.0)')} AS sum_score,
       {_dec4("SUM(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END) / COUNT(*)")} AS frac_positive
FROM events GROUP BY 1 ORDER BY bin
"""


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


Q161_SQL = f"""
WITH pv AS (
  SELECT CAST(user_id % 3 AS INT) AS g, value AS v, COUNT(*) AS c,
         SUM(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END) AS p
  FROM events GROUP BY 1, 2),
cum AS (
  SELECT g, v, c, p,
         SUM(c) OVER (PARTITION BY g ORDER BY v) - c AS below
  FROM pv),
tot AS (SELECT g, SUM(c) AS n, SUM(p) AS np FROM pv GROUP BY g)
SELECT cum.g AS cohort,
       CAST(MAX(tot.n) AS BIGINT) AS n,
       CAST(MAX(tot.np) AS BIGINT) AS n_pos,
       {_dec4('(SUM(p * (2 * below + c + 1)) - MAX(np) * (MAX(np) + 1)) / (2.0 * MAX(np) * (MAX(n) - MAX(np)))')} AS auc
FROM cum JOIN tot ON tot.g = cum.g
GROUP BY cum.g ORDER BY cohort
"""


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


Q162_SQL = f"""
WITH day AS (
  SELECT date_trunc('day', ts) AS day, SUM(value) AS total
  FROM events GROUP BY 1),
tr AS (
  SELECT day, total,
         CASE WHEN COUNT(*) OVER w = 7
               AND date_diff('day', MIN(day) OVER w, MAX(day) OVER w) = 6
              THEN AVG(total) OVER w END AS trend
  FROM day
  WINDOW w AS (ORDER BY day ROWS BETWEEN 3 PRECEDING AND 3 FOLLOWING)),
d2 AS (SELECT tr.*, dayofweek(day) AS dow FROM tr),
sm AS (SELECT dow, AVG(total - trend) AS smn
       FROM d2 WHERE trend IS NOT NULL GROUP BY dow),
sc AS (SELECT AVG(smn) AS c FROM sm)
SELECT strftime(d2.day, '%Y-%m-%d') AS day,
       {_dec4('total')} AS total,
       {_dec4('trend')} AS trend,
       {_dec4('CASE WHEN trend IS NOT NULL THEN smn - sc.c END')} AS seasonal,
       {_dec4('CASE WHEN trend IS NOT NULL THEN total - trend - (smn - sc.c) END')} AS residual
FROM d2 LEFT JOIN sm USING(dow), sc ORDER BY day
"""


# Q163 — X128: first-order Markov transition matrix over per-user
# event sequences ((ts, id) total order); p_next is one exact-int
# division.

def q163(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = load_table(spark, sf_dir, "events")
    r = ev_ops.transition_matrix(e)
    return r.select(
        "a", "b", "n_ab", dec4("p_next").alias("p_next")
    ).orderBy("a", "b")


Q163_SQL = f"""
WITH s AS (
  SELECT a, b, COUNT(*) AS n_ab FROM (
    SELECT event_type AS b,
           LAG(event_type) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS a
    FROM events)
  WHERE a IS NOT NULL GROUP BY a, b),
m AS (SELECT a, SUM(n_ab) AS na FROM s GROUP BY a)
SELECT s.a, s.b, CAST(n_ab AS BIGINT) AS n_ab,
       {_dec4('n_ab / na')} AS p_next
FROM s JOIN m USING(a) ORDER BY a, b
"""


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


Q164_SQL = f"""
WITH day AS (
  SELECT date_trunc('day', ts) AS day, AVG(value) AS m
  FROM events GROUP BY 1),
g AS (SELECT AVG(m) AS gm, STDDEV_SAMP(m) AS gs,
             CAST(COUNT(*) AS DOUBLE) AS gn FROM day),
cs AS (
  SELECT day.day, day.m,
         SUM(day.m - g.gm) OVER (ORDER BY day.day
             ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cusum,
         g.gs, g.gn
  FROM day, g),
pk AS (SELECT MAX(ABS(cusum)) AS pk FROM cs)
SELECT strftime(day, '%Y-%m-%d') AS day,
       {_dec4('m')} AS day_mean,
       {_dec4('cusum')} AS cusum,
       (ABS(cusum) = (SELECT pk FROM pk)
        AND ABS(cusum) / (gs * SQRT(gn)) >= 4.0 / 2.0) AS is_peak
FROM cs ORDER BY day
"""


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


Q165_SQL = """
WITH cand AS (
  SELECT c.c_custkey AS a, c.c_custkey + i AS b
  FROM customer c, (SELECT UNNEST(generate_series(1, 30)) AS i)),
e0 AS (
  SELECT a, b FROM cand
  WHERE EXISTS (SELECT 1 FROM customer x WHERE x.c_custkey = cand.b)
    AND CAST('0x' || substr(md5(CAST(a AS VARCHAR) || '#' || CAST(b AS VARCHAR)), 1, 15)
             AS BIGINT) % 4 = 0),
d0 AS (SELECT node, COUNT(*) AS d FROM (SELECT a AS node FROM e0 UNION ALL SELECT b FROM e0) GROUP BY 1),
a1 AS (SELECT node FROM d0 WHERE d >= 13),
e1 AS (SELECT a, b FROM e0 WHERE a IN (SELECT node FROM a1) AND b IN (SELECT node FROM a1)),
d1 AS (SELECT node, COUNT(*) AS d FROM (SELECT a AS node FROM e1 UNION ALL SELECT b FROM e1) GROUP BY 1),
a2 AS (SELECT node FROM d1 WHERE d >= 13),
e2 AS (SELECT a, b FROM e1 WHERE a IN (SELECT node FROM a2) AND b IN (SELECT node FROM a2)),
d2 AS (SELECT node, COUNT(*) AS d FROM (SELECT a AS node FROM e2 UNION ALL SELECT b FROM e2) GROUP BY 1),
a3 AS (SELECT node FROM d2 WHERE d >= 13),
e3 AS (SELECT a, b FROM e2 WHERE a IN (SELECT node FROM a3) AND b IN (SELECT node FROM a3)),
d3 AS (SELECT node, COUNT(*) AS d FROM (SELECT a AS node FROM e3 UNION ALL SELECT b FROM e3) GROUP BY 1)
SELECT node, CAST(d AS BIGINT) AS degree,
       (SELECT COALESCE(BOOL_AND(d >= 13), TRUE) FROM d3) AS converged
FROM d3 ORDER BY node
"""


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


Q166_SQL = f"""
SELECT COALESCE(o_orderpriority, '(all)') AS priority,
       COALESCE(o_orderstatus, '(all)') AS status,
       CAST(GROUPING(o_orderpriority) AS INT) AS g_priority,
       CAST(GROUPING(o_orderstatus) AS INT) AS g_status,
       CAST(COUNT(*) AS BIGINT) AS n,
       {_dec4('SUM(o_totalprice)')} AS sum_price
FROM orders
GROUP BY GROUPING SETS ((o_orderpriority), (o_orderstatus), ())
ORDER BY g_priority, g_status, priority, status
"""


# Q167 — X132: Theil-Sen robust trend of the daily total series.
# Lower-median selection (X100 convention) on both sides — no
# interpolation FP; every slope is one division of identical doubles.

def q167(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = load_table(spark, sf_dir, "events")
    r = ev_ops.theil_sen_trend(e)
    return r.select(
        "n_days", dec4("slope").alias("slope"), dec4("intercept").alias("intercept")
    )


Q167_SQL = f"""
WITH day AS (
  SELECT date_trunc('day', ts) AS d, SUM(value) AS y FROM events GROUP BY 1),
base AS (
  SELECT CAST(date_diff('day', (SELECT MIN(d) FROM day), d) AS BIGINT) AS x, y
  FROM day),
slopes AS (
  SELECT (b.y - a.y) / (b.x - a.x) AS s
  FROM base a JOIN base b ON a.x < b.x),
ms AS (
  SELECT MIN(s) AS slope FROM (
    SELECT s, SUM(c) OVER (ORDER BY s) AS cum, SUM(c) OVER () AS n
    FROM (SELECT s, COUNT(*) AS c FROM slopes GROUP BY s))
  WHERE 2 * cum >= n),
resid AS (SELECT y - (SELECT slope FROM ms) * x AS r FROM base),
mi AS (
  SELECT MIN(r) AS intercept FROM (
    SELECT r, SUM(c) OVER (ORDER BY r) AS cum, SUM(c) OVER () AS n
    FROM (SELECT r, COUNT(*) AS c FROM resid GROUP BY r))
  WHERE 2 * cum >= n)
SELECT (SELECT CAST(COUNT(*) AS BIGINT) FROM day) AS n_days,
       {_dec4('(SELECT slope FROM ms)')} AS slope,
       {_dec4('(SELECT intercept FROM mi)')} AS intercept
"""


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


Q168_SQL = f"""
WITH b AS (
  SELECT MIN(epoch_us(ts)) AS lo, MAX(epoch_us(ts)) AS hi FROM events),
keys AS (SELECT DISTINCT user_id AS k FROM events),
grid AS (
  SELECT k, g.t, CAST(NULL AS DOUBLE) AS v, FALSE AS obs,
         CAST(NULL AS BIGINT) AS tb
  FROM keys, b,
       UNNEST(generate_series(
         CAST(CEIL(lo / 21600000000.0) * 21600000000 AS BIGINT),
         CAST(FLOOR(hi / 21600000000.0) * 21600000000 AS BIGINT),
         21600000000)) AS g(t)),
obs AS (
  SELECT user_id AS k, epoch_us(ts) AS t, value AS v, TRUE AS obs,
         event_id AS tb
  FROM events),
u AS (SELECT * FROM grid UNION ALL SELECT * FROM obs),
c AS (
  SELECT k, t, obs,
         LAST_VALUE(CASE WHEN obs THEN v END IGNORE NULLS) OVER fwd AS pv,
         LAST_VALUE(CASE WHEN obs THEN t END IGNORE NULLS) OVER fwd AS pt,
         LAST_VALUE(CASE WHEN obs THEN v END IGNORE NULLS) OVER bwd AS nv,
         LAST_VALUE(CASE WHEN obs THEN t END IGNORE NULLS) OVER bwd AS nt
  FROM u
  WINDOW fwd AS (PARTITION BY k ORDER BY t ASC, obs DESC, tb ASC
                 ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW),
         bwd AS (PARTITION BY k ORDER BY t DESC, obs DESC, tb DESC
                 ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)),
ticks AS (
  SELECT strftime(make_timestamp(t), '%Y-%m-%d') AS day,
         CASE WHEN nt = pt THEN pv
              ELSE pv + (nv - pv) * (t - pt) / (nt - pt) END AS value
  FROM c
  WHERE NOT obs AND pt IS NOT NULL AND nt IS NOT NULL)
SELECT day, CAST(COUNT(*) AS BIGINT) AS n_points,
       {_dec4('SUM(value)')} AS sum_value
FROM ticks GROUP BY day ORDER BY day
"""


# Q169 — X134: audio loudness/silence profile over the silence-padded
# synthetic WAV corpus; profiles are WRITTEN TO PARQUET first (the
# q103/q122/q123 signature-evidence convention) so DuckDB aggregates
# the same decoded stats; the decode itself is pinned by the X134
# pytest (hand-built WAV with known 100 ms pads).

_Q169_PROF_PATH = _os.path.join(
    _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))),
    "spark-warehouse",
    "q169_audio_profiles",
)


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


Q169_SQL = f"""
SELECT CAST(media_id % 5 AS INT) AS lead_group,
       CAST(COUNT(*) AS BIGINT) AS n,
       CAST(SUM(lead_silence_ms) AS BIGINT) AS sum_lead_ms,
       CAST(SUM(trail_silence_ms) AS BIGINT) AS sum_trail_ms,
       {_dec4('SUM(silence_fraction)')} AS sum_silence_frac,
       {_dec4('SUM(rms_db)')} AS sum_rms_db
FROM read_parquet('{_Q169_PROF_PATH}/*.parquet')
GROUP BY 1 ORDER BY lead_group
"""


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


Q170_SQL = f"""
WITH toks AS (
  SELECT string_split(text, ' ') AS t FROM documents
  WHERE len(string_split(text, ' ')) >= 2),
pr AS (
  SELECT UNNEST(list_transform(range(1, len(t)),
                i -> {{'a': t[i], 'b': t[i + 1]}})) AS p
  FROM toks),
e AS (
  SELECT DISTINCT a, b FROM (
    SELECT p.a AS a, p.b AS b FROM pr WHERE p.a <> p.b
    UNION ALL
    SELECT p.b AS a, p.a AS b FROM pr WHERE p.a <> p.b)),
nodes AS (SELECT a AS node FROM e UNION SELECT b FROM e),
deg AS (SELECT a AS node, COUNT(*) AS deg FROM e GROUP BY a),
nd AS (SELECT nodes.node, deg.deg FROM nodes LEFT JOIN deg USING(node)),
p AS (SELECT CAST(COUNT(*) AS DOUBLE) AS n FROM nodes),
r0 AS (SELECT node, deg, 1.0 / (SELECT n FROM p) AS rank FROM nd),
r1 AS (
  SELECT nd.node, nd.deg,
         (1.0 - 0.85) / (SELECT n FROM p)
         + 0.85 * (COALESCE(c.inr, 0.0)
             + (SELECT COALESCE(SUM(rank), 0.0) FROM r0 WHERE deg IS NULL)
               / (SELECT n FROM p)) AS rank
  FROM nd LEFT JOIN (
    SELECT e.b AS node, SUM(r.rank / r.deg) AS inr
    FROM e JOIN r0 r ON e.a = r.node GROUP BY e.b) c USING(node)),
r2 AS (
  SELECT nd.node, nd.deg,
         (1.0 - 0.85) / (SELECT n FROM p)
         + 0.85 * (COALESCE(c.inr, 0.0)
             + (SELECT COALESCE(SUM(rank), 0.0) FROM r1 WHERE deg IS NULL)
               / (SELECT n FROM p)) AS rank
  FROM nd LEFT JOIN (
    SELECT e.b AS node, SUM(r.rank / r.deg) AS inr
    FROM e JOIN r1 r ON e.a = r.node GROUP BY e.b) c USING(node)),
r3 AS (
  SELECT nd.node, nd.deg,
         (1.0 - 0.85) / (SELECT n FROM p)
         + 0.85 * (COALESCE(c.inr, 0.0)
             + (SELECT COALESCE(SUM(rank), 0.0) FROM r2 WHERE deg IS NULL)
               / (SELECT n FROM p)) AS rank
  FROM nd LEFT JOIN (
    SELECT e.b AS node, SUM(r.rank / r.deg) AS inr
    FROM e JOIN r2 r ON e.a = r.node GROUP BY e.b) c USING(node))
SELECT node AS word,
       {_dec4('ROUND(rank * 1000, 4)')} AS rank_x1000
FROM r3 ORDER BY ROUND(rank * 1000, 4) DESC, node LIMIT 20
"""


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


Q171_SQL = """
WITH r AS (
  SELECT lang AS stratum,
         ROW_NUMBER() OVER (
           PARTITION BY lang
           ORDER BY CAST('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 15)
                         AS BIGINT), doc_id) AS rnk,
         COUNT(*) OVER (PARTITION BY lang) AS n
  FROM documents)
SELECT stratum,
       CASE WHEN rnk <= CEIL(0.8 * n) THEN 'train'
            WHEN rnk <= CEIL(0.8 * n) + CEIL(0.1 * n) THEN 'val'
            ELSE 'test' END AS split,
       CAST(COUNT(*) AS BIGINT) AS n_docs
FROM r GROUP BY 1, 2 ORDER BY stratum, split
"""


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


Q172_SQL = """
WITH ua AS (SELECT DISTINCT event_type AS t, user_id FROM events)
SELECT a.t AS g_a, b.t AS g_b,
       CAST(COUNT(*) AS BIGINT) AS exact_overlap,
       TRUE AS within_bound
FROM ua a JOIN ua b ON a.user_id = b.user_id AND a.t < b.t
GROUP BY a.t, b.t ORDER BY g_a, g_b
"""


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


Q173_SQL = f"""
SELECT event_type, CAST(COUNT(*) AS BIGINT) AS n,
       {_dec4('SUM(value)')} AS sum_value,
       {_dec4('MIN(value)')} AS min_value,
       {_dec4('MAX(value)')} AS max_value
FROM events GROUP BY event_type ORDER BY event_type
"""


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


Q174_SQL = f"""
WITH tests AS (
  SELECT c_custkey AS test_id,
         CASE WHEN c_custkey % 50 = 0
              THEN (CAST('0x' || substr(md5(CAST(c_custkey AS VARCHAR)), 1, 15)
                         AS BIGINT) / 1152921504606846976.0) / 1e6
              ELSE CAST('0x' || substr(md5(CAST(c_custkey AS VARCHAR)), 1, 15)
                        AS BIGINT) / 1152921504606846976.0 END AS p
  FROM customer),
ranked AS (
  SELECT test_id, p,
         ROW_NUMBER() OVER (ORDER BY p, test_id) AS rnk,
         CAST(COUNT(*) OVER () AS DOUBLE) AS m
  FROM tests),
k AS (
  SELECT COALESCE(MAX(CASE WHEN p <= rnk / m * 0.1 THEN rnk END), 0) AS kmax
  FROM ranked)
SELECT test_id, CAST(rnk AS BIGINT) AS rank,
       {_dec4('p * 1000')} AS p_x1000
FROM ranked, k WHERE rnk <= kmax ORDER BY rank
"""


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


Q175_SQL = """
WITH lat AS (
  SELECT LAG(event_type) OVER w || '->' || event_type AS pair,
         epoch_us(ts) - LAG(epoch_us(ts)) OVER w AS lat_us
  FROM events
  WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)),
f AS (SELECT pair, lat_us FROM lat WHERE pair IS NOT NULL),
pv AS (SELECT pair, lat_us AS v, COUNT(*) AS c FROM f GROUP BY 1, 2),
cum AS (
  SELECT pair, v, SUM(c) OVER (PARTITION BY pair ORDER BY v) AS cw
  FROM pv),
tot AS (SELECT pair, SUM(c) AS n FROM pv GROUP BY pair)
SELECT cum.pair,
       CAST(MAX(tot.n) AS BIGINT) AS n_transitions,
       CAST(MIN(CASE WHEN 2 * cw >= n THEN v END) AS BIGINT) AS p50_lat_us,
       CAST(MIN(CASE WHEN 10 * cw >= 9 * n THEN v END) AS BIGINT) AS p90_lat_us
FROM cum JOIN tot ON tot.pair = cum.pair
GROUP BY cum.pair ORDER BY cum.pair
"""


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


Q176_SQL = """
WITH wide AS (
  SELECT o_orderpriority,
         COALESCE(SUM(CASE WHEN o_orderstatus = 'F' THEN 1 END), 0) AS F,
         COALESCE(SUM(CASE WHEN o_orderstatus = 'O' THEN 1 END), 0) AS O,
         COALESCE(SUM(CASE WHEN o_orderstatus = 'P' THEN 1 END), 0) AS P
  FROM orders GROUP BY o_orderpriority)
SELECT o_orderpriority, status, CAST(n_orders AS BIGINT) AS n_orders
FROM wide UNPIVOT (n_orders FOR status IN (F, O, P))
ORDER BY o_orderpriority, status
"""


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


Q177_SQL = """
WITH lk AS (SELECT c_custkey AS k FROM customer),
rk AS (SELECT o_custkey AS k FROM orders),
hs AS (SELECT UNNEST(generate_series(0, 3)) AS j),
skl AS (
  SELECT j,
         CAST('0x' || substr(md5(CAST(j AS VARCHAR) || ':' || CAST(k AS VARCHAR)),
                             1, 15) AS BIGINT) % 65536 AS bucket,
         COUNT(*) AS c
  FROM lk, hs GROUP BY 1, 2),
skr AS (
  SELECT j,
         CAST('0x' || substr(md5(CAST(j AS VARCHAR) || ':' || CAST(k AS VARCHAR)),
                             1, 15) AS BIGINT) % 65536 AS bucket,
         COUNT(*) AS c
  FROM rk, hs GROUP BY 1, 2),
pr AS (SELECT skl.j, SUM(skl.c * skr.c) AS est
       FROM skl JOIN skr ON skl.j = skr.j AND skl.bucket = skr.bucket
       GROUP BY skl.j),
ex AS (SELECT COUNT(*) AS exact FROM lk JOIN rk ON lk.k = rk.k),
nn AS (SELECT (SELECT COUNT(*) FROM lk) AS nl, (SELECT COUNT(*) FROM rk) AS nr)
SELECT CAST((SELECT MIN(est) FROM pr) AS BIGINT) AS est_join_size,
       CAST((SELECT exact FROM ex) AS BIGINT) AS exact_join_size,
       (SELECT MIN(est) FROM pr) >= (SELECT exact FROM ex) AS no_underestimate,
       (SELECT MIN(est) FROM pr)
         <= (SELECT exact FROM ex) + 3.0 * nn.nl * nn.nr / 65536.0
         AS within_bound
FROM nn
"""


# Q178 — X144: top-15 in-session 3-step event-type paths (30-minute
# sessions); exact integer counts, path-string tiebreak on the cut.

def q178(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = load_table(spark, sf_dir, "events")
    return ev_ops.top_session_paths(
        e, gap="30 MINUTES", path_len=3, top_k=15
    )


Q178_SQL = """
WITH s AS (
  SELECT user_id, ts, event_id, event_type,
         SUM(new_s) OVER (PARTITION BY user_id ORDER BY ts, event_id
                          ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
           AS session_idx
  FROM (
    SELECT *, CASE WHEN LAG(ts) OVER w IS NULL
                     OR ts > LAG(ts) OVER w + INTERVAL 30 MINUTE
                   THEN 1 ELSE 0 END AS new_s
    FROM events
    WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id))),
paths AS (
  SELECT LAG(event_type, 2) OVER w2 || '>' || LAG(event_type, 1) OVER w2
           || '>' || event_type AS path
  FROM s
  WINDOW w2 AS (PARTITION BY user_id, session_idx ORDER BY ts, event_id))
SELECT path, CAST(COUNT(*) AS BIGINT) AS n
FROM paths WHERE path IS NOT NULL
GROUP BY path ORDER BY n DESC, path LIMIT 15
"""


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


Q179_SQL = f"""
WITH day AS (
  SELECT event_type AS g, date_trunc('day', ts) AS day, AVG(value) AS m,
         SUM(value) AS s
  FROM events GROUP BY 1, 2),
med AS (SELECT g, quantile_cont(m, 0.5) AS md FROM day GROUP BY g),
mad AS (
  SELECT day.g, ROUND(MAX(md), 4) + 0.0 AS median,
         ROUND(quantile_cont(abs(m - md), 0.5), 4) + 0.0 AS mad
  FROM day JOIN med ON day.g = med.g GROUP BY day.g),
sc AS (
  SELECT day.g, day.day, day.s,
         CASE WHEN mad.mad > 0
              THEN 0.6745 * (day.m - mad.median) / mad.mad END AS ms
  FROM day JOIN mad ON mad.g = day.g)
SELECT g AS event_type, strftime(day, '%Y-%m-%d') AS day,
       {_dec4('s')} AS day_sum,
       {_dec4('ms')} AS m_score,
       ABS(ms) > 3.5 AS is_outlier
FROM sc ORDER BY event_type, day
"""


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


Q180_SQL = f"""
WITH ct AS (
  SELECT source AS c, UNNEST(string_split(text, ' ')) AS t
  FROM documents),
cnt AS (SELECT c, t, COUNT(*) AS n FROM ct GROUP BY 1, 2),
ctot AS (SELECT c, SUM(n) AS ctot FROM cnt GROUP BY c),
ttot AS (SELECT t, SUM(n) AS ttot FROM cnt GROUP BY t),
aa AS (SELECT AVG(ctot) AS a FROM ctot),
scored AS (
  SELECT cnt.c, cnt.t,
         ROUND((n / ctot.ctot) * ln(1.0 + aa.a / ttot.ttot) * 10000, 4)
           AS score
  FROM cnt JOIN ctot ON ctot.c = cnt.c JOIN ttot ON ttot.t = cnt.t, aa),
ranked AS (
  SELECT c, t, score,
         ROW_NUMBER() OVER (PARTITION BY c ORDER BY score DESC, t) AS rnk
  FROM scored)
SELECT c AS source, t AS term, CAST(rnk AS INT) AS rank,
       {_dec4('score')} AS score_x10k
FROM ranked WHERE rnk <= 5 ORDER BY source, rank
"""


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


Q181_SQL = f"""
WITH r1 AS (
  SELECT p_brand AS g, p_partkey AS it,
         ROW_NUMBER() OVER (PARTITION BY p_brand
                            ORDER BY p_retailprice DESC, p_partkey) AS rnk
  FROM part),
r2 AS (
  SELECT p_brand AS g, p_partkey AS it,
         ROW_NUMBER() OVER (PARTITION BY p_brand
                            ORDER BY p_size ASC, p_partkey) AS rnk
  FROM part),
u AS (
  SELECT g, it, 1.0 / (60.0 + rnk) AS t FROM r1 WHERE rnk <= 10
  UNION ALL
  SELECT g, it, 1.0 / (60.0 + rnk) AS t FROM r2 WHERE rnk <= 10),
fused AS (
  SELECT g, it, SUM(t) AS s, COUNT(*) AS ns FROM u GROUP BY g, it),
ranked AS (
  SELECT g, it, s, ns,
         ROW_NUMBER() OVER (PARTITION BY g
                            ORDER BY ROUND(s * 10000, 4) DESC, it) AS rank
  FROM fused)
SELECT g AS brand, it AS partkey, CAST(rank AS INT) AS rank,
       {_dec4('s * 10000')} AS rrf_x10k,
       CAST(ns AS INT) AS n_systems
FROM ranked WHERE rank <= 3 ORDER BY brand, rank
"""




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


Q182_SQL = f"""
WITH e AS MATERIALIZED (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
xx AS MATERIALIZED (SELECT vec_id, v, unnest(range(1, len(v) + 1)) AS dim FROM e),
p AS MATERIALIZED (SELECT vec_id, CAST(dim AS INT) AS dim, v[dim] AS val FROM xx),
tri AS MATERIALIZED (
  SELECT a.dim AS i, b.dim AS j, ROUND(corr(a.val, b.val), 4) + 0.0 AS v
  FROM p a JOIN p b ON a.vec_id = b.vec_id AND a.dim < b.dim
  GROUP BY 1, 2),
dims AS MATERIALIZED (SELECT DISTINCT dim AS j FROM p),
m AS MATERIALIZED (
  SELECT i, j, v FROM tri
  UNION ALL SELECT j, i, v FROM tri
  UNION ALL SELECT j, j, 1.0 FROM dims),
x0 AS MATERIALIZED (SELECT j, 1.0 / SQRT(CAST((SELECT COUNT(*) FROM dims) AS DOUBLE)) AS x
       FROM dims),
y1 AS MATERIALIZED (
  SELECT m.i AS j, SUM(m.v * p.x) AS y
  FROM m JOIN x0 p ON m.j = p.j GROUP BY m.i),
n1 AS MATERIALIZED (SELECT SQRT(SUM(y * y)) AS n FROM y1),
x1 AS MATERIALIZED (SELECT j, y / (SELECT n FROM n1) AS x FROM y1),
y2 AS MATERIALIZED (
  SELECT m.i AS j, SUM(m.v * p.x) AS y
  FROM m JOIN x1 p ON m.j = p.j GROUP BY m.i),
n2 AS MATERIALIZED (SELECT SQRT(SUM(y * y)) AS n FROM y2),
x2 AS MATERIALIZED (SELECT j, y / (SELECT n FROM n2) AS x FROM y2),
y3 AS MATERIALIZED (
  SELECT m.i AS j, SUM(m.v * p.x) AS y
  FROM m JOIN x2 p ON m.j = p.j GROUP BY m.i),
n3 AS MATERIALIZED (SELECT SQRT(SUM(y * y)) AS n FROM y3),
x3 AS MATERIALIZED (SELECT j, y / (SELECT n FROM n3) AS x FROM y3),
y4 AS MATERIALIZED (
  SELECT m.i AS j, SUM(m.v * p.x) AS y
  FROM m JOIN x3 p ON m.j = p.j GROUP BY m.i),
n4 AS MATERIALIZED (SELECT SQRT(SUM(y * y)) AS n FROM y4),
x4 AS MATERIALIZED (SELECT j, y / (SELECT n FROM n4) AS x FROM y4),
y5 AS MATERIALIZED (
  SELECT m.i AS j, SUM(m.v * p.x) AS y
  FROM m JOIN x4 p ON m.j = p.j GROUP BY m.i),
n5 AS MATERIALIZED (SELECT SQRT(SUM(y * y)) AS n FROM y5),
x5 AS MATERIALIZED (SELECT j, y / (SELECT n FROM n5) AS x FROM y5),
y6 AS MATERIALIZED (
  SELECT m.i AS j, SUM(m.v * p.x) AS y
  FROM m JOIN x5 p ON m.j = p.j GROUP BY m.i),
n6 AS MATERIALIZED (SELECT SQRT(SUM(y * y)) AS n FROM y6),
x6 AS MATERIALIZED (SELECT j, y / (SELECT n FROM n6) AS x FROM y6),
y7 AS MATERIALIZED (
  SELECT m.i AS j, SUM(m.v * p.x) AS y
  FROM m JOIN x6 p ON m.j = p.j GROUP BY m.i),
n7 AS MATERIALIZED (SELECT SQRT(SUM(y * y)) AS n FROM y7),
x7 AS MATERIALIZED (SELECT j, y / (SELECT n FROM n7) AS x FROM y7),
y8 AS MATERIALIZED (
  SELECT m.i AS j, SUM(m.v * p.x) AS y
  FROM m JOIN x7 p ON m.j = p.j GROUP BY m.i),
n8 AS MATERIALIZED (SELECT SQRT(SUM(y * y)) AS n FROM y8),
x8 AS MATERIALIZED (SELECT j, y / (SELECT n FROM n8) AS x FROM y8),
y9 AS MATERIALIZED (
  SELECT m.i AS j, SUM(m.v * p.x) AS y
  FROM m JOIN x8 p ON m.j = p.j GROUP BY m.i),
n9 AS MATERIALIZED (SELECT SQRT(SUM(y * y)) AS n FROM y9),
x9 AS MATERIALIZED (SELECT j, y / (SELECT n FROM n9) AS x FROM y9),
y10 AS MATERIALIZED (
  SELECT m.i AS j, SUM(m.v * p.x) AS y
  FROM m JOIN x9 p ON m.j = p.j GROUP BY m.i),
n10 AS MATERIALIZED (SELECT SQRT(SUM(y * y)) AS n FROM y10),
x10 AS MATERIALIZED (SELECT j, y / (SELECT n FROM n10) AS x FROM y10),
mx AS MATERIALIZED (SELECT m.i AS j, SUM(m.v * p.x) AS y FROM m JOIN x10 p ON m.j = p.j GROUP BY m.i),
ray AS MATERIALIZED (SELECT SUM(x10.x * mx.y) AS ev FROM mx JOIN x10 ON x10.j = mx.j)
SELECT CAST(x10.j AS INT) AS dim_index,
       {_dec4('x10.x * 1000')} AS loading_x1000,
       {_dec4('(SELECT ev FROM ray)')} AS eigenvalue
FROM x10 ORDER BY dim_index
"""


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


Q183_SQL = f"""
WITH cells AS (
  SELECT event_type AS g, value AS v, COUNT(*) AS c
  FROM events GROUP BY 1, 2),
gcum AS (
  SELECT g, v, c, SUM(c) OVER (PARTITION BY g ORDER BY v) AS r
  FROM cells),
gtot AS (SELECT g, SUM(c) AS ng FROM cells GROUP BY g),
pooled AS (SELECT v, SUM(c) AS pc FROM cells GROUP BY v),
pcum AS (SELECT v AS nv, pc, SUM(pc) OVER (ORDER BY v) AS pcm FROM pooled),
nn AS (SELECT SUM(pc) AS N FROM pooled),
segs AS (SELECT nv, pcm - pc AS lo, pcm AS hi FROM pcum),
mapped AS (
  SELECT gcum.g, gcum.c, segs.nv
  FROM gcum JOIN gtot ON gtot.g = gcum.g, nn
  JOIN segs ON segs.lo * gtot.ng < gcum.r * nn.N
           AND gcum.r * nn.N <= segs.hi * gtot.ng)
SELECT g AS event_type, CAST(SUM(c) AS BIGINT) AS n_rows,
       {_dec4('SUM(nv * c)')} AS sum_normalized
FROM mapped GROUP BY g ORDER BY event_type
"""


# Q184 — X151: dHash (gradient-hash) image near-dup pairs — the third
# member of the perceptual trio; signatures written to parquet first
# (the q103/q122 evidence convention), DuckDB replays the brute-force
# bit_count(xor) verify.

_Q184_SIGS_PATH = _os.path.join(
    _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))),
    "spark-warehouse",
    "q184_media_dhash",
)


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


Q184_SQL = f"""
WITH s AS (
  SELECT media_id, dhash
  FROM read_parquet('{_Q184_SIGS_PATH}/*.parquet')
  WHERE dhash IS NOT NULL)
SELECT a.media_id AS id_a, b.media_id AS id_b,
       CAST(bit_count(xor(a.dhash, b.dhash)) AS INT) AS hamming
FROM s a JOIN s b ON a.media_id < b.media_id
WHERE bit_count(xor(a.dhash, b.dhash)) <= 6
ORDER BY id_a, id_b
"""


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


Q185_SQL = """
WITH s AS (
  SELECT lang, string_split(lower(text), ' ') AS lt FROM documents),
g AS (
  SELECT lang,
         len(list_filter(lt, t -> t IN ('the','and','of','is'))) AS en,
         len(list_filter(lt, t -> t IN ('der','die','und','ist'))) AS de,
         len(list_filter(lt, t -> t IN ('le','la','et','est'))) AS fr,
         len(list_filter(lt, t -> t IN ('el','los','y','es'))) AS es
  FROM s),
v AS (
  SELECT lang,
         CASE WHEN greatest(en, de, fr, es) = 0 THEN 'und'
              WHEN en = greatest(en, de, fr, es) THEN 'en'
              WHEN de = greatest(en, de, fr, es) THEN 'de'
              WHEN fr = greatest(en, de, fr, es) THEN 'fr'
              ELSE 'es' END AS detected
  FROM g)
SELECT lang, detected, CAST(COUNT(*) AS BIGINT) AS n_docs
FROM v GROUP BY lang, detected ORDER BY lang, detected
"""


# Q186 — dataset card: the one-row corpus summary a dataset release
# ships with (docs, exact-dup rate, token total, language/source
# cardinalities, length quantiles) — pure composition of declared
# machinery (q166 X-less precedent), all counts exact integers, the
# quantiles X100's lower convention.

def q186(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load_table(spark, sf_dir, "documents")
    base = d.select(
        "doc_id",
        F.md5(F.coalesce(F.col("text"), F.lit("\x00"))).alias("__h"),
        F.size(F.split("text", " ")).alias("__tok"),
        "lang",
        "source",
        "n_chars",
    )
    agg = base.agg(
        F.count("*").cast("bigint").alias("n_docs"),
        F.count_distinct("__h").cast("bigint").alias("n_unique_texts"),
        F.sum("__tok").cast("bigint").alias("n_tokens"),
        F.count_distinct("lang").cast("bigint").alias("n_langs"),
        F.count_distinct("source").cast("bigint").alias("n_sources"),
        F.min("n_chars").cast("bigint").alias("min_chars"),
        F.max("n_chars").cast("bigint").alias("max_chars"),
    )
    med = stats.weighted_quantile(
        base.withColumn("__one", F.lit(1.0)),
        [],
        "__tok",
        "__one",
        quantiles=((1, 2),),
    ).select(F.col("wq_1_2").cast("bigint").alias("median_tokens"))
    return (
        agg.crossJoin(F.broadcast(med))
        .select(
            "n_docs",
            "n_unique_texts",
            (
                F.lit(1.0) - F.col("n_unique_texts") / F.col("n_docs")
            ).alias("__dup"),
            "n_tokens",
            "median_tokens",
            "n_langs",
            "n_sources",
            "min_chars",
            "max_chars",
        )
        .select(
            "n_docs", "n_unique_texts",
            dec4("__dup").alias("dup_rate"),
            "n_tokens", "median_tokens", "n_langs", "n_sources",
            "min_chars", "max_chars",
        )
    )


Q186_SQL = f"""
WITH base AS (
  SELECT doc_id, md5(COALESCE(text, chr(0))) AS h,
         len(string_split(text, ' ')) AS tok, lang, source, n_chars
  FROM documents),
med AS (
  SELECT MIN(CASE WHEN 2 * cw >= n THEN tok END) AS m FROM (
    SELECT tok, SUM(c) OVER (ORDER BY tok) AS cw, SUM(c) OVER () AS n
    FROM (SELECT tok, COUNT(*) AS c FROM base GROUP BY tok)))
SELECT CAST(COUNT(*) AS BIGINT) AS n_docs,
       CAST(COUNT(DISTINCT h) AS BIGINT) AS n_unique_texts,
       {_dec4('1.0 - COUNT(DISTINCT h) / CAST(COUNT(*) AS DOUBLE)')} AS dup_rate,
       CAST(SUM(tok) AS BIGINT) AS n_tokens,
       (SELECT CAST(m AS BIGINT) FROM med) AS median_tokens,
       CAST(COUNT(DISTINCT lang) AS BIGINT) AS n_langs,
       CAST(COUNT(DISTINCT source) AS BIGINT) AS n_sources,
       CAST(MIN(n_chars) AS BIGINT) AS min_chars,
       CAST(MAX(n_chars) AS BIGINT) AS max_chars
FROM base
"""


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


Q187_SQL = """
WITH per AS (
  SELECT lang, CAST(COUNT(*) AS BIGINT) AS n_rows,
         CAST(SUM(n_chars + 64) AS BIGINT) AS est_bytes
  FROM documents GROUP BY lang),
m AS (SELECT AVG(est_bytes) AS mean_b FROM per)
SELECT lang, n_rows, est_bytes,
       CAST(GREATEST(CEIL(est_bytes / 16384.0), 1) AS BIGINT) AS n_files,
       est_bytes < 16384 / 2 AS is_small,
       est_bytes > 8.0 * (SELECT mean_b FROM m) AS is_skewed
FROM per ORDER BY lang
"""


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


Q188_SQL = f"""
WITH base AS (
  SELECT lang AS g, CAST(n_chars AS DOUBLE) AS x,
         CAST(len(string_split(text, ' ')) AS DOUBLE) AS y
  FROM documents),
px AS (
  SELECT g, x,
         (2 * (SUM(c) OVER (PARTITION BY g ORDER BY x) - c) + c + 1) / 2.0 AS rx
  FROM (SELECT g, x, COUNT(*) AS c FROM base GROUP BY g, x)),
py AS (
  SELECT g, y,
         (2 * (SUM(c) OVER (PARTITION BY g ORDER BY y) - c) + c + 1) / 2.0 AS ry
  FROM (SELECT g, y, COUNT(*) AS c FROM base GROUP BY g, y))
SELECT base.g AS lang, CAST(COUNT(*) AS BIGINT) AS n,
       {_dec4('corr(rx, ry)')} AS rho
FROM base JOIN px ON px.g = base.g AND px.x = base.x
          JOIN py ON py.g = base.g AND py.y = base.y
GROUP BY base.g ORDER BY lang
"""


# Declaration order is load-bearing: the driver's correctness snapshot hashes
# the FIRST 50 entries of this dict (CORRECTNESS_r{N}.json caps at 50).
#
# Round-8 rotation (VERDICT r7 task 1): q103-q114 have NEVER appeared in a
# driver signal file (declared mid-round 7, outside the r7 window) — declare
# those 12 FIRST, then q66-q67 (last driver-hashed r05, the stalest green
# set), then fill positions 15-50 with 36 of the r6-driver-green block
# (q01-q28 + q34-q41).  The tail (q29-q33, q42-q65, q68-q102) is all
# driver-green in r05-r07 and stays covered by the in-repo mirror
# (tests/test_queries_oracle.py), which runs all 114 queries against the
# same DuckDB oracle every pytest run.  After this rotation every declared
# query has a driver signal within the last 3 rounds.
# History: r04-r05 window was q51-q67 + q01-q33; r06 window was q34-q50 +
# q68-q72 + q01-q28; r07 window was q73-q102 + q29-q33 + q51-q65.  The
# window is pinned by
# tests/test_queries_oracle.py::test_driver_window_pinned and documented in
# README section "Verification coverage map".
QUERIES: dict[str, Callable[[SparkSession, str], DataFrame]] = {
    # --- round-9 driver window (positions 1-50): q115-q164, the oldest
    # half of the never-driver-hashed round-8 declarations (X77-X130).
    # See README 'Verification coverage map' for the forced r9-r12
    # rotation schedule; tests/test_queries_oracle.py pins this order.
    "q115_substring_search": q115,
    "q116_blocklist_filter": q116,
    "q117_pmi_cooccurrence": q117,
    "q118_containment_pairs": q118,
    "q119_robust_dim_stats": q119,
    "q120_mmr_select": q120,
    "q121_distinct_rollup": q121,
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
    # --- tail positions 51+: ordered by the forced rotation schedule.
    # r10 window candidates first (q165-q188 declared r8 never-hashed;
    # q42-q50/q68-q72 last driver-hashed r6):
    "q165_kcore": q165,
    "q166_grouping_sets": q166,
    "q167_theil_sen": q167,
    "q168_linear_resample": q168,
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
    # r11 window candidates (last driver-hashed r7):
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
    "q58_ivf_multiprobe": q58,
    "q59_contamination": q59,
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
    # r12 window candidates (last driver-hashed r8):
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
    "q66_top_duplicated_passages": q66,
    "q67_curation_funnel": q67,
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
}

ORACLE: dict[str, str] = {
    "q01_json_projection": Q01_SQL,
    "q02_registry_filter": Q02_SQL,
    "q03_json_path_groupcount": Q03_SQL,
    "q04_map_explode_fanout": Q04_SQL,
    "q05_regex_host_extract": Q05_SQL,
    "q06_semi_join_running": Q06_SQL,
    "q07_anti_join_excluded": Q07_SQL,
    "q08_ci_join_containment": Q08_SQL,
    "q09_window_avg_zero_fill": Q09_SQL,
    "q10_quorum_predicates": Q10_SQL,
    "q11_capacity_sums": Q11_SQL,
    "q12_last_snapshot": Q12_SQL,
    "q13_distinct_first_name": Q13_SQL,
    "q14_distribute_allocator": Q14_SQL,
    "q15_suspension_carry_forward": Q15_SQL,
    "q16_tumbling_idle": Q16_SQL,
    "q17_cooldown_gate": Q17_SQL,
    "q18_step_clamp": Q18_SQL,
    "q19_epoch_roundtrip": Q19_SQL,
    "q20_full_classifier": Q20_SQL,
    "q21_exact_dedup": Q21_SQL,
    "q22_minhash_near_dup": Q22_SQL,
    "q23_cosine_topk": Q23_SQL,
    "q24_token_stats": Q24_SQL,
    "q25_sessionize": Q25_SQL,
    "q26_simhash_clusters": Q26_SQL,
    "q27_ngram_jaccard_pairs": Q27_SQL,
    "q28_embedding_near_dup": Q28_SQL,
    "q29_lsh_topk": Q29_SQL,
    "q30_ivf_topk": Q30_SQL,
    "q31_langid_quality": Q31_SQL,
    "q32_fingerprint_tokens": Q32_SQL,
    "q33_rollup_stats": Q33_SQL,
    "q34_asof_join": Q34_SQL,
    "q35_percentiles": Q35_SQL,
    "q36_topk_per_segment": Q36_SQL,
    "q37_multimodal_meta": Q37_SQL,
    "q38_full_outer_calendar": Q38_SQL,
    "q39_interval_join": Q39_SQL,
    "q40_distinct_aggs": Q40_SQL,
    "q41_range_window": Q41_SQL,
    "q42_pandas_udf_vowels": Q42_SQL,
    "q43_approx_sketches": Q43_SQL,
    "q44_pivot_counts": Q44_SQL,
    "q45_map_roundtrip": Q45_SQL,
    "q46_revenue_join": Q46_SQL,
    "q47_simhash_hamming": Q47_SQL,
    "q48_train_test_split": Q48_SQL,
    "q49_dedup_components": Q49_SQL,
    "q50_tfidf_top_terms": Q50_SQL,
    "q51_value_histogram": Q51_SQL,
    "q52_pii_scrub": Q52_SQL,
    "q53_quality_topk_per_lang": Q53_SQL,
    "q54_token_packing": Q54_SQL,
    "q55_repetition_filter": Q55_SQL,
    "q56_mixing_weights": Q56_SQL,
    "q57_lsh_multiprobe": Q57_SQL,
    "q58_ivf_multiprobe": Q58_SQL,
    "q59_contamination": Q59_SQL,
    "q60_ngram_novelty": Q60_SQL,
    "q61_incremental_dedup": Q61_SQL,
    "q62_boilerplate_strip": Q62_SQL,
    "q63_memorization_risk": Q63_SQL,
    "q64_cluster_profile": Q64_SQL,
    "q65_cluster_balanced_sample": Q65_SQL,
    "q66_top_duplicated_passages": Q66_SQL,
    "q67_curation_funnel": Q67_SQL,
    # q68 (iterative k-means) and q70 (trained PQ) are deliberately
    # oracle-less rows-only checks; q71 is the PQ oracle twin
    "q69_vocab_coverage": Q69_SQL,
    "q71_pq_literal": Q71_SQL,
    "q72_pq_code_dedup": Q72_SQL,
    "q73_cosine_neardup_lsh": Q73_SQL,
    "q74_token_chunking": Q74_SQL,
    "q75_unigram_logloss": Q75_SQL,
    "q76_leakage_safe_split": Q76_SQL,
    "q77_dsir_importance": Q77_SQL,
    "q78_bigram_stats": Q78_SQL,
    "q79_quality_classifier": Q79_SQL,
    "q80_perplexity_gate": Q80_SQL,
    "q81_winsorized_stats": Q81_SQL,
    "q82_duplicated_spans": Q82_SQL,
    "q83_bm25_topk": Q83_SQL,
    "q84_source_js_divergence": Q84_SQL,
    "q86_bpe_pair_stats": Q86_SQL,
    "q87_split_leakage": Q87_SQL,
    "q88_hard_negatives": Q88_SQL,
    "q89_cms_heavy_hitters": Q89_SQL,
    "q90_jl_projection_topk": Q90_SQL,
    "q91_neyman_sampling": Q91_SQL,
    "q92_ols_trend": Q92_SQL,
    "q93_rolling_zscore": Q93_SQL,
    "q94_constraint_audit": Q94_SQL,
    "q95_scd2_history": Q95_SQL,
    "q96_tfidf_cosine_join": Q96_SQL,
    "q97_zorder_layout": Q97_SQL,
    "q98_pq_sdc_topk": Q98_SQL,
    "q99_ranking_metrics": Q99_SQL,
    "q100_dp_histogram": Q100_SQL,
    "q101_sequence_funnel": Q101_SQL,
    "q102_cohort_retention": Q102_SQL,
    "q103_image_ahash_pairs": Q103_SQL,
    "q104_semantic_dedup": Q104_SQL,
    "q105_entity_resolution": Q105_SQL,
    "q106_weighted_sample": Q106_SQL,
    "q107_column_profile": Q107_SQL,
    "q108_source_concentration": Q108_SQL,
    "q109_snapshot_diff": Q109_SQL,
    "q110_psi_drift": Q110_SQL,
    "q111_minhash_lsh": Q111_SQL,
    "q112_entity_multi_pass": Q112_SQL,
    "q113_normalized_dedup": Q113_SQL,
    "q114_embedding_dim_stats": Q114_SQL,
    "q115_substring_search": Q115_SQL,
    "q116_blocklist_filter": Q116_SQL,
    "q117_pmi_cooccurrence": Q117_SQL,
    "q118_containment_pairs": Q118_SQL,
    "q119_robust_dim_stats": Q119_SQL,
    "q121_distinct_rollup": Q121_SQL,
    "q122_image_phash_pairs": Q122_SQL,
    "q123_audio_fp_pairs": Q123_SQL,
    "q124_cube_grouping": Q124_SQL,
    "q125_decile_bands": Q125_SQL,
    "q126_interval_join_binned": Q126_SQL,
    "q127_overlap_join_binned": Q127_SQL,
    "q128_purged_time_split": Q128_SQL,
    "q129_zipf_fit": Q129_SQL,
    "q130_k_anonymity": Q130_SQL,
    "q131_ks_two_sample": Q131_SQL,
    "q132_mahalanobis_outliers": Q132_SQL,
    "q133_audience_overlap": Q133_SQL,
    "q134_rank_sum_test": Q134_SQL,
    "q135_chi2_independence": Q135_SQL,
    "q136_shrunk_means": Q136_SQL,
    "q137_weighted_quantile": Q137_SQL,
    "q138_benford_audit": Q138_SQL,
    "q139_welch_t_test": Q139_SQL,
    "q140_dim_corr_matrix": Q140_SQL,
    "q141_diversity_audit": Q141_SQL,
    "q142_centroid_similarity": Q142_SQL,
    "q143_grouped_mad": Q143_SQL,
    "q144_time_weighted_avg": Q144_SQL,
    "q145_label_noise_queue": Q145_SQL,
    "q146_debounce_audit": Q146_SQL,
    "q147_locf_resample": Q147_SQL,
    "q148_sliding_active_users": Q148_SQL,
    "q149_edit_distance_join": Q149_SQL,
    "q150_pagerank": Q150_SQL,
    "q151_bloom_semi_join": Q151_SQL,
    "q152_pareto_frontier": Q152_SQL,
    "q153_association_rules": Q153_SQL,
    "q154_cuped": Q154_SQL,
    "q155_attribution": Q155_SQL,
    "q156_fs_match_weights": Q156_SQL,
    "q157_quantile_sketch": Q157_SQL,
    "q158_triangle_census": Q158_SQL,
    "q159_mutual_information": Q159_SQL,
    "q160_calibration_bins": Q160_SQL,
    "q161_grouped_auc": Q161_SQL,
    "q162_seasonal_decompose": Q162_SQL,
    "q163_transition_matrix": Q163_SQL,
    "q164_cusum_changepoint": Q164_SQL,
    "q165_kcore": Q165_SQL,
    "q166_grouping_sets": Q166_SQL,
    "q167_theil_sen": Q167_SQL,
    "q168_linear_resample": Q168_SQL,
    "q169_audio_profile": Q169_SQL,
    "q170_textrank_keywords": Q170_SQL,
    "q171_stratified_split": Q171_SQL,
    "q172_sketch_intersection": Q172_SQL,
    "q173_ivm_merge": Q173_SQL,
    "q174_bh_fdr": Q174_SQL,
    "q175_transition_latency": Q175_SQL,
    "q176_unpivot_melt": Q176_SQL,
    "q177_cms_join_size": Q177_SQL,
    "q178_session_paths": Q178_SQL,
    "q179_outlier_days": Q179_SQL,
    "q180_ctfidf_terms": Q180_SQL,
    "q181_rrf_fusion": Q181_SQL,
    "q182_corr_top_eigen": Q182_SQL,
    "q183_quantile_normalize": Q183_SQL,
    "q184_image_dhash_pairs": Q184_SQL,
    "q185_langid_confusion": Q185_SQL,
    "q186_dataset_card": Q186_SQL,
    "q187_partition_layout": Q187_SQL,
    "q188_spearman_corr": Q188_SQL,
}

# Keep the oracle iteration order identical to QUERIES (driver window order).
# Queries genuinely outside SQL (q68's iterative k-means) are allowed to be
# oracle-less — the driver/mirror records a rows-only check for those.
_NO_ORACLE = {
    "q68_kmeans_quantizer",
    "q70_pq_topk",
    "q85_bpe_learn",
    "q120_mmr_select",  # iterative greedy selection (golden-pinned in-repo)
}
ORACLE = {name: ORACLE[name] for name in QUERIES if name not in _NO_ORACLE}
assert set(ORACLE) == set(QUERIES) - _NO_ORACLE, "every query needs an oracle twin"
