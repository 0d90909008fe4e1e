"""Round-11 declaration candidates, STAGED (VERDICT r9 task 3).

The declared-query suite is growth-frozen at 188 until the rotation
backlog drains (README 'Verification coverage map'); round 11 is the
first window with declaration headroom. These five query builders give
the round-9 streaming maintainers (X155-X159, pytest-parity-only so
far) a DRIVER-ORACLE-ABLE form: each folds its maintainer over a
deterministic two-epoch split of a synthetic table — the epochs
partition the table, so the maintained state must equal the batch
operator over the whole table, which has plain-SQL semantics DuckDB
can replay. The split key is an integer-modulus on the row key, so the
driver's plain session reproduces it bit-for-bit.

At round 11: move each builder into queries.py (APPENDED after
position 50 per the window-pin rule), move its SQL into queries_sql.py,
extend declared_round in tests/test_queries_oracle.py, and delete this
module. Until then tests/test_queries_staging.py runs all five against
their oracles every pytest run (and ``tools/check_oracle.py --staged``
runs the exact driver-gate comparison at any SF), so declaration is a
file move, not new work. Anchor note for the r11 bench budgets: warm
steady-state at sf0.01 these run ~1.0-1.5x their batch twins (the
two-epoch fold + latest-wins merge; q189 measured 1.4 s vs q174's
0.9 s warm) — their first driver bench positions will set the anchors.

Sketch-valued outputs follow the q121/X84 evidence pattern: the HLL
estimate itself is engine-specific, so the query emits the EXACT
distinct count plus a boolean pinning the estimate inside its
published error bound — the oracle replays the exact side and expects
the boolean TRUE.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from .functions import dec4, md5_long60
from .io import load_table


def q189_stream_bh_fdr(spark: SparkSession, sf_dir: str) -> DataFrame:
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


def q190_stream_reservoir(spark: SparkSession, sf_dir: str) -> DataFrame:
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


def q191_stream_rule_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
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


def q192_stream_hll_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
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


def q193_stream_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
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


STAGED_QUERIES = {
    "q189_stream_bh_fdr": q189_stream_bh_fdr,
    "q190_stream_reservoir": q190_stream_reservoir,
    "q191_stream_rule_audit": q191_stream_rule_audit,
    "q192_stream_hll_distinct": q192_stream_hll_distinct,
    "q193_stream_profile": q193_stream_profile,
}


# Oracle SQL — moves into queries_sql.py verbatim at declaration time.
Q189_SQL = """
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
       CAST(CAST(ROUND(p * 1000, 4) AS DECIMAL(38,4)) AS VARCHAR) AS p_x1000
FROM ranked, k WHERE rnk <= kmax ORDER BY rank
"""

Q190_SQL = """
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

Q191_SQL = """
WITH row_rules AS (
  SELECT CAST(count(*) AS BIGINT) AS n,
         CAST(sum(CASE WHEN l_quantity < 1 OR l_quantity > 45 THEN 1 ELSE 0 END)
              AS BIGINT) AS v_qty,
         CAST(sum(CASE WHEN l_discount > 0.08 THEN 1 ELSE 0 END)
              AS BIGINT) AS v_disc,
         CAST(sum(CASE WHEN l_extendedprice <= 0 THEN 1 ELSE 0 END)
              AS BIGINT) AS v_price
  FROM lineitem),
u AS (
  SELECT 'l_quantity_in_1_45' AS rule, n AS n_checked, v_qty AS n_violations
  FROM row_rules
  UNION ALL
  SELECT 'l_discount_le_008', n, v_disc FROM row_rules
  UNION ALL
  SELECT 'extendedprice_positive', n, v_price FROM row_rules)
SELECT rule, n_checked, n_violations,
       CAST(CAST(ROUND(CAST(n_violations AS DOUBLE) / n_checked, 4) AS DECIMAL(38,4)) AS VARCHAR) AS violation_rate
FROM u ORDER BY rule
"""

Q192_SQL = """
SELECT event_type AS key,
       CAST(COUNT(DISTINCT user_id) AS BIGINT) AS exact_ndv,
       TRUE AS ndv_within_bound
FROM events GROUP BY event_type ORDER BY key
"""

Q193_SQL = """
WITH p AS (
  SELECT 'o_orderkey' AS "column", CAST(o_orderkey AS VARCHAR) AS val FROM orders
  UNION ALL SELECT 'o_custkey', CAST(o_custkey AS VARCHAR) FROM orders
  UNION ALL SELECT 'o_orderstatus', o_orderstatus FROM orders
  UNION ALL SELECT 'o_orderpriority', o_orderpriority FROM orders)
SELECT "column",
       CAST(COUNT(*) AS BIGINT) AS n_rows,
       CAST(SUM(CASE WHEN val IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_null,
       CAST(COUNT(DISTINCT val) AS BIGINT) AS exact_ndv,
       TRUE AS ndv_within_bound,
       MIN(val) AS min_val, MAX(val) AS max_val
FROM p GROUP BY "column" ORDER BY "column"
"""

STAGED_SQL = {
    "q189_stream_bh_fdr": Q189_SQL,
    "q190_stream_reservoir": Q190_SQL,
    "q191_stream_rule_audit": Q191_SQL,
    "q192_stream_hll_distinct": Q192_SQL,
    "q193_stream_profile": Q193_SQL,
}
