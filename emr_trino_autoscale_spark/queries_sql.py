"""DuckDB oracle SQL twins for every declared query (VERDICT r8 task
8 split; formerly inline in queries.py).

One ANSI/DuckDB SQL string per oracle-bearing declared query, same
determinism conventions as the builders (queries.py module docstring):
identical column aliases on both sides, total ORDER BY, doubles
rounded through DECIMAL(38,4) and stringified, timestamps as
UTC-formatted strings, md5-derived hashes only (DuckDB has no
xxhash64). ``SQL`` maps the full declared query name to its string;
queries.py builds ORACLE from it in QUERIES declaration order, so this
module owns content, not ordering. The statements below keep their
original queries.py source order (several strings compose earlier
fragments: _Q09_FILLED_SQL, _Q47_PAIR_CTES, _QC_FEATS, ...).
"""

from __future__ import annotations

from .operators import text as _text_ops  # Q198 shares _SCRIPT_BLOCKS
from .queries_common import (  # noqa: F401 — embedded in f-strings below
    _PACK_BUDGET,
    _PLANES,
    _PLANES24,
    _PLANES_JL,
    _Q103_SIGS_PATH,
    _Q122_SIGS_PATH,
    _Q123_SIGS_PATH,
    _Q169_PROF_PATH,
    _Q184_SIGS_PATH,
)

def _dec4(x: str) -> str:
    # STRING on both sides: Spark stringifies decimals scale-padded
    # ("1.2340") but the driver's hasher renders DuckDB decimals
    # float-style ("1.234") — casting the decimal to VARCHAR in the
    # oracle produces the identical scale-padded bytes.
    return f"CAST(CAST(ROUND({x}, 4) AS DECIMAL(38,4)) AS VARCHAR)"

def _fmt(x: str) -> str:
    return f"strftime({x}, '%Y-%m-%d %H:%M:%S')"

Q01_SQL = f"""
SELECT event_id,
       COALESCE(CAST(json_extract_string(props, '$.k') AS BIGINT), 0) AS k_val,
       COALESCE(CAST(json_extract_string(props, '$.missing') AS DOUBLE), 0.0) AS missing_val,
       event_type,
       {_dec4('value')} AS value_dec
FROM events ORDER BY event_id
"""

Q02_SQL = """
SELECT s_suppkey AS supp_key, s_name AS supp_name, n_name AS nation_name
FROM supplier JOIN nation ON s_nationkey = n_nationkey
WHERE lower(s_name) LIKE 'supplier#%'
  AND lower(n_name) NOT IN ('france', 'germany')
ORDER BY supp_key
"""

Q03_SQL = """
SELECT CAST(json_extract_string(props, '$.k') AS BIGINT) AS k,
       CAST(COUNT(*) AS BIGINT) AS n
FROM events GROUP BY 1 ORDER BY k
"""

Q04_SQL = f"""
SELECT user_id, event_type AS metric, {_dec4('SUM(value)')} AS sum_value
FROM events GROUP BY user_id, event_type ORDER BY user_id, metric
"""

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

Q06_SQL = """
SELECT c_custkey AS cust_key, c_name AS cust_name
FROM customer
WHERE c_custkey IN (SELECT o_custkey FROM orders WHERE upper(o_orderstatus) = 'O')
ORDER BY cust_key
"""

Q07_SQL = """
SELECT c_custkey AS cust_key, c_mktsegment AS segment
FROM customer
WHERE c_custkey NOT IN (SELECT o_custkey FROM orders WHERE o_orderstatus = 'F')
ORDER BY cust_key
"""

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

Q11_SQL = f"""
SELECT o_orderpriority AS priority,
       CAST(SUM(CASE WHEN o_orderstatus = 'O' THEN 1 ELSE 0 END) AS BIGINT) AS running_cnt,
       CAST(COUNT(*) AS BIGINT) AS requested_cnt,
       {_dec4('SUM(o_totalprice)')} AS total_price,
       BOOL_OR(o_orderstatus = 'P') AS is_resizing
FROM orders GROUP BY 1 ORDER BY priority
"""

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

Q13_SQL = """
SELECT p_brand AS brand,
       arg_min(p_type, p_partkey) AS first_type,
       concat_ws('-', 'AutoScaling', 'TASK', lower(p_brand), arg_min(p_type, p_partkey)) AS task_name,
       CAST(COUNT(DISTINCT p_type) AS BIGINT) AS n_types
FROM part GROUP BY p_brand ORDER BY brand
"""

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

Q17_SQL = f"""
WITH br AS (SELECT event_id, user_id, ts FROM events WHERE value >= 150.0),
g AS (SELECT *, LAG(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS prev_ts FROM br)
SELECT event_id, user_id, {_fmt('ts')} AS action_ts
FROM g WHERE prev_ts IS NULL OR ts > prev_ts + INTERVAL 48 HOUR
ORDER BY event_id
"""

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

Q19_SQL = f"""
SELECT event_id,
       epoch_ms(ts) AS ts_ms,
       {_fmt('make_timestamp(epoch_ms(ts) * 1000)')} AS ts_rt
FROM events ORDER BY event_id
"""

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

Q21_SQL = """
SELECT md5(text) AS text_hash, MIN(doc_id) AS keep_id,
       CAST(COUNT(*) AS BIGINT) AS n_dups
FROM documents GROUP BY 1 ORDER BY text_hash
"""

Q22_SQL = """
WITH t AS (SELECT doc_id, string_split(text, ' ') AS toks FROM documents),
s AS (SELECT doc_id,
             list_min(list_transform(range(1, len(toks) - 1),
                      i -> md5(toks[i] || ' ' || toks[i+1] || ' ' || toks[i+2]))) AS sig
      FROM t WHERE len(toks) >= 3)
SELECT sig, MIN(doc_id) AS keep_id, CAST(COUNT(*) AS BIGINT) AS cluster_size
FROM s GROUP BY sig ORDER BY sig
"""

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

Q33_SQL = """
SELECT COALESCE(lang, 'ALL') AS lang, COALESCE(source, 'ALL') AS source,
       CAST(GROUPING(lang) AS INTEGER) AS g_lang,
       CAST(GROUPING(source) AS INTEGER) AS g_source,
       CAST(COUNT(*) AS BIGINT) AS n_docs,
       CAST(SUM(n_chars) AS BIGINT) AS total_chars
FROM documents GROUP BY ROLLUP(lang, source)
ORDER BY lang, source, g_lang, g_source
"""

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

Q35_SQL = f"""
SELECT event_type, CAST(COUNT(*) AS BIGINT) AS n,
       {_dec4('quantile_cont(value, 0.5)')} AS p50,
       {_dec4('quantile_cont(value, 0.9)')} AS p90
FROM events GROUP BY event_type ORDER BY event_type
"""

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

Q37_SQL = """
SELECT doc_id, CAST(strlen(text) AS BIGINT) AS n_bytes,
       CAST(CASE WHEN strlen(text) > 0 THEN ascii(text) END AS INTEGER) AS first_byte
FROM documents ORDER BY doc_id
"""

Q38_SQL = """
WITH o AS (SELECT CAST(o_orderdate AS DATE) AS d, CAST(COUNT(*) AS BIGINT) AS n_orders
           FROM orders GROUP BY 1),
e AS (SELECT CAST(ts AS DATE) AS d, CAST(COUNT(*) AS BIGINT) AS n_events
      FROM events GROUP BY 1)
SELECT strftime(COALESCE(o.d, e.d), '%Y-%m-%d') AS day, n_orders, n_events
FROM o FULL OUTER JOIN e USING (d) ORDER BY day
"""

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

Q40_SQL = f"""
SELECT o_orderpriority AS priority,
       CAST(COUNT(*) AS BIGINT) AS n_orders,
       CAST(COUNT(DISTINCT o_custkey) AS BIGINT) AS n_customers,
       CAST(COUNT(DISTINCT CAST(o_orderdate AS DATE)) AS BIGINT) AS n_days,
       {_dec4('SUM(o_totalprice)')} AS sum_price
FROM orders GROUP BY 1 ORDER BY priority
"""

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

Q42_SQL = """
SELECT lang,
       CAST(SUM(length(regexp_replace(lower(text), '[^aeiou]', '', 'g'))) AS BIGINT)
         AS total_vowels,
       CAST(COUNT(*) AS BIGINT) AS n_docs
FROM documents GROUP BY lang ORDER BY lang
"""

Q43_SQL = """
SELECT o_orderpriority AS priority,
       CAST(COUNT(DISTINCT o_custkey) AS BIGINT) AS exact_customers,
       CAST(COUNT(*) AS BIGINT) AS n_orders,
       TRUE AS ndv_within_10pct,
       TRUE AS p50_within_band
FROM orders GROUP BY 1 ORDER BY priority
"""

Q44_SQL = """
SELECT user_id,
       CAST(COUNT(*) FILTER (event_type = 'click') AS BIGINT) AS n_click,
       CAST(COUNT(*) FILTER (event_type = 'view') AS BIGINT) AS n_view,
       CAST(COUNT(*) FILTER (event_type = 'purchase') AS BIGINT) AS n_purchase,
       CAST(COUNT(*) FILTER (event_type = 'signup') AS BIGINT) AS n_signup,
       CAST(COUNT(*) FILTER (event_type = 'error') AS BIGINT) AS n_error
FROM events GROUP BY user_id ORDER BY user_id
"""

Q45_SQL = f"""
SELECT user_id, event_type, {_dec4('SUM(value)')} AS sum_value
FROM events GROUP BY user_id, event_type
HAVING SUM(value) > 100.0
ORDER BY user_id, event_type
"""

Q46_SQL = f"""
SELECT c_mktsegment AS segment,
       CAST(EXTRACT(year FROM o_orderdate) AS INTEGER) AS order_year,
       CAST(COUNT(*) AS BIGINT) AS n_items,
       {_dec4('SUM(l_extendedprice * (1.0 - l_discount))')} AS revenue
FROM lineitem JOIN orders ON l_orderkey = o_orderkey
              JOIN customer ON o_custkey = c_custkey
GROUP BY 1, 2 ORDER BY segment, order_year
"""

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

Q51_SQL = """
SELECT event_type, CAST(FLOOR(value / 50) AS BIGINT) AS bucket,
       CAST(COUNT(*) AS BIGINT) AS n
FROM events GROUP BY 1, 2 ORDER BY event_type, bucket
"""

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

Q56_SQL = f"""
WITH per_src AS (SELECT source, CAST(COUNT(*) AS BIGINT) AS n_docs
                 FROM documents GROUP BY 1),
tot AS (SELECT SUM(n_docs) AS n_total, COUNT(*) AS n_sources FROM per_src)
SELECT source, n_docs,
       {_dec4('n_total / (n_sources * n_docs)')} AS mix_weight
FROM per_src CROSS JOIN tot ORDER BY source
"""

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

Q76_SQL = """
SELECT CASE WHEN substr(md5(source), 1, 1) < 'c' THEN 'train'
            WHEN substr(md5(source), 1, 1) < 'e' THEN 'val'
            ELSE 'test' END AS split,
       CAST(count(*) AS BIGINT) AS n_docs,
       CAST(count(DISTINCT source) AS BIGINT) AS n_domains,
       CAST(sum(len(string_split(text, ' '))) AS BIGINT) AS total_tokens
FROM documents GROUP BY 1 ORDER BY split
"""

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

Q105_SQL = """
WITH b AS (SELECT c_custkey AS id, c_name AS nm, substr(c_name, 1, 16) AS blk
           FROM customer WHERE c_mktsegment = 'BUILDING')
SELECT a.id AS id_a, c.id AS id_b, CAST(levenshtein(a.nm, c.nm) AS INT) AS dist
FROM b a JOIN b c ON a.blk = c.blk AND a.id < c.id
WHERE levenshtein(a.nm, c.nm) <= 1
ORDER BY id_a, id_b
"""

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

Q114_SQL = """
WITH e AS (SELECT label, CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
x AS (SELECT label, v, unnest(range(1, len(v) + 1)) AS dim FROM e),
p AS (SELECT label, CAST(dim AS INT) AS dim, v[dim] AS val FROM x)
SELECT label, dim,
       ROUND(AVG(val), 4) + 0.0 AS mean,
       ROUND(STDDEV_SAMP(val), 4) AS std
FROM p GROUP BY label, dim ORDER BY label, dim
"""

Q115_SQL = """
WITH q(query) AS (
  SELECT unnest(['scan merge', 'window window', 'batch stream', 'dup']))
SELECT q.query, d.doc_id
FROM documents d, q
WHERE contains(d.text, q.query)
ORDER BY query, doc_id
"""

Q116_SQL = """
WITH p(phrase) AS (
  SELECT unnest(['batch batch batch', 'scan merge', 'spark window window']))
SELECT d.doc_id, p.phrase
FROM documents d, p
WHERE contains(' ' || d.text || ' ', ' ' || p.phrase || ' ')
ORDER BY doc_id, phrase
"""

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

_BENFORD = {d: __import__("math").log10(1.0 + 1.0 / d) for d in range(1, 10)}

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

Q140_SQL = """
WITH e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
x AS (SELECT vec_id, v, unnest(range(1, len(v) + 1)) AS dim FROM e),
p AS (SELECT vec_id, CAST(dim AS INT) AS dim, v[dim] AS val FROM x)
SELECT a.dim AS dim_a, b.dim AS dim_b,
       ROUND(corr(a.val, b.val), 4) + 0.0 AS corr
FROM p a JOIN p b ON a.vec_id = b.vec_id AND a.dim < b.dim
GROUP BY 1, 2 ORDER BY dim_a, dim_b
"""

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

Q149_SQL = """
SELECT a.c_custkey AS id_a, b.c_custkey AS id_b,
       CAST(levenshtein(a.c_name, b.c_name) AS INT) AS dist
FROM customer a JOIN customer b ON a.c_custkey < b.c_custkey
WHERE levenshtein(a.c_name, b.c_name) <= 1
ORDER BY id_a, id_b
"""

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

Q153_SQL = f"""
WITH bi AS (
  SELECT DISTINCT l_orderkey AS b, p_brand AS i
  FROM lineitem JOIN part ON l_partkey = p_partkey
  WHERE l_orderkey IS NOT NULL AND p_brand IS NOT NULL),
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

Q159_SQL = f"""
WITH cells AS (
  SELECT event_type AS x, CAST(FLOOR(value / 100) AS BIGINT) AS y,
         COUNT(*) AS c
  FROM events
  WHERE event_type IS NOT NULL AND value IS NOT NULL
  GROUP BY 1, 2),
mx AS (SELECT x, SUM(c) AS cx FROM cells GROUP BY x),
my AS (SELECT y, SUM(c) AS cy FROM cells GROUP BY y),
nn AS (SELECT CAST(SUM(c) AS DOUBLE) AS n FROM cells)
SELECT (SELECT CAST(n AS BIGINT) FROM nn) AS n,
       {_dec4('(SELECT SUM((c / nn.n) * log2(c * nn.n / (cx * cy))) FROM cells JOIN mx USING(x) JOIN my USING(y), nn)')} AS mi_bits,
       {_dec4('(SELECT -SUM((cx / nn.n) * log2(cx / nn.n)) FROM mx, nn)')} AS h_x,
       {_dec4('(SELECT -SUM((cy / nn.n) * log2(cy / nn.n)) FROM my, nn)')} AS h_y
"""

Q160_SQL = f"""
SELECT CAST(LEAST(FLOOR((value / 500.0) * 10), 9) AS BIGINT) AS bin,
       CAST(COUNT(*) AS BIGINT) AS n,
       {_dec4('SUM(value / 500.0)')} AS sum_score,
       {_dec4("SUM(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END) / COUNT(*)")} AS frac_positive
FROM events GROUP BY 1 ORDER BY bin
"""

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

Q172_SQL = """
WITH ua AS (SELECT DISTINCT event_type AS t, user_id FROM events)
SELECT a.t AS g_a, b.t AS g_b,
       CAST(COUNT(*) AS BIGINT) AS exact_overlap,
       TRUE AS within_bound
FROM ua a JOIN ua b ON a.user_id = b.user_id AND a.t < b.t
GROUP BY a.t, b.t ORDER BY g_a, g_b
"""

Q173_SQL = f"""
SELECT event_type, CAST(COUNT(*) AS BIGINT) AS n,
       {_dec4('SUM(value)')} AS sum_value,
       {_dec4('MIN(value)')} AS min_value,
       {_dec4('MAX(value)')} AS max_value
FROM events GROUP BY event_type ORDER BY event_type
"""

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


# Q189-Q193 — X155-X159 streaming maintainers in two-epoch-fold form
# (declared round 11; staged round 10 in queries_staging.py). The
# epochs partition each table, so the oracle is simply the batch
# operator over the whole table.

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


# --- round-12 declarations (moved from queries_staging) ---

# Replays from the ORIGINAL documents view: landed == the non-corrupted
# partition with md5/length recomputed from the source text.
Q194_SQL = """
WITH clean AS (
  SELECT text FROM documents WHERE doc_id % 37 <> 0),
bad AS (
  SELECT 1 FROM documents WHERE doc_id % 37 = 0),
u AS (
  SELECT 'landed' AS status,
         CAST(COUNT(*) AS BIGINT) AS n_rows,
         CAST(bit_xor(CAST('0x' || substr(md5(text), 1, 15) AS BIGINT))
              AS BIGINT) AS digest_xor,
         CAST(SUM(length(text)) AS BIGINT) AS n_chars_sum
  FROM clean
  UNION ALL
  SELECT 'quarantined', CAST(COUNT(*) AS BIGINT),
         CAST(NULL AS BIGINT), CAST(NULL AS BIGINT)
  FROM bad)
SELECT * FROM u ORDER BY status
"""

# First-principles canonical derivation (never a parser replay): the
# oracle rebuilds the canonical URL from the synthesis components —
# lowercase host, userinfo/fragment gone, default port dropped per the
# ACTUAL scheme, '' path -> '/', tracking params gone and the
# survivors in sorted order (a=1 < b=N < z=K byte order).
Q195_SQL = """
WITH comp AS (
  SELECT doc_id,
         doc_id % 17 = 0 AS malformed,
         CASE WHEN doc_id % 3 = 1 THEN 'http' ELSE 'https' END AS scheme,
         (CASE WHEN doc_id % 2 = 0 THEN 'www.' ELSE '' END)
           || source || '.ex' || CAST(doc_id % 4 AS VARCHAR) || '.com' AS host,
         CASE WHEN doc_id % 5 = 2 THEN ':8080'
              WHEN doc_id % 5 = 1 AND doc_id % 3 <> 1 THEN ':80'
              WHEN doc_id % 5 = 0 AND doc_id % 3 = 1 THEN ':443'
              ELSE '' END AS portpart,
         CASE WHEN doc_id % 7 = 0 THEN '/'
              ELSE '/p/' || CAST(doc_id % 11 AS VARCHAR) END AS path,
         CASE WHEN doc_id % 6 IN (0, 1)
                THEN '?a=1&b=' || CAST(doc_id % 13 AS VARCHAR)
              WHEN doc_id % 6 = 4 THEN '?z=' || CAST(doc_id % 3 AS VARCHAR)
              ELSE '' END AS q
  FROM documents),
canon AS (
  SELECT CASE WHEN malformed THEN NULL
              ELSE scheme || '://' || host || portpart || path || q END AS c,
         CASE WHEN malformed THEN NULL
              ELSE 'ex' || CAST(doc_id % 4 AS VARCHAR) || '.com' END AS d
  FROM comp)
SELECT d AS domain,
       CAST(COUNT(*) AS BIGINT) AS n_urls,
       CAST(SUM(CASE WHEN c IS NULL THEN 1 ELSE 0 END) AS BIGINT)
         AS n_malformed,
       CAST(COUNT(DISTINCT c) AS BIGINT) AS n_canonical,
       CAST(LEAST(COUNT(DISTINCT c), 100) AS BIGINT) AS n_kept_under_quota,
       MIN(c) AS sample_url
FROM canon GROUP BY d ORDER BY d
"""

# Literal replay of the X164 chain — sanctioned for this operator
# family: the patterns are RE2-compatible BY DESIGN (inline (?is)
# flags, no backreferences), so DuckDB running the same chain is an
# independent engine executing the same public spec, like the md5
# convention elsewhere. Entity order matters: &amp; LAST; the quote
# and ampersand literals go through chr() to keep the SQL readable.
Q196_SQL = """
WITH h AS (
  SELECT doc_id % 5 AS bucket,
         CASE doc_id % 5
           WHEN 0 THEN '<script>var x = ' || chr(39) || '<p>not text</p>'
                       || chr(39) || ';</script><P class=' || chr(39) || 'a'
                       || chr(39) || '>' || text || '</p>'
           WHEN 1 THEN '<!-- note <b> -->' || text
                       || '<br/><a href=' || chr(39) || '/x?a=1&b=2'
                       || chr(39) || '>more</a>'
           WHEN 2 THEN '<div><H2>T</h2> ' || text || ' &amp;lt; tail &lt;ok&gt;'
           WHEN 3 THEN '<STYLE type=' || chr(39) || 'c' || chr(39)
                       || '>.x{color:red}</style>' || text
                       || '&nbsp;&quot;q&quot; &#39;s&#39;'
           ELSE text END AS html
  FROM documents),
x AS (
  SELECT bucket, html,
    trim(regexp_replace(
      replace(replace(replace(replace(replace(replace(
        regexp_replace(
          regexp_replace(
            regexp_replace(
              regexp_replace(html, '(?is)<script[^>]*>.*?</script>', ' ', 'g'),
              '(?is)<style[^>]*>.*?</style>', ' ', 'g'),
            '(?s)<!--.*?-->', ' ', 'g'),
          '<[^>]*>', ' ', 'g'),
        '&lt;', '<'), '&gt;', '>'), '&quot;', '"'), '&#39;', chr(39)),
        chr(38) || 'nbsp;', ' '), chr(38) || 'amp;', chr(38)),
      '[ \\t\\n\\r\\f\\x0b]+', ' ', 'g')) AS extracted
  FROM h)
SELECT bucket,
       CAST(COUNT(*) AS BIGINT) AS n_docs,
       CAST(SUM(length(html)) AS BIGINT) AS raw_len_sum,
       CAST(SUM(length(extracted)) AS BIGINT) AS text_len_sum,
       CAST(bit_xor(CAST('0x' || substr(md5(extracted), 1, 15) AS BIGINT))
            AS BIGINT) AS text_digest_xor
FROM x GROUP BY bucket ORDER BY bucket
"""


# --- round-13 declarations (moved from queries_staging) ---

# Q197 replays the X176 signal chain with DuckDB list lambdas and the
# same RE2-compatible regexps the operator uses. Lines split on \r?\n
# (the CRLF fix, ADVICE r12) and the exact mean is summed line lengths
# over lines on BOTH sides.
Q197_SQL = """
WITH sig AS (
  SELECT source,
         text,
         regexp_split_to_array(text, '\\r?\\n') AS lines
  FROM documents),
feat AS (
  SELECT source,
         len(lines) AS n_lines,
         list_max(list_transform(lines, x -> length(x))) AS max_line_len,
         list_sum(list_transform(lines, x -> length(x)))
           / CAST(len(lines) AS DOUBLE) AS mean_line_len,
         length(regexp_replace(text, '[^A-Za-z0-9]', '', 'g'))
           / CAST(greatest(length(text), 1) AS DOUBLE) AS frac_alnum,
         len(list_filter(lines,
             x -> regexp_matches(x, '^[ \\t\\r\\f\\x0b]*(//|#|;|--|\\*|/\\*)')))
           / CAST(len(lines) AS DOUBLE) AS comment_line_frac,
         regexp_matches(text,
             '(?i)(auto[- ]?generated|generated by|do not edit)')
           AS has_autogen_marker,
         regexp_matches(text, '[A-Za-z0-9+/=]{64,}') AS has_base64_blob
  FROM sig)
SELECT source,
       CAST(COUNT(*) AS BIGINT) AS n_docs,
       CAST(SUM(CASE WHEN max_line_len <= 1000 AND mean_line_len <= 100
                      AND frac_alnum >= 0.25 AND NOT has_autogen_marker
                     THEN 1 ELSE 0 END) AS BIGINT) AS n_keep,
       CAST(SUM(CASE WHEN has_autogen_marker THEN 1 ELSE 0 END) AS BIGINT)
         AS n_autogen,
       CAST(SUM(CASE WHEN has_base64_blob THEN 1 ELSE 0 END) AS BIGINT)
         AS n_blob,
       CAST(SUM(n_lines) AS BIGINT) AS total_lines,
       CAST(SUM(max_line_len) AS BIGINT) AS sum_max_line,
       CAST(SUM(CASE WHEN comment_line_frac > 0.5 THEN 1 ELSE 0 END)
            AS BIGINT) AS n_comment_heavy
FROM feat GROUP BY source ORDER BY source
"""

# Q198's replay uses the OPERATOR's own block patterns (real
# characters, not \\uXXXX escapes — RE2 lacks \\u, and one shared
# table means the oracle can never drift from the operator).
_Q198_BLOCKS = tuple(sorted(_text_ops._SCRIPT_BLOCKS))

# The patterns/names are interpolated raw into single-quoted SQL
# literals and bare identifiers below; fail at import time — not with
# silently corrupted SQL — if a future block entry would break either
# form (ADVICE r13).
for _name, _pat in _Q198_BLOCKS:
    assert _name.isidentifier() and "'" not in _pat, (
        "q198 script-block entry not SQL-literal-safe: "
        f"({_name!r}, {_pat!r})"
    )

_Q198_COUNTS = ",\n".join(
    f"         length(text) - length(regexp_replace(text, '{pat}', '', 'g'))"
    f" AS c_{name}"
    for name, pat in _Q198_BLOCKS
)
_Q198_STRUCTS = ", ".join(
    f"{{'n': c_{name}, 's': '{name}'}}" for name, _ in _Q198_BLOCKS
)
_Q198_TOTAL = " + ".join(f"c_{name}" for name, _ in _Q198_BLOCKS)

Q198_SQL = f"""
WITH cnt AS (
  SELECT lang, text,
{_Q198_COUNTS}
  FROM documents),
dom AS (
  SELECT lang,
         {_Q198_TOTAL} AS letters,
         CASE WHEN {_Q198_TOTAL} > 0
              THEN list_max([{_Q198_STRUCTS}]).s
              ELSE 'none' END AS dominant_script
  FROM cnt)
SELECT lang, dominant_script,
       CAST(COUNT(*) AS BIGINT) AS n_docs,
       CAST(SUM(letters) AS BIGINT) AS script_letters
FROM dom GROUP BY lang, dominant_script ORDER BY lang, dominant_script
"""


SQL: dict[str, str] = {
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
    "q189_stream_bh_fdr": Q189_SQL,
    "q190_stream_reservoir": Q190_SQL,
    "q191_stream_rule_audit": Q191_SQL,
    "q192_stream_hll_distinct": Q192_SQL,
    "q193_stream_profile": Q193_SQL,
    "q194_raw_ingest": Q194_SQL,
    "q195_domain_curation": Q195_SQL,
    "q196_html_extract": Q196_SQL,
    "q197_code_signals": Q197_SQL,
    "q198_script_mix": Q198_SQL,
}
