"""Round-12 declaration candidates, STAGED (VERDICT r10 task 4).

Three candidates, all oracle-tested every pytest run and via
``tools/check_oracle.py --staged``:

q196 turns the X164 HTML->text extractor's RE2-replayability claim
into driver-grade evidence: a deterministic markup synthesis around
each document's text, extracted by the X164 chain, fingerprinted
per-document (bit_xor of md5 prefixes) — the oracle replays the same
public regexp chain in DuckDB.

q195 gives the round-11 URL curation family (X162 canonicalization +
X163 per-domain rollup) a driver-oracle-able form over a
deterministic messy-URL synthesis; its oracle derives the expected
canonical forms from first principles (see the builder docstring).

q194 gives the round-10 raw-corpus ingest edge (X160, unit-only so
far) a DRIVER-ORACLE-ABLE form: the builder round-trips the documents
table through the REAL ingest path — JSON-encode each row to newline-
delimited shards with a deterministically corrupted subset (doc_id %
37 == 0: the closing brace truncated, so the line is malformed JSON),
then run :func:`io.ingest_documents` (explicit-schema PERMISSIVE
read, corrupt-line quarantine, digest/n_chars canonicalization,
compacted parquet landing) and report, per landing status, the row
count plus content fingerprints read back OFF THE LANDED PARQUET
(bit_xor of the 60-bit digest prefix, sum of recomputed n_chars).

The oracle replays from the ORIGINAL documents view: the clean
partition is exactly the non-corrupted doc_ids, and the landed
digests/n_chars must equal md5/length of the original text — so the
hash match proves the full round trip (JSON encode -> raw text shards
-> schema'd permissive decode -> quarantine split -> parquet landing
-> canonicalization) is lossless on clean rows and quarantines
exactly the corrupted ones. bit_xor (both engines have the aggregate)
keeps the fingerprint order-insensitive and overflow-free where a SUM
of 60-bit values would overflow BIGINT.

At round 12: move the builder into queries.py (APPENDED after
position 50 per the window-pin rule), move its SQL into
queries_sql.py, extend declared_round in tests/test_queries_oracle.py
with round 12, and delete this module. Until then
tests/test_queries_staging.py runs it against the oracle every pytest
run (and ``tools/check_oracle.py --staged`` runs the exact driver-gate
comparison at any SF). Warm steady-state at sf0.1 the builder runs
~2-3 s (text-shard write + ingest persist + two landed-parquet aggs);
its first driver bench position will set the anchor.
"""

from __future__ import annotations

import os as _os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from .io import ingest_documents, load_table

_Q194_BASE = _os.path.join(
    _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))),
    "spark-warehouse",
)
_Q194_SRC = _os.path.join(_Q194_BASE, "q194_raw_jsonl")
_Q194_DEST = _os.path.join(_Q194_BASE, "q194_landing")


def q194_raw_ingest(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X160 — the ingest edge, oracle-checkable end to end (see module
    docstring). Every step is the production path: the JSONL shards
    are written as plain text files (one shard per task, the shape a
    real corpus delivery has), the read is the explicit-schema
    PERMISSIVE reader, and the landing is the compacted writer."""
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


def q195_domain_curation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X162/X163 — URL canonicalization + per-domain curation rollup
    over a deterministic messy-URL synthesis (documents has no URL
    column, so the query builds one per doc from doc_id/source with
    every normalization hazard: mixed case, userinfo, default and
    non-default ports, empty paths, tracking params in shuffled
    positions, fragments, and a malformed class). The oracle derives
    the EXPECTED canonical form from the same components from first
    principles — it never reimplements the parser — so a hash match
    proves the canonicalizer strips/sorts/defaults exactly right,
    including the variant collisions n_canonical counts."""
    from .operators.text import domain_curation_stats

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
    return domain_curation_stats(
        urls, "url", quota=100, with_sample=True
    ).orderBy("domain")



def q196_html_extract(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X164 — HTML->text extraction, oracle-checkable: documents has
    no markup column, so the query wraps each doc's text in a
    deterministic markup synthesis exercising every stripper stage
    (script/style blocks with nested fake tags, comments, attribute
    tags, all six entities incl. the &amp;-last double-decode hazard),
    extracts with the X164 chain, and reports per-bucket counts,
    raw/extracted length sums, and an order-insensitive content
    fingerprint (bit_xor of the md5-prefix of each EXTRACTED text —
    the q194 convention), so the hash match proves per-document
    equality of the extraction, not just aggregate lengths. The
    oracle replays each regexp literally — the X164 patterns are
    RE2-compatible by design (no backreferences/lookaround), which is
    exactly the property this staged query turns into driver-grade
    evidence."""
    from .operators.text import html_to_text

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
            html_to_text(html).alias("__x"),
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


STAGED_QUERIES = {
    "q194_raw_ingest": q194_raw_ingest,
    "q195_domain_curation": q195_domain_curation,
    "q196_html_extract": q196_html_extract,
}


# Oracle SQL — moves into queries_sql.py verbatim at declaration time.
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
      '\\s+', ' ', 'g')) AS extracted
  FROM h)
SELECT bucket,
       CAST(COUNT(*) AS BIGINT) AS n_docs,
       CAST(SUM(length(html)) AS BIGINT) AS raw_len_sum,
       CAST(SUM(length(extracted)) AS BIGINT) AS text_len_sum,
       CAST(bit_xor(CAST('0x' || substr(md5(extracted), 1, 15) AS BIGINT))
            AS BIGINT) AS text_digest_xor
FROM x GROUP BY bucket ORDER BY bucket
"""

STAGED_SQL = {
    "q194_raw_ingest": Q194_SQL,
    "q195_domain_curation": Q195_SQL,
    "q196_html_extract": Q196_SQL,
}
