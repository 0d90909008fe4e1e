"""Round-12 declaration candidates, STAGED (VERDICT r10 task 4).

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


STAGED_QUERIES = {
    "q194_raw_ingest": q194_raw_ingest,
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

STAGED_SQL = {
    "q194_raw_ingest": Q194_SQL,
}
