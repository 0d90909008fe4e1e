"""Driver contract for the spark-graft builder (PySpark target).

The driver's verify runs ``entry(spark)`` as a smoke check, runs
each ``queries()[name]`` at sf=0.01 and compares it against the
matching ``oracle_sql()[name]`` via DuckDB (row-count + schema +
order-insensitive value-hash -> CORRECTNESS_r{N}.json). 198 declared
queries as of round 14 (194 with oracles; the iterative trainers q68,
q70, q85 and q120 are rows-only — q71/q86 are hash-verified twins and
q120's pick sequence is golden-pinned in-repo). The driver hashes the
FIRST 50 entries; round 14 rotated q169-q188 + q42-q50 + q68-q72 +
q29-q33 + q51-q57 + q197/q198 + q58/q59 into that window per the
forced schedule — expected outcome 48/50 hash-green + 2 no_oracle
rows (q68/q70 are the window's by-design rows-only trainers). See
README "Verification coverage map" for the rotation schedule and the
198/200 capacity ledger (successor policy: RETIRE_LIST).

Implementation lives in ``emr_trino_autoscale_spark`` (SURVEY.md §2 is
the inventory; queries are declared in emr_trino_autoscale_spark/queries.py).
"""

from __future__ import annotations

import os
import sys
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from emr_trino_autoscale_spark.queries import ORACLE, QUERIES  # noqa: E402


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query (SURVEY.md §7 minimum end-to-end slice): the full
    CPU-quorum classifier + step plan + guard rails pipeline (Q20)."""
    return QUERIES["q20_full_classifier"](spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return dict(QUERIES)


def oracle_sql() -> dict[str, str]:
    return dict(ORACLE)
