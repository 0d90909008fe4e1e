"""Round-12 declaration candidates (queries_staging.py) run against
their DuckDB oracles every pytest run — the same comparison the driver
will apply once declared, so declaration is a file move, not new work.
Mirrors tests/test_queries_oracle.py::test_query_matches_oracle."""

from __future__ import annotations

import duckdb
import pytest

from emr_trino_autoscale_spark.io import TABLES
from emr_trino_autoscale_spark.queries_staging import STAGED_QUERIES, STAGED_SQL

from conftest import SF_SMOKE


@pytest.fixture(scope="module")
def duck():
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{SF_SMOKE}/{t}.parquet')"
        )
    yield con
    con.close()


@pytest.mark.parametrize("name", sorted(STAGED_QUERIES))
def test_staged_query_matches_oracle(spark, duck, name):
    import sys

    sys.path.insert(0, "/root/repo/tools")
    from check_oracle import rows_to_canon

    sdf = STAGED_QUERIES[name](spark, SF_SMOKE)
    srows = [tuple(r) for r in sdf.collect()]
    drel = duck.sql(STAGED_SQL[name])
    drows = drel.fetchall()

    assert sorted(sdf.columns) == sorted(drel.columns)
    assert len(srows) == len(drows)
    assert rows_to_canon(sdf.columns, srows) == rows_to_canon(drel.columns, drows)


def test_q194_quarantine_is_nonempty_and_partitions(spark):
    """The corrupted subset must actually exercise the quarantine path
    (a fixture drift that stops producing corrupt lines would make the
    oracle check vacuous on that leg) and the two statuses must
    partition the source corpus exactly."""
    from emr_trino_autoscale_spark.io import load_table

    rows = {
        r["status"]: r["n_rows"]
        for r in STAGED_QUERIES["q194_raw_ingest"](spark, SF_SMOKE).collect()
    }
    assert rows["quarantined"] > 0
    n_docs = load_table(spark, SF_SMOKE, "documents").count()
    assert rows["landed"] + rows["quarantined"] == n_docs
