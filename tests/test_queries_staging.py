"""Round-11 declaration candidates (queries_staging.py, VERDICT r9
task 3): the five X155-X159 maintainer queries run against their
DuckDB oracles every pytest run, so the round-11 declaration is a file
move of already-green code, not new work. Same comparison as the
driver gate (row count + column names + order-insensitive canonical
values)."""

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


def test_staging_not_declared():
    """The suite is growth-frozen until round 11 (README coverage
    map): staged queries must NOT appear in the declared QUERIES."""
    from emr_trino_autoscale_spark.queries import QUERIES

    assert not set(STAGED_QUERIES) & set(QUERIES)
    assert set(STAGED_QUERIES) == set(STAGED_SQL)


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
