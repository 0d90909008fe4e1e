"""Round-13 declaration candidates (queries_staging.py) run against
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


def test_staged_results_are_not_vacuous(spark):
    """Both staged rollups must exercise their interesting legs on the
    smoke fixture: q197 must see at least one kept and one dropped doc
    (all-keep or all-drop would make the verdict leg vacuous), q198
    must see at least one non-latin dominant script or a 'none' row is
    fine — but the latin mass must be positive (prose corpus)."""
    rows197 = STAGED_QUERIES["q197_code_signals"](spark, SF_SMOKE).collect()
    total = sum(r["n_docs"] for r in rows197)
    kept = sum(r["n_keep"] for r in rows197)
    assert 0 < kept < total, (kept, total)

    rows198 = STAGED_QUERIES["q198_script_mix"](spark, SF_SMOKE).collect()
    assert sum(r["script_letters"] for r in rows198) > 0
    assert any(r["dominant_script"] == "latin" for r in rows198)
