"""Driver-contract guard: the external driver imports __spark_entry__
with its OWN bare SparkSession (no engine confs). Every runtime-conf
dependency must therefore be applied inside io.load_table
(ensure_runtime_confs), not only in session.get_spark.

This is the exact failure class that broke round 4: ingestion assumed
one parquet timestamp encoding and a bare session surfaced the gap as
an AnalysisException in a gate query. The test runs in a SUBPROCESS so
the session-scoped engine fixture (tests/conftest.py) cannot leak its
confs in.

Marked slow: one extra JVM spin-up (~40 s).
"""

from __future__ import annotations

import os
import subprocess
import sys

import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

_SCRIPT = r"""
import sys
sys.path.insert(0, {repo!r})
from pyspark.sql import SparkSession

spark = SparkSession.builder.master("local[8]").getOrCreate()

import __spark_entry__ as e

rows = e.entry(spark).collect()
assert len(rows) >= 0

qs = e.queries()
# q19 exercises the timestamp-ingestion path end to end (unix_millis
# rejects TIMESTAMP_NTZ — the round-4 breakage); q51 exercises the
# events value/histogram path; q69 the documents text path.
for name in ("q19_epoch_roundtrip", "q51_value_histogram", "q69_vocab_coverage"):
    df = qs[name](spark, {sf!r})
    assert df.count() > 0, name
    assert len(df.columns) > 0, name

sql = e.oracle_sql()
assert set(sql) <= set(qs)
print("PLAIN-SESSION-OK")
"""


@pytest.mark.slow
def test_contract_runs_on_bare_spark_session():
    sf = os.environ.get("SPARK_GRAFT_SMOKE_SF", "/root/testdata/sf0.001")
    script = _SCRIPT.format(repo=REPO, sf=sf)
    proc = subprocess.run(
        [sys.executable, "-c", script],
        capture_output=True,
        text=True,
        timeout=600,
        cwd=REPO,
    )
    assert proc.returncode == 0, f"stderr tail: {proc.stderr[-2000:]}"
    assert "PLAIN-SESSION-OK" in proc.stdout
