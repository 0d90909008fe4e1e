#!/usr/bin/env python
"""Benchmark harness: runs every declared query at
``$SPARK_GRAFT_SF_DIR`` (default /root/testdata/sf0.1) on
``local[$SPARK_GRAFT_CPUS]`` and prints ONE JSON line:

    {"metric": "...", "value": N, "unit": "sec", "queries": {...}, "sf": ...}

Each query is forced to full materialization with a noop write (count()
would let Catalyst prune the computed columns). Timings are per-query
execution only; session startup is excluded.
"""

from __future__ import annotations

import json
import os
import re
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from emr_trino_autoscale_spark.queries import QUERIES  # noqa: E402
from emr_trino_autoscale_spark.session import get_spark  # noqa: E402


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    m = re.search(r"sf([0-9.]+)", sf_dir)
    sf = float(m.group(1)) if m else -1.0

    spark = get_spark(app_name="engine-bench")
    spark.sparkContext.setLogLevel("ERROR")

    # JVM/codegen warmup so the first timed query isn't charged for
    # session spin-up (docstring: session startup is excluded). Warm the
    # paths the suite actually uses — parquet footer/reader init, AQE,
    # whole-stage codegen, broadcast machinery — not just the range
    # codegen: the first parquet-reading query otherwise absorbs ~3-4 s
    # of one-time cost that isn't query cost.
    from pyspark.sql import functions as F

    from emr_trino_autoscale_spark.io import load_table

    spark.range(1_000_000).selectExpr("sum(id)").write.format("noop").mode(
        "overwrite"
    ).save()
    for t in ("events", "orders", "lineitem", "documents", "embeddings",
              "customer", "supplier", "part", "nation", "region"):
        load_table(spark, sf_dir, t).limit(1).write.format("noop").mode(
            "overwrite"
        ).save()
    ev = load_table(spark, sf_dir, "events")
    n = load_table(spark, sf_dir, "nation")
    (
        ev.limit(10_000)
        .join(F.broadcast(n), ev["user_id"] % 25 == n["n_nationkey"], "left")
        .groupBy("event_type")
        .agg(F.count("*"))
        .write.format("noop")
        .mode("overwrite")
        .save()
    )

    # Per-query failure isolation: one broken query must never zero out
    # the whole suite's timings (round-4 lesson — an AnalysisException in
    # a single query aborted the bench with rc=1 and no numbers at all).
    timings: dict[str, float] = {}
    errors: dict[str, str] = {}
    for name, fn in QUERIES.items():
        t0 = time.time()
        try:
            fn(spark, sf_dir).write.format("noop").mode("overwrite").save()
        except Exception as exc:  # noqa: BLE001 — isolate, record, keep going
            errors[name] = f"{type(exc).__name__}: {exc}"[:500]
            continue
        timings[name] = round(time.time() - t0, 3)

    # scoped query caches (q10/q27) are released query-over-query; drop
    # the last query's leftovers so the suite exits with nothing cached
    from emr_trino_autoscale_spark.queries import release_caches

    release_caches()

    total = round(sum(timings.values()), 3)
    out = {
        "metric": "declared_query_suite_runtime",
        "value": total,
        "unit": "sec",
        "queries": timings,
        "sf": sf,
    }
    if errors:
        out["errors"] = errors
    print(json.dumps(out))


if __name__ == "__main__":
    main()
