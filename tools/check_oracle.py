#!/usr/bin/env python
"""Local mirror of the driver's t2 correctness gate.

For every declared query, runs the Spark builder AND the DuckDB oracle
SQL over the same parquet tables, then compares row count, schema
(column names) and an order-insensitive canonical value dump. Exits
non-zero and prints per-query diffs on mismatch.

Usage: python tools/check_oracle.py [--sf /root/testdata/sf0.01] [--only q09,...]
       python tools/check_oracle.py --staged   # next-round candidates
                                               # (queries_staging.py,
                                               # absent when none staged)
"""

from __future__ import annotations

import argparse
import decimal
import math
import sys
import time

import duckdb


def canon(v) -> str:
    if v is None:
        return "NULL"
    if isinstance(v, bool):
        return "true" if v else "false"
    if isinstance(v, decimal.Decimal):
        return str(v.quantize(decimal.Decimal("0.0001")))
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        return repr(v)
    return str(v)


def rows_to_canon(cols: list[str], rows: list[tuple]) -> list[str]:
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    out = ["\x1f".join(canon(r[i]) for i in order) for r in rows]
    out.sort()
    return out


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf", default="/root/testdata/sf0.01")
    ap.add_argument("--only", default="")
    ap.add_argument("--cpus", default="8")
    ap.add_argument(
        "--staged",
        action="store_true",
        help="check the next-round declaration candidates (queries_staging.py) "
        "instead of the declared suite",
    )
    args = ap.parse_args()

    if args.staged:
        try:
            from emr_trino_autoscale_spark.queries_staging import (
                STAGED_QUERIES as QUERIES,
                STAGED_SQL as ORACLE,
            )
        except ModuleNotFoundError as exc:
            # ONLY the module-deleted-after-declaration case is
            # "nothing staged"; a broken import INSIDE an existing
            # staging module must fail loudly, not green-light
            # (round-11 review finding)
            if exc.name != "emr_trino_autoscale_spark.queries_staging":
                raise
            print("nothing staged (queries_staging.py absent — all "
                  "candidates declared)")
            return 0
    else:
        from emr_trino_autoscale_spark.queries import ORACLE, QUERIES
    from emr_trino_autoscale_spark.session import get_spark

    spark = get_spark(cpus=args.cpus, shuffle_partitions=16)

    con = duckdb.connect()
    for t in (
        "region nation customer supplier part orders lineitem events documents embeddings"
    ).split():
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{args.sf}/{t}.parquet')"
        )

    names = list(QUERIES)
    if args.only:
        names = [n for n in names if any(n.startswith(p) for p in args.only.split(","))]

    failures = []
    for name in names:
        t0 = time.time()
        try:
            sdf = QUERIES[name](spark, args.sf)
            srows = sdf.collect()
            scols = sdf.columns
        except Exception as e:  # noqa: BLE001
            failures.append(name)
            print(f"FAIL  {name}: spark raised {type(e).__name__}: {e}")
            continue
        if name not in ORACLE:
            # no SQL-expressible oracle (driver records rows-only)
            dt = time.time() - t0
            print(f"OK*   {name} ({dt:.1f}s, {len(srows)} rows — rows-only, no oracle)")
            continue
        try:
            drel = con.sql(ORACLE[name])
            dcols = drel.columns
            drows = drel.fetchall()
        except Exception as e:  # noqa: BLE001
            failures.append(name)
            print(f"FAIL  {name}: duckdb raised {type(e).__name__}: {e}")
            continue

        problems = []
        if sorted(scols) != sorted(dcols):
            problems.append(f"schema: spark={sorted(scols)} duck={sorted(dcols)}")
        if len(srows) != len(drows):
            problems.append(f"rowcount: spark={len(srows)} duck={len(drows)}")
        if not problems:
            sc = rows_to_canon(scols, [tuple(r) for r in srows])
            dc = rows_to_canon(dcols, drows)
            if sc != dc:
                diff = [
                    (a, b) for a, b in zip(sc, dc) if a != b
                ][:3]
                problems.append(f"values: first diffs {diff}")
        dt = time.time() - t0
        if problems:
            failures.append(name)
            print(f"FAIL  {name} ({dt:.1f}s): " + "; ".join(problems))
        else:
            print(f"OK    {name} ({dt:.1f}s, {len(srows)} rows)")

    from emr_trino_autoscale_spark.queries import release_caches

    release_caches()

    print(f"\n{len(names) - len(failures)}/{len(names)} queries match")
    return 1 if failures else 0


if __name__ == "__main__":
    sys.exit(main())
