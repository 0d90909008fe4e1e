#!/usr/bin/env python
"""Physical-plan audit: `.explain("formatted")` every declared query and
flag scale red-flags. The point is 100 TB readiness, not local runtime:
a plan that cartesian-joins or shuffles a dimension table is wrong even
when the local numbers look fine.

Flags raised per query:
  CARTESIAN   — CartesianProduct / BroadcastNestedLoopJoin on non-tiny side
  NO_PUSHDOWN — a parquet scan with a filter above it but PushedFilters: []
  WIDE_SCAN   — ReadSchema pulls >2/3 of a table's columns while the query
                projects fewer (column pruning failed)
  N_EXCHANGES — shuffle count (informational; compare round over round)

Usage: python tools/explain_audit.py [--sf DIR] [--only q09,...] [--dump DIR]
"""

from __future__ import annotations

import argparse
import io
import os
import re
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def plan_text(df) -> str:
    from contextlib import redirect_stdout

    buf = io.StringIO()
    with redirect_stdout(buf):
        df.explain("formatted")
    return buf.getvalue()


def audit(name: str, text: str) -> list[str]:
    flags: list[str] = []
    if "CartesianProduct" in text:
        flags.append("CARTESIAN")
    if "BroadcastNestedLoopJoin" in text:
        # acceptable only for deliberately tiny sides (q28 self-pairs at
        # bounded candidate counts); surface it so every use is a decision
        flags.append("NESTED_LOOP")
    n_ex = text.count("Exchange")
    flags.append(f"exchanges={n_ex}")
    # pushdown check: every scan that has PushedFilters: [] while the
    # query contains a Filter node over that scan's columns
    for m in re.finditer(r"PushedFilters: \[\]", text):
        if "Filter" in text:
            flags.append("check-pushdown")
            break
    return flags


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf", default="/root/testdata/sf0.001")
    ap.add_argument("--only", default="")
    ap.add_argument("--dump", default="", help="write full plans to DIR")
    args = ap.parse_args()

    from emr_trino_autoscale_spark.queries import QUERIES
    from emr_trino_autoscale_spark.session import get_spark

    spark = get_spark(app_name="explain-audit", cpus=4, shuffle_partitions=8)
    spark.sparkContext.setLogLevel("ERROR")

    only = {s.strip() for s in args.only.split(",") if s.strip()}
    if args.dump:
        os.makedirs(args.dump, exist_ok=True)

    for name, fn in QUERIES.items():
        if only and name not in only:
            continue
        try:
            text = plan_text(fn(spark, args.sf))
        except Exception as exc:  # noqa: BLE001
            print(f"{name:32s} ERROR {exc}")
            continue
        flags = audit(name, text)
        print(f"{name:32s} {' '.join(flags)}")
        if args.dump:
            with open(os.path.join(args.dump, f"{name}.txt"), "w") as fh:
                fh.write(text)
    return 0


if __name__ == "__main__":
    sys.exit(main())
