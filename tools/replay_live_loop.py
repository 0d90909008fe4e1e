#!/usr/bin/env python
"""End-to-end live-loop replay (SURVEY.md §3): a deterministic metric
timeline driven through the real pipelines — windowed per-node averages,
quorum classifier (D1), then the stateful decision cascade (D3, keyed
state under Structured Streaming) into the idempotent action sink.

Scenario (one cluster, 3 nodes, 15 s ticks):
  ticks  0-7   cpu 0.40  -> cold then below-quorum SHRINK territory
  ticks  8-19  cpu 0.90  -> expand quorum (spike)
  tick   20    resize observed -> skip + cooldown clock reset
  ticks 21-27  cpu 0.30  -> SHRINK, but gated until cooldown elapses
  ticks 28-31  idle      -> shrink-to-min bypasses everything

Exits non-zero if the emitted action sequence deviates from the golden
expectation, so this doubles as an integration check.

Usage: python tools/replay_live_loop.py [--keep OUTDIR]
"""

from __future__ import annotations

import argparse
import os
import sys
import tempfile

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import Window
from pyspark.sql import functions as F

TICK_MS = 15_000


def build_node_cpu(spark):
    rows = []
    for tick in range(32):
        if tick < 8:
            cpu = 0.40
        elif tick < 20:
            cpu = 0.90
        else:
            cpu = 0.30
        for node in ("n1", "n2", "n3"):
            rows.append((tick, tick * TICK_MS, node, cpu))
    return spark.createDataFrame(rows, "tick int, ts_ms long, node string, cpu double")


def verdict_per_tick(node_cpu):
    """W2/A1-A6/D1 in sliding form: per tick, the classifier verdict the
    evaluator would compute from the store at that moment."""
    w = Window.partitionBy("node").orderBy("tick").rowsBetween(-3, 0)
    per_node = node_cpu.select(
        "tick",
        "node",
        F.avg("cpu").over(w).alias("avg4"),
        F.count("*").over(w).alias("n_points"),
    )
    per_tick = per_node.groupBy("tick").agg(
        F.sum(F.when(F.col("n_points") >= 4, 1).otherwise(0)).alias("warm_nodes"),
        F.count("*").alias("total_nodes"),
        F.sum(
            F.when((F.col("n_points") >= 4) & (F.col("avg4") >= 0.7), 1).otherwise(0)
        ).alias("hi"),
        F.sum(
            F.when(
                (F.col("n_points") >= 4)
                & (F.col("avg4") > 0.5)
                & (F.col("avg4") < 0.7),
                1,
            ).otherwise(0)
        ).alias("mid"),
    )
    # CpuLoadEvaluator.scala:18-32 — cold -> NONE; hi quorum -> EXPAND;
    # mid quorum -> NONE; else SHRINK (quorum fraction 0.8)
    return per_tick.select(
        "tick",
        F.when(F.col("warm_nodes") == 0, "NONE")
        .when(F.col("hi") >= F.col("total_nodes") * 0.8, "EXPAND")
        .when(F.col("mid") >= F.col("total_nodes") * 0.8, "NONE")
        .otherwise("SHRINK")
        .alias("verdict"),
    )


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--keep", default="", help="keep outputs in this dir")
    args = ap.parse_args()

    from emr_trino_autoscale_spark.session import get_spark
    from emr_trino_autoscale_spark.streaming import pipeline, sinks, stateful

    spark = get_spark(app_name="live-loop-replay", cpus=8, shuffle_partitions=8)
    spark.sparkContext.setLogLevel("ERROR")

    workdir = args.keep or tempfile.mkdtemp(prefix="live-loop-")
    src, chk, out = (os.path.join(workdir, d) for d in ("src", "chk", "out"))

    node_cpu = build_node_cpu(spark)
    verdicts = verdict_per_tick(node_cpu)

    # evaluation ticks: inject the scripted idle/resizing/capacity story
    ticks = verdicts.select(
        F.lit("c1").alias("cluster_id"),
        (F.col("tick") * TICK_MS).cast("long").alias("ts_ms"),
        (F.col("tick") >= 28).alias("is_idle"),
        (F.col("tick") == 20).alias("is_resizing"),
        F.lit(0).cast("int").alias("required"),
        F.when(F.col("tick") >= 20, 15).otherwise(10).cast("int").alias("running"),
        F.when(F.col("tick") >= 20, 15).otherwise(10).cast("int").alias("requested"),
        "verdict",
    )
    ticks.repartition(1).write.mode("overwrite").parquet(src)

    stream = spark.readStream.schema(stateful.EVAL_INPUT_SCHEMA).parquet(src)
    q = (
        pipeline.attach_decision_query(
            pipeline.decisions_stream(stream), sinks.resize_action_sink(out), chk
        )
        .start()
    )
    q.processAllAvailable()
    q.stop()

    actions = (
        spark.read.parquet(os.path.join(out, "actions_out"))
        .orderBy("ts_ms")
        .collect()
    )
    print(f"{'tick':>4} {'reason':<16} {'action':<7} capacity")
    for r in actions:
        print(
            f"{r['ts_ms'] // TICK_MS:>4} {r['reason']:<16} {r['action']:<7} {r['capacity']}"
        )

    # The sink records *issued* resizes only (NONE decisions never reach
    # it, mirroring the reference's effect path). Golden expectations:
    #   - nothing during the cold/low phase (ticks 0-9)
    #   - EXPAND from tick 10 (spike fills the 4-point window: avg
    #     (0.4+0.9+0.9+0.9)/4 = 0.775 >= 0.7) through tick 19 — issuing
    #     does NOT reset the cooldown clock (reference quirk)
    #   - SILENCE ticks 20-27: observed resize skips + resets the clock,
    #     then the cooldown gates the SHRINK verdicts
    #   - idle SHRINK-to-min from tick 28 (bypasses the cooldown)
    got = [(r["ts_ms"] // TICK_MS, r["reason"], r["action"]) for r in actions]
    want = [(t, "evaluated", "EXPAND") for t in range(10, 20)] + [
        (t, "idle", "SHRINK") for t in range(28, 32)
    ]
    if got != want:
        print(f"GOLDEN MISMATCH:\n want {want}\n got  {got}")
        return 1
    print("live-loop replay matches the golden scenario "
          "(cooldown suppression visible as the tick 20-27 silence)")
    return 0


if __name__ == "__main__":
    sys.exit(main())
