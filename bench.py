#!/usr/bin/env python
"""Benchmark harness: runs every declared query at
``$SPARK_GRAFT_SF_DIR`` (default /root/testdata/sf0.1) on
``local[$SPARK_GRAFT_CPUS]``.

Output contract (the external driver keeps only the LAST ~2000 chars of
stdout, which truncated the head of the old single 2.4 KB JSON line and
left BENCH_r03/BENCH_r05 with ``parsed: null``):

1. a FULL long-form JSON line (full query names, 3-decimal times) —
   the human/audit record, also written to ``bench_full.json``;
2. the FINAL line: a compact JSON record guaranteed < ~1.8 KB so it
   always fits *whole* inside the driver's tail window::

       {"queries":{"1":113,...},"q_unit":"centisec",
        "metric":"declared_query_suite_runtime","value":N,"unit":"sec","sf":0.1}

   Query keys are the BARE query numbers; per-query values are
   INTEGER CENTISECONDS (see ``q_unit``) — the suite total stays
   seconds in ``value``. ``queries`` first and the trailer last so
   even pathological growth degrades to a truncated-but-recoverable
   trailer rather than a lost total. Sized for ~210 queries.

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

# How many leading suite positions the warmup pre-runs full-scale
# untimed (the round-10 head-block generalization). Everything at a
# position >= this still pays first-use codegen in its timed number;
# bench_full.json records the boundary as "warmed_head" so anchor
# comparisons know which regime each number came from (round-10 ADVICE).
# Round 11 widened 15 -> 50 (the full driver hash window): the r11
# rotation put q103 (mapInPandas + a parquet write+readback) at
# position 39 where its first-use cost landed IN its timed number —
# 4.7 s in-suite vs 1.5-2.0 s measured warm-isolated against a 2.54 s
# anchor; positions 16-49 (q88-q102) showed the same class. Anchors
# were all captured at steady state, so the whole WINDOW must be
# timed at steady state. Measured cost: ~+80 s of untimed warmup at
# sf0.1 — bounded, and it buys rotation-proof like-for-like numbers
# for every driver-hashed position.
# Round 13 widened 50 -> 100: the rotation scheme ALWAYS parks the
# just-relocated stalest block (next round's window candidates) at
# positions 51-~100, and that block's anchors are warm-deep-tail
# captures — the seam recurred every rotation (q170/q174 r9,
# q169-q188 r13: the WHOLE block timed 1.3-2.7x its own r12
# deep-tail numbers at positions 51-70 while --ab'ing flat at steady
# state, docs/SCALE.md round 13). Warming positions 1-100 covers the
# window AND the relocated block structurally; positions 101+ sit at
# the same depth every round, so their regime never moves. Measured
# cost: ~+40 s of untimed warmup at sf0.1.
# Round 14 completed the widening to the FULL declared list: the
# "positions 101+ never move regime" assumption held only while the
# box's first-use JIT tax was a mild ~1.5-1.75x. The r14 sandbox
# class pays 4-6x (slow single-core JIT: q134 27.5 s first use vs
# 4.8 s warm-isolated same session; q140/q142/q135 same pattern),
# so the deep tail's timed numbers were dominated by compile cost
# that anchors (steady-state captures) never contained. Warming all
# positions makes every timed number steady-state compute — the
# SAME methodology (first-use codegen + cold IO land in warmup, not
# in the timed query), applied uniformly. Old numbers kept:
# BENCH_r06-r13 and OPTIMIZATION_r14.md record the partial-warm
# regimes and their boundaries ("warmed_head" in every bench_full).
WARM_HEAD_N = len(QUERIES)


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    m = re.search(r"sf([0-9.]+)", sf_dir)
    sf = float(m.group(1)) if m else -1.0

    if "--ab" in sys.argv:
        run_ab(sys.argv[sys.argv.index("--ab") + 1], sf_dir)
        return

    spark = get_spark(app_name="engine-bench")
    spark.sparkContext.setLogLevel("ERROR")

    _warmup(spark, sf_dir)

    # Per-query failure isolation: one broken query must never zero out
    # the whole suite's timings (round-4 lesson — an AnalysisException in
    # a single query aborted the bench with rc=1 and no numbers at all).
    timings: dict[str, float] = {}
    errors: dict[str, str] = {}
    # (round 12: a periodic System.gc() every 25 queries was tried
    # here and REVERTED — forcing major collections mid-suite cost
    # more than the cleaner backlog it flushed: 329 s/median 1.33 vs
    # 304 s/median 1.15 without it, and the random >2x tail set just
    # moved. The one-time post-warmup settle in _warmup stays — it
    # fixed the SYSTEMATIC head transient; random late variance is
    # box state and belongs to the --ab adjudication protocol.)
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
    full = {
        "metric": "declared_query_suite_runtime_full",
        "value": total,
        "unit": "sec",
        "queries": timings,
        "sf": sf,
        # warm/cold boundary (round-10 ADVICE): the head block (first
        # WARM_HEAD_N positions) is pre-run full-scale untimed, so its
        # timed numbers are steady-state; positions beyond it still
        # include first-use codegen. Anchor comparisons must be
        # like-for-like on this flag — a query moving across the
        # boundary between rounds changes regime, not plan cost.
        "warmed_head": list(QUERIES)[:WARM_HEAD_N],
    }
    if errors:
        full["errors"] = errors
    with open(os.path.join(os.path.dirname(os.path.abspath(__file__)),
                           "bench_full.json"), "w") as f:
        json.dump(full, f)
    print(json.dumps(full))

    print(compact_line(timings, total, sf, len(errors)))


def run_ab(
    target: str, sf_dir: str, reps: int = 5, control: str = "q21"
) -> None:
    """Interleaved drift-adjudication A/B (VERDICT r9 task 7): the
    warm-control protocol that adjudicated q85 (r7), q104/q111 (r8) and
    q170/q174 (r9) as position/co-tenant load, previously hand-run each
    time. One session, bench-style warmup, then ``reps`` alternations
    of (target, control) so both arms see identical co-tenant load;
    prints the docs/SCALE.md-format table. A flat control with an
    inflated target means real drift; both inflated means load — don't
    touch the plan (SCALE.md 'guilty until interleaved' rule).

    Usage: ``python bench.py --ab q104`` (bare prefix or full name).
    """
    import statistics

    def _resolve(prefix: str) -> tuple[str, object]:
        for name, fn in QUERIES.items():
            if name == prefix or name.split("_")[0] == prefix:
                return name, fn
        raise SystemExit(f"unknown query {prefix!r}")

    t_name, t_fn = _resolve(target)
    c_name, c_fn = _resolve(control)

    spark = get_spark(app_name="engine-ab")
    spark.sparkContext.setLogLevel("ERROR")
    # head_n=100: the --ab protocol keeps its r13-calibrated warmup
    # (the full 100-query head pre-run whose removal measurably
    # inflated BOTH arms 2.3x — negative experiment, docs/SCALE.md
    # round 13). The round-14 full-suite WARM_HEAD_N widening is a
    # suite-bench methodology change; pre-running all 198 here would
    # only stretch every adjudication by ~10 min without changing
    # either arm's steady state (both arms get their own untimed
    # pre-run below regardless).
    _warmup(spark, sf_dir, head_n=100)
    from emr_trino_autoscale_spark.queries import release_caches

    # one untimed pre-run per arm: the A/B measures steady state, and
    # first-use codegen cost is exactly the confound being adjudicated
    for fn in (t_fn, c_fn):
        fn(spark, sf_dir).write.format("noop").mode("overwrite").save()
    release_caches()

    arms = [(t_name, t_fn), (f"{c_name.split('_')[0]} control", c_fn)]
    times: dict[str, list[float]] = {label: [] for label, _ in arms}
    for _ in range(reps):
        for label, fn in arms:
            t0 = time.time()
            fn(spark, sf_dir).write.format("noop").mode("overwrite").save()
            times[label].append(round(time.time() - t0, 2))
        release_caches()

    print("| arm | times (s) | median |")
    print("|---|---|---|")
    for label, _ in arms:
        ts = times[label]
        print(
            f"| {label} | {' '.join(f'{t:.2f}' for t in ts)} | "
            f"**{statistics.median(ts):.2f}** |"
        )
    # machine-readable FINAL line so the budget guard can run this
    # adjudication protocol unattended (round 11): control-normalized
    # comparisons need both medians, not the markdown table
    ctl_label = f"{c_name.split('_')[0]} control"
    print(json.dumps({
        "ab_target": t_name,
        "ab_control": c_name,
        "target_median": statistics.median(times[t_name]),
        "control_median": statistics.median(times[ctl_label]),
        "target_times": times[t_name],
        "control_times": times[ctl_label],
    }))


def _warmup(spark, sf_dir: str, head_n: int | None = None) -> None:
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
    # One-time JVM/Arrow machinery the suite exercises, warmed on tiny
    # synthetic data: window exec + sort, higher-order functions, regex,
    # explode+hash-agg, percentile sketches, sort-merge join, and the
    # Python/Arrow worker pool (first pandas_udf call forks the daemon).
    # Without this the first few timed queries absorb multi-second JIT
    # cost that is session spin-up, not query cost (measured: q53 4.5 s
    # cold vs 0.9 s warm on identical data).
    #
    # NOTE (baseline provenance): warmup ALSO full-scans the real
    # benched tables (documents/embeddings/events, below) so cold-read
    # IO of the largest inputs lands in warmup, not in whichever query
    # happens to run first. That is a deliberate, documented part of the
    # timing methodology since round 5 — timings measure query compute
    # on page-cache-warm data. tests/bench_baseline.json was captured
    # UNDER this methodology; comparisons against pre-warmup rounds
    # (r01-r03) are not apples-to-apples for the first-positioned
    # queries (see tests/test_bench_budget.py docstring).
    from pyspark.sql import Window

    import pandas as pd
    from pyspark.sql.functions import pandas_udf

    w = spark.range(20_000).select(
        F.col("id"),
        (F.col("id") % 7).alias("g"),
        F.concat(F.lit("tok a b "), F.col("id").cast("string")).alias("s"),
    )
    (
        w.withColumn("toks", F.split("s", " "))
        .withColumn("n", F.size(F.array_distinct(F.col("toks"))))
        .withColumn("t2", F.transform("toks", lambda t: F.upper(t)))
        .withColumn("host", F.regexp_extract("s", r"(\d+)", 1))
        .withColumn("rn", F.row_number().over(Window.partitionBy("g").orderBy("id")))
        .withColumn("csum", F.sum("id").over(
            Window.partitionBy("g").orderBy("id").rowsBetween(Window.unboundedPreceding, 0)
        ))
        .filter(F.col("rn") <= 1000)
        .select("g", F.explode("toks").alias("tok"), "n", "csum", "host")
        .groupBy("g", "tok")
        .agg(F.count("*").alias("c"), F.percentile_approx("n", 0.5).alias("p50"))
        .write.format("noop").mode("overwrite").save()
    )
    a = spark.range(50_000).select(F.col("id"), (F.col("id") % 997).alias("k"))
    b = spark.range(50_000).select((F.col("id") % 997).alias("k"), F.col("id").alias("v"))
    a.join(b.hint("merge"), "k").groupBy("k").agg(F.sum("v")).write.format(
        "noop"
    ).mode("overwrite").save()

    def _warm_fn(x: pd.Series) -> pd.Series:
        return x * 1.0

    # explicit functionType: `from __future__ import annotations` makes
    # the hints strings, which pandas_udf's inference can't resolve
    _warm_udf = pandas_udf(_warm_fn, "double", functionType=200)  # SCALAR
    spark.range(10_000).select(F.sum(_warm_udf(F.col("id").cast("double")))).write.format(
        "noop"
    ).mode("overwrite").save()

    # grouped-map + map-partitions Arrow paths (the similarity/multimodal
    # queries ride applyInPandas / mapInPandas — each has its own
    # first-use runner machinery), HOF aggregate fold, and one REAL full
    # scan of the two extension tables (documents/embeddings are <1 MB
    # at any benched SF; limit(1) above leaves their column readers and
    # dictionary pages cold)
    def _grp(pdf: pd.DataFrame) -> pd.DataFrame:
        return pdf.assign(v=pdf["v"].cumsum())

    g = spark.range(4_000).select((F.col("id") % 8).alias("g"), F.col("id").alias("v"))
    g.groupBy("g").applyInPandas(_grp, "g long, v long").write.format("noop").mode(
        "overwrite"
    ).save()

    def _mp(it):
        for pdf in it:
            yield pdf

    g.mapInPandas(_mp, "g long, v long").write.format("noop").mode("overwrite").save()
    (
        spark.range(4_000)
        .select(F.array(F.col("id"), F.col("id") + 1).cast("array<double>").alias("a"))
        .select(F.aggregate("a", F.lit(0.0), lambda acc, x: acc + x).alias("s"))
        .agg(F.sum("s"))
        .write.format("noop")
        .mode("overwrite")
        .save()
    )
    for t in ("documents", "embeddings", "events"):
        load_table(spark, sf_dir, t).write.format("noop").mode("overwrite").save()

    # Window rotations move whole-stage-codegen first-use cost onto
    # whichever queries now run early (r7 lesson: q79 tripped its budget
    # at 1.8 s vs 0.69 anchor purely from position). Warm the exact
    # expression trees of the early block's representatives on a tiny
    # slice of the real table (codegen caches per generated class, so
    # the full-table query reuses the compiled code): quality_classifier
    # (the r7 trip), plus one md5_long60 HOF fold (the shared digest
    # shape under the text/minhash queries).
    from emr_trino_autoscale_spark.operators import text as _text_ops

    docs_slice = load_table(spark, sf_dir, "documents").limit(200)
    _text_ops.quality_classifier(docs_slice).groupBy("verdict").count().write.format(
        "noop"
    ).mode("overwrite").save()
    from emr_trino_autoscale_spark.functions import md5_long60 as _m60

    (
        docs_slice.select(F.split("text", " ").alias("toks"))
        .select(F.transform("toks", _m60).alias("hs"))
        .select(F.aggregate("hs", F.lit(0).cast("long"), lambda a, h: a.bitwiseXOR(h)).alias("x"))
        .agg(F.max("x"))
        .write.format("noop")
        .mode("overwrite")
        .save()
    )

    # Round-8 rotation: q103-q114 now open the suite. The heavy
    # first-use tree in that block is q104's semantic_dedup (coarse
    # assign max_by hash agg + within-cluster pair-cosine join):
    # measured 4.2 s at position 2 vs the 2.27 s driver-r7 tail anchor,
    # pure position cost. Compile its generated classes on a 256-row
    # slice with the same centroid frame shape.
    from emr_trino_autoscale_spark.operators import similarity as _sim

    _cents = spark.createDataFrame(
        [(c, v) for c, v in enumerate(_sim.md5_centroids(k=8, dim=64))],
        "c_id int, embedding array<double>",
    )
    emb_slice = load_table(spark, sf_dir, "embeddings").limit(256)
    _sim.semantic_dedup(emb_slice, _cents, threshold=0.4).write.format(
        "noop"
    ).mode("overwrite").save()
    # ... and q111's banded-MinHash tree (position 9; 3.6-3.8 s early
    # vs the 2.69 s tail anchor — 90-94% of budget before this warmup).
    from emr_trino_autoscale_spark.operators import dedup as _dedup

    _dedup.minhash_lsh_pairs(docs_slice, threshold=0.5).write.format(
        "noop"
    ).mode("overwrite").save()
    # ... and q114's dimension_stats (position 12): the 129-buffer
    # avg+stddev hash agg (round-8 stability rewrite) generates a large
    # codegen class. Warm on the FULL frame, not the 256-row slice —
    # `.limit()` changes the fused WholeStageCodegen unit, so the slice
    # compiles a DIFFERENT class and the timed query still paid ~1.5 s
    # of first-use compile (measured 3.5 s first run -> 1.7 s steady).
    # Consistent with the warmup methodology above (real-input IO and
    # first-use codegen land in warmup, not in the timed query).
    _sim.dimension_stats(
        load_table(spark, sf_dir, "embeddings"), group_col="label"
    ).write.format("noop").mode("overwrite").save()

    # Round-9 rotation: q115-q164 now open the suite. The heavy
    # first-use trees in the new early block are q115's trigram-index
    # substring search (rarest-probe AND over an exploded trigram
    # posting frame) and q118's containment pairs (shingle explode +
    # asymmetric overlap join). Compile both generated-class families
    # on the 200-row slice (same expression trees; codegen caches per
    # class, so the full-table query reuses the compiled code). The
    # q104/q111/q114 warmups above stay — their driver anchors were
    # captured under this methodology and codegen first-use cost lands
    # in the query's own timed run wherever it sits in the suite.
    _text_ops.substring_search(docs_slice, ["scan merge", "dup"]).write.format(
        "noop"
    ).mode("overwrite").save()
    _dedup.containment_pairs(docs_slice, threshold=0.6).write.format(
        "noop"
    ).mode("overwrite").save()
    # ... and the relocated tail head (q165-q188 moved from suite-end
    # positions, where their driver-r8 anchors were captured, to 51-74
    # in the r9 rotation order): q170's TextRank (pagerank over the
    # word-cooccurrence graph — different generated classes than q150's
    # id-graph pagerank) and q174's bh_fdr (scalable_rank + non-eager
    # localCheckpoint shape) tripped their driver-anchored budgets at
    # the new positions (r9 measured: 3.84 vs 2.34 anchor, 1.48 vs
    # 0.69) — first-use compile cost, adjudicated by a pre/post-change
    # isolation A/B in docs/SCALE.md round 9.
    _text_ops.textrank_keywords(docs_slice, "text", iterations=1).write.format(
        "noop"
    ).mode("overwrite").save()
    from emr_trino_autoscale_spark.operators import stats as _stats_ops

    _stats_ops.bh_fdr(
        docs_slice.select(
            F.col("doc_id").alias("t"), (F.col("doc_id") % 97 / 100.0).alias("p")
        ),
        "t",
        "p",
    ).write.format("noop").mode("overwrite").save()

    # Round-10 generalization (VERDICT r9 task 2): every rotation moves a
    # block of queries from suite-tail to the head, and each time
    # the same first-use-codegen drift class recurred under driver
    # conditions (q02 r6, q79 r7, q104/q111 r8, q115-q118/q122 +
    # q170/q174 r9) because the hand-picked representative-tree warmups
    # above only covered SOME of the relocated trees. Close the class
    # structurally: pre-run the entire head block (first WARM_HEAD_N
    # positions — round 11: the full 50-slot driver window)
    # once, full-scale, untimed. Full-scale — not a 200-row slice —
    # because `.limit()` changes the fused WholeStageCodegen unit (the
    # q114 lesson above), so only the real plan compiles the real
    # classes. This is the same documented methodology (first-use codegen
    # + cold IO land in warmup, not in the timed query), applied
    # uniformly so future rotations need zero per-rotation hand-tuning.
    # Cost at sf0.1: ~20 s of warmup (measured from BENCH_r09 head
    # times); timed numbers measure steady-state compute.
    from emr_trino_autoscale_spark.queries import release_caches

    for name, fn in list(QUERIES.items())[: (WARM_HEAD_N if head_n is None else head_n)]:
        try:
            fn(spark, sf_dir).write.format("noop").mode("overwrite").save()
        except Exception:  # noqa: BLE001 — warmup must never abort the bench
            pass
    release_caches()
    # Post-warmup settle (round 12): the 50-query head pre-run leaves a
    # driver-GC-triggered backlog — ContextCleaner shuffle/broadcast
    # removals and accumulated driver garbage fire on the NEXT major
    # GC, which otherwise lands a few queries INTO the timed pass.
    # Measured: positions 2-16 ran 2-10x their anchors in the r11
    # driver bench AND the r12 standalone (peak q10 13.4 s vs 1.34
    # anchor) while the SAME queries --ab'd flat at steady state.
    # Force the GC now and give the cleaner a moment, so cleanup cost
    # stays in warmup where the methodology puts one-time costs.
    try:
        spark.sparkContext._jvm.System.gc()
    except Exception:  # noqa: BLE001 — py4j hiccup must not abort
        pass
    time.sleep(3.0)


def compact_line(
    timings: dict[str, float], total: float, sf: float, n_errors: int = 0
) -> str:
    """FINAL line: compact record sized for the driver's ~2000-char tail
    capture (see module docstring). Keys are the BARE query numbers
    ("1".."193" — unique by declaration); per-query values are
    INTEGER CENTISECONDS (q_unit field says so) — the round-8 fixes
    after first 155 qNN/2-decimal entries (1818 chars) and then 178
    numeric-key/2-decimal entries (1928) overflowed the guard. The
    suite total stays SECONDS in "value"/"unit".

    Graceful degradation (round-9 fix): a uniformly slow-but-still-
    under-budget run at 193 queries can push the centisecond map past
    1800 chars (budget-ceiling reconstruction: 1897), and the old hard
    assert would then CRASH the bench — rc=1, no numbers at all, the
    exact round-4 failure mode this file exists to prevent. Instead the
    encoder drops one digit of per-query precision (deciseconds), and
    as a last resort drops the per-query map but keeps the parseable
    total. Every fallback is self-describing via "q_unit".
    tests/test_bench_budget.py::test_driver_tail_line_capacity drives
    this encoder at the per-query budget ceiling so the fallback chain
    is proven to fit BEFORE a suite-size change can overflow it.
    """
    for unit, scale, digits in (("centisec", 100, 3), ("decisec", 10, 3)):
        compact = {
            "queries": {
                str(int(n.split("_")[0][1:])): int(round(t * scale))
                for n, t in timings.items()
            },
            "q_unit": unit,
            "metric": "declared_query_suite_runtime",
            "value": round(total, digits),
            "unit": "sec",
            "sf": sf,
        }
        if n_errors:
            compact["n_errors"] = n_errors
        line = json.dumps(compact, separators=(",", ":"))
        if len(line) < 1800:
            return line
    compact = {
        "metric": "declared_query_suite_runtime",
        "value": round(total, 3),
        "unit": "sec",
        "sf": sf,
        "n_queries": len(timings),
        "q_unit": "dropped_overflow",
    }
    if n_errors:
        compact["n_errors"] = n_errors
    line = json.dumps(compact, separators=(",", ":"))
    assert len(line) < 1800, f"compact bench line too long ({len(line)} chars)"
    return line


if __name__ == "__main__":
    main()
