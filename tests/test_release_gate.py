"""Composed release-gate pipeline (VERDICT r9 task 6): the end-to-end
flow a real corpus release runs — curation funnel -> dedup report ->
dataset card -> partition-layout audit — chained as ONE pipeline at
sf0.1, asserting the card's numbers equal the funnel's stage outputs.
Each piece is individually oracle-checked (q67/q21/q186/q187); this
test pins that their COMPOSITION is consistent: the corpus the card
describes is exactly the corpus the funnel kept and exactly the corpus
the layout audit plans files for.
"""

from __future__ import annotations

import os

import pytest
from pyspark.sql import functions as F

SF01 = "/root/testdata/sf0.1"


@pytest.mark.slow
def test_release_gate_pipeline_consistent(spark):
    if not os.path.isdir(SF01):
        pytest.skip(f"{SF01} missing")

    from emr_trino_autoscale_spark.io import load_table
    from emr_trino_autoscale_spark.operators import bucketing, text
    from emr_trino_autoscale_spark.queries import QUERIES, release_caches

    d = load_table(spark, SF01, "documents")

    # Stage 1+2: the funnel's keep flags (exact dedup, near dedup,
    # quality gate) — the SAME helper the declared q67 report uses, so
    # report and shipped corpus cannot drift apart.
    flags = text.curation_keep_flags(d).persist()
    survivors = flags.filter(F.col("keep_q")).select(
        "doc_id", "text", "lang", "source", "n_chars", "n_tok"
    )

    # The declared stage-count report over the same table.
    funnel = {
        r["stage"]: (r["n_docs"], r["n_tokens"])
        for r in QUERIES["q67_curation_funnel"](spark, SF01).collect()
    }

    # Stage 3: dataset card over the SURVIVING corpus (q186 cards the
    # raw table; the release ships the filtered one).
    card = text.dataset_card(survivors).collect()[0]

    # Stage 4: partition-layout audit of the planned by-language write
    # of the surviving corpus (q187's parameters).
    layout = bucketing.partition_layout_audit(
        survivors,
        ["lang"],
        F.col("n_chars") + F.lit(64),
        target_file_bytes=16 * 1024,
    ).collect()

    # --- consistency pins ---
    n_kept, tok_kept = funnel["quality"]
    assert n_kept > 0 and funnel["raw"][0] > n_kept

    # card over survivors == funnel's final stage
    assert card["n_docs"] == n_kept
    assert card["n_tokens"] == tok_kept
    # exact dedup already ran inside the funnel: the shipped corpus has
    # zero duplicate texts, and the card must say so
    assert card["n_unique_texts"] == n_kept
    assert card["dup_rate"] == "0.0000"

    # the layout audit plans files for exactly the shipped rows, with
    # every language the card counted and none it didn't
    assert sum(r["n_rows"] for r in layout) == n_kept
    assert len(layout) == card["n_langs"]
    assert all(r["n_files"] >= 1 for r in layout)
    # estimated bytes = sum(n_chars) + 64B/row over survivors, exactly
    est = survivors.agg(
        (F.sum("n_chars") + 64 * F.count("*")).alias("b")
    ).collect()[0]["b"]
    assert sum(r["est_bytes"] for r in layout) == est

    # funnel internal monotonicity (raw >= exact >= near >= quality)
    ns = [funnel[s][0] for s in ("raw", "exact_dedup", "near_dedup", "quality")]
    assert ns == sorted(ns, reverse=True)

    # Stage 5 (round-11, VERDICT r10 task 6): the REAL write. Land the
    # shipped corpus with the X49 compacted writer under the audit's
    # parameters and cross-check the audit's plan against actual
    # parquet footers — estimate-vs-actual, not plan-vs-plan.
    import glob
    import shutil
    import tempfile

    from emr_trino_autoscale_spark.io import write_compacted

    dest = tempfile.mkdtemp(prefix="release_gate_")
    try:
        planned = write_compacted(
            survivors,
            dest,
            target_file_mb=1,
            partition_by=("lang",),
        )
        landed = spark.read.parquet(dest)
        # the landed corpus is row-for-row the audited one, per language
        landed_rows = {
            r["lang"]: r["n"]
            for r in landed.groupBy("lang").agg(F.count("*").alias("n")).collect()
        }
        assert landed_rows == {r["lang"]: r["n_rows"] for r in layout}
        # file geometry: every audited language directory landed, with a
        # file count in the same regime the writer planned (co-located
        # salted write — NOT one shard per upstream task; collisions of
        # salt buckets on a task merge files, never exceed the plan by
        # more than the partition count)
        landed_files = {
            d.split("lang=")[-1]: len(glob.glob(d + "/*.parquet"))
            for d in glob.glob(dest + "/lang=*")
        }
        assert set(landed_files) == set(landed_rows)
        assert sum(landed_files.values()) <= planned + len(landed_files)
        assert all(n >= 1 for n in landed_files.values())
        # estimate-vs-actual bytes: the audit's est_bytes model
        # (n_chars + 64/row) must agree with the landed encoded bytes
        # within the snappy/dictionary compression regime — a gross
        # model error (wrong column, forgotten rows) lands outside
        # [0.1x, 3x] on text corpora long before compression does
        actual_bytes = {
            d.split("lang=")[-1]: sum(
                os.path.getsize(f) for f in glob.glob(d + "/*.parquet")
            )
            for d in glob.glob(dest + "/lang=*")
        }
        est_bytes = {r["lang"]: r["est_bytes"] for r in layout}
        for lang, est in est_bytes.items():
            assert 0.1 * est <= actual_bytes[lang] <= 3.0 * est, (
                lang, est, actual_bytes[lang]
            )
    finally:
        shutil.rmtree(dest, ignore_errors=True)

    flags.unpersist()
    release_caches()
