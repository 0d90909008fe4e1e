"""Scenario tests for the stateful tier (SURVEY.md §5.2): the decision
cascade's cooldown quirks and suspension healing, both as pure-python
per-key logic and as a real Structured Streaming query with keyed state."""

from __future__ import annotations

import os
import tempfile

import pandas as pd
import pytest
from pyspark.sql import Window
from pyspark.sql import functions as F

from emr_trino_autoscale_spark.operators.scaling import IG_POLICY
from emr_trino_autoscale_spark.streaming import pipeline, sinks, stateful

MIN_ = 60_000  # ms


def ticks(rows):
    return pd.DataFrame(
        rows,
        columns=[
            "cluster_id", "ts_ms", "is_idle", "is_resizing",
            "required", "running", "requested", "verdict",
        ],
    )


# Scenario: cooldown suppression + reset-on-observed-resize
# (ScalingManager.scala:26-46 — the clock resets when a resize is
# OBSERVED, not when an action is issued).
def test_cascade_cooldown_and_reset():
    rows = ticks(
        [
            ("c", 10 * MIN_, False, False, 0, 10, 10, "EXPAND"),   # evaluated -> EXPAND
            ("c", 10 * MIN_ + 15_000, False, False, 0, 10, 10, "EXPAND"),  # still evaluated (issuing does NOT reset clock)
            ("c", 11 * MIN_, False, True, 0, 10, 10, "EXPAND"),    # resizing observed -> skip + reset clock
            ("c", 12 * MIN_, False, False, 0, 15, 15, "SHRINK"),   # 1 min after reset -> cooldown
            ("c", 13 * MIN_ + 1, False, False, 0, 15, 15, "SHRINK"),  # > 2 min -> evaluated
        ]
    )
    out, last = stateful.decision_cascade_rows(rows, 0, IG_POLICY)
    assert [d["reason"] for d in out] == [
        "evaluated", "evaluated", "resizing", "cooldown", "evaluated"
    ]
    assert [d["action"] for d in out] == ["EXPAND", "EXPAND", "NONE", "NONE", "SHRINK"]
    assert out[0]["capacity"] == 15 and out[-1]["capacity"] == 12
    assert last == 11 * MIN_


# Scenario: idle and required-workers bypass the cooldown
# (ScalingManager.scala:28-36).
def test_cascade_bypasses():
    rows = ticks(
        [
            ("c", 1 * MIN_, False, False, 0, 10, 10, "EXPAND"),  # within cooldown of t=0? last=0 -> 60000-0 < 2min -> cooldown
            ("c", 1 * MIN_ + 1, True, False, 0, 10, 10, "EXPAND"),  # idle bypasses
            ("c", 1 * MIN_ + 2, False, False, 12, 10, 10, "NONE"),  # required bypasses
        ]
    )
    out, _ = stateful.decision_cascade_rows(rows, 0, IG_POLICY)
    assert [d["reason"] for d in out] == ["cooldown", "idle", "required_workers"]
    assert out[1]["action"] == "SHRINK" and out[1]["capacity"] == IG_POLICY.min_capacity
    assert out[2]["action"] == "EXPAND" and out[2]["capacity"] == 12


# Scenario: suspension -> exclusion -> heal (Workers.scala:256-277).
def test_suspension_refresh():
    rows = pd.DataFrame(
        [
            ("g1", 0, "RUNNING", 5, 5),
            ("g1", 1 * MIN_, "SUSPENDED", 5, 5),     # prev=0 -> not excluded yet; heal fires
            ("g1", 2 * MIN_, "RUNNING", 5, 5),       # within 10 min of suspension -> excluded
            ("g1", 20 * MIN_, "RUNNING", 5, 5),      # window elapsed -> not excluded
        ],
        columns=["task_id", "ts_ms", "status", "running", "requested"],
    )
    out, last = stateful.refresh_rows(rows, 0)
    assert [r["is_excluded"] for r in out] == [True, True, True, False]
    # note: tick 0 has prev=0 -> 0-0 <= 10min -> excluded (reference
    # quirk: a fresh process treats epoch-0 state as "just suspended"
    # until 10 minutes of wall clock pass — Workers.scala:261 verbatim)
    assert out[1]["heal_capacity"] == 5
    assert [r["heal_capacity"] for r in out] == [-1, 5, -1, -1]
    assert last == 1 * MIN_


# End-to-end: the same processors under a real streaming query with
# keyed state and an idempotent foreachBatch action sink.
@pytest.mark.slow
def test_streaming_decision_pipeline(spark, tmp_path):
    src = tmp_path / "src"
    chk = tmp_path / "chk"
    out = tmp_path / "out"
    rows = ticks(
        [
            ("c1", 10 * MIN_, False, False, 0, 10, 10, "EXPAND"),
            ("c1", 13 * MIN_, False, False, 0, 15, 15, "SHRINK"),
            ("c2", 10 * MIN_, True, False, 0, 8, 8, "NONE"),
        ]
    )
    spark.createDataFrame(rows, schema=stateful.EVAL_INPUT_SCHEMA).write.parquet(str(src))
    stream = (
        spark.readStream.schema(stateful.EVAL_INPUT_SCHEMA)
        .parquet(str(src))
    )
    decisions = pipeline.decisions_stream(stream)
    q = (
        decisions.writeStream.foreachBatch(sinks.resize_action_sink(str(out)))
        .option("checkpointLocation", str(chk))
        .outputMode("append")
        .start()
    )
    q.processAllAvailable()
    q.stop()
    got = spark.read.parquet(str(out / "actions_out"))
    actions = {(r["cluster_id"], r["ts_ms"]): r["action"] for r in got.collect()}
    # c1: both ticks evaluated (clock starts at 0); c2 idle-shrinks.
    assert actions[("c1", 10 * MIN_)] == "EXPAND"
    assert actions[("c1", 13 * MIN_)] == "SHRINK"
    assert actions[("c2", 10 * MIN_)] == "SHRINK"
    # idempotence: re-appending the same decisions is a no-op
    sink = sinks.resize_action_sink(str(out))
    sink(spark.read.parquet(str(out / "actions_out")).drop("epoch_id", "reason", "capacity")
         if False else spark.createDataFrame(
             [("c1", 10 * MIN_, "EXPAND", 15, "evaluated")],
             ["cluster_id", "ts_ms", "action", "capacity", "reason"],
         ), 99)
    assert spark.read.parquet(str(out / "actions_out")).count() == 3


@pytest.mark.slow
def test_streaming_task_state(spark, tmp_path):
    src = tmp_path / "src"
    chk = tmp_path / "chk"
    rows = pd.DataFrame(
        [
            ("g1", 0, "RUNNING", 5, 5),
            ("g1", 1 * MIN_, "SUSPENDED", 5, 5),
            ("g2", 0, "RESIZING", 3, 4),
        ],
        columns=["task_id", "ts_ms", "status", "running", "requested"],
    )
    spark.createDataFrame(rows, schema=stateful.REFRESH_INPUT_SCHEMA).write.parquet(str(src))
    stream = spark.readStream.schema(stateful.REFRESH_INPUT_SCHEMA).parquet(str(src))
    states = pipeline.task_state_stream(stream)
    q = (
        states.writeStream.format("memory")
        .queryName("task_state_test")
        .option("checkpointLocation", str(chk))
        .outputMode("append")
        .start()
    )
    q.processAllAvailable()
    q.stop()
    got = {(r["task_id"], r["ts_ms"]): r for r in spark.sql("select * from task_state_test").collect()}
    assert got[("g1", 1 * MIN_)]["is_suspended"] is True
    assert got[("g1", 1 * MIN_)]["heal_capacity"] == 5
    assert got[("g2", 0)]["is_resizing"] is True


@pytest.mark.slow
def test_streaming_dedup_within_watermark(spark, tmp_path):
    import datetime as dt

    src = tmp_path / "src"
    chk = tmp_path / "chk"
    base = dt.datetime(2026, 1, 1, 12, 0, 0)
    rows = [
        (1, base, "same text"),
        (2, base + dt.timedelta(seconds=30), "same text"),      # dup in window
        (3, base + dt.timedelta(seconds=60), "other text"),
        (4, base + dt.timedelta(seconds=90), "same text"),      # still in window
    ]
    df = spark.createDataFrame(rows, "doc_id long, ts timestamp, text string")
    df.repartition(1).write.parquet(str(src))
    stream = spark.readStream.schema(df.schema).parquet(str(src))
    q = (
        pipeline.dedup_stream(stream)
        .writeStream.format("memory")
        .queryName("dedup_stream_test")
        .option("checkpointLocation", str(chk))
        .outputMode("append")
        .start()
    )
    q.processAllAvailable()
    q.stop()
    got = spark.sql("select text, count(*) n from dedup_stream_test group by text").collect()
    counts = {r["text"]: r["n"] for r in got}
    assert counts == {"same text": 1, "other text": 1}


def test_sources_parse(spark):
    raw = spark.createDataFrame(
        [
            ("t1", "n1", '{"attributes": [{"name": "CpuLoad", "value": "0.5"}, {"name": "AvailableProcessors", "value": "8"}]}'),
            ("t1", "n2", "not json at all"),
        ],
        ["ts", "node", "payload"],
    )
    from emr_trino_autoscale_spark.sources import parse_node_cpu, parse_node_registry

    rows = {r["node"]: r for r in parse_node_cpu(raw).collect()}
    assert rows["n1"]["cpu_load"] == 0.5
    assert rows["n1"]["available_processors"] == 8
    assert rows["n1"]["system_cpu_load"] == 0.0  # missing -> default 0
    assert rows["n2"]["cpu_load"] == 0.0  # failed fetch -> zeros, row kept

    reg = spark.createDataFrame(
        [
            ("t1", '{"id": "i-1", "uri": "http://10.0.0.5:8889", "nodeRole": "WORKER", "nodeState": "ACTIVE"}'),
            ("t1", '{"id": "i-2", "uri": "bogus", "nodeRole": "worker", "nodeState": "active"}'),
            ("t1", '{"id": "i-3", "uri": "http://10.0.0.6:8889", "nodeRole": "coordinator", "nodeState": "active"}'),
        ],
        ["ts", "payload"],
    )
    hosts = [r["host"] for r in parse_node_registry(reg).collect()]
    assert hosts == ["10.0.0.5"]


def test_streaming_near_dedup_within_watermark(spark, tmp_path):
    import datetime as dt

    src = tmp_path / "src"
    chk = tmp_path / "chk"
    base = dt.datetime(2026, 1, 1, 12, 0, 0)
    rows = [
        # docs 1/2 differ in the tail word but share the min shingle ->
        # near-dups; doc 3 is disjoint text
        (1, base, "the quick brown fox jumps over the lazy dog"),
        (2, base + dt.timedelta(seconds=30), "the quick brown fox jumps over the lazy cat"),
        (3, base + dt.timedelta(seconds=60), "completely different text with no overlap at all"),
    ]
    df = spark.createDataFrame(rows, "doc_id long, ts timestamp, text string")
    df.repartition(1).write.parquet(str(src))
    stream = spark.readStream.schema(df.schema).parquet(str(src))
    q = (
        pipeline.near_dedup_stream(stream)
        .writeStream.format("memory")
        .queryName("near_dedup_stream_test")
        .option("checkpointLocation", str(chk))
        .outputMode("append")
        .start()
    )
    q.processAllAvailable()
    q.stop()
    kept = {r["doc_id"] for r in spark.sql("select doc_id from near_dedup_stream_test").collect()}
    assert kept == {1, 3}  # near-dup doc 2 suppressed within the window


def test_streaming_near_dedup_short_docs_not_conflated(spark, tmp_path):
    import datetime as dt

    src = tmp_path / "src"
    chk = tmp_path / "chk"
    base = dt.datetime(2026, 1, 1, 12, 0, 0)
    rows = [
        (1, base, "hello world"),                           # < k tokens
        (2, base + dt.timedelta(seconds=30), "goodbye friend"),  # distinct short doc
        (3, base + dt.timedelta(seconds=60), "hello world"),     # exact dup of 1
        (4, base + dt.timedelta(seconds=70), ""),                # empty text
        (5, base + dt.timedelta(seconds=80), None),              # NULL text
    ]
    df = spark.createDataFrame(rows, "doc_id long, ts timestamp, text string")
    df.repartition(1).write.parquet(str(src))
    stream = spark.readStream.schema(df.schema).parquet(str(src))
    q = (
        pipeline.near_dedup_stream(stream)
        .writeStream.format("memory")
        .queryName("near_dedup_short_test")
        .option("checkpointLocation", str(chk))
        .outputMode("append")
        .start()
    )
    q.processAllAvailable()
    q.stop()
    kept = {r["doc_id"] for r in spark.sql("select doc_id from near_dedup_short_test").collect()}
    # distinct short docs both survive (exact-hash fallback key);
    # the exact duplicate is suppressed; NULL text and '' text are
    # different documents and must not suppress each other
    assert kept == {1, 2, 4, 5}


def test_streaming_contamination_scorer(spark, tmp_path):
    """X17 live twin: stream of documents scored per micro-batch
    against a static benchmark gram set — matches the batch operator's
    result on the same rows."""
    import datetime as dt

    from emr_trino_autoscale_spark.operators import dedup

    src, chk, out = (str(tmp_path / d) for d in ("src", "chk", "out"))
    base = dt.datetime(2026, 1, 1, 12, 0, 0)
    bench_docs = spark.createDataFrame(
        [(100, "alpha beta gamma delta epsilon")], "doc_id long, text string"
    )
    bench_grams = dedup.ngram_hashes(bench_docs, k=4).select("gram").distinct().cache()

    rows = [
        (1, base, "alpha beta gamma delta epsilon"),  # exact copy -> 1.0
        (2, base, "alpha beta gamma delta zeta"),     # 1 of 2 grams -> 0.5
        (3, base, "completely clean document text here"),  # 0.0
    ]
    df = spark.createDataFrame(rows, "doc_id long, ts timestamp, text string")
    df.repartition(1).write.parquet(src)
    scorer = pipeline.make_contamination_scorer(bench_grams, k=4)

    def sink(batch, epoch_id):
        scored = scorer(batch, epoch_id)
        scored.write.mode("append").parquet(out)

    q = (
        spark.readStream.schema(df.schema)
        .parquet(src)
        .writeStream.foreachBatch(sink)
        .option("checkpointLocation", chk)
        .start()
    )
    q.processAllAvailable()
    q.stop()
    got = {
        r["id"]: (r["n_grams"], r["n_contaminated"])
        for r in spark.read.parquet(out).collect()
    }
    assert got == {1: (2, 2), 2: (2, 1), 3: (2, 0)}
    # parity with the batch operator on identical rows
    batch = {
        r["id"]: (r["n_grams"], r["n_contaminated"])
        for r in dedup.contamination_fractions(
            df.drop("ts"), bench_docs, k=4
        ).collect()
    }
    assert batch == got
    bench_grams.unpersist()


@pytest.mark.slow
def test_streaming_incremental_dedup_vs_static_corpus(spark, tmp_path):
    import datetime as dt

    src = tmp_path / "inc_src"
    chk = tmp_path / "inc_chk"
    base = dt.datetime(2026, 1, 1, 12, 0, 0)
    rows = [
        (1, base, "already ingested"),                           # in corpus -> dropped
        (2, base + dt.timedelta(seconds=30), "fresh content"),   # kept
        (3, base + dt.timedelta(seconds=60), "fresh content"),   # stream dup -> dropped
        (4, base + dt.timedelta(seconds=90), "also new"),        # kept
    ]
    df = spark.createDataFrame(rows, "doc_id long, ts timestamp, text string")
    df.repartition(1).write.parquet(str(src))
    seen = spark.createDataFrame(
        [("already ingested",)], "text string"
    ).select(F.md5("text").alias("digest"))
    stream = spark.readStream.schema(df.schema).parquet(str(src))
    q = (
        pipeline.incremental_dedup_stream(stream, seen)
        .writeStream.format("memory")
        .queryName("inc_dedup_stream_test")
        .option("checkpointLocation", str(chk))
        .outputMode("append")
        .start()
    )
    q.processAllAvailable()
    q.stop()
    kept = {r["doc_id"] for r in spark.sql("select doc_id from inc_dedup_stream_test").collect()}
    assert kept == {2, 4}


@pytest.mark.slow
def test_streaming_boilerplate_strip_matches_batch_contract(spark, tmp_path):
    import datetime as dt
    import hashlib

    src = tmp_path / "bp_src"
    chk = tmp_path / "bp_chk"
    base = dt.datetime(2026, 1, 1, 12, 0, 0)
    rows = [
        (1, base, "the alpha the beta"),
        (2, base + dt.timedelta(seconds=30), "the the"),
    ]
    df = spark.createDataFrame(rows, "doc_id long, ts timestamp, text string")
    df.repartition(1).write.parquet(str(src))
    stream = spark.readStream.schema(df.schema).parquet(str(src))
    q = (
        pipeline.boilerplate_strip_stream(stream, ["the"])
        .writeStream.format("memory")
        .queryName("bp_strip_stream_test")
        .option("checkpointLocation", str(chk))
        .outputMode("append")
        .start()
    )
    q.processAllAvailable()
    q.stop()
    got = {r["doc_id"]: r for r in spark.sql("select * from bp_strip_stream_test").collect()}
    assert got[1]["clean_text"] == "alpha beta"
    assert (got[1]["n_tokens"], got[1]["n_kept"]) == (4, 2)
    assert got[2]["clean_text"] == "" and got[2]["n_kept"] == 0
    # same cleaned stream the batch tier would hash
    md5 = hashlib.md5(got[1]["clean_text"].encode()).hexdigest()
    assert len(md5) == 32


def test_streaming_pq_encode(spark, tmp_path):
    """X30 under Structured Streaming: pq_encode is a stateless Arrow
    mapInPandas projection, so the SAME plan builder runs on an ingest
    stream unchanged — codes on the stream equal codes computed in
    batch (the encode-on-arrival shape a 100 TB vector pipeline uses so
    the ANN index never re-reads raw embeddings)."""
    from emr_trino_autoscale_spark.operators import similarity

    src = tmp_path / "pq_src"
    chk = tmp_path / "pq_chk"
    rows = [(i, [0.01 * ((i * 7 + j) % 23) + (1.0 if j % 8 == i % 8 else 0.0)
                 for j in range(64)]) for i in range(24)]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    df.repartition(2).write.parquet(str(src))
    cb = similarity.md5_codebooks(m=4, ksub=4, dsub=16)

    batch = {r["id"]: list(r["codes"]) for r in similarity.pq_encode(df, cb).collect()}

    stream = spark.readStream.schema(df.schema).parquet(str(src))
    q = (
        similarity.pq_encode(stream, cb)
        .writeStream.format("memory")
        .queryName("pq_encode_stream_test")
        .option("checkpointLocation", str(chk))
        .outputMode("append")
        .start()
    )
    q.processAllAvailable()
    q.stop()
    got = {
        r["id"]: list(r["codes"])
        for r in spark.sql("select * from pq_encode_stream_test").collect()
    }
    assert got == batch and len(got) == 24


def test_embedding_neardup_stream(spark, tmp_path):
    """X33 — stream-static banded-LSH near-dup (the live twin of q73):
    arriving embeddings banded with the batch geometry, candidate-joined
    against the static corpus signature index, exact-cosine verified,
    multi-band hits deduped. Expected pairs are recomputed independently
    in NumPy (banding + 6-decimal sign test + 4-decimal cosine), so the
    test pins the full semantics, not builder-vs-itself."""
    import numpy as np

    from emr_trino_autoscale_spark.operators import similarity
    from emr_trino_autoscale_spark.streaming.pipeline import embedding_neardup_stream

    planes = similarity.md5_sign_planes(n_planes=16, dim=16)
    n_bands, tau = 8, 0.4

    def vec(seed, j):
        return 0.05 * ((seed * 11 + j * 3) % 17 - 8) + (1.5 if j % 4 == seed % 4 else 0.0)

    corpus_rows = [(100 + i, [vec(i, j) for j in range(16)]) for i in range(20)]
    # first 5 stream vectors = perturbed corpus vectors (near-dups by
    # construction); the rest use unseen seeds
    stream_rows = [
        (s, [v + (0.01 * s if j == s % 16 else 0.0) for j, v in enumerate(corpus_rows[s][1])])
        for s in range(5)
    ] + [(s, [vec(s + 40, j) for j in range(16)]) for s in range(5, 12)]

    P = np.asarray(planes)
    r = len(planes) // n_bands

    def buckets(v):
        signs = np.round(P @ np.asarray(v), 6) > 0
        return tuple(
            int(sum(1 << p for p in range(r) if signs[b * r + p]))
            for b in range(n_bands)
        )

    expected = set()
    for sid, sv in stream_rows:
        bs = buckets(sv)
        for cid, cv in corpus_rows:
            if cid == sid or all(x != y for x, y in zip(bs, buckets(cv))):
                continue
            cos = round(
                float(np.dot(sv, cv) / (np.linalg.norm(sv) * np.linalg.norm(cv))), 4
            )
            if cos >= tau:
                expected.add((sid, cid, f"{cos:.4f}"))
    assert expected, "fixture must produce at least one near-dup pair"

    from datetime import datetime, timezone

    ts = datetime(2026, 1, 1, tzinfo=timezone.utc)
    sdf = spark.createDataFrame(
        [(i, ts, v) for i, v in stream_rows],
        "vec_id long, ts timestamp, embedding array<double>",
    )
    cdf = spark.createDataFrame(corpus_rows, "vec_id long, embedding array<double>")
    index = similarity.near_dup_index(cdf, planes, n_bands)

    src = tmp_path / "nd_src"
    chk = tmp_path / "nd_chk"
    sdf.repartition(2).write.parquet(str(src))
    stream = spark.readStream.schema(sdf.schema).parquet(str(src))
    q = (
        embedding_neardup_stream(stream, index, planes, n_bands, threshold=tau)
        .writeStream.format("memory")
        .queryName("neardup_stream_test")
        .option("checkpointLocation", str(chk))
        .outputMode("append")
        .start()
    )
    q.processAllAvailable()
    q.stop()
    got = {
        (r["vec_id"], r["corpus_id"], str(r["cosine"]))
        for r in spark.sql("select * from neardup_stream_test").collect()
    }
    assert got == expected

    # batch mode of the same builder (the replay tier) must agree
    batch = {
        (r["vec_id"], r["corpus_id"], str(r["cosine"]))
        for r in embedding_neardup_stream(sdf, index, planes, n_bands, threshold=tau).collect()
    }
    assert batch == expected


def test_streaming_quality_gate_and_bm25(spark, tmp_path):
    """X47 — streaming curation gate: the linear quality classifier
    (X39) is a stateless narrow projection and the BM25 scorer (X43)
    factors into batch model extraction + row-local literal apply, so
    BOTH run unchanged on an ingest stream. Stream results must equal
    the batch tier's on identical rows — including bm25_apply vs the
    explode+agg bm25_scores form."""
    from emr_trino_autoscale_spark.operators import text as text_ops

    src = tmp_path / "qg_src"
    chk = tmp_path / "qg_chk"
    rows = [
        (0, "the cat sat on the mat and it was a fine day for all of them", "s0"),
        (1, "000 111 !!!! ???? ;;;; 222 !!!! 333", "s0"),
        (2, "vector hash merge vector the of a", "s1"),
        (3, "plain words without any query terms at all in this one", "s1"),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string, source string")
    df.repartition(2).write.parquet(str(src))

    model = text_ops.bm25_model(df, ("vector", "hash", "merge"))
    batch_q = {
        r["doc_id"]: (r["verdict"], round(r["q_score"], 10))
        for r in text_ops.quality_classifier(df).collect()
    }
    batch_b = {
        r["doc_id"]: round(r["score"], 10)
        for r in text_ops.bm25_scores(df, ("vector", "hash", "merge")).collect()
    }

    stream = spark.readStream.schema(df.schema).parquet(str(src))
    gated = text_ops.bm25_apply(
        text_ops.quality_classifier(stream), model
    )
    q = (
        gated.writeStream.format("memory")
        .queryName("qg_stream_test")
        .option("checkpointLocation", str(chk))
        .outputMode("append")
        .start()
    )
    q.processAllAvailable()
    q.stop()
    got = spark.sql("select * from qg_stream_test").collect()
    assert len(got) == 4
    for r in got:
        assert (r["verdict"], round(r["q_score"], 10)) == batch_q[r["doc_id"]]
        if r["doc_id"] in batch_b:
            assert round(r["score"], 10) == batch_b[r["doc_id"]]
        else:
            assert r["score"] == 0.0 and r["n_matched"] == 0


def test_streaming_cms_sketch_complete_mode(spark, tmp_path):
    """X50 under Structured Streaming: the CMS build is one grouped
    aggregation over row-local bucket emission, so it runs as a
    streaming agg in complete mode — the d*w bounded counter table is
    re-emitted per micro-batch and equals the batch sketch on the same
    rows (the mergeability property makes the incremental maintenance
    exact, not approximate)."""
    from emr_trino_autoscale_spark.operators import text as text_ops

    src = tmp_path / "cms_src"
    chk = tmp_path / "cms_chk"
    rows = [(i, f"tok{i % 5} common word tok{i % 3}") for i in range(40)]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    df.repartition(2).write.parquet(str(src))

    batch = {
        (r["j"], r["bucket"]): r["c"]
        for r in text_ops.cms_sketch(df, d=4, w=64).collect()
    }

    stream = spark.readStream.schema(df.schema).parquet(str(src))
    q = (
        text_ops.cms_sketch(stream, d=4, w=64)
        .writeStream.format("memory")
        .queryName("cms_stream_test")
        .option("checkpointLocation", str(chk))
        .outputMode("complete")
        .start()
    )
    q.processAllAvailable()
    q.stop()
    got = {
        (r["j"], r["bucket"]): r["c"]
        for r in spark.sql("select * from cms_stream_test").collect()
    }
    assert got == batch


@pytest.mark.slow
def test_entity_resolution_stream_matches_blocking_contract(spark, tmp_path):
    """X70: stream-static blocked Levenshtein — suffix-edit match links
    to the master id, an edit inside the blocking prefix stays
    unlinked (block miss -> NULL-master verdict row), a near-miss
    (block hit, dist > max) emits nothing (batch tier recovers it)."""
    from emr_trino_autoscale_spark.streaming import pipeline

    src = tmp_path / "er_src"
    chk = tmp_path / "er_chk"
    rows = [
        (101, "Customer#000000002"),  # dist 1 from master 1 -> match
        (102, "Customer#100000001"),  # prefix edit -> block miss -> new
        (103, "Customer#000000099"),  # block hit, dist 2 -> no row
    ]
    df = spark.createDataFrame(rows, "c_custkey long, c_name string")
    df.repartition(1).write.parquet(str(src))
    master = spark.createDataFrame(
        [(1, "Customer#000000001")], "c_custkey long, c_name string"
    )
    stream = spark.readStream.schema(df.schema).parquet(str(src))
    q = (
        pipeline.entity_resolution_stream(stream, master)
        .writeStream.format("memory")
        .queryName("er_stream_test")
        .option("checkpointLocation", str(chk))
        .outputMode("append")
        .start()
    )
    q.processAllAvailable()
    q.stop()
    got = {r["c_custkey"]: r for r in spark.sql("select * from er_stream_test").collect()}
    assert got[101]["is_match"] and got[101]["master_id"] == 1 and got[101]["dist"] == 1
    assert not got[102]["is_match"] and got[102]["master_id"] is None
    assert 103 not in got
    # batch-equivalence: the matched pairs equal the batch operator's
    # pair set over the unioned frames restricted to (new x master)
    from emr_trino_autoscale_spark.operators import dedup as dd

    both = master.unionByName(df)
    batch_pairs = {
        (r["id_a"], r["id_b"])
        for r in dd.blocked_levenshtein_pairs(both).collect()
    }
    assert (1, 101) in batch_pairs and (1, 102) not in batch_pairs


@pytest.mark.slow
def test_streaming_drift_scorer_matches_batch_psi(spark, tmp_path):
    """X73: per-micro-batch PSI against a static baseline equals the
    batch X72 operator run over (baseline UNION batch) with the batch
    rows as the comparison period."""
    import datetime as dt

    from emr_trino_autoscale_spark.operators import stats as stats_ops
    from emr_trino_autoscale_spark.streaming import pipeline

    src = str(tmp_path / "drift_src")
    out = str(tmp_path / "drift_out")
    chk = str(tmp_path / "drift_chk")
    d1 = dt.datetime(2024, 1, 5)
    d2 = dt.datetime(2024, 1, 25)
    base_rows = [(i, d1, "s", float(i % 100)) for i in range(100)]
    batch_rows = [(i, d2, "s", 400.0 + i % 90) for i in range(80)]
    schema = "event_id long, ts timestamp, event_type string, value double"
    baseline = spark.createDataFrame(base_rows, schema)
    batch_df = spark.createDataFrame(batch_rows, schema)
    batch_df.repartition(1).write.parquet(src)

    scorer = pipeline.make_drift_scorer(baseline)

    def sink(b, epoch_id):
        scorer(b, epoch_id).write.mode("append").parquet(out)

    q = (
        spark.readStream.schema(batch_df.schema)
        .parquet(src)
        .writeStream.foreachBatch(sink)
        .option("checkpointLocation", chk)
        .start()
    )
    q.processAllAvailable()
    q.stop()
    got = {r["event_type"]: r for r in spark.read.parquet(out).collect()}
    want = {
        r["event_type"]: r
        for r in stats_ops.psi_drift(
            baseline.unionByName(batch_df), period_b=F.dayofmonth("ts") > 15
        ).collect()
    }
    assert got["s"]["psi"] == want["s"]["psi"] > 1.0
    assert got["s"]["n_baseline"] == 100 and got["s"]["n_batch"] == 80

def test_blocklist_stream_matches_batch(spark, tmp_path):
    """X83: streaming blocklist twin — arriving docs verdict against
    the batch-computed rarest-anchor model through the identical
    slice-equality verify; distinct-collapsed stream output equals the
    batch operator on the same rows (exact parity), and token-boundary
    semantics hold in the stream ('concat dogma' never matches
    'cat dog')."""
    from emr_trino_autoscale_spark.operators import text as T
    from emr_trino_autoscale_spark.streaming import pipeline

    src = tmp_path / "bl_src"
    chk = tmp_path / "bl_chk"
    rows = [
        (1, "cat dog runs"),
        (2, "concat dogma runs"),
        (3, "big cat dog"),
        (4, "dog cat dog cat dog"),
        (5, "cat nap dog"),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    df.repartition(1).write.parquet(str(src))
    phrases = ["cat dog", "nap"]
    anchors = T.phrase_anchors(df, phrases)
    stream = spark.readStream.schema(df.schema).parquet(str(src))
    q = (
        pipeline.blocklist_stream(stream, anchors)
        .writeStream.format("memory")
        .queryName("bl_stream_test")
        .option("checkpointLocation", str(chk))
        .outputMode("append")
        .start()
    )
    q.processAllAvailable()
    q.stop()
    got = {
        (r["doc_id"], r["phrase"])
        for r in spark.sql("select * from bl_stream_test").collect()
    }
    want = {
        (r["doc_id"], r["phrase"])
        for r in T.blocklist_matches(df, phrases).collect()
    }
    assert got == want
    assert (2, "cat dog") not in got and (1, "cat dog") in got

def test_media_neardup_stream_matches_batch(spark, tmp_path):
    """X87: streaming media-fingerprint near-dup — arriving images
    signature + band + verify against the static signature index
    through the identical geometry; the distinct-collapsed stream
    output equals the batch pair set restricted to (arriving x index),
    and every emitted hamming passes the exact bound."""
    from emr_trino_autoscale_spark.operators import multimodal as mm
    from emr_trino_autoscale_spark.streaming import pipeline

    corpus = mm.synthetic_image_corpus(spark, n=16)
    # index = the even ids; "arriving" = the odd ids (near-dups exist
    # across the split: variant 1 of each group arrives, base indexed)
    index_sigs = mm.image_ahash(corpus.filter(F.col("media_id") % 2 == 0))
    index_pdf = index_sigs.collect()
    index_static = spark.createDataFrame(index_pdf, index_sigs.schema)
    arriving = corpus.filter(F.col("media_id") % 2 == 1)
    src = tmp_path / "media_src"
    chk = tmp_path / "media_chk"
    arriving.repartition(1).write.parquet(str(src))
    stream = spark.readStream.schema(arriving.schema).parquet(str(src))
    q = (
        pipeline.media_neardup_stream(stream, index_static, max_hamming=6)
        .writeStream.format("memory")
        .queryName("media_stream_test")
        .option("checkpointLocation", str(chk))
        .outputMode("append")
        .start()
    )
    q.processAllAvailable()
    q.stop()
    got = {
        (r["media_id"], r["corpus_id"]): r["hamming"]
        for r in spark.sql("select * from media_stream_test").collect()
    }
    # brute-force truth over the split
    arr = {r["media_id"]: r["ahash"] for r in mm.image_ahash(arriving).collect()
           if r["ahash"] is not None}
    idx = {r["media_id"]: r["ahash"] for r in index_pdf if r["ahash"] is not None}
    want = {}
    for a, ha in arr.items():
        for c, hc in idx.items():
            d = bin((ha ^ hc) & ((1 << 64) - 1)).count("1")
            if d <= 6:
                want[(a, c)] = d
    assert got == want and len(want) > 0
    assert all(v <= 6 for v in got.values())


@pytest.mark.slow
def test_debounce_stream_matches_batch(spark, tmp_path):
    """X110: the streaming debounce (keyed last-observation state in
    applyInPandasWithState) must agree with the batch lag form
    (events.debounce_events) on every event — including echoes that
    refresh the clock and state carried ACROSS micro-batches."""
    import datetime as dt

    from emr_trino_autoscale_spark.operators import events as ev
    from emr_trino_autoscale_spark.streaming import pipeline

    t0 = dt.datetime(2024, 1, 1)
    rows = []
    eid = 0
    for u in (1, 2):
        for sec, typ, val in [
            (0, "a", 5.0), (10, "a", 5.0), (15, "a", 5.0),   # echo chain
            (30, "b", 5.0), (40, "a", 5.0),                   # alternation
            (200, "a", 5.0), (205, "a", 6.0), (206, "a", 6.0),
        ]:
            rows.append((eid, u, t0 + dt.timedelta(seconds=sec + u), typ, val))
            eid += 1
    schema = "event_id long, user_id long, ts timestamp, event_type string, value double"
    df = spark.createDataFrame(rows, schema)

    # two micro-batches split mid-chain so state must carry across
    src = str(tmp_path / "db_src")
    out = str(tmp_path / "db_out")
    chk = str(tmp_path / "db_chk")
    df.filter("event_id % 16 < 5").repartition(1).write.parquet(src)
    stream_in = (
        spark.readStream.schema(df.schema)
        .parquet(src)
        .select(
            "event_id", "user_id",
            F.unix_micros("ts").alias("ts_us"),
            "event_type", "value",
        )
    )
    q = (
        pipeline.debounce_stream(stream_in, window_seconds=60.0)
        .writeStream.format("parquet")
        .option("path", out)
        .option("checkpointLocation", chk)
        .start()
    )
    q.processAllAvailable()
    df.filter("event_id % 16 >= 5").repartition(1).write.mode("append").parquet(src)
    q.processAllAvailable()
    q.stop()

    got = {
        r["event_id"]: r["is_echo"] for r in spark.read.parquet(out).collect()
    }
    want = {
        r["event_id"]: r["is_echo"]
        for r in ev.debounce_events(df, window_seconds=60.0).collect()
    }
    assert got == want and len(got) == len(rows)
    assert sum(got.values()) > 0  # echoes actually occurred


def test_attribution_stream_matches_batch(spark, tmp_path):
    """X123: streaming last-touch attribution (keyed (touch, ts) state)
    must agree with the batch union-and-carry window
    (events.attribute_conversions) per conversion — including a touch
    in micro-batch 1 crediting a conversion in micro-batch 2, the
    out-of-window fall-through, and the same-ts touch-first tie."""
    import datetime as dt

    from emr_trino_autoscale_spark.operators import events as ev
    from emr_trino_autoscale_spark.streaming import pipeline

    t0 = dt.datetime(2024, 1, 1)
    rows = []
    eid = 0
    for u in (1, 2):
        for sec, typ in [
            (0, "view"), (10, "click"), (20, "purchase"),      # last-touch
            (30, "purchase"),                                   # same carried touch
            (500, "purchase"),                                  # out of 100s window
            (600, "view"), (600, "purchase"),                   # same-ts tie
        ]:
            rows.append((eid, u, t0 + dt.timedelta(seconds=sec + u), typ, 1.0))
            eid += 1
    schema = "event_id long, user_id long, ts timestamp, event_type string, value double"
    df = spark.createDataFrame(rows, schema)

    src = str(tmp_path / "at_src")
    out = str(tmp_path / "at_out")
    chk = str(tmp_path / "at_chk")
    # split so the (view, click) touches land in batch 1 and the first
    # conversions in batch 2 — state must carry
    df.filter("event_id % 7 < 2").repartition(1).write.parquet(src)
    stream_in = (
        spark.readStream.schema(df.schema)
        .parquet(src)
        .select(
            "event_id", "user_id",
            F.unix_micros("ts").alias("ts_us"),
            "event_type", "value",
        )
    )
    q = (
        pipeline.attribution_stream(
            stream_in, ("view", "click"), "purchase", window_seconds=100.0
        )
        .writeStream.format("parquet")
        .option("path", out)
        .option("checkpointLocation", chk)
        .start()
    )
    q.processAllAvailable()
    df.filter("event_id % 7 >= 2").repartition(1).write.mode("append").parquet(src)
    q.processAllAvailable()
    q.stop()

    got = sorted(
        (r["touch_type"],)
        for r in spark.read.parquet(out).collect()
    )
    want_counts = {
        r["touch_type"]: r["n_conversions"]
        for r in ev.attribute_conversions(
            df, ["view", "click"], "purchase", window_seconds=100
        ).collect()
    }
    got_counts: dict = {}
    for (t,) in got:
        got_counts[t] = got_counts.get(t, 0) + 1
    assert got_counts == want_counts
    # per-conversion attribution, not just counts
    assert got_counts == {"click": 4, "unattributed": 2, "view": 2}


def test_transition_stream_matches_batch(spark, tmp_path):
    """X131: streaming transition extraction (keyed last-type state)
    must emit exactly the batch lag window's (a, b) pairs — including
    the transition that SPANS the micro-batch boundary."""
    import datetime as dt

    from emr_trino_autoscale_spark.operators import events as ev
    from emr_trino_autoscale_spark.streaming import pipeline

    t0 = dt.datetime(2024, 1, 1)
    rows = []
    eid = 0
    for u in (1, 2):
        for i, typ in enumerate(["a", "b", "b", "c", "a"]):
            rows.append((eid, u, t0 + dt.timedelta(seconds=i + u), typ, 1.0))
            eid += 1
    schema = "event_id long, user_id long, ts timestamp, event_type string, value double"
    df = spark.createDataFrame(rows, schema)

    src = str(tmp_path / "tr_src")
    out = str(tmp_path / "tr_out")
    chk = str(tmp_path / "tr_chk")
    df.filter("event_id % 5 < 3").repartition(1).write.parquet(src)
    stream_in = (
        spark.readStream.schema(df.schema)
        .parquet(src)
        .select(
            "event_id", "user_id",
            F.unix_micros("ts").alias("ts_us"),
            "event_type", "value",
        )
    )
    q = (
        pipeline.transition_stream(stream_in)
        .writeStream.format("parquet")
        .option("path", out)
        .option("checkpointLocation", chk)
        .start()
    )
    q.processAllAvailable()
    df.filter("event_id % 5 >= 3").repartition(1).write.mode("append").parquet(src)
    q.processAllAvailable()
    q.stop()

    got: dict = {}
    for r in spark.read.parquet(out).collect():
        got[(r["a"], r["b"])] = got.get((r["a"], r["b"]), 0) + 1
    want = {
        (r["a"], r["b"]): r["n_ab"]
        for r in ev.transition_matrix(df).collect()
    }
    assert got == want and ("c", "a") in got   # boundary-spanning pair


def test_sessionize_stream_matches_batch(spark, tmp_path):
    """X139: streaming sessionization (keyed (last_ts, counter) state)
    must assign exactly the batch lag form's session indices —
    including a session that SPANS the micro-batch boundary (gap <=
    carries the session across) and the <= merge boundary rule."""
    import datetime as dt

    from emr_trino_autoscale_spark.operators import events as ev
    from emr_trino_autoscale_spark.streaming import pipeline

    t0 = dt.datetime(2024, 1, 1)
    rows = []
    eid = 0
    for u in (1, 2):
        for sec in [0, 10, 30, 30 + 1800, 30 + 1800 + 1, 10000]:
            rows.append((eid, u, t0 + dt.timedelta(seconds=sec + u), "e", 1.0))
            eid += 1
    schema = "event_id long, user_id long, ts timestamp, event_type string, value double"
    df = spark.createDataFrame(rows, schema)

    src = str(tmp_path / "ss_src")
    out = str(tmp_path / "ss_out")
    chk = str(tmp_path / "ss_chk")
    df.filter("event_id % 6 < 3").repartition(1).write.parquet(src)
    stream_in = (
        spark.readStream.schema(df.schema)
        .parquet(src)
        .select(
            "event_id", "user_id",
            F.unix_micros("ts").alias("ts_us"),
            "event_type", "value",
        )
    )
    q = (
        pipeline.sessionize_stream(stream_in, gap_seconds=1800.0)
        .writeStream.format("parquet")
        .option("path", out)
        .option("checkpointLocation", chk)
        .start()
    )
    q.processAllAvailable()
    df.filter("event_id % 6 >= 3").repartition(1).write.mode("append").parquet(src)
    q.processAllAvailable()
    q.stop()

    got = {
        r["event_id"]: r["session_idx"]
        for r in spark.read.parquet(out).collect()
    }
    want = {
        r["event_id"]: r["session_idx"]
        for r in ev.sessionize(df, "30 MINUTES").collect()
    }
    assert got == want and len(got) == 12
    # the exactly-gap event (30 -> 30+1800) MERGED (<= boundary rule);
    # the big jump to 10000 split
    assert got[3] == got[2] and got[5] == got[4] + 1


def test_ivm_stream_matches_recompute(spark, tmp_path):
    """X142: the foreachBatch IVM maintainer folded over streaming
    micro-batches must equal the batch full recompute exactly —
    including keys that appear in only one epoch."""
    import datetime as dt

    from emr_trino_autoscale_spark.operators.registry import partial_agg
    from emr_trino_autoscale_spark.streaming.pipeline import make_ivm_maintainer

    t0 = dt.datetime(2024, 1, 1)
    rows = [
        (i, i % 3, t0 + dt.timedelta(seconds=i), "t%d" % (i % 4), float(i) - 5.0)
        for i in range(40)
    ]
    schema = "event_id long, user_id long, ts timestamp, event_type string, value double"
    df = spark.createDataFrame(rows, schema)

    src = str(tmp_path / "ivm_src")
    out = str(tmp_path / "ivm_state")
    chk = str(tmp_path / "ivm_chk")
    df.filter("event_id < 15").repartition(1).write.parquet(src)

    maintain = make_ivm_maintainer(["event_type"], "value")

    def sink(batch, epoch_id):
        import os

        state = spark.read.parquet(out) if os.path.isdir(out) else None
        new_state = maintain(state, batch)
        # collect-then-rewrite: the state frame is group-cardinality
        rows = new_state.collect()
        spark.createDataFrame(rows, new_state.schema).write.mode(
            "overwrite"
        ).parquet(out)

    stream_in = spark.readStream.schema(df.schema).parquet(src)
    q = (
        stream_in.writeStream.foreachBatch(sink)
        .option("checkpointLocation", chk)
        .start()
    )
    q.processAllAvailable()
    df.filter("event_id >= 15").repartition(1).write.mode("append").parquet(src)
    q.processAllAvailable()
    q.stop()

    got = {
        r.event_type: (r.n, r.sum, r.min, r.max)
        for r in spark.read.parquet(out).collect()
    }
    want = {
        r.event_type: (r.n, r.sum, r.min, r.max)
        for r in partial_agg(df, ["event_type"], "value").collect()
    }
    assert set(got) == set(want)
    for k in want:
        assert got[k][0] == want[k][0]
        assert abs(got[k][1] - want[k][1]) < 1e-9
        assert got[k][2] == want[k][2] and got[k][3] == want[k][3]


def test_quantile_sketch_stream_matches_batch(spark, tmp_path):
    """X152: the foreachBatch sketch maintainer folded over two epochs
    must equal the batch bin counts exactly (merge by addition)."""
    import datetime as dt

    from emr_trino_autoscale_spark.streaming.pipeline import (
        make_quantile_sketch_maintainer,
    )

    t0 = dt.datetime(2024, 1, 1)
    rows = [
        (i, 1, t0 + dt.timedelta(seconds=i), "t%d" % (i % 3), float(i % 90))
        for i in range(60)
    ]
    schema = "event_id long, user_id long, ts timestamp, event_type string, value double"
    df = spark.createDataFrame(rows, schema)

    src = str(tmp_path / "qs_src")
    out = str(tmp_path / "qs_state")
    chk = str(tmp_path / "qs_chk")
    df.filter("event_id < 25").repartition(1).write.parquet(src)
    maintain = make_quantile_sketch_maintainer(["event_type"], "value", 25.0)

    def sink(batch, epoch_id):
        import os

        state = spark.read.parquet(out) if os.path.isdir(out) else None
        new_state = maintain(state, batch)
        rows_ = new_state.collect()
        spark.createDataFrame(rows_, new_state.schema).write.mode(
            "overwrite"
        ).parquet(out)

    q = (
        spark.readStream.schema(df.schema).parquet(src)
        .writeStream.foreachBatch(sink)
        .option("checkpointLocation", chk)
        .start()
    )
    q.processAllAvailable()
    df.filter("event_id >= 25").repartition(1).write.mode("append").parquet(src)
    q.processAllAvailable()
    q.stop()

    got = {
        (r["event_type"], r["__b"]): r["__c"]
        for r in spark.read.parquet(out).collect()
    }
    want = {
        (r.event_type, r.b): r.c
        for r in df.selectExpr(
            "event_type", "CAST(FLOOR(value / 25.0) AS LONG) AS b"
        ).groupBy("event_type", "b").count()
        .withColumnRenamed("count", "c").collect()
    }
    assert got == want


def test_bh_fdr_stream_matches_batch(spark, tmp_path):
    """X155 (VERDICT r8 task 7): BH verdicts from the foreachBatch
    maintainer folded over two epochs must equal the batch bh_fdr over
    the union with per-test-latest semantics — including a slice whose
    re-scored epoch-2 p-value flips an UNRELATED slice's rejection (the
    step-up rule's cross-test coupling, the reason verdicts re-run on
    the whole family each epoch instead of per batch)."""
    import os

    from emr_trino_autoscale_spark.operators.stats import bh_fdr
    from emr_trino_autoscale_spark.streaming.pipeline import make_bh_fdr_maintainer

    # epoch 1: s3 sits just above its BH threshold; epoch 2 re-scores
    # s1 much lower, raising k* so s3 flips to rejected without being
    # re-scored itself.
    e1 = [("s1", 0.04, 1), ("s2", 0.009, 1), ("s3", 0.16, 1), ("s4", 0.9, 1),
          ("s5", 0.7, 1), ("s3", 0.02, 1)]  # s3 scored twice in epoch 1
    e2 = [("s1", 0.001, 2), ("s6", 0.03, 2)]
    schema = "test string, p double, epoch int"
    df1 = spark.createDataFrame(e1, schema)
    df2 = spark.createDataFrame(e2, schema)

    src = str(tmp_path / "bh_src")
    out = str(tmp_path / "bh_state")
    chk = str(tmp_path / "bh_chk")
    df1.repartition(1).write.parquet(src)

    maintain, verdicts = make_bh_fdr_maintainer("test", "p", fdr_q=0.25)

    def sink(batch, epoch_id):
        state = spark.read.parquet(out) if os.path.isdir(out) else None
        new_state = maintain(state, batch, epoch_id)
        rows_ = new_state.collect()
        spark.createDataFrame(rows_, new_state.schema).write.mode(
            "overwrite"
        ).parquet(out)

    q = (
        spark.readStream.schema(df1.schema).parquet(src)
        .writeStream.foreachBatch(sink)
        .option("checkpointLocation", chk)
        .start()
    )
    q.processAllAvailable()
    df2.repartition(1).write.mode("append").parquet(src)
    q.processAllAvailable()
    q.stop()

    got = {
        r.test: (r.p, r.rank, r.rejected)
        for r in verdicts(spark.read.parquet(out)).collect()
    }

    # batch reference: per-test latest epoch wins; intra-epoch max p
    union = df1.unionByName(df2)
    latest = (
        union.groupBy("test", "epoch").agg(F.max("p").alias("p"))
        .withColumn(
            "__rn",
            F.row_number().over(
                Window.partitionBy("test").orderBy(F.col("epoch").desc())
            ),
        )
        .filter("__rn = 1")
        .select("test", "p")
    )
    want = {
        r.test: (r.p, r.rank, r.rejected)
        for r in bh_fdr(latest, "test", "p", fdr_q=0.25).collect()
    }
    assert got == want and len(got) == 6
    # the cross-test coupling actually exercised: s3 keeps its
    # conservative epoch-1 p (max(0.02, 0.16) = 0.16, NOT rejected
    # at the epoch-1 family size m=5, threshold 3/5*q = 0.15) yet must end
    # rejected — only because s1's epoch-2 re-score raises k*
    assert got["s3"] == (0.16, 4, True), "step-up coupling not exercised"


def test_weighted_reservoir_stream_matches_batch(spark, tmp_path):
    """X156: the streaming A-ES reservoir folded over two epochs equals
    the batch weighted_sample over the union EXACTLY (deterministic md5
    coin -> identical keys and tiebreaks), per stratum, including a
    stratum that appears only in epoch 2."""
    import os

    from emr_trino_autoscale_spark.operators.stats import weighted_sample
    from emr_trino_autoscale_spark.streaming.pipeline import (
        make_weighted_reservoir_maintainer,
    )

    rows1 = [(i, "s%d" % (i % 2), float(1 + i % 7)) for i in range(40)]
    rows2 = [(i, "s2" if i % 5 == 0 else "s%d" % (i % 2), float(1 + i % 5))
             for i in range(40, 80)]
    schema = "doc_id long, src string, w double"
    df1 = spark.createDataFrame(rows1, schema)
    df2 = spark.createDataFrame(rows2, schema)

    src = str(tmp_path / "wr_src")
    out = str(tmp_path / "wr_state")
    chk = str(tmp_path / "wr_chk")
    df1.repartition(1).write.parquet(src)

    maintain, sample = make_weighted_reservoir_maintainer(
        "w", k=5, strata_cols=("src",), id_col="doc_id"
    )

    def sink(batch, epoch_id):
        state = spark.read.parquet(out) if os.path.isdir(out) else None
        new_state = maintain(state, batch)
        rows_ = new_state.collect()
        spark.createDataFrame(rows_, new_state.schema).write.mode(
            "overwrite"
        ).parquet(out)

    q = (
        spark.readStream.schema(df1.schema).parquet(src)
        .writeStream.foreachBatch(sink)
        .option("checkpointLocation", chk)
        .start()
    )
    q.processAllAvailable()
    df2.repartition(1).write.mode("append").parquet(src)
    q.processAllAvailable()
    q.stop()

    got = {
        (r.src, r.doc_id): (r.w, r.rank)
        for r in sample(spark.read.parquet(out)).collect()
    }
    want = {
        (r.src, r.doc_id): (r.w, r.rank)
        for r in weighted_sample(
            df1.unionByName(df2), "w", k=5, strata_cols=("src",),
            id_col="doc_id",
        ).collect()
    }
    assert got == want and len(got) == 15  # 3 strata x k=5
    # bounded-state contract: never more than k rows per stratum stored
    state_rows = spark.read.parquet(out).groupBy("src").count().collect()
    assert all(r["count"] <= 5 for r in state_rows)


def test_weighted_reservoir_redelivered_id_single_slot(spark):
    """ADVICE r9: an id re-delivered in a later epoch (at-least-once
    replay, possibly re-weighted) must occupy at most ONE of the k
    reservoir slots — the maintainer dedups state by (strata, id)
    keeping the latest row before re-taking the top-k."""
    from emr_trino_autoscale_spark.streaming.pipeline import (
        make_weighted_reservoir_maintainer,
    )

    schema = "doc_id long, src string, w double"
    epoch1 = spark.createDataFrame(
        [(i, "s0", float(1 + i % 7)) for i in range(20)], schema
    )
    # epoch 2 re-delivers ids 0-9 with NEW weights plus 5 fresh ids
    epoch2 = spark.createDataFrame(
        [(i, "s0", float(50 + i)) for i in range(10)]
        + [(i, "s0", 1.0) for i in range(20, 25)],
        schema,
    )
    maintain, sample = make_weighted_reservoir_maintainer(
        "w", k=8, strata_cols=("src",), id_col="doc_id"
    )
    state = maintain(None, epoch1)
    state = maintain(state, epoch2)
    out = sample(state).collect()
    ids = [r.doc_id for r in out]
    assert len(ids) == len(set(ids)) == 8
    # the re-delivered ids carry their LATEST weight (epoch-2 value)
    for r in out:
        if r.doc_id < 10:
            assert r.w == 50.0 + r.doc_id

    # DOWN-weighting (round-10 review): a re-scored id whose new weight
    # would miss the batch's own top-k must still replace the state row
    # — the dedup has to happen before any top-k, not after
    epoch3 = spark.createDataFrame(
        [(i, "s0", 0.001) for i in range(10)]  # crush the old winners
        + [(i, "s0", 10.0) for i in range(30, 40)],
        schema,
    )
    state = maintain(state, epoch3)
    out3 = {r.doc_id: r.w for r in sample(state).collect()}
    for i in range(10):
        # either evicted by the fresh high-weight items or present with
        # the NEW weight — never the stale epoch-2 weight
        assert out3.get(i, 0.001) == 0.001

    # intra-batch duplicate on the FIRST epoch: one id delivered twice
    # must occupy at most one slot
    m2, s2 = make_weighted_reservoir_maintainer(
        "w", k=4, strata_cols=("src",), id_col="doc_id"
    )
    first = spark.createDataFrame(
        [(1, "s0", 5.0), (1, "s0", 5.0), (2, "s0", 4.0), (3, "s0", 3.0)],
        schema,
    )
    got = [r.doc_id for r in s2(m2(None, first)).collect()]
    assert sorted(got) == [1, 2, 3]


def test_rule_audit_stream_matches_batch(spark, tmp_path):
    """X157: additive row-local rule counters folded over two epochs
    equal the batch conditional sums over the union exactly."""
    import os

    from emr_trino_autoscale_spark.streaming.pipeline import (
        make_rule_audit_maintainer,
    )

    schema = "event_id long, value double"
    df1 = spark.createDataFrame([(i, float(i)) for i in range(30)], schema)
    df2 = spark.createDataFrame(
        [(i, float(-i)) for i in range(30, 50)], schema
    )
    rules = {
        "value_nonnegative": F.col("value") < 0,
        "value_under_40": F.col("value") > 40,
    }

    src = str(tmp_path / "ra_src")
    out = str(tmp_path / "ra_state")
    chk = str(tmp_path / "ra_chk")
    df1.repartition(1).write.parquet(src)
    maintain = make_rule_audit_maintainer(rules)

    def sink(batch, epoch_id):
        state = spark.read.parquet(out) if os.path.isdir(out) else None
        new_state = maintain(state, batch)
        rows_ = new_state.collect()
        spark.createDataFrame(rows_, new_state.schema).write.mode(
            "overwrite"
        ).parquet(out)

    q = (
        spark.readStream.schema(df1.schema).parquet(src)
        .writeStream.foreachBatch(sink)
        .option("checkpointLocation", chk)
        .start()
    )
    q.processAllAvailable()
    df2.repartition(1).write.mode("append").parquet(src)
    q.processAllAvailable()
    q.stop()

    got = {
        r.rule: (r.n_checked, r.n_violations)
        for r in spark.read.parquet(out).collect()
    }
    # union: 50 rows; negatives: values -31..-49 -> 20 violations
    # (rows 30-49 all negative... row 30 -> -30 < 0 yes); >40: none
    # (positives stop at 29, negatives never exceed 40)
    assert got == {
        "value_nonnegative": (50, 20),
        "value_under_40": (50, 0),
    }


def test_hll_distinct_stream_matches_batch(spark, tmp_path):
    """X158: per-key HLL sketches folded over two epochs estimate
    exactly what the batch sketch over the union estimates — register
    merge is MAX, so batching cannot change the final sketch — and
    overlapping values across epochs are not double-counted."""
    import os

    from emr_trino_autoscale_spark.streaming.pipeline import (
        make_hll_distinct_maintainer,
    )

    schema = "event_id long, src string, v long"
    # epoch 2 re-sends half of epoch 1's values (the dedup property)
    df1 = spark.createDataFrame(
        [(i, "s%d" % (i % 2), i % 40) for i in range(60)], schema
    )
    df2 = spark.createDataFrame(
        [(i, "s%d" % (i % 2), (i % 50) + 20) for i in range(60, 120)], schema
    )

    src = str(tmp_path / "hll_src")
    out = str(tmp_path / "hll_state")
    chk = str(tmp_path / "hll_chk")
    df1.repartition(1).write.parquet(src)
    maintain, estimates = make_hll_distinct_maintainer("src", "v")

    def sink(batch, epoch_id):
        state = spark.read.parquet(out) if os.path.isdir(out) else None
        new_state = maintain(state, batch)
        rows_ = new_state.collect()
        spark.createDataFrame(rows_, new_state.schema).write.mode(
            "overwrite"
        ).parquet(out)

    q = (
        spark.readStream.schema(df1.schema).parquet(src)
        .writeStream.foreachBatch(sink)
        .option("checkpointLocation", chk)
        .start()
    )
    q.processAllAvailable()
    df2.repartition(1).write.mode("append").parquet(src)
    q.processAllAvailable()
    q.stop()

    got = {
        r.key: r.estimate
        for r in estimates(spark.read.parquet(out)).collect()
    }
    union = df1.unionByName(df2)
    want = {
        r.key: r.estimate
        for r in union.groupBy(F.col("src").alias("key"))
        .agg(F.hll_sketch_estimate(F.hll_sketch_agg("v", F.lit(12))).cast("bigint").alias("estimate"))
        .collect()
    }
    assert got == want and set(got) == {"s0", "s1"}
    # sanity vs exact: HLL at lgK=12 on <=70 distincts is exact-ish
    exact = {
        r.src: r.n
        for r in union.groupBy("src").agg(
            F.countDistinct("v").alias("n")
        ).collect()
    }
    assert all(abs(got[k] - exact[k]) <= 2 for k in exact)


def test_profile_stream_matches_batch(spark, tmp_path):
    """X159: the streaming column profile folded over two epochs equals
    the batch profile_columns on the union — exact for
    n_rows/n_null/min/max (additive / MIN / MAX merges), HLL-exact for
    n_distinct at these cardinalities — including a column with NULLs
    in only one epoch."""
    import os

    from emr_trino_autoscale_spark.operators.stats import profile_columns
    from emr_trino_autoscale_spark.streaming.pipeline import (
        make_profile_maintainer,
    )

    schema = "event_id long, src string, v double"
    df1 = spark.createDataFrame(
        [(i, "s%d" % (i % 3), float(i % 25)) for i in range(40)], schema
    )
    df2 = spark.createDataFrame(
        [(i, None if i % 4 == 0 else "s%d" % (i % 5), float(i % 30))
         for i in range(40, 80)],
        schema,
    )
    cols = ["src", "v"]

    src = str(tmp_path / "pf_src")
    out = str(tmp_path / "pf_state")
    chk = str(tmp_path / "pf_chk")
    df1.repartition(1).write.parquet(src)
    maintain, profile = make_profile_maintainer(cols)

    def sink(batch, epoch_id):
        state = spark.read.parquet(out) if os.path.isdir(out) else None
        new_state = maintain(state, batch)
        rows_ = new_state.collect()
        spark.createDataFrame(rows_, new_state.schema).write.mode(
            "overwrite"
        ).parquet(out)

    q = (
        spark.readStream.schema(df1.schema).parquet(src)
        .writeStream.foreachBatch(sink)
        .option("checkpointLocation", chk)
        .start()
    )
    q.processAllAvailable()
    df2.repartition(1).write.mode("append").parquet(src)
    q.processAllAvailable()
    q.stop()

    got = {
        r.column: (r.n_rows, r.n_null, r.n_distinct, r.min_val, r.max_val)
        for r in profile(spark.read.parquet(out)).collect()
    }
    want = {
        r.column: (r.n_rows, r.n_null, r.n_distinct, r.min_val, r.max_val)
        for r in profile_columns(
            df1.unionByName(df2), tuple(cols)
        ).collect()
    }
    assert set(got) == set(want) == {"src", "v"}
    for c in cols:
        gr, gn, gd, gmn, gmx = got[c]
        wr, wn, wd, wmn, wmx = want[c]
        assert (gr, gn, gmn, gmx) == (wr, wn, wmn, wmx)
        # HLL at lgK=12 on <=55 distinct strings: allow tiny error
        assert abs(gd - wd) <= 2, (c, gd, wd)


def test_ingest_stream_matches_batch(spark, tmp_path):
    """X161: the streaming JSONL ingest landed over two shard arrivals
    equals the batch ingest of both shards — clean rows (incl.
    canonicalized n_chars + digest) AND quarantine counts."""
    import json

    from emr_trino_autoscale_spark import io as eio
    from emr_trino_autoscale_spark.streaming.pipeline import (
        ingest_documents_stream,
    )

    src = tmp_path / "shards"
    src.mkdir()
    rows = [
        {"doc_id": i, "text": f"text body {i}", "lang": "en",
         "source": "web", "n_chars": -9}
        for i in range(12)
    ]
    with open(src / "a.jsonl", "w") as f:
        for r in rows[:6]:
            f.write(json.dumps(r) + "\n")
        f.write("corrupt-line-one\n")

    dest = str(tmp_path / "stream_landing")
    q = ingest_documents_stream(
        spark, str(src / "*.jsonl"), dest, str(tmp_path / "chk")
    )
    q.processAllAvailable()
    with open(src / "b.jsonl", "w") as f:
        for r in rows[6:]:
            f.write(json.dumps(r) + "\n")
        f.write("{broken\n")
    q.processAllAvailable()
    q.stop()

    batch_dest = str(tmp_path / "batch_landing")
    stats = eio.ingest_documents(spark, str(src / "*.jsonl"), batch_dest)

    got = {
        r.doc_id: (r.text, r.lang, r.source, r.n_chars, r.digest)
        for r in spark.read.parquet(dest).collect()
    }
    want = {
        r.doc_id: (r.text, r.lang, r.source, r.n_chars, r.digest)
        for r in spark.read.parquet(batch_dest).collect()
    }
    assert got == want and len(got) == 12
    n_quar = (
        spark.read.parquet(dest + "_quarantine")
        .select("_corrupt_record")
        .count()
    )
    assert n_quar == stats["n_corrupt"] == 2


def test_domain_curation_stream_matches_batch(spark, tmp_path):
    """X165: per-domain URL curation folded over two streamed epochs
    equals the batch domain_curation_stats on the union — exact for
    n_urls/n_malformed (additive merges), HLL-exact for canonical NDV
    at these cardinalities — with URL variants of the same page split
    ACROSS epochs (the case a batched recount gets right only because
    register-MAX merge equals the sketch of the union) and a malformed
    class landing in the NULL-domain quarantine group."""
    import os

    from emr_trino_autoscale_spark.operators.text import domain_curation_stats
    from emr_trino_autoscale_spark.streaming.pipeline import (
        make_domain_curation_maintainer,
    )

    # epoch 1 sees one casing of each page, epoch 2 the other casing
    # plus new pages and the malformed rows
    e1 = [("https://big.com/p%d?b=2&a=1" % (i % 7),) for i in range(30)]
    e2 = (
        [("HTTPS://BIG.com:443/p%d?a=1&b=2#x" % (i % 7),) for i in range(20)]
        + [("http://small.org/q%d" % i,) for i in range(5)]
        + [("junk %d" % i,) for i in range(3)]
    )
    df1 = spark.createDataFrame(e1, "url string")
    df2 = spark.createDataFrame(e2, "url string")

    src = str(tmp_path / "dc_src")
    out = str(tmp_path / "dc_state")
    chk = str(tmp_path / "dc_chk")
    df1.repartition(1).write.parquet(src)
    maintain, stats = make_domain_curation_maintainer("url")

    def sink(batch, epoch_id):
        state = spark.read.parquet(out) if os.path.isdir(out) else None
        new_state = maintain(state, batch)
        rows_ = new_state.collect()
        spark.createDataFrame(rows_, new_state.schema).write.mode(
            "overwrite"
        ).parquet(out)

    q = (
        spark.readStream.schema(df1.schema).parquet(src)
        .writeStream.foreachBatch(sink)
        .option("checkpointLocation", chk)
        .start()
    )
    q.processAllAvailable()
    df2.repartition(1).write.mode("append").parquet(src)
    q.processAllAvailable()
    q.stop()

    got = {
        r.domain: (r.n_urls, r.n_malformed, r.n_canonical_est)
        for r in stats(spark.read.parquet(out)).collect()
    }
    want = {
        r.domain: (r.n_urls, r.n_malformed, r.n_canonical)
        for r in domain_curation_stats(
            df1.unionByName(df2), "url"
        ).collect()
    }
    assert set(got) == set(want) == {"big.com", "small.org", None}
    for d in want:
        assert got[d][:2] == want[d][:2], d          # exact adds
        assert abs(got[d][2] - want[d][2]) <= 1, d   # HLL at tiny NDV
    # the cross-epoch variant pairs actually collapsed: 7 pages, not 14
    assert want["big.com"][2] == 7 and got["big.com"][2] == 7
    assert got[None] == (3, 3, 0)


def test_encoding_qa_stream_matches_batch(spark, tmp_path):
    """X169: encoding-QA counters folded over two streamed epochs
    equal the batch encoding_qa_stats on the union exactly (every
    merge is addition), with a poisoned source whose mojibake rows are
    split ACROSS epochs and a clean source that must stay at zero."""
    import os

    from emr_trino_autoscale_spark.operators.text import encoding_qa_stats
    from emr_trino_autoscale_spark.streaming.pipeline import (
        make_encoding_qa_maintainer,
    )

    bad = "кот и пёс".encode("utf-8").decode("latin-1")
    e1 = [("crawl", bad)] * 4 + [("crawl", "clean line")] * 2 + [
        ("books", "père Noël à côté de l'hôtel"),
        ("books", "bell\x07 and null\x00"),
    ]
    e2 = [("crawl", bad)] * 3 + [("crawl", "more clean")] * 5 + [
        ("books", "lost � bytes"),
    ]
    df1 = spark.createDataFrame(e1, "source string, text string")
    df2 = spark.createDataFrame(e2, "source string, text string")

    src = str(tmp_path / "eq_src")
    out = str(tmp_path / "eq_state")
    chk = str(tmp_path / "eq_chk")
    df1.repartition(1).write.parquet(src)
    maintain, stats = make_encoding_qa_maintainer()

    def sink(batch, epoch_id):
        state = spark.read.parquet(out) if os.path.isdir(out) else None
        new_state = maintain(state, batch)
        rows_ = new_state.collect()
        spark.createDataFrame(rows_, new_state.schema).write.mode(
            "overwrite"
        ).parquet(out)

    q = (
        spark.readStream.schema(df1.schema).parquet(src)
        .writeStream.foreachBatch(sink)
        .option("checkpointLocation", chk)
        .start()
    )
    q.processAllAvailable()
    df2.repartition(1).write.mode("append").parquet(src)
    q.processAllAvailable()
    q.stop()

    streamed = {
        r["source"]: r
        for r in stats(spark.read.parquet(out)).collect()
    }
    batch = {
        r["source"]: r
        for r in encoding_qa_stats(df1.unionByName(df2)).collect()
    }
    assert set(streamed) == set(batch) == {"crawl", "books"}
    for src_key in ("crawl", "books"):
        for c in ("n_docs", "n_mojibake_docs", "n_control_docs",
                  "n_control_chars", "n_replacement_chars"):
            assert streamed[src_key][c] == batch[src_key][c], (src_key, c)
        for c in ("mojibake_rate", "control_rate"):
            assert abs(streamed[src_key][c] - batch[src_key][c]) < 1e-12
    assert streamed["crawl"]["n_mojibake_docs"] == 7
    assert streamed["books"]["n_mojibake_docs"] == 0
    assert streamed["books"]["n_replacement_chars"] == 1


def test_decontamination_stream_matches_batch(spark, tmp_path):
    """X171: the streaming decontamination gate over two epochs emits
    match events whose per-id maxima equal the batch X170 report on
    the union — the plan is stateless, so epoch boundaries cannot
    change any decision; clean vectors emit nothing."""
    import os

    import numpy as np

    from emr_trino_autoscale_spark.operators.similarity import (
        embedding_decontaminate,
    )
    from emr_trino_autoscale_spark.streaming.pipeline import (
        decontamination_stream,
    )

    rng = np.random.RandomState(23)
    dim = 12
    bench = rng.randn(4, dim)
    bench /= np.linalg.norm(bench, axis=1, keepdims=True)
    bdf = spark.createDataFrame(
        [(j, [float(x) for x in bench[j]]) for j in range(4)],
        "vec_id long, embedding array<double>",
    )

    def mk(i, v):
        return (i, [float(x) for x in v / np.linalg.norm(v)])

    e1 = [mk(i, rng.randn(dim)) for i in range(10)] + [
        mk(100, bench[0] + 0.03 * rng.randn(dim)),
        mk(101, bench[1]),
    ]
    e2 = [mk(i, rng.randn(dim)) for i in range(10, 20)] + [
        mk(102, bench[2] + 0.03 * rng.randn(dim)),
    ]
    df1 = spark.createDataFrame(e1, "vec_id long, embedding array<double>")
    df2 = spark.createDataFrame(e2, "vec_id long, embedding array<double>")

    src = str(tmp_path / "dc2_src")
    out = str(tmp_path / "dc2_out")
    chk = str(tmp_path / "dc2_chk")
    df1.repartition(1).write.parquet(src)
    stream = spark.readStream.schema(df1.schema).parquet(src)
    q = (
        decontamination_stream(stream, bdf, threshold=0.9)
        .writeStream.format("parquet")
        .option("path", out)
        .option("checkpointLocation", chk)
        .start()
    )
    q.processAllAvailable()
    df2.repartition(1).write.mode("append").parquet(src)
    q.processAllAvailable()
    q.stop()

    streamed = spark.read.parquet(out).collect()
    got = {}
    for r in streamed:
        k = r["id"]
        if k not in got or r["cosine"] > got[k]:
            got[k] = r["cosine"]
    batch = {
        r["id"]: r["cosine"]
        for r in embedding_decontaminate(
            df1.unionByName(df2), bdf, threshold=0.9
        ).collect()
    }
    assert set(got) == set(batch) == {100, 101, 102}
    for k in got:
        assert got[k] == batch[k], k


def test_template_farm_stream_matches_batch(spark, tmp_path):
    """X174: template-farm counters folded over two streamed epochs
    equal the batch template_farm_stats on the union — exact for
    n_docs/representative (ADD/MIN merges), HLL-exact for distinct
    fillings at these cardinalities — with one farm split ACROSS the
    epochs and re-crawled duplicate pages appearing in both (the case
    register-MAX merge must not double-count)."""
    import os

    from emr_trino_autoscale_spark.operators.text import template_farm_stats
    from emr_trino_autoscale_spark.streaming.pipeline import (
        make_template_farm_maintainer,
    )

    page = "<li>Item {}: widget-{} costs ${}.99</li>"
    e1 = [(i, page.format(i, i * 7, i)) for i in range(1, 5)] + [
        (50, "one-off page layout")
    ]
    # epoch 2: more of the same farm, plus EXACT re-crawls of two
    # epoch-1 pages (same text, new ids) and a second farm
    e2 = (
        [(i, page.format(i, i * 7, i)) for i in range(5, 8)]
        + [(61, page.format(1, 7, 1)), (62, page.format(2, 14, 2))]
        + [(i, f"<h1>Profile {i}</h1><p>bio {i * 3}</p>") for i in (70, 71, 72)]
    )
    df1 = spark.createDataFrame(e1, "doc_id long, text string")
    df2 = spark.createDataFrame(e2, "doc_id long, text string")

    src = str(tmp_path / "tf_src")
    out = str(tmp_path / "tf_state")
    chk = str(tmp_path / "tf_chk")
    df1.repartition(1).write.parquet(src)
    maintain, stats = make_template_farm_maintainer()

    def sink(batch, epoch_id):
        state = spark.read.parquet(out) if os.path.isdir(out) else None
        new_state = maintain(state, batch)
        rows_ = new_state.collect()
        spark.createDataFrame(rows_, new_state.schema).write.mode(
            "overwrite"
        ).parquet(out)

    q = (
        spark.readStream.schema(df1.schema).parquet(src)
        .writeStream.foreachBatch(sink)
        .option("checkpointLocation", chk)
        .start()
    )
    q.processAllAvailable()
    df2.repartition(1).write.mode("append").parquet(src)
    q.processAllAvailable()
    q.stop()

    streamed = {
        r["template"]: r
        for r in stats(spark.read.parquet(out), min_docs=3).collect()
    }
    batch = {
        r["template"]: r
        for r in template_farm_stats(df1.unionByName(df2), min_docs=3).collect()
    }
    assert set(streamed) == set(batch) and len(batch) == 2
    for k in batch:
        assert streamed[k]["n_docs"] == batch[k]["n_docs"]
        assert (streamed[k]["representative_id"]
                == batch[k]["representative_id"])
        # HLL exact at these cardinalities; the re-crawled duplicates
        # split across epochs must NOT double-count
        assert (streamed[k]["n_distinct_texts_est"]
                == batch[k]["n_distinct_texts"])
    big = max(batch.values(), key=lambda r: r["n_docs"])
    assert big["n_docs"] == 9 and big["n_distinct_texts"] == 7


def test_code_quality_stream_matches_batch(spark, tmp_path):
    """X181: code-quality counters folded over two streamed epochs
    equal the batch X176 rollup on the union exactly (every merge is
    addition), with a generated-code burst split ACROSS epochs and a
    clean-source keep rate that must stay 1.0."""
    import os

    from pyspark.sql import functions as F

    from emr_trino_autoscale_spark.operators.text import code_quality_signals
    from emr_trino_autoscale_spark.streaming.pipeline import (
        make_code_quality_maintainer,
    )

    autogen = "// AUTO-GENERATED. DO NOT EDIT\nint x = 1;"
    minified = "var a=1;" + "y" * 1500
    good = "def f():\n    return 1"
    e1 = [("dump", autogen)] * 2 + [("dump", good)] + [("clean", good)] * 3
    e2 = [("dump", autogen)] + [("dump", minified)] * 2 + [("clean", good)]
    df1 = spark.createDataFrame(e1, "source string, text string")
    df2 = spark.createDataFrame(e2, "source string, text string")

    src = str(tmp_path / "cq_src")
    out = str(tmp_path / "cq_state")
    chk = str(tmp_path / "cq_chk")
    df1.repartition(1).write.parquet(src)
    maintain, stats = make_code_quality_maintainer()

    def sink(batch, epoch_id):
        state = spark.read.parquet(out) if os.path.isdir(out) else None
        new_state = maintain(state, batch)
        rows_ = new_state.collect()
        spark.createDataFrame(rows_, new_state.schema).write.mode(
            "overwrite"
        ).parquet(out)

    q = (
        spark.readStream.schema(df1.schema).parquet(src)
        .writeStream.foreachBatch(sink)
        .option("checkpointLocation", chk)
        .start()
    )
    q.processAllAvailable()
    df2.repartition(1).write.mode("append").parquet(src)
    q.processAllAvailable()
    q.stop()

    streamed = {r["source"]: r for r in stats(spark.read.parquet(out)).collect()}
    both = df1.unionByName(df2)
    batch = {
        r["source"]: r
        for r in code_quality_signals(both).groupBy("source").agg(
            F.count("*").cast("bigint").alias("n_docs"),
            F.sum(F.col("code_keep").cast("bigint")).cast("bigint").alias("n_keep"),
            F.sum(F.col("has_autogen_marker").cast("bigint")).cast("bigint").alias("n_autogen"),
            F.sum(F.col("has_base64_blob").cast("bigint")).cast("bigint").alias("n_blob"),
            F.sum("n_lines").cast("bigint").alias("total_lines"),
        ).collect()
    }
    assert set(streamed) == set(batch) == {"dump", "clean"}
    for k in ("dump", "clean"):
        for c in ("n_docs", "n_keep", "n_autogen", "n_blob", "total_lines"):
            assert streamed[k][c] == batch[k][c], (k, c)
    assert streamed["clean"]["keep_rate"] == 1.0
    assert streamed["dump"]["n_autogen"] == 3
    assert streamed["dump"]["n_keep"] == 1  # only the one good file
    assert abs(streamed["dump"]["autogen_rate"] - 0.5) < 1e-12
