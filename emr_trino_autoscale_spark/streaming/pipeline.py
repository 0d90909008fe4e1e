"""Live-loop assembly (SURVEY.md §3): the reference's three Akka timers
as Structured Streaming queries sharing the batch operators.

Entry point 1 (15 s collect tick)  -> snapshot source -> parse -> node_cpu
Entry point 2 (15 s evaluate tick) -> windowed aggregates -> decision
                                      cascade (keyed state) -> action sink
Entry point 3 (30 s refresh tick)  -> task-state stream -> suspension state

The builders take any DataFrame (static or streaming) where possible;
``attach_*`` helpers wire triggers/state for live mode. Tests drive
them with file sources + ``processAllAvailable()`` (synchronous), so
the identical plan is exercised without wall-clock waits.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..operators.scaling import StepPolicy, IG_POLICY
from .stateful import (
    COOLDOWN_STATE_SCHEMA,
    DECISION_SCHEMA,
    SUSPEND_STATE_SCHEMA,
    TASK_STATE_SCHEMA,
    make_cooldown_processor,
    suspension_processor,
)

COLLECT_TRIGGER = "15 seconds"  # TrinoAutoscaler.scala:24-27
EVALUATE_TRIGGER = "15 seconds"  # TrinoAutoscaler.scala:29-32
REFRESH_TRIGGER = "30 seconds"  # cluster/Workers.scala:43
WATERMARK = "1 minute"  # engine addition (SURVEY §2.5 W8): reference
# polls wall-clock so late data cannot exist; a distributed collector
# can deliver late — rows later than this are dropped (documented deviation).


def sliding_node_avg(node_cpu: DataFrame, window: str = "1 minute", slide: str = "15 seconds") -> DataFrame:
    """Streaming twin of the 1-minute store average (W2/A2): event-time
    sliding window instead of the last-4-rows buffer."""
    return (
        node_cpu.withWatermark("ts", WATERMARK)
        .groupBy(F.window("ts", window, slide).alias("win"), "node")
        .agg(F.avg("process_cpu_load").alias("avg_value"), F.count("*").alias("n_points"))
        .select(F.col("win.end").alias("tick"), "node", "avg_value", "n_points")
    )


def decisions_stream(
    eval_ticks: DataFrame, policy: StepPolicy = IG_POLICY
) -> DataFrame:
    """D3 with real keyed state: one decision row per evaluation tick,
    cooldown clock carried in applyInPandasWithState."""
    return eval_ticks.groupBy("cluster_id").applyInPandasWithState(
        make_cooldown_processor(policy),
        outputStructType=DECISION_SCHEMA,
        stateStructType=COOLDOWN_STATE_SCHEMA,
        outputMode="append",
        timeoutConf="NoTimeout",
    )


def task_state_stream(refresh_ticks: DataFrame) -> DataFrame:
    """D6 with keyed suspension state per task group."""
    return refresh_ticks.groupBy("task_id").applyInPandasWithState(
        suspension_processor,
        outputStructType=TASK_STATE_SCHEMA,
        stateStructType=SUSPEND_STATE_SCHEMA,
        outputMode="append",
        timeoutConf="NoTimeout",
    )


def session_windows(events: DataFrame, gap: str = "12 hours") -> DataFrame:
    """Streaming-native sessionization twin of operators.events.sessionize
    (X5). Boundary rule differs at exact-gap equality (session_window
    merges on strict <, the lag form on <=) — the oracle contract is the
    lag form; this one exists for live mode."""
    return (
        events.withWatermark("ts", WATERMARK)
        .groupBy("user_id", F.session_window("ts", gap).alias("win"))
        .agg(
            F.count("*").cast("bigint").alias("n_events"),
            F.sum("value").alias("sum_value"),
        )
        .select(
            "user_id",
            F.col("win.start").alias("session_start"),
            F.col("win.end").alias("session_end"),
            "n_events",
            "sum_value",
        )
    )


def dedup_stream(
    docs: DataFrame,
    text_col: str = "text",
    ts_col: str = "ts",
    watermark: str = "10 minutes",
) -> DataFrame:
    """Streaming exact dedup for a document-ingest pipeline (X1 live
    twin): content-hash the text, then ``dropDuplicatesWithinWatermark``
    so state stays bounded by the watermark horizon instead of growing
    with the corpus (the batch form — Q21 — dedups globally; a 100 TB
    ingest stream cannot hold global hash state, so duplicates are
    suppressed within the late-data window and the periodic batch
    compaction removes the rest)."""
    hashed = docs.withColumn("__text_hash", F.md5(F.col(text_col)))
    return hashed.withWatermark(ts_col, watermark).dropDuplicatesWithinWatermark(
        ["__text_hash"]
    )


def near_dedup_stream(
    docs: DataFrame,
    text_col: str = "text",
    ts_col: str = "ts",
    watermark: str = "10 minutes",
    k: int = 3,
) -> DataFrame:
    """Streaming NEAR-dup suppression (X2 live twin of Q22): compute the
    deterministic minhash signature per arriving document and keep the
    first document per signature within the watermark horizon.

    Same bounded-state contract as :func:`dedup_stream` — near-dup state
    cannot grow with the corpus on an unbounded ingest, so suppression
    is scoped to the late-data window and the batch closure (Q22/Q49)
    catches cross-window duplicates during periodic compaction. The
    signature is a pure column expression (md5 shingle min), so this
    chains onto any streaming source with no Python in the hot path.
    Documents shorter than k tokens have no shingle signature; their
    dedup key falls back to the exact-content hash so two DIFFERENT
    short documents never collide (a NULL key would make
    dropDuplicatesWithinWatermark treat all of them as one duplicate
    and silently drop data) — short docs are deduped exactly, matching
    the batch tier where they skip near-dup clustering but remain.
    NULL text gets its own sentinel key (not md5('')) so a NULL-text
    document and an empty-string document never suppress each other;
    the sentinel contains a NUL byte, which no md5 hex digest can."""
    from ..operators.dedup import shingles_of

    sig = (
        docs.withColumn("__toks", F.split(F.col(text_col), " "))
        .withColumn(
            "__sig",
            F.coalesce(
                F.array_min(F.transform(shingles_of(F.col("__toks"), k), F.md5)),
                # NULL text -> whole concat is NULL -> falls through to
                # the NULL-only sentinel below (distinct from md5(''))
                F.concat(F.lit("short:"), F.md5(F.col(text_col))),
                F.lit("short:\x00null"),
            ),
        )
        .drop("__toks")
    )
    return sig.withWatermark(ts_col, watermark).dropDuplicatesWithinWatermark(
        ["__sig"]
    )


def incremental_dedup_stream(
    docs: DataFrame,
    seen_digests: DataFrame,
    text_col: str = "text",
    ts_col: str = "ts",
    watermark: str = "10 minutes",
) -> DataFrame:
    """X19 live twin of Q61 (`dedup.incremental_dedup_report`): an
    arriving document is dropped when its content digest already exists
    in the ingested-corpus digest table, then intra-stream repeats are
    suppressed first-wins within the watermark horizon.

    ``seen_digests`` is a STATIC frame with a ``digest`` column — the
    periodically compacted historical digest set (the batch Q61 tier
    writes it; Spark re-plans stream-static joins every micro-batch, so
    a freshly compacted table is picked up without restarting the
    query). The join is stream-static LEFT ANTI on the 32-char md5 key:
    per-batch state is zero (the static side is not streaming state),
    and the in-stream dedup state stays watermark-bounded exactly as in
    :func:`dedup_stream`. This split — bounded live suppression plus
    unbounded-history suppression via a compacted static table — is the
    100 TB answer to "never re-admit content ever seen" without holding
    corpus-sized streaming state."""
    hashed = docs.withColumn(
        "__text_hash",
        # same NUL-byte sentinel as the batch report: NULL text must
        # match the corpus's NULL-text digest, not silently pass the
        # anti-join on a NULL key
        F.coalesce(F.md5(F.col(text_col)), F.lit("null:\x00")),
    )
    fresh = hashed.join(
        seen_digests.select(F.col("digest").alias("__text_hash")),
        "__text_hash",
        "left_anti",
    )
    return fresh.withWatermark(ts_col, watermark).dropDuplicatesWithinWatermark(
        ["__text_hash"]
    )


def boilerplate_strip_stream(
    docs: DataFrame,
    boiler_tokens: list[str],
    text_col: str = "text",
) -> DataFrame:
    """X20 live twin of Q62 (`text.boilerplate_strip`): the batch tier
    computes the boilerplate token set from corpus document frequency
    and compacts it periodically; the stream applies it to arriving
    documents as an order-preserving filter.

    The set rides in the plan as an array literal — legitimate model
    state: the df-threshold pigeonhole bounds it at
    avg_doc_len / max_df_frac tokens regardless of corpus size, the
    same argument that lets the batch side broadcast it. Stateless per
    row (no watermark, no keyed state): emits the original column plus
    ``clean_text``, ``n_tokens``, ``n_kept``. The per-element
    array_contains lambda is interpreted, but runs against a
    ~hundreds-element literal on per-micro-batch volume — not the
    batch tier's corpus-sized hot path (which uses the explode +
    broadcast-join form instead)."""
    boiler = F.array(*[F.lit(t) for t in boiler_tokens])
    toks = F.split(F.col(text_col), " ")
    return (
        docs.withColumn("__toks", toks)
        .withColumn(
            "__kept", F.filter(F.col("__toks"), lambda t: ~F.array_contains(boiler, t))
        )
        .withColumn("clean_text", F.concat_ws(" ", F.col("__kept")))
        .withColumn("n_tokens", F.size("__toks").cast("bigint"))
        .withColumn("n_kept", F.size("__kept").cast("bigint"))
        .drop("__toks", "__kept")
    )


def blocklist_stream(
    docs: DataFrame,
    anchors: list[tuple],
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """X83 live twin of Q116 (`text.blocklist_matches`): arriving
    documents are checked against the phrase blocklist through the
    SAME anchored-verify contract — posexplode tokens, join the
    broadcast anchor table, row-local array-slice equality at the
    anchored offset. Emits (doc_id, phrase) per hit (distinct within
    the row's own matches via the batch-side dedup being per-document
    and the verify emitting one row per matching anchor position —
    the stream keeps repeated positions, the batch tier's distinct is
    a per-doc collapse the caller applies downstream if needed).

    ``anchors`` is the batch tier's `text.phrase_anchors(corpus,
    phrases)` output — the rarest-anchor model computed ONCE from
    corpus document frequency and recompacted periodically; the
    stream embeds it as a broadcast literal table (|phrases| rows,
    model-sized) and never scans the corpus. Stateless per row: no
    watermark, no keyed state; per-batch work is batch_rows x
    anchor-df verify evaluations, the batch operator's own bound.
    Parity with the batch form is pytest-pinned
    (test_blocklist_stream_matches_batch)."""
    from ..operators.text import _blocklist_verdicts

    spark = docs.sparkSession
    adf = spark.createDataFrame(
        anchors,
        "phrase string, __anchor string, __off int, __len int, __ptoks array<string>",
    )
    toks_frame = docs.select(
        F.col(id_col).alias("__id"),
        F.split(F.col(text_col), " ").alias("__toks"),
    )
    return (
        _blocklist_verdicts(toks_frame, adf)
        .select(F.col("__id").alias(id_col), "phrase")
    )


def entity_resolution_stream(
    records: DataFrame,
    master: DataFrame,
    id_col: str = "c_custkey",
    name_col: str = "c_name",
    block_prefix_len: int = 16,
    max_dist: int = 1,
) -> DataFrame:
    """X70 live twin of Q105 (`dedup.blocked_levenshtein_pairs`): an
    arriving record is matched against the STATIC master entity table
    through the same blocking contract — equi-join on the
    ``block_prefix_len`` name-prefix key, exact JVM Levenshtein
    verify <= ``max_dist``. Emits one VERDICT row per (arriving record,
    surviving master candidate): ``is_match`` true with the master id
    and distance, or a single ``master_id IS NULL`` row when the
    record's block has no master rows at all.

    Stream-static LEFT OUTER equi-join only — zero streaming state, no
    stream-side aggregation (collapsing to one link-or-create decision
    per record is a per-record agg, which append-mode streaming can't
    do statelessly; that collapse belongs to the batch reconciliation
    tier, which also recovers the near-miss case: a record whose block
    exists but holds no within-distance master emits no is_match row
    here). The master side is re-planned every micro-batch, so the
    Q105 tier's periodic recompaction is picked up without restart —
    the X19/X33 stream-static pattern. Per-batch work is batch_rows x
    block_size Levenshtein evaluations; the blocking key bounds it
    exactly as in the batch operator."""
    r = records.withColumn(
        "__blk", F.substring(F.col(name_col), 1, block_prefix_len)
    )
    m = master.select(
        F.col(id_col).alias("master_id"),
        F.col(name_col).alias("__mnm"),
        F.substring(F.col(name_col), 1, block_prefix_len).alias("__blk"),
    )
    joined = r.join(m, "__blk", "left_outer").withColumn(
        "dist", F.levenshtein(F.col(name_col), F.col("__mnm")).cast("int")
    )
    return (
        joined.filter(
            F.col("master_id").isNull() | (F.col("dist") <= max_dist)
        )
        .withColumn("is_match", F.col("master_id").isNotNull())
        .withColumn(
            "dist", F.when(F.col("is_match"), F.col("dist")).cast("int")
        )
        .select(id_col, name_col, "master_id", "dist", "is_match")
    )


def embedding_neardup_stream(
    vecs: DataFrame,
    corpus_index: DataFrame,
    planes: list[list[float]],
    n_bands: int,
    threshold: float = 0.4,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    ts_col: str = "ts",
    watermark: str = "10 minutes",
) -> DataFrame:
    """X33 live twin of Q73 (`similarity.near_dup_pairs_lsh`): an
    arriving embedding is banded with the SAME SRP geometry as the
    batch pair op, candidate-joined stream-static against the compacted
    corpus signature index (`similarity.near_dup_index` — the batch
    tier writes it; re-planned every micro-batch, so recompaction needs
    no query restart), then exact-cosine verified at the shared
    4-decimal rounding. Emits one (id, ts, corpus_id, cosine) row per
    verified near-dup — the admit/reject signal an ingest pipeline
    keys on before a crawl batch ever lands in the corpus.

    State shape: band buckets and the verify are stateless per-row
    projections; the stream-static join holds NO streaming state (the
    index is not stream state, exactly as in
    :func:`incremental_dedup_stream`); the only keyed state is the
    multi-band pair dedup, watermark-bounded on (id, corpus_id) —
    match-rate x horizon rows, never corpus-sized. The fold forms are
    used on the stream side (micro-batch volumes; the corpus-sized
    Arrow paths belong to the batch tier, which also owns the index
    build — pass ``vectorized=True`` there)."""
    from ..operators.similarity import (
        cosine,
        l2_norm,
        as_double,
        srp_bucket_literal,
    )

    if n_bands <= 0 or len(planes) % n_bands:
        raise ValueError(f"n_bands={n_bands} must evenly split {len(planes)} planes")
    r = len(planes) // n_bands
    bands = [planes[b * r : (b + 1) * r] for b in range(n_bands)]
    sig = vecs.select(
        F.col(id_col),
        F.col(ts_col),
        F.col(vec_col),
        F.posexplode(
            F.array(*[srp_bucket_literal(F.col(vec_col), bp) for bp in bands])
        ).alias("band", "bucket"),
    )
    sv = as_double(F.col(vec_col))
    cv = as_double(F.col("corpus_vec"))
    scored = (
        sig.join(corpus_index, ["band", "bucket"])
        .filter(F.col("corpus_id") != F.col(id_col))
        .withColumn(
            "cosine",
            F.round(cosine(sv, cv, l2_norm(sv), l2_norm(cv)), 4).cast(
                "decimal(38,4)"
            ),
        )
        .filter(F.col("cosine") >= threshold)
        .select(id_col, ts_col, "corpus_id", "cosine")
    )
    if scored.isStreaming:
        return scored.withWatermark(ts_col, watermark).dropDuplicatesWithinWatermark(
            [id_col, "corpus_id"]
        )
    return scored.dropDuplicates([id_col, "corpus_id"])


def media_neardup_stream(
    media: DataFrame,
    sig_index: DataFrame,
    max_hamming: int = 6,
    n_bands: int | None = None,
    sig_col: str = "ahash",
    id_col: str = "media_id",
    signature_fn=None,
) -> DataFrame:
    """X87 live twin of q103/q122/q123 (`multimodal.ahash_near_dup_pairs`
    with any 64-bit signature): an arriving media payload is signatured
    with the SAME Arrow mapInPandas projection as the batch tier
    (``signature_fn`` — defaults to `multimodal.image_ahash`; pass
    `image_phash` / `audio_fingerprint` with the matching ``sig_col``),
    banded with the SAME `signature_bands` geometry, candidate-joined
    stream-static against the compacted signature INDEX, and verified
    with the exact popcount — every emitted (arriving_id, corpus_id,
    hamming) row passes ``bit_count(xor) <= max_hamming``.

    Stream-static inner equi-join on (band, key) only — zero streaming
    state; the index side is re-planned per micro-batch so periodic
    recompaction is picked up without restart (the X33/X70 pattern). A
    pair agreeing in multiple bands emits once per agreeing band;
    collapsing to distinct pairs is a stream-side agg append mode
    cannot do statelessly — the batch reconciliation tier owns the
    dedup, exactly as it owns X70's link-or-create collapse. Exhaustive
    recall in the ``max_hamming < n_bands`` regime, per the batch
    operator's pigeonhole contract."""
    from ..operators import multimodal as _mm

    if signature_fn is None:
        signature_fn = _mm.image_ahash
    if n_bands is None:
        n_bands = next(nb for nb in (1, 2, 4, 8, 16, 32, 64) if nb > max_hamming)
    arriving = signature_fn(media)
    a = _mm.signature_bands(arriving, n_bands, sig_col=sig_col, id_col=id_col)
    b = _mm.signature_bands(sig_index, n_bands, sig_col=sig_col, id_col=id_col)
    joined = a.join(
        b.select(
            F.col("id").alias("corpus_id"),
            F.col("__sig").alias("__csig"),
            "band",
            "key",
        ),
        ["band", "key"],
    ).filter(F.col("id") != F.col("corpus_id"))
    return (
        joined.withColumn(
            "hamming",
            F.bit_count(F.col("__sig").bitwiseXOR(F.col("__csig"))).cast("int"),
        )
        .filter(F.col("hamming") <= max_hamming)
        .select(F.col("id").alias(id_col), "corpus_id", "hamming")
    )


def make_drift_scorer(
    baseline: DataFrame,
    group_col: str = "event_type",
    value_col: str = "value",
    bucket_width: float = 50.0,
    n_buckets: int = 10,
    epsilon: float = 0.5,
):
    """Streaming drift monitor (X73, the live twin of X72/Q110): a
    ``foreachBatch`` transform scoring each micro-batch's value
    distribution against a STATIC baseline via the population stability
    index — the ingest alarm that fires the moment a source's values
    shift, instead of at the next batch audit.

    ``baseline`` is the raw baseline-period frame; its bucketed
    histogram is computed once here (cache the result upstream for hot
    reuse — model-sized: |groups| x n_buckets rows). Per batch, the
    comparison histogram aggregates WITHIN the micro-batch (batch-local
    grouping, the make_contamination_scorer contract — no unbounded
    stateful stream aggregation), joins the broadcast baseline, and
    folds the smoothed PSI exactly as :func:`..operators.stats.psi_drift`
    (same epsilon floor for buckets empty on one side; groups absent
    from the baseline are excluded, the X72 contract). Returned
    callable: (batch, epoch_id) -> (group, psi, n_baseline, n_batch)
    DataFrame; wire into ``foreachBatch`` with the caller's sink."""
    b_bkt = F.least(
        F.floor(F.col(value_col).cast("double") / F.lit(bucket_width)),
        F.lit(n_buckets - 1),
    ).cast("int")
    base_hist = (
        baseline.select(F.col(group_col).alias("g"), b_bkt.alias("__bkt"))
        .groupBy("g", "__bkt")
        .agg(F.count("*").cast("double").alias("__n_a"))
    )
    base_tot = base_hist.groupBy("g").agg(F.sum("__n_a").alias("__na"))
    eps = F.lit(float(epsilon))
    nb = F.lit(float(n_buckets))

    def score(batch: DataFrame, epoch_id: int) -> DataFrame:
        cur = (
            batch.select(F.col(group_col).alias("g"), b_bkt.alias("__bkt"))
            .groupBy("g", "__bkt")
            .agg(F.count("*").cast("double").alias("__n_b"))
        )
        cur_tot = cur.groupBy("g").agg(F.sum("__n_b").alias("__nb"))
        j = (
            base_hist.join(cur, ["g", "__bkt"], "full_outer")
            .join(F.broadcast(base_tot), "g")
            .join(F.broadcast(cur_tot), "g")
            .withColumn(
                "__pa",
                (F.coalesce(F.col("__n_a"), F.lit(0.0)) + eps)
                / (F.col("__na") + eps * nb),
            )
            .withColumn(
                "__pb",
                (F.coalesce(F.col("__n_b"), F.lit(0.0)) + eps)
                / (F.col("__nb") + eps * nb),
            )
        )
        return (
            j.groupBy("g")
            .agg(
                F.round(
                    F.sum(
                        (F.col("__pb") - F.col("__pa"))
                        * F.log(F.col("__pb") / F.col("__pa"))
                    ),
                    4,
                ).alias("psi"),
                F.max("__na").cast("bigint").alias("n_baseline"),
                F.max("__nb").cast("bigint").alias("n_batch"),
            )
            .select(F.col("g").alias(group_col), "psi", "n_baseline", "n_batch")
        )

    return score


def make_ks_drift_scorer(
    baseline: DataFrame,
    group_col: str = "event_type",
    value_col: str = "value",
    bucket_width: float = 16.0,
):
    """Streaming KS drift monitor (X99, the live twin of X93/Q131 —
    the binning-free complement of :func:`make_drift_scorer`'s PSI):
    per micro-batch, the exact two-sample Kolmogorov-Smirnov D between
    each group's arriving values and a STATIC baseline period. PSI
    goes blind inside a bucket; the KS twin catches a shift that
    stays within one PSI bucket (e.g. a value distribution compressing
    toward a bucket edge) the moment it arrives.

    ``baseline`` contracts ONCE here to its per-(group, distinct
    value) count frame (cache upstream for hot reuse — bounded by
    group alphabet x value domain, not the baseline row count). Per
    batch, the arriving values contract batch-locally to the same
    shape (the make_contamination_scorer bounded-state contract — no
    unbounded stateful stream agg), full-outer join on (group, value)
    rebuilds the pooled per-value frame, and the SAME fused
    bucket-decomposed cumsum core as the batch operator
    (:func:`..operators.stats.ks_from_per_value`, partitioned by
    group) emits one (group, n_a, n_b, d_stat, d_at_value) row per
    group; n_a is the baseline count, n_b the batch count. Groups
    absent from the baseline are excluded (the X72/X73 contract).
    Returned callable: (batch, epoch_id) -> DataFrame; wire into
    ``foreachBatch`` with the caller's sink.
    """
    from ..operators.stats import ks_from_per_value

    base_pv = (
        baseline.select(
            F.col(group_col).alias("__grp"),
            F.col(value_col).cast("double").alias("__v"),
        )
        .groupBy("__grp", "__v")
        .agg(F.count("*").cast("bigint").alias("__ca"))
    )

    def score(batch: DataFrame, epoch_id: int) -> DataFrame:
        cur_pv = (
            batch.select(
                F.col(group_col).alias("__grp"),
                F.col(value_col).cast("double").alias("__v"),
            )
            .groupBy("__grp", "__v")
            .agg(F.count("*").cast("bigint").alias("__cb"))
        )
        pooled = (
            base_pv.join(cur_pv, ["__grp", "__v"], "full_outer")
            .join(base_pv.select("__grp").distinct(), "__grp", "left_semi")
            .withColumn(
                "__ca", F.coalesce("__ca", F.lit(0).cast("bigint"))
            )
            .withColumn(
                "__cb", F.coalesce("__cb", F.lit(0).cast("bigint"))
            )
        )
        return ks_from_per_value(
            pooled, ["__grp"], bucket_width
        ).withColumnRenamed("__grp", group_col)

    return score


def make_contamination_scorer(
    benchmark_grams: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    k: int = 4,
):
    """Streaming decontamination (X17 live twin of Q59): a
    ``foreachBatch`` transform that scores each micro-batch of arriving
    documents against a STATIC benchmark gram set.

    ``benchmark_grams`` is the precomputed distinct gram-digest frame
    (``dedup.ngram_hashes(bench).select("gram").distinct()``) — built
    once, joined per batch as a plain batch side (cache it for hot
    reuse); no streaming state grows with the corpus. The per-document
    aggregation runs WITHIN the micro-batch — documents arrive whole,
    so batch-local grouping is exact and avoids an unbounded stateful
    ``groupBy(doc_id)`` stream aggregation (same bounded-state contract
    as :func:`dedup_stream`). Returned callable: (batch, epoch_id) ->
    scored DataFrame; wire it into ``foreachBatch`` with whatever sink
    the caller owns (see tests/test_stateful.py).
    """
    from ..operators.dedup import ngram_hashes

    bench = benchmark_grams.withColumn("__hit", F.lit(1))

    def score(batch: DataFrame, epoch_id: int) -> DataFrame:
        return (
            ngram_hashes(batch, text_col, id_col, k)
            .join(bench, "gram", "left")
            .groupBy("id")
            .agg(
                F.count("*").cast("bigint").alias("n_grams"),
                F.sum(F.coalesce(F.col("__hit"), F.lit(0)))
                .cast("bigint")
                .alias("n_contaminated"),
            )
            .withColumn("contamination", F.col("n_contaminated") / F.col("n_grams"))
        )

    return score


def attach_decision_query(decisions: DataFrame, sink_fn, checkpoint: str, trigger: str = EVALUATE_TRIGGER):
    """Wire the decision stream to an idempotent foreachBatch sink with
    the reference's evaluation cadence."""
    return (
        decisions.writeStream.foreachBatch(sink_fn)
        .option("checkpointLocation", checkpoint)
        .trigger(processingTime=trigger)
        .outputMode("append")
    )


def debounce_stream(events, window_seconds: float = 60.0):
    """X110 — streaming telemetry debounce, the live twin of
    events.debounce_events (X109/q146): per-user keyed state is ONE
    (last type, last value, last ts) triple in
    ``applyInPandasWithState`` — constant per key, no history growth —
    and the verdict semantics are the batch lag form's exactly (an
    echo refreshes the clock, because lag compares each row to its
    immediate predecessor). Input needs integer-microsecond ``ts_us``
    (the X107/X109 determinism convention); output = input +
    ``is_echo``, append-mode safe. Exact batch parity is pinned by
    tests/test_stateful.py::test_debounce_stream_matches_batch.
    """
    from .stateful import (
        DEBOUNCE_OUTPUT_SCHEMA,
        make_debounce_processor,
    )

    return events.groupBy("user_id").applyInPandasWithState(
        make_debounce_processor(window_seconds),
        outputStructType=DEBOUNCE_OUTPUT_SCHEMA,
        stateStructType="last_type string, last_value double, last_ts_us long",
        outputMode="append",
        timeoutConf="NoTimeout",
    )


def attribution_stream(
    events,
    touch_types=("view", "click"),
    conversion_type: str = "purchase",
    window_seconds: float = 3 * 86400.0,
):
    """X123 — streaming last-touch attribution, the live twin of
    events.attribute_conversions (X119/q155): per-user keyed state is
    ONE (last touch type, ts) pair in ``applyInPandasWithState`` —
    constant per key — and a conversion credits the carried touch
    exactly like the batch union-and-carry window (touch-first tie
    order, integer-microsecond window test). Input needs ``ts_us``;
    output = one (event_id, user_id, ts_us, touch_type) row per
    conversion, append-mode safe. Exact batch parity is pinned by
    tests/test_stateful.py::test_attribution_stream_matches_batch.
    """
    from .stateful import (
        ATTRIBUTION_OUTPUT_SCHEMA,
        make_attribution_processor,
    )

    return events.groupBy("user_id").applyInPandasWithState(
        make_attribution_processor(
            tuple(touch_types), conversion_type, window_seconds
        ),
        outputStructType=ATTRIBUTION_OUTPUT_SCHEMA,
        stateStructType="last_touch string, last_touch_ts_us long",
        outputMode="append",
        timeoutConf="NoTimeout",
    )


def transition_stream(events):
    """X131 — streaming Markov transition extraction, the live twin of
    events.transition_matrix (X128/q163) BEFORE its aggregation:
    per-user keyed state is the last event type (one string) in
    ``applyInPandasWithState``; each event with a predecessor emits an
    append-safe (a, b) transition row — downstream counts compose as
    complete-mode aggregation or windowed rates. Input needs
    ``ts_us``; exact cross-micro-batch parity with the batch lag
    window is pinned by
    tests/test_stateful.py::test_transition_stream_matches_batch.
    """
    from .stateful import (
        TRANSITION_OUTPUT_SCHEMA,
        make_transition_processor,
    )

    return events.groupBy("user_id").applyInPandasWithState(
        make_transition_processor(),
        outputStructType=TRANSITION_OUTPUT_SCHEMA,
        stateStructType="last_type string",
        outputMode="append",
        timeoutConf="NoTimeout",
    )


def sessionize_stream(events, gap_seconds: float = 1800.0):
    """X139 — streaming sessionization, the keyed-state twin of the
    BATCH lag form (events.sessionize, X5/q25): per-user state is ONE
    (last ts, session counter) pair in ``applyInPandasWithState``,
    boundary rule merges on <= exactly like the batch window (the
    native ``F.session_window`` is strict-< and already used by the
    session-window path — this twin exists precisely so the streaming
    surface can match the batch/oracle semantics). Input needs
    ``ts_us``; output = input rows + ``session_idx``, append-safe.
    Exact cross-micro-batch parity pinned by
    tests/test_stateful.py::test_sessionize_stream_matches_batch.
    """
    from .stateful import (
        SESSIONIZE_OUTPUT_SCHEMA,
        make_sessionize_processor,
    )

    return events.groupBy("user_id").applyInPandasWithState(
        make_sessionize_processor(gap_seconds),
        outputStructType=SESSIONIZE_OUTPUT_SCHEMA,
        stateStructType="last_ts_us long, session_idx long",
        outputMode="append",
        timeoutConf="NoTimeout",
    )


def make_ivm_maintainer(key_cols: list[str], value_col: str):
    """X142 — streaming incremental-aggregate maintenance, the live
    twin of registry.partial_agg/merge_agg_state (X138/q173): a
    ``foreachBatch`` maintainer that folds each micro-batch's partial
    (n, sum, min, max) into the caller-owned state store — the
    materialized-datacube ingest loop. State never re-reads history;
    each epoch costs one batch partial agg + one group-keyed merge
    (the X138 contract). Returned callable:
    (state_df_or_None, batch) -> new state DataFrame; the caller owns
    reading/writing the state sink inside its foreachBatch (see
    tests/test_stateful.py::test_ivm_stream_matches_recompute).
    """
    from ..operators.registry import merge_agg_state, partial_agg

    def maintain(state, batch):
        part = partial_agg(batch, key_cols, value_col)
        if state is None:
            return part
        return merge_agg_state(state, part, key_cols)

    return maintain


def make_quantile_sketch_maintainer(
    part_cols: list[str], value_col: str, bin_width: float = 25.0
):
    """X152 — streaming mergeable-quantile-sketch maintenance, the
    ingest twin of stats.binned_quantile_sketch (X121/q157): bin
    counts merge by ADDITION, so each micro-batch contributes one
    hash agg and one full-outer merge against the caller-owned state
    — the same loop shape as the X142 IVM maintainer, applied to the
    sketch the quantile queries read. Returned callable:
    (state_df_or_None, batch) -> new (part_cols..., __b, __c) state.
    Parity with the batch sketch is pinned by
    tests/test_stateful.py::test_quantile_sketch_stream_matches_batch.
    """

    def maintain(state, batch):
        part = (
            batch.select(
                *[F.col(c) for c in part_cols],
                F.floor(F.col(value_col) / F.lit(bin_width))
                .cast("long")
                .alias("__b"),
            )
            .groupBy(*part_cols, "__b")
            .agg(F.count("*").alias("__c"))
        )
        if state is None:
            return part
        s = state.withColumnRenamed("__c", "__cs")
        p = part.withColumnRenamed("__c", "__cp")
        keys = [*part_cols, "__b"]
        return (
            s.join(p, keys, "full_outer")
            .select(
                *[F.col(c) for c in keys],
                (
                    F.coalesce("__cs", F.lit(0)) + F.coalesce("__cp", F.lit(0))
                ).cast("bigint").alias("__c"),
            )
        )

    return maintain


def make_bh_fdr_maintainer(
    test_col: str = "test",
    p_col: str = "p",
    epoch_col: str = "__epoch",
    fdr_q: float = 0.1,
):
    """X155 — streaming multiple-testing control, the live twin of
    stats.bh_fdr (X140/q174) and the closure VERDICT r8 task 7 asked
    for: X73 (PSI) / X99 (KS) score per-slice drift every micro-batch,
    but rejecting each slice at a fixed alpha inflates the family-wise
    false-discovery rate as slices multiply — BH must re-run over the
    WHOLE accumulated test family each epoch, not per batch.

    Loop shape is the X142 maintainer contract: the state frame holds
    one (test, p, epoch) row per test — test-family-cardinality, i.e.
    bounded by the number of monitored slices, not by row volume — and
    each epoch folds the batch in via registry.union_latest (latest
    p-value per re-scored slice wins; ``epoch_col`` is stamped here so
    replays agree). Verdicts are NOT incremental by design: the BH
    step-up threshold k*/m depends on every rank, so a new p-value can
    flip ANY slice's rejection — ``verdicts(state)`` re-runs the exact
    batch ``bh_fdr`` on the bounded state frame (model-sized work per
    epoch, the same contract as the X142 re-read).

    Returned pair: (maintain, verdicts) where
    ``maintain(state_df_or_None, batch, epoch_id) -> new state`` and
    ``verdicts(state) -> (test, p, rank, rejected)``. Parity is pinned
    by tests/test_stateful.py::test_bh_fdr_stream_matches_batch:
    stream-accumulated verdicts == batch bh_fdr over the union with
    per-test-latest semantics.
    """
    from ..operators.registry import union_latest
    from ..operators.stats import bh_fdr

    def maintain(state, batch, epoch_id: int = 0):
        part = batch.select(
            F.col(test_col).alias("test"),
            F.col(p_col).cast("double").alias("p"),
            F.lit(int(epoch_id)).cast("long").alias(epoch_col),
        )
        # intra-batch key-uniqueness for union_latest: keep the worst
        # (max) p per test within one epoch so a slice scored twice in
        # a batch is judged on its most conservative evidence
        part = part.groupBy("test").agg(
            F.max("p").alias("p"), F.max(epoch_col).alias(epoch_col)
        )
        if state is None:
            return part
        return union_latest(state, part, "test", order_col=epoch_col)

    def verdicts(state):
        return bh_fdr(state, "test", "p", fdr_q=fdr_q)

    return maintain, verdicts


def make_weighted_reservoir_maintainer(
    weight_col: str,
    k: int = 10,
    strata_cols: tuple[str, ...] = (),
    id_col: str = "doc_id",
):
    """X156 (pytest-only until the round-11 declaration window opens) —
    streaming weighted sampling without replacement, the live twin of
    stats.weighted_sample (X67/q106): the Efraimidis-Spirakis key
    ln(u)/w is computed per row from the DETERMINISTIC md5 coin, so a
    top-k-by-key reservoir folded over micro-batches equals the batch
    sample over the union EXACTLY (same keys, same id tiebreak) — the
    A-ES property that makes weighted reservoirs mergeable at all.

    Loop shape: state holds at most k rows per stratum
    (*strata, id, weight, __key); each epoch computes the batch's keys
    (one narrow row-local projection), unions the bounded state, and
    re-takes the per-stratum top-k — work is |batch| + k*|strata| per
    epoch, state is k*|strata| rows by construction. The per-stratum
    window inherits the batch operator's documented caveat: with few
    strata and a huge micro-batch it is a single-task sort per stratum
    — the X16 bucket decomposition is the primitive to swap in there
    (same note as stats.weighted_sample). Returned pair
    (maintain, sample): ``maintain(state_df_or_None, batch) -> state``;
    ``sample(state) -> (*strata, id, weight, rank)`` — the same output
    contract as the batch operator. Parity pinned by
    tests/test_stateful.py::test_weighted_reservoir_stream_matches_batch.
    """
    from ..functions import md5_long60

    def _keyed(df):
        w = F.col(weight_col).cast("double")
        coin = (
            (md5_long60(F.col(id_col).cast("string")).cast("double") + F.lit(1.0))
            / F.lit(float((1 << 60) + 1))
        )
        return (
            df.filter(w > 0)
            .withColumn("__key", F.log(coin) / w)
            .select(*strata_cols, id_col, F.col(weight_col), "__key")
        )

    def _topk(df):
        from pyspark.sql import Window

        win = Window.partitionBy(*[F.col(c) for c in strata_cols]).orderBy(
            F.col("__key").desc(), F.col(id_col).asc()
        )
        return (
            df.withColumn("__rn", F.row_number().over(win))
            .filter(F.col("__rn") <= k)
            .drop("__rn")
        )

    def maintain(state, batch):
        # At-least-once delivery / epoch re-scoring can re-present an id
        # already held in the reservoir (possibly with a new weight).
        # Without dedup both copies compete for the k slots, displacing
        # distinct items (ADVICE r9); and the dedup must happen BEFORE
        # any top-k — taking the batch top-k first would drop a
        # re-scored id whose NEW (lower) weight misses the batch cutoff,
        # leaving the state's stale row to win the merge (round-10
        # review). union_latest shape per (strata, id): batch wins over
        # state; within one unordered batch the conservative resolution
        # is the greatest (weight, key) pair (deterministic; exact
        # replays carry identical weights so it is a no-op there).
        # Work per epoch stays |batch| + k*|strata|.
        from pyspark.sql import Window

        def _latest(df, order_cols):
            win = Window.partitionBy(
                *[F.col(c) for c in strata_cols], F.col(id_col)
            ).orderBy(*order_cols)
            return (
                df.withColumn("__keep", F.row_number().over(win))
                .filter(F.col("__keep") == 1)
                .drop("__keep")
            )

        part = _latest(
            _keyed(batch),
            [F.col(weight_col).desc(), F.col("__key").desc()],
        )
        if state is None:
            return _topk(part)
        merged = _latest(
            state.withColumn("__src", F.lit(0)).unionByName(
                part.withColumn("__src", F.lit(1))
            ),
            [F.col("__src").desc()],
        ).drop("__src")
        return _topk(merged)

    def sample(state):
        from pyspark.sql import Window

        win = Window.partitionBy(*[F.col(c) for c in strata_cols]).orderBy(
            F.col("__key").desc(), F.col(id_col).asc()
        )
        return (
            state.withColumn("rank", F.row_number().over(win).cast("int"))
            .drop("__key")
        )

    return maintain, sample


def make_rule_audit_maintainer(rules: dict[str, "F.Column"]):
    """X157 (pytest-only until round 11) — streaming data-quality audit
    for ADDITIVE row-local rules, the live twin of the q94/X55
    constraint audit's row-rule tier: each rule is a boolean Column
    over a single row, so (n_checked, n_violations) merge across
    micro-batches by ADDITION — one conditional-sum agg per batch, one
    rule-dictionary-sized full-outer merge against state (the X142 IVM
    loop shape). Cross-row rules (PK uniqueness, FK existence) are
    deliberately OUT of contract: their violation counts are not
    additive across batches (a duplicate key split over two epochs is
    invisible to per-batch counts) — they stay batch-side or ride a
    keyed-state processor, and this docstring is the fence that says
    so. Parity pinned by
    tests/test_stateful.py::test_rule_audit_stream_matches_batch.
    """
    names = list(rules)

    def _partial(batch):
        aggs = [F.count("*").cast("bigint").alias("__n")]
        for i, name in enumerate(names):
            aggs.append(
                F.sum(rules[name].cast("int")).cast("bigint").alias(f"__v{i}")
            )
        one = batch.agg(*aggs)
        out = None
        for i, name in enumerate(names):
            row = one.select(
                F.lit(name).alias("rule"),
                F.col("__n").alias("n_checked"),
                F.coalesce(F.col(f"__v{i}"), F.lit(0)).alias("n_violations"),
            )
            out = row if out is None else out.unionByName(row)
        return out

    def maintain(state, batch):
        part = _partial(batch)
        if state is None:
            return part
        s = state.select(
            "rule",
            F.col("n_checked").alias("__cs"),
            F.col("n_violations").alias("__vs"),
        )
        p = part.select(
            "rule",
            F.col("n_checked").alias("__cp"),
            F.col("n_violations").alias("__vp"),
        )
        return s.join(p, "rule", "full_outer").select(
            "rule",
            (F.coalesce("__cs", F.lit(0)) + F.coalesce("__cp", F.lit(0)))
            .cast("bigint")
            .alias("n_checked"),
            (F.coalesce("__vs", F.lit(0)) + F.coalesce("__vp", F.lit(0)))
            .cast("bigint")
            .alias("n_violations"),
        )

    return maintain


def make_hll_distinct_maintainer(
    group_col: str, value_col: str, lg_config_k: int = 12
):
    """X158 (pytest-only until round 11) — streaming mergeable-distinct
    maintenance, the ingest twin of stats.distinct_rollup (X84/q121)
    and the last member of the sketch-algebra streaming trio (X142
    sums, X152 quantile bins, this one distincts): each micro-batch
    contributes one hash agg to (key, hll_sketch) and one per-key
    ``hll_union_agg`` merge against the caller-owned state — HLL
    registers merge by MAX, so the merged sketch is IDENTICAL to the
    sketch of the union (order- and batching-insensitive), which is
    the whole reason HLL beats approx_count_distinct scalars in a
    datacube. State: one fixed-size (~2^lg_config_k B) blob per key.
    Returned pair (maintain, estimates):
    ``maintain(state_df_or_None, batch) -> (key, __sk) state``;
    ``estimates(state) -> (key, estimate)``. Parity pinned by
    tests/test_stateful.py::test_hll_distinct_stream_matches_batch
    (stream estimates == batch sketch-of-union estimates exactly).
    """

    def _partial(batch):
        return (
            batch.select(
                F.col(group_col).alias("key"), F.col(value_col).alias("__v")
            )
            .groupBy("key")
            .agg(F.hll_sketch_agg("__v", F.lit(lg_config_k)).alias("__sk"))
        )

    def maintain(state, batch):
        part = _partial(batch)
        if state is None:
            return part
        return (
            state.unionByName(part)
            .groupBy("key")
            .agg(F.hll_union_agg("__sk", F.lit(False)).alias("__sk"))
        )

    def estimates(state):
        return state.select(
            "key",
            F.hll_sketch_estimate("__sk").cast("bigint").alias("estimate"),
        )

    return maintain, estimates


def make_profile_maintainer(cols: list[str], lg_config_k: int = 12):
    """X159 (pytest-only until round 11) — streaming column profiler,
    the live twin of stats.profile_columns (X68/q107) and the capstone
    of the maintainer tier: every statistic the batch profile publishes
    is maintained incrementally because each is MERGEABLE —
    n_rows/n_null by ADDITION (the X142/X157 shape), min/max by
    MIN/MAX, and n_distinct by HLL register-MAX (the X158 shape; exact
    distinct sets are NOT mergeable without carrying them, which is
    the whole q43/X84 argument). Each micro-batch costs ONE explode to
    (column, value) structs + one hash agg (the same single-pass shape
    as the batch form — no per-column re-scan, no expand) and one
    #cols-row full-outer merge against state.

    State: #cols rows x (counts + one ~2^lg_config_k B sketch).
    Returned pair (maintain, profile):
    ``maintain(state_df_or_None, batch) -> state``;
    ``profile(state) -> (column, n_rows, n_null, n_distinct, min_val,
    max_val)`` — the batch operator's exact output contract, with
    n_distinct carrying HLL error (the approx=True batch mode's bound).
    Parity pinned by
    tests/test_stateful.py::test_profile_stream_matches_batch.
    """

    def _partial(batch):
        pairs = batch.select(
            F.explode(
                F.array(
                    *[
                        F.struct(
                            F.lit(c).alias("column"),
                            F.col(c).cast("string").alias("val"),
                        )
                        for c in cols
                    ]
                )
            ).alias("p")
        ).select("p.column", "p.val")
        return pairs.groupBy("column").agg(
            F.count("*").cast("bigint").alias("n_rows"),
            F.sum(F.when(F.col("val").isNull(), 1).otherwise(0))
            .cast("bigint")
            .alias("n_null"),
            F.hll_sketch_agg("val", F.lit(lg_config_k)).alias("__sk"),
            F.min("val").alias("min_val"),
            F.max("val").alias("max_val"),
        )

    def maintain(state, batch):
        part = _partial(batch)
        if state is None:
            return part
        s = state.select(
            "column",
            F.col("n_rows").alias("__rs"),
            F.col("n_null").alias("__ns"),
            F.col("__sk").alias("__sks"),
            F.col("min_val").alias("__mns"),
            F.col("max_val").alias("__mxs"),
        )
        p = part.select(
            "column",
            F.col("n_rows").alias("__rp"),
            F.col("n_null").alias("__np"),
            F.col("__sk").alias("__skp"),
            F.col("min_val").alias("__mnp"),
            F.col("max_val").alias("__mxp"),
        )
        merged = s.join(p, "column", "full_outer")
        # hll_union_agg merges the (<=2)-sketch group per column; the
        # two-row union keeps the merge declarative without a UDF
        two = merged.select(
            "column",
            F.coalesce("__rs", F.lit(0)).alias("n_rows"),
            F.coalesce("__ns", F.lit(0)).alias("n_null"),
            F.col("__sks").alias("__sk"),
            F.col("__mns").alias("min_val"),
            F.col("__mxs").alias("max_val"),
        ).unionByName(
            merged.select(
                "column",
                F.coalesce("__rp", F.lit(0)).alias("n_rows"),
                F.coalesce("__np", F.lit(0)).alias("n_null"),
                F.col("__skp").alias("__sk"),
                F.col("__mnp").alias("min_val"),
                F.col("__mxp").alias("max_val"),
            )
        )
        return two.groupBy("column").agg(
            F.sum("n_rows").cast("bigint").alias("n_rows"),
            F.sum("n_null").cast("bigint").alias("n_null"),
            F.hll_union_agg("__sk", F.lit(True)).alias("__sk"),
            F.min("min_val").alias("min_val"),
            F.max("max_val").alias("max_val"),
        )

    def profile(state):
        return state.select(
            "column",
            "n_rows",
            "n_null",
            F.hll_sketch_estimate("__sk").cast("bigint").alias("n_distinct"),
            "min_val",
            "max_val",
        )

    return maintain, profile


def ingest_documents_stream(
    spark,
    src_path: str,
    dest_path: str,
    checkpoint: str,
    max_files_per_trigger: int = 64,
):
    """X161 (pytest-only) — streaming twin of ``io.ingest_documents``
    (X160): a file-source stream over arriving JSONL shards, with the
    SAME explicit schema, corrupt-record quarantine, and
    n_chars/digest canonicalization per micro-batch, landing clean
    rows and quarantine rows as parquet via ``foreachBatch``. The
    batch/stream parity argument is structural: every stage is a
    row-local projection or filter, so landing the union of
    micro-batches equals the batch ingest of the union of shards
    (pinned by tests/test_stateful.py::
    test_ingest_stream_matches_batch). ``maxFilesPerTrigger`` bounds
    per-batch work — the knob that keeps a backfill of a million
    shards from becoming one giant first batch. State: none (file
    source tracks seen files in the checkpoint, not row state).

    Exactly-once: foreachBatch's contract makes the WRITER responsible
    for idempotence — a replayed epoch (failure between the two writes
    or before checkpoint commit) must not duplicate rows. Each write
    therefore lands in an ``epoch_id=<N>`` partition directory with
    per-epoch OVERWRITE, so replaying epoch N rewrites exactly epoch N
    (round-10 review). Readers see ``epoch_id`` as a partition column
    — useful lineage; project it away for the batch-parity view.

    Returns the started StreamingQuery; callers own stop()."""
    from ..io import DOCUMENTS_SCHEMA, split_corrupt

    raw = (
        spark.readStream.schema(DOCUMENTS_SCHEMA + ", _corrupt_record string")
        .option("mode", "PERMISSIVE")
        .option("columnNameOfCorruptRecord", "_corrupt_record")
        .option("maxFilesPerTrigger", max_files_per_trigger)
        .json(src_path)
    )

    def land(batch, epoch_id):
        clean, bad = split_corrupt(batch)
        canon = clean.withColumn(
            "n_chars", F.length(F.coalesce(F.col("text"), F.lit(""))).cast("long")
        ).withColumn("digest", F.md5(F.coalesce(F.col("text"), F.lit("\x00"))))
        ep = f"epoch_id={int(epoch_id)}"
        canon.write.mode("overwrite").parquet(f"{dest_path}/{ep}")
        bad.write.mode("overwrite").parquet(f"{dest_path}_quarantine/{ep}")

    return (
        raw.writeStream.foreachBatch(land)
        .option("checkpointLocation", checkpoint)
        .start()
    )


def make_domain_curation_maintainer(url_col: str = "url", lg_config_k: int = 12):
    """X165 (round 11) — streaming per-domain URL curation, the live
    twin of :func:`..operators.text.domain_curation_stats` (X163) over
    the X162 canonicalizer: a crawl frontier delivers URL batches
    continuously, and the domain quota/dup decisions need a maintained
    view, not a nightly batch. Every published statistic is mergeable
    — n_urls/n_malformed by ADDITION (the X142/X157 shape), distinct
    canonical URLs by HLL register-MAX (the X158 shape: the merged
    sketch IS the sketch of the union, so batching can't change the
    estimate; exact distinct sets are not mergeable without carrying
    them). Each micro-batch costs one narrow canonicalize projection +
    one hash agg on the domain key — the canonical string never rides
    the merge, only the fixed-size sketch blob. Returned pair
    (maintain, stats): ``maintain(state_or_None, batch) -> state``;
    ``stats(state) -> (domain, n_urls, n_malformed, n_canonical_est)``.
    Parity pinned by tests/test_stateful.py::
    test_domain_curation_stream_matches_batch."""
    from ..operators.text import url_canonicalize, url_domain

    def _partial(batch):
        base = batch.select(
            url_domain(url_col).alias("domain"),
            url_canonicalize(url_col).alias("__c"),
        )
        return base.groupBy("domain").agg(
            F.count("*").cast("bigint").alias("n_urls"),
            (F.count("*") - F.count("__c")).cast("bigint").alias("n_malformed"),
            F.hll_sketch_agg("__c", F.lit(lg_config_k)).alias("__sk"),
        )

    def maintain(state, batch):
        part = _partial(batch)
        if state is None:
            return part
        return (
            state.unionByName(part)
            .groupBy("domain")
            .agg(
                F.sum("n_urls").cast("bigint").alias("n_urls"),
                F.sum("n_malformed").cast("bigint").alias("n_malformed"),
                F.hll_union_agg("__sk", F.lit(False)).alias("__sk"),
            )
        )

    def stats(state):
        # a domain whose every URL is malformed (the NULL-domain
        # quarantine group) has a NULL sketch — its distinct count is 0
        return state.select(
            "domain",
            "n_urls",
            "n_malformed",
            F.coalesce(F.hll_sketch_estimate("__sk"), F.lit(0))
            .cast("bigint")
            .alias("n_canonical_est"),
        )

    return maintain, stats


def make_encoding_qa_maintainer(
    text_col: str = "text",
    key_col: str = "source",
    moji_per_1000: float = 5.0,
):
    """X169 (round 11) — streaming encoding-QA gate, the live twin of
    the X166 detectors: an ingest stream needs the mojibake/control/
    replacement contamination picture per delivery source WHILE shards
    arrive, so a poisoned feed is quarantined after one micro-batch,
    not after the nightly batch audit. Every published statistic is a
    plain SUM/COUNT — all merges are ADDITION (the X142/X157 shape),
    so epoch boundaries cannot change any number. Each micro-batch
    costs one narrow detector projection (the X166 regexp Columns,
    zero shuffle) + one hash agg on the source key; only the
    fixed-width counter row rides the merge. Returned pair
    (maintain, stats): ``maintain(state_or_None, batch) -> state``;
    ``stats(state)`` adds the per-source contamination rates. Parity
    pinned by tests/test_stateful.py::
    test_encoding_qa_stream_matches_batch."""
    from ..operators.text import (
        control_char_count,
        mojibake_score,
        replacement_char_count,
    )

    def _partial(batch):
        base = batch.select(
            F.col(key_col).alias("source"),
            mojibake_score(text_col).alias("__moji"),
            control_char_count(text_col).alias("__ctrl"),
            replacement_char_count(text_col).alias("__repl"),
        )
        return base.groupBy("source").agg(
            F.count("*").cast("bigint").alias("n_docs"),
            F.sum((F.col("__moji") > moji_per_1000).cast("bigint"))
            .cast("bigint")
            .alias("n_mojibake_docs"),
            F.sum((F.col("__ctrl") > 0).cast("bigint"))
            .cast("bigint")
            .alias("n_control_docs"),
            F.sum("__ctrl").cast("bigint").alias("n_control_chars"),
            F.sum("__repl").cast("bigint").alias("n_replacement_chars"),
        )

    def maintain(state, batch):
        part = _partial(batch)
        if state is None:
            return part
        return (
            state.unionByName(part)
            .groupBy("source")
            .agg(
                *[
                    F.sum(c).cast("bigint").alias(c)
                    for c in (
                        "n_docs",
                        "n_mojibake_docs",
                        "n_control_docs",
                        "n_control_chars",
                        "n_replacement_chars",
                    )
                ]
            )
        )

    def stats(state):
        return state.select(
            "source",
            "n_docs",
            "n_mojibake_docs",
            "n_control_docs",
            "n_control_chars",
            "n_replacement_chars",
            (F.col("n_mojibake_docs") / F.col("n_docs").cast("double")).alias(
                "mojibake_rate"
            ),
            (F.col("n_control_docs") / F.col("n_docs").cast("double")).alias(
                "control_rate"
            ),
        )

    return maintain, stats


def decontamination_stream(
    vecs: DataFrame,
    benchmark: DataFrame,
    threshold: float = 0.9,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    bench_id_col: str = "vec_id",
    bench_vec_col: str = "embedding",
) -> DataFrame:
    """X171 (round 11) — streaming twin of X170
    (`similarity.embedding_decontaminate`): arriving corpus embeddings
    are checked against the static benchmark suite IN-FLIGHT, so a
    contaminated document is rejected before it ever lands — the
    admit/reject gate an ingest pipeline keys on, like X33's near-dup
    signal. Emits one (id, bench_id, cosine) row per match at or above
    ``threshold`` (match EVENTS — any match means reject; the per-doc
    best-match reduction is the batch tier's reporting shape, which
    would need streaming aggregation state for no decision value).

    State shape: completely STATELESS — the benchmark is model-sized
    and broadcast, the scan is a per-row fold projection, and there is
    no keyed state, no watermark, no aggregation; the same plan runs
    unchanged over a batch frame, which is exactly how the parity test
    pins it. Benchmark refresh is a stream-static re-plan per
    micro-batch (the X33 index contract): replacing the benchmark
    table needs no query restart."""
    from ..operators.similarity import as_double, cosine, l2_norm

    c = vecs.select(F.col(id_col).alias("id"), F.col(vec_col).alias("__ce"))
    b = benchmark.select(
        F.col(bench_id_col).alias("bench_id"),
        F.col(bench_vec_col).alias("__be"),
    )
    cn = c.withColumn("__cv", as_double(F.col("__ce"))).withColumn(
        "__cn", l2_norm(F.col("__cv"))
    )
    bn = b.withColumn("__bv", as_double(F.col("__be"))).withColumn(
        "__bn", l2_norm(F.col("__bv"))
    )
    return (
        cn.crossJoin(F.broadcast(bn))
        .withColumn(
            "cosine",
            F.round(
                cosine(F.col("__cv"), F.col("__bv"), F.col("__cn"), F.col("__bn")),
                4,
            ).cast("decimal(38,4)"),
        )
        .filter(F.col("cosine") >= threshold)
        .select("id", "bench_id", "cosine")
    )


def make_code_quality_maintainer(text_col: str = "text",
                                 key_col: str = "source"):
    """X181 (round 12) — streaming code-corpus quality gate, the live
    twin of the X176 signals: a code-corpus delivery (repo dumps land
    in bursts) needs the per-source keep/autogen/blob picture while
    shards arrive, so a minified-bundle or generated-code feed is
    flagged after one micro-batch. Every statistic is a plain
    SUM/COUNT — all merges are ADDITION (the X169 shape), so epoch
    boundaries cannot change any number; each micro-batch costs the
    X176 codegen projection (zero shuffle) + one hash agg on the
    source key, and only the fixed-width counter row rides the merge.
    Returned pair (maintain, stats); parity pinned by
    tests/test_stateful.py::test_code_quality_stream_matches_batch."""
    from ..operators.text import code_quality_signals

    _COUNTERS = ("n_docs", "n_keep", "n_autogen", "n_blob", "total_lines")

    def _partial(batch):
        s = code_quality_signals(batch.select(key_col, text_col),
                                 text_col=text_col)
        return s.groupBy(key_col).agg(
            F.count("*").cast("bigint").alias("n_docs"),
            F.sum(F.col("code_keep").cast("bigint"))
            .cast("bigint")
            .alias("n_keep"),
            F.sum(F.col("has_autogen_marker").cast("bigint"))
            .cast("bigint")
            .alias("n_autogen"),
            F.sum(F.col("has_base64_blob").cast("bigint"))
            .cast("bigint")
            .alias("n_blob"),
            F.sum("n_lines").cast("bigint").alias("total_lines"),
        )

    def maintain(state, batch):
        part = _partial(batch)
        if state is None:
            return part
        return (
            state.unionByName(part)
            .groupBy(key_col)
            .agg(*[F.sum(c).cast("bigint").alias(c) for c in _COUNTERS])
        )

    def stats(state):
        return state.select(
            key_col,
            *_COUNTERS,
            (F.col("n_keep") / F.col("n_docs").cast("double")).alias(
                "keep_rate"
            ),
            (F.col("n_autogen") / F.col("n_docs").cast("double")).alias(
                "autogen_rate"
            ),
        )

    return maintain, stats


def make_template_farm_maintainer(
    text_col: str = "text", id_col: str = "doc_id", lg_config_k: int = 12
):
    """X174 (round 11) — streaming template-farm watch, the live twin
    of :func:`..operators.text.template_farm_stats` (X173): a crawl
    delivers template chaff in bursts, and the farm picture (which
    skeletons are exploding, with how much filling variety) should
    update per micro-batch, not nightly. Merge algebra per template
    key: n_docs by ADDITION (X142/X157 shape), distinct filled texts
    by HLL register-MAX (X158 shape — the merged sketch IS the sketch
    of the union, so re-crawled duplicates split across epochs do not
    double-count), representative id by MIN. One narrow fingerprint
    projection + one template-key hash agg per batch; only the
    fixed-size counter/sketch row rides the merge. Returned pair
    (maintain, stats): ``stats(state, min_docs)`` applies the farm
    threshold at read time (state keeps every template so a skeleton
    crossing the threshold later never loses its history)."""
    from ..operators.text import template_fingerprint

    def _partial(batch):
        base = batch.select(
            F.col(id_col).alias("id"),
            template_fingerprint(text_col).alias("template"),
            F.md5(F.col(text_col)).alias("__digest"),
        )
        return base.groupBy("template").agg(
            F.count("*").cast("bigint").alias("n_docs"),
            F.hll_sketch_agg("__digest", F.lit(lg_config_k)).alias("__sk"),
            F.min("id").alias("representative_id"),
        )

    def maintain(state, batch):
        part = _partial(batch)
        if state is None:
            return part
        return (
            state.unionByName(part)
            .groupBy("template")
            .agg(
                F.sum("n_docs").cast("bigint").alias("n_docs"),
                F.hll_union_agg("__sk", F.lit(False)).alias("__sk"),
                F.min("representative_id").alias("representative_id"),
            )
        )

    def stats(state, min_docs: int = 3):
        return (
            state.filter(F.col("n_docs") >= min_docs)
            .select(
                "template",
                "n_docs",
                F.hll_sketch_estimate("__sk")
                .cast("bigint")
                .alias("n_distinct_texts_est"),
                "representative_id",
            )
        )

    return maintain, stats
