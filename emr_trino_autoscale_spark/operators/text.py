"""Text-analysis operators (X4 + training-data extensions).

Everything is built-in expression work (split/regexp/aggregate) —
vectorized, codegen'd, no Python in the hot path. These run as narrow
projections (zero shuffle) until the final grouped rollup.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

from ._persist import default_persist

from ..functions import md5_long60

# Small multilingual stopword sample for heuristic scoring; deliberately
# tiny and hard-coded (deterministic, no model files).
_STOPWORDS = (
    "the", "a", "of", "and", "to", "in", "is", "it", "that", "for",
)


def token_count(text_col: str = "text") -> Column:
    """Whitespace token count (matches string_split semantics)."""
    return F.size(F.split(F.col(text_col), " ")).cast("bigint")


def bpe_ish_token_count(text_col: str = "text") -> Column:
    """BPE-ish token estimate: count word pieces + punctuation via regex
    splitting on word boundaries (a cheap, deterministic proxy for a
    real tokenizer; the corpus-scale shape — narrow projection — is what
    matters at 100 TB)."""
    pieces = F.regexp_extract_all(
        F.col(text_col), F.lit(r"[A-Za-z]+|[0-9]+|[^A-Za-z0-9\s]"), 0
    )
    return F.size(pieces).cast("bigint")


def stopword_ratio(text_col: str = "text") -> Column:
    toks = F.split(F.lower(F.col(text_col)), " ")
    # counted per occurrence (array_intersect would dedupe repeats)
    n_stop = F.aggregate(
        toks,
        F.lit(0),
        lambda acc, t: acc + F.when(t.isin(*_STOPWORDS), 1).otherwise(0),
    )
    return n_stop / F.greatest(F.size(toks), F.lit(1))


def punct_ratio(text_col: str = "text") -> Column:
    n_punct = F.length(F.regexp_replace(F.col(text_col), r"[^\.,;:!\?]", ""))
    return n_punct / F.greatest(F.length(F.col(text_col)), F.lit(1))


def quality_score(text_col: str = "text") -> Column:
    """Heuristic quality score in [0,1]: rewards moderate length,
    presence of stopwords, low punctuation density. Deterministic
    arithmetic only — a stand-in with the real pipeline shape."""
    n_tok = token_count(text_col)
    len_score = F.least(n_tok / F.lit(100.0), F.lit(1.0))
    stop_score = F.least(stopword_ratio(text_col) * 5.0, F.lit(1.0))
    punct_penalty = F.greatest(F.lit(1.0) - punct_ratio(text_col) * 5.0, F.lit(0.0))
    return (len_score + stop_score + punct_penalty) / 3.0


def language_id(text_col: str = "text") -> Column:
    """n-gram-heuristic language guess: scores a handful of marker words
    per language and picks the max (ties -> 'und'). A real n-gram model
    would be a broadcast lookup table with the same plan shape."""
    toks = F.split(F.lower(F.col(text_col)), " ")

    def score(markers: tuple[str, ...]) -> Column:
        return F.aggregate(
            toks,
            F.lit(0),
            lambda acc, t: acc + F.when(t.isin(*markers), 1).otherwise(0),
        )

    en = score(("the", "and", "of", "is"))
    de = score(("der", "die", "und", "ist"))
    fr = score(("le", "la", "et", "est"))
    es = score(("el", "los", "y", "es"))
    best = F.greatest(en, de, fr, es)
    return (
        F.when(best == 0, F.lit("und"))
        .when(en == best, F.lit("en"))
        .when(de == best, F.lit("de"))
        .when(fr == best, F.lit("fr"))
        .otherwise(F.lit("es"))
    )


def fingerprint64(
    text_col: str = "text", window: int = 8, toks: Column | None = None
) -> Column:
    """Rolling-hash document fingerprint: xxhash64 of each ``window``-gram
    of tokens, folded with XOR — order-insensitive fold of order-sensitive
    grams, so it is stable yet content-shift-sensitive.

    Pass ``toks`` as a materialized token-array *column* in hot paths —
    an inline split is re-evaluated per gram inside the lambda (see
    dedup.shingles_of)."""
    if toks is None:
        toks = F.split(F.col(text_col), " ")
    n = F.size(toks)
    grams = F.transform(
        F.sequence(F.lit(1), F.greatest(n - F.lit(window - 1), F.lit(1))),
        lambda i: F.xxhash64(
            F.concat_ws(" ", F.slice(toks, i, window))
        ),
    )
    return F.aggregate(
        grams, F.lit(0).cast("long"), lambda acc, h: acc.bitwiseXOR(h)
    )


def fingerprint60_md5(
    text_col: str = "text", window: int = 8, toks: Column | None = None
) -> Column:
    """Oracle-replayable rolling fingerprint: 60-bit ints from the md5 of
    each ``window``-token gram, XOR-folded. Same shape as
    :func:`fingerprint64` but built on md5 (portable across engines;
    xxhash64 is Spark-specific). 15 hex chars keep the value < 2^60, so
    it is exact in any signed 64-bit integer. Pass ``toks`` as a
    materialized column in hot paths (see :func:`fingerprint64`)."""
    if toks is None:
        toks = F.split(F.col(text_col), " ")
    n = F.size(toks)
    grams = F.transform(
        F.sequence(F.lit(1), F.greatest(n - F.lit(window - 1), F.lit(1))),
        lambda i: F.conv(
            F.substring(F.md5(F.concat_ws(" ", F.slice(toks, i, window))), 1, 15),
            16,
            10,
        ).cast("long"),
    )
    return F.aggregate(
        grams, F.lit(0).cast("long"), lambda acc, h: acc.bitwiseXOR(h)
    )


def doc_stats(
    df: DataFrame,
    group_cols: tuple[str, ...] = ("lang", "source"),
    text_col: str = "text",
) -> DataFrame:
    """X4 — grouped token/length statistics (the Q24 shape)."""
    return (
        df.withColumn("__n_tok", token_count(text_col))
        .groupBy(*group_cols)
        .agg(
            F.count("*").cast("bigint").alias("n_docs"),
            F.sum("__n_tok").cast("bigint").alias("total_tokens"),
            F.avg(F.col("__n_tok").cast("double")).alias("avg_tokens"),
            F.avg(F.col("n_chars").cast("double")).alias("avg_chars"),
            F.min("n_chars").cast("bigint").alias("min_chars"),
            F.max("n_chars").cast("bigint").alias("max_chars"),
        )
    )


def tfidf_top_terms(
    df: DataFrame,
    k: int = 3,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Top-k characteristic terms per document by TF-IDF.

    ``score = tf * (N + 1) / (df + 1)`` — the idf RATIO is kept un-logged
    deliberately: log is monotone (identical ranking) but libm ``ln``
    is not guaranteed bit-identical across engines, while a quotient of
    exact small integers is — so the oracle replays scores exactly.
    Ties break on the term string ascending.

    Scale: explode -> (doc, term) count is one narrow shuffle with
    map-side combine; document frequency is a second aggregation over
    the distinct (doc, term) pairs (no re-scan of raw text); N rides in
    via a 1-row broadcast. The per-doc top-k window partitions on the
    document id — no global sort.
    """
    tf = (
        df.select(
            F.col(id_col), F.explode(F.split(F.col(text_col), " ")).alias("term")
        )
        .groupBy(id_col, "term")
        .agg(F.count("*").alias("tf"))
    )
    dfreq = tf.groupBy("term").agg(F.count("*").alias("df"))
    n_docs = df.agg(F.countDistinct(id_col).alias("n_docs"))
    scored = (
        tf.join(dfreq, "term")
        .crossJoin(F.broadcast(n_docs))
        .withColumn(
            "score",
            F.col("tf") * (F.col("n_docs") + F.lit(1)) / (F.col("df") + F.lit(1)),
        )
    )
    w = Window.partitionBy(id_col).orderBy(F.col("score").desc(), F.col("term").asc())
    return (
        scored.withColumn("rank", F.row_number().over(w).cast("int"))
        .filter(F.col("rank") <= k)
        .select(id_col, "term", "rank", "score")
    )


# PII scrub patterns — portable across Java regex and RE2-style engines
# (no lookarounds, no backrefs), so the oracle replays them exactly.
EMAIL_RE = r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}"
PHONE_RE = r"[0-9]{3}-[0-9]{3}-[0-9]{4}"


def pii_scrub(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Training-data PII scrub: count and redact email addresses and
    phone-shaped numbers. Pure regexp column expressions (codegen'd,
    zero shuffle) — at 100 TB this runs as a narrow projection fused
    into the scan. Adds ``n_emails``, ``n_phones``, ``redacted``."""
    t = F.col(text_col)
    after_email = F.regexp_replace(t, EMAIL_RE, "<EMAIL>")
    red = F.regexp_replace(after_email, PHONE_RE, "<PHONE>")
    return (
        df.withColumn("n_emails", F.regexp_count(t, F.lit(EMAIL_RE)).cast("bigint"))
        # phones counted AFTER email redaction so the counts reconcile
        # with the placeholder tokens: a phone-shaped email local part
        # ("555-123-4567@x.example") is one <EMAIL>, not also a phone
        .withColumn(
            "n_phones", F.regexp_count(after_email, F.lit(PHONE_RE)).cast("bigint")
        )
        .withColumn("redacted", red)
    )


def repetition_stats(
    df: DataFrame, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """Repetition quality signals (the published Gopher-rule family:
    a document dominated by one token or by repeated n-grams is
    low-quality boilerplate).

    * ``top_word_frac`` — occurrences of the most frequent token over
      total tokens;
    * ``dup_bigram_frac`` — fraction of bigram slots occupied by
      repeats (1 - distinct/total).

    Both are quotients of exact small integers (bit-identical across
    engines — no libm). Scale: the token frequencies come from the
    explode -> (doc, term) hash aggregation (map-side combine, one
    narrow shuffle keyed by doc id), NOT a per-row O(n^2) HOF scan;
    bigram distinctness is a pure array projection, zero shuffle.
    """
    tf = (
        df.select(F.col(id_col), F.explode(F.split(F.col(text_col), " ")).alias("t"))
        .groupBy(id_col, "t")
        .agg(F.count("*").alias("tf"))
        .groupBy(id_col)
        .agg(
            F.max("tf").alias("__top"),
            F.sum("tf").alias("__total"),
        )
    )
    from .dedup import shingles_of

    grams = (
        df.withColumn("__toks", F.split(F.col(text_col), " "))
        .withColumn("__bi", shingles_of(F.col("__toks"), 2))
        .select(
            F.col(id_col),
            F.size("__bi").alias("__nbi"),
            F.size(F.array_distinct("__bi")).alias("__dbi"),
        )
    )
    return (
        df.join(tf, id_col)
        .join(grams, id_col)
        .withColumn("n_tok", F.col("__total").cast("bigint"))
        .withColumn("top_word_frac", F.col("__top") / F.col("__total"))
        .withColumn(
            "dup_bigram_frac",
            F.when(F.col("__nbi") > 0, 1.0 - F.col("__dbi") / F.col("__nbi")).otherwise(
                F.lit(0.0)
            ),
        )
        .drop("__top", "__total", "__nbi", "__dbi", "__toks", "__bi")
    )


def boilerplate_strip(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    max_df_frac: float = 0.3,
) -> DataFrame:
    """X20 — corpus-level boilerplate token removal (the CCNet/Dolma
    cleaning step): a token whose document frequency exceeds
    ``max_df_frac`` of the corpus is boilerplate (nav chrome, license
    headers, cookie banners); every document is re-emitted with those
    tokens removed, original order preserved. Output per doc:
    ``n_tokens`` (original), ``n_kept`` (surviving), ``kept_hash``
    (md5 of the space-joined cleaned token stream — the verifiable
    stand-in for shipping the cleaned text itself).

    Scale: the boilerplate set is bounded by construction — at most
    total_tokens / (max_df_frac * n_docs) = avg_doc_len / max_df_frac
    distinct tokens can clear the bar (~1000 at frac 0.3 on 300-token
    docs), INDEPENDENT of corpus size, so broadcasting it is safe at
    any scale and the token stream never shuffles for the lookup. The
    df aggregation shuffles (id, token)-distinct pairs on the token
    key; the only corpus-sized shuffle is the per-doc regroup, keyed on
    the doc id. Order restoration is an ``array_sort`` over collected
    (pos, tok) structs — per-doc bounded, inside the hash aggregate.
    """
    toks = df.select(
        F.col(id_col).alias("id"),
        F.posexplode(F.split(F.col(text_col), " ")).alias("pos", "tok"),
    )
    n_docs = df.agg(F.count("*").cast("double").alias("__n"))
    boiler = (
        toks.select("id", "tok")
        .distinct()
        .groupBy("tok")
        .agg(F.count("*").cast("double").alias("__df"))
        .crossJoin(F.broadcast(n_docs))
        .filter(F.col("__df") > F.lit(max_df_frac) * F.col("__n"))
        .select("tok")
        .withColumn("__boiler", F.lit(1))
    )
    return (
        toks.join(F.broadcast(boiler), "tok", "left")
        .groupBy("id")
        .agg(
            F.count("*").cast("bigint").alias("n_tokens"),
            F.sum(F.when(F.col("__boiler").isNull(), 1).otherwise(0))
            .cast("bigint")
            .alias("n_kept"),
            F.md5(
                F.concat_ws(
                    " ",
                    F.transform(
                        F.array_sort(
                            F.collect_list(
                                F.when(
                                    F.col("__boiler").isNull(),
                                    F.struct("pos", "tok"),
                                )
                            )
                        ),
                        lambda s: s["tok"],
                    ),
                )
            ).alias("kept_hash"),
        )
    )


def vocab_coverage(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    vocab_size: int = 1000,
) -> DataFrame:
    """X29 — out-of-vocabulary audit: per document, the fraction of its
    tokens missing from the corpus top-``vocab_size`` vocabulary
    (frequency desc, token asc tie-break). The standard pre-tokenizer
    sanity check for a training corpus: a spike in OOV rate flags
    boilerplate explosions, encoding corruption, or a language the
    tokenizer was never fit on.

    Scale: token explode -> one hash aggregation for frequencies
    (map-side combinable); the vocabulary cut is a two-phase top-V
    (per-bucket row_number then a bounded re-rank over V*n_buckets
    survivors — never a global sort of all distinct tokens); the
    membership join broadcasts the V-row vocabulary, so the per-token
    coverage pass is a narrow broadcast-hash join with no shuffle of
    the exploded frame. Output is one row per document.
    """
    from . import skew

    toks = df.select(
        F.col(id_col).alias("id"),
        F.explode(F.split(F.col(text_col), " ")).alias("tok"),
    )
    freq = toks.groupBy("tok").agg(F.count("*").alias("freq"))
    vocab = (
        skew.two_phase_topk(
            freq,
            part_cols=[],
            order_cols=[F.col("freq").desc(), F.col("tok").asc()],
            k=vocab_size,
            bucket_on=F.col("tok"),
        )
        .select("tok")
        .withColumn("__in_vocab", F.lit(1))
    )
    return (
        toks.join(F.broadcast(vocab), "tok", "left")
        .groupBy("id")
        .agg(
            F.count("*").cast("bigint").alias("n_tokens"),
            F.sum(F.when(F.col("__in_vocab").isNull(), 1).otherwise(0))
            .cast("bigint")
            .alias("n_oov"),
        )
        .withColumn("oov_rate", F.col("n_oov") / F.col("n_tokens"))
    )


def chunk_tokens(
    df: DataFrame,
    chunk: int = 64,
    overlap: int = 16,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """X34 — token-window chunking: split each document into
    fixed-token-budget chunks with ``overlap`` tokens of context carried
    between consecutive chunks (stride = chunk - overlap). The standard
    pre-training/embedding shape: models consume bounded windows, and
    the overlap keeps boundary sentences learnable from both sides.

    Scale: pure narrow expression work — one ``sequence``/``explode``
    per document (no shuffle at all; chunking is row-local), with the
    token array materialized as a column once (the HOF-lambda CSE rule:
    an inline split would re-evaluate per chunk). Fan-out is
    ~n_tokens/stride rows per document, the physical row count any
    downstream trainer needs anyway. The final chunk is allowed to run
    short (length >= 1) rather than silently dropping tail tokens, but
    a chunk is only emitted if it contributes at least one token beyond
    the previous chunk's coverage (``start < n - overlap``) — otherwise
    short documents would grow pure-duplicate tail chunks made entirely
    of overlap. Consequences (property-tested): every non-tail chunk is
    exactly ``chunk`` tokens, and dropping the first ``overlap`` tokens
    of each chunk after the first reassembles the document exactly.
    """
    if chunk <= overlap:
        raise ValueError(f"chunk={chunk} must exceed overlap={overlap}")
    stride = chunk - overlap
    toks = F.split(F.col(text_col), " ")
    d = df.withColumn("__toks", toks).withColumn("__n", F.size(F.col("__toks")))
    # guard: F.sequence(0, stop) with stop < 0 yields a DESCENDING
    # range, not empty — NULL text (size -1 or NULL) must emit no rows
    starts = F.when(
        F.col("__n") > 0,
        F.sequence(
            F.lit(0),
            F.greatest(F.col("__n") - overlap - 1, F.lit(0)),
            F.lit(stride),
        ),
    ).otherwise(F.array().cast("array<int>"))
    return (
        d.withColumn("__start", F.explode(starts))
        .select(
            F.col(id_col),
            (F.col("__start") / stride).cast("int").alias("chunk_idx"),
            F.least(F.lit(chunk), F.col("__n") - F.col("__start"))
            .cast("bigint")
            .alias("n_tokens"),
            F.concat_ws(
                " ", F.slice(F.col("__toks"), F.col("__start") + 1, chunk)
            ).alias("chunk_text"),
        )
    )


def unigram_logloss(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    vocab_size: int = 1000,
) -> DataFrame:
    """X35 — unigram language-model quality score (the CCNet shape:
    score each document by its negative log-likelihood under a corpus
    LM; outlier-high scores flag gibberish/encoding damage, outlier-low
    flag boilerplate/repetition). The LM here is the corpus's own
    top-``vocab_size`` unigram distribution; tokens outside it get the
    floor probability 1/total (add-one-style), so the score is total
    and deterministic.

    Scale: same contract as :func:`vocab_coverage` — one frequency
    hash agg (map-side combinable), two-phase top-V cut (no global
    token sort), then the V-row vocabulary + the 1-row corpus total
    broadcast into a narrow per-token join; per-doc reduction is one
    hash agg on the id key. No corpus-sized shuffle beyond the exploded
    token agg the frequency pass already owes.
    """
    from . import skew

    toks = df.select(
        F.col(id_col).alias("id"),
        F.explode(F.split(F.col(text_col), " ")).alias("tok"),
    )
    freq = toks.groupBy("tok").agg(F.count("*").alias("freq"))
    total_df = freq.agg(F.sum("freq").cast("double").alias("__total"))
    vocab = skew.two_phase_topk(
        freq,
        part_cols=[],
        order_cols=[F.col("freq").desc(), F.col("tok").asc()],
        k=vocab_size,
        bucket_on=F.col("tok"),
    ).select("tok", F.col("freq").alias("__vfreq"))
    return (
        toks.join(F.broadcast(vocab), "tok", "left")
        .join(F.broadcast(total_df))
        .withColumn(
            "__nll",
            -F.log(F.coalesce(F.col("__vfreq").cast("double"), F.lit(1.0)) / F.col("__total")),
        )
        .groupBy("id")
        .agg(
            F.count("*").cast("bigint").alias("n_tokens"),
            F.sum(F.when(F.col("__vfreq").isNull(), 1).otherwise(0))
            .cast("bigint")
            .alias("n_oov"),
            F.avg("__nll").alias("logloss"),
        )
        .withColumnRenamed("id", id_col)
    )


def dsir_logratio(
    df: DataFrame,
    target_filter: Column,
    n_buckets: int = 1024,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """X37 — DSIR-shaped importance weight (Xie et al., "Data Selection
    for Language Models via Importance Resampling", NeurIPS 2023 —
    public): score every document by how much more likely its hashed
    unigram features are under a TARGET distribution (the rows matching
    ``target_filter`` — a trusted domain, a quality-filtered subset)
    than under the full corpus. Sampling proportionally to the weight
    shifts a raw crawl toward the target domain without a trained
    classifier.

    Tokens hash into ``n_buckets`` md5-derived buckets (replayable in
    any engine with md5 — the q27 digest form); both distributions get
    add-one smoothing over the bucket space; the per-doc weight is the
    sum over its tokens of ln(p_target(b) / p_corpus(b)).

    Scale: ONE exploded-token hash aggregation keyed on the int bucket
    computes both distributions (the target count is a conditional sum
    in the same agg — no second corpus pass); the B-row count table and
    the 1-row totals broadcast into a narrow per-token join; the
    per-doc reduction is one hash agg on the id key. Same contract as
    :func:`unigram_logloss` with the vocabulary replaced by a
    fixed-size hashed feature space — at 100 TB the feature table is
    B rows regardless of vocabulary growth.
    """
    d = df.select(
        F.col(id_col).alias("id"),
        F.col(text_col).alias("__t"),
        F.when(target_filter, 1).otherwise(0).alias("__is_t"),
    )
    toks = d.select(
        "id", "__is_t", F.explode(F.split(F.col("__t"), " ")).alias("__tok")
    ).select(
        "id",
        "__is_t",
        F.pmod(
            md5_long60(F.col("__tok")),
            F.lit(n_buckets),
        ).alias("b"),
    )
    counts = toks.groupBy("b").agg(
        F.count("*").alias("__c_all"), F.sum("__is_t").alias("__c_t")
    )
    totals = counts.agg(
        F.sum("__c_all").cast("double").alias("__T_all"),
        F.sum("__c_t").cast("double").alias("__T_t"),
    )
    lr = F.log(
        (F.col("__c_t") + 1.0) / (F.col("__T_t") + float(n_buckets))
    ) - F.log((F.col("__c_all") + 1.0) / (F.col("__T_all") + float(n_buckets)))
    return (
        toks.join(F.broadcast(counts), "b")
        .join(F.broadcast(totals))
        .withColumn("__lr", lr)
        .groupBy("id")
        .agg(
            F.count("*").cast("bigint").alias("n_tokens"),
            F.sum("__lr").alias("log_ratio"),
        )
        .withColumnRenamed("id", id_col)
    )


def fingerprint60_md5_arrow(text_col: str = "text", window: int = 8):
    """Arrow twin of :func:`fingerprint60_md5` — identical values
    (XOR of 60-bit md5 gram digests, same short-document clipping), no
    interpreted HOF lambda and no per-gram JVM md5. Row-local, so the
    right shape is a vectorized projection (docs/SCALE.md round-5 rule).
    Returns a Column; use in place of the expression form in hot paths.
    The expression form remains the documented oracle-shape reference.
    """
    import hashlib

    import pandas as pd

    from pyspark.sql.functions import pandas_udf

    def fp_series(s: pd.Series) -> pd.Series:
        out = []
        for t in s:
            if t is None:
                out.append(None)
                continue
            toks = t.split(" ")
            n_grams = max(len(toks) - (window - 1), 1)
            acc = 0
            for j in range(n_grams):
                g = " ".join(toks[j : j + window])
                acc ^= int(hashlib.md5(g.encode("utf-8")).hexdigest()[:15], 16)
            out.append(acc)
        return pd.Series(out, dtype="object")

    return pandas_udf(fp_series, "long", functionType=200)(F.col(text_col))


def bigram_stats(
    df: DataFrame,
    text_col: str = "text",
) -> DataFrame:
    """X38 — bigram language-model statistics / BPE merge candidates:
    count every adjacent token pair over the corpus and attach the
    conditional probability P(b | a) = count(a,b) / count(a-in-context).
    The descending-count head of this table is exactly the candidate
    list a BPE/WordPiece vocabulary learner consumes (the most frequent
    adjacent pair is the next merge), and the full table is a smoothed
    bigram LM ready for perplexity scoring.

    Scale: pair extraction is row-local — the token array materializes
    once and zips with its own shift (``slice``+``arrays_zip``), so no
    token ever rides a shuffle individually; the only wide op is ONE
    map-side-combinable hash agg keyed on the pair. The left-context
    denominator is a window sum partitioned by ``tok_a`` — cardinality
    = vocabulary, so parallelism grows with the corpus rather than
    collapsing (contrast the low-cardinality group keys two_phase_topk
    exists for). At 100 TB the bigram table is O(V^2)-bounded but
    sparse-in-practice; it stays distributed end to end.
    """
    toks = F.split(F.col(text_col), " ")
    d = (
        df.select(toks.alias("__toks"))
        .withColumn("__n", F.size("__toks"))
        .filter(F.col("__n") >= 2)
    )
    pairs = d.select(
        F.explode(
            F.arrays_zip(
                F.slice("__toks", 1, F.col("__n") - 1),
                F.slice("__toks", 2, F.col("__n") - 1),
            )
        ).alias("__z")
    ).select(
        F.col("__z.0").alias("tok_a"), F.col("__z.1").alias("tok_b")
    )
    counts = pairs.groupBy("tok_a", "tok_b").agg(
        F.count("*").cast("bigint").alias("pair_count")
    )
    w = Window.partitionBy("tok_a")
    return counts.withColumn(
        "left_count", F.sum("pair_count").over(w).cast("bigint")
    ).withColumn(
        "cond_prob",
        F.col("pair_count").cast("double") / F.col("left_count").cast("double"),
    )


# Literal logistic-regression weights for the quality classifier —
# fastText-style linear model over cheap engineered features. Fixed
# constants (not trained here) keep the operator deterministic and
# oracle-replayable; a trained model drops in as a different literal
# vector with the identical plan shape.
_QC_WEIGHTS = {
    "bias": -2.0,
    "log_tokens": 0.6,       # longer docs mildly favored (saturating log)
    "stop_ratio": 4.0,       # natural prose has stopwords
    "punct_ratio": -6.0,     # punctuation soup is a spam signal
    "digit_ratio": -3.0,     # digit walls (tables, dumps) score down
    "mean_tok_len": -0.1,    # very long "words" = URLs/base64 junk
}


def quality_classifier(
    df: DataFrame,
    text_col: str = "text",
    drop_below: float = 0.4,
    keep_above: float = 0.6,
) -> DataFrame:
    """X39 — linear quality classifier (the fastText-filter shape used
    by CCNet/Gopher-style curation): engineered features -> literal
    logistic weights -> sigmoid score in (0,1) -> three-way verdict
    (``drop`` / ``review`` / ``keep``). The middle band exists because
    production filters route borderline docs to a second (expensive)
    model rather than hard-classifying them.

    Scale: pure narrow projection — every feature and the sigmoid are
    whole-stage-codegen expressions on the row; zero shuffle, zero
    Python. This is the cheapest possible per-doc shape, which is the
    point: the linear filter runs over ALL 100 TB, and only its
    ``review`` slice ever reaches anything costlier.
    """
    n_tok = token_count(text_col)
    n_chars = F.greatest(F.length(F.col(text_col)), F.lit(1))
    digit_ratio = (
        F.length(F.regexp_replace(F.col(text_col), r"[^0-9]", "")) / n_chars
    )
    # mean token length: chars net of the n-1 separators, over tokens
    mean_tok_len = (F.length(F.col(text_col)) - (n_tok - F.lit(1))) / n_tok
    w = _QC_WEIGHTS
    z = (
        F.lit(w["bias"])
        + F.lit(w["log_tokens"]) * F.log(n_tok.cast("double") + F.lit(1.0))
        + F.lit(w["stop_ratio"]) * stopword_ratio(text_col)
        + F.lit(w["punct_ratio"]) * punct_ratio(text_col)
        + F.lit(w["digit_ratio"]) * digit_ratio
        + F.lit(w["mean_tok_len"]) * mean_tok_len
    )
    score = F.lit(1.0) / (F.lit(1.0) + F.exp(-z))
    verdict = (
        F.when(score < drop_below, F.lit("drop"))
        .when(score <= keep_above, F.lit("review"))
        .otherwise(F.lit("keep"))
    )
    return df.withColumn("q_score", score).withColumn("verdict", verdict)


def perplexity_gate(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    vocab_size: int = 1000,
    mid_loss: float = 4.5,
    high_loss: float = 6.0,
    rates: tuple[float, float, float] = (1.0, 0.5, 0.1),
) -> DataFrame:
    """X40 — perplexity-gated subsampling (the Gopher/MassiveText
    quality-gate shape): bucket every document by its unigram-LM logloss
    against FIXED thresholds (``low`` fluent / ``mid`` / ``high``
    gibberish-or-rare), then keep a per-bucket fraction chosen by a
    deterministic md5 coin on the doc id. Fixed literal thresholds —
    not computed quantiles — are deliberate: the gate stays row-local,
    engine-replayable, and stable across corpus snapshots (a quantile
    gate re-classifies every doc whenever the corpus shifts).

    Scale: inherits :func:`unigram_logloss`'s contract (one exploded
    hash agg + broadcast vocab); everything after is narrow expression
    work. The md5 coin means replay/retry and cross-engine audit
    reproduce the exact sample — no rand(), no state.
    """
    scored = unigram_logloss(df, text_col=text_col, id_col=id_col,
                             vocab_size=vocab_size)
    bucket = (
        F.when(F.col("logloss") < mid_loss, F.lit("low"))
        .when(F.col("logloss") < high_loss, F.lit("mid"))
        .otherwise(F.lit("high"))
    )
    rate = (
        F.when(F.col("bucket") == "low", F.lit(rates[0]))
        .when(F.col("bucket") == "mid", F.lit(rates[1]))
        .otherwise(F.lit(rates[2]))
    )
    # uniform in [0,1): 60-bit md5 prefix of the id, scaled
    coin = (
        md5_long60(F.col(id_col).cast("string"))
        .cast("double")
        / F.lit(float(1 << 60))
    )
    return (
        scored.withColumn("bucket", bucket)
        .withColumn("keep", coin < rate)
        .select(id_col, "n_tokens", "logloss", "bucket", "keep")
    )


def winsorized_stats(
    df: DataFrame,
    group_col: str = "source",
    value_col: str = "n_chars",
    lo: float = 0.05,
    hi: float = 0.95,
) -> DataFrame:
    """X41 — winsorized per-group statistics: exact p_lo/p_hi quantiles
    per group, values clamped into [p_lo, p_hi], then the robust mean
    alongside the raw mean and the clipped-row count. The standard
    length/score profiling shape — a handful of 10 MB outlier docs
    otherwise dominate a source's mean and mask drift.

    Scale: quantiles come from ONE grouped ``percentile`` aggregation —
    exact, but memory is O(distinct values) per group (doc lengths and
    quality scores are banded, so this is bounded; for truly unbounded
    value domains swap in approx_percentile with the same plan). The
    clamp pass re-reads the input joined against the tiny per-group
    quantile frame (broadcast — #groups rows), then one ordinary hash
    agg. Two scans, zero wide joins, group parallelism preserved.
    """
    v = F.col(value_col).cast("double")
    q = df.groupBy(group_col).agg(
        F.percentile(v, F.lit(lo)).alias("p_lo"),
        F.percentile(v, F.lit(hi)).alias("p_hi"),
    )
    return (
        df.join(F.broadcast(q), group_col)
        .withColumn("__w", F.least(F.greatest(v, F.col("p_lo")), F.col("p_hi")))
        .groupBy(group_col)
        .agg(
            F.count("*").cast("bigint").alias("n"),
            F.avg(v).alias("raw_mean"),
            F.avg("__w").alias("win_mean"),
            F.min("p_lo").alias("p_lo"),
            F.min("p_hi").alias("p_hi"),
            F.sum(F.when((v < F.col("p_lo")) | (v > F.col("p_hi")), 1).otherwise(0))
            .cast("bigint")
            .alias("n_clipped"),
        )
    )


def bm25_scores(
    df: DataFrame,
    query_terms: tuple[str, ...],
    k1: float = 1.2,
    b: float = 0.75,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """X43 — BM25 retrieval scoring (Robertson/Sparck Jones probabilistic
    model, the Lucene ``k1/b`` variant): score every document against a
    literal bag of query terms. The lexical half of hybrid (BM25 +
    embedding) retrieval — at corpus scale the sparse score prunes the
    candidate set the dense re-ranker pays for.

    idf(t) = ln(1 + (N - df + 0.5) / (df + 0.5));
    score(d) = sum_t idf(t) * tf * (k1+1) / (tf + k1 * (1 - b + b * dl/avgdl)).

    Scale: tokens are filtered to the |Q| query terms BEFORE any wide
    op, so the tf agg shuffles only matching rows (a vanishing fraction
    of the corpus); document frequency aggregates that same tiny frame;
    N and avgdl are a 1-row broadcast. Docs matching no term score 0 and
    are dropped (callers wanting full coverage outer-join on the doc
    dim). No corpus-sized shuffle beyond the per-doc length projection.
    """
    terms = [t for t in query_terms]
    dl = df.select(
        F.col(id_col).alias("id"), token_count(text_col).alias("__dl")
    )
    stats = dl.agg(
        F.count("*").cast("double").alias("__N"),
        F.avg(F.col("__dl").cast("double")).alias("__avgdl"),
    )
    tf = (
        df.select(
            F.col(id_col).alias("id"),
            F.explode(F.split(F.col(text_col), " ")).alias("tok"),
        )
        .filter(F.col("tok").isin(*terms))
        .groupBy("id", "tok")
        .agg(F.count("*").cast("double").alias("__tf"))
    )
    dfreq = tf.groupBy("tok").agg(F.count("*").cast("double").alias("__df"))
    idf = F.log(
        F.lit(1.0) + (F.col("__N") - F.col("__df") + 0.5) / (F.col("__df") + 0.5)
    )
    norm = F.col("__tf") + k1 * (
        F.lit(1.0 - b) + F.lit(b) * F.col("__dl").cast("double") / F.col("__avgdl")
    )
    return (
        tf.join(F.broadcast(dfreq), "tok")
        .join(dl, "id")
        .join(F.broadcast(stats))
        .withColumn("__s", idf * F.col("__tf") * F.lit(k1 + 1.0) / norm)
        .groupBy("id")
        .agg(
            F.count("*").cast("bigint").alias("n_matched"),
            F.sum("__s").alias("score"),
        )
        .withColumnRenamed("id", id_col)
    )


def js_divergence(
    df: DataFrame,
    group_col: str = "source",
    vocab_size: int = 1000,
    text_col: str = "text",
    persist_fn=None,
) -> DataFrame:
    """X44 — per-group Jensen-Shannon divergence from the corpus token
    distribution: the drift/contamination monitor shape — a source whose
    JSD jumps between snapshots changed its content mix (new boilerplate,
    encoding damage, topic shift) even when volume stats look flat.

    Token space = the corpus top-``vocab_size`` vocabulary plus one
    lumped OOV bucket, so the distribution table is (V+1)-row bounded
    regardless of corpus size. For each group P and corpus Q:
    JSD = 0.5*KL(P||M) + 0.5*KL(Q||M), M=(P+Q)/2, in nats. Vocabulary
    terms the group never uses contribute 0.5*q*ln2 — folded in via the
    absent-mass identity (1 - sum_present q) rather than a groups x vocab
    cross join, so no row explosion at any group count.

    Scale: one exploded-token hash agg keyed (group, bucketed-token) —
    map-side combinable; the corpus distribution and per-group totals are
    broadcast-bounded frames; the final reduction is one agg per group.
    """
    from . import skew

    # ONE pass over the exploded tokens: everything downstream (corpus
    # frequency, vocabulary cut, OOV re-bucketing, per-group totals)
    # derives from this (group, token) count table — cardinality
    # #groups x vocabulary, corpus-size independent — instead of
    # re-scanning the corpus per branch (measured: 44 -> ~14 exchanges).
    gt = (
        df.select(
            F.col(group_col).alias("g"),
            F.explode(F.split(F.col(text_col), " ")).alias("tok"),
        )
        .groupBy("g", "tok")
        .agg(F.count("*").alias("__c"))
    )
    # gt feeds the vocabulary cut AND the re-bucketing join; gcounts
    # feeds three derived frames. Spark has no cross-branch common-
    # subplan elimination, so without materialization the exploded agg
    # replays per branch (measured: 64 exchanges vs 14). persist_fn
    # follows the dedup.ppjoin convention — the declared-query path
    # passes queries._cache_scoped for release-on-next-query. Cache
    # lifecycle is CALLER-OWNED (the returned plan references the
    # cached frame): long-lived sessions calling this repeatedly should
    # pass a scoped persist_fn or clearCache() after materializing.
    if persist_fn is None:
        persist_fn = default_persist  # registered; released via release_default_persists
    gt = persist_fn(gt)
    freq = gt.groupBy("tok").agg(F.sum("__c").alias("__cf"))
    vocab = skew.two_phase_topk(
        freq,
        part_cols=[],
        order_cols=[F.col("__cf").desc(), F.col("tok").asc()],
        k=vocab_size,
        bucket_on=F.col("tok"),
    ).select("tok")
    gcounts = (
        gt.join(F.broadcast(vocab.withColumn("__in", F.lit(1))), "tok", "left")
        .select(
            "g",
            F.when(F.col("__in").isNull(), F.lit("__oov__"))
            .otherwise(F.col("tok"))
            .alias("tok"),
            "__c",
        )
        .groupBy("g", "tok")
        .agg(F.sum("__c").alias("__cp"))
    )
    # gcounts is NOT persisted: it derives from the cached gt with one
    # broadcast join + agg over a #groups x vocab bounded frame, cheap
    # to replay per branch (persist_fn may be queries._cache_scoped,
    # which releases prior caches on every call — one call only).
    corpus = gcounts.groupBy("tok").agg(F.sum("__cp").alias("__cq"))
    corpus_tot = corpus.agg(F.sum("__cq").cast("double").alias("__Tq"))
    gtot = gcounts.groupBy("g").agg(F.sum("__cp").cast("double").alias("__Tp"))
    p = F.col("__cp") / F.col("__Tp")
    q = F.col("__cq") / F.col("__Tq")
    m = (p + q) / 2
    present = (
        gcounts.join(F.broadcast(corpus), "tok")
        .join(F.broadcast(corpus_tot))
        .join(gtot, "g")
        .groupBy("g")
        .agg(
            F.sum(0.5 * p * F.log(p / m) + 0.5 * q * F.log(q / m)).alias("__jsd_present"),
            F.sum(q).alias("__q_present"),
            F.sum("__cp").cast("bigint").alias("n_tokens"),
        )
    )
    import math

    return present.select(
        F.col("g").alias(group_col),
        "n_tokens",
        (F.col("__jsd_present") + (F.lit(1.0) - F.col("__q_present")) * F.lit(0.5 * math.log(2.0))).alias("jsd"),
    )


def _char_symbols(word: Column) -> Column:
    """Initial BPE symbol array: one single-character symbol per char.
    Explicit substring transform — ``split(word, '')`` edge behavior
    varies across engines, and the oracle twin must replay the exact
    segmentation."""
    return F.transform(
        F.sequence(F.lit(1), F.greatest(F.length(word), F.lit(1))),
        lambda i: F.substring(word, i, 1),
    )


def bpe_pair_stats(df: DataFrame, text_col: str = "text") -> DataFrame:
    """X45 (counting core) — adjacent character-pair frequencies over the
    word histogram, each pair weighted by its word's corpus count: the
    statistic a BPE/WordPiece trainer maximizes at every merge step.
    Kept separate from :func:`bpe_learn` so the counting machinery has a
    hash-verifiable (non-iterative) surface.

    Scale: ONE corpus pass (the word-frequency hash agg — map-side
    combinable, output is vocabulary-bounded, not corpus-bounded);
    everything after operates on the histogram. This is the real BPE
    trainer shape (sentencepiece trains on word counts, not raw text):
    the 100 TB corpus is touched exactly once regardless of merge count.
    """
    words = (
        df.select(F.explode(F.split(F.col(text_col), " ")).alias("w"))
        .filter(F.length("w") >= 2)
        .groupBy("w")
        .agg(F.count("*").alias("wc"))
    )
    d = words.withColumn("__sym", _char_symbols(F.col("w"))).withColumn(
        "__n", F.size("__sym")
    )
    pairs = d.select(
        F.col("wc"),
        F.explode(
            F.arrays_zip(
                F.slice("__sym", 1, F.col("__n") - 1),
                F.slice("__sym", 2, F.col("__n") - 1),
            )
        ).alias("__z"),
    ).select(
        F.col("__z.0").alias("left"), F.col("__z.1").alias("right"), "wc"
    )
    return pairs.groupBy("left", "right").agg(
        F.sum("wc").cast("bigint").alias("pair_count")
    )


def _merge_fold(sym: Column, left: str, right: str) -> Column:
    """One greedy left-to-right BPE merge pass over a symbol array:
    every adjacent (left, right) occurrence fuses (standard BPE apply
    semantics — "aaa" with merge (a,a) -> ["aa", "a"]). Shared by the
    trainer (:func:`bpe_learn`) and the encoder (:func:`bpe_encode`)
    so apply-time segmentation can never drift from training."""
    joined = left + right
    return F.aggregate(
        sym,
        F.array().cast("array<string>"),
        lambda acc, s: F.when(
            (F.size(acc) > 0)
            & (F.element_at(acc, -1) == left)
            & (s == F.lit(right)),
            F.concat(
                F.slice(acc, 1, F.size(acc) - 1), F.array(F.lit(joined))
            ),
        ).otherwise(F.concat(acc, F.array(s))),
    )


def bpe_learn(
    df: DataFrame, n_merges: int = 8, text_col: str = "text"
) -> DataFrame:
    """X45 — byte-pair-encoding vocabulary induction (Sennrich et al.,
    ACL 2016 — public): learn the top ``n_merges`` merges over the
    corpus. Each round counts adjacent symbol pairs (weighted by word
    frequency), merges the argmax pair left-to-right greedily, repeats.

    Scale: the corpus is scanned ONCE (word-frequency agg); every merge
    round is two bounded jobs over the vocabulary-sized histogram (pair
    agg + 1-row argmax collect, then a row-local re-segmentation
    transform). Driver state is one (left, right) pair per round —
    O(n_merges), the same bounded-control-state contract as the k-means
    trainer. The greedy re-segmentation is an interpreted HOF fold, but
    it folds over word-length symbol arrays on a vocab-bounded frame —
    per the round-6 hashing rule this is NOT a corpus-sized hot path.
    ``localCheckpoint`` truncates the per-round lineage growth (the
    q49/connected_components rule).

    Returns one row per learned merge: (rank, left, right, pair_count).
    """
    words = (
        df.select(F.explode(F.split(F.col(text_col), " ")).alias("w"))
        .filter(F.length("w") >= 2)
        .groupBy("w")
        .agg(F.count("*").alias("wc"))
    )
    cur = words.withColumn("__sym", _char_symbols(F.col("w"))).select("wc", "__sym")
    cur = cur.localCheckpoint(eager=False)
    spark = df.sparkSession
    out_schema = "rank int, left string, right string, pair_count bigint"
    # Size-gated driver path (the q49 connected-components dispatch
    # rule): the merge loop operates on the corpus-CONTRACTED word
    # histogram, so after the one corpus pass the remaining work is
    # n_merges rounds of jobs over a vocabulary-sized frame — pure
    # scheduler overhead when the vocabulary is small. Under the cap
    # (``$SPARK_GRAFT_BPE_DRIVER_VOCAB_CAP`` distinct words, default
    # 100k, 0 disables) collect the symbolized histogram once (the
    # count materializes the checkpoint) and run the identical greedy
    # loop in Python: same pair weighting, same (count desc, left asc,
    # right asc) argmax (UTF-8 byte order == Python code-point order),
    # same left-to-right fold as _merge_fold. Above the cap — a 100 TB
    # corpus's long-tail vocabulary — the distributed loop below runs
    # unchanged. Env ceiling math (VERDICT r14 task 5): a collected
    # vocab row is a word's count + its symbol list (~300-600 B in
    # Python), so the 2M ceiling bounds the driver histogram at ~1 GB
    # worst-case; larger env values clamp rather than authorize a
    # corpus-sized collect (guide §5).
    from ._env import env_capped_int

    cap = env_capped_int("SPARK_GRAFT_BPE_DRIVER_VOCAB_CAP", 100_000, 2_000_000)
    if cap > 0 and cur.count() <= cap:
        vocab = [[int(r["wc"]), list(r["__sym"])] for r in cur.collect()]
        merges = []
        for rank in range(1, n_merges + 1):
            counts: dict = {}
            for wc, sym in vocab:
                for i in range(len(sym) - 1):
                    key = (sym[i], sym[i + 1])
                    counts[key] = counts.get(key, 0) + wc
            if not counts:
                break
            (left, right), cnt = min(
                counts.items(), key=lambda kv: (-kv[1], kv[0][0], kv[0][1])
            )
            merges.append((rank, left, right, int(cnt)))
            joined = left + right
            for entry in vocab:
                sym = entry[1]
                if len(sym) < 2:
                    continue
                acc: list = []
                for s in sym:
                    if acc and acc[-1] == left and s == right:
                        acc[-1] = joined
                    else:
                        acc.append(s)
                entry[1] = acc
        return spark.createDataFrame(merges, out_schema)
    merges = []
    for rank in range(1, n_merges + 1):
        n = F.size("__sym")
        pairs = (
            cur.filter(n >= 2)
            .select(
                "wc",
                F.explode(
                    F.arrays_zip(
                        F.slice("__sym", 1, n - 1), F.slice("__sym", 2, n - 1)
                    )
                ).alias("__z"),
            )
            .select(F.col("__z.0").alias("l"), F.col("__z.1").alias("r"), "wc")
            .groupBy("l", "r")
            .agg(F.sum("wc").alias("c"))
            .orderBy(F.col("c").desc(), F.col("l").asc(), F.col("r").asc())
            .limit(1)
            .collect()
        )
        if not pairs:
            break
        left, right, cnt = pairs[0]["l"], pairs[0]["r"], int(pairs[0]["c"])
        merges.append((rank, left, right, cnt))
        merged = _merge_fold(F.col("__sym"), left, right)
        cur = cur.select("wc", merged.alias("__sym")).localCheckpoint(eager=False)
    return spark.createDataFrame(merges, out_schema)


def bm25_model(
    df: DataFrame,
    query_terms: tuple[str, ...],
    text_col: str = "text",
    id_col: str = "doc_id",
) -> dict:
    """X47 (model extraction) — collect the corpus-side BM25 state for
    :func:`bm25_apply`: per-term idf plus N/avgdl. Bounded driver state
    (|Q| + 2 scalars — the k-means/PQ "model collect" contract), so the
    batch tier can hand it to a stream as literals and re-extract on
    every index compaction without restarting the stream."""
    import math

    dl = df.select(token_count(text_col).alias("__dl"))
    n, avgdl = dl.agg(
        F.count("*").cast("double"), F.avg(F.col("__dl").cast("double"))
    ).first()
    dfreq = {
        r["tok"]: r["df"]
        for r in (
            df.select(
                F.col(id_col).alias("__rid"),
                F.explode(F.split(F.col(text_col), " ")).alias("tok"),
            )
            .filter(F.col("tok").isin(*query_terms))
            .groupBy("tok")
            .agg(F.countDistinct("__rid").cast("double").alias("df"))
            .collect()
        )
    }
    idf = {
        t: math.log(1.0 + (n - dfreq.get(t, 0.0) + 0.5) / (dfreq.get(t, 0.0) + 0.5))
        for t in query_terms
    }
    return {"idf": idf, "avgdl": float(avgdl), "n": float(n)}


def bm25_apply(
    df: DataFrame,
    model: dict,
    k1: float = 1.2,
    b: float = 0.75,
    text_col: str = "text",
) -> DataFrame:
    """X47 — row-local BM25 scoring against a literal model (the
    stream-static leg of X43): term idfs and avgdl ride in the plan as
    literals, tf comes from a per-row array filter, so the whole score
    is a stateless narrow projection — it runs unchanged under
    Structured Streaming (no state store, no watermark) and on the
    batch tier produces values identical to :func:`bm25_scores`
    (pytest-pinned).

    The per-term array filters are interpreted HOF lambdas over |Q|
    terms — per-micro-batch volume, not the corpus-sized batch path
    (which uses the explode + agg form in :func:`bm25_scores`)."""
    toks = F.split(F.col(text_col), " ")
    d = df.withColumn("__toks", toks).withColumn(
        "__dl", F.size("__toks").cast("double")
    )
    norm_tail = F.lit(1.0 - b) + F.lit(b) * F.col("__dl") / F.lit(model["avgdl"])
    score = F.lit(0.0)
    matched = F.lit(0)

    def _is_term(term):
        # single-arg closure: a 2-arg lambda would make Spark bind the
        # second parameter to the ELEMENT INDEX (HOF arity dispatch)
        return lambda x: x == F.lit(term)

    for t, idf in sorted(model["idf"].items()):
        tf = F.size(F.filter(F.col("__toks"), _is_term(t))).cast("double")
        score = score + F.when(
            tf > 0, F.lit(idf) * tf * F.lit(k1 + 1.0) / (tf + F.lit(k1) * norm_tail)
        ).otherwise(F.lit(0.0))
        matched = matched + F.when(tf > 0, 1).otherwise(0)
    return (
        d.withColumn("score", score)
        .withColumn("n_matched", matched.cast("bigint"))
        .drop("__toks", "__dl")
    )


def cms_sketch(
    df: DataFrame, d: int = 4, w: int = 1024, text_col: str = "text"
) -> DataFrame:
    """X50 (sketch build) — count-min sketch of the token stream
    (Cormode & Muthukrishnan 2005): ``d`` md5-derived hash rows x ``w``
    counters. The mergeable frequency summary a streaming/partitioned
    pipeline maintains when the true vocabulary is too big to count
    exactly per window.

    Scale: ONE exploded-token pass; each token emits its d (row, bucket)
    pairs row-locally (posexplode over a d-element literal-hash array),
    then a single map-side-combinable hash agg. The sketch itself is
    d*w rows — constant, broadcastable, and mergeable across partitions
    /snapshots by plain addition (counter-wise sum), which is the whole
    point of the structure. md5-derived buckets replay in any engine.
    """
    tok = F.explode(F.split(F.col(text_col), " ")).alias("tok")
    buckets = F.array(
        *[
            F.pmod(
                F.conv(
                    F.substring(
                        F.md5(F.concat(F.lit(f"{j}:"), F.col("tok"))), 1, 15
                    ),
                    16,
                    10,
                ).cast("long"),
                F.lit(w),
            )
            for j in range(d)
        ]
    )
    return (
        df.select(tok)
        .select(F.posexplode(buckets).alias("j", "bucket"))
        .groupBy("j", "bucket")
        .agg(F.count("*").cast("bigint").alias("c"))
    )


def cms_estimate(
    candidates: DataFrame,
    sketch: DataFrame,
    d: int = 4,
    w: int = 1024,
    tok_col: str = "tok",
) -> DataFrame:
    """X50 (point query) — CMS count estimate for each candidate token:
    min over the d counters the token hashes into. Guarantees (exact,
    engine-replayable here because the hashes are md5-literal):
    est >= true always; est <= true + (e/w)*N with prob 1-e^-d per
    query. ``candidates`` is a bounded frame (heavy-hitter shortlist);
    the d*w sketch is broadcast."""
    buckets = F.array(
        *[
            F.pmod(
                F.conv(
                    F.substring(
                        F.md5(F.concat(F.lit(f"{j}:"), F.col(tok_col))), 1, 15
                    ),
                    16,
                    10,
                ).cast("long"),
                F.lit(w),
            )
            for j in range(d)
        ]
    )
    cand = candidates.select(
        tok_col, F.posexplode(buckets).alias("j", "bucket")
    )
    # LEFT join + coalesce(0): a candidate hashing into a bucket no
    # token ever touched must contribute a ZERO to the min (canonical
    # CMS — an inner join would silently drop the empty counter and
    # overestimate absent tokens)
    return (
        cand.join(F.broadcast(sketch), ["j", "bucket"], "left")
        .groupBy(tok_col)
        .agg(
            F.min(F.coalesce(F.col("c"), F.lit(0)))
            .cast("bigint")
            .alias("cms_est")
        )
    )


def normalize_text(text_col: str = "text") -> Column:
    """X75 — canonical text normalization, the first stage of every
    dedup/tokenize pass: lowercase, non-printable-ASCII characters to
    spaces, whitespace runs collapsed, ends trimmed. Deliberately
    ASCII-scoped (``[^ -~]``): Unicode NFC/NFKC needs ICU and is
    engine-specific, while this exact pipeline is byte-identical in
    Spark (Java regex) and the DuckDB oracle (RE2) — the normalization
    CONTRACT is what matters at 100 TB, the character-class choice is a
    config knob. Pure narrow codegen projection — zero shuffle."""
    return F.trim(
        F.regexp_replace(
            F.regexp_replace(F.lower(F.col(text_col)), r"[^ -~]", " "),
            r" +",
            " ",
        )
    )


def normalized_exact_dedup(
    df: DataFrame, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """X75 — exact dedup AFTER normalization: documents differing only
    in case/whitespace/non-printables collapse into one group (the
    near-trivial dup class exact-hash dedup misses and MinHash
    overpays for). Same single-shuffle digest-group shape as X1."""
    return (
        df.withColumn("__norm", normalize_text(text_col))
        .groupBy(F.md5(F.col("__norm")).alias("norm_hash"))
        .agg(
            F.min(id_col).alias("keep_id"),
            F.count("*").cast("bigint").alias("n_dups"),
            F.min(F.length("__norm")).cast("bigint").alias("n_chars_norm"),
        )
    )


def bpe_word_segments(
    df: DataFrame,
    merges: list[tuple[str, str]],
    text_col: str = "text",
) -> DataFrame:
    """X45 (apply stage) — segment the corpus VOCABULARY with a learned
    merge list: (word, pieces array<string>, n_pieces). The merge folds
    run over the distinct-word frame (vocabulary-sized, never
    corpus-sized — the bpe_learn scale argument), one
    :func:`_merge_fold` pass per merge in rank order, the exact
    training-time segmentation."""
    words = (
        df.select(F.explode(F.split(F.col(text_col), " ")).alias("w"))
        .filter(F.length("w") >= 1)
        .distinct()
    )
    cur = words.withColumn("__sym", _char_symbols(F.col("w")))
    for left, right in merges:
        cur = cur.select(
            "w", _merge_fold(F.col("__sym"), left, right).alias("__sym")
        ).localCheckpoint(eager=False)
    return cur.select(
        "w",
        F.col("__sym").alias("pieces"),
        F.size("__sym").cast("int").alias("n_pieces"),
    )


def bpe_encode(
    df: DataFrame,
    merges: list[tuple[str, str]],
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """X45 (apply stage, corpus rollup) — per-document BPE token counts
    under a learned merge list: the tokenizer-application pass every
    training pipeline runs after vocabulary induction. Composition:
    :func:`bpe_word_segments` segments the VOCABULARY, then a
    (word -> n_pieces) lookup join rolls the corpus up per document —
    the corpus is scanned once and never carries piece arrays. The
    lookup join is left to AQE: a natural-language vocabulary is
    usually broadcastable, but it GROWS with the corpus (heavy tail),
    so no unconditional broadcast hint (the plan-guard rule). Emits
    (id, n_words, n_bpe_tokens, avg pieces per word)."""
    seg = bpe_word_segments(df, merges, text_col).select("w", "n_pieces")
    toks = df.select(
        F.col(id_col), F.explode(F.split(F.col(text_col), " ")).alias("w")
    )
    return (
        toks.join(seg, "w")
        .groupBy(id_col)
        .agg(
            F.count("*").cast("bigint").alias("n_words"),
            F.sum("n_pieces").cast("bigint").alias("n_bpe_tokens"),
        )
        .withColumn(
            "pieces_per_word",
            F.round(F.col("n_bpe_tokens") / F.col("n_words"), 4),
        )
    )


def char_trigrams(text_col: Column) -> Column:
    """Distinct character 3-grams of a string column (positions
    1..len-2), the posting-list key of :func:`substring_search`.
    Pure codegen: sequence + substr(Column, Column) — no UDF."""
    return F.array_distinct(
        F.transform(
            F.sequence(F.lit(1), F.greatest(F.length(text_col) - 2, F.lit(0))),
            lambda i: text_col.substr(i, F.lit(3)),
        )
    )


def substring_search(
    df: DataFrame,
    queries: list[str],
    text_col: str = "text",
    id_col: str = "doc_id",
    max_probe_grams: int = 4,
    persist_fn=None,
) -> DataFrame:
    """X77 — inverted-index substring search (the pg_trgm pattern,
    public): find every (query, doc) where ``query`` occurs verbatim in
    the document, WITHOUT a per-query full corpus scan. Each query must
    be >= 3 chars (the trigram floor).

    Plan: (1) corpus posting list (doc_id, trigram) — one explode of
    the distinct char 3-grams; (2) per-query probe set = its
    ``max_probe_grams`` RAREST trigrams by global document frequency
    (rarer probes -> smaller candidate fan-out; using a SUBSET of the
    query's trigrams keeps the candidate set a SUPERSET of true
    matches, so pruning hot grams is lossless); (3) candidates = docs
    matching ALL probe grams (group count == n_probes — the AND
    pigeonhole); (4) exact ``contains`` verify on candidates only.

    Scale: the posting list is built once for ANY number of queries
    (queries broadcast — a bounded literal set by contract); candidate
    generation is an equi-join on the trigram key whose hot keys are
    pruned by the rarest-probe rule; the contains verify touches only
    candidate rows, never the corpus. The probe pick is a per-query
    row_number window over the (tiny) query-gram frame — no collect.
    The posting list feeds both the df agg and the candidate join and
    is persisted (``persist_fn``, caller-scoped — the ppjoin
    convention).
    """
    if not queries:
        raise ValueError("queries must be non-empty")
    for q in queries:
        if len(q) < 3:
            raise ValueError(f"query {q!r} shorter than the 3-char trigram floor")
    spark = df.sparkSession
    qdf = spark.createDataFrame([(q,) for q in queries], "query string")
    qgrams = qdf.select(
        "query", F.explode(char_trigrams(F.col("query"))).alias("g")
    )
    # Both posting-list consumers (the gram-df agg and the candidate
    # join) only ever touch grams that occur in a QUERY — a bounded
    # literal set by contract — so prune the corpus explode to the
    # query-gram universe before anything else. A broadcast semi-join
    # against the Spark-derived query grams (not a Python-side isin
    # list) guarantees the pruned set uses the exact same gram
    # semantics as the probe frame. Lossless for the gram dfs (a kept
    # gram's count is unchanged by dropping other grams) and for
    # candidates (they only ever join on probe grams). This turns the
    # persisted frame from corpus-grams-sized into matches-sized.
    posting = df.select(
        F.col(id_col).alias("__id"),
        F.explode(char_trigrams(F.col(text_col))).alias("g"),
    ).join(F.broadcast(qgrams.select("g").distinct()), "g", "left_semi")
    # the pruned posting list still feeds the gram-df agg AND the
    # candidate join; persist it (ppjoin convention, caller-scoped) so
    # the corpus-wide trigram explode runs once
    if persist_fn is None:
        persist_fn = default_persist  # registered; released via release_default_persists
    posting = persist_fn(posting)
    gdf = posting.groupBy("g").agg(F.count("*").alias("__df"))
    # rarest-probe pick: join the query grams (a tiny frame) with the
    # corpus gram dfs; grams absent from the corpus get df 0 — they
    # prove zero matches and stay in the probe set (the AND fails fast)
    w = Window.partitionBy("query").orderBy(
        F.col("__df").asc(), F.col("g").asc()
    )
    probes = (
        qgrams.join(gdf, "g", "left")
        .withColumn("__df", F.coalesce("__df", F.lit(0)))
        .withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") <= max_probe_grams)
        .groupBy("query")
        .agg(F.collect_set("g").alias("__probes"), F.count("*").alias("__np"))
        .select("query", F.explode("__probes").alias("g"), "__np")
    )
    cand = (
        posting.join(F.broadcast(probes), "g")
        .groupBy("query", "__id", "__np")
        .agg(F.countDistinct("g").alias("__hits"))
        .filter(F.col("__hits") == F.col("__np"))
        .select("query", "__id")
    )
    verified = (
        cand.join(
            df.select(F.col(id_col).alias("__id"), F.col(text_col).alias("__t")),
            "__id",
        )
        .filter(F.contains(F.col("__t"), F.col("query")))
        .select("query", F.col("__id").alias(id_col))
    )
    return verified


def blocklist_matches(
    df: DataFrame,
    phrases: list[str],
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """X78 — token-sequence blocklist filter (the safety/quality phrase
    scrub every curation pipeline runs): emit (doc_id, phrase) for
    every document whose whitespace token stream contains the phrase's
    token sequence contiguously. One pass for ALL phrases — never N
    regex scans of the corpus.

    Plan: each phrase picks an ANCHOR token — its globally RAREST
    token by corpus document frequency (a bounded collect of
    |distinct phrase tokens| counts, the sanctioned model-state
    shape); the corpus explodes to (doc, pos, token) once; the anchor
    join keys candidates on the anchor token (rare by construction →
    no hot key), and a row-local array-slice comparison verifies the
    full phrase at the anchored offset. Candidate volume is the
    anchor's df, not the corpus.

    Scale: one posexplode + one narrow equi-join on the anchor token +
    zero-shuffle verify; phrase list broadcasts. A phrase made
    entirely of stop-words is the documented worst case (its rarest
    token is still hot) — the fix is the X77 trigram route for those.
    """
    spark = df.sparkSession
    anchors = phrase_anchors(df, phrases, text_col=text_col)
    adf = spark.createDataFrame(
        anchors,
        "phrase string, __anchor string, __off int, __len int, __ptoks array<string>",
    )
    toks_frame = df.select(
        F.col(id_col).alias("__id"), F.split(F.col(text_col), " ").alias("__toks")
    )
    return (
        _blocklist_verdicts(toks_frame, adf)
        .select(F.col("__id").alias(id_col), "phrase")
        .distinct()
    )


def phrase_anchors(
    df: DataFrame, phrases: list[str], text_col: str = "text"
) -> list[tuple]:
    """Batch-side anchor model for the blocklist family: per phrase,
    its globally RAREST token (by corpus document frequency — a
    bounded |distinct phrase tokens| collect, the sanctioned
    model-state shape) with its offset. Returned as plain rows so the
    streaming twin (X83) can embed the model without a corpus scan
    per micro-batch."""
    if not phrases:
        raise ValueError("phrases must be non-empty")
    phrase_toks = {p: p.split(" ") for p in phrases}
    vocab = sorted({t for toks in phrase_toks.values() for t in toks})
    spark = df.sparkSession
    vdf = spark.createDataFrame([(t,) for t in vocab], "__tok string")
    counts = {
        r["__tok"]: r["__n"]
        for r in df.select(
            F.explode(F.split(F.col(text_col), " ")).alias("__tok")
        )
        .join(F.broadcast(vdf), "__tok")
        .groupBy("__tok")
        .agg(F.count("*").alias("__n"))
        .collect()
    }
    anchors = []
    for p, toks in phrase_toks.items():
        # rarest token wins; ties by earliest position (deterministic)
        off, anchor = min(
            enumerate(toks), key=lambda it: (counts.get(it[1], 0), it[0])
        )
        anchors.append((p, anchor, off, len(toks), toks))
    return anchors


def _blocklist_verdicts(toks_frame: DataFrame, adf: DataFrame) -> DataFrame:
    """Shared X78/X83 core: posexplode the token arrays, join on the
    broadcast anchor table, verify the full phrase with a row-local
    array-slice equality at the anchored offset. ``toks_frame`` must
    carry (__id, __toks); emits (__id, __toks, phrase, ...) candidate
    rows (caller projects/dedups)."""
    pos = toks_frame.select(
        "__id", "__toks", F.posexplode("__toks").alias("__pos", "__tok")
    )
    return pos.join(F.broadcast(adf), pos["__tok"] == adf["__anchor"]).filter(
        (F.col("__pos") - F.col("__off") >= 0)
        & (
            F.slice(
                "__toks", F.col("__pos") - F.col("__off") + 1, F.col("__len")
            )
            == F.col("__ptoks")
        )
    )


def pmi_cooccurrence(
    df: DataFrame,
    window: int = 2,
    min_count: int = 5,
    text_col: str = "text",
    persist_fn=None,
) -> DataFrame:
    """X79 — windowed PMI co-occurrence (Church & Hanks 1990, public):
    token pairs within ``window`` positions, scored
    pmi = ln( (n_pair/P) / ((n_a/T) * (n_b/T)) ) with T = total tokens
    and P = total emitted pairs; the association statistic feeding
    collocation mining and embedding-corpus diagnostics. Pairs are
    canonicalized (tok_a <= tok_b); pairs under ``min_count`` drop.

    Plan shape: pair AND unigram events are built ROW-LOCALLY in one
    combined stream — for each offset d in 1..window, zip the token
    array against itself shifted by d (native ``slice`` +
    ``arrays_zip`` — NOT a per-element HOF ``transform`` lambda, which
    Spark interprets element-by-element with two ``element_at`` probes
    and a least/greatest per element; the r14 optimization round moved
    the canonicalization into the post-explode codegen projection,
    where it runs whole-stage-compiled once per emitted event), no
    posexplode self-join on doc_id, concatenated with the unigram
    stream (b = NULL marker), then ONE explode feeds ONE hash agg on
    the (a, b) key. That single vocabulary-sized counts frame is
    persisted (``persist_fn``, the ppjoin convention) and every
    downstream reference — pair counts, unigram counts, the 1-row
    P/T totals — reads the cache. At 100 TB: the corpus is touched
    exactly ONCE, every exchange carries (token-pair, count) rows,
    and there is NO per-doc self-join (the naive form shuffles
    O(len * window) rows per doc on the skewed doc_id key; this
    shape has no doc-keyed exchange at all).
    """
    toks = df.select(F.split(F.col(text_col), " ").alias("__toks"))

    def _pairs_at(d: int) -> Column:
        # zip the array against its d-shifted self with native slice +
        # arrays_zip (one JVM call per ROW, not one interpreted lambda
        # per element). slice length clamps to 0 for short docs, which
        # arrays_zip turns into the empty array. Canonicalization
        # (least/greatest) happens post-explode in codegen.
        n = F.greatest(F.size("__toks") - d, F.lit(0))
        return F.arrays_zip(
            F.slice("__toks", 1, n), F.slice("__toks", 1 + d, n)
        ).cast("array<struct<x:string,y:string>>")

    pair_arrays = [_pairs_at(d) for d in range(1, window + 1)]
    # unigram events ride the same stream with a NULL y-marker, so one
    # explode + one hash agg covers pairs AND unigrams in a single
    # corpus pass
    unigrams = F.arrays_zip(
        F.col("__toks"),
        F.array_repeat(F.lit(None).cast("string"), F.size("__toks")),
    ).cast("array<struct<x:string,y:string>>")
    events = toks.select(
        F.explode(F.concat(*pair_arrays, unigrams)).alias("__p")
    ).select(
        # canonical (tok_a <= tok_b) built HERE, whole-stage-compiled
        # once per emitted event; unigram events keep their NULL marker
        # (least/greatest would otherwise swallow it)
        F.when(
            F.col("__p.y").isNull(), F.col("__p.x")
        ).otherwise(F.least("__p.x", "__p.y")).alias("tok_a"),
        F.when(
            F.col("__p.y").isNull(), F.lit(None).cast("string")
        ).otherwise(F.greatest("__p.x", "__p.y")).alias("tok_b"),
    )
    counts = events.groupBy("tok_a", "tok_b").agg(
        F.count("*").alias("__n")
    )
    if persist_fn is None:
        persist_fn = default_persist  # registered; released via release_default_persists
    counts = persist_fn(counts)
    pair_counts = counts.filter(F.col("tok_b").isNotNull()).select(
        "tok_a", "tok_b", F.col("__n").alias("pair_count")
    )
    uni = counts.filter(F.col("tok_b").isNull()).select(
        F.col("tok_a").alias("tok"), F.col("__n")
    )
    totals = pair_counts.agg(
        F.sum("pair_count").cast("double").alias("__P")
    ).crossJoin(uni.agg(F.sum("__n").cast("double").alias("__T")))
    return (
        pair_counts.filter(F.col("pair_count") >= min_count)
        .join(uni.select(F.col("tok").alias("tok_a"), F.col("__n").alias("__na")), "tok_a")
        .join(uni.select(F.col("tok").alias("tok_b"), F.col("__n").alias("__nb")), "tok_b")
        .crossJoin(F.broadcast(totals))
        .select(
            "tok_a",
            "tok_b",
            F.col("pair_count").cast("bigint").alias("pair_count"),
            F.round(
                F.log(
                    (F.col("pair_count") / F.col("__P"))
                    / ((F.col("__na") / F.col("__T")) * (F.col("__nb") / F.col("__T")))
                ),
                4,
            ).alias("pmi"),
        )
    )


def zipf_fit(
    df: DataFrame,
    text_col: str = "text",
    group_col: str = "source",
    bucket_width: float = 64.0,
    persist_fn=None,
) -> DataFrame:
    """X91 — per-group Zipf rank-frequency fit: OLS of ln(freq) on
    ln(rank) over the token frequency table (Zipf's law, public; the
    slope ~ -1 diagnostic is the standard corpus-health check —
    boilerplate-flooded or synthetic-looped sources bend the log-log
    line, so the (slope, r2) pair is a per-source quality signal a
    100 TB curation pass reads before any sampling decision).

    Scale shape: the corpus contracts FIRST to the vocab-sized
    (group, token, count) frame — one combinable hash agg; ranking by
    descending count rides :func:`..operators.skew.scalable_rank`
    (X88 decomposition on the negated count, tokens tie-break
    ascending), so no single task sorts a whole source's vocabulary;
    the fit is :func:`..operators.stats.grouped_ols` (X53 centered
    form — ln values are O(10), no cancellation). ``persist_fn``
    scopes the vocab-sized frequency frame's cache — rank intra/offset
    and the OLS means/moments stages all read it, and without the
    cache each replays the corpus token explode. Emits
    (group, n, slope, intercept, r2) with n = vocabulary size.
    """
    from . import skew as _skew
    from .stats import grouped_ols

    freq = (
        df.select(
            F.col(group_col).alias(group_col),
            F.explode(
                F.split(F.lower(F.col(text_col)), " ")
            ).alias("__tok"),
        )
        .groupBy(group_col, "__tok")
        .agg(F.count("*").cast("bigint").alias("__c"))
        .withColumn("__negc", -F.col("__c").cast("double"))
    )
    if persist_fn is not None:
        freq = persist_fn(freq)
    ranked = _skew.scalable_rank(
        freq,
        [group_col],
        "__negc",
        "__tok",
        bucket_width=bucket_width,
        out_col="__rnk",
    )
    return grouped_ols(
        ranked,
        group_col,
        x=F.log(F.col("__rnk").cast("double")),
        y=F.log(F.col("__c").cast("double")),
    )


def textrank_keywords(
    docs: DataFrame,
    text_col: str = "text",
    iterations: int = 3,
    damping: float = 0.85,
) -> DataFrame:
    """X135 — TextRank keyword scoring (Mihalcea/Tarau EMNLP 2004 —
    PageRank over the word co-occurrence graph): adjacent-token pairs
    (both directions, distinct) form the directed edge set, then the
    X114 fixed-iteration PageRank runs verbatim — the cross-module
    composition the graph module exists for. Returns every vocabulary
    word with its rank (the caller cuts top-k on the ROUNDED rank with
    a word tiebreak, so the cut is engine-deterministic).

    Scale: edges contract to the vocabulary-pair dictionary before the
    rank loop (corpus-size independent iterations); tokenization is
    the corpus pass, one explode + one lag-free self-zip in the array
    domain (adjacent pairs via row-local transform).
    """
    from .graph import pagerank as _pagerank  # local: avoid module cycle

    toks = docs.select(F.split(F.col(text_col), " ").alias("__t")).filter(
        F.size("__t") >= 2
    )
    pairs = toks.select(
        F.explode(
            F.expr(
                "transform(sequence(1, size(__t) - 1),"
                " i -> struct(__t[i - 1] AS a, __t[i] AS b))"
            )
        ).alias("__p")
    ).select("__p.a", "__p.b").filter(F.col("a") != F.col("b"))
    edges = pairs.unionByName(
        pairs.select(F.col("b").alias("a"), F.col("a").alias("b"))
    ).distinct()
    return _pagerank(
        edges, "a", "b", iterations=iterations, damping=damping
    ).select(F.col("node").alias("word"), "rank")


def stratified_quota_split(
    df: DataFrame,
    stratum_col: str = "lang",
    id_col: str = "doc_id",
    train_frac: float = 0.8,
    val_frac: float = 0.1,
) -> DataFrame:
    """X136 — EXACT-quota stratified train/val/test split: within each
    stratum, rows rank by the md5 hash of their id (deterministic,
    replayable — the q48 convention) and the first ceil(train_frac*n)
    go to train, the next ceil(val_frac*n) to val, the rest to test —
    unlike the q48 hash-bucket split, the per-stratum counts are EXACT
    quotas, not binomial draws (what a small stratum needs to keep its
    eval slice non-empty).

    Scale: ranking rides the X16/X88 scalable_rank decomposition (no
    per-stratum single-task sort); thresholds are row-local arithmetic
    on the broadcast per-stratum totals.
    """
    from ..functions import md5_long60
    from .skew import scalable_rank

    base = df.select(
        F.col(id_col).alias("id"),
        F.col(stratum_col).alias("stratum"),
        md5_long60(F.col(id_col).cast("string")).alias("__h"),
    )
    ranked = scalable_rank(
        base, ["stratum"], "__h", "id", bucket_width=float(1 << 50)
    )
    tot = base.groupBy("stratum").agg(F.count("*").alias("__n"))
    # tot: stratum-dictionary-sized totals
    t1 = F.ceil(F.lit(train_frac) * F.col("__n"))
    t2 = t1 + F.ceil(F.lit(val_frac) * F.col("__n"))
    return (
        ranked.join(F.broadcast(tot), "stratum")
        .select(
            "id",
            "stratum",
            F.when(F.col("rnk") <= t1, F.lit("train"))
            .when(F.col("rnk") <= t2, F.lit("val"))
            .otherwise(F.lit("test"))
            .alias("split"),
        )
    )


def ctfidf_class_terms(
    docs: DataFrame,
    class_col: str = "source",
    text_col: str = "text",
    top_k: int = 5,
    persist_fn=None,
) -> DataFrame:
    """X146 — class-based TF-IDF characteristic terms (Grootendorst's
    c-TF-IDF, the BERTopic labeling statistic — public): treat each
    class as ONE concatenated document; a term's score in class c is
    (tf_{t,c} / tokens_c) * ln(1 + A / tf_t) where A is the average
    token count per class and tf_t the term's corpus frequency — the
    "what makes this cluster/source different" labeling pass that runs
    after any clustering (X23/X65) or on provenance classes directly.

    Determinism: counts are exact integers; the score is two exact-int
    ratios and one ln both engines share; the per-class top-k cut
    orders by (ROUNDED score desc, term) — the q170 rounded-cut rule.

    Scale: one exploded-token hash agg to the (class, term) frame
    (persist_fn-scoped: it feeds class totals, corpus totals and the
    ranking), dictionary-sized margins, and the X16 two-phase top-k —
    no single-task per-class vocabulary sort.
    """
    from .skew import two_phase_topk

    ct = (
        docs.select(
            F.col(class_col).alias("c"),
            F.explode(F.split(F.col(text_col), " ")).alias("t"),
        )
        .groupBy("c", "t")
        .agg(F.count("*").alias("__n"))
    )
    if persist_fn is None:
        persist_fn = default_persist  # registered; released via release_default_persists
    ct = persist_fn(ct)
    ctot = ct.groupBy("c").agg(F.sum("__n").alias("__ctot"))
    ttot = ct.groupBy("t").agg(F.sum("__n").alias("__ttot"))
    avg_row = ctot.agg(F.avg("__ctot").alias("__a"))
    scored = (
        ct.join(F.broadcast(ctot), "c")
        .join(ttot, "t")
        .crossJoin(F.broadcast(avg_row))
        .withColumn(
            "__score",
            F.round(
                (F.col("__n") / F.col("__ctot"))
                * F.log(F.lit(1.0) + F.col("__a") / F.col("__ttot"))
                * 10000,
                4,
            ),
        )
    )
    top = two_phase_topk(
        scored,
        ["c"],
        [F.col("__score").desc(), F.col("t").asc()],
        top_k,
        bucket_on=F.crc32(F.col("t")),
    )
    return top.select(
        F.col("c").alias(class_col),
        F.col("t").alias("term"),
        F.col("rnk").cast("int").alias("rank"),
        F.col("__score").alias("score_x10k"),
    )


def curation_keep_flags(
    docs: "DataFrame",
    text_col: str = "text",
    id_col: str = "doc_id",
    quality_threshold: float = 0.5,
) -> "DataFrame":
    """X27 — the curation funnel's per-document keep flags (raw ->
    exact dedup -> near dedup -> quality gate) as ONE single-pass plan:
    two high-cardinality-key windows (md5 digest, min-shingle-md5
    signature) then a row-local quality gate. Extracted from the q67
    builder (round 10) so the declared stage-count query and the
    composed release-gate pipeline (tests/test_release_gate.py) share
    one copy — the funnel REPORT and the corpus the release actually
    ships must be the same filter by construction, not by parallel
    maintenance.

    Short (<3-token) docs fall back to their exact digest as the
    near-dup key — the funnel must never DROP a doc merely for being
    short (matches near_dedup_stream's contract, and deliberately
    diverges from Q22, which merely excludes them from cluster
    REPORTING).

    Returns the input columns plus n_tok, keep_exact, keep_nd, keep_q.
    Scale: both windows partition by content-derived digests —
    high-cardinality keys, so no single-task sort; the quality gate is
    row-local codegen.
    """
    from pyspark.sql import Window

    from . import dedup

    raw = (
        docs.withColumn("__toks", F.split(F.col(text_col), " "))
        .withColumn("n_tok", F.size("__toks"))
        .withColumn("digest", F.md5(text_col))
        .withColumn(
            "sig",
            F.coalesce(
                F.array_min(
                    F.transform(dedup.shingles_of(F.col("__toks"), 3), F.md5)
                ),
                F.col("digest"),
            ),
        )
        .withColumn("__q", quality_score(text_col))
    )
    w_digest = Window.partitionBy("digest")
    w_sig = Window.partitionBy("sig")
    return (
        raw.withColumn(
            "keep_exact", F.col(id_col) == F.min(id_col).over(w_digest)
        )
        .withColumn(
            "keep_nd",
            F.col("keep_exact")
            & (
                F.col(id_col)
                == F.min(F.when(F.col("keep_exact"), F.col(id_col))).over(w_sig)
            ),
        )
        .withColumn(
            "keep_q", F.col("keep_nd") & (F.col("__q") >= quality_threshold)
        )
        .drop("__toks", "__q")
    )


def dataset_card(docs: "DataFrame", text_col: str = "text") -> "DataFrame":
    """Dataset card — the one-row corpus summary a dataset release
    ships with (docs, exact-dup rate, token total, language/source
    cardinalities, length extremes, median tokens). Extracted from the
    q186 builder (round 10) so the declared query and the composed
    release-gate pipeline card the SAME way. All counts exact
    integers; the median is X100's lower-quantile convention.
    """
    from .stats import weighted_quantile
    from ..functions import dec4

    base = docs.select(
        F.md5(F.coalesce(F.col(text_col), F.lit("\x00"))).alias("__h"),
        F.size(F.split(text_col, " ")).alias("__tok"),
        "lang",
        "source",
        "n_chars",
    )
    agg = base.agg(
        F.count("*").cast("bigint").alias("n_docs"),
        F.count_distinct("__h").cast("bigint").alias("n_unique_texts"),
        F.sum("__tok").cast("bigint").alias("n_tokens"),
        F.count_distinct("lang").cast("bigint").alias("n_langs"),
        F.count_distinct("source").cast("bigint").alias("n_sources"),
        F.min("n_chars").cast("bigint").alias("min_chars"),
        F.max("n_chars").cast("bigint").alias("max_chars"),
    )
    # re-aggregate the (0-or-1)-row quantile frame to EXACTLY one row:
    # an empty corpus otherwise collapses the crossJoin to zero rows,
    # breaking the one-row card contract (and the release-gate caller's
    # collect()[0]) — round-10 review; the card of an empty corpus is
    # all-zero counts with NULL median/dup_rate/min/max.
    med = (
        weighted_quantile(
            base.withColumn("__one", F.lit(1.0)),
            [],
            "__tok",
            "__one",
            quantiles=((1, 2),),
        )
        .agg(F.max("wq_1_2").cast("bigint").alias("median_tokens"))
    )
    return (
        agg.crossJoin(F.broadcast(med))
        .select(
            "n_docs",
            "n_unique_texts",
            # NULL (not 0/0) on an empty corpus — the ANSI
            # degenerate-input contract (docs/SCALE.md round 9)
            F.when(
                F.col("n_docs") > 0,
                F.lit(1.0) - F.col("n_unique_texts") / F.col("n_docs"),
            ).alias("__dup"),
            "n_tokens",
            "median_tokens",
            "n_langs",
            "n_sources",
            "min_chars",
            "max_chars",
        )
        .select(
            "n_docs", "n_unique_texts",
            dec4("__dup").alias("dup_rate"),
            "n_tokens", "median_tokens", "n_langs", "n_sources",
            "min_chars", "max_chars",
        )
    )


# --- X162/X163: URL canonicalization + per-domain curation (round 11).
# Web corpora dedup on URLs before they dedup on text: the same page
# arrives as http://WWW.Site.com:80/a?utm_source=x&b=2&a=1#frag and
# https://www.site.com/a?a=1&b=2. Pure Column work (regexp + HOF
# filter/sort) — zero shuffle until the caller's rollup, replayable in
# ANSI SQL (list_filter/list_sort), no Python in the hot path.

# Tracking parameters stripped by canonicalization: the utm_* family
# plus the common click identifiers. Deliberately small and hard-coded
# (deterministic; callers pass their own list for site-specific noise).
TRACKING_PARAMS = (
    "gclid", "fbclid", "msclkid", "mc_eid", "igshid", "ref", "ref_src",
)


def url_canonicalize(
    url_col: str | Column = "url",
    tracking_params: tuple[str, ...] = TRACKING_PARAMS,
) -> Column:
    """Canonical form of an absolute http(s)-style URL (RFC 3986
    syntax-based normalization, public): lowercase scheme and host,
    strip userinfo / fragment / trailing host dot, drop the scheme's
    default port (http:80, https:443), empty path -> "/", drop
    tracking query params (``utm_*`` + *tracking_params*), and sort
    the surviving params so equivalent orderings collide. Percent-
    decoding and dot-segment collapse are deliberately OUT of scope
    (they require table-driven decoding that plain SQL replay can't
    mirror byte-for-byte; syntax-based normalization is the
    dedup-safe subset). Malformed URLs (no scheme://) canonicalize to
    NULL so callers can quarantine them."""
    u = F.col(url_col) if isinstance(url_col, str) else url_col
    scheme = F.lower(F.regexp_extract(u, r"^([A-Za-z][A-Za-z0-9+.-]*)://", 1))
    auth = F.regexp_extract(u, r"^[A-Za-z][A-Za-z0-9+.-]*://([^/?#]*)", 1)
    hostport = F.regexp_extract(auth, r"([^@]*)$", 1)  # strip userinfo
    host = F.regexp_replace(
        F.lower(F.regexp_extract(hostport, r"^([^:]*)", 1)), r"\.$", ""
    )
    port = F.regexp_extract(hostport, r":([0-9]+)$", 1)
    path = F.regexp_extract(u, r"^[A-Za-z][A-Za-z0-9+.-]*://[^/?#]*([^?#]*)", 1)
    nofrag = F.regexp_replace(u, r"#.*$", "")
    query = F.regexp_extract(nofrag, r"\?(.*)$", 1)

    def keep(p: Column) -> Column:
        key = F.lower(F.split(p, "=").getItem(0))
        return (
            (p != "")
            & ~key.startswith("utm_")
            & ~key.isin(*tracking_params)
        )

    params = F.array_sort(F.filter(F.split(query, "&"), keep))
    port_part = F.when(
        (port == "")
        | ((scheme == F.lit("http")) & (port == "80"))
        | ((scheme == F.lit("https")) & (port == "443")),
        F.lit(""),
    ).otherwise(F.concat(F.lit(":"), port))
    canon = F.concat(
        scheme,
        F.lit("://"),
        host,
        port_part,
        F.when(path == "", F.lit("/")).otherwise(path),
        F.when(F.size(params) > 0,
               F.concat(F.lit("?"), F.array_join(params, "&"))
               ).otherwise(F.lit("")),
    )
    return F.when((scheme != "") & (host != ""), canon).otherwise(
        F.lit(None).cast("string")
    )


def url_domain(url_col: str | Column = "url") -> Column:
    """Last-two-labels domain of the canonical host (site.com from
    www.site.com). FALLBACK ONLY: co.uk-style multi-label suffixes
    need the public-suffix list, which this Column-level form cannot
    join (shipping a partial copy would silently mis-group — the
    PPM-maxval rule applied to text). Pipelines that have the PSL
    should use :func:`with_url_domain` / pass ``psl_df`` to
    :func:`domain_curation_stats`, which do longest-suffix matching
    against the caller-supplied table and fall back to this heuristic
    only for hosts no rule covers."""
    canon = url_canonicalize(url_col)
    host = F.regexp_extract(canon, r"^[a-z][a-z0-9+.-]*://([^:/?#]*)", 1)
    return F.when(
        canon.isNotNull(), F.regexp_extract(host, r"([^.]+\.[^.]+)$", 1)
    ).otherwise(F.lit(None).cast("string"))


def with_url_domain(
    df: DataFrame,
    psl_df: DataFrame,
    url_col: str = "url",
    out_col: str = "domain",
    max_suffix_labels: int = 4,
) -> DataFrame:
    """Registrable domain (PSL rules) as a new column, from a
    CALLER-SUPPLIED public-suffix table — the engine bundles no data
    (VERDICT r11 task 6). ``psl_df`` has one string column ``suffix``:
    plain rules from the public suffix list (lowercase, no leading
    dot, e.g. 'com', 'co.uk', 'com.au'); wildcard ('*.ck') and
    exception ('!www.ck') rules are caller-preprocessing — expand or
    drop them before the call.

    Longest-match-wins semantics: the host's trailing i labels
    (i = ``max_suffix_labels`` .. 1 — the real PSL's longest plain
    rule has 4) are each matched against the rules having EXACTLY i
    labels, and the domain is the matched suffix plus one more label.
    A host that IS a public suffix (nothing registrable) yields NULL;
    a host matching no rule falls back to the :func:`url_domain`
    two-label heuristic, so a partial PSL degrades gracefully instead
    of silently flipping grouping semantics.

    Scale shape: ``max_suffix_labels`` BROADCAST hash joins against
    label-count slices of the (few-thousand-row) PSL table — a narrow
    per-row pipeline, no shuffle, no explode; the URL column never
    fans out."""
    canon = url_canonicalize(url_col)
    host = F.regexp_extract(canon, r"^[a-z][a-z0-9+.-]*://([^:/?#]*)", 1)
    labels = F.split(host, r"\.")

    out = df.withColumn("__labels", F.when(canon.isNotNull(), labels))
    n = F.size("__labels")
    psl = psl_df.select(F.lower(F.col("suffix")).alias("__sfx")).withColumn(
        "__sfx_labels", F.size(F.split("__sfx", r"\."))
    )
    for i in range(max_suffix_labels, 0, -1):
        rules_i = psl.filter(F.col("__sfx_labels") == i).select(
            F.col("__sfx").alias(f"__sfx{i}"),
        ).distinct()
        cand = F.when(
            n >= i, F.array_join(F.slice("__labels", n - i + 1, i), ".")
        )
        out = out.withColumn(f"__cand{i}", cand).join(
            F.broadcast(rules_i),
            F.col(f"__cand{i}") == F.col(f"__sfx{i}"),
            "left",
        )
    # longest matched suffix wins; suffix == host -> NULL (nothing
    # registrable); no rule matched -> two-label heuristic fallback
    best = F.coalesce(*[
        F.when(F.col(f"__sfx{i}").isNotNull(), F.lit(i))
        for i in range(max_suffix_labels, 0, -1)
    ])
    domain = F.when(
        best.isNotNull() & (n > best),
        F.array_join(F.slice("__labels", n - best, best + 1), "."),
    )
    result = F.when(best.isNotNull(), domain).otherwise(
        F.when(F.col("__labels").isNotNull(), url_domain(url_col))
    )
    drop = ["__labels"] + [f"__cand{i}" for i in range(1, max_suffix_labels + 1)]
    drop += [f"__sfx{i}" for i in range(1, max_suffix_labels + 1)]
    return out.withColumn(out_col, result).drop(*drop)


def domain_curation_stats(
    df: DataFrame, url_col: str = "url", quota: int = 0,
    with_sample: bool = False, psl_df: DataFrame | None = None,
) -> DataFrame:
    """Per-domain curation rollup over a URL column: raw URL count,
    distinct canonical URLs (URL-level dup rate is raw/distinct), NULL
    (malformed) count, when ``quota`` > 0 how many rows a per-domain
    quota would keep (the domain-cap sampling every web corpus applies
    so megasites don't dominate the mixture), and with ``with_sample``
    the lexicographically-first canonical URL as an inspectable
    exemplar. With ``psl_df`` (a caller-supplied public-suffix table,
    see :func:`with_url_domain`) the grouping key is the PSL
    registrable domain — co.uk/com.au sites group correctly — at the
    cost of ``max_suffix_labels`` extra BROADCAST joins; without it
    the key is the two-label :func:`url_domain` heuristic (the
    documented fallback). ONE hash aggregation on the domain key
    either way; canonicalization is a narrow projection, so the
    shuffle carries only (domain, canonical digest) — never the page
    payload."""
    if psl_df is not None:
        base = with_url_domain(df, psl_df, url_col, "domain").select(
            "domain", url_canonicalize(url_col).alias("canonical_url")
        )
    else:
        base = df.select(
            url_domain(url_col).alias("domain"),
            url_canonicalize(url_col).alias("canonical_url"),
        )
    aggs = [
        F.count("*").cast("bigint").alias("n_urls"),
        F.count("canonical_url").cast("bigint").alias("n_parsed"),
        F.countDistinct("canonical_url").cast("bigint").alias("n_canonical"),
    ]
    if with_sample:
        aggs.append(F.min("canonical_url").alias("sample_url"))
    agg = base.groupBy("domain").agg(*aggs)
    cols = [
        F.col("domain"),
        F.col("n_urls"),
        (F.col("n_urls") - F.col("n_parsed")).alias("n_malformed"),
        F.col("n_canonical"),
    ]
    if quota > 0:
        cols.append(
            F.least(F.col("n_canonical"), F.lit(quota))
            .cast("bigint")
            .alias("n_kept_under_quota")
        )
    if with_sample:
        cols.append(F.col("sample_url"))
    return agg.select(*cols)


# --- X164: HTML -> text extraction (round 11). Web-corpus ingest
# sees markup, not prose; quality scoring over raw HTML mis-ranks
# every page. Pure chained regexp_replace (codegen'd, zero shuffle),
# each pattern RE2-compatible so a plain-SQL oracle can replay it
# (no backreferences — script/style handled as separate patterns).

def html_to_text(text_col: str | Column = "text") -> Column:
    """Markup-stripped text of an HTML document: drop <script>/<style>
    blocks and comments wholesale, replace every remaining tag with a
    space, decode the six ubiquitous named entities (&amp; &lt; &gt;
    &quot; &#39; &nbsp;), and squeeze whitespace. Numeric character
    references and the long tail of named entities are deliberately
    OUT of scope — decoding them needs the full entity table and
    char() arithmetic that plain-SQL replay can't mirror, and they are
    rare enough in body text that quality metrics don't move. NOT a
    sanitizer: this is a feature/ingest transform, never a security
    boundary."""
    t = F.col(text_col) if isinstance(text_col, str) else text_col
    t = F.regexp_replace(t, r"(?is)<script[^>]*>.*?</script>", " ")
    t = F.regexp_replace(t, r"(?is)<style[^>]*>.*?</style>", " ")
    t = F.regexp_replace(t, r"(?s)<!--.*?-->", " ")
    t = F.regexp_replace(t, r"<[^>]*>", " ")
    for ent, rep in (("&lt;", "<"), ("&gt;", ">"), ("&quot;", "\""),
                     ("&#39;", "'"), ("&nbsp;", " "), ("&amp;", "&")):
        t = F.replace(t, F.lit(ent), F.lit(rep))
    # explicit whitespace class instead of \s: Java \s includes
    # vertical tab, RE2 (the DuckDB oracle) does not — the literal
    # class is the one squeeze both engines execute identically
    return F.trim(F.regexp_replace(t, r"[ \t\n\r\f\x0b]+", " "))


def markup_density(text_col: str | Column = "text") -> Column:
    """Fraction of the document consumed by markup: 1 - len(extracted
    text)/len(raw). The standard cheap boilerplate signal — a nav-and-
    chrome page scores near 1, an article near 0 — used as a keep/drop
    feature alongside the X4 quality scores."""
    t = F.col(text_col) if isinstance(text_col, str) else text_col
    raw_len = F.length(t)
    return F.when(raw_len > 0,
                  1.0 - F.length(html_to_text(t)) / raw_len.cast("double")
                  ).otherwise(F.lit(0.0))


# --- X175: typographic entity decoding (round 12). html_to_text
# (X164) deliberately decodes only the six ubiquitous named entities;
# VERDICT r11 flagged the residue — real pages carry typographic
# references (&#8217; / &#x2019; / &rsquo;) that survive extraction,
# inflate token counts, and split words at quote boundaries. Decoding
# the FULL entity table needs char() codepoint arithmetic plain-SQL
# replay can't mirror (the PPM-maxval rule), but the head of the
# distribution is tiny: a bounded, documented table of the common
# typographic/currency/letter entities in ALL THREE spellings (named,
# decimal, hex — case-insensitive) covers the overwhelming share of
# body-text references in web corpora. One chained, codegen'd
# regexp_replace per TARGET character; the residue counter measures
# honestly what the bounded table did not decode.

_TYPO_ENTITIES: tuple[tuple[str, str], ...] = (
    (r"(?i)(&rsquo;|&#8217;|&#x2019;|&apos;)", "'"),
    (r"(?i)(&lsquo;|&#8216;|&#x2018;)", "'"),
    (r"(?i)(&rdquo;|&#8221;|&#x201d;)", '"'),
    (r"(?i)(&ldquo;|&#8220;|&#x201c;)", '"'),
    (r"(?i)(&mdash;|&#8212;|&#x2014;)", "\u2014"),
    (r"(?i)(&ndash;|&#8211;|&#x2013;)", "\u2013"),
    (r"(?i)(&hellip;|&#8230;|&#x2026;)", "\u2026"),
    (r"(?i)(&bull;|&#8226;|&#x2022;)", "\u2022"),
    (r"(?i)(&middot;|&#183;|&#xb7;)", "\u00b7"),
    (r"(?i)(&laquo;|&#171;|&#xab;)", "\u00ab"),
    (r"(?i)(&raquo;|&#187;|&#xbb;)", "\u00bb"),
    (r"(?i)(&deg;|&#176;|&#xb0;)", "\u00b0"),
    (r"(?i)(&plusmn;|&#177;|&#xb1;)", "\u00b1"),
    (r"(?i)(&times;|&#215;|&#xd7;)", "\u00d7"),
    (r"(?i)(&divide;|&#247;|&#xf7;)", "\u00f7"),
    (r"(?i)(&frac12;|&#189;|&#xbd;)", "\u00bd"),
    (r"(?i)(&frac14;|&#188;|&#xbc;)", "\u00bc"),
    (r"(?i)(&frac34;|&#190;|&#xbe;)", "\u00be"),
    (r"(?i)(&trade;|&#8482;|&#x2122;)", "\u2122"),
    (r"(?i)(&copy;|&#169;|&#xa9;)", "\u00a9"),
    (r"(?i)(&reg;|&#174;|&#xae;)", "\u00ae"),
    (r"(?i)(&euro;|&#8364;|&#x20ac;)", "\u20ac"),
    (r"(?i)(&pound;|&#163;|&#xa3;)", "\u00a3"),
    (r"(?i)(&yen;|&#165;|&#xa5;)", "\u00a5"),
    (r"(?i)(&cent;|&#162;|&#xa2;)", "\u00a2"),
    (r"(?i)(&sect;|&#167;|&#xa7;)", "\u00a7"),
    (r"(?i)(&para;|&#182;|&#xb6;)", "\u00b6"),
    (r"(?i)(&dagger;|&#8224;|&#x2020;)", "\u2020"),
    (r"(?i)(&permil;|&#8240;|&#x2030;)", "\u2030"),
    (r"(?i)(&prime;|&#8242;|&#x2032;)", "\u2032"),
    # the numeric twins of the X164 named six (pages mix freely)
    (r"(?i)(&#160;|&#xa0;)", "\u00a0"),
    (r"(?i)(&#34;|&#x22;)", '"'),
    (r"(?i)(&#60;|&#x3c;)", "<"),
    (r"(?i)(&#62;|&#x3e;)", ">"),
    # common accented letters (the Latin-1 head of body-text usage)
    (r"(?i)(&eacute;|&#233;|&#xe9;)", "\u00e9"),
    (r"(?i)(&egrave;|&#232;|&#xe8;)", "\u00e8"),
    (r"(?i)(&agrave;|&#224;|&#xe0;)", "\u00e0"),
    (r"(?i)(&ccedil;|&#231;|&#xe7;)", "\u00e7"),
    (r"(?i)(&ntilde;|&#241;|&#xf1;)", "\u00f1"),
    (r"(?i)(&auml;|&#228;|&#xe4;)", "\u00e4"),
    (r"(?i)(&ouml;|&#246;|&#xf6;)", "\u00f6"),
    (r"(?i)(&uuml;|&#252;|&#xfc;)", "\u00fc"),
    (r"(?i)(&szlig;|&#223;|&#xdf;)", "\u00df"),
    # invisible/format junk decodes to NOTHING (pollutes tokenizers)
    (r"(?i)(&shy;|&#173;|&#xad;)", ""),
    (r"(?i)(&zwnj;|&#8204;|&#x200c;)", ""),
    (r"(?i)(&#8203;|&#x200b;)", ""),
    # ampersand LAST (the X164 double-decode hazard, numeric twins)
    (r"(?i)(&#38;|&#x26;)", "&"),
)

_ENTITY_RESIDUE_RE = (
    "&(#[0-9]{1,7}|#[xX][0-9a-fA-F]{1,6}|[a-zA-Z][a-zA-Z0-9]{1,31});"
)


def decode_typographic_entities(text_col: str | Column = "text") -> Column:
    """Text with the bounded common-typography entity table decoded —
    each target character in all three spellings (named, decimal
    &#NNNN;, hex &#xHHHH;, case-insensitive). Designed to compose
    AFTER :func:`html_to_text` (which decodes &amp; last, so
    double-encoded &amp;#8217; becomes &#8217; and lands here). The
    long tail stays undecoded by design — full coverage needs char()
    codepoint arithmetic plain SQL can't replay — and is measured by
    :func:`entity_residue_count` instead of silently guessed at."""
    t = F.col(text_col) if isinstance(text_col, str) else text_col
    for pat, rep in _TYPO_ENTITIES:
        t = F.regexp_replace(t, pat, rep)
    return t


def entity_residue_count(text_col: str | Column = "text") -> Column:
    """How many character-reference-shaped tokens remain (named,
    decimal, or hex form) — the honest gap meter for the bounded
    X175 table: route high-residue documents to a library-backed
    re-extract instead of pretending the table was complete."""
    t = F.col(text_col) if isinstance(text_col, str) else text_col
    return F.size(
        F.regexp_extract_all(t, F.lit(_ENTITY_RESIDUE_RE), 0)
    ).cast("bigint")


# --- X176: code-corpus quality signals (round 12). Code is the other
# half of a modern training mixture, and its curation filters are
# published and simple (the Codex-paper / BigCode-pipeline heuristics:
# line-length caps, alphanumeric fraction, autogenerated markers,
# embedded data blobs, comment density) — all row-local string math,
# so the whole family is one whole-stage-codegen narrow projection:
# zero shuffle, zero Python, runs over all 100 TB like X39.

# explicit leading-whitespace class (not \s): Java \s includes
# vertical tab, RE2 (the q197 oracle) does not
_CODE_COMMENT_RE = r"^[ \t\r\f\x0b]*(//|#|;|--|\*|/\*)"
_AUTOGEN_RE = r"(?i)(auto[- ]?generated|generated by|do not edit)"
_BASE64_BLOB_RE = r"[A-Za-z0-9+/=]{64,}"


def code_quality_signals(
    df: DataFrame,
    text_col: str = "text",
    max_line_cap: int = 1000,
    mean_line_cap: float = 100.0,
    min_alnum_frac: float = 0.25,
) -> DataFrame:
    """X176 — per-file code-quality signals and the standard keep
    verdict (defaults are the published Codex-paper thresholds: max
    line <= 1000, mean line <= 100, alphanumeric fraction >= 0.25, no
    autogenerated marker): line geometry, alphanumeric fraction,
    language-agnostic comment-line fraction (lines opening with
    ``// # ; -- * /*``), autogenerated-file marker, and embedded
    base64-blob detection (64+ chars of [A-Za-z0-9+/=] — minified
    bundles and inlined assets, the classic code-corpus pollutant).
    The line array is materialized ONCE as a column before any
    higher-order function touches it (HOF lambda bodies re-evaluate
    per element — the shingles_of lesson). Lines split on \\r?\\n so
    CRLF corpora don't count the trailing \\r in the line geometry
    (the mean is integer-exact: summed line lengths over lines, not
    total-chars-minus-separators, which would be wrong once
    separators are 2 chars wide)."""
    t = F.col(text_col)
    n_chars = F.greatest(F.length(t), F.lit(1))
    out = df.withColumn("__lines", F.split(t, r"\r?\n"))
    n_lines = F.size("__lines")
    max_line_len = F.array_max(
        F.transform("__lines", lambda ln: F.length(ln))
    )
    mean_line_len = (
        F.aggregate(
            "__lines",
            F.lit(0).cast("bigint"),
            lambda acc, ln: acc + F.length(ln),
        )
        / n_lines.cast("double")
    )
    frac_alnum = (
        F.length(F.regexp_replace(t, r"[^A-Za-z0-9]", "")).cast("double")
        / n_chars
    )
    comment_frac = (
        F.size(F.filter("__lines", lambda ln: ln.rlike(_CODE_COMMENT_RE)))
        .cast("double") / n_lines
    )
    autogen = t.rlike(_AUTOGEN_RE)
    blob = t.rlike(_BASE64_BLOB_RE)
    keep = (
        (max_line_len <= max_line_cap)
        & (mean_line_len <= mean_line_cap)
        & (frac_alnum >= min_alnum_frac)
        & ~autogen
    )
    return out.select(
        *df.columns,
        n_lines.cast("bigint").alias("n_lines"),
        max_line_len.cast("bigint").alias("max_line_len"),
        mean_line_len.alias("mean_line_len"),
        frac_alnum.alias("frac_alnum"),
        comment_frac.alias("comment_line_frac"),
        autogen.alias("has_autogen_marker"),
        blob.alias("has_base64_blob"),
        keep.alias("code_keep"),
    )


# --- X177: Unicode script profile (round 12). Language-ID (X31) is a
# trained-ish n-gram heuristic; the SCRIPT mix is the cheaper, exact
# upstream signal (a "French" doc that is 40% CJK is mislabeled or
# mixed, and CJK token budgets differ 3-4x from Latin). Nine block
# counters, each one codegen regexp pass; dominant script via a
# struct-array max — row-local, zero shuffle, SQL-replayable blocks.

_SCRIPT_BLOCKS: tuple[tuple[str, str], ...] = (
    ("latin", "[A-Za-z\u00c0-\u00d6\u00d8-\u00f6\u00f8-\u024f]"),
    ("cyrillic", "[\u0400-\u04ff]"),
    ("greek", "[\u0370-\u03ff]"),
    ("arabic", "[\u0600-\u06ff]"),
    ("hebrew", "[\u0590-\u05ff]"),
    ("devanagari", "[\u0900-\u097f]"),
    ("cjk", "[\u4e00-\u9fff]"),
    ("hangul", "[\uac00-\ud7af]"),
    ("kana", "[\u3040-\u30ff]"),
)


def script_profile(df: DataFrame, text_col: str = "text") -> DataFrame:
    """X177 — per-document Unicode-script mix: one ``frac_<script>``
    column per block (fraction of SCRIPT-letter mass, so punctuation/
    digits/whitespace don't dilute the signal), ``script_letter_frac``
    (script letters over all chars — near 0 means symbol soup), and
    ``dominant_script`` (max letter mass; ``none`` when no script
    letter appears; ties break lexicographically-last via the struct
    compare, deterministically)."""
    t = F.col(text_col)
    counts = {
        name: F.length(t) - F.length(F.regexp_replace(t, pat, ""))
        for name, pat in _SCRIPT_BLOCKS
    }
    total_letters = None
    for c in counts.values():
        total_letters = c if total_letters is None else total_letters + c
    denom = F.greatest(total_letters, F.lit(1)).cast("double")
    best = F.array_max(F.array(*[
        F.struct(c.alias("n"), F.lit(name).alias("s"))
        for name, c in counts.items()
    ]))
    return df.select(
        *df.columns,
        *[
            (counts[name] / denom).alias(f"frac_{name}")
            for name, _ in _SCRIPT_BLOCKS
        ],
        total_letters.cast("bigint").alias("script_letters"),
        (total_letters / F.greatest(F.length(t), F.lit(1)).cast("double"))
        .alias("script_letter_frac"),
        F.when(total_letters > 0, best.getField("s"))
        .otherwise(F.lit("none"))
        .alias("dominant_script"),
    )


# --- X178: availability-capped mixture allocation (round 12). The
# X14 mixing weights assume every source can supply its target share;
# real mixtures can't (the high-quality source is the SMALL one), so
# production pipelines solve the capped allocation: waterfill the
# token budget over target weights, cap each source at max_epochs x
# its availability, and redistribute the excess over the uncapped
# remainder. Deterministic, terminates in <= n_sources rounds.
# Scale shape: the per-source frame is bounded by construction
# (sources are a curated list, not corpus-scale), so the solve is a
# sanctioned driver-side loop on collected counts — the same
# model-state contract as the k-means/PQ trainers; corpus rows are
# touched only by the upstream count aggregation the caller provides.


def mixture_allocation(
    available: DataFrame,
    target_weights: dict[str, float],
    total_tokens: int,
    max_epochs: float = 1.0,
    source_col: str = "source",
    tokens_col: str = "n_tokens",
) -> DataFrame:
    """Waterfilled token allocation per source: each round gives every
    ACTIVE source its renormalized target share of the remaining
    budget; sources that would exceed ``max_epochs x available`` are
    frozen at their cap and their demand is redistributed. Returns
    (source, available, target_weight, allocated, epochs, capped) —
    ``allocated`` sums to ``total_tokens`` unless the whole corpus
    caps out first (then it sums to the total capacity and every row
    is capped: the caller's signal to lower the budget or raise
    max_epochs). Sources absent from ``target_weights`` get weight 0
    and allocate nothing (kept in the output so the mixture report is
    complete)."""
    rows = available.select(
        F.col(source_col).alias("source"),
        F.col(tokens_col).cast("double").alias("avail"),
    ).collect()
    if total_tokens < 0 or max_epochs <= 0:
        raise ValueError("total_tokens must be >= 0 and max_epochs > 0")
    avail = {r["source"]: float(r["avail"]) for r in rows}
    cap = {s: max_epochs * a for s, a in avail.items()}
    w = {s: float(target_weights.get(s, 0.0)) for s in avail}
    if any(x < 0 for x in w.values()):
        raise ValueError("target weights must be non-negative")

    alloc = {s: 0.0 for s in avail}
    active = {s for s in avail if w[s] > 0}
    remaining = float(total_tokens)
    while remaining > 1e-9 and active:
        wsum = sum(w[s] for s in active)
        want = {s: remaining * w[s] / wsum for s in active}
        over = {s for s in active if alloc[s] + want[s] >= cap[s] - 1e-9}
        if not over:
            for s in active:
                alloc[s] += want[s]
            break
        for s in over:
            remaining -= cap[s] - alloc[s]
            alloc[s] = cap[s]
        active -= over
    spark = available.sparkSession
    out = [
        (
            s,
            int(avail[s]),
            w[s],
            int(round(alloc[s])),
            (alloc[s] / avail[s]) if avail[s] > 0 else 0.0,
            bool(abs(alloc[s] - cap[s]) <= 1e-6 and w[s] > 0),
        )
        for s in sorted(avail)
    ]
    return spark.createDataFrame(
        out,
        "source string, available bigint, target_weight double, "
        "allocated bigint, epochs double, capped boolean",
    )


# --- X179: robots-meta directives (round 12). Web-corpus compliance
# filtering: pages that declare <meta name=robots content=noindex>
# (or x-robots variants in markup) are excluded from indexes and most
# curated corpora honor the same signal. Extraction heuristic, not a
# parser: both attribute orders, any quote style, case-insensitive —
# all RE2-compatible alternations, zero shuffle.

_META_ROBOTS_RES = (
    # name=robots ... content="VALUE" (quoted: value may hold spaces).
    # The [\"'\s] boundary after robots rejects name=robots-custom /
    # name=robotsxyz prefixes (quoted names close with a quote,
    # unquoted legal HTML values end at whitespace); name-first
    # patterns deliberately exclude > from the boundary class so a
    # match can never leak across the tag's closing > into a
    # neighboring meta tag's content attribute.
    r"(?i)<meta[^>]*name\s*=\s*[\"']?robots[\"'\s][^>]*"
    r"content\s*=\s*[\"']([^\"'>]*)",
    # content="VALUE" ... name=robots (name last: the boundary also
    # admits the tag terminators > and /)
    r"(?i)<meta[^>]*content\s*=\s*[\"']([^\"'>]*)[\"'][^>]*"
    r"name\s*=\s*[\"']?robots[\"'\s/>]",
    # unquoted content values (legal HTML: content=noindex) — the
    # value char class excludes quotes, so quoted tags never
    # double-match these
    r"(?i)<meta[^>]*name\s*=\s*[\"']?robots[\"'\s][^>]*"
    r"content\s*=\s*([^\s\"'>]+)",
    r"(?i)<meta[^>]*content\s*=\s*([^\s\"'>]+)[^>]*"
    r"name\s*=\s*[\"']?robots[\"'\s/>]",
)


def html_meta_robots(text_col: str | Column = "text") -> Column:
    """Sorted distinct lowercase robots directives from every robots
    meta tag in the document (both attribute orders) — empty array
    when none. Trimmed on comma boundaries, so 'NOINDEX, nofollow'
    yields ['nofollow', 'noindex']."""
    t = F.col(text_col) if isinstance(text_col, str) else text_col
    parts = F.concat(
        *[F.regexp_extract_all(t, F.lit(pat), 1) for pat in _META_ROBOTS_RES]
    )
    toks = F.flatten(
        F.transform(parts, lambda v: F.split(F.lower(v), ","))
    )
    cleaned = F.array_compact(
        F.transform(toks, lambda x: F.nullif(F.trim(x), F.lit("")))
    )
    return F.array_sort(F.array_distinct(cleaned))


def is_noindex(text_col: str | Column = "text") -> Column:
    """Keep/drop convenience: does any robots meta directive say
    noindex or none (the 'none' directive implies noindex+nofollow)?"""
    d = html_meta_robots(text_col)
    return F.arrays_overlap(d, F.array(F.lit("noindex"), F.lit("none")))


# --- X180: readability scores (round 12). The classic curation
# signal family (Flesch reading ease / Flesch-Kincaid grade): cheap,
# language-gated (the syllable heuristic is English-specific and says
# so), and a strong separator between prose and listings/boilerplate.
# Sentence and syllable counting are REGEX HEURISTICS with documented
# bias (abbreviations over-split sentences; silent-e and diphthongs
# are approximated the standard way: vowel groups minus trailing e),
# which is exactly how production quality filters compute them — the
# score feeds a threshold, not a citation. Row-local, zero shuffle.

_SENTENCE_END_RE = r"[.!?]+[\s)\"']|[.!?]+$"
_VOWEL_GROUP_RE = "(?i)[aeiouy]+"
_SILENT_E_RE = "(?i)[a-z]e\\b"


def readability_scores(
    df: DataFrame, text_col: str = "text"
) -> DataFrame:
    """Flesch reading ease and Flesch-Kincaid grade per document, plus
    the raw n_sentences / n_words / n_syllables counters (so callers
    can re-derive any formula in the family). Empty/degenerate docs
    (no words) score NULL rather than dividing by zero. English-biased
    by construction — gate on the X31 language id before thresholding
    non-English corpora."""
    t = F.col(text_col)
    n_sent = F.greatest(
        F.size(F.regexp_extract_all(t, F.lit(_SENTENCE_END_RE), 0)),
        F.lit(1),
    )
    words = F.filter(F.split(t, "\\s+"), lambda w: w != "")
    n_words = F.size(words)
    vowel_groups = F.size(F.regexp_extract_all(t, F.lit(_VOWEL_GROUP_RE), 0))
    silent_e = F.size(F.regexp_extract_all(t, F.lit(_SILENT_E_RE), 0))
    # every word has at least one syllable; vowel-groups minus
    # word-final silent e, floored at the word count
    n_syll = F.greatest(vowel_groups - silent_e, n_words)
    wps = n_words.cast("double") / n_sent
    spw = n_syll.cast("double") / F.greatest(n_words, F.lit(1))
    ease = F.lit(206.835) - F.lit(1.015) * wps - F.lit(84.6) * spw
    grade = F.lit(0.39) * wps + F.lit(11.8) * spw - F.lit(15.59)
    return df.select(
        *df.columns,
        n_sent.cast("bigint").alias("n_sentences"),
        n_words.cast("bigint").alias("n_words"),
        n_syll.cast("bigint").alias("n_syllables"),
        F.when(n_words > 0, ease).alias("flesch_ease"),
        F.when(n_words > 0, grade).alias("fk_grade"),
    )


# --- X166: encoding QA (round 11). Double-encoding (UTF-8 bytes
# decoded as Latin-1/cp1252) is the most common corpus corruption
# after truncation. Detect, never repair — repair needs the byte
# history (which decode happened) and guessing wrong corrupts clean
# text; the score routes documents to quarantine/re-ingest instead.

# The character images of UTF-8 CONTINUATION bytes (0x80-0xBF) under
# BOTH common mis-decodes: Latin-1 maps them to \u0080-\u00bf
# identically; cp1252 remaps 0x80-0x9F to the punctuation/letter set
# enumerated below (public cp1252 table) and passes 0xA0-0xBF through.
_UTF8_CONT_IMAGES = (
    "\u0080-\u00bf"
    "\u20ac\u201a\u0192\u201e\u2026\u2020\u2021\u02c6\u2030"
    "\u0160\u2039\u0152\u017d\u2018\u2019\u201c\u201d\u2022"
    "\u2013\u2014\u02dc\u2122\u0161\u203a\u0153\u017e\u0178"
)
# Valid UTF-8 lead bytes 0xC2-0xEF map to \u00c2-\u00ef under BOTH
# decodes (cp1252 is identity at >=0xA0), so a lead-image followed by
# continuation-images is the mis-decode signature; 0xC0/0xC1 are not
# valid UTF-8 leads, which conveniently excludes real words starting
# with A-grave/A-acute. Plain alternation, RE2-replayable.
_MOJIBAKE_RE = (
    "([\u00c2-\u00df][" + _UTF8_CONT_IMAGES + "])"
    "|([\u00e0-\u00ef][" + _UTF8_CONT_IMAGES + "]{2})"
)
_CONTROL_RE = "[\x00-\x08\x0b\x0c\x0e-\x1f\x7f]"


def mojibake_score(text_col: str | Column = "text") -> Column:
    """Per-1000-chars density of UTF-8-as-Latin-1/cp1252 artifact
    sequences (a mis-decoded lead byte's image followed by
    continuation-byte images) — ~0 on clean text in any language
    (accented letters in real prose are followed by ASCII, which is
    outside the continuation-image class), large on genuinely
    double-encoded text (EVERY non-ASCII character contributes one
    artifact). Detection only; see the module note on why repair is
    out of scope."""
    t = F.col(text_col) if isinstance(text_col, str) else text_col
    hits = F.size(F.regexp_extract_all(t, F.lit(_MOJIBAKE_RE), 0))
    return F.when(
        F.length(t) > 0, hits * 1000.0 / F.length(t).cast("double")
    ).otherwise(F.lit(0.0))


def control_char_count(text_col: str | Column = "text") -> Column:
    """Count of C0/DEL control characters (tab/newline/CR excluded) —
    binary-in-text contamination, the cheap signal that a 'text' shard
    is actually mis-sniffed binary."""
    t = F.col(text_col) if isinstance(text_col, str) else text_col
    return F.size(F.regexp_extract_all(t, F.lit(_CONTROL_RE), 0)).cast("bigint")


def replacement_char_count(text_col: str | Column = "text") -> Column:
    """Count of U+FFFD replacement characters — the upstream decoder
    already lost those bytes; a high count means re-ingest from
    source, not repair."""
    t = F.col(text_col) if isinstance(text_col, str) else text_col
    return F.size(F.regexp_extract_all(t, F.lit("\ufffd"), 0)).cast("bigint")


def strip_control_chars(text_col: str | Column = "text") -> Column:
    """The one SAFE encoding repair: drop C0/DEL controls (keeping
    tab/newline/CR). Unlike mojibake repair this cannot corrupt clean
    text — the stripped range is never legitimate prose."""
    t = F.col(text_col) if isinstance(text_col, str) else text_col
    return F.regexp_replace(t, _CONTROL_RE, "")


# --- X167: Markdown -> text extraction (round 11). Code-hosting and
# docs corpora arrive as Markdown, not HTML; the X164 stripper leaves
# every fence, link target, and emphasis marker in place, which skews
# length/punctuation quality signals and leaks URLs into token
# statistics. Same contract as X164: chained RE2-compatible
# regexp_replace (capture groups but no backreferences or lookaround,
# so a plain-SQL oracle can replay each pattern), zero shuffle.

_MD_STRIPS: tuple[tuple[str, str], ...] = (
    # fenced code blocks vanish wholesale (code is not prose; keeping
    # it would let a README full of shell blocks pass length gates)
    (r"(?s)```.*?```", " "),
    (r"(?s)~~~.*?~~~", " "),
    # images contribute their alt text; links contribute their label
    (r"!\[([^\]]*)\]\([^)]*\)", "$1"),
    (r"\[([^\]]*)\]\([^)]*\)", "$1"),
    (r"\[([^\]]*)\]\[[^\]]*\]", "$1"),
    # reference-link definition lines are pure plumbing
    (r"(?m)^\s*\[[^\]]+\]:\s*\S.*$", " "),
    # autolinks drop their URL (URLs are routing, not prose)
    (r"<(https?|mailto):[^>]*>", " "),
    # inline HTML rides Markdown freely; reuse the X164 tag shape
    (r"(?s)<!--.*?-->", " "),
    (r"<[^>]*>", " "),
    # ATX headers / blockquotes / list markers / horizontal rules
    (r"(?m)^#{1,6}\s*", ""),
    (r"(?m)^\s*>+\s?", ""),
    (r"(?m)^\s*([-*+]|\d{1,9}[.)])\s+", ""),
    (r"(?m)^\s*([-*_]\s*){3,}$", " "),
    # table scaffolding: separator rows, then cell pipes
    (r"(?m)^\s*\|?[\s:|-]+\|[\s:|-]*$", " "),
    (r"\|", " "),
    # emphasis/strikethrough markers; single underscores are left
    # alone on purpose (snake_case identifiers are real content, and
    # telling emphasis from them needs lookaround RE2 lacks)
    (r"\*{1,3}", ""),
    (r"~~", ""),
    (r"__", ""),
    # inline-code backticks (content kept: short spans are prose-like)
    (r"`", ""),
)

# Whitespace class for the final squeeze, matching PYTHON str.isspace()
# semantics, which are wider than Java-regex \s: C0 separators
# U+001C-U+001F are removed by the composed _CONTROL_RE strip below, and
# this class adds NEL (U+0085), NBSP (U+00A0), and the Unicode space
# block (U+1680, U+2000-U+200A, U+2028/29, U+202F, U+205F, U+3000) so
# extracted prose satisfies out == out.strip() under Python semantics —
# the exact contract tests/test_properties.py pins (VERDICT r11 item 1:
# hypothesis falsified the old Java-\s-only squeeze with '\x1f').
_PY_WS_RE = (
    "[\\s\x1c-\x1f\x85\xa0\u1680\u2000-\u200a\u2028\u2029\u202f\u205f\u3000]"
)
# True junk controls deleted by the extractor: C0 EXCLUDING every
# character that is whitespace in Java or Python (\t\n\x0b\x0c\r
# squeeze via \s; \x1c-\x1f squeeze via the class above) - deleting
# a whitespace-class character would merge the words around it
# (round-12 review finding: "page one\x0cpage two" must keep its
# word boundary).
_MD_JUNK_RE = "[\x00-\x08\x0e-\x1b\x7f]"


def markdown_to_text(text_col: str | Column = "text") -> Column:
    """Markup-stripped text of a Markdown document: fenced code blocks
    and link/image targets vanish, labels and alt text survive, list/
    header/table/emphasis scaffolding is removed, whitespace squeezes.
    Scope notes: setext underlines are consumed by the horizontal-rule
    pattern; single-underscore emphasis is deliberately NOT stripped
    (indistinguishable from snake_case without lookaround); indented
    (4-space) code blocks are kept as text (distinguishing them from
    list continuations is parser work, not regex work). NOT a
    sanitizer — ingest transform only, never a security boundary."""
    t = F.col(text_col) if isinstance(text_col, str) else text_col
    for pat, rep in _MD_STRIPS:
        t = F.regexp_replace(t, pat, rep)
    # Final normalization: delete true junk controls (never the
    # whitespace-class ones — that would merge words), then squeeze
    # the FULL Python-whitespace class (Java \s plus C0 separators
    # U+001C-U+001F, NEL, NBSP, the Unicode space block — U+001C-U+001F
    # falsified the old Java-\s-only form), so the output holds
    # out == out.strip() under Python semantics.
    t = F.regexp_replace(t, _MD_JUNK_RE, "")
    return F.trim(F.regexp_replace(t, _PY_WS_RE + "+", " "))


def markdown_density(text_col: str | Column = "text") -> Column:
    """Fraction of the document consumed by Markdown scaffolding:
    1 - len(extracted)/len(raw). A link-farm README scores high, plain
    prose ~0 — the X164 markup_density twin for Markdown corpora."""
    t = F.col(text_col) if isinstance(text_col, str) else text_col
    raw_len = F.length(t)
    return F.when(
        raw_len > 0,
        1.0 - F.length(markdown_to_text(t)) / raw_len.cast("double"),
    ).otherwise(F.lit(0.0))


# --- X168: adjacent-repeated-line squeeze (round 11). Generation
# glitches, crawler pagination, and template chrome all materialize
# as the SAME line repeated back-to-back; the Gopher-style X13
# signals only measure repetition, and the X20 boilerplate strip
# works on corpus-frequency, not intra-document adjacency. This is
# the row-local repair: keep the first of every run of identical
# lines. Pure higher-order-function Column work — the line array is
# compared against its own shift, so there is no UDF, no explode, no
# shuffle, and the op composes into any narrow projection.


def _dedup_adjacent(arr: Column) -> Column:
    """NULL-mark every element equal to its predecessor. The shifted
    twin is built with slice+concat (never element_at(.., 0), which
    ANSI mode rejects); split() never yields NULL elements, so NULL
    unambiguously means 'duplicate of previous'."""
    prev = F.concat(
        F.array(F.lit(None).cast("string")),
        F.slice(arr, 1, F.greatest(F.size(arr) - 1, F.lit(0))),
    )
    return F.zip_with(
        arr, prev,
        lambda a, b: F.when(a.eqNullSafe(b), F.lit(None)).otherwise(a),
    )


def squeeze_repeated_lines(text_col: str | Column = "text") -> Column:
    """Text with every run of consecutive identical lines collapsed to
    its first line (exact match; runs of blank lines collapse too, so
    multi-blank paragraph gaps become single). Distinct lines,
    including non-adjacent repeats, are untouched — corpus-level
    boilerplate is X20's job, not this op's."""
    t = F.col(text_col) if isinstance(text_col, str) else text_col
    return F.array_join(F.array_compact(_dedup_adjacent(F.split(t, "\n"))), "\n")


def repeated_line_fraction(text_col: str | Column = "text") -> Column:
    """Fraction of a document's lines that are adjacent repeats — the
    keep/drop signal companion to squeeze_repeated_lines (a page that
    is mostly one repeated line should be dropped, not repaired)."""
    t = F.col(text_col) if isinstance(text_col, str) else text_col
    arr = F.split(t, "\n")
    n = F.size(arr)
    kept = F.size(F.array_compact(_dedup_adjacent(arr)))
    return F.when(
        n > 0, (n - kept) / n.cast("double")
    ).otherwise(F.lit(0.0))


def encoding_qa_stats(
    docs: DataFrame,
    text_col: str = "text",
    key_col: str = "source",
    moji_per_1000: float = 5.0,
) -> DataFrame:
    """Per-source batch rollup of the X166 detectors — doc counts,
    mojibake/control-contaminated doc counts, raw control/replacement
    character totals, and the derived rates. ONE narrow detector
    projection + one hash agg on the source key; the text never rides
    the shuffle. The streaming twin (X169,
    streaming.pipeline.make_encoding_qa_maintainer) folds the same
    counters additively per micro-batch."""
    base = docs.select(
        F.col(key_col).alias("source"),
        mojibake_score(text_col).alias("__moji"),
        control_char_count(text_col).alias("__ctrl"),
        replacement_char_count(text_col).alias("__repl"),
    )
    agg = base.groupBy("source").agg(
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
    return agg.select(
        "*",
        (F.col("n_mojibake_docs") / F.col("n_docs").cast("double")).alias(
            "mojibake_rate"
        ),
        (F.col("n_control_docs") / F.col("n_docs").cast("double")).alias(
            "control_rate"
        ),
    )


def tokenizer_fertility(
    docs: DataFrame,
    merges: list[tuple[str, str]],
    text_col: str = "text",
    group_col: str = "lang",
) -> DataFrame:
    """X172 (round 11) — per-group tokenizer-fertility audit: pieces
    per word under a learned BPE merge list, grouped by language (or
    any group key). Fertility is the standard multilingual-tokenizer
    equity signal — a vocabulary induced on one language segments the
    others into many more pieces, silently inflating their compute
    cost per character and shrinking their effective context; the
    audit is how a mixture designer sees that before training.

    Composition (X45 machinery, one new rollup): the merge folds
    segment the distinct-word VOCABULARY once (never the corpus), the
    corpus scans once through a (word -> n_pieces) lookup join, and
    ONE hash agg per group key emits exact-integer totals plus the
    derived ratios — fertility = pieces/words, and pieces per 100
    chars (the length-normalized form that compares across scripts
    with different word lengths). The lookup join is left to AQE (the
    bpe_encode rule: vocabularies grow with the corpus, so no
    unconditional broadcast hint)."""
    seg = bpe_word_segments(docs, merges, text_col).select("w", "n_pieces")
    toks = docs.select(
        F.col(group_col).alias("grp"),
        F.explode(F.split(F.col(text_col), " ")).alias("w"),
    ).filter(F.length("w") >= 1)
    return (
        toks.join(seg, "w")
        .groupBy("grp")
        .agg(
            F.count("*").cast("bigint").alias("n_words"),
            F.sum("n_pieces").cast("bigint").alias("n_pieces"),
            F.sum(F.length("w")).cast("bigint").alias("n_chars"),
        )
        .select(
            F.col("grp").alias(group_col),
            "n_words",
            "n_pieces",
            "n_chars",
            F.round(F.col("n_pieces") / F.col("n_words"), 4).alias("fertility"),
            F.round(F.col("n_pieces") * 100.0 / F.col("n_chars"), 4).alias(
                "pieces_per_100_chars"
            ),
        )
    )


# --- X173: template fingerprint + template-farm rollup (round 11).
# Near-dup (X2/X32) catches documents with shared CONTENT; template
# farms are the opposite failure — thousands of pages with identical
# STRUCTURE and different fillings (scraper chaff, SEO spam, listing
# pages), each pair far apart in shingle space. The fingerprint
# erases the content and keeps the structure, so one exact groupBy
# finds the farms.


def template_fingerprint(text_col: str | Column = "text") -> Column:
    """Structure-only digest of a document: letter runs collapse to
    'w', digit runs to 'd', whitespace runs to one space — punctuation,
    markup, and layout survive verbatim — then md5. Two pages from the
    same template collide exactly; content similarity is irrelevant.
    RE2-replayable chain (no backreferences), zero shuffle. The
    Unicode \\p{L} class keeps non-Latin scripts from leaking content
    into the fingerprint as 'punctuation'."""
    t = F.col(text_col) if isinstance(text_col, str) else text_col
    t = F.regexp_replace(t, r"\p{L}+", "w")
    t = F.regexp_replace(t, r"\d+", "d")
    t = F.regexp_replace(t, r"\s+", " ")
    return F.md5(F.trim(t))


def template_farm_stats(
    docs: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    min_docs: int = 3,
) -> DataFrame:
    """Template groups with at least ``min_docs`` members: (template
    md5, n_docs, n_distinct_texts, min doc id as the representative).
    ONE narrow fingerprint projection + one hash agg on the digest key
    — the text never rides the shuffle; n_distinct_texts > 1
    distinguishes a true farm (same skeleton, varied filling) from an
    exact-duplicate cluster X1 already catches."""
    base = docs.select(
        F.col(id_col).alias("id"),
        template_fingerprint(text_col).alias("template"),
        F.md5(F.col(text_col)).alias("__digest"),
    )
    return (
        base.groupBy("template")
        .agg(
            F.count("*").cast("bigint").alias("n_docs"),
            F.countDistinct("__digest").cast("bigint").alias("n_distinct_texts"),
            F.min("id").alias("representative_id"),
        )
        .filter(F.col("n_docs") >= min_docs)
    )
