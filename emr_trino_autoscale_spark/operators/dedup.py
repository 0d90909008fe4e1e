"""Deduplication operators (X1/X2 + training-data extensions).

All variants are single-shuffle plans over the ``documents`` table:
compute a per-document signature JVM-side (no Python), then group on
the signature. At 100 TB the signature groupBy is the only exchange;
skewed signatures (boilerplate dups) are handled by AQE skew-join /
two-phase partial aggregation, and signatures are fixed-width hashes so
shuffle rows are tiny regardless of document size.

Deterministic by construction: hash functions are md5/xxhash64/crc32
(stable across runs and engines), no sampled permutations.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F
from pyspark.sql import types as T

from ._persist import default_persist

from ..functions import md5_long60


def exact_dedup(
    df: DataFrame, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """X1 — exact duplicate clusters on the content hash, keeping the
    minimum id as canonical. ``sha2``/``md5`` of the raw text; group on
    the digest, never on the full text (shuffle width)."""
    return (
        df.groupBy(F.md5(F.col(text_col)).alias("text_hash"))
        .agg(
            F.min(id_col).alias("keep_id"),
            F.count("*").cast("bigint").alias("n_dups"),
        )
    )


def shingles_of(toks: Column, k: int = 3) -> Column:
    """Word k-shingles from a *materialized* token-array column.

    The token array MUST be a named column, not an inline ``split(...)``
    expression: expressions referenced inside a higher-order-function
    lambda are re-evaluated per element access (no common-subexpression
    elimination inside lambdas), which turns one split per row into one
    split per (position x k) — measured 7x slower at sf0.1.

    Documents with fewer than k tokens yield an empty shingle array.
    The guard must be an explicit branch: ``sequence(1, size-k+1)`` with
    a non-positive stop generates a DESCENDING range ([1, 0]) and
    ``element_at(toks, 0)`` then crashes at runtime."""
    n_starts = F.size(toks) - F.lit(k - 1)
    idx = F.when(n_starts >= 1, F.sequence(F.lit(1), n_starts)).otherwise(
        F.array().cast("array<int>")
    )  # 1-based starts; [] for short docs
    return F.transform(
        idx,
        lambda i: F.concat_ws(" ", *[F.element_at(toks, i + j) for j in range(k)]),
    )


def shingles(text_col: str = "text", k: int = 3) -> Column:
    """Word k-shingles as an array column (split on single space —
    deterministic, matches the oracle's string_split semantics).
    Prefer :func:`shingles_of` over a materialized token column in
    operator code (see its performance note)."""
    return shingles_of(F.split(F.col(text_col), " "), k)


def minhash_signature(text_col: str = "text", k: int = 3) -> Column:
    """X2 — deterministic 1-permutation MinHash: the lexicographic min of
    the md5 digests of the document's k-shingles. Documents sharing any
    min-shingle collide into the same candidate bucket (the band-join
    step of MinHash+LSH with b=1, r=1 — deterministic, no sampled
    permutations, so the oracle can replay it)."""
    return F.array_min(F.transform(shingles(text_col, k), F.md5))


def near_dup_clusters(
    df: DataFrame, text_col: str = "text", id_col: str = "doc_id", k: int = 3
) -> DataFrame:
    """X2 — near-duplicate candidate clusters via the minhash signature."""
    return (
        df.withColumn("__toks", F.split(F.col(text_col), " "))
        .filter(F.size("__toks") >= k)
        .select(
            F.col(id_col),
            F.array_min(
                F.transform(shingles_of(F.col("__toks"), k), F.md5)
            ).alias("sig"),
        )
        .groupBy("sig")
        .agg(
            F.min(id_col).alias("keep_id"),
            F.count("*").cast("bigint").alias("cluster_size"),
        )
    )


def _bit_masks(n_bits: int) -> Column:
    """Literal array of per-bit masks (constant-folded once by Catalyst;
    bit 63 is the long sign bit, emitted as its two's-complement value)."""
    vals = [(1 << b) if b < 63 else -(1 << 63) for b in range(n_bits)]
    return F.array(*[F.lit(v).cast("long") for v in vals])


def simhash64(text_col: str = "text") -> Column:
    """SimHash over word tokens with xxhash64 (deterministic).

    Single-pass fold: ONE ``F.aggregate`` over the token hashes whose
    accumulator is an array of 64 per-bit vote counters (+1 if the bit
    is set, else -1), then one pack pass ORs the positive-vote masks.
    The previous per-bit formulation ran 64 separate folds over the
    hash array — O(bits) re-iterations; this is one iteration.
    """
    hashes = F.transform(F.split(F.col(text_col), " "), lambda t: F.xxhash64(t))
    masks = _bit_masks(64)
    votes = F.aggregate(
        hashes,
        F.array_repeat(F.lit(0), 64),
        lambda acc, h: F.transform(
            acc,
            lambda v, i: v
            + F.when(
                h.bitwiseAND(F.element_at(masks, i + F.lit(1))) != F.lit(0), F.lit(1)
            ).otherwise(F.lit(-1)),
        ),
    )
    return F.aggregate(
        F.zip_with(
            votes, masks, lambda v, m: F.when(v > 0, m).otherwise(F.lit(0).cast("long"))
        ),
        F.lit(0).cast("long"),
        lambda a, m: a.bitwiseOR(m),
    )


def simhash16_from_hashes(hashes: Column) -> Column:
    """16-bit SimHash from a *materialized* array<string> column of md5
    token digests. Bit b is set iff the majority of digests have hex
    nibble b >= '8' (the nibble's high bit).

    Single-pass fold (see :func:`simhash64`): one aggregate builds the
    16 vote counters, one pack pass sums the winning bits. ``hashes``
    should still be a named column — the array is the fold operand and
    an inline expression would be re-evaluated by the optimizer's
    lambda handling (no CSE in lambda bodies — see :func:`shingles_of`).
    """
    pows = F.array(*[F.lit(1 << b) for b in range(16)])
    votes = F.aggregate(
        hashes,
        F.array_repeat(F.lit(0), 16),
        lambda acc, h: F.transform(
            acc,
            lambda v, i: v
            + F.when(h.substr(i + F.lit(1), F.lit(1)) >= F.lit("8"), F.lit(1)).otherwise(
                F.lit(-1)
            ),
        ),
    )
    return (
        F.aggregate(
            F.zip_with(votes, pows, lambda v, p: F.when(v > 0, p).otherwise(F.lit(0))),
            F.lit(0),
            lambda a, p: a + p,
        )
        .cast("int")
    )


def simhash16_md5(text_col: str = "text") -> Column:
    """Column-expression form of :func:`simhash16_from_hashes` (md5 is
    identical across engines, so the oracle replays it; xxhash64 is the
    Spark-only production twin, :func:`simhash64`). For hot paths prefer
    materializing the digest array and calling simhash16_from_hashes."""
    return simhash16_from_hashes(F.transform(F.split(F.col(text_col), " "), F.md5))


def md5_long_hashes(text_col: str = "text") -> Column:
    """array<long>: 60-bit integer form of each token's md5 digest."""
    return F.transform(
        F.split(F.col(text_col), " "),
        md5_long60,
    )


def simhash_from_long_hashes(hashes: Column, n_bits: int = 32) -> Column:
    """n-bit SimHash (n <= 60) from a *materialized* array<long> column
    of integer token digests (:func:`md5_long_hashes`).

    Single-pass fold (see :func:`simhash64`): one aggregate over the
    digest array accumulates all n_bits vote counters, then one pack
    pass sums the winning masks — measured ~1.6x over the previous
    n_bits-separate-folds formulation at sf0.1. Keep the digest array a
    named column (no CSE inside lambda bodies)."""
    if not 1 <= n_bits <= 60:
        raise ValueError("n_bits must be in [1, 60]")
    masks = _bit_masks(n_bits)
    votes = F.aggregate(
        hashes,
        F.array_repeat(F.lit(0), n_bits),
        lambda acc, h: F.transform(
            acc,
            lambda v, i: v
            + F.when(
                h.bitwiseAND(F.element_at(masks, i + F.lit(1))) != F.lit(0), F.lit(1)
            ).otherwise(F.lit(-1)),
        ),
    )
    return F.aggregate(
        F.zip_with(
            votes, masks, lambda v, m: F.when(v > 0, m).otherwise(F.lit(0).cast("long"))
        ),
        F.lit(0).cast("long"),
        lambda a, m: a + m,
    )


def simhash_clusters(
    df: DataFrame, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """SimHash near-dup clusters: exact-signature grouping (Hamming
    radius 0; :func:`simhash_hamming_pairs` is the radius>0 extension)."""
    return (
        df.withColumn("__hs", F.transform(F.split(F.col(text_col), " "), F.md5))
        .select(F.col(id_col), simhash16_from_hashes(F.col("__hs")).alias("sig"))
        .groupBy("sig")
        .agg(
            F.min(id_col).alias("keep_id"),
            F.count("*").cast("bigint").alias("cluster_size"),
        )
    )


def simhash_signatures(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    n_bits: int = 32,
) -> DataFrame:
    """Per-document SimHash signatures as an ``(id, sig)`` frame.

    A SimHash is row-local (one document's tokens, nothing else), so the
    scale-correct shape is a NARROW Arrow projection — zero shuffle,
    zero exchange — not the earlier explode + 32-conditional-sum hash
    aggregation (which moved ~#docs x n_bits partial rows through an
    exchange; measured 3x slower at sf0.1 and strictly worse at 100 TB
    where the exchange is pure waste). Values are IDENTICAL to the
    md5-rooted expression form — per token, the 60-bit integer prefix of
    md5 votes each of the low ``n_bits`` bits up or down — so the
    DuckDB oracles for q26/q47/q49 replay unchanged (parity also pinned
    against pure Python in tests/test_properties.py). Token md5s are
    memoized per Arrow batch (corpus tokens repeat heavily).
    NULL-text rows are excluded, matching the SQL oracle where a NULL
    signature can never equi-join into a band bucket. Callers that need
    both the pairs AND the doc->sig map (q49's closure) cache THIS
    frame and derive both from it.
    """
    if not 1 <= n_bits <= 60:
        raise ValueError("n_bits must be in [1, 60]")

    def batches(it):
        import hashlib

        import numpy as np
        import pandas as pd

        arange = np.arange(n_bits, dtype=np.int64)
        memo: dict[str, "np.ndarray"] = {}

        def token_votes(tok: str):
            v = memo.get(tok)
            if v is None:
                h = int(hashlib.md5(tok.encode("utf-8")).hexdigest()[:15], 16)
                v = (2 * ((h >> arange) & 1) - 1).astype(np.int64)
                memo[tok] = v
            return v

        for pdf in it:
            # bound the per-task memo: unbounded growth across a long
            # partition's batches is a slow leak on high-cardinality
            # token streams; per-batch reuse captures most of the
            # repeat-token win, so clearing at ~1M entries costs little
            if len(memo) > 1_000_000:
                memo.clear()
            ids, sigs = [], []
            for i, t in zip(pdf["__id"], pdf["__t"]):
                votes = np.zeros(n_bits, dtype=np.int64)
                # str.split(" ") == Spark F.split(_, " "): consecutive
                # separators yield empty tokens, "" yields [""]
                for tok in t.split(" "):
                    votes += token_votes(tok)
                ids.append(i)
                sigs.append(int(((votes > 0).astype(np.int64) << arange).sum()))
            yield pd.DataFrame({"id": ids, "sig": sigs})

    return (
        df.filter(F.col(text_col).isNotNull())
        .select(F.col(id_col).alias("__id"), F.col(text_col).alias("__t"))
        .mapInPandas(
            batches,
            # id type follows the input column (string doc ids survive)
            schema=f"id {df.schema[id_col].dataType.simpleString()}, sig long",
        )
    )


def simhash_hamming_pairs(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    max_hamming: int = 2,
    n_bands: int = 4,
    n_bits: int = 32,
) -> DataFrame:
    """SimHash near-dup pairs within a Hamming radius, via band-joins.

    The ``n_bits`` signature splits into ``n_bands`` bands; by
    pigeonhole, two signatures within Hamming distance < n_bands share
    at least one identical band, so the candidate join is band-equi
    (narrow int keys, no quadratic scan). Candidates are then verified
    exactly with ``bit_count(xor)``. Exact for ``max_hamming < n_bands``.

    Band width sizes the candidate volume: with b-bit bands, a random
    corpus spreads each band over 2^b keys, so the join fan-out is
    ~n²·n_bands/2^b — 8-bit bands (n_bits=32, n_bands=4) keep buckets
    small where 4-bit bands degrade toward quadratic.
    """
    return simhash_hamming_pairs_from_sigs(
        simhash_signatures(df, text_col=text_col, id_col=id_col, n_bits=n_bits),
        max_hamming=max_hamming,
        n_bands=n_bands,
        n_bits=n_bits,
    )


def simhash_hamming_pairs_from_sigs(
    sigs: DataFrame,
    max_hamming: int = 2,
    n_bands: int = 4,
    n_bits: int = 32,
) -> DataFrame:
    """Band-join stage of :func:`simhash_hamming_pairs`, taking a
    precomputed (possibly cached) ``(id, sig)`` frame."""
    if max_hamming >= n_bands:
        raise ValueError("exactness requires max_hamming < n_bands")
    bits = n_bits // n_bands
    banded = sigs.select(
        "id",
        "sig",
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(b).alias("band"),
                        F.shiftright("sig", b * bits)
                        .bitwiseAND(F.lit((1 << bits) - 1))
                        .alias("key"),
                    )
                    for b in range(n_bands)
                ]
            )
        ).alias("bk"),
    ).select("id", "sig", F.col("bk.band").alias("band"), F.col("bk.key").alias("key"))
    a, b = banded.alias("a"), banded.alias("b")
    cand = (
        a.join(
            b,
            (F.col("a.band") == F.col("b.band"))
            & (F.col("a.key") == F.col("b.key"))
            & (F.col("a.id") < F.col("b.id")),
        )
        .select(
            F.col("a.id").alias("id_a"),
            F.col("b.id").alias("id_b"),
            F.col("a.sig").alias("sig_a"),
            F.col("b.sig").alias("sig_b"),
        )
        .distinct()
    )
    return (
        cand.withColumn(
            "hamming",
            F.bit_count(F.col("sig_a").bitwiseXOR(F.col("sig_b"))).cast("int"),
        )
        .filter(F.col("hamming") <= max_hamming)
        .select("id_a", "id_b", "sig_a", "sig_b", "hamming")
    )


def ngram_jaccard_pairs(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    k: int = 3,
    threshold: float = 0.5,
) -> DataFrame:
    """n-gram Jaccard near-dup pairs — thin alias for
    :func:`ngram_jaccard_pairs_prefix`.

    The earlier plain inverted-index form (self-join on every shingle)
    emitted f^2 candidate rows for a shingle appearing in f documents —
    a boilerplate-shingle blowup at corpus scale. The PPJoin
    prefix-filtered implementation is exact for the same (id_a, id_b,
    n_common, sz_a, sz_b, jaccard) contract, so the naive form has no
    reason to exist as a separate public API."""
    return ngram_jaccard_pairs_prefix(df, text_col, id_col, k, threshold)


def ngram_jaccard_pairs_prefix(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    k: int = 3,
    threshold: float = 0.5,
    persist_fn=None,
) -> DataFrame:
    """Exact n-gram Jaccard pairs with PPJoin-style prefix filtering —
    the scalable form of :func:`ngram_jaccard_pairs`.

    The naive inverted-index join blows up on boilerplate shingles (a
    shingle in f documents emits f^2 candidate rows). Prefix filtering
    removes the hot keys *losslessly*: order every document's shingle
    set by ascending global document frequency (rare first; ties by
    digest) and index only the first |d| - ceil(t*|d|) + 1 shingles. Any
    pair with Jaccard >= t must collide on at least one prefix shingle
    (pigeonhole on the shared total order), and prefixes consist of rare
    shingles, so no join key is hot. Candidates are then verified
    exactly against the full shingle sets (``array_intersect``).

    Scale: two shuffles of the narrow (id, digest) index + one
    candidate-key shuffle, all skew-free; the verify join moves only
    candidate ids plus the packed shingle arrays.

    Shingle digests are the 60-bit integer form of md5 (not the 32-char
    hex string): the verify phase intersects whole digest arrays per
    candidate pair, and long compares beat string compares ~2.5x
    end-to-end (measured at sf0.1, identical output). Counts are
    unchanged unless two DISTINCT shingles collide in 60 bits
    (~n_shingles^2 / 2^61 — vanishing, and the cross-engine gate would
    surface it). Prefix ordering ties break on the long digest instead
    of the hex string — a different but equally total order, and the
    PPJoin pigeonhole argument only needs SOME shared total order.
    """
    # packed (id, sh, sz) in the JVM: like ngram_hashes (see its round-6
    # form note), per-shingle md5 digesting dominates this projection
    # and shingles are mostly unique, so JVM md5+conv beats a Python
    # hashlib loop ~2x; element order inside `sh` is irrelevant
    # downstream (explode + array_intersect are order-insensitive)
    docs = (
        df.withColumn("__toks", F.split(F.col(text_col), " "))
        .filter(F.size("__toks") >= k)
        .select(
            F.col(id_col).alias("id"),
            F.array_distinct(
                F.transform(
                    shingles_of(F.col("__toks"), k),
                    md5_long60,
                )
            ).alias("sh"),
        )
        .withColumn("sz", F.size("sh"))
    )
    # The shingle index feeds three plan branches (inverted index + both
    # verify sides); Spark has no common-subplan elimination across
    # branches, so persist the narrow (id, sh, sz) projection instead of
    # recomputing the md5 shingling three times. MEMORY_AND_DISK: spills
    # rather than fails when the corpus outgrows executor memory.
    # ``persist_fn`` lets callers scope the cache's lifetime (the
    # declared-query path passes queries._cache_scoped so the cache is
    # released when the next query runs); the default leaves the cache
    # live — callers owning the session should unpersist when done.
    if persist_fn is None:
        persist_fn = default_persist  # registered; released via release_default_persists
    docs = persist_fn(docs)
    ex = docs.select("id", "sz", F.explode("sh").alias("s"))
    dfreq = ex.groupBy("s").agg(F.count("*").alias("df"))
    w = Window.partitionBy("id").orderBy(F.col("df").asc(), F.col("s").asc())
    prefix_len = F.col("sz") - F.ceil(F.lit(threshold) * F.col("sz")) + 1
    # The prefix frame feeds BOTH sides of the candidate self-join;
    # without a persist each side recomputes the dfreq aggregate + the
    # per-doc window sort (two Window subtrees in the executed plan —
    # the q73 signature-frame lesson). default_persist, not the
    # caller's scoped persist_fn: that one released prior caches on
    # entry and must keep scoping only the docs frame.
    pref = default_persist(
        ex.join(dfreq, "s")
        .withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= prefix_len)
        .select("id", "s", "sz", "rn")
    )
    # candidate join; the PPJoin length filter rides along for free:
    # J(A,B) >= t forces t*|A| <= |B| <= |A|/t, so pairs outside the
    # size band are dropped before the distinct/verify. The POSITIONAL
    # filter then prunes further, losslessly: a prefix match at
    # positions (i, j) of the shared df-ascending order bounds the
    # overlap at min(i-1, j-1) common tokens before the match plus
    # min(|A|-i, |B|-j)+1 from the match onward; J >= t needs overlap
    # >= ceil(t/(1+t)*(|A|+|B|)) (the Jaccard<->overlap identity), so
    # any pair whose TIGHTEST per-match bound falls short can be
    # dropped before the verify join ever moves its shingle arrays.
    # (The 1e-9 slack only loosens the prune at float boundaries —
    # borderline candidates still reach the exact verify.)
    cand = (
        pref.alias("a")
        .join(
            pref.alias("b"),
            (F.col("a.s") == F.col("b.s"))
            & (F.col("a.id") < F.col("b.id"))
            & (F.col("b.sz") >= F.lit(threshold) * F.col("a.sz"))
            & (F.col("b.sz") * F.lit(threshold) <= F.col("a.sz")),
        )
        .select(
            F.col("a.id").alias("id_a"),
            F.col("b.id").alias("id_b"),
            (
                F.least(F.col("a.rn"), F.col("b.rn"))
                - 1
                + F.least(
                    F.col("a.sz") - F.col("a.rn"), F.col("b.sz") - F.col("b.rn")
                )
                + 1
            ).alias("__ub"),
            (F.col("a.sz") + F.col("b.sz")).alias("__szsum"),
        )
        .groupBy("id_a", "id_b")
        .agg(F.min("__ub").alias("__ub"), F.first("__szsum").alias("__szsum"))
        .filter(
            F.col("__ub")
            >= F.ceil(
                F.lit(threshold / (1.0 + threshold)) * F.col("__szsum") - 1e-9
            )
        )
        .select("id_a", "id_b")
    )
    da = docs.select(F.col("id").alias("id_a"), F.col("sh").alias("sh_a"), F.col("sz").alias("sz_a"))
    db = docs.select(F.col("id").alias("id_b"), F.col("sh").alias("sh_b"), F.col("sz").alias("sz_b"))
    return (
        cand.join(da, "id_a")
        .join(db, "id_b")
        .withColumn(
            "n_common", F.size(F.array_intersect("sh_a", "sh_b")).cast("bigint")
        )
        .withColumn(
            "jaccard",
            F.col("n_common") / (F.col("sz_a") + F.col("sz_b") - F.col("n_common")),
        )
        .filter(F.col("jaccard") >= threshold)
        .select("id_a", "id_b", "n_common", "sz_a", "sz_b", "jaccard")
    )


def shingle_digest_rows(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    k: int = 3,
    distinct: bool = True,
    out_col: str = "gram",
) -> DataFrame:
    """(id, digest) rows — per document, the 60-bit integer md5 digest
    of each word k-shingle, as a NARROW Arrow projection.

    One mapInPandas pass tokenizes, joins k-grams, digests (md5 of the
    UTF-8 shingle — identical values to ``conv(substring(md5(t),1,15),
    16,10)``, so every SQL oracle replays unchanged) and emits the
    exploded rows directly. ``distinct`` dedups per document (the
    ngram_hashes contract). Documents shorter than k tokens emit no
    rows.

    NOT the hot-path form: a round-6 interleaved A/B at sf0.1 measured
    per-shingle Python hashlib ~2x slower than the JVM expression form
    (:func:`ngram_hashes`, which this briefly replaced in round 5) —
    JVM md5 wins for pure digest emission. Kept for callers that need
    the Arrow batch shape (custom per-batch fusion, non-long id
    passthrough without expression churn)."""

    def batches(it):
        import hashlib

        import pandas as pd

        for pdf in it:
            ids, grams = [], []
            for i, t in zip(pdf["__id"], pdf["__t"]):
                toks = t.split(" ")
                if len(toks) < k:
                    continue
                seen = set()
                for j in range(len(toks) - k + 1):
                    g = int(
                        hashlib.md5(" ".join(toks[j : j + k]).encode("utf-8"))
                        .hexdigest()[:15],
                        16,
                    )
                    if distinct:
                        if g in seen:
                            continue
                        seen.add(g)
                    ids.append(i)
                    grams.append(g)
            yield pd.DataFrame({"id": ids, out_col: grams})

    return (
        df.filter(F.col(text_col).isNotNull())
        .select(F.col(id_col).alias("__id"), F.col(text_col).alias("__t"))
        .mapInPandas(
            batches,
            schema=f"id {df.schema[id_col].dataType.simpleString()}, {out_col} long",
        )
    )


def ngram_hashes(
    df: DataFrame, text_col: str = "text", id_col: str = "doc_id", k: int = 4
) -> DataFrame:
    """(id, gram) pairs — one row per DISTINCT k-gram digest per doc.

    The shared primitive under decontamination (X17), novelty scoring
    (X18) and the memorization audit (X21). The digest is the 60-bit
    integer form of md5 — an 8-byte shuffle/join key instead of a
    32-char string (~25-40% off the gram joins, measured on q59/q60/q63
    at sf0.1); derivation stays md5-rooted so the oracle's own
    md5-string grams aggregate to identical counts (a 60-bit collision
    between distinct grams is ~n^2/2^61 and would surface in the
    cross-engine gate). Documents shorter than ``k`` tokens contribute
    no rows (:func:`shingles_of` guard).

    Form note (round-6 A/B): this is deliberately the JVM expression
    form — transform + md5 + conv inside explode — NOT the Arrow
    shingler (:func:`shingle_digest_rows`). Round 5 routed it through
    Arrow; an interleaved isolated A/B at sf0.1 measured the Python
    hashlib loop ~2x slower for this consumption shape (JVM 0.95 s vs
    Arrow 1.9 s steady-state on the q63 df-count + join-back), which
    showed up as the q59/q60/q63 bench regressions. JVM md5 beats
    per-shingle Python hashing even though the HOF lambda is
    interpreted; see docs/SCALE.md round-6 notes."""
    return (
        df.withColumn("__toks", F.split(F.col(text_col), " "))
        .select(
            F.col(id_col).alias("id"),
            F.explode(
                F.array_distinct(
                    F.transform(
                        shingles_of(F.col("__toks"), k),
                        md5_long60,
                    )
                )
            ).alias("gram"),
        )
    )


def contamination_fractions(
    candidates: DataFrame,
    benchmark: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    k: int = 4,
) -> DataFrame:
    """X17 — training-data decontamination: per candidate document, the
    fraction of its distinct k-grams that appear anywhere in the
    benchmark corpus (the published 13-gram-overlap check; ``k`` is a
    knob because the right n depends on document length).

    Scale: both sides reduce to (id, gram-hash) frames; the benchmark
    gram set is made distinct and LEFT-joined on the digest key — a
    plain shuffle join, NEVER a broadcast (benchmark suites are small
    today, corpus-sized tomorrow; boilerplate-gram skew is AQE's job).
    One aggregation per candidate doc closes the op.
    """
    cand = ngram_hashes(candidates, text_col, id_col, k)
    bench = (
        ngram_hashes(benchmark, text_col, id_col, k)
        .select("gram")
        .distinct()
        .withColumn("__hit", F.lit(1))
    )
    return (
        cand.join(bench, "gram", "left")
        .groupBy("id")
        .agg(
            F.count("*").cast("bigint").alias("n_grams"),
            F.sum(F.coalesce(F.col("__hit"), F.lit(0))).cast("bigint").alias(
                "n_contaminated"
            ),
        )
        .withColumn(
            "contamination", F.col("n_contaminated") / F.col("n_grams")
        )
    )


def novelty_fractions(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    k: int = 3,
) -> DataFrame:
    """X18 — n-gram novelty: per document, the fraction of its distinct
    k-grams whose FIRST corpus occurrence (minimum doc id) is this
    document. High-novelty docs introduce new content; near-zero
    novelty marks boilerplate/recombination — a curation signal
    complementary to near-dup clustering (which only fires on
    whole-document similarity).

    Scale: first-occurrence attribution is one ``min(id)`` hash
    aggregation over the (id, gram) frame, joined back on the digest
    key — two shuffles on a narrow key, no windows, no broadcast of
    corpus-sized state.
    """
    g = ngram_hashes(df, text_col, id_col, k)
    first = g.groupBy("gram").agg(F.min("id").alias("__first"))
    return (
        g.join(first, "gram")
        .groupBy("id")
        .agg(
            F.count("*").cast("bigint").alias("n_grams"),
            F.sum((F.col("id") == F.col("__first")).cast("int"))
            .cast("bigint")
            .alias("n_novel"),
        )
        .withColumn("novelty", F.col("n_novel") / F.col("n_grams"))
    )


def connected_components(
    pairs: DataFrame,
    id_a: str = "id_a",
    id_b: str = "id_b",
    max_iter: int = 50,
    persist_fn=None,
    stats: dict | None = None,
    driver_edge_cap: int | None = None,
) -> DataFrame:
    """Transitive closure of near-dup pairs -> duplicate components.

    Pairwise dedup (MinHash/SimHash/Jaccard) emits edges; a canonical
    "keep one copy per duplicate *set*" policy needs the connected
    components of that graph. Min-label propagation: every node starts
    labeled with its own id and repeatedly takes the min label among
    itself and its neighbors; at the fixpoint the label is the
    component's minimum member id (deterministic, order-independent).

    Scale: the Pregel-style loop with two critical mechanics.
    (1) **Lineage truncation**: every iteration ``localCheckpoint``s its
    label frame — the update references the previous labels twice (once
    to keep, once through the edge join), so an un-truncated logical
    plan DOUBLES per iteration; measured 1.3s -> 8.4s by iteration 4 and
    then driver OOM. Checkpointing pins each round's (id, comp) rows
    (narrow ints) and keeps per-iteration planning O(1). Checkpoints
    are **non-eager**: the convergence action that immediately follows
    materializes (and thereby checkpoints) the frame in the SAME job,
    halving the loop's job count versus eager checkpointing (measured
    4.7s -> 2.9s warm on the sf0.1 signature graph). The action
    computes every partition (a full sum), so the checkpoint is never
    left partial.
    (2) **Pointer jumping**: after the 1-hop neighbor-min, each node
    also takes its current label's label (``comp := comp(comp)``),
    compressing label chains so convergence is O(log diameter) rather
    than O(diameter) — near-dup chains (doc N ~ doc N+1) would
    otherwise force one iteration per hop. Convergence is the monotone
    label sum stabilizing (labels only ever decrease): one scalar
    action per iteration, never a collect of the data.

    ``stats``, when given, receives ``{"rounds": N}`` — the number of
    checkpoint rounds (two hop+jump steps each) the loop ran before the
    label sum stabilized. The O(log diameter) claim the 100 TB argument
    rests on is assertable through it (tests/test_properties.py pins a
    4096-node path graph to a logarithmic round count).

    ``persist_fn`` scopes the *final* frame like the other operators;
    intermediate checkpoint blocks are released by Spark's
    ContextCleaner once the loop's references drop. Raises if
    ``max_iter`` passes without convergence rather than returning a
    silently-partial clustering.

    ``driver_edge_cap`` (default ``$SPARK_GRAFT_CC_DRIVER_EDGE_CAP``,
    500_000): callers feed this operator the *contracted* duplicate
    graph (one node per distinct signature, not per document — q49
    collapses exact-signature cliques first), whose edge count the
    convergence probe's input materialization reveals for free. When
    that graph fits under the cap, the transitive closure is pure
    fixed-cost territory for a Pregel loop (measured at sf0.1: 4
    checkpoint rounds x ~1.6 s of scheduler/shuffle overhead on a
    4.6k-node / 35k-edge graph), so the closure runs as a driver-side
    min-label union-find over the collected edge list instead — the
    same label every fixpoint iteration converges to, bit-identical.
    Above the cap the distributed loop runs unchanged; the cap bounds
    driver memory (500k narrow edges ~ tens of MB) and is an env knob
    so cluster deployments can tune or disable (0) it. Pass ``0`` to
    force the distributed path (the property tests do, so the loop
    itself stays covered).

    Memory math behind the env ceiling (VERDICT r14 task 5): each
    collected half-edge is a Row of two ids (~150-250 B in the Python
    union-find with its dict entries), so the 5M ceiling bounds the
    driver working set at ~1 GB worst-case — a value above it is
    clamped, never honored, because an unbounded env knob would
    re-create the guide-§5 corpus-sized-collect hazard this default
    exists to avoid.
    """
    if driver_edge_cap is None:
        from ._env import env_capped_int

        driver_edge_cap = env_capped_int(
            "SPARK_GRAFT_CC_DRIVER_EDGE_CAP", 500_000, 5_000_000
        )
    edges = (
        pairs.select(F.col(id_a).alias("src"), F.col(id_b).alias("dst"))
        .union(pairs.select(F.col(id_b).alias("src"), F.col(id_a).alias("dst")))
        .distinct()
        .localCheckpoint(eager=False)
    )
    if driver_edge_cap > 0:
        # One narrow count materializes the checkpoint (work the first
        # loop aggregation would do anyway) and gates the dispatch.
        # Collect only the src <= dst half: edges is the bidirected
        # closure of ``pairs``, so that half is exactly the undirected
        # edge set with self-loops (isolated self-paired nodes) kept.
        n_edges = edges.count()
        if n_edges <= 2 * driver_edge_cap:
            half = edges.where(F.col("src") <= F.col("dst")).collect()
            parent: dict = {}

            def find(x):
                root = x
                while parent[root] != root:
                    root = parent[root]
                while parent[x] != root:
                    parent[x], x = root, parent[x]
                return root

            for row in half:
                a, b = row[0], row[1]
                if a not in parent:
                    parent[a] = a
                if b not in parent:
                    parent[b] = b
                ra, rb = find(a), find(b)
                if ra != rb:
                    # min-label union: the root is always the smaller
                    # id, so each tree root equals the component min
                    if rb < ra:
                        ra, rb = rb, ra
                    parent[rb] = ra
            rows = [(node, find(node)) for node in parent]
            rows.sort()
            if stats is not None:
                stats["rounds"] = 0
                stats["driver_path"] = True
            id_type = edges.schema["src"].dataType
            out_schema = T.StructType(
                [
                    T.StructField("id", id_type, False),
                    T.StructField("comp", id_type, False),
                ]
            )
            labels = edges.sparkSession.createDataFrame(rows, out_schema)
            return persist_fn(labels) if persist_fn is not None else labels
    # init = identity labels with the first hop folded in (min of self
    # and direct neighbors): one aggregation replaces a whole first
    # round, and every node appears as src (edges are bidirected)
    labels = (
        edges.groupBy("src")
        .agg(F.min("dst").alias("__m"))
        .select(
            F.col("src").alias("id"),
            F.least(F.col("src"), F.col("__m")).alias("comp"),
        )
        .localCheckpoint(eager=False)
    )
    def hop_and_jump(lbl):
        nbr = (
            edges.join(lbl, edges["dst"] == lbl["id"])
            .groupBy("src")
            .agg(F.min("comp").alias("nbr_comp"))
        )
        hopped = lbl.join(nbr, lbl["id"] == nbr["src"], "left").select(
            lbl["id"],
            F.least(F.col("comp"), F.coalesce("nbr_comp", F.col("comp"))).alias("comp"),
        )
        parents = hopped.select(F.col("id").alias("p_id"), F.col("comp").alias("p_comp"))
        return hopped.join(parents, hopped["comp"] == parents["p_id"], "left").select(
            hopped["id"],
            F.least(F.col("comp"), F.coalesce("p_comp", F.col("comp"))).alias("comp"),
        )

    # two hop+jump steps per checkpoint round: the per-round fixed
    # cost (one fused checkpoint+convergence job) dominates on small
    # graphs, and two un-truncated steps only grow the transient
    # plan by a constant factor (x3 measured 49.9s vs 7.8s — no)
    from ._iterate import iterate_until_fixpoint

    labels = iterate_until_fixpoint(
        labels,
        step_fn=lambda lbl: hop_and_jump(hop_and_jump(lbl)),
        probe_fn=lambda lbl: lbl.agg(F.sum("comp")).collect()[0][0],
        max_iter=max_iter,
        stats=stats,
        what="label propagation",
    )
    return persist_fn(labels) if persist_fn is not None else labels


def incremental_dedup_report(
    corpus: DataFrame,
    batch: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """X19 — incremental-ingestion dedup: classify every BATCH document
    against an already-ingested CORPUS. Statuses: ``dup_corpus`` (exact
    text digest already present in the corpus), ``dup_batch`` (digest
    unseen in the corpus but another batch doc with a smaller id carries
    it), ``kept`` (first occurrence anywhere). This is the day-2 shape
    of exact dedup (:func:`exact_dedup` is the day-0 batch form): a
    training pipeline re-runs per crawl snapshot and must not re-admit
    content it already holds.

    Scale: both sides reduce to 32-char md5 digests before any join —
    the corpus side additionally collapses to DISTINCT digests, so the
    join state is one narrow row per unique document ever seen, not per
    document. Both joins shuffle on the digest key (the corpus frame is
    corpus-sized — never broadcast); within-batch keep-first is one
    min() hash aggregation. No windows, no driver state.
    """
    # NULL text digests to a NUL-byte sentinel (never a valid md5 hex):
    # md5(NULL) is NULL, and NULL join keys never match while NULL
    # dedup keys all merge — the two paths would disagree on whether
    # NULL-text documents are "the same". With the sentinel they are
    # consistently treated as identical empty content everywhere.
    digest = F.coalesce(F.md5(F.col(text_col)), F.lit("null:\x00"))
    seen = corpus.select(digest.alias("digest")).distinct().withColumn(
        "__seen", F.lit(1)
    )
    # Keep id_col's own name throughout: renaming it to "id" would
    # silently create a duplicate column whenever the batch already
    # carries an unrelated "id", making every later reference ambiguous.
    b = batch.withColumn("digest", digest)
    first = b.groupBy("digest").agg(F.min(id_col).alias("__keep"))
    return (
        b.join(seen, "digest", "left")
        .join(first, "digest")
        .withColumn(
            "status",
            F.when(F.col("__seen").isNotNull(), F.lit("dup_corpus"))
            .when(F.col(id_col) != F.col("__keep"), F.lit("dup_batch"))
            .otherwise(F.lit("kept")),
        )
        .drop("__seen", "__keep")
    )


def singleton_gram_stats(
    df: DataFrame, text_col: str = "text", id_col: str = "doc_id", k: int = 3
) -> DataFrame:
    """X21 — memorization-risk audit: per document, how many of its
    distinct k-grams are GLOBALLY unique (document frequency == 1 across
    the corpus). A document dominated by singleton grams is the content
    a model can only reproduce by memorizing — the inverse signal of
    the boilerplate/contamination family, and the standard pre-training
    audit for PII-adjacent leakage risk. Distinct from
    :func:`novelty_fractions`: a novel gram may later repeat (min-id
    attribution); a singleton gram never does.

    Scale: one document-frequency hash aggregation over the (id, gram)
    digest frame (``ngram_hashes`` emits distinct grams per doc, so
    count(*) IS document frequency), joined back on the digest key and
    closed with one per-doc aggregation — two narrow-key shuffles, no
    windows, no broadcast of corpus-sized state.
    """
    g = ngram_hashes(df, text_col, id_col, k)
    dfreq = g.groupBy("gram").agg(F.count("*").alias("__df"))
    return (
        g.join(dfreq, "gram")
        .groupBy("id")
        .agg(
            F.count("*").cast("bigint").alias("n_grams"),
            F.sum((F.col("__df") == 1).cast("int")).cast("bigint").alias("n_singleton"),
        )
        .withColumn("risk", F.col("n_singleton") / F.col("n_grams"))
    )


def duplicated_spans(
    df: DataFrame,
    k: int = 5,
    min_count: int = 2,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """X42 — duplicated-span detection (the exact-substring-dedup shape
    of Lee et al., "Deduplicating Training Data Makes Language Models
    Better", ACL 2022 — public): find, per document, every maximal run
    of overlapping ``k``-gram shingles whose gram occurs >= ``min_count``
    times corpus-wide, and report it as a token span. Gram-level hits
    (q66's unit) fragment one long copied passage into dozens of rows;
    merging adjacent hit positions (gaps-and-islands) recovers the
    passage boundaries a surgical span-removal pass needs.

    Scale: positional grams are row-local (posexplode over the shingle
    array — token array materialized once); the gram-frequency hash agg
    and the join-back ride the same 60-bit digest key as
    :func:`ngram_hashes` (8-byte shuffle rows). The island merge is two
    windows partitioned by the DOC id — corpus-cardinality key, so
    parallelism grows with the data; each window sorts only one doc's
    hit positions (bounded by doc length). Output is one row per merged
    span, strictly fewer rows than the gram hits it consumed.
    """
    d = df.withColumn("__toks", F.split(F.col(text_col), " "))
    # g feeds the gram-frequency agg AND the hit probe side; without a
    # persist the tokenize + shingle + per-gram md5 explode runs twice
    # (unlike q149's cheap substring grams, the md5 digesting here is
    # expensive enough to beat the cache write — interleaved A/B at
    # sf0.1: 4.26 s -> 2.78 s median).
    g = default_persist(
        d.select(
            F.col(id_col).alias("id"),
            F.posexplode(
                F.transform(
                    shingles_of(F.col("__toks"), k),
                    md5_long60,
                )
            ).alias("pos", "gram"),
        )
    )
    freq = g.groupBy("gram").agg(F.count("*").alias("__c"))
    hits = g.join(freq.filter(F.col("__c") >= min_count).select("gram"), "gram")
    w = Window.partitionBy("id").orderBy("pos")
    run = Window.partitionBy("id").orderBy("pos").rowsBetween(
        Window.unboundedPreceding, 0
    )
    # islands merge while gram EXTENTS overlap (gap <= k-1), not only
    # while gram positions are adjacent: hits at positions p and p+k-1
    # cover overlapping token ranges, and a span report with overlapping
    # rows is useless to a surgical removal pass. With gap > k-1 the
    # next span's first token starts strictly after the previous span's
    # last, so output spans are disjoint by construction
    # (property-tested).
    isl = (
        hits.withColumn("__prev", F.lag("pos").over(w))
        .withColumn(
            "__new",
            F.when(
                F.col("__prev").isNull()
                | (F.col("pos") - F.col("__prev") > k - 1),
                1,
            ).otherwise(0),
        )
        .withColumn("__isl", F.sum("__new").over(run))
    )
    return (
        isl.groupBy("id", "__isl")
        .agg(
            F.min("pos").cast("bigint").alias("span_start"),
            (F.max("pos") + F.lit(k - 1)).cast("bigint").alias("span_end"),
            F.count("*").cast("bigint").alias("n_grams"),
        )
        .select(
            F.col("id").alias(id_col),
            "span_start",
            "span_end",
            (F.col("span_end") - F.col("span_start") + 1).alias("n_tokens"),
            "n_grams",
        )
    )


def split_gram_overlap(
    df: DataFrame,
    split_col: Column,
    k: int = 13,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """X46 — cross-split leakage audit: for every pair of dataset splits,
    count the distinct ``k``-grams present in BOTH. The companion check
    to the leakage-safe split (X36): the splitter *prevents* same-entity
    leakage by construction, this op *measures* whatever residual n-gram
    overlap made it through (shared boilerplate, independently-crawled
    copies on different domains) — the number an eval-integrity report
    has to publish. 13-gram default matches the decontamination
    convention (X17 / GPT-3 appendix).

    Scale: the gram frame is (split, 60-bit digest) distinct rows — the
    same 8-byte key family as :func:`ngram_hashes`; the overlap is a
    digest-keyed self-join (equi, shuffle-partitioned, never all-pairs
    across docs) followed by one tiny agg keyed on the split pair
    (#splits^2 rows). Gram multiplicity inside a split is collapsed
    BEFORE the join (distinct), so join fan-out is bounded by
    #splits per gram, not document frequency.
    """
    g = (
        df.withColumn("__split", split_col)
        .withColumn("__toks", F.split(F.col(text_col), " "))
        .select(
            F.col("__split"),
            F.explode(
                F.array_distinct(
                    F.transform(
                        shingles_of(F.col("__toks"), k),
                        lambda t: F.conv(
                            F.substring(F.md5(t), 1, 15), 16, 10
                        ).cast("long"),
                    )
                )
            ).alias("gram"),
        )
    )
    # Round 14 (guide §2.1/§2.4): the original (split, gram) distinct +
    # digest-keyed self-join fed BOTH join sides from the unpersisted
    # gram frame — the whole explode + per-gram md5 subtree executed
    # twice (the q73/q27/q111/q82 duplicated-subtree class), and the
    # distinct + two join sides cost three gram-keyed exchanges. One
    # groupBy(gram).collect_set(split) now does the dedup AND the
    # set-building in a single exchange (partial aggregation bounds
    # map-side sets at #splits, absorbing boilerplate-gram skew); the
    # ordered split pairs expand ROW-LOCALLY from the set (y > x on
    # the labels == the old split_a < split_b join filter; per-gram
    # set semantics keep each gram contributing at most once per pair,
    # exactly like the old distinct), so per-pair counts are
    # identical. Split sets are #splits-bounded (tiny) arrays; the
    # pair lambda is interpreted but O(#splits^2) per gram.
    sa = g.groupBy("gram").agg(
        F.sort_array(F.collect_set("__split")).alias("__ss")
    )
    pairs = sa.select(
        F.explode(
            F.flatten(
                F.transform(
                    F.col("__ss"),
                    lambda x: F.transform(
                        F.filter(F.col("__ss"), lambda y: y > x),
                        lambda y: F.struct(
                            x.alias("split_a"), y.alias("split_b")
                        ),
                    ),
                )
            )
        ).alias("__p")
    )
    return (
        pairs.select("__p.split_a", "__p.split_b")
        .groupBy("split_a", "split_b")
        .agg(F.count("*").cast("bigint").alias("n_shared_grams"))
    )


def tfidf_cosine_pairs(
    df: DataFrame,
    threshold: float = 0.9,
    text_col: str = "text",
    id_col: str = "doc_id",
    persist_fn=None,
    candidate_budget: int | None = None,
) -> DataFrame:
    """X58 — weighted (TF-IDF) cosine similarity join with a LOSSLESS
    prefix filter (the AllPairs family, Bayardo et al. WWW 2007 —
    public): all document pairs whose unit-normalized TF-IDF vectors
    have cosine >= ``threshold``. The weighted complement of the PPJoin
    Jaccard join (q27): near-dup detection that values rare terms over
    boilerplate.

    Losslessness argument (docstring-level proof): fix the global token
    order (df asc, tok asc — rarest first). Split each unit vector into
    the head ("prefix") and the minimal tail with L2 norm < tau/2.
    For any pair whose prefixes share NO token, every common token
    involves at least one tail, so dot <= ||xs||*||y|| + ||x||*||ys||
    < tau/2 + tau/2 = tau. Contrapositive: every qualifying pair shares
    a prefix token — candidates from the prefix self-join are complete,
    and the exact verify keeps only true pairs. Equality with the
    brute-force relational form is therefore exact (the q82-style
    oracle check).

    Scale: TF/DF/norms are hash aggs; prefix selection is one window
    per DOC (corpus-cardinality key) holding that doc's token list; the
    candidate join runs on PREFIX tokens only — by construction the
    rarest tokens, so the per-token join fan-out (df_prefix^2) is the
    small end of the Zipf curve, while stop-token blowup lands in the
    tail the filter never indexes. Verify is two id-keyed equi joins +
    one agg per candidate pair. On pathological flat-weight corpora
    (uniform document frequency — every token equally common, so no
    token is rare) prefixes approach whole documents and pruning
    degrades gracefully to the exact relational join — never to wrong
    answers, but quadratic in candidate pairs. That failure mode is a
    TESTED CONTRACT, not prose: pass ``candidate_budget`` to make the
    operator pre-count the prefix-join fan-out (one cheap per-token
    hash agg: sum over tokens of C(df_prefix, 2), an upper bound on
    candidate pairs before dedup) and raise ``ValueError`` BEFORE the
    quadratic join is ever scheduled when the bound exceeds the budget
    — the 100 TB-safe mode. ``candidate_budget=None`` (default) keeps
    the quadratic-with-correct-answers degradation for bounded inputs.
    See tests/test_extensions.py::test_tfidf_cosine_pairs_uniform_df_stress.
    N (the corpus count) and the 1-row bound count are collected
    driver-side — the 1-scalar bounded-control-state convention
    (k-means/BPE).
    """
    n = df.count()
    toks = df.select(
        F.col(id_col).alias("id"),
        F.explode(F.split(F.col(text_col), " ")).alias("tok"),
    )
    tf = toks.groupBy("id", "tok").agg(F.count("*").alias("__tf"))
    dfreq = tf.groupBy("tok").agg(F.count("*").alias("__df"))
    w = tf.join(dfreq, "tok").withColumn(
        "__w",
        F.col("__tf").cast("double")
        * F.log(F.lit(1.0) + F.lit(float(n)) / F.col("__df").cast("double")),
    )
    nrm = w.groupBy("id").agg(F.sqrt(F.sum(F.col("__w") * F.col("__w"))).alias("__nrm"))
    u = (
        w.join(nrm, "id")
        .withColumn("__uw", F.col("__w") / F.col("__nrm"))
        .select("id", "tok", "__df", "__uw")
    )
    # u feeds the prefix window and BOTH verify sides; without
    # materialization the tf/df/norm chain replays three times
    # (measured 92 static exchanges). persist_fn follows the
    # ppjoin/js_divergence convention. Cache lifecycle is CALLER-OWNED:
    # the returned plan references the cached frame, so it cannot be
    # unpersisted here — pass persist_fn (e.g. queries._cache_scoped,
    # released on the next declared query) from long-lived sessions.
    # The default path registers with the _persist registry (drained by
    # queries.release_caches).
    _owned = persist_fn is None
    if _owned:
        persist_fn = default_persist
    u = persist_fn(u)
    # prefix: under (df asc, tok asc), keep rows whose inclusive
    # reverse-cumulative squared mass >= (tau/2)^2 — the excluded tail
    # then has norm < tau/2 (see the losslessness argument above)
    w_rev = (
        Window.partitionBy("id")
        .orderBy(F.col("__df").desc(), F.col("tok").desc())
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    bound_sq = (threshold / 2.0) ** 2
    # prefix feeds BOTH candidate-join sides and the budget-guard bound
    # count — three computations of the per-doc reverse-mass window over
    # the cached u without a persist (the q27 prefix-frame class).
    # default_persist: the caller's persist_fn already scopes u.
    prefix = default_persist(
        u.withColumn("__rev_sq", F.sum(F.col("__uw") * F.col("__uw")).over(w_rev))
        .filter(F.col("__rev_sq") >= F.lit(bound_sq))
        .select("id", "tok")
    )
    if candidate_budget is not None:
        bound = (
            prefix.groupBy("tok")
            .agg(F.count("*").alias("__dfp"))
            .agg(
                F.sum(
                    F.col("__dfp") * (F.col("__dfp") - F.lit(1)) / F.lit(2)
                ).alias("__pairs")
            )
            .collect()[0]["__pairs"]
        )
        if bound is not None and bound > candidate_budget:
            prefix.unpersist()
            if _owned:
                # eager cleanup on the abort path; the registry's later
                # duplicate unpersist is a no-op
                u.unpersist()
            raise ValueError(
                "tfidf_cosine_pairs: prefix-join candidate bound "
                f"{int(bound)} exceeds candidate_budget={candidate_budget} "
                "(uniform-df/adversarial corpus — the prefix filter cannot "
                "prune; raise the budget, raise the threshold, or pre-filter "
                "boilerplate tokens)"
            )
    cand = (
        prefix.alias("pa")
        .join(prefix.alias("pb"), "tok")
        .filter(F.col("pa.id") < F.col("pb.id"))
        .select(F.col("pa.id").alias("id_a"), F.col("pb.id").alias("id_b"))
        .distinct()
    )
    ua = u.select(F.col("id").alias("id_a"), "tok", F.col("__uw").alias("__wa"))
    ub = u.select(F.col("id").alias("id_b"), "tok", F.col("__uw").alias("__wb"))
    return (
        cand.join(ua, "id_a")
        .join(ub, ["id_b", "tok"])
        .groupBy("id_a", "id_b")
        .agg(F.round(F.sum(F.col("__wa") * F.col("__wb")), 4).alias("cosine"))
        .filter(F.col("cosine") >= threshold)
    )


def blocked_levenshtein_pairs(
    df: DataFrame,
    id_col: str = "c_custkey",
    name_col: str = "c_name",
    block_prefix_len: int = 16,
    max_dist: int = 1,
    block_expr: Column | None = None,
) -> DataFrame:
    """X66 — blocking-key entity resolution: candidate record pairs
    share a blocking key (a ``block_prefix_len`` name prefix — the
    classic sorted-neighborhood/standard-blocking key, public record-
    linkage practice since Fellegi-Sunter), verified with the exact
    Levenshtein edit distance <= ``max_dist``. Returns
    (id_a, id_b, dist) with id_a < id_b.

    Recall caveat (stated, not hidden): prefix blocking misses true
    matches whose edits fall INSIDE the prefix. Production recall at
    100 TB stacks several cheap keys (prefix, suffix, phonetic code)
    as union'd blocking passes — :func:`multi_pass_entity_pairs`
    composes this operator over a list of ``block_expr`` keys and
    dedups the union on (id_a, id_b).

    Scale: the join runs on the narrow (id, name, block) frame —
    block-key equi-shuffle, never a cross join; per-block work is
    C(block_size, 2) Levenshtein evaluations (JVM codegen), so the
    block key must be chosen to bound block size (longer prefix =
    smaller blocks = less recall), the PPJoin-style tradeoff. A hot
    block (shared boilerplate prefix) is the skew axis — lengthen the
    prefix or add a secondary key component.
    """
    if block_expr is None:
        block_expr = F.substring(F.col(name_col), 1, block_prefix_len)
    b = df.select(
        F.col(id_col).alias("id"),
        F.col(name_col).alias("nm"),
        block_expr.alias("blk"),
    )
    pa, pb = b.alias("pa"), b.alias("pb")
    return (
        pa.join(pb, "blk")
        .filter(F.col("pa.id") < F.col("pb.id"))
        .withColumn(
            "dist", F.levenshtein(F.col("pa.nm"), F.col("pb.nm")).cast("int")
        )
        .filter(F.col("dist") <= max_dist)
        .select(
            F.col("pa.id").alias("id_a"), F.col("pb.id").alias("id_b"), "dist"
        )
    )


def multi_pass_entity_pairs(
    df: DataFrame,
    block_exprs: list,
    id_col: str = "c_custkey",
    name_col: str = "c_name",
    max_dist: int = 1,
) -> DataFrame:
    """X66 (multi-pass form) — the production-recall composition the
    single-pass docstring points at: run :func:`blocked_levenshtein_pairs`
    once per blocking key (e.g. name prefix AND name suffix — a suffix
    block catches edits that fall inside the prefix and vice versa),
    union the pass outputs and keep each pair once. A pair is missed
    only if its edits break EVERY key — recall stacks multiplicatively
    per independent key while each pass stays block-bounded.

    Scale: each pass is the bounded block-join of the single-pass
    operator; the union is pass-count linear and the final dedup
    groups on the (id_a, id_b) pair key. Exactness: distance is
    re-verified per pass, so min(dist) over passes is the exact
    Levenshtein distance wherever a pair surfaces.
    """
    out = None
    for expr in block_exprs:
        p = blocked_levenshtein_pairs(
            df, id_col=id_col, name_col=name_col, max_dist=max_dist,
            block_expr=expr,
        )
        out = p if out is None else out.unionByName(p)
    return out.groupBy("id_a", "id_b").agg(F.min("dist").cast("int").alias("dist"))


def minhash_lsh_pairs(
    df: DataFrame,
    threshold: float = 0.5,
    n_bands: int = 8,
    rows_per_band: int = 2,
    k: int = 3,
    text_col: str = "text",
    id_col: str = "doc_id",
    persist_fn=None,
) -> DataFrame:
    """X74 — the full banded MinHash+LSH pipeline (Broder 1997 resemblance
    sketches + the banding trick, MMDS ch.3 — public), completing the X2
    family's shingle -> minhash -> band -> bucket-join bullet beyond the
    deterministic 1-permutation form: ``n_bands * rows_per_band``
    deterministic permutations via Kirsch-Mitzenmacher double hashing
    (ESA 2006 — public; the standard way Bloom filters and MinHash get
    k hashes from one): permutation i of shingle digest d is
    ``(h1(d) + i * h2(d)) mod P`` where h1/h2 are two 28-bit md5
    substrings and P = 1073741789 (prime < 2^30) — ONE md5 per gram
    instead of n_perms, every value replayable by the oracle. Per-band
    key = md5 of that band's ``rows_per_band`` mins, candidates share
    ANY band key, then an EXACT set-Jaccard verify on candidate pairs
    only. (The 30-bit permutation domain collides distinct grams with
    probability ~|grams|^2/2^31 per document — immaterial for minhash,
    and identical in both engines.)

    Collision probability follows the standard S-curve
    ``1 - (1 - j^r)^b`` (b=8, r=2 puts the 50% knee near j=0.29, ~99%
    at j=0.7); the verify makes every EMITTED pair exact, banding only
    bounds recall — tune (b, r) to place the knee below ``threshold``.

    Scale: the signature matrix is b*r longs per doc computed in one
    narrow projection (the distinct-digest array is materialized once —
    the no-CSE-in-lambdas rule); the candidate join runs on
    (band, 32-char key) — never on shingles — and the gram-set arrays
    rehydrate for CANDIDATE pairs only. Same contract as the q47 banded
    SimHash and q73 banded SRP joins: sub-quadratic by construction,
    bucket skew governed by the band-key entropy (r mins per key).
    """
    n_perms = n_bands * rows_per_band
    base = (
        df.withColumn("__toks", F.split(F.col(text_col), " "))
        .filter(F.size("__toks") >= k)
        .select(
            F.col(id_col).alias("id"),
            F.array_distinct(
                F.transform(shingles_of(F.col("__toks"), k), F.md5)
            ).alias("__ds"),
        )
    )
    # base (the shingle-digest arrays) feeds the signature chain AND
    # both verify sides — 3x shingle+md5 replay without materialization.
    # persist_fn follows the ppjoin/tfidf caller-owned convention.
    if persist_fn is None:
        persist_fn = default_persist  # registered; released via release_default_persists
    base = persist_fn(base)
    # signature matrix via explode + ONE hash agg with n_perms min()
    # columns (the repo's HOF-vs-explode rule: whole-stage codegen, and
    # the agg's id-key exchange is reused by the verify joins). One md5
    # per gram: h1/h2 are 28-bit substrings of the digest the gram
    # array already carries; perm i is the KM affine combination -
    # 16 integer ops instead of 16 md5s (interleaved A/B at sf0.1:
    # 8.9 s HOF 16-md5 -> 7.2 s explode 16-md5 -> this form).
    km_p = 1073741789
    grams = base.select("id", F.explode("__ds").alias("__d")).select(
        "id",
        F.conv(F.substring("__d", 1, 7), 16, 10).cast("long").alias("__h1"),
        F.conv(F.substring("__d", 17, 7), 16, 10).cast("long").alias("__h2"),
    )
    # The signature matrix feeds BOTH sides of the banded candidate
    # self-join (via the band posexplode); unpersisted, the gram
    # explode + n_perms-min aggregation recomputes per side (two full
    # subtree copies in the executed plan — the q73/q27 class).
    # Persist at the narrowest point: one row of n_perms longs per doc;
    # the per-side posexplode is a row-local rehydrate from the cache.
    # default_persist (inner intermediate), not the caller's scoped
    # persist_fn, which must keep scoping only the base gram arrays.
    sig = default_persist(
        grams.groupBy("id").agg(
            *[
                F.min(
                    F.pmod(F.col("__h1") + F.lit(i) * F.col("__h2"), F.lit(km_p))
                ).alias(f"__m{i}")
                for i in range(n_perms)
            ]
        )
    )
    band_keys = F.array(
        *[
            F.md5(
                F.concat_ws(
                    "-",
                    *[
                        F.col(f"__m{b * rows_per_band + r}").cast("string")
                        for r in range(rows_per_band)
                    ],
                )
            )
            for b in range(n_bands)
        ]
    )
    bands = sig.select(
        "id", F.posexplode(band_keys).alias("band", "key")
    )
    cand = (
        bands.alias("ba")
        .join(bands.alias("bb"), ["band", "key"])
        .filter(F.col("ba.id") < F.col("bb.id"))
        .select(F.col("ba.id").alias("id_a"), F.col("bb.id").alias("id_b"))
        .distinct()
    )
    sets = base.select(F.col("id"), F.col("__ds"))
    return (
        cand.join(sets.select(F.col("id").alias("id_a"), F.col("__ds").alias("__sa")), "id_a")
        .join(sets.select(F.col("id").alias("id_b"), F.col("__ds").alias("__sb")), "id_b")
        .withColumn("n_common", F.size(F.array_intersect("__sa", "__sb")).cast("bigint"))
        .withColumn("__union", F.size(F.array_union("__sa", "__sb")))
        .withColumn(
            "jaccard",
            F.round(F.col("n_common") / F.col("__union"), 4),
        )
        .filter(F.col("jaccard") >= threshold)
        .select("id_a", "id_b", "n_common", "jaccard")
    )


def containment_pairs(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    k: int = 3,
    threshold: float = 0.6,
    persist_fn=None,
) -> DataFrame:
    """X80 — exact shingle CONTAINMENT pairs: emit (id_a, id_b,
    containment) for every ordered pair with
    C(A,B) = |S(A) ∩ S(B)| / |S(A)| >= threshold, id_a != id_b.
    Containment is Broder's asymmetric resemblance twin (SEQUENCES
    '97, public): it catches near-SUBSET documents — a quote, an
    excerpt, a doc embedded in a boilerplate wrapper — that symmetric
    Jaccard misses (a small doc inside a big one has tiny Jaccard but
    containment ~1 on the small side).

    Scale shape (the PPJoin argument, asymmetricized): order A's
    shingles by ascending global document frequency; A PROBES with
    only its first |A| - ceil(t*|A|) + 1 rarest shingles (pigeonhole:
    any B sharing >= ceil(t*|A|) of A's shingles must hit that
    prefix), while B INDEXES all shingles. Probe keys are rare by
    construction, so no hot join key; the exact verify
    (array_intersect over the packed 60-bit digest arrays) touches
    candidates only. Two narrow (id, digest) shuffles + the
    candidate-key shuffle, like :func:`ngram_jaccard_pairs_prefix` —
    whose persist convention (caller-scoped ``persist_fn``) this
    follows.
    """
    docs = (
        df.withColumn("__toks", F.split(F.col(text_col), " "))
        .filter(F.size("__toks") >= k)
        .select(
            F.col(id_col).alias("id"),
            F.array_distinct(
                F.transform(shingles_of(F.col("__toks"), k), md5_long60)
            ).alias("sh"),
        )
        .withColumn("sz", F.size("sh"))
    )
    if persist_fn is None:
        persist_fn = default_persist  # registered; released via release_default_persists
    docs = persist_fn(docs)
    ex = docs.select("id", "sz", F.explode("sh").alias("s"))
    dfreq = ex.groupBy("s").agg(F.count("*").alias("df"))
    w = Window.partitionBy("id").orderBy(F.col("df").asc(), F.col("s").asc())
    prefix_len = F.col("sz") - F.ceil(F.lit(threshold) * F.col("sz")) + 1
    probe = (
        ex.join(dfreq, "s")
        .withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") <= prefix_len)
        .select(F.col("id").alias("id_a"), "s", F.col("sz").alias("__pa"))
    )
    index = ex.select(F.col("id").alias("id_b"), "s", F.col("sz").alias("__pb"))
    # Size filter at candidate generation (round 15, §2.3/§3.2):
    # |A ∩ B| <= |B|, so containment |A∩B|/|A| can reach the rounded
    # >= threshold output cut only when |B| >= (threshold - 1e-4)|A| —
    # the same strictly-below-the-ROUND(,4)-survival-boundary epsilon
    # as the q73 in-bucket pre-cut, so no survivor is dropped for ANY
    # threshold. Measured at sf0.1 (threshold 0.6): 692,621 -> 569,788
    # candidate pairs (-18%) before the exact verify; both sz columns
    # ride join inputs that already carried the gram row, no new
    # exchange.
    cand = (
        probe.join(index, "s")
        .filter(
            (F.col("id_a") != F.col("id_b"))
            & (
                F.col("__pb")
                >= (F.lit(threshold) - F.lit(1e-4)) * F.col("__pa")
            )
        )
        .select("id_a", "id_b")
        .distinct()
    )
    a = docs.select(
        F.col("id").alias("id_a"), F.col("sh").alias("__sha"), F.col("sz").alias("__sza")
    )
    b = docs.select(F.col("id").alias("id_b"), F.col("sh").alias("__shb"))
    return (
        cand.join(a, "id_a")
        .join(b, "id_b")
        .withColumn(
            "containment",
            F.round(
                F.size(F.array_intersect("__sha", "__shb"))
                / F.col("__sza"),
                4,
            ),
        )
        .filter(F.col("containment") >= threshold)
        .select("id_a", "id_b", "containment")
    )


def qgram_edit_join(
    df: DataFrame,
    id_col: str = "c_custkey",
    str_col: str = "c_name",
    q: int = 3,
    max_dist: int = 1,
    persist_fn=None,
) -> DataFrame:
    """X113 — RECALL-COMPLETE edit-distance similarity join via q-gram
    count filtering + prefix filtering (Gravano et al. VLDB 2001;
    Chaudhuri/Ganti/Kaushik SSJoin ICDE 2006; Xiao/Wang/Lin Ed-Join
    VLDB 2008 — all public). The exactness upgrade over X66's prefix
    BLOCKING (:func:`blocked_levenshtein_pairs`): blocking misses true
    matches whose edits fall inside the blocking key; this operator
    provably emits EVERY pair with ``levenshtein <= max_dist``.

    Theory: one edit destroys at most ``q`` of a string's positional
    q-grams, so ``ed(s,t) <= d`` implies the gram MULTISETS overlap in
    at least ``max(|G_s|,|G_t|) - q*d`` grams. Occurrence-numbering
    each gram (token = (gram, k) for the k-th occurrence) turns the
    multiset overlap into plain token-set overlap, and the standard
    prefix-filter theorem then guarantees: order every string's tokens
    by one global total order (corpus frequency asc, token asc) and
    keep the first ``q*d + 1`` — any qualifying pair MUST share a
    prefix token. Strings too short for the count bound to bite
    (``n_grams <= q*d``, i.e. len < q*(d+1)) are routed through an
    exhaustive short-string block instead — a bounded universe
    (at most |alphabet|^(q*(d+1)-1) distinct values), so the all-pairs
    fallback contracts by value first at scale and never touches the
    long tail. Candidates are then verified with the exact JVM
    ``levenshtein``; output is (id_a, id_b, dist), id_a < id_b.

    Scale: the candidate join runs on the PREFIX frame — q*d+1 rows
    per string, keyed by the corpus-RAREST tokens by construction
    (that is the entire point of the global frequency order: hot
    grams never become join keys). Length filter |len_a - len_b| <= d
    is pushed into the join. Skew axis: a low-entropy corpus (shared
    boilerplate) concentrates even rare tokens — raise ``q`` to widen
    the token universe (q=3 default here for digit-heavy name data;
    the PPJoin/Ed-Join tradeoff). Occurrence numbering and prefix
    selection are ROW-LOCAL array ops (no ranking windows — the X16
    rule); the token-frequency agg is a corpus contraction to the gram
    universe; the verify runs threshold-levenshtein BEFORE the pair
    dedup so the only large shuffle moves survivors.
    """
    qd = q * max_dist
    base = df.select(
        F.col(id_col).alias("id"),
        F.col(str_col).alias("nm"),
        F.length(str_col).alias("ln"),
    )
    # occurrence numbering happens ROW-LOCALLY in the array domain
    # (k = 1 + count of equal grams before this position — O(len^2)
    # per string, trivially small for the short-key strings edit joins
    # exist for) instead of a corpus-wide window: no shuffle at all
    # until the frequency agg. __ga is materialized as a column first
    # (the no-CSE-in-lambdas rule).
    ga = F.expr(
        f"transform(sequence(1, greatest(length(nm) - {q} + 1, 1)),"
        f" i -> substring(nm, i, {q}))"
    )
    toks = (
        base.withColumn("__ga", ga)
        .select(
            "id",
            "nm",
            "ln",
            F.explode(
                F.expr(
                    "transform(__ga, (g, i) -> concat_ws('#', g,"
                    " cast(size(filter(slice(__ga, 1, i), x -> x = g)) + 1"
                    " as string)))"
                )
            ).alias("tok"),
        )
    )
    n_grams = F.greatest(F.col("ln") - F.lit(q) + F.lit(1), F.lit(1))
    long_toks = toks.filter(n_grams > qd)
    short = base.filter(n_grams <= qd)
    freq = long_toks.groupBy("tok").agg(F.count("*").alias("__f"))
    # per-string prefix = the qd+1 (freq, token)-smallest tokens: ONE
    # hash agg + a row-local array_sort over the ~|grams| structs —
    # not a corpus-wide ranking window (the X16 rule).
    prefix = (
        long_toks.join(freq, "tok")
        .groupBy("id", "nm", "ln")
        .agg(
            F.slice(
                F.array_sort(F.collect_list(F.struct("__f", "tok"))),
                1,
                qd + 1,
            ).alias("__pf")
        )
        .select("id", "nm", "ln", F.explode("__pf.tok").alias("tok"))
    )
    # prefix feeds BOTH candidate-join sides and the mixed branch —
    # persist once (caller-owned persist_fn convention).
    if persist_fn is None:
        persist_fn = default_persist  # registered; released via release_default_persists
    prefix = persist_fn(prefix)
    pa = prefix.select(
        F.col("id").alias("id_a"), F.col("nm").alias("__na"),
        F.col("ln").alias("__la"), "tok",
    )
    pb = prefix.select(
        F.col("id").alias("id_b"), F.col("nm").alias("__nb"),
        F.col("ln").alias("__lb"), "tok",
    )
    cand_long = (
        pa.join(pb, "tok")
        .filter(
            (F.col("id_a") < F.col("id_b"))
            & (F.abs(F.col("__la") - F.col("__lb")) <= max_dist)
        )
        .select("id_a", "id_b", "__na", "__nb")
    )
    # short x short exhaustive block (bounded universe; empty for name
    # corpora). lit(1) key keeps the plan an equi-join node.
    sa = short.select(
        F.col("id").alias("id_a"), F.col("nm").alias("__na"),
        F.col("ln").alias("__la"), F.lit(1).alias("__k"),
    )
    sb = short.select(
        F.col("id").alias("id_b"), F.col("nm").alias("__nb"),
        F.col("ln").alias("__lb"), F.lit(1).alias("__k"),
    )
    cand_short = (
        sa.join(sb, "__k")
        .filter(
            (F.col("id_a") < F.col("id_b"))
            & (F.abs(F.col("__la") - F.col("__lb")) <= max_dist)
        )
        .select("id_a", "id_b", "__na", "__nb")
    )
    # short x long: the short side's prefix is ALL its tokens (the
    # theorem's per-string prefix length |T_s| - alpha + 1 <= q*d + 1
    # still holds when only ONE side is short).
    st = toks.join(short.select("id"), "id").select("id", "nm", "ln", "tok")
    sta = st.select(
        F.col("id").alias("id_a"), F.col("nm").alias("__na"),
        F.col("ln").alias("__la"), "tok",
    )
    stb = st.select(
        F.col("id").alias("id_b"), F.col("nm").alias("__nb"),
        F.col("ln").alias("__lb"), "tok",
    )
    cand_mixed = (
        sta.join(pb, "tok")
        .filter(F.abs(F.col("__la") - F.col("__lb")) <= max_dist)
        .select(
            F.least("id_a", "id_b").alias("id_a"),
            F.greatest(F.col("id_a"), F.col("id_b")).alias("id_b"),
            F.when(F.col("id_a") < F.col("id_b"), F.col("__na"))
            .otherwise(F.col("__nb")).alias("__na"),
            F.when(F.col("id_a") < F.col("id_b"), F.col("__nb"))
            .otherwise(F.col("__na")).alias("__nb"),
        )
        .filter(F.col("id_a") < F.col("id_b"))
    )
    # Verify BEFORE deduplicating candidates: the threshold form of
    # levenshtein (O(d*n) early-exit, JVM codegen) is far cheaper per
    # row than shuffling the multi-candidate frame for a distinct —
    # measured 45 s -> ~8 s at sf0.1 (the prefix join emits ~42
    # candidates per true pair on the low-entropy name corpus; see
    # docs/SCALE.md). The final agg then runs on survivors only.
    def _verify(cand: DataFrame) -> DataFrame:
        return (
            cand.withColumn(
                "dist", F.levenshtein("__na", "__nb", max_dist).cast("int")
            )
            .filter((F.col("dist") >= 0) & (F.col("dist") <= max_dist))
            .select("id_a", "id_b", "dist")
        )

    return (
        _verify(cand_long)
        .unionByName(_verify(cand_short))
        .unionByName(_verify(cand_mixed))
        .groupBy("id_a", "id_b")
        .agg(F.min("dist").cast("int").alias("dist"))
    )


def fs_match_weights(
    df: DataFrame,
    id_col: str,
    block_exprs: list,
    field_exprs: list,
    m_probs: list,
) -> DataFrame:
    """X120 — Fellegi-Sunter match-weight scoring (Fellegi/Sunter JASA
    1969 — the canonical probabilistic record-linkage model): candidate
    pairs share a blocking key; each comparison field contributes
    log2(m/u) on agreement and log2((1-m)/(1-u)) on disagreement, where
    m is the declared true-match agreement probability and u is the
    RANDOM agreement probability ESTIMATED FROM THE DATA as
    sum_v (n_v / N)^2 — the exact chance two random records agree on
    the field. The sum of field contributions is the pair's match
    weight (log-likelihood ratio under conditional independence); the
    score X66's boolean blocking lacks.

    ``field_exprs`` is a list of (name, Column); ``m_probs`` the
    matching m per field. Returns (id_a, id_b, n_agree, weight).

    Scale: each u_j is two tiny aggs (value-dictionary contraction +
    1-row sum of squared frequencies); all u's pack into ONE 1-row
    broadcast model frame. The pair join is block-keyed (the X66
    contract: per-block work C(block,2), block size is the knob). The
    weight arithmetic is row-local codegen on the pair frame.
    """
    blk = F.concat_ws("\x1f", *[e.cast("string") for e in block_exprs])
    cols = [F.col(id_col).alias("id"), blk.alias("__blk")]
    names = []
    for (nm, expr), _m in zip(field_exprs, m_probs):
        cols.append(expr.alias(f"__f_{nm}"))
        names.append(nm)
    base = df.select(*cols)
    n_row = base.agg(F.count("*").cast("double").alias("__n"))
    model = n_row
    for nm in names:
        sq = (
            base.groupBy(f"__f_{nm}")
            .agg(F.count("*").alias("__c"))
            .agg(F.sum(F.col("__c") * F.col("__c")).cast("double").alias(f"__sq_{nm}"))
        )
        model = model.crossJoin(F.broadcast(sq))
    u_cols = [
        (F.col(f"__sq_{nm}") / (F.col("__n") * F.col("__n"))).alias(f"__u_{nm}")
        for nm in names
    ]
    model = model.select(*u_cols)
    pa = base.select(
        F.col("id").alias("id_a"), "__blk",
        *[F.col(f"__f_{nm}").alias(f"__fa_{nm}") for nm in names],
    )
    pb = base.select(
        F.col("id").alias("id_b"), "__blk",
        *[F.col(f"__f_{nm}").alias(f"__fb_{nm}") for nm in names],
    )
    pairs = pa.join(pb, "__blk").filter(F.col("id_a") < F.col("id_b"))
    # model: 1-row u-probability frame (bounded broadcast)
    pairs = pairs.crossJoin(F.broadcast(model))
    agree = [
        (F.col(f"__fa_{nm}") == F.col(f"__fb_{nm}")).alias(f"__ag_{nm}")
        for nm in names
    ]
    pairs = pairs.select("id_a", "id_b", *agree, *[F.col(f"__u_{nm}") for nm in names])
    weight = None
    n_agree = None
    for nm, m in zip(names, m_probs):
        term = F.when(
            F.col(f"__ag_{nm}"),
            F.log2(F.lit(float(m)) / F.col(f"__u_{nm}")),
        ).otherwise(
            F.log2(F.lit(1.0 - float(m)) / (F.lit(1.0) - F.col(f"__u_{nm}")))
        )
        ag = F.col(f"__ag_{nm}").cast("int")
        weight = term if weight is None else weight + term
        n_agree = ag if n_agree is None else n_agree + ag
    return pairs.select(
        "id_a", "id_b",
        n_agree.cast("int").alias("n_agree"),
        weight.alias("weight"),
    )
