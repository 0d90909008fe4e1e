"""Unit tests for the training-data extension surface (X1-X6):
dedup variants, similarity search, text analysis, multimodal plumbing."""

from __future__ import annotations

import math
import os

import pytest
from pyspark.sql import functions as F

from emr_trino_autoscale_spark.operators import dedup, multimodal, similarity, text


def docs(spark, texts):
    return spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], "doc_id long, text string"
    )


def test_exact_dedup(spark):
    d = docs(spark, ["a b c", "a b c", "x y z"])
    out = {r["keep_id"]: r["n_dups"] for r in dedup.exact_dedup(d).collect()}
    assert out == {0: 2, 2: 1}


def test_near_dup_clusters_catch_shared_min_shingle(spark):
    # doc0 and doc1 share all shingles except one; doc2 is disjoint.
    d = docs(
        spark,
        [
            "the quick brown fox jumps over the lazy dog",
            "the quick brown fox jumps over the lazy cat",
            "completely different text with no overlap at all",
        ],
    )
    out = dedup.near_dup_clusters(d)
    clusters = {r["keep_id"]: r["cluster_size"] for r in out.collect()}
    assert clusters.get(0) == 2  # doc0+doc1 collide on the min shingle
    assert clusters.get(2) == 1


def test_simhash_similar_texts_close(spark):
    d = docs(
        spark,
        [
            "spark is a distributed compute engine for big data",
            "spark is a distributed compute engine for huge data",
            "bananas oranges apples pears grapes melons kiwis",
        ],
    )
    rows = d.select("doc_id", dedup.simhash64().alias("h")).collect()
    h = {r["doc_id"]: r["h"] for r in rows}

    def hamming(a, b):
        return bin((a ^ b) & 0xFFFFFFFFFFFFFFFF).count("1")

    assert hamming(h[0], h[1]) < hamming(h[0], h[2])
    assert hamming(h[0], h[0]) == 0


def test_simhash_hamming_pairs(spark):
    d = docs(spark, ["a b c d e", "a b c d e", "zz yy xx ww vv"])
    out = dedup.simhash_hamming_pairs(d, max_hamming=0)
    pairs = [(r["id_a"], r["id_b"], r["hamming"]) for r in out.collect()]
    assert (0, 1, 0) in pairs  # identical docs at distance 0
    assert not any({a, b} == {0, 2} for a, b, _ in pairs)
    try:
        dedup.simhash_hamming_pairs(d, max_hamming=4, n_bands=4)
        raise AssertionError("expected ValueError")
    except ValueError:
        pass


def test_ngram_jaccard_pairs(spark):
    d = docs(
        spark,
        [
            "a b c d e f g h",
            "a b c d e f g x",
            "p q r s t u v w",
        ],
    )
    out = dedup.ngram_jaccard_pairs(d, threshold=0.3).collect()
    pairs = {(r["id_a"], r["id_b"]): r["jaccard"] for r in out}
    assert (0, 1) in pairs and len(pairs) == 1
    assert 0.4 < pairs[(0, 1)] < 0.9


def vecs(spark, rows):
    return spark.createDataFrame(rows, "vec_id long, embedding array<float>")


def test_brute_force_topk_exact(spark):
    corpus = vecs(
        spark,
        [
            (0, [1.0, 0.0]),
            (1, [0.9, 0.1]),
            (2, [0.0, 1.0]),
            (3, [-1.0, 0.0]),
        ],
    )
    q = corpus.filter(F.col("vec_id") == 0).select(
        F.col("vec_id").alias("q_id"), "embedding"
    )
    out = similarity.brute_force_topk(corpus, q, k=2).orderBy("rank").collect()
    assert [r["neighbor_id"] for r in out] == [1, 2]
    assert float(out[0]["cosine"]) > 0.99


def test_lsh_topk_self_consistent(spark):
    # LSH candidates are a subset of brute-force; the nearest neighbor
    # (same bucket by construction for near-identical vectors) survives.
    corpus = vecs(
        spark,
        [(i, [float(i == j) for j in range(8)]) for i in range(8)]
        + [(100, [1.0, 0.001, 0.0, 0.0, 0.0, 0.0, 0.0, 0.0])],
    )
    q = corpus.filter(F.col("vec_id") == 0).select(
        F.col("vec_id").alias("q_id"), "embedding"
    )
    out = similarity.lsh_topk(corpus, q, k=3, dim=8).collect()
    assert any(r["neighbor_id"] == 100 for r in out)


def test_text_quality_and_language(spark):
    d = docs(
        spark,
        [
            "the cat is on the mat and the dog is in the house",
            "der hund ist gross und die katze ist klein",
            "!!! ??? ... ;;; :::",
        ],
    )
    rows = d.select(
        "doc_id",
        text.language_id().alias("lang"),
        text.quality_score().alias("q"),
        text.token_count().alias("n_tok"),
        text.bpe_ish_token_count().alias("n_bpe"),
        text.fingerprint64().alias("fp"),
    ).collect()
    by_id = {r["doc_id"]: r for r in rows}
    assert by_id[0]["lang"] == "en"
    assert by_id[1]["lang"] == "de"
    assert by_id[2]["lang"] == "und"
    assert by_id[0]["q"] > by_id[2]["q"]
    assert by_id[0]["n_tok"] == 13
    assert by_id[2]["n_bpe"] >= 12  # every punct char is a piece
    assert isinstance(by_id[0]["fp"], int)


def test_simhash16_md5_groups_identical_texts(spark):
    d = docs(spark, ["a b c d", "a b c d", "totally different words here"])
    out = dedup.simhash_clusters(d)
    clusters = {r["keep_id"]: r["cluster_size"] for r in out.collect()}
    assert clusters.get(0) == 2
    rows = d.select(dedup.simhash16_md5().alias("s")).collect()
    assert all(0 <= r["s"] < (1 << 16) for r in rows)


def test_lsh_topk_literal_matches_brute_force_in_bucket(spark):
    planes = similarity.md5_sign_planes(n_planes=4, dim=8)
    corpus = vecs(
        spark,
        [(i, [float(i == j) for j in range(8)]) for i in range(8)]
        + [(100, [1.0, 0.001, 0.0, 0.0, 0.0, 0.0, 0.0, 0.0])],
    )
    q = corpus.filter(F.col("vec_id") == 0).select(
        F.col("vec_id").alias("q_id"), "embedding"
    )
    out = similarity.lsh_topk_literal(corpus, q, planes, k=3).collect()
    # near-identical vector lands in the same bucket and ranks first
    assert out and out[0]["neighbor_id"] == 100


def test_ivf_topk_probes_assigned_bucket(spark):
    corpus = vecs(
        spark,
        [
            (0, [1.0, 0.0]),   # centroid A
            (1, [0.0, 1.0]),   # centroid B
            (10, [0.9, 0.1]),  # near A
            (11, [0.95, 0.05]),
            (20, [0.1, 0.9]),  # near B
        ],
    )
    cents = corpus.filter(F.col("vec_id") < 2).select(
        F.col("vec_id").alias("c_id"), "embedding"
    )
    q = corpus.filter(F.col("vec_id") == 10).select(
        F.col("vec_id").alias("q_id"), "embedding"
    )
    out = similarity.ivf_topk(corpus, cents, q, k=5).collect()
    ids = {r["neighbor_id"] for r in out}
    assert 11 in ids and 0 in ids  # same inverted list
    assert 20 not in ids and 1 not in ids  # other bucket never scored


def test_brute_force_topk_vectorized_parity(spark, sf_dir):
    """The GEMM + two-phase-rank exact top-k must reproduce the HOF
    baseline row for row (ids, ranks, 4-decimal scores) on the real
    embeddings, including with a partitioned corpus (batch pruning)."""
    from emr_trino_autoscale_spark.io import load_table

    e = load_table(spark, sf_dir, "embeddings")
    queries = e.filter(F.col("vec_id") < 10).select(
        F.col("vec_id").alias("q_id"), "embedding"
    )
    want = sorted(
        (r["q_id"], r["rank"], r["neighbor_id"], str(r["cosine"]))
        for r in similarity.brute_force_topk(e, queries, k=5).collect()
    )
    got = sorted(
        (r["q_id"], r["rank"], r["neighbor_id"], str(r["cosine"]))
        for r in similarity.brute_force_topk_vectorized(
            e.repartition(7), queries, k=5
        ).collect()
    )
    assert got == want


def test_ivf_vectorized_assignment_parity(spark, sf_dir):
    """NumPy coarse quantization must reproduce the DataFrame-fold IVF
    end to end (assignments drive candidate sets, so full-result parity
    covers both) on the real embeddings, with multi-probe."""
    from emr_trino_autoscale_spark.io import load_table

    e = load_table(spark, sf_dir, "embeddings")
    cents = e.filter(F.col("vec_id") < 8).select(
        F.col("vec_id").alias("c_id"), "embedding"
    )
    queries = e.filter((F.col("vec_id") % 50 == 0) & (F.col("vec_id") >= 8)).select(
        F.col("vec_id").alias("q_id"), "embedding"
    )
    want = sorted(
        (r["q_id"], r["rank"], r["neighbor_id"], str(r["cosine"]))
        for r in similarity.ivf_topk(e, cents, queries, k=5, n_probes=2).collect()
    )
    got = sorted(
        (r["q_id"], r["rank"], r["neighbor_id"], str(r["cosine"]))
        for r in similarity.ivf_topk(
            e, cents, queries, k=5, n_probes=2, vectorized=True
        ).collect()
    )
    assert got == want


def test_vectorized_srp_bucket_parity(spark, sf_dir):
    """The Arrow/NumPy corpus bucket (production path) must reproduce
    the interpreted HOF fold exactly — buckets AND full multi-probe
    top-k results — on the real embeddings."""
    from emr_trino_autoscale_spark.functions.arrow_udfs import srp_bucket_vectorized
    from emr_trino_autoscale_spark.io import load_table

    e = load_table(spark, sf_dir, "embeddings")
    planes = similarity.md5_sign_planes(n_planes=8, dim=64)
    folded = {
        r["vec_id"]: r["b"]
        for r in similarity.with_norm(e)
        .select("vec_id", similarity.srp_bucket_literal(F.col("__v"), planes).alias("b"))
        .collect()
    }
    vec = {
        r["vec_id"]: r["b"]
        for r in e.select(
            "vec_id", srp_bucket_vectorized(planes)(F.col("embedding")).alias("b")
        ).collect()
    }
    assert vec == folded

    queries = e.filter(F.col("vec_id") < 10).select(
        F.col("vec_id").alias("q_id"), "embedding"
    )
    want = sorted(
        (r["q_id"], r["rank"], r["neighbor_id"])
        for r in similarity.lsh_topk_literal(e, queries, planes, k=5, n_probes=3).collect()
    )
    got = sorted(
        (r["q_id"], r["rank"], r["neighbor_id"])
        for r in similarity.lsh_topk_literal(
            e, queries, planes, k=5, n_probes=3, vectorized=True
        ).collect()
    )
    assert got == want


def test_contamination_fractions(spark):
    bench = docs(spark, ["alpha beta gamma delta epsilon"])
    cand = spark.createDataFrame(
        [
            (10, "alpha beta gamma delta epsilon"),   # exact copy -> 1.0
            (11, "alpha beta gamma delta zeta"),      # shares 1 of 2 4-grams
            (12, "totally different words here now"), # clean -> 0.0
            (13, "too short"),                        # < k tokens -> absent
        ],
        "doc_id long, text string",
    )
    out = {
        r["id"]: (r["n_grams"], r["n_contaminated"], round(r["contamination"], 4))
        for r in dedup.contamination_fractions(cand, bench, k=4).collect()
    }
    assert out == {10: (2, 2, 1.0), 11: (2, 1, 0.5), 12: (2, 0, 0.0)}


def test_novelty_fractions_first_occurrence_attribution(spark):
    d = docs(
        spark,
        [
            "a b c d",            # doc 0 introduces both 3-grams
            "a b c d",            # exact dup -> nothing novel
            "a b c x",            # shares 'a b c', introduces 'b c x'
        ],
    )
    out = {
        r["id"]: (r["n_grams"], r["n_novel"])
        for r in dedup.novelty_fractions(d, k=3).collect()
    }
    assert out == {0: (2, 2), 1: (2, 0), 2: (2, 1)}


def _recall_at_k(approx_rows, exact_rows):
    """Mean recall@k of approx vs exact top-k, per query id."""
    from collections import defaultdict

    ex, ap = defaultdict(set), defaultdict(set)
    for r in exact_rows:
        ex[r["q_id"]].add(r["neighbor_id"])
    for r in approx_rows:
        ap[r["q_id"]].add(r["neighbor_id"])
    return sum(
        len(ex[q] & ap[q]) / len(ex[q]) for q in ex
    ) / len(ex)


def test_multiprobe_recall_monotone(spark, sf_dir):
    """VERDICT r2 #4: recall@5 vs the exact baseline must improve
    monotonically with n_probes (nested probe sets) for both the SRP
    multi-probe and the IVF nprobe knob, on the real embeddings table."""
    from emr_trino_autoscale_spark.io import load_table

    e = load_table(spark, sf_dir, "embeddings")
    queries = e.filter(F.col("vec_id") < 10).select(
        F.col("vec_id").alias("q_id"), "embedding"
    )
    exact = similarity.brute_force_topk(e, queries, k=5).collect()

    planes = similarity.md5_sign_planes(n_planes=8, dim=64)
    lsh_recalls = [
        _recall_at_k(
            similarity.lsh_topk_literal(e, queries, planes, k=5, n_probes=p).collect(),
            exact,
        )
        for p in (1, 3, 9)
    ]
    assert lsh_recalls == sorted(lsh_recalls), lsh_recalls
    assert lsh_recalls[-1] > lsh_recalls[0], lsh_recalls

    cents = e.filter(F.col("vec_id") < 8).select(
        F.col("vec_id").alias("c_id"), "embedding"
    )
    ivf_queries = e.filter((F.col("vec_id") % 50 == 0) & (F.col("vec_id") >= 8)).select(
        F.col("vec_id").alias("q_id"), "embedding"
    )
    ivf_exact = similarity.brute_force_topk(e, ivf_queries, k=5).collect()
    ivf_recalls = [
        _recall_at_k(
            similarity.ivf_topk(e, cents, ivf_queries, k=5, n_probes=p).collect(),
            ivf_exact,
        )
        for p in (1, 2, 4)
    ]
    assert ivf_recalls == sorted(ivf_recalls), ivf_recalls
    assert ivf_recalls[-1] > ivf_recalls[0], ivf_recalls


def test_embedding_near_dup_pairs(spark):
    corpus = vecs(
        spark,
        [(0, [1.0, 0.0]), (1, [0.999, 0.001]), (2, [0.0, 1.0])],
    )
    out = similarity.near_dup_pairs(corpus, threshold=0.99).collect()
    assert [(r["id_a"], r["id_b"]) for r in out] == [(0, 1)]


def test_blocked_pairs_match_baseline(spark):
    # blocked GEMM must return exactly the same pairs as the quadratic
    # baseline (routing changes, scoring doesn't)
    import random

    rng = random.Random(7)
    rows = [
        (i, [rng.uniform(-1, 1) for _ in range(8)]) for i in range(60)
    ]
    corpus = vecs(spark, rows)
    base = {
        (r["id_a"], r["id_b"]): r["cosine"]
        for r in similarity.near_dup_pairs(corpus, threshold=0.5).collect()
    }
    blocked = {
        (r["id_a"], r["id_b"]): r["cosine"]
        for r in similarity.near_dup_pairs_blocked(
            corpus, threshold=0.5, n_blocks=4
        ).collect()
    }
    assert base == blocked and len(base) > 0
    # derived geometry (n_blocks=None) must give identical pairs too —
    # block count only changes routing, never the scored set
    derived = {
        (r["id_a"], r["id_b"]): r["cosine"]
        for r in similarity.near_dup_pairs_blocked(corpus, threshold=0.5).collect()
    }
    assert base == derived


def test_blocks_for_memory_formula():
    # a tile (two r x dim operand blocks + r x r float64 scores) must
    # fit the budget at any corpus size: 8*(r^2 + 2*r*dim) <= budget
    import math

    for rows, dim, budget in [
        (10_000_000, 768, 256 << 20),
        (100_000_000, 1536, 512 << 20),
        (50_000, 64, 64 << 20),
    ]:
        n = similarity.blocks_for(rows, dim, budget)
        r = math.ceil(rows / n)
        assert 8 * (r * r + 2 * r * dim) <= budget * 1.01, (rows, dim, budget, n)
    # parallelism floor: enough tiles to cover the cores even when one
    # tile would fit in memory
    n = similarity.blocks_for(100, 8, 1 << 40, parallelism=32)
    assert n * (n + 1) // 2 >= 32
    assert similarity.blocks_for(1, 64, 1 << 20) == 1


def test_prefix_jaccard_matches_baseline(spark):
    # Independent baseline: brute-force all-pairs shingle Jaccard in
    # pure Python (ngram_jaccard_pairs is now an alias of the prefix
    # implementation, so the old impl-vs-impl comparison would be
    # vacuous).
    texts = [
        "the quick brown fox jumps over the lazy dog today",
        "the quick brown fox jumps over the lazy cat today",
        "an utterly different document about spark shuffles",
        "an utterly different document about spark shuffles",  # exact dup
        "one more unrelated line of text with many words",
    ]
    k, threshold = 3, 0.4
    sets = {
        i: {" ".join(t.split()[j : j + k]) for j in range(len(t.split()) - k + 1)}
        for i, t in enumerate(texts)
    }
    base = {}
    for a in sets:
        for b in sets:
            if a < b:
                n = len(sets[a] & sets[b])
                j = n / len(sets[a] | sets[b])
                if j >= threshold:
                    base[(a, b)] = (n, round(j, 9))
    d = docs(spark, texts)
    pref = {
        (r["id_a"], r["id_b"]): (r["n_common"], round(r["jaccard"], 9))
        for r in dedup.ngram_jaccard_pairs_prefix(d, k=k, threshold=threshold).collect()
    }
    assert base == pref and (2, 3) in pref


def test_fingerprint60_md5_portable_and_shift_sensitive(spark):
    d = docs(
        spark,
        [
            "w1 w2 w3 w4 w5 w6 w7 w8 w9 w10",
            "w1 w2 w3 w4 w5 w6 w7 w8 w9 w10",
            "w0 w1 w2 w3 w4 w5 w6 w7 w8 w9",
        ],
    )
    rows = d.select("doc_id", text.fingerprint60_md5().alias("fp")).collect()
    fp = {r["doc_id"]: r["fp"] for r in rows}
    assert fp[0] == fp[1]
    assert fp[0] != fp[2]
    assert all(0 <= v < (1 << 60) for v in fp.values())


def test_binary_meta_mapinpandas(spark):
    d = docs(spark, ["hello world", "x"]).select(
        "doc_id", F.encode("text", "UTF-8").alias("payload")
    )
    rows = {r["doc_id"]: r for r in multimodal.binary_meta(d, id_col="doc_id").collect()}
    assert rows[0]["n_bytes"] == 11 and rows[0]["first_byte"] == ord("h")
    assert rows[1]["n_bytes"] == 1 and rows[1]["first_byte"] == ord("x")


def test_approx_sketches_bounded_error(spark, sf_dir):
    from emr_trino_autoscale_spark.queries import QUERIES

    checked = {
        r["priority"]: r
        for r in QUERIES["q43_approx_sketches"](spark, sf_dir).collect()
    }
    exact = {
        r["priority"]: r for r in QUERIES["q40_distinct_aggs"](spark, sf_dir).collect()
    }
    assert checked, "q43 returned no groups"
    for p, a in checked.items():
        # q43 validates the sketches itself; assert the validation held
        # and its exact twin agrees with q40's independent computation.
        assert a["ndv_within_10pct"] is True
        assert a["p50_within_band"] is True
        assert a["exact_customers"] == exact[p]["n_customers"]


def test_multimodal_feature_plumbing(spark):
    media = multimodal.synthetic_media(spark, n=12)
    feats = multimodal.extract_features(media)
    rows = feats.collect()
    assert len(rows) == 12
    for r in rows:
        assert len(r["feature"]) == 8
        assert all(0.0 <= x <= 1.0 for x in r["feature"])
        assert r["n_bytes"] > 0
    # deterministic across runs
    again = {r["media_id"]: r["feature"] for r in multimodal.extract_features(media).collect()}
    first = {r["media_id"]: r["feature"] for r in rows}
    assert again == first


def test_real_decoder_slot_in_ppm_and_wav(spark):
    """X6: a REAL decoder (public codec-free formats: P6 PPM, RIFF/WAV
    16-bit PCM) runs through the exact mapInPandas plumbing the stub
    occupies — proving the decoder interface, schema, and batch shape
    hold for genuine media bytes, not just the deterministic fake."""
    import io
    import struct
    import wave

    # 2x2 P6 image: red, green, blue, white
    ppm = b"P6\n# fixture\n2 2\n255\n" + bytes(
        [255, 0, 0, 0, 255, 0, 0, 0, 255, 255, 255, 255]
    )
    # 8-frame mono 16-bit WAV at 8 kHz: alternating +/- half amplitude
    buf = io.BytesIO()
    with wave.open(buf, "wb") as w:
        w.setnchannels(1)
        w.setsampwidth(2)
        w.setframerate(8000)
        w.writeframes(
            struct.pack("<8h", *([16384, -16384] * 4))
        )
    wav = buf.getvalue()

    media = spark.createDataFrame(
        [
            (0, "image", bytearray(ppm), 2, 2, 0, "ppm"),
            (1, "audio", bytearray(wav), 0, 0, 1, "wav"),
            (2, "video", bytearray(b"\x00fakevideo"), 0, 0, 1000, "raw"),
        ],
        multimodal.MEDIA_SCHEMA,
    )
    rows = {
        r["media_id"]: r
        for r in multimodal.extract_features(
            media, decoder=multimodal.sniffing_decoder
        ).collect()
    }
    tol = 1e-6  # FEATURE_SCHEMA is array<float>: float32 round-trip
    img = rows[0]["feature"]
    # mean R/G/B over [red, green, blue, white] = 0.5 each; 2x2 geometry
    assert abs(img[0] - 0.5) < tol and abs(img[1] - 0.5) < tol
    assert abs(img[2] - 0.5) < tol
    assert abs(img[4] - 2 / 4096) < tol and abs(img[6] - (1.0 / 8)) < tol
    aud = rows[1]["feature"]
    # constant |x| = 0.5 -> mean_abs = rms = peak = 0.5; full alternation
    assert abs(aud[0] - 0.5) < tol and abs(aud[1] - 0.5) < tol
    assert abs(aud[2] - 1.0) < tol and abs(aud[3] - 0.5) < tol
    assert abs(aud[4] - 8000 / 96000.0) < tol
    # unknown format falls through to the documented stub (still 8 floats)
    assert len(rows[2]["feature"]) == 8


def _y4m_clip(width, height, lumas, fps=(25, 1), chroma="420"):
    """Synthetic YUV4MPEG2 clip: one constant-luma frame per value."""
    luma = width * height
    chroma_bytes = {"420": luma // 2, "444": 2 * luma, "mono": 0}[chroma]
    head = (
        f"YUV4MPEG2 W{width} H{height} F{fps[0]}:{fps[1]} Ip A1:1 C{chroma}\n"
    ).encode()
    frames = b"".join(
        b"FRAME\n" + bytes([y]) * luma + bytes([128]) * chroma_bytes
        for y in lumas
    )
    return head + frames


def test_real_video_decoder_y4m(spark):
    """X6 third kind: a synthetic YUV4MPEG2 clip decodes for REAL
    through the same mapInPandas plumbing — no NotImplementedError left
    reachable for any declared media kind (image/audio/video)."""
    # 4x2, 3 frames at luma 0 / 255 / 0 -> mean 1/3, temporal diff 1.0
    clip = _y4m_clip(4, 2, [0, 255, 0])
    direct = multimodal.decode_y4m_video(clip)
    tol = 1e-6
    assert abs(direct[0] - 1 / 3) < 1e-2  # mean luma (255/255 vs 0)
    assert abs(direct[2] - 1.0) < 1e-2  # frame-to-frame |diff| = full swing
    assert abs(direct[3] - 3 / 1024.0) < tol  # n_frames
    assert abs(direct[4] - 4 / 4096.0) < tol and abs(direct[5] - 2 / 4096.0) < tol
    assert abs(direct[6] - 25 / 120.0) < tol

    media = spark.createDataFrame(
        [(7, "video", bytearray(clip), 4, 2, 120, "y4m")],
        multimodal.MEDIA_SCHEMA,
    )
    row = multimodal.extract_features(
        media, decoder=multimodal.sniffing_decoder
    ).collect()[0]
    assert [round(x, 5) for x in row["feature"]] == [
        round(x, 5) for x in direct
    ]

    # mono + 444 chroma layouts parse too; frame sampling caps the scan
    assert multimodal.decode_y4m_video(_y4m_clip(2, 2, [10] * 40, chroma="mono"))[3] == 40 / 1024.0
    assert abs(multimodal.decode_y4m_video(_y4m_clip(2, 2, [10, 10], chroma="444"))[0] - 10 / 255.0) < tol
    # unsupported chroma falls back to the stub via sniffing_decoder
    weird = _y4m_clip(2, 2, [1]).replace(b"C420", b"C410")
    assert multimodal.sniffing_decoder(weird, "video") == multimodal._decode_stub(weird, "video")


def test_connected_components_transitive_closure(spark):
    # chain 1-2-3 plus isolated pair 10-11: closure must merge the
    # chain even though (1,3) was never a pair
    pairs = spark.createDataFrame(
        [(1, 2), (2, 3), (10, 11)], "id_a long, id_b long"
    )
    comps = {
        r["id"]: r["comp"] for r in dedup.connected_components(pairs).collect()
    }
    assert comps == {1: 1, 2: 1, 3: 1, 10: 10, 11: 10}


def test_connected_components_long_chain_converges(spark):
    # a 64-hop chain exercises pointer jumping (O(log n) rounds — a
    # pure 1-hop propagation would need 64 iterations > max_iter)
    pairs = spark.createDataFrame(
        [(i, i + 1) for i in range(64)], "id_a long, id_b long"
    )
    # driver_edge_cap=0 forces the distributed loop (the thing whose
    # convergence this test pins); the driver union-find path is
    # covered by test_connected_components_transitive_closure and the
    # parity property test
    comps = dedup.connected_components(pairs, max_iter=10, driver_edge_cap=0)
    assert comps.filter(F.col("comp") != 0).count() == 0
    assert comps.count() == 65


def test_tfidf_top_terms_ranks_rare_terms(spark):
    d = docs(
        spark,
        [
            "common common zebra",
            "common common yak",
            "common common zebra",
        ],
    )
    rows = {(r["doc_id"], r["term"]): r for r in text.tfidf_top_terms(d, k=2).collect()}
    # N=3. common: tf=2, df=3 -> 2*4/4 = 2.0; zebra: tf=1, df=2 -> 4/3;
    # yak: tf=1, df=1 -> 4/2 = 2.0 (ties with common; term asc breaks it)
    assert rows[(0, "common")]["rank"] == 1 and rows[(0, "zebra")]["rank"] == 2
    assert rows[(1, "common")]["rank"] == 1 and rows[(1, "yak")]["rank"] == 2
    assert abs(rows[(0, "common")]["score"] - 2.0) < 1e-12
    assert abs(rows[(0, "zebra")]["score"] - 4.0 / 3.0) < 1e-12
    assert abs(rows[(1, "yak")]["score"] - 2.0) < 1e-12


def test_pii_scrub_counts_and_redacts(spark):
    d = docs(
        spark,
        [
            "reach me at alice.smith+work@corp.example.com or 555-123-4567 thanks",
            "no pii here at all",
            "two mails a@b.io c@d.org and 999-000-1111 111-222-3333 done",
        ],
    )
    rows = {r["doc_id"]: r for r in text.pii_scrub(d).collect()}
    assert rows[0]["n_emails"] == 1 and rows[0]["n_phones"] == 1
    assert "<EMAIL>" in rows[0]["redacted"] and "<PHONE>" in rows[0]["redacted"]
    assert "alice" not in rows[0]["redacted"] and "4567" not in rows[0]["redacted"]
    assert rows[1]["n_emails"] == 0 and rows[1]["redacted"] == "no pii here at all"
    assert rows[2]["n_emails"] == 2 and rows[2]["n_phones"] == 2


def test_blocked_pairs_scale_geometry(spark):
    """Scale smoke: a corpus large enough that blocks_for derives a
    real multi-block geometry from a small tile budget; results must be
    identical under two different block geometries (routing never
    changes the scored set) and respect the pair invariants."""
    import numpy as np

    rng = np.random.default_rng(11)
    base = rng.normal(size=(40, 16))
    rows = []
    for i in range(4000):
        v = base[i % 40] + rng.normal(scale=0.15 if i % 7 == 0 else 3.0, size=16)
        rows.append((i, [float(x) for x in v]))
    corpus = spark.createDataFrame(rows, "vec_id long, embedding array<float>")

    derived = similarity.near_dup_pairs_blocked(
        corpus, threshold=0.97, tile_mem_bytes=1 << 20
    )
    n_blocks = similarity.blocks_for(4000, 16, 1 << 20)
    assert n_blocks >= 8  # the small budget must force real blocking
    got = {(r["id_a"], r["id_b"]): str(r["cosine"]) for r in derived.collect()}
    alt = {
        (r["id_a"], r["id_b"]): str(r["cosine"])
        for r in similarity.near_dup_pairs_blocked(
            corpus, threshold=0.97, n_blocks=3
        ).collect()
    }
    assert got == alt and len(got) > 0
    assert all(a < b for a, b in got)  # canonical ordering, no self-pairs


def test_sniffing_decoder_falls_back_not_fails(spark):
    """Undecodable payloads (RIFF-but-not-WAVE containers, 16-bit PPM,
    truncated WAV) must fall back to the stub — never fail the task."""
    avi = b"RIFF\x24\x00\x00\x00AVI LIST"            # RIFF container, not WAVE
    webp = b"RIFF\x10\x00\x00\x00WEBPVP8 "
    ppm16 = b"P6\n2 2\n65535\n" + bytes(24)           # 2-byte samples
    bad_wav = b"RIFF\x08\x00\x00\x00WAVEjunk"         # WAVE tag, garbage body
    media = spark.createDataFrame(
        [
            (0, "video", bytearray(avi), 0, 0, 0, "avi"),
            (1, "image", bytearray(webp), 0, 0, 0, "webp"),
            (2, "image", bytearray(ppm16), 2, 2, 0, "ppm"),
            (3, "audio", bytearray(bad_wav), 0, 0, 0, "wav"),
        ],
        multimodal.MEDIA_SCHEMA,
    )
    rows = multimodal.extract_features(media, decoder=multimodal.sniffing_decoder).collect()
    assert len(rows) == 4
    for r in rows:
        assert len(r["feature"]) == 8  # stub features, task alive


def test_pii_phone_shaped_email_counts_reconcile(spark):
    d = docs(spark, ["mail 555-123-4567@corp.example now", "call 555-123-4567"])
    rows = {r["doc_id"]: r for r in text.pii_scrub(d).collect()}
    # the phone-shaped local part is ONE email, zero phones — counts
    # must reconcile with the placeholder tokens in `redacted`
    assert rows[0]["n_emails"] == 1 and rows[0]["n_phones"] == 0
    assert rows[0]["redacted"].count("<EMAIL>") == 1
    assert "<PHONE>" not in rows[0]["redacted"]
    assert rows[1]["n_phones"] == 1 and "<PHONE>" in rows[1]["redacted"]


def test_hamming_pairs_null_text_excluded(spark):
    d = spark.createDataFrame(
        [(0, "a b c"), (1, "a b c"), (2, None), (3, None)],
        "doc_id long, text string",
    )
    pairs = {(r["id_a"], r["id_b"]) for r in dedup.simhash_hamming_pairs(d).collect()}
    # NULL-text docs are excluded (matching the SQL oracle, where a
    # NULL signature never joins); real docs still pair
    assert pairs == {(0, 1)}
    import pytest as _pytest

    with _pytest.raises(ValueError):
        dedup.simhash_hamming_pairs(d, n_bits=64)


def test_repetition_stats_flags_boilerplate(spark):
    d = docs(
        spark,
        [
            "spam spam spam spam spam",          # one token dominates
            "alpha beta alpha beta alpha beta",  # repeated bigrams
            "all words here are fully distinct today",
        ],
    )
    rows = {r["doc_id"]: r for r in text.repetition_stats(d).collect()}
    assert rows[0]["top_word_frac"] == 1.0
    # 'alpha beta'/'beta alpha' x5 over 5 bigram slots -> 3 dup slots
    assert abs(rows[1]["dup_bigram_frac"] - 3 / 5) < 1e-12
    assert rows[2]["top_word_frac"] < 0.2 and rows[2]["dup_bigram_frac"] == 0.0
    assert rows[0]["n_tok"] == 5


def test_incremental_dedup_corpus_wins_over_batch_dup(spark):
    # digest in corpus -> every batch copy is dup_corpus (even the
    # min-id one); unseen digest -> min id kept, later ids dup_batch.
    corpus = docs(spark, ["seen before"])
    batch = spark.createDataFrame(
        [
            (10, "seen before"),
            (11, "seen before"),
            (12, "brand new"),
            (13, "brand new"),
        ],
        "doc_id long, text string",
    )
    out = {
        r["doc_id"]: r["status"]
        for r in dedup.incremental_dedup_report(corpus, batch).collect()
    }
    assert out == {
        10: "dup_corpus",
        11: "dup_corpus",
        12: "kept",
        13: "dup_batch",
    }


def test_incremental_dedup_preserves_id_col_with_decoy_id(spark):
    # The batch carries an unrelated "id" column; the report must keep
    # id_col's own name ("doc_id") and never create a duplicate "id".
    corpus = docs(spark, ["seen before"])
    batch = spark.createDataFrame(
        [
            (10, 99, "seen before"),
            (11, 98, "fresh text"),
            (12, 97, "fresh text"),
        ],
        "doc_id long, id long, text string",
    )
    rep = dedup.incremental_dedup_report(corpus, batch)
    assert rep.columns.count("id") == 1  # the decoy survives, un-duplicated
    out = {r["doc_id"]: (r["id"], r["status"]) for r in rep.collect()}
    assert out == {
        10: (99, "dup_corpus"),
        11: (98, "kept"),
        12: (97, "dup_batch"),
    }


def test_boilerplate_strip_preserves_order_and_handles_empty(spark):
    import hashlib

    # "the" appears in 3/3 docs (df 1.0 > 0.3) -> stripped everywhere;
    # doc2 is ALL boilerplate -> kept stream is "" and hashes as such.
    d = docs(spark, ["the alpha the beta", "gamma the delta", "the the"])
    rows = {r["id"]: r for r in text.boilerplate_strip(d, max_df_frac=0.5).collect()}
    md5 = lambda s: hashlib.md5(s.encode()).hexdigest()
    assert (rows[0]["n_tokens"], rows[0]["n_kept"]) == (4, 2)
    assert rows[0]["kept_hash"] == md5("alpha beta")  # original order, not sorted
    assert rows[1]["kept_hash"] == md5("gamma delta")
    assert (rows[2]["n_kept"], rows[2]["kept_hash"]) == (0, md5(""))


def test_singleton_gram_stats_df1_only(spark):
    # doc0/doc1 share every 3-gram (identical text) -> zero singletons;
    # doc2's grams are globally unique -> all singletons.
    d = docs(spark, ["a b c d", "a b c d", "x y z w"])
    out = {r["id"]: r for r in dedup.singleton_gram_stats(d, k=3).collect()}
    assert out[0]["n_singleton"] == 0 and out[1]["n_singleton"] == 0
    assert out[2]["n_singleton"] == out[2]["n_grams"] == 2
    assert out[2]["risk"] == 1.0


def test_coarse_assign_tie_breaks_on_centroid_id(spark):
    vecs = spark.createDataFrame(
        [(0, [1.0, 0.0]), (1, [0.0, 1.0]), (2, [1.0, 1.0])],
        "vec_id long, embedding array<double>",
    )
    cents = spark.createDataFrame(
        [(7, [1.0, 1.0]), (8, [1.0, 1.0]), (9, [0.0, 1.0])],
        "c_id long, embedding array<double>",
    )
    out = {r["vec_id"]: r["assigned"] for r in similarity.coarse_assign(vecs, cents).collect()}
    # vec2 ties exactly between centroids 7 and 8 -> smaller id wins
    assert out[2] == 7
    assert out[1] == 9  # exact match beats the diagonal
    assert out[0] == 7  # cos45 vs 7/8 tie -> id 7


def test_kmeans_fit_recovers_separated_blobs(spark):
    # three orthogonal blobs in 6-d; k-means from first-3 init must
    # converge to one centroid per blob and assign each blob together.
    def blob(base, i, eps):
        v = [0.0] * 6
        v[base] = 1.0
        v[(base + 3) % 6] = eps * (i + 1)
        return v

    rows = [
        (b * 10 + i, blob(b, i, 0.01))
        for b in range(3)
        for i in range(5)
    ]
    vecs = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    cents = similarity.kmeans_fit(vecs, k=3, n_iter=4)
    assert cents.count() == 3
    asg = similarity.coarse_assign(vecs, cents)
    groups = {}
    for r in asg.collect():
        groups.setdefault(r["assigned"], set()).add(r["vec_id"] // 10)
    # every cluster is pure: one blob per assigned centroid
    assert all(len(blobs) == 1 for blobs in groups.values())
    assert len(groups) == 3


def test_kmeans_fit_vectorized_matches_dataframe_form(spark):
    rows = [
        (i, [float((i * 7 + j * 3) % 11), float((i * 5 + j) % 7), float(i % 3)])
        for i in range(24)
        for j in [0]
    ]
    vecs = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    a = similarity.kmeans_fit(vecs, k=4, n_iter=3, vectorized=False).collect()
    b = similarity.kmeans_fit(vecs, k=4, n_iter=3, vectorized=True).collect()
    ca = {r["c_id"]: [round(x, 9) for x in r["embedding"]] for r in a}
    cb = {r["c_id"]: [round(x, 9) for x in r["embedding"]] for r in b}
    assert ca == cb


def _clustered_vecs(spark, n_per=20, dim=64, n_clusters=3):
    # deterministic clustered corpus: cluster c concentrates its mass on
    # dims [c*8, c*8+8) with small id-dependent jitter elsewhere
    rows = []
    for c in range(n_clusters):
        for i in range(n_per):
            vid = c * 100 + i
            v = [0.01 * ((vid * 7 + j) % 5) for j in range(dim)]
            for j in range(c * 8, c * 8 + 8):
                v[j] = 1.0 + 0.02 * ((vid + j) % 3)
            rows.append((vid, v))
    return spark.createDataFrame(rows, "vec_id long, embedding array<double>")


def test_pq_encode_shape_and_determinism(spark):
    vecs = _clustered_vecs(spark)
    cb = similarity.pq_train(vecs, m=8, ksub=4, n_iter=2)
    assert len(cb) == 8 and all(len(sub) == 4 for sub in cb)
    a = {r["id"]: list(r["codes"]) for r in similarity.pq_encode(vecs, cb).collect()}
    b = {r["id"]: list(r["codes"]) for r in similarity.pq_encode(vecs, cb).collect()}
    assert a == b and len(a) == 60
    assert all(len(c) == 8 and all(0 <= x < 4 for x in c) for c in a.values())
    # same-cluster vectors should share most of their code words
    assert a[0][:1] == a[1][:1] or a[0] != a[200]


def test_pq_topk_recall_vs_exact(spark):
    vecs = _clustered_vecs(spark)
    queries = vecs.filter(F.col("vec_id").isin([0, 100, 200])).select(
        F.col("vec_id").alias("q_id"), "embedding"
    )
    exact = {}
    for r in similarity.brute_force_topk(vecs, queries, k=5).collect():
        exact.setdefault(r["q_id"], set()).add(r["neighbor_id"])
    cb = similarity.pq_train(vecs, m=8, ksub=8, n_iter=3)
    pq = {}
    for r in similarity.pq_topk(vecs, queries, cb, k=5, exclude_self=True).collect():
        pq.setdefault(r["q_id"], set()).add(r["neighbor_id"])
    # ADC on clustered data: every query's PQ top-5 stays inside its own
    # cluster and overlaps the exact top-5 substantially
    for qid, nbrs in pq.items():
        assert len(nbrs) == 5
        assert all(n // 100 == qid // 100 for n in nbrs), (qid, nbrs)
        assert len(nbrs & exact[qid]) >= 3, (qid, nbrs, exact[qid])
    # determinism across runs
    again = {}
    for r in similarity.pq_topk(vecs, queries, cb, k=5, exclude_self=True).collect():
        again.setdefault(r["q_id"], set()).add(r["neighbor_id"])
    assert again == pq


def test_fingerprint60_arrow_matches_expression_form(spark):
    texts = [
        "w1 w2 w3 w4 w5 w6 w7 w8 w9 w10",
        "short doc",
        "",
        "a a a a a a a a a",
    ]
    d = docs(spark, texts)
    expr = {r["doc_id"]: r["fp"] for r in d.select("doc_id", text.fingerprint60_md5().alias("fp")).collect()}
    arrow = {r["doc_id"]: r["fp"] for r in d.select("doc_id", text.fingerprint60_md5_arrow().alias("fp")).collect()}
    assert expr == arrow


def test_string_ids_survive_arrow_projections(spark):
    """Round-6 regression (ADVICE r5): the Arrow rewrites used to
    hardcode 'id long', silently breaking string doc/vec ids that the
    expression forms preserved. Each projection must emit the input id
    type unchanged."""
    d = spark.createDataFrame(
        [("doc-b", "a b c d e"), ("doc-a", "a b c d e"), ("doc-c", "x y z w v")],
        "doc_id string, text string",
    )
    sigs = dedup.simhash_signatures(d, id_col="doc_id")
    assert dict(sigs.dtypes)["id"] == "string"
    by_id = {r["id"]: r["sig"] for r in sigs.collect()}
    assert by_id["doc-a"] == by_id["doc-b"] != by_id["doc-c"]

    rows = dedup.shingle_digest_rows(d, id_col="doc_id", k=2)
    assert dict(rows.dtypes)["id"] == "string"
    assert {r["id"] for r in rows.collect()} == {"doc-a", "doc-b", "doc-c"}

    vecs = spark.createDataFrame(
        [(f"v{i:02d}", [float(i), 1.0, 0.0, 0.0]) for i in range(8)],
        "vec_id string, embedding array<double>",
    )
    qs = vecs.filter(F.col("vec_id") == "v00").withColumnRenamed("vec_id", "q_id")
    bf = similarity.brute_force_topk_vectorized(
        vecs, qs, k=3, id_col="vec_id", query_id_col="q_id"
    )
    got = [(r["q_id"], r["neighbor_id"]) for r in bf.orderBy("rank").collect()]
    assert len(got) == 3 and all(q == "v00" for q, _ in got)
    assert all(isinstance(n, str) for _, n in got)

    cb = similarity.md5_codebooks(m=2, ksub=2, dsub=2)
    pq = similarity.pq_topk(
        vecs, qs, cb, k=3, id_col="vec_id", query_id_col="q_id", exclude_self=True
    )
    prows = pq.collect()
    assert len(prows) == 3
    assert all(isinstance(r["neighbor_id"], str) and r["q_id"] == "v00" for r in prows)


def test_kmeans_init_distributed_recluster_matches_driver_path(spark):
    """Round-6 (VERDICT r5 task 7): with a forced-low budget the greedy
    D^2 recluster runs as a single-group Arrow pass on an executor; it
    must produce centroids identical to the driver-side NumPy path."""
    vecs = spark.createDataFrame(
        [
            (i, [float((i * 7 + j * 3) % 11) / 11.0 + (i % 4) * 5.0 for j in range(8)])
            for i in range(60)
        ],
        "vec_id long, embedding array<double>",
    )
    driver = similarity._kmeans_parallel_init(
        vecs, k=6, id_col="vec_id", vec_col="embedding"
    )
    distributed = similarity._kmeans_parallel_init(
        vecs, k=6, id_col="vec_id", vec_col="embedding", recluster_budget_bytes=1
    )
    assert distributed == driver


def test_near_dup_pairs_lsh_subset_recall_and_parity(spark, sf_dir):
    """X32 — banded-SRP cosine near-dup: (1) the Arrow-vectorized
    production path must reproduce the fold form row for row (buckets
    AND verified cosines); (2) every emitted pair must appear in the
    exact baseline with the identical 4-decimal cosine (the verify step
    makes false positives impossible by construction); (3) recall vs
    exact must clear the geometry's design point (8 bands x 3 bits
    measured ~0.89 at tau=0.4 on the real embeddings — assert >= 0.8)."""
    from emr_trino_autoscale_spark.io import load_table

    e = load_table(spark, sf_dir, "embeddings")
    planes = similarity.md5_sign_planes(n_planes=24, dim=64)

    fold = {
        (r["id_a"], r["id_b"]): str(r["cosine"])
        for r in similarity.near_dup_pairs_lsh(
            e, planes, n_bands=8, threshold=0.4
        ).collect()
    }
    vec = {
        (r["id_a"], r["id_b"]): str(r["cosine"])
        for r in similarity.near_dup_pairs_lsh(
            e, planes, n_bands=8, threshold=0.4, vectorized=True
        ).collect()
    }
    assert vec == fold

    exact = {
        (r["id_a"], r["id_b"]): str(r["cosine"])
        for r in similarity.near_dup_pairs(e, threshold=0.4).collect()
    }
    assert set(fold) <= set(exact)
    for pair, cos in fold.items():
        assert exact[pair] == cos
    assert len(exact) > 0
    assert len(fold) / len(exact) >= 0.8


def test_near_dup_lsh_in_bucket_precut_boundary(spark):
    """r14 in-bucket verify edge cases: (1) the in-kernel pre-cut
    (threshold - 1e-4) sits strictly below the ROUND(,4) survival
    boundary, so a cosine of ~0.39996 (rounds to 0.4000) is still
    emitted while ~0.39990 (rounds to 0.3999) is not; (2) a pair
    colliding in EVERY band emits exactly one row (the post-filter
    distinct collapses cross-band duplicates). The fold form is the
    unchanged reference for both."""
    import math

    rows = []
    for i, c in enumerate([1.0, 0.40002, 0.39996, 0.39990, 0.39980]):
        th = math.acos(min(c, 1.0))
        rows.append((i + 1, [math.cos(th), math.sin(th)] + [0.0] * 62))
    corpus = spark.createDataFrame(rows, "vec_id long, embedding array<float>")
    # one plane per band, both bands identical: every vector projects
    # positive, so every pair collides in BOTH bands
    planes = [[1.0] + [0.0] * 63] * 2

    fold = sorted(
        (r["id_a"], r["id_b"], str(r["cosine"]))
        for r in similarity.near_dup_pairs_lsh(
            corpus, planes, n_bands=2, threshold=0.4
        ).collect()
    )
    vec = sorted(
        (r["id_a"], r["id_b"], str(r["cosine"]))
        for r in similarity.near_dup_pairs_lsh(
            corpus, planes, n_bands=2, threshold=0.4, vectorized=True
        ).collect()
    )
    assert vec == fold
    pairs = [(a, b) for a, b, _ in vec]
    assert len(pairs) == len(set(pairs)), "cross-band duplicate pair emitted"
    assert (1, 2) in pairs          # 0.40002 — clears the threshold raw
    assert (1, 3) in pairs          # 0.39996 — survives only via rounding
    assert (1, 4) not in pairs      # 0.39990 — rounds to 0.3999
    assert (1, 5) not in pairs      # 0.39980 — below the pre-cut


def test_bigram_stats_counts_and_cond_prob(spark):
    # "a b", "a b a c" -> pairs: (a,b)x2, (b,a), (a,c); P(b|a)=2/3
    d = docs(spark, ["a b", "a b a c"])
    out = {(r["tok_a"], r["tok_b"]): r for r in text.bigram_stats(d).collect()}
    assert out[("a", "b")]["pair_count"] == 2
    assert out[("a", "b")]["left_count"] == 3
    assert abs(out[("a", "b")]["cond_prob"] - 2 / 3) < 1e-12
    assert out[("b", "a")]["pair_count"] == 1
    # single-token / empty docs emit no pairs
    one = docs(spark, ["solo"])
    assert text.bigram_stats(one).count() == 0


def test_bigram_cond_prob_sums_to_one_per_left_token(spark):
    d = docs(spark, ["x y z x y w", "y z z"])
    agg = (
        text.bigram_stats(d)
        .groupBy("tok_a")
        .agg(F.sum("cond_prob").alias("s"))
        .collect()
    )
    for r in agg:
        assert abs(r["s"] - 1.0) < 1e-9, r


def test_quality_classifier_orders_prose_above_junk(spark):
    prose = (
        "the cat sat on the mat and it was a fine day for all of the "
        "animals in the quiet town"
    )
    junk = "000000 111111 !!!???;;; 222222 !!!!!! 333333 ??????"
    d = docs(spark, [prose, junk])
    rows = {r["doc_id"]: r for r in text.quality_classifier(d).collect()}
    assert rows[0]["q_score"] > rows[1]["q_score"]
    assert rows[0]["verdict"] == "keep"
    assert rows[1]["verdict"] == "drop"
    for r in rows.values():
        assert 0.0 < r["q_score"] < 1.0


def test_perplexity_gate_deterministic_and_rate_monotone(spark):
    d = docs(spark, [f"tok{i % 7} common word" for i in range(40)])
    g1 = text.perplexity_gate(d, mid_loss=1.0, high_loss=2.0).collect()
    g2 = text.perplexity_gate(d, mid_loss=1.0, high_loss=2.0).collect()
    assert sorted(map(tuple, g1)) == sorted(map(tuple, g2))  # md5 coin replays
    # rate=1.0 bucket keeps everything; rate=0.0 keeps nothing
    all_keep = text.perplexity_gate(d, rates=(1.0, 1.0, 1.0))
    assert all_keep.filter(~F.col("keep")).count() == 0
    none_keep = text.perplexity_gate(d, rates=(0.0, 0.0, 0.0))
    assert none_keep.filter(F.col("keep")).count() == 0


def test_winsorized_stats_bounds_and_clip_count(spark):
    # one extreme outlier per group: winsorized mean must sit below the
    # raw mean and inside [p_lo, p_hi]
    rows = [("s", i, 100) for i in range(19)] + [("s", 99, 100000)]
    d = spark.createDataFrame(rows, "source string, doc_id long, n_chars long")
    r = text.winsorized_stats(d, group_col="source", value_col="n_chars").collect()[0]
    assert r["n"] == 20
    assert r["win_mean"] < r["raw_mean"]
    assert r["p_lo"] <= r["win_mean"] <= r["p_hi"]
    assert r["n_clipped"] >= 1


def test_duplicated_spans_merges_adjacent_hits(spark):
    # docs 0 and 1 share a 7-token passage -> 3 overlapping 5-gram hits
    # must merge into ONE span of 7 tokens; doc 2 contributes nothing.
    shared = "alpha beta gamma delta epsilon zeta eta"
    d = docs(
        spark,
        [
            shared + " unique0 tail0 end0",
            "head1 start1 " + shared,
            "totally different words here nothing matches at all ok",
        ],
    )
    out = dedup.duplicated_spans(d, k=5).collect()
    by_doc = {}
    for r in out:
        by_doc.setdefault(r["doc_id"], []).append(r)
    assert len(by_doc[0]) == 1 and len(by_doc[1]) == 1
    assert 2 not in by_doc
    s0 = by_doc[0][0]
    assert (s0["span_start"], s0["span_end"]) == (0, 6)
    assert s0["n_tokens"] == 7 and s0["n_grams"] == 3
    s1 = by_doc[1][0]
    assert (s1["span_start"], s1["span_end"]) == (2, 8)


def test_duplicated_spans_splits_on_gap(spark):
    # two separated duplicated regions in one doc -> two islands
    a = "one two three four five"
    b = "six seven eight nine ten"
    d = docs(spark, [a + " GAPX GAPY GAPZ QQQQ WWWW " + b, a + " zzz", b + " yyy"])
    spans = sorted(
        dedup.duplicated_spans(d, k=5).filter(F.col("doc_id") == 0).collect(),
        key=lambda r: r["span_start"],
    )
    assert len(spans) == 2
    assert (spans[0]["span_start"], spans[0]["span_end"]) == (0, 4)
    assert (spans[1]["span_start"], spans[1]["span_end"]) == (10, 14)


def test_bm25_ranks_tf_and_rarity(spark):
    d = docs(
        spark,
        [
            "apple apple apple banana filler filler",   # tf(apple)=3
            "apple filler filler filler filler filler", # tf(apple)=1
            "cherry filler filler filler filler filler",# rare term
            "filler filler filler filler filler filler",
        ],
    )
    out = {r["doc_id"]: r for r in text.bm25_scores(d, ("apple", "cherry")).collect()}
    assert set(out) == {0, 1, 2}          # doc 3 matches nothing
    assert out[0]["score"] > out[1]["score"]  # higher tf wins same term
    assert out[2]["score"] > out[1]["score"]  # rarer term out-idfs common one
    assert out[0]["n_matched"] == 1 and out[2]["n_matched"] == 1


def test_js_divergence_zero_for_identical_uniform_groups(spark):
    rows = [("a", 0, "x y z"), ("b", 1, "x y z")]
    d = spark.createDataFrame(rows, "source string, doc_id long, text string")
    out = {r["source"]: r["jsd"] for r in text.js_divergence(d).collect()}
    # both groups equal the corpus distribution -> JSD == 0
    for v in out.values():
        assert abs(v) < 1e-12
    # a fully disjoint group is bounded by ln 2 and strictly positive
    import math

    rows2 = [("a", 0, "x x x x"), ("b", 1, "y y y y")]
    d2 = spark.createDataFrame(rows2, "source string, doc_id long, text string")
    out2 = {r["source"]: r["jsd"] for r in text.js_divergence(d2).collect()}
    for v in out2.values():
        assert 0.0 < v <= math.log(2.0) + 1e-12


def test_bpe_learn_merge_order_and_greedy_apply(spark):
    # histogram: "aaab" x2, "abab" x1.
    # round 1: (a,a)=4 ties (a,b)=4 -> lex tie-break picks (a,a).
    # round 2: after aaab -> [aa,a,b], (a,b) = 2 (aaab) + 2 (abab) = 4.
    d = docs(spark, ["aaab aaab", "abab"])
    m = text.bpe_learn(d, n_merges=2).collect()
    assert (m[0]["left"], m[0]["right"], m[0]["pair_count"]) == ("a", "a", 4)
    assert (m[1]["left"], m[1]["right"], m[1]["pair_count"]) == ("a", "b", 4)
    # exhaustion: single repeated 2-char word runs out of mergeable pairs
    tiny = docs(spark, ["xy xy"])
    mm = text.bpe_learn(tiny, n_merges=5).collect()
    assert len(mm) == 1 and (mm[0]["left"], mm[0]["right"]) == ("x", "y")


def test_bpe_learn_driver_and_distributed_paths_agree(spark, monkeypatch):
    # the size-gated driver merge loop must reproduce the distributed
    # loop's merge sequence exactly (same weighting, argmax tie-break,
    # and greedy fold); overlapping runs and ties exercise the fold
    d = docs(spark, ["aaab aaab abab", "cac cac caca", "bbbb"])
    via_driver = [tuple(r) for r in text.bpe_learn(d, n_merges=4).collect()]
    monkeypatch.setenv("SPARK_GRAFT_BPE_DRIVER_VOCAB_CAP", "0")
    via_loop = [tuple(r) for r in text.bpe_learn(d, n_merges=4).collect()]
    assert via_driver == via_loop and len(via_driver) >= 3


def test_bpe_pair_stats_weights_by_word_count(spark):
    d = docs(spark, ["zz zz zz", "zq"])
    out = {(r["left"], r["right"]): r["pair_count"]
           for r in text.bpe_pair_stats(d).collect()}
    assert out[("z", "z")] == 3
    assert out[("z", "q")] == 1


def test_split_gram_overlap_counts_shared_distinct_grams(spark):
    shared = "w1 w2 w3 w4 w5"
    rows = [
        (0, shared + " traintail", "src_train"),
        (1, shared + " valtail", "src_val"),
        (2, "totally different words here five", "src_train2"),
    ]
    d = spark.createDataFrame(rows, "doc_id long, text string, source string")
    # force known splits via a literal CASE on source
    split = (
        F.when(F.col("source").isin("src_train", "src_train2"), F.lit("train"))
        .otherwise(F.lit("val"))
    )
    out = dedup.split_gram_overlap(d, split_col=split, k=5).collect()
    assert len(out) == 1
    r = out[0]
    # docs 0 and 1 share exactly one 5-gram (the shared prefix)
    assert (r["split_a"], r["split_b"], r["n_shared_grams"]) == ("train", "val", 1)


def test_hard_negatives_excludes_same_label_and_self(spark):
    rows = [
        (0, [1.0, 0.0], 0),   # anchor
        (1, [0.99, 0.14], 0), # same label, very similar -> must be excluded
        (2, [0.95, 0.31], 1), # different label, similar -> hardest negative
        (3, [0.0, 1.0], 1),   # different label, orthogonal
        (4, [0.9, 0.43], 0),  # same label -> excluded
    ]
    e = spark.createDataFrame(rows, "vec_id long, embedding array<double>, label int")
    anchors = e.filter(F.col("vec_id") == 0).select(
        F.col("vec_id").alias("q_id"), "label", "embedding"
    )
    out = similarity.hard_negatives(e, anchors, k=2).collect()
    got = [(r["neighbor_id"], r["rank"]) for r in sorted(out, key=lambda r: r["rank"])]
    assert got == [(2, 1), (3, 2)]
    for r in out:
        assert r["n_label"] != r["q_label"]


def test_cms_sketch_is_mergeable_and_never_underestimates(spark):
    a = docs(spark, ["x x y z", "y y q"])
    b = docs(spark, ["x z z w"])
    both = a.union(b)
    sk_a = text.cms_sketch(a, d=4, w=64)
    sk_b = text.cms_sketch(b, d=4, w=64)
    merged = (
        sk_a.union(sk_b).groupBy("j", "bucket").agg(F.sum("c").alias("c"))
    )
    direct = text.cms_sketch(both, d=4, w=64)
    assert sorted(map(tuple, merged.collect())) == sorted(
        map(tuple, direct.collect())
    )  # counter-wise sum == sketch of the union (mergeability)
    cands = spark.createDataFrame(
        [("x",), ("y",), ("z",), ("q",), ("w",)], "tok string"
    )
    est = {r["tok"]: r["cms_est"]
           for r in text.cms_estimate(cands, direct, d=4, w=64).collect()}
    true = {"x": 3, "y": 3, "z": 3, "q": 1, "w": 1}
    for t, c in true.items():
        assert est[t] >= c


def test_jl_projection_bounds_distance_distortion(spark):
    """X51: what JL actually guarantees — pairwise squared-distance
    ratios within (1 +- eps). At k=16 with sign planes, eps ~
    sqrt(ln n / k) is loose; with 435 pairs the chi-square_16 tails
    reach ~[0.23, 2.25] (measured, deterministic md5 planes), so the
    envelope is [0.15, 2.5] per pair with the unbiasedness assertion
    carrying the real weight. (Rank preservation on this
    corpus is deliberately NOT asserted: the synthetic vectors are
    near-uniform random, so top-5 rank gaps sit far below any JL
    distortion — measured recall@5 ~0.1 at k=16 and ~0.2 at k=48. The
    production use is distance-THRESHOLD ops, not fine ranking; see
    docs/SCALE.md.)"""
    import math

    from emr_trino_autoscale_spark.io import load_table

    e = load_table(spark, "/root/testdata/sf0.001", "embeddings").filter(
        F.col("vec_id") < 30
    )
    planes = similarity.md5_sign_planes(n_planes=16, dim=64)
    p = similarity.random_projection(e, planes)
    rows = p.select("vec_id", "embedding", "proj").collect()
    vecs = {r["vec_id"]: (r["embedding"], r["proj"]) for r in rows}

    def sqdist(a, b):
        return sum((x - y) ** 2 for x, y in zip(a, b))

    ids = sorted(vecs)
    ratios = []
    for i in range(len(ids)):
        for j in range(i + 1, len(ids)):
            v1, p1 = vecs[ids[i]]
            v2, p2 = vecs[ids[j]]
            d_true = sqdist(v1, v2)
            if d_true == 0:
                continue
            ratios.append(sqdist(p1, p2) / d_true)
    assert ratios
    assert all(0.15 <= r <= 2.5 for r in ratios), (min(ratios), max(ratios))
    # the mean ratio should sit near 1 (unbiased estimator)
    mean = sum(ratios) / len(ratios)
    assert 0.9 <= mean <= 1.1, mean


def test_neyman_allocation_favors_high_variance_strata(spark):
    from emr_trino_autoscale_spark.operators import stats as stats_ops

    rows = (
        [("flat", i, 100) for i in range(50)]
        + [("wild", i + 100, (i % 10) * 1000) for i in range(50)]
    )
    d = spark.createDataFrame(rows, "source string, doc_id long, n_chars long")
    out = {r["source"]: r for r in
           stats_ops.neyman_allocation(d, total_sample=40).collect()}
    assert out["flat"]["sd"] == 0.0
    assert out["flat"]["alloc"] == 0.0          # zero variance -> zero budget
    assert abs(out["wild"]["alloc"] - 40.0) < 1e-9
    # all-constant corpus degenerates to proportional, not NaN/zero-div
    d2 = spark.createDataFrame(
        [("a", 1, 5), ("a", 2, 5), ("b", 3, 5)],
        "source string, doc_id long, n_chars long",
    )
    out2 = {r["source"]: r["alloc"] for r in
            stats_ops.neyman_allocation(d2, total_sample=30).collect()}
    assert abs(out2["a"] - 20.0) < 1e-9 and abs(out2["b"] - 10.0) < 1e-9


def test_grouped_ols_recovers_known_line(spark):
    from emr_trino_autoscale_spark.operators import stats as stats_ops

    base = 1_700_000_000  # epoch-scale x: the cancellation regime the
    rows = [("g", base + i, 3.0 * i + 7.0) for i in range(100)]
    d = spark.createDataFrame(rows, "g string, x long, y double")
    r = stats_ops.grouped_ols(d, "g", x=F.col("x"), y=F.col("y")).collect()[0]
    assert abs(r["slope"] - 3.0) < 1e-6          # centered form survives 1e9 offsets
    assert abs(r["intercept"] - (7.0 - 3.0 * base)) / abs(7.0 - 3.0 * base) < 1e-6
    assert abs(r["r2"] - 1.0) < 1e-9


def test_rolling_zscore_flags_spike_not_baseline(spark):
    from datetime import datetime, timezone

    from emr_trino_autoscale_spark.operators import stats as stats_ops

    def t(s):
        return datetime(2026, 1, 1, 0, 0, s, tzinfo=timezone.utc)

    vals = [10.0, 11.0, 9.0, 10.0, 11.0, 10.5, 50.0]  # spike at the end
    rows = [(i, t(i), 1, vals[i]) for i in range(len(vals))]
    d = spark.createDataFrame(
        rows, "event_id long, ts timestamp, user_id long, value double"
    )
    out = stats_ops.rolling_zscore(
        d, lookback=5, threshold=2.0
    ).orderBy("event_id").collect()
    flags = [r["is_anomaly"] for r in out]
    assert flags == [False] * 6 + [True]
    assert out[6]["baseline_n"] == 5
    # first 5 rows have no full baseline -> zscore NULL, never flagged
    assert all(out[i]["zscore"] is None for i in range(5))


def _make_ppm(width, height, pixel_fn):
    header = f"P6\n{width} {height}\n255\n".encode()
    body = bytearray()
    for y in range(height):
        for x in range(width):
            r, g, b = pixel_fn(x, y)
            body += bytes((r, g, b))
    return header + bytes(body)


def test_image_ahash_near_dup_pairs(spark):
    """X57: two near-identical gradient images hash within a few bits;
    an inverted image is far; corrupt payloads yield NULL signatures and
    never crash the batch."""

    def grad(x, y):
        v = (x * 2) % 256
        return (v, v, v)

    def grad_noisy(x, y):  # same structure, tiny perturbation
        v = (x * 2 + (1 if (x + y) % 97 == 0 else 0)) % 256
        return (v, v, v)

    def inverted(x, y):
        v = 255 - ((x * 2) % 256)
        return (v, v, v)

    rows = [
        (0, _make_ppm(64, 64, grad)),
        (1, _make_ppm(64, 64, grad_noisy)),
        (2, _make_ppm(64, 64, inverted)),
        (3, b"NOT A PPM AT ALL"),
        (4, None),
    ]
    d = spark.createDataFrame(rows, "media_id long, payload binary")
    sigs = multimodal.image_ahash(d)
    got = {r["media_id"]: r["ahash"] for r in sigs.collect()}
    assert got[3] is None and got[4] is None
    assert got[0] is not None and got[0] == got[1] or bin(
        got[0] ^ got[1]
    ).count("1") <= 6
    pairs = multimodal.ahash_near_dup_pairs(sigs, max_hamming=6).collect()
    got_pairs = {(r["id_a"], r["id_b"]) for r in pairs}
    assert (0, 1) in got_pairs
    assert (0, 2) not in got_pairs and (1, 2) not in got_pairs


def test_tfidf_cosine_pairs_lossless_prefix_on_zipfian_fixture(spark):
    """X58: on a Zipfian corpus (shared stop-tokens + rare content
    terms) the prefix filter prunes, and the output still equals the
    brute-force relational join — the losslessness proof's empirical
    twin."""
    stop = "the of and a to in is it"
    rows = [
        (0, stop + " quantum flux capacitor"),
        (1, stop + " quantum flux capacitor"),          # exact twin of 0
        (2, stop + " quantum flux resistor"),           # near 0/1
        (3, stop + " gardening tomato seeds"),          # unrelated content
        (4, stop + " gardening tomato soil"),           # near 3
    ]
    d = spark.createDataFrame(rows, "doc_id long, text string")
    got = {
        (r["id_a"], r["id_b"]): r["cosine"]
        for r in dedup.tfidf_cosine_pairs(d, threshold=0.9).collect()
    }
    # brute force in-test oracle
    import math
    from collections import Counter

    texts = {i: t.split(" ") for i, t in rows}
    n = len(rows)
    df_counts = Counter(t for toks in texts.values() for t in set(toks))
    vecs = {}
    for i, toks in texts.items():
        tf = Counter(toks)
        w = {t: c * math.log(1.0 + n / df_counts[t]) for t, c in tf.items()}
        nrm = math.sqrt(sum(x * x for x in w.values()))
        vecs[i] = {t: x / nrm for t, x in w.items()}
    want = {}
    for a in range(n):
        for b in range(a + 1, n):
            dot = sum(vecs[a][t] * vecs[b].get(t, 0.0) for t in vecs[a])
            if round(dot, 4) >= 0.9:
                want[(a, b)] = round(dot, 4)
    assert set(got) == set(want)
    for k in want:
        assert abs(float(got[k]) - want[k]) < 1e-9
    assert (0, 1) in got  # the exact twin survived


def test_pq_sdc_exact_when_query_is_centroid_tuple(spark):
    """X60: when a query IS a centroid-tuple vector, SDC and ADC agree
    exactly (the quantization error on the query side is zero), and the
    query's own code-tuple twin ranks first at distance 0."""
    import numpy as np

    cb = similarity.md5_codebooks(m=4, ksub=4, dsub=16)
    arr = np.array(cb)
    # vec 0: centroid tuple (0,1,2,3); vec 1: same tuple (exact twin);
    # vec 2: different tuple
    v0 = np.concatenate([arr[s][s % 4] for s in range(4)])
    v2 = np.concatenate([arr[s][(s + 1) % 4] for s in range(4)])
    rows = [(0, [float(x) for x in v0]), (1, [float(x) for x in v0]),
            (2, [float(x) for x in v2])]
    e = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    q = e.filter(F.col("vec_id") == 0).select(
        F.col("vec_id").alias("q_id"), "embedding"
    )
    out = similarity.pq_sdc_topk(e, q, cb, k=2).orderBy("rank").collect()
    assert out[0]["neighbor_id"] == 1 and out[0]["sdc_dist"] == 0.0
    assert out[1]["neighbor_id"] == 2 and out[1]["sdc_dist"] > 0.0


def test_ranking_metrics_known_values(spark):
    from emr_trino_autoscale_spark.operators import stats as stats_ops

    # truth for q0: items 1,2,3. predicted: [1(rank1), 9(rank2), 3(rank3)]
    truth = spark.createDataFrame(
        [(0, 1), (0, 2), (0, 3), (1, 7)], "q_id long, neighbor_id long"
    )
    pred = spark.createDataFrame(
        [(0, 1, 1), (0, 9, 2), (0, 3, 3), (1, 8, 1), (1, 6, 2)],
        "q_id long, neighbor_id long, rank int",
    )
    out = {r["q_id"]: r for r in
           stats_ops.ranking_metrics(pred, truth, k=5).collect()}
    import math

    r0 = out[0]
    assert r0["hits"] == 2 and abs(r0["recall"] - 2 / 3) < 1e-12
    assert abs(r0["mrr"] - 1.0) < 1e-12
    dcg = 1 / math.log2(2) + 1 / math.log2(4)
    idcg = sum(1 / math.log2(i + 1) for i in (1, 2, 3))
    assert abs(r0["ndcg"] - dcg / idcg) < 1e-12
    # query 1: nothing relevant retrieved
    r1 = out[1]
    assert r1["hits"] == 0 and r1["recall"] == 0.0 and r1["mrr"] == 0.0
    assert r1["ndcg"] == 0.0


def test_dp_histogram_noise_is_laplace_shaped_and_deterministic(spark):
    from emr_trino_autoscale_spark.operators import stats as stats_ops

    rows = [(f"s{i % 7}", i) for i in range(70)]
    d = spark.createDataFrame(rows, "source string, doc_id long")
    h1 = {r["source"]: r for r in stats_ops.dp_histogram(d, epsilon=1.0).collect()}
    h2 = {r["source"]: r for r in stats_ops.dp_histogram(d, epsilon=1.0).collect()}
    for s in h1:
        assert h1[s]["noise"] == h2[s]["noise"]          # replayable
        assert h1[s]["noisy_count"] == h1[s]["true_count"] + h1[s]["noise"]
        assert h1[s]["true_count"] == 10
    # epsilon scaling: half the epsilon doubles every noise draw
    h05 = {r["source"]: r["noise"]
           for r in stats_ops.dp_histogram(d, epsilon=0.5).collect()}
    for s in h1:
        assert abs(h05[s] - 2.0 * h1[s]["noise"]) < 1e-9


def test_tfidf_cosine_pairs_uniform_df_stress(spark):
    """X58 adversarial contract (VERDICT r6 task 4): on a uniform-df
    corpus (every token appears in every document — no token is rare)
    the prefix filter cannot prune, prefixes approach whole documents,
    and the candidate count approaches the brute-force pair count.
    Pin the documented behavior:

    1. quadratic-with-correct-answers by default — the candidate bound
       on 40 identical-vocabulary docs is ~the full C(40,2) pair count;
    2. candidate_budget turns that into an early ValueError BEFORE the
       quadratic join is scheduled (the 100 TB-safe mode);
    3. a generous budget leaves the result untouched and exact.
    """
    import pytest as _pytest

    vocab = [f"tok{i}" for i in range(12)]
    ndocs = 40
    rows = [
        # rotate the shared vocabulary so docs differ in token ORDER
        # (and one doubled token each) but every token's df == ndocs
        (i, " ".join(vocab[i % 12:] + vocab[: i % 12] + [vocab[i % 12]]))
        for i in range(ndocs)
    ]
    d = spark.createDataFrame(rows, "doc_id long, text string")

    brute_pairs = ndocs * (ndocs - 1) // 2
    # tight budget: the bound must blow through it (uniform df -> no pruning)
    with _pytest.raises(ValueError, match="candidate_budget"):
        tfidf_cosine_pairs_fn = dedup.tfidf_cosine_pairs
        tfidf_cosine_pairs_fn(d, threshold=0.9, candidate_budget=brute_pairs // 4)

    # default mode (and a generous budget): degrades to the exact join
    got = {
        (r["id_a"], r["id_b"]): r["cosine"]
        for r in dedup.tfidf_cosine_pairs(
            d, threshold=0.9, candidate_budget=brute_pairs * len(vocab) * 2
        ).collect()
    }
    # brute-force in-test oracle (same arithmetic as the Zipfian test)
    import math
    from collections import Counter

    texts = {i: t.split(" ") for i, t in rows}
    df_counts = Counter(t for toks in texts.values() for t in set(toks))
    vecs = {}
    for i, toks in texts.items():
        tf = Counter(toks)
        w = {t: c * math.log(1.0 + ndocs / df_counts[t]) for t, c in tf.items()}
        nrm = math.sqrt(sum(x * x for x in w.values()))
        vecs[i] = {t: x / nrm for t, x in w.items()}
    want = {}
    for a in range(ndocs):
        for b in range(a + 1, ndocs):
            dot = sum(vecs[a][t] * vecs[b].get(t, 0.0) for t in vecs[a])
            if round(dot, 4) >= 0.9:
                want[(a, b)] = round(dot, 4)
    assert got == want
    # sanity: the adversarial corpus really is the dense regime — with
    # uniform df every pair collides (identical unit vectors up to the
    # one doubled token), so the survivor set is a large fraction of
    # all pairs, not a sparse near-dup set
    assert len(want) > brute_pairs // 4


def test_ranking_metrics_truth_only_query_scores_zero(spark):
    """ADVICE r6: a query present in truth but with ZERO prediction rows
    must emit a zero-valued metrics row instead of disappearing (which
    silently inflated averaged recall/MRR/nDCG)."""
    from emr_trino_autoscale_spark.operators import stats as stats_ops

    truth = spark.createDataFrame(
        [(0, 1), (0, 2), (5, 7), (5, 8)], "q_id long, neighbor_id long"
    )
    pred = spark.createDataFrame(
        [(0, 1, 1), (0, 9, 2)], "q_id long, neighbor_id long, rank int"
    )
    out = {r["q_id"]: r for r in
           stats_ops.ranking_metrics(pred, truth, k=5).collect()}
    assert set(out) == {0, 5}                       # q5 no longer dropped
    r5 = out[5]
    assert r5["n_truth"] == 2 and r5["hits"] == 0
    assert r5["recall"] == 0.0 and r5["mrr"] == 0.0 and r5["ndcg"] == 0.0
    # the averaged headline metric the advisor flagged: with q5 present,
    # mean recall halves
    assert abs(sum(r["recall"] for r in out.values()) / 2 - 0.25) < 1e-12


def test_semantic_dedup_min_neighbor_rule_and_cluster_blocking(spark):
    """X65: a doc is dup iff a smaller-id SAME-CLUSTER neighbor has
    cosine >= threshold; dup_of is the minimum such neighbor; near
    pairs split across clusters are NOT marked (the SemDeDup blocking
    semantics, by design)."""
    from emr_trino_autoscale_spark.operators import similarity as sim

    # two orthogonal 4-dim clusters; ids 0,1,2 identical direction,
    # id 3 orthogonal, id 4 = same direction as 3
    rows = [
        (0, [1.0, 0.0, 0.0, 0.0]),
        (1, [1.0, 0.001, 0.0, 0.0]),
        (2, [0.999, 0.0, 0.001, 0.0]),
        (3, [0.0, 0.0, 0.0, 1.0]),
        (4, [0.0, 0.0, 0.001, 1.0]),
    ]
    d = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    cents = spark.createDataFrame(
        [(0, [1.0, 0.0, 0.0, 0.0]), (1, [0.0, 0.0, 0.0, 1.0])],
        "c_id int, embedding array<double>",
    )
    out = {r["vec_id"]: r for r in sim.semantic_dedup(d, cents, threshold=0.9).collect()}
    assert out[0]["cluster_id"] == 0 and not out[0]["is_dup"]
    assert out[1]["dup_of"] == 0 and out[2]["dup_of"] == 0
    assert out[3]["cluster_id"] == 1 and not out[3]["is_dup"]
    assert out[4]["dup_of"] == 3
    # cross-cluster near pair is not marked: nothing in cluster 1 dups
    # against cluster 0 members even at high cosine within the cluster
    assert out[3]["dup_of"] is None


def test_blocked_levenshtein_pairs_recall_contract(spark):
    """X66: suffix edits within a shared block are found; an edit
    INSIDE the blocking prefix is missed (the documented recall
    caveat); distance is exact."""
    from emr_trino_autoscale_spark.operators import dedup as dd

    rows = [
        (1, "Customer#000000001"),
        (2, "Customer#000000002"),   # suffix edit, same block
        (3, "Customer#100000001"),   # edit inside the 16-char prefix
        (4, "Customer#000000011"),   # two suffix edits from id 1? (dist 1 vs id2? )
    ]
    d = spark.createDataFrame(rows, "c_custkey long, c_name string")
    got = {
        (r["id_a"], r["id_b"]): r["dist"]
        for r in dd.blocked_levenshtein_pairs(
            d, block_prefix_len=16, max_dist=1
        ).collect()
    }
    assert got[(1, 2)] == 1
    assert (1, 3) not in got          # blocked away despite dist 1
    assert got[(1, 4)] == 1
    assert (2, 4) not in got          # dist 2 ("...002" vs "...011") > max_dist


def test_weighted_sample_contract(spark):
    """X67: deterministic (same coins both runs), k-bounded per
    stratum, non-positive weights excluded, ranks contiguous."""
    from emr_trino_autoscale_spark.operators import stats as stats_ops

    rows = [(i, "a" if i % 2 else "b", float(i % 7 - 1)) for i in range(60)]
    d = spark.createDataFrame(rows, "doc_id long, lang string, w double")
    out1 = stats_ops.weighted_sample(
        d, "w", k=5, strata_cols=("lang",), id_col="doc_id"
    ).collect()
    out2 = stats_ops.weighted_sample(
        d, "w", k=5, strata_cols=("lang",), id_col="doc_id"
    ).collect()
    assert sorted(map(tuple, out1)) == sorted(map(tuple, out2))
    by_lang = {}
    for r in out1:
        assert r["w"] > 0
        by_lang.setdefault(r["lang"], []).append(r["rank"])
    for lang, ranks in by_lang.items():
        assert sorted(ranks) == list(range(1, len(ranks) + 1))
        assert len(ranks) <= 5


def test_profile_columns_counts(spark):
    from emr_trino_autoscale_spark.operators import stats as stats_ops

    rows = [(1, "x"), (2, None), (3, "x"), (None, "y")]
    d = spark.createDataFrame(rows, "a int, b string")
    out = {r["column"]: r for r in stats_ops.profile_columns(d, ("a", "b")).collect()}
    assert out["a"]["n_rows"] == 4 and out["a"]["n_null"] == 1
    assert out["a"]["n_distinct"] == 3
    assert out["b"]["n_distinct"] == 2 and out["b"]["n_null"] == 1
    assert out["b"]["min_val"] == "x" and out["b"]["max_val"] == "y"


def test_concentration_curve_shares(spark):
    from emr_trino_autoscale_spark.operators import stats as stats_ops

    rows = [("s1", 60), ("s1", 20), ("s2", 15), ("s3", 5)]
    d = spark.createDataFrame(rows, "source string, n_chars long")
    out = {r["rank"]: r for r in stats_ops.concentration_curve(d).collect()}
    assert out[1]["source"] == "s1" and out[1]["share"] == 0.8
    assert out[2]["cum_share"] == 0.95 and out[3]["cum_share"] == 1.0
    assert out[1]["total_mass"] == 80


def test_snapshot_diff_statuses(spark):
    """X71: added/removed/changed classified on the digest join; NULL
    payload distinguished from the string 'None' by the sentinel;
    unchanged excluded by default, included on request."""
    from emr_trino_autoscale_spark.operators import registry as reg

    old = spark.createDataFrame(
        [(1, "a"), (2, "b"), (3, None), (4, "d")], "k long, v string"
    )
    new = spark.createDataFrame(
        [(1, "a"), (2, "B"), (3, "None"), (5, "e")], "k long, v string"
    )
    got = {r["k"]: r["status"] for r in
           reg.snapshot_diff(old, new, ("k",), ("v",)).collect()}
    assert got == {2: "changed", 3: "changed", 4: "removed", 5: "added"}
    full = {r["k"]: r["status"] for r in
            reg.snapshot_diff(old, new, ("k",), ("v",), include_unchanged=True).collect()}
    assert full[1] == "unchanged" and len(full) == 5


def test_psi_drift_known_shift_and_null_shift(spark):
    """X72: identical distributions -> psi ~ 0; a hard shift between
    periods -> large psi; single-period groups excluded."""
    import datetime as dt

    from emr_trino_autoscale_spark.operators import stats as stats_ops
    from pyspark.sql import functions as F

    d1 = dt.datetime(2024, 1, 5)
    d2 = dt.datetime(2024, 1, 25)
    rows = []
    # 'stable': same values both halves; 'shifted': low -> high buckets
    for i in range(200):
        rows.append((i, d1, "stable", float(i % 400)))
        rows.append((i, d2, "stable", float(i % 400)))
        rows.append((i, d1, "shifted", float(i % 100)))
        rows.append((i, d2, "shifted", 400.0 + i % 90))
    rows.append((0, d1, "only_baseline", 10.0))
    d = spark.createDataFrame(rows, "event_id long, ts timestamp, event_type string, value double")
    out = {r["event_type"]: r for r in
           stats_ops.psi_drift(d, period_b=F.dayofmonth("ts") > 15).collect()}
    assert abs(out["stable"]["psi"]) < 0.01
    assert out["shifted"]["psi"] > 1.0
    assert "only_baseline" not in out
    assert out["stable"]["n_baseline"] == 200 and out["stable"]["n_comparison"] == 200


def test_minhash_lsh_pairs_exactness_and_banding(spark):
    """X74: identical docs share the full signature (guaranteed
    collision in every band); disjoint docs never collide; every
    EMITTED pair carries the exact set-Jaccard (verified against a
    brute-force in-test oracle)."""
    rows = [
        (0, "alpha beta gamma delta epsilon zeta"),
        (1, "alpha beta gamma delta epsilon zeta"),       # identical to 0
        (2, "alpha beta gamma delta epsilon eta"),        # near 0/1
        (3, "one two three four five six"),               # disjoint
    ]
    d = spark.createDataFrame(rows, "doc_id long, text string")
    got = {
        (r["id_a"], r["id_b"]): (r["n_common"], r["jaccard"])
        for r in dedup.minhash_lsh_pairs(d, threshold=0.3).collect()
    }
    assert (0, 1) in got and got[(0, 1)][1] == 1.0
    assert all(3 not in p for p in got)
    # exactness of emitted pairs vs brute force
    import itertools

    sh = {
        i: {
            " ".join(t.split()[j:j + 3])
            for j in range(len(t.split()) - 2)
        }
        for i, t in rows
    }
    for (a, b), (nc, jac) in got.items():
        inter = len(sh[a] & sh[b])
        union = len(sh[a] | sh[b])
        assert nc == inter and jac == round(inter / union, 4)


def test_minhash_lsh_recall_vs_exact_ppjoin(spark):
    """X74 vs X2-exact evidence on the real fixture: every LSH-emitted
    pair is in the exact jaccard>=0.5 pair set (verify exactness =>
    subset is structural), and measured recall at the fixture geometry
    is high (the b=8,r=2 S-curve gives ~90% at j=0.5, ~99% at j=0.7 —
    pin a conservative floor so a broken banding shows up)."""
    from emr_trino_autoscale_spark.io import load_table

    d = load_table(spark, "/root/testdata/sf0.001", "documents")
    lsh = {
        (r["id_a"], r["id_b"])
        for r in dedup.minhash_lsh_pairs(d, threshold=0.5).collect()
    }
    exact = {
        (r["id_a"], r["id_b"])
        for r in dedup.ngram_jaccard_pairs(d, threshold=0.5).collect()
    }
    assert lsh <= exact
    assert len(exact) > 0
    recall = len(lsh) / len(exact)
    assert recall >= 0.8, f"banding recall collapsed: {recall:.2f}"


def test_multi_pass_entity_pairs_recovers_prefix_edit(spark):
    """X66 multi-pass: a prefix-internal edit (missed by the prefix
    block) is recovered by the suffix block; pairs surfacing in both
    passes appear once with the exact distance."""
    from pyspark.sql import functions as F

    rows = [
        (1, "Customer#000000001"),
        (2, "Customer#000000002"),   # suffix edit: prefix pass finds it
        (3, "Customer#100000001"),   # prefix edit: only the suffix pass
    ]
    d = spark.createDataFrame(rows, "c_custkey long, c_name string")
    passes = [
        F.substring(F.col("c_name"), 1, 16),            # prefix key
        F.substring(F.col("c_name"), -6, 6),            # suffix key
    ]
    got = {
        (r["id_a"], r["id_b"]): r["dist"]
        for r in dedup.multi_pass_entity_pairs(d, passes).collect()
    }
    assert got[(1, 2)] == 1          # found by prefix pass
    assert got[(1, 3)] == 1          # recovered by suffix pass
    assert (2, 3) not in got         # dist 2 everywhere


def test_resize_images_block_mean_and_null_degrade(spark):
    """X6 resize stage: exact block-mean downsample of a gradient PPM;
    output re-decodes as a valid smaller PPM; corrupt payloads yield
    NULL payload/dims, never task failures."""
    def grad(x, y):
        v = (x * 4) % 256
        return (v, v, v)

    rows = [(0, _make_ppm(64, 64, grad)), (1, b"NOT A PPM"), (2, None)]
    d = spark.createDataFrame(rows, "media_id long, payload binary")
    out = {r["media_id"]: r for r in
           multimodal.resize_images(d, out_w=16, out_h=16).collect()}
    assert out[1]["payload"] is None and out[2]["payload"] is None
    p = bytes(out[0]["payload"])
    assert p.startswith(b"P6\n16 16\n255\n")
    assert (out[0]["width"], out[0]["height"]) == (16, 16)
    # block means of the x-gradient: row-constant columns; spot-check
    # cell (0,0) = mean of x in [0,4) * 4 -> (0+4+8+12)/4 = 6
    body = p[len(b"P6\n16 16\n255\n"):]
    assert body[0] == 6 and body[1] == 6 and body[2] == 6
    # re-decode through the production decoder (valid-PPM contract)
    feats = multimodal.decode_ppm_image(p)
    assert abs(feats[4] - 16 / 4096.0) < 1e-9


def test_frame_sample_stride_and_corrupt_degrade(spark):
    """X6 frame-sample stage: a 10-frame clip at max_frames=4 emits an
    evenly-strided frame set; each frame is a valid grayscale PPM with
    the frame's constant luma; corrupt clips contribute zero rows."""
    clip = _y4m_clip(8, 8, list(range(10, 110, 10)), chroma="420")
    rows = [(0, clip), (1, b"garbage")]
    d = spark.createDataFrame(rows, "media_id long, payload binary")
    out = multimodal.frame_sample(d, max_frames=4).collect()
    by_idx = {r["frame_idx"]: r for r in out}
    assert all(r["media_id"] == 0 for r in out)
    assert sorted(by_idx) == [0, 3, 6, 9]          # stride over 10 frames
    for fi, r in by_idx.items():
        p = bytes(r["payload"])
        assert p.startswith(b"P6\n8 8\n255\n")
        # constant-luma frame fi has luma 10*(fi+1)
        assert p[len(b"P6\n8 8\n255\n")] == 10 * (fi + 1)
        assert (r["width"], r["height"]) == (8, 8)


def test_bpe_encode_golden_segmentations(spark):
    """X45 apply stage: hand-computed golden segmentations — greedy
    left-to-right non-overlap ('aaaa' -> [aa, aa]), merge chaining
    ((a,b) then (ab,c) -> 'abc' one piece), unseen words fall back to
    characters; doc rollup counts match."""
    from emr_trino_autoscale_spark.operators import text as text_ops

    d = spark.createDataFrame(
        [(1, "abc aaaa xy"), (2, "abc abc")], "doc_id long, text string"
    )
    merges = [("a", "b"), ("ab", "c"), ("a", "a")]
    seg = {
        r["w"]: list(r["pieces"])
        for r in text_ops.bpe_word_segments(d, merges).collect()
    }
    assert seg["abc"] == ["abc"]
    assert seg["aaaa"] == ["aa", "aa"]
    assert seg["xy"] == ["x", "y"]
    enc = {r["doc_id"]: r for r in text_ops.bpe_encode(d, merges).collect()}
    assert enc[1]["n_words"] == 3 and enc[1]["n_bpe_tokens"] == 1 + 2 + 2
    assert enc[2]["n_words"] == 2 and enc[2]["n_bpe_tokens"] == 2
    assert enc[2]["pieces_per_word"] == 1.0


def test_bpe_learn_apply_round_trip(spark):
    """X45 learn->apply: segmenting with the merges bpe_learn just
    produced reproduces the trainer's own final segmentation (the
    shared _merge_fold means apply can't drift from training)."""
    from emr_trino_autoscale_spark.io import load_table
    from emr_trino_autoscale_spark.operators import text as text_ops

    d = load_table(spark, "/root/testdata/sf0.001", "documents").limit(50)
    merges = [
        (r["left"], r["right"])
        for r in text_ops.bpe_learn(d, n_merges=4).collect()
    ]
    assert len(merges) == 4
    seg = text_ops.bpe_word_segments(d, merges)
    # every piece is either a learned merge product or a single char
    vocab = {l + r for l, r in merges}
    for r in seg.collect():
        for piece in r["pieces"]:
            assert len(piece) == 1 or piece in vocab or any(
                piece == l + r for l, r in merges
            )
        assert "".join(r["pieces"]) == r["w"]


def test_dimension_stats_and_standardize(spark):
    """X76: per-dim stats match numpy; standardized vectors have ~0
    mean and ~1 sample std per dimension; zero-std dims pass through
    centered."""
    import numpy as np

    rng = [[float(i + j * 2) for i in range(4)] for j in range(6)]
    for row in rng:
        row[3] = 7.0                       # constant dim -> std 0
    d = spark.createDataFrame(
        [(i, v) for i, v in enumerate(rng)], "vec_id long, embedding array<double>"
    )
    from emr_trino_autoscale_spark.operators import similarity as sim

    stats = sim.dimension_stats(d)
    got = {r["dim"]: (r["mean"], r["std"]) for r in stats.collect()}
    m = np.array(rng)
    for i in range(4):
        assert abs(got[i + 1][0] - round(float(m[:, i].mean()), 4)) < 1e-9
        assert abs(got[i + 1][1] - round(float(m[:, i].std(ddof=1)), 4)) < 1e-9
    assert got[4][1] == 0.0
    std = sim.standardize_vectors(d, stats)
    z = np.array([list(r["standardized"]) for r in std.orderBy("vec_id").collect()])
    for i in range(3):
        assert abs(z[:, i].mean()) < 1e-4
        assert abs(z[:, i].std(ddof=1) - 1.0) < 1e-3
    # constant dim: centered, not divided
    assert np.allclose(z[:, 3], 0.0)


def test_dimension_stats_large_offset(spark):
    """X76 numerical stability (VERDICT r7 wrong #2): a feature column
    with mean >> std (e.g. an un-centered activation offset by 1e6)
    must keep its 4-decimal std. The previous raw-moment form
    sqrt((sum_sq - n*mean^2)/(n-1)) loses ALL significant digits here
    (at mean=1e6, sum_sq ~ 1e12 and the true css ~ 1e0 sits below
    float64's 15-digit resolution of the difference); the centered
    two-pass form keeps full precision. Oracle: DuckDB's Welford-based
    STDDEV_SAMP over the same values, 4-decimal parity."""
    import duckdb
    import numpy as np

    rng = np.random.RandomState(76)
    base = rng.normal(0.0, 0.5, size=(200, 3))
    offs = base + np.array([1e6, 1e7, 3.0])  # two huge-mean dims, one sane
    rows = [(i, "g%d" % (i % 2), [float(x) for x in offs[i]]) for i in range(200)]
    d = spark.createDataFrame(rows, "vec_id long, label string, embedding array<double>")
    from emr_trino_autoscale_spark.operators import similarity as sim

    got = {
        (r["label"], r["dim"]): (r["mean"], r["std"])
        for r in sim.dimension_stats(d, group_col="label").collect()
    }
    con = duckdb.connect()
    con.execute(
        "CREATE TABLE t (label VARCHAR, dim INT, val DOUBLE)"
    )
    con.executemany(
        "INSERT INTO t VALUES (?, ?, ?)",
        [(lab, i + 1, v[i]) for _, lab, v in rows for i in range(3)],
    )
    want = {
        (lab, dim): (m, s)
        for lab, dim, m, s in con.execute(
            "SELECT label, dim, ROUND(AVG(val), 4) + 0.0, "
            "ROUND(STDDEV_SAMP(val), 4) FROM t GROUP BY label, dim"
        ).fetchall()
    }
    con.close()
    assert set(got) == set(want)
    for k in got:
        assert abs(got[k][0] - want[k][0]) < 1e-9, (k, got[k], want[k])
        assert abs(got[k][1] - want[k][1]) < 1e-9, (k, got[k], want[k])
        # and the std is actually resolved: ~0.5, not 0 or garbage
        assert 0.3 < got[k][1] < 0.7, (k, got[k])


def test_semantic_dedup_banded_verify(spark, sf_dir):
    """X65 100 TB verify path (VERDICT r7 task 4): semantic_dedup's
    verify='banded' swaps the within-cluster exact pair join (work =
    sum(cluster_size^2)) for the banded-SRP candidate contract keyed by
    (cluster, band, bucket). Pins: (1) banded duplicates are a SUBSET
    of the exact form's (every banded pair passes the same exact-cosine
    check AND must collide in a band, so no new dups can appear);
    (2) matched rows agree on cluster_id and dup_of; (3) recall clears
    the 8x3 S-curve design point measured on the q104 fixture (the
    same geometry as the q73/X32 test, >= 0.8); (4) cluster scoping is
    real — banded emits no pair the exact form's cluster key forbids."""
    from emr_trino_autoscale_spark.io import load_table

    e = load_table(spark, sf_dir, "embeddings")
    cents = spark.createDataFrame(
        [(c, v) for c, v in enumerate(similarity.md5_centroids(k=8, dim=64))],
        "c_id int, embedding array<double>",
    )
    exact = {
        r["vec_id"]: (r["cluster_id"], r["dup_of"], r["is_dup"])
        for r in similarity.semantic_dedup(e, cents, threshold=0.4).collect()
    }
    banded = {
        r["vec_id"]: (r["cluster_id"], r["dup_of"], r["is_dup"])
        for r in similarity.semantic_dedup(
            e, cents, threshold=0.4, verify="banded"
        ).collect()
    }
    assert set(exact) == set(banded)  # same row universe
    exact_dups = {k for k, v in exact.items() if v[2]}
    banded_dups = {k for k, v in banded.items() if v[2]}
    assert banded_dups <= exact_dups  # (1) subset
    for k in banded:
        assert banded[k][0] == exact[k][0]  # (2) same cluster assignment
    # dup_of may differ when banding misses the minimum neighbor but
    # catches a larger one; when it matches the exact minimum, pin it
    agree = sum(
        1 for k in banded_dups if banded[k][1] == exact[k][1]
    )
    assert agree >= 0.7 * max(len(banded_dups), 1)
    assert len(exact_dups) > 0
    assert len(banded_dups) / len(exact_dups) >= 0.8  # (3) recall


def test_profile_columns_approx(spark, sf_dir):
    """X68 approx mode (VERDICT r7 task 8): approx_count_distinct in
    the same single-agg shape. Pins: identical row set (one row per
    profiled column), exact n_rows/n_null/min/max (only ndv is
    sketched), and ndv within 3x the HLL++ default rsd (5%) of the
    exact count on the real documents table. Also pins the plan shape:
    no Expand node creeps in (the q43 multi-distinct gotcha)."""
    from emr_trino_autoscale_spark.io import load_table
    from emr_trino_autoscale_spark.operators import stats as st

    d = load_table(spark, sf_dir, "documents")
    cols = ("doc_id", "lang", "source", "text")
    exact = {r["column"]: r for r in st.profile_columns(d, cols).collect()}
    appr_df = st.profile_columns(d, cols, approx=True)
    assert "Expand" not in appr_df._jdf.queryExecution().executedPlan().toString()
    appr = {r["column"]: r for r in appr_df.collect()}
    assert set(exact) == set(appr) == set(cols)
    for c in cols:
        e, a = exact[c], appr[c]
        assert (e["n_rows"], e["n_null"], e["min_val"], e["max_val"]) == (
            a["n_rows"], a["n_null"], a["min_val"], a["max_val"]
        )
        assert abs(a["n_distinct"] - e["n_distinct"]) <= max(
            0.15 * e["n_distinct"], 2
        ), (c, e["n_distinct"], a["n_distinct"])


def test_substring_search_matches_naive_contains(spark, sf_dir):
    """X77: the trigram posting-list route must equal the naive
    per-query contains scan exactly (the probe-gram pruning is
    lossless: candidates are a superset, verify is exact). Also pins
    the <3-char contract and the no-match query."""
    from emr_trino_autoscale_spark.io import load_table
    from emr_trino_autoscale_spark.operators import text as T

    d = load_table(spark, sf_dir, "documents")
    qs = ["scan merge", "window window", "zz-never-present"]
    cached = []

    def _track(df):
        from pyspark import StorageLevel

        df = df.persist(StorageLevel.MEMORY_AND_DISK)
        cached.append(df)
        return df

    got = sorted(
        (r["query"], r["doc_id"])
        for r in T.substring_search(d, qs, persist_fn=_track).collect()
    )
    want = []
    for q in qs:
        want += [
            (q, r["doc_id"])
            for r in d.filter(F.contains(F.col("text"), F.lit(q))).collect()
        ]
    assert got == sorted(want)
    assert not [g for g in got if g[0] == "zz-never-present"]
    for df in cached:
        df.unpersist(blocking=False)
    with pytest.raises(ValueError):
        T.substring_search(d, ["ab"])


def test_blocklist_matches_token_boundaries(spark):
    """X78: phrase matching is TOKEN-sequence containment — 'cat dog'
    must not match inside 'concat dogma'; phrases match at doc start,
    doc end, and repeated; the anchor offset logic survives the anchor
    token appearing in non-matching positions."""
    from emr_trino_autoscale_spark.operators import text as T

    d = spark.createDataFrame(
        [
            (1, "cat dog runs"),
            (2, "concat dogma runs"),
            (3, "big cat dog"),
            (4, "dog cat dog cat dog"),
            (5, "cat nap dog"),
        ],
        "doc_id long, text string",
    )
    got = sorted(
        (r["doc_id"], r["phrase"])
        for r in T.blocklist_matches(d, ["cat dog", "nap"]).collect()
    )
    assert got == [(1, "cat dog"), (3, "cat dog"), (4, "cat dog"), (5, "nap")]


def test_pmi_cooccurrence_known_values(spark):
    """X79: hand-computed PMI on a 2-doc corpus (window 2): pairs
    include the distance-2 (a,a)/(b,b) self-pairs; P=8 pairs, T=7
    tokens; PMI(a,b)=ln((4/8)/((3/7)^2))."""
    import math

    from emr_trino_autoscale_spark.operators import text as T

    d = spark.createDataFrame(
        [(1, "a b a b"), (2, "a b c")], "doc_id long, text string"
    )
    got = {
        (r["tok_a"], r["tok_b"]): (r["pair_count"], r["pmi"])
        for r in T.pmi_cooccurrence(d, window=2, min_count=1).collect()
    }
    assert got[("a", "b")] == (4, round(math.log((4 / 8) / ((3 / 7) ** 2)), 4))
    assert got[("a", "c")] == (1, round(math.log((1 / 8) / ((3 / 7) * (1 / 7))), 4))
    assert got[("a", "a")][0] == 1  # distance-2 self-pair exists
    # single-token docs emit no pairs; min_count prunes
    assert T.pmi_cooccurrence(
        spark.createDataFrame([(1, "solo")], "doc_id long, text string"),
        min_count=1,
    ).count() == 0


def test_containment_pairs_asymmetry_and_subset(spark):
    """X80: a doc fully contained in a bigger one scores 1.0 on ITS
    side only (the asymmetric point of containment vs Jaccard); the
    reverse direction falls below threshold; prefix filtering is
    lossless vs the naive all-pairs form."""
    from emr_trino_autoscale_spark.operators import dedup as D

    d = spark.createDataFrame(
        [
            (1, "a b c d e f g h"),
            (2, "a b c d e f g h i j k l m n o p q r s t"),
            (3, "x y z w v u t s"),
        ],
        "doc_id long, text string",
    )
    got = {(r["id_a"], r["id_b"]): r["containment"]
           for r in D.containment_pairs(d, threshold=0.6).collect()}
    assert got == {(1, 2): 1.0}  # 6 shingles of doc1 all inside doc2
    # lossless vs naive: drop the prefix filter by setting threshold
    # low enough that every probe survives, then re-filter
    naive = {
        (r["id_a"], r["id_b"]): r["containment"]
        for r in D.containment_pairs(d, threshold=0.0001).collect()
        if r["containment"] >= 0.6
    }
    assert naive == got


def test_robust_dimension_stats_approx_bounded(spark, sf_dir):
    """X81 approx mode: same row universe as exact, quantiles within a
    tolerance band (percentile_approx default accuracy) — the 100 TB
    sketch path; constant dimension yields IQR 0 in both modes."""
    from emr_trino_autoscale_spark.io import load_table
    from emr_trino_autoscale_spark.operators import similarity as sim

    e = load_table(spark, sf_dir, "embeddings")
    exact = {
        (r["label"], r["dim"]): r
        for r in sim.robust_dimension_stats(e, group_col="label").collect()
    }
    appr = {
        (r["label"], r["dim"]): r
        for r in sim.robust_dimension_stats(
            e, group_col="label", approx=True
        ).collect()
    }
    assert set(exact) == set(appr)
    for k in exact:
        for c in ("median", "q25", "q75"):
            assert abs(exact[k][c] - appr[k][c]) < 0.05, (k, c)
    const = spark.createDataFrame(
        [(i, [5.0, float(i)]) for i in range(10)],
        "vec_id long, embedding array<double>",
    )
    rows = {r["dim"]: r for r in sim.robust_dimension_stats(const).collect()}
    assert rows[1]["iqr"] == 0.0 and rows[1]["median"] == 5.0


def test_mmr_select_golden_sequence(spark):
    """X82: the full greedy MMR pick sequence on the sf0.001
    embeddings, golden-pinned (the q85 convention for iterative
    trainers — q120's driver check is rows-only, this is the real
    pin). Also: first pick IS the max-relevance row (no penalty yet),
    picks are distinct, mmr scores non-increasing."""
    from conftest import SF_SMOKE

    if SF_SMOKE != "/root/testdata/sf0.001":
        pytest.skip("golden captured on the sf0.001 fixture")
    from emr_trino_autoscale_spark.queries import QUERIES

    rows = [tuple(r) for r in QUERIES["q120_mmr_select"](spark, SF_SMOKE).collect()]
    assert rows == [
        (1, 328, 0.354813, 0.248369),
        (2, 72, 0.347766, 0.23103),
        (3, 59, 0.354599, 0.205847),
        (4, 169, 0.278933, 0.180104),
        (5, 475, 0.304631, 0.178195),
        (6, 30, 0.310566, 0.158306),
        (7, 439, 0.223966, 0.135605),
        (8, 101, 0.244877, 0.132699),
        (9, 86, 0.245989, 0.132196),
        (10, 31, 0.313603, 0.125736),
    ]
    ids = [r[1] for r in rows]
    assert len(set(ids)) == 10
    assert rows[0][3] == round(0.7 * rows[0][2], 6)
    scores = [r[3] for r in rows]
    assert scores == sorted(scores, reverse=True)


def test_distinct_rollup_merge_equivalence(spark, sf_dir):
    """X84: the sketch-merge property that makes the rollup a real
    datacube primitive — per-shard sketches unioned upward must give
    the SAME estimate as sketching the whole column in one pass (HLL
    union is lossless over sketches of the same lgK), and estimates
    sit within the 3-sigma HLL band of exact. The total row must
    estimate the union (<= sum of groups), not the sum."""
    from emr_trino_autoscale_spark.io import load_table
    from emr_trino_autoscale_spark.operators import stats as st

    e = load_table(spark, sf_dir, "events")
    # track the operator's internal persists and release them: a leaked
    # cache here gets substituted into q121's plan by Spark's cache
    # manager and flips the plan-guard's exchange count (seen in the
    # full-suite run)
    cached = []

    def _track(df):
        from pyspark import StorageLevel

        df = df.persist(StorageLevel.MEMORY_AND_DISK)
        cached.append(df)
        return df

    sharded = {
        (r["level"], r["key"]): r["estimate"]
        for r in st.distinct_rollup(
            e,
            "event_type",
            "user_id",
            shard_col=F.to_date("ts").cast("string"),
            persist_fn=_track,
        ).collect()
    }
    one_shard = {
        (r["level"], r["key"]): r["estimate"]
        for r in st.distinct_rollup(
            e, "event_type", "user_id", shard_col=F.lit(0), persist_fn=_track
        ).collect()
    }
    assert sharded == one_shard  # merge-equivalence, exact
    exact = {
        r["event_type"]: r["n"]
        for r in e.groupBy("event_type")
        .agg(F.countDistinct("user_id").alias("n"))
        .collect()
    }
    for k, n in exact.items():
        est = sharded[("group", k)]
        assert abs(est - n) <= max(3 * 1.04 / (2**6) * n, 2), (k, est, n)
    total_exact = e.select("user_id").distinct().count()
    assert abs(sharded[("total", None)] - total_exact) <= max(
        3 * 1.04 / (2**6) * total_exact, 2
    )
    assert sharded[("total", None)] <= sum(sharded[k] for k in sharded if k[0] == "group")
    for df in cached:
        df.unpersist(blocking=False)


def test_phash_invariances_and_pairs(spark):
    """X85: DCT pHash properties on crafted PPMs — (1) brightness
    shift (+20 clipped-free range) and contrast scaling (x2 within
    range) leave the hash IDENTICAL (DC excluded, median scales with
    the ACs); (2) the corpus's one-pixel high-frequency nudge stays
    within the q122 hamming budget; (3) banded pairs over phash equal
    brute force (the signature-agnostic exhaustive-banding contract);
    (4) corrupt payload -> NULL, never an exception."""
    import numpy as np

    from emr_trino_autoscale_spark.operators import multimodal as mm

    def ppm(v):
        rgb = np.repeat(v.astype(np.uint8)[:, :, None], 3, axis=2)
        return f"P6\n{v.shape[1]} {v.shape[0]}\n255\n".encode() + rgb.tobytes()

    x = np.arange(64)[None, :]
    y = np.arange(64)[:, None]
    base = (2 * x + 3 * y) % 200  # keep headroom for +20 and x2? scale clips
    h0 = mm.phash64_ppm(ppm(base))
    assert h0 is not None
    assert mm.phash64_ppm(ppm(base + 20)) == h0  # max 219, no clipping
    half = (base // 2).astype(np.int64)
    assert mm.phash64_ppm(ppm(half * 2)) == mm.phash64_ppm(ppm(half))
    nudged = (base + ((x + y) % 97 == 0)).astype(np.int64)
    d = bin((h0 ^ mm.phash64_ppm(ppm(nudged))) & ((1 << 64) - 1)).count("1")
    assert d <= 6
    assert mm.phash64_ppm(b"P6 garbage") is None
    assert mm.phash64_ppm(None) is None

    media = mm.synthetic_image_corpus(spark, n=32)
    sigs = mm.image_phash(media)
    got = {
        (r["id_a"], r["id_b"]): r["hamming"]
        for r in mm.ahash_near_dup_pairs(sigs, max_hamming=6, sig_col="phash").collect()
    }
    rows = {r["media_id"]: r["phash"] for r in sigs.collect() if r["phash"] is not None}
    brute = {}
    for a in rows:
        for b in rows:
            if a < b:
                dd = bin((rows[a] ^ rows[b]) & ((1 << 64) - 1)).count("1")
                if dd <= 6:
                    brute[(a, b)] = dd
    assert got == brute  # exhaustive for max_hamming < n_bands


def test_audio_fingerprint_invariances_and_pairs(spark):
    """X86: band-energy audio fingerprint — (1) gain change (x0.5)
    leaves the hash IDENTICAL (hot criterion is a ratio); (2) the
    corpus's near-dup variant (1% gain + faint third tone) is
    hash-identical to its base; (3) transposed / different-chord
    variants sit >= 8 bits away; (4) banded pairs equal brute force
    at max_hamming=4 (exhaustive regime); (5) corrupt/short payload ->
    NULL."""
    import io
    import wave

    import numpy as np

    from emr_trino_autoscale_spark.operators import multimodal as mm

    def wav(x, rate=8000):
        pcm = np.clip(x * 32767.0, -32768, 32767).astype(np.int16)
        buf = io.BytesIO()
        with wave.open(buf, "wb") as w:
            w.setnchannels(1)
            w.setsampwidth(2)
            w.setframerate(rate)
            w.writeframes(pcm.tobytes())
        return buf.getvalue()

    t = np.arange(4000) / 8000.0
    x = 0.4 * np.sin(2 * np.pi * 250 * t) + 0.3 * np.sin(2 * np.pi * 470 * t)
    h0 = mm.afp64_wav(wav(x))
    assert h0 is not None
    assert mm.afp64_wav(wav(0.5 * x)) == h0  # gain invariance
    assert mm.afp64_wav(b"RIFFgarbage") is None
    assert mm.afp64_wav(wav(x[:1000])) is None  # too short

    def ham(a, b):
        return bin((a ^ b) & ((1 << 64) - 1)).count("1")

    media = mm.synthetic_audio_corpus(spark, n=32)
    sigs = {r["media_id"]: r["afp"] for r in mm.audio_fingerprint(media).collect()}
    for g in range(8):
        assert ham(sigs[4 * g], sigs[4 * g + 1]) <= 4  # near-dup
        assert ham(sigs[4 * g], sigs[4 * g + 2]) >= 8  # transposed
        assert ham(sigs[4 * g], sigs[4 * g + 3]) >= 8  # other chord
    got = {
        (r["id_a"], r["id_b"]): r["hamming"]
        for r in mm.ahash_near_dup_pairs(
            mm.audio_fingerprint(media), max_hamming=4, sig_col="afp"
        ).collect()
    }
    brute = {}
    for a in sigs:
        for b in sigs:
            if a < b and sigs[a] is not None and sigs[b] is not None:
                d = ham(sigs[a], sigs[b])
                if d <= 4:
                    brute[(a, b)] = d
    assert got == brute


def test_purged_time_split_guarantee(spark, sf_dir):
    """X90: the embargo gap guarantee — max(train ts) + embargo <=
    test_start <= min(test ts); embargo rows sit strictly inside the
    band; every row lands in exactly one split."""
    from datetime import datetime, timedelta

    from emr_trino_autoscale_spark.io import load_table
    from emr_trino_autoscale_spark.operators import stats as st

    e = load_table(spark, sf_dir, "events")
    out = st.purged_time_split(e, test_start="2024-01-22", embargo_hours=24)
    agg = {
        r["split"]: (r["lo"], r["hi"], r["n"])
        for r in out.groupBy("split")
        .agg(F.min("ts").alias("lo"), F.max("ts").alias("hi"), F.count("*").alias("n"))
        .collect()
    }
    boundary = datetime(2024, 1, 22)
    purge = boundary - timedelta(hours=24)
    assert agg["train"][1] < purge
    assert agg["test"][0] >= boundary
    if "embargo" in agg:
        assert purge <= agg["embargo"][0] and agg["embargo"][1] < boundary
    assert sum(v[2] for v in agg.values()) == e.count()


def test_scalable_rank_matches_row_number(spark):
    """X88 factored rank: scalable_rank == plain row_number over
    (order asc, tiebreak asc) on a frame with duplicate order values
    and multiple partitions."""
    from pyspark.sql import Window

    from emr_trino_autoscale_spark.operators import skew as sk

    rows = [
        (g, float(v), f"t{i:03d}")
        for i, (g, v) in enumerate(
            [(g, v) for g in ("a", "b") for v in [3, 1, 1, 7, 3, 3, 2, 9, 1]]
        )
    ]
    df = spark.createDataFrame(rows, "g string, v double, tb string")
    got = {
        (r["g"], r["tb"]): r["rnk"]
        for r in sk.scalable_rank(
            df, ["g"], "v", "tb", bucket_width=2.0
        ).collect()
    }
    w = Window.partitionBy("g").orderBy(F.col("v").asc(), F.col("tb").asc())
    want = {
        (r["g"], r["tb"]): r["rnk"]
        for r in df.withColumn("rnk", F.row_number().over(w)).collect()
    }
    assert got == want


def test_zipf_fit_recovers_synthetic_slope(spark):
    """X91: a corpus built to follow freq(rank) = C * rank^-1 exactly
    must fit slope ~ -1 with r2 ~ 1; a uniform corpus fits slope 0."""
    from emr_trino_autoscale_spark.operators import text as tx

    # rank r token repeated floor(1200/r) times -> slope -1 in log-log
    zipf_tokens = " ".join(
        " ".join([f"w{r:02d}"] * (1200 // r)) for r in range(1, 21)
    )
    uni_tokens = " ".join(" ".join([f"u{r:02d}"] * 50) for r in range(1, 21))
    df = spark.createDataFrame(
        [("zipf", zipf_tokens), ("flat", uni_tokens)], "source string, text string"
    )
    fit = {r["source"]: r for r in tx.zipf_fit(df).collect()}
    assert fit["zipf"]["n"] == 20 and fit["flat"]["n"] == 20
    assert abs(fit["zipf"]["slope"] + 1.0) < 0.02, fit["zipf"]["slope"]
    assert fit["zipf"]["r2"] > 0.999
    assert abs(fit["flat"]["slope"]) < 1e-9 and fit["flat"]["r2"] < 1e-9


def test_k_anonymity_audit_semantics(spark):
    """X92: class sizes, l-diversity and the violates_k flag on a
    hand-built frame — a crowd of 5 sharing one sensitive value has
    l_distinct 1 (the leak k-anonymity alone misses)."""
    from emr_trino_autoscale_spark.operators import stats as st

    rows = (
        [("seg1", 1, "x")] * 5          # compliant size, degenerate l=1
        + [("seg1", 2, s) for s in "abcde"]  # compliant, l=5
        + [("seg2", 1, "a"), ("seg2", 1, "b")]  # violates k=5
    )
    df = spark.createDataFrame(rows, "seg string, nat int, sens string")
    out = {
        (r["seg"], r["nat"]): r
        for r in st.k_anonymity_audit(df, ["seg", "nat"], "sens", k=5).collect()
    }
    assert out[("seg1", 1)]["class_size"] == 5
    assert out[("seg1", 1)]["l_distinct"] == 1
    assert not out[("seg1", 1)]["violates_k"]
    assert out[("seg1", 2)]["l_distinct"] == 5
    assert out[("seg2", 1)]["violates_k"]


def test_ks_two_sample_known_value(spark):
    """X93: KS D on a hand-computable pair — group a = {1,2,3,4},
    group b = {3,4,5,6}: F_a jumps to 1 by x=4 while F_b is 0.5 there,
    and the sup 0.5 is first attained at x=2 (|2/4 - 0|)."""
    from emr_trino_autoscale_spark.operators import stats as st

    rows = [("a", float(v)) for v in (1, 2, 3, 4)] + [
        ("b", float(v)) for v in (3, 4, 5, 6)
    ]
    df = spark.createDataFrame(rows, "g string, v double")
    r = st.ks_two_sample(df, "g", "v", "a", "b", bucket_width=2.0).collect()
    assert len(r) == 1
    assert (r[0]["n_a"], r[0]["n_b"]) == (4, 4)
    assert r[0]["d_stat"] == 0.5
    assert r[0]["d_at_value"] == 2.0
    # identical distributions -> D = 0 contributed at every point
    same = spark.createDataFrame(
        [("a", 1.0), ("a", 2.0), ("b", 1.0), ("b", 2.0)], "g string, v double"
    )
    r2 = st.ks_two_sample(same, "g", "v", "a", "b", bucket_width=2.0).collect()
    assert r2[0]["d_stat"] == 0.0


def test_mahalanobis_scores_center_and_outlier(spark):
    """X94: on a cloud of identical vectors plus one far point, the far
    point's score dominates and the cloud scores are small; a constant
    dimension (std 0) passes through centered, adding its squared
    offset rather than dividing by zero."""
    from emr_trino_autoscale_spark.operators import similarity as sim

    rows = [(i, [1.0, float(i % 3), 5.0]) for i in range(30)] + [
        (99, [1.0, 50.0, 5.0])
    ]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    out = {r["vec_id"]: r["maha_sq"] for r in sim.mahalanobis_scores(df).collect()}
    top = max(out, key=out.get)
    assert top == 99
    # dims 1 and 3 are constant -> std 0 -> centered passthrough
    # contributes ~0 for in-cloud points; scores stay finite everywhere
    assert all(math.isfinite(v) for v in out.values())
    assert out[99] > 10 * max(v for k, v in out.items() if k != 99)


def test_audience_overlap_matches_naive_self_join(spark, sf_dir):
    """X95: the row-local pair generation must equal the distinct
    (user, type) self-join it replaces — full-frame parity on the
    synthetic events table, plus the Jaccard identity on totals."""
    from emr_trino_autoscale_spark.io import load_table
    from emr_trino_autoscale_spark.operators import events as ev

    e = load_table(spark, sf_dir, "events")
    got = {
        (r["type_a"], r["type_b"]): (r["n_a"], r["n_b"], r["n_co"])
        for r in ev.audience_overlap(e).collect()
    }
    ut = e.select("user_id", "event_type").distinct()
    a, b = ut.alias("a"), ut.alias("b")
    naive = (
        a.join(b, "user_id")
        .filter(F.col("a.event_type") < F.col("b.event_type"))
        .groupBy(
            F.col("a.event_type").alias("ta"), F.col("b.event_type").alias("tb")
        )
        .count()
    )
    tot = {r["event_type"]: r["n"] for r in ut.groupBy("event_type").agg(F.count("*").alias("n")).collect()}
    want = {
        (r["ta"], r["tb"]): (tot[r["ta"]], tot[r["tb"]], r["count"])
        for r in naive.collect()
    }
    assert got == want and len(got) > 0


def test_rank_sum_test_known_values(spark):
    """X96: hand-computed U and tie-corrected z. Disjoint case
    a={1,2,3} < b={4,5,6}: U_a = 0, z = -4.5/sqrt(5.25). Tie case
    a={1,1}, b={1,2}: midranks give U_a = 1, tie-corrected z = -1."""
    from emr_trino_autoscale_spark.operators import stats as st

    d1 = spark.createDataFrame(
        [("a", 1.0), ("a", 2.0), ("a", 3.0), ("b", 4.0), ("b", 5.0), ("b", 6.0)],
        "g string, v double",
    )
    r = st.rank_sum_test(d1, "g", "v", "a", "b", bucket_width=2.0).collect()[0]
    assert (r["n_a"], r["n_b"], r["u_a"]) == (3, 3, 0.0)
    assert r["z"] == round(-4.5 / math.sqrt(5.25), 4)

    d2 = spark.createDataFrame(
        [("a", 1.0), ("a", 1.0), ("b", 1.0), ("b", 2.0)], "g string, v double"
    )
    r2 = st.rank_sum_test(d2, "g", "v", "a", "b", bucket_width=2.0).collect()[0]
    assert (r2["u_a"], r2["z"]) == (1.0, -1.0)


def test_chi2_independence_extremes(spark):
    """X97: chi2 = 0 / V = 0 on a perfectly independent 2x2; V = 1 and
    chi2 = n on a perfectly dependent one (zero-observed cells
    contribute their expected mass)."""
    from emr_trino_autoscale_spark.operators import stats as st

    indep = spark.createDataFrame(
        [(a, b) for a in ("x", "y") for b in ("u", "v") for _ in range(5)],
        "a string, b string",
    )
    r = st.chi2_independence(indep, "a", "b").collect()[0]
    assert (r["n"], r["dof"], r["chi2"], r["cramers_v"]) == (20, 1, 0.0, 0.0)

    dep = spark.createDataFrame(
        [("x", "u")] * 10 + [("y", "v")] * 10, "a string, b string"
    )
    r2 = st.chi2_independence(dep, "a", "b").collect()[0]
    assert (r2["n"], r2["dof"], r2["chi2"], r2["cramers_v"]) == (20, 1, 20.0, 1.0)


def test_chi2_independence_ignores_null_categories(spark):
    """X97 NULL contract (ADVICE r8): rows with a NULL in either column
    are excluded from the test population entirely. Before the fix a
    NULL cell's observed count vanished at the expected-grid equi-join
    while its margin mass survived, inflating chi2 and desyncing n/dof;
    now the result on the dirtied frame equals the result on the clean
    frame exactly."""
    from emr_trino_autoscale_spark.operators import stats as st

    clean = spark.createDataFrame(
        [(a, b) for a in ("x", "y") for b in ("u", "v") for _ in range(5)],
        "a string, b string",
    )
    dirty = clean.unionByName(
        spark.createDataFrame(
            [(None, "u")] * 3 + [("x", None)] * 4 + [(None, None)] * 2,
            "a string, b string",
        )
    )
    want = st.chi2_independence(clean, "a", "b").collect()[0]
    got = st.chi2_independence(dirty, "a", "b").collect()[0]
    assert tuple(got) == tuple(want)
    assert got["n"] == 20  # the 9 NULL-bearing rows are not counted


def test_shrunk_group_means_pull_direction(spark):
    """X98: m=0 returns raw means; a huge pseudo-count collapses every
    group onto the global prior; a small group moves further toward
    the prior than a large group with the same raw mean."""
    from emr_trino_autoscale_spark.operators import stats as st

    rows = (
        [("big", 100.0)] * 50 + [("small", 100.0)] * 2 + [("low", 0.0)] * 48
    )
    df = spark.createDataFrame(rows, "g string, v double")
    raw = {r["g"]: r for r in st.shrunk_group_means(df, ["g"], "v", m=0.0).collect()}
    assert raw["big"]["shrunk_mean"] == raw["big"]["raw_mean"] == 100.0
    heavy = {
        r["g"]: r["shrunk_mean"]
        for r in st.shrunk_group_means(df, ["g"], "v", m=1e9).collect()
    }
    gmean = 52.0 * 100.0 / 100.0
    assert all(abs(v - gmean) < 1e-3 for v in heavy.values())
    m10 = {
        r["g"]: r["shrunk_mean"]
        for r in st.shrunk_group_means(df, ["g"], "v", m=10.0).collect()
    }
    # same raw mean (100), but the 2-row group is pulled far closer to
    # the prior than the 50-row group
    assert abs(m10["small"] - gmean) < abs(m10["big"] - gmean)


@pytest.mark.slow
def test_streaming_ks_drift_matches_batch(spark, tmp_path):
    """X99: per-micro-batch KS against a static baseline equals the
    batch X93 operator on the tagged union, per group; groups absent
    from the baseline are excluded (the X72/X73 contract)."""
    from emr_trino_autoscale_spark.operators import stats as st
    from emr_trino_autoscale_spark.streaming import pipeline

    src = str(tmp_path / "ks_src")
    out = str(tmp_path / "ks_out")
    chk = str(tmp_path / "ks_chk")
    schema = "event_id long, event_type string, value double"
    base_rows = [(i, "s", float(i % 50)) for i in range(100)] + [
        (i, "t", float(i % 50)) for i in range(100, 160)
    ]
    batch_rows = (
        [(i, "s", 200.0 + i % 40) for i in range(80)]          # drifted
        + [(i, "t", float(i % 50)) for i in range(80, 140)]     # same dist
        + [(i, "unknown", 1.0) for i in range(140, 150)]        # no baseline
    )
    baseline = spark.createDataFrame(base_rows, schema)
    batch_df = spark.createDataFrame(batch_rows, schema)
    batch_df.repartition(1).write.parquet(src)

    scorer = pipeline.make_ks_drift_scorer(baseline)

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
    assert set(got) == {"s", "t"}  # 'unknown' excluded
    for g in ("s", "t"):
        tagged = baseline.filter(F.col("event_type") == g).withColumn(
            "side", F.lit("ref")
        ).unionByName(
            batch_df.filter(F.col("event_type") == g).withColumn(
                "side", F.lit("cur")
            )
        )
        want = st.ks_two_sample(tagged, "side", "value", "ref", "cur").collect()[0]
        assert got[g]["d_stat"] == want["d_stat"]
        assert got[g]["d_at_value"] == want["d_at_value"]
        assert (got[g]["n_a"], got[g]["n_b"]) == (want["n_a"], want["n_b"])
    assert got["s"]["d_stat"] == 1.0 and got["t"]["d_stat"] < 0.2


def test_weighted_quantile_known_and_uniform(spark):
    """X100: hand case — weight mass 7 on the max value drags the
    median and q3 there (q1: first cumw >= 2.5 is v=3); uniform
    weights reduce to the unweighted lower quantile."""
    from emr_trino_autoscale_spark.operators import stats as st

    d = spark.createDataFrame(
        [("g", 1.0, 1.0), ("g", 2.0, 1.0), ("g", 3.0, 1.0), ("g", 4.0, 7.0)],
        "grp string, v double, w double",
    )
    r = st.weighted_quantile(d, ["grp"], "v", "w", bucket_width=2.0).collect()[0]
    assert (r["wq_1_4"], r["wq_2_4"], r["wq_3_4"]) == (3.0, 4.0, 4.0)

    uni = spark.createDataFrame(
        [("g", float(v), 1.0) for v in range(1, 9)], "grp string, v double, w double"
    )
    r2 = st.weighted_quantile(uni, ["grp"], "v", "w", bucket_width=3.0).collect()[0]
    # lower quantile over 8 uniform values: ceil(8*q)-th value
    assert (r2["wq_1_4"], r2["wq_2_4"], r2["wq_3_4"]) == (2.0, 4.0, 6.0)


def test_benford_audit_digits_and_filter(spark):
    """X101: first digits extracted from the scaled-integer string
    (1.00->1, 19.99->1, 0.07->7, 300.0->3); zero and negative values
    are excluded; shares sum to 1."""
    from emr_trino_autoscale_spark.operators import stats as st

    d = spark.createDataFrame(
        [(1.00,), (1.5,), (19.99,), (2.00,), (0.07,), (300.0,), (0.0,), (-5.0,)],
        "v double",
    )
    rows = {r["digit"]: r for r in st.benford_audit(d, "v").collect()}
    assert {k: rows[k]["n"] for k in rows} == {1: 3, 2: 1, 3: 1, 7: 1}
    # shares are independently rounded to 4 decimals; sum within 2e-4
    assert abs(sum(r["obs_share"] for r in rows.values()) - 1.0) < 2e-4
    assert rows[1]["exp_share"] == 0.301


def test_welch_t_test_hand_case(spark):
    """X102: a={1,2,3}, b={2,3,4} -> t = -1/sqrt(2/3), Welch df = 4."""
    from emr_trino_autoscale_spark.operators import stats as st

    d = spark.createDataFrame(
        [("a", 1.0), ("a", 2.0), ("a", 3.0), ("b", 2.0), ("b", 3.0), ("b", 4.0)],
        "g string, v double",
    )
    r = st.welch_t_test(d, "g", "v", "a", "b").collect()[0]
    assert (r["n_a"], r["n_b"], r["mean_a"], r["mean_b"]) == (3, 3, 2.0, 3.0)
    assert r["t_stat"] == round(-1.0 / math.sqrt(2.0 / 3.0), 4)
    assert r["df"] == 4.0


def test_dimension_corr_matrix_extremes(spark):
    """X103: identical dims corr 1, negated dims corr -1, a constant
    dimension yields NULL (both engines' zero-variance contract)."""
    from emr_trino_autoscale_spark.operators import similarity as sim

    rows = [(i, [float(i), float(i), -float(i), 5.0]) for i in range(1, 21)]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    out = {
        (r["dim_a"], r["dim_b"]): r["corr"]
        for r in sim.dimension_corr_matrix(df).collect()
    }
    assert out[(1, 2)] == 1.0 and out[(1, 3)] == -1.0 and out[(2, 3)] == -1.0
    assert out[(1, 4)] is None and out[(2, 4)] is None and out[(3, 4)] is None
    assert len(out) == 6


def test_diversity_audit_extremes(spark):
    """X104: a uniform 4-category group has entropy ln 4, normalized 1,
    eff_cats 4, gini 0.75; a monoculture group has all-zero diversity
    and norm_entropy 0 by the k=1 guard."""
    from emr_trino_autoscale_spark.operators import stats as st

    rows = [("u", c) for c in "abcd" for _ in range(5)] + [("m", "a")] * 8
    df = spark.createDataFrame(rows, "g string, c string")
    out = {r["g"]: r for r in st.diversity_audit(df, "g", "c").collect()}
    assert (out["u"]["n"], out["u"]["k"]) == (20, 4)
    assert out["u"]["entropy"] == round(math.log(4), 4)
    assert out["u"]["norm_entropy"] == 1.0
    assert out["u"]["eff_cats"] == 4.0
    assert out["u"]["gini"] == 0.75
    assert (out["m"]["k"], out["m"]["entropy"], out["m"]["norm_entropy"]) == (
        1, 0.0, 0.0
    )
    assert out["m"]["eff_cats"] == 1.0 and out["m"]["gini"] == 0.0


def test_centroid_similarity_extremes(spark):
    """X105: groups whose centroids point the same way score cosine 1,
    opposed centroids -1, orthogonal 0; a zero-centroid group yields
    NULL (both engines' convention)."""
    from emr_trino_autoscale_spark.operators import similarity as sim

    rows = (
        [(i, "e1", [2.0, 0.0]) for i in range(5)]
        + [(i, "e1b", [5.0, 0.0]) for i in range(5)]
        + [(i, "neg", [-1.0, 0.0]) for i in range(5)]
        + [(i, "orth", [0.0, 3.0]) for i in range(5)]
        + [(0, "zero", [1.0, 0.0]), (1, "zero", [-1.0, 0.0])]
    )
    df = spark.createDataFrame(rows, "vec_id long, label string, embedding array<double>")
    out = {
        (r["group_a"], r["group_b"]): r["cosine"]
        for r in sim.centroid_similarity(df, "label").collect()
    }
    assert out[("e1", "e1b")] == 1.0
    assert out[("e1", "neg")] == -1.0
    assert out[("e1", "orth")] == 0.0
    assert out[("e1", "zero")] is None and out[("neg", "zero")] is None
    assert len(out) == 10


def test_grouped_mad_known_and_outlier_resistance(spark):
    """X106: hand case — {1..5} has median 3, MAD 1; replacing the max
    with 1000 moves the stddev by two orders but the MAD not at all."""
    from emr_trino_autoscale_spark.operators import stats as st

    clean = spark.createDataFrame(
        [("g", float(v)) for v in (1, 2, 3, 4, 5)], "g string, v double"
    )
    r = st.grouped_mad(clean, "g", "v").collect()[0]
    assert (r["n"], r["median"], r["mad"]) == (5, 3.0, 1.0)
    dirty = spark.createDataFrame(
        [("g", float(v)) for v in (1, 2, 3, 4, 1000)], "g string, v double"
    )
    r2 = st.grouped_mad(dirty, "g", "v").collect()[0]
    assert (r2["median"], r2["mad"]) == (3.0, 1.0)
    # consistency scale passes straight through
    r3 = st.grouped_mad(clean, "g", "v", scale=1.4826).collect()[0]
    assert r3["mad"] == 1.4826


def test_time_weighted_avg_step_function(spark):
    """X107: a value holding 3x longer weighs 3x — one user with
    values 10 (30 s) then 40 (10 s) then a terminator: twa =
    (10*30 + 40*10)/40 = 17.5; the last observation is excluded; a
    single-event user contributes nothing."""
    import datetime as dt

    from emr_trino_autoscale_spark.operators import events as ev

    t0 = dt.datetime(2024, 1, 1)
    rows = [
        (1, 7, t0, "m", 10.0),
        (2, 7, t0 + dt.timedelta(seconds=30), "m", 40.0),
        (3, 7, t0 + dt.timedelta(seconds=40), "m", 99.0),   # terminator
        (4, 8, t0, "m", 55.0),                               # single event
    ]
    df = spark.createDataFrame(
        rows, "event_id long, user_id long, ts timestamp, event_type string, value double"
    )
    out = {r["event_type"]: r for r in ev.time_weighted_avg(df).collect()}
    assert out["m"]["n_intervals"] == 2
    assert out["m"]["total_seconds"] == 40.0
    assert out["m"]["twa"] == 17.5


def test_label_noise_scores_planted_mislabel(spark):
    """X108: two well-separated clusters plus ONE vector planted in the
    wrong cluster — the planted vector is flagged with a negative
    margin and points at the right culprit label; clean vectors have
    positive margins."""
    from emr_trino_autoscale_spark.operators import similarity as sim

    rows = (
        [(i, "a", [10.0 + (i % 3), 0.0]) for i in range(10)]
        + [(100 + i, "b", [0.0, 10.0 + (i % 3)]) for i in range(10)]
        + [(999, "a", [0.0, 11.0])]          # labeled a, lives in b
    )
    df = spark.createDataFrame(
        rows, "vec_id long, label string, embedding array<double>"
    )
    out = {r["vec_id"]: r for r in sim.label_noise_scores(df, "label").collect()}
    assert out[999]["flagged"] and out[999]["margin"] < 0
    assert out[999]["best_other_label"] == "b"
    assert all(
        not out[i]["flagged"] and out[i]["margin"] > 0
        for i in list(range(10)) + list(range(100, 110))
    )


def test_debounce_consecutive_only(spark):
    """X109: an immediate same-type same-value repeat within the window
    is an echo; A,B,A alternation keeps all three; a repeat outside the
    window is kept; different value at the same type is kept."""
    import datetime as dt

    from emr_trino_autoscale_spark.operators import events as ev

    t0 = dt.datetime(2024, 1, 1)

    def r(eid, sec, typ, val):
        return (eid, 1, t0 + dt.timedelta(seconds=sec), typ, val)

    rows = [
        r(1, 0, "a", 5.0),
        r(2, 10, "a", 5.0),    # echo (10 s, same type+value)
        r(3, 20, "b", 5.0),    # type change -> kept
        r(4, 30, "a", 5.0),    # alternation -> kept
        r(5, 200, "a", 5.0),   # same as prev but 170 s later -> kept
        r(6, 210, "a", 6.0),   # value change -> kept
    ]
    df = spark.createDataFrame(
        rows, "event_id long, user_id long, ts timestamp, event_type string, value double"
    )
    out = {r["event_id"]: r["is_echo"] for r in ev.debounce_events(df, window_seconds=60).collect()}
    assert out == {1: False, 2: True, 3: False, 4: False, 5: False, 6: False}


def test_resample_locf_carry_semantics(spark):
    """X111: grid points carry the latest at-or-before observation (an
    observation exactly ON a tick is carried into it); pre-first-event
    ticks are dropped; the carried obs_ts points at the right event."""
    import datetime as dt

    from emr_trino_autoscale_spark.operators import events as ev

    t0 = dt.datetime(2024, 1, 1)

    def us(sec):
        return int((t0 + dt.timedelta(seconds=sec)).timestamp() * 1_000_000)

    rows = [
        (1, 7, t0 + dt.timedelta(seconds=90), "m", 10.0),    # between ticks
        (2, 7, t0 + dt.timedelta(seconds=240), "m", 20.0),   # exactly on tick 240? step=120 -> ticks at 120,240,360
        (3, 8, t0 + dt.timedelta(seconds=350), "m", 99.0),   # late first event
    ]
    df = spark.createDataFrame(
        rows, "event_id long, user_id long, ts timestamp, event_type string, value double"
    )
    out = {
        (r["user_id"], r["tick_us"]): (r["value"], r["obs_ts_us"])
        for r in ev.resample_locf(df, step_seconds=120).collect()
    }
    # grid over [90s, 350s] -> ticks at 120, 240 (and 360 excluded: hi_tick = floor(350/120)*120 = 240)
    assert out[(7, us(120))] == (10.0, us(90))
    assert out[(7, us(240))] == (20.0, us(240))   # on-tick obs carried in
    assert (8, us(120)) not in out                 # before user 8's first event
    assert (8, us(240)) not in out
    assert len(out) == 2


def test_sliding_distinct_merge_matches_exact(spark):
    """X112: on a small deterministic frame the 3-day sketch-union
    estimate equals the exact trailing distinct count exactly (HLL is
    exact far below sketch capacity), and n_days_covered clamps at the
    window edge."""
    import datetime as dt

    from emr_trino_autoscale_spark.operators import stats as st

    t0 = dt.datetime(2024, 1, 1)
    rows = []
    for d in range(5):
        for u in range(10 * (d + 1)):   # day d has users 0..10(d+1)-1
            rows.append((d * 100 + u, t0 + dt.timedelta(days=d, hours=1), u))
    df = spark.createDataFrame(rows, "event_id long, ts timestamp, user_id long")
    out = {
        r["day"].day: (r["n_days_covered"], r["estimate"])
        for r in st.sliding_distinct(df, window_days=3).collect()
    }
    # trailing-3-day distinct = max day's user range (supersets)
    assert out[1] == (1, 10)
    assert out[2] == (2, 20)
    assert out[3] == (3, 30)
    assert out[4] == (3, 40)   # window slides: days 2-4
    assert out[5] == (3, 50)


def test_qgram_edit_join_recall_complete(spark):
    """X113: the q-gram count/prefix-filter join must emit EVERY pair
    with levenshtein <= max_dist — including pairs whose edit falls
    inside a blocking prefix (the X66 recall hole this operator
    closes), transpositions (dist 2), and length-changing edits."""
    from emr_trino_autoscale_spark.operators.dedup import qgram_edit_join

    names = [
        "alpha industries ltd",
        "alpha industriez ltd",     # substitution mid-string
        "blpha industries ltd",     # substitution at position 1 (in-prefix)
        "alpha industries ltd.",    # insertion at end
        "alpha industres ltd",      # deletion mid-string
        "gamma logistics corp",
        "gamma logistics c0rp",     # substitution near end
        "delta",                    # short-ish, isolated
        "unrelated name here",
    ]
    rows = [(i, n) for i, n in enumerate(names)]
    df = spark.createDataFrame(rows, "c_custkey long, c_name string")
    got = {
        (r.id_a, r.id_b, r.dist)
        for r in qgram_edit_join(df, q=3, max_dist=1).collect()
    }
    import itertools

    def lev(a, b):
        dp = list(range(len(b) + 1))
        for i, ca in enumerate(a, 1):
            prev, dp[0] = dp[0], i
            for j, cb in enumerate(b, 1):
                prev, dp[j] = dp[j], min(
                    dp[j] + 1, dp[j - 1] + 1, prev + (ca != cb)
                )
        return dp[len(b)]

    want = {
        (i, j, lev(a, b))
        for (i, a), (j, b) in itertools.combinations(enumerate(names), 2)
        if lev(a, b) <= 1
    }
    assert got == want and len(want) >= 4


def test_qgram_edit_join_short_string_block(spark):
    """X113: strings too short for the count bound (len < q*(d+1)) are
    routed through the exhaustive short block — both short x short and
    short x long pairs must still surface."""
    from emr_trino_autoscale_spark.operators.dedup import qgram_edit_join

    rows = [
        (0, "ab"), (1, "ac"), (2, "abc"),
        (3, "abcdefgh"), (4, "abcdefg"),
        (5, "abcde"), (6, "abcdef"),
    ]
    df = spark.createDataFrame(rows, "c_custkey long, c_name string")
    got = {
        (r.id_a, r.id_b, r.dist)
        for r in qgram_edit_join(df, q=3, max_dist=1).collect()
    }
    # (0,1)/(0,2)/(1,2) short x short; (5,6) short x LONG (the mixed
    # branch); (3,4)/(4,6) long x long
    assert got == {
        (0, 1, 1), (0, 2, 1), (1, 2, 1),
        (5, 6, 1), (3, 4, 1), (4, 6, 1),
    }


def test_pagerank_hand_computed(spark):
    """X114: 3-node chain a->b->c, 1 iteration, damping 0.85 — hand
    arithmetic. c is dangling; after one step its initial mass (1/3)
    redistributes uniformly."""
    from emr_trino_autoscale_spark.operators.graph import pagerank

    df = spark.createDataFrame(
        [("a", "b"), ("b", "c")], "src string, dst string"
    )
    got = {
        r.node: r.rank for r in pagerank(df, iterations=1, damping=0.85).collect()
    }
    third = 1.0 / 3.0
    teleport = 0.15 / 3.0
    dang = 0.85 * third / 3.0
    assert abs(got["a"] - (teleport + dang)) < 1e-12
    assert abs(got["b"] - (teleport + dang + 0.85 * third)) < 1e-12
    assert abs(got["c"] - (teleport + dang + 0.85 * third)) < 1e-12
    assert abs(sum(got.values()) - 1.0) < 1e-9


def test_pagerank_mass_conserved_multi_iteration(spark):
    """X114: sum(rank) == 1 after every iteration count, and a
    higher-in-degree node outranks a leaf (star graph sanity)."""
    from emr_trino_autoscale_spark.operators.graph import pagerank

    edges = [("u%d" % i, "hub") for i in range(5)] + [("hub", "u0")]
    df = spark.createDataFrame(edges, "src string, dst string")
    for k in (2, 3):
        got = {r.node: r.rank for r in pagerank(df, iterations=k).collect()}
        assert abs(sum(got.values()) - 1.0) < 1e-9
        assert got["hub"] > got["u1"]


def test_bloom_semi_flags_no_false_negatives(spark):
    """X115: every true dim member must pass the filter (the Bloom
    guarantee) even with a deliberately tiny bit budget; with 64 bits
    and 40 dim keys the non-member set must show false positives —
    proving the flags really are Bloom verdicts, not an exact join."""
    from emr_trino_autoscale_spark.operators.skew import bloom_semi_flags

    dim = spark.createDataFrame([(i,) for i in range(40)], "k long")
    fact = spark.createDataFrame([(i,) for i in range(200)], "k long")
    flags = {
        r.key: r.bloom_pass
        for r in bloom_semi_flags(fact, dim, "k", n_bits=64, n_hashes=3).collect()
    }
    assert len(flags) == 200
    assert all(flags[i] for i in range(40))          # no false negatives
    fps = sum(1 for i in range(40, 200) if flags[i])
    assert fps > 0                                    # tiny filter saturates


def test_bloom_semi_flags_exactish_with_big_filter(spark):
    """X115: with a generous bit budget the pass set collapses to the
    exact membership (fp rate (1-e^{-kn/m})^k ~ 1e-9 at m=2^17, n=40)."""
    from emr_trino_autoscale_spark.operators.skew import bloom_semi_flags

    dim = spark.createDataFrame([(i,) for i in range(40)], "k long")
    fact = spark.createDataFrame([(i,) for i in range(400)], "k long")
    flags = {
        r.key: r.bloom_pass for r in bloom_semi_flags(fact, dim, "k").collect()
    }
    assert {k for k, v in flags.items() if v} == set(range(40))


def test_pareto_frontier_hand_case(spark):
    """X116: dominance semantics — equal-y smaller-x dominates
    (strict on x); ties ON a vertex are all kept via n_points."""
    from emr_trino_autoscale_spark.operators.stats import pareto_frontier

    rows = [
        (1, 10.0), (1, 9.0),        # x=1: best 10
        (2, 10.0),                  # dominated by (1,10): equal y, larger x
        (3, 12.0), (3, 12.0),       # frontier, 2 tied points
        (4, 11.0),                  # dominated by (3,12)
        (5, 13.0),                  # frontier
    ]
    df = spark.createDataFrame(rows, "x int, y double")
    got = {(r.x, r.y, r.n_points) for r in pareto_frontier(df, "x", "y").collect()}
    assert got == {(1, 10.0, 1), (3, 12.0, 2), (5, 13.0, 1)}


def test_association_rules_hand_case(spark):
    """X117: support/confidence/lift arithmetic on 4 hand baskets;
    duplicate (basket, item) rows must collapse before counting."""
    from emr_trino_autoscale_spark.operators.stats import association_rules

    rows = [
        (1, "a"), (1, "b"), (1, "b"),       # dup collapses
        (2, "a"), (2, "b"),
        (3, "a"),
        (4, "b"), (4, "c"),
    ]
    df = spark.createDataFrame(rows, "b long, i string")
    out = {
        (r.item_a, r.item_b): (r.pair_n, r.support, r.conf_a_to_b,
                               r.conf_b_to_a, r.lift)
        for r in association_rules(df, "b", "i", min_pair_support=2).collect()
    }
    assert set(out) == {("a", "b")}
    pair_n, supp, cab, cba, lift = out[("a", "b")]
    assert pair_n == 2
    assert abs(supp - 0.5) < 1e-12          # 2 of 4 baskets
    assert abs(cab - 2 / 3) < 1e-12          # a appears in 3
    assert abs(cba - 2 / 3) < 1e-12          # b appears in 3
    assert abs(lift - (2 * 4) / (3 * 3)) < 1e-12


def test_cuped_perfect_covariate_kills_variance(spark):
    """X118: when post = 2*pre exactly, theta = 2 and the adjusted
    metric is constant within the population — variance reduction 1."""
    import datetime as dt

    from emr_trino_autoscale_spark.operators.stats import cuped_adjust

    pre_day = dt.datetime(2024, 1, 10)
    post_day = dt.datetime(2024, 1, 20)
    rows = []
    for u in range(20):
        rows.append((u * 2, pre_day, u, float(u + 1)))       # pre = u+1
        rows.append((u * 2 + 1, post_day, u, 2.0 * (u + 1))) # post = 2*pre
    df = spark.createDataFrame(rows, "event_id long, ts timestamp, user_id long, value double")
    out = {r.variant: r for r in cuped_adjust(df).collect()}
    for v in (0, 1):
        assert out[v].n_users == 10
        assert abs(out[v].var_adjusted) < 1e-9
        assert abs(out[v].var_reduction - 1.0) < 1e-9
        # adjusted mean equals the CUPED-shifted constant, same both arms
    assert abs(out[0].mean_adjusted - out[1].mean_adjusted) < 1e-9


def test_attribute_conversions_semantics(spark):
    """X119: last-touch wins over earlier touches; same-ts touch counts
    (touch sorts before the conversion); out-of-window touch falls to
    'unattributed'; a later touch never attributes backwards."""
    import datetime as dt

    from emr_trino_autoscale_spark.operators import events as ev

    t0 = dt.datetime(2024, 1, 10)

    def s(sec):
        return t0 + dt.timedelta(seconds=sec)

    rows = [
        # user 1: view then click then purchase -> click (last touch)
        (1, 1, s(0), "view"), (2, 1, s(10), "click"), (3, 1, s(20), "purchase"),
        # user 2: touch exactly at conversion ts -> counts (view)
        (4, 2, s(0), "view"), (5, 2, s(0), "purchase"),
        # user 3: touch outside the 100 s window -> unattributed
        (6, 3, s(0), "click"), (7, 3, s(200), "purchase"),
        # user 4: touch only AFTER the conversion -> unattributed
        (8, 4, s(50), "purchase"), (9, 4, s(60), "view"),
    ]
    df = spark.createDataFrame(
        rows, "event_id long, user_id long, ts timestamp, event_type string"
    )
    got = {
        r.touch_type: r.n_conversions
        for r in ev.attribute_conversions(
            df, ["view", "click"], "purchase", window_seconds=100
        ).collect()
    }
    assert got == {"click": 1, "view": 1, "unattributed": 2}


def test_fs_match_weights_hand_case(spark):
    """X120: u-probabilities from data (sum of squared value
    frequencies / N^2), log2 likelihood-ratio weights, agreement
    count — hand-checked on one block of 3 records."""
    import math

    from emr_trino_autoscale_spark.operators.dedup import fs_match_weights

    rows = [
        (1, "B", 10, "aa"),
        (2, "B", 10, "bb"),
        (3, "B", 20, "bb"),
        (4, "C", 10, "aa"),   # other block: contributes to u, not pairs
    ]
    df = spark.createDataFrame(rows, "id long, seg string, bal long, sfx string")
    out = {
        (r.id_a, r.id_b): (r.n_agree, r.weight)
        for r in fs_match_weights(
            df, "id",
            block_exprs=[F.col("seg")],
            field_exprs=[("bal", F.col("bal")), ("sfx", F.col("sfx"))],
            m_probs=[0.9, 0.8],
        ).collect()
    }
    # u_bal: values 10x3, 20x1 -> (9+1)/16; u_sfx: aa x2, bb x2 -> 8/16
    u_bal, u_sfx = 10 / 16, 0.5
    w_bal_a = math.log2(0.9 / u_bal)
    w_bal_d = math.log2((1.0 - 0.9) / (1 - u_bal))
    w_sfx_a = math.log2(0.8 / u_sfx)
    w_sfx_d = math.log2((1.0 - 0.8) / (1 - u_sfx))
    assert set(out) == {(1, 2), (1, 3), (2, 3)}
    assert out[(1, 2)][0] == 1
    assert abs(out[(1, 2)][1] - (w_bal_a + w_sfx_d)) < 1e-9
    assert out[(1, 3)][0] == 0
    assert abs(out[(1, 3)][1] - (w_bal_d + w_sfx_d)) < 1e-9
    assert out[(2, 3)][0] == 1
    assert abs(out[(2, 3)][1] - (w_bal_d + w_sfx_a)) < 1e-9


def test_binned_quantile_sketch_bound(spark):
    """X121: the estimate is the lower edge of the bin holding the
    exact lower quantile — within one bin width, and EXACT when the
    bin width divides the data grid."""
    from emr_trino_autoscale_spark.operators.stats import binned_quantile_sketch

    rows = [("g", float(v)) for v in range(1, 101)]   # 1..100
    df = spark.createDataFrame(rows, "g string, v double")
    out = binned_quantile_sketch(
        df, ["g"], "v", bin_width=10.0, quantiles=((1, 2), (19, 20))
    ).collect()[0]
    # exact lower p50 of 1..100 = 50 -> bin [50,60) -> est 50
    assert out["bq_1_2"] == 50.0
    # exact lower p95 = 95 -> bin [90,100) -> est 90
    assert out["bq_19_20"] == 90.0


def test_triangle_stats_hand_graphs(spark):
    """X122: K4 has 4 triangles / 12 wedges (cc = 1); two triangles
    sharing an edge count 2; orientation must not double-count and
    must ignore duplicate/reversed input edges."""
    from emr_trino_autoscale_spark.operators.graph import triangle_stats

    k4 = [(a, b) for a in range(4) for b in range(4) if a < b]
    k4 += [(b, a) for a, b in k4[:2]]   # reversed duplicates
    df = spark.createDataFrame(k4, "src long, dst long")
    r = triangle_stats(df).collect()[0]
    assert (r.n_nodes, r.n_edges, r.n_wedges, r.n_triangles) == (4, 6, 12, 4)
    assert r.global_clustering == 1.0

    bowtie = [(1, 2), (2, 3), (1, 3), (3, 4), (4, 5), (3, 5)]
    df2 = spark.createDataFrame(bowtie, "src long, dst long")
    r2 = triangle_stats(df2).collect()[0]
    assert r2.n_triangles == 2 and r2.n_edges == 6


def test_triangle_stats_canonical_parity(spark):
    """Round 14: ``assume_canonical=True`` skips the canonicalizing
    distinct (guide §2.4 — a distinct on already-unique data is a free
    shuffle). On a canonical edge list (unique, src < dst, no loops)
    every output column must be identical to the default path; the
    q158 generator produces exactly this shape."""
    import random

    from emr_trino_autoscale_spark.operators.graph import triangle_stats

    rng = random.Random(158)
    canon = sorted(
        {
            (a, b)
            for a in range(1, 120)
            for b in rng.sample(range(1, 120), 8)
            if a < b
        }
    )
    df = spark.createDataFrame(canon, "src long, dst long")
    r_default = triangle_stats(df).collect()[0]
    r_canon = triangle_stats(df, assume_canonical=True).collect()[0]
    assert r_default == r_canon
    assert r_default.n_edges == len(canon)


def test_mutual_information_hand_case(spark):
    """X124: MI/H on a 2x2 with a perfectly dependent pair and an
    independent pair — hand entropies."""
    import math

    from emr_trino_autoscale_spark.operators.stats import mutual_information

    dep = [("a", 0)] * 5 + [("b", 1)] * 5          # x determines y
    df = spark.createDataFrame(dep, "x string, y int")
    r = mutual_information(df, "x", "y").collect()[0]
    assert r.n == 10
    assert abs(r.mi_bits - 1.0) < 1e-9             # MI = H = 1 bit
    assert abs(r.h_x - 1.0) < 1e-9 and abs(r.h_y - 1.0) < 1e-9

    ind = [(x, y) for x in ("a", "b") for y in (0, 1) for _ in range(3)]
    r2 = mutual_information(
        spark.createDataFrame(ind, "x string, y int"), "x", "y"
    ).collect()[0]
    assert abs(r2.mi_bits) < 1e-9                  # independent -> 0


def test_calibration_bins_hand_case(spark):
    """X125: bin routing (top edge clamps), exact positive fractions."""
    from emr_trino_autoscale_spark.operators.stats import calibration_bins

    rows = [(0.05, True), (0.05, False), (0.55, True), (1.0, True)]
    df = spark.createDataFrame(rows, "s double, l boolean")
    out = {r.bin: (r.n, r.frac_positive) for r in
           calibration_bins(df, "s", "l", n_bins=10).collect()}
    assert out[0] == (2, 0.5)
    assert out[5] == (1, 1.0)
    assert out[9] == (1, 1.0)      # score 1.0 clamps into bin 9


def test_grouped_auc_hand_and_ties(spark):
    """X126: perfect separation -> 1.0; anti-separation -> 0.0; all
    scores tied -> 0.5 exactly (midrank handling)."""
    from emr_trino_autoscale_spark.operators.stats import grouped_auc

    rows = (
        [("perfect", float(s), s >= 3) for s in range(6)]
        + [("anti", float(s), s < 3) for s in range(6)]
        + [("tied", 1.0, l) for l in (True, False, True, False)]
    )
    df = spark.createDataFrame(rows, "g string, s double, l boolean")
    out = {r.g: r.auc for r in grouped_auc(df, ["g"], "s", "l").collect()}
    assert out["perfect"] == 1.0
    assert out["anti"] == 0.0
    assert out["tied"] == 0.5


def test_seasonal_decompose_recovers_planted_weekday(spark):
    """X127: on a series = trend-free constant + planted Monday bump,
    the seasonal component recovers the bump (centered), trend is flat,
    and edge days (partial 7-day window) are NULL."""
    import datetime as dt

    from emr_trino_autoscale_spark.operators import events as ev

    t0 = dt.datetime(2024, 1, 1)   # a Monday
    rows = []
    eid = 0
    for d in range(21):
        bump = 7.0 if (t0 + dt.timedelta(days=d)).weekday() == 0 else 0.0
        rows.append((eid, t0 + dt.timedelta(days=d, hours=1), 1, "m", 10.0 + bump))
        eid += 1
    df = spark.createDataFrame(
        rows, "event_id long, ts timestamp, user_id long, event_type string, value double"
    )
    out = {r["day"].day: r for r in
           ev.seasonal_decompose_daily(df, trend_window_days=7).collect()}
    assert out[1]["trend"] is None and out[3]["residual"] is None
    mid = out[10]
    assert abs(mid["trend"] - 11.0) < 1e-9            # 10 + 7/7
    # Monday seasonal = +6, others -1 (centered to sum 0)
    mondays = [out[d] for d in (8, 15)]
    assert all(abs(m["seasonal"] - 6.0) < 1e-9 for m in mondays)
    assert abs(out[10]["seasonal"] + 1.0) < 1e-9
    assert abs(mid["residual"]) < 1e-9


def test_seasonal_decompose_gapped_days_take_null_path(spark):
    """X127 gap honesty (ADVICE r8): with day 11 missing from a 21-day
    series, every 7-ROW window that straddles the gap spans 8 calendar
    days — its 'weekly' average would mix misaligned weekdays, so those
    days must take the documented NULL edge path instead of reporting a
    silently-biased trend. Days whose window sits entirely on one side
    of the gap keep their exact trend."""
    import datetime as dt

    from emr_trino_autoscale_spark.operators import events as ev

    t0 = dt.datetime(2024, 1, 1)
    rows = [
        (d, t0 + dt.timedelta(days=d, hours=1), 1, "m", 10.0)
        for d in range(21)
        if d != 10  # calendar day 11 missing
    ]
    df = spark.createDataFrame(
        rows, "event_id long, ts timestamp, user_id long, event_type string, value double"
    )
    out = {r["day"].day: r for r in
           ev.seasonal_decompose_daily(df, trend_window_days=7).collect()}
    assert 11 not in out
    # window straddles the gap (8-calendar-day span) -> NULL
    for d in (8, 9, 10, 12, 13, 14):
        assert out[d]["trend"] is None, f"day {d} should be gap-NULLed"
    # windows clear of the gap on either side stay exact
    assert abs(out[7]["trend"] - 10.0) < 1e-9
    assert abs(out[15]["trend"] - 10.0) < 1e-9


def test_transition_matrix_hand_case(spark):
    """X128: exact transition counts/probabilities per user sequence,
    (ts, id) total order, first event of each user excluded."""
    import datetime as dt

    from emr_trino_autoscale_spark.operators import events as ev

    t0 = dt.datetime(2024, 1, 1)
    seq = {1: ["a", "b", "a", "b"], 2: ["a", "a", "c"]}
    rows = []
    eid = 0
    for u, types in seq.items():
        for i, t in enumerate(types):
            rows.append((eid, u, t0 + dt.timedelta(seconds=i), t, 1.0))
            eid += 1
    df = spark.createDataFrame(
        rows, "event_id long, user_id long, ts timestamp, event_type string, value double"
    )
    got = {(r.a, r.b): (r.n_ab, r.p_next) for r in ev.transition_matrix(df).collect()}
    assert got[("a", "b")] == (2, 0.5)
    assert got[("b", "a")] == (1, 1.0)
    assert got[("a", "a")] == (1, 0.25)
    assert got[("a", "c")] == (1, 0.25)


def test_cusum_flags_planted_level_shift(spark):
    """X129: a clean level shift puts the |CUSUM| peak on the last
    pre-shift day and the threshold passes; a flat series must not
    flag (zscore below threshold)."""
    import datetime as dt

    from emr_trino_autoscale_spark.operators import events as ev

    t0 = dt.datetime(2024, 1, 1)
    rows = []
    eid = 0
    for d in range(30):
        level = 10.0 if d < 15 else 20.0
        rows.append((eid, t0 + dt.timedelta(days=d), 1, "m", level))
        eid += 1
    df = spark.createDataFrame(
        rows, "event_id long, ts timestamp, user_id long, event_type string, value double"
    )
    out = {r["day"].day: r for r in ev.cusum_changepoints(df).collect()}
    peaks = [d for d, r in out.items() if r["is_peak"]]
    assert peaks == [15]   # last pre-shift day (days 1..15 at level 10)

    flat = spark.createDataFrame(
        [(i, t0 + dt.timedelta(days=i % 30), 1, "m", 10.0 + (i % 3) * 0.1)
         for i in range(90)],
        "event_id long, ts timestamp, user_id long, event_type string, value double",
    )
    assert not [r for r in ev.cusum_changepoints(flat).collect() if r["is_peak"]]


def test_kcore_peel_hand_graph(spark):
    """X130: a K4 core with a pendant chain — k=3 peeling removes the
    chain (cascade across rounds) and keeps exactly the K4 with
    degree 3, converged TRUE."""
    from emr_trino_autoscale_spark.operators.graph import kcore_peel

    k4 = [(a, b) for a in range(4) for b in range(4) if a < b]
    chain = [(3, 4), (4, 5), (5, 6)]
    df = spark.createDataFrame(k4 + chain, "src long, dst long")
    out = {r.node: (r.degree, r.converged) for r in
           kcore_peel(df, k=3, rounds=3).collect()}
    assert set(out) == {0, 1, 2, 3}
    assert all(v == (3, True) for v in out.values())


def test_theil_sen_ignores_outlier_day(spark):
    """X132: on y = 3x + 7 daily totals with one corrupted day, the
    Theil-Sen slope/intercept stay exact while OLS would shift."""
    import datetime as dt

    from emr_trino_autoscale_spark.operators import events as ev

    t0 = dt.datetime(2024, 1, 1)
    rows = []
    for d in range(15):
        y = 3.0 * d + 7.0 if d != 7 else 1000.0
        rows.append((d, t0 + dt.timedelta(days=d), 1, "m", y))
    df = spark.createDataFrame(
        rows, "event_id long, ts timestamp, user_id long, event_type string, value double"
    )
    r = ev.theil_sen_trend(df).collect()[0]
    assert r.n_days == 15
    assert abs(r.slope - 3.0) < 1e-9
    assert abs(r.intercept - 7.0) < 1e-9


def test_resample_linear_interpolation_semantics(spark):
    """X133: straight-line values between neighbors; on-tick
    observations returned verbatim; no extrapolation outside
    [first, last]."""
    import datetime as dt

    from emr_trino_autoscale_spark.operators import events as ev

    t0 = dt.datetime(2024, 1, 1)

    def us(sec):
        return int((t0 + dt.timedelta(seconds=sec)).timestamp() * 1_000_000)

    rows = [
        (1, 7, t0 + dt.timedelta(seconds=60), "m", 10.0),
        (2, 7, t0 + dt.timedelta(seconds=180), "m", 30.0),
        (3, 8, t0 + dt.timedelta(seconds=120), "m", 99.0),   # on-tick obs
    ]
    df = spark.createDataFrame(
        rows, "event_id long, user_id long, ts timestamp, event_type string, value double"
    )
    out = {
        (r["user_id"], r["tick_us"]): r["value"]
        for r in ev.resample_linear(df, step_seconds=120).collect()
    }
    # global grid ticks at 120s (covered by [60s, 180s])
    assert abs(out[(7, us(120))] - 20.0) < 1e-12   # midpoint of 10 -> 30
    assert out[(8, us(120))] == 99.0               # exactly on the obs
    assert len(out) == 2                            # no extrapolated ticks


def test_audio_profile_hand_wav(spark):
    """X134: known 100 ms silence pads + -6 dB tone — exact trim
    points, silence fraction, and dB figures; corrupt payload -> NULL
    row (the X6 degradation contract)."""
    import io
    import wave

    import numpy as np

    from emr_trino_autoscale_spark.operators.multimodal import audio_profile

    rate = 8000
    x = np.concatenate(
        [np.zeros(800), 0.5 * np.sin(2 * np.pi * 440 * np.arange(6400) / rate),
         np.zeros(800)]
    )
    pcm = (x * 32767).astype("<i2")
    buf = io.BytesIO()
    with wave.open(buf, "wb") as w:
        w.setnchannels(1)
        w.setsampwidth(2)
        w.setframerate(rate)
        w.writeframes(pcm.tobytes())
    media = spark.createDataFrame(
        [(1, bytearray(buf.getvalue())), (2, bytearray(b"not a wav"))],
        "media_id long, payload binary",
    )
    out = {r.media_id: r for r in audio_profile(media).collect()}
    assert out[1].lead_silence_ms == 100 and out[1].trail_silence_ms == 100
    assert abs(out[1].silence_fraction - 0.2) < 0.011
    assert abs(out[1].peak_db - (-6.0211)) < 0.01
    assert out[2].n_samples is None and out[2].rms_db is None


def test_textrank_hub_word_outranks_leaf(spark):
    """X135: a word adjacent to many distinct words accumulates rank
    above a word seen in one context; ranks sum to ~1."""
    from emr_trino_autoscale_spark.operators.text import textrank_keywords

    docs = spark.createDataFrame(
        [("hub alpha",), ("hub beta",), ("hub gamma",), ("delta epsilon",)],
        "text string",
    )
    got = {r.word: r.rank for r in textrank_keywords(docs).collect()}
    assert got["hub"] > got["delta"]
    assert abs(sum(got.values()) - 1.0) < 1e-9


def test_stratified_quota_split_exact_counts(spark):
    """X136: per-stratum quotas are exact ceil counts — a 7-row
    stratum still yields ceil(5.6)=6 train / ceil(0.7)=1 val / 0 test,
    and assignment is deterministic across calls."""
    from emr_trino_autoscale_spark.operators.text import stratified_quota_split

    rows = [(i, "big") for i in range(20)] + [(100 + i, "small") for i in range(7)]
    df = spark.createDataFrame(rows, "doc_id long, lang string")
    out = stratified_quota_split(df, "lang", "doc_id", 0.8, 0.1)
    counts: dict = {}
    for r in out.collect():
        counts[(r.stratum, r.split)] = counts.get((r.stratum, r.split), 0) + 1
    assert counts[("big", "train")] == 16 and counts[("big", "val")] == 2
    assert counts[("big", "test")] == 2
    assert counts[("small", "train")] == 6 and counts[("small", "val")] == 1
    assert ("small", "test") not in counts
    again = {(r.id, r.split) for r in out.collect()}
    assert again == {(r.id, r.split) for r in
                     stratified_quota_split(df, "lang", "doc_id", 0.8, 0.1).collect()}


def test_sketch_intersection_exact_at_small_cardinality(spark):
    """X137: far below sketch capacity HLL is exact, so the
    inclusion-exclusion intersection equals the true overlap; disjoint
    sets estimate ~0."""
    from emr_trino_autoscale_spark.operators.stats import sketch_intersection

    rows = (
        [("a", v) for v in range(100)]
        + [("b", v) for v in range(50, 150)]   # overlap 50 with a
        + [("c", v) for v in range(1000, 1100)]  # disjoint
    )
    df = spark.createDataFrame(rows, "g string, v long")
    out = {(r.g_a, r.g_b): r for r in sketch_intersection(df, "g", "v").collect()}
    assert abs(out[("a", "b")].est_intersection - 50.0) < 1.0
    assert abs(out[("a", "c")].est_intersection) < 1.0
    assert abs(out[("a", "b")].est_union - 150.0) < 1.0


def test_merge_agg_state_equals_recompute(spark):
    """X138: merged partials == full recompute for every measure,
    including keys present in only one side (full-outer merge)."""
    from emr_trino_autoscale_spark.operators.registry import (
        merge_agg_state,
        partial_agg,
    )

    rows = [("a", 1.0), ("a", 5.0), ("b", -2.0), ("c", 7.0), ("a", 3.0), ("d", 0.5)]
    df = spark.createDataFrame(rows, "k string, v double")
    h = partial_agg(spark.createDataFrame(rows[:3], "k string, v double"), ["k"], "v")
    t = partial_agg(spark.createDataFrame(rows[3:], "k string, v double"), ["k"], "v")
    merged = {r.k: (r.n, r.sum, r.min, r.max)
              for r in merge_agg_state(h, t, ["k"]).collect()}
    full = {r.k: (r.n, r.sum, r.min, r.max)
            for r in partial_agg(df, ["k"], "v").collect()}
    assert merged == full and set(merged) == {"a", "b", "c", "d"}


def test_bh_fdr_step_up_hand_case(spark):
    """X140: textbook step-up — a test whose own p exceeds its slot
    threshold still rejects because a LATER slot passes; all-null
    family rejects nothing."""
    from emr_trino_autoscale_spark.operators.stats import bh_fdr

    # m=10, q=0.2: thresholds k/10*0.2 = 0.02k
    # p = [0.015, 0.025, 0.055, 0.30, ...]: slot2 fails (0.025 > 0.04)?
    # no: 0.025 <= 0.04 passes; slot3 0.055 <= 0.06 passes -> k*=3,
    # and slot2 rejects even though slot4 (0.30 > 0.08) fails.
    ps = [0.015, 0.025, 0.055, 0.30, 0.5, 0.6, 0.7, 0.8, 0.9, 0.95]
    df = spark.createDataFrame(
        [(i, p) for i, p in enumerate(ps)], "t long, p double"
    )
    out = {r.test: (r.rank, r.rejected) for r in bh_fdr(df, "t", "p", 0.2).collect()}
    assert [out[i][1] for i in range(10)] == [True, True, True] + [False] * 7

    nulls = spark.createDataFrame([(i, 0.8 + i / 100) for i in range(10)], "t long, p double")
    assert not [r for r in bh_fdr(nulls, "t", "p", 0.2).collect() if r.rejected]


def test_transition_latency_quantiles_hand_case(spark):
    """X141: exact integer lower quantiles per transition pair."""
    import datetime as dt

    from emr_trino_autoscale_spark.operators import events as ev

    t0 = dt.datetime(2024, 1, 1)
    # user 1: a -(10s)-> b, a -(20s)-> b, a -(30s)-> b via 3 users
    rows = []
    eid = 0
    for u, gap in ((1, 10), (2, 20), (3, 30)):
        rows.append((eid, u, t0, "a", 1.0)); eid += 1
        rows.append((eid, u, t0 + dt.timedelta(seconds=gap), "b", 1.0)); eid += 1
    df = spark.createDataFrame(
        rows, "event_id long, user_id long, ts timestamp, event_type string, value double"
    )
    out = {r.pair: r for r in
           ev.transition_latency_quantiles(df, quantiles=((1, 2), (9, 10))).collect()}
    r = out["a->b"]
    assert r.n_transitions == 3
    assert r.lat_us_p1_2 == 20_000_000       # lower median of {10,20,30}s
    assert r.lat_us_p9_10 == 30_000_000


def test_cms_join_size_never_underestimates(spark):
    """X143: structural no-underestimate + exactness when the sketch
    is collision-free (tiny key sets)."""
    from emr_trino_autoscale_spark.operators.stats import cms_join_size

    l = spark.createDataFrame([(k,) for k in range(20)], "k long")
    r = spark.createDataFrame([(k % 10,) for k in range(40)], "k long")
    # exact: keys 0..9 appear 1x in l (of its 20) and 4x in r -> 10*1*4=40
    est = cms_join_size(l, r, "k", "k", d=4, w=65536).collect()[0]
    assert est.est_join_size == 40


def test_top_session_paths_respects_session_boundary(spark):
    """X144: a 3-step path must not span a session gap; counts exact."""
    import datetime as dt

    from emr_trino_autoscale_spark.operators import events as ev

    t0 = dt.datetime(2024, 1, 1)
    rows = []
    eid = 0
    # user 1: a,b,c within one session; then a NEW session c,b,a
    for i, typ in enumerate(["a", "b", "c"]):
        rows.append((eid, 1, t0 + dt.timedelta(seconds=i * 10), typ, 1.0)); eid += 1
    for i, typ in enumerate(["c", "b", "a"]):
        rows.append((eid, 1, t0 + dt.timedelta(hours=2, seconds=i * 10), typ, 1.0)); eid += 1
    df = spark.createDataFrame(
        rows, "event_id long, user_id long, ts timestamp, event_type string, value double"
    )
    got = {r.path: r.n for r in
           ev.top_session_paths(df, gap="30 MINUTES", path_len=3, top_k=10).collect()}
    assert got == {"a>b>c": 1, "c>b>a": 1}   # no c>a>... cross-session path


def test_robust_outlier_days_planted_spike(spark):
    """X145: a single spiked day flags; the clean baseline days do
    not; a constant series (MAD 0) emits NULL scores, no flags."""
    import datetime as dt

    from emr_trino_autoscale_spark.operators.stats import robust_outlier_days

    t0 = dt.datetime(2024, 1, 1)
    rows = []
    eid = 0
    for d in range(15):
        v = 1000.0 if d == 7 else 10.0 + (d % 3)   # spike day 8
        rows.append((eid, t0 + dt.timedelta(days=d), 1, "m", v)); eid += 1
        rows.append((eid, t0 + dt.timedelta(days=d), 1, "flat", 5.0)); eid += 1
    df = spark.createDataFrame(
        rows, "event_id long, ts timestamp, user_id long, event_type string, value double"
    )
    out = {(r.event_type, r.day.day): r for r in
           robust_outlier_days(df, "event_type", "ts", "value").collect()}
    flagged = [k for k, r in out.items() if r.is_outlier]
    assert flagged == [("m", 8)]
    assert out[("flat", 3)].m_score is None


def test_ctfidf_surfaces_class_exclusive_term(spark):
    """X146: a term exclusive to one class tops that class's ranking;
    a uniform background term never ranks first anywhere."""
    from emr_trino_autoscale_spark.operators.text import ctfidf_class_terms

    docs = spark.createDataFrame(
        [
            ("a", "common zebra zebra zebra common"),
            ("a", "common zebra filler"),
            ("b", "common walrus walrus filler"),
            ("b", "common walrus other"),
        ],
        "source string, text string",
    )
    out = {(r.source, r.rank): r.term for r in
           ctfidf_class_terms(docs, "source", "text", top_k=2).collect()}
    assert out[("a", 1)] == "zebra"
    assert out[("b", 1)] == "walrus"


def test_rrf_fuse_hand_case(spark):
    """X148: fused score arithmetic + missing-item convention (an item
    in only one ranking contributes one term and still fuses)."""
    from emr_trino_autoscale_spark.operators.similarity import rrf_fuse

    r1 = spark.createDataFrame(
        [("g", 1, 1), ("g", 2, 2)], "group string, item long, rnk int"
    )
    r2 = spark.createDataFrame(
        [("g", 2, 1), ("g", 3, 2)], "group string, item long, rnk int"
    )
    out = {r.item: (r.rrf_score, r.n_systems)
           for r in rrf_fuse([r1, r2]).collect()}
    assert abs(out[1][0] - 1 / 61) < 1e-15 and out[1][1] == 1
    assert abs(out[2][0] - (1 / 62 + 1 / 61)) < 1e-15 and out[2][1] == 2
    assert abs(out[3][0] - 1 / 62) < 1e-15
    # consensus item 2 outranks either single-system item
    assert out[2][0] > out[1][0] > out[3][0]


def test_corr_top_eigen_planted_structure(spark):
    """X149: on vectors where dims 0/1 are perfectly correlated and
    dim 2 independent, the dominant eigenpair is the [1,1]/sqrt(2)
    direction with eigenvalue 2."""
    from emr_trino_autoscale_spark.operators.similarity import corr_top_eigen

    rows = []
    for i in range(64):
        a = float(i % 7) - 3.0
        b = float((i * 13) % 11) - 5.0     # independent-ish of a
        rows.append((i, [a, a, b]))
    df = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    out = {r.dim_index: r for r in
           corr_top_eigen(df, "embedding", iterations=15).collect()}
    ev = out[1].eigenvalue
    assert abs(ev - 2.0) < 0.05
    import math

    assert abs(abs(out[1].loading) - 1 / math.sqrt(2)) < 0.05
    assert abs(out[1].loading - out[2].loading) < 1e-6   # equal loadings
    assert abs(out[3].loading) < 0.2


def test_quantile_normalize_aligns_marginals(spark):
    """X150: after normalization both groups carry the POOLED
    distribution — identical normalized multisets — and equal-rank
    cells in different groups map to the same pooled value."""
    from emr_trino_autoscale_spark.operators.stats import quantile_normalize

    rows = ([("a", float(v)) for v in (1, 2, 3, 4)]
            + [("b", float(v)) for v in (10, 20, 30, 40)])
    df = spark.createDataFrame(rows, "g string, v double")
    out = {(r.g, r.v): r.normalized
           for r in quantile_normalize(df, "g", "v").collect()}
    a_marg = sorted(out[("a", float(v))] for v in (1, 2, 3, 4))
    b_marg = sorted(out[("b", float(v))] for v in (10, 20, 30, 40))
    assert a_marg == b_marg == [2.0, 4.0, 20.0, 40.0]
    # tied cells: each value exactly once per group, ranks align
    assert out[("a", 1.0)] == out[("b", 10.0)]
    assert out[("a", 4.0)] == out[("b", 40.0)]


def test_quantile_normalize_unequal_group_sizes(spark):
    """X150: a 2-row group maps through its own rational quantiles
    (1/2, 2/2) onto the pooled 6-row distribution."""
    from emr_trino_autoscale_spark.operators.stats import quantile_normalize

    rows = ([("big", float(v)) for v in (1, 2, 3, 4)]
            + [("small", 100.0), ("small", 200.0)])
    df = spark.createDataFrame(rows, "g string, v double")
    out = {(r.g, r.v): r.normalized
           for r in quantile_normalize(df, "g", "v").collect()}
    # pooled sorted: 1,2,3,4,100,200 (N=6). small's fractions: 1/2, 1
    # -> smallest pooled v with cum/6 >= 1/2 is 3 (cum 3); >= 1 is 200
    assert out[("small", 100.0)] == 3.0
    assert out[("small", 200.0)] == 200.0


def test_quantile_normalize_bin_edge_completeness(spark):
    """X150 bin-edge losslessness (ADVICE r8): when group quantile
    positions land EXACTLY on segment/bin boundaries (r*N == hi*ng),
    the float bin keys computed from the two different ratios can
    round to opposite sides of a bin edge; the one-bin explode padding
    must keep every (group, value) cell in the output. Engineered so
    every position is an exact edge: group sizes divide the pooled N
    and n_bins aligns with the rank fractions — then asserts the
    universal completeness invariant (one output row per input cell)
    plus marginal alignment, across several n_bins including ones that
    put every boundary at a representable-float edge."""
    from emr_trino_autoscale_spark.operators.stats import quantile_normalize

    # 4 groups x 8 distinct values each -> N = 32; fractions k/8 align
    # with n_bins in {4, 8, 16, 256} so every hi/N*n_bins and r/ng*n_bins
    # is an exact integer (the worst case for opposite-side rounding).
    rows = [
        (g, float(10 * gi + k))
        for gi, g in enumerate(("a", "b", "c", "d"))
        for k in range(1, 9)
    ]
    df = spark.createDataFrame(rows, "g string, v double")
    for n_bins in (4, 8, 16, 256):
        got = quantile_normalize(df, "g", "v", n_bins=n_bins).collect()
        assert len(got) == len(rows), (
            f"n_bins={n_bins}: {len(rows) - len(got)} cells dropped at "
            "a bin edge"
        )
        marg = {}
        for r in got:
            marg.setdefault(r.g, []).append(r.normalized)
        margs = [sorted(vs) for vs in marg.values()]
        assert all(m == margs[0] for m in margs), f"n_bins={n_bins}"


def test_dhash_gradient_invariance(spark):
    """X151: dHash is invariant to a global brightness shift (which
    flips aHash bits) and distinguishes different gradient structure;
    corrupt payloads yield NULL."""
    import numpy as np

    from emr_trino_autoscale_spark.operators.multimodal import (
        dhash64_ppm,
        image_dhash,
    )

    def ppm(arr):
        h, w = arr.shape
        px = np.stack([arr] * 3, axis=2).astype(np.uint8)
        return b"P6\n%d %d\n255\n" % (w, h) + px.tobytes()

    base = np.tile(np.linspace(10, 200, 36).astype(np.uint8), (24, 1))
    shifted = np.clip(base.astype(int) + 40, 0, 255).astype(np.uint8)
    reversed_grad = base[:, ::-1].copy()
    h_base = dhash64_ppm(ppm(base))
    assert h_base == dhash64_ppm(ppm(shifted))          # brightness-invariant
    assert h_base != dhash64_ppm(ppm(reversed_grad))    # gradient-sensitive
    media = spark.createDataFrame(
        [(1, bytearray(ppm(base))), (2, bytearray(b"junk"))],
        "media_id long, payload binary",
    )
    out = {r.media_id: r.dhash for r in image_dhash(media).collect()}
    assert out[1] == h_base and out[2] is None


def test_spearman_corr_monotone_and_ties(spark):
    """X154: rho = 1 for any monotone (nonlinear) relation, -1 for
    reversed, and midrank ties handled exactly (textbook tie case)."""
    from emr_trino_autoscale_spark.operators.stats import spearman_corr

    rows = (
        [("mono", float(i), float(i ** 3)) for i in range(10)]
        + [("anti", float(i), float(-i ** 3)) for i in range(10)]
        + [("tied", 1.0, 2.0), ("tied", 1.0, 2.0), ("tied", 2.0, 1.0),
           ("tied", 3.0, 3.0)]
    )
    df = spark.createDataFrame(rows, "g string, x double, y double")
    out = {r.g: (r.n, r.rho) for r in spearman_corr(df, "g", "x", "y").collect()}
    # ulp tolerance (round 9): rho moved from F.corr to the guarded
    # covar_samp/(sx*sy) over the same stable moments — algebraically
    # identical, up to ~2 ulps at the |rho|=1 extremes (the dec4 query
    # contract absorbs it; q188 parity re-verified at both SFs)
    assert out["mono"][0] == 10 and abs(out["mono"][1] - 1.0) < 1e-12
    assert out["anti"][0] == 10 and abs(out["anti"][1] + 1.0) < 1e-12
    n, rho = out["tied"]
    assert n == 4
    # hand midranks: x -> [1.5,1.5,3,4], y -> [2.5,2.5,1,4]; Pearson
    import statistics as st

    rx, ry = [1.5, 1.5, 3, 4], [2.5, 2.5, 1, 4]
    mx, my = st.mean(rx), st.mean(ry)
    num = sum((a - mx) * (b - my) for a, b in zip(rx, ry))
    den = (sum((a - mx) ** 2 for a in rx) * sum((b - my) ** 2 for b in ry)) ** 0.5
    assert abs(rho - num / den) < 1e-12


def test_default_persist_registry_drains(spark):
    """ADVICE r8 leak fix: operators called WITHOUT a persist_fn
    register their cached intermediates in the _persist registry, and
    queries.release_caches() drains it — no cached block outlives the
    release cadence. Before the fix each bare .persist squatted
    executor storage for the session's lifetime (188-query suite =
    dozens of orphaned RDDs)."""
    from emr_trino_autoscale_spark.operators import _persist
    from emr_trino_autoscale_spark.operators.stats import quantile_normalize
    from emr_trino_autoscale_spark.queries import release_caches

    release_caches()  # start clean
    df = spark.createDataFrame(
        [("a", float(v)) for v in (1, 2, 3, 4)]
        + [("b", float(v)) for v in (10, 20, 30, 40)],
        "g string, v double",
    )
    # persist_fn=None -> the cells frame self-registers
    quantile_normalize(df, "g", "v", persist_fn=None).collect()
    assert len(_persist._DEFAULT_PERSISTS) >= 1
    cached = list(_persist._DEFAULT_PERSISTS)
    release_caches()
    assert _persist._DEFAULT_PERSISTS == []
    assert all(not c.is_cached for c in cached)


@pytest.mark.slow
def test_semantic_dedup_banded_sf01_recall(spark):
    """X65 at bench scale (VERDICT r8 task 6): run verify='banded' on
    the REAL sf0.1 embeddings — the code path a 100 TB job takes — and
    assert the recall bound against the exact q104 result, not just at
    the sf0.001 unit fixture. Wall-time A/B lives in docs/SCALE.md
    (round 9): exact 2.14 s vs banded 3.97 s median at sf0.1 — banded
    pays ~1.9x HERE because sf0.1 clusters are small enough that the
    quadratic exact pair join is cheap; its win is asymptotic
    (sum(cluster^2) vs banded-bucket work on the hot cluster)."""
    import os

    from emr_trino_autoscale_spark.io import load_table
    from emr_trino_autoscale_spark.queries import release_caches

    sf01 = "/root/testdata/sf0.1"
    if not os.path.isdir(sf01):
        pytest.skip("sf0.1 testdata missing")
    e = load_table(spark, sf01, "embeddings")
    cents = spark.createDataFrame(
        [(c, v) for c, v in enumerate(similarity.md5_centroids(k=8, dim=64))],
        "c_id int, embedding array<double>",
    )
    exact = {
        r["vec_id"] for r in
        similarity.semantic_dedup(e, cents, threshold=0.4).collect()
        if r["is_dup"]
    }
    release_caches()
    banded = {
        r["vec_id"] for r in
        similarity.semantic_dedup(
            e, cents, threshold=0.4, verify="banded"
        ).collect()
        if r["is_dup"]
    }
    release_caches()
    assert banded <= exact, "banded emitted a pair the exact form forbids"
    assert len(exact) > 100  # sf0.1 has real duplicate mass
    recall = len(banded & exact) / len(exact)
    assert recall >= 0.8, f"banded recall {recall:.3f} below design point"


def test_mutual_information_ignores_null_categories(spark):
    """X124 NULL contract (the X97/chi2 bug class, swept this round):
    NULL-bearing rows must be excluded from the population entirely —
    before the fix their mass stayed in N (biasing every p) while the
    margin equi-joins silently dropped their MI terms."""
    from emr_trino_autoscale_spark.operators import stats as st

    clean = spark.createDataFrame(
        [("a", "u")] * 6 + [("a", "v")] * 2 + [("b", "u")] * 2 + [("b", "v")] * 6,
        "x string, y string",
    )
    dirty = clean.unionByName(
        spark.createDataFrame(
            [(None, "u")] * 3 + [("a", None)] * 2, "x string, y string"
        )
    )
    want = st.mutual_information(clean, "x", "y").collect()[0]
    got = st.mutual_information(dirty, "x", "y").collect()[0]
    assert tuple(got) == tuple(want)
    assert got["n"] == 16


def _png_filter_rows(flat, bpp, filters):
    """Apply the chosen PNG filter per row of a byte matrix (one
    reduced image) — shared by the plain and Adam7 writer paths."""
    import numpy as np

    raw = bytearray()
    prev = np.zeros(flat.shape[1], dtype=np.int32)
    for y in range(flat.shape[0]):
        row = flat[y].astype(np.int32)
        f = filters[y % len(filters)]
        enc = row.copy()
        if f == 1:
            for i in range(len(row) - 1, bpp - 1, -1):
                enc[i] = (row[i] - row[i - bpp]) & 0xFF
        elif f == 2:
            enc = (row - prev) & 0xFF
        elif f == 3:
            for i in range(len(row)):
                left = row[i - bpp] if i >= bpp else 0
                enc[i] = (row[i] - ((left + prev[i]) >> 1)) & 0xFF
        elif f == 4:
            for i in range(len(row)):
                a = row[i - bpp] if i >= bpp else 0
                b = prev[i]
                c = prev[i - bpp] if i >= bpp else 0
                p = a + b - c
                pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
                pred = a if (pa <= pb and pa <= pc) else (b if pb <= pc else c)
                enc[i] = (row[i] - pred) & 0xFF
        raw.append(f)
        raw.extend(int(v) & 0xFF for v in enc)
        prev = row
    return raw


def _encode_png(arr, color_type, filters=None, palette=None,
                interlace=False, bit_depth=8):
    """Minimal test-side PNG writer (filter choice per row, optional
    Adam7 interlacing and 16-bit depth) so the decoder is exercised
    against independently-constructed payloads."""
    import struct
    import zlib

    import numpy as np

    h, w = arr.shape[0], arr.shape[1]
    channels = arr.shape[2] if arr.ndim == 3 else 1
    filters = filters or [0]
    passes = ((0, 0, 8, 8), (4, 0, 8, 8), (0, 4, 4, 8), (2, 0, 4, 4),
              (0, 2, 2, 4), (1, 0, 2, 2), (0, 1, 1, 2))
    if bit_depth in (1, 2, 4):
        # packed MSB-first sub-byte samples; filter distance is 1 byte
        samp = arr.reshape(h, w).astype(np.uint8)

        def pack_rows(sub):
            ph, pw = sub.shape
            per = 8 // bit_depth
            padw = -(-pw // per) * per
            padded = np.zeros((ph, padw), dtype=np.uint8)
            padded[:, :pw] = sub
            g = padded.reshape(ph, padw // per, per).astype(np.uint16)
            shifts = np.arange(per - 1, -1, -1) * bit_depth
            return (g << shifts).sum(axis=2).astype(np.uint8)

        if not interlace:
            raw = _png_filter_rows(pack_rows(samp), 1, filters)
        else:
            raw = bytearray()
            for x0, y0, dx, dy in passes:
                sub = samp[y0::dy, x0::dx]
                if sub.shape[0] == 0 or sub.shape[1] == 0:
                    continue
                raw.extend(_png_filter_rows(pack_rows(sub), 1, filters))
    else:
        if bit_depth == 16:
            # big-endian sample bytes
            a16 = arr.astype(np.uint16).reshape(h, w, channels)
            by = np.zeros((h, w, channels * 2), dtype=np.uint8)
            by[..., 0::2] = (a16 >> 8).astype(np.uint8)
            by[..., 1::2] = (a16 & 0xFF).astype(np.uint8)
            pix = by
        else:
            pix = arr.reshape(h, w, channels).astype(np.uint8)
        bpp = channels * (bit_depth // 8)

        if not interlace:
            raw = _png_filter_rows(pix.reshape(h, -1), bpp, filters)
        else:
            raw = bytearray()
            for x0, y0, dx, dy in passes:
                sub = pix[y0::dy, x0::dx]
                if sub.shape[0] == 0 or sub.shape[1] == 0:
                    continue
                raw.extend(_png_filter_rows(
                    sub.reshape(sub.shape[0], -1), bpp, filters
                ))

    def chunk(ctype, data):
        c = struct.pack(">I", len(data)) + ctype + data
        return c + struct.pack(">I", zlib.crc32(ctype + data) & 0xFFFFFFFF)

    ihdr = struct.pack(">IIBBBBB", w, h, bit_depth, color_type, 0, 0,
                       1 if interlace else 0)
    out = b"\x89PNG\r\n\x1a\n" + chunk(b"IHDR", ihdr)
    if palette is not None:
        out += chunk(b"PLTE", palette.astype(np.uint8).tobytes())
    out += chunk(b"IDAT", zlib.compress(bytes(raw)))
    out += chunk(b"IEND", b"")
    return out


def test_png_decoder_matches_ppm_on_same_pixels():
    """PNG decoder (round 9): decoding a PNG of EXACTLY the pixels a
    P6 PPM carries must give the identical 8-float feature vector —
    the shared contract across real decoders — across every filter
    type (None/Sub/Up/Average/Paeth) and the gray/RGB/RGBA/palette
    color types."""
    import numpy as np

    from emr_trino_autoscale_spark.operators.multimodal import (
        decode_png_image,
        decode_ppm_image,
    )

    rng = np.random.RandomState(7)
    rgb = rng.randint(0, 256, size=(12, 9, 3), dtype=np.uint8)
    ppm = b"P6\n9 12\n255\n" + rgb.tobytes()
    want = decode_ppm_image(ppm)

    # RGB with every filter type exercised
    filters = [0, 1, 2, 3, 4, 4, 3, 2, 1, 0, 4, 2]
    png = _encode_png(rgb, color_type=2, filters=filters)
    assert decode_png_image(png) == want

    # RGBA (alpha dropped)
    rgba = np.dstack([rgb, rng.randint(0, 256, size=(12, 9), dtype=np.uint8)])
    assert decode_png_image(_encode_png(rgba, color_type=6, filters=filters)) == want

    # palette: indices into a 256-entry palette reproducing the pixels
    # (build a palette from the distinct colors of a small image)
    small = rgb[:4, :4]
    colors, inv = np.unique(small.reshape(-1, 3), axis=0, return_inverse=True)
    idx = inv.reshape(4, 4, 1).astype(np.uint8)
    png_p = _encode_png(idx, color_type=3, filters=[0, 2, 1, 4], palette=colors)
    want_small = decode_ppm_image(b"P6\n4 4\n255\n" + small.tobytes())
    assert decode_png_image(png_p) == want_small

    # grayscale: gray value replicated to rgb
    gray = rng.randint(0, 256, size=(6, 5, 1), dtype=np.uint8)
    gray_rgb = np.repeat(gray, 3, axis=2)
    want_gray = decode_ppm_image(b"P6\n5 6\n255\n" + gray_rgb.tobytes())
    assert decode_png_image(_encode_png(gray, color_type=0, filters=[4, 3, 2, 1, 0, 4])) == want_gray


def test_png_decoder_refuses_unsupported_and_sniffs(spark):
    """Sub-8-bit depths and size-lying streams raise (never silently
    mis-decode) and sniffing_decoder routes PNG payloads to the real
    decoder while falling back to the stub for the broken variants.
    Round-10 update: 16-bit and Adam7 are REAL decodes now (see
    test_png_adam7_interlace_and_16bit) — the refusal cases here are a
    4-bit depth header and headers whose declared geometry doesn't
    match the stream (an 8-bit IDAT under a 16-bit or interlaced
    header is short by construction)."""
    import struct
    import zlib

    import numpy as np
    import pytest as _pytest

    from emr_trino_autoscale_spark.operators.multimodal import (
        _decode_stub,
        decode_png_image,
        sniffing_decoder,
    )

    rgb = np.arange(48, dtype=np.uint8).reshape(4, 4, 3)
    good = _encode_png(rgb, color_type=2)
    assert sniffing_decoder(good, "image") == decode_png_image(good)

    def with_ihdr(bit_depth=8, interlace=0):
        ihdr = struct.pack(">IIBBBBB", 4, 4, bit_depth, 2, 0, 0, interlace)
        c = struct.pack(">I", len(ihdr)) + b"IHDR" + ihdr
        c += struct.pack(">I", zlib.crc32(b"IHDR" + ihdr) & 0xFFFFFFFF)
        return good[:8] + c + good[8 + 12 + 13:]

    for bad in (
        with_ihdr(bit_depth=4),       # unsupported depth
        with_ihdr(bit_depth=16),      # stream half the declared size
        with_ihdr(interlace=1),       # sequential stream short of 7 passes
    ):
        with _pytest.raises(ValueError):
            decode_png_image(bad)
        assert sniffing_decoder(bad, "image") == _decode_stub(bad, "image")


def test_png_adam7_interlace_and_16bit():
    """Round 10: Adam7-interlaced and 16-bit PNGs decode for real. An
    interlaced encoding of the same pixels must decode IDENTICALLY to
    the sequential one (all filter types inside the reduced images;
    odd dimensions exercise empty and partial passes, including the
    1x1 and 2x1 degenerate images whose later passes are empty), and a
    16-bit deepening (v << 8 | v) must reduce back to the same 8-bit
    pixels via the high-byte contract — in both orders (plain 16-bit
    and interlaced 16-bit)."""
    import numpy as np

    from emr_trino_autoscale_spark.operators.multimodal import _png_rgb

    rng = np.random.RandomState(23)
    for hh, ww in ((13, 11), (8, 8), (1, 1), (2, 1), (3, 9)):
        rgb = rng.randint(0, 256, size=(hh, ww, 3), dtype=np.uint8)
        plain = _png_rgb(_encode_png(rgb, color_type=2))
        inter = _png_rgb(
            _encode_png(rgb, color_type=2, interlace=True,
                        filters=[0, 1, 2, 3, 4])
        )
        assert np.array_equal(plain, inter), (hh, ww)
        assert np.array_equal(plain, rgb.astype(np.float64))

        deep = (rgb.astype(np.uint16) << 8) | rgb
        for kw in ({"bit_depth": 16},
                   {"bit_depth": 16, "interlace": True,
                    "filters": [4, 3, 2, 1, 0]}):
            got = _png_rgb(_encode_png(deep, color_type=2, **kw))
            assert np.array_equal(got, rgb.astype(np.float64)), (hh, ww, kw)

    # gray + palette variants through the interlaced path
    gray = rng.randint(0, 256, size=(9, 7, 1), dtype=np.uint8)
    assert np.array_equal(
        _png_rgb(_encode_png(gray, color_type=0)),
        _png_rgb(_encode_png(gray, color_type=0, interlace=True,
                             filters=[2, 4])),
    )
    palette = rng.randint(0, 256, size=(5, 3), dtype=np.uint8)
    idx = rng.randint(0, 5, size=(6, 10, 1), dtype=np.uint8)
    assert np.array_equal(
        _png_rgb(_encode_png(idx, color_type=3, palette=palette)),
        _png_rgb(_encode_png(idx, color_type=3, palette=palette,
                             interlace=True, filters=[1, 0])),
    )


def test_bmp_decoder_matches_ppm_on_same_pixels():
    """BMP decoder (round 9): 24-bit bottom-up and 32-bit top-down BMPs
    of the same pixels must equal the PPM features; padded rows handled;
    compressed/paletted refused with stub fallback via the sniffer."""
    import struct

    import numpy as np
    import pytest as _pytest

    from emr_trino_autoscale_spark.operators.multimodal import (
        _decode_stub,
        decode_bmp_image,
        decode_ppm_image,
        sniffing_decoder,
    )

    rng = np.random.RandomState(11)
    rgb = rng.randint(0, 256, size=(7, 5, 3), dtype=np.uint8)  # stride pads
    want = decode_ppm_image(b"P6\n5 7\n255\n" + rgb.tobytes())

    def bmp(arr, bpp, top_down):
        h, w = arr.shape[:2]
        nb = bpp // 8
        stride = (w * nb + 3) & ~3
        rows = arr if top_down else arr[::-1]
        body = bytearray()
        for y in range(h):
            line = bytearray()
            for x in range(w):
                r, g, b = (int(v) for v in rows[y, x])
                line += bytes([b, g, r] + ([0] if nb == 4 else []))
            line += b"\x00" * (stride - len(line))
            body += line
        hdrh = -h if top_down else h
        info = struct.pack("<IiiHHIIiiII", 40, w, hdrh, 1, bpp, 0,
                           len(body), 2835, 2835, 0, 0)
        off = 14 + len(info)
        head = b"BM" + struct.pack("<IHHI", off + len(body), 0, 0, off)
        return head + info + bytes(body)

    b24 = bmp(rgb, 24, top_down=False)
    b32 = bmp(rgb, 32, top_down=True)
    assert decode_bmp_image(b24) == want
    assert decode_bmp_image(b32) == want
    assert sniffing_decoder(b24, "image") == want

    rle = bytearray(b24)
    rle[30:34] = struct.pack("<I", 1)  # BI_RLE8
    with _pytest.raises(ValueError):
        decode_bmp_image(bytes(rle))
    assert sniffing_decoder(bytes(rle), "image") == _decode_stub(bytes(rle), "image")


def _gif_lzw_encode_testside(indices, min_code):
    """Test-side GIF LZW encoder (dictionary growth across code
    widths, clear-on-full) — shared by the single-frame and animated
    GIF builders."""
    clear, end = 1 << min_code, (1 << min_code) + 1
    table = {(i,): i for i in range(clear)}
    next_code = end + 1
    code_size = min_code + 1
    codes = [clear]
    buf = ()
    for px in indices:
        cand = buf + (px,)
        if cand in table:
            buf = cand
            continue
        codes.append(table[buf])
        table[cand] = next_code
        next_code += 1
        buf = (px,)
        if next_code - 1 == (1 << code_size) - 1 and code_size < 12:
            code_size += 1
        if next_code == 4096:  # table full: clear (spec behavior)
            codes.append(clear)
            table = {(i,): i for i in range(clear)}
            next_code = end + 1
            code_size = min_code + 1
    if buf:
        codes.append(table[buf])
    codes.append(end)
    # pack LSB-first with the DECODER's width schedule: the decoder
    # grows its table one code BEHIND the encoder (no entry on the
    # first code after a clear — prev is None there)
    out = bytearray()
    acc = nbits = 0
    cs = min_code + 1
    n_table = end + 1
    first = True
    for c in codes:
        acc |= c << nbits
        nbits += cs
        while nbits >= 8:
            out.append(acc & 0xFF)
            acc >>= 8
            nbits -= 8
        if c == clear:
            n_table, cs, first = end + 1, min_code + 1, True
        elif c != end:
            if not first:
                n_table += 1
                if n_table == (1 << cs) and cs < 12:
                    cs += 1
            first = False
    if nbits:
        out.append(acc & 0xFF)
    return bytes(out)


def _encode_gif_animation(screen, palette, frames, bg_index=0):
    """Test-side ANIMATED GIF builder: logical screen + GCT, then per
    frame a GCE (disposal/transparency) and an image descriptor at its
    (left, top) sub-rect. ``frames`` is a list of dicts with keys idx
    (2-D index array), left, top, and optional disposal / transparent
    / interlaced."""
    import numpy as np

    sw, sh = screen
    n = len(palette)
    bits = max(2, int(np.ceil(np.log2(n))))
    pal = np.zeros((2 ** bits, 3), dtype=np.uint8)
    pal[:n] = palette
    out = bytearray(b"GIF89a")
    out += sw.to_bytes(2, "little") + sh.to_bytes(2, "little")
    out += bytes([0x80 | (bits - 1), bg_index, 0])
    out += pal.tobytes()
    for f in frames:
        idx = f["idx"]
        h, w = idx.shape
        disposal = f.get("disposal", 0)
        transparent = f.get("transparent")
        gpacked = (disposal & 0x07) << 2 | (1 if transparent is not None else 0)
        out += bytes([0x21, 0xF9, 4, gpacked, 0, 0,
                      transparent if transparent is not None else 0, 0])
        out += b"\x2C"
        out += f.get("left", 0).to_bytes(2, "little")
        out += f.get("top", 0).to_bytes(2, "little")
        out += w.to_bytes(2, "little") + h.to_bytes(2, "little")
        interlaced = f.get("interlaced", False)
        out += bytes([0x40 if interlaced else 0])
        rows = idx
        if interlaced:
            order = (list(range(0, h, 8)) + list(range(4, h, 8))
                     + list(range(2, h, 4)) + list(range(1, h, 2)))
            rows = idx[order]
        min_code = max(2, bits)
        out += bytes([min_code])
        data = _gif_lzw_encode_testside([int(v) for v in rows.flatten()], min_code)
        for i in range(0, len(data), 255):
            blk = data[i:i + 255]
            out += bytes([len(blk)]) + blk
        out += b"\x00"
    out += b"\x3B"
    return bytes(out)


def _tiff_lzw_encode_test(raw: bytes) -> bytes:
    """Test-side TIFF LZW encoder (TIFF 6.0 spec section 13, the
    normative pseudocode): MSB-first packing, 9->12-bit widths with
    the spec's encoder rule ("when NextCode equals 511 begin writing
    10-bit codes"), ClearCode re-emission when the table approaches
    4094. Independent of the decoder's implementation — the decoder
    derives its (one-entry-lagged) width boundaries separately."""
    out = bytearray()
    acc = accbits = 0

    def emit(code: int, width: int) -> None:
        nonlocal acc, accbits
        acc = (acc << width) | code
        accbits += width
        while accbits >= 8:
            accbits -= 8
            out.append((acc >> accbits) & 0xFF)

    CLEAR, EOI = 256, 257

    def fresh():
        return {bytes([i]): i for i in range(256)}, 258, 9

    table, next_code, width = fresh()
    emit(CLEAR, width)
    w = b""
    for b in raw:
        k = bytes([b])
        wk = w + k
        if wk in table:
            w = wk
            continue
        emit(table[w], width)
        table[wk] = next_code
        next_code += 1
        if next_code == (1 << width) - 1 and width < 12:
            width += 1
        w = k
        if next_code == 4094:  # spec: clear before the table fills
            emit(table[w], width)
            emit(CLEAR, width)
            table, next_code, width = fresh()
            w = b""
    if w:
        emit(table[w], width)
    emit(EOI, width)
    if accbits:
        out.append((acc << (8 - accbits)) & 0xFF)
    return bytes(out)


def _tiff_packbits_encode_test(raw: bytes) -> bytes:
    # simple PackBits: runs of >=3 identical bytes as repeats, the
    # rest as literal chunks (<=128), with a trailing 0x80 no-op
    out = bytearray()
    i = 0
    lit: list[int] = []

    def flush_lit():
        j = 0
        while j < len(lit):
            chunk = lit[j:j + 128]
            out.append(len(chunk) - 1)
            out.extend(chunk)
            j += 128
        lit.clear()

    while i < len(raw):
        run = 1
        while (i + run < len(raw) and raw[i + run] == raw[i]
               and run < 130):
            run += 1
        if run >= 3:
            flush_lit()
            out.append(257 - min(run, 128))
            out.append(raw[i])
            i += min(run, 128)
        else:
            lit.append(raw[i])
            i += 1
    flush_lit()
    out.append(128)  # trailing no-op byte (spec: skipped)
    return bytes(out)


def _encode_tiff(arr, big_endian=False, photometric=None, packbits=False,
                 rows_per_strip=None, alpha=False, compression=None,
                 predictor=1, tiles=None, planar=1, bits=8, palette=None):
    """Test-side TIFF 6.0 writer (II or MM; strip or tiled layout;
    chunky or separate planes; none/PackBits/LZW/deflate compression;
    optional horizontal-differencing predictor; 8- or 16-bit samples;
    optional alpha extra sample) so the decoder is exercised against
    independently-constructed payloads. ``packbits=True`` is the
    round-10 alias for ``compression='packbits'``."""
    import struct
    import zlib

    import numpy as np

    if compression is None:
        compression = "packbits" if packbits else "none"
    comp_tag = {"none": 1, "lzw": 5, "deflate": 8, "packbits": 32773}[compression]
    e = ">" if big_endian else "<"
    dt = np.uint8 if bits == 8 else np.dtype(e + "u2")
    h, w = arr.shape[0], arr.shape[1]
    channels = arr.shape[2] if arr.ndim == 3 else 1
    if photometric is None:
        photometric = 2 if channels >= 3 else 1
    arr = arr.reshape(h, w, channels).astype(dt)
    if alpha:
        a = np.full((h, w, 1), 200, dtype=dt)
        arr = np.concatenate([arr, a], axis=2)
        channels += 1

    def finish(seg):
        # seg: (rows, cols, ch) at the sample width — difference at
        # that width, then compress the serialized bytes
        if predictor == 2:
            seg = np.concatenate(
                [seg[:, :1], (seg[:, 1:].astype(np.int32)
                              - seg[:, :-1].astype(np.int32)) % (1 << bits)],
                axis=1,
            ).astype(dt)
        raw = seg.astype(dt).tobytes()
        if compression == "lzw":
            return _tiff_lzw_encode_test(raw)
        if compression == "packbits":
            return _tiff_packbits_encode_test(raw)
        if compression == "deflate":
            return zlib.compress(raw, 6)
        return raw

    nplanes = channels if planar == 2 else 1
    plane_arrs = (
        [arr[..., p:p + 1] for p in range(channels)] if planar == 2 else [arr]
    )
    segments = []
    if tiles:
        tw, th = tiles
        for pa in plane_arrs:
            padded = np.zeros(
                (-(-h // th) * th, -(-w // tw) * tw, pa.shape[2]),
                dtype=dt,
            )
            padded[:h, :w] = pa
            for y0 in range(0, padded.shape[0], th):
                for x0 in range(0, padded.shape[1], tw):
                    segments.append(
                        finish(padded[y0:y0 + th, x0:x0 + tw])
                    )
    else:
        rps = rows_per_strip or h
        for pa in plane_arrs:
            for y0 in range(0, h, rps):
                segments.append(finish(pa[y0:y0 + rps]))

    # layout: header(8) + IFD + values + segments
    entries = []  # (tag, type, values)

    def entry(tag, typ, values):
        entries.append((tag, typ, values))

    entry(256, 3, [w])
    entry(257, 3, [h])
    entry(258, 3, [bits] * channels)
    entry(259, 3, [comp_tag])
    entry(262, 3, [photometric])
    entry(277, 3, [channels])
    entry(284, 3, [planar])
    if palette is not None:
        # ColorMap (tag 320): 16-bit values, all reds then greens then
        # blues; v8 * 257 is the exact 8->16 bit expansion
        entry(320, 3, [int(v) * 257 for ch_ in range(3)
                       for v in palette[:, ch_]])
    if predictor == 2:
        entry(317, 3, [predictor])
    if tiles:
        entry(322, 3, [tiles[0]])
        entry(323, 3, [tiles[1]])
    else:
        entry(278, 3, [rows_per_strip or h])
    n = len(entries) + 2  # + segment offsets/counts below
    ifd_off = 8
    sizes = {3: 2, 4: 4}
    # compute value-area layout after the IFD
    val_off = ifd_off + 2 + 12 * (n) + 4
    blobs = []

    def ser(tag, typ, values):
        nonlocal val_off
        sz = sizes[typ] * len(values)
        code = {3: "H", 4: "I"}[typ] * len(values)
        raw = struct.pack(e + code, *values)
        if sz <= 4:
            raw = raw + b"\x00" * (4 - sz)
            return struct.pack(e + "HHI", tag, typ, len(values)) + raw
        blobs.append(raw)
        out_ = struct.pack(e + "HHII", tag, typ, len(values), val_off)
        val_off += sz
        return out_

    # serialize everything except segment offsets first to learn sizes
    body = []
    for tag, typ, values in entries:
        body.append(ser(tag, typ, values))
    counts = [len(s) for s in segments]
    count_tag, offset_tag = (325, 324) if tiles else (279, 273)
    body.append(ser(count_tag, 4, counts))
    # segment offsets: segments land after the value blobs
    offs = []
    cur = val_off + (4 * len(segments) if len(segments) > 1 else 0)
    for c in counts:
        offs.append(cur)
        cur += c
    body.append(ser(offset_tag, 4, offs))

    body.sort(key=lambda b_: struct.unpack(e + "H", b_[:2])[0])
    out = (b"II" if not big_endian else b"MM") + struct.pack(e + "HI", 42, ifd_off)
    out += struct.pack(e + "H", n) + b"".join(body) + struct.pack(e + "I", 0)
    out += b"".join(blobs)
    out += b"".join(segments)
    return out


def test_tiff_decoder_matches_ppm_on_same_pixels():
    """TIFF decoder (round 10): II and MM byte orders, single- and
    multi-strip layouts, PackBits compression, RGBA extra sample, and
    both grayscale photometrics (incl. WhiteIsZero inversion) decode
    to the same features as a PPM of identical pixels; the sniffer
    routes TIFF magic to the real decoder."""
    import numpy as np

    from emr_trino_autoscale_spark.operators.multimodal import (
        _tiff_rgb,
        decode_ppm_image,
        decode_tiff_image,
        sniffing_decoder,
    )

    rng = np.random.RandomState(13)
    rgb = rng.randint(0, 256, size=(11, 7, 3), dtype=np.uint8)
    want = decode_ppm_image(b"P6\n7 11\n255\n" + rgb.tobytes())

    for kwargs in (
        {},
        {"big_endian": True},
        {"rows_per_strip": 3},
        {"packbits": True, "rows_per_strip": 4},
        {"alpha": True},
        {"packbits": True, "big_endian": True},
    ):
        payload = _encode_tiff(rgb, **kwargs)
        assert decode_tiff_image(payload) == want, kwargs
        assert sniffing_decoder(payload, "image") == want, kwargs

    # grayscale: BlackIsZero direct, WhiteIsZero inverted
    gray = rng.randint(0, 256, size=(6, 9, 1), dtype=np.uint8)
    g3 = np.repeat(gray, 3, axis=2)
    want_g = decode_ppm_image(b"P6\n9 6\n255\n" + g3.tobytes())
    assert decode_tiff_image(_encode_tiff(gray, photometric=1)) == want_g
    inv = _encode_tiff(255 - gray, photometric=0)  # WhiteIsZero stores inverse
    assert decode_tiff_image(inv) == want_g

    # repetitive image: exercises long PackBits repeat runs (>128)
    flat = np.full((5, 80, 3), 7, dtype=np.uint8)
    want_f = decode_ppm_image(b"P6\n80 5\n255\n" + flat.tobytes())
    assert decode_tiff_image(_encode_tiff(flat, packbits=True)) == want_f

    # unsupported variants raise -> sniffer falls back to the stub
    # (LZW and deflate graduated to real decodes in round 11;
    # JPEG-in-TIFF is the remaining compression stub — patch the
    # 16-bit value right after the 259 entry header)
    import pytest as _pytest

    from emr_trino_autoscale_spark.operators.multimodal import _decode_stub

    jpg = bytearray(_encode_tiff(rgb))
    i = jpg.find(b"\x03\x01")  # tag 259 little-endian
    assert i > 0
    jpg[i + 8] = 7  # JPEG-in-TIFF
    with _pytest.raises(ValueError):
        _tiff_rgb(bytes(jpg))
    assert sniffing_decoder(bytes(jpg), "image") == _decode_stub(bytes(jpg), "image")


def test_tiff_lzw_tiles_planar_predictor_match_baseline():
    """Round-11 TIFF extensions: LZW compression (spec section 13),
    horizontal-differencing predictor (section 14), tiled layout
    (section 15), and separate-plane configuration all decode to the
    SAME pixels as the uncompressed chunky-strip baseline of the same
    image — the cross-variant pinning standard the FLAC/WAV and
    interlaced/sequential-PNG twins set. Geometries include non-tile-
    multiple edges (padded edge tiles cropped) and the noise image is
    big enough to push LZW across the 9->10-bit width boundary."""
    import numpy as np

    from emr_trino_autoscale_spark.operators.multimodal import (
        _tiff_rgb,
        decode_tiff_image,
    )

    rng = np.random.RandomState(29)
    # smooth gradient + noise: gradient makes the predictor productive,
    # noise forces LZW table growth across the first width boundary
    gx = np.linspace(0, 255, 37, dtype=np.float64)
    base = (gx[None, :, None] + gx[:37][:, None, None] / 2) % 256
    rgb = (
        (base + rng.randint(0, 32, size=(37, 37, 3))) % 256
    ).astype(np.uint8)
    want = _tiff_rgb(_encode_tiff(rgb))  # uncompressed chunky strips

    variants = (
        {"compression": "lzw"},
        {"compression": "lzw", "predictor": 2},
        {"compression": "lzw", "predictor": 2, "big_endian": True},
        {"compression": "lzw", "rows_per_strip": 5},
        {"compression": "packbits", "predictor": 2},
        {"tiles": (16, 8)},                      # non-multiple edges
        {"tiles": (16, 8), "compression": "lzw", "predictor": 2},
        {"tiles": (37, 37), "compression": "packbits"},  # single tile
        {"planar": 2},
        {"planar": 2, "compression": "lzw", "predictor": 2},
        {"planar": 2, "tiles": (8, 16), "compression": "lzw"},
        {"planar": 2, "rows_per_strip": 4, "compression": "packbits"},
    )
    for kwargs in variants:
        got = _tiff_rgb(_encode_tiff(rgb, **kwargs))
        assert np.array_equal(got, want), kwargs

    # grayscale planar/tiled/predictor twins agree with the chunky form
    gray = rng.randint(0, 256, size=(13, 21, 1), dtype=np.uint8)
    want_g = decode_tiff_image(_encode_tiff(gray, photometric=1))
    for kwargs in (
        {"compression": "lzw", "predictor": 2},
        {"tiles": (8, 8), "compression": "lzw"},
    ):
        got_g = decode_tiff_image(
            _encode_tiff(gray, photometric=1, **kwargs)
        )
        assert got_g == want_g, kwargs


def test_tiff_lzw_width_boundaries_and_clear():
    """The LZW variable-width boundaries are where the historical
    encoder/decoder interop bug lives. Pin the round trip across ALL
    boundaries (9->10->11->12) AND a mid-stream ClearCode (table
    approaching 4094 forces the test encoder to re-clear): a
    ~20k-byte incompressible plane guarantees >4000 table entries."""
    import numpy as np

    from emr_trino_autoscale_spark.operators.multimodal import (
        _tiff_lzw_decode,
        _tiff_rgb,
    )

    rng = np.random.RandomState(31)
    raw = bytes(rng.randint(0, 256, size=20_000, dtype=np.int64).tolist())
    enc = _tiff_lzw_encode_test(raw)
    assert _tiff_lzw_decode(enc) == raw
    # the mid-stream clear actually happened (table filled)
    assert len(raw) / 2 > 4094 - 258  # enough breaks to fill the table

    # and through the full image path: a 96x96 RGB noise image is
    # 27648 bytes -> multiple width bumps inside one strip
    rgb = rng.randint(0, 256, size=(96, 96, 3), dtype=np.uint8)
    want = _tiff_rgb(_encode_tiff(rgb))
    got = _tiff_rgb(_encode_tiff(rgb, compression="lzw"))
    assert np.array_equal(got, want)

    # truncated LZW stream: ValueError (decode may legally end at a
    # code boundary, so sweep cuts and require no non-ValueError)
    payload = _encode_tiff(rgb[:8, :8], compression="lzw")
    for cut in range(len(payload) - 40, len(payload)):
        try:
            _tiff_rgb(payload[:cut])
        except ValueError:
            pass


def test_tiff_deflate_and_16bit_match_baseline():
    """Round-11 TIFF extensions, part 2: zlib-deflate compression
    (tags 8 and legacy 32946) and 16-bit samples (high-byte reduction
    AFTER un-differencing, the PNG16 probe contract) decode to the
    same pixels as their 8-bit / uncompressed twins; a corrupt deflate
    stream raises ValueError."""
    import struct

    import numpy as np
    import pytest as _pytest

    from emr_trino_autoscale_spark.operators.multimodal import _tiff_rgb

    rng = np.random.RandomState(41)
    rgb = rng.randint(0, 256, size=(14, 10, 3), dtype=np.uint8)
    want = _tiff_rgb(_encode_tiff(rgb))
    for kwargs in (
        {"compression": "deflate"},
        {"compression": "deflate", "predictor": 2},
        {"compression": "deflate", "tiles": (8, 8), "big_endian": True},
        {"compression": "deflate", "planar": 2, "predictor": 2},
    ):
        got = _tiff_rgb(_encode_tiff(rgb, **kwargs))
        assert np.array_equal(got, want), kwargs

    # legacy old-style deflate tag (32946) decodes identically: patch
    # the SHORT value of tag 259 from 8 to 32946 (fits in 2 bytes)
    legacy = bytearray(_encode_tiff(rgb, compression="deflate"))
    i = legacy.find(b"\x03\x01")
    assert i > 0 and struct.unpack("<H", legacy[i + 8:i + 10])[0] == 8
    legacy[i + 8:i + 10] = struct.pack("<H", 32946)
    assert np.array_equal(_tiff_rgb(bytes(legacy)), want)

    # 16-bit: exact high bytes of the 16-bit samples, across byte
    # orders, compression, predictor (16-bit differencing), planar
    hi = rng.randint(0, 256, size=(9, 12, 3), dtype=np.uint16)
    px16 = (hi.astype(np.uint16) << 8) | rng.randint(
        0, 256, size=(9, 12, 3), dtype=np.uint16
    )
    want16 = _tiff_rgb(_encode_tiff(hi.astype(np.uint8)))  # 8-bit of hi
    for kwargs in (
        {},
        {"big_endian": True},
        {"compression": "lzw", "predictor": 2},
        {"compression": "deflate", "big_endian": True, "predictor": 2},
        {"tiles": (8, 4), "compression": "lzw"},
        {"planar": 2, "compression": "deflate", "predictor": 2},
    ):
        got16 = _tiff_rgb(_encode_tiff(px16, bits=16, **kwargs))
        assert np.array_equal(got16, want16), kwargs

    # corrupt deflate payload: ValueError, not zlib.error
    bad = bytearray(_encode_tiff(rgb, compression="deflate"))
    bad[-10] ^= 0xFF
    with _pytest.raises(ValueError):
        _tiff_rgb(bytes(bad))


def test_gif_decoder_matches_ppm_on_same_pixels():
    """GIF decoder (round 9): a REAL LZW-compressed GIF (test-side
    encoder with dictionary growth across code widths) of the same
    pixels must equal the PPM features — plain and interlaced, global
    and local color tables; a GIF89a graphics-control extension is
    skipped correctly."""
    import numpy as np

    from emr_trino_autoscale_spark.operators.multimodal import (
        decode_gif_image,
        decode_ppm_image,
        sniffing_decoder,
    )

    lzw_encode = _gif_lzw_encode_testside

    def gif(idx, palette, interlaced=False, local_ct=False, ext=False):
        h, w = idx.shape
        n = len(palette)
        bits = max(2, int(np.ceil(np.log2(n))))
        pal = np.zeros((2 ** bits, 3), dtype=np.uint8)
        pal[:n] = palette
        out = bytearray(b"GIF89a")
        out += w.to_bytes(2, "little") + h.to_bytes(2, "little")
        if local_ct:
            out += bytes([0x00, 0, 0])  # no GCT
        else:
            out += bytes([0x80 | (bits - 1), 0, 0])
            out += pal.tobytes()
        if ext:
            out += bytes([0x21, 0xF9, 4, 0, 0, 0, 0, 0])  # GCE + terminator
        out += b"\x2C" + (0).to_bytes(2, "little") * 2
        out += w.to_bytes(2, "little") + h.to_bytes(2, "little")
        ipacked = (0x40 if interlaced else 0) | (0x80 | (bits - 1) if local_ct else 0)
        out += bytes([ipacked])
        if local_ct:
            out += pal.tobytes()
        rows = idx
        if interlaced:
            order = (list(range(0, h, 8)) + list(range(4, h, 8))
                     + list(range(2, h, 4)) + list(range(1, h, 2)))
            rows = idx[order]
        min_code = max(2, bits)
        out += bytes([min_code])
        data = lzw_encode([int(v) for v in rows.flatten()], min_code)
        for i in range(0, len(data), 255):
            blk = data[i:i + 255]
            out += bytes([len(blk)]) + blk
        out += b"\x00\x3B"
        return bytes(out)

    rng = np.random.RandomState(3)
    palette = rng.randint(0, 256, size=(11, 3), dtype=np.uint8)
    idx = rng.randint(0, 11, size=(13, 9)).astype(np.int64)
    rgb = palette[idx]
    want = decode_ppm_image(b"P6\n9 13\n255\n" + rgb.astype(np.uint8).tobytes())

    plain = gif(idx, palette)
    assert decode_gif_image(plain) == want
    assert sniffing_decoder(plain, "image") == want
    assert decode_gif_image(gif(idx, palette, interlaced=True)) == want
    assert decode_gif_image(gif(idx, palette, local_ct=True, ext=True)) == want

    # long repetitive stream: forces dictionary growth over >2 code
    # widths and the KwKwK case
    idx2 = np.tile(np.arange(4), 600).reshape(60, 40) % 4
    pal2 = np.array([[0, 0, 0], [85, 85, 85], [170, 170, 170], [255, 255, 255]],
                    dtype=np.uint8)
    rgb2 = pal2[idx2]
    want2 = decode_ppm_image(b"P6\n40 60\n255\n" + rgb2.astype(np.uint8).tobytes())
    assert decode_gif_image(gif(idx2.astype(np.int64), pal2)) == want2


def test_gif_animation_compositing():
    """Round 10: _gif_frames composites an animated GIF per the GCE
    model — sub-rect placement, transparency holes, disposal 1 (leave)
    / 2 (restore background) / 3 (restore previous) — against an
    independently-computed numpy expectation for every frame."""
    import numpy as np

    from emr_trino_autoscale_spark.operators.multimodal import _gif_frames

    pal = np.array(
        [[10, 10, 10], [200, 0, 0], [0, 200, 0], [0, 0, 200], [250, 250, 250]],
        dtype=np.uint8,
    )
    rng = np.random.RandomState(7)
    base = rng.randint(0, 5, size=(10, 12)).astype(np.int64)
    rect2 = rng.randint(0, 5, size=(4, 5)).astype(np.int64)
    rect2[1, 2] = 3  # will be declared transparent
    rect3 = rng.randint(0, 5, size=(3, 3)).astype(np.int64)
    rect4 = np.full((2, 2), 4, dtype=np.int64)

    payload = _encode_gif_animation(
        (12, 10), pal, bg_index=0,
        frames=[
            {"idx": base, "disposal": 1},
            {"idx": rect2, "left": 3, "top": 2, "transparent": 3,
             "disposal": 2, "interlaced": True},
            {"idx": rect3, "left": 7, "top": 6, "disposal": 3},
            {"idx": rect4, "left": 0, "top": 0},
        ],
    )
    got = _gif_frames(payload)
    assert len(got) == 4

    # independent expectation
    canvas = np.broadcast_to(pal[0], (10, 12, 3)).astype(np.uint8).copy()
    canvas[:, :] = pal[base]
    f1 = canvas.copy()
    pre2 = canvas.copy()
    r2 = pal[rect2]
    m2 = rect2 != 3
    region = canvas[2:6, 3:8]
    region[m2] = r2[m2]
    f2 = canvas.copy()
    canvas[2:6, 3:8] = pal[0]  # disposal 2: restore to background
    pre3 = canvas[6:9, 7:10].copy()
    canvas[6:9, 7:10] = pal[rect3]
    f3 = canvas.copy()
    canvas[6:9, 7:10] = pre3  # disposal 3: restore previous
    canvas[0:2, 0:2] = pal[rect4]
    f4 = canvas.copy()

    for i, want in enumerate((f1, f2, f3, f4)):
        assert np.array_equal(got[i], want), f"frame {i}"
    del pre2


def test_gif_animation_randomized_scripts():
    """Fuzz the GIF compositor with randomized animation scripts —
    random frame rects/palettes/disposals/transparency/interlace per
    frame — against a straight-line numpy reference compositor written
    directly from the GIF89a model (independent of the decoder's
    incremental canvas logic)."""
    import numpy as np

    from emr_trino_autoscale_spark.operators.multimodal import _gif_frames

    for seed in range(10):
        rng = np.random.RandomState(200 + seed)
        sw, sh = int(rng.randint(6, 20)), int(rng.randint(6, 20))
        npal = int(rng.randint(4, 9))
        pal = rng.randint(0, 256, size=(npal, 3), dtype=np.uint8)
        bg = int(rng.randint(0, npal))
        frames = []
        for _ in range(int(rng.randint(2, 6))):
            w = int(rng.randint(1, sw + 1))
            h = int(rng.randint(1, sh + 1))
            left = int(rng.randint(0, sw - w + 1))
            top = int(rng.randint(0, sh - h + 1))
            f = {
                "idx": rng.randint(0, npal, size=(h, w)).astype(np.int64),
                "left": left,
                "top": top,
                "disposal": int(rng.randint(0, 4)),
                "interlaced": bool(rng.randint(0, 2)),
            }
            if rng.randint(0, 2):
                f["transparent"] = int(rng.randint(0, npal))
            frames.append(f)

        payload = _encode_gif_animation((sw, sh), pal, frames, bg_index=bg)
        got = _gif_frames(payload)

        # independent reference compositor (spec model, no shared code)
        canvas = np.tile(pal[bg], (sh, sw, 1)).astype(np.uint8)
        want = []
        for f in frames:
            h, w = f["idx"].shape
            t, l = f["top"], f["left"]
            before = canvas[t:t + h, l:l + w].copy()
            rect = pal[f["idx"]]
            tr = f.get("transparent")
            for yy in range(h):
                for xx in range(w):
                    if tr is None or f["idx"][yy, xx] != tr:
                        canvas[t + yy, l + xx] = rect[yy, xx]
            want.append(canvas.copy())
            if f["disposal"] == 2:
                canvas[t:t + h, l:l + w] = pal[bg]
            elif f["disposal"] == 3:
                canvas[t:t + h, l:l + w] = before
        assert len(got) == len(want)
        for i, (g, wf) in enumerate(zip(got, want)):
            assert np.array_equal(g, wf), (seed, i)


def test_frame_sample_gif_and_y4m(spark):
    """frame_sample explodes animated GIFs alongside Y4M clips: color
    P6 frames at screen size, evenly strided, corrupt payloads
    contributing zero rows."""
    import numpy as np

    from emr_trino_autoscale_spark.operators.multimodal import (
        _gif_frames,
        frame_sample,
    )

    pal = np.array([[0, 0, 0], [255, 0, 0], [0, 255, 0]], dtype=np.uint8)
    rng = np.random.RandomState(9)
    frames = [{"idx": rng.randint(0, 3, size=(6, 8)).astype(np.int64)}
              for _ in range(5)]
    gif_payload = _encode_gif_animation((8, 6), pal, frames=frames)

    df = spark.createDataFrame(
        [(1, bytearray(gif_payload)), (2, bytearray(b"not media"))],
        "media_id long, payload binary",
    )
    rows = frame_sample(df, max_frames=3).orderBy("media_id", "frame_idx").collect()
    assert [r.media_id for r in rows] == [1, 1, 1]
    assert [r.frame_idx for r in rows] == [0, 2, 4]  # even stride over 5
    composited = _gif_frames(gif_payload)
    for r in rows:
        assert r.width == 8 and r.height == 6
        want = b"P6\n8 6\n255\n" + composited[r.frame_idx].tobytes()
        assert bytes(r.payload) == want


class _FlacBW:
    """Test-side MSB-first bit writer (no byte stuffing — FLAC has
    none)."""

    def __init__(self):
        self.buf = bytearray()
        self.acc = 0
        self.n = 0

    def put(self, v, nbits):
        self.acc = (self.acc << nbits) | (v & ((1 << nbits) - 1) if nbits else 0)
        self.n += nbits
        while self.n >= 8:
            self.buf.append((self.acc >> (self.n - 8)) & 0xFF)
            self.n -= 8
        self.acc &= (1 << self.n) - 1

    def sput(self, v, nbits):
        self.put(v & ((1 << nbits) - 1), nbits)

    def unary(self, q):
        for _ in range(q):
            self.put(0, 1)
        self.put(1, 1)

    def align(self):
        if self.n:
            self.put(0, 8 - self.n)


def _flac_residual(bw, resid, block_size, order, part_order=0, rice2=False,
                   escape=False):
    """Encode a FLAC residual: zigzag + Rice (or escaped raw
    partitions), any partition order that divides the block size."""
    bw.put(1 if rice2 else 0, 2)
    plen = 5 if rice2 else 4
    bw.put(part_order, 4)
    nparts = 1 << part_order
    pos = 0
    for p in range(nparts):
        n = block_size >> part_order
        if p == 0:
            n -= order
        part = resid[pos:pos + n]
        pos += n
        uz = [(r << 1) if r >= 0 else (-r << 1) - 1 for r in part]
        if escape:
            raw = max((abs(r).bit_length() + 1 for r in part), default=1)
            bw.put((1 << plen) - 1, plen)
            bw.put(raw, 5)
            for r in part:
                bw.sput(r, raw)
            continue
        mean_u = sum(uz) // max(1, len(uz))
        param = min(max(mean_u.bit_length() - 1, 0), (1 << plen) - 2)
        bw.put(param, plen)
        for u in uz:
            bw.unary(u >> param)
            if param:
                bw.put(u & ((1 << param) - 1), param)


def _flac_subframe(bw, data, bps, kind, part_order=0, rice2=False,
                   escape=False, lpc=None, wasted=0):
    """Encode one subframe. ``kind``: 'constant' | 'verbatim' |
    ('fixed', order) | 'lpc' (with lpc=(coefs, shift, precision)).
    ``wasted`` shifts all samples right first (they must be divisible
    by 2^wasted)."""
    bw.put(0, 1)  # padding
    if wasted:
        assert all(s % (1 << wasted) == 0 for s in data)
        data = [s >> wasted for s in data]
        eff_bps = bps - wasted
    else:
        eff_bps = bps
    if kind == "constant":
        bw.put(0, 6)
        _emit_wasted(bw, wasted)
        bw.sput(data[0], eff_bps)
        return
    if kind == "verbatim":
        bw.put(1, 6)
        _emit_wasted(bw, wasted)
        for s in data:
            bw.sput(s, eff_bps)
        return
    if isinstance(kind, tuple) and kind[0] == "fixed":
        order = kind[1]
        bw.put(8 + order, 6)
        _emit_wasted(bw, wasted)
        for s in data[:order]:
            bw.sput(s, eff_bps)
        coefs = {0: [], 1: [1], 2: [2, -1], 3: [3, -3, 1], 4: [4, -6, 4, -1]}[order]
        resid = [
            data[i] - sum(c * data[i - 1 - j] for j, c in enumerate(coefs))
            for i in range(order, len(data))
        ]
        _flac_residual(bw, resid, len(data), order, part_order, rice2, escape)
        return
    assert kind == "lpc"
    coefs, shift, precision = lpc
    order = len(coefs)
    bw.put(32 + order - 1, 6)
    _emit_wasted(bw, wasted)
    for s in data[:order]:
        bw.sput(s, eff_bps)
    bw.put(precision - 1, 4)
    bw.sput(shift, 5)
    for c in coefs:
        bw.sput(c, precision)
    resid = [
        data[i] - (sum(c * data[i - 1 - j] for j, c in enumerate(coefs)) >> shift)
        for i in range(order, len(data))
    ]
    _flac_residual(bw, resid, len(data), order, part_order, rice2, escape)


def _emit_wasted(bw, wasted):
    # wasted-bits flag + unary(wasted-1): `wasted-1` zeros then a 1
    if wasted:
        bw.put(1, 1)
        for _ in range(wasted - 1):
            bw.put(0, 1)
        bw.put(1, 1)
    else:
        bw.put(0, 1)


def _encode_flac(samples, rate, frame_size=256, mode="independent",
                 plan=None, bps=16):
    """Test-side FLAC encoder (spec-correct streams the decoder did
    not produce): STREAMINFO + fixed-blocking frames. ``mode``:
    independent | left_side | right_side | mid_side (2-channel).
    ``plan(ch, frame_idx) -> kwargs for _flac_subframe`` chooses the
    subframe type per channel/frame (default: verbatim)."""
    import numpy as np

    samples = np.asarray(samples, dtype=np.int64)
    n, nch = samples.shape
    plan = plan or (lambda ch, fi: {"kind": "verbatim"})

    out = bytearray(b"fLaC")
    si = _FlacBW()
    si.put(frame_size, 16)
    si.put(frame_size, 16)
    si.put(0, 24)
    si.put(0, 24)
    si.put(rate, 20)
    si.put(nch - 1, 3)
    si.put(bps - 1, 5)
    si.put(n, 36)
    si.buf.extend(b"\x00" * 16)  # MD5 unset (decoder doesn't verify)
    out += bytes([0x80]) + len(si.buf).to_bytes(3, "big") + si.buf

    ch_code = {"independent": nch - 1, "left_side": 8,
               "right_side": 9, "mid_side": 10}[mode]
    for fi, start in enumerate(range(0, n, frame_size)):
        blk = samples[start:start + frame_size]
        bsz = blk.shape[0]
        bw = _FlacBW()
        bw.put(0x3FFE, 14)
        bw.put(0, 1)
        bw.put(0, 1)  # fixed blocking
        bw.put(7, 4)   # block size: 16-bit at end
        bw.put(0, 4)   # sample rate: from STREAMINFO
        bw.put(ch_code, 4)
        bw.put(0, 3)   # sample size: from STREAMINFO
        bw.put(0, 1)
        assert fi < 128
        bw.put(fi, 8)  # UTF-8 frame number (single byte)
        bw.put(bsz - 1, 16)
        bw.put(0, 8)   # header CRC-8 (decoder skips)
        if mode == "independent":
            for ch in range(nch):
                _flac_subframe(bw, [int(v) for v in blk[:, ch]], bps,
                               **plan(ch, fi))
        else:
            left = [int(v) for v in blk[:, 0]]
            right = [int(v) for v in blk[:, 1]]
            side = [l - r for l, r in zip(left, right)]
            if mode == "left_side":
                _flac_subframe(bw, left, bps, **plan(0, fi))
                _flac_subframe(bw, side, bps + 1, **plan(1, fi))
            elif mode == "right_side":
                _flac_subframe(bw, side, bps + 1, **plan(0, fi))
                _flac_subframe(bw, right, bps, **plan(1, fi))
            else:  # mid_side
                mid = [(l + r) >> 1 for l, r in zip(left, right)]
                _flac_subframe(bw, mid, bps, **plan(0, fi))
                _flac_subframe(bw, side, bps + 1, **plan(1, fi))
        bw.align()
        bw.put(0, 16)  # frame CRC-16 (decoder skips)
        out += bw.buf
    return bytes(out)


def test_flac_decoder_lossless_roundtrip():
    """FLAC decoder (round 10): spec-correct streams from the
    test-side encoder must decode to the EXACT original samples across
    every subframe type (constant / verbatim / fixed 0-4 / LPC),
    Rice and RICE2 residuals, multi-partition and escaped-raw
    partitions, wasted bits, every stereo decorrelation mode, and
    multi-frame streams."""
    import numpy as np

    from emr_trino_autoscale_spark.operators._flac import decode_flac_pcm

    rng = np.random.RandomState(42)
    n = 512
    t = np.arange(n)
    left = (3000 * np.sin(2 * np.pi * 440 * t / 8000)
            + rng.randint(-40, 41, size=n)).astype(np.int64)
    right = (2000 * np.sin(2 * np.pi * 554 * t / 8000)
             + rng.randint(-40, 41, size=n)).astype(np.int64)
    stereo = np.stack([left, right], axis=1)

    plans = [
        lambda ch, fi: {"kind": "verbatim"},
        lambda ch, fi: {"kind": ("fixed", 1), "part_order": 2},
        lambda ch, fi: {"kind": ("fixed", 2), "rice2": True},
        lambda ch, fi: {"kind": ("fixed", 4), "part_order": 1},
        lambda ch, fi: {"kind": ("fixed", 0), "escape": True},
        lambda ch, fi: {"kind": "lpc",
                        "lpc": ([1843, -821], 10, 12), "part_order": 2},
    ]
    for mode in ("independent", "left_side", "right_side", "mid_side"):
        for plan in plans:
            payload = _encode_flac(stereo, 8000, frame_size=256,
                                   mode=mode, plan=plan)
            got, rate, bps = decode_flac_pcm(payload)
            assert rate == 8000 and bps == 16
            assert np.array_equal(got, stereo), (mode, plan(0, 0))

    # constant + wasted bits + mono + odd tail frame
    mono = (np.repeat([1024, -2048, 512, 0], 100)[:, None]).astype(np.int64)
    payload = _encode_flac(
        mono, 16000, frame_size=128,
        plan=lambda ch, fi: {"kind": "verbatim", "wasted": 9},
    )
    got, rate, _bps = decode_flac_pcm(payload)
    assert np.array_equal(got, mono)
    const = np.full((300, 1), -7 << 3, dtype=np.int64)
    payload = _encode_flac(
        const, 8000, frame_size=256,
        plan=lambda ch, fi: {"kind": "constant", "wasted": 3},
    )
    got, _rate, _bps = decode_flac_pcm(payload)
    assert np.array_equal(got, const)


def test_flac_24bit_depth_and_transcode():
    """24-bit FLAC: exact sample round-trip (the 17/25-bit side
    channel widths ride the bps+1 rule), normalized features scale by
    1<<23, and transcode_wav reduces to 16-bit by arithmetic shift —
    so a 24-bit FLAC whose samples are 16-bit PCM << 8 transcodes to
    exactly that PCM."""
    import io
    import wave

    import numpy as np

    from emr_trino_autoscale_spark.operators._flac import decode_flac_pcm
    from emr_trino_autoscale_spark.operators.multimodal import (
        decode_wav_audio,
        transcode_wav,
    )

    rng = np.random.RandomState(3)
    n = 400
    pcm16 = np.stack([
        (7000 * np.sin(2 * np.pi * 250 * np.arange(n) / 8000)).astype(np.int64),
        rng.randint(-2000, 2000, size=n).astype(np.int64),
    ], axis=1)
    pcm24 = pcm16 << 8

    flac24 = _encode_flac(pcm24, 8000, frame_size=128, mode="mid_side",
                          plan=lambda ch, fi: {"kind": ("fixed", 2)},
                          bps=24)
    got, rate, bps = decode_flac_pcm(flac24)
    assert (rate, bps) == (8000, 24)
    assert np.array_equal(got, pcm24)

    wav = transcode_wav(flac24)
    with wave.open(io.BytesIO(wav), "rb") as w:
        assert (w.getframerate(), w.getnchannels(), w.getsampwidth()) == (8000, 2, 2)
        back = np.frombuffer(w.readframes(w.getnframes()), dtype="<i2")
    assert np.array_equal(back.reshape(-1, 2), pcm16)
    # features of the 24-bit FLAC equal the 16-bit WAV's (same
    # normalized samples: v<<8 over 1<<23 == v over 1<<15)
    assert decode_wav_audio(flac24) == decode_wav_audio(wav)


def test_flac_reserved_sample_size_code_raises():
    """Round-10 review: a frame header carrying the RESERVED sample
    size code 3 must raise (a guessed bps misaligns every later bit),
    not silently decode at the STREAMINFO depth. Bit surgery: the
    encoder's frame header starts right after the 42-byte
    fLaC+STREAMINFO prefix; byte 45 holds [ch_code(4) | ss(3) | r(1)]."""
    import numpy as np
    import pytest as _pytest

    from emr_trino_autoscale_spark.operators._flac import decode_flac_pcm

    mono = np.arange(64, dtype=np.int64).reshape(-1, 1)
    payload = bytearray(_encode_flac(mono, 8000, frame_size=64))
    assert payload[45] & 0x0E == 0  # encoder wrote ss_code 0
    payload[45] |= 3 << 1  # ss_code := 3 (reserved)
    with _pytest.raises(ValueError, match="reserved sample size"):
        decode_flac_pcm(bytes(payload))


def test_flac_frame_bps_mismatch_raises():
    """Round-10 ADVICE: a frame whose explicit sample-size code differs
    from STREAMINFO would decode at the frame depth while every caller
    normalizes by the STREAMINFO bps (silent amplitude mis-scale) —
    raise instead. A frame code that MATCHES STREAMINFO (code 4 =
    16-bit) stays a valid, byte-identical decode."""
    import numpy as np
    import pytest as _pytest

    from emr_trino_autoscale_spark.operators._flac import decode_flac_pcm

    mono = np.arange(64, dtype=np.int64).reshape(-1, 1)
    base = bytearray(_encode_flac(mono, 8000, frame_size=64))
    assert base[45] & 0x0E == 0  # encoder wrote ss_code 0

    mismatched = bytearray(base)
    mismatched[45] |= 1 << 1  # ss_code := 1 (8-bit) vs 16-bit stream
    with _pytest.raises(ValueError, match="frame bps"):
        decode_flac_pcm(bytes(mismatched))

    matching = bytearray(base)
    matching[45] |= 4 << 1  # ss_code := 4 (16-bit) == STREAMINFO
    got, rate, bps = decode_flac_pcm(bytes(matching))
    assert bps == 16 and np.array_equal(got[:, 0], np.arange(64))


def test_flac_truncation_raises_valueerror_never_indexerror():
    """Round-10 ADVICE: the bit reader indexes past a truncated buffer;
    the public decode must convert that to the module's ValueError
    contract ('FLAC: truncated stream'), never leak IndexError. Sweep
    every truncation point of a short two-frame stream: each prefix
    either decodes (possibly short) or raises ValueError."""
    import numpy as np
    import pytest as _pytest

    from emr_trino_autoscale_spark.operators._flac import decode_flac_pcm

    rng = np.random.RandomState(11)
    pcm = rng.randint(-(1 << 12), 1 << 12, size=(128, 2)).astype(np.int64)
    payload = _encode_flac(pcm, 8000, frame_size=64, mode="mid_side",
                           plan=lambda ch, fi: {"kind": ("fixed", 2)})
    saw_truncated = False
    for cut in range(4, len(payload)):
        try:
            decode_flac_pcm(payload[:cut])
        except ValueError as exc:
            saw_truncated = saw_truncated or "truncated" in str(exc)
        except Exception as exc:  # noqa: BLE001 — the contract under test
            _pytest.fail(
                f"cut={cut}: non-ValueError {type(exc).__name__}: {exc}"
            )
    assert saw_truncated  # at least one prefix ended mid-read


def test_flac_unknown_total_tolerates_trailing_bytes():
    """Round-10 ADVICE: when STREAMINFO total_samples is 0 (unknown),
    the frame loop can only stop on a failed sync match — trailing
    padding or an appended tag after the last frame is end-of-stream,
    not 'lost frame sync'. A corrupt FIRST sync must still raise."""
    import numpy as np
    import pytest as _pytest

    from emr_trino_autoscale_spark.operators._flac import decode_flac_pcm

    pcm = (np.arange(96, dtype=np.int64) % 17 - 8).reshape(-1, 1)
    payload = bytearray(_encode_flac(pcm, 8000, frame_size=48))
    # zero the 36-bit STREAMINFO total field (body bits 28-63 of the
    # rate/ch/bps/total 8-byte group at payload[18:26])
    payload[21] &= 0xF0
    payload[22:26] = b"\x00\x00\x00\x00"
    got, rate, bps = decode_flac_pcm(bytes(payload + b"\x00" * 8))
    assert np.array_equal(got[:, 0], pcm[:, 0])
    # appended non-zero tag bytes (no sync pattern) are tolerated too
    got2, _r, _b = decode_flac_pcm(bytes(payload + b"TAG!" * 3))
    assert np.array_equal(got2[:, 0], pcm[:, 0])
    # but a stream whose FIRST frame sync is corrupt still raises
    broken = bytearray(payload)
    broken[42] = 0x00  # clobber the first frame's sync byte
    with _pytest.raises(ValueError, match="lost frame sync"):
        decode_flac_pcm(bytes(broken))


def test_flac_feature_parity_with_wav():
    """A FLAC and a WAV of the SAME samples produce identical audio
    features, loudness profiles, and fingerprints (lossless decode +
    shared PCM parse) — the cross-codec audio near-dup case; the
    sniffer routes fLaC to the real decoder."""
    import io
    import wave

    import numpy as np

    from emr_trino_autoscale_spark.operators.multimodal import (
        afp64_wav,
        audio_profile_wav,
        decode_wav_audio,
        sniffing_decoder,
    )

    rng = np.random.RandomState(5)
    n = 4200  # >= 4000 so the fingerprint is defined
    t = np.arange(n)
    pcm = np.stack([
        (6000 * np.sin(2 * np.pi * 300 * t / 8000)).astype(np.int64),
        (4000 * np.sin(2 * np.pi * 520 * t / 8000)
         + rng.randint(-100, 101, size=n)).astype(np.int64),
    ], axis=1)

    buf = io.BytesIO()
    with wave.open(buf, "wb") as w:
        w.setnchannels(2)
        w.setsampwidth(2)
        w.setframerate(8000)
        w.writeframes(pcm.astype("<i2").tobytes())
    wav = buf.getvalue()
    flac = _encode_flac(pcm, 8000, frame_size=512, mode="mid_side",
                        plan=lambda ch, fi: {"kind": ("fixed", 2)})

    assert decode_wav_audio(flac) == decode_wav_audio(wav)
    assert audio_profile_wav(flac) == audio_profile_wav(wav)
    assert afp64_wav(flac) == afp64_wav(wav)
    assert afp64_wav(wav) is not None
    assert sniffing_decoder(flac, "audio") == decode_wav_audio(wav)


def test_transcode_audio_stage(spark):
    """Audio transcode stage (round 10): FLAC rows become canonical
    16-bit WAV payloads whose decode equals the direct FLAC decode
    exactly; WAV rows pass through idempotently; junk degrades to NULL
    rows — the transcode_images contract, audio twin."""
    import io
    import wave

    import numpy as np

    from emr_trino_autoscale_spark.operators.multimodal import (
        decode_wav_audio,
        transcode_audio,
    )

    t = np.arange(2000)
    pcm = np.stack([
        (5000 * np.sin(2 * np.pi * 200 * t / 8000)).astype(np.int64),
        (3000 * np.sin(2 * np.pi * 330 * t / 8000)).astype(np.int64),
    ], axis=1)
    flac = _encode_flac(pcm, 8000, frame_size=512, mode="left_side",
                        plan=lambda ch, fi: {"kind": ("fixed", 1)})
    buf = io.BytesIO()
    with wave.open(buf, "wb") as w:
        w.setnchannels(2)
        w.setsampwidth(2)
        w.setframerate(8000)
        w.writeframes(pcm.astype("<i2").tobytes())
    wav = buf.getvalue()

    df = spark.createDataFrame(
        [(1, bytearray(flac)), (2, bytearray(wav)), (3, bytearray(b"junk"))],
        "media_id long, payload binary",
    )
    rows = {r.media_id: r for r in transcode_audio(df).collect()}
    assert rows[1].src_format == "flac" and rows[2].src_format == "wav"
    assert rows[1].sample_rate == 8000 and rows[1].n_channels == 2
    assert bytes(rows[2].payload) == wav  # idempotent pass-through
    # canonical WAV of the FLAC decodes identically to the source PCM
    assert decode_wav_audio(bytes(rows[1].payload)) == decode_wav_audio(wav)
    assert rows[3].payload is None and rows[3].src_format is None


def test_sniffing_decoder_corrupt_payload_fuzz(spark=None):
    """The 100 TB corrupt-payload contract, fuzzed: single-byte
    corruptions and truncations of VALID payloads in every real-decode
    format (PPM/PNG/BMP/GIF/JPEG-baseline/JPEG-progressive/WAV/FLAC)
    must NEVER raise out of sniffing_decoder — each either still
    decodes (the flip hit a don't-care byte) or falls back to the
    8-float stub. One poisoned row must never abort an extract batch;
    the direct decoders may raise anything, the sniffer boundary is
    the contract."""
    import io
    import wave

    import numpy as np

    from emr_trino_autoscale_spark.operators.multimodal import sniffing_decoder

    rng = np.random.RandomState(77)
    rgb = rng.randint(0, 256, size=(9, 11, 3), dtype=np.uint8)
    pal = rng.randint(0, 256, size=(6, 3), dtype=np.uint8)
    idx = rng.randint(0, 6, size=(9, 11)).astype(np.int64)
    pcm = rng.randint(-3000, 3000, size=(600, 1)).astype(np.int64)
    buf = io.BytesIO()
    with wave.open(buf, "wb") as w:
        w.setnchannels(1)
        w.setsampwidth(2)
        w.setframerate(8000)
        w.writeframes(pcm.astype("<i2").tobytes())

    payloads = {
        "ppm": b"P6\n11 9\n255\n" + rgb.tobytes(),
        "png": _encode_png(rgb, color_type=2, interlace=True,
                           filters=[0, 1, 2, 3, 4]),
        "png4": _encode_png(idx.astype(np.uint8) % 16, color_type=0,
                            bit_depth=4, filters=[0, 1, 2, 3, 4]),
        "gif": _encode_gif_animation((11, 9), pal, [{"idx": idx}]),
        "jpeg": _encode_jpeg(rgb),
        "jpeg_prog": _encode_jpeg_progressive(rgb, ac_al=1),
        "jpeg_lossless": _encode_jpeg_lossless(rgb, predictor=4),
        "jpeg12": _encode_jpeg12(rgb.astype(np.float64) * 16.0),
        "bmp_rle8": _encode_bmp_rle(idx.astype(np.uint8), pal),
        "wav": buf.getvalue(),
        "flac": _encode_flac(pcm, 8000, frame_size=256,
                             plan=lambda ch, fi: {"kind": ("fixed", 2)}),
        "aiff": _encode_aiff(pcm, 8000, bits=16),
        "wav_ulaw": _encode_g711_wav(pcm, 8000, law="ulaw"),
        "tiff": _encode_tiff(rgb, packbits=True, rows_per_strip=3),
        "tiff_lzw": _encode_tiff(rgb, compression="lzw", predictor=2),
        "tiff_tiled": _encode_tiff(rgb, tiles=(8, 4), compression="lzw"),
        "tiff_planar": _encode_tiff(rgb, planar=2, compression="lzw",
                                    predictor=2),
        "tiff_deflate16": _encode_tiff(
            rgb.astype(np.uint16) << 8, bits=16, compression="deflate",
            predictor=2),
        "tiff_jpeg": _encode_tiff_jpeg(rgb, rows_per_strip=4,
                                       shared_tables=True),
        "tiff_g4": _encode_tiff_g4((rgb[..., 0] > 128).astype(np.uint8),
                                   rows_per_strip=3),
    }
    for name, good in payloads.items():
        kind = "audio" if name in ("wav", "flac") else "image"
        base = sniffing_decoder(good, kind)
        assert isinstance(base, list) and len(base) == 8, name
        for t in range(40):
            b = bytearray(good)
            if t % 4 == 0:  # truncation
                b = b[: int(rng.randint(1, len(b)))]
            else:  # single-byte corruption
                b[int(rng.randint(0, len(b)))] = int(rng.randint(0, 256))
            out = sniffing_decoder(bytes(b), kind)
            assert isinstance(out, list) and len(out) == 8, (name, t)
    # empty payloads fall through to the stub; None keeps its declared
    # NotImplementedError contract (the SURVEY X6 stub guard)
    for kind in ("image", "audio", "video"):
        assert len(sniffing_decoder(b"", kind)) == 8


_IMGDATA = os.path.join(os.path.dirname(__file__), "data", "imghdr")


def test_cross_format_decoders_agree_on_cpython_corpus():
    """All five image decoders against INDEPENDENTLY-produced files of
    the same 16x16 image (CPython's imghdr test data, PSF license —
    see tests/data/imghdr/README.md): PPM == PNG == BMP(BI_BITFIELDS
    V5) features exactly; GIF within its palette-quantization delta;
    baseline 4:2:0 JPEG within DCT quantization loss. This is the
    external ground truth the round-trip tests (self-encoded payloads)
    cannot provide."""
    from emr_trino_autoscale_spark.operators.multimodal import (
        decode_bmp_image,
        decode_gif_image,
        decode_jpeg_image,
        decode_png_image,
        decode_ppm_image,
    )

    def load(name):
        with open(os.path.join(_IMGDATA, name), "rb") as f:
            return f.read()

    ppm = decode_ppm_image(load("python.ppm"))
    assert decode_png_image(load("python.png")) == ppm
    assert decode_bmp_image(load("python.bmp")) == ppm
    gif = decode_gif_image(load("python.gif"))
    assert all(abs(a - b) < 0.03 for a, b in zip(gif, ppm))
    jpg = decode_jpeg_image(load("python.jpg"))
    assert all(abs(a - b) < 0.04 for a, b in zip(jpg, ppm))
    assert jpg[4:] == ppm[4:]  # dimensions exact


def _encode_jpeg(rgb, subsample=False, restart=0, quality_scale=1.0):
    """Minimal spec-correct baseline JPEG encoder (test-side): Annex K
    quant + Huffman tables, 4:4:4 or 4:2:0, optional DRI/RSTn — so the
    decoder is exercised against payloads it did not produce."""
    import struct

    import numpy as np

    from emr_trino_autoscale_spark.operators._jpeg import _A, ZIGZAG

    QY = np.array([
        16, 11, 10, 16, 24, 40, 51, 61, 12, 12, 14, 19, 26, 58, 60, 55,
        14, 13, 16, 24, 40, 57, 69, 56, 14, 17, 22, 29, 51, 87, 80, 62,
        18, 22, 37, 56, 68, 109, 103, 77, 24, 35, 55, 64, 81, 104, 113, 92,
        49, 64, 78, 87, 103, 121, 120, 101, 72, 92, 95, 98, 112, 100, 103, 99,
    ], dtype=np.float64).reshape(8, 8)
    QC = np.array([
        17, 18, 24, 47, 99, 99, 99, 99, 18, 21, 26, 66, 99, 99, 99, 99,
        24, 26, 56, 99, 99, 99, 99, 99, 47, 66, 99, 99, 99, 99, 99, 99,
        99, 99, 99, 99, 99, 99, 99, 99, 99, 99, 99, 99, 99, 99, 99, 99,
        99, 99, 99, 99, 99, 99, 99, 99, 99, 99, 99, 99, 99, 99, 99, 99,
    ], dtype=np.float64).reshape(8, 8)
    QY = np.clip(np.round(QY * quality_scale), 1, 255)
    QC = np.clip(np.round(QC * quality_scale), 1, 255)
    # Annex K Huffman specs: (counts, symbols)
    DC_L = ([0,1,5,1,1,1,1,1,1,0,0,0,0,0,0,0], list(range(12)))
    DC_C = ([0,3,1,1,1,1,1,1,1,1,1,0,0,0,0,0], list(range(12)))
    AC_L = ([0,2,1,3,3,2,4,3,5,5,4,4,0,0,1,0x7D], [
        0x01,0x02,0x03,0x00,0x04,0x11,0x05,0x12,0x21,0x31,0x41,0x06,0x13,0x51,0x61,
        0x07,0x22,0x71,0x14,0x32,0x81,0x91,0xA1,0x08,0x23,0x42,0xB1,0xC1,0x15,0x52,
        0xD1,0xF0,0x24,0x33,0x62,0x72,0x82,0x09,0x0A,0x16,0x17,0x18,0x19,0x1A,0x25,
        0x26,0x27,0x28,0x29,0x2A,0x34,0x35,0x36,0x37,0x38,0x39,0x3A,0x43,0x44,0x45,
        0x46,0x47,0x48,0x49,0x4A,0x53,0x54,0x55,0x56,0x57,0x58,0x59,0x5A,0x63,0x64,
        0x65,0x66,0x67,0x68,0x69,0x6A,0x73,0x74,0x75,0x76,0x77,0x78,0x79,0x7A,0x83,
        0x84,0x85,0x86,0x87,0x88,0x89,0x8A,0x92,0x93,0x94,0x95,0x96,0x97,0x98,0x99,
        0x9A,0xA2,0xA3,0xA4,0xA5,0xA6,0xA7,0xA8,0xA9,0xAA,0xB2,0xB3,0xB4,0xB5,0xB6,
        0xB7,0xB8,0xB9,0xBA,0xC2,0xC3,0xC4,0xC5,0xC6,0xC7,0xC8,0xC9,0xCA,0xD2,0xD3,
        0xD4,0xD5,0xD6,0xD7,0xD8,0xD9,0xDA,0xE1,0xE2,0xE3,0xE4,0xE5,0xE6,0xE7,0xE8,
        0xE9,0xEA,0xF1,0xF2,0xF3,0xF4,0xF5,0xF6,0xF7,0xF8,0xF9,0xFA])
    AC_C = ([0,2,1,2,4,4,3,4,7,5,4,4,0,1,2,0x77], [
        0x00,0x01,0x02,0x03,0x11,0x04,0x05,0x21,0x31,0x06,0x12,0x41,0x51,0x07,0x61,
        0x71,0x13,0x22,0x32,0x81,0x08,0x14,0x42,0x91,0xA1,0xB1,0xC1,0x09,0x23,0x33,
        0x52,0xF0,0x15,0x62,0x72,0xD1,0x0A,0x16,0x24,0x34,0xE1,0x25,0xF1,0x17,0x18,
        0x19,0x1A,0x26,0x27,0x28,0x29,0x2A,0x35,0x36,0x37,0x38,0x39,0x3A,0x43,0x44,
        0x45,0x46,0x47,0x48,0x49,0x4A,0x53,0x54,0x55,0x56,0x57,0x58,0x59,0x5A,0x63,
        0x64,0x65,0x66,0x67,0x68,0x69,0x6A,0x73,0x74,0x75,0x76,0x77,0x78,0x79,0x7A,
        0x82,0x83,0x84,0x85,0x86,0x87,0x88,0x89,0x8A,0x92,0x93,0x94,0x95,0x96,0x97,
        0x98,0x99,0x9A,0xA2,0xA3,0xA4,0xA5,0xA6,0xA7,0xA8,0xA9,0xAA,0xB2,0xB3,0xB4,
        0xB5,0xB6,0xB7,0xB8,0xB9,0xBA,0xC2,0xC3,0xC4,0xC5,0xC6,0xC7,0xC8,0xC9,0xCA,
        0xD2,0xD3,0xD4,0xD5,0xD6,0xD7,0xD8,0xD9,0xDA,0xE2,0xE3,0xE4,0xE5,0xE6,0xE7,
        0xE8,0xE9,0xEA,0xF2,0xF3,0xF4,0xF5,0xF6,0xF7,0xF8,0xF9,0xFA])

    def enc_table(counts, symbols):
        code, k, out = 0, 0, {}
        for ln in range(1, 17):
            for _ in range(counts[ln - 1]):
                out[symbols[k]] = (ln, code)
                code += 1
                k += 1
            code <<= 1
        return out

    h, w = rgb.shape[:2]
    r, g, b = (rgb[..., i].astype(np.float64) for i in range(3))
    y = 0.299 * r + 0.587 * g + 0.114 * b
    cb = 128.0 - 0.168736 * r - 0.331264 * g + 0.5 * b
    cr = 128.0 + 0.5 * r - 0.418688 * g - 0.081312 * b
    if subsample:
        # pad to even then 2x2 block-mean
        ph, pw = (h + 1) & ~1, (w + 1) & ~1
        def pad(p, hh, ww):
            out = np.empty((hh, ww))
            out[:p.shape[0], :p.shape[1]] = p
            out[p.shape[0]:, :p.shape[1]] = p[-1:]
            out[:, p.shape[1]:] = out[:, p.shape[1] - 1:p.shape[1]]
            return out
        cb = pad(cb, ph, pw).reshape(ph // 2, 2, pw // 2, 2).mean(axis=(1, 3))
        cr = pad(cr, ph, pw).reshape(ph // 2, 2, pw // 2, 2).mean(axis=(1, 3))
        factors = [(2, 2), (1, 1), (1, 1)]
    else:
        factors = [(1, 1), (1, 1), (1, 1)]
    planes = [y, cb, cr]
    hmax = max(f[0] for f in factors)
    vmax = max(f[1] for f in factors)
    mcux, mcuy = -(-w // (8 * hmax)), -(-h // (8 * vmax))

    # pre-pad every plane to its full MCU-covered extent by edge
    # replication so block extraction never sees an empty slice
    padded = []
    for ci, (fh, fv) in enumerate(factors):
        p = planes[ci]
        ww, hh = mcux * fh * 8, mcuy * fv * 8
        out_p = np.empty((hh, ww))
        out_p[:p.shape[0], :p.shape[1]] = p
        out_p[p.shape[0]:, :p.shape[1]] = p[-1:]
        out_p[:, p.shape[1]:] = out_p[:, p.shape[1] - 1:p.shape[1]]
        padded.append(out_p)
    planes = padded

    bitbuf = bytearray()
    acc, nbits = 0, 0

    def put(code, ln):
        nonlocal acc, nbits
        acc = (acc << ln) | code
        nbits += ln
        while nbits >= 8:
            byte = (acc >> (nbits - 8)) & 0xFF
            bitbuf.append(byte)
            if byte == 0xFF:
                bitbuf.append(0x00)
            nbits -= 8
        acc &= (1 << nbits) - 1

    def flush():
        nonlocal acc, nbits
        if nbits:
            put(0x7F >> (7 - (8 - nbits) + 1) if False else (1 << (8 - nbits)) - 1, 8 - nbits)

    dc_tabs = [enc_table(*DC_L), enc_table(*DC_C), enc_table(*DC_C)]
    ac_tabs = [enc_table(*AC_L), enc_table(*AC_C), enc_table(*AC_C)]
    qts = [QY, QC, QC]

    def mag(v):
        t = int(v).bit_length() if v > 0 else int(-v).bit_length()
        return t, (v if v >= 0 else v + (1 << t) - 1)

    preds = [0, 0, 0]
    mcu_count = 0
    rst = 0
    for my in range(mcuy):
        for mx in range(mcux):
            if restart and mcu_count and mcu_count % restart == 0:
                flush()
                bitbuf.extend(bytes([0xFF, 0xD0 + (rst % 8)]))
                rst += 1
                preds = [0, 0, 0]
            for ci, (fh, fv) in enumerate(factors):
                p = planes[ci]
                for by in range(fv):
                    for bx in range(fh):
                        y0 = (my * fv + by) * 8
                        x0 = (mx * fh + bx) * 8
                        blk = p[y0:y0 + 8, x0:x0 + 8]
                        coeff = _A.T @ (blk - 128.0) @ _A  # forward DCT
                        q = np.round(coeff / qts[ci]).astype(np.int64)
                        zz = q.reshape(-1)[ZIGZAG]
                        diff = int(zz[0]) - preds[ci]
                        preds[ci] = int(zz[0])
                        t, v = (0, 0) if diff == 0 else mag(diff)
                        ln, code = dc_tabs[ci][t]
                        put(code, ln)
                        if t:
                            put(v, t)
                        run = 0
                        for k in range(1, 64):
                            if zz[k] == 0:
                                run += 1
                                continue
                            while run > 15:
                                ln, code = ac_tabs[ci][0xF0]
                                put(code, ln)
                                run -= 16
                            t, v = mag(int(zz[k]))
                            ln, code = ac_tabs[ci][(run << 4) | t]
                            put(code, ln)
                            put(v, t)
                            run = 0
                        if run:
                            ln, code = ac_tabs[ci][0x00]
                            put(code, ln)
            mcu_count += 1
    flush()

    out = bytearray(b"\xff\xd8")
    for tid, q in ((0, QY), (1, QC)):
        zz = np.zeros(64, dtype=np.uint8)
        zz = q.reshape(-1)[ZIGZAG].astype(np.uint8)
        out += b"\xff\xdb" + struct.pack(">H", 67) + bytes([tid]) + zz.tobytes()
    out += b"\xff\xc0" + struct.pack(">HBHHB", 17, 8, h, w, 3)
    for ci, (fh, fv) in enumerate(factors):
        out += bytes([ci + 1, (fh << 4) | fv, 0 if ci == 0 else 1])
    for tc, tid, (counts, syms) in ((0, 0, DC_L), (0, 1, DC_C), (1, 0, AC_L), (1, 1, AC_C)):
        out += b"\xff\xc4" + struct.pack(">H", 19 + len(syms)) + bytes([(tc << 4) | tid])
        out += bytes(counts) + bytes(syms)
    if restart:
        out += b"\xff\xdd" + struct.pack(">HH", 4, restart)
    out += b"\xff\xda" + struct.pack(">HB", 12, 3)
    for ci in range(3):
        out += bytes([ci + 1, (0 << 4) | 0 if ci == 0 else (1 << 4) | 1])
    out += bytes([0, 63, 0])
    out += bitbuf + b"\xff\xd9"
    return bytes(out)


def _jpeg_plan(rgb, subsample=False, quality_scale=1.0):
    """Shared front half of the test-side encoders: color transform,
    MCU padding, forward DCT, quantization. Returns (zz, factors, QY,
    QC, h, w) with zz[ci] an (nby, nbx, 64) int64 array of
    zigzag-ordered quantized coefficients over the MCU-padded grid —
    the SAME array baseline and progressive scans serialize, which is
    what makes the cross-mode bit-exactness test meaningful."""
    import numpy as np

    from emr_trino_autoscale_spark.operators._jpeg import _A, ZIGZAG

    QY = np.array([
        16, 11, 10, 16, 24, 40, 51, 61, 12, 12, 14, 19, 26, 58, 60, 55,
        14, 13, 16, 24, 40, 57, 69, 56, 14, 17, 22, 29, 51, 87, 80, 62,
        18, 22, 37, 56, 68, 109, 103, 77, 24, 35, 55, 64, 81, 104, 113, 92,
        49, 64, 78, 87, 103, 121, 120, 101, 72, 92, 95, 98, 112, 100, 103, 99,
    ], dtype=np.float64).reshape(8, 8)
    QC = np.array([
        17, 18, 24, 47, 99, 99, 99, 99, 18, 21, 26, 66, 99, 99, 99, 99,
        24, 26, 56, 99, 99, 99, 99, 99, 47, 66, 99, 99, 99, 99, 99, 99,
        99, 99, 99, 99, 99, 99, 99, 99, 99, 99, 99, 99, 99, 99, 99, 99,
        99, 99, 99, 99, 99, 99, 99, 99, 99, 99, 99, 99, 99, 99, 99, 99,
    ], dtype=np.float64).reshape(8, 8)
    QY = np.clip(np.round(QY * quality_scale), 1, 255)
    QC = np.clip(np.round(QC * quality_scale), 1, 255)

    h, w = rgb.shape[:2]
    r, g, b = (rgb[..., i].astype(np.float64) for i in range(3))
    y = 0.299 * r + 0.587 * g + 0.114 * b
    cb = 128.0 - 0.168736 * r - 0.331264 * g + 0.5 * b
    cr = 128.0 + 0.5 * r - 0.418688 * g - 0.081312 * b
    if subsample:
        ph, pw = (h + 1) & ~1, (w + 1) & ~1

        def pad(p, hh, ww):
            out = np.empty((hh, ww))
            out[:p.shape[0], :p.shape[1]] = p
            out[p.shape[0]:, :p.shape[1]] = p[-1:]
            out[:, p.shape[1]:] = out[:, p.shape[1] - 1:p.shape[1]]
            return out

        cb = pad(cb, ph, pw).reshape(ph // 2, 2, pw // 2, 2).mean(axis=(1, 3))
        cr = pad(cr, ph, pw).reshape(ph // 2, 2, pw // 2, 2).mean(axis=(1, 3))
        factors = [(2, 2), (1, 1), (1, 1)]
    else:
        factors = [(1, 1), (1, 1), (1, 1)]
    planes = [y, cb, cr]
    hmax = max(f[0] for f in factors)
    vmax = max(f[1] for f in factors)
    mcux, mcuy = -(-w // (8 * hmax)), -(-h // (8 * vmax))
    qts = [QY, QC, QC]

    zz = []
    for ci, (fh, fv) in enumerate(factors):
        p = planes[ci]
        ww, hh = mcux * fh * 8, mcuy * fv * 8
        out_p = np.empty((hh, ww))
        out_p[:p.shape[0], :p.shape[1]] = p
        out_p[p.shape[0]:, :p.shape[1]] = p[-1:]
        out_p[:, p.shape[1]:] = out_p[:, p.shape[1] - 1:p.shape[1]]
        nby, nbx = hh // 8, ww // 8
        blocks = out_p.reshape(nby, 8, nbx, 8).transpose(0, 2, 1, 3) - 128.0
        coeff = np.einsum("ux,bcxy,yv->bcuv", _A.T, blocks, _A)
        q = np.round(coeff / qts[ci]).astype(np.int64)
        zz.append(q.reshape(nby, nbx, 64)[:, :, ZIGZAG])
    return zz, factors, QY, QC, h, w


class _JBits:
    """Test-side MSB-first bit writer with 0xFF00 stuffing."""

    def __init__(self):
        self.buf = bytearray()
        self.acc = 0
        self.n = 0

    def put(self, code, ln):
        self.acc = (self.acc << ln) | (code & ((1 << ln) - 1) if ln else 0)
        self.n += ln
        while self.n >= 8:
            byte = (self.acc >> (self.n - 8)) & 0xFF
            self.buf.append(byte)
            if byte == 0xFF:
                self.buf.append(0x00)
            self.n -= 8
        self.acc &= (1 << self.n) - 1

    def flush(self):
        if self.n:
            self.put((1 << (8 - self.n)) - 1, 8 - self.n)


def _jpeg_mag(v):
    t = int(v).bit_length() if v > 0 else int(-v).bit_length()
    return t, (v if v >= 0 else v + (1 << t) - 1)


def _encode_jpeg_progressive(rgb, subsample=False, ac_al=0, restart=0,
                             bands=None, dc_al=1):
    """Test-side PROGRESSIVE JPEG encoder (T.81 Annex G, SOF2) so the
    decoder's progressive paths are exercised against payloads it did
    not produce. Scan script: interleaved DC first (Al=1) [with
    optional DRI/RSTn], per-component AC first scans at Al=ac_al with
    comp 0's band split (1-5, 6-63) for spectral-selection coverage,
    DC refinement (Ah=1, Al=0), and — when ac_al=1 — per-component AC
    refinement scans (Ah=1, Al=0) with EOB-run deferral and buffered
    correction bits. Every AC scan carries its own DHT built from the
    symbols it actually emits (per-scan table redefinition, and the
    only way to get EOBn run symbols — Annex K's baseline AC tables
    don't include them)."""
    import struct

    import numpy as np

    zz, factors, QY, QC, h, w = _jpeg_plan(rgb, subsample)
    ncomp = len(zz)
    DC_L = ([0, 1, 5, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0, 0, 0], list(range(12)))
    DC_C = ([0, 3, 1, 1, 1, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0], list(range(12)))

    def enc_table(counts, symbols):
        code, k, out = 0, 0, {}
        for ln in range(1, 17):
            for _ in range(counts[ln - 1]):
                out[symbols[k]] = (ln, code)
                code += 1
                k += 1
            code <<= 1
        return out

    def dht_seg(tc, tid, counts, syms):
        return (b"\xff\xc4" + struct.pack(">H", 19 + len(syms))
                + bytes([(tc << 4) | tid]) + bytes(counts) + bytes(syms))

    def sos_seg(comp_specs, ss, se, ah, al):
        out = b"\xff\xda" + struct.pack(">HB", 6 + 2 * len(comp_specs),
                                        len(comp_specs))
        for cid, dc_t, ac_t in comp_specs:
            out += bytes([cid, (dc_t << 4) | ac_t])
        return out + bytes([ss, se, (ah << 4) | al])

    out = bytearray(b"\xff\xd8")
    for tid, q in ((0, QY), (1, QC)):
        from emr_trino_autoscale_spark.operators._jpeg import ZIGZAG
        out += (b"\xff\xdb" + struct.pack(">H", 67) + bytes([tid])
                + q.reshape(-1)[ZIGZAG].astype(np.uint8).tobytes())
    out += b"\xff\xc2" + struct.pack(">HBHHB", 8 + 3 * ncomp, 8, h, w, ncomp)
    for ci, (fh, fv) in enumerate(factors):
        out += bytes([ci + 1, (fh << 4) | fv, 0 if ci == 0 else 1])
    out += dht_seg(0, 0, *DC_L) + dht_seg(0, 1, *DC_C)
    if restart:
        out += b"\xff\xdd" + struct.pack(">HH", 4, restart)
    dc_tabs = [enc_table(*DC_L), enc_table(*DC_C), enc_table(*DC_C)]

    # non-interleaved AC scans cover the component's OWN block grid,
    # not the MCU-padded one (T.81 A.2.2) — padded blocks stay DC-only
    hmax = max(f[0] for f in factors)
    vmax = max(f[1] for f in factors)
    grids = []
    for fh, fv in factors:
        cw = -(-(w * fh) // hmax)
        ch = -(-(h * fv) // vmax)
        grids.append((-(-ch // 8), -(-cw // 8)))

    # ---- scan 1: DC first, interleaved, Al=1 ----
    bw = _JBits()
    preds = [0] * ncomp
    mcuy, mcux = zz[0].shape[0] // factors[0][1], zz[0].shape[1] // factors[0][0]
    mcu_count = 0
    rst = 0
    for my in range(mcuy):
        for mx in range(mcux):
            if restart and mcu_count and mcu_count % restart == 0:
                bw.flush()
                bw.buf.extend(bytes([0xFF, 0xD0 + (rst % 8)]))
                rst += 1
                preds = [0] * ncomp
            for ci, (fh, fv) in enumerate(factors):
                for by in range(fv):
                    for bx in range(fh):
                        v = int(zz[ci][my * fv + by, mx * fh + bx, 0]) >> dc_al
                        diff = v - preds[ci]
                        preds[ci] = v
                        t, vb = (0, 0) if diff == 0 else _jpeg_mag(diff)
                        ln, code = dc_tabs[min(ci, 1)][t]
                        bw.put(code, ln)
                        if t:
                            bw.put(vb, t)
            mcu_count += 1
    bw.flush()
    out += sos_seg([(ci + 1, 0 if ci == 0 else 1, 0) for ci in range(ncomp)],
                   0, 0, 0, dc_al)
    out += bw.buf
    if restart:
        # DRI applies to every later scan until redefined (T.81 B.2.4.4)
        # — this encoder only restarts the DC scan, so switch it off
        out += b"\xff\xdd" + struct.pack(">HH", 4, 0)

    # ---- AC first scans (two-pass: collect symbols -> DHT -> emit) ----
    def ac_first_ops(ci, ss, se, al):
        ops = []  # ("sym", s) | ("raw", value, nbits)
        eobrun = 0

        def flush_eob():
            nonlocal eobrun
            if eobrun:
                r = eobrun.bit_length() - 1
                ops.append(("sym", r << 4))
                if r:
                    ops.append(("raw", eobrun - (1 << r), r))
                eobrun = 0

        nby, nbx = grids[ci]
        for by in range(nby):
            for bx in range(nbx):
                blk = zz[ci][by, bx]
                vals = [
                    (1 if int(blk[k]) >= 0 else -1)
                    * (abs(int(blk[k])) >> al)
                    for k in range(ss, se + 1)
                ]
                last = max((i for i, v in enumerate(vals) if v), default=-1)
                if last < 0:
                    eobrun += 1
                    if eobrun == 0x7FFF:
                        flush_eob()
                    continue
                flush_eob()
                run = 0
                for i in range(last + 1):
                    v = vals[i]
                    if v == 0:
                        run += 1
                        continue
                    while run > 15:
                        ops.append(("sym", 0xF0))
                        run -= 16
                    t, vb = _jpeg_mag(v)
                    ops.append(("sym", (run << 4) | t))
                    ops.append(("raw", vb, t))
                    run = 0
                if last < se - ss:
                    eobrun += 1
        flush_eob()
        return ops

    def ac_refine_ops(ci, ss, se, al):
        """Position-exact Annex G.2.2 refinement emission: the stream
        is generated in exactly the order the decoder consumes it —
        corrections interleaved by coefficient position, EOB runs
        deferred with their buffered correction bits."""
        ops = []
        eobrun = 0
        ebuf: list[int] = []

        def flush_eob():
            nonlocal eobrun, ebuf
            if eobrun:
                r = eobrun.bit_length() - 1
                ops.append(("sym", r << 4))
                if r:
                    ops.append(("raw", eobrun - (1 << r), r))
                for bit in ebuf:
                    ops.append(("raw", bit, 1))
                eobrun = 0
                ebuf = []

        nby, nbx = grids[ci]
        for by in range(nby):
            for bx in range(nbx):
                blk = zz[ci][by, bx]
                mag = [abs(int(blk[k])) >> al for k in range(ss, se + 1)]
                sgn = [int(blk[k]) >= 0 for k in range(ss, se + 1)]
                newpos = [i for i, m in enumerate(mag) if m == 1]
                n = len(mag)
                if not newpos:
                    ebuf.extend(m & 1 for m in mag if m > 1)
                    eobrun += 1
                    if eobrun == 0x7FFF:
                        flush_eob()
                    continue
                flush_eob()
                k = 0
                for p in newpos:
                    while sum(1 for q in range(k, p) if mag[q] == 0) > 15:
                        ops.append(("sym", 0xF0))
                        z = 0
                        while z < 16:
                            if mag[k] > 1:
                                ops.append(("raw", mag[k] & 1, 1))
                            else:
                                z += 1
                            k += 1
                    r = sum(1 for q in range(k, p) if mag[q] == 0)
                    ops.append(("sym", (r << 4) | 1))
                    ops.append(("raw", 1 if sgn[p] else 0, 1))
                    for q in range(k, p):
                        if mag[q] > 1:
                            ops.append(("raw", mag[q] & 1, 1))
                    k = p + 1
                if k < n:
                    ebuf.extend(mag[q] & 1 for q in range(k, n) if mag[q] > 1)
                    eobrun += 1
        flush_eob()
        return ops

    def emit_ac_scan(ci, ss, se, ah, al, ops):
        nonlocal out
        syms = sorted({s for kind, *rest in ops if kind == "sym"
                       for s in [rest[0]]})
        # canonical table: all used symbols at one length L with
        # 2^L > n so the all-ones code stays unused (T.81 C.2)
        ln = max(len(syms).bit_length(), 2)
        if (1 << ln) <= len(syms):
            ln += 1
        counts = [0] * 16
        counts[ln - 1] = len(syms)
        tab = enc_table(counts, syms)
        out += dht_seg(1, 0, counts, syms)
        out += sos_seg([(ci + 1, 0, 0)], ss, se, ah, al)
        bw2 = _JBits()
        for kind, *rest in ops:
            if kind == "sym":
                ln2, code = tab[rest[0]]
                bw2.put(code, ln2)
            else:
                bw2.put(rest[0], rest[1])
        bw2.flush()
        out += bw2.buf

    # default scan script: luma band split (1-5, 6-63), chroma whole-band;
    # `bands` overrides with an arbitrary per-component band partition
    if bands is None:
        bands = {0: [(1, 5), (6, 63)]}
    for ci in range(ncomp):
        for ss, se in bands.get(ci, [(1, 63)]):
            emit_ac_scan(ci, ss, se, 0, ac_al, ac_first_ops(ci, ss, se, ac_al))

    # ---- DC refinement: one raw bit per block per level, interleaved
    # (multi-level successive approximation when dc_al > 1) ----
    for lvl in range(dc_al, 0, -1):
        bw3 = _JBits()
        for my in range(mcuy):
            for mx in range(mcux):
                for ci, (fh, fv) in enumerate(factors):
                    for by in range(fv):
                        for bx in range(fh):
                            bw3.put(
                                (int(zz[ci][my * fv + by, mx * fh + bx, 0])
                                 >> (lvl - 1)) & 1,
                                1,
                            )
        bw3.flush()
        out += sos_seg([(ci + 1, 0, 0) for ci in range(ncomp)],
                       0, 0, lvl, lvl - 1)
        out += bw3.buf

    # AC refinement scans complete the successive approximation, one
    # bit level per scan (Ah = level, Al = level - 1) — multi-level
    # ac_al exercises repeated refinement of the same coefficients
    for lvl in range(ac_al, 0, -1):
        for ci in range(ncomp):
            for ss, se in bands.get(ci, [(1, 63)]):
                emit_ac_scan(ci, ss, se, lvl, lvl - 1,
                             ac_refine_ops(ci, ss, se, lvl - 1))

    out += b"\xff\xd9"
    return bytes(out)


def test_jpeg_roundtrip_444_420_and_restarts():
    """JPEG decoder vs a test-side spec encoder (Annex K tables):
    4:4:4, 4:2:0 with odd dimensions (MCU padding), and DRI/RSTn
    restart intervals. DCT quantization is lossy, so the pin is pixel
    RMSE against the source, not exactness — tight enough (< 0.04)
    that any Huffman/zigzag/dequant/IDCT/upsampling defect fails
    loudly (bugs produce garbage, not small noise)."""
    import numpy as np

    from emr_trino_autoscale_spark.operators._jpeg import decode_jpeg_rgb

    rng = np.random.RandomState(5)
    # smooth image: quantization error stays small and structured
    xx, yy = np.meshgrid(np.linspace(0, 1, 24), np.linspace(0, 1, 17))
    rgb = np.dstack([
        128 + 90 * np.sin(3 * xx) * np.cos(2 * yy),
        128 + 80 * xx,
        128 + 70 * yy,
    ]).clip(0, 255).astype(np.uint8)

    for kwargs in ({}, {"subsample": True}, {"restart": 2},
                   {"subsample": True, "restart": 3}):
        payload = _encode_jpeg(rgb, **kwargs)
        got = decode_jpeg_rgb(payload)
        assert got.shape == (17, 24, 3)
        rmse = float(np.sqrt(((got - rgb / 255.0) ** 2).mean()))
        assert rmse < 0.04, (kwargs, rmse)

    # sharp random noise through 4:4:4 still bounded by quant tables
    noise = rng.randint(0, 256, size=(16, 16, 3), dtype=np.uint8)
    got = decode_jpeg_rgb(_encode_jpeg(noise))
    rmse = float(np.sqrt(((got - noise / 255.0) ** 2).mean()))
    assert rmse < 0.2


def test_jpeg_progressive_matches_baseline_bit_exact():
    """Progressive decode (round 10) vs baseline decode of the SAME
    quantized coefficients (_jpeg_plan is the shared front half of
    both test-side encoders): two completely different entropy paths —
    spectral-selection bands, successive approximation, EOB runs,
    buffered refinement correction bits, interleaved DC + non-
    interleaved AC block orders, per-scan DHT redefinition — must
    reconstruct IDENTICAL coefficient arrays, so the decoded pixels
    must match BIT-EXACTLY (same dequant + IDCT tail). Covers 4:4:4
    and 4:2:0 with odd dimensions (MCU-padded blocks are DC-only in
    the progressive stream — T.81 A.2.2 non-interleaved grids), AC
    successive approximation on/off, and DRI/RSTn inside a progressive
    DC scan."""
    import numpy as np

    from emr_trino_autoscale_spark.operators._jpeg import decode_jpeg_rgb

    rng = np.random.RandomState(11)
    xx, yy = np.meshgrid(np.linspace(0, 1, 24), np.linspace(0, 1, 17))
    smooth = np.dstack([
        128 + 90 * np.sin(3 * xx) * np.cos(2 * yy),
        128 + 80 * xx,
        128 + 70 * yy,
    ]).clip(0, 255).astype(np.uint8)
    noise = rng.randint(0, 256, size=(16, 16, 3), dtype=np.uint8)

    for rgb, kwargs in (
        (smooth, {}),
        (smooth, {"subsample": True}),
        (smooth, {"ac_al": 1}),
        (smooth, {"subsample": True, "ac_al": 1}),
        (smooth, {"restart": 2}),
        (noise, {"ac_al": 1}),  # dense spectrum: exercises ZRL + runs
    ):
        base = decode_jpeg_rgb(
            _encode_jpeg(rgb, subsample=kwargs.get("subsample", False))
        )
        prog = decode_jpeg_rgb(_encode_jpeg_progressive(rgb, **kwargs))
        assert prog.shape == base.shape
        assert np.array_equal(prog, base), kwargs
        # and both still resemble the source (guards against a shared
        # front-half bug making "equal garbage")
        rmse = float(np.sqrt(((prog - rgb / 255.0) ** 2).mean()))
        assert rmse < 0.2, (kwargs, rmse)


def test_jpeg_progressive_randomized_scan_scripts():
    """Fuzz the Annex G paths with randomized scan scripts: random
    spectral-band partitions of 1..63 per component and successive-
    approximation depth up to Al=2 (two refinement passes over the
    same coefficients). Every script must reconstruct the exact
    coefficient array, so every decode must equal the baseline decode
    bit-for-bit. 12 seeds x (444/420) keeps it under a few seconds
    while covering band edges (width-1 bands, band ending at 63) and
    multi-level refinement."""
    import numpy as np

    from emr_trino_autoscale_spark.operators._jpeg import decode_jpeg_rgb

    for seed in range(12):
        rng = np.random.RandomState(100 + seed)
        hh, ww = int(rng.randint(9, 25)), int(rng.randint(9, 25))
        rgb = rng.randint(0, 256, size=(hh, ww, 3), dtype=np.uint8)
        subsample = bool(seed % 2)
        ac_al = int(rng.randint(0, 3))
        dc_al = int(rng.randint(1, 3))  # multi-level DC refinement too

        def rand_bands(r):
            cuts = sorted(set(
                [1, 64] + list(r.randint(2, 64, size=r.randint(0, 4)))
            ))
            return [(cuts[i], cuts[i + 1] - 1) for i in range(len(cuts) - 1)]

        bands = {ci: rand_bands(rng) for ci in range(3)}
        base = decode_jpeg_rgb(_encode_jpeg(rgb, subsample=subsample))
        prog = decode_jpeg_rgb(_encode_jpeg_progressive(
            rgb, subsample=subsample, ac_al=ac_al, bands=bands, dc_al=dc_al
        ))
        assert np.array_equal(prog, base), (seed, ac_al, dc_al, bands)


def test_jpeg_progressive_multimodal_integration():
    """The sniffing decoder routes SOF2 payloads to the real decoder
    now: a progressive re-encode of an image must produce the same
    features/signature as its baseline twin (the cross-codec near-dup
    case — same bits out, so aHash agrees exactly)."""
    import numpy as np

    from emr_trino_autoscale_spark.operators.multimodal import (
        decode_jpeg_image,
        sniffing_decoder,
    )

    xx, yy = np.meshgrid(np.linspace(0, 1, 24), np.linspace(0, 1, 17))
    rgb = np.dstack([
        128 + 90 * np.sin(3 * xx), 128 + 80 * xx, 128 + 70 * yy,
    ]).clip(0, 255).astype(np.uint8)
    base = _encode_jpeg(rgb)
    prog = _encode_jpeg_progressive(rgb)
    assert sniffing_decoder(prog, "image") == decode_jpeg_image(prog)
    assert decode_jpeg_image(prog) == decode_jpeg_image(base)


def test_jpeg_fill_bytes_between_segments():
    """T.81 B.1.1.2 allows any number of 0xFF fill bytes before a
    marker code; a padded stream must decode to the same pixels as the
    unpadded one instead of mis-parsing the fill byte as a marker and
    falling back to the stub (ADVICE r9)."""
    import numpy as np

    from emr_trino_autoscale_spark.operators._jpeg import decode_jpeg_rgb

    xx, yy = np.meshgrid(np.linspace(0, 1, 24), np.linspace(0, 1, 17))
    rgb = np.dstack([
        128 + 90 * np.sin(3 * xx), 128 + 80 * xx, 128 + 70 * yy,
    ]).clip(0, 255).astype(np.uint8)
    payload = _encode_jpeg(rgb)
    # pad every inter-segment boundary that precedes a DQT/DHT/SOF/SOS
    # marker with fill bytes: insert after SOI and before SOS
    padded = payload[:2] + b"\xff\xff" + payload[2:]
    i = padded.find(b"\xff\xda")
    assert i > 0
    padded = padded[:i] + b"\xff\xff\xff" + padded[i:]
    got = decode_jpeg_rgb(padded)
    want = decode_jpeg_rgb(payload)
    assert np.array_equal(got, want)


def test_jpeg_refuses_malformed_progressive_and_sniffs():
    """Round-10 update: REAL progressive streams decode now (see
    test_jpeg_progressive_matches_baseline_bit_exact); a baseline
    stream whose SOF0 is merely flipped to SOF2 is MALFORMED
    progressive (its single scan has Ss=0, Se=63 — an illegal DC-scan
    header per T.81 G.1) and must still raise so sniffing_decoder
    falls back to the stub instead of mis-decoding."""
    import struct

    import pytest as _pytest

    from emr_trino_autoscale_spark.operators.multimodal import (
        _decode_stub,
        decode_jpeg_image,
        sniffing_decoder,
    )

    with open(os.path.join(_IMGDATA, "python.jpg"), "rb") as f:
        good = f.read()
    assert sniffing_decoder(good, "image") == decode_jpeg_image(good)

    # flip SOF0 -> SOF2 (progressive) in a copy
    i = good.find(b"\xff\xc0")
    assert i > 0
    prog = good[:i] + b"\xff\xc2" + good[i + 2:]
    with _pytest.raises(ValueError):
        decode_jpeg_image(prog)
    assert sniffing_decoder(prog, "image") == _decode_stub(prog, "image")


def test_perceptual_hashes_cross_format():
    """Round 9: the perceptual-hash family accepts every REAL-decodable
    format via the sniffing gray parse. Lossless re-encodings of the
    same pixels (PPM/PNG/BMP) produce IDENTICAL aHash and dHash;
    lossy/quantized re-encodings (GIF palette, 4:2:0 JPEG of a 16x16
    source — worst case: every pixel sits in a quantized block) land
    within a small Hamming distance, exactly the cross-codec near-dup
    signal the signature family exists to surface. PPM hashes are
    bit-identical to the pre-round-9 parser (same fast path), so the
    declared q103/q122/q184 oracles are unaffected."""
    from emr_trino_autoscale_spark.operators.multimodal import (
        ahash64_ppm,
        dhash64_ppm,
    )

    def load(name):
        with open(os.path.join(_IMGDATA, name), "rb") as f:
            return f.read()

    def ham(x, y):
        return bin((x ^ y) & ((1 << 64) - 1)).count("1")

    names = ["python.ppm", "python.png", "python.bmp", "python.gif", "python.jpg"]
    a = {n: ahash64_ppm(load(n)) for n in names}
    d = {n: dhash64_ppm(load(n)) for n in names}
    assert None not in a.values() and None not in d.values()
    assert a["python.ppm"] == a["python.png"] == a["python.bmp"]
    assert d["python.ppm"] == d["python.png"] == d["python.bmp"]
    assert ham(a["python.ppm"], a["python.gif"]) <= 6
    assert ham(d["python.ppm"], d["python.gif"]) <= 6
    # 16x16 4:2:0 JPEG is the quantization worst case; bound loosely
    assert ham(a["python.ppm"], a["python.jpg"]) <= 12
    assert ham(d["python.ppm"], d["python.jpg"]) <= 16


def test_transcode_images_mixed_codec_corpus(spark):
    """X6 transcode stage (round 9): a mixed-codec frame (PNG, BMP,
    GIF, JPEG, PPM, garbage) normalizes to canonical P6 PPM payloads
    through the Arrow mapInPandas projection — lossless sources
    pixel-exact (their PPM re-decode equals the PPM ground truth),
    JPEG within quantization loss, garbage degraded to NULL row values
    with the batch intact. Downstream proof: aHash over the transcoded
    frame equals aHash over the originals (the sniffing parse and the
    canonical form agree)."""
    from emr_trino_autoscale_spark.operators.multimodal import (
        ahash64_ppm,
        decode_ppm_image,
        transcode_images,
    )

    def load(name):
        with open(os.path.join(_IMGDATA, name), "rb") as f:
            return f.read()

    rows = [
        (0, load("python.ppm")), (1, load("python.png")),
        (2, load("python.bmp")), (3, load("python.gif")),
        (4, load("python.jpg")), (5, b"not an image"),
    ]
    df = spark.createDataFrame(rows, "media_id long, payload binary")
    out = {r.media_id: r for r in transcode_images(df).collect()}
    assert len(out) == 6
    want = decode_ppm_image(load("python.ppm"))
    for mid, fmt in ((0, "ppm"), (1, "png"), (2, "bmp")):
        r = out[mid]
        assert r.src_format == fmt and (r.width, r.height) == (16, 16)
        assert decode_ppm_image(bytes(r.payload)) == want
    assert out[4].src_format == "jpeg"
    jf = decode_ppm_image(bytes(out[4].payload))
    assert all(abs(a - b) < 0.04 for a, b in zip(jf, want))
    assert out[5].payload is None and out[5].src_format is None
    # downstream agreement: hash of transcoded == hash of original
    for mid, name in ((1, "python.png"), (2, "python.bmp"), (4, "python.jpg")):
        assert ahash64_ppm(bytes(out[mid].payload)) == ahash64_ppm(load(name))


def test_degenerate_inputs_never_crash_ansi(spark):
    """Round-9 degenerate-input sweep under ANSI mode (the q139 Welch
    crash's bug class): single-class AUC groups, all-tied Spearman rank
    columns, and zero-variance Welch samples emit NULL for the
    undefined statistic instead of raising DIVIDE_BY_ZERO and killing
    the job — one bad slice in a 100 TB grouped run must not abort the
    other million groups. Healthy groups in the SAME frame keep their
    values (the guard is per-group, not global)."""
    from emr_trino_autoscale_spark.operators import stats as st

    auc_df = spark.createDataFrame(
        [("one_class", 0.5, 1), ("one_class", 0.7, 1), ("one_class", 0.2, 1),
         ("ok", 0.9, 1), ("ok", 0.8, 1), ("ok", 0.1, 0)],
        "g string, score double, label int",
    )
    auc = {r.g: (r.n, r.n_pos, r.auc)
           for r in st.grouped_auc(auc_df, "g", "score", "label").collect()}
    assert auc["one_class"] == (3, 3, None)
    assert auc["ok"][2] == 1.0  # both positives outrank the negative

    sp_df = spark.createDataFrame(
        [("tied_x", 1.0, float(v)) for v in (1, 2, 3)]
        + [("ok", 1.0, 1.0), ("ok", 2.0, 2.0), ("ok", 3.0, 3.0)],
        "g string, x double, y double",
    )
    sp = {r.g: (r.n, r.rho)
          for r in st.spearman_corr(sp_df, "g", "x", "y").collect()}
    assert sp["tied_x"] == (3, None)
    assert abs(sp["ok"][1] - 1.0) < 1e-12

    w = st.welch_t_test(
        spark.createDataFrame(
            [("a", 5.0)] * 3 + [("b", 7.0)] * 3, "g string, v double"
        ),
        "g", "v", "a", "b",
    ).collect()[0]
    assert (w["t_stat"], w["df"]) == (None, None)
    assert (w["mean_a"], w["mean_b"]) == (5.0, 7.0)

    # dataset_card on an EMPTY corpus (round-10 review): the release
    # gate cards a filtered corpus, and a gate that drops everything
    # must yield the one-row all-zero card, not 0/0 or zero rows
    from emr_trino_autoscale_spark.operators.text import dataset_card

    empty = spark.createDataFrame(
        [], "doc_id long, text string, lang string, source string, n_chars long"
    )
    card = dataset_card(empty).collect()
    assert len(card) == 1
    r = card[0]
    assert (r.n_docs, r.n_unique_texts, r.n_tokens) == (0, 0, None)
    assert r.dup_rate is None and r.median_tokens is None


def test_url_canonicalize_cases(spark):
    """X162: RFC 3986 syntax-based normalization — case, default
    ports, userinfo, fragments, tracking params, param ordering,
    trailing host dot, empty path — all collapse to one canonical
    form; non-default ports and real params survive; malformed URLs
    canonicalize to NULL (the quarantine contract)."""
    from pyspark.sql import functions as F

    from emr_trino_autoscale_spark.operators.text import (
        url_canonicalize,
        url_domain,
    )

    cases = [
        # (input, canonical, domain)
        ("https://www.site.com/a?b=2&a=1", "https://www.site.com/a?a=1&b=2",
         "site.com"),
        ("HTTPS://WWW.Site.COM:443/a?a=1&b=2#frag",
         "https://www.site.com/a?a=1&b=2", "site.com"),
        ("http://user:pw@site.com.:80?utm_source=x",
         "http://site.com/", "site.com"),
        ("http://site.com:8080/a", "http://site.com:8080/a", "site.com"),
        ("https://sub.a.example.org/p/q?gclid=123&z=9&fbclid=4",
         "https://sub.a.example.org/p/q?z=9", "example.org"),
        ("https://x.io/?utm_campaign=a&utm_medium=b", "https://x.io/",
         "x.io"),
        ("ftp://files.example.com/pub", "ftp://files.example.com/pub",
         "example.com"),
        ("not a url", None, None),
        ("/relative/path?a=1", None, None),
    ]
    df = spark.createDataFrame([(u,) for u, _, _ in cases], "url string")
    got = df.select(
        url_canonicalize("url").alias("c"), url_domain("url").alias("d")
    ).collect()
    for (u, want_c, want_d), row in zip(cases, got):
        assert row["c"] == want_c, (u, row["c"])
        assert row["d"] == want_d, (u, row["d"])

    # idempotence: canonicalizing a canonical form is a no-op
    canon_df = spark.createDataFrame(
        [(c,) for _, c, _ in cases if c], "url string"
    )
    again = canon_df.select(F.col("url"), url_canonicalize("url").alias("c2"))
    assert all(r["c2"] == r["url"] for r in again.collect())


def test_domain_curation_stats(spark):
    """X163: the per-domain rollup counts raw/malformed/canonical and
    applies the quota cap; equivalent URL variants of the same page
    collapse into one canonical count."""
    from emr_trino_autoscale_spark.operators.text import domain_curation_stats

    rows = [
        ("https://big.com/p1?b=2&a=1",),
        ("HTTPS://BIG.com:443/p1?a=1&b=2#x",),   # same page as above
        ("https://big.com/p2",),
        ("https://big.com/p3",),
        ("http://small.org/only",),
        ("garbage",),                            # malformed -> NULL domain
    ]
    df = spark.createDataFrame(rows, "url string")
    got = {
        r["domain"]: r
        for r in domain_curation_stats(df, "url", quota=2).collect()
    }
    assert got["big.com"]["n_urls"] == 4
    assert got["big.com"]["n_canonical"] == 3  # p1 variants collapsed
    assert got["big.com"]["n_malformed"] == 0
    assert got["big.com"]["n_kept_under_quota"] == 2
    assert got["small.org"]["n_canonical"] == 1
    assert got["small.org"]["n_kept_under_quota"] == 1
    assert got[None]["n_malformed"] == 1 and got[None]["n_canonical"] == 0


def test_url_domain_with_psl(spark):
    """X162 PSL opt-in (VERDICT r11 task 6): a caller-supplied
    public-suffix table fixes the co.uk/com.au mis-grouping — longest
    rule wins, a host that IS a suffix yields NULL, unknown TLDs fall
    back to the two-label heuristic, and duplicate PSL rows don't fan
    rows out."""
    from pyspark.sql import functions as F

    from emr_trino_autoscale_spark.operators.text import (
        domain_curation_stats,
        with_url_domain,
    )

    psl = spark.createDataFrame(
        [("com",), ("uk",), ("co.uk",), ("com.au",), ("co.uk",)],
        "suffix string",
    )
    rows = [
        ("https://www.example.co.uk/p",),     # PSL: example.co.uk
        ("https://other.example.co.uk/q",),   # same registrable domain
        ("https://news.bbc.CO.UK/x",),        # case-folded host
        ("http://shop.example.com.au/y",),    # com.au rule
        ("https://plain.example.com/z",),     # 1-label rule
        ("https://co.uk/",),                  # host IS a suffix -> NULL
        ("https://x.unknowntld/p",),          # no rule -> 2-label fallback
        ("garbage",),                         # malformed -> NULL
    ]
    df = spark.createDataFrame(rows, "url string")
    out = with_url_domain(df, psl, "url", "domain")
    assert out.count() == len(rows)  # broadcast joins never fan out
    got = {r["url"]: r["domain"] for r in out.collect()}
    assert got["https://www.example.co.uk/p"] == "example.co.uk"
    assert got["https://other.example.co.uk/q"] == "example.co.uk"
    assert got["https://news.bbc.CO.UK/x"] == "bbc.co.uk"
    assert got["http://shop.example.com.au/y"] == "example.com.au"
    assert got["https://plain.example.com/z"] == "example.com"
    assert got["https://co.uk/"] is None
    assert got["https://x.unknowntld/p"] == "x.unknowntld"
    assert got["garbage"] is None

    # the rollup twin: co.uk sites no longer merge into one 'co.uk'
    stats = {
        r["domain"]: r["n_urls"]
        for r in domain_curation_stats(df, "url", psl_df=psl).collect()
    }
    assert stats["example.co.uk"] == 2
    assert stats["bbc.co.uk"] == 1
    # and the joins stay broadcast (no shuffle introduced by the PSL)
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" in plan
    assert "SortMergeJoin" not in plan


def test_tiff_palette_matches_rgb_twin():
    """Round-11 TIFF extensions, part 3: palette-color (photometric 3,
    ColorMap tag 320 with the 16-bit v*257 expansion) decodes to the
    same pixels as an RGB TIFF of palette[index]; a palette image
    without a ColorMap raises."""
    import numpy as np
    import pytest as _pytest

    from emr_trino_autoscale_spark.operators.multimodal import _tiff_rgb

    rng = np.random.RandomState(43)
    pal = rng.randint(0, 256, size=(256, 3), dtype=np.uint8)
    idx = rng.randint(0, 256, size=(10, 13), dtype=np.uint8)
    want = _tiff_rgb(_encode_tiff(pal[idx]))
    for kwargs in (
        {},
        {"compression": "lzw", "predictor": 2},
        {"tiles": (8, 8), "compression": "deflate"},
        {"big_endian": True},
    ):
        got = _tiff_rgb(
            _encode_tiff(idx[..., None], photometric=3, palette=pal, **kwargs)
        )
        assert np.array_equal(got, want), kwargs

    # missing ColorMap -> ValueError (spec: required for photometric 3)
    import struct

    bad = bytearray(_encode_tiff(idx[..., None], photometric=1))
    i = bad.find(b"\x06\x01")  # tag 262
    assert i > 0
    bad[i + 8:i + 10] = struct.pack("<H", 3)
    with _pytest.raises(ValueError, match="ColorMap|palette"):
        _tiff_rgb(bytes(bad))


def test_html_to_text_and_markup_density(spark):
    """X164: script/style/comment blocks vanish wholesale, tags become
    spaces, the six core entities decode (with &amp; last so literal
    '&amp;lt;' yields '&lt;', never double-decodes), whitespace
    squeezes; markup_density separates a chrome-heavy page from plain
    prose."""
    from emr_trino_autoscale_spark.operators.text import (
        html_to_text,
        markup_density,
    )

    cases = [
        ("<html><body><h1>Title</h1><p>Hello   world</p></body></html>",
         "Title Hello world"),
        ("<script>var x = '<p>not text</p>';</script>after", "after"),
        ("<STYLE type='a'>.c{color:red}</style>kept", "kept"),
        ("<!-- a <b> comment -->text<!--x-->", "text"),
        ("a &amp; b &lt;tag&gt; &quot;q&quot; &#39;s&#39;&nbsp;end",
         "a & b <tag> \"q\" 's' end"),
        ("&amp;lt; stays encoded once", "&lt; stays encoded once"),
        ("no markup at all", "no markup at all"),
        ("<br><br/><a href='x'>link</a>", "link"),
    ]
    df = spark.createDataFrame([(h,) for h, _ in cases], "text string")
    got = df.select(html_to_text("text").alias("t")).collect()
    for (h, want), row in zip(cases, got):
        assert row["t"] == want, (h, row["t"])

    dens = spark.createDataFrame(
        [("<div><nav><a href='/'>x</a></nav></div>",),
         ("plain prose with no tags whatsoever",), ("",)],
        "text string",
    ).select(markup_density("text").alias("d")).collect()
    assert dens[0]["d"] > 0.9 and dens[1]["d"] == 0.0 and dens[2]["d"] == 0.0


def test_encoding_qa_operators(spark):
    """X166: mojibake detection fires on UTF-8-as-Latin-1/cp1252
    double-encodes (2-byte Western, Cyrillic, 3-byte CJK) and stays at
    zero on clean accented prose in several languages; control/
    replacement counters and the safe control-strip behave."""
    from pyspark.sql import functions as F

    from emr_trino_autoscale_spark.operators.text import (
        control_char_count,
        mojibake_score,
        replacement_char_count,
        strip_control_chars,
    )

    bad_we = "café résumé".encode("utf-8").decode("latin-1")
    bad_cy = "кот и пёс".encode("utf-8").decode("latin-1")
    bad_cjk = "日本語テキスト".encode("utf-8").decode("latin-1")
    rows = [
        (1, bad_we), (2, bad_cy), (3, bad_cjk),
        (4, "père Noël à côté de l'hôtel"),
        (5, "Übung macht den Meister, straße"),
        (6, "el año del señor"),
        (7, "plain ascii text only"),
        (8, "null\x00byte and bell\x07 kept\ttab\nnewline"),
        (9, "lost � bytes � here"),
        (10, ""),
    ]
    df = spark.createDataFrame(rows, "id long, text string")
    got = {
        r["id"]: r
        for r in df.select(
            "id",
            mojibake_score("text").alias("moji"),
            control_char_count("text").alias("ctrl"),
            replacement_char_count("text").alias("repl"),
            strip_control_chars("text").alias("clean"),
        ).collect()
    }
    assert got[1]["moji"] > 0 and got[2]["moji"] > 0 and got[3]["moji"] > 0
    for i in (4, 5, 6, 7, 10):
        assert got[i]["moji"] == 0.0, (i, got[i]["moji"])
    assert got[8]["ctrl"] == 2 and got[8]["repl"] == 0
    assert got[8]["clean"] == "nullbyte and bell kept\ttab\nnewline"
    assert got[9]["repl"] == 2 and got[9]["ctrl"] == 0
    # the score is a keep/drop separator at any threshold in (0, 1]
    assert min(got[i]["moji"] for i in (1, 2, 3)) > 40  # per-1000 density


def test_markdown_to_text_and_density(spark):
    """X167: fenced code vanishes, links/images keep their labels,
    list/header/table/emphasis scaffolding strips, snake_case
    identifiers survive (single underscores deliberately kept);
    markdown_density separates a link-farm from prose."""
    from emr_trino_autoscale_spark.operators.text import (
        markdown_density,
        markdown_to_text,
    )

    cases = [
        ("# Title\n\nplain *bold* prose", "Title plain bold prose"),
        ("before\n```python\nx = 1\nprint(x)\n```\nafter", "before after"),
        ("see [the docs](https://example.com/a?b=1) now", "see the docs now"),
        ("![alt text](img.png) and [ref link][1]\n[1]: http://x.y",
         "alt text and ref link"),
        ("- item one\n- item two\n1. third\n2) fourth",
         "item one item two third fourth"),
        ("> quoted\n>> deeper", "quoted deeper"),
        ("| a | b |\n|---|---|\n| 1 | 2 |", "a b 1 2"),
        ("keep snake_case and __strip__ this", "keep snake_case and strip this"),
        ("auto <https://u.rl> gone; `code` kept", "auto gone; code kept"),
        ("***\nrule gone\n---", "rule gone"),
        ("~~struck~~ text", "struck text"),
        ("no markdown at all", "no markdown at all"),
    ]
    df = spark.createDataFrame([(m,) for m, _ in cases], "text string")
    got = df.select(markdown_to_text("text").alias("t")).collect()
    for (m, want), row in zip(cases, got):
        assert row["t"] == want, (m, row["t"])

    dens = spark.createDataFrame(
        [("[a](http://very-long-url.example.com/x/y/z)",),
         ("plain prose with no markdown whatsoever",), ("",)],
        "text string",
    ).select(markdown_density("text").alias("d")).collect()
    assert dens[0]["d"] > 0.8 and dens[1]["d"] == 0.0 and dens[2]["d"] == 0.0


def test_squeeze_repeated_lines(spark):
    """X168: runs of identical adjacent lines collapse to one, blank
    runs included; non-adjacent repeats survive; the fraction signal
    separates a glitch page from clean prose."""
    from emr_trino_autoscale_spark.operators.text import (
        repeated_line_fraction,
        squeeze_repeated_lines,
    )

    cases = [
        ("a\na\na\nb", "a\nb"),
        ("a\nb\na", "a\nb\na"),          # non-adjacent repeat kept
        ("x\n\n\n\ny", "x\n\ny"),        # blank-run squeeze
        ("only one line", "only one line"),
        ("", ""),
        ("same\nsame", "same"),
    ]
    df = spark.createDataFrame([(t,) for t, _ in cases], "text string")
    got = df.select(squeeze_repeated_lines("text").alias("t")).collect()
    for (t, want), row in zip(cases, got):
        assert row["t"] == want, (t, row["t"])

    frac = spark.createDataFrame(
        [("spam\n" * 99 + "spam",), ("a\nb\nc\nd",)], "text string"
    ).select(repeated_line_fraction("text").alias("f")).collect()
    assert frac[0]["f"] > 0.95 and frac[1]["f"] == 0.0


def test_encoding_qa_stats_batch(spark):
    """X166 rollup: per-source counters match a hand count on a mixed
    clean/mojibake/control corpus."""
    from emr_trino_autoscale_spark.operators.text import encoding_qa_stats

    bad = "café résumé".encode("utf-8").decode("latin-1")
    rows = [
        ("web", bad), ("web", bad), ("web", "clean prose here"),
        ("books", "père Noël à côté"), ("books", "null\x00\x07 and �"),
    ]
    df = spark.createDataFrame(rows, "source string, text string")
    got = {r["source"]: r for r in encoding_qa_stats(df).collect()}
    assert got["web"]["n_docs"] == 3 and got["web"]["n_mojibake_docs"] == 2
    assert got["web"]["n_control_docs"] == 0
    assert abs(got["web"]["mojibake_rate"] - 2 / 3) < 1e-12
    assert got["books"]["n_docs"] == 2 and got["books"]["n_mojibake_docs"] == 0
    assert got["books"]["n_control_chars"] == 2
    assert got["books"]["n_replacement_chars"] == 1
    assert abs(got["books"]["control_rate"] - 0.5) < 1e-12


def _encode_jpeg_lossless(samples, predictor=1, precision=8, pt=0):
    """Minimal spec-correct lossless JPEG (SOF3) encoder (test-side,
    T.81 Annex H): Huffman-coded per-sample prediction differences
    (category+extra-bits, category 16 = diff 32768 with no extra
    bits), predictors 1-7, point transform, modulo-2^16 arithmetic,
    any 2-16-bit precision, interleaved 1x1 components — so the
    decoder is exercised against payloads it did not produce."""
    import numpy as np

    arr = np.asarray(samples, dtype=np.int64)
    if arr.ndim == 2:
        arr = arr[..., None]
    h, w, nc = arr.shape
    vals = arr >> pt
    default = 1 << (precision - pt - 1)

    # canonical table for categories 0..16: lengths 2,2,2,3,4,...,16
    counts = [0, 3] + [1] * 14
    symbols = list(range(17))
    code, k, enc = 0, 0, {}
    for ln in range(1, 17):
        for _ in range(counts[ln - 1]):
            enc[symbols[k]] = (ln, code)
            code += 1
            k += 1
        code <<= 1

    bitbuf = bytearray()
    acc, nbits = 0, 0

    def put(c, ln):
        nonlocal acc, nbits
        acc = (acc << ln) | c
        nbits += ln
        while nbits >= 8:
            byte = (acc >> (nbits - 8)) & 0xFF
            bitbuf.append(byte)
            if byte == 0xFF:
                bitbuf.append(0x00)
            nbits -= 8
            acc &= (1 << nbits) - 1

    for y in range(h):
        for x in range(w):
            for c in range(nc):
                p = vals[..., c]
                if y == 0:
                    px = default if x == 0 else int(p[0, x - 1])
                elif x == 0:
                    px = int(p[y - 1, 0])
                else:
                    ra, rb, rc = (int(p[y, x - 1]), int(p[y - 1, x]),
                                  int(p[y - 1, x - 1]))
                    px = {1: ra, 2: rb, 3: rc, 4: ra + rb - rc,
                          5: ra + ((rb - rc) >> 1),
                          6: rb + ((ra - rc) >> 1),
                          7: (ra + rb) >> 1}[predictor]
                diff = (int(p[y, x]) - px) % 65536
                if diff >= 32768:
                    diff -= 65536
                if diff == -32768:
                    ln, cd = enc[16]
                    put(cd, ln)  # category 16: no extra bits
                    continue
                t = abs(diff).bit_length()
                ln, cd = enc[t]
                put(cd, ln)
                if t:
                    extra = diff if diff > 0 else diff + (1 << t) - 1
                    put(extra & ((1 << t) - 1), t)
    if nbits:
        put((1 << (8 - nbits)) - 1, 8 - nbits)  # 1-pad to byte

    out = bytearray(b"\xff\xd8")
    dht = bytes([0x00]) + bytes(counts) + bytes(symbols)
    out += b"\xff\xc4" + (len(dht) + 2).to_bytes(2, "big") + dht
    sof = bytes([precision]) + h.to_bytes(2, "big") + w.to_bytes(2, "big")
    sof += bytes([nc])
    for c in range(nc):
        sof += bytes([c + 1, 0x11, 0])
    out += b"\xff\xc3" + (len(sof) + 2).to_bytes(2, "big") + sof
    sos = bytes([nc])
    for c in range(nc):
        sos += bytes([c + 1, 0x00])
    sos += bytes([predictor, 0, pt])
    out += b"\xff\xda" + (len(sos) + 2).to_bytes(2, "big") + sos
    out += bytes(bitbuf) + b"\xff\xd9"
    return bytes(out)


def test_jpeg_lossless_roundtrip_all_predictors():
    """SOF3 is LOSSLESS: every predictor 1-7 must round-trip 8-bit
    gray and RGB pixels bit-exactly (unlike the DCT modes, which are
    pinned within quantization loss)."""
    import numpy as np

    from emr_trino_autoscale_spark.operators._jpeg import decode_jpeg_rgb

    rng = np.random.RandomState(42)
    gray = rng.randint(0, 256, size=(13, 17), dtype=np.uint8)
    rgb = rng.randint(0, 256, size=(9, 11, 3), dtype=np.uint8)
    for sel in range(1, 8):
        got = decode_jpeg_rgb(_encode_jpeg_lossless(gray, predictor=sel))
        back = np.rint(got[..., 0] * 255.0).astype(np.uint8)
        assert np.array_equal(back, gray), f"gray predictor {sel}"
        got3 = decode_jpeg_rgb(_encode_jpeg_lossless(rgb, predictor=sel))
        back3 = np.rint(got3 * 255.0).astype(np.uint8)
        # 3-component lossless is RGB directly — exact equality also
        # proves no YCbCr transform was misapplied
        assert np.array_equal(back3, rgb), f"rgb predictor {sel}"


def test_jpeg_lossless_high_precision_and_point_transform():
    """12/16-bit precisions land exactly on the scaled plane contract;
    point transform Pt reconstructs (x >> Pt) << Pt; category-16
    (diff == +-32768 mod 2^16) survives; sampling factors != 1x1 and
    DRI in lossless raise to the stub boundary."""
    import numpy as np
    import pytest as _pytest

    from emr_trino_autoscale_spark.operators._jpeg import (
        decode_jpeg_planes,
        decode_jpeg_rgb,
    )

    rng = np.random.RandomState(7)
    for precision in (12, 16):
        maxv = (1 << precision) - 1
        img = rng.randint(0, maxv + 1, size=(8, 9)).astype(np.int64)
        # force a full-swing first-line step so big diffs are exercised
        img[0, :4] = 0
        img[0, 4:] = maxv
        planes, w, h = decode_jpeg_planes(
            _encode_jpeg_lossless(img, predictor=4, precision=precision)
        )
        back = np.rint(planes[0] * (maxv / 255.0)).astype(np.int64)
        assert np.array_equal(back, img), precision

    img8 = rng.randint(0, 256, size=(6, 7)).astype(np.int64)
    planes, w, h = decode_jpeg_planes(
        _encode_jpeg_lossless(img8, predictor=2, pt=2)
    )
    back = np.rint(planes[0]).astype(np.int64)
    assert np.array_equal(back, (img8 >> 2) << 2)

    good = _encode_jpeg_lossless(img8)
    subsampled = bytearray(good)
    i = subsampled.find(b"\xff\xc3")
    subsampled[i + 11] = 0x22  # h=v=2 on component 1 (seg: FFC3 len P hh ww nc id HV tq)
    with _pytest.raises(ValueError, match="sampling"):
        decode_jpeg_rgb(bytes(subsampled))
    with_dri = good[:2] + b"\xff\xdd\x00\x04\x00\x08" + good[2:]
    with _pytest.raises(ValueError, match="restart"):
        decode_jpeg_rgb(with_dri)


def test_jpeg_lossless_size_cap_raises_to_stub():
    """ADVICE r11: the SOF3 scan is a per-sample Python Huffman loop —
    a multi-megapixel lossless payload would stall an executor for
    minutes. Images over LOSSLESS_MAX_SAMPLES must raise (sniffer then
    degrades to the deterministic stub) BEFORE any sample decodes."""
    import numpy as np
    import pytest as _pytest

    from emr_trino_autoscale_spark.operators import _jpeg
    from emr_trino_autoscale_spark.operators.multimodal import sniffing_decoder

    rng = np.random.RandomState(11)
    img8 = rng.randint(0, 256, size=(6, 7)).astype(np.int64)
    good = _encode_jpeg_lossless(img8)
    huge = bytearray(good)
    i = huge.find(b"\xff\xc3")
    # SOF3 segment: FFC3 len(2) P h(2) w(2) ... — claim 8192x8192
    huge[i + 5 : i + 9] = (8192).to_bytes(2, "big") * 2
    assert 8192 * 8192 > _jpeg.LOSSLESS_MAX_SAMPLES
    with _pytest.raises(ValueError, match="size cap"):
        _jpeg.decode_jpeg_rgb(bytes(huge))
    # sniffer contract: the capped payload degrades, never stalls
    feats = sniffing_decoder(bytes(huge), "image")
    assert feats is not None and len(feats) == 8
    # the cap does not touch in-envelope decodes
    _jpeg.decode_jpeg_rgb(good)


def test_jpeg_lossless_feature_parity_with_ppm():
    """Integration through the sniffer: a lossless JPEG of the same
    pixels as a P6 PPM produces IDENTICAL 8-float features (the DCT
    pins allow quantization tolerance; lossless allows none)."""
    import numpy as np

    from emr_trino_autoscale_spark.operators.multimodal import sniffing_decoder

    rng = np.random.RandomState(3)
    rgb = rng.randint(0, 256, size=(16, 16, 3), dtype=np.uint8)
    ppm = b"P6\n16 16\n255\n" + rgb.tobytes()
    jls = _encode_jpeg_lossless(rgb, predictor=7)
    assert sniffing_decoder(jls, "image") == sniffing_decoder(ppm, "image")


def _encode_aiff(samples, rate, bits=16, aifc=False):
    """Minimal spec-correct AIFF encoder (test-side): COMM with the
    80-bit extended-float sample rate + SSND big-endian PCM, so the
    decoder is exercised against payloads it did not produce."""
    import numpy as np

    arr = np.asarray(samples, dtype=np.int64)
    if arr.ndim == 1:
        arr = arr[:, None]
    nframes, nch = arr.shape
    bw = bits // 8
    # 80-bit extended float for an integer rate: normalize mantissa
    # to the explicit-integer-bit form
    m = rate
    e = 16383 + 63
    while m < (1 << 63):
        m <<= 1
        e -= 1
    while m >= (1 << 64):
        m >>= 1
        e += 1
    ext = e.to_bytes(2, "big") + m.to_bytes(8, "big")
    flat = arr.reshape(-1)
    raw = bytearray()
    for v in flat:
        raw += int(v & ((1 << bits) - 1)).to_bytes(bw, "big")
    comm = (
        nch.to_bytes(2, "big") + nframes.to_bytes(4, "big")
        + bits.to_bytes(2, "big") + ext
    )
    if aifc:
        comm += b"NONE" + bytes([4]) + b"none" + b"\x00"
    ssnd = bytes(8) + bytes(raw)  # offset=0, blocksize=0

    def chunk(cid, body):
        pad = b"\x00" if len(body) & 1 else b""
        return cid + len(body).to_bytes(4, "big") + body + pad

    form = (b"AIFC" if aifc else b"AIFF") + (
        chunk(b"COMM", comm) + chunk(b"SSND", ssnd)
    )
    return b"FORM" + len(form).to_bytes(4, "big") + form


def _encode_g711_wav(samples16, rate, law="ulaw"):
    """Test-side G.711 encoder (segmented companding per the spec's
    encoding tables, independent of the decoder's expansion formula)
    wrapped in a RIFF/WAVE container with format code 7 (mu) / 6 (A)."""
    import numpy as np

    x = np.asarray(samples16, dtype=np.int64)
    if x.ndim == 1:
        x = x[:, None]
    nch = x.shape[1]
    flat = [int(v) for v in x.reshape(-1)]
    out = bytearray()
    for v in flat:
        if law == "ulaw":
            sign = 0x80 if v < 0 else 0
            v2 = min((-v if v < 0 else v) + 0x84, 0x7FFF)
            exp = v2.bit_length() - 8  # segment: top set bit below 0x84<<8
            mant = (v2 >> (exp + 3)) & 0x0F
            code = ~(sign | (exp << 4) | mant) & 0xFF
        else:
            sign = 0x80 if v >= 0 else 0  # A-law: sign bit 1 = positive
            v2 = min(v if v >= 0 else -v - 1, 0x7FFF)
            if v2 < 256:
                code = sign | (v2 >> 4)
            else:
                exp = v2.bit_length() - 8
                mant = (v2 >> (exp + 3)) & 0x0F
                code = sign | (exp << 4) | mant
            code ^= 0x55
        out.append(code)
    data = bytes(out)
    code_id = 7 if law == "ulaw" else 6
    fmt = (
        code_id.to_bytes(2, "little") + nch.to_bytes(2, "little")
        + rate.to_bytes(4, "little")
        + (rate * nch).to_bytes(4, "little")
        + nch.to_bytes(2, "little") + (8).to_bytes(2, "little")
    )

    def chunk(cid, body):
        pad = b"\x00" if len(body) & 1 else b""
        return cid + len(body).to_bytes(4, "little") + body + pad

    inner = b"WAVE" + chunk(b"fmt ", fmt) + chunk(b"data", data)
    return b"RIFF" + len(inner).to_bytes(4, "little") + inner


def test_aiff_decode_and_wav_feature_parity():
    """AIFF 16-bit of the same PCM is feature-IDENTICAL to the WAV
    (pure endianness twin); 8/24-bit depths decode at their scale;
    AIFF-C 'NONE' decodes, compressed AIFF-C falls to the stub."""
    import io
    import wave

    import numpy as np

    from emr_trino_autoscale_spark.operators.multimodal import (
        _decode_stub,
        sniffing_decoder,
    )

    rng = np.random.RandomState(5)
    pcm = rng.randint(-20000, 20000, size=(500, 2)).astype(np.int64)
    buf = io.BytesIO()
    with wave.open(buf, "wb") as w:
        w.setnchannels(2)
        w.setsampwidth(2)
        w.setframerate(16000)
        w.writeframes(pcm.astype("<i2").tobytes())
    wav = buf.getvalue()
    aiff = _encode_aiff(pcm, 16000, bits=16)
    assert sniffing_decoder(aiff, "audio") == sniffing_decoder(wav, "audio")

    aifc = _encode_aiff(pcm, 16000, bits=16, aifc=True)
    assert sniffing_decoder(aifc, "audio") == sniffing_decoder(wav, "audio")

    # 24-bit: samples << 8 normalize to the same [-1, 1) floats
    aiff24 = _encode_aiff(pcm << 8, 16000, bits=24)
    f24 = sniffing_decoder(aiff24, "audio")
    f16 = sniffing_decoder(aiff, "audio")
    assert all(abs(a - b) < 1e-9 for a, b in zip(f24, f16))

    # compressed AIFF-C must fall back to the stub, never mis-decode
    bad = bytearray(aifc)
    i = bad.find(b"NONE")
    bad[i:i + 4] = b"sowt"
    assert sniffing_decoder(bytes(bad), "audio") == _decode_stub(bytes(bad), "audio")


def test_g711_decode_known_values_and_roundtrip():
    """G.711 decode formulas: spec-pinned endpoints (0xFF/0x7F mu-law
    are zero, 0x80 mu-law is +32124; A-law max magnitude 32256 after
    the 0x55 toggle), re-encode(decode(code)) == code for every code
    (both laws — bijectivity on the code space), and an independently
    companded sine decodes within the spec's segment quantization
    error through the sniffer."""
    import numpy as np

    from emr_trino_autoscale_spark.operators.multimodal import (
        _alaw_to_linear16,
        _ulaw_to_linear16,
        sniffing_decoder,
        transcode_wav,
    )

    assert _ulaw_to_linear16([0xFF])[0] == 0
    assert _ulaw_to_linear16([0x7F])[0] == 0
    assert _ulaw_to_linear16([0x80])[0] == 32124
    assert _ulaw_to_linear16([0x00])[0] == -32124
    assert _alaw_to_linear16([0xAA])[0] == 32256
    assert _alaw_to_linear16([0x2A])[0] == -32256

    # all-256-codes pin against the stdlib's independent G.711 tables.
    # audioop was removed in Python 3.13 — skip ONLY this cross-check
    # on newer interpreters (the hand-pinned known-value asserts above
    # stay unconditional).
    import warnings as _warnings

    try:
        with _warnings.catch_warnings():
            _warnings.simplefilter("ignore")
            import audioop as _audioop
    except ImportError:
        _audioop = None
    if _audioop is not None:
        _codes = bytes(range(256))
        assert np.array_equal(
            _ulaw_to_linear16(np.arange(256, dtype=np.uint8)),
            np.frombuffer(_audioop.ulaw2lin(_codes, 2), dtype="<i2"),
        )
        assert np.array_equal(
            _alaw_to_linear16(np.arange(256, dtype=np.uint8)),
            np.frombuffer(_audioop.alaw2lin(_codes, 2), dtype="<i2"),
        )

    # decode -> re-encode identity over all 256 codes, both laws
    for law, dec in (("ulaw", _ulaw_to_linear16), ("alaw", _alaw_to_linear16)):
        codes = np.arange(256, dtype=np.uint8)
        lin = dec(codes).astype(np.int64)
        re = _encode_g711_wav(lin[:, None], 8000, law=law)
        back = np.frombuffer(re[re.find(b"data") + 8:][:256], dtype=np.uint8)
        if law == "ulaw":
            # mu-law has two zero codes (0x7F = 'negative zero'); a
            # canonical encoder emits 0xFF for 0, so bijectivity holds
            # everywhere except that single inherent collision
            mism = np.nonzero(back != codes)[0]
            assert list(mism) == [0x7F] and back[0x7F] == 0xFF
        else:
            assert np.array_equal(back, codes), law

    t = np.arange(800)
    sine = (12000 * np.sin(2 * np.pi * 440 * t / 8000)).astype(np.int64)
    for law in ("ulaw", "alaw"):
        payload = _encode_g711_wav(sine[:, None], 8000, law=law)
        feats = sniffing_decoder(payload, "audio")
        rms_true = float(np.sqrt(np.mean((sine / 32768.0) ** 2)))
        assert abs(feats[1] - rms_true) < 0.005, law  # rms within companding error
        assert feats[4] == 8000 / 96000.0
        wav = transcode_wav(payload)
        assert wav is not None and wav.startswith(b"RIFF")
        assert sniffing_decoder(wav, "audio") == feats  # expansion is the decode
        assert transcode_wav(wav) == wav  # canonical output is a fixed point


def test_embedding_decontaminate(spark):
    """X170: the exact path flags exactly the planted benchmark
    near-copies (paraphrase-shaped: benchmark vector + small noise)
    and nothing else; the banded path is a subset of exact and catches
    verbatim copies with certainty; vectorized == fold; anti-join
    leaves the clean corpus."""
    import numpy as np

    from emr_trino_autoscale_spark.operators.similarity import (
        embedding_decontaminate,
        md5_sign_planes,
    )

    rng = np.random.RandomState(11)
    dim = 16
    bench = rng.randn(5, dim)
    bench /= np.linalg.norm(bench, axis=1, keepdims=True)
    clean = rng.randn(40, dim)
    clean /= np.linalg.norm(clean, axis=1, keepdims=True)
    # make sure no clean vector accidentally clears the gate
    for i in range(len(clean)):
        while float(np.max(np.abs(bench @ clean[i]))) > 0.7:
            clean[i] = rng.randn(dim)
            clean[i] /= np.linalg.norm(clean[i])

    rows = []
    want = set()
    for i, v in enumerate(clean):
        rows.append((i, [float(x) for x in v]))
    for j in range(3):  # planted paraphrases of bench 0..2
        v = bench[j] + 0.05 * rng.randn(dim)
        v /= np.linalg.norm(v)
        rows.append((100 + j, [float(x) for x in v]))
        want.add(100 + j)
    rows.append((200, [float(x) for x in bench[4]]))  # verbatim copy
    want.add(200)

    corpus = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    bdf = spark.createDataFrame(
        [(j, [float(x) for x in bench[j]]) for j in range(5)],
        "vec_id long, embedding array<double>",
    )

    exact = {
        r["id"]: r
        for r in embedding_decontaminate(corpus, bdf, threshold=0.9).collect()
    }
    assert set(exact) == want
    assert exact[200]["bench_id"] == 4 and float(exact[200]["cosine"]) == 1.0
    for j in range(3):
        assert exact[100 + j]["bench_id"] == j

    vec = {
        r["id"]: r
        for r in embedding_decontaminate(
            corpus, bdf, threshold=0.9, vectorized=True
        ).collect()
    }
    assert {(k, v["bench_id"], v["cosine"]) for k, v in vec.items()} == {
        (k, v["bench_id"], v["cosine"]) for k, v in exact.items()
    }

    planes = md5_sign_planes(n_planes=12, dim=dim)
    banded = {
        r["id"]: r
        for r in embedding_decontaminate(
            corpus, bdf, threshold=0.9, method="banded",
            planes=planes, n_bands=4,
        ).collect()
    }
    assert set(banded) <= set(exact)
    assert 200 in banded  # identical vectors collide with certainty
    for k, r in banded.items():
        assert r["cosine"] == exact[k]["cosine"]


def _split_jpeg_tables(stream):
    """Partition a full JPEG stream into (tables, abbreviated): DQT/DHT
    segments move into an SOI..EOI tables stream (the TIFF tag 347
    JPEGTables form); everything else (SOF/SOS/entropy) stays."""
    pos = 2
    tables = b""
    rest = b""
    while pos < len(stream):
        assert stream[pos] == 0xFF
        marker = stream[pos + 1]
        if marker == 0xD9:
            break
        if marker == 0xDA:  # SOS header + entropy run to EOI
            rest += stream[pos:len(stream) - 2]
            break
        seglen = int.from_bytes(stream[pos + 2:pos + 4], "big")
        seg = stream[pos:pos + 2 + seglen]
        if marker in (0xC4, 0xDB):
            tables += seg
        else:
            rest += seg
        pos += 2 + seglen
    return (b"\xff\xd8" + tables + b"\xff\xd9",
            b"\xff\xd8" + rest + b"\xff\xd9")


def _encode_tiff_jpeg(rgb, rows_per_strip=None, tiles=None,
                      shared_tables=False, photometric=6, big_endian=False):
    """Test-side new-style JPEG-in-TIFF writer (TIFF TechNote 2): each
    strip/tile is an independent baseline JPEG from _encode_jpeg;
    shared_tables=True moves DQT/DHT into tag 347 (JPEGTables, type 7
    UNDEFINED) and writes abbreviated per-segment streams."""
    import struct

    import numpy as np

    e = ">" if big_endian else "<"
    h, w = rgb.shape[0], rgb.shape[1]
    segments = []
    if tiles:
        tw, th = tiles
        padded = np.zeros((-(-h // th) * th, -(-w // tw) * tw, 3),
                          dtype=rgb.dtype)
        padded[:h, :w] = rgb
        for y0 in range(0, padded.shape[0], th):
            for x0 in range(0, padded.shape[1], tw):
                segments.append(_encode_jpeg(padded[y0:y0 + th, x0:x0 + tw]))
    else:
        rps = rows_per_strip or h
        for y0 in range(0, h, rps):
            segments.append(_encode_jpeg(rgb[y0:y0 + rps]))
    tables = b""
    if shared_tables:
        split = [_split_jpeg_tables(s) for s in segments]
        tables = split[0][0]
        segments = [abbr for _t, abbr in split]

    entries = []

    def entry(tag, typ, values):
        entries.append((tag, typ, values))

    entry(256, 3, [w])
    entry(257, 3, [h])
    entry(258, 3, [8, 8, 8])
    entry(259, 3, [7])
    entry(262, 3, [photometric])
    entry(277, 3, [3])
    entry(284, 3, [1])
    if tiles:
        entry(322, 3, [tiles[0]])
        entry(323, 3, [tiles[1]])
    else:
        entry(278, 4, [rows_per_strip or h])
    if tables:
        entry(347, 7, list(tables))
    n = len(entries) + 2
    ifd_off = 8
    val_off = ifd_off + 2 + 12 * n + 4
    blobs = []
    tsz = {3: 2, 4: 4, 7: 1}
    tcode = {3: "H", 4: "I", 7: "B"}

    def ser(tag, typ, values):
        nonlocal val_off
        sz = tsz[typ] * len(values)
        raw = struct.pack(e + tcode[typ] * len(values), *values)
        if sz <= 4:
            raw += b"\x00" * (4 - sz)
            return struct.pack(e + "HHI", tag, typ, len(values)) + raw
        blobs.append(raw)
        out_ = struct.pack(e + "HHII", tag, typ, len(values), val_off)
        val_off += sz
        return out_

    body = [ser(t, ty, v) for t, ty, v in entries]
    counts = [len(s) for s in segments]
    count_tag, offset_tag = (325, 324) if tiles else (279, 273)
    body.append(ser(count_tag, 4, counts))
    offs = []
    cur = val_off + (4 * len(segments) if len(segments) > 1 else 0)
    for c in counts:
        offs.append(cur)
        cur += c
    body.append(ser(offset_tag, 4, offs))
    body.sort(key=lambda b_: struct.unpack(e + "H", b_[:2])[0])
    out = (b"MM" if big_endian else b"II") + struct.pack(e + "HI", 42, ifd_off)
    out += struct.pack(e + "H", n) + b"".join(body) + struct.pack(e + "I", 0)
    out += b"".join(blobs) + b"".join(segments)
    return out


def test_tiff_jpeg_compression():
    """New-style JPEG-in-TIFF: strip and tile layouts decode within
    baseline-JPEG quantization loss of the original; the shared-
    JPEGTables abbreviated form decodes BIT-IDENTICALLY to the inline
    form (same entropy data, tables just relocated); equal strip/tile
    geometry gives equal pixels; RGB-photometric JPEG and old-style
    compression 6 raise to the stub boundary."""
    import numpy as np
    import pytest as _pytest

    from emr_trino_autoscale_spark.operators.multimodal import (
        _decode_stub,
        _tiff_rgb,
        sniffing_decoder,
    )

    # spatially smooth content (JPEG loss on white noise is ~25/pixel;
    # the gradient keeps the tolerance pin meaningful — the bit-exact
    # pins below are the structural checks)
    yy, xx = np.mgrid[0:24, 0:17]
    rgb = np.stack(
        [(yy * 7 + xx * 3) % 200 + 20,
         (yy * 2 + xx * 9) % 180 + 40,
         (yy * 5 + xx * 5) % 160 + 60], axis=2
    ).astype(np.uint8)

    strip = _encode_tiff_jpeg(rgb, rows_per_strip=8)
    dec = _tiff_rgb(strip)
    assert dec.shape == (24, 17, 3)
    assert np.abs(dec - rgb.astype(np.float64)).mean() < 6.0

    shared = _encode_tiff_jpeg(rgb, rows_per_strip=8, shared_tables=True)
    assert np.array_equal(_tiff_rgb(shared), dec)

    tiled = _encode_tiff_jpeg(rgb, tiles=(17, 8))
    assert np.array_equal(_tiff_rgb(tiled), dec)  # same segment geometry

    tiled2 = _encode_tiff_jpeg(rgb, tiles=(8, 8), shared_tables=True,
                               big_endian=True)
    assert np.abs(_tiff_rgb(tiled2) - rgb.astype(np.float64)).mean() < 6.0

    with _pytest.raises(ValueError, match="photometric 2"):
        _tiff_rgb(_encode_tiff_jpeg(rgb, rows_per_strip=8, photometric=2))

    import struct as _struct

    def _set_compression(buf, val):
        n = _struct.unpack("<H", buf[8:10])[0]
        for i in range(n):
            off = 10 + 12 * i
            if _struct.unpack("<H", buf[off:off + 2])[0] == 259:
                buf[off + 8] = val
        return buf

    # old-style (compression 6) with self-contained per-strip JFIF
    # streams decodes identically to the new-style form
    oldstyle = _set_compression(bytearray(_encode_tiff_jpeg(
        rgb, rows_per_strip=8)), 6)
    assert np.array_equal(_tiff_rgb(bytes(oldstyle)), dec)
    # old-style combined with shared JPEGTables is the tag-soup form
    # this decoder refuses
    old_tables = _set_compression(bytearray(_encode_tiff_jpeg(
        rgb, rows_per_strip=8, shared_tables=True)), 6)
    with _pytest.raises(ValueError, match="old-style"):
        _tiff_rgb(bytes(old_tables))
    # sniffer: the refused variant degrades to stub, good one decodes
    assert sniffing_decoder(bytes(old_tables), "image") == _decode_stub(
        bytes(old_tables), "image"
    )
    feats = sniffing_decoder(strip, "image")
    assert len(feats) == 8 and feats[7] == 1.0


def _encode_jpeg12(img12, subsample=False):
    """Test-side 12-bit extended-sequential JPEG encoder (SOF1):
    pq=1 16-bit DQT (all-ones tables — near-lossless), flat-length
    canonical Huffman tables wide enough for 12-bit categories
    (DC 0..15 at length 5, AC (r,s) s<=14 at length 8 plus EOB/ZRL),
    2048 level shift, gray or YCbCr 4:4:4/4:2:0 — so the decoder is
    exercised against payloads it did not produce."""
    import struct

    import numpy as np

    from emr_trino_autoscale_spark.operators._jpeg import _A, ZIGZAG

    arr = np.asarray(img12, dtype=np.float64)
    gray = arr.ndim == 2
    h, w = arr.shape[:2]
    if gray:
        planes = [arr]
        factors = [(1, 1)]
    else:
        r, g, b = (arr[..., i] for i in range(3))
        y = 0.299 * r + 0.587 * g + 0.114 * b
        cb = 2048.0 - 0.168736 * r - 0.331264 * g + 0.5 * b
        cr = 2048.0 + 0.5 * r - 0.418688 * g - 0.081312 * b
        if subsample:
            ph, pw = (h + 1) & ~1, (w + 1) & ~1

            def pad(p):
                out = np.empty((ph, pw))
                out[:h, :w] = p
                out[h:, :w] = p[-1:]
                out[:, w:] = out[:, w - 1:w]
                return out

            cb = pad(cb).reshape(ph // 2, 2, pw // 2, 2).mean(axis=(1, 3))
            cr = pad(cr).reshape(ph // 2, 2, pw // 2, 2).mean(axis=(1, 3))
            factors = [(2, 2), (1, 1), (1, 1)]
        else:
            factors = [(1, 1)] * 3
        planes = [y, cb, cr]

    # flat canonical tables: DC symbols 0..15 all length 5;
    # AC: EOB, ZRL and every (r, s<=14) all length 8
    dc_counts = [0, 0, 0, 0, 16] + [0] * 11
    dc_syms = list(range(16))
    ac_syms = [0x00, 0xF0] + [
        (r_ << 4) | s_ for r_ in range(16) for s_ in range(1, 15)
    ]
    ac_counts = [0] * 7 + [len(ac_syms)] + [0] * 8
    assert len(ac_syms) * 2 ** -8 < 1.0

    def enc_table(counts, symbols):
        code, k, out = 0, 0, {}
        for ln in range(1, 17):
            for _ in range(counts[ln - 1]):
                out[symbols[k]] = (ln, code)
                code += 1
                k += 1
            code <<= 1
        return out

    dct_t = enc_table(dc_counts, dc_syms)
    act_t = enc_table(ac_counts, ac_syms)

    hmax = max(f[0] for f in factors)
    vmax = max(f[1] for f in factors)
    mcux, mcuy = -(-w // (8 * hmax)), -(-h // (8 * vmax))
    padded = []
    for ci, (fh, fv) in enumerate(factors):
        p = planes[ci]
        ww, hh = mcux * fh * 8, mcuy * fv * 8
        out_p = np.empty((hh, ww))
        out_p[:p.shape[0], :p.shape[1]] = p
        out_p[p.shape[0]:, :p.shape[1]] = out_p[p.shape[0] - 1, :p.shape[1]]
        out_p[:, p.shape[1]:] = out_p[:, p.shape[1] - 1:p.shape[1]]
        padded.append(out_p)
    planes = padded

    bitbuf = bytearray()
    acc, nbits = 0, 0

    def put(code, ln):
        nonlocal acc, nbits
        acc = (acc << ln) | code
        nbits += ln
        while nbits >= 8:
            byte = (acc >> (nbits - 8)) & 0xFF
            bitbuf.append(byte)
            if byte == 0xFF:
                bitbuf.append(0x00)
            nbits -= 8
            acc &= (1 << nbits) - 1

    def put_val(v):
        t = abs(v).bit_length()
        return t, (v if v >= 0 else v + (1 << t) - 1)

    preds = [0] * len(planes)
    for my in range(mcuy):
        for mx in range(mcux):
            for ci, (fh, fv) in enumerate(factors):
                p = planes[ci]
                for by in range(fv):
                    for bx in range(fh):
                        y0 = (my * fv + by) * 8
                        x0 = (mx * fh + bx) * 8
                        blk = p[y0:y0 + 8, x0:x0 + 8] - 2048.0
                        # A's columns are orthonormal, so the forward
                        # transform is the plain conjugation — no scale
                        coef = _A.T @ blk @ _A
                        zz = np.rint(coef.reshape(64)).astype(np.int64)[ZIGZAG]
                        diff = int(zz[0]) - preds[ci]
                        preds[ci] = int(zz[0])
                        t, bits_v = put_val(diff)
                        ln, cd = dct_t[t]
                        put(cd, ln)
                        if t:
                            put(bits_v & ((1 << t) - 1), t)
                        run = 0
                        for k in range(1, 64):
                            v = int(zz[k])
                            if v == 0:
                                run += 1
                                continue
                            while run >= 16:
                                ln, cd = act_t[0xF0]
                                put(cd, ln)
                                run -= 16
                            t, bits_v = put_val(v)
                            ln, cd = act_t[(run << 4) | t]
                            put(cd, ln)
                            put(bits_v & ((1 << t) - 1), t)
                            run = 0
                        if run:
                            ln, cd = act_t[0x00]
                            put(cd, ln)
    if nbits:
        put((1 << (8 - nbits)) - 1, 8 - nbits)

    out = bytearray(b"\xff\xd8")
    # pq=1 DQT, all-ones (near-lossless; exercises the 16-bit parse)
    q16 = struct.pack(">64H", *([1] * 64))
    dqt = bytes([0x10]) + q16
    out += b"\xff\xdb" + (len(dqt) + 2).to_bytes(2, "big") + dqt
    dht = (bytes([0x00]) + bytes(dc_counts) + bytes(dc_syms)
           + bytes([0x10]) + bytes(ac_counts) + bytes(ac_syms))
    out += b"\xff\xc4" + (len(dht) + 2).to_bytes(2, "big") + dht
    nc = 1 if gray else 3
    sof = bytes([12]) + h.to_bytes(2, "big") + w.to_bytes(2, "big") + bytes([nc])
    for ci in range(nc):
        fh, fv = factors[ci]
        sof += bytes([ci + 1, (fh << 4) | fv, 0])
    out += b"\xff\xc1" + (len(sof) + 2).to_bytes(2, "big") + sof
    sos = bytes([nc])
    for ci in range(nc):
        sos += bytes([ci + 1, 0x00])
    sos += bytes([0, 63, 0])
    out += b"\xff\xda" + (len(sos) + 2).to_bytes(2, "big") + sos
    out += bytes(bitbuf) + b"\xff\xd9"
    return bytes(out)


def test_jpeg_12bit_sequential():
    """12-bit extended-sequential JPEG (SOF1, pq=1 quant tables):
    near-lossless round-trip at Q=1 for gray and RGB in the native
    12-bit range; 4:2:0 subsampling sanity; 12-bit progressive raises
    honestly."""
    import numpy as np
    import pytest as _pytest

    from emr_trino_autoscale_spark.operators._jpeg import (
        decode_jpeg_planes,
        decode_jpeg_rgb,
    )

    rng = np.random.RandomState(31)
    gray = rng.randint(0, 4096, size=(16, 13)).astype(np.float64)
    planes, w, h = decode_jpeg_planes(_encode_jpeg12(gray))
    back = planes[0] * (4095.0 / 255.0)
    # Q=1: error budget is DCT round-off only (<= a few counts in 4095)
    assert np.abs(back - gray).max() < 4.0

    rgb12 = rng.randint(200, 3896, size=(9, 11, 3)).astype(np.float64)
    got = decode_jpeg_rgb(_encode_jpeg12(rgb12)) * 4095.0
    assert np.abs(got - rgb12).max() < 8.0  # color transform round-trip

    # smooth content, 4:2:0: decodes and stays close
    yy, xx = np.mgrid[0:12, 0:10]
    smooth = np.stack([yy * 100.0 + 500, xx * 120.0 + 700,
                       (yy + xx) * 60.0 + 900], axis=2)
    got = decode_jpeg_rgb(_encode_jpeg12(smooth, subsample=True)) * 4095.0
    assert np.abs(got - smooth).mean() < 60.0

    prog = bytearray(_encode_jpeg12(gray))
    i = prog.find(b"\xff\xc1")
    prog[i + 1] = 0xC2  # claim progressive at 12-bit
    with _pytest.raises(ValueError, match="12-bit progressive"):
        decode_jpeg_planes(bytes(prog))


def test_aiff_corrupt_comm_exception_contract():
    """A corrupt COMM exponent must raise ValueError (the decoder
    contract), never OverflowError from the 80-bit float conversion;
    nframes/rate endpoints stay sane."""
    import numpy as np
    import pytest as _pytest

    from emr_trino_autoscale_spark.operators.multimodal import _parse_aiff

    pcm = np.arange(64, dtype=np.int64).reshape(-1, 1)
    good = bytearray(_encode_aiff(pcm, 44100, bits=16))
    i = good.find(b"COMM")
    # COMM body starts at i+8; the 80-bit rate at body offset 8
    for se in (0x7FFE, 0x0001, 0xFFFF):
        bad = bytearray(good)
        bad[i + 8 + 8:i + 8 + 10] = se.to_bytes(2, "big")
        with _pytest.raises(ValueError):
            _parse_aiff(bytes(bad))
    samples, rate, bits = _parse_aiff(bytes(good))
    assert rate == 44100 and bits == 16 and samples.shape == (64, 1)


def test_png_sub8bit_depths():
    """PNG 1/2/4-bit (round 11): gray expands by the exact
    255/(2^d - 1) factor, so a d-bit gray PNG is feature-IDENTICAL to
    the 8-bit PNG of the expanded pixels; palette indices pack the
    same way; Adam7-interlaced sub-byte passes unfilter at their own
    byte strides and match the sequential decode bit-exactly; odd
    widths exercise the partial final byte."""
    import numpy as np

    from emr_trino_autoscale_spark.operators.multimodal import (
        _png_rgb,
        decode_png_image,
    )

    rng = np.random.RandomState(13)
    for d in (1, 2, 4):
        maxv = (1 << d) - 1
        for w in (9, 16, 23):  # odd widths: partial trailing byte
            samp = rng.randint(0, maxv + 1, size=(11, w)).astype(np.uint8)
            png_d = _encode_png(samp, color_type=0, bit_depth=d,
                                filters=[0, 1, 2, 3, 4])
            png_8 = _encode_png(samp * (255 // maxv), color_type=0,
                                filters=[2, 4])
            assert decode_png_image(png_d) == decode_png_image(png_8), (d, w)
            inter = _encode_png(samp, color_type=0, bit_depth=d,
                                interlace=True, filters=[0, 1, 2, 3, 4])
            assert np.array_equal(_png_rgb(inter), _png_rgb(png_d)), (d, w)

    # 4-bit palette == 8-bit palette of the same indices
    pal = rng.randint(0, 256, size=(16, 3), dtype=np.uint8)
    idx = rng.randint(0, 16, size=(10, 13)).astype(np.uint8)
    p4 = _encode_png(idx, color_type=3, bit_depth=4, palette=pal,
                     filters=[0, 1])
    p8 = _encode_png(idx, color_type=3, palette=pal, filters=[0, 1])
    assert decode_png_image(p4) == decode_png_image(p8)


def _encode_bmp_rle(idx, pal, rle4=False, absolute_from=3, use_delta=None):
    """Test-side BI_RLE8/BI_RLE4 BMP writer: rows bottom-up, runs of
    equal pixels as encoded mode, runs shorter than ``absolute_from``
    grouped into absolute mode (word-aligned), optional (0,2,dx,dy)
    delta escape at ``use_delta`` = (row, col) — skipped pixels are
    index 0 for both sides of the contract."""
    import struct

    import numpy as np

    h, w = idx.shape
    out = bytearray()
    for fy in range(h):  # file order = bottom-up
        row = idx[h - 1 - fy]
        x = 0
        on_delta_row = use_delta and (h - 1 - fy) == use_delta[0]
        while x < w:
            if on_delta_row and x == use_delta[1]:
                out += bytes([0, 2, use_delta[2], use_delta[3]])
                x += use_delta[2]
                continue
            # never run past the pending delta column
            limit = use_delta[1] if on_delta_row and x < use_delta[1] else w
            run = 1
            while x + run < limit and row[x + run] == row[x] and run < 250:
                run += 1
            if run >= absolute_from:
                if rle4:
                    v = (int(row[x]) << 4) | int(row[x])
                else:
                    v = int(row[x])
                out += bytes([run, v])
                x += run
            else:
                n = min(max(run, 3), limit - x)
                if n < 3:  # absolute mode needs >= 3 (below are escapes)
                    for v_ in row[x:x + n]:
                        if rle4:
                            out += bytes([1, int(v_) << 4])
                        else:
                            out += bytes([1, int(v_)])
                    x += n
                    continue
                vals = [int(v_) for v_ in row[x:x + n]]
                if rle4:
                    raw = bytearray()
                    for i in range(0, len(vals), 2):
                        hi = vals[i] << 4
                        lo = vals[i + 1] if i + 1 < len(vals) else 0
                        raw.append(hi | lo)
                else:
                    raw = bytearray(vals)
                if len(raw) & 1:
                    raw.append(0)
                out += bytes([0, len(vals)]) + bytes(raw)
                x += n
        out += bytes([0, 0])  # EOL
    out += bytes([0, 1])  # EOF

    npal = pal.shape[0]
    table = bytearray()
    for r_, g_, b_ in pal:
        table += bytes([int(b_), int(g_), int(r_), 0])
    bpp = 4 if rle4 else 8
    comp = 2 if rle4 else 1
    data_offset = 14 + 40 + 4 * npal
    info = struct.pack("<IiiHHIIiiII", 40, w, h, 1, bpp, comp,
                       len(out), 2835, 2835, npal, 0)
    filesz = data_offset + len(out)
    hdr = b"BM" + struct.pack("<IHHI", filesz, 0, 0, data_offset)
    return hdr + info + bytes(table) + bytes(out)


def test_bmp_rle_and_palette():
    """BI_RLE8/BI_RLE4 and uncompressed 8-bit palette BMPs decode to
    the palette-mapped pixels exactly (cross-pinned against the PPM of
    the same RGB); absolute/encoded mode mix round-trips; the delta
    escape zero-fills skipped pixels; top-down RLE raises."""
    import struct

    import numpy as np

    from emr_trino_autoscale_spark.operators.multimodal import (
        _bmp_rgb,
        decode_bmp_image,
        decode_ppm_image,
    )
    import pytest as _pytest

    rng = np.random.RandomState(17)
    pal8 = rng.randint(0, 256, size=(256, 3), dtype=np.uint8)
    # runs + noise: exercises both encoded and absolute modes
    idx = np.where(
        rng.rand(13, 21) < 0.5,
        rng.randint(0, 256, size=(13, 21)),
        7,
    ).astype(np.uint8)
    bmp = _encode_bmp_rle(idx, pal8)
    want_rgb = pal8[idx]
    assert np.array_equal(_bmp_rgb(bmp), want_rgb.astype(np.float64))
    ppm = (b"P6\n21 13\n255\n" + want_rgb.tobytes())
    assert decode_bmp_image(bmp) == decode_ppm_image(ppm)

    pal4 = rng.randint(0, 256, size=(16, 3), dtype=np.uint8)
    idx4 = np.where(
        rng.rand(9, 14) < 0.5, rng.randint(0, 16, size=(9, 14)), 3
    ).astype(np.uint8)
    bmp4 = _encode_bmp_rle(idx4, pal4, rle4=True)
    assert np.array_equal(_bmp_rgb(bmp4), pal4[idx4].astype(np.float64))

    # delta escape: skip 4 pixels on one row -> they read as index 0
    idxd = idx.copy()
    bmp_d = _encode_bmp_rle(idx, pal8, use_delta=(5, 8, 4, 0))
    idxd[5, 8:12] = 0
    assert np.array_equal(_bmp_rgb(bmp_d), pal8[idxd].astype(np.float64))

    # uncompressed 8-bit palette: same pixels, same features
    stride = (21 + 3) & ~3
    rows = bytearray()
    for fy in range(13):
        r = bytes(int(v) for v in idx[12 - fy]) + b"\x00" * (stride - 21)
        rows += r
    data_offset = 14 + 40 + 4 * 256
    info = struct.pack("<IiiHHIIiiII", 40, 21, 13, 1, 8, 0,
                       len(rows), 2835, 2835, 256, 0)
    table = bytearray()
    for r_, g_, b_ in pal8:
        table += bytes([int(b_), int(g_), int(r_), 0])
    flat = (b"BM" + struct.pack("<IHHI", data_offset + len(rows), 0, 0,
                                data_offset) + info + bytes(table)
            + bytes(rows))
    assert np.array_equal(_bmp_rgb(flat), want_rgb.astype(np.float64))

    # top-down RLE is illegal
    bad = bytearray(bmp)
    bad[22:26] = struct.pack("<i", -13)
    with _pytest.raises(ValueError, match="top-down RLE"):
        _bmp_rgb(bytes(bad))


def test_tokenizer_fertility(spark):
    """X172: under a merge list learned from English-like words, the
    English-like group segments into fewer pieces per word than the
    out-of-distribution group (the multilingual equity signal); totals
    match a hand count; per-group ratios are exact-integer divisions."""
    from emr_trino_autoscale_spark.operators.text import (
        bpe_learn,
        tokenizer_fertility,
    )

    en_rows = [("en", "the cat sat on the mat the cat ran")] * 6
    xx_rows = [("xx", "zq vw kj zq pf gx")] * 6
    df = spark.createDataFrame(en_rows + xx_rows, "lang string, text string")
    merges = [
        (m["left"], m["right"])
        for m in bpe_learn(
            df.filter("lang = 'en'"), n_merges=8, text_col="text"
        ).collect()
    ]
    got = {r["lang"]: r for r in tokenizer_fertility(df, merges).collect()}
    assert set(got) == {"en", "xx"}
    # hand count: en corpus = 9 words x 6 docs; xx = 6 x 6
    assert got["en"]["n_words"] == 54 and got["xx"]["n_words"] == 36
    # merges learned on en compress en below character-level; xx words
    # (disjoint bigrams) stay at ~1 piece per char
    assert got["en"]["fertility"] < float(got["xx"]["fertility"])
    assert float(got["xx"]["pieces_per_100_chars"]) == 100.0
    assert got["en"]["n_chars"] == 6 * len("the cat sat on the mat the cat ran".replace(" ", ""))


def test_template_fingerprint_and_farm_stats(spark):
    """X173: same-template pages with different fillings (words,
    numbers, any script) collide; structurally different pages don't;
    the rollup separates true farms (varied filling) from exact-dup
    clusters and hand-counts match."""
    from emr_trino_autoscale_spark.operators.text import (
        template_farm_stats,
        template_fingerprint,
    )

    farm = [
        (i, f"<li>Item {i}: widget-{i * 7} costs ${i}.99 (stock: {i})</li>")
        for i in range(1, 6)
    ]
    cyr = [(100, "<li>Товар 4: штука-28 costs $4.99 (stock: 4)</li>")]
    exact = [(200, "identical page"), (201, "identical page"),
             (202, "identical page")]
    other = [(300, "a completely different layout!")]
    df = spark.createDataFrame(farm + cyr + exact + other,
                               "doc_id long, text string")

    fps = {r["doc_id"]: r["fp"] for r in df.select(
        "doc_id", template_fingerprint("text").alias("fp")).collect()}
    assert len({fps[i] for i, _ in farm}) == 1       # farm collides
    assert fps[100] == fps[1]                        # script-agnostic
    assert fps[300] != fps[1] and fps[200] != fps[1]

    got = {r["template"]: r for r in template_farm_stats(df).collect()}
    assert len(got) == 2
    farm_row = got[fps[1]]
    assert farm_row["n_docs"] == 6 and farm_row["n_distinct_texts"] == 6
    assert farm_row["representative_id"] == 1
    dup_row = got[fps[200]]
    assert dup_row["n_docs"] == 3 and dup_row["n_distinct_texts"] == 1


# --- round-12: CCITT Group 4 (ITU-T T.6) — test-side spec encoder +
# TIFF wrapper, so the product decoder is exercised against
# independently-constructed payloads (the JPEG/FLAC convention).

_G4_VERT = {0: "1", 1: "011", -1: "010", 2: "000011", -2: "000010",
            3: "0000011", -3: "0000010"}

# T.4 run-length tables, run -> code string, typed from the published
# tables (independent of the decoder module's code -> run maps).
_G4_WHITE_ENC = {
    0: "00110101", 1: "000111", 2: "0111", 3: "1000", 4: "1011",
    5: "1100", 6: "1110", 7: "1111", 8: "10011", 9: "10100",
    10: "00111", 11: "01000", 12: "001000", 13: "000011", 14: "110100",
    15: "110101", 16: "101010", 17: "101011", 18: "0100111",
    19: "0001100", 20: "0001000", 21: "0010111", 22: "0000011",
    23: "0000100", 24: "0101000", 25: "0101011", 26: "0010011",
    27: "0100100", 28: "0011000", 29: "00000010", 30: "00000011",
    31: "00011010", 32: "00011011", 33: "00010010", 34: "00010011",
    35: "00010100", 36: "00010101", 37: "00010110", 38: "00010111",
    39: "00101000", 40: "00101001", 41: "00101010", 42: "00101011",
    43: "00101100", 44: "00101101", 45: "00000100", 46: "00000101",
    47: "00001010", 48: "00001011", 49: "01010010", 50: "01010011",
    51: "01010100", 52: "01010101", 53: "00100100", 54: "00100101",
    55: "01011000", 56: "01011001", 57: "01011010", 58: "01011011",
    59: "01001010", 60: "01001011", 61: "00110010", 62: "00110011",
    63: "00110100", 64: "11011", 128: "10010", 192: "010111",
    256: "0110111", 320: "00110110", 384: "00110111", 448: "01100100",
    512: "01100101", 576: "01101000", 640: "01100111",
    704: "011001100", 768: "011001101", 832: "011010010",
    896: "011010011", 960: "011010100", 1024: "011010101",
    1088: "011010110", 1152: "011010111", 1216: "011011000",
    1280: "011011001", 1344: "011011010", 1408: "011011011",
    1472: "010011000", 1536: "010011001", 1600: "010011010",
    1664: "011000", 1728: "010011011",
}
_G4_BLACK_ENC = {
    0: "0000110111", 1: "010", 2: "11", 3: "10", 4: "011", 5: "0011",
    6: "0010", 7: "00011", 8: "000101", 9: "000100", 10: "0000100",
    11: "0000101", 12: "0000111", 13: "00000100", 14: "00000111",
    15: "000011000", 16: "0000010111", 17: "0000011000",
    18: "0000001000", 19: "00001100111", 20: "00001101000",
    21: "00001101100", 22: "00000110111", 23: "00000101000",
    24: "00000010111", 25: "00000011000", 26: "000011001010",
    27: "000011001011", 28: "000011001100", 29: "000011001101",
    30: "000001101000", 31: "000001101001", 32: "000001101010",
    33: "000001101011", 34: "000011010010", 35: "000011010011",
    36: "000011010100", 37: "000011010101", 38: "000011010110",
    39: "000011010111", 40: "000001101100", 41: "000001101101",
    42: "000011011010", 43: "000011011011", 44: "000001010100",
    45: "000001010101", 46: "000001010110", 47: "000001010111",
    48: "000001100100", 49: "000001100101", 50: "000001010010",
    51: "000001010011", 52: "000000100100", 53: "000000110111",
    54: "000000111000", 55: "000000100111", 56: "000000101000",
    57: "000001011000", 58: "000001011001", 59: "000000101011",
    60: "000000101100", 61: "000001011010", 62: "000001100110",
    63: "000001100111", 64: "0000001111", 128: "000011001000",
    192: "000011001001", 256: "000001011011", 320: "000000110011",
    384: "000000110100", 448: "000000110101", 512: "0000001101100",
    576: "0000001101101", 640: "0000001001010", 704: "0000001001011",
    768: "0000001001100", 832: "0000001001101", 896: "0000001110010",
    960: "0000001110011", 1024: "0000001110100", 1088: "0000001110101",
    1152: "0000001110110", 1216: "0000001110111", 1280: "0000001010010",
    1344: "0000001010011", 1408: "0000001010100", 1472: "0000001010101",
    1536: "0000001011010", 1600: "0000001011011", 1664: "0000001100100",
    1728: "0000001100101",
}
_G4_EXT_ENC = {
    1792: "00000001000", 1856: "00000001100", 1920: "00000001101",
    1984: "000000010010", 2048: "000000010011", 2112: "000000010100",
    2176: "000000010101", 2240: "000000010110", 2304: "000000010111",
    2368: "000000011100", 2432: "000000011101", 2496: "000000011110",
    2560: "000000011111",
}


def _g4_runcode(run, black):
    """One T.4 run: greedy makeup codes (extended first), then the
    terminating code."""
    table = dict(_G4_BLACK_ENC if black else _G4_WHITE_ENC)
    table.update(_G4_EXT_ENC)
    parts = []
    while run >= 64:
        mk = min(2560, (run // 64) * 64)
        while mk not in table:
            mk -= 64
        parts.append(table[mk])
        run -= mk
    parts.append(table[run])
    return "".join(parts)


def _g4_encode_block(ink):
    """T.6-encode one (rows, width) {0,1} block: canonical mode choice
    (pass when b2 < a1, vertical within +-3, horizontal otherwise),
    EOFB terminator, zero-padded to a byte boundary."""
    rows, width = ink.shape
    bits = []

    def transitions(line):
        t = []
        prev = 0
        for x in range(width):
            if line[x] != prev:
                t.append(x)
                prev = line[x]
        return t

    ref = []
    for y in range(rows):
        cur = transitions(ink[y])
        a0, color, ci = -1, 0, 0
        while a0 < width:
            a1 = cur[ci] if ci < len(cur) else width
            ri = color
            while ri < len(ref) and ref[ri] <= a0:
                ri += 2
            b1 = ref[ri] if ri < len(ref) else width
            b2 = ref[ri + 1] if ri + 1 < len(ref) else width
            if b2 < a1:
                bits.append("0001")  # pass
                a0 = b2
            elif abs(a1 - b1) <= 3:
                bits.append(_G4_VERT[a1 - b1])
                a0, color, ci = a1, color ^ 1, ci + 1
            else:
                a2 = cur[ci + 1] if ci + 1 < len(cur) else width
                start = a0 if a0 > 0 else 0
                bits.append("001")
                bits.append(_g4_runcode(a1 - start, bool(color)))
                bits.append(_g4_runcode(a2 - a1, not color))
                a0, ci = a2, ci + 2
        ref = cur
    bits.append("000000000001" * 2)  # EOFB
    s = "".join(bits)
    s += "0" * (-len(s) % 8)
    return bytes(int(s[i:i + 8], 2) for i in range(0, len(s), 8))


def _encode_tiff_g4(ink, rows_per_strip=None, tiles=None, photometric=0,
                    fill_order=1, t6_options=None, big_endian=False):
    """Minimal TIFF 6.0 wrapper around G4-coded strips/tiles (the
    _encode_tiff layout conventions, bilevel edition)."""
    import numpy as np

    e = ">" if big_endian else "<"
    h, w = ink.shape
    segments = []
    if tiles:
        tw, th = tiles
        for y0 in range(0, -(-h // th) * th, th):
            for x0 in range(0, -(-w // tw) * tw, tw):
                block = np.zeros((th, tw), dtype=np.uint8)
                blk = ink[y0:y0 + th, x0:x0 + tw]
                block[:blk.shape[0], :blk.shape[1]] = blk
                segments.append(_g4_encode_block(block))
    else:
        rps = rows_per_strip or h
        for y0 in range(0, h, rps):
            segments.append(_g4_encode_block(ink[y0:y0 + rps]))
    if fill_order == 2:
        rev = bytes(int(f"{b:08b}"[::-1], 2) for b in range(256))
        segments = [bytes(rev[c] for c in s) for s in segments]

    entries = [
        (256, 3, [w]), (257, 3, [h]), (258, 3, [1]), (259, 3, [4]),
        (262, 3, [photometric]), (277, 3, [1]), (284, 3, [1]),
    ]
    if fill_order != 1:
        entries.append((266, 3, [fill_order]))
    if t6_options is not None:
        entries.append((293, 4, [t6_options]))
    if tiles:
        entries.append((322, 3, [tiles[0]]))
        entries.append((323, 3, [tiles[1]]))
    else:
        entries.append((278, 3, [rows_per_strip or h]))
    return _assemble_tiff(e, entries, segments, tiles)


def _assemble_tiff(e, entries, segments, tiles):
    """Two-pass IFD assembly (sizes first, then offsets) shared by the
    G4 wrapper: avoids the offset-of-offsets chicken-and-egg."""
    import struct

    counts = [len(s) for s in segments]
    count_tag, offset_tag = (325, 324) if tiles else (279, 273)
    all_entries = entries + [(count_tag, 4, counts), (offset_tag, 4, [0] * len(segments))]
    n = len(all_entries)
    ifd_off = 8
    sizes = {3: 2, 4: 4}
    # pass 1: blob layout
    val_off = ifd_off + 2 + 12 * n + 4
    blob_sizes = []
    for tag, typ, values in all_entries:
        sz = sizes[typ] * len(values)
        if sz > 4:
            blob_sizes.append(sz)
    seg_start = val_off + sum(blob_sizes)
    offs, cur = [], seg_start
    for c in counts:
        offs.append(cur)
        cur += c
    all_entries[-1] = (offset_tag, 4, offs)
    # pass 2: serialize
    blobs = []
    body = []
    voff = val_off
    for tag, typ, values in sorted(all_entries):
        code = {3: "H", 4: "I"}[typ] * len(values)
        raw = struct.pack(e + code, *values)
        if len(raw) <= 4:
            body.append(struct.pack(e + "HHI", tag, typ, len(values))
                        + raw + b"\x00" * (4 - len(raw)))
        else:
            blobs.append(raw)
            body.append(struct.pack(e + "HHII", tag, typ, len(values), voff))
            voff += len(raw)
    out = (b"MM" if e == ">" else b"II") + struct.pack(e + "HI", 42, ifd_off)
    out += struct.pack(e + "H", n) + b"".join(body) + struct.pack(e + "I", 0)
    out += b"".join(blobs) + b"".join(segments)
    return out


def test_g4_roundtrip_layout_matrix():
    """CCITT G4 (round 12): random bilevel images — the worst case for
    a transition coder — round-trip bit-exactly through _tiff_rgb in
    every layout: single strip, multi-strip, tiles (with edge padding),
    MM byte order, FillOrder 2, and both bilevel photometrics."""
    import numpy as np

    from emr_trino_autoscale_spark.operators.multimodal import _tiff_rgb

    rng = np.random.RandomState(12)
    ink = (rng.rand(21, 37) < 0.35).astype(np.uint8)
    white0 = np.repeat(((1 - ink) * 255)[..., None], 3, axis=2).astype(float)
    for kwargs in (
        {},
        {"rows_per_strip": 4},
        {"tiles": (16, 8)},
        {"big_endian": True, "rows_per_strip": 7},
        {"fill_order": 2},
        {"tiles": (8, 16), "fill_order": 2, "big_endian": True},
    ):
        got = _tiff_rgb(_encode_tiff_g4(ink, **kwargs))
        assert np.array_equal(got, white0), kwargs
    # photometric 1 inverts the display sense
    got = _tiff_rgb(_encode_tiff_g4(ink, photometric=1))
    assert np.array_equal(got, np.repeat((ink * 255)[..., None], 3,
                                         axis=2).astype(float))


def test_g4_mode_and_run_coverage():
    """Structured cases that force every T.6 mode and T.4 code class:
    all-white and all-black pages (vertical + horizontal with 0-runs),
    text-like rows (horizontal), shifted copies (vertical +-1..3),
    vanishing marks (pass mode), and a 6000-px-wide line whose black
    run needs extended + regular makeup codes chained."""
    import numpy as np

    from emr_trino_autoscale_spark.operators._ccitt import g4_decode
    from emr_trino_autoscale_spark.operators.multimodal import _tiff_rgb

    cases = []
    cases.append(np.zeros((5, 64), dtype=np.uint8))           # all white
    cases.append(np.ones((5, 64), dtype=np.uint8))            # all black
    text = np.zeros((8, 80), dtype=np.uint8)
    for y, (s, e) in enumerate([(3, 9), (4, 10), (6, 13), (3, 9),
                                (40, 77), (41, 76), (44, 79), (2, 80)]):
        text[y, s:e] = 1                                      # vert/horiz
    cases.append(text)
    passy = np.zeros((3, 40), dtype=np.uint8)
    passy[0, 5:10] = 1
    passy[0, 20:30] = 1
    passy[1, 5:10] = 1          # second mark vanishes -> pass mode
    cases.append(passy)
    wide = np.zeros((2, 6000), dtype=np.uint8)
    wide[0, 10:5900] = 1        # run 5890 = 2560+2560+704+66 -> chained
    wide[1, :] = 1
    cases.append(wide)
    for ink in cases:
        dec = g4_decode(_g4_encode_block(ink), ink.shape[1], ink.shape[0])
        assert np.array_equal(dec, ink)
    # and through the TIFF layer with strips
    ink = cases[2]
    got = _tiff_rgb(_encode_tiff_g4(ink, rows_per_strip=3))
    assert np.array_equal(
        got, np.repeat(((1 - ink) * 255)[..., None], 3, axis=2))


def test_g4_error_contracts_and_sniffer_parity():
    """Envelope: T6Options uncompressed mode, G3 compressions, and
    non-bilevel G4 all raise (the PPM-maxval rule — sniffer degrades
    to the stub, never mis-decodes); a G4 page produces IDENTICAL
    8-float features to the P6 PPM of the same pixels (lossless
    ground-truth twin, the SOF3 convention)."""
    import numpy as np
    import pytest as _pytest

    from emr_trino_autoscale_spark.operators.multimodal import (
        _tiff_rgb,
        sniffing_decoder,
    )

    rng = np.random.RandomState(3)
    ink = (rng.rand(16, 16) < 0.3).astype(np.uint8)

    with _pytest.raises(ValueError, match="uncompressed"):
        _tiff_rgb(_encode_tiff_g4(ink, t6_options=2))
    good = _encode_tiff_g4(ink)
    g3 = bytearray(good)
    i = g3.find(b"\x03\x01\x03\x00\x01\x00\x00\x00\x04")  # tag 259 (II)
    assert i > 0
    g3[i + 8] = 3  # claim T.4 (compression 3)
    with _pytest.raises(ValueError, match="G3"):
        _tiff_rgb(bytes(g3))
    depth8 = bytearray(good)
    j = depth8.find(b"\x02\x01\x03\x00\x01\x00\x00\x00\x01")  # tag 258
    assert j > 0
    depth8[j + 8] = 8
    with _pytest.raises(ValueError, match="1-bit"):
        _tiff_rgb(bytes(depth8))

    gray = ((1 - ink) * 255).astype(np.uint8)
    rgb = np.repeat(gray[..., None], 3, axis=2)
    ppm = b"P6\n16 16\n255\n" + rgb.tobytes()
    assert sniffing_decoder(good, "image") == sniffing_decoder(ppm, "image")
    # the raising variants degrade to the stub at the sniffer boundary
    for bad in (bytes(g3), bytes(depth8), _encode_tiff_g4(ink, t6_options=2)):
        out = sniffing_decoder(bad, "image")
        assert isinstance(out, list) and len(out) == 8


def test_g4_tables_prefix_free():
    """Transcription canary for the T.4 tables in the PRODUCT decoder:
    each color class (with the shared extended makeups) must be
    prefix-free and complete (64 terminating + 27 makeup + 13
    extended), or some valid stream would mis-parse."""
    from emr_trino_autoscale_spark.operators import _ccitt

    for table in (_ccitt._WHITE_CODES, _ccitt._BLACK_CODES):
        runs = sorted(table.values())
        assert runs == sorted(
            list(range(64)) + [64 * k for k in range(1, 28)]
            + [1792 + 64 * k for k in range(13)]
        )
        codes = {f"{code:0{ln}b}" for (ln, code) in table}
        assert len(codes) == len(table)
        for a in codes:
            for b in codes:
                assert a == b or not b.startswith(a), (a, b)


def test_decode_typographic_entities(spark):
    """X175: the bounded common-typography entity table decodes all
    three spellings (named/decimal/hex, case-insensitive), composes
    after html_to_text (&amp;-double-encoding lands here), strips
    invisible format junk, leaves the long tail intact, and the
    residue counter measures exactly what remains."""
    from pyspark.sql import functions as F

    from emr_trino_autoscale_spark.operators.text import (
        decode_typographic_entities,
        entity_residue_count,
        html_to_text,
    )

    rows = [
        # the VERDICT r11 example: numeric right-single-quote
        (0, "it&#8217;s here", "it's here"),
        (1, "it&#x2019;s HEX", "it's HEX"),
        (2, "it&rsquo;s named", "it's named"),
        (3, "A&mdash;B &ndash; C&hellip;", "A—B – C…"),
        (4, "caf&eacute; &#233; &#XE9;", "café é é"),
        (5, "&copy; 2026 &euro;5 &frac12;", "© 2026 €5 ½"),
        (6, "soft&shy;hyphen zero&#8203;width", "softhyphen zerowidth"),
        # long tail stays (honestly undecoded)
        (7, "&alpha; &#1234; stays", "&alpha; &#1234; stays"),
        (8, "AT&T not an entity; x & y", "AT&T not an entity; x & y"),
    ]
    df = spark.createDataFrame([(i, s) for i, s, _ in rows],
                               "i long, text string")
    got = {r["i"]: r for r in df.select(
        "i",
        decode_typographic_entities("text").alias("t"),
        entity_residue_count(decode_typographic_entities("text")).alias("n"),
    ).collect()}
    for i, _, want in rows:
        assert got[i]["t"] == want, (i, got[i]["t"])
    assert got[7]["n"] == 2 and got[0]["n"] == 0 and got[8]["n"] == 0

    # composition: html_to_text decodes &amp; LAST, so double-encoded
    # &amp;#8217; becomes &#8217; and this operator finishes the job
    comp = spark.createDataFrame(
        [("<p>it&amp;#8217;s</p>",)], "text string"
    ).select(
        decode_typographic_entities(html_to_text("text")).alias("t")
    ).collect()[0]["t"]
    assert comp == "it's"

    # idempotence on already-decoded text
    twice = df.select(decode_typographic_entities(
        decode_typographic_entities("text")).alias("t")).collect()
    assert [r["t"] for r in twice] == [got[i]["t"] for i, _, _ in rows]


def test_code_quality_signals(spark):
    """X176: the published code-filter heuristics — line geometry,
    alphanumeric fraction, comment density, autogenerated marker,
    base64 blob — and the standard keep verdict on hand-built files."""
    from emr_trino_autoscale_spark.operators.text import code_quality_signals

    good = "def f(x):\n    # doubles\n    return x * 2\n\nprint(f(21))"
    minified = "var a=" + "Zm9vYmFyYmF6cXV4" * 8 + ";x=1;" + "y" * 1200
    autogen = "// AUTO-GENERATED by protoc. DO NOT EDIT\nint x = 1;"
    symbols = "@@@@ $$$$ %%%% ^^^^ &&&& !!!! ???? ~~~~ ||||"
    comments = "# a\n# b\n# c\ncode()"
    crlf = "int a = 1;\r\n// win\r\nint b = 2;"
    df = spark.createDataFrame(
        [(0, good), (1, minified), (2, autogen), (3, symbols),
         (4, comments), (5, crlf)],
        "i long, text string",
    )
    got = {r["i"]: r for r in code_quality_signals(df).collect()}
    # CRLF corpora: the trailing \r never rides the line geometry
    assert got[5]["n_lines"] == 3 and got[5]["max_line_len"] == 10
    assert abs(got[5]["mean_line_len"] - 26 / 3.0) < 1e-12
    assert abs(got[5]["comment_line_frac"] - 1 / 3.0) < 1e-12
    assert got[0]["code_keep"] and not got[0]["has_autogen_marker"]
    assert got[0]["n_lines"] == 5 and got[0]["max_line_len"] == 16
    assert not got[1]["code_keep"]        # 1200-char line over the cap
    assert got[1]["has_base64_blob"]
    assert not got[2]["code_keep"] and got[2]["has_autogen_marker"]
    assert not got[3]["code_keep"]        # alnum fraction ~0
    assert got[3]["frac_alnum"] < 0.25
    assert abs(got[4]["comment_line_frac"] - 0.75) < 1e-12
    # exact mean-line-length arithmetic (chars net of separators)
    assert abs(got[0]["mean_line_len"]
               - (len(good) - 4) / 5.0) < 1e-12


def test_script_profile(spark):
    """X177: script-letter fractions, dominant script, and the
    symbol-soup/none edge cases on mixed-script documents."""
    from emr_trino_autoscale_spark.operators.text import script_profile

    rows = [
        (0, "plain english text"),
        (1, "Привет мир"),                      # cyrillic
        (2, "日本語のテキストです"),               # kana + cjk
        (3, "mixed: hello Привет 你好"),
        (4, "1234 @@@ !!!"),                    # no script letters
        (5, "한국어 문서"),                      # hangul
    ]
    df = spark.createDataFrame(rows, "i long, text string")
    got = {r["i"]: r for r in script_profile(df).collect()}
    assert got[0]["dominant_script"] == "latin"
    assert got[0]["frac_latin"] == 1.0
    assert got[1]["dominant_script"] == "cyrillic"
    assert got[2]["dominant_script"] in ("kana", "cjk")
    assert got[2]["frac_kana"] + got[2]["frac_cjk"] == 1.0
    assert got[3]["dominant_script"] == "latin"   # 10 latin > 6 cyr > 2 cjk
    assert 0 < got[3]["frac_cyrillic"] < got[3]["frac_latin"]
    assert got[4]["dominant_script"] == "none"
    assert got[4]["script_letter_frac"] == 0.0
    assert got[1]["script_letters"] == 9  # integer letter mass exposed
    assert got[5]["dominant_script"] == "hangul"
    # fractions are over LETTER mass: punctuation/digits don't dilute
    assert abs(sum(got[3][f"frac_{s}"] for s in (
        "latin", "cyrillic", "greek", "arabic", "hebrew",
        "devanagari", "cjk", "hangul", "kana")) - 1.0) < 1e-12


def test_script_profile_math_symbols_are_not_letters(spark):
    """Round-12 review finding: the Latin-1 block contains the math
    symbols U+00D7/U+00F7 — a dimension table like '3 x 4 / 2' written
    with real multiply/divide signs must read as symbol soup, not as
    latin prose."""
    from emr_trino_autoscale_spark.operators.text import script_profile

    df = spark.createDataFrame([(0, "3 \u00d7 4 \u00f7 2 \u00d7 8")],
                               "i long, text string")
    r = script_profile(df).collect()[0]
    assert r["dominant_script"] == "none"
    assert r["script_letters"] == 0 and r["script_letter_frac"] == 0.0


def test_mixture_allocation_waterfill(spark):
    """X178: capped waterfilling — a small high-weight source caps at
    max_epochs x availability and its demand redistributes over the
    uncapped remainder; allocation conserves the budget exactly when
    capacity allows and degrades to total capacity when it doesn't."""
    import pytest as _pytest

    from emr_trino_autoscale_spark.operators.text import mixture_allocation

    df = spark.createDataFrame(
        [("a", 100), ("b", 100), ("c", 1000), ("d", 500)],
        "source string, n_tokens long",
    )
    got = {r["source"]: r for r in mixture_allocation(
        df, {"a": 0.5, "b": 0.3, "c": 0.2}, total_tokens=1000
    ).collect()}
    # a wants 500 -> caps at 100; b (renormalized) wants 540 -> caps at
    # 100; c takes the remaining 800 (under its 1000 cap)
    assert got["a"]["allocated"] == 100 and got["a"]["capped"]
    assert got["b"]["allocated"] == 100 and got["b"]["capped"]
    assert got["c"]["allocated"] == 800 and not got["c"]["capped"]
    assert got["d"]["allocated"] == 0 and got["d"]["target_weight"] == 0.0
    assert sum(r["allocated"] for r in got.values()) == 1000
    assert abs(got["a"]["epochs"] - 1.0) < 1e-9
    assert abs(got["c"]["epochs"] - 0.8) < 1e-9

    # budget exceeds capacity: everything caps, allocation = capacity
    over = {r["source"]: r for r in mixture_allocation(
        df, {"a": 0.6, "b": 0.4}, total_tokens=10_000, max_epochs=2.0
    ).collect()}
    assert over["a"]["allocated"] == 200 and over["b"]["allocated"] == 200
    assert over["a"]["capped"] and over["b"]["capped"]

    with _pytest.raises(ValueError, match="max_epochs"):
        mixture_allocation(df, {"a": 1.0}, 10, max_epochs=0)
    with _pytest.raises(ValueError, match="non-negative"):
        mixture_allocation(df, {"a": -0.1}, 10)


def test_html_meta_robots(spark):
    """X179: both attribute orders, any quote style, case folding,
    comma trimming, the 'none' implication, and no false positives on
    description metas or prose mentioning robots."""
    from emr_trino_autoscale_spark.operators.text import (
        html_meta_robots,
        is_noindex,
    )

    rows = [
        (0, "<meta name='robots' content='NOINDEX, nofollow'><p>x</p>"),
        (1, '<META CONTENT="none" NAME="ROBOTS"><p>y</p>'),
        (2, "<meta name=robots content=noarchive>"),
        (3, "<meta name='description' content='robots are great'>"),
        (4, "robots everywhere but no meta tag"),
        (5, "<meta name='robots' content='index, follow'>"),
        # unquoted-name boundary: robots must not match as a bare
        # prefix of a longer attribute value (ADVICE r12)
        (6, '<meta content="noindex" name=robotsxyz>'),
        (7, "<meta name=robots-custom content=noindex>"),
        (8, '<meta content="noindex" name=robots>'),
    ]
    df = spark.createDataFrame(rows, "i long, text string")
    got = {r["i"]: r for r in df.select(
        "i",
        html_meta_robots("text").alias("d"),
        is_noindex("text").alias("no"),
    ).collect()}
    assert got[0]["d"] == ["nofollow", "noindex"] and got[0]["no"]
    assert got[1]["d"] == ["none"] and got[1]["no"]
    assert got[2]["d"] == ["noarchive"] and not got[2]["no"]
    assert got[3]["d"] == [] and not got[3]["no"]
    assert got[4]["d"] == [] and not got[4]["no"]
    assert got[5]["d"] == ["follow", "index"] and not got[5]["no"]
    assert got[6]["d"] == [] and not got[6]["no"]
    assert got[7]["d"] == [] and not got[7]["no"]
    assert got[8]["d"] == ["noindex"] and got[8]["no"]


def test_readability_scores(spark):
    """X180: counters on hand-counted prose, formula arithmetic against
    a manual computation, monotonicity (simple prose scores easier than
    academic run-ons), and the degenerate-doc NULL contract."""
    from emr_trino_autoscale_spark.operators.text import readability_scores

    simple = "The cat sat. The dog ran. We had fun."
    dense = ("Notwithstanding considerable organizational heterogeneity, "
             "interdepartmental prioritization methodologies necessitate "
             "comprehensive stakeholder realignment initiatives.")
    rows = [(0, simple), (1, dense), (2, ""), (3, "word")]
    df = spark.createDataFrame(rows, "i long, text string")
    got = {r["i"]: r for r in readability_scores(df).collect()}

    assert got[0]["n_sentences"] == 3 and got[0]["n_words"] == 9
    # hand count: the(1) cat(1) sat(1) the(1) dog(1) ran(1) we(1)
    # had(1) fun(1) = 9 syllables (every vowel group single, no
    # silent e)
    assert got[0]["n_syllables"] == 9
    wps, spw = 9 / 3, 9 / 9
    assert abs(got[0]["flesch_ease"] - (206.835 - 1.015 * wps - 84.6 * spw)) < 1e-9
    assert abs(got[0]["fk_grade"] - (0.39 * wps + 11.8 * spw - 15.59)) < 1e-9
    # academic run-on reads much harder on both scales
    assert got[1]["flesch_ease"] < got[0]["flesch_ease"] - 50
    assert got[1]["fk_grade"] > got[0]["fk_grade"] + 5
    # degenerate docs: no words -> NULL scores, never a divide-by-zero
    assert got[2]["flesch_ease"] is None and got[2]["fk_grade"] is None
    assert got[2]["n_words"] == 0
    # single word without terminal punctuation still counts a sentence
    assert got[3]["n_sentences"] == 1 and got[3]["n_words"] == 1


def test_env_capped_int_clamps_driver_dispatch_knobs(monkeypatch):
    """VERDICT r14 task 5: the driver-dispatch env caps must be
    sanity-bounded — an oversized value re-creates the guide-§5
    driver-collect hazard the defaults avoid. Unset -> default, 0 stays
    0 (disable), in-range honored, above-ceiling clamps to the ceiling,
    garbage/negative falls back to the default."""
    from emr_trino_autoscale_spark.operators._env import env_capped_int

    name = "SPARK_GRAFT_TEST_CAP"
    monkeypatch.delenv(name, raising=False)
    assert env_capped_int(name, 500, 5000) == 500
    monkeypatch.setenv(name, "0")
    assert env_capped_int(name, 500, 5000) == 0
    monkeypatch.setenv(name, "1234")
    assert env_capped_int(name, 500, 5000) == 1234
    monkeypatch.setenv(name, "999999999")
    assert env_capped_int(name, 500, 5000) == 5000
    monkeypatch.setenv(name, "-7")
    assert env_capped_int(name, 500, 5000) == 500
    monkeypatch.setenv(name, "not-a-number")
    assert env_capped_int(name, 500, 5000) == 500

    # The two live knobs route through the clamp: a huge env value can
    # never authorize an unbounded collect (ceilings documented at the
    # call sites: 5M edges / 2M vocab rows ~ 1 GB driver worst-case).
    import inspect

    from emr_trino_autoscale_spark.operators import dedup as _dedup
    from emr_trino_autoscale_spark.operators import text as _text

    assert "env_capped_int" in inspect.getsource(_dedup.connected_components)
    assert "env_capped_int" in inspect.getsource(_text.bpe_learn)


def test_pagerank_one_pass_degree_derivation(spark):
    """Round 15: setup derives node universe + out-degrees in one
    union+agg pass. Pin the edge cases that pass owns: duplicate edges
    collapse via the distinct (a->b twice counts degree once), a node
    appearing as BOTH src and dst gets its src-count (not the union
    total), and a dst-only node stays dangling (NULL degree -> its mass
    redistributes). Hand arithmetic, 1 iteration, damping 0.85."""
    from emr_trino_autoscale_spark.operators.graph import pagerank

    edges = [("a", "b"), ("a", "b"), ("a", "c"), ("b", "a")]
    df = spark.createDataFrame(edges, "src string, dst string")
    got = {
        r.node: r.rank for r in pagerank(df, iterations=1, damping=0.85).collect()
    }
    assert set(got) == {"a", "b", "c"}
    third = 1.0 / 3.0
    teleport = 0.15 / 3.0
    dang = 0.85 * third / 3.0  # c is dangling (dst-only)
    # a: fed by b (outdeg 1 -> full third)
    assert abs(got["a"] - (teleport + dang + 0.85 * third)) < 1e-12
    # b: fed by a (outdeg 2 -> half of a's third), the duplicate a->b
    # edge must NOT double the contribution
    assert abs(got["b"] - (teleport + dang + 0.85 * (third / 2.0))) < 1e-12
    # c: fed by a's other half-share
    assert abs(got["c"] - (teleport + dang + 0.85 * (third / 2.0))) < 1e-12
    assert abs(sum(got.values()) - 1.0) < 1e-9


def test_near_dup_lsh_mega_bucket_tile_shard_parity(spark, monkeypatch):
    """Round 15 §2.5 straggler guard: a bucket above
    $SPARK_GRAFT_LSH_BUCKET_CAP is sharded into the blocked tile scheme
    (every pair scored on exactly one tile). Build a deliberately
    degenerate geometry — ONE plane, all vectors projecting positive,
    so the whole corpus lands in a single (band, bucket) group — and
    force a tiny cap so the shard path actually runs: the emitted pair
    set and every 4-decimal cosine must be identical to the unguarded
    (cap=0) path and to the fold-form reference."""
    import math

    rows = []
    for i in range(40):
        # a fan of vectors with pairwise cosines spanning the threshold
        th = (i / 39.0) * (math.pi / 3)
        rows.append((i + 1, [math.cos(th), math.sin(th)] + [0.0] * 62))
    corpus = spark.createDataFrame(rows, "vec_id long, embedding array<float>")
    planes = [[1.0] + [0.0] * 63]  # every vector buckets together

    def run():
        return sorted(
            (r["id_a"], r["id_b"], str(r["cosine"]))
            for r in similarity.near_dup_pairs_lsh(
                corpus, planes, n_bands=1, threshold=0.6, vectorized=True
            ).collect()
        )

    monkeypatch.setenv("SPARK_GRAFT_LSH_BUCKET_CAP", "7")  # 40 rows -> 6 blocks
    sharded = run()
    monkeypatch.setenv("SPARK_GRAFT_LSH_BUCKET_CAP", "0")  # unguarded path
    whole = run()
    monkeypatch.delenv("SPARK_GRAFT_LSH_BUCKET_CAP")
    fold = sorted(
        (r["id_a"], r["id_b"], str(r["cosine"]))
        for r in similarity.near_dup_pairs_lsh(
            corpus, planes, n_bands=1, threshold=0.6
        ).collect()
    )
    assert sharded == whole == fold
    assert len(sharded) > 10  # the fan actually crosses the threshold
