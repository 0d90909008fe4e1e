"""Arrow scalar pandas UDFs (the sanctioned Python slow path: Series in,
Series out, one Arrow batch at a time — never row-at-a-time).

NOTE: no ``from __future__ import annotations`` here — pandas_udf reads
the *evaluated* type hints to infer the UDF kind; stringized annotations
break the inference.
"""

import pandas as pd

from pyspark.sql.functions import pandas_udf


@pandas_udf("long")
def vowel_count(s: pd.Series) -> pd.Series:
    """Vectorized vowel count per string (oracle-replayable: equals
    length(regexp_replace(lower(text), '[^aeiou]', '', 'g')))."""
    return s.str.lower().str.count(r"[aeiou]").astype("int64")


def srp_bucket_vectorized(planes):
    """Factory: Arrow-batched SRP bucket id for the 100 TB corpus path.

    One NumPy GEMM per Arrow batch replaces n_planes interpreted
    higher-order-function folds per row (HOF lambdas never reach
    codegen; measured 11x on a 200k-row corpus, widening with size
    as fixed overhead amortizes). The
    sign test reproduces ``similarity.srp_projections_literal``:
    ``round(projection, 6) > 0`` — parity with the fold form is
    asserted on real embeddings in tests/test_extensions.py (pairwise
    vs sequential float summation could in principle flip a projection
    sitting within ~1e-7 of a rounding edge; the test pins it).

    Returns a pandas_udf over the raw ``array<float>`` embedding
    column; the plane matrix rides into executors via udf-closure
    broadcast, the moral equivalent of a broadcast model table.
    """
    import numpy as np

    mat = np.asarray(planes, dtype=np.float64)          # (P, D)
    weights = (1 << np.arange(mat.shape[0])).astype(np.int64)

    @pandas_udf("int")
    def bucket(vecs: pd.Series) -> pd.Series:
        if len(vecs) == 0:
            return pd.Series([], dtype="int32")
        m = np.stack([np.asarray(v, dtype=np.float64) for v in vecs])
        projs = np.round(m @ mat.T, 6)                   # (N, P)
        return pd.Series(((projs > 0) @ weights).astype("int32"))

    return bucket


def nearest_centroid_vectorized(c_ids, c_mat, ret_type="long"):
    """Factory: Arrow-batched IVF coarse quantization for the corpus
    path — one NumPy GEMM per batch against the (small, by
    construction) centroid matrix instead of |C| interpreted HOF folds
    per row.

    ``c_ids``/``c_mat`` must be sorted by ascending centroid id: the
    tie-break is np.argmax's first-occurrence rule, which then matches
    the DataFrame form's ``ORDER BY sim DESC, c_id ASC`` exactly.
    Similarities are rounded to 6 decimals before the argmax, same as
    the fold form, so cross-form parity holds away from ~1e-7 rounding
    edges (pinned on real data in tests/test_extensions.py).
    """
    import numpy as np

    ids = np.asarray(c_ids)
    mat = np.asarray(c_mat, dtype=np.float64)
    nrm = np.linalg.norm(mat, axis=1)
    nrm[nrm == 0.0] = 1.0
    unit = mat / nrm[:, None]

    @pandas_udf(ret_type)
    def assign(vecs: pd.Series) -> pd.Series:
        if len(vecs) == 0:
            return pd.Series([], dtype=object if ids.dtype == object else None)
        m = np.stack([np.asarray(v, dtype=np.float64) for v in vecs])
        vn = np.linalg.norm(m, axis=1)
        vn[vn == 0.0] = 1.0
        sims = np.round((m / vn[:, None]) @ unit.T, 6)
        return pd.Series(ids[np.argmax(sims, axis=1)])

    return assign


def _make_pair_cosine():
    # The kernel is a CLOSURE, not a module attribute, on purpose:
    # cloudpickle serializes module-level functions by reference, which
    # would make every executor import this module — and the
    # module-scope pandas_udf(...) calls need an active SparkSession
    # the workers don't have. A closure pickles by value.
    @pandas_udf("double")
    def pair_cosine(va: pd.Series, vb: pd.Series) -> pd.Series:
        """Arrow-batched cosine between two vector COLUMNS (one dot per
        candidate pair row, batched into a single NumPy
        elementwise-product row-sum). The verify step of LSH near-dup
        emits millions of candidate rows per task; the interpreted HOF
        cosine fold there measured ~10x slower at sf0.1 (the same
        interpreted-lambda wall as every other hot fold in this
        module). Raw double out — callers apply the shared ROUND(, 4)
        Spark-side so the fold and Arrow forms round identically (q28
        precedent: NumPy float64 dots match DuckDB's
        list_inner_product at 4-decimal rounding)."""
        import numpy as np

        if len(va) == 0:
            return pd.Series([], dtype="float64")
        a = np.stack([np.asarray(v, dtype=np.float64) for v in va])
        b = np.stack([np.asarray(v, dtype=np.float64) for v in vb])
        an = np.linalg.norm(a, axis=1)
        bn = np.linalg.norm(b, axis=1)
        an[an == 0.0] = 1.0
        bn[bn == 0.0] = 1.0
        return pd.Series(np.einsum("ij,ij->i", a, b) / (an * bn))

    return pair_cosine


pair_cosine = _make_pair_cosine()

# Dedicated NONDETERMINISTIC instance for call sites that filter on the
# UDF's own result (the LSH verify): Catalyst inlines a DETERMINISTIC
# scalar UDF into both the pushed-down filter and the projection, so the
# executed plan would run it twice over the full candidate set.
# wrapper.asNondeterministic() MUTATES the shared underlying
# UserDefinedFunction in place (verified on pyspark 4.1.2: after
# `g = f.asNondeterministic()`, a fresh `f(col)` expression analyzes
# deterministic=False too), so calling it on pair_cosine at a use site —
# or even aliasing at module scope — would silently make every other
# pair_cosine plan in the session nondeterministic (order-dependent
# plan shapes and perf anchors). A second, independent UDF instance
# over the same kernel is the only isolation that holds
# (tests/test_plan_guard.py::test_pair_cosine_stays_deterministic_after_lsh_build).
pair_cosine_nd = _make_pair_cosine().asNondeterministic()


def cosine_cost_vectorized(center):
    """Factory: Arrow-batched k-means|| seeding cost — per vector,
    ``max(0, 1 - cos(v, center))`` against ONE driver-side center
    (the seed). NumPy matrix-vector product per batch instead of a
    64-element interpreted HOF fold per row (measured 2.5 s -> 0.5 s
    on the sf0.1 embeddings during init). Rounded to 6 decimals like
    every other cosine in this module so replays agree."""
    import numpy as np

    c = np.asarray(center, dtype=np.float64)
    cn = np.linalg.norm(c)
    unit = c / (cn if cn else 1.0)

    @pandas_udf("double")
    def cost(vecs: pd.Series) -> pd.Series:
        if len(vecs) == 0:
            return pd.Series([], dtype="float64")
        m = np.stack([np.asarray(v, dtype=np.float64) for v in vecs])
        vn = np.linalg.norm(m, axis=1)
        vn[vn == 0.0] = 1.0
        sims = np.round((m / vn[:, None]) @ unit, 6)
        return pd.Series(np.maximum(0.0, 1.0 - sims))

    return cost
