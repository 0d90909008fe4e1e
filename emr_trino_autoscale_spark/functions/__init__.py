"""Scalar Column helpers — the reference's scalar-function surface
(SURVEY.md §2.8, F1-F11) expressed as Catalyst column expressions.

Everything here stays JVM-side (whole-stage codegen); no Python UDFs.
Reference citations are to ``/root/reference/src/main/scala/com/amazonaws/emr``.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F
from pyspark.sql.types import DecimalType

# Determinism conventions (FIXTURES.md §4): DOUBLE aggregates are
# rounded to 4 decimals via DECIMAL(38,4) and emitted as the decimal's
# scale-padded STRING ("1.2340") so Spark and the DuckDB oracle
# serialize byte-identically (Spark decimals stringify scale-padded,
# DuckDB DECIMAL->VARCHAR does too; DOUBLE reprs differ). Timestamps
# are emitted as formatted UTC strings.
_DEC4 = DecimalType(38, 4)
TS_FMT = "yyyy-MM-dd HH:mm:ss"


def dec4(col: Column | str) -> Column:
    """Normalize a DOUBLE aggregate for oracle comparison.

    Output is STRING (scale-padded, e.g. ``"1.2340"``): the oracle twin
    is ``CAST(CAST(ROUND(x,4) AS DECIMAL(38,4)) AS VARCHAR)`` — verified
    byte-identical across both engines for |x| < 1e12.
    """
    return (
        F.round(F.col(col) if isinstance(col, str) else col, 4)
        .cast(_DEC4)
        .cast("string")
    )


def fmt_ts(col: Column | str) -> Column:
    """Normalize a TIMESTAMP for oracle comparison (UTC string)."""
    return F.date_format(col, TS_FMT)


# F1 — host extraction regex (TrinoJmxRest.scala:66, TrinoJmxEmr.scala:80).
HOST_PATTERN = ".*//(.*):.*"


def host_from_uri(col: Column | str) -> Column:
    return F.regexp_extract(col, HOST_PATTERN, 1)


# F2 — case-insensitive string equality (Workers.scala:109-111,155,250-251).
def ci_eq(a: Column | str, b: Column | str) -> Column:
    a = F.col(a) if isinstance(a, str) else a
    b = F.col(b) if isinstance(b, str) else b
    return F.lower(a) == F.lower(b)


# F4 — step-scaling clamp arithmetic (scaling/algo/StepScalingAlgorithm.scala:21-26):
#   expand(running, required) = min(max(running + stepExpand, required), maxCapacity)
#   shrink(running)           = max(running - stepShrink, minCapacity)
def step_expand(running: Column, required: Column, step: int, max_capacity: int) -> Column:
    return F.least(F.greatest(running + F.lit(step), required), F.lit(max_capacity))


def step_shrink(running: Column, step: int, min_capacity: int) -> Column:
    return F.greatest(running - F.lit(step), F.lit(min_capacity))


# F5 — sign dispatch on (running - count) (cluster/Workers.scala:170-190):
# positive delta => SHRINK, negative => EXPAND, zero => NONE.
def sign_dispatch(running: Column, count: Column) -> Column:
    delta = running - count
    return (
        F.when(delta > 0, F.lit("SHRINK"))
        .when(delta < 0, F.lit("EXPAND"))
        .otherwise(F.lit("NONE"))
    )


# F6 — uniform integer distribution (cluster/Workers.scala:231-238):
# distribute(value, groups)[i] = value/groups + 1 if i < value%groups else value/groups
# (0-based position i; Scala integer division).
def distribute_alloc(idx: Column, value: Column, groups: Column) -> Column:
    q = F.floor(value / groups)
    return (q + F.when(idx < value % groups, F.lit(1)).otherwise(F.lit(0))).cast("bigint")


# J5 — positional zip of the configured instance-type / weight lists
# into the fleet's instances dimension (cluster/Workers.scala:300-310:
# ``instanceTypes zip instanceWights`` plus the two sanity checks that
# reject empty or length-mismatched configurations).
def config_zip_dimension(instance_types: list[str], weights: list[int]) -> Column:
    """array<struct<name,weight>> literal column from the two config
    lists; raises on the reference's invalid-configuration cases."""
    if not instance_types or not weights:
        raise ValueError("Wrong Instance Fleet configurations")  # Workers.scala:304-306
    if len(instance_types) != len(weights):
        raise ValueError("Wrong Instance Fleet configurations")  # Workers.scala:307-309
    return F.arrays_zip(
        F.array(*[F.lit(t) for t in instance_types]).alias("name"),
        F.array(*[F.lit(int(w)) for w in weights]).alias("weight"),
    )


# Shared 60-bit digest (VERDICT r6 task 7): THE canonical JVM-side
# hashing expression for signature / shingle / bucketing operators.
# Why this exact form everywhere:
# - md5-rooted so every oracle (DuckDB has no xxhash64) can replay the
#   identical values in SQL: conv(substring(md5(x),1,15),16,10);
# - 15 hex chars = 60 bits, safely inside signed int64 for both engines;
# - JVM expression, NOT a Python/Arrow loop: rounds 5-6 measured that
#   per-element cryptographic hashing with no repeat structure loses
#   1.4-2x when routed through Arrow (docs/SCALE.md "refined rule" —
#   the ngram_hashes and PPJoin-pack A/Bs). New hashing operators must
#   call this helper instead of re-deriving the expression so that
#   regression can't be reintroduced one call site at a time.
def md5_long60(col: Column) -> Column:
    """60-bit integer digest of any string column/expression:
    ``conv(substring(md5(x), 1, 15), 16, 10)`` cast to long. Usable
    directly or inside higher-order-function lambdas
    (``F.transform(toks, md5_long60)``)."""
    return F.conv(F.substring(F.md5(col), 1, 15), 16, 10).cast("long")
