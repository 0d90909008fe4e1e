"""Default persist registry for operator-internal intermediates.

Operators that materialize an intermediate consumed by several plan
branches (posting lists, contingency cells, distinct edge frames, ...)
take a caller-owned ``persist_fn`` — declared queries pass
``queries._cache_scoped`` (released on the next declared query). When
the caller passes nothing, the old behavior was a bare
``.persist(MEMORY_AND_DISK)`` that nothing ever unpersisted: across a
long session (the 188-query bench, a notebook) those cached blocks
accumulated for the lifetime of the SparkContext, squatting executor
storage memory (ADVICE r8). ``default_persist`` keeps the persist but
REGISTERS the frame, and ``release_default_persists`` (wired into
``queries.release_caches``, which bench.py / tools/check_oracle.py
already call) drains the registry with non-blocking unpersists.

Lifecycle contract: frames stay cached until the caller releases —
``default_persist`` never releases eagerly, because the returned plan
references the cached frame (unpersisting before materialization would
just silently recompute). Unpersisting an already-unpersisted frame is
a Spark no-op, so operators that clean up eagerly on error paths can do
so without deregistering.
"""

from __future__ import annotations

from pyspark.sql import DataFrame

_DEFAULT_PERSISTS: list[DataFrame] = []


def default_persist(df: DataFrame) -> DataFrame:
    from pyspark import StorageLevel

    df = df.persist(StorageLevel.MEMORY_AND_DISK)
    _DEFAULT_PERSISTS.append(df)
    return df


def release_default_persists() -> None:
    while _DEFAULT_PERSISTS:
        # A registered frame's SparkContext may be stopped by now (session
        # restart between queries in a long pytest/notebook run); one dead
        # frame must not abort the drain and leave the rest live (ADVICE r9).
        try:
            _DEFAULT_PERSISTS.pop().unpersist(blocking=False)
        except Exception:  # noqa: BLE001 — drain must complete
            pass
