"""Keyed-state twins of the reference's mutable clocks (SURVEY.md §2.5
W5/W6, §2.9 D3/D6).

The reference holds three pieces of mutable state in a single JVM:

* ``scalingLastOpTimeMs`` — the cooldown clock
  (scaling/ScalingManager.scala:24), reset when a resize is OBSERVED in
  progress (:33), not when an action is issued;
* per-group ``lastSuspendedTimeMs`` carried across refreshes
  (cluster/Workers.scala:256-262);
* last-requested capacity used for request dedup (ScalingManager.scala:88).

Here each becomes explicit keyed state in ``applyInPandasWithState``
(key = cluster id / task-group id), so the same decision cascade runs
over a live stream with bounded state. The processors are pure
per-group functions of (rows, previous state) — no wall clock, no
globals — so they are unit-testable in batch via ``applyInPandas``
with an injected initial state (see tests/test_stateful.py).

Scale note: state size is O(#groups) (<= 48 per cluster —
Config.scala:93-94), trivially partitionable by cluster id; the shuffle
is on the state key only.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd

from pyspark.sql.types import (
    BooleanType,
    DoubleType,
    IntegerType,
    LongType,
    StringType,
    StructField,
    StructType,
)

COOLDOWN_MS = 2 * 60 * 1000  # ScalingManager.scala:21
SUSPENSION_MS = 10 * 60 * 1000  # Workers.scala:35

# Input rows: one evaluation tick per (cluster) key.
EVAL_INPUT_SCHEMA = StructType(
    [
        StructField("cluster_id", StringType()),
        StructField("ts_ms", LongType()),
        StructField("is_idle", BooleanType()),
        StructField("is_resizing", BooleanType()),
        StructField("required", IntegerType()),
        StructField("running", IntegerType()),
        StructField("requested", IntegerType()),
        StructField("verdict", StringType()),  # D1 output for this tick
    ]
)

DECISION_SCHEMA = StructType(
    [
        StructField("cluster_id", StringType()),
        StructField("ts_ms", LongType()),
        StructField("action", StringType()),
        StructField("capacity", IntegerType()),
        StructField("reason", StringType()),
    ]
)

COOLDOWN_STATE_SCHEMA = StructType([StructField("last_op_ms", LongType())])


def _plan(verdict: str, running: int, required: int, policy) -> tuple[str, int]:
    """Pure-python mirror of operators.scaling.plan_action (D2), used
    inside the stateful processor (per-key rows are tiny — <= 48 groups)."""
    expand = min(max(running + policy.step_expand, required), policy.max_capacity)
    shrink = max(running - policy.step_shrink, policy.min_capacity)
    if verdict == "EXPAND":
        return "EXPAND", expand
    if verdict == "SHRINK":
        return "SHRINK", shrink
    if 0 < required < running:  # ScalingAlgorithm.scala:18 quirk
        return "EXPAND", expand
    return "NONE", running


def decision_cascade_rows(
    rows: pd.DataFrame, last_op_ms: int, policy
) -> tuple[list[dict], int]:
    """D3 — the priority cascade (ScalingManager.scala:26-46) over a
    chronologically sorted micro-batch of evaluation ticks for one key.

    Returns (decisions, new_last_op_ms). Order of precedence per tick:
    idle -> shrink-to-min (bypasses cooldown); resizing -> skip AND
    reset the cooldown clock; required > running -> expand-to-required
    (bypasses cooldown); else evaluate D2 only if the cooldown elapsed.
    """
    out: list[dict] = []
    for r in rows.sort_values("ts_ms").itertuples(index=False):
        ts = int(r.ts_ms)
        if bool(r.is_idle):
            action, capacity, reason = "SHRINK", policy.min_capacity, "idle"
        elif bool(r.is_resizing):
            last_op_ms = ts  # ScalingManager.scala:33 — observed resize resets clock
            action, capacity, reason = "NONE", int(r.running), "resizing"
        elif int(r.required) > int(r.running):
            action, capacity, reason = "EXPAND", int(r.required), "required_workers"
        elif ts - last_op_ms > COOLDOWN_MS:
            action, capacity = _plan(str(r.verdict), int(r.running), int(r.required), policy)
            reason = "evaluated"
        else:
            action, capacity, reason = "NONE", int(r.running), "cooldown"
        out.append(
            {
                "cluster_id": r.cluster_id,
                "ts_ms": ts,
                "action": action,
                "capacity": capacity,
                "reason": reason,
            }
        )
    return out, last_op_ms


def make_cooldown_processor(policy):
    """applyInPandasWithState processor for the decision cascade."""

    def process(
        key: tuple, pdfs: Iterator[pd.DataFrame], state
    ) -> Iterator[pd.DataFrame]:
        # GroupState.get is a PROPERTY in pyspark 4 — state.get() would
        # call the returned tuple and crash on the first rehydrated batch
        (last_op_ms,) = tuple(state.get) if state.exists else (0,)
        decisions: list[dict] = []
        for pdf in pdfs:
            batch, last_op_ms = decision_cascade_rows(pdf, last_op_ms, policy)
            decisions.extend(batch)
        state.update((last_op_ms,))
        yield pd.DataFrame(decisions, columns=[f.name for f in DECISION_SCHEMA.fields])

    return process


# --- suspension carry-forward twin (D6/W6) --------------------------------

REFRESH_INPUT_SCHEMA = StructType(
    [
        StructField("task_id", StringType()),
        StructField("ts_ms", LongType()),
        StructField("status", StringType()),
        StructField("running", IntegerType()),
        StructField("requested", IntegerType()),
    ]
)

TASK_STATE_SCHEMA = StructType(
    [
        StructField("task_id", StringType()),
        StructField("ts_ms", LongType()),
        StructField("status", StringType()),
        StructField("is_resizing", BooleanType()),
        StructField("is_suspended", BooleanType()),
        StructField("is_excluded", BooleanType()),
        StructField("running", IntegerType()),
        StructField("requested", IntegerType()),
        StructField("heal_capacity", IntegerType()),  # resize re-issued for SUSPENDED
    ]
)

SUSPEND_STATE_SCHEMA = StructType([StructField("last_suspended_ms", LongType())])


def refresh_rows(
    rows: pd.DataFrame, last_suspended_ms: int
) -> tuple[list[dict], int]:
    """D6 — task-state refresh with suspension healing
    (cluster/Workers.scala:241-279). Preserves the reference ordering:
    ``isExcluded`` is computed from the PREVIOUS refresh's suspension
    time before the current one overwrites it; suspended groups get
    their current capacity re-issued (heal_capacity)."""
    out: list[dict] = []
    for r in rows.sort_values("ts_ms").itertuples(index=False):
        ts = int(r.ts_ms)
        status = str(r.status)
        is_resizing = status.lower() == "resizing"
        is_suspended = status.lower() == "suspended"
        prev = last_suspended_ms
        if is_suspended:
            last_suspended_ms = ts
        is_excluded = not (ts - prev > SUSPENSION_MS)  # Workers.scala:261
        out.append(
            {
                "task_id": r.task_id,
                "ts_ms": ts,
                "status": status,
                "is_resizing": is_resizing,
                "is_suspended": is_suspended,
                "is_excluded": is_excluded,
                "running": int(r.running),
                "requested": int(r.requested),
                "heal_capacity": int(r.running) if is_suspended else -1,
            }
        )
    return out, last_suspended_ms


def suspension_processor(
    key: tuple, pdfs: Iterator[pd.DataFrame], state
) -> Iterator[pd.DataFrame]:
    (last_ms,) = tuple(state.get) if state.exists else (0,)  # property, not method
    rows: list[dict] = []
    for pdf in pdfs:
        batch, last_ms = refresh_rows(pdf, last_ms)
        rows.extend(batch)
    state.update((last_ms,))
    yield pd.DataFrame(rows, columns=[f.name for f in TASK_STATE_SCHEMA.fields])


# --- streaming telemetry debounce (X110, live twin of X109) ----------------

DEBOUNCE_INPUT_SCHEMA = StructType(
    [
        StructField("event_id", LongType()),
        StructField("user_id", LongType()),
        StructField("ts_us", LongType()),
        StructField("event_type", StringType()),
        StructField("value", DoubleType()),
    ]
)

DEBOUNCE_OUTPUT_SCHEMA = StructType(
    [
        StructField("event_id", LongType()),
        StructField("user_id", LongType()),
        StructField("ts_us", LongType()),
        StructField("event_type", StringType()),
        StructField("value", DoubleType()),
        StructField("is_echo", BooleanType()),
    ]
)

# keyed state: the user's last observation (type, value, ts in micros)
DEBOUNCE_STATE_SCHEMA = StructType(
    [
        StructField("last_type", StringType()),
        StructField("last_value", DoubleType()),
        StructField("last_ts_us", LongType()),
    ]
)


def debounce_rows(
    rows: "pd.DataFrame",
    last_type: str | None,
    last_value: float | None,
    last_ts_us: int,
    window_us: int,
) -> tuple[list[dict], tuple]:
    """Row-at-a-time core of the streaming debounce, shared with the
    batch-parity test: identical semantics to the batch lag form
    (events.debounce_events) — an event is an echo iff it repeats the
    key's immediately previous (type, value) within the window. Rows
    are processed in (ts_us, event_id) order; the carried state is the
    LAST observation regardless of echo status (an echo refreshes the
    clock — three rapid repeats are two echoes, matching lag
    semantics where each row compares against its immediate
    predecessor)."""
    out: list[dict] = []
    for r in rows.sort_values(["ts_us", "event_id"]).itertuples():
        echo = (
            last_type is not None
            and r.event_type == last_type
            and r.value == last_value
            and (r.ts_us - last_ts_us) <= window_us
        )
        out.append(
            {
                "event_id": r.event_id,
                "user_id": r.user_id,
                "ts_us": r.ts_us,
                "event_type": r.event_type,
                "value": r.value,
                "is_echo": bool(echo),
            }
        )
        last_type, last_value, last_ts_us = r.event_type, r.value, r.ts_us
    return out, (last_type, last_value, last_ts_us)


def make_debounce_processor(window_seconds: float = 60.0):
    """applyInPandasWithState processor for the streaming debounce
    (X110): state per user is ONE (type, value, ts) triple — constant
    size, no growth with history; output is the input batch with the
    is_echo verdict, so the stream stays append-only and the echo
    filter composes downstream."""
    window_us = int(window_seconds * 1_000_000)

    def process(
        key: tuple, pdfs: Iterator[pd.DataFrame], state
    ) -> Iterator[pd.DataFrame]:
        # GroupState.get is a PROPERTY in pyspark 4 (calling it calls
        # the returned tuple) — access without parens
        lt, lv, lts = tuple(state.get) if state.exists else (None, None, -(1 << 62))
        out: list[dict] = []
        for pdf in pdfs:
            batch, (lt, lv, lts) = debounce_rows(pdf, lt, lv, lts, window_us)
            out.extend(batch)
        state.update((lt, lv, lts))
        yield pd.DataFrame(
            out, columns=[f.name for f in DEBOUNCE_OUTPUT_SCHEMA.fields]
        )

    return process


ATTRIBUTION_OUTPUT_SCHEMA = StructType(
    [
        StructField("event_id", LongType()),
        StructField("user_id", LongType()),
        StructField("ts_us", LongType()),
        StructField("touch_type", StringType()),
    ]
)


def attribution_rows(
    rows: "pd.DataFrame",
    touch_types: tuple,
    conversion_type: str,
    last_touch: str | None,
    last_touch_ts_us: int,
    window_us: int,
) -> tuple[list[dict], tuple]:
    """Row-at-a-time core of the streaming last-touch attribution,
    shared with the batch-parity test: identical semantics to the
    batch union-and-carry window (events.attribute_conversions) —
    rows process in (ts_us, touch-first, event_id) order, a touch
    updates the carried (type, ts) pair, a conversion credits the
    carried touch when within the window, else 'unattributed'. Only
    conversion rows are emitted (append-mode safe)."""
    out: list[dict] = []
    work = rows.assign(__c=(rows["event_type"] == conversion_type))
    for r in work.sort_values(["ts_us", "__c", "event_id"]).itertuples():
        if r.event_type in touch_types:
            last_touch, last_touch_ts_us = r.event_type, r.ts_us
        elif r.event_type == conversion_type:
            ok = (
                last_touch is not None
                and (r.ts_us - last_touch_ts_us) <= window_us
            )
            out.append(
                {
                    "event_id": r.event_id,
                    "user_id": r.user_id,
                    "ts_us": r.ts_us,
                    "touch_type": last_touch if ok else "unattributed",
                }
            )
    return out, (last_touch, last_touch_ts_us)


def make_attribution_processor(
    touch_types: tuple,
    conversion_type: str = "purchase",
    window_seconds: float = 3 * 86400.0,
):
    """applyInPandasWithState processor for streaming last-touch
    attribution (X123): state per user is ONE (touch type, ts) pair —
    constant size; emits one attributed row per conversion."""
    window_us = int(window_seconds * 1_000_000)
    tt = tuple(touch_types)

    def process(
        key: tuple, pdfs: Iterator[pd.DataFrame], state
    ) -> Iterator[pd.DataFrame]:
        lt, lts = tuple(state.get) if state.exists else (None, -(1 << 62))
        out: list[dict] = []
        for pdf in pdfs:
            batch, (lt, lts) = attribution_rows(
                pdf, tt, conversion_type, lt, lts, window_us
            )
            out.extend(batch)
        state.update((lt, lts))
        yield pd.DataFrame(
            out, columns=[f.name for f in ATTRIBUTION_OUTPUT_SCHEMA.fields]
        )

    return process


TRANSITION_OUTPUT_SCHEMA = StructType(
    [
        StructField("event_id", LongType()),
        StructField("user_id", LongType()),
        StructField("ts_us", LongType()),
        StructField("a", StringType()),
        StructField("b", StringType()),
    ]
)


def transition_rows(
    rows: "pd.DataFrame",
    last_type: str | None,
) -> tuple[list[dict], tuple]:
    """Row-at-a-time core of the streaming transition emitter, shared
    with the batch-parity test: rows process in (ts_us, event_id)
    order; every row with a predecessor emits one (a=prev, b=current)
    transition — identical to the batch lag window
    (events.transition_matrix) before its aggregation."""
    out: list[dict] = []
    for r in rows.sort_values(["ts_us", "event_id"]).itertuples():
        if last_type is not None:
            out.append(
                {
                    "event_id": r.event_id,
                    "user_id": r.user_id,
                    "ts_us": r.ts_us,
                    "a": last_type,
                    "b": r.event_type,
                }
            )
        last_type = r.event_type
    return out, (last_type,)


def make_transition_processor():
    """applyInPandasWithState processor for streaming Markov
    transition extraction (X131): state per user is the last event
    type — one string; emits append-safe transition rows the consumer
    aggregates (complete-mode counts or windowed rates)."""

    def process(
        key: tuple, pdfs: Iterator[pd.DataFrame], state
    ) -> Iterator[pd.DataFrame]:
        (lt,) = tuple(state.get) if state.exists else (None,)
        out: list[dict] = []
        for pdf in pdfs:
            batch, (lt,) = transition_rows(pdf, lt)
            out.extend(batch)
        state.update((lt,))
        yield pd.DataFrame(
            out, columns=[f.name for f in TRANSITION_OUTPUT_SCHEMA.fields]
        )

    return process


SESSIONIZE_OUTPUT_SCHEMA = StructType(
    [
        StructField("event_id", LongType()),
        StructField("user_id", LongType()),
        StructField("ts_us", LongType()),
        StructField("session_idx", LongType()),
    ]
)


def sessionize_rows(
    rows: "pd.DataFrame",
    last_ts_us: int | None,
    session_idx: int,
    gap_us: int,
) -> tuple[list[dict], tuple]:
    """Row-at-a-time core of the streaming sessionizer, shared with
    the batch-parity test: IDENTICAL semantics to the batch lag form
    (events.sessionize) — a new session starts when the gap to the
    previous event EXCEEDS gap_us (merges on <=, the batch oracle
    contract; F.session_window is strict-< and deliberately not this).
    Rows process in (ts_us, event_id) order."""
    out: list[dict] = []
    for r in rows.sort_values(["ts_us", "event_id"]).itertuples():
        if last_ts_us is None or r.ts_us > last_ts_us + gap_us:
            session_idx += 1
        out.append(
            {
                "event_id": r.event_id,
                "user_id": r.user_id,
                "ts_us": r.ts_us,
                "session_idx": session_idx,
            }
        )
        last_ts_us = r.ts_us
    return out, (last_ts_us, session_idx)


def make_sessionize_processor(gap_seconds: float = 1800.0):
    """applyInPandasWithState processor for streaming sessionization
    (X139): state per user is (last ts, session counter) — constant
    size; emits the input rows with their session index, append-safe."""
    gap_us = int(gap_seconds * 1_000_000)

    def process(
        key: tuple, pdfs: Iterator[pd.DataFrame], state
    ) -> Iterator[pd.DataFrame]:
        lts, idx = tuple(state.get) if state.exists else (None, 0)
        out: list[dict] = []
        for pdf in pdfs:
            batch, (lts, idx) = sessionize_rows(pdf, lts, idx, gap_us)
            out.extend(batch)
        state.update((lts, idx))
        yield pd.DataFrame(
            out, columns=[f.name for f in SESSIONIZE_OUTPUT_SCHEMA.fields]
        )

    return process
