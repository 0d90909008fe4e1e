"""Structured Streaming tier (SURVEY.md §3 live-loop mapping).

Batch and streaming share one set of logical-plan builders (the
operators package); this package adds the pieces that only exist in
live mode: the stateful twins of the cooldown/suspension clocks
(``applyInPandasWithState``), the 15 s/30 s-trigger pipeline assembly,
and idempotent ``foreachBatch`` sinks (K1-K5).
"""
