"""DataFrame -> DataFrame operators (SURVEY.md §2).

Each module groups the reference's operators by domain:

    metric_store  windowed time-series store + quorum aggregates
                  (W1/W2, P10, A1-A6, A10-A12)
    scaling       classifier / planner / guard rails / allocator
                  (D1-D5, F4-F6)
    events        event-stream windows, cooldown, suspension,
                  sessionization (W3-W6, X5)
    dedup         exact + near-duplicate detection (X1, X2)
    similarity    top-k vector similarity search (X3, X6)
    text          text analysis: tokens, language-id, quality,
                  fingerprints (X4)
    multimodal    opaque binary media columns + pandas-UDF plumbing (X6)

Operator code never calls ``collect``/``toPandas`` and never reads the
wall clock (SURVEY.md §7 risk register) — scalars travel as broadcast
single-row DataFrames and clocks are injected as columns.
"""
