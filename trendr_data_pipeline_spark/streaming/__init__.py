"""Structured Streaming surface (SURVEY §2.9).

The reference is batch-with-TTLs; its incremental behaviors map to
native streaming constructs here:

- SS2  daily usage counters      → tumbling window + watermark
- SS3  windowed mention dedup    → dropDuplicatesWithinWatermark /
                                   applyInPandasWithState (≤N per key)
- SS5  snapshot cadence          → applyInPandasWithState timers
- SS6  momentum window           → sliding window aggregate
- SS10 sessionization            → session_window

Batch twins of each computation live in ``plans/events_ops.py``; tests
replay the same parquet fixture through both paths and assert
equality.
"""
