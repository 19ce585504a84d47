"""Structured Streaming variants of the engine's aggregations.

The reference has no streaming operators (SURVEY.md §2: its loop is a BFS
round barrier, which maps to iterative batch) — these modules provide the
streaming expression of the same semantics for pipelines that want a
continuous feed: watermarked tumbling-window aggregation and a stateful
per-key operator (``applyInPandasWithState``)."""
