"""Relational operators for the frontier engine and the training-data
pipeline: deterministic global sequencing, politeness top-k, seen-set
dedup (Bloom-prefiltered anti-join), crawler-trap caps, text dedup,
similarity search."""
