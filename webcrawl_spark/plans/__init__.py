"""Crawl plans: the per-round DataFrame pipeline (round.py), the multi-round
BFS driver with atomic per-round checkpoint commits and resume (crawl.py,
state.py)."""
