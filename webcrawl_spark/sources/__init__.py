"""Sources: seed lists, pages-table readers, and the deterministic synthetic
web derived from the driver's ``documents`` table (no external data)."""
