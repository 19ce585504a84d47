"""webcrawl_spark — a from-scratch PySpark-native distributed URL-frontier
engine with the query/data-processing capabilities of AdamMil/WebCrawl.

Architecture (Spark-first, NOT a port):

- ``kernels/``    pure-pandas vectorized kernels (URL canonicalization, link
                  extraction, charset decode, MIME, scope, filters, robots)
                  shared by the Spark pandas-UDFs and the sequential oracle.
- ``functions/``  pandas_udf wrappers + training-data text/similarity funcs.
- ``operators/``  relational operators: politeness top-k, frontier dedup
                  (Bloom-prefiltered anti-join, salted), caps, retry routing,
                  dense-seq assignment, text dedup (exact/minhash/simhash),
                  ANN similarity search.
- ``sources/``    seeds, pages table readers, deterministic synthetic webs.
- ``plans/``      the per-round DataFrame pipeline, the multi-round BFS
                  driver, and atomic snapshot checkpointing (Iceberg-style
                  commit semantics over Parquet in-sandbox).
- ``oracle/``     sequential pure-Python reference crawler producing golden
                  traces (same deterministic schedule, same kernels).
- ``fixtures/``   deterministic synthetic web generators (seeded).

Reference semantics are cited per function as ``Backend/Crawler.cs:line``.
"""

__version__ = "0.1.0"
