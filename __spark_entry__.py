"""Driver contract for the spark-graft builder (PySpark target).

- ``entry(spark)``   — flagship: full deterministic BFS crawl of the
  synthetic web derived from sf0.001's documents table; returns the fetched
  pages (crawl order + extracted text).
- ``queries()``      — one entry per implemented operator family
  (SURVEY.md §2 + training-data pipeline ops); see webcrawl_spark/queries.py.
- ``oracle_sql()``   — exact DuckDB equivalents; iterative crawl traces are
  deliberately omitted (rows-only check) — everything else has an oracle.

The ``webcrawl_spark`` package is shipped to executors via ``addPyFile``
(the ``spark-submit --py-files`` deployment model): UDF closures reference
the package, and the driver process importing this file is not guaranteed
to export a PYTHONPATH that executor Python workers inherit.
"""

from __future__ import annotations

import os
import sys
import tempfile
import zipfile
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

_REPO = os.path.dirname(os.path.abspath(__file__))
if _REPO not in sys.path:
    sys.path.insert(0, _REPO)

from webcrawl_spark.queries import ORACLE_SQL, QUERIES, _crawl  # noqa: E402

_SHIPPED_TO = set()


def _ensure_shipped(spark: SparkSession) -> None:
    """Zip webcrawl_spark and addPyFile it once per SparkContext."""
    sc = spark.sparkContext
    key = id(sc)
    if key in _SHIPPED_TO:
        return
    import webcrawl_spark

    pkg_dir = os.path.dirname(os.path.abspath(webcrawl_spark.__file__))
    zpath = os.path.join(tempfile.gettempdir(), "webcrawl_spark_pyfiles.zip")
    with zipfile.ZipFile(zpath, "w") as zf:
        for root, _dirs, files in os.walk(pkg_dir):
            for f in files:
                if f.endswith(".py"):
                    full = os.path.join(root, f)
                    rel = os.path.join(
                        "webcrawl_spark", os.path.relpath(full, pkg_dir)
                    )
                    zf.write(full, rel)
    sc.addPyFile(zpath)
    _SHIPPED_TO.add(key)


def entry(spark: SparkSession) -> DataFrame:
    """Flagship: crawl the sf0.001 synthetic web end-to-end."""
    _ensure_shipped(spark)
    c = _crawl(spark, "/root/testdata/sf0.001", 300)
    return c.fetched().select(
        "url", "round", "fetch_seq", "depth", "link_type", "http_status",
        "mime", "bytes", "extracted_text",
    )


def _wrap(fn: Callable) -> Callable:
    def run(spark: SparkSession, sf_dir: str) -> DataFrame:
        _ensure_shipped(spark)
        return fn(spark, sf_dir)

    run.__name__ = getattr(fn, "__name__", "query")
    run.__doc__ = fn.__doc__
    return run


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return {name: _wrap(fn) for name, fn in QUERIES.items()}


def oracle_sql() -> dict[str, str]:
    return dict(ORACLE_SQL)
