"""Local stand-in for the driver's correctness gate: run every
``queries()`` entry on Spark AND its ``oracle_sql()`` on DuckDB over the
same parquet tables; compare row count, column names, and an
order-insensitive value hash.

Usage: PYTHONPATH=/root/repo python tools/check_correctness.py [sf_dir] [name ...]
"""

from __future__ import annotations

import sys
import time

import duckdb
import pandas as pd

TABLES = [
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings",
]


def norm_cell(v):
    if isinstance(v, float):
        return f"{v:.10g}"
    if v is None or v != v:
        return "<null>"
    return str(v)


def frame_digest(df: pd.DataFrame) -> str:
    df = df[sorted(df.columns)]
    rows = sorted(
        "|".join(norm_cell(v) for v in row) for row in df.itertuples(index=False)
    )
    import hashlib

    return hashlib.md5("\n".join(rows).encode()).hexdigest()


def main():
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    only = set(sys.argv[2:])

    from pyspark.sql import SparkSession

    spark = (
        SparkSession.builder.master("local[8]")
        .appName("correctness-check")
        .config("spark.sql.shuffle.partitions", "8")
        .config("spark.ui.enabled", "false")
        .config("spark.sql.session.timeZone", "UTC")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")

    con = duckdb.connect()
    for t in TABLES:
        con.sql(f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")

    import webcrawl_spark.queries as Q

    failures = []
    for name, fn in Q.QUERIES.items():
        if only and name not in only:
            continue
        t0 = time.time()
        try:
            sdf = fn(spark, sf_dir).toPandas()
        except Exception as e:
            print(f"FAIL  {name}: spark error {type(e).__name__}: {str(e)[:200]}")
            failures.append(name)
            continue
        t_spark = time.time() - t0
        sql = Q.ORACLE_SQL.get(name)
        if sql is None:
            print(f"rows  {name}: {len(sdf)} rows (no oracle) [{t_spark:.1f}s]")
            if len(sdf) == 0:
                failures.append(name)
            continue
        try:
            odf = con.sql(sql).df()
        except Exception as e:
            print(f"FAIL  {name}: duckdb error {str(e)[:200]}")
            failures.append(name)
            continue
        problems = []
        if len(sdf) != len(odf):
            problems.append(f"rows {len(sdf)} vs {len(odf)}")
        if sorted(sdf.columns) != sorted(odf.columns):
            problems.append(f"cols {sorted(sdf.columns)} vs {sorted(odf.columns)}")
        elif frame_digest(sdf) != frame_digest(odf):
            problems.append("value-hash mismatch")
            # show a sample diff
            s = sdf[sorted(sdf.columns)].astype(str)
            o = odf[sorted(odf.columns)].astype(str)
            srows = set(map(tuple, s.itertuples(index=False)))
            orows = set(map(tuple, o.itertuples(index=False)))
            eng_only = list(srows - orows)[:3]
            ora_only = list(orows - srows)[:3]
            if eng_only:
                problems.append(f"engine-only: {eng_only}")
            if ora_only:
                problems.append(f"oracle-only: {ora_only}")
        if problems:
            print(f"FAIL  {name}: {'; '.join(str(p) for p in problems)}")
            failures.append(name)
        else:
            print(f"OK    {name}: {len(sdf)} rows [{t_spark:.1f}s]")

    print()
    if failures:
        print(f"{len(failures)} FAILURES: {failures}")
        sys.exit(1)
    print("all queries match")


if __name__ == "__main__":
    main()
