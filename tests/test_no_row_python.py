"""Guard: no row-at-a-time Spark Python UDFs and no RDD API in the engine
(SURVEY.md §7 hard parts; BASELINE.json:input_hint "no per-row Python").

Everything row-wise must live in Arrow-batched pandas UDF stages
(mapInPandas / applyInPandas) or JVM column expressions.
"""

import os
import re

PKG = os.path.join(os.path.dirname(__file__), "..", "webcrawl_spark")

FORBIDDEN = [
    (re.compile(r"\bF\.udf\s*\("), "row-at-a-time F.udf"),
    (re.compile(r"@udf\b"), "row-at-a-time @udf decorator"),
    (re.compile(r"\bpandas_udf\s*\(\s*returnType"), None),  # allowed (vectorized)
    (re.compile(r"\.rdd\b"), "RDD API"),
    (re.compile(r"sparkContext\.parallelize"), "RDD API"),
]


def test_no_row_at_a_time_python():
    offenders = []
    for root, dirs, files in os.walk(PKG):
        dirs[:] = [d for d in dirs if not d.startswith("__")]
        for f in files:
            if not f.endswith(".py"):
                continue
            path = os.path.join(root, f)
            src = open(path).read()
            for rx, label in FORBIDDEN:
                if label is None:
                    continue
                for m in rx.finditer(src):
                    line = src[: m.start()].count("\n") + 1
                    offenders.append(f"{path}:{line} {label}")
    assert not offenders, "\n".join(offenders)
