"""SURT key / CDX index unit battery (kernels/surt.py).

Each case pins one documented canonicalization rule; the closed-form
oracle parity run (queries.cdx_index) covers the composed pipeline, these
cover the edges the deterministic fixture can't reach (https default
port, NULLs, relative hrefs, multi-value query params).
"""

import pytest
from pyspark.sql import functions as F

from webcrawl_spark.kernels.surt import cdx_index, surt_key

CASES = [
    # (input url, expected surt key)
    ("http://example.com/", "com,example)/"),
    ("HTTP://Example.COM", "com,example)/"),                      # no path → /
    ("http://www.example.com/a", "com,example)/a"),               # www dropped
    ("http://www2.example.com/a", "com,example)/a"),              # wwwN dropped
    ("http://wwwx.example.com/a", "com,example,wwwx)/a"),         # not a www label
    ("http://example.com:80/a", "com,example)/a"),                # http default port
    ("https://example.com:443/a", "com,example)/a"),              # https default port
    ("https://example.com:80/a", "com,example:80)/a"),            # :80 NOT https default
    ("http://example.com:8080/a", "com,example:8080)/a"),
    ("http://sub.a.example.co.uk/p/q.html", "uk,co,example,a,sub)/p/q.html"),
    ("http://example.com/A/B.Html?b=2&a=1", "com,example)/a/b.html?a=1&b=2"),
    ("http://example.com/a?Z=1&A=2#frag", "com,example)/a?a=2&z=1"),
    ("http://example.com/a?single", "com,example)/a?single"),
    ("http://example.com/a?b=2&b=1", "com,example)/a?b=1&b=2"),   # multi-value sorted
    ("http://example.com?q=1", "com,example)/?q=1"),              # query, no path
    ("http://example.com/#only-frag", "com,example)/"),
    ("ftp://files.example.com/x", "com,example,files)/x"),        # non-http scheme ok
    ("not-a-url", None),
    ("/relative/path", None),
    (None, None),
]


def test_surt_key_rules(spark):
    df = spark.createDataFrame(
        [(i, u) for i, (u, _) in enumerate(CASES)], "i int, url string"
    )
    got = {
        r["i"]: r["k"]
        for r in df.select("i", surt_key("url").alias("k")).collect()
    }
    for i, (u, want) in enumerate(CASES):
        assert got[i] == want, f"{u!r}: {got[i]!r} != {want!r}"


def test_surt_key_is_codegen_only(spark):
    """The key is pure built-in column algebra — no Python stage, no
    exchange: a single whole-stage-codegen projection."""
    import contextlib
    import io

    df = spark.range(10).select(
        F.concat(F.lit("http://h"), F.col("id").cast("string"), F.lit(".test/p")).alias("url")
    )
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        df.select(surt_key("url")).explain("formatted")
    plan = buf.getvalue()
    assert "Exchange" not in plan and "EvalPython" not in plan
    # '* Project' = inside a whole-stage-codegen span (sort_array, not
    # array_sort: the lambda comparator of the latter breaks codegen)
    assert "* Project" in plan


def test_cdx_index_sorted_and_shaped(spark):
    rows = [
        ("http://B.example.com/x", "2024-01-02 03:04:05", b"abc"),
        ("http://a.example.com/y", "2024-01-02 03:04:06", b"defg"),
        ("http://a.example.com/y", "2024-01-01 00:00:00", b"defg"),
    ]
    df = spark.createDataFrame(rows, "url string, ts string, payload binary").select(
        "url", F.to_timestamp("ts").alias("warc_ts"), "payload"
    )
    out = cdx_index(df).collect()
    keys = [(r["url_key"], r["cdx_ts"]) for r in out]
    assert keys == sorted(keys)
    assert keys[0][0] == "com,example,a)/y" and keys[0][1] == "20240101000000"
    assert out[-1]["url_key"] == "com,example,b)/x"
    r = out[0]
    assert r["length"] == 4 and r["mime"] == "text/html" and r["status"] == 200
    import hashlib

    assert r["digest"] == hashlib.md5(b"defg").hexdigest()


@pytest.mark.parametrize("n", [0, 1])
def test_cdx_index_tiny(spark, n):
    df = spark.createDataFrame(
        [("http://e.test/", "2024-01-01 00:00:00", b"x")][:n],
        "url string, ts string, payload binary",
    ).select("url", F.to_timestamp("ts").alias("warc_ts"), "payload")
    assert cdx_index(df).count() == n
