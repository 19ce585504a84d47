"""KMV and count-min sketch tests: pure-Python replays, merge closure,
and the count-min overestimate guarantee."""

import hashlib

from pyspark.sql import functions as F

from webcrawl_spark.operators import sketches as SK


def _h32(s: str) -> int:
    return int(hashlib.md5(s.encode()).hexdigest()[:8], 16)


def _items(spark, grp, names):
    rows = [(grp, _h32(x)) for x in names]
    return spark.createDataFrame(rows, "grp string, h long")


def test_kmv_exact_below_k(spark):
    df = _items(spark, "a", [f"item{i}" for i in range(30)])
    out = SK.kmv_distinct(df, k=64).collect()
    assert out == [("a", 30)] or (out[0].grp, out[0].est_distinct) == ("a", 30)


def test_kmv_estimate_matches_python_replay_and_is_close(spark):
    names = [f"tok-{i}" for i in range(5000)]
    df = _items(spark, "g", names)
    got = {r.grp: r.est_distinct for r in SK.kmv_distinct(df, k=64).collect()}
    hs = sorted({_h32(x) for x in names})
    want = (63 * (1 << 32)) // hs[63]
    assert got["g"] == want
    assert abs(want - len(set(hs))) / len(set(hs)) < 0.4  # ~1/sqrt(64) stderr


def test_kmv_merge_closure(spark):
    """Sketching the union == unioning the shard sketches and resketching
    — the property that lets shard sketches merge without shard data."""
    a = _items(spark, "g", [f"a{i}" for i in range(400)])
    b = _items(spark, "g", [f"b{i}" for i in range(400)])
    merged = SK.kmv_estimate(
        SK.kmv_bottomk(
            SK.kmv_bottomk(a, k=64).unionByName(SK.kmv_bottomk(b, k=64)), k=64
        ),
        k=64,
    ).collect()
    direct = SK.kmv_estimate(SK.kmv_bottomk(a.unionByName(b), k=64), k=64).collect()
    assert sorted(map(tuple, merged)) == sorted(map(tuple, direct))


def _toks(spark, words):
    return spark.createDataFrame([(w,) for w in words], "term string")


def test_cms_never_underestimates_and_python_replay(spark):
    words = ["the"] * 50 + ["cat"] * 20 + ["sat"] * 5 + [f"w{i}" for i in range(200)]
    toks = _toks(spark, words)
    counters = SK.cms_counters(toks, d=4, w=32)  # tiny grid -> collisions
    probes = _toks(spark, ["the", "cat", "sat", "w0", "absent"])
    got = {r.term: r.est_tf for r in SK.cms_lookup(counters, probes, d=4, w=32).collect()}
    # python replay of the grid
    grid = {}
    for w in words:
        for r in range(4):
            key = (r, _h32(f"cms{r}:{w}") % 32)
            grid[key] = grid.get(key, 0) + 1
    true = {t: words.count(t) for t in ["the", "cat", "sat", "w0", "absent"]}
    for t, est in got.items():
        want = min(grid.get((r, _h32(f"cms{r}:{t}") % 32), 0) for r in range(4))
        assert est == want, t
        assert est >= true[t], t  # the count-min guarantee


def test_cms_exact_when_grid_is_collision_free(spark):
    words = ["alpha"] * 7 + ["beta"] * 3 + ["gamma"] * 1
    counters = SK.cms_counters(_toks(spark, words), d=4, w=4096)
    got = {
        r.term: r.est_tf
        for r in SK.cms_lookup(
            counters, _toks(spark, ["alpha", "beta", "gamma"]), d=4, w=4096
        ).collect()
    }
    assert got == {"alpha": 7, "beta": 3, "gamma": 1}


def test_cms_counters_merge_by_cellwise_sum(spark):
    a = _toks(spark, ["x"] * 5 + ["y"] * 2)
    b = _toks(spark, ["x"] * 3 + ["z"] * 4)
    merged = (
        SK.cms_counters(a, d=4, w=64).unionByName(SK.cms_counters(b, d=4, w=64))
        .groupBy("r", "bucket").agg(F.sum("cnt").alias("cnt"))
    )
    direct = SK.cms_counters(a.unionByName(b), d=4, w=64)
    assert sorted(map(tuple, merged.collect())) == sorted(map(tuple, direct.collect()))
