"""KMV / count-min / HLL / histogram sketch tests: pure-Python replays,
merge closure, the count-min overestimate guarantee, the HLL
linear-counting branch, and LPA on a known two-community graph."""

import hashlib
import math

from pyspark.sql import functions as F

from webcrawl_spark.operators import graph as GR
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


def _hll_python(names):
    """Pure-Python replay of the HLL estimator (same integer math)."""
    regs = {}
    for h in {_h32(x) for x in names}:
        idx, rest = h >> SK.HLL_REST, h % (1 << SK.HLL_REST)
        rho = SK.HLL_RHO_MAX if rest == 0 else SK.HLL_RHO_MAX - rest.bit_length()
        regs[idx] = max(regs.get(idx, 0), rho)
    s = sum(1 << (SK.HLL_RHO_MAX - r) for r in regs.values())
    s += (SK.HLL_M - len(regs)) * (1 << SK.HLL_RHO_MAX)
    raw_num = SK.HLL_ALPHA_MICRO * SK.HLL_M * SK.HLL_M * (1 << SK.HLL_RHO_MAX)
    raw = raw_num // (s * 1_000_000)
    v = SK.HLL_M - len(regs)
    if v > 0 and raw <= SK.HLL_LC_THRESHOLD:
        return SK.HLL_LC[v - 1]
    return raw


def test_hll_matches_python_replay_and_is_close(spark):
    names = [f"tok-{i}" for i in range(4000)]
    got = {r.grp: r.est_distinct for r in SK.hll_distinct(_items(spark, "g", names)).collect()}
    want = _hll_python(names)
    assert got["g"] == want
    assert abs(want - 4000) / 4000 < 0.4  # ~1.04/sqrt(64) stderr


def test_hll_linear_counting_branch(spark):
    """Small cardinalities route through the LC table and stay tight."""
    names = [f"it{i}" for i in range(40)]
    got = SK.hll_distinct(_items(spark, "g", names)).collect()[0].est_distinct
    assert got == _hll_python(names)
    assert abs(got - 40) <= 8  # LC is near-exact at n << m·ln m
    # the LC branch really fired: 40 items leave untouched registers,
    # and the estimate IS the table entry for that count
    v = SK.HLL_M - len({_h32(x) >> SK.HLL_REST for x in names})
    assert v > 0
    assert got == SK.HLL_LC[v - 1]


def test_hll_merge_closure(spark):
    """Registers of a union == cellwise-max merge of shard registers —
    the property that lets per-ingest-batch sketches merge without
    rescanning batch data."""
    a = _items(spark, "g", [f"a{i}" for i in range(800)])
    b = _items(spark, "g", [f"b{i}" for i in range(800)])
    merged = SK.hll_estimate(
        SK.hll_registers(a).unionByName(SK.hll_registers(b))
        .groupBy("grp", "idx").agg(F.max("rho").alias("rho"))
    ).collect()
    direct = SK.hll_estimate(SK.hll_registers(a.unionByName(b))).collect()
    assert sorted(map(tuple, merged)) == sorted(map(tuple, direct))


def _vals(spark, vs):
    return spark.createDataFrame([(v,) for v in vs], "v long")


def test_hist_quantiles_interpolation_bound(spark):
    """On 0..199 uniform, every estimate lands within one bucket width of
    the exact order statistic."""
    vs = list(range(200))
    est = {
        r.q_permille: r.est
        for r in SK.hist_quantiles(
            SK.hist_counts(_vals(spark, vs)), [500, 900, 990]
        ).collect()
    }
    for q, e in est.items():
        exact = vs[math.ceil(q * len(vs) / 1000) - 1]
        assert abs(e - exact) <= SK.HIST_W, (q, e, exact)


def test_hist_merge_by_cellwise_sum(spark):
    a = _vals(spark, [3, 9, 9, 40, 300])
    b = _vals(spark, [9, 12, 4000])
    merged = (
        SK.hist_counts(a).unionByName(SK.hist_counts(b))
        .groupBy("bucket").agg(F.sum("cnt").alias("cnt"))
    )
    direct = SK.hist_counts(a.unionByName(b))
    assert sorted(map(tuple, merged.collect())) == sorted(map(tuple, direct.collect()))


def test_hist_clamps_out_of_range_into_last_bucket(spark):
    out = {r.bucket: r.cnt for r in SK.hist_counts(_vals(spark, [10**9, 5])).collect()}
    assert out == {SK.HIST_B - 1: 1, 5 // SK.HIST_W: 1}


def test_label_propagation_two_cliques(spark):
    """Two triangles joined by one bridge edge resolve to exactly two
    communities — one per triangle. (Label VALUES drift across the
    bridge under synchronous updates — node 3 briefly adopts 2's label —
    so assert the partition, plus the exact hand-traced labels.)"""
    tri1 = [(0, 1), (1, 2), (2, 0)]
    tri2 = [(3, 4), (4, 5), (5, 3)]
    bridge = [(2, 3)]
    edges = spark.createDataFrame(tri1 + tri2 + bridge, "src long, dst long")
    nodes = spark.range(6).select(F.col("id").cast("long").alias("id"))
    out = {
        r.id: r.label
        for r in GR.label_propagation(GR.symmetrize(edges), nodes, iters=3).collect()
    }
    assert len({out[0], out[1], out[2]}) == 1
    assert len({out[3], out[4], out[5]}) == 1
    assert out[0] != out[3]
    assert out == {0: 0, 1: 0, 2: 0, 3: 2, 4: 2, 5: 2}


def test_cms_counters_merge_by_cellwise_sum(spark):
    a = _toks(spark, ["x"] * 5 + ["y"] * 2)
    b = _toks(spark, ["x"] * 3 + ["z"] * 4)
    merged = (
        SK.cms_counters(a, d=4, w=64).unionByName(SK.cms_counters(b, d=4, w=64))
        .groupBy("r", "bucket").agg(F.sum("cnt").alias("cnt"))
    )
    direct = SK.cms_counters(a.unionByName(b), d=4, w=64)
    assert sorted(map(tuple, merged.collect())) == sorted(map(tuple, direct.collect()))


def test_kmv_set_ops_exact_when_small(spark):
    """Below k the union sketch IS the union — every set-op output must be
    exact."""
    a = _items(spark, "g", [f"x{i}" for i in range(20)])   # x0..x19
    b = _items(spark, "g", [f"x{i}" for i in range(10, 35)])  # x10..x34
    got = SK.kmv_set_ops(
        SK.kmv_bottomk(a, k=64), SK.kmv_bottomk(b, k=64), k=64
    ).collect()
    assert len(got) == 1
    r = got[0]
    assert r.est_union == 35
    assert r.est_inter == 10
    assert r.est_jaccard_permille == (10 * 1000) // 35


def test_kmv_set_ops_python_replay(spark):
    """Above k the estimator must equal the Beyer et al. recipe replayed
    in plain Python over the same md5 hashes."""
    names_a = [f"s{i}" for i in range(600)]
    names_b = [f"s{i}" for i in range(300, 900)]
    a = _items(spark, "g", names_a)
    b = _items(spark, "g", names_b)
    got = SK.kmv_set_ops(
        SK.kmv_bottomk(a, k=64), SK.kmv_bottomk(b, k=64), k=64
    ).collect()[0]

    ka = sorted({_h32(x) for x in names_a})[:64]
    kb = sorted({_h32(x) for x in names_b})[:64]
    ku = sorted(set(ka) | set(kb))[:64]
    n = len(ku)
    est_union = n if n < 64 else (63 * (1 << 32)) // ku[-1]
    rho = sum(1 for h in ku if h in set(ka) and h in set(kb))
    assert got.est_union == est_union
    assert got.est_inter == (rho * est_union) // n
    assert got.est_jaccard_permille == (rho * 1000) // n
    # and the estimates are in the sketch's error regime vs truth
    true_union = len(set(names_a) | set(names_b))
    assert abs(est_union - true_union) / true_union < 0.4


def test_hist_grouped_matches_per_group_global(spark):
    """hist_counts/hist_quantiles with by=("g",) must answer exactly what
    the ungrouped sketch answers on each group's values alone — thresholds
    for one language can never leak across groups (the ccnet_buckets
    contract)."""
    groups = {"en": [3, 9, 9, 40, 300, 17, 8], "de": [9, 12, 4000, 1, 1]}
    rows = [(g, v) for g, vs in groups.items() for v in vs]
    df = spark.createDataFrame(rows, "g string, v long")
    got = {
        (r.g, r.q_permille): r.est
        for r in SK.hist_quantiles(
            SK.hist_counts(df, by=("g",)), [333, 667], by=("g",)
        ).collect()
    }
    for g, vs in groups.items():
        solo = {
            r.q_permille: r.est
            for r in SK.hist_quantiles(
                SK.hist_counts(_vals(spark, vs)), [333, 667]
            ).collect()
        }
        for q, e in solo.items():
            assert got[(g, q)] == e, (g, q, got[(g, q)], e)


# ---------------------------------------------------------------------------
# Bloom membership sketch
# ---------------------------------------------------------------------------

def _bitems(spark, names):
    return spark.createDataFrame([(n,) for n in names], "item string")


def _py_bloom_positions(item: str, k=SK.BLOOM_SK_K, m=SK.BLOOM_SK_M):
    import hashlib

    h = hashlib.md5(item.encode()).hexdigest()
    return {int(h[8 * j: 8 * j + 8], 16) % m for j in range(k)}


def test_bloom_no_false_negatives(spark):
    """Every corpus item probed against its own filter must hit — Bloom
    filters structurally cannot false-negative."""
    names = [f"doc{i}" for i in range(200)]
    bloom = SK.bloom_build(_bitems(spark, names))
    got = {
        r.item: r.bloom_hit
        for r in SK.bloom_probe(bloom, _bitems(spark, names)).collect()
    }
    assert all(got[n] for n in names)


def test_bloom_matches_python_replay(spark):
    """Engine hits/misses must equal a plain-Python replay of the same
    md5-chunk construction, probe by probe."""
    corpus = [f"c{i}" for i in range(150)]
    probes = [f"p{i}" for i in range(80)] + corpus[:5]
    bloom = SK.bloom_build(_bitems(spark, corpus))
    got = {
        r.item: r.bloom_hit
        for r in SK.bloom_probe(bloom, _bitems(spark, probes)).collect()
    }
    bits = set()
    for c in corpus:
        bits |= _py_bloom_positions(c)
    for p in set(probes):
        expect = _py_bloom_positions(p) <= bits
        assert got[p] == expect, (p, got[p], expect)


def test_bloom_merge_is_union(spark):
    """OR of two filters == filter of the union: build(A) ∪ build(B)
    (distinct) must answer every probe exactly like build(A ∪ B)."""
    a = [f"a{i}" for i in range(60)]
    b = [f"b{i}" for i in range(60)]
    merged = SK.bloom_build(_bitems(spark, a)).union(
        SK.bloom_build(_bitems(spark, b))
    ).distinct()
    whole = SK.bloom_build(_bitems(spark, a + b))
    probes = _bitems(spark, a[:10] + b[:10] + [f"x{i}" for i in range(50)])
    got_m = {r.item: r.bloom_hit for r in SK.bloom_probe(merged, probes).collect()}
    got_w = {r.item: r.bloom_hit for r in SK.bloom_probe(whole, probes).collect()}
    assert got_m == got_w


def test_bloom_plan_shape(spark):
    """Plan guard: the build+probe pipeline is pure JVM — no Python
    stages, no cartesian, no window, no driver-side bitset."""
    corpus = _bitems(spark, ["a", "b"])
    probes = _bitems(spark, ["a", "c"])
    plan = (
        SK.bloom_probe(SK.bloom_build(corpus), probes)
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert "EvalPython" not in plan
    assert "CartesianProduct" not in plan
    assert "Window" not in plan
