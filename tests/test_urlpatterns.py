"""URL template mining (operators/urlpatterns): template rules, the
visits-vs-instances trap signal, and the plan shape."""

from webcrawl_spark.operators import urlpatterns as UP


def _run(spark, urls, trap_min=UP.TRAP_MIN_URLS):
    u = spark.createDataFrame([(x,) for x in urls], "url string")
    return {
        r.template: (r.n_urls, r.n_instances, r.sample_url, r.trap_candidate)
        for r in UP.url_pattern_groups(u, trap_min=trap_min).collect()
    }


def test_template_rules(spark):
    got = _run(
        spark,
        [
            "http://a.test/p/123/x9.html",           # digit runs -> {n}
            "http://a.test/u/0123456789abcdef",       # >=8 hex chars -> {hex}
            "http://a.test/u/abc123",                 # short mixed: digits only
            "http://a.test/item?id=5&ref=r2",         # params -> sorted names
            "http://a.test/item?ref=r9&id=77",        # same shape, other order
            "http://a.test/plain.html",               # no query -> no '?'
        ],
    )
    assert "a.test/p/{n}/x{n}.html" in got
    assert "a.test/u/{hex}" in got
    assert "a.test/u/abc{n}" in got
    assert got["a.test/item?id&ref"][0] == 2  # order-insensitive param names
    assert "a.test/plain.html" in got


def test_trap_signal_visits_vs_instances(spark):
    # 6 visits to ONE static page vs 6 distinct calendar instances
    urls = ["http://s.test/home.html"] * 6 + [
        f"http://s.test/cal/{2000 + i}/idx.html" for i in range(6)
    ]
    got = _run(spark, urls, trap_min=5)
    assert got["s.test/home.html"] == (
        6, 1, "http://s.test/home.html", True
    )
    n_urls, n_inst, sample, trap = got["s.test/cal/{n}/idx.html"]
    assert (n_urls, n_inst, trap) == (6, 6, True)
    assert sample == "http://s.test/cal/2000/idx.html"
    # below the threshold: not flagged
    below = _run(spark, urls, trap_min=7)
    assert below["s.test/home.html"][3] is False


def test_hosts_are_part_of_the_shape(spark):
    got = _run(spark, ["http://a.test/p/1.html", "http://b.test/p/1.html"])
    assert "a.test/p/{n}.html" in got and "b.test/p/{n}.html" in got


def test_plan_shape(spark):
    u = spark.createDataFrame([("http://a.test/x",)], "url string")
    plan = (
        UP.url_pattern_groups(u)
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert "EvalPython" not in plan
    assert "Window" not in plan
    assert "CartesianProduct" not in plan
