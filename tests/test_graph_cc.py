"""Star-contraction connected components: equivalence with the exact
pointer-jump CC on adversarial shapes, and the diameter-robustness that
motivates it (operators/graph.star_contract, Kiveris et al. 2014)."""

import random

from webcrawl_spark.operators.graph import star_contract
from webcrawl_spark.operators.textdedup import connected_components


def _labels(pairs):
    return sorted(map(tuple, connected_components(pairs).collect()))


def _labels_star(pairs):
    return sorted(map(tuple, connected_components(star_contract(pairs)).collect()))


def test_star_cc_path_graph(spark):
    """A pure path is the pointer-jump worst case (O(diameter) rounds);
    star contraction must yield the same single component."""
    g = spark.createDataFrame([(i, i + 1) for i in range(40)], "a long, b long")
    got = _labels_star(g)
    assert got == _labels(g)
    assert {cc for _, cc in got} == {0}


def test_star_cc_cliques_and_islands(spark):
    g = spark.createDataFrame(
        [(a, b) for a in range(100, 108) for b in range(a + 1, 108)]
        + [(200, 201), (201, 202)],
        "a long, b long",
    )
    got = _labels_star(g)
    assert got == _labels(g)
    assert {cc for _, cc in got} == {100, 200}


def test_star_cc_random_graph(spark):
    random.seed(7)
    g = spark.createDataFrame(
        [(random.randrange(300), random.randrange(300)) for _ in range(200)],
        "a long, b long",
    ).filter("a <> b")
    assert _labels_star(g) == _labels(g)


def test_star_cc_empty_graph(spark):
    g = spark.createDataFrame([], "a long, b long")
    assert star_contract(g).count() == 0
    assert connected_components(star_contract(g)).count() == 0


def test_star_contract_preserves_components_only(spark):
    """The contracted edge list must connect exactly the original
    components (it may rewire arbitrarily inside them)."""
    g = spark.createDataFrame(
        [(1, 2), (2, 3), (10, 11), (11, 12), (12, 13)], "a long, b long"
    )
    lab = {r.id: r.cc for r in connected_components(star_contract(g)).collect()}
    assert lab == {1: 1, 2: 1, 3: 1, 10: 10, 11: 10, 12: 10, 13: 10}


def test_cc_raises_when_round_budget_exhausted(spark):
    """Non-convergence must be loud: returning partial labels silently
    mislabels clusters (the pre-fix sf0.1 behavior)."""
    import pytest

    g = spark.createDataFrame([(i, i + 1) for i in range(30)], "a long, b long")
    with pytest.raises(RuntimeError, match="did not converge"):
        connected_components(g, max_iter=2)


def test_cocitation_pairs_basic(spark):
    """Siblings = pages sharing citers; overlap vs the smaller in-degree;
    a page cited by disjoint sources pairs with nobody."""
    from webcrawl_spark.operators.graph import cocitation_pairs

    edges = spark.createDataFrame(
        # s1, s2, s3 cite both a and b; s3 also cites c; d has own citers
        [("s1", "a"), ("s2", "a"), ("s3", "a"),
         ("s1", "b"), ("s2", "b"), ("s3", "b"),
         ("s3", "c"),
         ("s9", "d"), ("s8", "d")],
        "src string, dst string",
    )
    got = {
        (r.page_a, r.page_b): (
            r.common, r.cited_a, r.cited_b, r.overlap_permille, r.related
        )
        for r in cocitation_pairs(edges, min_common=2).collect()
    }
    assert got == {("a", "b"): (3, 3, 3, 1000, True)}
    # min_common=1 also surfaces the single-citer (a,c)/(b,c) pairs
    one = {
        (r.page_a, r.page_b): r.common
        for r in cocitation_pairs(edges, min_common=1).collect()
    }
    assert one[("a", "c")] == 1 and one[("b", "c")] == 1


def test_cocitation_hub_cap(spark):
    """A hub source citing everything is the ubiquitous-feature case:
    with cap=2 it contributes only the pair of its 2 lowest pages."""
    from webcrawl_spark.operators.graph import cocitation_pairs

    edges = spark.createDataFrame(
        [("hub", p) for p in ("a", "b", "c", "d")],
        "src string, dst string",
    )
    got = {
        (r.page_a, r.page_b)
        for r in cocitation_pairs(edges, cap=2, min_common=1).collect()
    }
    assert got == {("a", "b")}
