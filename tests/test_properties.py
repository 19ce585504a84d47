"""Property-based tests (hypothesis; SURVEY.md §5 item 3) — no Spark."""

import pandas as pd
from hypothesis import given, settings
from hypothesis import strategies as st

from webcrawl_spark.kernels.mime import guess_resource_type_from_path, guess_types_batch
from webcrawl_spark.kernels.urlnorm import canonicalize, sort_query

_host = st.from_regex(r"[a-z][a-z0-9-]{0,10}(\.[a-z]{2,5}){1,2}", fullmatch=True)
_path = st.from_regex(r"(/[A-Za-z0-9._~-]{0,8}){0,4}/?", fullmatch=True)
_query = st.from_regex(r"([A-Za-z0-9_]{1,5}=[A-Za-z0-9_]{0,5}(&[A-Za-z0-9_]{1,5}=[A-Za-z0-9_]{0,5}){0,3})?", fullmatch=True)
_frag = st.from_regex(r"[A-Za-z0-9]{0,6}", fullmatch=True)


@st.composite
def urls(draw):
    scheme = draw(st.sampled_from(["http", "https", "HTTP", "Https", "ftp"]))
    host = draw(_host)
    path = draw(_path)
    q = draw(_query)
    f = draw(_frag)
    u = f"{scheme}://{host}{path}"
    if q:
        u += "?" + q
    if f:
        u += "#" + f
    return u


def _canon1(u, **kw):
    return canonicalize(pd.Series([u], dtype="object"), **kw).iloc[0]


@settings(max_examples=300, deadline=None)
@given(urls())
def test_canonicalize_idempotent(u):
    c1 = _canon1(u)
    if c1["url"] is None:
        return
    c2 = _canon1(c1["url"])
    assert c2["url"] == c1["url"]
    assert c2["url_key"] == c1["url_key"]
    assert c2["host"] == c1["host"]


@settings(max_examples=300, deadline=None)
@given(urls(), _frag)
def test_fragment_never_in_identity(u, frag):
    base = u.split("#", 1)[0]
    c1 = _canon1(base)
    c2 = _canon1(base + "#" + frag)
    assert c1["url"] == c2["url"] and c1["url_key"] == c2["url_key"]


@settings(max_examples=200, deadline=None)
@given(urls())
def test_canonical_url_shape(u):
    c = _canon1(u)
    if c["url"] is None:
        return
    assert c["url"].startswith(("http://", "https://", "ftp://"))
    assert "#" not in c["url"]
    assert c["host"] == c["host"].lower()
    assert c["url_key"].startswith("/")


@settings(max_examples=200, deadline=None)
@given(_query)
def test_sort_query_idempotent_and_permutation_invariant(q):
    s1 = sort_query(q)
    assert sort_query(s1) == s1
    if q and "&" in q:
        parts = q.split("&")
        keys = [kv.split("=", 1)[0] for kv in parts]
        if len(set(keys)) == len(keys):  # duplicate keys keep input order
            rev = "&".join(reversed(parts))
            assert sort_query(rev) == s1


@settings(max_examples=200, deadline=None)
@given(st.lists(_path, min_size=1, max_size=8))
def test_guess_types_batch_matches_scalar(paths):
    batch = guess_types_batch(pd.Series(paths, dtype="object"))
    for p, got in zip(paths, batch):
        assert got == guess_resource_type_from_path(p)


def test_integer_pagerank_hand_computed():
    """Independent expectation for the link_pagerank arithmetic: replay the
    exact integer recurrence in plain Python on the same generator formula
    (n=300, 3 iterations, damping 85//100, truncating division) and pin a
    few node values. This is NOT derived from the Spark or DuckDB code —
    it is the spec, hand-written."""
    n = 300
    edges = {}
    for d in range(n):
        outs = [(d * 31 + 7 * k + 1) % n for k in range(2 + d % 4)]
        edges[d] = outs
    r = {d: 1_000_000 for d in range(n)}
    for _ in range(3):
        contrib = {d: 0 for d in range(n)}
        for src, outs in edges.items():
            share = r[src] // len(outs)
            for dst in outs:
                contrib[dst] += share
        r = {d: 150_000 + (85 * contrib[d]) // 100 for d in range(n)}
    # structural sanity: every node got SOME in-mass at this n (the
    # generator formula is near-uniform), and totals are conserved-ish
    assert min(r.values()) > 150_000
    assert 0.9 < sum(r.values()) / (n * 1_000_000) < 1.1

    from webcrawl_spark.queries import ORACLE_SQL
    import duckdb

    con = duckdb.connect()
    con.execute(
        "CREATE VIEW documents AS SELECT * FROM "
        "read_parquet('/root/testdata/sf0.001/documents.parquet')"
    )
    got = dict(
        con.execute(ORACLE_SQL["link_pagerank"]).fetchall()
    )
    assert got == r


def test_integer_hits_hand_computed():
    """Independent expectation for the link_hits arithmetic: replay the
    integer HITS recurrence (2 iterations, L1 renormalization to 10^6 by
    truncating division) in plain Python on the generator formula and
    compare the full vector against the DuckDB oracle. Hand-written spec,
    not derived from either engine."""
    n = 300
    edges = {d: [(d * 31 + 7 * k + 1) % n for k in range(2 + d % 4)]
             for d in range(n)}
    h = {d: 1_000_000 for d in range(n)}
    for _ in range(2):
        a_raw = {d: 0 for d in range(n)}
        for src, outs in edges.items():
            for dst in outs:
                a_raw[dst] += h[src]
        a_tot = sum(a_raw.values())
        a = {d: (a_raw[d] * 1_000_000) // a_tot for d in range(n)}
        h_raw = {d: 0 for d in range(n)}
        for src, outs in edges.items():
            for dst in outs:
                h_raw[src] += a[dst]
        h_tot = sum(h_raw.values())
        h = {d: (h_raw[d] * 1_000_000) // h_tot for d in range(n)}
    # L1 renormalization keeps each vector's mass at ~10^6 (truncation
    # only loses < 1 per node)
    assert 1_000_000 - n <= sum(a.values()) <= 1_000_000
    assert 1_000_000 - n <= sum(h.values()) <= 1_000_000
    # the generator graph is class-regular (out-degree = 2 + d % 4, and 31
    # is invertible mod 300, so in-mass depends on the residue class):
    # authorities collapse to exactly 4 classes; hubs must still differ
    # from authorities and show >1 class
    assert len(set(a.values())) >= 4 and len(set(h.values())) >= 4
    assert a != h

    from webcrawl_spark.queries import ORACLE_SQL
    import duckdb

    con = duckdb.connect()
    con.execute(
        "CREATE VIEW documents AS SELECT * FROM "
        "read_parquet('/root/testdata/sf0.001/documents.parquet')"
    )
    got = {
        row[0]: (row[1], row[2])
        for row in con.execute(ORACLE_SQL["link_hits"]).fetchall()
    }
    assert got == {d: (a[d], h[d]) for d in range(n)}


def test_integer_host_trust_rank_hand_computed():
    """Independent expectation for host_rank / trust_rank: replay the host
    aggregation (self-loop drop, link-count weights) and the weighted
    integer recurrence in plain Python on the generator formula, then pin
    the DuckDB oracle to it. n=600 truncates to the 500 docs present at
    sf0.001 — the spec follows the TABLE, exactly as the oracle's
    ``doc_id < 600`` filter does; link targets keep the mod-600 range."""
    from collections import defaultdict

    n_docs, mod = 500, 600

    def host(d):
        return 0 if d % 5 == 0 else d % 32

    w = defaultdict(int)
    for d in range(n_docs):
        for k in range(2 + d % 4):
            dst = (d * 31 + 7 * k + 1) % mod
            hs, hd = host(d), host(dst)
            if hs != hd:
                w[(hs, hd)] += 1
    hosts = sorted({host(d) for d in range(n_docs)})
    assert hosts == list(range(32))  # 500 docs cover every host id
    ow = defaultdict(int)
    for (hs, _), c in w.items():
        ow[hs] += c

    def run(r0, restart):
        r = dict(r0)
        for _ in range(3):
            contrib = defaultdict(int)
            for (hs, hd), c in w.items():
                contrib[hd] += (r[hs] * c) // ow[hs]
            r = {h: restart(h) + (85 * contrib[h]) // 100 for h in hosts}
        return r

    pr = run({h: 1_000_000 for h in hosts}, lambda h: 150_000)
    tr = run(
        {h: (1_000_000 if h < 4 else 0) for h in hosts},
        lambda h: 150_000 if h < 4 else 0,
    )
    # structural sanity: the mega-host (0) out-ranks the median host under
    # PageRank (it holds ~23% of pages, so it receives far more in-links);
    # TrustRank keeps seed hosts hot and gives every non-seed LESS mass
    # than its PageRank value (restart mass only flows to seeds)
    assert pr[0] > sorted(pr.values())[16]
    assert all(tr[h] < pr[h] for h in hosts if h >= 4)
    assert sum(tr.values()) < sum(pr.values())

    from webcrawl_spark.queries import ORACLE_SQL
    import duckdb

    con = duckdb.connect()
    con.execute(
        "CREATE VIEW documents AS SELECT * FROM "
        "read_parquet('/root/testdata/sf0.001/documents.parquet')"
    )
    got_pr = dict(con.execute(ORACLE_SQL["host_rank"]).fetchall())
    got_tr = dict(con.execute(ORACLE_SQL["trust_rank"]).fetchall())
    assert got_pr == pr
    assert got_tr == tr


def test_integer_opic_hand_computed():
    """Independent expectation for the link_opic arithmetic: replay the
    exact integer OPIC recurrence (Abiteboul et al. 2003) in plain Python
    on the same generator formula — cash0 = 10^6, three synchronous
    rounds of distribute-by-truncating-division + bank-into-history, ppm
    normalization at the end. This is the spec, hand-written; the oracle
    must reproduce it node for node."""
    n = 300
    edges = {}
    for d in range(n):
        edges[d] = [(d * 31 + 7 * k + 1) % n for k in range(2 + d % 4)]
    cash = {d: 1_000_000 for d in range(n)}
    hist = {d: 0 for d in range(n)}
    for _ in range(3):
        contrib = {d: 0 for d in range(n)}
        for src, outs in edges.items():
            share = cash[src] // len(outs)
            for dst in outs:
                contrib[dst] += share
        hist = {d: hist[d] + cash[d] for d in range(n)}
        cash = contrib
    total = sum(cash[d] + hist[d] for d in range(n))
    expect = {
        d: (hist[d], cash[d], (cash[d] + hist[d]) * 1_000_000 // total)
        for d in range(n)
    }
    # structural sanity: history banked exactly 3 rounds of (shrinking)
    # cash; truncation only ever loses mass
    assert all(h >= 2_000_000 for h, _, _ in expect.values())
    assert total <= 4 * n * 1_000_000

    from webcrawl_spark.queries import ORACLE_SQL
    import duckdb

    con = duckdb.connect()
    con.execute(
        "CREATE VIEW documents AS SELECT * FROM "
        "read_parquet('/root/testdata/sf0.001/documents.parquet')"
    )
    got = {
        r[0]: (r[1], r[2], r[3])
        for r in con.execute(ORACLE_SQL["link_opic"]).fetchall()
    }
    assert got == expect
