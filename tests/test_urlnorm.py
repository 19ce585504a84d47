"""Canonicalization kernel unit tests — each pinned to a reference citation."""

import pandas as pd
from hypothesis import given, settings, strategies as st

from webcrawl_spark.kernels.urlnorm import (
    canonicalize,
    resolve_links,
    sort_query,
    split_urls,
)


def canon1(url, **kw):
    return canonicalize(pd.Series([url]), **kw).iloc[0]


class TestCanonicalize:
    def test_slash_collapse(self):
        # CleanupInputUri (Crawler.cs:2804-2821): //// -> // -> /
        assert canon1("http://a.com//x////y//z.html").url == "http://a.com/x/y/z.html"

    def test_fragment_stripped(self):
        # identity = GetLeftPart(UriPartial.Query) (Crawler.cs:345-357)
        r = canon1("http://a.com/p?q=1#frag")
        assert r.url == "http://a.com/p?q=1"
        assert r.url_key == "/p?q=1"

    def test_default_port_stripped(self):
        assert canon1("http://a.com:80/p").url == "http://a.com/p"
        assert canon1("https://a.com:443/p").url == "https://a.com/p"
        assert canon1("ftp://a.com:21/p").url == "ftp://a.com/p"
        assert canon1("http://a.com:8080/p").url == "http://a.com:8080/p"

    def test_host_scheme_lowercased(self):
        r = canon1("HTTP://WWW.Example.COM/Path")
        assert r.url == "http://www.example.com/Path"
        assert r.host == "www.example.com"

    def test_empty_path(self):
        assert canon1("http://a.com").url == "http://a.com/"
        assert canon1("http://a.com").url_key == "/"

    def test_case_insensitive_key(self):
        # MakeKey lowercases path only when CaseSensitivePaths=false
        # (Crawler.cs:2621-2622); the URL itself keeps its case.
        r = canon1("http://a.com/PATH?Q=V", case_sensitive_paths=False)
        assert r.url_key == "/path?Q=V"
        assert r.url == "http://a.com/PATH?Q=V"

    def test_strip_www(self):
        # UrlFilters.StripWWWPrefix (Crawler.cs:3429-3437)
        assert canon1("http://www.a.com/p", strip_www=True).url == "http://a.com/p"
        assert canon1("http://wwwx.a.com/p", strip_www=True).host == "wwwx.a.com"

    def test_normalize_query(self):
        # UrlFilters.NormalizeQuery (Crawler.cs:3387-3427)
        r = canon1("http://a.com/p?b=2&a=1&c=", normalize_query=True)
        assert r.url == "http://a.com/p?a=1&b=2&c="

    def test_normalize_query_only_when_grammar_matches(self):
        # queryRe (Crawler.cs:3453) requires k=v pairs; '%' not in charset
        assert sort_query("b=2&a=%20") == "b=2&a=%20"
        assert sort_query("b=2&a=1&") == "a=1&b=2"  # trailing & dropped
        assert sort_query("flag") == "flag"         # no '=' → untouched

    def test_dot_segments(self):
        assert canon1("http://a.com/x/../y/./z").url == "http://a.com/y/z"

    def test_service_key(self):
        # GetServiceKey (Crawler.cs:2989-2992): scheme + '_' + authority
        assert canon1("http://A.com:8080/p").service == "http_a.com:8080"

    def test_invalid(self):
        assert canon1("not a url").url is None


class TestResolveLinks:
    def base(self, n):
        return pd.Series(["http://a.com/dir/page.html"] * n)

    def test_absolute_passthrough(self):
        out = resolve_links(pd.Series(["http://b.com/x"]), self.base(1))
        assert out.iloc[0] == "http://b.com/x"

    def test_relative(self):
        out = resolve_links(pd.Series(["sub/x.html"]), self.base(1))
        assert out.iloc[0] == "http://a.com/dir/sub/x.html"

    def test_root_relative(self):
        out = resolve_links(pd.Series(["/x.html"]), self.base(1))
        assert out.iloc[0] == "http://a.com/x.html"

    def test_protocol_relative(self):
        out = resolve_links(pd.Series(["//c.com/x"]), self.base(1))
        assert out.iloc[0] == "http://c.com/x"

    def test_javascript_mailto_dropped(self):
        # GetAbsoluteLinkUrl (Crawler.cs:1786-1790), case-insensitive
        out = resolve_links(
            pd.Series(["javascript:void(0)", "MAILTO:x@y.z", "JavaScript:f()"]),
            self.base(3),
        )
        assert out.isna().all()

    def test_entity_decode(self):
        # HttpUtility.HtmlDecode before processing (Crawler.cs:1783)
        out = resolve_links(pd.Series(["/x?a=1&amp;b=2"]), self.base(1))
        assert out.iloc[0] == "http://a.com/x?a=1&b=2"

    def test_no_entity_decode_for_css(self):
        # decodeEntities=false for CSS links (Crawler.cs:1906)
        out = resolve_links(pd.Series(["/x?a=1&amp;b=2"]), self.base(1), decode_entities=False)
        assert out.iloc[0] == "http://a.com/x?a=1&amp;b=2"


@given(st.text(alphabet="abcz019_-./!", min_size=0, max_size=30))
@settings(max_examples=200, deadline=None)
def test_canonicalize_idempotent(path):
    """canonicalize(canonicalize(u)) == canonicalize(u) (SURVEY §5.3)."""
    url = "http://ex.com/" + path
    once = canonicalize(pd.Series([url]))
    u1 = once.iloc[0].url
    if u1 is None:
        return
    twice = canonicalize(pd.Series([u1]))
    assert twice.iloc[0].url == u1


@given(st.text(alphabet="ab=&#?x1", min_size=0, max_size=20))
@settings(max_examples=200, deadline=None)
def test_fragment_never_in_key(suffix):
    r = canonicalize(pd.Series(["http://e.com/p" + suffix]))
    key = r.iloc[0].url_key
    if key is not None:
        assert "#" not in key


def test_split_urls_vectorized():
    df = split_urls(pd.Series(["http://a.b/c?d=1#e", "ftp://u:p@h:2121/f", None]))
    assert df.loc[0, "scheme"] == "http"
    assert df.loc[0, "query"] == "d=1"
    assert df.loc[0, "fragment"] == "e"
    assert df.loc[1, "authority"] == "u:p@h:2121"
    assert df.loc[2, "scheme"] == ""
