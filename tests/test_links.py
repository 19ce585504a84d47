"""Link-extraction kernel tests — one per regex branch of Crawler.cs:2172-2200."""

import pandas as pd

from webcrawl_spark.kernels.links import (
    extract_links_batch,
    find_base_href,
    scan_css,
    scan_html,
)


def hrefs(links):
    return [h for h, _, _ in links]


class TestHtmlLinkRe:
    def test_a_href_quoted(self):
        assert scan_html('<a href="http://x/y">t</a>') == [("http://x/y", "link", True)]

    def test_a_href_single_quoted(self):
        assert scan_html("<a href='u1'>") == [("u1", "link", True)]

    def test_a_href_unquoted(self):
        assert scan_html("<a href=u2>") == [("u2", "link", True)]

    def test_img_script_embed_src_are_resources(self):
        out = scan_html('<img src="i.png"><script src="s.js"></script><embed src="e.swf">')
        assert out == [
            ("i.png", "resource", True),
            ("s.js", "resource", True),
            ("e.swf", "resource", True),
        ]

    def test_frame_iframe_are_links(self):
        out = scan_html('<frame src="f.html"><iframe src="g.html">')
        assert [(h, t) for h, t, _ in out] == [("f.html", "link"), ("g.html", "link")]

    def test_link_href_is_resource(self):
        assert scan_html('<link rel=stylesheet href="c.css">') == [("c.css", "resource", True)]

    def test_applet_object_param_background(self):
        out = scan_html(
            '<applet code="A.class"></applet>'
            '<object data="o.bin"></object>'
            '<param name="movie" value="m.swf">'
            '<body background="b.gif">'
        )
        assert hrefs(out) == ["A.class", "o.bin", "m.swf", "b.gif"]
        assert all(t == "resource" for _, t, _ in out)

    def test_attr_order_irrelevant(self):
        assert scan_html('<a class="c" href="u">') == [("u", "link", True)]

    def test_case_insensitive(self):
        assert scan_html('<A HREF="U">') == [("U", "link", True)]


class TestStyleAndCss:
    def test_style_block_import_and_url(self):
        out = scan_html('<style>@import "a.css"; .x{background:url(b.png)}</style>')
        assert hrefs(out) == ["a.css", "b.png"]
        # css-sourced links are NOT entity-decoded (Crawler.cs:1906)
        assert all(dec is False for _, _, dec in out)

    def test_inline_style_attr(self):
        out = scan_html('<div style="background:url(\'q.jpg\')">')
        assert hrefs(out) == ["q.jpg"]

    def test_css_document(self):
        out = scan_css('@import "x.css"; a{background:url("y.png")}')
        assert hrefs(out) == ["x.css", "y.png"]

    def test_url_quote_variants(self):
        assert hrefs(scan_css("url(a)url('b')url(\"c\")")) == ["a", "b", "c"]


class TestBaseRe:
    def test_base_href(self):
        # baseRe (Crawler.cs:2170); first match wins (ScanForLinks:1884-1890)
        assert find_base_href('<base target=x href="http://b/">') == "http://b/"
        assert find_base_href("<p>no base</p>") is None

    def test_base_unquoted(self):
        assert find_base_href("<base href=http://b/dir/>") == "http://b/dir/"


class TestOrderAndBatch:
    def test_scan_order_html_then_style(self):
        # htmlLinkRe matches first, then style blocks (Crawler.cs:1892-1912)
        html = '<style>url(z.png)</style><a href="a.html">'
        assert hrefs(scan_html(html)) == ["a.html", "z.png"]

    def test_batch(self):
        s = extract_links_batch(
            pd.Series(['<a href="u">', "body{background:url(v)}", None, "plain"]),
            pd.Series(["html", "css", "html", "binary"]),
        )
        assert hrefs(s.iloc[0]) == ["u"]
        assert hrefs(s.iloc[1]) == ["v"]
        assert s.iloc[2] == []
        assert s.iloc[3] == []


def test_scan_html_spans_reconstruct():
    """Span invariant: text[s:e] == href for every span scan_html_spans
    emits, and the (href, type, dec) sequence equals scan_html's."""
    from webcrawl_spark.kernels.links import scan_html, scan_html_spans

    html = (
        '<a href="/a.html">x</a><img src="/i.png">'
        "<a href='/b.html?q=1'>y</a>"
        '<link href="/c.css"><style>@import "/d.css"; '
        "div{background:url('/e.png')}</style>"
        '<div style="background:url(/f.gif)"></div>'
        '<body background="/g.jpg">'
    )
    spans = scan_html_spans(html)
    assert spans, "expected links"
    for s, e, href, _lt, _dec in spans:
        assert html[s:e] == href, (href, html[s:e])
    assert [(h, t, d) for _s, _e, h, t, d in spans] == scan_html(html)


def test_scan_html_spans_property():
    """Randomized documents: spans always slice back to their hrefs."""
    import random

    from webcrawl_spark.fixtures.gen import render_html
    from webcrawl_spark.kernels.links import scan_html, scan_html_spans

    rng = random.Random(7)
    for trial in range(25):
        links = [
            (f"/p{rng.randrange(100)}.html" if rng.random() < 0.5
             else f"/img{rng.randrange(100)}.png",
             "link" if rng.random() < 0.5 else "resource")
            for _ in range(rng.randrange(0, 12))
        ]
        html = render_html(links, rng=rng, title=f"t{trial}").decode("utf-8")
        spans = scan_html_spans(html)
        for s, e, href, _lt, _dec in spans:
            assert html[s:e] == href
        assert [(h, t, d) for _s, _e, h, t, d in spans] == scan_html(html)
