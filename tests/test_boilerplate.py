"""Unit battery for main-content extraction (functions/boilerplate)."""

from webcrawl_spark.functions.boilerplate import strip_boilerplate


def _row(spark, html):
    pages = spark.createDataFrame([("u", html)], "url string, html string")
    return strip_boilerplate(pages).collect()[0]


def test_strip_boilerplate_keeps_content_drops_chrome(spark):
    r = _row(
        spark,
        '<div>home | <a href="/">start</a> <a href="/a">about us</a>'
        ' <a href="/b">contact now</a></div>'
        "<p>the main article content continues with many plain words here</p>"
        '<div><a href="/x">one two</a> <a href="/y">three four</a></div>'
        "<p>short.</p>",
    )
    assert r.n_blocks == 4 and r.blocks_kept == 1
    assert r.text_main == (
        "the main article content continues with many plain words here"
    )


def test_strip_boilerplate_removes_script_and_style(spark):
    r = _row(
        spark,
        "<script>many plain words that would otherwise count as content"
        " here</script>"
        "<style>p div span body main article header footer nav aside</style>"
        "<p>the surviving paragraph has enough plain words here</p>",
    )
    assert r.blocks_kept == 1 and "surviving" in r.text_main
    assert "script" not in r.text_main and "aside" not in r.text_main


def test_strip_boilerplate_mixed_block_under_density_kept(spark):
    # 3 of 12 words inside the anchor → 250‰ ≤ 500‰ → kept, text intact
    r = _row(
        spark,
        '<p>a paragraph with <a href="/z">one inline link</a> and several'
        " more plain words here</p>",
    )
    assert r.blocks_kept == 1
    assert r.text_main == (
        "a paragraph with one inline link and several more plain words here"
    )


def test_strip_boilerplate_majority_link_block_dropped(spark):
    # 6 of 9 words inside anchors → 666‰ > 500‰ → dropped
    r = _row(
        spark,
        '<div>footer <a href="/s">site map pages</a> and'
        ' <a href="/t">terms of use</a></div>',
    )
    assert r.n_blocks == 1 and r.blocks_kept == 0 and r.text_main == ""


def test_strip_boilerplate_empty_page(spark):
    r = _row(spark, "")
    assert r.n_blocks == 0 and r.blocks_kept == 0 and r.text_main == ""
