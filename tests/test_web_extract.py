"""Web extraction functions (functions/web.py): strip_html, html_title,
link_density, non_ascii_ratio, ctrl_char_count."""

import pytest
from pyspark.sql import functions as F

from pivot_spark.functions.web import (
    ctrl_char_count,
    html_title,
    link_density,
    non_ascii_ratio,
    strip_html,
)


def _one(spark, html, col):
    df = spark.createDataFrame([(html,)], "h string")
    return df.select(col(F.col("h")).alias("v")).collect()[0].v


PAGE = (
    '<html><head><title> A &amp; B </title><style>p{x:1}</style>'
    "<script>var s='<p>hidden</p>';</script></head><body><!-- c -->"
    '<nav><a href="/">Home</a><a href="/x">More stuff</a></nav>'
    "<h1>Head</h1><p>One&nbsp;two &lt;t&gt;.</p><p>Three</p></body></html>"
)


def test_strip_html_drops_script_style_comments(spark):
    out = _one(spark, PAGE, strip_html)
    assert out == "A & B Home More stuff Head One two <t>. Three"
    assert "hidden" not in out and "x:1" not in out


def test_strip_html_block_tags_separate_words(spark):
    out = _one(spark, "<div>alpha</div><div>beta</div>", strip_html)
    assert out == "alpha beta"  # not "alphabeta"


def test_strip_html_plain_text_passthrough(spark):
    assert _one(spark, "no markup at all", strip_html) == "no markup at all"


def test_html_title_nested_tags_and_entities(spark):
    assert _one(spark, PAGE, html_title) == "A & B"
    assert _one(spark, "<title><b>Bold</b> name</title>", html_title) == "Bold name"
    assert _one(spark, "<p>untitled</p>", html_title) == ""


def test_link_density_bounds(spark):
    assert _one(spark, "<p>prose only</p>", link_density) == 0.0
    nav_only = '<a href="/">all links here</a>'
    assert _one(spark, nav_only, link_density) == pytest.approx(1.0)
    mixed = _one(spark, PAGE, link_density)
    assert 0.0 < mixed < 1.0


def test_link_density_empty_page(spark):
    assert _one(spark, "", link_density) == 0.0


def test_non_ascii_ratio(spark):
    assert _one(spark, "pure ascii\twith tabs\n", non_ascii_ratio) == 0.0
    half = "abé©"
    assert _one(spark, half, non_ascii_ratio) == pytest.approx(0.5)
    assert _one(spark, "", non_ascii_ratio) == 0.0


def test_ctrl_char_count(spark):
    assert _one(spark, "clean text\r\n\tok", ctrl_char_count) == 0
    assert _one(spark, "bad\x07mid\x01end", ctrl_char_count) == 2


def test_normalize_url_full(spark):
    from pivot_spark.functions.web import normalize_url

    got = _one(
        spark,
        "HTTPS://WWW.Site.COM:443/Mixed/Path?utm_source=x&b=2&a=1&fbclid=z#frag",
        normalize_url,
    )
    assert got == "https://www.site.com/Mixed/Path?a=1&b=2"


def test_normalize_url_ports_and_empty_path(spark):
    from pivot_spark.functions.web import normalize_url

    assert _one(spark, "http://a.com:80", normalize_url) == "http://a.com/"
    # :80 is only default for http — https keeps it
    assert _one(spark, "https://a.com:80/x", normalize_url) == "https://a.com:80/x"
    assert _one(spark, "ftp://a.com:21/f", normalize_url) == "ftp://a.com:21/f"


def test_normalize_url_all_params_tracking(spark):
    from pivot_spark.functions.web import normalize_url

    assert (
        _one(spark, "http://a.com/p?utm_a=1&utm_b&gclid=2", normalize_url)
        == "http://a.com/p"
    )


def test_normalize_url_schemeless_passthrough(spark):
    from pivot_spark.functions.web import normalize_url

    assert _one(spark, "  not-a-url/path?x=1 ", normalize_url) == "not-a-url/path?x=1"


def test_url_host(spark):
    from pivot_spark.functions.web import url_host

    assert _one(spark, "HTTP://User.Example.ORG:8080/a", url_host) == "user.example.org:8080"
    assert _one(spark, "no scheme", url_host) == ""
