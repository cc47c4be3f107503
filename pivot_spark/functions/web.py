"""Web-document extraction functions — the WET-style HTML-to-text step
of a crawl-curation pipeline (strip markup, pull the title, measure
link density and encoding damage before quality filtering).

All pure Catalyst expressions (no Python UDFs, no external HTML parser):
regex passes chosen to mean the same thing in Java regex (Spark) and
RE2 (DuckDB) so every function is oracle-checkable —

* non-greedy ``.*?`` and inline ``(?is)`` flags only; NO backreferences
  or lookarounds (RE2 has neither), so script/style blocks are removed
  in two literal passes instead of one ``</\\1>`` pass;
* entity decoding is plain ``replace`` with ``&amp;`` LAST so already-
  decoded ampersands are never double-decoded.

A regex pipeline is not a spec-grade HTML5 parser (unclosed raw-text
elements, CDATA, conditional comments stay out of scope) — it is the
deterministic, shuffle-free 80% that CCNet/RefinedWeb-class pipelines
run at crawl scale; at 100 TB these stay in the scan stage inside
whole-stage codegen.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

# closers that imply a word/visual break -> newline, so words from
# adjacent blocks (or adjacent nav anchors) don't fuse when tags are
# stripped; </a> costs at most one extra collapsible space inside prose
_BLOCK_RE = r"(?i)</(a|p|div|h1|h2|h3|h4|h5|h6|li|tr|td|th|ul|ol|table|blockquote|section|article|header|footer|nav)>|<br[^>]*>|<hr[^>]*>"
_TAG_RE = r"<[^>]*>"
_SCRIPT_RE = r"(?is)<script[^>]*>.*?</script>"
_STYLE_RE = r"(?is)<style[^>]*>.*?</style>"
_COMMENT_RE = r"(?s)<!--.*?-->"

# (entity, replacement) in APPLICATION ORDER — &amp; must stay last
ENTITIES: tuple[tuple[str, str], ...] = (
    ("&nbsp;", " "),
    ("&lt;", "<"),
    ("&gt;", ">"),
    ("&quot;", '"'),
    ("&#39;", "'"),
    ("&amp;", "&"),
)


def _decode_entities(col: Column) -> Column:
    for ent, rep in ENTITIES:
        col = F.replace(col, F.lit(ent), F.lit(rep))
    return col


def strip_html(html: Column) -> Column:
    """Visible text of an HTML document: drop comments and
    script/style payloads, turn block-element closers into newlines,
    strip remaining tags, decode the six ubiquitous entities, collapse
    whitespace runs to single spaces, trim."""
    t = F.regexp_replace(html, _COMMENT_RE, "")
    t = F.regexp_replace(t, _SCRIPT_RE, "")
    t = F.regexp_replace(t, _STYLE_RE, "")
    t = F.regexp_replace(t, _BLOCK_RE, "\n")
    t = F.regexp_replace(t, _TAG_RE, "")
    t = _decode_entities(t)
    t = F.regexp_replace(t, r"\s+", " ")
    return F.trim(t)


def html_title(html: Column) -> Column:
    """``<title>`` content (first match, tags inside stripped, trimmed);
    empty string when absent — the standard doc-name fallback source."""
    raw = F.regexp_extract(html, r"(?is)<title[^>]*>(.*?)</title>", 1)
    return F.trim(_decode_entities(F.regexp_replace(raw, _TAG_RE, "")))


def link_density(html: Column) -> Column:
    """Fraction of visible text characters that live inside ``<a>``
    anchors — the classic boilerplate signal (nav/footer link farms
    score near 1, body prose near 0). 0.0 when the page has no visible
    text."""
    anchors = F.array_join(
        F.regexp_extract_all(html, F.lit(r"(?is)<a[^>]*>(.*?)</a>"), 1), " "
    )
    anchor_text = strip_html(anchors)
    visible = strip_html(html)
    return F.coalesce(
        F.try_divide(
            F.length(anchor_text).cast("double"),
            F.length(visible).cast("double"),
        ),
        F.lit(0.0),
    )


# tracking parameters dropped by normalize_url: utm_* family plus the
# big platforms' click ids — the params that make one page look like
# millions of distinct URLs in a crawl frontier
TRACKING_PARAM_RE = r"^(utm_[^=]*|fbclid|gclid|msclkid|ref)(=|$)"
_SCHEME_RE = r"^([A-Za-z][A-Za-z0-9+.-]*)://"


def url_host(url: Column) -> Column:
    """Lowercased host[:port] of an absolute URL ('' if scheme-less)."""
    return F.lower(
        F.regexp_extract(F.trim(url), _SCHEME_RE + r"([^/?#]*)", 2)
    )


def normalize_url(url: Column) -> Column:
    """Canonical form of an absolute http(s) URL — the crawl-frontier /
    URL-dedup key: scheme and host lowercased (path case is preserved —
    paths are case-sensitive per RFC 3986), default port dropped (:80
    for http, :443 for https), empty path -> '/', tracking parameters
    removed (``TRACKING_PARAM_RE``), remaining query params sorted,
    fragment dropped. Scheme-less input is returned trimmed unchanged
    (not a crawlable absolute URL; don't guess)."""
    u = F.trim(url)
    scheme = F.lower(F.regexp_extract(u, _SCHEME_RE, 1))
    hostport = url_host(url)
    host = (
        F.when(scheme == "https", F.regexp_replace(hostport, r":443$", ""))
        .when(scheme == "http", F.regexp_replace(hostport, r":80$", ""))
        .otherwise(hostport)
    )
    path = F.regexp_extract(u, _SCHEME_RE + r"[^/?#]*([^?#]*)", 2)
    path = F.when(path == "", F.lit("/")).otherwise(path)
    params = F.array_sort(
        F.filter(
            F.split(F.regexp_extract(u, r"\?([^#]*)", 1), "&"),
            lambda x: (x != "") & ~x.rlike(TRACKING_PARAM_RE),
        )
    )
    q = F.array_join(params, "&")
    canon = F.concat(
        scheme, F.lit("://"), host, path,
        F.when(q == "", F.lit("")).otherwise(F.concat(F.lit("?"), q)),
    )
    return F.when(scheme == "", u).otherwise(canon)


def non_ascii_ratio(text: Column) -> Column:
    """Share of characters outside printable ASCII + whitespace —
    a cheap mojibake / wrong-encoding signal (legit non-Latin text also
    scores high; combine with language-ID). 0.0 for empty text."""
    stripped = F.regexp_replace(text, r"[ -~\t\n\r]", "")
    return F.coalesce(
        F.try_divide(
            F.length(stripped).cast("double"), F.length(text).cast("double")
        ),
        F.lit(0.0),
    )


def ctrl_char_count(text: Column) -> Column:
    """Count of C0 control characters other than tab/newline/CR — any
    nonzero value marks binary spill or transport corruption."""
    return F.length(text) - F.length(
        F.regexp_replace(text, r"[\x00-\x08\x0B\x0C\x0E-\x1F]", "")
    )
