"""Hostile-input fuzz: every web parser must degrade to data (empty /
partial results), never raise — the M1 malformed-input contract
applied to the round-3 web surface. Hypothesis drives byte/text noise
plus structure-adjacent fragments."""

from hypothesis import given, settings
from hypothesis import strategies as st

from webxtract.htmldom import parse_html
from webxtract.ops.pageprep import estimate_skew_mdeg, otsu_threshold
from webxtract.ops.warc import _gunzip_members, cdx_records, parse_warc
from webxtract.ops.web import (extract_alternates, extract_jsonld_blocks,
                               extract_page_meta, href_host,
                               html_form_fields, html_table_cells,
                               parse_crawl_delay, parse_feed,
                               parse_robots, parse_sitemap,
                               render_markdown, robots_decision)

# fragments that look like the formats under test, plus raw noise
_FRAG = st.sampled_from([
    "<table><tr><td>", "</td></table>", "<a href='", "'>x</a>",
    "<label for=", "<input name=", "<form>", "<url><loc>",
    "<item><link>", "<entry><link href=", "WARC/1.0\r\n",
    "Content-Length: 7", "\r\n\r\n", "User-agent: *", "Disallow: /",
    "Crawl-delay: x", '<script type="application/ld+json">', "{\"a\":",
    "<meta name=robots content=noindex>", "https://", "//host:99/",
    "mailto:", "%2F%ZZ", "#frag", "?a=1&", "<!---->", "\x00\xff",
    "<link rel=alternate hreflang=", "<meta http-equiv=refresh",
])
_TEXT = st.lists(_FRAG, max_size=12).map("".join) | st.text(max_size=80)


@settings(max_examples=60, deadline=None)
@given(_TEXT)
def test_dom_family_never_raises(s):
    root = parse_html(s)
    html_table_cells(root)
    html_form_fields(root)
    extract_page_meta(root)
    extract_alternates(root)
    render_markdown(root)
    parse_sitemap(s)
    parse_feed(s)
    extract_jsonld_blocks(s)


@settings(max_examples=60, deadline=None)
@given(_TEXT, st.sampled_from(["*", "bot", "Mega-Crawler"]))
def test_robots_family_never_raises(s, agent):
    rules = parse_robots(s, agent=agent)
    robots_decision("/any/path", rules)
    d = parse_crawl_delay(s, agent=agent)
    assert d is None or d >= 0


@settings(max_examples=60, deadline=None)
@given(_TEXT, st.none() | st.just("base.example"))
def test_href_host_never_raises(s, base):
    h = href_host(s, base)
    assert h is None or isinstance(h, str)


@settings(max_examples=40, deadline=None)
@given(st.binary(max_size=400))
def test_warc_binary_never_raises(raw):
    assert isinstance(parse_warc(raw), list)
    _gunzip_members(raw)
    assert isinstance(cdx_records(raw), list)
    # gzip magic prefix + garbage must also degrade
    _gunzip_members(b"\x1f\x8b" + raw)
    parse_warc(b"\x1f\x8b" + raw)
    cdx_records(b"\x1f\x8b" + raw)


@settings(max_examples=20, deadline=None)
@given(st.integers(1, 12), st.integers(1, 12), st.integers(0, 255))
def test_pageprep_tiny_images_never_raise(h, w, v):
    import numpy as np

    g = np.full((h, w), v, np.uint8)
    t = otsu_threshold(g)
    assert 0 <= t <= 255
    estimate_skew_mdeg(g <= t)


@settings(max_examples=60, deadline=None)
@given(_TEXT)
def test_session4_scalar_family_never_raises(s):
    # fourth-session scalar surfaces: PSL matcher, jump key, gear
    # chunking — hostile text degrades to data everywhere
    from webxtract.ops.cdc import chunk_spans
    from webxtract.ops.web import (_md5_key64, jump_bucket,
                                   registrable_domain)

    suffix, reg, kind = registrable_domain(s)
    assert kind in ("ok", "suffix", "ip", "bad")
    assert 0 <= jump_bucket(_md5_key64(s), 64) < 64
    spans = chunk_spans(s.encode("utf-8", "surrogatepass"),
                        mask_bits=6, min_size=4, max_size=64)
    assert sum(ln for _, ln in spans) == len(
        s.encode("utf-8", "surrogatepass"))


@settings(max_examples=40, deadline=None)
@given(st.binary(max_size=300))
def test_http_header_parse_never_raises(raw):
    # header blocks are attacker-controlled bytes; the parser runs
    # on latin-1 text and must emit a row for ANY input
    import pyarrow as pa

    from webxtract.ops.warc import (_CT_CHARSET, _CT_LINE, _LASTMOD,
                                    _NOINDEX, _STATUS)
    import re

    h = raw.decode("latin-1")
    # the exact patterns the batch op applies — none may raise, and
    # a match is always a sane type
    for pat in (_CT_LINE, _LASTMOD):
        m = re.search(pat, h)
        assert m is None or isinstance(m.group(1), str)
    re.search(_NOINDEX, h)
    re.search(_STATUS, h)
    re.search(_CT_CHARSET, h)
    assert isinstance(pa.scalar(h), pa.Scalar)
