"""Crawl link graph (ops/web): href host resolution, DOM anchor walk
over tag soup, distinct cross-host edges, domain PageRank composite."""

import pyarrow as pa
import pytest

from webxtract.ops.web import extract_links, href_host


def test_href_host_resolution_table():
    base = "site1.example"
    cases = {
        "https://Site2.Example/p?q=1#f": "site2.example",
        "HTTPS://SITE3.EXAMPLE/x": "site3.example",
        "http://user:pw@site4.example:8080/a": "site4.example",
        "//site5.example/pr": "site5.example",
        "/relative/path": base,
        "?query=only": base,
        "#fragment": base,
        "": base,
        None: base,
        "mailto:a@b.example": None,
        "javascript:void(0)": None,
        "ftp://site6.example/f": None,
        "data:text/plain,hi": None,
        "http:opaque-no-authority": None,
        "https://": None,  # empty authority
    }
    for href, want in cases.items():
        assert href_host(href, base) == want, href


def test_href_host_strips_whitespace():
    assert href_host("  https://site7.example/x \n", None) == \
        "site7.example"


@pytest.mark.usefixtures("ray_session")
def test_extract_links_tag_soup_and_noise():
    """Unclosed tags, nested anchors, duplicate links, self-loops and
    non-web schemes: only distinct cross-host edges survive."""
    import ray.data as rd

    html = (b'<html><body><p>text<a href="https://other.example/a">one'
            b'<a href="https://other.example/b">dup-host</a>'
            b'<a href="/self">self</a>'
            b'<a href="mailto:x@y">m</a>'
            b'<a href="//third.example/pr">pr</a>'
            b'<div><a href="HTTP://FOURTH.EXAMPLE">up</a>')  # unclosed
    ds = rd.from_arrow(pa.table({
        "url": pa.array(["https://me.example/p", "not a url"]),
        "html": pa.array([html, b"<a href='https://x.example'>x</a>"],
                         pa.binary()),
    }))
    df = extract_links(ds).to_pandas()
    got = set(zip(df.src_host, df.dst_host))
    assert got == {("me.example", "other.example"),
                   ("me.example", "third.example"),
                   ("me.example", "fourth.example")}


@pytest.mark.usefixtures("ray_session")
def test_domain_pagerank_matches_local_replica():
    """The composite's integer recurrence over the extracted graph ==
    a dict-based local PageRank replay of the closed-form edges."""
    from webxtract.ops.web import domain_pagerank

    import pyarrow.parquet as pq

    SF = "/root/testdata/sf0.001"
    ids = pq.read_table(f"{SF}/documents.parquet",
                        columns=["doc_id"]).column(0).to_pylist()
    edges = set()
    for i in ids:
        h = i % 50
        for j in range(1 + i % 3):
            t = (i * 7 + 13 * j + 1) % 50
            if t != h:
                edges.add((h, t))
        if i % 5 == 0:
            pr = (i * 3 + 2) % 50
            if pr != h:
                edges.add((h, pr))
    SCALE = 10 ** 12
    deg = {}
    for s, _ in edges:
        deg[s] = deg.get(s, 0) + 1
    n = len(deg)
    rank = {u: SCALE // n for u in deg}
    tele = (15 * SCALE // 100) // n
    for _ in range(5):
        c = {u: 0 for u in deg}
        for s, t in edges:
            if t in c:
                c[t] += rank[s] // deg[s]
        rank = {u: tele + (85 * c[u]) // 100 for u in deg}
    want = sorted(((f"site{u}.example", r) for u, r in rank.items()),
                  key=lambda x: (-x[1], x[0]))[:25]
    df = domain_pagerank(SF).to_pandas()
    assert list(zip(df.host, df.rank_e12)) == want


@pytest.mark.usefixtures("ray_session")
def test_canonicalize_generic_cases():
    """Generic canonicalization behaviors beyond the oracled fixture:
    multi-level dot resolution, idempotence, null for garbage."""
    import ray.data as rd

    from webxtract.ops.web import canonicalize_urls

    cases = [
        ("https://A.B/x/y/../../z/./w", "https://a.b/z/w"),
        ("http://a.b:80/", "http://a.b/"),
        ("http://a.b:8080", "http://a.b:8080/"),
        ("HTTPS://U:P@A.B:443/p#f", "https://a.b/p"),
        ("https://a.b/p?utm_campaign=c&z=9&a=1&fbclid=f",
         "https://a.b/p?a=1&z=9"),
        ("not a url at all", None),
        ("https://a.b/a/./b/./c", "https://a.b/a/b/c"),
    ]
    ds = rd.from_arrow(pa.table({
        "url": pa.array([c[0] for c in cases], pa.string())}))
    df = canonicalize_urls(ds).to_pandas()
    got = [None if v is None else v for v in df.canon_url]
    assert got == [c[1] for c in cases]
    # idempotence: canonicalizing the canonical forms is a no-op
    ds2 = rd.from_arrow(pa.table({
        "url": pa.array([c[1] for c in cases if c[1]], pa.string())}))
    df2 = canonicalize_urls(ds2).to_pandas()
    assert list(df2.canon_url) == list(df2.url)


def test_parse_robots_and_precedence():
    from webxtract.ops.web import parse_robots, robots_decision

    txt = ("# c\r\nUser-Agent: A\nUser-agent: *\nDisallow: /a/\n"
           "Allow: /a/b/\n\nUser-agent: other\nDisallow: /\n")
    rules = parse_robots(txt)
    assert rules == [(False, "/a/"), (True, "/a/b/")]
    assert robots_decision("/a/x", rules) is False
    assert robots_decision("/a/b/x", rules) is True
    assert robots_decision("/c", rules) is True
    # equal-length tie: Allow wins
    tie = [(False, "/p/"), (True, "/p/")]
    assert robots_decision("/p/x", tie) is True
    # RFC 9309 §2.2.1: a named group SUPERSEDES '*' groups entirely
    assert parse_robots(txt, agent="other") == [(False, "/")]
    # ...and with no named group, '*' applies
    assert parse_robots(txt, agent="nobody") == [
        (False, "/a/"), (True, "/a/b/")]


def test_robots_wildcards_rfc9309():
    """§2.2.3 special characters: '*' spans any run, a FINAL '$'
    anchors at path end, '$' elsewhere is literal; precedence
    compares RULE PATTERN octets (so a long allow wildcard beats a
    short disallow wildcard)."""
    from webxtract.ops.web import (_robots_rule_matcher, parse_robots,
                                   robots_decision)

    pdf = [(False, "/*.pdf$")]
    assert robots_decision("/doc.pdf", pdf) is False
    assert robots_decision("/a/b/doc.pdf", pdf) is False
    assert robots_decision("/doc.pdfx", pdf) is True   # anchored
    assert robots_decision("/doc.pdf/", pdf) is True   # anchored
    assert robots_decision("/pdf", pdf) is True

    mid = [(False, "/a*/b")]
    assert robots_decision("/aXYZ/b", mid) is False
    assert robots_decision("/a/b", mid) is False       # '*' spans ""
    assert robots_decision("/a/c", mid) is True
    assert robots_decision("/aXYZ/bTAIL", mid) is False  # no anchor

    # '$' not at the end is a literal character
    lit = [(False, "/x$y")]
    assert robots_decision("/x$y/z", lit) is False
    assert robots_decision("/xAy", lit) is True

    # pattern-octet precedence: '/files/public*' (14) beats both
    # '/files/' (7) and '/*.pdf$' (7)
    rules = [(False, "/*.pdf$"), (True, "/files/public*"),
             (False, "/files/")]
    assert robots_decision("/files/public/a.pdf", rules) is True
    assert robots_decision("/files/secret/a.pdf", rules) is False
    assert robots_decision("/other/a.pdf", rules) is False

    # regex metacharacters in rule paths stay literal
    meta = [(False, "/q?.+(x)*")]
    assert robots_decision("/q?.+(x)ANY", meta) is False
    assert robots_decision("/qA.+(x)", meta) is True

    # fast path stays literal-prefix
    assert _robots_rule_matcher("/plain/") == ("prefix", "/plain/")
    kind, rx = _robots_rule_matcher("/*.pdf$")
    assert kind == "re" and rx.startswith("^") and rx.endswith("$")
    # empty Disallow adds no rule; unmatched group contributes nothing
    assert parse_robots("User-agent: *\nDisallow:\n") == []
    assert parse_robots("User-agent: bot\nDisallow: /\n") == []


def test_parse_sitemap_soup_and_index():
    from webxtract.ops.web import parse_sitemap

    xml = ('<?xml version="1.0"?><!-- c --><urlset xmlns="x">'
           "<url><loc> https://a.b/1 </loc><lastmod>2024-01-02"
           "</lastmod></url><url><lastmod>no-loc-dropped</lastmod>"
           "</url><url><loc>https://a.b/2</loc></url></urlset>")
    got = parse_sitemap(xml)
    assert got == [
        {"kind": "url", "loc": "https://a.b/1", "lastmod": "2024-01-02"},
        {"kind": "url", "loc": "https://a.b/2", "lastmod": None}]
    idx = parse_sitemap("<sitemapindex><sitemap><loc>https://a.b/s1.xml"
                        "</loc></sitemap></sitemapindex>")
    assert idx == [{"kind": "sitemap", "loc": "https://a.b/s1.xml",
                    "lastmod": None}]
    assert parse_sitemap(b"") == []
    assert parse_sitemap(b"garbage <<< not xml") == []


def test_html_table_occupancy_grid():
    """rowspan/colspan grid semantics, nested tables, tag soup."""
    from webxtract.htmldom import parse_html
    from webxtract.ops.web import html_table_cells

    html = ('<table><tr><td rowspan="2">A</td><td>B</td><td>C</td></tr>'
            "<tr><td>D</td><td>E</td></tr></table>")
    [cells] = html_table_cells(parse_html(html))
    assert [(c["row"], c["col"], c["text"]) for c in cells] == [
        (0, 0, "A"), (0, 1, "B"), (0, 2, "C"),
        (1, 1, "D"), (1, 2, "E")]  # row 1 col 0 occupied by A

    # nested table: inner cells belong to the inner table only
    html2 = ("<table><tr><td>outer<table><tr><td>inner</td></tr>"
             "</table></td></tr></table>")
    tables = html_table_cells(parse_html(html2))
    assert len(tables) == 2
    assert [c["text"] for c in tables[0]] == ["outer"]
    assert [c["text"] for c in tables[1]] == ["inner"]

    # tag soup: unclosed td/tr still yield every cell once
    soup = "<table><tr><td>a<td>b<tr><td>c</table>"
    [cells3] = html_table_cells(parse_html(soup))
    assert [(c["row"], c["col"], c["text"]) for c in cells3] == [
        (0, 0, "a"), (0, 1, "b"), (1, 0, "c")]

    # hostile spans clamp; th marks header
    h = ('<table><tr><th colspan="999999">H</th></tr>'
         '<tr><td rowspan="-3">x</td></tr></table>')
    [cells4] = html_table_cells(parse_html(h))
    assert cells4[0]["header"] and cells4[0]["col"] == 0
    assert cells4[1] == {"row": 1, "col": 0, "text": "x",
                         "header": False}


def test_extract_page_meta_edges():
    from webxtract.htmldom import parse_html
    from webxtract.ops.web import extract_page_meta

    # first-wins, missing fields None, multi-token robots, rel case
    html = ("<head><title>A</title><title>B</title>"
            '<meta name="ROBOTS" content="nofollow , NoIndex ">'
            '<link rel="CANONICAL" href="https://a.b/c">'
            '<meta name="description" content="d1">'
            '<meta name="description" content="d2"></head>')
    m = extract_page_meta(parse_html(html))
    assert m == {"title": "A", "description": "d1",
                 "canonical": "https://a.b/c", "noindex": True,
                 "og_title": None}
    assert extract_page_meta(parse_html("")) == {
        "title": None, "description": None, "canonical": None,
        "noindex": False, "og_title": None}


def test_html_form_fields_edges():
    from webxtract.htmldom import parse_html
    from webxtract.ops.web import html_form_fields

    # label-for beats enclosing label; hidden/submit/button suppressed;
    # select default = first option; option text when no value attr
    html = ('<form><label for="a">ForKey</label>'
            '<label>Enclosing <input id="a" name="x"></label>'
            '<input type="hidden" name="h" value="1">'
            '<input type="submit" value="Go">'
            '<select name="s"><option>First</option>'
            "<option>Second</option></select></form>"
            '<form><input name="second-form"></form>')
    forms = html_form_fields(parse_html(html))
    assert len(forms) == 2
    assert forms[0] == [
        {"key": "ForKey", "field_name": "x", "field_type": "text",
         "value": ""},
        {"key": "s", "field_name": "s", "field_type": "select",
         "value": "First"},
    ]
    assert forms[1] == [{"key": "second-form",
                         "field_name": "second-form",
                         "field_type": "text", "value": ""}]
    assert html_form_fields(parse_html("<p>no forms</p>")) == []


def test_extract_jsonld_blocks_edges():
    from webxtract.ops.web import extract_jsonld_blocks

    html = ('<script type="application/ld+json">{"@type": "A", '
            '"name": "n"}</script>'
            "<script>var x = 1;</script>"  # plain script ignored
            '<script type="APPLICATION/LD+JSON">[{"@type": "B"}, 3, '
            '{"@type": "C"}]</script>'  # case-insens; non-dict dropped
            '<script type="application/ld+json">{"@graph": '
            '[{"@type": "G1"}, {"@type": "G2"}]}</script>'
            '<script type="application/ld+json">{broken</script>')
    blocks = extract_jsonld_blocks(html)
    assert [[i.get("@type") for i in b] for b in blocks] == [
        ["A"], ["B", "C"], ["G1", "G2"], []]
    assert extract_jsonld_blocks("no scripts here") == []


def test_extract_alternates_edges():
    from webxtract.htmldom import parse_html
    from webxtract.ops.web import extract_alternates

    html = ('<link rel="ALTERNATE" hreflang="EN-gb" href="/en">'
            '<link rel="alternate" href="/no-lang">'
            '<link rel="stylesheet" hreflang="de" href="/css">'
            '<meta http-equiv="refresh" content="0;url=https://a.b/r">'
            '<meta http-equiv="refresh" content="9; url=/second">'
            '<meta http-equiv="refresh" content="not parseable">')
    rows = extract_alternates(parse_html(html))
    assert rows == [
        {"kind": "alternate", "lang": "en-gb", "href": "/en"},
        {"kind": "refresh", "lang": None, "href": "https://a.b/r"},
    ]  # no-hreflang + wrong-rel dropped; first refresh wins


def test_parse_feed_edges():
    from webxtract.ops.web import parse_feed

    rss = ("<rss><channel><title>Chan</title>"
           "<item><title>A</title><link>https://a.b/1</link>"
           "<pubDate>d1</pubDate></item>"
           "<item><title>NoLink</title></item></channel></rss>")
    got = parse_feed(rss)
    assert got == [{"kind": "rss", "title": "A",
                    "link": "https://a.b/1", "published": "d1"}]
    atom = ('<feed><entry><title>B</title>'
            '<link rel="self" href="https://a.b/feed"/>'
            '<link rel="alternate" href="https://a.b/2"/>'
            "<updated>d2</updated></entry>"
            '<entry><title>C</title><link href="https://a.b/3"/>'
            "</entry></feed>")
    got = parse_feed(atom)
    assert got == [
        {"kind": "atom", "title": "B", "link": "https://a.b/2",
         "published": "d2"},
        {"kind": "atom", "title": "C", "link": "https://a.b/3",
         "published": None}]
    # no-rel first link fallback when no alternate exists
    only_self = ('<feed><entry><link rel="self" '
                 'href="https://a.b/f"/></entry></feed>')
    assert parse_feed(only_self)[0]["link"] == "https://a.b/f"
    assert parse_feed("") == []


@pytest.mark.usefixtures("ray_session")
def test_topic_clusters_invariants():
    """Partitioning invariance is covered by the dict-replica parity
    (oracle); here pin structure: balanced-ish non-degenerate
    clusters and deterministic rerun."""
    from webxtract.ops.text import docs_topic_clusters

    SF = "/root/testdata/sf0.001"
    a = docs_topic_clusters(SF).to_pandas()
    b = docs_topic_clusters(SF).to_pandas()
    assert a.equals(b)
    sizes = a.cluster.value_counts()
    assert len(sizes) == 4 and sizes.min() > 0
