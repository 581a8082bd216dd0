"""Sitemap discovery from robots.txt (webxtract/ops/web.py
parse_sitemap_urls): global-field scoping, case/comment handling,
order. Fixture parity lives in test_oracle_parity.py
(robots_sitemaps)."""

from webxtract.ops.web import (_robots_fixture_text, parse_robots,
                               parse_crawl_delay, parse_sitemap_urls)


def test_global_field_any_position_and_case():
    text = ("Sitemap: https://a.x/one.xml\n"
            "User-agent: *\nDisallow: /p/\n"
            "SITEMAP: https://a.x/two.xml  # comment\n"
            "User-agent: bot\nDisallow: /\n"
            "sitemap: https://a.x/three.xml\n")
    assert parse_sitemap_urls(text) == [
        "https://a.x/one.xml", "https://a.x/two.xml",
        "https://a.x/three.xml"]


def test_empty_values_and_noise_dropped():
    assert parse_sitemap_urls("sitemap:\nsitemap: # only comment\n"
                              "sitemaps: https://no.x/a.xml\n") == []
    assert parse_sitemap_urls("") == []
    assert parse_sitemap_urls(None) == []


def test_sitemap_lines_do_not_leak_into_group_parsing():
    # the fixture gained Sitemap lines; group decisions and delays
    # must be byte-for-byte what they were (robots_gate /
    # robots_crawl_delay oracle parity pins this end to end — this is
    # the unit-level twin)
    for h in range(8):
        text = _robots_fixture_text(h)
        rules = parse_robots(text)
        assert all(p and not p.lower().startswith("sitemap")
                   for _, p in rules)
        d = parse_crawl_delay(text)
        assert d == {0: 1000, 3: 4000}.get(h % 4)
