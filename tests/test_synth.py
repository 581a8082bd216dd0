"""Corpus generator determinism + family mix (FIXTURES.md §1)."""

from collections import Counter

from webxtract import synth


def test_deterministic():
    a = synth.make_pages(300, seed=42)
    b = synth.make_pages(300, seed=42)
    assert a.equals(b)


def test_seed_changes_content():
    a = synth.make_pages(50, seed=42)
    b = synth.make_pages(50, seed=43)
    assert not a.equals(b)


def test_family_mix_and_dups():
    t = synth.make_pages(1000, seed=42)
    urls = t.column("url").to_pylist()
    fams = Counter(u.split("/")[3] for u in urls)
    assert fams["receipt"] >= 400       # 40% + dup rows landing in receipts
    assert fams["bad"] == 100           # bad docs never duplicated
    dup_urls = [u for u, c in Counter(urls).items() if c > 1]
    assert 20 <= len(dup_urls) <= 40    # ~3%


def test_dup_has_later_ts_same_url():
    t = synth.make_pages(100, seed=42)
    urls = t.column("url").to_pylist()
    ts = t.column("warc_ts").to_pylist()
    seen = {}
    for u, s in zip(urls, ts):
        if u in seen:
            assert s > seen[u]
        seen[u] = s


def test_schema_matches_input_hint():
    t = synth.make_pages(10)
    assert [f.name for f in t.schema] == ["url", "warc_ts", "html", "text", "lang"]
    assert str(t.schema.field("warc_ts").type) == "timestamp[us]"
    assert str(t.schema.field("html").type) == "binary"


def test_sharded_generation_equals_single():
    whole = synth.make_pages(120, seed=42)
    part1 = synth.make_pages(60, seed=42, doc_id_start=0)
    part2 = synth.make_pages(60, seed=42, doc_id_start=60)
    import pyarrow as pa

    assert pa.concat_tables([part1, part2]).equals(whole)
