"""Round-4 web/policy gate ops: domain blocklist (broadcast == join)
and policy-lexicon hit counting semantics."""

from __future__ import annotations

import pyarrow as pa
import pytest


def test_blocklist_broadcast_join_equivalence(ray_session):
    """The UT1 gate's two membership plans agree row-for-row, the
    blocked set is exactly the listed registrables' domain trees, and
    NULL-registrable (suffix) rows never block."""
    import pyarrow.parquet as pq

    from webxtract.ops.web import hosts_blocklist

    sf = "/root/testdata/sf0.001"
    frames = {}
    for verify in ("broadcast", "join"):
        df = (hosts_blocklist(sf, verify=verify).to_pandas()
              .sort_values("doc_id").reset_index(drop=True))
        frames[verify] = df
    assert frames["broadcast"].equals(frames["join"])

    df = frames["broadcast"]
    listed = set(df[(df.doc_id % 9 == 0)
                    & df.registrable.notna()].registrable)
    for _, r in df.iterrows():
        expect = r.registrable in listed if r.registrable is not None \
            else False
        assert bool(r.blocked) == expect, (r.doc_id, r.registrable)
    # suffix-class hosts (doc_id % 8 == 5 -> 'Co.UK.') never block,
    # even though doc_id 45 is in the every-9th list window
    suffix_rows = df[df.doc_id % 8 == 5]
    assert len(suffix_rows) and not suffix_rows.blocked.any()
    # subdomain semantics: the www./a.b. hosts of listed docs block
    assert df[df.doc_id % 9 == 0].blocked.sum() > 0


def test_blocklist_empty_list(ray_session):
    """An empty blocklist blocks nothing on either plan."""
    import ray.data as rd

    from webxtract.ops.web import domain_blocklist

    ds = rd.from_arrow(pa.table({
        "doc_id": pa.array([1, 2], pa.int64()),
        "registrable": pa.array(["a.com", None], pa.string())}))
    empty = rd.from_arrow(pa.table({
        "registrable": pa.array([], pa.string())}))
    for verify in ("broadcast", "join"):
        out = domain_blocklist(ds, empty, verify=verify).to_pandas()
        assert not out.blocked.any(), verify


def test_lexicon_hits_semantics():
    """Word boundaries (no substring hits), case folding, multi-word
    phrase entries, non-overlap counting, the flag threshold, and
    null/empty degradation."""
    from webxtract.ops.text import LEXICON_FLAG_MIN, lexicon_hits
    import ray.data as rd

    rows = [
        # 'sparkle' must NOT hit 'spark' (word boundary)
        ("sparkle sparks sparkling", 0, 0),
        ("Spark SPARK spark", 3, 1),              # case folding
        ("a hash join and a hash  join", 1, 1),   # phrase: single space
        ("hash join hash join hash join", 3, 1),  # non-overlapping
        ("slow dup slow dup vector", 5, 3),       # flagged (>= 5)
        ("", 0, 0),
        (None, 0, 0),
        ("big data table scan big data", 3, 2),
    ]
    ds = rd.from_arrow(pa.table({
        "doc_id": pa.array(range(len(rows)), pa.int64()),
        "text": pa.array([r[0] for r in rows], pa.string())}))
    df = lexicon_hits(ds).to_pandas().sort_values("doc_id")
    for (text, hits, nterms), (_, r) in zip(rows, df.iterrows()):
        assert r.hits == hits, (text, r.hits)
        assert r.n_terms == nterms, (text, r.n_terms)
        assert bool(r.flagged) == (hits >= LEXICON_FLAG_MIN)


def test_microdata_edge_semantics():
    """HTML Standard microdata rules on crafted soup: prop-less items
    stay visible (NULL-prop row), itemprop OUTSIDE any scope is
    ignored, img/src and data/value channels, a nested itemscope
    WITHOUT itemprop is a top-level item (parent -1), and tag soup
    degrades to data."""
    import pyarrow as pa

    from webxtract.htmldom import parse_html
    from webxtract.ops.web import (extract_microdata,
                                   extract_microdata_items)

    html = (
        "<body>"
        '<span itemprop="stray">ignored</span>'          # no scope
        '<div itemscope itemtype="https://schema.org/Thing"></div>'
        '<div itemscope>'
        '<img itemprop="image" src="/i.png">'
        '<data itemprop="n" value="42">forty-two</data>'
        '<section itemscope itemtype="https://schema.org/Inner">'
        '<i itemprop="x">y</i></section>'                # no itemprop
        "</div>"
        "<p itemscope><b itemprop=broken>unclosed")      # tag soup
    items = extract_microdata_items(parse_html(html))
    assert items[0]["itemtype"] == "https://schema.org/Thing"
    assert items[0]["props"] == []
    assert items[1]["props"] == [("image", "/i.png"), ("n", "42")]
    # nested scope WITHOUT itemprop: its own top-level item
    assert items[2]["itemtype"] == "https://schema.org/Inner"
    assert items[2]["parent"] is None
    assert items[2]["props"] == [("x", "y")]
    assert items[3]["props"] == [("broken", "unclosed")]
    # no item ever received the stray prop
    assert not any(n == "stray" for it in items for n, _ in it["props"])


def test_microdata_stage_nullprop_rows(ray_session):
    import pyarrow as pa
    import ray.data as rd

    from webxtract.ops.web import extract_microdata

    ds = rd.from_arrow(pa.table({
        "doc_id": pa.array([1, 2], pa.int64()),
        "html": pa.array(["<div itemscope></div>", "plain text"],
                         pa.string())}))
    df = extract_microdata(ds).to_pandas()
    assert len(df) == 1
    assert df.iloc[0].doc_id == 1 and df.iloc[0].parent_idx == -1
    assert df.iloc[0].prop is None and df.iloc[0].itemtype is None
