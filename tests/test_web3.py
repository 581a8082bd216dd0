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
