"""Inverted-index postings spill (webxtract/ops/text.py
docs_inverted_index postings_dir): the full per-term posting lists
written as partitioned parquet from the same fold that emits the
bounded query surface. Oracle parity of the surface itself lives in
test_oracle_parity.py (docs_inverted_index)."""

import os

import pyarrow.parquet as pq

from webxtract.ops.text import docs_inverted_index

SF_DIR = "/root/testdata/sf0.001"


def test_postings_spill_matches_surface(ray_session, tmp_path):
    pdir = str(tmp_path / "postings")
    surface = docs_inverted_index(SF_DIR, postings_dir=pdir).to_pandas()
    files = [f for f in os.listdir(pdir) if f.endswith(".parquet")]
    assert files, "no postings spilled"
    full = pq.read_table(pdir).to_pandas()

    # full postings, re-aggregated, must reproduce the exact surface
    g = (full.sort_values(["term", "doc_id"])
             .groupby("term", sort=True))
    df_ = g.doc_id.size()
    tf_ = g.tf.sum()
    heads = g.doc_id.apply(
        lambda s: ",".join(map(str, s.iloc[:10])))
    srt = surface.sort_values("term", ignore_index=True)
    assert list(srt.term) == list(df_.index)
    assert list(srt.df) == list(df_.values)
    assert list(srt.tf_total) == list(tf_.values)
    assert list(srt.postings_head) == list(heads.values)

    # postings rows == exploded (doc, term) pairs: sum(df) rows total
    assert len(full) == int(srt.df.sum())
    # term-disjoint partition files: no term spans two files
    seen: dict[str, str] = {}
    for f in files:
        t = pq.read_table(os.path.join(pdir, f), columns=["term"])
        for term in t.column("term").unique().to_pylist():
            assert seen.setdefault(term, f) == f, (
                f"term {term!r} split across {seen[term]} and {f}")


def test_no_spill_without_postings_dir(ray_session, tmp_path):
    # default path unchanged: no directory, same surface rows
    a = docs_inverted_index(SF_DIR).to_pandas() \
        .sort_values("term", ignore_index=True)
    b = docs_inverted_index(SF_DIR, postings_dir=str(
        tmp_path / "p2")).to_pandas() \
        .sort_values("term", ignore_index=True)
    assert a.equals(b)
