"""BM25 index READ path: bit-identity with the full-scan scorer,
metadata-only file pruning, rare-term ranged reads, zero-hit padding,
and index-build idempotence."""

from __future__ import annotations

import os

import pytest

SF = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def index_dir(ray_session, tmp_path_factory):
    from webxtract.ops.retrieval import build_bm25_index

    d = str(tmp_path_factory.mktemp("bm25idx"))
    meta = build_bm25_index(SF, d)
    assert meta["n_docs"] > 0 and meta["n_toks"] > 0
    assert len(meta["top_terms"]) > 3
    return d


def test_read_path_bit_identical_to_full_scan(ray_session, index_dir):
    from webxtract.ops.retrieval import bm25_retrieve
    from webxtract.ops.text import docs_bm25_topk

    a = bm25_retrieve(index_dir).to_pandas().reset_index(drop=True)
    b = docs_bm25_topk(SF).to_pandas().reset_index(drop=True)
    assert a.equals(b)  # scores, order, ties — all identical


def test_bucket_pruning_and_single_term(ray_session, index_dir):
    """A single-term query opens exactly ONE posting partition (the
    bucket-name pruning rule), and the retrieved docs are exactly
    the docs containing the term."""
    import json

    import duckdb

    from webxtract.ops.retrieval import (_select_posting_files,
                                         bm25_retrieve)

    con = duckdb.connect()
    con.execute(f"CREATE VIEW documents AS SELECT * FROM "
                f"'{SF}/documents.parquet'")
    # least-common term, ties lexicographic
    term = con.execute("""
        WITH t AS (SELECT doc_id, unnest(string_split(text, ' ')) AS w
                   FROM documents)
        SELECT w FROM t GROUP BY w
        ORDER BY count(DISTINCT doc_id), w LIMIT 1""").fetchone()[0]
    expect_docs = {r[0] for r in con.execute("""
        WITH t AS (SELECT doc_id, unnest(string_split(text, ' ')) AS w
                   FROM documents)
        SELECT DISTINCT doc_id FROM t WHERE w = ?""",
        [term]).fetchall()}

    with open(os.path.join(index_dir, "meta.json")) as f:
        num_parts = json.load(f)["num_parts"]
    kept, total = _select_posting_files(
        os.path.join(index_dir, "postings"), [term], num_parts)
    assert len(kept) <= 1  # at most the term's own bucket
    if total > 1:
        assert len(kept) < total  # pruning actually pruned

    k = max(len(expect_docs), 5)
    df = bm25_retrieve(index_dir, qterms=[term], k=k).to_pandas()
    hit = set(df[df.bm25 > 0].doc_id.astype(int))
    assert hit == expect_docs


def test_zero_hit_query_pads_by_doc_id(ray_session, index_dir):
    """A query with no index hits mirrors the full-scan ranking of an
    all-zero score vector: the k smallest doc_ids at score 0.0."""
    import pyarrow.parquet as pq

    from webxtract.ops.retrieval import bm25_retrieve

    df = bm25_retrieve(index_dir, qterms=["zzz_not_a_term_zzz"],
                       k=7).to_pandas()
    ids = sorted(pq.read_table(
        f"{SF}/documents.parquet",
        columns=["doc_id"]).column("doc_id").to_pylist())
    assert list(df.doc_id) == ids[:7]
    assert (df.bm25 == 0.0).all()


def test_postings_spill_bucket_sound(index_dir):
    """Every term lives in exactly one file, and that file's bucket
    name equals the term's recomputed hash bucket — the property
    that makes name-only pruning sound."""
    import json

    import polars as pl
    import pyarrow.parquet as pq

    with open(os.path.join(index_dir, "meta.json")) as f:
        num_parts = json.load(f)["num_parts"]
    pd_dir = os.path.join(index_dir, "postings")
    seen: dict[str, str] = {}
    for f in sorted(os.listdir(pd_dir)):
        if not f.endswith(".parquet"):
            continue
        bucket = int(f[len("postings-b"):len("postings-b") + 5])
        t = pq.read_table(os.path.join(pd_dir, f), columns=["term"])
        terms = sorted(set(t.column("term").to_pylist()))
        hashes = pl.Series(terms).hash(seed=7)
        for term, h in zip(terms, hashes):
            assert term not in seen, f"term {term!r} spans two files"
            seen[term] = f
            assert int(h % num_parts) == bucket, (term, f)
