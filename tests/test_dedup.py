"""Exact dedup (D1): latest warc_ts wins; Ray path == single-table path."""

import pyarrow as pa
import pyarrow.compute as pc
import pytest

from webxtract import synth
from webxtract.dedup import dedup_pages, dedup_table


def test_dedup_table_latest_wins():
    t = synth.make_pages(200, seed=42)
    d = dedup_table(t)
    urls = d.column("url").to_pylist()
    assert len(urls) == len(set(urls))
    # for each dup url the kept warc_ts is the max
    full = t.to_pydict()
    best = {}
    for u, ts in zip(full["url"], full["warc_ts"]):
        best[u] = max(best.get(u, ts), ts)
    kept = dict(zip(d.column("url").to_pylist(), d.column("warc_ts").to_pylist()))
    assert kept == best


def test_dedup_ray_matches_table(ray_session):
    import ray.data as rd

    t = synth.make_pages(200, seed=42)
    expected = dedup_table(t)
    got = pa.concat_tables(
        [b for b in dedup_pages(rd.from_arrow(t)).iter_batches(batch_format="pyarrow")]
    )
    got = got.select(expected.column_names)
    got = got.take(pc.sort_indices(got.column("url")))
    exp = expected.take(pc.sort_indices(expected.column("url")))
    assert got.equals(exp)


def test_dedup_idempotent():
    t = synth.make_pages(150, seed=42)
    once = dedup_table(t)
    twice = dedup_table(once)
    assert once.equals(twice)


def test_dedup_join_matches_table(ray_session):
    """The 10^12-scale join-based dedup emits exactly the broadcast/fast
    path's rows (winner = max warc_ts per url; no (url, ts) ties in the
    synth corpus by construction)."""
    import ray.data as rd

    from webxtract.dedup import dedup_pages_join

    t = synth.make_pages(300, seed=43)
    expected = dedup_table(t)
    got = pa.concat_tables(list(
        dedup_pages_join(rd.from_arrow(t)).iter_batches(
            batch_format="pyarrow")))
    got = got.select(expected.column_names)
    got = got.take(pc.sort_indices(got.column("url")))
    exp = expected.take(pc.sort_indices(expected.column("url")))
    assert got.equals(exp)


# --- line-level dedup (CCNet-style) ---------------------------------------

def _lines_out(ds):
    import pyarrow as pa

    t = pa.concat_tables(list(ds.iter_batches(batch_format="pyarrow")))
    return dict(zip(t.column("url").to_pylist(),
                    t.column("extracted_text").to_pylist()))


def test_dedup_lines_cross_doc(ray_session):
    import ray.data as rd

    from webxtract.ops.dedup import dedup_lines

    t = pa.table({
        "url": ["u1", "u2", "u3"],
        "extracted_text": ["keep1\nBOILER\nkeep2",
                           "BOILER\nunique2",
                           "solo\nBOILER"],
    })
    d = _lines_out(dedup_lines(rd.from_arrow(t)))
    # canonical occurrence = min (url, line_idx): u1 line 1 wins
    assert d["u1"] == "keep1\nBOILER\nkeep2"
    assert d["u2"] == "unique2"
    assert d["u3"] == "solo"


def test_dedup_lines_within_doc_and_empty(ray_session):
    import ray.data as rd

    from webxtract.ops.dedup import dedup_lines

    t = pa.table({
        "url": ["a", "b"],
        "extracted_text": ["x\nx\ny", "x"],
    })
    d = _lines_out(dedup_lines(rd.from_arrow(t)))
    assert d["a"] == "x\ny"   # within-doc dup stripped too
    assert d["b"] == ""       # fully-boilerplate doc -> empty string


def test_dedup_lines_parallelism_invariant_and_idempotent(ray_session):
    import ray.data as rd

    from webxtract.ops.dedup import dedup_lines

    shared = ["COMMON HEADER", "COMMON FOOTER", "visit our shop"]
    urls, texts = [], []
    for i in range(120):
        body = [f"unique line {i} alpha", f"unique line {i} beta"]
        lines = [shared[i % 3]] + body + [shared[(i + 1) % 3]]
        urls.append(f"https://ex.com/{i:04d}")
        texts.append("\n".join(lines))
    t = pa.table({"url": urls, "extracted_text": texts})

    outs = []
    for nblocks in (1, 8):
        ds = rd.from_arrow(t).repartition(nblocks)
        outs.append(_lines_out(dedup_lines(ds)))
    assert outs[0] == outs[1]

    # each shared line survives exactly once, at its first occurrence
    corpus = "\n".join(outs[0].values())
    for s in shared:
        assert corpus.count(s) == 1
    assert outs[0]["https://ex.com/0000"].startswith("COMMON HEADER")

    # idempotent: a second pass changes nothing
    again = _lines_out(dedup_lines(
        rd.from_arrow(pa.table({
            "url": list(outs[0].keys()),
            "extracted_text": list(outs[0].values())}))))
    assert again == outs[0]


def test_new_content_exact_despite_bloom_fps(ray_session):
    """Incremental-ingest dedup is EXACT even when the Bloom prefilter
    is deliberately undersized (every incoming row becomes a
    might-be-dup): the copartitioned verify must recover precise
    anti-join semantics, and genuinely-new docs always survive (no
    false negatives by construction)."""
    import pyarrow as pa
    import ray.data as rd

    from webxtract.ops import dedup as D

    prior = rd.from_arrow(pa.table({
        "doc_id": pa.array(range(100), pa.int64()),
        "text": pa.array([f"doc body {i}" for i in range(100)]),
    }))
    # incoming: 50 exact dups of prior content, 50 new
    inc_rows = ([f"doc body {i}" for i in range(50)]
                + [f"fresh body {i}" for i in range(50)])
    incoming = rd.from_arrow(pa.table({
        "doc_id": pa.array(range(1000, 1100), pa.int64()),
        "text": pa.array(inc_rows),
    }))
    out = D.new_content(prior, incoming).to_pandas()
    assert sorted(out.doc_id) == list(range(1050, 1100))


def test_simhash_batch_equals_scalar():
    """The vectorized batch signature path must be bit-identical to the
    per-doc sig64 reference, including empty and single-token docs."""
    import numpy as np
    import pyarrow as pa

    from webxtract.ops import dedup as D

    texts = [
        "the quick brown fox jumps over the lazy dog",
        "",
        "single",
        "a b c d e f g h i j k l m n o p q r s t u v w x y z",
        "repeated repeated repeated repeated other",
    ]
    h = D.SimHasher()
    batch = pa.table({
        "doc_id": pa.array(range(len(texts)), pa.int64()),
        "text": pa.array(texts),
    })
    got = h._sigs_batch(batch)
    exp = np.array([h.sig64(t) for t in texts], dtype=np.uint64)
    assert (got == exp).all(), (got, exp)
    # and the banded table round-trips the same signatures
    t = h(batch).to_pydict()
    sig_by_doc = {d: s + (1 << 63) for d, s in zip(t["doc_id"], t["sig"])}
    for i, e in enumerate(exp):
        assert sig_by_doc[i] == int(e)


def test_ngram_jaccard_hard_gate(ray_session, monkeypatch):
    """The exact O(n^2) baseline must refuse corpora above its cap and
    point at the LSH path (VERDICT r2 item 5)."""
    import ray.data as rd

    import webxtract.ops.dedup as D

    ds = rd.from_items(
        [{"doc_id": i, "text": f"doc {i}"} for i in range(10)])
    monkeypatch.setattr(D, "NGRAM_JACCARD_MAX_DOCS", 5)
    with pytest.raises(ValueError, match="minhash_lsh_pairs"):
        D.ngram_jaccard_pairs(ds)


def test_dup_winners_local_matches_distributed(ray_session, tmp_path,
                                               monkeypatch):
    """Auto-gated driver-side winner aggregate == Ray groupby twin, and
    dedup_pages_fast output is identical through either."""
    import pyarrow.parquet as pq
    import ray.data as rd

    from webxtract import dedup as D

    t = synth.make_pages(300, seed=7)
    paths = []
    for i in range(2):
        p = str(tmp_path / f"part-{i}.parquet")
        pq.write_table(t.slice(i * 150, 150), p)
        paths.append(p)

    local = D.dup_winners_local(paths)
    dist = D.dup_winners(rd.read_parquet(paths, columns=["url", "warc_ts"]))
    assert (local is None) == (dist is None)
    if local is not None:
        key = lambda x: sorted(zip(x.column("url").to_pylist(),
                                   x.column("max_ts").to_pylist()))
        assert key(local) == key(dist)

    ds = rd.read_parquet(paths)
    via_local = pa.concat_tables(
        [b for b in D.dedup_pages_fast(ds, source_path=paths)
         .iter_batches(batch_format="pyarrow")])
    monkeypatch.setattr(D, "DUP_SCAN_LOCAL_MAX_BYTES", 0)  # force distributed
    via_dist = pa.concat_tables(
        [b for b in D.dedup_pages_fast(ds, source_path=paths)
         .iter_batches(batch_format="pyarrow")])
    srt = lambda x: x.combine_chunks().take(pc.sort_indices(x.column("url")))
    assert srt(via_local).equals(srt(via_dist))
