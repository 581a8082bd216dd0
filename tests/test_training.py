"""Training-corpus export pipeline (composite end-to-end)."""

import pyarrow as pa
import pyarrow.parquet as pq

from webxtract import pipeline, synth
from webxtract.training import training_corpus


def test_training_corpus(ray_session, tmp_path):
    import ray.data as rd

    pages = synth.make_pages(300, seed=42)
    # plant an exact content duplicate under a different url: same html
    # as doc 1 re-served elsewhere
    d = synth.render_doc(1)
    dup = pa.table({
        "url": ["https://mirror.example/copy"],
        "warc_ts": pa.array([d["warc_ts"] + 5], pa.timestamp("us")),
        "html": pa.array([d["html"]], pa.binary()),
        "text": [d["text"]], "lang": [d["lang"]],
    })
    pages = pa.concat_tables([pages, dup.cast(pages.schema)])
    pq.write_table(pages, tmp_path / "p.parquet")

    ds = rd.read_parquet(str(tmp_path / "p.parquet"))
    out = training_corpus(ds, min_text_chars=40).to_pandas()

    # no rejected docs, no short docs
    assert (out.n_chars >= 40).all()
    assert out.url.is_unique
    # content dedup: exactly one of the two identical docs survives —
    # the min url, which here is the mirror ("m..." < "s...")
    md5s = out.content_md5
    assert md5s.is_unique
    assert "https://mirror.example/copy" in set(out.url)
    assert "https://site1.example/receipt/1" not in set(out.url)
    # stats columns are consistent
    row = out.iloc[0]
    assert row.n_tokens == len(row.extracted_text.split())
    # deterministic across runs
    again = training_corpus(
        rd.read_parquet(str(tmp_path / "p.parquet")),
        min_text_chars=40).to_pandas()
    a = out.sort_values("url", ignore_index=True)
    b = again.sort_values("url", ignore_index=True)
    assert a.equals(b)


def test_content_dedup_broadcast_join_equivalence(ray_session, tmp_path):
    """Round-3 verdict item 3: the content-dedup winner set must have a
    join twin above the broadcast gate. Force BOTH paths over a corpus
    with planted cross-url exact duplicates and require identical
    output (the dedup_pages_join equivalence discipline)."""
    import ray.data as rd

    pages = synth.make_pages(200, seed=7)
    # plant 3 mirror copies of distinct docs plus one triple
    dups = []
    for k, src in enumerate((2, 5, 9, 9)):
        d = synth.render_doc(src)
        dups.append(pa.table({
            "url": [f"https://mirror{k}.example/copy"],
            "warc_ts": pa.array([d["warc_ts"] + 11 + k],
                                pa.timestamp("us")),
            "html": pa.array([d["html"]], pa.binary()),
            "text": [d["text"]], "lang": [d["lang"]],
        }).cast(pages.schema))
    pages = pa.concat_tables([pages] + dups)
    pq.write_table(pages, tmp_path / "p.parquet")

    def run(mode):
        ds = rd.read_parquet(str(tmp_path / "p.parquet"))
        return (training_corpus(ds, min_text_chars=40, dedup_mode=mode)
                .to_pandas().sort_values("url", ignore_index=True)
                [["url", "content_md5", "n_tokens", "n_chars"]])

    a = run("broadcast")
    b = run("join")
    assert a.equals(b), "broadcast vs join dedup paths diverge"
    assert a.content_md5.is_unique
    # winner is the min url per duplicated hash
    assert "https://mirror0.example/copy" in set(a.url)
    assert "https://mirror2.example/copy" in set(a.url)  # min of 9's triple
    assert "https://mirror3.example/copy" not in set(a.url)
