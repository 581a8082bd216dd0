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
