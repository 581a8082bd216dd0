"""Skew-aware batching path + per-stage metrics instrumentation."""

import pyarrow as pa
import pyarrow.compute as pc
import pyarrow.parquet as pq

from webxtract import metrics, pipeline, synth
from webxtract.pipeline import PipelineConfig


def _make_mixed_pages(tmp_path):
    """Normal synth corpus + a few multi-hundred-KB valid pages."""
    pages = synth.make_pages(120, seed=42, with_dups=False)
    big_rows = {k: [] for k in ("url", "warc_ts", "html", "text", "lang")}
    for i in range(4):
        body = f"<p>giant doc {i} " + ("lorem word " * 30_000) + "</p>"
        big_rows["url"].append(f"https://big.example/doc/{i}")
        big_rows["warc_ts"].append(synth.EPOCH_US + i)
        big_rows["html"].append(f"<html><body><h1>Giant {i}</h1>{body}</body></html>".encode())
        big_rows["text"].append("")
        big_rows["lang"].append("en")
    big = pa.Table.from_pydict(big_rows, schema=pages.schema)
    mixed = pa.concat_tables([pages, big])
    p = tmp_path / "mixed.parquet"
    pq.write_table(mixed, p)
    return mixed, str(p)


def test_skew_path_equals_plain(ray_session, tmp_path):
    import ray.data as rd

    mixed, src = _make_mixed_pages(tmp_path)
    cfg_plain = PipelineConfig(max_bytes=2_000_000)
    cfg_skew = PipelineConfig(max_bytes=2_000_000, skew_split_bytes=65_536,
                              big_batch_size=2)
    plain = pipeline.extract_pipeline(
        rd.read_parquet(src), cfg_plain).to_pandas().sort_values(
        "url", ignore_index=True)
    skew = pipeline.extract_pipeline(
        rd.read_parquet(src), cfg_skew).to_pandas().sort_values(
        "url", ignore_index=True)
    assert plain.equals(skew)
    # the giant docs were actually extracted, not rejected
    g = skew.set_index("url").loc["https://big.example/doc/0"]
    assert g["vendor_value"] == "Giant 0"
    assert g["route"] != "rejected"


def test_metrics_instrumentation(ray_session, tmp_path):
    import ray.data as rd

    metrics.start()
    metrics.reset()
    pages = synth.make_pages(200, seed=42)
    pq.write_table(pages, tmp_path / "p.parquet")
    ds = rd.read_parquet(str(tmp_path / "p.parquet"))
    gate = pipeline.QualityGate()
    counted = ds.map_batches(metrics.instrument("quality_gate", gate),
                             batch_format="pyarrow", zero_copy_batch=True)
    n = counted.count()
    summ = metrics.summary()
    row = next(r for r in summ if r["stage"] == "quality_gate")
    assert row["rows_in"] == n == row["rows_out"]
    assert row["batches"] >= 1
    assert row["wall_ms"] > 0
    path = metrics.dump(str(tmp_path))
    assert "quality_gate" in open(path).read()


def test_hash64_vectorized_equals_scalar():
    import numpy as np

    from webxtract.ops.sketch import _hash64, _hash64_scalar

    cases = [list(range(-5, 500)),
             ["", "a", "user_42", "x" * 120],
             np.arange(1000, dtype=np.int64),
             ["café", "naïve"]]  # non-ASCII -> scalar fallback
    for c in cases:
        assert (_hash64(c) == _hash64_scalar(list(c))).all()
