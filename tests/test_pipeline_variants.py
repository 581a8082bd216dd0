"""Pipeline variant equivalence: fused vs emit_blocks path, fast vs
exact dedup, source_path-pruned dedup — all must produce identical
results (byte-identity is the invariant, whatever the physical plan)."""

import pyarrow as pa
import pyarrow.compute as pc
import pyarrow.parquet as pq

from webxtract import pipeline, synth
from webxtract.pipeline import PipelineConfig


def _sorted(t: pa.Table) -> pa.Table:
    return t.take(pc.sort_indices(t.column("url")))


def _run(ds, cfg, src=None):
    return _sorted(pipeline.extract_pipeline(ds, cfg, source_path=src)
                   .to_pandas().pipe(pa.Table.from_pandas))


def test_fused_equals_blocks_path(ray_session, tmp_path):
    import ray.data as rd

    pages = synth.make_pages(400, seed=42)
    pq.write_table(pages, tmp_path / "p.parquet")
    src = str(tmp_path / "p.parquet")
    fused = pipeline.extract_pipeline(
        rd.read_parquet(src), PipelineConfig(emit_blocks=False)).to_pandas()
    blocks = pipeline.extract_pipeline(
        rd.read_parquet(src), PipelineConfig(emit_blocks=True)).to_pandas()
    fused = fused.sort_values("url", ignore_index=True)
    blocks = blocks.sort_values("url", ignore_index=True)
    assert fused.equals(blocks)


def test_fast_dedup_equals_exact(ray_session, tmp_path):
    import ray.data as rd

    pages = synth.make_pages(400, seed=42)
    pq.write_table(pages, tmp_path / "p.parquet")
    src = str(tmp_path / "p.parquet")
    fast = pipeline.extract_pipeline(
        rd.read_parquet(src), PipelineConfig(exact_dedup=False),
        source_path=src).to_pandas()
    exact = pipeline.extract_pipeline(
        rd.read_parquet(src), PipelineConfig(exact_dedup=True)).to_pandas()
    fast = fast.sort_values("url", ignore_index=True)
    exact = exact.sort_values("url", ignore_index=True)
    assert fast.equals(exact)


def test_emit_blocks_column_shape(ray_session):
    import ray.data as rd

    pages = synth.make_pages(50, seed=42)
    cfg = PipelineConfig(emit_blocks=True, dedup=False)
    gate = pipeline.QualityGate(cfg.min_bytes, cfg.max_bytes)(pages)
    out = pipeline.Extractor(emit_blocks=True)(gate)
    assert "blocks" in out.column_names
    blocks = out.column("blocks").to_pylist()
    nonempty = [b for b in blocks if b]
    assert nonempty and all("block_type" in b[0] for b in nonempty)


def test_hash_join_reviews_equals_broadcast(ray_session, tmp_path):
    import ray.data as rd

    from webxtract.review import coalesce_hash_join

    pages = synth.make_pages(300, seed=42)
    pq.write_table(pages, tmp_path / "p.parquet")
    src = str(tmp_path / "p.parquet")
    model = pipeline.extract_table(pages)
    reviews = synth.make_reviews(model)

    broadcast = pipeline.full_pipeline(
        rd.read_parquet(src), reviews=reviews).to_pandas()
    results = pipeline.extract_pipeline(rd.read_parquet(src))
    hashed = coalesce_hash_join(
        results, rd.from_arrow(reviews), num_partitions=4).to_pandas()

    b = broadcast.sort_values("url", ignore_index=True)
    h = hashed[b.columns].sort_values("url", ignore_index=True)
    assert b.equals(h)


def test_full_pipeline_hash_join_option(ray_session, tmp_path):
    import ray.data as rd

    pages = synth.make_pages(200, seed=42)
    pq.write_table(pages, tmp_path / "p.parquet")
    src = str(tmp_path / "p.parquet")
    reviews = synth.make_reviews(pipeline.extract_table(pages))
    a = pipeline.full_pipeline(rd.read_parquet(src), reviews=reviews,
                               reviews_join="broadcast").to_pandas()
    b = pipeline.full_pipeline(rd.read_parquet(src), reviews=reviews,
                               reviews_join="hash").to_pandas()
    a = a.sort_values("url", ignore_index=True)
    b = b[a.columns].sort_values("url", ignore_index=True)
    assert a.equals(b)


def test_join_dedup_equals_fast(ray_session, tmp_path):
    """dedup_join=True (hash-join winner filter, the 10^12-row path)
    produces byte-identical pipeline output to the broadcast fast path."""
    import ray.data as rd

    pages = synth.make_pages(400, seed=42)
    pq.write_table(pages, tmp_path / "pj.parquet")
    src = str(tmp_path / "pj.parquet")
    fast = _run(rd.read_parquet(src), PipelineConfig(), src=src)
    joined = _run(rd.read_parquet(src), PipelineConfig(dedup_join=True),
                  src=src)
    assert fast.equals(joined)
