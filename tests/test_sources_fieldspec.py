"""Sources (binary-files pages), partitioned sink, and the FieldSpec
extension surface."""

import os

import pyarrow.parquet as pq

from webxtract import pipeline, synth
from webxtract.normalize import FieldSpec, normalize_doc
from webxtract.sources import pages_from_files, write_results
from tests.test_normalize import kv, line


def test_pages_from_files(ray_session, tmp_path):
    (tmp_path / "a.html").write_bytes(
        b"<html><body><h1>Doc A</h1><p>real content words here for the "
        b"classifier to keep around</p></body></html>")
    (tmp_path / "b.html").write_bytes(b"\xff\xfe\x80bad")
    ds = pages_from_files(str(tmp_path))
    out = pipeline.extract_pipeline(
        ds, pipeline.PipelineConfig(dedup=False)).to_pandas()
    out = out.set_index("url")
    a = out.loc[f"file://{tmp_path}/a.html"]
    assert a["vendor_value"] == "Doc A"
    b = out.loc[f"file://{tmp_path}/b.html"]
    assert b["route"] == "rejected"
    assert b["reject_reason"] == "too_small" or b["reject_reason"] == "bad_encoding"


def test_write_results_partitioned_by_route(ray_session, tmp_path):
    import ray.data as rd

    pages = synth.make_pages(120, seed=42)
    pq.write_table(pages, tmp_path / "p.parquet")
    ds = pipeline.extract_pipeline(rd.read_parquet(str(tmp_path / "p.parquet")))
    out = str(tmp_path / "out")
    write_results(ds, out)
    routes = sorted(d for d in os.listdir(out))
    assert routes == ["route=auto", "route=rejected", "route=review"]
    rej = pq.read_table(os.path.join(out, "route=rejected"))
    assert set(rej.column("route").to_pylist()) == {"rejected"}
    total = sum(pq.read_table(os.path.join(out, d)).num_rows for d in routes)
    assert total == pipeline.extract_table(pages).num_rows


def test_fieldspec_default_matches_reference_semantics():
    blocks = [line("V", 90.0), kv("Grand Total", "$9.99", 80.0, 70.0)]
    assert normalize_doc(blocks) == normalize_doc(blocks, FieldSpec())


def test_fieldspec_custom_keys():
    blocks = [line("V", 90.0), kv("Betrag", "12.50", 80.0, 70.0),
              kv("Datum", "01/02/2020", 60.0, 65.0)]
    default = normalize_doc(blocks)
    assert default["total_value"] == ""       # German keys: no match
    spec = FieldSpec(amount_keys=("betrag",), date_keys=("datum",))
    custom = normalize_doc(blocks, spec)
    assert custom["total_value"] == "12.50"
    assert custom["date_value"] == "01/02/2020"


def test_fieldspec_custom_penalty():
    blocks = [line("V", 90.0), kv("Subtotal", "$5.00", 80.0, 80.0)]
    spec = FieldSpec(subtotal_penalty=0.25)
    assert normalize_doc(blocks, spec)["total_conf"] == 20.0


def test_enhancer_plugin_rewrites_artifact(ray_session, tmp_path):
    """SURVEY §2.10 stage contract: an enhancement plugin may rewrite the
    html artifact before extraction (the reference's pre-processing
    returns a possibly-modified pointer for exactly this)."""
    import pyarrow as pa
    import ray.data as rd

    page = (b"<html><body><h1>Fix Me Shop</h1>"
            b"<p>Date 01/02/2024 here</p><p>Total $9.99</p></body></html>")
    t = pa.table({
        "url": ["https://e.example/x"],
        "warc_ts": pa.array([1], pa.timestamp("us")),
        "html": pa.array([page], pa.binary()),
        "text": [""], "lang": ["en"],
    })
    pq.write_table(t, tmp_path / "e.parquet")
    src = str(tmp_path / "e.parquet")

    def add_colons(batch: pa.Table) -> pa.Table:
        fixed = [h.replace(b"Total $", b"Total: $") if h else h
                 for h in batch.column("html").to_pylist()]
        i = batch.schema.get_field_index("html")
        return batch.set_column(i, "html", pa.array(fixed, pa.binary()))

    plain = pipeline.extract_pipeline(
        rd.read_parquet(src), pipeline.PipelineConfig(dedup=False)).to_pandas()
    enhanced = pipeline.extract_pipeline(
        rd.read_parquet(src),
        pipeline.PipelineConfig(dedup=False, enhancers=(add_colons,))
    ).to_pandas()
    assert plain.iloc[0]["total_value"] == ""       # no KV without the colon
    assert enhanced.iloc[0]["total_value"] == "$9.99"
