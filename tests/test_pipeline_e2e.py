"""End-to-end Ray pipeline tests: golden byte-identity + parallelism
invariance (SURVEY.md §5.2-5.3) + review join-back."""

import os

import pyarrow as pa
import pyarrow.compute as pc
import pyarrow.parquet as pq
import pytest

from webxtract import pipeline, synth

GOLDEN = os.path.join(os.path.dirname(__file__), "data", "golden_pages_1k.parquet")


def _sorted_by_url(t: pa.Table) -> pa.Table:
    return t.take(pc.sort_indices(t.column("url")))


@pytest.fixture(scope="module")
def golden() -> pa.Table:
    return _sorted_by_url(pq.read_table(GOLDEN))


def test_single_process_oracle_matches_golden(golden):
    pages = synth.make_pages(1000, seed=42)
    res = _sorted_by_url(pipeline.extract_table(pages))
    assert res.equals(golden), "oracle path drifted from frozen goldens"


@pytest.mark.parametrize("num_blocks", [1, 8, 64])
def test_ray_pipeline_matches_golden(ray_session, golden, num_blocks, tmp_path):
    import ray.data as rd

    pages = synth.make_pages(1000, seed=42)
    pq.write_table(pages, tmp_path / "pages.parquet")
    ds = rd.read_parquet(str(tmp_path / "pages.parquet"),
                         override_num_blocks=num_blocks)
    out = pipeline.extract_pipeline(ds).to_arrow_refs()
    import ray

    res = pa.concat_tables([ray.get(r) for r in out])
    res = _sorted_by_url(res.select(golden.column_names))
    # byte-identical per-url extracted text — the north-rule invariant
    assert res.column("extracted_text").equals(golden.column("extracted_text"))
    assert res.equals(golden)


def test_extracted_text_byte_identical_examples(golden):
    urls = golden.column("url").to_pylist()
    texts = golden.column("extracted_text").to_pylist()
    by_url = dict(zip(urls, texts))
    receipt = by_url["https://site0.example/receipt/0"]
    assert receipt.encode("utf-8").startswith(b"Tech Supplies Ltd\n")


def test_route_distribution(golden):
    routes = golden.column("route").to_pylist()
    counts = {r: routes.count(r) for r in set(routes)}
    assert counts["rejected"] == 100  # the 10% bad family, exactly
    assert counts["auto"] > 300
    assert counts["review"] > 300


def test_full_pipeline_with_reviews(ray_session, golden, tmp_path):
    import ray.data as rd

    pages = synth.make_pages(300, seed=42)
    pq.write_table(pages, tmp_path / "pages.parquet")
    model = pipeline.extract_table(pages)
    reviews = synth.make_reviews(model)
    assert reviews.num_rows > 10

    ds = rd.read_parquet(str(tmp_path / "pages.parquet"))
    final = pipeline.full_pipeline(ds, reviews=reviews).to_pandas()
    final = final.set_index("url")

    n_reviewed = (final["route"] == "reviewed").sum()
    n_pending = (final["route"] == "pending").sum()
    assert n_reviewed == reviews.num_rows
    assert n_pending > 0
    # reviewed rows carry review values with confidence 1.0 and a reviewer
    r_urls = reviews.column("url").to_pylist()
    row = final.loc[r_urls[0]]
    assert row["route"] == "reviewed"
    assert row["total_conf"] == 1.0
    assert row["reviewer"].startswith("w")
    # auto rows unchanged from model results
    g = golden.to_pandas().set_index("url")
    auto_urls = [u for u in final.index if final.loc[u, "route"] == "auto"]
    u = auto_urls[0]
    assert final.loc[u, "total_value"] == g.loc[u, "total_value"]
