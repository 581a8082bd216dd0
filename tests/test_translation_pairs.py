"""Translation-pair mining (webxtract/ops/web.py translation_pairs):
pair generation semantics, duplicate-language suppression,
non-alternate rows excluded, partitioning invariance. Fixture parity
lives in test_oracle_parity.py (docs_translation_pairs)."""

import pyarrow as pa
import ray.data as rd

from webxtract.ops.web import translation_pairs


def _run(rows):
    t = pa.table({
        "doc_id": pa.array([r[0] for r in rows], pa.int64()),
        "kind": pa.array([r[1] for r in rows], pa.string()),
        "lang": pa.array([r[2] for r in rows], pa.string()),
        "href": pa.array([r[3] for r in rows], pa.string())})
    out = translation_pairs(rd.from_arrow(t)).to_pandas()
    return out.sort_values(["doc_id", "lang_a", "lang_b"],
                           ignore_index=True)


def test_pairs_and_exclusions(ray_session):
    rows = [
        (1, "alternate", "en", "u-en"),
        (1, "alternate", "de", "u-de"),
        (1, "alternate", "fr", "u-fr"),
        (1, "refresh", None, "u-redirect"),     # must not pair
        (2, "alternate", "en", "v-en"),         # single lang: none
        (3, "alternate", "en", "w-en1"),
        (3, "alternate", "en", "w-en2"),        # same lang: no pair
        (3, "alternate", "es", "w-es"),
    ]
    out = _run(rows)
    d1 = out[out["doc_id"] == 1]
    assert [tuple(r) for r in
            d1[["lang_a", "lang_b"]].values.tolist()] == [
        ("de", "en"), ("de", "fr"), ("en", "fr")]
    assert (out["doc_id"] == 2).sum() == 0
    d3 = out[out["doc_id"] == 3]
    # the duplicate-en rows each pair with es, never with each other
    assert sorted(zip(d3["lang_a"], d3["lang_b"])) == [
        ("en", "es"), ("en", "es")]
    assert set(d3["url_a"]) == {"w-en1", "w-en2"}


def test_partitioning_invariance(ray_session):
    rows = []
    for i in range(60):
        for k in range(1 + i % 4):
            rows.append((i, "alternate", f"l{k}", f"u{i}-{k}"))
    t = pa.table({
        "doc_id": pa.array([r[0] for r in rows], pa.int64()),
        "kind": pa.array([r[1] for r in rows], pa.string()),
        "lang": pa.array([r[2] for r in rows], pa.string()),
        "href": pa.array([r[3] for r in rows], pa.string())})
    ds = rd.from_arrow(t)
    key = ["doc_id", "lang_a", "lang_b"]
    a = translation_pairs(ds).to_pandas().sort_values(
        key, ignore_index=True)
    b = translation_pairs(ds.repartition(7)).to_pandas().sort_values(
        key, ignore_index=True)
    assert a.equals(b)
