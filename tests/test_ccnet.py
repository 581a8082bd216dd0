"""CCNet composite (ops/ccnet.py): stage-1 derived-corpus semantics
(line dedup + empty-survivor drop, cache resume) and the composed
oracle's structural integrity.  End-to-end value parity is covered by
test_oracle_parity (docs_ccnet_corpus)."""

import os
import shutil

import pyarrow as pa
import pyarrow.parquet as pq
import ray.data as rd

from webxtract.ops.ccnet import ccnet_cleaned_dir, docs_ccnet_corpus


def _mk_corpus(tmpdir: str) -> str:
    os.makedirs(tmpdir, exist_ok=True)
    # doc 2 fully duplicates doc 1's lines -> every line of doc 2 loses
    # to doc 1's positions and doc 2 must VANISH from the cleaned corpus
    docs = pa.table({
        "doc_id": pa.array([1, 2, 3], pa.int64()),
        "text": pa.array([
            "shared line one\nshared line two",
            "shared line one\nshared line two",
            "unique alpha\nshared line one\nunique beta",
        ], pa.string()),
        "lang": pa.array(["en", "en", "de"], pa.string()),
    })
    pq.write_table(docs, os.path.join(tmpdir, "documents.parquet"))
    return tmpdir


def test_cleaned_corpus_drops_emptied_docs(ray_session, tmp_path):
    sf = _mk_corpus(str(tmp_path / "corpus"))
    out = ccnet_cleaned_dir(sf)
    try:
        cleaned = rd.read_parquet(
            os.path.join(out, "documents.parquet")).to_pandas()
        cleaned = cleaned.sort_values("doc_id").reset_index(drop=True)
        # doc 1 keeps both lines (winner), doc 2 is gone, doc 3 keeps
        # its unique lines with the shared line stripped
        assert cleaned["doc_id"].tolist() == [1, 3]
        assert cleaned.loc[0, "text"] == "shared line one\nshared line two"
        assert cleaned.loc[1, "text"] == "unique alpha\nunique beta"
        assert cleaned["lang"].tolist() == ["en", "de"]
    finally:
        shutil.rmtree(out, ignore_errors=True)


def test_cleaned_corpus_cache_resume(ray_session, tmp_path):
    sf = _mk_corpus(str(tmp_path / "corpus2"))
    out1 = ccnet_cleaned_dir(sf)
    try:
        before = sorted(os.listdir(os.path.join(out1,
                                                "documents.parquet")))
        mtimes = {f: os.path.getmtime(
            os.path.join(out1, "documents.parquet", f)) for f in before}
        out2 = ccnet_cleaned_dir(sf)  # must hit the cache, not rebuild
        assert out2 == out1
        after = sorted(os.listdir(os.path.join(out2,
                                               "documents.parquet")))
        assert after == before
        for f in after:
            assert os.path.getmtime(
                os.path.join(out2, "documents.parquet", f)) == mtimes[f]
    finally:
        shutil.rmtree(out1, ignore_errors=True)


def test_composite_runs_and_buckets_partition(ray_session, tmp_path):
    sf = _mk_corpus(str(tmp_path / "corpus3"))
    out = ccnet_cleaned_dir(sf)
    try:
        df = docs_ccnet_corpus(sf).to_pandas()
        # doc 2 was emptied -> exactly the two survivors, one row each
        assert sorted(df["doc_id"].tolist()) == [1, 3]
        assert set(df["bucket"]) <= {"head", "middle", "tail"}
        assert (df["margin"] >= 0).all()
        assert set(df["pred_lang"]) <= {"en", "de"}
    finally:
        shutil.rmtree(out, ignore_errors=True)


def test_composed_oracle_structure():
    import __ray_entry__ as E

    sql = E.oracle_sql()["docs_ccnet_corpus"]
    # the splice must rebind EVERY component reference to the cleaned
    # CTE: `documents` may appear only inside the dedup CTEs (3 refs)
    tail = sql.split("pred AS", 1)[1]
    assert "documents" not in tail
    assert "cleaned" in tail
