"""Round-5 forced-scale soaks for the three new operators, the
round-3/4 soak posture (force the scale path, compare checksums, no
sampling):

  1. Sharded CDX at ~0.5M records: per-group sorted runs + k-way
     range merge vs the single global sort — canonical checksum
     equality + merged-output global sortedness.
  2. Trained langid at 1M docs with the JOIN inference path FORCED
     (the over-gate regime) vs broadcast — identical checksums.
  3. HNSW at 20k vectors: deterministic build time + recall@10 vs
     brute force for the standard 8 queries.

Usage: PYTHONPATH=/root/repo python scripts/r5_soak.py
Writes one JSON line per part; record results in BASELINE.md."""

from __future__ import annotations

import hashlib
import json
import os
import shutil
import sys
import time

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))


def _checksum(df) -> str:
    df = df[sorted(df.columns)]
    df = df.sort_values(by=list(df.columns), ignore_index=True)
    h = hashlib.sha256()
    for c in df.columns:
        h.update(c.encode())
        h.update("\x1f".join(map(repr, df[c].tolist())).encode())
    return h.hexdigest()[:16]


def soak_cdx(n_files: int = 64, recs_per_file: int = 8_000) -> dict:
    from webxtract.ops.warc import (build_cdx, build_warc,
                                    merge_cdx_shards, write_cdx_shards)

    root = "/tmp/webxtract_r5_cdx_soak"
    wdir = os.path.join(root, "warc")
    os.makedirs(wdir, exist_ok=True)
    t_gen = time.monotonic()
    for fi in range(n_files):
        path = os.path.join(wdir, f"crawl-{fi:05d}.warc")
        if os.path.exists(path):
            continue
        recs = []
        for r in range(recs_per_file):
            i = fi * recs_per_file + r
            recs.append((
                f"https://site{i % 997}.example/p/{i}",
                f"2024-{1 + i % 12:02d}-{1 + i % 28:02d}T00:00:00Z",
                f"<p>doc {i} body {'x' * (i % 64)}</p>".encode()))
        raw = build_warc(recs, gzip_members=False)
        with open(path + ".tmp", "wb") as f:
            f.write(raw)
        os.replace(path + ".tmp", path)
    gen_s = time.monotonic() - t_gen

    t0 = time.monotonic()
    single = build_cdx(wdir).sort("surt").to_pandas()
    t_single = time.monotonic() - t0

    sd = os.path.join(root, "shards")
    shutil.rmtree(sd, ignore_errors=True)
    t0 = time.monotonic()
    shards = write_cdx_shards(wdir, sd, files_per_shard=4)
    t_write = time.monotonic() - t0
    t0 = time.monotonic()
    merged_ds = merge_cdx_shards(sd)
    merged = merged_ds.to_pandas()
    t_merge = time.monotonic() - t0

    key = ["surt", "cdx_ts", "file", "roffset"]
    mk = list(map(tuple, merged[key].itertuples(index=False)))
    assert mk == sorted(mk), "merge output not globally sorted"
    cs, cm = _checksum(single), _checksum(merged)
    assert cs == cm, (cs, cm)
    return {"part": "cdx_sharded", "records": len(merged),
            "n_files": n_files, "n_shards": len(shards),
            "gen_sec": round(gen_s, 2),
            "single_sort_sec": round(t_single, 2),
            "shard_write_sec": round(t_write, 2),
            "merge_sec": round(t_merge, 2),
            "checksum": cs, "equal": True}


def soak_langid(n_docs: int = 1_000_000, toks_per_doc: int = 40) -> dict:
    from webxtract.ops.text import docs_langid_ngram

    root = "/tmp/webxtract_r5_langid_soak"
    os.makedirs(root, exist_ok=True)
    path = os.path.join(root, "documents.parquet")
    t_gen = time.monotonic()
    if not os.path.exists(path):
        rng = np.random.default_rng(11)
        vocab = np.array([f"w{v}" for v in range(500)])
        langs = np.array(["de", "en", "es", "fr", "zh"])
        idx = rng.integers(0, len(vocab), (n_docs, toks_per_doc))
        texts = [" ".join(row) for row in vocab[idx]]
        tbl = pa.table({
            "doc_id": pa.array(np.arange(n_docs, dtype=np.int64)),
            "text": pa.array(texts, pa.string()),
            "lang": pa.array(langs[rng.integers(0, 5, n_docs)],
                             pa.string())})
        pq.write_table(tbl, path + ".tmp")
        os.replace(path + ".tmp", path)
    gen_s = time.monotonic() - t_gen

    t0 = time.monotonic()
    b = docs_langid_ngram(root, mode="broadcast").to_pandas()
    t_b = time.monotonic() - t0
    t0 = time.monotonic()
    j = docs_langid_ngram(root, mode="join").to_pandas()
    t_j = time.monotonic() - t0
    cb, cj = _checksum(b), _checksum(j)
    assert cb == cj, (cb, cj)
    return {"part": "langid_ngram", "docs": len(b),
            "gen_sec": round(gen_s, 1),
            "broadcast_sec": round(t_b, 1),
            "join_sec": round(t_j, 1),
            "broadcast_docs_per_sec": round(len(b) / t_b),
            "join_docs_per_sec": round(len(j) / t_j),
            "checksum": cb, "equal": True}


def soak_hnsw(n_vec: int = 20_000, dim: int = 64) -> dict:
    import ray.data as rd

    from webxtract.ops.knn import knn_bruteforce, knn_hnsw

    rng = np.random.default_rng(3)
    mat = rng.standard_normal((n_vec, dim))
    tbl = pa.table({
        "vec_id": pa.array(np.arange(n_vec, dtype=np.int64)),
        "embedding": pa.FixedSizeListArray.from_arrays(
            pa.array(mat.ravel(), pa.float64()), dim).cast(
                pa.list_(pa.float64())),
        "label": pa.array(np.zeros(n_vec, np.int64))})
    root = "/tmp/webxtract_r5_hnsw_soak"
    os.makedirs(root, exist_ok=True)
    path = os.path.join(root, "embeddings.parquet")
    pq.write_table(tbl, path)
    ds = rd.read_parquet(path)
    t0 = time.monotonic()
    h = knn_hnsw(ds).to_pandas()
    t_h = time.monotonic() - t0
    t0 = time.monotonic()
    bf = knn_bruteforce(ds).to_pandas()
    t_bf = time.monotonic() - t0
    recs = []
    for q in sorted(bf["query_id"].unique()):
        e = set(bf[bf.query_id == q].nsmallest(10, "rank")["vec_id"])
        a = set(h[h.query_id == q]["vec_id"])
        recs.append(len(e & a) / len(e))
    return {"part": "hnsw", "vectors": n_vec, "dim": dim,
            "hnsw_sec": round(t_h, 1), "bruteforce_sec": round(t_bf, 1),
            "recall_at_10": round(sum(recs) / len(recs), 3)}


def soak_wet_wat(n_files: int = 64, recs_per_file: int = 4_000) -> dict:
    """WARC -> WET + WAT conversion at 256k pages: per-file tasks,
    atomic resumable outputs; read-back record counts and a sampled
    field check certify the chain at volume."""
    from webxtract.ops.warc import (build_warc, parse_wet, read_wat,
                                    read_wet, wat_convert, wet_convert)

    root = "/tmp/webxtract_r5_wetwat_soak"
    wdir = os.path.join(root, "warc")
    os.makedirs(wdir, exist_ok=True)
    t_gen = time.monotonic()
    for fi in range(n_files):
        path = os.path.join(wdir, f"crawl-{fi:05d}.warc")
        if os.path.exists(path):
            continue
        recs = []
        for r in range(recs_per_file):
            i = fi * recs_per_file + r
            html = (f'<html><head><title>T {i}</title></head><body>'
                    f"<p>alpha {i} beta</p>"
                    f'<a href="https://d{i % 89}.example/x">go {i}</a>'
                    f"</body></html>").encode()
            recs.append((f"https://s{i % 499}.example/p/{i}",
                         f"2024-01-{1 + i % 28:02d}T00:00:00Z", html))
        raw = build_warc(recs, gzip_members=False)
        with open(path + ".tmp", "wb") as f:
            f.write(raw)
        os.replace(path + ".tmp", path)
    gen_s = time.monotonic() - t_gen

    wet_dir, wat_dir = os.path.join(root, "wet"), os.path.join(root, "wat")
    shutil.rmtree(wet_dir, ignore_errors=True)
    shutil.rmtree(wat_dir, ignore_errors=True)
    t0 = time.monotonic()
    wet_files = wet_convert(wdir, wet_dir)
    t_wet = time.monotonic() - t0
    t0 = time.monotonic()
    wat_files = wat_convert(wdir, wat_dir)
    t_wat = time.monotonic() - t0

    n_pages = n_files * recs_per_file
    wet_rows = read_wet(wet_dir).count()
    wat_ds = read_wat(wat_dir)
    wat_rows = wat_ds.count()
    assert wet_rows == wat_rows == n_pages, (wet_rows, wat_rows)
    # sampled field exactness: first file's first record
    recs0 = parse_wet(open(wet_files[0], "rb").read())
    assert recs0[0]["text"] == "T 0\nalpha 0 beta\ngo 0", recs0[0]
    return {"part": "wet_wat", "pages": n_pages,
            "gen_sec": round(gen_s, 1),
            "wet_convert_sec": round(t_wet, 1),
            "wat_convert_sec": round(t_wat, 1),
            "wet_pages_per_sec": round(n_pages / t_wet),
            "wat_pages_per_sec": round(n_pages / t_wat),
            "n_wet_files": len(wet_files), "n_wat_files": len(wat_files)}


if __name__ == "__main__":
    import ray

    if not ray.is_initialized():
        ray.init(address="local", num_cpus=32, include_dashboard=False,
                 logging_level="ERROR", log_to_driver=False)
    import logging

    import ray.data as rd

    rd.DataContext.get_current().enable_progress_bars = False
    logging.getLogger("ray.data").setLevel(logging.ERROR)
    parts = sys.argv[1:] or ["cdx", "langid", "hnsw", "wet_wat"]
    fns = {"cdx": soak_cdx, "langid": soak_langid, "hnsw": soak_hnsw,
           "wet_wat": soak_wet_wat}
    for p in parts:
        print(json.dumps(fns[p]()), flush=True)
    ray.shutdown()
