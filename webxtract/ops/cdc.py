"""Content-defined chunking (gear-hash CDC) — the storage-dedup
primitive: chunk boundaries derive from CONTENT (a rolling gear hash
hitting a mask), so an insertion shifts only nearby boundaries and
identical regions of different blobs chunk identically — unlike fixed
blocks, where one inserted byte re-frames everything after it. Used
for blob-level dedup of crawl storage (WARC payload dedup across
snapshots) and delta-compression planning.

Spec, pinned by the scalar<->vector equivalence gate and tests:
  * gear table: gear[b] = lower 64 bits of md5(byte b) — fixed,
    derived, no RNG
  * rolling hash h_t = (h_{t-1} << 1 + gear[b_t]) mod 2^64 — the
    shift gives an implicit 64-byte window; h is NEVER reset at
    chunk boundaries (deviation from the FastCDC paper's fp=0
    reset, pinned on purpose: candidates become a pure function of
    the trailing 64 bytes, which is what gives the locality
    property its clean bound)
  * candidate cut after position t when h_t & mask == 0
    (mask = 2^mask_bits - 1 -> expected chunk ~2^mask_bits)
  * chunks enforce [min_size, max_size] greedily: from each start,
    cut at the first candidate in (start+min_size, start+max_size];
    none -> hard cut at start+max_size; the remainder is the final
    chunk

Ray shape: pure map-side — each blob chunks inside its batch, only
(doc_id, idx, offset, length, md5) rows come out (~50 B/chunk);
payload bytes never leave the task. The hash loop is 64 shifted
uint64 adds over the whole batch's bytes (numpy), not a per-byte
Python loop.
"""

from __future__ import annotations

import hashlib

import numpy as np
import pyarrow as pa

_M64 = (1 << 64) - 1

GEAR = np.array(
    [int(hashlib.md5(bytes([b])).hexdigest()[:16], 16)
     for b in range(256)], dtype=np.uint64)


def gear_hashes(data: bytes) -> np.ndarray:
    """h_t for every position t (uint64, wrap-around): 64 shifted
    vector adds — shifts >= 64 vanish, so the sum IS the recurrence."""
    g = GEAR[np.frombuffer(data, dtype=np.uint8)]
    n = len(g)
    h = np.zeros(n, dtype=np.uint64)
    with np.errstate(over="ignore"):
        for i in range(min(64, n)):
            h[i:] += g[: n - i] << np.uint64(i)
    return h


def chunk_spans(data: bytes, mask_bits: int = 12,
                min_size: int = 256, max_size: int = 8192
                ) -> list[tuple[int, int]]:
    """(offset, length) spans tiling ``data`` under the pinned spec."""
    n = len(data)
    if n == 0:
        return []
    h = gear_hashes(data)
    mask = np.uint64((1 << mask_bits) - 1)
    cuts = np.nonzero((h & mask) == 0)[0] + 1  # cut AFTER position t
    spans = []
    start = 0
    while start < n:
        lo = start + min_size   # exclusive lower bound for cut pos
        hi = start + max_size   # inclusive upper bound
        i = np.searchsorted(cuts, lo, side="right")
        cut = int(cuts[i]) if i < len(cuts) and cuts[i] <= hi else hi
        cut = min(cut, n)
        spans.append((start, cut - start))
        start = cut
    return spans


def chunk_spans_scalar(data: bytes, mask_bits: int = 12,
                       min_size: int = 256, max_size: int = 8192
                       ) -> list[tuple[int, int]]:
    """Byte-at-a-time replica of the SAME spec — the equivalence
    oracle for the vectorized path (tests assert span-for-span
    equality on random inputs)."""
    n = len(data)
    if n == 0:
        return []
    mask = (1 << mask_bits) - 1
    gear = [int(x) for x in GEAR]
    cand = []
    h = 0
    for t, b in enumerate(data):
        h = ((h << 1) + gear[b]) & _M64
        if (h & mask) == 0:
            cand.append(t + 1)
    spans = []
    start = 0
    ci = 0
    while start < n:
        while ci < len(cand) and cand[ci] <= start + min_size:
            ci += 1
        if ci < len(cand) and cand[ci] <= start + max_size:
            cut = cand[ci]
        else:
            cut = min(start + max_size, n)
        spans.append((start, cut - start))
        start = cut
    return spans


def cdc_chunks(ds, data_col: str = "data", id_col: str = "doc_id",
               mask_bits: int = 12, min_size: int = 256,
               max_size: int = 8192):
    """blob rows -> (doc_id, chunk_idx, offset, length, chunk_md5)
    rows. Map-side only; the md5 keys feed any downstream exact-dedup
    exchange (chunk-level dedup ratio, delta planning)."""

    def batch_fn(t: pa.Table) -> pa.Table:
        ids, idxs, offs, lens, md5s = [], [], [], [], []
        for i, raw in zip(t.column(id_col).to_pylist(),
                          t.column(data_col).to_pylist()):
            data = raw if isinstance(raw, bytes) else \
                (raw or "").encode("utf-8")
            for j, (o, ln) in enumerate(chunk_spans(
                    data, mask_bits, min_size, max_size)):
                ids.append(i)
                idxs.append(j)
                offs.append(o)
                lens.append(ln)
                md5s.append(hashlib.md5(data[o:o + ln]).hexdigest())
        return pa.table({
            "doc_id": pa.array(ids, pa.int64()),
            "chunk_idx": pa.array(idxs, pa.int64()),
            "offset": pa.array(offs, pa.int64()),
            "length": pa.array(lens, pa.int64()),
            "chunk_md5": pa.array(md5s, pa.string())})

    return ds.map_batches(batch_fn, batch_format="pyarrow",
                          zero_copy_batch=True)


def docs_cdc_chunks(sf_dir: str, mask_bits: int = 6,
                    min_size: int = 16, max_size: int = 256):
    """Rows-only query surface (the gear recurrence is not
    SQL-expressible; correctness rides the scalar<->vector
    equivalence gate + the tiling/locality property tests): CDC
    chunk table over the documents' utf-8 text with small parameters
    so every doc yields multiple chunks."""
    import ray.data as rd

    ds = rd.read_parquet(f"{sf_dir}/documents.parquet",
                         columns=["doc_id", "text"])
    return cdc_chunks(ds, data_col="text", mask_bits=mask_bits,
                      min_size=min_size, max_size=max_size) \
        .sort(["doc_id", "chunk_idx"])
