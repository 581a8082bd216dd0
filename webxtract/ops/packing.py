"""Sequence packing: assemble variable-length documents into
fixed-token-budget training sequences.

The contract a packer must honor at corpus scale:
  * deterministic under ANY partitioning (re-runs and resumes produce
    the same sequence for every doc) — achieved by sharding docs with a
    modulo key and packing each shard in doc_id order;
  * no sequence exceeds the budget unless a single oversize document
    forces its own sequence;
  * one exchange total: the hash co-location by shard
    (`partitioned_map_groups`); token counting rides the scan, the
    greedy fill is an O(#sequences · log n) searchsorted loop per
    shard — never a per-document Python iteration.

Output is one row per document: (doc_id, shard, seq_id, n_tokens,
pos) where ``pos`` is the document's slot within its sequence and
``seq_id`` is globally unique (shard << 32 | local index).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc


def greedy_pack(n_tokens: np.ndarray, budget: int) -> np.ndarray:
    """Greedy first-fit in array order: local sequence index per doc.

    Each loop iteration closes one sequence via a searchsorted on the
    running cumsum, so the cost is O(#sequences * log n)."""
    seq = np.empty(len(n_tokens), dtype=np.int64)
    if not len(n_tokens):
        return seq
    csum = np.cumsum(n_tokens)
    start, base, s = 0, 0, 0
    while start < len(csum):
        j = int(np.searchsorted(csum, base + budget, side="right"))
        if j <= start:
            j = start + 1  # oversize doc: its own sequence
        seq[start:j] = s
        s += 1
        base = int(csum[j - 1])
        start = j
    return seq


def pack_sequences(ds, budget: int = 512, num_shards: int = 64,
                   text_col: str = "text", id_col: str = "doc_id",
                   tokens_col: str | None = None):
    """documents Dataset -> per-doc packing assignment (see module doc).

    ``num_shards`` bounds per-worker state: each shard's doc list must
    fit one worker (ids + token counts only — text never moves; at
    100 TB raise num_shards, the exchange carries 16 B/doc).

    ``tokens_col``: use a precomputed per-doc token-count column (e.g.
    BPE counts from ops/bpe) instead of the whitespace split — the
    packing recurrence is count-source-agnostic."""

    def count_tokens(batch: pa.Table) -> pa.Table:
        if tokens_col is not None:
            n = batch.column(tokens_col).cast(pa.int64())
        else:
            n = pc.list_value_length(pc.split_pattern(
                batch.column(text_col), pattern=" ")).cast(pa.int64())
        return pa.table({
            id_col: batch.column(id_col),
            "n_tokens": n,
        })

    slim = ds.map_batches(count_tokens, batch_format="pyarrow",
                          zero_copy_batch=True)

    def pack_partition(part: pa.Table) -> pa.Table:
        ids = part.column(id_col).to_numpy()
        ntok = part.column("n_tokens").to_numpy()
        order = np.argsort(ids, kind="stable")
        ids, ntok = ids[order], ntok[order]
        shard = ids % num_shards
        out_seq = np.empty(len(ids), dtype=np.int64)
        out_pos = np.empty(len(ids), dtype=np.int64)
        # partition may hold several shards: pack each shard segment
        shard_order = np.argsort(shard, kind="stable")
        ids, ntok, shard = ids[shard_order], ntok[shard_order], shard[shard_order]
        bounds = np.flatnonzero(np.diff(shard)) + 1
        for lo, hi in zip(np.r_[0, bounds], np.r_[bounds, len(shard)]):
            local = greedy_pack(ntok[lo:hi], budget)
            out_seq[lo:hi] = (int(shard[lo]) << 32) | local
            starts = np.r_[0, np.flatnonzero(np.diff(local)) + 1]
            pos = np.arange(hi - lo) - np.repeat(
                starts, np.diff(np.r_[starts, hi - lo]))
            out_pos[lo:hi] = pos
        return pa.table({
            id_col: pa.array(ids, pa.int64()),
            "shard": pa.array(shard, pa.int64()),
            "seq_id": pa.array(out_seq, pa.int64()),
            "n_tokens": pa.array(ntok, pa.int64()),
            "pos": pa.array(out_pos, pa.int64()),
        })

    def add_shard(t: pa.Table) -> pa.Table:
        return t.append_column(
            "_shard",
            pa.array(t.column(id_col).to_numpy() % num_shards, pa.int64()))

    # co-locate by shard id (doc_id % num_shards) in one exchange
    keyed = slim.map_batches(add_shard, batch_format="pyarrow",
                             zero_copy_batch=True)

    def run(part: pa.Table) -> pa.Table:
        return pack_partition(part.drop_columns(["_shard"]))

    return keyed.groupby("_shard").map_groups(run, batch_format="pyarrow")


def docs_pack_sequences(sf_dir: str, budget: int = 256):
    """documents table -> packing assignment (rows-only query: greedy
    bin-packing is not ANSI-SQL-expressible; correctness is pytest
    property gates — budget respected, tokens preserved, partitioning
    invariance)."""
    import ray.data as rd

    ds = rd.read_parquet(f"{sf_dir}/documents.parquet",
                         columns=["doc_id", "text"])
    return pack_sequences(ds, budget=budget)


def docs_bpe_pack(sf_dir: str, budget: int = 256, num_merges: int = 100):
    """End-to-end "make training sequences" composite: corpus-trained
    BPE token counts (ops/bpe) feed the greedy packer via
    ``tokens_col`` — the real pipeline shape (tokenize -> pack), with
    the tokenizer's vocabulary learned from the SAME corpus in one
    bounded pass. Rows-only (BPE counts are not SQL-expressible); the
    packer's recurrence itself is oracled via docs_pack_sequences and
    the count plumbing is equivalence-tested."""
    import ray.data as rd

    from .bpe import bpe_encode, bpe_train

    docs = rd.read_parquet(f"{sf_dir}/documents.parquet",
                           columns=["doc_id", "text"])
    merges = bpe_train(docs, num_merges=num_merges)
    counts = bpe_encode(docs, merges)
    return pack_sequences(counts, budget=budget, id_col="doc_id",
                          tokens_col="n_bpe_tokens").sort("doc_id")
