"""Deduplication suite over a documents corpus (doc_id, text).

Four families, all Ray-Data-first (SURVEY.md §2.7 extension; patterns per
the public MinHash/LSH literature — Broder '97 resemblance sketches,
Charikar '02 SimHash):

  * exact_dedup       — hash-partition on content hash, first doc wins
                        (oracle: GROUP BY md5(text) in DuckDB)
  * minhash_lsh_pairs — shingle -> 64-perm MinHash -> banded LSH buckets
                        -> candidate pairs -> exact-Jaccard verify
  * simhash_pairs     — 64-bit SimHash -> 4x16-bit band buckets ->
                        Hamming-distance verify
  * ngram_jaccard_pairs — exact all-pairs token-set Jaccard (the O(n^2)
                        verification baseline; LSH is the scale path)
  * embedding_dup_pairs — cosine near-dup within label blocks
                        (oracle: DuckDB list_cosine_similarity self-join)

Scale notes (100 TB design):
  - the ONLY all-to-all exchanges are the groupbys on (band, key) /
    content-hash — both pre-reduced: signatures are ~100 bytes/doc, not
    the documents themselves.
  - LSH bucket skew: a bucket with > BUCKET_CAP members is a
    near-identical cluster; we emit star pairs (min doc vs rest), not
    the O(n^2) clique.
  - pair verification here broadcasts the token-set/signature dict
    (fits the object store at test scale); at corpus scale replace with
    two hash joins of the pair list against the docs table on doc_id.
"""

from __future__ import annotations

import zlib

import numpy as np
import pyarrow as pa

_MERSENNE = (1 << 61) - 1
BUCKET_CAP = 50


def _token_shingles(text: str, k: int) -> set[str]:
    toks = text.split()
    if k <= 1:
        return set(toks)
    return {" ".join(toks[i:i + k]) for i in range(max(0, len(toks) - k + 1))}


def _shingle_hashes(text: str, k: int) -> np.ndarray:
    return np.array(
        sorted(zlib.crc32(s.encode("utf-8")) for s in _token_shingles(text, k)),
        dtype=np.uint64,
    )


def _perm_params(num_perm: int, seed: int = 7) -> tuple[np.ndarray, np.ndarray]:
    rng = np.random.RandomState(seed)
    a = rng.randint(1, _MERSENNE, size=num_perm, dtype=np.uint64)
    b = rng.randint(0, _MERSENNE, size=num_perm, dtype=np.uint64)
    return a, b


class MinHasher:
    """map_batches actor stage: doc -> (doc_id, band, band_key) rows.

    Permutation parameters and band layout are built once per actor;
    per-doc signatures are vectorized ((a*x + b) mod p over the shingle
    hash vector)."""

    def __init__(self, num_perm: int = 64, bands: int = 16, shingle: int = 1,
                 seed: int = 7):
        assert num_perm % bands == 0
        self.num_perm, self.bands, self.shingle = num_perm, bands, shingle
        self.rows_per_band = num_perm // bands
        self.a, self.b = _perm_params(num_perm, seed)

    def signature(self, text: str) -> np.ndarray:
        h = _shingle_hashes(text, self.shingle)
        if h.size == 0:
            return np.zeros(self.num_perm, dtype=np.uint64)
        with np.errstate(over="ignore"):
            m = (self.a[:, None] * h[None, :] + self.b[:, None]) % _MERSENNE
        return m.min(axis=1)

    def __call__(self, batch: pa.Table) -> pa.Table:
        doc_ids = batch.column("doc_id").to_pylist()
        texts = batch.column("text").to_pylist()
        out_doc, out_band, out_key = [], [], []
        for d, t in zip(doc_ids, texts):
            sig = self.signature(t)
            for band in range(self.bands):
                chunk = sig[band * self.rows_per_band:(band + 1) * self.rows_per_band]
                key = zlib.crc32(chunk.tobytes())
                out_doc.append(d)
                out_band.append(band)
                out_key.append(key)
        return pa.table({
            "doc_id": pa.array(out_doc, pa.int64()),
            "band": pa.array(out_band, pa.int32()),
            "band_key": pa.array(out_key, pa.int64()),
        })


def _bucket_pairs(group: pa.Table) -> pa.Table:
    """Bucket -> candidate pairs; star pattern beyond BUCKET_CAP (skew guard)."""
    ids = sorted(group.column("doc_id").to_pylist())
    a_out, b_out = [], []
    if len(ids) > BUCKET_CAP:
        head = ids[0]
        for x in ids[1:]:
            a_out.append(head)
            b_out.append(x)
    else:
        for i in range(len(ids)):
            for j in range(i + 1, len(ids)):
                a_out.append(ids[i])
                b_out.append(ids[j])
    return pa.table({
        "doc_a": pa.array(a_out, pa.int64()),
        "doc_b": pa.array(b_out, pa.int64()),
    })



def jaccard(a: set, b: set) -> float:
    if not a and not b:
        return 1.0
    inter = len(a & b)
    return inter / (len(a) + len(b) - inter)


class VerifyJaccard:
    """Exact-Jaccard verification of candidate pairs against a broadcast
    doc_id -> token-shingle-set dict (see module scale notes)."""

    def __init__(self, shingle_ref, threshold: float, k: int):
        from ..broadcast import get_broadcast

        self.sets = get_broadcast(shingle_ref)
        self.threshold = threshold
        self.k = k

    def __call__(self, batch: pa.Table) -> pa.Table:
        da = batch.column("doc_a").to_pylist()
        db = batch.column("doc_b").to_pylist()
        keep_a, keep_b, sims = [], [], []
        for x, y in zip(da, db):
            j = round(jaccard(self.sets[x], self.sets[y]), 6)
            if j >= self.threshold:  # threshold applies to the ROUNDED value
                keep_a.append(x)     # (matches the SQL oracle exactly)
                keep_b.append(y)
                sims.append(j)
        return pa.table({
            "doc_a": pa.array(keep_a, pa.int64()),
            "doc_b": pa.array(keep_b, pa.int64()),
            "jaccard": pa.array(sims, pa.float64()),
        })


def minhash_lsh_pairs(ds, threshold: float = 0.7, shingle: int = 1,
                      num_perm: int = 64, bands: int = 16):
    """documents Dataset -> verified near-dup pairs (doc_a < doc_b)."""
    import ray

    sig = ds.map_batches(
        MinHasher, fn_constructor_kwargs={
            "num_perm": num_perm, "bands": bands, "shingle": shingle},
        batch_format="pyarrow", concurrency=(1, 8), zero_copy_batch=True,
    ).materialize()  # signatures are ~100 B/doc; pinning them avoids the
    # streaming planner recomputing the hash stage for each consumer
    cands = sig.groupby(["band", "band_key"]).map_groups(
        _bucket_pairs, batch_format="pyarrow")
    # distinct pairs via a vectorized Count aggregate (a per-pair
    # map_groups would pay Python overhead per tiny group)
    from ray.data.aggregate import Count

    cands = cands.groupby(["doc_a", "doc_b"]).aggregate(
        Count(alias_name="_n")).select_columns(["doc_a", "doc_b"])
    # broadcast shingle sets (test-scale; scale path = 2 hash joins)
    docs = ds.select_columns(["doc_id", "text"]).take_all()
    sets = {r["doc_id"]: _token_shingles(r["text"], shingle) for r in docs}
    ref = ray.put(sets)
    def verify(batch: pa.Table) -> pa.Table:
        return VerifyJaccard(ref, threshold, shingle)(batch)

    return cands.map_batches(verify, batch_format="pyarrow",
                             zero_copy_batch=True)


# --- SimHash --------------------------------------------------------------

class SimHasher:
    """64-bit SimHash signatures + 4x16-bit band keys, one row per band."""

    def __init__(self, seed: int = 11):
        self.a, self.b = _perm_params(1, seed)

    def sig64(self, text: str) -> int:
        toks = text.split()
        if not toks:
            return 0
        h = np.array([zlib.crc32(t.encode()) for t in toks], dtype=np.uint64)
        with np.errstate(over="ignore"):
            h = (self.a[0] * h + self.b[0]) % _MERSENNE
            h2 = h * np.uint64(0x9E3779B97F4A7C15)  # spread to full 64 bits
        bits = ((h2[:, None] >> np.arange(64, dtype=np.uint64)[None, :]) & 1)
        votes = bits.sum(axis=0) * 2 - len(toks)  # (+1/-1 votes summed)
        sig = 0
        for i in range(64):
            if votes[i] > 0:
                sig |= 1 << i
        return sig

    def __call__(self, batch: pa.Table) -> pa.Table:
        doc_ids = batch.column("doc_id").to_pylist()
        texts = batch.column("text").to_pylist()
        out_doc, out_band, out_key, out_sig = [], [], [], []
        for d, t in zip(doc_ids, texts):
            s = self.sig64(t)
            for band in range(4):
                out_doc.append(d)
                out_band.append(band)
                out_key.append((s >> (16 * band)) & 0xFFFF)
                out_sig.append(s - (1 << 63))
        return pa.table({
            "doc_id": pa.array(out_doc, pa.int64()),
            "band": pa.array(out_band, pa.int32()),
            "band_key": pa.array(out_key, pa.int64()),
            "sig": pa.array(out_sig, pa.int64()),
        })


class VerifyHamming:
    def __init__(self, sig_ref, max_dist: int):
        from ..broadcast import get_broadcast

        self.sigs = get_broadcast(sig_ref)
        self.max_dist = max_dist

    def __call__(self, batch: pa.Table) -> pa.Table:
        da = batch.column("doc_a").to_pylist()
        db = batch.column("doc_b").to_pylist()
        keep_a, keep_b, dists = [], [], []
        for x, y in zip(da, db):
            d = bin(self.sigs[x] ^ self.sigs[y]).count("1")
            if d <= self.max_dist:
                keep_a.append(x)
                keep_b.append(y)
                dists.append(d)
        return pa.table({
            "doc_a": pa.array(keep_a, pa.int64()),
            "doc_b": pa.array(keep_b, pa.int64()),
            "hamming": pa.array(dists, pa.int32()),
        })


def simhash_pairs(ds, max_dist: int = 3):
    """documents Dataset -> SimHash near-dup pairs (hamming <= max_dist)."""
    import ray

    hasher = SimHasher()
    sig = ds.map_batches(SimHasher, batch_format="pyarrow",
                         concurrency=(1, 8), zero_copy_batch=True).materialize()
    cands = sig.groupby(["band", "band_key"]).map_groups(
        _bucket_pairs, batch_format="pyarrow")
    from ray.data.aggregate import Count

    cands = cands.groupby(["doc_a", "doc_b"]).aggregate(
        Count(alias_name="_n")).select_columns(["doc_a", "doc_b"])
    docs = ds.select_columns(["doc_id", "text"]).take_all()
    sigs = {r["doc_id"]: hasher.sig64(r["text"]) for r in docs}
    ref = ray.put(sigs)
    def verify(batch: pa.Table) -> pa.Table:
        return VerifyHamming(ref, max_dist)(batch)

    return cands.map_batches(verify, batch_format="pyarrow",
                             zero_copy_batch=True)


# --- exact all-pairs Jaccard (verification baseline, oracle-checkable) ----

class AllPairsJaccard:
    """Each task compares its batch's docs against every doc with a larger
    id (broadcast token-set dict): distributes the O(n^2) outer loop."""

    def __init__(self, sets_ref, threshold: float):
        from ..broadcast import get_broadcast

        self.sets = get_broadcast(sets_ref)
        self.all_ids = sorted(self.sets)
        self.threshold = threshold

    def __call__(self, batch: pa.Table) -> pa.Table:
        import bisect

        out_a, out_b, sims = [], [], []
        for a in batch.column("doc_id").to_pylist():
            sa = self.sets[a]
            for b in self.all_ids[bisect.bisect_right(self.all_ids, a):]:
                j = round(jaccard(sa, self.sets[b]), 6)
                if j >= self.threshold:  # rounded, like the SQL oracle
                    out_a.append(a)
                    out_b.append(b)
                    sims.append(j)
        return pa.table({
            "doc_a": pa.array(out_a, pa.int64()),
            "doc_b": pa.array(out_b, pa.int64()),
            "jaccard": pa.array(sims, pa.float64()),
        })


def ngram_jaccard_pairs(ds, threshold: float = 0.7, shingle: int = 1):
    import ray

    docs = ds.select_columns(["doc_id", "text"]).take_all()
    sets = {r["doc_id"]: _token_shingles(r["text"], shingle) for r in docs}
    ref = ray.put(sets)
    def compare(batch: pa.Table) -> pa.Table:
        return AllPairsJaccard(ref, threshold)(batch)

    return ds.select_columns(["doc_id"]).map_batches(
        compare, batch_format="pyarrow", zero_copy_batch=True)


# --- connected components over near-dup pairs ----------------------------

def dedup_clusters(pairs_ds, max_rounds: int = 10):
    """Near-dup pairs (doc_a < doc_b) -> cluster assignment
    (doc_id, cluster_id) where cluster_id = min doc_id of the component.

    Distributed min-label propagation (ray_guide "Near-dup" pattern):
    each round every node adopts the smallest label among itself and its
    neighbors via one groupby; converges in O(component-diameter)
    rounds. Rounds terminate early when an iteration changes nothing.
    Only docs appearing in >=1 pair are returned (singletons are their
    own clusters trivially).
    """
    import pyarrow.compute as pc

    def edges_to_labels(batch: pa.Table) -> pa.Table:
        # undirected edge -> both endpoints propose the smaller endpoint
        a = batch.column("doc_a")
        b = batch.column("doc_b")
        lo = pc.min_element_wise(a, b)
        return pa.table({
            "doc_id": pa.concat_arrays([a.combine_chunks(), b.combine_chunks()]),
            "label": pa.concat_arrays([lo.combine_chunks(), lo.combine_chunks()]),
        })

    edges = pairs_ds.select_columns(["doc_a", "doc_b"])
    labels = edges.map_batches(edges_to_labels, batch_format="pyarrow",
                               zero_copy_batch=True)

    from ray.data.aggregate import Min

    assign = labels.groupby("doc_id").aggregate(Min("label", alias_name="label"))
    # Propagation rounds: vectorized min-relaxation over the edge arrays
    # (driver-held at this scale — numpy minimum.at per round; at corpus
    # scale each round is edges ⋈ labels hash join + the same
    # groupby-min, identical semantics).
    edge_tbl = pa.concat_tables(
        list(edges.iter_batches(batch_format="pyarrow")))
    first = pa.concat_tables(list(assign.iter_batches(batch_format="pyarrow")))
    ids = first.column("doc_id").to_numpy()
    lab = first.column("label").to_numpy().copy()
    order = np.argsort(ids)
    ids, lab = ids[order], lab[order]
    ea = np.searchsorted(ids, edge_tbl.column("doc_a").to_numpy())
    eb = np.searchsorted(ids, edge_tbl.column("doc_b").to_numpy())
    for _ in range(max_rounds):
        m = np.minimum(lab[ea], lab[eb])
        new = lab.copy()
        np.minimum.at(new, ea, m)
        np.minimum.at(new, eb, m)
        # pointer-jump: labels are doc ids; chase one hop per round
        pos = np.searchsorted(ids, new)
        valid = (pos < len(ids)) & (ids[np.clip(pos, 0, len(ids) - 1)] == new)
        new[valid] = np.minimum(new[valid], lab[pos[valid]])
        if (new == lab).all():
            break
        lab = new
    import ray.data as rd

    return rd.from_arrow(pa.table({
        "doc_id": pa.array(ids, pa.int64()),
        "cluster_id": pa.array(lab, pa.int64()),
    }))


def canonical_docs(ds, pairs_ds):
    """Keep one representative (min doc_id) per near-dup cluster: the
    near-dup analogue of exact_dedup_keep_first."""
    import ray

    clusters = dedup_clusters(pairs_ds)
    drop: set = set()
    for b in clusters.iter_batches(batch_format="pyarrow"):
        for r in b.to_pylist():
            if r["doc_id"] != r["cluster_id"]:
                drop.add(r["doc_id"])
    ref = ray.put(drop)

    def keep(batch: pa.Table) -> pa.Table:
        from ..broadcast import get_broadcast

        dropset = get_broadcast(ref)
        ids = batch.column("doc_id").to_pylist()
        return batch.filter(pa.array([i not in dropset for i in ids],
                                     pa.bool_()))

    return ds.map_batches(keep, batch_format="pyarrow", zero_copy_batch=True)


# --- exact dedup by content hash -----------------------------------------

def exact_dedup_keep_first(ds):
    """documents -> representative rows (min doc_id per md5(text))."""
    from .text import Fingerprinter

    hashed = ds.map_batches(Fingerprinter, batch_format="pyarrow",
                            concurrency=(1, 8), zero_copy_batch=True)

    def _first(group: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        idx = pc.sort_indices(group.column("doc_id"))
        return group.select(["doc_id"]).take(idx[:1])

    return hashed.groupby("md5").map_groups(_first, batch_format="pyarrow")


# --- embedding cosine near-dup -------------------------------------------

def _label_block_pairs(threshold: float):
    def fn(group: pa.Table) -> pa.Table:
        ids = np.array(group.column("vec_id").to_pylist(), dtype=np.int64)
        m = np.array(group.column("embedding").to_pylist(), dtype=np.float64)
        norms = np.linalg.norm(m, axis=1, keepdims=True)
        norms[norms == 0] = 1.0
        mn = m / norms
        cos = np.round(mn @ mn.T, 6)  # rounded before thresholding (oracle parity)
        ii, jj = np.where(np.triu(cos >= threshold, k=1))
        order = np.lexsort((ids[jj], ids[ii]))
        lo = np.minimum(ids[ii], ids[jj])
        hi = np.maximum(ids[ii], ids[jj])
        return pa.table({
            "vec_a": pa.array(lo[order], pa.int64()),
            "vec_b": pa.array(hi[order], pa.int64()),
            "cosine": pa.array(cos[ii, jj][order], pa.float64()),
        })

    return fn


def embedding_dup_pairs(ds, threshold: float = 0.9):
    """embeddings Dataset -> near-dup pairs within label blocks (the
    IVF-style blocking assumption: near-dups share the coarse label;
    oracle = DuckDB self-join on label with list_cosine_similarity)."""
    return ds.groupby("label").map_groups(
        _label_block_pairs(threshold), batch_format="pyarrow")
