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
  - pair verification has TWO implementations selected by corpus size
    (``verify="auto"``): a broadcast token-set/signature dict for small
    corpora, and the scale path — two hash joins of the candidate-pair
    list against the docs/signature table on doc_id, verifying inside
    each joined batch with nothing text-sized ever on the driver.
"""

from __future__ import annotations

import zlib

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

_MERSENNE = (1 << 61) - 1
BUCKET_CAP = 50
# auto verify-mode switch: below this corpus size the token-set /
# signature dict comfortably fits the object store and the broadcast
# path avoids two join shuffles; above it, the join path is mandatory
JOIN_VERIFY_MIN_DOCS = 100_000


def _num_partitions() -> int:
    """Hash-join partition count = cluster CPUs. Never MORE than the
    CPU count: each partition wants an aggregator actor, and
    num_partitions > CPUs deadlocks/mis-plans the streaming executor on
    small sessions (observed: 32 partitions on a 4-CPU session hangs)."""
    try:
        import ray

        return max(2, int(ray.cluster_resources().get("CPU", 8)))
    except Exception:
        return 8


def _resolve_verify(verify: str, ds) -> str:
    if verify != "auto":
        return verify
    try:
        n = ds.count()
    except Exception:
        return "broadcast"
    return "join" if n >= JOIN_VERIFY_MIN_DOCS else "broadcast"


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

    def _signatures(self, batch: pa.Table) -> np.ndarray:
        """(n_docs, num_perm) signature matrix; bit-identical to
        per-doc ``signature`` calls. shingle==1 is vectorized: tokens
        are hashed once per DISTINCT string in the batch dictionary,
        per-doc minima run as numpy reduceat segments."""
        n = batch.num_rows
        if self.shingle != 1:
            return np.stack([self.signature(t)
                             for t in batch.column("text").to_pylist()])
        toks = pc.utf8_split_whitespace(batch.column("text"))
        flat = pc.list_flatten(toks).combine_chunks()
        parents = pc.list_parent_indices(toks).to_numpy()
        nonempty = pc.not_equal(flat, pa.scalar(""))
        flat = flat.filter(nonempty)
        parents = parents[nonempty.to_numpy(zero_copy_only=False)]
        denc = flat.dictionary_encode()
        if isinstance(denc, pa.ChunkedArray):
            denc = denc.combine_chunks()
        codes = denc.indices.to_numpy(zero_copy_only=False).astype(np.int64)
        vocab = denc.dictionary.to_pylist()
        th = np.array([zlib.crc32(s.encode("utf-8")) for s in vocab],
                      dtype=np.uint64)
        v = max(1, len(vocab))
        pair = np.unique(parents.astype(np.int64) * v + codes)
        drow, h = pair // v, th[pair % v]
        sigs = np.zeros((n, self.num_perm), dtype=np.uint64)
        if len(pair) == 0:
            return sigs
        starts = np.flatnonzero(np.concatenate(
            ([True], drow[1:] != drow[:-1])))
        rows = drow[starts]
        with np.errstate(over="ignore"):
            for j in range(self.num_perm):
                mj = (self.a[j] * h + self.b[j]) % _MERSENNE
                sigs[rows, j] = np.minimum.reduceat(mj, starts)
        return sigs

    def __call__(self, batch: pa.Table) -> pa.Table:
        doc_ids = np.asarray(batch.column("doc_id").to_numpy(),
                             dtype=np.int64)
        sigs = self._signatures(batch)
        n = len(doc_ids)
        out_key = np.empty(n * self.bands, dtype=np.int64)
        r = self.rows_per_band
        pos = 0
        for d in range(n):
            row = sigs[d]
            for band in range(self.bands):
                out_key[pos] = zlib.crc32(row[band * r:(band + 1) * r]
                                          .tobytes())
                pos += 1
        return pa.table({
            "doc_id": pa.array(np.repeat(doc_ids, self.bands), pa.int64()),
            "band": pa.array(np.tile(np.arange(self.bands, dtype=np.int32),
                                     n), pa.int32()),
            "band_key": pa.array(out_key, pa.int64()),
        })


def _bucket_rows(t: pa.Table) -> pa.Table:
    """(doc_id, band, band_key) -> slim (doc_id, _bkey) projection; the
    composite bucket id keeps the candidate shuffle at 16 B/row."""
    bkey = (t.column("band_key").to_numpy() * 64
            + t.column("band").to_numpy()).astype(np.int64)
    return pa.table({"doc_id": t.column("doc_id"),
                     "_bkey": pa.array(bkey, pa.int64())})


def _bucket_pairs_partition(part: pa.Table) -> pa.Table:
    """All-buckets-in-partition -> candidate pairs: one sort, then pair
    expansion per multi-member segment (singleton buckets — the vast
    majority — are skipped wholesale). Replaces a per-bucket map_groups
    that paid ~0.15 ms of Python per bucket; star pattern beyond
    BUCKET_CAP guards skew exactly like _bucket_pairs."""
    import pyarrow.compute as pc

    from .relational import _segment_starts

    idx = pc.sort_indices(part, sort_keys=[("_bkey", "ascending"),
                                           ("doc_id", "ascending")])
    g = part.take(idx)
    bk = g.column("_bkey").to_numpy()
    ids = g.column("doc_id").to_numpy()
    n = len(bk)
    starts = _segment_starts(bk)
    ends = np.append(starts[1:], n)
    a_out, b_out = [], []
    for s, e in zip(starts, ends):
        m = e - s
        if m < 2:
            continue
        seg = ids[s:e]
        if m > BUCKET_CAP:
            a_out.append(np.full(m - 1, seg[0], np.int64))
            b_out.append(seg[1:])
        else:
            ii, jj = np.triu_indices(m, k=1)
            a_out.append(seg[ii])
            b_out.append(seg[jj])
    if not a_out:
        return pa.table({"doc_a": pa.array([], pa.int64()),
                         "doc_b": pa.array([], pa.int64())})
    return pa.table({
        "doc_a": pa.array(np.concatenate(a_out), pa.int64()),
        "doc_b": pa.array(np.concatenate(b_out), pa.int64()),
    })


def _candidate_pairs(sig):
    """Signature rows -> distinct candidate pairs (the banded-LSH
    candidate stage shared by MinHash and SimHash).

    Distinctness (a pair surfaces once per agreeing band) runs as
    pack-to-int64 + in-batch np.unique + one hash co-location + one
    np.unique per partition — measured ~5x cheaper than a two-column
    groupby().Count() exchange, whose sort-based aggregation dominated
    the whole LSH pipeline. Pair ids must fit 32 bits each; beyond that
    (corpus > 4B docs) swap the packed key for a two-column lexsort
    unique per partition — same shape, no packing."""
    from .relational import partitioned_map_groups

    slim = sig.map_batches(_bucket_rows, batch_format="pyarrow",
                           zero_copy_batch=True)
    cands = partitioned_map_groups(slim, "_bkey", _bucket_pairs_partition)

    def pack(t: pa.Table) -> pa.Table:
        a = t.column("doc_a").to_numpy().astype(np.uint64)
        b = t.column("doc_b").to_numpy().astype(np.uint64)
        if len(a) and (a.max() >= 1 << 32 or b.max() >= 1 << 32):
            raise ValueError("doc_id >= 2^32: use two-column unique")
        pk = np.unique((a << np.uint64(32)) | b)  # in-batch pre-dedupe
        return pa.table({"_pk": pa.array(pk.view(np.int64), pa.int64())})

    keys = cands.map_batches(pack, batch_format="pyarrow",
                             zero_copy_batch=True)

    def uniq(part: pa.Table) -> pa.Table:
        pk = np.unique(part.column("_pk").to_numpy().view(np.uint64))
        return pa.table({
            "doc_a": pa.array((pk >> np.uint64(32)).astype(np.int64),
                              pa.int64()),
            "doc_b": pa.array((pk & np.uint64(0xFFFFFFFF)).astype(np.int64),
                              pa.int64()),
        })

    return partitioned_map_groups(keys, "_pk", uniq)


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


def _verify_jaccard_join(cands, ds, threshold: float, shingle: int):
    """Scale-path verification: candidate pairs ⋈ docs on doc_a, then on
    doc_b (two hash-partitioned joins shipping each text to its pairs),
    exact Jaccard per joined batch. The driver never materializes text;
    memory per task is one joined batch."""
    nparts = _num_partitions()
    docs_a = ds.select_columns(["doc_id", "text"]).rename_columns(
        {"doc_id": "doc_a", "text": "_text_a"})
    docs_b = ds.select_columns(["doc_id", "text"]).rename_columns(
        {"doc_id": "doc_b", "text": "_text_b"})
    j = cands.join(docs_a, join_type="inner", num_partitions=nparts,
                   on=("doc_a",))
    j = j.join(docs_b, join_type="inner", num_partitions=nparts,
               on=("doc_b",))

    def verify(batch: pa.Table) -> pa.Table:
        da = batch.column("doc_a").to_pylist()
        db = batch.column("doc_b").to_pylist()
        ta = batch.column("_text_a").to_pylist()
        tb = batch.column("_text_b").to_pylist()
        keep_a, keep_b, sims = [], [], []
        for x, y, sx, sy in zip(da, db, ta, tb):
            jv = round(jaccard(_token_shingles(sx, shingle),
                               _token_shingles(sy, shingle)), 6)
            if jv >= threshold:  # threshold on the ROUNDED value (oracle)
                keep_a.append(x)
                keep_b.append(y)
                sims.append(jv)
        return pa.table({
            "doc_a": pa.array(keep_a, pa.int64()),
            "doc_b": pa.array(keep_b, pa.int64()),
            "jaccard": pa.array(sims, pa.float64()),
        })

    return j.map_batches(verify, batch_format="pyarrow", zero_copy_batch=True)


def minhash_lsh_pairs(ds, threshold: float = 0.7, shingle: int = 1,
                      num_perm: int = 64, bands: int = 16,
                      verify: str = "auto"):
    """documents Dataset -> verified near-dup pairs (doc_a < doc_b).

    ``verify``: "broadcast" (token-set dict via ray.put; small corpora),
    "join" (two hash joins of the pair list against the docs table —
    the 100 TB path), or "auto" (by corpus size)."""
    import ray

    sig = ds.map_batches(
        MinHasher, fn_constructor_kwargs={
            "num_perm": num_perm, "bands": bands, "shingle": shingle},
        batch_format="pyarrow", concurrency=(1, 8), zero_copy_batch=True,
    ).materialize()  # signatures are ~100 B/doc; pinning them avoids the
    # streaming planner recomputing the hash stage for each consumer
    cands = _candidate_pairs(sig)
    if _resolve_verify(verify, ds) == "join":
        return _verify_jaccard_join(cands, ds, threshold, shingle)
    docs = ds.select_columns(["doc_id", "text"]).take_all()
    sets = {r["doc_id"]: _token_shingles(r["text"], shingle) for r in docs}
    ref = ray.put(sets)
    def verify_fn(batch: pa.Table) -> pa.Table:
        return VerifyJaccard(ref, threshold, shingle)(batch)

    return cands.map_batches(verify_fn, batch_format="pyarrow",
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
        # int64 BEFORE the vote arithmetic: in uint64, 0*2 - len wraps
        # to a huge positive and sets bits the votes actually rejected
        # (every odd-token-count doc degenerated to an all-ones
        # signature before this cast)
        votes = bits.astype(np.int64).sum(axis=0) * 2 - len(toks)
        sig = 0
        for i in range(64):
            if votes[i] > 0:
                sig |= 1 << i
        return sig

    def _sigs_batch(self, batch: pa.Table) -> np.ndarray:
        """Vectorized batch twin of sig64 (bit-identical, equivalence-
        tested): crc32 runs once per DISTINCT token via dictionary
        encoding, the per-doc bit votes are one reduceat over the
        flattened code stream — no per-occurrence Python."""
        toks = pc.utf8_split_whitespace(batch.column("text"))
        flat = pc.list_flatten(toks).combine_chunks()
        parents = pc.list_parent_indices(toks).to_numpy()
        # Arrow emits empty boundary tokens where str.split() drops
        # them — filter to match the scalar reference exactly
        keep = pc.not_equal(flat, pa.scalar("")).to_numpy(
            zero_copy_only=False)
        flat = flat.filter(pa.array(keep))
        parents = parents[keep]
        sigs = np.zeros(len(batch), dtype=np.uint64)
        if len(flat) == 0:
            return sigs
        d = flat.dictionary_encode()
        if isinstance(d, pa.ChunkedArray):
            d = d.combine_chunks()
        codes = d.indices.to_numpy().astype(np.int64)
        vocab = d.dictionary.to_pylist()
        hv = np.array([zlib.crc32(t.encode()) for t in vocab],
                      dtype=np.uint64)
        with np.errstate(over="ignore"):
            h = (self.a[0] * hv + self.b[0]) % _MERSENNE
            h2 = h * np.uint64(0x9E3779B97F4A7C15)
        shifts = np.arange(64, dtype=np.uint64)[None, :]
        bits_vocab = ((h2[:, None] >> shifts) & 1).astype(np.int64)
        seg = np.nonzero(np.concatenate(
            [[True], parents[1:] != parents[:-1]]))[0]
        votes = np.add.reduceat(bits_vocab[codes], seg, axis=0)
        n_tok = np.diff(np.append(seg, len(codes)))
        pos = (votes * 2 - n_tok[:, None]) > 0
        seg_sigs = (pos.astype(np.uint64)
                    << np.arange(64, dtype=np.uint64)[None, :]).sum(axis=1)
        sigs[parents[seg]] = seg_sigs
        # rows with no (nonempty) tokens keep sig 0, matching sig64("")
        return sigs

    def __call__(self, batch: pa.Table) -> pa.Table:
        doc_ids = batch.column("doc_id").to_numpy()
        sigs = self._sigs_batch(batch)
        n = len(doc_ids)
        bands = np.tile(np.arange(4, dtype=np.int32), n)
        docs4 = np.repeat(doc_ids, 4)
        sig4 = np.repeat(sigs, 4)
        keys = (sig4 >> (np.uint64(16) * bands.astype(np.uint64))) \
            & np.uint64(0xFFFF)
        return pa.table({
            "doc_id": pa.array(docs4, pa.int64()),
            "band": pa.array(bands, pa.int32()),
            "band_key": pa.array(keys.astype(np.int64), pa.int64()),
            "sig": pa.array((sig4 - np.uint64(1 << 63)).view(np.int64)
                            .astype(np.int64), pa.int64()),
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


def _popcount64(x: np.ndarray) -> np.ndarray:
    """Vectorized SWAR popcount over uint64."""
    m1 = np.uint64(0x5555555555555555)
    m2 = np.uint64(0x3333333333333333)
    m4 = np.uint64(0x0F0F0F0F0F0F0F0F)
    h01 = np.uint64(0x0101010101010101)
    x = x - ((x >> np.uint64(1)) & m1)
    x = (x & m2) + ((x >> np.uint64(2)) & m2)
    x = (x + (x >> np.uint64(4))) & m4
    with np.errstate(over="ignore"):
        return ((x * h01) >> np.uint64(56)).astype(np.int64)


def _verify_hamming_join(cands, sig, max_dist: int):
    """Scale-path verification: pair list ⋈ per-doc signatures (8 B/doc)
    twice on doc_id, then a fully vectorized XOR + SWAR popcount per
    joined batch — no signature dict on the driver."""
    nparts = _num_partitions()
    per_doc = sig.filter(expr="band == 0").select_columns(["doc_id", "sig"])
    sa = per_doc.rename_columns({"doc_id": "doc_a", "sig": "_sig_a"})
    sb = per_doc.rename_columns({"doc_id": "doc_b", "sig": "_sig_b"})
    j = cands.join(sa, join_type="inner", num_partitions=nparts,
                   on=("doc_a",))
    j = j.join(sb, join_type="inner", num_partitions=nparts,
               on=("doc_b",))

    def verify(batch: pa.Table) -> pa.Table:
        # int64 bit pattern == uint64 bit pattern: xor-view is exact
        a = batch.column("_sig_a").to_numpy().view(np.uint64)
        b = batch.column("_sig_b").to_numpy().view(np.uint64)
        d = _popcount64(a ^ b)
        keep = d <= max_dist
        return pa.table({
            "doc_a": batch.column("doc_a").filter(pa.array(keep)),
            "doc_b": batch.column("doc_b").filter(pa.array(keep)),
            "hamming": pa.array(d[keep].astype(np.int32), pa.int32()),
        })

    return j.map_batches(verify, batch_format="pyarrow", zero_copy_batch=True)


def simhash_pairs(ds, max_dist: int = 3, verify: str = "auto"):
    """documents Dataset -> SimHash near-dup pairs (hamming <= max_dist).

    ``verify``: "broadcast" | "join" | "auto" — the join path reuses the
    already-materialized signature table (one row per doc at band 0), so
    it never touches document text after the hashing stage."""
    import ray

    hasher = SimHasher()
    sig = ds.map_batches(SimHasher, batch_format="pyarrow",
                         concurrency=(1, 8), zero_copy_batch=True).materialize()
    cands = _candidate_pairs(sig)
    if _resolve_verify(verify, ds) == "join":
        # stored sig is offset by -2^63 (signed storage); XOR of the
        # signed bit patterns equals XOR of the raw signatures
        return _verify_hamming_join(cands, sig, max_dist)
    docs = ds.select_columns(["doc_id", "text"]).take_all()
    sigs = {r["doc_id"]: hasher.sig64(r["text"]) for r in docs}
    ref = ray.put(sigs)
    def verify_fn(batch: pa.Table) -> pa.Table:
        return VerifyHamming(ref, max_dist)(batch)

    return cands.map_batches(verify_fn, batch_format="pyarrow",
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


NGRAM_JACCARD_MAX_DOCS = 100_000


def ngram_jaccard_pairs(ds, threshold: float = 0.7, shingle: int = 1):
    """EXACT all-pairs Jaccard — a declared O(n^2) verification baseline
    for the LSH paths, NOT a corpus operator. Hard-gated: refuses above
    NGRAM_JACCARD_MAX_DOCS docs (at which point the token-set broadcast
    and the quadratic compare are both scale-killers); use
    minhash_lsh_pairs for real corpora."""
    import ray

    n = ds.count()
    if n > NGRAM_JACCARD_MAX_DOCS:
        raise ValueError(
            f"ngram_jaccard_pairs is an exact O(n^2) baseline capped at "
            f"{NGRAM_JACCARD_MAX_DOCS} docs (got {n}); use "
            "minhash_lsh_pairs for near-dup detection at corpus scale")
    docs = ds.select_columns(["doc_id", "text"]).take_all()
    sets = {r["doc_id"]: _token_shingles(r["text"], shingle) for r in docs}
    ref = ray.put(sets)
    def compare(batch: pa.Table) -> pa.Table:
        return AllPairsJaccard(ref, threshold)(batch)

    return ds.select_columns(["doc_id"]).map_batches(
        compare, batch_format="pyarrow", zero_copy_batch=True)


# --- connected components over near-dup pairs ----------------------------

# edges above this count leave the numpy fast path for the join-based
# distributed rounds (driver memory stays O(1) there)
LOCAL_CC_MAX_EDGES = 2_000_000


def dedup_clusters(pairs_ds, max_rounds: int = 10, mode: str = "auto"):
    """Near-dup pairs (doc_a < doc_b) -> cluster assignment
    (doc_id, cluster_id) where cluster_id = min doc_id of the component.

    Min-label propagation with pointer jumping; converges in
    O(log diameter) rounds. Only docs appearing in >=1 pair are returned
    (singletons are their own clusters trivially).

    ``mode``: "local" (edge arrays on the driver, vectorized numpy
    rounds), "distributed" (each round = edges ⋈ labels hash joins +
    groupby-min + a label-chase join; driver holds only a per-round sum
    for the convergence check), or "auto" (by edge count,
    LOCAL_CC_MAX_EDGES). Both modes produce identical assignments —
    equivalence-tested on planted chains/stars.
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

    # pin the pair list once: both the mode probe and every propagation
    # round re-consume it (an unmaterialized lineage would re-run LSH
    # per consumer); edges are 16 B/row
    edges = pairs_ds.select_columns(["doc_a", "doc_b"]).materialize()
    if mode == "auto":
        mode = "local" if edges.count() <= LOCAL_CC_MAX_EDGES else "distributed"

    from ray.data.aggregate import Min

    labels0 = edges.map_batches(edges_to_labels, batch_format="pyarrow",
                                zero_copy_batch=True)
    assign = labels0.groupby("doc_id").aggregate(
        Min("label", alias_name="label"))

    if mode == "distributed":
        return _cc_distributed(edges, assign, max_rounds)

    # local fast path: vectorized min-relaxation over driver-held arrays
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


def _drop_empty_blocks(mat_ds):
    """Rebuild a materialized Dataset without its empty blocks.

    Hash-shuffle groupbys emit schema-LESS empty partitions (the known
    empty-block schema-loss failure mode); an Acero join consuming one
    fails FieldRef resolution, and map_batches passes empty blocks
    through UNPROCESSED so a coercion stage can't repair them. Block
    payloads never move: a tiny remote num_rows probe per block, then
    from_arrow_refs over the survivors."""
    import ray
    import ray.data as rd

    refs = mat_ds.to_arrow_refs()
    counts = ray.get([_block_rows.remote(r) for r in refs])
    keep = [r for r, c in zip(refs, counts) if c > 0]
    if not keep or len(keep) == len(refs):
        return mat_ds
    return rd.from_arrow_refs(keep)


def _block_rows_fn(t: pa.Table) -> int:
    return t.num_rows


try:
    import ray as _ray

    _block_rows = _ray.remote(num_cpus=0)(_block_rows_fn)
except Exception:  # pragma: no cover - ray import is always available
    _block_rows = None


def _cc_distributed(edges, assign, max_rounds: int):
    """Join-based label-propagation rounds: labels live as a Dataset; a
    round is two edges ⋈ labels joins (propose min over each edge), one
    labels ⋈ labels label-chase (pointer jump), and a groupby-min.
    Convergence is detected by the label sum (labels only decrease, so
    an unchanged sum is a fixpoint) — the driver sees one scalar per
    round."""
    import pyarrow.compute as pc
    from ray.data.aggregate import Min, Sum

    nparts = _num_partitions()
    labels = _drop_empty_blocks(assign.materialize())

    def lab_sum(ls) -> int:
        row = ls.aggregate(Sum("label", alias_name="s"))
        return int(row["s"])

    def _project(names: list[str]):
        # rename via an explicit per-batch projection: rename_columns
        # datasets feeding joins get mis-planned (FieldRef resolution
        # failures when one materialized ds is renamed 3 ways in a plan)
        def fn(t: pa.Table) -> pa.Table:
            return t.select(["doc_id", "label"]).rename_columns(names)

        return fn

    prev = lab_sum(labels)
    for _ in range(max_rounds):
        la = labels.map_batches(_project(["doc_a", "_la"]),
                                batch_format="pyarrow", zero_copy_batch=True)
        lb = labels.map_batches(_project(["doc_b", "_lb"]),
                                batch_format="pyarrow", zero_copy_batch=True)
        j = edges.join(la, join_type="inner", num_partitions=nparts,
                       on=("doc_a",))
        j = j.join(lb, join_type="inner", num_partitions=nparts,
                   on=("doc_b",))

        def propose(batch: pa.Table) -> pa.Table:
            m = pc.min_element_wise(batch.column("_la"), batch.column("_lb"))
            mc = m.combine_chunks() if isinstance(m, pa.ChunkedArray) else m
            return pa.table({
                "doc_id": pa.concat_arrays(
                    [batch.column("doc_a").combine_chunks(),
                     batch.column("doc_b").combine_chunks()]),
                "label": pa.concat_arrays([mc, mc]),
            })

        props = j.map_batches(propose, batch_format="pyarrow",
                              zero_copy_batch=True)
        # pointer jump: each node also proposes its label's label
        ll = labels.map_batches(_project(["label", "_l2"]),
                                batch_format="pyarrow", zero_copy_batch=True)
        chase = labels.join(ll, join_type="inner", num_partitions=nparts,
                            on=("label",))

        def jump(batch: pa.Table) -> pa.Table:
            return pa.table({"doc_id": batch.column("doc_id"),
                             "label": batch.column("_l2")})

        chased = chase.map_batches(jump, batch_format="pyarrow",
                                   zero_copy_batch=True)
        new_labels = _drop_empty_blocks(
            props.union(chased).union(labels)
            .groupby("doc_id").aggregate(Min("label", alias_name="label"))
            .materialize())
        cur = lab_sum(new_labels)
        labels = new_labels
        if cur == prev:
            break
        prev = cur

    def to_out(batch: pa.Table) -> pa.Table:
        return pa.table({"doc_id": batch.column("doc_id"),
                         "cluster_id": batch.column("label")})

    return labels.map_batches(to_out, batch_format="pyarrow",
                              zero_copy_batch=True)


def canonical_docs(ds, pairs_ds):
    """Keep one representative (min doc_id) per near-dup cluster: the
    near-dup analogue of exact_dedup_keep_first.

    The non-canonical id list (dup-rate-sized, ids only — never text) is
    collected via a vectorized filter and broadcast as a typed Arrow
    value set; the keep stage is one pc.is_in per batch. At corpus scale
    with a high dup rate, swap the broadcast for an anti join of ds
    against the id list (the semi_join_stage shape)."""
    import pyarrow.compute as pc
    import ray

    clusters = dedup_clusters(pairs_ds)

    def non_canonical(batch: pa.Table) -> pa.Table:
        m = pc.not_equal(batch.column("doc_id"), batch.column("cluster_id"))
        return batch.filter(m).select(["doc_id"])

    chunks = [b.column("doc_id").combine_chunks()
              for b in clusters.map_batches(
                  non_canonical, batch_format="pyarrow",
                  zero_copy_batch=True).iter_batches(batch_format="pyarrow")
              if b.num_rows]
    drop_arr = (pa.concat_arrays(chunks) if chunks
                else pa.array([], pa.int64()))
    ref = ray.put(drop_arr)

    def keep(batch: pa.Table) -> pa.Table:
        from ..broadcast import get_broadcast

        drop = get_broadcast(ref)
        if len(drop) == 0:
            return batch
        hit = pc.is_in(batch.column("doc_id"), value_set=drop)
        return batch.filter(pc.invert(hit))

    return ds.map_batches(keep, batch_format="pyarrow", zero_copy_batch=True)


# --- exact dedup by content hash -----------------------------------------

def exact_dedup_keep_first(ds):
    """documents -> representative rows (min doc_id per md5(text)).
    Vectorized Min aggregate (pre-reduced per block) — no per-group
    Python, the exchange carries (md5, doc_id) partials only."""
    from ray.data.aggregate import Min

    from .text import Fingerprinter

    hashed = ds.map_batches(Fingerprinter, batch_format="pyarrow",
                            concurrency=(1, 8), zero_copy_batch=True)
    return hashed.groupby("md5").aggregate(
        Min("doc_id", alias_name="doc_id")).select_columns(["doc_id"])


# --- line-level dedup (CCNet/RefinedWeb-style boilerplate removal) --------

def dedup_lines(ds, text_col: str = "extracted_text", id_col: str = "url",
                materialize_input: bool = True):
    """Corpus-wide LINE dedup: every line that occurs more than once in
    the corpus survives only at its canonical occurrence (min (id,
    line_idx) lexicographically) and is stripped everywhere else — the
    CCNet/RefinedWeb boilerplate-removal pass of an LLM data pipeline.

    Scale shape mirrors dedup_pages_fast: phase 1 pre-reduces each batch
    to distinct (line_hash -> min_winner_key, count) partials (polars
    explode + group_by, vectorized xxhash per line — the exchange
    carries per-batch DISTINCT line hashes, never line text), one
    grouped Min/Sum, then only DUPLICATED hashes (dup-rate-sized)
    broadcast as typed Arrow arrays. Phase 2 re-derives each batch's
    line hashes and keeps a line iff unduplicated or at its winner
    position — embarrassingly parallel, no second shuffle. At 10^12
    docs swap the broadcast for a hash join of the exploded lines
    against the winner table (the dedup_pages_join shape).

    Rows whose every line is stripped keep an empty string (callers
    filter on min length downstream). Hash collisions (64-bit xxhash)
    would drop a non-duplicate line; at corpus scale use a 128-bit
    hash.

    ``ds`` feeds BOTH phases; the default ``materialize_input`` pins it
    once so an expensive upstream lineage (e.g. extraction) is not
    re-executed by the streaming planner for the second consumer — at
    checkpoint scale pass False and hand in a re-readable source."""
    import ray

    if materialize_input:
        ds = ds.materialize()

    def _exploded(batch: pa.Table):
        import polars as pl

        df = pl.from_arrow(batch.select([id_col, text_col]))
        ex = df.select(
            pl.col(id_col),
            pl.col(text_col).str.split("\n").alias("_l"))
        ex = ex.with_columns(
            pl.int_ranges(pl.col("_l").list.len()).alias("_i"))
        ex = ex.explode(["_l", "_i"])
        # reinterpret u64 -> i64 (same bits): Ray's sort-based groupby
        # round-trips keys through Python ints and overflows on uint64
        return ex.with_columns(
            pl.col("_l").hash(seed=0).reinterpret(signed=True)
            .alias("line_h"),
            pl.concat_str([
                pl.col(id_col), pl.lit("\x00"),
                pl.col("_i").cast(pl.String).str.zfill(8)]).alias("_key"))

    def partial(batch: pa.Table) -> pa.Table:
        import polars as pl

        ex = _exploded(batch)
        out = ex.group_by("line_h").agg(
            pl.col("_key").min().alias("win"),
            pl.len().cast(pl.Int64).alias("n"))
        return out.to_arrow().cast(pa.schema([
            ("line_h", pa.int64()), ("win", pa.string()),
            ("n", pa.int64())]))

    from ray.data.aggregate import Min, Sum

    agg = ds.map_batches(partial, batch_format="pyarrow",
                         zero_copy_batch=True) \
        .groupby("line_h").aggregate(
            Min("win", alias_name="win"), Sum("n", alias_name="n"))

    hs, wins = [], []
    for b in agg.iter_batches(batch_format="pyarrow"):
        d = b.filter(pc.greater(b.column("n"), 1))
        if d.num_rows:
            hs.append(d.column("line_h").combine_chunks())
            wins.append(d.column("win").combine_chunks())
    if not hs:
        return ds
    dup_h = pa.concat_arrays(hs)
    dup_win = pa.concat_arrays(wins)
    ref = ray.put((dup_h, dup_win))

    def strip(batch: pa.Table) -> pa.Table:
        import polars as pl

        from ..broadcast import get_broadcast

        d_h, d_win = get_broadcast(ref)
        df = pl.from_arrow(batch.select([id_col, text_col]))
        df = df.with_row_index("_r")
        ex = df.select(
            pl.col("_r"), pl.col(id_col),
            pl.col(text_col).str.split("\n").alias("_l"))
        ex = ex.with_columns(
            pl.int_ranges(pl.col("_l").list.len()).alias("_i"))
        ex = ex.explode(["_l", "_i"])
        ex = ex.with_columns(
            pl.col("_l").hash(seed=0).reinterpret(signed=True)
            .alias("line_h"),
            pl.concat_str([
                pl.col(id_col), pl.lit("\x00"),
                pl.col("_i").cast(pl.String).str.zfill(8)]).alias("_key"))
        idx = pc.index_in(ex["line_h"].to_arrow(), value_set=d_h)
        winner = pc.take(d_win, idx)
        keep = pc.or_kleene(pc.is_null(idx),
                            pc.equal(ex["_key"].to_arrow(), winner))
        kept = ex.with_columns(pl.Series(
            "_keep", keep.to_numpy(zero_copy_only=False))) \
            .filter(pl.col("_keep"))
        re = kept.group_by("_r", maintain_order=True).agg(
            pl.col("_l").str.join("\n").alias("_new"))
        out = df.join(re, on="_r", how="left") \
            .with_columns(pl.col("_new").fill_null("")).sort("_r")
        new_text = out["_new"].to_arrow().cast(pa.string())
        i = batch.schema.get_field_index(text_col)
        return batch.set_column(i, text_col, new_text)

    return ds.map_batches(strip, batch_format="pyarrow",
                          zero_copy_batch=True)


# --- embedding cosine near-dup -------------------------------------------

def _label_block_pairs(threshold: float):
    def fn(group: pa.Table) -> pa.Table:
        from .knn import _emb_matrix

        ids = group.column("vec_id").to_numpy().astype(np.int64)
        m = _emb_matrix(group.column("embedding"))
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


def _parquet_id_max(path: str, column: str) -> int:
    """Column max from parquet row-group statistics (no data read)."""
    import pyarrow.parquet as pq

    md = pq.ParquetFile(path).metadata
    idx = md.schema.to_arrow_schema().get_field_index(column)
    return max(md.row_group(i).column(idx).statistics.max
               for i in range(md.num_row_groups))


def new_content(ds_prior, ds_incoming, text_col: str = "text",
                id_col: str = "doc_id"):
    """Incremental-ingest dedup: incoming docs whose content hash was
    NOT seen in the prior corpus snapshot (exact anti-join semantics).

    Scale shape (the recurring-crawl pattern): the prior side reduces
    to a hashed-once, materialized (md5) projection (32 B/doc — text is
    scanned and hashed exactly once); Bloom partials (fixed ~10
    bits/key bitmaps, merged by OR) build over that projection;
    incoming rows that the Bloom rules out are DEFINITELY new and
    stream straight through; only the ~1% might-be-dup residue pays the
    exact check — one copartitioned hash co-location on md5 against the
    same prior projection, where a vectorized is_in drops true dups.
    Driver holds only the OR-merged bitmap (size fixed by expected_n,
    not corpus bytes)."""
    import hashlib

    import ray

    from .sketch import BloomFilter
    from .relational import copartitioned_map

    def md5s(batch: pa.Table) -> list[str]:
        from .text import md5_hex

        return md5_hex(batch.column(text_col).to_pylist())

    def prior_project(batch: pa.Table) -> pa.Table:
        return pa.table({"md5": pa.array(md5s(batch), pa.string())})

    prior_md5 = ds_prior.map_batches(prior_project, batch_format="pyarrow",
                                     zero_copy_batch=True).materialize()
    n_prior = prior_md5.count()

    from .sketch import bloom_ref_of

    ref = bloom_ref_of(prior_md5, "md5", n_prior)

    def hash_and_route(batch: pa.Table) -> pa.Table:
        from ..broadcast import get_broadcast_derived

        bf = get_broadcast_derived(ref, "bloom", BloomFilter.deserialize)
        h = md5s(batch)
        maybe = bf.might_contain(np.asarray(h, dtype=object)) \
            if len(h) else np.zeros(0, dtype=bool)
        return pa.table({
            id_col: batch.column(id_col),
            "md5": pa.array(h, pa.string()),
            "_maybe": pa.array(maybe, pa.bool_()),
        })

    routed = ds_incoming.map_batches(hash_and_route,
                                     batch_format="pyarrow",
                                     zero_copy_batch=True).materialize()
    fresh = routed.filter(expr="_maybe == False") \
        .select_columns([id_col, "md5"])
    residue = routed.filter(expr="_maybe == True") \
        .select_columns([id_col, "md5"])

    def prior_slim(batch: pa.Table) -> pa.Table:
        return pa.table({
            id_col: pa.nulls(batch.num_rows, pa.int64()),
            "md5": batch.column("md5"),
        })

    def inc_slim(batch: pa.Table) -> pa.Table:
        return batch.select([id_col, "md5"])

    def anti(parts: list[pa.Table]) -> pa.Table:
        inc_p, prior_p = parts
        if inc_p.num_rows == 0:
            return pa.table({id_col: pa.array([], pa.int64()),
                             "md5": pa.array([], pa.string())})
        seen = prior_p.column("md5").combine_chunks()
        keep = pc.invert(pc.is_in(inc_p.column("md5"), value_set=seen))
        return inc_p.filter(keep)

    verified = copartitioned_map(
        [(residue, inc_slim), (prior_md5, prior_slim)], "md5", anti)
    return fresh.union(verified)


def docs_new_content(sf_dir: str):
    """Query surface: treat doc_id < max/2 as the prior snapshot and
    the rest as the incoming crawl; emit the incoming doc_ids whose
    content is genuinely new (oracled: NOT EXISTS on md5)."""
    import pyarrow.dataset as pads
    import ray.data as rd

    split = _parquet_id_max(f"{sf_dir}/documents.parquet", "doc_id") // 2
    prior = rd.read_parquet(f"{sf_dir}/documents.parquet",
                            columns=["doc_id", "text"],
                            filter=pads.field("doc_id") < split)
    incoming = rd.read_parquet(f"{sf_dir}/documents.parquet",
                               columns=["doc_id", "text"],
                               filter=pads.field("doc_id") >= split)
    return new_content(prior, incoming).select_columns(["doc_id"]) \
        .sort("doc_id")


def banded_hamming_pairs(sig, max_dist: int, verify: str = "auto",
                         bands: int = 4):
    """Shared back half of every banded-signature near-dup miner
    (images, audio): a MATERIALIZED (doc_id, band, band_key, sig)
    table -> banded-LSH candidates -> hamming verification. ``auto``
    picks the verify mode from the pinned signature table's row count
    (``bands`` rows per doc) — never from the upstream dataset, whose
    lineage may be expensive to re-execute (e.g. corpus synthesis).

    "join" pays two signature hash joins (the 100 TB path);
    "broadcast" ships the 8 B/doc signature map once and probes
    candidates in place."""
    import ray

    cands = _candidate_pairs(sig)
    if verify == "auto":
        verify = ("join" if sig.count() // bands >= JOIN_VERIFY_MIN_DOCS
                  else "broadcast")
    if verify == "join":
        return _verify_hamming_join(cands, sig, max_dist)
    sigs: dict[int, int] = {}
    per_doc = sig.filter(expr="band == 0").select_columns(
        ["doc_id", "sig"])
    for b in per_doc.iter_batches(batch_format="pyarrow"):
        sigs.update(zip(b.column("doc_id").to_pylist(),
                        b.column("sig").to_pylist()))
    ref = ray.put(sigs)

    def verify_fn(batch: pa.Table) -> pa.Table:
        return VerifyHamming(ref, max_dist)(batch)

    return cands.map_batches(verify_fn, batch_format="pyarrow",
                             zero_copy_batch=True)


# --- AllPairs prefix-filtered cosine similarity join ----------------------
#
# Bayardo, Ma & Srikant, "Scaling Up All Pairs Similarity Search"
# (WWW 2007): an EXACT threshold join without the O(n^2) scan. Order
# the token universe by ascending document frequency (tie: token
# hash); any pair with binary-cosine >= t shares at least
# k = ceil(t^2 * |A|) tokens, so its SMALLEST shared token (in the
# global order) sits within the first |A| - k + 1 tokens of BOTH docs
# — bucketing only those PREFIX tokens is a complete candidate
# generator, and the df-ascending order makes prefixes favor RARE
# tokens, keeping buckets small where a naive token join explodes on
# stopwords.

COSINE_PAIR_ID_MAX = 1 << 32
# Dense-verify fast path: when the DISTINCT vocabulary is small enough
# that an (n_docs x n_vocab) matrix fits comfortably in the object
# store, candidate verification vectorizes to chunked row-gather +
# (A&B).sum / einsum instead of a per-pair Python intersect1d loop
# (~100x on the degenerate closed-vocabulary corpus where candidate
# counts approach all-pairs). Real web vocabularies blow past the cell
# cap and fall back to the sparse per-pair loop / blob joins.
DENSE_VERIFY_MAX_CELLS = 1 << 25


def _doc_token_table(batch: pa.Table) -> pa.Table:
    """(doc_id, th, na) exploded DISTINCT-token rows: whitespace split
    (empties kept — DuckDB string_split parity), 64-bit token hashes
    computed once per dictionary-distinct string, per-doc dedupe via
    one lexsort."""
    from .sketch import _hash64

    toks = pc.split_pattern(batch.column("text"), pattern=" ")
    flat = pc.list_flatten(toks).combine_chunks()
    parents = pc.list_parent_indices(toks).to_numpy()
    flat_d = flat.dictionary_encode()
    if isinstance(flat_d, pa.ChunkedArray):
        flat_d = flat_d.combine_chunks()
    codes = flat_d.indices.to_numpy(zero_copy_only=False).astype(np.int64)
    th = _hash64(flat_d.dictionary.to_numpy(zero_copy_only=False))[codes]
    doc = batch.column("doc_id").to_numpy()[parents]
    order = np.lexsort((th, doc))
    d_s, t_s = doc[order], th[order]
    keep = np.ones(d_s.size, bool)
    keep[1:] = (d_s[1:] != d_s[:-1]) | (t_s[1:] != t_s[:-1])
    d_s, t_s = d_s[keep], t_s[keep]
    bounds = np.flatnonzero(np.diff(d_s)) + 1
    starts = np.concatenate(([0], bounds))
    ends = np.concatenate((bounds, [d_s.size])) if d_s.size else starts
    na = (ends - starts).astype(np.int64)
    return pa.table({
        "doc_id": pa.array(d_s, pa.int64()),
        "th": pa.array(t_s.view(np.int64), pa.int64()),
        "na": pa.array(np.repeat(na, na), pa.int64())})


def _bin_prefix_fold(part: pa.Table, t2n: int, t2d: int) -> pa.Table:
    """Per-doc t-prefix of |A| - ceil(t^2|A|) + 1 tokens in ascending
    global (df, th) order (distributed per doc-keyed partition, or one
    local pass under the broadcast gate — same bytes either way)."""
    if part.num_rows == 0:
        return pa.table({"th": pa.array([], pa.int64()),
                         "doc_id": pa.array([], pa.int64()),
                         "na": pa.array([], pa.int64()),
                         "sfx": pa.array([], pa.int64())})
    d = part.column("doc_id").to_numpy()
    t = part.column("th").to_numpy()
    f = part.column("df").to_numpy()
    n = part.column("na").to_numpy()
    order = np.lexsort((t, f, d))   # per doc: ascending (df, th)
    d_s, t_s, n_s = d[order], t[order], n[order]
    bounds = np.flatnonzero(np.diff(d_s)) + 1
    starts = np.concatenate(([0], bounds))
    na_seg = n_s[starts]
    k = -(-(t2n * na_seg) // t2d)          # ceil(t^2 * na)
    plen = na_seg - k + 1
    pos = np.arange(d_s.size, dtype=np.int64) \
        - np.repeat(starts, np.diff(np.concatenate(
            (starts, [d_s.size]))))
    keep = pos < np.repeat(plen, np.diff(np.concatenate(
        (starts, [d_s.size]))))
    # positional suffix COUNT (tokens at or after this position in the
    # doc's global (df, th) order): at a pair's minimal shared token
    # ov <= min(sfx_a, sfx_b) <= sqrt(sfx_a*sfx_b), so
    # t2d*sfx_a*sfx_b >= t2n*na*nb is a valid in-bucket prune — the
    # binary analog of the tf remscore bound
    return pa.table({"th": pa.array(t_s[keep], pa.int64()),
                     "doc_id": pa.array(d_s[keep], pa.int64()),
                     "na": pa.array(n_s[keep], pa.int64()),
                     "sfx": pa.array(n_s[keep] - pos[keep],
                                     pa.int64())})


def _bin_bucket_pairs(part: pa.Table, t2n: int, t2d: int) -> pa.Table:
    """Candidate pairs within each prefix-token bucket: run-generated
    under the suffix-count remscore bound (see _bin_prefix_fold), then
    exact-filtered by BOTH that bound and the size filter
    (tq^2*min >= tp^2*max is necessary for the count predicate)."""
    empty = pa.table({"pk": pa.array([], pa.int64()),
                      "na": pa.array([], pa.int64()),
                      "nb": pa.array([], pa.int64())})
    if part.num_rows == 0:
        return empty
    t = part.column("th").to_numpy()
    d = part.column("doc_id").to_numpy()
    n = part.column("na").to_numpy()
    sfx = part.column("sfx").to_numpy()
    if d.size and d.max() >= COSINE_PAIR_ID_MAX:
        raise ValueError(
            "doc_id >= 2^32 breaks the packed pair key; use a "
            "two-column pair exchange at this id range")
    order, ia, ib = _ratio_run_pairs(t, sfx, n, t2n, t2d)
    if ia.size == 0:
        return empty
    d_s, n_s, sfx_s = d[order], n[order], sfx[order]
    da, db = d_s[ia], d_s[ib]
    na_, nb_ = n_s[ia], n_s[ib]
    lo = np.minimum(na_, nb_)
    hi = np.maximum(na_, nb_)
    ok = ((t2d * lo >= t2n * hi) & (da != db)
          & (t2d * sfx_s[ia] * sfx_s[ib] >= t2n * na_ * nb_))
    da, db, na_, nb_ = da[ok], db[ok], na_[ok], nb_[ok]
    swap = da > db
    da2 = np.where(swap, db, da)
    db2 = np.where(swap, da, db)
    na2 = np.where(swap, nb_, na_)
    nb2 = np.where(swap, na_, nb_)
    pk = (da2.astype(np.uint64) << np.uint64(32)) \
        | db2.astype(np.uint64)
    pk, idx = np.unique(pk, return_index=True)
    return pa.table({"pk": pa.array(pk.view(np.int64), pa.int64()),
                     "na": pa.array(na2[idx], pa.int64()),
                     "nb": pa.array(nb2[idx], pa.int64())})


def _bin_unpack(t: pa.Table) -> pa.Table:
    pk = t.column("pk").to_numpy().view(np.uint64)
    return pa.table({
        "doc_a": pa.array((pk >> np.uint64(32)).astype(np.int64),
                          pa.int64()),
        "doc_b": pa.array((pk & np.uint64(0xFFFFFFFF))
                          .astype(np.int64), pa.int64()),
        "na": t.column("na"), "nb": t.column("nb")})


def _simjoin_bin_broadcast(tok, t2n: int, t2d: int, dense: str,
                           nparts: int):
    """Broadcast-gate regime of the binary simjoin: the slim (doc_id,
    th, na) token table fits on the driver (what the gate asserts —
    the verify dict/matrix was ALREADY collected here), so candidate
    generation runs as ONE vectorized local pass through the SAME fold
    functions the distributed path runs per partition, skipping ~5
    fixed-overhead exchanges on a table this small (measured
    38 -> ~8 s at sf0.1). Verification stays distributed: candidates
    re-shard and verify map-side against a dense 0/1 matrix (small
    closed vocabulary; ov, na, nb <= |vocab| so int64 never wraps) or
    the per-doc token-hash dict."""
    import ray
    import ray.data as rd

    from ..broadcast import get_broadcast

    empty = pa.table({
        "doc_a": pa.array([], pa.int64()),
        "doc_b": pa.array([], pa.int64()),
        "overlap": pa.array([], pa.int64()),
        "na": pa.array([], pa.int64()),
        "nb": pa.array([], pa.int64())})
    d_chunks, t_chunks, n_chunks = [], [], []
    for b in tok.iter_batches(batch_format="pyarrow"):
        d_chunks.append(b.column("doc_id").to_numpy())
        t_chunks.append(b.column("th").to_numpy())
        n_chunks.append(b.column("na").to_numpy())
    if not d_chunks:
        return rd.from_arrow(empty)
    d_all = np.concatenate(d_chunks)
    t_all = np.concatenate(t_chunks)
    n_all = np.concatenate(n_chunks)
    order = np.argsort(d_all, kind="stable")
    d_all, t_all, n_all = d_all[order], t_all[order], n_all[order]
    tu = t_all.view(np.uint64)
    vocab, vdf = np.unique(tu, return_counts=True)
    part = pa.table({
        "doc_id": pa.array(d_all, pa.int64()),
        "th": pa.array(t_all, pa.int64()),
        "df": pa.array(vdf[np.searchsorted(vocab, tu)]
                       .astype(np.int64), pa.int64()),
        "na": pa.array(n_all, pa.int64())})
    bounds = np.flatnonzero(np.diff(d_all)) + 1
    starts = np.concatenate(([0], bounds))
    ends = np.concatenate((bounds, [d_all.size]))

    # predicate bound: ov, na, nb <= |vocab|, so both int64 sides are
    # <= max(t2n, t2d) * vocab^2 — guard exactly that
    dense_ok = (dense != "off"
                and vocab.size * starts.size <= DENSE_VERIFY_MAX_CELLS
                and max(t2n, t2d) * vocab.size * vocab.size
                < (1 << 62))

    pre = _bin_prefix_fold(part, t2n, t2d)

    if dense_ok:
        # vectorized verify is cheaper per candidate than the exact
        # filters + packed-key unique were, so ship the RAW
        # run-generated candidates straight to the dense verify and
        # dedup the verified (near-dup-density-bounded) set
        order2, ia, ib = _ratio_run_pairs(
            pre.column("th").to_numpy(), pre.column("sfx").to_numpy(),
            pre.column("na").to_numpy(), t2n, t2d)
        if ia.size == 0:
            return rd.from_arrow(empty)
        d_s = pre.column("doc_id").to_numpy()[order2]
        n_s = pre.column("na").to_numpy()[order2]
        da, db = d_s[ia], d_s[ib]
        na_, nb_ = n_s[ia], n_s[ib]
        swap = da > db
        cand_tbl = pa.table({
            "doc_a": pa.array(np.where(swap, db, da), pa.int64()),
            "doc_b": pa.array(np.where(swap, da, db), pa.int64()),
            "na": pa.array(np.where(swap, nb_, na_), pa.int64()),
            "nb": pa.array(np.where(swap, na_, nb_), pa.int64())})
        step = max(1, -(-cand_tbl.num_rows // nparts))
        cands = rd.from_arrow([cand_tbl.slice(i, step)
                               for i in range(0, cand_tbl.num_rows,
                                              step)])

        seglen = ends - starts
        col = np.searchsorted(vocab, tu)
        row = np.repeat(np.arange(starts.size), seglen)
        mat = np.zeros((starts.size, vocab.size), np.uint8)
        mat[row, col] = 1
        uids = d_all[starts].copy()
        dref = ray.put((uids, mat))

        def verify_dense(batch: pa.Table, _ref=dref) -> pa.Table:
            u, m = get_broadcast(_ref)
            da = batch.column("doc_a").to_numpy()
            db = batch.column("doc_b").to_numpy()
            na_ = batch.column("na").to_numpy()
            nb_ = batch.column("nb").to_numpy()
            ra = np.searchsorted(u, da)
            rb = np.searchsorted(u, db)
            ov = np.empty(da.size, np.int64)
            chunk = max(1, (1 << 23) // max(1, m.shape[1]))
            for s in range(0, da.size, chunk):
                e = min(s + chunk, da.size)
                ov[s:e] = (m[ra[s:e]] & m[rb[s:e]]).sum(
                    axis=1, dtype=np.int64)
            keep = t2d * ov * ov >= t2n * na_ * nb_
            return pa.table({
                "doc_a": pa.array(da[keep], pa.int64()),
                "doc_b": pa.array(db[keep], pa.int64()),
                "overlap": pa.array(ov[keep], pa.int64()),
                "na": pa.array(na_[keep], pa.int64()),
                "nb": pa.array(nb_[keep], pa.int64())})

        verified = cands.map_batches(verify_dense,
                                     batch_format="pyarrow",
                                     zero_copy_batch=True)
        return _bc_final_dedup(verified, empty, nparts)

    # dict-loop verify: the per-pair Python loop NEEDS the exact
    # filters + packed-key unique ahead of it
    cand_tbl = _bin_unpack(_pair_first(_bin_bucket_pairs(
        pre, t2n, t2d)))
    if cand_tbl.num_rows == 0:
        return rd.from_arrow(empty)
    step = max(1, -(-cand_tbl.num_rows // nparts))
    cands = rd.from_arrow([cand_tbl.slice(i, step)
                           for i in range(0, cand_tbl.num_rows, step)])

    arrs: dict[int, np.ndarray] = {}
    for i, s in enumerate(starts.tolist()):
        arrs[int(d_all[s])] = tu[s:ends[i]].copy()
    ref = ray.put(arrs)

    def verify_bc(batch: pa.Table, _ref=ref) -> pa.Table:
        lists = get_broadcast(_ref)
        da = batch.column("doc_a").to_numpy()
        db = batch.column("doc_b").to_numpy()
        na_ = batch.column("na").to_numpy()
        nb_ = batch.column("nb").to_numpy()
        keep = np.zeros(da.size, bool)
        ovs = np.zeros(da.size, np.int64)
        for i in range(da.size):  # pairs loop; intersect is C
            a = lists[int(da[i])]
            b2 = lists[int(db[i])]
            ov = np.intersect1d(a, b2, assume_unique=True).size
            if t2d * ov * ov >= t2n * int(na_[i]) * int(nb_[i]):
                keep[i] = True
                ovs[i] = ov
        return pa.table({
            "doc_a": pa.array(da[keep], pa.int64()),
            "doc_b": pa.array(db[keep], pa.int64()),
            "overlap": pa.array(ovs[keep], pa.int64()),
            "na": pa.array(na_[keep], pa.int64()),
            "nb": pa.array(nb_[keep], pa.int64())})

    return cands.map_batches(verify_bc, batch_format="pyarrow",
                             zero_copy_batch=True)


def cosine_simjoin_pairs(ds, tp: int = 4, tq: int = 5,
                         verify: str = "auto", dense: str = "auto"):
    """documents Dataset -> ALL pairs (doc_a < doc_b) whose distinct-
    token sets satisfy binary cosine |A∩B|/sqrt(|A||B|) >= tp/tq,
    EXACTLY: the threshold test is the integer predicate
    tq^2·ov^2 >= tp^2·na·nb, bit-deterministic in both engines.

    Plan (each exchange bounded, never all-pairs): (1) one df fold
    over the exploded distinct-token stream (vocabulary-bounded);
    (2) df attach via a token-keyed hash join + per-DOC co-location to
    sort each doc's tokens in the global (df, th) order and emit its
    prefix of |A| - ceil(t^2|A|) + 1 tokens; (3) prefix-token buckets
    generate size-filtered candidate pairs (tq^2·min >= tp^2·max is
    necessary), deduped by one packed-pair exchange; (4) exact overlap
    verification — BELOW the minhash verify gate the whole slim plan
    runs as one vectorized local pass (_simjoin_bin_broadcast: same
    folds, zero exchanges) and candidates verify map-side against a
    broadcast dense 0/1 matrix or per-doc hash dict (38 -> ~8 s at
    sf0.1 vs the exchange-per-stage path); above it each doc's array
    ships to its pairs via two hash joins (the 100 TB path — the
    driver never holds the corpus), the broadcast==join equivalence
    pytest-gated. Token identity is a 64-bit hash (collision bound
    ~vocab^2/2^65, the documented span-dedup discipline)."""
    t2n, t2d = tp * tp, tq * tq
    nparts = _num_partitions()

    tok = _drop_empty_blocks(
        ds.map_batches(_doc_token_table, batch_format="pyarrow",
                       zero_copy_batch=True).materialize())

    if _resolve_verify(verify, ds) == "broadcast":
        return _simjoin_bin_broadcast(tok, t2n, t2d, dense, nparts)

    def df_part(t: pa.Table) -> pa.Table:
        vc = t.column("th").value_counts()
        if isinstance(vc, pa.ChunkedArray):
            vc = vc.combine_chunks()
        return pa.table({"th": vc.field("values"),
                         "df": vc.field("counts").cast(pa.int64())})

    def df_sum(part: pa.Table) -> pa.Table:
        g = part.group_by("th").aggregate([("df", "sum")])
        return pa.table({"th": g.column("th"),
                         "df": g.column("df_sum").cast(pa.int64())})

    from .relational import partitioned_map_groups

    dft = _drop_empty_blocks(partitioned_map_groups(
        tok.map_batches(df_part, batch_format="pyarrow",
                        zero_copy_batch=True), "th", df_sum)
        .materialize())

    with_df = tok.join(dft, join_type="inner", num_partitions=nparts,
                       on=("th",))

    prefixes = partitioned_map_groups(
        with_df, "doc_id", lambda p: _bin_prefix_fold(p, t2n, t2d))

    raw_pairs = partitioned_map_groups(
        prefixes, "th", lambda p: _bin_bucket_pairs(p, t2n, t2d))

    cands = partitioned_map_groups(raw_pairs, "pk", _pair_first)

    # the hash-shuffle fold upstream emits schema-less empty
    # partitions, and an Acero join consuming one fails FieldRef
    # resolution — drop them (block payloads never move)
    cands = _drop_empty_blocks(
        cands.map_batches(_bin_unpack, batch_format="pyarrow",
                          zero_copy_batch=True).materialize())

    def doc_lists(t: pa.Table, name: str) -> pa.Table:
        # token hashes packed as an 8-bytes-per-token binary blob per
        # doc (Arrow's hash join rejects list payloads; binary ships)
        d = t.column("doc_id").to_numpy()
        th = t.column("th").to_numpy()
        if d.size == 0:
            return pa.table({
                name: pa.array([], pa.int64()),
                f"_ths_{name}": pa.array([], pa.binary())})
        bounds = np.flatnonzero(np.diff(d)) + 1
        starts = np.concatenate(([0], bounds))
        offsets = np.concatenate((starts, [d.size])).astype(np.int32) * 8
        blob = pa.Array.from_buffers(
            pa.binary(), starts.size,
            [None, pa.py_buffer(offsets.tobytes()),
             pa.py_buffer(th.view(np.uint64).astype("<u8").tobytes())])
        return pa.table({name: pa.array(d[starts], pa.int64()),
                         f"_ths_{name}": blob})

    lists_a = tok.map_batches(lambda t: doc_lists(t, "doc_a"),
                              batch_format="pyarrow",
                              zero_copy_batch=True)
    lists_b = tok.map_batches(lambda t: doc_lists(t, "doc_b"),
                              batch_format="pyarrow",
                              zero_copy_batch=True)
    j = cands.join(lists_a, join_type="inner", num_partitions=nparts,
                   on=("doc_a",))
    # join 1's empty hash partitions would fail join 2's FieldRef
    # resolution; the pin is pair-bounded (near-dup density, not corpus)
    j = _drop_empty_blocks(j.materialize())
    j = j.join(lists_b, join_type="inner", num_partitions=nparts,
               on=("doc_b",))

    def verify(batch: pa.Table) -> pa.Table:
        out_a, out_b, out_ov, out_na, out_nb = [], [], [], [], []
        la = batch.column("_ths_doc_a")
        lb = batch.column("_ths_doc_b")
        da = batch.column("doc_a").to_numpy()
        db = batch.column("doc_b").to_numpy()
        na_ = batch.column("na").to_numpy()
        nb_ = batch.column("nb").to_numpy()
        for i in range(batch.num_rows):
            a = np.frombuffer(la[i].as_py(), dtype=np.uint64)
            b = np.frombuffer(lb[i].as_py(), dtype=np.uint64)
            ov = np.intersect1d(a, b, assume_unique=True).size
            if t2d * ov * ov >= t2n * int(na_[i]) * int(nb_[i]):
                out_a.append(int(da[i]))
                out_b.append(int(db[i]))
                out_ov.append(ov)
                out_na.append(int(na_[i]))
                out_nb.append(int(nb_[i]))
        return pa.table({
            "doc_a": pa.array(out_a, pa.int64()),
            "doc_b": pa.array(out_b, pa.int64()),
            "overlap": pa.array(out_ov, pa.int64()),
            "na": pa.array(out_na, pa.int64()),
            "nb": pa.array(out_nb, pa.int64())})

    return j.map_batches(verify, batch_format="pyarrow",
                         zero_copy_batch=True)


def _pair_indices(starts: np.ndarray,
                  ends: np.ndarray) -> tuple[np.ndarray, np.ndarray]:
    """Index pairs (i < j) inside each [start, end) segment — the
    _segment_pairs arithmetic over positions instead of values."""
    n = int(ends[-1]) if ends.size else 0
    if n == 0:
        return np.zeros(0, np.int64), np.zeros(0, np.int64)
    k = ends - starts
    elem = np.arange(n, dtype=np.int64)
    succ = np.repeat(ends, k) - elem - 1
    total = int(succ.sum())
    if total == 0:
        return np.zeros(0, np.int64), np.zeros(0, np.int64)
    first = np.repeat(elem, succ)
    grp_start = np.cumsum(succ) - succ
    off = np.arange(total, dtype=np.int64) - np.repeat(grp_start, succ)
    second = first + off + 1
    return first, second


def docs_cosine_simjoin(sf_dir: str):
    """Query surface: exact binary-cosine >= 0.95 pairs over the
    documents table's whitespace-distinct token sets. 19/20 keeps the
    result discriminative on the lexically homogeneous synthetic
    corpus (0.8 would accept ~half of ALL pairs there) and makes the
    prefix genuinely short: |A| - ceil(0.9025|A|) + 1 ~ 0.1|A|."""
    import ray.data as rd

    ds = rd.read_parquet(f"{sf_dir}/documents.parquet",
                         columns=["doc_id", "text"])
    return cosine_simjoin_pairs(ds, tp=19, tq=20)


def docs_golden_record(sf_dir: str):
    """MDM-style golden-record build: one merged survivor per near-dup
    cluster, each attribute by its own survivorship rule — n_members
    count, n_chars_max = max over members, lang_mode = most frequent
    member lang (tie: lexicographic min), text_md5 = md5 of the
    LONGEST member text (tie: min doc_id). Singleton docs form their
    own cluster. Pair source is the oracled exact-Jaccard list (the
    same source docs_jaccard_clusters verifies), clustering is the
    oracled min-label CC; the merge itself is one cluster-keyed
    co-location with a vectorized per-partition fold — only the one
    survivor text per cluster is hashed, never every member."""
    import polars as pl
    import ray.data as rd

    from .relational import partitioned_map_groups
    from .text import md5_hex

    docs = rd.read_parquet(f"{sf_dir}/documents.parquet",
                           columns=["doc_id", "text", "lang", "n_chars"])
    pairs = ngram_jaccard_pairs(
        rd.read_parquet(f"{sf_dir}/documents.parquet",
                        columns=["doc_id", "text"]),
        threshold=0.7, shingle=1)
    assign = dedup_clusters(pairs)

    from .relational import copartitioned_map

    def prep_docs(t: pa.Table) -> pa.Table:
        return pa.table({
            "doc_id": t.column("doc_id"),
            "cluster_id": pa.nulls(t.num_rows, pa.int64()),
            "text": t.column("text"),
            "lang": t.column("lang"),
            "n_chars": t.column("n_chars").cast(pa.int64())})

    def prep_assign(t: pa.Table) -> pa.Table:
        n = t.num_rows
        return pa.table({
            "doc_id": t.column("doc_id"),
            "cluster_id": t.column("cluster_id").cast(pa.int64()),
            "text": pa.nulls(n, pa.string()),
            "lang": pa.nulls(n, pa.string()),
            "n_chars": pa.nulls(n, pa.int64())})

    def attach(parts):
        d, a = parts
        if d.num_rows == 0:
            return pa.table({
                "cluster_id": pa.array([], pa.int64()),
                "doc_id": pa.array([], pa.int64()),
                "text": pa.array([], pa.string()),
                "lang": pa.array([], pa.string()),
                "n_chars": pa.array([], pa.int64())})
        idx = pc.index_in(d.column("doc_id"),
                          value_set=a.column("doc_id").combine_chunks())
        cl = pc.take(a.column("cluster_id").combine_chunks(), idx)
        cl = pc.fill_null(cl, pa.scalar(-1, pa.int64()))
        cl = pc.if_else(pc.equal(cl, pa.scalar(-1, pa.int64())),
                        d.column("doc_id").combine_chunks()
                        if isinstance(d.column("doc_id"),
                                      pa.ChunkedArray)
                        else d.column("doc_id"), cl)
        return pa.table({"cluster_id": cl,
                         "doc_id": d.column("doc_id"),
                         "text": d.column("text"),
                         "lang": d.column("lang"),
                         "n_chars": d.column("n_chars")})

    merged = copartitioned_map([(docs, prep_docs), (assign, prep_assign)],
                               "doc_id", attach)

    def fold(part: pa.Table) -> pa.Table:
        if part.num_rows == 0:
            return pa.table({
                "cluster_id": pa.array([], pa.int64()),
                "n_members": pa.array([], pa.int64()),
                "n_chars_max": pa.array([], pa.int64()),
                "lang_mode": pa.array([], pa.string()),
                "text_md5": pa.array([], pa.string())})
        df = pl.from_arrow(part).with_columns(
            pl.col("text").str.len_chars().cast(pl.Int64).alias("tl"))
        g = df.group_by("cluster_id").agg([
            pl.len().cast(pl.Int64).alias("n_members"),
            pl.col("n_chars").max().alias("n_chars_max")])
        lm = (df.group_by(["cluster_id", "lang"])
              .agg(pl.len().alias("c"))
              .sort(["cluster_id", "c", "lang"],
                    descending=[False, True, False])
              .group_by("cluster_id", maintain_order=True).first()
              .select(["cluster_id", pl.col("lang").alias("lang_mode")]))
        tx = (df.sort(["cluster_id", "tl", "doc_id"],
                      descending=[False, True, False])
              .group_by("cluster_id", maintain_order=True).first()
              .select(["cluster_id", "text"]))
        tx = tx.with_columns(pl.Series(
            "text_md5", md5_hex(tx["text"].to_list())))
        out = (g.join(lm, on="cluster_id")
               .join(tx.select(["cluster_id", "text_md5"]),
                     on="cluster_id")
               .sort("cluster_id"))
        return out.to_arrow().cast(pa.schema([
            ("cluster_id", pa.int64()), ("n_members", pa.int64()),
            ("n_chars_max", pa.int64()), ("lang_mode", pa.string()),
            ("text_md5", pa.string())]))

    return partitioned_map_groups(merged, "cluster_id", fold)


def _doc_tf_table(batch: pa.Table) -> pa.Table:
    """(doc_id, th, tf, n2) exploded term-frequency rows: whitespace
    split, 64-bit token hashes, per-doc (token, count) fold and the
    doc's squared L2 norm n2 = sum(tf^2) — all via one lexsort +
    reduceat."""
    from .sketch import _hash64

    toks = pc.split_pattern(batch.column("text"), pattern=" ")
    flat = pc.list_flatten(toks).combine_chunks()
    parents = pc.list_parent_indices(toks).to_numpy()
    flat_d = flat.dictionary_encode()
    if isinstance(flat_d, pa.ChunkedArray):
        flat_d = flat_d.combine_chunks()
    codes = flat_d.indices.to_numpy(zero_copy_only=False).astype(np.int64)
    th = _hash64(flat_d.dictionary.to_numpy(zero_copy_only=False))[codes]
    doc = batch.column("doc_id").to_numpy()[parents]
    order = np.lexsort((th, doc))
    d_s, t_s = doc[order], th[order]
    new = np.ones(d_s.size, bool)
    new[1:] = (d_s[1:] != d_s[:-1]) | (t_s[1:] != t_s[:-1])
    starts = np.flatnonzero(new)
    ends = np.concatenate((starts[1:], [d_s.size])) if starts.size \
        else starts
    tf = (ends - starts).astype(np.int64)
    d_u, t_u = d_s[starts], t_s[starts]
    dnew = np.ones(d_u.size, bool)
    dnew[1:] = d_u[1:] != d_u[:-1]
    dstarts = np.flatnonzero(dnew)
    dends = np.concatenate((dstarts[1:], [d_u.size])) if dstarts.size \
        else dstarts
    n2seg = np.add.reduceat(tf * tf, dstarts) if d_u.size \
        else np.zeros(0, np.int64)
    n2 = np.repeat(n2seg, dends - dstarts)
    return pa.table({
        "doc_id": pa.array(d_u, pa.int64()),
        "th": pa.array(t_u.view(np.int64), pa.int64()),
        "tf": pa.array(tf, pa.int64()),
        "n2": pa.array(n2, pa.int64())})


def _tf_prefix_fold(part: pa.Table, t2n: int, t2d: int) -> pa.Table:
    """Per-doc t-prefix emission for the tf-weighted simjoin (runs per
    doc-keyed partition distributed, or once over the whole slim token
    table under the broadcast gate — same bytes either way)."""
    if part.num_rows == 0:
        return pa.table({"th": pa.array([], pa.int64()),
                         "doc_id": pa.array([], pa.int64()),
                         "n2": pa.array([], pa.int64()),
                         "suff": pa.array([], pa.int64())})
    d = part.column("doc_id").to_numpy()
    t = part.column("th").to_numpy()
    f = part.column("df").to_numpy()
    tf = part.column("tf").to_numpy()
    n2 = part.column("n2").to_numpy()
    order = np.lexsort((t, f, d))   # per doc: ascending (df, th)
    d_s, t_s = d[order], t[order]
    tf_s, n2_s = tf[order], n2[order]
    bounds = np.flatnonzero(np.diff(d_s)) + 1
    starts = np.concatenate(([0], bounds))
    seglen = np.diff(np.concatenate((starts, [d_s.size])))
    segstart = np.repeat(starts, seglen)
    sq = tf_s * tf_s
    csum = np.cumsum(sq)
    base = np.concatenate(([0], csum))[segstart]
    pre = np.concatenate(([0], csum))[
        np.arange(d_s.size)] - base   # mass strictly before pos
    suffix = n2_s - pre
    keep = t2d * suffix >= t2n * n2_s
    # each prefix row carries its positional suffix mass: inside a
    # bucket for token w, cos <= sqrt(suff_a*suff_b/(n2a*n2b)), so
    # tq^2*suff_a*suff_b >= tp^2*n2a*n2b is a VALID extra prune —
    # exact at the pair's minimal shared token, whose bucket always
    # generates it (L2AP's remscore bound)
    return pa.table({"th": pa.array(t_s[keep], pa.int64()),
                     "doc_id": pa.array(d_s[keep], pa.int64()),
                     "n2": pa.array(n2_s[keep], pa.int64()),
                     "suff": pa.array(suffix[keep], pa.int64())})


def _ratio_run_pairs(t: np.ndarray, num: np.ndarray, den: np.ndarray,
                     t2n: int, t2d: int):
    """O(output) in-bucket candidate generation for predicates of the
    multiplicative form (num_a/den_a)·(num_b/den_b) >= t^2 (the
    remscore prune in both simjoin variants): sort each th-bucket by
    the ratio DESCENDING, so each row's qualifying partners form a
    contiguous run right after it — emit only those runs instead of
    all O(bucket^2) pairs (the old shape allocated ~133M index pairs
    on sf0.1's hottest bucket to keep 11M). The run cut uses float
    ratios with a 1e-9 relative slack (float64 division/product error
    is a few ulps ~1e-16, so no exact-qualifying pair can fall outside
    the cut); callers re-filter the emitted pairs with the EXACT int64
    predicate, so the slack only costs a few spurious candidates.
    Returns (order, ia, ib): positions into the order-sorted arrays."""
    r = num.astype(np.float64) / den.astype(np.float64)
    order = np.lexsort((-r, t))
    r_s = r[order]
    t_s = t[order]
    bounds = np.flatnonzero(np.diff(t_s)) + 1
    bstarts = np.concatenate(([0], bounds))
    bends = np.concatenate((bounds, [t_s.size])) if t_s.size \
        else bstarts
    tsq = (t2n / t2d) * (1.0 - 1e-9)
    succ = np.zeros(t_s.size, np.int64)
    for s, e in zip(bstarts.tolist(), bends.tolist()):
        rr = r_s[s:e]
        # count of j in bucket with rr_j >= tsq / rr_i (rr descending)
        cnt = np.searchsorted(-rr, -(tsq / rr), side="right")
        succ[s:e] = np.maximum(0, cnt - np.arange(1, e - s + 1))
    total = int(succ.sum())
    if total == 0:
        return order, np.zeros(0, np.int64), np.zeros(0, np.int64)
    elem = np.arange(t_s.size, dtype=np.int64)
    first = np.repeat(elem, succ)
    grp_start = np.cumsum(succ) - succ
    off = np.arange(total, dtype=np.int64) - np.repeat(grp_start, succ)
    return order, first, first + off + 1


def _tf_bucket_pairs(part: pa.Table, t2n: int, t2d: int) -> pa.Table:
    """Candidate pairs within each prefix-token bucket, remscore-pruned
    (run-generated, then exact-int64 filtered); dedup within the fold
    via packed-key unique."""
    empty = pa.table({"pk": pa.array([], pa.int64()),
                      "na2": pa.array([], pa.int64()),
                      "nb2": pa.array([], pa.int64())})
    if part.num_rows == 0:
        return empty
    t = part.column("th").to_numpy()
    d = part.column("doc_id").to_numpy()
    n = part.column("n2").to_numpy()
    sf = part.column("suff").to_numpy()
    if d.size and d.max() >= COSINE_PAIR_ID_MAX:
        raise ValueError(
            "doc_id >= 2^32 breaks the packed pair key")
    order, ia, ib = _ratio_run_pairs(t, sf, n, t2n, t2d)
    if ia.size == 0:
        return empty
    d_s, n_s, sf_s = d[order], n[order], sf[order]
    da, db = d_s[ia], d_s[ib]
    na_, nb_ = n_s[ia], n_s[ib]
    ok = (da != db) & (t2d * sf_s[ia] * sf_s[ib]
                       >= t2n * na_ * nb_)
    da, db, na_, nb_ = da[ok], db[ok], na_[ok], nb_[ok]
    swap = da > db
    da2 = np.where(swap, db, da)
    db2 = np.where(swap, da, db)
    na2 = np.where(swap, nb_, na_)
    nb2 = np.where(swap, na_, nb_)
    pk = (da2.astype(np.uint64) << np.uint64(32)) \
        | db2.astype(np.uint64)
    pk, idx = np.unique(pk, return_index=True)
    return pa.table({"pk": pa.array(pk.view(np.int64), pa.int64()),
                     "na2": pa.array(na2[idx], pa.int64()),
                     "nb2": pa.array(nb2[idx], pa.int64())})


def _pair_first(part: pa.Table) -> pa.Table:
    """First row per packed pair key (all dupes carry identical
    payload columns, so 'first' is canonical)."""
    pk = part.column("pk").to_numpy()
    _, idx = np.unique(pk, return_index=True)
    return part.take(pa.array(np.sort(idx)))


def _bc_final_dedup(verified, empty: pa.Table, nparts: int):
    """Driver-side packed-key dedup of a VERIFIED pair stream (the
    broadcast-gate regime already held far larger intermediates on the
    driver; the verified set is bounded by near-dup density times the
    multi-bucket dup factor). Duplicate rows carry identical payloads,
    so first-per-key is canonical."""
    import ray.data as rd

    chunks = list(verified.iter_batches(batch_format="pyarrow"))
    if not chunks:
        return rd.from_arrow(empty)
    vt = pa.concat_tables(chunks)
    if vt.num_rows == 0:
        return rd.from_arrow(empty)
    pk = ((vt.column("doc_a").to_numpy().astype(np.uint64)
           << np.uint64(32))
          | vt.column("doc_b").to_numpy().astype(np.uint64))
    _, idx = np.unique(pk, return_index=True)
    final = vt.take(pa.array(np.sort(idx)))
    step = max(1, -(-final.num_rows // nparts))
    return rd.from_arrow([final.slice(i, step)
                          for i in range(0, final.num_rows, step)])


def _tf_unpack(t: pa.Table) -> pa.Table:
    pk = t.column("pk").to_numpy().view(np.uint64)
    return pa.table({
        "doc_a": pa.array((pk >> np.uint64(32)).astype(np.int64),
                          pa.int64()),
        "doc_b": pa.array((pk & np.uint64(0xFFFFFFFF))
                          .astype(np.int64), pa.int64()),
        "na2": t.column("na2"), "nb2": t.column("nb2")})


def _simjoin_tf_broadcast(tok, t2n: int, t2d: int, dense: str,
                          nparts: int):
    """Broadcast-gate regime of the tf simjoin: the slim (doc_id, th,
    tf, n2) token table fits on the driver (that is exactly what the
    gate asserts — the verify dict/matrix was ALREADY collected here),
    so candidate generation runs as ONE vectorized local pass through
    the SAME fold functions the distributed path runs per partition,
    instead of paying ~5 fixed-overhead exchanges (df fold + df join +
    doc/th/pk partitions) on a table this small (measured 38 -> ~8 s
    at sf0.1). Verification stays distributed: candidates re-shard and
    verify map-side against the dense matrix (small closed vocabulary,
    chunked exact-int64 einsum) or the per-doc (th, tf) dict."""
    import ray
    import ray.data as rd

    from ..broadcast import get_broadcast

    empty = pa.table({
        "doc_a": pa.array([], pa.int64()),
        "doc_b": pa.array([], pa.int64()),
        "dot": pa.array([], pa.int64()),
        "na2": pa.array([], pa.int64()),
        "nb2": pa.array([], pa.int64())})
    d_chunks, t_chunks, f_chunks, n_chunks = [], [], [], []
    for b in tok.iter_batches(batch_format="pyarrow"):
        d_chunks.append(b.column("doc_id").to_numpy())
        t_chunks.append(b.column("th").to_numpy())
        f_chunks.append(b.column("tf").to_numpy())
        n_chunks.append(b.column("n2").to_numpy())
    if not d_chunks:
        return rd.from_arrow(empty)
    d_all = np.concatenate(d_chunks)
    t_all = np.concatenate(t_chunks)
    f_all = np.concatenate(f_chunks)
    n_all = np.concatenate(n_chunks)
    order = np.argsort(d_all, kind="stable")
    d_all, t_all = d_all[order], t_all[order]
    f_all, n_all = f_all[order], n_all[order]
    # df attach via sorted-vocab searchsorted (equality only, so the
    # uint64 view's ordering is irrelevant to the result)
    tu = t_all.view(np.uint64)
    vocab, vdf = np.unique(tu, return_counts=True)
    part = pa.table({
        "doc_id": pa.array(d_all, pa.int64()),
        "th": pa.array(t_all, pa.int64()),
        "df": pa.array(vdf[np.searchsorted(vocab, tu)]
                       .astype(np.int64), pa.int64()),
        "tf": pa.array(f_all, pa.int64()),
        "n2": pa.array(n_all, pa.int64())})
    bounds = np.flatnonzero(np.diff(d_all)) + 1
    starts = np.concatenate(([0], bounds))
    ends = np.concatenate((bounds, [d_all.size]))

    dense_ok = False
    if dense != "off":
        # exactness bounds for the all-int64 vectorized path:
        # dot <= |vocab| * max_tf^2 =: D (einsum accumulation), and
        # both predicate sides <= max(t2n, t2d) * D^2 — guard the
        # worst case so no intermediate can wrap
        max_tf = int(f_all.max()) if f_all.size else 0
        dmax = vocab.size * max_tf * max_tf
        dense_ok = (vocab.size * starts.size <= DENSE_VERIFY_MAX_CELLS
                    and max(t2n, t2d) * dmax * dmax < (1 << 62))

    pre = _tf_prefix_fold(part, t2n, t2d)

    if dense_ok:
        # vectorized verify is cheaper per candidate than the exact
        # remscore filter + packed-key unique were (the degenerate
        # closed-vocab corpus keeps ~all generated pairs anyway), so
        # ship the RAW run-generated candidates straight to the dense
        # verify and dedup the verified (near-dup-density-bounded) set
        order2, ia, ib = _ratio_run_pairs(
            pre.column("th").to_numpy(), pre.column("suff").to_numpy(),
            pre.column("n2").to_numpy(), t2n, t2d)
        if ia.size == 0:
            return rd.from_arrow(empty)
        d_s = pre.column("doc_id").to_numpy()[order2]
        n_s = pre.column("n2").to_numpy()[order2]
        da, db = d_s[ia], d_s[ib]
        na_, nb_ = n_s[ia], n_s[ib]
        swap = da > db
        cand_tbl = pa.table({
            "doc_a": pa.array(np.where(swap, db, da), pa.int64()),
            "doc_b": pa.array(np.where(swap, da, db), pa.int64()),
            "na2": pa.array(np.where(swap, nb_, na_), pa.int64()),
            "nb2": pa.array(np.where(swap, na_, nb_), pa.int64())})
        step = max(1, -(-cand_tbl.num_rows // nparts))
        cands = rd.from_arrow([cand_tbl.slice(i, step)
                               for i in range(0, cand_tbl.num_rows,
                                              step)])

        seglen = ends - starts
        col = np.searchsorted(vocab, tu)
        row = np.repeat(np.arange(starts.size), seglen)
        mat = np.zeros((starts.size, vocab.size), np.int64)
        mat[row, col] = f_all
        uids = d_all[starts].copy()
        dref = ray.put((uids, mat))

        def verify_dense(batch: pa.Table, _ref=dref) -> pa.Table:
            u, m = get_broadcast(_ref)
            da = batch.column("doc_a").to_numpy()
            db = batch.column("doc_b").to_numpy()
            na_ = batch.column("na2").to_numpy()
            nb_ = batch.column("nb2").to_numpy()
            ra = np.searchsorted(u, da)
            rb = np.searchsorted(u, db)
            dots = np.empty(da.size, np.int64)
            chunk = max(1, (1 << 21) // max(1, m.shape[1]))
            for s in range(0, da.size, chunk):
                e = min(s + chunk, da.size)
                dots[s:e] = np.einsum("ij,ij->i", m[ra[s:e]],
                                      m[rb[s:e]])
            keep = t2d * dots * dots >= t2n * na_ * nb_
            return pa.table({
                "doc_a": pa.array(da[keep], pa.int64()),
                "doc_b": pa.array(db[keep], pa.int64()),
                "dot": pa.array(dots[keep], pa.int64()),
                "na2": pa.array(na_[keep], pa.int64()),
                "nb2": pa.array(nb_[keep], pa.int64())})

        verified = cands.map_batches(verify_dense,
                                     batch_format="pyarrow",
                                     zero_copy_batch=True)
        return _bc_final_dedup(verified, empty, nparts)

    # dict-loop verify (huge tf values or vocab over the cell cap):
    # the per-pair Python loop NEEDS the exact filter + packed-key
    # unique ahead of it, so reuse the full bucket fold here
    cand_tbl = _tf_unpack(_pair_first(
        _tf_bucket_pairs(pre, t2n, t2d)))
    if cand_tbl.num_rows == 0:
        return rd.from_arrow(empty)
    step = max(1, -(-cand_tbl.num_rows // nparts))
    cands = rd.from_arrow([cand_tbl.slice(i, step)
                           for i in range(0, cand_tbl.num_rows, step)])

    arrs: dict[int, tuple] = {}
    tu_sorted = t_all.view(np.uint64)
    for i, s in enumerate(starts.tolist()):
        arrs[int(d_all[s])] = (tu_sorted[s:ends[i]].copy(),
                               f_all[s:ends[i]].copy())
    ref = ray.put(arrs)

    def verify_bc(batch: pa.Table, _ref=ref) -> pa.Table:
        lists = get_broadcast(_ref)
        da = batch.column("doc_a").to_numpy()
        db = batch.column("doc_b").to_numpy()
        na_ = batch.column("na2").to_numpy()
        nb_ = batch.column("nb2").to_numpy()
        keep = np.zeros(da.size, bool)
        dots = np.zeros(da.size, np.int64)
        for i in range(da.size):
            tha, tfa = lists[int(da[i])]
            thb, tfb = lists[int(db[i])]
            _, ia, ib = np.intersect1d(tha, thb,
                                       assume_unique=True,
                                       return_indices=True)
            dot = int((tfa[ia] * tfb[ib]).sum())
            if t2d * dot * dot >= t2n * int(na_[i]) * int(nb_[i]):
                keep[i] = True
                dots[i] = dot
        return pa.table({
            "doc_a": pa.array(da[keep], pa.int64()),
            "doc_b": pa.array(db[keep], pa.int64()),
            "dot": pa.array(dots[keep], pa.int64()),
            "na2": pa.array(na_[keep], pa.int64()),
            "nb2": pa.array(nb_[keep], pa.int64())})

    return cands.map_batches(verify_bc, batch_format="pyarrow",
                             zero_copy_batch=True)


def cosine_simjoin_tf_pairs(ds, tp: int = 19, tq: int = 20,
                            verify: str = "auto", dense: str = "auto"):
    """tf-WEIGHTED exact cosine-threshold similarity join (the L2AP
    family, Anastasiu & Karypis 2014, reduced to the symmetric-prefix
    core): pairs with sum(tf_a*tf_b)/sqrt(n2_a*n2_b) >= tp/tq, where
    n2 is the squared L2 norm of the doc's term-frequency vector.
    Completeness: order the vocabulary by ascending df; for the
    SMALLEST shared token w*, cos(A,B) <= (|A_{>=w*}|/|A|)(|B_{>=w*}|
    /|B|); since each factor is <= 1, a qualifying pair needs BOTH
    suffix fractions >= t — so w* lies inside both docs' t-prefixes
    (positions while tq^2 * suffix_sq >= tp^2 * n2), and bucketing
    prefixes alone finds every pair. Verification is the exact integer
    dot product over per-doc (th, tf) blobs shipped by two hash joins;
    the threshold predicate tq^2*dot^2 >= tp^2*n2a*n2b never touches a
    double. In the binary special case the prefix reduces exactly to
    cosine_simjoin_pairs' count rule."""
    t2n, t2d = tp * tp, tq * tq
    nparts = _num_partitions()

    tok = _drop_empty_blocks(
        ds.map_batches(_doc_tf_table, batch_format="pyarrow",
                       zero_copy_batch=True).materialize())

    if _resolve_verify(verify, ds) == "broadcast":
        return _simjoin_tf_broadcast(tok, t2n, t2d, dense, nparts)

    def df_part(t: pa.Table) -> pa.Table:
        vc = t.column("th").value_counts()
        if isinstance(vc, pa.ChunkedArray):
            vc = vc.combine_chunks()
        return pa.table({"th": vc.field("values"),
                         "df": vc.field("counts").cast(pa.int64())})

    def df_sum(part: pa.Table) -> pa.Table:
        g = part.group_by("th").aggregate([("df", "sum")])
        return pa.table({"th": g.column("th"),
                         "df": g.column("df_sum").cast(pa.int64())})

    from .relational import partitioned_map_groups

    dft = _drop_empty_blocks(partitioned_map_groups(
        tok.map_batches(df_part, batch_format="pyarrow",
                        zero_copy_batch=True), "th", df_sum)
        .materialize())

    with_df = tok.join(dft, join_type="inner", num_partitions=nparts,
                       on=("th",))

    prefixes = partitioned_map_groups(
        with_df, "doc_id", lambda p: _tf_prefix_fold(p, t2n, t2d))

    raw_pairs = partitioned_map_groups(
        prefixes, "th", lambda p: _tf_bucket_pairs(p, t2n, t2d))

    cands = partitioned_map_groups(raw_pairs, "pk", _pair_first)

    cands = _drop_empty_blocks(
        cands.map_batches(_tf_unpack, batch_format="pyarrow",
                          zero_copy_batch=True).materialize())

    def doc_blobs(t: pa.Table, name: str) -> pa.Table:
        d = t.column("doc_id").to_numpy()
        th = t.column("th").to_numpy()
        tf = t.column("tf").to_numpy()
        if d.size == 0:
            return pa.table({
                name: pa.array([], pa.int64()),
                f"_tv_{name}": pa.array([], pa.binary())})
        bounds = np.flatnonzero(np.diff(d)) + 1
        starts = np.concatenate(([0], bounds))
        seglen = np.diff(np.concatenate((starts, [d.size])))
        # blob layout: n * (8B th) then n * (8B tf), both doc-local
        packed = bytearray()
        offs = [0]
        for s, ln in zip(starts, seglen):
            packed += th[s:s + ln].astype("<u8").tobytes()
            packed += tf[s:s + ln].astype("<i8").tobytes()
            offs.append(len(packed))
        blob = pa.Array.from_buffers(
            pa.binary(), starts.size,
            [None, pa.py_buffer(np.array(offs, np.int32).tobytes()),
             pa.py_buffer(bytes(packed))])
        return pa.table({name: pa.array(d[starts], pa.int64()),
                         f"_tv_{name}": blob})

    lists_a = tok.map_batches(lambda t: doc_blobs(t, "doc_a"),
                              batch_format="pyarrow",
                              zero_copy_batch=True)
    lists_b = tok.map_batches(lambda t: doc_blobs(t, "doc_b"),
                              batch_format="pyarrow",
                              zero_copy_batch=True)
    j = cands.join(lists_a, join_type="inner", num_partitions=nparts,
                   on=("doc_a",))
    j = _drop_empty_blocks(j.materialize())
    j = j.join(lists_b, join_type="inner", num_partitions=nparts,
               on=("doc_b",))

    def verify(batch: pa.Table) -> pa.Table:
        out = {"doc_a": [], "doc_b": [], "dot": [], "na2": [],
               "nb2": []}
        la = batch.column("_tv_doc_a")
        lb = batch.column("_tv_doc_b")
        da = batch.column("doc_a").to_numpy()
        db = batch.column("doc_b").to_numpy()
        na_ = batch.column("na2").to_numpy()
        nb_ = batch.column("nb2").to_numpy()
        for i in range(batch.num_rows):
            ba = la[i].as_py()
            bb = lb[i].as_py()
            n_a = len(ba) // 16
            n_b = len(bb) // 16
            tha = np.frombuffer(ba, dtype=np.uint64, count=n_a)
            tfa = np.frombuffer(ba, dtype=np.int64, offset=8 * n_a)
            thb = np.frombuffer(bb, dtype=np.uint64, count=n_b)
            tfb = np.frombuffer(bb, dtype=np.int64, offset=8 * n_b)
            _, ia, ib = np.intersect1d(tha, thb, assume_unique=True,
                                       return_indices=True)
            dot = int((tfa[ia] * tfb[ib]).sum())
            if t2d * dot * dot >= t2n * int(na_[i]) * int(nb_[i]):
                out["doc_a"].append(int(da[i]))
                out["doc_b"].append(int(db[i]))
                out["dot"].append(dot)
                out["na2"].append(int(na_[i]))
                out["nb2"].append(int(nb_[i]))
        return pa.table({
            "doc_a": pa.array(out["doc_a"], pa.int64()),
            "doc_b": pa.array(out["doc_b"], pa.int64()),
            "dot": pa.array(out["dot"], pa.int64()),
            "na2": pa.array(out["na2"], pa.int64()),
            "nb2": pa.array(out["nb2"], pa.int64())})

    return j.map_batches(verify, batch_format="pyarrow",
                         zero_copy_batch=True)


def docs_cosine_simjoin_tf(sf_dir: str):
    """Query surface: exact tf-weighted cosine >= 0.95 pairs.

    Cost note: the synthetic documents table has a CLOSED ~31-term
    vocabulary, so every bucketing strategy degenerates toward
    all-pairs there (the honest exact-join cost on a corpus where
    every doc shares every term; the remscore prune and prefix filter
    are what keep realistic corpora near-linear, as the simjoin soak's
    500k-doc run shows). The broadcast-verify swap halved it
    (48 -> 24 s at sf0.1) and the local-candgen + dense-matrix
    broadcast regime (_simjoin_tf_broadcast) halved it again, so it
    is now in the timed bench set."""
    import ray.data as rd

    ds = rd.read_parquet(f"{sf_dir}/documents.parquet",
                         columns=["doc_id", "text"])
    return cosine_simjoin_tf_pairs(ds, tp=19, tq=20)
