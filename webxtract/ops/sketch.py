"""Mergeable sketch aggregates — the approximate-aggregation pattern for
corpus-scale stats (ray_guide "Aggregation at scale": emit one serialized
sketch per batch, merge in a tiny second stage).

HyperLogLog (Flajolet et al. 2007) from scratch on numpy: register
array per batch -> elementwise-max merge -> bias-corrected estimate.
Standard error ~1.04/sqrt(2^p); p=12 -> ~1.6%.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc


class HyperLogLog:
    __slots__ = ("p", "m", "registers")

    def __init__(self, p: int = 12, registers: np.ndarray | None = None):
        self.p = p
        self.m = 1 << p
        self.registers = (registers if registers is not None
                          else np.zeros(self.m, dtype=np.uint8))

    def add_hashes(self, h: np.ndarray) -> None:
        """Vectorized insert of uint64 hashes."""
        h = h.astype(np.uint64, copy=False)
        idx = (h >> np.uint64(64 - self.p)).astype(np.int64)
        rest = (h << np.uint64(self.p)) | np.uint64((1 << self.p) - 1)
        # rank = leading zeros of `rest` + 1 (bounded by 64-p+1)
        nlz = np.zeros(len(h), dtype=np.uint8)
        mask = np.uint64(1) << np.uint64(63)
        cur = rest.copy()
        done = np.zeros(len(h), dtype=bool)
        for r in range(64 - self.p + 1):
            top = (cur & mask) != 0
            newly = top & ~done
            nlz[newly] = r + 1
            done |= top
            if done.all():
                break
            cur = cur << np.uint64(1)
        np.maximum.at(self.registers, idx, nlz)

    def merge(self, other: "HyperLogLog") -> "HyperLogLog":
        assert self.p == other.p
        return HyperLogLog(self.p, np.maximum(self.registers, other.registers))

    def estimate(self) -> float:
        m = float(self.m)
        inv = np.power(2.0, -self.registers.astype(np.float64))
        alpha = 0.7213 / (1.0 + 1.079 / m)
        e = alpha * m * m / inv.sum()
        if e <= 2.5 * m:  # small-range correction
            zeros = int((self.registers == 0).sum())
            if zeros:
                e = m * np.log(m / zeros)
        return float(e)

    def serialize(self) -> bytes:
        return self.registers.tobytes()

    @classmethod
    def deserialize(cls, raw: bytes, p: int = 12) -> "HyperLogLog":
        return cls(p, np.frombuffer(raw, dtype=np.uint8).copy())


_FNV_OFFSET = np.uint64(0xCBF29CE484222325)
_FNV_PRIME = np.uint64(0x100000001B3)


def _finalize64(h: np.ndarray) -> np.ndarray:
    """Vectorized murmur3 fmix64 (FNV's high bits avalanche poorly and
    HLL indexes by the TOP p bits)."""
    with np.errstate(over="ignore"):
        h = h ^ (h >> np.uint64(33))
        h = h * np.uint64(0xFF51AFD7ED558CCD)
        h = h ^ (h >> np.uint64(33))
        h = h * np.uint64(0xC4CEB9FE1A85EC53)
        h = h ^ (h >> np.uint64(33))
    return h


def _hash64(values) -> np.ndarray:
    """Deterministic 64-bit hashes of str(v): FNV-1a + fmix64 (no
    process-salted hash()). Vectorized: values are rendered to a
    fixed-width numpy byte matrix and FNV runs one vectorized step per
    BYTE POSITION (~width ops total) instead of a Python loop per byte.
    Falls back to the scalar loop for non-ASCII-representable input;
    both paths produce identical hashes."""
    n = len(values)
    if n == 0:
        return np.empty(0, dtype=np.uint64)
    try:
        arr = np.asarray(values)
        if arr.dtype == object or arr.dtype.kind in "US":
            s = arr.astype("S")  # raises UnicodeEncodeError on non-ASCII
        elif arr.dtype.kind in "iu":
            s = arr.astype("U").astype("S")  # str(int) == np int render
        else:
            raise TypeError  # floats etc: np repr may differ from str()
    except (UnicodeEncodeError, TypeError, ValueError):
        return _hash64_scalar(values)
    width = s.dtype.itemsize
    m = np.ascontiguousarray(s).view(np.uint8).reshape(n, width)
    lengths = (m != 0).sum(axis=1)  # str() output has no NUL bytes
    h = np.full(n, _FNV_OFFSET, dtype=np.uint64)
    with np.errstate(over="ignore"):
        for j in range(width):
            # branchless: rows already past their end keep h unchanged
            upd = (h ^ m[:, j].astype(np.uint64)) * _FNV_PRIME
            h = np.where(lengths > j, upd, h)
    return _finalize64(h)


def _hash64_scalar(values) -> np.ndarray:
    M = 0xFFFFFFFFFFFFFFFF
    out = np.empty(len(values), dtype=np.uint64)
    for i, v in enumerate(values):
        h = 0xCBF29CE484222325
        for b in str(v).encode("utf-8"):
            h = ((h ^ b) * 0x100000001B3) & M
        out[i] = h
    return _finalize64(out.copy())


def approx_distinct(ds, column: str, p: int = 12) -> float:
    """Approximate COUNT(DISTINCT column): one HLL sketch per batch
    (map_batches emits a single serialized-registers row), merged on the
    driver (sketch size 2^p bytes, merge is elementwise max — the
    shuffle carries sketches, never values)."""
    def sketch_batch(batch: pa.Table) -> pa.Table:
        hll = HyperLogLog(p)
        col = batch.column(column)
        if col.null_count == 0:  # numeric: zero-copy numpy, vectorized
            vals = col.to_numpy()
        else:  # nulls hash as str(None) like the original scalar path
            vals = col.to_pylist()
        hll.add_hashes(_hash64(vals))
        return pa.table({"sketch": pa.array([hll.serialize()], pa.binary())})

    merged = HyperLogLog(p)
    for b in ds.map_batches(sketch_batch, batch_format="pyarrow",
                            zero_copy_batch=True).iter_batches(
                                batch_format="pyarrow"):
        for raw in b.column("sketch").to_pylist():
            merged = merged.merge(HyperLogLog.deserialize(raw, p))
    return merged.estimate()


# --- Bloom filter -----------------------------------------------------------

class BloomFilter:
    """Vectorized Bloom filter over a numpy bit array — the named
    corpus-scale replacement for broadcasting raw key SETS in
    semi/anti-join prefilters (ops/relational.py): ~10 bits/key instead
    of the keys themselves, mergeable via OR.

    `might_contain` has NO false negatives; false-positive rate
    ~(1-e^{-kn/m})^k (~1% at 10 bits/key, k=7) — so a Bloom PREfilter
    must be followed by an exact stage for anti-join semantics (a semi
    join only over-keeps). All hashing reuses the deterministic
    vectorized _hash64; the k indexes derive via double hashing
    (h1 + i*h2, Kirsch-Mitzenmacher)."""

    __slots__ = ("m", "k", "bits")

    def __init__(self, expected_n: int, bits_per_key: int = 10,
                 bits: np.ndarray | None = None):
        self.m = max(64, int(expected_n * bits_per_key))
        self.k = max(1, int(round(0.693 * bits_per_key)))
        nwords = (self.m + 63) // 64
        self.bits = (bits if bits is not None
                     else np.zeros(nwords, dtype=np.uint64))

    def _positions(self, values) -> np.ndarray:
        h1 = _hash64(values)
        h2 = (h1 >> np.uint64(32)) | (h1 << np.uint64(32))  # rotate
        h2 = _finalize64(h2)
        i = np.arange(self.k, dtype=np.uint64)[:, None]
        with np.errstate(over="ignore"):
            return ((h1[None, :] + i * h2[None, :])
                    % np.uint64(self.m))  # (k, n)

    def add(self, values) -> None:
        pos = self._positions(values).ravel()
        np.bitwise_or.at(self.bits, (pos >> np.uint64(6)).astype(np.int64),
                         np.uint64(1) << (pos & np.uint64(63)))

    def might_contain(self, values) -> np.ndarray:
        pos = self._positions(values)
        word = self.bits[(pos >> np.uint64(6)).astype(np.int64)]
        hit = (word >> (pos & np.uint64(63))) & np.uint64(1)
        return hit.all(axis=0).astype(bool)

    def merge(self, other: "BloomFilter") -> "BloomFilter":
        assert self.m == other.m and self.k == other.k
        out = BloomFilter(1)
        out.m, out.k = self.m, self.k
        out.bits = np.bitwise_or(self.bits, other.bits)
        return out

    def serialize(self) -> bytes:
        head = np.array([self.m, self.k], np.int64).tobytes()
        return head + self.bits.tobytes()

    @classmethod
    def deserialize(cls, raw: bytes) -> "BloomFilter":
        m, k = (int(x) for x in np.frombuffer(raw[:16], np.int64))
        out = cls(1)
        out.m, out.k = m, k
        out.bits = np.frombuffer(raw[16:], np.uint64).copy()
        return out


def bloom_ref_of(ds, col: str, expected_n: int):
    """Build a Bloom filter over ``ds[col]`` — per-batch partial
    bitmaps OR-merged on the driver — and return a ray.put of the
    serialized filter. Driver memory is the fixed bitmap size
    (expected_n * bits_per_key), never the column bytes. The single
    shared implementation of the build-and-merge fold used by the
    incremental-ingest dedup and both span-dedup join paths."""
    import ray

    def partial(batch: pa.Table) -> pa.Table:
        bf = BloomFilter(max(expected_n, 1))
        bf.add(batch.column(col).to_pylist())
        return pa.table({"bloom": pa.array([bf.serialize()], pa.binary())})

    bf_all = None
    for b in ds.map_batches(partial, batch_format="pyarrow",
                            zero_copy_batch=True) \
            .iter_batches(batch_format="pyarrow"):
        for raw in b.column("bloom").to_pylist():
            cur = BloomFilter.deserialize(raw)
            bf_all = cur if bf_all is None else bf_all.merge(cur)
    return ray.put((bf_all or BloomFilter(1)).serialize())


def bloom_semi_join_stage(bloom_ref, key: str):
    """Approximate semi-join prefilter: keep rows whose key MIGHT be in
    the broadcast Bloom filter (no false negatives — safe before an
    exact semi join; over-keeps ~1% at default sizing)."""
    import pyarrow as _pa

    def fn(batch: _pa.Table) -> _pa.Table:
        from ..broadcast import get_broadcast

        bf = get_broadcast(bloom_ref)
        col = batch.column(key)
        vals = (col.to_numpy() if col.null_count == 0 else col.to_pylist())
        return batch.filter(_pa.array(bf.might_contain(vals)))

    return fn


# --- KLL-style mergeable quantile sketch ----------------------------------

class KLLSketch:
    """Mergeable quantile sketch (Karnin-Lang-Liberty compactor scheme,
    KLL16 — public algorithm): level ``h`` holds items of weight 2^h; an
    over-capacity level sorts itself and promotes every other item.
    Deterministic alternating-offset compaction (no RNG) — rank error
    stays O(1/k) empirically; merge = level-wise concatenation + the
    same compaction, so per-batch partial sketches combine exactly like
    HLL registers (the approximate-grouped-quantile scale path named by
    events_value_median)."""

    __slots__ = ("k", "levels", "_flip", "count")

    def __init__(self, k: int = 256):
        self.k = k
        self.levels: list[np.ndarray] = [np.empty(0, np.float64)]
        self._flip = 0
        self.count = 0

    def _capacity(self, lvl: int) -> int:
        # lower levels shrink geometrically (2/3 schedule per KLL16)
        h = len(self.levels)
        return max(2, int(self.k * (2.0 / 3.0) ** (h - 1 - lvl)))

    def add(self, values: np.ndarray) -> None:
        v = np.asarray(values, np.float64)
        v = v[~np.isnan(v)]
        if v.size == 0:
            return
        self.count += int(v.size)
        self.levels[0] = np.concatenate([self.levels[0], v])
        self._compress()

    def _compress(self) -> None:
        while True:
            total_cap = sum(self._capacity(i) for i in range(len(self.levels)))
            if sum(lv.size for lv in self.levels) <= total_cap:
                return
            for i, lv in enumerate(self.levels):
                if lv.size > self._capacity(i):
                    if i + 1 == len(self.levels):
                        self.levels.append(np.empty(0, np.float64))
                    s = np.sort(lv)
                    keep = s[self._flip::2]
                    self._flip ^= 1
                    self.levels[i] = np.empty(0, np.float64)
                    self.levels[i + 1] = np.concatenate(
                        [self.levels[i + 1], keep])
                    break
            else:
                return

    def merge(self, other: "KLLSketch") -> "KLLSketch":
        assert self.k == other.k
        out = KLLSketch(self.k)
        n = max(len(self.levels), len(other.levels))
        out.levels = []
        for i in range(n):
            a = self.levels[i] if i < len(self.levels) else np.empty(0)
            b = other.levels[i] if i < len(other.levels) else np.empty(0)
            out.levels.append(np.concatenate([a, b]).astype(np.float64))
        out.count = self.count + other.count
        out._flip = self._flip ^ other._flip
        out._compress()
        return out

    def quantile(self, q: float) -> float:
        vals, wts = [], []
        for i, lv in enumerate(self.levels):
            if lv.size:
                vals.append(lv)
                wts.append(np.full(lv.size, 1 << i, np.int64))
        if not vals:
            return float("nan")
        v = np.concatenate(vals)
        w = np.concatenate(wts)
        order = np.argsort(v, kind="mergesort")
        v, w = v[order], w[order]
        cum = np.cumsum(w)
        target = q * cum[-1]
        return float(v[np.searchsorted(cum, target, side="left")])

    def serialize(self) -> bytes:
        sizes = np.array([lv.size for lv in self.levels], np.int64)
        head = np.array([self.k, self._flip, self.count, sizes.size],
                        np.int64)
        body = [lv.astype(np.float64).tobytes() for lv in self.levels]
        return head.tobytes() + sizes.tobytes() + b"".join(body)

    @classmethod
    def deserialize(cls, raw: bytes) -> "KLLSketch":
        head = np.frombuffer(raw[:32], np.int64)
        k, flip, count, n_lv = (int(x) for x in head)
        sizes = np.frombuffer(raw[32:32 + 8 * n_lv], np.int64)
        out = cls(k)
        out._flip, out.count = flip, count
        out.levels = []
        off = 32 + 8 * n_lv
        for s in sizes:
            out.levels.append(
                np.frombuffer(raw[off:off + 8 * s], np.float64).copy())
            off += 8 * int(s)
        return out


def grouped_quantile_sketch(sf_dir: str, column: str = "value",
                            group_col: str = "event_type",
                            q: float = 0.5, k: int = 256):
    """Approximate grouped quantile over events: one KLL sketch per
    group per batch (the exchange carries sketches, never values), then
    a per-group merge + quantile readout. The scale-out companion to
    the exact events_value_median (which must co-locate every group
    value)."""
    import ray.data as rd

    ds = rd.read_parquet(f"{sf_dir}/events.parquet",
                         columns=[group_col, column])

    def sketch_batch(batch: pa.Table) -> pa.Table:
        import polars as pl

        df = pl.from_arrow(batch)
        keys, blobs = [], []
        for (key,), sub in df.group_by(group_col):
            s = KLLSketch(k)
            s.add(sub[column].to_numpy())
            keys.append(key)
            blobs.append(s.serialize())
        return pa.table({group_col: pa.array(keys, pa.string()),
                         "sketch": pa.array(blobs, pa.binary())})

    partials = ds.map_batches(sketch_batch, batch_format="pyarrow",
                              zero_copy_batch=True)

    def merge_group(g: pa.Table) -> pa.Table:
        merged = None
        for raw in g.column("sketch").to_pylist():
            s = KLLSketch.deserialize(raw)
            merged = s if merged is None else merged.merge(s)
        return pa.table({
            group_col: g.column(group_col).slice(0, 1),
            "p_value": pa.array([round(merged.quantile(q), 6)],
                                pa.float64()),
            "n": pa.array([merged.count], pa.int64()),
        })

    return partials.groupby(group_col).map_groups(merge_group,
                                                  batch_format="pyarrow")


# --- Misra-Gries heavy hitters ---------------------------------------------

def _mg_compress(terms: np.ndarray, counts: np.ndarray,
                 counters: int) -> tuple[np.ndarray, np.ndarray]:
    """Compress a (term, count) summary to <= ``counters`` entries by
    subtracting the (counters+1)-th largest count from every entry and
    dropping the non-positive ones (mergeable Misra-Gries reduction,
    Agarwal et al., "Mergeable Summaries"). Each compression lowers
    every surviving count by at most the subtracted value; the total
    undercount after any merge tree is <= N/(counters+1)."""
    if len(counts) <= counters:
        return terms, counts
    kth = np.partition(counts, len(counts) - counters - 1)[
        len(counts) - counters - 1]
    adj = counts - kth
    keep = adj > 0
    return terms[keep], adj[keep]


def heavy_hitters(ds, explode_fn, counters: int = 400, k: int = 50):
    """Approximate top-k heavy hitters with a mergeable Misra-Gries
    summary: each batch reduces to <= ``counters`` (term, count) rows
    (``explode_fn``: batch -> polars (term, n) counts), one grouped Sum
    collapses the partials, and a single final task re-compresses and
    takes the top k (count desc, term asc). The exchange carries
    O(batches x counters) rows — independent of corpus size; counts are
    UNDERestimates by at most N/(counters+1), so the true top k are
    retained whenever their counts clear that gap (accuracy gate:
    tests/test_ops.py)."""
    from ray.data.aggregate import Sum

    def partial(batch: pa.Table) -> pa.Table:
        out = explode_fn(batch)  # arrow (term: string, n: int64)
        terms = np.asarray(out.column("term").to_pylist(), dtype=object)
        counts = out.column("n").to_numpy()
        terms, counts = _mg_compress(terms, counts, counters)
        return pa.table({"term": pa.array(list(terms), pa.string()),
                         "n": pa.array(counts, pa.int64())})

    agg = ds.map_batches(partial, batch_format="pyarrow",
                         zero_copy_batch=True) \
        .groupby("term").aggregate(Sum("n", alias_name="n"))

    def final(t: pa.Table) -> pa.Table:
        terms = np.asarray(t.column("term").to_pylist(), dtype=object)
        counts = t.column("n").to_numpy()
        terms, counts = _mg_compress(terms, counts, counters)
        out = pa.table({"term": pa.array(list(terms), pa.string()),
                        "n": pa.array(counts, pa.int64())})
        idx = pc.sort_indices(out, sort_keys=[
            ("n", "descending"), ("term", "ascending")])
        return out.take(idx[:k])

    return agg.repartition(1).map_batches(final, batch_format="pyarrow")


def docs_terms_mg(sf_dir: str, counters: int = 400, k: int = 50):
    """Approximate top-k corpus terms via mergeable Misra-Gries — the
    bounded-memory scale path named by docs_term_counts (whose exact
    exchange carries every distinct term per batch; this one never
    exceeds ``counters`` rows per batch regardless of vocabulary).
    Rows-only; accuracy vs the exact oracled twin is pytest-gated."""
    import ray.data as rd

    ds = rd.read_parquet(f"{sf_dir}/documents.parquet", columns=["text"])

    def explode(batch: pa.Table) -> pa.Table:
        import polars as pl

        df = pl.from_arrow(batch)
        out = (df.select(pl.col("text").str.split(" ").alias("term"))
               .explode("term").group_by("term").len().rename({"len": "n"}))
        return out.to_arrow().cast(pa.schema([
            ("term", pa.string()), ("n", pa.int64())]))

    return heavy_hitters(ds, explode, counters=counters, k=k)


def exact_distinct_users(sf_dir: str):
    """Exact COUNT(DISTINCT user_id) per event_type (oracle-checked):
    pre-reduced per batch (unique pairs) before the grouped distinct."""
    import ray.data as rd

    ds = rd.read_parquet(f"{sf_dir}/events.parquet",
                         columns=["event_type", "user_id"])

    def uniq_pairs(batch: pa.Table) -> pa.Table:
        return batch.group_by(["event_type", "user_id"]).aggregate([])

    pairs = ds.map_batches(uniq_pairs, batch_format="pyarrow",
                           zero_copy_batch=True)

    # second distinct after the exchange, vectorized per event_type
    # group (a per-(type,user) map_groups would pay Python overhead per
    # distinct pair — the group count here is #event_types, bounded)
    def distinct_users(g: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        n = pc.count_distinct(g.column("user_id")).as_py()
        return pa.table({
            "event_type": g.column("event_type").slice(0, 1),
            "n_users": pa.array([n], pa.int64()),
        })

    return pairs.groupby("event_type").map_groups(
        distinct_users, batch_format="pyarrow")


def grouped_approx_distinct(ds, column: str, group_col: str,
                            p: int = 12):
    """Grouped approximate COUNT(DISTINCT): one HLL per (group, batch)
    — the exchange carries 2^p-byte sketches, never values — merged by
    a grouped elementwise-max and read out per group. Approximate twin
    of the oracled exact events_type_user_distinct; error ~1.04/2^(p/2)."""

    def sketch_batch(batch: pa.Table) -> pa.Table:
        groups = batch.column(group_col)
        codes = groups.dictionary_encode().combine_chunks()
        inv = codes.indices.to_numpy().astype(np.int64)
        names = codes.dictionary.to_pylist()
        col = batch.column(column)
        vals = (col.to_numpy() if col.null_count == 0
                else np.asarray(col.to_pylist(), dtype=object))
        h = _hash64(vals)
        out_g, out_s = [], []
        for gi, name in enumerate(names):
            hll = HyperLogLog(p)
            hll.add_hashes(h[inv == gi])
            out_g.append(name)
            out_s.append(hll.serialize())
        return pa.table({group_col: pa.array(out_g, pa.string()),
                         "sketch": pa.array(out_s, pa.binary())})

    sk = ds.map_batches(sketch_batch, batch_format="pyarrow",
                        zero_copy_batch=True)

    def merge(g: pa.Table) -> pa.Table:
        regs = np.stack([np.frombuffer(r, dtype=np.uint8)
                         for r in g.column("sketch").to_pylist()])
        hll = HyperLogLog(p, regs.max(axis=0).copy())
        return pa.table({
            group_col: g.column(group_col).slice(0, 1),
            "approx_distinct": pa.array([round(hll.estimate(), 1)],
                                        pa.float64()),
        })

    return sk.groupby(group_col).map_groups(merge, batch_format="pyarrow")


def events_type_users_hll(sf_dir: str, p: int = 12):
    """Approximate distinct users per event type (rows-only; accuracy
    gated against the oracled exact twin events_type_user_distinct)."""
    import ray.data as rd

    ds = rd.read_parquet(f"{sf_dir}/events.parquet",
                         columns=["event_type", "user_id"])
    return grouped_approx_distinct(ds, "user_id", "event_type", p=p) \
        .sort("event_type")


# --- Count-Min sketch -----------------------------------------------------

class CountMin:
    """Count-Min sketch (Cormode–Muthukrishnan '05): depth x width
    counter matrix, row indexes by Kirsch–Mitzenmacher double hashing
    over the shared deterministic _hash64. LINEAR: merging two sketches
    is elementwise addition, so per-batch partial matrices sum exactly
    across any partitioning. Estimates never undercount; overcount is
    bounded by e*N/width with prob 1 - e^-depth."""

    __slots__ = ("width", "depth", "m")

    def __init__(self, width: int = 2048, depth: int = 4,
                 m: np.ndarray | None = None):
        self.width, self.depth = width, depth
        self.m = m if m is not None else np.zeros((depth, width), np.int64)

    def _idx(self, values) -> np.ndarray:
        h1 = _hash64(values)
        h2 = _finalize64((h1 >> np.uint64(32)) | (h1 << np.uint64(32)))
        i = np.arange(self.depth, dtype=np.uint64)[:, None]
        with np.errstate(over="ignore"):
            return ((h1[None, :] + i * h2[None, :])
                    % np.uint64(self.width)).astype(np.int64)

    def add(self, values, counts: np.ndarray) -> None:
        idx = self._idx(values)
        for d in range(self.depth):
            np.add.at(self.m[d], idx[d], counts)

    def estimate(self, values) -> np.ndarray:
        idx = self._idx(values)
        return np.stack([self.m[d][idx[d]]
                         for d in range(self.depth)]).min(axis=0)

    def merge(self, other: "CountMin") -> "CountMin":
        assert self.m.shape == other.m.shape
        return CountMin(self.width, self.depth, self.m + other.m)


def docs_terms_cms(sf_dir: str, width: int = 2048, depth: int = 4,
                   k: int = 50):
    """Approximate term counts from a mergeable Count-Min sketch,
    reported for the exact top-k terms so accuracy is measurable:
    (term, n, n_est) with n_est >= n always and the overcount bounded
    by the corpus-size/width guarantee (gated in tests).

    Scale shape: each batch folds its token value_counts into a local
    depth x width matrix and emits it as ONE flattened row (fixed
    ~64 KB regardless of batch vocabulary); matrices are LINEAR, so a
    bounded driver fold of per-block partials reconstructs the corpus
    sketch exactly — the same order-independence argument as the HLL
    registers, with addition instead of max."""
    from .relational import docs_term_counts, read

    ds = read(sf_dir, "documents", columns=["text"])

    def partial(batch: pa.Table) -> pa.Table:
        flat = pc.list_flatten(pc.split_pattern(
            batch.column("text"), pattern=" "))
        vc = flat.value_counts()
        if isinstance(vc, pa.ChunkedArray):
            vc = vc.combine_chunks()
        cms = CountMin(width, depth)
        if len(vc):
            cms.add(vc.field("values").to_pylist(),
                    vc.field("counts").to_numpy().astype(np.int64))
        return pa.table({"m": pa.array([cms.m.ravel().tolist()],
                                       pa.list_(pa.int64()))})

    total = CountMin(width, depth)
    for b in ds.map_batches(partial, batch_format="pyarrow",
                            zero_copy_batch=True) \
            .iter_batches(batch_format="pyarrow"):
        for row in b.column("m").to_pylist():
            total = total.merge(CountMin(
                width, depth,
                np.asarray(row, np.int64).reshape(depth, width)))

    exact = pa.concat_tables(list(
        docs_term_counts(sf_dir, k=k).iter_batches(batch_format="pyarrow")))
    terms = exact.column("term").to_pylist()
    est = total.estimate(terms)
    return pa.table({
        "term": exact.column("term"),
        "n": exact.column("n"),
        "n_est": pa.array(est, pa.int64()),
    })


def exact_distinct_users_salted(sf_dir: str, salts: int = 64):
    """Skew-safe exact COUNT(DISTINCT user_id) per event_type — the
    hot-key answer the plain twin lacks: `exact_distinct_users` holds
    one whole event_type's distinct users in one worker, so a hot type
    at corpus scale blows its group. Salting fixes it EXACTLY (not
    approximately): each user lands in exactly one salt bucket
    (salt = hash64(user) % salts), so per-(type, salt) distinct counts
    SUM to the per-type distinct with no double counting, every group
    is bounded to ~1/salts of a type's users, and the final exchange
    carries only #types x salts count rows. Same oracle SQL as the
    unsalted twin — identical output, different (safe) partitioning."""
    import ray.data as rd

    from .relational import partitioned_map_groups

    ds = rd.read_parquet(f"{sf_dir}/events.parquet",
                         columns=["event_type", "user_id"])

    def partial(batch: pa.Table) -> pa.Table:
        # in-batch distinct (type, user) pre-reduce + salt tag
        g = batch.group_by(["event_type", "user_id"]).aggregate([])
        salt = _hash64(g.column("user_id")) % np.uint64(salts)
        return g.append_column("_salt",
                               pa.array(salt.astype(np.int64), pa.int64()))

    pairs = ds.map_batches(partial, batch_format="pyarrow",
                           zero_copy_batch=True)

    def count_part(part: pa.Table) -> pa.Table:
        import polars as pl

        out = (pl.from_arrow(part)
               .group_by(["event_type", "_salt"])
               .agg(pl.col("user_id").n_unique().alias("n")))
        return out.to_arrow().cast(pa.schema([
            ("event_type", pa.string()), ("_salt", pa.int64()),
            ("n", pa.int64())]))

    # co-locate by SALT (derived from user, so a hot TYPE spreads over
    # all partitions); each partition counts its (type, salt) cells
    per_salt = partitioned_map_groups(pairs, "_salt", count_part)

    agg = per_salt.groupby("event_type").sum("n")

    def rename(t: pa.Table) -> pa.Table:
        return pa.table({"event_type": t.column("event_type"),
                         "n_users": t.column("sum(n)").cast(pa.int64())})

    return agg.map_batches(rename, batch_format="pyarrow")
