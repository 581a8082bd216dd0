"""Fuzzy string matching (edit-distance record linkage).

The operator class web-scale entity resolution needs and nothing else
in the repo covered: match dirty strings back to a canonical set under
an edit-distance threshold, WITHOUT the all-pairs scan.

Candidate generation is the SymSpell / deletion-neighborhood join
(public technique): every string emits itself plus its |s| one-char-
deletion variants as 8-byte hashes; two strings within Levenshtein
distance 1 are GUARANTEED to share a variant (equal strings share
themselves; insert/delete pairs share the shorter string; substitution
pairs share the variant that deletes the edited position), so one
variant-keyed exchange of slim (hash, side, id) rows finds every true
candidate. Sharing a variant does NOT imply d<=1 (del_i(a)=del_j(b)
with i!=j can hide two substitutions — "ab"/"ba" share both "a" and
"b" at distance 2), and hash collisions add noise pairs, so candidates
pass a vectorized exact lev<=1 verifier: O(L) per pair (first-mismatch
+ shifted-suffix checks across the whole pair batch at once), never a
DP table. The winner per dirty string is argmin (distance, canonical
id) — fully deterministic, so the DuckDB all-pairs levenshtein oracle
reproduces it exactly.

Scale notes: the variant exchange carries (L+1) 8-byte hashes per
string (~2x the string bytes). Verification attaches strings to the
candidate pairs via an id->string broadcast, bounded by the side
tables here; above a broadcast gate, swap for two hash joins on id
(the dedup verify="join" pattern — documented, not needed at the test
corpus sizes, and the pair list itself is near-linear in input because
deletion-variant blocks only hold true near-matches plus hash noise).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from .sketch import _hash64


def _deletion_variant_hashes(s: str) -> np.ndarray:
    """hash64 of the string and each one-char-deletion variant."""
    return _hash64([s] + [s[:i] + s[i + 1:] for i in range(len(s))])


def lev01_batch(a: list[str], b: list[str]) -> np.ndarray:
    """Exact min(levenshtein(a_i, b_i), 2) per pair, vectorized across
    the batch: 0 = equal, 1 = one edit, 2 = anything greater. O(Lmax)
    numpy passes, no DP table. ASCII-safe via latin-1 byte view (the
    synthetic corpus is ASCII; byte-level distance == char-level there;
    for full unicode feed codepoint arrays instead)."""
    n = len(a)
    if n == 0:
        return np.zeros(0, np.int64)
    la = np.array([len(x) for x in a], np.int64)
    lb = np.array([len(x) for x in b], np.int64)
    lmax = int(max(la.max(), lb.max(), 1))
    A = np.zeros((n, lmax + 1), np.uint8)
    B = np.zeros((n, lmax + 1), np.uint8)
    for i, x in enumerate(a):
        A[i, :len(x)] = np.frombuffer(x.encode("latin-1"), np.uint8)
    for i, x in enumerate(b):
        B[i, :len(x)] = np.frombuffer(x.encode("latin-1"), np.uint8)
    # orient so X is the longer side
    swap = lb > la
    X = np.where(swap[:, None], B, A)
    Y = np.where(swap[:, None], A, B)
    lx = np.where(swap, lb, la)
    ly = np.where(swap, la, lb)

    out = np.full(n, 2, np.int64)
    diff = lx - ly
    cols = np.arange(lmax + 1)
    valid_y = cols[None, :] < ly[:, None]
    mism = (X[:, :lmax + 1] != Y) & valid_y
    nmis = mism.sum(axis=1)
    # equal length: 0/1/2 by mismatch count
    eq_len = diff == 0
    out[eq_len & (nmis == 0)] = 0
    out[eq_len & (nmis == 1)] = 1
    # length difference 1: one deletion in X. p = first mismatch
    # (or ly when the prefix fully matches — extra char is last).
    # Need X[j+1] == Y[j] for all j in [p, ly).
    p = np.where(nmis > 0, mism.argmax(axis=1), ly)
    eq_shift = (X[:, 1:lmax + 1] == Y[:, :lmax]) & (cols[None, :lmax]
                                                    < ly[:, None])
    bad_shift = (~eq_shift) & (cols[None, :lmax] < ly[:, None])
    # falses at positions >= p: suffix cumsum from the right
    rev_cum = np.cumsum(bad_shift[:, ::-1], axis=1)[:, ::-1]
    idx = np.minimum(p, lmax - 1)
    tail_bad = np.where(p < ly,
                        rev_cum[np.arange(n), idx],
                        0)
    out[(diff == 1) & (tail_bad == 0)] = 1
    return out


def _synth_dirty(canon: list[str], keys: np.ndarray) -> list[str]:
    """Deterministic one-edit corruption, closed-form in the key so the
    SQL oracle rebuilds it: position i = key % (L-2) + 1 (never first
    or last char), op = key % 3 (0 delete, 1 substitute '@', 2 insert
    '@' — '@' never occurs in canonical names, so substitute/insert
    are always true edits)."""
    out = []
    for s, k in zip(canon, keys):
        i = int(k) % (len(s) - 2) + 1
        op = int(k) % 3
        if op == 0:
            out.append(s[:i] + s[i + 1:])
        elif op == 1:
            out.append(s[:i] + "@" + s[i + 1:])
        else:
            out.append(s[:i] + "@" + s[i:])
    return out


def parts_fuzzy_match(sf_dir: str):
    """Record linkage over the parts table: canonical names are
    ``p_name || ' #' || p_partkey`` (unique), dirty names are their
    deterministic one-edit corruptions (see _synth_dirty), and every
    dirty name is matched back to its best canonical under lev <= 1
    via the deletion-neighborhood join + vectorized verify + argmin
    (distance, canonical id) fold. A deleted key digit can make a
    dirty name EQUAL to another part's canonical (distance 0 beats the
    planted source at distance 1) — real linkage ambiguity, resolved
    identically by the oracle's all-pairs argmin. Output: (p_partkey,
    matched_partkey, dist)."""
    import ray

    from ..broadcast import get_broadcast
    from .relational import copartitioned_map, partitioned_map_groups, read

    part = read(sf_dir, "part", columns=["p_partkey", "p_name"])

    def canonize(t: pa.Table) -> pa.Table:
        keys = t.column("p_partkey").to_numpy()
        if keys.size and keys.max() >= 2 ** 32:
            raise ValueError("p_partkey >= 2^32 breaks the packed pair "
                             "key; use a two-column exchange")
        names = t.column("p_name").to_pylist()
        canon = [f"{nm} #{k}" for nm, k in zip(names, keys)]
        return pa.table({
            "key": pa.array(keys, pa.int64()),
            "canon": pa.array(canon, pa.string()),
            "dirty": pa.array(_synth_dirty(canon, keys), pa.string()),
        })

    both = part.map_batches(canonize, batch_format="pyarrow",
                            zero_copy_batch=True).materialize()

    def emit(col: str):
        def go(t: pa.Table) -> pa.Table:
            ks, hs = [], []
            for k, s in zip(t.column("key").to_pylist(),
                            t.column(col).to_pylist()):
                h = _deletion_variant_hashes(s)
                hs.append(h)
                ks.append(np.full(h.size, k, np.int64))
            if not ks:
                return pa.table({"vh": pa.array([], pa.int64()),
                                 "id": pa.array([], pa.int64())})
            return pa.table({
                "vh": pa.array(np.concatenate(hs).view(np.int64),
                               pa.int64()),
                "id": pa.array(np.concatenate(ks), pa.int64())})
        return go

    def pair_part(parts: list[pa.Table]) -> pa.Table:
        dp, cp = parts
        if dp.num_rows == 0 or cp.num_rows == 0:
            return pa.table({"pk": pa.array([], pa.int64())})
        # group both sides by variant hash; emit dirty x canon pairs
        # per hash (blocks hold only near-matches + hash noise)
        dv = dp.column("vh").to_numpy()
        di = dp.column("id").to_numpy()
        cv = cp.column("vh").to_numpy()
        ci = cp.column("id").to_numpy()
        do = np.argsort(dv, kind="stable")
        co = np.argsort(cv, kind="stable")
        dv, di = dv[do], di[do]
        cv, ci = cv[co], ci[co]
        # for each dirty row, the matching canon range
        lo = np.searchsorted(cv, dv, side="left")
        hi = np.searchsorted(cv, dv, side="right")
        cnt = hi - lo
        reps = np.repeat(np.arange(dv.size), cnt)
        offs = (np.arange(cnt.sum()) -
                np.repeat(np.cumsum(cnt) - cnt, cnt))
        c_idx = np.repeat(lo, cnt) + offs
        pk = (di[reps].astype(np.uint64) << np.uint64(32)) \
            | ci[c_idx].astype(np.uint64)
        return pa.table({"pk": pa.array(np.unique(pk).view(np.int64),
                                        pa.int64())})

    cand = copartitioned_map(
        [(both, lambda t: emit("dirty")(t)),
         (both, lambda t: emit("canon")(t))], "vh", pair_part)

    def pair_uniq(part: pa.Table) -> pa.Table:
        return pa.table({"pk": pa.array(
            np.unique(part.column("pk").to_numpy()), pa.int64())})

    pairs = partitioned_map_groups(cand, "pk", pair_uniq)

    # id -> string attach: bounded broadcast here (swap for two hash
    # joins on id above a broadcast gate — the dedup verify pattern)
    dmap: dict[int, str] = {}
    cmap: dict[int, str] = {}
    for b in both.iter_batches(batch_format="pyarrow"):
        ks = b.column("key").to_pylist()
        dmap.update(zip(ks, b.column("dirty").to_pylist()))
        cmap.update(zip(ks, b.column("canon").to_pylist()))
    maps_ref = ray.put((dmap, cmap))

    def verify(t: pa.Table, _ref=maps_ref) -> pa.Table:
        dm, cm = get_broadcast(_ref)
        pk = t.column("pk").to_numpy().view(np.uint64)
        dk = (pk >> np.uint64(32)).astype(np.int64)
        ck = (pk & np.uint64(0xFFFFFFFF)).astype(np.int64)
        dist = lev01_batch([dm[k] for k in dk.tolist()],
                           [cm[k] for k in ck.tolist()])
        keep = dist <= 1
        return pa.table({
            "p_partkey": pa.array(dk[keep], pa.int64()),
            "matched_partkey": pa.array(ck[keep], pa.int64()),
            "dist": pa.array(dist[keep], pa.int64())})

    verified = pairs.map_batches(verify, batch_format="pyarrow",
                                 zero_copy_batch=True)

    def best(part: pa.Table) -> pa.Table:
        if part.num_rows == 0:
            return pa.table({"p_partkey": pa.array([], pa.int64()),
                             "matched_partkey": pa.array([], pa.int64()),
                             "dist": pa.array([], pa.int64())})
        d = part.column("p_partkey").to_numpy()
        c = part.column("matched_partkey").to_numpy()
        v = part.column("dist").to_numpy()
        order = np.lexsort((c, v, d))
        d_s, c_s, v_s = d[order], c[order], v[order]
        starts = np.flatnonzero(np.r_[True, d_s[1:] != d_s[:-1]])
        return pa.table({
            "p_partkey": pa.array(d_s[starts], pa.int64()),
            "matched_partkey": pa.array(c_s[starts], pa.int64()),
            "dist": pa.array(v_s[starts], pa.int64())})

    return partitioned_map_groups(verified, "p_partkey", best)
