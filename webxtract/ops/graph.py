"""Iterative graph algorithms over relational edge lists.

PageRank runs in FIXED-POINT integer arithmetic (1e-12 rank units,
integer floor division everywhere), which buys three properties at
once: results are independent of summation order (any partitioning,
any block size), bit-identical across runs, and replicable by a SQL
oracle that unrolls the same integer recurrence — so an iterative
distributed algorithm becomes hash-checkable against DuckDB.

Scale shape: the edge list is built with the same copartitioned
exchange + packed-key distinct used by the LSH candidate machinery
(slim int64 pairs only); each PageRank iteration broadcasts the
|nodes|-bounded rank vector (the k-means per-iteration pattern) and
reduces per-destination contributions as per-batch numpy partials +
one bounded fold. When |nodes| outgrows a broadcast, swap the
broadcast for an edges-join-ranks exchange per iteration (the
documented alternative below) — edge storage, not rank storage, is
the 100 TB term.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

SCALE = 1_000_000_000_000  # 1e12 fixed-point rank units
SUPP_OFFSET = 1_000_000    # supplier ids shifted into their own space


_EDGE_MEMO: dict = {}


def _session_key() -> str:
    """Current Ray job id — memoized Datasets hold object refs that die
    with the session, so the memo key must include it."""
    import ray

    try:
        return ray.get_runtime_context().get_job_id()
    except Exception:
        return "nosession"


def _memoized(tag: str, sf_dir: str, build):
    """Session-scoped memo for the shared edge builds: six graph
    queries in one bench session each paid the same ~3 s co-order
    edge derivation; a materialized Dataset is immutable and cheap to
    hold (packed int64 keys), so rebuilding it per query was pure
    waste. Keyed by (tag, sf_dir, ray job id) — refs die with the
    session, so a fresh session rebuilds."""
    key = (tag, sf_dir, _session_key())
    if key not in _EDGE_MEMO:
        _EDGE_MEMO[key] = build()
        # hold at most a handful of graphs (tests create many tmp dirs)
        if len(_EDGE_MEMO) > 8:
            _EDGE_MEMO.pop(next(iter(_EDGE_MEMO)))
    return _EDGE_MEMO[key]


def _purchase_edges(sf_dir: str):
    return _memoized("purchase", sf_dir,
                     lambda: _purchase_edges_build(sf_dir))


def _purchase_edges_build(sf_dir: str):
    """Distinct undirected (customer, supplier+OFFSET) edges from
    lineitem x orders: one copartitioned orderkey exchange emits the
    per-partition distinct pairs, one packed-key exchange makes them
    globally distinct. Returns a materialized Dataset of directed rows
    (src, dst) with BOTH directions present."""
    from .relational import copartitioned_map, partitioned_map_groups, read

    li = read(sf_dir, "lineitem", columns=["l_orderkey", "l_suppkey"])
    orders = read(sf_dir, "orders", columns=["o_orderkey", "o_custkey"])

    def prep_li(t: pa.Table) -> pa.Table:
        return pa.table({"k": t.column("l_orderkey"),
                         "v": t.column("l_suppkey")})

    def prep_orders(t: pa.Table) -> pa.Table:
        return pa.table({"k": t.column("o_orderkey"),
                         "v": t.column("o_custkey").cast(pa.int64())})

    def per_part(parts: list[pa.Table]) -> pa.Table:
        li_p, ord_p = parts
        if li_p.num_rows == 0 or ord_p.num_rows == 0:
            return pa.table({"_pk": pa.array([], pa.int64())})
        idx = pc.index_in(li_p.column("k"),
                          value_set=ord_p.column("k").combine_chunks())
        cust = pc.take(ord_p.column("v").combine_chunks(), idx)
        ok = pc.is_valid(cust)
        c = cust.filter(ok).to_numpy().astype(np.uint64)
        s = (li_p.column("v").filter(ok).to_numpy().astype(np.uint64)
             + np.uint64(SUPP_OFFSET))
        if c.size and (c.max() >= 2 ** 32 or s.max() >= 2 ** 32):
            raise ValueError(
                "node id >= 2^32: the packed (custkey<<32 | suppkey+"
                f"{SUPP_OFFSET}) edge key would silently corrupt; use a "
                "two-column (src, dst) exchange at this id range")
        pk = np.unique((c << np.uint64(32)) | s)
        return pa.table({"_pk": pa.array(pk.view(np.int64), pa.int64())})

    pairs = copartitioned_map([(li, prep_li), (orders, prep_orders)],
                              "k", per_part)

    def uniq(part: pa.Table) -> pa.Table:
        pk = np.unique(part.column("_pk").to_numpy().view(np.uint64))
        a = (pk >> np.uint64(32)).astype(np.int64)
        b = (pk & np.uint64(0xFFFFFFFF)).astype(np.int64)
        return pa.table({
            "src": pa.array(np.concatenate([a, b]), pa.int64()),
            "dst": pa.array(np.concatenate([b, a]), pa.int64()),
        })

    return partitioned_map_groups(pairs, "_pk", uniq).materialize()


def pagerank(edges, iters: int = 5, damping_pct: int = 85):
    """edges: materialized Dataset of directed (src, dst) int64 rows.
    Returns a pyarrow Table (node, rank_e12) after ``iters`` rounds of

        r'(v) = TELEPORT + (damping_pct * sum_{u->v} (r(u) // deg(u)))
                           // 100
        TELEPORT = ((100 - damping_pct) * SCALE // 100) // N

    — all integer, so the result is exact and partitioning-independent."""
    import ray

    from ..broadcast import get_broadcast

    # degrees: bounded |nodes| fold of per-batch partial counts —
    # vectorized (unique + scatter-add; integer adds are
    # order-independent, so the fold stays partitioning-invariant)
    node_chunks, n_chunks = [], []
    for b in edges.map_batches(
            lambda t: _count_partial(t, "src"),
            batch_format="pyarrow", zero_copy_batch=True) \
            .iter_batches(batch_format="pyarrow"):
        node_chunks.append(b.column("node").to_numpy())
        n_chunks.append(b.column("n").to_numpy())
    allnodes = (np.concatenate(node_chunks) if node_chunks
                else np.zeros(0, np.int64))
    nodes, inv = np.unique(allnodes, return_inverse=True)
    degv = np.zeros(len(nodes), np.int64)
    if len(allnodes):
        np.add.at(degv, inv, np.concatenate(n_chunks))
    n_nodes = len(nodes)
    if n_nodes == 0:
        return pa.table({"node": pa.array([], pa.int64()),
                         "rank_e12": pa.array([], pa.int64())})
    teleport = ((100 - damping_pct) * SCALE // 100) // n_nodes
    rank = np.full(n_nodes, SCALE // n_nodes, dtype=np.int64)

    # the iteration loop runs as raw Ray tasks over the PINNED edge
    # blocks (edges is materialized): a streaming-executor job per
    # iteration costs ~1s of plan/schedule overhead just to fold tiny
    # per-block partials, 5x per query — one task per block per
    # iteration reuses the same object-store blocks with none of it.
    # This is the documented "raw tasks where the Dataset API can't
    # express it" case: an iterative loop over a fixed block set.
    block_refs = edges.to_arrow_refs()
    nodes_ref = ray.put(nodes)

    @ray.remote(num_cpus=1)
    def contrib_block(t: pa.Table, bnodes: np.ndarray,
                      bshare: np.ndarray):
        if t.num_rows == 0 or "src" not in t.schema.names:
            # empty partitions materialize with a degenerate schema
            z = np.zeros(0, np.int64)
            return z, z
        src = t.column("src").to_numpy()
        dst = t.column("dst").to_numpy()
        c = bshare[np.searchsorted(bnodes, src)]
        # per-block partial: sum contributions per destination
        order = np.argsort(dst, kind="stable")
        d_sorted, c_sorted = dst[order], c[order]
        starts = np.flatnonzero(np.r_[True, d_sorted[1:] != d_sorted[:-1]])
        return d_sorted[starts], np.add.reduceat(c_sorted, starts)

    for _ in range(iters):
        # broadcast the per-node outgoing share r(u) // deg(u)
        share_ref = ray.put(rank // degv)
        parts = ray.get([contrib_block.remote(r, nodes_ref, share_ref)
                         for r in block_refs])
        contrib_v = np.zeros(n_nodes, np.int64)
        for bn, bv in parts:
            # ranked nodes are the SOURCES; contributions to a
            # destination that never appears as a source (a sink in a
            # directed edge list) are dropped, matching the dict fold
            # this replaced — an unguarded searchsorted would IndexError
            # or credit the wrong node
            si = np.searchsorted(nodes, bn)
            ok = si < n_nodes
            ok[ok] &= nodes[si[ok]] == bn[ok]
            np.add.at(contrib_v, si[ok], bv[ok])
        rank = teleport + (damping_pct * contrib_v) // 100

    return pa.table({"node": pa.array(nodes, pa.int64()),
                     "rank_e12": pa.array(rank, pa.int64())})


def _count_partial(t: pa.Table, col: str) -> pa.Table:
    g = pa.table({"node": t.column(col),
                  "n": pa.array(np.ones(t.num_rows, np.int64))}) \
        .group_by("node").aggregate([("n", "sum")])
    return pa.table({"node": g.column("node"),
                     "n": g.column("n_sum").cast(pa.int64())})


def purchase_pagerank(sf_dir: str, iters: int = 5, k: int = 25):
    """Query surface: PageRank over the undirected customer-supplier
    purchase graph; top-k nodes by rank (rank as double, 1e-12 units
    divided out and rounded to 6 — both sides compute the identical
    integer recurrence first, so the float step is one exact division
    of equal ints)."""
    t = pagerank(_purchase_edges(sf_dir), iters=iters)
    rank = pc.round(pc.divide(t.column("rank_e12").cast(pa.float64()),
                              pa.scalar(float(SCALE))), 6)
    out = pa.table({"node": t.column("node"), "rank": rank})
    idx = pc.sort_indices(out, sort_keys=[("rank", "descending"),
                                          ("node", "ascending")])
    return out.take(idx[:k])


# --- triangle counting ------------------------------------------------------

def _popcount64(x: np.ndarray) -> np.ndarray:
    """Vectorized SWAR popcount over uint64 (numpy 1.x lacks
    bitwise_count); 2.6x the byte-LUT variant on this box."""
    x = x - ((x >> np.uint64(1)) & np.uint64(0x5555555555555555))
    x = ((x & np.uint64(0x3333333333333333))
         + ((x >> np.uint64(2)) & np.uint64(0x3333333333333333)))
    x = (x + (x >> np.uint64(4))) & np.uint64(0x0F0F0F0F0F0F0F0F)
    return (x * np.uint64(0x0101010101010101)) >> np.uint64(56)


# bitset adjacency = n^2/8 bytes (512 MB at the node gate); the driver
# streams only slim (iu, iv) index pairs, bounded by the edge gate.
# Work crossover vs the join path: bitset ANDs m * n/64 words, the
# wedge join touches ~m * avg-degree = 2m^2/n keys, so bitset wins only
# while n^2 <= 128 m (dense-ish graphs) — auto checks that too.
TRI_BITSET_MAX_NODES = 65_536
TRI_BITSET_MAX_EDGES = 20_000_000
# join path: below this the sorted edge-key set broadcasts (8 B/edge)
# and wedges are probed map-side with zero wedge exchange; above it
# the copartitioned wedge-vs-edge match pays the exchange instead
TRI_EDGESET_BROADCAST_MAX = 20_000_000


def coorder_part_edges(sf_dir: str):
    return _memoized("coorder", sf_dir,
                     lambda: _coorder_part_edges_build(sf_dir))


def _coorder_part_edges_build(sf_dir: str):
    """Distinct undirected co-order part edges, packed (u << 32 | v)
    with u < v: parts appearing together in one order are linked. One
    orderkey co-location emits per-order distinct sorted pairs (pair
    fan-out is bounded by per-order line count, ~k^2/2 for k lines);
    one packed-key exchange dedupes globally. Returns a materialized
    Dataset of int64 keys ("k")."""
    from .relational import partitioned_map_groups, read

    li = read(sf_dir, "lineitem", columns=["l_orderkey", "l_partkey"])

    def pairs_fold(part: pa.Table) -> pa.Table:
        if part.num_rows == 0:
            return pa.table({"k": pa.array([], pa.int64())})
        o = part.column("l_orderkey").to_numpy()
        p = part.column("l_partkey").to_numpy()
        if p.size and p.max() >= 2 ** 32:
            raise ValueError(
                "part id >= 2^32: the packed (u<<32 | v) edge key would "
                "silently corrupt; use a two-column (u, v) exchange at "
                "this id range")
        order = np.lexsort((p, o))
        o_s, p_s = o[order], p[order]
        keep = np.ones(o_s.size, dtype=bool)
        keep[1:] = (o_s[1:] != o_s[:-1]) | (p_s[1:] != p_s[:-1])
        o_s, p_s = o_s[keep], p_s[keep]
        bounds = np.flatnonzero(np.diff(o_s)) + 1
        starts = np.concatenate(([0], bounds))
        ends = np.concatenate((bounds, [o_s.size])) if o_s.size else starts
        u, v = _segment_pairs(p_s, starts, ends)
        if u.size == 0:
            return pa.table({"k": pa.array([], pa.int64())})
        pk = np.unique((u.astype(np.uint64) << np.uint64(32))
                       | v.astype(np.uint64))
        return pa.table({"k": pa.array(pk.view(np.int64), pa.int64())})

    pairs = partitioned_map_groups(li, "l_orderkey", pairs_fold)

    def uniq(part: pa.Table) -> pa.Table:
        pk = np.unique(part.column("k").to_numpy())
        return pa.table({"k": pa.array(pk, pa.int64())})

    return partitioned_map_groups(pairs, "k", uniq).materialize()


def _unpack_edges(t: pa.Table) -> tuple[np.ndarray, np.ndarray]:
    pk = t.column("k").to_numpy().view(np.uint64)
    return ((pk >> np.uint64(32)).astype(np.int64),
            (pk & np.uint64(0xFFFFFFFF)).astype(np.int64))


def _segment_pairs(vals: np.ndarray, starts: np.ndarray,
                   ends: np.ndarray) -> tuple[np.ndarray, np.ndarray]:
    """All ordered pairs (vals[i], vals[j]) with i < j INSIDE each
    [start, end) segment, fully vectorized across every segment at
    once (no per-segment Python loop): each element pairs with its
    in-segment successors, so ``first`` repeats each index by its
    successor count and ``second`` walks the successors by a
    group-relative arange. vals must be ascending within segments for
    (u < v) pair order."""
    n = vals.size
    if n == 0:
        return np.zeros(0, vals.dtype), np.zeros(0, vals.dtype)
    k = ends - starts
    elem = np.arange(n, dtype=np.int64)
    succ = np.repeat(ends, k) - elem - 1
    total = int(succ.sum())
    if total == 0:
        return np.zeros(0, vals.dtype), np.zeros(0, vals.dtype)
    first = np.repeat(elem, succ)
    grp_start = np.cumsum(succ) - succ
    off = np.arange(total, dtype=np.int64) - np.repeat(grp_start, succ)
    second = first + off + 1
    return vals[first], vals[second]


def _deg_part(t: pa.Table) -> pa.Table:
    u, v = _unpack_edges(t)
    n, d = np.unique(np.concatenate([u, v]), return_counts=True)
    return pa.table({"node": pa.array(n, pa.int64()),
                     "d": pa.array(d.astype(np.int64), pa.int64())})


def _deg_sum(part: pa.Table) -> pa.Table:
    n = part.column("node").to_numpy()
    d = part.column("d").to_numpy()
    order = np.argsort(n, kind="stable")
    n_s, d_s = n[order], d[order]
    bounds = np.flatnonzero(np.diff(n_s)) + 1
    starts = np.concatenate(([0], bounds))
    return pa.table({
        "node": pa.array(n_s[starts], pa.int64()),
        "d": pa.array(np.add.reduceat(d_s, starts)
                      if n_s.size else np.zeros(0, np.int64),
                      pa.int64())})


def _edge_degrees(edges):
    """Exact per-node degree table from packed undirected edges: per-
    batch unique-count partials + one node-keyed partitioned sum
    (|nodes|-bounded output)."""
    from .relational import partitioned_map_groups

    return partitioned_map_groups(
        edges.map_batches(_deg_part, batch_format="pyarrow",
                          zero_copy_batch=True), "node", _deg_sum)


def triangle_count(sf_dir: str, verify: str = "auto"):
    """Co-order part graph wrapper around triangle_count_edges (the
    sf_dir-shaped query surface; the soak feeds synthetic edge tables
    into the core directly)."""
    return triangle_count_edges(coorder_part_edges(sf_dir), verify)


def triangle_count_edges(edges, verify: str = "auto"):
    """Exact triangle count over a materialized packed-key ("k",
    u<<32|v with u<v) undirected edge Dataset, two paths:

    ``bitset`` (below the node/edge gates): nodes index into a packed
    bit adjacency matrix (n^2/8 bytes, 512 MB at the 65,536-node gate)
    built on the driver from STREAMED slim (iu, iv) index batches and
    broadcast once; per-edge partials popcount row_u AND row_v
    (256-entry LUT, numpy), each triangle counted once per edge ->
    total // 3. Exact integer folds, partitioning-independent.

    ``join`` (the 100 TB path — no driver state, no n^2 memory):
    degree-order the edges (src = lower (degree, id) endpoint, the
    standard orientation that bounds per-node out-degree by sqrt(2m)),
    co-locate by src and emit each node's oriented-neighbor pairs as
    wedge keys (min<<32|max), then ONE copartitioned exchange matches
    wedges against the edge set (np.isin per partition) — each
    triangle matches exactly once. Degree vector broadcast is
    |nodes|-bounded (the PageRank rank-vector pattern; swap for an
    edges-join-degrees exchange when nodes outgrow a broadcast).

    ``auto`` picks bitset only under the memory gates AND the work
    crossover n^2 <= 128 m (bitset ANDs m*n/64 words vs the join's
    ~2m^2/n wedge keys): sf0.01's dense 2k-node graph -> bitset
    (2.0 s), sf0.1's 20k-node graph -> join (12.9 s cold vs 96 s
    bitset, measured; ~6 s of that is the shared edge build). Returns a single-row Dataset (n_nodes, n_edges,
    n_triangles); bitset == join equivalence is pytest-gated."""
    import ray
    import ray.data as rd

    from ..broadcast import get_broadcast
    from .relational import copartitioned_map, partitioned_map_groups

    n_edges = edges.count()

    # ONE degree exchange serves three needs: the node set (its keys),
    # n_nodes for the gate, and the join path's orientation order —
    # a separate distinct-nodes fold would be a second full exchange
    dnodes_c, ddegs_c = [], []
    for b in _edge_degrees(edges).iter_batches(
            batch_format="pyarrow"):  # |nodes|-bounded
        dnodes_c.append(b.column("node").to_numpy())
        ddegs_c.append(b.column("d").to_numpy())
    dn = (np.concatenate(dnodes_c) if dnodes_c
          else np.zeros(0, np.int64))
    dv = (np.concatenate(ddegs_c) if ddegs_c
          else np.zeros(0, np.int64))
    order = np.argsort(dn)
    dn, dv = dn[order], dv[order]
    n_nodes = dn.size

    if verify == "auto":
        verify = ("bitset" if n_nodes <= TRI_BITSET_MAX_NODES
                  and n_edges <= TRI_BITSET_MAX_EDGES
                  and n_nodes * n_nodes <= 128 * n_edges else "join")

    def _result(n_tri: int):
        return rd.from_arrow(pa.table({
            "n_nodes": pa.array([n_nodes], pa.int64()),
            "n_edges": pa.array([n_edges], pa.int64()),
            "n_triangles": pa.array([int(n_tri)], pa.int64())}))

    if verify == "bitset":
        if n_nodes > TRI_BITSET_MAX_NODES or n_edges > TRI_BITSET_MAX_EDGES:
            raise ValueError(
                f"bitset path gated at {TRI_BITSET_MAX_NODES} nodes / "
                f"{TRI_BITSET_MAX_EDGES} edges (got {n_nodes} / "
                f"{n_edges}): use verify='join'")
        # node-id -> dense index map, |nodes|-bounded
        nodes_ref = ray.put(dn)  # already sorted

        def to_idx(t: pa.Table, _ref=nodes_ref) -> pa.Table:
            na = get_broadcast(_ref)
            u, v = _unpack_edges(t)
            return pa.table({
                "iu": pa.array(np.searchsorted(na, u).astype(np.int32),
                               pa.int32()),
                "iv": pa.array(np.searchsorted(na, v).astype(np.int32),
                               pa.int32())})

        idx_edges = edges.map_batches(to_idx, batch_format="pyarrow",
                                      zero_copy_batch=True).materialize()
        words = (n_nodes + 63) // 64
        bits = np.zeros((n_nodes, max(words, 1)), dtype=np.uint64)
        for b in idx_edges.iter_batches(batch_format="pyarrow"):
            iu = b.column("iu").to_numpy().astype(np.int64)
            iv = b.column("iv").to_numpy().astype(np.int64)
            np.bitwise_or.at(
                bits, (iu, iv // 64), np.uint64(1) << (iv % 64).astype(np.uint64))
            np.bitwise_or.at(
                bits, (iv, iu // 64), np.uint64(1) << (iu % 64).astype(np.uint64))
        bits_ref = ray.put(bits)

        def pop_part(t: pa.Table, _ref=bits_ref) -> pa.Table:
            bm = get_broadcast(_ref)
            iu = t.column("iu").to_numpy().astype(np.int64)
            iv = t.column("iv").to_numpy().astype(np.int64)
            c = 0
            for s in range(0, iu.size, 8192):  # cap SWAR temporaries
                x = np.bitwise_and(bm[iu[s:s + 8192]],
                                   bm[iv[s:s + 8192]])
                c += int(_popcount64(x).sum())
            return pa.table({"c": pa.array([c], pa.int64())})

        partials = idx_edges.map_batches(pop_part, batch_format="pyarrow",
                                         zero_copy_batch=True)
        total = partials.sum("c") or 0
        return _result(total // 3)

    # join path: degree orientation + wedge/edge copartitioned match
    deg_ref = ray.put((dn, dv))  # from the single degree exchange above

    def orient(t: pa.Table, _ref=deg_ref) -> pa.Table:
        na, da = get_broadcast(_ref)
        u, v = _unpack_edges(t)
        du = da[np.searchsorted(na, u)]
        dvv = da[np.searchsorted(na, v)]
        u_first = (du < dvv) | ((du == dvv) & (u < v))
        src = np.where(u_first, u, v)
        dst = np.where(u_first, v, u)
        return pa.table({"src": pa.array(src, pa.int64()),
                         "dst": pa.array(dst, pa.int64())})

    oriented = edges.map_batches(orient, batch_format="pyarrow",
                                 zero_copy_batch=True)

    def wedge_fold(part: pa.Table) -> pa.Table:
        if part.num_rows == 0:
            return pa.table({"k": pa.array([], pa.int64())})
        s = part.column("src").to_numpy()
        d = part.column("dst").to_numpy()
        order = np.lexsort((d, s))
        s_s, d_s = s[order], d[order]
        bounds = np.flatnonzero(np.diff(s_s)) + 1
        starts = np.concatenate(([0], bounds))
        ends = np.concatenate((bounds, [s_s.size]))
        wu, wv = _segment_pairs(d_s, starts, ends)
        if wu.size == 0:
            return pa.table({"k": pa.array([], pa.int64())})
        w = (wu.astype(np.uint64) << np.uint64(32)) \
            | wv.astype(np.uint64)
        return pa.table({"k": pa.array(w.view(np.int64), pa.int64())})

    if n_edges <= TRI_EDGESET_BROADCAST_MAX:
        # probe wedges MAP-SIDE against a broadcast sorted edge-key
        # array (8 B/edge — 10 MB at sf0.1) the moment they are
        # generated: the ~2m^2/n wedge stream never shuffles at all
        # (measured 14.8 -> 7.5 s at sf0.1/32cpu). Above the gate the
        # edge set no longer broadcasts and the copartitioned match
        # below pays the wedge exchange instead — equivalence-gated.
        chunks = [b.column("k").to_numpy() for b in
                  edges.iter_batches(batch_format="pyarrow")] \
            if n_edges else []
        ekeys = (np.sort(np.concatenate(chunks)) if chunks
                 else np.zeros(0, np.int64))
        ekeys_ref = ray.put(ekeys)

        def wedge_probe(part: pa.Table, _ref=ekeys_ref) -> pa.Table:
            wt = wedge_fold(part)
            ek = get_broadcast(_ref)
            w = wt.column("k").to_numpy()
            pos = np.searchsorted(ek, w)
            ok = pos < ek.size
            c = int((ek[np.minimum(pos, ek.size - 1)][ok] == w[ok]).sum()) \
                if w.size else 0
            return pa.table({"c": pa.array([c], pa.int64())})

        counted = partitioned_map_groups(oriented, "src", wedge_probe)
        return _result(counted.sum("c") or 0)

    wedges = partitioned_map_groups(oriented, "src", wedge_fold)

    def prep(t: pa.Table) -> pa.Table:
        return pa.table({"k": t.column("k")})

    def match(parts: list[pa.Table]) -> pa.Table:
        wp, ep = parts
        if wp.num_rows == 0 or ep.num_rows == 0:
            return pa.table({"c": pa.array([0], pa.int64())})
        c = int(np.isin(wp.column("k").to_numpy(),
                        ep.column("k").to_numpy(),
                        assume_unique=False).sum())
        return pa.table({"c": pa.array([c], pa.int64())})

    counted = copartitioned_map([(wedges, prep), (edges, prep)],
                                "k", match)
    total = counted.sum("c") or 0
    return _result(total)


# --- k-core decomposition ---------------------------------------------------


def kcore(sf_dir: str, k: int = 65, rounds: int = 6):
    """Co-order part graph wrapper around kcore_edges (the sf_dir-shaped
    query surface; the soak feeds synthetic edge tables directly)."""
    return kcore_edges(coorder_part_edges(sf_dir), k=k, rounds=rounds)


def kcore_edges(edges, k: int = 65, rounds: int = 6):
    """k-core over a materialized packed-key undirected edge Dataset
    by SYNCHRONIZED peeling: each
    round recomputes exact degrees over the surviving edges and drops
    every node below ``k`` at once (the parallel-peeling semantic —
    deterministic and engine-independent, unlike sequential peeling
    whose result depends on removal order... for the SURVIVING SET they
    coincide: the k-core is unique, synchronized peeling just reaches
    the fixpoint in more uniform steps). Runs a FIXED ``rounds``
    budget so the DuckDB oracle can unroll the identical rounds;
    convergence within the budget is asserted (extra rounds are no-ops
    at the fixpoint, so early-stop == full unroll). Per round: one
    |nodes|-bounded degree fold + a broadcast survivor set + an edge
    filter over the pinned packed-key blocks — edges only shrink, and
    the driver holds one bounded node vector (the PageRank pattern).

    Returns (node, deg) rows for the k-core members with their
    in-core degrees (empty when the core is empty). k=65 is chosen so
    the rule BITES at every test scale (sf0.001: 188/200 survive in 3
    rounds; sf0.01: 1992/2000 in 1; sf0.1: 19845/20000 in 2)."""
    import ray

    from ..broadcast import get_broadcast

    for r in range(rounds):
        degs = _edge_degrees(edges)
        nodes_c, d_c = [], []
        for b in degs.iter_batches(batch_format="pyarrow"):  # |nodes|
            nodes_c.append(b.column("node").to_numpy())
            d_c.append(b.column("d").to_numpy())
        n = np.concatenate(nodes_c) if nodes_c else np.zeros(0, np.int64)
        d = np.concatenate(d_c) if d_c else np.zeros(0, np.int64)
        if n.size == 0:
            return _kcore_table(np.zeros(0, np.int64),
                                np.zeros(0, np.int64))
        keep = d >= k
        if keep.all():
            order = np.argsort(n)
            return _kcore_table(n[order], d[order])
        survivors = np.sort(n[keep])
        if survivors.size == 0:
            return _kcore_table(np.zeros(0, np.int64),
                                np.zeros(0, np.int64))
        surv_ref = ray.put(survivors)

        def filt(t: pa.Table, _ref=surv_ref) -> pa.Table:
            sv = get_broadcast(_ref)
            u, v = _unpack_edges(t)
            iu = np.searchsorted(sv, u)
            iv = np.searchsorted(sv, v)
            ok = ((iu < sv.size) & (iv < sv.size))
            ok[ok] &= (sv[np.minimum(iu[ok], sv.size - 1)] == u[ok]) \
                & (sv[np.minimum(iv[ok], sv.size - 1)] == v[ok])
            return pa.table({"k": t.column("k").filter(pa.array(ok))})

        edges = edges.map_batches(filt, batch_format="pyarrow",
                                  zero_copy_batch=True).materialize()

    raise RuntimeError(
        f"k-core peeling did not converge within {rounds} rounds — "
        "raise `rounds` (the oracle unrolls the same budget)")


def _kcore_table(nodes: np.ndarray, degs: np.ndarray):
    import ray.data as rd

    return rd.from_arrow(pa.table({
        "node": pa.array(nodes, pa.int64()),
        "deg": pa.array(degs, pa.int64())}))


def parts_copurchase_topk(sf_dir: str, k: int = 20):
    """Frequent-itemset mining, the Apriori first pass: the top-k part
    PAIRS by co-purchase support (number of distinct orders containing
    both). Pair generation reuses the vectorized per-order segment
    machinery (_segment_pairs) inside one orderkey co-location; support
    folds as (packed pair, n) integer partials through one pair-keyed
    exchange; each partition then emits only its LOCAL top-k (the
    global top-k is a subset of the per-partition top-k's union when
    partitioning is BY PAIR — the same fused partial-top-k shape as
    BM25), and the driver merges <= k * partitions slim rows. Ties
    break (support desc, part_a, part_b). Oracled (self-join + count +
    window top-k)."""
    import ray.data as rd

    from .relational import partitioned_map_groups, read

    li = read(sf_dir, "lineitem", columns=["l_orderkey", "l_partkey"])

    def pair_partial(part: pa.Table) -> pa.Table:
        if part.num_rows == 0:
            return pa.table({"k": pa.array([], pa.int64()),
                             "n": pa.array([], pa.int64())})
        o = part.column("l_orderkey").to_numpy()
        p = part.column("l_partkey").to_numpy()
        if p.size and p.max() >= 2 ** 32:
            raise ValueError("part id >= 2^32 breaks the packed pair key")
        order = np.lexsort((p, o))
        o_s, p_s = o[order], p[order]
        keep = np.ones(o_s.size, dtype=bool)
        keep[1:] = (o_s[1:] != o_s[:-1]) | (p_s[1:] != p_s[:-1])
        o_s, p_s = o_s[keep], p_s[keep]
        bounds = np.flatnonzero(np.diff(o_s)) + 1
        starts = np.concatenate(([0], bounds))
        ends = np.concatenate((bounds, [o_s.size])) if o_s.size else starts
        u, v = _segment_pairs(p_s, starts, ends)
        pk, n = np.unique((u.astype(np.uint64) << np.uint64(32))
                          | v.astype(np.uint64), return_counts=True)
        return pa.table({"k": pa.array(pk.view(np.int64), pa.int64()),
                         "n": pa.array(n.astype(np.int64), pa.int64())})

    partials = partitioned_map_groups(li, "l_orderkey", pair_partial)

    def local_topk(part: pa.Table) -> pa.Table:
        if part.num_rows == 0:
            return pa.table({"part_a": pa.array([], pa.int64()),
                             "part_b": pa.array([], pa.int64()),
                             "support": pa.array([], pa.int64())})
        pk = part.column("k").to_numpy()
        n = part.column("n").to_numpy()
        order = np.argsort(pk, kind="stable")
        pk_s, n_s = pk[order], n[order]
        bounds = np.flatnonzero(np.diff(pk_s)) + 1
        starts = np.concatenate(([0], bounds))
        keys = pk_s[starts].view(np.uint64)
        sup = np.add.reduceat(n_s, starts)
        u = (keys >> np.uint64(32)).astype(np.int64)
        v = (keys & np.uint64(0xFFFFFFFF)).astype(np.int64)
        top = np.lexsort((v, u, -sup))[:k]
        return pa.table({"part_a": pa.array(u[top], pa.int64()),
                         "part_b": pa.array(v[top], pa.int64()),
                         "support": pa.array(sup[top], pa.int64())})

    merged = partitioned_map_groups(partials, "k", local_topk)
    return merged.sort(["support", "part_a", "part_b"],
                       descending=[True, False, False]).limit(k)


def parts_bfs_hops(sf_dir: str, seed_mod: int = 97, max_hops: int = 3):
    """Multi-source BFS hop distance over the co-order part graph:
    seeds are every graph node with node % seed_mod == 0, and each
    reachable node gets its MINIMUM hop count (<= max_hops). Oracle:
    DuckDB recursive CTE over the identical co-order edge derivation
    with hop < max bound + min(hop) GROUP BY."""
    return bfs_hops_edges(coorder_part_edges(sf_dir),
                          seed_mod=seed_mod, max_hops=max_hops)


def bfs_hops_edges(edges, seed_mod: int = 97, max_hops: int = 3):
    """Multi-source BFS core over a materialized packed-key undirected
    edge Dataset. Classic frontier expansion in synchronized rounds
    over the pinned packed edge blocks (the kcore/PageRank pattern):
    per round the sorted frontier broadcasts once (node-bounded, never
    the edge set) and every edge block emits its distinct
    frontier-adjacent neighbors; the fold is |nodes|-bounded, the
    driver holds one visited vector (the same documented bound kcore's
    survivor set carries), and edges never re-shuffle between rounds.
    Termination is exact: a node enters the result at the first round
    that reaches it, so min-hop semantics need no reconciliation."""
    import ray

    from ..broadcast import get_broadcast

    degs = _edge_degrees(edges)
    nodes_c = [b.column("node").to_numpy()
               for b in degs.iter_batches(batch_format="pyarrow")]
    nodes = np.sort(np.concatenate(nodes_c)) if nodes_c \
        else np.zeros(0, np.int64)

    seeds = nodes[nodes % seed_mod == 0]
    out_nodes = [seeds]
    out_hops = [np.zeros(seeds.size, np.int64)]
    visited = seeds              # sorted
    frontier = seeds

    for h in range(1, max_hops + 1):
        if frontier.size == 0:
            break
        f_ref = ray.put(np.sort(frontier))

        def neigh(t: pa.Table, _ref=f_ref) -> pa.Table:
            fr = get_broadcast(_ref)
            u, v = _unpack_edges(t)
            iu = np.searchsorted(fr, u)
            np.minimum(iu, fr.size - 1, out=iu)
            mu = (fr[iu] == u) if fr.size else np.zeros(u.size, bool)
            iv = np.searchsorted(fr, v)
            np.minimum(iv, fr.size - 1, out=iv)
            mv = (fr[iv] == v) if fr.size else np.zeros(v.size, bool)
            nb = np.unique(np.concatenate([v[mu], u[mv]]))
            return pa.table({"node": pa.array(nb, pa.int64())})

        nb_c = [b.column("node").to_numpy()
                for b in edges.map_batches(
                    neigh, batch_format="pyarrow",
                    zero_copy_batch=True).iter_batches(
                        batch_format="pyarrow")]
        nb = np.unique(np.concatenate(nb_c)) if nb_c \
            else np.zeros(0, np.int64)
        new = np.setdiff1d(nb, visited, assume_unique=True)
        out_nodes.append(new)
        out_hops.append(np.full(new.size, h, np.int64))
        visited = np.union1d(visited, new)
        frontier = new

    import ray.data as rd

    n_all = np.concatenate(out_nodes)
    h_all = np.concatenate(out_hops)
    order = np.argsort(n_all)
    return rd.from_arrow(pa.table({
        "node": pa.array(n_all[order], pa.int64()),
        "hops": pa.array(h_all[order], pa.int64())}))


def _weighted_purchase_edges(sf_dir: str):
    """(src, dst, w) purchase edges where w = number of DISTINCT
    orders linking the (customer, supplier) pair — the same two
    exchanges as _purchase_edges, but per-order distinct pairs are
    COUNTED per partition (slim (pk, n) partials; integer adds are
    order-independent) instead of deduped, and the pk-keyed fold sums
    multiplicities before emitting both directions."""
    from .relational import copartitioned_map, partitioned_map_groups, read

    li = read(sf_dir, "lineitem", columns=["l_orderkey", "l_suppkey"])
    orders = read(sf_dir, "orders", columns=["o_orderkey", "o_custkey"])

    def prep_li(t: pa.Table) -> pa.Table:
        return pa.table({"k": t.column("l_orderkey"),
                         "v": t.column("l_suppkey")})

    def prep_orders(t: pa.Table) -> pa.Table:
        return pa.table({"k": t.column("o_orderkey"),
                         "v": t.column("o_custkey").cast(pa.int64())})

    def per_part(parts: list[pa.Table]) -> pa.Table:
        li_p, ord_p = parts
        if li_p.num_rows == 0 or ord_p.num_rows == 0:
            return pa.table({"_pk": pa.array([], pa.int64()),
                             "n": pa.array([], pa.int64())})
        idx = pc.index_in(li_p.column("k"),
                          value_set=ord_p.column("k").combine_chunks())
        cust = pc.take(ord_p.column("v").combine_chunks(), idx)
        ok = pc.is_valid(cust)
        c = cust.filter(ok).to_numpy().astype(np.uint64)
        s = (li_p.column("v").filter(ok).to_numpy().astype(np.uint64)
             + np.uint64(SUPP_OFFSET))
        o = li_p.column("k").filter(ok).to_numpy()
        if c.size and (c.max() >= 2 ** 32 or s.max() >= 2 ** 32):
            raise ValueError(
                "node id >= 2^32: the packed edge key would silently "
                "corrupt; use a two-column exchange at this id range")
        pk = ((c << np.uint64(32)) | s).view(np.int64)
        order_ = np.lexsort((pk, o))
        o_s, pk_s = o[order_], pk[order_]
        keep = np.ones(o_s.size, bool)      # distinct per (order, pair)
        keep[1:] = (o_s[1:] != o_s[:-1]) | (pk_s[1:] != pk_s[:-1])
        upk, cnt = np.unique(pk_s[keep], return_counts=True)
        return pa.table({"_pk": pa.array(upk, pa.int64()),
                         "n": pa.array(cnt.astype(np.int64), pa.int64())})

    pairs = copartitioned_map([(li, prep_li), (orders, prep_orders)],
                              "k", per_part)

    def fold(part: pa.Table) -> pa.Table:
        if part.num_rows == 0:
            return pa.table({"src": pa.array([], pa.int64()),
                             "dst": pa.array([], pa.int64()),
                             "w": pa.array([], pa.int64())})
        pk = part.column("_pk").to_numpy()
        n = part.column("n").to_numpy()
        order_ = np.argsort(pk, kind="stable")
        pk_s, n_s = pk[order_], n[order_]
        starts = np.flatnonzero(np.r_[True, pk_s[1:] != pk_s[:-1]])
        upk = pk_s[starts].view(np.uint64)
        w = np.add.reduceat(n_s, starts)
        a = (upk >> np.uint64(32)).astype(np.int64)
        b = (upk & np.uint64(0xFFFFFFFF)).astype(np.int64)
        return pa.table({
            "src": pa.array(np.concatenate([a, b]), pa.int64()),
            "dst": pa.array(np.concatenate([b, a]), pa.int64()),
            "w": pa.array(np.concatenate([w, w]).astype(np.int64),
                          pa.int64())})

    return partitioned_map_groups(pairs, "_pk", fold).materialize()


def pagerank_weighted(edges, iters: int = 5, damping_pct: int = 85):
    """Weighted PageRank over a materialized (src, dst, w) edge
    Dataset: the unweighted integer fixed-point recurrence with each
    contribution scaled by edge weight,

        contrib(u->v) = (r(u) // W(u)) * w_uv,  W(u) = sum_u w_uv
        r'(v) = TELEPORT + (damping_pct * sum contrib) // 100

    — all integer (contrib per destination is bounded by SCALE, far
    inside int64), so the result is exact and partitioning-
    independent; the oracle unrolls the identical expression. Same
    raw-task fold over pinned edge blocks as ``pagerank``."""
    import ray

    node_chunks, w_chunks = [], []

    def wpart(t: pa.Table) -> pa.Table:
        src = t.column("src").to_numpy()
        w = t.column("w").to_numpy()
        order_ = np.argsort(src, kind="stable")
        s_s, w_s = src[order_], w[order_]
        starts = np.flatnonzero(np.r_[True, s_s[1:] != s_s[:-1]])
        return pa.table({
            "node": pa.array(s_s[starts], pa.int64()),
            "n": pa.array(np.add.reduceat(w_s, starts)
                          .astype(np.int64), pa.int64())})

    for b in edges.map_batches(wpart, batch_format="pyarrow",
                               zero_copy_batch=True) \
            .iter_batches(batch_format="pyarrow"):  # |nodes|-bounded
        node_chunks.append(b.column("node").to_numpy())
        w_chunks.append(b.column("n").to_numpy())
    allnodes = (np.concatenate(node_chunks) if node_chunks
                else np.zeros(0, np.int64))
    nodes, inv = np.unique(allnodes, return_inverse=True)
    wdeg = np.zeros(len(nodes), np.int64)
    if len(allnodes):
        np.add.at(wdeg, inv, np.concatenate(w_chunks))
    n_nodes = len(nodes)
    if n_nodes == 0:
        return pa.table({"node": pa.array([], pa.int64()),
                         "rank_e12": pa.array([], pa.int64())})
    teleport = ((100 - damping_pct) * SCALE // 100) // n_nodes
    rank = np.full(n_nodes, SCALE // n_nodes, dtype=np.int64)

    block_refs = edges.to_arrow_refs()
    nodes_ref = ray.put(nodes)

    @ray.remote(num_cpus=1)
    def contrib_block(t: pa.Table, bnodes: np.ndarray,
                      bshare: np.ndarray):
        if t.num_rows == 0 or "src" not in t.schema.names:
            z = np.zeros(0, np.int64)
            return z, z
        src = t.column("src").to_numpy()
        dst = t.column("dst").to_numpy()
        w = t.column("w").to_numpy()
        c = bshare[np.searchsorted(bnodes, src)] * w
        order_ = np.argsort(dst, kind="stable")
        d_sorted, c_sorted = dst[order_], c[order_]
        starts = np.flatnonzero(
            np.r_[True, d_sorted[1:] != d_sorted[:-1]])
        return d_sorted[starts], np.add.reduceat(c_sorted, starts)

    for _ in range(iters):
        share_ref = ray.put(rank // wdeg)
        parts = ray.get([contrib_block.remote(r, nodes_ref, share_ref)
                         for r in block_refs])
        contrib_v = np.zeros(n_nodes, np.int64)
        for bn, bv in parts:
            si = np.searchsorted(nodes, bn)
            ok = si < n_nodes
            ok[ok] &= nodes[si[ok]] == bn[ok]
            np.add.at(contrib_v, si[ok], bv[ok])
        rank = teleport + (damping_pct * contrib_v) // 100

    return pa.table({"node": pa.array(nodes, pa.int64()),
                     "rank_e12": pa.array(rank, pa.int64())})


def purchase_pagerank_weighted(sf_dir: str, iters: int = 5,
                               k: int = 25):
    """Top-k weighted-PageRank nodes of the purchase graph (edge
    weight = distinct orders linking the pair)."""
    import ray.data as rd

    t = pagerank_weighted(_weighted_purchase_edges(sf_dir), iters)
    return rd.from_arrow(t).sort(
        ["rank_e12", "node"], descending=[True, False]).limit(k)


def parts_copurchase_lift(sf_dir: str, k: int = 20, min_support: int = 2):
    """Association-rule mining, the Apriori scoring pass: top-k part
    pairs by LIFT = p(ab) / (p(a) p(b)) = n_ab * N / (n_a * n_b) over
    distinct-order supports, among pairs with n_ab >= min_support.
    ONE orderkey co-location computes everything an order contributes —
    packed-pair partials (the parts_copurchase_topk fold), item-support
    partials and the partition's distinct-order count — as tagged slim
    rows, so no second scan and no driver-side distinct over an
    unbounded stream (order counts are pre-reduced per partition, item
    supports are catalog-bounded). Pair supports then fold through one
    pair-keyed exchange where each partition emits only its LOCAL
    top-k by lift (exact: post-fold pair rows are disjoint by pair).
    Scores are integer micro-lifts via round_even of the pinned
    IEEE-double expression (the docs_term_pmi discipline), so the
    ranking is bit-deterministic in both engines."""
    import ray

    from ..broadcast import get_broadcast
    from .relational import partitioned_map_groups, read

    li = read(sf_dir, "lineitem", columns=["l_orderkey", "l_partkey"])

    def combined_partial(part: pa.Table) -> pa.Table:
        # kind 0 = packed-pair partial, 1 = item-support partial,
        # 2 = this partition's distinct-order count (orders are hashed
        # whole, so partitions are disjoint by order and the counts add)
        if part.num_rows == 0:
            return pa.table({"kind": pa.array([], pa.int64()),
                             "k": pa.array([], pa.int64()),
                             "n": pa.array([], pa.int64())})
        o = part.column("l_orderkey").to_numpy()
        p = part.column("l_partkey").to_numpy()
        if p.max() >= 2 ** 32:
            raise ValueError("part id >= 2^32 breaks the packed pair key")
        order = np.lexsort((p, o))
        o_s, p_s = o[order], p[order]
        keep = np.ones(o_s.size, dtype=bool)
        keep[1:] = (o_s[1:] != o_s[:-1]) | (p_s[1:] != p_s[:-1])
        o_s, p_s = o_s[keep], p_s[keep]
        bounds = np.flatnonzero(np.diff(o_s)) + 1
        starts = np.concatenate(([0], bounds))
        ends = np.concatenate((bounds, [o_s.size]))
        u, v = _segment_pairs(p_s, starts, ends)
        pk, n = np.unique((u.astype(np.uint64) << np.uint64(32))
                          | v.astype(np.uint64), return_counts=True)
        ip, icnt = np.unique(p_s, return_counts=True)
        kind = np.concatenate((np.zeros(pk.size, np.int64),
                               np.ones(ip.size, np.int64),
                               [np.int64(2)]))
        key = np.concatenate((pk.view(np.int64), ip, [np.int64(-1)]))
        cnt = np.concatenate((n.astype(np.int64), icnt.astype(np.int64),
                              [np.int64(starts.size)]))
        return pa.table({"kind": pa.array(kind, pa.int64()),
                         "k": pa.array(key, pa.int64()),
                         "n": pa.array(cnt, pa.int64())})

    partials = partitioned_map_groups(
        li, "l_orderkey", combined_partial).materialize()

    sup: dict[int, int] = {}
    n_orders = 0
    for b in partials.iter_batches(batch_format="pyarrow"):
        kind = b.column("kind").to_numpy()
        kk = b.column("k").to_numpy()
        nn = b.column("n").to_numpy()
        for x, c in zip(kk[kind == 1].tolist(), nn[kind == 1].tolist()):
            sup[x] = sup.get(x, 0) + c
        n_orders += int(nn[kind == 2].sum())
    sup_ref = ray.put(sup)
    n_f = float(n_orders)

    def pairs_only(t: pa.Table) -> pa.Table:
        t = t.filter(pc.equal(t.column("kind"), pa.scalar(0, pa.int64())))
        return t.drop_columns(["kind"])

    pair_partials = partials.map_batches(pairs_only, batch_format="pyarrow",
                                         zero_copy_batch=True)

    def local_topk(part: pa.Table, _ref=sup_ref) -> pa.Table:
        empty = pa.table({"part_a": pa.array([], pa.int64()),
                          "part_b": pa.array([], pa.int64()),
                          "support": pa.array([], pa.int64()),
                          "n_a": pa.array([], pa.int64()),
                          "n_b": pa.array([], pa.int64()),
                          "lift_micro": pa.array([], pa.int64())})
        if part.num_rows == 0:
            return empty
        s = get_broadcast(_ref)
        pk = part.column("k").to_numpy()
        n = part.column("n").to_numpy()
        order = np.argsort(pk, kind="stable")
        pk_s, n_s = pk[order], n[order]
        bounds = np.flatnonzero(np.diff(pk_s)) + 1
        starts = np.concatenate(([0], bounds))
        keys = pk_s[starts].view(np.uint64)
        nab = np.add.reduceat(n_s, starts)
        m = nab >= min_support
        if not m.any():
            return empty
        keys, nab = keys[m], nab[m]
        u = (keys >> np.uint64(32)).astype(np.int64)
        v = (keys & np.uint64(0xFFFFFFFF)).astype(np.int64)
        na = np.array([s[x] for x in u.tolist()], np.int64)
        nb = np.array([s[x] for x in v.tolist()], np.int64)
        # pinned order: (n_ab * N / (n_a * n_b)) * 1e6, round half-even
        lift = np.round((nab.astype(np.float64) * n_f
                         / (na.astype(np.float64) * nb.astype(np.float64)))
                        * 1e6).astype(np.int64)
        top = np.lexsort((v, u, -lift))[:k]
        return pa.table({"part_a": pa.array(u[top], pa.int64()),
                         "part_b": pa.array(v[top], pa.int64()),
                         "support": pa.array(nab[top], pa.int64()),
                         "n_a": pa.array(na[top], pa.int64()),
                         "n_b": pa.array(nb[top], pa.int64()),
                         "lift_micro": pa.array(lift[top], pa.int64())})

    merged = partitioned_map_groups(pair_partials, "k", local_topk)
    return merged.sort(["lift_micro", "part_a", "part_b"],
                       descending=[True, False, False]).limit(k)


HITS_SCALE = 1_000_000  # 1e6 fixed-point HITS score units


def hits(edges, iters: int = 3):
    """HITS hubs & authorities (Kleinberg) over a DIRECTED edge
    Dataset of (src, dst) int64 rows, in the pagerank integer
    fixed-point discipline so the result is exact and
    partitioning-independent:

        a_t(v) = sum_{u->v} h_{t-1}(u);  a_t <- (a_t * S) // max(a_t)
        h_t(u) = sum_{u->v} a_t(v);      h_t <- (h_t * S) // max(h_t)

    with S = 1e6 and h_0 = S. Max-normalization (not L2) keeps every
    step in integers; sums and maxes are order-independent, so the
    raw-task folds over the pinned edge blocks (the pagerank "iterative
    loop over a fixed block set" case) are deterministic. int64 is safe
    while max in-degree < 2^62 / S^2 (~9.2e6); guarded explicitly —
    the documented scale path is a 128-bit (hi, lo) split fold.
    Returns (hub_nodes, h, auth_nodes, a) numpy arrays."""
    import ray

    def uniq_col(col: str):
        def go(t: pa.Table) -> pa.Table:
            if t.num_rows == 0 or col not in t.schema.names:
                return pa.table({"node": pa.array([], pa.int64())})
            return pa.table({"node": pa.array(
                np.unique(t.column(col).to_numpy()), pa.int64())})

        return go

    def collect(col: str) -> np.ndarray:
        chunks = []
        for b in edges.map_batches(uniq_col(col), batch_format="pyarrow",
                                   zero_copy_batch=True) \
                .iter_batches(batch_format="pyarrow"):  # |nodes|-bounded
            chunks.append(b.column("node").to_numpy())
        return (np.unique(np.concatenate(chunks)) if chunks
                else np.zeros(0, np.int64))

    hub_nodes = collect("src")
    auth_nodes = collect("dst")
    if hub_nodes.size == 0:
        z = np.zeros(0, np.int64)
        return z, z, z, z

    block_refs = edges.to_arrow_refs()
    hub_ref = ray.put(hub_nodes)
    auth_ref = ray.put(auth_nodes)

    @ray.remote(num_cpus=1)
    def fold_block(t: pa.Table, key_nodes: np.ndarray,
                   key_vals: np.ndarray, key_col: str, sum_col: str):
        if t.num_rows == 0 or key_col not in t.schema.names:
            z = np.zeros(0, np.int64)
            return z, z
        kv = key_vals[np.searchsorted(key_nodes, t.column(key_col)
                                      .to_numpy())]
        other = t.column(sum_col).to_numpy()
        order = np.argsort(other, kind="stable")
        o_s, v_s = other[order], kv[order]
        starts = np.flatnonzero(np.r_[True, o_s[1:] != o_s[:-1]])
        return o_s[starts], np.add.reduceat(v_s, starts)

    def step(vals_ref, from_ref, from_nodes, to_nodes,
             key_col, sum_col) -> np.ndarray:
        parts = ray.get([
            fold_block.remote(r, from_ref, vals_ref, key_col, sum_col)
            for r in block_refs])
        out = np.zeros(to_nodes.size, np.int64)
        for bn, bv in parts:
            np.add.at(out, np.searchsorted(to_nodes, bn), bv)
        m = int(out.max())
        if m > 2 ** 62 // HITS_SCALE:
            raise ValueError(
                "HITS sum exceeds the int64 normalization headroom; "
                "switch to the 128-bit split fold at this degree scale")
        return out * HITS_SCALE // m

    h = np.full(hub_nodes.size, HITS_SCALE, dtype=np.int64)
    a = np.zeros(auth_nodes.size, np.int64)
    for _ in range(iters):
        a = step(ray.put(h), hub_ref, hub_nodes, auth_nodes,
                 "src", "dst")
        h = step(ray.put(a), auth_ref, auth_nodes, hub_nodes,
                 "dst", "src")
    return hub_nodes, h, auth_nodes, a


def purchase_hits(sf_dir: str, iters: int = 3, k: int = 25):
    """Query surface: HITS over the DIRECTED customer -> supplier
    purchase graph (hubs = broad customers, authorities = widely
    bought-from suppliers). Reuses _purchase_edges' distinct edge
    build filtered to the customer->supplier orientation. Output: the
    top-k of each side unioned with a kind column, integer e6 scores
    (ties break (score desc, node)). Oracled via the generated
    unrolled CTE replaying the identical integer recurrence."""
    edges = _purchase_edges(sf_dir)

    def directed(t: pa.Table) -> pa.Table:
        return t.filter(pc.less(t.column("src"),
                                pa.scalar(SUPP_OFFSET, pa.int64())))

    d = edges.map_batches(directed, batch_format="pyarrow",
                          zero_copy_batch=True).materialize()
    hub_nodes, h, auth_nodes, a = hits(d, iters=iters)

    def topk(nodes: np.ndarray, score: np.ndarray, kind: str) -> pa.Table:
        sel = np.lexsort((nodes, -score))[:k]
        return pa.table({
            "kind": pa.array([kind] * sel.size, pa.string()),
            "node": pa.array(nodes[sel], pa.int64()),
            "score_e6": pa.array(score[sel], pa.int64())})

    return pa.concat_tables([topk(auth_nodes, a, "authority"),
                             topk(hub_nodes, h, "hub")])


LINKPRED_BROADCAST_MAX_EDGES = 20_000_000  # same class as the
# triangle module's map-side edge-probe gate: below it the CSR
# adjacency broadcasts (zero pair exchanges); above it the exchange
# plan ships wedge partials through one copartitioned fold instead


def _gather_counts(gathered: np.ndarray, nid: int, wts=None):
    """(sorted unique ys, counts[, weight sums]) of a center's gathered
    neighbor-of-neighbor stream. SPARSE path (sort + segment diff) when
    the gather is much smaller than the id space — the dense bincount
    row allocates O(n_ids) PER CENTER, which is invisible at 20k nodes
    and catastrophic at millions (caught by the 1.5M-node soak); the
    dense path stays for gathers comparable to the id space, where one
    allocation beats the sort. Both produce identical results."""
    if gathered.size * 4 < nid:
        order = np.argsort(gathered, kind="stable")
        g = gathered[order]
        bounds = np.flatnonzero(np.diff(g)) + 1
        starts = np.concatenate(([0], bounds))
        ys = g[starts]
        c = np.diff(np.concatenate((starts, [g.size]))).astype(np.int64)
        ws = (np.add.reduceat(wts[order], starts)
              if wts is not None else None)
        return ys, c, ws
    counts = np.bincount(gathered, minlength=nid)
    ys = np.flatnonzero(counts)
    ws = None
    if wts is not None:
        ws = np.bincount(gathered, weights=wts, minlength=nid)[ys]
    return ys, counts[ys].astype(np.int64), ws


def _resolve_linkpred_plan(plan: str, edges) -> str:
    if plan != "auto":
        return plan
    return ("exchange" if edges.count() > LINKPRED_BROADCAST_MAX_EDGES
            else "broadcast")


def _adj_both(edges):
    def both(t: pa.Table) -> pa.Table:
        u, v = _unpack_edges(t)
        return pa.table({
            "src": pa.array(np.concatenate([u, v]), pa.int64()),
            "dst": pa.array(np.concatenate([v, u]), pa.int64())})

    return edges.map_batches(both, batch_format="pyarrow",
                             zero_copy_batch=True)


def _adj_nodes_deg(adj):
    """|nodes|-bounded (node, degree) fold off the distinct adjacency."""
    node_chunks, n_chunks = [], []
    for b in adj.map_batches(lambda t: _count_partial(t, "src"),
                             batch_format="pyarrow",
                             zero_copy_batch=True) \
            .iter_batches(batch_format="pyarrow"):
        node_chunks.append(b.column("node").to_numpy())
        n_chunks.append(b.column("n").to_numpy())
    if not node_chunks:
        return np.zeros(0, np.int64), np.zeros(0, np.int64)
    nodes = np.unique(np.concatenate(node_chunks))
    deg = np.zeros(nodes.size, np.int64)
    for bn, bv in zip(node_chunks, n_chunks):
        np.add.at(deg, np.searchsorted(nodes, bn), bv)
    return nodes, deg


def _linkpred_topk_exchange(sf_dir: str, k: int, min_common: int,
                            weighted: bool):
    """The over-gate link-prediction plan (edge set too large to
    broadcast): wedge partials — per-partition pre-reduced (pair,
    count[, weight-sum]) rows — flow through ONE copartitioned
    exchange shared with the distinct edge keys, so the existing-edge
    exclusion is a per-partition sorted-set probe and NO edge or pair
    table ever lands on one machine. Degrees (and the Adamic-Adar
    center weights derived from them) broadcast as the |nodes|-bounded
    vector every iterative graph op here already ships. Exactness is
    identical to the broadcast plan (equivalence-tested); the cost is
    the Σ deg² wedge partial stream the broadcast plan avoids."""
    import ray

    from ..broadcast import get_broadcast
    from .relational import copartitioned_map, partitioned_map_groups

    edges = coorder_part_edges(sf_dir)
    adj = _adj_both(edges)
    nodes, deg = _adj_nodes_deg(adj)
    if weighted:
        w = np.zeros(nodes.size, np.float64)
        m2 = deg >= 2
        w[m2] = np.round(1e6 / np.log(deg[m2].astype(np.float64)))
    else:
        w = None
    dref = ray.put((nodes, deg, w))

    def wedge_fold(part: pa.Table, _ref=dref) -> pa.Table:
        empty = pa.table({"k": pa.array([], pa.int64()),
                          "n": pa.array([], pa.int64()),
                          "ws": pa.array([], pa.int64())})
        if part.num_rows == 0:
            return empty
        bnodes, _bdeg, bw = get_broadcast(_ref)
        src = part.column("src").to_numpy()
        dst = part.column("dst").to_numpy()
        order = np.lexsort((dst, src))
        s_s, d_s = src[order], dst[order]
        bounds = np.flatnonzero(np.diff(s_s)) + 1
        starts = np.concatenate(([0], bounds))
        ends = np.concatenate((bounds, [s_s.size]))
        x, y = _segment_pairs(d_s, starts, ends)
        if x.size == 0:
            return empty
        pk = ((x.astype(np.uint64) << np.uint64(32))
              | y.astype(np.uint64)).view(np.int64)
        o2 = np.argsort(pk, kind="stable")
        pk_s = pk[o2]
        b2 = np.flatnonzero(np.diff(pk_s)) + 1
        st2 = np.concatenate(([0], b2))
        cnt = np.diff(np.concatenate((st2, [pk_s.size])))
        if bw is not None:
            # wedge centers, repeated per in-segment pair
            npairs = (ends - starts) * (ends - starts - 1) // 2
            centers = np.repeat(s_s[starts], npairs)
            cw = bw[np.searchsorted(bnodes, centers)][o2]
            ws = np.add.reduceat(cw, st2).astype(np.int64)
        else:
            ws = np.zeros(st2.size, np.int64)
        return pa.table({"k": pa.array(pk_s[st2], pa.int64()),
                         "n": pa.array(cnt.astype(np.int64), pa.int64()),
                         "ws": pa.array(ws, pa.int64())})

    partials = partitioned_map_groups(adj, "src", wedge_fold)

    def prep_pairs(t: pa.Table) -> pa.Table:
        return t

    def prep_edges(t: pa.Table) -> pa.Table:
        return pa.table({"k": t.column("k"),
                         "n": pa.nulls(t.num_rows, pa.int64()),
                         "ws": pa.nulls(t.num_rows, pa.int64())})

    def score_fold(parts: list[pa.Table], _ref=dref) -> pa.Table:
        pair_p, edge_p = parts
        empty = pa.table({"part_a": pa.array([], pa.int64()),
                          "part_b": pa.array([], pa.int64()),
                          "common": pa.array([], pa.int64()),
                          "score": pa.array([], pa.int64())})
        if pair_p.num_rows == 0:
            return empty
        bnodes, bdeg, bw = get_broadcast(_ref)
        pk = pair_p.column("k").to_numpy()
        n = pair_p.column("n").to_numpy()
        ws = pair_p.column("ws").to_numpy()
        order = np.argsort(pk, kind="stable")
        pk_s, n_s, ws_s = pk[order], n[order], ws[order]
        bounds = np.flatnonzero(np.diff(pk_s)) + 1
        starts = np.concatenate(([0], bounds))
        keys = pk_s[starts]
        common = np.add.reduceat(n_s, starts)
        wsum = np.add.reduceat(ws_s, starts)
        m = common >= min_common
        ek = np.sort(edge_p.column("k").to_numpy())
        if ek.size:
            si = np.minimum(np.searchsorted(ek, keys), ek.size - 1)
            m &= ek[si] != keys
        if not m.any():
            return empty
        keys, common, wsum = keys[m], common[m], wsum[m]
        ku = keys.view(np.uint64)
        u = (ku >> np.uint64(32)).astype(np.int64)
        v = (ku & np.uint64(0xFFFFFFFF)).astype(np.int64)
        if bw is not None:
            score = wsum
        else:
            da = bdeg[np.searchsorted(bnodes, u)]
            db = bdeg[np.searchsorted(bnodes, v)]
            score = common * 1_000_000 // (da + db - common)
        top = np.lexsort((v, u, -score))[:k]
        return pa.table({"part_a": pa.array(u[top], pa.int64()),
                         "part_b": pa.array(v[top], pa.int64()),
                         "common": pa.array(common[top], pa.int64()),
                         "score": pa.array(score[top], pa.int64())})

    merged = copartitioned_map([(partials, prep_pairs),
                                (edges, prep_edges)], "k", score_fold)

    def finish(t: pa.Table) -> pa.Table:
        if weighted:
            return pa.table({"part_a": t.column("part_a"),
                             "part_b": t.column("part_b"),
                             "common": t.column("common"),
                             "aa_micro": t.column("score")})
        bnodes, bdeg, _bw = get_broadcast(dref)
        u = t.column("part_a").to_numpy()
        v = t.column("part_b").to_numpy()
        return pa.table({"part_a": t.column("part_a"),
                         "part_b": t.column("part_b"),
                         "common": t.column("common"),
                         "deg_a": pa.array(
                             bdeg[np.searchsorted(bnodes, u)], pa.int64()),
                         "deg_b": pa.array(
                             bdeg[np.searchsorted(bnodes, v)], pa.int64()),
                         "jac_micro": t.column("score")})

    sort_col = "aa_micro" if weighted else "jac_micro"
    return merged.map_batches(finish, batch_format="pyarrow",
                              zero_copy_batch=True) \
        .sort([sort_col, "part_a", "part_b"],
              descending=[True, False, False]).limit(k)


def parts_neighbor_jaccard(sf_dir: str, k: int = 25, min_common: int = 2,
                           plan: str = "auto"):
    """Link prediction by neighborhood Jaccard over the co-purchase
    part graph: for NON-adjacent part pairs, rank by |N(a) ∩ N(b)| /
    |N(a) ∪ N(b)| (the classic similarity heuristic — pairs never
    bought together whose neighborhoods overlap).

    Two plans behind an auto-gate (LINKPRED_BROADCAST_MAX_EDGES,
    equivalence-tested): below it the CSR adjacency broadcasts once
    (|edges| ints — the triangle module's map-side edge-probe class)
    and each partition computes, for every center x it owns, the
    EXACT GLOBAL common-neighbor count to all y in one neighbor-list
    gather + bincount (the A² row restricted to x) — each unordered
    pair produced exactly once (y > x), already globally correct, so
    per-partition top-k unions + a tiny global sort finish with ZERO
    pair exchanges (the naive wedge-exchange alternative moved ~150M
    mostly-count-1 pairs at sf0.1: 45 s -> 5.5 s). Above the gate
    _linkpred_topk_exchange ships pre-reduced wedge partials through
    one copartitioned fold shared with the edge keys instead. Scores
    are exact integers: jac_micro = common * 1e6 // (da + db - c)."""
    import ray

    from ..broadcast import get_broadcast
    from .relational import partitioned_map_groups

    edges = coorder_part_edges(sf_dir)  # packed u<v int64 keys
    if _resolve_linkpred_plan(plan, edges) == "exchange":
        return _linkpred_topk_exchange(sf_dir, k, min_common,
                                       weighted=False)

    adj = _adj_both(edges)

    # CSR build: edge keys are already globally distinct; collect the
    # sorted (src, dst) arrays once (|edges|-bounded, the documented
    # broadcast class) and index by raw node id
    ek_chunks = [b.column("k").to_numpy()
                 for b in edges.iter_batches(batch_format="pyarrow")]
    if not ek_chunks or not sum(c.size for c in ek_chunks):
        return pa.schema([
            ("part_a", pa.int64()), ("part_b", pa.int64()),
            ("common", pa.int64()), ("deg_a", pa.int64()),
            ("deg_b", pa.int64()), ("jac_micro", pa.int64()),
        ]).empty_table()
    ku = np.unique(np.concatenate(ek_chunks)).view(np.uint64)
    a = (ku >> np.uint64(32)).astype(np.int64)
    b = (ku & np.uint64(0xFFFFFFFF)).astype(np.int64)
    src = np.concatenate([a, b])
    dst = np.concatenate([b, a])
    order = np.lexsort((dst, src))
    src, dst = src[order], dst[order]
    n_ids = int(src.max()) + 1
    offsets = np.zeros(n_ids + 1, np.int64)
    np.add.at(offsets, src + 1, 1)
    offsets = np.cumsum(offsets)
    deg = np.diff(offsets)
    csr_ref = ray.put((offsets, dst, deg, np.int64(n_ids)))

    def local_topk(part: pa.Table, _ref=csr_ref) -> pa.Table:
        empty = pa.table({"part_a": pa.array([], pa.int64()),
                          "part_b": pa.array([], pa.int64()),
                          "common": pa.array([], pa.int64()),
                          "deg_a": pa.array([], pa.int64()),
                          "deg_b": pa.array([], pa.int64()),
                          "jac_micro": pa.array([], pa.int64())})
        if part.num_rows == 0:
            return empty
        offs, nb, dg, nid = get_broadcast(_ref)
        centers = np.unique(part.column("src").to_numpy())
        pa_l, pb_l, c_l, da_l, db_l, j_l = [], [], [], [], [], []
        for x in centers.tolist():
            neigh = nb[offs[x]:offs[x + 1]]
            if neigh.size == 0:
                continue
            # one gather of all neighbor lists + bincount = exact
            # global common(x, y) for every y at once
            reps = (offs[neigh + 1] - offs[neigh])
            total = int(reps.sum())
            if total == 0:
                continue
            idx = np.repeat(offs[neigh], reps)                 + (np.arange(total, dtype=np.int64)
                   - np.repeat(np.cumsum(reps) - reps, reps))
            ys, c, _ = _gather_counts(nb[idx], int(nid))
            m = (ys > x) & (c >= min_common)   # pairs once; support
            if m.any() and neigh.size:         # existing edges out
                si = np.minimum(np.searchsorted(neigh, ys),
                                neigh.size - 1)
                m &= neigh[si] != ys
            if not m.any():
                continue
            ys, c = ys[m], c[m]
            da = dg[x]
            db = dg[ys]
            jac = c * 1_000_000 // (da + db - c)
            if ys.size > k:  # keep only this center's top-k
                sel = np.lexsort((ys, -jac))[:k]
                ys, c, db, jac = ys[sel], c[sel], db[sel], jac[sel]
            pa_l.append(np.full(ys.size, x, np.int64))
            pb_l.append(ys.astype(np.int64))
            c_l.append(c)
            da_l.append(np.full(ys.size, da, np.int64))
            db_l.append(db.astype(np.int64))
            j_l.append(jac)
        if not pa_l:
            return empty
        u = np.concatenate(pa_l)
        v = np.concatenate(pb_l)
        c = np.concatenate(c_l)
        da = np.concatenate(da_l)
        db = np.concatenate(db_l)
        jac = np.concatenate(j_l)
        top = np.lexsort((v, u, -jac))[:k]
        return pa.table({"part_a": pa.array(u[top], pa.int64()),
                         "part_b": pa.array(v[top], pa.int64()),
                         "common": pa.array(c[top], pa.int64()),
                         "deg_a": pa.array(da[top], pa.int64()),
                         "deg_b": pa.array(db[top], pa.int64()),
                         "jac_micro": pa.array(jac[top], pa.int64())})

    merged = partitioned_map_groups(adj, "src", local_topk)
    return merged.sort(["jac_micro", "part_a", "part_b"],
                       descending=[True, False, False]).limit(k)


def parts_adamic_adar(sf_dir: str, k: int = 25, min_common: int = 2,
                      plan: str = "auto"):
    """Adamic-Adar link prediction over the co-purchase part graph —
    the degree-weighted twin of parts_neighbor_jaccard: non-adjacent
    pairs scored by sum over common neighbors w of 1 / ln(deg(w)),
    down-weighting promiscuous hubs. Same two plans behind the same
    auto-gate (equivalence-tested): below it the CSR adjacency
    broadcasts once and each center's weighted common counts to ALL y
    come from ONE weighted bincount (weights are the pinned integer
    micro-units round_even(1e6 / ln(deg_w)); every partial sum stays
    integer-valued far below 2^53, so the float accumulator is exact
    and order-independent); a second unweighted bincount applies the
    same min_common support filter; pairs are produced once (y > x)
    with globally exact scores, so per-center/partition top-k unions
    stay exact. Above the gate the shared copartitioned wedge-partial
    exchange takes over with the weight folded at wedge time."""
    import ray

    from ..broadcast import get_broadcast
    from .relational import partitioned_map_groups

    edges = coorder_part_edges(sf_dir)
    if _resolve_linkpred_plan(plan, edges) == "exchange":
        return _linkpred_topk_exchange(sf_dir, k, min_common,
                                       weighted=True)

    adj = _adj_both(edges)

    ek_chunks = [b.column("k").to_numpy()
                 for b in edges.iter_batches(batch_format="pyarrow")]
    if not ek_chunks or not sum(c.size for c in ek_chunks):
        return pa.schema([
            ("part_a", pa.int64()), ("part_b", pa.int64()),
            ("common", pa.int64()), ("aa_micro", pa.int64()),
        ]).empty_table()
    ku = np.unique(np.concatenate(ek_chunks)).view(np.uint64)
    a = (ku >> np.uint64(32)).astype(np.int64)
    b = (ku & np.uint64(0xFFFFFFFF)).astype(np.int64)
    src = np.concatenate([a, b])
    dst = np.concatenate([b, a])
    order = np.lexsort((dst, src))
    src, dst = src[order], dst[order]
    n_ids = int(src.max()) + 1
    offsets = np.zeros(n_ids + 1, np.int64)
    np.add.at(offsets, src + 1, 1)
    offsets = np.cumsum(offsets)
    deg = np.diff(offsets)
    # pinned center weight: round_even(1e6 / ln(deg)); deg-1 centers
    # can never be a COMMON neighbor of two others, weight unused
    w = np.zeros(n_ids, np.float64)
    m2 = deg >= 2
    w[m2] = np.round(1e6 / np.log(deg[m2].astype(np.float64)))
    csr_ref = ray.put((offsets, dst, deg, w, np.int64(n_ids)))

    def local_topk(part: pa.Table, _ref=csr_ref) -> pa.Table:
        empty = pa.table({"part_a": pa.array([], pa.int64()),
                          "part_b": pa.array([], pa.int64()),
                          "common": pa.array([], pa.int64()),
                          "aa_micro": pa.array([], pa.int64())})
        if part.num_rows == 0:
            return empty
        offs, nb, dg, wt, nid = get_broadcast(_ref)
        centers = np.unique(part.column("src").to_numpy())
        pa_l, pb_l, c_l, s_l = [], [], [], []
        for x in centers.tolist():
            neigh = nb[offs[x]:offs[x + 1]]
            if neigh.size == 0:
                continue
            reps = offs[neigh + 1] - offs[neigh]
            total = int(reps.sum())
            if total == 0:
                continue
            idx = np.repeat(offs[neigh], reps) \
                + (np.arange(total, dtype=np.int64)
                   - np.repeat(np.cumsum(reps) - reps, reps))
            ys, c, ws = _gather_counts(nb[idx], int(nid),
                                       wts=np.repeat(wt[neigh], reps))
            m = (ys > x) & (c >= min_common)
            if m.any() and neigh.size:
                si = np.minimum(np.searchsorted(neigh, ys),
                                neigh.size - 1)
                m &= neigh[si] != ys
            if not m.any():
                continue
            ys, c = ys[m], c[m]
            s = ws[m].astype(np.int64)  # exact integer-valued floats
            if ys.size > k:
                sel = np.lexsort((ys, -s))[:k]
                ys, c, s = ys[sel], c[sel], s[sel]
            pa_l.append(np.full(ys.size, x, np.int64))
            pb_l.append(ys.astype(np.int64))
            c_l.append(c)
            s_l.append(s)
        if not pa_l:
            return empty
        u = np.concatenate(pa_l)
        v = np.concatenate(pb_l)
        c = np.concatenate(c_l)
        s = np.concatenate(s_l)
        top = np.lexsort((v, u, -s))[:k]
        return pa.table({"part_a": pa.array(u[top], pa.int64()),
                         "part_b": pa.array(v[top], pa.int64()),
                         "common": pa.array(c[top], pa.int64()),
                         "aa_micro": pa.array(s[top], pa.int64())})

    merged = partitioned_map_groups(adj, "src", local_topk)
    return merged.sort(["aa_micro", "part_a", "part_b"],
                       descending=[True, False, False]).limit(k)


def _cc_exchange(edges):
    """Over-gate clustering-coefficient plan: center-tagged wedge rows
    co-partition with the distinct edge keys (the triangle module's
    copartitioned-match shape), matches count per center, and one
    |nodes|-bounded center-keyed fold finishes — neither the edge set
    nor the wedge stream broadcasts or lands whole anywhere."""
    import ray.data as rd

    from .relational import copartitioned_map, partitioned_map_groups

    adj = _adj_both(edges).materialize()
    nodes, deg = _adj_nodes_deg(adj)
    if nodes.size == 0:
        return rd.from_arrow(pa.table({
            "node": pa.array([], pa.int64()),
            "degree": pa.array([], pa.int64()),
            "triangles": pa.array([], pa.int64()),
            "cc_micro": pa.array([], pa.int64())}))

    def wedge_fold(part: pa.Table) -> pa.Table:
        empty = pa.table({"k": pa.array([], pa.int64()),
                          "c": pa.array([], pa.int64())})
        if part.num_rows == 0:
            return empty
        src = part.column("src").to_numpy()
        dst = part.column("dst").to_numpy()
        order = np.lexsort((dst, src))
        s_s, d_s = src[order], dst[order]
        bounds = np.flatnonzero(np.diff(s_s)) + 1
        starts = np.concatenate(([0], bounds))
        ends = np.concatenate((bounds, [s_s.size]))
        x, y = _segment_pairs(d_s, starts, ends)
        if x.size == 0:
            return empty
        npairs = (ends - starts) * (ends - starts - 1) // 2
        centers = np.repeat(s_s[starts], npairs)
        pk = ((x.astype(np.uint64) << np.uint64(32))
              | y.astype(np.uint64)).view(np.int64)
        return pa.table({"k": pa.array(pk, pa.int64()),
                         "c": pa.array(centers, pa.int64())})

    wp = partitioned_map_groups(adj, "src", wedge_fold)

    def prep_w(t: pa.Table) -> pa.Table:
        return t

    def prep_e(t: pa.Table) -> pa.Table:
        return pa.table({"k": t.column("k"),
                         "c": pa.nulls(t.num_rows, pa.int64())})

    def match_fold(parts: list[pa.Table]) -> pa.Table:
        w_p, e_p = parts
        empty = pa.table({"c": pa.array([], pa.int64()),
                          "t": pa.array([], pa.int64())})
        if w_p.num_rows == 0 or e_p.num_rows == 0:
            return empty
        ek = np.sort(e_p.column("k").to_numpy())
        wk = w_p.column("k").to_numpy()
        si = np.minimum(np.searchsorted(ek, wk), ek.size - 1)
        hit = ek[si] == wk
        if not hit.any():
            return empty
        cs, ts = np.unique(w_p.column("c").to_numpy()[hit],
                           return_counts=True)
        return pa.table({"c": pa.array(cs, pa.int64()),
                         "t": pa.array(ts.astype(np.int64), pa.int64())})

    tri_parts = copartitioned_map([(wp, prep_w), (edges, prep_e)],
                                  "k", match_fold)
    tri = np.zeros(nodes.size, np.int64)
    for b in tri_parts.iter_batches(batch_format="pyarrow"):
        np.add.at(tri, np.searchsorted(nodes, b.column("c").to_numpy()),
                  b.column("t").to_numpy())
    pairs = deg * (deg - 1) // 2
    cc = np.where(pairs > 0, tri * 1_000_000 // np.maximum(pairs, 1), 0)
    return rd.from_arrow(pa.table({
        "node": pa.array(nodes, pa.int64()),
        "degree": pa.array(deg, pa.int64()),
        "triangles": pa.array(tri, pa.int64()),
        "cc_micro": pa.array(cc, pa.int64())}))


def parts_clustering_coeff(sf_dir: str, plan: str = "auto"):
    """Per-node local clustering coefficient over the co-purchase part
    graph (triangles at the node / (deg choose 2) — the transitivity
    probe next to the global triangle count): under the shared
    LINKPRED_BROADCAST_MAX_EDGES gate, the zero-exchange CSR plan of
    the link predictors — each partition owns its centers, one gather
    + bincount gives the center's common-neighbor row, and the node's
    triangle count is the sum of that row over its OWN neighbors
    halved (each triangle at x is counted from both of its other
    corners). Above the gate _cc_exchange co-partitions center-tagged
    wedges with the edge keys instead (plans equivalence-tested).
    cc_micro = tri * 1e6 // (deg * (deg-1) / 2) is exact integer;
    deg-1 nodes emit cc_micro = 0 with tri = 0."""
    import ray

    from ..broadcast import get_broadcast
    from .relational import partitioned_map_groups

    edges = coorder_part_edges(sf_dir)
    if _resolve_linkpred_plan(plan, edges) == "exchange":
        return _cc_exchange(edges)

    adj = _adj_both(edges)

    ek_chunks = [b.column("k").to_numpy()
                 for b in edges.iter_batches(batch_format="pyarrow")]
    if not ek_chunks or not sum(c.size for c in ek_chunks):
        return pa.schema([
            ("node", pa.int64()), ("degree", pa.int64()),
            ("triangles", pa.int64()), ("cc_micro", pa.int64()),
        ]).empty_table()
    ku = np.unique(np.concatenate(ek_chunks)).view(np.uint64)
    a = (ku >> np.uint64(32)).astype(np.int64)
    b = (ku & np.uint64(0xFFFFFFFF)).astype(np.int64)
    src = np.concatenate([a, b])
    dst = np.concatenate([b, a])
    order = np.lexsort((dst, src))
    src, dst = src[order], dst[order]
    n_ids = int(src.max()) + 1
    offsets = np.zeros(n_ids + 1, np.int64)
    np.add.at(offsets, src + 1, 1)
    offsets = np.cumsum(offsets)
    csr_ref = ray.put((offsets, dst))

    def cc_fold(part: pa.Table, _ref=csr_ref) -> pa.Table:
        empty = pa.table({"node": pa.array([], pa.int64()),
                          "degree": pa.array([], pa.int64()),
                          "triangles": pa.array([], pa.int64()),
                          "cc_micro": pa.array([], pa.int64())})
        if part.num_rows == 0:
            return empty
        offs, nb = get_broadcast(_ref)
        centers = np.unique(part.column("src").to_numpy())
        deg_l, tri_l = [], []
        for x in centers.tolist():
            neigh = nb[offs[x]:offs[x + 1]]
            d = neigh.size
            if d < 2:
                deg_l.append(d)
                tri_l.append(0)
                continue
            reps = offs[neigh + 1] - offs[neigh]
            total = int(reps.sum())
            idx = np.repeat(offs[neigh], reps) \
                + (np.arange(total, dtype=np.int64)
                   - np.repeat(np.cumsum(reps) - reps, reps))
            ys, cnt, _ = _gather_counts(nb[idx],
                                        int(neigh.max()) + 2)
            si = np.minimum(np.searchsorted(neigh, ys),
                            neigh.size - 1)
            tri2 = int(cnt[neigh[si] == ys].sum())  # triangles, twice
            deg_l.append(d)
            tri_l.append(tri2 // 2)
        deg = np.array(deg_l, np.int64)
        tri = np.array(tri_l, np.int64)
        pairs = deg * (deg - 1) // 2
        cc = np.where(pairs > 0, tri * 1_000_000 // np.maximum(pairs, 1),
                      0)
        return pa.table({"node": pa.array(centers, pa.int64()),
                         "degree": pa.array(deg, pa.int64()),
                         "triangles": pa.array(tri, pa.int64()),
                         "cc_micro": pa.array(cc, pa.int64())})

    return partitioned_map_groups(adj, "src", cc_fold)


# --- label-propagation community detection ----------------------------------
# LPA (Raghavan et al. 2007) made DETERMINISTIC: synchronous rounds,
# every node simultaneously adopts the label most frequent among its
# neighbors, ties -> smallest label (the async/random-order variants
# of the paper are irreproducible across partitionings; the
# synchronous min-tie form is a pure function of the edge set, so the
# DuckDB oracle can unroll the identical rounds — the kcore/PageRank
# discipline). A FIXED round budget keeps both sides aligned.


def label_propagation_edges(edges, rounds: int = 3):
    """Communities over a materialized packed-key undirected edge
    Dataset. Per round: the |nodes|-bounded (node -> label) vector
    broadcasts once (the PageRank pattern — bounded by nodes, never
    edges), each edge emits its two directed (node, neighbor_label)
    pairs map-side, and ONE node-keyed partitioned fold counts labels
    and picks (count DESC, label ASC) vectorized. Returns
    (node, label) rows; label ids are seed node ids, so communities
    are named by their smallest... most-propagated member."""
    import ray

    from ..broadcast import get_broadcast
    from .relational import partitioned_map_groups

    degs = _edge_degrees(edges)
    nodes_c = []
    for b in degs.iter_batches(batch_format="pyarrow"):  # |nodes|
        nodes_c.append(b.column("node").to_numpy())
    nodes = np.sort(np.concatenate(nodes_c)) if nodes_c \
        else np.zeros(0, np.int64)
    labels = nodes.copy()
    if nodes.size == 0:
        import ray.data as rd

        return rd.from_arrow(pa.table({
            "node": pa.array([], pa.int64()),
            "label": pa.array([], pa.int64())}))

    def fold(part: pa.Table) -> pa.Table:
        if part.num_rows == 0:
            return pa.table({"node": pa.array([], pa.int64()),
                             "label": pa.array([], pa.int64())})
        n = part.column("node").to_numpy()
        la = part.column("lab").to_numpy()
        c_ = part.column("c").to_numpy()
        # aggregate duplicate (node, lab) partials, then argmax with
        # (count DESC, lab ASC) per node — all segment ops
        order = np.lexsort((la, n))
        n, la, c_ = n[order], la[order], c_[order]
        new = np.concatenate(([True], (np.diff(n) != 0)
                              | (np.diff(la) != 0)))
        seg = np.cumsum(new) - 1
        cs = np.bincount(seg, weights=c_).astype(np.int64)
        ns, ls = n[new], la[new]
        pick = np.lexsort((ls, -cs, ns))
        first = np.concatenate(([True], np.diff(ns[pick]) != 0))
        sel = pick[first]
        return pa.table({"node": pa.array(ns[sel], pa.int64()),
                         "label": pa.array(ls[sel], pa.int64())})

    for _ in range(rounds):
        ref = ray.put((nodes, labels))

        def pairs(t: pa.Table, _ref=ref) -> pa.Table:
            nv, lb = get_broadcast(_ref)
            u, v = _unpack_edges(t)
            lu = lb[np.searchsorted(nv, u)]
            lv = lb[np.searchsorted(nv, v)]
            node = np.concatenate([u, v])
            lab = np.concatenate([lv, lu])
            # in-batch partial count of (node, lab) pairs
            order = np.lexsort((lab, node))
            node, lab = node[order], lab[order]
            newp = np.concatenate(([True], (np.diff(node) != 0)
                                   | (np.diff(lab) != 0)))
            seg = np.cumsum(newp) - 1
            c = np.bincount(seg).astype(np.int64)
            return pa.table({
                "node": pa.array(node[newp], pa.int64()),
                "lab": pa.array(lab[newp], pa.int64()),
                "c": pa.array(c, pa.int64())})

        counted = partitioned_map_groups(
            edges.map_batches(pairs, batch_format="pyarrow",
                              zero_copy_batch=True), "node", fold)
        new_nodes, new_labels = [], []
        for b in counted.iter_batches(batch_format="pyarrow"):
            new_nodes.append(b.column("node").to_numpy())
            new_labels.append(b.column("label").to_numpy())
        nn = np.concatenate(new_nodes)
        nl = np.concatenate(new_labels)
        order = np.argsort(nn)
        nn, nl = nn[order], nl[order]
        # isolated nodes (none here by construction) would keep labels
        idx = np.searchsorted(nodes, nn)
        labels = labels.copy()
        labels[idx] = nl

    import ray.data as rd

    return rd.from_arrow(pa.table({
        "node": pa.array(nodes, pa.int64()),
        "label": pa.array(labels, pa.int64())}))


def parts_communities(sf_dir: str, rounds: int = 3):
    """ORACLED query surface: synchronous min-tie label propagation
    over the co-order part graph; the DuckDB twin unrolls the same
    rounds (neighbor-label join + count + row_number pick)."""
    return label_propagation_edges(coorder_part_edges(sf_dir),
                                   rounds=rounds)
