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


def _purchase_edges(sf_dir: str):
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
