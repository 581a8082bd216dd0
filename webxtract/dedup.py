"""Exact dedup by url — latest ``warc_ts`` wins (D1).

Generalizes the reference's drafted content-key idempotency token
(textract-integration/fn-call-textract/main.py:73-75) and the client's
"drop events older than the last seen timestamp" recency rule
(SmartOCR.vue:255-257) into a batch operator: one row per url, the row
with the greatest warc_ts; ties broken by descending html bytes so the
result is fully content-deterministic under any shuffle.

Scale note: this is ONE hash shuffle on the partition key ``url``
(SURVEY.md §7.3) — the only all-to-all exchange in the ingest path.
Groups are tiny (dup rate ~3%), so `map_groups` per-group work is O(1).
"""

from __future__ import annotations

import pyarrow as pa
import pyarrow.compute as pc


def _latest_per_group(group: pa.Table) -> pa.Table:
    if group.num_rows == 1:
        return group
    # stable total order: (warc_ts desc, html desc) -> take first
    idx = pc.sort_indices(
        group,
        sort_keys=[("warc_ts", "descending"), ("html", "descending")],
    )
    return group.take(idx[:1])


def dedup_pages(ds):
    """ray.data.Dataset[PAGES] -> one row per url (latest warc_ts).

    Exact variant: one hash shuffle of the FULL rows + per-group pick.
    Correct for arbitrary ties but pays the full-blob exchange; prefer
    dedup_pages_fast for corpora where (url, warc_ts) identifies the
    winner (true for crawl data: same url+fetch-time = same capture)."""
    return ds.groupby("url").map_groups(_latest_per_group, batch_format="pyarrow")


def dedup_pages_fast(ds, source_path: str | None = None):
    """Shuffle-minimal dedup: aggregate winners over a column-pruned
    projection, then broadcast-filter the full rows.

    Phase 1 shuffles only (url, warc_ts) pairs (~70 B/row instead of the
    multi-KB html blobs — a ~50x smaller exchange), vectorized Max/Count
    aggregation (no per-group Python). Phase 2 is an embarrassingly
    parallel filter against the broadcast dup-winner dict (dup rate is
    low, so the dict holds only duplicated urls, not the whole keyspace).

    ASSUMPTIONS (documented; asserted by tests on the synth corpus):
    no two rows share (url, warc_ts) — rows that did would BOTH
    survive — and warc_ts is non-null (a null-ts row of a duplicated
    url would be dropped; an all-null-ts duplicate group survives
    undeduped). Use dedup_pages (exact) for corpora where either can
    occur. At 10^12 scale the broadcast dict becomes a hash semi-join
    of the dup-url list instead.

    ``source_path``: when given, phase 1 re-reads just (url, warc_ts)
    from parquet (column pruning at the read) instead of projecting the
    in-flight dataset — avoids decoding html twice.
    """
    if source_path is not None:
        import ray.data as rd

        paths = ([source_path] if isinstance(source_path, str)
                 else list(source_path))
        if _total_size(paths) <= DUP_SCAN_LOCAL_MAX_BYTES:
            return filter_to_winners(ds, dup_winners_local(paths))
        proj = rd.read_parquet(paths, columns=["url", "warc_ts"])
    else:
        proj = ds.select_columns(["url", "warc_ts"])
    dup_tbl = dup_winners(proj)
    return filter_to_winners(ds, dup_tbl)


# Below this total compressed input size the winner aggregation runs as
# a driver-side Arrow hash-aggregate over the pruned (url, warc_ts)
# read: Ray's sort-based groupby pays ~8s of FIXED exchange overhead per
# call on this box vs ~0.3s for Arrow's multithreaded C++ kernel on the
# same 600k slim rows. Above the gate (slim projection no longer
# node-sized) the distributed groupby takes over. Same auto-gate +
# equivalence-test pattern as verify="join" (tests/test_dedup.py).
DUP_SCAN_LOCAL_MAX_BYTES = 2 << 30


def _total_size(paths: list[str]) -> int:
    import os

    total = 0
    for p in paths:
        if os.path.isdir(p):
            for f in os.listdir(p):
                if f.endswith(".parquet"):
                    total += os.stat(os.path.join(p, f)).st_size
        else:
            total += os.stat(p).st_size
    return total


def dup_winners_local(paths: list[str]) -> pa.Table | None:
    """Driver-side twin of ``dup_winners`` over parquet paths (same
    output: (url, max_ts) of duplicated urls, None when dup-free)."""
    import os
    from concurrent.futures import ThreadPoolExecutor

    import pyarrow.parquet as pq

    files: list[str] = []
    for p in paths:
        if os.path.isdir(p):
            files.extend(os.path.join(p, f) for f in sorted(os.listdir(p))
                         if f.endswith(".parquet"))
        else:
            files.append(p)
    with ThreadPoolExecutor(max_workers=8) as pool:
        tables = list(pool.map(
            lambda f: pq.read_table(f, columns=["url", "warc_ts"]), files))
    t = pa.concat_tables(tables)
    agg = t.group_by("url").aggregate([("warc_ts", "max"), ([], "count_all")])
    d = agg.filter(pc.greater(agg.column("count_all"), 1))
    if d.num_rows == 0:
        return None
    return pa.table({"url": d.column("url"),
                     "max_ts": d.column("warc_ts_max")}).combine_chunks()


def dup_winners(proj) -> pa.Table | None:
    """(url, warc_ts) Dataset -> (url, max_ts) table of DUPLICATED urls
    only (None when dup-free). The exchange carries (url, ts) pairs;
    the returned table is dup-rate-sized."""
    from ray.data.aggregate import Count, Max

    agg = proj.groupby("url").aggregate(
        Max("warc_ts", alias_name="max_ts"), Count(alias_name="n"))
    dup_batches = []
    for b in agg.iter_batches(batch_format="pyarrow"):
        d = b.filter(pc.greater(b.column("n"), 1)).select(["url", "max_ts"])
        if d.num_rows:
            dup_batches.append(d)
    # typed Arrow table (keeps the winner-timestamp type exact for the
    # vectorized equality probe)
    return (pa.concat_tables(dup_batches).combine_chunks()
            if dup_batches else None)


def filter_to_winners(ds, dup_tbl: pa.Table | None):
    """Broadcast-filter ``ds`` to dedup winners: a row survives iff its
    url is unduplicated (absent from ``dup_tbl``) or its warc_ts equals
    the winning (max) ts for that url."""
    import ray

    if dup_tbl is None or dup_tbl.num_rows == 0:
        return ds
    ref = ray.put(dup_tbl)

    # task-pool stage (NOT an actor pool: lookup stages must stay elastic —
    # see broadcast.py); the dup table is fetched via the per-worker cache
    def keep_latest(batch: pa.Table) -> pa.Table:
        from .broadcast import get_broadcast

        dup = get_broadcast(ref)
        # vectorized probe; a null-ts row of a duplicated url compares
        # null -> dropped (same contract as the documented assumptions)
        idx = pc.index_in(batch.column("url"), value_set=dup.column("url"))
        win_ts = pc.take(dup.column("max_ts"), idx)
        keep = pc.or_kleene(pc.is_null(idx),
                            pc.equal(batch.column("warc_ts"), win_ts))
        return batch.filter(keep)

    return ds.map_batches(keep_latest, batch_format="pyarrow",
                          zero_copy_batch=True)


def dedup_pages_join(ds, source_path: str | None = None,
                     num_partitions: int | None = None):
    """The 10^12-row variant of dedup_pages_fast: winners stay a DATASET
    and reach the rows via a hash-partitioned LEFT join on url instead
    of a driver-collected broadcast table (a 3% dup rate over 10^12
    urls is ~30B winner rows — far beyond any broadcast or driver).

    Costs one all-to-all of the full rows (the join exchange), which
    dedup_pages_fast avoids — use it when the dup-winner table outgrows
    the object store; semantics are identical (equivalence-tested)."""
    import ray.data as rd
    from ray.data.aggregate import Count, Max

    if source_path is not None:
        proj = rd.read_parquet(source_path, columns=["url", "warc_ts"])
    else:
        proj = ds.select_columns(["url", "warc_ts"])
    agg = proj.groupby("url").aggregate(
        Max("warc_ts", alias_name="_max_ts"), Count(alias_name="_n"))

    def dups_only(t: pa.Table) -> pa.Table:
        if t.num_columns == 0:  # empty shuffle partition lost its schema
            return pa.table({"url": pa.array([], pa.string()),
                             "_max_ts": pa.array([], pa.timestamp("us"))})
        return t.filter(pc.greater(t.column("_n"), 1)) \
                .select(["url", "_max_ts"])

    from .ops.dedup import _drop_empty_blocks

    # materialized in the OBJECT STORE (distributed, never the driver);
    # schema-less empty shuffle partitions would break the Acero join
    # and pass through map_batches unprocessed, so drop them by ref
    winners = _drop_empty_blocks(
        agg.map_batches(dups_only, batch_format="pyarrow",
                        zero_copy_batch=True).materialize())
    if num_partitions is None:
        try:
            import ray

            num_partitions = max(2, int(
                ray.cluster_resources().get("CPU", 8)))
        except Exception:
            num_partitions = 8
    joined = ds.join(winners, join_type="left_outer",
                     num_partitions=num_partitions, on=("url",))

    def keep(t: pa.Table) -> pa.Table:
        m = pc.or_kleene(pc.is_null(t.column("_max_ts")),
                         pc.equal(t.column("warc_ts"), t.column("_max_ts")))
        return t.filter(m).drop_columns(["_max_ts"])

    return joined.map_batches(keep, batch_format="pyarrow",
                              zero_copy_batch=True)


def dedup_table(t: pa.Table) -> pa.Table:
    """Single-table (oracle/test) variant with identical semantics."""
    idx = pc.sort_indices(
        t, sort_keys=[("url", "ascending"), ("warc_ts", "descending"),
                      ("html", "descending")]
    )
    t = t.take(idx)
    urls = t.column("url").to_pylist()
    keep = [i for i, u in enumerate(urls) if i == 0 or u != urls[i - 1]]
    return t.take(pa.array(keep, pa.int64()))
