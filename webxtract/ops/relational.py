"""Relational operators over the driver's TPC-H-ish tables.

Generic engine pieces exercised by the DuckDB-oracle gate: filters,
grouped aggregates (partial-then-final), broadcast map-side joins,
windowed (tumbling) aggregates, latest-per-key dedup, top-k.

Scale shapes:
  * broadcast_join — small side materialized once, ray.put, dict lookup
    per batch (no shuffle); the pattern for dimension tables
    (SURVEY.md J1; ray_guide "Joins and lookups").
  * grouped aggregates use ray.data.aggregate.* which pre-reduces per
    block before the exchange.
  * latest_per_key mirrors the reference client's event-recency rule
    (SmartOCR.vue:255-257 — drop events older than last seen ts).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc


def _cents(arr) -> pa.Array:
    """Exact integer cents (DuckDB round() is half-away-from-zero)."""
    return pc.round(pc.multiply(arr, pa.scalar(100.0)), 0,
                    round_mode="half_towards_infinity").cast(pa.int64())


def _uncents(arr) -> pa.Array:
    return pc.round(pc.divide(arr.cast(pa.float64()), pa.scalar(100.0)), 2)


def round_ha(x, nd: int):
    """Round half AWAY from zero, matching DuckDB's round() on DOUBLE —
    numpy, pyarrow and Python all default to half-to-even. The modes
    genuinely diverge on final outputs that are integer ratios (shares,
    averages, coverage fractions, e4-unit money sums): the 10^-nd tie
    is EXACT whenever the reduced denominator carries enough factors of
    two (an average over 32 rows, a fraction over 128 tokens, an e4 sum
    ending in 50), and then the value-hash oracle compare flags a
    phantom mismatch. floor(|x|*10^nd + 0.5) equals C++ std::round on
    the identically computed scaled double (the addition is exact below
    2^51, far above any rounded output here). Accepts float, ndarray,
    or pyarrow (Chunked)Array; nan passes through."""
    f = 10.0 ** nd
    if isinstance(x, (pa.ChunkedArray, pa.Array)):
        v = x.to_numpy(zero_copy_only=False).astype(np.float64)
        null_mask = None
        if isinstance(x, pa.ChunkedArray):
            x = x.combine_chunks()
        if x.null_count:  # preserve nulls (to_numpy turns them into NaN)
            null_mask = pc.is_null(x).to_numpy(zero_copy_only=False)
        return pa.array(np.sign(v) * np.floor(np.abs(v) * f + 0.5) / f,
                        pa.float64(), mask=null_mask)
    v = np.asarray(x, dtype=np.float64)
    out = np.sign(v) * np.floor(np.abs(v) * f + 0.5) / f
    return float(out) if out.ndim == 0 else out


def dim_rows(sf_dir: str, table: str, columns: list[str] | None = None,
             filter=None) -> pa.Table:
    """Driver-side read of a DIMENSION-scale table (region: 5 rows,
    nation: 25): plain pyarrow.parquet. Spinning a Ray dataset plus a
    streaming executor to take_all() 25 rows costs ~0.3 s of pure
    overhead per call; dimension metadata a query plan needs on the
    driver (key maps, filter key sets) reads directly. Never use for
    fact tables — the scale-guard test pins those to Dataset paths."""
    import pyarrow.parquet as pq

    t = pq.read_table(f"{sf_dir}/{table}.parquet", columns=columns)
    if filter is not None:
        t = t.filter(filter)
    return t


def read(sf_dir: str, table: str, columns: list[str] | None = None,
         filter=None):
    """Pruned parquet scan. ``filter`` is a pyarrow dataset expression
    pushed into the read (row-group pruning + scan-time filtering) —
    measured ~2x cheaper than a post-read Dataset.filter(expr=...) stage
    even on warm single-file inputs, and at 100 TB it skips whole row
    groups via parquet statistics."""
    import ray.data as rd

    return rd.read_parquet(f"{sf_dir}/{table}.parquet", columns=columns,
                           filter=filter)


class BroadcastJoin:
    """Map-side hash join against a broadcast (key_array, value_arrays)
    build side.

    how="inner" drops probe rows without a match; how="left" keeps them
    with nulls. The build side is ray.put once on the driver (typed Arrow
    arrays, so an all-miss batch still appends correctly-typed null
    columns) and fetched through the per-worker broadcast cache. The
    probe is fully vectorized: one ``pc.index_in`` per batch (C++ hash
    table) + ``pc.take`` per appended column. Applied as a TASK stage via
    ``broadcast_join_stage`` — lookup stages must not reserve actor-pool
    minimums (see webxtract/broadcast.py)."""

    def __init__(self, lookup_ref, key: str, add_cols: list[str],
                 how: str = "inner"):
        from ..broadcast import get_broadcast

        self.build_keys, self.build_vals = get_broadcast(lookup_ref)
        self.key = key
        self.add_cols = add_cols
        self.how = how

    def __call__(self, batch: pa.Table) -> pa.Table:
        idx = pc.index_in(batch.column(self.key), value_set=self.build_keys)
        if self.how == "inner":
            mask = pc.is_valid(idx)
            batch = batch.filter(mask)
            idx = idx.filter(mask)
        for col, vals in zip(self.add_cols, self.build_vals):
            # take with a null index yields a typed null — schema is
            # stable across batches even when every probe key misses
            batch = batch.append_column(col, pc.take(vals, idx))
        return batch


def broadcast_join_stage(lookup_ref, key: str, add_cols: list[str],
                         how: str = "inner"):
    """Task-pool closure applying BroadcastJoin per batch."""
    def fn(batch: pa.Table) -> pa.Table:
        return BroadcastJoin(lookup_ref, key, add_cols, how)(batch)

    return fn


def broadcast_lookup(ds, key: str, value_cols: list[str]):
    """Materialize a (small) Dataset into a ray.put (key_array,
    [value_array, ...]) build side for BroadcastJoin. Duplicate build
    keys keep the LAST occurrence (dict-insert semantics; index_in
    returns the FIRST match, so duplicates are collapsed up front)."""
    import ray

    slim = ds.select_columns([key] + value_cols)
    blocks = [b for b in ray.get(slim.to_arrow_refs()) if b.num_rows]
    if blocks:
        tbl = pa.concat_tables(blocks).combine_chunks()
    else:
        sch = slim.schema(fetch_if_missing=True)
        if sch is None:
            # fully-empty lineage with no recoverable schema: typed as
            # null arrays; BroadcastJoin still appends valid columns
            # because pc.take on empty-typed arrays yields typed nulls
            tbl = pa.table({n: pa.array([], pa.null())
                            for n in [key] + value_cols})
        else:
            tbl = pa.table({n: pa.array([], t)
                            for n, t in zip(sch.names, sch.types)})
    keys = tbl.column(key).combine_chunks()
    if len(keys) and pc.count_distinct(keys).as_py() < len(keys):
        df = tbl.to_pandas().drop_duplicates(subset=[key], keep="last")
        tbl = pa.Table.from_pandas(df, schema=tbl.schema,
                                   preserve_index=False)
        keys = tbl.column(key).combine_chunks()
    vals = [tbl.column(c).combine_chunks() for c in value_cols]
    return ray.put((keys, vals))


def _default_parts() -> int:
    try:
        import ray

        return max(2, int(ray.cluster_resources().get("CPU", 8)))
    except Exception:
        return 8


def _hash_part_column(t: pa.Table, key: str, num_parts: int) -> pa.Table:
    """Append _part = hash(key) % num_parts (vectorized; deterministic
    within a run, and the OUTPUT of partitioned operators never depends
    on the assignment — only co-location does)."""
    col = t.column(key)
    if pa.types.is_integer(col.type):
        part = (col.to_numpy().astype(np.int64) % num_parts).astype(np.int32)
        arr = pa.array(part, pa.int32())
    else:
        import polars as pl

        h = pl.from_arrow(pa.table({"k": col}))["k"].hash(seed=7)
        arr = pa.array((h.to_numpy() % num_parts).astype(np.int32),
                       pa.int32())
    return t.append_column("_part", arr)


def partitioned_map_groups(ds, key: str, fn, num_parts: int | None = None,
                           batch_format: str = "pyarrow"):
    """The scale-safe replacement for groupby(key).map_groups when the
    key has high cardinality: co-locate rows by hash(key) into a BOUNDED
    number of partitions (one shuffle, same as the per-key groupby), and
    run ``fn`` once per PARTITION over all its keys at once — vectorized
    segment operations instead of ~0.15 ms of per-group Python overhead
    per key (millions of keys at corpus scale = hours of pure overhead).

    ``fn`` receives a partition table (the _part column already removed)
    holding every row of every key hashed there, and must handle
    multiple keys itself (sort + numpy segment ops, or pandas by=...)."""
    num_parts = num_parts or _default_parts()

    def add_part(t: pa.Table) -> pa.Table:
        return _hash_part_column(t, key, num_parts)

    def run(g):
        if batch_format == "pyarrow":
            return fn(g.drop_columns(["_part"]))
        return fn(g.drop(columns=["_part"]))

    # coalesce the (slim) tagged partials to ~num_parts blocks before
    # the exchange: the sort-based shuffle pays a fixed per-input-block
    # cost (sample+map+reduce), so 210 scan-shaped blocks cost ~10x the
    # same bytes in 32 blocks (measured 2.2s -> 0.5s INCLUDING the
    # coalesce at 600k rows). Block granularity after the coalesce
    # equals the exchange's own output granularity, so no new skew.
    return ds.map_batches(add_part, batch_format="pyarrow",
                          zero_copy_batch=True) \
        .repartition(num_parts) \
        .groupby("_part").map_groups(run, batch_format=batch_format)


def copartitioned_map(sides, key: str, fn, num_parts: int | None = None):
    """Both-sides-large join/semi-join in ONE exchange: each side is
    projected per-batch (by its prep function) onto a COMMON slim schema
    containing ``key``, tagged with a ``_side`` ordinal, unioned, and
    hash-co-located by ``key`` into a bounded number of partitions.
    ``fn`` runs once per partition with one table per side (every row of
    every key hashed there) and does the join vectorized.

    This replaces the native hash-join operator's separate
    partition+join exchanges with a single slim-column shuffle; partials
    stay Arrow end-to-end. ``sides`` is a list of (dataset, prep)
    pairs; prep maps a pyarrow batch to the common schema (use
    ``pa.nulls(n, type)`` for columns a side lacks — types must match
    across sides or the union's schema drifts)."""
    num_parts = num_parts or _default_parts()

    def tag(prep, i):
        def go(t: pa.Table) -> pa.Table:
            out = prep(t)
            out = out.append_column(
                "_side", pa.array(np.full(out.num_rows, i, np.int8)))
            return _hash_part_column(out, key, num_parts)

        return go

    tagged = [ds.map_batches(tag(prep, i), batch_format="pyarrow",
                             zero_copy_batch=True)
              for i, (ds, prep) in enumerate(sides)]
    u = tagged[0]
    for t in tagged[1:]:
        u = u.union(t)
    n_sides = len(sides)

    def run(g: pa.Table) -> pa.Table:
        g = g.drop_columns(["_part"])
        side = g.column("_side")
        parts = [g.filter(pc.equal(side, pa.scalar(i, pa.int8())))
                  .drop_columns(["_side"]) for i in range(n_sides)]
        return fn(parts)

    # same block-coalesce-before-exchange as partitioned_map_groups
    return u.repartition(num_parts) \
        .groupby("_part").map_groups(run, batch_format="pyarrow")


def _segment_starts(keys: np.ndarray) -> np.ndarray:
    """Indices where a new key segment begins in a key-sorted array."""
    if len(keys) == 0:
        return np.empty(0, np.int64)
    new = np.ones(len(keys), dtype=bool)
    new[1:] = keys[1:] != keys[:-1]
    return np.flatnonzero(new)


# --- TPC-H-flavored pipelines --------------------------------------------

def q1_pricing_summary(sf_dir: str):
    """Pricing summary: filter on ship date, grouped sums/averages/count.
    Demonstrates partial+final aggregation (one small exchange)."""
    from ray.data.aggregate import Count, Mean, Sum

    ds = read(sf_dir, "lineitem",
              columns=["l_returnflag", "l_linestatus", "l_quantity",
                       "l_extendedprice", "l_discount", "l_shipdate"])
    cutoff = pa.scalar(np.datetime64("1998-09-02", "us"))

    def prep(t: pa.Table) -> pa.Table:
        t = t.filter(pc.less_equal(t.column("l_shipdate"), cutoff))
        # money is summed as exact integer cents: float summation order
        # differs between Ray's partial aggregation and DuckDB's
        # sequential sum, and a ~1e-8 difference can straddle a rounding
        # boundary. Integer sums are order-independent and exact.
        disc_price = pc.multiply(
            t.column("l_extendedprice"),
            pc.subtract(pa.scalar(1.0), t.column("l_discount")))
        return pa.table({
            "l_returnflag": t.column("l_returnflag"),
            "l_linestatus": t.column("l_linestatus"),
            "l_quantity": t.column("l_quantity"),
            "base_cents": _cents(t.column("l_extendedprice")),
            "disc_cents": _cents(disc_price),
            "l_discount": t.column("l_discount"),
        })

    agg = ds.map_batches(prep, batch_format="pyarrow", zero_copy_batch=True) \
        .groupby(["l_returnflag", "l_linestatus"]) \
        .aggregate(
            Sum("l_quantity", alias_name="sum_qty"),
            Sum("base_cents", alias_name="base_cents"),
            Sum("disc_cents", alias_name="disc_cents"),
            Mean("l_quantity", alias_name="avg_qty"),
            Mean("l_discount", alias_name="avg_disc"),
            Count(alias_name="count_order"),
        )

    def final(t: pa.Table) -> pa.Table:
        t = t.append_column("sum_base_price", _uncents(t.column("base_cents")))
        t = t.append_column("sum_disc_price", _uncents(t.column("disc_cents")))
        t = t.drop_columns(["base_cents", "disc_cents"])
        for c in ["sum_qty"]:
            t = t.set_column(t.schema.get_field_index(c), c,
                             round_ha(t.column(c), 2))
        for c in ["avg_qty", "avg_disc"]:
            t = t.set_column(t.schema.get_field_index(c), c,
                             round_ha(t.column(c), 6))
        return t

    return agg.map_batches(final, batch_format="pyarrow", zero_copy_batch=True)


def q3_segment_revenue(sf_dir: str, segment: str = "BUILDING", k: int = 10):
    """Top-k open orders by revenue for a market segment: two broadcast
    joins (customer, orders are the small sides vs lineitem) + grouped
    sum + global top-k (sort + limit on the tiny aggregate)."""
    from ray.data.aggregate import Sum

    cust = read(sf_dir, "customer", columns=["c_custkey", "c_mktsegment"],
                filter=(pc.field("c_mktsegment") == segment))
    cust_ref = broadcast_lookup(cust, "c_custkey", ["c_mktsegment"])

    orders = read(sf_dir, "orders",
                  columns=["o_orderkey", "o_custkey", "o_orderdate"])
    orders = orders.map_batches(
        broadcast_join_stage(cust_ref, "o_custkey", ["c_mktsegment"]),
        batch_format="pyarrow", zero_copy_batch=True)
    orders_ref = broadcast_lookup(orders, "o_orderkey", ["o_orderdate"])

    li = read(sf_dir, "lineitem",
              columns=["l_orderkey", "l_extendedprice", "l_discount"])

    def revenue(t: pa.Table) -> pa.Table:
        rev = pc.multiply(t.column("l_extendedprice"),
                          pc.subtract(pa.scalar(1.0), t.column("l_discount")))
        return pa.table({"l_orderkey": t.column("l_orderkey"),
                         "rev_cents": _cents(rev)})

    li = li.map_batches(revenue, batch_format="pyarrow", zero_copy_batch=True)
    li = li.map_batches(
        broadcast_join_stage(orders_ref, "l_orderkey", ["o_orderdate"]),
        batch_format="pyarrow", zero_copy_batch=True)
    agg = li.groupby("l_orderkey").aggregate(
        Sum("rev_cents", alias_name="rev_cents"))

    def final(t: pa.Table) -> pa.Table:
        t = t.append_column("revenue", _uncents(t.column("rev_cents")))
        return t.drop_columns(["rev_cents"])

    out = agg.map_batches(final, batch_format="pyarrow", zero_copy_batch=True)
    return out.sort(["revenue", "l_orderkey"], descending=[True, False]).limit(k)


def q5_region_nation_volume(sf_dir: str, region: str = "ASIA"):
    """Revenue per nation within a region: a chain of broadcast joins
    over the dimension tables (region -> nation -> supplier), then
    grouped sum over lineitem."""
    from ray.data.aggregate import Sum

    rkeys = set(dim_rows(sf_dir, "region",
                         filter=(pc.field("r_name") == region))
                .column("r_regionkey").to_pylist())
    nat = read(sf_dir, "nation",
               filter=pc.field("n_regionkey").isin(sorted(rkeys)))
    nat_ref = broadcast_lookup(nat, "n_nationkey", ["n_name"])

    supp = read(sf_dir, "supplier", columns=["s_suppkey", "s_nationkey"])
    supp = supp.map_batches(
        broadcast_join_stage(nat_ref, "s_nationkey", ["n_name"]),
        batch_format="pyarrow", zero_copy_batch=True)
    supp_ref = broadcast_lookup(supp, "s_suppkey", ["n_name"])

    li = read(sf_dir, "lineitem",
              columns=["l_suppkey", "l_extendedprice", "l_discount"])

    def revenue(t: pa.Table) -> pa.Table:
        rev = pc.multiply(t.column("l_extendedprice"),
                          pc.subtract(pa.scalar(1.0), t.column("l_discount")))
        return pa.table({"l_suppkey": t.column("l_suppkey"),
                         "rev_cents": _cents(rev)})

    li = li.map_batches(revenue, batch_format="pyarrow", zero_copy_batch=True)
    li = li.map_batches(
        broadcast_join_stage(supp_ref, "l_suppkey", ["n_name"]),
        batch_format="pyarrow", zero_copy_batch=True)
    agg = li.groupby("n_name").aggregate(
        Sum("rev_cents", alias_name="rev_cents"))

    def final(t: pa.Table) -> pa.Table:
        t = t.append_column("revenue", _uncents(t.column("rev_cents")))
        return t.drop_columns(["rev_cents"])

    return agg.map_batches(final, batch_format="pyarrow", zero_copy_batch=True)


def top_customers(sf_dir: str, k: int = 25):
    """Global top-k by account balance: sort + limit."""
    ds = read(sf_dir, "customer", columns=["c_custkey", "c_name", "c_acctbal"])
    return ds.sort(["c_acctbal", "c_custkey"],
                   descending=[True, False]).limit(k)


def orders_priority_counts(sf_dir: str):
    """Distinct-ish: order counts per (status, priority)."""
    from ray.data.aggregate import Count

    ds = read(sf_dir, "orders", columns=["o_orderstatus", "o_orderpriority"])
    return ds.groupby(["o_orderstatus", "o_orderpriority"]).aggregate(
        Count(alias_name="n_orders"))


# --- events (stream-shaped) ----------------------------------------------

def supplier_nation_hashjoin(sf_dir: str):
    """Native hash-partitioned join demo (supplier x nation on the
    nation key): the both-sides-large path; oracle-checked."""
    supp = read(sf_dir, "supplier")
    nat = read(sf_dir, "nation", columns=["n_nationkey", "n_name"])
    joined = hash_join(supp, nat, on="s_nationkey", right_on="n_nationkey",
                       est_rows=parquet_rows(sf_dir, "supplier"))
    return joined.select_columns(["s_suppkey", "s_name", "s_acctbal", "n_name"])


def acctbal_union_topk(sf_dir: str, k: int = 20):
    """Union of two sources (D3: accepted ∪ reviewed analogue) + global
    top-k: customers and suppliers pooled by account balance."""
    cust = read(sf_dir, "customer", columns=["c_name", "c_acctbal"])
    supp = read(sf_dir, "supplier", columns=["s_name", "s_acctbal"])

    def tag_c(t: pa.Table) -> pa.Table:
        return pa.table({"name": t.column("c_name"),
                         "acctbal": t.column("c_acctbal"),
                         "side": pa.array(["customer"] * t.num_rows)})

    def tag_s(t: pa.Table) -> pa.Table:
        return pa.table({"name": t.column("s_name"),
                         "acctbal": t.column("s_acctbal"),
                         "side": pa.array(["supplier"] * t.num_rows)})

    u = cust.map_batches(tag_c, batch_format="pyarrow").union(
        supp.map_batches(tag_s, batch_format="pyarrow"))
    return u.sort(["acctbal", "name"], descending=[True, False]).limit(k)


def events_sessions(sf_dir: str, gap_minutes: int = 30):
    """Session windows per user (gap-based): a new session starts when
    the inter-event gap exceeds ``gap_minutes``. Runs as ONE hash
    co-location by user (partitioned_map_groups) with fully vectorized
    segment ops per partition — no per-user Python (SURVEY.md §2.9);
    SQL oracle = lag() + cumulative sum window functions. The per-
    session event count folds inside the same partition pass ((user,
    session) groups never span partitions), so there is no second
    all-to-all."""
    ds = read(sf_dir, "events", columns=["event_id", "ts", "user_id"])
    gap_us = gap_minutes * 60 * 1_000_000

    def sessionize(part: pa.Table) -> pa.Table:
        idx = pc.sort_indices(part, sort_keys=[
            ("user_id", "ascending"), ("ts", "ascending"),
            ("event_id", "ascending")])
        g = part.take(idx)
        uid = g.column("user_id").to_numpy()
        ts = g.column("ts").cast(pa.int64()).to_numpy()
        n = len(ts)
        if n == 0:
            return pa.table({"user_id": pa.array([], pa.int64()),
                             "session_id": pa.array([], pa.int64()),
                             "n_events": pa.array([], pa.int64())})
        new_user = np.ones(n, dtype=bool)
        new_user[1:] = uid[1:] != uid[:-1]
        gap = np.ones(n, dtype=bool)
        gap[1:] = (ts[1:] - ts[:-1]) > gap_us
        b = new_user | gap
        cs = np.cumsum(b.astype(np.int64))
        starts = np.flatnonzero(new_user)
        counts = np.diff(np.append(starts, n))
        # session ids restart at 1 per user: subtract the user's base
        session_id = cs - np.repeat(cs[starts] - 1, counts)
        s_starts = np.flatnonzero(b)  # one output row per session
        s_lens = np.diff(np.append(s_starts, n))
        return pa.table({
            "user_id": pc.take(g.column("user_id"),
                               pa.array(s_starts, pa.int64())),
            "session_id": pa.array(session_id[s_starts], pa.int64()),
            "n_events": pa.array(s_lens, pa.int64()),
        })

    return partitioned_map_groups(ds, "user_id", sessionize)


def asof_join_by_key(left_ds, right_ds, key: str, ts_col: str,
                     right_cols: list[str], strict: bool = True):
    """As-of join: for each left row, the latest right row with the same
    key and right.ts < left.ts (strict) / <= (non-strict).

    Ray Data lacks a native as-of join; the composition is ONE hash
    co-location by key over the union of both sides with a side tag,
    then a single vectorized ``pandas.merge_asof(..., by=key)`` per
    PARTITION (merge_asof's ``by`` does the per-key matching inside one
    C-level call — no per-key Python frames). Partitioning assumption:
    one partition's rows fit in one worker; salt hot keys if a single
    key outgrows it.

    Dtype contract: merge_asof NaN-promotes nullable int columns to
    float64, so integer columns (per the input Arrow schemas) are cast
    back to pandas nullable Int64 before returning — the output Arrow
    schema matches the inputs (int64, not double).
    """
    import pandas as pd

    # capture the Arrow types once on the driver: the per-partition
    # pandas frames lose them (int64-with-nulls arrives as float64)
    lsch, rsch = left_ds.schema(), right_ds.schema()
    types = dict(zip(rsch.names, rsch.types))
    types.update({n: t for n, t in zip(lsch.names, lsch.types)
                  if n not in right_cols})
    left_out = [n for n in lsch.names if n not in right_cols]
    out_cols = left_out + list(right_cols)
    int_cols = [c for c in out_cols if pa.types.is_integer(types[c])]

    def tag(side: str):
        def fn(t: pa.Table) -> pa.Table:
            return t.append_column("_side", pa.array([side] * t.num_rows))

        return fn

    u = left_ds.map_batches(tag("L"), batch_format="pyarrow").union(
        right_ds.map_batches(tag("R"), batch_format="pyarrow"))

    def per_part(g: pd.DataFrame) -> pd.DataFrame:
        left = g[g._side == "L"].drop(columns=["_side"] + right_cols,
                                      errors="ignore")
        # merge_asof requires GLOBAL sort by the on-column; ``by``
        # handles the per-key scoping
        left = left.sort_values(ts_col, kind="mergesort")
        right = g[g._side == "R"].drop(columns=["_side"])
        right = right.sort_values(ts_col, kind="mergesort")
        if left.empty or right.empty:
            if left.empty:
                out = left.iloc[0:0].reindex(columns=out_cols)
            else:
                out = left.reindex(columns=out_cols)
        else:
            right_sel = right[[key, ts_col] + right_cols].rename(
                columns={ts_col: "_rts"})
            out = pd.merge_asof(
                left, right_sel, left_on=ts_col, right_on="_rts", by=key,
                direction="backward", allow_exact_matches=not strict)
            out = out.drop(columns=["_rts"])
        for c in int_cols:
            out[c] = out[c].astype("Int64")
        # stabilize dtypes of right_cols that may be all-NaN in a
        # partition whose right side is empty (object-NaN would infer
        # Arrow null and diverge the schema across partitions)
        for c in right_cols:
            t = types[c]
            if pa.types.is_string(t):
                out[c] = out[c].astype("string")
            elif pa.types.is_floating(t):
                out[c] = out[c].astype("float64")
            elif pa.types.is_timestamp(t):
                out[c] = out[c].astype("datetime64[us]")
        return out[out_cols]

    return partitioned_map_groups(u, key, per_part, batch_format="pandas")


def purchases_with_prior_error(sf_dir: str):
    """As-of join demo: each purchase event paired with the user's most
    recent STRICTLY-prior error event (oracle: DuckDB native ASOF JOIN)."""
    purchases = read(sf_dir, "events",
                     columns=["event_id", "ts", "user_id", "event_type"],
                     filter=(pc.field("event_type") == "purchase"))
    errors = read(sf_dir, "events",
                  columns=["event_id", "ts", "user_id", "event_type"],
                  filter=(pc.field("event_type") == "error"))

    def prep_l(t: pa.Table) -> pa.Table:
        return pa.table({
            "event_id": t.column("event_id"), "ts": t.column("ts"),
            "user_id": t.column("user_id"),
            "prior_error_id": pa.nulls(t.num_rows, pa.int64()),
        })

    def prep_r(t: pa.Table) -> pa.Table:
        return pa.table({
            "event_id": pa.nulls(t.num_rows, pa.int64()),
            "ts": t.column("ts"),
            "user_id": t.column("user_id"),
            "prior_error_id": t.column("event_id"),
        })

    purchases = purchases.map_batches(prep_l, batch_format="pyarrow",
                                      zero_copy_batch=True)
    errors = errors.map_batches(prep_r, batch_format="pyarrow",
                                zero_copy_batch=True)
    out = asof_join_by_key(purchases, errors, key="user_id", ts_col="ts",
                           right_cols=["prior_error_id"], strict=True)

    def fill(t: pa.Table) -> pa.Table:
        # no-match -> -1 (not null): a nullable int column NaN-promotes
        # to float64 in pandas materializations, hash-diverging from the
        # oracle; -1 keeps int64 everywhere (oracle uses COALESCE(.,-1)).
        # Rebuilt as a FRESH table: blocks that passed through pandas
        # carry pandas-extension schema metadata that would resurface as
        # nullable Int64Dtype in any downstream to_pandas().
        return pa.table({
            "event_id": t.column("event_id").cast(pa.int64()),
            "ts": t.column("ts"),
            "user_id": t.column("user_id").cast(pa.int64()),
            "prior_error_id": pc.fill_null(
                t.column("prior_error_id").cast(pa.int64()),
                pa.scalar(-1, pa.int64())),
        })

    return out.map_batches(fill, batch_format="pyarrow", zero_copy_batch=True)


def events_latest_per_user(sf_dir: str):
    """Latest event per user (dedup-by-recency, O3/D1 analogue).
    Deterministic tie-break: ts desc, then event_id desc. Vectorized:
    hash co-location by user, one sort per partition, take the first
    row of each user segment — no per-user Python."""
    ds = read(sf_dir, "events",
              columns=["event_id", "ts", "user_id", "event_type", "value"])

    def latest(part: pa.Table) -> pa.Table:
        idx = pc.sort_indices(part, sort_keys=[
            ("user_id", "ascending"), ("ts", "descending"),
            ("event_id", "descending")])
        g = part.take(idx)
        starts = _segment_starts(g.column("user_id").to_numpy())
        return g.take(pa.array(starts, pa.int64()))

    return partitioned_map_groups(ds, "user_id", latest)


def events_hourly_windows(sf_dir: str):
    """Tumbling 1h windows per (user, event_type): count + sum(value).
    Window assignment is a vectorized floor_temporal inside map_batches —
    no per-row Python, and the only shuffle is the final grouped
    aggregate. NOTE: (user, window, type) is nearly unique per event at
    this corpus shape, so an in-batch pre-aggregate does NOT reduce the
    exchange (tried: 2.9s -> 6.4s, pure added cost) — the raw-row
    Aggregate with its internal map-side combine is the right plan."""
    from ray.data.aggregate import Count, Sum

    ds = read(sf_dir, "events", columns=["ts", "user_id", "event_type", "value"])

    def window(t: pa.Table) -> pa.Table:
        # explicit us cast: floor_temporal can narrow to second
        # resolution, and the oracle's date_trunc stays timestamp[us]
        w = pc.floor_temporal(t.column("ts"), unit="hour") \
            .cast(pa.timestamp("us"))
        t = t.append_column("window_start", w)
        return t.append_column("value_cents", _cents(t.column("value")))

    agg = ds.map_batches(window, batch_format="pyarrow", zero_copy_batch=True) \
        .groupby(["user_id", "window_start", "event_type"]).aggregate(
            Count(alias_name="n_events"),
            Sum("value_cents", alias_name="value_cents"),
        )

    def final(t: pa.Table) -> pa.Table:
        t = t.append_column("sum_value", _uncents(t.column("value_cents")))
        t = t.drop_columns(["value_cents"])
        # Ray's hash-shuffle aggregate narrows the timestamp key to
        # second resolution; the oracle's date_trunc stays timestamp[us]
        i = t.schema.get_field_index("window_start")
        return t.set_column(i, "window_start",
                            t.column("window_start").cast(pa.timestamp("us")))

    return agg.map_batches(final, batch_format="pyarrow", zero_copy_batch=True)


def parquet_rows(sf_dir: str, table: str) -> int:
    """Row count straight from parquet footer metadata (no scan).
    Handles both a single file and a directory of part files (derived
    corpora written by Dataset.write_parquet, e.g. the CCNet cleaned
    stage)."""
    import os

    import pyarrow.parquet as pq

    path = f"{sf_dir}/{table}.parquet"
    if os.path.isdir(path):
        return sum(pq.read_metadata(os.path.join(path, f)).num_rows
                   for f in os.listdir(path) if f.endswith(".parquet"))
    return pq.read_metadata(path).num_rows


def join_partitions(est_rows: int | None) -> int:
    """Join partition count sized to the data: one hash-shuffle
    aggregator actor per ~250k rows, clamped to [2, cluster CPUs].
    Partition-count startup cost is real (32 aggregator actors cost ~5s
    on an empty join at sandbox scale); at 10^12 rows the estimate
    saturates at the CPU clamp, which on a real cluster IS the scale-out
    width."""
    cpus = _default_parts()
    if est_rows is None:
        return max(8, cpus)
    return max(2, min(cpus, est_rows // 250_000 + 1))


def hash_join(left, right, on: str, right_on: str | None = None,
              join_type: str = "inner", num_partitions: int | None = None,
              est_rows: int | None = None):
    """Distributed hash join (both sides large): Ray Data's native
    hash-partitioned join. Use broadcast_join_stage instead whenever one
    side fits in memory — it avoids the all-to-all exchange entirely.
    ``est_rows`` (e.g. from ``parquet_rows``) sizes the partition count;
    see ``join_partitions``."""
    if num_partitions is None:
        num_partitions = join_partitions(est_rows)
    return left.join(right, join_type=join_type,
                     num_partitions=num_partitions, on=(on,),
                     right_on=(right_on,) if right_on else None)


def _value_set(s) -> pa.Array:
    """Python set -> sorted typed Arrow value-set array (built once per
    worker via the derived-broadcast cache)."""
    return pa.array(sorted(s))


def anti_join_stage(keys_ref, key: str):
    """Left-anti join: drop probe rows whose key is in the broadcast set
    (SURVEY J3/D2 — the reference's attach-set reconciliation,
    ui-notifications/fn-setup-iot-auth/main.py:337-379). Vectorized:
    one pc.is_in per batch against a per-worker cached Arrow value set.
    At corpus scale the broadcast set becomes a Bloom filter or a hash
    semi-join."""
    def fn(batch: pa.Table) -> pa.Table:
        from ..broadcast import get_broadcast, get_broadcast_derived

        if not get_broadcast(keys_ref):
            return batch  # empty filter set: everything survives
        vs = get_broadcast_derived(keys_ref, "valueset", _value_set)
        hit = pc.is_in(batch.column(key), value_set=vs)
        return batch.filter(pc.invert(hit))

    return fn


def semi_join_stage(keys_ref, key: str):
    """Left-semi join: keep probe rows whose key IS in the broadcast set
    (vectorized pc.is_in; at corpus scale: Bloom filter of the key set)."""
    def fn(batch: pa.Table) -> pa.Table:
        from ..broadcast import get_broadcast, get_broadcast_derived

        if not get_broadcast(keys_ref):
            return batch.slice(0, 0)  # empty key set: nothing matches
        vs = get_broadcast_derived(keys_ref, "valueset", _value_set)
        return batch.filter(pc.is_in(batch.column(key), value_set=vs))

    return fn


def _urgent_custkeys(sf_dir: str):
    import ray

    orders = read(sf_dir, "orders", columns=["o_custkey"],
                  filter=(pc.field("o_orderpriority") == "1-URGENT"))
    custkeys = set()
    for b in orders.iter_batches(batch_format="pyarrow"):
        custkeys.update(b.column("o_custkey").to_pylist())
    return ray.put(custkeys)


def customers_with_urgent_orders(sf_dir: str):
    """Semi-join: customers that placed at least one 1-URGENT order."""
    ref = _urgent_custkeys(sf_dir)
    cust = read(sf_dir, "customer", columns=["c_custkey", "c_name", "c_acctbal"])
    return cust.map_batches(semi_join_stage(ref, "c_custkey"),
                            batch_format="pyarrow", zero_copy_batch=True)


def customers_without_urgent_orders(sf_dir: str):
    """Anti-join: customers that never placed a 1-URGENT order (the
    unrestricted "no orders at all" variant is empty on this dense
    synthetic corpus — useless as a correctness signal)."""
    import ray

    orders = read(sf_dir, "orders", columns=["o_custkey"],
                  filter=(pc.field("o_orderpriority") == "1-URGENT"))
    custkeys = set()
    for b in orders.iter_batches(batch_format="pyarrow"):
        custkeys.update(b.column("o_custkey").to_pylist())
    ref = ray.put(custkeys)
    cust = read(sf_dir, "customer", columns=["c_custkey", "c_name", "c_acctbal"])
    return cust.map_batches(anti_join_stage(ref, "c_custkey"),
                            batch_format="pyarrow", zero_copy_batch=True)


def docs_sample(sf_dir: str, pct_hex: str = "28"):
    """Deterministic hash-based sampling (O5): keep docs whose
    md5(text) starts below a hex threshold (~16% for '28'). Unlike
    random_sample this is reproducible under any partitioning AND
    SQL-expressible, so it is oracle-checked."""
    import hashlib

    ds = read(sf_dir, "documents", columns=["doc_id", "text"])

    def sample(batch: pa.Table) -> pa.Table:
        texts = batch.column("text").to_pylist()
        keep = pa.array(
            [hashlib.md5(t.encode()).hexdigest()[:2] < pct_hex for t in texts],
            pa.bool_())
        return batch.select(["doc_id"]).filter(keep)

    return ds.map_batches(sample, batch_format="pyarrow", zero_copy_batch=True)


def parts_brand_stats(sf_dir: str):
    """Grouped stats over the part dimension (count, avg retail price,
    max size per brand)."""
    from ray.data.aggregate import Count, Max, Mean

    ds = read(sf_dir, "part", columns=["p_brand", "p_retailprice", "p_size"])
    agg = ds.groupby("p_brand").aggregate(
        Count(alias_name="n_parts"),
        Mean("p_retailprice", alias_name="avg_price"),
        Max("p_size", alias_name="max_size"),
    )

    def final(t: pa.Table) -> pa.Table:
        i = t.schema.get_field_index("avg_price")
        t = t.set_column(i, "avg_price", round_ha(t.column("avg_price"), 6))
        # Ray's Max promotes to int64; p_size is int32 (match the oracle)
        j = t.schema.get_field_index("max_size")
        return t.set_column(j, "max_size",
                            t.column("max_size").cast(pa.int32()))

    return agg.map_batches(final, batch_format="pyarrow", zero_copy_batch=True)


def docs_term_counts(sf_dir: str, k: int = 50):
    """Top-k corpus terms: the explode/flat_map pattern done scale-right —
    each batch pre-aggregates its own (term, count) partials (Arrow
    split + flatten + value_counts, all C++), so the exchange carries
    one row per distinct term per batch, never one row per token.
    Deterministic tie-break: count desc, term asc."""
    from ray.data.aggregate import Sum

    ds = read(sf_dir, "documents", columns=["text"])

    def partial_counts(batch: pa.Table) -> pa.Table:
        flat = pc.list_flatten(pc.split_pattern(
            batch.column("text"), pattern=" "))
        vc = flat.value_counts()
        if isinstance(vc, pa.ChunkedArray):
            vc = vc.combine_chunks()
        return pa.table({"term": vc.field("values"),
                         "len": vc.field("counts").cast(pa.int64())})

    partials = ds.map_batches(partial_counts, batch_format="pyarrow",
                              zero_copy_batch=True) \
        .repartition(_default_parts())  # coalesce slim partial blocks
    agg = partials.groupby("term").aggregate(Sum("len", alias_name="n"))
    return agg.sort(["n", "term"], descending=[True, False]).limit(k)


PRICE_BANDS = [0.0, 920.0, 940.0, 960.0, 980.0]  # upper band open-ended
# (synthetic p_retailprice spans 900-1000; bands chosen to split it)


def parts_price_bands(sf_dir: str):
    """Range join: each part assigned to its retail-price band via a
    broadcast sorted band table + vectorized searchsorted (the band
    table is tiny, so the range join is a map-side lookup, not a
    shuffle), then counted per band."""
    from ray.data.aggregate import Count

    ds = read(sf_dir, "part", columns=["p_retailprice"])
    edges = np.array(PRICE_BANDS[1:], dtype=np.float64)

    def assign(t: pa.Table) -> pa.Table:
        prices = t.column("p_retailprice").to_numpy()
        # side="left": a price exactly on an edge stays in the lower band
        # (matches the oracle's strict '>' comparisons)
        band = np.searchsorted(edges, prices, side="left")
        return pa.table({"band": pa.array(band.astype(np.int64), pa.int64())})

    return ds.map_batches(assign, batch_format="pyarrow",
                          zero_copy_batch=True).groupby("band").aggregate(
        Count(alias_name="n_parts"))


def events_running_total(sf_dir: str):
    """Per-user running sum of event values (rolling/window aggregate):
    hash co-location by user + one segmented cumulative sum per
    partition (no per-user Python); money as exact cents (oracle:
    SUM OVER window)."""
    ds = read(sf_dir, "events", columns=["event_id", "ts", "user_id", "value"])

    def running(part: pa.Table) -> pa.Table:
        idx = pc.sort_indices(part, sort_keys=[
            ("user_id", "ascending"), ("ts", "ascending"),
            ("event_id", "ascending")])
        g = part.take(idx)
        uid = g.column("user_id").to_numpy()
        cents = _cents(g.column("value")).to_numpy()
        n = len(uid)
        if n == 0:
            return pa.table({"event_id": pa.array([], pa.int64()),
                             "user_id": pa.array([], pa.int64()),
                             "running_value": pa.array([], pa.float64())})
        total = np.cumsum(cents)
        starts = _segment_starts(uid)
        counts = np.diff(np.append(starts, n))
        # segmented cumsum: subtract each user's pre-segment total
        base = np.repeat(total[starts] - cents[starts], counts)
        run = total - base
        return pa.table({
            "event_id": g.column("event_id"),
            "user_id": g.column("user_id"),
            "running_value": pa.array(np.round(run / 100.0, 2),
                                      pa.float64()),
        })

    return partitioned_map_groups(ds, "user_id", running)


def events_value_median(sf_dir: str):
    """Grouped exact median (continuous: mean of middle pair for even
    counts, matching DuckDB median()) via per-group sort — quantiles
    are not decomposable, so the group's values co-locate (the honest
    shuffle); for approximate scale-out use a KLL/t-digest sketch."""
    ds = read(sf_dir, "events", columns=["event_type", "value"])

    def med(g: pa.Table) -> pa.Table:
        v = np.sort(g.column("value").to_numpy())
        n = len(v)
        m = float(v[n // 2]) if n % 2 else float((v[n // 2 - 1] + v[n // 2]) / 2.0)
        return pa.table({
            "event_type": g.column("event_type").slice(0, 1),
            "median_value": pa.array([round(m, 6)], pa.float64()),
        })

    return ds.groupby("event_type").map_groups(med, batch_format="pyarrow")


def docs_shuffled(sf_dir: str, seed: int = 7):
    """Seeded global shuffle — the training-data-loader epoch shuffle
    (an explicit all-to-all; for lighter randomization prefer
    iter_batches(local_shuffle_buffer_size=...) which avoids the full
    exchange). Deterministic for a fixed seed and input layout."""
    return read(sf_dir, "documents",
                columns=["doc_id", "lang"]).random_shuffle(seed=seed)


def events_rank_in_user(sf_dir: str):
    """Per-user event rank by time (ROW_NUMBER OVER (PARTITION BY user
    ORDER BY ts, event_id)): hash co-location by user + one segmented
    arange per partition — the grouped-window pattern, oracled."""
    ds = read(sf_dir, "events", columns=["event_id", "ts", "user_id"])

    def rank(part: pa.Table) -> pa.Table:
        idx = pc.sort_indices(part, sort_keys=[
            ("user_id", "ascending"), ("ts", "ascending"),
            ("event_id", "ascending")])
        g = part.take(idx)
        uid = g.column("user_id").to_numpy()
        n = len(uid)
        if n == 0:
            return pa.table({"event_id": pa.array([], pa.int64()),
                             "user_id": pa.array([], pa.int64()),
                             "rnk": pa.array([], pa.int64())})
        starts = _segment_starts(uid)
        counts = np.diff(np.append(starts, n))
        rnk = np.arange(1, n + 1) - np.repeat(starts, counts)
        return pa.table({
            "event_id": g.column("event_id"),
            "user_id": g.column("user_id"),
            "rnk": pa.array(rnk, pa.int64()),
        })

    return partitioned_map_groups(ds, "user_id", rank)


def lang_top_terms(sf_dir: str, k: int = 3):
    """Top-k terms per language (grouped top-k): per-batch (lang, term)
    partial counts -> one grouped Sum exchange -> co-locate by lang and
    take the first k of each sorted segment. Deterministic tie-break:
    count desc, term asc. Oracle: ROW_NUMBER window over grouped counts."""
    from ray.data.aggregate import Sum

    ds = read(sf_dir, "documents", columns=["lang", "text"])

    def partial_counts(batch: pa.Table) -> pa.Table:
        toks = pc.split_pattern(batch.column("text"), pattern=" ")
        parents = pc.list_parent_indices(toks)
        pairs = pa.table({
            "lang": batch.column("lang").take(parents),
            "term": pc.list_flatten(toks)})
        g = pairs.group_by(["lang", "term"]).aggregate([([], "count_all")])
        return pa.table({"lang": g.column("lang"),
                         "term": g.column("term"),
                         "len": g.column("count_all").cast(pa.int64())})

    partials = ds.map_batches(partial_counts, batch_format="pyarrow",
                              zero_copy_batch=True) \
        .repartition(_default_parts())  # coalesce slim partial blocks
    agg = partials.groupby(["lang", "term"]).aggregate(
        Sum("len", alias_name="n"))

    def topk(part: pa.Table) -> pa.Table:
        idx = pc.sort_indices(part, sort_keys=[
            ("lang", "ascending"), ("n", "descending"),
            ("term", "ascending")])
        g = part.take(idx)
        langs = g.column("lang").to_pylist()
        n = len(langs)
        if n == 0:
            return pa.table({"lang": pa.array([], pa.string()),
                             "term": pa.array([], pa.string()),
                             "n": pa.array([], pa.int64())})
        langs_np = np.array(langs)
        starts = _segment_starts(langs_np)
        counts = np.diff(np.append(starts, n))
        offsets = np.arange(n) - np.repeat(starts, counts)
        return g.filter(pa.array(offsets < k))

    return partitioned_map_groups(agg, "lang", topk)


def events_value_p90(sf_dir: str):
    """Grouped interpolated p90 (DuckDB quantile_cont semantics: linear
    interpolation between order statistics). Like the exact median, the
    group's values co-locate (quantiles are not decomposable) — group
    count is #event_types, bounded; the approximate companion is
    events_value_p50_sketch."""
    ds = read(sf_dir, "events", columns=["event_type", "value"])

    def p90(g: pa.Table) -> pa.Table:
        v = np.sort(g.column("value").to_numpy())
        q = np.quantile(v, 0.9, method="linear")
        return pa.table({
            "event_type": g.column("event_type").slice(0, 1),
            "p90_value": pa.array([round(float(q), 6)], pa.float64()),
        })

    return ds.groupby("event_type").map_groups(p90, batch_format="pyarrow")


def events_time_since_prev(sf_dir: str):
    """LAG window: microseconds since the user's previous event (null on
    each user's first event). Same grouped-window shape as
    events_rank_in_user — hash co-location by user, one vectorized
    segmented diff per partition; no per-group task dispatch."""
    ds = read(sf_dir, "events", columns=["event_id", "ts", "user_id"])

    def lag(part: pa.Table) -> pa.Table:
        if part.num_rows == 0:
            return pa.table({"event_id": pa.array([], pa.int64()),
                             "user_id": pa.array([], pa.int64()),
                             "prev_gap_us": pa.array([], pa.int64())})
        idx = pc.sort_indices(part, sort_keys=[
            ("user_id", "ascending"), ("ts", "ascending"),
            ("event_id", "ascending")])
        g = part.take(idx)
        uid = g.column("user_id").to_numpy()
        ts = g.column("ts").cast(pa.int64()).combine_chunks().to_numpy()
        n = len(uid)
        starts = _segment_starts(uid)
        gap = np.empty(n, np.int64)
        gap[0] = 0
        gap[1:] = ts[1:] - ts[:-1]
        first = np.zeros(n, bool)
        first[starts] = True
        return pa.table({
            "event_id": g.column("event_id"),
            "user_id": g.column("user_id"),
            "prev_gap_us": pa.array(gap, pa.int64(), mask=first),
        })

    return partitioned_map_groups(ds, "user_id", lag)


def events_moving_avg(sf_dir: str):
    """Moving average over a bounded frame (ROWS BETWEEN 2 PRECEDING AND
    CURRENT ROW) per user, ordered by (ts, event_id). The frame sum is
    built from shifted copies in frame order — no cumsum drift — and
    rounded to 6 decimals to pin the float representation (oracle does
    the same)."""
    ds = read(sf_dir, "events", columns=["event_id", "ts", "user_id", "value"])

    def mavg(part: pa.Table) -> pa.Table:
        if part.num_rows == 0:
            return pa.table({"event_id": pa.array([], pa.int64()),
                             "user_id": pa.array([], pa.int64()),
                             "mavg3": pa.array([], pa.float64())})
        idx = pc.sort_indices(part, sort_keys=[
            ("user_id", "ascending"), ("ts", "ascending"),
            ("event_id", "ascending")])
        g = part.take(idx)
        uid = g.column("user_id").to_numpy()
        v = g.column("value").to_numpy()
        n = len(uid)
        starts = _segment_starts(uid)
        counts = np.diff(np.append(starts, n))
        off = np.arange(n) - np.repeat(starts, counts)  # pos within user
        p1 = np.empty(n)
        p1[0] = 0.0
        p1[1:] = v[:-1]
        p2 = np.empty(n)
        p2[:2] = 0.0
        p2[2:] = v[:-2]
        in1, in2 = off >= 1, off >= 2
        total = np.where(in2, (p2 + p1) + v,
                         np.where(in1, p1 + v, v))
        cnt = np.minimum(off + 1, 3)
        return pa.table({
            "event_id": g.column("event_id"),
            "user_id": g.column("user_id"),
            "mavg3": pa.array(np.round(total / cnt, 6), pa.float64()),
        })

    return partitioned_map_groups(ds, "user_id", mavg)


def q6_revenue_filter(sf_dir: str):
    """Selective scan + global aggregate (TPC-H Q6 shape). The predicate
    is handed to the parquet scan (arrow dataset filter -> row-group and
    page pruning), so non-qualifying data never enters the object store;
    revenue is summed as integer 1e-4 units for float-order independence
    (oracle mirrors the same rounding)."""
    import datetime as _dt

    import pyarrow.dataset as pads
    import ray.data as rd

    expr = ((pads.field("l_shipdate") >= _dt.datetime(1995, 1, 1))
            & (pads.field("l_shipdate") < _dt.datetime(1996, 1, 1))
            & (pads.field("l_discount") >= 0.05)
            & (pads.field("l_discount") <= 0.07)
            & (pads.field("l_quantity") < 24.0))
    ds = rd.read_parquet(
        f"{sf_dir}/lineitem.parquet",
        columns=["l_extendedprice", "l_discount"], filter=expr)

    def partial(t: pa.Table) -> pa.Table:
        rev = pc.round(
            pc.multiply(pc.multiply(t.column("l_extendedprice"),
                                    t.column("l_discount")),
                        pa.scalar(10000.0)),
            0, round_mode="half_towards_infinity").cast(pa.int64())
        return pa.table({
            "rev_e4": pa.array([pc.sum(rev).as_py() or 0], pa.int64()),
            "n_items": pa.array([t.num_rows], pa.int64()),
        })

    parts = ds.map_batches(partial, batch_format="pyarrow",
                           zero_copy_batch=True)

    def final(t: pa.Table) -> pa.Table:
        rev = pc.sum(t.column("rev_e4")).as_py() or 0
        n = pc.sum(t.column("n_items")).as_py() or 0
        return pa.table({
            "revenue": pa.array([round_ha(rev / 10000.0, 2)], pa.float64()),
            "n_items": pa.array([n], pa.int64()),
        })

    return parts.repartition(1).map_batches(final, batch_format="pyarrow")


def q4_priority_exists(sf_dir: str):
    """EXISTS-style grouped semi-join with two LARGE sides (TPC-H Q4
    shape): qualifying l_orderkeys are pre-deduped per batch, then ONE
    copartitioned_map exchange co-locates them with orders on the key;
    each partition does a vectorized is_in semi-join + pivoted partial
    counts, and a tiny grouped Sum finishes. Replaces the previous
    distinct-groupby + native-hash-join plan (two exchanges; measured
    5.0s -> see bench) — the key set grows with the fact table, so no
    broadcast (that twin is customers_with_urgent_orders)."""
    from ray.data.aggregate import Sum

    li = read(sf_dir, "lineitem", columns=["l_orderkey"],
              filter=(pc.field("l_returnflag") == "R"))
    orders = read(sf_dir, "orders", columns=["o_orderkey", "o_orderpriority"])

    def prep_keys(t: pa.Table) -> pa.Table:
        u = pc.unique(t.column("l_orderkey"))
        return pa.table({"k": u, "pri": pa.nulls(len(u), pa.string())})

    def prep_orders(t: pa.Table) -> pa.Table:
        return pa.table({"k": t.column("o_orderkey"),
                         "pri": t.column("o_orderpriority")})

    def per_part(parts: list[pa.Table]) -> pa.Table:
        keys, orders_p = parts
        hit = orders_p.filter(pc.is_in(
            orders_p.column("k"), value_set=pc.unique(keys.column("k"))))
        agg = pa.table({"pri": hit.column("pri")}) \
            .group_by("pri").aggregate([("pri", "count")])
        return pa.table({
            "o_orderpriority": agg.column("pri"),
            "n_part": agg.column("pri_count").cast(pa.int64())})

    partial = copartitioned_map([(li, prep_keys), (orders, prep_orders)],
                                "k", per_part)
    return (partial.groupby("o_orderpriority")
            .aggregate(Sum("n_part", alias_name="n_orders")))


def nation_status_pivot(sf_dir: str):
    """Pivot (conditional aggregation): order counts per customer nation
    spread across one column per order status. Broadcast dimension chain
    (customer -> nation name) on the fact scan, per-batch pivoted
    partial counts via Arrow group_by, one tiny grouped-Sum exchange."""
    from ray.data.aggregate import Sum

    cust_ref = broadcast_lookup(
        read(sf_dir, "customer", columns=["c_custkey", "c_nationkey"]),
        "c_custkey", ["c_nationkey"])
    nat_ref = broadcast_lookup(
        read(sf_dir, "nation", columns=["n_nationkey", "n_name"]),
        "n_nationkey", ["n_name"])
    orders = read(sf_dir, "orders", columns=["o_custkey", "o_orderstatus"])
    statuses = ("O", "F", "P")

    def partial(batch: pa.Table) -> pa.Table:
        batch = BroadcastJoin(cust_ref, "o_custkey", ["c_nationkey"])(batch)
        batch = BroadcastJoin(nat_ref, "c_nationkey", ["n_name"])(batch)
        cols = {"n_name": batch.column("n_name")}
        st = batch.column("o_orderstatus")
        for s in statuses:
            cols[f"n_{s}"] = pc.cast(pc.equal(st, pa.scalar(s)), pa.int64())
        flat = pa.table(cols)
        return flat.group_by("n_name").aggregate(
            [(f"n_{s}", "sum") for s in statuses])

    parts = orders.map_batches(partial, batch_format="pyarrow",
                               zero_copy_batch=True)
    agg = parts.groupby("n_name").aggregate(
        *[Sum(f"n_{s}_sum", alias_name=f"n_{s.lower()}") for s in statuses])
    return agg


def events_props_k_stats(sf_dir: str):
    """Semi-structured extraction: pull the integer ``k`` out of the JSON
    ``props`` column (vectorized polars JSON path match, compiled once),
    then grouped stats per event type. All partials are integer sums, so
    the final avg is float-order independent."""
    from ray.data.aggregate import Max, Min, Sum

    ds = read(sf_dir, "events", columns=["event_type", "props"])

    def partial(batch: pa.Table) -> pa.Table:
        import polars as pl

        df = pl.from_arrow(batch)
        out = (df.select([
            "event_type",
            pl.col("props").str.json_path_match("$.k")
            .cast(pl.Int64).alias("k"),
        ]).group_by("event_type").agg([
            pl.len().cast(pl.Int64).alias("n_events"),
            pl.col("k").sum().alias("sum_k"),
            pl.col("k").min().alias("min_k"),
            pl.col("k").max().alias("max_k"),
        ]))
        return out.to_arrow().cast(pa.schema([
            ("event_type", pa.string()), ("n_events", pa.int64()),
            ("sum_k", pa.int64()), ("min_k", pa.int64()),
            ("max_k", pa.int64())]))

    parts = ds.map_batches(partial, batch_format="pyarrow",
                           zero_copy_batch=True)
    agg = parts.groupby("event_type").aggregate(
        Sum("n_events", alias_name="n_events"),
        Sum("sum_k", alias_name="sum_k"),
        Min("min_k", alias_name="min_k"),
        Max("max_k", alias_name="max_k"),
    )

    def final(t: pa.Table) -> pa.Table:
        avg = round_ha(pc.divide(
            pc.cast(t.column("sum_k"), pa.float64()),
            pc.cast(t.column("n_events"), pa.float64())), 6)
        return t.append_column("avg_k", avg)

    return agg.map_batches(final, batch_format="pyarrow",
                           zero_copy_batch=True)


def events_type_user_distinct(sf_dir: str):
    """Exact grouped COUNT(DISTINCT): distinct users per event type.
    Scale shape: distinct-count is not decomposable directly, so it runs
    as TWO pre-reduced aggregations — per-batch (type, user) dedupe via
    Arrow group_by (so the first exchange carries distinct pairs per
    block, not raw events), a grouped Count to collapse pairs globally,
    then a tiny per-type Count. The approximate twin (one pass, no pair
    exchange) is events_users_hll."""
    from ray.data.aggregate import Count

    ds = read(sf_dir, "events", columns=["event_type", "user_id"])

    def distinct_pairs(t: pa.Table) -> pa.Table:
        return t.group_by(["event_type", "user_id"]).aggregate([])

    pairs = ds.map_batches(distinct_pairs, batch_format="pyarrow",
                           zero_copy_batch=True)
    global_pairs = pairs.groupby(["event_type", "user_id"]).aggregate(
        Count(alias_name="_n"))
    return (global_pairs.select_columns(["event_type"])
            .groupby("event_type").aggregate(Count(alias_name="n_users")))


def customer_order_histogram(sf_dir: str):
    """Order-count distribution over customers (TPC-H Q13 shape) WITHOUT
    the customer-side join: per-customer order counts from one grouped
    Count over orders, histogrammed by a second tiny groupby; the
    zero-order bucket is total customers (parquet footer, no scan) minus
    customers seen in orders. Returns a driver-side Arrow table (the
    histogram is bounded by max orders per customer)."""
    from ray.data.aggregate import Count

    orders = read(sf_dir, "orders", columns=["o_custkey"])
    per_cust = orders.groupby("o_custkey").aggregate(
        Count(alias_name="c_count"))
    hist = per_cust.groupby("c_count").aggregate(
        Count(alias_name="n_custs"))
    t = pa.concat_tables(
        [b for b in hist.iter_batches(batch_format="pyarrow")])
    n_customers = parquet_rows(sf_dir, "customer")
    n_with_orders = pc.sum(t.column("n_custs")).as_py() or 0
    n_zero = n_customers - n_with_orders
    if n_zero > 0:
        t = pa.concat_tables([t, pa.table({
            "c_count": pa.array([0], t.column("c_count").type),
            "n_custs": pa.array([n_zero], pa.int64())})])
    return t.combine_chunks()


def global_row_number(ds, sort_keys: list[str],
                      descending: list[bool] | None = None,
                      rn_col: str = "rn"):
    """Global ROW_NUMBER() OVER (ORDER BY sort_keys): Ray Data's sort
    yields globally range-partitioned blocks in total order; per-block
    row COUNTS (8 bytes each) come back to the driver for a prefix sum,
    then each block gets offset + arange via a remote task. Blocks never
    leave the object store — the driver sees only the count vector.
    This is the documented drop-to-raw-tasks case: the Dataset API has
    no ordinal-over-total-order operator."""
    import ray
    import ray.data as rd

    sorted_ds = ds.sort(sort_keys, descending=descending).materialize()
    refs = sorted_ds.to_arrow_refs()

    @ray.remote(num_cpus=0.25)
    def _nrows(t: pa.Table) -> int:
        return t.num_rows

    @ray.remote(num_cpus=0.25)
    def _add_rn(t: pa.Table, off: int, col: str) -> pa.Table:
        return t.append_column(
            col, pa.array(np.arange(off + 1, off + 1 + t.num_rows,
                                    dtype=np.int64), pa.int64()))

    counts = ray.get([_nrows.remote(r) for r in refs])
    offsets = np.concatenate(([0], np.cumsum(counts)[:-1])) if counts else []
    out = [_add_rn.remote(r, int(o), rn_col)
           for r, o in zip(refs, offsets)]
    return rd.from_arrow_refs(out)


def customer_ntile(sf_dir: str, n: int = 4):
    """NTILE(n) + global row number over customers by account balance:
    exercises global_row_number (total-order ranking). Bucket sizes
    follow SQL NTILE: the first total%n buckets get one extra row."""
    ds = read(sf_dir, "customer", columns=["c_custkey", "c_acctbal"])
    rn = global_row_number(ds, ["c_acctbal", "c_custkey"],
                           descending=[True, False], rn_col="rn")
    total = parquet_rows(sf_dir, "customer")
    q, r = divmod(total, n)

    def bucket(t: pa.Table) -> pa.Table:
        rnv = t.column("rn").to_numpy()
        if q == 0:
            tile = np.minimum(rnv, n)
        else:
            big = r * (q + 1)
            tile = np.where(rnv <= big, (rnv - 1) // (q + 1) + 1,
                            r + (rnv - big - 1) // max(q, 1) + 1)
        return t.append_column("tile",
                               pa.array(tile.astype(np.int64), pa.int64()))

    return rn.map_batches(bucket, batch_format="pyarrow",
                          zero_copy_batch=True)


def region_nation_list(sf_dir: str):
    """Grouped ordered string_agg: comma-joined sorted nation names per
    region. Group count is bounded (#regions), so per-group Python is
    O(1); the dimension join is a broadcast lookup."""
    reg_ref = broadcast_lookup(
        read(sf_dir, "region", columns=["r_regionkey", "r_name"]),
        "r_regionkey", ["r_name"])
    nat = read(sf_dir, "nation", columns=["n_regionkey", "n_name"])
    nat = nat.map_batches(
        broadcast_join_stage(reg_ref, "n_regionkey", ["r_name"]),
        batch_format="pyarrow", zero_copy_batch=True)

    def agg(g: pa.Table) -> pa.Table:
        names = sorted(g.column("n_name").to_pylist())
        return pa.table({
            "r_name": g.column("r_name").slice(0, 1),
            "nations": pa.array([",".join(names)], pa.string()),
            "n_nations": pa.array([len(names)], pa.int64()),
        })

    return nat.groupby("r_name").map_groups(agg, batch_format="pyarrow")


def lineitem_corr_disc_tax(sf_dir: str):
    """Global Pearson correlation (discount vs tax) from EXACT integer
    moment sums: each batch reduces to six int64 partials (n, Σx, Σy,
    Σx², Σy², Σxy in 1e-4 units — synthetic discounts/taxes are 0.01
    multiples, so the encoding is exact), one tiny exchange, final ratio
    in Python ints (no float-order dependence anywhere before the last
    division). Oracle: DuckDB corr()."""
    ds = read(sf_dir, "lineitem", columns=["l_discount", "l_tax"])

    def partial(t: pa.Table) -> pa.Table:
        x = np.round(t.column("l_discount").to_numpy() * 1e4).astype(np.int64)
        y = np.round(t.column("l_tax").to_numpy() * 1e4).astype(np.int64)
        return pa.table({
            "n": pa.array([len(x)], pa.int64()),
            "sx": pa.array([int(x.sum())], pa.int64()),
            "sy": pa.array([int(y.sum())], pa.int64()),
            "sxx": pa.array([int((x * x).sum())], pa.int64()),
            "syy": pa.array([int((y * y).sum())], pa.int64()),
            "sxy": pa.array([int((x * y).sum())], pa.int64()),
        })

    parts = ds.map_batches(partial, batch_format="pyarrow",
                           zero_copy_batch=True)

    def final(t: pa.Table) -> pa.Table:
        n = pc.sum(t.column("n")).as_py() or 0
        sx = pc.sum(t.column("sx")).as_py() or 0
        sy = pc.sum(t.column("sy")).as_py() or 0
        sxx = pc.sum(t.column("sxx")).as_py() or 0
        syy = pc.sum(t.column("syy")).as_py() or 0
        sxy = pc.sum(t.column("sxy")).as_py() or 0
        num = n * sxy - sx * sy                      # exact ints
        den2 = (n * sxx - sx * sx) * (n * syy - sy * sy)
        corr = float(num) / float(den2) ** 0.5 if den2 > 0 else float("nan")
        return pa.table({
            "corr_disc_tax": pa.array([round(corr, 6)], pa.float64())})

    return parts.repartition(1).map_batches(final, batch_format="pyarrow")


def events_type_share(sf_dir: str):
    """Share-of-total per group (aggregate over an aggregate): event
    counts per type plus each type's fraction of all events. The grouped
    result is tiny, so the total folds driver-side."""
    from ray.data.aggregate import Count

    ds = read(sf_dir, "events", columns=["event_type"])
    agg = ds.groupby("event_type").aggregate(Count(alias_name="n"))
    t = pa.concat_tables(
        [b for b in agg.iter_batches(batch_format="pyarrow")])
    total = pc.sum(t.column("n")).as_py() or 0
    share = round_ha(pc.divide(pc.cast(t.column("n"), pa.float64()),
                             pa.scalar(float(total))), 6)
    return t.append_column("share", share).combine_chunks()


def interval_self_join(ds, key: str, ts_col: str, left_expr: str,
                       right_expr: str, window_us: int,
                       left_cols: list[str], right_cols: list[str]):
    """Interval (range) self-join: pair each left row with every right
    row of the SAME key whose timestamp falls in
    [left.ts - window, left.ts). Ray Data has no inequality join; the
    composition is ONE hash co-location by key (both sides filtered at
    the scan and tagged), then a vectorized pandas equi-merge on key per
    partition followed by the interval filter — the per-key cross
    product is the true output-size lower bound, and it never leaves
    the worker unfiltered. Partitioning assumption: one key's rows fit
    in one worker (salt hot keys beyond that)."""
    import pandas as pd

    left = ds.filter(expr=left_expr)
    right = ds.filter(expr=right_expr)

    def tag(side: str):
        def fn(t: pa.Table) -> pa.Table:
            return t.append_column("_side", pa.array([side] * t.num_rows))

        return fn

    u = left.map_batches(tag("L"), batch_format="pyarrow").union(
        right.map_batches(tag("R"), batch_format="pyarrow"))

    l_out = [c for c in left_cols if c != key]
    r_out = [c for c in right_cols if c != key]

    def per_part(g: pd.DataFrame) -> pd.DataFrame:
        lt = g[g._side == "L"][[key, ts_col] + [c for c in l_out
                                               if c != ts_col]]
        rt = g[g._side == "R"][[key, ts_col] + [c for c in r_out
                                               if c != ts_col]]
        rt = rt.rename(columns={c: f"r_{c}" for c in rt.columns
                                if c != key})
        m = lt.merge(rt, on=key)  # C-level hash merge per partition
        lts = m[ts_col].astype("int64")
        rts = m[f"r_{ts_col}"].astype("int64")
        keep = (rts >= lts - window_us) & (rts < lts)
        m = m[keep]
        out = pd.DataFrame({
            key: m[key].astype("int64"),
        })
        for c in l_out:
            out[c] = m[c]
        for c in r_out:
            out[f"r_{c}"] = m[f"r_{c}"]
        out["gap_us"] = (m[ts_col].astype("int64")
                         - m[f"r_{ts_col}"].astype("int64")).astype("int64")
        return out

    return partitioned_map_groups(u, key, per_part, batch_format="pandas")


def purchases_after_errors(sf_dir: str, window_hours: int = 6):
    """Interval self-join demo: every (purchase, prior error within the
    last ``window_hours``) pair per user, with the gap in microseconds.
    Unlike the as-of join (latest match only) this keeps ALL matches in
    the window — the burst-correlation shape. Oracle: inequality JOIN."""
    ds = read(sf_dir, "events", columns=["event_id", "ts", "user_id",
                                         "event_type"])
    out = interval_self_join(
        ds, key="user_id", ts_col="ts",
        left_expr="event_type == 'purchase'",
        right_expr="event_type == 'error'",
        window_us=window_hours * 3600 * 1_000_000,
        left_cols=["event_id", "ts"], right_cols=["event_id"])

    def fin(t: pa.Table) -> pa.Table:
        return pa.table({
            "event_id": t.column("event_id").cast(pa.int64()),
            "user_id": t.column("user_id").cast(pa.int64()),
            "error_id": t.column("r_event_id").cast(pa.int64()),
            "gap_us": t.column("gap_us").cast(pa.int64()),
        })

    return out.map_batches(fin, batch_format="pyarrow", zero_copy_batch=True)


def users_top_event_type(sf_dir: str):
    """Grouped MODE: each user's most frequent event type (ties -> the
    lexicographically smallest type). Two pre-reduced exchanges — per-
    batch (user, type) partial counts via Arrow group_by, a grouped Sum,
    then hash co-location by user with a vectorized per-segment argmax.
    Oracle: ROW_NUMBER over grouped counts."""
    from ray.data.aggregate import Sum

    ds = read(sf_dir, "events", columns=["user_id", "event_type"])

    def partial(t: pa.Table) -> pa.Table:
        out = t.group_by(["user_id", "event_type"]).aggregate([([], "count_all")])
        return pa.table({
            "user_id": out.column("user_id"),
            "event_type": out.column("event_type"),
            "n": out.column("count_all").cast(pa.int64()),
        })

    counts = ds.map_batches(partial, batch_format="pyarrow",
                            zero_copy_batch=True) \
        .groupby(["user_id", "event_type"]).aggregate(Sum("n", alias_name="n"))

    def argmax(part: pa.Table) -> pa.Table:
        if part.num_rows == 0:
            return pa.table({"user_id": pa.array([], pa.int64()),
                             "top_type": pa.array([], pa.string()),
                             "n": pa.array([], pa.int64())})
        idx = pc.sort_indices(part, sort_keys=[
            ("user_id", "ascending"), ("n", "descending"),
            ("event_type", "ascending")])
        g = part.take(idx)
        starts = _segment_starts(g.column("user_id").to_numpy())
        g = g.take(pa.array(starts, pa.int64()))
        return pa.table({"user_id": g.column("user_id"),
                         "top_type": g.column("event_type"),
                         "n": g.column("n")})

    return partitioned_map_groups(counts, "user_id", argmax)


def nation_top_supplier(sf_dir: str):
    """Grouped MAX_BY (argmax): per nation, the supplier with the
    highest account balance (tie -> min suppkey), with the nation name
    attached via a broadcast dimension lookup. Hash co-location by
    nation key + per-segment first-row take."""
    supp = read(sf_dir, "supplier",
                columns=["s_suppkey", "s_name", "s_nationkey", "s_acctbal"])

    def argmax(part: pa.Table) -> pa.Table:
        if part.num_rows == 0:
            return part
        idx = pc.sort_indices(part, sort_keys=[
            ("s_nationkey", "ascending"), ("s_acctbal", "descending"),
            ("s_suppkey", "ascending")])
        g = part.take(idx)
        starts = _segment_starts(g.column("s_nationkey").to_numpy())
        return g.take(pa.array(starts, pa.int64()))

    best = partitioned_map_groups(supp, "s_nationkey", argmax)
    nat_ref = broadcast_lookup(
        read(sf_dir, "nation", columns=["n_nationkey", "n_name"]),
        "n_nationkey", ["n_name"])
    return best.map_batches(
        broadcast_join_stage(nat_ref, "s_nationkey", ["n_name"]),
        batch_format="pyarrow", zero_copy_batch=True)


def nation_balance_fulljoin(sf_dir: str):
    """FULL OUTER hash join of two grouped aggregates: per-nation
    customer balance (acctbal > 9900) vs per-nation supplier balance
    (acctbal > 5000) — the filters leave each side with nations the
    other lacks, so both null directions are exercised. Money is exact
    integer cents end-to-end; missing sides coalesce to 0.00 and the
    key coalesces across the two join columns."""
    from ray.data.aggregate import Sum

    cust = read(sf_dir, "customer", columns=["c_nationkey", "c_acctbal"],
                filter=(pc.field("c_acctbal") > 9900))
    supp = read(sf_dir, "supplier", columns=["s_nationkey", "s_acctbal"],
                filter=(pc.field("s_acctbal") > 5000))

    def prep(key: str, val: str):
        def fn(t: pa.Table) -> pa.Table:
            return pa.table({key: t.column(key),
                             "cents": _cents(t.column(val))})

        return fn

    c_agg = cust.map_batches(prep("c_nationkey", "c_acctbal"),
                             batch_format="pyarrow", zero_copy_batch=True) \
        .groupby("c_nationkey").aggregate(Sum("cents", alias_name="c_cents"))
    s_agg = supp.map_batches(prep("s_nationkey", "s_acctbal"),
                             batch_format="pyarrow", zero_copy_batch=True) \
        .groupby("s_nationkey").aggregate(Sum("cents", alias_name="s_cents"))

    # num_partitions=1: both sides are grouped aggregates bounded by the
    # nation count (~25 rows), and Ray's hash-join finalize loses the
    # side schema on an EMPTY partition (pyarrow join KeyError) — one
    # partition guarantees both sides are non-empty wherever rows exist
    j = c_agg.join(s_agg, join_type="full_outer", num_partitions=1,
                   on=("c_nationkey",), right_on=("s_nationkey",))

    def fin(t: pa.Table) -> pa.Table:
        # Ray's full-outer join coalesces the join keys into the left
        # key column (SQL USING semantics): c_nationkey is already the
        # merged key
        zero = pa.scalar(0, pa.int64())
        return pa.table({
            "nationkey": t.column("c_nationkey").cast(pa.int32()),
            "cust_bal": _uncents(pc.fill_null(
                t.column("c_cents").cast(pa.int64()), zero)),
            "supp_bal": _uncents(pc.fill_null(
                t.column("s_cents").cast(pa.int64()), zero)),
        })

    return j.map_batches(fin, batch_format="pyarrow", zero_copy_batch=True)


def orders_monthly_growth(sf_dir: str):
    """Time-series over an aggregate: order counts per month plus
    month-over-month growth (LAG over the aggregated series). The
    grouped count pre-reduces per batch; the month series is bounded
    (#months), so the growth diff folds in one final task."""
    from ray.data.aggregate import Count

    ds = read(sf_dir, "orders", columns=["o_orderdate"])

    def month(t: pa.Table) -> pa.Table:
        m = pc.floor_temporal(t.column("o_orderdate"), unit="month") \
            .cast(pa.timestamp("us"))
        return pa.table({"month": m})

    agg = ds.map_batches(month, batch_format="pyarrow",
                         zero_copy_batch=True) \
        .groupby("month").aggregate(Count(alias_name="n_orders"))

    def growth(t: pa.Table) -> pa.Table:
        idx = pc.sort_indices(t, sort_keys=[("month", "ascending")])
        g = t.take(idx)
        n = g.column("n_orders").to_numpy().astype(np.float64)
        pct = np.full(len(n), np.nan)
        if len(n) > 1:
            pct[1:] = round_ha((n[1:] - n[:-1]) / n[:-1], 6)
        return pa.table({
            "month": g.column("month").cast(pa.timestamp("us")),
            "n_orders": g.column("n_orders"),
            "mom_growth": pa.array(pct, pa.float64(),
                                   mask=np.isnan(pct)),
        })

    return agg.repartition(1).map_batches(growth, batch_format="pyarrow")


def user_conversion_funnel(sf_dir: str):
    """Funnel analysis: per user, converted = the FIRST 'purchase'
    falls strictly after the FIRST 'view' (both must exist) — the
    min-only funnel formulation, decomposable as filtered-min partials
    per batch (type-masked min ts), one grouped Min exchange, then a
    vectorized compare — no per-user Python."""
    from ray.data.aggregate import Min

    ds = read(sf_dir, "events", columns=["ts", "user_id", "event_type"])
    far = pa.scalar(np.datetime64("2100-01-01", "us"))

    def prep(t: pa.Table) -> pa.Table:
        is_view = pc.equal(t.column("event_type"), pa.scalar("view"))
        is_buy = pc.equal(t.column("event_type"), pa.scalar("purchase"))
        ts = t.column("ts")
        return pa.table({
            "user_id": t.column("user_id"),
            # non-matching rows get a far-future sentinel so Min ignores
            # them without null handling differences across versions
            "view_ts": pc.if_else(is_view, ts, far),
            "buy_ts": pc.if_else(is_buy, ts, far),
        })

    agg = ds.map_batches(prep, batch_format="pyarrow", zero_copy_batch=True) \
        .groupby("user_id").aggregate(Min("view_ts", alias_name="first_view"),
                                      Min("buy_ts", alias_name="first_buy"))

    def fin(t: pa.Table) -> pa.Table:
        fv = t.column("first_view").cast(pa.timestamp("us"))
        fb = t.column("first_buy").cast(pa.timestamp("us"))
        has_view = pc.less(fv, far)
        has_buy = pc.less(fb, far)
        # converted: the user's FIRST purchase happened strictly after
        # their FIRST view (both must exist) — the min-only formulation
        # that stays decomposable; oracle computes the same expression
        conv = pc.and_(pc.and_(has_view, has_buy), pc.less(fv, fb))
        return pa.table({
            "user_id": t.column("user_id"),
            "first_view": pc.if_else(has_view, fv,
                                     pa.nulls(t.num_rows, pa.timestamp("us"))),
            "converted": conv,
        })

    return agg.map_batches(fin, batch_format="pyarrow", zero_copy_batch=True)


def user_retention(sf_dir: str, horizon_days: int = 7):
    """Cohort retention: users grouped by the day of their FIRST event;
    retained = the user is also active exactly ``horizon_days`` later.
    Shape: in-batch distinct (user, day) pairs (the exchange carries
    active-days, not events), ONE hash co-location by user, then a
    vectorized per-segment first-day + membership test
    (bitwise_or.reduceat), and a tiny cohort-level aggregate."""
    from ray.data.aggregate import Count, Sum

    ds = read(sf_dir, "events", columns=["ts", "user_id"])

    def active_pairs(t: pa.Table) -> pa.Table:
        day = pc.floor_temporal(t.column("ts"), unit="day") \
            .cast(pa.timestamp("us")).cast(pa.int64())
        return pa.table({"user_id": t.column("user_id"),
                         "day_us": day}).group_by(
            ["user_id", "day_us"]).aggregate([])

    act = ds.map_batches(active_pairs, batch_format="pyarrow",
                         zero_copy_batch=True)
    horizon_us = horizon_days * 86_400_000_000

    def per_user(part: pa.Table) -> pa.Table:
        if part.num_rows == 0:
            return pa.table({"cohort_us": pa.array([], pa.int64()),
                             "retained": pa.array([], pa.int64())})
        idx = pc.sort_indices(part, sort_keys=[
            ("user_id", "ascending"), ("day_us", "ascending")])
        g = part.take(idx)
        uid = g.column("user_id").to_numpy()
        day = g.column("day_us").to_numpy()
        starts = _segment_starts(uid)
        counts = np.diff(np.append(starts, len(uid)))
        d0 = np.repeat(day[starts], counts)
        hit = day == d0 + horizon_us  # distinct within user: ==, not >=
        retained = np.bitwise_or.reduceat(hit, starts)
        return pa.table({
            "cohort_us": pa.array(day[starts], pa.int64()),
            "retained": pa.array(retained.astype(np.int64), pa.int64()),
        })

    per = partitioned_map_groups(act, "user_id", per_user)
    agg = per.groupby("cohort_us").aggregate(
        Count(alias_name="n_users"), Sum("retained", alias_name="n_retained"))

    def fin(t: pa.Table) -> pa.Table:
        return pa.table({
            "cohort_day": t.column("cohort_us").cast(pa.timestamp("us")),
            "n_users": t.column("n_users"),
            "n_retained": t.column("n_retained").cast(pa.int64()),
        })

    return agg.map_batches(fin, batch_format="pyarrow", zero_copy_batch=True)


def grouped_standardize(ds, key: str, col: str, out_col: str = "z",
                        decimals: int = 4):
    """Per-group feature standardization (z-score): the two-pass ML
    normalization pattern. Pass 1 reduces each batch to integer-cent
    moment partials (n, Σx, Σx²) per group — one tiny exchange, exact
    sums; the per-group (mean, inv_std) table is broadcast. Pass 2 is a
    vectorized map over the original rows. Groups with zero variance
    emit null. Output rounded to ``decimals`` (both sides compute
    (x-μ)/σ in float64 from exact moments, so a coarse rounding absorbs
    the oracle's streaming-aggregation drift)."""
    import ray

    from ray.data.aggregate import Sum

    def partial(t: pa.Table) -> pa.Table:
        x = _cents(t.column(col)).to_numpy()
        k = t.column(key)
        tt = pa.table({key: k,
                       "n": pa.array(np.ones(len(x), np.int64)),
                       "s": pa.array(x, pa.int64()),
                       "ss": pa.array(x * x, pa.int64())})
        return tt.group_by(key).aggregate(
            [("n", "sum"), ("s", "sum"), ("ss", "sum")])

    stats = ds.map_batches(partial, batch_format="pyarrow",
                           zero_copy_batch=True) \
        .groupby(key).aggregate(Sum("n_sum", alias_name="n"),
                                Sum("s_sum", alias_name="s"),
                                Sum("ss_sum", alias_name="ss"))
    rows = pa.concat_tables(
        [b for b in stats.iter_batches(batch_format="pyarrow")])
    n = rows.column("n").to_numpy().astype(np.float64)
    s = rows.column("s").to_numpy().astype(np.float64)
    ss = rows.column("ss").to_numpy().astype(np.float64)
    mean = s / n / 100.0
    var = (ss / n - (s / n) ** 2) / 10000.0
    std = np.sqrt(np.maximum(var, 0.0))
    inv = np.where(std > 0, 1.0 / np.where(std > 0, std, 1.0), np.nan)
    ref = ray.put((rows.column(key).combine_chunks(),
                   [pa.array(mean, pa.float64()),
                    pa.array(inv, pa.float64())]))

    def apply(t: pa.Table) -> pa.Table:
        t = BroadcastJoin(ref, key, ["_mean", "_inv"])(t)
        x = t.column(col).to_numpy()
        z = (x - t.column("_mean").to_numpy()) * t.column("_inv").to_numpy()
        t = t.drop_columns(["_mean", "_inv"])
        # zero-variance groups -> NULL (oracle: NULLIF(stddev_pop, 0))
        arr = pa.array(z, pa.float64(), mask=np.isnan(z))
        return t.append_column(out_col, pc.round(arr, decimals))

    return ds.map_batches(apply, batch_format="pyarrow", zero_copy_batch=True)


def supplier_balance_zscore(sf_dir: str):
    """Per-nation z-score of supplier account balances (grouped
    standardization; oracle: window avg/stddev_pop)."""
    supp = read(sf_dir, "supplier",
                columns=["s_suppkey", "s_nationkey", "s_acctbal"])
    return grouped_standardize(supp, "s_nationkey", "s_acctbal")


def docs_lang_stats(sf_dir: str):
    """Per-language corpus stats over documents."""
    from ray.data.aggregate import Count, Mean, Sum

    ds = read(sf_dir, "documents", columns=["lang", "n_chars"])
    agg = ds.groupby("lang").aggregate(
        Count(alias_name="n_docs"),
        Sum("n_chars", alias_name="total_chars"),
        Mean("n_chars", alias_name="avg_chars"),
    )

    def final(t: pa.Table) -> pa.Table:
        i = t.schema.get_field_index("avg_chars")
        return t.set_column(i, "avg_chars", round_ha(t.column("avg_chars"), 6))

    return agg.map_batches(final, batch_format="pyarrow", zero_copy_batch=True)


# ---------------------------------------------------------------------------
# TPC-H-shaped round-2 additions: Q10 / Q14 / Q17 / Q18 / Q19 / Q22 shapes
# (new join/subquery shapes over the available tables; all oracled)
# ---------------------------------------------------------------------------

def _keys_ref(ds, col: str):
    """Collect a (small, pre-reduced) Dataset column into a ray.put key
    set for semi/anti broadcast stages. Callers must pre-reduce the
    dataset to dimension size first; at corpus scale the set becomes a
    Bloom filter or a hash semi-join (see anti_join_stage docstring)."""
    import ray

    keys = set()
    for b in ds.select_columns([col]).iter_batches(batch_format="pyarrow"):
        keys.update(b.column(col).to_pylist())
    return ray.put(keys)

def q10_returned_revenue(sf_dir: str, k: int = 20):
    """Returned-item revenue ranking (TPC-H Q10 shape): fact-side
    pre-aggregation (revenue per orderkey, one bounded groupby) -> native
    hash join against date-filtered orders (both sides scale with the
    fact table -> no broadcast) -> grouped sum per customer -> broadcast
    dimension joins (customer, nation) -> global top-k. Money summed as
    integer cents for float-order independence."""
    import datetime as _dt

    import pyarrow.dataset as pads
    import ray.data as rd
    from ray.data.aggregate import Sum

    li = rd.read_parquet(
        f"{sf_dir}/lineitem.parquet",
        columns=["l_orderkey", "l_extendedprice", "l_discount"],
        filter=(pads.field("l_returnflag") == "R"))

    def revenue(t: pa.Table) -> pa.Table:
        rev = pc.multiply(t.column("l_extendedprice"),
                          pc.subtract(pa.scalar(1.0), t.column("l_discount")))
        return pa.table({"l_orderkey": t.column("l_orderkey"),
                         "rev_cents": _cents(rev)})

    def sum_per_order(t: pa.Table) -> pa.Table:
        import polars as pl

        out = (pl.from_arrow(t).group_by("l_orderkey")
               .agg(pl.col("rev_cents").sum()))
        return out.to_arrow().cast(pa.schema([
            ("l_orderkey", pa.int64()), ("rev_cents", pa.int64())]))

    # high-cardinality groupby via bounded hash partitions + one
    # vectorized polars group_by per partition (int sums -> exact);
    # measured ~3.5x faster than the Aggregate exchange at sf0.1
    per_order = partitioned_map_groups(
        li.map_batches(revenue, batch_format="pyarrow",
                       zero_copy_batch=True),
        "l_orderkey", sum_per_order)

    orders = rd.read_parquet(
        f"{sf_dir}/orders.parquet", columns=["o_orderkey", "o_custkey"],
        filter=((pads.field("o_orderdate") >= _dt.datetime(1996, 1, 1))
                & (pads.field("o_orderdate") < _dt.datetime(1996, 4, 1))))
    joined = hash_join(per_order, orders, on="l_orderkey",
                       right_on="o_orderkey",
                       est_rows=parquet_rows(sf_dir, "orders"))
    per_cust = joined.groupby("o_custkey").aggregate(
        Sum("rev_cents", alias_name="rev_cents"))

    cust = read(sf_dir, "customer",
                columns=["c_custkey", "c_name", "c_acctbal", "c_nationkey"])
    cust_ref = broadcast_lookup(cust, "c_custkey",
                                ["c_name", "c_acctbal", "c_nationkey"])
    nation = read(sf_dir, "nation", columns=["n_nationkey", "n_name"])
    nation_ref = broadcast_lookup(nation, "n_nationkey", ["n_name"])

    def attach(t: pa.Table) -> pa.Table:
        t = BroadcastJoin(cust_ref, "o_custkey",
                          ["c_name", "c_acctbal", "c_nationkey"])(t)
        t = BroadcastJoin(nation_ref, "c_nationkey", ["n_name"])(t)
        return pa.table({
            "c_custkey": t.column("o_custkey"),
            "c_name": t.column("c_name"),
            "revenue": _uncents(t.column("rev_cents")),
            "c_acctbal": t.column("c_acctbal"),
            "n_name": t.column("n_name"),
        })

    out = per_cust.map_batches(attach, batch_format="pyarrow")
    return out.sort(["revenue", "c_custkey"],
                    descending=[True, False]).limit(k)


def q14_promo_share(sf_dir: str):
    """Promotion revenue share (TPC-H Q14 shape): broadcast dimension
    (part type) into a date-pruned fact scan, conditional integer-unit
    partial sums per batch, one-row final. No shuffle at all."""
    import datetime as _dt

    import pyarrow.dataset as pads
    import ray.data as rd

    part = read(sf_dir, "part", columns=["p_partkey", "p_type"])
    part_ref = broadcast_lookup(part, "p_partkey", ["p_type"])

    li = rd.read_parquet(
        f"{sf_dir}/lineitem.parquet",
        columns=["l_partkey", "l_extendedprice", "l_discount"],
        filter=((pads.field("l_shipdate") >= _dt.datetime(1997, 1, 1))
                & (pads.field("l_shipdate") < _dt.datetime(1997, 4, 1))))

    def partial(t: pa.Table) -> pa.Table:
        t = BroadcastJoin(part_ref, "l_partkey", ["p_type"])(t)
        rev = pc.round(
            pc.multiply(pc.multiply(
                t.column("l_extendedprice"),
                pc.subtract(pa.scalar(1.0), t.column("l_discount"))),
                pa.scalar(10000.0)),
            0, round_mode="half_towards_infinity").cast(pa.int64())
        promo = pc.equal(t.column("p_type"), pa.scalar("PROMO"))
        promo_rev = pc.if_else(promo, rev, pa.scalar(0, pa.int64()))
        return pa.table({
            "promo_e4": pa.array([pc.sum(promo_rev).as_py() or 0],
                                 pa.int64()),
            "total_e4": pa.array([pc.sum(rev).as_py() or 0], pa.int64()),
        })

    parts = li.map_batches(partial, batch_format="pyarrow",
                           zero_copy_batch=True)

    def final(t: pa.Table) -> pa.Table:
        promo = pc.sum(t.column("promo_e4")).as_py() or 0
        total = pc.sum(t.column("total_e4")).as_py() or 0
        share = round_ha(100.0 * promo / total, 6) if total else 0.0
        return pa.table({"promo_share_pct": pa.array([share], pa.float64())})

    return parts.repartition(1).map_batches(final, batch_format="pyarrow")


def q17_small_quantity_revenue(sf_dir: str, brand: str = "Brand#13"):
    """Correlated-scalar-subquery shape (TPC-H Q17): per-part average
    quantity via one bounded groupby (dimension-sized output), threshold
    broadcast back into a second fact scan, filter l_quantity <
    0.2*avg(part), global sum / 7. The correlated subquery becomes a
    broadcast map-side lookup — no per-row re-aggregation."""
    from ray.data.aggregate import Count, Sum

    li = read(sf_dir, "lineitem", columns=["l_partkey", "l_quantity"])

    def sums_per_part(t: pa.Table) -> pa.Table:
        import polars as pl

        out = (pl.from_arrow(t).group_by("l_partkey")
               .agg(pl.col("l_quantity").sum().alias("qty_sum"),
                    pl.len().alias("qty_n")))
        return out.to_arrow().cast(pa.schema([
            ("l_partkey", pa.int64()), ("qty_sum", pa.float64()),
            ("qty_n", pa.int64())]))

    # quantity is integral-valued -> float sums exact regardless of
    # partitioning; hash-partitioned vectorized group_by (see q18)
    per_part = partitioned_map_groups(li, "l_partkey", sums_per_part)

    def thresh(t: pa.Table) -> pa.Table:
        avg = pc.divide(t.column("qty_sum"),
                        t.column("qty_n").cast(pa.float64()))
        return pa.table({"l_partkey": t.column("l_partkey"),
                         "qty_thresh": pc.multiply(pa.scalar(0.2), avg)})

    thresh_ref = broadcast_lookup(
        per_part.map_batches(thresh, batch_format="pyarrow"),
        "l_partkey", ["qty_thresh"])

    bparts = read(sf_dir, "part", columns=["p_partkey"],
                  filter=(pc.field("p_brand") == brand))
    brand_keys_ref = _keys_ref(bparts, "p_partkey")

    li2 = read(sf_dir, "lineitem",
               columns=["l_partkey", "l_quantity", "l_extendedprice"])

    def partial(t: pa.Table) -> pa.Table:
        t = semi_join_stage(brand_keys_ref, "l_partkey")(t)
        t = BroadcastJoin(thresh_ref, "l_partkey", ["qty_thresh"])(t)
        t = t.filter(pc.less(t.column("l_quantity"),
                             t.column("qty_thresh")))
        price = _cents(t.column("l_extendedprice"))
        return pa.table({"price_cents": pa.array(
            [pc.sum(price).as_py() or 0], pa.int64())})

    parts = li2.map_batches(partial, batch_format="pyarrow",
                            zero_copy_batch=True)

    def final(t: pa.Table) -> pa.Table:
        cents = pc.sum(t.column("price_cents")).as_py() or 0
        return pa.table({"avg_yearly": pa.array(
            [round_ha(cents / 100.0 / 7.0, 2)], pa.float64())})

    return parts.repartition(1).map_batches(final, batch_format="pyarrow")


def q19_disjunctive_revenue(sf_dir: str):
    """Disjunctive multi-branch join predicate (TPC-H Q19 shape):
    broadcast part attributes (brand, size) into a quantity-pruned fact
    scan, evaluate the three-branch OR entirely with vectorized Arrow
    kernels, integer-unit partial sums."""
    import pyarrow.dataset as pads
    import ray.data as rd

    part = read(sf_dir, "part", columns=["p_partkey", "p_brand", "p_size"])
    part_ref = broadcast_lookup(part, "p_partkey", ["p_brand", "p_size"])

    li = rd.read_parquet(
        f"{sf_dir}/lineitem.parquet",
        columns=["l_partkey", "l_quantity", "l_extendedprice", "l_discount"],
        filter=((pads.field("l_quantity") >= 1.0)
                & (pads.field("l_quantity") <= 30.0)))

    def _branch(t, brand, qlo, qhi, smax):
        q, s = t.column("l_quantity"), t.column("p_size")
        return pc.and_(
            pc.and_(pc.equal(t.column("p_brand"), pa.scalar(brand)),
                    pc.and_(pc.greater_equal(q, pa.scalar(float(qlo))),
                            pc.less_equal(q, pa.scalar(float(qhi))))),
            pc.and_(pc.greater_equal(s, pa.scalar(1, pa.int32())),
                    pc.less_equal(s, pa.scalar(smax, pa.int32()))))

    def partial(t: pa.Table) -> pa.Table:
        t = BroadcastJoin(part_ref, "l_partkey", ["p_brand", "p_size"])(t)
        mask = pc.or_(pc.or_(_branch(t, "Brand#12", 1, 11, 5),
                             _branch(t, "Brand#23", 10, 20, 10)),
                      _branch(t, "Brand#34", 20, 30, 15))
        t = t.filter(mask)
        rev = pc.round(
            pc.multiply(pc.multiply(
                t.column("l_extendedprice"),
                pc.subtract(pa.scalar(1.0), t.column("l_discount"))),
                pa.scalar(10000.0)),
            0, round_mode="half_towards_infinity").cast(pa.int64())
        return pa.table({
            "rev_e4": pa.array([pc.sum(rev).as_py() or 0], pa.int64()),
            "n_items": pa.array([t.num_rows], pa.int64()),
        })

    parts = li.map_batches(partial, batch_format="pyarrow",
                           zero_copy_batch=True)

    def final(t: pa.Table) -> pa.Table:
        rev = pc.sum(t.column("rev_e4")).as_py() or 0
        n = pc.sum(t.column("n_items")).as_py() or 0
        return pa.table({
            "revenue": pa.array([round_ha(rev / 10000.0, 2)], pa.float64()),
            "n_items": pa.array([n], pa.int64()),
        })

    return parts.repartition(1).map_batches(final, batch_format="pyarrow")


def q18_large_orders(sf_dir: str, threshold: float = 300.0, k: int = 100):
    """Large-volume orders (TPC-H Q18 shape): HAVING over a fact-side
    groupby (sum of quantity per order), the tiny qualifying set
    broadcast back into the orders scan (inner broadcast join doubles as
    the semi-join), customer name attached map-side, global top-k."""
    from ray.data.aggregate import Sum

    li = read(sf_dir, "lineitem", columns=["l_orderkey", "l_quantity"])

    def having(t: pa.Table) -> pa.Table:
        import polars as pl

        out = (pl.from_arrow(t).group_by("l_orderkey")
               .agg(pl.col("l_quantity").sum().alias("sum_qty"))
               .filter(pl.col("sum_qty") > threshold))
        return out.to_arrow().cast(pa.schema([
            ("l_orderkey", pa.int64()), ("sum_qty", pa.float64())]))

    # hash-partitioned vectorized group_by+HAVING: measured 4.3s -> 1.2s
    # vs the Aggregate exchange on sf0.1 lineitem
    big = partitioned_map_groups(li, "l_orderkey", having)
    big_ref = broadcast_lookup(big, "l_orderkey", ["sum_qty"])

    orders = read(sf_dir, "orders",
                  columns=["o_orderkey", "o_custkey", "o_orderdate",
                           "o_totalprice"])
    cust = read(sf_dir, "customer", columns=["c_custkey", "c_name"])
    cust_ref = broadcast_lookup(cust, "c_custkey", ["c_name"])

    def attach(t: pa.Table) -> pa.Table:
        t = BroadcastJoin(big_ref, "o_orderkey", ["sum_qty"])(t)
        t = BroadcastJoin(cust_ref, "o_custkey", ["c_name"])(t)
        return t.select(["c_name", "o_custkey", "o_orderkey",
                         "o_orderdate", "o_totalprice", "sum_qty"])

    out = orders.map_batches(attach, batch_format="pyarrow",
                             zero_copy_batch=True)
    return out.sort(["o_totalprice", "o_orderkey"],
                    descending=[True, False]).limit(k)


def q22_idle_customers(sf_dir: str, since: str = "2000-01-01"):
    """Global-scalar subquery + anti-join (TPC-H Q22 shape): the
    positive-balance average is computed with integer-cent partials (one
    tiny exchange) and compared map-side; customers with a recent order
    are removed via a pre-reduced broadcast anti-join; grouped by the
    last-two-digit "country code" of c_name (fixed Customer#%09d
    format). Threshold arithmetic (sum_cents/100.0/count) is mirrored
    exactly by the oracle so the float comparison is bit-identical."""
    import datetime as _dt

    import pyarrow.dataset as pads
    import ray.data as rd
    from ray.data.aggregate import Count, Sum

    cust = read(sf_dir, "customer", columns=["c_custkey", "c_name",
                                             "c_acctbal"])

    def bal_partial(t: pa.Table) -> pa.Table:
        pos = t.filter(pc.greater(t.column("c_acctbal"), pa.scalar(0.0)))
        return pa.table({
            "bal_cents": pa.array(
                [pc.sum(_cents(pos.column("c_acctbal"))).as_py() or 0],
                pa.int64()),
            "n": pa.array([pos.num_rows], pa.int64()),
        })

    totals = (cust.map_batches(bal_partial, batch_format="pyarrow",
                               zero_copy_batch=True)
              .repartition(1)
              .map_batches(lambda t: pa.table({
                  "avg_bal": pa.array(
                      [(pc.sum(t.column("bal_cents")).as_py() or 0) / 100.0
                       / max(1, pc.sum(t.column("n")).as_py() or 0)],
                      pa.float64())}), batch_format="pyarrow")
              .take_all())
    avg_bal = totals[0]["avg_bal"]  # one scalar on the driver by design

    y, m, d = (int(x) for x in since.split("-"))
    recent = rd.read_parquet(
        f"{sf_dir}/orders.parquet", columns=["o_custkey"],
        filter=(pads.field("o_orderdate") >= _dt.datetime(y, m, d)))
    recent_keys_ref = _keys_ref(
        recent.groupby("o_custkey").count().select_columns(["o_custkey"]),
        "o_custkey")

    def partial(t: pa.Table) -> pa.Table:
        t = t.filter(pc.greater(t.column("c_acctbal"),
                                pa.scalar(float(avg_bal))))
        t = anti_join_stage(recent_keys_ref, "c_custkey")(t)
        code = pc.utf8_slice_codeunits(t.column("c_name"), 16, 18)
        return pa.table({"cntrycode": code,
                         "bal_cents": _cents(t.column("c_acctbal"))})

    from ray.data.aggregate import Count as _Count

    agg = (cust.map_batches(partial, batch_format="pyarrow",
                            zero_copy_batch=True)
           .groupby("cntrycode")
           .aggregate(_Count(alias_name="numcust"),
                      Sum("bal_cents", alias_name="bal_cents")))

    def final(t: pa.Table) -> pa.Table:
        return pa.table({
            "cntrycode": t.column("cntrycode"),
            "numcust": t.column("numcust"),
            "totacctbal": _uncents(t.column("bal_cents")),
        })

    return (agg.map_batches(final, batch_format="pyarrow")
            .sort("cntrycode"))


def docs_bigram_counts(sf_dir: str, k: int = 50):
    """Top-k corpus word bigrams: same scale shape as docs_term_counts
    (per-batch vectorized explode + adjacent-pair join via a windowed
    shift, partial counts, grouped sum) — the exchange carries one row
    per distinct bigram per batch, never one row per token pair."""
    from ray.data.aggregate import Sum

    ds = read(sf_dir, "documents", columns=["text"])

    def partial_counts(batch: pa.Table) -> pa.Table:
        # adjacent pairs on the flattened token stream, masked to stay
        # within a document (parent[i] == parent[i+1]) — Arrow/numpy
        # end-to-end, no explode materialization
        toks = pc.split_pattern(batch.column("text"), pattern=" ")
        flat = pc.list_flatten(toks).combine_chunks()
        parents = pc.list_parent_indices(toks).to_numpy()
        if len(flat) < 2:
            return pa.table({"bigram": pa.array([], pa.string()),
                             "len": pa.array([], pa.int64())})
        same = pa.array(parents[:-1] == parents[1:])
        w1 = flat.slice(0, len(flat) - 1).filter(same)
        w2 = flat.slice(1).filter(same)
        big = pc.binary_join_element_wise(w1, w2, " ")
        vc = big.value_counts()
        if isinstance(vc, pa.ChunkedArray):
            vc = vc.combine_chunks()
        return pa.table({"bigram": vc.field("values"),
                         "len": vc.field("counts").cast(pa.int64())})

    partials = ds.map_batches(partial_counts, batch_format="pyarrow",
                              zero_copy_batch=True) \
        .repartition(_default_parts())  # coalesce slim partial blocks
    agg = partials.groupby("bigram").aggregate(Sum("len", alias_name="n"))
    return agg.sort(["n", "bigram"], descending=[True, False]).limit(k)


def q7_nation_volume(sf_dir: str, nation_a: str = "NATION_3",
                     nation_b: str = "NATION_8"):
    """Volume shipping between two nations (TPC-H Q7 shape): revenue by
    (supplier nation, customer nation, ship year) for the ordered nation
    pairs (a,b) and (b,a). Dimension chain (supplier -> nation,
    customer -> nation) rides broadcast lookups on each fact scan; the
    big-big lineitem x orders equi-join runs as ONE copartitioned_map
    exchange on the order key with a vectorized polars inner join +
    pivoted partial sums per partition; a tiny grouped Sum finishes.
    Money is exact integer cents end-to-end."""
    import datetime as _dt

    import pyarrow.dataset as pads
    import ray.data as rd
    from ray.data.aggregate import Sum

    nat = dim_rows(sf_dir, "nation", columns=["n_nationkey", "n_name"],
                   filter=pc.field("n_name").isin([nation_a, nation_b]))
    nkeys = dict(zip(nat.column("n_nationkey").to_pylist(),
                     nat.column("n_name").to_pylist()))
    keyset = sorted(nkeys)

    supp = read(sf_dir, "supplier", columns=["s_suppkey", "s_nationkey"],
                filter=pc.field("s_nationkey").isin(keyset))
    supp_ref = broadcast_lookup(supp, "s_suppkey", ["s_nationkey"])
    cust = read(sf_dir, "customer", columns=["c_custkey", "c_nationkey"],
                filter=pc.field("c_nationkey").isin(keyset))
    cust_ref = broadcast_lookup(cust, "c_custkey", ["c_nationkey"])

    li = rd.read_parquet(
        f"{sf_dir}/lineitem.parquet",
        columns=["l_orderkey", "l_suppkey", "l_extendedprice",
                 "l_discount", "l_shipdate"],
        filter=((pads.field("l_shipdate") >= _dt.datetime(1996, 1, 1))
                & (pads.field("l_shipdate") < _dt.datetime(1998, 1, 1))))
    orders = read(sf_dir, "orders", columns=["o_orderkey", "o_custkey"])

    def prep_li(t: pa.Table) -> pa.Table:
        # keep only lineitems from the two nations' suppliers (inner
        # broadcast join), carry supplier nation + ship year + cents
        t = BroadcastJoin(supp_ref, "l_suppkey", ["s_nationkey"])(t)
        rev = pc.multiply(t.column("l_extendedprice"),
                          pc.subtract(pa.scalar(1.0), t.column("l_discount")))
        return pa.table({
            "k": t.column("l_orderkey"),
            "s_nat": t.column("s_nationkey").cast(pa.int64()),
            "yr": pc.year(t.column("l_shipdate")).cast(pa.int64()),
            "cents": _cents(rev)})

    def prep_orders(t: pa.Table) -> pa.Table:
        t = BroadcastJoin(cust_ref, "o_custkey", ["c_nationkey"])(t)
        n = t.num_rows
        return pa.table({
            "k": t.column("o_orderkey"),
            "s_nat": pa.nulls(n, pa.int64()),
            "yr": pa.nulls(n, pa.int64()),
            "cents": t.column("c_nationkey").cast(pa.int64())})
        # orders ride the common schema with c_nationkey in the cents
        # slot (both int64) — renamed back inside per_part

    def per_part(parts: list[pa.Table]) -> pa.Table:
        import polars as pl

        li_p, ord_p = parts
        if li_p.num_rows == 0 or ord_p.num_rows == 0:
            return pa.table({"supp_nation": pa.array([], pa.string()),
                             "cust_nation": pa.array([], pa.string()),
                             "l_year": pa.array([], pa.int64()),
                             "cents": pa.array([], pa.int64())})
        left = pl.from_arrow(li_p)
        right = (pl.from_arrow(ord_p.select(["k", "cents"]))
                 .rename({"cents": "c_nat"}))
        j = left.join(right, on="k", how="inner")
        # ordered nation pair filter: (a,b) or (b,a), never same-nation
        j = j.filter(pl.col("s_nat") != pl.col("c_nat"))
        out = (j.group_by(["s_nat", "c_nat", "yr"])
               .agg(pl.col("cents").sum()))
        t = out.to_arrow().cast(pa.schema([
            ("s_nat", pa.int64()), ("c_nat", pa.int64()),
            ("yr", pa.int64()), ("cents", pa.int64())]))
        names = pa.array([nkeys[k] for k in
                          t.column("s_nat").to_pylist()], pa.string())
        cnames = pa.array([nkeys[k] for k in
                           t.column("c_nat").to_pylist()], pa.string())
        return pa.table({"supp_nation": names, "cust_nation": cnames,
                         "l_year": t.column("yr"), "cents": t.column("cents")})

    partial = copartitioned_map([(li, prep_li), (orders, prep_orders)],
                                "k", per_part)
    agg = partial.groupby(["supp_nation", "cust_nation", "l_year"]) \
        .aggregate(Sum("cents", alias_name="cents"))

    def fin(t: pa.Table) -> pa.Table:
        return pa.table({
            "supp_nation": t.column("supp_nation"),
            "cust_nation": t.column("cust_nation"),
            "l_year": t.column("l_year"),
            "revenue": _uncents(t.column("cents"))})

    return agg.map_batches(fin, batch_format="pyarrow",
                           zero_copy_batch=True) \
        .sort(["supp_nation", "cust_nation", "l_year"])


def q15_top_supplier(sf_dir: str):
    """Top supplier(s) by quarterly revenue (TPC-H Q15 shape): revenue
    per supplier over a shipdate quarter via one bounded hash-partitioned
    group_by (supplier cardinality is dimension-scale, but the input is
    the fact table — pre-reduce per batch, then partition); the global
    max is read off the (bounded) aggregate and suppliers achieving it
    join names via broadcast. Ties all surface (oracle = HAVING = MAX)."""
    import datetime as _dt

    import pyarrow.dataset as pads
    import ray.data as rd

    li = rd.read_parquet(
        f"{sf_dir}/lineitem.parquet",
        columns=["l_suppkey", "l_extendedprice", "l_discount"],
        filter=((pads.field("l_shipdate") >= _dt.datetime(1996, 1, 1))
                & (pads.field("l_shipdate") < _dt.datetime(1996, 4, 1))))

    def partial(t: pa.Table) -> pa.Table:
        rev = pc.multiply(t.column("l_extendedprice"),
                          pc.subtract(pa.scalar(1.0), t.column("l_discount")))
        part = pa.table({"l_suppkey": t.column("l_suppkey"),
                         "cents": _cents(rev)})
        g = part.group_by("l_suppkey").aggregate([("cents", "sum")])
        return pa.table({"l_suppkey": g.column("l_suppkey"),
                         "cents": g.column("cents_sum").cast(pa.int64())})

    def sum_supp(t: pa.Table) -> pa.Table:
        g = t.group_by("l_suppkey").aggregate([("cents", "sum")])
        return pa.table({"l_suppkey": g.column("l_suppkey"),
                         "cents": g.column("cents_sum").cast(pa.int64())})

    per_supp = partitioned_map_groups(
        li.map_batches(partial, batch_format="pyarrow",
                       zero_copy_batch=True),
        "l_suppkey", sum_supp).materialize()
    # the aggregate is bounded by supplier cardinality; one tiny fold
    # for the global max, then a vectorized equality filter
    best = 0
    for b in per_supp.iter_batches(batch_format="pyarrow"):
        m = pc.max(b.column("cents")).as_py()
        if m is not None:
            best = max(best, m)

    supp_ref = broadcast_lookup(
        read(sf_dir, "supplier", columns=["s_suppkey", "s_name"]),
        "s_suppkey", ["s_name"])

    def fin(t: pa.Table) -> pa.Table:
        t = t.filter(pc.equal(t.column("cents"), pa.scalar(best)))
        t = BroadcastJoin(supp_ref, "l_suppkey", ["s_name"])(t)
        return pa.table({
            "s_suppkey": t.column("l_suppkey"),
            "s_name": t.column("s_name"),
            "total_revenue": _uncents(t.column("cents"))})

    return per_supp.map_batches(fin, batch_format="pyarrow") \
        .sort("s_suppkey")


def q8_market_share(sf_dir: str, region: str = "ASIA",
                    nation: str = "NATION_7", ptype: str = "STANDARD"):
    """National market share (TPC-H Q8 shape): of the revenue a region's
    customers spent on one part type in 1996-1997, the share supplied by
    one nation, per order year.

    Scale shape: the three dimension chains all ride broadcasts — the
    part-type filter becomes an INNER BroadcastJoin on the fact scan
    (partkey set is |part|-bounded), supplier carries s_nationkey, and
    customer is pre-filtered to the region's nations at the parquet read
    before becoming a lookup. The only big-big join (lineitem x orders
    on orderkey) is ONE copartitioned_map exchange with a vectorized
    polars inner join and pivoted per-partition partial sums, so the
    exchange carries (orderkey, nat_flag, year, e4-cents) — never blobs.
    Revenue in integer 1e-4 units end-to-end (exact share arithmetic,
    same trick as q14)."""
    import datetime as _dt

    import pyarrow.dataset as pads
    import ray.data as rd
    from ray.data.aggregate import Sum

    nat = dim_rows(sf_dir, "nation",
                   columns=["n_nationkey", "n_name", "n_regionkey"])
    rkey = dim_rows(sf_dir, "region", columns=["r_regionkey", "r_name"],
                    filter=pc.field("r_name") == region) \
        .column("r_regionkey")[0].as_py()
    nrows = nat.to_pylist()
    region_nations = sorted(r["n_nationkey"] for r in nrows
                            if r["n_regionkey"] == rkey)
    target_nkey = next(r["n_nationkey"] for r in nrows
                       if r["n_name"] == nation)

    part = read(sf_dir, "part", columns=["p_partkey"],
                filter=pc.field("p_type") == ptype)
    part_ref = broadcast_lookup(part, "p_partkey", [])
    supp_ref = broadcast_lookup(
        read(sf_dir, "supplier", columns=["s_suppkey", "s_nationkey"]),
        "s_suppkey", ["s_nationkey"])
    cust = read(sf_dir, "customer", columns=["c_custkey"],
                filter=pc.field("c_nationkey").isin(region_nations))
    cust_ref = broadcast_lookup(cust, "c_custkey", [])

    li = read(sf_dir, "lineitem",
              columns=["l_orderkey", "l_partkey", "l_suppkey",
                       "l_extendedprice", "l_discount"])
    orders = rd.read_parquet(
        f"{sf_dir}/orders.parquet",
        columns=["o_orderkey", "o_custkey", "o_orderdate"],
        filter=((pads.field("o_orderdate") >= _dt.datetime(1996, 1, 1))
                & (pads.field("o_orderdate") < _dt.datetime(1998, 1, 1))))

    def prep_li(t: pa.Table) -> pa.Table:
        t = BroadcastJoin(part_ref, "l_partkey", [])(t)   # semi: type match
        t = BroadcastJoin(supp_ref, "l_suppkey", ["s_nationkey"])(t)
        rev = pc.round(
            pc.multiply(pc.multiply(
                t.column("l_extendedprice"),
                pc.subtract(pa.scalar(1.0), t.column("l_discount"))),
                pa.scalar(10000.0)),
            0, round_mode="half_towards_infinity").cast(pa.int64())
        is_nat = pc.equal(t.column("s_nationkey"),
                          pa.scalar(target_nkey)).cast(pa.int64())
        return pa.table({"k": t.column("l_orderkey"),
                         "a": is_nat, "b": rev})

    def prep_orders(t: pa.Table) -> pa.Table:
        t = BroadcastJoin(cust_ref, "o_custkey", [])(t)   # semi: region
        return pa.table({
            "k": t.column("o_orderkey"),
            "a": pc.year(t.column("o_orderdate")).cast(pa.int64()),
            "b": pa.nulls(t.num_rows, pa.int64())})

    def per_part(parts: list[pa.Table]) -> pa.Table:
        import polars as pl

        li_p, ord_p = parts
        if li_p.num_rows == 0 or ord_p.num_rows == 0:
            return pa.table({"o_year": pa.array([], pa.int64()),
                             "nat_e4": pa.array([], pa.int64()),
                             "total_e4": pa.array([], pa.int64())})
        left = pl.from_arrow(li_p).rename({"a": "is_nat", "b": "e4"})
        right = (pl.from_arrow(ord_p.select(["k", "a"]))
                 .rename({"a": "o_year"}))
        j = left.join(right, on="k", how="inner")
        out = (j.group_by("o_year")
               .agg([(pl.col("e4") * pl.col("is_nat")).sum()
                     .alias("nat_e4"),
                     pl.col("e4").sum().alias("total_e4")]))
        return out.to_arrow().cast(pa.schema([
            ("o_year", pa.int64()), ("nat_e4", pa.int64()),
            ("total_e4", pa.int64())]))

    partial = copartitioned_map([(li, prep_li), (orders, prep_orders)],
                                "k", per_part)
    agg = partial.groupby("o_year").aggregate(
        Sum("nat_e4", alias_name="nat_e4"),
        Sum("total_e4", alias_name="total_e4"))

    def fin(t: pa.Table) -> pa.Table:
        share = round_ha(pc.divide(
            t.column("nat_e4").cast(pa.float64()),
            t.column("total_e4").cast(pa.float64())), 6)
        return pa.table({"o_year": t.column("o_year"),
                         "mkt_share": share})

    return agg.map_batches(fin, batch_format="pyarrow",
                           zero_copy_batch=True).sort("o_year")


def q21_sole_blame(sf_dir: str, k: int = 25):
    """Suppliers solely responsible for a returned line in a
    multi-supplier finished order (TPC-H Q21 shape: the EXISTS
    another-supplier / NOT-EXISTS another-returning-supplier pair,
    adapted to this schema's returnflag).

    Scale shape: ONE copartitioned exchange on the order key co-locates
    the slim lineitem projection (orderkey, suppkey, returned-bit) with
    the status-filtered orders keys; each partition resolves the
    per-order existence predicates with two vectorized polars group_bys
    and emits per-supplier partial counts, so the final groupby carries
    one row per (partition, supplier). Names attach via broadcast on
    the |supplier|-bounded result."""
    import pyarrow.dataset as pads
    import ray.data as rd
    from ray.data.aggregate import Sum

    li = read(sf_dir, "lineitem",
              columns=["l_orderkey", "l_suppkey", "l_returnflag"])
    orders = rd.read_parquet(
        f"{sf_dir}/orders.parquet", columns=["o_orderkey"],
        filter=(pads.field("o_orderstatus") == "F"))

    def prep_li(t: pa.Table) -> pa.Table:
        return pa.table({
            "k": t.column("l_orderkey"),
            "s": t.column("l_suppkey"),
            "r": pc.equal(t.column("l_returnflag"),
                          pa.scalar("R")).cast(pa.int64())})

    def prep_orders(t: pa.Table) -> pa.Table:
        n = t.num_rows
        return pa.table({"k": t.column("o_orderkey"),
                         "s": pa.nulls(n, pa.int64()),
                         "r": pa.nulls(n, pa.int64())})

    def per_part(parts: list[pa.Table]) -> pa.Table:
        import polars as pl

        li_p, ord_p = parts
        if li_p.num_rows == 0 or ord_p.num_rows == 0:
            return pa.table({"s_suppkey": pa.array([], pa.int64()),
                             "n_orders": pa.array([], pa.int64())})
        l = pl.from_arrow(li_p).join(
            pl.from_arrow(ord_p.select(["k"])), on="k", how="semi")
        per = l.group_by("k").agg(pl.col("s").n_unique().alias("ns"))
        ret = (l.filter(pl.col("r") == 1).group_by("k")
               .agg([pl.col("s").n_unique().alias("nr"),
                     pl.col("s").min().alias("culprit")]))
        j = (per.join(ret, on="k", how="inner")
             .filter((pl.col("ns") >= 2) & (pl.col("nr") == 1)))
        out = (j.group_by("culprit").len(name="n_orders")
               .rename({"culprit": "s_suppkey"}))
        return out.to_arrow().cast(pa.schema([
            ("s_suppkey", pa.int64()), ("n_orders", pa.int64())]))

    partial = copartitioned_map([(li, prep_li), (orders, prep_orders)],
                                "k", per_part)
    agg = partial.groupby("s_suppkey").aggregate(
        Sum("n_orders", alias_name="n_orders"))

    supp_ref = broadcast_lookup(
        read(sf_dir, "supplier", columns=["s_suppkey", "s_name"]),
        "s_suppkey", ["s_name"])

    def add_name(t: pa.Table) -> pa.Table:
        t = BroadcastJoin(supp_ref, "s_suppkey", ["s_name"])(t)
        return t.select(["s_suppkey", "s_name", "n_orders"])

    return (agg.map_batches(add_name, batch_format="pyarrow")
            .sort(["n_orders", "s_suppkey"], descending=[True, False])
            .limit(k))


def q2_best_supplier(sf_dir: str, region: str = "EUROPE",
                     max_size: int = 10):
    """Best supplier per part (TPC-H Q2 shape, adapted to this schema:
    no partsupp table, so shipment evidence comes from lineitem and
    "best" = highest account balance): for each small part, the
    region's supplier with max s_acctbal among suppliers that shipped
    it.

    Scale shape: the part-size and supplier-region predicates become
    broadcast INNER lookups on the fact scan (both dimension-bounded);
    the per-batch DISTINCT (partkey, suppkey) projection collapses the
    fact volume before the ONE hash exchange on partkey, where a
    vectorized sort + segment-first picks each part's argmax. Ties
    break deterministically (acctbal desc, suppkey asc)."""
    nat = dim_rows(sf_dir, "nation",
                   columns=["n_nationkey", "n_regionkey"])
    rkey = dim_rows(sf_dir, "region", columns=["r_regionkey", "r_name"],
                    filter=pc.field("r_name") == region) \
        .column("r_regionkey")[0].as_py()
    region_nations = sorted(
        r["n_nationkey"] for r in nat.to_pylist()
        if r["n_regionkey"] == rkey)

    part_ref = broadcast_lookup(
        read(sf_dir, "part", columns=["p_partkey"],
             filter=pc.field("p_size") <= max_size),
        "p_partkey", [])
    supp_ref = broadcast_lookup(
        read(sf_dir, "supplier",
             columns=["s_suppkey", "s_name", "s_acctbal"],
             filter=pc.field("s_nationkey").isin(region_nations)),
        "s_suppkey", ["s_name", "s_acctbal"])

    li = read(sf_dir, "lineitem", columns=["l_partkey", "l_suppkey"])

    def prep(t: pa.Table) -> pa.Table:
        t = BroadcastJoin(part_ref, "l_partkey", [])(t)
        t = BroadcastJoin(supp_ref, "l_suppkey",
                          ["s_name", "s_acctbal"])(t)
        # in-batch distinct (partkey, suppkey): the pair stream the
        # exchange carries is bounded by |distinct pairs|, not |lineitem|
        import polars as pl

        return (pl.from_arrow(t)
                .unique(subset=["l_partkey", "l_suppkey"])
                .to_arrow().cast(t.schema))

    cand = li.map_batches(prep, batch_format="pyarrow",
                          zero_copy_batch=True)

    def best(part: pa.Table) -> pa.Table:
        idx = pc.sort_indices(part, sort_keys=[
            ("l_partkey", "ascending"), ("s_acctbal", "descending"),
            ("l_suppkey", "ascending")])
        g = part.take(idx)
        starts = _segment_starts(g.column("l_partkey").to_numpy())
        g = g.take(pa.array(starts, pa.int64()))
        return pa.table({
            "p_partkey": g.column("l_partkey"),
            "s_suppkey": g.column("l_suppkey"),
            "s_name": g.column("s_name"),
            "s_acctbal": g.column("s_acctbal")})

    return partitioned_map_groups(cand, "l_partkey", best) \
        .sort("p_partkey")


def q12_priority_by_flag(sf_dir: str):
    """Two-large-sides inner join + conditional pivot (TPC-H Q12 shape:
    lines per shipmode split by order priority class; the synthetic
    schema has no l_shipmode, so l_returnflag plays that role). The
    shipdate window is pushed into the lineitem scan; the orders side
    ships only (orderkey, 1-bit priority class); ONE copartitioned
    exchange co-locates the two slim projections, each partition does a
    vectorized index_in probe + pivoted partial counts, and a tiny
    grouped Sum finishes (TPC-H Q12 plan: join both large tables, CASE
    pivot, group by the line attribute)."""
    import datetime as _dt

    import pyarrow.dataset as pads
    from ray.data.aggregate import Sum

    li = read(sf_dir, "lineitem", columns=["l_orderkey", "l_returnflag"],
              filter=((pads.field("l_shipdate") >= _dt.datetime(1995, 1, 1))
                      & (pads.field("l_shipdate") < _dt.datetime(1997, 1, 1))))
    orders = read(sf_dir, "orders", columns=["o_orderkey", "o_orderpriority"])
    high = ("1-URGENT", "2-HIGH")

    def prep_li(t: pa.Table) -> pa.Table:
        return pa.table({"k": t.column("l_orderkey"),
                         "flag": t.column("l_returnflag"),
                         "hi": pa.nulls(t.num_rows, pa.bool_())})

    def prep_orders(t: pa.Table) -> pa.Table:
        return pa.table({
            "k": t.column("o_orderkey"),
            "flag": pa.nulls(t.num_rows, pa.string()),
            "hi": pc.is_in(t.column("o_orderpriority"),
                           value_set=pa.array(high, pa.string())),
        })

    def per_part(parts: list[pa.Table]) -> pa.Table:
        li_p, ord_p = parts
        empty = pa.table({"l_returnflag": pa.array([], pa.string()),
                          "high_part": pa.array([], pa.int64()),
                          "low_part": pa.array([], pa.int64())})
        if li_p.num_rows == 0 or ord_p.num_rows == 0:
            return empty
        idx = pc.index_in(li_p.column("k"),
                          value_set=ord_p.column("k").combine_chunks())
        matched = pa.table({
            "l_returnflag": li_p.column("flag"),
            "hi": pc.take(ord_p.column("hi").combine_chunks(), idx),
        }).filter(pc.is_valid(idx))
        if matched.num_rows == 0:
            return empty
        flat = pa.table({
            "l_returnflag": matched.column("l_returnflag"),
            "high_part": pc.cast(matched.column("hi"), pa.int64()),
            "low_part": pc.cast(pc.invert(matched.column("hi")), pa.int64()),
        })
        agg = flat.group_by("l_returnflag").aggregate(
            [("high_part", "sum"), ("low_part", "sum")])
        return pa.table({
            "l_returnflag": agg.column("l_returnflag"),
            "high_part": agg.column("high_part_sum").cast(pa.int64()),
            "low_part": agg.column("low_part_sum").cast(pa.int64())})

    partial = copartitioned_map([(li, prep_li), (orders, prep_orders)],
                                "k", per_part)
    return (partial.groupby("l_returnflag")
            .aggregate(Sum("high_part", alias_name="high_count"),
                       Sum("low_part", alias_name="low_count"))
            .sort("l_returnflag"))


def q13_orders_per_customer(sf_dir: str):
    """Left-outer aggregate join + count distribution (TPC-H Q13 shape:
    how many customers placed N qualifying orders, INCLUDING the
    zero-order customers that an inner join would lose; the filter that
    TPC-H puts on o_comment lands on o_orderstatus here). Both sides are
    large at scale, so: orders are pre-filtered at the scan, both sides
    project to a bare custkey column, ONE copartitioned exchange
    co-locates them, each partition counts orders per custkey (Arrow
    group_by), zero-fills customers with no match (the LEFT OUTER part
    — correct because ALL rows of a custkey hash to one partition), and
    emits a partial (c_count -> n customers) histogram; a tiny grouped
    Sum merges the histograms."""
    import pyarrow.dataset as pads
    from ray.data.aggregate import Sum

    cust = read(sf_dir, "customer", columns=["c_custkey"])
    orders = read(sf_dir, "orders", columns=["o_custkey"],
                  filter=pads.field("o_orderstatus") != "F")

    def prep_c(t: pa.Table) -> pa.Table:
        return pa.table({"k": t.column("c_custkey")})

    def prep_o(t: pa.Table) -> pa.Table:
        return pa.table({"k": t.column("o_custkey")})

    def per_part(parts: list[pa.Table]) -> pa.Table:
        cust_p, ord_p = parts
        if cust_p.num_rows == 0:
            return pa.table({"c_count": pa.array([], pa.int64()),
                             "n_part": pa.array([], pa.int64())})
        cnt = ord_p.group_by("k").aggregate([("k", "count")])
        idx = pc.index_in(cust_p.column("k"),
                          value_set=cnt.column("k").combine_chunks())
        per_cust = pc.fill_null(
            pc.cast(pc.take(cnt.column("k_count").combine_chunks(), idx),
                    pa.int64()),
            0)
        h = pa.table({"c_count": per_cust}).group_by("c_count") \
            .aggregate([("c_count", "count")])
        return pa.table({"c_count": h.column("c_count"),
                         "n_part": h.column("c_count_count").cast(pa.int64())})

    partial = copartitioned_map([(cust, prep_c), (orders, prep_o)],
                                "k", per_part)
    return (partial.groupby("c_count")
            .aggregate(Sum("n_part", alias_name="custdist"))
            .sort(["custdist", "c_count"], descending=[True, True]))


def _segment_rank(sorted_keys) -> np.ndarray:
    """Rank of each row within its key segment of an already key-sorted
    column (0-based). Works for string and numeric keys."""
    n = len(sorted_keys)
    if n == 0:
        return np.zeros(0, np.int64)
    vals = np.asarray(sorted_keys.to_numpy(zero_copy_only=False))
    new = np.ones(n, bool)
    new[1:] = vals[1:] != vals[:-1]
    starts = np.flatnonzero(new)
    seg = np.cumsum(new) - 1
    return np.arange(n, dtype=np.int64) - starts[seg]


def grouped_topk(ds, key: str, k: int, sort_keys: list[tuple[str, str]]):
    """Per-key top-k rows by ``sort_keys`` (window row_number() <= k).

    Scale shape: the top-k partial is MERGEABLE, so each batch first
    collapses to at most k rows per key it contains (in-batch sort +
    vectorized segment rank — the exchange carries <= k rows per key
    per block, never the raw table); ONE hash-partition exchange on the
    key co-locates the survivors and the same collapse runs once per
    partition for the exact final answer. Deterministic only if
    sort_keys break all ties (append a unique id column)."""
    full_keys = [(key, "ascending")] + list(sort_keys)

    def topk(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return t
        g = t.take(pc.sort_indices(t, sort_keys=full_keys))
        keep = _segment_rank(g.column(key)) < k
        return g.filter(pa.array(keep))

    pre = ds.map_batches(topk, batch_format="pyarrow",
                         zero_copy_batch=True)
    return partitioned_map_groups(pre, key, topk)


def orders_top_per_priority(sf_dir: str, k: int = 3):
    """Top-k orders by total price within every order priority (grouped
    top-k / window row_number; oracled against row_number() OVER)."""
    ds = read(sf_dir, "orders",
              columns=["o_orderpriority", "o_orderkey", "o_totalprice"])
    out = grouped_topk(ds, "o_orderpriority", k,
                       [("o_totalprice", "descending"),
                        ("o_orderkey", "ascending")])
    return out.sort(["o_orderpriority", "o_totalprice", "o_orderkey"],
                    descending=[False, True, False])


def orders_rollup(sf_dir: str):
    """GROUP BY ROLLUP(priority, status) in one corpus pass: every
    batch emits partials for ALL THREE grouping sets at once ((pri,
    status), (pri), ()) with rolled levels pinned to the literal 'ALL',
    so a single small grouped-Sum exchange finishes every level —
    instead of one aggregation pass per level. Money sums use the
    integer-cents trick for float-order independence."""
    from ray.data.aggregate import Sum

    ds = read(sf_dir, "orders",
              columns=["o_orderpriority", "o_orderstatus", "o_totalprice"])

    def levels(t: pa.Table) -> pa.Table:
        cents = pc.round(pc.multiply(t.column("o_totalprice"),
                                     pa.scalar(100.0)),
                         0, round_mode="half_towards_infinity") \
            .cast(pa.int64())
        base = pa.table({"priority": t.column("o_orderpriority"),
                         "status": t.column("o_orderstatus"),
                         "n": pa.array(np.ones(t.num_rows, np.int64)),
                         "cents": cents})
        alls = pa.array(np.full(t.num_rows, "ALL"), pa.string())
        lvl1 = base.set_column(1, "status", alls)
        lvl2 = lvl1.set_column(0, "priority", alls)
        out = pa.concat_tables([base, lvl1, lvl2])
        g = out.group_by(["priority", "status"]).aggregate(
            [("n", "sum"), ("cents", "sum")])
        return pa.table({"priority": g.column("priority"),
                         "status": g.column("status"),
                         "n": g.column("n_sum").cast(pa.int64()),
                         "cents": g.column("cents_sum")})

    agg = ds.map_batches(levels, batch_format="pyarrow",
                         zero_copy_batch=True) \
        .groupby(["priority", "status"]) \
        .aggregate(Sum("n", alias_name="n_orders"),
                   Sum("cents", alias_name="cents"))

    def money(t: pa.Table) -> pa.Table:
        rev = pc.round(pc.divide(t.column("cents").cast(pa.float64()),
                                 pa.scalar(100.0)), 2)
        return pa.table({"priority": t.column("priority"),
                         "status": t.column("status"),
                         "n_orders": t.column("n_orders"),
                         "revenue": rev})

    return agg.map_batches(money, batch_format="pyarrow") \
        .sort(["priority", "status"])


def events_hourly_gapfill(sf_dir: str):
    """Hourly event counts with EMPTY HOURS ZERO-FILLED between the
    corpus min and max hour (time-series resample / gap fill). The
    corpus pass reduces to per-batch (hour, n) partials — bounded by
    the time span, not the event count — and one small grouped Sum;
    the dense hour axis is synthesized driver-side (span-bounded) and
    the observed counts land on it with one vectorized index_in."""
    from ray.data.aggregate import Sum

    ds = read(sf_dir, "events", columns=["ts"])

    def partial(t: pa.Table) -> pa.Table:
        # exchange hours as int64 us (Ray's sort-based Aggregate narrows
        # whole-hour timestamp[us] keys to timestamp[s]); restore the
        # temporal type only on the final axis
        h = pc.floor_temporal(t.column("ts"), unit="hour") \
            .cast(pa.timestamp("us")).cast(pa.int64())
        g = pa.table({"hour": h,
                      "n": pa.array(np.ones(t.num_rows, np.int64))}) \
            .group_by("hour").aggregate([("n", "sum")])
        return pa.table({"hour": g.column("hour"),
                         "n": g.column("n_sum").cast(pa.int64())})

    agg = ds.map_batches(partial, batch_format="pyarrow",
                         zero_copy_batch=True) \
        .groupby("hour").aggregate(Sum("n", alias_name="n")) \
        .materialize()  # bounded by the hour span, not by events

    tbls = list(agg.iter_batches(batch_format="pyarrow"))
    import ray.data as rd

    if not tbls:
        return rd.from_arrow(pa.table({
            "hour": pa.array([], pa.timestamp("us")),
            "n_events": pa.array([], pa.int64())}))
    obs = pa.concat_tables(tbls)
    hours_us = obs.column("hour").to_numpy()
    step = 3_600_000_000  # 1h in us
    axis = np.arange(hours_us.min(), hours_us.max() + step, step)
    dense_us = pa.array(axis, pa.int64())
    idx = pc.index_in(dense_us, value_set=obs.column("hour").combine_chunks())
    n = pc.fill_null(pc.take(obs.column("n").combine_chunks(), idx), 0)
    return rd.from_arrow(pa.table({"hour": dense_us.cast(pa.timestamp("us")),
                                   "n_events": n.cast(pa.int64())}))


def events_funnel_users(sf_dir: str):
    """Sequence funnel: how many users VIEWED and then later PURCHASED
    (first view strictly before last purchase). Per-batch mergeable
    partials (per user: min view ts, max purchase ts — masked Arrow
    group_by), one grouped Min/Max exchange on user, then a streamed
    per-block qualifying count; only the scalar leaves."""
    from ray.data.aggregate import Max, Min

    ds = read(sf_dir, "events", columns=["ts", "user_id", "event_type"],
              filter=(pc.field("event_type").isin(["view", "purchase"])))

    def partial(t: pa.Table) -> pa.Table:
        ts = t.column("ts").cast(pa.int64())
        is_v = pc.equal(t.column("event_type"), pa.scalar("view"))
        g = pa.table({
            "user_id": t.column("user_id"),
            "vts": pc.if_else(is_v, ts, pa.scalar(None, pa.int64())),
            "pts": pc.if_else(pc.invert(is_v), ts,
                              pa.scalar(None, pa.int64())),
        }).group_by("user_id").aggregate([("vts", "min"), ("pts", "max")])
        return pa.table({"user_id": g.column("user_id"),
                         "vts": g.column("vts_min"),
                         "pts": g.column("pts_max")})

    per_user = ds.map_batches(partial, batch_format="pyarrow",
                              zero_copy_batch=True) \
        .groupby("user_id").aggregate(Min("vts", alias_name="vts"),
                                      Max("pts", alias_name="pts"))

    def qualify(t: pa.Table) -> pa.Table:
        ok = pc.and_kleene(pc.is_valid(t.column("vts")),
                           pc.less(t.column("vts"), t.column("pts")))
        n = pc.sum(pc.cast(pc.fill_null(ok, False), pa.int64()))
        return pa.table({"n": pa.array([n.as_py() or 0], pa.int64())})

    n = per_user.map_batches(qualify, batch_format="pyarrow").sum("n")
    return pa.table({"n_users": pa.array([int(n or 0)], pa.int64())})


def events_late_arrivals(sf_dir: str, lateness_us: int = 300_000_000,
                         stride: int = 7):
    """Late-data detection under a per-user watermark (the §2.9
    streaming semantics made explicit). The synthetic events are
    perfectly time-ordered, so a deterministic SKEWED ARRIVAL schedule
    replays each user's stream in ``(event_id % stride, event_id)``
    order — a strided interleave that genuinely delivers events out of
    event-time order, like network reordering. The watermark at each
    arrival is the running max event-time of the PRECEDING arrivals
    minus ``lateness_us`` (5 min default); an event is late iff its own
    timestamp sits below it. Emits only the late rows: (event_id,
    user_id, late_by_us = prev_max - ts - lateness_us > 0).

    Scale shape: one hash co-location by user (the watermark is
    per-key), then a vectorized polars shift+cum_max per partition —
    no per-event Python, no second exchange. Oracled via
    max(ts) OVER (... ROWS UNBOUNDED PRECEDING AND 1 PRECEDING) with
    the same arrival ORDER BY."""
    ds = read(sf_dir, "events", columns=["event_id", "ts", "user_id"])

    def late(part: pa.Table) -> pa.Table:
        import polars as pl

        empty = pa.table({"event_id": pa.array([], pa.int64()),
                          "user_id": pa.array([], pa.int64()),
                          "late_by_us": pa.array([], pa.int64())})
        if part.num_rows == 0:
            return empty
        df = (pl.from_arrow(part)
              .with_columns((pl.col("event_id") % stride).alias("_arr"))
              .sort(["user_id", "_arr", "event_id"]))
        out = (df.with_columns(
                   pl.col("ts").shift(1).cum_max().over("user_id")
                   .alias("prev_max"))
               .with_columns(
                   ((pl.col("prev_max") - pl.col("ts"))
                    .dt.total_microseconds() - lateness_us)
                   .alias("late_by_us"))
               .filter(pl.col("late_by_us") > 0)
               .select(["event_id", "user_id", "late_by_us"]))
        t = out.to_arrow()
        if t.num_rows == 0:
            return empty
        return t.cast(pa.schema([("event_id", pa.int64()),
                                 ("user_id", pa.int64()),
                                 ("late_by_us", pa.int64())]))

    return partitioned_map_groups(ds, "user_id", late)


def q9_product_profit(sf_dir: str, name_like: str = "widget"):
    """Product-type profit by nation and year (TPC-H Q9 shape). The
    schema has no partsupp, so supply cost is the documented stand-in
    10% of p_retailprice per unit: profit = extprice*(1-disc) -
    0.1*p_retailprice*qty, exact in integer 1e-4 units.

    Scale shape (the Q8 pattern): the part-name filter and supplier
    nation ride broadcasts into the fact scan; the only big-big join
    (lineitem x orders for the year) is ONE copartitioned exchange
    carrying (orderkey, nationkey, profit_e4) — then a tiny grouped
    Sum."""
    import ray.data as rd
    from ray.data.aggregate import Sum

    part = read(sf_dir, "part", columns=["p_partkey", "p_retailprice"],
                filter=pc.match_substring(pc.field("p_name"), name_like))

    def cents(t: pa.Table) -> pa.Table:
        return pa.table({"p_partkey": t.column("p_partkey"),
                         "retail_cents": _cents(t.column("p_retailprice"))})

    part_ref = broadcast_lookup(
        part.map_batches(cents, batch_format="pyarrow"),
        "p_partkey", ["retail_cents"])
    supp_ref = broadcast_lookup(
        read(sf_dir, "supplier", columns=["s_suppkey", "s_nationkey"]),
        "s_suppkey", ["s_nationkey"])
    nation_names = {r["n_nationkey"]: r["n_name"]
                    for r in dim_rows(sf_dir, "nation",
                                      columns=["n_nationkey", "n_name"])
                    .to_pylist()}

    li = read(sf_dir, "lineitem",
              columns=["l_orderkey", "l_partkey", "l_suppkey",
                       "l_quantity", "l_extendedprice", "l_discount"])
    orders = read(sf_dir, "orders", columns=["o_orderkey", "o_orderdate"])

    def prep_li(t: pa.Table) -> pa.Table:
        t = BroadcastJoin(part_ref, "l_partkey", ["retail_cents"])(t)
        t = BroadcastJoin(supp_ref, "l_suppkey", ["s_nationkey"])(t)
        rev = pc.round(
            pc.multiply(pc.multiply(
                t.column("l_extendedprice"),
                pc.subtract(pa.scalar(1.0), t.column("l_discount"))),
                pa.scalar(10000.0)),
            0, round_mode="half_towards_infinity").cast(pa.int64())
        qty = pc.round(t.column("l_quantity"), 0,
                       round_mode="half_towards_infinity").cast(pa.int64())
        cost = pc.multiply(pc.multiply(t.column("retail_cents"), qty),
                           pa.scalar(10, pa.int64()))
        return pa.table({"k": t.column("l_orderkey"),
                         "a": t.column("s_nationkey").cast(pa.int64()),
                         "b": pc.subtract(rev, cost)})

    def prep_orders(t: pa.Table) -> pa.Table:
        return pa.table({
            "k": t.column("o_orderkey"),
            "a": pc.year(t.column("o_orderdate")).cast(pa.int64()),
            "b": pa.nulls(t.num_rows, pa.int64())})

    def per_part(parts: list[pa.Table]) -> pa.Table:
        import polars as pl

        li_p, ord_p = parts
        if li_p.num_rows == 0 or ord_p.num_rows == 0:
            return pa.table({"nkey": pa.array([], pa.int64()),
                             "o_year": pa.array([], pa.int64()),
                             "profit_e4": pa.array([], pa.int64())})
        left = pl.from_arrow(li_p).rename({"a": "nkey", "b": "e4"})
        right = (pl.from_arrow(ord_p.select(["k", "a"]))
                 .rename({"a": "o_year"}))
        j = left.join(right, on="k", how="inner")
        out = (j.group_by(["nkey", "o_year"])
               .agg(pl.col("e4").sum().alias("profit_e4")))
        return out.to_arrow().cast(pa.schema([
            ("nkey", pa.int64()), ("o_year", pa.int64()),
            ("profit_e4", pa.int64())]))

    agg = copartitioned_map([(li, prep_li), (orders, prep_orders)],
                            "k", per_part) \
        .groupby(["nkey", "o_year"]) \
        .aggregate(Sum("profit_e4", alias_name="profit_e4"))

    def fin(t: pa.Table) -> pa.Table:
        names = pa.array([nation_names[k]
                          for k in t.column("nkey").to_pylist()],
                         pa.string())
        profit = round_ha(pc.divide(
            t.column("profit_e4").cast(pa.float64()),
            pa.scalar(10000.0)), 2)
        return pa.table({"nation": names, "o_year": t.column("o_year"),
                         "profit": profit})

    return agg.map_batches(fin, batch_format="pyarrow") \
        .sort(["nation", "o_year"], descending=[False, True])


def q16_supplier_variety(sf_dir: str,
                         sizes: tuple = (1, 4, 9, 14, 19, 24, 29)):
    """Distinct suppliers per part attribute triple (TPC-H Q16 shape):
    the part-supplier relationship comes from the lineitem link (no
    partsupp in this schema); brand/type/size exclusions ride the
    broadcast part filter, the 'complaint supplier' exclusion is the
    deterministic stand-in suppkey % 10 == 7.

    Scale shape: in-batch DISTINCT (brand, type, size, suppkey)
    collapse, one grouped pair-distinct exchange, then a tiny Count —
    the exact grouped COUNT(DISTINCT) pattern."""
    from ray.data.aggregate import Count

    part = read(sf_dir, "part",
                columns=["p_partkey", "p_brand", "p_type", "p_size"],
                filter=((pc.field("p_brand") != "Brand#13")
                        & (pc.field("p_type") != "PROMO")
                        & pc.field("p_size").isin(list(sizes))))
    part_ref = broadcast_lookup(part, "p_partkey",
                                ["p_brand", "p_type", "p_size"])

    def pairs(t: pa.Table) -> pa.Table:
        keep = pc.not_equal(
            pc.subtract(t.column("l_suppkey"),
                        pc.multiply(pc.divide(t.column("l_suppkey"),
                                              pa.scalar(10)),
                                    pa.scalar(10))),
            pa.scalar(7))
        t = t.filter(keep)
        t = BroadcastJoin(part_ref, "l_partkey",
                          ["p_brand", "p_type", "p_size"])(t)
        return t.select(["p_brand", "p_type", "p_size", "l_suppkey"]) \
            .group_by(["p_brand", "p_type", "p_size", "l_suppkey"]) \
            .aggregate([])

    distinct = read(sf_dir, "lineitem",
                    columns=["l_partkey", "l_suppkey"]) \
        .map_batches(pairs, batch_format="pyarrow", zero_copy_batch=True) \
        .groupby(["p_brand", "p_type", "p_size", "l_suppkey"]) \
        .aggregate(Count(alias_name="_n"))
    agg = distinct.select_columns(["p_brand", "p_type", "p_size"]) \
        .groupby(["p_brand", "p_type", "p_size"]) \
        .aggregate(Count(alias_name="supplier_cnt"))
    return agg.sort(["supplier_cnt", "p_brand", "p_type", "p_size"],
                    descending=[True, False, False, False])


def q20_excess_shipments(sf_dir: str, name_like: str = "widget",
                         qty_threshold: float = 300.0):
    """Suppliers who shipped an outsized quantity of the name-filtered
    parts during 1995 (TPC-H Q20 shape: grouped HAVING subquery,
    semi-joined back to the supplier dimension; the nation filter is
    dropped — this synth corpus has ~3 suppliers per nation, which
    would make the predicate vacuous — and documented so).

    Scale shape: date predicate pushed into the parquet read, widget
    partkeys broadcast as a semi filter, one bounded grouped Sum by
    suppkey, qualifying keys broadcast back into the supplier scan."""
    import datetime as _dt

    import pyarrow.dataset as pads
    import ray.data as rd
    from ray.data.aggregate import Sum

    part = read(sf_dir, "part", columns=["p_partkey"],
                filter=pc.match_substring(pc.field("p_name"), name_like))
    part_ref = broadcast_lookup(part, "p_partkey", [])
    li = rd.read_parquet(
        f"{sf_dir}/lineitem.parquet",
        columns=["l_partkey", "l_suppkey", "l_quantity"],
        filter=((pads.field("l_shipdate") >= _dt.datetime(1995, 1, 1))
                & (pads.field("l_shipdate") < _dt.datetime(1996, 1, 1))))

    def prep(t: pa.Table) -> pa.Table:
        t = BroadcastJoin(part_ref, "l_partkey", [])(t)
        return pa.table({"l_suppkey": t.column("l_suppkey"),
                         "qty_cents": _cents(t.column("l_quantity"))})

    per_supp = li.map_batches(prep, batch_format="pyarrow",
                              zero_copy_batch=True) \
        .groupby("l_suppkey").aggregate(Sum("qty_cents",
                                            alias_name="qty_cents"))
    thresh = int(round(qty_threshold * 100))
    winners = sorted(
        r["l_suppkey"]
        for b in per_supp.iter_batches(batch_format="pyarrow")
        for r in b.to_pylist() if r["qty_cents"] > thresh)
    supp = read(sf_dir, "supplier", columns=["s_suppkey", "s_name"],
                filter=pc.field("s_suppkey").isin(winners))
    return supp.select_columns(["s_name"]).sort("s_name")


def q11_important_parts(sf_dir: str, nation: str = "NATION_3",
                        fraction: float = 0.001):
    """Parts carrying an outsized share of one nation's sales value
    (TPC-H Q11 shape: grouped value vs a global-scalar-subquery
    threshold; partsupp value becomes lineitem revenue of the nation's
    suppliers).

    Scale shape: the nation's supplier keys broadcast as a semi filter
    on the fact scan, per-batch (partkey, e4) partials into a bounded
    grouped Sum (|part| rows), and the global total folds from that
    same grouped result — no second corpus pass."""
    from ray.data.aggregate import Sum

    nkey = dim_rows(sf_dir, "nation", columns=["n_nationkey", "n_name"],
                    filter=pc.field("n_name") == nation) \
        .column("n_nationkey")[0].as_py()
    supp = read(sf_dir, "supplier", columns=["s_suppkey"],
                filter=pc.field("s_nationkey") == nkey)
    supp_ref = broadcast_lookup(supp, "s_suppkey", [])
    li = read(sf_dir, "lineitem",
              columns=["l_partkey", "l_suppkey", "l_extendedprice",
                       "l_discount"])

    def prep(t: pa.Table) -> pa.Table:
        t = BroadcastJoin(supp_ref, "l_suppkey", [])(t)
        e4 = pc.round(
            pc.multiply(pc.multiply(
                t.column("l_extendedprice"),
                pc.subtract(pa.scalar(1.0), t.column("l_discount"))),
                pa.scalar(10000.0)),
            0, round_mode="half_towards_infinity").cast(pa.int64())
        g = pa.table({"l_partkey": t.column("l_partkey"), "e4": e4}) \
            .group_by("l_partkey").aggregate([("e4", "sum")])
        return pa.table({"l_partkey": g.column("l_partkey"),
                         "e4": g.column("e4_sum")})

    per_part = li.map_batches(prep, batch_format="pyarrow",
                              zero_copy_batch=True) \
        .repartition(_default_parts()) \
        .groupby("l_partkey").aggregate(Sum("e4", alias_name="val_e4")) \
        .materialize()  # consumed twice: total fold + threshold filter
    total = 0
    for b in per_part.iter_batches(batch_format="pyarrow"):
        total += pc.sum(b.column("val_e4")).as_py() or 0
    cut = total * fraction

    def fin(t: pa.Table) -> pa.Table:
        t = t.filter(pc.greater(t.column("val_e4").cast(pa.float64()),
                                pa.scalar(float(cut))))
        return pa.table({
            "p_partkey": t.column("l_partkey"),
            "part_value": round_ha(pc.divide(
                t.column("val_e4").cast(pa.float64()),
                pa.scalar(10000.0)), 2)})

    return per_part.map_batches(fin, batch_format="pyarrow") \
        .sort(["part_value", "p_partkey"], descending=[True, False])


def customer_spend_trend(sf_dir: str):
    """Distributed grouped linear regression (SQL regr_slope shape):
    per-customer OLS slope of order value (exact cents) against order
    date (days since 1992-01-01) — the spend-trend feature a
    training-data curriculum or churn model would consume. All five
    sufficient statistics (n, Sx, Sy, Sxx, Sxy) are EXACT int64
    partial sums folded per batch (order-independent, partitioning-
    invariant; magnitudes bounded by days<=~2.5k and cents<=5e7, far
    inside int64), one bounded customer-keyed exchange, then the
    closed-form slope evaluated in the oracle's exact expression
    order. Output: (custkey, n, slope_per_day) for customers with
    >= 2 orders and nonzero x-variance. Oracled (same sums + formula,
    round_ha 6)."""
    ds = read(sf_dir, "orders",
              columns=["o_custkey", "o_orderdate", "o_totalprice"])
    day0 = np.datetime64("1992-01-01", "D").astype(np.int64)

    def partial(t: pa.Table) -> pa.Table:
        x = (t.column("o_orderdate").to_numpy()
             .astype("datetime64[D]").astype(np.int64) - day0)
        y = pc.round(pc.multiply(t.column("o_totalprice"),
                                 pa.scalar(100.0)),
                     0, round_mode="half_towards_infinity") \
            .cast(pa.int64()).to_numpy()
        k = t.column("o_custkey").to_numpy()
        uk, inv = np.unique(k, return_inverse=True)
        out = {"custkey": pa.array(uk, pa.int64()),
               "n": pa.array(np.bincount(inv).astype(np.int64),
                             pa.int64())}
        for name, w in (("sx", x), ("sy", y), ("sxx", x * x),
                        ("sxy", x * y)):
            out[name] = pa.array(
                np.bincount(inv, weights=w.astype(np.float64))
                .astype(np.int64), pa.int64())
        return pa.table(out)

    def fold(part: pa.Table) -> pa.Table:
        if part.num_rows == 0:
            return pa.table({"custkey": pa.array([], pa.int64()),
                             "n": pa.array([], pa.int64()),
                             "slope_per_day": pa.array([], pa.float64())})
        k = part.column("custkey").to_numpy()
        order = np.argsort(k, kind="stable")
        k_s = k[order]
        bounds = np.flatnonzero(np.diff(k_s)) + 1
        starts = np.concatenate(([0], bounds))
        sums = {}
        for c in ("n", "sx", "sy", "sxx", "sxy"):
            v = part.column(c).to_numpy()[order]
            sums[c] = np.add.reduceat(v, starts)
        n, sx, sy = sums["n"], sums["sx"], sums["sy"]
        sxx, sxy = sums["sxx"], sums["sxy"]
        den = n * sxx - sx * sx
        keep = (n >= 2) & (den > 0)
        num = (n * sxy - sx * sy).astype(np.float64)
        slope = round_ha(num[keep] / den[keep].astype(np.float64)
                         / 100.0, 6)
        return pa.table({
            "custkey": pa.array(k_s[starts][keep], pa.int64()),
            "n": pa.array(n[keep], pa.int64()),
            "slope_per_day": pa.array(slope, pa.float64())})

    return partitioned_map_groups(
        ds.map_batches(partial, batch_format="pyarrow",
                       zero_copy_batch=True), "custkey", fold)


def events_active_users_7d(sf_dir: str, window_days: int = 7):
    """Sliding-window DISTINCT aggregate: for every day of the corpus
    span, the number of users with at least one event in the trailing
    ``window_days``-day window (the WAU/MAU shape). Counting distinct
    per day would pay the window's overlap factor; instead each active
    (user, day) pair contributes a coverage interval [day, day+W-1] to
    the days it keeps the user "active", intervals are unioned PER USER
    (one bounded hash co-location, vectorized segment merge — never a
    per-user Python loop), and the union emits +1/-1 boundary deltas
    whose grouped sum + prefix scan over the dense day axis is the
    answer. Exchange volume is bounded by distinct (user, day) pairs
    (<= events), the delta exchange by 2x the merged interval count,
    and the driver holds only the day-span-sized axis."""
    import ray.data as rd
    from ray.data.aggregate import Sum

    day_us = 86_400_000_000
    w = window_days

    ds = read(sf_dir, "events", columns=["ts", "user_id"])

    def pairs(t: pa.Table) -> pa.Table:
        d = pc.floor_temporal(t.column("ts"), unit="day") \
            .cast(pa.timestamp("us")).cast(pa.int64())
        day = pc.divide(d, pa.scalar(day_us, pa.int64()))
        g = pa.table({"user_id": t.column("user_id"), "day": day}) \
            .group_by(["user_id", "day"]).aggregate([])
        return g

    def fold(part: pa.Table) -> pa.Table:
        if part.num_rows == 0:
            return pa.table({"day": pa.array([], pa.int64()),
                             "delta": pa.array([], pa.int64())})
        uid = part.column("user_id").to_numpy()
        day = part.column("day").to_numpy()
        order = np.lexsort((day, uid))
        uid, day = uid[order], day[order]
        # drop (user, day) dups that survived cross-batch
        keep = np.ones(len(uid), bool)
        keep[1:] = (uid[1:] != uid[:-1]) | (day[1:] != day[:-1])
        uid, day = uid[keep], day[keep]
        # coverage interval of pair (u, t) is [t, t+w-1]; with days
        # sorted per user, interval ends are monotone, so a new merged
        # interval starts exactly when the gap exceeds the window
        brk = np.ones(len(uid), bool)
        brk[1:] = (uid[1:] != uid[:-1]) | (day[1:] > day[:-1] + w)
        starts = np.flatnonzero(brk)
        ends = np.append(starts[1:], len(uid)) - 1
        lo = day[starts]                  # first covered day
        hi = day[ends] + w                # one past the last covered day
        return pa.table({
            "day": pa.array(np.concatenate([lo, hi]), pa.int64()),
            "delta": pa.array(np.concatenate([
                np.ones(len(lo), np.int64),
                -np.ones(len(hi), np.int64)]), pa.int64())})

    deltas = partitioned_map_groups(
        ds.map_batches(pairs, batch_format="pyarrow",
                       zero_copy_batch=True), "user_id", fold) \
        .groupby("day").aggregate(Sum("delta", alias_name="delta")) \
        .materialize()  # bounded by the day span x users' interval count

    tbls = [b for b in deltas.iter_batches(batch_format="pyarrow")
            if b.num_rows]
    if not tbls:
        return rd.from_arrow(pa.table({
            "day": pa.array([], pa.timestamp("us")),
            "wau": pa.array([], pa.int64())}))
    obs = pa.concat_tables(tbls)
    dd = obs.column("day").to_numpy()
    dv = obs.column("delta").to_numpy()
    order = np.argsort(dd, kind="stable")
    dd, dv = dd[order], np.cumsum(dv[order])
    # output spine = observed event-day span (delta days beyond the max
    # event day are genuine coverage but outside the reporting span)
    axis = np.arange(dd.min(), dd.max() - w + 1)
    at = np.searchsorted(dd, axis, side="right") - 1
    wau = np.where(at >= 0, dv[np.clip(at, 0, None)], 0)
    return rd.from_arrow(pa.table({
        "day": pa.array(axis * day_us, pa.int64()).cast(pa.timestamp("us")),
        "wau": pa.array(wau, pa.int64())}))


def events_concurrency_15m(sf_dir: str, window_min: int = 15):
    """Time-RANGE sliding aggregate: per minute of the corpus span, the
    event count in the trailing 15-minute window (the "concurrent load"
    shape — a RANGE window, not the ROWS window of events_moving_avg).
    One no-exchange pass folds per-batch (minute, n) partials, a tiny
    span-bounded grouped sum lands them on the driver, and the sliding
    sum is a prefix-difference over the dense minute axis — the window
    never re-reads events."""
    import ray.data as rd
    from ray.data.aggregate import Sum

    minute_us = 60_000_000

    ds = read(sf_dir, "events", columns=["ts"])

    def partial(t: pa.Table) -> pa.Table:
        m = pc.floor_temporal(t.column("ts"), unit="minute") \
            .cast(pa.timestamp("us")).cast(pa.int64())
        g = pa.table({"minute": m,
                      "n": pa.array(np.ones(t.num_rows, np.int64))}) \
            .group_by("minute").aggregate([("n", "sum")])
        return pa.table({"minute": g.column("minute"),
                         "n": g.column("n_sum").cast(pa.int64())})

    agg = ds.map_batches(partial, batch_format="pyarrow",
                         zero_copy_batch=True) \
        .groupby("minute").aggregate(Sum("n", alias_name="n")) \
        .materialize()  # bounded by the minute span

    tbls = [b for b in agg.iter_batches(batch_format="pyarrow")
            if b.num_rows]
    if not tbls:
        return rd.from_arrow(pa.table({
            "minute": pa.array([], pa.timestamp("us")),
            "n_window": pa.array([], pa.int64())}))
    obs = pa.concat_tables(tbls)
    mins = obs.column("minute").to_numpy()
    axis = np.arange(mins.min(), mins.max() + minute_us, minute_us)
    idx = pc.index_in(pa.array(axis, pa.int64()),
                      value_set=obs.column("minute").combine_chunks())
    dense = pc.fill_null(
        pc.take(obs.column("n").combine_chunks(), idx), 0).to_numpy()
    csum = np.concatenate(([0], np.cumsum(dense)))
    lo = np.clip(np.arange(len(dense)) - window_min + 1, 0, None)
    n_win = csum[np.arange(1, len(dense) + 1)] - csum[lo]
    return rd.from_arrow(pa.table({
        "minute": pa.array(axis, pa.int64()).cast(pa.timestamp("us")),
        "n_window": pa.array(n_win.astype(np.int64), pa.int64())}))


def _cdc_event_stream(sf_dir: str):
    """The deterministic (key, seq, del_, payload) changelog-event
    union shared by docs_cdc_merge / docs_scd2 / docs_time_travel:
    base = docs with doc_id % 3 != 0 (seq -1); changelog = even
    doc_ids folded 2-per-key under key = doc_id // 4, seq = doc_id,
    and op = delete iff doc_id % 3 == 1. Both oracles replay the same
    derivation in SQL."""
    base = read(sf_dir, "documents", columns=["doc_id", "n_chars"])
    chg = read(sf_dir, "documents", columns=["doc_id", "n_chars"])

    def prep_base(t: pa.Table) -> pa.Table:
        did = t.column("doc_id").to_numpy()
        t = t.filter(pa.array(did % 3 != 0))
        n = t.num_rows
        return pa.table({
            "key": t.column("doc_id"),
            "seq": pa.array(np.full(n, -1, np.int64)),
            "del_": pa.array(np.zeros(n, bool)),
            "payload": t.column("n_chars").cast(pa.int64())})

    def prep_chg(t: pa.Table) -> pa.Table:
        did = t.column("doc_id").to_numpy()
        t = t.filter(pa.array(did % 2 == 0))
        did = t.column("doc_id").to_numpy()
        return pa.table({
            "key": pa.array(did // 4, pa.int64()),
            "seq": pa.array(did, pa.int64()),
            "del_": pa.array(did % 3 == 1),
            "payload": pc.add(t.column("n_chars").cast(pa.int64()),
                              pa.scalar(1_000_000, pa.int64()))})

    return base.map_batches(prep_base, batch_format="pyarrow",
                            zero_copy_batch=True) \
        .union(chg.map_batches(prep_chg, batch_format="pyarrow",
                               zero_copy_batch=True))


def _cdc_winner_fold(part: pa.Table) -> pa.Table:
    """Latest-seq-wins MERGE fold over one key partition: a winning
    delete drops the key; src tags base (seq < 0) vs changelog rows."""
    if part.num_rows == 0:
        return pa.table({"key": pa.array([], pa.int64()),
                         "payload": pa.array([], pa.int64()),
                         "src": pa.array([], pa.string())})
    k = part.column("key").to_numpy()
    s = part.column("seq").to_numpy()
    order = np.lexsort((-s, k))     # per key: highest seq first
    k_s = k[order]
    first = np.ones(len(k_s), bool)
    first[1:] = k_s[1:] != k_s[:-1]
    win = part.take(pa.array(order[first]))
    keep = pc.invert(win.column("del_"))
    win = win.filter(keep)
    src = pc.if_else(pc.less(win.column("seq"), pa.scalar(0, pa.int64())),
                     pa.scalar("base"), pa.scalar("changelog"))
    return pa.table({"key": win.column("key"),
                     "payload": win.column("payload"),
                     "src": src})


def docs_cdc_merge(sf_dir: str):
    """Changelog upsert/delete merge (the lakehouse MERGE INTO shape):
    apply a keyed, sequence-ordered changelog of upserts and deletes to
    a base snapshot — latest sequence per key wins, a winning delete
    drops the key, changelog-only keys are inserts. Derivation in
    ``_cdc_event_stream``: k % 3 == 1 keys see an early delete
    OVERRIDDEN by a later upsert (reinsert), k % 3 == 2 keys are
    dropped by a winning delete, and k % 3 == 0 keys double-upsert.
    One slim union + one keyed hash co-location; the per-partition
    winner fold is a vectorized lexsort + segment-first."""
    return partitioned_map_groups(_cdc_event_stream(sf_dir), "key",
                                  _cdc_winner_fold)


SCD2_OPEN_END = (1 << 63) - 1   # "valid forever" sentinel (no nulls:
#                                 both engines hash int64, never NaN)


def docs_scd2(sf_dir: str):
    """Slowly-changing-dimension Type-2 build over the same changelog:
    each surviving upsert becomes a VERSION row carrying its validity
    interval [valid_from, valid_to) — valid_from is the upsert's seq,
    valid_to the NEXT event's seq for that key (an overriding upsert
    or the delete that retires it), and the int64-max sentinel for the
    open current version (is_current). Deletes emit no version of
    their own; they only close the prior one. One keyed co-location;
    the per-partition fold is a lexsort + within-key shift — the
    vectorized form of SQL's LEAD(seq) OVER (PARTITION BY key ORDER BY
    seq). At 100 TB the exchange carries only the slim (key, seq,
    del_, payload) events, bounded by the changelog, never the table
    history re-materialized per version."""
    def fold(part: pa.Table) -> pa.Table:
        if part.num_rows == 0:
            return pa.table({
                "key": pa.array([], pa.int64()),
                "payload": pa.array([], pa.int64()),
                "valid_from": pa.array([], pa.int64()),
                "valid_to": pa.array([], pa.int64()),
                "is_current": pa.array([], pa.bool_())})
        k = part.column("key").to_numpy()
        s = part.column("seq").to_numpy()
        order = np.lexsort((s, k))      # per key: ascending seq
        k_s, s_s = k[order], s[order]
        n = len(k_s)
        last = np.ones(n, bool)
        last[:-1] = k_s[1:] != k_s[:-1]
        nxt = np.empty(n, np.int64)
        nxt[:-1] = s_s[1:]
        nxt[last] = SCD2_OPEN_END
        srt = part.take(pa.array(order))
        ups = pc.invert(srt.column("del_")).to_numpy(zero_copy_only=False)
        return pa.table({
            "key": pa.array(k_s[ups], pa.int64()),
            "payload": srt.filter(pa.array(ups)).column("payload"),
            "valid_from": pa.array(s_s[ups], pa.int64()),
            "valid_to": pa.array(nxt[ups], pa.int64()),
            "is_current": pa.array(nxt[ups] == SCD2_OPEN_END)})

    return partitioned_map_groups(_cdc_event_stream(sf_dir), "key", fold)


def docs_time_travel(sf_dir: str):
    """Snapshot-isolation time travel (the lakehouse AS OF shape):
    reconstruct the merged table as it stood at sequence
    asof = max(doc_id) // 2 — i.e. replay only changelog events with
    seq <= asof over the base snapshot, latest-within-horizon wins.
    The cutoff derives from the data (one pruned max fold) so the
    oracle computes the identical constant; the merge itself reuses
    the MERGE INTO winner fold on the pre-filtered event stream, so
    time travel costs exactly one extra scalar pass over cdc_merge."""
    asof = int(read(sf_dir, "documents", columns=["doc_id"])
               .max("doc_id")) // 2
    u = _cdc_event_stream(sf_dir)

    def cut(t: pa.Table) -> pa.Table:
        return t.filter(pc.less_equal(t.column("seq"),
                                      pa.scalar(asof, pa.int64())))

    return partitioned_map_groups(
        u.map_batches(cut, batch_format="pyarrow", zero_copy_batch=True),
        "key", _cdc_winner_fold)


def _skyline_fold(t: pa.Table) -> pa.Table:
    """One vectorized 2-D skyline pass (minimize l_extendedprice,
    maximize l_discount; weak dominance, so coincident points all
    survive): lexsort by (price asc, disc desc), per-price-level max
    is the level's first element, a running prefix max over strictly
    cheaper levels gives the staircase, and a row survives iff it
    matches its level max AND strictly beats every cheaper level."""
    if t.num_rows == 0:
        return t
    p = t.column("l_extendedprice").to_numpy()
    d = t.column("l_discount").to_numpy()
    order = np.lexsort((-d, p))
    ps, ds_ = p[order], d[order]
    new = np.ones(len(ps), bool)
    new[1:] = ps[1:] != ps[:-1]
    lvl = np.cumsum(new) - 1
    level_max = ds_[np.flatnonzero(new)]   # desc within level: first=max
    prefix = np.empty(len(level_max))
    prefix[0] = -np.inf
    if len(level_max) > 1:
        prefix[1:] = np.maximum.accumulate(level_max)[:-1]
    keep_sorted = (ds_ == level_max[lvl]) & (ds_ > prefix[lvl])
    keep = np.zeros(len(p), bool)
    keep[order] = keep_sorted
    return t.filter(pa.array(keep))


def lineitem_skyline(sf_dir: str):
    """Skyline / Pareto-frontier query: line items not dominated on
    (cheaper-or-equal price, higher-or-equal discount, strict in one).
    Exactly distributive: a global skyline point is undominated within
    its own block too, so skyline(S) = skyline(union of per-block
    skylines) — each block emits only its local frontier (staircase-
    sized, bounded by the distinct discount levels) and ONE tiny final
    fold over the union finishes; the full fact table never moves.
    The oracle states the declarative NOT-EXISTS dominance; the SQL
    window restatement (strictly-cheaper running max via RANGE ...
    EXCLUDE GROUP) is equivalence-pinned against it in tests."""
    ds = read(sf_dir, "lineitem",
              columns=["l_orderkey", "l_linenumber",
                       "l_extendedprice", "l_discount"])
    local = ds.map_batches(_skyline_fold, batch_format="pyarrow",
                           zero_copy_batch=True)

    def tag(t: pa.Table) -> pa.Table:
        return t.append_column(
            "_sk", pa.array(np.zeros(t.num_rows, np.int64)))

    def final(part: pa.Table) -> pa.Table:
        part = part.drop_columns(["_sk"])
        if part.num_rows == 0:
            return pa.table({
                "l_orderkey": pa.array([], pa.int64()),
                "l_linenumber": pa.array([], pa.int32()),
                "l_extendedprice": pa.array([], pa.float64()),
                "l_discount": pa.array([], pa.float64())})
        return _skyline_fold(part)

    return partitioned_map_groups(
        local.map_batches(tag, batch_format="pyarrow",
                          zero_copy_batch=True),
        "_sk", final, num_parts=1)


WINSOR_COLOCATE_MAX_GROUP = 50_000_000  # rows; above this a group's
# order statistics come from dist_select instead of co-located sorts


def events_winsorized(sf_dir: str, q_lo: int = 1, q_hi: int = 9,
                      q_den: int = 10, plan: str = "auto"):
    """Grouped winsorization: every event's value clamped to its
    type's [p10, p90] DISCRETE percentiles (quantile_disc semantics:
    sorted[max(ceil(q*n)-1, 0)], computed with integer index
    arithmetic -(-n*q // den) - 1 so no float ceil can straddle a
    boundary). Two-pass map-side plan: one type-keyed co-location
    computes each group's exact order statistics (the documented
    per-group-fits-a-partition assumption all map_groups ops share —
    salt-and-merge does NOT apply to exact quantiles, at true scale
    swap in the distributed selection pass), then the tiny
    (type, lo, hi) table broadcasts and rows clamp in place — the fact
    table is touched once per pass and never re-keyed. Clamping copies
    stored doubles without arithmetic, so output values hash-exactly
    against the oracle."""
    import ray

    from ..broadcast import get_broadcast

    ev = read(sf_dir, "events", columns=["event_id", "event_type",
                                         "value"])

    if plan != "colocate":
        slim = ev.select_columns(["event_type", "value"])
        stats = dist_group_stats(slim)
        if plan == "select" or (plan == "auto" and stats and max(
                s[0] for s in stats.values()) > WINSOR_COLOCATE_MAX_GROUP):
            # over-gate path: the bounds come from distributed
            # selection (identical quantile_disc index arithmetic);
            # the clamp stage below is shared verbatim
            import ray

            targets, metas = [], []
            for ty, (n, lo, hi) in sorted(stats.items()):
                ilo = max(-(-n * q_lo // q_den) - 1, 0)
                ihi = max(-(-n * q_hi // q_den) - 1, 0)
                targets.append([ty, ilo, lo, hi + 1])
                targets.append([ty, ihi, lo, hi + 1])
                metas.append(ty)
            resolved = dist_select(slim, targets)
            karr = np.array(metas)
            lo_a = _f64_from_sortkey(np.array(
                [resolved[2 * i] for i in range(len(metas))], np.int64))
            hi_a = _f64_from_sortkey(np.array(
                [resolved[2 * i + 1] for i in range(len(metas))],
                np.int64))
            ref = ray.put((karr, lo_a, hi_a))

            def clamp_sel(t: pa.Table, _ref=ref) -> pa.Table:
                from ..broadcast import get_broadcast

                ka, lo, hi = get_broadcast(_ref)
                typ = t.column("event_type").to_numpy(
                    zero_copy_only=False)
                idx = np.searchsorted(ka, typ)
                v = t.column("value").to_numpy()
                w = np.clip(v, lo[idx], hi[idx])
                return pa.table({"event_id": t.column("event_id"),
                                 "event_type": t.column("event_type"),
                                 "value_w": pa.array(w, pa.float64())})

            return ev.map_batches(clamp_sel, batch_format="pyarrow",
                                  zero_copy_batch=True)

    def qfold(part: pa.Table) -> pa.Table:
        if part.num_rows == 0:
            return pa.table({"event_type": pa.array([], pa.string()),
                             "lo": pa.array([], pa.float64()),
                             "hi": pa.array([], pa.float64())})
        enc = part.column("event_type")
        if isinstance(enc, pa.ChunkedArray):
            enc = enc.combine_chunks()
        d = enc.dictionary_encode()
        if isinstance(d, pa.ChunkedArray):
            d = d.combine_chunks()
        codes = d.indices.to_numpy(zero_copy_only=False).astype(np.int64)
        v = part.column("value").to_numpy()
        order = np.lexsort((v, codes))
        c_s, v_s = codes[order], v[order]
        bounds = np.flatnonzero(np.diff(c_s)) + 1
        starts = np.concatenate(([0], bounds))
        ends = np.concatenate((bounds, [c_s.size]))
        n = ends - starts
        ilo = np.maximum(-(-n * q_lo // q_den) - 1, 0)
        ihi = np.maximum(-(-n * q_hi // q_den) - 1, 0)
        types = d.dictionary.take(pa.array(c_s[starts]))
        return pa.table({"event_type": types.cast(pa.string()),
                         "lo": pa.array(v_s[starts + ilo], pa.float64()),
                         "hi": pa.array(v_s[starts + ihi], pa.float64())})

    bt = partitioned_map_groups(
        ev.select_columns(["event_type", "value"]), "event_type", qfold)
    keys, los, his = [], [], []
    for b in bt.iter_batches(batch_format="pyarrow"):  # |types|-bounded
        keys += b.column("event_type").to_pylist()
        los += b.column("lo").to_pylist()
        his += b.column("hi").to_pylist()
    order = np.argsort(np.array(keys))
    karr = np.array(keys)[order]
    lo_a = np.array(los)[order]
    hi_a = np.array(his)[order]
    ref = ray.put((karr, lo_a, hi_a))

    def clamp(t: pa.Table, _ref=ref) -> pa.Table:
        ka, lo, hi = get_broadcast(_ref)
        typ = t.column("event_type").to_numpy(zero_copy_only=False)
        idx = np.searchsorted(ka, typ)
        v = t.column("value").to_numpy()
        w = np.clip(v, lo[idx], hi[idx])
        return pa.table({"event_id": t.column("event_id"),
                         "event_type": t.column("event_type"),
                         "value_w": pa.array(w, pa.float64())})

    return ev.map_batches(clamp, batch_format="pyarrow",
                          zero_copy_batch=True)


def events_temporal_join(sf_dir: str, key_mod: int = 500,
                         seq_mod: int = 600):
    """Temporal (AS-OF validity-interval) dimension join — the
    lakehouse shape where every fact row joins the dimension VERSION
    that was valid at its own time: probe (key = user_id % key_mod,
    seq = event_id % seq_mod) against the SCD2 version table, matching
    the unique version with valid_from <= seq < valid_to (versions are
    disjoint per key, so at most one matches; probes landing in a
    deleted gap or on an absent key drop — inner semantics). ONE
    copartitioned exchange co-locates probes and versions by key; the
    per-partition match is fully vectorized: versions lexsorted by
    (key, valid_from) and packed (key << 32 | valid_from + 1), probes
    packed the same way, one searchsorted(side='right') - 1 finds each
    probe's latest candidate version, and two comparisons (key match,
    seq < valid_to) finish — no per-key loop, no interval expansion.
    At 100 TB both sides stream through the single slim exchange; the
    dimension never broadcasts."""
    scd = docs_scd2(sf_dir)
    ev = read(sf_dir, "events", columns=["event_id", "user_id"])

    def prep_probe(t: pa.Table) -> pa.Table:
        eid = t.column("event_id").to_numpy()
        uid = t.column("user_id").to_numpy()
        n = t.num_rows
        return pa.table({
            "key": pa.array(uid % key_mod, pa.int64()),
            "vf": pa.nulls(n, pa.int64()),
            "vt": pa.nulls(n, pa.int64()),
            "pay": pa.nulls(n, pa.int64()),
            "eid": pa.array(eid, pa.int64()),
            "seq": pa.array(eid % seq_mod, pa.int64())})

    def prep_dim(t: pa.Table) -> pa.Table:
        n = t.num_rows
        return pa.table({
            "key": t.column("key"),
            "vf": t.column("valid_from"),
            "vt": t.column("valid_to"),
            "pay": t.column("payload"),
            "eid": pa.nulls(n, pa.int64()),
            "seq": pa.nulls(n, pa.int64())})

    empty = pa.table({"event_id": pa.array([], pa.int64()),
                      "key": pa.array([], pa.int64()),
                      "seq": pa.array([], pa.int64()),
                      "payload": pa.array([], pa.int64())})

    def join_fold(parts):
        probe, dim = parts
        if probe.num_rows == 0 or dim.num_rows == 0:
            return empty
        kd = dim.column("key").to_numpy()
        vf = dim.column("vf").to_numpy(zero_copy_only=False)
        vt = dim.column("vt").to_numpy(zero_copy_only=False)
        pay = dim.column("pay").to_numpy(zero_copy_only=False)
        if kd.size and (kd.max() >= 1 << 31 or vf.max() >= (1 << 32) - 1):
            raise ValueError(
                "key/valid_from exceed the packed (key<<32 | vf+1) "
                "range; widen the pack before joining this domain")
        order = np.lexsort((vf, kd))
        kd_s, vf_s = kd[order], vf[order]
        vt_s, pay_s = vt[order], pay[order]
        pack_d = (kd_s.astype(np.uint64) << np.uint64(32)) \
            | (vf_s + 1).astype(np.uint64)
        kp = probe.column("key").to_numpy()
        sq = probe.column("seq").to_numpy(zero_copy_only=False)
        eid = probe.column("eid").to_numpy(zero_copy_only=False)
        pack_p = (kp.astype(np.uint64) << np.uint64(32)) \
            | (sq + 1).astype(np.uint64)
        idx = np.searchsorted(pack_d, pack_p, side="right") - 1
        safe = np.maximum(idx, 0)
        ok = (idx >= 0) & (kd_s[safe] == kp) & (sq < vt_s[safe])
        return pa.table({
            "event_id": pa.array(eid[ok].astype(np.int64), pa.int64()),
            "key": pa.array(kp[ok], pa.int64()),
            "seq": pa.array(sq[ok].astype(np.int64), pa.int64()),
            "payload": pa.array(pay_s[safe][ok].astype(np.int64),
                                pa.int64())})

    return copartitioned_map([(ev, prep_probe), (scd, prep_dim)],
                             "key", join_fold)


def events_audience_overlap(sf_dir: str):
    """Audience-overlap matrix: for every unordered pair of event
    types, the EXACT number of distinct users who performed both (the
    segment-intersection shape; the sketch twin at extreme user counts
    is HLL + inclusion-exclusion, but |users x types| rows are slim
    enough to fold exactly here). Per-batch distinct (user, type)
    partials -> one user-keyed exchange (bounded by |users| x |types|,
    never events) -> per-user vectorized pair generation (the
    _segment_pairs arithmetic over per-partition dictionary codes) ->
    one |types|^2-bounded pair-keyed sum."""
    ev = read(sf_dir, "events", columns=["user_id", "event_type"])

    def distinct_part(t: pa.Table) -> pa.Table:
        u = t.column("user_id").to_numpy()
        typ = t.column("event_type")
        if isinstance(typ, pa.ChunkedArray):
            typ = typ.combine_chunks()
        d = typ.dictionary_encode()
        if isinstance(d, pa.ChunkedArray):
            d = d.combine_chunks()
        c = d.indices.to_numpy(zero_copy_only=False).astype(np.int64)
        order = np.lexsort((c, u))
        u_s, c_s = u[order], c[order]
        keep = np.ones(u_s.size, bool)
        keep[1:] = (u_s[1:] != u_s[:-1]) | (c_s[1:] != c_s[:-1])
        return pa.table({
            "user_id": pa.array(u_s[keep], pa.int64()),
            "event_type": d.dictionary.take(
                pa.array(c_s[keep])).cast(pa.string())})

    slim = ev.map_batches(distinct_part, batch_format="pyarrow",
                          zero_copy_batch=True)

    def pair_fold(part: pa.Table) -> pa.Table:
        if part.num_rows == 0:
            return pa.table({"type_a": pa.array([], pa.string()),
                             "type_b": pa.array([], pa.string()),
                             "n": pa.array([], pa.int64())})
        u = part.column("user_id").to_numpy()
        typ = part.column("event_type")
        if isinstance(typ, pa.ChunkedArray):
            typ = typ.combine_chunks()
        d = typ.dictionary_encode()
        if isinstance(d, pa.ChunkedArray):
            d = d.combine_chunks()
        # order codes by their STRING value so pairs come out
        # (type_a < type_b) lexicographically like the oracle's join
        dict_np = d.dictionary.to_numpy(zero_copy_only=False)
        rank_of = np.empty(len(dict_np), np.int64)
        rank_of[np.argsort(dict_np)] = np.arange(len(dict_np))
        c = rank_of[d.indices.to_numpy(zero_copy_only=False)
                    .astype(np.int64)]
        order = np.lexsort((c, u))
        u_s, c_s = u[order], c[order]
        keep = np.ones(u_s.size, bool)           # re-dedupe across
        keep[1:] = (u_s[1:] != u_s[:-1]) | (c_s[1:] != c_s[:-1])
        u_s, c_s = u_s[keep], c_s[keep]
        bounds = np.flatnonzero(np.diff(u_s)) + 1
        starts = np.concatenate(([0], bounds))
        ends = np.concatenate((bounds, [u_s.size])) if u_s.size \
            else starts
        ia, ib = _pair_idx(starts, ends)
        if ia.size == 0:
            return pa.table({"type_a": pa.array([], pa.string()),
                             "type_b": pa.array([], pa.string()),
                             "n": pa.array([], pa.int64())})
        pk = c_s[ia] * np.int64(len(dict_np)) + c_s[ib]
        upk, cnt = np.unique(pk, return_counts=True)
        sorted_dict = np.sort(dict_np)
        return pa.table({
            "type_a": pa.array(sorted_dict[upk // len(dict_np)],
                               pa.string()),
            "type_b": pa.array(sorted_dict[upk % len(dict_np)],
                               pa.string()),
            "n": pa.array(cnt.astype(np.int64), pa.int64())})

    per_part = partitioned_map_groups(slim, "user_id", pair_fold)

    def final_sum(part: pa.Table) -> pa.Table:
        if part.num_rows == 0:
            return pa.table({"type_a": pa.array([], pa.string()),
                             "type_b": pa.array([], pa.string()),
                             "n_users": pa.array([], pa.int64())})
        g = part.group_by(["type_a", "type_b"]).aggregate([("n", "sum")])
        return pa.table({"type_a": g.column("type_a"),
                         "type_b": g.column("type_b"),
                         "n_users": g.column("n_sum").cast(pa.int64())})

    return partitioned_map_groups(per_part, "type_a", final_sum)


def _pair_idx(starts: np.ndarray,
              ends: np.ndarray) -> tuple[np.ndarray, np.ndarray]:
    """Index pairs (i < j) inside each [start, end) segment (the
    graph._segment_pairs arithmetic over positions)."""
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


def events_dedup_window(sf_dir: str, window_min: int = 60):
    """Windowed event dedup (the at-most-once-per-hour throttle /
    repeat-suppression shape): an event drops iff the SAME
    (user, type) stream's immediately preceding event — by
    (ts, event_id) order — lies within the past ``window_min``
    minutes. One user-keyed co-location; the per-partition fold is a
    lexsort + one integer-microsecond diff against the shifted
    timestamp (SQL's LAG), so comparisons are exact on both engines.
    The event payload never moves twice: the exchange carries the
    four output columns only."""
    ev = read(sf_dir, "events", columns=["event_id", "user_id",
                                         "event_type", "ts"])
    win_us = np.int64(window_min) * 60_000_000

    def fold(part: pa.Table) -> pa.Table:
        if part.num_rows == 0:
            return pa.table({
                "event_id": pa.array([], pa.int64()),
                "user_id": pa.array([], pa.int64()),
                "event_type": pa.array([], pa.string()),
                "ts": pa.array([], pa.timestamp("us"))})
        u = part.column("user_id").to_numpy()
        eid = part.column("event_id").to_numpy()
        ts = pc.cast(part.column("ts"), pa.timestamp("us")) \
            .to_numpy().view(np.int64)   # unit-pinned: a ns-encoded
        # source would otherwise inflate every gap 1000x
        typ = part.column("event_type")
        if isinstance(typ, pa.ChunkedArray):
            typ = typ.combine_chunks()
        d = typ.dictionary_encode()
        if isinstance(d, pa.ChunkedArray):
            d = d.combine_chunks()
        c = d.indices.to_numpy(zero_copy_only=False).astype(np.int64)
        order = np.lexsort((eid, ts, c, u))
        u_s, c_s, ts_s = u[order], c[order], ts[order]
        same = np.zeros(len(u_s), bool)
        same[1:] = (u_s[1:] == u_s[:-1]) & (c_s[1:] == c_s[:-1])
        close = np.zeros(len(u_s), bool)
        close[1:] = (ts_s[1:] - ts_s[:-1]) <= win_us
        drop = same & close
        keep_idx = order[~drop]
        return part.take(pa.array(np.sort(keep_idx)))

    return partitioned_map_groups(ev, "user_id", fold)


def events_value_ewma(sf_dir: str):
    """Per-user exponentially weighted moving average of event value —
    the sequential stateful-scan shape — in EXACT integer fixed point:
    cents = round(value * 100) (half-away, both engines), then

        s_1 = cents_1;   s_t = floor((cents_t + 3 * s_{t-1}) / 4)

    ordered by (ts, event_id) within user. The divisor is a power of
    two, so the oracle's floor((a)/4.0) is exact IEEE floor division
    and equals numpy's a // 4 INCLUDING negatives (DuckDB's integer //
    truncates toward zero and would diverge there). The floor makes
    the recurrence non-linear, so no parallel prefix scan exists: the
    chain is inherently sequential PER USER, and the parallelism axis
    is across users — one user-keyed co-location, then a per-partition
    ordered scan. Output (event_id, ewma_cents) for every event."""
    ev = read(sf_dir, "events", columns=["event_id", "user_id", "ts",
                                         "value"])

    def fold(part: pa.Table) -> pa.Table:
        if part.num_rows == 0:
            return pa.table({"event_id": pa.array([], pa.int64()),
                             "ewma_cents": pa.array([], pa.int64())})
        u = part.column("user_id").to_numpy()
        eid = part.column("event_id").to_numpy()
        ts = pc.cast(part.column("ts"), pa.timestamp("us")) \
            .to_numpy().view(np.int64)
        cents = _cents(part.column("value")).to_numpy()
        order = np.lexsort((eid, ts, u))
        u_s, e_s, c_s = u[order], eid[order], cents[order]
        s = np.empty(len(u_s), np.int64)
        prev_u = None
        prev_s = 0
        # inherently sequential within user (floor breaks linearity);
        # the loop is per-partition and bounded by that partition's rows
        for i in range(len(u_s)):
            if u_s[i] != prev_u:
                prev_s = c_s[i]
                prev_u = u_s[i]
            else:
                prev_s = (c_s[i] + 3 * prev_s) // 4
            s[i] = prev_s
        return pa.table({"event_id": pa.array(e_s, pa.int64()),
                         "ewma_cents": pa.array(s, pa.int64())})

    return partitioned_map_groups(ev, "user_id", fold)


def events_user_growth(sf_dir: str):
    """Cumulative distinct-user growth curve: per HOUR (the synthetic
    stream spans ~2 days, so hourly keeps the curve real), how many
    users appear for the FIRST time, and the running total (the
    audience-growth dashboard shape). First-occurrence semantics
    reduce distinct-counting to a (user, min_hour) fold — per-batch
    partials, one |users|-bounded user-keyed exchange — then the hour
    axis (span-bounded) folds per-hour counts and one driver-side
    prefix sum finishes; the event stream is scanned once and never
    re-keyed by time."""
    import ray.data as rd

    ev = read(sf_dir, "events", columns=["user_id", "ts"])
    hour_us = np.int64(3_600_000_000)

    def partial(t: pa.Table) -> pa.Table:
        u = t.column("user_id").to_numpy()
        ts = pc.cast(t.column("ts"), pa.timestamp("us")) \
            .to_numpy().view(np.int64)
        d = (ts // hour_us) * hour_us
        order = np.lexsort((d, u))
        u_s, d_s = u[order], d[order]
        keep = np.ones(u_s.size, bool)
        keep[1:] = u_s[1:] != u_s[:-1]     # first = min day per user
        return pa.table({"user_id": pa.array(u_s[keep], pa.int64()),
                         "d": pa.array(d_s[keep], pa.int64())})

    def min_fold(part: pa.Table) -> pa.Table:
        if part.num_rows == 0:
            return pa.table({"d": pa.array([], pa.int64()),
                             "n": pa.array([], pa.int64())})
        u = part.column("user_id").to_numpy()
        d = part.column("d").to_numpy()
        order = np.lexsort((d, u))
        u_s, d_s = u[order], d[order]
        keep = np.ones(u_s.size, bool)
        keep[1:] = u_s[1:] != u_s[:-1]
        days, cnt = np.unique(d_s[keep], return_counts=True)
        return pa.table({"d": pa.array(days, pa.int64()),
                         "n": pa.array(cnt.astype(np.int64), pa.int64())})

    per_part = partitioned_map_groups(
        ev.map_batches(partial, batch_format="pyarrow",
                       zero_copy_batch=True), "user_id", min_fold)

    days_c, n_c = [], []
    for b in per_part.iter_batches(batch_format="pyarrow"):  # day-span
        days_c.append(b.column("d").to_numpy())
        n_c.append(b.column("n").to_numpy())
    if not days_c or not np.concatenate(days_c).size:
        return rd.from_arrow(pa.table({
            "hour": pa.array([], pa.timestamp("us")),
            "new_users": pa.array([], pa.int64()),
            "cum_users": pa.array([], pa.int64())}))
    alld = np.concatenate(days_c)
    alln = np.concatenate(n_c)
    days, inv = np.unique(alld, return_inverse=True)
    tot = np.zeros(days.size, np.int64)
    np.add.at(tot, inv, alln)
    return rd.from_arrow(pa.table({
        "hour": pa.array(days, pa.int64()).cast(pa.timestamp("us")),
        "new_users": pa.array(tot, pa.int64()),
        "cum_users": pa.array(np.cumsum(tot), pa.int64())}))


def lineitem_zorder(sf_dir: str, bits: int = 16):
    """Z-order (Morton) clustering key over (l_partkey, l_suppkey) —
    the lakehouse data-layout optimization: rows sorted by the
    bit-interleaved key cluster BOTH dimensions, so file-level min/max
    statistics prune two-column predicates instead of one. Pure
    per-row integer bit arithmetic (vectorized shifts/masks — no
    exchange at all to COMPUTE the key; the optional re-sort is the
    one range exchange a real re-layout pays). Emits the key plus a
    16-way layout bucket = the key's top 4 bits, with per-bucket
    sizes validating the space-filling property. The oracle replays
    the identical interleave as a generated shift/mask expression."""
    li = read(sf_dir, "lineitem",
              columns=["l_orderkey", "l_linenumber", "l_partkey",
                       "l_suppkey"])
    mask = (1 << bits) - 1

    def z(t: pa.Table) -> pa.Table:
        p = t.column("l_partkey").to_numpy() & mask
        s = t.column("l_suppkey").to_numpy() & mask
        zk = np.zeros(t.num_rows, np.int64)
        for i in range(bits):
            zk |= ((p >> i) & 1) << (2 * i)
            zk |= ((s >> i) & 1) << (2 * i + 1)
        return pa.table({
            "l_orderkey": t.column("l_orderkey"),
            "l_linenumber": t.column("l_linenumber"),
            "zkey": pa.array(zk, pa.int64()),
            "zbucket": pa.array(zk >> (2 * bits - 4), pa.int64())})

    return li.map_batches(z, batch_format="pyarrow",
                          zero_copy_batch=True)


def events_type_transitions(sf_dir: str):
    """First-order Markov transition matrix over each user's event-type
    sequence (the clickstream / next-event-prediction shape): for every
    consecutive pair in a user's (ts, event_id)-ordered stream, count
    corpus transitions (from_type -> to_type) and the integer-exact
    transition probability p_micro = n * 1_000_000 // n_from. One
    user-keyed co-location; within each partition the successor pairs
    come from one lexsort + shift (the events_dedup_window LAG shape) —
    no per-user loop, and only |types|^2-bounded (from, to, n) partials
    leave the partitions, so the driver fold is trivially small at any
    corpus size."""
    import ray.data as rd

    ev = read(sf_dir, "events", columns=["user_id", "ts", "event_id",
                                         "event_type"])

    def partial(part: pa.Table) -> pa.Table:
        empty = pa.table({"from_type": pa.array([], pa.string()),
                          "to_type": pa.array([], pa.string()),
                          "n": pa.array([], pa.int64())})
        if part.num_rows < 2:
            return empty
        u = part.column("user_id").to_numpy()
        ts = pc.cast(part.column("ts"), pa.timestamp("us")) \
            .to_numpy().view(np.int64)
        eid = part.column("event_id").to_numpy()
        # dictionary-encode instead of np.unique over Python strings:
        # the vocab is |types|-tiny, the indices stay in C
        d = pc.dictionary_encode(
            part.column("event_type")).combine_chunks()
        inv = d.indices.to_numpy()
        codes = np.asarray(d.dictionary.to_pylist(), dtype=object)
        order = np.lexsort((eid, ts, u))
        u_s, c_s = u[order], inv[order]
        same = u_s[1:] == u_s[:-1]
        if not same.any():
            return empty
        frm = c_s[:-1][same]
        to = c_s[1:][same]
        packed = frm.astype(np.int64) * codes.size + to.astype(np.int64)
        keys, n = np.unique(packed, return_counts=True)
        return pa.table({
            "from_type": pa.array(codes[keys // codes.size], pa.string()),
            "to_type": pa.array(codes[keys % codes.size], pa.string()),
            "n": pa.array(n.astype(np.int64), pa.int64())})

    parts = partitioned_map_groups(ev, "user_id", partial)

    # |types|^2-bounded partials: the driver fold holds one tiny dict.
    agg: dict[tuple[str, str], int] = {}
    for b in parts.iter_batches(batch_format="pyarrow"):
        for f, t, n in zip(b.column("from_type").to_pylist(),
                           b.column("to_type").to_pylist(),
                           b.column("n").to_pylist()):
            agg[(f, t)] = agg.get((f, t), 0) + n
    if not agg:
        return rd.from_arrow(pa.table({
            "from_type": pa.array([], pa.string()),
            "to_type": pa.array([], pa.string()),
            "n": pa.array([], pa.int64()),
            "n_from": pa.array([], pa.int64()),
            "p_micro": pa.array([], pa.int64())}))
    n_from: dict[str, int] = {}
    for (f, _t), n in agg.items():
        n_from[f] = n_from.get(f, 0) + n
    keys = sorted(agg)
    return rd.from_arrow(pa.table({
        "from_type": pa.array([k[0] for k in keys], pa.string()),
        "to_type": pa.array([k[1] for k in keys], pa.string()),
        "n": pa.array([agg[k] for k in keys], pa.int64()),
        "n_from": pa.array([n_from[k[0]] for k in keys], pa.int64()),
        "p_micro": pa.array([agg[k] * 1_000_000 // n_from[k[0]]
                             for k in keys], pa.int64())}))


def lineitem_file_stats(sf_dir: str, file_width: int = 256):
    """Zone-map / file-statistics build (the lakehouse data-skipping
    index shape): assign rows to their layout "file" (orderkey range of
    ``file_width`` — the clustered write a real table maintains) and
    fold per-file min/max/count statistics for the prunable columns.
    Exactly distributive: every batch emits one slim partial row per
    file it touches, one file-keyed bounded exchange folds them, and
    no wide column ever moves. Money is exact integer cents; dates
    are integer microseconds — both engines hash integers."""
    li = read(sf_dir, "lineitem",
              columns=["l_orderkey", "l_shipdate", "l_extendedprice",
                       "l_partkey"])

    def partial(t: pa.Table) -> pa.Table:
        fid = t.column("l_orderkey").to_numpy() // file_width
        ship = pc.cast(t.column("l_shipdate"), pa.timestamp("us")) \
            .to_numpy().view(np.int64)
        cents = _cents(t.column("l_extendedprice")).to_numpy()
        pk = t.column("l_partkey").to_numpy()
        order = np.argsort(fid, kind="stable")
        fid_s = fid[order]
        bounds = np.flatnonzero(np.diff(fid_s)) + 1
        starts = np.concatenate(([0], bounds))
        ends = np.concatenate((bounds, [fid_s.size]))

        def seg_min(a):
            return np.minimum.reduceat(a[order], starts)

        def seg_max(a):
            return np.maximum.reduceat(a[order], starts)

        return pa.table({
            "file_id": pa.array(fid_s[starts], pa.int64()),
            "n_rows": pa.array((ends - starts).astype(np.int64), pa.int64()),
            "min_ship": pa.array(seg_min(ship), pa.int64()),
            "max_ship": pa.array(seg_max(ship), pa.int64()),
            "min_price_cents": pa.array(seg_min(cents), pa.int64()),
            "max_price_cents": pa.array(seg_max(cents), pa.int64()),
            "min_part": pa.array(seg_min(pk), pa.int64()),
            "max_part": pa.array(seg_max(pk), pa.int64())})

    out_schema = pa.schema([
        ("file_id", pa.int64()), ("n_rows", pa.int64()),
        ("min_ship", pa.timestamp("us")), ("max_ship", pa.timestamp("us")),
        ("min_price_cents", pa.int64()), ("max_price_cents", pa.int64()),
        ("min_part", pa.int64()), ("max_part", pa.int64())])

    def fold(part: pa.Table) -> pa.Table:
        if part.num_rows == 0:
            return out_schema.empty_table()
        df = part.to_pandas()
        g = df.groupby("file_id", sort=True).agg(
            n_rows=("n_rows", "sum"),
            min_ship=("min_ship", "min"), max_ship=("max_ship", "max"),
            min_price_cents=("min_price_cents", "min"),
            max_price_cents=("max_price_cents", "max"),
            min_part=("min_part", "min"), max_part=("max_part", "max"),
        ).reset_index()
        t = pa.Table.from_pandas(g, preserve_index=False)
        return t.set_column(
            t.schema.get_field_index("min_ship"), "min_ship",
            t.column("min_ship").cast(pa.timestamp("us"))).set_column(
            t.schema.get_field_index("max_ship"), "max_ship",
            t.column("max_ship").cast(pa.timestamp("us")))

    partials = li.map_batches(partial, batch_format="pyarrow",
                              zero_copy_batch=True)
    return partitioned_map_groups(partials, "file_id", fold)


def events_mad_outliers(sf_dir: str):
    """Robust grouped outlier detection by median absolute deviation:
    per event type, the discrete median of exact-cents value, the MAD
    (discrete median of |cents - med|) and the count of events beyond
    3 * MAD — the monitoring shape that survives the heavy tails that
    break mean/stddev z-scores. ONE type-keyed co-location computes
    everything (a type's rows never span partitions — above that group
    size both medians route through dist_select, events_winsorized's
    IMPLEMENTED over-gate plan, the deviation pass scanning
    |cents - med| on the fly): two
    in-partition lexsorts give both order statistics with the same
    integer index arithmetic as quantile_disc (sorted[ceil(n/2)-1]),
    and the outlier count folds in place — the fact stream is scanned
    once and only |types| rows leave."""
    ev = read(sf_dir, "events", columns=["event_type", "value"])

    def fold(part: pa.Table) -> pa.Table:
        if part.num_rows == 0:
            return pa.table({"event_type": pa.array([], pa.string()),
                             "med_cents": pa.array([], pa.int64()),
                             "mad_cents": pa.array([], pa.int64()),
                             "n": pa.array([], pa.int64()),
                             "n_outliers": pa.array([], pa.int64())})
        enc = part.column("event_type")
        if isinstance(enc, pa.ChunkedArray):
            enc = enc.combine_chunks()
        d = enc.dictionary_encode()
        if isinstance(d, pa.ChunkedArray):
            d = d.combine_chunks()
        codes = d.indices.to_numpy().astype(np.int64)
        cents = _cents(part.column("value")).to_numpy()

        def seg_median(c_arr, v_arr):
            order = np.lexsort((v_arr, c_arr))
            c_s, v_s = c_arr[order], v_arr[order]
            bounds = np.flatnonzero(np.diff(c_s)) + 1
            starts = np.concatenate(([0], bounds))
            ends = np.concatenate((bounds, [c_s.size]))
            n = ends - starts
            imed = -(-n // 2) - 1  # quantile_disc: sorted[ceil(n/2)-1]
            return c_s[starts], n, v_s[starts + imed]

        types_c, n, med = seg_median(codes, cents)
        med_per_row = med[np.searchsorted(types_c, codes)]
        dev = np.abs(cents - med_per_row)
        _, _, mad = seg_median(codes, dev)
        mad_per_row = mad[np.searchsorted(types_c, codes)]
        out_mask = dev > 3 * mad_per_row
        n_out = np.zeros(types_c.size, np.int64)
        np.add.at(n_out, np.searchsorted(types_c, codes[out_mask]), 1)
        types = d.dictionary.take(pa.array(types_c)).cast(pa.string())
        return pa.table({"event_type": types,
                         "med_cents": pa.array(med, pa.int64()),
                         "mad_cents": pa.array(mad, pa.int64()),
                         "n": pa.array(n, pa.int64()),
                         "n_outliers": pa.array(n_out, pa.int64())})

    return partitioned_map_groups(ev, "event_type", fold)


def orders_cube(sf_dir: str):
    """GROUP BY CUBE(priority, status) in one corpus pass — the
    orders_rollup plan extended to all FOUR grouping sets (base, each
    single-dimension margin, grand total): every batch emits partials
    for every set at once with rolled levels pinned to the literal
    'ALL', one small grouped-Sum exchange finishes. Money sums use the
    integer-cents trick for float-order independence."""
    from ray.data.aggregate import Sum

    ds = read(sf_dir, "orders",
              columns=["o_orderpriority", "o_orderstatus", "o_totalprice"])

    def levels(t: pa.Table) -> pa.Table:
        cents = _cents(t.column("o_totalprice"))
        base = pa.table({"priority": t.column("o_orderpriority"),
                         "status": t.column("o_orderstatus"),
                         "n": pa.array(np.ones(t.num_rows, np.int64)),
                         "cents": cents})
        alls = pa.array(np.full(t.num_rows, "ALL"), pa.string())
        m_status = base.set_column(1, "status", alls)      # (pri, ALL)
        m_pri = base.set_column(0, "priority", alls)       # (ALL, status)
        grand = m_status.set_column(0, "priority", alls)   # (ALL, ALL)
        out = pa.concat_tables([base, m_status, m_pri, grand])
        g = out.group_by(["priority", "status"]).aggregate(
            [("n", "sum"), ("cents", "sum")])
        return pa.table({"priority": g.column("priority"),
                         "status": g.column("status"),
                         "n": g.column("n_sum").cast(pa.int64()),
                         "cents": g.column("cents_sum")})

    agg = ds.map_batches(levels, batch_format="pyarrow",
                         zero_copy_batch=True) \
        .groupby(["priority", "status"]) \
        .aggregate(Sum("n", alias_name="n_orders"),
                   Sum("cents", alias_name="cents"))

    def money(t: pa.Table) -> pa.Table:
        return pa.table({"priority": t.column("priority"),
                         "status": t.column("status"),
                         "n_orders": t.column("n_orders"),
                         "revenue": _uncents(t.column("cents"))})

    return agg.map_batches(money, batch_format="pyarrow",
                           zero_copy_batch=True)


def events_attribution_last_touch(sf_dir: str,
                                  window_hours: int = 24):
    """Last-touch marketing attribution: every 'purchase' event is
    credited to the user's LATEST preceding 'click'/'view' touch within
    ``window_hours`` (strictly earlier in (ts, event_id) sequence
    order; unattributed purchases drop — inner semantics). ONE
    user-keyed co-location; within a partition the last-touch index
    for every event is a single masked cumulative maximum over the
    (user, ts, event_id)-sorted stream — user boundaries need no reset
    because an earlier user's indices are provably below the segment
    start, and an intervening purchase does not clear the touch (the
    standard last-touch rule). No per-user loop, no window fan-out."""
    ev = read(sf_dir, "events", columns=["event_id", "user_id", "ts",
                                         "event_type"])
    win_us = np.int64(window_hours) * 3_600_000_000

    def attribute(part: pa.Table) -> pa.Table:
        empty = pa.table({"purchase_id": pa.array([], pa.int64()),
                          "touch_id": pa.array([], pa.int64()),
                          "touch_type": pa.array([], pa.string()),
                          "gap_us": pa.array([], pa.int64())})
        if part.num_rows == 0:
            return empty
        u = part.column("user_id").to_numpy()
        ts = pc.cast(part.column("ts"), pa.timestamp("us")) \
            .to_numpy().view(np.int64)
        eid = part.column("event_id").to_numpy()
        ty = part.column("event_type")
        if isinstance(ty, pa.ChunkedArray):
            ty = ty.combine_chunks()
        is_touch = pc.is_in(ty, value_set=pa.array(
            ["click", "view"])).to_numpy(zero_copy_only=False)
        is_conv = pc.equal(ty, pa.scalar("purchase")) \
            .to_numpy(zero_copy_only=False)
        order = np.lexsort((eid, ts, u))
        u_s, ts_s, eid_s = u[order], ts[order], eid[order]
        touch_s = is_touch[order]
        conv_s = is_conv[order]
        n = u_s.size
        idx = np.arange(n, dtype=np.int64)
        tpos = np.where(touch_s, idx, np.int64(-1))
        cm = np.maximum.accumulate(tpos)
        last_before = np.concatenate(([np.int64(-1)], cm[:-1]))
        # segment starts: first index of each user's run
        new_user = np.ones(n, dtype=bool)
        new_user[1:] = u_s[1:] != u_s[:-1]
        seg_start = idx[new_user][np.cumsum(new_user) - 1]
        ok = conv_s & (last_before >= seg_start)
        if not ok.any():
            return empty
        pi = idx[ok]
        tj = last_before[ok]
        gap = ts_s[pi] - ts_s[tj]
        keep = gap <= win_us
        pi, tj, gap = pi[keep], tj[keep], gap[keep]
        ty_s = ty.take(pa.array(order))  # types in stream order
        return pa.table({
            "purchase_id": pa.array(eid_s[pi], pa.int64()),
            "touch_id": pa.array(eid_s[tj], pa.int64()),
            "touch_type": ty_s.take(pa.array(tj)).cast(pa.string()),
            "gap_us": pa.array(gap, pa.int64())})

    return partitioned_map_groups(ev, "user_id", attribute)


def customer_rfm(sf_dir: str, n_tiles: int = 5):
    """RFM segmentation (the classic CRM shape): per customer with
    orders, Recency (whole days from their last order to the corpus
    max order date), Frequency (order count) and Monetary (exact
    cents), each scored into NTILE(n_tiles) buckets — R by recency
    ascending, F/M descending, custkey tie-break everywhere — plus the
    combined segment code r*100 + f*10 + m. One custkey-bounded
    partial fold builds the slim metric table (orders scanned once);
    the three tile passes are total-order rankings over that slim
    table via global_row_number + the exact SQL-NTILE index arithmetic
    customer_ntile uses (first total%n buckets one row bigger)."""
    import ray.data as rd

    orders = read(sf_dir, "orders", columns=["o_custkey", "o_orderdate",
                                             "o_totalprice"])

    def partial(t: pa.Table) -> pa.Table:
        c = t.column("o_custkey").to_numpy()
        d = pc.cast(t.column("o_orderdate"), pa.timestamp("us")) \
            .to_numpy().view(np.int64)
        cents = _cents(t.column("o_totalprice")).to_numpy()
        order = np.argsort(c, kind="stable")
        c_s = c[order]
        bounds = np.flatnonzero(np.diff(c_s)) + 1
        starts = np.concatenate(([0], bounds))
        ends = np.concatenate((bounds, [c_s.size]))
        return pa.table({
            "custkey": pa.array(c_s[starts], pa.int64()),
            "last_us": pa.array(np.maximum.reduceat(d[order], starts),
                                pa.int64()),
            "frequency": pa.array((ends - starts).astype(np.int64),
                                  pa.int64()),
            "monetary_cents": pa.array(np.add.reduceat(cents[order],
                                                       starts),
                                       pa.int64())})

    def fold(part: pa.Table) -> pa.Table:
        if part.num_rows == 0:
            return part
        df = part.to_pandas()
        g = df.groupby("custkey", sort=True).agg(
            last_us=("last_us", "max"),
            frequency=("frequency", "sum"),
            monetary_cents=("monetary_cents", "sum")).reset_index()
        return pa.Table.from_pandas(g, preserve_index=False)

    metrics = partitioned_map_groups(
        orders.map_batches(partial, batch_format="pyarrow",
                           zero_copy_batch=True),
        "custkey", fold).materialize()

    max_us = int(metrics.max("last_us") or 0)
    total = metrics.count()
    day_us = 86_400_000_000

    def recency(t: pa.Table) -> pa.Table:
        r = (max_us - t.column("last_us").to_numpy()) // day_us
        return pa.table({
            "custkey": t.column("custkey"),
            "recency_days": pa.array(r, pa.int64()),
            "frequency": t.column("frequency"),
            "monetary_cents": t.column("monetary_cents")})

    ds = metrics.map_batches(recency, batch_format="pyarrow",
                             zero_copy_batch=True)

    q, rem = divmod(total, n_tiles)

    def tile_col(rn: np.ndarray) -> np.ndarray:
        if q == 0:
            return np.minimum(rn, n_tiles)
        big = rem * (q + 1)
        return np.where(rn <= big, (rn - 1) // (q + 1) + 1,
                        rem + (rn - big - 1) // max(q, 1) + 1)

    for keys, desc, rn_col, tcol in [
            (["recency_days", "custkey"], [False, False], "rn_r", "r_tile"),
            (["frequency", "custkey"], [True, False], "rn_f", "f_tile"),
            (["monetary_cents", "custkey"], [True, False], "rn_m",
             "m_tile")]:
        ds = global_row_number(ds, keys, descending=desc, rn_col=rn_col)

        def mk(t: pa.Table, _rn=rn_col, _t=tcol) -> pa.Table:
            tile = tile_col(t.column(_rn).to_numpy())
            return t.drop_columns([_rn]).append_column(
                _t, pa.array(tile.astype(np.int64), pa.int64()))

        ds = ds.map_batches(mk, batch_format="pyarrow",
                            zero_copy_batch=True)

    def seg(t: pa.Table) -> pa.Table:
        s = (t.column("r_tile").to_numpy() * 100
             + t.column("f_tile").to_numpy() * 10
             + t.column("m_tile").to_numpy())
        return t.append_column("segment", pa.array(s, pa.int64()))

    return ds.map_batches(seg, batch_format="pyarrow",
                          zero_copy_batch=True)


def docs_snapshot_diff(sf_dir: str):
    """Snapshot diff (the reverse of MERGE INTO — completes the CDC
    family with merge/SCD2/time-travel): two deterministic derivations
    of the documents table play 'old' (doc_id % 7 != 0) and 'new'
    (doc_id % 5 != 0, with doc_id % 4 == 0 payloads bumped), and the
    diff emits insert / delete / update change rows (unchanged keys
    drop) — what an incremental pipeline would feed back into a
    changelog. ONE copartitioned key exchange of the slim (key,
    n_chars, lang) projections; the per-partition match is one
    searchsorted against the sorted old side. Missing sides use the
    -1 sentinel (both engines hash integers, never nulls)."""
    docs_old = read(sf_dir, "documents",
                    columns=["doc_id", "n_chars", "lang"])
    docs_new = read(sf_dir, "documents",
                    columns=["doc_id", "n_chars", "lang"])

    # modulo predicates aren't expressible as parquet filter
    # expressions, so the snapshot membership filters run per batch
    # (the column pruning above still holds)
    def prep_old(t: pa.Table) -> pa.Table:
        k = t.column("doc_id").to_numpy()
        t = t.filter(pa.array(k % 7 != 0))
        return pa.table({"key": t.column("doc_id"),
                         "n_chars": t.column("n_chars"),
                         "lang": t.column("lang")})

    def prep_new(t: pa.Table) -> pa.Table:
        k = t.column("doc_id").to_numpy()
        t = t.filter(pa.array(k % 5 != 0))
        k = t.column("doc_id").to_numpy()
        n = np.where(k % 4 == 0, t.column("n_chars").to_numpy() + 1,
                     t.column("n_chars").to_numpy())
        return pa.table({"key": t.column("doc_id"),
                         "n_chars": pa.array(n, pa.int64()),
                         "lang": t.column("lang")})

    def diff(parts: list[pa.Table]) -> pa.Table:
        old_p, new_p = parts
        ok = old_p.column("key").to_numpy()
        on = old_p.column("n_chars").to_numpy()
        ol = np.asarray(old_p.column("lang").to_pylist(), dtype=object)
        nk = new_p.column("key").to_numpy()
        nn = new_p.column("n_chars").to_numpy()
        nl = np.asarray(new_p.column("lang").to_pylist(), dtype=object)
        oo = np.argsort(ok, kind="stable")
        ok, on, ol = ok[oo], on[oo], ol[oo]
        si = np.searchsorted(ok, nk)
        si_c = np.minimum(si, max(ok.size - 1, 0))
        if ok.size:
            in_old = ok[si_c] == nk
            upd = in_old & ((on[si_c] != nn) | (ol[si_c] != nl))
        else:
            in_old = np.zeros(nk.size, bool)
            upd = in_old
        # inserts: new-only
        ins = ~in_old
        # deletes: old keys never probed by new
        hit = np.zeros(ok.size, bool)
        if ok.size:
            hit[si_c[in_old]] = True
        dele = ~hit
        keys = np.concatenate((nk[ins], nk[upd], ok[dele]))
        change = np.concatenate((
            np.full(int(ins.sum()), "insert", object),
            np.full(int(upd.sum()), "update", object),
            np.full(int(dele.sum()), "delete", object)))
        old_n = np.concatenate((np.full(int(ins.sum()), -1, np.int64),
                                on[si_c[upd]], on[dele]))
        new_n = np.concatenate((nn[ins], nn[upd],
                                np.full(int(dele.sum()), -1, np.int64)))
        return pa.table({"doc_id": pa.array(keys, pa.int64()),
                         "change": pa.array(change.tolist(), pa.string()),
                         "old_n_chars": pa.array(old_n, pa.int64()),
                         "new_n_chars": pa.array(new_n, pa.int64())})

    return copartitioned_map([(docs_old, prep_old), (docs_new, prep_new)],
                             "key", diff)


def customer_abc(sf_dir: str):
    """ABC / Pareto revenue analysis: customers ranked by exact-cents
    lifetime spend (desc, custkey tie), running cumulative share of
    total revenue, and the ABC class via integer cross-multiplication
    (A while cum*5 <= total*4, i.e. <= 80%; B while cum*20 <= total*19,
    <= 95%; else C) — no float share ever computed, so no boundary
    hazard. One custkey-bounded spend fold, one total-order sort; the
    cumulative sum is the global_row_number pattern extended to money:
    per-block cents totals (8 bytes each) prefix-sum on the driver and
    each block offsets its local cumsum via a raw task — blocks never
    leave the object store."""
    import ray
    import ray.data as rd

    orders = read(sf_dir, "orders", columns=["o_custkey", "o_totalprice"])

    def partial(t: pa.Table) -> pa.Table:
        c = t.column("o_custkey").to_numpy()
        cents = _cents(t.column("o_totalprice")).to_numpy()
        order = np.argsort(c, kind="stable")
        c_s = c[order]
        bounds = np.flatnonzero(np.diff(c_s)) + 1
        starts = np.concatenate(([0], bounds))
        return pa.table({
            "custkey": pa.array(c_s[starts], pa.int64()),
            "cents": pa.array(np.add.reduceat(cents[order], starts),
                              pa.int64())})

    def fold(part: pa.Table) -> pa.Table:
        if part.num_rows == 0:
            return part
        c = part.column("custkey").to_numpy()
        v = part.column("cents").to_numpy()
        order = np.argsort(c, kind="stable")
        c_s, v_s = c[order], v[order]
        bounds = np.flatnonzero(np.diff(c_s)) + 1
        starts = np.concatenate(([0], bounds))
        return pa.table({
            "custkey": pa.array(c_s[starts], pa.int64()),
            "cents": pa.array(np.add.reduceat(v_s, starts), pa.int64())})

    spend = partitioned_map_groups(
        orders.map_batches(partial, batch_format="pyarrow",
                           zero_copy_batch=True), "custkey", fold)

    total = int(spend.sum("cents") or 0)
    sorted_ds = spend.sort(["cents", "custkey"],
                           descending=[True, False]).materialize()
    refs = sorted_ds.to_arrow_refs()

    @ray.remote(num_cpus=0.25)
    def _block_sum(t: pa.Table):
        if t.num_rows == 0 or "cents" not in t.schema.names:
            return 0, 0
        return t.num_rows, int(t.column("cents").to_numpy().sum())

    @ray.remote(num_cpus=0.25)
    def _finish(t: pa.Table, rn_off: int, cum_off: int, tot: int):
        if t.num_rows == 0 or "cents" not in t.schema.names:
            return pa.table({"custkey": pa.array([], pa.int64()),
                             "cents": pa.array([], pa.int64()),
                             "rn": pa.array([], pa.int64()),
                             "cum_cents": pa.array([], pa.int64()),
                             "abc": pa.array([], pa.string())})
        cents = t.column("cents").to_numpy()
        cum = cum_off + np.cumsum(cents)
        rn = np.arange(rn_off + 1, rn_off + 1 + t.num_rows, dtype=np.int64)
        cls = np.where(cum * 5 <= tot * 4, "A",
                       np.where(cum * 20 <= tot * 19, "B", "C"))
        return pa.table({"custkey": t.column("custkey"),
                         "cents": t.column("cents"),
                         "rn": pa.array(rn, pa.int64()),
                         "cum_cents": pa.array(cum, pa.int64()),
                         "abc": pa.array(cls.tolist(), pa.string())})

    stats = ray.get([_block_sum.remote(r) for r in refs])
    rows = np.array([s[0] for s in stats], np.int64)
    sums = np.array([s[1] for s in stats], np.int64)
    rn_offs = np.concatenate(([0], np.cumsum(rows)[:-1])) if rows.size \
        else np.zeros(0, np.int64)
    cum_offs = np.concatenate(([0], np.cumsum(sums)[:-1])) if sums.size \
        else np.zeros(0, np.int64)
    out = [_finish.remote(r, int(a), int(b), total)
           for r, a, b in zip(refs, rn_offs, cum_offs)]
    return rd.from_arrow_refs(out)


def parts_degree_hist(sf_dir: str):
    """Degree distribution of the co-purchase part graph (the
    power-law sanity check every graph pipeline starts with): node
    count per degree. Degrees fold as |parts|-bounded count partials
    off the distinct edge list; the histogram is a max-degree-bounded
    driver fold."""
    import ray.data as rd

    from .relational import partitioned_map_groups  # noqa: F401 (doc)
    from webxtract.ops.graph import _count_partial, _unpack_edges, \
        coorder_part_edges

    edges = coorder_part_edges(sf_dir)

    def both(t: pa.Table) -> pa.Table:
        u, v = _unpack_edges(t)
        return pa.table({"src": pa.array(np.concatenate([u, v]),
                                         pa.int64())})

    node_chunks, n_chunks = [], []
    for b in edges.map_batches(both, batch_format="pyarrow",
                               zero_copy_batch=True) \
            .map_batches(lambda t: _count_partial(t, "src"),
                         batch_format="pyarrow", zero_copy_batch=True) \
            .iter_batches(batch_format="pyarrow"):  # |parts|-bounded
        node_chunks.append(b.column("node").to_numpy())
        n_chunks.append(b.column("n").to_numpy())
    if not node_chunks:
        return rd.from_arrow(pa.table({
            "degree": pa.array([], pa.int64()),
            "n_nodes": pa.array([], pa.int64())}))
    nodes = np.unique(np.concatenate(node_chunks))
    deg = np.zeros(nodes.size, np.int64)
    for bn, bv in zip(node_chunks, n_chunks):
        np.add.at(deg, np.searchsorted(nodes, bn), bv)
    ds, cnt = np.unique(deg, return_counts=True)
    return rd.from_arrow(pa.table({
        "degree": pa.array(ds, pa.int64()),
        "n_nodes": pa.array(cnt.astype(np.int64), pa.int64())}))


def customers_both_urgent_failed(sf_dir: str):
    """Segment-membership INTERSECT (the set-operation surface next to
    docs_new_content's EXCEPT and acctbal_union_topk's UNION):
    customers holding BOTH an urgent-priority order and an 'F'-status
    order, with each count. One orders scan emits per-batch (custkey,
    n_urgent, n_failed) integer partials — the two memberships fold in
    the SAME exchange as a conjunction instead of two scans + a join —
    and the bounded custkey-keyed fold filters both > 0."""
    orders = read(sf_dir, "orders",
                  columns=["o_custkey", "o_orderpriority",
                           "o_orderstatus"])

    def partial(t: pa.Table) -> pa.Table:
        c = t.column("o_custkey").to_numpy()
        urg = pc.equal(t.column("o_orderpriority"),
                       pa.scalar("1-URGENT")).to_numpy(
            zero_copy_only=False).astype(np.int64)
        fld = pc.equal(t.column("o_orderstatus"),
                       pa.scalar("F")).to_numpy(
            zero_copy_only=False).astype(np.int64)
        order = np.argsort(c, kind="stable")
        c_s = c[order]
        bounds = np.flatnonzero(np.diff(c_s)) + 1
        starts = np.concatenate(([0], bounds))
        return pa.table({
            "custkey": pa.array(c_s[starts], pa.int64()),
            "n_urgent": pa.array(np.add.reduceat(urg[order], starts),
                                 pa.int64()),
            "n_failed": pa.array(np.add.reduceat(fld[order], starts),
                                 pa.int64())})

    def fold(part: pa.Table) -> pa.Table:
        if part.num_rows == 0:
            return part
        c = part.column("custkey").to_numpy()
        u = part.column("n_urgent").to_numpy()
        f = part.column("n_failed").to_numpy()
        order = np.argsort(c, kind="stable")
        c_s = c[order]
        bounds = np.flatnonzero(np.diff(c_s)) + 1
        starts = np.concatenate(([0], bounds))
        us = np.add.reduceat(u[order], starts)
        fs = np.add.reduceat(f[order], starts)
        m = (us > 0) & (fs > 0)
        return pa.table({
            "custkey": pa.array(c_s[starts][m], pa.int64()),
            "n_urgent": pa.array(us[m], pa.int64()),
            "n_failed": pa.array(fs[m], pa.int64())})

    return partitioned_map_groups(
        orders.map_batches(partial, batch_format="pyarrow",
                           zero_copy_batch=True), "custkey", fold)


def events_time_to_convert(sf_dir: str):
    """Time-to-convert funnel metric (the product-analytics shape):
    per user, the FIRST 'signup' and the first 'purchase' STRICTLY
    AFTER it in (ts, event_id) sequence order, with the gap in
    microseconds; users missing either leg drop (inner semantics).
    One user-keyed co-location; per partition the first signup is a
    vectorized segment-first, and each user's first later purchase is
    a binary search into their purchase run (a loop over USERS with
    O(log) work each — never a row loop; the while only walks
    same-timestamp ties, bounded by per-(user, ts) purchase count)."""
    ev = read(sf_dir, "events", columns=["event_id", "user_id", "ts",
                                         "event_type"])

    def fold(part: pa.Table) -> pa.Table:
        empty = pa.table({"user_id": pa.array([], pa.int64()),
                          "signup_ts": pa.array([], pa.timestamp("us")),
                          "purchase_ts": pa.array([], pa.timestamp("us")),
                          "gap_us": pa.array([], pa.int64())})
        if part.num_rows == 0:
            return empty
        u = part.column("user_id").to_numpy()
        ts = pc.cast(part.column("ts"), pa.timestamp("us")) \
            .to_numpy().view(np.int64)
        eid = part.column("event_id").to_numpy()
        ty = part.column("event_type")
        if isinstance(ty, pa.ChunkedArray):
            ty = ty.combine_chunks()
        is_s = pc.equal(ty, pa.scalar("signup")) \
            .to_numpy(zero_copy_only=False)
        is_p = pc.equal(ty, pa.scalar("purchase")) \
            .to_numpy(zero_copy_only=False)

        def first_per_user(mask):
            um, tm, em = u[mask], ts[mask], eid[mask]
            order = np.lexsort((em, tm, um))
            um, tm, em = um[order], tm[order], em[order]
            keep = np.ones(um.size, bool)
            keep[1:] = um[1:] != um[:-1]
            return um[keep], tm[keep], em[keep]

        su, st, se = first_per_user(is_s)
        if su.size == 0:
            return empty
        # purchases sorted by (user, ts, eid); for each user's first
        # signup find the first strictly-later purchase
        pm = is_p
        pu, pt, pe = u[pm], ts[pm], eid[pm]
        order = np.lexsort((pe, pt, pu))
        pu, pt, pe = pu[order], pt[order], pe[order]
        # strict (ts, eid) order: search for (user, ts, eid + 1)
        lo = np.searchsorted(pu, su, side="left")
        hi = np.searchsorted(pu, su, side="right")
        # within [lo, hi) find first purchase with (pt, pe) > (st, se):
        # packed keys are safe — event ids < 2^20 here, ts fits
        idx = np.full(su.size, -1, np.int64)
        for i in range(su.size):  # users-per-partition loop over
            # bounded segment scans (each binary search, no row loop)
            a, b = lo[i], hi[i]
            if a == b:
                continue
            j = a + np.searchsorted(pt[a:b], st[i], side="left")
            while j < b and (pt[j] < st[i]
                             or (pt[j] == st[i] and pe[j] <= se[i])):
                j += 1
            if j < b:
                idx[i] = j
        ok = idx >= 0
        su, st, idx = su[ok], st[ok], idx[ok]
        return pa.table({
            "user_id": pa.array(su, pa.int64()),
            "signup_ts": pa.array(st, pa.int64()).cast(pa.timestamp("us")),
            "purchase_ts": pa.array(pt[idx], pa.int64())
            .cast(pa.timestamp("us")),
            "gap_us": pa.array(pt[idx] - st, pa.int64())})

    return partitioned_map_groups(ev, "user_id", fold)


def orders_dow_profile(sf_dir: str):
    """Day-of-week seasonality profile: order count and exact-cents
    revenue per ISO weekday (Mon=1..Sun=7). Pure per-batch integer
    partials (epoch-day arithmetic — 1970-01-01 was a Thursday, so
    isodow = (days + 3) % 7 + 1) into one 7-row grouped fold."""
    orders = read(sf_dir, "orders", columns=["o_orderdate",
                                             "o_totalprice"])
    day_us = np.int64(86_400_000_000)

    def partial(t: pa.Table) -> pa.Table:
        d = pc.cast(t.column("o_orderdate"), pa.timestamp("us")) \
            .to_numpy().view(np.int64) // day_us
        dow = (d + 3) % 7 + 1
        cents = _cents(t.column("o_totalprice")).to_numpy()
        n = np.zeros(7, np.int64)
        s = np.zeros(7, np.int64)
        np.add.at(n, dow - 1, 1)
        np.add.at(s, dow - 1, cents)
        m = n > 0
        return pa.table({
            "isodow": pa.array(np.arange(1, 8)[m], pa.int64()),
            "n": pa.array(n[m], pa.int64()),
            "cents": pa.array(s[m], pa.int64())})

    agg: dict[int, list[int]] = {}
    for b in orders.map_batches(partial, batch_format="pyarrow",
                                zero_copy_batch=True) \
            .iter_batches(batch_format="pyarrow"):  # 7-row bounded
        for dw, n, c in zip(b.column("isodow").to_pylist(),
                            b.column("n").to_pylist(),
                            b.column("cents").to_pylist()):
            e = agg.setdefault(dw, [0, 0])
            e[0] += n
            e[1] += c
    import ray.data as rd
    keys = sorted(agg)
    return rd.from_arrow(pa.table({
        "isodow": pa.array(keys, pa.int64()),
        "n_orders": pa.array([agg[k][0] for k in keys], pa.int64()),
        "revenue": _uncents(pa.array([agg[k][1] for k in keys],
                                     pa.int64()))}))


def events_value_log_hist(sf_dir: str):
    """Log2-bucketed value histogram (the long-tail distribution probe
    dashboards run first): positive exact-cents values bucketed by
    bit length (bucket = floor(log2(cents)), computed EXACTLY via
    frexp's binary exponent — a float log2 at a 2^k boundary can land
    on k - 1e-16 and mis-bucket; the oracle gets the same exactness
    from the binary-string length printf('%b')). Per-batch 64-row
    bounded integer partials, no exchange."""
    import ray.data as rd

    ev = read(sf_dir, "events", columns=["value"])

    def partial(t: pa.Table) -> pa.Table:
        cents = _cents(t.column("value")).to_numpy()
        cents = cents[cents > 0]
        if cents.size == 0:
            return pa.table({"bucket": pa.array([], pa.int64()),
                             "n": pa.array([], pa.int64())})
        # frexp: c = m * 2^e, m in [0.5, 1) -> floor(log2 c) = e - 1
        _, e = np.frexp(cents.astype(np.float64))  # exact below 2^53
        bucket = e.astype(np.int64) - 1
        ks, cs = np.unique(bucket, return_counts=True)
        return pa.table({"bucket": pa.array(ks, pa.int64()),
                         "n": pa.array(cs.astype(np.int64), pa.int64())})

    agg: dict[int, int] = {}
    for b in ev.map_batches(partial, batch_format="pyarrow",
                            zero_copy_batch=True) \
            .iter_batches(batch_format="pyarrow"):  # 64-row bounded
        for k, n in zip(b.column("bucket").to_pylist(),
                        b.column("n").to_pylist()):
            agg[k] = agg.get(k, 0) + n
    keys = sorted(agg)
    return rd.from_arrow(pa.table({
        "bucket": pa.array(keys, pa.int64()),
        "n": pa.array([agg[k] for k in keys], pa.int64()),
        "lo_cents": pa.array([1 << k for k in keys], pa.int64()),
        "hi_cents": pa.array([(1 << (k + 1)) - 1 for k in keys],
                             pa.int64())}))


def events_value_cusum(sf_dir: str, target_cents: int = 5_000):
    """One-sided CUSUM drift detection per user (the monitoring shape
    next to EWMA): s_t = max(0, s_{t-1} + cents_t - target) over the
    (ts, event_id)-ordered stream; emits each user's final and maximum
    statistic. Unlike EWMA's floor-divide recurrence, CUSUM has an
    EXACT closed form — s_t = P_t - min(0, min_{j<=t} P_j) with P the
    running sum of deviations — so the whole scan is vectorized
    (cumsum + segment-reset running minimum via the +BIG*segment_id
    inflation trick, overflow-guarded); the recurrence == closed-form
    equality is pinned against a Python-loop replica in tests, and the
    oracle computes the same closed form with two window levels."""
    ev = read(sf_dir, "events", columns=["event_id", "user_id", "ts",
                                         "value"])

    def fold(part: pa.Table) -> pa.Table:
        empty = pa.table({"user_id": pa.array([], pa.int64()),
                          "n_events": pa.array([], pa.int64()),
                          "final_cusum": pa.array([], pa.int64()),
                          "max_cusum": pa.array([], pa.int64())})
        if part.num_rows == 0:
            return empty
        u = part.column("user_id").to_numpy()
        ts = pc.cast(part.column("ts"), pa.timestamp("us")) \
            .to_numpy().view(np.int64)
        eid = part.column("event_id").to_numpy()
        d = _cents(part.column("value")).to_numpy() - target_cents
        order = np.lexsort((eid, ts, u))
        u_s, d_s = u[order], d[order]
        n = u_s.size
        new_user = np.ones(n, dtype=bool)
        new_user[1:] = u_s[1:] != u_s[:-1]
        seg_id = np.cumsum(new_user) - 1
        pg = np.cumsum(d_s)
        seg_start = np.flatnonzero(new_user)
        base = np.where(seg_start > 0, pg[seg_start - 1], 0)
        p = pg - base[seg_id]                      # per-user prefix sums
        # big must exceed the LARGEST cross-segment drop (2 * max|P|):
        # with only max|P|+1, segment k-1's inflated minimum can still
        # undercut segment k's values and leak through the accumulate
        big = np.int64(max(2 * int(np.abs(p).max()) + 1, 1))
        if big * (int(seg_id[-1]) + 2) > 2 ** 62:
            raise ValueError("CUSUM segment-inflation trick would "
                             "overflow int64; split the partition")
        # later segments get strictly LOWER offsets, so an earlier
        # segment's inflated values can never win the running minimum
        runmin = np.minimum.accumulate(p - big * seg_id) + big * seg_id
        s = p - np.minimum(runmin, 0)              # the CUSUM statistic
        # per-user final (last row) and max
        ends = np.concatenate((seg_start[1:], [n])) - 1
        smax = np.maximum.reduceat(s, seg_start)
        return pa.table({
            "user_id": pa.array(u_s[seg_start], pa.int64()),
            "n_events": pa.array(
                np.diff(np.concatenate((seg_start, [n]))), pa.int64()),
            "final_cusum": pa.array(s[ends], pa.int64()),
            "max_cusum": pa.array(smax, pa.int64())})

    return partitioned_map_groups(ev, "user_id", fold)


def _f64_sortkey(v: np.ndarray) -> np.ndarray:
    """Order-preserving float64 -> int64 key (IEEE bit trick): for
    non-negative doubles the bit pattern already sorts; negatives flip
    their magnitude bits. Exact and invertible."""
    bits = v.view(np.int64)
    return bits ^ ((bits >> np.int64(63)) & np.int64(0x7FFFFFFFFFFFFFFF))


def _f64_from_sortkey(k: np.ndarray) -> np.ndarray:
    bits = k ^ ((k >> np.int64(63)) & np.int64(0x7FFFFFFFFFFFFFFF))
    return bits.view(np.float64)


def dist_group_stats(ev) -> dict:
    """Per-group (count, key-min, key-max) off one slim scan —
    pass 0 of the distributed selection."""
    stats: dict[str, list[int]] = {}
    for b in ev.map_batches(
            lambda t: _median_stats_partial(t),
            batch_format="pyarrow", zero_copy_batch=True) \
            .iter_batches(batch_format="pyarrow"):
        for ty, n, lo, hi in zip(b.column("event_type").to_pylist(),
                                 b.column("n").to_pylist(),
                                 b.column("lo").to_pylist(),
                                 b.column("hi").to_pylist()):
            s = stats.setdefault(ty, [0, lo, hi])
            s[0] += n
            s[1] = min(s[1], lo)
            s[2] = max(s[2], hi)
    return stats


def dist_select(ev, targets, gather_max: int = 4096) -> dict:
    """Histogram-bisection distributed selection: resolve each
    (group, rank, lo, hi) target to its exact int64 sort key with a
    handful of slim scan rounds + one bounded gather (see
    events_value_median_dist for the full contract)."""
    import ray

    from ..broadcast import get_broadcast

    resolved: dict[int, int] = {}           # target idx -> exact key
    pending = {i: t for i, t in enumerate(targets)}

    def hist_pass(pend):
        tl = [(i, t[0], t[1], t[2], t[3]) for i, t in pend.items()]
        ref = ray.put(tl)

        def partial(batch: pa.Table, _ref=ref) -> pa.Table:
            tlist = get_broadcast(_ref)
            ty = batch.column("event_type")
            keys = _f64_sortkey(batch.column("value").to_numpy())
            out_t, out_b, out_n = [], [], []
            for (i, t, _r, lo, hi) in tlist:
                m = pc.equal(ty, pa.scalar(t)).to_numpy(
                    zero_copy_only=False)
                kv = keys[m]
                kv = kv[(kv >= lo) & (kv < hi)]
                if kv.size == 0:
                    continue
                width = hi - lo
                shift = max(0, int(width).bit_length() - 12)
                bk = (kv - lo) >> shift
                ub, cn = np.unique(bk, return_counts=True)
                out_t.append(np.full(ub.size, i, np.int64))
                out_b.append(ub)
                out_n.append(cn.astype(np.int64))
            if not out_t:
                return pa.table({"i": pa.array([], pa.int64()),
                                 "b": pa.array([], pa.int64()),
                                 "n": pa.array([], pa.int64())})
            return pa.table({
                "i": pa.array(np.concatenate(out_t), pa.int64()),
                "b": pa.array(np.concatenate(out_b), pa.int64()),
                "n": pa.array(np.concatenate(out_n), pa.int64())})

        agg: dict[tuple[int, int], int] = {}
        for b in ev.map_batches(partial, batch_format="pyarrow",
                                zero_copy_batch=True) \
                .iter_batches(batch_format="pyarrow"):
            for i, bk, n in zip(b.column("i").to_pylist(),
                                b.column("b").to_pylist(),
                                b.column("n").to_pylist()):
                agg[(i, bk)] = agg.get((i, bk), 0) + n
        return agg

    rounds = 0
    while pending and rounds < 8:
        rounds += 1
        agg = hist_pass(pending)
        nxt = {}
        for i, (ty, rank, lo, hi) in pending.items():
            width = hi - lo
            shift = max(0, int(width).bit_length() - 12)
            buckets = sorted(bk for (j, bk) in agg if j == i)
            r = rank
            done = False
            for bk in buckets:
                c = agg[(i, bk)]
                if r < c:
                    nlo = lo + (bk << shift)
                    nhi = min(hi, nlo + (1 << shift))
                    if nhi - nlo <= 1 or c == 1:
                        # width-1 range pins the key exactly; c == 1
                        # pins it to the bucket's only value — a final
                        # gather finds it below if the range is wider
                        if nhi - nlo <= 1:
                            resolved[i] = int(nlo)
                            done = True
                            break
                    if c <= gather_max:
                        nxt[i] = [ty, r, nlo, nhi, True]  # gather next
                    else:
                        nxt[i] = [ty, r, nlo, nhi]
                    done = True
                    break
                r -= c
            if not done:
                raise AssertionError("rank walked past histogram mass")
        # gather targets small enough to finish exactly
        gath = {i: t for i, t in nxt.items() if len(t) == 5}
        pending = {i: t[:4] for i, t in nxt.items() if len(t) == 4}
        if gath:
            tl = [(i, t[0], t[2], t[3]) for i, t in gath.items()]
            ref = ray.put(tl)

            def gpartial(batch: pa.Table, _ref=ref) -> pa.Table:
                tlist = get_broadcast(_ref)
                ty = batch.column("event_type")
                keys = _f64_sortkey(batch.column("value").to_numpy())
                oi, ok = [], []
                for (i, t, lo, hi) in tlist:
                    m = pc.equal(ty, pa.scalar(t)).to_numpy(
                        zero_copy_only=False)
                    kv = keys[m]
                    kv = kv[(kv >= lo) & (kv < hi)]
                    if kv.size:
                        oi.append(np.full(kv.size, i, np.int64))
                        ok.append(kv)
                if not oi:
                    return pa.table({"i": pa.array([], pa.int64()),
                                     "k": pa.array([], pa.int64())})
                return pa.table({
                    "i": pa.array(np.concatenate(oi), pa.int64()),
                    "k": pa.array(np.concatenate(ok), pa.int64())})

            vals: dict[int, list] = {i: [] for i in gath}
            for b in ev.map_batches(gpartial, batch_format="pyarrow",
                                    zero_copy_batch=True) \
                    .iter_batches(batch_format="pyarrow"):
                for i, k in zip(b.column("i").to_pylist(),
                                b.column("k").to_pylist()):
                    vals[i].append(k)
            for i, t in gath.items():
                ks = sorted(vals[i])
                resolved[i] = int(ks[t[1]])
    if pending:
        raise AssertionError("selection bisection failed to converge")
    return resolved


def events_value_median_dist(sf_dir: str, gather_max: int = 4096):
    """Grouped exact median WITHOUT the per-group-fits-a-partition
    assumption events_value_median (and winsorize) document — the true
    scale path for order statistics when one group outgrows a worker:
    distributed selection by histogram bisection (dist_select). Values
    map to order-preserving int64 keys (IEEE bit trick, exact); each
    round one slim scan emits per-(target, bucket) count partials over
    the targets' current key ranges (<= 4096 buckets via a shift —
    pure integer arithmetic), the driver descends into the bucket
    holding the target rank, and ranges shrink ~2^12 per round (<= 6
    rounds for the full double range); a final filtered gather of at
    most ``gather_max`` values per target finishes. Both middle ranks
    of an even group are tracked as separate targets, matching DuckDB
    median()'s interpolation. The group's values NEVER co-locate.
    Equivalence-tested against the sort-based twin; same oracle."""
    ev = read(sf_dir, "events", columns=["event_type", "value"])
    stats = dist_group_stats(ev)

    # targets: (type, rank0based) with state [lo, hi) over keys,
    # rank relative to the current range
    targets = []
    for ty, (n, lo, hi) in sorted(stats.items()):
        r1, r2 = (n - 1) // 2, n // 2
        targets.append([ty, r1, lo, hi + 1])
        if r2 != r1:
            targets.append([ty, r2, lo, hi + 1])
    resolved = dist_select(ev, targets, gather_max=gather_max)

    # assemble per type: mean of the (one or two) target values
    out_t, out_m = [], []
    by_type: dict[str, list[int]] = {}
    for i, (ty, _r, _lo, _hi) in enumerate(targets):
        by_type.setdefault(ty, []).append(resolved[i])
    for ty in sorted(by_type):
        ks = np.array(by_type[ty], np.int64)
        ds_v = _f64_from_sortkey(ks)
        m = float(ds_v[0]) if ds_v.size == 1 \
            else float((ds_v[0] + ds_v[1]) / 2.0)
        out_t.append(ty)
        out_m.append(round(m, 6))
    import ray.data as rd
    return rd.from_arrow(pa.table({
        "event_type": pa.array(out_t, pa.string()),
        "median_value": pa.array(out_m, pa.float64())}))


def _median_stats_partial(t: pa.Table) -> pa.Table:
    if t.num_rows == 0:
        return pa.table({"event_type": pa.array([], pa.string()),
                         "n": pa.array([], pa.int64()),
                         "lo": pa.array([], pa.int64()),
                         "hi": pa.array([], pa.int64())})
    enc = t.column("event_type")
    if isinstance(enc, pa.ChunkedArray):
        enc = enc.combine_chunks()
    d = enc.dictionary_encode()
    if isinstance(d, pa.ChunkedArray):
        d = d.combine_chunks()
    codes = d.indices.to_numpy().astype(np.int64)
    keys = _f64_sortkey(t.column("value").to_numpy())
    order = np.argsort(codes, kind="stable")
    c_s, k_s = codes[order], keys[order]
    bounds = np.flatnonzero(np.diff(c_s)) + 1
    starts = np.concatenate(([0], bounds))
    ends = np.concatenate((bounds, [c_s.size]))
    return pa.table({
        "event_type": d.dictionary.take(pa.array(c_s[starts]))
        .cast(pa.string()),
        "n": pa.array((ends - starts).astype(np.int64), pa.int64()),
        "lo": pa.array(np.minimum.reduceat(k_s, starts), pa.int64()),
        "hi": pa.array(np.maximum.reduceat(k_s, starts), pa.int64())})


def events_error_band_join(sf_dir: str, band_minutes: int = 5):
    """Time-BAND join (|t_a - t_b| <= w, the interval shape AS-OF
    can't express — every match in the window counts, not just the
    latest): per purchase, how many of the SAME user's error events
    fall within +-band_minutes. One user-keyed co-location; within a
    partition the window count for every purchase is TWO vectorized
    searchsorteds into the user's sorted error timestamps (no interval
    expansion, no per-row loop): count = upper_bound(t + w) -
    lower_bound(t - w). Purchases with zero nearby errors keep their
    row (count 0) — the join is a windowed AGGREGATE, so inner-vs-left
    ambiguity never arises."""
    ev = read(sf_dir, "events", columns=["event_id", "user_id", "ts",
                                         "event_type"])
    w_us = np.int64(band_minutes) * 60_000_000

    def fold(part: pa.Table) -> pa.Table:
        empty = pa.table({"purchase_id": pa.array([], pa.int64()),
                          "user_id": pa.array([], pa.int64()),
                          "n_errors_near": pa.array([], pa.int64())})
        if part.num_rows == 0:
            return empty
        u = part.column("user_id").to_numpy()
        ts = pc.cast(part.column("ts"), pa.timestamp("us")) \
            .to_numpy().view(np.int64)
        eid = part.column("event_id").to_numpy()
        ty = part.column("event_type")
        if isinstance(ty, pa.ChunkedArray):
            ty = ty.combine_chunks()
        is_p = pc.equal(ty, pa.scalar("purchase")) \
            .to_numpy(zero_copy_only=False)
        is_e = pc.equal(ty, pa.scalar("error")) \
            .to_numpy(zero_copy_only=False)
        if not is_p.any():
            return empty
        # errors sorted by (user, ts); per-user slices via bounds
        eu, et = u[is_e], ts[is_e]
        order = np.lexsort((et, eu))
        eu, et = eu[order], et[order]
        pu, pt, pid = u[is_p], ts[is_p], eid[is_p]
        # global positions: searchsorted over the (user, ts) packed
        # order — pack avoided by two-level search: user range first
        lo_u = np.searchsorted(eu, pu, side="left")
        hi_u = np.searchsorted(eu, pu, side="right")
        n = np.zeros(pu.size, np.int64)
        # vectorize across purchases with np.searchsorted per bound
        # inside each user range: et is globally sorted only within
        # user runs, so search the SLICED view via offset arithmetic
        for i in range(pu.size):  # purchases-per-partition loop,
            # two binary searches each (no row loop over errors)
            a, b = lo_u[i], hi_u[i]
            if a == b:
                continue
            lo = a + np.searchsorted(et[a:b], pt[i] - w_us, side="left")
            hi = a + np.searchsorted(et[a:b], pt[i] + w_us,
                                     side="right")
            n[i] = hi - lo
        return pa.table({"purchase_id": pa.array(pid, pa.int64()),
                         "user_id": pa.array(pu, pa.int64()),
                         "n_errors_near": pa.array(n, pa.int64())})

    return partitioned_map_groups(ev, "user_id", fold)


def orders_cohort_ltv(sf_dir: str):
    """Cohort lifetime-value matrix (the retention/LTV warehouse
    staple): customers grouped by FIRST-order month, each cell
    (cohort_month, age_months) holding order count and exact-cents
    revenue. ONE custkey co-location computes every customer's cohort
    and per-order age locally (months as integer months-since-epoch,
    so the age difference is pure int subtraction — DuckDB's
    year*12+month arithmetic lands on the same integers); the
    partials are months^2-bounded, so the final fold is a trivially
    small driver dict."""
    import ray.data as rd

    orders = read(sf_dir, "orders",
                  columns=["o_custkey", "o_orderdate", "o_totalprice"])

    def fold(part: pa.Table) -> pa.Table:
        empty = pa.table({"cohort_m": pa.array([], pa.int64()),
                          "age_months": pa.array([], pa.int64()),
                          "n": pa.array([], pa.int64()),
                          "cents": pa.array([], pa.int64())})
        if part.num_rows == 0:
            return empty
        c = part.column("o_custkey").to_numpy()
        m = pc.cast(part.column("o_orderdate"), pa.timestamp("us")) \
            .to_numpy().astype("datetime64[M]").view(np.int64)
        cents = _cents(part.column("o_totalprice")).to_numpy()
        order = np.lexsort((m, c))
        c_s, m_s, v_s = c[order], m[order], cents[order]
        new_c = np.ones(c_s.size, bool)
        new_c[1:] = c_s[1:] != c_s[:-1]
        seg_id = np.cumsum(new_c) - 1
        cohort = m_s[np.flatnonzero(new_c)][seg_id]  # per-row first mo
        age = m_s - cohort
        packed = cohort * 10_000 + age  # ages < 10000 months
        keys, inv = np.unique(packed, return_inverse=True)
        n = np.bincount(inv).astype(np.int64)
        s = np.zeros(keys.size, np.int64)
        np.add.at(s, inv, v_s)
        return pa.table({"cohort_m": pa.array(keys // 10_000, pa.int64()),
                         "age_months": pa.array(keys % 10_000, pa.int64()),
                         "n": pa.array(n, pa.int64()),
                         "cents": pa.array(s, pa.int64())})

    parts = partitioned_map_groups(orders, "o_custkey", fold)
    agg: dict[tuple[int, int], list[int]] = {}
    for b in parts.iter_batches(batch_format="pyarrow"):  # months^2
        for cm, ag, n, s in zip(b.column("cohort_m").to_pylist(),
                                b.column("age_months").to_pylist(),
                                b.column("n").to_pylist(),
                                b.column("cents").to_pylist()):
            e = agg.setdefault((cm, ag), [0, 0])
            e[0] += n
            e[1] += s
    keys = sorted(agg)
    cm = np.array([k[0] for k in keys], np.int64)
    return rd.from_arrow(pa.table({
        "cohort_month": pa.array(cm.view("datetime64[M]")
                                 .astype("datetime64[us]")),
        "age_months": pa.array([k[1] for k in keys], pa.int64()),
        "n_orders": pa.array([agg[k][0] for k in keys], pa.int64()),
        "revenue": _uncents(pa.array([agg[k][1] for k in keys],
                                     pa.int64()))}))


def events_funnel_strict(sf_dir: str):
    """Funnel with EXCLUSION (the SQL MATCH_RECOGNIZE shape: signup
    -> purchase with NO error strictly between): per user, the first
    signup, its first strictly-later purchase, and a match only when
    no error event falls between the two in (ts, event_id) sequence
    order — the pattern a naive funnel (events_funnel_users /
    events_time_to_convert) cannot express. One user-keyed
    co-location; each leg is the same per-user binary search as
    events_time_to_convert, and the exclusion is ONE more search into
    the user's sorted error run — no state machine, no row loop."""
    ev = read(sf_dir, "events", columns=["event_id", "user_id", "ts",
                                         "event_type"])

    def fold(part: pa.Table) -> pa.Table:
        empty = pa.table({"user_id": pa.array([], pa.int64()),
                          "signup_id": pa.array([], pa.int64()),
                          "purchase_id": pa.array([], pa.int64()),
                          "gap_us": pa.array([], pa.int64())})
        if part.num_rows == 0:
            return empty
        u = part.column("user_id").to_numpy()
        ts = pc.cast(part.column("ts"), pa.timestamp("us")) \
            .to_numpy().view(np.int64)
        eid = part.column("event_id").to_numpy()
        ty = part.column("event_type")
        if isinstance(ty, pa.ChunkedArray):
            ty = ty.combine_chunks()

        def mask(name):
            return pc.equal(ty, pa.scalar(name)) \
                .to_numpy(zero_copy_only=False)

        def sorted_leg(m):
            lu, lt, le = u[m], ts[m], eid[m]
            order = np.lexsort((le, lt, lu))
            return lu[order], lt[order], le[order]

        su_, st_, se_ = sorted_leg(mask("signup"))
        if su_.size == 0:
            return empty
        keep = np.ones(su_.size, bool)
        keep[1:] = su_[1:] != su_[:-1]
        su, st, se = su_[keep], st_[keep], se_[keep]  # first signup

        pu, pt, pe = sorted_leg(mask("purchase"))
        eu, et, ee = sorted_leg(mask("error"))

        def first_after(lu, lt, le, qu, qt, qe):
            """index into the leg of each query's first strictly-later
            event (or -1) — per-user binary searches."""
            lo = np.searchsorted(lu, qu, side="left")
            hi = np.searchsorted(lu, qu, side="right")
            out = np.full(qu.size, -1, np.int64)
            for i in range(qu.size):
                a, b = lo[i], hi[i]
                if a == b:
                    continue
                j = a + np.searchsorted(lt[a:b], qt[i], side="left")
                while j < b and (lt[j] < qt[i]
                                 or (lt[j] == qt[i] and le[j] <= qe[i])):
                    j += 1
                if j < b:
                    out[i] = j
            return out

        pi = first_after(pu, pt, pe, su, st, se)
        ei = first_after(eu, et, ee, su, st, se)
        ok = pi >= 0
        # exclusion: an error strictly between signup and THAT purchase
        # (sequence order) kills the match
        has_err = ei >= 0
        err_before_purchase = np.zeros(su.size, bool)
        m = ok & has_err
        if m.any():
            a = (et[ei[m]] < pt[pi[m]]) \
                | ((et[ei[m]] == pt[pi[m]]) & (ee[ei[m]] < pe[pi[m]]))
            err_before_purchase[m] = a
        ok &= ~err_before_purchase
        if not ok.any():
            return empty
        return pa.table({
            "user_id": pa.array(su[ok], pa.int64()),
            "signup_id": pa.array(se[ok], pa.int64()),
            "purchase_id": pa.array(pe[pi[ok]], pa.int64()),
            "gap_us": pa.array(pt[pi[ok]] - st[ok], pa.int64())})

    return partitioned_map_groups(ev, "user_id", fold)


def nation_region_revenue_share(sf_dir: str):
    """Share-of-parent rollup (the hierarchy-dashboard shape q5 stops
    short of): every nation's order revenue and its integer
    parts-per-million share of its REGION's total — share_ppm =
    nation_cents * 1_000_000 // region_cents, so no float division
    exists anywhere. Customer -> nation -> region resolve through the
    dimension broadcast chain (region/nation are catalog-tiny,
    customer is the one sized broadcast — the hash-join swap the other
    dimension joins document applies above it); orders are scanned
    once into |nations|-bounded cents partials, and the region rollup
    + shares fold on the driver over ~25 rows."""
    import ray.data as rd

    nat = read(sf_dir, "nation")
    nat_ref = broadcast_lookup(nat, "n_nationkey",
                               ["n_name", "n_regionkey"])
    cust = read(sf_dir, "customer", columns=["c_custkey", "c_nationkey"])

    def cast_nk(t: pa.Table) -> pa.Table:
        return pa.table({
            "c_custkey": t.column("c_custkey"),
            "c_nationkey": t.column("c_nationkey").cast(pa.int64())})

    cust = cust.map_batches(cast_nk, batch_format="pyarrow",
                            zero_copy_batch=True)
    cust = cust.map_batches(
        broadcast_join_stage(nat_ref, "c_nationkey",
                             ["n_name", "n_regionkey"]),
        batch_format="pyarrow", zero_copy_batch=True)
    cust_ref = broadcast_lookup(cust, "c_custkey",
                                ["n_name", "n_regionkey"])
    reg = read(sf_dir, "region")
    rnames = dict(zip(reg.to_pandas().r_regionkey.tolist(),
                      reg.to_pandas().r_name.tolist()))

    orders = read(sf_dir, "orders", columns=["o_custkey", "o_totalprice"])

    def partial(t: pa.Table) -> pa.Table:
        t = pa.table({"o_custkey": t.column("o_custkey"),
                      "cents": _cents(t.column("o_totalprice"))})
        t = broadcast_join_stage(cust_ref, "o_custkey",
                                 ["n_name", "n_regionkey"])(t)
        g = t.group_by(["n_name", "n_regionkey"]).aggregate(
            [("cents", "sum")])
        return pa.table({"n_name": g.column("n_name"),
                         "rk": g.column("n_regionkey"),
                         "cents": g.column("cents_sum")})

    agg: dict[tuple[str, int], int] = {}
    for b in orders.map_batches(partial, batch_format="pyarrow",
                                zero_copy_batch=True) \
            .iter_batches(batch_format="pyarrow"):  # |nations|-bounded
        for n, rk, c in zip(b.column("n_name").to_pylist(),
                            b.column("rk").to_pylist(),
                            b.column("cents").to_pylist()):
            agg[(n, rk)] = agg.get((n, rk), 0) + c
    region_tot: dict[int, int] = {}
    for (n, rk), c in agg.items():
        region_tot[rk] = region_tot.get(rk, 0) + c
    keys = sorted(agg)
    return rd.from_arrow(pa.table({
        "region": pa.array([rnames[rk] for (_n, rk) in keys],
                           pa.string()),
        "nation": pa.array([n for (n, _rk) in keys], pa.string()),
        "revenue": _uncents(pa.array([agg[k] for k in keys],
                                     pa.int64())),
        "share_ppm": pa.array(
            [agg[k] * 1_000_000 // region_tot[k[1]] for k in keys],
            pa.int64())}))


def events_attribution_linear(sf_dir: str, window_hours: int = 24):
    """LINEAR multi-touch attribution (the other standard model next
    to events_attribution_last_touch): every click/view inside the
    purchase's lookback window shares the credit equally —
    credit_ppm = 1_000_000 // n_touches per touch, aggregated per
    TOUCH TYPE (total credited purchases and summed ppm credit).
    Window counting reuses the band-join two-searchsorted shape (one
    user co-location, no interval expansion); per purchase the window
    [t - w, t) in strict sequence order splits between the two touch
    types via THREE binary searches, so the per-type partials are
    |types|-bounded and no credit row stream ever materializes."""
    ev = read(sf_dir, "events", columns=["event_id", "user_id", "ts",
                                         "event_type"])
    w_us = np.int64(window_hours) * 3_600_000_000

    def fold(part: pa.Table) -> pa.Table:
        empty = pa.table({"touch_type": pa.array([], pa.string()),
                          "n_purchases": pa.array([], pa.int64()),
                          "credit_ppm": pa.array([], pa.int64())})
        if part.num_rows == 0:
            return empty
        u = part.column("user_id").to_numpy()
        ts = pc.cast(part.column("ts"), pa.timestamp("us")) \
            .to_numpy().view(np.int64)
        eid = part.column("event_id").to_numpy()
        ty = part.column("event_type")
        if isinstance(ty, pa.ChunkedArray):
            ty = ty.combine_chunks()

        def leg(name):
            m = pc.equal(ty, pa.scalar(name)) \
                .to_numpy(zero_copy_only=False)
            lu, lt, le = u[m], ts[m], eid[m]
            order = np.lexsort((le, lt, lu))
            return lu[order], lt[order], le[order]

        pu, pt, pe = leg("purchase")
        if pu.size == 0:
            return empty
        agg: dict[str, list[int]] = {"click": [0, 0], "view": [0, 0]}
        legs = {name: leg(name) for name in ("click", "view")}

        def count_window(lu, lt, le, i):
            a = np.searchsorted(lu, pu[i], side="left")
            b = np.searchsorted(lu, pu[i], side="right")
            if a == b:
                return 0
            lo = a + np.searchsorted(lt[a:b], pt[i] - w_us, side="left")
            # strictly before the purchase in (ts, eid) order
            hi = a + np.searchsorted(lt[a:b], pt[i], side="left")
            j = hi
            while j < b and lt[j] == pt[i] and le[j] < pe[i]:
                j += 1
            return j - lo

        for i in range(pu.size):  # purchases loop; O(log) work each
            n_click = count_window(*legs["click"], i)
            n_view = count_window(*legs["view"], i)
            n = n_click + n_view
            if n == 0:
                continue
            ppm = 1_000_000 // n
            if n_click:
                agg["click"][0] += 1
                agg["click"][1] += ppm * n_click
            if n_view:
                agg["view"][0] += 1
                agg["view"][1] += ppm * n_view
        keys = [k for k in sorted(agg) if agg[k][0]]
        return pa.table({
            "touch_type": pa.array(keys, pa.string()),
            "n_purchases": pa.array([agg[k][0] for k in keys],
                                    pa.int64()),
            "credit_ppm": pa.array([agg[k][1] for k in keys],
                                   pa.int64())})

    parts = partitioned_map_groups(ev, "user_id", fold)
    agg: dict[str, list[int]] = {}
    for b in parts.iter_batches(batch_format="pyarrow"):  # |types|
        for t, n, c in zip(b.column("touch_type").to_pylist(),
                           b.column("n_purchases").to_pylist(),
                           b.column("credit_ppm").to_pylist()):
            e = agg.setdefault(t, [0, 0])
            e[0] += n
            e[1] += c
    import ray.data as rd
    keys = sorted(agg)
    return rd.from_arrow(pa.table({
        "touch_type": pa.array(keys, pa.string()),
        "n_purchases": pa.array([agg[k][0] for k in keys], pa.int64()),
        "credit_ppm": pa.array([agg[k][1] for k in keys], pa.int64())}))
