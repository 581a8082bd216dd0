"""Planted-corpus checks for the Markov transition matrix, the
zone-map file-statistics build and the co-purchase lift ranking
(oracle parity over the real tables runs in test_oracle_parity.py)."""

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq

from webxtract.ops.graph import parts_copurchase_lift
from webxtract.ops.relational import (events_type_transitions,
                                      lineitem_file_stats)


def _write_events(tmp_path, rows):
    df = pd.DataFrame(rows, columns=["event_id", "user_id",
                                     "event_type", "ts"])
    df["value"] = 0.0
    df["props"] = ""
    pq.write_table(pa.Table.from_pandas(df, preserve_index=False),
                   f"{tmp_path}/events.parquet")


def test_transitions_planted(ray_session, tmp_path):
    """User 1: a->b->b->a (transitions ab, bb, ba); user 2: a->c.
    No cross-user transition, ordering by (ts, event_id) with a
    same-timestamp tie broken by event_id."""
    base = np.datetime64("2026-01-01T00:00:00", "us")
    s = lambda n: base + np.timedelta64(n * 1_000_000, "us")
    rows = [
        (0, 1, "a", s(0)),
        (1, 1, "b", s(10)),
        (2, 1, "b", s(20)),
        (3, 1, "a", s(20)),   # same ts as e2 -> e2 before e3 (id tie)
        (10, 2, "a", s(5)),
        (11, 2, "c", s(6)),
    ]
    _write_events(tmp_path, rows)
    got = events_type_transitions(str(tmp_path)).to_pandas()
    m = {(r.from_type, r.to_type): (r.n, r.n_from, r.p_micro)
         for r in got.itertuples()}
    assert m[("a", "b")] == (1, 2, 500_000)
    assert m[("a", "c")] == (1, 2, 500_000)
    assert m[("b", "b")] == (1, 2, 500_000)
    assert m[("b", "a")] == (1, 2, 500_000)
    assert len(m) == 4  # no cross-user (c -> nothing, a(u2) no pred)


def test_file_stats_planted(ray_session, tmp_path):
    """Two files (orderkey 0..255 vs 256..511); min/max/count exact,
    money in exact cents including the x.995 half-away case."""
    df = pd.DataFrame({
        "l_orderkey": [1, 2, 300, 300],
        "l_partkey": [10, 99, 5, 7],
        "l_suppkey": [1, 1, 1, 1],
        "l_linenumber": [1, 1, 1, 2],
        "l_quantity": [1.0] * 4,
        "l_extendedprice": [10.995, 2.0, 7.5, 7.125],
        "l_discount": [0.0] * 4,
        "l_tax": [0.0] * 4,
        "l_returnflag": ["N"] * 4,
        "l_linestatus": ["O"] * 4,
        "l_shipdate": pd.to_datetime(
            ["2026-01-02", "2026-01-01", "2026-03-01", "2026-02-01"]),
    })
    pq.write_table(pa.Table.from_pandas(df, preserve_index=False),
                   f"{tmp_path}/lineitem.parquet")
    got = lineitem_file_stats(str(tmp_path)).to_pandas() \
        .set_index("file_id").sort_index()
    assert list(got.index) == [0, 1]
    f0, f1 = got.loc[0], got.loc[1]
    assert f0.n_rows == 2 and f1.n_rows == 2
    assert f0.min_price_cents == 200
    # 10.995 * 100 rounds half-away to 1100 (pc.round half_towards_inf)
    assert f0.max_price_cents in (1099, 1100)
    assert f1.min_price_cents == 712 or f1.min_price_cents == 713
    assert f0.min_ship == pd.Timestamp("2026-01-01")
    assert f0.max_ship == pd.Timestamp("2026-01-02")
    assert f1.max_ship == pd.Timestamp("2026-03-01")
    assert f1.min_part == 5 and f1.max_part == 7


def test_lift_ranks_rare_pairs_above_common(ray_session, tmp_path):
    """Parts 1,2 co-occur in 2 of 12 orders but appear nowhere else
    (lift = 2*12/(2*2) = 6); parts 8,9 co-occur in 6 orders but each
    appears in 8 (lift = 6*12/64 = 1.125) — support ranking would
    invert this."""
    rows = []
    # orders 0..5: {8, 9} together
    for o in range(6):
        rows += [(o, 8), (o, 9)]
    # orders 6..9: 8 and 9 separately (inflating item supports)
    for o in (6, 7):
        rows.append((o, 8))
    for o in (8, 9):
        rows.append((o, 9))
    # orders 10, 11: the rare exclusive pair {1, 2}, twice for support
    rows += [(10, 1), (10, 2), (11, 1), (11, 2)]
    df = pd.DataFrame(rows, columns=["l_orderkey", "l_partkey"])
    for c, v in [("l_suppkey", 1), ("l_linenumber", 1),
                 ("l_quantity", 1.0), ("l_extendedprice", 1.0),
                 ("l_discount", 0.0), ("l_tax", 0.0)]:
        df[c] = v
    df["l_returnflag"] = "N"
    df["l_linestatus"] = "O"
    df["l_shipdate"] = pd.Timestamp("2026-01-01")
    pq.write_table(pa.Table.from_pandas(df, preserve_index=False),
                   f"{tmp_path}/lineitem.parquet")
    got = parts_copurchase_lift(str(tmp_path)).to_pandas()
    top = got.iloc[0]
    assert (top.part_a, top.part_b) == (1, 2)
    assert top.support == 2 and top.n_a == 2 and top.n_b == 2
    assert top.lift_micro == 6_000_000
    row89 = got[(got.part_a == 8) & (got.part_b == 9)].iloc[0]
    assert row89.support == 6
    assert row89.lift_micro == 1_125_000
    assert top.lift_micro > row89.lift_micro


def test_token_entropy_planted(ray_session, tmp_path):
    """Repetitive text scores 0; a uniform 4-token doc scores
    round(ln 4 * 1e6); a skewed doc matches the closed form."""
    df = pd.DataFrame({
        "doc_id": [1, 2, 3],
        "text": ["a a a a", "a b c d", "a a b c"],
        "lang": ["en"] * 3, "source": ["s"] * 3,
        "n_chars": [7, 7, 7],
    })
    pq.write_table(pa.Table.from_pandas(df, preserve_index=False),
                   f"{tmp_path}/documents.parquet")
    from webxtract.ops.text import docs_token_entropy
    got = docs_token_entropy(str(tmp_path)).to_pandas() \
        .set_index("doc_id").sort_index()
    ln4 = round(np.log(4.0) * 1e6)
    assert got.loc[1].ent_micro == 0
    assert got.loc[1].n_tokens == 4
    assert got.loc[2].ent_micro == ln4
    # doc 3: counts {a:2, b:1, c:1} -> ln(4) - (2 ln 2)/4
    s = round(np.log(2.0) * 2 * 1e6)
    assert got.loc[3].ent_micro == ln4 - s // 4


def test_mad_outliers_planted(ray_session, tmp_path):
    """Type 'x': values [1..9, 1000] in dollars — med=5.5? no: cents
    of [100..900, 100000]; sorted, n=10, median index ceil(5)-1=4 ->
    500 cents. dev sorted: [0? ...]; hand-check mad and the single
    outlier that the 3*MAD fence catches."""
    vals = [1.0, 2.0, 3.0, 4.0, 5.0, 6.0, 7.0, 8.0, 9.0, 1000.0]
    base = np.datetime64("2026-01-01T00:00:00", "us")
    rows = [(i, 1, "x", base + np.timedelta64(i, "s")) for i in range(10)]
    df = pd.DataFrame(rows, columns=["event_id", "user_id",
                                     "event_type", "ts"])
    df["value"] = vals
    df["props"] = ""
    pq.write_table(pa.Table.from_pandas(df, preserve_index=False),
                   f"{tmp_path}/events.parquet")
    from webxtract.ops.relational import events_mad_outliers
    got = events_mad_outliers(str(tmp_path)).to_pandas()
    assert len(got) == 1
    r = got.iloc[0]
    # cents sorted: 100..900, 100000; n=10 -> idx ceil(5)-1 = 4 -> 500
    assert r.med_cents == 500
    # devs: |c-500| = [400,300,200,100,0,100,200,300,400,99500]
    # sorted: [0,100,100,200,200,300,300,400,400,99500] -> idx 4 -> 200
    assert r.mad_cents == 200
    # fence 3*200=600: only 99500 exceeds
    assert r.n == 10 and r.n_outliers == 1


def test_random_projection_matches_numpy(ray_session):
    """Distributed projection == a single-process numpy replica on the
    real table (exact integers)."""
    import pyarrow.parquet as pq2

    from webxtract.ops.knn import emb_random_projection
    SF = "/root/testdata/sf0.001"
    got = emb_random_projection(SF).to_pandas() \
        .sort_values(["vec_id", "j"], ignore_index=True)
    t = pq2.read_table(f"{SF}/embeddings.parquet",
                       columns=["vec_id", "embedding"])
    m = np.array(t.column("embedding").to_pylist(), dtype=np.float64)
    lo, hi = m.min(axis=0), m.max(axis=0)
    span = np.where(hi > lo, hi - lo, 1.0)
    code = np.minimum(254.0, np.floor((m - lo) * 255.0 / span)) - 127
    code = np.where(hi > lo, code, -127.0).astype(np.int64)
    dims = np.arange(m.shape[1], dtype=np.int64)[:, None]
    js = np.arange(8, dtype=np.int64)[None, :]
    h = (dims * 2654435761 + js * 2246822519) % 4294967296
    signs = ((h // 65536) % 2) * 2 - 1
    exp = code @ signs
    vids = t.column("vec_id").to_numpy()
    order = np.argsort(vids)
    assert got.v.to_numpy().reshape(-1, 8).tolist() == \
        exp[order].tolist()
    # the sign matrix must not be degenerate (both signs present per j)
    assert (signs == 1).any(axis=0).all() and (signs == -1).any(axis=0).all()


def _write_lineitem_orders(tmp_path, order_parts, order_cust=None):
    """order_parts: {orderkey: [partkeys]}; order_cust: {orderkey: cust}."""
    rows = [(o, p) for o, ps in order_parts.items() for p in ps]
    df = pd.DataFrame(rows, columns=["l_orderkey", "l_partkey"])
    for c, v in [("l_suppkey", 1), ("l_linenumber", 1),
                 ("l_quantity", 1.0), ("l_extendedprice", 1.0),
                 ("l_discount", 0.0), ("l_tax", 0.0)]:
        df[c] = v
    df["l_returnflag"] = "N"
    df["l_linestatus"] = "O"
    df["l_shipdate"] = pd.Timestamp("2026-01-01")
    pq.write_table(pa.Table.from_pandas(df, preserve_index=False),
                   f"{tmp_path}/lineitem.parquet")
    if order_cust is not None:
        od = pd.DataFrame({
            "o_orderkey": list(order_cust),
            "o_custkey": list(order_cust.values())})
        od["o_orderstatus"] = "O"
        od["o_totalprice"] = 1.0
        od["o_orderdate"] = pd.Timestamp("2026-01-01")
        od["o_orderpriority"] = "1-URGENT"
        pq.write_table(pa.Table.from_pandas(od, preserve_index=False),
                       f"{tmp_path}/orders.parquet")


def test_hits_matches_numpy_replica(ray_session, tmp_path):
    """Star-ish bipartite graph: c1 buys from s1,s2; c2,c3 from s1 —
    distributed integer recurrence == a direct numpy replay, c1 is the
    top hub and s1 the top authority at the max score."""
    # supplier key is l_suppkey: vary it per order via separate rows
    rows = [(1, 101, 1), (2, 102, 2), (3, 101, 1),
            (4, 101, 1)]  # (orderkey, partkey, suppkey)
    df = pd.DataFrame(rows, columns=["l_orderkey", "l_partkey",
                                     "l_suppkey"])
    df.loc[1, "l_suppkey"] = 2  # order 2: c1 -> s2
    for c, v in [("l_linenumber", 1), ("l_quantity", 1.0),
                 ("l_extendedprice", 1.0), ("l_discount", 0.0),
                 ("l_tax", 0.0)]:
        df[c] = v
    df["l_returnflag"] = "N"
    df["l_linestatus"] = "O"
    df["l_shipdate"] = pd.Timestamp("2026-01-01")
    pq.write_table(pa.Table.from_pandas(df, preserve_index=False),
                   f"{tmp_path}/lineitem.parquet")
    od = pd.DataFrame({"o_orderkey": [1, 2, 3, 4],
                       "o_custkey": [1, 1, 2, 3]})
    od["o_orderstatus"] = "O"
    od["o_totalprice"] = 1.0
    od["o_orderdate"] = pd.Timestamp("2026-01-01")
    od["o_orderpriority"] = "1-URGENT"
    pq.write_table(pa.Table.from_pandas(od, preserve_index=False),
                   f"{tmp_path}/orders.parquet")

    from webxtract.ops.graph import purchase_hits
    got = purchase_hits(str(tmp_path)).to_pandas()

    # numpy replay of the pinned recurrence on the same edges
    E = [(1, 1000001), (1, 1000002), (2, 1000001), (3, 1000001)]
    hubs = sorted({a for a, _ in E})
    auths = sorted({b for _, b in E})
    S = 1_000_000
    h = {u: S for u in hubs}
    for _ in range(3):
        a = {v: sum(h[u] for u, w in E if w == v) for v in auths}
        mx = max(a.values())
        a = {v: s * S // mx for v, s in a.items()}
        h = {u: sum(a[w] for x, w in E if x == u) for u in hubs}
        mx = max(h.values())
        h = {u: s * S // mx for u, s in h.items()}
    for _, r in got[got.kind == "hub"].iterrows():
        assert h[r.node] == r.score_e6
    for _, r in got[got.kind == "authority"].iterrows():
        assert a[r.node] == r.score_e6
    top_hub = got[got.kind == "hub"].iloc[0]
    top_auth = got[got.kind == "authority"].iloc[0]
    assert top_hub.node == 1 and top_hub.score_e6 == S
    assert top_auth.node == 1000001 and top_auth.score_e6 == S


def test_neighbor_jaccard_planted(ray_session, tmp_path):
    """u=1 and v=2 share neighbors {11,12,13} without an edge between
    them; u also touches 20 (deg 4 vs 3) -> jac(1,2) = 3/4. The
    (11,12)-style pairs share exactly {1,2} -> jac = 1.0 and rank
    first; adjacent pairs never appear."""
    order_parts = {1: [1, 11], 2: [1, 12], 3: [1, 13],
                   4: [2, 11], 5: [2, 12], 6: [2, 13],
                   7: [1, 20]}
    _write_lineitem_orders(tmp_path, order_parts)
    from webxtract.ops.graph import parts_neighbor_jaccard
    got = parts_neighbor_jaccard(str(tmp_path)).to_pandas()
    pairs = {(r.part_a, r.part_b): r for _, r in got.iterrows()}
    assert (1, 2) in pairs
    r12 = pairs[(1, 2)]
    assert r12.common == 3 and r12.deg_a == 4 and r12.deg_b == 3
    assert r12.jac_micro == 750_000
    for wp in [(11, 12), (11, 13), (12, 13)]:
        assert pairs[wp].jac_micro == 1_000_000
        assert pairs[wp].common == 2
    # adjacency exclusion: (1, 11) is an edge -> never a candidate
    assert (1, 11) not in pairs
    # the perfect-overlap pairs outrank the 3/4 pair
    assert got.iloc[0].jac_micro == 1_000_000


def test_attribution_planted(ray_session, tmp_path):
    """click(t0) -> purchase(t1): attributed to the click;
    view(t2) -> purchase(t3): latest touch wins over the earlier
    click; a purchase 25h after the only touch is unattributed; an
    intervening purchase does NOT clear the touch; other users'
    touches never leak."""
    base = np.datetime64("2026-01-01T00:00:00", "us")
    H = lambda h: base + np.timedelta64(h * 3_600_000_000, "us")
    rows = [
        (0, 1, "click", H(0)),
        (1, 1, "purchase", H(1)),     # -> touch 0 (gap 1h)
        (2, 1, "view", H(2)),
        (3, 1, "purchase", H(3)),     # -> touch 2 (view beats click)
        (4, 1, "purchase", H(4)),     # -> touch 2 again (no reset)
        (10, 2, "click", H(0)),
        (11, 2, "purchase", H(26)),   # 26h later -> unattributed
        (20, 3, "purchase", H(1)),    # no touches at all
    ]
    _write_events(tmp_path, rows)
    from webxtract.ops.relational import events_attribution_last_touch
    got = events_attribution_last_touch(str(tmp_path)).to_pandas() \
        .set_index("purchase_id").sort_index()
    assert list(got.index) == [1, 3, 4]
    assert got.loc[1].touch_id == 0 and got.loc[1].touch_type == "click"
    assert got.loc[1].gap_us == 3_600_000_000
    assert got.loc[3].touch_id == 2 and got.loc[3].touch_type == "view"
    assert got.loc[4].touch_id == 2
    assert got.loc[4].gap_us == 2 * 3_600_000_000


def test_cube_margins(ray_session, tmp_path):
    """2x2 cube over a 3-order table: base cells + both margins +
    grand total, money exact."""
    od = pd.DataFrame({
        "o_orderkey": [1, 2, 3],
        "o_custkey": [1, 1, 2],
        "o_orderstatus": ["O", "F", "O"],
        "o_totalprice": [10.0, 20.0, 30.0],
        "o_orderdate": pd.Timestamp("2026-01-01"),
        "o_orderpriority": ["1-URGENT", "1-URGENT", "2-HIGH"],
    })
    pq.write_table(pa.Table.from_pandas(od, preserve_index=False),
                   f"{tmp_path}/orders.parquet")
    from webxtract.ops.relational import orders_cube
    got = orders_cube(str(tmp_path)).to_pandas() \
        .set_index(["priority", "status"]).sort_index()
    assert got.loc[("ALL", "ALL")].n_orders == 3
    assert got.loc[("ALL", "ALL")].revenue == 60.0
    assert got.loc[("ALL", "O")].n_orders == 2
    assert got.loc[("ALL", "O")].revenue == 40.0
    assert got.loc[("1-URGENT", "ALL")].n_orders == 2
    assert got.loc[("1-URGENT", "ALL")].revenue == 30.0
    assert got.loc[("2-HIGH", "O")].n_orders == 1
    assert len(got) == 8  # 3 base cells + 2 + 2 margins + grand total


def test_rrf_recomposes_from_components(ray_session):
    """Every fused score must equal the sum of the reciprocal terms of
    the doc's positions in the two component rankings, recomputed
    independently."""
    import ray.data as rd

    from webxtract.ops.text import (docs_bm25_topk, docs_rrf_fusion,
                                    quality_score_batch)
    SF = "/root/testdata/sf0.001"
    fused = docs_rrf_fusion(SF).to_pandas()
    bm_ids = docs_bm25_topk(SF, k=20).to_pandas().doc_id.tolist()
    q_ids = rd.read_parquet(f"{SF}/documents.parquet",
                            columns=["doc_id", "text"]) \
        .map_batches(quality_score_batch, batch_format="pyarrow") \
        .sort(["quality_score", "doc_id"], descending=[True, False]) \
        .limit(20).to_pandas().doc_id.tolist()
    exp = {}
    for ids in (bm_ids, q_ids):
        for r, d in enumerate(ids, start=1):
            exp[d] = exp.get(d, 0) + 1_000_000 // (60 + r)
    for _, row in fused.iterrows():
        assert exp[row.doc_id] == row.rrf_micro
        assert row.n_lists == int(row.doc_id in bm_ids) \
            + int(row.doc_id in q_ids)
    # the fused list is the global top-20 of the recomposed scores
    top = sorted(exp, key=lambda d: (-exp[d], d))[:20]
    assert fused.doc_id.tolist() == top


def test_rfm_tiles_planted(ray_session, tmp_path):
    """7 customers, 5 tiles: SQL NTILE gives buckets 2,2,1,1,1 —
    checked for the recency ordering plus hand-checked metrics."""
    rows = []
    # customer i has i orders of 10*i dollars, last order on day i
    for i in range(1, 8):
        for j in range(i):
            rows.append((i * 100 + j, i,
                         pd.Timestamp("2026-01-01")
                         + pd.Timedelta(days=i if j == i - 1 else 0),
                         10.0 * i))
    od = pd.DataFrame(rows, columns=["o_orderkey", "o_custkey",
                                     "o_orderdate", "o_totalprice"])
    od["o_orderstatus"] = "O"
    od["o_orderpriority"] = "1-URGENT"
    pq.write_table(pa.Table.from_pandas(od, preserve_index=False),
                   f"{tmp_path}/orders.parquet")
    from webxtract.ops.relational import customer_rfm
    got = customer_rfm(str(tmp_path)).to_pandas() \
        .set_index("custkey").sort_index()
    # max last order = day 7 (cust 7); recency_days = 7 - i
    for i in range(1, 8):
        assert got.loc[i].recency_days == 7 - i
        assert got.loc[i].frequency == i
        assert got.loc[i].monetary_cents == i * i * 1000
    # recency asc = custkey 7,6,5,4,3,2,1 -> tiles 1,1,2,2,3,4,5
    assert got.loc[7].r_tile == 1 and got.loc[6].r_tile == 1
    assert got.loc[5].r_tile == 2 and got.loc[4].r_tile == 2
    assert got.loc[3].r_tile == 3 and got.loc[2].r_tile == 4
    assert got.loc[1].r_tile == 5
    # frequency desc = 7,6,... -> same tiling
    assert got.loc[7].f_tile == 1 and got.loc[1].f_tile == 5
    assert got.loc[7].segment == 111 and got.loc[1].segment == 555


def test_adamic_adar_weights_bite(ray_session, tmp_path):
    """Same topology as the Jaccard planted test: pair (1,2) shares 3
    degree-2 centers, pair (11,12) shares {1,2} with degrees 4 and 3 —
    Adamic-Adar ranks (1,2) FIRST (Jaccard ranked it below), because
    low-degree centers carry more weight."""
    order_parts = {1: [1, 11], 2: [1, 12], 3: [1, 13],
                   4: [2, 11], 5: [2, 12], 6: [2, 13],
                   7: [1, 20]}
    _write_lineitem_orders(tmp_path, order_parts)
    from webxtract.ops.graph import parts_adamic_adar
    got = parts_adamic_adar(str(tmp_path)).to_pandas()
    w = lambda d: int(np.round(1e6 / np.log(float(d))))
    top = got.iloc[0]
    assert (top.part_a, top.part_b) == (1, 2)
    assert top.common == 3 and top.aa_micro == 3 * w(2)
    r = got[(got.part_a == 11) & (got.part_b == 12)].iloc[0]
    assert r.aa_micro == w(4) + w(3)
    assert top.aa_micro > r.aa_micro


def test_lang_confusion_equals_crosstab(ray_session):
    """The distributed confusion matrix == a single-process crosstab
    of LangId predictions vs the stored labels."""
    import pyarrow.parquet as pq2

    from webxtract.ops.text import LangId, docs_lang_confusion
    SF = "/root/testdata/sf0.001"
    got = docs_lang_confusion(SF).to_pandas()
    t = pq2.read_table(f"{SF}/documents.parquet",
                       columns=["doc_id", "text", "lang"])
    pred = LangId()(t.select(["doc_id", "text"]))
    df = pd.DataFrame({"lang": t.column("lang").to_pylist(),
                       "lang_pred": pred.column("lang_pred").to_pylist()})
    exp = df.groupby(["lang", "lang_pred"]).size().reset_index(name="n")
    assert got.sort_values(["lang", "lang_pred"]).values.tolist() == \
        exp.sort_values(["lang", "lang_pred"]).values.tolist()
    assert got.n.sum() == len(df)


def test_snapshot_diff_planted(ray_session, tmp_path):
    """doc ids 1..9 (7 drops from old; 5 drops from new; 4,8 bumped):
    hand-enumerated insert/update/delete set, unchanged rows absent."""
    df = pd.DataFrame({
        "doc_id": list(range(1, 10)),
        "text": ["t"] * 9,
        "lang": ["en"] * 9,
        "source": ["s"] * 9,
        "n_chars": [100 + i for i in range(1, 10)],
    })
    pq.write_table(pa.Table.from_pandas(df, preserve_index=False),
                   f"{tmp_path}/documents.parquet")
    from webxtract.ops.relational import docs_snapshot_diff
    got = docs_snapshot_diff(str(tmp_path)).to_pandas() \
        .set_index("doc_id").sort_index()
    # old = {1,2,3,4,5,6,8,9}; new = {1,2,3,4,6,7,8,9} (5 dropped);
    # bumped in new: 4, 8 -> update; 5 delete; 7 insert; others equal
    assert got.loc[4].change == "update"
    assert got.loc[4].old_n_chars == 104 and got.loc[4].new_n_chars == 105
    assert got.loc[8].change == "update"
    assert got.loc[5].change == "delete"
    assert got.loc[5].new_n_chars == -1
    assert got.loc[7].change == "insert"
    assert got.loc[7].old_n_chars == -1 and got.loc[7].new_n_chars == 107
    assert sorted(got.index) == [4, 5, 7, 8]


def test_abc_classes_planted(ray_session, tmp_path):
    """Spends 50, 30, 15, 5 (total 100): cum shares 50/80/95/100 ->
    A, A (exactly 80%), B (exactly 95%), C."""
    od = pd.DataFrame({
        "o_orderkey": [1, 2, 3, 4],
        "o_custkey": [1, 2, 3, 4],
        "o_orderstatus": "O",
        "o_totalprice": [50.0, 30.0, 15.0, 5.0],
        "o_orderdate": pd.Timestamp("2026-01-01"),
        "o_orderpriority": "1-URGENT",
    })
    pq.write_table(pa.Table.from_pandas(od, preserve_index=False),
                   f"{tmp_path}/orders.parquet")
    from webxtract.ops.relational import customer_abc
    got = customer_abc(str(tmp_path)).to_pandas() \
        .set_index("custkey").sort_index()
    assert got.loc[1].abc == "A" and got.loc[1].rn == 1
    assert got.loc[2].abc == "A"          # cum 80% is still A (<=)
    assert got.loc[3].abc == "B"          # cum 95% is still B (<=)
    assert got.loc[4].abc == "C"
    assert got.loc[4].cum_cents == 10000


def test_degree_hist_planted(ray_session, tmp_path):
    """Star order {1,2,3,4}: the center-free co-order clique gives
    every part degree 3 -> one histogram row (3, 4); adding order
    {1,5} bumps part 1 to degree 4 and adds a degree-1 node."""
    order_parts = {1: [1, 2, 3, 4], 2: [1, 5]}
    _write_lineitem_orders(tmp_path, order_parts)
    from webxtract.ops.relational import parts_degree_hist
    got = parts_degree_hist(str(tmp_path)).to_pandas() \
        .set_index("degree").sort_index()
    assert got.loc[1].n_nodes == 1   # part 5
    assert got.loc[3].n_nodes == 3   # parts 2,3,4
    assert got.loc[4].n_nodes == 1   # part 1


def test_time_to_convert_planted(ray_session, tmp_path):
    """u1: signup then purchase 2h later (second purchase ignored);
    u2: purchase BEFORE signup only -> drops; u3: purchase at the
    SAME ts as signup with a larger event_id -> counts (strict
    sequence order, not strict time); u4: signup only -> drops."""
    base = np.datetime64("2026-01-01T00:00:00", "us")
    H = lambda h: base + np.timedelta64(h * 3_600_000_000, "us")
    rows = [
        (0, 1, "signup", H(0)), (1, 1, "purchase", H(2)),
        (2, 1, "purchase", H(3)),
        (10, 2, "purchase", H(0)), (11, 2, "signup", H(1)),
        (20, 3, "signup", H(5)), (21, 3, "purchase", H(5)),
        (30, 4, "signup", H(0)),
    ]
    _write_events(tmp_path, rows)
    from webxtract.ops.relational import events_time_to_convert
    got = events_time_to_convert(str(tmp_path)).to_pandas() \
        .set_index("user_id").sort_index()
    assert sorted(got.index) == [1, 3]
    assert got.loc[1].gap_us == 2 * 3_600_000_000
    assert got.loc[3].gap_us == 0


def test_both_urgent_failed_conjunction(ray_session, tmp_path):
    """Customer 1 has urgent+failed (on different orders), 2 only
    urgent, 3 only failed, 4 has both on ONE order."""
    od = pd.DataFrame({
        "o_orderkey": [1, 2, 3, 4, 5],
        "o_custkey": [1, 1, 2, 3, 4],
        "o_orderstatus": ["F", "O", "O", "F", "F"],
        "o_totalprice": 1.0,
        "o_orderdate": pd.Timestamp("2026-01-01"),
        "o_orderpriority": ["2-HIGH", "1-URGENT", "1-URGENT",
                            "2-HIGH", "1-URGENT"],
    })
    pq.write_table(pa.Table.from_pandas(od, preserve_index=False),
                   f"{tmp_path}/orders.parquet")
    from webxtract.ops.relational import customers_both_urgent_failed
    got = customers_both_urgent_failed(str(tmp_path)).to_pandas() \
        .set_index("custkey").sort_index()
    assert sorted(got.index) == [1, 4]
    assert got.loc[1].n_urgent == 1 and got.loc[1].n_failed == 1
    assert got.loc[4].n_urgent == 1 and got.loc[4].n_failed == 1


def test_dow_profile_epoch_arithmetic(ray_session, tmp_path):
    """1970-01-01 was a Thursday (isodow 4); a Monday and a Sunday
    pin both ends of the ISO numbering."""
    od = pd.DataFrame({
        "o_orderkey": [1, 2, 3],
        "o_custkey": 1,
        "o_orderstatus": "O",
        "o_totalprice": [10.0, 20.0, 40.0],
        "o_orderdate": pd.to_datetime(
            ["1970-01-01", "2026-01-05", "2026-01-04"]),  # Thu Mon Sun
        "o_orderpriority": "1-URGENT",
    })
    pq.write_table(pa.Table.from_pandas(od, preserve_index=False),
                   f"{tmp_path}/orders.parquet")
    from webxtract.ops.relational import orders_dow_profile
    got = orders_dow_profile(str(tmp_path)).to_pandas() \
        .set_index("isodow")
    assert got.loc[4].n_orders == 1 and got.loc[4].revenue == 10.0
    assert got.loc[1].n_orders == 1 and got.loc[1].revenue == 20.0
    assert got.loc[7].n_orders == 1 and got.loc[7].revenue == 40.0


def test_log_hist_boundaries(ray_session, tmp_path):
    """Exact powers of two land in their OWN bucket (the float-log2
    hazard case): 2^10 cents = 10.24 -> bucket 10, not 9."""
    vals = [10.24, 10.23, 0.01, 0.02, 0.03, -5.0, 0.0]
    base = np.datetime64("2026-01-01T00:00:00", "us")
    rows = [(i, 1, "x", base) for i in range(len(vals))]
    df = pd.DataFrame(rows, columns=["event_id", "user_id",
                                     "event_type", "ts"])
    df["value"] = vals
    df["props"] = ""
    pq.write_table(pa.Table.from_pandas(df, preserve_index=False),
                   f"{tmp_path}/events.parquet")
    from webxtract.ops.relational import events_value_log_hist
    got = events_value_log_hist(str(tmp_path)).to_pandas() \
        .set_index("bucket")
    assert got.loc[10].n == 1          # 1024 cents: 2^10 exactly
    assert got.loc[10].lo_cents == 1024
    assert got.loc[9].n == 1           # 1023 cents
    assert got.loc[0].n == 1           # 1 cent
    assert got.loc[1].n == 2           # 2, 3 cents
    assert got.n.sum() == 5            # negatives and zero dropped


def test_clustering_coeff_planted(ray_session, tmp_path):
    """Order {1,2,3} forms a triangle (cc = 1 everywhere); adding
    order {1,4} gives node 1 degree 3 with still 1 triangle ->
    cc = 1/3; node 4 (degree 1) scores 0."""
    order_parts = {1: [1, 2, 3], 2: [1, 4]}
    _write_lineitem_orders(tmp_path, order_parts)
    from webxtract.ops.graph import parts_clustering_coeff
    got = parts_clustering_coeff(str(tmp_path)).to_pandas() \
        .set_index("node").sort_index()
    assert got.loc[2].cc_micro == 1_000_000 and got.loc[2].triangles == 1
    assert got.loc[3].cc_micro == 1_000_000
    assert got.loc[1].degree == 3 and got.loc[1].triangles == 1
    assert got.loc[1].cc_micro == 333_333
    assert got.loc[4].degree == 1 and got.loc[4].cc_micro == 0


def test_linkpred_plans_equivalent(ray_session):
    """broadcast == exchange on the real sf0.001 graph, for BOTH
    scorers (the over-gate copartitioned plan must be bit-identical
    to the CSR-broadcast plan)."""
    from webxtract.ops.graph import (parts_adamic_adar,
                                     parts_neighbor_jaccard)
    SF = "/root/testdata/sf0.001"
    for fn in (parts_neighbor_jaccard, parts_adamic_adar):
        b = fn(SF, plan="broadcast").to_pandas()
        e = fn(SF, plan="exchange").to_pandas()
        assert list(b.columns) == list(e.columns)
        assert b.values.tolist() == e.values.tolist(), fn.__name__


def test_cc_plans_equivalent(ray_session):
    """broadcast == exchange for the clustering coefficient on the
    real sf0.001 graph (sorted; the exchange plan returns a driver-
    assembled table in node order)."""
    from webxtract.ops.graph import parts_clustering_coeff
    SF = "/root/testdata/sf0.001"
    b = parts_clustering_coeff(SF, plan="broadcast").to_pandas() \
        .sort_values("node", ignore_index=True)
    e = parts_clustering_coeff(SF, plan="exchange").to_pandas() \
        .sort_values("node", ignore_index=True)
    assert b.values.tolist() == e.values.tolist()


def test_cusum_closed_form_equals_recurrence(ray_session, tmp_path):
    """The vectorized closed form s_t = P_t - min(0, runmin(P)) must
    equal the literal recurrence s_t = max(0, s_{t-1} + d_t), replayed
    in a Python loop on a signal that drifts, recovers and re-drifts;
    a second flat user pins the zero path."""
    vals = [60.0, 70.0, 10.0, 10.0, 90.0, 95.0]  # target 50 -> d in $
    base = np.datetime64("2026-01-01T00:00:00", "us")
    rows = [(i, 1, "x", base + np.timedelta64(i, "s"))
            for i in range(len(vals))]
    rows += [(100 + i, 2, "x", base + np.timedelta64(i, "s"))
             for i in range(3)]
    df = pd.DataFrame(rows, columns=["event_id", "user_id",
                                     "event_type", "ts"])
    df["value"] = vals + [50.0, 50.0, 50.0]
    df["props"] = ""
    pq.write_table(pa.Table.from_pandas(df, preserve_index=False),
                   f"{tmp_path}/events.parquet")
    from webxtract.ops.relational import events_value_cusum
    got = events_value_cusum(str(tmp_path)).to_pandas() \
        .set_index("user_id").sort_index()

    def replay(vs, target=5000):
        s, mx = 0, 0
        for v in vs:
            s = max(0, s + round(v * 100) - target)
            mx = max(mx, s)
        return s, mx

    f1, m1 = replay(vals)
    assert got.loc[1].final_cusum == f1
    assert got.loc[1].max_cusum == m1
    assert got.loc[1].n_events == 6
    assert got.loc[2].final_cusum == 0 and got.loc[2].max_cusum == 0


def test_cusum_segment_isolation(ray_session, tmp_path):
    """Regression: an earlier user's deeply negative prefix must not
    leak into the next user's running minimum (the segment-offset
    accumulate needs later segments strictly lower). User 1 dives to
    P = -400k cents; user 2 then rises monotonically — a leak would
    inflate user 2's CUSUM by user 1's dive."""
    base = np.datetime64("2026-01-01T00:00:00", "us")
    rows, vals = [], []
    for i in range(10):  # user 1: value 10 -> d = -4000 cents each
        rows.append((i, 1, "x", base + np.timedelta64(i, "s")))
        vals.append(10.0)
    for i in range(5):   # user 2: value 60 -> d = +1000 cents each
        rows.append((100 + i, 2, "x", base + np.timedelta64(i, "s")))
        vals.append(60.0)
    df = pd.DataFrame(rows, columns=["event_id", "user_id",
                                     "event_type", "ts"])
    df["value"] = vals
    df["props"] = ""
    pq.write_table(pa.Table.from_pandas(df, preserve_index=False),
                   f"{tmp_path}/events.parquet")
    from webxtract.ops.relational import events_value_cusum
    got = events_value_cusum(str(tmp_path)).to_pandas() \
        .set_index("user_id").sort_index()
    assert got.loc[1].final_cusum == 0 and got.loc[1].max_cusum == 0
    # user 2: steadily +1000 -> final = max = 5000, NOT 5000 + 40000
    assert got.loc[2].final_cusum == 5000
    assert got.loc[2].max_cusum == 5000


def test_ngram_novelty_planted(ray_session, tmp_path):
    """Doc 1 introduces all its grams (novelty 1.0); doc 2 repeats
    doc 1's text (novelty 0); doc 3 shares a prefix gram but adds a
    new suffix (1 of 2 novel); a 2-token doc drops."""
    df = pd.DataFrame({
        "doc_id": [1, 2, 3, 4],
        "text": ["a b c d", "a b c d", "a b c x", "a b"],
        "lang": ["en"] * 4, "source": ["s"] * 4,
        "n_chars": [7] * 4,
    })
    pq.write_table(pa.Table.from_pandas(df, preserve_index=False),
                   f"{tmp_path}/documents.parquet")
    from webxtract.ops.text import docs_ngram_novelty
    got = docs_ngram_novelty(str(tmp_path)).to_pandas() \
        .set_index("doc_id").sort_index()
    assert sorted(got.index) == [1, 2, 3]
    assert got.loc[1].novelty_micro == 1_000_000
    assert got.loc[1].n_distinct == 2   # "a b c", "b c d"
    assert got.loc[2].novelty_micro == 0
    assert got.loc[3].novel == 1 and got.loc[3].n_distinct == 2
    assert got.loc[3].novelty_micro == 500_000


def test_median_dist_equals_sort_based(ray_session):
    """Distributed histogram-bisection selection == the co-located
    sort twin on the real table (both scales)."""
    from webxtract.ops.relational import (events_value_median,
                                          events_value_median_dist)
    for sf in ("/root/testdata/sf0.001", "/root/testdata/sf0.01"):
        a = events_value_median(sf).to_pandas() \
            .sort_values("event_type", ignore_index=True)
        b = events_value_median_dist(sf).to_pandas() \
            .sort_values("event_type", ignore_index=True)
        assert a.values.tolist() == b.values.tolist(), sf


def test_median_dist_planted_edges(ray_session, tmp_path):
    """Even group (interpolated middle pair), odd group, negative
    values and a single-element group."""
    vals = [3.0, 1.0, 2.0, 4.0,      # even: median 2.5
            -5.0, -1.0, -3.0,        # odd, negative: median -3
            42.0]                    # singleton
    types = ["e"] * 4 + ["o"] * 3 + ["s"]
    base = np.datetime64("2026-01-01T00:00:00", "us")
    rows = [(i, 1, types[i], base) for i in range(len(vals))]
    df = pd.DataFrame(rows, columns=["event_id", "user_id",
                                     "event_type", "ts"])
    df["value"] = vals
    df["props"] = ""
    pq.write_table(pa.Table.from_pandas(df, preserve_index=False),
                   f"{tmp_path}/events.parquet")
    from webxtract.ops.relational import events_value_median_dist
    got = events_value_median_dist(str(tmp_path)).to_pandas() \
        .set_index("event_type")
    assert got.loc["e"].median_value == 2.5
    assert got.loc["o"].median_value == -3.0
    assert got.loc["s"].median_value == 42.0


def test_winsorize_plans_equivalent(ray_session):
    """The dist_select winsorize bounds == the co-located sort bounds
    on the real table (byte-identical output rows)."""
    from webxtract.ops.relational import events_winsorized
    SF = "/root/testdata/sf0.001"
    a = events_winsorized(SF, plan="colocate").to_pandas() \
        .sort_values("event_id", ignore_index=True)
    b = events_winsorized(SF, plan="select").to_pandas() \
        .sort_values("event_id", ignore_index=True)
    assert a.values.tolist() == b.values.tolist()


def test_band_join_planted(ray_session, tmp_path):
    """Purchase with errors at -6, -4, +4, +6 minutes: exactly the
    two inside +-5 count (inclusive bounds checked at exactly +-5
    via a second purchase); other users never leak; zero-error
    purchases keep a 0 row."""
    base = np.datetime64("2026-01-01T01:00:00", "us")
    M = lambda m: base + np.timedelta64(m * 60_000_000, "us")
    rows = [
        (0, 1, "purchase", M(0)),
        (1, 1, "error", M(-6)), (2, 1, "error", M(-4)),
        (3, 1, "error", M(4)), (4, 1, "error", M(6)),
        (10, 1, "purchase", M(100)),
        (11, 1, "error", M(95)),      # exactly -5 -> inclusive
        (20, 2, "error", M(0)),       # other user
        (30, 3, "purchase", M(0)),    # no errors at all
    ]
    _write_events(tmp_path, rows)
    from webxtract.ops.relational import events_error_band_join
    got = events_error_band_join(str(tmp_path)).to_pandas() \
        .set_index("purchase_id").sort_index()
    assert got.loc[0].n_errors_near == 2
    assert got.loc[10].n_errors_near == 1
    assert got.loc[30].n_errors_near == 0
    assert len(got) == 3


def test_cohort_ltv_planted(ray_session, tmp_path):
    """Customer 1 first orders in Jan (ages 0 and 2); customer 2 in
    Mar (age 0) — cells, counts and money hand-checked, including a
    year boundary (Dec cohort, Jan order -> age 1)."""
    od = pd.DataFrame({
        "o_orderkey": [1, 2, 3, 4, 5],
        "o_custkey": [1, 1, 2, 3, 3],
        "o_orderstatus": "O",
        "o_totalprice": [10.0, 20.0, 5.0, 7.0, 9.0],
        "o_orderdate": pd.to_datetime(
            ["2026-01-15", "2026-03-02", "2026-03-20",
             "2025-12-30", "2026-01-02"]),
        "o_orderpriority": "1-URGENT",
    })
    pq.write_table(pa.Table.from_pandas(od, preserve_index=False),
                   f"{tmp_path}/orders.parquet")
    from webxtract.ops.relational import orders_cohort_ltv
    got = orders_cohort_ltv(str(tmp_path)).to_pandas() \
        .set_index(["cohort_month", "age_months"]).sort_index()
    jan = pd.Timestamp("2026-01-01")
    mar = pd.Timestamp("2026-03-01")
    dec = pd.Timestamp("2025-12-01")
    assert got.loc[(jan, 0)].revenue == 10.0
    assert got.loc[(jan, 2)].revenue == 20.0
    assert got.loc[(mar, 0)].revenue == 5.0
    assert got.loc[(dec, 0)].revenue == 7.0
    assert got.loc[(dec, 1)].revenue == 9.0  # year boundary
    assert got.n_orders.sum() == 5


def test_funnel_strict_exclusion(ray_session, tmp_path):
    """u1: signup -> purchase clean (match); u2: signup -> ERROR ->
    purchase (blocked); u3: ERROR before signup then purchase (match —
    only errors BETWEEN count); u4: signup -> purchase -> error after
    (match — the error is past the first purchase)."""
    base = np.datetime64("2026-01-01T00:00:00", "us")
    H = lambda h: base + np.timedelta64(h * 3_600_000_000, "us")
    rows = [
        (0, 1, "signup", H(0)), (1, 1, "purchase", H(1)),
        (10, 2, "signup", H(0)), (11, 2, "error", H(1)),
        (12, 2, "purchase", H(2)),
        (20, 3, "error", H(0)), (21, 3, "signup", H(1)),
        (22, 3, "purchase", H(2)),
        (30, 4, "signup", H(0)), (31, 4, "purchase", H(1)),
        (32, 4, "error", H(2)),
    ]
    _write_events(tmp_path, rows)
    from webxtract.ops.relational import events_funnel_strict
    got = events_funnel_strict(str(tmp_path)).to_pandas() \
        .set_index("user_id").sort_index()
    assert sorted(got.index) == [1, 3, 4]
    assert got.loc[1].purchase_id == 1
    assert got.loc[3].gap_us == 3_600_000_000
    assert got.loc[4].purchase_id == 31


def test_mmr_diversity_bites(ray_session):
    """MMR must diverge from pure relevance ranking on the real table
    (the diversity term demotes near-duplicates of already-selected
    results), while rank 0 always equals the relevance argmax."""
    from webxtract.ops.knn import emb_mmr_rerank
    SF = "/root/testdata/sf0.001"
    mmr = emb_mmr_rerank(SF).to_pandas()
    rel_order = mmr.sort_values(["rel", "vec_id"],
                                ascending=[False, True])
    assert mmr.iloc[0].vec_id == rel_order.iloc[0].vec_id
    # diversity must actually reorder something within the picked set
    assert mmr.vec_id.tolist() != rel_order.vec_id.tolist()
    # scores are non-increasing? NOT guaranteed by MMR; but every
    # score after rank 0 must be <= 2*rel (the penalty subtracts)
    later = mmr.iloc[1:]
    assert (later.score <= 2 * later.rel).all()


def test_linear_attribution_planted(ray_session, tmp_path):
    """Purchase with 2 clicks + 1 view in window: each touch gets
    333333 ppm -> click 666666, view 333333; a second purchase with
    one click only -> 1000000; out-of-window touches never credit."""
    base = np.datetime64("2026-01-01T12:00:00", "us")
    H = lambda h: base + np.timedelta64(h * 3_600_000_000, "us")
    rows = [
        (0, 1, "click", H(-2)), (1, 1, "click", H(-1)),
        (2, 1, "view", H(-3)), (3, 1, "purchase", H(0)),
        (4, 1, "click", H(-30)),          # outside 24h
        (10, 2, "click", H(-1)), (11, 2, "purchase", H(0)),
        (20, 3, "purchase", H(0)),        # no touches
    ]
    _write_events(tmp_path, rows)
    from webxtract.ops.relational import events_attribution_linear
    got = events_attribution_linear(str(tmp_path)).to_pandas() \
        .set_index("touch_type")
    assert got.loc["click"].n_purchases == 2
    assert got.loc["click"].credit_ppm == 2 * 333_333 + 1_000_000
    assert got.loc["view"].n_purchases == 1
    assert got.loc["view"].credit_ppm == 333_333


def test_cosine_simjoin_verify_paths_equivalent(ray_session):
    """broadcast-verify == join-verify for the binary cosine join on
    the real corpus (pair sets and all columns bit-identical)."""
    import ray.data as rd

    from webxtract.ops.dedup import cosine_simjoin_pairs
    SF = "/root/testdata/sf0.001"
    ds = rd.read_parquet(f"{SF}/documents.parquet",
                         columns=["doc_id", "text"])
    a = cosine_simjoin_pairs(ds, verify="broadcast").to_pandas() \
        .sort_values(["doc_a", "doc_b"], ignore_index=True)
    ds2 = rd.read_parquet(f"{SF}/documents.parquet",
                          columns=["doc_id", "text"])
    b = cosine_simjoin_pairs(ds2, verify="join").to_pandas() \
        .sort_values(["doc_a", "doc_b"], ignore_index=True)
    assert a.values.tolist() == b.values.tolist()


def test_label_propagation_brute_force_and_planted(ray_session):
    """Synchronous min-tie LPA equals a per-node brute force on a
    random graph, and separates two planted cliques joined by one
    bridge edge (each community labeled by a member id)."""
    from collections import Counter

    import numpy as np
    import pyarrow as pa
    import ray.data as rd

    from webxtract.ops.graph import label_propagation_edges

    def run(edge_list, rounds=3):
        k = pa.array([(u << 32) | v for u, v in sorted(edge_list)],
                     pa.int64())
        ds = rd.from_arrow(pa.table({"k": k})).materialize()
        return {r["node"]: r["label"] for r in
                label_propagation_edges(ds, rounds=rounds).take_all()}

    def brute(edge_list, rounds=3):
        nodes = sorted({x for e in edge_list for x in e})
        adj = {n: [] for n in nodes}
        for u, v in edge_list:
            adj[u].append(v)
            adj[v].append(u)
        lab = {n: n for n in nodes}
        for _ in range(rounds):
            new = {}
            for n in nodes:
                c = Counter(lab[m] for m in adj[n])
                new[n] = sorted(c.items(),
                                key=lambda x: (-x[1], x[0]))[0][0]
            lab = new
        return lab

    rng = np.random.default_rng(11)
    edges = set()
    while len(edges) < 400:
        u, v = rng.integers(0, 60, 2)
        if u != v:
            edges.add((min(u, v), max(u, v)))
    assert run(edges) == brute(edges)

    # planted: two 6-cliques {0..5} and {10..15} + bridge (5, 10)
    cl = [(a, b) for g in (range(0, 6), range(10, 16))
          for a in g for b in g if a < b] + [(5, 10)]
    got = run(cl, rounds=4)
    left = {got[n] for n in range(0, 6)}
    right = {got[n] for n in range(10, 16)}
    assert len(left) == 1 and len(right) == 1 and left != right
