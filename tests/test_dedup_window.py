"""Windowed repeat-suppression and weighted-PageRank planted checks
(oracle parity over the real tables runs in test_oracle_parity.py)."""

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq

from webxtract.ops.relational import events_dedup_window


def test_lag_chain_semantics(ray_session, tmp_path):
    """A burst t, t+30m, t+50m, t+130m: LAG semantics drop every
    element whose IMMEDIATE predecessor is within 60m — including
    t+130m's survival (80m after its dropped predecessor), and a
    different type interleaved is untouched."""
    base = np.datetime64("2026-01-01T00:00:00", "us")
    mins = lambda m: base + np.timedelta64(m * 60_000_000, "us")
    rows = [
        (0, 7, "click", mins(0)),
        (1, 7, "click", mins(30)),    # 30m after e0  -> drop
        (2, 7, "click", mins(50)),    # 20m after e1  -> drop
        (3, 7, "click", mins(130)),   # 80m after e2  -> keep
        (4, 7, "view", mins(31)),     # other type    -> keep
        (5, 8, "click", mins(30)),    # other user    -> keep
    ]
    df = pd.DataFrame(rows, columns=["event_id", "user_id",
                                     "event_type", "ts"])
    df["value"] = 0.0
    df["props"] = ""
    pq.write_table(pa.Table.from_pandas(df, preserve_index=False),
                   f"{tmp_path}/events.parquet")
    got = events_dedup_window(str(tmp_path)).to_pandas()
    assert sorted(got.event_id) == [0, 3, 4, 5]


def test_weighted_pagerank_weight_bites(ray_session):
    """The weighted ranking must differ from the unweighted one on
    the real purchase graph (multiplicities exist), while node sets
    agree."""
    from webxtract.ops.graph import (_purchase_edges,
                                     _weighted_purchase_edges,
                                     pagerank, pagerank_weighted)

    SF = "/root/testdata/sf0.001"
    unw = pagerank(_purchase_edges(SF)).to_pandas()
    w = pagerank_weighted(_weighted_purchase_edges(SF)).to_pandas()
    assert set(unw.node) == set(w.node)
    merged = unw.merge(w, on="node")
    assert (merged.rank_e12_x != merged.rank_e12_y).any()


def test_weighted_edges_multiplicity(ray_session):
    """Weighted edge table: weights >= 1, symmetric, and at least one
    pair has multiplicity > 1 at sf0.001."""
    from webxtract.ops.graph import _weighted_purchase_edges

    e = _weighted_purchase_edges("/root/testdata/sf0.001").to_pandas()
    assert (e.w >= 1).all()
    fwd = {(s, d): w for s, d, w in zip(e.src, e.dst, e.w)}
    for (s, d), w in list(fwd.items())[:2000]:
        assert fwd[(d, s)] == w
    assert (e.w > 1).any()


def test_ewma_floor_semantics_on_negatives(ray_session, tmp_path):
    """(cents + 3*s) // 4 must FLOOR on negative states (numpy //),
    which the oracle replicates with exact IEEE floor(x/4.0) —
    planted chain: -1, -1, -1 -> s = -100, -100, -100; and
    -1, 0 -> s = -100, floor(-300/4) = -75."""
    base = np.datetime64("2026-01-01T00:00:00", "us")
    rows = [
        (0, 1, "c", base, -1.0),
        (1, 1, "c", base + np.timedelta64(1, "m"), 0.0),
        (2, 2, "c", base, -0.01),
        (3, 2, "c", base + np.timedelta64(1, "m"), 0.0),
    ]
    df = pd.DataFrame(rows, columns=["event_id", "user_id",
                                     "event_type", "ts", "value"])
    df["props"] = ""
    pq.write_table(pa.Table.from_pandas(df, preserve_index=False),
                   f"{tmp_path}/events.parquet")
    from webxtract.ops.relational import events_value_ewma

    got = events_value_ewma(str(tmp_path)).to_pandas() \
        .sort_values("event_id", ignore_index=True)
    # user 1: s0 = -100; s1 = floor((0 + 3*-100)/4) = floor(-75) = -75
    # user 2: s0 = -1;   s1 = floor(-3/4) = -1 (truncation would give 0)
    assert list(got.ewma_cents) == [-100, -75, -1, -1]
