"""Grouped winsorization: the discrete-quantile index rule and the
clamp, against a numpy replica on planted ragged groups (oracle parity
over the real events table runs in test_oracle_parity.py)."""

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq

from webxtract.ops.relational import events_winsorized


def _plant(tmp_path):
    rng = np.random.default_rng(3)
    rows = []
    eid = 0
    # ragged group sizes where ceil(q*n)-1 boundaries matter
    for typ, n in (("a", 1), ("b", 2), ("c", 3), ("d", 7), ("e", 40)):
        for v in rng.normal(0, 100, n):
            rows.append((eid, typ, float(v)))
            eid += 1
    df = pd.DataFrame(rows, columns=["event_id", "event_type", "value"])
    pq.write_table(pa.Table.from_pandas(df, preserve_index=False),
                   f"{tmp_path}/events.parquet")
    return df


def _expected(df):
    out = {}
    for typ, g in df.groupby("event_type"):
        v = np.sort(g.value.values)
        n = v.size
        lo = v[max(-(-n * 1 // 10) - 1, 0)]
        hi = v[max(-(-n * 9 // 10) - 1, 0)]
        for eid, val in zip(g.event_id, g.value):
            out[eid] = min(max(val, lo), hi)
    return out


def test_winsorize_matches_replica_on_ragged_groups(ray_session,
                                                    tmp_path):
    df = _plant(tmp_path)
    got = events_winsorized(str(tmp_path)).to_pandas()
    exp = _expected(df)
    assert len(got) == len(df)
    for eid, w in zip(got.event_id, got.value_w):
        assert w == exp[eid], eid
    # the clamp genuinely bites on the size-40 group
    changed = got.merge(df, on="event_id")
    assert (changed.value_w != changed.value).sum() >= 4
    # singleton group: value maps to itself
    a = changed[changed.event_type_x == "a"]
    assert (a.value_w == a.value).all()
