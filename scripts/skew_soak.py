"""Hot-key skew soak: ONE user owns 10M of 10.5M events (the worst
partitioning skew a user-keyed co-location can see — the entire hot
key lands in a single partition and the per-partition folds must stay
vectorized, never per-row). Runs the sequential-scan family (CUSUM,
Markov transitions) and checks both against single-process numpy/loop
replicas on the same deterministically generated stream.

Usage: python scripts/skew_soak.py [n_hot]
"""
import json
import os
import sys
import time

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))

TYPES = np.array(["click", "view", "purchase", "error", "signup"],
                 dtype=object)


def gen(n_hot: int, out_dir: str):
    rng = np.random.default_rng(11)
    n_cold = n_hot // 20
    n = n_hot + n_cold
    user = np.concatenate((np.full(n_hot, 7, np.int64),
                           rng.integers(100, 1100, n_cold)))
    tcode = rng.integers(0, 5, n)
    vals = np.round(rng.lognormal(3.5, 1.0, n) * 100) / 100.0
    base = np.datetime64("2026-01-01T00:00:00", "us")
    ts = base + rng.integers(0, 30 * 86_400_000_000, n).astype(
        "timedelta64[us]")
    t = pa.table({
        "event_id": pa.array(np.arange(n, dtype=np.int64)),
        "ts": pa.array(ts),
        "user_id": pa.array(user),
        "event_type": pa.array(TYPES[tcode].tolist(), pa.string()),
        "value": pa.array(vals, pa.float64()),
        "props": pa.array([""] * n, pa.string()),
    })
    pq.write_table(t, f"{out_dir}/events.parquet")
    return user, tcode, vals, ts.view(np.int64), np.arange(n)


def main() -> None:
    import ray

    n_hot = int(sys.argv[1]) if len(sys.argv) > 1 else 10_000_000
    out = "/tmp/skew_soak"
    os.makedirs(out, exist_ok=True)
    user, tcode, vals, ts, eid = gen(n_hot, out)

    ray.init(address="local", num_cpus=32, include_dashboard=False,
             logging_level="ERROR")
    from ray.data import DataContext
    DataContext.get_current().enable_progress_bars = False

    from webxtract.ops.relational import (events_type_transitions,
                                          events_value_cusum)

    res = {"n_events": int(user.size), "n_hot": n_hot}

    t0 = time.monotonic()
    cusum = events_value_cusum(out).to_pandas().set_index("user_id")
    res["cusum_s"] = round(time.monotonic() - t0, 2)

    # replica: hot user only (the skew target), vectorized closed form
    m = user == 7
    order = np.lexsort((eid[m], ts[m]))
    d = (np.round(vals[m][order] * 100)).astype(np.int64) - 5000
    p = np.cumsum(d)
    s = p - np.minimum(np.minimum.accumulate(p), 0)
    assert int(cusum.loc[7].final_cusum) == int(s[-1])
    assert int(cusum.loc[7].max_cusum) == int(s.max())
    assert int(cusum.loc[7].n_events) == n_hot

    t0 = time.monotonic()
    trans = events_type_transitions(out).to_pandas()
    res["transitions_s"] = round(time.monotonic() - t0, 2)

    # replica: full-corpus transition counts
    order_all = np.lexsort((eid, ts, user))
    u_s, c_s = user[order_all], tcode[order_all]
    same = u_s[1:] == u_s[:-1]
    frm, to = c_s[:-1][same], c_s[1:][same]
    packed = frm * 5 + to
    keys, cnt = np.unique(packed, return_counts=True)
    exp = {(TYPES[k // 5], TYPES[k % 5]): int(c)
           for k, c in zip(keys.tolist(), cnt.tolist())}
    got = {(r.from_type, r.to_type): int(r.n)
           for r in trans.itertuples()}
    assert got == exp, "transition counts diverge"

    ray.shutdown()
    res["match"] = "exact (cusum hot user + full transition matrix)"
    print(json.dumps(res))


if __name__ == "__main__":
    main()
