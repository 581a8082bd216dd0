"""Distributed-selection soak: one HOT event type with 20M values
(the case the co-located sort twin cannot shard — a single group's
values never fit one worker at real scale), plus two small types.
Truth = numpy sort/median on the same deterministically generated
values. Usage: python scripts/median_soak.py [n_hot]
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


def gen(n_hot: int, out_dir: str) -> dict:
    rng = np.random.default_rng(7)
    hot = np.round(rng.lognormal(3.0, 1.5, n_hot) * 100) / 100.0
    small_a = np.round(rng.normal(50, 10, 1000) * 100) / 100.0
    small_b = np.array([1.25])
    vals = np.concatenate((hot, small_a, small_b))
    types = np.concatenate((
        np.full(n_hot, "hot", object),
        np.full(small_a.size, "a", object),
        np.full(1, "b", object)))
    base = np.datetime64("2026-01-01T00:00:00", "us")
    t = pa.table({
        "event_id": pa.array(np.arange(vals.size, dtype=np.int64)),
        "ts": pa.array(np.full(vals.size, base)),
        "user_id": pa.array(np.zeros(vals.size, np.int64)),
        "event_type": pa.array(types.tolist(), pa.string()),
        "value": pa.array(vals, pa.float64()),
        "props": pa.array([""] * vals.size, pa.string()),
    })
    pq.write_table(t, f"{out_dir}/events.parquet")

    def med(v):
        v = np.sort(v)
        n = v.size
        m = float(v[n // 2]) if n % 2 \
            else float((v[n // 2 - 1] + v[n // 2]) / 2.0)
        return round(m, 6)

    return {"hot": med(hot), "a": med(small_a), "b": med(small_b)}


def main() -> None:
    import ray

    n_hot = int(sys.argv[1]) if len(sys.argv) > 1 else 20_000_000
    out = "/tmp/median_soak"
    os.makedirs(out, exist_ok=True)
    truth = gen(n_hot, out)

    ray.init(address="local", num_cpus=32, include_dashboard=False,
             logging_level="ERROR")
    from ray.data import DataContext
    DataContext.get_current().enable_progress_bars = False

    from webxtract.ops.relational import events_value_median_dist
    t0 = time.monotonic()
    got = events_value_median_dist(out).to_pandas() \
        .set_index("event_type")
    wall = round(time.monotonic() - t0, 2)
    ray.shutdown()
    for ty, m in truth.items():
        assert got.loc[ty].median_value == m, (ty, got.loc[ty], m)
    print(json.dumps({"n_hot": n_hot, "wall_s": wall,
                      "truth": truth, "match": "exact (all 3 types)"}))


if __name__ == "__main__":
    main()
