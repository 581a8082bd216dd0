"""Throttle backoff (webxtract/ops/web.py throttle_backoff): level
cap, status classification, shift arithmetic, partitioning
invariance. Fixture parity lives in test_oracle_parity.py
(hosts_backoff)."""

import pyarrow as pa
import ray.data as rd

from webxtract.ops.web import throttle_backoff


def _run(rows, **kw):
    t = pa.table({
        "host": pa.array([r[0] for r in rows], pa.string()),
        "status": pa.array([r[1] for r in rows], pa.int64())})
    return throttle_backoff(rd.from_arrow(t), **kw).to_pandas() \
        .set_index("host")


def test_levels_cap_and_statuses(ray_session):
    rows = [("healthy", 200)] * 5
    rows += [("mild", 200), ("mild", 429), ("mild", 503)]
    rows += [("dead", 429)] * 10          # cap must bite at 6
    rows += [("errs", 404), ("errs", 500)]  # NOT throttle statuses
    out = _run(rows)
    assert int(out.loc["healthy", "level"]) == 0
    assert int(out.loc["healthy", "delay_ms"]) == 1000
    assert int(out.loc["mild", "n_throttle"]) == 2
    assert int(out.loc["mild", "delay_ms"]) == 4000
    assert int(out.loc["dead", "level"]) == 6
    assert int(out.loc["dead", "delay_ms"]) == 64000
    assert int(out.loc["errs", "n_throttle"]) == 0


def test_partitioning_invariance(ray_session):
    rows = [(f"h{i % 9}", 429 if i % 4 == 0 else 200)
            for i in range(120)]
    t = pa.table({
        "host": pa.array([r[0] for r in rows], pa.string()),
        "status": pa.array([r[1] for r in rows], pa.int64())})
    ds = rd.from_arrow(t)
    a = throttle_backoff(ds).to_pandas().sort_values(
        "host", ignore_index=True)
    b = throttle_backoff(ds.repartition(13)).to_pandas().sort_values(
        "host", ignore_index=True)
    assert a.equals(b)
