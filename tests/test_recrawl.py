"""Recrawl scheduling (webxtract/ops/web.py recrawl_schedule):
change counting in (ts, hash) order, both clamp arms, cold-start
single capture, partitioning invariance. Fixture parity lives in
test_oracle_parity.py (urls_recrawl_schedule)."""

import pyarrow as pa
import ray.data as rd

from webxtract.ops.web import RECRAWL_MAX_S, RECRAWL_MIN_S, \
    recrawl_schedule


def _run(rows, **kw):
    t = pa.table({
        "url": pa.array([r[0] for r in rows], pa.string()),
        "ts": pa.array([r[1] for r in rows], pa.int64()),
        "h": pa.array([r[2] for r in rows], pa.string())})
    out = recrawl_schedule(rd.from_arrow(t), **kw).to_pandas()
    return out.set_index("url")


DAY = 86400


def test_change_counting_and_interval(ray_session):
    rows = [
        # changes every visit: interval = span // 2
        ("a", 0, "x"), ("a", DAY, "y"), ("a", 2 * DAY, "z"),
        # never changes: interval = full span
        ("b", 0, "s"), ("b", DAY, "s"), ("b", 3 * DAY, "s"),
        # out-of-order input rows must still count in ts order
        ("c", 2 * DAY, "v1"), ("c", 0, "v0"), ("c", DAY, "v1"),
    ]
    out = _run(rows)
    assert int(out.loc["a", "n_changes"]) == 2
    assert int(out.loc["a", "interval_s"]) == DAY
    assert int(out.loc["a", "due_at_ts"]) == 3 * DAY
    assert int(out.loc["b", "n_changes"]) == 0
    assert int(out.loc["b", "interval_s"]) == 3 * DAY
    assert int(out.loc["c", "n_changes"]) == 1  # v0 -> v1 only


def test_clamp_arms_and_cold_start(ray_session):
    rows = [
        # single capture: span 0 -> min clamp (eager revisit)
        ("cold", 1000, "x"),
        # static across 100 days -> max clamp
        ("slow", 0, "s"), ("slow", 100 * DAY, "s"),
        # 2 changes in 30 minutes -> min clamp
        ("hot", 0, "a"), ("hot", 900, "b"), ("hot", 1800, "c"),
    ]
    out = _run(rows)
    assert int(out.loc["cold", "interval_s"]) == RECRAWL_MIN_S
    assert int(out.loc["cold", "due_at_ts"]) == 1000 + RECRAWL_MIN_S
    assert int(out.loc["slow", "interval_s"]) == RECRAWL_MAX_S
    assert int(out.loc["hot", "interval_s"]) == RECRAWL_MIN_S


def test_partitioning_invariance(ray_session):
    rows = [(f"u{i % 17}", (i // 17) * DAY, f"h{(i * 3) % 5}")
            for i in range(170)]
    t = pa.table({
        "url": pa.array([r[0] for r in rows], pa.string()),
        "ts": pa.array([r[1] for r in rows], pa.int64()),
        "h": pa.array([r[2] for r in rows], pa.string())})
    ds = rd.from_arrow(t)
    a = recrawl_schedule(ds).to_pandas().sort_values(
        "url", ignore_index=True)
    b = recrawl_schedule(ds.repartition(13)).to_pandas().sort_values(
        "url", ignore_index=True)
    assert a.equals(b)
