"""Hamilton apportionment (webxtract/ops/web.py crawl_quota):
sum(quota) == budget invariant, largest-remainder tie-breaks,
quota monotone in weight, overflow guard, partitioning invariance.
Fixture parity lives in test_oracle_parity.py (domain_crawl_quota)."""

import pyarrow as pa
import pytest
import ray.data as rd

from webxtract.ops.web import crawl_quota


def _run(weights, budget):
    t = pa.table({
        "domain": pa.array([w[0] for w in weights], pa.string()),
        "weight": pa.array([w[1] for w in weights], pa.int64())})
    out = crawl_quota(rd.from_arrow(t), budget).to_pandas()
    return out.set_index("domain")


def test_sum_equals_budget_and_remainder_order(ray_session):
    # weights 1,1,1,2 with budget 10: shares 2,2,2,4; remainders
    # equal for the three 1s -> ties break to smallest domain name
    out = _run([("c", 1), ("a", 1), ("b", 1), ("d", 2)], 10)
    assert int(out["quota"].sum()) == 10
    assert int(out.loc["d", "quota"]) == 4
    assert sorted(out.loc[["a", "b", "c"], "quota"]) == [2, 2, 2]
    # budget 11: one leftover slot; d's remainder 11*2%5=2 beats the
    # three 1s' remainder 1 -> d gets it
    out = _run([("c", 1), ("a", 1), ("b", 1), ("d", 2)], 11)
    assert int(out["quota"].sum()) == 11
    assert int(out.loc["d", "quota"]) == 5
    # budget 12: two slots; d (rem 4) then the TIE among a/b/c
    # (rem 2 each) breaks to the smallest domain name -> a
    out = _run([("c", 1), ("a", 1), ("b", 1), ("d", 2)], 12)
    assert int(out["quota"].sum()) == 12
    assert int(out.loc["d", "quota"]) == 5
    assert int(out.loc["a", "quota"]) == 3
    assert int(out.loc["b", "quota"]) == 2
    assert int(out.loc["c", "quota"]) == 2


def test_monotone_and_zero_weight(ray_session):
    out = _run([("big", 900), ("mid", 90), ("small", 9),
                ("zero", 0)], 1000)
    assert int(out["quota"].sum()) == 1000
    assert out.loc["big", "quota"] >= out.loc["mid", "quota"] >= \
        out.loc["small", "quota"] >= out.loc["zero", "quota"]


def test_overflow_guard(ray_session):
    t = pa.table({"domain": pa.array(["a"], pa.string()),
                  "weight": pa.array([1 << 40], pa.int64())})
    with pytest.raises(ValueError, match="overflow"):
        crawl_quota(rd.from_arrow(t), 1 << 30)


def test_partitioning_invariance(ray_session):
    weights = [(f"d{i:03d}", (i * 37) % 101 + 1) for i in range(200)]
    t = pa.table({
        "domain": pa.array([w[0] for w in weights], pa.string()),
        "weight": pa.array([w[1] for w in weights], pa.int64())})
    a = crawl_quota(rd.from_arrow(t), 9973).to_pandas() \
        .sort_values("domain", ignore_index=True)
    b = crawl_quota(rd.from_arrow(t).repartition(13), 9973) \
        .to_pandas().sort_values("domain", ignore_index=True)
    assert a.equals(b)
    assert int(a["quota"].sum()) == 9973
