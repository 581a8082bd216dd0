"""Link-farm detection (webxtract/ops/web.py link_farm_profile):
integer rule boundaries, PSL fallback for non-'ok' dst hosts,
partitioning invariance. Fixture parity lives in
test_oracle_parity.py (hosts_link_farms)."""

import pyarrow as pa
import ray.data as rd

from webxtract.ops.web import link_farm_profile


def _profile(edges, **kw):
    t = pa.table({
        "src_host": pa.array([e[0] for e in edges], pa.string()),
        "dst_host": pa.array([e[1] for e in edges], pa.string())})
    out = link_farm_profile(rd.from_arrow(t), **kw).to_pandas()
    return out.set_index("src_host")


def test_integer_rule_boundaries(ray_session):
    edges = []
    # farm: 6 hosts / 2 domains (6 >= 5 and 6 >= 3*2)
    edges += [("farm.example", f"s{j}.hub{j % 2}.example")
              for j in range(6)]
    # ratio miss: 5 hosts / 2 domains (5 >= 5 but 5 < 6)
    edges += [("ratio.example", f"r{j}.hub{j % 2}.example")
              for j in range(5)]
    # fanout miss: 4 hosts / 1 domain (4 < 5)
    edges += [("fan.example", f"f{j}.hub0.example")
              for j in range(4)]
    out = _profile(edges)
    assert bool(out.loc["farm.example", "farm"]) is True
    assert bool(out.loc["ratio.example", "farm"]) is False
    assert bool(out.loc["fan.example", "farm"]) is False
    assert int(out.loc["farm.example", "n_dst_hosts"]) == 6
    assert int(out.loc["farm.example", "n_dst_domains"]) == 2


def test_non_ok_dst_hosts_fall_back_to_themselves(ray_session):
    # an IPv4 dst and a bare-suffix dst have no registrable domain:
    # each counts as its own
    edges = [("a.example", "10.0.0.1"), ("a.example", "co.uk"),
             ("a.example", "x.b.example")]
    out = _profile(edges)
    assert int(out.loc["a.example", "n_dst_hosts"]) == 3
    assert int(out.loc["a.example", "n_dst_domains"]) == 3


def test_partitioning_invariance(ray_session):
    edges = [(f"s{i % 7}.example", f"d{j}.hub{i % 3}.example")
             for i in range(40) for j in range(3)]
    t = pa.table({
        "src_host": pa.array([e[0] for e in edges], pa.string()),
        "dst_host": pa.array([e[1] for e in edges], pa.string())})
    ds = rd.from_arrow(t)
    a = link_farm_profile(ds).to_pandas().sort_values(
        "src_host", ignore_index=True)
    b = link_farm_profile(ds.repartition(9)).to_pandas().sort_values(
        "src_host", ignore_index=True)
    assert a.equals(b)
