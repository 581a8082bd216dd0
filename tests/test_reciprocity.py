"""Link reciprocity (webxtract/ops/web.py link_reciprocity):
direction semantics, ppm arithmetic, partitioning invariance.
Fixture parity lives in test_oracle_parity.py (domain_reciprocity)."""

import pyarrow as pa
import ray.data as rd

from webxtract.ops.web import link_reciprocity


def _run(edges):
    t = pa.table({
        "src_host": pa.array([e[0] for e in edges], pa.string()),
        "dst_host": pa.array([e[1] for e in edges], pa.string())})
    out = link_reciprocity(rd.from_arrow(t)).to_pandas()
    return out.set_index("host")


def test_direction_semantics_and_ppm(ray_session):
    edges = [
        ("a", "b"), ("b", "a"),     # mutual pair
        ("a", "c"),                 # one-way
        ("c", "d"), ("d", "c"),     # mutual pair
        ("d", "e"), ("d", "f"),     # two one-ways
    ]
    out = _run(edges)
    assert int(out.loc["a", "n_out"]) == 2
    assert int(out.loc["a", "n_recip"]) == 1
    assert int(out.loc["a", "recip_ppm"]) == 500000
    assert int(out.loc["b", "recip_ppm"]) == 1000000
    assert int(out.loc["c", "n_out"]) == 1
    assert int(out.loc["c", "n_recip"]) == 1
    assert int(out.loc["d", "n_out"]) == 3
    assert int(out.loc["d", "n_recip"]) == 1
    assert int(out.loc["d", "recip_ppm"]) == 333333


def test_partitioning_invariance(ray_session):
    edges = [(f"h{i % 11}", f"h{(i * 3 + 1) % 11}")
             for i in range(80)]
    edges = list(dict.fromkeys(
        (a, b) for a, b in edges if a != b))  # distinct, no loops
    t = pa.table({
        "src_host": pa.array([e[0] for e in edges], pa.string()),
        "dst_host": pa.array([e[1] for e in edges], pa.string())})
    ds = rd.from_arrow(t)
    a = link_reciprocity(ds).to_pandas().sort_values(
        "host", ignore_index=True)
    b = link_reciprocity(ds.repartition(7)).to_pandas().sort_values(
        "host", ignore_index=True)
    assert a.equals(b)
