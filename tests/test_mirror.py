"""Mirror-site detection (webxtract/ops/web.py mirror_pairs): star-cap
band boundaries, min_shared boundary, pair ordering, within-host
duplicate collapse, partitioning invariance. Fixture parity lives in
test_oracle_parity.py (hosts_mirror_pairs)."""

import pyarrow as pa
import ray.data as rd

from webxtract.ops.web import mirror_pairs


def _run(rows, **kw):
    t = pa.table({
        "host": pa.array([r[0] for r in rows], pa.string()),
        "text": pa.array([r[1] for r in rows], pa.string())})
    out = mirror_pairs(rd.from_arrow(t), **kw).to_pandas()
    return out.sort_values(["host_a", "host_b"], ignore_index=True)


def test_star_cap_band_boundaries(ray_session):
    rows = []
    # shared by exactly star_max hosts: all C(4,2)=6 pairs emit
    rows += [(f"h{i}.example", "at-cap") for i in range(4)]
    # shared by star_max+1 hosts: dropped entirely
    rows += [(f"g{i}.example", "over-cap") for i in range(5)]
    # shared by 1 host: no pair
    rows += [("lone.example", "solo")]
    out = _run(rows, star_max=4, min_shared=1)
    assert len(out) == 6
    assert set(out["host_a"]) | set(out["host_b"]) == {
        f"h{i}.example" for i in range(4)}
    assert bool(out["mirror"].all())


def test_min_shared_boundary_and_ordering(ray_session):
    rows = []
    for i in range(3):
        rows += [("b.example", f"c{i}"), ("a.example", f"c{i}")]
    out = _run(rows, min_shared=3)
    assert len(out) == 1
    r = out.iloc[0]
    # host_a < host_b regardless of input order
    assert (r["host_a"], r["host_b"]) == ("a.example", "b.example")
    assert int(r["n_shared"]) == 3 and bool(r["mirror"]) is True
    out2 = _run(rows, min_shared=4)
    assert bool(out2.iloc[0]["mirror"]) is False


def test_within_host_duplicates_collapse(ray_session):
    # one host serving the same content twice is ONE vote, and a
    # hash on a single host (however many copies) pairs with nobody
    rows = [("a.example", "x"), ("a.example", "x"),
            ("b.example", "x"), ("c.example", "only-c"),
            ("c.example", "only-c")]
    out = _run(rows, min_shared=1)
    assert len(out) == 1
    assert int(out.iloc[0]["n_shared"]) == 1


def test_partitioning_invariance(ray_session):
    rows = [(f"m{i % 3}.example", f"t{(i * 7) % 25}")
            for i in range(200)]
    t = pa.table({
        "host": pa.array([r[0] for r in rows], pa.string()),
        "text": pa.array([r[1] for r in rows], pa.string())})
    ds = rd.from_arrow(t)
    key = ["host_a", "host_b"]
    a = mirror_pairs(ds).to_pandas().sort_values(
        key, ignore_index=True)
    b = mirror_pairs(ds.repartition(11)).to_pandas().sort_values(
        key, ignore_index=True)
    assert a.equals(b)
