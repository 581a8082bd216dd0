"""Soft-404 template detection (webxtract/ops/web.py
soft404_templates): min_copies boundary, per-host (not global)
grouping, share arithmetic, partitioning invariance. Fixture parity
lives in test_oracle_parity.py (hosts_soft404)."""

import hashlib

import pyarrow as pa
import ray.data as rd

from webxtract.ops.web import soft404_templates


def _run(rows, **kw):
    t = pa.table({
        "host": pa.array([r[0] for r in rows], pa.string()),
        "text": pa.array([r[1] for r in rows], pa.string())})
    return soft404_templates(rd.from_arrow(t), **kw).to_pandas()


def test_min_copies_boundary_and_share(ray_session):
    rows = [("a.example", "tmpl")] * 4 + [("a.example", "x1"),
                                          ("a.example", "x2")]
    rows += [("b.example", "tmpl")] * 3 + [("b.example", "y")]
    out = _run(rows, min_copies=4)
    assert len(out) == 1
    r = out.iloc[0]
    assert r["host"] == "a.example"
    assert r["template_md5"] == hashlib.md5(b"tmpl").hexdigest()
    assert int(r["n_copies"]) == 4 and int(r["n_docs"]) == 6
    assert int(r["share_ppm"]) == 666666


def test_grouping_is_per_host_not_global(ray_session):
    # the same text on 3 hosts x 2 copies: 6 global copies but no
    # host reaches the bar
    rows = [(f"h{i}.example", "shared") for i in range(3)
            for _ in range(2)]
    out = _run(rows, min_copies=4)
    assert len(out) == 0


def test_partitioning_invariance(ray_session):
    rows = [(f"h{i % 5}.example",
             "T" if i % 3 == 0 else f"c{i}") for i in range(150)]
    t = pa.table({
        "host": pa.array([r[0] for r in rows], pa.string()),
        "text": pa.array([r[1] for r in rows], pa.string())})
    ds = rd.from_arrow(t)
    key = ["host", "template_md5"]
    a = soft404_templates(ds).to_pandas().sort_values(
        key, ignore_index=True)
    b = soft404_templates(ds.repartition(11)).to_pandas() \
        .sort_values(key, ignore_index=True)
    assert a.equals(b) and len(a) == 5
