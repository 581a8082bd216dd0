"""Two-level CDX (webxtract/ops/warc.py build_cluster_idx): leader
spacing/rank arithmetic and the lookup property — binary-searching
the cluster rows locates the block whose range covers any full-index
row. Fixture parity lives in test_oracle_parity.py
(warc_cluster_idx)."""

import bisect

import pyarrow as pa
import ray.data as rd

from webxtract.ops.warc import build_cluster_idx


def _cdx(n):
    rows = sorted(
        (f"example,h{i % 7})/p/{i}", f"2024010{i % 9}",
         f"f{i % 3}.warc", i * 100, 100) for i in range(n))
    return pa.table({
        "surt": pa.array([r[0] for r in rows], pa.string()),
        "cdx_ts": pa.array([r[1] for r in rows], pa.string()),
        "file": pa.array([r[2] for r in rows], pa.string()),
        "roffset": pa.array([r[3] for r in rows], pa.int64()),
        "rlength": pa.array([r[4] for r in rows], pa.int64())})


def test_leader_ranks_and_coverage(ray_session):
    t = _cdx(103)
    out = build_cluster_idx(rd.from_arrow(t), every=10) \
        .to_pandas().sort_values("rn", ignore_index=True)
    assert out["rn"].tolist() == list(range(1, 104, 10))  # 11 leaders
    # lookup property: every full-index surt binary-searches to the
    # leader whose rank range [rn, rn+10) contains its own rank
    full = sorted(zip(t.column("surt").to_pylist(),
                      t.column("cdx_ts").to_pylist(),
                      t.column("file").to_pylist(),
                      t.column("roffset").to_pylist()))
    leaders = out[["surt", "cdx_ts", "file", "roffset"]].values.tolist()
    keys = [tuple(x) for x in leaders]
    for rank0, row in enumerate(full):
        j = bisect.bisect_right(keys, tuple(row)) - 1
        assert j >= 0
        leader_rn = int(out.iloc[j]["rn"])
        assert leader_rn <= rank0 + 1 < leader_rn + 10


def test_partitioning_invariance(ray_session):
    t = _cdx(57)
    a = build_cluster_idx(rd.from_arrow(t), every=7) \
        .to_pandas().sort_values("rn", ignore_index=True)
    b = build_cluster_idx(rd.from_arrow(t).repartition(9), every=7) \
        .to_pandas().sort_values("rn", ignore_index=True)
    assert a.equals(b)
