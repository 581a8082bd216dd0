"""Politeness scheduler (webxtract/ops/web.py crawl_schedule): slot
assignment, delay resolution and determinism of the generic op.
Fixture-composite parity lives in test_oracle_parity.py
(crawl_schedule)."""

import pyarrow as pa
import ray.data as rd

from webxtract.ops.web import crawl_schedule


def _pages(rows):
    t = pa.table({
        "doc_id": pa.array([r[0] for r in rows], pa.int64()),
        "url": pa.array([r[1] for r in rows], pa.string())})
    return rd.from_arrow(t).repartition(3)


def _df(ds):
    return ds.to_pandas().sort_values("doc_id").reset_index(drop=True)


def test_slots_per_host_in_doc_id_order(ray_session):
    rows = [(5, "https://a.x/5"), (1, "https://a.x/1"),
            (9, "https://b.x/9"), (3, "https://a.x/3")]
    df = _df(crawl_schedule(_pages(rows), {"a.x": 2000}))
    by_doc = df.set_index("doc_id")
    assert list(by_doc.loc[[1, 3, 5], "slot"]) == [0, 1, 2]
    assert list(by_doc.loc[[1, 3, 5], "fetch_at_ms"]) == [0, 2000, 4000]
    assert by_doc.loc[9, "slot"] == 0 and by_doc.loc[9, "fetch_at_ms"] == 0


def test_default_floor_and_case_folded_hosts(ray_session):
    rows = [(1, "https://WWW.Big.Example/a"),
            (2, "https://www.big.example/b")]
    df = _df(crawl_schedule(_pages(rows), {}, default_delay_ms=750))
    assert set(df["host"]) == {"www.big.example"}
    assert sorted(df["fetch_at_ms"]) == [0, 750]


def test_unparseable_url_degrades_to_empty_host_queue(ray_session):
    rows = [(1, "not a url"), (2, "https://ok.x/p")]
    df = _df(crawl_schedule(_pages(rows), {"ok.x": 100}))
    assert len(df) == 2
    assert df.set_index("doc_id").loc[1, "host"] == ""


def test_repartition_invariance(ray_session):
    rows = [(i, f"https://h{i % 4}.x/{i}") for i in range(40)]
    a = _df(crawl_schedule(_pages(rows), {"h1.x": 300}))
    one = rd.from_arrow(pa.table({
        "doc_id": pa.array([r[0] for r in rows], pa.int64()),
        "url": pa.array([r[1] for r in rows], pa.string())}))
    b = _df(crawl_schedule(one, {"h1.x": 300}))
    assert a.equals(b)


def test_declared_zero_delay_is_honored(ray_session):
    """Round-3 advisor finding: `dmap.get(h) or default` clamped a
    legitimately declared Crawl-delay: 0 to the 1000 ms floor. A
    declared 0 must yield 0 ms gaps; only ABSENT hosts get the
    default."""
    rows = [(1, "https://z.x/1"), (2, "https://z.x/2"),
            (3, "https://m.x/3"), (4, "https://m.x/4")]
    df = _df(crawl_schedule(_pages(rows), {"z.x": 0},
                            default_delay_ms=900))
    by_doc = df.set_index("doc_id")
    assert list(by_doc.loc[[1, 2], "fetch_at_ms"]) == [0, 0]
    assert list(by_doc.loc[[3, 4], "fetch_at_ms"]) == [0, 900]
