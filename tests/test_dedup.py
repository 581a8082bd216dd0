"""Exact dedup (D1): latest warc_ts wins; Ray path == single-table path."""

import pyarrow as pa
import pyarrow.compute as pc

from webxtract import synth
from webxtract.dedup import dedup_pages, dedup_table


def test_dedup_table_latest_wins():
    t = synth.make_pages(200, seed=42)
    d = dedup_table(t)
    urls = d.column("url").to_pylist()
    assert len(urls) == len(set(urls))
    # for each dup url the kept warc_ts is the max
    full = t.to_pydict()
    best = {}
    for u, ts in zip(full["url"], full["warc_ts"]):
        best[u] = max(best.get(u, ts), ts)
    kept = dict(zip(d.column("url").to_pylist(), d.column("warc_ts").to_pylist()))
    assert kept == best


def test_dedup_ray_matches_table(ray_session):
    import ray.data as rd

    t = synth.make_pages(200, seed=42)
    expected = dedup_table(t)
    got = pa.concat_tables(
        [b for b in dedup_pages(rd.from_arrow(t)).iter_batches(batch_format="pyarrow")]
    )
    got = got.select(expected.column_names)
    got = got.take(pc.sort_indices(got.column("url")))
    exp = expected.take(pc.sort_indices(expected.column("url")))
    assert got.equals(exp)


def test_dedup_idempotent():
    t = synth.make_pages(150, seed=42)
    once = dedup_table(t)
    twice = dedup_table(once)
    assert once.equals(twice)


def test_dedup_join_matches_table(ray_session):
    """The 10^12-scale join-based dedup emits exactly the broadcast/fast
    path's rows (winner = max warc_ts per url; no (url, ts) ties in the
    synth corpus by construction)."""
    import ray.data as rd

    from webxtract.dedup import dedup_pages_join

    t = synth.make_pages(300, seed=43)
    expected = dedup_table(t)
    got = pa.concat_tables(list(
        dedup_pages_join(rd.from_arrow(t)).iter_batches(
            batch_format="pyarrow")))
    got = got.select(expected.column_names)
    got = got.take(pc.sort_indices(got.column("url")))
    exp = expected.take(pc.sort_indices(expected.column("url")))
    assert got.equals(exp)
