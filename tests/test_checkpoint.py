"""Checkpoint/resume property tests: resume == fresh (SURVEY.md §5.3)."""

import os

import pyarrow.compute as pc
import pyarrow.parquet as pq
import pytest

from webxtract import synth
from webxtract.checkpoint import (input_fingerprint, load_manifest,
                                  manifest_table, read_output,
                                  run_partitioned)


@pytest.fixture(scope="module")
def input_dir(tmp_path_factory):
    d = tmp_path_factory.mktemp("pages_in")
    for i in range(3):
        t = synth.make_pages(100, seed=42, doc_id_start=i * 100)
        pq.write_table(t, d / f"part-{i:05d}.parquet")
    return str(d)


def _sorted(t):
    return t.take(pc.sort_indices(t.column("url")))


def test_fresh_run_writes_all_partitions(ray_session, input_dir, tmp_path):
    out = str(tmp_path / "out")
    manifest = run_partitioned(input_dir, out)
    assert sorted(manifest) == [0, 1, 2]
    assert all(m["status"] == "done" for m in manifest.values())
    assert {d for d in os.listdir(out) if d.startswith("part=")} == {
        "part=00000", "part=00001", "part=00002"}
    mt = manifest_table(out)
    assert mt.num_rows == 3
    assert mt.column("rows_in").to_pylist() == [104, 103, 103]


def test_resume_equals_fresh(ray_session, input_dir, tmp_path):
    fresh_dir = str(tmp_path / "fresh")
    run_partitioned(input_dir, fresh_dir)
    fresh = _sorted(read_output(fresh_dir))

    crash_dir = str(tmp_path / "crashed")
    with pytest.raises(RuntimeError, match="injected failure"):
        run_partitioned(input_dir, crash_dir, fail_after=1)
    assert len(load_manifest(crash_dir)) == 1  # one partition survived

    resumed_manifest = run_partitioned(input_dir, crash_dir)  # resume
    assert sorted(resumed_manifest) == [0, 1, 2]
    resumed = _sorted(read_output(crash_dir))
    assert resumed.equals(fresh), "resume output differs from fresh run"


def test_resume_skips_done_partitions(ray_session, input_dir, tmp_path):
    out = str(tmp_path / "out2")
    run_partitioned(input_dir, out)
    first = load_manifest(out)
    run_partitioned(input_dir, out)  # no-op rerun
    second = load_manifest(out)
    # created_at unchanged -> partitions were skipped, not recomputed
    assert {p: m["created_at"] for p, m in first.items()} == \
           {p: m["created_at"] for p, m in second.items()}


def test_changed_input_invalidates_partition(ray_session, input_dir, tmp_path):
    out = str(tmp_path / "out3")
    run_partitioned(input_dir, out)
    before = load_manifest(out)
    # touch partition 1's input with different content
    target = os.path.join(input_dir, "part-00001.parquet")
    t = synth.make_pages(80, seed=99, doc_id_start=100)
    pq.write_table(t, target)
    os.utime(target, (0, 0))  # force mtime change
    assert input_fingerprint(target) != before[1]["input_fingerprint"]
    after = run_partitioned(input_dir, out)
    assert after[1]["rows_in"] == t.num_rows
    assert after[0]["created_at"] == before[0]["created_at"]  # 0 untouched


def test_cli_resume_recomputes_deleted_partition(ray_session, input_dir, tmp_path):
    """Deleting one partition's manifest row forces just that partition
    to recompute; output equals a fresh run."""
    out = str(tmp_path / "out_cli")
    run_partitioned(input_dir, out)
    fresh = _sorted(read_output(out))
    os.remove(os.path.join(out, "manifest", "part-00001.json"))
    manifest = run_partitioned(input_dir, out)
    assert sorted(manifest) == [0, 1, 2]
    again = _sorted(read_output(out))
    assert again.equals(fresh)


def test_cross_file_dup_deduped_globally(ray_session, tmp_path):
    """A url duplicated ACROSS two input files keeps only the global
    max-warc_ts row (url-dedup is global under run_partitioned, not
    per-partition)."""
    import pyarrow as pa

    d = tmp_path / "in_xfile"
    d.mkdir()
    a = synth.make_pages(50, seed=1)
    b = synth.make_pages(50, seed=2, doc_id_start=50)
    # plant a's first row into b with a NEWER fetch time
    r = a.slice(0, 1)
    bumped = pc.add(r.column("warc_ts"),
                    pa.scalar(86_400_000_000, pa.duration("us")))
    r = r.set_column(r.schema.get_field_index("warc_ts"), "warc_ts", bumped)
    dup_url = r.column("url").to_pylist()[0]
    dup_ts = r.column("warc_ts").to_pylist()[0]
    pq.write_table(a, d / "part-00000.parquet")
    pq.write_table(pa.concat_tables([b, r]), d / "part-00001.parquet")

    out = str(tmp_path / "out_xfile")
    run_partitioned(str(d), out)
    got = read_output(out, columns=["url", "warc_ts"])
    urls = got.column("url").to_pylist()
    assert urls.count(dup_url) == 1
    kept_ts = dict(zip(urls, got.column("warc_ts").to_pylist()))[dup_url]
    assert kept_ts == dup_ts  # the cross-file max won


def test_orphan_partitions_gced(ray_session, tmp_path):
    """Shrinking the input set garbage-collects the now-orphan partition
    instead of serving its stale rows from read_output."""
    d = tmp_path / "in_shrink"
    d.mkdir()
    for i in range(3):
        pq.write_table(synth.make_pages(40, seed=10 + i, doc_id_start=i * 40),
                       d / f"part-{i:05d}.parquet")
    out = str(tmp_path / "out_shrink")
    run_partitioned(str(d), out)
    n_all = read_output(out).num_rows
    assert len(load_manifest(out)) == 3

    os.remove(d / "part-00002.parquet")
    manifest = run_partitioned(str(d), out)
    assert sorted(manifest) == [0, 1]
    assert len(load_manifest(out)) == 2
    assert not os.path.isdir(os.path.join(out, "part=00002"))
    assert read_output(out).num_rows < n_all


def test_same_second_rewrite_invalidates(tmp_path):
    """Same-size same-second rewrites still change the fingerprint
    (mtime tracked at ns resolution) when the filesystem timestamp
    moves at all; identical (size, mtime_ns) is indistinguishable by
    design, so force distinct ns mtimes and verify divergence."""
    p = tmp_path / "f.parquet"
    p.write_bytes(b"x" * 128)
    os.utime(p, ns=(1_000_000_000_123_456_789, 1_000_000_000_123_456_789))
    fp1 = input_fingerprint(str(p))
    os.utime(p, ns=(1_000_000_000_123_456_790, 1_000_000_000_123_456_790))
    fp2 = input_fingerprint(str(p))
    assert fp1 != fp2  # sub-second rewrite detected
    assert input_fingerprint(str(p), extra="dupdigest") != fp2
