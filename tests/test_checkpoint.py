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
