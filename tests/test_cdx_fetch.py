"""CDX ranged fetch (webxtract/ops/warc.py cdx_fetch / build_cdx):
gz offsets must be ON-DISK member extents (the Ray read path
auto-decompresses '.gz' by extension — the bug build_cdx works
around), and the fetch must touch ONLY the recorded extents (proven
by corrupting every byte outside them). Fixture parity lives in
test_oracle_parity.py (warc_random_access)."""

import os

import pyarrow as pa
import pytest
import ray.data as rd

from webxtract.ops.warc import (build_cdx, build_warc, cdx_fetch,
                                read_warc)


@pytest.fixture()
def warc_gz_dir(tmp_path):
    recs = [(f"https://h{i % 3}.example/p/{i}",
             "2024-01-01T00:00:00Z",
             f"<html>page {i} body</html>".encode())
            for i in range(20)]
    p = tmp_path / "crawl-00000.warc.gz"
    p.write_bytes(build_warc(recs, gzip_members=True))
    return str(tmp_path)


def _index(d):
    return pa.concat_tables(list(
        build_cdx(d).iter_batches(batch_format="pyarrow")))


def test_gz_offsets_are_on_disk_extents(ray_session, warc_gz_dir):
    t = _index(warc_gz_dir)
    path = os.path.join(warc_gz_dir, "crawl-00000.warc.gz")
    raw = open(path, "rb").read()
    assert len(t) == 20
    for off, ln in zip(t.column("roffset").to_pylist(),
                       t.column("rlength").to_pylist()):
        # every extent is a whole gzip member of the ON-DISK file
        assert raw[off:off + 2] == b"\x1f\x8b", (off, ln)
        assert off + ln <= len(raw)


def test_fetch_reads_only_the_extents(ray_session, warc_gz_dir):
    t = _index(warc_gz_dir)
    path = os.path.join(warc_gz_dir, "crawl-00000.warc.gz")
    raw = bytearray(open(path, "rb").read())
    # corrupt EVERY byte outside the wanted extents; a fetch that
    # reads anything else must break
    want = t.slice(0, 5)
    keep = bytearray(len(raw))
    for off, ln in zip(want.column("roffset").to_pylist(),
                       want.column("rlength").to_pylist()):
        for k in range(off, off + ln):
            keep[k] = 1
    for k in range(len(raw)):
        if not keep[k]:
            raw[k] = 0xAA
    open(path, "wb").write(bytes(raw))
    out = cdx_fetch(rd.from_arrow(want), warc_gz_dir).to_pandas()
    assert len(out) == 5
    for _, r in out.iterrows():
        assert r["html"].decode().startswith("<html>page ")


def test_fetch_matches_full_scan(ray_session, warc_gz_dir):
    t = _index(warc_gz_dir)
    fetched = cdx_fetch(rd.from_arrow(t), warc_gz_dir).to_pandas()
    scanned = read_warc(warc_gz_dir).to_pandas()
    f = fetched.sort_values("url", ignore_index=True)
    s = scanned[["url", "html"]].sort_values("url", ignore_index=True)
    assert f["url"].tolist() == s["url"].tolist()
    assert [bytes(x) for x in f["html"]] == \
        [bytes(x) for x in s["html"]]
