"""WARC source (ops/warc): ISO 28500 framing, gzip members, hostile
payloads, truncation — the Common-Crawl container format."""

import pytest

from webxtract.ops.warc import (_gunzip_members, _gzip_member,
                                build_warc, parse_warc)

RECS = [
    ("https://a.b/1", "2024-01-01T00:00:00Z", b"<html>x</html>"),
    # payload embedding the record terminator AND the magic: framing
    # must be by Content-Length, never by marker scan
    ("https://a.b/2", "2024-01-02T00:00:00Z",
     b"bytes\r\n\r\nWARC/1.0\r\nfake: header\r\n\r\nstill body"),
    ("https://a.b/3", "2024-01-03T00:00:00Z", b""),
]


@pytest.mark.parametrize("gz", [False, True])
def test_roundtrip(gz):
    got = parse_warc(build_warc(RECS, gzip_members=gz))
    assert [(r["url"], r["warc_ts"], r["html"]) for r in got] == RECS
    assert all(r["http_status"] == 200 for r in got)
    assert [r["n_bytes"] for r in got] == [len(h) for _, _, h in RECS]


def test_warcinfo_skipped_by_type():
    raw = build_warc(RECS)
    assert raw.startswith(b"WARC/1.0")
    assert b"warcinfo" in raw.split(b"\r\n\r\n", 1)[0]
    assert len(parse_warc(raw)) == len(RECS)  # info record not a page


def test_truncated_file_parses_complete_prefix():
    raw = build_warc(RECS)
    # cut inside the LAST record's payload: first two must survive
    cut = raw[:raw.rfind(b"https://a.b/3") + 5]
    got = parse_warc(cut)
    assert [r["url"] for r in got] == ["https://a.b/1", "https://a.b/2"]


def test_garbage_and_empty():
    assert parse_warc(b"") == []
    assert parse_warc(b"not a warc file") == []
    # valid first record, garbage tail: stop, no resync guessing
    raw = build_warc(RECS[:1]) + b"garbage tail no frame"
    assert [r["url"] for r in parse_warc(raw)] == ["https://a.b/1"]


def test_multi_member_gzip_and_truncated_member():
    raw = build_warc(RECS, gzip_members=True)
    # members concatenate transparently
    assert _gunzip_members(raw) == build_warc(RECS)
    # truncated final member: decoded prefix only, no raise
    out = _gunzip_members(raw[:-7])
    assert out.startswith(b"WARC/1.0")


def test_gzip_member_helper_is_real_gzip():
    import gzip

    assert gzip.decompress(_gzip_member(b"payload")) == b"payload"


@pytest.mark.usefixtures("ray_session")
def test_read_warc_dataset(tmp_path):
    from webxtract.ops.warc import read_warc

    for i in range(3):
        (tmp_path / f"f{i}.warc").write_bytes(build_warc(
            [(f"https://h{i}.example/p", "2024-01-01T00:00:00Z",
              f"<p>{i}</p>".encode())]))
    df = read_warc(str(tmp_path)).to_pandas()
    assert sorted(df.url) == [f"https://h{i}.example/p"
                              for i in range(3)]
    assert set(df.http_status) == {200}


@pytest.mark.usefixtures("ray_session")
def test_warc_roundtrip_extraction_byte_identical(tmp_path):
    """Common-Crawl ingestion guarantee: pages serialized to WARC and
    read back through read_warc extract to BYTE-IDENTICAL text per
    url vs extracting the original pages directly."""
    import pandas as pd
    import ray.data as rd

    from webxtract import pipeline
    from webxtract.ops.warc import build_warc, read_warc
    from webxtract.testdata import pages_dataset

    pages = pages_dataset(sf_rows=200).to_pandas()
    recs = [(r.url, str(r.warc_ts), bytes(r.html))
            for r in pages.itertuples()]
    (tmp_path / "a.warc.gz").write_bytes(
        build_warc(recs[:100], gzip_members=True))
    (tmp_path / "b.warc").write_bytes(build_warc(recs[100:]))

    via_warc = pipeline.extract_pipeline(
        read_warc(str(tmp_path), pages_schema=True),
        pipeline.PipelineConfig(dedup=False)) \
        .to_pandas().set_index("url").extracted_text.sort_index()
    direct = pipeline.extract_pipeline(
        rd.from_pandas(pages), pipeline.PipelineConfig(dedup=False)) \
        .to_pandas().set_index("url").extracted_text.sort_index()
    pd.testing.assert_series_equal(via_warc, direct)
