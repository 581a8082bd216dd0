"""HTTP header semantics (webxtract/ops/warc.py http_header_fields):
first-wins repeats, same-line charset scoping, word-bounded noindex,
absent-field degradation, and the WARC keep_http_headers round trip.
Fixture parity lives in test_oracle_parity.py (warc_http_fields)."""

import pyarrow as pa
import ray.data as rd

from webxtract.ops.warc import (build_warc, http_header_fields,
                                parse_warc)


def _fields(blocks):
    ds = rd.from_arrow(pa.table({
        "http_headers": pa.array([b.encode() for b in blocks],
                                 pa.binary())}))
    return http_header_fields(ds).to_pandas()


def test_first_wins_and_same_line_charset(ray_session):
    out = _fields([
        # repeated Content-Type: FIRST wins; the later line's charset
        # must NOT leak into the first
        "HTTP/1.1 200 OK\r\nContent-Type: text/plain\r\n"
        "Content-Type: text/html; charset=utf-8",
        # charset quoted + no space + mixed case
        'HTTP/1.1 200 OK\r\ncontent-type: Text/HTML;charset="Latin-1"',
    ])
    assert out.loc[0, "content_type"] == "text/plain"
    assert out.loc[0, "charset"] is None
    assert out.loc[1, "content_type"] == "text/html"
    assert out.loc[1, "charset"] == "latin-1"


def test_noindex_word_boundary(ray_session):
    out = _fields([
        "HTTP/1.1 200 OK\r\nX-Robots-Tag: NOINDEX, nofollow",
        "HTTP/1.1 200 OK\r\nX-Robots-Tag: noindexfoo",
        "HTTP/1.1 200 OK\r\nX-Robots-Tag: all",
        "HTTP/1.1 200 OK\r\nOther: noindex",  # wrong field
    ])
    assert out["noindex"].tolist() == [True, False, False, False]


def test_absent_fields_degrade(ray_session):
    out = _fields(["", "garbage not http",
                   "HTTP/1.1 404 Not Found"])
    assert out["status"].tolist() == [0, 0, 404]
    assert out["content_type"].isna().all()
    assert out["charset"].isna().all()
    assert out["last_modified_ts"].isna().all()
    assert not out["noindex"].any()


def test_last_modified_epoch(ray_session):
    out = _fields([
        "HTTP/1.1 200 OK\r\n"
        "Last-Modified: Tue, 02 Jan 2024 05:07:00 GMT",
        "HTTP/1.1 200 OK\r\nLast-Modified: not a date",
    ])
    assert int(out.loc[0, "last_modified_ts"]) == 1704172020
    assert out["last_modified_ts"].isna().tolist() == [False, True]


def test_warc_keep_http_headers_round_trip():
    block = (b"HTTP/1.1 301 Moved\r\nLocation: https://x.example/\r\n"
             b"Content-Type: text/html; charset=utf-8")
    raw = build_warc([
        ("https://a.example/", "2024-01-01T00:00:00Z", b"<html>",
         block),
        ("https://b.example/", "2024-01-01T00:00:00Z", b"<p>hi"),
    ])
    recs = parse_warc(raw, keep_http_headers=True)
    assert len(recs) == 2
    # the custom block comes back byte-exact with Content-Length added
    assert recs[0]["http_headers"] == (
        block + b"\r\nContent-Length: 6")
    assert recs[0]["http_status"] == 301
    assert recs[1]["http_headers"].startswith(b"HTTP/1.1 200 OK")
    # default path (no flag) keeps the original schema
    assert "http_headers" not in parse_warc(raw)[0]
