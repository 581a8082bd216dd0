"""WARC revisit records (webxtract/ops/warc.py
build_incremental_warc / warc_type_stats): unchanged-vs-changed
boundary, revisit invisibility to page pipelines, digest headers,
stats accounting. Fixture parity lives in test_oracle_parity.py
(warc_incremental_stats)."""

import hashlib

from webxtract.ops.warc import (build_incremental_warc, build_warc,
                                parse_warc)


def _prior(pages):
    d = {u: hashlib.md5(h).hexdigest() for u, _, h in pages}
    return d.get


def test_unchanged_vs_changed_boundary():
    v1 = [("https://a.example/", "2024-01-01T00:00:00Z", b"<html>x"),
          ("https://b.example/", "2024-01-01T00:00:00Z", b"<html>y")]
    v2 = [("https://a.example/", "2024-02-01T00:00:00Z", b"<html>x"),
          ("https://b.example/", "2024-02-01T00:00:00Z",
           b"<html>y!")]  # one byte changed
    raw = build_incremental_warc(v2, _prior(v1))
    assert raw.count(b"WARC-Type: revisit") == 1
    assert raw.count(b"WARC-Type: response") == 1
    # the revisit record carries the digest + refers-to headers and
    # an empty payload
    assert b"WARC-Payload-Digest: md5:" + hashlib.md5(
        b"<html>x").hexdigest().encode() in raw
    assert b"WARC-Refers-To-Target-URI: https://a.example/" in raw


def test_revisits_invisible_to_page_pipelines():
    v1 = [(f"https://h.example/{i}", "2024-01-01T00:00:00Z",
           f"<html>{i}".encode()) for i in range(6)]
    v2 = [(u, "2024-02-01T00:00:00Z",
           h if i % 3 else h + b"!") for i, (u, _, h) in enumerate(v1)]
    raw = build_incremental_warc(v2, _prior(v1))
    recs = parse_warc(raw)
    # only the 2 changed pages surface; revisit rows never
    # masquerade as pages
    assert [r["url"].rsplit("/", 1)[1] for r in recs] == ["0", "3"]
    assert all(r["html"].endswith(b"!") for r in recs)


def test_new_urls_always_store():
    raw = build_incremental_warc(
        [("https://new.example/", "2024-02-01T00:00:00Z",
          b"<html>n")], lambda u: None)
    assert b"WARC-Type: revisit" not in raw
    assert parse_warc(raw)[0]["url"] == "https://new.example/"


def test_full_snapshot_equals_build_warc_when_all_changed():
    pages = [("https://a.example/", "2024-01-01T00:00:00Z",
              b"<html>x")]
    assert build_incremental_warc(pages, lambda u: None) == \
        build_warc(pages)
