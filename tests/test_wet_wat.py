"""WET / WAT sidecar formats (Common Crawl's .warc.wet / .warc.wat
derivatives): serialization round trips, the resumable one-output-per-
input conversion, full-page text semantics, and hostile-input
degradation. Oracle parity for both end-to-end chains lives in
test_oracle_parity.py (warc_wet / warc_wat)."""

import pyarrow as pa
import pytest
from hypothesis import given, settings
from hypothesis import strategies as st

from webxtract.ops.warc import (build_warc, build_wat, build_wet,
                                dom_plain_text, parse_warc, parse_wat,
                                parse_wet, wat_extract, wet_convert)


def test_dom_plain_text_semantics():
    # block elements break lines; inline text joins with spaces;
    # whitespace collapses within a line; script/style content drops
    assert dom_plain_text(
        b"<p>a  b</p><div>c<br>d</div>") == "a b\nc\nd"
    assert dom_plain_text(
        b"x <b>y</b> z<script>var q=1;</script>") == "x y z"
    assert dom_plain_text(b"") == ""
    assert dom_plain_text(None) == ""
    assert dom_plain_text(b"\xff\xfegarbage") != None  # noqa: E711


def test_wet_roundtrip():
    recs = [("https://a/x", "2024-01-01T00:00:00Z", "hello world"),
            ("https://b/y", "2024-02-02T00:00:00Z", "l1\nl2"),
            ("https://c/z", "2024-03-03T00:00:00Z", "")]
    back = parse_wet(build_wet(recs))
    assert [(r["url"], r["warc_ts"], r["text"]) for r in back] == recs


def test_wet_payload_with_warc_markers_survives():
    # framing is by Content-Length: a text payload containing WARC/
    # markers and CRLFCRLF must round-trip untouched
    evil = "WARC/1.0\r\n\r\nContent-Length: 7\r\n\r\nfake"
    back = parse_wet(build_wet([("https://e/m", "2024-01-01T00:00:00Z",
                                 evil)]))
    assert len(back) == 1 and back[0]["text"] == evil


def test_wat_roundtrip_and_projection():
    meta = {"title": "T", "description": "D",
            "links": [{"path": "A@/href", "url": "https://d/1",
                       "text": "one"}]}
    back = parse_wat(build_wat([("https://a/x",
                                 "2024-01-01T00:00:00Z", meta)]))
    assert len(back) == 1
    env = back[0]["envelope"]["Envelope"]
    assert env["WARC-Header-Metadata"]["WARC-Target-URI"] == \
        "https://a/x"
    hm = env["Payload-Metadata"]["HTTP-Response-Metadata"][
        "HTML-Metadata"]
    assert hm["Head"]["Title"] == "T"
    assert hm["Links"] == meta["links"]


def test_wat_extract_uses_real_dom_walk():
    html = (b"<html><head><title> A  B </title>"
            b'<meta name="Description" content="d"></head>'
            b'<body><a href="/r">x <b>y</b></a><a>no-href</a></body>')
    m = wat_extract(html)
    assert m["title"] == "A B"  # whitespace-normalized, first wins
    assert m["description"] == "d"  # attr name case-folded
    assert m["links"] == [{"path": "A@/href", "url": "/r",
                           "text": "x y"}]
    assert wat_extract(b"") == {"title": "", "description": "",
                                "links": []}


def test_conversion_resumable(ray_session, tmp_path):
    """wet_convert writes one .wet per input .warc atomically; a
    second call skips every finished output and the bytes are
    untouched."""
    wdir = tmp_path / "warc"
    wdir.mkdir()
    for fi in range(3):
        recs = [(f"https://s{fi}.example/p/{r}",
                 "2024-01-01T00:00:00Z", f"<p>doc {fi}-{r}</p>".encode())
                for r in range(5)]
        (wdir / f"crawl-{fi:05d}.warc").write_bytes(build_warc(recs))
    wet_dir = tmp_path / "wet"
    outs = wet_convert(str(wdir), str(wet_dir))
    assert len(outs) == 3
    sig = {p: open(p, "rb").read() for p in outs}
    outs2 = wet_convert(str(wdir), str(wet_dir))
    assert outs2 == outs
    assert all(open(p, "rb").read() == b for p, b in sig.items())
    # read back: 15 conversion records, text matches the DOM walk
    recs = [r for p in outs for r in parse_wet(open(p, "rb").read())]
    assert len(recs) == 15
    assert all(r["text"].startswith("doc ") for r in recs)


@settings(max_examples=60, deadline=None)
@given(st.binary(max_size=400), st.integers(0, 400))
def test_wet_wat_parsers_never_raise(noise, cut):
    # raw noise and truncated real streams degrade to complete-prefix
    # records, never exceptions
    assert isinstance(parse_wet(noise), list)
    assert isinstance(parse_wat(noise), list)
    real = build_wet([("https://a/x", "2024-01-01T00:00:00Z", "t")])
    assert isinstance(parse_wet(real[:cut % (len(real) + 1)]), list)
    realw = build_wat([("https://a/x", "2024-01-01T00:00:00Z",
                        {"title": "", "description": "", "links": []})])
    assert isinstance(parse_wat(realw[:cut % (len(realw) + 1)]), list)
