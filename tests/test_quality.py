"""Quality gate unit tests (M2-M4)."""

import pyarrow as pa

from webxtract.quality import QualityGate, score_page


def test_too_small():
    assert score_page(b"")[2] == "too_small"
    assert score_page(b"<html><bo")[2] == "too_small"
    assert score_page(None)[2] == "too_small"


def test_too_large():
    label, conf, reason, kind = score_page(b"<html>" + b"A" * 100_000)
    assert reason == "too_large"


def test_bad_encoding():
    bad = b"\xff\xfe" + bytes(range(128, 256)) + b"\x80" * 50
    assert score_page(bad)[2] == "bad_encoding"


def test_not_html():
    assert score_page(b"plain words " * 20)[2] == "not_html"


def test_good_html():
    html = b"<html><body><p>" + b"real text content here " * 20 + b"</p></body></html>"
    label, conf, reason, kind = score_page(html)
    assert (label, reason, kind) == ("good", None, "html")
    assert conf >= 50.0


def test_pdfish_detected():
    payload = b"%XYD1\n10 10 50 30 0 90.0 Hello\n" + b" " * 64
    label, conf, reason, kind = score_page(payload)
    assert (label, reason, kind) == ("good", None, "pdfish")


def test_low_quality_markup_only():
    html = (b"<div><span></span></div>" * 40) + b"<p>x</p>"
    label, conf, reason, kind = score_page(html)
    assert reason == "low_quality"
    assert label == "bad"


def test_gate_batch_columns():
    t = pa.table({
        "url": ["a", "b"],
        "html": [b"<p>" + b"good text here " * 20 + b"</p>", b""],
    })
    out = QualityGate()(t)
    assert out.column("quality_label").to_pylist() == ["good", "bad"]
    assert out.column("reject_reason").to_pylist() == [None, "too_small"]
    assert out.column("doc_kind").to_pylist() == ["html", "raw"]


def test_declared_cp1252_page_accepted():
    body = ('<html><head><meta charset="windows-1252"></head><body><p>'
            + "caf\xe9 content words here " * 20 + "</p></body></html>")
    raw = body.encode("cp1252")
    label, conf, reason, kind = score_page(raw)
    assert (label, reason, kind) == ("good", None, "html")
