"""ODT + RTF readers (ops/office.py): spec rules (stored mimetype,
destination skipping, escape protocols) and hostile-input behavior."""

import io
import zipfile

import pytest

from webxtract.ops.office import (
    build_odt, build_rtf, fixture_odt, fixture_rtf, odt_paragraphs,
    rtf_text,
)


def test_odt_mimetype_is_first_and_stored():
    d = fixture_odt(1)
    z = zipfile.ZipFile(io.BytesIO(d))
    info = z.infolist()[0]
    assert info.filename == "mimetype"
    assert info.compress_type == zipfile.ZIP_STORED
    # the spec's magic window: bytes 30..38 are the name, then the type
    assert d[30:38] == b"mimetype"
    assert d[38:].startswith(b"application/vnd.oasis.opendocument.text")


def test_odt_paragraphs_spans_tabs_spaces():
    # hand-built content.xml exercising text:tab, text:line-break and
    # the run-length text:s element
    from webxtract.ops.office import _build_zip_mixed, _ODT_MIME

    content = ('<?xml version="1.0"?><office:document-content>'
               "<office:body><office:text>"
               "<text:p>a<text:tab/>b<text:line-break/>c"
               '<text:s text:c="3"/>d</text:p>'
               "<text:h>head</text:h>"
               "<text:p>x<text:span>y&amp;z</text:span></text:p>"
               "</office:text></office:body>"
               "</office:document-content>")
    data = _build_zip_mixed([("mimetype", _ODT_MIME),
                             ("content.xml", content.encode())])
    assert odt_paragraphs(data) == ["a\tb\nc   d", "head", "xy&z"]


def test_odt_wrong_mimetype_rejected():
    from webxtract.ops.office import _build_zip_mixed

    data = _build_zip_mixed([("mimetype", b"application/zip"),
                             ("content.xml", b"<text:p>x</text:p>")])
    with pytest.raises(ValueError, match="mimetype"):
        odt_paragraphs(data)


def test_rtf_destinations_skipped():
    doc = (rb"{\rtf1\ansi{\fonttbl{\f0 Arial;}}{\colortbl;\red0;}"
           rb"{\*\generator Acme 9;}{\info{\title secret}}"
           rb"visible\par}")
    assert rtf_text(doc) == ["visible"]


def test_rtf_escapes_and_unicode():
    doc = (b"{\\rtf1 caf\\'e9 \\u20013? and \\u-32000? "
           b"brace \\{x\\} back\\\\slash\\par}")
    # \u-32000 is the RTF negative-16-bit form of U+8300
    txt = rtf_text(doc)[0]
    assert txt.startswith("caf\xe9 \u4e2d and \u8300")
    assert "brace {x} back\\slash" in txt


def test_rtf_uc_skip_protocol():
    # \uc2 means TWO fallback chars follow each \uN and must drop
    doc = b"{\\rtf1\\uc2 \\u20013??tail\\par}"
    assert rtf_text(doc) == ["\u4e2dtail"]
    # the fallback may also be a \'hh escape
    doc2 = b"{\\rtf1\\uc1 \\u20013\\'3ftail\\par}"
    assert rtf_text(doc2) == ["\u4e2dtail"]


def test_rtf_line_and_tab():
    doc = rb"{\rtf1 a\line b\tab c\par second\par}"
    assert rtf_text(doc) == ["a\nb\tc", "second"]


def test_rtf_not_rtf():
    with pytest.raises(ValueError):
        rtf_text(b"plain text")


def test_fixture_closed_forms():
    for i in (0, 1, 2, 3, 7, 11, 30):
        exp_o = [" ".join(f"o{(29 * i + 13 * p + 3 * k) % 83}"
                          for k in range(2 + (i + p) % 4))
                 for p in range(1 + i % 3)]
        assert odt_paragraphs(fixture_odt(i)) == exp_o
        exp_r = [" ".join(f"r{(37 * i + 17 * p + 7 * k) % 79}"
                          for k in range(2 + (i + p) % 3))
                 for p in range(2 + i % 3)]
        assert rtf_text(fixture_rtf(i)) == exp_r


def test_truncation_bitflip_no_hang():
    for make in (fixture_odt, fixture_rtf):
        data = make(9)
        for cut in range(0, len(data), max(1, len(data) // 19)):
            try:
                make_out = (odt_paragraphs if make is fixture_odt
                            else rtf_text)(data[:cut])
                assert isinstance(make_out, list)
            except (ValueError, Exception):  # noqa: B014
                pass
        for k in range(0, len(data), max(1, len(data) // 29)):
            mut = bytearray(data)
            mut[k] ^= 0xFF
            try:
                (odt_paragraphs if make is fixture_odt
                 else rtf_text)(bytes(mut))
            except Exception:  # noqa: BLE001 — degradation is data
                pass


def test_pipeline_extracts_odt_and_rtf():
    """ODT and RTF payloads flow through the flagship pipeline like
    DOCX: paragraphs -> LINE blocks -> normalizers."""
    import pyarrow as pa

    from webxtract.pipeline import extract_table

    def pages(payloads):
        n = len(payloads)
        return pa.table({
            "url": pa.array([f"https://o.example/{k}" for k in range(n)],
                            pa.string()),
            "warc_ts": pa.array([1_600_000_000_000_000 + k
                                 for k in range(n)], pa.timestamp("us")),
            "html": pa.array(payloads, pa.binary()),
            "text": pa.array([""] * n, pa.string()),
            "lang": pa.array(["en"] * n, pa.string()),
        })

    odt = build_odt([["Acme", "Supply", "Co"], ["Total:", "$9.99"]])
    rtf = build_rtf([["Acme", "Supply", "Co"], ["Total:", "$9.99"]])
    rows = extract_table(pages([odt, rtf])).to_pylist()
    for r in rows:
        assert r["vendor_value"] == "Acme Supply Co"
        assert r["route"] != "rejected"
