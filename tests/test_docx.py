"""DOCX reader (ops/docx.py): PKZIP walk cross-checked against stdlib
zipfile in BOTH directions, WordprocessingML scanner semantics, and
hostile-input degradation."""

import io
import zipfile

import pytest

from webxtract.ops.docx import (
    build_docx, build_zip, docx_paragraphs, fixture_docx, probe_docx,
    read_zip,
)


def test_zip_roundtrip_and_stdlib_reads_ours():
    data = build_zip([("a.txt", b"hello" * 100),
                      ("dir/b.bin", bytes(range(256)))],
                     comment=b"trailing comment")
    z = zipfile.ZipFile(io.BytesIO(data))
    assert z.read("a.txt") == b"hello" * 100
    assert z.read("dir/b.bin") == bytes(range(256))
    assert z.comment == b"trailing comment"
    mine = read_zip(data)
    assert mine["a.txt"] == b"hello" * 100


def test_our_reader_reads_stdlib_zip():
    buf = io.BytesIO()
    with zipfile.ZipFile(buf, "w", zipfile.ZIP_DEFLATED) as z:
        z.writestr("x/y.txt", "payload " * 50)
        z.writestr("s.txt", "stored", compress_type=zipfile.ZIP_STORED)
    mine = read_zip(buf.getvalue())
    assert mine["x/y.txt"] == b"payload " * 50
    assert mine["s.txt"] == b"stored"


def test_crc_mismatch_detected():
    data = bytearray(build_zip([("a.txt", b"payload-bytes")],
                               deflate=False))
    data[data.find(b"payload-bytes")] ^= 0xFF  # corrupt STOREd payload
    with pytest.raises(ValueError, match="CRC"):
        read_zip(bytes(data))


def test_paragraph_runs_tabs_breaks_entities():
    # hand-built document.xml exercising controls the writer's word
    # API doesn't emit
    doc = ('<?xml version="1.0"?><w:document><w:body>'
           "<w:p><w:r><w:t>a</w:t></w:r><w:tab/><w:r><w:t>b</w:t>"
           "</w:r><w:br/><w:r><w:t>c&amp;d&#233;</w:t></w:r></w:p>"
           "<w:p/>"
           "<w:p><w:r><w:t xml:space=\"preserve\"> lead</w:t></w:r>"
           "</w:p></w:body></w:document>")
    data = build_zip([("word/document.xml", doc.encode())])
    assert docx_paragraphs(data) == ["a\tb\nc&d\xe9", " lead"]


def test_fixture_closed_form():
    for i in (0, 1, 2, 3, 5, 8, 13, 21):
        p = probe_docx(fixture_docx(i))
        assert p["ok"]
        exp = [" ".join(f"d{(23 * i + 11 * q + 5 * k) % 89}"
                        for k in range(3 + (i + q) % 3))
               for q in range(2 + i % 4)]
        assert p["paragraphs"] == exp, i


def test_escapes_roundtrip():
    d = build_docx([["a&b", "<tag>", 'q"uote']])
    assert probe_docx(d)["paragraphs"] == ['a&b <tag> q"uote']


def test_missing_document_part_is_error_row():
    data = build_zip([("other.xml", b"<x/>")])
    p = probe_docx(data)
    assert p["ok"] is False and "document.xml" in p["reason"]


def test_truncation_and_bitflips_never_raise():
    for i in (4, 7):
        data = fixture_docx(i)
        for cut in range(0, len(data), max(1, len(data) // 23)):
            assert isinstance(probe_docx(data[:cut])["ok"], bool)
        for k in range(0, len(data), max(1, len(data) // 37)):
            mut = bytearray(data)
            mut[k] ^= 0xFF
            assert isinstance(probe_docx(bytes(mut))["ok"], bool)


def test_garbage():
    assert probe_docx(b"")["ok"] is False
    assert probe_docx(b"PK\x03\x04 not a real zip")["ok"] is False


def test_pipeline_extracts_docx():
    """A DOCX invoice flows through the flagship pipeline: vendor from
    the first paragraph, date/total candidates from 'Label: value'
    paragraphs; a non-DOCX zip degrades to an empty-doc DATA row."""
    import pyarrow as pa

    from webxtract.pipeline import extract_table

    def pages(payloads):
        n = len(payloads)
        return pa.table({
            "url": pa.array([f"https://d.example/{k}" for k in range(n)],
                            pa.string()),
            "warc_ts": pa.array([1_600_000_000_000_000 + k
                                 for k in range(n)], pa.timestamp("us")),
            "html": pa.array(payloads, pa.binary()),
            "text": pa.array([""] * n, pa.string()),
            "lang": pa.array(["en"] * n, pa.string()),
        })

    docx = build_docx([["Acme", "Supply", "Co"],
                       ["Date:", "2024-03-05"],
                       ["Total:", "$123.45"]])
    nonword = build_zip([("other.bin", b"\x00" * 200)])
    rows = extract_table(pages([docx, nonword])).to_pylist()
    assert rows[0]["vendor_value"] == "Acme Supply Co"
    assert rows[0]["route"] != "rejected"
    assert rows[0]["extracted_text"].startswith("Acme Supply Co")
    assert rows[1]["extracted_text"] == ""  # poison row, not a failure
