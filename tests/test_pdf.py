"""Real-PDF parser (ops/pdf.py): writer/parser round trips over every
layout axis, content-stream operator semantics with hand-computed
positions, filter/xref edge cases, and malformed-input degradation."""

import zlib

import pytest

from webxtract.ops.pdf import (
    DEFAULT_GLYPH_WIDTH, Lexer, Name, PdfDoc, Ref, _png_predictor_decode,
    _png_up_encode, build_pdf, extract_pdf_tokens, fixture_pdf, pdf_blocks,
    probe_pdf,
)


def _one_page(lines=None, kv=None, **kw):
    return build_pdf([{"lines": lines or [], "kv": kv}], **kw)


def _raw_pdf(content: str, **kw):
    return build_pdf([{"raw": content}], **kw)


# ---------------------------------------------------------------------------
# lexer / object model
# ---------------------------------------------------------------------------


def test_literal_string_escapes():
    lx = Lexer(rb"(a\(b\)c\\d\101\12e\n\t)")
    assert lx.next_token() == b"a(b)c\\dA\ne\n\t"


def test_literal_string_nesting_and_continuation():
    lx = Lexer(b"(outer (inner) tail)")
    assert lx.next_token() == b"outer (inner) tail"
    lx = Lexer(b"(split\\\nline)")
    assert lx.next_token() == b"splitline"


def test_hex_string_odd_padding_and_whitespace():
    lx = Lexer(b"<48 65 6C6C 6F2>")
    assert lx.next_token() == b"Hello "


def test_name_hash_escape():
    lx = Lexer(b"/A#20B#2FC")
    assert lx.next_token() == Name("A B/C")


def test_dict_with_refs_bools_null():
    lx = Lexer(b"<< /A 3 0 R /B true /C false /D null /E [1 2 0 R 3] >>")
    d = lx.parse_object()
    assert d["A"] == Ref(3, 0)
    assert d["B"] is True and d["C"] is False and d["D"] is None
    assert d["E"] == [1, Ref(2, 0), 3]


def test_comment_skipping():
    lx = Lexer(b"% a comment\n42 % trailing\n/N")
    assert lx.next_token() == 42
    assert lx.next_token() == Name("N")


# ---------------------------------------------------------------------------
# xref layouts
# ---------------------------------------------------------------------------

LINE = {"x": 72.0, "y": 720.0, "size": 12, "words": ["alpha", "beta"],
        "op": "tj"}


@pytest.mark.parametrize("kind", ["table", "xrefstream", "objstm"])
@pytest.mark.parametrize("flate,ahx", [(True, False), (False, True),
                                       (True, True), (False, False)])
def test_xref_kinds_and_filters_roundtrip(kind, flate, ahx):
    data = _one_page([dict(LINE)], xref_kind=kind, flate=flate, ahx=ahx)
    p = extract_pdf_tokens(data)
    assert p["xref_kind"] == kind
    toks = p["pages"][0]["tokens"]
    assert [t[4] for t in toks] == ["alpha", "beta"]
    # positions: word 1 at 72; word 2 after advance(alpha)+space
    adv = (len("alpha") + 1) * DEFAULT_GLYPH_WIDTH / 1000.0 * 12
    assert toks[0][0] == pytest.approx(72.0)
    assert toks[1][0] == pytest.approx(72.0 + adv)
    assert toks[0][1] == pytest.approx(720.0)


def test_predictor_row_coding_roundtrip():
    rows = [bytes([1, 0, 0, 40, 0]), bytes([1, 0, 0, 90, 0]),
            bytes([2, 0, 12, 3, 1])]
    enc = _png_up_encode(rows)
    assert _png_predictor_decode(enc, 5) == b"".join(rows)


def test_predictor_xref_stream_parses():
    data = _one_page([dict(LINE)], xref_kind="xrefstream", predictor=True)
    p = extract_pdf_tokens(data)
    assert p["xref_kind"] == "xrefstream"
    assert [t[4] for t in p["pages"][0]["tokens"]] == ["alpha", "beta"]


def test_incremental_update_chain():
    base = _one_page([dict(LINE)], xref_kind="table", update=False)
    upd = _one_page([dict(LINE)], xref_kind="table", update=True)
    pb, pu = extract_pdf_tokens(base), extract_pdf_tokens(upd)
    assert pu["n_xref_sections"] == pb["n_xref_sections"] + 1
    assert pu["n_objects"] == pb["n_objects"] + 1
    # updated file still extracts identically
    assert pu["pages"][0]["tokens"] == pb["pages"][0]["tokens"]


def test_update_newest_entry_wins():
    """An incremental section that REDEFINES an object must shadow the
    original (first-seen-wins while walking newest->oldest)."""
    base = _one_page([dict(LINE)], xref_kind="table")
    # append a replacement for object 1 (catalog) pointing at the same
    # pages tree, plus an xref section marking it
    out = bytearray(base)
    import re as _re
    prev = int(_re.findall(rb"startxref\s+(\d+)", base)[-1])
    off = len(out)
    out.extend(b"1 0 obj\n<< /Type /Catalog /Pages 2 0 R /V 2 >>\nendobj\n")
    xoff = len(out)
    out.extend((f"xref\n0 1\n0000000000 65535 f \n1 1\n{off:010d} 00000 n \n"
                f"trailer\n<< /Size 8 /Root 1 0 R /Prev {prev} >>\n"
                f"startxref\n{xoff}\n%%EOF\n").encode())
    doc = PdfDoc(bytes(out))
    assert doc.obj(1)["V"] == 2
    assert doc.n_xref_sections == 2


def test_objstm_members_resolve():
    data = _one_page([dict(LINE)], xref_kind="objstm")
    doc = PdfDoc(data)
    assert any(e[0] == 2 for e in doc.xref.values())
    cat = doc.resolve(doc.trailer["Root"])
    assert cat["Type"] == Name("Catalog")
    pages = doc.pages()
    assert len(pages) == 1 and "MediaBox" in pages[0]


def test_nested_pages_inheritance():
    data = _one_page([dict(LINE)], nested_pages=True,
                     media_box=(0, 0, 400, 500))
    doc = PdfDoc(data)
    pg = doc.pages()[0]
    # MediaBox and Resources inherited from the ROOT node two levels up
    assert doc.resolve(pg["MediaBox"]) == [0, 0, 400, 500]
    assert "Font" in doc.resolve(pg["Resources"])


def test_indirect_length():
    """/Length as an indirect reference (common in the wild)."""
    content = b"BT /F1 12 Tf 1 0 0 1 72 700 Tm (hi) Tj ET"
    comp = zlib.compress(content)
    body = (
        b"%PDF-1.4\n"
        b"1 0 obj\n<< /Type /Catalog /Pages 2 0 R >>\nendobj\n"
        b"2 0 obj\n<< /Type /Pages /Kids [ 3 0 R ] /Count 1 "
        b"/MediaBox [ 0 0 612 792 ] "
        b"/Resources << /Font << /F1 5 0 R >> >> >>\nendobj\n"
        b"3 0 obj\n<< /Type /Page /Parent 2 0 R /Contents 4 0 R >>\nendobj\n"
        b"4 0 obj\n<< /Length 6 0 R /Filter /FlateDecode >>\nstream\n"
        + comp + b"\nendstream\nendobj\n"
        b"5 0 obj\n<< /Type /Font /Subtype /Type1 /BaseFont /Courier >>\n"
        b"endobj\n"
        b"6 0 obj\n" + str(len(comp)).encode() + b"\nendobj\n")
    offs = {}
    pos = 0
    for n in range(1, 7):
        pos = body.find(f"{n} 0 obj".encode(), pos)
        offs[n] = pos
    out = bytearray(body)
    xoff = len(out)
    out.extend(b"xref\n0 7\n0000000000 65535 f \n")
    for n in range(1, 7):
        out.extend(f"{offs[n]:010d} 00000 n \n".encode())
    out.extend((f"trailer\n<< /Size 7 /Root 1 0 R >>\nstartxref\n{xoff}"
                f"\n%%EOF\n").encode())
    p = extract_pdf_tokens(bytes(out))
    assert [t[4] for t in p["pages"][0]["tokens"]] == ["hi"]


# ---------------------------------------------------------------------------
# content-stream operator semantics (hand-computed positions)
# ---------------------------------------------------------------------------


def _toks(content: str):
    return extract_pdf_tokens(_raw_pdf(content, flate=False))["pages"][0][
        "tokens"]


def test_td_tstar_leading():
    toks = _toks("BT /F1 10 Tf 14 TL 1 0 0 1 100 700 Tm (a) Tj "
                 "T* (b) Tj T* (c) Tj ET")
    assert [(t[4], t[0], t[1]) for t in toks] == [
        ("a", 100.0, 700.0), ("b", 100.0, 686.0), ("c", 100.0, 672.0)]


def test_TD_sets_leading_then_quote_advances():
    toks = _toks("BT /F1 10 Tf 1 0 0 1 50 500 Tm 0 -20 TD (x) Tj "
                 "(y) ' ET")
    # TD moved to (50, 480) and set TL=20; ' drops another 20
    assert [(t[4], t[0], t[1]) for t in toks] == [
        ("x", 50.0, 480.0), ("y", 50.0, 460.0)]


def test_doublequote_sets_tw_tc():
    toks = _toks('BT /F1 10 Tf 20 TL 1 0 0 1 10 300 Tm 2 3 (sp q) " '
                 "(tail) Tj ET")
    # " : Tw=2 Tc=3, T* to (10, 280), show "sp q"
    assert toks[0][4] == "sp q" and toks[0][1] == 280.0
    # advance of "sp q": 4 glyphs*6 + 4*Tc + 1 space*Tw = 24+12+2 = 38
    assert toks[1][0] == pytest.approx(10.0 + 38.0)


def test_tz_horizontal_scaling():
    toks = _toks("BT /F1 10 Tf 50 Tz 1 0 0 1 0 100 Tm (ab) Tj (c) Tj ET")
    # advance of "ab" = 2*6 = 12pt, halved by Tz 50 -> 6pt
    assert toks[1][0] == pytest.approx(6.0)


def test_tj_array_kerning():
    toks = _toks("BT /F1 10 Tf 1 0 0 1 0 50 Tm [ (a) -500 (b) ] TJ ET")
    # a advances 6pt, kerning -500 adds 5pt
    assert toks[1][0] == pytest.approx(6.0 + 5.0)


def test_cm_ctm_composition_and_qQ():
    toks = _toks("q 2 0 0 2 10 20 cm BT /F1 10 Tf 1 0 0 1 30 40 Tm "
                 "(s) Tj ET Q BT /F1 10 Tf 1 0 0 1 30 40 Tm (t) Tj ET")
    # inside q..Q: device = (30*2+10, 40*2+20) = (70, 100), size 20
    assert toks[0][:2] == (70.0, 100.0)
    assert toks[0][3] == pytest.approx(20.0)
    # after Q the CTM is restored
    assert toks[1][:2] == (30.0, 40.0)
    assert toks[1][3] == pytest.approx(10.0)


def test_rise_moves_baseline():
    toks = _toks("BT /F1 10 Tf 5 Ts 1 0 0 1 0 100 Tm (u) Tj ET")
    assert toks[0][1] == pytest.approx(105.0)


def test_custom_widths_honored():
    data = _one_page(
        [{"x": 0.0, "y": 100.0, "size": 10, "words": ["aa"], "op": "tj"}],
        flate=False, font_widths=[250] * 95)
    toks = extract_pdf_tokens(data)["pages"][0]["tokens"]
    # x1 - x0 = 2 chars * 250/1000 * 10 = 5pt (not the 12pt Courier
    # fallback) — proves /Widths is actually read
    assert toks[0][2] - toks[0][0] == pytest.approx(5.0)


def test_show_outside_bt_ignored():
    assert _toks("(loose) Tj BT /F1 10 Tf 1 0 0 1 0 0 Tm (ok) Tj ET") \
        and _toks("(loose) Tj")[0:0] == []


# ---------------------------------------------------------------------------
# layout bridge + fixtures
# ---------------------------------------------------------------------------


def test_blocks_line_and_kv():
    data = _one_page(
        [{"x": 72.0, "y": 720.0, "size": 12, "words": ["hello", "world"],
          "op": "tj"}],
        kv=("total:", "42", 72.0, 700.0, 12))
    blocks = pdf_blocks(data)
    lines = [b for b in blocks if b["block_type"] == "LINE"]
    kvs = [b for b in blocks if b["block_type"] == "KV"]
    assert [b["text"] for b in lines] == ["hello world", "total: 42"]
    assert [(b["key_text"], b["value_text"]) for b in kvs] == [("total", "42")]


def test_fixture_axes_cover_all_variants():
    kinds, filts, upd, nested = set(), set(), set(), set()
    for i in range(100):
        p = probe_pdf(fixture_pdf(i))
        assert p["ok"], (i, p["reason"])
        kinds.add(p["xref_kind"])
        filts.add(p["content_filter"])
        upd.add(p["n_xref_sections"])
        nested.add(i % 9 == 0)
    assert kinds == {"table", "xrefstream", "objstm"}
    assert filts == {"plain", "flate", "ahx", "ahx+flate"}
    assert upd == {1, 2}


def test_fixture_text_closed_form():
    for i in (0, 7, 11, 22, 45):
        blocks = pdf_blocks(fixture_pdf(i))
        np_ = 1 + i % 3
        for p in range(np_):
            nl = 3 + (i + p) % 4
            exp = [" ".join(f"w{(31 * i + 17 * p + 7 * l + w) % 97}"
                            for w in range(2 + (i + p + l) % 3))
                   for l in range(nl)]
            exp.append(f"k{(i + p) % 10}: v{(13 * i + p) % 100}")
            got = [b["text"] for b in sorted(
                (b for b in blocks
                 if b["block_type"] == "LINE" and b["page"] == p),
                key=lambda b: b["reading_order"])]
            assert got == exp, (i, p)


# ---------------------------------------------------------------------------
# malformed input degrades to data, never raises
# ---------------------------------------------------------------------------


def test_truncation_never_raises():
    data = fixture_pdf(12)
    for cut in range(0, len(data), max(1, len(data) // 37)):
        p = probe_pdf(data[:cut])
        assert isinstance(p["ok"], bool)


def test_bitflip_never_raises():
    data = bytearray(fixture_pdf(30))
    for k in range(0, len(data), max(1, len(data) // 53)):
        mut = bytearray(data)
        mut[k] ^= 0xFF
        p = probe_pdf(bytes(mut))
        assert isinstance(p["ok"], bool)


def test_garbage_and_empty():
    assert probe_pdf(b"")["ok"] is False
    assert probe_pdf(b"not a pdf at all")["ok"] is False
    assert probe_pdf(b"%PDF-1.4\n%%EOF\n")["ok"] is False


def test_scan_fallback_recovers_truncated_xref():
    """Chop the xref table off entirely: the brute object scan should
    still find the catalog and extract the text."""
    data = _one_page([dict(LINE)], xref_kind="table", flate=False)
    cut = data.rfind(b"xref")
    p = probe_pdf(data[:cut])
    assert p["ok"] and p["n_pages"] == 1
    toks = extract_pdf_tokens(data[:cut])["pages"][0]["tokens"]
    assert [t[4] for t in toks] == ["alpha", "beta"]


# ---------------------------------------------------------------------------
# flagship-pipeline integration: real PDFs as a first-class doc_kind
# ---------------------------------------------------------------------------


def _pages_table(payloads):
    import pyarrow as pa

    n = len(payloads)
    return pa.table({
        "url": pa.array([f"https://pdf.example/{k}" for k in range(n)],
                        pa.string()),
        "warc_ts": pa.array([1_600_000_000_000_000 + k for k in range(n)],
                            pa.timestamp("us")),
        "html": pa.array(payloads, pa.binary()),
        "text": pa.array([""] * n, pa.string()),
        "lang": pa.array(["en"] * n, pa.string()),
    })


def _invoice_pdf():
    return build_pdf([{
        "lines": [
            {"x": 72.0, "y": 720.0, "size": 12,
             "words": ["Acme", "Supply", "Co"], "op": "tj"},
            {"x": 72.0, "y": 704.0, "size": 12,
             "words": ["Invoice", "for", "services"], "op": "tjarr"},
            {"x": 72.0, "y": 660.0, "size": 12, "words": ["Date:"],
             "op": "tj"},
            {"x": 200.0, "y": 660.0, "size": 12, "words": ["2024-03-05"],
             "op": "tj"},
            {"x": 72.0, "y": 644.0, "size": 12, "words": ["Total:"],
             "op": "tj"},
            {"x": 200.0, "y": 644.0, "size": 12, "words": ["$123.45"],
             "op": "tj"},
        ]}])


def _invoice_xyd():
    # the SAME logical invoice in the synthetic positioned-text format,
    # constant conf 100 (the PDF path's constant) so every extracted
    # field — values AND confidences — must agree between formats
    lines = ["%XYD1"]

    def tok(x0, y0, text):
        lines.append(f"{x0:.1f} {y0:.1f} {x0 + 18 * len(text):.1f} "
                     f"{y0 + 24:.1f} 0 100.0 {text}")

    x = 100.0
    for w in ["Acme", "Supply", "Co"]:
        tok(x, 40.0, w)
        x += 18 * len(w) + 12
    x = 100.0
    for w in ["Invoice", "for", "services"]:
        tok(x, 80.0, w)
        x += 18 * len(w) + 12
    tok(80.0, 160.0, "Date:")
    tok(320.0, 160.0, "2024-03-05")
    tok(80.0, 200.0, "Total:")
    tok(320.0, 200.0, "$123.45")
    return ("\n".join(lines) + "\n").encode()


def test_pdf_doc_kind_detected():
    from webxtract.quality import score_page

    label, conf, reason, kind = score_page(_invoice_pdf())
    assert (label, reason, kind) == ("good", None, "pdf")


def test_pipeline_extracts_real_pdf_like_xyd():
    """A real PDF invoice must flow through the flagship extraction
    pipeline and yield the SAME extracted fields as the equivalent
    %XYD1 positioned-text payload — the two frontends share the layout
    and normalize stages, so values and confidences must agree."""
    from webxtract.pipeline import extract_table

    res_pdf = extract_table(_pages_table([_invoice_pdf()])).to_pylist()[0]
    res_xyd = extract_table(_pages_table([_invoice_xyd()])).to_pylist()[0]
    assert res_pdf["vendor_value"] == "Acme Supply Co"
    assert res_pdf["route"] != "rejected"
    for f in ("vendor_value", "vendor_conf", "date_value", "date_conf",
              "total_value", "total_conf", "model_confidence", "route"):
        assert res_pdf[f] == res_xyd[f], f
    # reading-order text identical line-for-line as well
    assert res_pdf["extracted_text"] == res_xyd["extracted_text"]


def test_pipeline_corrupt_pdf_is_data_not_error():
    """A truncated PDF behind the magic must come out as an empty-doc
    DATA row (the poison-row rule), never a task failure."""
    from webxtract.pipeline import extract_table

    data = _invoice_pdf()[:200] + b" " * 80  # keep it over min_bytes
    res = extract_table(_pages_table([data])).to_pylist()[0]
    assert res["extracted_text"] == ""
    # EMPTY_RESULT semantics: fields present but empty, row survives
    assert res["vendor_value"] in (None, "")
    assert res["model_confidence"] == 0.0
