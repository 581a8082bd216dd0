"""PPTX reader (ops/pptx.py): slide ordering, DrawingML run scan,
hostile input."""

from webxtract.ops.pptx import build_pptx, fixture_pptx, pptx_slides


def test_numeric_slide_ordering():
    # 11 slides: lexicographic would put slide10 before slide2
    deck = build_pptx([[[f"s{n}"]] for n in range(11)])
    got = pptx_slides(deck)
    assert [p[0] for p in got] == [f"s{n}" for n in range(11)]


def test_runs_breaks_entities():
    deck = build_pptx([[["a&b", "<c>"]]])
    assert pptx_slides(deck) == [["a&b <c>"]]


def test_fixture_closed_form():
    for i in (0, 1, 2, 3, 5, 9):
        got = pptx_slides(fixture_pptx(i))
        exp = [[" ".join(f"p{(41 * i + 19 * s + 7 * p + 3 * k) % 73}"
                         for k in range(2 + (i + s + p) % 2))
                for p in range(2 + (i + s) % 3)]
               for s in range(1 + i % 3)]
        assert got == exp, i


def test_no_slides_is_error():
    import pytest

    from webxtract.ops.docx import build_zip

    with pytest.raises(ValueError, match="slide"):
        pptx_slides(build_zip([("ppt/presentation.xml", b"<p:p/>")]))


def test_truncation_bitflips_never_hang():
    data = fixture_pptx(4)
    for cut in range(0, len(data), max(1, len(data) // 17)):
        try:
            pptx_slides(data[:cut])
        except Exception:  # noqa: BLE001 — degradation is data
            pass
    for k in range(0, len(data), max(1, len(data) // 29)):
        mut = bytearray(data)
        mut[k] ^= 0xFF
        try:
            pptx_slides(bytes(mut))
        except Exception:  # noqa: BLE001
            pass
