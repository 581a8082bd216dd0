"""EPUB reader (ops/epub.py): OCF mimetype rule, spine-order
resolution against rotated storage, hostile input."""

import pytest

from webxtract.ops.docx import read_zip
from webxtract.ops.epub import build_epub, epub_chapters, fixture_epub


def test_mimetype_rule():
    d = fixture_epub(1)
    assert d[30:38] == b"mimetype"
    assert d[38:].startswith(b"application/epub+zip")
    with pytest.raises(ValueError, match="mimetype"):
        from webxtract.ops.office import _build_zip_mixed

        epub_chapters(_build_zip_mixed([("mimetype", b"text/plain")]))


def test_spine_order_beats_file_order():
    b = build_epub([[["first"]], [["second"]], [["third"]]], rotate=1)
    # storage is rotated: file chap0 holds the LAST spine chapter
    assert b"third" in read_zip(b)["OEBPS/chap0.xhtml"]
    # ...but extraction follows the spine
    assert epub_chapters(b) == [["first"], ["second"], ["third"]]


def test_missing_spine_target_is_error():
    b = bytearray(build_epub([[["x"]]]))
    # corrupt the chapter file name in the central directory AND the
    # local header so the spine target goes missing
    data = bytes(b).replace(b"chap0.xhtml", b"chap9.xhtml")
    with pytest.raises(ValueError):
        epub_chapters(data)


def test_entities_and_markup_stripped():
    b = build_epub([[["a&b"], ["x<i>y</i>z".replace("<i>", "").replace(
        "</i>", "")]]])
    assert epub_chapters(b) == [["a&b", "xyz"]]


def test_fixture_closed_form():
    for i in (0, 1, 2, 3, 5, 8, 13):
        got = epub_chapters(fixture_epub(i))
        exp = [[" ".join(f"e{(43 * i + 23 * s + 11 * p + 5 * k) % 67}"
                         for k in range(2 + (i + s + p) % 2))
                for p in range(2 + (i + s) % 3)]
               for s in range(1 + i % 4)]
        assert got == exp, i


def test_truncation_bitflips_never_hang():
    data = fixture_epub(6)
    for cut in range(0, len(data), max(1, len(data) // 17)):
        try:
            epub_chapters(data[:cut])
        except Exception:  # noqa: BLE001 — degradation is data
            pass
    for k in range(0, len(data), max(1, len(data) // 29)):
        mut = bytearray(data)
        mut[k] ^= 0xFF
        try:
            epub_chapters(bytes(mut))
        except Exception:  # noqa: BLE001
            pass
