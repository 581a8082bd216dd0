"""XLSX reader (ops/xlsx.py): shared-strings resolution, A1 decode,
cell kinds, and hostile-input behavior."""

import io
import zipfile

import pytest

from webxtract.ops.xlsx import (
    build_xlsx, col_index, col_letter, fixture_xlsx, xlsx_cells,
)


def test_column_letters_bijective():
    assert col_letter(0) == "A" and col_letter(25) == "Z"
    assert col_letter(26) == "AA" and col_letter(701) == "ZZ"
    assert col_letter(702) == "AAA"
    for v in (0, 1, 25, 26, 27, 700, 701, 702, 16383):
        assert col_index(col_letter(v)) == v


def test_shared_strings_deduplicated():
    cells = [(0, 0, "s", "dup"), (1, 0, "s", "dup"), (2, 0, "s", "other")]
    data = build_xlsx(cells)
    z = zipfile.ZipFile(io.BytesIO(data))
    sst = z.read("xl/sharedStrings.xml").decode()
    assert sst.count("dup") == 1  # stored once, referenced twice
    got = xlsx_cells(data)
    assert [v for *_unused, v in got] == ["dup", "dup", "other"]


def test_multirun_si_concatenates():
    # every third unique shared string is written as a two-run rich si
    cells = [(0, k, "s", f"string{k}") for k in range(4)]
    data = build_xlsx(cells)
    sst = zipfile.ZipFile(io.BytesIO(data)) \
        .read("xl/sharedStrings.xml").decode()
    assert "<r><t>" in sst  # the rich form exists...
    got = xlsx_cells(data)
    assert [v for *_unused, v in got] == [f"string{k}" for k in range(4)]


def test_cell_kinds():
    cells = [(0, 0, "s", "txt"), (0, 1, "n", "3.25"),
             (0, 2, "inline", "in&line"), (0, 3, "b", True),
             (0, 4, "b", False)]
    got = xlsx_cells(build_xlsx(cells))
    assert got == [(0, 0, "s", "txt"), (0, 1, "n", "3.25"),
                   (0, 2, "inline", "in&line"), (0, 3, "b", "TRUE"),
                   (0, 4, "b", "FALSE")]


def test_wide_column_refs():
    cells = [(0, 26, "n", "1"), (4, 701, "n", "2"), (9, 702, "n", "3")]
    got = xlsx_cells(build_xlsx(cells))
    assert got == [(0, 26, "n", "1"), (4, 701, "n", "2"),
                   (9, 702, "n", "3")]


def test_fixture_closed_form():
    for i in (0, 1, 2, 3, 5, 8, 13):
        got = xlsx_cells(fixture_xlsx(i))
        exp = []
        for r in range(2 + i % 3):
            for c in range(2 + (i + r) % 3):
                sel = (i + r + c) % 3
                if sel == 0:
                    exp.append((r, c, "s",
                                f"s{(19 * i + 7 * r + 3 * c) % 23}"))
                elif sel == 1:
                    exp.append((r, c, "n",
                                str((13 * i + 5 * r + c) % 1000)))
                else:
                    exp.append((r, c, "inline",
                                f"x{(17 * i + 3 * r + c) % 61}"))
        assert got == exp, i


def test_missing_sheet_is_error():
    from webxtract.ops.docx import build_zip

    with pytest.raises(ValueError, match="sheet1"):
        xlsx_cells(build_zip([("other.xml", b"<x/>")]))


def test_truncation_bitflips_never_hang():
    data = fixture_xlsx(6)
    for cut in range(0, len(data), max(1, len(data) // 21)):
        try:
            xlsx_cells(data[:cut])
        except Exception:  # noqa: BLE001 — degradation is data
            pass
    for k in range(0, len(data), max(1, len(data) // 33)):
        mut = bytearray(data)
        mut[k] ^= 0xFF
        try:
            xlsx_cells(bytes(mut))
        except Exception:  # noqa: BLE001
            pass
