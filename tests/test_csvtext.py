"""CSV reader (ops/csvtext.py): RFC 4180 machine + quote-aware
sniffing, differential against the stdlib csv module."""

import csv as stdcsv
import io

import pytest

from webxtract.ops.csvtext import (
    _CANDIDATES, build_csv, fixture_csv, parse_csv, sniff_delimiter,
)


def test_quoted_edge_cases():
    text = ('a,"b,c","d""e","f\ng",\r\n'
            '"",x,"y",z,tail\r\n')
    assert parse_csv(text, ",") == [
        ["a", "b,c", 'd"e', "f\ng", ""],
        ["", "x", "y", "z", "tail"]]


def test_writer_reader_roundtrip_and_stdlib_agreement():
    rows = [["plain", "with,comma", 'with"quote', "multi\nline", ""],
            ["", ",", '"', "\n", "end"]]
    for d in _CANDIDATES:
        text = build_csv(rows, d)
        assert parse_csv(text, d) == rows
        assert list(stdcsv.reader(io.StringIO(text), delimiter=d)) == rows


def test_sniffing_not_fooled_by_quoted_delimiters():
    # a semicolon file whose QUOTED values are full of commas: the
    # comma hypothesis mis-parses straight through quote boundaries
    # (bare-quote signal) and must lose to the semicolon hypothesis
    text = '"a,b";"c,d"\r\n"e,f";"g,h"\r\n'
    assert sniff_delimiter(text) == ";"
    assert parse_csv(text) == [["a,b", "c,d"], ["e,f", "g,h"]]


def test_sniffing_requires_consistency():
    with pytest.raises(ValueError):
        sniff_delimiter("no delimiters here\njust text\n")


def test_unterminated_quote_raises():
    with pytest.raises(ValueError, match="unterminated"):
        parse_csv('a,"broken\n', ",")


def test_fixture_closed_form_and_stdlib_differential():
    from webxtract.ops.csvtext import _cell

    for i in (0, 1, 2, 3, 5, 8, 13, 21):
        text = fixture_csv(i).decode()
        d = sniff_delimiter(text)
        assert d == _CANDIDATES[i % 4]
        rows = parse_csv(text, d)
        exp = [[_cell(i, r, c, d) for c in range(2 + i % 3)]
               for r in range(2 + (i + 1) % 3)]
        assert rows == exp, i
        assert list(stdcsv.reader(io.StringIO(text), delimiter=d)) == exp


def test_truncation_bitflips_never_hang():
    data = fixture_csv(7)
    for cut in range(0, len(data), max(1, len(data) // 17)):
        try:
            parse_csv(data[:cut].decode("utf-8", "replace"))
        except ValueError:
            pass
    for k in range(0, len(data), max(1, len(data) // 29)):
        mut = bytearray(data)
        mut[k] ^= 0x22  # flip quote-ish bits to stress the machine
        try:
            parse_csv(bytes(mut).decode("utf-8", "replace"))
        except ValueError:
            pass
