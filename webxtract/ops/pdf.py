"""Real-PDF (ISO 32000) text extraction WITHOUT pdfminer — pure-spec
object/xref walk + content-stream text interpreter.

The engine's layout half (`pdflayout.py`) implements the Textract
FORMS/TABLES analogue — phrase grouping, recursive XY-cut reading
order, geometric KV pairing — over positioned tokens, but until now
its only frontend was the synthetic ``%XYD1`` positioned-text format
(FIXTURES.md §2).  Real crawls carry real PDFs (Common Crawl serves
~3% ``application/pdf`` responses), and the north-star names "a PDF
layout parser" explicitly.  This module closes that format gap the
same way `ops/mp4.py` closed containerized video: a from-public-spec
parser plus a from-scratch *writer* so fixtures are REAL PDF files
synthesized deterministically, and the parser is certified against
files it did not "remember".

  * `build_pdf` — a writer emitting genuine PDF bytes with the layout
    axes a 100 TB crawl actually shows, varied per fixture file:
    classic xref tables vs PDF-1.5 cross-reference streams vs
    compressed object streams (ObjStm + type-2 xref entries),
    FlateDecode / ASCIIHexDecode / cascaded filters, the PNG Up
    predictor (12) on xref streams, nested page trees with INHERITED
    MediaBox/Resources, incremental updates (a /Prev xref chain), and
    Tj / TJ-with-kerning / hex-string show operators.
  * `PdfDoc` — tokenizer (literal strings with all ISO 32000 §7.3.4
    escapes, hex strings, #xx name escapes, dicts/arrays/refs), xref
    chain walk (tables AND streams, newest-section-wins merge, ObjStm
    member resolution, indirect /Length) with a brute object-scan
    fallback for truncated tails.
  * `extract_pdf_tokens` — a text-state machine over the content
    stream (BT/ET, Tf, Td/TD/Tm/T*/TL, Tc/Tw/Tz/Ts, q/Q/cm CTM
    composition, Tj/TJ/'/") emitting per-show positioned tokens with
    real advance arithmetic from the font's /Widths (600/1000 Courier
    fallback), exactly the token IR `pdflayout.tokens_to_blocks`
    consumes — so reading order, KV pairing and grids come from the
    SAME grouping/XY-cut machinery as the %XYD1 path, zero duplication.
  * `probe_pdf` — the structural summary (pages, xref kind, filters,
    object and xref-section counts, show/char tallies) that degrades
    malformed input to ``ok=False`` DATA rows, never task errors.

Scale shape: one PDF is one row (binary column); parse + interpret is
map-side compute over the single blob, nothing shuffles but the slim
extracted rows.  At 100 TB the unit of parallelism is the file,
exactly like the WARC/MP4 readers.

Reference mapping: the reference's Textract call analyzes one
document image per Lambda invoke and its post-processors consume
positioned LINE/KV/TABLE blocks
(source/ocr/textract-integration/fn-call-textract/main.py:52-61);
this module produces those same Block IR rows from real PDF bytes via
`pdf_blocks`, feeding the unchanged normalize/confidence stages.
"""

from __future__ import annotations

import binascii
import re
import zlib
from typing import NamedTuple

import pyarrow as pa

DEFAULT_GLYPH_WIDTH = 600  # /1000 text-space units (Courier metric)
_SPACE = 32


# ---------------------------------------------------------------------------
# matrices (row-vector convention: p' = [x y 1] . M,  M = (a b c d e f))
# ---------------------------------------------------------------------------

ID6 = (1.0, 0.0, 0.0, 1.0, 0.0, 0.0)


def _mat_mul(m, n):
    a1, b1, c1, d1, e1, f1 = m
    a2, b2, c2, d2, e2, f2 = n
    return (a1 * a2 + b1 * c2, a1 * b2 + b1 * d2,
            c1 * a2 + d1 * c2, c1 * b2 + d1 * d2,
            e1 * a2 + f1 * c2 + e2, e1 * b2 + f1 * d2 + f2)


def _mat_apply(m, x, y):
    a, b, c, d, e, f = m
    return (x * a + y * c + e, x * b + y * d + f)


def _translate(tx, ty):
    return (1.0, 0.0, 0.0, 1.0, tx, ty)


# ---------------------------------------------------------------------------
# writer
# ---------------------------------------------------------------------------


def _fmt_num(v) -> str:
    if isinstance(v, int) or float(v).is_integer():
        return str(int(v))
    return f"{v:.4f}".rstrip("0").rstrip(".")


def _esc_literal(s: str) -> str:
    return s.replace("\\", r"\\").replace("(", r"\(").replace(")", r"\)")


def _advance_pts(text: str, size: float,
                 width: int = DEFAULT_GLYPH_WIDTH) -> float:
    """Writer-side advance of a shown string in points (no Tc/Tw/Tz —
    the fixture content never sets them)."""
    return len(text) * width / 1000.0 * size


def _png_up_encode(rows: list[bytes]) -> bytes:
    out = bytearray()
    prev = bytes(len(rows[0])) if rows else b""
    for r in rows:
        out.append(2)  # PNG filter type 2: Up
        out.extend((r[i] - prev[i]) & 0xFF for i in range(len(r)))
        prev = r
    return bytes(out)


def _png_predictor_decode(data: bytes, columns: int) -> bytes:
    out = bytearray()
    prev = bytes(columns)
    step = columns + 1
    for off in range(0, len(data), step):
        ft = data[off]
        row = bytearray(data[off + 1:off + 1 + columns])
        if ft == 2:          # Up
            for i in range(columns):
                row[i] = (row[i] + prev[i]) & 0xFF
        elif ft == 1:        # Sub
            for i in range(1, columns):
                row[i] = (row[i] + row[i - 1]) & 0xFF
        elif ft != 0:
            raise ValueError(f"unsupported PNG predictor filter {ft}")
        out.extend(row)
        prev = bytes(row)
    return bytes(out)


def _content_for_page(page: dict) -> str:
    """Render one page spec to a content stream.

    page = {"lines": [{"x", "y", "size", "words": [...],
                       "op": "tj"|"tjarr"|"hex"}],
            "kv": (label, value, x, y, size) | None}
    """
    if "raw" in page:
        return page["raw"]
    ops: list[str] = ["BT"]
    for ln in page.get("lines", []):
        size = ln.get("size", 12)
        x, y = ln["x"], ln["y"]
        words = ln["words"]
        op = ln.get("op", "tj")
        space = DEFAULT_GLYPH_WIDTH / 1000.0 * size
        ops.append(f"/F1 {_fmt_num(size)} Tf")
        if op == "tjarr":
            ops.append(f"1 0 0 1 {_fmt_num(x)} {_fmt_num(y)} Tm")
            parts = []
            for k, w in enumerate(words):
                if k:
                    parts.append(str(-DEFAULT_GLYPH_WIDTH))  # one space advance
                parts.append(f"({_esc_literal(w)})")
            ops.append("[ " + " ".join(parts) + " ] TJ")
        elif op == "hex":
            cx = x
            for w in words:
                ops.append(f"1 0 0 1 {_fmt_num(cx)} {_fmt_num(y)} Tm")
                ops.append(f"<{w.encode('latin-1').hex()}> Tj")
                cx += _advance_pts(w, size) + space
        else:  # "tj": first word from Tm, then relative Td hops
            ops.append(f"1 0 0 1 {_fmt_num(x)} {_fmt_num(y)} Tm")
            for k, w in enumerate(words):
                if k:
                    dx = _advance_pts(words[k - 1], size) + space
                    ops.append(f"{_fmt_num(dx)} 0 Td")
                ops.append(f"({_esc_literal(w)}) Tj")
    kv = page.get("kv")
    if kv:
        label, value, x, y, size = kv
        gap = 40.0  # > GROUP_GAP in layout units: label/value stay two groups
        ops.append(f"/F1 {_fmt_num(size)} Tf")
        ops.append(f"1 0 0 1 {_fmt_num(x)} {_fmt_num(y)} Tm")
        ops.append(f"({_esc_literal(label)}) Tj")
        vx = x + _advance_pts(label, size) + gap
        ops.append(f"1 0 0 1 {_fmt_num(vx)} {_fmt_num(y)} Tm")
        ops.append(f"({_esc_literal(value)}) Tj")
    ops.append("ET")
    return "\n".join(ops)


def _stream_obj(dict_extra: str, raw: bytes, flate: bool, ahx: bool) -> bytes:
    data = raw
    filters = []
    if flate:
        data = zlib.compress(data, 6)
        filters.append("/FlateDecode")
    if ahx:
        data = binascii.hexlify(data) + b">"
        filters.insert(0, "/ASCIIHexDecode")
    if len(filters) == 1:
        f = f" /Filter {filters[0]}"
    elif filters:
        f = f" /Filter [ {' '.join(filters)} ]"
    else:
        f = ""
    head = f"<< {dict_extra} /Length {len(data)}{f} >>".encode("latin-1")
    return head + b"\nstream\n" + data + b"\nendstream"


def build_pdf(pages: list[dict], *, xref_kind: str = "table",
              flate: bool = True, ahx: bool = False,
              predictor: bool = False, nested_pages: bool = False,
              update: bool = False, media_box=(0, 0, 612, 792),
              font_widths: list[int] | None = None,
              font_first_char: int = 32) -> bytes:
    """Serialize page specs (see `_content_for_page`) to real PDF bytes.

    Layout axes: `xref_kind` in {"table", "xrefstream", "objstm"};
    `flate`/`ahx` filter the content streams (both => cascaded
    [/ASCIIHexDecode /FlateDecode]); `predictor` applies PNG Up rows to
    the xref stream; `nested_pages` inserts an intermediate /Pages node
    (MediaBox + Resources stay on the ROOT node: inheritance through
    two levels); `update` appends an incremental-update section with a
    /Prev chain adding one object.
    """
    np_ = len(pages)
    nested = 1 if nested_pages else 0
    font_num = 3 + nested
    first_page = font_num + 1
    # logical objects, dense numbering from 1
    dict_objs: dict[int, str] = {}
    parent = 3 if nested_pages else 2
    kids = " ".join(f"{first_page + 2 * k} 0 R" for k in range(np_))
    mb = f"[ {' '.join(_fmt_num(v) for v in media_box)} ]"
    widths = font_widths or [DEFAULT_GLYPH_WIDTH] * 95
    dict_objs[1] = "<< /Type /Catalog /Pages 2 0 R >>"
    if nested_pages:
        dict_objs[2] = (f"<< /Type /Pages /Kids [ 3 0 R ] /Count {np_} "
                        f"/MediaBox {mb} /Resources << /Font "
                        f"<< /F1 {font_num} 0 R >> >> >>")
        dict_objs[3] = (f"<< /Type /Pages /Parent 2 0 R /Kids [ {kids} ] "
                        f"/Count {np_} >>")
    else:
        dict_objs[2] = (f"<< /Type /Pages /Kids [ {kids} ] /Count {np_} "
                        f"/MediaBox {mb} /Resources << /Font "
                        f"<< /F1 {font_num} 0 R >> >> >>")
    dict_objs[font_num] = (
        "<< /Type /Font /Subtype /Type1 /BaseFont /Courier "
        f"/FirstChar {font_first_char} "
        f"/LastChar {font_first_char + len(widths) - 1} "
        f"/Widths [ {' '.join(str(w) for w in widths)} ] >>")
    stream_objs: dict[int, bytes] = {}
    for k, pg in enumerate(pages):
        pnum, cnum = first_page + 2 * k, first_page + 2 * k + 1
        dict_objs[pnum] = (f"<< /Type /Page /Parent {parent} 0 R "
                           f"/Contents {cnum} 0 R >>")
        raw = _content_for_page(pg).encode("latin-1")
        stream_objs[cnum] = _stream_obj("", raw, flate, ahx)

    out = bytearray(b"%PDF-1.5\n%\xc2\xa5\xc2\xb1\xc3\xab\n")
    offsets: dict[int, int] = {}

    def emit(num: int, body: bytes) -> None:
        offsets[num] = len(out)
        out.extend(f"{num} 0 obj\n".encode("latin-1"))
        out.extend(body)
        out.extend(b"\nendobj\n")

    def emit_xref_stream(num: int, size: int, entries: dict[int, tuple],
                         prev: int | None, index: list[int] | None) -> int:
        """entries: num -> (type, f2, f3); returns startxref offset."""
        rows = []
        nums = sorted(entries)
        for n in nums:
            t, f2, f3 = entries[n]
            rows.append(bytes([t]) + f2.to_bytes(3, "big") + bytes([f3]))
        if predictor:
            data = zlib.compress(_png_up_encode(rows), 6)
            parms = " /DecodeParms << /Predictor 12 /Columns 5 >>"
        else:
            data = zlib.compress(b"".join(rows), 6)
            parms = ""
        if index is None:
            idx = f" /Index [ {nums[0]} {len(nums)} ]"
        else:
            idx = f" /Index [ {' '.join(str(v) for v in index)} ]"
        pv = f" /Prev {prev}" if prev is not None else ""
        head = (f"<< /Type /XRef /Size {size} /W [ 1 3 1 ] /Root 1 0 R"
                f"{idx}{pv} /Filter /FlateDecode{parms} "
                f"/Length {len(data)} >>").encode("latin-1")
        off = len(out)
        out.extend(f"{num} 0 obj\n".encode("latin-1"))
        out.extend(head + b"\nstream\n" + data + b"\nendstream\nendobj\n")
        offsets[num] = off
        return off

    if xref_kind == "table":
        for n in sorted(dict_objs):
            emit(n, dict_objs[n].encode("latin-1"))
        for n in sorted(stream_objs):
            emit(n, stream_objs[n])
        size = max(offsets) + 1
        xref_off = len(out)
        out.extend(f"xref\n0 {size}\n".encode("latin-1"))
        out.extend(b"0000000000 65535 f \n")
        for n in range(1, size):
            out.extend(f"{offsets[n]:010d} 00000 n \n".encode("latin-1"))
        out.extend((f"trailer\n<< /Size {size} /Root 1 0 R >>\n"
                    f"startxref\n{xref_off}\n%%EOF\n").encode("latin-1"))
    elif xref_kind == "xrefstream":
        for n in sorted(dict_objs):
            emit(n, dict_objs[n].encode("latin-1"))
        for n in sorted(stream_objs):
            emit(n, stream_objs[n])
        xnum = max(offsets) + 1
        size = xnum + 1
        entries = {0: (0, 0, 255)}
        for n, off in offsets.items():
            entries[n] = (1, off, 0)
        xref_off = len(out)
        entries[xnum] = (1, xref_off, 0)
        emit_xref_stream(xnum, size, entries, None, None)
        out.extend(f"startxref\n{xref_off}\n%%EOF\n".encode("latin-1"))
    elif xref_kind == "objstm":
        # dict objects live inside one compressed object stream
        for n in sorted(stream_objs):
            emit(n, stream_objs[n])
        onum = max(max(stream_objs), max(dict_objs)) + 1
        xnum = onum + 1
        members = sorted(dict_objs)
        bodies = [dict_objs[n].encode("latin-1") for n in members]
        offs, acc = [], 0
        for b in bodies:
            offs.append(acc)
            acc += len(b) + 1
        header = " ".join(f"{n} {o}" for n, o in zip(members, offs))
        payload = header.encode("latin-1") + b"\n" + b"\n".join(bodies)
        first = len(header) + 1
        emit(onum, _stream_obj(
            f"/Type /ObjStm /N {len(members)} /First {first}",
            payload, True, False))
        size = xnum + 1
        entries = {0: (0, 0, 255)}
        for idx, n in enumerate(members):
            entries[n] = (2, onum, idx)
        for n in stream_objs:
            entries[n] = (1, offsets[n], 0)
        entries[onum] = (1, offsets[onum], 0)
        xref_off = len(out)
        entries[xnum] = (1, xref_off, 0)
        emit_xref_stream(xnum, size, entries, None, None)
        out.extend(f"startxref\n{xref_off}\n%%EOF\n".encode("latin-1"))
    else:
        raise ValueError(f"unknown xref_kind {xref_kind!r}")

    if update:
        prev_start = xref_off
        unum = (max(offsets) + 1)
        emit(unum, b"<< /Type /AppInfo /Rev 2 >>")
        if xref_kind == "table":
            new_off = len(out)
            out.extend((f"xref\n0 1\n0000000000 65535 f \n"
                        f"{unum} 1\n{offsets[unum]:010d} 00000 n \n"
                        f"trailer\n<< /Size {unum + 1} /Root 1 0 R "
                        f"/Prev {prev_start} >>\nstartxref\n{new_off}\n%%EOF\n"
                        ).encode("latin-1"))
        else:
            x2 = unum + 1
            entries = {unum: (1, offsets[unum], 0)}
            new_off = len(out)
            entries[x2] = (1, new_off, 0)
            emit_xref_stream(x2, x2 + 1, entries, prev_start,
                             [unum, 1, x2, 1])
            out.extend(f"startxref\n{new_off}\n%%EOF\n".encode("latin-1"))
    return bytes(out)


# ---------------------------------------------------------------------------
# lexer / object parser
# ---------------------------------------------------------------------------

_WS = b"\x00\t\n\x0c\r "
_DELIM = b"()<>[]{}/%"


class Ref(NamedTuple):
    num: int
    gen: int


class Name(str):
    """A PDF /Name (distinct from string values in dict/array slots)."""


class PdfStream(NamedTuple):
    dict: dict
    raw: bytes


class _Kw(str):
    """A bare keyword token (operator / obj / endobj / ...)."""


_NUM_RE = re.compile(rb"[+-]?(\d+\.?\d*|\.\d+)")


class Lexer:
    def __init__(self, data: bytes, pos: int = 0):
        self.data = data
        self.pos = pos

    def _skip_ws(self) -> None:
        d, n = self.data, len(self.data)
        while self.pos < n:
            c = d[self.pos]
            if c in _WS:
                self.pos += 1
            elif c == 0x25:  # '%' comment to EOL
                j = d.find(b"\n", self.pos)
                self.pos = n if j < 0 else j + 1
            else:
                return

    def at_end(self) -> bool:
        self._skip_ws()
        return self.pos >= len(self.data)

    def _lex_name(self) -> Name:
        d, n = self.data, len(self.data)
        self.pos += 1
        start = self.pos
        out = bytearray()
        while self.pos < n and d[self.pos] not in _WS and \
                d[self.pos] not in _DELIM:
            c = d[self.pos]
            if c == 0x23 and self.pos + 2 < n:  # '#xx'
                out.append(int(d[self.pos + 1:self.pos + 3], 16))
                self.pos += 3
            else:
                out.append(c)
                self.pos += 1
        if self.pos == start and not out:
            return Name("")
        return Name(out.decode("latin-1"))

    def _lex_literal_string(self) -> bytes:
        d, n = self.data, len(self.data)
        self.pos += 1
        out = bytearray()
        depth = 1
        esc = {0x6E: 10, 0x72: 13, 0x74: 9, 0x62: 8, 0x66: 12,
               0x28: 40, 0x29: 41, 0x5C: 92}
        while self.pos < n:
            c = d[self.pos]
            if c == 0x5C:  # backslash
                self.pos += 1
                if self.pos >= n:
                    break
                e = d[self.pos]
                if e in esc:
                    out.append(esc[e])
                    self.pos += 1
                elif 0x30 <= e <= 0x37:  # 1-3 octal digits
                    v, k = 0, 0
                    while k < 3 and self.pos < n and \
                            0x30 <= d[self.pos] <= 0x37:
                        v = v * 8 + (d[self.pos] - 0x30)
                        self.pos += 1
                        k += 1
                    out.append(v & 0xFF)
                elif e in (0x0A, 0x0D):  # line continuation
                    self.pos += 1
                    if e == 0x0D and self.pos < n and d[self.pos] == 0x0A:
                        self.pos += 1
                else:
                    out.append(e)
                    self.pos += 1
            elif c == 0x28:
                depth += 1
                out.append(c)
                self.pos += 1
            elif c == 0x29:
                depth -= 1
                self.pos += 1
                if depth == 0:
                    break
                out.append(c)
            else:
                out.append(c)
                self.pos += 1
        return bytes(out)

    def _lex_hex_string(self) -> bytes:
        d = self.data
        j = d.find(b">", self.pos)
        if j < 0:
            raise ValueError("unterminated hex string")
        hx = re.sub(rb"[^0-9A-Fa-f]", b"", d[self.pos:j])
        self.pos = j + 1
        if len(hx) % 2:
            hx += b"0"
        return binascii.unhexlify(hx)

    def next_token(self):
        """-> one of: float/int, Name, bytes (string), _Kw, '[' ']'
        '<<' '>>' markers (as _Kw), or None at end."""
        self._skip_ws()
        d, n = self.data, len(self.data)
        if self.pos >= n:
            return None
        c = d[self.pos]
        if c == 0x2F:
            return self._lex_name()
        if c == 0x28:
            return self._lex_literal_string()
        if c == 0x3C:
            if self.pos + 1 < n and d[self.pos + 1] == 0x3C:
                self.pos += 2
                return _Kw("<<")
            self.pos += 1
            return self._lex_hex_string()
        if c == 0x3E:
            if self.pos + 1 < n and d[self.pos + 1] == 0x3E:
                self.pos += 2
                return _Kw(">>")
            self.pos += 1
            return _Kw(">")
        if c in b"[]{}":
            self.pos += 1
            return _Kw(chr(c))
        m = _NUM_RE.match(d, self.pos)
        if m and (c in b"0123456789+-." and m.start() == self.pos):
            self.pos = m.end()
            t = m.group().decode("latin-1")
            return float(t) if ("." in t) else int(t)
        start = self.pos
        while self.pos < n and d[self.pos] not in _WS and \
                d[self.pos] not in _DELIM:
            self.pos += 1
        if self.pos == start:  # stray delimiter: skip it
            self.pos += 1
            return _Kw(chr(c))
        return _Kw(d[start:self.pos].decode("latin-1"))

    def parse_object(self, tok=None):
        """Parse one object starting at tok (or the next token).
        Numbers are returned raw; 'N G R' ref folding happens in
        parse_sequence / the dict & array element readers below."""
        if tok is None:
            tok = self.next_token()
        if tok is None:
            raise ValueError("unexpected end of data")
        if isinstance(tok, _Kw):
            if tok == "<<":
                d: dict = {}
                pending: list = []
                while True:
                    t = self.next_token()
                    if t is None:
                        raise ValueError("unterminated dict")
                    if isinstance(t, _Kw) and t == ">>":
                        break
                    pending.append(self._fold(t, pending))
                # fold refs then pair up
                items = _fold_refs(pending)
                if len(items) % 2:
                    raise ValueError("odd dict item count")
                for k, v in zip(items[::2], items[1::2]):
                    if isinstance(k, Name):
                        d[str(k)] = v
                return d
            if tok == "[":
                pending = []
                while True:
                    t = self.next_token()
                    if t is None:
                        raise ValueError("unterminated array")
                    if isinstance(t, _Kw) and t == "]":
                        break
                    pending.append(self._fold(t, pending))
                return _fold_refs(pending)
            if tok == "true":
                return True
            if tok == "false":
                return False
            if tok == "null":
                return None
            return tok  # operator-style keyword: caller decides
        return tok

    def _fold(self, t, pending):
        if isinstance(t, _Kw):
            if t in ("<<", "["):
                return self.parse_object(t)
            if t == "true":
                return True
            if t == "false":
                return False
            if t == "null":
                return None
        return t


def _fold_refs(items: list) -> list:
    """Collapse [..., int, int, _Kw('R'), ...] runs into Ref tuples."""
    out: list = []
    i = 0
    while i < len(items):
        if (i + 2 < len(items) and isinstance(items[i], int)
                and isinstance(items[i + 1], int)
                and isinstance(items[i + 2], _Kw) and items[i + 2] == "R"):
            out.append(Ref(items[i], items[i + 1]))
            i += 3
        else:
            out.append(items[i])
            i += 1
    return out


# ---------------------------------------------------------------------------
# document: xref chain, object loading, filters
# ---------------------------------------------------------------------------


class PdfDoc:
    def __init__(self, data: bytes):
        self.data = data
        self.xref: dict[int, tuple] = {}   # num -> (type, f2, f3)
        self.trailer: dict = {}
        self.n_xref_sections = 0
        self._cache: dict[int, object] = {}
        self._objstm_cache: dict[int, dict[int, object]] = {}
        self.xref_kind = "table"
        try:
            self._load_xref_chain()
        except Exception:
            self._scan_fallback()
        if not self.xref or "Root" not in self.trailer:
            self._scan_fallback()

    # -- xref ---------------------------------------------------------------

    def _load_xref_chain(self) -> None:
        tail = self.data[-2048:]
        m = None
        for m in re.finditer(rb"startxref\s+(\d+)", tail):
            pass
        if m is None:
            raise ValueError("no startxref")
        off = int(m.group(1))
        seen = set()
        newest_kind = None
        while off is not None and off not in seen and 0 <= off < len(self.data):
            seen.add(off)
            lx = Lexer(self.data, off)
            tok = lx.next_token()
            if isinstance(tok, _Kw) and tok == "xref":
                prev, trailer = self._parse_xref_table(lx)
                kind = "table"
            elif isinstance(tok, int):
                prev, trailer = self._parse_xref_stream(off)
                kind = "xrefstream"
            else:
                raise ValueError("bad xref section")
            self.n_xref_sections += 1
            if newest_kind is None:
                newest_kind = kind
                self.trailer = trailer
            off = trailer.get("Prev")
        if any(e[0] == 2 for e in self.xref.values()):
            self.xref_kind = "objstm"
        else:
            self.xref_kind = newest_kind or "table"

    def _parse_xref_table(self, lx: Lexer):
        while True:
            t = lx.next_token()
            if isinstance(t, _Kw) and t == "trailer":
                trailer = lx.parse_object()
                return trailer.get("Prev"), trailer
            if not isinstance(t, int):
                raise ValueError("bad xref subsection")
            start = t
            count = lx.next_token()
            if not isinstance(count, int):
                raise ValueError("bad xref count")
            for k in range(count):
                f1 = lx.next_token()
                f2 = lx.next_token()
                kw = lx.next_token()
                num = start + k
                if not isinstance(f1, int) or not isinstance(f2, int):
                    raise ValueError("bad xref entry")
                if num not in self.xref:
                    if isinstance(kw, _Kw) and kw == "n":
                        self.xref[num] = (1, f1, f2)
                    else:
                        self.xref[num] = (0, f1, f2)

    def _parse_xref_stream(self, off: int):
        num, stream = self._parse_indirect_at(off)
        if not isinstance(stream, PdfStream):
            raise ValueError("xref offset is not a stream object")
        d = stream.dict
        data = self._decode_stream(stream)
        w = d.get("W", [1, 2, 1])
        widths = [int(x) for x in w]
        size = int(self._resolve(d.get("Size", 0)))
        index = d.get("Index", [0, size])
        row = sum(widths)
        pos = 0
        for a, c in zip(index[::2], index[1::2]):
            for k in range(int(c)):
                if pos + row > len(data):
                    break
                fields = []
                for wd in widths:
                    if wd == 0:
                        fields.append(1)  # default type
                    else:
                        fields.append(int.from_bytes(
                            data[pos:pos + wd], "big"))
                        pos += wd
                num = int(a) + k
                if num not in self.xref:
                    self.xref[num] = tuple(fields[:3])
        return d.get("Prev"), d

    def _scan_fallback(self) -> None:
        """Brute scan for 'N G obj' when the xref chain is unusable
        (truncated tails, bit-flipped offsets): newest duplicate wins."""
        self.xref = {}
        self.trailer = {}
        for m in re.finditer(rb"(\d+)\s+(\d+)\s+obj\b", self.data):
            self.xref[int(m.group(1))] = (1, m.start(), int(m.group(2)))
        self.n_xref_sections = max(self.n_xref_sections, 0)
        for num in sorted(self.xref):
            try:
                o = self.obj(num)
            except Exception:
                continue
            if isinstance(o, dict) and o.get("Type") == Name("Catalog"):
                self.trailer = {"Root": Ref(num, 0), "Size": len(self.xref) + 1}
                break
        if "Root" not in self.trailer:
            raise ValueError("no document catalog")

    # -- objects ------------------------------------------------------------

    def _parse_indirect_at(self, off: int):
        lx = Lexer(self.data, off)
        num = lx.next_token()
        gen = lx.next_token()
        kw = lx.next_token()
        if not (isinstance(num, int) and isinstance(gen, int)
                and isinstance(kw, _Kw) and kw == "obj"):
            raise ValueError(f"no indirect object at offset {off}")
        obj = lx.parse_object()
        t = lx.next_token()
        if isinstance(t, _Kw) and t == "stream":
            # skip the single EOL after 'stream'
            p = lx.pos
            if self.data[p:p + 2] == b"\r\n":
                p += 2
            elif self.data[p:p + 1] in (b"\n", b"\r"):
                p += 1
            length = int(self._resolve(obj.get("Length", 0)))
            raw = self.data[p:p + length]
            return num, PdfStream(obj, raw)
        return num, obj

    def obj(self, num: int):
        if num in self._cache:
            return self._cache[num]
        e = self.xref.get(num)
        if e is None:
            raise KeyError(f"object {num} not in xref")
        t = e[0]
        if t == 1:
            _, o = self._parse_indirect_at(e[1])
        elif t == 2:
            o = self._objstm_member(e[1], e[2], num)
        else:
            o = None
        self._cache[num] = o
        return o

    def _objstm_member(self, stm_num: int, idx: int, want: int):
        members = self._objstm_cache.get(stm_num)
        if members is None:
            stream = self.obj(stm_num)
            if not isinstance(stream, PdfStream):
                raise ValueError("ObjStm entry is not a stream")
            data = self._decode_stream(stream)
            n = int(self._resolve(stream.dict.get("N", 0)))
            first = int(self._resolve(stream.dict.get("First", 0)))
            hl = Lexer(data[:first])
            pairs = []
            for _ in range(n):
                a = hl.next_token()
                b = hl.next_token()
                pairs.append((int(a), int(b)))
            members = {}
            for onum, ooff in pairs:
                ol = Lexer(data, first + ooff)
                members[onum] = ol.parse_object()
            self._objstm_cache[stm_num] = members
        if want not in members:
            raise KeyError(f"object {want} not in ObjStm {stm_num}")
        return members[want]

    def _resolve(self, v):
        while isinstance(v, Ref):
            v = self.obj(v.num)
        return v

    resolve = _resolve

    # -- filters ------------------------------------------------------------

    def _decode_stream(self, stream: PdfStream) -> bytes:
        d = stream.dict
        filters = self._resolve(d.get("Filter"))
        if filters is None:
            filters = []
        elif isinstance(filters, Name):
            filters = [filters]
        parms = self._resolve(d.get("DecodeParms"))
        if parms is None or isinstance(parms, dict):
            parms = [parms] * len(filters)
        data = stream.raw
        for f, p in zip(filters, parms):
            f = str(self._resolve(f))
            p = self._resolve(p) or {}
            if f == "FlateDecode":
                data = zlib.decompress(data)
                pred = int(self._resolve(p.get("Predictor", 1)))
                if pred >= 10:
                    cols = int(self._resolve(p.get("Columns", 1)))
                    data = _png_predictor_decode(data, cols)
                elif pred != 1:
                    raise ValueError(f"unsupported predictor {pred}")
            elif f == "ASCIIHexDecode":
                hx = data.split(b">", 1)[0]
                hx = re.sub(rb"[^0-9A-Fa-f]", b"", hx)
                if len(hx) % 2:
                    hx += b"0"
                data = binascii.unhexlify(hx)
            elif f == "ASCII85Decode":
                data = _a85_decode(data)
            else:
                raise ValueError(f"unsupported filter {f}")
        return data

    # -- page tree ----------------------------------------------------------

    _INHERIT = ("MediaBox", "Resources", "Rotate")

    def pages(self) -> list[dict]:
        root = self._resolve(self.trailer["Root"])
        tree = self._resolve(root["Pages"])
        out: list[dict] = []

        def walk(node: dict, inherited: dict, depth: int) -> None:
            if depth > 64:
                raise ValueError("page tree too deep")
            inh = dict(inherited)
            for k in self._INHERIT:
                if k in node:
                    inh[k] = node[k]
            if node.get("Type") == Name("Page"):
                pg = dict(node)
                for k, v in inh.items():
                    pg.setdefault(k, v)
                out.append(pg)
                return
            for kid in self._resolve(node.get("Kids", [])):
                walk(self._resolve(kid), inh, depth + 1)

        walk(tree, {}, 0)
        return out

    def page_content(self, page: dict) -> bytes:
        c = self._resolve(page.get("Contents"))
        if c is None:
            return b""
        if isinstance(c, list):
            parts = []
            for el in c:
                el = self._resolve(el)
                if isinstance(el, PdfStream):
                    parts.append(self._decode_stream(el))
            return b"\n".join(parts)
        if isinstance(c, PdfStream):
            return self._decode_stream(c)
        return b""


def _a85_decode(data: bytes) -> bytes:
    data = re.sub(rb"\s", b"", data.split(b"~>", 1)[0])
    out = bytearray()
    for i in range(0, len(data), 5):
        chunk = data[i:i + 5]
        pad = 5 - len(chunk)
        if chunk == b"z"[:len(chunk)] and len(chunk) == 1:
            out.extend(b"\0\0\0\0")
            continue
        chunk += b"u" * pad
        v = 0
        for c in chunk:
            v = v * 85 + (c - 33)
        out.extend(v.to_bytes(4, "big")[:4 - pad])
    return bytes(out)


# ---------------------------------------------------------------------------
# content-stream text interpreter
# ---------------------------------------------------------------------------


class _FontInfo(NamedTuple):
    first_char: int
    widths: tuple

    def width(self, code: int) -> float:
        i = code - self.first_char
        if 0 <= i < len(self.widths):
            return float(self.widths[i])
        return float(DEFAULT_GLYPH_WIDTH)


_DEFAULT_FONT = _FontInfo(0, ())


def _font_table(doc: PdfDoc, resources) -> dict[str, _FontInfo]:
    out: dict[str, _FontInfo] = {}
    resources = doc.resolve(resources) or {}
    fonts = doc.resolve(resources.get("Font")) or {}
    for name, fref in fonts.items():
        fd = doc.resolve(fref)
        if not isinstance(fd, dict):
            continue
        widths = doc.resolve(fd.get("Widths"))
        first = doc.resolve(fd.get("FirstChar", 0))
        if isinstance(widths, list):
            out[str(name)] = _FontInfo(int(first),
                                       tuple(float(w) for w in widths))
        else:
            out[str(name)] = _DEFAULT_FONT
    return out


class _TextState:
    __slots__ = ("tm", "tlm", "size", "font", "tl", "tc", "tw", "tz", "rise")

    def __init__(self):
        self.tm = ID6
        self.tlm = ID6
        self.size = 0.0
        self.font = _DEFAULT_FONT
        self.tl = 0.0
        self.tc = 0.0
        self.tw = 0.0
        self.tz = 100.0
        self.rise = 0.0


def interpret_page(doc: PdfDoc, page: dict,
                   counters: dict | None = None) -> list[tuple]:
    """Run the text-state machine over a page's content stream(s).

    Returns [(x0, y, x1, size_dev, text)] per show-string in device
    space (PDF user space when CTM is identity): x0/y the baseline
    origin, x1 the post-advance x, size_dev the device-scaled font
    size used for box height downstream.
    """
    content = doc.page_content(page)
    fonts = _font_table(doc, page.get("Resources"))
    toks: list[tuple] = []
    lx = Lexer(content)
    stack: list = []
    ctm = ID6
    gs_stack: list = []
    ts = _TextState()
    in_text = False

    def shown(s: bytes) -> None:
        if counters is not None:
            counters["chars"] = counters.get("chars", 0) + len(s)
        if not s:
            return
        m = _mat_mul(ts.tm, ctm)
        x0, y0 = _mat_apply(m, 0.0, ts.rise)
        adv = 0.0
        for c in s:
            w = ts.font.width(c) if ts.font.widths else DEFAULT_GLYPH_WIDTH
            adv += (w / 1000.0 * ts.size + ts.tc
                    + (ts.tw if c == _SPACE else 0.0))
        adv *= ts.tz / 100.0
        x1, _ = _mat_apply(m, adv, ts.rise)
        size_dev = ts.size * abs(m[3]) if m[3] else ts.size
        toks.append((x0, y0, x1, size_dev,
                     s.decode("latin-1")))
        ts.tm = _mat_mul(_translate(adv, 0.0), ts.tm)

    def count_show() -> None:
        if counters is not None:
            counters["shows"] = counters.get("shows", 0) + 1

    def t_star() -> None:
        ts.tlm = _mat_mul(_translate(0.0, -ts.tl), ts.tlm)
        ts.tm = ts.tlm

    while True:
        tok = lx.next_token()
        if tok is None:
            break
        if isinstance(tok, _Kw):
            if tok in ("<<", "["):
                stack.append(lx.parse_object(tok))
                continue
            op = str(tok)
            try:
                if op == "q":
                    gs_stack.append(ctm)
                elif op == "Q":
                    if gs_stack:
                        ctm = gs_stack.pop()
                elif op == "cm" and len(stack) >= 6:
                    m = tuple(float(v) for v in stack[-6:])
                    ctm = _mat_mul(m, ctm)
                elif op == "BT":
                    in_text = True
                    ts.tm = ts.tlm = ID6
                elif op == "ET":
                    in_text = False
                elif op == "Tf" and len(stack) >= 2:
                    ts.size = float(stack[-1])
                    ts.font = fonts.get(str(stack[-2]), _DEFAULT_FONT)
                elif op == "TL" and stack:
                    ts.tl = float(stack[-1])
                elif op == "Tc" and stack:
                    ts.tc = float(stack[-1])
                elif op == "Tw" and stack:
                    ts.tw = float(stack[-1])
                elif op == "Tz" and stack:
                    ts.tz = float(stack[-1])
                elif op == "Ts" and stack:
                    ts.rise = float(stack[-1])
                elif op == "Td" and len(stack) >= 2:
                    ts.tlm = _mat_mul(_translate(float(stack[-2]),
                                                 float(stack[-1])), ts.tlm)
                    ts.tm = ts.tlm
                elif op == "TD" and len(stack) >= 2:
                    ts.tl = -float(stack[-1])
                    ts.tlm = _mat_mul(_translate(float(stack[-2]),
                                                 float(stack[-1])), ts.tlm)
                    ts.tm = ts.tlm
                elif op == "Tm" and len(stack) >= 6:
                    m = tuple(float(v) for v in stack[-6:])
                    ts.tm = ts.tlm = m
                elif op == "T*":
                    t_star()
                elif op == "Tj" and stack and in_text:
                    count_show()
                    if isinstance(stack[-1], bytes):
                        shown(stack[-1])
                elif op == "'" and stack and in_text:
                    count_show()
                    t_star()
                    if isinstance(stack[-1], bytes):
                        shown(stack[-1])
                elif op == '"' and len(stack) >= 3 and in_text:
                    count_show()
                    ts.tw = float(stack[-3])
                    ts.tc = float(stack[-2])
                    t_star()
                    if isinstance(stack[-1], bytes):
                        shown(stack[-1])
                elif op == "TJ" and stack and in_text:
                    count_show()
                    arr = stack[-1]
                    if isinstance(arr, list):
                        for el in arr:
                            if isinstance(el, bytes):
                                shown(el)
                            elif isinstance(el, (int, float)):
                                adv = (-float(el) / 1000.0 * ts.size
                                       * ts.tz / 100.0)
                                ts.tm = _mat_mul(_translate(adv, 0.0),
                                                 ts.tm)
                elif op == "BI":
                    # inline image: skip to EI (not produced by our
                    # writer; safety for wild files)
                    j = content.find(b"EI", lx.pos)
                    lx.pos = len(content) if j < 0 else j + 2
            finally:
                stack.clear()
        else:
            stack.append(tok)
    return toks


# ---------------------------------------------------------------------------
# extraction surfaces
# ---------------------------------------------------------------------------


def extract_pdf_tokens(data: bytes) -> dict:
    """Parse + interpret: {"pages": [{"w", "h", "tokens": [...]}, ...],
    "n_objects", "xref_kind", "n_xref_sections", "n_shows", "n_chars",
    "content_filter"}."""
    doc = PdfDoc(data)
    pages = doc.pages()
    counters: dict = {"shows": 0, "chars": 0}
    out_pages = []
    content_filter = "plain"
    for i, pg in enumerate(pages):
        mb = doc.resolve(pg.get("MediaBox")) or [0, 0, 612, 792]
        w = float(doc.resolve(mb[2])) - float(doc.resolve(mb[0]))
        h = float(doc.resolve(mb[3])) - float(doc.resolve(mb[1]))
        if i == 0:
            content_filter = _first_filter_label(doc, pg)
        toks = interpret_page(doc, pg, counters)
        out_pages.append({"w": w, "h": h, "tokens": toks})
    n_objects = sum(1 for e in doc.xref.values() if e[0] != 0)
    return {"pages": out_pages, "n_objects": n_objects,
            "xref_kind": doc.xref_kind,
            "n_xref_sections": doc.n_xref_sections,
            "n_shows": counters["shows"], "n_chars": counters["chars"],
            "content_filter": content_filter}


def _first_filter_label(doc: PdfDoc, page: dict) -> str:
    c = doc.resolve(page.get("Contents"))
    if isinstance(c, list) and c:
        c = doc.resolve(c[0])
    if not isinstance(c, PdfStream):
        return "plain"
    f = doc.resolve(c.dict.get("Filter"))
    if f is None:
        return "plain"
    if isinstance(f, Name):
        f = [f]
    label = {"FlateDecode": "flate", "ASCIIHexDecode": "ahx",
             "ASCII85Decode": "a85"}
    return "+".join(label.get(str(x), str(x)) for x in f)


_ASCENT = 0.75   # baseline -> box top, in em
_DESCENT = 0.25  # baseline -> box bottom, in em


def pdf_blocks(data: bytes, conf: float = 100.0) -> list[dict]:
    """Real PDF bytes -> the engine's Block IR via the SAME
    grouping/XY-cut/KV machinery as the %XYD1 path
    (`pdflayout.tokens_to_blocks`); page coords scaled to the layout
    engine's 0-1000 space with y flipped (PDF y grows up)."""
    from ..pdflayout import Tok, tokens_to_blocks

    parsed = extract_pdf_tokens(data)
    toks = []
    for pi, pg in enumerate(parsed["pages"]):
        kx = 1000.0 / pg["w"] if pg["w"] else 1.0
        ky = 1000.0 / pg["h"] if pg["h"] else 1.0
        for (x0, y, x1, size, text) in pg["tokens"]:
            toks.append(Tok(x0 * kx, (pg["h"] - (y + _ASCENT * size)) * ky,
                            x1 * kx, (pg["h"] - (y - _DESCENT * size)) * ky,
                            pi, conf, text))
    return tokens_to_blocks(toks)


def probe_pdf(data: bytes) -> dict:
    """Structural probe; malformed input -> ok=False DATA row."""
    try:
        p = extract_pdf_tokens(data)
        return {"ok": True, "reason": "",
                "n_pages": len(p["pages"]), "xref_kind": p["xref_kind"],
                "content_filter": p["content_filter"],
                "n_objects": p["n_objects"],
                "n_xref_sections": p["n_xref_sections"],
                "n_shows": p["n_shows"], "n_chars": p["n_chars"]}
    except Exception as e:  # noqa: BLE001 — poison-row rule
        return {"ok": False, "reason": f"{type(e).__name__}: {e}"[:200],
                "n_pages": 0, "xref_kind": "", "content_filter": "",
                "n_objects": 0, "n_xref_sections": 0,
                "n_shows": 0, "n_chars": 0}


# ---------------------------------------------------------------------------
# batch callables (actor-pool stages)
# ---------------------------------------------------------------------------


class ProbePDF:
    def __call__(self, batch: pa.Table) -> pa.Table:
        ids = batch.column("media_id").to_pylist()
        blobs = batch.column("media").to_pylist()
        rows = {"media_id": [], "ok": [], "n_pages": [], "xref_kind": [],
                "content_filter": [], "n_objects": [],
                "n_xref_sections": [], "n_shows": [], "n_chars": []}
        for i, b in zip(ids, blobs):
            p = probe_pdf(b)
            rows["media_id"].append(i)
            for k in ("ok", "n_pages", "xref_kind", "content_filter",
                      "n_objects", "n_xref_sections", "n_shows",
                      "n_chars"):
                rows[k].append(p[k])
        return pa.table({
            "media_id": pa.array(rows["media_id"], pa.int64()),
            "ok": pa.array(rows["ok"], pa.bool_()),
            "n_pages": pa.array(rows["n_pages"], pa.int64()),
            "xref_kind": pa.array(rows["xref_kind"], pa.string()),
            "content_filter": pa.array(rows["content_filter"], pa.string()),
            "n_objects": pa.array(rows["n_objects"], pa.int64()),
            "n_xref_sections": pa.array(rows["n_xref_sections"], pa.int64()),
            "n_shows": pa.array(rows["n_shows"], pa.int64()),
            "n_chars": pa.array(rows["n_chars"], pa.int64()),
        })


class ExtractPDFText:
    """Per (file, page): reading-order text — LINE blocks in XY-cut
    order joined with newlines, exactly the %XYD1 path's semantics."""

    def __call__(self, batch: pa.Table) -> pa.Table:
        ids = batch.column("media_id").to_pylist()
        blobs = batch.column("media").to_pylist()
        out_id, out_page, out_text = [], [], []
        for i, b in zip(ids, blobs):
            try:
                blocks = pdf_blocks(b)
            except Exception:  # noqa: BLE001 — poison-row rule
                continue
            by_page: dict[int, list] = {}
            for blk in blocks:
                if blk["block_type"] == "LINE":
                    by_page.setdefault(blk["page"], []).append(
                        (blk["reading_order"], blk["text"]))
            for pg in sorted(by_page):
                lines = [t for _, t in sorted(by_page[pg])]
                out_id.append(i)
                out_page.append(pg)
                out_text.append("\n".join(lines))
        return pa.table({"media_id": pa.array(out_id, pa.int64()),
                         "page": pa.array(out_page, pa.int64()),
                         "text": pa.array(out_text, pa.string())})


class ExtractPDFKV:
    """Per (file, page): geometric KV pairs (Textract-FORMS analogue)."""

    def __call__(self, batch: pa.Table) -> pa.Table:
        ids = batch.column("media_id").to_pylist()
        blobs = batch.column("media").to_pylist()
        out = {"media_id": [], "page": [], "key_text": [], "value_text": []}
        for i, b in zip(ids, blobs):
            try:
                blocks = pdf_blocks(b)
            except Exception:  # noqa: BLE001
                continue
            for blk in blocks:
                if blk["block_type"] == "KV":
                    out["media_id"].append(i)
                    out["page"].append(blk["page"])
                    out["key_text"].append(blk["key_text"])
                    out["value_text"].append(blk["value_text"])
        return pa.table({"media_id": pa.array(out["media_id"], pa.int64()),
                         "page": pa.array(out["page"], pa.int64()),
                         "key_text": pa.array(out["key_text"], pa.string()),
                         "value_text": pa.array(out["value_text"],
                                                pa.string())})


# ---------------------------------------------------------------------------
# fixtures
# ---------------------------------------------------------------------------


def fixture_pdf(i: int) -> bytes:
    """One deterministic real-PDF file for doc_id ``i`` — every probed
    and extracted field closed-form (the SQL twins recompute them):

      n_pages    1 + i%3
      xref kind  i%3 -> 0: classic table, 1: xref stream, 2: ObjStm
      filters    flate when i%2==0, ASCIIHex wrap when i%5==0
      predictor  PNG Up on the xref stream when i%7==0
      nested     intermediate /Pages node when i%9==0 (inheritance
                 through two levels)
      update     incremental /Prev section (+1 object) when i%11==0
      body       per page p: 3+(i+p)%4 lines; line l: 2+(i+p+l)%3
                 words 'w'||((31i+17p+7l+w)%97); show operator by
                 (i+p+l)%3 -> per-word Tj / one TJ / hex-string Tj
      kv         one 'k{(i+p)%10}:' -> 'v{(13i+p)%100}' pair per page
    """
    np_ = 1 + i % 3
    pages = []
    for p in range(np_):
        nl = 3 + (i + p) % 4
        lines = []
        for l in range(nl):  # noqa: E741
            sel = (i + p + l) % 3
            nw = 2 + sel
            words = [f"w{(31 * i + 17 * p + 7 * l + w) % 97}"
                     for w in range(nw)]
            lines.append({"x": 72.0, "y": 720.0 - 16.0 * l, "size": 12,
                          "words": words,
                          "op": ("tj", "tjarr", "hex")[sel]})
        kv = (f"k{(i + p) % 10}:", f"v{(13 * i + p) % 100}",
              72.0, 720.0 - 16.0 * nl, 12)
        pages.append({"lines": lines, "kv": kv})
    return build_pdf(pages,
                     xref_kind=("table", "xrefstream", "objstm")[i % 3],
                     flate=i % 2 == 0, ahx=i % 5 == 0,
                     predictor=i % 7 == 0, nested_pages=i % 9 == 0,
                     update=i % 11 == 0)


def _render_pdf_fixture(batch: pa.Table) -> pa.Table:
    ids = batch.column("doc_id").to_pylist()
    return pa.table({"media_id": pa.array(ids, pa.int64()),
                     "media": pa.array([fixture_pdf(i) for i in ids],
                                       pa.binary())})


def synth_pdf_corpus(sf_dir: str, n: int | None = None):
    from ..fixturecache import cached_ds
    import ray.data as rd

    def build():
        ids = rd.read_parquet(f"{sf_dir}/documents.parquet",
                              columns=["doc_id"])
        if n is not None:
            ids = ids.limit(n)
        try:
            import ray
            ids = ids.repartition(
                max(2, int(ray.cluster_resources().get("CPU", 8))))
        except Exception:
            pass
        return ids.map_batches(_render_pdf_fixture,
                               batch_format="pyarrow", batch_size=64)

    if n is None:
        return cached_ds("pdf_corpus", sf_dir, build,
                         render_fn=_render_pdf_fixture)
    return build()


# ---------------------------------------------------------------------------
# query surfaces
# ---------------------------------------------------------------------------


def pdfs_probe(sf_dir: str):
    """ORACLED: structural probe of the mixed-layout PDF corpus —
    (n_pages, xref_kind, content_filter, n_objects, n_xref_sections,
    n_shows, n_chars), every field closed-form from doc_id.  A parity
    hash certifies the complete xref-chain walk (tables, streams,
    ObjStm, /Prev updates, PNG predictor), the filter cascade and the
    show-operator accounting across every layout variant."""
    probe = ProbePDF()
    ds = synth_pdf_corpus(sf_dir).map_batches(
        lambda b: probe(b), batch_format="pyarrow", zero_copy_batch=True,
        batch_size=64)
    return ds.select_columns(["media_id", "n_pages", "xref_kind",
                              "content_filter", "n_objects",
                              "n_xref_sections", "n_shows", "n_chars"])


def pdfs_text_extract(sf_dir: str):
    """ORACLED: per-(file, page) reading-order extracted text through
    the full stack — xref walk, filter decode, content-stream
    interpreter, grouping + XY-cut — matching the SQL twin's
    closed-form regeneration of every word byte-for-byte."""
    ex = ExtractPDFText()
    return synth_pdf_corpus(sf_dir).map_batches(
        lambda b: ex(b), batch_format="pyarrow", zero_copy_batch=True,
        batch_size=64)


def pdfs_kv_fields(sf_dir: str):
    """ORACLED: geometric key-value pairing over real PDFs (the
    Textract-FORMS analogue, reference
    source/ocr/textract-integration/fn-call-textract/main.py:52-61) —
    label groups ending ':' paired with the nearest right-neighbour
    group on the same baseline."""
    ex = ExtractPDFKV()
    return synth_pdf_corpus(sf_dir).map_batches(
        lambda b: ex(b), batch_format="pyarrow", zero_copy_batch=True,
        batch_size=64)
