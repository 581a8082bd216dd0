"""ODT and RTF text extraction — the rest of the crawl's office-family
payloads, same pure-spec posture as ops/docx.py (which provides the
shared PKZIP walk).

  * ODT (OASIS OpenDocument, ISO/IEC 26300): a ZIP package whose
    FIRST entry is the STOREd ``mimetype`` (the spec's magic-sniffing
    rule — honored by `build_odt` and checked by `odt_paragraphs`),
    with text in ``content.xml``: text:p paragraphs, text:span runs,
    text:tab -> TAB, text:line-break -> newline, and the text:s
    run-length space element (c="n").
  * RTF (Microsoft Rich Text Format spec, public since 1.0): a
    control-word tokenizer with group nesting, destination skipping
    ({\\fonttbl}, {\\colortbl}, {\\stylesheet}, {\\info}, and the
    {\\*\\...} ignorable-destination rule), \\par/\\line/\\tab
    control semantics, \\'hh byte escapes (cp1252) and \\uN unicode
    escapes with the \\ucN fallback-skip protocol.

Both get writers so fixtures are real files the parsers did not
"remember", and both degrade malformed input to data rows upstream.
Map-side, zero exchanges, file-parallel.
"""

from __future__ import annotations

import re

import pyarrow as pa

from .docx import _unescape, _xml_escape, read_zip

# ---------------------------------------------------------------------------
# ODT
# ---------------------------------------------------------------------------

_ODT_MIME = b"application/vnd.oasis.opendocument.text"
_MANIFEST = (
    '<?xml version="1.0" encoding="UTF-8"?>'
    '<manifest:manifest xmlns:manifest="urn:oasis:names:tc:opendocument'
    ':xmlns:manifest:1.0"><manifest:file-entry manifest:full-path="/" '
    'manifest:media-type="application/vnd.oasis.opendocument.text"/>'
    '<manifest:file-entry manifest:full-path="content.xml" '
    'manifest:media-type="text/xml"/></manifest:manifest>')


def build_odt(paragraphs: list[list[str]]) -> bytes:
    """Minimal real ODT: STOREd mimetype FIRST (per OASIS §3.3), then
    the manifest and content.xml; words alternate bare text and
    text:span runs."""
    body = []
    for words in paragraphs:
        parts = []
        for k, w in enumerate(words):
            esc = _xml_escape(w)
            if k:
                parts.append(" ")
            parts.append(f"<text:span>{esc}</text:span>"
                         if k % 2 else esc)
        body.append("<text:p>" + "".join(parts) + "</text:p>")
    content = (
        '<?xml version="1.0" encoding="UTF-8"?>'
        '<office:document-content xmlns:office="urn:oasis:names:tc:'
        'opendocument:xmlns:office:1.0" xmlns:text="urn:oasis:names:tc'
        ':opendocument:xmlns:text:1.0"><office:body><office:text>'
        + "".join(body) + "</office:text></office:body>"
        "</office:document-content>")
    # mimetype must be entry 0, STOREd, so bytes 30.. stay sniffable
    pieces = [("mimetype", _ODT_MIME),
              ("META-INF/manifest.xml", _MANIFEST.encode()),
              ("content.xml", content.encode())]
    return _build_zip_mixed(pieces)


def _build_zip_mixed(entries: list[tuple[str, bytes]]) -> bytes:
    """build_zip, but entry 0 STOREd (the ODT mimetype rule) and the
    rest deflate-if-smaller."""
    import struct
    import zlib

    out = bytearray()
    central = bytearray()
    for idx, (name, payload) in enumerate(entries):
        nb = name.encode("utf-8")
        crc = zlib.crc32(payload) & 0xFFFFFFFF
        if idx == 0:
            data, method = payload, 0
        else:
            comp = zlib.compressobj(6, zlib.DEFLATED, -15)
            packed = comp.compress(payload) + comp.flush()
            data, method = ((packed, 8) if len(packed) < len(payload)
                            else (payload, 0))
        off = len(out)
        out += struct.pack("<IHHHHHIII", 0x04034B50, 20, 0, method, 0,
                           0, crc, len(data), len(payload))
        out += struct.pack("<HH", len(nb), 0)
        out += nb + data
        central += struct.pack("<IHHHHHHIIIHHHHHII", 0x02014B50, 20,
                               20, 0, method, 0, 0, crc, len(data),
                               len(payload), len(nb), 0, 0, 0, 0, 0,
                               off)
        central += nb
    cd_off = len(out)
    out += central
    out += struct.pack("<IHHHHIIH", 0x06054B50, 0, 0, len(entries),
                       len(entries), len(central), cd_off, 0)
    return bytes(out)


_ODT_TAG_RE = re.compile(
    r"<(/?)text:(p|h|span|tab|line-break|s)((?:\s[^>]*?)?)(/?)>")
_ODT_S_C_RE = re.compile(r'text:c="(\d+)"')


def odt_paragraphs(data: bytes) -> list[str]:
    """ODT bytes -> paragraph texts in document order.  Checks the
    spec's stored-mimetype sniff window first."""
    if data[30:38] != b"mimetype" or not data[38:].startswith(_ODT_MIME):
        raise ValueError("not an ODT package (mimetype rule)")
    parts = read_zip(data)
    content = parts.get("content.xml")
    if content is None:
        raise ValueError("no content.xml part")
    xml = content.decode("utf-8", "replace")
    out: list[str] = []
    cur: list[str] | None = None
    pos = 0
    for m in _ODT_TAG_RE.finditer(xml):
        closing, tag, attrs, selfclose = m.groups()
        if cur is not None and m.start() > pos:
            cur.append(_unescape(xml[pos:m.start()]))
        pos = m.end()
        if tag in ("p", "h"):
            if not closing and not selfclose:
                cur = []
            elif cur is not None:
                out.append("".join(cur))
                cur = None
        elif cur is None:
            continue
        elif tag == "tab" and not closing:
            cur.append("\t")
        elif tag == "line-break" and not closing:
            cur.append("\n")
        elif tag == "s" and not closing:
            cm = _ODT_S_C_RE.search(attrs)
            cur.append(" " * (int(cm.group(1)) if cm else 1))
    return out


# ---------------------------------------------------------------------------
# RTF
# ---------------------------------------------------------------------------

_RTF_SKIP_DESTS = {"fonttbl", "colortbl", "stylesheet", "info",
                   "pict", "object", "header", "footer"}
_RTF_CW_RE = re.compile(rb"\\([a-z]+)(-?\d+)? ?|\\([^a-z])")


def rtf_escape(s: str) -> str:
    out = []
    for ch in s:
        o = ord(ch)
        if ch in "\\{}":
            out.append("\\" + ch)
        elif o < 128:
            out.append(ch)
        else:
            # \'hh is a CODEPAGE byte: only usable when cp1252 maps it
            # back to this char (the C1 block 0x80-0x9F does NOT round
            # trip); everything else takes the \uN escape
            try:
                b = ch.encode("cp1252")
                ok = len(b) == 1 and b.decode("cp1252") == ch
            except UnicodeEncodeError:
                ok = False
            if ok:
                out.append(f"\\'{b[0]:02x}")
            else:
                out.append(f"\\u{o if o < 32768 else o - 65536}?")
    return "".join(out)


def build_rtf(paragraphs: list[list[str]]) -> bytes:
    """Real RTF 1.x: header with a font table (a skipped destination),
    an ignorable {\\*\\generator} group, paragraphs ending \\par."""
    body = "".join(
        " ".join(rtf_escape(w) for w in words) + "\\par\n"
        for words in paragraphs)
    doc = ("{\\rtf1\\ansi\\ansicpg1252\\deff0"
           "{\\fonttbl{\\f0\\froman Times New Roman;}}"
           "{\\*\\generator webxtract 1.0;}"
           "\\f0\\fs24 " + body + "}")
    return doc.encode("latin-1")


def rtf_text(data: bytes) -> list[str]:
    """RTF bytes -> paragraph texts.  Implements group nesting,
    destination skipping (incl. the {\\*\\...} ignorable rule), \\'hh
    cp1252 escapes, \\uN with the \\ucN fallback-skip protocol, and
    \\par/\\line/\\tab semantics."""
    if not data.startswith(b"{\\rtf"):
        raise ValueError("not an RTF document")
    out: list[str] = []
    cur: list[str] = []
    pos = 0
    n = len(data)
    # group state: (skipping, uc_skip)
    stack: list[tuple[bool, int]] = []
    skipping = False
    uc_skip = 1
    pending_uc_skip = 0

    def flush_par() -> None:
        out.append("".join(cur))
        cur.clear()

    while pos < n:
        c = data[pos]
        if c == 0x7B:  # {
            stack.append((skipping, uc_skip))
            pos += 1
            # peek for \* (ignorable destination) or a skip destination
            m = re.match(rb"\\\*\\[a-z]+", data[pos:pos + 32])
            if m:
                skipping = True
                continue
            m2 = re.match(rb"\\([a-z]+)", data[pos:pos + 32])
            if m2 and m2.group(1).decode() in _RTF_SKIP_DESTS:
                skipping = True
            continue
        if c == 0x7D:  # }
            if stack:
                skipping, uc_skip = stack.pop()
            pos += 1
            continue
        if c == 0x5C:  # backslash
            m = _RTF_CW_RE.match(data, pos)
            if not m:
                pos += 1
                continue
            pos = m.end()
            if m.group(3) is not None:  # control symbol
                sym = m.group(3)
                if not skipping:
                    if sym == b"'":
                        hx = data[pos:pos + 2]
                        pos += 2
                        if pending_uc_skip > 0:
                            pending_uc_skip -= 1
                        else:
                            try:
                                cur.append(bytes([int(hx, 16)])
                                           .decode("cp1252"))
                            except ValueError:
                                pass
                    elif sym in (b"\\", b"{", b"}"):
                        cur.append(sym.decode())
                    elif sym == b"~":
                        cur.append("\u00a0")
                    elif sym == b"\n" or sym == b"\r":
                        cur.append("\n")
                continue
            word = m.group(1).decode()
            num = int(m.group(2)) if m.group(2) else None
            if skipping:
                continue
            if word == "par":
                flush_par()
            elif word == "line":
                cur.append("\n")
            elif word == "tab":
                cur.append("\t")
            elif word == "uc":
                uc_skip = num if num is not None else 1
            elif word == "u":
                v = num if num is not None else 0
                cur.append(chr(v + 65536 if v < 0 else v))
                pending_uc_skip = uc_skip
            # formatting words (\f0 \fs24 \b ...) carry no text
            continue
        # plain text run up to the next delimiter
        j = pos
        while j < n and data[j] not in (0x5C, 0x7B, 0x7D):
            j += 1
        if not skipping:
            txt = data[pos:j].replace(b"\r", b"").replace(b"\n", b"")
            if txt:
                if pending_uc_skip > 0:
                    drop = min(pending_uc_skip, len(txt))
                    txt = txt[drop:]
                    pending_uc_skip -= drop
                if txt:
                    cur.append(txt.decode("cp1252"))
        pos = j
    if cur and "".join(cur):
        flush_par()
    return out


# ---------------------------------------------------------------------------
# fixtures + query surfaces
# ---------------------------------------------------------------------------


def fixture_odt(i: int) -> bytes:
    paras = [[f"o{(29 * i + 13 * p + 3 * k) % 83}"
              for k in range(2 + (i + p) % 4)]
             for p in range(1 + i % 3)]
    return build_odt(paras)


def fixture_rtf(i: int) -> bytes:
    paras = [[f"r{(37 * i + 17 * p + 7 * k) % 79}"
              for k in range(2 + (i + p) % 3)]
             for p in range(2 + i % 3)]
    return build_rtf(paras)


def _render_office_fixture(batch: pa.Table) -> pa.Table:
    ids = batch.column("doc_id").to_pylist()
    return pa.table({
        "media_id": pa.array(ids, pa.int64()),
        "odt": pa.array([fixture_odt(i) for i in ids], pa.binary()),
        "rtf": pa.array([fixture_rtf(i) for i in ids], pa.binary()),
    })


def synth_office_corpus(sf_dir: str, n: int | None = None):
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
        return ids.map_batches(_render_office_fixture,
                               batch_format="pyarrow", batch_size=128)

    if n is None:
        return cached_ds("office_corpus", sf_dir, build,
                         render_fn=_render_office_fixture)
    return build()


class ExtractOffice:
    def __init__(self, col: str, fn):
        self.col = col
        self.fn = fn

    def __call__(self, batch: pa.Table) -> pa.Table:
        ids = batch.column("media_id").to_pylist()
        blobs = batch.column(self.col).to_pylist()
        out = {"media_id": [], "para": [], "text": []}
        for i, b in zip(ids, blobs):
            try:
                paras = self.fn(b)
            except Exception:  # noqa: BLE001 — poison-row rule
                continue
            for k, t in enumerate(paras):
                out["media_id"].append(i)
                out["para"].append(k)
                out["text"].append(t)
        return pa.table({"media_id": pa.array(out["media_id"], pa.int64()),
                         "para": pa.array(out["para"], pa.int64()),
                         "text": pa.array(out["text"], pa.string())})


def docs_odt_extract(sf_dir: str):
    """ORACLED: per-(file, paragraph) text from real ODT packages —
    certifies the stored-mimetype rule, the shared ZIP walk, and the
    text:p/span scanner byte-for-byte."""
    ex = ExtractOffice("odt", odt_paragraphs)
    return synth_office_corpus(sf_dir).map_batches(
        lambda b: ex(b), batch_format="pyarrow", zero_copy_batch=True,
        batch_size=128)


def docs_rtf_extract(sf_dir: str):
    """ORACLED: per-(file, paragraph) text from real RTF documents —
    certifies the control-word tokenizer, destination skipping and
    escape handling byte-for-byte."""
    ex = ExtractOffice("rtf", rtf_text)
    return synth_office_corpus(sf_dir).map_batches(
        lambda b: ex(b), batch_format="pyarrow", zero_copy_batch=True,
        batch_size=128)


# ---------------------------------------------------------------------------
# flagship-integration query: mixed office corpus through the REAL
# quality-gate + extractor stages
# ---------------------------------------------------------------------------


def _render_invoice_fixture(batch: pa.Table) -> pa.Table:
    """Per doc_id: an invoice in one of four real formats (doc_id%4 ->
    PDF / DOCX / ODT / RTF), vendor = 'Vendor{i%50} Corp' as the first
    line/paragraph — the field the M6 normalizer must surface."""
    from .docx import build_docx
    from .pdf import build_pdf

    ids = batch.column("doc_id").to_pylist()
    payloads = []
    for i in ids:
        v = [f"Vendor{i % 50}", "Corp"]
        body = [v, ["Invoice", f"number{i % 997}"],
                ["Total:", f"${(i % 9000) / 100 + 1:.2f}"]]
        fam = i % 4
        if fam == 0:
            payloads.append(build_pdf([{"lines": [
                {"x": 72.0, "y": 720.0, "size": 12, "words": v,
                 "op": "tj"},
                {"x": 72.0, "y": 704.0, "size": 12, "words": body[1],
                 "op": "tjarr"}],
                "kv": ("Total:", body[2][1], 72.0, 680.0, 12)}]))
        elif fam == 1:
            payloads.append(build_docx(body))
        elif fam == 2:
            payloads.append(build_odt(body))
        else:
            payloads.append(build_rtf(body))
    return pa.table({
        "media_id": pa.array(ids, pa.int64()),
        "url": pa.array([f"https://office.example/{i}" for i in ids],
                        pa.string()),
        "html": pa.array(payloads, pa.binary()),
    })


def synth_invoice_corpus(sf_dir: str, n: int | None = None):
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
        return ids.map_batches(_render_invoice_fixture,
                               batch_format="pyarrow", batch_size=128)

    if n is None:
        return cached_ds("invoice_corpus", sf_dir, build,
                        render_fn=_render_invoice_fixture)
    return build()


def pages_office_extract(sf_dir: str):
    """ORACLED: the format-dispatch INTEGRATION itself — a mixed
    PDF/DOCX/ODT/RTF corpus through the REAL pipeline stages
    (QualityGate magic sniff -> Extractor dispatch -> M6 vendor
    normalizer), emitting (media_id, doc_kind, vendor_value), every
    field closed-form.  A hash match certifies that each payload kind
    routes through its parser and the shared normalizers end to end
    (ODT rides the PK sniff, so its kind reports as 'docx')."""
    from ..pipeline import extractor_task
    from ..quality import QualityGate

    gate = QualityGate()
    ex = extractor_task()
    ds = synth_invoice_corpus(sf_dir).map_batches(
        lambda b: gate(b), batch_format="pyarrow", zero_copy_batch=True,
        batch_size=128).map_batches(
        ex, batch_format="pyarrow", zero_copy_batch=True,
        batch_size=128)
    return ds.select_columns(["media_id", "doc_kind", "vendor_value"])
