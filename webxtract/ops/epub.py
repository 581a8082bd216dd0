"""EPUB text extraction — the OCF/OPF member of the container family
over the shared PKZIP walk (ops/docx.py).

EPUB (IDPF/W3C spec) is three layers, all walked for real:

  * OCF container: STOREd ``mimetype`` FIRST (``application/epub+zip``
    — same rule as ODT, checked in the sniff window), then
    ``META-INF/container.xml`` naming the OPF rootfile by full-path.
  * OPF package: the manifest maps item ids to hrefs; the SPINE's
    idref sequence — NOT file naming — defines reading order.  The
    fixture writer deliberately stores chapter content ROTATED
    against file names, so a reader that walked files in name order
    would produce rotated text: a parity hash certifies genuine
    spine resolution.
  * XHTML content documents: ``<p>`` paragraph scan with entity
    decode (the office-reader scanner discipline; no XML library).

Scale shape: one book one row, unzip + walk map-side, zero
exchanges — file-parallel like the rest of the family.
"""

from __future__ import annotations

import posixpath
import re

import pyarrow as pa

from .docx import _unescape, _xml_escape, read_zip
from .office import _build_zip_mixed

_EPUB_MIME = b"application/epub+zip"
_CONTAINER = (
    '<?xml version="1.0" encoding="UTF-8"?>'
    '<container version="1.0" xmlns="urn:oasis:names:tc:opendocument:'
    'xmlns:container"><rootfiles><rootfile full-path="OEBPS/content.'
    'opf" media-type="application/oebps-package+xml"/></rootfiles>'
    "</container>")


def build_epub(chapters: list[list[list[str]]],
               rotate: int = 0) -> bytes:
    """chapters: per SPINE position, a list of paragraphs (word
    lists).  ``rotate`` stores spine position s in the file named
    chap{(s + rotate) % n}.xhtml — file order and reading order
    disagree unless rotate == 0."""
    n = len(chapters)
    files: dict[int, bytes] = {}
    for s, paras in enumerate(chapters):
        body = "".join(
            "<p>" + " ".join(_xml_escape(w) for w in words) + "</p>"
            for words in paras)
        xhtml = ('<?xml version="1.0" encoding="UTF-8"?>'
                 '<html xmlns="http://www.w3.org/1999/xhtml"><head>'
                 f"<title>ch{s}</title></head><body>" + body
                 + "</body></html>")
        files[(s + rotate) % n] = xhtml.encode()
    manifest = "".join(
        f'<item id="c{j}" href="chap{j}.xhtml" '
        'media-type="application/xhtml+xml"/>'
        for j in sorted(files))
    spine = "".join(f'<itemref idref="c{(s + rotate) % n}"/>'
                    for s in range(n))
    opf = ('<?xml version="1.0" encoding="UTF-8"?>'
           '<package xmlns="http://www.idpf.org/2007/opf" version='
           '"3.0" unique-identifier="id"><metadata/><manifest>'
           + manifest + '</manifest><spine>' + spine
           + "</spine></package>")
    entries = [("mimetype", _EPUB_MIME),
               ("META-INF/container.xml", _CONTAINER.encode()),
               ("OEBPS/content.opf", opf.encode())]
    entries += [(f"OEBPS/chap{j}.xhtml", files[j]) for j in sorted(files)]
    return _build_zip_mixed(entries)


_ROOTFILE_RE = re.compile(r'<rootfile\s[^>]*full-path="([^"]+)"')
_ITEM_RE = re.compile(
    r'<item\s[^>]*?id="([^"]+)"[^>]*?href="([^"]+)"[^>]*?/?>')
_IDREF_RE = re.compile(r'<itemref\s[^>]*?idref="([^"]+)"')
_P_RE = re.compile(r"<p(?:\s[^>]*)?>(.*?)</p>", re.S)
_TAG_STRIP_RE = re.compile(r"<[^>]+>")


def epub_chapters(data: bytes) -> list[list[str]]:
    """EPUB bytes -> per SPINE position, the chapter's paragraph
    texts.  Raises on container damage (callers wrap)."""
    if data[30:38] != b"mimetype" or not data[38:].startswith(_EPUB_MIME):
        raise ValueError("not an EPUB container (mimetype rule)")
    parts = read_zip(data)
    cont = parts.get("META-INF/container.xml")
    if cont is None:
        raise ValueError("no META-INF/container.xml")
    m = _ROOTFILE_RE.search(cont.decode("utf-8", "replace"))
    if m is None:
        raise ValueError("no rootfile in container.xml")
    opf_path = m.group(1)
    opf = parts.get(opf_path)
    if opf is None:
        raise ValueError(f"missing OPF part {opf_path}")
    opf_xml = opf.decode("utf-8", "replace")
    base = posixpath.dirname(opf_path)
    hrefs = {i: h for i, h in _ITEM_RE.findall(opf_xml)}
    out: list[list[str]] = []
    for idref in _IDREF_RE.findall(opf_xml):
        href = hrefs.get(idref)
        if href is None:
            raise ValueError(f"spine idref {idref!r} not in manifest")
        path = posixpath.normpath(posixpath.join(base, href))
        doc = parts.get(path)
        if doc is None:
            raise ValueError(f"missing content document {path}")
        xml = doc.decode("utf-8", "replace")
        paras = [_unescape(_TAG_STRIP_RE.sub("", p.group(1)))
                 for p in _P_RE.finditer(xml)]
        out.append(paras)
    return out


# ---------------------------------------------------------------------------
# fixtures + query surface
# ---------------------------------------------------------------------------


def fixture_epub(i: int) -> bytes:
    """Deterministic book for doc_id ``i``: 1 + i%4 chapters in SPINE
    order, stored rotated by i (file names disagree with reading order
    whenever i % nc != 0); chapter s has 2 + (i+s)%3 paragraphs of
    2 + (i+s+p)%2 words 'e'||((43*i + 23*s + 11*p + 5*k) % 67)."""
    nc = 1 + i % 4
    chapters = [[[f"e{(43 * i + 23 * s + 11 * p + 5 * k) % 67}"
                  for k in range(2 + (i + s + p) % 2)]
                 for p in range(2 + (i + s) % 3)]
                for s in range(nc)]
    return build_epub(chapters, rotate=i % nc)


def _render_epub_fixture(batch: pa.Table) -> pa.Table:
    ids = batch.column("doc_id").to_pylist()
    return pa.table({"media_id": pa.array(ids, pa.int64()),
                     "media": pa.array([fixture_epub(i) for i in ids],
                                       pa.binary())})


def synth_epub_corpus(sf_dir: str, n: int | None = None):
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
        return ids.map_batches(_render_epub_fixture,
                               batch_format="pyarrow", batch_size=128)

    if n is None:
        return cached_ds("epub_corpus", sf_dir, build,
                         render_fn=_render_epub_fixture)
    return build()


class ExtractEPUB:
    def __call__(self, batch: pa.Table) -> pa.Table:
        ids = batch.column("media_id").to_pylist()
        blobs = batch.column("media").to_pylist()
        out = {"media_id": [], "chapter": [], "para": [], "text": []}
        for i, b in zip(ids, blobs):
            try:
                chapters = epub_chapters(b)
            except Exception:  # noqa: BLE001 — poison-row rule
                continue
            for s, paras in enumerate(chapters):
                for p, t in enumerate(paras):
                    out["media_id"].append(i)
                    out["chapter"].append(s)
                    out["para"].append(p)
                    out["text"].append(t)
        return pa.table({
            "media_id": pa.array(out["media_id"], pa.int64()),
            "chapter": pa.array(out["chapter"], pa.int64()),
            "para": pa.array(out["para"], pa.int64()),
            "text": pa.array(out["text"], pa.string())})


def docs_epub_extract(sf_dir: str):
    """ORACLED: per-(book, spine-position, paragraph) text — the
    fixture stores chapters ROTATED against file names, so the hash
    match certifies real container.xml -> OPF -> spine resolution,
    not name-order file walking."""
    ex = ExtractEPUB()
    return synth_epub_corpus(sf_dir).map_batches(
        lambda b: ex(b), batch_format="pyarrow", zero_copy_batch=True,
        batch_size=128)
