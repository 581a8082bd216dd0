"""PPTX (PresentationML) slide-text extraction — the third OOXML
member over the shared PKZIP walk (ops/docx.py).

DrawingML text lives in shape text bodies: ``p:sp > p:txBody > a:p >
a:r > a:t`` with ``a:br`` line breaks; slides are separate parts
(``ppt/slides/slideN.xml``) ordered by their number.  `build_pptx`
writes genuine minimal packages (content types, package rels,
presentation part, one part per slide) and `pptx_slides` walks them —
no XML library, same scanner discipline as the DOCX/ODT readers.

Scale shape: one deck one row, unzip + scan map-side, zero exchanges.
"""

from __future__ import annotations

import re

import pyarrow as pa

from .docx import _unescape, _xml_escape, build_zip, read_zip

_CT_HEAD = (
    '<?xml version="1.0" encoding="UTF-8" standalone="yes"?>'
    '<Types xmlns="http://schemas.openxmlformats.org/package/2006/'
    'content-types"><Default Extension="rels" ContentType="application'
    '/vnd.openxmlformats-package.relationships+xml"/><Default '
    'Extension="xml" ContentType="application/xml"/>'
    '<Override PartName="/ppt/presentation.xml" ContentType='
    '"application/vnd.openxmlformats-officedocument.presentationml.'
    'presentation.main+xml"/>')
_RELS = (
    '<?xml version="1.0" encoding="UTF-8" standalone="yes"?>'
    '<Relationships xmlns="http://schemas.openxmlformats.org/package/'
    '2006/relationships"><Relationship Id="rId1" Type="http://schemas.'
    'openxmlformats.org/officeDocument/2006/relationships/'
    'officeDocument" Target="ppt/presentation.xml"/></Relationships>')


def build_pptx(slides: list[list[list[str]]]) -> bytes:
    """slides: per slide, a list of paragraphs (word lists)."""
    entries = []
    ct = [_CT_HEAD]
    pres_rels = []
    sldids = []
    for sn, paras in enumerate(slides, start=1):
        body = []
        for words in paras:
            runs = []
            for k, w in enumerate(words):
                if k:
                    runs.append("<a:r><a:t> </a:t></a:r>")
                runs.append(f"<a:r><a:t>{_xml_escape(w)}</a:t></a:r>")
            body.append("<a:p>" + "".join(runs) + "</a:p>")
        slide = ('<?xml version="1.0" encoding="UTF-8" standalone='
                 '"yes"?><p:sld xmlns:p="http://schemas.openxmlformats'
                 '.org/presentationml/2006/main" xmlns:a="http://'
                 'schemas.openxmlformats.org/drawingml/2006/main">'
                 "<p:cSld><p:spTree><p:sp><p:txBody>"
                 + "".join(body) +
                 "</p:txBody></p:sp></p:spTree></p:cSld></p:sld>")
        entries.append((f"ppt/slides/slide{sn}.xml", slide.encode()))
        ct.append(f'<Override PartName="/ppt/slides/slide{sn}.xml" '
                  'ContentType="application/vnd.openxmlformats-office'
                  'document.presentationml.slide+xml"/>')
        pres_rels.append(
            f'<Relationship Id="rId{sn}" Type="http://schemas.openxml'
            'formats.org/officeDocument/2006/relationships/slide" '
            f'Target="slides/slide{sn}.xml"/>')
        sldids.append(f'<p:sldId id="{255 + sn}" r:id="rId{sn}"/>')
    ct.append("</Types>")
    pres = ('<?xml version="1.0" encoding="UTF-8" standalone="yes"?>'
            '<p:presentation xmlns:p="http://schemas.openxmlformats.'
            'org/presentationml/2006/main" xmlns:r="http://schemas.'
            'openxmlformats.org/officeDocument/2006/relationships">'
            "<p:sldIdLst>" + "".join(sldids) + "</p:sldIdLst>"
            "</p:presentation>")
    prels = ('<?xml version="1.0" encoding="UTF-8" standalone="yes"?>'
             '<Relationships xmlns="http://schemas.openxmlformats.org/'
             'package/2006/relationships">' + "".join(pres_rels)
             + "</Relationships>")
    return build_zip([
        ("[Content_Types].xml", "".join(ct).encode()),
        ("_rels/.rels", _RELS.encode()),
        ("ppt/presentation.xml", pres.encode()),
        ("ppt/_rels/presentation.xml.rels", prels.encode()),
    ] + entries)


_SLIDE_RE = re.compile(r"^ppt/slides/slide(\d+)\.xml$")
_A_TAG_RE = re.compile(r"<(/?)a:(p|t|br)((?:\s[^>]*?)?)(/?)>")


def pptx_slides(data: bytes) -> list[list[str]]:
    """PPTX bytes -> per slide (number order), paragraph texts."""
    parts = read_zip(data)
    slides = sorted(
        ((int(m.group(1)), name) for name, m in
         ((n, _SLIDE_RE.match(n)) for n in parts) if m))
    if not slides:
        raise ValueError("no ppt/slides/slideN.xml parts")
    out: list[list[str]] = []
    for _, name in slides:
        xml = parts[name].decode("utf-8", "replace")
        paras: list[str] = []
        cur: list[str] | None = None
        for m in _A_TAG_RE.finditer(xml):
            closing, tag, _attrs, selfclose = m.groups()
            if tag == "p":
                if not closing and not selfclose:
                    cur = []
                elif closing and cur is not None:
                    paras.append("".join(cur))
                    cur = None
            elif cur is None:
                continue
            elif tag == "t" and not closing and not selfclose:
                end = xml.find("</a:t>", m.end())
                if end >= 0:
                    cur.append(_unescape(xml[m.end():end]))
            elif tag == "br" and not closing:
                cur.append("\n")
        out.append(paras)
    return out


# ---------------------------------------------------------------------------
# fixtures + query surface
# ---------------------------------------------------------------------------


def fixture_pptx(i: int) -> bytes:
    return build_pptx([
        [[f"p{(41 * i + 19 * s + 7 * p + 3 * k) % 73}"
          for k in range(2 + (i + s + p) % 2)]
         for p in range(2 + (i + s) % 3)]
        for s in range(1 + i % 3)])


def _render_pptx_fixture(batch: pa.Table) -> pa.Table:
    ids = batch.column("doc_id").to_pylist()
    return pa.table({"media_id": pa.array(ids, pa.int64()),
                     "media": pa.array([fixture_pptx(i) for i in ids],
                                       pa.binary())})


def synth_pptx_corpus(sf_dir: str, n: int | None = None):
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
        return ids.map_batches(_render_pptx_fixture,
                               batch_format="pyarrow", batch_size=128)

    if n is None:
        return cached_ds("pptx_corpus", sf_dir, build,
                         render_fn=_render_pptx_fixture)
    return build()


class ExtractPPTX:
    def __call__(self, batch: pa.Table) -> pa.Table:
        ids = batch.column("media_id").to_pylist()
        blobs = batch.column("media").to_pylist()
        out = {"media_id": [], "slide": [], "para": [], "text": []}
        for i, b in zip(ids, blobs):
            try:
                slides = pptx_slides(b)
            except Exception:  # noqa: BLE001 — poison-row rule
                continue
            for s, paras in enumerate(slides):
                for p, t in enumerate(paras):
                    out["media_id"].append(i)
                    out["slide"].append(s)
                    out["para"].append(p)
                    out["text"].append(t)
        return pa.table({
            "media_id": pa.array(out["media_id"], pa.int64()),
            "slide": pa.array(out["slide"], pa.int64()),
            "para": pa.array(out["para"], pa.int64()),
            "text": pa.array(out["text"], pa.string())})


def docs_pptx_extract(sf_dir: str):
    """ORACLED: per-(deck, slide, paragraph) text from real PPTX
    packages — multi-part slide ordering by number plus the DrawingML
    a:p/a:r/a:t scan, byte-for-byte."""
    ex = ExtractPPTX()
    return synth_pptx_corpus(sf_dir).map_batches(
        lambda b: ex(b), batch_format="pyarrow", zero_copy_batch=True,
        batch_size=128)
