"""Document-quality gate (M2-M4).

Replaces the reference's Rekognition good/bad image classifier
(preprocessing/fn-preprocess/main.py:73-79, labels :18-19, gate :129-146)
with deterministic heuristics over the raw ``html`` bytes: size bounds,
encoding sniff, tag presence, and a text/markup-density score.

Semantics mirrored from the reference:
  * a 2-class good/bad score with MinConfidence=50 — scores below 50 are
    "not returned" (main.py:73-78); zero surviving labels => reject
    ("PoorQualityImage: Model returned no labels", main.py:118-119);
  * top surviving label not in ACCEPTABLE_CLASSES ("good",) => reject
    (main.py:129-146);
  * rejection is DATA, not control flow: rejected rows carry a
    ``reject_reason`` and flow to the rejected side-output (the ASL Catch
    -> Rejected terminal state, StateMachine.asl.json:14-25).

Vectorization: byte-level feature extraction is done per row (cheap,
bounded by PROBE bytes) inside a batch loop; this stage is I/O shaped,
not compute shaped, and runs as stateless map_batches tasks.
"""

from __future__ import annotations

import re

import numpy as np
import pyarrow as pa

PDFISH_MAGIC = b"%XYD1\n"
PDF_MAGIC = b"%PDF-"
ZIP_MAGIC = b"PK\x03\x04"
RTF_MAGIC = b"{\\rtf"
_TAG_RE = re.compile(rb"<[a-zA-Z!/]")
_STRIP_TAGS_RE = re.compile(rb"<[^>]{0,256}>")
_PROBE = 16_384  # score only the head; giant blobs must not cost O(size)

LABEL_CLASSES = ("bad", "good")      # mirror preprocessing/fn-preprocess/main.py:18
ACCEPTABLE_CLASSES = ("good",)       # main.py:19
MIN_CONFIDENCE = 50.0                # main.py:73


def score_page(html: bytes | None, min_bytes: int = 64,
               max_bytes: int = 65_536) -> tuple[str, float, str | None, str]:
    """Classify one page. Returns (label, confidence, reject_reason, doc_kind).

    label in {"good", "bad"}; confidence 0-100; reject_reason is None for
    accepted pages; doc_kind in {"html", "pdfish", "raw"}.
    """
    if html is None or len(html) < min_bytes:
        return "bad", 99.0, "too_small", "raw"
    if len(html) > max_bytes:
        return "bad", 99.0, "too_large", "raw"
    if html.startswith(PDFISH_MAGIC):
        return "good", 95.0, None, "pdfish"
    if html.startswith(PDF_MAGIC):
        # real PDF payload: positioned text comes from the ops/pdf.py
        # content-stream interpreter; structure confidence mirrors the
        # pdfish path (the layout engine downstream is identical)
        return "good", 95.0, None, "pdf"
    if html.startswith(ZIP_MAGIC):
        # office ZIP package (DOCX/ODT): cheap container sniff here,
        # part-layout dispatch happens in the extractor (a non-office
        # zip degrades to an empty-doc DATA row, per the poison-row
        # rule)
        return "good", 95.0, None, "docx"
    if html.startswith(RTF_MAGIC):
        return "good", 95.0, None, "rtf"
    probe = html[:_PROBE]
    try:
        probe.decode("utf-8")
    except UnicodeDecodeError as e:
        # a multi-byte char straddling the probe edge is not an encoding error
        if e.start < len(probe) - 4:
            from .htmldom import decode_bytes

            # honor an explicitly declared whitelisted charset
            if decode_bytes(html) is None:
                return "bad", 99.0, "bad_encoding", "raw"
    if _TAG_RE.search(probe) is None:
        return "bad", 99.0, "not_html", "raw"
    text_bytes = len(_STRIP_TAGS_RE.sub(b"", probe))
    ratio = text_bytes / max(1, len(probe))
    good_score = min(99.0, 25.0 + 150.0 * ratio)
    # MinConfidence analogue: a sub-50 good score means the "good" label is
    # not returned at all => the top (only) label is "bad".
    if good_score < MIN_CONFIDENCE:
        return "bad", 100.0 - good_score, "low_quality", "html"
    return "good", good_score, None, "html"


class QualityGate:
    """Stateless batch UDF: appends quality columns to a pages batch.

    Usage: ``ds.map_batches(QualityGate(cfg), batch_format="pyarrow")``.
    """

    def __init__(self, min_bytes: int = 64, max_bytes: int = 65_536):
        self.min_bytes = min_bytes
        self.max_bytes = max_bytes

    def __call__(self, batch: pa.Table) -> pa.Table:
        htmls = batch.column("html").to_pylist()  # bulk, not per-row as_py
        urls = batch.column("url").to_pylist()
        n = len(htmls)
        labels = np.empty(n, dtype=object)
        confs = np.empty(n, dtype=np.float64)
        reasons = np.empty(n, dtype=object)
        kinds = np.empty(n, dtype=object)
        for i in range(n):
            if urls[i] is None:  # M1: malformed record -> rejected data
                labels[i], confs[i], reasons[i], kinds[i] = (
                    "bad", 99.0, "malformed", "raw")
                continue
            labels[i], confs[i], reasons[i], kinds[i] = score_page(
                htmls[i], self.min_bytes, self.max_bytes
            )
        batch = batch.append_column("quality_label", pa.array(labels, pa.string()))
        batch = batch.append_column("quality_conf", pa.array(confs, pa.float64()))
        batch = batch.append_column("reject_reason", pa.array(reasons, pa.string()))
        batch = batch.append_column("doc_kind", pa.array(kinds, pa.string()))
        return batch
