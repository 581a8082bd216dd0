"""Textract-`Blocks`-like IR construction (M5 output shape).

Builds the structured-document IR the normalizers (normalize.py) consume —
the analogue of the Textract result the reference parses with textract-trp
(postprocessing/fn-postprocess/main.py:31-32, Blocks loop :49-50, KV
fields :64-99). Block order within the list is the documented total
reading order:

    all LINE blocks (reading order) ++ all KV blocks (reading order)
    ++ all TABLE_CELL blocks (reading order)

`reading_order` on each block is the index of the source text block in
document order, shared between a LINE and the KV/CELL derived from it.

KV detection: a content line of shape "Key: Value" (key starts with a
letter, <=40 chars, no ':' inside) yields one KV block — the stand-in for
Textract FORMS key-value sets. Confidences are deterministic functions of
the text features (no RNG; SURVEY.md §7.4).
"""

from __future__ import annotations

import re

from .boilerplate import TextBlock

_KV_RE = re.compile(r"^\s*([A-Za-z][^:]{0,39}?)\s*:\s+(\S.*)$")


def value_confidence(value: str) -> float:
    """Deterministic value-token confidence analogue (0-100)."""
    return max(1.0, min(99.0, 55.0 + 1.5 * min(len(value), 25)))


def block_rows(tblocks: list[TextBlock], page: int = 0) -> list[dict]:
    """Content TextBlocks -> list of Block IR dicts (schema.BLOCK fields)."""
    lines: list[dict] = []
    kvs: list[dict] = []
    cells: list[dict] = []
    for order, tb in enumerate(tblocks):
        text = tb.text
        conf = tb.confidence()
        lines.append({
            "block_type": "LINE", "text": text, "confidence": conf,
            "page": page, "reading_order": order,
            "key_text": None, "value_text": None,
            "key_conf": None, "value_conf": None,
            "row": None, "col": None,
        })
        m = _KV_RE.match(text)
        if m:
            key, value = m.group(1), m.group(2)
            kvs.append({
                "block_type": "KV", "text": text, "confidence": conf,
                "page": page, "reading_order": order,
                "key_text": key, "value_text": value,
                "key_conf": conf, "value_conf": value_confidence(value),
                "row": None, "col": None,
            })
        if tb.table_row >= 0 and tb.table_col >= 0:
            cells.append({
                "block_type": "TABLE_CELL", "text": text, "confidence": conf,
                "page": page, "reading_order": order,
                "key_text": None, "value_text": None,
                "key_conf": None, "value_conf": None,
                "row": tb.table_row, "col": tb.table_col,
            })
    return lines + kvs + cells


def html_to_blocks(html_text: str) -> list[dict]:
    """Full HTML path: parse -> segment -> classify -> Block IR."""
    from .boilerplate import extract_blocks

    return block_rows(extract_blocks(html_text))


def extracted_text_from_blocks(blocks: list[dict]) -> str:
    """The main-content extraction result: newline-joined LINE texts.

    This is the byte-identical-per-url golden column (BASELINE.json
    north_rule). Distinct from the M7 search text (normalize.py), which
    replicates the reference's space-joined, first-line-excluded string.
    """
    return "\n".join(b["text"] for b in blocks if b["block_type"] == "LINE")
