"""From-scratch date-entity detector (M11).

Stand-in for the reference's Comprehend ``detect_entities`` DATE fallback
(postprocessing/fn-postprocess/main.py:102-117). Deterministic regex
rules; each pattern carries a fixed 0-1 score (the Comprehend-`Score`
analogue; the caller multiplies by 100 per main.py:115).

Entities are emitted in text order (Comprehend emits by offset);
overlapping matches keep the earliest-starting one (ties: pattern order).
"""

from __future__ import annotations

import re

_MONTHS = "Jan|Feb|Mar|Apr|May|Jun|Jul|Aug|Sep|Oct|Nov|Dec"

# (compiled pattern, score) in priority order for overlap ties.
PATTERNS: list[tuple[re.Pattern, float]] = [
    (re.compile(r"\b\d{1,2}/\d{1,2}/\d{2,4}\b"), 0.92),
    (re.compile(r"\b\d{4}-\d{1,2}-\d{1,2}\b"), 0.90),
    (re.compile(rf"\b\d{{1,2}}-(?:{_MONTHS})-\d{{2,4}}\b"), 0.88),
    (re.compile(rf"\b(?:{_MONTHS})[a-z]* \d{{1,2}},? \d{{4}}\b"), 0.84),
    (re.compile(r"\b\d{1,2}:\d{2}(?::\d{2})?\b"), 0.55),  # times are DATE entities too
]


def detect_dates(text: str) -> list[dict]:
    """Return [{"Type": "DATE", "Text": str, "Score": float}] in offset order."""
    found: list[tuple[int, int, int, str, float]] = []
    for pi, (pat, score) in enumerate(PATTERNS):
        for m in pat.finditer(text):
            found.append((m.start(), pi, m.end(), m.group(), score))
    found.sort(key=lambda t: (t[0], t[1]))
    out: list[dict] = []
    last_end = -1
    for start, _pi, end, txt, score in found:
        if start < last_end:
            continue  # overlap: earliest-starting match wins
        out.append({"Type": "DATE", "Text": txt, "Score": score})
        last_end = end
    return out
