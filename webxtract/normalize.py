"""Field normalizers + confidence logic (M6-M13) — byte-exact.

Reimplements the reference's post-processing rules over our Block IR,
preserving the exact semantics line by line
(postprocessing/fn-postprocess/main.py):

  * vendor = first LINE's text, confidence = that block's confidence (:47-56)
  * search text = every other LINE + " " (trailing space, first excluded) (:57-60)
  * total candidates: two-pass key search ["total", "amount"] (substring,
    case-insensitive — textract-trp searchFieldsByKey semantics), re-check
    ("total" in key or "amount" in key) and value non-null, value must
    Python-float-parse after lstrip("$"); confidence =
    min(key_conf, value_conf) * (0.5 if "sub" in key else 1.0) (:62-91).
    NOTE: a key containing both search terms is appended twice — replicated.
  * date candidates: key search ["date"], no numeric check (:93-100)
  * date fallback iff zero KV date candidates: entity detection over the
    search text, keep Type=="DATE", strip "\\t\\n\\r", must contain one of
    "/:-", confidence = Score * 100 (:102-117)
  * per-field winner: Python-stable sort desc by confidence, first;
    missing -> {Confidence: 0, Value: ""} (:119-138)
  * Alternatives = candidates[1:] only when >1 candidate (:143-148)
  * composite Confidence = min over the three fields (:140-142)

Per-row logic runs in a Python loop inside the batch (the candidate lists
are tiny; the expensive work — parsing — happened upstream). Float math is
IEEE-754 double throughout, matching CPython.
"""

from __future__ import annotations

AMOUNT_FORM_KEYS = ["total", "amount"]  # main.py:35
DATE_FORM_KEYS = ["date"]               # main.py:36


from dataclasses import dataclass  # noqa: E402


@dataclass(frozen=True)
class FieldSpec:
    """The customization surface the reference flags as THE extension
    point (the review-callback warns its field schema must be edited
    when the task changes, fn-human-review-callback/main.py:8-9;
    amount/date key lists at fn-postprocess/main.py:35-36). Defaults
    reproduce the reference byte-for-byte."""

    amount_keys: tuple[str, ...] = tuple(AMOUNT_FORM_KEYS)
    date_keys: tuple[str, ...] = tuple(DATE_FORM_KEYS)
    subtotal_marker: str = "sub"     # main.py:86
    subtotal_penalty: float = 0.5    # main.py:86


DEFAULT_SPEC = FieldSpec()


def _python_float_parses(s: str) -> bool:
    """Python float() semantics (accepts '1_0', 'nan', '+1', 'inf', ...) —
    deliberately NOT an Arrow cast (SURVEY.md §2.8)."""
    try:
        float(s)
        return True
    except Exception:
        return False


def normalize_doc(blocks: list[dict], spec: FieldSpec = DEFAULT_SPEC) -> dict:
    """Blocks list (one doc) -> flat ModelResult dict."""
    # --- vendor + search text (main.py:39-60) ---
    vendor_conf = 0.0
    vendor_value = ""
    text_parts: list[str] = []
    for b in blocks:
        if b["block_type"] == "LINE":
            if vendor_value == "":
                vendor_value = b["text"]
                vendor_conf = b["confidence"]
            else:
                text_parts.append(b["text"])
    text = "".join(p + " " for p in text_parts)  # trailing-space concat (:60)

    kv_blocks = [b for b in blocks if b["block_type"] == "KV"]
    pages = sorted({b["page"] for b in kv_blocks})

    total_candidates: list[dict] = []
    date_candidates: list[dict] = []

    # --- KV searches, page-outer / key-inner loop order (main.py:64-100) ---
    for page in pages:
        page_kvs = [b for b in kv_blocks if b["page"] == page]
        for key in spec.amount_keys:
            for f in page_kvs:
                key_lower = f["key_text"].lower()
                if key not in key_lower:  # searchFieldsByKey: substring match
                    continue
                if (any(k in key_lower for k in spec.amount_keys)
                        and f["value_text"] is not None):
                    if _python_float_parses(f["value_text"].lstrip("$")):
                        total_candidates.append({
                            "Confidence": (
                                min(f["key_conf"], f["value_conf"])
                                * (spec.subtotal_penalty
                                   if spec.subtotal_marker in key_lower else 1.0)
                            ),
                            "Value": f["value_text"],
                        })
                    # parse failure: drop + log in the reference (:90-91)
        for key in spec.date_keys:
            for f in page_kvs:
                if key in f["key_text"].lower() and f["value_text"] is not None:
                    date_candidates.append({
                        "Confidence": min(f["key_conf"], f["value_conf"]),
                        "Value": f["value_text"],
                    })

    # --- date entity fallback (main.py:102-117) ---
    if not len(date_candidates) > 0:
        from .datefind import detect_dates

        for entity in detect_dates(text):
            if entity.get("Type") == "DATE":
                value_str = entity.get("Text").strip("\t\n\r")
                if "/" in value_str or ":" in value_str or "-" in value_str:
                    date_candidates.append({
                        "Confidence": entity.get("Score", 0) * 100,
                        "Value": value_str,
                    })

    # --- ranking (main.py:119-123), Python stable sort ---
    date_candidates = sorted(date_candidates, key=lambda c: c["Confidence"], reverse=True)
    total_candidates = sorted(total_candidates, key=lambda c: c["Confidence"], reverse=True)
    date_result = date_candidates[0] if len(date_candidates) else None
    total_result = total_candidates[0] if len(total_candidates) else None

    date_conf = date_result["Confidence"] if date_result else 0
    date_value = date_result["Value"] if date_result else ""
    total_conf = total_result["Confidence"] if total_result else 0
    total_value = total_result["Value"] if total_result else ""

    # --- composite min (main.py:140-142) + Alternatives (:143-148) ---
    composite = min(date_conf, total_conf, vendor_conf)
    alt_date = (
        [{"confidence": c["Confidence"], "value": c["Value"]} for c in date_candidates[1:]]
        if len(date_candidates) > 1 else []
    )
    alt_total = (
        [{"confidence": c["Confidence"], "value": c["Value"]} for c in total_candidates[1:]]
        if len(total_candidates) > 1 else []
    )

    return {
        "vendor_value": vendor_value,
        "vendor_conf": float(vendor_conf),
        "date_value": date_value,
        "date_conf": float(date_conf),
        "total_value": total_value,
        "total_conf": float(total_conf),
        "model_confidence": float(composite),
        "alt_date": alt_date,
        "alt_total": alt_total,
    }


EMPTY_RESULT = {
    "vendor_value": "", "vendor_conf": 0.0,
    "date_value": "", "date_conf": 0.0,
    "total_value": "", "total_conf": 0.0,
    "model_confidence": 0.0, "alt_date": [], "alt_total": [],
}
