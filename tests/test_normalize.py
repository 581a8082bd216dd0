"""Normalizer unit tests — each mirrors a cited span of the reference
postprocessing/fn-postprocess/main.py (see normalize.py docstring)."""

from webxtract.normalize import normalize_doc


def line(text, conf, order=0, page=0):
    return {"block_type": "LINE", "text": text, "confidence": conf,
            "page": page, "reading_order": order, "key_text": None,
            "value_text": None, "key_conf": None, "value_conf": None,
            "row": None, "col": None}


def kv(key, value, key_conf, value_conf, order=0, page=0):
    return {"block_type": "KV", "text": f"{key}: {value}", "confidence": key_conf,
            "page": page, "reading_order": order, "key_text": key,
            "value_text": value, "key_conf": key_conf, "value_conf": value_conf,
            "row": None, "col": None}


def test_vendor_is_first_line_with_raw_confidence():
    # main.py:47-56
    r = normalize_doc([line("Acme Store", 71.5), line("second line", 90.0)])
    assert r["vendor_value"] == "Acme Store"
    assert r["vendor_conf"] == 71.5


def test_search_text_excludes_first_line_trailing_space():
    # main.py:57-60: text += item["Text"] + " " for every non-first LINE.
    # Observable via the date fallback scanning that text.
    r = normalize_doc([line("Vendor 01/02/2020", 80.0), line("body", 70.0)])
    # the date in the FIRST line must NOT be found (text excludes it)
    assert r["date_value"] == ""


def test_total_min_conf_and_value_kept_verbatim():
    # main.py:77-89: candidate value keeps the raw text (with $)
    r = normalize_doc([line("V", 90.0), kv("Total", "$12.34", 80.0, 60.0)])
    assert r["total_value"] == "$12.34"
    assert r["total_conf"] == 60.0  # min(key, value)


def test_subtotal_half_penalty():
    # main.py:84-87
    r = normalize_doc([
        line("V", 90.0),
        kv("Subtotal", "$10.00", 80.0, 80.0),
        kv("Total", "$11.00", 70.0, 70.0, order=1),
    ])
    assert r["total_value"] == "$11.00"
    assert r["total_conf"] == 70.0
    assert r["alt_total"] == [{"confidence": 40.0, "value": "$10.00"}]


def test_unparseable_total_dropped():
    # main.py:90-91: float() failure -> candidate dropped
    r = normalize_doc([line("V", 90.0), kv("Total", "N/A", 80.0, 80.0)])
    assert r["total_value"] == ""
    assert r["total_conf"] == 0.0


def test_python_float_semantics():
    # '1_0' parses under Python float(), would fail an Arrow cast
    r = normalize_doc([line("V", 90.0), kv("Total", "1_0", 80.0, 75.0)])
    assert r["total_value"] == "1_0"
    assert r["total_conf"] == 75.0


def test_double_keyword_key_counted_twice():
    # searchFieldsByKey runs once per search key ["total", "amount"]; a key
    # containing both appends the candidate twice (main.py:64-89 loop shape)
    r = normalize_doc([line("V", 90.0), kv("Total Amount", "$5.00", 80.0, 70.0)])
    assert r["total_conf"] == 70.0
    assert r["alt_total"] == [{"confidence": 70.0, "value": "$5.00"}]


def test_date_kv_no_numeric_requirement():
    # main.py:93-100
    r = normalize_doc([line("V", 90.0), kv("Date", "Jan 5th", 66.0, 77.0)])
    assert r["date_value"] == "Jan 5th"
    assert r["date_conf"] == 66.0


def test_date_fallback_only_when_no_kv_date():
    # main.py:102-104: fallback iff zero KV date candidates
    with_kv = normalize_doc([
        line("V", 90.0), line("meeting 01/02/2021", 80.0, order=1),
        kv("Date", "xmas", 60.0, 60.0),
    ])
    assert with_kv["date_value"] == "xmas"
    without_kv = normalize_doc([
        line("V", 90.0), line("meeting 01/02/2021", 80.0, order=1),
    ])
    assert without_kv["date_value"] == "01/02/2021"
    assert without_kv["date_conf"] == 92.0  # Score 0.92 * 100 (main.py:115)


def test_fallback_requires_separator_chars():
    # main.py:110: value must contain one of "/:-"
    r = normalize_doc([line("V", 90.0), line("on 12:30 we met", 80.0, order=1)])
    assert r["date_value"] == "12:30"


def test_candidate_sort_stable_desc():
    # main.py:119-123: Python stable sort; ties keep discovery order
    r = normalize_doc([
        line("V", 90.0),
        kv("Date", "first", 70.0, 80.0),
        kv("Issue Date", "second", 70.0, 85.0, order=1),
    ])
    assert r["date_value"] == "first"
    assert r["alt_date"] == [{"confidence": 70.0, "value": "second"}]


def test_alternatives_only_when_multiple():
    # main.py:143-148
    one = normalize_doc([line("V", 90.0), kv("Total", "$1.00", 80.0, 80.0)])
    assert one["alt_total"] == []


def test_composite_is_min():
    # main.py:140-142
    r = normalize_doc([
        line("V", 88.0),
        kv("Total", "$2.00", 90.0, 95.0),
        kv("Date", "1/1/20", 91.0, 92.0, order=1),
    ])
    assert r["model_confidence"] == 88.0


def test_empty_doc():
    r = normalize_doc([])
    assert r["vendor_value"] == ""
    assert r["model_confidence"] == 0.0


def test_missing_fields_zero_confidence():
    # main.py:125-138: missing candidates -> {Confidence: 0, Value: ""}
    r = normalize_doc([line("Only Vendor Here", 75.0)])
    assert r["total_value"] == ""
    assert r["total_conf"] == 0.0
    assert r["model_confidence"] == 0.0
