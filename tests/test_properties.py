"""Property-based tests (hypothesis): the normalizers against an
independently-written transcription of the reference logic, and
order/partitioning invariants for dedup and candidate ranking."""

from hypothesis import given, settings
from hypothesis import strategies as st

from webxtract.datefind import detect_dates
from webxtract.dedup import dedup_table
from webxtract.normalize import normalize_doc
from webxtract import synth

conf = st.floats(min_value=0.0, max_value=100.0, allow_nan=False)
short_text = st.text(
    alphabet=st.characters(whitelist_categories=("Lu", "Ll", "Nd"),
                           whitelist_characters=" $./:-"),
    min_size=0, max_size=24)


@st.composite
def kv_block(draw, order):
    key = draw(st.one_of(
        st.sampled_from(["Total", "Subtotal", "Amount Due", "Date",
                         "Issue Date", "Total Amount", "Ref", "Tax"]),
        short_text.filter(lambda s: s.strip())))
    value = draw(short_text)
    kc, vc = draw(conf), draw(conf)
    return {"block_type": "KV", "text": f"{key}: {value}",
            "confidence": kc, "page": 0, "reading_order": order,
            "key_text": key, "value_text": value,
            "key_conf": kc, "value_conf": vc, "row": None, "col": None}


@st.composite
def doc_blocks(draw):
    n_lines = draw(st.integers(0, 5))
    n_kvs = draw(st.integers(0, 5))
    blocks = []
    for i in range(n_lines):
        t = draw(short_text)
        blocks.append({"block_type": "LINE", "text": t,
                       "confidence": draw(conf), "page": 0,
                       "reading_order": i, "key_text": None,
                       "value_text": None, "key_conf": None,
                       "value_conf": None, "row": None, "col": None})
    for i in range(n_kvs):
        blocks.append(draw(kv_block(n_lines + i)))
    return blocks


def reference_transcription(blocks):
    """Direct, independent transcription of
    postprocessing/fn-postprocess/main.py:34-148 over the Block IR
    (kept deliberately naive — the production normalize_doc must agree
    on every generated input)."""
    amount_form_keys = ["total", "amount"]
    date_form_keys = ["date"]
    text = ""
    vendor = {"Confidence": 0, "Value": ""}
    for item in blocks:
        if item["block_type"] == "LINE":
            if vendor["Value"] == "":
                vendor = {"Confidence": item["confidence"],
                          "Value": item["text"]}
            else:
                text += item["text"] + " "
    total_c, date_c = [], []
    kvs = [b for b in blocks if b["block_type"] == "KV"]
    for page in sorted({b["page"] for b in kvs}):
        fields = [b for b in kvs if b["page"] == page]
        for key in amount_form_keys:
            for f in [f for f in fields if key in f["key_text"].lower()]:
                key_lower = f["key_text"].lower()
                if (("total" in key_lower or "amount" in key_lower)
                        and f["value_text"] is not None):
                    try:
                        float(f["value_text"].lstrip("$"))
                    except Exception:
                        continue
                    total_c.append({
                        "Confidence": min(f["key_conf"], f["value_conf"])
                        * (0.5 if "sub" in key_lower else 1.0),
                        "Value": f["value_text"]})
        for key in date_form_keys:
            for f in [f for f in fields if key in f["key_text"].lower()]:
                if f["value_text"] is not None:
                    date_c.append({
                        "Confidence": min(f["key_conf"], f["value_conf"]),
                        "Value": f["value_text"]})
    if not len(date_c) > 0:
        for e in detect_dates(text):
            if e.get("Type") == "DATE":
                v = e.get("Text").strip("\t\n\r")
                if "/" in v or ":" in v or "-" in v:
                    date_c.append({"Confidence": e.get("Score", 0) * 100,
                                   "Value": v})
    date_c = sorted(date_c, key=lambda c: c["Confidence"], reverse=True)
    total_c = sorted(total_c, key=lambda c: c["Confidence"], reverse=True)
    dr = date_c[0] if date_c else None
    tr = total_c[0] if total_c else None
    out = {
        "date_value": dr["Value"] if dr else "",
        "date_conf": float(dr["Confidence"] if dr else 0),
        "total_value": tr["Value"] if tr else "",
        "total_conf": float(tr["Confidence"] if tr else 0),
        "vendor_value": vendor["Value"],
        "vendor_conf": float(vendor["Confidence"]),
    }
    out["model_confidence"] = float(min(
        out["date_conf"], out["total_conf"], out["vendor_conf"]))
    out["alt_date"] = ([{"confidence": c["Confidence"], "value": c["Value"]}
                        for c in date_c[1:]] if len(date_c) > 1 else [])
    out["alt_total"] = ([{"confidence": c["Confidence"], "value": c["Value"]}
                         for c in total_c[1:]] if len(total_c) > 1 else [])
    return out


@settings(max_examples=300, deadline=None)
@given(doc_blocks())
def test_normalize_matches_reference_transcription(blocks):
    assert normalize_doc(blocks) == reference_transcription(blocks)


@settings(max_examples=50, deadline=None)
@given(st.integers(10, 120), st.randoms())
def test_dedup_is_row_order_invariant(n, rnd):
    t = synth.make_pages(n, seed=42)
    perm = list(range(t.num_rows))
    rnd.shuffle(perm)
    shuffled = t.take(perm)
    a = dedup_table(t)
    b = dedup_table(shuffled)
    assert a.sort_by("url").equals(b.sort_by("url"))


@settings(max_examples=100, deadline=None)
@given(st.text(max_size=200))
def test_detect_dates_deterministic_and_ordered(text):
    a = detect_dates(text)
    b = detect_dates(text)
    assert a == b
    # offsets strictly advance (no overlapping entities)
    pos = -1
    for e in a:
        i = text.find(e["Text"], pos + 1)
        assert i >= 0
        pos = i


@settings(max_examples=150, deadline=None)
@given(st.data())
def test_covered_tokens_equals_interval_union(data):
    """_covered_tokens (vectorized min(gap,n) scan) == brute-force
    union of fixed-width intervals, per segment, for arbitrary sorted
    start sets."""
    import numpy as np

    from webxtract.ops.text import _covered_tokens

    n = data.draw(st.integers(min_value=1, max_value=8))
    n_segs = data.draw(st.integers(min_value=1, max_value=4))
    starts, seg_starts, expect = [], [], []
    for _ in range(n_segs):
        seg = sorted(data.draw(st.lists(
            st.integers(min_value=0, max_value=40),
            min_size=1, max_size=12)))
        seg_starts.append(len(starts))
        starts.extend(seg)
        covered = set()
        for s in seg:
            covered.update(range(s, s + n))
        expect.append(len(covered))
    got = _covered_tokens(np.asarray(starts, np.int64),
                          np.asarray(seg_starts, np.int64), n)
    assert got.tolist() == expect


@settings(max_examples=100, deadline=None)
@given(st.data())
def test_despan_batchwise_equals_bruteforce(data):
    """_despan_batchwise == per-doc python reference (drop tokens under
    any [s, s+n) window, rejoin) for random docs and window starts."""
    import numpy as np
    import pyarrow as pa

    from webxtract.ops.text import _despan_batchwise

    n = data.draw(st.integers(min_value=1, max_value=5))
    vocab = ["aa", "bb", "cc", "dd"]
    docs = data.draw(st.lists(st.lists(
        st.sampled_from(vocab), min_size=1, max_size=15),
        min_size=1, max_size=5))
    rows, starts = [], []
    expect_text, expect_kept = [], []
    for i, toks in enumerate(docs):
        n_wins = data.draw(st.integers(min_value=0, max_value=4))
        wins = sorted(data.draw(st.lists(
            st.integers(min_value=0, max_value=max(0, len(toks) - n)),
            min_size=n_wins, max_size=n_wins))) if len(toks) >= n else []
        covered = set()
        for s in wins:
            covered.update(range(s, s + n))
            rows.append(i)
            starts.append(s)
        kept = [t for j, t in enumerate(toks) if j not in covered]
        expect_text.append(" ".join(kept))
        expect_kept.append(len(kept))
    batch = pa.table({
        "doc_id": pa.array(range(len(docs)), pa.int64()),
        "text": pa.array([" ".join(t) for t in docs]),
    })
    out = _despan_batchwise(
        batch, (np.asarray(rows, np.int64), np.asarray(starts, np.int64)),
        n)
    assert out.column("text_clean").to_pylist() == expect_text
    assert out.column("n_kept").to_pylist() == expect_kept
