"""Percent-encoding normalization (webxtract/ops/web.py
percent_normalize): unreserved decode in both hex cases, reserved
escapes preserved, malformed escapes as data, idempotence, hostile
input. Fixture parity lives in test_oracle_parity.py
(urls_percent_normalize)."""

from hypothesis import given, settings
from hypothesis import strategies as st

from webxtract.ops.web import UNRESERVED, percent_normalize


def _one(u):
    return percent_normalize([u])[0]


def test_spec_table():
    cases = {
        "%41bc": "Abc",            # upper hex
        "%61bc": "abc",            # lower char via its code
        "a%2db": "a-b",            # lower hex digits
        "%7E%7e": "~~",
        "p%2Fq": "p%2Fq",          # reserved '/' stays
        "%3D%3F%26": "%3D%3F%26",  # = ? & stay
        "%ZZ": "%ZZ",              # malformed as data
        "x%": "x%",                # trailing %
        "%%41": "%A",              # pinned replace semantics
        "plain": "plain",
        "": "",
    }
    for src, want in cases.items():
        assert _one(src) == want, src
    assert _one(None) is None


def test_every_unreserved_char_decodes_and_idempotent():
    for c in UNRESERVED:
        enc = f"%{ord(c):02X}"
        assert _one(enc) == c
        assert _one(enc.lower().replace("%", "%")) == c
        assert _one(c) == c  # already-decoded is a fixpoint
    # full round: encode everything, decode once, decode twice
    s = "".join(f"%{ord(c):02x}" for c in UNRESERVED)
    once = _one(s)
    assert once == UNRESERVED
    assert _one(once) == once


@settings(max_examples=150, deadline=None)
@given(st.text(max_size=60))
def test_never_raises_only_shrinks_deterministic(s):
    out = _one(s)
    assert isinstance(out, str) and len(out) <= len(s)
    assert _one(s) == out
    # NOT asserted: idempotence on arbitrary input — a stray '%'
    # abutting a decoded escape can form a new one ('%%341' ->
    # '%41'), pinned in the spec table; single-pass semantics are
    # the spec precisely because the SQL twin is single-pass too


def test_stray_percent_forms_new_escape_single_pass():
    # '%34' decodes to '4' after the stray '%', forming '%41' which
    # stays (the 'A' pattern already ran) — fixed pattern order makes
    # this deterministic and oracle-identical
    assert _one("%%341") == "%41"


def test_null_url_stays_null_in_batch_stage(ray_session):
    """Round-3 advisor finding: when any row in the batch contains
    '%', null urls must emit null url_norm — not the literal string
    'None' via astype(str)."""
    import pyarrow as pa
    import ray.data as rd

    from webxtract.ops.web import percent_normalize_stage

    ds = rd.from_arrow(pa.table({
        "url": pa.array(["https://a.example/%41", None, "plain"],
                        pa.string())}))
    rows = sorted(percent_normalize_stage(ds).take_all(),
                  key=lambda r: (r["url"] is None, r["url"] or ""))
    by_url = {r["url"]: r["url_norm"] for r in rows}
    assert by_url["https://a.example/%41"] == "https://a.example/A"
    assert by_url["plain"] == "plain"
    assert by_url[None] is None  # null in -> null out
