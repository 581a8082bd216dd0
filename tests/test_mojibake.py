"""Mojibake repair (webxtract/ops/text.py fix_mojibake_text): the
sloppy-cp1252 inverse, its acceptance guards, and idempotence. Oracle
parity for the fixture classes lives in test_oracle_parity.py
(docs_fix_mojibake)."""

from hypothesis import given, settings
from hypothesis import strategies as st

from webxtract.ops.text import (fix_mojibake_text,
                                sloppy_cp1252_decode)

CLEAN = "café — naïve « déjà »… “quotes” – fiancée"


def mangle(s: str) -> str:
    return sloppy_cp1252_decode(s.encode("utf-8"))


def test_single_and_double_mangle_invert_exactly():
    assert fix_mojibake_text(mangle(CLEAN)) == (CLEAN, 1)
    assert fix_mojibake_text(mangle(mangle(CLEAN))) == (CLEAN, 2)


def test_clean_inputs_untouched():
    for s in ("plain ascii", "", "Ça va", "Ã alone", "é ü ñ 東京",
              "100% § legit ©"):
        assert fix_mojibake_text(s) == (s, 0)


def test_sloppy_passthrough_bytes_round_trip():
    # 0x81/0x8D/0x8F/0x90/0x9D are unmapped in strict cp1252; the
    # sloppy tables must carry them as their Latin-1 codepoints
    raw = bytes([0x81, 0x8D, 0x8F, 0x90, 0x9D])
    s = sloppy_cp1252_decode(raw)
    assert s == "\x81\x8d\x8f\x90\x9d"
    # a double-mangled em dash NEEDS the passthrough (utf-8 of 'â€”'
    # contains 0x9D) — strict cp1252 could not represent it
    assert fix_mojibake_text(mangle(mangle("—"))) == ("—", 2)


def test_repair_is_idempotent_on_its_own_output():
    fixed, r = fix_mojibake_text(mangle(CLEAN))
    assert r == 1
    assert fix_mojibake_text(fixed) == (fixed, 0)


@settings(max_examples=150, deadline=None)
@given(st.text(max_size=60))
def test_never_raises_and_rounds_bounded(s):
    fixed, rounds = fix_mojibake_text(s)
    assert 0 <= rounds <= 2
    assert isinstance(fixed, str)
    if rounds == 0:
        assert fixed == s


@settings(max_examples=100, deadline=None)
@given(st.text(alphabet=st.characters(codec="utf-8"), max_size=40))
def test_mangled_utf8_always_recovered_or_kept(s):
    """Any utf-8-encodable text, once mangled, either repairs exactly
    back or (if the mangle is a fixed point / not cp1252-range)
    stays deterministic — never corrupts to a third value on clean
    single-mangle input whose repair is accepted."""
    m = mangle(s)
    fixed, rounds = fix_mojibake_text(m, max_rounds=1)
    if rounds == 1:
        assert fixed == s or mangle(fixed) == m
    else:
        assert fixed == m


def test_non_latin_mojibake_repaired_through_batch_prefilter(ray_session):
    """Round-3 advisor finding: the old prefilter [ÂÃ]|â€ only flagged
    UTF-8 lead bytes 0xC2/0xC3/0xE2, so Cyrillic/Greek/CJK mojibake
    (lead bytes 0xC4-0xF4) silently bypassed repair in the BATCH path
    even though fix_mojibake_text could fix it. The widened class must
    flag every cp1252 image of a UTF-8 lead byte."""
    import pyarrow as pa
    import pyarrow.compute as pc
    import ray.data as rd

    from webxtract.ops.text import _MOJIBAKE_MARK, fix_mojibake

    cases = {
        "фото":  mangle("фото"),     # Cyrillic, lead 0xD1/0xD0
        "ελληνικά": mangle("ελληνικά"),  # Greek, lead 0xCE
        "東京":  mangle("東京"),      # CJK, lead 0xE6
        "עברית": mangle("עברית"),    # Hebrew, lead 0xD7
        "čeština": mangle("čeština"),  # Latin-ext, lead 0xC4/0xC5
    }
    # 1) the RE2 prefilter itself flags each mangled form
    flags = pc.match_substring_regex(
        pa.array(list(cases.values())), _MOJIBAKE_MARK).to_pylist()
    assert all(flags), f"prefilter missed: {cases}"
    # 2) end-to-end through the Dataset stage
    ds = rd.from_arrow(pa.table({
        "doc_id": pa.array(range(len(cases)), pa.int64()),
        "text": pa.array(list(cases.values()), pa.string())}))
    out = {r["doc_id"]: r for r in fix_mojibake(ds).take_all()}
    for i, clean in enumerate(cases):
        assert out[i]["text_fixed"] == clean
        assert out[i]["rounds"] == 1
    # 3) clean non-Latin text survives untouched (guard, not filter)
    ds2 = rd.from_arrow(pa.table({
        "doc_id": pa.array([0], pa.int64()),
        "text": pa.array(["фото 東京 clean"], pa.string())}))
    row = fix_mojibake(ds2).take_all()[0]
    assert row["text_fixed"] == "фото 東京 clean"
    assert row["rounds"] == 0
