"""Hypothesis property gates for the round-5 format readers: writer ->
parser round trips on RANDOM inputs (not just the closed-form
fixtures), the same posture as the QM-coder/parallelism property
tests."""

from hypothesis import given, settings
from hypothesis import strategies as st

# text without the characters each writer legitimately cannot carry
_plain = st.text(
    alphabet=st.characters(min_codepoint=32, max_codepoint=0x2FF,
                           exclude_characters="\x7f"),
    min_size=0, max_size=40)
_word = st.text(
    alphabet=st.characters(min_codepoint=33, max_codepoint=0x2FF,
                           exclude_characters="\x7f"),
    min_size=1, max_size=12)
_words = st.lists(_word, min_size=1, max_size=6)
_paras = st.lists(_words, min_size=1, max_size=5)


@settings(max_examples=40, deadline=None)
@given(_paras)
def test_docx_roundtrip_random(paras):
    from webxtract.ops.docx import build_docx, docx_paragraphs

    exp = [" ".join(ws) for ws in paras]
    assert docx_paragraphs(build_docx(paras)) == exp


@settings(max_examples=40, deadline=None)
@given(_paras)
def test_odt_roundtrip_random(paras):
    from webxtract.ops.office import build_odt, odt_paragraphs

    exp = [" ".join(ws) for ws in paras]
    assert odt_paragraphs(build_odt(paras)) == exp


@settings(max_examples=40, deadline=None)
@given(st.lists(st.lists(st.text(
    alphabet=st.characters(min_codepoint=32, max_codepoint=0x2FF,
                           exclude_characters="\x7f"),
    min_size=1, max_size=12).filter(lambda w: " " not in w),
    min_size=1, max_size=5), min_size=1, max_size=4))
def test_rtf_roundtrip_random(paras):
    from webxtract.ops.office import build_rtf, rtf_text

    exp = [" ".join(ws) for ws in paras]
    assert rtf_text(build_rtf(paras)) == exp


@settings(max_examples=40, deadline=None)
@given(st.lists(st.lists(_plain, min_size=1, max_size=4),
                min_size=1, max_size=5))
def test_csv_roundtrip_random(rows):
    from webxtract.ops.csvtext import build_csv, parse_csv

    # normalize row widths (CSV has no ragged-row guarantee to test)
    width = max(len(r) for r in rows)
    rows = [r + [""] * (width - len(r)) for r in rows]
    for d in (",", ";", "\t", "|"):
        assert parse_csv(build_csv(rows, d), d) == rows


@settings(max_examples=40, deadline=None)
@given(st.binary(min_size=0, max_size=2000))
def test_qp_roundtrip_random(payload):
    from webxtract.ops.mime import qp_decode, qp_encode

    assert qp_decode(qp_encode(payload)) == payload


@settings(max_examples=40, deadline=None)
@given(_plain, st.sampled_from(["b", "q"]))
def test_encoded_word_roundtrip_random(text, form):
    from webxtract.ops.mime import decode_header, encode_word

    assert decode_header(encode_word(text, form)) == text


@settings(max_examples=30, deadline=None)
@given(_plain.filter(lambda s: s.strip() == s), st.integers(0, 2),
       st.sampled_from(["8bit", "qp", "base64"]), st.booleans())
def test_email_roundtrip_random(subject, _salt, cte, multipart):
    from webxtract.ops.mime import build_email, email_text, parse_email

    body = "line one\nsecond " + subject
    msg = build_email(subject, "a@x.example", "b@x.example", body,
                      cte=cte, multipart=multipart)
    parsed = parse_email(msg)
    # folding may collapse runs of spaces; compare the unfold-stable
    # form (single spaces), which is what RFC 5322 guarantees
    assert " ".join(parsed["subject"].split()) == \
        " ".join(subject.split())
    assert email_text(msg) == body


@settings(max_examples=30, deadline=None)
@given(st.lists(st.binary(min_size=0, max_size=600),
                min_size=1, max_size=4), st.booleans())
def test_tar_roundtrip_random(payloads, gz):
    from webxtract.ops.tarwalk import build_tar, parse_tar

    entries = [(f"d/f{k}.bin", p) for k, p in enumerate(payloads)]
    ms = parse_tar(build_tar(entries, gzip=gz))
    assert [(m["name"], m["payload"]) for m in ms] == entries


@settings(max_examples=30, deadline=None)
@given(st.lists(st.integers(0, 10**6), min_size=1, max_size=200),
       st.sampled_from([1, 5, 32773]), st.sampled_from(["<", ">"]),
       st.integers(1, 9))
def test_tiff_roundtrip_random(vals, comp, endian, rps):
    import numpy as np

    from webxtract.ops.tiffcodec import build_tiff_image, decode_tiff

    w = max(1, len(vals) // 8)
    h = (len(vals) + w - 1) // w
    arr = np.zeros(h * w, np.uint8)
    arr[:len(vals)] = np.asarray(vals, np.int64) % 256
    arr = arr.reshape(h, w)
    dec = decode_tiff(build_tiff_image(arr, compression=comp,
                                       endian=endian,
                                       rows_per_strip=rps))
    assert dec is not None and (dec == arr).all()


@settings(max_examples=30, deadline=None)
@given(_plain)
def test_ics_escape_roundtrip_random(value):
    from webxtract.ops.ical import build_ics, parse_ics

    ev = {"uid": "u@x", "dtstart": "20260101T000000Z",
          "summary": value, "location": value, "description": value}
    got = parse_ics(build_ics([ev]))[0]
    assert got["summary"] == value
    assert got["location"] == value
    assert got["description"] == value
