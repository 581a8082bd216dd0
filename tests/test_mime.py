"""Email/MIME reader (ops/mime.py): QP and encoded-word round trips,
header unfolding, multipart walk, mbox framing, hostile input."""

import pytest

from webxtract.ops.mime import (
    build_email, build_mbox, decode_header, email_text, encode_word,
    fixture_email, parse_email, qp_decode, qp_encode, split_mbox,
)


@pytest.mark.parametrize("payload", [
    b"", b"hello=world", "caf\xe9 cr\xe8me\nnew line".encode("utf-8"),
    bytes(range(256)), b"x" * 500,  # forces soft line breaks
])
def test_qp_roundtrip(payload):
    enc = qp_encode(payload)
    assert all(len(ln) <= 76 for ln in enc.split("\r\n"))
    assert qp_decode(enc) == payload


@pytest.mark.parametrize("form", ["b", "q"])
def test_encoded_word_roundtrip(form):
    s = "Gr\xfc\xdfe und_mehr? =test"
    assert decode_header(encode_word(s, form)) == s


def test_adjacent_encoded_words_elide_whitespace():
    two = encode_word("ab", "b") + " " + encode_word("cd", "q")
    assert decode_header(two) == "abcd"


def test_header_folding_unfolds():
    long_subject = " ".join(f"word{k}" for k in range(30))
    msg = build_email(long_subject, "a@x", "b@x", "body")
    raw = msg.split(b"\r\n\r\n")[0]
    assert b"\r\n " in raw  # actually folded on the wire
    assert parse_email(msg)["subject"] == long_subject


def test_multipart_parts_and_preamble_skipped():
    msg = build_email("s", "a@x", "b@x", "plain body", multipart=True)
    parsed = parse_email(msg)
    assert [ct for ct, _ in parsed["parts"]] == ["text/plain",
                                                 "text/html"]
    assert email_text(msg) == "plain body"
    assert b"preamble" in msg  # and it did not become a part


@pytest.mark.parametrize("cte", ["8bit", "qp", "base64"])
def test_transfer_encodings(cte):
    body = "caf\xe9 =33 body\nsecond line"
    msg = build_email("s", "a@x", "b@x", body, cte=cte)
    assert email_text(msg) == body


def test_mbox_from_quoting_roundtrip():
    e1 = build_email("s1", "a@x", "b@x",
                     "From the start\n>From quoted\nmid")
    e2 = build_email("s2", "c@x", "d@x", "plain")
    msgs = split_mbox(build_mbox([e1, e2]))
    assert len(msgs) == 2
    assert email_text(msgs[0]) == "From the start\n>From quoted\nmid"
    assert parse_email(msgs[1])["subject"] == "s2"


def test_fixture_closed_form():
    for i in (0, 1, 2, 3, 4, 5, 7, 11):
        msg = parse_email(fixture_email(i))
        subj = (f"Subject {i % 100} report" if i % 3 == 0
                else f"S\xfcbject {i % 100} report")
        assert msg["subject"] == subj
        assert msg["from"] == f"user{i % 50}@host{i % 20}.example"
        assert len(msg["parts"]) == 1 + i % 2
        assert email_text(fixture_email(i)) == (
            f"caf\xe9 report {(7 * i) % 1000}\n"
            f"line id={(11 * i) % 500} end")


def test_missing_boundary_is_error():
    msg = (b"From: a@x\r\nContent-Type: multipart/mixed\r\n\r\nbody")
    with pytest.raises(ValueError, match="boundary"):
        parse_email(msg)


def test_truncation_bitflips_never_hang():
    data = fixture_email(9)
    for cut in range(0, len(data), max(1, len(data) // 19)):
        try:
            parse_email(data[:cut])
        except Exception:  # noqa: BLE001 — degradation is data
            pass
    for k in range(0, len(data), max(1, len(data) // 31)):
        mut = bytearray(data)
        mut[k] ^= 0xFF
        try:
            parse_email(bytes(mut))
        except Exception:  # noqa: BLE001
            pass
