"""iCalendar reader (ops/ical.py): folding/unfolding, escapes,
grouping, hostile input."""

import pytest

from webxtract.ops.ical import build_ics, fixture_ics, parse_ics


def _ev(**kw):
    ev = {"uid": "u@x", "dtstart": "20260101T000000Z",
          "summary": "s", "location": "", "description": ""}
    ev.update(kw)
    return ev


def test_folding_at_75_octets_and_splice():
    data = build_ics([_ev(summary="word " * 40)])
    lines = data.split(b"\r\n")
    assert any(ln.startswith(b" ") for ln in lines)  # folded
    assert all(len(ln) <= 75 for ln in lines)
    assert parse_ics(data)[0]["summary"] == "word " * 40


def test_fold_never_splits_utf8():
    data = build_ics([_ev(summary="\xfc" * 100)])
    assert parse_ics(data)[0]["summary"] == "\xfc" * 100
    for ln in data.split(b"\r\n"):
        ln.decode("utf-8")  # every physical line decodes standalone


def test_escapes_roundtrip():
    s = "a;b,c\\d\nnewline"
    data = build_ics([_ev(summary=s, description=s, location=s)])
    ev = parse_ics(data)[0]
    assert ev["summary"] == s and ev["description"] == s
    assert ev["location"] == s


def test_property_parameters_split_before_value():
    # LOCATION;LANGUAGE=en:... — the parameter must not leak into the
    # value, and a colon inside the value must survive
    data = build_ics([_ev(location="Building A: floor 2")])
    assert parse_ics(data)[0]["location"] == "Building A: floor 2"


def test_multiple_events_in_order():
    data = build_ics([_ev(uid=f"u{k}@x", summary=f"s{k}")
                      for k in range(3)])
    evs = parse_ics(data)
    assert [e["uid"] for e in evs] == ["u0@x", "u1@x", "u2@x"]


def test_no_envelope_is_error():
    with pytest.raises(ValueError, match="VCALENDAR"):
        parse_ics(b"BEGIN:VEVENT\r\nEND:VEVENT\r\n")


def test_fixture_closed_form():
    for i in (0, 1, 2, 3, 5, 8):
        evs = parse_ics(fixture_ics(i))
        assert len(evs) == 1 + i % 3
        for e, ev in enumerate(evs):
            n = (53 * i + 29 * e) % 983
            assert ev["summary"] == (f"Event {n} "
                                     + "agenda item review " * 4
                                     + "wrap; up, done")
            assert ev["location"] == f"Room {n % 40}; floor {e}"
            assert ev["description"] == f"line one {n}\nline two {e}"


def test_truncation_bitflips_never_hang():
    data = fixture_ics(4)
    for cut in range(0, len(data), max(1, len(data) // 17)):
        try:
            parse_ics(data[:cut])
        except ValueError:
            pass
    for k in range(0, len(data), max(1, len(data) // 29)):
        mut = bytearray(data)
        mut[k] ^= 0xFF
        try:
            parse_ics(bytes(mut))
        except ValueError:
            pass
