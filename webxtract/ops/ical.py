"""iCalendar (RFC 5545) parsing from spec — calendar/event payloads,
a common structured-text format in crawls (event pages, schedule
exports, .ics attachments).

The format's two famous sharp edges are both implemented exactly:

  * LINE FOLDING: content lines are folded at 75 octets with a
    CRLF + single-whitespace continuation; unfolding must splice the
    continuation WITHOUT the leading space (§3.1).  The fixture's
    summaries are long enough that every file exercises it.
  * TEXT escaping: ``\\n`` newline, ``\\,`` ``\\;`` ``\\\\`` literal
    separators (§3.3.11), applied per property value — parameters
    (``NAME;PARAM=v:value``) are split before unescaping.

`build_ics` writes real VCALENDAR/VEVENT streams with folding and
escapes; `parse_ics` unfolds, splits content lines, unescapes and
groups events.  One file one row, map-side, zero exchanges.
"""

from __future__ import annotations

import pyarrow as pa


def _escape(v: str) -> str:
    return (v.replace("\\", "\\\\").replace(";", "\\;")
            .replace(",", "\\,").replace("\n", "\\n"))


def _unescape(v: str) -> str:
    out = []
    i, n = 0, len(v)
    while i < n:
        c = v[i]
        if c == "\\" and i + 1 < n:
            nxt = v[i + 1]
            if nxt in ("n", "N"):
                out.append("\n")
            elif nxt in (";", ",", "\\"):
                out.append(nxt)
            else:
                out.append(nxt)
            i += 2
        else:
            out.append(c)
            i += 1
    return "".join(out)


def _fold(line: str, limit: int = 75) -> str:
    raw = line.encode("utf-8")
    if len(raw) <= limit:
        return line
    parts = []
    pos = 0
    first = True
    while pos < len(raw):
        take = limit - (0 if first else 1)
        chunk = raw[pos:pos + take]
        # never split a UTF-8 sequence: trim until the chunk decodes
        # (a trailing lead byte is as orphaned as a continuation byte)
        decoded = None
        while chunk:
            try:
                decoded = chunk.decode("utf-8")
                break
            except UnicodeDecodeError:
                chunk = chunk[:-1]
        if decoded is None:
            raise ValueError("unfoldable byte sequence")
        parts.append(("" if first else " ") + decoded)
        pos += len(chunk)
        first = False
    return "\r\n".join(parts)


def build_ics(events: list[dict]) -> bytes:
    """events: [{"uid", "dtstart", "summary", "location",
    "description"}] — folded and escaped per spec."""
    lines = ["BEGIN:VCALENDAR", "VERSION:2.0",
             "PRODID:-//webxtract//EN"]
    for ev in events:
        lines.append("BEGIN:VEVENT")
        lines.append(_fold(f"UID:{ev['uid']}"))
        lines.append(f"DTSTART:{ev['dtstart']}")
        lines.append(_fold(f"SUMMARY:{_escape(ev['summary'])}"))
        if ev.get("location"):
            lines.append(_fold("LOCATION;LANGUAGE=en:"
                               + _escape(ev["location"])))
        if ev.get("description"):
            lines.append(_fold("DESCRIPTION:"
                               + _escape(ev["description"])))
        lines.append("END:VEVENT")
    lines.append("END:VCALENDAR")
    return ("\r\n".join(lines) + "\r\n").encode("utf-8")


def parse_ics(data: bytes) -> list[dict]:
    """-> [{"uid", "dtstart", "summary", "location", "description"}]
    per VEVENT, in stream order."""
    text = data.decode("utf-8", "replace")
    # unfold: CRLF (or LF) followed by space/tab splices WITHOUT the
    # whitespace character
    text = text.replace("\r\n ", "").replace("\r\n\t", "")
    text = text.replace("\n ", "").replace("\n\t", "")
    events: list[dict] = []
    cur: dict | None = None
    in_cal = False
    import re as _re

    # split ONLY on CR/LF line ends — str.splitlines would also break
    # on NEL/LS/PS, which are ordinary TEXT characters inside values
    for line in _re.split(r"\r\n|\r|\n", text):
        if not line:
            continue
        name, _, value = line.partition(":")
        prop = name.split(";", 1)[0].upper()
        if prop == "BEGIN" and value.strip().upper() == "VCALENDAR":
            in_cal = True
            continue
        if prop == "BEGIN" and value.strip().upper() == "VEVENT":
            if not in_cal:
                raise ValueError("VEVENT outside VCALENDAR")
            cur = {"uid": "", "dtstart": "", "summary": "",
                   "location": "", "description": ""}
            continue
        if prop == "END" and value.strip().upper() == "VEVENT":
            if cur is not None:
                events.append(cur)
            cur = None
            continue
        if cur is None:
            continue
        if prop == "UID":
            cur["uid"] = value
        elif prop == "DTSTART":
            cur["dtstart"] = value
        elif prop == "SUMMARY":
            cur["summary"] = _unescape(value)
        elif prop == "LOCATION":
            cur["location"] = _unescape(value)
        elif prop == "DESCRIPTION":
            cur["description"] = _unescape(value)
    if not in_cal:
        raise ValueError("no VCALENDAR envelope")
    return events


# ---------------------------------------------------------------------------
# fixtures + query surface
# ---------------------------------------------------------------------------


def fixture_ics(i: int) -> bytes:
    events = []
    for e in range(1 + i % 3):
        n = (53 * i + 29 * e) % 983
        events.append({
            "uid": f"ev{i}-{e}@webxtract.example",
            "dtstart": (f"2026{1 + (i + e) % 12:02d}"
                        f"{1 + (i + e) % 28:02d}T"
                        f"{(3 * i + e) % 24:02d}0000Z"),
            # long enough to force folding; carries escaped ; , and
            # a literal newline
            "summary": (f"Event {n} " + "agenda item review " * 4
                        + "wrap; up, done"),
            "location": f"Room {n % 40}; floor {e}",
            "description": f"line one {n}\nline two {e}",
        })
    return build_ics(events)


def _render_ics_fixture(batch: pa.Table) -> pa.Table:
    ids = batch.column("doc_id").to_pylist()
    return pa.table({"media_id": pa.array(ids, pa.int64()),
                     "media": pa.array([fixture_ics(i) for i in ids],
                                       pa.binary())})


def synth_ics_corpus(sf_dir: str, n: int | None = None):
    from ..fixturecache import cached_ds
    import ray.data as rd

    def build():
        ids = rd.read_parquet(f"{sf_dir}/documents.parquet",
                              columns=["doc_id"])
        if n is not None:
            ids = ids.limit(n)
        try:
            import ray
            ids = ids.repartition(
                max(2, int(ray.cluster_resources().get("CPU", 8))))
        except Exception:
            pass
        return ids.map_batches(_render_ics_fixture,
                               batch_format="pyarrow", batch_size=128)

    if n is None:
        return cached_ds("ics_corpus", sf_dir, build,
                         render_fn=_render_ics_fixture)
    return build()


class ExtractICS:
    def __call__(self, batch: pa.Table) -> pa.Table:
        ids = batch.column("media_id").to_pylist()
        blobs = batch.column("media").to_pylist()
        out = {"media_id": [], "event": [], "uid": [], "dtstart": [],
               "summary": [], "location": [], "description": []}
        for i, b in zip(ids, blobs):
            try:
                events = parse_ics(b)
            except Exception:  # noqa: BLE001 — poison-row rule
                continue
            for e, ev in enumerate(events):
                out["media_id"].append(i)
                out["event"].append(e)
                for k in ("uid", "dtstart", "summary", "location",
                          "description"):
                    out[k].append(ev[k])
        return pa.table({
            "media_id": pa.array(out["media_id"], pa.int64()),
            "event": pa.array(out["event"], pa.int64()),
            "uid": pa.array(out["uid"], pa.string()),
            "dtstart": pa.array(out["dtstart"], pa.string()),
            "summary": pa.array(out["summary"], pa.string()),
            "location": pa.array(out["location"], pa.string()),
            "description": pa.array(out["description"], pa.string())})


def docs_ics_extract(sf_dir: str):
    """ORACLED: per-event fields from real iCalendar streams — every
    file's summary is long enough to force 75-octet folding, and
    every value carries escaped separators — so a hash match
    certifies the unfold splice and the §3.3.11 unescape exactly."""
    ex = ExtractICS()
    return synth_ics_corpus(sf_dir).map_batches(
        lambda b: ex(b), batch_format="pyarrow", zero_copy_batch=True,
        batch_size=128)
