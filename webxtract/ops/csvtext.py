"""CSV parsing WITHOUT the csv module — the RFC 4180 state machine
plus quote-aware dialect sniffing.

Tabular text files are everywhere in crawls (data portals, exports),
and naive line-splitting corrupts them: quoted fields carry embedded
delimiters, doubled-quote escapes, and embedded NEWLINES (one record
spanning several physical lines).  This module implements the real
grammar:

  * `parse_csv` — a character state machine: quoted fields with ""
    escapes, embedded delimiters/newlines inside quotes, CRLF and LF
    row ends, trailing-newline tolerance.
  * `sniff_delimiter` — quote-AWARE dialect detection: each candidate
    delimiter is evaluated by running the full parser and requiring a
    consistent per-record field count > 1 (so a quoted comma cannot
    fool the semicolon hypothesis and vice versa).
  * `build_csv` — a writer with minimal RFC 4180 quoting, so fixture
    files are real and the parser round-trips values it did not
    "remember".

Scale shape: one file one row, parse map-side, zero exchanges.
"""

from __future__ import annotations

import pyarrow as pa

_CANDIDATES = (",", ";", "\t", "|")


def build_csv(rows: list[list[str]], delimiter: str = ",") -> str:
    out = []
    for row in rows:
        cells = []
        for v in row:
            if any(ch in v for ch in (delimiter, '"', "\n", "\r")):
                cells.append('"' + v.replace('"', '""') + '"')
            else:
                cells.append(v)
        if cells == [""]:
            # a lone empty field would serialize to a blank line,
            # which readers (ours and stdlib's) treat as no record —
            # quote it so the row survives the round trip
            cells = ['""']
        out.append(delimiter.join(cells))
    return "\r\n".join(out) + "\r\n"


def parse_csv(text: str, delimiter: str | None = None) -> list[list[str]]:
    if delimiter is None:
        delimiter = sniff_delimiter(text)
    rows, _bare = _parse_quality(text, delimiter)
    return rows


def _parse_quality(text: str,
                   delimiter: str) -> tuple[list[list[str]], bool]:
    """The RFC 4180 machine; also reports whether any BARE quote was
    consumed outside a quoted field (never happens when the delimiter
    hypothesis is right for a conforming file — the sniffing signal)."""
    rows: list[list[str]] = []
    field: list[str] = []
    row: list[str] = []
    i, n = 0, len(text)
    in_quotes = False
    started = False  # any char consumed for the current record?
    bare_quote = False
    while i < n:
        c = text[i]
        if in_quotes:
            if c == '"':
                if text[i + 1:i + 2] == '"':
                    field.append('"')
                    i += 2
                    continue
                in_quotes = False
                i += 1
                continue
            field.append(c)
            i += 1
            continue
        if c == '"':
            if not field:
                in_quotes = True
                started = True
                i += 1
                continue
            bare_quote = True  # quote mid-field: mis-parse signal
        if c == delimiter:
            row.append("".join(field))
            field = []
            started = True
            i += 1
            continue
        if c == "\r":
            i += 1
            continue
        if c == "\n":
            if started or field or row:
                row.append("".join(field))
                rows.append(row)
            field, row = [], []
            started = False
            i += 1
            continue
        field.append(c)
        started = True
        i += 1
    if started or field or row:
        row.append("".join(field))
        rows.append(row)
    if in_quotes:
        raise ValueError("unterminated quoted field")
    return rows, bare_quote


def sniff_delimiter(text: str,
                    candidates: tuple[str, ...] = _CANDIDATES) -> str:
    """First candidate that yields a CONSISTENT per-record field
    count > 1 under the full quote-aware parse."""
    for cand in candidates:
        try:
            rows, bare = _parse_quality(text, cand)
        except ValueError:
            continue
        counts = {len(r) for r in rows}
        if rows and not bare and len(counts) == 1 and counts.pop() > 1:
            return cand
    raise ValueError("no consistent delimiter found")


# ---------------------------------------------------------------------------
# fixtures + query surface
# ---------------------------------------------------------------------------


def _cell(i: int, r: int, c: int, delim: str) -> str:
    sel = (i + r + c) % 4
    n = (31 * i + 11 * r + 5 * c) % 997
    if sel == 0:
        return f"v{n}"
    if sel == 1:
        return f"a{delim}b{n}"          # quoted: embedded delimiter
    if sel == 2:
        return f'q"x{n}'                # quoted: doubled-quote escape
    return f"l1\nl2{n}"                 # quoted: embedded newline


def fixture_csv(i: int) -> bytes:
    delim = _CANDIDATES[i % 4]
    rows = [[_cell(i, r, c, delim) for c in range(2 + i % 3)]
            for r in range(2 + (i + 1) % 3)]
    return build_csv(rows, delim).encode("utf-8")


def _render_csv_fixture(batch: pa.Table) -> pa.Table:
    ids = batch.column("doc_id").to_pylist()
    return pa.table({"media_id": pa.array(ids, pa.int64()),
                     "media": pa.array([fixture_csv(i) for i in ids],
                                       pa.binary())})


def synth_csv_corpus(sf_dir: str, n: int | None = None):
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
        return ids.map_batches(_render_csv_fixture,
                               batch_format="pyarrow", batch_size=128)

    if n is None:
        return cached_ds("csv_corpus", sf_dir, build,
                         render_fn=_render_csv_fixture)
    return build()


_DELIM_NAME = {",": "comma", ";": "semicolon", "\t": "tab",
               "|": "pipe"}


class ExtractCSV:
    def __call__(self, batch: pa.Table) -> pa.Table:
        ids = batch.column("media_id").to_pylist()
        blobs = batch.column("media").to_pylist()
        out = {"media_id": [], "row": [], "col": [], "value": [],
               "delim": []}
        for i, b in zip(ids, blobs):
            try:
                text = b.decode("utf-8")
                d = sniff_delimiter(text)
                rows = parse_csv(text, d)
            except Exception:  # noqa: BLE001 — poison-row rule
                continue
            for r, cells in enumerate(rows):
                for c, v in enumerate(cells):
                    out["media_id"].append(i)
                    out["row"].append(r)
                    out["col"].append(c)
                    out["value"].append(v)
                    out["delim"].append(_DELIM_NAME[d])
        return pa.table({
            "media_id": pa.array(out["media_id"], pa.int64()),
            "row": pa.array(out["row"], pa.int64()),
            "col": pa.array(out["col"], pa.int64()),
            "value": pa.array(out["value"], pa.string()),
            "delim": pa.array(out["delim"], pa.string())})


def docs_csv_extract(sf_dir: str):
    """ORACLED: per-cell values from a mixed-dialect CSV corpus; each
    file's delimiter is SNIFFED, not given — the hash certifies the
    quote-aware sniffing plus the full RFC 4180 machine (embedded
    delimiters, doubled quotes, multi-line quoted records)."""
    ex = ExtractCSV()
    return synth_csv_corpus(sf_dir).map_batches(
        lambda b: ex(b), batch_format="pyarrow", zero_copy_batch=True,
        batch_size=128)
