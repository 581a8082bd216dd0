"""WARC source: parse Web ARChive files (ISO 28500 — the container
Common Crawl ships) into (url, warc_ts, html) page rows.

The reference ingests per-object uploads from S3 (SURVEY.md §2.1 S1/S2);
a Common-Crawl-scale crawl arrives as WARC instead, so this is the
missing real-world source format: version-line framing, header block
terminated by CRLF CRLF, payload framed by ``Content-Length`` (REAL
framing — a record's payload may contain anything, so splitting on
markers would be wrong), each record followed by CRLF CRLF. ``response``
records carry an HTTP message as payload; the HTML body starts after
the HTTP header block. Gzip files (member-per-record, the Common-Crawl
layout) decompress as concatenated members via stdlib zlib.

Ray shape: one WARC file is one unit of parallelism (Common Crawl cuts
~1 GB files for exactly this reason) — ``read_warc`` maps file blobs
through the parser with ``flat_map``-style batch expansion; at 100 TB
the file listing is the partition plan and nothing exchanges.
"""

from __future__ import annotations

import zlib

import numpy as np  # noqa: F401  (parity with sibling ops modules)
import pyarrow as pa

_CRLF2 = b"\r\n\r\n"


def _gunzip_members(raw: bytes) -> bytes:
    """Decompress concatenated gzip members (Common Crawl is one member
    per record); plain bytes pass through."""
    if not raw.startswith(b"\x1f\x8b"):
        return raw
    out = []
    pos = 0
    while pos < len(raw):
        d = zlib.decompressobj(wbits=31)
        try:
            out.append(d.decompress(raw[pos:]))
        except zlib.error:  # corrupt member: keep the decoded prefix
            break
        if not d.eof:  # truncated trailing member: keep what decoded
            break
        pos = len(raw) - len(d.unused_data)
        if not d.unused_data:
            break
    return b"".join(out)


def parse_warc(raw: bytes, keep_http_headers: bool = False) -> list[dict]:
    """Parse one WARC file's bytes into response-record dicts
    (url, warc_ts, html, http_status, n_bytes). Malformed trailing
    data ends the scan (partial files parse their complete prefix);
    non-response records (warcinfo, request, metadata) are skipped by
    type, never by guesswork. ``keep_http_headers=True`` additionally
    carries each record's raw HTTP header block (status line +
    headers, no terminating CRLFCRLF) for header-semantics stages."""
    raw = _gunzip_members(raw)
    recs = []
    pos = 0
    n = len(raw)
    while pos < n:
        # skip inter-record CRLFs
        while raw.startswith(b"\r\n", pos):
            pos += 2
        if pos >= n:
            break
        if not raw.startswith(b"WARC/", pos):
            break  # framing lost: stop, do not resync on markers
        hdr_end = raw.find(_CRLF2, pos)
        if hdr_end < 0:
            break
        head = raw[pos:hdr_end].decode("utf-8", "replace")
        headers = {}
        for line in head.split("\r\n")[1:]:
            k, _, v = line.partition(":")
            headers[k.strip().lower()] = v.strip()
        try:
            clen = int(headers.get("content-length", ""))
        except ValueError:
            break
        body_start = hdr_end + 4
        body = raw[body_start:body_start + clen]
        if len(body) < clen:
            break  # truncated payload: complete records only
        pos = body_start + clen
        if headers.get("warc-type") == "response":
            status = 0
            html = b""
            http_head = b""
            http_end = body.find(_CRLF2)
            if http_end >= 0:
                status_line = body[:body.find(b"\r\n")]
                parts = status_line.split()
                if len(parts) >= 2 and parts[1].isdigit():
                    status = int(parts[1])
                html = body[http_end + 4:]
                http_head = body[:http_end]
            rec = {
                "url": headers.get("warc-target-uri", ""),
                "warc_ts": headers.get("warc-date", ""),
                "html": html,
                "http_status": status,
                "n_bytes": len(html),
            }
            if keep_http_headers:
                rec["http_headers"] = http_head
            recs.append(rec)
    return recs


def read_warc(paths, pages_schema: bool = False,
              keep_http_headers: bool = False):
    """paths (file/dir) -> Dataset of (url, warc_ts, html, http_status,
    n_bytes). One read task per file; the parse expands each blob into
    its page rows inside the same batch pass. ``pages_schema=True``
    instead emits the canonical pages-table columns (url, warc_ts,
    html, text='', lang='und') so the output feeds extract_pipeline /
    the corpus exporter directly (the WARC->corpus CLI chain).
    ``keep_http_headers=True`` adds the raw HTTP header block as a
    binary ``http_headers`` column for header-semantics stages."""
    import ray.data as rd

    ds = rd.read_binary_files(paths)

    def expand(t: pa.Table) -> pa.Table:
        rows = []
        for raw in t.column("bytes").to_pylist():
            rows.extend(parse_warc(raw,
                                   keep_http_headers=keep_http_headers))
        cols = {
            "url": pa.array([r["url"] for r in rows], pa.string()),
            "warc_ts": pa.array([r["warc_ts"] for r in rows],
                                pa.string()),
            "html": pa.array([r["html"] for r in rows], pa.binary()),
        }
        if pages_schema:
            cols["text"] = pa.array([""] * len(rows), pa.string())
            cols["lang"] = pa.array(["und"] * len(rows), pa.string())
        else:
            cols["http_status"] = pa.array(
                [r["http_status"] for r in rows], pa.int32())
            cols["n_bytes"] = pa.array(
                [r["n_bytes"] for r in rows], pa.int64())
        if keep_http_headers:
            cols["http_headers"] = pa.array(
                [r["http_headers"] for r in rows], pa.binary())
        return pa.table(cols)

    return ds.map_batches(expand, batch_format="pyarrow", batch_size=4)


def _warc_record(wtype: str, headers: list[tuple[str, str]],
                 payload: bytes) -> bytes:
    head = [b"WARC/1.0"]
    head += [f"{k}: {v}".encode() for k, v in headers]
    head.append(f"Content-Length: {len(payload)}".encode())
    return b"\r\n".join(head) + _CRLF2 + payload + _CRLF2


def build_warc(records, gzip_members: bool = False) -> bytes:
    """Serialize (url, ts, html_bytes) triples into WARC/1.0 bytes —
    a warcinfo record first (parsers must skip it), then one response
    record per page with a real HTTP/1.1 header block. Deterministic:
    no clocks, no uuids (record ids derive from the url). A record may
    be a 4-tuple (url, ts, html, http_block) carrying its own status
    line + header lines (no trailing CRLF); Content-Length and the
    body are appended the same way as the default block."""
    out = []
    record = _warc_record
    info = b"software: webxtract-synth\r\n"
    out.append(record("warcinfo", [
        ("WARC-Type", "warcinfo"),
        ("WARC-Record-ID", "<urn:webxtract:warcinfo>"),
        ("Content-Type", "application/warc-fields"),
    ], info))
    for rec in records:
        url, ts, html = rec[0], rec[1], rec[2]
        block = rec[3] if len(rec) > 3 else \
            b"HTTP/1.1 200 OK\r\nContent-Type: text/html; charset=utf-8"
        http = (block + b"\r\n"
                + f"Content-Length: {len(html)}".encode()
                + _CRLF2 + html)
        out.append(record("response", [
            ("WARC-Type", "response"),
            ("WARC-Target-URI", url),
            ("WARC-Date", ts),
            ("WARC-Record-ID", f"<urn:webxtract:{url}>"),
            ("Content-Type", "application/http; msgtype=response"),
        ], http))
    if gzip_members:  # one gzip member per record — the CC layout
        return b"".join(_gzip_member(r) for r in out)
    return b"".join(out)


def _gzip_member(data: bytes) -> bytes:
    co = zlib.compressobj(6, zlib.DEFLATED, 31)
    return co.compress(data) + co.flush()


def synth_warc_dir(sf_dir: str, out_dir: str, files: int = 8,
                   gzip_members: bool = False) -> str:
    """Deterministic WARC fixture: the documents table's rows become
    response records (html wraps the text; url/ts closed-form in
    doc_id), hashed across ``files`` .warc(.gz) files. Idempotent per
    (sf_dir, files, gzip) — rebuilt only if absent."""
    import os

    import pyarrow.parquet as pq

    os.makedirs(out_dir, exist_ok=True)
    ext = ".warc.gz" if gzip_members else ".warc"
    expect = [os.path.join(out_dir, f"crawl-{i:05d}{ext}")
              for i in range(files)]
    if all(os.path.exists(p) for p in expect):
        return out_dir
    t = pq.read_table(f"{sf_dir}/documents.parquet",
                      columns=["doc_id", "text"])
    buckets: list[list] = [[] for _ in range(files)]
    for i, text in zip(t.column("doc_id").to_pylist(),
                       t.column("text").to_pylist()):
        url = f"https://site{i % 50}.example/p/{i}"
        ts = f"2024-01-{1 + i % 28:02d}T00:00:00Z"
        html = (f"<html><body><p>{text}</p></body></html>").encode()
        buckets[i % files].append((url, ts, html))
    for fi, recs in enumerate(buckets):
        raw = build_warc(recs, gzip_members=gzip_members)
        with open(expect[fi] + ".tmp", "wb") as f:
            f.write(raw)
        os.replace(expect[fi] + ".tmp", expect[fi])
    return out_dir


def warc_page_stats(sf_dir: str, gzip_members: bool = True):
    """ORACLED query surface: synthesize the WARC fixture, parse it
    with the real framing parser, and emit per-page metadata (url,
    http_status, n_bytes) — all closed-form in (doc_id, text), so the
    DuckDB twin certifies record framing, warcinfo skipping, HTTP
    header separation and payload-length accounting end to end."""
    tag = "gz" if gzip_members else "plain"
    out_dir = synth_warc_dir(
        sf_dir, f"/tmp/webxtract_warc_{tag}_{sf_dir.replace('/', '_')}",
        gzip_members=gzip_members)
    ds = read_warc(out_dir)

    def project(t: pa.Table) -> pa.Table:
        return t.select(["url", "http_status", "n_bytes"]).set_column(
            1, "http_status", t.column("http_status").cast(pa.int64()))

    return ds.map_batches(project, batch_format="pyarrow",
                          zero_copy_batch=True).sort("url")


# --- CDX index (random access over WARC) ------------------------------------
# The Common-Crawl-style capture index: one row per response record
# with its FILE + BYTE OFFSET + RECORD LENGTH, SURT key, 14-digit
# timestamp and payload digest — what makes a 100 TB crawl
# random-accessible (fetch one page = one ranged read + one member
# gunzip) instead of a full scan. Plain files index exact record
# extents (trailing CRLFCRLF included, per the WARC record grammar);
# .warc.gz files index GZIP MEMBER extents (the CC one-record-per-
# member layout — byte addressing finer than a member is impossible
# in compressed space; a multi-record member shares its extent across
# its rows, documented). Digest is md5-hex of the HTTP payload body
# (CC ships sha1/base32; md5 keeps the DuckDB oracle exact).

import re as _re


def surt_key(url: str) -> str:
    """Sort-friendly URL key: lowercase host labels reversed and
    comma-joined + ')' + path (+ '?query' verbatim — CC additionally
    sorts params; we keep them as-is, documented). Scheme, userinfo
    and port drop; unparseable urls fall back to the lowered string."""
    m = _re.match(r"^[a-zA-Z][a-zA-Z0-9+.\-]*://([^/?#]*)([^?#]*)"
                  r"(?:\?([^#]*))?", url or "")
    if not m:
        return (url or "").lower()
    hostport, path, query = m.group(1), m.group(2), m.group(3)
    host = hostport.split("@")[-1].lower()
    if ":" in host:
        host = host.rsplit(":", 1)[0]
    key = ",".join(reversed(host.split("."))) + ")" + (path or "/")
    if query is not None:
        key += "?" + query
    return key


def cdx_timestamp(warc_date: str) -> str:
    """WARC-Date (ISO 8601) -> the CDX 14-digit timestamp: digits
    only, first 14."""
    return _re.sub(r"\D", "", warc_date or "")[:14]


def _iter_gzip_members(raw: bytes):
    """Yield (offset, compressed_length, decompressed_bytes) per gzip
    member; corrupt / truncated tails end the scan (prefix parses)."""
    pos = 0
    n = len(raw)
    while pos < n:
        d = zlib.decompressobj(wbits=31)
        try:
            data = d.decompress(raw[pos:])
        except zlib.error:
            break
        if not d.eof:
            break
        end = n - len(d.unused_data)
        yield pos, end - pos, data
        pos = end
        if not d.unused_data:
            break


def cdx_records(raw: bytes) -> list[tuple[int, int, dict]]:
    """One WARC file's bytes -> [(offset, length, response-record
    dict)] with byte-exact extents (see module note for the gz member
    rule). Framing mirrors parse_warc: Content-Length only, never
    marker scans; malformed tails end the scan."""
    out = []
    if raw.startswith(b"\x1f\x8b"):
        for off, ln, data in _iter_gzip_members(raw):
            for rec in parse_warc(data):
                out.append((off, ln, rec))
        return out
    pos = 0
    n = len(raw)
    while pos < n:
        while raw.startswith(b"\r\n", pos):  # stray padding owns no row
            pos += 2
        if not raw.startswith(b"WARC/", pos):
            break
        start = pos
        hdr_end = raw.find(_CRLF2, pos)
        if hdr_end < 0:
            break
        head = raw[pos:hdr_end].decode("utf-8", "replace")
        clen = None
        for line in head.split("\r\n")[1:]:
            k, _, v = line.partition(":")
            if k.strip().lower() == "content-length":
                try:  # last occurrence wins — parse_warc's dict rule
                    clen = int(v.strip())
                except ValueError:
                    clen = None
        if clen is None:
            break
        body_end = hdr_end + 4 + clen
        if body_end > n:
            break
        end = body_end + 4 if raw.startswith(_CRLF2, body_end) \
            else body_end
        for rec in parse_warc(raw[start:end]):
            out.append((start, end - start, rec))
        pos = end
    return out


def _list_warc_files(paths) -> list[str]:
    """Expand a file/dir/list into sorted .warc/.warc.gz paths."""
    import os

    out = []
    for p in ([paths] if isinstance(paths, str) else list(paths)):
        if os.path.isdir(p):
            out.extend(os.path.join(p, f) for f in os.listdir(p)
                       if f.endswith((".warc", ".warc.gz")))
        else:
            out.append(p)
    return sorted(out)


def build_cdx(paths):
    """paths (file/dir of .warc/.warc.gz) -> Dataset of CDX rows
    (surt, cdx_ts, url, file, roffset, rlength, http_status, digest).
    One read task per file, rows expand in-batch — zero exchanges;
    the 100 TB shape is 'index shards sorted per file range', with the
    global sort an explicit final step (warc_cdx does it).

    Reads RAW bytes with its own open() per file, NOT
    read_binary_files: Ray auto-decompresses '.gz' by extension
    (pa.Codec.detect on the path), which would silently turn the gz
    member extents into decompressed-space offsets — useless for
    ranged reads against the on-disk file. Pinned by
    test_cdx_gz_offsets_are_on_disk_extents."""
    import hashlib
    import os

    import ray.data as rd

    ds = rd.from_items(_list_warc_files(paths))

    def expand(t: pa.Table) -> pa.Table:
        surts, tss, urls, files_, offs, lens, stats, digs = \
            [], [], [], [], [], [], [], []
        for path in t.column("item").to_pylist():
            with open(path, "rb") as fh:
                raw = fh.read()
            fname = os.path.basename(path)
            for off, ln, rec in cdx_records(raw):
                surts.append(surt_key(rec["url"]))
                tss.append(cdx_timestamp(rec["warc_ts"]))
                urls.append(rec["url"])
                files_.append(fname)
                offs.append(off)
                lens.append(ln)
                stats.append(rec["http_status"])
                digs.append(hashlib.md5(rec["html"]).hexdigest())
        return pa.table({
            "surt": pa.array(surts, pa.string()),
            "cdx_ts": pa.array(tss, pa.string()),
            "url": pa.array(urls, pa.string()),
            "file": pa.array(files_, pa.string()),
            "roffset": pa.array(offs, pa.int64()),
            "rlength": pa.array(lens, pa.int64()),
            "http_status": pa.array(stats, pa.int64()),
            "digest": pa.array(digs, pa.string()),
        })

    return ds.map_batches(expand, batch_format="pyarrow", batch_size=4)


def warc_cdx(sf_dir: str):
    """ORACLED query surface: CDX over the PLAIN-format fixture, where
    every record extent is closed-form — DuckDB rebuilds each record's
    exact byte length from the serialization grammar (per-line strlens
    + separator arithmetic, Content-Length digit widths included) and
    each offset as the warcinfo constant plus a window sum over the
    file's preceding records. Certifies the byte-exact framing walk
    end to end. (.warc.gz extents are pinned by the ranged-read
    round-trip test instead — zlib byte counts aren't SQL.)"""
    out_dir = synth_warc_dir(
        sf_dir,
        f"/tmp/webxtract_warc_plain_{sf_dir.replace('/', '_')}",
        gzip_members=False)
    return build_cdx(out_dir).sort("surt")


# --- sharded CDX: sorted runs + k-way merge (the 100 TB path) -------------

_CDX_SORT_KEY = ["surt", "cdx_ts", "file", "roffset"]


def write_cdx_shards(paths, shard_dir: str,
                     files_per_shard: int = 4) -> list[str]:
    """Stage one of the two-level CDX plan SCALE.md promises: each
    task indexes a bounded group of WARC files and writes ONE
    parquet run, sorted by the full CDX key (surt, cdx_ts, file,
    roffset), named deterministically by its file group and written
    atomically (tmp + os.replace) so a re-run after failure skips or
    cleanly overwrites finished shards — per-partition resumability,
    never one giant file. Returns the sorted shard paths.

    This is how Common Crawl's own cdx-*.gz index is laid out: ~300
    sorted shard files + a secondary index of key ranges; the merge
    below is the read side's range-partitioned counterpart."""
    import os

    import ray
    import ray.data as rd

    os.makedirs(shard_dir, exist_ok=True)
    files = _list_warc_files(paths)
    groups = [files[i:i + files_per_shard]
              for i in range(0, len(files), files_per_shard)]
    items = [{"gid": gi, "files": g} for gi, g in enumerate(groups)]

    def index_group(t: pa.Table) -> pa.Table:
        outs = []
        for gid, grp in zip(t.column("gid").to_pylist(),
                            t.column("files").to_pylist()):
            dest = os.path.join(shard_dir, f"cdx-{gid:05d}.parquet")
            if os.path.exists(dest):
                # finished shard from a prior run: content is a pure
                # function of the file group, so skipping is exact
                outs.append({"shard": dest, "rows": -1})
                continue
            tbl = pa.concat_tables(
                [_expand_cdx_file(p) for p in grp]) \
                .combine_chunks().sort_by(
                    [(k, "ascending") for k in _CDX_SORT_KEY])
            tmp = f"{dest}.tmp{os.getpid()}"
            import pyarrow.parquet as pq

            pq.write_table(tbl, tmp)
            os.replace(tmp, dest)  # atomic publish; idempotent
            outs.append({"shard": dest, "rows": tbl.num_rows})
        return pa.table({
            "shard": pa.array([o["shard"] for o in outs], pa.string()),
            "rows": pa.array([o["rows"] for o in outs], pa.int64())})

    rd.from_items(items).map_batches(
        index_group, batch_size=1,
        batch_format="pyarrow").materialize()
    return sorted(os.path.join(shard_dir, f)
                  for f in os.listdir(shard_dir)
                  if f.endswith(".parquet"))


def _expand_cdx_file(path: str) -> pa.Table:
    """One WARC file -> its slim CDX rows (the build_cdx expand body,
    shared)."""
    import hashlib
    import os

    with open(path, "rb") as fh:
        raw = fh.read()
    fname = os.path.basename(path)
    surts, tss, urls, offs, lens, stats, digs = [], [], [], [], [], [], []
    for off, ln, rec in cdx_records(raw):
        surts.append(surt_key(rec["url"]))
        tss.append(cdx_timestamp(rec["warc_ts"]))
        urls.append(rec["url"])
        offs.append(off)
        lens.append(ln)
        stats.append(rec["http_status"])
        digs.append(hashlib.md5(rec["html"]).hexdigest())
    n = len(surts)
    return pa.table({
        "surt": pa.array(surts, pa.string()),
        "cdx_ts": pa.array(tss, pa.string()),
        "url": pa.array(urls, pa.string()),
        "file": pa.array([fname] * n, pa.string()),
        "roffset": pa.array(offs, pa.int64()),
        "rlength": pa.array(lens, pa.int64()),
        "http_status": pa.array(stats, pa.int64()),
        "digest": pa.array(digs, pa.string()),
    })


def merge_cdx_shards(shard_dir: str, num_parts: int | None = None):
    """Stage two: a bounded-memory k-way merge of the sorted runs,
    WITHOUT a global re-sort exchange. The driver reads only a slim
    sample of each run's surt column (64 keys/run — the planning
    metadata, like CC's cluster.idx), picks range boundaries, and
    each merge task reads JUST its key range from every overlapping
    run (parquet row-group pruning via a surt filter) and merges the
    pre-sorted slices (stable sort over concatenated runs — timsort
    exploits the existing runs; memory is bounded by the range, not
    the corpus). Emitting ranges in boundary order makes the block
    sequence globally sorted, byte-identical to the single-sort twin
    (gated in test_warc_cdx.py)."""
    import pyarrow.dataset as pads
    import pyarrow.parquet as pq
    import ray.data as rd

    from .relational import _default_parts

    shards = sorted(
        str(p) for p in __import__("pathlib").Path(shard_dir)
        .glob("*.parquet"))
    if not shards:
        raise FileNotFoundError(f"no CDX shards under {shard_dir}")
    num_parts = num_parts or _default_parts()

    # planning metadata: ~64 sampled surt keys per run (bounded by
    # |shards| x 64 — the two-level-index read, not a data scan)
    samples = []
    for s in shards:
        col = pq.read_table(s, columns=["surt"]).column("surt")
        n = len(col)
        if n:
            idx = np.unique(np.linspace(0, n - 1, 64).astype(np.int64))
            samples.append(col.take(pa.array(idx, pa.int64())))
    allk = pa.concat_arrays([c.combine_chunks() for c in samples]) \
        if samples else pa.array([], pa.string())
    keys = np.sort(np.asarray(allk.to_pylist(), dtype=object))
    bounds = [keys[int(i * len(keys) / num_parts)]
              for i in range(1, num_parts)] if len(keys) else []
    # dedupe equal boundaries (skewed key space)
    uniq_bounds = []
    for b in bounds:
        if not uniq_bounds or b != uniq_bounds[-1]:
            uniq_bounds.append(b)
    los = [None] + uniq_bounds
    his = uniq_bounds + [None]
    items = [{"rid": i, "lo": lo, "hi": hi}
             for i, (lo, hi) in enumerate(zip(los, his))]

    def merge_range(t: pa.Table) -> pa.Table:
        out = []
        for lo, hi in zip(t.column("lo").to_pylist(),
                          t.column("hi").to_pylist()):
            expr = None
            if lo is not None:
                expr = pads.field("surt") >= lo
            if hi is not None:
                e2 = pads.field("surt") < hi
                expr = e2 if expr is None else expr & e2
            parts = []
            for s in shards:
                tbl = (pq.read_table(s) if expr is None else
                       pads.dataset(s).to_table(filter=expr))
                if tbl.num_rows:
                    parts.append(tbl)
            if not parts:
                continue
            merged = pa.concat_tables(parts).combine_chunks().sort_by(
                [(k, "ascending") for k in _CDX_SORT_KEY])
            out.append(merged)
        if not out:
            sch = pq.read_schema(shards[0])
            return sch.empty_table()
        return pa.concat_tables(out)

    # one row per range, one task per row, ranges in key order ->
    # output blocks are globally sorted PROVIDED block order is
    # preserved: the streaming executor reorders completed blocks by
    # default, so pin preserve_order into THIS dataset's captured
    # context (each Dataset snapshots DataContext at creation; the
    # global flag is restored immediately — no session-wide effect)
    ctx = rd.DataContext.get_current()
    prev = ctx.execution_options.preserve_order
    ctx.execution_options.preserve_order = True
    try:
        out = rd.from_items(items).repartition(len(items)) \
            .map_batches(merge_range, batch_size=1,
                         batch_format="pyarrow")
    finally:
        ctx.execution_options.preserve_order = prev
    return out


def warc_cdx_sharded(sf_dir: str):
    """The warc_cdx twin through the 100 TB path: sorted per-group
    runs spilled to parquet + the range-partitioned k-way merge.
    Output rows are identical to warc_cdx's (equivalence gated)."""
    out_dir = synth_warc_dir(
        sf_dir,
        f"/tmp/webxtract_warc_plain_{sf_dir.replace('/', '_')}",
        gzip_members=False)
    shard_dir = f"/tmp/webxtract_cdx_shards_{sf_dir.replace('/', '_')}"
    write_cdx_shards(out_dir, shard_dir)
    return merge_cdx_shards(shard_dir)


# --- HTTP header semantics ----------------------------------------------------
# The crawl-processing fields every fetch pipeline derives from the
# response header block: status, media type + declared charset
# (Content-Type), the header-level robots gate (X-Robots-Tag:
# noindex — the ONLY noindex channel for non-HTML payloads), and
# Last-Modified as epoch seconds (freshness / recrawl scheduling).
# Parsing rules, oracle-pinned:
#   * field names case-insensitive; the FIRST occurrence of a field
#     wins, repeats are ignored (leftmost regex match)
#   * content_type = the media type before ';', trimmed, lowercased;
#     charset = the charset parameter ON THAT SAME first
#     Content-Type line, optional quotes, lowercased
#   * noindex = any X-Robots-Tag value containing the token
#     'noindex' (word-bounded, case-insensitive)
#   * last_modified_ts = IMF-fixdate parsed to epoch seconds; absent
#     or unparseable -> NULL (data, not an error)
# Header bytes decode latin-1 (1:1 byte->char; HTTP field content is
# octets, and latin-1 never raises).

_CT_LINE = r"(?im)^content-type:[ \t]*([^\r\n]+)"
_CT_TYPE = r"^([^;]+)"
_CT_CHARSET = r'(?i);\s*charset\s*=\s*"?([A-Za-z0-9_.:-]+)'
_NOINDEX = r"(?im)^x-robots-tag:[^\r\n]*\bnoindex\b"
_LASTMOD = r"(?im)^last-modified:[ \t]*([^\r\n]+)"
_STATUS = r"^HTTP/\d\.\d[ \t]+(\d{3})"
_IMF_FIXDATE = "%a, %d %b %Y %H:%M:%S GMT"


def http_header_fields(ds, col: str = "http_headers"):
    """Append (status, content_type, charset, noindex,
    last_modified_ts) parsed from the raw header block. Fully
    vectorized: five RE2 passes + one strptime per batch (polars);
    zero exchanges."""

    def batch_fn(t: pa.Table) -> pa.Table:
        import polars as pl

        vals = [(v.decode("latin-1") if isinstance(v, bytes)
                 else (v or "")) for v in t.column(col).to_pylist()]
        df = pl.DataFrame({"h": vals})
        h = pl.col("h")
        df = df.with_columns([
            h.str.extract(_STATUS, 1).cast(pl.Int64).fill_null(0)
             .alias("status"),
            h.str.extract(_CT_LINE, 1).alias("_ct"),
            h.str.contains(_NOINDEX).alias("noindex"),
            h.str.extract(_LASTMOD, 1)
             .str.strptime(pl.Datetime, _IMF_FIXDATE, strict=False)
             .dt.epoch("s").alias("last_modified_ts"),
        ]).with_columns([
            pl.col("_ct").str.extract(_CT_TYPE, 1)
              .str.strip_chars().str.to_lowercase()
              .alias("content_type"),
            pl.col("_ct").str.extract(_CT_CHARSET, 1)
              .str.to_lowercase().alias("charset"),
        ])
        out = df.select(["status", "content_type", "charset",
                         "noindex", "last_modified_ts"]).to_arrow()
        res = t
        for name in out.column_names:
            res = res.append_column(
                name, out.column(name).cast(
                    pa.int64() if name in ("status",
                                           "last_modified_ts")
                    else (pa.bool_() if name == "noindex"
                          else pa.string())))
        return res

    return ds.map_batches(batch_fn, batch_format="pyarrow",
                          zero_copy_batch=True)


def synth_http_warc_dir(sf_dir: str, out_dir: str,
                        files: int = 8) -> str:
    """WARC fixture with VARIED closed-form HTTP header blocks: five
    status classes, four Content-Type classes (mixed-case key and
    value, no-space + quoted charset, charset-free PDF, and a
    repeated-header first-wins probe), X-Robots-Tag probes (NOINDEX
    uppercase on doc_id%3==0, a non-matching 'all' on other
    doc_id%7==0 rows), Last-Modified on even ids with the weekday
    written by the real strftime, and one malformed junk line every
    parser must ignore."""
    import datetime
    import os

    import pyarrow.parquet as pq

    os.makedirs(out_dir, exist_ok=True)
    expect = [os.path.join(out_dir, f"crawl-{i:05d}.warc")
              for i in range(files)]
    if all(os.path.exists(p) for p in expect):
        return out_dir
    t = pq.read_table(f"{sf_dir}/documents.parquet",
                      columns=["doc_id"])
    statuses = [200, 301, 404, 200, 503]
    buckets: list[list] = [[] for _ in range(files)]
    for i in t.column("doc_id").to_pylist():
        lines = [f"HTTP/1.1 {statuses[i % 5]} X"]
        c = i % 4
        if c == 0:
            lines.append("Content-Type: text/html; charset=UTF-8")
        elif c == 1:
            lines.append('content-type: Text/HTML;charset="ISO-8859-1"')
        elif c == 2:
            lines.append("Content-Type: application/pdf")
        else:
            lines.append("Content-Type: text/plain")
            lines.append("Content-Type: text/html; charset=utf-8")
        if i % 3 == 0:
            lines.append("X-ROBOTS-TAG: noarchive, NOINDEX")
        elif i % 7 == 0:
            lines.append("X-Robots-Tag: all")
        if i % 2 == 0:
            dt = datetime.datetime(
                2024, 1, 1 + i % 28, i % 24, (i * 7) % 60, 0,
                tzinfo=datetime.timezone.utc)
            lines.append("Last-Modified: "
                         + dt.strftime(_IMF_FIXDATE))
        lines.append("X-Junk;; malformed line")
        block = "\r\n".join(lines).encode()
        url = f"https://site{i % 50}.example/p/{i}"
        ts = f"2024-01-{1 + i % 28:02d}T00:00:00Z"
        # meta-robots probe for the indexability composite: the BODY
        # channel of noindex, independent of the header channel
        meta = ('<meta name="robots" content="NOINDEX, nofollow">'
                if i % 6 == 1 else "")
        html = (f"<html><head>{meta}</head>"
                f"<body>h{i}</body></html>").encode()
        buckets[i % files].append((url, ts, html, block))
    for fi, recs in enumerate(buckets):
        raw = build_warc(recs)
        with open(expect[fi] + ".tmp", "wb") as f:
            f.write(raw)
        os.replace(expect[fi] + ".tmp", expect[fi])
    return out_dir


def warc_http_fields(sf_dir: str):
    """ORACLED query surface: header semantics over the varied-header
    WARC fixture, through the REAL framing parser
    (keep_http_headers=True) and the vectorized field extractor. The
    DuckDB twin REBUILDS each record's header block string from
    doc_id and RE-RUNS the same regexes (first-wins leftmost match,
    same-line charset, word-bounded noindex) + strptime/epoch."""
    out_dir = synth_http_warc_dir(
        sf_dir,
        f"/tmp/webxtract_httpwarc_v2_{sf_dir.replace('/', '_')}")
    ds = read_warc(out_dir, keep_http_headers=True)

    def project(t: pa.Table) -> pa.Table:
        return t.select(["url", "status", "content_type", "charset",
                         "noindex", "last_modified_ts"])

    return http_header_fields(ds).map_batches(
        project, batch_format="pyarrow",
        zero_copy_batch=True).sort("url")


def pages_indexability(sf_dir: str):
    """ORACLED composite: the indexability decision search engines
    apply as a UNION of channels — a page enters the index only when
    status == 200 AND content_type == 'text/html' AND neither the
    HEADER channel (X-Robots-Tag: noindex — the only channel for
    non-HTML payloads) nor the BODY channel (<meta name=robots>
    noindex token) objects. Composes read_warc(keep_http_headers) ->
    http_header_fields (vectorized regexes) -> the REAL DOM meta walk
    per page; zero exchanges — every gate is map-side. The DuckDB
    twin rebuilds the header blocks and RE-RUNS the header regexes
    (shared CTE with warc_http_fields) and takes the meta channel
    from the fixture's closed form."""
    from .web import extract_page_meta
    from ..htmldom import decode_bytes, parse_html

    out_dir = synth_http_warc_dir(
        sf_dir,
        f"/tmp/webxtract_httpwarc_v2_{sf_dir.replace('/', '_')}")
    ds = http_header_fields(read_warc(out_dir,
                                      keep_http_headers=True))

    def decide(t: pa.Table) -> pa.Table:
        metas = []
        for raw in t.column("html").to_pylist():
            text = raw if isinstance(raw, str) else decode_bytes(raw)
            metas.append(bool(extract_page_meta(
                parse_html(text or ""))["noindex"]))
        import pyarrow.compute as pc

        meta_arr = pa.array(metas, pa.bool_())
        ok = pc.and_(pc.and_(
            pc.equal(t.column("status"), pa.scalar(200, pa.int64())),
            pc.equal(t.column("content_type"),
                     pa.scalar("text/html"))),
            pc.and_(pc.invert(t.column("noindex").combine_chunks()),
                    pc.invert(meta_arr)))
        return pa.table({
            "url": t.column("url"),
            "status": t.column("status"),
            "content_type": t.column("content_type"),
            "hdr_noindex": t.column("noindex"),
            "meta_noindex": meta_arr,
            "indexable": ok})

    return ds.map_batches(decide, batch_format="pyarrow",
                          zero_copy_batch=True).sort("url")


# --- charset-aware payload decode ---------------------------------------------
# The decode step between fetch and extraction: the header's declared
# charset picks the codec (whitelist — web corpora are overwhelmingly
# utf-8 + latin-1/cp1252; everything else falls back), a STRICT
# decode proves the declaration, and failures degrade to utf-8 with
# U+FFFD replacement AS DATA (status column), never task errors.
# Pinned rules:
#   * codec = alias-mapped declared charset (utf-8/utf8,
#     iso-8859-1/latin-1/latin1, windows-1252/cp1252); unknown or
#     missing -> utf-8
#   * strict decode success -> status 'ok'; failure -> re-decode
#     utf-8 errors='replace', status 'replaced'

_CHARSET_ALIASES = {
    "utf-8": "utf-8", "utf8": "utf-8",
    "iso-8859-1": "latin-1", "latin-1": "latin-1",
    "latin1": "latin-1",
    "windows-1252": "cp1252", "cp1252": "cp1252",
}


def decode_by_charset(ds, html_col: str = "html",
                      charset_col: str = "charset"):
    """Append (text, charset_used, decode_status). Per-row decode is
    C-level bytes.decode; everything else is batch columns. Zero
    exchanges."""

    def batch_fn(t: pa.Table) -> pa.Table:
        texts, used, status = [], [], []
        for raw, cs in zip(t.column(html_col).to_pylist(),
                           t.column(charset_col).to_pylist()):
            codec = _CHARSET_ALIASES.get((cs or "").lower(), "utf-8")
            raw = raw or b""
            try:
                texts.append(raw.decode(codec))
                status.append("ok")
            except UnicodeDecodeError:
                texts.append(raw.decode("utf-8", "replace"))
                status.append("replaced")
            used.append(codec)
        return t.append_column(
            "text", pa.array(texts, pa.string())).append_column(
            "charset_used", pa.array(used, pa.string())).append_column(
            "decode_status", pa.array(status, pa.string()))

    return ds.map_batches(batch_fn, batch_format="pyarrow",
                          zero_copy_batch=True)


def synth_charset_warc_dir(sf_dir: str, out_dir: str,
                           files: int = 8) -> str:
    """WARC fixture with per-record charsets: utf-8 multibyte,
    genuine iso-8859-1 bytes (0xE9), and a LYING utf-8 declaration
    over an invalid byte (0xFF) that must surface as U+FFFD
    replacement data."""
    import os

    import pyarrow.parquet as pq

    os.makedirs(out_dir, exist_ok=True)
    expect = [os.path.join(out_dir, f"crawl-{i:05d}.warc")
              for i in range(files)]
    if all(os.path.exists(p) for p in expect):
        return out_dir
    t = pq.read_table(f"{sf_dir}/documents.parquet",
                      columns=["doc_id"])
    buckets: list[list] = [[] for _ in range(files)]
    for i in t.column("doc_id").to_pylist():
        c = i % 3
        if c == 0:
            body = f"<html>café λ {i}</html>".encode("utf-8")
            decl = "UTF-8"
        elif c == 1:
            body = f"<html>café {i}</html>".encode("latin-1")
            decl = "ISO-8859-1"
        else:
            body = b"<html>caf\xff " + str(i).encode() + b"</html>"
            decl = "utf-8"
        block = ("HTTP/1.1 200 OK\r\n"
                 f"Content-Type: text/html; charset={decl}").encode()
        url = f"https://site{i % 50}.example/p/{i}"
        ts = f"2024-01-{1 + i % 28:02d}T00:00:00Z"
        buckets[i % files].append((url, ts, body, block))
    for fi, recs in enumerate(buckets):
        raw = build_warc(recs)
        with open(expect[fi] + ".tmp", "wb") as f:
            f.write(raw)
        os.replace(expect[fi] + ".tmp", expect[fi])
    return out_dir


def pages_decode_text(sf_dir: str):
    """ORACLED composite: header charset extraction (shared regex
    path) -> codec whitelist -> strict decode with pinned fallback,
    over the charset WARC fixture. The DuckDB twin emits the
    closed-form expected strings — including the U+FFFD replacement
    for the lying-utf-8 class — and the codec/status columns."""
    out_dir = synth_charset_warc_dir(
        sf_dir,
        f"/tmp/webxtract_charsetwarc_{sf_dir.replace('/', '_')}")
    ds = http_header_fields(read_warc(out_dir,
                                      keep_http_headers=True))
    ds = decode_by_charset(ds)

    def project(t: pa.Table) -> pa.Table:
        return t.select(["url", "text", "charset_used",
                         "decode_status"])

    return ds.map_batches(project, batch_format="pyarrow",
                          zero_copy_batch=True).sort("url")


# --- CDX ranged fetch (random access) ------------------------------------------
# The read path the CDX index exists for: fetching k pages from a
# 100 TB crawl costs k ranged reads (+ k member gunzips on .warc.gz),
# not a scan. cdx_fetch takes ALREADY-FILTERED index rows, groups
# them per file with ONE bounded exchange, and each file task
# seeks/reads ONLY the recorded extents — proven by the test that
# corrupts every byte outside the extents and still round-trips.


def cdx_fetch(index, warc_dir: str):
    """CDX rows (url, file, roffset, rlength) -> (url, html) via
    ranged reads. Extents parse standalone by construction (plain
    extents are whole records incl. trailing CRLFCRLF; gz extents are
    whole gzip members), so parse_warc handles both layouts."""
    import os

    from .relational import partitioned_map_groups

    def slim(t: pa.Table) -> pa.Table:
        return t.select(["url", "file", "roffset", "rlength"])

    slimmed = index.map_batches(slim, batch_format="pyarrow",
                                zero_copy_batch=True)

    def fetch(p: pa.Table) -> pa.Table:
        urls_out, htmls = [], []
        rows = sorted(zip(p.column("file").to_pylist(),
                          p.column("roffset").to_pylist(),
                          p.column("rlength").to_pylist(),
                          p.column("url").to_pylist()))
        fh, fname = None, None
        try:
            for f, off, ln, url in rows:
                if f != fname:
                    if fh:
                        fh.close()
                    fh = open(os.path.join(warc_dir, f), "rb")
                    fname = f
                fh.seek(off)
                blob = fh.read(ln)
                for rec in parse_warc(blob):
                    if rec["url"] == url:
                        urls_out.append(url)
                        htmls.append(rec["html"])
        finally:
            if fh:
                fh.close()
        return pa.table({"url": pa.array(urls_out, pa.string()),
                         "html": pa.array(htmls, pa.binary())})

    return partitioned_map_groups(slimmed, "file", fetch)


def warc_random_access(sf_dir: str):
    """ORACLED query surface: ranged fetch of every 37th document's
    page from the GZ-member fixture (the compressed layout — the
    plain layout's extents are already SQL-oracled in warc_cdx),
    reduced to (url, n_bytes, md5). The DuckDB twin rebuilds the html
    string from the documents text closed-form and recomputes both."""
    import hashlib

    import pyarrow.compute as pc

    out_dir = synth_warc_dir(
        sf_dir, f"/tmp/webxtract_warc_gz_{sf_dir.replace('/', '_')}",
        gzip_members=True)
    idx = build_cdx(out_dir)

    def want(t: pa.Table) -> pa.Table:
        ids = pc.cast(pc.struct_field(pc.extract_regex(
            t.column("url"), r"/p/(?P<id>\d+)$"), "id"),
            pa.int64()).combine_chunks().to_numpy(
            zero_copy_only=False)
        return t.filter(pa.array(ids % 37 == 0))

    wanted = idx.map_batches(want, batch_format="pyarrow",
                             zero_copy_batch=True)

    def project(t: pa.Table) -> pa.Table:
        htmls = t.column("html").to_pylist()
        return pa.table({
            "url": t.column("url"),
            "n_bytes": pa.array([len(h) for h in htmls], pa.int64()),
            "md5": pa.array([hashlib.md5(h).hexdigest()
                             for h in htmls], pa.string())})

    return cdx_fetch(wanted, out_dir).map_batches(
        project, batch_format="pyarrow",
        zero_copy_batch=True).sort("url")


# --- WARC revisit records (incremental snapshot dedup) -------------------------
# The spec's storage-dedup mechanism (WARC/1.1 §6.7.2 'revisit'):
# when a recrawled page's payload digest matches the PRIOR snapshot,
# the new snapshot stores a tiny revisit record — WARC-Payload-Digest
# + WARC-Refers-To-Target-URI, EMPTY payload — instead of the bytes.
# Text pipelines are unaffected by construction: parse_warc selects
# records by type, so revisit rows never masquerade as pages.
# At 100 TB the prior digests come from the previous snapshot's CDX
# (url -> digest), attached by hash join or broadcast; the fixture
# computes them closed-form in the writer task.


def build_incremental_warc(records, prior_digest) -> bytes:
    """(url, ts, html) records + prior_digest(url) -> md5-hex-or-None
    -> WARC bytes where unchanged payloads serialize as revisit
    records. Deterministic like build_warc."""
    import hashlib

    out = [_warc_record("warcinfo", [
        ("WARC-Type", "warcinfo"),
        ("WARC-Record-ID", "<urn:webxtract:warcinfo>"),
        ("Content-Type", "application/warc-fields"),
    ], b"software: webxtract-synth\r\n")]
    for url, ts, html in records:
        digest = hashlib.md5(html).hexdigest()
        if prior_digest(url) == digest:
            out.append(_warc_record("revisit", [
                ("WARC-Type", "revisit"),
                ("WARC-Target-URI", url),
                ("WARC-Date", ts),
                ("WARC-Record-ID", f"<urn:webxtract:{url}:r>"),
                ("WARC-Payload-Digest", f"md5:{digest}"),
                ("WARC-Refers-To-Target-URI", url),
            ], b""))
        else:
            http = (b"HTTP/1.1 200 OK\r\n"
                    b"Content-Type: text/html; charset=utf-8\r\n"
                    + f"Content-Length: {len(html)}".encode()
                    + _CRLF2 + html)
            out.append(_warc_record("response", [
                ("WARC-Type", "response"),
                ("WARC-Target-URI", url),
                ("WARC-Date", ts),
                ("WARC-Record-ID", f"<urn:webxtract:{url}>"),
                ("Content-Type",
                 "application/http; msgtype=response"),
            ], http))
    return b"".join(out)


def warc_type_stats(paths):
    """paths -> (warc_type, n_records, payload_bytes) — the storage
    accounting that makes revisit savings visible. Same framing walk
    as the CDX (Content-Length only, complete-prefix on truncation);
    per-file partials fold through one |types|-bounded groupby."""
    import ray.data as rd

    ds = rd.from_items(_list_warc_files(paths))

    def scan(t: pa.Table) -> pa.Table:
        types, ns, bs = [], [], []
        for path in t.column("item").to_pylist():
            with open(path, "rb") as fh:
                raw = _gunzip_members(fh.read())
            counts: dict[str, list[int]] = {}
            pos, n = 0, len(raw)
            while pos < n:
                while raw.startswith(b"\r\n", pos):
                    pos += 2
                if not raw.startswith(b"WARC/", pos):
                    break
                hdr_end = raw.find(_CRLF2, pos)
                if hdr_end < 0:
                    break
                head = raw[pos:hdr_end].decode("utf-8", "replace")
                wtype, clen = "", None
                for line in head.split("\r\n")[1:]:
                    k, _, v = line.partition(":")
                    k = k.strip().lower()
                    if k == "warc-type":
                        wtype = v.strip()
                    elif k == "content-length":
                        try:
                            clen = int(v.strip())
                        except ValueError:
                            clen = None
                if clen is None or hdr_end + 4 + clen > n:
                    break
                c = counts.setdefault(wtype, [0, 0])
                c[0] += 1
                c[1] += clen
                pos = hdr_end + 4 + clen
            for wtype, (cnt, byt) in counts.items():
                types.append(wtype)
                ns.append(cnt)
                bs.append(byt)
        return pa.table({
            "warc_type": pa.array(types, pa.string()),
            "n_records": pa.array(ns, pa.int64()),
            "payload_bytes": pa.array(bs, pa.int64())})

    def fold(t: pa.Table) -> pa.Table:
        g = t.group_by("warc_type").aggregate(
            [("n_records", "sum"), ("payload_bytes", "sum")])
        return pa.table({
            "warc_type": g.column("warc_type"),
            "n_records": g.column("n_records_sum").cast(pa.int64()),
            "payload_bytes":
                g.column("payload_bytes_sum").cast(pa.int64())})

    from .relational import partitioned_map_groups

    return partitioned_map_groups(
        ds.map_batches(scan, batch_format="pyarrow"),
        "warc_type", fold)


def warc_incremental_stats(sf_dir: str):
    """ORACLED query surface: snapshot-2 storage accounting — pages
    with doc_id % 4 == 0 changed (payload re-stored as response),
    everyone else unchanged (revisit, zero payload). The DuckDB twin
    rebuilds every payload length from the serialization grammar
    (header strlens + Content-Length digit widths) and the revisit /
    warcinfo constants."""
    import os

    import pyarrow.parquet as pq

    out_dir = (f"/tmp/webxtract_warc_incr_"
               f"{sf_dir.replace('/', '_')}")
    os.makedirs(out_dir, exist_ok=True)
    files = 8
    expect = [os.path.join(out_dir, f"crawl-{i:05d}.warc")
              for i in range(files)]
    if not all(os.path.exists(p) for p in expect):
        import hashlib

        t = pq.read_table(f"{sf_dir}/documents.parquet",
                          columns=["doc_id", "text"])
        buckets: list[list] = [[] for _ in range(files)]
        prior: dict[str, str] = {}
        for i, text in zip(t.column("doc_id").to_pylist(),
                           t.column("text").to_pylist()):
            url = f"https://site{i % 50}.example/p/{i}"
            v1 = (f"<html><body><p>{text}</p></body>"
                  "</html>").encode()
            prior[url] = hashlib.md5(v1).hexdigest()
            v2 = (f"<html><body><p>{text} v2</p></body>"
                  "</html>").encode() if i % 4 == 0 else v1
            buckets[i % files].append(
                (url, f"2024-02-{1 + i % 28:02d}T00:00:00Z", v2))
        for fi, recs in enumerate(buckets):
            raw = build_incremental_warc(recs, prior.get)
            with open(expect[fi] + ".tmp", "wb") as f:
                f.write(raw)
            os.replace(expect[fi] + ".tmp", expect[fi])
    return warc_type_stats(out_dir).sort("warc_type")


# --- two-level CDX (cluster.idx) -----------------------------------------------
# Common Crawl ships a SECOND index over the first: every 3000th line
# of the sorted CDX, so a lookup binary-searches the ~300 MB
# cluster.idx in memory to find the one CDX block to range-read —
# two bounded reads to locate any page in a 100 TB crawl. Block
# leaders are exact rank arithmetic over the total order, so the
# op reuses global_row_number (blocks never leave the object store).


def build_cluster_idx(cdx, every: int = 3000):
    """Sorted-CDX rows -> every Nth row as (surt, cdx_ts, file,
    roffset, rlength, rn) block leaders; rn is the 1-based rank in
    (surt, cdx_ts, file, roffset) total order. A leader covers ranks
    [rn, rn + every)."""
    from .relational import global_row_number

    ranked = global_row_number(
        cdx, ["surt", "cdx_ts", "file", "roffset"],
        descending=[False, False, False, False])

    def keep(t: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        rn = t.column("rn")
        m = pc.equal(
            pc.subtract(rn, pc.multiply(
                pc.divide(pc.subtract(rn, pa.scalar(1, pa.int64())),
                          pa.scalar(every, pa.int64())),
                pa.scalar(every, pa.int64()))),
            pa.scalar(1, pa.int64()))
        return t.filter(m).select(
            ["surt", "cdx_ts", "file", "roffset", "rlength", "rn"])

    return ranked.map_batches(keep, batch_format="pyarrow",
                              zero_copy_batch=True)


def warc_cluster_idx(sf_dir: str, every: int = 25):
    """ORACLED query surface: cluster.idx over the plain-fixture CDX
    (small ``every`` so multiple leaders per file). The DuckDB twin
    composes the SAME CDX CTE as warc_cdx and ranks with ROW_NUMBER —
    the two oracles cannot drift."""
    out_dir = synth_warc_dir(
        sf_dir,
        f"/tmp/webxtract_warc_plain_{sf_dir.replace('/', '_')}",
        gzip_members=False)
    return build_cluster_idx(build_cdx(out_dir),
                             every=every).sort("surt")


# --- WET / WAT sidecar formats (the Common Crawl derivative files) --------
#
# Every CC crawl ships three containers per segment: the .warc.gz
# responses, a .warc.wet.gz of per-page EXTRACTED TEXT ("conversion"
# records, ISO 28500 §6.8), and a .warc.wat.gz of per-page METADATA
# JSON envelopes ("metadata" records). A corpus user who starts from
# WET/WAT instead of raw WARC is the single most common Common-Crawl
# consumption pattern, so the engine emits and reads both.

_WET_BLOCK_TAGS = frozenset({
    "p", "div", "h1", "h2", "h3", "h4", "h5", "h6", "li", "tr",
    "br", "ul", "ol", "table", "section", "article", "header",
    "footer", "blockquote", "pre", "body",
})


def dom_plain_text(html: bytes | str | None) -> str:
    """Full-page plain text, the WET conversion payload: ALL text
    nodes (script/style content is dropped by the parser itself), one
    line per block-level element, whitespace collapsed within a line
    — deliberately NOT the boilerplate-stripped main content (CC WET
    keeps nav/footer text too; main-content extraction is the
    pipeline's separate M5 stage). Deterministic and total: malformed
    bytes decode with U+FFFD, tag soup parses via the repairing tree
    builder."""
    from ..htmldom import decode_bytes, parse_html

    if html is None:
        return ""
    text = html if isinstance(html, str) else decode_bytes(html)
    if not text:
        return ""
    root = parse_html(text)
    lines: list[str] = []
    cur: list[str] = []

    def flush() -> None:
        line = " ".join(" ".join(cur).split())
        if line:
            lines.append(line)
        cur.clear()

    # explicit stack, post-visit flush markers for block elements
    stack: list = [root]
    while stack:
        n = stack.pop()
        if n is None:
            flush()
            continue
        if isinstance(n, str):
            cur.append(n)
            continue
        block = n.tag in _WET_BLOCK_TAGS
        if block:
            stack.append(None)
        stack.extend(reversed(n.children))
        if block:
            flush()
    flush()
    return "\n".join(lines)


def build_wet(records) -> bytes:
    """(url, ts, text) triples -> WET bytes: warcinfo first, then one
    ``conversion`` record per page (text/plain payload, WARC-Refers-To
    pointing at the response record id — the CC layout).
    Deterministic: no clocks, no uuids."""
    out = [_warc_record("warcinfo", [
        ("WARC-Type", "warcinfo"),
        ("WARC-Record-ID", "<urn:webxtract:wetinfo>"),
        ("Content-Type", "application/warc-fields"),
    ], b"software: webxtract-wet\r\n")]
    for url, ts, text in records:
        out.append(_warc_record("conversion", [
            ("WARC-Type", "conversion"),
            ("WARC-Target-URI", url),
            ("WARC-Date", ts),
            ("WARC-Record-ID", f"<urn:webxtract:wet:{url}>"),
            ("WARC-Refers-To", f"<urn:webxtract:{url}>"),
            ("Content-Type", "text/plain"),
        ], text.encode()))
    return b"".join(out)


def parse_wet(raw: bytes) -> list[dict]:
    """WET bytes -> conversion-record dicts (url, warc_ts, text).
    Same framing walk as parse_warc (length-framed, marker-immune,
    truncation-safe); non-conversion records skip by type."""
    raw = _gunzip_members(raw)
    recs = []
    pos, n = 0, len(raw)
    while pos < n:
        while raw.startswith(b"\r\n", pos):
            pos += 2
        if pos >= n or not raw.startswith(b"WARC/", pos):
            break
        hdr_end = raw.find(_CRLF2, pos)
        if hdr_end < 0:
            break
        head = raw[pos:hdr_end].decode("utf-8", "replace")
        headers = {}
        for line in head.split("\r\n")[1:]:
            k, _, v = line.partition(":")
            headers[k.strip().lower()] = v.strip()
        try:
            clen = int(headers.get("content-length", ""))
        except ValueError:
            break
        body = raw[hdr_end + 4:hdr_end + 4 + clen]
        if len(body) < clen:
            break
        pos = hdr_end + 4 + clen
        if headers.get("warc-type") == "conversion":
            recs.append({
                "url": headers.get("warc-target-uri", ""),
                "warc_ts": headers.get("warc-date", ""),
                "text": body.decode("utf-8", "replace"),
            })
    return recs


def wet_convert(warc_dir: str, wet_dir: str) -> list[str]:
    """WARC -> WET conversion, one output file per input file (the
    resumable-partitioned-output rule): each Ray task parses its
    .warc(.gz), runs dom_plain_text over every response payload, and
    writes ``<base>.wet`` atomically (tmp + rename; existing outputs
    skip — content is a pure function of the input file). Returns the
    sorted .wet paths."""
    import os

    import ray.data as rd

    os.makedirs(wet_dir, exist_ok=True)
    files = _list_warc_files(warc_dir)

    def convert(t: pa.Table) -> pa.Table:
        outs, nrecs = [], []
        for path in t.column("item").to_pylist():
            base = os.path.basename(path)
            base = base[:-len(".warc.gz")] if base.endswith(".warc.gz") \
                else base[:-len(".warc")]
            dest = os.path.join(wet_dir, base + ".wet")
            if os.path.exists(dest):
                outs.append(dest)
                nrecs.append(-1)
                continue
            with open(path, "rb") as fh:
                raw = fh.read()
            pages = parse_warc(raw)
            wet = build_wet([(p["url"], p["warc_ts"],
                              dom_plain_text(p["html"]))
                             for p in pages])
            tmp = f"{dest}.tmp{os.getpid()}"
            with open(tmp, "wb") as fh:
                fh.write(wet)
            os.replace(tmp, dest)
            outs.append(dest)
            nrecs.append(len(pages))
        return pa.table({"wet": pa.array(outs, pa.string()),
                         "n_records": pa.array(nrecs, pa.int64())})

    rd.from_items(files).map_batches(
        convert, batch_format="pyarrow", batch_size=2).materialize()
    return sorted(os.path.join(wet_dir, f) for f in os.listdir(wet_dir)
                  if f.endswith(".wet"))


def read_wet(paths):
    """.wet file(s)/dir -> Dataset of (url, warc_ts, text, n_chars).
    One read task per file; text expands in the same batch pass."""
    import os

    import ray.data as rd

    if isinstance(paths, str) and os.path.isdir(paths):
        items = sorted(os.path.join(paths, f) for f in os.listdir(paths)
                       if f.endswith(".wet"))
    else:
        items = [paths] if isinstance(paths, str) else list(paths)
    ds = rd.from_items(items)

    def expand(t: pa.Table) -> pa.Table:
        rows = []
        for path in t.column("item").to_pylist():
            with open(path, "rb") as fh:
                rows.extend(parse_wet(fh.read()))
        return pa.table({
            "url": pa.array([r["url"] for r in rows], pa.string()),
            "warc_ts": pa.array([r["warc_ts"] for r in rows],
                                pa.string()),
            "text": pa.array([r["text"] for r in rows], pa.string()),
            "n_chars": pa.array([len(r["text"]) for r in rows],
                                pa.int64())})

    return ds.map_batches(expand, batch_format="pyarrow", batch_size=2)


def warc_wet(sf_dir: str):
    """ORACLED query surface: the full WARC -> WET -> read-back chain
    over the plain synth fixture. The fixture page is
    ``<html><body><p>{text}</p></body></html>``, so the conversion
    payload is exactly the documents row's text (whitespace-collapse
    is the identity on the single-space corpus) — DuckDB recomputes
    (url, warc_ts, text, n_chars) closed-form from doc_id, and a hash
    match certifies WARC parse -> DOM walk -> WET serialization ->
    WET framing parse byte-for-byte end to end."""
    out_dir = synth_warc_dir(
        sf_dir,
        f"/tmp/webxtract_warc_plain_{sf_dir.replace('/', '_')}",
        gzip_members=False)
    wet_dir = f"/tmp/webxtract_wet_{sf_dir.replace('/', '_')}"
    wet_convert(out_dir, wet_dir)
    return read_wet(wet_dir).sort("url")


def _wat_page_html(i: int) -> bytes:
    """Closed-form rich fixture page for the WAT chain: title, meta
    description, and i%4 anchors — every field recomputable from
    doc_id alone (the oracle's contract)."""
    k = i % 4
    links = "".join(
        f'<a href="https://dst{(i * 7 + j) % 97}.example/l/{j}">'
        f'link {j}</a>' for j in range(k))
    return (f"<html><head><title>Page {i} site{i % 50}</title>"
            f'<meta name="description" content="desc {i}"></head>'
            f"<body><p>body {i}</p>{links}</body></html>").encode()


def wat_extract(html: bytes | str | None) -> dict:
    """Per-page WAT metadata via the REAL extractors: title +
    description from extract_page_meta's DOM walk, links as (href,
    anchor-text) pairs in document order. Total: malformed input
    degrades to empty fields."""
    from ..htmldom import decode_bytes, parse_html
    from .web import _node_text, extract_page_meta

    text = html if isinstance(html, str) else decode_bytes(html)
    if not text:
        return {"title": "", "description": "", "links": []}
    root = parse_html(text)
    meta = extract_page_meta(root)
    links: list[dict] = []
    stack = [root]
    order: list = []
    while stack:
        n = stack.pop()
        if isinstance(n, str):
            continue
        order.append(n)
        stack.extend(reversed(n.children))
    for n in order:
        if n.tag == "a" and "href" in n.attrs:
            links.append({"path": "A@/href", "url": n.attrs["href"],
                          "text": " ".join(_node_text(n).split())})
    return {"title": meta["title"] or "",
            "description": meta["description"] or "",
            "links": links}


def build_wat(records) -> bytes:
    """(url, ts, meta) triples -> WAT bytes: warcinfo + one
    ``metadata`` record per page whose payload is the CC-style JSON
    envelope, serialized deterministically (sorted keys, no
    whitespace)."""
    import json

    out = [_warc_record("warcinfo", [
        ("WARC-Type", "warcinfo"),
        ("WARC-Record-ID", "<urn:webxtract:watinfo>"),
        ("Content-Type", "application/warc-fields"),
    ], b"software: webxtract-wat\r\n")]
    for url, ts, meta in records:
        env = {"Envelope": {
            "WARC-Header-Metadata": {
                "WARC-Target-URI": url, "WARC-Date": ts,
                "WARC-Type": "response"},
            "Payload-Metadata": {"HTTP-Response-Metadata": {
                "HTML-Metadata": {
                    "Head": {"Title": meta["title"],
                             "Metas": [{"name": "description",
                                        "content":
                                            meta["description"]}]},
                    "Links": meta["links"]}}}}}
        payload = json.dumps(env, sort_keys=True,
                             separators=(",", ":")).encode()
        out.append(_warc_record("metadata", [
            ("WARC-Type", "metadata"),
            ("WARC-Target-URI", url),
            ("WARC-Date", ts),
            ("WARC-Record-ID", f"<urn:webxtract:wat:{url}>"),
            ("WARC-Refers-To", f"<urn:webxtract:{url}>"),
            ("Content-Type", "application/json"),
        ], payload))
    return b"".join(out)


def parse_wat(raw: bytes) -> list[dict]:
    """WAT bytes -> metadata-record dicts (url, warc_ts, envelope).
    Length-framed walk; a payload that fails JSON decode degrades to
    an empty envelope (data, not an error)."""
    import json

    raw = _gunzip_members(raw)
    recs = []
    pos, n = 0, len(raw)
    while pos < n:
        while raw.startswith(b"\r\n", pos):
            pos += 2
        if pos >= n or not raw.startswith(b"WARC/", pos):
            break
        hdr_end = raw.find(_CRLF2, pos)
        if hdr_end < 0:
            break
        head = raw[pos:hdr_end].decode("utf-8", "replace")
        headers = {}
        for line in head.split("\r\n")[1:]:
            k, _, v = line.partition(":")
            headers[k.strip().lower()] = v.strip()
        try:
            clen = int(headers.get("content-length", ""))
        except ValueError:
            break
        body = raw[hdr_end + 4:hdr_end + 4 + clen]
        if len(body) < clen:
            break
        pos = hdr_end + 4 + clen
        if headers.get("warc-type") == "metadata":
            try:
                env = json.loads(body)
            except ValueError:
                env = {}
            recs.append({
                "url": headers.get("warc-target-uri", ""),
                "warc_ts": headers.get("warc-date", ""),
                "envelope": env})
    return recs


def wat_convert(warc_dir: str, wat_dir: str) -> list[str]:
    """WARC -> WAT, one output per input file, atomic + resumable
    (the wet_convert posture)."""
    import os

    import ray.data as rd

    os.makedirs(wat_dir, exist_ok=True)
    files = _list_warc_files(warc_dir)

    def convert(t: pa.Table) -> pa.Table:
        outs = []
        for path in t.column("item").to_pylist():
            base = os.path.basename(path)
            base = base[:-len(".warc.gz")] if base.endswith(".warc.gz") \
                else base[:-len(".warc")]
            dest = os.path.join(wat_dir, base + ".wat")
            if not os.path.exists(dest):
                with open(path, "rb") as fh:
                    raw = fh.read()
                pages = parse_warc(raw)
                wat = build_wat([(p["url"], p["warc_ts"],
                                  wat_extract(p["html"]))
                                 for p in pages])
                tmp = f"{dest}.tmp{os.getpid()}"
                with open(tmp, "wb") as fh:
                    fh.write(wat)
                os.replace(tmp, dest)
            outs.append(dest)
        return pa.table({"wat": pa.array(outs, pa.string())})

    rd.from_items(files).map_batches(
        convert, batch_format="pyarrow", batch_size=2).materialize()
    return sorted(os.path.join(wat_dir, f) for f in os.listdir(wat_dir)
                  if f.endswith(".wat"))


def read_wat(paths):
    """.wat file(s)/dir -> Dataset of (url, warc_ts, title,
    description, n_links, first_link_url, first_link_text) — the flat
    projection query pipelines consume (the full envelope stays in
    the file)."""
    import os

    import ray.data as rd

    if isinstance(paths, str) and os.path.isdir(paths):
        items = sorted(os.path.join(paths, f) for f in os.listdir(paths)
                       if f.endswith(".wat"))
    else:
        items = [paths] if isinstance(paths, str) else list(paths)
    ds = rd.from_items(items)

    def expand(t: pa.Table) -> pa.Table:
        rows = []
        for path in t.column("item").to_pylist():
            with open(path, "rb") as fh:
                rows.extend(parse_wat(fh.read()))
        cols = {"url": [], "warc_ts": [], "title": [],
                "description": [], "n_links": [], "first_link_url": [],
                "first_link_text": []}
        for r in rows:
            html_md = r["envelope"].get("Envelope", {}) \
                .get("Payload-Metadata", {}) \
                .get("HTTP-Response-Metadata", {}) \
                .get("HTML-Metadata", {})
            head = html_md.get("Head", {})
            links = html_md.get("Links", [])
            cols["url"].append(r["url"])
            cols["warc_ts"].append(r["warc_ts"])
            cols["title"].append(head.get("Title", ""))
            metas = head.get("Metas", [])
            desc = next((m.get("content", "") for m in metas
                         if m.get("name") == "description"), "")
            cols["description"].append(desc)
            cols["n_links"].append(len(links))
            cols["first_link_url"].append(
                links[0]["url"] if links else "")
            cols["first_link_text"].append(
                links[0]["text"] if links else "")
        return pa.table({
            "url": pa.array(cols["url"], pa.string()),
            "warc_ts": pa.array(cols["warc_ts"], pa.string()),
            "title": pa.array(cols["title"], pa.string()),
            "description": pa.array(cols["description"], pa.string()),
            "n_links": pa.array(cols["n_links"], pa.int64()),
            "first_link_url": pa.array(cols["first_link_url"],
                                       pa.string()),
            "first_link_text": pa.array(cols["first_link_text"],
                                        pa.string())})

    return ds.map_batches(expand, batch_format="pyarrow", batch_size=2)


def _synth_wat_warc_dir(sf_dir: str, out_dir: str,
                        files: int = 8) -> str:
    """WARC fixture with the RICH closed-form pages (_wat_page_html)
    — title/description/links all recomputable from doc_id."""
    import os

    import pyarrow.parquet as pq

    os.makedirs(out_dir, exist_ok=True)
    expect = [os.path.join(out_dir, f"crawl-{i:05d}.warc")
              for i in range(files)]
    if all(os.path.exists(p) for p in expect):
        return out_dir
    t = pq.read_table(f"{sf_dir}/documents.parquet",
                      columns=["doc_id"])
    buckets: list[list] = [[] for _ in range(files)]
    for i in t.column("doc_id").to_pylist():
        buckets[i % files].append((
            f"https://site{i % 50}.example/p/{i}",
            f"2024-01-{1 + i % 28:02d}T00:00:00Z",
            _wat_page_html(i)))
    for fi, recs in enumerate(buckets):
        raw = build_warc(recs, gzip_members=False)
        with open(expect[fi] + ".tmp", "wb") as f:
            f.write(raw)
        os.replace(expect[fi] + ".tmp", expect[fi])
    return out_dir


def warc_wat(sf_dir: str):
    """ORACLED query surface: the full WARC -> WAT -> read-back chain
    over the rich closed-form fixture. DuckDB recomputes every
    projected field (title, description, link count, first link) from
    doc_id, so a hash match certifies WARC parse -> DOM metadata walk
    -> JSON envelope serialization -> WAT framing + JSON parse end to
    end."""
    warc_dir = _synth_wat_warc_dir(
        sf_dir, f"/tmp/webxtract_warc_wat_{sf_dir.replace('/', '_')}")
    wat_dir = f"/tmp/webxtract_wat_{sf_dir.replace('/', '_')}"
    wat_convert(warc_dir, wat_dir)
    return read_wat(wat_dir).sort("url")
