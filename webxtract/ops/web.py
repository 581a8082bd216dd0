"""Web-curation operators over the pages corpus: domain parsing,
per-domain crawl stats, and domain blocklist filtering — the
corpus-curation controls every web-scale ingest runs ahead of
extraction (cf. the reference's per-source S3 prefix routing,
source/ocr/README.md — here a data-parallel column operation instead
of bucket layout).

All vectorized: domain extraction is one Arrow C++ regex pass;
blocklist filtering broadcasts the (small) blocklist once and probes
per batch with ``pc.is_in`` on the extracted registrable suffix.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

# scheme://host[:port]/...  ->  host (lowercased); RE2 on both sides of
# any oracle comparison
_DOMAIN_RE = r"^[A-Za-z][A-Za-z0-9+.-]*://(?P<domain>[^/:?#]+)"



def _fixture_pages(name: str, sf_dir: str, ids, render,
                   batch_size: int = 512, n=None):
    """Materialize-once fixture synthesis (round-3 verdict item 7):
    the closed-form per-row render runs ONE time per (surface, sf_dir,
    render-code fingerprint) via fixturecache.cached_ds; later calls —
    notably the timed bench — read the spilled parquet instead of
    re-running the Python render, so BENCH times the operator."""
    from ..fixturecache import cached_ds

    key = name if n is None else f"{name}_n{n}"
    return cached_ds(key, sf_dir,
                     lambda: ids.map_batches(render,
                                             batch_format="pyarrow",
                                             batch_size=batch_size),
                     render)


def extract_domain(batch: pa.Table, url_col: str = "url",
                   out_col: str = "domain") -> pa.Table:
    """Append the lowercased host part of ``url_col``; rows with no
    parseable scheme://host prefix get null (data, not an error)."""
    m = pc.extract_regex(batch.column(url_col), _DOMAIN_RE)
    dom = pc.utf8_lower(pc.struct_field(m, "domain"))
    return batch.append_column(out_col, dom)


def domain_stats(ds, url_col: str = "url", size_col: str | None = "html",
                 k: int = 50):
    """pages Dataset -> per-domain crawl stats: page count, distinct
    urls, total payload bytes; top-k domains by page count.

    Single-pass scale shape: payload bytes are measured in-batch and the
    blob column dropped immediately (html bytes never shuffle); each
    batch pre-reduces to one (domain, url) row carrying (page-count,
    payload) partial sums; ONE bounded hash-partition exchange on url
    co-locates every occurrence of a url, so the per-partition distinct
    is globally exact and n_pages / payload / n_urls all roll up per
    domain in that same partition pass; the per-domain partials (at
    most num_parts rows per domain, 4 slim columns) are folded with one
    Arrow group_by on the driver when small (the k-means-partials
    pattern — saves a grouped-Sum + Sort all-to-all pair), falling back
    to the grouped-Sum exchange when the domain count is web-scale.
    (Replaces the original two-branch plan — double read of the corpus
    + two string-key groupby exchanges — measured 30.7s -> see bench at
    600k pages.)"""
    from ray.data.aggregate import Sum

    from .relational import partitioned_map_groups

    def slim_partial(t: pa.Table) -> pa.Table:
        t = extract_domain(t, url_col)
        cols = {"domain": t.column("domain"),
                "url": t.column(url_col),
                "n": pa.array(np.ones(t.num_rows, np.int64))}
        cols["payload"] = (
            pc.binary_length(t.column(size_col)).cast(pa.int64())
            if size_col is not None
            else pa.nulls(t.num_rows, pa.int64()))
        g = pa.table(cols).group_by(["domain", "url"]).aggregate(
            [("n", "sum"), ("payload", "sum")])
        return pa.table({"domain": g.column("domain"),
                         "url": g.column("url"),
                         "n": g.column("n_sum"),
                         "payload": g.column("payload_sum")})

    def part_rollup(part: pa.Table) -> pa.Table:
        # every occurrence of a url hashes to this partition, so the
        # within-partition distinct IS the global distinct for these urls
        d = part.group_by(["domain", "url"]).aggregate(
            [("n", "sum"), ("payload", "sum")])
        g = pa.table({"domain": d.column("domain"),
                      "n": d.column("n_sum"),
                      "payload": d.column("payload_sum"),
                      "u": pa.array(np.ones(d.num_rows, np.int64))}) \
            .group_by("domain").aggregate(
                [("n", "sum"), ("payload", "sum"), ("u", "sum")])
        return pa.table({"domain": g.column("domain"),
                         "n_pages": g.column("n_sum").cast(pa.int64()),
                         "payload_bytes": g.column("payload_sum"),
                         "n_urls": g.column("u_sum").cast(pa.int64())})

    parts = partitioned_map_groups(
        ds.map_batches(slim_partial, batch_format="pyarrow",
                       zero_copy_batch=True),
        "url", part_rollup).materialize()  # bounded: num_parts x |domains|

    if parts.count() <= 2_000_000:
        tbls = list(parts.iter_batches(batch_format="pyarrow")) or [
            pa.table({"domain": pa.array([], pa.string()),
                      "n_pages": pa.array([], pa.int64()),
                      "payload_bytes": pa.array([], pa.int64()),
                      "n_urls": pa.array([], pa.int64())})]
        g = pa.concat_tables(tbls).group_by("domain").aggregate(
            [("n_pages", "sum"), ("payload_bytes", "sum"),
             ("n_urls", "sum")])
        g = pa.table({"domain": g.column("domain"),
                      "n_pages": g.column("n_pages_sum").cast(pa.int64()),
                      "payload_bytes": g.column("payload_bytes_sum"),
                      "n_urls": g.column("n_urls_sum").cast(pa.int64())})
        idx = pc.sort_indices(g, sort_keys=[("n_pages", "descending"),
                                            ("domain", "ascending")])
        import ray.data as rd

        out = rd.from_arrow(g.take(idx[:k]))
    else:
        out = parts.groupby("domain") \
            .aggregate(Sum("n_pages", alias_name="n_pages"),
                       Sum("payload_bytes", alias_name="payload_bytes"),
                       Sum("n_urls", alias_name="n_urls")) \
            .sort(["n_pages", "domain"], descending=[True, False]).limit(k)
    if size_col is None:
        out = out.drop_columns(["payload_bytes"])
    return out


class DomainBlocklist:
    """Filter stage: drop rows whose url's domain (or any parent-domain
    suffix) is blocklisted. The blocklist is broadcast once (ray.put)
    and probed vectorized: for suffix matching the domain is reduced to
    its candidate suffixes one label strip per round (bounded by the
    batch's max label depth), each probed with ``pc.is_in``."""

    def __init__(self, blocked_ref, url_col: str = "url"):
        from ..broadcast import get_broadcast

        blocked = get_broadcast(blocked_ref)
        self.blocked = pa.array(sorted(blocked), pa.string())
        self.url_col = url_col

    def __call__(self, batch: pa.Table) -> pa.Table:
        t = extract_domain(batch, self.url_col, out_col="_dom")
        dom = t.column("_dom")
        hit = pc.is_in(dom, value_set=self.blocked)
        # parent-domain suffixes: strip one leading label per round (a
        # no-op strip means the domain is exhausted — `changed` gates
        # the probe so bare TLD fragments never falsely match)
        depth = pc.max(pc.list_value_length(
            pc.split_pattern(dom, pattern="."))).as_py() or 1
        cur = dom
        for _ in range(depth - 1):
            stripped = pc.replace_substring_regex(
                cur, r"^[^.]*\.", "", max_replacements=1)
            changed = pc.not_equal(stripped, cur)
            hit = pc.or_kleene(hit, pc.and_kleene(
                changed, pc.is_in(stripped, value_set=self.blocked)))
            cur = stripped
        keep = pc.fill_null(pc.invert(hit), True)  # unparseable: keep
        return batch.filter(keep)


def blocklist_stage(blocked: set[str] | list[str], url_col: str = "url"):
    """Task-pool closure: broadcast the blocklist once, filter batches."""
    import ray

    ref = ray.put(set(blocked))

    def fn(batch: pa.Table) -> pa.Table:
        return DomainBlocklist(ref, url_col)(batch)

    return fn


def pages_domain_stats(sf_dir: str):
    """Query surface: per-domain crawl stats over the synthesized pages
    corpus for sf_dir (rows-only: pages are not an oracle table; a
    DuckDB parity gate runs locally in tests/test_ops.py)."""
    from ..testdata import pages_dataset, rows_for_sf_dir

    ds = pages_dataset(sf_rows=rows_for_sf_dir(sf_dir),
                       columns=["url", "html"])
    return domain_stats(ds)


# --- crawl link graph ------------------------------------------------------

import re as _re

_SCHEME = _re.compile(r"^[A-Za-z][A-Za-z0-9+.\-]*:")
_HOST_END = _re.compile(r"[/?#]")


def href_host(href: str | None, base_host: str | None) -> str | None:
    """Host an anchor points at, lowercased; None for non-web schemes
    (mailto:, javascript:, ftp:, data:) and unparseable values. Relative
    references resolve to ``base_host`` (RFC 3986 §5: same authority),
    protocol-relative ``//host/...`` to their own host. Userinfo and
    port are stripped — the link GRAPH is keyed by host."""
    if not href:
        return base_host
    href = href.strip()
    if href.startswith("//"):
        rest = href[2:]
    else:
        m = _SCHEME.match(href)
        if m:
            scheme = href[:m.end() - 1].lower()
            if scheme not in ("http", "https"):
                return None
            tail = href[m.end():]
            if not tail.startswith("//"):
                return None  # opaque http:foo — no authority
            rest = tail[2:]
        else:
            return base_host  # relative path/query/fragment reference
    host = _HOST_END.split(rest, 1)[0]
    host = host.rsplit("@", 1)[-1].split(":", 1)[0].lower()
    return host or None


def _iter_hrefs(node):
    """Yield every <a href> value in the tree (iterative walk — parser
    trees are repaired, but deep tag soup must not hit the recursion
    limit)."""
    stack = [node]
    while stack:
        n = stack.pop()
        if isinstance(n, str):
            continue
        if n.tag == "a":
            h = n.attrs.get("href")
            if h is not None:
                yield h
        stack.extend(n.children)


def extract_links(ds, url_col: str = "url", html_col: str = "html"):
    """pages Dataset -> DISTINCT cross-host (src_host, dst_host) edges.

    Per batch: the REAL DOM parser (webxtract.htmldom — the extraction
    engine's own tree builder, tag-soup safe) walks each page for
    anchors; hosts resolve per ``href_host`` (relative -> own host,
    which self-loop-drops below); the batch pre-reduces to its distinct
    pairs, then ONE bounded hash exchange on the pair key makes pairs
    globally distinct — edge volume is |host pairs|, not |anchors|, and
    html bytes never shuffle. Parsing is per-row by nature (same as the
    extraction hot path); everything around it is batch-level."""
    from .relational import partitioned_map_groups

    def links_batch(t: pa.Table) -> pa.Table:
        from ..htmldom import decode_bytes, parse_html

        urls = t.column(url_col).to_pylist()
        htmls = t.column(html_col).to_pylist()
        pairs: set[tuple[str, str]] = set()
        for u, raw in zip(urls, htmls):
            src = href_host(u, None)
            if src is None:
                continue
            text = raw if isinstance(raw, str) else decode_bytes(raw)
            if not text:
                continue
            for h in _iter_hrefs(parse_html(text)):
                dst = href_host(h, src)
                if dst is not None and dst != src:
                    pairs.add((src, dst))
        srcs, dsts = (list(z) for z in zip(*sorted(pairs))) if pairs \
            else ([], [])
        return pa.table({"src_host": pa.array(srcs, pa.string()),
                         "dst_host": pa.array(dsts, pa.string())})

    tagged = ds.map_batches(links_batch, batch_format="pyarrow") \
        .map_batches(
            lambda t: t.append_column(
                "_k", pc.binary_join_element_wise(
                    t.column("src_host"), t.column("dst_host"), "\x1f")),
            batch_format="pyarrow", zero_copy_batch=True)

    def distinct_part(part: pa.Table) -> pa.Table:
        g = part.group_by(["src_host", "dst_host"]).aggregate([])
        return g.select(["src_host", "dst_host"])

    return partitioned_map_groups(tagged, "_k", distinct_part)


def synth_link_corpus(sf_dir: str, n: int | None = None):
    """Deterministic crawl fixture from the documents table ids: page
    doc_id lives on host site{doc_id % 50}.example and links out to
    1 + doc_id % 3 hosts (doc_id*7 + 13j + 1) % 50 — the j = 0 anchor
    written with UPPERCASE scheme+host to exercise lowercasing — plus,
    on every 5th doc, a protocol-relative link to (doc_id*3 + 2) % 50.
    Noise that must NOT produce edges: relative nav links (same-host
    self-loops), mailto:, javascript:, ftp:, and a bare fragment. The
    planted edge set is closed-form in doc_id, so the DuckDB twin
    recomputes it exactly. Pure plumbing fixture — real corpora read
    (url, html) from parquet."""
    import ray.data as rd

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

    def render(batch: pa.Table) -> pa.Table:
        out_u, out_h = [], []
        for i in batch.column("doc_id").to_pylist():
            h = i % 50
            anchors = ['<nav><a href="/home">Home</a> '
                       '<a href="#top">Top</a></nav>']
            for j in range(1 + i % 3):
                t = (i * 7 + 13 * j + 1) % 50
                if j == 0:
                    anchors.append(
                        f'<a href="HTTPS://SITE{t}.EXAMPLE/x?utm=1">'
                        f'ref{j}</a>')
                else:
                    anchors.append(
                        f'<a href="https://site{t}.example/page/{j}">'
                        f'ref{j}</a>')
            if i % 5 == 0:
                pr = (i * 3 + 2) % 50
                anchors.append(
                    f'<a href="//site{pr}.example/pr">proto-rel</a>')
            anchors.append('<a href="mailto:a@b.example">mail</a>')
            anchors.append('<a href="javascript:void(0)">js</a>')
            anchors.append(f'<a href="ftp://site{(i + 9) % 50}.example'
                           '/f">ftp</a>')
            body = "".join(anchors)
            out_u.append(f"https://site{h}.example/p/{i}")
            out_h.append(f"<html><body><p>doc {i}</p>{body}"
                         "</body></html>".encode())
        return pa.table({"url": pa.array(out_u, pa.string()),
                         "html": pa.array(out_h, pa.binary())})

    return _fixture_pages("synth_link_corpus", sf_dir, ids, render,
                   batch_size=256, n=n)


def domain_link_edges(sf_dir: str):
    """ORACLED query surface: the distinct cross-host link graph of the
    synthetic crawl — DuckDB recomputes the planted edges in closed
    form from doc_id, so a hash match certifies DOM anchor walking,
    scheme filtering, relative/protocol-relative resolution, case
    normalization and self-loop dropping end to end."""
    return extract_links(synth_link_corpus(sf_dir)) \
        .sort(["src_host", "dst_host"])


def host_ranks(edges, iters: int = 5) -> pa.Table:
    """Full (host, rank_e12) table for a materialized (src_host,
    dst_host) edge Dataset: hosts dictionary-encode to dense int64 ids
    (the host dictionary is |domains|-bounded — always orders of
    magnitude under the page count; same bound class as the vocabulary
    broadcasts, and the fold ships one slim string column), then the
    existing integer PageRank recurrence runs its raw-task folds over
    the pinned edge blocks; ids map back to hosts at the end. Directed
    semantics: ranks are over hosts WITH outlinks, contributions into
    pure sinks drop (ops.graph.pagerank's documented convention)."""
    import ray

    from .graph import pagerank

    host_chunks = []
    for b in edges.map_batches(
            lambda t: pa.table({"h": pc.unique(pa.chunked_array(
                [t.column("src_host"), t.column("dst_host")])
                .combine_chunks())}),
            batch_format="pyarrow").iter_batches(batch_format="pyarrow"):
        host_chunks.append(b.column("h").to_numpy(zero_copy_only=False))
    hosts = np.unique(np.concatenate(host_chunks)) if host_chunks \
        else np.array([], dtype=object)
    hosts_ref = ray.put(hosts)

    def encode(t: pa.Table) -> pa.Table:
        from ..broadcast import get_broadcast

        hv = get_broadcast(hosts_ref)
        s = np.searchsorted(hv, t.column("src_host").to_numpy(
            zero_copy_only=False))
        d = np.searchsorted(hv, t.column("dst_host").to_numpy(
            zero_copy_only=False))
        return pa.table({"src": pa.array(s, pa.int64()),
                         "dst": pa.array(d, pa.int64())})

    iedges = edges.map_batches(encode, batch_format="pyarrow",
                               zero_copy_batch=True).materialize()
    t = pagerank(iedges, iters=iters)
    node = t.column("node").to_numpy()
    return pa.table({"host": pa.array(hosts[node], pa.string()),
                     "rank_e12": t.column("rank_e12")})


def domain_pagerank(sf_dir: str, iters: int = 5, k: int = 25):
    """ORACLED composite: domain-level PageRank over the crawl link
    graph — the standard crawl-prioritization signal (see host_ranks
    for the engine shape; the DuckDB twin runs the identical unrolled
    integer recurrence)."""
    out = host_ranks(
        extract_links(synth_link_corpus(sf_dir)).materialize(),
        iters=iters)
    idx = pc.sort_indices(out, sort_keys=[("rank_e12", "descending"),
                                          ("host", "ascending")])
    import ray.data as rd

    return rd.from_arrow(out.take(idx[:k]))


# --- URL canonicalization --------------------------------------------------

# tracking parameters dropped by canonicalization (the standard crawl
# dedup hygiene set); anchored key match, RE2/rust-regex compatible
_TRACKING_PARAM_RE = r"^(utm_[^=]*|gclid|fbclid)="
# plain-segment '..' resolution: only a name segment may be consumed
# (never '.' or '..' themselves) — lookahead-free so the same pattern
# runs under rust regex (polars) and RE2 (DuckDB)
_DOTDOT_RE = r"/[A-Za-z0-9_\-]+/\.\./"


def canonicalize_urls(ds, url_col: str = "url",
                      out_col: str = "canon_url"):
    """Append the canonical form of ``url_col``: lowercase scheme+host,
    fragment stripped, default ports (http:80 / https:443) removed,
    '/./' and plain-segment '/../' path segments resolved (iterated to
    a fixed point, vectorized per round), empty path -> '/', query
    params split on '&' with empties + tracking params (utm_*, gclid,
    fbclid) dropped and the rest sorted bytewise. The whole transform
    is polars expressions over the batch — no per-row Python.

    This is the normalization every crawl dedup runs before url-keyed
    exact dedup (cf. dedup_pages' url key): byte-equal canon_url ==
    same resource under the spec above."""

    def canon_batch(t: pa.Table) -> pa.Table:
        import polars as pl

        df = pl.from_arrow(t)
        u = pl.col(url_col)
        df = df.with_columns([
            u.str.extract(r"^([A-Za-z][A-Za-z0-9+.\-]*):", 1)
             .str.to_lowercase().fill_null("").alias("_scheme"),
            u.str.extract(r"^[^:]+://(?:[^/?#@]*@)?([^/:?#]*)", 1)
             .str.to_lowercase().fill_null("").alias("_host"),
            u.str.extract(r"^[^:]+://[^/?#]*:([0-9]+)", 1)
             .fill_null("").alias("_port"),
            u.str.extract(r"^[^:]+://[^/?#]*([^?#]*)", 1)
             .fill_null("").alias("_path"),
            u.str.extract(r"\?([^#]*)", 1).fill_null("").alias("_q"),
        ])
        # dot-segment resolution to fixed point: each round is one
        # vectorized replace_all; rounds are bounded by max path depth
        while True:
            nxt = (pl.col("_path")
                   .str.replace_all(r"/\./", "/", literal=False)
                   .str.replace_all(_DOTDOT_RE, "/", literal=False))
            new = df.with_columns(nxt.alias("_path2"))
            if new.select((pl.col("_path") == pl.col("_path2"))
                          .all()).item():
                df = new
                break
            df = new.drop("_path").rename({"_path2": "_path"})
        port = (
            pl.when(pl.col("_port") == "").then(pl.lit(""))
            .when((pl.col("_scheme") == "http")
                  & (pl.col("_port") == "80")).then(pl.lit(""))
            .when((pl.col("_scheme") == "https")
                  & (pl.col("_port") == "443")).then(pl.lit(""))
            .otherwise(pl.lit(":") + pl.col("_port")))
        path = (pl.when(pl.col("_path2") == "").then(pl.lit("/"))
                .otherwise(pl.col("_path2")))
        q = (pl.col("_q").str.split("&")
             .list.eval(pl.element().filter(
                 (pl.element() != "")
                 & ~pl.element().str.contains(_TRACKING_PARAM_RE)))
             .list.sort().list.join("&"))
        canon = (pl.col("_scheme") + pl.lit("://") + pl.col("_host")
                 + port + path
                 + pl.when(q == "").then(pl.lit(""))
                 .otherwise(pl.lit("?") + q))
        # unparseable rows (no scheme://host) -> null, data not error
        canon = (pl.when((pl.col("_scheme") == "")
                         | (pl.col("_host") == ""))
                 .then(None).otherwise(canon))
        out = df.with_columns(canon.alias(out_col)).drop(
            ["_scheme", "_host", "_port", "_path", "_path2", "_q"])
        return out.to_arrow()

    return ds.map_batches(canon_batch, batch_format="pyarrow",
                          zero_copy_batch=True)


def synth_messy_urls(sf_dir: str, n: int | None = None):
    """Deterministic messy-URL fixture, closed-form in doc_id (the
    DuckDB twin rebuilds the identical strings with ||): mixed-case
    scheme/host, default and non-default ports, './' + '../' path
    junk, unsorted / tracking / duplicate-key queries, fragments."""
    import ray.data as rd

    ids = rd.read_parquet(f"{sf_dir}/documents.parquet",
                          columns=["doc_id"])
    if n is not None:
        ids = ids.limit(n)

    def render(batch: pa.Table) -> pa.Table:
        urls = []
        for i in batch.column("doc_id").to_pylist():
            scheme = "HTTP" if i % 2 == 0 else "https"
            port = (":8080" if i % 7 == 0
                    else (":80" if i % 2 == 0 else ":443")
                    if i % 3 == 0 else "")
            path = (f"/A/./b{i % 5}/../c/page{i}" if i % 4 == 0
                    else f"/A/b{i % 5}/page{i}")
            query = {1: "?b=2&a=1", 2: "?utm_source=x&a=1",
                     3: "?gclid=z&utm_medium=m",
                     4: "?a=1&a=0"}.get(i % 5, "")
            frag = f"#sec{i % 3}" if i % 4 == 0 else ""
            urls.append(f"{scheme}://WWW.Site{i % 50}.Example"
                        f"{port}{path}{query}{frag}")
        return pa.table({"doc_id": batch.column("doc_id"),
                         "url": pa.array(urls, pa.string())})

    return _fixture_pages("synth_messy_urls", sf_dir, ids, render,
                   batch_size=1024, n=n)


def urls_canonicalize(sf_dir: str):
    """ORACLED query surface: canonicalize the closed-form messy-URL
    fixture; the DuckDB twin rebuilds each url from doc_id and
    canonicalizes it with the SAME spec in SQL string/list functions
    (lower / regexp_replace rounds / list_filter + list_sort), so a
    hash match certifies the full normalization pipeline."""
    return canonicalize_urls(synth_messy_urls(sf_dir)).sort("doc_id")


# --- robots.txt politeness gate --------------------------------------------


def parse_robots(text: str, agent: str = "*") -> list[tuple[bool, str]]:
    """Parse robots.txt into the rule list for ``agent`` (RFC 9309
    incl. the §2.2.3 special characters — '*' and the final-'$'
    anchor — which matching resolves via _robots_rule_matcher).
    Groups are runs of User-agent lines followed by rules;
    per RFC 9309 §2.2.1 the crawler obeys the MOST SPECIFIC matching
    group(s) only — '*' groups apply only when no group names the
    agent. Field names are case-insensitive, comments (#...) and
    blank lines ignored, CRLF tolerated. Empty Disallow means "no
    rule". Returns [(is_allow, prefix), ...]."""
    specific: list[tuple[bool, str]] = []
    wildcard: list[tuple[bool, str]] = []
    has_specific = False
    group_specific = group_wild = False
    in_agents = True
    want = agent.lower()
    for raw in text.splitlines():
        line = raw.split("#", 1)[0].strip()
        if not line:
            continue
        field, _, value = line.partition(":")
        field = field.strip().lower()
        value = value.strip()
        if field == "user-agent":
            if not in_agents:  # a new group starts
                group_specific = group_wild = False
                in_agents = True
            if value == "*":
                group_wild = True
            elif value.lower() == want:
                group_specific = has_specific = True
        elif field in ("allow", "disallow"):
            in_agents = False
            if value:
                if group_specific:
                    specific.append((field == "allow", value))
                elif group_wild:
                    wildcard.append((field == "allow", value))
    return specific if has_specific else wildcard


def _robots_rule_matcher(pattern: str):
    """RFC 9309 §2.2.3 special characters: '*' matches any character
    run and a FINAL '$' anchors at the path end ('$' anywhere else is
    a literal — the reference-parser behavior, pinned by test); a
    pattern with neither is a plain prefix. Returns ("prefix", str)
    for the vectorized fast path or ("re", anchored_regex_str)."""
    import re as _re

    anchored = pattern.endswith("$")
    body = pattern[:-1] if anchored else pattern
    if "*" not in body and not anchored:
        return ("prefix", pattern)
    rx = "^" + ".*".join(_re.escape(p) for p in body.split("*"))
    return ("re", rx + ("$" if anchored else ""))


def robots_decision(path: str, rules: list[tuple[bool, str]]) -> bool:
    """RFC 9309 precedence: the most specific match wins — most
    octets of the RULE PATTERN (the reference-parser comparison, so
    '/files/public*' beats '/*.pdf$'); on equal length Allow wins;
    no match -> allowed."""
    import re as _re

    best_len, best_allow = -1, True
    for is_allow, pattern in rules:
        kind, pat = _robots_rule_matcher(pattern)
        if kind == "prefix":
            hit = path.startswith(pat)
        else:
            hit = _re.match(pat, path) is not None
        if hit:
            L = len(pattern)
            if L > best_len or (L == best_len and is_allow):
                best_len, best_allow = L, is_allow
    return best_allow


def robots_gate_stage(robots_by_host: dict[str, str],
                      url_col: str = "url", agent: str = "*"):
    """Task-pool closure: broadcast the per-host robots.txt map once
    (|hosts|-bounded — the same bound class as the blocklist), parse
    each host's rules once per worker, and gate batches vectorized:
    hosts/paths extract in one regex pass, then one numpy startswith
    per (distinct host in batch, rule) — never per row."""
    import ray

    from ..broadcast import get_broadcast

    ref = ray.put(robots_by_host)

    def fn(batch: pa.Table) -> pa.Table:
        texts = get_broadcast(ref)
        cache = fn.__dict__.setdefault("_rules", {})
        u = batch.column(url_col)
        host = pc.utf8_lower(pc.struct_field(pc.extract_regex(
            u, r"^[^:]+://(?:[^/?#@]*@)?(?P<h>[^/:?#]*)"), "h")) \
            .to_numpy(zero_copy_only=False)
        path = pc.struct_field(pc.extract_regex(
            u, r"^[^:]+://[^/?#]*(?P<p>[^?#]*)"), "p") \
            .to_numpy(zero_copy_only=False)
        path = np.where(pd_isna(path), "", path)
        path = np.where(path == "", "/", path)
        allowed = np.ones(len(host), bool)
        for h in np.unique(host[~pd_isna(host)]):
            sel = host == h
            txt = texts.get(h)
            if txt is None:
                continue  # no robots.txt -> allowed
            if h not in cache:
                cache[h] = parse_robots(txt)
            rules = cache[h]
            if not rules:
                continue
            p = path[sel].astype(str)
            best_len = np.full(p.shape, -1, np.int64)
            best_allow = np.ones(p.shape, bool)
            for is_allow, pattern in rules:
                kind, pat = _robots_rule_matcher(pattern)
                if kind == "prefix":
                    m = np.char.startswith(p, pat)
                else:  # wildcard/anchored: one vectorized RE2 pass
                    m = pc.match_substring_regex(
                        pa.array(p, pa.string()), pat).to_numpy(
                        zero_copy_only=False)
                L = len(pattern)
                win = m & ((L > best_len)
                           | ((L == best_len) & is_allow))
                best_len[win] = L
                best_allow[win] = is_allow
            allowed[sel] = best_allow
        return batch.append_column("allowed", pa.array(allowed))

    return fn


def pd_isna(a):
    import pandas as pd

    return pd.isna(a)


def _robots_fixture_text(h: int) -> str:
    """Closed-form robots.txt per host group h % 4 — exercises comment
    lines, case-insensitive fields, CRLF, empty Disallow, non-matching
    agent groups, and Allow-overrides-Disallow longest-match."""
    g = h % 4
    # Sitemap is a GLOBAL field (outside groups, RFC 9309 §2.3) —
    # every host declares one; odd hosts declare a second with a
    # lowercase key + comment to exercise case/comment handling.
    # Appended at the end so group parsing is provably unaffected
    # (robots_gate / robots_crawl_delay parity pins that).
    sm = f"Sitemap: https://site{h}.example/sitemap.xml\n"
    if h % 2 == 1:
        sm += (f"sitemap: https://site{h}.example/sitemap-news.xml"
               "  # secondary\n")
    if g == 0:
        return ("# site policy\r\nUser-Agent: *\r\n"
                "Disallow: /private/\r\nallow: /private/ok/\r\n"
                "Crawl-delay: 1\r\n") + sm
    if g == 1:
        return "User-agent: *\nDisallow:\n" + sm  # empty = allow all
    if g == 2:
        return ("User-agent: bot\nDisallow: /\nCrawl-delay: 9\n"
                + sm)
        # ^ other agent only: its delay must NOT apply to '*'
    return ("User-agent: megacrawler\nDisallow: /x/\n\n"
            "User-agent: *\nDisallow: /p/\nDisallow: /other\n"
            "Allow: /p/ok/\nDisallow: /*.pdf$\n"
            "Allow: /files/public*\nDisallow: /files/\n"
            "Crawl-delay: 4.0\n") + sm


def robots_gate(sf_dir: str):
    """ORACLED query surface: deterministic urls (doc_id -> host
    site{id%50}.example, path case id%4) gated against the closed-form
    per-host robots fixture; DuckDB recomputes the expected decision
    table, so a hash match certifies parsing (comments, case, CRLF,
    group scoping) + longest-match precedence end to end."""
    import ray.data as rd

    ids = rd.read_parquet(f"{sf_dir}/documents.parquet",
                          columns=["doc_id"])

    def render(batch: pa.Table) -> pa.Table:
        urls = []
        for i in batch.column("doc_id").to_pylist():
            # classes 4-7 target the §2.2.3 wildcard rules of host
            # group 3: '/*.pdf$' (anchored), '/files/public*' longest-
            # match override of '/files/', and the .pdfx anchor probe
            path = {0: f"/private/x{i}", 1: f"/private/ok/x{i}",
                    2: f"/p/{i}", 3: "/other",
                    4: f"/doc{i}.pdf", 5: f"/files/public/{i}.pdf",
                    6: f"/files/secret/{i}"}.get(i % 8, f"/doc{i}.pdfx")
            urls.append(f"https://site{i % 50}.example{path}")
        return pa.table({"doc_id": batch.column("doc_id"),
                         "url": pa.array(urls, pa.string())})

    robots = {f"site{h}.example": _robots_fixture_text(h)
              for h in range(50)}
    ds = _fixture_pages("robots_gate", sf_dir, ids, render,
                   batch_size=1024)
    gate = robots_gate_stage(robots)
    return ds.map_batches(gate, batch_format="pyarrow",
                          zero_copy_batch=True).sort("doc_id")


# --- sitemap source --------------------------------------------------------


def _node_text(node) -> str:
    """Concatenated text of a DOM subtree (iterative, soup-safe)."""
    out = []
    stack = [node]
    while stack:
        n = stack.pop()
        if isinstance(n, str):
            out.append(n)
        else:
            stack.extend(reversed(n.children))
    return "".join(out)


def parse_sitemap(xml: bytes | str) -> list[dict]:
    """Parse sitemap XML (urlset or sitemapindex) into entry dicts
    (kind, loc, lastmod). The engine's tag-soup DOM parser reads the
    XML (tags case-fold; comments and namespace attrs are ignored by
    construction), so malformed feeds degrade to their parseable
    prefix instead of raising. <sitemap> entries surface with
    kind='sitemap' so a scheduler can fetch children; <url> entries
    are kind='url'. Entries without <loc> are dropped (no guessing)."""
    from ..htmldom import decode_bytes, parse_html

    text = xml if isinstance(xml, str) else (decode_bytes(xml) or "")
    root = parse_html(text)
    entries = []
    stack = [root]
    while stack:
        n = stack.pop()  # children pushed reversed: document order out
        if isinstance(n, str):
            continue
        if n.tag in ("url", "sitemap"):
            loc = lastmod = None
            for c in n.children:
                if not isinstance(c, str):
                    if c.tag == "loc":
                        loc = _node_text(c).strip()
                    elif c.tag == "lastmod":
                        lastmod = _node_text(c).strip()
            if loc:
                entries.append({
                    "kind": "url" if n.tag == "url" else "sitemap",
                    "loc": loc, "lastmod": lastmod})
        else:
            stack.extend(reversed(n.children))
    return entries


def read_sitemaps(ds, url_col: str = "sitemap_url",
                  xml_col: str = "xml"):
    """(sitemap_url, xml) Dataset -> one row per entry (sitemap_url,
    kind, loc, lastmod). Per-file expansion in-batch; nothing
    exchanges."""

    def expand(t: pa.Table) -> pa.Table:
        src, kind, loc, lm = [], [], [], []
        for u, raw in zip(t.column(url_col).to_pylist(),
                          t.column(xml_col).to_pylist()):
            for e in parse_sitemap(raw):
                src.append(u)
                kind.append(e["kind"])
                loc.append(e["loc"])
                lm.append(e["lastmod"])
        return pa.table({
            "sitemap_url": pa.array(src, pa.string()),
            "kind": pa.array(kind, pa.string()),
            "loc": pa.array(loc, pa.string()),
            "lastmod": pa.array(lm, pa.string()),
        })

    return ds.map_batches(expand, batch_format="pyarrow", batch_size=16)


def sitemap_url_inventory(sf_dir: str):
    """ORACLED sitemap source: each host's urlset XML is RENDERED
    inside one host-keyed co-location (the fixture itself exercises
    the exchange — per-host sitemaps cannot be built row-wise), then
    parsed back by the real soup parser; DuckDB recomputes every
    (sitemap_url, loc, lastmod) row closed-form from doc_id. The XML
    carries a namespace attribute and a comment to prove the parser
    ignores both."""
    import ray.data as rd

    from .relational import partitioned_map_groups

    ids = rd.read_parquet(f"{sf_dir}/documents.parquet",
                          columns=["doc_id"])

    def add_host(t: pa.Table) -> pa.Table:
        h = t.column("doc_id").to_numpy() % 50
        return t.append_column("host_id", pa.array(h, pa.int64()))

    def render_host_sitemaps(part: pa.Table) -> pa.Table:
        import numpy as np

        hid = part.column("host_id").to_numpy()
        did = part.column("doc_id").to_numpy()
        order = np.lexsort((did, hid))
        hid, did = hid[order], did[order]
        starts = np.flatnonzero(np.r_[True, hid[1:] != hid[:-1]])
        urls, xmls = [], []
        for k, st in enumerate(starts):
            en = starts[k + 1] if k + 1 < len(starts) else len(hid)
            h = int(hid[st])
            rows = "".join(
                f"<url><loc>https://site{h}.example/p/{int(i)}</loc>"
                f"<lastmod>2024-01-{1 + int(i) % 28:02d}</lastmod>"
                "</url>"
                for i in did[st:en])
            urls.append(f"https://site{h}.example/sitemap.xml")
            xmls.append(
                '<?xml version="1.0" encoding="UTF-8"?>'
                "<!-- generated -->"
                '<urlset xmlns="http://www.sitemaps.org/schemas/'
                f'sitemap/0.9">{rows}</urlset>'.encode())
        return pa.table({"sitemap_url": pa.array(urls, pa.string()),
                         "xml": pa.array(xmls, pa.binary())})

    feeds = partitioned_map_groups(
        ids.map_batches(add_host, batch_format="pyarrow",
                        zero_copy_batch=True),
        "host_id", render_host_sitemaps)
    return read_sitemaps(feeds).sort(["loc"])


# --- inbound anchor-text profiles ------------------------------------------


def anchor_text_profile(ds, url_col: str = "url",
                        html_col: str = "html"):
    """pages Dataset -> (dst_host, anchor_text, n): how often each
    anchor string points at each host — the inbound-anchor signal
    search/training corpora mine. Same DOM walk as extract_links but
    COUNTING (not distinct) and carrying the anchor's subtree text;
    self-loops and non-web schemes drop. Per batch: partial (dst,
    text, n) counts; ONE bounded grouped exchange folds them — the
    exchange carries \\|(host, text)\\| rows, never anchors."""
    from .relational import partitioned_map_groups

    def partial(t: pa.Table) -> pa.Table:
        from collections import Counter

        from ..htmldom import decode_bytes, parse_html

        counts: Counter = Counter()
        for u, raw in zip(t.column(url_col).to_pylist(),
                          t.column(html_col).to_pylist()):
            src = href_host(u, None)
            if src is None:
                continue
            text = raw if isinstance(raw, str) else decode_bytes(raw)
            if not text:
                continue
            stack = [parse_html(text)]
            while stack:
                n = stack.pop()
                if isinstance(n, str):
                    continue
                if n.tag == "a":
                    h = n.attrs.get("href")
                    if h is not None:
                        dst = href_host(h, src)
                        if dst is not None and dst != src:
                            counts[(dst, _node_text(n))] += 1
                stack.extend(n.children)
        ks = sorted(counts)
        return pa.table({
            "dst_host": pa.array([k[0] for k in ks], pa.string()),
            "anchor_text": pa.array([k[1] for k in ks], pa.string()),
            "n": pa.array([counts[k] for k in ks], pa.int64()),
        })

    tagged = ds.map_batches(partial, batch_format="pyarrow") \
        .map_batches(
            lambda t: t.append_column(
                "_k", pc.binary_join_element_wise(
                    t.column("dst_host"), t.column("anchor_text"),
                    "\x1f")),
            batch_format="pyarrow", zero_copy_batch=True)

    def fold(part: pa.Table) -> pa.Table:
        g = part.group_by(["dst_host", "anchor_text"]).aggregate(
            [("n", "sum")])
        return pa.table({"dst_host": g.column("dst_host"),
                         "anchor_text": g.column("anchor_text"),
                         "n": g.column("n_sum").cast(pa.int64())})

    return partitioned_map_groups(tagged, "_k", fold)


def domain_anchor_texts(sf_dir: str):
    """ORACLED query surface: inbound anchor-text counts over the
    synthetic crawl — DuckDB recomputes (dst_host, anchor_text, n)
    closed-form from doc_id (link j carries text 'ref{j}', the
    protocol-relative link 'proto-rel'; noise anchors vanish with
    their non-edges)."""
    return anchor_text_profile(synth_link_corpus(sf_dir)) \
        .sort(["dst_host", "anchor_text"])


# --- HTML table extraction -------------------------------------------------


def _walk_scoped(node, want: set[str], barrier: set[str]):
    """Yield descendant nodes with tag in ``want``, document order,
    WITHOUT descending through ``barrier`` tags (a nested table's rows
    belong to the nested table). Matched nodes ARE descended into:
    tag-soup pages nest the next td/tr inside the previous one when
    close tags are missing, and those cells must each surface once
    (their text stays scoped — _cell_text excludes nested cells)."""
    stack = list(reversed(node.children))
    while stack:
        n = stack.pop()
        if isinstance(n, str):
            continue
        if n.tag in want:
            yield n
        if n.tag in barrier:
            continue
        stack.extend(reversed(n.children))


def _cell_text(node) -> str:
    """Subtree text of a cell, excluding nested table/cell subtrees
    (tag-soup missing close tags nest the next cell INSIDE the
    previous one — its text must not leak into both)."""
    out = []
    stack = list(reversed(node.children))
    while stack:
        n = stack.pop()
        if isinstance(n, str):
            out.append(n)
        elif n.tag not in ("table", "td", "th", "tr"):
            stack.extend(reversed(n.children))
    return " ".join("".join(out).split())


def _span(attrs: dict, key: str) -> int:
    try:
        v = int(attrs.get(key, "1"))
    except ValueError:
        return 1
    return min(max(v, 1), 1000)  # clamp hostile spans


def html_table_cells(root) -> list[list[dict]]:
    """All tables in a parsed DOM -> per table a list of cell dicts
    (row, col, text, header) with the standard rowspan/colspan
    occupancy-grid algorithm: each cell takes the leftmost free grid
    slot in its row and reserves its span rectangle."""
    tables = []
    stack = [root]
    while stack:  # collect every table node (nested ones included);
        n = stack.pop()  # children pushed reversed => document order
        if isinstance(n, str):
            continue
        if n.tag == "table":
            tables.append(n)
        stack.extend(reversed(n.children))

    out = []
    for t in tables:
        cells = []
        occupied: dict[int, set[int]] = {}
        for r, tr in enumerate(
                _walk_scoped(t, {"tr"}, {"table"})):
            col = 0
            for cell in _walk_scoped(tr, {"td", "th"},
                                     {"table", "tr"}):
                while col in occupied.get(r, set()):
                    col += 1
                rs, cs = _span(cell.attrs, "rowspan"), \
                    _span(cell.attrs, "colspan")
                cells.append({"row": r, "col": col,
                              "text": _cell_text(cell),
                              "header": cell.tag == "th"})
                for rr in range(r, r + rs):
                    occupied.setdefault(rr, set()).update(
                        range(col, col + cs))
                col += cs
        out.append(cells)
    return out


def extract_html_tables(ds, url_col: str = "doc_id",
                        html_col: str = "html"):
    """pages Dataset -> one row per table CELL (id, table_idx, row,
    col, text, header) — the HTML-markup twin of the geometric
    TABLE_CELL grid the PDF layout parser emits (reference parity:
    Textract TABLES, postprocessing/fn-postprocess/main.py consumes
    exactly this shape). In-batch expansion, zero exchanges."""

    def expand(t: pa.Table) -> pa.Table:
        from ..htmldom import decode_bytes, parse_html

        ids, tix, rows, cols, texts, hdrs = [], [], [], [], [], []
        for i, raw in zip(t.column(url_col).to_pylist(),
                          t.column(html_col).to_pylist()):
            text = raw if isinstance(raw, str) else decode_bytes(raw)
            if not text:
                continue
            for k, cells in enumerate(html_table_cells(
                    parse_html(text))):
                for c in cells:
                    ids.append(i)
                    tix.append(k)
                    rows.append(c["row"])
                    cols.append(c["col"])
                    texts.append(c["text"])
                    hdrs.append(c["header"])
        return pa.table({
            "doc_id": pa.array(ids, pa.int64()),
            "table_idx": pa.array(tix, pa.int64()),
            "row": pa.array(rows, pa.int64()),
            "col": pa.array(cols, pa.int64()),
            "text": pa.array(texts, pa.string()),
            "header": pa.array(hdrs, pa.bool_()),
        })

    return ds.map_batches(expand, batch_format="pyarrow")


def html_tables(sf_dir: str):
    """ORACLED query surface: per-doc closed-form tables — R = 2+id%3
    data rows x C = 2+id%2 cols under a th header row; every 4th doc's
    LAST data row leads with a colspan=2 cell (so its k-th cell lands
    at col k+1 for k >= 1) — parsed by the real DOM walk + occupancy
    grid; DuckDB recomputes every (doc_id, row, col, text, header)
    cell from doc_id."""
    import ray.data as rd

    ids = rd.read_parquet(f"{sf_dir}/documents.parquet",
                          columns=["doc_id"])

    def render(batch: pa.Table) -> pa.Table:
        out_i, out_h = [], []
        for i in batch.column("doc_id").to_pylist():
            R, C = 2 + i % 3, 2 + i % 2
            parts = ["<table><tr>"]
            parts += [f"<th>H{c}</th>" for c in range(C)]
            parts.append("</tr>")
            for r in range(1, R + 1):
                parts.append("<tr>")
                if i % 4 == 0 and r == R:
                    parts.append(f'<td colspan="2">c{r}_0_{i}</td>')
                    parts += [f"<td>c{r}_{k}_{i}</td>"
                              for k in range(1, C - 1)]
                else:
                    parts += [f"<td>c{r}_{k}_{i}</td>"
                              for k in range(C)]
                parts.append("</tr>")
            parts.append("</table>")
            out_i.append(i)
            out_h.append(f"<html><body>{''.join(parts)}"
                         "</body></html>".encode())
        return pa.table({"doc_id": pa.array(out_i, pa.int64()),
                         "html": pa.array(out_h, pa.binary())})

    pages = _fixture_pages("html_tables", sf_dir, ids, render,
                   batch_size=512)
    return extract_html_tables(pages).sort(["doc_id", "row", "col"])


# --- HTML head metadata ----------------------------------------------------


def extract_page_meta(root) -> dict:
    """(title, description, canonical, noindex, og_title) from a parsed
    DOM: first <title> text (whitespace-normalized), <meta
    name=description content>, <link rel=canonical href>, <meta
    name=robots> containing a 'noindex' token, <meta property=og:title
    content>. First occurrence wins for each; attribute NAMES are
    case-folded by the parser, VALUES compare case-insensitively where
    the HTML spec says so (rel, name, robots tokens)."""
    meta = {"title": None, "description": None, "canonical": None,
            "noindex": False, "og_title": None}
    stack = [root]
    while stack:
        n = stack.pop()
        if isinstance(n, str):
            continue
        if n.tag == "title" and meta["title"] is None:
            meta["title"] = " ".join(_node_text(n).split())
        elif n.tag == "meta":
            name = (n.attrs.get("name") or "").lower()
            prop = (n.attrs.get("property") or "").lower()
            content = n.attrs.get("content") or ""
            if name == "description" and meta["description"] is None:
                meta["description"] = content
            elif name == "robots":
                tokens = {t.strip().lower()
                          for t in content.split(",")}
                if "noindex" in tokens:
                    meta["noindex"] = True
            elif prop == "og:title" and meta["og_title"] is None:
                meta["og_title"] = content
        elif n.tag == "link":
            rel = (n.attrs.get("rel") or "").lower()
            if rel == "canonical" and meta["canonical"] is None:
                meta["canonical"] = n.attrs.get("href")
        stack.extend(reversed(n.children))
    return meta


def extract_html_meta(ds, id_col: str = "doc_id",
                      html_col: str = "html"):
    """pages Dataset -> one metadata row per page. In-batch, zero
    exchanges."""

    def expand(t: pa.Table) -> pa.Table:
        from ..htmldom import decode_bytes, parse_html

        rows = {k: [] for k in ("id", "title", "description",
                                "canonical", "noindex", "og_title")}
        for i, raw in zip(t.column(id_col).to_pylist(),
                          t.column(html_col).to_pylist()):
            text = raw if isinstance(raw, str) else decode_bytes(raw)
            m = extract_page_meta(parse_html(text or ""))
            rows["id"].append(i)
            for k in ("title", "description", "canonical",
                      "noindex", "og_title"):
                rows[k].append(m[k])
        return pa.table({
            "doc_id": pa.array(rows["id"], pa.int64()),
            "title": pa.array(rows["title"], pa.string()),
            "description": pa.array(rows["description"], pa.string()),
            "canonical": pa.array(rows["canonical"], pa.string()),
            "noindex": pa.array(rows["noindex"], pa.bool_()),
            "og_title": pa.array(rows["og_title"], pa.string()),
        })

    return ds.map_batches(expand, batch_format="pyarrow")


def html_meta(sf_dir: str):
    """ORACLED query surface: closed-form head sections (title with
    collapsible whitespace, description, UPPERCASE-attr-value
    canonical link, a robots meta that is noindex on every 7th doc
    with id%7==3, og:title) parsed by the real DOM walk; DuckDB
    recomputes every field from doc_id."""
    import ray.data as rd

    ids = rd.read_parquet(f"{sf_dir}/documents.parquet",
                          columns=["doc_id"])

    def render(batch: pa.Table) -> pa.Table:
        out_i, out_h = [], []
        for i in batch.column("doc_id").to_pylist():
            h = i % 50
            robots = ("<meta name=\"robots\" content=\"NOINDEX, "
                      "nofollow\">" if i % 7 == 3 else
                      "<meta name=\"robots\" content=\"index, "
                      "follow\">")
            head = (f"<head><title>  Doc {i}\n   site{h}  </title>"
                    f'<meta name="description" content="Summary of '
                    f'document {i}">{robots}'
                    f'<link rel="Canonical" href="https://site{h}'
                    f'.example/p/{i}">'
                    f'<meta property="og:title" content="OG {i}">'
                    "</head>")
            out_i.append(i)
            out_h.append(f"<html>{head}<body><p>body {i}</p></body>"
                         "</html>".encode())
        return pa.table({"doc_id": pa.array(out_i, pa.int64()),
                         "html": pa.array(out_h, pa.binary())})

    pages = _fixture_pages("html_meta", sf_dir, ids, render,
                   batch_size=512)
    return extract_html_meta(pages).sort("doc_id")


# --- HTML form (FORMS key-value) extraction --------------------------------


def _label_text(node) -> str:
    """Label subtree text, excluding embedded control subtrees."""
    out = []
    stack = list(reversed(node.children))
    while stack:
        n = stack.pop()
        if isinstance(n, str):
            out.append(n)
        elif n.tag not in ("input", "select", "textarea", "form"):
            stack.extend(reversed(n.children))
    return " ".join("".join(out).split())


def _select_value(sel) -> str:
    """Selected option's value (value attr, else its text): first
    option carrying the selected attr, else the first option."""
    first = chosen = None
    for opt in _walk_scoped(sel, {"option"}, {"select", "form"}):
        if first is None:
            first = opt
        if "selected" in opt.attrs and chosen is None:
            chosen = opt
    opt = chosen or first
    if opt is None:
        return ""
    v = opt.attrs.get("value")
    return v if v is not None else " ".join(_node_text(opt).split())


def html_form_fields(root) -> list[list[dict]]:
    """All <form> elements -> per form a list of field dicts (key,
    field_name, field_type, value) — the HTML-markup twin of the
    geometric KEY_VALUE_SET extraction (reference parity: Textract
    FORMS, fn-postprocess key-value consumers). Key resolution order:
    <label for=id> text, else enclosing <label> text, else
    placeholder, else the name attr, else ''."""
    forms = []
    stack = [root]
    while stack:
        n = stack.pop()
        if isinstance(n, str):
            continue
        if n.tag == "form":
            forms.append(n)
        stack.extend(reversed(n.children))

    out = []
    for form in forms:
        label_for = {}
        for lab in _walk_scoped(form, {"label"}, {"form"}):
            fid = lab.attrs.get("for")
            if fid and fid not in label_for:
                label_for[fid] = _label_text(lab)
        fields = []
        walk = [(c, None) for c in reversed(form.children)]
        while walk:
            n, label_txt = walk.pop()
            if isinstance(n, str) or n.tag == "form":
                continue
            if n.tag == "label":
                t = _label_text(n)
                walk.extend((c, t) for c in reversed(n.children))
                continue
            if n.tag in ("input", "select", "textarea"):
                name = n.attrs.get("name") or ""
                fid = n.attrs.get("id")
                key = (label_for.get(fid) if fid else None) \
                    or label_txt \
                    or n.attrs.get("placeholder") \
                    or name
                if n.tag == "input":
                    ftype = (n.attrs.get("type") or "text").lower()
                    value = n.attrs.get("value") or ""
                elif n.tag == "select":
                    ftype = "select"
                    value = _select_value(n)
                else:
                    ftype = "textarea"
                    value = " ".join(_node_text(n).split())
                if ftype not in ("submit", "button", "hidden"):
                    fields.append({"key": key or "",
                                   "field_name": name,
                                   "field_type": ftype,
                                   "value": value})
                continue
            walk.extend((c, label_txt) for c in reversed(n.children))
        out.append(fields)
    return out


def extract_html_forms(ds, id_col: str = "doc_id",
                       html_col: str = "html"):
    """pages Dataset -> one row per form field (doc_id, form_idx, key,
    field_name, field_type, value). In-batch, zero exchanges."""

    def expand(t: pa.Table) -> pa.Table:
        from ..htmldom import decode_bytes, parse_html

        ids, fix, keys, names, types, vals = [], [], [], [], [], []
        for i, raw in zip(t.column(id_col).to_pylist(),
                          t.column(html_col).to_pylist()):
            text = raw if isinstance(raw, str) else decode_bytes(raw)
            if not text:
                continue
            for k, fields in enumerate(html_form_fields(
                    parse_html(text))):
                for f in fields:
                    ids.append(i)
                    fix.append(k)
                    keys.append(f["key"])
                    names.append(f["field_name"])
                    types.append(f["field_type"])
                    vals.append(f["value"])
        return pa.table({
            "doc_id": pa.array(ids, pa.int64()),
            "form_idx": pa.array(fix, pa.int64()),
            "key": pa.array(keys, pa.string()),
            "field_name": pa.array(names, pa.string()),
            "field_type": pa.array(types, pa.string()),
            "value": pa.array(vals, pa.string()),
        })

    return ds.map_batches(expand, batch_format="pyarrow")


def html_forms(sf_dir: str):
    """ORACLED query surface: one closed-form form per doc — a
    label-for text input, a label-enclosed checkbox, a select with
    the (id%3)-th option selected, a textarea, a placeholder-keyed
    search box, plus a submit button that must NOT surface; DuckDB
    recomputes all five field rows from doc_id."""
    import ray.data as rd

    ids = rd.read_parquet(f"{sf_dir}/documents.parquet",
                          columns=["doc_id"])

    def render(batch: pa.Table) -> pa.Table:
        out_i, out_h = [], []
        for i in batch.column("doc_id").to_pylist():
            opts = "".join(
                f'<option value="{chr(65 + k)}"'
                + (" selected" if k == i % 3 else "")
                + f">Opt {k}</option>" for k in range(3))
            form = (
                f'<form action="/submit">'
                f'<label for="f{i}">Full  Name</label>'
                f'<input id="f{i}" name="name" value="V{i}">'
                f'<label>Subscribe'
                f'<input type="checkbox" name="sub" value="yes">'
                f"</label>"
                f'<select name="plan">{opts}</select>'
                f'<textarea name="note">note {i}</textarea>'
                f'<input name="q" placeholder="Search">'
                f'<input type="submit" value="Go">'
                f"</form>")
            out_i.append(i)
            out_h.append(f"<html><body>{form}</body></html>".encode())
        return pa.table({"doc_id": pa.array(out_i, pa.int64()),
                         "html": pa.array(out_h, pa.binary())})

    pages = _fixture_pages("html_forms", sf_dir, ids, render,
                   batch_size=512)
    return extract_html_forms(pages).sort(["doc_id", "field_name"])


# --- JSON-LD structured data -----------------------------------------------

_JSONLD_RE = _re.compile(
    r"<script[^>]*type\s*=\s*[\"']?application/ld\+json[\"']?[^>]*>"
    r"(.*?)</script\s*>", _re.IGNORECASE | _re.DOTALL)


# --- schema.org microdata (itemscope/itemtype/itemprop) ---------------------
# The OLDER structured-data channel (HTML Standard "microdata"; what
# schema.org shipped before JSON-LD) — product/recipe/review markup on
# long-tail commerce sites still uses it, so an extraction corpus that
# only reads JSON-LD misses a real slice of structured data.

_URL_PROP_TAGS = {"a": "href", "link": "href", "area": "href",
                  "img": "src", "audio": "src", "video": "src",
                  "embed": "src", "iframe": "src", "source": "src",
                  "track": "src"}


def extract_microdata_items(root) -> list[dict]:
    """Walk a DOM tree for microdata items per the HTML Standard
    value rules: itemscope opens an item (document order indexes),
    itemprop on a descendant contributes one property PER
    space-separated name; property value = content attr for <meta>,
    href/src for the URL-bearing tags, datetime (else text) for
    <time>, value for <data>, nested-item (value None) when the
    element also carries itemscope, else concatenated subtree text.
    Nested items' properties belong to the INNER item only. itemref
    is out of scope (documented subset — the tree-scoped form is what
    schema.org consumers emit). Returns [{idx, parent, itemtype,
    props: [(name, value)]}] in document order."""
    items: list[dict] = []

    def walk(node, scope_idx: int | None):
        for c in node.children:
            if isinstance(c, str):
                continue
            a = c.attrs
            child_scope = scope_idx
            if a and "itemprop" in a and scope_idx is not None:
                nested = "itemscope" in a
                if nested:
                    value = None
                else:
                    tag = c.tag
                    if tag == "meta":
                        value = a.get("content", "")
                    elif tag in _URL_PROP_TAGS:
                        value = a.get(_URL_PROP_TAGS[tag], "")
                    elif tag == "time" and a.get("datetime"):
                        value = a["datetime"]
                    elif tag == "data" and a.get("value"):
                        value = a["value"]
                    else:
                        value = _node_text(c).strip()
                for name in a["itemprop"].split():
                    items[scope_idx]["props"].append((name, value))
            if a and "itemscope" in a:
                idx = len(items)
                items.append({
                    "idx": idx,
                    "parent": scope_idx if (a.get("itemprop")
                                            is not None
                                            and scope_idx is not None)
                    else None,
                    "itemtype": a.get("itemtype") or None,
                    "props": []})
                child_scope = idx
            walk(c, child_scope)

    walk(root, None)
    return items


def extract_microdata(ds, id_col: str = "doc_id",
                      html_col: str = "html"):
    """pages Dataset -> one row per (item, property name): (doc_id,
    item_idx, parent_idx=-1 for top level, itemtype, prop, value);
    prop-less items emit a single NULL-prop row so they stay visible.
    Real DOM walk, in-batch, zero exchanges."""

    def expand(t: pa.Table) -> pa.Table:
        from ..htmldom import decode_bytes, parse_html

        ids, iix, par, ity, prp, val = [], [], [], [], [], []
        for i, raw in zip(t.column(id_col).to_pylist(),
                          t.column(html_col).to_pylist()):
            text = raw if isinstance(raw, str) else decode_bytes(raw)
            if not text:
                continue
            try:
                root = parse_html(text)
            except Exception:
                continue  # unparseable html: no structured data
            for item in extract_microdata_items(root):
                rows = item["props"] or [(None, None)]
                for name, value in rows:
                    ids.append(i)
                    iix.append(item["idx"])
                    par.append(-1 if item["parent"] is None
                               else item["parent"])
                    ity.append(item["itemtype"])
                    prp.append(name)
                    val.append(value)
        return pa.table({
            "doc_id": pa.array(ids, pa.int64()),
            "item_idx": pa.array(iix, pa.int64()),
            "parent_idx": pa.array(par, pa.int64()),
            "itemtype": pa.array(ity, pa.string()),
            "prop": pa.array(prp, pa.string()),
            "value": pa.array(val, pa.string()),
        })

    return ds.map_batches(expand, batch_format="pyarrow")


def html_microdata(sf_dir: str):
    """ORACLED query surface: every doc carries a Product item with a
    text prop, a meta content prop, an href prop, a datetime prop, a
    MULTI-NAME itemprop ('tag cat' -> two rows), and a NESTED Offer
    item (the offers prop row carries NULL value; the Offer's price
    belongs to the inner item only); every 5th doc adds a second
    top-level Person item. DuckDB recomputes every row closed-form."""
    import ray.data as rd

    ids = rd.read_parquet(f"{sf_dir}/documents.parquet",
                          columns=["doc_id"])

    def render(batch: pa.Table) -> pa.Table:
        out_i, out_h = [], []
        for i in batch.column("doc_id").to_pylist():
            ty = ["Product", "Recipe", "Book"][i % 3]
            html = (
                "<html><body>"
                f'<div itemscope itemtype="https://schema.org/{ty}">'
                f'<span itemprop="name">Item {i}</span>'
                f'<meta itemprop="sku" content="SKU{i}">'
                f'<a itemprop="url" href="/p/{i}">link</a>'
                f'<time itemprop="date" datetime="2024-01-'
                f'{1 + i % 28:02d}">then</time>'
                f'<span itemprop="tag cat">x{i}</span>'
                '<div itemprop="offers" itemscope '
                'itemtype="https://schema.org/Offer">'
                f'<span itemprop="price">{i % 100}.00</span>'
                "</div></div>")
            if i % 5 == 0:
                html += ('<p itemscope '
                         'itemtype="https://schema.org/Person">'
                         f'<b itemprop="name">P{i}</b></p>')
            out_i.append(i)
            out_h.append(html + "</body></html>")
        return pa.table({"doc_id": batch.column("doc_id"),
                         "html": pa.array(out_h, pa.string())})

    pages = _fixture_pages("html_microdata", sf_dir, ids, render,
                           batch_size=256)
    return extract_microdata(pages).sort(
        ["doc_id", "item_idx", "prop"])


def extract_jsonld_blocks(html: str) -> list[list[dict]]:
    """Raw-scan for <script type=application/ld+json> payloads (the
    DOM parser intentionally SKIPS script content, so structured data
    needs its own pass) and parse each with the stdlib JSON parser.
    Per block: a list of item dicts — a top-level object is one item,
    a top-level array its elements, an @graph object its graph
    members. Malformed JSON yields an empty item list (data quality,
    never an exception)."""
    import json

    blocks = []
    for m in _JSONLD_RE.finditer(html):
        try:
            data = json.loads(m.group(1))
        except (ValueError, RecursionError):
            blocks.append([])
            continue
        if isinstance(data, list):
            items = data
        elif isinstance(data, dict) and isinstance(
                data.get("@graph"), list):
            items = data["@graph"]
        else:
            items = [data]
        blocks.append([i for i in items if isinstance(i, dict)])
    return blocks


def extract_jsonld(ds, id_col: str = "doc_id",
                   html_col: str = "html"):
    """pages Dataset -> one row per JSON-LD item (doc_id, block_idx,
    item_idx, ld_type, name). @type may be a list — first entry wins;
    missing fields surface as null. In-batch, zero exchanges."""

    def expand(t: pa.Table) -> pa.Table:
        from ..htmldom import decode_bytes

        ids, bix, iix, types, names = [], [], [], [], []
        for i, raw in zip(t.column(id_col).to_pylist(),
                          t.column(html_col).to_pylist()):
            text = raw if isinstance(raw, str) else decode_bytes(raw)
            if not text:
                continue
            for b, items in enumerate(extract_jsonld_blocks(text)):
                for k, item in enumerate(items):
                    ty = item.get("@type")
                    if isinstance(ty, list):
                        ty = ty[0] if ty else None
                    nm = item.get("name")
                    ids.append(i)
                    bix.append(b)
                    iix.append(k)
                    types.append(ty if isinstance(ty, str) else None)
                    names.append(nm if isinstance(nm, str) else None)
        return pa.table({
            "doc_id": pa.array(ids, pa.int64()),
            "block_idx": pa.array(bix, pa.int64()),
            "item_idx": pa.array(iix, pa.int64()),
            "ld_type": pa.array(types, pa.string()),
            "name": pa.array(names, pa.string()),
        })

    return ds.map_batches(expand, batch_format="pyarrow")


def html_jsonld(sf_dir: str):
    """ORACLED query surface: every doc carries one valid JSON-LD
    block — type [Article, Product, Person][id%3], name 'Item {id}',
    with every 6th doc an ARRAY adding an Organization item — and
    every doc with id%9==4 an additional MALFORMED block that must
    yield zero rows; DuckDB recomputes the surviving rows
    closed-form."""
    import ray.data as rd

    ids = rd.read_parquet(f"{sf_dir}/documents.parquet",
                          columns=["doc_id"])

    def render(batch: pa.Table) -> pa.Table:
        out_i, out_h = [], []
        for i in batch.column("doc_id").to_pylist():
            ty = ["Article", "Product", "Person"][i % 3]
            item = (f'{{"@context": "https://schema.org", '
                    f'"@type": "{ty}", "name": "Item {i}"}}')
            if i % 6 == 0:
                payload = (f'[{item}, {{"@type": "Organization", '
                           f'"name": "Org {i}"}}]')
            else:
                payload = item
            blocks = (f'<script type="application/ld+json">'
                      f"{payload}</script>")
            if i % 9 == 4:
                blocks += ('<script type="application/ld+json">'
                           "{not json]</script>")
            out_i.append(i)
            out_h.append(f"<html><head>{blocks}</head><body>doc {i}"
                         "</body></html>".encode())
        return pa.table({"doc_id": pa.array(out_i, pa.int64()),
                         "html": pa.array(out_h, pa.binary())})

    pages = _fixture_pages("html_jsonld", sf_dir, ids, render,
                   batch_size=512)
    return extract_jsonld(pages).sort(["doc_id", "block_idx",
                                       "item_idx"])


# --- hreflang alternates + meta-refresh ------------------------------------

_REFRESH_RE = _re.compile(
    r"^\s*\d+\s*;\s*url\s*=\s*['\"]?([^'\"]+?)['\"]?\s*$",
    _re.IGNORECASE)


def extract_alternates(root) -> list[dict]:
    """(kind, lang, href) rows from a parsed DOM: one 'alternate' row
    per <link rel=alternate hreflang href> (rel matched
    case-insensitively, lang lowercased — BCP-47 tags are
    case-insensitive), plus one 'refresh' row when a <meta
    http-equiv=refresh> carries a parseable 'N; url=...' content
    (first wins). The multilingual-corpus signal: hreflang clusters
    tie together translations of one document."""
    rows = []
    refresh_seen = False
    stack = [root]
    while stack:
        n = stack.pop()
        if isinstance(n, str):
            continue
        if n.tag == "link":
            rel = (n.attrs.get("rel") or "").lower()
            lang = n.attrs.get("hreflang")
            href = n.attrs.get("href")
            if rel == "alternate" and lang and href:
                rows.append({"kind": "alternate",
                             "lang": lang.lower(), "href": href})
        elif n.tag == "meta" and not refresh_seen:
            if (n.attrs.get("http-equiv") or "").lower() == "refresh":
                m = _REFRESH_RE.match(n.attrs.get("content") or "")
                if m:
                    rows.append({"kind": "refresh", "lang": None,
                                 "href": m.group(1)})
                    refresh_seen = True
        stack.extend(reversed(n.children))
    return rows


def extract_html_alternates(ds, id_col: str = "doc_id",
                            html_col: str = "html"):
    """pages Dataset -> one row per alternate/refresh entry. In-batch,
    zero exchanges."""

    def expand(t: pa.Table) -> pa.Table:
        from ..htmldom import decode_bytes, parse_html

        ids, kinds, langs, hrefs = [], [], [], []
        for i, raw in zip(t.column(id_col).to_pylist(),
                          t.column(html_col).to_pylist()):
            text = raw if isinstance(raw, str) else decode_bytes(raw)
            if not text:
                continue
            for r in extract_alternates(parse_html(text)):
                ids.append(i)
                kinds.append(r["kind"])
                langs.append(r["lang"])
                hrefs.append(r["href"])
        return pa.table({
            "doc_id": pa.array(ids, pa.int64()),
            "kind": pa.array(kinds, pa.string()),
            "lang": pa.array(langs, pa.string()),
            "href": pa.array(hrefs, pa.string()),
        })

    return ds.map_batches(expand, batch_format="pyarrow")


def html_alternates(sf_dir: str):
    """ORACLED query surface: 1 + id%3 hreflang alternates per doc
    (UPPERCASE tags in the markup, lowercased out) plus a meta-refresh
    redirect on id%11==7 (quoted URL, mixed-case 'URL=' key); DuckDB
    recomputes every row closed-form."""
    import ray.data as rd

    ids = rd.read_parquet(f"{sf_dir}/documents.parquet",
                          columns=["doc_id"])
    langs = ["en", "de", "fr"]

    def render(batch: pa.Table) -> pa.Table:
        out_i, out_h = [], []
        for i in batch.column("doc_id").to_pylist():
            h = i % 50
            links = "".join(
                f'<link rel="Alternate" hreflang="{langs[k].upper()}"'
                f' href="https://site{h}.example/{langs[k]}/p/{i}">'
                for k in range(1 + i % 3))
            if i % 11 == 7:
                links += ('<meta http-equiv="Refresh" content='
                          f'"5; URL=\'https://site{h}.example/new/'
                          f"{i}'\">")
            out_i.append(i)
            out_h.append(f"<html><head>{links}</head><body>doc {i}"
                         "</body></html>".encode())
        return pa.table({"doc_id": pa.array(out_i, pa.int64()),
                         "html": pa.array(out_h, pa.binary())})

    pages = _fixture_pages("html_alternates", sf_dir, ids, render,
                   batch_size=512)
    return extract_html_alternates(pages).sort(
        ["doc_id", "kind", "lang"])


# --- RSS / Atom feed source ------------------------------------------------


def parse_feed(xml: bytes | str) -> list[dict]:
    """Parse an RSS 2.0 or Atom feed into entry dicts (kind, title,
    link, published) via the tag-soup DOM parser. RSS: <item> children
    <title>/<link>text</link>/<pubDate>; Atom: <entry> children
    <title>/<link href=...>/<updated> (the alternate link wins when
    rel is present, else the first link). Malformed feeds degrade to
    their parseable prefix; entries without a link are dropped."""
    from ..htmldom import decode_bytes, parse_html

    text = xml if isinstance(xml, str) else (decode_bytes(xml) or "")
    root = parse_html(text)
    entries = []
    stack = [root]
    while stack:
        n = stack.pop()
        if isinstance(n, str):
            continue
        if n.tag in ("item", "entry"):
            kind = "rss" if n.tag == "item" else "atom"
            title = link = pub = None
            first_link = None
            pending_link = False  # <link> is VOID to the soup parser:
            # an RSS link's url text lands as the NEXT SIBLING string
            # of the empty link node (the classic rss-in-html quirk)
            for c in n.children:
                if isinstance(c, str):
                    if pending_link and c.strip():
                        link = c.strip()
                        pending_link = False
                    continue
                if c.tag == "title" and title is None:
                    title = " ".join(_node_text(c).split())
                elif c.tag == "link":
                    if kind == "rss":
                        if link is None:
                            t = _node_text(c).strip()
                            if t:
                                link = t
                            else:
                                pending_link = True
                    else:
                        href = c.attrs.get("href")
                        if href:
                            rel = (c.attrs.get("rel")
                                   or "alternate").lower()
                            if first_link is None:
                                first_link = href
                            if rel == "alternate" and link is None:
                                link = href
                elif c.tag in ("pubdate", "updated") and pub is None:
                    pub = _node_text(c).strip()
            if kind == "atom" and link is None:
                link = first_link
            if link:
                entries.append({"kind": kind, "title": title,
                                "link": link, "published": pub})
        else:
            stack.extend(reversed(n.children))
    return entries


def read_feeds(ds, url_col: str = "feed_url", xml_col: str = "xml"):
    """(feed_url, xml) Dataset -> one row per entry. In-batch, zero
    exchanges."""

    def expand(t: pa.Table) -> pa.Table:
        src, kinds, titles, links, pubs = [], [], [], [], []
        for u, raw in zip(t.column(url_col).to_pylist(),
                          t.column(xml_col).to_pylist()):
            for e in parse_feed(raw):
                src.append(u)
                kinds.append(e["kind"])
                titles.append(e["title"])
                links.append(e["link"])
                pubs.append(e["published"])
        return pa.table({
            "feed_url": pa.array(src, pa.string()),
            "kind": pa.array(kinds, pa.string()),
            "title": pa.array(titles, pa.string()),
            "link": pa.array(links, pa.string()),
            "published": pa.array(pubs, pa.string()),
        })

    return ds.map_batches(expand, batch_format="pyarrow",
                          batch_size=16)


def feed_inventory(sf_dir: str):
    """ORACLED feed source: each host publishes its docs as ONE feed —
    RSS for even hosts, Atom for odd (rendered inside one host-keyed
    co-location, the sitemap-fixture pattern) — parsed back by the
    real soup walk; DuckDB recomputes every entry closed-form."""
    import ray.data as rd

    from .relational import partitioned_map_groups

    ids = rd.read_parquet(f"{sf_dir}/documents.parquet",
                          columns=["doc_id"])

    def add_host(t: pa.Table) -> pa.Table:
        h = t.column("doc_id").to_numpy() % 50
        return t.append_column("host_id", pa.array(h, pa.int64()))

    def render_feeds(part: pa.Table) -> pa.Table:
        hid = part.column("host_id").to_numpy()
        did = part.column("doc_id").to_numpy()
        order = np.lexsort((did, hid))
        hid, did = hid[order], did[order]
        starts = np.flatnonzero(np.r_[True, hid[1:] != hid[:-1]])
        urls, xmls = [], []
        for k, st in enumerate(starts):
            en = starts[k + 1] if k + 1 < len(starts) else len(hid)
            h = int(hid[st])
            if h % 2 == 0:
                items = "".join(
                    f"<item><title>Post {int(i)}</title>"
                    f"<link>https://site{h}.example/p/{int(i)}</link>"
                    f"<pubDate>2024-01-{1 + int(i) % 28:02d}</pubDate>"
                    "</item>" for i in did[st:en])
                xml = (f'<?xml version="1.0"?><rss version="2.0">'
                       f"<channel><title>Site {h}</title>{items}"
                       "</channel></rss>")
            else:
                items = "".join(
                    f"<entry><title>Post {int(i)}</title>"
                    f'<link rel="self" href="https://site{h}.example'
                    f'/feed.xml"/>'
                    f'<link rel="alternate" href="https://site{h}'
                    f'.example/p/{int(i)}"/>'
                    f"<updated>2024-01-{1 + int(i) % 28:02d}"
                    "</updated></entry>" for i in did[st:en])
                xml = ('<feed xmlns="http://www.w3.org/2005/Atom">'
                       f"<title>Site {h}</title>{items}</feed>")
            urls.append(f"https://site{h}.example/feed.xml")
            xmls.append(xml.encode())
        return pa.table({"feed_url": pa.array(urls, pa.string()),
                         "xml": pa.array(xmls, pa.binary())})

    feeds = partitioned_map_groups(
        ids.map_batches(add_host, batch_format="pyarrow",
                        zero_copy_batch=True),
        "host_id", render_feeds)
    return read_feeds(feeds).sort(["link"])


# --- crawl frontier composite ----------------------------------------------


def crawl_frontier(sf_dir: str, keep_url: bool = False):
    """ORACLED capstone composite: admit pages that are robots-allowed
    AND not noindex, prioritized by their host's PageRank — the
    scheduling core of a polite crawler, composed from three REAL
    extractor pipelines over their fixtures:

      robots_gate (RFC 9309 decision per url)
      html_meta   (robots-meta noindex per page)
      host_ranks  (integer PageRank over the extracted link graph)

    Engine shape: the two per-page streams join on doc_id with ONE
    hash-partitioned exchange (both are page-cardinality); the host
    rank table broadcasts (|domains|-bounded) and priorities attach
    map-side from the url's host — at 100 TB the gate never moves a
    page twice. Output (doc_id, admitted, priority_e12); the DuckDB
    twin composes the closed-form decisions with the identical
    unrolled PageRank recurrence."""
    import ray

    from ..broadcast import get_broadcast
    from .relational import hash_join

    allowed = robots_gate(sf_dir)      # (doc_id, url, allowed)
    meta = html_meta(sf_dir).map_batches(
        lambda t: t.select(["doc_id", "noindex"]),
        batch_format="pyarrow", zero_copy_batch=True)
    joined = hash_join(allowed, meta, on="doc_id")

    ranks = host_ranks(
        extract_links(synth_link_corpus(sf_dir)).materialize())
    rank_ref = ray.put({h: int(r) for h, r in
                        zip(ranks.column("host").to_pylist(),
                            ranks.column("rank_e12").to_pylist())})

    def finish(t: pa.Table) -> pa.Table:
        rmap = get_broadcast(rank_ref)
        hosts = pc.utf8_lower(pc.struct_field(pc.extract_regex(
            t.column("url"), _DOMAIN_RE), "domain")).to_pylist()
        prio = [rmap.get(h, 0) for h in hosts]
        admitted = pc.and_(t.column("allowed"),
                           pc.invert(t.column("noindex")))
        cols = {
            "doc_id": t.column("doc_id"),
            "admitted": admitted,
            "priority_e12": pa.array(prio, pa.int64()),
        }
        if keep_url:  # downstream schedulers need the url/host
            cols["url"] = t.column("url")
        return pa.table(cols)

    return joined.map_batches(finish, batch_format="pyarrow",
                              zero_copy_batch=True).sort("doc_id")


def parse_crawl_delay(text: str, agent: str = "*") -> int | None:
    """Crawl-delay (de-facto standard politeness directive) for
    ``agent`` in integer MILLISECONDS, with the same most-specific-
    group-supersedes-'*' selection as parse_robots; fractional
    seconds supported; first directive in the winning scope wins;
    None when absent/unparseable."""
    specific = wildcard = None
    has_specific = False
    group_specific = group_wild = False
    in_agents = True
    want = agent.lower()
    for raw in text.splitlines():
        line = raw.split("#", 1)[0].strip()
        if not line:
            continue
        field, _, value = line.partition(":")
        field = field.strip().lower()
        value = value.strip()
        if field == "user-agent":
            if not in_agents:
                group_specific = group_wild = False
                in_agents = True
            if value == "*":
                group_wild = True
            elif value.lower() == want:
                group_specific = has_specific = True
        else:
            in_agents = False
            if field == "crawl-delay":
                try:
                    ms = int(round(float(value) * 1000))
                except ValueError:
                    continue
                if group_specific and specific is None:
                    specific = ms
                elif group_wild and wildcard is None:
                    wildcard = ms
    return specific if has_specific else wildcard


def robots_crawl_delay(sf_dir: str):
    """ORACLED query surface: per-host politeness budget from the
    robots fixture (delays planted in the '*' groups of host classes
    0 and 3; class 2's delay sits in a foreign-agent group and must
    NOT surface); DuckDB recomputes the 50-row budget table."""
    import ray.data as rd

    ids = rd.read_parquet(f"{sf_dir}/documents.parquet",
                          columns=["doc_id"])

    def hosts_partial(t: pa.Table) -> pa.Table:
        h = np.unique(t.column("doc_id").to_numpy() % 50)
        return pa.table({"host_id": pa.array(h, pa.int64())})

    seen = set()
    for b in ids.map_batches(hosts_partial, batch_format="pyarrow",
                             zero_copy_batch=True) \
            .iter_batches(batch_format="pyarrow"):
        seen.update(b.column("host_id").to_pylist())  # |hosts|-bounded
    rows_h = sorted(seen)
    delays = [parse_crawl_delay(_robots_fixture_text(h))
              for h in rows_h]
    return rd.from_arrow(pa.table({
        "host_id": pa.array(rows_h, pa.int64()),
        "delay_ms": pa.array(delays, pa.int64()),
    }))


# --- table -> markdown linearization ---------------------------------------


def tables_to_markdown(cells_ds):
    """(doc_id, table_idx, row, col, text, header) cell rows -> one
    markdown string per table: the standard LLM-corpus linearization
    (header line, '---' separator sized to the header's cell count,
    data lines; cells joined in col order — spans flatten to their
    top-left cell, documented). Cells of one doc may be split across
    batches, so the build runs inside ONE doc-keyed co-location;
    string assembly is inherently per-table (bounded by the
    partition's tables)."""
    from .relational import partitioned_map_groups

    def build(part: pa.Table) -> pa.Table:
        import pandas as pd

        df = part.to_pandas().sort_values(
            ["doc_id", "table_idx", "row", "col"])
        out_d, out_t, out_m = [], [], []
        for (d, ti), g in df.groupby(["doc_id", "table_idx"],
                                     sort=True):
            lines = []
            first_row = None
            for r, rg in g.groupby("row", sort=True):
                line = "| " + " | ".join(rg.text.fillna("")) + " |"
                if first_row is None:
                    first_row = len(rg)
                    lines.append(line)
                    lines.append("|" + " --- |" * first_row)
                else:
                    lines.append(line)
            out_d.append(int(d))
            out_t.append(int(ti))
            out_m.append("\n".join(lines))
        return pa.table({
            "doc_id": pa.array(out_d, pa.int64()),
            "table_idx": pa.array(out_t, pa.int64()),
            "markdown": pa.array(out_m, pa.string()),
        })

    return partitioned_map_groups(cells_ds, "doc_id", build)


def html_tables_markdown(sf_dir: str):
    """ORACLED query surface: the html_tables fixture linearized to
    markdown; DuckDB rebuilds each table's string with ordered
    string_agg over the identical closed-form cell grid."""
    cells = html_tables(sf_dir)
    return tables_to_markdown(cells).sort(["doc_id", "table_idx"])


# --- full-document HTML -> markdown linearization ---------------------------
# The whole-page twin of tables_to_markdown: the standard LLM-corpus
# serialization of a page (what markdownify/trafilatura-style exporters
# emit), produced entirely from the engine's own tag-soup DOM. The
# reference's analog is the document-level text assembly fn-postprocess
# performs over Textract blocks (postprocessing/fn-postprocess/main.py);
# here the markup itself carries the structure.
#
# Spec (deterministic, pinned by tests + the DuckDB oracle):
#   h1-h6   -> '#'*k + ' ' + inline text        (own block)
#   p       -> inline text                       (own block)
#   ul/ol   -> one block; '- ' / '{k}. ' markers, nested lists indent
#              2 spaces per level, nested items follow their parent li;
#              tag-soup '<li>x<li>y' (second item nested in the first)
#              surfaces both items
#   tag-soup <p> nesting blocks (HTML auto-closes p; the tree builder
#              nests) SPLITS: inline runs and block children emit as
#              sibling blocks in document order
#   blockquote -> contained blocks prefixed '> ' per nesting level
#   pre     -> fenced code block (raw text, outer newlines stripped)
#   hr      -> '---'
#   table   -> the tables_to_markdown grid lines (first row = header)
#   inline: a -> [text](href), img -> ![alt](src), strong/b -> **,
#           em/i -> *, code -> `, br -> ' '; inline whitespace
#           collapses to single spaces (code spans included —
#           documented divergence from CommonMark, which this
#           linearizer does not try to round-trip)
#   skipped: head + form controls (script/style/noscript/template/svg/
#            iframe content never reaches the DOM — htmldom
#            SKIP_CONTENT); unknown tags are transparent containers
#   blocks join with one blank line; loose non-whitespace text at
#   block level becomes its own block
# Every walk is an explicit stack — tag-soup depth cannot hit the
# recursion limit (same rule as html_form_fields).

_MD_SKIP = frozenset({"script", "style", "noscript", "template",
                      "head", "svg", "iframe", "form", "button",
                      "input", "select", "textarea", "option",
                      "datalist", "label"})
_MD_INLINE_MARK = {"strong": "**", "b": "**", "em": "*", "i": "*",
                   "code": "`"}
_MD_HEADINGS = {"h1": 1, "h2": 2, "h3": 3, "h4": 4, "h5": 5, "h6": 6}
# Block-level tags a soup-nested <p> must SPLIT around: HTML auto-closes
# an open <p> at any of these, but the tag-soup tree builder nests them
# instead — without the split, a page of unclosed <p>s would swallow
# every list/table into inline context and drop it.
_MD_BLOCK = frozenset(_MD_HEADINGS) | frozenset({
    "p", "pre", "hr", "ul", "ol", "table", "blockquote", "div",
    "section", "article", "aside", "main", "header", "footer",
    "figure", "fieldset", "dl"})


class _Seg:
    """Deferred inline segment (the text runs between a soup-nested
    <p>'s block-level children)."""
    __slots__ = ("nodes",)

    def __init__(self, nodes):
        self.nodes = nodes


def _inline_md(nodes, exclude: frozenset = frozenset()) -> str:
    """Inline-markdown text of a node list (enter/exit event stack:
    closing markers emit on exit). Lists and tables are block-level —
    inside an inline context they contribute nothing here (their
    block handling owns them); ``exclude`` adds caller-scoped
    subtrees to skip (a list item excludes soup-nested li)."""
    parts = []
    stack = [("e", n) for n in reversed(list(nodes))]
    while stack:
        ev, n = stack.pop()
        if ev == "x":
            parts.append("](%s)" % (n.attrs.get("href") or "")
                         if n.tag == "a" else _MD_INLINE_MARK[n.tag])
            continue
        if isinstance(n, str):
            parts.append(n)
            continue
        t = n.tag
        if t in _MD_SKIP or t in ("ul", "ol", "table") or t in exclude:
            continue
        if t == "img":
            parts.append("![%s](%s)" % (n.attrs.get("alt") or "",
                                        n.attrs.get("src") or ""))
            continue
        if t == "br":
            parts.append(" ")
            continue
        if t == "a" or t in _MD_INLINE_MARK:
            parts.append("[" if t == "a" else _MD_INLINE_MARK[t])
            stack.append(("x", n))
        stack.extend(("e", c) for c in reversed(n.children))
    return " ".join("".join(parts).split())


def _raw_text(node) -> str:
    """Verbatim subtree text (pre contents — no collapsing)."""
    out = []
    stack = list(reversed(node.children))
    while stack:
        n = stack.pop()
        if isinstance(n, str):
            out.append(n)
        else:
            stack.extend(reversed(n.children))
    return "".join(out)


def _render_list(root_list) -> str:
    """One markdown block for a whole ul/ol. Items come from a SCOPED
    walk (nested ul/ol are barriers — their items belong to the
    nested list — but matched li ARE descended: tag-soup '<li>x<li>y'
    nests the second item inside the first and both must surface,
    exactly the html_table_cells rule). An item's text excludes
    soup-nested li subtrees; ol numbering follows document position;
    nested lists emit immediately after their parent item at +1
    indent."""
    lines = []
    stack = []

    def push(lst, depth):
        lis = list(_walk_scoped(lst, {"li"}, {"ul", "ol", "table"}))
        markers = (["%d." % (k + 1) for k in range(len(lis))]
                   if lst.tag == "ol" else ["-"] * len(lis))
        stack.extend(reversed(list(zip(lis, markers,
                                       [depth] * len(lis)))))

    push(root_list, 0)
    while stack:
        li, marker, depth = stack.pop()
        text = _inline_md(li.children, exclude=frozenset({"li"}))
        lines.append("  " * depth + marker + " " + text)
        nested = list(_walk_scoped(li, {"ul", "ol"},
                                   {"ul", "ol", "li", "table"}))
        for lst in reversed(nested):
            push(lst, depth + 1)
    return "\n".join(lines)


def _table_md(cells: list[dict]) -> str:
    """Grid cells (html_table_cells shape) -> the tables_to_markdown
    line format: first grid row is the header, separator sized to its
    cell count."""
    if not cells:
        return ""
    rows: dict[int, list[str]] = {}
    for c in sorted(cells, key=lambda c: (c["row"], c["col"])):
        rows.setdefault(c["row"], []).append(c["text"])
    lines = []
    first = None
    for r in sorted(rows):
        line = "| " + " | ".join(rows[r]) + " |"
        lines.append(line)
        if first is None:
            first = len(rows[r])
            lines.append("|" + " --- |" * first)
    return "\n".join(lines)


def render_markdown(root) -> str:
    """Parsed DOM -> one markdown string per the module-level spec."""
    body = None
    stack = [root]
    while stack:
        n = stack.pop()
        if isinstance(n, str):
            continue
        if n.tag == "body":
            body = n
            break
        stack.extend(reversed(n.children))
    top = body if body is not None else root

    blocks: list[tuple[str, int]] = []
    stack = [(c, 0) for c in reversed(top.children)]
    while stack:
        n, qd = stack.pop()
        if isinstance(n, str):
            t = " ".join(n.split())
            if t:
                blocks.append((t, qd))
            continue
        if isinstance(n, _Seg):
            txt = _inline_md(n.nodes)
            if txt:
                blocks.append((txt, qd))
            continue
        tag = n.tag
        if tag in _MD_SKIP:
            continue
        if tag in _MD_HEADINGS:
            txt = _inline_md(n.children)
            if txt:
                blocks.append(("#" * _MD_HEADINGS[tag] + " " + txt, qd))
        elif tag == "p":
            kids = n.children
            if any(not isinstance(c, str) and c.tag in _MD_BLOCK
                   for c in kids):
                # soup-nested blocks: emit inline runs and block
                # children as siblings, in document order
                pieces, run = [], []
                for c in kids:
                    if not isinstance(c, str) and c.tag in _MD_BLOCK:
                        pieces.append(_Seg(run))
                        pieces.append(c)
                        run = []
                    else:
                        run.append(c)
                pieces.append(_Seg(run))
                stack.extend((p, qd) for p in reversed(pieces))
            else:
                txt = _inline_md(kids)
                if txt:
                    blocks.append((txt, qd))
        elif tag == "pre":
            blocks.append(("```\n" + _raw_text(n).strip("\n") + "\n```",
                           qd))
        elif tag == "hr":
            blocks.append(("---", qd))
        elif tag in ("ul", "ol"):
            txt = _render_list(n)
            if txt:
                blocks.append((txt, qd))
        elif tag == "table":
            # html_table_cells on the node covers it AND nested tables
            # (each with its own scoped grid) in document order
            for cells in html_table_cells(n):
                txt = _table_md(cells)
                if txt:
                    blocks.append((txt, qd))
        elif tag == "blockquote":
            stack.extend((c, qd + 1) for c in reversed(n.children))
        elif tag == "a" or tag == "img" or tag == "br" \
                or tag in _MD_INLINE_MARK:
            txt = _inline_md([n])
            if txt:
                blocks.append((txt, qd))
        else:  # transparent container (div/section/article/li-soup/...)
            stack.extend((c, qd) for c in reversed(n.children))

    out = []
    for text, qd in blocks:
        if qd:
            pfx = "> " * qd
            text = "\n".join((pfx + ln).rstrip()
                             for ln in text.split("\n"))
        out.append(text)
    return "\n\n".join(out)


def extract_markdown(ds, id_col: str = "doc_id",
                     html_col: str = "html"):
    """pages Dataset -> (doc_id, markdown): the full-page
    linearization, one row per page. In-batch, zero exchanges;
    undecodable html degrades to an empty-string DATA row."""

    def expand(t: pa.Table) -> pa.Table:
        from ..htmldom import decode_bytes, parse_html

        ids, mds = [], []
        for i, raw in zip(t.column(id_col).to_pylist(),
                          t.column(html_col).to_pylist()):
            text = raw if isinstance(raw, str) else decode_bytes(raw)
            ids.append(i)
            mds.append(render_markdown(parse_html(text or "")))
        return pa.table({"doc_id": pa.array(ids, pa.int64()),
                         "markdown": pa.array(mds, pa.string())})

    return ds.map_batches(expand, batch_format="pyarrow")


def synth_markdown_pages(sf_dir: str):
    """Closed-form fixture exercising every markdown rule: heading
    levels, collapsible inline whitespace, bold/italic/code/link/
    image, ul with nesting + ol numbering, blockquote, pre fence, hr,
    a table, and a script block that must contribute nothing."""
    import ray.data as rd

    ids = rd.read_parquet(f"{sf_dir}/documents.parquet",
                          columns=["doc_id"])

    def render(batch: pa.Table) -> pa.Table:
        out_i, out_h = [], []
        for i in batch.column("doc_id").to_pylist():
            h = i % 50
            html = (
                f"<html><head><title>Doc {i}</title></head><body>\n"
                f"<h1>Doc {i}</h1>\n"
                f"<p>Intro   paragraph {i} with <strong>bold "
                f"{i % 7}</strong>, <em>italic\n{i % 5}</em> and a "
                f'<a href="https://site{h}.example/p/{i}">link '
                f"{i}</a>.</p>\n"
                f"<h2>Details {i % 3}</h2>\n"
                f"<ul><li>alpha {i % 3}</li><li>has <code>code "
                f"{i % 5}</code></li><li>deep<ul><li>leaf {i % 2}"
                f"</li></ul></li></ul>\n"
                f"<ol><li>first {i % 2}</li><li>second {i % 4}</li>"
                f"</ol>\n"
                f"<blockquote><p>quoted {i % 11}</p></blockquote>\n"
                f"<pre>raw {i}\n  indent {i % 9}</pre>\n"
                f"<hr>\n"
                f"<table><tr><th>k</th><th>v</th></tr><tr><td>size"
                f"</td><td>{i % 9}</td></tr></table>\n"
                f'<p>Image <img src="/img/{i}.png" alt="im {i % 6}">'
                f" tail.</p>\n"
                f"<script>var x = {i};</script>\n"
                f"</body></html>")
            out_i.append(i)
            out_h.append(html.encode())
        return pa.table({"doc_id": pa.array(out_i, pa.int64()),
                         "html": pa.array(out_h, pa.binary())})

    return _fixture_pages("synth_markdown_pages", sf_dir, ids, render,
                   batch_size=512)


def html_markdown(sf_dir: str):
    """ORACLED query surface: the closed-form fixture linearized by
    the real DOM walk; DuckDB rebuilds each page's exact markdown
    string by concatenation from doc_id."""
    return extract_markdown(synth_markdown_pages(sf_dir)) \
        .sort("doc_id")


# --- politeness-aware crawl schedule ----------------------------------------


def crawl_schedule(pages, delays_by_host: dict[str, int],
                   default_delay_ms: int = 1000,
                   url_col: str = "url"):
    """Admitted frontier pages (doc_id, url) -> per-host fetch slots:
    (doc_id, url, host, slot, fetch_at_ms) with slot = position in the
    host's queue (doc_id order, deterministic) and fetch_at_ms =
    slot * the host's Crawl-delay budget (``default_delay_ms`` when
    the host declares none — the conventional 1 s politeness floor).

    Engine shape: the delay table is |hosts|-bounded and broadcasts;
    hosts attach map-side from the url; slots need each host's queue
    in one place, so the pages make ONE host-keyed exchange and the
    slot arithmetic runs vectorized per partition. At 100 TB this is
    the scheduler's minimal data movement: one slim (doc_id, url,
    host, delay) stream moved once."""
    import ray

    from ..broadcast import get_broadcast
    from .relational import partitioned_map_groups

    dref = ray.put(dict(delays_by_host))

    def attach(t: pa.Table) -> pa.Table:
        dmap = get_broadcast(dref)
        hosts = pc.struct_field(
            pc.extract_regex(t.column(url_col), _DOMAIN_RE),
            "domain").to_pylist()
        hosts = [(h or "").lower() for h in hosts]
        # .get(h, default): a host declaring Crawl-delay: 0 keeps its
        # declared 0 ms — `or default` would clamp it to the floor
        delays = [dmap.get(h, default_delay_ms) for h in hosts]
        return pa.table({
            "doc_id": t.column("doc_id"),
            "url": t.column(url_col),
            "host": pa.array(hosts, pa.string()),
            "delay_ms": pa.array(delays, pa.int64())})

    def slots(part: pa.Table) -> pa.Table:
        d = part.column("doc_id").to_numpy()
        h = np.asarray(part.column("host").to_pylist())
        dl = part.column("delay_ms").to_numpy()
        order = np.lexsort((d, h))
        hs, ds_, dls = h[order], d[order], dl[order]
        bounds = np.flatnonzero(hs[1:] != hs[:-1]) + 1
        starts = np.concatenate(([0], bounds))
        seg = np.diff(np.concatenate((starts, [hs.size])))
        slot = np.arange(hs.size, dtype=np.int64) \
            - np.repeat(starts, seg)
        return pa.table({
            "doc_id": pa.array(ds_, pa.int64()),
            "url": pc.take(part.column("url"),
                           pa.array(order, pa.int64())),
            "host": pa.array(hs, pa.string()),
            "slot": pa.array(slot, pa.int64()),
            "fetch_at_ms": pa.array(slot * dls, pa.int64())})

    tagged = pages.map_batches(attach, batch_format="pyarrow",
                               zero_copy_batch=True)
    return partitioned_map_groups(tagged, "host", slots)


def crawl_schedule_plan(sf_dir: str):
    """ORACLED query surface composing THREE real pipelines: the
    crawl_frontier admission (robots gate x meta noindex, real
    parses), the robots_crawl_delay budgets (real Crawl-delay
    parsing; hosts without one fall to the 1000 ms floor), and the
    slot scheduler above. The DuckDB twin recomputes admission closed
    form and slots with a per-host row_number window."""

    fr = crawl_frontier(sf_dir, keep_url=True)

    def admitted_only(t: pa.Table) -> pa.Table:
        return t.filter(t.column("admitted")) \
                .select(["doc_id", "url"])

    pages = fr.map_batches(admitted_only, batch_format="pyarrow",
                           zero_copy_batch=True)
    delays = {}
    for b in robots_crawl_delay(sf_dir) \
            .iter_batches(batch_format="pyarrow"):  # |hosts|-bounded
        for hid, ms in zip(b.column("host_id").to_pylist(),
                           b.column("delay_ms").to_pylist()):
            if ms is not None:
                delays[f"site{hid}.example"] = ms
    return crawl_schedule(pages, delays).sort("doc_id")


# --- sitemap discovery from robots.txt --------------------------------------


def parse_sitemap_urls(text: str) -> list[str]:
    """Sitemap: directives from robots.txt — a GLOBAL field (RFC 9309
    §2.3: valid anywhere, outside group scoping), case-insensitive
    key, comments stripped, document order preserved, empty values
    dropped."""
    out = []
    for raw in (text or "").splitlines():
        line = raw.split("#", 1)[0].strip()
        if not line:
            continue
        field, _, value = line.partition(":")
        if field.strip().lower() == "sitemap" and value.strip():
            out.append(value.strip())
    return out


def robots_sitemaps(sf_dir: str):
    """ORACLED query surface: sitemap discovery over the per-host
    robots fixture (every host declares one; odd hosts a second via a
    lowercase key with a trailing comment). |hosts|-bounded, same
    driver-side pattern as robots_crawl_delay; DuckDB recomputes the
    (host_id, pos, sitemap_url) table closed-form."""
    import ray.data as rd

    ids = rd.read_parquet(f"{sf_dir}/documents.parquet",
                          columns=["doc_id"])

    def hosts_partial(t: pa.Table) -> pa.Table:
        h = np.unique(t.column("doc_id").to_numpy() % 50)
        return pa.table({"host_id": pa.array(h, pa.int64())})

    seen = set()
    for b in ids.map_batches(hosts_partial, batch_format="pyarrow",
                             zero_copy_batch=True) \
            .iter_batches(batch_format="pyarrow"):
        seen.update(b.column("host_id").to_pylist())  # |hosts|-bounded
    rows_h, rows_p, rows_u = [], [], []
    for h in sorted(seen):
        for p, u in enumerate(parse_sitemap_urls(
                _robots_fixture_text(h))):
            rows_h.append(h)
            rows_p.append(p)
            rows_u.append(u)
    return rd.from_arrow(pa.table({
        "host_id": pa.array(rows_h, pa.int64()),
        "pos": pa.array(rows_p, pa.int64()),
        "sitemap_url": pa.array(rows_u, pa.string()),
    }))


# --- redirect-chain resolution ----------------------------------------------
# The canonical-target pass every crawl runs over its redirect edges
# (meta-refresh here; HTTP 3xx rows drop into the same shape): follow
# each page's chain to its terminal url with an exact hop count, cap
# at max_hops, and report cycles / over-long chains as data.
#
# Spec (pinned by the oracle + the two-path equivalence test):
#   url with no outgoing redirect         -> (url,  0,    'ok')
#   chain reaching a terminal in h<=cap   -> (term, h,    'ok')
#   still redirecting after cap steps     -> (NULL, cap,  'unresolved')
#     (cycles, incl. self-loops, land here naturally)
#   multiple edges per src: smallest dst wins (deterministic; real
#   pages have one refresh — extract_alternates keeps the first)
#
# Engine: the edge table is |redirecting pages|-bounded. Under
# REDIRECT_BROADCAST_MAX it ships once per worker and pages resolve
# map-side (bounded dict walks). Above it, the map pointer-DOUBLES:
# ceil(log2(cap)) self-joins of the edges-bounded table (terminal
# rows stop composing, so terminal hop counts stay exact; anything
# still open past cap is unresolved by construction), then pages join
# the resolved map ONCE. Paths equivalence-tested.

REDIRECT_BROADCAST_MAX = 2_000_000


def _dedupe_edges(t: pa.Table) -> pa.Table:
    """Per-src smallest dst (vectorized; exact after the groupby-min
    exchange or over a collected table)."""
    src = t.column("src_url")
    dst = t.column("dst_url")
    order = pc.sort_indices(t, sort_keys=[("src_url", "ascending"),
                                          ("dst_url", "ascending")])
    s = pc.take(src, order)
    d = pc.take(dst, order)
    sn = np.asarray(s.to_pylist())
    keep = np.ones(len(sn), bool)
    if len(sn):
        keep[1:] = sn[1:] != sn[:-1]
    idx = pa.array(np.flatnonzero(keep), pa.int64())
    return pa.table({"src_url": pc.take(s, idx),
                     "dst_url": pc.take(d, idx)})


def _resolve_rows(edge_map: dict, urls, max_hops: int):
    finals, hops, status = [], [], []
    for u in urls:
        cur, h = u, 0
        while h < max_hops and cur in edge_map:
            cur = edge_map[cur]
            h += 1
        if cur in edge_map:
            finals.append(None)
            hops.append(max_hops)
            status.append("unresolved")
        else:
            finals.append(cur)
            hops.append(h)
            status.append("ok")
    return finals, hops, status


def resolve_redirects(pages, edges, max_hops: int = 5,
                      url_col: str = "url", mode: str = "auto"):
    """pages (doc_id, url) x redirect edges (src_url, dst_url) ->
    (doc_id, url, final_url, hops, status) per the module spec.
    ``mode``: 'auto' gates on the edge count, 'broadcast' / 'join'
    force a path (the equivalence test drives both)."""
    import math

    import ray

    from ..broadcast import get_broadcast
    from .relational import hash_join

    if mode == "auto":
        mode = ("broadcast" if edges.count() <= REDIRECT_BROADCAST_MAX
                else "join")

    if mode == "broadcast":
        em: dict = {}
        for b in edges.iter_batches(batch_format="pyarrow"):  # gated
            for s, d in zip(b.column("src_url").to_pylist(),
                            b.column("dst_url").to_pylist()):
                if s not in em or d < em[s]:
                    em[s] = d  # smallest dst wins
        eref = ray.put(em)

        def resolve(t: pa.Table) -> pa.Table:
            m = get_broadcast(eref)
            urls = t.column(url_col).to_pylist()
            finals, hops, status = _resolve_rows(m, urls, max_hops)
            return pa.table({
                "doc_id": t.column("doc_id"),
                "url": t.column(url_col),
                "final_url": pa.array(finals, pa.string()),
                "hops": pa.array(hops, pa.int64()),
                "status": pa.array(status, pa.string())})

        return pages.map_batches(resolve, batch_format="pyarrow",
                                 zero_copy_batch=True)

    # join path: pointer-double the edges-bounded map, then one final
    # co-location with the pages. Every exchange is the repo's own
    # copartitioned_map (native hash-join aggregators choke on the
    # schema-less empty partitions tiny edge tables produce); the map
    # MATERIALIZES between rounds (it is |edges|-bounded — the
    # PageRank pinned-block rule; without the pin each lazy round
    # re-executes the whole upstream).
    from .relational import copartitioned_map

    def _probe_prep(t: pa.Table) -> pa.Table:
        return pa.table({
            "k": t.column("final"),
            "src_url": t.column("src_url"),
            "final": t.column("final"),
            "hops": t.column("hops"),
            "final2": pa.nulls(t.num_rows, pa.string()),
            "hops2": pa.nulls(t.num_rows, pa.int64())})

    def _map_prep(t: pa.Table) -> pa.Table:
        return pa.table({
            "k": t.column("src_url"),
            "src_url": pa.nulls(t.num_rows, pa.string()),
            "final": pa.nulls(t.num_rows, pa.string()),
            "hops": pa.nulls(t.num_rows, pa.int64()),
            "final2": t.column("final"),
            "hops2": t.column("hops")})

    def _compose(parts):
        probe, mp = parts
        p = probe.select(["k", "src_url", "final", "hops"]).to_pandas()
        m = mp.select(["k", "final2", "hops2"]).to_pandas()
        j = p.merge(m, on="k", how="left")
        open_ = j["final2"].notna()
        j.loc[open_, "final"] = j.loc[open_, "final2"]
        j.loc[open_, "hops"] = (j.loc[open_, "hops"]
                                + j.loc[open_, "hops2"])
        return pa.table({
            "src_url": pa.array(j["src_url"], pa.string()),
            "final": pa.array(j["final"], pa.string()),
            "hops": pa.array(j["hops"].astype("int64"), pa.int64())})

    deduped = _dedupe_edges_ds(edges).materialize()
    fmap = deduped.map_batches(
        lambda t: pa.table({
            "src_url": t.column("src_url"),
            "final": t.column("dst_url"),
            "hops": pa.array(np.ones(t.num_rows, np.int64),
                             pa.int64())}),
        batch_format="pyarrow").materialize()
    rounds = max(1, math.ceil(math.log2(max(2, max_hops))))
    for _ in range(rounds):
        fmap = copartitioned_map(
            [(fmap, _probe_prep), (fmap, _map_prep)],
            "k", _compose).materialize()

    # a final still present as a src => chain still open; then the
    # pages co-locate ONCE with the resolved map and finish map-side
    def _open_probe(t: pa.Table) -> pa.Table:
        return pa.table({
            "k": t.column("final"),
            "src_url": t.column("src_url"),
            "final": t.column("final"),
            "hops": t.column("hops"),
            "open": pa.nulls(t.num_rows, pa.bool_())})

    def _open_srcs(t: pa.Table) -> pa.Table:
        return pa.table({
            "k": t.column("src_url"),
            "src_url": pa.nulls(t.num_rows, pa.string()),
            "final": pa.nulls(t.num_rows, pa.string()),
            "hops": pa.nulls(t.num_rows, pa.int64()),
            "open": pa.array(np.ones(t.num_rows, bool))})

    def _mark_open(parts):
        probe, srcs = parts
        p = probe.select(["k", "src_url", "final", "hops"]).to_pandas()
        s = srcs.select(["k", "open"]).to_pandas()                 .drop_duplicates("k")
        j = p.merge(s, on="k", how="left")
        return pa.table({
            "src_url": pa.array(j["src_url"], pa.string()),
            "final": pa.array(j["final"], pa.string()),
            "hops": pa.array(j["hops"].astype("int64"), pa.int64()),
            "open": pa.array(j["open"].eq(True).to_numpy(bool))})

    resolved = copartitioned_map(
        [(fmap, _open_probe), (deduped, _open_srcs)],
        "k", _mark_open).materialize()

    def _pages_prep(t: pa.Table) -> pa.Table:
        return pa.table({
            "k": t.column(url_col),
            "doc_id": t.column("doc_id"),
            "final": pa.nulls(t.num_rows, pa.string()),
            "hops": pa.nulls(t.num_rows, pa.int64()),
            "open": pa.nulls(t.num_rows, pa.bool_())})

    def _map_side(t: pa.Table) -> pa.Table:
        return pa.table({
            "k": t.column("src_url"),
            "doc_id": pa.nulls(t.num_rows, pa.int64()),
            "final": t.column("final"),
            "hops": t.column("hops"),
            "open": t.column("open")})

    def _finish(parts):
        pg, mp = parts
        p = pg.select(["k", "doc_id"]).to_pandas()
        m = mp.select(["k", "final", "hops", "open"]).to_pandas()
        j = p.merge(m, on="k", how="left")
        matched = j["final"].notna()
        bad = matched & (j["open"].eq(True)
                         | (j["hops"].fillna(0) > max_hops))
        final = j["final"].where(matched, j["k"]).where(~bad, None)
        hops = j["hops"].fillna(0).astype("int64").where(~bad,
                                                         max_hops)
        return pa.table({
            "doc_id": pa.array(j["doc_id"].astype("int64"),
                               pa.int64()),
            "url": pa.array(j["k"], pa.string()),
            "final_url": pa.array(final, pa.string()),
            "hops": pa.array(hops.astype("int64"), pa.int64()),
            "status": pa.array(np.where(bad, "unresolved", "ok"),
                               pa.string())})

    return copartitioned_map(
        [(pages.map_batches(lambda t: pa.table({
            "doc_id": t.column("doc_id"),
            url_col: t.column(url_col)}), batch_format="pyarrow",
            zero_copy_batch=True), _pages_prep),
         (resolved, _map_side)],
        "k", _finish)


def _dedupe_edges_ds(edges):
    """Global smallest-dst-per-src: one src-keyed co-location of the
    |edges|-bounded table."""
    from .relational import partitioned_map_groups

    return partitioned_map_groups(edges, "src_url", _dedupe_edges)


def redirect_resolution(sf_dir: str, max_hops: int = 5,
                        mode: str = "auto"):
    """ORACLED query surface: pages whose meta-refresh targets form
    closed-form chains (none / 1-hop to a terminal / 2-hop through the
    previous page / SELF-CYCLE), edges extracted by the REAL
    extract_html_alternates walk, resolution per the module spec;
    DuckDB recomputes every row closed-form."""
    import ray.data as rd

    from .relational import hash_join

    ids = rd.read_parquet(f"{sf_dir}/documents.parquet",
                          columns=["doc_id"])

    def render(batch: pa.Table) -> pa.Table:
        out_i, out_u, out_h = [], [], []
        for i in batch.column("doc_id").to_pylist():
            h = i % 50
            u = f"https://site{h}.example/r/{i}"
            c = i % 4
            if c == 1:
                tgt = f"https://site{h}.example/final/{i}"
            elif c == 2:
                tgt = (f"https://site{(i - 1) % 50}.example/r/"
                       f"{i - 1}")
            elif c == 3:
                tgt = u  # self-cycle
            else:
                tgt = None
            meta = ("" if tgt is None else
                    '<meta http-equiv="refresh" content='
                    f'"0; url={tgt}">')
            out_i.append(i)
            out_u.append(u)
            out_h.append(f"<html><head>{meta}</head><body>r {i}"
                         "</body></html>".encode())
        return pa.table({"doc_id": pa.array(out_i, pa.int64()),
                         "url": pa.array(out_u, pa.string()),
                         "html": pa.array(out_h, pa.binary())})

    from ..fixturecache import cached_ds

    pages = cached_ds(
        "redirect_pages", sf_dir,
        lambda: ids.map_batches(render, batch_format="pyarrow",
                                batch_size=512), render)
    alt = extract_html_alternates(pages)
    refresh = alt.map_batches(
        lambda t: t.filter(pc.equal(t.column("kind"),
                                    pa.scalar("refresh")))
                   .select(["doc_id", "href"]),
        batch_format="pyarrow", zero_copy_batch=True)
    edges = hash_join(
        pages.map_batches(lambda t: t.select(["doc_id", "url"]),
                          batch_format="pyarrow",
                          zero_copy_batch=True),
        refresh, on="doc_id").map_batches(
        lambda t: pa.table({"src_url": t.column("url"),
                            "dst_url": t.column("href")}),
        batch_format="pyarrow", zero_copy_batch=True)
    slim = pages.map_batches(
        lambda t: t.select(["doc_id", "url"]),
        batch_format="pyarrow", zero_copy_batch=True)
    return resolve_redirects(slim, edges, max_hops=max_hops,
                             mode=mode).sort("doc_id")


# --- registrable-domain (eTLD+1) extraction ---------------------------------
# Public-Suffix-List matching over hosts — the grouping key every
# crawl uses for politeness budgets, host-level dedup and domain
# quality priors (one registrant, one bucket; 'a.blogspot.com' and
# 'b.blogspot.com' are different sites, 'www.x.com' and 'news.x.com'
# are the same one). PSL algorithm, pinned by the oracle:
#   * normalize: lowercase, strip ONE trailing dot
#   * IPv4 literals (four all-digit labels) are their own
#     registrable domain; no suffix
#   * among rules whose labels match the host's trailing labels, an
#     EXCEPTION rule ('!www.ck') wins outright and matches one label
#     FEWER than written; otherwise the rule with the MOST labels
#     wins; '*' matches exactly one (non-empty) label; no rule
#     matches -> the implicit '*' (the bare TLD, 1 label)
#   * suffix = the matched trailing labels; registrable = suffix
#     plus one more label; a host that IS a suffix has no
#     registrable domain (kind='suffix')
# The rule set is a deterministic PSL SUBSET (no network in the
# sandbox); real deployments drop in the full publicsuffix.org list —
# the algorithm is list-size-independent and the table broadcasts
# (the full list is ~240 kB, the blocklist bound class).

PSL_RULES = (
    "com", "org", "net", "example", "io", "uk", "co.uk", "ac.uk",
    "au", "com.au", "github.io", "*.ck", "!www.ck",
)


def _psl_tables(rules=PSL_RULES):
    """rule text -> (exceptions, wildcards, plain) dicts of
    base -> matched-label-count m."""
    exc, wild, plain = {}, {}, {}
    for rule in rules:
        if rule.startswith("!"):
            exc[rule[1:]] = rule[1:].count(".")        # labels - 1
        elif rule.startswith("*."):
            wild[rule[2:]] = rule[2:].count(".") + 2   # base + 1
        else:
            plain[rule] = rule.count(".") + 1
    return exc, wild, plain


_PSL_EXC, _PSL_WILD, _PSL_PLAIN = _psl_tables()


def registrable_domain(host: str | None) -> tuple[str | None,
                                                  str | None, str]:
    """(suffix, registrable, kind) for one host under PSL_RULES.
    kind: 'ok' | 'suffix' (host IS a public suffix) | 'ip' | 'bad'
    (empty/unparseable). Never raises — hostile input is data."""
    h = (host or "").lower()
    if h.endswith("."):
        h = h[:-1]
    if not h:
        return (None, None, "bad")
    labs = h.split(".")
    if any(not lb for lb in labs):
        return (None, None, "bad")   # empty label ('..', leading '.')
    n = len(labs)
    if n == 4 and all(lb.isdigit() for lb in labs):
        return (None, h, "ip")
    m = None
    for base, mm in _PSL_EXC.items():
        if h == base or h.endswith("." + base):
            m = mm
            break
    if m is None:
        m = 1
        for base, mm in _PSL_PLAIN.items():
            if mm > m and (h == base or h.endswith("." + base)):
                m = mm
        for base, mm in _PSL_WILD.items():
            if mm > m and n >= mm and h.endswith("." + base):
                m = mm
    if n <= m:
        return (h, None, "suffix")
    return (".".join(labs[n - m:]), ".".join(labs[n - m - 1:]), "ok")


def registrable_domains(ds, host_col: str = "host"):
    """Append suffix / registrable / kind columns. Decisions run once
    per DISTINCT host in the batch (np.unique + inverse scatter) —
    hosts repeat heavily in any crawl slice, so the per-host Python
    matcher is off the per-row path; everything else is numpy.
    Zero exchanges."""

    def batch_fn(t: pa.Table) -> pa.Table:
        arr = np.asarray(t.column(host_col).to_pylist(), dtype=object)
        null_mask = np.array([h is None for h in arr], dtype=bool)
        safe = np.where(null_mask, "", arr)
        uniq, inv = np.unique(safe.astype(str), return_inverse=True)
        # a null host is structurally bad, never a 'suffix' of 'none'
        trips = [(None, None, "bad") if u == "" else
                 registrable_domain(u) for u in uniq]
        suf = np.array([x[0] for x in trips], dtype=object)[inv]
        reg = np.array([x[1] for x in trips], dtype=object)[inv]
        kind = np.array([x[2] for x in trips], dtype=object)[inv]
        return t.append_column(
            "suffix", pa.array(suf, pa.string())).append_column(
            "registrable", pa.array(reg, pa.string())).append_column(
            "kind", pa.array(kind, pa.string()))

    return ds.map_batches(batch_fn, batch_format="pyarrow",
                          zero_copy_batch=True)


def synth_psl_hosts(sf_dir: str, n: int | None = None):
    """Deterministic messy-host fixture, closed-form in doc_id, one
    class per PSL code path: plain TLD (uppercase + trailing dot),
    multi-label suffix, suffix that is itself registrable
    (github.io), wildcard '*.ck', the '!www.ck' exception, a host
    that IS a suffix, an IPv4 literal, and an unlisted TLD hitting
    the implicit-'*' fallback."""
    import ray.data as rd

    ids = rd.read_parquet(f"{sf_dir}/documents.parquet",
                          columns=["doc_id"])
    if n is not None:
        ids = ids.limit(n)

    def render(batch: pa.Table) -> pa.Table:
        hosts = []
        for i in batch.column("doc_id").to_pylist():
            c = i % 8
            if c == 0:
                hosts.append(f"www.alpha{i}.COM.")
            elif c == 1:
                hosts.append(f"a.b.beta{i}.co.uk")
            elif c == 2:
                hosts.append(f"gamma{i}.github.io")
            elif c == 3:
                hosts.append(f"x.delta{i}.ck")
            elif c == 4:
                hosts.append("www.ck")
            elif c == 5:
                hosts.append("Co.UK.")
            elif c == 6:
                hosts.append(f"192.168.{i % 256}.{(i * 7) % 256}")
            else:
                hosts.append(f"epsilon{i}.unknowntld")
        return pa.table({"doc_id": batch.column("doc_id"),
                         "host": pa.array(hosts, pa.string())})

    return _fixture_pages("synth_psl_hosts", sf_dir, ids, render,
                   batch_size=1024, n=n)


def hosts_registrable(sf_dir: str):
    """ORACLED query surface: PSL extraction over the closed-form
    messy-host fixture. The DuckDB twin rebuilds the hosts from
    doc_id and RE-RUNS the matching algorithm against the rule list
    as a VALUES table (exception priority, longest-match max,
    wildcard label arithmetic, implicit-'*' fallback, list-slice
    suffix assembly) — an independent recomputation, not an echo of
    the expected strings."""
    return registrable_domains(synth_psl_hosts(sf_dir)).sort("doc_id")


# --- domain blocklist gate (UT1 / policy-list filtering) --------------------
# Corpus curation blocks whole registrable domains (the UT1 blocklists,
# C4's badword DOMAINS, spam/SEO lists): a list entry bans the domain
# AND every subdomain. The PSL fold (registrable_domains) already maps
# each host to its eTLD+1, so the gate itself is ONE membership probe
# per distinct registrable — subdomain semantics come free.

DOMAIN_BLOCKLIST_BROADCAST_MAX = 2_000_000  # list entries


def domain_blocklist(ds, blocklist, verify: str = "auto"):
    """Append ``blocked`` (bool) to ``ds`` rows by membership of their
    ``registrable`` column in ``blocklist`` (a Dataset with a
    ``registrable`` column). NULL registrables (PSL 'suffix' rows)
    are never blocked.

    ``verify``: "broadcast" collects the distinct list once
    (8-40 B/entry) and probes map-side via one vectorized pc.is_in
    per batch; "join" pays a left-outer hash join on registrable —
    the 100 TB path when the list outgrows a broadcast (gate:
    DOMAIN_BLOCKLIST_BROADCAST_MAX); "auto" picks by list size.
    Broadcast == join equivalence is pinned in tests/test_web3.py."""
    import pyarrow.compute as pc

    distinct = blocklist.groupby("registrable").count()
    n_list = distinct.count()
    if n_list == 0:
        # empty list: nothing blocks on either plan (and Ray's hash
        # join chokes on an empty unknown-schema build side)
        return ds.map_batches(
            lambda t: t.append_column(
                "blocked", pa.array([False] * len(t), pa.bool_())),
            batch_format="pyarrow", zero_copy_batch=True)
    if verify == "auto":
        verify = ("join" if n_list
                  >= DOMAIN_BLOCKLIST_BROADCAST_MAX else "broadcast")
    if verify == "broadcast":
        import ray

        names = {r["registrable"] for r in distinct.take_all()
                 if r["registrable"] is not None}
        empty = not names
        ref = names if empty else ray.put(names)

        def probe(t: pa.Table) -> pa.Table:
            from ..broadcast import get_broadcast_derived

            if empty:
                hit = pa.array([False] * len(t), pa.bool_())
            else:
                vs = get_broadcast_derived(ref, "blset",
                                           lambda s: pa.array(sorted(s)))
                hit = pc.fill_null(
                    pc.is_in(t.column("registrable"), value_set=vs),
                    False)
            return t.append_column("blocked", hit)

        return ds.map_batches(probe, batch_format="pyarrow",
                              zero_copy_batch=True)
    if verify != "join":
        raise ValueError(f"unknown verify mode {verify!r}")
    from .relational import hash_join

    marker = distinct.map_batches(
        lambda t: pa.table({
            "registrable": t.column("registrable"),
            "_blk": pa.array([True] * len(t), pa.bool_())}),
        batch_format="pyarrow")
    joined = hash_join(ds, marker, on="registrable",
                       join_type="left_outer")

    def finish(t: pa.Table) -> pa.Table:
        blk = pc.fill_null(t.column("_blk"), False)
        return t.drop_columns(["_blk"]).append_column("blocked", blk)

    return joined.map_batches(finish, batch_format="pyarrow",
                              zero_copy_batch=True)


def hosts_blocklist(sf_dir: str, verify: str = "auto"):
    """ORACLED query surface: the UT1-style domain gate over the
    closed-form messy-host fixture, blocklist = the registrable
    domains of every 9th doc (subdomains of a listed domain block via
    the PSL fold; suffix-only hosts never block). The DuckDB twin
    re-runs the full PSL match (the SHARED CTE hosts_registrable
    composes) plus the same membership rule."""

    def keep(t: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        m = pc.and_(
            pc.equal(pc.subtract(
                t.column("doc_id"),
                pc.multiply(pc.divide(t.column("doc_id"), 9), 9)), 0),
            pc.is_valid(t.column("registrable")))
        return t.filter(m).select(["registrable"])

    tagged = registrable_domains(synth_psl_hosts(sf_dir))
    bl = tagged.map_batches(keep, batch_format="pyarrow",
                            zero_copy_batch=True)
    out = domain_blocklist(tagged, bl, verify=verify)
    return out.select_columns(
        ["doc_id", "host", "registrable", "blocked"]).sort("doc_id")


# --- URL template mining / spider-trap detection -----------------------------
# Generalize each url's path into a TEMPLATE — hex runs of >=8 chars
# first ('{h}': content hashes, session ids), then any digit run
# ('{d}': numeric ids — ordering matters, an 8-digit run is a hash
# slot, pinned by the oracle) — then count urls per (host, template).
# A template with a huge distinct-url population is a crawler trap
# (calendar pages, faceted search, session-id explosions); every
# production frontier prunes on exactly this signal.

URL_TEMPLATE_TRAP_MIN = 50

_HEX_RUN = r"[0-9a-f]{8,}"
_DIGIT_RUN = r"[0-9]+"


def url_templates(ds, url_col: str = "url",
                  trap_min: int = URL_TEMPLATE_TRAP_MIN):
    """(host, template, n, sample_url, trap) per distinct (host,
    template). host lowercased; template = path with query/fragment
    stripped, hex runs -> '{h}' then digit runs -> '{d}' (two
    vectorized RE2 passes). Engine shape: per-batch polars groupby
    pre-reduces to (host, template, partial n, partial min url) so
    the ONE grouped exchange carries |templates|-bounded partials,
    never urls; the trap flag attaches after the final fold."""

    def partial(t: pa.Table) -> pa.Table:
        import polars as pl

        df = pl.from_arrow(t.select([url_col]))
        u = pl.col(url_col)
        df = df.with_columns([
            u.str.extract(r"^[^:]+://([^/?#]*)", 1)
             .str.to_lowercase().alias("host"),
            u.str.extract(r"^[^:]+://[^/?#]*([^?#]*)", 1)
             .fill_null("").alias("_path"),
        ])
        tpl = (pl.when(pl.col("_path") == "").then(pl.lit("/"))
               .otherwise(pl.col("_path"))
               .str.replace_all(_HEX_RUN, "{h}")
               .str.replace_all(_DIGIT_RUN, "{d}"))
        df = df.with_columns(tpl.alias("template"))
        # unparseable rows (no scheme://host) -> data under host NULL
        agg = (df.group_by(["host", "template"])
                 .agg([pl.len().alias("n"),
                       pl.col(url_col).min().alias("sample_url")]))
        return agg.to_arrow().cast(pa.schema([
            ("host", pa.string()), ("template", pa.string()),
            ("n", pa.int64()), ("sample_url", pa.string())]))

    from .relational import partitioned_map_groups

    part = ds.map_batches(partial, batch_format="pyarrow",
                          zero_copy_batch=True).map_batches(
        lambda t: t.append_column(
            "_k", pc.binary_join_element_wise(
                pc.coalesce(t.column("host"), pa.scalar("")),
                t.column("template"), "\x1f")),
        batch_format="pyarrow", zero_copy_batch=True)

    def fold(p: pa.Table) -> pa.Table:
        g = p.group_by(["host", "template"]).aggregate(
            [("n", "sum"), ("sample_url", "min")])
        n = g.column("n_sum").cast(pa.int64())
        return pa.table({
            "host": g.column("host"),
            "template": g.column("template"),
            "n": n,
            "sample_url": g.column("sample_url_min"),
            "trap": pc.greater_equal(
                n, pa.scalar(trap_min, pa.int64()))})

    return partitioned_map_groups(part, "_k", fold)


def synth_template_urls(sf_dir: str, n: int | None = None):
    """Deterministic url fixture, closed-form in doc_id (urls are
    DISTINCT — the op's documented precondition is a deduplicated
    frontier): a 10-host numeric-id class (under the trap bar), a
    single-host trap class (query string on odd ids must strip), a
    hex-run class, a digit-free static-section class (under the bar)
    and a mid-token digit class."""
    import ray.data as rd

    ids = rd.read_parquet(f"{sf_dir}/documents.parquet",
                          columns=["doc_id"])
    if n is not None:
        ids = ids.limit(n)

    def render(batch: pa.Table) -> pa.Table:
        urls = []
        for i in batch.column("doc_id").to_pylist():
            c = i % 5
            if c == 0:
                urls.append(f"https://SiteA{(i // 5) % 10}"
                            f".example/product/{i}/view")
            elif c == 1:
                q = f"?ref={i % 7}" if i % 2 == 1 else ""
                urls.append(f"https://siteb.example/article/{i}{q}")
            elif c == 2:
                h = format((i * 2654435761) % (1 << 32), "08x")
                urls.append(f"https://sitec.example/page/{h}/x")
            elif c == 3:
                urls.append(f"https://sited.example/section/"
                            f"{chr(97 + i % 3)}?id={i}")
            else:
                urls.append(
                    f"https://sitee.example/mixed/a{i % 3}b/{i}")
        return pa.table({"doc_id": batch.column("doc_id"),
                         "url": pa.array(urls, pa.string())})

    return _fixture_pages("synth_template_urls", sf_dir, ids, render,
                   batch_size=1024, n=n)


def urls_templates(sf_dir: str):
    """ORACLED query surface: template mining over the closed-form
    url fixture. The DuckDB twin rebuilds the urls from doc_id and
    RE-RUNS the generalization (same two regexp_replace passes in the
    same order, query strip, host lowercase) plus the group/count/
    min/trap fold."""
    return url_templates(synth_template_urls(sf_dir)).sort(
        ["host", "template"])


# --- jump consistent hashing: stable shard assignment ------------------------
# Lamping & Veach's jump consistent hash assigns each key to one of K
# buckets such that growing K -> K+1 moves ONLY ~1/(K+1) of the keys,
# and every moved key lands in the NEW bucket — the property that
# makes partitioned 100 TB output resumable across cluster resizes
# (finished shards stay finished) and politeness sharding stable
# across frontier restarts. Deviation from the paper, pinned by the
# oracle: the jump step uses EXACT integer division
# (((b+1) << 31) // ((key >> 33) + 1)) instead of the paper's double
# multiply, so assignments are bit-reproducible across platforms and
# recomputable in SQL (HUGEINT recursive CTE).

JUMP_LCG = 2862933555777941757


def jump_bucket(key: int, buckets: int) -> int:
    """Integer-exact jump consistent hash: key (any int; taken mod
    2^64) -> bucket in [0, buckets). O(ln buckets) expected
    iterations."""
    if buckets <= 0:
        raise ValueError(f"buckets must be positive, got {buckets}")
    key %= 1 << 64
    b, j = -1, 0
    while j < buckets:
        b = j
        key = (key * JUMP_LCG + 1) % (1 << 64)
        j = ((b + 1) << 31) // ((key >> 33) + 1)
    return b


def _md5_key64(s: str) -> int:
    """Lower 64 bits (first 16 hex chars) of md5 — the key derivation
    the oracle replays as ('0x' || substr(md5(s),1,16))::UBIGINT."""
    import hashlib

    return int(hashlib.md5(s.encode("utf-8")).hexdigest()[:16], 16)


def jump_shards(ds, col: str = "host", buckets: int = 64,
                out_col: str = "shard"):
    """Append a stable shard id per row: md5-derived 64-bit key of
    ``col`` -> jump_bucket. Decisions run once per DISTINCT key per
    batch (np.unique inverse scatter — hosts/domains repeat heavily);
    zero exchanges. NULL keys shard as the empty string (a real
    frontier routes them to quarantine upstream)."""

    def batch_fn(t: pa.Table) -> pa.Table:
        arr = np.asarray(
            [v if v is not None else "" for v in
             t.column(col).to_pylist()], dtype=object)
        uniq, inv = np.unique(arr.astype(str), return_inverse=True)
        sh = np.array([jump_bucket(_md5_key64(u), buckets)
                       for u in uniq], dtype=np.int64)[inv]
        return t.append_column(out_col, pa.array(sh, pa.int64()))

    return ds.map_batches(batch_fn, batch_format="pyarrow",
                          zero_copy_batch=True)


def hosts_shard_assign(sf_dir: str, buckets: int = 64):
    """ORACLED query surface: stable shard assignment over the
    closed-form messy-host fixture. The DuckDB twin derives the same
    md5 keys and RE-RUNS the jump loop as a recursive CTE in exact
    HUGEINT arithmetic — every LCG step and integer-division jump
    recomputed, not echoed."""
    return jump_shards(synth_psl_hosts(sf_dir),
                       buckets=buckets).sort("doc_id")


# --- link-farm / SEO-network detection ---------------------------------------
# A host whose outlinks fan out to MANY distinct hosts collapsing
# into FEW registrable domains is a link farm (doorway subdomains,
# PBN networks): legitimate sites link across registrants, farms
# link across their own subdomain space. The profile composes two
# real pipelines — the DOM link walk (extract_links) and PSL
# registrable-domain extraction — and flags
#   farm := n_dst_hosts >= min_fanout AND n_dst_hosts >= ratio x
#           n_dst_domains
# in exact integer arithmetic (no float thresholds to drift).

FARM_MIN_FANOUT = 5
FARM_HOST_DOMAIN_RATIO = 3


def link_farm_profile(edges, min_fanout: int = FARM_MIN_FANOUT,
                      ratio: int = FARM_HOST_DOMAIN_RATIO):
    """DISTINCT (src_host, dst_host) edges -> per src_host:
    (n_dst_hosts, n_dst_domains, farm). Engine shape: the PSL match
    attaches dst registrable domains MAP-SIDE (zero exchanges, rule
    table static; kind != 'ok' falls back to the host itself), then
    ONE src-keyed exchange over the slim (src, dst_host, dst_domain)
    pairs with vectorized count_distinct per partition — edge volume
    is already |host pairs|-bounded by extract_links' pre-reduce."""
    from .relational import partitioned_map_groups

    tagged = registrable_domains(edges, host_col="dst_host")

    def slim(t: pa.Table) -> pa.Table:
        dom = pc.coalesce(t.column("registrable"),
                          t.column("dst_host"))
        return pa.table({"src_host": t.column("src_host"),
                         "dst_host": t.column("dst_host"),
                         "dst_domain": dom})

    slimmed = tagged.map_batches(slim, batch_format="pyarrow",
                                 zero_copy_batch=True)

    def fold(p: pa.Table) -> pa.Table:
        g = p.group_by("src_host").aggregate(
            [("dst_host", "count_distinct"),
             ("dst_domain", "count_distinct")])
        nh = g.column("dst_host_count_distinct").cast(pa.int64())
        nd = g.column("dst_domain_count_distinct").cast(pa.int64())
        farm = pc.and_(
            pc.greater_equal(nh, pa.scalar(min_fanout, pa.int64())),
            pc.greater_equal(nh, pc.multiply(
                nd, pa.scalar(ratio, pa.int64()))))
        return pa.table({"src_host": g.column("src_host"),
                         "n_dst_hosts": nh, "n_dst_domains": nd,
                         "farm": farm})

    return partitioned_map_groups(slimmed, "src_host", fold)


def synth_farm_corpus(sf_dir: str, n: int | None = None):
    """Deterministic crawl fixture with a planted farm class: page i
    lives on src{i % 20}.example; pages with i % 4 == 0 (exactly the
    src hosts with i % 20 divisible by 4, since 4 | 20) link to six
    doorway subdomains sub{0..5}.hub{i % 3}.example (many hosts, ONE
    registrable domain per hub), everyone else links to 2 + i % 2
    ordinary site{(i*7 + 11j) % 40}.example hosts (each its own
    registrant). Relative-nav and mailto noise must not edge. Edges
    are closed-form in doc_id so the DuckDB twin recomputes them."""
    import ray.data as rd

    ids = rd.read_parquet(f"{sf_dir}/documents.parquet",
                          columns=["doc_id"])
    if n is not None:
        ids = ids.limit(n)

    def render(batch: pa.Table) -> pa.Table:
        out_u, out_h = [], []
        for i in batch.column("doc_id").to_pylist():
            s = i % 20
            anchors = ['<nav><a href="/home">Home</a></nav>',
                       '<a href="mailto:x@y.example">mail</a>']
            if i % 4 == 0:
                for j in range(6):
                    anchors.append(
                        f'<a href="https://sub{j}.hub{i % 3}'
                        f'.example/x">d{j}</a>')
            else:
                for j in range(2 + i % 2):
                    t = (i * 7 + 11 * j) % 40
                    anchors.append(
                        f'<a href="https://site{t}.example/p">'
                        f'r{j}</a>')
            out_u.append(f"https://src{s}.example/p/{i}")
            out_h.append(f"<html><body><p>doc {i}</p>"
                         f"{''.join(anchors)}</body></html>".encode())
        return pa.table({"url": pa.array(out_u, pa.string()),
                         "html": pa.array(out_h, pa.binary())})

    return _fixture_pages("synth_farm_corpus", sf_dir, ids, render,
                   batch_size=256, n=n)


def hosts_link_farms(sf_dir: str):
    """ORACLED composite: link-farm profiles over the planted-farm
    crawl, through the REAL DOM link walk and the REAL PSL matcher.
    The DuckDB twin recomputes the closed-form edge set from doc_id,
    collapses dst hosts to registrable domains (last two labels —
    exact for the fixture's single-label 'example' TLD; the general
    matcher is oracled separately in hosts_registrable), and re-runs
    the integer fan-out rule."""
    return link_farm_profile(
        extract_links(synth_farm_corpus(sf_dir))).sort("src_host")


# --- mirror-site detection ----------------------------------------------------
# Two hosts serving many IDENTICAL pages are mirrors (CDN twins,
# scraped clones, www/apex splits that escaped canonicalization);
# crawls collapse them to stop paying double fetch + double dedup.
# Pages group by content hash; a hash shared by 2..star_max distinct
# hosts votes one count into each host pair; hashes on MORE than
# star_max hosts are boilerplate (empty pages, error templates) and
# are dropped as a class — the star-pattern cap that keeps pair
# volume from exploding O(hosts^2) on one hot hash. A pair with
# n_shared >= min_shared flags as a mirror (exact integer rule).

MIRROR_STAR_MAX = 4
MIRROR_MIN_SHARED = 10


def mirror_pairs(pages, host_col: str = "host",
                 text_col: str = "text",
                 star_max: int = MIRROR_STAR_MAX,
                 min_shared: int = MIRROR_MIN_SHARED):
    """(host_a, host_b, n_shared, mirror) per host pair sharing
    >= 1 eligible content hash, host_a < host_b. Engine shape: text
    md5s map-side and only slim (host, md5) pairs move; exchange 1
    co-locates by hash (global distinct + per-hash host sets + pair
    emission happen inside the partition fold — a hash's <= star_max
    pairs emit where its rows already live); exchange 2 groups the
    (a, b) votes. Text never shuffles; pair volume is bounded by
    C(star_max, 2) per distinct hash."""
    from .relational import partitioned_map_groups
    from .text import md5_hex

    def slim(t: pa.Table) -> pa.Table:
        texts = [x or "" for x in t.column(text_col).to_pylist()]
        out = pa.table({"host": t.column(host_col),
                        "h": pa.array(md5_hex(texts), pa.string())})
        return out.group_by(["host", "h"]).aggregate([])

    slimmed = pages.map_batches(slim, batch_format="pyarrow")

    def pair_fold(p: pa.Table) -> pa.Table:
        d = p.group_by(["h", "host"]).aggregate([])
        hs = np.asarray(d.column("h").to_pylist(), dtype=object)
        hosts = np.asarray(d.column("host").to_pylist(), dtype=object)
        order = np.lexsort((hosts.astype(str), hs.astype(str)))
        hs, hosts = hs[order], hosts[order]
        a_out, b_out = [], []
        i, n = 0, len(hs)
        while i < n:
            j = i
            while j < n and hs[j] == hs[i]:
                j += 1
            k = j - i
            if 2 <= k <= star_max:
                run = hosts[i:j]          # sorted within the run
                for x in range(k):
                    for y in range(x + 1, k):
                        a_out.append(run[x])
                        b_out.append(run[y])
            i = j
        return pa.table({"host_a": pa.array(a_out, pa.string()),
                         "host_b": pa.array(b_out, pa.string())})

    votes = partitioned_map_groups(slimmed, "h", pair_fold) \
        .map_batches(
            lambda t: t.append_column(
                "_k", pc.binary_join_element_wise(
                    t.column("host_a"), t.column("host_b"), "\x1f")),
            batch_format="pyarrow", zero_copy_batch=True)

    def count_fold(p: pa.Table) -> pa.Table:
        g = p.group_by(["host_a", "host_b"]).aggregate([("host_a",
                                                         "count")])
        n = g.column("host_a_count").cast(pa.int64())
        return pa.table({
            "host_a": g.column("host_a"),
            "host_b": g.column("host_b"),
            "n_shared": n,
            "mirror": pc.greater_equal(
                n, pa.scalar(min_shared, pa.int64()))})

    return partitioned_map_groups(votes, "_k", count_fold)


def synth_mirror_corpus(sf_dir: str, n: int | None = None):
    """Deterministic page fixture with planted mirrors: even docs emit
    the SAME content on alpha{(i//2) % 4}.example AND its mirror twin
    beta{(i//2) % 4}.example; odd docs emit unique content on
    solo{i % 6}.example — except every i % 10 == 9 doc, which serves
    the one BOILERPLATE string from solo{(i//10) % 6}.example so that
    all six solo hosts share it (6 > star_max: the cap must drop it,
    leaving solo hosts in NO pair). Closed-form in doc_id."""
    import ray.data as rd

    ids = rd.read_parquet(f"{sf_dir}/documents.parquet",
                          columns=["doc_id"])
    if n is not None:
        ids = ids.limit(n)

    def render(batch: pa.Table) -> pa.Table:
        hosts, texts = [], []
        for i in batch.column("doc_id").to_pylist():
            if i % 2 == 0:
                k = (i // 2) % 4
                for side in ("alpha", "beta"):
                    hosts.append(f"{side}{k}.example")
                    texts.append(f"mirrored page {i}")
            elif i % 10 == 9:
                hosts.append(f"solo{(i // 10) % 6}.example")
                texts.append("BOILERPLATE")
            else:
                hosts.append(f"solo{i % 6}.example")
                texts.append(f"unique page {i}")
        return pa.table({"host": pa.array(hosts, pa.string()),
                         "text": pa.array(texts, pa.string())})

    return _fixture_pages("synth_mirror_corpus", sf_dir, ids, render,
                   batch_size=512, n=n)


def hosts_mirror_pairs(sf_dir: str):
    """ORACLED query surface: mirror detection over the planted-twin
    fixture. Grouping by md5(text) equals grouping by text, so the
    DuckDB twin groups the closed-form pages by content directly,
    applies the SAME 2..star_max host-set band and integer
    min_shared rule, and emits the identical pair table."""
    return mirror_pairs(synth_mirror_corpus(sf_dir)).sort(
        ["host_a", "host_b"])


# --- recrawl scheduling (revisit policy) --------------------------------------
# Incremental crawls decide WHEN to refetch a url from its capture
# history: a page that changed on every visit gets a short revisit
# interval, a static page backs off. Estimator, oracle-pinned, all
# integer arithmetic:
#   n_changes   = adjacent captures (ts order, hash tie-break) whose
#                 content hash differs
#   interval_s  = clamp(span_s // max(n_changes, 1),
#                       RECRAWL_MIN_S, RECRAWL_MAX_S)
#                 (span_s = last_ts - first_ts; a single capture has
#                 span 0 -> clamps to the minimum = eager revisit,
#                 the conventional cold-start choice)
#   due_at_ts   = last_ts + interval_s

RECRAWL_MIN_S = 3600
RECRAWL_MAX_S = 30 * 86400


def recrawl_schedule(captures, url_col: str = "url",
                     ts_col: str = "ts", hash_col: str = "h",
                     min_s: int = RECRAWL_MIN_S,
                     max_s: int = RECRAWL_MAX_S):
    """(url, n_captures, n_changes, interval_s, due_at_ts) per url
    from (url, ts, content-hash) capture rows. Engine shape: ONE
    url-keyed exchange of slim triples; per partition one polars
    sort + grouped fold (shift-compare for changes) — no per-url
    Python. Content never moves; at 100 TB the hash column comes
    from the CDX index, not the payloads."""
    from .relational import partitioned_map_groups

    def slim(t: pa.Table) -> pa.Table:
        return pa.table({
            "url": t.column(url_col),
            "ts": t.column(ts_col).cast(pa.int64()),
            "h": t.column(hash_col)})

    slimmed = captures.map_batches(slim, batch_format="pyarrow",
                                   zero_copy_batch=True)

    def fold(p: pa.Table) -> pa.Table:
        import polars as pl

        df = pl.from_arrow(p).sort(["url", "ts", "h"])
        g = df.group_by("url", maintain_order=True).agg([
            pl.len().alias("n_captures"),
            (pl.col("h") != pl.col("h").shift(1))
            .fill_null(False).sum().alias("n_changes"),
            (pl.col("ts").max() - pl.col("ts").min()).alias("_span"),
            pl.col("ts").max().alias("_last"),
        ])
        g = g.with_columns(
            (pl.col("_span") //
             pl.max_horizontal(pl.col("n_changes"), pl.lit(1)))
            .clip(min_s, max_s).alias("interval_s"))
        g = g.with_columns(
            (pl.col("_last") + pl.col("interval_s"))
            .alias("due_at_ts"))
        return g.select(["url", "n_captures", "n_changes",
                         "interval_s", "due_at_ts"]).to_arrow() \
            .cast(pa.schema([("url", pa.string()),
                             ("n_captures", pa.int64()),
                             ("n_changes", pa.int64()),
                             ("interval_s", pa.int64()),
                             ("due_at_ts", pa.int64())]))

    return partitioned_map_groups(slimmed, "url", fold)


def synth_capture_history(sf_dir: str, n: int | None = None):
    """Closed-form capture history: url i gets 2 + i % 3 captures
    spaced (1 + i % 5) days apart from a fixed epoch; content changes
    every capture for i % 3 == 0, never for i % 3 == 1, every second
    capture for i % 3 == 2. Clamp probes: i % 7 == 0 urls have a
    SINGLE capture (span 0 -> the min clamp must bite) and
    i % 11 == 0 urls space 40 days apart (a static page's interval
    must hit the max clamp)."""
    import ray.data as rd

    ids = rd.read_parquet(f"{sf_dir}/documents.parquet",
                          columns=["doc_id"])
    if n is not None:
        ids = ids.limit(n)

    def render(batch: pa.Table) -> pa.Table:
        urls, tss, hs = [], [], []
        for i in batch.column("doc_id").to_pylist():
            k_n = 1 if i % 7 == 0 else 2 + i % 3
            step = 86400 * (40 if i % 11 == 0 else 1 + i % 5)
            for k in range(k_n):
                urls.append(f"https://site{i % 50}.example/p/{i}")
                tss.append(1700000000 + k * step)
                if i % 3 == 0:
                    hs.append(f"v{k}")
                elif i % 3 == 1:
                    hs.append("static")
                else:
                    hs.append(f"v{k // 2}")
        return pa.table({"url": pa.array(urls, pa.string()),
                         "ts": pa.array(tss, pa.int64()),
                         "h": pa.array(hs, pa.string())})

    return _fixture_pages("synth_capture_history", sf_dir, ids, render,
                   batch_size=512, n=n)


def urls_recrawl_schedule(sf_dir: str):
    """ORACLED query surface: the revisit-policy estimator over the
    closed-form capture history. The DuckDB twin re-runs the
    adjacent-change count as a LAG window over (ts, hash) order and
    the same integer clamp arithmetic."""
    return recrawl_schedule(synth_capture_history(sf_dir)).sort("url")


# --- domain quality prior ------------------------------------------------------
# Crawl prioritization and corpus curation both score DOMAINS, not
# pages: a registrable domain's aggregate text quality is the prior
# a frontier uses before fetching a new url from it. Composes the
# REAL PSL matcher (hosts -> registrable domains) with the REAL
# per-document quality features, folded to exact integer aggregates:
#   n_docs, sum_tokens, and uniq_ppm = 10^6 * sum_uniq // sum_tokens
# (ratio of SUMS, not mean of ratios — the convention that keeps a
# domain's score insensitive to how its text splits into docs, and
# keeps the arithmetic integer-exact).


def domain_quality_prior(sf_dir: str):
    """ORACLED composite: (domain, n_docs, sum_tokens, uniq_ppm) per
    registrable domain (kind != 'ok' hosts bucket under themselves).
    Engine shape: PSL attaches map-side over the host fixture; the
    quality features run the REAL scorer over the documents table;
    ONE doc_id-keyed hash join lines the two |docs| streams up, then
    per-batch partial sums make the final grouped exchange
    |domains|-bounded."""
    import ray.data as rd

    from .relational import hash_join, partitioned_map_groups
    from .text import quality_score_batch

    hosts = registrable_domains(synth_psl_hosts(sf_dir))

    def slim_host(t: pa.Table) -> pa.Table:
        return pa.table({
            "doc_id": t.column("doc_id"),
            "domain": pc.coalesce(t.column("registrable"),
                                  t.column("host"))})

    hosts = hosts.map_batches(slim_host, batch_format="pyarrow",
                              zero_copy_batch=True)

    feats = rd.read_parquet(f"{sf_dir}/documents.parquet",
                            columns=["doc_id", "text"]) \
        .map_batches(quality_score_batch, batch_format="pyarrow",
                     zero_copy_batch=True) \
        .map_batches(lambda t: t.select(
            ["doc_id", "n_tokens", "n_uniq"]),
            batch_format="pyarrow", zero_copy_batch=True)

    joined = hash_join(hosts, feats, on="doc_id")

    def partial(t: pa.Table) -> pa.Table:
        return t.group_by("domain").aggregate(
            [("doc_id", "count"), ("n_tokens", "sum"),
             ("n_uniq", "sum")]).rename_columns(
            ["domain", "n_docs", "sum_tokens", "sum_uniq"])

    def fold(p: pa.Table) -> pa.Table:
        g = p.group_by("domain").aggregate(
            [("n_docs", "sum"), ("n_tokens", "sum"),
             ("n_uniq", "sum")])
        toks = g.column("n_tokens_sum").cast(pa.int64())
        uniq = g.column("n_uniq_sum").cast(pa.int64())
        ppm = pc.divide(pc.multiply(
            uniq, pa.scalar(1_000_000, pa.int64())), toks)
        return pa.table({
            "domain": g.column("domain"),
            "n_docs": g.column("n_docs_sum").cast(pa.int64()),
            "sum_tokens": toks,
            "uniq_ppm": ppm})

    part = joined.map_batches(partial, batch_format="pyarrow") \
        .map_batches(lambda t: t.rename_columns(
            ["domain", "n_docs", "n_tokens", "n_uniq"]),
            batch_format="pyarrow", zero_copy_batch=True)
    return partitioned_map_groups(part, "domain", fold).sort("domain")


# --- crawl budget apportionment ------------------------------------------------
# Dividing a global fetch budget across registrable domains by
# integer weights is an APPORTIONMENT problem; the largest-remainder
# (Hamilton) method is the standard exact answer: every domain gets
# floor(B * w / W), and the B - sum(floors) leftover slots go to the
# largest remainders (ties to the lexicographically smallest domain).
# Exact integer arithmetic end to end — sum(quota) == budget ALWAYS,
# the invariant proportional-rounding schemes break.


def crawl_quota(weights, budget: int, domain_col: str = "domain",
                weight_col: str = "weight"):
    """(domain, weight) Dataset -> (domain, weight, quota). Engine
    shape: W and leftover are two scalar aggregates (8 bytes each to
    the driver); base/remainder attach map-side with W broadcast; the
    leftover ranking is ONE total-order sort via global_row_number
    (blocks never leave the object store). Raises on int64 overflow
    risk (budget * max_weight)."""
    from .relational import global_row_number

    # pin the |domains|-bounded weight table ONCE: the two scalar
    # aggregates, the base/rem map and the ranking sort would each
    # re-execute the whole (lazy) upstream otherwise — measured 4x
    # the pipeline cost in the bench before this materialize
    weights = weights.materialize()
    total = weights.sum(weight_col)
    if total is None or total <= 0:
        raise ValueError("total weight must be positive")
    wmax = weights.max(weight_col)
    if budget * wmax >= (1 << 62):
        raise ValueError(
            f"budget * max weight {budget * wmax} risks int64 "
            "overflow; rescale weights")

    def attach(t: pa.Table) -> pa.Table:
        w = t.column(weight_col).cast(pa.int64())
        prod = pc.multiply(w, pa.scalar(budget, pa.int64()))
        base = pc.divide(prod, pa.scalar(total, pa.int64()))
        rem = pc.subtract(prod, pc.multiply(
            base, pa.scalar(total, pa.int64())))
        return pa.table({
            "domain": t.column(domain_col),
            "weight": w, "_base": base, "_rem": rem})

    tagged = weights.map_batches(attach, batch_format="pyarrow",
                                 zero_copy_batch=True).materialize()
    leftover = budget - tagged.sum("_base")
    ranked = global_row_number(tagged, ["_rem", "domain"],
                               descending=[True, False])

    def finish(t: pa.Table) -> pa.Table:
        extra = pc.less_equal(t.column("rn"),
                              pa.scalar(leftover, pa.int64()))
        return pa.table({
            "domain": t.column("domain"),
            "weight": t.column("weight"),
            "quota": pc.add(t.column("_base"),
                            pc.cast(extra, pa.int64()))})

    return ranked.map_batches(finish, batch_format="pyarrow",
                              zero_copy_batch=True)


def domain_crawl_quota(sf_dir: str, budget: int = 100_000):
    """ORACLED composite: Hamilton apportionment of a fetch budget
    over the domain quality prior's token weights (three real
    pipelines deep: PSL -> quality features -> prior -> quota). The
    DuckDB twin recomputes base/remainder with window SUMs and the
    leftover ranking with ROW_NUMBER over (rem DESC, domain)."""

    def slim(t: pa.Table) -> pa.Table:
        return pa.table({"domain": t.column("domain"),
                         "weight": t.column("sum_tokens")})

    w = domain_quality_prior(sf_dir).map_batches(
        slim, batch_format="pyarrow", zero_copy_batch=True)
    return crawl_quota(w, budget).sort("domain")


# --- translation-pair mining (bitext prep) ------------------------------------
# hreflang clusters are the highest-precision signal for parallel
# text on the web: a page listing alternates for k languages asserts
# k mutually-translated urls. Pair mining turns each page's alternate
# set into unordered (lang_a, url_a, lang_b, url_b) candidates — the
# input every bitext pipeline (ParaCrawl/CCMatrix-style) starts from
# before alignment scoring.


def translation_pairs(alts, id_col: str = "doc_id"):
    """Alternate rows (doc_id, kind, lang, href) -> one row per
    unordered language pair per page, lang_a < lang_b. Engine shape:
    hreflang rows filter map-side, ONE doc-keyed exchange, then a
    vectorized per-partition pass (sort + run detection; pair loops
    bounded by a page's alternate count). Pair volume is
    C(k,2)-bounded per page — k is the page's language count, single
    digits in practice."""
    from .relational import partitioned_map_groups

    def keep(t: pa.Table) -> pa.Table:
        m = pc.equal(t.column("kind"), pa.scalar("alternate"))
        return t.filter(m).select([id_col, "lang", "href"])

    slim = alts.map_batches(keep, batch_format="pyarrow",
                            zero_copy_batch=True)

    def fold(p: pa.Table) -> pa.Table:
        ids = np.asarray(p.column(id_col).to_pylist(), dtype=np.int64)
        langs = np.asarray(p.column("lang").to_pylist(), dtype=object)
        hrefs = np.asarray(p.column("href").to_pylist(), dtype=object)
        order = np.lexsort((langs.astype(str), ids))
        ids, langs, hrefs = ids[order], langs[order], hrefs[order]
        o_id, o_la, o_ua, o_lb, o_ub = [], [], [], [], []
        i, n = 0, len(ids)
        while i < n:
            j = i
            while j < n and ids[j] == ids[i]:
                j += 1
            for x in range(i, j):
                for y in range(x + 1, j):
                    if langs[x] == langs[y]:
                        continue  # duplicate-language rows pair not
                    o_id.append(ids[x])
                    o_la.append(langs[x])
                    o_ua.append(hrefs[x])
                    o_lb.append(langs[y])
                    o_ub.append(hrefs[y])
            i = j
        return pa.table({
            "doc_id": pa.array(o_id, pa.int64()),
            "lang_a": pa.array(o_la, pa.string()),
            "url_a": pa.array(o_ua, pa.string()),
            "lang_b": pa.array(o_lb, pa.string()),
            "url_b": pa.array(o_ub, pa.string())})

    return partitioned_map_groups(slim, id_col, fold)


def docs_translation_pairs(sf_dir: str):
    """ORACLED query surface: translation-pair mining over the SAME
    page fixture html_alternates parses (uppercase hreflang tags, a
    meta-refresh that must NOT pair), through the REAL DOM alternate
    walk. The DuckDB twin rebuilds the alternate table closed-form
    and generates pairs with a lang-ordered self-join."""
    import ray.data as rd

    ids = rd.read_parquet(f"{sf_dir}/documents.parquet",
                          columns=["doc_id"])
    langs = ["en", "de", "fr"]

    def render(batch: pa.Table) -> pa.Table:
        out_i, out_h = [], []
        for i in batch.column("doc_id").to_pylist():
            h = i % 50
            links = "".join(
                f'<link rel="Alternate" hreflang="{langs[k].upper()}"'
                f' href="https://site{h}.example/{langs[k]}/p/{i}">'
                for k in range(1 + i % 3))
            if i % 11 == 7:
                links += ('<meta http-equiv="Refresh" content='
                          f'"5; URL=\'https://site{h}.example/new/'
                          f"{i}'\">")
            out_i.append(i)
            out_h.append(f"<html><head>{links}</head><body>doc {i}"
                         "</body></html>".encode())
        return pa.table({"doc_id": pa.array(out_i, pa.int64()),
                         "html": pa.array(out_h, pa.binary())})

    pages = _fixture_pages("docs_translation_pairs", sf_dir, ids, render,
                   batch_size=512)
    return translation_pairs(extract_html_alternates(pages)).sort(
        ["doc_id", "lang_a", "lang_b"])


# --- link reciprocity -----------------------------------------------------------
# Mutual linking is a classic spam/collusion signal (link exchanges,
# PBN rings reciprocate; editorial links rarely do) and also feeds
# graph symmetrization decisions. Per source host: outdegree,
# reciprocated outdegree (the target links back), and the ratio in
# ppm (integer — 10^6 * n_recip // n_out).


def link_reciprocity(edges):
    """DISTINCT (src_host, dst_host) edges -> (host, n_out, n_recip,
    recip_ppm). Engine shape: each unordered pair co-locates ONCE
    (key = min\\x1fmax), both directions meet in the same partition
    where the reciprocal flag is a vectorized run test; then one
    src-keyed exchange folds |hosts|-bounded partials."""
    from .relational import partitioned_map_groups

    def tag(t: pa.Table) -> pa.Table:
        lo = pc.min_element_wise(t.column("src_host"),
                                 t.column("dst_host"))
        hi = pc.max_element_wise(t.column("src_host"),
                                 t.column("dst_host"))
        return pa.table({
            "src_host": t.column("src_host"),
            "dst_host": t.column("dst_host"),
            "_k": pc.binary_join_element_wise(lo, hi, "\x1f")})

    tagged = edges.map_batches(tag, batch_format="pyarrow",
                               zero_copy_batch=True)

    def pair_fold(p: pa.Table) -> pa.Table:
        ks = np.asarray(p.column("_k").to_pylist(), dtype=object)
        src = np.asarray(p.column("src_host").to_pylist(),
                         dtype=object)
        order = np.argsort(ks.astype(str), kind="stable")
        ks, src = ks[order], src[order]
        # a pair key appearing twice = both directions present
        # (edges are distinct, so counts are exactly 1 or 2)
        n = len(ks)
        recip = np.zeros(n, dtype=bool)
        if n > 1:
            same_prev = ks[1:] == ks[:-1]
            recip[1:] |= same_prev
            recip[:-1] |= same_prev
        return pa.table({
            "host": pa.array(src, pa.string()),
            "recip": pa.array(recip, pa.bool_())})

    flags = partitioned_map_groups(tagged, "_k", pair_fold)

    def partial(t: pa.Table) -> pa.Table:
        g = t.group_by("host").aggregate(
            [("recip", "count"), ("recip", "sum")])
        return pa.table({
            "host": g.column("host"),
            "n_out": g.column("recip_count").cast(pa.int64()),
            "n_recip": g.column("recip_sum").cast(pa.int64())})

    part = flags.map_batches(partial, batch_format="pyarrow")

    def fold(p: pa.Table) -> pa.Table:
        g = p.group_by("host").aggregate(
            [("n_out", "sum"), ("n_recip", "sum")])
        out = g.column("n_out_sum").cast(pa.int64())
        rec = g.column("n_recip_sum").cast(pa.int64())
        ppm = pc.divide(pc.multiply(
            rec, pa.scalar(1_000_000, pa.int64())), out)
        return pa.table({"host": g.column("host"), "n_out": out,
                         "n_recip": rec, "recip_ppm": ppm})

    return partitioned_map_groups(part, "host", fold)


def domain_reciprocity(sf_dir: str):
    """ORACLED composite: reciprocity over the SAME crawl fixture as
    domain_link_edges, through the REAL DOM link walk. The DuckDB
    twin recomputes the closed-form edge set and the reverse-edge
    test with a self-join."""
    return link_reciprocity(
        extract_links(synth_link_corpus(sf_dir))).sort("host")


# --- soft-404 / template-page detection ----------------------------------------
# Pages that return 200 but serve the site's error/placeholder
# template poison extraction corpora and waste crawl budget. The
# signal is WITHIN-host content duplication: a content hash carried
# by many urls of the SAME host is a template (error page, empty
# search result, login wall) — cross-host duplication is mirroring,
# a different op. Rule, oracle-pinned: a (host, hash) group flags
# when n_copies >= min_copies; share_ppm = 10^6 * n_copies //
# n_docs(host) rides along for policy tuning.

SOFT404_MIN_COPIES = 4


def soft404_templates(pages, host_col: str = "host",
                      text_col: str = "text",
                      min_copies: int = SOFT404_MIN_COPIES):
    """(host, template_md5, n_copies, n_docs, share_ppm) per flagged
    within-host template. Engine shape: texts md5 map-side, slim
    (host, md5) pairs make ONE host-keyed exchange; per partition the
    per-hash counts and the host totals are two vectorized groupbys
    — text never shuffles."""
    from .relational import partitioned_map_groups
    from .text import md5_hex

    def slim(t: pa.Table) -> pa.Table:
        texts = [x or "" for x in t.column(text_col).to_pylist()]
        return pa.table({"host": t.column(host_col),
                         "h": pa.array(md5_hex(texts), pa.string())})

    slimmed = pages.map_batches(slim, batch_format="pyarrow")

    def fold(p: pa.Table) -> pa.Table:
        g = p.group_by(["host", "h"]).aggregate([("h", "count")])
        tot = p.group_by("host").aggregate([("h", "count")])
        tmap = dict(zip(tot.column("host").to_pylist(),
                        tot.column("h_count").to_pylist()))
        n = g.column("h_count").cast(pa.int64())
        keep = pc.greater_equal(
            n, pa.scalar(min_copies, pa.int64()))
        g = pa.table({"host": g.column("host"),
                      "template_md5": g.column("h"),
                      "n_copies": n}).filter(keep)
        hosts = g.column("host").to_pylist()
        nd = pa.array([tmap[x] for x in hosts], pa.int64())
        return pa.table({
            "host": g.column("host"),
            "template_md5": g.column("template_md5"),
            "n_copies": g.column("n_copies"),
            "n_docs": nd,
            "share_ppm": pc.divide(pc.multiply(
                g.column("n_copies"),
                pa.scalar(1_000_000, pa.int64())), nd)})

    return partitioned_map_groups(slimmed, "host", fold)


def hosts_soft404(sf_dir: str):
    """ORACLED query surface: template detection over a closed-form
    corpus — per-host error templates on every 7th doc (copy counts
    straddle the min_copies bar host by host, exercising both arms)
    plus a GLOBAL boilerplate string spread thinly across hosts that
    must NOT flag (per-host counts stay under the bar — grouping is
    per host, not global). DuckDB recomputes counts and md5s
    closed-form."""
    import ray.data as rd

    ids = rd.read_parquet(f"{sf_dir}/documents.parquet",
                          columns=["doc_id"])

    def render(batch: pa.Table) -> pa.Table:
        hosts, texts = [], []
        for i in batch.column("doc_id").to_pylist():
            hosts.append(f"h{i % 20}.example")
            if i % 7 == 0:
                texts.append(f"error template of h{i % 20}")
            elif i % 9 == 8:
                texts.append("GLOBAL BOILER")
            else:
                texts.append(f"content {i}")
        return pa.table({"host": pa.array(hosts, pa.string()),
                         "text": pa.array(texts, pa.string())})

    pages = _fixture_pages("hosts_soft404", sf_dir, ids, render,
                   batch_size=512)
    return soft404_templates(pages).sort(["host", "template_md5"])


# --- sitemap-vs-crawl coverage audit --------------------------------------------
# The reconciliation every crawl ops team runs: urls the site
# DECLARES (sitemaps) vs urls the crawl CAPTURED (the CDX). The
# symmetric difference is actionable both ways — sitemap_only urls
# are fetch gaps (blocked, erroring, budget-starved), crawled_only
# urls are discovery the site doesn't declare (or sitemap rot).


def coverage_audit(sitemap_urls, crawl_urls, url_col: str = "url"):
    """Two url Datasets -> (url, in_sitemap, in_crawl, status) via
    ONE full-outer hash join of slim distinct url columns; status in
    ('both', 'sitemap_only', 'crawled_only'). Engine shape: each side
    pre-reduces to distinct urls in-batch, the join exchanges only
    url strings."""
    from .relational import hash_join

    def distinct(ds, flag):
        def f(t: pa.Table) -> pa.Table:
            g = t.select([url_col]).group_by(url_col).aggregate([])
            return g.append_column(
                flag, pa.array([1] * g.num_rows, pa.int64()))
        return ds.map_batches(f, batch_format="pyarrow")

    s = distinct(sitemap_urls, "_s")
    c = distinct(crawl_urls, "_c").map_batches(
        lambda t: t.rename_columns(["url_r", "_c"]),
        batch_format="pyarrow", zero_copy_batch=True)
    j = hash_join(s, c, on=url_col, right_on="url_r",
                  join_type="full_outer")

    def finish(t: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        cols = t.column_names
        url = pc.coalesce(t.column(url_col),
                          t.column("url_r")) if "url_r" in cols \
            else t.column(url_col)
        in_s = pc.is_valid(t.column("_s"))
        in_c = pc.is_valid(t.column("_c"))
        status = pc.if_else(
            pc.and_(in_s, in_c), pa.scalar("both"),
            pc.if_else(in_s, pa.scalar("sitemap_only"),
                       pa.scalar("crawled_only")))
        return pa.table({"url": url, "in_sitemap": in_s,
                         "in_crawl": in_c, "status": status})

    return j.map_batches(finish, batch_format="pyarrow",
                         zero_copy_batch=True)


def crawl_coverage(sf_dir: str):
    """ORACLED composite: the audit over two REAL sources — per-host
    sitemap XML (listing only doc_id % 3 != 0, parsed back by the
    soup parser) vs the CDX of a WARC snapshot containing only
    doc_id % 5 != 1 (real framing walk). Both symmetric-difference
    arms are populated; docs failing both filters appear nowhere.
    DuckDB recomputes membership closed-form."""
    import os

    import pyarrow.parquet as pq
    import ray.data as rd

    from .relational import partitioned_map_groups
    from .warc import build_cdx, build_warc

    ids = rd.read_parquet(f"{sf_dir}/documents.parquet",
                          columns=["doc_id"])

    # sitemap side: per-host XML rendered in one co-location, parsed
    # back by the REAL parser
    def add_host(t: pa.Table) -> pa.Table:
        h = t.column("doc_id").to_numpy() % 50
        return t.append_column("host_id", pa.array(h, pa.int64()))

    def render_parse(part: pa.Table) -> pa.Table:
        hid = part.column("host_id").to_numpy()
        did = part.column("doc_id").to_numpy()
        order = np.lexsort((did, hid))
        hid, did = hid[order], did[order]
        starts = np.flatnonzero(np.r_[True, hid[1:] != hid[:-1]])
        urls = []
        for k, st in enumerate(starts):
            en = starts[k + 1] if k + 1 < len(starts) else len(hid)
            h = int(hid[st])
            rows = "".join(
                f"<url><loc>https://site{h}.example/p/{int(i)}</loc>"
                "</url>"
                for i in did[st:en] if int(i) % 3 != 0)
            xml = ('<?xml version="1.0"?><urlset>' + rows
                   + "</urlset>")
            urls.extend(e["loc"] for e in parse_sitemap(xml))
        return pa.table({"url": pa.array(urls, pa.string())})

    smaps = partitioned_map_groups(
        ids.map_batches(add_host, batch_format="pyarrow",
                        zero_copy_batch=True),
        "host_id", render_parse)

    # crawl side: a WARC snapshot of the doc_id % 5 != 1 subset,
    # indexed by the REAL CDX walk
    out_dir = (f"/tmp/webxtract_warc_cov_"
               f"{sf_dir.replace('/', '_')}")
    os.makedirs(out_dir, exist_ok=True)
    files = 4
    expect = [os.path.join(out_dir, f"crawl-{i:05d}.warc")
              for i in range(files)]
    if not all(os.path.exists(p) for p in expect):
        t = pq.read_table(f"{sf_dir}/documents.parquet",
                          columns=["doc_id"])
        buckets: list[list] = [[] for _ in range(files)]
        for i in t.column("doc_id").to_pylist():
            if i % 5 == 1:
                continue
            buckets[i % files].append(
                (f"https://site{i % 50}.example/p/{i}",
                 f"2024-01-{1 + i % 28:02d}T00:00:00Z",
                 f"<html>{i}</html>".encode()))
        for fi, recs in enumerate(buckets):
            with open(expect[fi] + ".tmp", "wb") as f:
                f.write(build_warc(recs))
            os.replace(expect[fi] + ".tmp", expect[fi])
    crawled = build_cdx(out_dir).map_batches(
        lambda t: t.select(["url"]), batch_format="pyarrow",
        zero_copy_batch=True)

    return coverage_audit(smaps, crawled).sort("url")


# --- percent-encoding normalization ---------------------------------------------
# RFC 3986 §6.2.2.2: escapes of UNRESERVED characters
# (ALPHA / DIGIT / '-' / '.' / '_' / '~') are equivalent to the
# character itself and normalizers MUST decode them — '%41bc' and
# 'Abc' are the same url and must dedup together. Escapes of
# reserved characters (%2F, %3F ...) change meaning and MUST stay;
# malformed escapes (%ZZ, trailing %) pass through as data. Spec
# pinned to SINGLE-PASS replace semantics in fixed table order:
# decoding never creates a '%' character, but a stray '%' abutting
# a decoded escape can form a new escape ('%%341' -> '%41', test-
# pinned) — deterministic, and identical on both sides because the
# oracle's replace chain is GENERATED from the same character
# table in the same order.

UNRESERVED = (
    "ABCDEFGHIJKLMNOPQRSTUVWXYZabcdefghijklmnopqrstuvwxyz"
    "0123456789-._~")

_PCT_PATTERNS = [
    (f"(?:%{b:02X}|%{b:02x})".replace("%", "%"), chr(b))
    for b in (ord(c) for c in UNRESERVED)]


def percent_normalize(urls: list) -> list:
    """Decode unreserved percent-escapes (both hex cases) in each
    url; everything else byte-identical."""
    import re

    pats = [(re.compile(p), c) for p, c in _PCT_PATTERNS]

    def one(u):
        if u is None or "%" not in u:
            return u
        for rx, c in pats:
            u = rx.sub(c, u)
        return u

    return [one(u) for u in urls]


def percent_normalize_stage(ds, url_col: str = "url",
                            out_col: str = "url_norm"):
    """Append the normalized url. Batch shape: one '%' prefilter per
    batch (clean batches never enter the per-url loop), decisions
    once per DISTINCT url (np.unique inverse scatter); zero
    exchanges."""

    def batch_fn(t: pa.Table) -> pa.Table:
        arr = np.asarray(t.column(url_col).to_pylist(), dtype=object)
        has = pc.match_substring(t.column(url_col), "%")
        if not pc.any(has).as_py():
            return t.append_column(out_col, t.column(url_col))
        null_mask = np.array([u is None for u in arr], dtype=bool)
        safe = np.where(null_mask, "", arr)
        uniq, inv = np.unique(safe.astype(str), return_inverse=True)
        normed = np.array(percent_normalize(list(uniq)),
                          dtype=object)[inv]
        normed[null_mask] = None  # null in -> null out, never 'None'
        return t.append_column(out_col,
                               pa.array(normed, pa.string()))

    return ds.map_batches(batch_fn, batch_format="pyarrow",
                          zero_copy_batch=True)


def urls_percent_normalize(sf_dir: str):
    """ORACLED query surface over a closed-form escape fixture:
    unreserved escapes in both hex cases (must decode), reserved
    %2F/%3D (must stay), malformed %ZZ and a trailing '%' (data),
    and an escape-free class (the prefilter path). The DuckDB twin
    applies the GENERATED replace chain — same character table, same
    order."""
    import ray.data as rd

    ids = rd.read_parquet(f"{sf_dir}/documents.parquet",
                          columns=["doc_id"])

    def render(batch: pa.Table) -> pa.Table:
        urls = []
        for i in batch.column("doc_id").to_pylist():
            c = i % 5
            if c == 0:
                urls.append(f"https://a.example/%41bc/%7e{i}")
            elif c == 1:
                urls.append(f"https://a.example/p%2Fq%3D{i}")
            elif c == 2:
                urls.append(f"https://a.example/%ZZ{i}%")
            elif c == 3:
                urls.append(f"https://a.example/%4a%6F%31{i}")
            else:
                urls.append(f"https://a.example/plain/{i}")
        return pa.table({"doc_id": batch.column("doc_id"),
                         "url": pa.array(urls, pa.string())})

    ds = _fixture_pages("urls_percent_normalize", sf_dir, ids, render,
                   batch_size=1024)
    return percent_normalize_stage(ds).sort("doc_id")


# --- throttle backoff (politeness reaction) --------------------------------------
# Crawlers must REACT to 429 Too Many Requests / 503 Service
# Unavailable: each throttle response doubles the host's effective
# delay (exponential backoff, capped). Pinned integer rule:
#   level  = min(n_throttle, BACKOFF_MAX_LEVEL)
#   delay  = base_ms << level   (base 1000 ms, the politeness floor)
# The |hosts|-bounded plan then feeds the same scheduler budget path
# as Crawl-delay.

BACKOFF_MAX_LEVEL = 6


def throttle_backoff(fetches, host_col: str = "host",
                     status_col: str = "status",
                     base_ms: int = 1000,
                     max_level: int = BACKOFF_MAX_LEVEL):
    """(host, n_fetches, n_throttle, level, delay_ms) per host from
    fetch-status rows. Engine shape: per-batch (host, count,
    throttle-count) partials pre-reduce map-side, ONE
    |hosts|-bounded grouped exchange, vectorized shift arithmetic."""
    from .relational import partitioned_map_groups

    def partial(t: pa.Table) -> pa.Table:
        st = t.column(status_col)
        thr = pc.or_(pc.equal(st, pa.scalar(429, pa.int64())),
                     pc.equal(st, pa.scalar(503, pa.int64())))
        g = pa.table({
            "host": t.column(host_col),
            "_n": pa.array([1] * t.num_rows, pa.int64()),
            "_t": pc.cast(thr, pa.int64()),
        }).group_by("host").aggregate([("_n", "sum"), ("_t", "sum")])
        return g.rename_columns(["host", "n", "t"])

    part = fetches.map_batches(partial, batch_format="pyarrow")

    def fold(p: pa.Table) -> pa.Table:
        g = p.group_by("host").aggregate([("n", "sum"), ("t", "sum")])
        n = g.column("n_sum").cast(pa.int64())
        t_ = g.column("t_sum").cast(pa.int64())
        lvl = pc.min_element_wise(
            t_, pa.scalar(max_level, pa.int64()))
        delay = pc.shift_left(pa.array([base_ms] * len(lvl),
                                       pa.int64()), lvl)
        return pa.table({"host": g.column("host"), "n_fetches": n,
                         "n_throttle": t_, "level": lvl,
                         "delay_ms": delay})

    return partitioned_map_groups(part, "host", fold)


def hosts_backoff(sf_dir: str):
    """ORACLED query surface: backoff plans over a closed-form fetch
    log where host h's wave w returns 429 when (h + w) % 7 == 0, 503
    when (h + 2*w) % 11 == 0, else 200 — throttle counts vary per
    host and straddle the level cap. DuckDB recomputes counts and the
    shift arithmetic closed-form."""
    import ray.data as rd

    ids = rd.read_parquet(f"{sf_dir}/documents.parquet",
                          columns=["doc_id"])

    def render(batch: pa.Table) -> pa.Table:
        i = batch.column("doc_id").to_numpy(zero_copy_only=False)
        h = i % 50
        w = i // 50
        status = np.where((h + w) % 7 == 0, 429,
                          np.where((h + 2 * w) % 11 == 0, 503, 200))
        return pa.table({
            "host": pa.array([f"site{x}.example" for x in h],
                             pa.string()),
            "status": pa.array(status, pa.int64())})

    return throttle_backoff(
        _fixture_pages("hosts_backoff", sf_dir, ids, render,
                   batch_size=1024)).sort("host")


# --- shard write plan ------------------------------------------------------------
# Resumable partitioned output needs a PLAN before the write: which
# stable shard each row lands in (jump hash, so cluster resizes keep
# finished shards finished) and how many rows/bytes each shard will
# carry (so stragglers are visible before they happen). This is the
# manifest the checkpointed writer consumes.


def shard_write_plan(sf_dir: str, buckets: int = 64):
    """ORACLED composite: jump shards over the PSL host fixture
    joined to the documents' REAL n_chars column, folded to
    (shard, n_docs, sum_chars). Engine shape: shard assignment is
    map-side; ONE doc_id-keyed hash join lines hosts x sizes up;
    per-batch partial sums make the final grouped exchange
    |shards|-bounded."""
    import ray.data as rd

    from .relational import hash_join, partitioned_map_groups

    hosts = jump_shards(synth_psl_hosts(sf_dir), buckets=buckets)

    def slim(t: pa.Table) -> pa.Table:
        return t.select(["doc_id", "shard"])

    hosts = hosts.map_batches(slim, batch_format="pyarrow",
                              zero_copy_batch=True)
    sizes = rd.read_parquet(f"{sf_dir}/documents.parquet",
                            columns=["doc_id", "n_chars"])
    joined = hash_join(hosts, sizes, on="doc_id")

    def partial(t: pa.Table) -> pa.Table:
        g = t.group_by("shard").aggregate(
            [("doc_id", "count"), ("n_chars", "sum")])
        return g.rename_columns(["shard", "n_docs", "sum_chars"])

    part = joined.map_batches(partial, batch_format="pyarrow")

    def fold(p: pa.Table) -> pa.Table:
        g = p.group_by("shard").aggregate(
            [("n_docs", "sum"), ("sum_chars", "sum")])
        return pa.table({
            "shard": g.column("shard"),
            "n_docs": g.column("n_docs_sum").cast(pa.int64()),
            "sum_chars": g.column("sum_chars_sum").cast(pa.int64())})

    return partitioned_map_groups(part, "shard", fold).sort("shard")


# --- hreflang return-tag audit ---------------------------------------------------
# hreflang annotations are only honored when RECIPROCATED: if page A
# lists B as an alternate but B does not list A back, search engines
# drop the pair (the "return tag" rule) and bitext miners inherit a
# one-sided, lower-precision signal. The audit emits every directed
# alternate edge with its return-tag status.


def return_tag_audit(alts, pages_urls, id_col: str = "doc_id",
                     url_col: str = "url"):
    """Alternate rows (doc_id, kind, lang, href) + the (doc_id, url)
    page map -> (src_url, dst_url, lang, has_return) per directed
    hreflang edge. Engine shape: the page map attaches by ONE
    doc_id-keyed hash join; each unordered url pair then co-locates
    ONCE (min-max key) where the reverse-edge test is a vectorized
    membership probe — html never moves."""
    from .relational import hash_join, partitioned_map_groups

    def keep(t: pa.Table) -> pa.Table:
        m = pc.equal(t.column("kind"), pa.scalar("alternate"))
        return t.filter(m).select([id_col, "lang", "href"])

    slim = alts.map_batches(keep, batch_format="pyarrow",
                            zero_copy_batch=True)
    joined = hash_join(slim, pages_urls, on=id_col)

    def tag(t: pa.Table) -> pa.Table:
        lo = pc.min_element_wise(t.column(url_col),
                                 t.column("href"))
        hi = pc.max_element_wise(t.column(url_col),
                                 t.column("href"))
        return pa.table({
            "src_url": t.column(url_col),
            "dst_url": t.column("href"),
            "lang": t.column("lang"),
            "_k": pc.binary_join_element_wise(lo, hi, "\x1f")})

    tagged = joined.map_batches(tag, batch_format="pyarrow",
                                zero_copy_batch=True)

    def fold(p: pa.Table) -> pa.Table:
        src = np.asarray(p.column("src_url").to_pylist(),
                         dtype=object)
        dst = np.asarray(p.column("dst_url").to_pylist(),
                         dtype=object)
        fwd = {(a, b) for a, b in zip(src, dst)}
        has = [(b, a) in fwd for a, b in zip(src, dst)]
        return pa.table({
            "src_url": p.column("src_url"),
            "dst_url": p.column("dst_url"),
            "lang": p.column("lang"),
            "has_return": pa.array(has, pa.bool_())})

    return partitioned_map_groups(tagged, "_k", fold)


def hreflang_return_tags(sf_dir: str):
    """ORACLED query surface: pages pair up (2k, 2k+1); page 2k
    always lists its partner, the partner lists back EXCEPT when
    k % 3 == 0 (the planted omission) — so forward edges into
    omitting partners flag has_return = false while every backward
    edge's reverse exists. Through the REAL DOM alternate walk;
    DuckDB recomputes edges and the reverse test closed-form."""
    import ray.data as rd

    ids = rd.read_parquet(f"{sf_dir}/documents.parquet",
                          columns=["doc_id"])

    def render(batch: pa.Table) -> pa.Table:
        out_i, out_u, out_h = [], [], []
        for i in batch.column("doc_id").to_pylist():
            k = i // 2
            partner = i + 1 if i % 2 == 0 else i - 1
            mine = f"https://x.example/p/{i}"
            theirs = f"https://x.example/p/{partner}"
            lang = "en" if i % 2 == 0 else "de"
            plang = "de" if i % 2 == 0 else "en"
            if i % 2 == 0 or k % 3 != 0:
                links = (f'<link rel="alternate" hreflang="{plang}"'
                         f' href="{theirs}">')
            else:
                links = ""  # the planted return-tag omission
            out_i.append(i)
            out_u.append(mine)
            out_h.append(f"<html><head>{links}</head><body>p{i}"
                         f" {lang}</body></html>".encode())
        return pa.table({"doc_id": pa.array(out_i, pa.int64()),
                         "url": pa.array(out_u, pa.string()),
                         "html": pa.array(out_h, pa.binary())})

    pages = _fixture_pages("hreflang_return_tags", sf_dir, ids, render,
                   batch_size=512)
    alts = extract_html_alternates(pages)
    urls = pages.map_batches(
        lambda t: t.select(["doc_id", "url"]),
        batch_format="pyarrow", zero_copy_batch=True)
    return return_tag_audit(alts, urls).sort(
        ["src_url", "dst_url"])


# --- anchor rel semantics (nofollow / ugc / sponsored) ---------------------------
# Modern link graphs weight edges by the anchor's rel tokens:
# rel=nofollow (no endorsement), rel=ugc (user-generated) and
# rel=sponsored (paid) anchors are excluded or down-weighted before
# PageRank-style propagation. rel is a space-separated, ASCII
# case-insensitive token SET (HTML spec) — 'NoFollow sponsored'
# carries both tokens; 'nofollowx' carries neither.

REL_TOKENS = ("nofollow", "ugc", "sponsored")


def _iter_anchor_rels(node):
    """Yield (href, rel-token-set) for every <a href> in the tree
    (iterative walk, tag-soup safe)."""
    stack = [node]
    while stack:
        n = stack.pop()
        if isinstance(n, str):
            continue
        if n.tag == "a":
            h = n.attrs.get("href")
            if h is not None:
                rel = (n.attrs.get("rel") or "").lower().split()
                yield h, set(rel)
        stack.extend(n.children)


def anchor_rel_stats(pages, id_col: str = "doc_id",
                     html_col: str = "html"):
    """Per page: n_anchors (href-bearing), n_nofollow, n_ugc,
    n_sponsored, n_followed (no excluding token at all). Map-side
    DOM walk, zero exchanges."""

    def batch_fn(t: pa.Table) -> pa.Table:
        from ..htmldom import decode_bytes, parse_html

        ids, na, nf, nu, ns, fo = [], [], [], [], [], []
        for i, raw in zip(t.column(id_col).to_pylist(),
                          t.column(html_col).to_pylist()):
            text = raw if isinstance(raw, str) else decode_bytes(raw)
            a = f = u = s = good = 0
            for _, rel in _iter_anchor_rels(parse_html(text or "")):
                a += 1
                hit = False
                if "nofollow" in rel:
                    f += 1
                    hit = True
                if "ugc" in rel:
                    u += 1
                    hit = True
                if "sponsored" in rel:
                    s += 1
                    hit = True
                if not hit:
                    good += 1
            ids.append(i)
            na.append(a)
            nf.append(f)
            nu.append(u)
            ns.append(s)
            fo.append(good)
        return pa.table({
            "doc_id": pa.array(ids, pa.int64()),
            "n_anchors": pa.array(na, pa.int64()),
            "n_nofollow": pa.array(nf, pa.int64()),
            "n_ugc": pa.array(nu, pa.int64()),
            "n_sponsored": pa.array(ns, pa.int64()),
            "n_followed": pa.array(fo, pa.int64())})

    return pages.map_batches(batch_fn, batch_format="pyarrow",
                             zero_copy_batch=True)


def pages_anchor_rels(sf_dir: str):
    """ORACLED query surface: rel-token accounting over a closed-form
    anchor fixture — plain anchors, UPPERCASE 'NoFollow', the
    multi-token 'ugc sponsored' (counts in BOTH columns but only once
    against followed), the non-token 'nofollowx' (counts followed),
    and an href-less <a> that must not count at all. DuckDB
    recomputes every count closed-form."""
    import ray.data as rd

    ids = rd.read_parquet(f"{sf_dir}/documents.parquet",
                          columns=["doc_id"])

    def render(batch: pa.Table) -> pa.Table:
        out_i, out_h = [], []
        for i in batch.column("doc_id").to_pylist():
            parts = ['<a href="/plain1">x</a>',
                     '<a href="/plain2">y</a>']
            if i % 2 == 0:
                parts.append('<a href="/nf" rel="NoFollow">n</a>')
            if i % 3 == 0:
                parts.append(
                    '<a href="/us" rel="ugc sponsored">us</a>')
            if i % 5 == 0:
                parts.append('<a href="/nx" rel="nofollowx">k</a>')
            parts.append("<a>no href</a>")
            out_i.append(i)
            out_h.append(f"<html><body>{''.join(parts)}"
                         "</body></html>".encode())
        return pa.table({"doc_id": pa.array(out_i, pa.int64()),
                         "html": pa.array(out_h, pa.binary())})

    pages = _fixture_pages("pages_anchor_rels", sf_dir, ids, render,
                   batch_size=512)
    return anchor_rel_stats(pages).sort("doc_id")
