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
