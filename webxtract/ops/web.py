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

    Scale shape: per-batch Arrow group_by partials (one row per domain
    per batch — the exchange is |domains|-bounded, html bytes never
    shuffle), grouped Sum finals, then a distinct-url count over a slim
    (domain, url) projection pre-deduped in-batch."""
    from ray.data.aggregate import Sum

    def partial(t: pa.Table) -> pa.Table:
        t = extract_domain(t, url_col)
        cols = {"domain": t.column("domain"),
                "n": pa.array([1] * t.num_rows, pa.int64())}
        if size_col is not None:
            cols["payload"] = pc.binary_length(
                t.column(size_col)).cast(pa.int64())
        g = pa.table(cols).group_by("domain").aggregate(
            [("n", "sum")] + ([("payload", "sum")] if size_col else []))
        out = {"domain": g.column("domain"),
               "n_pages": g.column("n_sum")}
        if size_col is not None:
            out["payload_bytes"] = g.column("payload_sum")
        return pa.table(out)

    agg_spec = [Sum("n_pages", alias_name="n_pages")]
    if size_col is not None:
        agg_spec.append(Sum("payload_bytes", alias_name="payload_bytes"))
    per_dom = ds.map_batches(partial, batch_format="pyarrow",
                             zero_copy_batch=True) \
        .groupby("domain").aggregate(*agg_spec)

    def url_partial(t: pa.Table) -> pa.Table:
        t = extract_domain(t, url_col)
        slim = pa.table({"domain": t.column("domain"),
                         "url": t.column(url_col)})
        # in-batch distinct before the exchange
        return slim.group_by(["domain", "url"]).aggregate([])

    from ray.data.aggregate import Count

    distinct_urls = ds.map_batches(url_partial, batch_format="pyarrow",
                                   zero_copy_batch=True) \
        .groupby(["domain", "url"]).aggregate(Count(alias_name="_c")) \
        .groupby("domain").aggregate(Count(alias_name="n_urls"))

    from .relational import BroadcastJoin, broadcast_lookup

    urls_ref = broadcast_lookup(distinct_urls, "domain", ["n_urls"])

    def attach(t: pa.Table) -> pa.Table:
        return BroadcastJoin(urls_ref, "domain", ["n_urls"])(t)

    return per_dom.map_batches(attach, batch_format="pyarrow") \
        .sort(["n_pages", "domain"], descending=[True, False]).limit(k)


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
