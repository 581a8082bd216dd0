"""Exact dedup by url — latest ``warc_ts`` wins (D1).

Generalizes the reference's drafted content-key idempotency token
(textract-integration/fn-call-textract/main.py:73-75) and the client's
"drop events older than the last seen timestamp" recency rule
(SmartOCR.vue:255-257) into a batch operator: one row per url, the row
with the greatest warc_ts; ties broken by descending html bytes so the
result is fully content-deterministic under any shuffle.

Scale note: this is ONE hash shuffle on the partition key ``url``
(SURVEY.md §7.3) — the only all-to-all exchange in the ingest path.
Groups are tiny (dup rate ~3%), so `map_groups` per-group work is O(1).
"""

from __future__ import annotations

import pyarrow as pa
import pyarrow.compute as pc


def _latest_per_group(group: pa.Table) -> pa.Table:
    if group.num_rows == 1:
        return group
    # stable total order: (warc_ts desc, html desc) -> take first
    idx = pc.sort_indices(
        group,
        sort_keys=[("warc_ts", "descending"), ("html", "descending")],
    )
    return group.take(idx[:1])


def dedup_pages(ds):
    """ray.data.Dataset[PAGES] -> one row per url (latest warc_ts)."""
    return ds.groupby("url").map_groups(_latest_per_group, batch_format="pyarrow")


def dedup_table(t: pa.Table) -> pa.Table:
    """Single-table (oracle/test) variant with identical semantics."""
    idx = pc.sort_indices(
        t, sort_keys=[("url", "ascending"), ("warc_ts", "descending"),
                      ("html", "descending")]
    )
    t = t.take(idx)
    urls = t.column("url").to_pylist()
    keep = [i for i, u in enumerate(urls) if i == 0 or u != urls[i - 1]]
    return t.take(pa.array(keep, pa.int64()))
