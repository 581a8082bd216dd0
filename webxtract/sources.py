"""Sources & sinks beyond the parquet corpus (SURVEY.md §2.1).

  * pages_from_files (S2): a directory of raw page files -> the pages
    schema via ray.data.read_binary_files (path -> url, bytes -> html;
    warc_ts from file mtime is forbidden — wall-clock nondeterminism —
    so it is a constant unless a sidecar provides real crawl times).
  * write_results (S3/S5): partitioned parquet sink; one directory per
    route so downstream consumers (review queue, rejected audit) read
    only their slice — and a failed run can be resumed per partition
    (checkpoint.py is the fuller machinery).
"""

from __future__ import annotations

import pyarrow as pa

from .synth import EPOCH_US


def pages_from_files(path: str, lang: str = "und"):
    """Directory/glob of raw page files -> Dataset with the PAGES schema."""
    import ray.data as rd

    ds = rd.read_binary_files(path, include_paths=True)

    def to_pages(batch: pa.Table) -> pa.Table:
        paths = batch.column("path").to_pylist()
        data = batch.column("bytes")
        n = len(paths)
        return pa.table({
            "url": pa.array([f"file://{p}" for p in paths], pa.string()),
            "warc_ts": pa.array([EPOCH_US] * n, pa.timestamp("us")),
            "html": data,
            "text": pa.array([""] * n, pa.string()),
            "lang": pa.array([lang] * n, pa.string()),
        })

    return ds.map_batches(to_pages, batch_format="pyarrow", zero_copy_batch=True)


def write_results(ds, out_dir: str):
    """Partitioned sink: results parquet split by route directory.

    Filtering per route re-executes the upstream pipeline per branch;
    callers writing all three routes should write once un-partitioned
    (checkpoint.run_partitioned) or materialize first. This helper is
    the simple single-route-consumer path."""
    for route in ("auto", "review", "rejected"):
        sub = ds.filter(expr=f"route == '{route}'")
        sub.write_parquet(f"{out_dir}/route={route}")
    return out_dir
