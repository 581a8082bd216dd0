"""Synthesized pages corpora, cached under /tmp (TESTDATA.md maps the
driver's sf levels; the pages table itself is ours to synthesize —
FIXTURES.md §7)."""

from __future__ import annotations

import os

_CACHE_ROOT = os.environ.get("WEBXTRACT_CACHE", "/tmp/webxtract_pages")

# driver sf dir -> pages row count (FIXTURES.md: t1 smoke ~1k,
# correctness ~10k, bench ~600k — large enough that parallel compute,
# not fixed pipeline overhead, dominates the scaling measurement)
SF_ROWS = {"sf0.001": 1_000, "sf0.01": 10_000, "sf0.1": 600_000}


def pages_path(sf_rows: int, seed: int = 42) -> str:
    """Materialize (once) and return the parquet dir for an sf_rows corpus."""
    out_dir = os.path.join(_CACHE_ROOT, f"n{sf_rows}_s{seed}")
    marker = os.path.join(out_dir, "_DONE")
    if not os.path.exists(marker):
        from .synth import write_pages_parquet

        write_pages_parquet(out_dir, sf_rows, seed=seed)
        with open(marker, "w") as f:
            f.write("ok")
    return out_dir


def pages_dataset(sf_rows: int, seed: int = 42, columns: list[str] | None = None):
    import ray.data as rd

    return rd.read_parquet(pages_path(sf_rows, seed), columns=columns)


def rows_for_sf_dir(sf_dir: str) -> int:
    base = os.path.basename(os.path.normpath(sf_dir))
    return SF_ROWS.get(base, 10_000)
