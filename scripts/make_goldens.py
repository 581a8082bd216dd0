"""Generate + freeze golden fixtures (SURVEY.md §5.2).

Run once (and only deliberately after a semantics change):
    python scripts/make_goldens.py

Writes tests/data/golden_pages_1k.parquet (the extraction result of the
single-threaded oracle path over the deterministic 1000-doc corpus).
Tests then assert the Ray pipeline reproduces it byte-for-byte.
"""

from __future__ import annotations

import os
import sys

import pyarrow.parquet as pq

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

from webxtract import pipeline, synth  # noqa: E402

OUT = os.path.join(os.path.dirname(__file__), "..", "tests", "data")


def main() -> None:
    os.makedirs(OUT, exist_ok=True)
    pages = synth.make_pages(1000, seed=42)
    result = pipeline.extract_table(pages)
    path = os.path.join(OUT, "golden_pages_1k.parquet")
    pq.write_table(result, path, compression="zstd")
    print(f"wrote {path}: {result.num_rows} rows")


if __name__ == "__main__":
    main()
