"""Arrow schemas for every stage boundary.

The reference passes an implicit, growing JSON record between stages
(reference ``source/ocr/README.md:43-87``); we replace that with fixed,
declared pyarrow schemas per stage boundary so byte-identical
verification and DuckDB-oracle checks are possible (SURVEY.md §1.3).
"""

from __future__ import annotations

import pyarrow as pa

# ---------------------------------------------------------------------------
# Input: Common-Crawl-style pages table (authoritative shape from
# BASELINE.json input_hint).
# ---------------------------------------------------------------------------
PAGES = pa.schema(
    [
        ("url", pa.string()),          # primary key after dedup
        ("warc_ts", pa.timestamp("us")),
        ("html", pa.binary()),         # raw page bytes (the "document artifact")
        ("text", pa.string()),         # crawl-provided plain text (never a golden)
        ("lang", pa.string()),
    ]
)

# ---------------------------------------------------------------------------
# Block IR — our Textract-`Blocks`-like intermediate representation
# (reference consumes `Blocks` at postprocessing/fn-postprocess/main.py:49;
# kv fields via the textract-trp object graph). One list<struct> column.
# ---------------------------------------------------------------------------
BLOCK = pa.struct(
    [
        ("block_type", pa.string()),   # "LINE" | "KV" | "TABLE_CELL"
        ("text", pa.string()),
        ("confidence", pa.float64()),  # 0-100, like Textract
        ("page", pa.int32()),
        ("reading_order", pa.int32()),
        ("key_text", pa.string()),     # KV only, else null
        ("value_text", pa.string()),
        ("key_conf", pa.float64()),
        ("value_conf", pa.float64()),
        ("row", pa.int32()),           # TABLE_CELL only
        ("col", pa.int32()),
    ]
)
BLOCKS = pa.list_(BLOCK)

# Alternatives: ranked runner-up candidates, mirroring the reference's
# {"Confidence": float, "Value": str} shape
# (postprocessing/fn-postprocess/main.py:143-148).
CANDIDATE = pa.struct([("confidence", pa.float64()), ("value", pa.string())])

# ---------------------------------------------------------------------------
# Normalized output — one row per url (FIXTURES.md §4).
# ---------------------------------------------------------------------------
MODEL_RESULT = pa.schema(
    [
        ("url", pa.string()),
        ("warc_ts", pa.timestamp("us")),
        ("lang", pa.string()),
        ("extracted_text", pa.string()),  # byte-identical golden per url
        ("vendor_value", pa.string()),
        ("vendor_conf", pa.float64()),
        ("date_value", pa.string()),
        ("date_conf", pa.float64()),
        ("total_value", pa.string()),
        ("total_conf", pa.float64()),
        ("model_confidence", pa.float64()),  # row-min of the three (SURVEY M13)
        ("route", pa.string()),           # "auto" | "review" | "rejected"
        ("reject_reason", pa.string()),   # null unless rejected
        ("alt_date", pa.list_(CANDIDATE)),
        ("alt_total", pa.list_(CANDIDATE)),
    ]
)

# ---------------------------------------------------------------------------
# Review side tables (FIXTURES.md §5; reference human-review/*).
# ---------------------------------------------------------------------------
REVIEW_TASK = pa.schema(
    [
        ("task_id", pa.string()),      # deterministic (M16 replacement)
        ("url", pa.string()),
        ("date_value", pa.string()),
        ("date_conf", pa.float64()),
        ("total_value", pa.string()),
        ("total_conf", pa.float64()),
        ("vendor_value", pa.string()),
        ("vendor_conf", pa.float64()),
        ("model_confidence", pa.float64()),
    ]
)

REVIEWS = pa.schema(
    [
        ("url", pa.string()),
        ("date", pa.string()),
        ("total", pa.string()),
        ("vendor", pa.string()),
        ("worker_id", pa.string()),
        ("answered_ts", pa.timestamp("us")),
    ]
)

# Final coalesced output (M18): review values override model values.
FINAL_RESULT = pa.schema(
    [
        ("url", pa.string()),
        ("extracted_text", pa.string()),
        ("vendor_value", pa.string()),
        ("vendor_conf", pa.float64()),
        ("date_value", pa.string()),
        ("date_conf", pa.float64()),
        ("total_value", pa.string()),
        ("total_conf", pa.float64()),
        ("model_confidence", pa.float64()),
        ("route", pa.string()),        # "auto" | "reviewed" | "pending" | "rejected"
        ("reviewer", pa.string()),     # worker_id when reviewed, else null
    ]
)

# ---------------------------------------------------------------------------
# Checkpoint / lineage manifest (FIXTURES.md §6; replaces the reference's
# DynamoDB ownership table, template.sam.yml:633-646).
# ---------------------------------------------------------------------------
MANIFEST = pa.schema(
    [
        ("partition_id", pa.int32()),
        ("input_fingerprint", pa.string()),
        ("rows_in", pa.int64()),
        ("rows_out", pa.int64()),
        ("rejected", pa.int64()),
        ("reviewed", pa.int64()),
        ("status", pa.string()),       # "done" | "failed"
        ("wall_ms", pa.int64()),
        ("created_at", pa.timestamp("us")),
    ]
)

# Per-stage metrics rows (replaces the reference's notification events,
# ui-notifications/fn-notify-progress/main.py:69-78).
METRICS = pa.schema(
    [
        ("stage", pa.string()),
        ("partition_id", pa.int32()),
        ("rows_in", pa.int64()),
        ("rows_out", pa.int64()),
        ("bytes_in", pa.int64()),
        ("wall_ms", pa.int64()),
    ]
)


def empty_table(schema: pa.Schema) -> pa.Table:
    """An empty table with the given schema (for degenerate branches)."""
    return schema.empty_table()
