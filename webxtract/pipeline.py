"""Stage DAG builder — the Ray-Data-native pipeline (SURVEY.md §3, §7.3).

Replaces the reference's Step Functions state machine
(source/ocr/StateMachine.asl.json:1-88) with a lazily-built, streaming
``ray.data.Dataset`` chain:

    read_parquet(pages)
      -> [dedup by url]                 (one hash shuffle, D1)
      -> map_batches(QualityGate)       (stateless tasks, M2-M4)
      -> map_batches(Extractor, ...)    (stateful actor pool, M5/T5)
      -> map_batches(normalize_batch)   (stateless, M6-M13)
      -> map_batches(add_route)         (M14)
      -> [map_batches(CoalesceReviews)] (broadcast join J2 + M18)
      -> write_parquet / iter_batches

Rejection and review are DATA (a ``route`` column), not control flow, so
one streaming pass covers all three ASL terminal states. All batch
interfaces are zero-copy Arrow.
"""

from __future__ import annotations

from dataclasses import dataclass, field

import pyarrow as pa

from . import schema as S
from .blocks import extracted_text_from_blocks, html_to_blocks
from .htmldom import decode_bytes
from .normalize import EMPTY_RESULT, normalize_doc
from .pdflayout import layout_to_blocks
from .quality import QualityGate
from .review import CoalesceReviews, add_route


@dataclass
class PipelineConfig:
    """One config object replacing the reference's env-var/SSM/per-request
    resolution chain (M19; preprocessing/fn-preprocess/main.py:54-66)."""

    min_bytes: int = 64
    max_bytes: int = 65_536
    # batch sizing: html blobs are KB-scale; keep batch x blob bounded
    # (SURVEY.md §7.4 skew note). 256 rows x 64KB cap = <=16MB per batch.
    gate_batch_size: int = 1024
    extract_batch_size: int = 256
    normalize_batch_size: int = 1024
    # actor pool bounds for the extractor; None -> (1, available CPUs)
    extract_concurrency: tuple[int, int] | int | None = None
    dedup: bool = True

    def resolved_concurrency(self) -> tuple[int, int] | int:
        if self.extract_concurrency is not None:
            return self.extract_concurrency
        try:
            import ray

            if ray.is_initialized():
                cpus = int(ray.cluster_resources().get("CPU", 8))
                return (1, max(2, cpus))
        except Exception:
            pass
        return (1, 8)


class Extractor:
    """Stateful structure-extraction actor (M5/T5): the from-scratch
    replacement for the Textract analyze_document call
    (textract-integration/fn-call-textract/main.py:52-61).

    Parser state (compiled regexes, tag-policy tables) is built once per
    actor in ``__init__`` and amortized across batches; ``__call__`` does
    the per-batch work. The parse itself is inherently per-document — that
    loop IS the useful compute (like batched model inference), everything
    around it stays Arrow.
    """

    def __init__(self) -> None:
        # touch the modules so regex compilation / table construction
        # happens once per actor, not per batch
        from . import blocks as _b  # noqa: F401
        from . import boilerplate as _bp  # noqa: F401
        from . import pdflayout as _p  # noqa: F401

    def __call__(self, batch: pa.Table) -> pa.Table:
        htmls = batch.column("html")
        kinds = batch.column("doc_kind").to_pylist()
        labels = batch.column("quality_label").to_pylist()
        n = len(kinds)
        all_blocks: list[list[dict]] = []
        texts: list[str] = []
        for i in range(n):
            if labels[i] != "good":
                all_blocks.append([])
                texts.append("")
                continue
            raw = htmls[i].as_py()
            try:
                if kinds[i] == "pdfish":
                    blocks = layout_to_blocks(raw.decode("utf-8", "replace"))
                else:
                    decoded = decode_bytes(raw)
                    blocks = html_to_blocks(decoded) if decoded is not None else []
            except Exception:
                blocks = []  # poison row -> empty doc, never a task failure
            all_blocks.append(blocks)
            texts.append(extracted_text_from_blocks(blocks))
        out = batch.drop_columns(["html"])  # blobs stop here: shrink in-flight data
        out = out.append_column("blocks", pa.array(all_blocks, S.BLOCKS))
        out = out.append_column("extracted_text", pa.array(texts, pa.string()))
        return out


def normalize_batch(batch: pa.Table) -> pa.Table:
    """Stateless batch UDF applying the byte-exact normalizers (M6-M13)."""
    blocks_col = batch.column("blocks").to_pylist()
    res = [normalize_doc(b) if b else EMPTY_RESULT for b in blocks_col]
    out = batch.drop_columns(["blocks"])
    out = out.append_column("vendor_value", pa.array([r["vendor_value"] for r in res], pa.string()))
    out = out.append_column("vendor_conf", pa.array([r["vendor_conf"] for r in res], pa.float64()))
    out = out.append_column("date_value", pa.array([r["date_value"] for r in res], pa.string()))
    out = out.append_column("date_conf", pa.array([r["date_conf"] for r in res], pa.float64()))
    out = out.append_column("total_value", pa.array([r["total_value"] for r in res], pa.string()))
    out = out.append_column("total_conf", pa.array([r["total_conf"] for r in res], pa.float64()))
    out = out.append_column("model_confidence", pa.array([r["model_confidence"] for r in res], pa.float64()))
    out = out.append_column("alt_date", pa.array([r["alt_date"] for r in res], pa.list_(S.CANDIDATE)))
    out = out.append_column("alt_total", pa.array([r["alt_total"] for r in res], pa.list_(S.CANDIDATE)))
    return out


_RESULT_COLS = [f.name for f in S.MODEL_RESULT]


def _project_result(batch: pa.Table) -> pa.Table:
    return batch.select(_RESULT_COLS)


def read_pages(path: str, columns: list[str] | None = None):
    """Source S1: parquet pages corpus. Column pruning at the read."""
    import ray.data as rd

    return rd.read_parquet(path, columns=columns)


def extract_pipeline(ds, cfg: PipelineConfig | None = None):
    """pages Dataset -> MODEL_RESULT Dataset (lazy; no materialization)."""
    cfg = cfg or PipelineConfig()
    if cfg.dedup:
        from .dedup import dedup_pages

        ds = dedup_pages(ds)
    ds = ds.map_batches(
        QualityGate(cfg.min_bytes, cfg.max_bytes),
        batch_format="pyarrow", batch_size=cfg.gate_batch_size,
        zero_copy_batch=True,
    )
    ds = ds.map_batches(
        Extractor,
        batch_format="pyarrow", batch_size=cfg.extract_batch_size,
        concurrency=cfg.resolved_concurrency(), num_cpus=1,
        zero_copy_batch=True,
    )
    ds = ds.map_batches(
        normalize_batch, batch_format="pyarrow",
        batch_size=cfg.normalize_batch_size, zero_copy_batch=True,
    )
    ds = ds.map_batches(add_route, batch_format="pyarrow", zero_copy_batch=True)
    ds = ds.map_batches(_project_result, batch_format="pyarrow", zero_copy_batch=True)
    return ds


def full_pipeline(ds, reviews: pa.Table | None = None,
                  cfg: PipelineConfig | None = None):
    """pages -> FINAL_RESULT, with the review join-back when reviews exist."""
    import ray

    from .review import reviews_to_dict

    results = extract_pipeline(ds, cfg)
    lookup = reviews_to_dict(reviews) if reviews is not None else {}
    ref = ray.put(lookup)
    return results.map_batches(
        CoalesceReviews, fn_constructor_args=(ref,),
        batch_format="pyarrow", concurrency=(1, 4), zero_copy_batch=True,
    )


def extract_table(pages: pa.Table, cfg: PipelineConfig | None = None) -> pa.Table:
    """Single-process reference path: identical semantics without Ray.

    Used to generate goldens and in property tests (parallelism invariance:
    Ray output at any block count must equal this)."""
    cfg = cfg or PipelineConfig()
    from .dedup import dedup_table

    if cfg.dedup:
        pages = dedup_table(pages)
    batch = QualityGate(cfg.min_bytes, cfg.max_bytes)(pages)
    batch = Extractor()(batch)
    batch = normalize_batch(batch)
    batch = add_route(batch)
    return _project_result(batch)
