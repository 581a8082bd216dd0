"""Stage DAG builder — the Ray-Data-native pipeline (SURVEY.md §3, §7.3).

Replaces the reference's Step Functions state machine
(source/ocr/StateMachine.asl.json:1-88) with a lazily-built, streaming
``ray.data.Dataset`` chain:

    read_parquet(pages)
      -> [dedup by url]                 (pruned-projection shuffle, D1)
      -> map_batches(QualityGate)       (stateless tasks, M2-M4)
      -> map_batches(Extractor, ...)    (stateful actor pool, M5/T5;
                                         normalizers M6-M13 fused in)
      -> map_batches(add_route)         (M14)
      -> [map_batches(CoalesceReviews)] (broadcast join J2 + M18)
      -> write_parquet / iter_batches

Rejection and review are DATA (a ``route`` column), not control flow, so
one streaming pass covers all three ASL terminal states. All batch
interfaces are zero-copy Arrow.

Performance note (measured at sf0.1, 32 cpus): the normalizers are fused
INTO the extractor actor so the Block IR never round-trips through
Arrow on the hot path (dict -> Arrow -> dict cost ~0.3 ms/doc, ~40% of
stage time); set ``emit_blocks=True`` to materialize the ``blocks``
column instead (API/debug path) with normalize_batch as a separate
stage — both paths produce byte-identical results (tested).
"""

from __future__ import annotations

from dataclasses import dataclass

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
    extract_batch_size: int = 1024  # swept 256-2048 at sf0.1/32cpu: flat
    normalize_batch_size: int = 1024  # within noise; 1024 marginally best
    # Extractor scheduling. Default is an elastic TASK pool with lazy
    # per-worker-process parser state (measured 2-4x faster than an actor
    # pool at sf0.1/32cpus: 8s vs 19-34s — actor pools pay pool-startup +
    # per-batch dispatch overhead that only amortizes for heavy state).
    # Set use_actor_pool=True for stages whose state is genuinely
    # expensive to build (models, large indexes) — that is the pattern
    # actor pools exist for.
    extract_use_actors: bool = False
    extract_concurrency: tuple[int, int] | int | None = None
    dedup: bool = True
    exact_dedup: bool = False   # True: full-row groupby dedup (any ties)
    # True: winner filter via hash-partitioned LEFT join instead of the
    # broadcast dup table — for corpora whose dup-winner list outgrows
    # the object store (the 10^12-row path; equivalence-tested)
    dedup_join: bool = False
    emit_blocks: bool = False   # True: materialize the blocks column
    # Skew-aware batching (SURVEY §4.2): when set, rows with
    # len(html) > skew_split_bytes are routed through a dedicated
    # small-batch path so one giant blob cannot blow a worker's heap
    # (batch_size counts ROWS; 512 rows x 1MB = 512MB without this).
    # Only meaningful when max_bytes admits large documents.
    skew_split_bytes: int | None = None
    big_batch_size: int = 16
    instrument: bool = False    # record per-stage counters (metrics.py)
    # Enhancement plugin slot (SURVEY §2.10): the reference's
    # pre-processing contract returns a *possibly modified* artifact so
    # enhancement stages can slot in (preprocessing/fn-preprocess/
    # main.py:126-128, preprocessing/README.md:20). Each enhancer is a
    # batch fn (pa.Table -> pa.Table) applied before the gate/extractor
    # and may rewrite the html column.
    enhancers: tuple = ()

    def resolved_concurrency(self) -> tuple[int, int] | int:
        if self.extract_concurrency is not None:
            return self.extract_concurrency
        try:
            import ray

            if ray.is_initialized():
                cpus = int(ray.cluster_resources().get("CPU", 8))
                # autoscaling pool with a floor: a FIXED pool reserving
                # every logical CPU wedges the streaming executor
                # (observed: 4-cpu session, pool of 4 -> deadlock) and
                # pre-starting a large fixed pool dominates short jobs;
                # (2, cpus-2) starts fast and ramps to the machine.
                return (2, max(2, cpus - 2))
        except Exception:
            pass
        return (2, 8)


def _paras_to_blocks(paras: list[str]) -> list[dict]:
    """Office flow text -> one LINE block per paragraph in document
    order (no geometry channel in flow formats)."""
    return [{
        "block_type": "LINE", "text": t, "confidence": 100.0,
        "page": 0, "reading_order": k,
        "key_text": None, "value_text": None,
        "key_conf": None, "value_conf": None,
        "row": None, "col": None,
    } for k, t in enumerate(paras) if t]


def _doc_blocks(raw: bytes | None, kind: str) -> list[dict]:
    try:
        if kind == "pdfish":
            return layout_to_blocks(raw.decode("utf-8", "replace"))
        if kind == "pdf":
            # real PDF bytes -> the same Block IR through the identical
            # grouping/XY-cut machinery (ops/pdf.py content interpreter)
            from .ops.pdf import pdf_blocks

            return pdf_blocks(raw)
        if kind == "docx":
            # office ZIP package: DOCX first, then the ODT fallback
            # (both are PK-sniffed; the part layout disambiguates)
            from .ops.docx import docx_paragraphs

            try:
                return _paras_to_blocks(docx_paragraphs(raw))
            except Exception:
                from .ops.office import odt_paragraphs

                return _paras_to_blocks(odt_paragraphs(raw))
        if kind == "rtf":
            from .ops.office import rtf_text

            return _paras_to_blocks(rtf_text(raw))
        decoded = decode_bytes(raw)
        return html_to_blocks(decoded) if decoded is not None else []
    except Exception:
        return []  # poison row -> empty doc, never a task failure


_RESULT_FIELDS = [
    ("vendor_value", pa.string()), ("vendor_conf", pa.float64()),
    ("date_value", pa.string()), ("date_conf", pa.float64()),
    ("total_value", pa.string()), ("total_conf", pa.float64()),
    ("model_confidence", pa.float64()),
]


class Extractor:
    """Stateful structure-extraction actor (M5/T5): the from-scratch
    replacement for the Textract analyze_document call
    (textract-integration/fn-call-textract/main.py:52-61).

    Parser state (compiled regexes, tag-policy tables) is built once per
    actor in ``__init__`` and amortized across batches; ``__call__`` does
    the per-batch work. The parse itself is inherently per-document — that
    loop IS the useful compute (like batched model inference), everything
    around it stays Arrow. Normalizers (M6-M13) run fused on the
    in-memory Block dicts unless ``emit_blocks`` asks for the IR column.
    """

    def __init__(self, emit_blocks: bool = False, min_bytes: int = 64,
                 max_bytes: int = 65_536) -> None:
        self.emit_blocks = emit_blocks
        self.min_bytes = min_bytes
        self.max_bytes = max_bytes
        # touch the modules so regex compilation / table construction
        # happens once per actor, not per batch
        from . import blocks as _b  # noqa: F401
        from . import boilerplate as _bp  # noqa: F401
        from . import pdflayout as _p  # noqa: F401
        from .ops import pdf as _pdf  # noqa: F401

    def __call__(self, batch: pa.Table) -> pa.Table:
        # bulk-convert once per batch (a per-row .as_py() loop pays a
        # python-call + buffer-slice per blob)
        htmls = batch.column("html").to_pylist()
        if "quality_label" not in batch.column_names:
            # fused gate (M1-M4): validate + classify on the SAME python
            # blobs so the multi-KB html column is converted exactly once.
            # M1: a null key is a malformed record -> rejected DATA row
            # (the reference's KeyError -> MalformedRequest,
            # preprocessing/fn-preprocess/main.py:48-52), never an abort.
            from .quality import score_page

            urls = batch.column("url").to_pylist()
            n = len(htmls)
            labels = [None] * n
            confs = [0.0] * n
            reasons = [None] * n
            kinds = [None] * n
            for i in range(n):
                if urls[i] is None:
                    labels[i], confs[i], reasons[i], kinds[i] = (
                        "bad", 99.0, "malformed", "raw")
                    continue
                labels[i], confs[i], reasons[i], kinds[i] = score_page(
                    htmls[i], self.min_bytes, self.max_bytes)
            batch = batch.append_column("quality_label", pa.array(labels, pa.string()))
            batch = batch.append_column("quality_conf", pa.array(confs, pa.float64()))
            batch = batch.append_column("reject_reason", pa.array(reasons, pa.string()))
            batch = batch.append_column("doc_kind", pa.array(kinds, pa.string()))
        else:
            kinds = batch.column("doc_kind").to_pylist()
            labels = batch.column("quality_label").to_pylist()
        n = len(kinds)
        texts: list[str] = []
        all_blocks: list[list[dict]] = []
        results: list[dict] = []
        for i in range(n):
            if labels[i] != "good":
                blocks: list[dict] = []
            else:
                blocks = _doc_blocks(htmls[i], kinds[i])
            texts.append(extracted_text_from_blocks(blocks) if blocks else "")
            results.append(normalize_doc(blocks) if blocks else EMPTY_RESULT)
            if self.emit_blocks:
                all_blocks.append(blocks)
        out = batch.drop_columns(["html"])  # blobs stop here
        out = out.append_column("extracted_text", pa.array(texts, pa.string()))
        if self.emit_blocks:
            out = out.append_column("blocks", pa.array(all_blocks, S.BLOCKS))
        for name, typ in _RESULT_FIELDS:
            out = out.append_column(
                name, pa.array([r[name] for r in results], typ))
        out = out.append_column(
            "alt_date", pa.array([r["alt_date"] for r in results],
                                 pa.list_(S.CANDIDATE)))
        out = out.append_column(
            "alt_total", pa.array([r["alt_total"] for r in results],
                                  pa.list_(S.CANDIDATE)))
        return out


def normalize_batch(batch: pa.Table) -> pa.Table:
    """Standalone normalizer stage (M6-M13) for the emit_blocks path:
    consumes the blocks column, appends the model-result columns."""
    blocks_col = batch.column("blocks").to_pylist()
    res = [normalize_doc(b) if b else EMPTY_RESULT for b in blocks_col]
    out = batch.drop_columns(["blocks"])
    for name, typ in _RESULT_FIELDS:
        out = out.append_column(name, pa.array([r[name] for r in res], typ))
    out = out.append_column(
        "alt_date", pa.array([r["alt_date"] for r in res], pa.list_(S.CANDIDATE)))
    out = out.append_column(
        "alt_total", pa.array([r["alt_total"] for r in res], pa.list_(S.CANDIDATE)))
    return out


_EXTRACTOR_SINGLETONS: dict[tuple, "Extractor"] = {}


def extractor_task(emit_blocks: bool = False, min_bytes: int = 64,
                   max_bytes: int = 65_536):
    """Task-pool extractor stage: parser state built lazily ONCE per
    worker process (Ray reuses workers, so this has the same
    amortization as an actor's __init__ without pool overhead)."""
    key = (emit_blocks, min_bytes, max_bytes)

    def fn(batch: pa.Table) -> pa.Table:
        ex = _EXTRACTOR_SINGLETONS.get(key)
        if ex is None:
            ex = _EXTRACTOR_SINGLETONS[key] = Extractor(
                emit_blocks, min_bytes, max_bytes)
        return ex(batch)

    return fn


_RESULT_COLS = [f.name for f in S.MODEL_RESULT]


def _project_result(batch: pa.Table) -> pa.Table:
    return batch.select(_RESULT_COLS)


def read_pages(path: str, columns: list[str] | None = None):
    """Source S1: parquet pages corpus. Column pruning at the read."""
    import ray.data as rd

    return rd.read_parquet(path, columns=columns)


def extract_pipeline(ds, cfg: PipelineConfig | None = None,
                     source_path: str | None = None,
                     keep_cols: tuple[str, ...] = ()):
    """pages Dataset -> MODEL_RESULT Dataset (lazy; no materialization).

    ``source_path``: optional parquet path (or list of paths) of the
    same input; lets the dedup winner-aggregation re-read only
    (url, warc_ts) columns.
    ``keep_cols``: extra input columns carried through to the result
    projection (e.g. the checkpoint path's partition id)."""
    cfg = cfg or PipelineConfig()
    if cfg.dedup:
        if cfg.exact_dedup:
            from .dedup import dedup_pages

            ds = dedup_pages(ds)
        elif cfg.dedup_join:
            from .dedup import dedup_pages_join

            ds = dedup_pages_join(ds, source_path=source_path)
        else:
            from .dedup import dedup_pages_fast

            ds = dedup_pages_fast(ds, source_path=source_path)
    for enhancer in cfg.enhancers:
        ds = ds.map_batches(enhancer, batch_format="pyarrow",
                            zero_copy_batch=True)
    if cfg.extract_use_actors:
        ds = ds.map_batches(
            QualityGate(cfg.min_bytes, cfg.max_bytes),
            batch_format="pyarrow", batch_size=cfg.gate_batch_size,
            zero_copy_batch=True,
        )
        ds = ds.map_batches(
            Extractor, fn_constructor_kwargs={"emit_blocks": cfg.emit_blocks},
            batch_format="pyarrow", batch_size=cfg.extract_batch_size,
            concurrency=cfg.resolved_concurrency(), num_cpus=1,
            zero_copy_batch=True,
        )
    else:
        # gate fused into the extractor task: the html column is
        # converted to Python exactly once (memory bandwidth is the
        # measured single-box scaling limit)
        task = extractor_task(cfg.emit_blocks, cfg.min_bytes, cfg.max_bytes)
        if cfg.instrument:
            from .metrics import instrument

            task = instrument("gate_extract_normalize", task)
        if cfg.skew_split_bytes:
            import pyarrow.compute as pc

            thresh = cfg.skew_split_bytes

            def _small(t: pa.Table) -> pa.Table:
                return t.filter(pc.less_equal(
                    pc.binary_length(t.column("html")), thresh))

            def _big(t: pa.Table) -> pa.Table:
                return t.filter(pc.greater(
                    pc.binary_length(t.column("html")), thresh))

            small = ds.map_batches(_small, batch_format="pyarrow",
                                   zero_copy_batch=True)
            big = ds.map_batches(_big, batch_format="pyarrow",
                                 zero_copy_batch=True)
            small = small.map_batches(
                task, batch_format="pyarrow",
                batch_size=cfg.extract_batch_size, zero_copy_batch=True)
            big = big.map_batches(
                task, batch_format="pyarrow",
                batch_size=cfg.big_batch_size, zero_copy_batch=True)
            ds = small.union(big)
        else:
            ds = ds.map_batches(
                task, batch_format="pyarrow",
                batch_size=cfg.extract_batch_size, zero_copy_batch=True,
            )
    if cfg.emit_blocks:
        ds = ds.map_batches(
            lambda t: t.drop_columns(["blocks"]), batch_format="pyarrow",
            zero_copy_batch=True)
    ds = ds.map_batches(add_route, batch_format="pyarrow", zero_copy_batch=True)
    if keep_cols:
        cols = _RESULT_COLS + list(keep_cols)

        def _project(t: pa.Table) -> pa.Table:
            return t.select(cols)

        ds = ds.map_batches(_project, batch_format="pyarrow",
                            zero_copy_batch=True)
    else:
        ds = ds.map_batches(_project_result, batch_format="pyarrow",
                            zero_copy_batch=True)
    return ds


def full_pipeline(ds, reviews: pa.Table | None = None,
                  cfg: PipelineConfig | None = None,
                  source_path: str | None = None,
                  reviews_join: str = "broadcast"):
    """pages -> FINAL_RESULT, with the review join-back when reviews exist.

    ``reviews_join``: "broadcast" (default — review answers are
    human-generated and small) or "hash" (hash-partitioned join for a
    machine-scale reviews side; equivalence-tested)."""
    import ray

    from .review import coalesce_hash_join, coalesce_stage, reviews_to_dict

    results = extract_pipeline(ds, cfg, source_path=source_path)
    if reviews_join == "hash" and reviews is not None:
        import ray.data as rd

        reviews_ds = (reviews if not isinstance(reviews, pa.Table)
                      else rd.from_arrow(reviews))
        return coalesce_hash_join(results, reviews_ds)
    lookup = reviews_to_dict(reviews) if reviews is not None else {}
    ref = ray.put(lookup)
    return results.map_batches(
        coalesce_stage(ref), batch_format="pyarrow", zero_copy_batch=True,
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
    batch = Extractor(emit_blocks=False)(batch)
    batch = add_route(batch)
    return _project_result(batch)
