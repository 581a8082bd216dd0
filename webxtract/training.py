"""Training-corpus export — the composite 100 TB use case.

Chains the engine's pieces into the canonical LLM-data pipeline:

    pages parquet
      -> extract_pipeline        (dedup by url, gate, parse, normalize)
      -> keep non-rejected docs with enough extracted text
      -> exact near-dup removal by content hash (md5 of extracted_text,
         min-url representative wins — deterministic)
      -> text stats columns (token count, quality score)
      -> optional language filter
      -> sharded parquet (streaming write)

Everything streams; the only exchange beyond extraction's dedup is the
content-hash groupby, which shuffles (hash, url) pairs — never text.
"""

from __future__ import annotations

import hashlib

import pyarrow as pa
import pyarrow.compute as pc

from .pipeline import PipelineConfig, extract_pipeline


def _content_hash(batch: pa.Table) -> pa.Table:
    texts = batch.column("extracted_text").to_pylist()
    h = [hashlib.md5(t.encode("utf-8")).hexdigest() for t in texts]
    return batch.append_column("content_md5", pa.array(h, pa.string()))


def _text_stats(batch: pa.Table) -> pa.Table:
    toks = pc.list_value_length(
        pc.utf8_split_whitespace(batch.column("extracted_text"))
    ).cast(pa.int64())
    chars = pc.utf8_length(batch.column("extracted_text")).cast(pa.int64())
    return (batch.append_column("n_tokens", toks)
                 .append_column("n_chars", chars))


# Above this many duplicated content hashes the winner set no longer
# broadcasts (a 20% dup rate over 10^12 pages is ~10^11 winner rows —
# tens of GB on the driver); the canonical filter switches to a
# hash-partitioned LEFT join on content_md5 (the dedup_pages_join
# pattern). Below it the broadcast path wins: no all-to-all of the
# full text rows. Equivalence of the two paths is pinned in
# tests/test_training.py; the gate is recorded in SCALE.md's shuffle
# inventory.
TRAINING_DUP_BROADCAST_MAX = 2_000_000


def training_corpus(ds, cfg: PipelineConfig | None = None,
                    min_text_chars: int = 80,
                    langs: tuple[str, ...] | None = None,
                    source_path: str | None = None,
                    checkpoint_dir: str | None = None,
                    dedup_mode: str = "auto"):
    """pages Dataset -> deduplicated, filtered, stats-annotated corpus.

    Output columns: url, lang, extracted_text, n_tokens, n_chars,
    model_confidence, content_md5.

    ``dedup_mode``: "auto" (gate on the duplicated-hash count),
    "broadcast" (driver-collected winner dict; dup-rate-bounded), or
    "join" (distributed hash join on content_md5; the 10^12-row path).
    """
    import ray

    results = extract_pipeline(ds, cfg, source_path=source_path)

    def keep_quality(batch: pa.Table) -> pa.Table:
        ok = pc.and_(
            pc.not_equal(batch.column("route"), pa.scalar("rejected")),
            pc.greater_equal(
                pc.utf8_length(batch.column("extracted_text")),
                pa.scalar(min_text_chars)),
        )
        if langs is not None:
            ok = pc.and_(ok, pc.is_in(batch.column("lang"),
                                      value_set=pa.array(langs)))
        return batch.filter(ok)

    kept = results.map_batches(keep_quality, batch_format="pyarrow",
                               zero_copy_batch=True)
    kept = kept.map_batches(_content_hash, batch_format="pyarrow",
                            zero_copy_batch=True)
    # `kept` feeds TWO consumers (winner aggregation below, then the
    # canonical filter); an unmaterialized lineage would re-execute the
    # whole gate+extract pipeline for the second consumer (the streaming
    # planner recomputes shared stages per consumer — same recompute
    # fixed for LSH signatures). Pin the post-extraction results once;
    # at 100 TB checkpoint to parquet instead (pass checkpoint_dir).
    if checkpoint_dir is not None:
        import ray.data as rd

        kept.write_parquet(checkpoint_dir)
        kept = rd.read_parquet(checkpoint_dir)
    else:
        kept = kept.materialize()

    # exact content dedup: winner = min url per hash. Same two-phase
    # shape as dedup_pages_fast: aggregate winners over a slim
    # projection, broadcast only the DUPLICATED hashes. The rollup is
    # in-batch pre-reduce + ONE bounded hash-partition exchange with a
    # vectorized per-partition Min/Count (replaces a per-key string
    # groupby sort exchange), and the n>1 filter runs INSIDE the
    # partition, so only actual duplicate hashes — not every corpus
    # hash — ever reach the driver.
    from .ops.relational import partitioned_map_groups

    def _pre(b: pa.Table) -> pa.Table:
        g = b.select(["content_md5", "url"]).group_by(
            "content_md5").aggregate([("url", "min"), ("url", "count")])
        return pa.table({"content_md5": g.column("content_md5"),
                         "keep_url": g.column("url_min"),
                         "n": g.column("url_count").cast(pa.int64())})

    def _winners(part: pa.Table) -> pa.Table:
        g = part.group_by("content_md5").aggregate(
            [("keep_url", "min"), ("n", "sum")])
        d = g.filter(pc.greater(g.column("n_sum"), 1))
        return pa.table({"content_md5": d.column("content_md5"),
                         "keep_url": d.column("keep_url_min")})

    # winners stay in the OBJECT STORE (dup-rate-bounded: only hashes
    # with n>1 survive the per-partition filter); the driver sees one
    # count(), never the rows, until the broadcast path is chosen
    dup_ds = partitioned_map_groups(
        kept.map_batches(_pre, batch_format="pyarrow",
                         zero_copy_batch=True),
        "content_md5", _winners).materialize()
    n_dup_hashes = dup_ds.count()
    if dedup_mode == "auto":
        dedup_mode = ("broadcast"
                      if n_dup_hashes <= TRAINING_DUP_BROADCAST_MAX
                      else "join")

    if n_dup_hashes == 0:
        deduped = kept  # dup-free corpus: both paths are the identity
    elif dedup_mode == "broadcast":
        dups: dict = {}
        for b in dup_ds.iter_batches(batch_format="pyarrow"):
            dups.update(zip(b.column("content_md5").to_pylist(),
                            b.column("keep_url").to_pylist()))
        ref = ray.put(dups)

        def _dup_arrays(d: dict) -> tuple[pa.Array, pa.Array]:
            return (pa.array(list(d.keys()), pa.string()),
                    pa.array(list(d.values()), pa.string()))

        def keep_canonical(batch: pa.Table) -> pa.Table:
            from .broadcast import get_broadcast, get_broadcast_derived

            if not get_broadcast(ref):
                return batch
            hs, keep_urls = get_broadcast_derived(
                ref, "dup_arrays", _dup_arrays)
            # vectorized: row survives iff its hash is unduplicated OR
            # its url is the winning (min) url for that hash
            idx = pc.index_in(batch.column("content_md5"), value_set=hs)
            winner = pc.take(keep_urls, idx)
            keep = pc.or_kleene(pc.is_null(idx),
                                pc.equal(batch.column("url"), winner))
            return batch.filter(keep)

        deduped = kept.map_batches(keep_canonical, batch_format="pyarrow",
                                   zero_copy_batch=True)
    elif dedup_mode == "join":
        # 10^12-row path: hash-partitioned LEFT join of the rows with
        # the winner Dataset on content_md5 — the winner set never
        # touches the driver. Costs one all-to-all of the kept rows;
        # semantics identical to broadcast (equivalence-tested).
        from .ops.dedup import _drop_empty_blocks

        winners = _drop_empty_blocks(dup_ds)
        try:
            n_part = max(2, int(ray.cluster_resources().get("CPU", 8)))
        except Exception:
            n_part = 8
        # project to the output columns first: Acero rejects
        # list<struct> payload columns (alt_date etc.) in join
        # non-key fields, and the exchange only needs what survives
        slim = kept.select_columns([
            "url", "lang", "extracted_text", "model_confidence",
            "content_md5"])
        joined = slim.join(winners, join_type="left_outer",
                           num_partitions=n_part, on=("content_md5",))

        def keep_joined(t: pa.Table) -> pa.Table:
            m = pc.or_kleene(pc.is_null(t.column("keep_url")),
                             pc.equal(t.column("url"),
                                      t.column("keep_url")))
            return t.filter(m).drop_columns(["keep_url"])

        deduped = joined.map_batches(keep_joined, batch_format="pyarrow",
                                     zero_copy_batch=True)
    else:
        raise ValueError(f"unknown dedup_mode: {dedup_mode!r}")
    deduped = deduped.map_batches(_text_stats, batch_format="pyarrow",
                                  zero_copy_batch=True)
    return deduped.select_columns([
        "url", "lang", "extracted_text", "n_tokens", "n_chars",
        "model_confidence", "content_md5"])


def export_training_corpus(ds, out_dir: str, **kwargs) -> str:
    """Materialize the corpus as sharded parquet (streaming sink)."""
    training_corpus(ds, **kwargs).write_parquet(out_dir)
    return out_dir
