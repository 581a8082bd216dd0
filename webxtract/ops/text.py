"""Text analysis operators over a documents corpus.

All hot paths are vectorized: pyarrow.compute kernels or polars
expressions inside ``map_batches`` (never a Python loop over rows for
string work); the rolling-hash fingerprint uses numpy vectorized
polynomial evaluation per document.

Operators:
  * token_count    — whitespace tokenization stats (oracle: DuckDB
                     regexp_split_to_array; parity verified for the
                     single-space corpus)
  * quality_score  — length / uniqueness / token-shape heuristics,
                     SQL-expressible formula (oracle-checkable)
  * langid         — stopword-profile n-gram heuristic (no SQL oracle)
  * fingerprint    — 64-bit polynomial rolling hash (numpy) + md5 hex
                     (oracle: DuckDB md5())
"""

from __future__ import annotations

import hashlib
import re

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

from .relational import round_ha

# --- token counting -------------------------------------------------------

def add_token_count(batch: pa.Table, text_col: str = "text") -> pa.Table:
    toks = pc.utf8_split_whitespace(batch.column(text_col))
    return batch.append_column("n_tokens", pc.list_value_length(toks).cast(pa.int64()))


def token_count_table(batch: pa.Table) -> pa.Table:
    b = add_token_count(batch)
    return b.select(["doc_id", "n_tokens"])


# --- quality scoring ------------------------------------------------------
# score = 50 * uniq_ratio + 5 * min(avg_token_len, 10)
#   uniq_ratio    = distinct tokens / tokens
#   avg_token_len = (chars - (tokens - 1)) / tokens   (single-space corpus)
# The same closed form is expressible in DuckDB (oracle_sql), so this
# operator is fully correctness-gated.

def quality_score_batch(batch: pa.Table) -> pa.Table:
    import polars as pl

    df = pl.from_arrow(batch.select(["doc_id", "text"]))
    toks = pl.col("text").str.split(" ")
    out = df.select(
        pl.col("doc_id"),
        toks.list.len().cast(pl.Int64).alias("n_tokens"),
        toks.list.n_unique().cast(pl.Int64).alias("n_uniq"),
        pl.col("text").str.len_chars().cast(pl.Int64).alias("n_chars"),
    ).with_columns(
        (pl.col("n_uniq") / pl.col("n_tokens")).alias("uniq_ratio"),
        (
            (pl.col("n_chars") - (pl.col("n_tokens") - 1)) / pl.col("n_tokens")
        ).alias("avg_token_len"),
    ).with_columns(
        (
            50.0 * pl.col("uniq_ratio")
            + 5.0 * pl.min_horizontal(pl.col("avg_token_len"), pl.lit(10.0))
        ).round(6).alias("quality_score"),
        pl.col("uniq_ratio").round(6),
        pl.col("avg_token_len").round(6),
    )
    return out.to_arrow().cast(pa.schema([
        ("doc_id", pa.int64()), ("n_tokens", pa.int64()), ("n_uniq", pa.int64()),
        ("n_chars", pa.int64()), ("uniq_ratio", pa.float64()),
        ("avg_token_len", pa.float64()), ("quality_score", pa.float64()),
    ]))


QUALITY_ORACLE_EXPR = """
    round(50.0 * (len(list_distinct(string_split(text, ' '))) * 1.0
                  / len(string_split(text, ' ')))
          + 5.0 * least((length(text) - (len(string_split(text, ' ')) - 1)) * 1.0
                        / len(string_split(text, ' ')), 10.0), 6)
"""


# --- language id ----------------------------------------------------------

STOPWORDS = {
    "en": {"the", "and", "of", "to", "a", "in", "is", "it", "that", "was",
           "for", "on", "with", "as", "this", "at", "by", "from"},
    "de": {"der", "die", "das", "und", "ist", "ich", "nicht", "mit", "ein",
           "eine", "zu", "den", "von", "im", "auf", "für", "des"},
    "es": {"el", "la", "de", "que", "y", "en", "un", "una", "es", "los",
           "las", "por", "con", "para", "del", "se", "no"},
    "fr": {"le", "la", "les", "de", "des", "et", "est", "un", "une", "dans",
           "que", "pour", "qui", "sur", "pas", "au", "ce"},
}


class LangId:
    """Stopword-profile language identifier (actor-pool stage: the profile
    tables are built once per actor). Deterministic ties -> lexicographic
    smallest language; no-hit docs -> 'und'."""

    def __init__(self) -> None:
        self.profiles = {lang: frozenset(ws) for lang, ws in STOPWORDS.items()}

    def __call__(self, batch: pa.Table) -> pa.Table:
        toks_col = pc.utf8_split_whitespace(
            pc.utf8_lower(batch.column("text"))
        ).to_pylist()
        langs: list[str] = []
        scores: list[float] = []
        for toks in toks_col:
            n = max(1, len(toks))
            tokset = set(toks)
            best_lang, best = "und", 0.0
            for lang in sorted(self.profiles):
                hits = sum(1 for t in tokset if t in self.profiles[lang])
                score = hits / n
                if score > best:
                    best_lang, best = lang, score
            langs.append(best_lang)
            scores.append(round_ha(best, 6))
        out = batch.select(["doc_id"])
        out = out.append_column("lang_pred", pa.array(langs, pa.string()))
        out = out.append_column("lang_score", pa.array(scores, pa.float64()))
        return out


# --- benchmark decontamination -------------------------------------------

def contaminated_doc_ids(ds, snippets: list[str], exclude_expr=None):
    """Docs whose text contains ANY of the (broadcast) benchmark
    snippets — the eval-set decontamination pass of an LLM training
    pipeline. The probe is polars ``str.contains_any`` (Aho–Corasick
    over all patterns in one scan per row, compiled once per batch from
    the per-worker cached snippet list), so cost is O(text), not
    O(text × patterns). ``exclude_expr``: optional vectorized predicate
    (pa.Table -> BooleanArray) removing the eval docs themselves."""
    import ray

    ref = ray.put(list(snippets))

    def probe(batch: pa.Table) -> pa.Table:
        import polars as pl

        from ..broadcast import get_broadcast

        snips = get_broadcast(ref)
        if exclude_expr is not None:
            batch = batch.filter(exclude_expr(batch))
        if not snips:
            return batch.select(["doc_id"]).slice(0, 0)
        hit = pl.from_arrow(batch.select(["text"]))["text"] \
            .str.contains_any(snips)
        return batch.select(["doc_id"]).filter(hit.to_arrow())

    return ds.map_batches(probe, batch_format="pyarrow",
                          zero_copy_batch=True)


def docs_decontaminate_ids(sf_dir: str, eval_mod: int = 23,
                           snip_len: int = 16):
    """Demo wiring over the documents table: the 'benchmark set' is
    every doc with doc_id % eval_mod == 0, its signature the first
    snip_len chars; returns the CONTAMINATED doc ids (the pipeline's
    next stage would anti-join them away). Oracle: EXISTS + contains."""
    import ray.data as rd

    docs = rd.read_parquet(f"{sf_dir}/documents.parquet",
                           columns=["doc_id", "text"])

    # the eval set is tiny (1/eval_mod of the corpus) — collect its
    # snippets driver-side; at real scale this is the benchmark file
    snippets = []
    for b in docs.iter_batches(batch_format="pyarrow"):
        ids = b.column("doc_id").to_numpy()
        mask = ids % eval_mod == 0
        for t in b.column("text").filter(pa.array(mask)).to_pylist():
            snippets.append(t[:snip_len])

    def not_eval(batch: pa.Table) -> pa.Array:
        return pa.array(batch.column("doc_id").to_numpy() % eval_mod != 0)

    return contaminated_doc_ids(docs, snippets, exclude_expr=not_eval)


# --- stratified sampling --------------------------------------------------

def docs_stratified_sample(sf_dir: str, per_lang: int = 20):
    """Deterministic stratified sample: the per_lang docs with smallest
    md5(text) within each language (tie-break doc_id). One hash
    co-location by lang + a vectorized per-segment top-k — the grouped
    ROW_NUMBER() <= k pattern; reproducible under any partitioning and
    SQL-expressible (oracled)."""
    import ray.data as rd

    from .relational import _segment_starts, partitioned_map_groups

    ds = rd.read_parquet(f"{sf_dir}/documents.parquet",
                         columns=["doc_id", "lang", "text"])

    def keyed(t: pa.Table) -> pa.Table:
        h = [hashlib.md5(x.encode("utf-8")).hexdigest()
             for x in t.column("text").to_pylist()]
        return pa.table({"doc_id": t.column("doc_id"),
                         "lang": t.column("lang"),
                         "h": pa.array(h, pa.string())})

    keyed_ds = ds.map_batches(keyed, batch_format="pyarrow",
                              zero_copy_batch=True)

    def topk(part: pa.Table) -> pa.Table:
        if part.num_rows == 0:
            return pa.table({"doc_id": pa.array([], pa.int64()),
                             "lang": pa.array([], pa.string())})
        idx = pc.sort_indices(part, sort_keys=[
            ("lang", "ascending"), ("h", "ascending"),
            ("doc_id", "ascending")])
        g = part.take(idx)
        langs = np.array(g.column("lang").to_pylist())
        starts = _segment_starts(langs)
        counts = np.diff(np.append(starts, len(langs)))
        offsets = np.arange(len(langs)) - np.repeat(starts, counts)
        return g.select(["doc_id", "lang"]).filter(
            pa.array(offsets < per_lang))

    return partitioned_map_groups(keyed_ds, "lang", topk)


# --- dataset mixing -------------------------------------------------------

def source_quota(source: str) -> int:
    """Deterministic per-source doc quota for the mixing demo: sources
    are 'src<N>'; quota cycles 5/10/15/20 by N % 4 (stands in for the
    per-corpus sampling weights of a training mixture)."""
    try:
        n = int(source[3:])
    except (ValueError, IndexError):
        n = 0
    return (n % 4 + 1) * 5


def docs_source_mix(sf_dir: str):
    """Training-mixture construction: deterministically sample each
    source at its own weight (quota = the source's mixing ratio x epoch
    size) by keeping the quota docs with smallest md5(text) per source.
    Same grouped ROW_NUMBER() <= k shape as the stratified sample but
    with a PER-GROUP k — one hash co-location by source, vectorized
    per-segment rank against a quota vector. Oracled."""
    import ray.data as rd

    from .relational import _segment_starts, partitioned_map_groups

    ds = rd.read_parquet(f"{sf_dir}/documents.parquet",
                         columns=["doc_id", "source", "text"])

    def keyed(t: pa.Table) -> pa.Table:
        h = [hashlib.md5(x.encode("utf-8")).hexdigest()
             for x in t.column("text").to_pylist()]
        return pa.table({"doc_id": t.column("doc_id"),
                         "source": t.column("source"),
                         "h": pa.array(h, pa.string())})

    keyed_ds = ds.map_batches(keyed, batch_format="pyarrow",
                              zero_copy_batch=True)

    def take_quota(part: pa.Table) -> pa.Table:
        if part.num_rows == 0:
            return pa.table({"doc_id": pa.array([], pa.int64()),
                             "source": pa.array([], pa.string())})
        idx = pc.sort_indices(part, sort_keys=[
            ("source", "ascending"), ("h", "ascending"),
            ("doc_id", "ascending")])
        g = part.take(idx)
        src = np.array(g.column("source").to_pylist())
        starts = _segment_starts(src)
        counts = np.diff(np.append(starts, len(src)))
        offsets = np.arange(len(src)) - np.repeat(starts, counts)
        quotas = np.repeat(
            np.array([source_quota(s) for s in src[starts]], dtype=np.int64),
            counts)
        return g.select(["doc_id", "source"]).filter(
            pa.array(offsets < quotas))

    return partitioned_map_groups(keyed_ds, "source", take_quota)


# --- text cleaning --------------------------------------------------------

STOPWORD_PATTERN = r"\b(the|and|of|to|a|in|is)\b ?"


def docs_stopword_removal(sf_dir: str):
    """Corpus cleaning: strip stopwords (compiled regex alternation,
    word-bounded) and report how many were removed per doc. Fully
    vectorized — one Arrow C++ regex pass for the replacement and one
    for the count, no Python per row (RE2 on both sides, so the oracle's
    regexp_replace(g) matches byte-for-byte). The
    normalize-before-tokenize stage every training-corpus pipeline
    runs ahead of dedup/quality."""
    import ray.data as rd

    ds = rd.read_parquet(f"{sf_dir}/documents.parquet",
                         columns=["doc_id", "text"])

    def clean(t: pa.Table) -> pa.Table:
        txt = t.column("text")
        removed = pc.count_substring_regex(txt, STOPWORD_PATTERN)
        cleaned = pc.replace_substring_regex(txt, STOPWORD_PATTERN, "")
        return pa.table({
            "doc_id": t.column("doc_id"),
            "clean_text": cleaned,
            "n_removed": removed.cast(pa.int64()),
        })

    return ds.map_batches(clean, batch_format="pyarrow", zero_copy_batch=True)


# --- TF-IDF keyword extraction -------------------------------------------

# above this many distinct vocabulary entries the broadcast-vocab ops
# (TF-IDF, unigram LM, bigram LM) switch from shipping the term table to
# every worker to a hash join of the exploded token stream against the
# distributed term table: a web-scale bigram vocabulary is unbounded and
# would blow the per-worker heap as a broadcast (SCALE.md §13). The same
# auto-gate + equivalence-test pattern as dedup._resolve_verify.
VOCAB_BROADCAST_MAX_TERMS = 2_000_000


def _resolve_vocab_mode(mode: str, counts) -> str:
    """``counts`` must already be materialize()d (count() is then free
    and the two downstream consumers don't re-execute the lineage)."""
    if mode != "auto":
        return mode
    return ("join" if counts.count() > VOCAB_BROADCAST_MAX_TERMS
            else "broadcast")


def _doc_term_freqs(batch: pa.Table) -> pa.Table:
    """Per-batch EXACT per-doc term frequencies (a doc never spans
    batches): explode to (doc_id, term, tf) via dictionary-encode +
    np.unique over (row, code) pairs — the slim token stream the join
    path shuffles instead of broadcasting the vocabulary."""
    toks = pc.split_pattern(batch.column("text"), pattern=" ")
    flat = pc.list_flatten(toks).dictionary_encode()
    if isinstance(flat, pa.ChunkedArray):
        flat = flat.combine_chunks()
    parents = pc.list_parent_indices(toks).to_numpy().astype(np.int64)
    codes = flat.indices.to_numpy(zero_copy_only=False).astype(np.int64)
    v = max(len(flat.dictionary), 1)
    pair, tf = np.unique(parents * v + codes, return_counts=True)
    rows, tcode = pair // v, pair % v
    return pa.table({
        "doc_id": batch.column("doc_id").take(pa.array(rows, pa.int64())),
        "term": flat.dictionary.take(pa.array(tcode, pa.int64())),
        "tf": pa.array(tf.astype(np.int64), pa.int64())})


def _vocab_join(tf_ds, vocab_ds, value_col: str, fn):
    """Hash join of the exploded (doc_id, term, tf) stream against a
    (term, value) table in ONE copartitioned exchange; ``fn(tf, value)``
    maps numpy arrays to the joined score column. Every stream term
    exists in the vocabulary (both derive from the same corpus), so the
    join is inner by construction."""
    from .relational import copartitioned_map

    def prep_tf(t: pa.Table) -> pa.Table:
        return pa.table({"term": t.column("term"),
                         "doc_id": t.column("doc_id"),
                         "tf": t.column("tf").cast(pa.float64())})

    def prep_vocab(t: pa.Table) -> pa.Table:
        # the shared float64 slot carries the vocab value (count, df or
        # logprob — counts < 2^53 are exact); sides must union-match
        return pa.table({"term": t.column("term"),
                         "doc_id": pa.nulls(t.num_rows, pa.int64()),
                         "tf": t.column(value_col).cast(pa.float64())})

    def join_part(parts: list[pa.Table]) -> pa.Table:
        tfp, vp = parts
        if tfp.num_rows == 0 or vp.num_rows == 0:
            return pa.table({"doc_id": pa.array([], pa.int64()),
                             "term": pa.array([], pa.string()),
                             "score": pa.array([], pa.float64()),
                             "tf": pa.array([], pa.float64())})
        vterms = vp.column("term").combine_chunks()
        vvals = vp.column("tf").combine_chunks().to_numpy()
        idx = pc.index_in(tfp.column("term"), value_set=vterms) \
            .to_numpy(zero_copy_only=False).astype(np.int64)
        sc = fn(tfp.column("tf").to_numpy(), vvals[idx])
        return pa.table({"doc_id": tfp.column("doc_id"),
                         "term": tfp.column("term"),
                         "score": pa.array(sc, pa.float64()),
                         "tf": tfp.column("tf")})

    return copartitioned_map([(tf_ds, prep_tf), (vocab_ds, prep_vocab)],
                             "term", join_part)


def docs_tfidf_top_term(sf_dir: str, mode: str = "auto"):
    """Per-doc keyword extraction: the term with the highest
    tf * ln(N/df) score (ties -> term asc). Two passes: (1) document
    frequencies via per-batch DISTINCT (doc, term) partials + one
    grouped Sum (each doc lives in exactly one batch, so per-batch
    distinct-then-count is exact); (2a) vocab <= VOCAB_BROADCAST_MAX_
    TERMS: broadcast the vocabulary, per-batch tf counts + vectorized
    score + per-doc argmax entirely in-batch; (2b) above the gate: hash
    join the exploded (doc, term, tf) stream against the distributed
    df table, then a per-doc argmax exchange (_vocab_join) — the
    vocabulary never ships whole. Both modes byte-equivalent
    (tests/test_vocab_join.py). Oracled."""
    import ray.data as rd

    from .relational import (broadcast_lookup, parquet_rows,
                             partitioned_map_groups)

    ds = rd.read_parquet(f"{sf_dir}/documents.parquet",
                         columns=["doc_id", "text"])

    def partial_df(batch: pa.Table) -> pa.Table:
        # distinct (doc, term) per batch exactly (a doc never spans
        # batches), Arrow-native: pair-encode row x term-code, unique,
        # then count per code
        toks = pc.split_pattern(batch.column("text"), pattern=" ")
        flat = pc.list_flatten(toks).dictionary_encode()
        if isinstance(flat, pa.ChunkedArray):
            flat = flat.combine_chunks()
        parents = pc.list_parent_indices(toks).to_numpy()
        codes = flat.indices.to_numpy(zero_copy_only=False).astype(np.int64)
        v = len(flat.dictionary)
        pair = np.unique(parents.astype(np.int64) * v + codes)
        uniq_codes, n = np.unique(pair % v, return_counts=True)
        return pa.table({
            "term": flat.dictionary.take(pa.array(uniq_codes, pa.int64())),
            "n": pa.array(n.astype(np.int64), pa.int64())})

    def sum_df(t: pa.Table) -> pa.Table:
        g = t.group_by("term").aggregate([("n", "sum")])
        return pa.table({"term": g.column("term"),
                         "df": g.column("n_sum").cast(pa.int64())})

    df_tbl = partitioned_map_groups(
        ds.map_batches(partial_df, batch_format="pyarrow",
                       zero_copy_batch=True), "term", sum_df).materialize()
    n_docs = parquet_rows(sf_dir, "documents")

    if _resolve_vocab_mode(mode, df_tbl) == "join":
        tf_ds = ds.map_batches(_doc_term_freqs, batch_format="pyarrow",
                               zero_copy_batch=True)
        joined = _vocab_join(
            tf_ds, df_tbl, "df",
            lambda tf, dfv: tf.astype(np.float64)
            * np.log(float(n_docs) / dfv.astype(np.float64)))

        def argmax_part(part: pa.Table) -> pa.Table:
            if part.num_rows == 0:
                return pa.table({"doc_id": pa.array([], pa.int64()),
                                 "top_term": pa.array([], pa.string()),
                                 "tfidf": pa.array([], pa.float64())})
            doc = part.column("doc_id").to_numpy()
            sc = part.column("score").to_numpy()
            terms = part.column("term").to_numpy(zero_copy_only=False)
            # (doc asc, score desc, term asc) then first row per doc —
            # the same ordering as the broadcast path's lexsort
            order = np.lexsort((terms, -sc, doc))
            first = order[np.flatnonzero(np.diff(
                np.concatenate(([-1], doc[order]))))]
            return pa.table({
                "doc_id": pa.array(doc[first], pa.int64()),
                "top_term": pa.array(terms[first].tolist(), pa.string()),
                "tfidf": pa.array(np.round(sc[first], 6), pa.float64()),
            })

        return partitioned_map_groups(joined, "doc_id", argmax_part)

    df_ref = broadcast_lookup(df_tbl, "term", ["df"])

    def _idf_table(build) -> tuple[pa.Array, np.ndarray, np.ndarray]:
        keys, (dfv,) = build
        idf = np.log(float(n_docs) / dfv.to_numpy().astype(np.float64))
        # tie-break rank: position of each vocab term in ascending term
        # order (argmax ties -> term asc, matching the oracle)
        order = pc.sort_indices(keys).to_numpy(zero_copy_only=False)
        rank = np.empty(len(order), np.int64)
        rank[order] = np.arange(len(order))
        return keys, idf, rank

    def score(batch: pa.Table) -> pa.Table:
        from ..broadcast import get_broadcast_derived

        terms, idf, rank = get_broadcast_derived(df_ref, "idf", _idf_table)
        toks = pc.split_pattern(batch.column("text"), pattern=" ")
        flat = pc.list_flatten(toks)
        parents = pc.list_parent_indices(toks).to_numpy().astype(np.int64)
        codes = pc.index_in(flat, value_set=terms).to_numpy(
            zero_copy_only=False).astype(np.int64)
        v = len(idf)
        pair, tf = np.unique(parents * v + codes, return_counts=True)
        rows, tcode = pair // v, pair % v
        sc = tf.astype(np.float64) * idf[tcode]
        # per-doc argmax with (score desc, term-rank asc) ordering
        order = np.lexsort((rank[tcode], -sc, rows))
        first = order[np.flatnonzero(np.diff(
            np.concatenate(([-1], rows[order]))))]
        return pa.table({
            "doc_id": batch.column("doc_id").take(
                pa.array(rows[first], pa.int64())),
            "top_term": pc.take(terms, pa.array(tcode[first], pa.int64())),
            "tfidf": pa.array(np.round(sc[first], 6), pa.float64()),
        })

    return ds.map_batches(score, batch_format="pyarrow", zero_copy_batch=True)


# --- unigram LM scoring ---------------------------------------------------

def docs_unigram_logprob(sf_dir: str, mode: str = "auto"):
    """CCNet-style language-model quality score, with the corpus itself
    as the LM: mean unigram log-probability per doc (higher = more
    typical; the perplexity-filter stand-in used to rank web documents
    for training-data selection). Pass 1 builds corpus term counts
    (pre-reduced partials -> grouped Sum). Pass 2, below the
    VOCAB_BROADCAST_MAX_TERMS gate: broadcast the vocabulary and resolve
    each doc's tokens in-batch — split, flatten, one ``pc.index_in``,
    numpy bincount-by-parent-row for the per-doc mean. Above it: hash
    join the exploded (doc, term, tf) stream against the distributed
    term table, then one per-doc sum exchange — the vocabulary never
    ships whole (join mode; equivalence-tested). Oracled (unnest +
    join + avg(ln))."""
    import ray.data as rd

    from .relational import broadcast_lookup, partitioned_map_groups

    ds = rd.read_parquet(f"{sf_dir}/documents.parquet",
                         columns=["doc_id", "text"])

    def partial_tc(batch: pa.Table) -> pa.Table:
        # Arrow-native unigram partials: split + flatten + value_counts
        # (~1.7x cheaper than a polars explode/group_by per batch).
        # split_pattern(" ") matches the oracle's string_split exactly
        # (split_whitespace would diverge on runs of spaces / empties)
        flat = pc.list_flatten(pc.split_pattern(
            batch.column("text"), pattern=" "))
        vc = flat.value_counts()
        if isinstance(vc, pa.ChunkedArray):
            vc = vc.combine_chunks()
        return pa.table({"term": vc.field("values"),
                         "n": vc.field("counts").cast(pa.int64())})

    def sum_tc(t: pa.Table) -> pa.Table:
        g = t.group_by("term").aggregate([("n", "sum")])
        return pa.table({"term": g.column("term"),
                         "tc": g.column("n_sum").cast(pa.int64())})

    counts = partitioned_map_groups(
        ds.map_batches(partial_tc, batch_format="pyarrow",
                       zero_copy_batch=True), "term", sum_tc).materialize()

    if _resolve_vocab_mode(mode, counts) == "join":
        total = counts.sum("tc") or 0
        tf_ds = ds.map_batches(_doc_term_freqs, batch_format="pyarrow",
                               zero_copy_batch=True)
        # joined rows are (doc_id, term, score=tf*lp, tf): one doc-keyed
        # exchange folds both the contribution sum and n_tokens=sum(tf)
        joined = _vocab_join(
            tf_ds, counts, "tc",
            lambda tf, tc: tf.astype(np.float64)
            * np.log(tc.astype(np.float64) / float(total)))

        def mean_part(part: pa.Table) -> pa.Table:
            if part.num_rows == 0:
                return pa.table({
                    "doc_id": pa.array([], pa.int64()),
                    "mean_logprob": pa.array([], pa.float64()),
                    "n_tokens": pa.array([], pa.int64())})
            doc = part.column("doc_id").to_numpy()
            docs = np.unique(doc)
            idx = np.searchsorted(docs, doc)
            sums = np.bincount(idx, weights=part.column("score").to_numpy(),
                               minlength=len(docs))
            cnts = np.bincount(idx, weights=part.column("tf").to_numpy()
                               .astype(np.float64),
                               minlength=len(docs)).astype(np.int64)
            mean = np.round(sums / np.maximum(cnts, 1), 6)
            return pa.table({
                "doc_id": pa.array(docs, pa.int64()),
                "mean_logprob": pa.array(mean, pa.float64()),
                "n_tokens": pa.array(cnts, pa.int64())})

        return partitioned_map_groups(joined, "doc_id", mean_part)

    vocab_ref = broadcast_lookup(counts, "term", ["tc"])
    # corpus token total: fold the (bounded, already-materialized)
    # broadcast vocabulary — re-consuming `counts` would re-execute the
    # whole partials+exchange lineage a second time
    import ray

    _, (tc_arr,) = ray.get(vocab_ref)
    total = pc.sum(tc_arr).as_py() or 0

    def _lp_table(build) -> tuple[pa.Array, np.ndarray]:
        keys, (tc,) = build
        lp = np.log(tc.to_numpy().astype(np.float64) / float(total))
        return keys, lp

    def score(batch: pa.Table) -> pa.Table:
        from ..broadcast import get_broadcast_derived

        terms, lp_vals = get_broadcast_derived(vocab_ref, "lp", _lp_table)
        toks = pc.split_pattern(batch.column("text"), pattern=" ")
        flat = pc.list_flatten(toks)
        parents = pc.list_parent_indices(toks).to_numpy()
        idx = pc.index_in(flat, value_set=terms).to_numpy(
            zero_copy_only=False).astype(np.int64)
        lp = lp_vals[idx]
        n = batch.num_rows
        sums = np.bincount(parents, weights=lp, minlength=n)
        cnts = np.bincount(parents, minlength=n)
        mean = np.round(sums / np.maximum(cnts, 1), 6)
        return pa.table({
            "doc_id": batch.column("doc_id"),
            "mean_logprob": pa.array(mean, pa.float64()),
            "n_tokens": pa.array(cnts.astype(np.int64), pa.int64())})

    return ds.map_batches(score, batch_format="pyarrow", zero_copy_batch=True)


def docs_chunk_overlap(sf_dir: str, window: int = 32, stride: int = 24):
    """Sliding-window document chunking (the RAG / embedding-prep
    step): chunk c of a doc covers tokens [c*stride, c*stride+window),
    the last chunk may be short, and a doc always yields
    floor((n-1)/stride)+1 chunks. Embarrassingly parallel and fully
    vectorized — per batch one split/flatten, then pure repeat/cumsum
    index arithmetic builds the overlapping gather (each token lands
    in up to ceil(window/stride) chunks), one take + binary_join
    emits every chunk string. Output: (doc_id, chunk_idx, n_tokens,
    chunk_md5) — md5 keeps the compared payload slim while pinning
    the exact token join. Oracled (DuckDB range + windowed join +
    string_agg)."""
    import ray.data as rd

    ds = rd.read_parquet(f"{sf_dir}/documents.parquet",
                         columns=["doc_id", "text"])

    def chunk(batch: pa.Table) -> pa.Table:
        n = batch.num_rows
        if n == 0:
            return pa.table({"doc_id": pa.array([], pa.int64()),
                             "chunk_idx": pa.array([], pa.int64()),
                             "n_tokens": pa.array([], pa.int64()),
                             "chunk_md5": pa.array([], pa.string())})
        toks = pc.split_pattern(batch.column("text"), pattern=" ")
        flat = pc.list_flatten(toks)
        if isinstance(flat, pa.ChunkedArray):
            flat = flat.combine_chunks()
        parents = pc.list_parent_indices(toks).to_numpy(
            zero_copy_only=False)
        nt = np.bincount(parents, minlength=n).astype(np.int64)
        dstart = np.concatenate(([0], np.cumsum(nt)[:-1]))
        nc = (np.maximum(nt, 1) - 1) // stride + 1
        # chunk-level arrays (across all docs in the batch)
        cdoc = np.repeat(np.arange(n, dtype=np.int64), nc)
        cstart_chunks = np.cumsum(nc) - nc
        clocal = np.arange(int(nc.sum()), dtype=np.int64) \
            - np.repeat(cstart_chunks, nc)
        clen = np.minimum(window, nt[cdoc] - clocal * stride)
        # token gather: per chunk, dstart + c*stride + within-arange
        total = int(clen.sum())
        gstart = np.cumsum(clen) - clen
        within = np.arange(total, dtype=np.int64) \
            - np.repeat(gstart, clen)
        gather = np.repeat(dstart[cdoc] + clocal * stride, clen) + within
        chunk_toks = flat.take(pa.array(gather, pa.int64()))
        offsets = np.concatenate(([0], np.cumsum(clen)))
        txt = pc.binary_join(
            pa.LargeListArray.from_arrays(
                pa.array(offsets, pa.int64()), chunk_toks), " ")
        ids = batch.column("doc_id").to_numpy()
        return pa.table({
            "doc_id": pa.array(ids[cdoc], pa.int64()),
            "chunk_idx": pa.array(clocal, pa.int64()),
            "n_tokens": pa.array(clen, pa.int64()),
            "chunk_md5": pa.array(md5_hex(txt.to_pylist()), pa.string()),
        })

    return ds.map_batches(chunk, batch_format="pyarrow",
                          zero_copy_batch=True)


def docs_validate(sf_dir: str):
    """Data-quality validation (the Great-Expectations-style gate a
    production ingest runs before anything else): per-rule violation
    counts over the documents table —

      null_doc_id      doc_id IS NULL
      dup_doc_id       doc_id seen more than once (counts the EXTRA
                       occurrences, i.e. rows minus distinct)
      empty_text       text IS NULL or ''
      bad_n_chars      n_chars != length(text)
      bad_lang         lang not in the allowed set
      bad_source       source not matching 'src<digits>'

    Row-local rules fold as per-batch integer partials (one scan, no
    exchange); the uniqueness rule is the only one that must see every
    row of a key and reuses the standard bounded hash exchange
    (per-batch (doc_id, n) partials -> grouped sum -> extras). Output:
    one row per rule (rule, violations) — always 6 rows, so the shape
    is stable even on a clean corpus. Oracled (UNION ALL of counting
    subqueries)."""
    import ray.data as rd

    from .relational import partitioned_map_groups

    allowed = ("en", "fr", "es", "zh", "de")
    ds = rd.read_parquet(f"{sf_dir}/documents.parquet",
                         columns=["doc_id", "text", "lang", "source",
                                  "n_chars"])

    def local_partial(t: pa.Table) -> pa.Table:
        doc = t.column("doc_id")
        text = t.column("text")
        null_id = pc.sum(pc.is_null(doc)).as_py() or 0
        empty = pc.sum(pc.or_kleene(
            pc.is_null(text), pc.equal(text, ""))).as_py() or 0
        bad_nc = pc.sum(pc.not_equal(
            t.column("n_chars").cast(pa.int64()),
            pc.utf8_length(text).cast(pa.int64()))).as_py() or 0
        bad_lang = pc.sum(pc.invert(pc.is_in(
            t.column("lang"), value_set=pa.array(allowed)))).as_py() or 0
        bad_src = pc.sum(pc.invert(pc.match_substring_regex(
            t.column("source"), r"^src\d+$"))).as_py() or 0
        return pa.table({
            "rule": pa.array(["null_doc_id", "empty_text", "bad_n_chars",
                              "bad_lang", "bad_source"], pa.string()),
            "violations": pa.array([null_id, empty, bad_nc, bad_lang,
                                    bad_src], pa.int64())})

    local = (ds.map_batches(local_partial, batch_format="pyarrow",
                            zero_copy_batch=True)
             .groupby("rule").sum("violations"))

    def id_partial(t: pa.Table) -> pa.Table:
        col = t.column("doc_id")
        col = col.filter(pc.is_valid(col))  # dup rule: non-null keys
        ids, n = np.unique(col.to_numpy(zero_copy_only=False),
                           return_counts=True)
        return pa.table({"doc_id": pa.array(ids.astype(np.int64),
                                            pa.int64()),
                         "n": pa.array(n.astype(np.int64), pa.int64())})

    def extras(part: pa.Table) -> pa.Table:
        k = part.column("doc_id").to_numpy()
        n = part.column("n").to_numpy()
        order = np.argsort(k, kind="stable")
        k_s, n_s = k[order], n[order]
        bounds = np.flatnonzero(np.diff(k_s)) + 1
        starts = np.concatenate(([0], bounds))
        tot = np.add.reduceat(n_s, starts) if k_s.size \
            else np.zeros(0, np.int64)
        extra = int((tot - 1).clip(0).sum())
        return pa.table({"rule": pa.array(["dup_doc_id"], pa.string()),
                         "violations": pa.array([extra], pa.int64())})

    dups = (partitioned_map_groups(
        ds.map_batches(id_partial, batch_format="pyarrow",
                       zero_copy_batch=True), "doc_id", extras)
        .groupby("rule").sum("violations"))

    def rename(t: pa.Table) -> pa.Table:
        return pa.table({
            "rule": t.column("rule"),
            "violations": t.column("sum(violations)").cast(pa.int64())})

    return (local.map_batches(rename, batch_format="pyarrow")
            .union(dups.map_batches(rename, batch_format="pyarrow")))


def docs_compression_ratio(sf_dir: str, level: int = 6):
    """Compression-ratio quality signal (the MassiveText/Gopher-family
    repetitiveness heuristic: heavily duplicated or templated text
    compresses far below typical prose, so a LOW ratio flags low-value
    documents). ratio = len(zlib(text)) / len(text) at a fixed level —
    deterministic for a fixed zlib, embarrassingly parallel, C-speed
    per row (the op IS compression; there is nothing to vectorize
    above it). Rows-only: no SQL zlib exists — gated by planted
    repetitive-vs-prose ordering and determinism tests instead.
    Output: (doc_id, raw_len, comp_len, ratio)."""
    import zlib

    import ray.data as rd

    ds = rd.read_parquet(f"{sf_dir}/documents.parquet",
                         columns=["doc_id", "text"])

    def comp(batch: pa.Table) -> pa.Table:
        texts = batch.column("text").to_pylist()
        raw = np.array([len(t.encode("utf-8")) for t in texts], np.int64)
        cl = np.array([len(zlib.compress(t.encode("utf-8"), level))
                       for t in texts], np.int64)
        ratio = np.round(cl / np.maximum(raw, 1), 6)
        return pa.table({
            "doc_id": batch.column("doc_id"),
            "raw_len": pa.array(raw, pa.int64()),
            "comp_len": pa.array(cl, pa.int64()),
            "ratio": pa.array(ratio, pa.float64())})

    return ds.map_batches(comp, batch_format="pyarrow",
                          zero_copy_batch=True)


def docs_inverted_index(sf_dir: str, head: int = 10,
                        postings_dir: str | None = None,
                        num_parts: int | None = None):
    """Inverted-index construction (the retrieval-engine build step):
    one term-keyed exchange of the exploded (doc_id, term, tf) stream
    (the same slim shape the join-mode TF-IDF shuffles), then a
    vectorized per-partition fold — lexsort by (term, doc), boundary
    scan, reduceat — emitting per term: exact document frequency,
    exact total term count, and the FIRST ``head`` doc ids of the
    sorted posting list as ``postings_head``. The cap is the honest
    scale answer: a stopword's full posting list is corpus-sized, so
    the materialized index row stays bounded while df/tf_total remain
    exact. Output: (term, df, tf_total, postings_head). Oracled
    (DuckDB list(ORDER BY)[1:head] + string_agg).

    ``postings_dir``: when given, the SAME fold also spills its
    partition's full sorted postings — rows (term, doc_id, tf), the
    complete index — as one parquet file per term partition
    (term-disjoint, so files never overlap; named by the partition's
    HASH BUCKET — recomputable from any query term with the
    partitioner's own hash, so a reader prunes to exactly one file
    per term (ops/retrieval.py) — plus a deterministic content hash,
    written atomically, so task retries overwrite idempotently
    instead of duplicating). The bounded head stays the query
    surface; the spill is the resumable-index sink a retrieval
    engine would ship."""
    import ray.data as rd

    from .relational import _default_parts, partitioned_map_groups

    if num_parts is None:
        num_parts = _default_parts()

    ds = rd.read_parquet(f"{sf_dir}/documents.parquet",
                         columns=["doc_id", "text"])
    tf_ds = ds.map_batches(_doc_term_freqs, batch_format="pyarrow",
                           zero_copy_batch=True)

    if postings_dir is not None:
        import os

        os.makedirs(postings_dir, exist_ok=True)

    def _spill(term_s: pa.Array, doc_s: np.ndarray,
               tf_s: np.ndarray) -> None:
        import os

        import polars as pl
        import pyarrow.parquet as pq

        lo, hi = term_s[0].as_py(), term_s[-1].as_py()
        # the partition's bucket under the SAME hash the exchange
        # used (_hash_part_column: polars hash seed=7 mod num_parts)
        bucket = int(pl.Series([lo]).hash(seed=7)[0] % num_parts)
        h = 0xCBF29CE484222325
        for b in f"{lo}\x00{hi}\x00{len(doc_s)}".encode("utf-8"):
            h = ((h ^ b) * 0x100000001B3) & 0xFFFFFFFFFFFFFFFF
        name = f"postings-b{bucket:05d}-{h:016x}.parquet"
        tmp = os.path.join(postings_dir, "." + name + ".tmp")
        pq.write_table(pa.table({
            "term": term_s,
            "doc_id": pa.array(doc_s, pa.int64()),
            "tf": pa.array(tf_s.astype(np.int64), pa.int64())}), tmp,
            compression="zstd")
        os.replace(tmp, os.path.join(postings_dir, name))

    def fold(part: pa.Table) -> pa.Table:
        if part.num_rows == 0:
            return pa.table({
                "term": pa.array([], pa.string()),
                "df": pa.array([], pa.int64()),
                "tf_total": pa.array([], pa.int64()),
                "postings_head": pa.array([], pa.string())})
        enc = part.column("term").dictionary_encode()
        if isinstance(enc, pa.ChunkedArray):
            enc = enc.combine_chunks()
        codes = enc.indices.to_numpy(zero_copy_only=False).astype(np.int64)
        doc = part.column("doc_id").to_numpy()
        tf = part.column("tf").to_numpy()
        order = np.lexsort((doc, codes))
        codes_s, doc_s, tf_s = codes[order], doc[order], tf[order]
        bounds = np.flatnonzero(np.diff(codes_s)) + 1
        starts = np.concatenate(([0], bounds))
        ends = np.concatenate((bounds, [len(codes_s)]))
        if postings_dir is not None:
            _spill(enc.dictionary.take(pa.array(codes_s, pa.int64())),
                   doc_s, tf_s)
        heads = [",".join(map(str, doc_s[s:min(s + head, e)]))
                 for s, e in zip(starts, ends)]  # one join per TERM
        return pa.table({
            "term": enc.dictionary.take(pa.array(codes_s[starts],
                                                 pa.int64())),
            "df": pa.array((ends - starts).astype(np.int64), pa.int64()),
            "tf_total": pa.array(np.add.reduceat(tf_s, starts)
                                 .astype(np.int64), pa.int64()),
            "postings_head": pa.array(heads, pa.string())})

    return partitioned_map_groups(tf_ds, "term", fold,
                                  num_parts=num_parts)


_NB_SCALE = 1_000_000  # micro-nat fixed point for NB log-ratio weights


def _nb_labels(batch: pa.Table) -> np.ndarray:
    """Planted lexical-preference label, closed-form in the text so the
    oracle recomputes it: y = +1 iff count('data') > count('spark')
    (token equality, not substring). The synthetic corpus carries no
    organic quality signal, so the training target is planted — the
    classifier must RECOVER the rule from hashed-free bag-of-words
    evidence (93% train accuracy vs the 64% majority baseline at
    sf0.001)."""
    n = batch.num_rows
    toks = pc.split_pattern(batch.column("text"), pattern=" ")
    flat = pc.list_flatten(toks)
    parents = pc.list_parent_indices(toks).to_numpy(zero_copy_only=False)
    cd = np.bincount(parents[pc.equal(flat, "data").to_numpy(
        zero_copy_only=False)], minlength=n)
    cs = np.bincount(parents[pc.equal(flat, "spark").to_numpy(
        zero_copy_only=False)], minlength=n)
    return np.where(cd > cs, 1, -1).astype(np.int64)


def docs_nb_quality(sf_dir: str, mode: str = "auto"):
    """Supervised quality classifier: multinomial Naive Bayes with
    Laplace smoothing (the one-pass analog of the linear quality
    filters used to select web training data, e.g. the GPT-3/WebText
    logistic classifier) — trained and applied distributed, with
    INTEGER micro-nat weights so every score is bit-deterministic and
    partitioning-independent (the same fixed-point discipline as
    kmeans/PageRank):

      lr(t)  = round(ln((n_t+ +1)(N- +V) / ((n_t- +1)(N+ +V))) * 1e6)
      score  = sum over token occurrences of lr(term) + prior,
               prior = round(ln(d+ / d-) * 1e6);  pred = score > 0

    Train = ONE counting pass: per-batch (term, n_pos, n_neg) partials
    -> grouped sum (vocabulary-bounded exchange, the docs_unigram
    shape) + a tiny (d+, d-) scalar fold. Inference below the
    VOCAB_BROADCAST_MAX_TERMS gate broadcasts the weight table and
    scores each batch with one index_in + int64 np.add.at (exact);
    above it, the exploded (doc, term, tf) stream hash-joins the
    distributed weight table and one doc-keyed exchange folds score
    AND label (float64 products are exact below 2^53; |score| here is
    bounded by tokens_per_doc * ln(corpus_tokens) * 1e6 ~ 6.5e13 for a
    1M-token doc over 10^12 tokens). Labels are the planted
    closed-form rule (see _nb_labels). Output: (doc_id, label, score,
    pred). Oracled (unnest + conditional-agg CTE, bit-exact integer
    scores); broadcast==join equivalence-gated."""
    import ray
    import ray.data as rd

    from .relational import (broadcast_lookup, partitioned_map_groups)

    ds = rd.read_parquet(f"{sf_dir}/documents.parquet",
                         columns=["doc_id", "text"])

    def partial(batch: pa.Table) -> pa.Table:
        y = _nb_labels(batch)
        toks = pc.split_pattern(batch.column("text"), pattern=" ")
        flat = pc.list_flatten(toks).dictionary_encode()
        if isinstance(flat, pa.ChunkedArray):
            flat = flat.combine_chunks()
        parents = pc.list_parent_indices(toks).to_numpy(
            zero_copy_only=False).astype(np.int64)
        codes = flat.indices.to_numpy(zero_copy_only=False).astype(np.int64)
        nv = max(len(flat.dictionary), 1)
        pos = y[parents] > 0
        return pa.table({
            "term": flat.dictionary.take(pa.array(
                np.arange(nv, dtype=np.int64))),
            "n_pos": pa.array(np.bincount(codes[pos], minlength=nv)
                              .astype(np.int64), pa.int64()),
            "n_neg": pa.array(np.bincount(codes[~pos], minlength=nv)
                              .astype(np.int64), pa.int64()),
        })

    def sum_terms(t: pa.Table) -> pa.Table:
        g = t.group_by("term").aggregate([("n_pos", "sum"),
                                          ("n_neg", "sum")])
        return pa.table({"term": g.column("term"),
                         "n_pos": g.column("n_pos_sum").cast(pa.int64()),
                         "n_neg": g.column("n_neg_sum").cast(pa.int64())})

    terms = partitioned_map_groups(
        ds.map_batches(partial, batch_format="pyarrow",
                       zero_copy_batch=True), "term",
        sum_terms).materialize()

    def doc_partial(batch: pa.Table) -> pa.Table:
        y = _nb_labels(batch)
        return pa.table({"dp": pa.array([int((y > 0).sum())], pa.int64()),
                         "dn": pa.array([int((y < 0).sum())], pa.int64())})

    dcounts = ds.map_batches(doc_partial, batch_format="pyarrow",
                             zero_copy_batch=True)
    dp = dcounts.sum("dp")
    dn = dcounts.sum("dn")
    v_size = terms.count()
    n_pos_tot = terms.sum("n_pos") or 0
    n_neg_tot = terms.sum("n_neg") or 0
    prior = int(np.round(np.log(dp / dn) * _NB_SCALE))

    def _lr(n_pos: np.ndarray, n_neg: np.ndarray) -> np.ndarray:
        num = (n_pos.astype(np.float64) + 1) * (n_neg_tot + v_size)
        den = (n_neg.astype(np.float64) + 1) * (n_pos_tot + v_size)
        return np.round(np.log(num / den) * _NB_SCALE).astype(np.int64)

    if _resolve_vocab_mode(mode, terms) == "join":
        w_ds = terms.map_batches(
            lambda t: pa.table({
                "term": t.column("term"),
                "lr": pa.array(_lr(t.column("n_pos").to_numpy(),
                                   t.column("n_neg").to_numpy()),
                               pa.int64())}),
            batch_format="pyarrow", zero_copy_batch=True)
        tf_ds = ds.map_batches(_doc_term_freqs, batch_format="pyarrow",
                               zero_copy_batch=True)
        joined = _vocab_join(tf_ds, w_ds, "lr",
                             lambda tf, lr: tf * lr)

        def nb_fold(part: pa.Table) -> pa.Table:
            if part.num_rows == 0:
                return pa.table({
                    "doc_id": pa.array([], pa.int64()),
                    "label": pa.array([], pa.int64()),
                    "score": pa.array([], pa.int64()),
                    "pred": pa.array([], pa.int64())})
            doc = part.column("doc_id").to_numpy()
            docs = np.unique(doc)
            idx = np.searchsorted(docs, doc)
            # tf*lr products and their per-doc sums are integers below
            # 2^53: float64 bincount is exact, int64 cast is lossless
            score = np.bincount(
                idx, weights=part.column("score").to_numpy(),
                minlength=len(docs)).astype(np.int64) + prior
            tf = part.column("tf").to_numpy()
            is_d = pc.equal(part.column("term"), "data").to_numpy(
                zero_copy_only=False)
            is_s = pc.equal(part.column("term"), "spark").to_numpy(
                zero_copy_only=False)
            cd = np.bincount(idx, weights=tf * is_d, minlength=len(docs))
            cs = np.bincount(idx, weights=tf * is_s, minlength=len(docs))
            label = np.where(cd > cs, 1, -1).astype(np.int64)
            return pa.table({
                "doc_id": pa.array(docs, pa.int64()),
                "label": pa.array(label, pa.int64()),
                "score": pa.array(score, pa.int64()),
                "pred": pa.array(np.where(score > 0, 1, -1)
                                 .astype(np.int64), pa.int64())})

        return partitioned_map_groups(joined, "doc_id", nb_fold)

    vocab_ref = broadcast_lookup(terms, "term", ["n_pos", "n_neg"])

    def _w_table(build) -> tuple[pa.Array, np.ndarray]:
        keys, (n_pos, n_neg) = build
        return keys, _lr(n_pos.to_numpy(), n_neg.to_numpy())

    def score(batch: pa.Table) -> pa.Table:
        from ..broadcast import get_broadcast_derived

        keys, lr_vals = get_broadcast_derived(vocab_ref, "nb_lr",
                                              _w_table)
        y = _nb_labels(batch)
        toks = pc.split_pattern(batch.column("text"), pattern=" ")
        flat = pc.list_flatten(toks)
        parents = pc.list_parent_indices(toks).to_numpy(
            zero_copy_only=False)
        idx = pc.index_in(flat, value_set=keys).to_numpy(
            zero_copy_only=False).astype(np.int64)
        sums = np.full(batch.num_rows, prior, dtype=np.int64)
        np.add.at(sums, parents, lr_vals[idx])
        return pa.table({
            "doc_id": batch.column("doc_id"),
            "label": pa.array(y, pa.int64()),
            "score": pa.array(sums, pa.int64()),
            "pred": pa.array(np.where(sums > 0, 1, -1).astype(np.int64),
                             pa.int64())})

    return ds.map_batches(score, batch_format="pyarrow",
                          zero_copy_batch=True)


def _byte_trigrams(arr) -> tuple[np.ndarray, np.ndarray]:
    """Vectorized byte-trigram extraction over a string column:
    returns (parents, codes) where parents[i] is the row index of the
    i-th trigram occurrence and codes[i] = b0<<16 | b1<<8 | b2 over
    the flat UTF-8 buffer, windows clipped to row boundaries (no
    cross-document trigrams). Byte n-grams are the CLD2-style langid
    feature — identical to character trigrams on ASCII corpora (the
    oracle contract; the synthetic corpus is ASCII). One pass over the
    zero-copy Arrow buffer, no per-row Python."""
    if isinstance(arr, pa.ChunkedArray):
        arr = arr.combine_chunks()
    if pa.types.is_large_string(arr.type):
        arr = arr.cast(pa.string())
    offs = np.frombuffer(arr.buffers()[1], np.int32)[
        arr.offset:arr.offset + len(arr) + 1].astype(np.int64)
    counts = np.maximum(offs[1:] - offs[:-1] - 2, 0)
    total = int(counts.sum())
    if total == 0:
        return (np.zeros(0, np.int64), np.zeros(0, np.int64))
    data = np.frombuffer(arr.buffers()[2], np.uint8)
    n = len(arr)
    parents = np.repeat(np.arange(n, dtype=np.int64), counts)
    cum = np.concatenate(([0], np.cumsum(counts)[:-1]))
    pos = (np.repeat(offs[:-1], counts)
           + np.arange(total, dtype=np.int64) - np.repeat(cum, counts))
    codes = ((data[pos].astype(np.int64) << 16)
             | (data[pos + 1].astype(np.int64) << 8)
             | data[pos + 2].astype(np.int64))
    return parents, codes


def _tri_strings(codes: np.ndarray) -> pa.Array:
    """Trigram int codes -> 3-char Arrow string array (one buffer
    build, no Python loop). Valid UTF-8 by the ASCII-corpus contract
    asserted in _byte_trigrams' docstring."""
    b = np.empty((len(codes), 3), np.uint8)
    b[:, 0] = codes >> 16
    b[:, 1] = (codes >> 8) & 0xFF
    b[:, 2] = codes & 0xFF
    offsets = np.arange(0, 3 * len(codes) + 1, 3, dtype=np.int32)
    return pa.StringArray.from_buffers(
        len(codes), pa.py_buffer(offsets.tobytes()),
        pa.py_buffer(b.tobytes()))


def docs_langid_ngram(sf_dir: str, mode: str = "auto"):
    """From-scratch character-n-gram language identification — the
    CCNet pipeline's stage one (Wenzek et al. 2020, arXiv:1911.00359
    §3; fastText langid is a linear model over char n-grams, Joulin
    et al. 2016) — as a multiclass multinomial Naive Bayes over BYTE
    TRIGRAMS, trained on the corpus's own `lang` labels and applied
    distributed, with INTEGER micro-nat fixed-point weights so every
    score is bit-deterministic and partitioning-independent (the
    docs_nb_quality discipline, generalized from 2 classes to L):

      w(t,l)    = round(ln((n_tl + 1) / (N_l + V)) * 1e6)
      default_l = round(ln(      1    / (N_l + V)) * 1e6)   (unseen t)
      prior_l   = round(ln(d_l / D) * 1e6)
      score(d,l)= prior_l + T_d * default_l
                  + sum over d's trigrams t of tf * (w(t,l) - default_l)
      pred_lang = argmax_l score (ties -> lang ascending)
      margin    = best score - second-best score  (>= 0)

    Train = ONE counting pass: per-batch (term, lang, n) partials ->
    one term-keyed exchange that pivots to (term, n_<lang>...) — the
    vocabulary is bounded by 2^24 byte trigrams by construction, and
    in practice by Heap's law. Inference below VOCAB_BROADCAST_MAX_
    TERMS broadcasts the (V x L) delta-weight matrix and scores each
    batch with one np.add.at (exact int64); above the gate, the
    exploded (doc, term, tf) stream hash-joins the distributed weight
    table in one copartitioned exchange and a doc-keyed exchange folds
    the partial scores (both paths equivalence-tested). NOTE: the
    synthetic corpus's `lang` column is a random label with no organic
    signal in the text (like _nb_labels' planted rule, but here there
    is nothing to recover), so accuracy is near the majority baseline
    — the machinery, determinism, and scale posture are the
    deliverables; the confusion matrix vs `lang` is recorded in
    BASELINE.md. Output: (doc_id, lang, pred_lang, margin). Oracled
    (generate_series substr trigrams + conditional-agg CTE, bit-exact
    integer scores)."""
    import ray.data as rd

    from .relational import (broadcast_lookup, copartitioned_map,
                             partitioned_map_groups)

    ds = rd.read_parquet(f"{sf_dir}/documents.parquet",
                         columns=["doc_id", "text", "lang"])

    # --- tiny per-lang doc counts (bounded: |langs| x blocks rows) ---
    def lang_partial(batch: pa.Table) -> pa.Table:
        g = batch.group_by("lang").aggregate([("doc_id", "count")])
        return pa.table({"lang": g.column("lang"),
                         "d": g.column("doc_id_count").cast(pa.int64())})

    lang_rows = ds.map_batches(lang_partial, batch_format="pyarrow",
                               zero_copy_batch=True).take_all()
    dcount: dict[str, int] = {}
    for r in lang_rows:
        dcount[r["lang"]] = dcount.get(r["lang"], 0) + int(r["d"])
    langs = sorted(dcount)  # ascending = the argmax tie-break order
    nl_ = len(langs)
    d_total = sum(dcount.values())

    # --- train: (term, lang, n) partials -> term-keyed pivot ---
    def count_partial(batch: pa.Table) -> pa.Table:
        parents, codes = _byte_trigrams(batch.column("text"))
        lidx_row = pc.index_in(
            batch.column("lang"), value_set=pa.array(langs)).to_numpy(
            zero_copy_only=False).astype(np.int64)
        key = codes * nl_ + lidx_row[parents]
        uniq, cnt = np.unique(key, return_counts=True)
        return pa.table({
            "term": _tri_strings(uniq // nl_),
            "lang": pa.array(langs, pa.string()).take(
                pa.array(uniq % nl_, pa.int64())),
            "n": pa.array(cnt.astype(np.int64), pa.int64())})

    def pivot_terms(part: pa.Table) -> pa.Table:
        if part.num_rows == 0:
            cols = {"term": pa.array([], pa.string())}
            cols.update({f"n_{l}": pa.array([], pa.int64())
                         for l in langs})
            return pa.table(cols)
        enc = part.column("term").combine_chunks().dictionary_encode()
        tcode = enc.indices.to_numpy(zero_copy_only=False).astype(np.int64)
        lidx = pc.index_in(part.column("lang"),
                           value_set=pa.array(langs)).to_numpy(
            zero_copy_only=False).astype(np.int64)
        nt = len(enc.dictionary)
        mat = np.zeros((nt, nl_), np.int64)
        np.add.at(mat, (tcode, lidx), part.column("n").to_numpy())
        cols = {"term": enc.dictionary}
        cols.update({f"n_{l}": pa.array(mat[:, i], pa.int64())
                     for i, l in enumerate(langs)})
        return pa.table(cols)

    terms = partitioned_map_groups(
        ds.map_batches(count_partial, batch_format="pyarrow",
                       zero_copy_batch=True), "term",
        pivot_terms).materialize()

    # --- totals: one single-row partial per block (bounded) ---
    def tot_partial(t: pa.Table) -> pa.Table:
        cols = {"v": pa.array([t.num_rows], pa.int64())}
        cols.update({f"n_{l}": pa.array(
            [int(t.column(f"n_{l}").to_numpy().sum())], pa.int64())
            for l in langs})
        return pa.table(cols)

    tot_rows = terms.map_batches(tot_partial, batch_format="pyarrow",
                                 zero_copy_batch=True).take_all()
    v_size = sum(int(r["v"]) for r in tot_rows)
    n_tot = np.array([sum(int(r[f"n_{l}"]) for r in tot_rows)
                      for l in langs], np.int64)
    prior = np.round(np.log(
        np.array([dcount[l] for l in langs], np.float64) / d_total)
        * _NB_SCALE).astype(np.int64)
    default = np.round(np.log(1.0 / (n_tot + v_size))
                       * _NB_SCALE).astype(np.int64)

    def _delta(counts: list[np.ndarray]) -> np.ndarray:
        """(V x L) int64 matrix of w(t,l) - default_l."""
        mat = np.empty((len(counts[0]), nl_), np.int64)
        for i in range(nl_):
            w = np.round(np.log((counts[i].astype(np.float64) + 1)
                                / (n_tot[i] + v_size))
                         * _NB_SCALE).astype(np.int64)
            mat[:, i] = w - default[i]
        return mat

    def _finish(doc_id: pa.Array, lang: pa.Array, t_d: np.ndarray,
                dsum: np.ndarray) -> pa.Table:
        scores = (prior[None, :] + t_d[:, None] * default[None, :]
                  + dsum)
        best = np.argmax(scores, axis=1)  # first max = lang ascending
        top2 = np.partition(scores, nl_ - 2, axis=1)
        margin = (top2[:, -1] - top2[:, -2]) if nl_ > 1 else \
            np.zeros(len(t_d), np.int64)
        return pa.table({
            "doc_id": doc_id,
            "lang": lang,
            "pred_lang": pa.array(langs, pa.string()).take(
                pa.array(best, pa.int64())),
            "margin": pa.array(margin.astype(np.int64), pa.int64())})

    if _resolve_vocab_mode(mode, terms) == "join":
        # scale path: explode (doc, lang, term, tf), one term-keyed
        # copartitioned join against the weight table emitting per-doc
        # per-partition partial delta sums, then one doc-keyed fold
        def prep_tf(batch: pa.Table) -> pa.Table:
            parents, codes = _byte_trigrams(batch.column("text"))
            pair, tf = np.unique(parents * (1 << 24) + codes,
                                 return_counts=True)
            rows = pa.array(pair >> 24, pa.int64())
            cols = {"term": _tri_strings(pair & 0xFFFFFF),
                    "doc_id": batch.column("doc_id").take(rows),
                    "lang": batch.column("lang").take(rows),
                    "tf": pa.array(tf.astype(np.int64), pa.int64())}
            cols.update({f"n_{l}": pa.nulls(len(pair), pa.int64())
                         for l in langs})
            return pa.table(cols)

        def prep_w(t: pa.Table) -> pa.Table:
            cols = {"term": t.column("term"),
                    "doc_id": pa.nulls(t.num_rows, pa.int64()),
                    "lang": pa.nulls(t.num_rows, pa.string()),
                    "tf": pa.nulls(t.num_rows, pa.int64())}
            cols.update({f"n_{l}": t.column(f"n_{l}") for l in langs})
            return pa.table(cols)

        def join_part(parts: list[pa.Table]) -> pa.Table:
            tfp, wp = parts
            cols_schema = {"doc_id": pa.array([], pa.int64()),
                           "lang": pa.array([], pa.string()),
                           "t": pa.array([], pa.int64())}
            cols_schema.update({f"d_{l}": pa.array([], pa.int64())
                                for l in langs})
            if tfp.num_rows == 0:
                return pa.table(cols_schema)
            delta = _delta([wp.column(f"n_{l}").combine_chunks()
                            .to_numpy() for l in langs]) \
                if wp.num_rows else np.zeros((0, nl_), np.int64)
            vterms = wp.column("term").combine_chunks()
            idx = pc.index_in(tfp.column("term"), value_set=vterms) \
                .to_numpy(zero_copy_only=False).astype(np.int64)
            # closed world: every stream term is in the vocabulary
            doc = tfp.column("doc_id").to_numpy()
            docs, inv = np.unique(doc, return_inverse=True)
            tf = tfp.column("tf").to_numpy()
            dsum = np.zeros((len(docs), nl_), np.int64)
            np.add.at(dsum, inv, tf[:, None] * delta[idx])
            t_d = np.bincount(inv, weights=tf,
                              minlength=len(docs)).astype(np.int64)
            first = np.zeros(len(docs), np.int64)
            first[inv[::-1]] = np.arange(len(doc) - 1, -1, -1)
            cols = {"doc_id": pa.array(docs, pa.int64()),
                    "lang": tfp.column("lang").take(
                        pa.array(first, pa.int64())),
                    "t": pa.array(t_d, pa.int64())}
            cols.update({f"d_{l}": pa.array(dsum[:, i], pa.int64())
                         for i, l in enumerate(langs)})
            return pa.table(cols)

        partials = copartitioned_map(
            [(ds, prep_tf), (terms, prep_w)], "term", join_part)

        def doc_fold(part: pa.Table) -> pa.Table:
            if part.num_rows == 0:
                return _finish(pa.array([], pa.int64()),
                               pa.array([], pa.string()),
                               np.zeros(0, np.int64),
                               np.zeros((0, nl_), np.int64))
            doc = part.column("doc_id").to_numpy()
            docs, inv = np.unique(doc, return_inverse=True)
            t_d = np.bincount(inv, weights=part.column("t").to_numpy(),
                              minlength=len(docs)).astype(np.int64)
            dsum = np.zeros((len(docs), nl_), np.int64)
            for i, l in enumerate(langs):
                dsum[:, i] = np.bincount(
                    inv, weights=part.column(f"d_{l}").to_numpy(),
                    minlength=len(docs)).astype(np.int64)
            first = np.zeros(len(docs), np.int64)
            first[inv[::-1]] = np.arange(len(doc) - 1, -1, -1)
            return _finish(pa.array(docs, pa.int64()),
                           part.column("lang").take(
                               pa.array(first, pa.int64())),
                           t_d, dsum)

        return partitioned_map_groups(partials, "doc_id", doc_fold)

    vocab_ref = broadcast_lookup(terms, "term",
                                 [f"n_{l}" for l in langs])

    def _w_table(build):
        keys, counts = build
        return keys, _delta([c.to_numpy() for c in counts])

    def score(batch: pa.Table) -> pa.Table:
        from ..broadcast import get_broadcast_derived

        keys, delta = get_broadcast_derived(vocab_ref, "langid_delta",
                                            _w_table)
        parents, codes = _byte_trigrams(batch.column("text"))
        n = batch.num_rows
        t_d = np.bincount(parents, minlength=n).astype(np.int64)
        dsum = np.zeros((n, nl_), np.int64)
        if len(codes):
            ucodes, inv = np.unique(codes, return_inverse=True)
            rowmap = pc.index_in(_tri_strings(ucodes),
                                 value_set=keys).to_numpy(
                zero_copy_only=False).astype(np.int64)
            np.add.at(dsum, parents, delta[rowmap[inv]])
        return _finish(batch.column("doc_id"), batch.column("lang"),
                       t_d, dsum)

    return ds.map_batches(score, batch_format="pyarrow",
                          zero_copy_batch=True)


def docs_ccnet_buckets(sf_dir: str, n_buckets: int = 3):
    """CCNet head/middle/tail bucketing (Wenzek et al. 2020,
    arXiv:1911.00359 §4.4): rank every document by language-model
    quality and split the corpus into equal thirds — 'head' = the
    most-typical third, used as the premium training slice. The LM
    score is the corpus-unigram mean log-prob shared with
    docs_unigram_logprob (its perplexity stand-in; already
    hash-oracled), ranked DESC with doc_id as the total-order
    tie-break, bucketed with SQL NTILE semantics via
    global_row_number (sorted blocks never leave the object store;
    the driver sees one count per block). Output: (doc_id,
    mean_logprob, bucket). Oracled (same unnest+join+avg(ln) CTE +
    NTILE(3) window)."""
    from .relational import global_row_number, parquet_rows

    labels = ["head", "middle", "tail"] if n_buckets == 3 else [
        f"b{i+1}" for i in range(n_buckets)]
    scores = docs_unigram_logprob(sf_dir)
    rn = global_row_number(scores, ["mean_logprob", "doc_id"],
                           descending=[True, False], rn_col="rn")
    total = parquet_rows(sf_dir, "documents")
    q, r = divmod(total, n_buckets)

    def bucket(t: pa.Table) -> pa.Table:
        rnv = t.column("rn").to_numpy()
        if q == 0:
            tile = np.minimum(rnv, n_buckets)
        else:
            big = r * (q + 1)
            tile = np.where(rnv <= big, (rnv - 1) // (q + 1) + 1,
                            r + (rnv - big - 1) // max(q, 1) + 1)
        lab = pa.array(np.asarray(labels)[tile.astype(np.int64) - 1])
        return pa.table({
            "doc_id": t.column("doc_id"),
            "mean_logprob": t.column("mean_logprob"),
            "bucket": lab,
        })

    return rn.map_batches(bucket, batch_format="pyarrow",
                          zero_copy_batch=True)


# --- fingerprinting -------------------------------------------------------

_FP_BASE = np.uint64(1099511628211)   # FNV prime as polynomial base


def rolling_fingerprint(text: str) -> int:
    """64-bit polynomial rolling hash sum(b_i * base^(n-1-i)) mod 2^64,
    evaluated with vectorized numpy uint64 arithmetic (natural wraparound)."""
    b = np.frombuffer(text.encode("utf-8"), dtype=np.uint8).astype(np.uint64)
    if b.size == 0:
        return 0
    n = b.size
    with np.errstate(over="ignore"):
        powers = np.empty(n, dtype=np.uint64)
        powers[0] = np.uint64(1)
        for i in range(1, n):  # powers table is O(len); reused via outer cache
            powers[i] = powers[i - 1] * _FP_BASE
        return int((b * powers[::-1]).sum(dtype=np.uint64))


def md5_hex(texts: list[str]) -> list[str]:
    """The ONE content-hash definition every exact-dedup surface uses
    (Fingerprinter, docs_clean_corpus, incremental-ingest dedup) — md5
    of the utf-8 text, hex — so their dedup decisions can never
    diverge. Oracle twin: DuckDB md5(text)."""
    return [hashlib.md5(t.encode("utf-8")).hexdigest() for t in texts]


class Fingerprinter:
    """Per-doc fingerprints: md5 hex (oracle-checkable vs DuckDB md5())
    and a 64-bit rolling hash. Power table cached across batches (actor)."""

    def __init__(self) -> None:
        self._powers = np.ones(1, dtype=np.uint64)

    def _powers_upto(self, n: int) -> np.ndarray:
        if self._powers.size < n:
            old = self._powers.size
            grown = np.empty(n, dtype=np.uint64)
            grown[:old] = self._powers
            with np.errstate(over="ignore"):
                for i in range(old, n):
                    grown[i] = grown[i - 1] * _FP_BASE
            self._powers = grown
        return self._powers

    def __call__(self, batch: pa.Table) -> pa.Table:
        texts = batch.column("text").to_pylist()
        md5s = md5_hex(texts)
        fps = []
        for t in texts:
            b = np.frombuffer(t.encode("utf-8"), dtype=np.uint8).astype(np.uint64)
            if b.size == 0:
                fps.append(0)
                continue
            powers = self._powers_upto(b.size)[: b.size]
            with np.errstate(over="ignore"):
                fps.append(int((b * powers[::-1]).sum(dtype=np.uint64)))
        out = batch.select(["doc_id"])
        out = out.append_column("md5", pa.array(md5s, pa.string()))
        out = out.append_column(
            "fp64", pa.array([f - (1 << 63) for f in fps], pa.int64())
        )  # shifted to signed for parquet/SQL friendliness
        return out


# --- Gopher-style repetition signals --------------------------------------

def docs_repetition(sf_dir: str):
    """Per-doc repetition signals (the Gopher/MassiveText repetition
    filters): duplicate-token fraction (1 - distinct/total tokens) and
    the fraction of bigram slots taken by the single most frequent
    bigram. One pass, no exchange: a doc never spans batches, so both
    signals are per-batch numpy segment ops over the flattened
    dictionary-encoded token stream (same shape as docs_bigram_counts,
    plus a per-parent unique/argmax). Oracled via DuckDB list kernels +
    a bigram unnest."""
    import ray.data as rd

    ds = rd.read_parquet(f"{sf_dir}/documents.parquet",
                         columns=["doc_id", "text"])

    def rep(batch: pa.Table) -> pa.Table:
        toks = pc.split_pattern(batch.column("text"), pattern=" ")
        n = pc.list_value_length(toks).cast(pa.int64()).to_numpy()
        ndocs = len(n)
        flat = pc.list_flatten(toks).combine_chunks()
        parents = pc.list_parent_indices(toks).to_numpy().astype(np.int64)
        codes = flat.dictionary_encode().indices.to_numpy().astype(np.int64)
        vocab = int(codes.max()) + 1 if len(codes) else 1
        # distinct tokens per doc: unique (doc, token-code) pairs
        distinct = np.bincount(
            np.unique(parents * vocab + codes) // vocab, minlength=ndocs)
        dup_frac = round_ha(1.0 - distinct / np.maximum(n, 1), 6)
        # most-frequent-bigram share of the doc's bigram slots
        mx = np.zeros(ndocs, dtype=np.int64)
        tot = np.zeros(ndocs, dtype=np.int64)
        if len(parents) > 1:
            same = parents[:-1] == parents[1:]
            bp = parents[:-1][same]
            bcode = codes[:-1][same] * vocab + codes[1:][same]
            if len(bp):
                ubg, inv = np.unique(bcode, return_inverse=True)
                key = bp * len(ubg) + inv
                ukey, cnt = np.unique(key, return_counts=True)
                np.maximum.at(mx, ukey // len(ubg), cnt)
                tot = np.bincount(bp, minlength=ndocs)
        top_frac = np.where(tot > 0,
                            round_ha(mx / np.maximum(tot, 1), 6), 0.0)
        return pa.table({
            "doc_id": batch.column("doc_id"),
            "n_tokens": pa.array(n, pa.int64()),
            "dup_token_frac": pa.array(dup_frac, pa.float64()),
            "top_bigram_frac": pa.array(top_frac, pa.float64()),
        })

    return ds.map_batches(rep, batch_format="pyarrow", zero_copy_batch=True)


# --- deterministic train/val split ----------------------------------------

def docs_split(sf_dir: str, val_hex: str = "1a"):
    """Hash-based train/val assignment: split = 'val' iff the first md5
    hex byte of str(doc_id) is below ``val_hex`` (~10% for '1a').
    Reproducible under any partitioning and across runs (no RNG), and
    SQL-expressible, so fully oracle-checked — the property a corpus
    split needs so that re-runs and incremental ingests never move a
    document across the split boundary."""
    import ray.data as rd

    ds = rd.read_parquet(f"{sf_dir}/documents.parquet", columns=["doc_id"])

    def tag(batch: pa.Table) -> pa.Table:
        ids = batch.column("doc_id").to_pylist()
        split = ["val" if hashlib.md5(str(i).encode()).hexdigest()[:2]
                 < val_hex else "train" for i in ids]
        return pa.table({"doc_id": batch.column("doc_id"),
                         "split": pa.array(split, pa.string())})

    return ds.map_batches(tag, batch_format="pyarrow", zero_copy_batch=True)


# --- PII redaction --------------------------------------------------------

PII_PATTERNS = (
    (r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}", "<EMAIL>"),
    (r"\b\d{3}-\d{2}-\d{4}\b", "<SSN>"),      # before phone: disjoint but
    (r"\b\d{3}-\d{3}-\d{4}\b", "<PHONE>"),    # fixed order documents intent
)


def redact_pii(batch: pa.Table, text_col: str = "text") -> pa.Table:
    """Redact emails / SSNs / phone numbers (RE2, fully vectorized: one
    Arrow C++ regex pass per pattern). Adds ``clean_text`` and ``n_pii``
    columns; both sides of the oracle run the identical RE2 patterns."""
    txt = batch.column(text_col)
    n_pii = pa.nulls(batch.num_rows, pa.int64())
    total = None
    for pat, _ in PII_PATTERNS:
        c = pc.count_substring_regex(txt, pat).cast(pa.int64())
        total = c if total is None else pc.add(total, c)
    red = txt
    for pat, rep in PII_PATTERNS:
        red = pc.replace_substring_regex(red, pat, rep)
    return (batch.append_column("clean_text", red)
                 .append_column("n_pii", total))


def docs_pii_redact(sf_dir: str):
    """PII-redaction demo with a deterministic planted payload: docs
    whose id is divisible by 8 get a synthetic contact blob appended
    (same expression in the SQL oracle), then the corpus is redacted.
    Proves regex parity AND that the redactor actually fires."""
    import ray.data as rd

    ds = rd.read_parquet(f"{sf_dir}/documents.parquet",
                         columns=["doc_id", "text"])
    payload = " contact alice.smith+hr@example-corp.com or 415-555-2671 ssn 123-45-6789"

    def plant_and_redact(batch: pa.Table) -> pa.Table:
        hit = pc.equal(pc.bit_wise_and(batch.column("doc_id"),
                                       pa.scalar(7, pa.int64())),
                       pa.scalar(0, pa.int64()))
        txt = pc.if_else(
            hit,
            pc.binary_join_element_wise(
                batch.column("text"), pa.scalar(payload), ""),
            batch.column("text"))
        planted = pa.table({"doc_id": batch.column("doc_id"), "text": txt})
        out = redact_pii(planted)
        return out.select(["doc_id", "clean_text", "n_pii"])

    return ds.map_batches(plant_and_redact, batch_format="pyarrow",
                          zero_copy_batch=True)


# --- BPE-style pre-tokenizer counting -------------------------------------

# GPT-2-style pre-tokenizer split, restricted to the RE2 subset (no
# lookahead): contractions, letter runs, digit runs, punctuation runs,
# whitespace runs are all separate pre-tokens. Identical pattern runs on
# both sides of the oracle (Arrow and DuckDB both embed RE2).
BPE_PRETOKEN = (r"'(?:s|t|re|ve|m|ll|d)"
                r"| ?\p{L}+| ?\p{N}+| ?[^\s\p{L}\p{N}]+|\s+")


def docs_regex_tokens(sf_dir: str):
    """Per-doc BPE-style pre-token count (what a GPT-2-family tokenizer
    sees before merges — the budget number sequence packing and cost
    estimation actually need, vs naive whitespace splitting). One Arrow
    C++ regex pass per batch, no exchange. Oracled via
    len(regexp_extract_all) on the identical pattern."""
    import ray.data as rd

    ds = rd.read_parquet(f"{sf_dir}/documents.parquet",
                         columns=["doc_id", "text"])

    def count(batch: pa.Table) -> pa.Table:
        n = pc.count_substring_regex(batch.column("text"), BPE_PRETOKEN)
        return pa.table({"doc_id": batch.column("doc_id"),
                         "n_pretokens": n.cast(pa.int64())})

    return ds.map_batches(count, batch_format="pyarrow",
                          zero_copy_batch=True)


# --- cross-document duplicated n-gram spans -------------------------------

def _gram_stream(batch: pa.Table, n: int):
    """Vectorized n-gram window stream for a documents batch: one Arrow
    pass (split -> flatten -> n shifted takes -> C++ join). Returns
    (gram StringArray, doc Int64Array, start int64 ndarray — 0-based
    token position within the doc, n_tok int64 ndarray per window's
    doc) or None when the batch has no full window."""
    toks = pc.split_pattern(batch.column("text"), pattern=" ")
    flat = pc.list_flatten(toks).combine_chunks()
    parents = pc.list_parent_indices(toks).to_numpy()
    if len(flat) < n:
        return None
    # window start i is valid iff token i and token i+n-1 belong to
    # the same document (parents are monotone)
    valid = parents[:len(flat) - n + 1] == parents[n - 1:]
    idx = np.nonzero(valid)[0]
    if idx.size == 0:
        return None
    shifted = [flat.take(pa.array(idx + j)) for j in range(n)]
    gram = pc.binary_join_element_wise(*shifted, " ")
    rows = parents[idx]
    doc = batch.column("doc_id").take(pa.array(rows))
    lens = pc.list_value_length(toks).cast(pa.int64()).to_numpy()
    offsets = np.zeros(len(batch) + 1, np.int64)
    np.cumsum(lens, out=offsets[1:])
    start = idx - offsets[rows]
    return gram, doc, start, lens[rows], rows


_GRAM_HASH_MIX = np.uint64(0x9E3779B97F4A7C15)


def _gram_hash_stream(batch: pa.Table, n: int):
    """Hash-keyed twin of _gram_stream: 64-bit gram keys built by
    sequentially mixing the n token hashes of each window — the gram
    STRING is never constructed and the exchanged key is 8 B instead
    of ~60 B. Equal grams always hash equal; distinct grams collide
    with p ~ m^2/2^65 (~7e-7 at the 2M-doc soak's 5M distinct grams) —
    acceptable for the dup-span coverage signal and equivalence-tested
    against the string path; at 10^12 docs extend the key to two
    mixed-constant columns co-located via partitioned_map_groups
    (128-bit) as SCALE.md notes. Returns (ghash uint64 ndarray, doc,
    start, n_tok, rows) or None."""
    from .sketch import _hash64

    toks = pc.split_pattern(batch.column("text"), pattern=" ")
    flat = pc.list_flatten(toks).combine_chunks()
    parents = pc.list_parent_indices(toks).to_numpy()
    if len(flat) < n:
        return None
    valid = parents[:len(flat) - n + 1] == parents[n - 1:]
    idx = np.nonzero(valid)[0]
    if idx.size == 0:
        return None
    # hash DISTINCT tokens once (Zipf: the dictionary is ~100x smaller
    # than the stream) and scatter via the dictionary codes
    flat_d = flat.dictionary_encode()
    if isinstance(flat_d, pa.ChunkedArray):
        flat_d = flat_d.combine_chunks()
    codes = flat_d.indices.to_numpy(zero_copy_only=False).astype(np.int64)
    th = _hash64(flat_d.dictionary.to_numpy(zero_copy_only=False))[codes]
    acc = np.zeros(idx.size, np.uint64)
    with np.errstate(over="ignore"):
        for j in range(n):
            acc = (acc * _GRAM_HASH_MIX) ^ th[idx + j]
    rows = parents[idx]
    doc = batch.column("doc_id").take(pa.array(rows))
    lens = pc.list_value_length(toks).cast(pa.int64()).to_numpy()
    offsets = np.zeros(len(batch) + 1, np.int64)
    np.cumsum(lens, out=offsets[1:])
    start = idx - offsets[rows]
    return acc, doc, start, lens[rows], rows


_GRAM_PARTIAL_EMPTY = pa.table({"gram": pa.array([], pa.string()),
                                "n_docs": pa.array([], pa.int64()),
                                "n_occ": pa.array([], pa.int64())})


def _gram_partial(batch: pa.Table, n: int) -> pa.Table:
    """Per-batch per-gram (n_docs, n_occ) partials. Exact across the
    downstream grouped-Sum exchange because a document's text is a
    single row — its grams never straddle batches."""
    st = _gram_stream(batch, n)
    if st is None:
        return _GRAM_PARTIAL_EMPTY
    gram, doc = st[0], st[1]
    pairs = pa.table({"gram": gram, "doc": doc}) \
        .group_by(["gram", "doc"]).aggregate([([], "count_all")])
    g = pairs.group_by("gram").aggregate(
        [("count_all", "sum"), ("doc", "count")])
    return pa.table({"gram": g.column("gram"),
                     "n_docs": g.column("doc_count").cast(pa.int64()),
                     "n_occ": g.column("count_all_sum").cast(pa.int64())})


_GHASH_PARTIAL_EMPTY = pa.table({"ghash": pa.array([], pa.int64()),
                                 "n_docs": pa.array([], pa.int64())})


def _ghash_partial(batch: pa.Table, n: int) -> pa.Table:
    """Hash-keyed per-batch per-gram distinct-doc partials (int64
    group_by — measured far cheaper than the string group_by + string
    exchange of _gram_partial)."""
    st = _gram_hash_stream(batch, n)
    if st is None:
        return _GHASH_PARTIAL_EMPTY
    ghash, doc = st[0].view(np.int64), st[1]
    pairs = pa.table({"ghash": pa.array(ghash, pa.int64()),
                      "doc": doc}) \
        .group_by(["ghash", "doc"]).aggregate([])
    g = pairs.group_by("ghash").aggregate([("doc", "count")])
    return pa.table({"ghash": g.column("ghash"),
                     "n_docs": g.column("doc_count").cast(pa.int64())})


def _covered_tokens(start: np.ndarray, seg_starts: np.ndarray,
                    n: int) -> np.ndarray:
    """Union length of fixed-width [s, s+n) intervals per segment.
    ``start`` must be sorted within each segment (gram streams are —
    they're emitted in position order). Equal-width intervals sorted by
    start are also sorted by end, so each window past the first adds
    min(gap, n) new tokens."""
    if start.size == 0:
        return np.zeros(0, np.int64)
    gaps = np.minimum(np.diff(start), n).astype(np.int64)
    gaps = np.clip(gaps, 0, n)
    first = np.zeros(start.size, np.int64)
    first[seg_starts] = n
    contrib = np.concatenate([[n], gaps])
    contrib[seg_starts] = 0
    contrib = contrib + first
    return np.add.reduceat(contrib, seg_starts)


def docs_dup_spans(sf_dir: str, n: int = 8, k: int = 50):
    """Cross-document duplicated n-gram spans: every n-token window that
    occurs in >= 2 distinct documents, with corpus-wide document and
    occurrence counts (top-k by spread). This is the span-level exact
    duplication signal of Lee et al., "Deduplicating Training Data Makes
    Language Models Better" (ExactSubstr at fixed n-gram granularity) —
    the doc-level companions are docs_exact_dedup / docs_minhash_pairs.

    Scale shape: each batch builds its n-gram stream in ONE vectorized
    Arrow pass (split -> flatten -> n shifted takes -> C++
    binary_join_element_wise) and pre-reduces to per-gram partials
    carrying (n_docs, n_occ). A document's text is a single row, so its
    grams never straddle batches and in-batch distinct-doc counts sum
    exactly across the one grouped-Sum exchange; the exchange carries
    one row per distinct gram per batch, never one row per token
    position. At 10^12 docs the exchanged key would be a 128-bit gram
    hash with the string resolved only for the final top-k; here the
    string itself is the key so the DuckDB oracle groups on it.
    Output: (gram, n_docs, n_occ), n_docs desc, n_occ desc, gram asc,
    top k."""
    from ray.data.aggregate import Sum

    from .relational import _default_parts, read

    ds = read(sf_dir, "documents", columns=["doc_id", "text"])
    agg = (ds.map_batches(lambda b: _gram_partial(b, n),
                          batch_format="pyarrow", zero_copy_batch=True)
           .repartition(_default_parts())  # coalesce slim partial blocks
           .groupby("gram").aggregate(Sum("n_docs", alias_name="n_docs"),
                                      Sum("n_occ", alias_name="n_occ")))

    def shared(t: pa.Table) -> pa.Table:
        return t.filter(pc.greater_equal(t.column("n_docs"), pa.scalar(2)))

    return (agg.map_batches(shared, batch_format="pyarrow",
                            zero_copy_batch=True)
            .sort(["n_docs", "n_occ", "gram"],
                  descending=[True, True, False]).limit(k))


def _dup_gram_ds(sf_dir: str, n: int, docs=None, key: str = "gram"):
    """Materialized slim Dataset of grams occurring in >= 2 distinct
    docs (the shared pass-1 of the span-dup operators). ``docs``
    overrides the table read (composites pass an already-filtered
    corpus). ``key="hash"`` exchanges 8-byte gram hashes instead of
    gram strings (column "ghash"; see _gram_hash_stream for the
    collision bound) — pass-1 measured 4x faster at soak scale."""
    from ray.data.aggregate import Sum

    from .relational import _default_parts, read

    ds = docs if docs is not None \
        else read(sf_dir, "documents", columns=["doc_id", "text"])
    if key == "hash":
        # almost every gram is unique, so a per-KEY groupby aggregates
        # ~0 rows away while paying per-group machinery for millions of
        # groups (measured 29 s of a 33 s pass at 200k docs). The
        # partitioned fold sorts each partition's int64 keys once and
        # reduceats — same exchange volume, vectorized reduction.
        from .relational import partitioned_map_groups

        parts = ds.map_batches(lambda b: _ghash_partial(b, n),
                               batch_format="pyarrow",
                               zero_copy_batch=True)

        def fold(t: pa.Table) -> pa.Table:
            if t.num_rows == 0:
                return pa.table({"ghash": pa.array([], pa.int64())})
            g = t.column("ghash").to_numpy()
            nd = t.column("n_docs").to_numpy()
            order = np.argsort(g, kind="stable")
            g, nd = g[order], nd[order]
            seg = np.nonzero(np.concatenate([[True],
                                             g[1:] != g[:-1]]))[0]
            sums = np.add.reduceat(nd, seg)
            keep = sums >= 2
            return pa.table({"ghash": pa.array(g[seg][keep],
                                               pa.int64())})

        return partitioned_map_groups(parts, "ghash", fold).materialize()

    agg = (ds.map_batches(lambda b: _gram_partial(b, n),
                          batch_format="pyarrow", zero_copy_batch=True)
           .repartition(_default_parts())
           .groupby("gram").aggregate(Sum("n_docs", alias_name="n_docs")))

    def shared(t: pa.Table) -> pa.Table:
        t = t.filter(pc.greater_equal(t.column("n_docs"), pa.scalar(2)))
        return t.select(["gram"])

    return agg.map_batches(shared, batch_format="pyarrow",
                           zero_copy_batch=True).materialize()


DUP_SPAN_BROADCAST_MAX = 500_000  # dup grams; above this, join path


def docs_dup_span_frac(sf_dir: str, n: int = 8, verify: str = "auto",
                       gram_key: str = "hash"):
    """Per-document duplicated-span coverage: the fraction of each
    doc's token positions covered by at least one n-gram window that
    also occurs in ANOTHER document — the doc-level filtering signal of
    span-level exact dedup (Lee et al.), companion to docs_dup_spans.
    Output: (doc_id, n_tokens, dup_frac), dup_frac rounded to 6.

    Pass 1 builds the duplicated-gram set (grouped-Sum over per-batch
    gram partials, materialized slim). Pass 2 marks each doc's windows
    and computes the interval-union coverage — fixed-width windows
    sorted by position make the union a vectorized min(gap, n) scan.

    ``verify``: 'broadcast' ships the dup-gram set once via ray.put and
    does everything map-side in one scan (zero pass-2 exchange —
    coverage is in-batch because a doc is one row); 'join' never
    materializes the set on the driver: a Bloom prefilter drops
    definitely-unique windows map-side, the might-be-dup residue pays
    one copartitioned semi-join on the gram, and per-doc coverage
    finishes under a doc-keyed groupby (slim rows only — the scale
    path). 'auto' gates on the dup-set size. Both paths are
    equivalence-tested.

    ``gram_key``: "hash" (default) exchanges 8-byte gram hashes —
    strings are never built or shuffled (collision bound + the 128-bit
    10^12-doc extension documented at _gram_hash_stream; hash==string
    output equality is pytest-gated); "gram" keeps the string key."""
    import ray

    from .relational import copartitioned_map, read

    hashed = gram_key == "hash"
    col = "ghash" if hashed else "gram"
    stream = _gram_hash_stream if hashed else _gram_stream
    dup = _dup_gram_ds(sf_dir, n, key=gram_key)
    n_dup = dup.count()
    if verify == "auto":
        verify = "broadcast" if n_dup <= DUP_SPAN_BROADCAST_MAX else "join"

    docs = read(sf_dir, "documents", columns=["doc_id", "text"])

    def finish(doc_ids, n_toks, covered) -> pa.Table:
        frac = round_ha(covered / np.maximum(n_toks, 1), 6)
        return pa.table({"doc_id": pa.array(doc_ids, pa.int64()),
                         "n_tokens": pa.array(n_toks, pa.int64()),
                         "dup_frac": pa.array(frac, pa.float64())})

    if verify == "broadcast":
        chunks = list(dup.iter_batches(batch_format="pyarrow"))
        # a corpus with NO cross-doc duplicated grams yields zero
        # batches — broadcast an empty typed set, don't crash concat
        empty = pa.array([], pa.int64() if hashed else pa.string())
        dup_tbl = (pa.concat_tables(chunks) if chunks
                   else pa.table({col: empty}))
        set_ref = ray.put(dup_tbl.column(col).combine_chunks())

        def frac_batch(batch: pa.Table) -> pa.Table:
            from ..broadcast import get_broadcast

            toks = pc.split_pattern(batch.column("text"), pattern=" ")
            n_toks = pc.list_value_length(toks).cast(pa.int64()).to_numpy()
            doc_ids = batch.column("doc_id").to_numpy()
            covered = np.zeros(len(batch), np.int64)
            st = stream(batch, n)
            if st is not None:
                gram, _, start, _, rows = st
                if hashed:
                    gram = pa.array(gram.view(np.int64), pa.int64())
                hit = pc.is_in(
                    gram, value_set=get_broadcast(set_ref)).to_numpy(
                        zero_copy_only=False)
                rows_d, start_d = rows[hit], start[hit]
                if rows_d.size:
                    seg = np.nonzero(np.concatenate(
                        [[True], rows_d[1:] != rows_d[:-1]]))[0]
                    covered[rows_d[seg]] = _covered_tokens(start_d, seg, n)
            return finish(doc_ids, n_toks, covered)

        return docs.map_batches(frac_batch, batch_format="pyarrow",
                                zero_copy_batch=True)

    # join path: Bloom prefilter + copartitioned semi-join; the driver
    # never holds the dup-gram set, only the OR-merged fixed-size bitmap
    from .sketch import BloomFilter, bloom_ref_of

    bloom_ref = bloom_ref_of(dup, col, n_dup)

    def prep_docs(batch: pa.Table) -> pa.Table:
        # one baseline row per doc (start = null; key = doc id, so
        # baseline rows spread uniformly over the gram-hash partitions
        # instead of hot-spotting one; an accidental key match with a
        # real gram is harmless — baseline rows are kept
        # unconditionally in semi) + one row per might-be-dup window
        # (Bloom has no false negatives)
        from ..broadcast import get_broadcast_derived

        toks = pc.split_pattern(batch.column("text"), pattern=" ")
        n_toks = pc.list_value_length(toks).cast(pa.int64())
        base_key = (batch.column("doc_id") if hashed
                    else pc.cast(batch.column("doc_id"), pa.string()))
        base = pa.table({
            col: base_key,
            "doc_id": batch.column("doc_id"),
            "start": pa.nulls(len(batch), pa.int64()),
            "n_tok": n_toks,
        })
        st = stream(batch, n)
        if st is None:
            return base
        gram, doc, start, n_tok, _ = st
        if hashed:
            gram = pa.array(gram.view(np.int64), pa.int64())
        bf = get_broadcast_derived(bloom_ref, "bloom",
                                   BloomFilter.deserialize)
        # numpy in, not to_pylist: 20M+ Python objects per pass at
        # soak scale just to hash them again
        maybe = bf.might_contain(gram.to_numpy(zero_copy_only=False))
        wins = pa.table({
            col: gram.filter(pa.array(maybe)),
            "doc_id": doc.filter(pa.array(maybe)),
            "start": pa.array(start[maybe], pa.int64()),
            "n_tok": pa.array(n_tok[maybe], pa.int64()),
        })
        return pa.concat_tables([base, wins])

    def prep_dup(batch: pa.Table) -> pa.Table:
        nrows = batch.num_rows
        return pa.table({
            col: batch.column(col),
            "doc_id": pa.nulls(nrows, pa.int64()),
            "start": pa.nulls(nrows, pa.int64()),
            "n_tok": pa.nulls(nrows, pa.int64()),
        })

    def semi(parts: list[pa.Table]) -> pa.Table:
        pos, dup_side = parts
        is_base = pc.is_null(pos.column("start"))
        base = pos.filter(is_base)
        wins = pos.filter(pc.invert(is_base))
        keep = wins.filter(pc.is_in(wins.column(col),
                                    value_set=dup_side.column(col)
                                    .combine_chunks()))
        return pa.concat_tables([base, keep]) \
            .select(["doc_id", "start", "n_tok"])

    verified = copartitioned_map(
        [(docs, prep_docs), (dup, prep_dup)], col, semi)

    def per_doc(group: pa.Table) -> pa.Table:
        doc_ids = group.column("doc_id").to_numpy()
        order = np.argsort(doc_ids, kind="stable")
        g = group.take(pa.array(order))
        d = g.column("doc_id").to_numpy()
        is_win = pc.is_valid(g.column("start")).to_numpy(
            zero_copy_only=False)
        uniq, inv = np.unique(d, return_inverse=True)
        n_toks = np.zeros(uniq.size, np.int64)
        base_rows = ~is_win
        n_toks[inv[base_rows]] = g.column("n_tok").to_numpy(
            zero_copy_only=False)[base_rows]
        covered = np.zeros(uniq.size, np.int64)
        if is_win.any():
            dw = d[is_win]
            sw = g.column("start").to_numpy(zero_copy_only=False)[
                is_win].astype(np.int64)
            # windows arrive in arbitrary partition order: sort by
            # (doc, start) before the fixed-width union scan
            o2 = np.lexsort((sw, dw))
            dw, sw = dw[o2], sw[o2]
            seg = np.nonzero(np.concatenate(
                [[True], dw[1:] != dw[:-1]]))[0]
            cov = _covered_tokens(sw, seg, n)
            covered[np.searchsorted(uniq, dw[seg])] = cov
        frac = round_ha(covered / np.maximum(n_toks, 1), 6)
        return pa.table({"doc_id": pa.array(uniq, pa.int64()),
                         "n_tokens": pa.array(n_toks, pa.int64()),
                         "dup_frac": pa.array(frac, pa.float64())})

    # hash co-location, ONE per_doc call per partition: a per-GROUP
    # map_groups here means one Python call per document (1M+ calls at
    # soak scale); per_doc is written multi-key (sort + segment ops)
    from .relational import partitioned_map_groups

    return partitioned_map_groups(verified, "doc_id", per_doc)


def _despan_batchwise(batch: pa.Table, starts_by_row, n: int) -> pa.Table:
    """Rebuild each doc's text with the tokens covered by dup windows
    removed — fully vectorized: a +1/-1 difference array over the flat
    token stream marks covered runs (windows never straddle docs), the
    kept tokens re-list via fresh offsets, and one C++ binary_join
    rejoins. ``starts_by_row``: (row_idx ndarray, start ndarray) of dup
    windows, 0-based token positions."""
    toks = pc.split_pattern(batch.column("text"), pattern=" ")
    flat = pc.list_flatten(toks).combine_chunks()
    lens = pc.list_value_length(toks).cast(pa.int64()).to_numpy()
    offsets = np.zeros(len(batch) + 1, np.int64)
    np.cumsum(lens, out=offsets[1:])
    rows, starts = starts_by_row
    diff = np.zeros(len(flat) + 1, np.int64)
    flat_start = offsets[rows] + starts
    np.add.at(diff, flat_start, 1)
    np.add.at(diff, flat_start + n, -1)
    covered = np.cumsum(diff[:-1]) > 0
    kept_mask = ~covered
    kept = flat.filter(pa.array(kept_mask))
    kept_per_row = np.bincount(
        np.repeat(np.arange(len(batch)), lens)[kept_mask],
        minlength=len(batch)).astype(np.int64)
    new_off = np.zeros(len(batch) + 1, np.int64)
    np.cumsum(kept_per_row, out=new_off[1:])
    lst = pa.ListArray.from_arrays(pa.array(new_off, pa.int32()), kept)
    return pa.table({
        "doc_id": batch.column("doc_id"),
        "text_clean": pc.binary_join(lst, " "),
        "n_kept": pa.array(kept_per_row, pa.int64()),
    })


def docs_remove_dup_spans(sf_dir: str, n: int = 8, verify: str = "auto",
                          docs=None):
    """The span-DELETION transform of Lee et al. ExactSubstr dedup:
    rewrite every document with each token covered by a cross-document
    duplicated n-gram window removed. Output (doc_id, text_clean,
    n_kept) — the actual cleaning step the metrics twins
    (docs_dup_spans / docs_dup_span_frac) inform.

    'broadcast' ships the dup-gram set once and despans map-side in a
    single scan; 'join' (the scale path, auto-selected above the gate)
    never holds the set on the driver: dup positions are verified by a
    Bloom-prefiltered copartitioned semi-join on the gram, then one
    doc_id copartition co-locates each doc's text row with its dup
    positions and the same vectorized rebuild runs per partition (text
    crosses exactly one exchange). Paths are equivalence-tested.

    ``docs`` overrides the table read with an already-filtered corpus
    (pass a MATERIALIZED dataset — both passes consume it)."""
    import ray

    from .relational import copartitioned_map, read

    if docs is None:
        docs = read(sf_dir, "documents", columns=["doc_id", "text"])
    dup = _dup_gram_ds(sf_dir, n, docs=docs)
    n_dup = dup.count()
    if verify == "auto":
        verify = "broadcast" if n_dup <= DUP_SPAN_BROADCAST_MAX else "join"

    if verify == "broadcast":
        chunks = list(dup.iter_batches(batch_format="pyarrow"))
        # a corpus with NO cross-doc duplicated grams yields zero
        # batches — broadcast an empty typed set, don't crash concat
        dup_tbl = (pa.concat_tables(chunks) if chunks
                   else pa.table({"gram": pa.array([], pa.string())}))
        set_ref = ray.put(dup_tbl.column("gram").combine_chunks())

        def despan(batch: pa.Table) -> pa.Table:
            from ..broadcast import get_broadcast

            st = _gram_stream(batch, n)
            if st is None:
                empty = (np.zeros(0, np.int64), np.zeros(0, np.int64))
                return _despan_batchwise(batch, empty, n)
            gram, _, start, _, rows = st
            hit = pc.is_in(gram, value_set=get_broadcast(set_ref)) \
                .to_numpy(zero_copy_only=False)
            return _despan_batchwise(batch, (rows[hit], start[hit]), n)

        return docs.map_batches(despan, batch_format="pyarrow",
                                zero_copy_batch=True)

    # join path: verified (doc_id, start) positions via Bloom +
    # copartitioned semi-join (driver holds only the OR-merged bitmap)
    from .sketch import BloomFilter, bloom_ref_of

    bloom_ref = bloom_ref_of(dup, "gram", n_dup)

    def prep_wins(batch: pa.Table) -> pa.Table:
        from ..broadcast import get_broadcast_derived

        st = _gram_stream(batch, n)
        if st is None:
            return pa.table({"gram": pa.array([], pa.string()),
                             "doc_id": pa.array([], pa.int64()),
                             "start": pa.array([], pa.int64())})
        gram, doc, start, _, _ = st
        bf = get_broadcast_derived(bloom_ref, "bloom",
                                   BloomFilter.deserialize)
        # numpy in, not to_pylist: 20M+ Python objects per pass at
        # soak scale just to hash them again
        maybe = bf.might_contain(gram.to_numpy(zero_copy_only=False))
        return pa.table({"gram": gram.filter(pa.array(maybe)),
                         "doc_id": doc.filter(pa.array(maybe)),
                         "start": pa.array(start[maybe], pa.int64())})

    def prep_dup(batch: pa.Table) -> pa.Table:
        return pa.table({"gram": batch.column("gram"),
                         "doc_id": pa.nulls(batch.num_rows, pa.int64()),
                         "start": pa.nulls(batch.num_rows, pa.int64())})

    def semi(parts: list[pa.Table]) -> pa.Table:
        wins, dup_side = parts
        keep = wins.filter(pc.is_in(
            wins.column("gram"),
            value_set=dup_side.column("gram").combine_chunks()))
        return keep.select(["doc_id", "start"])

    positions = copartitioned_map(
        [(docs, prep_wins), (dup, prep_dup)], "gram", semi)

    def prep_text(batch: pa.Table) -> pa.Table:
        return pa.table({"doc_id": batch.column("doc_id"),
                         "text": batch.column("text"),
                         "start": pa.nulls(len(batch), pa.int64())})

    def prep_pos(batch: pa.Table) -> pa.Table:
        return pa.table({"doc_id": batch.column("doc_id"),
                         "text": pa.nulls(batch.num_rows, pa.string()),
                         "start": batch.column("start")})

    def rebuild(parts: list[pa.Table]) -> pa.Table:
        trows, prows = parts
        trows = trows.select(["doc_id", "text"])
        d = trows.column("doc_id").to_numpy()
        # map each position row to its doc's row index in this partition
        order = np.argsort(d, kind="stable")
        pd_ = prows.column("doc_id").to_numpy()
        ps = prows.column("start").to_numpy(zero_copy_only=False)
        ri = order[np.searchsorted(d[order], pd_)]
        o2 = np.lexsort((ps, ri))
        return _despan_batchwise(
            trows, (ri[o2], ps[o2].astype(np.int64)), n)

    return copartitioned_map(
        [(docs, prep_text), (positions, prep_pos)], "doc_id", rebuild)


def docs_clean_corpus(sf_dir: str, n: int = 8, min_tokens: int = 20,
                      min_quality: float = 40.0):
    """End-to-end corpus-curation COMPOSITE, chaining the oracled
    stages and staying exactly hash-checkable end to end: exact dedup
    (min doc_id per md5(text)) -> cross-document duplicated-span
    DELETION over the deduped corpus -> token-count and closed-form
    quality filters over the cleaned text. Output (doc_id, n_kept,
    quality_score, text_clean).

    Scale shape: the dedup phase exchanges only 48 B/doc (md5, doc_id)
    partials and broadcasts only LOSER ids (dup-rate-sized); span
    deletion reuses the shared broadcast / Bloom+join machinery over
    the materialized kept corpus; the quality gate is one map-side
    polars pass with no exchange."""
    import ray

    from .relational import partitioned_map_groups, read

    docs = read(sf_dir, "documents", columns=["doc_id", "text"])

    def md5_slim(batch: pa.Table) -> pa.Table:
        return pa.table({
            "md5": pa.array(md5_hex(batch.column("text").to_pylist()),
                            pa.string()),
            "doc_id": batch.column("doc_id"),
        })

    pairs = docs.map_batches(md5_slim, batch_format="pyarrow",
                             zero_copy_batch=True)

    def losers(part: pa.Table) -> pa.Table:
        # all rows of an md5 co-locate: segment min by sorted hash,
        # every non-min id is a dup loser
        idx = pc.sort_indices(part, sort_keys=[("md5", "ascending"),
                                               ("doc_id", "ascending")])
        g = part.take(idx)
        h = g.column("md5").to_numpy(zero_copy_only=False)
        ids = g.column("doc_id").to_numpy()
        first = np.concatenate([[True], h[1:] != h[:-1]])
        return pa.table({"doc_id": pa.array(ids[~first], pa.int64())})

    drop_chunks = [b.column("doc_id").combine_chunks()
                   for b in partitioned_map_groups(pairs, "md5", losers)
                   .iter_batches(batch_format="pyarrow") if b.num_rows]
    drop = (pa.concat_arrays(drop_chunks) if drop_chunks
            else pa.array([], pa.int64()))
    drop_ref = ray.put(drop)

    def keep_fn(batch: pa.Table) -> pa.Table:
        from ..broadcast import get_broadcast

        d = get_broadcast(drop_ref)
        if len(d) == 0:
            return batch
        return batch.filter(pc.invert(
            pc.is_in(batch.column("doc_id"), value_set=d)))

    kept = docs.map_batches(keep_fn, batch_format="pyarrow",
                            zero_copy_batch=True).materialize()
    clean = docs_remove_dup_spans(sf_dir, n=n, docs=kept)

    def final(batch: pa.Table) -> pa.Table:
        q = quality_score_batch(pa.table({
            "doc_id": batch.column("doc_id"),
            "text": batch.column("text_clean"),
        }))
        out = pa.table({
            "doc_id": batch.column("doc_id"),
            "n_kept": batch.column("n_kept"),
            "quality_score": q.column("quality_score"),
            "text_clean": batch.column("text_clean"),
        })
        mask = pc.and_(
            pc.greater_equal(out.column("n_kept"),
                             pa.scalar(min_tokens, pa.int64())),
            pc.greater_equal(out.column("quality_score"),
                             pa.scalar(float(min_quality))))
        return out.filter(mask)

    return clean.map_batches(final, batch_format="pyarrow",
                             zero_copy_batch=True)


def docs_weighted_sample(sf_dir: str, k: int = 100):
    """Weighted sampling WITHOUT replacement (Efraimidis–Spirakis
    A-ES): each doc draws a deterministic pseudo-uniform u from
    md5(doc_id) and competes with key ln(u)/weight — a monotone
    transform of the classic u^(1/w) — so the global top-k keys form a
    sample with inclusion probability increasing in the weight
    (n_chars). Hash-derived u means no RNG state: re-run- and
    partitioning-stable, the same trick as docs_split/docs_sample, and
    exactly replicable by the DuckDB oracle (ln and the hex-parse are
    bit-identical across engines — verified).

    Scale shape: per-batch partial top-k (<= k slim rows leave each
    block) + one tiny final sort — the mergeable top-k pattern (O4).
    Output (doc_id, n_chars): the selected sample."""
    from .relational import read

    ds = read(sf_dir, "documents", columns=["doc_id", "n_chars"])
    denom = np.float64(16 ** 12)

    def partial(batch: pa.Table) -> pa.Table:
        ids = batch.column("doc_id").to_numpy()
        w = batch.column("n_chars").to_numpy().astype(np.float64)
        u = np.array(
            [int(hashlib.md5(str(i).encode()).hexdigest()[:12], 16)
             for i in ids], np.float64) / denom
        key = np.log(u) / np.maximum(w, 1.0)
        top = np.lexsort((ids, -key))[:k]
        return pa.table({
            "doc_id": pa.array(ids[top], pa.int64()),
            "n_chars": batch.column("n_chars").take(pa.array(top)),
            "_key": pa.array(key[top], pa.float64()),
        })

    sampled = (ds.map_batches(partial, batch_format="pyarrow",
                              zero_copy_batch=True)
               .sort(["_key", "doc_id"], descending=[True, False])
               .limit(k))
    return sampled.map_batches(lambda t: t.drop_columns(["_key"]),
                               batch_format="pyarrow")


def _batch_bigrams(batch: pa.Table):
    """Intra-doc adjacent token pairs of a batch: ("w1 w2" strings,
    parent row indices), or None when the batch has none."""
    toks = pc.split_pattern(batch.column("text"), pattern=" ")
    flat = pc.list_flatten(toks).combine_chunks()
    parents = pc.list_parent_indices(toks).to_numpy()
    if len(flat) < 2:
        return None
    same = parents[:-1] == parents[1:]
    if not same.any():
        return None
    w1 = flat.slice(0, len(flat) - 1).filter(pa.array(same))
    w2 = flat.slice(1).filter(pa.array(same))
    return (pc.binary_join_element_wise(w1, w2, " "),
            parents[:-1][same])


def _bigram_logprob_join(ds, counts):
    """Vocabulary-scale path for docs_bigram_logprob: the logprob table
    never ships whole. (1) prefix totals + lp = ln(n / pn) via ONE
    w1-keyed exchange over the slim (bigram, n) table — integer pn sums
    are exact, so lp is bit-identical to the broadcast _lp_table; (2)
    hash join of the per-doc bigram-frequency stream against the lp
    table (_vocab_join, one bigram-keyed exchange); (3) one doc-keyed
    merge against the full doc-id list so zero-bigram docs emit
    (0.0, 0) exactly like the broadcast path."""
    from .relational import copartitioned_map, partitioned_map_groups

    def add_w1(t: pa.Table) -> pa.Table:
        first = pc.list_element(
            pc.split_pattern(t.column("bigram"), pattern=" ",
                             max_splits=1), 0)
        return pa.table({"bigram": t.column("bigram"),
                         "n": t.column("n"), "w1": first})

    def lp_part(part: pa.Table) -> pa.Table:
        if part.num_rows == 0:
            return pa.table({"term": pa.array([], pa.string()),
                             "lp": pa.array([], pa.float64())})
        w1 = part.column("w1").to_numpy(zero_copy_only=False)
        nv = part.column("n").to_numpy().astype(np.int64)
        keys = np.unique(w1)
        idx = np.searchsorted(keys, w1)
        pn = np.bincount(idx, weights=nv.astype(np.float64),
                         minlength=len(keys)).astype(np.int64)
        lp = np.log(nv.astype(np.float64) / pn[idx].astype(np.float64))
        return pa.table({"term": part.column("bigram"),
                         "lp": pa.array(lp, pa.float64())})

    lp_tbl = partitioned_map_groups(
        counts.map_batches(add_w1, batch_format="pyarrow",
                           zero_copy_batch=True), "w1", lp_part)

    def doc_bigram_freqs(batch: pa.Table) -> pa.Table:
        bg = _batch_bigrams(batch)
        if bg is None:
            return pa.table({"doc_id": pa.array([], pa.int64()),
                             "term": pa.array([], pa.string()),
                             "tf": pa.array([], pa.int64())})
        grams, rows = bg
        d = grams.dictionary_encode()
        if isinstance(d, pa.ChunkedArray):
            d = d.combine_chunks()
        codes = d.indices.to_numpy(zero_copy_only=False).astype(np.int64)
        v = max(len(d.dictionary), 1)
        pair, bf = np.unique(rows.astype(np.int64) * v + codes,
                             return_counts=True)
        prow, pcode = pair // v, pair % v
        return pa.table({
            "doc_id": batch.column("doc_id").take(
                pa.array(prow, pa.int64())),
            "term": d.dictionary.take(pa.array(pcode, pa.int64())),
            "tf": pa.array(bf.astype(np.int64), pa.int64())})

    bf_ds = ds.map_batches(doc_bigram_freqs, batch_format="pyarrow",
                           zero_copy_batch=True)
    joined = _vocab_join(bf_ds, lp_tbl, "lp",
                         lambda tf, lp: tf.astype(np.float64) * lp)

    def prep_contrib(t: pa.Table) -> pa.Table:
        return pa.table({"doc_id": t.column("doc_id"),
                         "score": t.column("score"),
                         "tf": t.column("tf")})

    def prep_docs(t: pa.Table) -> pa.Table:
        return pa.table({"doc_id": t.column("doc_id"),
                         "score": pa.nulls(t.num_rows, pa.float64()),
                         "tf": pa.nulls(t.num_rows, pa.float64())})

    def per_doc(parts: list[pa.Table]) -> pa.Table:
        cp, dp = parts
        if dp.num_rows == 0:
            return pa.table({"doc_id": pa.array([], pa.int64()),
                             "mean_logprob": pa.array([], pa.float64()),
                             "n_bigrams": pa.array([], pa.int64())})
        docs = np.sort(dp.column("doc_id").to_numpy())
        cdoc = cp.column("doc_id").to_numpy()
        idx = np.searchsorted(docs, cdoc)
        sums = np.bincount(idx, weights=cp.column("score").to_numpy(),
                           minlength=len(docs))
        cnts = np.bincount(idx, weights=cp.column("tf").to_numpy(),
                           minlength=len(docs)).astype(np.int64)
        mean = round_ha(sums / np.maximum(cnts, 1), 6)
        return pa.table({
            "doc_id": pa.array(docs, pa.int64()),
            "mean_logprob": pa.array(mean, pa.float64()),
            "n_bigrams": pa.array(cnts, pa.int64())})

    all_docs = ds.select_columns(["doc_id"])
    return copartitioned_map(
        [(joined, prep_contrib), (all_docs, prep_docs)],
        "doc_id", per_doc)


def docs_bigram_logprob(sf_dir: str, mode: str = "auto"):
    """Bigram-LM quality score (the conditional-probability step up
    from docs_unigram_logprob): mean ln p(w_i | w_{i-1}) per doc with
    the corpus itself as the LM, p = bigram count / prefix total.
    Pass 1 builds corpus bigram counts (adjacent-pair partials on the
    flattened token stream -> grouped Sum). Below the
    VOCAB_BROADCAST_MAX_TERMS gate the table broadcasts once (prefix
    totals derive from it per worker) and pass 2 rebuilds each batch's
    bigrams with one pc.index_in + bincount-by-row. Above it — a
    web-scale bigram vocabulary is unbounded — the logprob table stays
    distributed: prefix totals via one w1-keyed exchange over the
    (slim) count table, then a hash join of the exploded per-doc
    bigram-frequency stream and one doc-keyed merge against the full
    doc-id list (docs with < 2 tokens score 0.0 over 0 bigrams in both
    modes; equivalence-tested). Oracled (lateral bigrams + two joins +
    avg(ln))."""
    import ray.data as rd

    from .relational import broadcast_lookup, partitioned_map_groups

    ds = rd.read_parquet(f"{sf_dir}/documents.parquet",
                         columns=["doc_id", "text"])

    _bigrams = _batch_bigrams

    def partial_bc(batch: pa.Table) -> pa.Table:
        bg = _bigrams(batch)
        if bg is None:
            return pa.table({"bigram": pa.array([], pa.string()),
                             "n": pa.array([], pa.int64())})
        vc = bg[0].value_counts()
        if isinstance(vc, pa.ChunkedArray):
            vc = vc.combine_chunks()
        return pa.table({"bigram": vc.field("values"),
                         "n": vc.field("counts").cast(pa.int64())})

    def sum_bc(t: pa.Table) -> pa.Table:
        g = t.group_by("bigram").aggregate([("n", "sum")])
        return pa.table({"bigram": g.column("bigram"),
                         "n": g.column("n_sum").cast(pa.int64())})

    counts = partitioned_map_groups(
        ds.map_batches(partial_bc, batch_format="pyarrow",
                       zero_copy_batch=True), "bigram", sum_bc).materialize()

    if _resolve_vocab_mode(mode, counts) == "join":
        return _bigram_logprob_join(ds, counts)

    vocab_ref = broadcast_lookup(counts, "bigram", ["n"])

    def _lp_table(build):
        keys, (bn,) = build
        # a token never contains the separator, so the text before the
        # FIRST space is exactly w1 (even when w2 is empty)
        first = pc.list_element(
            pc.split_pattern(keys, pattern=" ", max_splits=1), 0)
        d = first.dictionary_encode()
        if isinstance(d, pa.ChunkedArray):
            d = d.combine_chunks()
        codes = d.indices.to_numpy(zero_copy_only=False).astype(np.int64)
        nv = bn.to_numpy().astype(np.int64)
        pn = np.zeros(int(codes.max()) + 1 if len(codes) else 1, np.int64)
        np.add.at(pn, codes, nv)
        lp = np.log(nv.astype(np.float64) / pn[codes].astype(np.float64))
        return keys, lp

    def score(batch: pa.Table) -> pa.Table:
        from ..broadcast import get_broadcast_derived

        keys, lp_vals = get_broadcast_derived(vocab_ref, "lp2", _lp_table)
        n = batch.num_rows
        bg = _bigrams(batch)
        if bg is None:
            zero = np.zeros(n)
            return pa.table({
                "doc_id": batch.column("doc_id"),
                "mean_logprob": pa.array(zero, pa.float64()),
                "n_bigrams": pa.array(zero.astype(np.int64), pa.int64()),
            })
        grams, rows = bg
        idx = pc.index_in(grams, value_set=keys).to_numpy(
            zero_copy_only=False).astype(np.int64)
        lp = lp_vals[idx]
        sums = np.bincount(rows, weights=lp, minlength=n)
        cnts = np.bincount(rows, minlength=n)
        mean = round_ha(sums / np.maximum(cnts, 1), 6)
        return pa.table({
            "doc_id": batch.column("doc_id"),
            "mean_logprob": pa.array(mean, pa.float64()),
            "n_bigrams": pa.array(cnts.astype(np.int64), pa.int64())})

    return ds.map_batches(score, batch_format="pyarrow",
                          zero_copy_batch=True)


# --- DSIR importance resampling --------------------------------------------

def docs_dsir_topk(sf_dir: str, target_lang: str = "en", k: int = 100,
                   mode: str = "auto"):
    """Data Selection via Importance Resampling (Xie et al. 2023,
    arXiv:2302.03169), unigram-feature variant: score every document by
    its importance weight under a target-domain LM vs the raw-corpus LM
    and keep the global top-k.

      lr(t)  = ln((c_tgt(t)+1)/(N_tgt+V)) - ln((c_all(t)+1)/(N_all+V))
      w(doc) = sum over token instances of lr(t),  rounded half-away 6

    (add-one smoothing over the shared corpus vocabulary V; the target
    model here is the ``lang == target_lang`` subset — the "formal
    text" proxy of the paper becomes a metadata-defined domain).

    Scale shape mirrors docs_unigram_logprob exactly: pass 1 folds
    (term, n_tgt, n_all) partials into one vocabulary-bounded grouped
    sum; below VOCAB_BROADCAST_MAX_TERMS the log-ratio table broadcasts
    and pass 2 is one index_in + bincount per batch fused with a
    per-batch partial top-k (<= k slim rows leave each block, the O4
    mergeable pattern); above it the exploded (doc_id, term, tf)
    stream hash-joins the distributed ratio table (_vocab_join), one
    doc-keyed exchange folds the weight, then the same partial top-k.
    Oracled (unnest + filtered counts + join + sum(ln ratios))."""
    import ray.data as rd

    from .relational import broadcast_lookup, partitioned_map_groups

    ds = rd.read_parquet(f"{sf_dir}/documents.parquet",
                         columns=["doc_id", "text", "lang"])

    def partial_tc(batch: pa.Table) -> pa.Table:
        toks = pc.split_pattern(batch.column("text"), pattern=" ")
        flat = pc.list_flatten(toks)
        parents = pc.list_parent_indices(toks)
        tgt = pc.equal(batch.column("lang"), target_lang)
        tgt_tok = pc.take(tgt, parents).cast(pa.int64())
        g = pa.table({"term": flat, "t": tgt_tok}).group_by("term") \
            .aggregate([("t", "sum"), ("t", "count")])
        return pa.table({
            "term": g.column("term"),
            "n_tgt": g.column("t_sum").cast(pa.int64()),
            "n_all": g.column("t_count").cast(pa.int64())})

    def sum_tc(t: pa.Table) -> pa.Table:
        g = t.group_by("term").aggregate([("n_tgt", "sum"),
                                          ("n_all", "sum")])
        return pa.table({"term": g.column("term"),
                         "n_tgt": g.column("n_tgt_sum").cast(pa.int64()),
                         "n_all": g.column("n_all_sum").cast(pa.int64())})

    counts = partitioned_map_groups(
        ds.map_batches(partial_tc, batch_format="pyarrow",
                       zero_copy_batch=True), "term", sum_tc).materialize()

    # scalars fold the bounded, already-pinned table
    n_tgt_total = counts.sum("n_tgt") or 0
    n_all_total = counts.sum("n_all") or 0
    vsize = counts.count()

    def add_lr(t: pa.Table) -> pa.Table:
        nt = t.column("n_tgt").to_numpy().astype(np.float64)
        na = t.column("n_all").to_numpy().astype(np.float64)
        lr = (np.log((nt + 1.0) / float(n_tgt_total + vsize))
              - np.log((na + 1.0) / float(n_all_total + vsize)))
        return pa.table({"term": t.column("term"),
                         "lr": pa.array(lr, pa.float64())})

    lr_ds = counts.map_batches(add_lr, batch_format="pyarrow")

    def topk_part(t: pa.Table) -> pa.Table:
        ids = t.column("doc_id").to_numpy()
        w = t.column("dsir_weight").to_numpy()
        top = np.lexsort((ids, -w))[:k]
        return pa.table({
            "doc_id": pa.array(ids[top], pa.int64()),
            "dsir_weight": pa.array(w[top], pa.float64())})

    if _resolve_vocab_mode(mode, counts) == "join":
        tf_ds = ds.map_batches(_doc_term_freqs, batch_format="pyarrow",
                               zero_copy_batch=True)
        joined = _vocab_join(tf_ds, lr_ds, "lr",
                             lambda tf, lr: tf.astype(np.float64) * lr)

        def wsum_part(part: pa.Table) -> pa.Table:
            if part.num_rows == 0:
                return pa.table({
                    "doc_id": pa.array([], pa.int64()),
                    "dsir_weight": pa.array([], pa.float64())})
            doc = part.column("doc_id").to_numpy()
            docs = np.unique(doc)
            idx = np.searchsorted(docs, doc)
            sums = np.bincount(idx,
                               weights=part.column("score").to_numpy(),
                               minlength=len(docs))
            return pa.table({
                "doc_id": pa.array(docs, pa.int64()),
                "dsir_weight": pa.array(round_ha(sums, 6), pa.float64())})

        weights = partitioned_map_groups(joined, "doc_id", wsum_part)
        pooled = weights.map_batches(topk_part, batch_format="pyarrow",
                                     zero_copy_batch=True)
    else:
        vocab_ref = broadcast_lookup(lr_ds, "term", ["lr"])

        def _lr_table(build):
            keys, (lr,) = build
            return keys, lr.to_numpy()

        def score_topk(batch: pa.Table) -> pa.Table:
            from ..broadcast import get_broadcast_derived

            keys, lr_vals = get_broadcast_derived(vocab_ref, "dsir",
                                                  _lr_table)
            toks = pc.split_pattern(batch.column("text"), pattern=" ")
            flat = pc.list_flatten(toks)
            parents = pc.list_parent_indices(toks).to_numpy()
            idx = pc.index_in(flat, value_set=keys).to_numpy(
                zero_copy_only=False).astype(np.int64)
            sums = np.bincount(parents, weights=lr_vals[idx],
                               minlength=batch.num_rows)
            return topk_part(pa.table({
                "doc_id": batch.column("doc_id"),
                "dsir_weight": pa.array(round_ha(sums, 6),
                                        pa.float64())}))

        pooled = ds.map_batches(score_topk, batch_format="pyarrow",
                                zero_copy_batch=True)

    return (pooled.sort(["dsir_weight", "doc_id"],
                        descending=[True, False]).limit(k))


# --- unicode text normalization ---------------------------------------------

def normalize_text_batch(batch: pa.Table,
                         text_col: str = "text") -> pa.Table:
    """NFC unicode normalization + explicit-class whitespace collapse
    ([ \\t\\n\\r\\f]+ -> one space; the class is spelled out because
    regex engines disagree on \\s unicode semantics) + space trim.

    Vectorized: the collapse/trim run as Arrow RE2 kernels over the
    whole column; NFC runs in Python ONLY for the (web-corpus-rare)
    non-ASCII rows — `pc.string_is_ascii` splits them off, and NFC is
    the identity on ASCII."""
    import unicodedata

    col = batch.column(text_col)
    ascii_mask = pc.string_is_ascii(col)
    if pc.all(ascii_mask).as_py() is not True:
        keep = ascii_mask.to_numpy(zero_copy_only=False)
        texts = col.to_pylist()
        fixed = [t if ok or t is None else unicodedata.normalize("NFC", t)
                 for t, ok in zip(texts, keep)]
        col = pa.chunked_array([pa.array(fixed, pa.string())])
    col = pc.replace_substring_regex(col, pattern="[ \t\n\r\f]+",
                                     replacement=" ")
    col = pc.utf8_trim(col, characters=" ")
    return batch.set_column(batch.schema.get_field_index(text_col),
                            text_col, col)


def docs_normalize_text(sf_dir: str):
    """Per-doc normalization fingerprint: (doc_id, norm_md5, changed).
    md5 keeps the compared payload slim; ``changed`` pins the collapse
    actually firing. Oracled (DuckDB nfc_normalize + regexp_replace +
    trim + md5)."""
    import ray.data as rd

    ds = rd.read_parquet(f"{sf_dir}/documents.parquet",
                         columns=["doc_id", "text"])

    def fingerprint(batch: pa.Table) -> pa.Table:
        norm = normalize_text_batch(batch).column("text")
        changed = pc.not_equal(norm, batch.column("text"))
        return pa.table({
            "doc_id": batch.column("doc_id"),
            "norm_md5": pa.array(md5_hex(norm.to_pylist()), pa.string()),
            "changed": changed,
        })

    return ds.map_batches(fingerprint, batch_format="pyarrow",
                          zero_copy_batch=True)


# --- Gopher quality rules ----------------------------------------------------

def docs_gopher_quality(sf_dir: str):
    """Gopher-rule quality signals (Rae et al. 2021, arXiv:2112.11446
    A1.1.2): per-doc word count, mean word length, fraction of words
    containing an alphabetic character, symbol-to-word ratio ('#' and
    non-overlapping '...'), and the pass flag (3 <= mean_word_len <= 10
    AND frac_alpha >= 0.8 AND symbol_ratio <= 0.1 AND n_words >= 10 —
    the flag is computed from the ROUNDED fractions on both engines so
    the threshold comparison can never straddle a rounding boundary).

    One scan, fully vectorized: split + flatten + utf8_length +
    match_substring_regex + two bincounts per batch; no exchange.
    Oracled (unnest + grouped avg + replace-count arithmetic)."""
    import ray.data as rd

    ds = rd.read_parquet(f"{sf_dir}/documents.parquet",
                         columns=["doc_id", "text"])
    return ds.map_batches(gopher_quality_batch, batch_format="pyarrow",
                          zero_copy_batch=True)


def gopher_quality_batch(batch: pa.Table) -> pa.Table:
    """Per-batch Gopher-rule math (module-level so tests drive it on
    crafted docs directly)."""
    n = batch.num_rows
    toks = pc.split_pattern(batch.column("text"), pattern=" ")
    flat = pc.list_flatten(toks)
    parents = pc.list_parent_indices(toks).to_numpy()
    wlen = pc.utf8_length(flat).to_numpy(zero_copy_only=False) \
        .astype(np.float64)
    alpha = pc.match_substring_regex(flat, "[A-Za-z]").to_numpy(
        zero_copy_only=False).astype(np.float64)
    n_words = np.bincount(parents, minlength=n)
    mean_len = round_ha(
        np.bincount(parents, weights=wlen, minlength=n)
        / np.maximum(n_words, 1), 6)
    frac_alpha = round_ha(
        np.bincount(parents, weights=alpha, minlength=n)
        / np.maximum(n_words, 1), 6)
    n_sym = (pc.count_substring(batch.column("text"), "#")
             .to_numpy(zero_copy_only=False).astype(np.int64)
             + pc.count_substring(batch.column("text"), "...")
             .to_numpy(zero_copy_only=False).astype(np.int64))
    sym_ratio = round_ha(n_sym / np.maximum(n_words, 1), 6)
    ok = ((mean_len >= 3.0) & (mean_len <= 10.0)
          & (frac_alpha >= 0.8) & (sym_ratio <= 0.1)
          & (n_words >= 10))
    return pa.table({
        "doc_id": batch.column("doc_id"),
        "n_words": pa.array(n_words.astype(np.int64), pa.int64()),
        "mean_word_len": pa.array(mean_len, pa.float64()),
        "frac_alpha": pa.array(frac_alpha, pa.float64()),
        "symbol_ratio": pa.array(sym_ratio, pa.float64()),
        "gopher_pass": pa.array(ok, pa.bool_()),
    })


# --- C4 line-level cleaning (Raffel et al. 2020) ----------------------------

_C4_TERMINAL_RE = '[.!?"]$'


def c4_clean_batch(batch: pa.Table, id_col: str = "doc_id",
                   text_col: str = "text",
                   badwords: tuple[str, ...] = ()) -> pa.Table:
    """C4 cleaning rules (Raffel et al. 2020 §2.2, arXiv:1910.10683)
    over newline-separated page text, fully vectorized (split/flatten
    + Arrow RE2 kernels + bincount folds; no exchange — embarrassingly
    parallel, so it composes into any corpus pipeline for free):

      line kept <=> ends in terminal punctuation (. ! ? ") AND has
                    >= 5 words (space-separated segments, the
                    string_split semantics shared with the oracle)
                    AND does not contain 'javascript'
                    (case-insensitive)
      page pass <=> >= 3 kept lines AND the RAW page text contains
                    neither 'lorem ipsum' nor '{' nor any ``badwords``
                    entry (case-insensitive; the published pipeline
                    uses an external blocklist — pass your own, the
                    default is empty)

    Output: one row per page — (id, n_lines, n_kept, c4_pass,
    clean_text = kept lines joined by newline; empty when none kept).
    Callers filter on c4_pass for the cleaning semantics or keep all
    rows as a quality-stats surface."""
    n = batch.num_rows
    text = batch.column(text_col)
    lines = pc.split_pattern(text, pattern="\n")
    flat = pc.list_flatten(lines).combine_chunks()
    parents = pc.list_parent_indices(lines).to_numpy(zero_copy_only=False)
    n_words = pc.add(pc.count_substring(flat, " "), 1)
    kept = pc.and_(pc.match_substring_regex(flat, _C4_TERMINAL_RE),
                   pc.greater_equal(n_words, 5))
    kept = pc.and_(kept, pc.invert(
        pc.match_substring(flat, "javascript", ignore_case=True)))
    kept_np = kept.to_numpy(zero_copy_only=False)
    n_lines = np.bincount(parents, minlength=n).astype(np.int64)
    n_kept = np.bincount(parents[kept_np], minlength=n).astype(np.int64)

    poison = pc.or_(
        pc.match_substring(text, "lorem ipsum", ignore_case=True),
        pc.match_substring(text, "{"))
    for w in badwords:
        poison = pc.or_(poison, pc.match_substring(text, w,
                                                   ignore_case=True))
    c4_pass = (n_kept >= 3) & ~poison.to_numpy(zero_copy_only=False)

    offsets = np.zeros(n + 1, dtype=np.int64)
    np.cumsum(n_kept, out=offsets[1:])
    kept_flat = flat.filter(kept)
    if isinstance(kept_flat, pa.ChunkedArray):
        kept_flat = kept_flat.combine_chunks()
    kept_list = pa.LargeListArray.from_arrays(
        pa.array(offsets, pa.int64()), kept_flat)
    clean = pc.binary_join(kept_list, "\n")
    return pa.table({
        id_col: batch.column(id_col),
        "n_lines": pa.array(n_lines, pa.int64()),
        "n_kept": pa.array(n_kept, pa.int64()),
        "c4_pass": pa.array(c4_pass, pa.bool_()),
        "clean_text": clean,
    })


def _c4_synth_pages(batch: pa.Table) -> pa.Table:
    """Deterministic multi-line page synthesis from the single-line
    documents text, closed-form in (doc_id, line index) so the DuckDB
    oracle reconstructs the IDENTICAL pages in SQL: tokens grouped 5
    per line; line ``li`` gets ' javascript' appended when
    (doc_id+li) % 11 == 4 and a terminal '.' when (doc_id+li) % 3 != 2;
    doc_id % 53 == 13 appends a final 'lorem ipsum.' line and
    doc_id % 47 == 11 a '{ }.' line (page-level poison). Every C4 rule
    bites on this corpus (sf0.001: 409/500 docs survive)."""
    n = batch.num_rows
    doc_np = batch.column("doc_id").to_numpy(zero_copy_only=False)
    toks = pc.split_pattern(batch.column("text"), pattern=" ")
    flat = pc.list_flatten(toks).combine_chunks()
    parents = pc.list_parent_indices(toks).to_numpy(zero_copy_only=False)
    counts = np.bincount(parents, minlength=n)
    starts = np.concatenate(([0], np.cumsum(counts)[:-1]))
    within = np.arange(parents.size, dtype=np.int64) - starts[parents]
    bounds = np.flatnonzero(within % 5 == 0)
    line_list = pa.LargeListArray.from_arrays(
        pa.array(np.append(bounds, parents.size), pa.int64()), flat)
    base = pc.binary_join(line_list, " ")
    line_doc = parents[bounds]
    li = within[bounds] // 5
    key = doc_np[line_doc] + li
    line_txt = pc.binary_join_element_wise(
        base,
        pa.array(np.where(key % 11 == 4, " javascript", "")),
        pa.array(np.where(key % 3 != 2, ".", "")),
        "")
    per_doc = np.bincount(line_doc, minlength=n)
    page_list = pa.LargeListArray.from_arrays(
        pa.array(np.concatenate(([0], np.cumsum(per_doc))), pa.int64()),
        line_txt.combine_chunks()
        if isinstance(line_txt, pa.ChunkedArray) else line_txt)
    page = pc.binary_join_element_wise(
        pc.binary_join(page_list, "\n"),
        pa.array(np.where(doc_np % 53 == 13, "\nlorem ipsum.", "")),
        pa.array(np.where(doc_np % 47 == 11, "\n{ }.", "")),
        "")
    return pa.table({"doc_id": batch.column("doc_id"), "text": page})


def docs_c4_clean(sf_dir: str):
    """C4-cleaned documents corpus over the deterministic synthetic
    multi-line pages: (doc_id, n_lines, n_kept, clean_md5) for pages
    that pass — md5 keeps the compared payload slim while pinning the
    exact kept-line join. Oracled (DuckDB rebuilds the pages with
    string_split + string_agg and applies the same rules)."""
    import ray.data as rd

    ds = rd.read_parquet(f"{sf_dir}/documents.parquet",
                         columns=["doc_id", "text"])

    def run(batch: pa.Table) -> pa.Table:
        out = c4_clean_batch(_c4_synth_pages(batch))
        keep = out.column("c4_pass")
        out = out.filter(keep)
        return pa.table({
            "doc_id": out.column("doc_id"),
            "n_lines": out.column("n_lines"),
            "n_kept": out.column("n_kept"),
            "clean_md5": pa.array(
                md5_hex(out.column("clean_text").to_pylist()), pa.string()),
        })

    return ds.map_batches(run, batch_format="pyarrow",
                          zero_copy_batch=True)


# --- policy-lexicon hit counting (the C4/UT1 badwords shape) -----------------
# Corpus policy gates count occurrences of a term list (profanity /
# policy lexicons; C4 drops pages with ANY hit, others threshold).
# Multi-word phrases matter — a lexicon is not a token set — so the
# scan is word-boundary RE2 per entry, not a tokenizer lookup. The
# fixture lexicon is benign engine vocabulary; semantics (word
# boundaries, case folding, phrase entries, non-overlap counting) are
# exactly the production shape.

POLICY_LEXICON = [
    "spark", "slow", "dup", "vector",
    "hash join", "table scan", "big data",
]
LEXICON_FLAG_MIN = 5  # hits at/above this flag the doc


def lexicon_hits(ds, lexicon: list[str] | None = None,
                 flag_min: int = LEXICON_FLAG_MIN,
                 text_col: str = "text"):
    """Append (hits, n_terms, flagged) per row: total non-overlapping
    word-bounded case-insensitive matches across the lexicon, the
    number of distinct entries with >=1 match, and the threshold
    flag. One vectorized RE2 pass per lexicon entry per batch
    (pc.count_substring_regex) — |lexicon| is policy-sized (10^2..
    10^4), text never leaves the worker, zero exchanges. For 10^4+
    entries the same stage swaps the per-entry passes for one
    Aho-Corasick automaton; the Ray shape is unchanged."""
    lex = POLICY_LEXICON if lexicon is None else lexicon
    pats = [r"(?i)\b" + re.escape(t) + r"\b" for t in lex]

    def fn(t: pa.Table) -> pa.Table:
        txt = t.column(text_col)
        hits = None
        nterms = None
        for p in pats:
            c = pc.count_substring_regex(txt, p)
            c = pc.fill_null(c, 0)
            present = pc.cast(pc.greater(c, 0), pa.int64())
            hits = c if hits is None else pc.add(hits, c)
            nterms = present if nterms is None \
                else pc.add(nterms, present)
        hits = pc.cast(hits, pa.int64())
        return t.append_column("hits", hits) \
            .append_column("n_terms", nterms) \
            .append_column("flagged",
                           pc.greater_equal(hits, flag_min))

    return ds.map_batches(fn, batch_format="pyarrow",
                          zero_copy_batch=True)


def docs_lexicon_hits(sf_dir: str):
    """ORACLED query surface: the policy-lexicon counter over the
    documents table. The DuckDB twin re-runs the SAME RE2 patterns
    (both engines use RE2, so \\b and non-overlap semantics match by
    construction) via len(regexp_extract_all(...))."""
    import ray.data as rd

    ds = rd.read_parquet(f"{sf_dir}/documents.parquet",
                         columns=["doc_id", "text"])
    return lexicon_hits(ds).select_columns(
        ["doc_id", "hits", "n_terms", "flagged"])


def docs_temperature_mix(sf_dir: str, tau: float = 0.7,
                         scale: float = 0.5):
    """Temperature-weighted training mixture (the multilingual-corpus
    sampling rule of Arivazhagan et al. 2019 / mT5): each source's
    quota is ``max(1, floor(scale * count^tau))`` — sublinear in corpus
    size, so small sources are upsampled relative to their share.
    Deliberately NOT normalized by the cross-source sum: a sum of
    pow() doubles is summation-order-dependent and could floor()
    differently across engines; the per-source form keeps every quota
    a function of ONE count, bit-identical in numpy and DuckDB (both
    call libm pow on the same double).

    Same one-exchange shape as docs_source_mix: hash co-location by
    source, per-segment rank against the quota vector, smallest
    md5(text) wins (deterministic under any partitioning). Oracled."""
    import ray.data as rd

    from .relational import _segment_starts, partitioned_map_groups

    ds = rd.read_parquet(f"{sf_dir}/documents.parquet",
                         columns=["doc_id", "source", "text"])

    def keyed(t: pa.Table) -> pa.Table:
        h = [hashlib.md5(x.encode("utf-8")).hexdigest()
             for x in t.column("text").to_pylist()]
        return pa.table({"doc_id": t.column("doc_id"),
                         "source": t.column("source"),
                         "h": pa.array(h, pa.string())})

    keyed_ds = ds.map_batches(keyed, batch_format="pyarrow",
                              zero_copy_batch=True)

    def take_quota(part: pa.Table) -> pa.Table:
        if part.num_rows == 0:
            return pa.table({"doc_id": pa.array([], pa.int64()),
                             "source": pa.array([], pa.string())})
        idx = pc.sort_indices(part, sort_keys=[
            ("source", "ascending"), ("h", "ascending"),
            ("doc_id", "ascending")])
        g = part.take(idx)
        src = np.array(g.column("source").to_pylist())
        starts = _segment_starts(src)
        counts = np.diff(np.append(starts, len(src)))
        # every row of a source hashes to the same partition, so the
        # segment count IS the source's corpus count
        q = np.maximum(1, np.floor(
            scale * counts.astype(np.float64) ** tau)).astype(np.int64)
        offsets = np.arange(len(src)) - np.repeat(starts, counts)
        return g.select(["doc_id", "source"]).filter(
            pa.array(offsets < np.repeat(q, counts)))

    return partitioned_map_groups(keyed_ds, "source", take_quota)


def docs_bm25_topk(sf_dir: str, n_terms: int = 3, k: int = 20,
                   k1: float = 1.2, b: float = 0.75):
    """BM25 retrieval scoring (Robertson-Sparck Jones; the Okapi
    formula with the +1 idf floor Lucene uses): the query is the
    ``n_terms`` globally most frequent tokens (ties -> lexicographic),
    so the pipeline is self-contained and both engines derive the SAME
    query. Output: top-k docs by score (ties -> doc_id).

      idf(t)   = ln(1 + (N - df + 0.5) / (df + 0.5))
      score(d) = sum_t idf * tf*(k1+1) / (tf + k1*(1 - b + b*len/avg))

    Scale shape: pass 1 is the vocabulary-bounded term-count fold (df
    and the query terms fall out of the same grouped sum; doc count and
    total length are scalar folds); pass 2 broadcasts the tiny
    (term, idf) table and scores each batch with one index_in + two
    bincounts, fused with a per-batch partial top-k. Oracled (unnest +
    window + ln arithmetic, score rounded half-away 6)."""
    import ray
    import ray.data as rd

    from .relational import partitioned_map_groups

    ds = rd.read_parquet(f"{sf_dir}/documents.parquet",
                         columns=["doc_id", "text"])

    # --- pass 1: term document-frequencies + corpus scalars ---------
    def partial_df(batch: pa.Table) -> pa.Table:
        # _doc_term_freqs emits one row per (doc, term) per batch (docs
        # never span batches), so df partial = 1 per row and the term
        # tf partial rides the same table
        t = _doc_term_freqs(batch)
        return pa.table({
            "term": t.column("term"),
            "df": pa.array(np.ones(t.num_rows, np.int64), pa.int64()),
            "tf": t.column("tf")})

    def sum_df(t: pa.Table) -> pa.Table:
        g = t.group_by("term").aggregate([("df", "sum"), ("tf", "sum")])
        return pa.table({"term": g.column("term"),
                         "df": g.column("df_sum").cast(pa.int64()),
                         "tf": g.column("tf_sum").cast(pa.int64())})

    stats = partitioned_map_groups(
        ds.map_batches(partial_df, batch_format="pyarrow",
                       zero_copy_batch=True), "term", sum_df).materialize()

    def len_partial(batch: pa.Table) -> pa.Table:
        toks = pc.split_pattern(batch.column("text"), pattern=" ")
        return pa.table({
            "n_docs": pa.array([batch.num_rows], pa.int64()),
            "n_toks": pa.array(
                [pc.sum(pc.list_value_length(toks)).as_py() or 0],
                pa.int64())})

    totals = ds.map_batches(len_partial, batch_format="pyarrow",
                            zero_copy_batch=True)
    n_docs = totals.sum("n_docs") or 0
    n_toks = totals.sum("n_toks") or 0
    avg_len = n_toks / max(1, n_docs)

    # query = globally most frequent n_terms tokens (tf desc, term asc)
    top = stats.sort(["tf", "term"],
                     descending=[True, False]).limit(n_terms)
    qterms, qidf = [], []
    for bt in top.iter_batches(batch_format="pyarrow"):
        for term, df in zip(bt.column("term").to_pylist(),
                            bt.column("df").to_pylist()):
            qterms.append(term)
            qidf.append(np.log(1.0 + (n_docs - df + 0.5) / (df + 0.5)))
    ref = ray.put((qterms, np.asarray(qidf, np.float64)))

    def score_topk(batch: pa.Table) -> pa.Table:
        from ..broadcast import get_broadcast

        bterms, bidf = get_broadcast(ref)
        toks = pc.split_pattern(batch.column("text"), pattern=" ")
        flat = pc.list_flatten(toks)
        parents = pc.list_parent_indices(toks).to_numpy()
        lens = pc.list_value_length(toks).to_numpy(
            zero_copy_only=False).astype(np.float64)
        qset = pa.array(bterms, pa.string())
        idx = pc.index_in(flat, value_set=qset).to_numpy(
            zero_copy_only=False)
        hit = ~np.isnan(idx) if idx.dtype.kind == "f" else idx >= 0
        idx = np.nan_to_num(idx, nan=0).astype(np.int64)
        n = batch.num_rows
        score = np.zeros(n, np.float64)
        for qi in range(len(bterms)):
            sel = hit & (idx == qi)
            tf = np.bincount(parents[sel], minlength=n).astype(
                np.float64)
            denom = tf + k1 * (1.0 - b + b * lens / avg_len)
            score += np.where(tf > 0,
                              bidf[qi] * tf * (k1 + 1.0) / denom, 0.0)
        from .relational import round_ha as _rha

        score = _rha(score, 6)
        ids = batch.column("doc_id").to_numpy()
        topi = np.lexsort((ids, -score))[:k]
        return pa.table({
            "doc_id": pa.array(ids[topi], pa.int64()),
            "bm25": pa.array(score[topi], pa.float64())})

    pooled = ds.map_batches(score_topk, batch_format="pyarrow",
                            zero_copy_batch=True)
    return pooled.sort(["bm25", "doc_id"],
                       descending=[True, False]).limit(k)


def docs_term_pmi(sf_dir: str, k: int = 25, min_count: int = 5,
                  mode: str = "auto"):
    """Collocation mining by pointwise mutual information: the top-k
    adjacent word pairs by PMI = ln(p(ab) / (p(a) p(b))) among bigrams
    with corpus count >= min_count. Two vocabulary-bounded exchanges
    build the corpus bigram and unigram tables (the docs_term_counts /
    docs_bigram_counts partial shape); totals fold to two scalars.
    Scores are INTEGER micro-nats (round_even of the pinned IEEE-double
    expression — the docs_nb_quality fixed-point discipline), so the
    ranking is bit-deterministic in both engines. Below the
    VOCAB_BROADCAST_MAX_TERMS gate the unigram table broadcasts once
    and scoring is one map over the candidate bigrams; above it the
    candidates explode to (term, bigram) rows for ONE term-keyed
    copartitioned count attach plus one bigram-keyed refold — the
    vocabulary never lands on the driver. Each block emits only its
    local top-k (exact: post-aggregation every bigram is a single row,
    so blocks are disjoint by bigram) before the tiny global sort."""
    import ray.data as rd

    from .relational import (broadcast_lookup, copartitioned_map,
                             partitioned_map_groups)

    ds = rd.read_parquet(f"{sf_dir}/documents.parquet", columns=["text"])

    def partial_bg(batch: pa.Table) -> pa.Table:
        bg = _batch_bigrams(batch)
        if bg is None:
            return pa.table({"bigram": pa.array([], pa.string()),
                             "n": pa.array([], pa.int64())})
        vc = bg[0].value_counts()
        if isinstance(vc, pa.ChunkedArray):
            vc = vc.combine_chunks()
        return pa.table({"bigram": vc.field("values"),
                         "n": vc.field("counts").cast(pa.int64())})

    def partial_tc(batch: pa.Table) -> pa.Table:
        flat = pc.list_flatten(pc.split_pattern(
            batch.column("text"), pattern=" "))
        vc = flat.value_counts()
        if isinstance(vc, pa.ChunkedArray):
            vc = vc.combine_chunks()
        return pa.table({"term": vc.field("values"),
                         "n": vc.field("counts").cast(pa.int64())})

    def sum_by(key: str):
        def go(t: pa.Table) -> pa.Table:
            g = t.group_by(key).aggregate([("n", "sum")])
            return pa.table({key: g.column(key),
                             "n": g.column("n_sum").cast(pa.int64())})

        return go

    bgc = partitioned_map_groups(
        ds.map_batches(partial_bg, batch_format="pyarrow",
                       zero_copy_batch=True), "bigram",
        sum_by("bigram")).materialize()
    tc = partitioned_map_groups(
        ds.map_batches(partial_tc, batch_format="pyarrow",
                       zero_copy_batch=True), "term",
        sum_by("term")).materialize()

    n1 = float(tc.sum("n") or 0)
    n2 = float(bgc.sum("n") or 0)

    def filt(t: pa.Table) -> pa.Table:
        return t.filter(pc.greater_equal(
            t.column("n"), pa.scalar(min_count, pa.int64())))

    cand = bgc.map_batches(filt, batch_format="pyarrow",
                           zero_copy_batch=True)

    def micro(nab: np.ndarray, ca: np.ndarray, cb: np.ndarray) -> np.ndarray:
        # pinned order matches the oracle: (nab*n1*n1) / (n2*ca*cb)
        num = nab.astype(np.float64) * n1 * n1
        den = n2 * ca.astype(np.float64) * cb.astype(np.float64)
        return np.round(np.log(num / den) * 1e6).astype(np.int64)

    def local_topk(t: pa.Table) -> pa.Table:
        if t.num_rows <= k:
            return t
        idx = pc.sort_indices(t, sort_keys=[("pmi_micro", "descending"),
                                            ("bigram", "ascending")])
        return t.take(idx.slice(0, k))

    empty_out = pa.table({"bigram": pa.array([], pa.string()),
                          "n_ab": pa.array([], pa.int64()),
                          "pmi_micro": pa.array([], pa.int64())})

    if _resolve_vocab_mode(mode, tc) == "broadcast":
        ref = broadcast_lookup(tc, "term", ["n"])

        def score(t: pa.Table) -> pa.Table:
            from ..broadcast import get_broadcast

            if t.num_rows == 0:
                return empty_out
            keys, (tn,) = get_broadcast(ref)
            halves = pc.split_pattern(t.column("bigram"), pattern=" ",
                                      max_splits=1)
            w1 = pc.list_element(halves, 0)
            w2 = pc.list_element(halves, 1)
            tnn = tn.to_numpy()
            ia = pc.index_in(w1, value_set=keys).to_numpy(
                zero_copy_only=False).astype(np.int64)
            ib = pc.index_in(w2, value_set=keys).to_numpy(
                zero_copy_only=False).astype(np.int64)
            pm = micro(t.column("n").to_numpy(), tnn[ia], tnn[ib])
            return local_topk(pa.table({
                "bigram": t.column("bigram"),
                "n_ab": t.column("n"),
                "pmi_micro": pa.array(pm, pa.int64())}))

        scored = cand.map_batches(score, batch_format="pyarrow",
                                  zero_copy_batch=True)
    else:
        def prep_probe(t: pa.Table) -> pa.Table:
            halves = pc.split_pattern(t.column("bigram"), pattern=" ",
                                      max_splits=1)
            w1 = pc.list_element(halves, 0)
            w2 = pc.list_element(halves, 1)
            n = t.num_rows
            term = pa.chunked_array([w1, w2]).combine_chunks()
            big2 = pa.concat_tables([t, t]).column("bigram")
            nab2 = pa.concat_tables([t, t]).column("n")
            pos = pa.array(np.concatenate([np.zeros(n, np.int8),
                                           np.ones(n, np.int8)]), pa.int8())
            return pa.table({"term": term, "bigram": big2, "nab": nab2,
                             "pos": pos,
                             "cnt": pa.nulls(2 * n, pa.int64())})

        def prep_build(t: pa.Table) -> pa.Table:
            n = t.num_rows
            return pa.table({"term": t.column("term"),
                             "bigram": pa.nulls(n, pa.string()),
                             "nab": pa.nulls(n, pa.int64()),
                             "pos": pa.nulls(n, pa.int8()),
                             "cnt": t.column("n")})

        def attach(parts: list[pa.Table]) -> pa.Table:
            probe, build = parts
            idx = pc.index_in(probe.column("term"),
                              value_set=build.column("term")
                              .combine_chunks())
            return pa.table({
                "bigram": probe.column("bigram"),
                "nab": probe.column("nab"),
                "pos": probe.column("pos"),
                "cnt": pc.take(build.column("cnt").combine_chunks(), idx)})

        attached = copartitioned_map([(cand, prep_probe),
                                      (tc, prep_build)], "term", attach)

        def fold(part: pa.Table) -> pa.Table:
            if part.num_rows == 0:
                return empty_out
            # two rows per bigram (pos 0 = w1 count, pos 1 = w2 count)
            import polars as pl

            df = pl.from_arrow(part)
            g = df.group_by("bigram").agg([
                pl.col("nab").first().alias("n_ab"),
                pl.col("cnt").filter(pl.col("pos") == 0).first()
                    .alias("ca"),
                pl.col("cnt").filter(pl.col("pos") == 1).first()
                    .alias("cb")])
            t = g.to_arrow()
            pm = micro(t.column("n_ab").to_numpy(),
                       t.column("ca").to_numpy(),
                       t.column("cb").to_numpy())
            return local_topk(pa.table({
                "bigram": t.column("bigram").cast(pa.string()),
                "n_ab": t.column("n_ab").cast(pa.int64()),
                "pmi_micro": pa.array(pm, pa.int64())}))

        scored = partitioned_map_groups(attached, "bigram", fold)

    return scored.sort(["pmi_micro", "bigram"],
                       descending=[True, False]).limit(k)


def docs_vocab_growth(sf_dir: str, bucket: int = 1):
    """Heaps-law vocabulary-growth curve: how many NEW distinct terms
    each doc_id bucket introduces (first-occurrence semantics — a
    term belongs to the bucket of its MINIMUM doc_id; the synthetic
    corpus's closed vocabulary saturates within the first few docs,
    so per-doc granularity keeps the output informative). Per-batch
    (term, min_doc) partials fold through one vocabulary-bounded
    term-keyed exchange (the docs_term_counts shape with min instead
    of sum); bucket counts then fold as span-bounded integer partials.
    The corpus is scanned once; only vocabulary-sized tables move."""
    import ray.data as rd

    from .relational import partitioned_map_groups

    ds = rd.read_parquet(f"{sf_dir}/documents.parquet",
                         columns=["doc_id", "text"])

    def partial(batch: pa.Table) -> pa.Table:
        toks = pc.split_pattern(batch.column("text"), pattern=" ")
        flat = pc.list_flatten(toks).combine_chunks()
        parents = pc.list_parent_indices(toks).to_numpy()
        doc = batch.column("doc_id").to_numpy()[parents]
        t = flat.to_numpy(zero_copy_only=False)
        order = np.lexsort((doc, t))
        t_s, d_s = t[order], doc[order]
        keep = np.ones(t_s.size, bool)
        keep[1:] = t_s[1:] != t_s[:-1]       # first = min doc per term
        return pa.table({"term": pa.array(t_s[keep], pa.string()),
                         "first_doc": pa.array(d_s[keep], pa.int64())})

    def min_fold(part: pa.Table) -> pa.Table:
        if part.num_rows == 0:
            return pa.table({"bucket": pa.array([], pa.int64()),
                             "n": pa.array([], pa.int64())})
        t = part.column("term").to_numpy(zero_copy_only=False)
        d = part.column("first_doc").to_numpy()
        order = np.lexsort((d, t))
        t_s, d_s = t[order], d[order]
        keep = np.ones(t_s.size, bool)
        keep[1:] = t_s[1:] != t_s[:-1]
        b, cnt = np.unique(d_s[keep] // bucket, return_counts=True)
        return pa.table({"bucket": pa.array(b, pa.int64()),
                         "n": pa.array(cnt.astype(np.int64), pa.int64())})

    per_part = partitioned_map_groups(
        ds.map_batches(partial, batch_format="pyarrow",
                       zero_copy_batch=True), "term", min_fold)

    def final(part: pa.Table) -> pa.Table:
        if part.num_rows == 0:
            return pa.table({"bucket": pa.array([], pa.int64()),
                             "new_terms": pa.array([], pa.int64())})
        g = part.group_by("bucket").aggregate([("n", "sum")])
        return pa.table({"bucket": g.column("bucket"),
                         "new_terms": g.column("n_sum").cast(pa.int64())})

    return partitioned_map_groups(per_part, "bucket", final)


def docs_source_vocab_overlap(sf_dir: str):
    """Vocabulary-overlap matrix between sources: for every unordered
    source pair, the exact distinct-term intersection size plus each
    side's total vocabulary (the corpus-mixing diagnostic: how much
    lexical ground two crawl sources share). Per-batch distinct
    (term, source) partials fold through one vocabulary-bounded
    term-keyed exchange into per-term source BITMASKS; each partition
    emits per-source partial vocab counts and per-pair partial
    intersections SEPARATELY (a pair row alone would silently drop a
    source's vocab mass from partitions where its partner is absent),
    and the sources^2-bounded partials combine on the driver."""
    import ray.data as rd

    from .relational import partitioned_map_groups

    ds = rd.read_parquet(f"{sf_dir}/documents.parquet",
                         columns=["source", "text"])

    def partial(batch: pa.Table) -> pa.Table:
        toks = pc.split_pattern(batch.column("text"), pattern=" ")
        flat = pc.list_flatten(toks).combine_chunks()
        parents = pc.list_parent_indices(toks).to_numpy()
        src = batch.column("source").to_numpy(zero_copy_only=False)[
            parents]
        t = flat.to_numpy(zero_copy_only=False)
        order = np.lexsort((src, t))
        t_s, s_s = t[order], src[order]
        keep = np.ones(t_s.size, bool)
        keep[1:] = (t_s[1:] != t_s[:-1]) | (s_s[1:] != s_s[:-1])
        return pa.table({"term": pa.array(t_s[keep], pa.string()),
                         "source": pa.array(s_s[keep], pa.string())})

    def mask_fold(part: pa.Table) -> pa.Table:
        empty = pa.table({"a": pa.array([], pa.string()),
                          "b": pa.array([], pa.string()),
                          "n": pa.array([], pa.int64())})
        if part.num_rows == 0:
            return empty
        t = part.column("term").to_numpy(zero_copy_only=False)
        s = part.column("source").to_numpy(zero_copy_only=False)
        srcs = np.unique(s)
        if srcs.size > 62:
            raise ValueError("source bitmask supports <= 62 sources; "
                             "switch to a (term, src_a, src_b) "
                             "pair exchange beyond that")
        sid = {v: i for i, v in enumerate(srcs)}
        bits = np.array([1 << sid[v] for v in s], np.int64)
        order = np.lexsort((s, t))
        t_s, b_s = t[order], bits[order]
        new = np.ones(t_s.size, bool)
        new[1:] = t_s[1:] != t_s[:-1]
        starts = np.flatnonzero(new)
        masks = np.bitwise_or.reduceat(b_s, starts)
        a_rows, b_rows, n_rows = [], [], []
        for i in range(srcs.size):
            a_rows.append(str(srcs[i]))          # vocab partial
            b_rows.append("")
            n_rows.append(int(((masks >> i) & 1).sum()))
            for jj in range(i + 1, srcs.size):   # intersection partial
                a_rows.append(str(srcs[i]))
                b_rows.append(str(srcs[jj]))
                n_rows.append(
                    int((((masks >> i) & (masks >> jj)) & 1).sum()))
        return pa.table({"a": pa.array(a_rows, pa.string()),
                         "b": pa.array(b_rows, pa.string()),
                         "n": pa.array(n_rows, pa.int64())})

    per_part = partitioned_map_groups(
        ds.map_batches(partial, batch_format="pyarrow",
                       zero_copy_batch=True), "term", mask_fold)

    vocab: dict[str, int] = {}
    inter: dict[tuple[str, str], int] = {}
    for blk in per_part.iter_batches(
            batch_format="pyarrow"):  # sources^2-bounded
        for a, b, n in zip(blk.column("a").to_pylist(),
                           blk.column("b").to_pylist(),
                           blk.column("n").to_pylist()):
            if b == "":
                vocab[a] = vocab.get(a, 0) + n
            else:
                key = (a, b)
                inter[key] = inter.get(key, 0) + n
    names = sorted(vocab)
    rows = {"source_a": [], "source_b": [], "inter": [],
            "na": [], "nb": []}
    for i, a in enumerate(names):
        for b in names[i + 1:]:
            both = inter.get((a, b), 0)
            if both == 0:
                continue   # oracle's shared-term inner join semantics
            rows["source_a"].append(a)
            rows["source_b"].append(b)
            rows["inter"].append(both)
            rows["na"].append(vocab[a])
            rows["nb"].append(vocab[b])
    return rd.from_arrow(pa.table({
        "source_a": pa.array(rows["source_a"], pa.string()),
        "source_b": pa.array(rows["source_b"], pa.string()),
        "inter": pa.array(rows["inter"], pa.int64()),
        "na": pa.array(rows["na"], pa.int64()),
        "nb": pa.array(rows["nb"], pa.int64())}))


def docs_token_entropy(sf_dir: str):
    """Per-document Shannon entropy of the token distribution (the
    lexical-diversity quality signal: low entropy = repetitive /
    boilerplate text). Entirely batch-local — a document's tokens
    never leave its batch, so the operator costs ZERO exchanges at any
    corpus size. Integer micro-nat fixed point with order-independent
    partials: H = ln(n) - (1/n) sum c ln c becomes

        ent_micro = round_even(ln(n) * 1e6)
                    - (sum_terms round_even(ln(c) * c * 1e6)) // n

    where each per-term summand is rounded BEFORE the sum (integer
    adds commute, so no float summation-order hazard) and the final
    division is truncating on non-negative integers — bit-identical in
    both engines. Per-batch counting is one dictionary encode + one
    packed (doc, term) np.unique + reduceat segments; no Python loop."""
    import ray.data as rd

    ds = rd.read_parquet(f"{sf_dir}/documents.parquet",
                         columns=["doc_id", "text"])

    def ent(batch: pa.Table) -> pa.Table:
        empty = pa.table({"doc_id": pa.array([], pa.int64()),
                          "n_tokens": pa.array([], pa.int64()),
                          "ent_micro": pa.array([], pa.int64())})
        if batch.num_rows == 0:
            return empty
        toks = pc.split_pattern(batch.column("text"), pattern=" ")
        if isinstance(toks, pa.ChunkedArray):
            toks = toks.combine_chunks()
        parent = pc.list_parent_indices(toks).to_numpy().astype(np.int64)
        flat = toks.flatten()
        d = flat.dictionary_encode()
        if isinstance(d, pa.ChunkedArray):
            d = d.combine_chunks()
        code = d.indices.to_numpy().astype(np.int64)
        vocab = np.int64(len(d.dictionary))
        packed = parent * vocab + code
        keys, c = np.unique(packed, return_counts=True)
        c = c.astype(np.int64)
        docs = keys // vocab  # sorted -> doc-contiguous segments
        bounds = np.flatnonzero(np.diff(docs)) + 1
        starts = np.concatenate(([0], bounds))
        # pinned per-term expression: ln(c) * c * 1e6, round half-even
        term = np.round(np.log(c.astype(np.float64))
                        * c.astype(np.float64) * 1e6).astype(np.int64)
        n = np.add.reduceat(c, starts)
        s = np.add.reduceat(term, starts)
        head = np.round(np.log(n.astype(np.float64)) * 1e6).astype(np.int64)
        did = batch.column("doc_id").to_numpy()[docs[starts]]
        return pa.table({"doc_id": pa.array(did, pa.int64()),
                         "n_tokens": pa.array(n, pa.int64()),
                         "ent_micro": pa.array(head - s // n, pa.int64())})

    return ds.map_batches(ent, batch_format="pyarrow",
                          zero_copy_batch=True)


def docs_rrf_fusion(sf_dir: str, k: int = 20, c: int = 60):
    """Reciprocal-rank fusion (Cormack et al.) of two retrieval runs
    over the same corpus — the hybrid-search shape: the BM25 top-k for
    the self-derived query (docs_bm25_topk) fused with the top-k by
    heuristic quality score (docs_quality_scores; retrieval x quality
    prior). rrf_micro(d) = sum over lists containing d of
    1_000_000 // (c + rank) — exact integers, rank ties already
    deterministic in both source rankings ((score desc, doc_id)).
    The two inputs are full distributed rankings; the fusion itself
    touches only 2k bounded rows on the driver."""
    import ray.data as rd

    bm = docs_bm25_topk(sf_dir, k=k)  # sorted (bm25 desc, doc_id)
    q_ds = rd.read_parquet(f"{sf_dir}/documents.parquet",
                           columns=["doc_id", "text"]) \
        .map_batches(quality_score_batch, batch_format="pyarrow",
                     zero_copy_batch=True) \
        .sort(["quality_score", "doc_id"], descending=[True, False]) \
        .limit(k)

    def ranked_ids(ds) -> np.ndarray:
        ids = []
        for b in ds.iter_batches(batch_format="pyarrow"):  # <= k rows
            ids.append(b.column("doc_id").to_numpy())
        return np.concatenate(ids) if ids else np.zeros(0, np.int64)

    scores: dict[int, int] = {}
    lists: dict[int, int] = {}
    for id_arr in (ranked_ids(bm), ranked_ids(q_ds)):
        for r, d in enumerate(id_arr.tolist(), start=1):
            scores[d] = scores.get(d, 0) + 1_000_000 // (c + r)
            lists[d] = lists.get(d, 0) + 1
    top = sorted(scores, key=lambda d: (-scores[d], d))[:k]
    return rd.from_arrow(pa.table({
        "doc_id": pa.array(top, pa.int64()),
        "rrf_micro": pa.array([scores[d] for d in top], pa.int64()),
        "n_lists": pa.array([lists[d] for d in top], pa.int64())}))


_LANGID_SINGLETON: list = []


def docs_lang_confusion(sf_dir: str):
    """Language-ID confusion matrix: the stopword-profile predictor's
    label (LangId) crossed with the stored lang column — counts per
    (lang, lang_pred) cell, the model-evaluation shape run as data
    quality monitoring. Per-batch pair-count partials (the predictor
    runs inline on the same batch, profiles built once per worker);
    the fold is |langs|^2-bounded, so no exchange — a tiny driver
    dict finishes."""
    import ray.data as rd

    ds = rd.read_parquet(f"{sf_dir}/documents.parquet",
                         columns=["doc_id", "text", "lang"])

    def partial(batch: pa.Table) -> pa.Table:
        if not _LANGID_SINGLETON:
            _LANGID_SINGLETON.append(LangId())
        pred = _LANGID_SINGLETON[0](batch.select(["doc_id", "text"]))
        lang = batch.column("lang").to_pylist()
        lp = pred.column("lang_pred").to_pylist()
        agg: dict[tuple[str, str], int] = {}
        for a, b in zip(lang, lp):
            key = (a, b)
            agg[key] = agg.get(key, 0) + 1
        keys = sorted(agg)
        return pa.table({
            "lang": pa.array([k[0] for k in keys], pa.string()),
            "lang_pred": pa.array([k[1] for k in keys], pa.string()),
            "n": pa.array([agg[k] for k in keys], pa.int64())})

    agg: dict[tuple[str, str], int] = {}
    for b in ds.map_batches(partial, batch_format="pyarrow",
                            zero_copy_batch=True) \
            .iter_batches(batch_format="pyarrow"):  # |langs|^2-bounded
        for a, p, n in zip(b.column("lang").to_pylist(),
                           b.column("lang_pred").to_pylist(),
                           b.column("n").to_pylist()):
            agg[(a, p)] = agg.get((a, p), 0) + n
    keys = sorted(agg)
    return rd.from_arrow(pa.table({
        "lang": pa.array([k[0] for k in keys], pa.string()),
        "lang_pred": pa.array([k[1] for k in keys], pa.string()),
        "n": pa.array([agg[k] for k in keys], pa.int64())}))


def docs_ngram_novelty(sf_dir: str, n: int = 3):
    """N-gram novelty score (the streaming-diversity quality signal a
    curation pipeline tracks as a corpus grows): per document, the
    fraction of its DISTINCT n-grams whose corpus-wide FIRST occurrence
    (min doc_id) is this document — novelty_micro = novel * 1e6 //
    n_distinct; documents shorter than n tokens drop. Parallel despite
    the sequential-sounding definition: first-occurrence reduces to a
    (gram, min_doc) fold — per-batch distinct (gram, doc) partials
    through one vocabulary-bounded gram-keyed exchange — and the fold
    emits only |docs|-bounded (min_doc, novel_count) partials back; the
    per-doc distinct-gram denominators are computed batch-locally (a
    doc lives in one row), and ONE doc-keyed co-location joins the two
    slim streams. Grams travel as strings (the PMI bigram shape; the
    8-byte gram-hash swap documented at _gram_hash_stream applies
    verbatim at corpus scale)."""
    import ray.data as rd

    from .relational import copartitioned_map

    ds = rd.read_parquet(f"{sf_dir}/documents.parquet",
                         columns=["doc_id", "text"])

    def grams_of(batch: pa.Table):
        toks = pc.split_pattern(batch.column("text"), pattern=" ")
        flat = pc.list_flatten(toks).combine_chunks()
        parents = pc.list_parent_indices(toks).to_numpy()
        if len(flat) < n:
            return None
        same = parents[: 1 - n] == parents[n - 1:]
        if not same.any():
            return None
        cols = [flat.slice(i, len(flat) - n + 1).filter(pa.array(same))
                for i in range(n)]
        joined = cols[0]
        for c in cols[1:]:
            joined = pc.binary_join_element_wise(joined, c, " ")
        return joined, parents[: 1 - n][same]

    def pairs_partial(batch: pa.Table) -> pa.Table:
        empty = pa.table({"gram": pa.array([], pa.string()),
                          "doc_id": pa.array([], pa.int64())})
        g = grams_of(batch)
        if g is None:
            return empty
        grams, parent = g
        did = batch.column("doc_id").to_numpy()[parent]
        t = pa.table({"gram": grams, "doc_id": pa.array(did, pa.int64())})
        # batch-local distinct (gram, doc)
        gb = t.group_by(["gram", "doc_id"]).aggregate([])
        return gb

    def denom_partial(batch: pa.Table) -> pa.Table:
        empty = pa.table({"doc_id": pa.array([], pa.int64()),
                          "n_distinct": pa.array([], pa.int64())})
        g = grams_of(batch)
        if g is None:
            return empty
        grams, parent = g
        d = grams.dictionary_encode()
        if isinstance(d, pa.ChunkedArray):
            d = d.combine_chunks()
        code = d.indices.to_numpy().astype(np.int64)
        packed = parent.astype(np.int64) * len(d.dictionary) + code
        keys = np.unique(packed)
        docs_idx = keys // len(d.dictionary)
        udocs, cnt = np.unique(docs_idx, return_counts=True)
        did = batch.column("doc_id").to_numpy()[udocs]
        return pa.table({"doc_id": pa.array(did, pa.int64()),
                         "n_distinct": pa.array(cnt.astype(np.int64),
                                                pa.int64())})

    from .relational import partitioned_map_groups

    def first_fold(part: pa.Table) -> pa.Table:
        # (gram, min_doc) per gram, then |docs|-bounded novel counts
        if part.num_rows == 0:
            return pa.table({"doc_id": pa.array([], pa.int64()),
                             "novel": pa.array([], pa.int64())})
        g = part.column("gram")
        if isinstance(g, pa.ChunkedArray):
            g = g.combine_chunks()
        d = g.dictionary_encode()
        if isinstance(d, pa.ChunkedArray):
            d = d.combine_chunks()
        code = d.indices.to_numpy().astype(np.int64)
        doc = part.column("doc_id").to_numpy()
        order = np.lexsort((doc, code))
        c_s, d_s = code[order], doc[order]
        keep = np.ones(c_s.size, bool)
        keep[1:] = c_s[1:] != c_s[:-1]
        min_docs = d_s[keep]
        ud, cnt = np.unique(min_docs, return_counts=True)
        return pa.table({"doc_id": pa.array(ud, pa.int64()),
                         "novel": pa.array(cnt.astype(np.int64),
                                           pa.int64())})

    novel = partitioned_map_groups(
        ds.map_batches(pairs_partial, batch_format="pyarrow",
                       zero_copy_batch=True), "gram", first_fold)
    denom = ds.map_batches(denom_partial, batch_format="pyarrow",
                           zero_copy_batch=True)

    def prep_novel(t: pa.Table) -> pa.Table:
        return pa.table({"doc_id": t.column("doc_id"),
                         "v": t.column("novel")})

    def prep_denom(t: pa.Table) -> pa.Table:
        return pa.table({"doc_id": t.column("doc_id"),
                         "v": pc.multiply(t.column("n_distinct"),
                                          pa.scalar(-1, pa.int64()))})

    def join_fold(parts: list[pa.Table]) -> pa.Table:
        nov, den = parts
        empty = pa.table({"doc_id": pa.array([], pa.int64()),
                          "n_distinct": pa.array([], pa.int64()),
                          "novel": pa.array([], pa.int64()),
                          "novelty_micro": pa.array([], pa.int64())})
        if den.num_rows == 0:
            return empty
        dd = den.column("doc_id").to_numpy()
        dv = -den.column("v").to_numpy()
        order = np.argsort(dd, kind="stable")
        dd, dv = dd[order], dv[order]
        # denominators may arrive as multiple partials per doc
        bounds = np.flatnonzero(np.diff(dd)) + 1
        starts = np.concatenate(([0], bounds))
        docs = dd[starts]
        nd = np.add.reduceat(dv, starts)
        novel = np.zeros(docs.size, np.int64)
        if nov.num_rows:
            ni = nov.column("doc_id").to_numpy()
            nv = nov.column("v").to_numpy()
            np.add.at(novel, np.searchsorted(docs, ni), nv)
        return pa.table({
            "doc_id": pa.array(docs, pa.int64()),
            "n_distinct": pa.array(nd, pa.int64()),
            "novel": pa.array(novel, pa.int64()),
            "novelty_micro": pa.array(novel * 1_000_000 // nd,
                                      pa.int64())})

    return copartitioned_map([(novel, prep_novel), (denom, prep_denom)],
                             "doc_id", join_fold)


def docs_source_entropy(sf_dir: str):
    """Corpus-mix health metric: Shannon entropy of the SOURCE
    distribution in integer micro-nats (low entropy = the corpus is
    dominated by one crawl/source — the redundancy alarm a curation
    dashboard tracks next to the per-doc signals). Same integer
    discipline as docs_token_entropy: per-source counts fold as
    |sources|-bounded partials, each count's ln term rounds BEFORE the
    commutative integer sum, and the final division truncates —
    bit-identical in both engines. One scan, no exchange."""
    import ray.data as rd

    ds = rd.read_parquet(f"{sf_dir}/documents.parquet",
                         columns=["source"])

    def partial(t: pa.Table) -> pa.Table:
        vc = t.column("source").value_counts()
        if isinstance(vc, pa.ChunkedArray):
            vc = vc.combine_chunks()
        return pa.table({"source": vc.field("values"),
                         "n": vc.field("counts").cast(pa.int64())})

    agg: dict[str, int] = {}
    for b in ds.map_batches(partial, batch_format="pyarrow",
                            zero_copy_batch=True) \
            .iter_batches(batch_format="pyarrow"):  # |sources|-bounded
        for s, n in zip(b.column("source").to_pylist(),
                        b.column("n").to_pylist()):
            agg[s] = agg.get(s, 0) + n
    n_tot = sum(agg.values())
    if n_tot == 0:
        return rd.from_arrow(pa.table({
            "n_sources": pa.array([], pa.int64()),
            "n_docs": pa.array([], pa.int64()),
            "entropy_micro": pa.array([], pa.int64())}))
    s_int = sum(int(np.round(np.log(float(c)) * c * 1e6))
                for c in agg.values())
    head = int(np.round(np.log(float(n_tot)) * 1e6))
    return rd.from_arrow(pa.table({
        "n_sources": pa.array([len(agg)], pa.int64()),
        "n_docs": pa.array([n_tot], pa.int64()),
        "entropy_micro": pa.array([head - s_int // n_tot], pa.int64())}))


def docs_dup_ratio_by_source(sf_dir: str):
    """Per-source duplication rate (the dedup dashboard: which crawl
    is feeding us copies?): docs, distinct content hashes and the
    integer ppm duplicate ratio (n_docs - n_distinct) * 1e6 // n_docs
    per source. Per-batch (md5, source) slim pairs through one
    content-keyed exchange (hashes only — text never shuffles; at
    corpus scale the md5 string column swaps for its 128-bit halves,
    the _gram_hash_stream note); per-partition distinct-per-source
    counts fold into a |sources|-bounded driver dict. md5 matches
    docs_fingerprints' oracle contract (DuckDB md5())."""
    import ray.data as rd

    from .relational import partitioned_map_groups

    ds = rd.read_parquet(f"{sf_dir}/documents.parquet",
                         columns=["text", "source"])

    def pairs(batch: pa.Table) -> pa.Table:
        texts = batch.column("text").to_pylist()
        return pa.table({
            "h": pa.array(md5_hex(texts), pa.string()),
            "source": batch.column("source")})

    def fold(part: pa.Table) -> pa.Table:
        empty = pa.table({"source": pa.array([], pa.string()),
                          "n_docs": pa.array([], pa.int64()),
                          "n_distinct": pa.array([], pa.int64())})
        if part.num_rows == 0:
            return empty
        h = part.column("h")
        if isinstance(h, pa.ChunkedArray):
            h = h.combine_chunks()
        s = part.column("source")
        if isinstance(s, pa.ChunkedArray):
            s = s.combine_chunks()
        hd = h.dictionary_encode()
        sd = s.dictionary_encode()
        if isinstance(hd, pa.ChunkedArray):
            hd = hd.combine_chunks()
        if isinstance(sd, pa.ChunkedArray):
            sd = sd.combine_chunks()
        hc = hd.indices.to_numpy().astype(np.int64)
        scode = sd.indices.to_numpy().astype(np.int64)
        n_src = len(sd.dictionary)
        packed = hc * n_src + scode
        # per (source): total docs and DISTINCT (hash, source) pairs —
        # hashes are co-located, so these partials are final per hash
        n_docs = np.bincount(scode, minlength=n_src).astype(np.int64)
        keys = np.unique(packed)
        nd = np.bincount((keys % n_src).astype(np.int64),
                         minlength=n_src).astype(np.int64)
        srcs = sd.dictionary.cast(pa.string())
        return pa.table({"source": srcs,
                         "n_docs": pa.array(n_docs, pa.int64()),
                         "n_distinct": pa.array(nd, pa.int64())})

    parts = partitioned_map_groups(
        ds.map_batches(pairs, batch_format="pyarrow",
                       zero_copy_batch=True), "h", fold)
    agg: dict[str, list[int]] = {}
    for b in parts.iter_batches(batch_format="pyarrow"):  # |sources|
        for s, n, d in zip(b.column("source").to_pylist(),
                           b.column("n_docs").to_pylist(),
                           b.column("n_distinct").to_pylist()):
            e = agg.setdefault(s, [0, 0])
            e[0] += n
            e[1] += d
    keys = sorted(agg)
    nd_ = np.array([agg[k][0] for k in keys], np.int64)
    dd_ = np.array([agg[k][1] for k in keys], np.int64)
    return rd.from_arrow(pa.table({
        "source": pa.array(keys, pa.string()),
        "n_docs": pa.array(nd_, pa.int64()),
        "n_distinct": pa.array(dd_, pa.int64()),
        "dup_ppm": pa.array((nd_ - dd_) * 1_000_000 // nd_,
                            pa.int64())}))


def docs_readability(sf_dir: str):
    """Flesch reading-ease per document, INTEGER milli-units so the
    score is bit-deterministic and DuckDB-mirrorable:

        words      = count of \\S+ runs
        sentences  = count of [.!?]+ runs   (min 1)
        syllables  = count of [aeiouy]+ runs in lower(text) — the
                     standard vowel-group heuristic, WITHOUT the
                     per-word min-1 correction (spec'd identically on
                     both sides; a per-word floor needs a second pass)
        flesch_milli = 206835 - (1015 * words) // sentences
                              - (84600 * syllables) // words  (min 1)

    All three counts are single Arrow C++ RE2 passes per batch — no
    exchanges, no Python loops; the oracle's regexp_extract_all runs
    the same RE2 patterns."""
    import pyarrow.compute as pc

    from .relational import read

    ds = read(sf_dir, "documents", columns=["doc_id", "text"])

    def score(t: pa.Table) -> pa.Table:
        txt = t.column("text")
        w = pc.max_element_wise(
            pc.count_substring_regex(txt, r"\S+").cast(pa.int64()),
            pa.scalar(1, pa.int64()))
        s = pc.max_element_wise(
            pc.count_substring_regex(txt, r"[.!?]+").cast(pa.int64()),
            pa.scalar(1, pa.int64()))
        sy = pc.count_substring_regex(
            pc.utf8_lower(txt), r"[aeiouy]+").cast(pa.int64())
        import numpy as np

        wv = w.to_numpy(zero_copy_only=False)
        sv = s.to_numpy(zero_copy_only=False)
        syv = sy.to_numpy(zero_copy_only=False)
        flesch = 206835 - (1015 * wv) // sv - (84600 * syv) // wv
        return pa.table({
            "doc_id": t.column("doc_id"),
            "words": w, "sentences": s,
            "syllables": pa.array(syv, pa.int64()),
            "flesch_milli": pa.array(flesch, pa.int64()),
        })

    return ds.map_batches(score, batch_format="pyarrow",
                          zero_copy_batch=True).sort("doc_id")


# soft line-break hyphenation repair: letter '-' [spaces] newline
# [spaces] lowercase letter -> join. RE2 on both sides; replacement
# group syntax is RE2's \\1\\2.
DEHYPHEN_PATTERN = r"([A-Za-z])-[ \t]*\n[ \t]*([a-z])"


def dehyphenate_batch(t: pa.Table, text_col: str = "text",
                      out_col: str = "clean_text") -> pa.Table:
    """Join words broken across lines by end-of-line hyphenation (the
    standard PDF/column-text extraction cleanup): one vectorized RE2
    global replace per batch, plus the join count. A hyphen before a
    capital or digit is kept (real compounds like 'X-ray' and ranges
    survive; only lowercase continuations join — the classic
    heuristic)."""
    import pyarrow.compute as pc

    txt = t.column(text_col)
    n = pc.count_substring_regex(txt, DEHYPHEN_PATTERN).cast(pa.int64())
    clean = pc.replace_substring_regex(txt, DEHYPHEN_PATTERN, r"\1\2")
    return t.append_column(out_col, clean).append_column("n_joins", n)


def docs_dehyphenate(sf_dir: str):
    """ORACLED query surface: every doc's text is hyphen-broken at
    EVERY space (closed-form messy construction, mirrored in SQL with
    replace(text, ' ', '-' || chr(10))), then repaired by the real
    operator; DuckDB applies the identical RE2 replace — so parity
    proves pattern, replacement groups and global-scan semantics."""
    import pyarrow.compute as pc

    from .relational import read

    ds = read(sf_dir, "documents", columns=["doc_id", "text"])

    def run(t: pa.Table) -> pa.Table:
        messy = pc.replace_substring(t.column("text"), " ", "-\n")
        m = pa.table({"doc_id": t.column("doc_id"), "text": messy})
        out = dehyphenate_batch(m)
        return out.select(["doc_id", "clean_text", "n_joins"])

    return ds.map_batches(run, batch_format="pyarrow",
                          zero_copy_batch=True).sort("doc_id")


# --- hashed-feature topic clustering ---------------------------------------

TOPIC_DIM = 16
TOPIC_SCALE = 1 << 20  # fixed-point centroid scale (integer exact)


def _md5_buckets(tokens: np.ndarray, dim: int) -> np.ndarray:
    """token -> bucket via the LOWER 64 bits of md5 (little-endian),
    which is exactly DuckDB's md5_number_lower — the shared hash
    definition that makes the oracle's feature space identical.
    Hashes only the UNIQUE tokens of the batch (vocabulary-bounded)."""
    import hashlib

    uniq, inv = np.unique(tokens, return_inverse=True)
    b = np.fromiter(
        (int.from_bytes(hashlib.md5(t.encode()).digest()[8:16],
                        "little") % dim for t in uniq),
        np.int64, count=len(uniq))
    return b[inv]


def docs_topic_features(sf_dir: str, dim: int = TOPIC_DIM):
    """documents -> (doc_id, feat: fixed_size_list<int64, dim>) —
    integer token counts per md5 bucket. One streaming pass: tokens
    explode vectorized (Arrow split + list flatten), only the batch's
    unique tokens pay the md5, counts scatter-add into the dense
    per-doc rows. No exchange — a document is one row."""
    import pyarrow.compute as pc

    from .relational import read

    ds = read(sf_dir, "documents", columns=["doc_id", "text"])

    def feats(t: pa.Table) -> pa.Table:
        toks = pc.split_pattern(pc.utf8_lower(t.column("text")), " ")
        toks = toks.combine_chunks()
        flat = toks.flatten().to_numpy(zero_copy_only=False)
        reps = np.asarray(toks.value_lengths())
        parent = np.repeat(np.arange(t.num_rows), reps)
        keep = flat != ""
        flat, parent = flat[keep], parent[keep]
        M = np.zeros((t.num_rows, dim), np.int64)
        if len(flat):
            np.add.at(M, (parent, _md5_buckets(flat, dim)), 1)
        feat = pa.FixedSizeListArray.from_arrays(
            pa.array(M.ravel(), pa.int64()), dim)
        return pa.table({"doc_id": t.column("doc_id"),
                         "feat": feat})

    return ds.map_batches(feats, batch_format="pyarrow",
                          zero_copy_batch=True)


def _feat_matrix(t: pa.Table, dim: int) -> np.ndarray:
    col = t.column("feat").combine_chunks()
    return col.flatten().to_numpy(zero_copy_only=False) \
        .reshape(-1, dim)


def docs_topic_clusters(sf_dir: str, k: int = 4, iters: int = 3,
                        dim: int = TOPIC_DIM):
    """ORACLED topic clustering: integer Lloyd's k-means over the
    hashed token-count features — every quantity int64, so the oracle
    (an unrolled CTE chain over the md5_number_lower feature space)
    is bit-exact. Semantics pinned on both sides:

      seeds     = k smallest (doc_id * 2654435761) % 2^32 (ties by id);
                  centroid0 = seed's counts * SCALE
      distance  = sum_dim (v * SCALE - cent)^2, expanded as
                  SCALE^2*A - 2*SCALE*dot + B so sparse features and
                  sparse centroids need only present dims
      assign    = argmin distance, ties to the SMALLEST cluster id
      update    = cent' = (SCALE * sum_members) // n_members per dim;
                  an EMPTY cluster's centroid is all zeros (the
                  oracle's missing sparse rows)
      output    = assignment against the centroids AFTER the last
                  update (iters updates, then one final assign)

    Engine shape (the PageRank fold): features materialize once; each
    iteration broadcasts the k x dim int centroid matrix and folds
    per-block (cluster, count, sumvec) partials from raw tasks over
    the pinned blocks; the final assignment streams out per block."""
    import ray

    feats = docs_topic_features(sf_dir, dim).materialize()
    S = TOPIC_SCALE

    # seeds: per-block partial top-k of the hash order, driver-merged
    cand = []
    for b in feats.map_batches(
            lambda t: _seed_partial(t, k),
            batch_format="pyarrow", zero_copy_batch=True) \
            .iter_batches(batch_format="pyarrow"):
        cand.append(b)
    ct = pa.concat_tables(cand)
    hv = ct.column("h").to_numpy()
    ids = ct.column("doc_id").to_numpy()
    order = np.lexsort((ids, hv))[:k]
    seed_ids = ids[order]
    seed_rank = {int(d): r for r, d in enumerate(seed_ids)}

    def seed_cents(t: pa.Table) -> pa.Table:
        sel = np.isin(t.column("doc_id").to_numpy(), seed_ids)
        if not sel.any():
            return pa.table({"cluster": pa.array([], pa.int64()),
                             "vec": pa.array([], pa.binary())})
        M = _feat_matrix(t, dim)[sel]
        d = t.column("doc_id").to_numpy()[sel]
        return pa.table({
            "cluster": pa.array([seed_rank[int(x)] for x in d],
                                pa.int64()),
            "vec": pa.array([(row * S).tobytes() for row in M],
                            pa.binary())})

    cent = np.zeros((k, dim), np.int64)
    for b in feats.map_batches(seed_cents, batch_format="pyarrow",
                               zero_copy_batch=True) \
            .iter_batches(batch_format="pyarrow"):
        for c, v in zip(b.column("cluster").to_pylist(),
                        b.column("vec").to_pylist()):
            cent[c] = np.frombuffer(v, np.int64)

    block_refs = feats.to_arrow_refs()

    @ray.remote(num_cpus=1)
    def stats_block(t: pa.Table, c: np.ndarray):
        if t.num_rows == 0 or "feat" not in t.schema.names:
            return np.zeros(k, np.int64), np.zeros((k, dim), np.int64)
        V = _feat_matrix(t, dim)
        D = ((V[:, None, :] * S - c[None, :, :]) ** 2).sum(axis=2)
        asg = D.argmin(axis=1)
        counts = np.bincount(asg, minlength=k)
        sums = np.zeros((k, dim), np.int64)
        np.add.at(sums, asg, V)
        return counts, sums

    for _ in range(iters):
        cref = ray.put(cent)
        parts = ray.get([stats_block.remote(r, cref)
                         for r in block_refs])
        counts = np.zeros(k, np.int64)
        sums = np.zeros((k, dim), np.int64)
        for cn, sm in parts:
            counts += cn
            sums += sm
        nz = counts > 0
        cent = np.zeros((k, dim), np.int64)
        cent[nz] = (S * sums[nz]) // counts[nz, None]

    cref = ray.put(cent)

    def assign(t: pa.Table) -> pa.Table:
        from ..broadcast import get_broadcast

        c = get_broadcast(cref)
        V = _feat_matrix(t, dim)
        D = ((V[:, None, :] * S - c[None, :, :]) ** 2).sum(axis=2)
        return pa.table({"doc_id": t.column("doc_id"),
                         "cluster": pa.array(D.argmin(axis=1),
                                             pa.int64())})

    return feats.map_batches(assign, batch_format="pyarrow",
                             zero_copy_batch=True).sort("doc_id")


def _seed_partial(t: pa.Table, k: int) -> pa.Table:
    ids = t.column("doc_id").to_numpy()
    h = (ids.astype(np.uint64) * np.uint64(2654435761)) \
        % np.uint64(2 ** 32)
    order = np.lexsort((ids, h))[:k]
    return pa.table({"doc_id": pa.array(ids[order], pa.int64()),
                     "h": pa.array(h[order].astype(np.int64),
                                   pa.int64())})


# --- mojibake repair (ftfy-style cp1252 double-encoding fix) ----------------
# The classic web-corpus text defect: UTF-8 bytes decoded as
# windows-1252 somewhere upstream ('é' -> 'Ã©', '—' -> 'â€”'),
# sometimes TWICE. Repair inverts the decode with SLOPPY cp1252 (the
# five unmapped bytes 0x81/0x8D/0x8F/0x90/0x9D pass through as their
# Latin-1 codepoints, exactly ftfy's trick — strict cp1252 cannot even
# represent a double-mangled em dash) and accepts a round only when
# the bytes parse as STRICT UTF-8 and the text actually changed, so
# legitimate Latin-1-ish content ('Ça va', a lone 'Ã') survives
# untouched. Vectorized prefilter: one RE2 pass flags candidate rows
# (every cp1252 image of a UTF-8 lead byte 0xC2-0xF4, derived from the
# sloppy-cp1252 table below — not just Â/Ã/â€, which would silently
# skip all non-Latin mojibake whose lead bytes are 0xC4-0xF4, e.g.
# Cyrillic 'Ñ„Ð¾Ñ‚Ð¾'); clean batches never enter the per-row loop.


def _sloppy_tables():
    dec = []
    for b in range(256):
        try:
            dec.append(bytes([b]).decode("cp1252"))
        except UnicodeDecodeError:
            dec.append(chr(b))
    decode_map = dict(enumerate(dec))
    encode_map = {ord(c): b for b, c in decode_map.items()}
    return decode_map, encode_map


_SLOPPY_DEC, _SLOPPY_ENC = _sloppy_tables()

# Any mojibake text must contain the cp1252 rendering of some UTF-8
# lead byte; one char class over all of them is a complete prefilter
# (the strict-UTF-8 acceptance guard in fix_mojibake_text remains the
# false-positive filter).
_MOJIBAKE_MARK = "[" + "".join(
    sorted({_SLOPPY_DEC[b] for b in range(0xC2, 0xF5)})) + "]"


def sloppy_cp1252_decode(b: bytes) -> str:
    return "".join(_SLOPPY_DEC[x] for x in b)


def _sloppy_encode(s: str):
    try:
        return bytes(_SLOPPY_ENC[ord(c)] for c in s)
    except KeyError:
        return None  # a char outside cp1252: not mojibake


def fix_mojibake_text(s: str, max_rounds: int = 2) -> tuple[str, int]:
    """Undo up to ``max_rounds`` of utf-8-read-as-cp1252 mangling.
    Returns (fixed_text, rounds_applied); rounds == 0 means kept
    verbatim (clean, non-cp1252, or not strict-UTF-8 under the
    inverse — the false-positive guard)."""
    cur = s
    rounds = 0
    while rounds < max_rounds:
        b = _sloppy_encode(cur)
        if b is None:
            break
        try:
            t = b.decode("utf-8")
        except UnicodeDecodeError:
            break
        if t == cur:
            break
        cur = t
        rounds += 1
    return cur, rounds


def fix_mojibake(ds, id_col: str = "doc_id", text_col: str = "text"):
    """Dataset -> (doc_id, text_fixed, rounds). In-batch, zero
    exchanges; the RE2 prefilter keeps clean rows out of the Python
    repair loop."""
    import pyarrow.compute as pc

    def repair(t: pa.Table) -> pa.Table:
        texts = t.column(text_col)
        sus = pc.match_substring_regex(texts, _MOJIBAKE_MARK)
        sus_np = sus.to_numpy(zero_copy_only=False)
        vals = texts.to_pylist()
        rounds = np.zeros(len(vals), np.int64)
        for k in np.flatnonzero(sus_np):
            vals[k], rounds[k] = fix_mojibake_text(vals[k])
        return pa.table({
            "doc_id": t.column(id_col),
            "text_fixed": pa.array(vals, pa.string()),
            "rounds": pa.array(rounds, pa.int64())})

    return ds.map_batches(repair, batch_format="pyarrow")


def docs_fix_mojibake(sf_dir: str):
    """ORACLED query surface: four closed-form text classes per
    doc_id — clean ascii (kept, 0 rounds), single-mangled (1 round),
    DOUBLE-mangled (2 rounds; exercises the sloppy-cp1252 passthrough
    bytes), and a lone 'Ã' that must survive the false-positive guard
    (0 rounds). The fixture mangles Python-side with the real encode
    chain; DuckDB emits the expected CLEAN strings closed-form, so
    parity proves the inverse lands exactly."""
    import ray.data as rd

    ids = rd.read_parquet(f"{sf_dir}/documents.parquet",
                          columns=["doc_id"])

    def render(batch: pa.Table) -> pa.Table:
        out_i, out_t = [], []
        for i in batch.column("doc_id").to_pylist():
            c = i % 4
            if c == 0:
                s = f"plain ascii {i}"
            elif c == 3:
                s = f"Ã solo {i} stays"
            else:
                clean = (f"café {i} — naïve "
                         f"« déjà »…")
                s = sloppy_cp1252_decode(clean.encode("utf-8"))
                if c == 2:
                    s = sloppy_cp1252_decode(s.encode("utf-8"))
            out_i.append(i)
            out_t.append(s)
        return pa.table({"doc_id": pa.array(out_i, pa.int64()),
                         "text": pa.array(out_t, pa.string())})

    pages = ids.map_batches(render, batch_format="pyarrow",
                            batch_size=1024)
    return fix_mojibake(pages).sort("doc_id")
