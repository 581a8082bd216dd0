"""Driver contract for the graft builder (Ray Data target).

The driver's verify calls ``entry()`` as a smoke check (Ray is already
initialised, local mode), runs each ``queries()[name](sf_dir)`` at
sf=0.01 and compares it against the matching ``oracle_sql()[name]`` via
DuckDB (row-count + schema + order-insensitive value-hash ->
CORRECTNESS_r{N}.json).

Ray is initialised by the driver BEFORE this module is imported: no
``ray.init()`` / ``ray.shutdown()`` here or in the library code.

Operator coverage map (SURVEY.md §2 + the training-data-pipeline
extensions): see each query's docstring-comment below. Queries without
an oracle_sql entry are genuinely non-SQL-expressible (the extraction
pipeline itself, LSH sketches, approximate ANN, iterative BPE
training) and get the driver's rows-only check; each of those is
additionally golden/property-tested in tests/.
"""

from __future__ import annotations

from collections.abc import Callable
from typing import Any


def entry() -> Any:
    """Flagship extraction pipeline at sf0.001 scale.

    The pages corpus (BASELINE.json input_hint shape) is synthesized
    deterministically (FIXTURES.md; web-page html bytes are not part of
    the driver corpus) at the sf0.001 row scale, then run through the
    full Ray Data pipeline: dedup -> quality gate -> extractor actor pool
    -> normalize -> route.
    """
    from webxtract import pipeline
    from webxtract.testdata import pages_dataset

    ds = pages_dataset(sf_rows=1000)
    return pipeline.extract_pipeline(ds)


# ---------------------------------------------------------------------------
# queries
# ---------------------------------------------------------------------------

def _docs(sf_dir: str, columns=None):
    import ray.data as rd

    return rd.read_parquet(f"{sf_dir}/documents.parquet", columns=columns)


def _emb(sf_dir: str):
    import ray.data as rd

    return rd.read_parquet(f"{sf_dir}/embeddings.parquet")


def _pages_extract(sf_dir: str):
    """Flagship: extraction over the synthesized pages corpus scaled to
    the sf level (rows-only check; extraction is not SQL-expressible).
    Golden byte-identity is enforced in tests/test_pipeline_e2e.py."""
    from webxtract import pipeline
    from webxtract.testdata import pages_dataset, rows_for_sf_dir

    ds = pages_dataset(sf_rows=rows_for_sf_dir(sf_dir))
    return pipeline.extract_pipeline(ds).drop_columns(["alt_date", "alt_total"])


def _pages_final(sf_dir: str):
    """Full pipeline incl. review join-back + coalesce (rows-only)."""
    from webxtract import pipeline, synth
    from webxtract.testdata import pages_dataset, rows_for_sf_dir

    n = rows_for_sf_dir(sf_dir)
    model = pipeline.extract_table(synth.make_pages(min(n, 2000)))
    reviews = synth.make_reviews(model)
    ds = pages_dataset(sf_rows=n)
    return pipeline.full_pipeline(ds, reviews=reviews)


def _docs_token_counts(sf_dir: str):
    from webxtract.ops.text import token_count_table

    return _docs(sf_dir, ["doc_id", "text"]).map_batches(
        token_count_table, batch_format="pyarrow", zero_copy_batch=True)


def _docs_quality(sf_dir: str):
    from webxtract.ops.text import quality_score_batch

    return _docs(sf_dir, ["doc_id", "text"]).map_batches(
        quality_score_batch, batch_format="pyarrow", zero_copy_batch=True)


def _docs_langid(sf_dir: str):
    from webxtract.ops.text import LangId

    return _docs(sf_dir, ["doc_id", "text"]).map_batches(
        LangId, batch_format="pyarrow", concurrency=(1, 4), zero_copy_batch=True)


def _docs_fingerprints(sf_dir: str):
    from webxtract.ops.text import Fingerprinter

    return _docs(sf_dir, ["doc_id", "text"]).map_batches(
        Fingerprinter, batch_format="pyarrow", concurrency=(1, 4),
        zero_copy_batch=True).select_columns(["doc_id", "md5"])


def _docs_fingerprint64(sf_dir: str):
    from webxtract.ops.text import Fingerprinter

    return _docs(sf_dir, ["doc_id", "text"]).map_batches(
        Fingerprinter, batch_format="pyarrow", concurrency=(1, 4),
        zero_copy_batch=True).select_columns(["doc_id", "fp64"])


def _docs_bpe_vocab(sf_dir: str):
    """Corpus-trained BPE merge table (rows-only: iterative training is
    not SQL-expressible; Sennrich hand example + pure-Python reference
    equivalence + repartition invariance gated in tests/test_bpe.py)."""
    from webxtract.ops.bpe import docs_bpe_vocab

    return docs_bpe_vocab(sf_dir)


def _docs_bpe_token_counts(sf_dir: str):
    """Per-doc token counts under the corpus-trained BPE vocabulary
    (rows-only; decode round-trip + scalar-encoder spot-checks in
    tests/test_bpe.py)."""
    from webxtract.ops.bpe import docs_bpe_token_counts

    return docs_bpe_token_counts(sf_dir)


def _docs_exact_dedup(sf_dir: str):
    from webxtract.ops.dedup import exact_dedup_keep_first

    return exact_dedup_keep_first(_docs(sf_dir, ["doc_id", "text"]))


def _docs_ngram_jaccard(sf_dir: str):
    from webxtract.ops.dedup import ngram_jaccard_pairs

    return ngram_jaccard_pairs(_docs(sf_dir, ["doc_id", "text"]),
                               threshold=0.7, shingle=1)


def _docs_minhash_pairs(sf_dir: str):
    from webxtract.ops.dedup import minhash_lsh_pairs

    return minhash_lsh_pairs(_docs(sf_dir, ["doc_id", "text"]),
                             threshold=0.7, shingle=1)


def _docs_simhash_pairs(sf_dir: str):
    from webxtract.ops.dedup import simhash_pairs

    return simhash_pairs(_docs(sf_dir, ["doc_id", "text"]), max_dist=3)


def _docs_dedup_clusters(sf_dir: str):
    """Near-dup clusters: MinHash-LSH pairs -> connected components via
    min-label propagation (rows-only; component semantics unit-tested
    on planted chain/star graphs)."""
    from webxtract.ops.dedup import dedup_clusters, minhash_lsh_pairs

    pairs = minhash_lsh_pairs(_docs(sf_dir, ["doc_id", "text"]),
                              threshold=0.7, shingle=1)
    return dedup_clusters(pairs)


def _docs_minhash_pairs_joinverify(sf_dir: str):
    """The 100 TB verify path made driver-visible: candidate pairs are
    verified via two hash joins against the docs table (nothing
    text-sized on the driver) instead of the broadcast token-set dict.
    Must emit exactly the docs_minhash_pairs rows (pytest equivalence
    gate: test_minhash_verify_join_equals_broadcast)."""
    from webxtract.ops.dedup import minhash_lsh_pairs

    return minhash_lsh_pairs(_docs(sf_dir, ["doc_id", "text"]),
                             threshold=0.7, shingle=1, verify="join")


def _docs_jaccard_clusters(sf_dir: str):
    """Connected components ORACLE-CHECKED end-to-end: cluster the
    exact (oracled) n-gram-Jaccard pair list with the same min-label
    propagation used for LSH pairs; the DuckDB twin computes components
    via a recursive-CTE transitive closure. This oracles the clustering
    OPERATOR itself (the LSH variants differ only in their pair
    source)."""
    from webxtract.ops.dedup import dedup_clusters, ngram_jaccard_pairs

    pairs = ngram_jaccard_pairs(_docs(sf_dir, ["doc_id", "text"]),
                                threshold=0.7, shingle=1)
    return dedup_clusters(pairs)


def _docs_jaccard_canonical(sf_dir: str):
    """Canonical-doc selection ORACLE-CHECKED: keep one representative
    (min doc_id) per exact-Jaccard near-dup cluster, singletons
    untouched; oracle = anti-join against the recursive-CTE non-
    canonical set."""
    from webxtract.ops.dedup import canonical_docs, ngram_jaccard_pairs

    docs = _docs(sf_dir, ["doc_id", "lang"])
    pairs = ngram_jaccard_pairs(_docs(sf_dir, ["doc_id", "text"]),
                                threshold=0.7, shingle=1)
    return canonical_docs(docs, pairs)


def _docs_dedup_clusters_dist(sf_dir: str):
    """Distributed connected components made driver-visible: label
    propagation runs as per-round edges ⋈ labels hash joins +
    groupby-min (driver holds one scalar per round). Must emit exactly
    the docs_dedup_clusters rows (pytest gate:
    test_dedup_clusters_distributed_equals_local)."""
    from webxtract.ops.dedup import dedup_clusters, minhash_lsh_pairs

    pairs = minhash_lsh_pairs(_docs(sf_dir, ["doc_id", "text"]),
                              threshold=0.7, shingle=1)
    return dedup_clusters(pairs, mode="distributed")


def _emb_dup_pairs(sf_dir: str):
    # threshold 0.3: the synthetic embeddings contain no true near-dups
    # (max same-label cosine ~0.5), so a realistic 0.9 returns zero rows;
    # 0.3 exercises the same operator with a non-trivial result set.
    from webxtract.ops.dedup import embedding_dup_pairs

    return embedding_dup_pairs(_emb(sf_dir), threshold=0.3)


def _emb_knn(sf_dir: str):
    from webxtract.ops.knn import knn_bruteforce

    return knn_bruteforce(_emb(sf_dir), query_ids=list(range(8)), k=10)


def _emb_knn_ivf(sf_dir: str):
    from webxtract.ops.knn import knn_ivf

    return knn_ivf(_emb(sf_dir), query_ids=list(range(8)), k=10, nprobe=3)


def _emb_knn_lsh(sf_dir: str):
    from webxtract.ops.knn import knn_lsh

    return knn_lsh(_emb(sf_dir), query_ids=list(range(8)), k=10)


def _emb_kmeans(sf_dir: str):
    from webxtract.ops.knn import kmeans

    assignments, _cents = kmeans(_emb(sf_dir), k=8, iters=5)
    return assignments


def _emb_semdedup(sf_dir: str):
    # threshold 0.3 for the same reason as emb_dup_pairs: the synthetic
    # embeddings hold no true near-dups at a realistic 0.9, and 0.3
    # exercises non-trivial removal within the learned clusters.
    from webxtract.ops.knn import semdedup

    return semdedup(_emb(sf_dir), k=8, iters=5, threshold=0.3)


def _emb_knn_pq(sf_dir: str):
    """PQ-ADC ANN with exact refine (Jegou et al. 2011): 16-byte codes,
    m table lookups per vector, exact cosine only on the ADC shortlist
    (rows-only; recall + determinism gates in tests/test_ops.py)."""
    from webxtract.ops.knn import emb_knn_pq

    return emb_knn_pq(sf_dir)


def _emb_knn_ivf_kmeans(sf_dir: str):
    from webxtract.ops.knn import knn_ivf_kmeans

    return knn_ivf_kmeans(_emb(sf_dir), query_ids=list(range(8)), k=10,
                          nprobe=3, n_cells=8, iters=3)


def _emb_knn_hnsw(sf_dir: str):
    """HNSW graph ANN (Malkov & Yashunin 2016): deterministic seeded
    small-world build in one Ray task under HNSW_BUILD_MAX (IVF-kmeans
    is the over-gate fallback), greedy multi-layer descent + ef-bounded
    layer-0 search per query. Rows-only; recall >= LSH/PQ at equal
    candidate budget + layout invariance gated in tests/test_hnsw.py."""
    from webxtract.ops.knn import emb_knn_hnsw

    return emb_knn_hnsw(sf_dir)


def _pages_review_tasks(sf_dir: str):
    """Review-queue projection with deterministic task ids (M15/M16);
    rows-only (derived from the non-SQL extraction)."""
    from webxtract.review import make_review_tasks

    res = _pages_extract(sf_dir)
    return res.map_batches(make_review_tasks, batch_format="pyarrow",
                           zero_copy_batch=True)


def _events_distinct_users(sf_dir: str):
    from webxtract.ops.sketch import exact_distinct_users

    return exact_distinct_users(sf_dir)


def _events_distinct_users_salted(sf_dir: str):
    """Skew-safe salted twin of events_distinct_users: per-(type,
    hash(user)%64) distinct counts sum exactly to per-type distinct —
    no worker ever holds one whole hot type (oracled: same SQL)."""
    from webxtract.ops.sketch import exact_distinct_users_salted

    return exact_distinct_users_salted(sf_dir)


def _events_users_hll(sf_dir: str):
    """Approximate distinct users via mergeable HyperLogLog sketches
    (deterministic hashes + order-independent merge -> stable result;
    accuracy vs exact tested in tests/test_ops.py)."""
    import pyarrow as pa
    import ray.data as rd

    from webxtract.ops.sketch import approx_distinct

    ds = rd.read_parquet(f"{sf_dir}/events.parquet", columns=["user_id"])
    est = approx_distinct(ds, "user_id")
    return pa.table({"approx_users": pa.array([round(est, 1)], pa.float64())})


def _events_value_p50_sketch(sf_dir: str):
    """Approximate grouped median via mergeable KLL sketches — the
    scale-out path named by events_value_median: the exchange carries
    one ~2KB sketch per (group, batch), never the values. Rows-only
    (approximate); rank accuracy vs the exact oracle-checked median is
    gated in tests/test_ops.py::test_grouped_quantile_sketch_vs_exact."""
    from webxtract.ops.sketch import grouped_quantile_sketch

    return grouped_quantile_sketch(sf_dir, q=0.5)


def _pages_line_dedup(sf_dir: str):
    """CCNet-style corpus-wide LINE dedup over the extracted pages
    corpus: duplicated lines (shared boilerplate) survive only at their
    canonical first occurrence (rows-only; line semantics pytest-gated
    in tests/test_dedup.py)."""
    from webxtract import pipeline
    from webxtract.ops.dedup import dedup_lines
    from webxtract.testdata import pages_dataset, rows_for_sf_dir

    ds = pages_dataset(sf_rows=rows_for_sf_dir(sf_dir))
    res = pipeline.extract_pipeline(ds).select_columns(
        ["url", "extracted_text"])
    return dedup_lines(res)


def _parts_copurchase_topk(sf_dir: str):
    """Frequent-itemset mining (Apriori pass 1): top-20 part pairs by
    distinct-order co-purchase support — vectorized per-order pair
    segments, one pair-keyed integer-partial exchange, fused local
    top-k per partition before the tiny global sort."""
    from webxtract.ops.graph import parts_copurchase_topk

    return parts_copurchase_topk(sf_dir)


def _docs_validate(sf_dir: str):
    """Great-Expectations-style ingest validation: per-rule violation
    counts (nulls, dup keys, empty text, n_chars mismatch, lang /
    source domain) — row-local rules in one no-exchange scan, the
    uniqueness rule through the standard bounded hash exchange."""
    from webxtract.ops.text import docs_validate

    return docs_validate(sf_dir)


def _emb_hard_negatives(sf_dir: str):
    """Hard-negative mining on the int8-quantized codes: exact integer
    dot-product argmax over different-label candidates (tie -> min
    neg_id) — zero float-tie hazards, the production quantized-scan
    shape."""
    from webxtract.ops.knn import emb_hard_negatives

    return emb_hard_negatives(sf_dir)


def _customer_spend_trend(sf_dir: str):
    """Distributed grouped OLS (regr_slope shape): per-customer spend
    trend from exact int64 sufficient-statistic partials + one bounded
    customer-keyed exchange; slope evaluated in the oracle's exact
    expression order."""
    from webxtract.ops.relational import customer_spend_trend

    return customer_spend_trend(sf_dir)


def _docs_compression_ratio(sf_dir: str):
    """MassiveText-style zlib compression-ratio quality signal
    (rows-only: no SQL zlib; planted repetitive-vs-prose ordering and
    determinism gated in tests/test_ops.py)."""
    from webxtract.ops.text import docs_compression_ratio

    return docs_compression_ratio(sf_dir)


def _docs_chunk_overlap(sf_dir: str):
    """Sliding-window chunking (window 32, stride 24 — the RAG /
    embedding-prep shape): overlapping gather built with pure
    repeat/cumsum index arithmetic, md5-pinned chunk strings."""
    from webxtract.ops.text import docs_chunk_overlap

    return docs_chunk_overlap(sf_dir)


def _docs_inverted_index(sf_dir: str):
    """Retrieval-index build: one term-keyed exchange of (doc, term,
    tf), vectorized per-partition fold -> exact df / tf_total + the
    first-10 sorted posting ids per term (bounded output; a real index
    spills full postings to partitioned parquet from the same fold)."""
    from webxtract.ops.text import docs_inverted_index

    return docs_inverted_index(sf_dir)


def _docs_nb_quality(sf_dir: str):
    """Supervised quality classifier: one-pass multinomial Naive Bayes
    with integer micro-nat weights (bit-deterministic, the kmeans
    fixed-point discipline) recovering a planted lexical-preference
    label from bag-of-words evidence — 93% train accuracy vs the 64%
    majority baseline. Vocab-broadcast below the scale gate, weight-
    table hash join above (equivalence-gated)."""
    from webxtract.ops.text import docs_nb_quality

    return docs_nb_quality(sf_dir)


def _docs_ccnet_buckets(sf_dir: str):
    """CCNet head/middle/tail thirds (Wenzek et al. 2020): corpus-LM
    mean unigram log-prob DESC + doc_id tie-break, NTILE(3) semantics
    via global_row_number. 'head' is the premium training slice."""
    from webxtract.ops.text import docs_ccnet_buckets

    return docs_ccnet_buckets(sf_dir)


def _docs_c4_clean(sf_dir: str):
    """C4 line-level cleaning (Raffel et al. 2020 §2.2): lines kept only
    when they end in terminal punctuation, have >= 5 words and lack
    'javascript'; pages kept with >= 3 kept lines and no 'lorem ipsum'
    / '{'. Runs over deterministic multi-line pages synthesized in
    closed form from (doc_id, line idx) so the DuckDB oracle rebuilds
    the identical pages with string_split + string_agg; every rule
    bites (sf0.001: 409/500 docs survive)."""
    from webxtract.ops.text import docs_c4_clean

    return docs_c4_clean(sf_dir)


def _pages_c4_clean(sf_dir: str):
    """The SAME c4_clean_batch stage pointed at the REAL multi-line
    extraction output (one stats row per page: n_lines / n_kept /
    c4_pass) — rows-only: reports how hard C4 would prune the real
    corpus (sf0.001: 350/1000 pages pass — most receipt lines lack
    terminal punctuation; rule semantics are oracled via docs_c4_clean
    and unit-gated in tests/test_ops.py)."""
    from webxtract import pipeline
    from webxtract.ops.text import c4_clean_batch
    from webxtract.testdata import pages_dataset, rows_for_sf_dir

    ds = pages_dataset(sf_rows=rows_for_sf_dir(sf_dir))
    res = pipeline.extract_pipeline(ds).select_columns(
        ["url", "extracted_text"])
    return res.map_batches(
        lambda b: c4_clean_batch(b, id_col="url",
                                 text_col="extracted_text")
        .select(["url", "n_lines", "n_kept", "c4_pass"]),
        batch_format="pyarrow", zero_copy_batch=True)


def _docs_line_dedup(sf_dir: str):
    """The SAME dedup_lines operator as pages_line_dedup, pointed at the
    documents table so the line-dedup semantics are DuckDB-oracled
    (hash-checked): winner = min (id, zero-padded line idx) string key,
    non-winner occurrences of any duplicated line stripped everywhere,
    fully-stripped docs keep ''."""
    from webxtract.ops.dedup import dedup_lines

    return dedup_lines(_docs(sf_dir, ["doc_id", "text"]),
                       text_col="text", id_col="doc_id")


def _docs_contaminated(sf_dir: str):
    """Benchmark decontamination: docs containing any eval-set snippet
    (Aho-Corasick broadcast probe; oracle: EXISTS + contains)."""
    from webxtract.ops.text import docs_decontaminate_ids

    return docs_decontaminate_ids(sf_dir)


def _docs_stratified_sample(sf_dir: str):
    """Deterministic per-language stratified sample (grouped
    ROW_NUMBER <= k by md5; oracled)."""
    from webxtract.ops.text import docs_stratified_sample

    return docs_stratified_sample(sf_dir)


def _docs_source_mix(sf_dir: str):
    """Training-mixture sampling: per-source quotas (grouped
    ROW_NUMBER <= k(source) by md5; oracled)."""
    from webxtract.ops.text import docs_source_mix

    return docs_source_mix(sf_dir)


def _docs_tfidf_top_term(sf_dir: str):
    """Per-doc keyword extraction: highest tf*ln(N/df) term (oracled)."""
    from webxtract.ops.text import docs_tfidf_top_term

    return docs_tfidf_top_term(sf_dir)


def _docs_terms_mg(sf_dir: str):
    """Approximate top-k terms via mergeable Misra-Gries summaries —
    bounded-memory scale path of docs_term_counts (rows-only; accuracy
    vs the exact oracled twin gated in tests/test_ops.py)."""
    from webxtract.ops.sketch import docs_terms_mg

    return docs_terms_mg(sf_dir)


def _docs_stopword_removal(sf_dir: str):
    """Vectorized stopword-strip cleaning (oracle: regexp_replace g)."""
    from webxtract.ops.text import docs_stopword_removal

    return docs_stopword_removal(sf_dir)


def _docs_repetition(sf_dir: str):
    """Gopher-style repetition signals: duplicate-token fraction and
    top-bigram share per doc (oracled: DuckDB list kernels + unnest)."""
    from webxtract.ops.text import docs_repetition

    return docs_repetition(sf_dir)


def _docs_split(sf_dir: str):
    """Deterministic md5 train/val split assignment (oracled)."""
    from webxtract.ops.text import docs_split

    return docs_split(sf_dir)


def _docs_pii_redact(sf_dir: str):
    """PII redaction over a deterministically-planted corpus (oracled:
    identical RE2 patterns via regexp_replace g)."""
    from webxtract.ops.text import docs_pii_redact

    return docs_pii_redact(sf_dir)


def _docs_pack_sequences(sf_dir: str):
    """Greedy fixed-budget sequence packing (rows-only: bin packing is
    not SQL-expressible; property gates in tests/test_ops.py)."""
    from webxtract.ops.packing import docs_pack_sequences

    return docs_pack_sequences(sf_dir)


def _docs_dsir_topk(sf_dir: str):
    """DSIR importance resampling (Xie et al. 2023): top-100 docs by
    target-vs-raw unigram-LM log-ratio weight, target = lang=='en'
    (oracled: unnest + filtered counts + join + sum(ln ratios))."""
    from webxtract.ops.text import docs_dsir_topk

    return docs_dsir_topk(sf_dir)


def _docs_bpe_pack(sf_dir: str):
    """Tokenize -> pack composite: corpus-trained BPE counts feed the
    greedy packer (rows-only; budget/preservation/equivalence gates in
    tests)."""
    from webxtract.ops.packing import docs_bpe_pack

    return docs_bpe_pack(sf_dir)


def _docs_temperature_mix(sf_dir: str):
    """Temperature-weighted mixture sampling: per-source quota
    max(1, floor(0.5 * count^0.7)) — sublinear upsampling of small
    sources (oracled: window count + pow arithmetic)."""
    from webxtract.ops.text import docs_temperature_mix

    return docs_temperature_mix(sf_dir)


def _docs_bm25_topk(sf_dir: str):
    """BM25 top-20 for the self-derived 3-most-frequent-term query
    (oracled: unnest + window + ln arithmetic)."""
    from webxtract.ops.text import docs_bm25_topk

    return docs_bm25_topk(sf_dir)


def _docs_normalize_text(sf_dir: str):
    """Unicode NFC + whitespace-collapse fingerprint per doc (oracled:
    nfc_normalize + regexp_replace + trim + md5)."""
    from webxtract.ops.text import docs_normalize_text

    return docs_normalize_text(sf_dir)


def _docs_gopher_quality(sf_dir: str):
    """Gopher-rule quality signals + pass flag (oracled: unnest +
    grouped avg + replace-count arithmetic)."""
    from webxtract.ops.text import docs_gopher_quality

    return docs_gopher_quality(sf_dir)


def _events_type_users_hll(sf_dir: str):
    """Grouped HLL distinct-user estimates per event type (rows-only;
    accuracy gated vs the oracled exact twin in tests/test_ops.py)."""
    from webxtract.ops.sketch import events_type_users_hll

    return events_type_users_hll(sf_dir)


def _docs_regex_tokens(sf_dir: str):
    """BPE-style pre-token counts (oracled: same RE2 pattern)."""
    from webxtract.ops.text import docs_regex_tokens

    return docs_regex_tokens(sf_dir)


def _docs_dup_spans(sf_dir: str):
    """Cross-document duplicated 8-gram spans (Lee et al. ExactSubstr
    signal), top-50 by document spread (oracled)."""
    from webxtract.ops.text import docs_dup_spans

    return docs_dup_spans(sf_dir)


def _docs_dup_span_frac(sf_dir: str):
    """Per-doc duplicated-span coverage fraction (oracled; broadcast/
    Bloom+join auto-gate, equivalence-tested)."""
    from webxtract.ops.text import docs_dup_span_frac

    return docs_dup_span_frac(sf_dir)


def _docs_remove_dup_spans(sf_dir: str):
    """ExactSubstr span-deletion transform: text rewritten with every
    cross-doc duplicated 8-gram window removed (oracled)."""
    from webxtract.ops.text import docs_remove_dup_spans

    return docs_remove_dup_spans(sf_dir)


def _docs_clean_corpus(sf_dir: str):
    """End-to-end curation composite: exact dedup -> span deletion ->
    token/quality gates, oracled end to end."""
    from webxtract.ops.text import docs_clean_corpus

    return docs_clean_corpus(sf_dir)


def _q9_product_profit(sf_dir: str):
    """TPC-H Q9 shape (supply cost stand-in documented; oracled)."""
    from webxtract.ops.relational import q9_product_profit

    return q9_product_profit(sf_dir)


def _q16_supplier_variety(sf_dir: str):
    """TPC-H Q16 shape via the lineitem part-supplier link (oracled)."""
    from webxtract.ops.relational import q16_supplier_variety

    return q16_supplier_variety(sf_dir)


def _q20_excess_shipments(sf_dir: str):
    """TPC-H Q20 shape: HAVING subquery semi-joined back (oracled)."""
    from webxtract.ops.relational import q20_excess_shipments

    return q20_excess_shipments(sf_dir)


def _q11_important_parts(sf_dir: str):
    """TPC-H Q11 shape: global-scalar threshold over grouped value
    (oracled)."""
    from webxtract.ops.relational import q11_important_parts

    return q11_important_parts(sf_dir)


def _docs_terms_cms(sf_dir: str):
    """Count-Min estimated counts for the exact top-50 terms
    (rows-only; one-sided accuracy gated in tests)."""
    from webxtract.ops.sketch import docs_terms_cms

    return docs_terms_cms(sf_dir)


def _events_late_arrivals(sf_dir: str):
    """Per-user watermark late-data detection (oracled)."""
    from webxtract.ops.relational import events_late_arrivals

    return events_late_arrivals(sf_dir)


def _docs_bigram_logprob(sf_dir: str):
    """Bigram-LM quality score, corpus as the LM (oracled)."""
    from webxtract.ops.text import docs_bigram_logprob

    return docs_bigram_logprob(sf_dir)


def _docs_weighted_sample(sf_dir: str):
    """Efraimidis-Spirakis weighted sample (deterministic md5-derived
    uniforms, key ln(u)/n_chars, global top-100; oracled)."""
    from webxtract.ops.text import docs_weighted_sample

    return docs_weighted_sample(sf_dir)


def _emb_norms(sf_dir: str):
    """Per-vector L2 norms (oracled: DuckDB list kernels)."""
    from webxtract.ops.knn import emb_norms

    return emb_norms(sf_dir)


def _emb_label_centroids(sf_dir: str):
    """Per-label centroids, long format (oracled: unnest + avg)."""
    from webxtract.ops.knn import emb_label_centroids

    return emb_label_centroids(sf_dir)


def _images_phash_dupes(sf_dir: str):
    """Near-dup image pairs over a deterministic synthetic BMP corpus:
    dhash64 -> banded LSH -> hamming signature-join (rows-only; planted
    pairs asserted in tests/test_ops.py)."""
    from webxtract.ops.media import images_phash_dupes

    return images_phash_dupes(sf_dir)


def _domain_link_edges(sf_dir: str):
    """ORACLED crawl link graph: the REAL DOM parser walks anchors over
    the deterministic synthetic crawl, resolves hosts (relative ->
    same-host self-loop -> dropped; protocol-relative; case-folded;
    non-web schemes ignored) and the distinct cross-host edge set is
    recomputed closed-form by DuckDB from doc_id."""
    from webxtract.ops.web import domain_link_edges

    return domain_link_edges(sf_dir)


def _domain_pagerank(sf_dir: str):
    """ORACLED composite: domain-level PageRank over the crawl link
    graph (dictionary-encoded hosts -> integer recurrence over pinned
    edge blocks -> top-25 hosts); DuckDB runs the identical unrolled
    integer rounds over the closed-form edge set."""
    from webxtract.ops.web import domain_pagerank

    return domain_pagerank(sf_dir)


def _warc_page_stats(sf_dir: str):
    """ORACLED WARC source: the documents table serialized into
    gzip-member WARC files (the Common-Crawl container, real
    Content-Length framing + warcinfo records + HTTP payload headers),
    parsed back by ops.warc.read_warc; DuckDB recomputes (url, status,
    byte count) closed-form, so a hash match certifies the framing
    parser end to end — including payloads that contain CRLFCRLF and
    'WARC/' markers (framing by length, never by marker scan)."""
    from webxtract.ops.warc import warc_page_stats

    return warc_page_stats(sf_dir)


def _html_meta(sf_dir: str):
    """ORACLED HTML head metadata: title (whitespace-collapsed), meta
    description, rel=canonical link (attr-value case-insensitive),
    robots noindex token, og:title — first-wins DOM walk; DuckDB
    recomputes every field closed-form."""
    from webxtract.ops.web import html_meta

    return html_meta(sf_dir)


def _docs_topic_clusters(sf_dir: str):
    """ORACLED topic clustering: integer Lloyd's k-means over
    md5-hashed token-count features (PageRank-style raw-task folds
    over pinned feature blocks); the unrolled all-integer CTE twin is
    bit-exact."""
    from webxtract.ops.text import docs_topic_clusters

    return docs_topic_clusters(sf_dir)


def _html_tables_markdown(sf_dir: str):
    """ORACLED table->markdown linearization (the LLM-corpus table
    serialization): header line + '---' separator sized to the header
    + data lines, cells joined in col order inside one doc-keyed
    co-location; DuckDB rebuilds every string with ordered
    string_agg over the identical cell grid."""
    from webxtract.ops.web import html_tables_markdown

    return html_tables_markdown(sf_dir)


def _html_markdown(sf_dir: str):
    """ORACLED full-document HTML->markdown linearization (the
    whole-page twin of html_tables_markdown): headings, inline marks,
    links/images, nested lists, blockquote prefixes, pre fences, hr
    and the table grid, all from the engine's tag-soup DOM with
    explicit-stack walks; DuckDB rebuilds each page's exact string by
    concatenation from doc_id."""
    from webxtract.ops.web import html_markdown

    return html_markdown(sf_dir)


def _docs_bm25_retrieve(sf_dir: str):
    """BM25 over the on-disk inverted index — the READ path (oracled,
    same SQL as docs_bm25_topk: two physical plans, one answer):
    metadata-only posting-partition pruning, term filter pushed into
    the scan, ONE doc-keyed join for lengths, query-term-ordered
    per-doc fold -> bit-identical scores to the full scan."""
    from webxtract.ops.retrieval import docs_bm25_retrieve

    return docs_bm25_retrieve(sf_dir)


def _parts_communities(sf_dir: str):
    """Label-propagation communities (oracled): synchronous min-tie
    LPA over the co-order part graph — per round the |nodes|-bounded
    label vector broadcasts, edges emit directed neighbor-label pairs
    map-side, ONE node-keyed fold counts and picks (count DESC,
    label ASC); DuckDB unrolls the identical rounds."""
    from webxtract.ops.graph import parts_communities

    return parts_communities(sf_dir)


def _html_microdata(sf_dir: str):
    """schema.org MICRODATA extraction (oracled): the pre-JSON-LD
    structured-data channel — itemscope/itemtype/itemprop through the
    REAL DOM walk with the HTML Standard value rules (meta content,
    href/src tags, time datetime, multi-name itemprop, nested items
    scoped to the inner item)."""
    from webxtract.ops.web import html_microdata

    return html_microdata(sf_dir)


def _hosts_blocklist(sf_dir: str):
    """UT1-style registrable-domain blocklist gate (oracled): PSL fold
    -> ONE membership probe per row (broadcast set under a gate, hash
    semi-join twin above it); a list entry blocks the whole domain
    tree, suffix-only hosts never block."""
    from webxtract.ops.web import hosts_blocklist

    return hosts_blocklist(sf_dir)


def _warc_wet(sf_dir: str):
    """ORACLED WET sidecar chain (the Common Crawl .warc.wet.gz
    derivative): WARC parse -> full-page DOM text (dom_plain_text,
    one line per block element — NOT boilerplate-stripped, per the
    WET convention) -> conversion-record serialization -> WET framing
    parse; resumable one-output-per-input conversion. DuckDB
    recomputes (url, warc_ts, text, n_chars) closed-form."""
    from webxtract.ops.warc import warc_wet

    return warc_wet(sf_dir)


def _warc_wat(sf_dir: str):
    """ORACLED WAT sidecar chain (the .warc.wat.gz metadata
    derivative): WARC parse -> DOM metadata walk (title/description
    via the real extract_page_meta + anchors in document order) ->
    deterministic JSON envelope -> metadata-record serialization ->
    WAT framing + JSON parse. DuckDB recomputes every projected field
    from doc_id over the rich closed-form fixture."""
    from webxtract.ops.warc import warc_wat

    return warc_wat(sf_dir)


def _docs_langid_ngram(sf_dir: str):
    """From-scratch char-n-gram language identification (oracled):
    multiclass multinomial NB over byte trigrams TRAINED on the
    corpus's own lang labels — the CCNet stage-one / fastText-langid
    shape (vs docs_langid's fixed stopword profiles) — with integer
    micro-nat fixed-point scores (bit-exact vs the substr-trigram SQL
    twin). Output (doc_id, lang, pred_lang, margin)."""
    from webxtract.ops.text import docs_langid_ngram

    return docs_langid_ngram(sf_dir)


def _docs_lexicon_hits(sf_dir: str):
    """Policy-lexicon hit counting (oracled): word-bounded
    case-insensitive RE2 scan per lexicon entry incl. multi-word
    phrases, vectorized per batch; (hits, n_terms, flagged) per doc.
    The C4/UT1 badwords shape."""
    from webxtract.ops.text import docs_lexicon_hits

    return docs_lexicon_hits(sf_dir)


def _hosts_registrable(sf_dir: str):
    """Registrable-domain (eTLD+1) extraction: PSL wildcard/exception
    matching over a closed-form messy-host fixture; the oracle re-runs
    the match against the rule list as a VALUES table."""
    from webxtract.ops.web import hosts_registrable

    return hosts_registrable(sf_dir)


def _hosts_shard_assign(sf_dir: str):
    """Stable shard assignment via integer-exact jump consistent
    hashing (Lamping & Veach); the oracle re-runs the LCG + jump loop
    as a recursive CTE in exact HUGEINT arithmetic."""
    from webxtract.ops.web import hosts_shard_assign

    return hosts_shard_assign(sf_dir)


def _hosts_link_farms(sf_dir: str):
    """Link-farm detection composite: REAL DOM link walk + REAL PSL
    registrable-domain collapse + integer fan-out rule; the oracle
    recomputes the planted edge set and re-runs the rule."""
    from webxtract.ops.web import hosts_link_farms

    return hosts_link_farms(sf_dir)


def _hosts_mirror_pairs(sf_dir: str):
    """Mirror-site detection: hosts sharing identical content hashes
    pair up under a boilerplate star-cap; the oracle groups by content
    directly (md5 grouping == text grouping) and re-runs the band +
    integer rule."""
    from webxtract.ops.web import hosts_mirror_pairs

    return hosts_mirror_pairs(sf_dir)


def _pages_anchor_rels(sf_dir: str):
    """Anchor rel-token accounting (nofollow/ugc/sponsored link-graph
    weighting); the oracle recomputes counts closed-form."""
    from webxtract.ops.web import pages_anchor_rels

    return pages_anchor_rels(sf_dir)


def _docs_docx_extract(sf_dir: str):
    """DOCX text extraction (hand-rolled PKZIP central-directory walk
    + WordprocessingML run scanner); every paragraph closed-form."""
    from webxtract.ops.docx import docs_docx_extract

    return docs_docx_extract(sf_dir)


def _docs_odt_extract(sf_dir: str):
    """ODT text extraction (stored-mimetype rule + shared ZIP walk +
    text:p/span scanner); every paragraph closed-form."""
    from webxtract.ops.office import docs_odt_extract

    return docs_odt_extract(sf_dir)


def _docs_rtf_extract(sf_dir: str):
    """RTF text extraction (control-word tokenizer, destination
    skipping, cp1252/unicode escapes); every paragraph closed-form."""
    from webxtract.ops.office import docs_rtf_extract

    return docs_rtf_extract(sf_dir)


def _docs_xlsx_extract(sf_dir: str):
    """XLSX cell extraction (shared-strings dictionary resolution, A1
    reference decode, all cell kinds); every cell closed-form."""
    from webxtract.ops.xlsx import docs_xlsx_extract

    return docs_xlsx_extract(sf_dir)


def _docs_sqlite_extract(sf_dir: str):
    """From-scratch SQLite b-tree walk over real databases written by
    the stdlib engine; every row closed-form."""
    from webxtract.ops.sqlitewalk import docs_sqlite_extract

    return docs_sqlite_extract(sf_dir)


def _docs_ics_extract(sf_dir: str):
    """iCalendar extraction (75-octet unfold splice, RFC 5545 text
    unescape, VEVENT grouping); every field closed-form."""
    from webxtract.ops.ical import docs_ics_extract

    return docs_ics_extract(sf_dir)


def _docs_tar_extract(sf_dir: str):
    """tar/ustar archive walk (checksums verified, prefix split,
    gzip arm); every entry closed-form."""
    from webxtract.ops.tarwalk import docs_tar_extract

    return docs_tar_extract(sf_dir)


def _docs_csv_extract(sf_dir: str):
    """CSV extraction with SNIFFED dialects (quote-aware RFC 4180
    machine: embedded delimiters/newlines, doubled quotes); every
    cell closed-form."""
    from webxtract.ops.csvtext import docs_csv_extract

    return docs_csv_extract(sf_dir)


def _docs_email_extract(sf_dir: str):
    """Email/MIME extraction (RFC 5322 unfolding, RFC 2047 B/Q
    encoded words, multipart walk, QP/base64 decode); every field
    closed-form."""
    from webxtract.ops.mime import docs_email_extract

    return docs_email_extract(sf_dir)


def _pages_office_extract(sf_dir: str):
    """The format-dispatch integration as a query: a mixed
    PDF/DOCX/ODT/RTF invoice corpus through the REAL QualityGate +
    Extractor stages; (doc_kind, vendor_value) closed-form."""
    from webxtract.ops.office import pages_office_extract

    return pages_office_extract(sf_dir)


def _docs_epub_extract(sf_dir: str):
    """EPUB extraction (OCF mimetype rule -> container.xml -> OPF
    manifest/spine -> XHTML scan); chapter content stored rotated
    against file names so parity certifies real spine resolution."""
    from webxtract.ops.epub import docs_epub_extract

    return docs_epub_extract(sf_dir)


def _docs_pptx_extract(sf_dir: str):
    """PPTX slide-text extraction (numeric slide-part ordering +
    DrawingML a:p/a:r/a:t scan); every paragraph closed-form."""
    from webxtract.ops.pptx import docs_pptx_extract

    return docs_pptx_extract(sf_dir)


def _images_tiff_decode(sf_dir: str):
    """Baseline TIFF pixel decode (strips + PackBits + TIFF-LZW from
    spec); the closed-form pixel SUM certifies every pixel of every
    strip — a single wrong byte shifts it."""
    from webxtract.ops.tiffcodec import images_tiff_decode

    return images_tiff_decode(sf_dir)


def _docs_ccnet_corpus(sf_dir: str):
    """CCNet three-stage composite (dedup -> langid -> LM buckets),
    oracled end-to-end by splicing the three component oracles."""
    from webxtract.ops.ccnet import docs_ccnet_corpus

    return docs_ccnet_corpus(sf_dir)


def _images_exif_probe(sf_dir: str):
    """EXIF/TIFF metadata probe (pure-spec IFD walk over real TIFF and
    JPEG+APP1 carriers); every field closed-form from doc_id."""
    from webxtract.ops.exif import images_exif_probe

    return images_exif_probe(sf_dir)


def _pdfs_probe(sf_dir: str):
    """Real-PDF structural probe (from-scratch ISO 32000 xref walk:
    classic tables, xref streams + PNG predictor, ObjStm type-2
    entries, /Prev incremental-update chains, Flate/ASCIIHex filter
    cascades); every field closed-form from doc_id."""
    from webxtract.ops.pdf import pdfs_probe

    return pdfs_probe(sf_dir)


def _pdfs_text_extract(sf_dir: str):
    """Per-(file, page) reading-order text from real PDF bytes through
    the content-stream interpreter (Tj/TJ/hex shows, Td/Tm hops) and
    the SAME grouping/XY-cut engine as the %XYD1 path; the oracle
    regenerates every word byte-for-byte."""
    from webxtract.ops.pdf import pdfs_text_extract

    return pdfs_text_extract(sf_dir)


def _pdfs_kv_fields(sf_dir: str):
    """Geometric key-value pairing over real PDFs (Textract-FORMS
    analogue, reference fn-call-textract/main.py:52-61)."""
    from webxtract.ops.pdf import pdfs_kv_fields

    return pdfs_kv_fields(sf_dir)


def _hreflang_return_tags(sf_dir: str):
    """hreflang return-tag audit (directed alternate edges with
    reverse-edge status); the oracle recomputes edges closed-form."""
    from webxtract.ops.web import hreflang_return_tags

    return hreflang_return_tags(sf_dir)


def _shard_write_plan(sf_dir: str):
    """Per-shard write plan (jump shards x real n_chars sums); the
    oracle composes the shared recursive jump CTE + a doc_id join."""
    from webxtract.ops.web import shard_write_plan

    return shard_write_plan(sf_dir)


def _hosts_backoff(sf_dir: str):
    """Exponential throttle backoff per host from 429/503 responses;
    the oracle recomputes counts and the shift arithmetic."""
    from webxtract.ops.web import hosts_backoff

    return hosts_backoff(sf_dir)


def _urls_percent_normalize(sf_dir: str):
    """RFC 3986 unreserved percent-escape decoding; the oracle's
    replace chain is generated from the op's own character table."""
    from webxtract.ops.web import urls_percent_normalize

    return urls_percent_normalize(sf_dir)


def _crawl_coverage(sf_dir: str):
    """Sitemap-vs-crawl coverage audit over two REAL sources (soup
    sitemap parse x CDX framing walk); the oracle recomputes
    membership closed-form."""
    from webxtract.ops.web import crawl_coverage

    return crawl_coverage(sf_dir)


def _hosts_soft404(sf_dir: str):
    """Within-host template-page (soft-404) detection; the oracle
    recomputes counts and md5s closed-form."""
    from webxtract.ops.web import hosts_soft404

    return hosts_soft404(sf_dir)


def _domain_reciprocity(sf_dir: str):
    """Mutual-link ratio per source host (link-exchange signal); the
    oracle recomputes the closed-form edges + a reverse self-join."""
    from webxtract.ops.web import domain_reciprocity

    return domain_reciprocity(sf_dir)


def _warc_cluster_idx(sf_dir: str):
    """Two-level CDX (cluster.idx): every Nth row of the sorted
    index; the oracle composes the shared CDX CTE + ROW_NUMBER."""
    from webxtract.ops.warc import warc_cluster_idx

    return warc_cluster_idx(sf_dir)


def _docs_translation_pairs(sf_dir: str):
    """Translation-pair mining from hreflang clusters (bitext prep);
    the oracle rebuilds the alternate table closed-form and pairs
    with a lang-ordered self-join."""
    from webxtract.ops.web import docs_translation_pairs

    return docs_translation_pairs(sf_dir)


def _domain_crawl_quota(sf_dir: str):
    """Hamilton apportionment of a fetch budget over domain quality
    weights (PSL -> quality -> prior -> quota); the oracle recomputes
    base/remainder with window SUMs and ROW_NUMBER ranking."""
    from webxtract.ops.web import domain_crawl_quota

    return domain_crawl_quota(sf_dir)


def _warc_incremental_stats(sf_dir: str):
    """WARC revisit-record storage accounting: unchanged pages write
    digest-only revisit records; the oracle rebuilds every response
    payload from the serialization grammar."""
    from webxtract.ops.warc import warc_incremental_stats

    return warc_incremental_stats(sf_dir)


def _warc_random_access(sf_dir: str):
    """CDX ranged fetch of every 37th page from the GZ-member
    fixture: one seek+read per record, proven to touch only the
    recorded extents; the oracle rebuilds (url, n_bytes, md5) from
    the documents text closed-form."""
    from webxtract.ops.warc import warc_random_access

    return warc_random_access(sf_dir)


def _pages_decode_text(sf_dir: str):
    """Charset-aware payload decode composite (header charset ->
    codec whitelist -> strict decode with pinned U+FFFD fallback);
    the oracle emits the closed-form expected strings."""
    from webxtract.ops.warc import pages_decode_text

    return pages_decode_text(sf_dir)


def _pages_indexability(sf_dir: str):
    """Indexability decision composite: union of the header channel
    (X-Robots-Tag) and the body channel (meta robots) plus the
    status/content-type gates; the oracle composes the shared header
    CTE with the fixture's closed-form meta channel."""
    from webxtract.ops.warc import pages_indexability

    return pages_indexability(sf_dir)


def _domain_quality_prior(sf_dir: str):
    """Domain quality prior composite: REAL PSL matcher x REAL
    quality features, folded to exact integer aggregates per
    registrable domain; the oracle composes the shared PSL CTE with
    the quality feature SQL."""
    from webxtract.ops.web import domain_quality_prior

    return domain_quality_prior(sf_dir)


def _docs_cdc_chunks(sf_dir: str):
    """Content-defined chunking (gear-hash CDC) over document text —
    rows-only (the gear recurrence is not SQL-expressible; the
    scalar<->vector equivalence gate + tiling/locality property tests
    carry correctness)."""
    from webxtract.ops.cdc import docs_cdc_chunks

    return docs_cdc_chunks(sf_dir)


def _urls_recrawl_schedule(sf_dir: str):
    """Revisit-policy estimator over capture history; the oracle
    re-runs the adjacent-change LAG window and the integer clamp."""
    from webxtract.ops.web import urls_recrawl_schedule

    return urls_recrawl_schedule(sf_dir)


def _warc_http_fields(sf_dir: str):
    """HTTP header semantics over the varied-header WARC fixture,
    through the real framing parser; the oracle rebuilds each header
    block string and re-runs the same regexes + strptime."""
    from webxtract.ops.warc import warc_http_fields

    return warc_http_fields(sf_dir)


def _urls_templates(sf_dir: str):
    """URL template mining / spider-trap detection: paths generalize
    to templates (hex runs then digit runs) and (host, template)
    populations flag traps; the oracle re-runs the generalization."""
    from webxtract.ops.web import urls_templates

    return urls_templates(sf_dir)


def _redirect_resolution(sf_dir: str):
    """ORACLED redirect-chain resolution: meta-refresh edges from the
    REAL alternates extractor followed to their terminal url with
    exact hop counts, capped at 5; cycles / over-long chains emit
    (NULL, cap, 'unresolved') as data. Broadcast-walk and pointer-
    doubling join paths equivalence-tested; DuckDB recomputes every
    row closed-form."""
    from webxtract.ops.web import redirect_resolution

    return redirect_resolution(sf_dir)


def _robots_sitemaps(sf_dir: str):
    """ORACLED sitemap discovery: the global Sitemap: field parsed
    from the per-host robots fixture (case-insensitive key, comments,
    document order); DuckDB recomputes the |hosts|-bounded table
    closed-form."""
    from webxtract.ops.web import robots_sitemaps

    return robots_sitemaps(sf_dir)


def _crawl_schedule_plan(sf_dir: str):
    """ORACLED politeness scheduler composing three real pipelines:
    frontier admission (robots x noindex), Crawl-delay budgets, and
    per-host fetch slots (slot = queue position, fetch_at_ms = slot x
    delay, 1000 ms floor); DuckDB recomputes admission closed-form
    and slots with a row_number window."""
    from webxtract.ops.web import crawl_schedule_plan

    return crawl_schedule_plan(sf_dir)


def _docs_fix_mojibake(sf_dir: str):
    """ORACLED ftfy-style mojibake repair: sloppy-cp1252 inverse of
    utf-8-read-as-cp1252 mangling, up to 2 rounds, strict-UTF-8
    acceptance guard; the fixture mangles with the real encode chain
    and DuckDB emits the expected clean strings closed-form."""
    from webxtract.ops.text import docs_fix_mojibake

    return docs_fix_mojibake(sf_dir)


def _warc_cdx(sf_dir: str):
    """ORACLED CDX capture index over the plain WARC fixture: SURT
    key, 14-digit timestamp, file + byte-exact record offset/length
    (the random-access contract), status and payload md5; DuckDB
    rebuilds every extent from the serialization grammar (strlen
    arithmetic incl. Content-Length digit widths) and offsets with a
    per-file window sum."""
    from webxtract.ops.warc import warc_cdx

    return warc_cdx(sf_dir)


def _warc_cdx_sharded(sf_dir: str):
    """ORACLED twin of warc_cdx through the 100 TB path: per-group
    SORTED parquet runs (atomic, resumable) + a range-partitioned
    k-way merge with bounded memory and NO global sort exchange —
    the two-level layout Common Crawl's own cdx-*.gz + cluster.idx
    uses. Same oracle as warc_cdx (rows are identical by the
    equivalence gate in test_warc_cdx.py)."""
    from webxtract.ops.warc import warc_cdx_sharded

    return warc_cdx_sharded(sf_dir)


def _robots_crawl_delay(sf_dir: str):
    """ORACLED per-host politeness budget: Crawl-delay parsed with the
    same most-specific-group supersession as the gate (a foreign
    agent's delay must not leak); fractional seconds -> integer ms."""
    from webxtract.ops.web import robots_crawl_delay

    return robots_crawl_delay(sf_dir)


def _docs_dehyphenate(sf_dir: str):
    """ORACLED end-of-line dehyphenation (PDF/column extraction
    cleanup): one RE2 global replace with group references; the
    fixture hyphen-breaks every space so parity pins pattern,
    replacement and the non-rematching global-scan semantics."""
    from webxtract.ops.text import docs_dehyphenate

    return docs_dehyphenate(sf_dir)


def _crawl_frontier(sf_dir: str):
    """ORACLED capstone composite: robots-allowed AND NOT noindex,
    prioritized by link-graph PageRank — one page-keyed hash join +
    a |domains|-bounded rank broadcast; three real extractors
    composed, DuckDB recomputing all of it closed-form."""
    from webxtract.ops.web import crawl_frontier

    return crawl_frontier(sf_dir)


def _feed_inventory(sf_dir: str):
    """ORACLED RSS/Atom feed source: per-host feeds (RSS even hosts /
    Atom odd) rendered in one host-keyed co-location and parsed back
    by the soup walk — including the rss-in-html VOID <link> quirk
    (the url text lands as the link's next sibling) and Atom
    rel=alternate selection; DuckDB recomputes every entry."""
    from webxtract.ops.web import feed_inventory

    return feed_inventory(sf_dir)


def _docs_readability(sf_dir: str):
    """ORACLED Flesch reading-ease in integer milli-units: three RE2
    counts per batch (words/sentence-runs/vowel-groups) + integer
    division — the oracle runs the same RE2 patterns via
    regexp_extract_all."""
    from webxtract.ops.text import docs_readability

    return docs_readability(sf_dir)


def _html_alternates(sf_dir: str):
    """ORACLED hreflang alternates + meta-refresh redirects: rel
    matched case-insensitively, BCP-47 tags lowercased, refresh
    content parsed 'N; url=...' with optional quotes/case, first
    refresh wins; DuckDB recomputes every row closed-form."""
    from webxtract.ops.web import html_alternates

    return html_alternates(sf_dir)


def _html_jsonld(sf_dir: str):
    """ORACLED JSON-LD structured-data extraction: raw script-block
    scan (the DOM parser skips script content by design) + stdlib
    JSON parse, arrays and @graph unwrapped, malformed blocks yield
    zero rows; DuckDB recomputes the surviving items closed-form."""
    from webxtract.ops.web import html_jsonld

    return html_jsonld(sf_dir)


def _html_forms(sf_dir: str):
    """ORACLED HTML form key-value extraction (Textract-FORMS twin):
    label-for resolution, enclosing-label keys, placeholder/name
    fallbacks, selected-option values, textarea text, submit/hidden
    suppression; DuckDB recomputes all five field rows per doc."""
    from webxtract.ops.web import html_forms

    return html_forms(sf_dir)


def _html_tables(sf_dir: str):
    """ORACLED HTML table extraction: real DOM walk + rowspan/colspan
    occupancy grid -> one row per cell (the HTML twin of the geometric
    TABLE_CELL grid; reference parity: Textract TABLES consumed by
    postprocessing/fn-postprocess/main.py); DuckDB recomputes every
    cell closed-form including the colspan col-shift."""
    from webxtract.ops.web import html_tables

    return html_tables(sf_dir)


def _sitemap_url_inventory(sf_dir: str):
    """ORACLED sitemap source: per-host urlset XML rendered inside one
    host-keyed co-location, then parsed back by the tag-soup DOM
    parser (namespace attrs + comments ignored); DuckDB recomputes
    every (sitemap_url, loc, lastmod) row closed-form."""
    from webxtract.ops.web import sitemap_url_inventory

    return sitemap_url_inventory(sf_dir)


def _domain_anchor_texts(sf_dir: str):
    """ORACLED inbound anchor-text profile: (dst_host, anchor_text,
    count) over the synthetic crawl via per-batch partial counts and
    one bounded grouped exchange; DuckDB recomputes the counts
    closed-form from doc_id."""
    from webxtract.ops.web import domain_anchor_texts

    return domain_anchor_texts(sf_dir)


def _robots_gate(sf_dir: str):
    """ORACLED robots.txt politeness gate: per-host robots fixtures
    (comments, CRLF, case-insensitive fields, foreign-agent groups,
    empty Disallow, Allow-overrides) broadcast once and applied with
    RFC 9309 longest-match precedence, vectorized per (host, rule);
    DuckDB recomputes the expected decision table closed-form."""
    from webxtract.ops.web import robots_gate

    return robots_gate(sf_dir)


def _urls_canonicalize(sf_dir: str):
    """ORACLED URL canonicalization over the closed-form messy fixture:
    lowercase scheme/host, fragment strip, default-port removal,
    dot-segment resolution, tracking-param drop + bytewise param sort —
    all polars expressions per batch; the DuckDB twin rebuilds the same
    urls from doc_id and applies the SAME spec in SQL."""
    from webxtract.ops.web import urls_canonicalize

    return urls_canonicalize(sf_dir)


def _images_page_prep(sf_dir: str):
    """Page pre-processing metadata over the deterministic skewed-page
    corpus: decode -> grayscale -> exact-integer Otsu binarize ->
    projection-profile skew estimate -> shear deskew (rows-only:
    otsu_thr / ink_ppm depend on PCG64-seeded word gaps; the exact
    planted-angle recovery and pixel-exact deskew round-trip are
    pytest-gated, and the SQL-expressible projection is the ORACLED
    images_page_skew)."""
    from webxtract.ops.pageprep import images_page_prep

    return images_page_prep(sf_dir)


def _images_page_skew(sf_dir: str):
    """ORACLED end-to-end proof of the pixel pre-processing path: the
    DuckDB twin recomputes (width, height, skew_mdeg) in closed form
    from doc_id, so a hash match certifies encode -> decode -> Otsu ->
    projection-profile estimation recovered the planted skew angle
    EXACTLY for every document."""
    from webxtract.ops.pageprep import images_page_skew

    return images_page_skew(sf_dir)


def _audios_envelope_dupes(sf_dir: str):
    """Near-dup audio clips over a deterministic synthetic WAV corpus:
    envelope_hash64 -> banded LSH -> hamming verify, machinery shared
    verbatim with images_phash_dupes (rows-only; planted pairs asserted
    in tests/test_ops.py)."""
    from webxtract.ops.audiocodec import audios_envelope_dupes

    return audios_envelope_dupes(sf_dir)


def _videos_frame_sample(sf_dir: str):
    """Real MJPEG frame sampling (oracled): deterministic concatenated-
    JPEG videos -> marker-walk container split -> SOF0 header dims, one
    row per every-2nd frame. The DuckDB twin computes the planted frame
    counts/dims in closed form from doc_id, so parity proves the
    byte-level plumbing."""
    from webxtract.ops.media import videos_frame_sample

    return videos_frame_sample(sf_dir)


def _videos_mjpeg_dupes(sf_dir: str):
    """Near-dup videos by frame-level perceptual matching: sampled
    frames -> dhash64 -> banded LSH + hamming (frame keys) -> per-pair
    distinct-matched-frame fold vs sampled counts (rows-only; planted
    pairs asserted in tests/test_ops.py)."""
    from webxtract.ops.media import videos_mjpeg_dupes

    return videos_mjpeg_dupes(sf_dir)


def _videos_mp4_probe(sf_dir: str):
    """ISO BMFF (MP4) demux WITHOUT ffmpeg (oracled): real mux ->
    box-tree walk -> stsd/esds codec id -> stsc x stco x stsz x stts
    sample-table join, per-track probe fields all closed-form from
    doc_id across layout variants (v0/v1 boxes, stco/co64, chunk
    patterns, multi-entry stts, jpeg/mp4v+esds/avc1 entries)."""
    from webxtract.ops.mp4 import videos_mp4_probe

    return videos_mp4_probe(sf_dir)


def _videos_mp4_frame_sample(sf_dir: str):
    """Motion-JPEG-in-MP4 frame sampling (oracled): real demux ->
    ranged sample extraction -> T.81 SOF dims, one row per every-2nd
    frame; same planted closed form as the raw-MJPEG twin, so parity
    proves the container walk end to end."""
    from webxtract.ops.mp4 import videos_mp4_frame_sample

    return videos_mp4_frame_sample(sf_dir)


def _videos_mp4_dupes(sf_dir: str):
    """Near-dup MP4 videos by frame-level perceptual matching over the
    demuxed+decoded frames (rows-only; planted pairs asserted in
    tests/test_mp4.py)."""
    from webxtract.ops.mp4 import videos_mp4_dupes

    return videos_mp4_dupes(sf_dir)


def _videos_mkv_probe(sf_dir: str):
    """Matroska/WebM (EBML) demux WITHOUT ffmpeg (oracled): real mux
    -> vint element walk -> track/codec id -> cluster + SimpleBlock
    recovery across all four lacing modes, both doctypes and the
    unknown-size streaming Segment form; every probed field
    closed-form from doc_id."""
    from webxtract.ops.mkv import videos_mkv_probe

    return videos_mkv_probe(sf_dir)


def _videos_mkv_frame_sample(sf_dir: str):
    """Motion-JPEG-in-Matroska frame sampling (oracled): real EBML
    demux -> laced-frame recovery -> T.81 SOF dims, one row per
    every-2nd frame; same planted closed form as the MJPEG/MP4
    twins."""
    from webxtract.ops.mkv import videos_mkv_frame_sample

    return videos_mkv_frame_sample(sf_dir)


def _videos_mkv_dupes(sf_dir: str):
    """Near-dup Matroska videos by frame-level perceptual matching
    (rows-only; planted pairs asserted in tests/test_mkv.py)."""
    from webxtract.ops.mkv import videos_mkv_dupes

    return videos_mkv_dupes(sf_dir)


def _videos_avi_probe(sf_dir: str):
    """AVI (RIFF) demux WITHOUT ffmpeg (oracled): real mux -> chunk
    walk -> avih/strh/strf headers -> movi frame recovery with idx1
    cross-check across both offset conventions (movi-relative per
    spec, absolute per many real muxers) and idx1-absent files; every
    probed field closed-form from doc_id."""
    from webxtract.ops.avi import videos_avi_probe

    return videos_avi_probe(sf_dir)


def _videos_avi_frame_sample(sf_dir: str):
    """MJPG-in-AVI frame sampling (oracled): real RIFF demux -> T.81
    SOF dims, one row per every-2nd frame; same planted closed form
    as the MJPEG/MP4/Matroska twins."""
    from webxtract.ops.avi import videos_avi_frame_sample

    return videos_avi_frame_sample(sf_dir)


def _videos_avi_dupes(sf_dir: str):
    """Near-dup AVI videos by frame-level perceptual matching
    (rows-only; planted pairs asserted in tests/test_avi.py)."""
    from webxtract.ops.avi import videos_avi_dupes

    return videos_avi_dupes(sf_dir)


def _videos_ts_probe(sf_dir: str):
    """MPEG-TS (HLS segment) demux WITHOUT ffmpeg (oracled): 188-byte
    packet-grid walk with resync, CRC-verified PAT/PMT, per-PID PES
    reassembly across both length forms (bounded + the length-0
    unbounded video form), PTS timing, continuity/PES error counting
    as data; every probed field closed-form from doc_id."""
    from webxtract.ops.mpegts import videos_ts_probe

    return videos_ts_probe(sf_dir)


def _emb_quantize_int8(sf_dir: str):
    """Scalar int8 quantization of the embedding column (4x ANN memory
    compression): exact per-dim min/max fold + one broadcast, floor
    formula so cross-engine parity needs no tie-mode reasoning."""
    from webxtract.ops.knn import emb_quantize_int8

    return emb_quantize_int8(sf_dir)


def _parts_fuzzy_match(sf_dir: str):
    """Fuzzy record linkage (SymSpell deletion-neighborhood join + a
    vectorized O(L) lev<=1 verifier, never a DP table): deterministic
    one-edit dirty names matched back to unique canonicals by argmin
    (distance, id). The oracle replays it as all-pairs levenshtein +
    a window argmin — exact, including the distance-0 cross-matches a
    deleted key digit can create."""
    from webxtract.ops.fuzzy import parts_fuzzy_match

    return parts_fuzzy_match(sf_dir)


def _parts_kcore(sf_dir: str):
    """k-core (k=65) of the co-order part graph by synchronized
    peeling: per round one |nodes|-bounded degree fold + broadcast
    survivor filter over the pinned packed edges; fixed 6-round budget
    unrolled identically by the DuckDB oracle (the k-core fixpoint is
    unique, so early-stop == full unroll)."""
    from webxtract.ops.graph import kcore

    return kcore(sf_dir)


def _parts_triangles(sf_dir: str):
    """Exact triangle count of the co-order part graph (parts linked
    when they share an order): bitset-adjacency popcount below the
    node/edge gates, degree-oriented wedge-generation + one
    copartitioned wedge-vs-edge match above (the 100 TB shape);
    bitset == join equivalence pytest-gated."""
    from webxtract.ops.graph import triangle_count

    return triangle_count(sf_dir)


def _purchase_pagerank(sf_dir: str):
    """Fixed-point integer PageRank over the undirected customer-supplier
    purchase graph (5 iterations, damping 0.85): exact, partitioning-
    independent, and oracled by a DuckDB query that unrolls the same
    integer recurrence."""
    from webxtract.ops.graph import purchase_pagerank

    return purchase_pagerank(sf_dir)


def _docs_new_content(sf_dir: str):
    """Incremental-ingest dedup: incoming half of the corpus anti-joined
    on content md5 against the prior half via Bloom prefilter + exact
    copartitioned verify (oracled: NOT EXISTS on md5)."""
    from webxtract.ops.dedup import docs_new_content

    return docs_new_content(sf_dir)


def _pages_domain_stats(sf_dir: str):
    """Per-domain crawl stats over the synthesized pages corpus
    (rows-only: pages are not an oracle view; DuckDB parity gate lives
    in tests/test_ops.py)."""
    from webxtract.ops.web import pages_domain_stats

    return pages_domain_stats(sf_dir)


def _docs_unigram_logprob(sf_dir: str):
    """CCNet-style corpus-LM quality score: per-doc mean unigram
    log-probability (oracled: unnest + join + avg(ln))."""
    from webxtract.ops.text import docs_unigram_logprob

    return docs_unigram_logprob(sf_dir)


def _pages_training_corpus(sf_dir: str):
    """Composite training-corpus export: extract -> quality/length
    filter -> exact content dedup (min-url canonical) -> token/char
    stats (rows-only; determinism + dedup semantics tested in
    tests/test_training.py)."""
    from webxtract.testdata import pages_dataset, pages_path, rows_for_sf_dir
    from webxtract.training import training_corpus

    n = rows_for_sf_dir(sf_dir)
    return training_corpus(pages_dataset(sf_rows=n),
                           source_path=pages_path(n))


def _emb_covariance(sf_dir: str):
    from webxtract.ops.knn import emb_covariance

    return emb_covariance(sf_dir)


def _emb_pca_power(sf_dir: str):
    from webxtract.ops.knn import emb_pca_power

    return emb_pca_power(sf_dir)


def _docs_term_pmi(sf_dir: str):
    from webxtract.ops.text import docs_term_pmi

    return docs_term_pmi(sf_dir)


def _parts_bfs_hops(sf_dir: str):
    from webxtract.ops.graph import parts_bfs_hops

    return parts_bfs_hops(sf_dir)


def _docs_cosine_simjoin(sf_dir: str):
    from webxtract.ops.dedup import docs_cosine_simjoin

    return docs_cosine_simjoin(sf_dir)


def _docs_cosine_simjoin_tf(sf_dir: str):
    from webxtract.ops.dedup import docs_cosine_simjoin_tf

    return docs_cosine_simjoin_tf(sf_dir)


def _docs_golden_record(sf_dir: str):
    from webxtract.ops.dedup import docs_golden_record

    return docs_golden_record(sf_dir)


def _docs_vocab_growth(sf_dir: str):
    from webxtract.ops.text import docs_vocab_growth

    return docs_vocab_growth(sf_dir)


def _docs_source_vocab_overlap(sf_dir: str):
    from webxtract.ops.text import docs_source_vocab_overlap

    return docs_source_vocab_overlap(sf_dir)


def _gifs_frame_sample(sf_dir: str):
    from webxtract.ops.media import gifs_frame_sample

    return gifs_frame_sample(sf_dir)


def _gifs_anim_dupes(sf_dir: str):
    from webxtract.ops.media import gifs_anim_dupes

    return gifs_anim_dupes(sf_dir)


def _emb_kcenter(sf_dir: str):
    from webxtract.ops.knn import emb_kcenter

    return emb_kcenter(sf_dir)


def _purchase_pagerank_weighted(sf_dir: str):
    from webxtract.ops.graph import purchase_pagerank_weighted

    return purchase_pagerank_weighted(sf_dir)


def _emb_rank_normalize(sf_dir: str):
    from webxtract.ops.knn import emb_rank_normalize

    return emb_rank_normalize(sf_dir)


def _parts_copurchase_lift(sf_dir: str):
    from webxtract.ops.graph import parts_copurchase_lift

    return parts_copurchase_lift(sf_dir)


def _purchase_hits(sf_dir: str):
    from webxtract.ops.graph import purchase_hits

    return purchase_hits(sf_dir)


def _parts_neighbor_jaccard(sf_dir: str):
    from webxtract.ops.graph import parts_neighbor_jaccard

    return parts_neighbor_jaccard(sf_dir)


def _docs_rrf_fusion(sf_dir: str):
    from webxtract.ops.text import docs_rrf_fusion

    return docs_rrf_fusion(sf_dir)


def _parts_adamic_adar(sf_dir: str):
    from webxtract.ops.graph import parts_adamic_adar

    return parts_adamic_adar(sf_dir)


def _docs_lang_confusion(sf_dir: str):
    from webxtract.ops.text import docs_lang_confusion

    return docs_lang_confusion(sf_dir)


def _parts_clustering_coeff(sf_dir: str):
    from webxtract.ops.graph import parts_clustering_coeff

    return parts_clustering_coeff(sf_dir)


def _docs_ngram_novelty(sf_dir: str):
    from webxtract.ops.text import docs_ngram_novelty

    return docs_ngram_novelty(sf_dir)


def _emb_mmr_rerank(sf_dir: str):
    from webxtract.ops.knn import emb_mmr_rerank

    return emb_mmr_rerank(sf_dir)


def _docs_source_entropy(sf_dir: str):
    from webxtract.ops.text import docs_source_entropy

    return docs_source_entropy(sf_dir)


def _emb_drift_monitor(sf_dir: str):
    from webxtract.ops.knn import emb_drift_monitor

    return emb_drift_monitor(sf_dir)


def _docs_dup_ratio_by_source(sf_dir: str):
    from webxtract.ops.text import docs_dup_ratio_by_source

    return docs_dup_ratio_by_source(sf_dir)


def _docs_token_entropy(sf_dir: str):
    from webxtract.ops.text import docs_token_entropy

    return docs_token_entropy(sf_dir)


def _emb_random_projection(sf_dir: str):
    from webxtract.ops.knn import emb_random_projection

    return emb_random_projection(sf_dir)


def queries() -> dict[str, Callable[[str], Any]]:
    """Registry order is deliberate: the driver's CORRECTNESS gate
    verifies the FIRST 50 entries, so each round rotates
    not-yet-driver-checked oracled queries to the front (the literal
    dict keeps its historical order; _rotate_window applies the
    round's window). Round 5 drains the never-driver-checked backlog
    (_R5_WINDOW below): the round-4 additions the driver never
    sampled, the new docs_langid_ngram, and the oldest unchecked
    relational/events/docs/emb names (r1-r4 union of driver-green =
    160 distinct; this window adds 50 first-time names)."""
    from webxtract.ops import relational as R

    return _rotate_window({
        # --- round-3 driver window: oracled, driver-unchecked as of r2 ---
        # TPC-H query shapes
        "q2_best_supplier": R.q2_best_supplier,
        "q7_nation_volume": R.q7_nation_volume,
        "q8_market_share": R.q8_market_share,
        "q9_product_profit": _q9_product_profit,
        "q10_returned_revenue": R.q10_returned_revenue,
        "q11_important_parts": _q11_important_parts,
        "q14_promo_share": R.q14_promo_share,
        "q15_top_supplier": R.q15_top_supplier,
        "q16_supplier_variety": _q16_supplier_variety,
        "q17_small_quantity_revenue": R.q17_small_quantity_revenue,
        "q18_large_orders": R.q18_large_orders,
        "q19_disjunctive_revenue": R.q19_disjunctive_revenue,
        "q20_excess_shipments": _q20_excess_shipments,
        "q21_sole_blame": R.q21_sole_blame,
        "q22_idle_customers": R.q22_idle_customers,
        # iterative algorithms (unrolled-CTE oracles)
        "purchase_pagerank": _purchase_pagerank,
        "emb_kmeans": _emb_kmeans,
        "emb_semdedup": _emb_semdedup,
        # span dedup suite (ExactSubstr)
        "docs_dup_spans": _docs_dup_spans,
        "docs_dup_span_frac": _docs_dup_span_frac,
        "docs_remove_dup_spans": _docs_remove_dup_spans,
        "docs_clean_corpus": _docs_clean_corpus,
        # dedup / clustering (oracled members)
        "docs_jaccard_clusters": _docs_jaccard_clusters,
        "docs_jaccard_canonical": _docs_jaccard_canonical,
        "docs_exact_dedup": _docs_exact_dedup,
        "videos_frame_sample": _videos_frame_sample,
        "videos_mp4_probe": _videos_mp4_probe,
        "videos_mp4_frame_sample": _videos_mp4_frame_sample,
        "videos_mkv_probe": _videos_mkv_probe,
        "videos_mkv_frame_sample": _videos_mkv_frame_sample,
        "videos_avi_probe": _videos_avi_probe,
        "videos_avi_frame_sample": _videos_avi_frame_sample,
        "videos_ts_probe": _videos_ts_probe,
        "emb_dup_pairs": _emb_dup_pairs,
        # watermark late-data
        "events_late_arrivals": _events_late_arrivals,
        # relational/window shapes
        "purchases_after_errors": R.purchases_after_errors,
        "users_top_event_type": R.users_top_event_type,
        "nation_top_supplier": R.nation_top_supplier,
        "nation_balance_fulljoin": R.nation_balance_fulljoin,
        "supplier_balance_zscore": R.supplier_balance_zscore,
        "orders_monthly_growth": R.orders_monthly_growth,
        "user_conversion_funnel": R.user_conversion_funnel,
        "user_retention": R.user_retention,
        # text analysis (oracled members)
        "docs_tfidf_top_term": _docs_tfidf_top_term,
        "docs_unigram_logprob": _docs_unigram_logprob,
        "docs_bigram_logprob": _docs_bigram_logprob,
        "docs_repetition": _docs_repetition,
        "docs_chunk_overlap": _docs_chunk_overlap,  # RAG chunking
        "docs_pii_redact": _docs_pii_redact,
        "docs_c4_clean": _docs_c4_clean,          # C4 rules (oracled)
        "docs_ccnet_buckets": _docs_ccnet_buckets,  # head/middle/tail
        "docs_nb_quality": _docs_nb_quality,        # NB classifier
        "docs_inverted_index": _docs_inverted_index,
        "parts_triangles": _parts_triangles,        # graph triangles
        "parts_kcore": _parts_kcore,                # k-core peeling
        "parts_fuzzy_match": _parts_fuzzy_match,    # edit-dist linkage
        "emb_quantize_int8": _emb_quantize_int8,    # int8 ANN compress
        "docs_split": _docs_split,
        "docs_compression_ratio": _docs_compression_ratio,  # rows-only
        "customer_spend_trend": _customer_spend_trend,  # grouped OLS
        "emb_hard_negatives": _emb_hard_negatives,  # contrastive mining
        "docs_validate": _docs_validate,            # GE-style DQ gate
        "parts_copurchase_topk": _parts_copurchase_topk,  # itemsets
        "docs_new_content": _docs_new_content,
        "docs_weighted_sample": _docs_weighted_sample,
        "docs_source_mix": _docs_source_mix,
        # embeddings
        "emb_norms": _emb_norms,
        "emb_label_centroids": _emb_label_centroids,
        "emb_knn_bruteforce": _emb_knn,
        "docs_langid": _docs_langid,
        # newly oracled this round (were rows-only)
        "docs_line_dedup": _docs_line_dedup,
        "docs_pack_sequences": _docs_pack_sequences,
        "docs_dsir_topk": _docs_dsir_topk,
        "docs_normalize_text": _docs_normalize_text,
        "docs_gopher_quality": _docs_gopher_quality,
        "docs_temperature_mix": _docs_temperature_mix,
        "docs_bm25_topk": _docs_bm25_topk,
        # --- oracled, not yet driver-checked: next rotation window ---
        "docs_stopword_removal": _docs_stopword_removal,
        "docs_regex_tokens": _docs_regex_tokens,
        "docs_token_counts": _docs_token_counts,
        "docs_quality_scores": _docs_quality,
        "docs_fingerprints": _docs_fingerprints,  # md5 (oracle: DuckDB md5())
        # --- rows-only (sketches/approximate; pytest accuracy gates) ---
        "docs_terms_mg": _docs_terms_mg,          # Misra-Gries sketch
        "docs_terms_cms": _docs_terms_cms,        # Count-Min estimate
        "images_phash_dupes": _images_phash_dupes,
        "audios_envelope_dupes": _audios_envelope_dupes,
        "docs_ngram_jaccard": _docs_ngram_jaccard,
        "videos_mjpeg_dupes": _videos_mjpeg_dupes,
        "videos_mp4_dupes": _videos_mp4_dupes,
        "videos_mkv_dupes": _videos_mkv_dupes,
        "videos_avi_dupes": _videos_avi_dupes,
        "pages_domain_stats": _pages_domain_stats,
        "events_users_hll": _events_users_hll,
        "events_type_users_hll": _events_type_users_hll,
        "events_value_p50_sketch": _events_value_p50_sketch,  # KLL
        "docs_fingerprint64": _docs_fingerprint64,  # rolling hash
        "docs_bpe_vocab": _docs_bpe_vocab,          # BPE train
        "docs_bpe_token_counts": _docs_bpe_token_counts,  # BPE apply
        "docs_bpe_pack": _docs_bpe_pack,  # tokenize -> pack composite
        "docs_minhash_pairs": _docs_minhash_pairs,
        "docs_simhash_pairs": _docs_simhash_pairs,
        "docs_dedup_clusters": _docs_dedup_clusters,
        "pages_c4_clean": _pages_c4_clean,      # C4 stats, real pages
        "pages_line_dedup": _pages_line_dedup,  # CCNet line dedup over
        # extracted pages (input not SQL-visible; docs_line_dedup is the
        # hash-checked twin of the same operator)
        "docs_minhash_pairs_joinverify": _docs_minhash_pairs_joinverify,
        "docs_dedup_clusters_dist": _docs_dedup_clusters_dist,
        "emb_knn_ivf": _emb_knn_ivf,
        "emb_knn_lsh": _emb_knn_lsh,
        "emb_knn_ivf_kmeans": _emb_knn_ivf_kmeans,
        "emb_knn_pq": _emb_knn_pq,
        "emb_knn_hnsw": _emb_knn_hnsw,  # rows-only graph ANN (r5)
        # --- driver-green in CORRECTNESS_r02.json (rotated to the back) ---
        "pages_extract": _pages_extract,
        "pages_final": _pages_final,
        "pages_review_tasks": _pages_review_tasks,
        "pages_training_corpus": _pages_training_corpus,
        "q1_pricing_summary": R.q1_pricing_summary,
        "q3_segment_revenue": R.q3_segment_revenue,
        "q5_region_nation_volume": R.q5_region_nation_volume,
        "top_customers": R.top_customers,
        "orders_priority_counts": R.orders_priority_counts,
        "events_latest_per_user": R.events_latest_per_user,
        "events_hourly_windows": R.events_hourly_windows,
        "docs_lang_stats": R.docs_lang_stats,
        "parts_brand_stats": R.parts_brand_stats,
        "parts_price_bands": R.parts_price_bands,
        "events_running_total": R.events_running_total,
        "events_value_median": R.events_value_median,
        "docs_term_counts": R.docs_term_counts,
        "docs_bigram_counts": R.docs_bigram_counts,
        "customers_without_urgent_orders": R.customers_without_urgent_orders,
        "customers_with_urgent_orders": R.customers_with_urgent_orders,
        "docs_sample": R.docs_sample,
        "docs_shuffled": R.docs_shuffled,  # seeded epoch shuffle; oracled
        # (the driver compare sorts rows, so the identity oracle checks
        # exactly the shuffle's contract: a permutation — content
        # preserved, nothing dropped or duplicated)
        "supplier_nation_hashjoin": R.supplier_nation_hashjoin,
        "acctbal_union_topk": R.acctbal_union_topk,
        "events_sessions": R.events_sessions,
        "purchases_with_prior_error": R.purchases_with_prior_error,
        "events_distinct_users": _events_distinct_users,
        "events_distinct_users_salted": _events_distinct_users_salted,
        "events_rank_in_user": R.events_rank_in_user,
        "events_value_p90": R.events_value_p90,
        "lang_top_terms": R.lang_top_terms,
        "events_time_since_prev": R.events_time_since_prev,
        "events_moving_avg": R.events_moving_avg,
        "q6_revenue_filter": R.q6_revenue_filter,
        "q4_priority_exists": R.q4_priority_exists,
        "q12_priority_by_flag": R.q12_priority_by_flag,
        "q13_orders_per_customer": R.q13_orders_per_customer,
        "orders_top_per_priority": R.orders_top_per_priority,
        "orders_rollup": R.orders_rollup,
        "events_hourly_gapfill": R.events_hourly_gapfill,
        "events_funnel_users": R.events_funnel_users,
        "nation_status_pivot": R.nation_status_pivot,
        "events_props_k_stats": R.events_props_k_stats,
        "events_type_user_distinct": R.events_type_user_distinct,
        "events_type_share": R.events_type_share,
        "customer_order_histogram": R.customer_order_histogram,
        "customer_ntile": R.customer_ntile,
        "region_nation_list": R.region_nation_list,
        "lineitem_corr_disc_tax": R.lineitem_corr_disc_tax,
        "docs_contaminated": _docs_contaminated,
        "docs_stratified_sample": _docs_stratified_sample,
        "events_active_users_7d": R.events_active_users_7d,  # sliding
        # 7-day DISTINCT window via per-user interval union + delta scan
        "events_concurrency_15m": R.events_concurrency_15m,  # time-RANGE
        # sliding count over the dense minute axis (prefix difference)
        "docs_cdc_merge": R.docs_cdc_merge,  # lakehouse MERGE INTO:
        # latest-seq-wins upsert/delete changelog applied to a snapshot
        "emb_covariance": _emb_covariance,  # exact d x d covariance via
        # one d^2-bounded integer scatter exchange; doubles bit-pinned
        "emb_pca_power": _emb_pca_power,  # top principal direction,
        # bit-exact integer power iteration on the centered scatter
        "docs_term_pmi": _docs_term_pmi,  # collocation mining: top-k
        # adjacent pairs by integer micro-nat PMI (vocab-gated modes)
        "docs_scd2": R.docs_scd2,  # SCD Type-2 dimension build:
        # [valid_from, valid_to) version intervals, LEAD-shift fold
        "docs_time_travel": R.docs_time_travel,  # AS OF snapshot:
        # replay changelog events <= max(doc_id)//2 over the base
        "lineitem_skyline": R.lineitem_skyline,  # Pareto frontier
        # (min price, max discount); per-block frontier + one tiny fold
        "parts_bfs_hops": _parts_bfs_hops,  # multi-source BFS min-hop
        # distance; frontier broadcast over pinned edge blocks
        "docs_cosine_simjoin": _docs_cosine_simjoin,  # EXACT cosine
        # >= 0.95 threshold join via AllPairs df-ordered prefix filter
        "events_winsorized": R.events_winsorized,  # grouped p10/p90
        # winsorization: one type-keyed order-stat pass + map-side clamp
        "events_temporal_join": R.events_temporal_join,  # AS-OF
        # validity-interval dimension join vs SCD2 (one copartitioned
        # exchange + packed searchsorted; no interval expansion)
        "events_audience_overlap": R.events_audience_overlap,  # exact
        # distinct-user intersection per type pair; |users|-bounded fold
        "docs_golden_record": _docs_golden_record,  # MDM survivorship
        # merge per near-dup cluster (count/max/mode/longest-text md5)
        "docs_vocab_growth": _docs_vocab_growth,  # Heaps-law curve:
        # new distinct terms per doc-id bucket (first-occurrence min)
        "emb_kcenter": _emb_kcenter,  # greedy farthest-point coreset
        # on exact int8-code distances; k broadcast-centers scans
        "events_dedup_window": R.events_dedup_window,  # repeat
        # suppression: drop if same (user,type) within past 60 min
        "purchase_pagerank_weighted": _purchase_pagerank_weighted,
        # edge-weighted PageRank (distinct-order multiplicity), exact
        "events_value_ewma": R.events_value_ewma,  # per-user integer
        # fixed-point EWMA: sequential within user, parallel across
        "emb_rank_normalize": _emb_rank_normalize,  # per-dimension
        # ordinal rank transform (quantile-normalization prep)
        "events_user_growth": R.events_user_growth,  # cumulative
        # distinct-user curve via (user, min_hour) first-occurrence fold
        "docs_cosine_simjoin_tf": _docs_cosine_simjoin_tf,  # exact
        # tf-WEIGHTED cosine join (L2AP symmetric t-prefix filter)
        "lineitem_zorder": R.lineitem_zorder,  # Morton clustering key
        # (lakehouse layout optimization); pure per-row bit arithmetic
        "docs_source_vocab_overlap": _docs_source_vocab_overlap,
        # per-source-pair distinct-term intersections via term bitmasks
        "gifs_frame_sample": _gifs_frame_sample,  # animated-GIF LZW
        # decode + composite, closed-form oracled frame inventory
        "gifs_anim_dupes": _gifs_anim_dupes,  # frame-level perceptual
        # near-dup over animated GIFs (shared banded machinery)
        "events_type_transitions": R.events_type_transitions,  # Markov
        # next-event matrix: LAG shape, |types|^2-bounded partials
        "lineitem_file_stats": R.lineitem_file_stats,  # zone-map /
        # data-skipping statistics build: per-file min/max/count fold
        "parts_copurchase_lift": _parts_copurchase_lift,  # association
        # rules: top-k pairs by integer micro-lift over distinct-order
        # supports (catalog-bounded item-support broadcast)
        "docs_token_entropy": _docs_token_entropy,  # lexical-diversity
        # quality signal: per-doc integer micro-nat Shannon entropy,
        # zero exchanges (order-independent rounded partial sums)
        "events_mad_outliers": R.events_mad_outliers,  # robust grouped
        # outliers: median + MAD order statistics in ONE co-location
        "emb_random_projection": _emb_random_projection,  # JL reduce:
        # pinned +-1 sign mix over int8 codes, integer matmul, no state
        "purchase_hits": _purchase_hits,  # HITS hubs/authorities:
        # integer max-normalized recurrence over pinned edge blocks
        "parts_neighbor_jaccard": _parts_neighbor_jaccard,  # link
        # prediction: neighborhood Jaccard over non-adjacent part
        # pairs (map-side CSR bincount, zero pair exchanges)
        "orders_cube": R.orders_cube,  # GROUP BY CUBE: all four
        # grouping sets emitted per batch, one grouped-Sum exchange
        "events_attribution_last_touch": R.events_attribution_last_touch,
        # last-touch attribution: masked cummax over the per-user
        # sorted stream in one co-location (no window fan-out)
        "docs_rrf_fusion": _docs_rrf_fusion,  # hybrid retrieval:
        # reciprocal-rank fusion of the BM25 and quality rankings
        "customer_rfm": R.customer_rfm,  # RFM segmentation: custkey-
        # bounded metric fold + three NTILE(5) total-order rankings
        "parts_adamic_adar": _parts_adamic_adar,  # degree-weighted
        # link prediction (1/ln deg), same zero-exchange CSR plan
        "docs_lang_confusion": _docs_lang_confusion,  # langid-vs-label
        # confusion matrix; |langs|^2-bounded partials, no exchange
        "docs_snapshot_diff": R.docs_snapshot_diff,  # CDC family:
        # insert/update/delete diff of two snapshots, one copartitioned
        # key exchange + searchsorted match
        "customer_abc": R.customer_abc,  # Pareto/ABC revenue classes:
        # exact-cents cumulative share via per-block prefix offsets
        "parts_degree_hist": R.parts_degree_hist,  # co-purchase degree
        # distribution; |parts|-bounded fold, max-degree-bounded hist
        "customers_both_urgent_failed": R.customers_both_urgent_failed,
        # set-op INTERSECT as a single-scan conjunction fold
        "events_time_to_convert": R.events_time_to_convert,  # funnel
        # latency: first signup -> first strictly-later purchase
        "orders_dow_profile": R.orders_dow_profile,  # ISO-weekday
        # seasonality; 7-row bounded integer partials, no exchange
        "events_value_log_hist": R.events_value_log_hist,  # long-tail
        # probe: exact log2 buckets via frexp/binary-length, 64-row fold
        "parts_clustering_coeff": _parts_clustering_coeff,  # per-node
        # transitivity: CSR bincount row summed over own neighbors
        "events_value_cusum": R.events_value_cusum,  # drift detection:
        # CUSUM via the exact prefix closed form, fully vectorized
        "docs_ngram_novelty": _docs_ngram_novelty,  # streaming-
        # diversity signal: fraction of a doc's distinct 3-grams first
        # seen in it; (gram, min_doc) fold + one doc-keyed co-location
        "events_value_median_dist": R.events_value_median_dist,
        # DISTRIBUTED exact selection: grouped median by histogram
        # bisection — the group's values never co-locate (the true
        # scale path for the order-statistic ops' documented
        # per-group-fits-a-partition assumption)
        "events_error_band_join": R.events_error_band_join,  # time-
        # BAND join (every match counts, not just the AS-OF latest):
        # per-purchase +-5min error count, two searchsorteds each
        "orders_cohort_ltv": R.orders_cohort_ltv,  # cohort LTV matrix
        # (first-order month x age); months^2-bounded partials
        "events_funnel_strict": R.events_funnel_strict,  # funnel with
        # EXCLUSION (MATCH_RECOGNIZE shape): signup -> purchase with
        # no error strictly between, binary searches per user
        "emb_mmr_rerank": _emb_mmr_rerank,  # MMR diversity re-rank:
        # greedy 2*rel - maxsim over integer code dots (unrolled CTE)
        "nation_region_revenue_share": R.nation_region_revenue_share,
        # share-of-parent rollup: nation ppm of its region's revenue
        "events_attribution_linear": R.events_attribution_linear,
        # LINEAR multi-touch attribution: equal ppm credit across the
        # window's touches; |types|-bounded partials, band-join shape
        "docs_source_entropy": _docs_source_entropy,  # corpus-mix
        # health: source-distribution entropy in integer micro-nats
        "emb_drift_monitor": _emb_drift_monitor,  # embedding drift:
        # per-dim old-vs-new centroid cross-difference, all int64
        "docs_dup_ratio_by_source": _docs_dup_ratio_by_source,  # dedup
        # dashboard: per-source distinct-hash ratio, hashes-only shuffle
        "images_page_prep": _images_page_prep,  # page pre-processing:
        # Otsu binarize + projection-profile deskew (north-star leg)
        "images_page_skew": _images_page_skew,  # ORACLED closed-form
        # twin: exact planted-skew recovery certified by hash match
        "domain_link_edges": _domain_link_edges,  # ORACLED crawl link
        # graph: real DOM anchor walk vs closed-form planted edges
        "domain_pagerank": _domain_pagerank,  # ORACLED domain PageRank
        # composite over the link graph (unrolled integer CTE twin)
        "urls_canonicalize": _urls_canonicalize,  # ORACLED crawl-url
        # normalization: ports/dots/tracking-params/sort, all-polars
        "warc_page_stats": _warc_page_stats,  # ORACLED WARC container
        # source: real Content-Length framing over gzip members
        "robots_gate": _robots_gate,  # ORACLED robots.txt politeness
        # gate: RFC 9309 longest-match, |hosts|-bounded broadcast
        "sitemap_url_inventory": _sitemap_url_inventory,  # ORACLED
        # sitemap source: co-located render -> soup parse round-trip
        "domain_anchor_texts": _domain_anchor_texts,  # ORACLED inbound
        # anchor-text counts: partial counts + one grouped exchange
        "html_tables": _html_tables,  # ORACLED HTML table cells:
        # rowspan/colspan occupancy grid, Textract-TABLES twin
        "html_meta": _html_meta,  # ORACLED head metadata: title/
        # description/canonical/noindex/og:title, first-wins walk
        "html_forms": _html_forms,  # ORACLED form KV extraction:
        # label-for/enclosing-label keys, Textract-FORMS twin
        "html_jsonld": _html_jsonld,  # ORACLED schema.org JSON-LD
        # items: raw script scan + JSON parse, malformed -> no rows
        "html_alternates": _html_alternates,  # ORACLED hreflang
        # clusters + meta-refresh redirects (multilingual signal)
        "docs_readability": _docs_readability,  # ORACLED integer
        # Flesch score: three RE2 counts, zero exchanges
        "feed_inventory": _feed_inventory,  # ORACLED RSS/Atom feed
        # source: void-link quirk + rel=alternate selection
        "crawl_frontier": _crawl_frontier,  # ORACLED capstone:
        # robots AND NOT noindex, PageRank-prioritized admission
        "docs_dehyphenate": _docs_dehyphenate,  # ORACLED line-break
        # hyphenation repair: one RE2 global replace, zero exchanges
        "robots_crawl_delay": _robots_crawl_delay,  # ORACLED host
        # politeness budgets: group-scoped Crawl-delay in integer ms
        "html_tables_markdown": _html_tables_markdown,  # ORACLED
        # table linearization for LLM corpora (ordered string_agg twin)
        "docs_topic_clusters": _docs_topic_clusters,  # ORACLED
        # integer k-means over md5-hashed text features (unrolled CTE)
        "html_markdown": _html_markdown,  # ORACLED full-page
        # markdown linearization (closed-form concat twin)
        "warc_cdx": _warc_cdx,  # ORACLED CDX capture index: byte-
        # exact record extents via strlen-grammar + window-sum twin
        "warc_cdx_sharded": _warc_cdx_sharded,  # ORACLED same twin
        # via sorted runs + range-partitioned k-way merge (100 TB path)
        "warc_wet": _warc_wet,  # ORACLED WET sidecar (conversion recs)
        "warc_wat": _warc_wat,  # ORACLED WAT sidecar (metadata JSON)
        "docs_fix_mojibake": _docs_fix_mojibake,  # ORACLED cp1252
        # double-encoding repair (sloppy inverse, strict-UTF-8 guard)
        "crawl_schedule": _crawl_schedule_plan,  # ORACLED politeness
        # scheduler: frontier x Crawl-delay -> per-host fetch slots
        "robots_sitemaps": _robots_sitemaps,  # ORACLED sitemap
        # discovery from the robots global field
        "redirect_resolution": _redirect_resolution,  # ORACLED
        # redirect-chain terminal urls + hop counts, cycle-safe
        "hosts_registrable": _hosts_registrable,  # ORACLED PSL
        "hosts_blocklist": _hosts_blocklist,      # ORACLED UT1 gate
        "html_microdata": _html_microdata,        # ORACLED microdata
        "parts_communities": _parts_communities,  # ORACLED LPA
        "docs_bm25_retrieve": _docs_bm25_retrieve,  # ORACLED read path
        "docs_lexicon_hits": _docs_lexicon_hits,  # ORACLED badwords
        "docs_langid_ngram": _docs_langid_ngram,  # ORACLED trained NB langid
        # eTLD+1 (wildcard/exception rules re-run in SQL)
        "urls_templates": _urls_templates,  # ORACLED trap mining
        # url -> path template populations (hex/digit generalization)
        "hosts_shard_assign": _hosts_shard_assign,  # ORACLED
        # jump consistent hashing (recursive-CTE HUGEINT oracle)
        "hosts_link_farms": _hosts_link_farms,  # ORACLED composite
        # DOM link walk x PSL collapse x integer fan-out rule
        "hosts_mirror_pairs": _hosts_mirror_pairs,  # ORACLED
        # mirror detection (content-hash pairs, star-capped)
        "warc_http_fields": _warc_http_fields,  # ORACLED
        # HTTP header semantics (CT/charset/X-Robots-Tag/Last-Modified)
        "urls_recrawl_schedule": _urls_recrawl_schedule,  # ORACLED
        # revisit policy from capture history (clamped integer rate)
        "docs_cdc_chunks": _docs_cdc_chunks,  # rows-only
        # gear-hash CDC chunk table (scalar==vector equivalence gate)
        "domain_quality_prior": _domain_quality_prior,  # ORACLED
        # PSL x quality composite (integer ratio-of-sums per domain)
        "pages_indexability": _pages_indexability,  # ORACLED
        # header x meta noindex union + status/CT gates
        "pages_decode_text": _pages_decode_text,  # ORACLED
        # charset-aware decode (strict + pinned U+FFFD fallback)
        "warc_random_access": _warc_random_access,  # ORACLED
        # CDX ranged fetch (gz member extents, seek+read only)
        "warc_incremental_stats": _warc_incremental_stats,  # ORACLED
        # revisit-record snapshot dedup accounting
        "domain_crawl_quota": _domain_crawl_quota,  # ORACLED
        # Hamilton apportionment (sum(quota) == budget exactly)
        "docs_translation_pairs": _docs_translation_pairs,  # ORACLED
        # hreflang translation-pair mining (bitext prep)
        "warc_cluster_idx": _warc_cluster_idx,  # ORACLED
        # two-level CDX block leaders (shared CDX CTE + ROW_NUMBER)
        "domain_reciprocity": _domain_reciprocity,  # ORACLED
        # mutual-link ppm per host (link-exchange signal)
        "hosts_soft404": _hosts_soft404,  # ORACLED
        # within-host template-page (soft-404) detection
        "crawl_coverage": _crawl_coverage,  # ORACLED
        # sitemap-vs-crawl symmetric-difference audit
        "urls_percent_normalize": _urls_percent_normalize,  # ORACLED
        # RFC 3986 unreserved-escape decoding (generated oracle)
        "hosts_backoff": _hosts_backoff,  # ORACLED
        # exponential 429/503 backoff plan (integer shift)
        "shard_write_plan": _shard_write_plan,  # ORACLED
        # per-shard (n_docs, sum_chars) manifest (shared jump CTE)
        "hreflang_return_tags": _hreflang_return_tags,  # ORACLED
        # return-tag audit (one-sided hreflang edges flagged)
        "pages_anchor_rels": _pages_anchor_rels,  # ORACLED
        # rel=nofollow/ugc/sponsored token accounting per page
        "pdfs_probe": _pdfs_probe,  # ORACLED
        # real-PDF xref/filter/ObjStm/update structural probe
        "pdfs_text_extract": _pdfs_text_extract,  # ORACLED
        # real-PDF content-stream text, XY-cut reading order
        "pdfs_kv_fields": _pdfs_kv_fields,  # ORACLED
        # geometric KV pairing over real PDFs (Textract FORMS)
        "images_exif_probe": _images_exif_probe,  # ORACLED
        # EXIF/TIFF IFD walk: orientation/time/GPS metadata channel
        "docs_ccnet_corpus": _docs_ccnet_corpus,  # ORACLED
        # CCNet composite: line dedup -> retrained langid -> LM buckets
        "images_tiff_decode": _images_tiff_decode,  # ORACLED
        # TIFF strip decode (none/PackBits/LZW), pixel-sum certified
        "docs_docx_extract": _docs_docx_extract,  # ORACLED
        # DOCX: PKZIP walk + WordprocessingML paragraph scanner
        "docs_odt_extract": _docs_odt_extract,  # ORACLED
        # ODT: stored-mimetype rule + text:p/span scanner
        "docs_rtf_extract": _docs_rtf_extract,  # ORACLED
        # RTF: control-word tokenizer + destination skipping
        "docs_xlsx_extract": _docs_xlsx_extract,  # ORACLED
        # XLSX: shared-strings indirection + A1 grid decode
        "docs_pptx_extract": _docs_pptx_extract,  # ORACLED
        # PPTX: slide-part ordering + DrawingML a:t scan
        "docs_epub_extract": _docs_epub_extract,  # ORACLED
        # EPUB: OCF -> OPF -> SPINE-order resolution (rotated storage)
        "pages_office_extract": _pages_office_extract,  # ORACLED
        # the dispatch integration: mixed formats -> real pipeline
        "docs_email_extract": _docs_email_extract,  # ORACLED
        # email/MIME: RFC 2047 subjects, multipart, QP/base64
        "docs_csv_extract": _docs_csv_extract,  # ORACLED
        # CSV: sniffed dialects + the quote-aware RFC 4180 machine
        "docs_tar_extract": _docs_tar_extract,  # ORACLED
        # tar/ustar: checksum-verified walk, prefix split, gzip arm
        "docs_ics_extract": _docs_ics_extract,  # ORACLED
        # iCalendar: unfold splice + text unescape + VEVENT grouping
        "docs_sqlite_extract": _docs_sqlite_extract,  # ORACLED
        # SQLite file format: b-tree walk, records, rowid alias
    })


# Round-4 driver window (the driver CORRECTNESS gate samples the FIRST
# 50 queries() entries in dict order): the 48 never-driver-checked
# web-native oracled queries — the graft's core axis — plus the two
# round-3 red rows (oracle types now fixed; they must re-run to go
# green in CORRECTNESS_r04). Everything else keeps its round-3
# relative order behind them; rotate again in round 5 with the ~80
# still-unchecked names.
# Round-5 driver window (the driver CORRECTNESS gate samples the FIRST
# 50 queries() entries in dict order): VERDICT r4 ask #1 — drain the
# never-driver-checked backlog, front-loading the round-4 additions the
# driver has never sampled (videos_* container probes, hosts_blocklist,
# docs_lexicon_hits, docs_bm25_retrieve, html_microdata,
# parts_communities), the new round-5 docs_langid_ngram (ask #2), and
# the oldest unchecked relational/events/docs/emb names. Still never
# checked after this window: ~44 oracled names (docs_token_entropy ..
# docs_topic_clusters block and friends) — every name here was
# pytest-oracle green (type-sensitive) at sf0.001 and hash-parity
# checked at sf0.01 locally before fronting.
_R5_WINDOW = [
    "docs_langid_ngram",
    "videos_mp4_probe", "videos_mp4_frame_sample", "videos_mkv_probe",
    "videos_mkv_frame_sample", "videos_avi_probe",
    "videos_avi_frame_sample", "videos_ts_probe",
    "hosts_blocklist", "docs_lexicon_hits", "docs_bm25_retrieve",
    "html_microdata", "parts_communities", "docs_lang_confusion",
    "docs_split", "customer_spend_trend", "emb_hard_negatives",
    "docs_validate", "parts_copurchase_topk", "docs_new_content",
    "docs_weighted_sample", "docs_source_mix", "emb_norms",
    "emb_label_centroids", "docs_line_dedup", "docs_pack_sequences",
    "docs_dsir_topk", "docs_normalize_text", "docs_gopher_quality",
    "docs_temperature_mix", "docs_bm25_topk", "docs_stopword_removal",
    "docs_regex_tokens", "events_distinct_users_salted",
    "events_active_users_7d", "events_concurrency_15m",
    "docs_cdc_merge", "emb_covariance", "emb_pca_power",
    "docs_term_pmi", "docs_scd2", "docs_time_travel",
    "lineitem_skyline", "parts_bfs_hops", "docs_cosine_simjoin",
    "events_winsorized",
    # round-5 in-round additions (real-PDF + EXIF surface), fronted the
    # same way the r4 container probes were: pytest-oracle green AND
    # sf0.001/sf0.01 hash-parity checked locally before fronting. The
    # four displaced names (events_temporal_join,
    # events_audience_overlap, docs_golden_record, docs_vocab_growth)
    # keep first position behind the window for the next rotation.
    "pdfs_probe", "pdfs_text_extract", "pdfs_kv_fields",
    "images_exif_probe",
]


def _rotate_window(d: dict) -> dict:
    front = {k: d[k] for k in _R5_WINDOW}
    assert len(front) == 50
    return {**front, **{k: v for k, v in d.items() if k not in front}}


# ---------------------------------------------------------------------------
# oracle SQL (DuckDB; tables pre-registered as views by the driver)
# ---------------------------------------------------------------------------

def _langid_oracle() -> str:
    """DuckDB twin of ops.text.LangId, generated from the SAME stopword
    profiles: distinct lowered tokens joined against the inlined
    profile table, argmax hits with lexicographic tie-break, score =
    hits / total tokens (round half-away matches round_ha)."""
    from webxtract.ops.text import STOPWORDS

    sw = ", ".join(f"('{lang}', '{w}')"
                   for lang in sorted(STOPWORDS)
                   for w in sorted(STOPWORDS[lang]))
    return f"""
        WITH sw(lang, w) AS (VALUES {sw}),
        toks AS (SELECT doc_id, string_split(lower(text), ' ') AS ts
                 FROM documents),
        n AS (SELECT doc_id, greatest(len(ts), 1) AS n FROM toks),
        dt AS (SELECT DISTINCT doc_id, unnest(ts) AS w FROM toks),
        hits AS (SELECT dt.doc_id, sw.lang, count(*) AS h
                 FROM dt JOIN sw USING (w) GROUP BY 1, 2),
        best AS (SELECT doc_id, lang, h,
                        row_number() OVER (PARTITION BY doc_id
                                           ORDER BY h DESC, lang) AS r
                 FROM hits),
        pick AS (SELECT b.doc_id, b.lang,
                        round(b.h * 1.0 / n.n, 6) AS score
                 FROM best b JOIN n USING (doc_id)
                 WHERE b.r = 1 AND b.h > 0)
        SELECT d.doc_id,
               COALESCE(p.lang, 'und') AS lang_pred,
               COALESCE(p.score, 0.0) AS lang_score
        FROM documents d LEFT JOIN pick p USING (doc_id)
    """


def _wpagerank_oracle(iters: int = 5, k: int = 25) -> str:
    """DuckDB twin of ops.graph.purchase_pagerank_weighted: the
    unweighted PageRank unroll with every contribution scaled by the
    edge's distinct-order multiplicity — identical integer expression
    ((r // wd) * w), so hash-exact."""
    head = """
        WITH e0 AS (
            SELECT o_custkey AS a, l_suppkey + 1000000 AS b,
                   count(DISTINCT l_orderkey) AS w
            FROM lineitem JOIN orders ON l_orderkey = o_orderkey
            GROUP BY 1, 2),
        und AS (SELECT a AS src, b AS dst, w FROM e0
                UNION ALL SELECT b, a, w FROM e0),
        wdeg AS (SELECT src AS node, CAST(sum(w) AS BIGINT) AS wd
                 FROM und GROUP BY src),
        nn AS (SELECT count(*) AS n FROM wdeg),
        r0 AS (SELECT node, 1000000000000 // (SELECT n FROM nn) AS r
               FROM wdeg)"""
    rounds = []
    for i in range(1, iters + 1):
        rounds.append(f"""
        c{i} AS (
            SELECT u.dst AS node, sum((r{i - 1}.r // wdeg.wd) * u.w) AS c
            FROM und u JOIN r{i - 1} ON u.src = r{i - 1}.node
            JOIN wdeg ON u.src = wdeg.node
            GROUP BY u.dst),
        r{i} AS (
            SELECT wdeg.node,
                   (150000000000 // (SELECT n FROM nn))
                   + (85 * coalesce(c{i}.c, 0)) // 100 AS r
            FROM wdeg LEFT JOIN c{i} ON wdeg.node = c{i}.node)""")
    return (head + "," + ",".join(rounds)
            + f"""
        SELECT node, CAST(r AS BIGINT) AS rank_e12 FROM r{iters}
        ORDER BY rank_e12 DESC, node LIMIT {k}""")


_LINK_EDGE_CTE = """
        d AS (SELECT doc_id, doc_id % 50 AS h, doc_id % 3 AS kk
              FROM documents),
        o1 AS (SELECT h AS s, (doc_id * 7 + 13 * j + 1) % 50 AS t
               FROM (SELECT *, unnest(range(0, kk + 1)) AS j FROM d)),
        o2 AS (SELECT h AS s, (doc_id * 3 + 2) % 50 AS t
               FROM d WHERE doc_id % 5 = 0),
        e0 AS (SELECT DISTINCT s, t
               FROM (SELECT s, t FROM o1
                     UNION ALL SELECT s, t FROM o2) u
               WHERE s <> t)"""


# Shared jump-hash CTE body (fixture hosts + md5 key + the recursive
# Lamping-Veach loop): hosts_shard_assign and shard_write_plan
# compose the SAME SQL so the two oracles cannot drift
_JUMP_CTE = """
            hosts AS (
              SELECT doc_id,
                CASE doc_id % 8
                  WHEN 0 THEN 'www.alpha' || doc_id || '.COM.'
                  WHEN 1 THEN 'a.b.beta' || doc_id || '.co.uk'
                  WHEN 2 THEN 'gamma' || doc_id || '.github.io'
                  WHEN 3 THEN 'x.delta' || doc_id || '.ck'
                  WHEN 4 THEN 'www.ck'
                  WHEN 5 THEN 'Co.UK.'
                  WHEN 6 THEN '192.168.' || (doc_id % 256) || '.'
                              || ((doc_id * 7) % 256)
                  ELSE 'epsilon' || doc_id || '.unknowntld'
                END AS host
              FROM documents),
            seed AS (
              SELECT doc_id, host,
                ('0x' || substr(md5(host), 1, 16))
                  ::UBIGINT::HUGEINT AS key
              FROM hosts),
            it AS (
              SELECT doc_id, key, CAST(-1 AS BIGINT) AS b,
                     CAST(0 AS BIGINT) AS j
              FROM seed
              UNION ALL
              SELECT doc_id,
                (key * 2862933555777941757::HUGEINT + 1)
                  % 18446744073709551616::HUGEINT AS key2,
                j AS b,
                CAST(((j + 1) * 2147483648::HUGEINT) //
                  ((((key * 2862933555777941757::HUGEINT + 1)
                     % 18446744073709551616::HUGEINT)
                    // 8589934592) + 1) AS BIGINT) AS j2
              FROM it WHERE j < 64)"""


# Shared CDX CTE body (the plain-fixture capture index rebuilt from
# the serialization grammar — per-line strlens, Content-Length digit
# widths, per-file window-sum offsets — ending in the `cdx`
# projection): warc_cdx and warc_cluster_idx compose the SAME SQL
_CDX_CTE = """
            d AS (
              SELECT doc_id AS i,
                     '<html><body><p>' || text
                         || '</p></body></html>' AS html,
                     'https://site' || (doc_id % 50) || '.example/p/'
                         || doc_id AS url,
                     '2024-01-' || lpad(CAST(1 + doc_id % 28
                         AS VARCHAR), 2, '0') || 'T00:00:00Z' AS ts,
                     doc_id % 8 AS fi
              FROM documents),
            p AS (
              SELECT *,
                   strlen('HTTP/1.1 200 OK') + 2
                 + strlen('Content-Type: text/html; charset=utf-8')
                 + 2
                 + strlen('Content-Length: ')
                 + strlen(CAST(strlen(html) AS VARCHAR)) + 4
                 + strlen(html) AS plen
              FROM d),
            r AS (
              SELECT *,
                   strlen('WARC/1.0') + 2
                 + strlen('WARC-Type: response') + 2
                 + strlen('WARC-Target-URI: ') + strlen(url) + 2
                 + strlen('WARC-Date: ') + strlen(ts) + 2
                 + strlen('WARC-Record-ID: <urn:webxtract:')
                 + strlen(url) + 1 + 2
                 + strlen('Content-Type: '
                          || 'application/http; msgtype=response') + 2
                 + strlen('Content-Length: ')
                 + strlen(CAST(plen AS VARCHAR))
                 + 4 + plen + 4 AS rlength
              FROM p),
            o AS (
              SELECT *,
                   (strlen('WARC/1.0') + 2
                  + strlen('WARC-Type: warcinfo') + 2
                  + strlen('WARC-Record-ID: <urn:webxtract:warcinfo>')
                  + 2
                  + strlen('Content-Type: application/warc-fields')
                  + 2
                  + strlen('Content-Length: 27') + 4 + 27 + 4)
                  + COALESCE(sum(rlength) OVER (PARTITION BY fi
                        ORDER BY i ROWS BETWEEN UNBOUNDED PRECEDING
                        AND 1 PRECEDING), 0) AS roffset
              FROM r),
            cdx AS (
              SELECT 'example,site' || (i % 50) || ')/p/' || i
                         AS surt,
                     '202401' || lpad(CAST(1 + i % 28 AS VARCHAR), 2,
                         '0') || '000000' AS cdx_ts,
                     url,
                     'crawl-0000' || fi || '.warc' AS file,
                     CAST(roffset AS BIGINT) AS roffset,
                     CAST(rlength AS BIGINT) AS rlength,
                     CAST(200 AS BIGINT) AS http_status,
                     md5(html) AS digest
              FROM o)"""


# Shared HTTP-header CTE body (block strings REBUILT from doc_id +
# the regex re-run): warc_http_fields and pages_indexability compose
# the SAME SQL so the two oracles cannot drift
_HTTP_HDR_CTE = """
            d AS (SELECT doc_id AS i FROM documents),
            hdr AS (
              SELECT i,
                'https://site' || (i % 50) || '.example/p/' || i
                  AS url,
                'HTTP/1.1 ' ||
                CASE i % 5 WHEN 0 THEN 200 WHEN 1 THEN 301
                           WHEN 2 THEN 404 WHEN 3 THEN 200
                           ELSE 503 END || ' X' ||
                chr(13) || chr(10) ||
                CASE i % 4
                  WHEN 0 THEN 'Content-Type: text/html; charset=UTF-8'
                  WHEN 1 THEN 'content-type: Text/HTML;charset="ISO-8859-1"'
                  WHEN 2 THEN 'Content-Type: application/pdf'
                  ELSE 'Content-Type: text/plain' || chr(13) || chr(10)
                       || 'Content-Type: text/html; charset=utf-8'
                END ||
                CASE WHEN i % 3 = 0
                     THEN chr(13) || chr(10)
                          || 'X-ROBOTS-TAG: noarchive, NOINDEX'
                     WHEN i % 7 = 0
                     THEN chr(13) || chr(10) || 'X-Robots-Tag: all'
                     ELSE '' END ||
                CASE WHEN i % 2 = 0
                     THEN chr(13) || chr(10) || 'Last-Modified: ' ||
                          strftime(make_timestamp(
                            2024, 1, 1 + i % 28, i % 24,
                            (i * 7) % 60, 0),
                            '%a, %d %b %Y %H:%M:%S GMT')
                     ELSE '' END ||
                chr(13) || chr(10) || 'X-Junk;; malformed line'
                  AS h
              FROM d),
            p AS (
              SELECT i, url, h,
                regexp_extract(h,
                  '(?im)^content-type:[ \t]*([^\r\n]+)', 1) AS ct,
                regexp_extract(h,
                  '(?im)^last-modified:[ \t]*([^\r\n]+)', 1) AS lm
              FROM hdr)"""


# Shared PSL-matcher CTE body (fixture hosts + the full rule re-run
# through `sel`): hosts_registrable and domain_quality_prior compose
# the SAME SQL so the two oracles can never drift
_PSL_CTE = """
            hosts AS (
              SELECT doc_id,
                CASE doc_id % 8
                  WHEN 0 THEN 'www.alpha' || doc_id || '.COM.'
                  WHEN 1 THEN 'a.b.beta' || doc_id || '.co.uk'
                  WHEN 2 THEN 'gamma' || doc_id || '.github.io'
                  WHEN 3 THEN 'x.delta' || doc_id || '.ck'
                  WHEN 4 THEN 'www.ck'
                  WHEN 5 THEN 'Co.UK.'
                  WHEN 6 THEN '192.168.' || (doc_id % 256) || '.'
                              || ((doc_id * 7) % 256)
                  ELSE 'epsilon' || doc_id || '.unknowntld'
                END AS host
              FROM documents),
            n AS (
              SELECT doc_id, host,
                     regexp_replace(lower(host), '\\.$', '') AS h
              FROM hosts),
            n2 AS (
              SELECT *, string_split(h, '.') AS labs,
                     len(string_split(h, '.')) AS nl,
                     regexp_matches(h,
                       '^[0-9]+\\.[0-9]+\\.[0-9]+\\.[0-9]+$')
                       AND len(string_split(h, '.')) = 4 AS is_ip
              FROM n),
            rules(rule) AS (VALUES ('com'),('org'),('net'),
              ('example'),('io'),('uk'),('co.uk'),('ac.uk'),('au'),
              ('com.au'),('github.io'),('*.ck'),('!www.ck')),
            r AS (
              SELECT rule LIKE '!%' AS exc, rule LIKE '*.%' AS wild,
                     CASE WHEN rule LIKE '!%' THEN substr(rule, 2)
                          WHEN rule LIKE '*.%' THEN substr(rule, 3)
                          ELSE rule END AS base
              FROM rules),
            r2 AS (
              SELECT *, len(string_split(base, '.')) AS blabs
              FROM r),
            m AS (
              SELECT n2.doc_id,
                max(CASE WHEN r2.exc AND (n2.h = r2.base
                          OR n2.h LIKE '%.' || r2.base)
                         THEN r2.blabs - 1 END) AS exc_m,
                max(CASE WHEN NOT r2.exc AND NOT r2.wild
                          AND (n2.h = r2.base
                               OR n2.h LIKE '%.' || r2.base)
                         THEN r2.blabs
                         WHEN r2.wild AND n2.nl >= r2.blabs + 1
                          AND n2.h LIKE '%.' || r2.base
                         THEN r2.blabs + 1 END) AS plain_m
              FROM n2 CROSS JOIN r2 GROUP BY n2.doc_id),
            sel AS (
              SELECT n2.*, coalesce(m.exc_m,
                     greatest(coalesce(m.plain_m, 1), 1)) AS mm
              FROM n2 JOIN m USING (doc_id))"""


# robots_gate fixture closed forms — SHARED by robots_gate,
# crawl_frontier and crawl_schedule so the three oracles cannot
# drift. Derivation (see _robots_fixture_text + robots_gate render):
# host group h%4==0 disallows /private/ with an /private/ok/ allow
# override -> only path class 0 blocks; group 3 disallows /p/ and
# /other (classes 2, 3), the anchored wildcard /*.pdf$ (class 4 but
# NOT the .pdfx anchor probe, class 7), and /files/ except the
# LONGER /files/public* allow (class 6 blocks, class 5 survives).
_ROBOTS_ALLOWED_EXPR = """NOT (((doc_id % 50) % 4 = 0
                                AND doc_id % 8 = 0)
                     OR ((doc_id % 50) % 4 = 3
                         AND doc_id % 8 IN (2, 3, 4, 6)))"""
_ROBOTS_URL_EXPR = """'https://site' || (doc_id % 50) || '.example'
                || CASE doc_id % 8
                       WHEN 0 THEN '/private/x' || doc_id
                       WHEN 1 THEN '/private/ok/x' || doc_id
                       WHEN 2 THEN '/p/' || doc_id
                       WHEN 3 THEN '/other'
                       WHEN 4 THEN '/doc' || doc_id || '.pdf'
                       WHEN 5 THEN '/files/public/' || doc_id
                                   || '.pdf'
                       WHEN 6 THEN '/files/secret/' || doc_id
                       ELSE '/doc' || doc_id || '.pdfx' END"""

# registrable-domain assembly over `sel` — SHARED by hosts_registrable
# and hosts_blocklist so the two oracles cannot drift
_PSL_REG_EXPR = """CASE WHEN is_ip THEN h
                   WHEN nl <= mm THEN NULL
                   ELSE array_to_string(labs[nl - mm : nl], '.')
              END"""


def _lexicon_oracle() -> str:
    """GENERATED oracle for docs_lexicon_hits: the per-entry RE2
    patterns are built from the op's own POLICY_LEXICON in the same
    order — both engines run RE2, so word-boundary and non-overlap
    counting semantics match by construction."""
    import re as _re

    from webxtract.ops.text import LEXICON_FLAG_MIN, POLICY_LEXICON

    lens = []
    pres = []
    for t in POLICY_LEXICON:
        pat = r"(?i)\b" + _re.escape(t) + r"\b"
        lens.append(f"len(regexp_extract_all(text, '{pat}'))")
        pres.append(f"CASE WHEN len(regexp_extract_all(text, "
                    f"'{pat}')) > 0 THEN 1 ELSE 0 END")
    hits = " + ".join(lens)
    nterms = " + ".join(pres)
    return f"""
        SELECT doc_id,
               CAST({hits} AS BIGINT) AS hits,
               CAST({nterms} AS BIGINT) AS n_terms,
               ({hits}) >= {LEXICON_FLAG_MIN} AS flagged
        FROM documents ORDER BY doc_id
    """


def _pct_normalize_oracle() -> str:
    """GENERATED oracle for urls_percent_normalize: the nested
    regexp_replace chain is built from the SAME UNRESERVED character
    table the op uses — the two sides cannot drift."""
    from webxtract.ops.web import UNRESERVED

    expr = "url"
    for ch in UNRESERVED:
        b = ord(ch)
        expr = (f"regexp_replace({expr}, '(?:%{b:02X}|%{b:02x})', "
                f"'{ch}', 'g')")
    return f"""
        WITH urls AS (
          SELECT doc_id,
            CASE doc_id % 5
              WHEN 0 THEN 'https://a.example/%41bc/%7e' || doc_id
              WHEN 1 THEN 'https://a.example/p%2Fq%3D' || doc_id
              WHEN 2 THEN 'https://a.example/%ZZ' || doc_id || '%'
              WHEN 3 THEN 'https://a.example/%4a%6F%31' || doc_id
              ELSE 'https://a.example/plain/' || doc_id
            END AS url
          FROM documents)
        SELECT doc_id, url, {expr} AS url_norm
        FROM urls ORDER BY doc_id
    """


def _domain_pagerank_oracle(iters: int = 5, k: int = 25) -> str:
    """DuckDB twin of ops.web.domain_pagerank: the planted closed-form
    DIRECTED edge set (synth_link_corpus) + the identical unrolled
    integer PageRank recurrence (deg = out-degree; contributions into
    pure sinks drop via the deg LEFT JOIN, mirroring ops.graph.pagerank
    ranking only source nodes)."""
    head = ("WITH" + _LINK_EDGE_CTE + """,
        deg AS (SELECT s AS node, count(*) AS d FROM e0 GROUP BY s),
        nn AS (SELECT count(*) AS n FROM deg),
        r0 AS (SELECT node, 1000000000000 // (SELECT n FROM nn) AS r
               FROM deg)""")
    rounds = []
    for i in range(1, iters + 1):
        rounds.append(f"""
        c{i} AS (
            SELECT e0.t AS node, sum(r{i - 1}.r // deg.d) AS c
            FROM e0 JOIN r{i - 1} ON e0.s = r{i - 1}.node
            JOIN deg ON e0.s = deg.node
            GROUP BY e0.t),
        r{i} AS (
            SELECT deg.node,
                   (150000000000 // (SELECT n FROM nn))
                   + (85 * coalesce(c{i}.c, 0)) // 100 AS r
            FROM deg LEFT JOIN c{i} ON deg.node = c{i}.node)""")
    return (head + "," + ",".join(rounds)
            + f"""
        SELECT 'site' || node || '.example' AS host,
               CAST(r AS BIGINT) AS rank_e12
        FROM r{iters}
        ORDER BY rank_e12 DESC, host LIMIT {k}""")


def _topic_oracle(k: int = 4, iters: int = 3, dim: int = 16) -> str:
    """DuckDB twin of ops.text.docs_topic_clusters: integer Lloyd's
    over the md5_number_lower hashed token-count features, unrolled as
    a CTE chain. All-integer distances via the expansion
    S^2*A - 2*S*dot + B so sparse features/centroids need only their
    present dims; empty clusters vanish from cent{t} (= all-zero
    centroids); member counts come from asg{t} (NOT the feature join,
    which would drop token-less docs); ties break to the smallest
    cluster id."""
    S = 1 << 20
    parts = [f"""
        WITH toks AS (SELECT doc_id,
                   unnest(string_split(lower(text), ' ')) AS w
            FROM documents),
        feat AS (SELECT doc_id,
                        CAST(md5_number_lower(w) % {dim} AS BIGINT)
                            AS dim,
                        CAST(count(*) AS BIGINT) AS v
                 FROM toks WHERE w <> '' GROUP BY 1, 2),
        a2 AS (SELECT doc_id, sum(v * v) AS a FROM feat GROUP BY 1),
        uni AS (SELECT d.doc_id, r.cluster FROM documents d
                CROSS JOIN (SELECT unnest(range({k})) AS cluster) r),
        seeds AS (SELECT doc_id, row_number() OVER (
                      ORDER BY (doc_id * 2654435761) % 4294967296,
                               doc_id) - 1 AS cluster
                  FROM documents QUALIFY cluster < {k}),
        cent0 AS (SELECT s.cluster, f.dim,
                         f.v * {S} AS cval
                  FROM seeds s JOIN feat f USING (doc_id))"""]
    for t in range(iters + 1):
        parts.append(f"""
        b{t} AS (SELECT cluster, sum(cval * cval) AS b
                 FROM cent{t} GROUP BY 1),
        dot{t} AS (SELECT f.doc_id, c.cluster,
                          sum(f.v * c.cval) AS dot
                   FROM feat f JOIN cent{t} c USING (dim)
                   GROUP BY 1, 2),
        dist{t} AS (SELECT u.doc_id, u.cluster,
                           {S * S} * coalesce(a2.a, 0)
                           - 2 * {S} * coalesce(dot{t}.dot, 0)
                           + coalesce(b{t}.b, 0) AS dist
                    FROM uni u LEFT JOIN a2 USING (doc_id)
                    LEFT JOIN dot{t} ON dot{t}.doc_id = u.doc_id
                        AND dot{t}.cluster = u.cluster
                    LEFT JOIN b{t} ON b{t}.cluster = u.cluster),
        asg{t} AS (SELECT doc_id, cluster FROM dist{t}
                   QUALIFY row_number() OVER (PARTITION BY doc_id
                       ORDER BY dist, cluster) = 1)""")
        if t < iters:
            parts.append(f"""
        n{t} AS (SELECT cluster, count(*) AS n FROM asg{t}
                 GROUP BY 1),
        cent{t + 1} AS (SELECT a.cluster, f.dim,
                               ({S} * sum(f.v)) // n{t}.n AS cval
                        FROM asg{t} a
                        JOIN feat f ON f.doc_id = a.doc_id
                        JOIN n{t} ON n{t}.cluster = a.cluster
                        GROUP BY a.cluster, f.dim, n{t}.n)""")
    return (",".join(parts) + f"""
        SELECT doc_id, CAST(cluster AS BIGINT) AS cluster
        FROM asg{iters} ORDER BY doc_id""")


def _crawl_frontier_oracle(iters: int = 5) -> str:
    """DuckDB twin of ops.web.crawl_frontier: the robots closed-form
    decision AND NOT the meta-fixture noindex, prioritized by the
    identical unrolled integer PageRank over the planted link graph
    (every host has outlinks, so the LEFT JOIN coalesce never fires
    on this fixture)."""
    head = ("WITH" + _LINK_EDGE_CTE + """,
        deg AS (SELECT s AS node, count(*) AS d FROM e0 GROUP BY s),
        nn AS (SELECT count(*) AS n FROM deg),
        r0 AS (SELECT node, 1000000000000 // (SELECT n FROM nn) AS r
               FROM deg)""")
    rounds = []
    for i in range(1, iters + 1):
        rounds.append(f"""
        c{i} AS (
            SELECT e0.t AS node, sum(r{i - 1}.r // deg.d) AS c
            FROM e0 JOIN r{i - 1} ON e0.s = r{i - 1}.node
            JOIN deg ON e0.s = deg.node
            GROUP BY e0.t),
        r{i} AS (
            SELECT deg.node,
                   (150000000000 // (SELECT n FROM nn))
                   + (85 * coalesce(c{i}.c, 0)) // 100 AS r
            FROM deg LEFT JOIN c{i} ON deg.node = c{i}.node)""")
    return (head + "," + ",".join(rounds) + f""",
        f AS (SELECT doc_id,
                 {_ROBOTS_ALLOWED_EXPR} AS allowed,
                 doc_id % 7 = 3 AS noindex
              FROM documents)
        SELECT f.doc_id, (f.allowed AND NOT f.noindex) AS admitted,
               CAST(coalesce(r{iters}.r, 0) AS BIGINT)
                   AS priority_e12
        FROM f LEFT JOIN r{iters} ON r{iters}.node = f.doc_id % 50
        ORDER BY f.doc_id""")


def _hits_oracle(iters: int = 3, k: int = 25) -> str:
    """DuckDB twin of ops.graph.purchase_hits: the unrolled integer
    max-normalized HITS recurrence over the directed customer ->
    supplier edges — identical sums and (s * 1e6) // max(s) steps, so
    hash-exact."""
    head = """
        WITH e0 AS (
            SELECT DISTINCT o_custkey AS a, l_suppkey + 1000000 AS b
            FROM lineitem JOIN orders ON l_orderkey = o_orderkey),
        h0 AS (SELECT DISTINCT a AS node, 1000000 AS h FROM e0)"""
    rounds = []
    for i in range(1, iters + 1):
        rounds.append(f"""
        a{i}s AS (
            SELECT e0.b AS node, CAST(sum(h{i - 1}.h) AS BIGINT) AS s
            FROM e0 JOIN h{i - 1} ON e0.a = h{i - 1}.node
            GROUP BY e0.b),
        a{i} AS (SELECT node,
                        (s * 1000000) // (SELECT max(s) FROM a{i}s) AS a
                 FROM a{i}s),
        h{i}s AS (
            SELECT e0.a AS node, CAST(sum(a{i}.a) AS BIGINT) AS s
            FROM e0 JOIN a{i} ON e0.b = a{i}.node
            GROUP BY e0.a),
        h{i} AS (SELECT node,
                        (s * 1000000) // (SELECT max(s) FROM h{i}s) AS h
                 FROM h{i}s)""")
    return (head + "," + ",".join(rounds)
            + f"""
        SELECT * FROM (
            (SELECT 'authority' AS kind, node, a AS score_e6
             FROM a{iters} ORDER BY a DESC, node LIMIT {k})
            UNION ALL
            (SELECT 'hub' AS kind, node, h AS score_e6
             FROM h{iters} ORDER BY h DESC, node LIMIT {k}))""")


def _rrf_oracle(bm_sql: str, q_sql: str, k: int = 20, c: int = 60) -> str:
    """DuckDB twin of ops.text.docs_rrf_fusion, composed from the two
    registered ranking SQLs (BM25 top-k is already limited; the quality
    ranking is windowed to its top-k) — integer reciprocal ranks."""
    return f"""
        WITH bmr AS (
            SELECT doc_id,
                   row_number() OVER (ORDER BY bm25 DESC, doc_id) AS r
            FROM ({bm_sql})),
        qr0 AS (
            SELECT doc_id,
                   row_number() OVER (
                       ORDER BY quality_score DESC, doc_id) AS r
            FROM ({q_sql})),
        qr AS (SELECT doc_id, r FROM qr0 WHERE r <= {k}),
        u AS (SELECT doc_id, r FROM bmr
              UNION ALL SELECT doc_id, r FROM qr),
        f AS (SELECT doc_id,
                     CAST(sum(1000000 // ({c} + r)) AS BIGINT)
                         AS rrf_micro,
                     count(*) AS n_lists
              FROM u GROUP BY doc_id)
        SELECT doc_id, rrf_micro, n_lists FROM f
        ORDER BY rrf_micro DESC, doc_id LIMIT {k}"""


def _mmr_oracle(query_id: int = 0, n_cand: int = 25, k: int = 10) -> str:
    """DuckDB twin of ops.knn.emb_mmr_rerank: the identical int8
    quantization CTE, integer dot-product relevance, candidate-pair
    dot table, and k unrolled MATERIALIZED greedy argmax rounds
    (2*rel - max dot to the selected set, ties vec_id asc)."""
    head = f"""
        WITH x AS (
            SELECT vec_id, unnest(embedding) AS v,
                   generate_subscripts(embedding, 1) - 1 AS dim
            FROM embeddings),
        rng AS (SELECT dim, min(v) AS mn, max(v) AS mx
                FROM x GROUP BY dim),
        codes AS MATERIALIZED (
            SELECT x.vec_id, x.dim,
                   CASE WHEN rng.mx > rng.mn THEN
                       CAST(least(254.0,
                            floor((CAST(x.v AS DOUBLE)
                                   - CAST(rng.mn AS DOUBLE)) * 255.0
                                  / (CAST(rng.mx AS DOUBLE)
                                     - CAST(rng.mn AS DOUBLE))))
                            AS BIGINT) - 127
                   ELSE -127 END AS code
            FROM x JOIN rng USING (dim)),
        q AS (SELECT dim, code FROM codes WHERE vec_id = {query_id}),
        rel AS MATERIALIZED (
            SELECT v.vec_id, CAST(sum(v.code * q.code) AS BIGINT) AS rel
            FROM codes v JOIN q USING (dim)
            WHERE v.vec_id <> {query_id} GROUP BY v.vec_id),
        cand AS MATERIALIZED (
            SELECT vec_id, rel FROM rel
            ORDER BY rel DESC, vec_id LIMIT {n_cand}),
        cd AS MATERIALIZED (
            SELECT a.vec_id AS va, b.vec_id AS vb,
                   CAST(sum(ca.code * cb.code) AS BIGINT) AS dot
            FROM cand a JOIN cand b ON a.vec_id <> b.vec_id
            JOIN codes ca ON ca.vec_id = a.vec_id
            JOIN codes cb ON cb.vec_id = b.vec_id AND cb.dim = ca.dim
            GROUP BY 1, 2),
        s0 AS MATERIALIZED (
            SELECT vec_id, rel, 2 * rel AS score
            FROM cand ORDER BY score DESC, vec_id LIMIT 1)"""
    parts = [head]
    for r in range(1, k):
        sel = " UNION ALL ".join(f"SELECT vec_id FROM s{i}"
                                 for i in range(r))
        parts.append(f"""
        s{r} AS MATERIALIZED (
            SELECT c.vec_id, c.rel, 2 * c.rel - max(cd.dot) AS score
            FROM cand c JOIN cd ON cd.va = c.vec_id
                 AND cd.vb IN ({sel})
            WHERE c.vec_id NOT IN ({sel})
            GROUP BY c.vec_id, c.rel
            ORDER BY score DESC, c.vec_id LIMIT 1)""")
    finals = " UNION ALL ".join(
        f"SELECT CAST({r} AS BIGINT) AS rank, vec_id, rel, "
        f"CAST(score AS BIGINT) AS score FROM s{r}"
        for r in range(k))
    return ",".join(parts) + f"\n        {finals} ORDER BY rank"


def _kcenter_oracle(k: int = 8) -> str:
    """DuckDB twin of ops.knn.emb_kcenter: the identical int8
    quantization CTE + k-1 unrolled MATERIALIZED min-dist/argmax
    rounds (the kmeans/PageRank oracle pattern). Every distance is an
    exact integer sum of squared code deltas, so the (d2 DESC, vec_id)
    argmax is bit-deterministic; already-selected ids are excluded by
    NOT IN, mirroring the engine's isin mask."""
    codes = """
        WITH x AS (
            SELECT vec_id, unnest(embedding) AS v,
                   generate_subscripts(embedding, 1) - 1 AS dim
            FROM embeddings),
        rng AS (SELECT dim, min(v) AS mn, max(v) AS mx
                FROM x GROUP BY dim),
        codes AS MATERIALIZED (
            SELECT x.vec_id, x.dim,
                   CASE WHEN rng.mx > rng.mn THEN
                       CAST(least(254.0,
                            floor((CAST(x.v AS DOUBLE)
                                   - CAST(rng.mn AS DOUBLE)) * 255.0
                                  / (CAST(rng.mx AS DOUBLE)
                                     - CAST(rng.mn AS DOUBLE))))
                            AS BIGINT) - 127
                   ELSE -127 END AS code
            FROM x JOIN rng USING (dim)),
        c0 AS MATERIALIZED (
            SELECT min(vec_id) AS vec_id, CAST(0 AS BIGINT) AS d2
            FROM codes),
        m0 AS MATERIALIZED (
            SELECT v.vec_id,
                   sum((v.code - c.code) * (v.code - c.code)) AS d2
            FROM codes v
            JOIN codes c ON c.vec_id = (SELECT vec_id FROM c0)
                        AND c.dim = v.dim
            GROUP BY v.vec_id)"""
    parts = [codes]
    for r in range(1, k):
        sel = " UNION ALL ".join(
            f"SELECT vec_id FROM c{i}" for i in range(r))
        parts.append(f"""
        c{r} AS MATERIALIZED (
            SELECT vec_id, d2 FROM m{r - 1}
            WHERE vec_id NOT IN ({sel})
            ORDER BY d2 DESC, vec_id LIMIT 1)""")
        if r < k - 1:
            parts.append(f"""
        m{r} AS MATERIALIZED (
            SELECT m.vec_id, least(m.d2, d.d2) AS d2
            FROM m{r - 1} m JOIN (
                SELECT v.vec_id,
                       sum((v.code - c.code) * (v.code - c.code)) AS d2
                FROM codes v
                JOIN codes c ON c.vec_id = (SELECT vec_id FROM c{r})
                            AND c.dim = v.dim
                GROUP BY v.vec_id) d USING (vec_id))""")
    finals = " UNION ALL ".join(
        f"SELECT CAST({r} AS BIGINT) AS rank, vec_id, "
        f"CAST(d2 AS BIGINT) AS d2 FROM c{r}"
        for r in range(k))
    return ",".join(parts) + f"\n        {finals} ORDER BY rank"


def _pca_oracle(iters: int = 8) -> str:
    """DuckDB twin of ops.knn.emb_pca_power: the integer power
    iteration on C = n*S - s s^T unrolled as a materialized CTE chain
    (the kmeans/PageRank/kcore oracle pattern). Parity rests on three
    verified facts: round_even == numpy/python half-even, HUGEINT ->
    DOUBLE conversion is correctly rounded exactly like Python
    int -> float, and every intermediate integer is exact in HUGEINT
    (|C v| < 2^91 at sf0.1)."""
    scale = 1 << 20
    parts = [f"""x AS MATERIALIZED (
        SELECT vec_id,
               generate_subscripts(embedding, 1) - 1 AS dim,
               CAST(round_even(CAST(unnest(embedding) AS DOUBLE)
                               * {scale}.0, 0) AS BIGINT) AS q
        FROM embeddings),
    m AS MATERIALIZED (
        SELECT a.dim AS i, b.dim AS j, sum(a.q * b.q) AS sxy
        FROM x a JOIN x b USING (vec_id) GROUP BY 1, 2),
    sv AS MATERIALIZED (SELECT dim, sum(q) AS sq FROM x GROUP BY 1),
    nn AS (SELECT count(*) AS n FROM embeddings),
    c AS MATERIALIZED (
        SELECT m.i, m.j,
               CAST(nn.n AS HUGEINT) * m.sxy
               - CAST(sa.sq AS HUGEINT) * CAST(sb.sq AS HUGEINT) AS cv
        FROM m CROSS JOIN nn
        JOIN sv sa ON sa.dim = m.i
        JOIN sv sb ON sb.dim = m.j),
    it0 AS (SELECT dim, CAST({scale} AS BIGINT) AS v FROM sv)"""]
    for r in range(1, iters + 1):
        parts.append(f"""w{r} AS MATERIALIZED (
        SELECT c.i AS dim, sum(c.cv * t.v) AS w
        FROM c JOIN it{r - 1} t ON t.dim = c.j GROUP BY 1),
    it{r} AS MATERIALIZED (
        SELECT dim,
               CAST(round_even(CAST(w AS DOUBLE) * {scale}.0
                    / (SELECT max(abs(CAST(w AS DOUBLE))) FROM w{r}),
                    0) AS BIGINT) AS v
        FROM w{r})""")
    return ("WITH " + ",\n    ".join(parts)
            + f"\nSELECT dim, v AS loading FROM it{iters}")


def _kcore_oracle(k: int = 65, rounds: int = 6) -> str:
    """DuckDB twin of ops.graph.kcore: the synchronized peeling rounds
    UNROLLED as a CTE chain (the kmeans/PageRank-oracle pattern).
    Each round recomputes degrees over the surviving edge set and
    keeps nodes with deg >= k; the k-core is the unique fixpoint, so
    extra rounds past convergence are no-ops and the fixed unroll
    equals the Ray side's early-stopped loop."""
    parts = ["""e0 AS MATERIALIZED (
        SELECT DISTINCT a.l_partkey AS u, b.l_partkey AS v
        FROM lineitem a JOIN lineitem b
          ON a.l_orderkey = b.l_orderkey
         AND a.l_partkey < b.l_partkey)"""]
    for r in range(rounds):
        parts.append(f"""d{r} AS MATERIALIZED (
        SELECT s AS node, count(*) AS deg
        FROM (SELECT u AS s FROM e{r} UNION ALL SELECT v FROM e{r})
        GROUP BY s)""")
        parts.append(f"""n{r} AS MATERIALIZED (SELECT node FROM d{r} WHERE deg >= {k})""")
        parts.append(f"""e{r + 1} AS MATERIALIZED (
        SELECT u, v FROM e{r}
        WHERE u IN (SELECT node FROM n{r})
          AND v IN (SELECT node FROM n{r}))""")
    parts.append(f"""dF AS MATERIALIZED (
        SELECT s AS node, count(*) AS deg
        FROM (SELECT u AS s FROM e{rounds} UNION ALL
              SELECT v FROM e{rounds})
        GROUP BY s)""")
    return ("WITH " + ",\n".join(parts)
            + "\nSELECT node, deg FROM dF")


def _lpa_oracle(rounds: int = 3) -> str:
    """DuckDB twin of ops.graph.label_propagation_edges: the
    synchronous min-tie rounds UNROLLED as a CTE chain over the SAME
    co-order part edge set as the kcore oracle. Per round: directed
    neighbor-label pairs (both orientations), count per (node, label),
    pick with row_number ORDER BY count DESC, label ASC — the exact
    deterministic tie-break the engine's lexsort implements."""
    parts = ["""e0 AS MATERIALIZED (
        SELECT DISTINCT a.l_partkey AS u, b.l_partkey AS v
        FROM lineitem a JOIN lineitem b
          ON a.l_orderkey = b.l_orderkey
         AND a.l_partkey < b.l_partkey)""",
             """l0 AS MATERIALIZED (
        SELECT node, node AS lab
        FROM (SELECT u AS node FROM e0
              UNION SELECT v FROM e0))"""]
    for r in range(rounds):
        parts.append(f"""m{r} AS MATERIALIZED (
        SELECT e0.u AS node, l.lab FROM e0
        JOIN l{r} l ON l.node = e0.v
        UNION ALL
        SELECT e0.v AS node, l.lab FROM e0
        JOIN l{r} l ON l.node = e0.u)""")
        parts.append(f"""c{r} AS MATERIALIZED (
        SELECT node, lab, count(*) AS c FROM m{r}
        GROUP BY node, lab)""")
        parts.append(f"""l{r + 1} AS MATERIALIZED (
        SELECT node, lab FROM (
            SELECT node, lab, row_number() OVER (
                PARTITION BY node ORDER BY c DESC, lab) AS rn
            FROM c{r}) WHERE rn = 1)""")
    return ("WITH " + ",\n".join(parts)
            + f"\nSELECT node, lab AS label FROM l{rounds} "
            "ORDER BY node")


def _kmeans_oracle(k: int = 8, iters: int = 5) -> str:
    """DuckDB twin of ops.knn.kmeans, Lloyd's iterations UNROLLED as a
    CTE chain (the PageRank-oracle pattern for iterative algorithms).
    Bit-parity hinges on three replicated details: (1) the fixed-point
    element quantization uses round_even (numpy's half-to-even — and
    float32 inputs DO land exactly on .5 at the 2^20 scale, so the mode
    matters); (2) the centroid update divides in the engine's exact
    order (sum / SCALE) / count; (3) argmax ties break to the smallest
    cluster id (np.argmax first-occurrence). Seeds are the k smallest
    Knuth-hashed vec_ids, exactly _kmeans_seeds."""
    scale = float(1 << 20)
    parts = [f"""
        WITH dims AS (SELECT vec_id,
                   CAST(generate_subscripts(embedding, 1) AS BIGINT) AS dim,
                   CAST(unnest(embedding) AS DOUBLE) AS v
            FROM embeddings),
        nrm AS (SELECT vec_id, sqrt(sum(v * v)) AS nrm
                FROM dims GROUP BY 1),
        nv AS (SELECT d.vec_id, d.dim,
                      d.v / (CASE WHEN n.nrm = 0 THEN 1.0
                             ELSE n.nrm END) AS nv,
                      CAST(round_even(d.v * {scale}, 0) AS BIGINT) AS fx
               FROM dims d JOIN nrm n USING (vec_id)),
        seeds AS (SELECT vec_id,
                         row_number() OVER (
                             ORDER BY (vec_id * 2654435761) % 4294967296,
                                      vec_id) - 1 AS cluster
                  FROM embeddings QUALIFY cluster < {k}),
        cent0 AS (SELECT s.cluster, d.dim, d.v AS cval
                  FROM seeds s JOIN dims d USING (vec_id))"""]
    for t in range(iters):
        parts.append(f"""
        cnorm{t} AS (SELECT cluster,
                            CASE WHEN sqrt(sum(cval * cval)) = 0 THEN 1.0
                                 ELSE sqrt(sum(cval * cval)) END AS nrm
                     FROM cent{t} GROUP BY 1),
        cos{t} AS (SELECT nv.vec_id, c.cluster,
                          sum(nv.nv * (c.cval / cn.nrm)) AS cs
                   FROM nv JOIN cent{t} c USING (dim)
                   JOIN cnorm{t} cn ON cn.cluster = c.cluster
                   GROUP BY 1, 2),
        asg{t} AS (SELECT vec_id, cluster FROM cos{t}
                   QUALIFY row_number() OVER (
                       PARTITION BY vec_id
                       ORDER BY cs DESC, cluster) = 1),
        upd{t} AS (SELECT a.cluster, nv.dim,
                          (CAST(sum(nv.fx) AS DOUBLE) / {scale})
                              / count(DISTINCT nv.vec_id) AS cval
                   FROM asg{t} a JOIN nv ON nv.vec_id = a.vec_id
                   GROUP BY 1, 2),
        cent{t + 1} AS (SELECT c.cluster, c.dim,
                               COALESCE(u.cval, c.cval) AS cval
                        FROM cent{t} c
                        LEFT JOIN upd{t} u ON u.cluster = c.cluster
                                          AND u.dim = c.dim)""")
    parts.append(f"""
        cnormF AS (SELECT cluster,
                          CASE WHEN sqrt(sum(cval * cval)) = 0 THEN 1.0
                               ELSE sqrt(sum(cval * cval)) END AS nrm
                   FROM cent{iters} GROUP BY 1),
        cosF AS (SELECT nv.vec_id, c.cluster,
                        sum(nv.nv * (c.cval / cn.nrm)) AS cs
                 FROM nv JOIN cent{iters} c USING (dim)
                 JOIN cnormF cn ON cn.cluster = c.cluster
                 GROUP BY 1, 2)""")
    return ",".join(parts) + """
        SELECT vec_id, cluster, round_even(cs, 6) AS cosine
        FROM cosF
        QUALIFY row_number() OVER (PARTITION BY vec_id
                                   ORDER BY cs DESC, cluster) = 1"""


def _semdedup_oracle(k: int = 8, iters: int = 5,
                     threshold: float = 0.3) -> str:
    """DuckDB twin of ops.knn.semdedup: the kmeans CTE chain gives the
    final assignments (asgF — bit-parity per _kmeans_oracle), then a
    row survives iff NO lower-vec_id member of its cluster has
    round(cosine, 6) >= threshold. The NOT EXISTS ranges over ALL
    lower-id members (kept or removed) — the same rule the engine's
    triangular scan applies, so the kept sets are identical."""
    chain = _kmeans_oracle(k, iters)
    chain = chain[:chain.index("\n        SELECT vec_id, cluster,")]
    return chain + f""",
        asgF AS (SELECT vec_id, cluster FROM cosF
                 QUALIFY row_number() OVER (PARTITION BY vec_id
                                            ORDER BY cs DESC, cluster) = 1)
        SELECT a.vec_id, a.cluster
        FROM asgF a
        WHERE NOT EXISTS (
            SELECT 1 FROM asgF b
            JOIN embeddings ea ON ea.vec_id = a.vec_id
            JOIN embeddings eb ON eb.vec_id = b.vec_id
            WHERE b.cluster = a.cluster AND b.vec_id < a.vec_id
              AND round(list_cosine_similarity(
                      ea.embedding::DOUBLE[], eb.embedding::DOUBLE[]),
                  6) >= {threshold})"""


def oracle_sql() -> dict[str, str]:
    d = {
        "docs_langid": _langid_oracle(),
        "emb_kmeans": _kmeans_oracle(),
        "emb_semdedup": _semdedup_oracle(),
        # closed-form planted truth for the REAL MJPEG plumbing: the Ray
        # side encodes, marker-splits and header-parses actual JPEG
        # bytes; the oracle recomputes counts/dims from doc_id
        # (synth_video_corpus: nf = 4 + seed % 5, dup drops one frame)
        "videos_frame_sample": """
            WITH v AS (
                SELECT doc_id AS media_id,
                       CASE WHEN doc_id % 10 = 5 THEN 3 + (doc_id - 1) % 5
                            ELSE 4 + doc_id % 5 END AS n_frames
                FROM documents)
            SELECT media_id, unnest(range(0, n_frames, 2)) AS frame_idx,
                   n_frames, 72 AS width, 64 AS height
            FROM v""",
        # MP4 demux: every probed field is closed-form from doc_id
        # (synth_mp4_probe_corpus); the Ray side muxes REAL ISO BMFF
        # bytes and re-derives these by the box-tree + sample-table
        # walk, so a hash match certifies the demuxer across v0/v1,
        # stco/co64, chunk patterns, multi-entry stts and the three
        # codec signalling forms.
        "videos_mp4_probe": """
            WITH p AS (
                SELECT doc_id, 3 + doc_id % 6 AS ns,
                       512 + 256 * (doc_id % 3) AS delta
                FROM documents),
            s AS (
                SELECT doc_id, unnest(range(0, ns)) AS k FROM p),
            b AS (
                SELECT doc_id,
                       CAST(sum(200 + (13 * doc_id + 7 * k) % 100)
                            AS BIGINT) AS sample_bytes
                FROM s GROUP BY doc_id)
            SELECT p.doc_id AS media_id,
                   CASE p.doc_id % 3 WHEN 0 THEN 'avc1'
                        WHEN 1 THEN 'jpeg' ELSE 'mp4v.6c' END AS codec,
                   CAST(64 + 8 * (p.doc_id % 5) AS BIGINT) AS width,
                   CAST(48 + 8 * (p.doc_id % 4) AS BIGINT) AS height,
                   CAST(p.ns AS BIGINT) AS n_samples,
                   CAST((p.ns + 1) * p.delta * 1000 // 12800
                        AS BIGINT) AS duration_ms,
                   b.sample_bytes,
                   p.doc_id % 3 <> 0 AS decodable
            FROM p JOIN b USING (doc_id)""",
        # MPEG-TS demux: closed form mirrors synth_ts_probe_corpus; a
        # hash match certifies the packet walk, PSI CRC parse, both
        # PES length forms and PTS reassembly
        "videos_ts_probe": """
            WITH p AS (
                SELECT doc_id, 3 + doc_id % 6 AS nf FROM documents),
            s AS (
                SELECT doc_id, unnest(range(0, nf)) AS k FROM p),
            b AS (
                SELECT doc_id,
                       CAST(sum(180 + (19 * doc_id + 11 * k) % 150)
                            AS BIGINT) AS payload_bytes
                FROM s GROUP BY doc_id)
            SELECT p.doc_id AS media_id,
                   CAST(256 AS BIGINT) AS pid,
                   CAST(CASE p.doc_id % 3 WHEN 0 THEN 27
                        WHEN 1 THEN 6 ELSE 2 END AS BIGINT)
                       AS stream_type,
                   CASE p.doc_id % 3 WHEN 0 THEN 'h264'
                        WHEN 1 THEN 'private_pes'
                        ELSE 'mpeg2video' END AS codec,
                   CAST(p.nf AS BIGINT) AS n_pes,
                   b.payload_bytes,
                   CAST((p.nf - 1) * 40 AS BIGINT) AS duration_ms,
                   CAST(0 AS BIGINT) AS cc_errors,
                   CAST(0 AS BIGINT) AS pes_errors
            FROM p JOIN b USING (doc_id)""",
        # AVI demux: closed form mirrors synth_avi_probe_corpus; a
        # hash match certifies the RIFF chunk walk, header parse and
        # the idx1 offset-convention sniff (both conventions + absent)
        "videos_avi_probe": """
            WITH p AS (
                SELECT doc_id, 3 + doc_id % 6 AS nf FROM documents),
            s AS (
                SELECT doc_id, unnest(range(0, nf)) AS k FROM p),
            b AS (
                SELECT doc_id,
                       CAST(sum(150 + (17 * doc_id + 9 * k) % 120)
                            AS BIGINT) AS frame_bytes
                FROM s GROUP BY doc_id)
            SELECT p.doc_id AS media_id,
                   CASE p.doc_id % 3 WHEN 0 THEN 'XVID'
                        WHEN 1 THEN 'MJPG' ELSE 'H264' END AS handler,
                   CAST(64 + 8 * (p.doc_id % 5) AS BIGINT) AS width,
                   CAST(48 + 8 * (p.doc_id % 4) AS BIGINT) AS height,
                   CAST(p.nf AS BIGINT) AS n_frames,
                   CAST(p.nf * 40 AS BIGINT) AS duration_ms,
                   b.frame_bytes,
                   p.doc_id % 3 = 1 AS decodable
            FROM p JOIN b USING (doc_id)""",
        "videos_avi_frame_sample": """
            WITH v AS (
                SELECT doc_id AS media_id,
                       CASE WHEN doc_id % 10 = 5 THEN 3 + (doc_id - 1) % 5
                            ELSE 4 + doc_id % 5 END AS n_frames
                FROM documents)
            SELECT media_id, unnest(range(0, n_frames, 2)) AS frame_idx,
                   n_frames, 72 AS width, 64 AS height
            FROM v""",
        # Matroska demux: closed form mirrors synth_mkv_probe_corpus
        # (codec cycle, webm doctype every 5th, fixed-lacing docs get
        # equal frame sizes). A hash match certifies the EBML vint
        # walk + all four lacing decoders + both segment-size forms.
        "videos_mkv_probe": """
            WITH p AS (
                SELECT doc_id, 3 + doc_id % 6 AS nf,
                       doc_id % 4 = 3 AS fixed
                FROM documents),
            s AS (
                SELECT doc_id, nf, fixed, unnest(range(0, nf)) AS k
                FROM p),
            b AS (
                SELECT doc_id,
                       CAST(sum(120 + (11 * doc_id
                                + CASE WHEN fixed THEN 0
                                       ELSE 5 * k END) % 80)
                            AS BIGINT) AS frame_bytes
                FROM s GROUP BY doc_id)
            SELECT p.doc_id AS media_id,
                   CASE WHEN p.doc_id % 5 = 0 THEN 'webm'
                        ELSE 'matroska' END AS doctype,
                   CASE p.doc_id % 3 WHEN 0 THEN 'V_VP9'
                        WHEN 1 THEN 'V_MJPEG' ELSE 'V_AV1' END AS codec,
                   CAST(64 + 8 * (p.doc_id % 5) AS BIGINT) AS width,
                   CAST(48 + 8 * (p.doc_id % 4) AS BIGINT) AS height,
                   CAST(p.nf AS BIGINT) AS n_frames,
                   CAST(p.nf * 40 AS BIGINT) AS duration_ms,
                   b.frame_bytes,
                   p.doc_id % 3 = 1 AS decodable
            FROM p JOIN b USING (doc_id)""",
        "videos_mkv_frame_sample": """
            WITH v AS (
                SELECT doc_id AS media_id,
                       CASE WHEN doc_id % 10 = 5 THEN 3 + (doc_id - 1) % 5
                            ELSE 4 + doc_id % 5 END AS n_frames
                FROM documents)
            SELECT media_id, unnest(range(0, n_frames, 2)) AS frame_idx,
                   n_frames, 72 AS width, 64 AS height
            FROM v""",
        "videos_mp4_frame_sample": """
            WITH v AS (
                SELECT doc_id AS media_id,
                       CASE WHEN doc_id % 10 = 5 THEN 3 + (doc_id - 1) % 5
                            ELSE 4 + doc_id % 5 END AS n_frames
                FROM documents)
            SELECT media_id, unnest(range(0, n_frames, 2)) AS frame_idx,
                   n_frames, 72 AS width, 64 AS height
            FROM v""",
        "gifs_frame_sample": """
            WITH v AS (
                SELECT doc_id AS media_id,
                       CASE WHEN doc_id % 10 = 5 THEN 3 + (doc_id - 1) % 5
                            ELSE 4 + doc_id % 5 END AS n_frames
                FROM documents)
            SELECT media_id, unnest(range(0, n_frames, 2)) AS frame_idx,
                   n_frames, 72 AS width, 64 AS height
            FROM v""",
        "docs_shuffled": "SELECT doc_id, lang FROM documents",
        "q1_pricing_summary": """
            SELECT l_returnflag, l_linestatus,
                   round(sum(l_quantity), 2)                        AS sum_qty,
                   round(sum(round(l_extendedprice * 100)) / 100.0, 2)
                       AS sum_base_price,
                   round(sum(round(l_extendedprice * (1 - l_discount) * 100))
                         / 100.0, 2)                                AS sum_disc_price,
                   round(avg(l_quantity), 6)                        AS avg_qty,
                   round(avg(l_discount), 6)                        AS avg_disc,
                   count(*)                                         AS count_order
            FROM lineitem
            WHERE l_shipdate <= TIMESTAMP '1998-09-02'
            GROUP BY l_returnflag, l_linestatus
        """,
        "q3_segment_revenue": """
            SELECT l_orderkey,
                   round(sum(round(l_extendedprice * (1 - l_discount) * 100))
                         / 100.0, 2) AS revenue
            FROM lineitem
            JOIN orders   ON l_orderkey = o_orderkey
            JOIN customer ON o_custkey = c_custkey
            WHERE c_mktsegment = 'BUILDING'
            GROUP BY l_orderkey
            ORDER BY revenue DESC, l_orderkey
            LIMIT 10
        """,
        "q5_region_nation_volume": """
            SELECT n_name,
                   round(sum(round(l_extendedprice * (1 - l_discount) * 100))
                         / 100.0, 2) AS revenue
            FROM lineitem
            JOIN supplier ON l_suppkey = s_suppkey
            JOIN nation   ON s_nationkey = n_nationkey
            JOIN region   ON n_regionkey = r_regionkey
            WHERE r_name = 'ASIA'
            GROUP BY n_name
        """,
        "top_customers": """
            SELECT c_custkey, c_name, c_acctbal
            FROM customer
            ORDER BY c_acctbal DESC, c_custkey
            LIMIT 25
        """,
        "orders_priority_counts": """
            SELECT o_orderstatus, o_orderpriority, count(*) AS n_orders
            FROM orders
            GROUP BY o_orderstatus, o_orderpriority
        """,
        "events_latest_per_user": """
            SELECT event_id, ts, user_id, event_type, value
            FROM (
                SELECT event_id, ts, user_id, event_type, value,
                       row_number() OVER (PARTITION BY user_id
                                          ORDER BY ts DESC, event_id DESC) AS rn
                FROM events
            ) WHERE rn = 1
        """,
        "events_hourly_windows": """
            SELECT user_id, date_trunc('hour', ts) AS window_start, event_type,
                   count(*) AS n_events,
                   round(sum(round(value * 100)) / 100.0, 2) AS sum_value
            FROM events
            GROUP BY user_id, date_trunc('hour', ts), event_type
        """,
        "customers_without_urgent_orders": """
            SELECT c_custkey, c_name, c_acctbal
            FROM customer c
            WHERE NOT EXISTS (SELECT 1 FROM orders o
                              WHERE o.o_custkey = c.c_custkey
                                AND o.o_orderpriority = '1-URGENT')
        """,
        "customers_with_urgent_orders": """
            SELECT c_custkey, c_name, c_acctbal
            FROM customer c
            WHERE EXISTS (SELECT 1 FROM orders o
                          WHERE o.o_custkey = c.c_custkey
                            AND o.o_orderpriority = '1-URGENT')
        """,
        "docs_sample": """
            SELECT doc_id FROM documents
            WHERE substr(md5(text), 1, 2) < '28'
        """,
        "supplier_nation_hashjoin": """
            SELECT s_suppkey, s_name, s_acctbal, n_name
            FROM supplier JOIN nation ON s_nationkey = n_nationkey
        """,
        "purchases_with_prior_error": """
            -- no-match coalesces to -1: keeps the column int64 in every
            -- materialization (a nullable int NaN-promotes to double in
            -- pandas, which hash-mismatches the Ray side's int64)
            SELECT p.event_id, p.ts, p.user_id,
                   COALESCE(e.event_id, -1) AS prior_error_id
            FROM (SELECT * FROM events WHERE event_type = 'purchase') p
            ASOF LEFT JOIN
                 (SELECT * FROM events WHERE event_type = 'error') e
              ON p.user_id = e.user_id AND p.ts > e.ts
        """,
        "events_distinct_users": """
            SELECT event_type, count(DISTINCT user_id) AS n_users
            FROM events GROUP BY event_type
        """,
        # salted twin: same answer, skew-safe partitioning
        "events_distinct_users_salted": """
            SELECT event_type, count(DISTINCT user_id) AS n_users
            FROM events GROUP BY event_type
        """,
        "events_rank_in_user": """
            SELECT event_id, user_id,
                   ROW_NUMBER() OVER (PARTITION BY user_id
                                      ORDER BY ts, event_id) AS rnk
            FROM events
        """,
        "events_value_p90": """
            SELECT event_type,
                   round(quantile_cont(value, 0.9), 6) AS p90_value
            FROM events GROUP BY event_type
        """,
        "lang_top_terms": """
            WITH counts AS (
                SELECT lang, term, count(*) AS n
                FROM (SELECT lang, unnest(string_split(text, ' ')) AS term
                      FROM documents)
                GROUP BY lang, term
            ), ranked AS (
                SELECT lang, term, n,
                       ROW_NUMBER() OVER (PARTITION BY lang
                                          ORDER BY n DESC, term) AS r
                FROM counts
            )
            SELECT lang, term, n FROM ranked WHERE r <= 3
        """,
        "events_time_since_prev": """
            SELECT event_id, user_id,
                   date_diff('microsecond',
                             LAG(ts) OVER (PARTITION BY user_id
                                           ORDER BY ts, event_id),
                             ts) AS prev_gap_us
            FROM events
        """,
        "events_moving_avg": """
            SELECT event_id, user_id,
                   round(AVG(value) OVER (
                       PARTITION BY user_id ORDER BY ts, event_id
                       ROWS BETWEEN 2 PRECEDING AND CURRENT ROW), 6)
                       AS mavg3
            FROM events
        """,
        "q6_revenue_filter": """
            SELECT round(sum(round(l_extendedprice * l_discount * 10000))
                         / 10000.0, 2) AS revenue,
                   count(*) AS n_items
            FROM lineitem
            WHERE l_shipdate >= TIMESTAMP '1995-01-01'
              AND l_shipdate <  TIMESTAMP '1996-01-01'
              AND l_discount BETWEEN 0.05 AND 0.07
              AND l_quantity < 24
        """,
        "q4_priority_exists": """
            SELECT o_orderpriority, count(*) AS n_orders
            FROM orders
            WHERE EXISTS (SELECT 1 FROM lineitem
                          WHERE l_orderkey = o_orderkey
                            AND l_returnflag = 'R')
            GROUP BY o_orderpriority
        """,
        "q12_priority_by_flag": """
            SELECT l_returnflag,
                   count(*) FILTER (WHERE o_orderpriority IN
                       ('1-URGENT', '2-HIGH')) AS high_count,
                   count(*) FILTER (WHERE o_orderpriority NOT IN
                       ('1-URGENT', '2-HIGH')) AS low_count
            FROM lineitem
            JOIN orders ON o_orderkey = l_orderkey
            WHERE l_shipdate >= TIMESTAMP '1995-01-01'
              AND l_shipdate < TIMESTAMP '1997-01-01'
            GROUP BY l_returnflag
            ORDER BY l_returnflag
        """,
        "orders_top_per_priority": """
            SELECT o_orderpriority, o_orderkey, o_totalprice FROM (
                SELECT o_orderpriority, o_orderkey, o_totalprice,
                       row_number() OVER (
                           PARTITION BY o_orderpriority
                           ORDER BY o_totalprice DESC, o_orderkey) AS r
                FROM orders) t
            WHERE r <= 3
            ORDER BY o_orderpriority, o_totalprice DESC, o_orderkey
        """,
        "orders_rollup": """
            SELECT coalesce(o_orderpriority, 'ALL') AS priority,
                   coalesce(o_orderstatus, 'ALL')   AS status,
                   count(*)                         AS n_orders,
                   round(sum(round(o_totalprice * 100)) / 100.0, 2)
                       AS revenue
            FROM orders
            GROUP BY ROLLUP(o_orderpriority, o_orderstatus)
            ORDER BY priority, status
        """,
        "events_hourly_gapfill": """
            WITH b AS (
                SELECT date_trunc('hour', ts) AS h, count(*) AS n
                FROM events GROUP BY 1)
            SELECT r.h AS hour, coalesce(b.n, 0) AS n_events
            FROM (SELECT unnest(range((SELECT min(h) FROM b),
                                      (SELECT max(h) FROM b)
                                          + INTERVAL 1 HOUR,
                                      INTERVAL 1 HOUR)) AS h) r
            LEFT JOIN b ON r.h = b.h
            ORDER BY hour
        """,
        "events_funnel_users": """
            SELECT count(*) AS n_users FROM (
                SELECT user_id,
                       min(ts) FILTER (WHERE event_type = 'view')
                           AS first_view,
                       max(ts) FILTER (WHERE event_type = 'purchase')
                           AS last_purchase
                FROM events GROUP BY user_id) t
            WHERE first_view IS NOT NULL
              AND last_purchase IS NOT NULL
              AND first_view < last_purchase
        """,
        "q13_orders_per_customer": """
            SELECT c_count, count(*) AS custdist FROM (
                SELECT c.c_custkey, count(o.o_orderkey) AS c_count
                FROM customer c
                LEFT JOIN orders o ON c.c_custkey = o.o_custkey
                                  AND o.o_orderstatus <> 'F'
                GROUP BY c.c_custkey) t
            GROUP BY c_count
            ORDER BY custdist DESC, c_count DESC
        """,
        "nation_status_pivot": """
            SELECT n_name,
                   count(*) FILTER (WHERE o_orderstatus = 'O') AS n_o,
                   count(*) FILTER (WHERE o_orderstatus = 'F') AS n_f,
                   count(*) FILTER (WHERE o_orderstatus = 'P') AS n_p
            FROM orders
            JOIN customer ON c_custkey = o_custkey
            JOIN nation ON n_nationkey = c_nationkey
            GROUP BY n_name
        """,
        "events_props_k_stats": """
            SELECT event_type,
                   count(*) AS n_events,
                   CAST(sum(CAST(json_extract_string(props, '$.k')
                                 AS BIGINT)) AS BIGINT) AS sum_k,
                   min(CAST(json_extract_string(props, '$.k') AS BIGINT))
                       AS min_k,
                   max(CAST(json_extract_string(props, '$.k') AS BIGINT))
                       AS max_k,
                   round(avg(CAST(json_extract_string(props, '$.k')
                                  AS BIGINT)), 6) AS avg_k
            FROM events GROUP BY event_type
        """,
        "acctbal_union_topk": """
            SELECT name, acctbal, side FROM (
                SELECT c_name AS name, c_acctbal AS acctbal,
                       'customer' AS side FROM customer
                UNION ALL
                SELECT s_name, s_acctbal, 'supplier' FROM supplier
            ) ORDER BY acctbal DESC, name LIMIT 20
        """,
        "events_sessions": """
            WITH marked AS (
                SELECT user_id, ts, event_id,
                       CASE WHEN lag(ts) OVER w IS NULL
                                 OR ts - lag(ts) OVER w > INTERVAL 30 MINUTE
                            THEN 1 ELSE 0 END AS new_s
                FROM events
                WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
            ), numbered AS (
                SELECT user_id,
                       sum(new_s) OVER (PARTITION BY user_id
                                        ORDER BY ts, event_id
                                        ROWS UNBOUNDED PRECEDING) AS session_id
                FROM marked
            )
            SELECT user_id, cast(session_id AS BIGINT) AS session_id,
                   count(*) AS n_events
            FROM numbered GROUP BY user_id, session_id
        """,
        "parts_price_bands": """
            SELECT CAST(CASE WHEN p_retailprice > 980 THEN 4
                             WHEN p_retailprice > 960 THEN 3
                             WHEN p_retailprice > 940 THEN 2
                             WHEN p_retailprice > 920 THEN 1
                             ELSE 0 END AS BIGINT) AS band,
                   count(*) AS n_parts
            FROM part GROUP BY band
        """,
        "events_running_total": """
            SELECT event_id, user_id,
                   round(sum(round(value * 100))
                         OVER (PARTITION BY user_id ORDER BY ts, event_id
                               ROWS UNBOUNDED PRECEDING) / 100.0, 2)
                       AS running_value
            FROM events
        """,
        "events_value_median": """
            SELECT event_type, round(median(value), 6) AS median_value
            FROM events GROUP BY event_type
        """,
        "parts_brand_stats": """
            SELECT p_brand, count(*) AS n_parts,
                   round(avg(p_retailprice), 6) AS avg_price,
                   max(p_size) AS max_size
            FROM part GROUP BY p_brand
        """,
        "docs_term_counts": """
            SELECT term, count(*) AS n FROM (
                SELECT unnest(string_split(text, ' ')) AS term
                FROM documents)
            GROUP BY term ORDER BY n DESC, term LIMIT 50
        """,
        "docs_bigram_counts": """
            SELECT bigram, count(*) AS n FROM (
                SELECT unnest(list_transform(
                    range(1, len(w)), i -> w[i] || ' ' || w[i+1])) AS bigram
                FROM (SELECT string_split(text, ' ') AS w FROM documents))
            GROUP BY bigram ORDER BY n DESC, bigram LIMIT 50
        """,
        "docs_lang_stats": """
            SELECT lang, count(*) AS n_docs,
                   cast(sum(n_chars) AS BIGINT) AS total_chars,
                   round(avg(n_chars), 6) AS avg_chars
            FROM documents GROUP BY lang
        """,
        "docs_token_counts": """
            SELECT doc_id,
                   cast(len(regexp_split_to_array(text, '\\s+')) AS BIGINT)
                       AS n_tokens
            FROM documents
        """,
        "docs_quality_scores": """
            WITH f AS (
                SELECT doc_id,
                       cast(len(string_split(text, ' ')) AS BIGINT) AS n_tokens,
                       cast(len(list_distinct(string_split(text, ' '))) AS BIGINT)
                           AS n_uniq,
                       cast(length(text) AS BIGINT) AS n_chars
                FROM documents
            )
            SELECT doc_id, n_tokens, n_uniq, n_chars,
                   round(n_uniq * 1.0 / n_tokens, 6) AS uniq_ratio,
                   round((n_chars - (n_tokens - 1)) * 1.0 / n_tokens, 6)
                       AS avg_token_len,
                   round(50.0 * (n_uniq * 1.0 / n_tokens)
                         + 5.0 * least((n_chars - (n_tokens - 1)) * 1.0
                                       / n_tokens, 10.0), 6) AS quality_score
            FROM f
        """,
        "docs_fingerprints": """
            SELECT doc_id, md5(text) AS md5 FROM documents
        """,
        "docs_exact_dedup": """
            SELECT min(doc_id) AS doc_id FROM documents GROUP BY md5(text)
        """,
        "docs_ngram_jaccard": """
            WITH t AS (
                SELECT doc_id, list_distinct(string_split(text, ' ')) AS toks
                FROM documents
            )
            SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
                   round(len(list_intersect(a.toks, b.toks)) * 1.0 /
                         (len(a.toks) + len(b.toks)
                          - len(list_intersect(a.toks, b.toks))), 6) AS jaccard
            FROM t a JOIN t b ON a.doc_id < b.doc_id
            WHERE round(len(list_intersect(a.toks, b.toks)) * 1.0 /
                        (len(a.toks) + len(b.toks)
                         - len(list_intersect(a.toks, b.toks))), 6) >= 0.7
        """,
        "docs_jaccard_clusters": """
            WITH RECURSIVE t AS (
                SELECT doc_id, list_distinct(string_split(text, ' ')) AS toks
                FROM documents
            ), pairs AS (
                SELECT a.doc_id AS pa, b.doc_id AS pb
                FROM t a JOIN t b ON a.doc_id < b.doc_id
                WHERE round(len(list_intersect(a.toks, b.toks)) * 1.0 /
                            (len(a.toks) + len(b.toks)
                             - len(list_intersect(a.toks, b.toks))), 6)
                      >= 0.7
            ), edges AS (
                SELECT pa AS u, pb AS v FROM pairs
                UNION SELECT pb, pa FROM pairs
            ), reach AS (
                SELECT u AS src, u AS dst FROM edges
                UNION
                SELECT r.src, e.v FROM reach r JOIN edges e ON r.dst = e.u
            )
            SELECT src AS doc_id, min(dst) AS cluster_id
            FROM reach GROUP BY src
        """,
        "docs_jaccard_canonical": """
            WITH RECURSIVE t AS (
                SELECT doc_id, list_distinct(string_split(text, ' ')) AS toks
                FROM documents
            ), pairs AS (
                SELECT a.doc_id AS pa, b.doc_id AS pb
                FROM t a JOIN t b ON a.doc_id < b.doc_id
                WHERE round(len(list_intersect(a.toks, b.toks)) * 1.0 /
                            (len(a.toks) + len(b.toks)
                             - len(list_intersect(a.toks, b.toks))), 6)
                      >= 0.7
            ), edges AS (
                SELECT pa AS u, pb AS v FROM pairs
                UNION SELECT pb, pa FROM pairs
            ), reach AS (
                SELECT u AS src, u AS dst FROM edges
                UNION
                SELECT r.src, e.v FROM reach r JOIN edges e ON r.dst = e.u
            ), clusters AS (
                SELECT src AS doc_id, min(dst) AS cluster_id
                FROM reach GROUP BY src
            )
            SELECT d.doc_id, d.lang FROM documents d
            WHERE NOT EXISTS (SELECT 1 FROM clusters c
                              WHERE c.doc_id = d.doc_id
                                AND c.doc_id <> c.cluster_id)
        """,
        "emb_dup_pairs": """
            SELECT a.vec_id AS vec_a, b.vec_id AS vec_b,
                   round(list_cosine_similarity(
                       a.embedding::DOUBLE[], b.embedding::DOUBLE[]), 6) AS cosine
            FROM embeddings a JOIN embeddings b
              ON a.label = b.label AND a.vec_id < b.vec_id
            WHERE round(list_cosine_similarity(
                      a.embedding::DOUBLE[], b.embedding::DOUBLE[]), 6) >= 0.3
        """,
        "emb_knn_bruteforce": """
            WITH q AS (SELECT vec_id AS query_id, embedding AS qe
                       FROM embeddings WHERE vec_id < 8),
                 scored AS (
                SELECT q.query_id, e.vec_id,
                       round(list_cosine_similarity(
                           q.qe::DOUBLE[], e.embedding::DOUBLE[]), 6) AS cosine
                FROM q JOIN embeddings e ON e.vec_id <> q.query_id
            ), ranked AS (
                SELECT query_id, vec_id, cosine,
                       row_number() OVER (PARTITION BY query_id
                                          ORDER BY cosine DESC, vec_id) AS rank
                FROM scored
            )
            SELECT query_id, vec_id, cosine, cast(rank AS BIGINT) AS rank
            FROM ranked WHERE rank <= 10
        """,
        "events_type_user_distinct": """
            SELECT event_type, count(DISTINCT user_id) AS n_users
            FROM events GROUP BY event_type
        """,
        "events_type_share": """
            SELECT event_type, count(*) AS n,
                   round(count(*) * 1.0 / sum(count(*)) OVER (), 6) AS share
            FROM events GROUP BY event_type
        """,
        "customer_order_histogram": """
            SELECT c_count, count(*) AS n_custs FROM (
                SELECT c.c_custkey, count(o.o_orderkey) AS c_count
                FROM customer c LEFT JOIN orders o
                  ON c.c_custkey = o.o_custkey
                GROUP BY c.c_custkey
            ) GROUP BY c_count
        """,
        "customer_ntile": """
            SELECT c_custkey, c_acctbal,
                   row_number() OVER (ORDER BY c_acctbal DESC, c_custkey)
                       AS rn,
                   ntile(4) OVER (ORDER BY c_acctbal DESC, c_custkey)
                       AS tile
            FROM customer
        """,
        "region_nation_list": """
            SELECT r_name,
                   string_agg(n_name, ',' ORDER BY n_name) AS nations,
                   count(*) AS n_nations
            FROM nation JOIN region ON n_regionkey = r_regionkey
            GROUP BY r_name
        """,
        "lineitem_corr_disc_tax": """
            SELECT round(corr(l_discount, l_tax), 6) AS corr_disc_tax
            FROM lineitem
        """,
        "docs_contaminated": """
            -- benchmark decontamination: docs containing any eval-set
            -- snippet (eval set = doc_id % 23 == 0, first 16 chars)
            SELECT DISTINCT d.doc_id
            FROM documents d
            WHERE d.doc_id % 23 <> 0
              AND EXISTS (SELECT 1 FROM documents e
                          WHERE e.doc_id % 23 = 0
                            AND contains(d.text, substr(e.text, 1, 16)))
        """,
        "docs_stratified_sample": """
            SELECT doc_id, lang FROM (
                SELECT doc_id, lang,
                       row_number() OVER (PARTITION BY lang
                                          ORDER BY md5(text), doc_id) AS rn
                FROM documents) WHERE rn <= 20
        """,
        "purchases_after_errors": """
            SELECT p.event_id, p.user_id, e.event_id AS error_id,
                   date_diff('microsecond', e.ts, p.ts) AS gap_us
            FROM (SELECT * FROM events WHERE event_type = 'purchase') p
            JOIN (SELECT * FROM events WHERE event_type = 'error') e
              ON p.user_id = e.user_id
             AND e.ts >= p.ts - INTERVAL 6 HOUR
             AND e.ts <  p.ts
        """,
        "users_top_event_type": """
            SELECT user_id, event_type AS top_type, n FROM (
                SELECT user_id, event_type, count(*) AS n,
                       row_number() OVER (PARTITION BY user_id
                                          ORDER BY count(*) DESC, event_type)
                           AS r
                FROM events GROUP BY user_id, event_type
            ) WHERE r = 1
        """,
        "nation_top_supplier": """
            SELECT s_suppkey, s_name, s_nationkey, s_acctbal, n_name FROM (
                SELECT s_suppkey, s_name, s_nationkey, s_acctbal,
                       row_number() OVER (PARTITION BY s_nationkey
                                          ORDER BY s_acctbal DESC, s_suppkey)
                           AS r
                FROM supplier
            ) JOIN nation ON s_nationkey = n_nationkey
            WHERE r = 1
        """,
        "nation_balance_fulljoin": """
            WITH c AS (
                SELECT c_nationkey AS nk,
                       sum(round(c_acctbal * 100)) AS c_cents
                FROM customer WHERE c_acctbal > 9900 GROUP BY c_nationkey
            ), s AS (
                SELECT s_nationkey AS nk,
                       sum(round(s_acctbal * 100)) AS s_cents
                FROM supplier WHERE s_acctbal > 5000 GROUP BY s_nationkey
            )
            SELECT CAST(COALESCE(c.nk, s.nk) AS INTEGER) AS nationkey,
                   round(COALESCE(c_cents, 0) / 100.0, 2) AS cust_bal,
                   round(COALESCE(s_cents, 0) / 100.0, 2) AS supp_bal
            FROM c FULL OUTER JOIN s ON c.nk = s.nk
        """,
        "docs_source_mix": """
            SELECT doc_id, source FROM (
                SELECT doc_id, source,
                       row_number() OVER (PARTITION BY source
                                          ORDER BY md5(text), doc_id) AS rn
                FROM documents)
            WHERE rn <= (CAST(substr(source, 4) AS BIGINT) % 4 + 1) * 5
        """,
        "supplier_balance_zscore": """
            SELECT s_suppkey, s_nationkey, s_acctbal,
                   round((s_acctbal
                          - avg(s_acctbal) OVER (PARTITION BY s_nationkey))
                         / NULLIF(stddev_pop(s_acctbal)
                                  OVER (PARTITION BY s_nationkey), 0), 4)
                       AS z
            FROM supplier
        """,
        "docs_tfidf_top_term": """
            WITH tok AS (
                SELECT doc_id, unnest(string_split(text, ' ')) AS term
                FROM documents
            ), tf AS (
                SELECT doc_id, term, count(*) AS tf
                FROM tok GROUP BY doc_id, term
            ), df AS (
                SELECT term, count(DISTINCT doc_id) AS df
                FROM tok GROUP BY term
            ), n AS (SELECT count(*) AS n FROM documents),
            scored AS (
                SELECT tf.doc_id, tf.term,
                       tf.tf * ln(n.n * 1.0 / df.df) AS score,
                       row_number() OVER (
                           PARTITION BY tf.doc_id
                           ORDER BY tf.tf * ln(n.n * 1.0 / df.df) DESC,
                                    tf.term) AS r
                FROM tf JOIN df USING (term) CROSS JOIN n
            )
            SELECT doc_id, term AS top_term, round(score, 6) AS tfidf
            FROM scored WHERE r = 1
        """,
        "docs_stopword_removal": """
            SELECT doc_id,
                   regexp_replace(text, '\\b(the|and|of|to|a|in|is)\\b ?',
                                  '', 'g') AS clean_text,
                   cast(len(regexp_extract_all(
                       text, '\\b(the|and|of|to|a|in|is)\\b ?')) AS BIGINT)
                       AS n_removed
            FROM documents
        """,
        "docs_unigram_logprob": """
            WITH tok AS (
                SELECT doc_id, unnest(string_split(text, ' ')) AS term
                FROM documents
            ), tc AS (
                SELECT term, count(*) AS tc FROM tok GROUP BY term
            ), tot AS (SELECT count(*) AS total FROM tok)
            SELECT doc_id,
                   round(avg(ln(tc.tc * 1.0 / tot.total)), 6)
                       AS mean_logprob,
                   count(*) AS n_tokens
            FROM tok JOIN tc USING (term) CROSS JOIN tot
            GROUP BY doc_id
        """,
        "orders_monthly_growth": """
            WITH m AS (
                SELECT date_trunc('month', o_orderdate) AS month,
                       count(*) AS n_orders
                FROM orders GROUP BY 1
            )
            SELECT month, n_orders,
                   round((n_orders - LAG(n_orders) OVER (ORDER BY month))
                         * 1.0 / LAG(n_orders) OVER (ORDER BY month), 6)
                       AS mom_growth
            FROM m
        """,
        "user_conversion_funnel": """
            SELECT user_id,
                   min(ts) FILTER (WHERE event_type = 'view') AS first_view,
                   COALESCE(min(ts) FILTER (WHERE event_type = 'purchase')
                            > min(ts) FILTER (WHERE event_type = 'view'),
                            FALSE) AS converted
            FROM events GROUP BY user_id
        """,
        "user_retention": """
            WITH act AS (
                SELECT DISTINCT user_id, date_trunc('day', ts) AS day
                FROM events
            ), cohort AS (
                SELECT user_id, min(day) AS d0 FROM act GROUP BY user_id
            ), flags AS (
                SELECT c.user_id, c.d0,
                       EXISTS (SELECT 1 FROM act a
                               WHERE a.user_id = c.user_id
                                 AND a.day = c.d0 + INTERVAL 7 DAY)
                           AS retained
                FROM cohort c
            )
            SELECT d0 AS cohort_day, count(*) AS n_users,
                   CAST(sum(CASE WHEN retained THEN 1 ELSE 0 END) AS BIGINT)
                       AS n_retained
            FROM flags GROUP BY d0
        """,
        "q10_returned_revenue": """
            SELECT c_custkey, c_name,
                   round(sum(round(l_extendedprice * (1 - l_discount) * 100))
                         / 100.0, 2) AS revenue,
                   c_acctbal, n_name
            FROM lineitem
            JOIN orders   ON l_orderkey = o_orderkey
            JOIN customer ON o_custkey = c_custkey
            JOIN nation   ON c_nationkey = n_nationkey
            WHERE l_returnflag = 'R'
              AND o_orderdate >= TIMESTAMP '1996-01-01'
              AND o_orderdate <  TIMESTAMP '1996-04-01'
            GROUP BY c_custkey, c_name, c_acctbal, n_name
            ORDER BY revenue DESC, c_custkey
            LIMIT 20
        """,
        "q14_promo_share": """
            SELECT round(
                100.0 * sum(CASE WHEN p_type = 'PROMO'
                    THEN round(l_extendedprice * (1 - l_discount) * 10000)
                    ELSE 0 END)
                / sum(round(l_extendedprice * (1 - l_discount) * 10000)),
                6) AS promo_share_pct
            FROM lineitem JOIN part ON l_partkey = p_partkey
            WHERE l_shipdate >= TIMESTAMP '1997-01-01'
              AND l_shipdate <  TIMESTAMP '1997-04-01'
        """,
        "q17_small_quantity_revenue": """
            SELECT round(sum(round(l_extendedprice * 100)) / 100.0 / 7.0, 2)
                       AS avg_yearly
            FROM lineitem l JOIN part p ON l.l_partkey = p.p_partkey
            WHERE p.p_brand = 'Brand#13'
              AND l.l_quantity < (
                  SELECT 0.2 * (sum(l2.l_quantity) / count(*))
                  FROM lineitem l2 WHERE l2.l_partkey = l.l_partkey)
        """,
        "q18_large_orders": """
            SELECT c_name, o_custkey, o_orderkey, o_orderdate, o_totalprice,
                   sum_qty
            FROM (SELECT l_orderkey, sum(l_quantity) AS sum_qty
                  FROM lineitem GROUP BY l_orderkey
                  HAVING sum(l_quantity) > 300) big
            JOIN orders   ON o_orderkey = big.l_orderkey
            JOIN customer ON c_custkey = o_custkey
            ORDER BY o_totalprice DESC, o_orderkey
            LIMIT 100
        """,
        "q19_disjunctive_revenue": """
            SELECT round(COALESCE(sum(round(l_extendedprice * (1 - l_discount)
                                   * 10000)), 0) / 10000.0, 2) AS revenue,
                   count(*) AS n_items
            FROM lineitem JOIN part ON l_partkey = p_partkey
            WHERE (p_brand = 'Brand#12' AND l_quantity BETWEEN 1 AND 11
                   AND p_size BETWEEN 1 AND 5)
               OR (p_brand = 'Brand#23' AND l_quantity BETWEEN 10 AND 20
                   AND p_size BETWEEN 1 AND 10)
               OR (p_brand = 'Brand#34' AND l_quantity BETWEEN 20 AND 30
                   AND p_size BETWEEN 1 AND 15)
        """,
        "q22_idle_customers": """
            WITH thresh AS (
                SELECT sum(round(c_acctbal * 100)) / 100.0 / count(*) AS a
                FROM customer WHERE c_acctbal > 0
            )
            SELECT substr(c_name, 17, 2) AS cntrycode,
                   count(*) AS numcust,
                   round(sum(round(c_acctbal * 100)) / 100.0, 2)
                       AS totacctbal
            FROM customer, thresh
            WHERE c_acctbal > thresh.a
              AND NOT EXISTS (
                  SELECT 1 FROM orders
                  WHERE o_custkey = c_custkey
                    AND o_orderdate >= TIMESTAMP '2000-01-01')
            GROUP BY cntrycode
            ORDER BY cntrycode
        """,
        "purchase_pagerank": """
            WITH e0 AS (
                SELECT DISTINCT o_custkey AS a, l_suppkey + 1000000 AS b
                FROM lineitem JOIN orders ON l_orderkey = o_orderkey),
            und AS (SELECT a AS src, b AS dst FROM e0
                    UNION ALL SELECT b AS src, a AS dst FROM e0),
            deg AS (SELECT src AS node, count(*) AS d FROM und
                    GROUP BY src),
            nn AS (SELECT count(*) AS n FROM deg),
            r0 AS (SELECT node, 1000000000000 // (SELECT n FROM nn) AS r
                   FROM deg),
            c1 AS (
    SELECT u.dst AS node, sum(r0.r // deg.d) AS c
    FROM und u JOIN r0 ON u.src = r0.node JOIN deg ON u.src = deg.node
    GROUP BY u.dst),
r1 AS (
    SELECT deg.node,
           (150000000000 // (SELECT n FROM nn))
           + (85 * coalesce(c1.c, 0)) // 100 AS r
    FROM deg LEFT JOIN c1 ON deg.node = c1.node),
c2 AS (
    SELECT u.dst AS node, sum(r1.r // deg.d) AS c
    FROM und u JOIN r1 ON u.src = r1.node JOIN deg ON u.src = deg.node
    GROUP BY u.dst),
r2 AS (
    SELECT deg.node,
           (150000000000 // (SELECT n FROM nn))
           + (85 * coalesce(c2.c, 0)) // 100 AS r
    FROM deg LEFT JOIN c2 ON deg.node = c2.node),
c3 AS (
    SELECT u.dst AS node, sum(r2.r // deg.d) AS c
    FROM und u JOIN r2 ON u.src = r2.node JOIN deg ON u.src = deg.node
    GROUP BY u.dst),
r3 AS (
    SELECT deg.node,
           (150000000000 // (SELECT n FROM nn))
           + (85 * coalesce(c3.c, 0)) // 100 AS r
    FROM deg LEFT JOIN c3 ON deg.node = c3.node),
c4 AS (
    SELECT u.dst AS node, sum(r3.r // deg.d) AS c
    FROM und u JOIN r3 ON u.src = r3.node JOIN deg ON u.src = deg.node
    GROUP BY u.dst),
r4 AS (
    SELECT deg.node,
           (150000000000 // (SELECT n FROM nn))
           + (85 * coalesce(c4.c, 0)) // 100 AS r
    FROM deg LEFT JOIN c4 ON deg.node = c4.node),
c5 AS (
    SELECT u.dst AS node, sum(r4.r // deg.d) AS c
    FROM und u JOIN r4 ON u.src = r4.node JOIN deg ON u.src = deg.node
    GROUP BY u.dst),
r5 AS (
    SELECT deg.node,
           (150000000000 // (SELECT n FROM nn))
           + (85 * coalesce(c5.c, 0)) // 100 AS r
    FROM deg LEFT JOIN c5 ON deg.node = c5.node)
            SELECT node, round(r / 1000000000000.0, 6) AS rank
            FROM r5
            ORDER BY rank DESC, node
            LIMIT 25
""",
        "docs_new_content": """
            WITH split AS (
                SELECT CAST(floor(max(doc_id) / 2) AS BIGINT) AS s
                FROM documents
            )
            SELECT doc_id FROM documents d, split
            WHERE d.doc_id >= split.s AND NOT EXISTS (
                SELECT 1 FROM documents p
                WHERE p.doc_id < split.s AND md5(p.text) = md5(d.text))
            ORDER BY doc_id
        """,
        "docs_repetition": """
            WITH toks AS (
                SELECT doc_id, str_split(text, ' ') AS l FROM documents
            ), bigrams AS (
                SELECT doc_id,
                       unnest([l[i] || ' ' || l[i+1]
                               for i in generate_series(1, len(l)-1)]) AS bg
                FROM toks WHERE len(l) > 1
            ), cnt AS (
                SELECT doc_id, bg, count(*) AS n FROM bigrams GROUP BY 1, 2
            ), top AS (
                SELECT doc_id, max(n) AS mx, sum(n) AS tot FROM cnt GROUP BY 1
            )
            SELECT t.doc_id, len(t.l) AS n_tokens,
                   round(1.0 - len(list_distinct(t.l)) * 1.0 / len(t.l), 6)
                       AS dup_token_frac,
                   round(coalesce(top.mx * 1.0 / top.tot, 0.0), 6)
                       AS top_bigram_frac
            FROM toks t LEFT JOIN top ON t.doc_id = top.doc_id
        """,
        "docs_split": """
            SELECT doc_id,
                   CASE WHEN substr(md5(CAST(doc_id AS VARCHAR)), 1, 2) < '1a'
                        THEN 'val' ELSE 'train' END AS split
            FROM documents
        """,
        "parts_copurchase_topk": """
            WITH pairs AS (
                SELECT DISTINCT a.l_orderkey AS o,
                       a.l_partkey AS u, b.l_partkey AS v
                FROM lineitem a JOIN lineitem b
                  ON a.l_orderkey = b.l_orderkey
                 AND a.l_partkey < b.l_partkey),
            sup AS (SELECT u, v, count(*) AS support
                    FROM pairs GROUP BY u, v)
            SELECT u AS part_a, v AS part_b, support FROM sup
            ORDER BY support DESC, part_a, part_b LIMIT 20
        """,
        "docs_validate": """
            SELECT 'null_doc_id' AS rule,
                   count(*) FILTER (WHERE doc_id IS NULL) AS violations
            FROM documents
            UNION ALL
            SELECT 'dup_doc_id',
                   count(doc_id) - count(DISTINCT doc_id)
            FROM documents
            UNION ALL
            SELECT 'empty_text',
                   count(*) FILTER (WHERE text IS NULL OR text = '')
            FROM documents
            UNION ALL
            SELECT 'bad_n_chars',
                   count(*) FILTER (WHERE n_chars <> length(text))
            FROM documents
            UNION ALL
            SELECT 'bad_lang',
                   count(*) FILTER (WHERE lang NOT IN
                       ('en', 'fr', 'es', 'zh', 'de'))
            FROM documents
            UNION ALL
            SELECT 'bad_source',
                   count(*) FILTER (
                       WHERE NOT regexp_matches(source, '^src\\d+$'))
            FROM documents
        """,
        "emb_hard_negatives": """
            WITH x AS (
                SELECT vec_id,
                       unnest(embedding) AS v,
                       generate_subscripts(embedding, 1) - 1 AS dim
                FROM embeddings),
            rng AS (
                SELECT dim, min(v) AS mn, max(v) AS mx
                FROM x GROUP BY dim),
            codes AS (
                SELECT x.vec_id, x.dim,
                       CASE WHEN rng.mx > rng.mn THEN
                           CAST(least(254.0,
                                floor((CAST(x.v AS DOUBLE)
                                       - CAST(rng.mn AS DOUBLE)) * 255.0
                                      / (CAST(rng.mx AS DOUBLE)
                                         - CAST(rng.mn AS DOUBLE))))
                                AS BIGINT) - 127
                       ELSE -127 END AS code
                FROM x JOIN rng USING (dim)),
            s AS (
                SELECT a.vec_id AS q, b.vec_id AS c,
                       CAST(sum(a.code * b.code) AS BIGINT) AS score
                FROM codes a
                JOIN codes b ON a.dim = b.dim
                            AND a.vec_id <> b.vec_id
                JOIN embeddings la ON la.vec_id = a.vec_id
                JOIN embeddings lb ON lb.vec_id = b.vec_id
                WHERE la.label <> lb.label
                GROUP BY a.vec_id, b.vec_id),
            best AS (
                SELECT q, c, score,
                       row_number() OVER (PARTITION BY q
                                          ORDER BY score DESC, c) AS rn
                FROM s)
            SELECT q AS vec_id, c AS neg_id, score
            FROM best WHERE rn = 1
        """,
        "customer_spend_trend": """
            WITH pts AS (
                SELECT o_custkey AS k,
                       datediff('day', DATE '1992-01-01',
                                o_orderdate) AS x,
                       CAST(round(o_totalprice * 100) AS BIGINT) AS y
                FROM orders),
            agg AS (
                SELECT k, count(*) AS n, sum(x) AS sx, sum(y) AS sy,
                       sum(x * x) AS sxx, sum(x * y) AS sxy
                FROM pts GROUP BY k)
            SELECT k AS custkey, n,
                   round((n * sxy - sx * sy) * 1.0
                         / (n * sxx - sx * sx) / 100.0, 6)
                       AS slope_per_day
            FROM agg WHERE n >= 2 AND n * sxx - sx * sx > 0
        """,
        "docs_chunk_overlap": """
            WITH tok AS (
                SELECT doc_id, unnest(string_split(text, ' ')) AS tok,
                       generate_subscripts(string_split(text, ' '), 1)
                           - 1 AS i
                FROM documents),
            n AS (SELECT doc_id, count(*) AS nt FROM tok GROUP BY doc_id),
            chunks AS (
                SELECT doc_id, unnest(range(0, ((nt - 1) // 24) + 1)) AS c
                FROM n),
            joined AS (
                SELECT ch.doc_id, ch.c, t.tok, t.i
                FROM chunks ch JOIN tok t
                  ON t.doc_id = ch.doc_id
                 AND t.i >= ch.c * 24 AND t.i < ch.c * 24 + 32)
            SELECT doc_id, c AS chunk_idx, count(*) AS n_tokens,
                   md5(string_agg(tok, ' ' ORDER BY i)) AS chunk_md5
            FROM joined GROUP BY doc_id, c
        """,
        "emb_quantize_int8": """
            WITH x AS (
                SELECT vec_id,
                       unnest(embedding) AS v,
                       generate_subscripts(embedding, 1) - 1 AS dim
                FROM embeddings),
            rng AS (
                SELECT dim, min(v) AS mn, max(v) AS mx
                FROM x GROUP BY dim)
            SELECT x.vec_id, x.dim,
                   CASE WHEN rng.mx > rng.mn THEN
                       CAST(least(254.0,
                            floor((CAST(x.v AS DOUBLE) - CAST(rng.mn AS DOUBLE))
                                  * 255.0
                                  / (CAST(rng.mx AS DOUBLE)
                                     - CAST(rng.mn AS DOUBLE)))) AS BIGINT)
                       - 127
                   ELSE -127 END AS code
            FROM x JOIN rng USING (dim)
        """,
        # fuzzy linkage: the oracle is the ALL-PAIRS levenshtein argmin
        # the distributed path must reproduce without the n^2 scan
        "parts_fuzzy_match": """
            WITH canon AS (
                SELECT p_partkey, p_name || ' #' || p_partkey AS cname
                FROM part),
            dirty AS (
                SELECT p_partkey,
                       CASE p_partkey % 3
                         WHEN 0 THEN substr(cname, 1, i - 1)
                                     || substr(cname, i + 1)
                         WHEN 1 THEN substr(cname, 1, i - 1) || '@'
                                     || substr(cname, i + 1)
                         ELSE substr(cname, 1, i - 1) || '@'
                              || substr(cname, i)
                       END AS dname
                FROM (SELECT p_partkey, cname,
                             p_partkey % (length(cname) - 2) + 2 AS i
                      FROM canon)),
            cand AS (
                SELECT d.p_partkey AS dk, c.p_partkey AS ck,
                       levenshtein(d.dname, c.cname) AS dist
                FROM dirty d CROSS JOIN canon c),
            best AS (
                SELECT dk, ck, dist,
                       row_number() OVER (PARTITION BY dk
                                          ORDER BY dist, ck) AS rn
                FROM cand WHERE dist <= 1)
            SELECT dk AS p_partkey, ck AS matched_partkey, dist
            FROM best WHERE rn = 1
        """,
        "parts_kcore": _kcore_oracle(),
        "parts_communities": _lpa_oracle(),
        "parts_triangles": """
            WITH e AS (
                SELECT DISTINCT a.l_partkey AS u, b.l_partkey AS v
                FROM lineitem a JOIN lineitem b
                  ON a.l_orderkey = b.l_orderkey
                 AND a.l_partkey < b.l_partkey)
            SELECT
                (SELECT count(DISTINCT s) FROM
                    (SELECT u AS s FROM e UNION SELECT v FROM e))
                    AS n_nodes,
                (SELECT count(*) FROM e) AS n_edges,
                (SELECT count(*) FROM e x
                    JOIN e y ON x.v = y.u
                    JOIN e z ON z.u = x.u AND z.v = y.v) AS n_triangles
        """,
        "docs_inverted_index": """
            WITH tok AS (
                SELECT doc_id, unnest(string_split(text, ' ')) AS term
                FROM documents),
            tf AS (
                SELECT doc_id, term, count(*) AS tf
                FROM tok GROUP BY doc_id, term)
            SELECT term, count(*) AS df, CAST(sum(tf) AS BIGINT) AS tf_total,
                   array_to_string(
                       (list(doc_id ORDER BY doc_id))[1:10], ',')
                       AS postings_head
            FROM tf GROUP BY term
        """,
        # Naive Bayes quality classifier: bit-exact integer micro-nat
        # scores (round(ln(ratio)*1e6) per term, integer occurrence
        # sums) — the same fixed-point discipline that makes the
        # kmeans/PageRank oracles exact. Label = planted rule
        # count('data') > count('spark') (token equality).
        "docs_nb_quality": """
            WITH tok AS (
                SELECT doc_id, unnest(string_split(text, ' ')) AS term
                FROM documents),
            lab AS (
                SELECT d.doc_id,
                       CASE WHEN coalesce(sum(CASE WHEN t.term = 'data'
                                               THEN 1 END), 0)
                             > coalesce(sum(CASE WHEN t.term = 'spark'
                                             THEN 1 END), 0)
                            THEN 1 ELSE -1 END AS y
                FROM documents d LEFT JOIN tok t ON d.doc_id = t.doc_id
                GROUP BY d.doc_id),
            cls AS (
                SELECT t.term,
                       sum(CASE WHEN l.y = 1 THEN 1 ELSE 0 END) AS n_pos,
                       sum(CASE WHEN l.y = -1 THEN 1 ELSE 0 END) AS n_neg
                FROM tok t JOIN lab l USING (doc_id) GROUP BY t.term),
            tot AS (
                SELECT (SELECT coalesce(sum(n_pos), 0) FROM cls) AS np,
                       (SELECT coalesce(sum(n_neg), 0) FROM cls) AS nn,
                       (SELECT count(*) FROM cls) AS v,
                       (SELECT count(*) FROM lab WHERE y = 1) AS dp,
                       (SELECT count(*) FROM lab WHERE y = -1) AS dn),
            w AS (
                SELECT term,
                       CAST(round(ln((n_pos + 1) * (tot.nn + tot.v) * 1.0
                                     / ((n_neg + 1) * (tot.np + tot.v)))
                                  * 1000000) AS BIGINT) AS lr
                FROM cls CROSS JOIN tot),
            prior AS (
                SELECT CAST(round(ln(dp * 1.0 / dn) * 1000000) AS BIGINT)
                       AS pr FROM tot),
            sc AS (
                SELECT t.doc_id, sum(w.lr) + any_value(prior.pr) AS score
                FROM tok t JOIN w USING (term) CROSS JOIN prior
                GROUP BY t.doc_id)
            SELECT l.doc_id, CAST(l.y AS BIGINT) AS label,
                   CAST(sc.score AS BIGINT) AS score,
                   CAST(CASE WHEN sc.score > 0 THEN 1 ELSE -1 END
                        AS BIGINT) AS pred
            FROM lab l JOIN sc USING (doc_id)
        """,
        "docs_ccnet_buckets": """
            WITH tok AS (
                SELECT doc_id, unnest(string_split(text, ' ')) AS term
                FROM documents
            ), tc AS (
                SELECT term, count(*) AS tc FROM tok GROUP BY term
            ), tot AS (SELECT count(*) AS total FROM tok),
            scores AS (
                SELECT doc_id,
                       round(avg(ln(tc.tc * 1.0 / tot.total)), 6)
                           AS mean_logprob
                FROM tok JOIN tc USING (term) CROSS JOIN tot
                GROUP BY doc_id),
            tiles AS (
                SELECT doc_id, mean_logprob,
                       ntile(3) OVER (ORDER BY mean_logprob DESC,
                                      doc_id) AS t
                FROM scores)
            SELECT doc_id, mean_logprob,
                   CASE t WHEN 1 THEN 'head' WHEN 2 THEN 'middle'
                          ELSE 'tail' END AS bucket
            FROM tiles
        """,
        # C4 cleaning: the oracle REBUILDS the deterministic multi-line
        # pages (5-token lines + closed-form suffix/poison plants from
        # (doc_id, line idx) — see text._c4_synth_pages) and applies the
        # same line/page rules, so parity pins the full rule chain:
        # terminal-punct regex, word-count floor, javascript drop,
        # >=3-kept-lines page gate, lorem-ipsum/brace page poison, and
        # the kept-line newline join (via md5).
        "docs_c4_clean": """
            WITH toks AS (
                SELECT doc_id, unnest(string_split(text, ' ')) AS tok,
                       generate_subscripts(string_split(text, ' '), 1) AS i
                FROM documents),
            lines0 AS (
                SELECT doc_id, (i - 1) // 5 AS li,
                       string_agg(tok, ' ' ORDER BY i) AS line,
                       count(*) AS nw
                FROM toks GROUP BY doc_id, (i - 1) // 5),
            lines1 AS (
                SELECT doc_id, li,
                       line || CASE WHEN (doc_id + li) % 11 = 4
                                    THEN ' javascript' ELSE '' END
                            || CASE WHEN (doc_id + li) % 3 <> 2
                                    THEN '.' ELSE '' END AS line,
                       nw + CASE WHEN (doc_id + li) % 11 = 4
                                 THEN 1 ELSE 0 END AS nw
                FROM lines0),
            nl AS (SELECT doc_id, max(li) + 1 AS n0 FROM lines1
                   GROUP BY doc_id),
            extra AS (
                SELECT doc_id, n0 AS li, 'lorem ipsum.' AS line, 2 AS nw
                FROM nl WHERE doc_id % 53 = 13
                UNION ALL
                SELECT doc_id,
                       n0 + CASE WHEN doc_id % 53 = 13 THEN 1 ELSE 0 END,
                       '{ }.', 2
                FROM nl WHERE doc_id % 47 = 11),
            alllines AS (SELECT * FROM lines1 UNION ALL SELECT * FROM extra),
            flags AS (
                SELECT doc_id, li, line, nw,
                       (regexp_matches(line, '[.!?"]$') AND nw >= 5
                        AND NOT contains(lower(line), 'javascript')) AS kept
                FROM alllines),
            agg AS (
                SELECT doc_id, count(*) AS n_lines,
                       count(*) FILTER (WHERE kept) AS n_kept,
                       md5(string_agg(line, chr(10) ORDER BY li)
                           FILTER (WHERE kept)) AS clean_md5,
                       bool_or(contains(lower(line), 'lorem ipsum')) AS lor,
                       bool_or(contains(line, '{')) AS brc
                FROM flags GROUP BY doc_id)
            SELECT doc_id, n_lines, n_kept, clean_md5
            FROM agg WHERE n_kept >= 3 AND NOT lor AND NOT brc
        """,
        "docs_pii_redact": r"""
            WITH planted AS (
                SELECT doc_id,
                       CASE WHEN doc_id % 8 = 0 THEN text ||
                            ' contact alice.smith+hr@example-corp.com or 415-555-2671 ssn 123-45-6789'
                            ELSE text END AS text
                FROM documents
            )
            SELECT doc_id,
                   regexp_replace(regexp_replace(regexp_replace(text,
                       '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}',
                       '<EMAIL>', 'g'),
                       '\b\d{3}-\d{2}-\d{4}\b', '<SSN>', 'g'),
                       '\b\d{3}-\d{3}-\d{4}\b', '<PHONE>', 'g') AS clean_text,
                   len(regexp_extract_all(text,
                       '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}'))
                   + len(regexp_extract_all(text, '\b\d{3}-\d{2}-\d{4}\b'))
                   + len(regexp_extract_all(text, '\b\d{3}-\d{3}-\d{4}\b'))
                       AS n_pii
            FROM planted
        """,
        "q7_nation_volume": """
            SELECT n1.n_name AS supp_nation, n2.n_name AS cust_nation,
                   CAST(year(l_shipdate) AS BIGINT) AS l_year,
                   round(sum(round(l_extendedprice * (1 - l_discount)
                                   * 100)) / 100.0, 2) AS revenue
            FROM lineitem
            JOIN supplier ON l_suppkey = s_suppkey
            JOIN orders   ON l_orderkey = o_orderkey
            JOIN customer ON o_custkey = c_custkey
            JOIN nation n1 ON s_nationkey = n1.n_nationkey
            JOIN nation n2 ON c_nationkey = n2.n_nationkey
            WHERE n1.n_name IN ('NATION_3', 'NATION_8')
              AND n2.n_name IN ('NATION_3', 'NATION_8')
              AND n1.n_name <> n2.n_name
              AND l_shipdate >= TIMESTAMP '1996-01-01'
              AND l_shipdate <  TIMESTAMP '1998-01-01'
            GROUP BY 1, 2, 3
            ORDER BY 1, 2, 3
        """,
        "docs_regex_tokens": r"""
            SELECT doc_id,
                   len(regexp_extract_all(text,
                       '''(?:s|t|re|ve|m|ll|d)| ?\p{L}+| ?\p{N}+| ?[^\s\p{L}\p{N}]+|\s+'))
                       AS n_pretokens
            FROM documents
        """,
        "docs_dup_spans": """
            WITH toks AS (SELECT doc_id, string_split(text, ' ') AS ts
                          FROM documents),
            grams AS (
                SELECT doc_id, array_to_string(ts[i:i+7], ' ') AS gram
                FROM toks,
                     LATERAL (SELECT unnest(range(1, len(ts) - 6)) AS i) r
            ),
            agg AS (
                SELECT gram, count(DISTINCT doc_id) AS n_docs,
                       count(*) AS n_occ
                FROM grams GROUP BY gram
                HAVING count(DISTINCT doc_id) >= 2
            )
            SELECT gram, n_docs, n_occ FROM agg
            ORDER BY n_docs DESC, n_occ DESC, gram LIMIT 50
        """,
        "docs_dup_span_frac": """
            WITH toks AS (SELECT doc_id, string_split(text, ' ') AS ts
                          FROM documents),
            grams AS (
                SELECT doc_id, i, array_to_string(ts[i:i+7], ' ') AS gram
                FROM toks,
                     LATERAL (SELECT unnest(range(1, len(ts) - 6)) AS i) r
            ),
            dup AS (SELECT gram FROM grams GROUP BY gram
                    HAVING count(DISTINCT doc_id) >= 2),
            cov AS (SELECT doc_id, count(DISTINCT p) AS c
                    FROM grams JOIN dup USING (gram),
                         LATERAL (SELECT unnest(range(i, i + 8)) AS p) rr
                    GROUP BY doc_id),
            base AS (SELECT doc_id, len(ts) AS n_tokens FROM toks)
            SELECT b.doc_id, b.n_tokens,
                   round(COALESCE(c, 0) * 1.0 / b.n_tokens, 6) AS dup_frac
            FROM base b LEFT JOIN cov USING (doc_id)
        """,
        "docs_remove_dup_spans": """
            WITH toks AS (SELECT doc_id, string_split(text, ' ') AS ts
                          FROM documents),
            grams AS (
                SELECT doc_id, i, array_to_string(ts[i:i+7], ' ') AS gram
                FROM toks,
                     LATERAL (SELECT unnest(range(1, len(ts) - 6)) AS i) r
            ),
            dup AS (SELECT gram FROM grams GROUP BY gram
                    HAVING count(DISTINCT doc_id) >= 2),
            cov AS (SELECT DISTINCT g.doc_id, p
                    FROM grams g JOIN dup USING (gram),
                         LATERAL (SELECT unnest(range(i, i + 8)) AS p) rr),
            tok AS (SELECT doc_id, t.i AS p, ts[t.i] AS w
                    FROM toks,
                         LATERAL (SELECT unnest(range(1, len(ts) + 1))
                                  AS i) t(i)),
            kept AS (SELECT tok.doc_id, tok.p, tok.w FROM tok
                     LEFT JOIN cov ON cov.doc_id = tok.doc_id
                                  AND cov.p = tok.p
                     WHERE cov.p IS NULL)
            SELECT d.doc_id,
                   COALESCE(string_agg(k.w, ' ' ORDER BY k.p), '')
                       AS text_clean,
                   CAST(count(k.p) AS BIGINT) AS n_kept
            FROM documents d LEFT JOIN kept k USING (doc_id)
            GROUP BY d.doc_id
        """,
        "docs_clean_corpus": """
            WITH win AS (SELECT min(doc_id) AS doc_id
                         FROM documents GROUP BY md5(text)),
            kept AS (SELECT d.doc_id, d.text
                     FROM documents d JOIN win USING (doc_id)),
            toks AS (SELECT doc_id, string_split(text, ' ') AS ts
                     FROM kept),
            grams AS (
                SELECT doc_id, i, array_to_string(ts[i:i+7], ' ') AS gram
                FROM toks,
                     LATERAL (SELECT unnest(range(1, len(ts) - 6)) AS i) r
            ),
            dup AS (SELECT gram FROM grams GROUP BY gram
                    HAVING count(DISTINCT doc_id) >= 2),
            cov AS (SELECT DISTINCT g.doc_id, p
                    FROM grams g JOIN dup USING (gram),
                         LATERAL (SELECT unnest(range(i, i + 8)) AS p) rr),
            tok AS (SELECT doc_id, t.i AS p, ts[t.i] AS w
                    FROM toks,
                         LATERAL (SELECT unnest(range(1, len(ts) + 1))
                                  AS i) t(i)),
            keptok AS (SELECT tok.doc_id, tok.p, tok.w FROM tok
                       LEFT JOIN cov ON cov.doc_id = tok.doc_id
                                    AND cov.p = tok.p
                       WHERE cov.p IS NULL),
            clean AS (SELECT k.doc_id,
                             COALESCE(string_agg(t.w, ' ' ORDER BY t.p),
                                      '') AS text_clean,
                             CAST(count(t.p) AS BIGINT) AS n_kept
                      FROM kept k LEFT JOIN keptok t USING (doc_id)
                      GROUP BY k.doc_id),
            scored AS (SELECT doc_id, n_kept,
                              round(50.0 *
                                    (len(list_distinct(
                                        string_split(text_clean, ' ')))
                                     * 1.0
                                     / len(string_split(text_clean, ' ')))
                                    + 5.0 * least(
                                        (length(text_clean)
                                         - (len(string_split(text_clean,
                                                             ' ')) - 1))
                                        * 1.0
                                        / len(string_split(text_clean,
                                                           ' ')),
                                        10.0), 6) AS quality_score,
                              text_clean
                       FROM clean)
            SELECT doc_id, n_kept, quality_score, text_clean
            FROM scored
            WHERE n_kept >= 20 AND quality_score >= 40.0
        """,
        "q9_product_profit": """
            SELECT n_name AS nation,
                   CAST(year(o_orderdate) AS BIGINT) AS o_year,
                   round(sum(round(l_extendedprice * (1 - l_discount)
                                   * 10000)
                             - round(p_retailprice * 100)
                               * CAST(l_quantity AS BIGINT) * 10)
                         / 10000.0, 2) AS profit
            FROM lineitem
            JOIN orders ON o_orderkey = l_orderkey
            JOIN part ON p_partkey = l_partkey
            JOIN supplier ON s_suppkey = l_suppkey
            JOIN nation ON n_nationkey = s_nationkey
            WHERE p_name LIKE '%widget%'
            GROUP BY 1, 2
            ORDER BY 1, 2 DESC
        """,
        "q16_supplier_variety": """
            SELECT p_brand, p_type, CAST(p_size AS BIGINT) AS p_size,
                   count(DISTINCT l_suppkey) AS supplier_cnt
            FROM lineitem JOIN part ON p_partkey = l_partkey
            WHERE p_brand <> 'Brand#13' AND p_type <> 'PROMO'
              AND p_size IN (1, 4, 9, 14, 19, 24, 29)
              AND l_suppkey % 10 <> 7
            GROUP BY 1, 2, 3
            ORDER BY supplier_cnt DESC, p_brand, p_type, p_size
        """,
        "q20_excess_shipments": """
            SELECT s_name FROM supplier
            WHERE s_suppkey IN (
                SELECT l_suppkey
                FROM lineitem JOIN part ON p_partkey = l_partkey
                WHERE p_name LIKE '%widget%'
                  AND l_shipdate >= TIMESTAMP '1995-01-01'
                  AND l_shipdate <  TIMESTAMP '1996-01-01'
                GROUP BY l_suppkey
                HAVING sum(round(l_quantity * 100)) > 30000)
            ORDER BY s_name
        """,
        "q11_important_parts": """
            WITH v AS (
                SELECT l_partkey,
                       sum(round(l_extendedprice * (1 - l_discount)
                                 * 10000)) AS val_e4
                FROM lineitem
                JOIN supplier ON s_suppkey = l_suppkey
                JOIN nation ON n_nationkey = s_nationkey
                WHERE n_name = 'NATION_3'
                GROUP BY 1)
            SELECT l_partkey AS p_partkey,
                   round(val_e4 / 10000.0, 2) AS part_value
            FROM v
            WHERE val_e4 > (SELECT sum(val_e4) FROM v) * 0.001
            ORDER BY part_value DESC, p_partkey
        """,
        "events_late_arrivals": """
            WITH w AS (
                SELECT event_id, user_id, ts,
                       max(ts) OVER (PARTITION BY user_id
                                     ORDER BY event_id % 7, event_id
                                     ROWS BETWEEN UNBOUNDED PRECEDING
                                     AND 1 PRECEDING) AS prev_max
                FROM events)
            SELECT event_id, user_id,
                   date_diff('microsecond', ts, prev_max) - 300000000
                       AS late_by_us
            FROM w
            WHERE prev_max IS NOT NULL
              AND date_diff('microsecond', ts, prev_max) > 300000000
        """,
        "docs_bigram_logprob": """
            WITH toks AS (SELECT doc_id, string_split(text, ' ') AS ts
                          FROM documents),
            big AS (SELECT doc_id, ts[i] AS w1, ts[i+1] AS w2
                    FROM toks,
                         LATERAL (SELECT unnest(range(1, len(ts)))
                                  AS i) r),
            bc AS (SELECT w1, w2, count(*) AS n FROM big GROUP BY 1, 2),
            pfx AS (SELECT w1, sum(n) AS pn FROM bc GROUP BY 1),
            scored AS (SELECT b.doc_id, ln(bc.n * 1.0 / pfx.pn) AS lp
                       FROM big b
                       JOIN bc ON bc.w1 = b.w1 AND bc.w2 = b.w2
                       JOIN pfx ON pfx.w1 = b.w1)
            SELECT d.doc_id,
                   round(COALESCE(avg(lp), 0.0), 6) AS mean_logprob,
                   CAST(count(lp) AS BIGINT) AS n_bigrams
            FROM documents d LEFT JOIN scored s USING (doc_id)
            GROUP BY d.doc_id
        """,
        "docs_weighted_sample": """
            SELECT doc_id, n_chars FROM (
                SELECT doc_id, n_chars,
                       ln(CAST(('0x' || substr(md5(CAST(doc_id AS
                           VARCHAR)), 1, 12)) AS BIGINT)
                          / 281474976710656.0)
                       / greatest(n_chars, 1) AS key
                FROM documents)
            ORDER BY key DESC, doc_id LIMIT 100
        """,
        "emb_norms": """
            SELECT vec_id,
                   round(sqrt(list_sum(list_transform(embedding,
                       x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE)))), 6)
                       AS l2_norm
            FROM embeddings
        """,
        "emb_label_centroids": """
            SELECT CAST(label AS BIGINT) AS label, dim,
                   round(avg(v), 6) AS centroid
            FROM (
                SELECT label,
                       CAST(generate_subscripts(embedding, 1) AS BIGINT)
                           AS dim,
                       CAST(unnest(embedding) AS DOUBLE) AS v
                FROM embeddings
            ) GROUP BY 1, 2 ORDER BY 1, 2
        """,
        "q2_best_supplier": """
            WITH shipped AS (
                SELECT DISTINCT l_partkey, l_suppkey FROM lineitem
            ), cand AS (
                SELECT p_partkey, s_suppkey, s_name, s_acctbal
                FROM shipped
                JOIN part     ON l_partkey = p_partkey
                JOIN supplier ON l_suppkey = s_suppkey
                JOIN nation   ON s_nationkey = n_nationkey
                JOIN region   ON n_regionkey = r_regionkey
                WHERE r_name = 'EUROPE' AND p_size <= 10
            )
            SELECT p_partkey, s_suppkey, s_name, s_acctbal FROM (
                SELECT *, row_number() OVER (
                    PARTITION BY p_partkey
                    ORDER BY s_acctbal DESC, s_suppkey) AS rn
                FROM cand
            ) WHERE rn = 1 ORDER BY p_partkey
        """,
        "q21_sole_blame": """
            WITH l AS (
                SELECT l_orderkey, l_suppkey, l_returnflag
                FROM lineitem JOIN orders ON l_orderkey = o_orderkey
                WHERE o_orderstatus = 'F'
            ), per AS (
                SELECT l_orderkey, count(DISTINCT l_suppkey) AS ns
                FROM l GROUP BY 1
            ), ret AS (
                SELECT l_orderkey, count(DISTINCT l_suppkey) AS nr,
                       min(l_suppkey) AS culprit
                FROM l WHERE l_returnflag = 'R' GROUP BY 1
            )
            SELECT s_suppkey, s_name, count(*) AS n_orders
            FROM per JOIN ret USING (l_orderkey)
            JOIN supplier ON culprit = s_suppkey
            WHERE ns >= 2 AND nr = 1
            GROUP BY 1, 2
            ORDER BY n_orders DESC, s_suppkey
            LIMIT 25
        """,
        "q8_market_share": """
            WITH base AS (
                SELECT year(o_orderdate) AS o_year,
                       round(l_extendedprice * (1 - l_discount) * 10000)
                           AS e4,
                       CASE WHEN n2.n_name = 'NATION_7' THEN 1 ELSE 0 END
                           AS is_nat
                FROM lineitem
                JOIN part     ON l_partkey = p_partkey
                JOIN supplier ON l_suppkey = s_suppkey
                JOIN nation n2 ON s_nationkey = n2.n_nationkey
                JOIN orders   ON l_orderkey = o_orderkey
                JOIN customer ON o_custkey = c_custkey
                JOIN nation n1 ON c_nationkey = n1.n_nationkey
                JOIN region   ON n1.n_regionkey = r_regionkey
                WHERE r_name = 'ASIA' AND p_type = 'STANDARD'
                  AND o_orderdate >= TIMESTAMP '1996-01-01'
                  AND o_orderdate <  TIMESTAMP '1998-01-01'
            )
            SELECT CAST(o_year AS BIGINT) AS o_year,
                   round(sum(e4 * is_nat) / sum(e4), 6) AS mkt_share
            FROM base GROUP BY o_year ORDER BY o_year
        """,
        "q15_top_supplier": """
            WITH rev AS (
                SELECT l_suppkey,
                       sum(round(l_extendedprice * (1 - l_discount) * 100))
                           AS cents
                FROM lineitem
                WHERE l_shipdate >= TIMESTAMP '1996-01-01'
                  AND l_shipdate <  TIMESTAMP '1996-04-01'
                GROUP BY l_suppkey
            )
            SELECT s_suppkey, s_name,
                   round(cents / 100.0, 2) AS total_revenue
            FROM rev JOIN supplier ON l_suppkey = s_suppkey
            WHERE cents = (SELECT max(cents) FROM rev)
            ORDER BY s_suppkey
        """,
        # dedup_lines twin: split on \n, winner per duplicated line is
        # the min (id, zfill(idx,8)) string key (exactly the engine's
        # polars concat_str key), docs with every line stripped keep ''.
        "docs_line_dedup": """
            WITH ls AS (
                SELECT doc_id, string_split(text, chr(10)) AS arr
                FROM documents),
            ex AS (
                SELECT doc_id,
                       unnest(arr) AS l,
                       CAST(generate_subscripts(arr, 1) AS BIGINT) - 1 AS i
                FROM ls),
            k AS (
                SELECT doc_id, l, i,
                       doc_id::VARCHAR || chr(0)
                           || lpad(i::VARCHAR, 8, '0') AS key
                FROM ex),
            agg AS (SELECT l, min(key) AS win, count(*) AS n
                    FROM k GROUP BY 1),
            keep AS (
                SELECT k.doc_id, k.i, k.l
                FROM k JOIN agg USING (l)
                WHERE agg.n = 1 OR agg.win = k.key)
            SELECT d.doc_id, COALESCE(j.t, '') AS text
            FROM documents d
            LEFT JOIN (SELECT doc_id,
                              string_agg(l, chr(10) ORDER BY i) AS t
                       FROM keep GROUP BY 1) j USING (doc_id)
        """,
        # DSIR twin: per-term filtered counts give the target (lang='en')
        # and raw models; add-one smoothing over the shared vocabulary V;
        # per-doc weight = sum of per-token-instance ln ratios, rounded
        # half-away 6 (round_ha twin); deterministic (weight, doc_id)
        # top-100
        "docs_dsir_topk": """
            WITH tok AS (
                SELECT doc_id, lang,
                       unnest(string_split(text, ' ')) AS term
                FROM documents
            ), tc AS (
                SELECT term,
                       count(*) FILTER (WHERE lang = 'en') AS n_tgt,
                       count(*) AS n_all
                FROM tok GROUP BY term
            ), tot AS (
                SELECT sum(n_tgt) AS total_tgt, sum(n_all) AS total_all,
                       count(*) AS v
                FROM tc
            ), lr AS (
                SELECT term,
                       ln((n_tgt + 1.0) / (total_tgt + v))
                       - ln((n_all + 1.0) / (total_all + v)) AS lr
                FROM tc CROSS JOIN tot
            )
            SELECT doc_id, round(sum(lr), 6) AS dsir_weight
            FROM tok JOIN lr USING (term)
            GROUP BY doc_id
            ORDER BY dsir_weight DESC, doc_id
            LIMIT 100
        """,

        # temperature-mix twin: quota = max(1, floor(0.5 * c^0.7)) per
        # source — deliberately no cross-source normalizing sum (a sum
        # of pow() doubles is summation-order-dependent across engines)
        "docs_temperature_mix": """
            SELECT doc_id, source FROM (
                SELECT doc_id, source,
                       row_number() OVER (PARTITION BY source
                                          ORDER BY md5(text), doc_id)
                           AS rn,
                       count(*) OVER (PARTITION BY source) AS c
                FROM documents)
            WHERE rn <= greatest(1, floor(0.5 * pow(c, 0.7)))
        """,
        # BM25 twin: the query is the 3 globally most frequent terms
        # (tf desc, term asc) so both engines derive it identically;
        # (1.2 + 1.0) is spelled as a SUM, not 2.2 — the literal 2.2
        # is a DIFFERENT double than 1.2 + 1.0; per-doc 3-term float
        # sum order absorbed by round-half-away 6
        "docs_bm25_topk": """
            WITH tok AS (
                SELECT doc_id, unnest(string_split(text, ' ')) AS term
                FROM documents
            ), tstats AS (
                SELECT term, count(*) AS tf,
                       count(DISTINCT doc_id) AS df
                FROM tok GROUP BY term
            ), q AS (
                SELECT term, df FROM tstats
                ORDER BY tf DESC, term ASC LIMIT 3
            ), scal AS (
                SELECT (SELECT count(*) FROM documents) AS n_docs,
                       (SELECT count(*) FROM tok) AS n_toks
            ), lens AS (
                SELECT doc_id, count(*) AS len FROM tok GROUP BY doc_id
            ), tfq AS (
                SELECT t.doc_id, t.term, count(*) AS tf
                FROM tok t JOIN q USING (term)
                GROUP BY t.doc_id, t.term
            ), scored AS (
                SELECT l.doc_id,
                       round(coalesce(sum(
                           ln(1.0 + (s.n_docs - q.df + 0.5)
                                    / (q.df + 0.5))
                           * tfq.tf * (1.2 + 1.0)
                           / (tfq.tf + 1.2 * (1.0 - 0.75
                              + 0.75 * l.len
                                / (s.n_toks * 1.0 / s.n_docs)))),
                           0.0), 6) AS bm25
                FROM lens l CROSS JOIN scal s
                LEFT JOIN tfq ON tfq.doc_id = l.doc_id
                LEFT JOIN q ON q.term = tfq.term
                GROUP BY l.doc_id
            )
            SELECT doc_id, bm25 FROM scored
            ORDER BY bm25 DESC, doc_id LIMIT 20
        """,
        # normalize twin: the whitespace class is spelled out because
        # regex engines disagree on \s unicode semantics; trim only
        # spaces (tabs etc already collapsed into spaces)
        "docs_normalize_text": """
            WITH norm AS (
                SELECT doc_id, text,
                       trim(regexp_replace(nfc_normalize(text),
                                           '[ \t\n\r\f]+', ' ', 'g'),
                            ' ') AS t
                FROM documents
            )
            SELECT doc_id, md5(t) AS norm_md5, (t <> text) AS changed
            FROM norm
        """,
        # Gopher twin: word stats via unnest over the single-space
        # split (engine's split_pattern twin); symbol count by
        # replace-length arithmetic (non-overlapping, matching
        # pc.count_substring); the pass flag compares ROUNDED values
        "docs_gopher_quality": """
            WITH tok AS (
                SELECT doc_id, unnest(string_split(text, ' ')) AS w
                FROM documents
            ), agg AS (
                SELECT doc_id, count(*) AS n_words,
                       round(avg(length(w)), 6) AS mean_word_len,
                       round(avg(CASE WHEN regexp_matches(w, '[A-Za-z]')
                                 THEN 1.0 ELSE 0.0 END), 6) AS frac_alpha
                FROM tok GROUP BY doc_id
            ), sym AS (
                SELECT doc_id,
                       (length(text) - length(replace(text, '#', '')))
                       + (length(text)
                          - length(replace(text, '...', ''))) / 3 AS n_sym
                FROM documents
            )
            SELECT a.doc_id, a.n_words, a.mean_word_len, a.frac_alpha,
                   round(s.n_sym * 1.0 / a.n_words, 6) AS symbol_ratio,
                   (a.mean_word_len BETWEEN 3.0 AND 10.0
                    AND a.frac_alpha >= 0.8
                    AND round(s.n_sym * 1.0 / a.n_words, 6) <= 0.1
                    AND a.n_words >= 10) AS gopher_pass
            FROM agg a JOIN sym s USING (doc_id)
        """,
        # pack_sequences twin: greedy first-fit per shard (doc_id % 64)
        # in doc_id order, unrolled as a recursive CTE that advances all
        # shards one row per step. A doc joins the open sequence iff
        # fill + n_tokens <= budget; the first doc of a sequence always
        # joins (oversize doc => its own sequence) — exactly
        # packing.greedy_pack's searchsorted recurrence. budget=256,
        # token count = single-space split length (split_pattern twin).
        "docs_pack_sequences": """
            WITH RECURSIVE toks AS (
                SELECT doc_id, doc_id % 64 AS shard,
                       CAST(len(string_split(text, ' ')) AS BIGINT)
                           AS n_tokens
                FROM documents),
            ord AS (
                SELECT doc_id, shard, n_tokens,
                       row_number() OVER (PARTITION BY shard
                                          ORDER BY doc_id) AS rn
                FROM toks),
            pack AS (
                SELECT shard, rn, doc_id, n_tokens,
                       CAST(0 AS BIGINT) AS seq,
                       CAST(0 AS BIGINT) AS pos,
                       n_tokens AS fill
                FROM ord WHERE rn = 1
                UNION ALL
                SELECT o.shard, o.rn, o.doc_id, o.n_tokens,
                       CASE WHEN p.fill + o.n_tokens <= 256
                            THEN p.seq ELSE p.seq + 1 END,
                       CASE WHEN p.fill + o.n_tokens <= 256
                            THEN p.pos + 1 ELSE CAST(0 AS BIGINT) END,
                       CASE WHEN p.fill + o.n_tokens <= 256
                            THEN p.fill + o.n_tokens ELSE o.n_tokens END
                FROM pack p
                JOIN ord o ON o.shard = p.shard AND o.rn = p.rn + 1)
            SELECT doc_id, shard, (shard << 32) | seq AS seq_id,
                   n_tokens, pos
            FROM pack
        """,
        # sliding 7-day DISTINCT users per day: the oracle pays the
        # window's overlap factor (range join vs every event); the
        # engine unions per-user coverage intervals and scans deltas
        "events_active_users_7d": """
            WITH bounds AS (
                SELECT date_trunc('day', min(ts)) AS a,
                       date_trunc('day', max(ts)) AS b FROM events),
            spine AS (
                SELECT unnest(generate_series(a, b, INTERVAL 1 DAY))
                       AS day FROM bounds)
            SELECT s.day, count(DISTINCT e.user_id) AS wau
            FROM spine s LEFT JOIN events e
              ON e.ts >= s.day - INTERVAL 6 DAY
             AND e.ts < s.day + INTERVAL 1 DAY
            GROUP BY s.day
        """,
        # time-RANGE sliding count per minute; dense-axis ROWS window
        # over the gapfilled minute counts is the identical semantics
        "events_concurrency_15m": """
            WITH m AS (
                SELECT date_trunc('minute', ts) AS minute, count(*) AS n
                FROM events GROUP BY 1),
            bounds AS (SELECT min(minute) AS a, max(minute) AS b FROM m),
            spine AS (
                SELECT unnest(generate_series(a, b, INTERVAL 1 MINUTE))
                       AS minute FROM bounds),
            g AS (SELECT s.minute, coalesce(m.n, 0) AS n
                  FROM spine s LEFT JOIN m USING (minute))
            SELECT minute,
                   CAST(sum(n) OVER (ORDER BY minute
                        ROWS BETWEEN 14 PRECEDING AND CURRENT ROW)
                        AS BIGINT) AS n_window
            FROM g
        """,
        # MERGE INTO twin: latest-seq row_number over the unioned
        # snapshot+changelog, winning deletes drop the key
        "docs_cdc_merge": """
            WITH base AS (
                SELECT doc_id AS key, CAST(-1 AS BIGINT) AS seq,
                       FALSE AS del_, n_chars AS payload
                FROM documents WHERE doc_id % 3 <> 0),
            chg AS (
                SELECT doc_id // 4 AS key, doc_id AS seq,
                       doc_id % 3 = 1 AS del_,
                       n_chars + 1000000 AS payload
                FROM documents WHERE doc_id % 2 = 0),
            u AS (SELECT * FROM base UNION ALL SELECT * FROM chg),
            r AS (SELECT *, row_number() OVER (PARTITION BY key
                                               ORDER BY seq DESC) AS rn
                  FROM u)
            SELECT key, payload,
                   CASE WHEN seq < 0 THEN 'base'
                        ELSE 'changelog' END AS src
            FROM r WHERE rn = 1 AND NOT del_
        """,
        # SCD2: identical event derivation; valid_to = LEAD(seq) with
        # the int64-max open-end sentinel (no NULLs on either engine)
        "docs_scd2": """
            WITH base AS (
                SELECT doc_id AS key, CAST(-1 AS BIGINT) AS seq,
                       FALSE AS del_, n_chars AS payload
                FROM documents WHERE doc_id % 3 <> 0),
            chg AS (
                SELECT doc_id // 4 AS key, doc_id AS seq,
                       doc_id % 3 = 1 AS del_,
                       n_chars + 1000000 AS payload
                FROM documents WHERE doc_id % 2 = 0),
            u AS (SELECT * FROM base UNION ALL SELECT * FROM chg),
            v AS (SELECT key, seq, del_, payload,
                         coalesce(lead(seq) OVER (PARTITION BY key
                                                  ORDER BY seq),
                                  9223372036854775807) AS valid_to
                  FROM u)
            SELECT key, payload, seq AS valid_from, valid_to,
                   valid_to = 9223372036854775807 AS is_current
            FROM v WHERE NOT del_
        """,
        # time travel: same derivation filtered to seq <= asof, then
        # the MERGE winner expression
        "docs_time_travel": """
            WITH base AS (
                SELECT doc_id AS key, CAST(-1 AS BIGINT) AS seq,
                       FALSE AS del_, n_chars AS payload
                FROM documents WHERE doc_id % 3 <> 0),
            chg AS (
                SELECT doc_id // 4 AS key, doc_id AS seq,
                       doc_id % 3 = 1 AS del_,
                       n_chars + 1000000 AS payload
                FROM documents WHERE doc_id % 2 = 0),
            cut AS (SELECT max(doc_id) // 2 AS asof FROM documents),
            u AS (SELECT * FROM base UNION ALL SELECT * FROM chg),
            f AS (SELECT u.* FROM u, cut WHERE u.seq <= cut.asof),
            r AS (SELECT *, row_number() OVER (PARTITION BY key
                                               ORDER BY seq DESC) AS rn
                  FROM f)
            SELECT key, payload,
                   CASE WHEN seq < 0 THEN 'base'
                        ELSE 'changelog' END AS src
            FROM r WHERE rn = 1 AND NOT del_
        """,
        # covariance: identical integer scatter partials, identical
        # IEEE-double expression order -> bit-equal doubles, no rounding
        "emb_covariance": """
            WITH x AS MATERIALIZED (
                SELECT vec_id,
                       generate_subscripts(embedding, 1) - 1 AS dim,
                       CAST(round_even(CAST(unnest(embedding) AS DOUBLE)
                                       * 1048576.0, 0) AS BIGINT) AS q
                FROM embeddings),
            m AS MATERIALIZED (
                SELECT a.dim AS i, b.dim AS j, sum(a.q * b.q) AS sxy
                FROM x a JOIN x b USING (vec_id)
                WHERE a.dim <= b.dim
                GROUP BY 1, 2),
            sv AS MATERIALIZED (SELECT dim, sum(q) AS sq FROM x GROUP BY 1),
            nn AS (SELECT count(*) AS n FROM embeddings)
            SELECT m.i, m.j,
                   (CAST(m.sxy AS DOUBLE) / nn.n
                    - (CAST(sa.sq AS DOUBLE) / nn.n)
                      * (CAST(sb.sq AS DOUBLE) / nn.n))
                   / (1048576.0 * 1048576.0) AS cov
            FROM m CROSS JOIN nn
            JOIN sv sa ON sa.dim = m.i
            JOIN sv sb ON sb.dim = m.j
        """,
        "emb_pca_power": _pca_oracle(),
        # PMI: identical pinned-double expression + round_even micro-nats
        "docs_term_pmi": """
            WITH w AS (SELECT string_split(text, ' ') AS w FROM documents),
            bg AS MATERIALIZED (
                SELECT bigram, count(*) AS n_ab FROM (
                    SELECT unnest(list_transform(range(1, len(w)),
                                  i -> w[i] || ' ' || w[i+1])) AS bigram
                    FROM w)
                GROUP BY bigram),
            tc AS MATERIALIZED (
                SELECT term, count(*) AS n FROM (
                    SELECT unnest(w) AS term FROM w) GROUP BY term),
            tot AS (SELECT (SELECT CAST(sum(n) AS DOUBLE) FROM tc) AS n1,
                           (SELECT CAST(sum(n_ab) AS DOUBLE) FROM bg) AS n2)
            SELECT b.bigram, b.n_ab,
                   CAST(round_even(
                        ln((CAST(b.n_ab AS DOUBLE) * tot.n1 * tot.n1)
                           / (tot.n2 * CAST(ta.n AS DOUBLE)
                              * CAST(tb.n AS DOUBLE)))
                        * 1000000.0, 0) AS BIGINT) AS pmi_micro
            FROM bg b CROSS JOIN tot
            JOIN tc ta ON ta.term = string_split(b.bigram, ' ')[1]
            JOIN tc tb ON tb.term = string_split(b.bigram, ' ')[2]
            WHERE b.n_ab >= 5
            ORDER BY pmi_micro DESC, bigram LIMIT 25
        """,
        # skyline: window staircase (strictly-cheaper running max via
        # RANGE ... EXCLUDE GROUP) — the declarative NOT-EXISTS
        # dominance spec is quadratic (104 s at sf0.01), so it lives in
        # tests/test_skyline.py where it equivalence-pins this SQL
        "lineitem_skyline": """
            WITH w AS (
                SELECT l_orderkey, l_linenumber, l_extendedprice,
                       l_discount,
                       max(l_discount) OVER (ORDER BY l_extendedprice
                           RANGE BETWEEN UNBOUNDED PRECEDING
                                     AND CURRENT ROW
                           EXCLUDE GROUP) AS cheaper_max,
                       max(l_discount) OVER (
                           PARTITION BY l_extendedprice) AS level_max
                FROM lineitem)
            SELECT l_orderkey, l_linenumber, l_extendedprice, l_discount
            FROM w WHERE l_discount = level_max
              AND (cheaper_max IS NULL OR l_discount > cheaper_max)
        """,
        # BFS: recursive CTE over the identical co-order edge
        # derivation; UNION dedups (n, hop) states, min(hop) finishes
        "parts_bfs_hops": """
            WITH RECURSIVE
            e1 AS MATERIALIZED (
                SELECT DISTINCT a.l_partkey AS u, b.l_partkey AS v
                FROM lineitem a JOIN lineitem b
                  ON a.l_orderkey = b.l_orderkey
                 AND a.l_partkey < b.l_partkey),
            e AS MATERIALIZED (
                SELECT u, v FROM e1 UNION ALL SELECT v, u FROM e1),
            bfs(n, hop) AS (
                SELECT DISTINCT u, CAST(0 AS BIGINT) FROM e
                WHERE u % 97 = 0
                UNION
                SELECT e.v, bfs.hop + 1 FROM bfs JOIN e ON e.u = bfs.n
                WHERE bfs.hop < 3)
            SELECT n AS node, CAST(min(hop) AS BIGINT) AS hops
            FROM bfs GROUP BY n
        """,
        # exact cosine-threshold set-similarity join: declarative
        # all-shared-token pairs + the integer predicate
        # tq^2*ov^2 >= tp^2*na*nb (t = 19/20, bit-free of doubles)
        "docs_cosine_simjoin": """
            WITH tok AS (SELECT DISTINCT doc_id,
                                unnest(string_split(text, ' ')) AS w
                         FROM documents),
            sz AS (SELECT doc_id, count(*) AS n FROM tok
                   GROUP BY doc_id),
            ov AS (SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
                          count(*) AS overlap
                   FROM tok a JOIN tok b
                     ON a.w = b.w AND a.doc_id < b.doc_id
                   GROUP BY a.doc_id, b.doc_id)
            SELECT ov.doc_a, ov.doc_b, ov.overlap,
                   sa.n AS na, sb.n AS nb
            FROM ov JOIN sz sa ON sa.doc_id = ov.doc_a
                    JOIN sz sb ON sb.doc_id = ov.doc_b
            WHERE 400 * ov.overlap * ov.overlap >= 361 * sa.n * sb.n
        """,
        # winsorize: clamp copies stored doubles (no arithmetic), so
        # values hash-exactly; quantile_disc = sorted[ceil(q*n)-1]
        "events_winsorized": """
            WITH b AS (SELECT event_type,
                              quantile_disc(value, 0.1) AS lo,
                              quantile_disc(value, 0.9) AS hi
                       FROM events GROUP BY event_type)
            SELECT e.event_id, e.event_type,
                   CASE WHEN e.value < b.lo THEN b.lo
                        WHEN e.value > b.hi THEN b.hi
                        ELSE e.value END AS value_w
            FROM events e JOIN b USING (event_type)
        """,
        # temporal join: probe BETWEEN the SCD2 validity interval
        # (versions disjoint per key -> at most one match per probe)
        "events_temporal_join": """
            WITH base AS (
                SELECT doc_id AS key, CAST(-1 AS BIGINT) AS seq,
                       FALSE AS del_, n_chars AS payload
                FROM documents WHERE doc_id % 3 <> 0),
            chg AS (
                SELECT doc_id // 4 AS key, doc_id AS seq,
                       doc_id % 3 = 1 AS del_,
                       n_chars + 1000000 AS payload
                FROM documents WHERE doc_id % 2 = 0),
            u AS (SELECT * FROM base UNION ALL SELECT * FROM chg),
            v AS (SELECT key, seq, del_, payload,
                         coalesce(lead(seq) OVER (PARTITION BY key
                                                  ORDER BY seq),
                                  9223372036854775807) AS valid_to
                  FROM u),
            scd AS (SELECT key, payload, seq AS valid_from, valid_to
                    FROM v WHERE NOT del_),
            p AS (SELECT event_id, user_id % 500 AS key,
                         event_id % 600 AS seq
                  FROM events)
            SELECT p.event_id, p.key, p.seq, s.payload
            FROM p JOIN scd s ON s.key = p.key
             AND p.seq >= s.valid_from AND p.seq < s.valid_to
        """,
        "events_audience_overlap": """
            WITH ut AS (SELECT DISTINCT user_id, event_type FROM events)
            SELECT a.event_type AS type_a, b.event_type AS type_b,
                   count(*) AS n_users
            FROM ut a JOIN ut b ON a.user_id = b.user_id
             AND a.event_type < b.event_type
            GROUP BY 1, 2
        """,
        # golden record: the jaccard-clusters transitive closure +
        # one survivorship rule per attribute (singletons = own id)
        "docs_golden_record": """
            WITH RECURSIVE t AS (
                SELECT doc_id,
                       list_distinct(string_split(text, ' ')) AS toks
                FROM documents
            ), pairs AS (
                SELECT a.doc_id AS pa, b.doc_id AS pb
                FROM t a JOIN t b ON a.doc_id < b.doc_id
                WHERE round(len(list_intersect(a.toks, b.toks)) * 1.0 /
                            (len(a.toks) + len(b.toks)
                             - len(list_intersect(a.toks, b.toks))), 6)
                      >= 0.7
            ), edges AS (
                SELECT pa AS u, pb AS v FROM pairs
                UNION SELECT pb, pa FROM pairs
            ), reach AS (
                SELECT u AS src, u AS dst FROM edges
                UNION
                SELECT r.src, e.v FROM reach r
                JOIN edges e ON r.dst = e.u
            ), cl AS (
                SELECT src AS doc_id, min(dst) AS cluster_id
                FROM reach GROUP BY src
            ), allc AS (
                SELECT d.doc_id,
                       coalesce(cl.cluster_id, d.doc_id) AS cluster_id,
                       d.text, d.lang, d.n_chars
                FROM documents d LEFT JOIN cl USING (doc_id)
            ), g AS (
                SELECT cluster_id, count(*) AS n_members,
                       max(n_chars) AS n_chars_max
                FROM allc GROUP BY cluster_id
            ), lm AS (
                SELECT cluster_id, lang, count(*) AS c
                FROM allc GROUP BY 1, 2
            ), lmode AS (
                SELECT cluster_id, lang AS lang_mode FROM (
                    SELECT *, row_number() OVER (
                        PARTITION BY cluster_id
                        ORDER BY c DESC, lang) AS rn FROM lm)
                WHERE rn = 1
            ), tx AS (
                SELECT cluster_id, md5(text) AS text_md5 FROM (
                    SELECT allc.*, row_number() OVER (
                        PARTITION BY cluster_id
                        ORDER BY length(text) DESC, doc_id) AS rn
                    FROM allc)
                WHERE rn = 1
            )
            SELECT g.cluster_id, g.n_members, g.n_chars_max,
                   lmode.lang_mode, tx.text_md5
            FROM g JOIN lmode USING (cluster_id)
                   JOIN tx USING (cluster_id)
        """,
        "docs_vocab_growth": """
            WITH tok AS (SELECT doc_id,
                                unnest(string_split(text, ' ')) AS w
                         FROM documents),
            f AS (SELECT w, min(doc_id) AS fd FROM tok GROUP BY w)
            SELECT fd // 1 AS bucket, count(*) AS new_terms
            FROM f GROUP BY 1
        """,
        "emb_kcenter": _kcenter_oracle(),
        # windowed dedup: LAG within (user, type) + strict interval
        # compare on exact integer-microsecond timestamps
        "events_dedup_window": """
            SELECT event_id, user_id, event_type, ts FROM (
                SELECT event_id, user_id, event_type, ts,
                       lag(ts) OVER (PARTITION BY user_id, event_type
                                     ORDER BY ts, event_id) AS pts
                FROM events)
            WHERE pts IS NULL OR ts - pts > INTERVAL 60 MINUTE
        """,
        "purchase_pagerank_weighted": _wpagerank_oracle(),
        # EWMA: recursive CTE unrolls the per-user chain; floor(x/4.0)
        # is exact IEEE floor division (power-of-two divisor) and
        # matches numpy's // on negatives where DuckDB's // truncates
        "events_value_ewma": """
            WITH RECURSIVE src AS (
                SELECT event_id, user_id,
                       CAST(round(value * 100) AS BIGINT) AS cents,
                       row_number() OVER (PARTITION BY user_id
                                          ORDER BY ts, event_id) AS rn
                FROM events),
            r(user_id, rn, event_id, s) AS (
                SELECT user_id, rn, event_id, cents FROM src
                WHERE rn = 1
                UNION ALL
                SELECT s2.user_id, s2.rn, s2.event_id,
                       CAST(floor((s2.cents + 3 * r.s) / 4.0)
                            AS BIGINT)
                FROM r JOIN src s2 ON s2.user_id = r.user_id
                 AND s2.rn = r.rn + 1)
            SELECT event_id, s AS ewma_cents FROM r
        """,
        "emb_rank_normalize": """
            WITH x AS (SELECT vec_id, unnest(embedding) AS v,
                              generate_subscripts(embedding, 1) - 1
                                  AS dim
                       FROM embeddings)
            SELECT vec_id, dim,
                   row_number() OVER (PARTITION BY dim
                                      ORDER BY v, vec_id) - 1 AS rank
            FROM x
        """,
        "events_user_growth": """
            WITH f AS (SELECT user_id,
                              min(date_trunc('hour', ts)) AS d
                       FROM events GROUP BY user_id),
            c AS (SELECT d, count(*) AS new_users FROM f GROUP BY d)
            SELECT d AS hour, new_users,
                   CAST(sum(new_users) OVER (ORDER BY d) AS BIGINT)
                       AS cum_users
            FROM c ORDER BY hour
        """,
        # tf-weighted cosine join: integer dot/norm predicate — the
        # weighted twin of docs_cosine_simjoin's declarative spec
        "docs_cosine_simjoin_tf": """
            WITH tok AS (
                SELECT doc_id, w, count(*) AS tf FROM (
                    SELECT doc_id,
                           unnest(string_split(text, ' ')) AS w
                    FROM documents)
                GROUP BY doc_id, w),
            nrm AS (SELECT doc_id, CAST(sum(tf * tf) AS BIGINT) AS n2
                    FROM tok GROUP BY doc_id),
            d AS (SELECT a.doc_id AS da, b.doc_id AS db,
                         CAST(sum(a.tf * b.tf) AS BIGINT) AS dot
                  FROM tok a JOIN tok b
                    ON a.w = b.w AND a.doc_id < b.doc_id
                  GROUP BY 1, 2)
            SELECT da AS doc_a, db AS doc_b, dot,
                   na.n2 AS na2, nb.n2 AS nb2
            FROM d JOIN nrm na ON na.doc_id = da
                   JOIN nrm nb ON nb.doc_id = db
            WHERE 400 * dot * dot >= 361 * na.n2 * nb.n2
        """,
        "docs_source_vocab_overlap": """
            WITH st AS (SELECT DISTINCT source,
                               unnest(string_split(text, ' ')) AS w
                        FROM documents),
            v AS (SELECT source, count(*) AS n FROM st GROUP BY source)
            SELECT a.source AS source_a, b.source AS source_b,
                   count(*) AS inter, va.n AS na, vb.n AS nb
            FROM st a JOIN st b ON a.w = b.w AND a.source < b.source
            JOIN v va ON va.source = a.source
            JOIN v vb ON vb.source = b.source
            GROUP BY 1, 2, va.n, vb.n
        """,
        # Z-order: the identical bit interleave as a generated
        # shift/mask expression (bits 0..15 of each coordinate)
        "lineitem_zorder": """
            SELECT l_orderkey, l_linenumber,
                   CAST((((l_partkey >> 0) & 1) << 0) + (((l_partkey >> 1) & 1) << 2) + (((l_partkey >> 2) & 1) << 4) + (((l_partkey >> 3) & 1) << 6) + (((l_partkey >> 4) & 1) << 8) + (((l_partkey >> 5) & 1) << 10) + (((l_partkey >> 6) & 1) << 12) + (((l_partkey >> 7) & 1) << 14) + (((l_partkey >> 8) & 1) << 16) + (((l_partkey >> 9) & 1) << 18) + (((l_partkey >> 10) & 1) << 20) + (((l_partkey >> 11) & 1) << 22) + (((l_partkey >> 12) & 1) << 24) + (((l_partkey >> 13) & 1) << 26) + (((l_partkey >> 14) & 1) << 28) + (((l_partkey >> 15) & 1) << 30) + (((l_suppkey >> 0) & 1) << 1) + (((l_suppkey >> 1) & 1) << 3) + (((l_suppkey >> 2) & 1) << 5) + (((l_suppkey >> 3) & 1) << 7) + (((l_suppkey >> 4) & 1) << 9) + (((l_suppkey >> 5) & 1) << 11) + (((l_suppkey >> 6) & 1) << 13) + (((l_suppkey >> 7) & 1) << 15) + (((l_suppkey >> 8) & 1) << 17) + (((l_suppkey >> 9) & 1) << 19) + (((l_suppkey >> 10) & 1) << 21) + (((l_suppkey >> 11) & 1) << 23) + (((l_suppkey >> 12) & 1) << 25) + (((l_suppkey >> 13) & 1) << 27) + (((l_suppkey >> 14) & 1) << 29) + (((l_suppkey >> 15) & 1) << 31) AS BIGINT) AS zkey,
                   CAST(((((l_partkey >> 0) & 1) << 0) + (((l_partkey >> 1) & 1) << 2) + (((l_partkey >> 2) & 1) << 4) + (((l_partkey >> 3) & 1) << 6) + (((l_partkey >> 4) & 1) << 8) + (((l_partkey >> 5) & 1) << 10) + (((l_partkey >> 6) & 1) << 12) + (((l_partkey >> 7) & 1) << 14) + (((l_partkey >> 8) & 1) << 16) + (((l_partkey >> 9) & 1) << 18) + (((l_partkey >> 10) & 1) << 20) + (((l_partkey >> 11) & 1) << 22) + (((l_partkey >> 12) & 1) << 24) + (((l_partkey >> 13) & 1) << 26) + (((l_partkey >> 14) & 1) << 28) + (((l_partkey >> 15) & 1) << 30) + (((l_suppkey >> 0) & 1) << 1) + (((l_suppkey >> 1) & 1) << 3) + (((l_suppkey >> 2) & 1) << 5) + (((l_suppkey >> 3) & 1) << 7) + (((l_suppkey >> 4) & 1) << 9) + (((l_suppkey >> 5) & 1) << 11) + (((l_suppkey >> 6) & 1) << 13) + (((l_suppkey >> 7) & 1) << 15) + (((l_suppkey >> 8) & 1) << 17) + (((l_suppkey >> 9) & 1) << 19) + (((l_suppkey >> 10) & 1) << 21) + (((l_suppkey >> 11) & 1) << 23) + (((l_suppkey >> 12) & 1) << 25) + (((l_suppkey >> 13) & 1) << 27) + (((l_suppkey >> 14) & 1) << 29) + (((l_suppkey >> 15) & 1) << 31)) >> 28 AS BIGINT) AS zbucket
            FROM lineitem
        """,
        # Markov next-event transition matrix: LAG over the per-user
        # stream; p_micro is exact integer division (// truncates =
        # floor on the non-negative counts)
        "events_type_transitions": """
            WITH s AS (
                SELECT event_type,
                       lag(event_type) OVER (
                           PARTITION BY user_id
                           ORDER BY ts, event_id) AS prev
                FROM events),
            t AS (SELECT prev AS from_type, event_type AS to_type,
                         count(*) AS n
                  FROM s WHERE prev IS NOT NULL GROUP BY 1, 2),
            f AS (SELECT from_type, CAST(sum(n) AS BIGINT) AS n_from
                  FROM t GROUP BY 1)
            SELECT t.from_type, t.to_type, t.n, f.n_from,
                   t.n * 1000000 // f.n_from AS p_micro
            FROM t JOIN f USING (from_type)
        """,
        # zone-map build: per-file (orderkey // 256) min/max/count over
        # the prunable columns; money as exact integer cents
        "lineitem_file_stats": """
            SELECT l_orderkey // 256 AS file_id,
                   count(*) AS n_rows,
                   min(l_shipdate) AS min_ship,
                   max(l_shipdate) AS max_ship,
                   min(CAST(round(l_extendedprice * 100) AS BIGINT))
                       AS min_price_cents,
                   max(CAST(round(l_extendedprice * 100) AS BIGINT))
                       AS max_price_cents,
                   min(l_partkey) AS min_part,
                   max(l_partkey) AS max_part
            FROM lineitem GROUP BY file_id
        """,
        # association-rule lift over distinct-order supports; the score
        # is round_even of the pinned double expression (micro-lift)
        "parts_copurchase_lift": """
            WITH po AS (SELECT DISTINCT l_orderkey AS o, l_partkey AS p
                        FROM lineitem),
            tot AS (SELECT CAST(count(DISTINCT o) AS DOUBLE) AS n FROM po),
            isup AS (SELECT p, count(*) AS np FROM po GROUP BY p),
            sup AS (SELECT a.p AS u, b.p AS v, count(*) AS n_ab
                    FROM po a JOIN po b ON a.o = b.o AND a.p < b.p
                    GROUP BY 1, 2)
            SELECT u AS part_a, v AS part_b, n_ab AS support,
                   ia.np AS n_a, ib.np AS n_b,
                   CAST(round_even(
                        (CAST(n_ab AS DOUBLE) * tot.n
                         / (CAST(ia.np AS DOUBLE) * CAST(ib.np AS DOUBLE)))
                        * 1000000.0, 0) AS BIGINT) AS lift_micro
            FROM sup JOIN isup ia ON ia.p = u
                     JOIN isup ib ON ib.p = v
                     CROSS JOIN tot
            WHERE n_ab >= 2
            ORDER BY lift_micro DESC, part_a, part_b LIMIT 20
        """,
        # per-doc Shannon entropy: per-term summands rounded to integer
        # micro-nats BEFORE the sum (order-independent), truncating
        # final division — matches the zero-exchange batch-local fold
        "docs_token_entropy": """
            WITH tok AS (SELECT doc_id,
                                unnest(string_split(text, ' ')) AS w
                         FROM documents),
            c AS (SELECT doc_id, w, count(*) AS c
                  FROM tok GROUP BY doc_id, w),
            d AS (SELECT doc_id,
                         CAST(sum(c) AS BIGINT) AS n,
                         CAST(sum(CAST(round_even(
                              ln(CAST(c AS DOUBLE)) * CAST(c AS DOUBLE)
                              * 1000000.0, 0) AS BIGINT)) AS BIGINT) AS s
                  FROM c GROUP BY doc_id)
            SELECT doc_id, n AS n_tokens,
                   CAST(round_even(ln(CAST(n AS DOUBLE)) * 1000000.0, 0)
                        AS BIGINT) - s // n AS ent_micro
            FROM d
        """,
        # robust grouped outliers: discrete medians (quantile_disc) of
        # exact cents and of |cents - med|, outliers beyond 3 * MAD
        "events_mad_outliers": """
            WITH x AS (SELECT event_type,
                              CAST(round(value * 100) AS BIGINT) AS cents
                       FROM events),
            m AS (SELECT event_type, quantile_disc(cents, 0.5) AS med
                  FROM x GROUP BY event_type),
            a AS (SELECT x.event_type, m.med,
                         abs(x.cents - m.med) AS dev
                  FROM x JOIN m USING (event_type)),
            md AS (SELECT event_type, quantile_disc(dev, 0.5) AS mad
                   FROM a GROUP BY event_type)
            SELECT a.event_type,
                   any_value(a.med) AS med_cents,
                   any_value(md.mad) AS mad_cents,
                   count(*) AS n,
                   CAST(count(*) FILTER (WHERE a.dev > 3 * md.mad)
                        AS BIGINT) AS n_outliers
            FROM a JOIN md USING (event_type)
            GROUP BY a.event_type
        """,
        # JL projection: the identical quantization CTE as
        # emb_quantize_int8, sign from the pinned (dim, j) integer mix
        "emb_random_projection": """
            WITH x AS (
                SELECT vec_id,
                       unnest(embedding) AS v,
                       generate_subscripts(embedding, 1) - 1 AS dim
                FROM embeddings),
            rng AS (
                SELECT dim, min(v) AS mn, max(v) AS mx
                FROM x GROUP BY dim),
            code AS (
                SELECT x.vec_id, x.dim,
                       CASE WHEN rng.mx > rng.mn THEN
                           CAST(least(254.0,
                                floor((CAST(x.v AS DOUBLE)
                                       - CAST(rng.mn AS DOUBLE)) * 255.0
                                      / (CAST(rng.mx AS DOUBLE)
                                         - CAST(rng.mn AS DOUBLE))))
                                AS BIGINT) - 127
                       ELSE -127 END AS code
                FROM x JOIN rng USING (dim)),
            s AS (
                SELECT code.vec_id, r.j, code.code,
                       ((((code.dim * 2654435761 + r.j * 2246822519)
                          % 4294967296) // 65536) % 2) * 2 - 1 AS sgn
                FROM code CROSS JOIN range(8) r(j))
            SELECT vec_id, j, CAST(sum(sgn * code) AS BIGINT) AS v
            FROM s GROUP BY vec_id, j
        """,
        "purchase_hits": _hits_oracle(),
        # link prediction: wedge-counted common neighbors over the
        # distinct co-purchase graph, existing edges excluded
        "parts_neighbor_jaccard": """
            WITH e0 AS (
                SELECT DISTINCT a.l_partkey AS u, b.l_partkey AS v
                FROM lineitem a JOIN lineitem b
                  ON a.l_orderkey = b.l_orderkey
                 AND a.l_partkey < b.l_partkey),
            und AS (SELECT u AS src, v AS dst FROM e0
                    UNION ALL SELECT v, u FROM e0),
            deg AS (SELECT src AS node, count(*) AS d
                    FROM und GROUP BY src),
            wed AS (SELECT a.dst AS x, b.dst AS y, count(*) AS common
                    FROM und a JOIN und b
                      ON a.src = b.src AND a.dst < b.dst
                    GROUP BY 1, 2),
            ne AS (SELECT w.x, w.y, w.common FROM wed w
                   LEFT JOIN e0 ON e0.u = w.x AND e0.v = w.y
                   WHERE e0.u IS NULL AND w.common >= 2)
            SELECT x AS part_a, y AS part_b, common,
                   da.d AS deg_a, db.d AS deg_b,
                   common * 1000000 // (da.d + db.d - common)
                       AS jac_micro
            FROM ne JOIN deg da ON da.node = x
                    JOIN deg db ON db.node = y
            ORDER BY jac_micro DESC, part_a, part_b LIMIT 25
        """,
        # CUBE = the rollup twin with all four grouping sets
        "orders_cube": """
            SELECT coalesce(o_orderpriority, 'ALL') AS priority,
                   coalesce(o_orderstatus, 'ALL')   AS status,
                   count(*)                         AS n_orders,
                   round(sum(round(o_totalprice * 100)) / 100.0, 2)
                       AS revenue
            FROM orders
            GROUP BY CUBE(o_orderpriority, o_orderstatus)
        """,
        # last-touch attribution: latest strictly-preceding touch in
        # (ts, event_id) sequence order within the 24h window
        "events_attribution_last_touch": """
            WITH p AS (SELECT event_id, user_id, ts FROM events
                       WHERE event_type = 'purchase'),
            t AS (SELECT event_id, user_id, ts, event_type FROM events
                  WHERE event_type IN ('click', 'view')),
            j AS (SELECT p.event_id AS purchase_id,
                         t.event_id AS touch_id,
                         t.event_type AS touch_type,
                         epoch_us(p.ts) - epoch_us(t.ts) AS gap_us,
                         row_number() OVER (
                             PARTITION BY p.event_id
                             ORDER BY t.ts DESC, t.event_id DESC) AS rn
                  FROM p JOIN t ON p.user_id = t.user_id
                   AND (t.ts < p.ts
                        OR (t.ts = p.ts AND t.event_id < p.event_id))
                   AND epoch_us(p.ts) - epoch_us(t.ts) <= 86400000000)
            SELECT purchase_id, touch_id, touch_type, gap_us
            FROM j WHERE rn = 1
        """,
        # closed-form planted truth for the pixel pre-processing path
        # (ops/pageprep.py): skew_mdeg is the Knuth-hash grid plant,
        # height is the shear's shift span 96 + |round(191 tan theta)|
        # (rint == half-away round on all 25 planted angles, pinned in
        # tests/test_pageprep.py); a hash match proves decode ->
        # grayscale -> Otsu -> projection-profile estimation recovered
        # the planted angle EXACTLY for every document
        "images_page_skew": """
            WITH p AS (
                SELECT doc_id,
                       ((doc_id * 2654435761) % 25 - 12) * 1000
                           AS skew_mdeg
                FROM documents)
            SELECT doc_id AS media_id,
                   CAST(192 AS BIGINT) AS width,
                   CAST(96 + abs(round(
                       191 * tan(radians(skew_mdeg / 1000.0))))
                       AS BIGINT) AS height,
                   CAST(skew_mdeg AS BIGINT) AS skew_mdeg
            FROM p ORDER BY media_id
        """,
        # planted closed-form crawl link graph (ops.web.
        # synth_link_corpus): hash match certifies the real DOM anchor
        # walk + host resolution + self-loop/scheme filtering
        "domain_link_edges": "WITH" + _LINK_EDGE_CTE + """
            SELECT 'site' || s || '.example' AS src_host,
                   'site' || t || '.example' AS dst_host
            FROM e0 ORDER BY src_host, dst_host
        """,
        "domain_pagerank": _domain_pagerank_oracle(),
        # identical messy-url construction from doc_id, then the SAME
        # canonicalization spec in SQL string/list functions; the two
        # '/./'+'/../' replace rounds reach the planted fixture's fixed
        # point (depth-1 junk; the Ray side iterates to fixpoint)
        "urls_canonicalize": """
            WITH m AS (
                SELECT doc_id,
                    (CASE WHEN doc_id % 2 = 0 THEN 'HTTP'
                          ELSE 'https' END)
                    || '://WWW.Site' || (doc_id % 50) || '.Example'
                    || (CASE WHEN doc_id % 7 = 0 THEN ':8080'
                             WHEN doc_id % 3 = 0 THEN
                                 CASE WHEN doc_id % 2 = 0 THEN ':80'
                                      ELSE ':443' END
                             ELSE '' END)
                    || (CASE WHEN doc_id % 4 = 0
                             THEN '/A/./b' || (doc_id % 5)
                                  || '/../c/page' || doc_id
                             ELSE '/A/b' || (doc_id % 5)
                                  || '/page' || doc_id END)
                    || (CASE doc_id % 5
                             WHEN 1 THEN '?b=2&a=1'
                             WHEN 2 THEN '?utm_source=x&a=1'
                             WHEN 3 THEN '?gclid=z&utm_medium=m'
                             WHEN 4 THEN '?a=1&a=0' ELSE '' END)
                    || (CASE WHEN doc_id % 4 = 0
                             THEN '#sec' || (doc_id % 3)
                             ELSE '' END) AS url
                FROM documents),
            p AS (
                SELECT doc_id, url,
                    lower(regexp_extract(url,
                        '^([A-Za-z][A-Za-z0-9+.\\-]*):', 1)) AS scheme,
                    lower(regexp_extract(url,
                        '^[^:]+://(?:[^/?#@]*@)?([^/:?#]*)', 1)) AS host,
                    coalesce(regexp_extract(url,
                        '^[^:]+://[^/?#]*:([0-9]+)', 1), '') AS port,
                    coalesce(regexp_extract(url,
                        '^[^:]+://[^/?#]*([^?#]*)', 1), '') AS path0,
                    coalesce(regexp_extract(url, '\\?([^#]*)', 1),
                             '') AS q
                FROM m),
            r AS (
                SELECT *, regexp_replace(regexp_replace(
                    regexp_replace(regexp_replace(path0,
                        '/\\./', '/', 'g'),
                        '/[A-Za-z0-9_\\-]+/\\.\\./', '/', 'g'),
                        '/\\./', '/', 'g'),
                        '/[A-Za-z0-9_\\-]+/\\.\\./', '/', 'g') AS path1
                FROM p),
            s AS (
                SELECT *, coalesce(array_to_string(list_sort(
                    list_filter(string_split(q, '&'),
                    x -> x <> '' AND NOT regexp_matches(x,
                        '^(utm_[^=]*|gclid|fbclid)='))), '&'), '') AS qs
                FROM r)
            SELECT doc_id, url,
                scheme || '://' || host
                || CASE WHEN port = '' THEN ''
                        WHEN scheme = 'http' AND port = '80' THEN ''
                        WHEN scheme = 'https' AND port = '443' THEN ''
                        ELSE ':' || port END
                || CASE WHEN path1 = '' THEN '/' ELSE path1 END
                || CASE WHEN qs = '' THEN '' ELSE '?' || qs END
                    AS canon_url
            FROM s ORDER BY doc_id
        """,
        # closed-form twin of the WARC fixture (ops.warc.
        # synth_warc_dir): url/status constant-form, byte count =
        # utf-8 octet length of the wrapped text (DuckDB strlen is
        # bytes; Python len(str.encode()) likewise)
        "warc_page_stats": """
            SELECT 'https://site' || (doc_id % 50) || '.example/p/'
                       || doc_id AS url,
                   CAST(200 AS BIGINT) AS http_status,
                   CAST(strlen('<html><body><p>' || text
                       || '</p></body></html>') AS BIGINT) AS n_bytes
            FROM documents ORDER BY url
        """,
        # closed-form decision table for the robots fixture
        # (ops.web._robots_fixture_text): host group g = (id%50)%4,
        # path case c = id%8 — the SHARED closed forms
        # (_ROBOTS_URL_EXPR / _ROBOTS_ALLOWED_EXPR above) carry the
        # derivation incl. the §2.2.3 wildcard rules
        "robots_gate": f"""
            SELECT doc_id,
                {_ROBOTS_URL_EXPR} AS url,
                {_ROBOTS_ALLOWED_EXPR} AS allowed
            FROM documents ORDER BY doc_id
        """,
        # closed-form twin of the per-host urlset fixture
        "sitemap_url_inventory": """
            SELECT 'https://site' || (doc_id % 50)
                       || '.example/sitemap.xml' AS sitemap_url,
                   'url' AS kind,
                   'https://site' || (doc_id % 50) || '.example/p/'
                       || doc_id AS loc,
                   '2024-01-' || lpad(CAST(1 + doc_id % 28 AS VARCHAR),
                                      2, '0') AS lastmod
            FROM documents ORDER BY loc
        """,
        # closed-form anchor-text counts over the planted crawl: link
        # j carries text 'ref{j}', the protocol-relative link
        # 'proto-rel'; self-loops drop with their edges
        "domain_anchor_texts": """
            WITH d AS (SELECT doc_id, doc_id % 50 AS h,
                              doc_id % 3 AS kk FROM documents),
            o1 AS (SELECT h AS s, (doc_id * 7 + 13 * j + 1) % 50 AS t,
                          j
                   FROM (SELECT *, unnest(range(0, kk + 1)) AS j
                         FROM d)),
            o2 AS (SELECT h AS s, (doc_id * 3 + 2) % 50 AS t
                   FROM d WHERE doc_id % 5 = 0),
            a AS (SELECT 'site' || t || '.example' AS dst_host,
                         'ref' || j AS anchor_text
                  FROM o1 WHERE s <> t
                  UNION ALL
                  SELECT 'site' || t || '.example', 'proto-rel'
                  FROM o2 WHERE s <> t)
            SELECT dst_host, anchor_text,
                   CAST(count(*) AS BIGINT) AS n
            FROM a GROUP BY dst_host, anchor_text
            ORDER BY dst_host, anchor_text
        """,
        # closed-form cell grid: R = 2+id%3 data rows x C = 2+id%2
        # cols under a th header row; every 4th doc's last data row
        # leads with a colspan=2 cell, shifting its k>=1 cells to
        # col k+1 (the occupancy-grid semantics the Ray side computes)
        "html_tables": """
            -- DuckDB identifiers are case-insensitive: the row
            -- variable must NOT be named r next to the row-count R
            -- (they collide silently; caught by the first parity run)
            WITH d AS (SELECT doc_id AS i, 2 + doc_id % 3 AS nr,
                              2 + doc_id % 2 AS nc FROM documents),
            hdr AS (SELECT i, CAST(0 AS BIGINT) AS row, c AS col,
                           'H' || c AS text, true AS header
                    FROM (SELECT *, unnest(range(0, nc)) AS c FROM d)),
            dr AS (SELECT *, unnest(range(1, nr + 1)) AS rw FROM d),
            dk AS (SELECT *, unnest(range(0,
                       CASE WHEN i % 4 = 0 AND rw = nr THEN nc - 1
                            ELSE nc END)) AS k FROM dr),
            data AS (SELECT i, rw AS row,
                            CASE WHEN i % 4 = 0 AND rw = nr AND k >= 1
                                 THEN k + 1 ELSE k END AS col,
                            'c' || rw || '_' || k || '_' || i AS text,
                            false AS header
                     FROM dk)
            SELECT i AS doc_id, CAST(0 AS BIGINT) AS table_idx,
                   row, col, text, header
            FROM (SELECT * FROM hdr UNION ALL SELECT * FROM data)
            ORDER BY doc_id, row, col
        """,
        # same cell grid, linearized: ordered string_agg per row, a
        # separator sized to the header cell count, rows joined by \n
        "html_tables_markdown": """
            WITH d AS (SELECT doc_id AS i, 2 + doc_id % 3 AS nr,
                              2 + doc_id % 2 AS nc FROM documents),
            hdr AS (SELECT i, CAST(0 AS BIGINT) AS row, c AS col,
                           'H' || c AS text
                    FROM (SELECT *, unnest(range(0, nc)) AS c FROM d)),
            dr AS (SELECT *, unnest(range(1, nr + 1)) AS rw FROM d),
            dk AS (SELECT *, unnest(range(0,
                       CASE WHEN i % 4 = 0 AND rw = nr THEN nc - 1
                            ELSE nc END)) AS k FROM dr),
            data AS (SELECT i, rw AS row,
                            CASE WHEN i % 4 = 0 AND rw = nr AND k >= 1
                                 THEN k + 1 ELSE k END AS col,
                            'c' || rw || '_' || k || '_' || i AS text
                     FROM dk),
            cells AS (SELECT * FROM hdr UNION ALL
                      SELECT * FROM data),
            lines AS (SELECT i, row,
                             '| ' || string_agg(text, ' | '
                                 ORDER BY col) || ' |' AS line,
                             count(*) AS ncells
                      FROM cells GROUP BY i, row),
            body AS (SELECT i, string_agg(line, chr(10)
                                ORDER BY row) AS b
                     FROM lines WHERE row >= 1 GROUP BY i)
            SELECT h.i AS doc_id, CAST(0 AS BIGINT) AS table_idx,
                   h.line || chr(10) || '|'
                       || repeat(' --- |', CAST(h.ncells AS INT))
                       || chr(10) || b.b AS markdown
            FROM (SELECT * FROM lines WHERE row = 0) h
            JOIN body b ON h.i = b.i
            ORDER BY doc_id, table_idx
        """,
        "docs_topic_clusters": _topic_oracle(),
        # closed-form head-section twin (title whitespace collapses to
        # single spaces; noindex on id%7==3; canonical rel matched
        # case-insensitively)
        "html_meta": """
            SELECT doc_id,
                   'Doc ' || doc_id || ' site' || (doc_id % 50)
                       AS title,
                   'Summary of document ' || doc_id AS description,
                   'https://site' || (doc_id % 50) || '.example/p/'
                       || doc_id AS canonical,
                   doc_id % 7 = 3 AS noindex,
                   'OG ' || doc_id AS og_title
            FROM documents ORDER BY doc_id
        """,
        # closed-form twin of the fixture form: five visible fields
        # (submit suppressed); select value = chr(65 + id%3)
        "html_forms": """
            SELECT doc_id, CAST(0 AS BIGINT) AS form_idx, key,
                   field_name, field_type, value
            FROM (
                SELECT doc_id, 'Full Name' AS key,
                       'name' AS field_name, 'text' AS field_type,
                       'V' || doc_id AS value FROM documents
                UNION ALL SELECT doc_id, 'note', 'note', 'textarea',
                       'note ' || doc_id FROM documents
                UNION ALL SELECT doc_id, 'plan', 'plan', 'select',
                       chr(65 + CAST(doc_id % 3 AS INT))
                       FROM documents
                UNION ALL SELECT doc_id, 'Search', 'q', 'text', ''
                       FROM documents
                UNION ALL SELECT doc_id, 'Subscribe', 'sub',
                       'checkbox', 'yes' FROM documents)
            ORDER BY doc_id, field_name
        """,
        # closed-form JSON-LD items: the per-doc typed item plus the
        # every-6th Organization array member; the id%9==4 malformed
        # block contributes nothing by construction
        "html_jsonld": """
            SELECT doc_id, CAST(0 AS BIGINT) AS block_idx,
                   CAST(0 AS BIGINT) AS item_idx,
                   CASE doc_id % 3 WHEN 0 THEN 'Article'
                        WHEN 1 THEN 'Product'
                        ELSE 'Person' END AS ld_type,
                   'Item ' || doc_id AS name
            FROM documents
            UNION ALL
            SELECT doc_id, CAST(0 AS BIGINT), CAST(1 AS BIGINT),
                   'Organization', 'Org ' || doc_id
            FROM documents WHERE doc_id % 6 = 0
            ORDER BY doc_id, block_idx, item_idx
        """,
        # closed-form alternates: 1 + id%3 hreflang rows (lowercased)
        # + the id%11==7 refresh target (unquoted)
        "html_alternates": """
            -- documents has its own lang column: the VALUES list
            -- must use a distinct name and qualify it
            WITH l(k, hl) AS (VALUES (0, 'en'), (1, 'de'),
                                     (2, 'fr'))
            SELECT doc_id, 'alternate' AS kind, l.hl AS lang,
                   'https://site' || (doc_id % 50) || '.example/'
                       || l.hl || '/p/' || doc_id AS href
            FROM documents JOIN l ON l.k <= doc_id % 3
            UNION ALL
            SELECT doc_id, 'refresh', NULL,
                   'https://site' || (doc_id % 50)
                       || '.example/new/' || doc_id
            FROM documents WHERE doc_id % 11 = 7
            ORDER BY doc_id, kind, lang
        """,
        # same RE2 counts + integer divisions (all operands
        # non-negative, so DuckDB truncation == numpy floor)
        "docs_readability": """
            WITH c AS (
                SELECT doc_id,
                    greatest(len(regexp_extract_all(text, '\S+')),
                             1) AS words,
                    greatest(len(regexp_extract_all(text,
                             '[.!?]+')), 1) AS sentences,
                    len(regexp_extract_all(lower(text),
                        '[aeiouy]+')) AS syllables
                FROM documents)
            SELECT doc_id, CAST(words AS BIGINT) AS words,
                   CAST(sentences AS BIGINT) AS sentences,
                   CAST(syllables AS BIGINT) AS syllables,
                   CAST(206835 - (1015 * words) // sentences
                        - (84600 * syllables) // words AS BIGINT)
                       AS flesch_milli
            FROM c ORDER BY doc_id
        """,
        # closed-form feed entries: kind by host parity
        "feed_inventory": """
            SELECT 'https://site' || (doc_id % 50)
                       || '.example/feed.xml' AS feed_url,
                   CASE WHEN (doc_id % 50) % 2 = 0 THEN 'rss'
                        ELSE 'atom' END AS kind,
                   'Post ' || doc_id AS title,
                   'https://site' || (doc_id % 50) || '.example/p/'
                       || doc_id AS link,
                   '2024-01-' || lpad(CAST(1 + doc_id % 28
                       AS VARCHAR), 2, '0') AS published
            FROM documents ORDER BY link
        """,
        "crawl_frontier": _crawl_frontier_oracle(),
        # identical messy construction + identical RE2 replace; the
        # alternating-join behavior on consecutive breaks (GlobalReplace
        # does not rescan replacement output) is part of the contract
        "docs_dehyphenate": """
            WITH m AS (SELECT doc_id,
                              replace(text, ' ', '-' || chr(10))
                                  AS messy
                       FROM documents)
            SELECT doc_id,
                   regexp_replace(messy,
                       '([A-Za-z])-[ \\t]*\\n[ \\t]*([a-z])',
                       '\\1\\2', 'g') AS clean_text,
                   CAST(len(regexp_extract_all(messy,
                       '([A-Za-z])-[ \\t]*\\n[ \\t]*([a-z])'))
                       AS BIGINT) AS n_joins
            FROM m ORDER BY doc_id
        """,
        # fixture delays live in the '*' groups of host classes 0 (1s)
        # and 3 (4.0s); class 2's delay belongs to a foreign agent
        "robots_crawl_delay": """
            WITH h AS (SELECT DISTINCT doc_id % 50 AS host_id
                       FROM documents)
            SELECT host_id,
                   CAST(CASE WHEN host_id % 4 = 0 THEN 1000
                             WHEN host_id % 4 = 3 THEN 4000
                             ELSE NULL END AS BIGINT) AS delay_ms
            FROM h ORDER BY host_id
        """,
        # full-page markdown: the fixture is closed-form in doc_id, so
        # the expected string is ONE concatenation (chr(10) newlines);
        # the Ray side earns it through the real DOM walk + collapse
        "html_markdown": """
            SELECT doc_id,
                   '# Doc ' || doc_id
                || chr(10) || chr(10)
                || 'Intro paragraph ' || doc_id || ' with **bold '
                || (doc_id % 7) || '**, *italic ' || (doc_id % 5)
                || '* and a [link ' || doc_id || '](https://site'
                || (doc_id % 50) || '.example/p/' || doc_id || ').'
                || chr(10) || chr(10)
                || '## Details ' || (doc_id % 3)
                || chr(10) || chr(10)
                || '- alpha ' || (doc_id % 3) || chr(10)
                || '- has `code ' || (doc_id % 5) || '`' || chr(10)
                || '- deep' || chr(10)
                || '  - leaf ' || (doc_id % 2)
                || chr(10) || chr(10)
                || '1. first ' || (doc_id % 2) || chr(10)
                || '2. second ' || (doc_id % 4)
                || chr(10) || chr(10)
                || '> quoted ' || (doc_id % 11)
                || chr(10) || chr(10)
                || '```' || chr(10) || 'raw ' || doc_id || chr(10)
                || '  indent ' || (doc_id % 9) || chr(10) || '```'
                || chr(10) || chr(10)
                || '---'
                || chr(10) || chr(10)
                || '| k | v |' || chr(10) || '| --- | --- |'
                || chr(10) || '| size | ' || (doc_id % 9) || ' |'
                || chr(10) || chr(10)
                || 'Image ![im ' || (doc_id % 6) || '](/img/'
                || doc_id || '.png) tail.' AS markdown
            FROM documents ORDER BY doc_id
        """,
        # CDX over the plain WARC fixture: every record's byte length
        # is the serialization grammar's strlen arithmetic (7 header
        # lines joined by CRLF + CRLFCRLF + HTTP payload + CRLFCRLF,
        # Content-Length digit widths included), offsets are the
        # warcinfo-record constant + a per-file window sum in doc_id
        # order (the fixture buckets by doc_id % 8, appending in row
        # order)
        "warc_cdx": "WITH" + _CDX_CTE + """
            SELECT surt, cdx_ts, url, file, roffset, rlength,
                   http_status, digest
            FROM cdx ORDER BY surt
        """,
        # the sharded-merge twin produces the identical row set
        "warc_cdx_sharded": "WITH" + _CDX_CTE + """
            SELECT surt, cdx_ts, url, file, roffset, rlength,
                   http_status, digest
            FROM cdx ORDER BY surt
        """,
        # WET: the fixture page is <p>{text}</p>, so the conversion
        # payload is exactly the documents row's text (whitespace
        # collapse is the identity on the single-space corpus); a hash
        # match certifies WARC parse -> DOM walk -> WET serialize ->
        # WET framing parse byte-for-byte
        "warc_wet": """
            SELECT 'https://site' || (doc_id % 50) || '.example/p/'
                       || doc_id AS url,
                   '2024-01-' || lpad(CAST(1 + doc_id % 28 AS VARCHAR),
                                      2, '0') || 'T00:00:00Z'
                       AS warc_ts,
                   text, CAST(length(text) AS BIGINT) AS n_chars
            FROM documents
        """,
        # WAT: every projected field recomputed from doc_id over the
        # rich closed-form fixture (title/meta-description/anchors)
        "warc_wat": """
            SELECT 'https://site' || (doc_id % 50) || '.example/p/'
                       || doc_id AS url,
                   '2024-01-' || lpad(CAST(1 + doc_id % 28 AS VARCHAR),
                                      2, '0') || 'T00:00:00Z'
                       AS warc_ts,
                   'Page ' || doc_id || ' site' || (doc_id % 50)
                       AS title,
                   'desc ' || doc_id AS description,
                   CAST(doc_id % 4 AS BIGINT) AS n_links,
                   CASE WHEN doc_id % 4 > 0
                        THEN 'https://dst' || ((doc_id * 7) % 97)
                             || '.example/l/0'
                        ELSE '' END AS first_link_url,
                   CASE WHEN doc_id % 4 > 0 THEN 'link 0'
                        ELSE '' END AS first_link_text
            FROM documents
        """,
        # Two-level CDX (cluster.idx): every Nth row of the SAME
        # sorted index — the oracle composes the identical CDX CTE,
        # ranks with ROW_NUMBER over the total order, and keeps the
        # block leaders
        "warc_cluster_idx": "WITH" + _CDX_CTE + """,
            ranked AS (
              SELECT *, ROW_NUMBER() OVER
                (ORDER BY surt, cdx_ts, file, roffset) AS rn
              FROM cdx)
            SELECT surt, cdx_ts, file, roffset, rlength, rn
            FROM ranked WHERE (rn - 1) % 25 = 0 ORDER BY surt
        """,
        # Reciprocity: the SAME closed-form edge CTE as
        # domain_link_edges + a reverse-edge self-join; ratio is
        # integer ppm of sums
        "domain_reciprocity": "WITH" + _LINK_EDGE_CTE + """
            SELECT 'site' || e0.s || '.example' AS host,
              count(*) AS n_out,
              CAST(sum(CASE WHEN r.s IS NOT NULL THEN 1 ELSE 0 END)
                   AS BIGINT) AS n_recip,
              CAST((1000000 * sum(CASE WHEN r.s IS NOT NULL
                                       THEN 1 ELSE 0 END))
                   // count(*) AS BIGINT) AS recip_ppm
            FROM e0 LEFT JOIN e0 r
              ON r.s = e0.t AND r.t = e0.s
            GROUP BY e0.s ORDER BY host
        """,
        # Soft-404 templates: per-host (md5, count) groups filtered
        # at the SAME min_copies bar; the thin global boilerplate
        # must stay under it on every host
        "hosts_soft404": """
            WITH pages AS (
              SELECT 'h' || (doc_id % 20) || '.example' AS host,
                CASE WHEN doc_id % 7 = 0
                     THEN 'error template of h' || (doc_id % 20)
                     WHEN doc_id % 9 = 8 THEN 'GLOBAL BOILER'
                     ELSE 'content ' || doc_id END AS text
              FROM documents),
            g AS (
              SELECT host, md5(text) AS template_md5,
                     count(*) AS n_copies
              FROM pages GROUP BY host, md5(text)),
            t AS (SELECT host, count(*) AS n_docs
                  FROM pages GROUP BY host)
            SELECT g.host, template_md5, n_copies, n_docs,
              CAST((1000000 * n_copies) // n_docs AS BIGINT)
                AS share_ppm
            FROM g JOIN t ON g.host = t.host
            WHERE n_copies >= 4
            ORDER BY g.host, template_md5
        """,
        # Coverage audit: membership closed-form (sitemap lists
        # doc_id % 3 != 0; the crawl captured doc_id % 5 != 1; docs
        # failing both filters appear nowhere)
        "crawl_coverage": """
            SELECT
              'https://site' || (doc_id % 50) || '.example/p/'
                || doc_id AS url,
              doc_id % 3 <> 0 AS in_sitemap,
              doc_id % 5 <> 1 AS in_crawl,
              CASE WHEN doc_id % 3 <> 0 AND doc_id % 5 <> 1
                   THEN 'both'
                   WHEN doc_id % 3 <> 0 THEN 'sitemap_only'
                   ELSE 'crawled_only' END AS status
            FROM documents
            WHERE doc_id % 3 <> 0 OR doc_id % 5 <> 1
            ORDER BY url
        """,
        # generated from the op's own UNRESERVED table (see
        # _pct_normalize_oracle)
        "urls_percent_normalize": _pct_normalize_oracle(),
        # Return-tag audit: forward edges from every even page (the
        # partner omits its back-link when (doc_id//2) % 3 == 0, and
        # an absent partner page also cannot return), backward edges
        # only from non-omitting odd pages (their reverse always
        # exists because even pages always list)
        "hreflang_return_tags": """
            WITH e AS (
              SELECT 'https://x.example/p/' || doc_id AS src_url,
                     'https://x.example/p/' || (doc_id + 1)
                       AS dst_url,
                     'de' AS lang,
                     (doc_id // 2) % 3 <> 0 AND EXISTS (
                       SELECT 1 FROM documents d2
                       WHERE d2.doc_id = documents.doc_id + 1)
                       AS has_return
              FROM documents WHERE doc_id % 2 = 0
              UNION ALL
              SELECT 'https://x.example/p/' || doc_id,
                     'https://x.example/p/' || (doc_id - 1),
                     'en', TRUE
              FROM documents
              WHERE doc_id % 2 = 1 AND (doc_id // 2) % 3 <> 0)
            SELECT * FROM e ORDER BY src_url, dst_url
        """,
        # Anchor rel accounting: counts closed-form per class (the
        # case-folded token-set semantics live in the Ray-side walk;
        # 'nofollowx' is a followed anchor, href-less <a> never
        # counts)
        "pages_anchor_rels": """
            SELECT doc_id,
              CAST(2 + CASE WHEN doc_id % 2 = 0 THEN 1 ELSE 0 END
                     + CASE WHEN doc_id % 3 = 0 THEN 1 ELSE 0 END
                     + CASE WHEN doc_id % 5 = 0 THEN 1 ELSE 0 END
                   AS BIGINT) AS n_anchors,
              CAST(CASE WHEN doc_id % 2 = 0 THEN 1 ELSE 0 END
                   AS BIGINT) AS n_nofollow,
              CAST(CASE WHEN doc_id % 3 = 0 THEN 1 ELSE 0 END
                   AS BIGINT) AS n_ugc,
              CAST(CASE WHEN doc_id % 3 = 0 THEN 1 ELSE 0 END
                   AS BIGINT) AS n_sponsored,
              CAST(2 + CASE WHEN doc_id % 5 = 0 THEN 1 ELSE 0 END
                   AS BIGINT) AS n_followed
            FROM documents ORDER BY doc_id
        """,
        # Backoff: closed-form statuses per (host, wave), throttle
        # counts + the SAME min-cap and shift arithmetic
        "hosts_backoff": """
            WITH f AS (
              SELECT doc_id % 50 AS h, doc_id // 50 AS w
              FROM documents),
            s AS (
              SELECT 'site' || h || '.example' AS host,
                CASE WHEN (h + w) % 7 = 0 THEN 429
                     WHEN (h + 2 * w) % 11 = 0 THEN 503
                     ELSE 200 END AS status
              FROM f),
            g AS (
              SELECT host, count(*) AS n_fetches,
                CAST(sum(CASE WHEN status IN (429, 503)
                              THEN 1 ELSE 0 END) AS BIGINT)
                  AS n_throttle
              FROM s GROUP BY host)
            SELECT host, n_fetches, n_throttle,
              least(n_throttle, 6) AS level,
              1000 * (1 << least(n_throttle, 6)) AS delay_ms
            FROM g ORDER BY host
        """,
        # the expected CLEAN strings, closed-form per class — the Ray
        # side earns them through the real sloppy-cp1252 inverse
        "docs_fix_mojibake": """
            SELECT doc_id,
                   CASE doc_id % 4
                       WHEN 0 THEN 'plain ascii ' || doc_id
                       WHEN 3 THEN 'Ã solo ' || doc_id || ' stays'
                       ELSE 'café ' || doc_id || ' — naïve « déjà »…'
                   END AS text_fixed,
                   CAST(CASE doc_id % 4 WHEN 1 THEN 1 WHEN 2 THEN 2
                        ELSE 0 END AS BIGINT) AS rounds
            FROM documents ORDER BY doc_id
        """,
        # frontier admission closed-form (robots gate urls + noindex
        # on id%7==3), slots by per-host row_number in doc_id order,
        # delay = 4000 ms for host class 3 (planted Crawl-delay 4.0),
        # else the 1000 ms floor (class 0 plants exactly 1000; classes
        # 1/2 declare none)
        "crawl_schedule": f"""
            WITH f AS (
              SELECT doc_id, doc_id % 50 AS h,
                 {_ROBOTS_URL_EXPR} AS url,
                 ({_ROBOTS_ALLOWED_EXPR}
                  AND NOT (doc_id % 7 = 3)) AS admitted
              FROM documents),
            a AS (
              SELECT *, row_number() OVER (PARTITION BY h
                            ORDER BY doc_id) - 1 AS slot
              FROM f WHERE admitted)
            SELECT doc_id, url, 'site' || h || '.example' AS host,
                   CAST(slot AS BIGINT) AS slot,
                   CAST(slot * (CASE WHEN h % 4 = 3 THEN 4000
                                     ELSE 1000 END) AS BIGINT)
                       AS fetch_at_ms
            FROM a ORDER BY doc_id
        """,
        # every host declares /sitemap.xml at pos 0; odd hosts add
        # /sitemap-news.xml at pos 1 (lowercase key + comment in the
        # fixture — parsing them is what parity certifies)
        "robots_sitemaps": """
            WITH h AS (SELECT DISTINCT doc_id % 50 AS host_id
                       FROM documents),
            e AS (SELECT host_id, unnest(CASE WHEN host_id % 2 = 1
                          THEN [0, 1] ELSE [0] END) AS pos
                  FROM h)
            SELECT host_id, CAST(pos AS BIGINT) AS pos,
                   'https://site' || host_id || '.example/sitemap'
                   || CASE WHEN pos = 1 THEN '-news' ELSE '' END
                   || '.xml' AS sitemap_url
            FROM e ORDER BY host_id, pos
        """,
        # chain classes by doc_id % 4: none (0 hops) / 1-hop terminal /
        # 2-hop through the previous page / self-cycle (NULL, cap 5,
        # 'unresolved')
        "redirect_resolution": """
            SELECT doc_id,
                   'https://site' || (doc_id % 50) || '.example/r/'
                       || doc_id AS url,
                   CASE doc_id % 4
                       WHEN 0 THEN 'https://site' || (doc_id % 50)
                           || '.example/r/' || doc_id
                       WHEN 1 THEN 'https://site' || (doc_id % 50)
                           || '.example/final/' || doc_id
                       WHEN 2 THEN 'https://site'
                           || ((doc_id - 1) % 50)
                           || '.example/final/' || (doc_id - 1)
                       ELSE NULL END AS final_url,
                   CAST(CASE doc_id % 4 WHEN 0 THEN 0 WHEN 1 THEN 1
                        WHEN 2 THEN 2 ELSE 5 END AS BIGINT) AS hops,
                   CASE WHEN doc_id % 4 = 3 THEN 'unresolved'
                        ELSE 'ok' END AS status
            FROM documents ORDER BY doc_id
        """,
        # PSL eTLD+1: the oracle RE-RUNS the matching algorithm
        # against the rule list as a VALUES table — exception
        # priority, longest-match max, wildcard label arithmetic,
        # implicit-'*' fallback, list-slice suffix assembly — rather
        # than echoing expected strings
        "hosts_registrable": "WITH" + _PSL_CTE + f"""
            SELECT doc_id, host,
              CASE WHEN is_ip THEN NULL
                   ELSE array_to_string(labs[nl - least(mm, nl) + 1
                                             : nl], '.')
              END AS suffix,
              {_PSL_REG_EXPR} AS registrable,
              CASE WHEN is_ip THEN 'ip'
                   WHEN nl <= mm THEN 'suffix'
                   ELSE 'ok' END AS kind
            FROM sel ORDER BY doc_id
        """,
        # UT1-style domain blocklist gate: SHARED PSL CTE + the SHARED
        # registrable expression (_PSL_REG_EXPR — cannot drift from
        # hosts_registrable), blocklist = every 9th doc's registrable,
        # membership with NULL-safe coalesce (suffix rows never block)
        "hosts_blocklist": "WITH" + _PSL_CTE + f""",
            reg AS (
              SELECT doc_id, host, {_PSL_REG_EXPR} AS registrable
              FROM sel),
            bl AS (
              SELECT DISTINCT registrable FROM reg
              WHERE doc_id % 9 = 0 AND registrable IS NOT NULL)
            SELECT doc_id, host, registrable,
                   coalesce(registrable IN
                            (SELECT registrable FROM bl), FALSE)
                       AS blocked
            FROM reg ORDER BY doc_id
        """,
        "docs_lexicon_hits": _lexicon_oracle(),
        # char-n-gram NB langid: byte trigrams == substr char trigrams
        # on the ASCII corpus; integer micro-nat weights make every
        # score bit-exact (the docs_nb_quality fixed-point discipline
        # generalized to L classes); unseen-(term,lang) smoothing is
        # folded as score = prior + T*default + sum tf*(w - default)
        # so the oracle joins only SEEN (term,lang) weights
        "docs_langid_ngram": """
            WITH tri AS (
                SELECT doc_id, substr(text, CAST(g AS INTEGER), 3)
                       AS term
                FROM (SELECT doc_id, text,
                             unnest(range(1, length(text) - 1)) AS g
                      FROM documents)),
            langs AS (SELECT lang, count(*) AS dl FROM documents
                      GROUP BY lang),
            tot AS (SELECT count(*) AS dd FROM documents),
            cls AS (SELECT t.term, d.lang, count(*) AS n
                    FROM tri t JOIN documents d USING (doc_id)
                    GROUP BY t.term, d.lang),
            nlt AS (SELECT lang, sum(n) AS nl FROM cls GROUP BY lang),
            vv AS (SELECT count(DISTINCT term) AS v FROM cls),
            priw AS (SELECT l.lang,
                     CAST(round(ln(l.dl * 1.0 / tot.dd) * 1000000)
                          AS BIGINT) AS pr,
                     CAST(round(ln(1.0 / (nlt.nl + vv.v)) * 1000000)
                          AS BIGINT) AS dft
                     FROM langs l CROSS JOIN tot
                     JOIN nlt USING (lang) CROSS JOIN vv),
            w AS (SELECT c.term, c.lang,
                  CAST(round(ln((c.n + 1) * 1.0 / (nlt.nl + vv.v))
                             * 1000000) AS BIGINT) AS w
                  FROM cls c JOIN nlt USING (lang) CROSS JOIN vv),
            tf AS (SELECT doc_id, term, count(*) AS tf FROM tri
                   GROUP BY doc_id, term),
            tdoc AS (SELECT d.doc_id, coalesce(sum(tf.tf), 0) AS t
                     FROM documents d
                     LEFT JOIN tf ON d.doc_id = tf.doc_id
                     GROUP BY d.doc_id),
            sc AS (SELECT td.doc_id, p.lang,
                   any_value(p.pr) + any_value(td.t) * any_value(p.dft)
                        + coalesce(sum(tf.tf * (w.w - p.dft)), 0)
                       AS score
                   FROM tdoc td CROSS JOIN priw p
                   LEFT JOIN tf ON tf.doc_id = td.doc_id
                   LEFT JOIN w ON w.term = tf.term AND w.lang = p.lang
                   GROUP BY td.doc_id, p.lang),
            rk AS (SELECT doc_id, lang, score,
                   row_number() OVER (PARTITION BY doc_id
                                      ORDER BY score DESC, lang) AS r
                   FROM sc)
            SELECT b.doc_id, d.lang, b.lang AS pred_lang,
                   CAST(b.score - s.score AS BIGINT) AS margin
            FROM rk b JOIN rk s ON s.doc_id = b.doc_id AND s.r = 2
            JOIN documents d ON d.doc_id = b.doc_id
            WHERE b.r = 1
        """,
        # microdata: the fixture's item/prop rows recomputed
        # closed-form — a hash match certifies the DOM walk + the
        # HTML Standard value rules (meta content, href, datetime,
        # multi-name itemprop split, nested-item scoping)
        "html_microdata": """
            WITH base AS (
              SELECT doc_id,
                     'https://schema.org/' ||
                     CASE doc_id % 3 WHEN 0 THEN 'Product'
                          WHEN 1 THEN 'Recipe' ELSE 'Book' END AS ty
              FROM documents),
            p AS (
              SELECT doc_id, 0 AS i, -1 AS par, ty, 'name' AS prop,
                     'Item ' || doc_id AS value FROM base
              UNION ALL SELECT doc_id, 0, -1, ty, 'sku',
                     'SKU' || doc_id FROM base
              UNION ALL SELECT doc_id, 0, -1, ty, 'url',
                     '/p/' || doc_id FROM base
              UNION ALL SELECT doc_id, 0, -1, ty, 'date',
                     '2024-01-' || lpad(CAST(1 + doc_id % 28
                                             AS VARCHAR), 2, '0')
                     FROM base
              UNION ALL SELECT doc_id, 0, -1, ty, 'tag',
                     'x' || doc_id FROM base
              UNION ALL SELECT doc_id, 0, -1, ty, 'cat',
                     'x' || doc_id FROM base
              UNION ALL SELECT doc_id, 0, -1, ty, 'offers',
                     NULL FROM base
              UNION ALL SELECT doc_id, 1, 0,
                     'https://schema.org/Offer', 'price',
                     (doc_id % 100) || '.00' FROM base
              UNION ALL SELECT doc_id, 2, -1,
                     'https://schema.org/Person', 'name',
                     'P' || doc_id FROM base WHERE doc_id % 5 = 0)
            SELECT doc_id, CAST(i AS BIGINT) AS item_idx,
                   CAST(par AS BIGINT) AS parent_idx,
                   ty AS itemtype, prop, CAST(value AS VARCHAR) AS value
            FROM p ORDER BY doc_id, item_idx, prop""",
        # URL template mining: the oracle rebuilds the urls from
        # doc_id and RE-RUNS the generalization — the same two
        # regexp_replace passes in the same order (hex-run-first is
        # semantic: an 8-digit id is a hash slot), query/fragment
        # strip via the same path regex, host lowercase — plus the
        # group/count/min/trap fold
        "urls_templates": """
            WITH urls AS (
              SELECT doc_id,
                CASE doc_id % 5
                  WHEN 0 THEN 'https://SiteA' || ((doc_id // 5) % 10)
                       || '.example/product/' || doc_id || '/view'
                  WHEN 1 THEN 'https://siteb.example/article/'
                       || doc_id
                       || CASE WHEN doc_id % 2 = 1
                               THEN '?ref=' || (doc_id % 7)
                               ELSE '' END
                  WHEN 2 THEN 'https://sitec.example/page/'
                       || printf('%08x',
                            (doc_id * 2654435761) % 4294967296)
                       || '/x'
                  WHEN 3 THEN 'https://sited.example/section/'
                       || chr(CAST(97 + doc_id % 3 AS INTEGER))
                       || '?id=' || doc_id
                  ELSE 'https://sitee.example/mixed/a'
                       || (doc_id % 3) || 'b/' || doc_id
                END AS url
              FROM documents),
            parsed AS (
              SELECT url,
                lower(regexp_extract(url,
                      '^[^:]+://([^/?#]*)', 1)) AS host,
                regexp_extract(url,
                      '^[^:]+://[^/?#]*([^?#]*)', 1) AS path
              FROM urls),
            tpl AS (
              SELECT host, url,
                regexp_replace(regexp_replace(
                  CASE WHEN path = '' THEN '/' ELSE path END,
                  '[0-9a-f]{8,}', '{h}', 'g'),
                  '[0-9]+', '{d}', 'g') AS template
              FROM parsed)
            SELECT host, template, count(*) AS n,
                   min(url) AS sample_url, count(*) >= 50 AS trap
            FROM tpl GROUP BY host, template
            ORDER BY host, template
        """,
        # Jump consistent hashing: md5-derived 64-bit key, then the
        # integer-exact Lamping-Veach loop re-run as a recursive CTE
        # — every LCG step ((key*2862933555777941757 + 1) mod 2^64)
        # and jump (((b+1)<<31) // ((key>>33)+1)) recomputed in exact
        # HUGEINT arithmetic until j >= 64 buckets
        "hosts_shard_assign": "WITH RECURSIVE" + _JUMP_CTE + """
            SELECT s.doc_id, s.host, it.b AS shard
            FROM seed s JOIN it ON s.doc_id = it.doc_id
            WHERE it.j >= 64
            ORDER BY s.doc_id
        """,
        # Shard write plan: the SAME recursive jump CTE assigns
        # shards; the documents' REAL n_chars column joins on doc_id
        # and folds to per-shard (n_docs, sum_chars)
        "shard_write_plan": "WITH RECURSIVE" + _JUMP_CTE + """,
            assign AS (
              SELECT s.doc_id, it.b AS shard
              FROM seed s JOIN it ON s.doc_id = it.doc_id
              WHERE it.j >= 64)
            SELECT shard, count(*) AS n_docs,
              CAST(sum(d.n_chars) AS BIGINT) AS sum_chars
            FROM assign a JOIN documents d USING (doc_id)
            GROUP BY shard ORDER BY shard
        """,
        # Link-farm profiles: the planted edge set recomputed in
        # closed form from doc_id (farm pages fan out to doorway
        # subdomains of one hub domain, normal pages to distinct
        # registrants), dst hosts collapsed to registrable domains
        # (last two labels — exact for the fixture's 'example' TLD;
        # the general PSL matcher is oracled in hosts_registrable),
        # and the SAME integer rule n_hosts >= 5 AND n_hosts >= 3*n_domains
        "hosts_link_farms": """
            WITH d AS (
              SELECT doc_id, doc_id % 20 AS s, doc_id % 3 AS hub,
                     doc_id % 4 = 0 AS isfarm, 1 + doc_id % 2 AS kk
              FROM documents),
            fe AS (
              SELECT s, 'sub' || j || '.hub' || hub || '.example'
                     AS dst
              FROM (SELECT *, unnest(range(0, 6)) AS j
                    FROM d WHERE isfarm)),
            ne AS (
              SELECT s, 'site' || ((doc_id * 7 + 11 * j) % 40)
                     || '.example' AS dst
              FROM (SELECT *, unnest(range(0, kk + 1)) AS j
                    FROM d WHERE NOT isfarm)),
            e0 AS (
              SELECT DISTINCT 'src' || s || '.example' AS src_host,
                     dst AS dst_host
              FROM (SELECT * FROM fe UNION ALL SELECT * FROM ne))
            SELECT src_host,
              count(DISTINCT dst_host) AS n_dst_hosts,
              count(DISTINCT regexp_extract(dst_host,
                    '([^.]+\\.[^.]+)$', 1)) AS n_dst_domains,
              count(DISTINCT dst_host) >= 5
                AND count(DISTINCT dst_host) >=
                    3 * count(DISTINCT regexp_extract(dst_host,
                              '([^.]+\\.[^.]+)$', 1)) AS farm
            FROM e0 GROUP BY src_host ORDER BY src_host
        """,
        # Mirror detection: grouping by md5(text) equals grouping by
        # text, so the oracle groups the closed-form pages by content
        # directly and re-runs the SAME 2..star_max host-set band
        # (the boilerplate string lands on all six solo hosts and
        # must drop) and integer min_shared rule
        "hosts_mirror_pairs": """
            WITH pages AS (
              SELECT 'alpha' || ((doc_id // 2) % 4) || '.example'
                     AS host,
                     'mirrored page ' || doc_id AS text
              FROM documents WHERE doc_id % 2 = 0
              UNION ALL
              SELECT 'beta' || ((doc_id // 2) % 4) || '.example',
                     'mirrored page ' || doc_id
              FROM documents WHERE doc_id % 2 = 0
              UNION ALL
              SELECT 'solo' || ((doc_id // 10) % 6) || '.example',
                     'BOILERPLATE'
              FROM documents
              WHERE doc_id % 2 = 1 AND doc_id % 10 = 9
              UNION ALL
              SELECT 'solo' || (doc_id % 6) || '.example',
                     'unique page ' || doc_id
              FROM documents
              WHERE doc_id % 2 = 1 AND doc_id % 10 <> 9),
            d AS (SELECT DISTINCT host, text FROM pages),
            elig AS (SELECT text FROM d GROUP BY text
                     HAVING count(*) BETWEEN 2 AND 4),
            pairs AS (
              SELECT a.host AS host_a, b.host AS host_b
              FROM d a JOIN d b
                ON a.text = b.text AND a.host < b.host
              WHERE a.text IN (SELECT text FROM elig))
            SELECT host_a, host_b, count(*) AS n_shared,
                   count(*) >= 10 AS mirror
            FROM pairs GROUP BY host_a, host_b
            ORDER BY host_a, host_b
        """,
        # HTTP header semantics: the oracle REBUILDS each record's
        # header block string from doc_id (statuses, the four
        # Content-Type classes incl. the repeated-header first-wins
        # probe, X-Robots-Tag probes, strftime'd Last-Modified, junk
        # line) and RE-RUNS the same regexes — leftmost match =
        # first-wins, charset from the SAME first CT line,
        # word-bounded noindex — plus strptime/epoch
        "warc_http_fields": "WITH" + _HTTP_HDR_CTE + """
            SELECT url,
              CAST(regexp_extract(h,
                   '^HTTP/\\d\\.\\d[ \t]+(\\d{3})', 1)
                   AS BIGINT) AS status,
              lower(trim(regexp_extract(ct, '^([^;]+)', 1)))
                AS content_type,
              nullif(lower(regexp_extract(ct,
                '(?i);\\s*charset\\s*=\\s*"?([A-Za-z0-9_.:-]+)',
                1)), '') AS charset,
              regexp_matches(h,
                '(?im)^x-robots-tag:[^\r\n]*\\bnoindex\\b')
                AS noindex,
              CASE WHEN lm = '' THEN NULL
                   ELSE CAST(epoch(strptime(lm,
                        '%a, %d %b %Y %H:%M:%S GMT')) AS BIGINT)
              END AS last_modified_ts
            FROM p ORDER BY url
        """,
        # Revisit policy: adjacent-change count re-run as a LAG
        # window over (ts, hash) order + the same integer
        # span // max(changes,1) with least/greatest clamps (the
        # fixture's single-capture and 40-day-static probes force
        # both clamp arms)
        "urls_recrawl_schedule": """
            WITH caps AS (
              SELECT
                'https://site' || (doc_id % 50) || '.example/p/'
                  || doc_id AS url,
                1700000000 + k * 86400 *
                  (CASE WHEN doc_id % 11 = 0 THEN 40
                        ELSE 1 + doc_id % 5 END) AS ts,
                CASE doc_id % 3
                  WHEN 0 THEN 'v' || k
                  WHEN 1 THEN 'static'
                  ELSE 'v' || (k // 2) END AS h
              FROM (SELECT doc_id,
                           unnest(range(0,
                             CASE WHEN doc_id % 7 = 0 THEN 1
                                  ELSE 2 + doc_id % 3 END)) AS k
                    FROM documents)),
            w AS (
              SELECT url, ts, h,
                lag(h) OVER (PARTITION BY url ORDER BY ts, h) AS ph
              FROM caps),
            g AS (
              SELECT url, count(*) AS n_captures,
                CAST(sum(CASE WHEN ph IS NOT NULL AND h <> ph
                              THEN 1 ELSE 0 END) AS BIGINT)
                  AS n_changes,
                max(ts) - min(ts) AS span, max(ts) AS last
              FROM w GROUP BY url)
            SELECT url, n_captures, n_changes,
              least(greatest(span // greatest(n_changes, 1), 3600),
                    2592000) AS interval_s,
              last + least(greatest(span // greatest(n_changes, 1),
                                    3600), 2592000) AS due_at_ts
            FROM g ORDER BY url
        """,
        # Domain quality prior: the SHARED PSL CTE (same SQL body as
        # hosts_registrable — cannot drift) resolves each host's
        # registrable domain (ip -> normalized host, suffix -> raw
        # host), joined on doc_id to the SAME feature exprs as
        # docs_quality_scores, folded with integer ratio-of-sums
        "domain_quality_prior": "WITH" + _PSL_CTE + """,
            dom AS (
              SELECT doc_id,
                CASE WHEN is_ip THEN h
                     WHEN nl <= mm THEN host
                     ELSE array_to_string(labs[nl - mm : nl], '.')
                END AS domain
              FROM sel),
            f AS (
              SELECT doc_id,
                cast(len(string_split(text, ' ')) AS BIGINT)
                  AS n_tokens,
                cast(len(list_distinct(string_split(text, ' ')))
                  AS BIGINT) AS n_uniq
              FROM documents),
            j AS (SELECT domain, n_tokens, n_uniq
                  FROM dom JOIN f USING (doc_id))
            SELECT domain, count(*) AS n_docs,
              CAST(sum(n_tokens) AS BIGINT) AS sum_tokens,
              CAST((1000000 * sum(n_uniq)) // sum(n_tokens)
                   AS BIGINT) AS uniq_ppm
            FROM j GROUP BY domain ORDER BY domain
        """,
        # Indexability: the SHARED header CTE re-runs the header
        # regexes; the meta-robots channel comes from the fixture's
        # closed form (the DOM walk itself is oracled in html_meta);
        # the decision is the exact AND of the four gates
        "pages_indexability": "WITH" + _HTTP_HDR_CTE + """,
            g AS (
              SELECT i, url,
                CAST(regexp_extract(h,
                     '^HTTP/\\d\\.\\d[ \t]+(\\d{3})', 1)
                     AS BIGINT) AS status,
                lower(trim(regexp_extract(ct, '^([^;]+)', 1)))
                  AS content_type,
                regexp_matches(h,
                  '(?im)^x-robots-tag:[^\r\n]*\\bnoindex\\b')
                  AS hdr_noindex,
                i % 6 = 1 AS meta_noindex
              FROM p)
            SELECT url, status, content_type, hdr_noindex,
                   meta_noindex,
                   status = 200 AND content_type = 'text/html'
                   AND NOT hdr_noindex AND NOT meta_noindex
                     AS indexable
            FROM g ORDER BY url
        """,
        # Charset decode: closed-form expected strings per class —
        # utf-8 multibyte round-trip, genuine latin-1 bytes, and the
        # lying-utf-8 class surfacing chr(65533) replacement data
        "pages_decode_text": """
            SELECT
              'https://site' || (doc_id % 50) || '.example/p/'
                || doc_id AS url,
              CASE doc_id % 3
                WHEN 0 THEN '<html>café λ ' || doc_id || '</html>'
                WHEN 1 THEN '<html>café ' || doc_id || '</html>'
                ELSE '<html>caf' || chr(65533) || ' ' || doc_id
                     || '</html>'
              END AS text,
              CASE doc_id % 3 WHEN 1 THEN 'latin-1' ELSE 'utf-8'
              END AS charset_used,
              CASE doc_id % 3 WHEN 2 THEN 'replaced' ELSE 'ok'
              END AS decode_status
            FROM documents ORDER BY url
        """,
        # CDX ranged fetch: the fetched payloads reduce to
        # (url, octet length, md5) which DuckDB rebuilds closed-form
        # from the documents text + the fixture's html wrapper — a
        # hash match certifies the index offsets, the ranged reads,
        # the member gunzip and the record re-parse end to end
        "warc_random_access": """
            SELECT
              'https://site' || (doc_id % 50) || '.example/p/'
                || doc_id AS url,
              CAST(strlen('<html><body><p>' || text
                || '</p></body></html>') AS BIGINT) AS n_bytes,
              md5('<html><body><p>' || text
                || '</p></body></html>') AS md5
            FROM documents WHERE doc_id % 37 = 0 ORDER BY url
        """,
        # Revisit accounting: response payload lengths REBUILT from
        # the serialization grammar itself (header string + the
        # Content-Length digit width + the body, via strlen of the
        # reconstructed payload string); revisit payloads are zero by
        # spec; warcinfo = one constant record per file bucket
        "warc_incremental_stats": """
            WITH resp AS (
              SELECT '<html><body><p>' || text
                     || ' v2</p></body></html>' AS html
              FROM documents WHERE doc_id % 4 = 0),
            rp AS (
              SELECT strlen('HTTP/1.1 200 OK' || chr(13) || chr(10)
                || 'Content-Type: text/html; charset=utf-8'
                || chr(13) || chr(10)
                || 'Content-Length: ' || strlen(html)
                || chr(13) || chr(10) || chr(13) || chr(10))
                + strlen(html) AS pb
              FROM resp)
            SELECT * FROM (
              SELECT 'response' AS warc_type,
                (SELECT count(*) FROM resp) AS n_records,
                (SELECT CAST(sum(pb) AS BIGINT) FROM rp)
                  AS payload_bytes
              UNION ALL
              SELECT 'revisit',
                (SELECT count(*) FROM documents
                 WHERE doc_id % 4 <> 0),
                CAST(0 AS BIGINT)
              UNION ALL
              -- constant 8: the fixture ALWAYS writes 8 WARC files,
              -- one warcinfo each, even if a tiny sf leaves a
              -- doc_id % 8 residue class empty
              SELECT 'warcinfo',
                CAST(8 AS BIGINT),
                CAST(8 * strlen('software: webxtract-synth'
                                || chr(13) || chr(10)) AS BIGINT))
            ORDER BY warc_type
        """,
        # Crawl-budget apportionment: the SHARED PSL CTE + the same
        # feature exprs rebuild the weights, then base/remainder via
        # window SUM and the leftover ranking via ROW_NUMBER over
        # (rem DESC, domain) — all integer, sum(quota) == budget
        "domain_crawl_quota": "WITH" + _PSL_CTE + """,
            dom AS (
              SELECT doc_id,
                CASE WHEN is_ip THEN h
                     WHEN nl <= mm THEN host
                     ELSE array_to_string(labs[nl - mm : nl], '.')
                END AS domain
              FROM sel),
            f AS (
              SELECT doc_id,
                cast(len(string_split(text, ' ')) AS BIGINT)
                  AS n_tokens
              FROM documents),
            q AS (
              SELECT domain, CAST(sum(n_tokens) AS BIGINT) AS weight
              FROM dom JOIN f USING (doc_id) GROUP BY domain),
            rr AS (
              SELECT domain, weight,
                (100000 * weight) // W AS base,
                (100000 * weight) % W AS rem
              FROM (SELECT *, SUM(weight) OVER () AS W FROM q)),
            fin AS (
              SELECT *,
                100000 - SUM(base) OVER () AS leftover,
                ROW_NUMBER() OVER (ORDER BY rem DESC, domain) AS rn
              FROM rr)
            SELECT domain, weight,
              CAST(base + CASE WHEN rn <= leftover THEN 1 ELSE 0 END
                   AS BIGINT) AS quota
            FROM fin ORDER BY domain
        """,
        # Translation pairs: the closed-form alternate table (the
        # html_alternates fixture's hreflang rows; the meta-refresh
        # row must NOT pair) self-joined with lang_a < lang_b
        "docs_translation_pairs": """
            WITH a AS (
              SELECT doc_id,
                CASE k WHEN 0 THEN 'en' WHEN 1 THEN 'de'
                       ELSE 'fr' END AS lang,
                'https://site' || (doc_id % 50) || '.example/'
                  || CASE k WHEN 0 THEN 'en' WHEN 1 THEN 'de'
                            ELSE 'fr' END
                  || '/p/' || doc_id AS href
              FROM (SELECT doc_id,
                           unnest(range(0, 1 + doc_id % 3)) AS k
                    FROM documents))
            SELECT x.doc_id, x.lang AS lang_a, x.href AS url_a,
                   y.lang AS lang_b, y.href AS url_b
            FROM a x JOIN a y
              ON x.doc_id = y.doc_id AND x.lang < y.lang
            ORDER BY x.doc_id, lang_a, lang_b
        """,
    }
    # RRF fuses the two REGISTERED rankings verbatim, so the oracle
    # composes their SQL bodies and can never drift from them
    # the index READ path shares the full-scan scorer's oracle
    # VERBATIM: two physical plans (scan + broadcast vs pruned
    # postings + doc-length join), one hash-identical answer
    d["docs_bm25_retrieve"] = d["docs_bm25_topk"]
    d["docs_rrf_fusion"] = _rrf_oracle(d["docs_bm25_topk"],
                                       d["docs_quality_scores"])
    # likewise, the confusion matrix composes the langid oracle
    d["docs_lang_confusion"] = f"""
        WITH pred AS ({_langid_oracle()})
        SELECT d.lang, p.lang_pred, count(*) AS n
        FROM documents d JOIN pred p USING (doc_id)
        GROUP BY d.lang, p.lang_pred
    """
    d["customer_rfm"] = """
        WITH c AS (SELECT o_custkey AS custkey,
                          max(o_orderdate) AS last_o,
                          count(*) AS frequency,
                          CAST(sum(CAST(round(o_totalprice * 100)
                                        AS BIGINT)) AS BIGINT)
                              AS monetary_cents
                   FROM orders GROUP BY 1),
        mx AS (SELECT max(last_o) AS m FROM c),
        f AS (SELECT custkey,
                     (epoch_us((SELECT m FROM mx)) - epoch_us(last_o))
                         // 86400000000 AS recency_days,
                     frequency, monetary_cents FROM c),
        t AS (SELECT custkey, recency_days, frequency, monetary_cents,
                     CAST(ntile(5) OVER (ORDER BY recency_days, custkey)
                          AS BIGINT) AS r_tile,
                     CAST(ntile(5) OVER (ORDER BY frequency DESC,
                                         custkey) AS BIGINT) AS f_tile,
                     CAST(ntile(5) OVER (ORDER BY monetary_cents DESC,
                                         custkey) AS BIGINT) AS m_tile
              FROM f)
        SELECT custkey, recency_days, frequency, monetary_cents,
               r_tile, f_tile, m_tile,
               r_tile * 100 + f_tile * 10 + m_tile AS segment
        FROM t
    """
    # Adamic-Adar: the Jaccard twin's wedge join with the pinned
    # integer micro center weights round_even(1e6 / ln(deg))
    d["parts_adamic_adar"] = """
        WITH e0 AS (
            SELECT DISTINCT a.l_partkey AS u, b.l_partkey AS v
            FROM lineitem a JOIN lineitem b
              ON a.l_orderkey = b.l_orderkey
             AND a.l_partkey < b.l_partkey),
        und AS (SELECT u AS src, v AS dst FROM e0
                UNION ALL SELECT v, u FROM e0),
        deg AS (SELECT src AS node, count(*) AS d
                FROM und GROUP BY src),
        wt AS (SELECT node,
                      CAST(round_even(1000000.0
                           / ln(CAST(d AS DOUBLE)), 0) AS BIGINT) AS w
               FROM deg WHERE d >= 2),
        wed AS (SELECT a.dst AS x, b.dst AS y, count(*) AS common,
                       CAST(sum(wt.w) AS BIGINT) AS aa_micro
                FROM und a JOIN und b
                  ON a.src = b.src AND a.dst < b.dst
                JOIN wt ON wt.node = a.src
                GROUP BY 1, 2),
        ne AS (SELECT w.x, w.y, w.common, w.aa_micro FROM wed w
               LEFT JOIN e0 ON e0.u = w.x AND e0.v = w.y
               WHERE e0.u IS NULL AND w.common >= 2)
        SELECT x AS part_a, y AS part_b, common, aa_micro
        FROM ne ORDER BY aa_micro DESC, part_a, part_b LIMIT 25
    """
    d["docs_snapshot_diff"] = """
        WITH old AS (SELECT doc_id, n_chars, lang FROM documents
                     WHERE doc_id % 7 <> 0),
        new AS (SELECT doc_id,
                       CASE WHEN doc_id % 4 = 0 THEN n_chars + 1
                            ELSE n_chars END AS n_chars,
                       lang
                FROM documents WHERE doc_id % 5 <> 0)
        SELECT coalesce(o.doc_id, n.doc_id) AS doc_id,
               CASE WHEN o.doc_id IS NULL THEN 'insert'
                    WHEN n.doc_id IS NULL THEN 'delete'
                    ELSE 'update' END AS change,
               coalesce(o.n_chars, -1) AS old_n_chars,
               coalesce(n.n_chars, -1) AS new_n_chars
        FROM old o FULL OUTER JOIN new n ON o.doc_id = n.doc_id
        WHERE o.doc_id IS NULL OR n.doc_id IS NULL
           OR o.n_chars <> n.n_chars OR o.lang <> n.lang
    """
    # ABC classes via integer cross-multiplication — no float share
    d["customer_abc"] = """
        WITH s AS (SELECT o_custkey AS custkey,
                          CAST(sum(CAST(round(o_totalprice * 100)
                                        AS BIGINT)) AS BIGINT) AS cents
                   FROM orders GROUP BY 1),
        t AS (SELECT (SELECT CAST(sum(cents) AS BIGINT) FROM s) AS tot),
        r AS (SELECT custkey, cents,
                     row_number() OVER (ORDER BY cents DESC, custkey)
                         AS rn,
                     CAST(sum(cents) OVER (ORDER BY cents DESC, custkey)
                          AS BIGINT) AS cum_cents
              FROM s)
        SELECT custkey, cents, rn, cum_cents,
               CASE WHEN cum_cents * 5 <= t.tot * 4 THEN 'A'
                    WHEN cum_cents * 20 <= t.tot * 19 THEN 'B'
                    ELSE 'C' END AS abc
        FROM r CROSS JOIN t
    """
    d["parts_degree_hist"] = """
        WITH e0 AS (
            SELECT DISTINCT a.l_partkey AS u, b.l_partkey AS v
            FROM lineitem a JOIN lineitem b
              ON a.l_orderkey = b.l_orderkey
             AND a.l_partkey < b.l_partkey),
        und AS (SELECT u AS src FROM e0 UNION ALL SELECT v FROM e0),
        deg AS (SELECT src, count(*) AS d FROM und GROUP BY src)
        SELECT d AS degree, count(*) AS n_nodes FROM deg GROUP BY d
    """
    d["customers_both_urgent_failed"] = """
        SELECT o_custkey AS custkey,
               CAST(count(*) FILTER (WHERE o_orderpriority = '1-URGENT')
                    AS BIGINT) AS n_urgent,
               CAST(count(*) FILTER (WHERE o_orderstatus = 'F')
                    AS BIGINT) AS n_failed
        FROM orders GROUP BY 1
        HAVING count(*) FILTER (WHERE o_orderpriority = '1-URGENT') > 0
           AND count(*) FILTER (WHERE o_orderstatus = 'F') > 0
    """
    d["events_time_to_convert"] = """
        WITH s AS (SELECT user_id, ts, event_id,
                          row_number() OVER (PARTITION BY user_id
                                             ORDER BY ts, event_id) AS rn
                   FROM events WHERE event_type = 'signup'),
        fs AS (SELECT user_id, ts AS signup_ts, event_id AS se
               FROM s WHERE rn = 1),
        p AS (SELECT e.user_id, fs.signup_ts, e.ts AS pts,
                     row_number() OVER (PARTITION BY e.user_id
                                        ORDER BY e.ts, e.event_id) AS rn
              FROM events e JOIN fs ON e.user_id = fs.user_id
              WHERE e.event_type = 'purchase'
                AND (e.ts > fs.signup_ts
                     OR (e.ts = fs.signup_ts
                         AND e.event_id > fs.se)))
        SELECT user_id, signup_ts, pts AS purchase_ts,
               epoch_us(pts) - epoch_us(signup_ts) AS gap_us
        FROM p WHERE rn = 1
    """
    d["orders_dow_profile"] = """
        SELECT CAST(isodow(o_orderdate) AS BIGINT) AS isodow,
               count(*) AS n_orders,
               round(sum(round(o_totalprice * 100)) / 100.0, 2)
                   AS revenue
        FROM orders GROUP BY 1
    """
    # exact log2 bucket from the binary-string length (a float log2
    # at a 2^k boundary can mis-bucket); engine uses frexp's exponent
    d["events_value_log_hist"] = """
        WITH x AS (SELECT CAST(round(value * 100) AS BIGINT) AS cents
                   FROM events),
        p AS (SELECT length(bin(cents)) - 1 AS bucket
              FROM x WHERE cents > 0)
        SELECT bucket, count(*) AS n,
               CAST(1 << bucket AS BIGINT) AS lo_cents,
               CAST((1 << (bucket + 1)) - 1 AS BIGINT) AS hi_cents
        FROM p GROUP BY bucket
    """
    d["parts_clustering_coeff"] = """
        WITH e0 AS (
            SELECT DISTINCT a.l_partkey AS u, b.l_partkey AS v
            FROM lineitem a JOIN lineitem b
              ON a.l_orderkey = b.l_orderkey
             AND a.l_partkey < b.l_partkey),
        und AS (SELECT u AS src, v AS dst FROM e0
                UNION ALL SELECT v, u FROM e0),
        deg AS (SELECT src AS node, count(*) AS d
                FROM und GROUP BY src),
        tri AS (SELECT a.src AS node, count(*) AS t
                FROM und a JOIN und b
                  ON a.src = b.src AND a.dst < b.dst
                JOIN e0 ON e0.u = a.dst AND e0.v = b.dst
                GROUP BY a.src)
        SELECT deg.node, deg.d AS degree,
               coalesce(tri.t, 0) AS triangles,
               CASE WHEN deg.d >= 2 THEN
                   coalesce(tri.t, 0) * 1000000
                       // (deg.d * (deg.d - 1) // 2)
               ELSE 0 END AS cc_micro
        FROM deg LEFT JOIN tri USING (node)
    """
    # CUSUM closed form: s_t = P_t - least(0, running min of P)
    d["events_value_cusum"] = """
        WITH dd AS (SELECT user_id, ts, event_id,
                           CAST(round(value * 100) AS BIGINT) - 5000
                               AS d
                    FROM events),
        p AS (SELECT user_id, ts, event_id,
                     CAST(sum(d) OVER (PARTITION BY user_id
                                       ORDER BY ts, event_id)
                          AS BIGINT) AS pt
              FROM dd),
        q AS (SELECT user_id, pt,
                     CAST(min(pt) OVER (PARTITION BY user_id
                                        ORDER BY ts, event_id)
                          AS BIGINT) AS mp,
                     row_number() OVER (PARTITION BY user_id
                                        ORDER BY ts DESC,
                                                 event_id DESC) AS rvn
              FROM p),
        s AS (SELECT user_id, pt - least(mp, 0) AS s, rvn FROM q)
        SELECT user_id, count(*) AS n_events,
               CAST(max(s) FILTER (WHERE rvn = 1) AS BIGINT)
                   AS final_cusum,
               CAST(max(s) AS BIGINT) AS max_cusum
        FROM s GROUP BY user_id
    """
    d["docs_ngram_novelty"] = """
        WITH w AS (SELECT doc_id, string_split(text, ' ') AS w
                   FROM documents),
        g AS (SELECT DISTINCT doc_id,
                     unnest(list_transform(range(1, len(w) - 1),
                            i -> w[i] || ' ' || w[i+1] || ' '
                                 || w[i+2])) AS g
              FROM w WHERE len(w) >= 3),
        fo AS (SELECT g, min(doc_id) AS d0 FROM g GROUP BY g),
        nd AS (SELECT doc_id, count(*) AS n_distinct
               FROM g GROUP BY doc_id),
        nv AS (SELECT d0 AS doc_id, count(*) AS novel
               FROM fo GROUP BY d0)
        SELECT nd.doc_id, nd.n_distinct,
               coalesce(nv.novel, 0) AS novel,
               coalesce(nv.novel, 0) * 1000000 // nd.n_distinct
                   AS novelty_micro
        FROM nd LEFT JOIN nv USING (doc_id)
    """
    # same spec as the sort-based twin — the engine-side difference
    # (distributed selection vs co-located sort) is the point
    d["events_value_median_dist"] = """
        SELECT event_type, round(median(value), 6) AS median_value
        FROM events GROUP BY event_type
    """
    d["events_error_band_join"] = """
        WITH p AS (SELECT event_id, user_id, ts FROM events
                   WHERE event_type = 'purchase'),
        e AS (SELECT user_id, ts FROM events
              WHERE event_type = 'error')
        SELECT p.event_id AS purchase_id, p.user_id,
               CAST(count(e.ts) AS BIGINT) AS n_errors_near
        FROM p LEFT JOIN e
          ON p.user_id = e.user_id
         AND e.ts BETWEEN p.ts - INTERVAL 5 MINUTE
                      AND p.ts + INTERVAL 5 MINUTE
        GROUP BY p.event_id, p.user_id
    """
    d["orders_cohort_ltv"] = """
        WITH f AS (SELECT o_custkey,
                          min(date_trunc('month', o_orderdate)) AS cm
                   FROM orders GROUP BY 1),
        x AS (SELECT f.cm,
                     date_trunc('month', o.o_orderdate) AS om,
                     CAST(round(o.o_totalprice * 100) AS BIGINT)
                         AS cents
              FROM orders o JOIN f USING (o_custkey))
        SELECT cm AS cohort_month,
               CAST((year(om) - year(cm)) * 12
                    + (month(om) - month(cm)) AS BIGINT) AS age_months,
               count(*) AS n_orders,
               round(sum(cents) / 100.0, 2) AS revenue
        FROM x GROUP BY 1, 2
    """
    # strict-sequence comparisons throughout: (ts, event_id) ordering
    d["events_funnel_strict"] = """
        WITH s AS (SELECT user_id, ts, event_id,
                          row_number() OVER (PARTITION BY user_id
                                             ORDER BY ts, event_id) AS rn
                   FROM events WHERE event_type = 'signup'),
        fs AS (SELECT user_id, ts AS sts, event_id AS se
               FROM s WHERE rn = 1),
        p AS (SELECT e.user_id, fs.sts, fs.se, e.ts AS pts,
                     e.event_id AS pe,
                     row_number() OVER (PARTITION BY e.user_id
                                        ORDER BY e.ts, e.event_id) AS rn
              FROM events e JOIN fs ON e.user_id = fs.user_id
              WHERE e.event_type = 'purchase'
                AND (e.ts > fs.sts
                     OR (e.ts = fs.sts AND e.event_id > fs.se))),
        fp AS (SELECT user_id, sts, se, pts, pe FROM p WHERE rn = 1),
        bad AS (SELECT DISTINCT fp.user_id
                FROM events e JOIN fp ON e.user_id = fp.user_id
                WHERE e.event_type = 'error'
                  AND (e.ts > fp.sts
                       OR (e.ts = fp.sts AND e.event_id > fp.se))
                  AND (e.ts < fp.pts
                       OR (e.ts = fp.pts AND e.event_id < fp.pe)))
        SELECT fp.user_id, fp.se AS signup_id, fp.pe AS purchase_id,
               epoch_us(fp.pts) - epoch_us(fp.sts) AS gap_us
        FROM fp LEFT JOIN bad ON bad.user_id = fp.user_id
        WHERE bad.user_id IS NULL
    """
    d["emb_mmr_rerank"] = _mmr_oracle()
    d["nation_region_revenue_share"] = """
        WITH x AS (SELECT r.r_name AS region, n.n_name AS nation,
                          CAST(sum(CAST(round(o.o_totalprice * 100)
                                        AS BIGINT)) AS BIGINT) AS cents
                   FROM orders o
                   JOIN customer c ON c.c_custkey = o.o_custkey
                   JOIN nation n ON n.n_nationkey = c.c_nationkey
                   JOIN region r ON r.r_regionkey = n.n_regionkey
                   GROUP BY 1, 2),
        t AS (SELECT region, CAST(sum(cents) AS BIGINT) AS tot
              FROM x GROUP BY region)
        SELECT x.region, x.nation,
               round(x.cents / 100.0, 2) AS revenue,
               x.cents * 1000000 // t.tot AS share_ppm
        FROM x JOIN t USING (region)
    """
    d["events_attribution_linear"] = """
        WITH p AS (SELECT event_id, user_id, ts FROM events
                   WHERE event_type = 'purchase'),
        t AS (SELECT event_id, user_id, ts, event_type FROM events
              WHERE event_type IN ('click', 'view')),
        j AS (SELECT p.event_id AS pid, t.event_type AS touch_type
              FROM p JOIN t ON p.user_id = t.user_id
               AND epoch_us(p.ts) - epoch_us(t.ts) <= 86400000000
               AND (t.ts < p.ts
                    OR (t.ts = p.ts AND t.event_id < p.event_id))),
        n AS (SELECT pid, count(*) AS n FROM j GROUP BY pid),
        c AS (SELECT j.pid, j.touch_type, count(*) AS k,
                     any_value(n.n) AS n
              FROM j JOIN n USING (pid) GROUP BY j.pid, j.touch_type)
        SELECT touch_type, count(*) AS n_purchases,
               CAST(sum((1000000 // n) * k) AS BIGINT) AS credit_ppm
        FROM c GROUP BY touch_type
    """
    d["docs_source_entropy"] = """
        WITH c AS (SELECT source, count(*) AS n FROM documents
                   GROUP BY source),
        t AS (SELECT CAST(sum(n) AS BIGINT) AS n_tot,
                     count(*) AS n_src,
                     CAST(sum(CAST(round_even(
                          ln(CAST(n AS DOUBLE)) * CAST(n AS DOUBLE)
                          * 1000000.0, 0) AS BIGINT)) AS BIGINT) AS s
              FROM c)
        SELECT n_src AS n_sources, n_tot AS n_docs,
               CAST(round_even(ln(CAST(n_tot AS DOUBLE)) * 1000000.0,
                               0) AS BIGINT) - s // n_tot
                   AS entropy_micro
        FROM t
    """
    d["emb_drift_monitor"] = """
        WITH x AS (
            SELECT vec_id, unnest(embedding) AS v,
                   generate_subscripts(embedding, 1) - 1 AS dim
            FROM embeddings),
        rng AS (SELECT dim, min(v) AS mn, max(v) AS mx
                FROM x GROUP BY dim),
        cut AS (SELECT max(vec_id) // 2 AS c FROM embeddings),
        codes AS (
            SELECT x.vec_id, x.dim,
                   CASE WHEN rng.mx > rng.mn THEN
                       CAST(least(254.0,
                            floor((CAST(x.v AS DOUBLE)
                                   - CAST(rng.mn AS DOUBLE)) * 255.0
                                  / (CAST(rng.mx AS DOUBLE)
                                     - CAST(rng.mn AS DOUBLE))))
                            AS BIGINT) - 127
                   ELSE -127 END AS code
            FROM x JOIN rng USING (dim)),
        agg AS (
            SELECT dim,
                   CAST(sum(code) FILTER (
                        WHERE vec_id < (SELECT c FROM cut))
                        AS BIGINT) AS sum_a,
                   CAST(count(*) FILTER (
                        WHERE vec_id < (SELECT c FROM cut))
                        AS BIGINT) AS n_a,
                   CAST(sum(code) FILTER (
                        WHERE vec_id >= (SELECT c FROM cut))
                        AS BIGINT) AS sum_b,
                   CAST(count(*) FILTER (
                        WHERE vec_id >= (SELECT c FROM cut))
                        AS BIGINT) AS n_b
            FROM codes GROUP BY dim)
        SELECT dim, sum_a, n_a, sum_b, n_b,
               sum_a * n_b - sum_b * n_a AS diff_x
        FROM agg
    """
    d["docs_dup_ratio_by_source"] = """
        SELECT source, count(*) AS n_docs,
               CAST(count(DISTINCT md5(text)) AS BIGINT) AS n_distinct,
               (count(*) - count(DISTINCT md5(text))) * 1000000
                   // count(*) AS dup_ppm
        FROM documents GROUP BY source
    """
    # Real-PDF fixtures (ops/pdf.py fixture_pdf): every probed field is
    # closed-form from doc_id, so a hash match certifies the complete
    # from-scratch xref walk (tables / xref streams + PNG Up predictor /
    # ObjStm type-2 entries / incremental /Prev chains), the
    # Flate+ASCIIHex filter cascade, and the content-stream
    # show-operator accounting across every layout variant.
    d["pdfs_probe"] = """
        WITH pg AS (SELECT doc_id, unnest(range(0, 1 + doc_id % 3)) AS p
                    FROM documents),
        ln AS (SELECT doc_id, p,
                      unnest(range(0, 3 + (doc_id + p) % 4)) AS l
               FROM pg),
        sl AS (SELECT doc_id, p, l, (doc_id + p + l) % 3 AS sel FROM ln),
        wd AS (SELECT doc_id, p, l,
                      unnest(range(0, 2 + sel)) AS w
               FROM sl),
        cw AS (SELECT doc_id,
                      CAST(sum(length(CAST((31 * doc_id + 17 * p + 7 * l
                                            + w) % 97 AS VARCHAR)) + 1)
                           AS BIGINT) AS chars_w
               FROM wd GROUP BY doc_id),
        sh AS (SELECT doc_id,
                      CAST(sum(CASE sel WHEN 1 THEN 1
                               ELSE 2 + sel END) AS BIGINT) AS shows_l
               FROM sl GROUP BY doc_id),
        kv AS (SELECT doc_id,
                      CAST(sum(4 + length(CAST((13 * doc_id + p) % 100
                                               AS VARCHAR))) AS BIGINT)
                          AS chars_kv,
                      CAST(2 * count(*) AS BIGINT) AS shows_kv
               FROM pg GROUP BY doc_id)
        SELECT d.doc_id AS media_id,
               CAST(1 + d.doc_id % 3 AS BIGINT) AS n_pages,
               CASE d.doc_id % 3 WHEN 0 THEN 'table'
                    WHEN 1 THEN 'xrefstream' ELSE 'objstm' END
                   AS xref_kind,
               CASE WHEN d.doc_id % 10 = 0 THEN 'ahx+flate'
                    WHEN d.doc_id % 5 = 0 THEN 'ahx'
                    WHEN d.doc_id % 2 = 0 THEN 'flate'
                    ELSE 'plain' END AS content_filter,
               CAST(3 + 2 * (1 + d.doc_id % 3)
                    + CASE WHEN d.doc_id % 9 = 0 THEN 1 ELSE 0 END
                    + CASE d.doc_id % 3 WHEN 0 THEN 0 WHEN 1 THEN 1
                      ELSE 2 END
                    + CASE WHEN d.doc_id % 11 = 0 THEN
                        1 + CASE WHEN d.doc_id % 3 <> 0 THEN 1
                            ELSE 0 END
                      ELSE 0 END AS BIGINT) AS n_objects,
               CAST(1 + CASE WHEN d.doc_id % 11 = 0 THEN 1 ELSE 0 END
                    AS BIGINT) AS n_xref_sections,
               sh.shows_l + kv.shows_kv AS n_shows,
               cw.chars_w + kv.chars_kv AS n_chars
        FROM documents d
        JOIN cw ON cw.doc_id = d.doc_id
        JOIN sh ON sh.doc_id = d.doc_id
        JOIN kv ON kv.doc_id = d.doc_id
    """
    # Reading-order text regenerated byte-for-byte: body lines in l
    # order then the KV line, words space-joined, lines newline-joined
    d["pdfs_text_extract"] = """
        WITH pg AS (SELECT doc_id, unnest(range(0, 1 + doc_id % 3)) AS p
                    FROM documents),
        ln AS (SELECT doc_id, p,
                      unnest(range(0, 3 + (doc_id + p) % 4)) AS l
               FROM pg),
        wd AS (SELECT doc_id, p, l,
                      unnest(range(0, 2 + (doc_id + p + l) % 3)) AS w
               FROM ln),
        lt AS (SELECT doc_id, p, l,
                      string_agg('w' || CAST((31 * doc_id + 17 * p
                                              + 7 * l + w) % 97
                                             AS VARCHAR),
                                 ' ' ORDER BY w) AS t
               FROM wd GROUP BY doc_id, p, l),
        body AS (SELECT doc_id, p,
                        string_agg(t, chr(10) ORDER BY l) AS bt
                 FROM lt GROUP BY doc_id, p)
        SELECT doc_id AS media_id, CAST(p AS BIGINT) AS page,
               bt || chr(10) || 'k'
                  || CAST((doc_id + p) % 10 AS VARCHAR) || ': v'
                  || CAST((13 * doc_id + p) % 100 AS VARCHAR) AS text
        FROM body
    """
    d["pdfs_kv_fields"] = """
        WITH pg AS (SELECT doc_id, unnest(range(0, 1 + doc_id % 3)) AS p
                    FROM documents)
        SELECT doc_id AS media_id, CAST(p AS BIGINT) AS page,
               'k' || CAST((doc_id + p) % 10 AS VARCHAR) AS key_text,
               'v' || CAST((13 * doc_id + p) % 100 AS VARCHAR)
                   AS value_text
        FROM pg
    """
    # EXIF fixtures (ops/exif.py fixture_exif): a hash match certifies
    # the TIFF IFD walk (both byte orders, inline vs offset values,
    # RATIONAL GPS triples, Exif + GPS sub-IFDs, the chained thumbnail
    # IFD) and the JPEG APP1 extraction, field-for-field
    d["images_exif_probe"] = """
        SELECT doc_id AS media_id,
               CASE WHEN doc_id % 2 = 0 THEN 'tiff' ELSE 'jpeg' END
                   AS kind,
               CASE WHEN doc_id % 3 = 0 THEN 'MM' ELSE 'II' END
                   AS endian,
               CAST(640 + doc_id % 17 AS BIGINT) AS width,
               CAST(480 + doc_id % 11 AS BIGINT) AS height,
               'Make' || CAST(doc_id % 7 AS VARCHAR) AS make,
               'Model' || CAST(doc_id % 13 AS VARCHAR) AS model,
               CAST(1 + doc_id % 8 AS BIGINT) AS orientation,
               '2020:01:'
                   || lpad(CAST(1 + doc_id % 28 AS VARCHAR), 2, '0')
                   || ' '
                   || lpad(CAST(doc_id % 24 AS VARCHAR), 2, '0')
                   || ':00:00' AS "datetime",
               CASE WHEN doc_id % 4 <> 1 THEN
                   '2021:06:'
                   || lpad(CAST(1 + doc_id % 30 AS VARCHAR), 2, '0')
                   || ' 12:00:00' ELSE '' END AS dt_original,
               CAST(CASE WHEN doc_id % 4 <> 2 THEN
                   (CASE WHEN doc_id % 2 = 0 THEN 1 ELSE -1 END)
                   * ((doc_id % 90) * 3600 + ((7 * doc_id) % 60) * 60
                      + doc_id % 60) END AS BIGINT) AS lat_arcsec,
               CAST(CASE WHEN doc_id % 4 <> 2 THEN
                   (CASE WHEN doc_id % 3 = 0 THEN -1 ELSE 1 END)
                   * ((doc_id % 180) * 3600 + ((11 * doc_id) % 60) * 60
                      + (13 * doc_id) % 60) END AS BIGINT) AS lon_arcsec,
               CAST(1 + CASE WHEN doc_id % 5 = 0 THEN 1 ELSE 0 END
                    AS BIGINT) AS n_ifds,
               CAST(6 + CASE WHEN doc_id % 4 <> 1 THEN 1 ELSE 0 END
                      + CASE WHEN doc_id % 4 <> 2 THEN 1 ELSE 0 END
                    AS BIGINT) AS n_tags
        FROM documents
    """
    # TIFF fixtures (ops/tiffcodec.py fixture_tiff): pixel(k) =
    # (k + 7*doc_id) % 256 row-major, so the pixel SUM over n = w*h
    # pixels is cycles*32640 plus a wraparound-split arithmetic series
    # — pure closed form, certifying every decoded byte through
    # none/PackBits/LZW strips in both byte orders
    d["images_tiff_decode"] = """
        WITH p AS (
            SELECT doc_id,
                   CAST(24 + doc_id % 5 AS BIGINT) AS w,
                   CAST(16 + doc_id % 3 AS BIGINT) AS h,
                   (7 * doc_id) % 256 AS c
            FROM documents),
        q AS (SELECT doc_id, w, h, c, w * h AS n,
                     (w * h) // 256 AS cycles, (w * h) % 256 AS rem
              FROM p)
        SELECT doc_id AS media_id, w AS width, h AS height,
               CAST(CASE doc_id % 3 WHEN 0 THEN 1 WHEN 1 THEN 32773
                    ELSE 5 END AS BIGINT) AS compression,
               CAST(cycles * 32640
                    + CASE WHEN c + rem <= 256
                      THEN rem * c + rem * (rem - 1) // 2
                      ELSE (256 - c) * c
                           + (256 - c) * (255 - c) // 2
                           + (rem - 256 + c) * (rem - 257 + c) // 2
                      END AS BIGINT) AS pixel_sum
        FROM q
    """
    # DOCX fixtures (ops/docx.py fixture_docx): paragraph text
    # regenerated byte-for-byte — a hash match certifies the ZIP
    # central-directory walk (STORE and DEFLATE arms, CRC-verified)
    # and the w:p/w:r/w:t run scanner
    d["docs_docx_extract"] = """
        WITH pg AS (SELECT doc_id, unnest(range(0, 2 + doc_id % 4)) AS p
                    FROM documents),
        wd AS (SELECT doc_id, p,
                      unnest(range(0, 3 + (doc_id + p) % 3)) AS k
               FROM pg)
        SELECT doc_id AS media_id, CAST(p AS BIGINT) AS para,
               string_agg('d' || CAST((23 * doc_id + 11 * p + 5 * k)
                                      % 89 AS VARCHAR),
                          ' ' ORDER BY k) AS text
        FROM wd GROUP BY doc_id, p
    """
    # ODT/RTF fixtures (ops/office.py): paragraph text regenerated
    # byte-for-byte — certifying the stored-mimetype rule + ZIP walk +
    # text:p scanner (ODT) and the control-word tokenizer (RTF)
    d["docs_odt_extract"] = """
        WITH pg AS (SELECT doc_id, unnest(range(0, 1 + doc_id % 3)) AS p
                    FROM documents),
        wd AS (SELECT doc_id, p,
                      unnest(range(0, 2 + (doc_id + p) % 4)) AS k
               FROM pg)
        SELECT doc_id AS media_id, CAST(p AS BIGINT) AS para,
               string_agg('o' || CAST((29 * doc_id + 13 * p + 3 * k)
                                      % 83 AS VARCHAR),
                          ' ' ORDER BY k) AS text
        FROM wd GROUP BY doc_id, p
    """
    d["docs_rtf_extract"] = """
        WITH pg AS (SELECT doc_id, unnest(range(0, 2 + doc_id % 3)) AS p
                    FROM documents),
        wd AS (SELECT doc_id, p,
                      unnest(range(0, 2 + (doc_id + p) % 3)) AS k
               FROM pg)
        SELECT doc_id AS media_id, CAST(p AS BIGINT) AS para,
               string_agg('r' || CAST((37 * doc_id + 17 * p + 7 * k)
                                      % 79 AS VARCHAR),
                          ' ' ORDER BY k) AS text
        FROM wd GROUP BY doc_id, p
    """
    # SQLite fixtures (ops/sqlitewalk.py): databases written by the
    # AUTHORITATIVE stdlib engine, rows read back by the from-scratch
    # b-tree walker — the hash certifies header parse, sqlite_master
    # bootstrap, record decode and the rowid-alias NULL substitution
    d["docs_sqlite_extract"] = """
        WITH rw AS (SELECT doc_id, unnest(range(0, 3 + doc_id % 5)) AS r
                    FROM documents)
        SELECT doc_id AS media_id, CAST(r + 1 AS BIGINT) AS rowid,
               'n' || CAST((7 * doc_id + 3 * r) % 100 AS VARCHAR)
                   AS name,
               CAST((13 * doc_id + 11 * r) % 10000 AS BIGINT) AS val
        FROM rw
    """
    # iCalendar fixtures (ops/ical.py): every event regenerated
    # closed-form — summaries long enough that EVERY file folds, and
    # every value carries escaped separators, so the hash certifies
    # the unfold splice and the §3.3.11 unescape exactly
    d["docs_ics_extract"] = """
        WITH ev AS (SELECT doc_id, unnest(range(0, 1 + doc_id % 3)) AS e
                    FROM documents),
        q AS (SELECT doc_id, e,
                     (53 * doc_id + 29 * e) % 983 AS n
              FROM ev)
        SELECT doc_id AS media_id, CAST(e AS BIGINT) AS event,
               'ev' || CAST(doc_id AS VARCHAR) || '-'
                   || CAST(e AS VARCHAR) || '@webxtract.example'
                   AS uid,
               '2026' || lpad(CAST(1 + (doc_id + e) % 12 AS VARCHAR),
                              2, '0')
                   || lpad(CAST(1 + (doc_id + e) % 28 AS VARCHAR),
                           2, '0')
                   || 'T' || lpad(CAST((3 * doc_id + e) % 24
                                       AS VARCHAR), 2, '0')
                   || '0000Z' AS dtstart,
               'Event ' || CAST(n AS VARCHAR) || ' '
                   || repeat('agenda item review ', 4)
                   || 'wrap; up, done' AS summary,
               'Room ' || CAST(n % 40 AS VARCHAR) || '; floor '
                   || CAST(e AS VARCHAR) AS location,
               'line one ' || CAST(n AS VARCHAR) || chr(10)
                   || 'line two ' || CAST(e AS VARCHAR)
                   AS description
        FROM q
    """
    # tar fixtures (ops/tarwalk.py): every entry regenerated
    # closed-form — certifying the checksum-verified ustar walk, the
    # POSIX prefix rejoin for >100-byte paths, and the gzip member
    # (plain for even ids, wrapped for odd)
    d["docs_tar_extract"] = """
        WITH en AS (SELECT doc_id, unnest(range(0, 2 + doc_id % 3)) AS k
                    FROM documents)
        SELECT doc_id AS media_id, CAST(k AS BIGINT) AS entry,
               CASE WHEN k = 0 AND doc_id % 7 = 0
                    THEN repeat('d', 60) || '/sub'
                         || CAST(doc_id % 10 AS VARCHAR) || '/'
                         || repeat('f', 40) || '.txt'
                    ELSE 'dir' || CAST(doc_id % 5 AS VARCHAR)
                         || '/file' || CAST(k AS VARCHAR) || '.txt'
               END AS name,
               CAST(length('tar ' || CAST((17 * doc_id + 7 * k) % 991
                                          AS VARCHAR) || ' content')
                    AS BIGINT) AS size,
               'tar ' || CAST((17 * doc_id + 7 * k) % 991 AS VARCHAR)
                   || ' content' AS text
        FROM en
    """
    # CSV fixtures (ops/csvtext.py): every cell regenerated
    # closed-form — certifying the quote-aware dialect sniff (the
    # delimiter is NOT given to the reader) and the full RFC 4180
    # machine incl. embedded delimiters, doubled quotes and
    # multi-line quoted records
    d["docs_csv_extract"] = """
        WITH p AS (
            SELECT doc_id,
                   CASE doc_id % 4 WHEN 0 THEN ',' WHEN 1 THEN ';'
                        WHEN 2 THEN chr(9) ELSE '|' END AS dc,
                   CASE doc_id % 4 WHEN 0 THEN 'comma'
                        WHEN 1 THEN 'semicolon' WHEN 2 THEN 'tab'
                        ELSE 'pipe' END AS dname
            FROM documents),
        rw AS (SELECT doc_id, dc, dname,
                      unnest(range(0, 2 + (doc_id + 1) % 3)) AS r
               FROM p),
        cl AS (SELECT doc_id, dc, dname, r,
                      unnest(range(0, 2 + doc_id % 3)) AS c
               FROM rw)
        SELECT doc_id AS media_id, CAST(r AS BIGINT) AS "row",
               CAST(c AS BIGINT) AS col,
               CASE (doc_id + r + c) % 4
                    WHEN 0 THEN 'v' || CAST((31 * doc_id + 11 * r
                                             + 5 * c) % 997 AS VARCHAR)
                    WHEN 1 THEN 'a' || dc || 'b'
                         || CAST((31 * doc_id + 11 * r + 5 * c) % 997
                                 AS VARCHAR)
                    WHEN 2 THEN 'q"x'
                         || CAST((31 * doc_id + 11 * r + 5 * c) % 997
                                 AS VARCHAR)
                    ELSE 'l1' || chr(10) || 'l2'
                         || CAST((31 * doc_id + 11 * r + 5 * c) % 997
                                 AS VARCHAR)
               END AS "value",
               dname AS delim
        FROM cl
    """
    # Email fixtures (ops/mime.py): subject/from/body regenerated
    # byte-for-byte — a hash match certifies header unfolding, the
    # RFC 2047 B and Q decoders, the multipart boundary walk and the
    # QP/base64 transfer decodes across the whole axis matrix
    d["docs_email_extract"] = """
        SELECT doc_id AS media_id,
               CASE WHEN doc_id % 3 = 0
                    THEN 'Subject ' || CAST(doc_id % 100 AS VARCHAR)
                         || ' report'
                    ELSE 'S' || chr(252) || 'bject '
                         || CAST(doc_id % 100 AS VARCHAR) || ' report'
               END AS subject,
               'user' || CAST(doc_id % 50 AS VARCHAR) || '@host'
                   || CAST(doc_id % 20 AS VARCHAR) || '.example'
                   AS from_addr,
               CAST(1 + doc_id % 2 AS BIGINT) AS n_parts,
               'caf' || chr(233) || ' report '
                   || CAST((7 * doc_id) % 1000 AS VARCHAR) || chr(10)
                   || 'line id=' || CAST((11 * doc_id) % 500 AS VARCHAR)
                   || ' end' AS body_text
        FROM documents
    """
    # Office-integration fixture (ops/office.py invoice corpus): the
    # REAL QualityGate magic sniff + Extractor dispatch + M6 vendor
    # normalizer, certified end to end (ODT rides the PK sniff, so
    # its doc_kind reports as 'docx')
    d["pages_office_extract"] = """
        SELECT doc_id AS media_id,
               CASE doc_id % 4 WHEN 0 THEN 'pdf'
                    WHEN 3 THEN 'rtf' ELSE 'docx' END AS doc_kind,
               'Vendor' || CAST(doc_id % 50 AS VARCHAR) || ' Corp'
                   AS vendor_value
        FROM documents
    """
    # EPUB fixtures (ops/epub.py): chapter text in SPINE order — the
    # writer rotates storage file names against reading order, so a
    # hash match certifies container.xml -> OPF -> spine resolution
    d["docs_epub_extract"] = """
        WITH ch AS (SELECT doc_id, unnest(range(0, 1 + doc_id % 4)) AS s
                    FROM documents),
        pg AS (SELECT doc_id, s,
                      unnest(range(0, 2 + (doc_id + s) % 3)) AS p
               FROM ch),
        wd AS (SELECT doc_id, s, p,
                      unnest(range(0, 2 + (doc_id + s + p) % 2)) AS k
               FROM pg)
        SELECT doc_id AS media_id, CAST(s AS BIGINT) AS chapter,
               CAST(p AS BIGINT) AS para,
               string_agg('e' || CAST((43 * doc_id + 23 * s + 11 * p
                                       + 5 * k) % 67 AS VARCHAR),
                          ' ' ORDER BY k) AS text
        FROM wd GROUP BY doc_id, s, p
    """
    # PPTX fixtures (ops/pptx.py): per-(slide, paragraph) text
    # regenerated byte-for-byte — certifying the multi-part slide
    # ordering and the DrawingML run scan
    d["docs_pptx_extract"] = """
        WITH sl AS (SELECT doc_id, unnest(range(0, 1 + doc_id % 3)) AS s
                    FROM documents),
        pg AS (SELECT doc_id, s,
                      unnest(range(0, 2 + (doc_id + s) % 3)) AS p
               FROM sl),
        wd AS (SELECT doc_id, s, p,
                      unnest(range(0, 2 + (doc_id + s + p) % 2)) AS k
               FROM pg)
        SELECT doc_id AS media_id, CAST(s AS BIGINT) AS slide,
               CAST(p AS BIGINT) AS para,
               string_agg('p' || CAST((41 * doc_id + 19 * s + 7 * p
                                       + 3 * k) % 73 AS VARCHAR),
                          ' ' ORDER BY k) AS text
        FROM wd GROUP BY doc_id, s, p
    """
    # XLSX fixtures (ops/xlsx.py): every cell regenerated closed-form —
    # certifying the deduplicated shared-strings resolution (small
    # modulus forces dictionary reuse; every third entry is a
    # multi-run rich si), the A1 walk and all three cell kinds
    d["docs_xlsx_extract"] = """
        WITH rw AS (SELECT doc_id, unnest(range(0, 2 + doc_id % 3)) AS r
                    FROM documents),
        cl AS (SELECT doc_id, r,
                      unnest(range(0, 2 + (doc_id + r) % 3)) AS c
               FROM rw)
        SELECT doc_id AS media_id, CAST(r AS BIGINT) AS "row",
               CAST(c AS BIGINT) AS col,
               CASE (doc_id + r + c) % 3 WHEN 0 THEN 's'
                    WHEN 1 THEN 'n' ELSE 'inline' END AS kind,
               CASE (doc_id + r + c) % 3
                    WHEN 0 THEN 's' || CAST((19 * doc_id + 7 * r + 3 * c)
                                            % 23 AS VARCHAR)
                    WHEN 1 THEN CAST((13 * doc_id + 5 * r + c) % 1000
                                     AS VARCHAR)
                    ELSE 'x' || CAST((17 * doc_id + 3 * r + c) % 61
                                     AS VARCHAR) END AS "value"
        FROM cl
    """
    # CCNet composite: the line-dedup CTEs + the VERBATIM langid and
    # bucket oracles rebound to the cleaned corpus — the SQL twin
    # retrains the NB weights and re-splits the NTILE thirds over the
    # deduplicated text exactly like the Ray path
    from webxtract.ops.ccnet import compose_ccnet_oracle

    d["docs_ccnet_corpus"] = compose_ccnet_oracle(
        d["docs_langid_ngram"], d["docs_ccnet_buckets"])
    return d
