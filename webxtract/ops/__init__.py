"""Corpus-scale operator extensions (training-data-pipeline toolkit).

Beyond the reference's own operators (SURVEY.md §2), these are the
operations a large-scale training-data pipeline needs (task brief):
deduplication (exact / MinHash-LSH / SimHash / n-gram Jaccard /
embedding cosine), similarity search (brute-force + IVF), text analysis
(language-ID, quality scoring, token counting, fingerprinting), and
multimodal column plumbing. All are expressed Ray-Data-first:
map_batches over Arrow batches, partial aggregation before shuffles,
broadcast small sides via ray.put.
"""
