"""webxtract — a Ray-Data-native web-scale main-content extraction engine.

A from-scratch reimplementation of the semantics of the reference demo
(apac-ml-tfc/textract-demo: quality gate -> structure extraction ->
field normalization -> confidence routing -> human-review join-back),
re-expressed as a streaming ``ray.data.Dataset`` pipeline over Arrow
batches of Common-Crawl-style web pages, designed for 10^12-document
scale on a multi-node cluster.

Layout (see SURVEY.md §7.1):
    schema.py      Arrow schemas for every stage boundary
    synth.py       deterministic synthetic page corpus (FIXTURES.md)
    quality.py     document-quality gate (reference preprocessing/fn-preprocess)
    htmldom.py     stdlib-only HTML tokenizer + DOM tree
    boilerplate.py text-density / link-density block classifier
    blocks.py      Textract-like Block IR construction
    pdflayout.py   XY-cut geometric layout parser (positioned-text docs)
    normalize.py   field normalizers + confidence logic (byte-exact)
    review.py      confidence routing, review projection, join-back, coalesce
    dedup.py       exact dedup by url (latest warc_ts wins)
    pipeline.py    stage DAG builder -> chained map_batches / actor pools
    checkpoint.py  per-partition manifests, resume, lineage
    metrics.py     per-stage counters -> metrics sink
    ops/           corpus-scale extensions: near-dedup, ANN, text analysis,
                   multimodal plumbing
"""

__version__ = "0.1.0"
