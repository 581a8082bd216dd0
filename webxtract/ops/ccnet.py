"""CCNet three-stage composite (Wenzek et al. 2020, arXiv:1911.00359):
corpus-wide paragraph/line dedup -> trained char-n-gram language ID ->
LM-quality head/middle/tail bucketing — the canonical Common-Crawl
curation pipeline, assembled from the engine's three already-oracled
stages and ORACLED end-to-end as ONE query.

Stage order follows the paper: dedup FIRST (§4.2 — boilerplate lines
vanish before any modeling), then langid (§4.3) and perplexity
bucketing (§4.4) both computed over the CLEANED text — so the NB
trigram weights and the unigram LM are trained on the deduplicated
corpus, exactly as CCNet retrains its LM per snapshot.

Scale shape: stage 1 is `dedup_lines` (distinct-hash partials -> one
bounded exchange -> map-side strip); its output is MATERIALIZED as a
derived parquet corpus under /tmp (atomic tmp+rename, fingerprint-
invalidated, resumable — the posture CCNet itself takes between
stages, and what a 100 TB run does at a checkpoint boundary: the
cleaned corpus is read TWICE downstream — langid train+apply and LM
scoring — and re-deriving it per consumer would double the dedup
exchange).  Stages 2 and 3 then run the existing operators unchanged
against the derived directory, and one doc_id hash join zips their
outputs.

The SQL twin is COMPOSED from the same parts: a `cleaned` CTE
(the docs_line_dedup oracle with empty survivors dropped) spliced
under the verbatim docs_langid_ngram and docs_ccnet_buckets oracles
with their `documents` references rebound to `cleaned` — two
physical plans, one hash-identical answer, including the retrained
integer NB weights and the NTILE split over the smaller corpus.
"""

from __future__ import annotations

import hashlib
import os
import shutil

import pyarrow as pa
import pyarrow.compute as pc

_ROOT = os.environ.get("WEBXTRACT_FIXTURE_CACHE",
                       "/tmp/webxtract_fixtures")
_CCNET_REV = 1  # bump when stage-1 semantics change (cache invalidation)


def ccnet_cleaned_dir(sf_dir: str) -> str:
    """Materialize the stage-1 cleaned corpus (line dedup + empty-doc
    drop) as a derived directory holding ``documents.parquet`` with
    (doc_id, text, lang) — the layout the downstream operators read.
    Deterministic function of the input: cached atomically (first
    finisher wins), so a resumed run skips the dedup exchange."""
    from ..fixturecache import _fingerprint
    from .dedup import dedup_lines

    fp = hashlib.md5(
        (f"{_CCNET_REV}:" + _fingerprint(ccnet_cleaned_dir)).encode()
    ).hexdigest()[:12]
    sf_key = os.path.normpath(sf_dir).strip(os.sep).replace(os.sep, "_")
    out = os.path.join(_ROOT, f"ccnet_cleaned__{sf_key}__{fp}")
    marker = os.path.join(out, "documents.parquet")
    if os.path.isdir(marker):
        return out
    import ray.data as rd

    ds = rd.read_parquet(f"{sf_dir}/documents.parquet",
                         columns=["doc_id", "text", "lang"])
    cleaned = dedup_lines(ds, text_col="text", id_col="doc_id")

    def drop_empty(t: pa.Table) -> pa.Table:
        return t.filter(pc.greater(pc.utf8_length(t.column("text")), 0))

    cleaned = cleaned.map_batches(drop_empty, batch_format="pyarrow",
                                  zero_copy_batch=True)
    os.makedirs(_ROOT, exist_ok=True)
    tmp = f"{out}.build{os.getpid()}"
    shutil.rmtree(tmp, ignore_errors=True)
    cleaned.write_parquet(os.path.join(tmp, "documents.parquet"))
    try:
        os.rename(tmp, out)
    except OSError:
        shutil.rmtree(tmp, ignore_errors=True)  # a peer won the race
    return out


def docs_ccnet_corpus(sf_dir: str):
    """Query surface, ORACLED end-to-end: per surviving document the
    predicted language + integer margin (NB retrained on the cleaned
    corpus) and the LM-quality bucket (NTILE thirds over the cleaned
    corpus), joined on doc_id."""
    from .relational import hash_join, parquet_rows
    from .text import docs_ccnet_buckets, docs_langid_ngram

    derived = ccnet_cleaned_dir(sf_dir)
    pred = docs_langid_ngram(derived).select_columns(
        ["doc_id", "pred_lang", "margin"])
    bk = docs_ccnet_buckets(derived)  # (doc_id, mean_logprob, bucket)
    n = parquet_rows(derived, "documents")
    out = hash_join(pred, bk, on="doc_id", est_rows=n)
    return out.select_columns(["doc_id", "pred_lang", "margin",
                               "mean_logprob", "bucket"])


# --- SQL twin composition --------------------------------------------------

CLEANED_CTES = """
    ls AS (SELECT doc_id, string_split(text, chr(10)) AS arr
           FROM documents),
    ex AS (SELECT doc_id, unnest(arr) AS l,
                  CAST(generate_subscripts(arr, 1) AS BIGINT) - 1 AS i
           FROM ls),
    k AS (SELECT doc_id, l, i,
                 doc_id::VARCHAR || chr(0)
                     || lpad(i::VARCHAR, 8, '0') AS key
          FROM ex),
    agg AS (SELECT l, min(key) AS win, count(*) AS n
            FROM k GROUP BY 1),
    keep AS (SELECT k.doc_id, k.i, k.l
             FROM k JOIN agg USING (l)
             WHERE agg.n = 1 OR agg.win = k.key),
    cleaned AS (
        SELECT d.doc_id, j.t AS text, d.lang
        FROM documents d
        JOIN (SELECT doc_id, string_agg(l, chr(10) ORDER BY i) AS t
              FROM keep GROUP BY 1) j USING (doc_id)
        WHERE length(j.t) > 0)
"""


def compose_ccnet_oracle(langid_sql: str, buckets_sql: str) -> str:
    """Splice the two component oracles (verbatim, with their
    `documents` table references rebound to the `cleaned` CTE) under
    the line-dedup CTEs.  The component SQL contains `documents` only
    as a table reference (no comments/strings), so plain substitution
    is exact."""
    lang_c = langid_sql.replace("documents", "cleaned")
    bk_c = buckets_sql.replace("documents", "cleaned")
    return f"""
        WITH {CLEANED_CTES},
        pred AS (SELECT * FROM ({lang_c})),
        bk AS (SELECT * FROM ({bk_c}))
        SELECT pred.doc_id, pred.pred_lang, pred.margin,
               bk.mean_logprob, bk.bucket
        FROM pred JOIN bk USING (doc_id)
    """
