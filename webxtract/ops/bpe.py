"""Byte-pair-encoding tokenizer: distributed train + distributed apply.

The training-corpus op the LLM-pipeline surface was missing: learn a
subword vocabulary from the corpus (Sennrich et al. 2016, char-level
with an explicit ``</w>`` end-of-word marker) and tokenize every
document with it.

Scale contract (how this stays 100 TB-safe):
  * **Training never sees the corpus — only the word-frequency
    table.** Classic BPE trains on (word, count) pairs; the distinct-
    word table is VOCABULARY-bounded (Heap's law), not corpus-bounded,
    and is capped at the ``max_words`` most frequent words (the Zipf
    tail carries negligible pair mass — the cap is logged in the
    result). One map_batches partial-count pass + one bounded groupby
    is the only distributed work; the merge loop itself runs on the
    driver over the capped table, fully numpy-vectorized (no Python
    loop over words or positions).
  * **Apply broadcasts the merge ranks once per worker** (ray.put +
    the get_broadcast process cache) and encodes each DISTINCT word in
    a batch once (np.unique + a per-worker word->tokens cache; under
    Zipf the hit rate makes the per-word Python merge loop a cold-tail
    cost only). Text never shuffles.

Determinism: initial symbol ids are assigned by sorted alphabet order,
words are processed in lexicographic order, and merge ties break on
(count desc, left id, right id) — the learned merge table is identical
under any partitioning of the corpus.

Not SQL-expressible (iterative argmax over evolving state): the
queries are rows-only; correctness is gated in tests/test_bpe.py by
the Sennrich hand example, a pure-Python reference equivalence, a
decode round-trip property, and a repartition-invariance check.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

from ..broadcast import get_broadcast

EOW = "</w>"
_PACK = np.int64(1) << np.int64(32)


# --- driver-side merge loop over the (word, count) table --------------------

def train_bpe_from_counts(words: list[str], counts: np.ndarray,
                          num_merges: int = 200
                          ) -> list[tuple[str, str]]:
    """Learn ``num_merges`` merges from a word-frequency table.

    Vectorized: the word table is flattened into one symbol array with
    a parallel word-index array; each iteration counts weighted
    adjacent pairs with one np.unique + bincount, merges every
    occurrence of the winning pair (leftmost-greedy inside equal-symbol
    runs, matching the per-word apply semantics), and recounts. Cost is
    O(num_merges * total_positions) on the capped table — sub-second
    for a 50k-word table."""
    order = np.argsort(np.asarray(words, dtype=object), kind="stable")
    words = [words[i] for i in order]
    counts = np.asarray(counts, dtype=np.float64)[order]

    alphabet = sorted({c for w in words for c in w} | {EOW})
    sym_of = {s: i for i, s in enumerate(alphabet)}
    symbols = list(alphabet)

    syms = np.fromiter(
        (sym_of[c] for w in words for c in (*w, EOW)),
        dtype=np.int64, count=sum(len(w) + 1 for w in words))
    wid = np.repeat(np.arange(len(words), dtype=np.int64),
                    [len(w) + 1 for w in words])
    wcount = counts

    merges: list[tuple[str, str]] = []
    for _ in range(num_merges):
        if len(syms) < 2:
            break
        same = wid[:-1] == wid[1:]
        if not same.any():
            break
        left, right = syms[:-1][same], syms[1:][same]
        w = wcount[wid[:-1][same]]
        key = left * _PACK + right
        uniq, inv = np.unique(key, return_inverse=True)
        tot = np.bincount(inv, weights=w, minlength=len(uniq))
        # ties: highest count, then smallest (left id, right id) ==
        # smallest packed key (np.unique output is sorted)
        best = int(uniq[int(np.argmax(tot))])
        if tot.max() <= 0:
            break
        bl, br = best // int(_PACK), best % int(_PACK)
        merges.append((symbols[bl], symbols[br]))
        new_id = len(symbols)
        symbols.append(symbols[bl] + symbols[br])

        match = np.zeros(len(syms), dtype=bool)
        match[:-1] = (syms[:-1] == bl) & (syms[1:] == br) & same
        m = np.where(match)[0]
        if bl == br and len(m) > 1:
            # leftmost-greedy inside runs of an equal-symbol pair
            # ('aaa' merges positions 0-1, not 1-2): keep every other
            # match within each consecutive run
            run_start = np.maximum.accumulate(
                np.where(np.diff(m, prepend=m[0] - 2) > 1, m, m[0] - 2))
            run_start = np.maximum(run_start, m[0])
            keep = ((m - run_start) % 2) == 0
            m = m[keep]
        syms[m] = new_id
        drop = np.zeros(len(syms), dtype=bool)
        drop[m + 1] = True
        syms = syms[~drop]
        wid = wid[~drop]
    return merges


def word_count_table(ds, text_col: str = "text",
                     max_words: int = 50_000) -> tuple[list[str],
                                                       np.ndarray]:
    """(word, count) table of the corpus, capped at the ``max_words``
    most frequent words (ties broken by word, ascending).

    One partial-count pass (per-batch value_counts of the exploded
    whitespace split — corpus-sized scan, vocabulary-sized output) and
    one bounded groupby-sum; only the capped table reaches the driver."""

    def partial(batch: pa.Table) -> pa.Table:
        toks = pc.list_flatten(
            pc.split_pattern_regex(batch.column(text_col), r"\s+"))
        toks = toks.filter(pc.not_equal(toks, ""))
        vc = toks.value_counts()
        return pa.table({"word": vc.field("values"),
                         "n": vc.field("counts").cast(pa.int64())})

    parts = ds.map_batches(partial, batch_format="pyarrow",
                           zero_copy_batch=True)
    agg = parts.groupby("word").sum("n")
    top = agg.sort(["sum(n)", "word"],
                   descending=[True, False]).limit(max_words)
    batches = list(top.iter_batches(batch_format="pyarrow"))
    if not batches:
        return [], np.zeros(0, dtype=np.int64)
    t = pa.concat_tables(batches)
    return (t.column("word").to_pylist(),
            t.column("sum(n)").to_numpy(zero_copy_only=False))


def bpe_train(ds, text_col: str = "text", num_merges: int = 200,
              max_words: int = 50_000) -> list[tuple[str, str]]:
    """Distributed word counting + driver merge loop (see module doc)."""
    words, counts = word_count_table(ds, text_col, max_words)
    return train_bpe_from_counts(words, counts, num_merges)


# --- per-word encode (apply side) --------------------------------------------

def encode_word(word: str, ranks: dict[tuple[str, str], int]) -> list[str]:
    """Classic BPE apply: repeatedly merge the lowest-rank adjacent
    pair (all its occurrences, left to right) until none remains."""
    syms = [*word, EOW]
    while len(syms) > 1:
        best_rank, best_pair = None, None
        for pair in zip(syms, syms[1:]):
            r = ranks.get(pair)
            if r is not None and (best_rank is None or r < best_rank):
                best_rank, best_pair = r, pair
        if best_pair is None:
            break
        out, i, (a, b) = [], 0, best_pair
        while i < len(syms):
            if i + 1 < len(syms) and syms[i] == a and syms[i + 1] == b:
                out.append(a + b)
                i += 2
            else:
                out.append(syms[i])
                i += 1
        syms = out
    return syms


def decode_tokens(tokens: list[str]) -> str:
    """Inverse of encode over a whole document's token stream."""
    return "".join(tokens).replace(EOW, " ").rstrip(" ")


class BpeEncoder:
    """map_batches stage: per-doc BPE token count (and optionally the
    tokens themselves). Ranks fetched once per worker via the
    get_broadcast cache; each distinct word in a batch is encoded once
    and memoized across batches (bounded cache)."""

    CACHE_CAP = 1_000_000

    def __init__(self, merges_ref, text_col: str = "text",
                 id_col: str = "doc_id", emit_tokens: bool = False):
        self._ref = merges_ref
        self.text_col, self.id_col = text_col, id_col
        self.emit_tokens = emit_tokens
        self._ranks: dict | None = None
        self._cache: dict[str, list[str]] = {}

    def _encode(self, word: str) -> list[str]:
        toks = self._cache.get(word)
        if toks is None:
            if len(self._cache) >= self.CACHE_CAP:
                self._cache.clear()
            toks = self._cache[word] = encode_word(word, self._ranks)
        return toks

    def __call__(self, batch: pa.Table) -> pa.Table:
        if self._ranks is None:
            merges = get_broadcast(self._ref)
            self._ranks = {tuple(p): i for i, p in enumerate(merges)}
        lists = pc.split_pattern_regex(batch.column(self.text_col),
                                       r"\s+")
        flat = pc.list_flatten(lists).to_pylist()
        offs = pc.list_value_length(lists).to_numpy(
            zero_copy_only=False).astype(np.int64)
        uniq, inv = np.unique(np.asarray(flat, dtype=object),
                              return_inverse=True)
        n_per_word = np.fromiter(
            (0 if w == "" else len(self._encode(w)) for w in uniq),
            dtype=np.int64, count=len(uniq))
        bounds = np.concatenate([[0], np.cumsum(offs)])
        per_tok = n_per_word[inv] if len(flat) else np.zeros(0, np.int64)
        if len(per_tok):
            # reduceat needs indices < len; empty trailing segments are
            # clamped then zeroed via the offs==0 overwrite below
            idx = np.minimum(bounds[:-1], len(per_tok) - 1)
            n_doc = np.add.reduceat(per_tok, idx)
        else:
            n_doc = np.zeros(len(batch), np.int64)
        n_doc[offs == 0] = 0
        cols = {self.id_col: batch.column(self.id_col),
                "n_bpe_tokens": pa.array(n_doc, pa.int64())}
        if self.emit_tokens:
            toks_per_word = [[] if w == "" else self._encode(w)
                             for w in uniq]
            docs = []
            for i in range(len(batch)):
                lo, hi = bounds[i], bounds[i + 1]
                d: list[str] = []
                for j in inv[lo:hi]:
                    d.extend(toks_per_word[j])
                docs.append(d)
            cols["bpe_tokens"] = pa.array(docs, pa.list_(pa.string()))
        return pa.table(cols)


def bpe_encode(ds, merges: list[tuple[str, str]],
               text_col: str = "text", id_col: str = "doc_id",
               emit_tokens: bool = False):
    """documents Dataset -> (doc_id, n_bpe_tokens[, bpe_tokens])."""
    import ray

    ref = ray.put(merges) if ray.is_initialized() else merges
    return ds.map_batches(
        BpeEncoder(ref, text_col, id_col, emit_tokens),
        batch_format="pyarrow", zero_copy_batch=True)


# --- query surface -----------------------------------------------------------

def docs_bpe_vocab(sf_dir: str, num_merges: int = 200):
    """Learned merge table over the documents corpus: (rank, left,
    right, merged). Rows-only (iterative training is not
    SQL-expressible); gated by tests/test_bpe.py."""
    import ray.data as rd

    docs = rd.read_parquet(f"{sf_dir}/documents.parquet",
                           columns=["text"])
    merges = bpe_train(docs, num_merges=num_merges)
    return rd.from_arrow(pa.table({
        "rank": pa.array(range(len(merges)), pa.int64()),
        "left": pa.array([a for a, _ in merges], pa.string()),
        "right": pa.array([b for _, b in merges], pa.string()),
        "merged": pa.array([a + b for a, b in merges], pa.string()),
    }))


def docs_bpe_token_counts(sf_dir: str, num_merges: int = 200):
    """Per-doc BPE token count under the corpus-trained vocabulary,
    (doc_id, n_bpe_tokens) sorted by doc_id. Rows-only; the count is
    deterministic given the deterministic merge table."""
    import ray.data as rd

    docs = rd.read_parquet(f"{sf_dir}/documents.parquet",
                           columns=["doc_id", "text"])
    merges = bpe_train(docs, num_merges=num_merges)
    return bpe_encode(docs, merges).sort("doc_id")
