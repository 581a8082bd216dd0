"""BPE tokenizer (webxtract/ops/bpe.py): the vectorized trainer is
gated against the Sennrich hand example and a pure-Python dict
reference on randomized word tables; apply is gated by a decode
round-trip property and a repartition-invariance check; the query
surface runs over sf0.001 with spot-checked counts."""

import numpy as np
import pytest

from webxtract.ops import bpe as B

# --- pure-Python reference trainer (same determinism contract) -------------


def ref_train(word_counts: dict[str, int],
              num_merges: int) -> list[tuple[str, str]]:
    alphabet = sorted({c for w in word_counts for c in w} | {B.EOW})
    sym_id = {s: i for i, s in enumerate(alphabet)}
    vocab = {}
    for w in sorted(word_counts):
        vocab[(*w, B.EOW)] = vocab.get((*w, B.EOW), 0) + word_counts[w]
    merges = []
    for _ in range(num_merges):
        pairs: dict[tuple[str, str], int] = {}
        for syms, c in vocab.items():
            for p in zip(syms, syms[1:]):
                pairs[p] = pairs.get(p, 0) + c
        if not pairs:
            break
        best = min(pairs, key=lambda p: (-pairs[p], sym_id[p[0]],
                                         sym_id[p[1]]))
        merges.append(best)
        merged = best[0] + best[1]
        sym_id[merged] = len(sym_id)
        a, b = best
        new_vocab = {}
        for syms, c in vocab.items():
            out, i = [], 0
            while i < len(syms):
                if (i + 1 < len(syms) and syms[i] == a
                        and syms[i + 1] == b):
                    out.append(merged)
                    i += 2
                else:
                    out.append(syms[i])
                    i += 1
            k = tuple(out)
            new_vocab[k] = new_vocab.get(k, 0) + c
        vocab = new_vocab
    return merges


SENNRICH = {"low": 5, "lower": 2, "newest": 6, "widest": 3}


def test_sennrich_hand_example():
    """Hand-verified merge sequence from the Sennrich et al. corpus.
    Round 1 ties (e,s)/(s,t)/(t,</w>) at 9 -> smallest left id: (e,s).
    Round 2 ties (es,t)/(t,</w>) at 9 -> t (id 9) < es (id 11):
    (t,</w>). Round 3: (es,t</w>) x9. Then (l,o) x7, (lo,w) x7. The
    resulting subwords match the paper ('est</w>', 'low')."""
    merges = B.train_bpe_from_counts(list(SENNRICH),
                                     np.array(list(SENNRICH.values())),
                                     num_merges=5)
    assert merges == [("e", "s"), ("t", B.EOW), ("es", "t" + B.EOW),
                      ("l", "o"), ("lo", "w")]
    assert merges == ref_train(SENNRICH, 5)


def test_encode_word_with_hand_vocab():
    merges = ref_train(SENNRICH, 5)
    ranks = {p: i for i, p in enumerate(merges)}
    assert B.encode_word("lowest", ranks) == ["low", "est" + B.EOW]
    assert B.encode_word("low", ranks) == ["low", B.EOW]
    # unseen characters stay single symbols (never an error)
    assert B.encode_word("xyz", ranks) == ["x", "y", "z", B.EOW]
    assert B.decode_tokens(["low", B.EOW, "est" + B.EOW]) == "low est"


def test_overlapping_pair_greedy_left():
    """'aaaa' under merge (a,a) must merge positions (0,1),(2,3) —
    leftmost-greedy — in BOTH the vectorized trainer and apply."""
    merges = B.train_bpe_from_counts(["aaaa", "aaa"], np.array([2, 3]),
                                     num_merges=2)
    assert merges == ref_train({"aaaa": 2, "aaa": 3}, 2)
    assert merges[0] == ("a", "a")
    ranks = {p: i for i, p in enumerate(merges)}
    enc = B.encode_word("aaaaa", ranks)
    assert "".join(enc) == "aaaaa" + B.EOW
    assert enc[0] != "a"  # the leading pair merged


@pytest.mark.parametrize("seed", [0, 1, 2])
def test_vectorized_trainer_equals_reference(seed):
    rng = np.random.default_rng(seed)
    alpha = list("abcdefg")
    words = sorted({"".join(rng.choice(alpha,
                                       size=rng.integers(1, 9)))
                    for _ in range(120)})
    counts = rng.integers(1, 50, size=len(words))
    table = dict(zip(words, (int(c) for c in counts)))
    got = B.train_bpe_from_counts(words, counts, num_merges=40)
    assert got == ref_train(table, 40)


def test_word_order_invariance():
    words = ["newest", "low", "widest", "lower"]
    counts = np.array([6, 5, 3, 2])
    perm = [2, 0, 3, 1]
    a = B.train_bpe_from_counts(words, counts, 5)
    b = B.train_bpe_from_counts([words[i] for i in perm], counts[perm], 5)
    assert a == b == ref_train(SENNRICH, 5)


# --- distributed surface -----------------------------------------------------

SF = "/root/testdata/sf0.001"


def test_bpe_train_repartition_invariant(ray_session):
    import ray.data as rd

    docs = rd.read_parquet(f"{SF}/documents.parquet", columns=["text"])
    m1 = B.bpe_train(docs.repartition(3), num_merges=60)
    m2 = B.bpe_train(docs.repartition(11), num_merges=60)
    assert m1 == m2 and len(m1) == 60


def test_bpe_encode_roundtrip_and_counts(ray_session):
    import ray.data as rd

    docs = rd.read_parquet(f"{SF}/documents.parquet",
                           columns=["doc_id", "text"]).limit(200)
    merges = B.bpe_train(docs, num_merges=80)
    enc = B.bpe_encode(docs, merges, emit_tokens=True).take_all()
    texts = {r["doc_id"]: r["text"] for r in docs.take_all()}
    ranks = {p: i for i, p in enumerate(merges)}
    assert len(enc) == 200
    for r in enc[:50]:
        norm = " ".join(texts[r["doc_id"]].split())
        assert B.decode_tokens(r["bpe_tokens"]) == norm
        assert r["n_bpe_tokens"] == len(r["bpe_tokens"])
        # spot-check against the scalar encoder
        expect = sum(len(B.encode_word(w, ranks)) for w in norm.split())
        assert r["n_bpe_tokens"] == expect
        # subword compression: strictly fewer tokens than characters
        if norm:
            assert 0 < r["n_bpe_tokens"] <= len(norm) + 1


def test_bpe_queries_surface(ray_session):
    vocab = B.docs_bpe_vocab(SF, num_merges=50).take_all()
    assert len(vocab) == 50
    assert [r["rank"] for r in vocab] == list(range(50))
    assert all(r["merged"] == r["left"] + r["right"] for r in vocab)
    counts = B.docs_bpe_token_counts(SF, num_merges=50)
    df = counts.to_pandas()
    assert df.doc_id.is_monotonic_increasing
    assert (df.n_bpe_tokens > 0).all()


def test_bpe_pack_composite(ray_session):
    """Tokenize -> pack: every sequence respects the budget unless a
    single oversize doc forces its own; token counts match the BPE
    encoder; the tokens_col plumbing is equivalence-tested against the
    whitespace path."""
    import pyarrow as pa
    import ray.data as rd

    from webxtract.ops.packing import docs_bpe_pack, pack_sequences

    rows = docs_bpe_pack(SF, budget=256, num_merges=60).to_pandas()
    assert len(rows) == 500 and (rows.n_tokens > 0).all()
    per_seq = rows.groupby("seq_id").n_tokens.agg(["sum", "count"])
    over = per_seq[per_seq["sum"] > 256]
    assert (over["count"] == 1).all()  # only oversize singletons exceed

    # tokens_col plumbing == whitespace path when fed whitespace counts
    docs = rd.read_parquet(f"{SF}/documents.parquet",
                           columns=["doc_id", "text"])

    def ws_counts(b: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        n = pc.list_value_length(
            pc.split_pattern(b.column("text"), pattern=" "))
        return pa.table({"doc_id": b.column("doc_id"),
                         "n_ws": n.cast(pa.int64())})

    pre = docs.map_batches(ws_counts, batch_format="pyarrow")
    a = pack_sequences(docs, budget=256).to_pandas() \
        .sort_values("doc_id", ignore_index=True)
    b = pack_sequences(pre, budget=256, tokens_col="n_ws").to_pandas() \
        .sort_values("doc_id", ignore_index=True)
    assert a.equals(b)
