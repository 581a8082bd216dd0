"""tf-weighted AllPairs cosine join: brute-force exactness on
adversarial corpora where tf weighting genuinely changes the answer
(oracle parity runs in test_oracle_parity.py)."""

import numpy as np
import pyarrow as pa
import ray.data as rd

from webxtract.ops.dedup import cosine_simjoin_tf_pairs


def _brute(texts, tp, tq):
    from collections import Counter

    vecs = [Counter(t.split(" ")) for t in texts]
    n2 = [sum(v * v for v in c.values()) for c in vecs]
    out = set()
    for a in range(len(vecs)):
        for b in range(a + 1, len(vecs)):
            dot = sum(vecs[a][w] * vecs[b][w]
                      for w in vecs[a] if w in vecs[b])
            if tq * tq * dot * dot >= tp * tp * n2[a] * n2[b]:
                out.add((a, b, dot, n2[a], n2[b]))
    return out


def _run(texts, tp, tq, blocks=4):
    t = pa.table({"doc_id": pa.array(range(len(texts)), pa.int64()),
                  "text": pa.array(texts, pa.string())})
    df = cosine_simjoin_tf_pairs(
        rd.from_arrow(t).repartition(blocks), tp=tp, tq=tq).to_pandas()
    if df.empty:
        return set()
    return set(map(tuple, df[["doc_a", "doc_b", "dot",
                              "na2", "nb2"]].itertuples(index=False)))


def test_matches_bruteforce_with_heavy_repetition(ray_session):
    """Docs with heavy token repetition: binary sets look similar but
    tf-cosine separates them (and vice versa) — the weighted predicate
    must match brute force exactly, including pairs the binary rule
    would decide differently."""
    rng = np.random.default_rng(13)
    vocab = [f"w{i}" for i in range(30)]
    texts = []
    for _ in range(80):
        n = rng.integers(4, 12)
        words = rng.choice(30, size=n)
        reps = rng.integers(1, 6, size=n)
        texts.append(" ".join(
            " ".join([vocab[w]] * r) for w, r in zip(words, reps)))
    for tp, tq in ((4, 5), (9, 10)):
        assert _run(texts, tp, tq) == _brute(texts, tp, tq), (tp, tq)


def test_repetition_separates_binary_twins(ray_session):
    # same token SETS, very different tf profiles: binary cosine = 1
    # but tf cosine is low -> the weighted join must exclude the pair
    a = "x y z"
    b = "x " * 50 + "y z"
    texts = [a, b.strip()]
    got = _run(texts, 4, 5, blocks=1)
    assert got == _brute(texts, 4, 5)
    assert not any(p[:2] == (0, 1) for p in got)


def test_identical_tf_profiles_pair(ray_session):
    a = "alpha alpha beta gamma gamma gamma"
    texts = [a, a, "unrelated words entirely here"]
    got = _run(texts, 19, 20, blocks=2)
    assert got == _brute(texts, 19, 20)
    assert any(p[:2] == (0, 1) for p in got)
