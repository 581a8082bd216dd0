"""AllPairs prefix-filtered cosine similarity join: exactness against a
brute-force all-pairs twin on adversarial synthetic corpora (the
completeness of the df-ordered prefix filter is the property the whole
plan rests on; oracle parity over the real corpus runs in
test_oracle_parity.py)."""

import numpy as np
import pyarrow as pa
import ray.data as rd

from webxtract.ops.dedup import cosine_simjoin_pairs


def _brute(texts, tp, tq):
    sets = [set(t.split(" ")) for t in texts]
    out = set()
    for a in range(len(sets)):
        for b in range(a + 1, len(sets)):
            ov = len(sets[a] & sets[b])
            na, nb = len(sets[a]), len(sets[b])
            if tq * tq * ov * ov >= tp * tp * na * nb:
                out.add((a, b, ov, na, nb))
    return out


def _run(texts, tp, tq, blocks=5):
    t = pa.table({"doc_id": pa.array(range(len(texts)), pa.int64()),
                  "text": pa.array(texts, pa.string())})
    df = cosine_simjoin_pairs(
        rd.from_arrow(t).repartition(blocks), tp=tp, tq=tq).to_pandas()
    return set(map(tuple, df[["doc_a", "doc_b", "overlap",
                              "na", "nb"]].itertuples(index=False)))


def test_matches_bruteforce_on_random_corpus(ray_session):
    """Zipf-ish random corpus with heavy shared vocabulary — the case
    where a naive token join explodes and the prefix filter must still
    be COMPLETE (find every qualifying pair, not just most)."""
    rng = np.random.default_rng(11)
    vocab = [f"w{i}" for i in range(60)]
    texts = []
    for _ in range(120):
        n = rng.integers(5, 25)
        idx = np.unique(rng.zipf(1.6, n).clip(1, 60) - 1)
        texts.append(" ".join(vocab[i] for i in idx))
    for tp, tq in ((4, 5), (9, 10)):
        assert _run(texts, tp, tq) == _brute(texts, tp, tq), (tp, tq)


def test_planted_twins_found(ray_session):
    base = " ".join(f"t{i}" for i in range(40))
    twin = " ".join(f"t{i}" for i in range(39)) + " x0"   # 39/40 shared
    far = " ".join(f"u{i}" for i in range(40))
    texts = [base, twin, far]
    got = _run(texts, 19, 20, blocks=2)
    assert got == _brute(texts, 19, 20)
    assert any(p[:2] == (0, 1) for p in got)      # twins qualify
    assert not any(2 in p[:2] for p in got)       # far doc never pairs


def test_size_filter_excludes_subset_blowup(ray_session):
    # a tiny doc fully contained in a big one: ov = na but
    # cosine = sqrt(na/nb) < t -> must be excluded
    small = "a b c"
    big = " ".join(["a", "b", "c"] + [f"z{i}" for i in range(60)])
    texts = [small, big, small + " d"]
    got = _run(texts, 4, 5, blocks=1)
    assert got == _brute(texts, 4, 5)
    assert not any(p[:2] == (0, 1) for p in got)
