"""Vocabulary-scale swap (VERDICT r2 item 2): above
VOCAB_BROADCAST_MAX_TERMS the broadcast-vocab ops (TF-IDF, unigram LM,
bigram LM) must switch to the hash-join path, and the two paths must be
value-identical on the same corpus (the dedup verify="join" auto-gate +
equivalence pattern)."""

import numpy as np
import pandas as pd
import pytest

import webxtract.ops.text as T

SF_DIR = "/root/testdata/sf0.001"


def _canon(ds) -> pd.DataFrame:
    df = ds.to_pandas()
    df = df[sorted(df.columns)]
    return df.sort_values(by=list(df.columns), ignore_index=True)


@pytest.mark.parametrize("op,float_cols", [
    (T.docs_tfidf_top_term, ["tfidf"]),
    (T.docs_unigram_logprob, ["mean_logprob"]),
    (T.docs_bigram_logprob, ["mean_logprob"]),
    (T.docs_dsir_topk, ["dsir_weight"]),
])
def test_broadcast_equals_join(ray_session, op, float_cols):
    b = _canon(op(SF_DIR, mode="broadcast"))
    j = _canon(op(SF_DIR, mode="join"))
    assert list(b.columns) == list(j.columns)
    assert len(b) == len(j) > 0
    for col in b.columns:
        if col in float_cols:
            # both paths round to 6dp; log scores are irrational so
            # the rounding boundary is never straddled — exact match
            assert np.array_equal(b[col].to_numpy(), j[col].to_numpy(),
                                  equal_nan=True), col
        else:
            assert b[col].tolist() == j[col].tolist(), col


def test_auto_gate_selects_join(ray_session, monkeypatch):
    """auto resolves to join above the gate (and the join result still
    matches broadcast — the gate itself never changes values)."""
    monkeypatch.setattr(T, "VOCAB_BROADCAST_MAX_TERMS", 1)
    b = _canon(T.docs_unigram_logprob(SF_DIR, mode="broadcast"))
    a = _canon(T.docs_unigram_logprob(SF_DIR, mode="auto"))
    assert b.equals(a)


def test_resolve_vocab_mode_explicit_passthrough():
    assert T._resolve_vocab_mode("broadcast", None) == "broadcast"
    assert T._resolve_vocab_mode("join", None) == "join"


def test_pmi_join_equals_broadcast(ray_session):
    """The over-gate copartitioned count-attach path of docs_term_pmi
    must emit exactly the broadcast path's rows."""
    from webxtract.ops.text import docs_term_pmi

    sf = "/root/testdata/sf0.001"
    a = docs_term_pmi(sf, mode="broadcast").to_pandas()
    b = docs_term_pmi(sf, mode="join").to_pandas()
    assert a.equals(b)
