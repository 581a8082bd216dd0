"""Golden-record survivorship tie rules on a planted corpus (oracle
parity over the real corpus runs in test_oracle_parity.py)."""

import hashlib

import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq

from webxtract.ops.dedup import docs_golden_record


def test_survivorship_tie_rules(ray_session, tmp_path):
    # docs 0,1,2 form one near-dup cluster (identical token sets);
    # lang counts tie (en:1, fr:1, de:1) -> lexicographic min 'de';
    # texts tie in length -> min doc_id (0) supplies text_md5.
    # doc 10 is a singleton with its own cluster id.
    shared = "alpha beta gamma delta epsilon zeta eta theta"
    rows = [
        (0, shared + " one", "en", 10),
        (1, shared + " two", "fr", 30),
        (2, shared + " six", "de", 20),
        (10, "totally different words nothing shared here at all",
         "en", 5),
    ]
    df = pd.DataFrame(rows, columns=["doc_id", "text", "lang",
                                     "n_chars"])
    pq.write_table(pa.Table.from_pandas(df, preserve_index=False),
                   f"{tmp_path}/documents.parquet")
    got = docs_golden_record(str(tmp_path)).to_pandas() \
        .sort_values("cluster_id", ignore_index=True)
    assert list(got.cluster_id) == [0, 10]
    c0 = got.iloc[0]
    assert c0.n_members == 3
    assert c0.n_chars_max == 30          # max rule, not survivor's
    assert c0.lang_mode == "de"          # tie -> lexicographic min
    assert c0.text_md5 == hashlib.md5(
        (shared + " one").encode()).hexdigest()   # len tie -> min id
    c1 = got.iloc[1]
    assert c1.n_members == 1 and c1.lang_mode == "en"
