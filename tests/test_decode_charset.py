"""Charset-aware decode (webxtract/ops/warc.py decode_by_charset):
alias whitelist, strict-then-replace fallback, latin-1 totality,
null degradation. Fixture parity lives in test_oracle_parity.py
(pages_decode_text)."""

import pyarrow as pa
import ray.data as rd

from webxtract.ops.warc import decode_by_charset


def _run(rows):
    t = pa.table({
        "html": pa.array([r[0] for r in rows], pa.binary()),
        "charset": pa.array([r[1] for r in rows], pa.string())})
    return decode_by_charset(rd.from_arrow(t)).to_pandas()


def test_aliases_and_fallback(ray_session):
    out = _run([
        ("café".encode("utf-8"), "UTF8"),          # alias + case
        ("café".encode("cp1252"), "Windows-1252"),  # alias
        ("café".encode("latin-1"), "iso-8859-1"),
        (b"caf\xff", "utf-8"),                      # lying utf-8
        (b"plain", "ebcdic-nonsense"),              # unknown -> utf-8
        (b"plain", None),                           # missing -> utf-8
    ])
    assert out["text"].tolist() == [
        "café", "café", "café", "caf�", "plain", "plain"]
    assert out["charset_used"].tolist() == [
        "utf-8", "cp1252", "latin-1", "utf-8", "utf-8", "utf-8"]
    assert out["decode_status"].tolist() == [
        "ok", "ok", "ok", "replaced", "ok", "ok"]


def test_latin1_is_total(ray_session):
    # latin-1 maps every byte: a declared latin-1 blob never replaces
    out = _run([(bytes(range(256)), "latin-1")])
    assert out.loc[0, "decode_status"] == "ok"
    assert len(out.loc[0, "text"]) == 256


def test_empty_and_null_degrade(ray_session):
    out = _run([(b"", "utf-8"), (None, "utf-8")])
    assert out["text"].tolist() == ["", ""]
    assert out["decode_status"].tolist() == ["ok", "ok"]
