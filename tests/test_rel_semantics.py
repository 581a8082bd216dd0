"""Anchor rel semantics + return-tag audit direct probes
(webxtract/ops/web.py anchor_rel_stats / return_tag_audit): token-set
rules on tag soup, audit edge semantics. Fixture parity lives in
test_oracle_parity.py (pages_anchor_rels / hreflang_return_tags)."""

import pyarrow as pa
import ray.data as rd

from webxtract.ops.web import anchor_rel_stats, return_tag_audit


def test_rel_token_set_semantics_on_tag_soup(ray_session):
    html = (b"<div><a href='/a' rel='NOFOLLOW ugc'>x"  # unclosed
            b"<a href='/b' rel='sponsored'>y</a>"
            b"<a href='/c' rel='nofollowx,ugc'>z</a>"  # comma: ONE
            b"<a href='/d'>plain</a><a rel=nofollow>no-href</a>")
    ds = rd.from_arrow(pa.table({
        "doc_id": pa.array([1], pa.int64()),
        "html": pa.array([html], pa.binary())}))
    r = anchor_rel_stats(ds).take_all()[0]
    # 'nofollowx,ugc' is one space-token, matching NO rel token
    assert r["n_anchors"] == 4
    assert r["n_nofollow"] == 1 and r["n_ugc"] == 1
    assert r["n_sponsored"] == 1
    assert r["n_followed"] == 2  # /c and /d


def test_return_tag_audit_directions(ray_session):
    alts = pa.table({
        "doc_id": pa.array([1, 2, 3], pa.int64()),
        "kind": pa.array(["alternate"] * 3, pa.string()),
        "lang": pa.array(["de", "en", "fr"], pa.string()),
        "href": pa.array(["u2", "u1", "u9"], pa.string())})
    pages = pa.table({
        "doc_id": pa.array([1, 2, 3], pa.int64()),
        "url": pa.array(["u1", "u2", "u3"], pa.string())})
    out = return_tag_audit(
        rd.from_arrow(alts), rd.from_arrow(pages)).to_pandas() \
        .set_index("src_url")
    assert bool(out.loc["u1", "has_return"]) is True   # u2 -> u1
    assert bool(out.loc["u2", "has_return"]) is True
    assert bool(out.loc["u3", "has_return"]) is False  # u9 silent
