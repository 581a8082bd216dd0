"""Registrable-domain (eTLD+1) extraction (webxtract/ops/web.py
registrable_domain / registrable_domains): PSL exception priority,
wildcard label arithmetic, longest-match, implicit-'*' fallback,
IPv4 literals, normalization. Fixture parity lives in
test_oracle_parity.py (hosts_registrable)."""

import pyarrow as pa
from hypothesis import given, settings
from hypothesis import strategies as st

from webxtract.ops.web import registrable_domain, registrable_domains


def test_spec_table():
    cases = {
        # plain TLD + normalization (case, one trailing dot)
        "www.Alpha.COM.": ("com", "alpha.com", "ok"),
        "alpha.com": ("com", "alpha.com", "ok"),
        "com": ("com", None, "suffix"),
        # multi-label suffix beats its parent ('co.uk' over 'uk')
        "a.b.beta.co.uk": ("co.uk", "beta.co.uk", "ok"),
        "beta.co.uk": ("co.uk", "beta.co.uk", "ok"),
        "co.uk": ("co.uk", None, "suffix"),
        "beta.uk": ("uk", "beta.uk", "ok"),
        # a suffix under another registrable domain (github.io)
        "gamma.github.io": ("github.io", "gamma.github.io", "ok"),
        "github.io": ("github.io", None, "suffix"),
        "deep.gamma.github.io": ("github.io", "gamma.github.io",
                                 "ok"),
        # wildcard '*.ck': every second-level IS a suffix
        "x.delta.ck": ("delta.ck", "x.delta.ck", "ok"),
        "delta.ck": ("delta.ck", None, "suffix"),
        "ck": ("ck", None, "suffix"),  # implicit '*' covers the TLD
        # exception '!www.ck' wins outright, matches one label fewer
        "www.ck": ("ck", "www.ck", "ok"),
        "sub.www.ck": ("ck", "www.ck", "ok"),
        # unlisted TLD -> implicit '*'
        "epsilon.unknowntld": ("unknowntld", "epsilon.unknowntld",
                               "ok"),
        "unknowntld": ("unknowntld", None, "suffix"),
        # IPv4 literal: its own registrable domain, no suffix
        "192.168.0.1": (None, "192.168.0.1", "ip"),
        # 4 labels but not all-digit -> NOT an ip
        "1.2.3.x": ("x", "3.x", "ok"),
        # hostile / degenerate input degrades to data
        "": (None, None, "bad"),
        ".": (None, None, "bad"),
        ".0": (None, None, "bad"),       # empty leading label
        "a..com": (None, None, "bad"),   # empty inner label
    }
    for host, want in cases.items():
        assert registrable_domain(host) == want, host
    assert registrable_domain(None) == (None, None, "bad")


def test_registrable_is_idempotent_grouping_key():
    # re-running on the registrable domain itself must return the
    # same registrable (the property that makes it a grouping key)
    for host in ["www.alpha.com", "a.b.beta.co.uk", "x.delta.ck",
                 "sub.www.ck", "deep.gamma.github.io"]:
        _, reg, _ = registrable_domain(host)
        _, reg2, _ = registrable_domain(reg)
        assert reg2 == reg, host


@settings(max_examples=200, deadline=None)
@given(st.text(max_size=40))
def test_never_raises_and_invariants(s):
    suffix, reg, kind = registrable_domain(s)
    assert kind in ("ok", "suffix", "ip", "bad")
    if kind == "ok":
        # registrable = exactly one label + '.' + suffix
        assert reg.endswith("." + suffix)
        head = reg[: -(len(suffix) + 1)]
        assert head and "." not in head
    elif kind == "suffix":
        assert reg is None and suffix is not None
    elif kind == "ip":
        assert suffix is None and reg is not None


def test_batch_matches_scalar(ray_session):
    import ray.data as rd

    hosts = ["www.alpha.com", "www.ck", "x.delta.ck", "Co.UK.",
             "192.168.0.1", "epsilon.unknowntld", "www.alpha.com"]
    ds = rd.from_arrow(pa.table({
        "host": pa.array(hosts, pa.string())}))
    rows = registrable_domains(ds).take_all()  # 7 rows: test-only
    assert len(rows) == len(hosts)
    for r in rows:
        s, g, k = registrable_domain(r["host"])
        assert (r["suffix"], r["registrable"], r["kind"]) == (s, g, k)


def test_null_host_is_bad_not_suffix_none(ray_session):
    """Round-3 advisor finding: a null host went through astype(str)
    as 'None' and came back kind='suffix'/suffix='none'. It must map
    to (None, None, 'bad')."""
    import ray.data as rd

    ds = rd.from_arrow(pa.table({
        "host": pa.array(["www.alpha.com", None, "www.ck"],
                         pa.string())}))
    rows = registrable_domains(ds).take_all()
    nul = [r for r in rows if r["host"] is None]
    assert len(nul) == 1
    assert nul[0]["suffix"] is None
    assert nul[0]["registrable"] is None
    assert nul[0]["kind"] == "bad"
