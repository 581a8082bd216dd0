"""URL template mining / spider-trap detection (webxtract/ops/web.py
url_templates): hex-before-digit generalization order, query/fragment
strip, host case-fold, unparseable-url degradation, trap threshold,
partitioning invariance. Fixture parity lives in
test_oracle_parity.py (urls_templates)."""

import pyarrow as pa
import ray.data as rd

from webxtract.ops.web import url_templates


def _run(urls, **kw):
    ds = rd.from_arrow(pa.table({"url": pa.array(urls, pa.string())}))
    out = url_templates(ds, **kw).to_pandas()
    return out.sort_values(["host", "template"],
                           ignore_index=True, na_position="first")


def test_hex_before_digit_order(ray_session):
    out = _run([
        # 8-digit all-numeric run: hex pass claims it FIRST
        "https://a.example/p/12345678/x",
        # 7-char hex run: too short for {h}; only its digit becomes {d}
        "https://a.example/p/abcdef1/x",
        # mixed 8-char hex with letters
        "https://a.example/p/deadbeef/x",
    ])
    tpls = set(out["template"])
    assert tpls == {"/p/{h}/x", "/p/abcdef{d}/x"}
    # the all-numeric and lettered hex runs landed in the SAME slot
    assert int(out[out["template"] == "/p/{h}/x"]["n"].iloc[0]) == 2


def test_query_fragment_strip_and_host_casefold(ray_session):
    out = _run([
        "https://WWW.Shop.Example/item/5?sess=99",
        "https://www.shop.example/item/7#frag",
        "https://www.shop.example/item/9",
    ])
    assert len(out) == 1
    r = out.iloc[0]
    assert r["host"] == "www.shop.example"
    assert r["template"] == "/item/{d}"
    assert int(r["n"]) == 3


def test_unparseable_and_empty_path_degrade(ray_session):
    out = _run(["not a url at all", "https://x.example",
                "https://x.example/"])
    # no scheme://host -> host NULL, template '/'
    bad = out[out["host"].isna()]
    assert len(bad) == 1 and bad.iloc[0]["template"] == "/"
    # bare host and trailing slash both normalize to '/'
    good = out[out["host"] == "x.example"]
    assert len(good) == 1 and good.iloc[0]["template"] == "/"
    assert int(good.iloc[0]["n"]) == 2


def test_trap_threshold_boundary(ray_session):
    at = [f"https://t.example/cal/{i}" for i in range(4)]
    under = [f"https://u.example/page/{i}" for i in range(3)]
    out = _run(at + under, trap_min=4)
    by_host = out.set_index("host")
    assert bool(by_host.loc["t.example", "trap"]) is True
    assert bool(by_host.loc["u.example", "trap"]) is False
    # sample_url is the lexicographic min of the ORIGINAL urls
    assert by_host.loc["t.example", "sample_url"] == at[0]


def test_partitioning_invariance(ray_session):
    urls = [f"https://h{i % 3}.example/a/{i}/b{i % 2}" for i in
            range(60)]
    ds = rd.from_arrow(pa.table({"url": pa.array(urls, pa.string())}))
    a = url_templates(ds).to_pandas()
    b = url_templates(ds.repartition(7)).to_pandas()
    key = ["host", "template"]
    a = a.sort_values(key, ignore_index=True)
    b = b.sort_values(key, ignore_index=True)
    assert a.equals(b)
