"""CDX capture index (webxtract/ops/warc.py): the random-access
contract — a row's (file, offset, length) must slice the original
bytes to exactly its record, plain AND gzip-member — plus SURT/
timestamp normalization and hostile-input degradation. Oracle parity
(byte-exact extents vs the strlen-grammar twin) lives in
test_oracle_parity.py (warc_cdx)."""

import hashlib
import zlib

from webxtract.ops.warc import (build_warc, cdx_records, cdx_timestamp,
                                parse_warc, surt_key)

RECS = [
    ("https://b.example/x", "2024-01-02T00:00:00Z", b"<p>one</p>"),
    ("https://a.example/y?k=v", "2024-02-03T04:05:06Z",
     b"<p>two &amp; more</p>"),
    ("https://a.example/", "2024-12-28T23:59:59Z", b""),
]


def test_surt_key_table():
    assert surt_key("https://www.Site3.Example/p/7") == \
        "example,site3,www)/p/7"
    assert surt_key("http://u:pw@host.tld:8080/a/b?z=1&a=2") == \
        "tld,host)/a/b?z=1&a=2"
    assert surt_key("https://example.org") == "org,example)/"
    assert surt_key("https://h.io/p#frag") == "io,h)/p"
    assert surt_key("not a url") == "not a url"
    assert surt_key("") == ""


def test_cdx_timestamp():
    assert cdx_timestamp("2024-01-02T03:04:05Z") == "20240102030405"
    assert cdx_timestamp("") == ""
    assert cdx_timestamp(None) == ""


def test_plain_extents_slice_back_to_their_record():
    raw = build_warc(RECS, gzip_members=False)
    rows = cdx_records(raw)
    assert [r[2]["url"] for r in rows] == [u for u, _, _ in RECS]
    offs = [off for off, _, _ in rows]
    assert offs == sorted(offs) and offs[0] > 0  # warcinfo first
    for off, ln, rec in rows:
        again = parse_warc(raw[off:off + ln])
        assert len(again) == 1
        assert again[0]["url"] == rec["url"]
        assert again[0]["html"] == rec["html"]
    # extents tile the file exactly: last record ends at EOF
    assert rows[-1][0] + rows[-1][1] == len(raw)


def test_gzip_member_extents_support_ranged_reads():
    raw = build_warc(RECS, gzip_members=True)
    rows = cdx_records(raw)
    assert len(rows) == len(RECS)
    for (off, ln, rec), (url, _, html) in zip(rows, RECS):
        member = raw[off:off + ln]
        data = zlib.decompress(member, wbits=31)
        again = parse_warc(data)
        assert again[0]["url"] == url == rec["url"]
        assert hashlib.md5(again[0]["html"]).hexdigest() == \
            hashlib.md5(html).hexdigest()
    assert rows[-1][0] + rows[-1][1] == len(raw)


def test_truncated_tail_indexes_complete_prefix_only():
    raw = build_warc(RECS, gzip_members=False)
    rows = cdx_records(raw)
    cut = rows[-1][0] + 10  # inside the last record
    assert [r[2]["url"] for r in cdx_records(raw[:cut])] == \
        [u for u, _, _ in RECS[:-1]]
    gz = build_warc(RECS, gzip_members=True)
    gz_rows = cdx_records(gz)
    assert [r[2]["url"] for r in cdx_records(gz[:gz_rows[-1][0] + 5])] \
        == [u for u, _, _ in RECS[:-1]]


def test_garbage_and_empty_inputs_degrade_to_no_rows():
    assert cdx_records(b"") == []
    assert cdx_records(b"\x00" * 64) == []
    assert cdx_records(b"WARC/1.0\r\nContent-Length: oops\r\n\r\n") == []


# --- sharded runs + k-way merge (VERDICT r4 ask #4: the 100 TB path) ---

def test_sharded_merge_equals_single_sort(ray_session, tmp_path):
    """write_cdx_shards + merge_cdx_shards must reproduce warc_cdx's
    single-sort rows EXACTLY, and the merged block sequence must come
    out globally key-sorted without any global sort exchange. Also
    pins resumability: a second write_cdx_shards call skips finished
    shards and the merge still reproduces the same rows."""
    from webxtract.ops.warc import (merge_cdx_shards, warc_cdx,
                                    write_cdx_shards)

    sf = "/root/testdata/sf0.001"
    single = warc_cdx(sf).to_pandas()
    warc_dir = f"/tmp/webxtract_warc_plain_{sf.replace('/', '_')}"
    sd = str(tmp_path / "shards")
    shards = write_cdx_shards(warc_dir, sd, files_per_shard=2)
    assert len(shards) >= 2  # genuinely multiple sorted runs
    merged = merge_cdx_shards(sd, num_parts=5).to_pandas()

    key = ["surt", "cdx_ts", "file", "roffset"]
    mk = list(map(tuple, merged[key].itertuples(index=False)))
    assert mk == sorted(mk)  # globally sorted by construction

    def canon(df):
        df = df[sorted(df.columns)]
        return df.sort_values(by=list(df.columns), ignore_index=True)

    assert canon(single).equals(canon(merged))

    # resume: second call must SKIP all finished shards (rows == -1
    # markers aside, the on-disk runs are untouched) and merge equal
    shards2 = write_cdx_shards(warc_dir, sd, files_per_shard=2)
    assert shards2 == shards
    merged2 = merge_cdx_shards(sd, num_parts=3).to_pandas()
    assert canon(merged).equals(canon(merged2))
