"""Jump consistent hashing (webxtract/ops/web.py jump_bucket /
jump_shards): range/determinism, the defining minimal-movement
property (growing K -> K+1 moves only ~1/(K+1) of keys and every
moved key lands in the NEW bucket), uniformity, hostile input.
Fixture parity lives in test_oracle_parity.py (hosts_shard_assign)."""

import pyarrow as pa
import pytest
from hypothesis import given, settings
from hypothesis import strategies as st

from webxtract.ops.web import _md5_key64, jump_bucket, jump_shards

KEYS = [_md5_key64(f"host{i}.example") for i in range(2000)]


def test_range_and_determinism():
    for k in KEYS[:200]:
        b = jump_bucket(k, 64)
        assert 0 <= b < 64
        assert jump_bucket(k, 64) == b
    assert jump_bucket(12345, 1) == 0


def test_moved_keys_land_only_in_the_new_bucket():
    # THE jump-hash property: under K -> K+1 a key either keeps its
    # bucket or moves to bucket K (the new one) — never reshuffles
    # among existing buckets
    for n in (7, 31):
        moved = 0
        for k in KEYS:
            a, b = jump_bucket(k, n), jump_bucket(k, n + 1)
            assert b == a or b == n, (k, n, a, b)
            moved += b != a
        # expected movement = |keys|/(n+1); allow a wide band
        exp = len(KEYS) / (n + 1)
        assert exp / 3 < moved < exp * 3, (n, moved, exp)


def test_uniformity_loose():
    counts = [0] * 8
    for k in KEYS:
        counts[jump_bucket(k, 8)] += 1
    mean = len(KEYS) / 8
    assert max(counts) < 1.5 * mean and min(counts) > 0.5 * mean


def test_bad_buckets_raise():
    with pytest.raises(ValueError):
        jump_bucket(1, 0)
    with pytest.raises(ValueError):
        jump_bucket(1, -3)


@settings(max_examples=200, deadline=None)
@given(st.integers(), st.integers(min_value=1, max_value=1000))
def test_any_int_key_never_raises(key, n):
    assert 0 <= jump_bucket(key, n) < n


def test_batch_matches_scalar_and_null_degrades(ray_session):
    import ray.data as rd

    hosts = ["a.example", "b.example", None, "a.example"]
    ds = rd.from_arrow(pa.table({
        "host": pa.array(hosts, pa.string())}))
    rows = jump_shards(ds, buckets=16).take_all()  # 4 rows: test-only
    for r in rows:
        want = jump_bucket(_md5_key64(r["host"] or ""), 16)
        assert r["shard"] == want
