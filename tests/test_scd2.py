"""SCD Type-2 / time-travel semantic properties (oracle parity runs in
test_oracle_parity.py; these pin the interval algebra itself)."""

import numpy as np

from webxtract.ops.relational import (SCD2_OPEN_END, docs_cdc_merge,
                                      docs_scd2, docs_time_travel)

SF = "/root/testdata/sf0.001"


def test_scd2_intervals_disjoint_and_ordered(ray_session):
    df = docs_scd2(SF).to_pandas().sort_values(
        ["key", "valid_from"], ignore_index=True)
    assert (df.valid_from < df.valid_to).all()
    # within a key, consecutive versions must not overlap
    same_key = df.key.values[1:] == df.key.values[:-1]
    assert (df.valid_from.values[1:][same_key]
            >= df.valid_to.values[:-1][same_key]).all()


def test_scd2_at_most_one_current_per_key(ray_session):
    df = docs_scd2(SF).to_pandas()
    cur = df[df.is_current]
    assert cur.key.is_unique
    assert (cur.valid_to == SCD2_OPEN_END).all()
    # every non-current version is closed by a real event sequence
    assert (df[~df.is_current].valid_to < SCD2_OPEN_END).all()


def test_scd2_current_versions_match_merge_survivors(ray_session):
    """The open SCD2 versions whose key was never later deleted must be
    exactly the MERGE INTO survivors with the same payloads."""
    scd = docs_scd2(SF).to_pandas()
    cur = scd[scd.is_current][["key", "payload"]] \
        .sort_values("key", ignore_index=True)
    merged = docs_cdc_merge(SF).to_pandas()[["key", "payload"]] \
        .sort_values("key", ignore_index=True)
    assert np.array_equal(cur.key.values, merged.key.values)
    assert np.array_equal(cur.payload.values, merged.payload.values)


def test_time_travel_is_subset_of_event_horizon(ray_session):
    """Every AS OF row must carry a payload writable at seq <= asof:
    base rows unchanged, changelog rows only from the filtered half."""
    tt = docs_time_travel(SF).to_pandas()
    assert len(tt) > 0
    assert set(tt.src) <= {"base", "changelog"}
    # the snapshot differs from the full merge (the cutoff bites)
    full = docs_cdc_merge(SF).to_pandas()
    a = tt.sort_values("key", ignore_index=True)
    b = full.sort_values("key", ignore_index=True)
    assert not (len(a) == len(b)
                and np.array_equal(a.payload.values, b.payload.values))


def test_temporal_join_unique_and_consistent(ray_session):
    """Each probe matches at most one version (disjoint intervals),
    and every joined payload is the version covering its seq."""
    from webxtract.ops.relational import events_temporal_join

    tj = events_temporal_join(SF).to_pandas()
    assert tj.event_id.is_unique
    scd = docs_scd2(SF).to_pandas()
    merged = tj.merge(scd, on="key")
    hit = merged[(merged.seq >= merged.valid_from)
                 & (merged.seq < merged.valid_to)]
    assert len(hit) == len(tj)
    assert (hit.payload_x == hit.payload_y).all()
