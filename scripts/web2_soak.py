"""Soak for the round-3 host-ops batch at 1M rows / 32 cpus:

  * registrable_domains + jump_shards over 1,000,000 messy hosts
    (50,000 distinct) — spot-verified against the scalar matcher on
    a sample, shard balance asserted;
  * mirror_pairs over 1,000,000 pages on 5,000 hosts with 500
    planted mirror twins — pair set verified closed-form.

Run: python scripts/web2_soak.py   (owns its Ray session)
"""

import time

import numpy as np
import pyarrow as pa


def main() -> None:
    import ray
    import ray.data as rd

    if not ray.is_initialized():
        ray.init(address="local", num_cpus=32,
                 include_dashboard=False, logging_level="ERROR")
    from ray.data import DataContext

    DataContext.get_current().enable_progress_bars = False

    from webxtract.ops.web import (jump_bucket, jump_shards,
                                   _md5_key64, mirror_pairs,
                                   registrable_domain,
                                   registrable_domains)

    n = 1_000_000
    ids = rd.range(n)

    def hosts_batch(t: pa.Table) -> pa.Table:
        i = t.column("id").to_numpy(zero_copy_only=False)
        k = i % 50_000
        hosts = np.where(
            k % 4 == 0,
            np.char.add(np.char.add("www.h", k.astype(str)), ".com"),
            np.where(
                k % 4 == 1,
                np.char.add(np.char.add("a.b.h", k.astype(str)),
                            ".co.uk"),
                np.where(
                    k % 4 == 2,
                    np.char.add(np.char.add("x.h", k.astype(str)),
                                ".ck"),
                    np.char.add(np.char.add("h", k.astype(str)),
                                ".github.io"))))
        return pa.table({"host": pa.array(hosts.tolist(),
                                          pa.string())})

    t0 = time.time()
    ds = ids.map_batches(hosts_batch, batch_format="pyarrow",
                         batch_size=65536)
    out = jump_shards(registrable_domains(ds), buckets=256)
    counts = np.zeros(256, dtype=np.int64)
    kinds: dict = {}
    sample = []
    for b in out.iter_batches(batch_format="pyarrow",
                              batch_size=65536):
        sh = b.column("shard").to_numpy(zero_copy_only=False)
        counts += np.bincount(sh, minlength=256)
        for k, c in zip(*np.unique(np.asarray(
                b.column("kind").to_pylist()), return_counts=True)):
            kinds[k] = kinds.get(k, 0) + int(c)
        if len(sample) < 500:
            sample.extend(zip(b.column("host").to_pylist()[:50],
                              b.column("suffix").to_pylist()[:50],
                              b.column("registrable").to_pylist()[:50],
                              b.column("kind").to_pylist()[:50],
                              b.column("shard").to_pylist()[:50]))
    dt = time.time() - t0
    assert counts.sum() == n, counts.sum()
    for host, suf, reg, kind, shard in sample:
        s2, r2, k2 = registrable_domain(host)
        assert (suf, reg, kind) == (s2, r2, k2), host
        assert shard == jump_bucket(_md5_key64(host), 256), host
    imb = counts.max() / (n / 256)
    assert imb < 1.25, imb
    print(f"psl+shard: {n:,} rows in {dt:.1f}s "
          f"({n / dt / 1000:.0f}k rows/s), kinds={kinds}, "
          f"max shard imbalance {imb:.3f}x")

    # --- mirror soak ---------------------------------------------------
    twins = 500          # alpha/beta twin host pairs
    per_twin = 400       # shared pages per twin pair

    def pages_batch(t: pa.Table) -> pa.Table:
        i = t.column("id").to_numpy(zero_copy_only=False)
        is_twin = i < 2 * twins * per_twin
        j = i % (twins * per_twin)
        twin_id = j // per_twin
        side = np.where(i < twins * per_twin, "alpha", "beta")
        host = np.where(
            is_twin,
            np.char.add(np.char.add(side, twin_id.astype(str)),
                        ".example"),
            np.char.add(np.char.add("solo", (i % 4000).astype(str)),
                        ".example"))
        text = np.where(is_twin,
                        np.char.add("shared ", j.astype(str)),
                        np.char.add("unique ", i.astype(str)))
        return pa.table({"host": pa.array(host.tolist(), pa.string()),
                         "text": pa.array(text.tolist(), pa.string())})

    t0 = time.time()
    pages = ids.map_batches(pages_batch, batch_format="pyarrow",
                            batch_size=65536)
    pairs = mirror_pairs(pages, min_shared=per_twin)
    rows = pairs.take_all()  # |twin pairs|-bounded: 500 rows
    dt = time.time() - t0
    assert len(rows) == twins, len(rows)
    for r in rows:
        assert r["mirror"] and r["n_shared"] == per_twin, r
        assert r["host_a"].startswith("alpha")
        assert r["host_b"] == "beta" + r["host_a"][5:]
    print(f"mirror: {n:,} pages in {dt:.1f}s "
          f"({n / dt / 1000:.0f}k pages/s), "
          f"{twins} planted twins all recovered exactly")

    ray.shutdown()


if __name__ == "__main__":
    main()
