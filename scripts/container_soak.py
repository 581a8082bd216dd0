"""Soak for the round-4 container-demux family at forced scale:

  * 1,000,000 mixed container files (250k each of MP4 / Matroska /
    AVI / MPEG-TS), every layout variant cycling (v0/v1 + co64 +
    chunk patterns; all four lacings + unknown-size segments + both
    doctypes; idx1 absent/relative/absolute; bounded + unbounded
    PES + null packets), probed through the REAL demuxers;
  * every probed field of every file verified against the
    closed-form expectation (vectorized numpy recompute — zero
    tolerance, not sampling);
  * wall clock + files/s per family reported for BASELINE.md.

Run: python scripts/container_soak.py   (owns its Ray session)
"""

import time

import numpy as np
import pyarrow as pa

N_PER = 250_000


def main() -> None:
    import ray
    import ray.data as rd

    if not ray.is_initialized():
        ray.init(address="local", num_cpus=32,
                 include_dashboard=False, logging_level="ERROR")
    from ray.data import DataContext

    DataContext.get_current().enable_progress_bars = False

    from webxtract.ops.avi import ProbeAVI, _render_probe_fixture as rav
    from webxtract.ops.mkv import ProbeMKV, _render_probe_fixture as rmk
    from webxtract.ops.mp4 import ProbeMP4, _render_probe_fixture as rmp
    from webxtract.ops.mpegts import ProbeTS, \
        _render_probe_fixture as rts

    ids = rd.range(N_PER).map_batches(
        lambda t: pa.table({"doc_id": t.column("id")}),
        batch_format="pyarrow").repartition(64).materialize()

    def run(family, render, probe_cls, checks):
        probe = probe_cls()
        t0 = time.monotonic()
        out = ids.map_batches(render, batch_format="pyarrow",
                              batch_size=256) \
            .map_batches(lambda b: probe(b), batch_format="pyarrow",
                         zero_copy_batch=True, batch_size=256)
        cols = {}
        n = 0
        for b in out.iter_batches(batch_format="pyarrow"):
            n += b.num_rows
            for name in checks:
                cols.setdefault(name, []).append(
                    b.column(name).to_numpy(zero_copy_only=False))
            cols.setdefault("media_id", []).append(
                b.column("media_id").to_numpy())
            cols.setdefault("ok", []).append(
                b.column("ok").to_numpy(zero_copy_only=False))
        wall = time.monotonic() - t0
        i = np.concatenate(cols["media_id"])
        assert n == N_PER and len(set(i.tolist())) == N_PER
        assert np.concatenate(cols["ok"]).all(), family
        got = {k: np.concatenate(v) for k, v in cols.items()
               if k not in ("media_id", "ok")}
        for name, expect_fn in checks.items():
            exp = expect_fn(i)
            bad = got[name] != exp
            assert not bad.any(), (
                family, name, i[bad][:5], got[name][bad][:5],
                exp[bad][:5])
        print(f"{family}: {N_PER} files probed+verified exact in "
              f"{wall:.1f}s ({N_PER / wall:,.0f} files/s)")
        return wall

    def geo_sum(i, base, a, b, mod, nf_fn):
        # sum_k base + (a*i + b*k) % mod for k in 0..nf-1, vectorized
        nf = nf_fn(i)
        mx = int(nf.max())
        ks = np.arange(mx)
        m = ks[None, :] < nf[:, None]
        vals = base + (a * i[:, None] + b * ks[None, :]) % mod
        return (vals * m).sum(axis=1)

    nf6 = lambda i: 3 + i % 6

    walls = {}
    walls["mp4"] = run(
        "mp4", rmp, ProbeMP4, {
            "n_samples": nf6,
            "width": lambda i: 64 + 8 * (i % 5),
            "height": lambda i: 48 + 8 * (i % 4),
            "duration_ms": lambda i: (nf6(i) + 1)
            * (512 + 256 * (i % 3)) * 1000 // 12800,
            "sample_bytes": lambda i: geo_sum(i, 200, 13, 7, 100, nf6),
        })
    walls["mkv"] = run(
        "mkv", rmk, ProbeMKV, {
            "n_frames": nf6,
            "width": lambda i: 64 + 8 * (i % 5),
            "height": lambda i: 48 + 8 * (i % 4),
            "duration_ms": lambda i: nf6(i) * 40,
            "frame_bytes": lambda i: np.where(
                i % 4 == 3,
                nf6(i) * (120 + (11 * i) % 80),
                geo_sum(i, 120, 11, 5, 80, nf6)),
        })
    walls["avi"] = run(
        "avi", rav, ProbeAVI, {
            "n_frames": nf6,
            "width": lambda i: 64 + 8 * (i % 5),
            "height": lambda i: 48 + 8 * (i % 4),
            "duration_ms": lambda i: nf6(i) * 40,
            "frame_bytes": lambda i: geo_sum(i, 150, 17, 9, 120, nf6),
        })
    walls["mpegts"] = run(
        "mpegts", rts, ProbeTS, {
            "n_pes": nf6,
            "duration_ms": lambda i: (nf6(i) - 1) * 40,
            "payload_bytes": lambda i: geo_sum(i, 180, 19, 11, 150,
                                               nf6),
            "cc_errors": lambda i: np.zeros(len(i), np.int64),
            "pes_errors": lambda i: np.zeros(len(i), np.int64),
        })
    total = sum(walls.values())
    print(f"TOTAL: {4 * N_PER} files in {total:.1f}s "
          f"({4 * N_PER / total:,.0f} files/s aggregate)")
    ray.shutdown()


if __name__ == "__main__":
    main()
