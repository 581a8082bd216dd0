"""training_corpus composite soak: the flagship extract->gate->dedup->
stats pipeline end-to-end at 6M+ pages with ``checkpoint_dir`` (the
100 TB posture: post-extraction results spilled to parquet, not pinned
in the object store) and the content-dedup JOIN path exercised FORCED
alongside the broadcast twin — round-3 verdict items 3 and 9.

Corpus: ``synth.write_pages_parquet``-style sharded generation, plus a
planted cross-url EXACT-content mirror for every doc_id % 20 == 1
non-"bad" page (same html re-served at https://a-mirror{i}.example/copy,
which sorts BELOW the site url, so the mirror is the deterministic
min-url winner and the original must drop).

Ground truth is computed independently with DuckDB over the CHECKPOINT
parquet (the post-gate, pre-dedup rows the engine itself spilled):
survivors must be exactly one row per distinct content_md5, and every
surviving url must equal min(url) of its hash group. The broadcast and
join paths must agree row-for-row (checksum over sorted (url, md5)).

Phases run in fresh Ray sessions (fresh process per mode so the two
timings are regime-comparable).

Run:  python scripts/training_soak.py [--docs 6000000] [--cpus 32]
Prints one JSON line; recorded in BASELINE.md §7.
"""

from __future__ import annotations

import argparse
import json
import os
import shutil
import subprocess
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))

ROOT = "/tmp/webxtract_training_soak"
MIRROR_STRIDE = 20


def phase_synth(args) -> dict:
    import logging

    import pyarrow as pa
    import pyarrow.parquet as pq
    import ray

    if not ray.is_initialized():
        ray.init(address="local", num_cpus=args.cpus,
                 include_dashboard=False, logging_level=logging.ERROR,
                 log_to_driver=False)
    from webxtract import synth

    out_dir = os.path.join(ROOT, "pages")
    os.makedirs(out_dir, exist_ok=True)
    rows_per_file = 50_000

    @ray.remote
    def _shard(shard_id: int, start: int, count: int) -> int:
        t = synth.make_pages(count, doc_id_start=start)
        mirrors = {k: [] for k in ("url", "warc_ts", "html",
                                   "text", "lang")}
        for i in range(start, start + count):
            if i % MIRROR_STRIDE != 1:
                continue
            d = synth.render_doc(i)
            if d["_family"] == "bad":
                continue
            mirrors["url"].append(f"https://a-mirror{i}.example/copy")
            mirrors["warc_ts"].append(d["warc_ts"] + 7)
            mirrors["html"].append(d["html"])
            mirrors["text"].append(d["text"])
            mirrors["lang"].append(d["lang"])
        if mirrors["url"]:
            m = pa.Table.from_pydict(mirrors).cast(t.schema)
            t = pa.concat_tables([t, m])
        tmp = os.path.join(out_dir, f".part-{shard_id:05d}.tmp")
        pq.write_table(t, tmp, compression="zstd")
        os.replace(tmp, os.path.join(out_dir,
                                     f"part-{shard_id:05d}.parquet"))
        return t.num_rows

    t0 = time.perf_counter()
    futs, shard = [], 0
    for start in range(0, args.docs, rows_per_file):
        futs.append(_shard.remote(
            shard, start, min(rows_per_file, args.docs - start)))
        shard += 1
    total = sum(ray.get(futs))
    return {"rows": total, "synth_s": round(time.perf_counter() - t0, 1)}


def phase_run(args) -> dict:
    import logging

    import ray

    if not ray.is_initialized():
        ray.init(address="local", num_cpus=args.cpus,
                 include_dashboard=False, logging_level=logging.ERROR,
                 log_to_driver=False)
    from ray.data import DataContext

    DataContext.get_current().enable_progress_bars = False
    logging.getLogger("ray.data").setLevel(logging.ERROR)
    import ray.data as rd

    from webxtract.training import (TRAINING_DUP_BROADCAST_MAX,
                                    training_corpus)

    mode = args.mode
    pages_dir = os.path.join(ROOT, "pages")
    ckpt = os.path.join(ROOT, f"ckpt_{mode}")
    out = os.path.join(ROOT, f"out_{mode}")
    for d in (ckpt, out):
        shutil.rmtree(d, ignore_errors=True)
    t0 = time.perf_counter()
    ds = rd.read_parquet(pages_dir)
    corpus = training_corpus(ds, source_path=pages_dir,
                             checkpoint_dir=ckpt, dedup_mode=mode)
    corpus.write_parquet(out)
    wall = time.perf_counter() - t0
    n_in = rd.read_parquet(pages_dir,
                           columns=["url"]).count()
    return {"mode": mode, "wall_s": round(wall, 1),
            "docs_per_s": round(n_in / wall),
            "gate": TRAINING_DUP_BROADCAST_MAX}


def phase_verify(args) -> dict:
    import duckdb

    con = duckdb.connect()
    ckpt = os.path.join(ROOT, "ckpt_join")
    res = {}
    # independent truth from the engine's own checkpoint spill
    n_kept, n_hash, n_dup = con.execute(f"""
        SELECT count(*), count(DISTINCT content_md5),
               (SELECT count(*) FROM (
                    SELECT content_md5 FROM '{ckpt}/*.parquet'
                    GROUP BY content_md5 HAVING count(*) > 1))
        FROM '{ckpt}/*.parquet'""").fetchone()
    res["kept_rows"] = n_kept
    res["distinct_hashes"] = n_hash
    res["dup_hashes"] = n_dup
    for mode in ("join", "broadcast"):
        out = os.path.join(ROOT, f"out_{mode}")
        n_out, n_md5 = con.execute(
            f"SELECT count(*), count(DISTINCT content_md5) "
            f"FROM '{out}/*.parquet'").fetchone()
        winners_ok = con.execute(f"""
            SELECT count(*) FROM (
                SELECT content_md5, min(url) AS mu
                FROM '{ckpt}/*.parquet' GROUP BY content_md5) w
            JOIN '{out}/*.parquet' o
              ON w.content_md5 = o.content_md5 AND w.mu = o.url
            """).fetchone()[0]
        res[f"{mode}_rows"] = n_out
        res[f"{mode}_ok"] = (n_out == n_hash == n_md5 == winners_ok)
    a = con.execute(f"""
        SELECT count(*), sum(hash(url || content_md5))
        FROM '{os.path.join(ROOT, "out_join")}/*.parquet'""").fetchone()
    b = con.execute(f"""
        SELECT count(*), sum(hash(url || content_md5))
        FROM '{os.path.join(ROOT, "out_broadcast")}/*.parquet'
        """).fetchone()
    res["paths_identical"] = (a == b)
    return res


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--docs", type=int, default=6_000_000)
    ap.add_argument("--cpus", type=int, default=32)
    ap.add_argument("--phase", default=None)
    ap.add_argument("--mode", default="join")
    ap.add_argument("--keep", action="store_true")
    args = ap.parse_args()

    if args.phase:
        fn = {"synth": phase_synth, "run": phase_run,
              "verify": phase_verify}[args.phase]
        print("PHASE_RESULT " + json.dumps(fn(args)))
        return 0

    os.makedirs(ROOT, exist_ok=True)
    results = {"docs": args.docs, "cpus": args.cpus}

    def sub(phase, mode=None):
        cmd = [sys.executable, os.path.abspath(__file__),
               "--docs", str(args.docs), "--cpus", str(args.cpus),
               "--phase", phase]
        if mode:
            cmd += ["--mode", mode]
        p = subprocess.run(cmd, capture_output=True, text=True,
                           cwd=os.path.dirname(os.path.dirname(
                               os.path.abspath(__file__))))
        for line in p.stdout.splitlines():
            if line.startswith("PHASE_RESULT "):
                return json.loads(line[len("PHASE_RESULT "):])
        sys.stderr.write(p.stdout[-4000:] + "\n" + p.stderr[-4000:])
        raise RuntimeError(f"phase {phase} {mode or ''} failed")

    marker = os.path.join(ROOT, "pages", "_DOCS")
    have = None
    if os.path.exists(marker):
        have = int(open(marker).read().strip() or 0)
    if have != args.docs:  # size-keyed: a smaller smoke run never aliases
        shutil.rmtree(os.path.join(ROOT, "pages"), ignore_errors=True)
        results["synth"] = sub("synth")
        with open(marker, "w") as f:
            f.write(str(args.docs))
    for mode in ("join", "broadcast"):
        results[mode] = sub("run", mode)
    results["verify"] = sub("verify")
    ok = (results["verify"]["join_ok"]
          and results["verify"]["broadcast_ok"]
          and results["verify"]["paths_identical"])
    results["ok"] = ok
    print(json.dumps(results))
    if not args.keep:
        for d in ("ckpt_join", "ckpt_broadcast", "out_join",
                  "out_broadcast"):
            shutil.rmtree(os.path.join(ROOT, d), ignore_errors=True)
    return 0 if ok else 1


if __name__ == "__main__":
    sys.exit(main())
