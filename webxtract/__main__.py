"""CLI entry points — the operational surface a user of the reference
would switch to (upload-bucket trigger -> batch runs over parquet).

    python -m webxtract run --input DIR --out DIR [--resume] [...]
    python -m webxtract synth --out DIR --docs N
    python -m webxtract reviews --results DIR --reviews PATH --out DIR
    python -m webxtract manifest --out DIR

Only this CLI (and bench.py / the test fixture) owns a Ray session;
library code never calls ray.init (driver contract).
"""

from __future__ import annotations

import argparse
import json
import sys


def _ray_session(num_cpus: int | None):
    import ray

    if not ray.is_initialized():
        kwargs = dict(address="local", include_dashboard=False,
                      ignore_reinit_error=True, logging_level="ERROR")
        if num_cpus:
            kwargs["num_cpus"] = num_cpus
        ray.init(**kwargs)
    import logging

    from ray.data import DataContext

    DataContext.get_current().enable_progress_bars = False
    logging.getLogger("ray.data").setLevel(logging.ERROR)
    return ray


def cmd_run(args) -> int:
    ray = _ray_session(args.num_cpus)
    from .checkpoint import manifest_table, run_partitioned
    from .metrics import dump, start
    from .pipeline import PipelineConfig

    import time as _time

    t0 = _time.monotonic()
    start()
    cfg = PipelineConfig(
        max_bytes=args.max_bytes,
        skew_split_bytes=args.skew_split_bytes,
        exact_dedup=args.exact_dedup,
        instrument=True,
    )
    manifest = run_partitioned(args.input, args.out, cfg,
                               max_concurrent=args.max_concurrent)
    dump(args.out)
    mt = manifest_table(args.out)
    print(json.dumps({
        "partitions": len(manifest),
        "rows_in": sum(m["rows_in"] for m in manifest.values()),
        "rows_out": sum(m["rows_out"] for m in manifest.values()),
        "rejected": sum(m["rejected"] for m in manifest.values()),
        "review": sum(m["reviewed"] for m in manifest.values()),
        # elapsed run wall, NOT the per-partition sum: wave dispatch
        # records the shared wave wall in every member partition
        "wall_ms": int((_time.monotonic() - t0) * 1000),
    }))
    ray.shutdown()
    return 0


def cmd_synth(args) -> int:
    ray = _ray_session(args.num_cpus)
    from .synth import write_pages_parquet

    write_pages_parquet(args.out, args.docs, seed=args.seed)
    print(json.dumps({"out": args.out, "docs": args.docs}))
    ray.shutdown()
    return 0


def cmd_reviews(args) -> int:
    """Join review answers back onto extraction results (run 2 of the
    human-review path, SURVEY §3.2)."""
    ray = _ray_session(args.num_cpus)
    import ray.data as rd

    from .review import coalesce_stage, read_reviews, reviews_to_dict

    results = rd.read_parquet(args.results)
    lookup = reviews_to_dict(read_reviews(args.reviews))
    ref = ray.put(lookup)
    out = results.map_batches(coalesce_stage(ref), batch_format="pyarrow",
                              zero_copy_batch=True)
    out.write_parquet(args.out)
    print(json.dumps({"rows": sum(
        b.num_rows for b in rd.read_parquet(args.out).iter_batches(
            batch_format="pyarrow"))}))
    ray.shutdown()
    return 0


def cmd_dedup(args) -> int:
    """Near-dup mining over a (doc_id, text) parquet corpus: verified
    pair list (minhash | simhash | the exact all-pairs baseline), with
    optional connected-component cluster assignment."""
    ray = _ray_session(args.num_cpus)
    import ray.data as rd

    from .ops import dedup as D

    ds = rd.read_parquet(args.input, columns=[args.id_col, args.text_col])
    if args.id_col != "doc_id" or args.text_col != "text":
        ds = ds.rename_columns({args.id_col: "doc_id",
                                args.text_col: "text"})
    if args.method == "minhash":
        pairs = D.minhash_lsh_pairs(ds, threshold=args.threshold)
    elif args.method == "simhash":
        pairs = D.simhash_pairs(ds, max_dist=args.max_dist)
    else:
        pairs = D.ngram_jaccard_pairs(ds, threshold=args.threshold)
    pairs = pairs.materialize()  # consumed twice when clustering
    pairs.write_parquet(f"{args.out}/pairs")
    n_pairs = pairs.count()
    n_clusters = None
    if args.clusters:
        cl = D.dedup_clusters(pairs)
        cl.write_parquet(f"{args.out}/clusters")
        n_clusters = cl.count()
    print(json.dumps({"pairs": n_pairs, "clustered_docs": n_clusters,
                      "out": args.out}))
    ray.shutdown()
    return 0


def cmd_corpus(args) -> int:
    """Training-corpus export over a pages parquet directory:
    extract -> quality/length filter -> exact content dedup -> stats ->
    sharded parquet (the flagship composite; see webxtract/training.py)."""
    ray = _ray_session(args.num_cpus)
    import ray.data as rd

    from .training import export_training_corpus

    ds = rd.read_parquet(args.input)
    langs = tuple(args.langs.split(",")) if args.langs else None
    export_training_corpus(
        ds, args.out, min_text_chars=args.min_chars, langs=langs,
        source_path=args.input,
        checkpoint_dir=f"{args.out}.ckpt" if args.checkpoint else None)
    n = sum(b.num_rows for b in rd.read_parquet(args.out).iter_batches(
        batch_format="pyarrow"))
    print(json.dumps({"rows": n, "out": args.out}))
    ray.shutdown()
    return 0


def cmd_warc(args) -> int:
    """Parse a directory of .warc / .warc.gz files into a pages
    parquet directory (url, warc_ts, html, http_status, n_bytes) —
    the Common-Crawl ingestion front door; feed the output to
    `run` / `corpus`."""
    ray = _ray_session(args.num_cpus)
    import ray.data as rd

    from .ops.warc import read_warc

    read_warc(args.input, pages_schema=True).write_parquet(args.out)
    n = sum(b.num_rows for b in rd.read_parquet(
        args.out, columns=["url"]).iter_batches(batch_format="pyarrow"))
    print(json.dumps({"rows": n, "out": args.out}))
    ray.shutdown()
    return 0


def cmd_links(args) -> int:
    """Extract the distinct cross-host link graph from a pages
    parquet directory (url, html) and write (src_host, dst_host)
    parquet."""
    ray = _ray_session(args.num_cpus)
    import ray.data as rd

    from .ops.web import extract_links

    ds = rd.read_parquet(args.input, columns=["url", "html"])
    extract_links(ds).write_parquet(args.out)
    n = sum(b.num_rows for b in rd.read_parquet(
        args.out, columns=["src_host"]).iter_batches(
        batch_format="pyarrow"))
    print(json.dumps({"edges": n, "out": args.out}))
    ray.shutdown()
    return 0


def cmd_manifest(args) -> int:
    from .checkpoint import load_manifest

    print(json.dumps(sorted(load_manifest(args.out).values(),
                            key=lambda r: r["partition_id"]), indent=2))
    return 0


def main(argv=None) -> int:
    p = argparse.ArgumentParser(prog="webxtract")
    sub = p.add_subparsers(dest="cmd", required=True)

    r = sub.add_parser("run", help="checkpointed extraction run")
    r.add_argument("--input", required=True)
    r.add_argument("--out", required=True)
    r.add_argument("--num-cpus", type=int, default=None)
    r.add_argument("--max-bytes", type=int, default=65_536)
    r.add_argument("--skew-split-bytes", type=int, default=None)
    r.add_argument("--exact-dedup", action="store_true")
    r.add_argument("--max-concurrent", type=int, default=None,
                   help="concurrent partition pipelines (default 4)")
    r.set_defaults(fn=cmd_run)

    s = sub.add_parser("synth", help="generate a synthetic pages corpus")
    s.add_argument("--out", required=True)
    s.add_argument("--docs", type=int, default=10_000)
    s.add_argument("--seed", type=int, default=42)
    s.add_argument("--num-cpus", type=int, default=None)
    s.set_defaults(fn=cmd_synth)

    v = sub.add_parser("reviews", help="coalesce review answers onto results")
    v.add_argument("--results", required=True)
    v.add_argument("--reviews", required=True)
    v.add_argument("--out", required=True)
    v.add_argument("--num-cpus", type=int, default=None)
    v.set_defaults(fn=cmd_reviews)

    m = sub.add_parser("manifest", help="print a run's checkpoint manifest")
    m.add_argument("--out", required=True)
    m.set_defaults(fn=cmd_manifest)

    d = sub.add_parser("dedup", help="near-dup pair mining / clustering")
    d.add_argument("--input", required=True)
    d.add_argument("--out", required=True)
    d.add_argument("--method", choices=["minhash", "simhash", "exact"],
                   default="minhash")
    d.add_argument("--threshold", type=float, default=0.7)
    d.add_argument("--max-dist", type=int, default=3)
    d.add_argument("--clusters", action="store_true")
    d.add_argument("--id-col", default="doc_id")
    d.add_argument("--text-col", default="text")
    d.add_argument("--num-cpus", type=int, default=None)
    d.set_defaults(fn=cmd_dedup)

    c = sub.add_parser("corpus", help="training-corpus export")
    c.add_argument("--input", required=True)
    c.add_argument("--out", required=True)
    c.add_argument("--min-chars", type=int, default=80)
    c.add_argument("--langs", default=None)
    c.add_argument("--checkpoint", action="store_true",
                   help="spill the extraction pin to parquet (100TB path)")
    c.add_argument("--num-cpus", type=int, default=None)
    c.set_defaults(fn=cmd_corpus)

    w = sub.add_parser("warc", help="parse WARC files into pages parquet")
    w.add_argument("--input", required=True)
    w.add_argument("--out", required=True)
    w.add_argument("--num-cpus", type=int, default=None)
    w.set_defaults(fn=cmd_warc)

    lk = sub.add_parser("links", help="extract the cross-host link graph")
    lk.add_argument("--input", required=True)
    lk.add_argument("--out", required=True)
    lk.add_argument("--num-cpus", type=int, default=None)
    lk.set_defaults(fn=cmd_links)

    args = p.parse_args(argv)
    return args.fn(args)


if __name__ == "__main__":
    sys.exit(main())
