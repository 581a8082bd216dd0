"""Per-partition checkpoint manifests + lineage metrics — resumable runs.

Replaces the reference's durable-state machinery (DynamoDB ownership
table with TTL, template.sam.yml:633-646 / fn-notify-progress
main.py:103-131; Step Functions execution history as implicit
checkpoint) with the batch-engine equivalent (SURVEY.md §4.2):

  * input partitions = input parquet files (deterministic, input-driven);
  * each partition runs the full extraction pipeline and writes
    ``out/part={id}/`` ATOMICALLY (temp dir + rename);
  * a manifest row per partition (schema.MANIFEST) with an input
    fingerprint (file path+size+mtime hash), row counts, status, wall
    time — written atomically after the partition's data;
  * resume = skip partitions whose manifest row says done AND whose
    input fingerprint still matches; everything else reruns;
  * lineage metrics rows (schema.METRICS) per (partition, stage).

Wall-clock appears ONLY in manifests/metrics (operational metadata) —
never in data columns, so resume == fresh byte-wise on the data.

At cluster scale each partition is itself a parallel Ray pipeline over
that file's blocks; partitions are processed sequentially here for
deterministic manifests, but independent partitions could be dispatched
concurrently — correctness only needs the atomic rename + fingerprint.
"""

from __future__ import annotations

import hashlib
import json
import os
import shutil
import time

import pyarrow as pa
import pyarrow.compute as pc
import pyarrow.parquet as pq

from . import schema as S
from .pipeline import PipelineConfig, extract_pipeline


def input_fingerprint(path: str, extra: str = "") -> str:
    """Fingerprint = path + size + mtime at NANOSECOND resolution (a
    whole-second mtime lets a same-second same-size rewrite slip past
    resume and serve stale output). ``extra`` folds run-global state
    (e.g. the cross-partition dedup winner digest) into the key so a
    change there invalidates every partition."""
    st = os.stat(path)
    key = f"{os.path.abspath(path)}|{st.st_size}|{st.st_mtime_ns}|{extra}"
    return hashlib.md5(key.encode()).hexdigest()


def _manifest_path(out_dir: str, pid: int) -> str:
    return os.path.join(out_dir, "manifest", f"part-{pid:05d}.json")


def _atomic_write_json(path: str, obj: dict) -> None:
    os.makedirs(os.path.dirname(path), exist_ok=True)
    tmp = path + ".tmp"
    with open(tmp, "w") as f:
        json.dump(obj, f, sort_keys=True)
    os.replace(tmp, path)


def load_manifest(out_dir: str) -> dict[int, dict]:
    mdir = os.path.join(out_dir, "manifest")
    out: dict[int, dict] = {}
    if not os.path.isdir(mdir):
        return out
    for name in sorted(os.listdir(mdir)):
        if name.endswith(".json"):
            with open(os.path.join(mdir, name)) as f:
                row = json.load(f)
            out[row["partition_id"]] = row
    return out


def manifest_table(out_dir: str) -> pa.Table:
    rows = sorted(load_manifest(out_dir).values(),
                  key=lambda r: r["partition_id"])
    if not rows:
        return S.MANIFEST.empty_table()
    return pa.Table.from_pylist([
        {k: r[k] for k in (f.name for f in S.MANIFEST)} for r in rows
    ], schema=S.MANIFEST)


def _global_dup_state(paths: list[str]):
    """Cross-partition dedup winners: one column-pruned scan of ALL
    input files (url-dedup D1 is otherwise per-partition under
    run_partitioned, and a url spanning two files would survive twice).

    Returns (dup_table_or_None, digest):
      * dup_table — (url, max_ts) for every url duplicated ANYWHERE
        (feeds the per-partition winner filter);
      * digest — hash of the CROSS-FILE winners only. Within-file dups
        affect only their own partition, whose file fingerprint already
        covers them; keeping them out of the digest means editing one
        file does not invalidate unrelated partitions on resume.
    """
    import ray.data as rd
    from ray.data.aggregate import Count, Max, Sum

    def _tag(fid: int):
        def fn(t: pa.Table) -> pa.Table:
            return t.append_column(
                "fid", pa.array([fid] * t.num_rows, pa.int32()))

        return fn

    parts = [rd.read_parquet(p, columns=["url", "warc_ts"])
             .map_batches(_tag(i), batch_format="pyarrow",
                          zero_copy_batch=True)
             for i, p in enumerate(paths)]
    proj = parts[0].union(*parts[1:]) if len(parts) > 1 else parts[0]
    per_file = proj.groupby(["url", "fid"]).aggregate(
        Max("warc_ts", alias_name="max_ts"), Count(alias_name="n"))
    per_url = per_file.groupby("url").aggregate(
        Max("max_ts", alias_name="max_ts"),
        Sum("n", alias_name="total"),
        Count(alias_name="n_files"))
    dup_batches, cross = [], []
    for b in per_url.iter_batches(batch_format="pyarrow"):
        d = b.filter(pc.greater(b.column("total"), 1))
        if d.num_rows:
            dup_batches.append(d.select(["url", "max_ts"]))
        x = b.filter(pc.greater(b.column("n_files"), 1))
        cross.extend(zip(x.column("url").to_pylist(),
                         x.column("max_ts").to_pylist()))
    if not dup_batches:
        return None, "nodups"
    dup_tbl = pa.concat_tables(dup_batches).combine_chunks()
    h = hashlib.md5()
    for u, t in sorted(cross):
        h.update(f"{u}|{t}".encode())
    return dup_tbl, h.hexdigest()


def run_partitioned(input_dir: str, out_dir: str,
                    cfg: PipelineConfig | None = None,
                    fail_after: int | None = None) -> dict[int, dict]:
    """Run the extraction pipeline partition-by-partition with resume.

    Url-dedup is GLOBAL across partitions: a pruned (url, warc_ts) scan
    of the whole input set computes winners once; each partition is
    broadcast-filtered to them before extraction, so output matches
    extract_pipeline over the union of all files. Orphan partitions
    (pids beyond the current input list) are garbage-collected so a
    resumed run over a reduced input set never serves stale data.

    ``fail_after`` (tests only): raise after N partitions to simulate a
    mid-run crash; a rerun must produce outputs identical to an
    uninterrupted run (property test).
    Returns the manifest dict.
    """
    import ray.data as rd

    from .dedup import filter_to_winners

    cfg = cfg or PipelineConfig()
    files = sorted(
        f for f in os.listdir(input_dir)
        if f.endswith(".parquet") and not f.startswith(".")
    )
    paths = [os.path.join(input_dir, f) for f in files]
    dup_tbl, dup_digest = _global_dup_state(paths)
    manifest = load_manifest(out_dir)
    _gc_orphans(out_dir, manifest, len(files))
    done = 0
    for pid, fname in enumerate(files):
        fpath = os.path.join(input_dir, fname)
        fp = input_fingerprint(fpath, extra=dup_digest)
        prev = manifest.get(pid)
        if prev and prev["status"] == "done" and prev["input_fingerprint"] == fp:
            continue  # resume: this partition is finished and unchanged
        if fail_after is not None and done >= fail_after:
            raise RuntimeError(f"injected failure before partition {pid}")
        t0 = time.monotonic()
        ds = rd.read_parquet(fpath)
        rows_in = ds.count()
        ds = filter_to_winners(ds, dup_tbl)
        # source_path: the internal (within-file) dedup aggregates its
        # winners from a pruned re-read of the file rather than
        # re-executing the filtered lineage; compatible with the global
        # filter (a global winner always has the file-level max ts too)
        result = extract_pipeline(ds, cfg, source_path=fpath)
        part_dir = os.path.join(out_dir, f"part={pid:05d}")
        tmp_dir = part_dir + ".tmp"
        shutil.rmtree(tmp_dir, ignore_errors=True)
        shutil.rmtree(part_dir, ignore_errors=True)
        result.write_parquet(tmp_dir)
        os.replace(tmp_dir, part_dir)  # atomic publish
        out_t = pq.read_table(part_dir, columns=["route"])
        routes = out_t.column("route")
        wall_ms = int((time.monotonic() - t0) * 1000)
        row = {
            "partition_id": pid,
            "input_fingerprint": fp,
            "rows_in": rows_in,
            "rows_out": out_t.num_rows,
            "rejected": pc.sum(pc.equal(routes, pa.scalar("rejected"))).as_py() or 0,
            "reviewed": pc.sum(pc.equal(routes, pa.scalar("review"))).as_py() or 0,
            "status": "done",
            "wall_ms": wall_ms,
            "created_at": int(time.time() * 1_000_000),
        }
        _atomic_write_json(_manifest_path(out_dir, pid), row)
        _append_metrics(out_dir, pid, "extract_pipeline", rows_in,
                        out_t.num_rows, wall_ms)
        manifest[pid] = row
        done += 1
    return manifest


def _gc_orphans(out_dir: str, manifest: dict[int, dict],
                n_files: int) -> None:
    """Delete part dirs + manifest/metrics rows for partition ids beyond
    the current input file list (leftovers of a previously larger input
    set would otherwise be concatenated by read_output)."""
    stale = [pid for pid in manifest if pid >= n_files]
    for pid in stale:
        shutil.rmtree(os.path.join(out_dir, f"part={pid:05d}"),
                      ignore_errors=True)
        for p in (_manifest_path(out_dir, pid),
                  os.path.join(out_dir, "metrics", f"part-{pid:05d}.jsonl")):
            try:
                os.remove(p)
            except FileNotFoundError:
                pass
        manifest.pop(pid)
    if os.path.isdir(out_dir):  # stray dirs with no manifest row
        for d in os.listdir(out_dir):
            if d.startswith("part=") and not d.endswith(".tmp"):
                try:
                    pid = int(d.split("=", 1)[1])
                except ValueError:
                    continue
                if pid >= n_files:
                    shutil.rmtree(os.path.join(out_dir, d),
                                  ignore_errors=True)


def _append_metrics(out_dir: str, pid: int, stage: str, rows_in: int,
                    rows_out: int, wall_ms: int) -> None:
    """Lineage rows -> metrics/ JSONL (one file per partition: atomic,
    idempotent on rerun)."""
    mpath = os.path.join(out_dir, "metrics", f"part-{pid:05d}.jsonl")
    os.makedirs(os.path.dirname(mpath), exist_ok=True)
    tmp = mpath + ".tmp"
    with open(tmp, "w") as f:
        f.write(json.dumps({
            "stage": stage, "partition_id": pid, "rows_in": rows_in,
            "rows_out": rows_out, "bytes_in": None, "wall_ms": wall_ms,
        }, sort_keys=True) + "\n")
    os.replace(tmp, mpath)


def read_output(out_dir: str, columns: list[str] | None = None) -> pa.Table:
    """Read all published partitions (ignores *.tmp) as one table."""
    parts = sorted(
        os.path.join(out_dir, d) for d in os.listdir(out_dir)
        if d.startswith("part=") and not d.endswith(".tmp")
    )
    tables = [pq.read_table(p, columns=columns) for p in parts]
    return pa.concat_tables(tables)
