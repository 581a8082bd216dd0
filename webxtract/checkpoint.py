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


# Below this total compressed input size the global dup scan runs as a
# driver-side Arrow hash-aggregate over the pruned (url, warc_ts)
# columns: Ray's sort-based groupby pays ~8s of fixed exchange overhead
# per call on this box, vs ~0.3s for Arrow's multithreaded C++ kernel
# on the same 400k slim rows. Above the gate (where the slim projection
# no longer fits one node) the distributed path takes over.
DRIVER_DUP_SCAN_MAX_BYTES = 2 << 30


def _global_dup_state_local(paths: list[str]):
    """Driver-side twin of the distributed dup scan (same outputs)."""
    from concurrent.futures import ThreadPoolExecutor

    def _read(i_p):
        i, p = i_p
        t = pq.read_table(p, columns=["url", "warc_ts"])
        return t.append_column(
            "fid", pa.array([i] * t.num_rows, pa.int32()))

    with ThreadPoolExecutor(max_workers=8) as pool:
        tables = list(pool.map(_read, enumerate(paths)))
    t = pa.concat_tables(tables)
    per_file = t.group_by(["url", "fid"]).aggregate(
        [("warc_ts", "max"), ([], "count_all")])
    per_url = per_file.group_by("url").aggregate(
        [("warc_ts_max", "max"), ("count_all", "sum"), ([], "count_all")])
    total = per_url.column("count_all_sum")
    dups = per_url.filter(pc.greater(total, 1))
    cross = per_url.filter(pc.greater(per_url.column("count_all"), 1))
    if dups.num_rows == 0:
        return None, "nodups"
    dup_tbl = pa.table({"url": dups.column("url"),
                        "max_ts": dups.column("warc_ts_max_max")})
    h = hashlib.md5()
    for u, ts in sorted(zip(cross.column("url").to_pylist(),
                            cross.column("warc_ts_max_max").to_pylist())):
        h.update(f"{u}|{ts}".encode())
    return dup_tbl.combine_chunks(), h.hexdigest()


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

    if sum(os.stat(p).st_size for p in paths) <= DRIVER_DUP_SCAN_MAX_BYTES:
        return _global_dup_state_local(paths)

    # ONE multi-file read with include_paths, fid derived from the path
    # column vectorized — a union of N tagged per-file reads planned a
    # 100-way lineage that pinned the DRIVER at 100% while workers sat
    # idle (union planning is driver-bound and quadratic-ish in inputs)
    paths_arr = pa.array([os.path.abspath(p) for p in paths])
    proj = rd.read_parquet(paths, columns=["url", "warc_ts"],
                           include_paths=True)

    def _tag(t: pa.Table) -> pa.Table:
        fid = pc.index_in(t.column("path"), value_set=paths_arr) \
            .cast(pa.int32())
        if fid.null_count:  # path form drifted from the input list
            raise ValueError("unresolvable source path in include_paths")
        return pa.table({"url": t.column("url"),
                         "warc_ts": t.column("warc_ts"), "fid": fid})

    proj = proj.map_batches(_tag, batch_format="pyarrow",
                            zero_copy_batch=True)
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


def _patch_fsspec_import_race() -> None:
    """Ray's path resolution probes `fsspec.implementations.http` on
    EVERY read/write and suppresses only ModuleNotFoundError (aiohttp
    absent). Under concurrent driver threads the first imports can race
    and leave a partially-initialized module in sys.modules, after
    which every probe raises ImportError ("cannot import name
    HTTPFileSystem") instead — poisoning the whole process. Wrap the
    probe so ImportError means what ModuleNotFoundError means: "not an
    HTTP filesystem". Idempotent; driver-side only; this engine never
    reads HTTP filesystems."""
    import ray.data.datasource.path_util as _pu

    orig = _pu._is_http_filesystem
    if getattr(orig, "_webxtract_safe", False):
        return

    def safe(fs):
        try:
            return orig(fs)
        except ImportError:
            return False

    safe._webxtract_safe = True
    _pu._is_http_filesystem = safe


# Below this compressed size a partition file is read ON THE DISPATCH
# THREAD and handed to Ray pre-sliced: a single-row-group file otherwise
# reads as ONE task streaming its split blocks out sequentially, which
# staggers the extract fan-out (measured 4.6s -> 1.8s per 20k-row
# partition at 32 cpus). Above it, files have many row groups and the
# distributed read parallelizes on its own.
DRIVER_READ_MAX_BYTES = 256 << 20


def _read_partition(fpath: str, n_slices: int):
    """Return (Dataset, rows_in) for one partition file."""
    import ray.data as rd

    if os.stat(fpath).st_size <= DRIVER_READ_MAX_BYTES:
        tbl = pq.read_table(fpath)
        n = tbl.num_rows
        step = max(1, (n + n_slices - 1) // n_slices)
        slices = [tbl.slice(i, step) for i in range(0, n, step)] or [tbl]
        return rd.from_arrow(slices), n
    ds = rd.read_parquet(fpath)
    return ds, ds.count()


def _run_one_partition(pid: int, fpath: str, fp: str, out_dir: str,
                       cfg: PipelineConfig, dup_tbl,
                       n_slices: int = 16) -> dict:
    """Execute one partition's pipeline and publish it atomically.
    Thread-safe with respect to other partitions: every write it makes
    (part dir, manifest row, metrics file) is partition-scoped."""
    from .dedup import filter_to_winners

    t0 = time.monotonic()
    ds, rows_in = _read_partition(fpath, n_slices)
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
    return row


# Partitions per wave: one streaming pipeline processes a WAVE of
# pending partitions (fid-tagged at the read, partitioned write), so
# read/extract parallelism spans the whole wave instead of one file.
# Crash granularity = one wave (earlier waves are already published);
# resume re-runs only the unpublished remainder.
WAVE_SIZE = 64


def _run_wave(wave: list[tuple[int, str, str]], out_dir: str,
              cfg: PipelineConfig, dup_tbl) -> list[dict]:
    """Run a wave of partitions as ONE Ray Data pipeline and publish
    each partition atomically afterward.

    The per-partition thread dispatch (`_run_one_partition` x N driver
    threads) leaves the cluster idle: one single-row-group file reads as
    one task, and concurrent driver-side streaming executors contend on
    the GIL (measured 7.9-11.7k docs/s vs ~23k flat-path on this box).
    Here the wave's files are one multi-file read (one read task per
    file, fid derived from the path column vectorized), one extract
    fan-out, and one partitioned write to a temp dir; the publish loop
    then renames fid=K -> part=K and writes manifests. Byte-parity with
    the per-partition path holds because the global dup filter already
    reduces every url to its single winner row (dedup_pages_fast's
    no-(url,ts)-ties contract), making the per-file internal dedup a
    no-op — so it is skipped here (one less exchange). wall_ms is the
    WAVE wall (shared by its partitions)."""
    import ray.data as rd

    from dataclasses import replace

    from .dedup import filter_to_winners

    t0 = time.monotonic()
    paths = [os.path.abspath(p) for _, p, _ in wave]
    rows_in = {pid: pq.ParquetFile(p).metadata.num_rows
               for pid, p, _ in wave}
    paths_arr = pa.array(paths)
    pids_arr = pa.array([pid for pid, _, _ in wave], pa.int32())

    ds = rd.read_parquet(paths, include_paths=True)

    def _tag(t: pa.Table) -> pa.Table:
        idx = pc.index_in(t.column("path"), value_set=paths_arr)
        if idx.null_count:
            raise ValueError("unresolvable source path in include_paths")
        fid = pc.take(pids_arr, idx)
        return t.drop_columns(["path"]).append_column("fid", fid)

    ds = ds.map_batches(_tag, batch_format="pyarrow", zero_copy_batch=True)
    ds = filter_to_winners(ds, dup_tbl)
    res = extract_pipeline(ds, replace(cfg, dedup=False),
                           keep_cols=("fid",))
    wave_tmp = os.path.join(out_dir, "_wave.tmp")
    shutil.rmtree(wave_tmp, ignore_errors=True)
    res.write_parquet(wave_tmp, partition_cols=["fid"])
    wall_ms = int((time.monotonic() - t0) * 1000)

    rows = []
    for pid, fpath, fp in wave:
        src = os.path.join(wave_tmp, f"fid={pid}")
        part_dir = os.path.join(out_dir, f"part={pid:05d}")
        shutil.rmtree(part_dir, ignore_errors=True)
        if os.path.isdir(src):
            os.replace(src, part_dir)  # atomic publish
        else:  # every row of this partition was a dup loser
            os.makedirs(part_dir, exist_ok=True)
            pq.write_table(S.MODEL_RESULT.empty_table(),
                           os.path.join(part_dir, "empty.parquet"))
        out_t = pq.read_table(part_dir, columns=["route"])
        routes = out_t.column("route")
        row = {
            "partition_id": pid,
            "input_fingerprint": fp,
            "rows_in": rows_in[pid],
            "rows_out": out_t.num_rows,
            "rejected": pc.sum(pc.equal(
                routes, pa.scalar("rejected"))).as_py() or 0,
            "reviewed": pc.sum(pc.equal(
                routes, pa.scalar("review"))).as_py() or 0,
            "status": "done",
            "wall_ms": wall_ms,
            "created_at": int(time.time() * 1_000_000),
        }
        _atomic_write_json(_manifest_path(out_dir, pid), row)
        _append_metrics(out_dir, pid, "extract_pipeline", rows_in[pid],
                        out_t.num_rows, wall_ms)
        rows.append(row)
    shutil.rmtree(wave_tmp, ignore_errors=True)
    return rows


def _dup_cache_paths(out_dir: str) -> tuple[str, str]:
    d = os.path.join(out_dir, "dedup_state")
    return os.path.join(d, "meta.json"), os.path.join(d, "dups.parquet")


def _load_dup_cache(out_dir: str, inputs_key: str):
    """Reuse the global dup-winner state when NO input file changed —
    otherwise a resume over an already-finished run would pay the full
    (url, warc_ts) corpus scan just to recompute an identical digest."""
    meta_p, tbl_p = _dup_cache_paths(out_dir)
    try:
        with open(meta_p) as f:
            meta = json.load(f)
    except (FileNotFoundError, json.JSONDecodeError):
        return None
    if meta.get("inputs_key") != inputs_key:
        return None
    tbl = pq.read_table(tbl_p) if meta.get("has_dups") else None
    return tbl, meta["digest"]


def _save_dup_cache(out_dir: str, inputs_key: str, dup_tbl,
                    digest: str) -> None:
    meta_p, tbl_p = _dup_cache_paths(out_dir)
    os.makedirs(os.path.dirname(meta_p), exist_ok=True)
    if dup_tbl is not None:
        pq.write_table(dup_tbl, tbl_p + ".tmp")
        os.replace(tbl_p + ".tmp", tbl_p)
    _atomic_write_json(meta_p, {"inputs_key": inputs_key, "digest": digest,
                                "has_dups": dup_tbl is not None})


def run_partitioned(input_dir: str, out_dir: str,
                    cfg: PipelineConfig | None = None,
                    fail_after: int | None = None,
                    max_concurrent: int | None = None) -> dict[int, dict]:
    """Run the extraction pipeline partition-by-partition with resume.

    Url-dedup is GLOBAL across partitions: a pruned (url, warc_ts) scan
    of the whole input set computes winners once; each partition is
    broadcast-filtered to them before extraction, so output matches
    extract_pipeline over the union of all files. Orphan partitions
    (pids beyond the current input list) are garbage-collected so a
    resumed run over a reduced input set never serves stale data.

    Pending partitions dispatch in WAVES (``max_concurrent`` partitions
    per wave, default WAVE_SIZE): each wave is ONE streaming pipeline —
    a multi-file fid-tagged read, one extract fan-out, one partitioned
    write — followed by a per-partition atomic publish loop, so cluster
    parallelism spans the wave instead of one file (measured 7.9k ->
    19k+ docs/s on this box; see _run_wave). ``exact_dedup`` retains
    the per-partition concurrent dispatch (its tie semantics are
    partition-scoped). Output bytes are identical either way because
    every publish is partition-scoped and atomic.

    ``fail_after`` (tests only): raise after N partitions to simulate a
    mid-run crash (forces sequential dispatch so the cut point is
    deterministic); a rerun must produce outputs identical to an
    uninterrupted run (property test).
    Returns the manifest dict.
    """
    _patch_fsspec_import_race()
    cfg = cfg or PipelineConfig()
    files = sorted(
        f for f in os.listdir(input_dir)
        if f.endswith(".parquet") and not f.startswith(".")
    )
    paths = [os.path.join(input_dir, f) for f in files]
    inputs_key = hashlib.md5("|".join(
        input_fingerprint(p) for p in paths).encode()).hexdigest()
    cached = _load_dup_cache(out_dir, inputs_key)
    if cached is not None:
        dup_tbl, dup_digest = cached
    else:
        dup_tbl, dup_digest = _global_dup_state(paths)
        _save_dup_cache(out_dir, inputs_key, dup_tbl, dup_digest)
    manifest = load_manifest(out_dir)
    _gc_orphans(out_dir, manifest, len(files))
    todo: list[tuple[int, str, str]] = []
    for pid, fname in enumerate(files):
        fpath = os.path.join(input_dir, fname)
        fp = input_fingerprint(fpath, extra=dup_digest)
        prev = manifest.get(pid)
        if prev and prev["status"] == "done" and prev["input_fingerprint"] == fp:
            continue  # resume: this partition is finished and unchanged
        todo.append((pid, fpath, fp))

    if fail_after is not None:
        for done, (pid, fpath, fp) in enumerate(todo):
            if done >= fail_after:
                raise RuntimeError(f"injected failure before partition {pid}")
            manifest[pid] = _run_one_partition(pid, fpath, fp, out_dir,
                                               cfg, dup_tbl)
        return manifest

    import ray
    from ray.data import DataContext

    try:
        cpus = int(ray.cluster_resources().get("CPU", 8)) \
            if ray.is_initialized() else 8
    except Exception:
        cpus = 8

    ctx = DataContext.get_current()
    prev_target = ctx.target_max_block_size
    # A partition is typically ONE parquet file with ONE row group, which
    # reads as ONE block; lowering the block target makes read tasks
    # split their output so extraction fans out even when a wave has
    # fewer files than cores. At real scale (GB files) the default
    # 128 MB already yields many blocks — restored after dispatch.
    ctx.target_max_block_size = min(prev_target or (1 << 27), 16 << 20)

    def _retry_import_race(fn, *a):
        try:
            return fn(*a)
        except ImportError as e:
            # first-imports inside Ray's path resolution can observe a
            # partially-failed optional module (fsspec http / aiohttp)
            # as ImportError instead of the ModuleNotFoundError Ray
            # suppresses; the work is idempotent (atomic publish), so
            # retry once. Only that known race qualifies — a genuine
            # import failure in pipeline code must propagate.
            if not any(k in str(e) for k in
                       ("fsspec", "aiohttp", "HTTPFileSystem")):
                raise
            return fn(*a)

    rows: list[dict] = []
    try:
        if cfg.exact_dedup:
            # exact (tie-exact) dedup is defined PER PARTITION — a
            # wave-wide exact dedup would also collapse cross-file
            # equal-(url,ts) ties, diverging from the per-partition
            # contract. Keep the concurrent per-partition dispatch.
            import threading
            from concurrent.futures import ThreadPoolExecutor

            retry_lock = threading.Lock()
            workers = max(1, min(max_concurrent or max(4, cpus // 4),
                                 len(todo) or 1))
            n_slices = max(4, (2 * cpus) // workers)

            def run_one(a):
                try:
                    return _run_one_partition(a[0], a[1], a[2], out_dir,
                                              cfg, dup_tbl,
                                              n_slices=n_slices)
                except ImportError as e:
                    if not any(k in str(e) for k in
                               ("fsspec", "aiohttp", "HTTPFileSystem")):
                        raise
                    with retry_lock:
                        return _run_one_partition(a[0], a[1], a[2],
                                                  out_dir, cfg, dup_tbl,
                                                  n_slices=n_slices)

            with ThreadPoolExecutor(max_workers=workers) as pool:
                rows = list(pool.map(run_one, todo))
        else:
            wave_size = max_concurrent or WAVE_SIZE
            for i in range(0, len(todo), wave_size):
                rows.extend(_retry_import_race(
                    _run_wave, todo[i:i + wave_size], out_dir, cfg,
                    dup_tbl))
    finally:
        ctx.target_max_block_size = prev_target
    for row in rows:
        manifest[row["partition_id"]] = row
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
