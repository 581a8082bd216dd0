"""Per-stage metrics instrumentation (SURVEY §3.3 — replaces the
reference's notification/observability path,
ui-notifications/fn-notify-progress/main.py:62-78).

``instrument(stage, fn)`` wraps a batch function so every batch reports
(rows_in, rows_out, bytes_in, wall) to a named MetricsActor; the driver
dumps accumulated per-stage rows to a parquet/JSONL sink next to the
run's outputs. Lineage granularity per (stage, partition) lives in
checkpoint.py; this module provides the per-stage counters, plus
``Dataset.stats()`` remains the executor-level source of truth.

Overhead: one tiny fire-and-forget actor call per batch — negligible
next to batch compute; do not instrument per-row.
"""

from __future__ import annotations

import json
import os

import pyarrow as pa

ACTOR_NAME = "webxtract_metrics"


def _get_actor(create: bool = True):
    import ray

    try:
        return ray.get_actor(ACTOR_NAME)
    except ValueError:
        if not create:
            raise
        return MetricsActor.options(  # type: ignore[attr-defined]
            name=ACTOR_NAME, lifetime="detached", get_if_exists=True).remote()


def _define_actor():
    import ray

    @ray.remote(num_cpus=0)
    class _MetricsActor:
        def __init__(self):
            self.rows: list[dict] = []

        def record(self, stage: str, rows_in: int, rows_out: int,
                   bytes_in: int, wall_ms: float) -> None:
            self.rows.append({
                "stage": stage, "rows_in": rows_in, "rows_out": rows_out,
                "bytes_in": bytes_in, "wall_ms": wall_ms,
            })

        def summary(self) -> list[dict]:
            agg: dict[str, dict] = {}
            for r in self.rows:
                a = agg.setdefault(r["stage"], {
                    "stage": r["stage"], "batches": 0, "rows_in": 0,
                    "rows_out": 0, "bytes_in": 0, "wall_ms": 0.0})
                a["batches"] += 1
                a["rows_in"] += r["rows_in"]
                a["rows_out"] += r["rows_out"]
                a["bytes_in"] += r["bytes_in"]
                a["wall_ms"] += r["wall_ms"]
            return sorted(agg.values(), key=lambda a: a["stage"])

        def reset(self) -> None:
            self.rows = []

    return _MetricsActor


MetricsActor = None  # resolved lazily (ray import must stay deferred)


def start() -> None:
    """Create (or reuse) the session's metrics actor."""
    global MetricsActor
    if MetricsActor is None:
        MetricsActor = _define_actor()
    _get_actor(create=True)


def instrument(stage: str, fn):
    """Wrap a batch fn so each call reports counters to the metrics actor
    (no-op if start() was never called in this session)."""
    def wrapped(batch: pa.Table) -> pa.Table:
        import time

        import ray

        t0 = time.monotonic()
        out = fn(batch)
        try:
            actor = ray.get_actor(ACTOR_NAME)
            actor.record.remote(
                stage, batch.num_rows, out.num_rows, batch.nbytes,
                (time.monotonic() - t0) * 1000.0)
        except ValueError:
            pass  # metrics not enabled
        return out

    return wrapped


def summary() -> list[dict]:
    import ray

    return ray.get(ray.get_actor(ACTOR_NAME).summary.remote())


def reset() -> None:
    import ray

    try:
        ray.get(ray.get_actor(ACTOR_NAME).reset.remote())
    except ValueError:
        pass


def dump(out_dir: str) -> str:
    """Write the per-stage summary to out_dir/stage_metrics.jsonl."""
    os.makedirs(out_dir, exist_ok=True)
    path = os.path.join(out_dir, "stage_metrics.jsonl")
    tmp = path + ".tmp"
    with open(tmp, "w") as f:
        for row in summary():
            f.write(json.dumps(row, sort_keys=True) + "\n")
    os.replace(tmp, path)
    return path
