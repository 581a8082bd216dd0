"""Materialized fixture cache for ORACLED query surfaces.

The web-native query surfaces synthesize their input corpora
closed-form from the documents table's doc ids. The synthesis
(per-row Python string building inside ``map_batches``) is fine for
correctness but can DOMINATE the timed bench at 600k rows — round-3
verdict "what's wrong" #4: render cost >> operator cost muddies
round-over-round comparisons. ``cached_ds`` spills a fixture Dataset
to /tmp parquet ONCE per (name, sf_dir, fixture-code fingerprint) and
re-reads it on every later call, so BENCH times the operator, not the
render.

The fingerprint hashes the render function's bytecode and constants,
so editing fixture logic invalidates the cache automatically (a
stale-cache parity failure cannot silently survive a fixture change;
a changed closure variable that isn't a constant is the one blind
spot — bump the ``name`` when in doubt).

Concurrency: builders write into a pid-suffixed temp dir and
``os.rename`` it into place — the first finisher wins, losers discard
their build; readers only ever see complete directories (the rename
is atomic on one filesystem).
"""

from __future__ import annotations

import hashlib
import os
import shutil

_ROOT = os.environ.get("WEBXTRACT_FIXTURE_CACHE",
                       "/tmp/webxtract_fixtures")


def _fingerprint(fn) -> str:
    code = fn.__code__
    h = hashlib.md5()
    h.update(code.co_code)
    h.update(repr(code.co_consts).encode("utf-8"))
    return h.hexdigest()[:12]


def cached_ds(name: str, sf_dir: str, build, render_fn=None):
    """``build``: () -> ray.data.Dataset (the fixture synthesis
    pipeline). Returns a Dataset reading the materialized parquet.
    ``render_fn`` (default: ``build``) supplies the invalidation
    fingerprint — pass the inner per-batch render function when
    ``build`` is a thin lambda."""
    import ray.data as rd

    fp = _fingerprint(render_fn if render_fn is not None else build)
    sf_key = os.path.normpath(sf_dir).strip(os.sep).replace(os.sep, "_")
    out = os.path.join(_ROOT, f"{name}__{sf_key}__{fp}")
    if not os.path.isdir(out):
        os.makedirs(_ROOT, exist_ok=True)
        tmp = f"{out}.build{os.getpid()}"
        shutil.rmtree(tmp, ignore_errors=True)
        build().write_parquet(tmp)
        try:
            os.rename(tmp, out)
        except OSError:
            shutil.rmtree(tmp, ignore_errors=True)  # a peer won the race
    return rd.read_parquet(out)
